"""Quality: joint vs separate temporal gathers — 64-frame mean raw
estimator at 128x72 on CPU converges to the same image (measured relMSE
0.0011, 2026-08-20; see docs/PARITY.md joint-gather entry)."""

try:
    import _path  # noqa: F401  (repo-root sys.path bootstrap)
except ImportError:  # imported as examples.* (repo root already on path)
    pass

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from sunray_tpu.camera import Camera
from sunray_tpu.config import RenderConfig
from sunray_tpu.render.renderer import Renderer
from sunray_tpu.scene import cornell_box

cam = Camera(position=(1.0, 1.3, 3.6), target=(1.0, 1.0, 1.0), fov_y=50.0)
means = {}
for joint in (False, True):
    cfg = RenderConfig(width=128, height=72, lighting="restir",
                       history_joint_gather=joint)
    r = Renderer(cfg)
    r.load_scene(cornell_box())
    acc = None
    n = 64
    for _ in range(n):
        img = np.asarray(r.render(cam), np.float64)
        acc = img if acc is None else acc + img
    means[joint] = acc / n
a, b = means[False], means[True]
rel = float(np.mean((a - b) ** 2 / (a ** 2 + 1e-3)))
print(f"relMSE joint-vs-separate 64f mean: {rel:.5f}  finite={np.isfinite(b).all()}")
