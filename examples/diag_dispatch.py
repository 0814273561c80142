"""Renderer-loop dispatch diagnostic: attributes the Renderer-vs-bench
frame-time gap between python dispatch, jitted camera math, and the
compiled frame program (docs/PERFORMANCE.md round-3 eager-camera entry).
Measured 2026-08-20: dispatch 0.9 ms, camera 3.4 ms, frame program
119.7 ms at the orbit pose."""

try:
    import _path  # noqa: F401  (repo-root sys.path bootstrap)
except ImportError:  # imported as examples.* (repo root already on path)
    pass

import time
import numpy as np, jax
from sunray_tpu.camera import Camera, camera_matrices_device
from sunray_tpu.config import RenderConfig
from sunray_tpu.render.renderer import Renderer
from sunray_tpu.scene import cornell_box

cfg = RenderConfig(width=1920, height=1080, lighting="restir")
r = Renderer(cfg)
r.load_scene(cornell_box())
cam = Camera(position=(1.0, 1.3, 3.6), target=(1.0, 1.0, 1.0), fov_y=50.0)
np.asarray(r.render(cam))
for _ in range(3):
    r.render(cam)
np.asarray(r.render(cam))

# (a) pure python dispatch time of r.render (no blocking)
n = 15
t0 = time.time()
outs = [r.render(cam) for _ in range(n)]
t_disp = (time.time() - t0) / n * 1e3
jax.block_until_ready(outs[-1])

# (b) direct _frame_jit loop with fixed mats + accel (bypass camera+accel host code)
mats = camera_matrices_device(cam, 1920, 1080)
accel = r._scene_accel()
state = r.state
t0 = time.time()
ldr = None
for _ in range(n):
    state, ldr, _aux = r._frame_jit(r.scene, state, mats, accel)
jax.block_until_ready(ldr)
t_direct = (time.time() - t0) / n * 1e3
# _frame_jit donates argnum 1, so the first iteration invalidated the
# Renderer's own self.state buffers — rebind the loop's live state so the
# Renderer stays usable after this diagnostic (ADVICE r3).
r.state = state

# (c) camera_matrices_device alone per-frame cost
t0 = time.time()
for _ in range(n):
    m = camera_matrices_device(cam, 1920, 1080)
jax.block_until_ready(m["view_proj"])
t_cam = (time.time() - t0) / n * 1e3

print(f"dispatch-only r.render: {t_disp:.1f} ms/frame")
print(f"direct _frame_jit loop (fixed mats/accel): {t_direct:.1f} ms/frame")
print(f"camera_matrices_device alone: {t_cam:.1f} ms/call")
