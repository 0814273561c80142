"""Golden-image regression tests (the examples/png golden-render analog,
SURVEY.md section 4): deterministic small renders compared by PSNR against
checked-in goldens. Regenerate with:

    python tests/test_golden.py --regen
"""

import os
import sys

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

CONFIGS = {
    # name -> (scene factory kwargs, lighting, frames)
    "cornell_restir": dict(lighting="restir", frames=8),
    "cornell_nee": dict(lighting="nee", frames=4),
    # The reference's own golden asset + camera (examples/png/main.rs:45-57)
    # through the glTF loader, small.
    "reflroom_glb": dict(lighting="nee", frames=3, scene="glb"),
}

GLB = "/root/reference/examples/assets/ReflectionRoom.glb"


def render_case(name):
    import jax
    from sunray_tpu.camera import Camera, camera_matrices
    from sunray_tpu.config import RenderConfig
    from sunray_tpu.render.pipeline import RenderState, render_frame
    from sunray_tpu.scene import cornell_box

    spec = CONFIGS[name]
    cfg = RenderConfig(
        width=96, height=64, bounces=4, virtual_bounces=3, ris_candidates=8,
        di_spatial_samples=3, gi_spatial_samples=2, denoise_passes=2,
        lighting=spec["lighting"],
    )
    if spec.get("scene") == "glb":
        if not os.path.exists(GLB):
            pytest.skip("reference assets not available")
        from sunray_tpu.scene.gltf import load_gltf

        cfg = cfg.replace(bounces=3, virtual_bounces=2, ris_candidates=4,
                          di_spatial_samples=2, gi_spatial_samples=1,
                          denoise_passes=1)
        scene = load_gltf(GLB)
        cam = Camera(position=(13.0, 30.0, 25.0), target=(0.0, 13.0, 0.0),
                     fov_y=45.0)
    else:
        scene = cornell_box()
        cam = Camera(position=(1.0, 1.0, 3.4), target=(1.0, 1.0, 0.0), fov_y=45.0)
    mats = camera_matrices(cam, cfg.width, cfg.height)
    state = RenderState.create(cfg)
    step = jax.jit(lambda st: render_frame(scene, cfg, st, mats))
    ldr = None
    for _ in range(spec["frames"]):
        state, ldr, _ = step(state)
    return np.asarray(ldr)


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return np.inf
    return 10.0 * np.log10(1.0 / mse)


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npy")
    if not os.path.exists(path):
        pytest.skip(f"golden {name} not generated yet")
    golden = np.load(path)
    img = render_case(name)
    p = psnr(img, golden)
    # Bit-identical on the same backend; allow small cross-backend drift.
    assert p > 40.0, f"PSNR vs golden = {p:.2f} dB"


if __name__ == "__main__":
    if "--regen" in sys.argv:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for name in CONFIGS:
            img = render_case(name)
            np.save(os.path.join(GOLDEN_DIR, f"{name}.npy"), img)
            print(f"wrote {name}: mean={img.mean():.4f}")
