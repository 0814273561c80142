"""A/B: fused Pallas ReSTIR kernels vs jnp planes on MANY-light scenes
(VERDICT r3 item 4 — round 3's kernels silently fell back to jnp above
32 lights; round 4 lifted the cap with an in-kernel one-hot MXU fetch
(<=512, exact) and presampled tiles above).

Usage: python examples/ab_many_lights.py [--panels 12 17] [--size WxH]
       [--frames 15]

Per panel count: builds cornell_box_many_lights(panels) (2*panels^2
emissive triangles), measures steady frame time with the fused kernels
(default dispatch) and with SUNRAY_TPU_FORCE_JNP_RESTIR=1 (jnp planes),
same process, and prints one JSON line per case.
"""

try:
    import _path  # noqa: F401  (repo-root sys.path bootstrap)
except ImportError:  # imported as examples.* (repo root already on path)
    pass

import argparse
import json
import os
import time

import numpy as np

import jax

from sunray_tpu.camera import Camera, camera_matrices
from sunray_tpu.config import RenderConfig
from sunray_tpu.render.pipeline import RenderState, render_frame
from sunray_tpu.scene import cornell_box_many_lights
from sunray_tpu.utils.provenance import exec_paths


def measure(scene, cfg, mats, frames):
    state = RenderState.create(cfg)
    step = jax.jit(lambda st: render_frame(scene, cfg, st, mats),
                   donate_argnums=(0,))
    t0 = time.time()
    for _ in range(4):
        state, ldr, _ = step(state)
    jax.block_until_ready(ldr)
    warm = time.time() - t0
    t0 = time.time()
    for _ in range(frames):
        state, ldr, _ = step(state)
    jax.block_until_ready(ldr)
    dt = (time.time() - t0) / frames * 1e3
    host = np.asarray(ldr)
    assert np.isfinite(host).all()
    return dt, warm, host


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--panels", type=int, nargs="+", default=[12, 17])
    ap.add_argument("--size", default="1920x1080")
    ap.add_argument("--frames", type=int, default=15)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    w, h = (int(x) for x in args.size.split("x"))
    cfg = RenderConfig(width=w, height=h, lighting="restir")
    cam = Camera(position=(1.0, 1.0, 3.4), target=(1.0, 1.0, 0.0),
                 fov_y=45.0)
    mats = camera_matrices(cam, w, h)

    for panels in args.panels:
        scene = cornell_box_many_lights(panels)
        n_l = scene.num_lights
        os.environ["SUNRAY_TPU_FORCE_JNP_RESTIR"] = "0"
        dt_fused, warm_f, img_f = measure(scene, cfg, mats, args.frames)
        os.environ["SUNRAY_TPU_FORCE_JNP_RESTIR"] = "1"
        dt_jnp, warm_j, img_j = measure(scene, cfg, mats, args.frames)
        os.environ["SUNRAY_TPU_FORCE_JNP_RESTIR"] = "0"
        print(json.dumps({
            "panels": panels,
            "num_lights": n_l,
            "resolution": args.size,
            "fused_ms": round(dt_fused, 2),
            "jnp_ms": round(dt_jnp, 2),
            "speedup": round(dt_jnp / dt_fused, 3),
            "warmup_s": [round(warm_f, 1), round(warm_j, 1)],
            "ldr_mean_abs_diff": round(
                float(np.mean(np.abs(img_f - img_j))), 6),
            "exec_paths": exec_paths(cfg, n_l),
        }), flush=True)


if __name__ == "__main__":
    main()
