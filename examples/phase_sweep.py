"""Phase-knockout budget sweep (one process, same-session): measures the
1080p Cornell frame with individual stages disabled to attribute the
frame budget when the device profiler is unavailable (the tunnel's trace
collection can wedge; docs/PERFORMANCE.md round-3 used the same
methodology). Differences vs base are the stage budgets (including each
stage's knock-on fusions).

Usage: python examples/phase_sweep.py [--small] [--frames 15]
"""

try:
    import _path  # noqa: F401  (repo-root sys.path bootstrap)
except ImportError:  # imported as examples.* (repo root already on path)
    pass

import argparse
import json
import time

import numpy as np

import jax

from sunray_tpu.camera import Camera, camera_matrices
from sunray_tpu.config import RenderConfig
from sunray_tpu.render.pipeline import RenderState, render_frame
from sunray_tpu.scene import cornell_box


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
    assert np.isfinite(np.asarray(ldr)).all()
    return (time.time() - t0) / frames * 1e3, warm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--frames", type=int, default=15)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    w, h = (480, 270) if args.small else (1920, 1080)
    base = RenderConfig(width=w, height=h, lighting="restir")
    scene = cornell_box()
    cam = Camera(position=(1.0, 1.0, 3.4), target=(1.0, 1.0, 0.0),
                 fov_y=45.0)
    mats = camera_matrices(cam, w, h)

    cases = [
        ("base", base),
        ("ris1", base.replace(ris_candidates=1)),
        ("no_di_spatial", base.replace(di_spatial_samples=0)),
        ("no_gi_spatial", base.replace(gi_spatial_samples=0)),
        ("no_denoise", base.replace(denoise_passes=0)),
        ("no_taa", base.replace(enable_taa=False)),
        ("nee_only", base.replace(lighting="nee")),
    ]
    out = {}
    base_ms = None
    for name, cfg in cases:
        ms, warm = measure(scene, cfg, mats, args.frames)
        out[name] = round(ms, 2)
        if name == "base":
            base_ms = ms
        delta = "" if name == "base" else f"  delta={base_ms - ms:+.1f}"
        print(f"{name:14s} {ms:7.2f} ms (warm {warm:.1f} s){delta}",
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
