"""Device-profile the default 1080p Cornell frame and print the per-op
cost table (the docs/PERFORMANCE.md budget-table workflow, scripted).

Usage: python examples/profile_frame.py [--small] [--frames N] [--kw k=v ...]
  --kw accepts RenderConfig overrides, e.g. --kw history_gather_mode=shift
"""

import os
import sys
import time

try:
    import _path  # noqa: F401  (repo-root sys.path bootstrap)
except ImportError:  # imported as examples.* (repo root already on path)
    pass

import jax
import numpy as np

from sunray_tpu.camera import Camera, camera_matrices
from sunray_tpu.config import RenderConfig
from sunray_tpu.render.pipeline import RenderState, render_frame
from sunray_tpu.scene import cornell_box
from sunray_tpu.utils.profiling import (
    attribute_rows,
    device_trace,
    hlo_source_map,
    summarize_trace,
)


def parse_kw(argv):
    kw = {}
    for i, a in enumerate(argv):
        if a == "--kw" and i + 1 < len(argv):
            k, v = argv[i + 1].split("=", 1)
            for cast in (int, float):
                try:
                    v = cast(v)
                    break
                except ValueError:
                    continue
            kw[k] = v
    return kw


def main():
    small = "--small" in sys.argv
    n = 10
    if "--frames" in sys.argv:
        n = int(sys.argv[sys.argv.index("--frames") + 1])
    w, h = (480, 270) if small else (1920, 1080)
    cfg = RenderConfig(width=w, height=h, lighting="restir",
                       **parse_kw(sys.argv))
    scene = cornell_box()
    cam = Camera(position=(1.0, 1.0, 3.4), target=(1.0, 1.0, 0.0), fov_y=45.0)
    mats = camera_matrices(cam, w, h)
    state = RenderState.create(cfg)
    step = jax.jit(lambda st: render_frame(scene, cfg, st, mats),
                   donate_argnums=(0,))

    t0 = time.time()
    for _ in range(3):
        state, ldr, _ = step(state)
    jax.block_until_ready(ldr)
    print(f"warmup {time.time() - t0:.1f} s", flush=True)

    log_dir = "/tmp/sunray_profile"
    t0 = time.time()
    with device_trace(log_dir):
        for _ in range(n):
            state, ldr, _ = step(state)
        jax.block_until_ready(ldr)
    dt = (time.time() - t0) / n
    print(f"steady {dt * 1e3:.1f} ms/frame over {n} frames "
          f"(finite={bool(np.isfinite(np.asarray(ldr)).all())})", flush=True)
    rows = summarize_trace(log_dir, top=40, steady_frac=0.8)
    total = sum(r["total_ms"] for r in rows)
    print(f"device total {total:.1f} ms over trace tail "
          f"({total / n:.1f} ms/frame if tail == all {n} frames)")

    # Per-file attribution: join the trace rows with the compiled HLO's
    # op metadata (the round-3 budget-table workflow, now scripted).
    try:
        # Lower from a fresh state: `state` was donated through the loop.
        hlo = step.lower(RenderState.create(cfg)).compile().as_text() or ""
        srcmap = hlo_source_map(hlo)
        print(f"\nper-file attribution ({len(srcmap)} mapped instructions):",
              flush=True)
        attribute_rows(
            summarize_trace(log_dir, top=0, steady_frac=0.8), srcmap)
    except Exception as e:  # pragma: no cover — backend-dependent
        print(f"per-file attribution unavailable: {e}")


if __name__ == "__main__":
    main()
