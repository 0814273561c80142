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


def measure(scene, cfg, mats, frames, step=None):
    state = RenderState.create(cfg)
    if step is None:
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
    # Tunnel weather drifts on a ~10-minute scale (measured: the same
    # base config gave 101 vs 154 ms an hour apart), so each knockout is
    # bracketed by fresh base measurements and its delta is taken against
    # the MEAN of the adjacent base runs — sequential-sweep deltas were
    # unusable in degraded windows (negative knockouts).
    out = {}
    base_cfg = dict(cases)["base"]
    # One compiled base program reused for every bracket (a fresh lambda
    # per call would recompile ~60 s each through the tunnel).
    base_step = jax.jit(
        lambda st: render_frame(scene, base_cfg, st, mats),
        donate_argnums=(0,))
    base_ms, _ = measure(scene, base_cfg, mats, args.frames, step=base_step)
    out["base"] = round(base_ms, 2)
    print(f"{'base':14s} {base_ms:7.2f} ms", flush=True)
    prev_base = base_ms
    base_samples = [base_ms]
    for name, cfg in cases:
        if name == "base":
            continue
        ms, warm = measure(scene, cfg, mats, args.frames)
        next_base, _ = measure(scene, base_cfg, mats, args.frames,
                               step=base_step)
        base_samples.append(next_base)
        local_base = 0.5 * (prev_base + next_base)
        out[name] = round(ms, 2)
        out[f"{name}_delta"] = round(local_base - ms, 2)
        print(f"{name:14s} {ms:7.2f} ms (warm {warm:.1f} s)"
              f"  delta={local_base - ms:+.1f}"
              f"  [base {prev_base:.1f}->{next_base:.1f}]", flush=True)
        prev_base = next_base
    out["base_drift"] = [round(b, 1) for b in base_samples]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
