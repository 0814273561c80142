"""Multi-device scaling harness (BASELINE.md: >=80% rays/s efficiency
1 chip -> N). With one real chip, runs on an N-device virtual CPU mesh to
validate the sharded program and measure parallel efficiency of the
partitioning itself; on real multi-chip hardware the same script reports
true scaling. Prints one JSON line per mesh size.

Usage: python parallel_scaling_bench.py [--cpu-devices 8] [--size WxH]
"""

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help="force N virtual CPU devices (0 = use real devices)")
    ap.add_argument("--size", default="512x256")
    args = ap.parse_args()

    if args.cpu_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_devices}"
        ).strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import jax.numpy as jnp
    from sunray_tpu.camera import Camera, camera_matrices
    from sunray_tpu.config import RenderConfig
    from sunray_tpu.parallel.sharding import make_mesh, render_frame_sharded
    from sunray_tpu.render.pipeline import RenderState
    from sunray_tpu.scene import cornell_box

    w, h = (int(x) for x in args.size.split("x"))
    scene = cornell_box()
    cam = Camera(position=(1.0, 1.0, 3.4), target=(1.0, 1.0, 0.0), fov_y=45.0)
    cfg = RenderConfig(width=w, height=h, lighting="restir", bounces=4,
                       virtual_bounces=2, ris_candidates=4,
                       di_spatial_samples=2, gi_spatial_samples=1,
                       denoise_passes=1)
    mats = camera_matrices(cam, w, h)

    n_avail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8) if n <= n_avail and h % n == 0]
    base_rate = None
    for n in sizes:
        mesh = make_mesh(n, dp=1)
        state = RenderState.create(cfg)
        # warm-up/compile
        st, ldr, aux = render_frame_sharded(scene, cfg, state, mats, mesh)
        jax.block_until_ready(ldr)
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            st, ldr, aux = render_frame_sharded(scene, cfg, st, mats, mesh)
        jax.block_until_ready(ldr)
        dt = (time.time() - t0) / reps
        rate = (w * h) / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n)
        rec = {
            "devices": n, "frame_ms": round(dt * 1e3, 1),
            "mpixels_per_s": round(rate / 1e6, 3),
            "scaling_efficiency": round(eff, 3),
        }
        if args.cpu_devices:
            # Virtual CPU devices share one machine's compute: this run
            # validates the sharded program, not hardware scaling.
            rec["note"] = "virtual-device run (correctness, not scaling)"
        print(json.dumps(rec))

    # Explicit shard_map + ppermute halo-exchange path (parallel/spmd.py):
    # same sweep, hand-written collectives instead of GSPMD.
    from jax.sharding import Mesh
    import numpy as np
    from sunray_tpu.parallel.spmd import make_spmd_step, shard_state

    base_rate = None
    for n in sizes:
        if max(int(cfg.history_gather_halo),
               int(max(cfg.di_spatial_radius, cfg.gi_spatial_radius)) + 1) \
                > h - h // n and n > 1:
            continue
        mesh = Mesh(np.asarray(jax.devices()[:n]).reshape(n), ("sp",))
        step = make_spmd_step(scene, cfg, mesh)
        st = shard_state(RenderState.create(cfg), cfg, mesh)
        st, ldr, _ = step(scene, st, mats)
        jax.block_until_ready(ldr)
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            st, ldr, _ = step(scene, st, mats)
        jax.block_until_ready(ldr)
        dt = (time.time() - t0) / reps
        rate = (w * h) / dt
        if base_rate is None:
            base_rate = rate
        rec = {
            "path": "spmd_halo_exchange",
            "devices": n, "frame_ms": round(dt * 1e3, 1),
            "mpixels_per_s": round(rate / 1e6, 3),
            "scaling_efficiency": round(rate / (base_rate * n), 3),
        }
        if args.cpu_devices:
            rec["note"] = "virtual-device run (correctness, not scaling)"
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
