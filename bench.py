"""Benchmark: rays/sec/chip on the 1080p Cornell box (BASELINE.md config).

Runs the full ReSTIR pipeline (RIS pass + final trace + TAA + 4x denoise +
postprocess) on the default device (TPU under the driver), measures steady
frame time, and converts to rays/s using the actual per-frame trace count:

  rays/frame = P * (ris_walk_rounds        # closest-hit rounds, pass 1
               + 3                          # DI visibility + GI bounce + GI NEE
               + final_walk_rounds - 1      # closest-hit rounds, pass 2
                                            # (round 0 REUSES pass 1's
                                            # stored primary hit — not a
                                            # cast ray, not counted)
               + 2 + gi_spatial_samples)    # DI winner + GI spatial + GI final

Walk round counts are data-dependent (early-exit while_loops) and are read
back from the frame aux. `vs_baseline` is rays/s divided by 1e8 (100 Mray/s,
an RTX 3060 Ti-class ballpark for this ray budget — the reference publishes
no numbers, BASELINE.md "Reference-published numbers").

Output (VERDICT r4 item 2 — make BVH/texture/backward regressions visible
round-over-round): one JSON line per metric as each completes —
  1. rays_per_sec_per_chip_cornell_1080p   (headline, printed first)
  2. rays_per_sec_reflroom_glb_1080p_bvh2  (textured glTF, two-level BVH;
     the reference's own golden asset + camera, examples/png/main.rs:43-61)
  3. fwd_bwd_rays_per_sec_per_chip_cornell (720p differentiable frame)
then a FINAL line = the headline metric with the others embedded under
detail.extra_metrics (the driver parses the LAST JSON line; the embedded
copies keep all three auditable from BENCH_rNN.json). `--headline-only`
skips 2-3; `--grad` runs only 3 (unchanged).
"""

import json
import os
import sys
import time

# Keep the driver's default platform (TPU via axon); allow override.
if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import jax.numpy as jnp
import numpy as np

from sunray_tpu.camera import Camera, camera_matrices
from sunray_tpu.config import RenderConfig
from sunray_tpu.render.pipeline import RenderState, render_frame
from sunray_tpu.scene import cornell_box
from sunray_tpu.utils.provenance import exec_paths


def _start_outage_watchdog(probe_timeout_s: int = 240,
                           total_timeout_s: int = 700):
    """The axon tunnel can be down for hours, in which case jax.devices()
    or any dispatch HANGS (docs in CLAUDE.md). Guard with an IN-PROCESS
    watchdog thread: if the tiny probe computation below hasn't completed
    in `probe_timeout_s` (or the whole bench in `total_timeout_s`), print
    the skip JSON and hard-exit so the driver never hangs.

    Measured (round 4, 2026-08-21): probing from a SUBPROCESS — a second
    tunnel client that connects and exits — reliably wedged the parent's
    own first dispatch (3/3 wedges with the subprocess probe, 5/5
    successes for the identical workload without it), so the probe must
    share the main process's single connection.
    """
    if jax.config.jax_platforms == "cpu":
        wd = {"extend": lambda s: None, "finished": lambda: None,
              "set_fallback": lambda r: None}
        return wd
    import threading

    done = {"probe": False, "bench": False}
    state = {"deadline": time.time() + total_timeout_s, "fallback": None}
    t0 = time.time()

    def watch():
        while True:
            time.sleep(5)
            dt = time.time() - t0
            if not done["probe"] and dt > probe_timeout_s:
                break
            if not done["bench"] and time.time() > state["deadline"]:
                break
            if done["bench"]:
                return
        if state["fallback"] is not None:
            # The headline metric already completed — a hang in a LATER
            # phase must not erase it. Re-print it as the final line
            # (annotated) and exit clean for the driver.
            fb = dict(state["fallback"])
            fb.setdefault("detail", {})["note"] = (
                "extra bench phases hung (tunnel outage at "
                f"{time.time() - t0:.0f}s); headline metric is valid")
            print(json.dumps(fb), flush=True)
            os._exit(0)
        print(json.dumps({
            "metric": "rays_per_second",
            "value": 0,
            "unit": "rays/s",
            "vs_baseline": 0.0,
            "note": "TPU tunnel unreachable (dispatch hang at "
                    f"{time.time() - t0:.0f}s) — see CLAUDE.md "
                    "axon-outage notes; bench skipped",
        }), flush=True)
        os._exit(3)

    threading.Thread(target=watch, daemon=True).start()
    # Tiny in-process probe on the bench's own connection.
    jax.block_until_ready(jnp.ones((128, 128)) @ jnp.ones((128, 128)))
    done["probe"] = True

    def finished():
        done["bench"] = True

    def extend(seconds):
        state["deadline"] = time.time() + seconds

    def set_fallback(result):
        state["fallback"] = result

    return {"extend": extend, "finished": finished,
            "set_fallback": set_fallback}


def _grad_bench(small: bool):
    """Forward+backward benchmark (BASELINE.md:38 "forward+backward"):
    jitted value_and_grad of the FULL differentiable ReSTIR frame w.r.t.
    the material table AND the vertex positions (the two heavy reverse
    paths: the light/BRDF terms and the hit-attribute recompute in
    render/shade.py). The differentiable frame runs the walks as
    fixed-trip scans (ops/loops.py) and keeps every fused Pallas stage on
    its jnp plane (gradients route through the reference formulation), so
    this measures the true cost of a training step's render, not the
    forward fast path. Resolution 720p by default: the 1080p backward's
    saved walk residuals exceed a single v5e's HBM (measured OOM) —
    recorded honestly in the JSON.
    """
    from sunray_tpu.utils.provenance import exec_paths

    w, h = (480, 270) if small else (1280, 720)
    cfg = RenderConfig(width=w, height=h, lighting="restir",
                       differentiable=True)
    scene = cornell_box()
    cam = Camera(position=(1.0, 1.0, 3.4), target=(1.0, 1.0, 0.0), fov_y=45.0)
    mats = camera_matrices(cam, w, h)
    state = RenderState.create(cfg)

    def loss_fn(bc, pos, st):
        sc = scene.replace(
            materials=scene.materials.replace(base_color=bc), positions=pos
        )
        st2, ldr, aux = render_frame(sc, cfg, st, mats)
        return jnp.mean(ldr), (st2, aux)

    vg = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True),
                 donate_argnums=(2,))
    bc = scene.materials.base_color
    pos = scene.positions
    n_warm, n_bench = 3, 10
    t0 = time.time()
    aux = None
    for _ in range(n_warm):
        (val, (state, aux)), grads = vg(bc, pos, state)
    jax.block_until_ready(grads)
    compile_and_warm = time.time() - t0

    t0 = time.time()
    for _ in range(n_bench):
        (val, (state, aux)), grads = vg(bc, pos, state)
    jax.block_until_ready(grads)
    dt = (time.time() - t0) / n_bench

    ris_rounds = int(aux["ris_rounds"])
    final_rounds = int(aux["final_rounds"])
    p = w * h
    rays_per_frame = p * (
        ris_rounds + 3 + max(final_rounds - 1, 0) + 2
        + cfg.gi_spatial_samples
    )
    result = {
        "metric": "fwd_bwd_rays_per_sec_per_chip_cornell",
        "value": round(rays_per_frame / dt / 1e6, 3),
        "unit": "Mray/s (fwd+bwd)",
        "vs_baseline": round(rays_per_frame / dt / 1e8, 4),
        "detail": {
            "frame_ms": round(dt * 1e3, 2),
            "loss": float(val),
            "grad_norm_base_color": round(
                float(jnp.linalg.norm(grads[0])), 6),
            "grad_norm_positions": round(
                float(jnp.linalg.norm(grads[1])), 6),
            "rays_per_frame": rays_per_frame,
            "ris_rounds": ris_rounds,
            "final_rounds": final_rounds,
            "resolution": f"{w}x{h}",
            "device": str(jax.devices()[0]),
            "warmup_s": round(compile_and_warm, 1),
            "exec_paths": exec_paths(cfg, scene.num_lights),
        },
    }
    return result


def _reflroom_bench(small: bool):
    """Textured glTF metrics: ReflectionRoom.glb (the reference's own
    golden asset + camera, examples/png/main.rs:43-61), full ReSTIR
    pipeline. Two lines: the 1080p AUTO-path frame (what a user gets —
    the auto policy picks the brute Pallas tracer below 4096 world
    tris), and a 480x270 frame PINNED to the two-level BLAS/TLAS tracer
    (ops/bvh2.py) as a backend canary — the round-5 TLAS denormal-flush
    bug rendered silently black at full speed, so this line carries
    `ldr_mean`; bvh2's ~5 us/ray gather-bound walk makes 1080p
    unbenchable in the driver budget (measured 6.4 s/frame at 480x270).
    """
    glb = "/root/reference/examples/assets/ReflectionRoom.glb"
    if not os.path.exists(glb):
        return None
    from sunray_tpu.ops.bvh2 import build_blas_set
    from sunray_tpu.scene.gltf import load_gltf

    scene = load_gltf(glb)
    cam = Camera(position=(13.0, 30.0, 25.0), target=(0.0, 13.0, 0.0),
                 fov_y=45.0)

    def one(w, h, tracer, n_warm, n_bench, name):
        cfg = RenderConfig(width=w, height=h, lighting="restir",
                           tracer=tracer)
        accel = (build_blas_set(scene, leaf_size=cfg.bvh_leaf_size)
                 if tracer == "bvh2" else None)
        mats = camera_matrices(cam, w, h)
        state = RenderState.create(cfg)
        step = jax.jit(
            lambda st: render_frame(scene, cfg, st, mats, accel),
            donate_argnums=(0,),
        )
        t0 = time.time()
        aux = None
        for _ in range(n_warm):
            state, ldr, aux = step(state)
        jax.block_until_ready(ldr)
        compile_and_warm = time.time() - t0
        t0 = time.time()
        for _ in range(n_bench):
            state, ldr, aux = step(state)
        jax.block_until_ready(ldr)
        dt = (time.time() - t0) / n_bench

        ris_rounds = int(aux["ris_rounds"])
        final_rounds = int(aux["final_rounds"])
        rays_per_frame = w * h * (
            ris_rounds + 3 + max(final_rounds - 1, 0) + 2
            + cfg.gi_spatial_samples
        )
        return {
            "metric": name,
            "value": round(rays_per_frame / dt / 1e6, 3),
            "unit": "Mray/s",
            "vs_baseline": round(rays_per_frame / dt / 1e8, 4),
            "detail": {
                "frame_ms": round(dt * 1e3, 2),
                "rays_per_frame": rays_per_frame,
                "ris_rounds": ris_rounds,
                "final_rounds": final_rounds,
                "resolution": f"{w}x{h}",
                "num_tris": int(scene.num_tris),
                "num_instances": int(scene.inst_prim.shape[0]),
                "textured": True,
                # Image-mean canary: the TLAS denormal-flush bug rendered
                # silently BLACK frames at full speed — a throughput
                # metric alone cannot see that class.
                "ldr_mean": round(float(jnp.mean(ldr)), 5),
                "warmup_s": round(compile_and_warm, 1),
                "exec_paths": exec_paths(cfg, scene.num_lights),
            },
        }

    if small:
        main_line = one(480, 270, "auto", 3, 5,
                        "rays_per_sec_reflroom_glb_1080p_auto")
    else:
        main_line = one(1920, 1080, "auto", 3, 8,
                        "rays_per_sec_reflroom_glb_1080p_auto")
    canary = one(480, 270, "bvh2", 2, 3,
                 "rays_per_sec_reflroom_glb_480p_bvh2")
    main_line["detail"]["bvh2_canary"] = {
        k: canary[k] for k in ("metric", "value", "unit", "detail")
    }
    return main_line


def main():
    small = "--small" in sys.argv
    wd = _start_outage_watchdog()
    if "--grad" in sys.argv:
        wd["extend"](900)
        print(json.dumps(_grad_bench(small)))
        wd["finished"]()
        return
    w, h = (480, 270) if small else (1920, 1080)
    cfg = RenderConfig(width=w, height=h, lighting="restir")
    scene = cornell_box()
    cam = Camera(position=(1.0, 1.0, 3.4), target=(1.0, 1.0, 0.0), fov_y=45.0)
    mats = camera_matrices(cam, w, h)
    state = RenderState.create(cfg)

    step = jax.jit(
        lambda st: render_frame(scene, cfg, st, mats), donate_argnums=(0,)
    )

    # Warm-up: compile + fill temporal history.
    n_warm = 5
    t0 = time.time()
    aux = None
    for _ in range(n_warm):
        state, ldr, aux = step(state)
    jax.block_until_ready(ldr)
    compile_and_warm = time.time() - t0

    # Timed steady-state frames.
    n_bench = 20
    t0 = time.time()
    for _ in range(n_bench):
        state, ldr, aux = step(state)
    jax.block_until_ready(ldr)
    dt = (time.time() - t0) / n_bench

    ris_rounds = int(aux["ris_rounds"])
    final_rounds = int(aux["final_rounds"])
    p = w * h
    rays_per_frame = p * (
        ris_rounds + 3 + max(final_rounds - 1, 0) + 2
        + cfg.gi_spatial_samples
    )
    rays_per_sec = rays_per_frame / dt

    result = {
        "metric": "rays_per_sec_per_chip_cornell_1080p",
        "value": round(rays_per_sec / 1e6, 3),
        "unit": "Mray/s",
        "vs_baseline": round(rays_per_sec / 1e8, 4),
        "detail": {
            "frame_ms": round(dt * 1e3, 2),
            "rays_per_frame": rays_per_frame,
            "ris_rounds": ris_rounds,
            "final_rounds": final_rounds,
            "resolution": f"{w}x{h}",
            "device": str(jax.devices()[0]),
            "warmup_s": round(compile_and_warm, 1),
            # Which execution path this number measured (fused Pallas vs
            # jnp fallback) — a silent fallback above the kernel light cap
            # must not read as tunnel variance (VERDICT r3).
            "exec_paths": exec_paths(cfg, scene.num_lights),
        },
    }
    print(json.dumps(result), flush=True)
    wd["set_fallback"](result)

    extras = []
    if "--headline-only" not in sys.argv:
        # Each extra phase gets its own fresh deadline; a hang inside one
        # re-prints the completed headline (watchdog fallback) instead of
        # erasing it.
        for phase in (_reflroom_bench, _grad_bench):
            wd["extend"](700)
            r = phase(small)
            if r is not None:
                print(json.dumps(r), flush=True)
                extras.append(r)
                final = dict(result)
                final["detail"] = dict(result["detail"])
                final["detail"]["extra_metrics"] = [
                    {k: e[k] for k in ("metric", "value", "unit",
                                       "vs_baseline", "detail")}
                    for e in extras
                ]
                wd["set_fallback"](final)

    final = dict(result)
    final["detail"] = dict(result["detail"])
    if extras:
        final["detail"]["extra_metrics"] = [
            {k: e[k] for k in ("metric", "value", "unit", "vs_baseline",
                               "detail")}
            for e in extras
        ]
    print(json.dumps(final), flush=True)
    wd["finished"]()


if __name__ == "__main__":
    main()
