"""Evaluation harness over the five BASELINE.json benchmark configs.

Runs each config, reports frame time, rays/s, and output statistics; with
--save writes renders to out/configs/. Config list (BASELINE.json):
  1. Cornell box, 1 spp, no denoise
  2. Single glTF mesh + textured material, direct lighting only, BVH
  3. Multi-mesh scene with RIS/ReSTIR, 4 spp (cfg.samples=4 in-frame)
  4. Progressive accumulation over 64 frames at 1080p
  5. Full pipeline: ReSTIR + TAA + denoise + postprocess + grads
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
import jax.numpy as jnp

from sunray_tpu.camera import Camera, camera_matrices
from sunray_tpu.config import RenderConfig
from sunray_tpu.render.pipeline import RenderState, render_frame
from sunray_tpu.scene import cornell_box, reflection_room

ASSETS = "/root/reference/examples/assets"

CORNELL_CAM = Camera(position=(1.0, 1.0, 3.4), target=(1.0, 1.0, 0.0), fov_y=45.0)
ROOM_CAM = Camera(position=(13.0, 30.0, 25.0), target=(0.0, 13.0, 0.0), fov_y=45.0)


def run_config(name, scene, cam, cfg, frames):
    mats = camera_matrices(cam, cfg.width, cfg.height)
    state = RenderState.create(cfg)
    step = jax.jit(lambda st: render_frame(scene, cfg, st, mats))
    state, ldr, aux = step(state)
    jax.block_until_ready(ldr)
    t0 = time.time()
    for _ in range(frames):
        state, ldr, aux = step(state)
    jax.block_until_ready(ldr)
    dt = (time.time() - t0) / frames
    img = np.asarray(ldr)
    p = cfg.width * cfg.height
    # final_rounds is already summed over cfg.samples; the fixed
    # visibility/shadow rays of the final pass run once per sample. Each
    # sample's walk round 0 reuses the RIS pass's stored primary hit (no
    # ray cast) — subtract cfg.samples.
    rays = p * (int(aux["ris_rounds"]) + 3
                + max(int(aux["final_rounds"]) - cfg.samples, 0)
                + cfg.samples * (2 + cfg.gi_spatial_samples))
    return {
        "config": name,
        "frame_ms": round(dt * 1e3, 1),
        "mrays_per_s": round(rays / dt / 1e6, 2),
        "mean": round(float(img.mean()), 4),
        "resolution": f"{cfg.width}x{cfg.height}",
    }, img


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="shrink for CPU")
    ap.add_argument("--save", action="store_true")
    args = ap.parse_args()
    s = 4 if args.small else 1

    def size(w, h):
        return dict(width=w // s, height=h // s)

    gltf_scene = None
    if os.path.isdir(ASSETS):
        from sunray_tpu.scene.gltf import load_gltf
        gltf_scene = load_gltf(os.path.join(ASSETS, "ReflectionRoom.glb"))

    cases = []
    cases.append((
        "1_cornell_1spp_nodenoise",
        cornell_box(), CORNELL_CAM,
        RenderConfig(**size(1920, 1080), lighting="nee", denoise_passes=0,
                     enable_taa=False),
        4,
    ))
    if gltf_scene is not None:
        cases.append((
            "2_gltf_direct_bvh",
            gltf_scene, ROOM_CAM,
            RenderConfig(**size(1280, 720), lighting="nee", denoise_passes=0,
                         bounces=2),
            4,
        ))
    cases.append((
        "3_multimesh_restir_4spp",
        reflection_room(),
        Camera(position=(2.0, 2.2, 9.0), target=(2.0, 1.6, 0.0), fov_y=50.0),
        RenderConfig(**size(1280, 720), lighting="restir", samples=4),
        4,
    ))
    cases.append((
        "4_progressive_64f_1080p",
        cornell_box(), CORNELL_CAM,
        RenderConfig(**size(1920, 1080), lighting="restir", denoise_passes=0),
        8 if args.small else 64,
    ))
    cases.append((
        "5_full_pipeline",
        cornell_box(), CORNELL_CAM,
        RenderConfig(**size(1920, 1080), lighting="restir"),
        4,
    ))

    results = []
    for name, scene, cam, cfg, frames in cases:
        r, img = run_config(name, scene, cam, cfg, frames)
        results.append(r)
        print(json.dumps(r), flush=True)
        if args.save:
            from sunray_tpu.utils.png import write_png
            os.makedirs("out/configs", exist_ok=True)
            write_png(f"out/configs/{name}.png", img)

    # Config 5 gradient check (differentiable variant, tiny).
    cfg = RenderConfig(width=64, height=48, lighting="nee", bounces=2,
                       virtual_bounces=2, denoise_passes=1,
                       differentiable=True)
    scene = cornell_box()
    mats = camera_matrices(CORNELL_CAM, cfg.width, cfg.height)

    def loss(bc):
        sc = scene.replace(materials=scene.materials.replace(base_color=bc))
        st = RenderState.create(cfg)
        _, ldr, _ = render_frame(sc, cfg, st, mats)
        return jnp.mean(ldr)

    g = jax.jit(jax.grad(loss))(scene.materials.base_color)
    ok = bool(np.isfinite(np.asarray(g)).all())
    print(json.dumps({"config": "5_gradients", "finite": ok,
                      "grad_norm": round(float(jnp.linalg.norm(g)), 5)}))


if __name__ == "__main__":
    main()
