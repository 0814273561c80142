"""Inverse rendering demo: recover the camera pose from a target image.

Renders a target Cornell box from a ground-truth camera, perturbs the
camera's position and look-at target, and recovers both by gradient
descent through the whole differentiable pipeline — camera gradients flow
through ray generation (camera.py matrices are built in-graph from the
pose parameters) and the hit-attribute recompute (render/shade.py).
The ROADMAP "camera/vertex optimization" companion to
examples/optimize_material.py.

Usage: python examples/optimize_camera.py [--steps 80] [--cpu]
"""

try:
    import _path  # noqa: F401  (repo-root sys.path bootstrap)
except ImportError:  # imported as examples.* (repo root already on path)
    pass

import argparse
import dataclasses

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--lr", type=float, default=2e-2)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--edge-aa", action="store_true",
                    help="enable primary-silhouette gradients "
                         "(render/antialias.py) — helps the --joint case")
    ap.add_argument("--joint", action="store_true",
                    help="also optimize the look-at target (harder: position"
                         "/target moves along the view ray are near-ambiguous"
                         " with shading-only gradients)")
    args = ap.parse_args()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from sunray_tpu.camera import Camera, camera_matrices
    from sunray_tpu.config import RenderConfig
    from sunray_tpu.render.pipeline import RenderState, render_frame
    from sunray_tpu.scene import cornell_box

    cfg = RenderConfig(
        width=96, height=72, lighting="nee", bounces=2, virtual_bounces=2,
        denoise_passes=1, enable_taa=False, differentiable=True,
        edge_antialias=args.edge_aa,
    )
    scene = cornell_box()
    cam = Camera(position=(1.0, 1.0, 3.4), target=(1.0, 1.0, 0.0), fov_y=45.0)

    def render(position, target):
        c = dataclasses.replace(cam, position=position, target=target)
        mats = camera_matrices(c, cfg.width, cfg.height)
        st = RenderState.create(cfg)
        _, ldr, _ = render_frame(scene, cfg, st, mats)
        return ldr

    true_pos = jnp.asarray(cam.position)
    true_tgt = jnp.asarray(cam.target)
    target_img = jax.jit(render)(true_pos, true_tgt)

    params = {"position": true_pos + jnp.asarray([0.25, -0.2, 0.3])}
    if args.joint:
        params["target"] = true_tgt + jnp.asarray([-0.2, 0.15, 0.0])

    def loss(p):
        img = render(p["position"], p.get("target", true_tgt))
        return jnp.mean((img - target_img) ** 2)

    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def update(p, s):
        l, g = jax.value_and_grad(loss)(p)
        upd, s = opt.update(g, s)
        return optax.apply_updates(p, upd), s, l

    def pose_err(p):
        e = jnp.linalg.norm(p["position"] - true_pos)
        if "target" in p:
            e = e + jnp.linalg.norm(p["target"] - true_tgt)
        return float(e)

    e0 = pose_err(params)
    for i in range(args.steps):
        params, opt_state, l = update(params, opt_state)
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i:3d}  loss {float(l):.3e}  pose_err {pose_err(params):.4f}",
                  flush=True)
    e1 = pose_err(params)
    print(f"pose error {e0:.4f} -> {e1:.4f} "
          f"({'RECOVERED' if e1 < 0.25 * e0 else 'partial'})")


if __name__ == "__main__":
    main()
