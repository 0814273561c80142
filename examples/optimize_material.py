"""Inverse rendering demo: recover wall albedos from a target image.

Renders a target Cornell box, re-initializes the wall colors to gray, and
optimizes material base colors by gradient descent through the whole
differentiable pipeline (trace -> shade -> NEE -> TAA/denoise -> tonemap).
This is the BASELINE.md "differentiable: material grads" north star
exercised end-to-end.

Usage: python examples/optimize_material.py [--steps 60] [--cpu]
"""

try:
    import _path  # noqa: F401  (repo-root sys.path bootstrap)
except ImportError:  # imported as examples.* (repo root already on path)
    pass

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--lr", type=float, default=0.6)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax
    import jax.numpy as jnp
    import optax

    from sunray_tpu.camera import Camera, camera_matrices
    from sunray_tpu.config import RenderConfig
    from sunray_tpu.render.pipeline import RenderState, render_frame
    from sunray_tpu.scene import cornell_box

    cfg = RenderConfig(
        width=96, height=72, lighting="nee", bounces=3, virtual_bounces=2,
        denoise_passes=1, enable_taa=False, differentiable=True,
    )
    scene = cornell_box()
    cam = Camera(position=(1.0, 1.0, 3.4), target=(1.0, 1.0, 0.0), fov_y=45.0)
    mats = camera_matrices(cam, cfg.width, cfg.height)

    def render(base_color):
        sc = scene.replace(
            materials=scene.materials.replace(base_color=base_color)
        )
        st = RenderState.create(cfg)
        _, ldr, _ = render_frame(sc, cfg, st, mats)
        return ldr

    target = jax.jit(render)(scene.materials.base_color)

    # Start from gray walls (keep the light's material fixed via mask).
    bc_true = np.asarray(scene.materials.base_color)
    init = bc_true.copy()
    init[:3, :3] = 0.5   # white/red/green walls -> gray
    learn_mask = np.zeros_like(bc_true)
    learn_mask[:3, :3] = 1.0

    def loss_fn(p):
        bc = jnp.asarray(bc_true) * (1 - learn_mask) + p * learn_mask
        img = render(bc)
        return jnp.mean((img - target) ** 2)

    opt = optax.adam(args.lr * 0.05)
    params = jnp.asarray(init)
    state = opt.init(params)
    vg = jax.jit(jax.value_and_grad(loss_fn))

    for step in range(args.steps):
        loss, g = vg(params)
        updates, state = opt.update(g, state)
        params = optax.apply_updates(params, updates)
        params = jnp.clip(params, 0.0, 1.0)
        if step % 10 == 0 or step == args.steps - 1:
            err = float(jnp.abs(
                (params - bc_true) * learn_mask
            ).max())
            print(f"step {step:3d}  loss {float(loss):.6f}  "
                  f"max albedo err {err:.4f}")

    print("recovered wall albedos:")
    print(np.asarray(params)[:3, :3].round(3))
    print("true wall albedos:")
    print(bc_true[:3, :3].round(3))


if __name__ == "__main__":
    main()
