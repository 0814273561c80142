"""End-to-end distributed inverse-rendering "training run": recover wall
albedos from MULTIPLE camera views with the batch dp-sharded over a device
mesh, Adam updates, and non-blocking async checkpoints — the framework's
production-training story (sharding + optimizer + checkpoint/resume) in
one script.

Usage:
  python examples/train_multiview.py --cpu-devices 8 --steps 40
  python examples/train_multiview.py --resume  (continues from the latest
                                                checkpoint in --ckpt-dir)
"""

try:
    import _path  # noqa: F401  (repo-root sys.path bootstrap)
except ImportError:  # imported as examples.* (repo root already on path)
    pass

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--lr", type=float, default=0.03)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help="force a virtual CPU mesh of this many devices")
    ap.add_argument("--ckpt-dir", default="/tmp/sunray_train_ckpts")
    ap.add_argument("--ckpt-every", type=int, default=10)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    if args.cpu_devices:
        import os
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_devices}"
        )
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sunray_tpu.camera import Camera, camera_matrices
    from sunray_tpu.config import RenderConfig
    from sunray_tpu.parallel.sharding import make_mesh, replicate
    from sunray_tpu.render.pipeline import RenderState, render_frame
    from sunray_tpu.scene import cornell_box
    from sunray_tpu.utils.checkpoint import AsyncCheckpointManager

    w, h = 64, 48
    cfg = RenderConfig(
        width=w, height=h, lighting="nee", bounces=2, virtual_bounces=2,
        denoise_passes=0, enable_taa=False, differentiable=True,
        tonemap="none",
    )
    scene = cornell_box()
    mesh = make_mesh()
    dp = mesh.devices.shape[0]
    k = -(-max(args.views, 1) // dp) * dp   # round views up to a dp multiple
    print(f"mesh {mesh.devices.shape} (dp={dp}), {k} views", flush=True)

    cams = [
        Camera(position=(1.0 + 0.25 * np.sin(i), 1.0, 3.0 + 0.3 * np.cos(i)),
               target=(1.0, 1.0, 0.0), fov_y=45.0)
        for i in range(k)
    ]
    mats_batch = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[camera_matrices(c, w, h) for c in cams]
    )

    def render_one(scene_, mats):
        st = RenderState.create(cfg)
        _, ldr, _ = render_frame(scene_, cfg, st, mats)
        return ldr

    # Ground-truth renders, then re-initialize the walls to gray.
    targets = jax.jit(jax.vmap(lambda m: render_one(scene, m)))(mats_batch)

    # Learn only the non-emissive materials' rgb (freeze the light and
    # alpha), and project to [0, 1] after each update.
    bc_true = np.asarray(scene.materials.base_color)
    em = np.asarray(scene.materials.emissive_factor)[:, 3] > 0
    learn_mask = np.zeros_like(bc_true)
    learn_mask[~em, :3] = 1.0
    learn_mask = jnp.asarray(learn_mask)
    init = bc_true.copy()
    init[~em, :3] = 0.5
    params = jnp.asarray(init)

    def loss_fn(param, mats_batch, targets):
        bc = jnp.asarray(bc_true) * (1 - learn_mask) + param * learn_mask
        sc = scene.replace(materials=scene.materials.replace(base_color=bc))
        imgs = jax.vmap(lambda m: render_one(sc, m))(mats_batch)
        return jnp.mean((imgs - targets) ** 2)

    opt = optax.adam(args.lr)

    # dp-shard the view batch; replicate params (grads psum under GSPMD).
    targets = jax.device_put(targets, NamedSharding(mesh, P("dp")))
    mats_batch = jax.device_put(mats_batch, NamedSharding(mesh, P("dp")))

    @jax.jit
    def update(params, opt_state, mats_batch, targets):
        loss, g = jax.value_and_grad(loss_fn)(params, mats_batch, targets)
        upd, opt_state = opt.update(g, opt_state)
        new = jnp.clip(optax.apply_updates(params, upd), 0.0, 1.0)
        return new, opt_state, loss

    mgr = AsyncCheckpointManager(args.ckpt_dir, max_to_keep=3)
    start = 0
    opt_state = opt.init(params)
    if args.resume and mgr.latest_step() is not None:
        start = int(mgr.latest_step()) + 1
        params, opt_state = mgr.restore((params, opt_state))
        # Restored arrays land on device 0; re-replicate over the mesh so
        # they compose with the dp-sharded batch.
        params = replicate(params, mesh)
        opt_state = replicate(opt_state, mesh)
        print(f"resumed from step {start - 1}", flush=True)

    def err(p):
        return float(jnp.abs(p[~em, :3] - bc_true[~em, :3]).mean())

    with mesh:
        for i in range(start, start + args.steps):
            params, opt_state, loss = update(params, opt_state,
                                             mats_batch, targets)
            if i % args.ckpt_every == 0:
                mgr.save(i, (params, opt_state))   # non-blocking
            if i % 10 == 0 or i == start + args.steps - 1:
                print(f"step {i:3d}  loss {float(loss):.3e}  "
                      f"albedo_err {err(params):.4f}", flush=True)
    mgr.close()
    print(f"final albedo error {err(params):.4f} "
          f"({'RECOVERED' if err(params) < 0.05 else 'partial'})")


if __name__ == "__main__":
    main()
