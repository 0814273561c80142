"""Many-instance scaling: unified world BVH vs the two-level BLAS/TLAS.

Builds N instances of one icosphere mesh and times (a) the acceleration
build work and (b) the steady frame, for tracer="bvh" (one BVH over the
expanded N*T world triangles, refit per frame) vs tracer="bvh2" (one
object-space BLAS shared by all instances + a per-frame N-leaf TLAS).
Instances orbit between frames, so the per-frame build work is exercised
(refit for bvh; TLAS rebuild for bvh2).

Usage: python examples/bench_instances.py [--instances 64] [--cpu]
"""

import argparse
import os
import sys
import time

try:
    import _path  # noqa: F401  (repo-root sys.path bootstrap)
except ImportError:  # imported as examples.* (repo root already on path)
    pass


def icosphere(subdiv=2):
    """Icosahedron subdivided `subdiv` times -> (V,3) verts, (T,3) faces."""
    import numpy as np

    t = (1.0 + 5.0 ** 0.5) / 2.0
    v = np.asarray(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        np.float32,
    )
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.asarray(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int32,
    )
    for _ in range(subdiv):
        cache = {}
        verts = list(v)

        def mid(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = verts[a] + verts[b]
                m = m / np.linalg.norm(m)
                cache[key] = len(verts)
                verts.append(m)
            return cache[key]

        nf = []
        for a, b, c in f:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            nf += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        v = np.asarray(verts, np.float32)
        f = np.asarray(nf, np.int32)
    return v, f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--instances", type=int, default=64)
    ap.add_argument("--subdiv", type=int, default=2)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tracers", default="bvh,bvh2")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import json

    import numpy as np

    from sunray_tpu.camera import Camera
    from sunray_tpu.config import RenderConfig
    from sunray_tpu.render.renderer import Renderer
    from sunray_tpu.scene.manager import SceneManager
    from sunray_tpu.scene.types import identity_transform, translate

    verts, faces = icosphere(args.subdiv)
    verts = verts * 0.35
    normals = verts / np.linalg.norm(verts, axis=1, keepdims=True)
    n = args.instances

    def instance_list(phase: float):
        out = []
        g = np.random.default_rng(7)
        for i in range(n):
            a = 2.0 * np.pi * (i / n) + phase
            ring = 1.5 + 1.2 * (i % 4)
            y = g.uniform(-1.5, 1.5)
            out.append(
                ("sphere", translate(ring * np.cos(a), y, ring * np.sin(a)))
            )
        return out

    for tracer in args.tracers.split(","):
        mgr = SceneManager()
        mgr.add_mesh(
            "sphere", verts, normals, faces,
            {"base_color": (0.8, 0.7, 0.6, 1.0), "roughness": 0.4},
        )
        mgr.add_mesh(
            "light",
            np.asarray([[-4, 6, -4], [4, 6, -4], [4, 6, 4], [-4, 6, 4]],
                       np.float32),
            np.tile(np.asarray([[0, -1.0, 0]], np.float32), (4, 1)),
            np.asarray([[0, 2, 1], [0, 3, 2]], np.int32),
            {"base_color": (1, 1, 1, 1),
             "emissive_factor": (1.0, 0.95, 0.9, 40.0)},
        )
        cfg = RenderConfig(
            width=args.res, height=args.res, tracer=tracer, lighting="nee",
            bounces=2, virtual_bounces=2, denoise_passes=1,
        )
        r = Renderer(cfg)
        scene = mgr.build(instance_list(0.0) + [("light", identity_transform())])
        r.load_scene(scene)
        r._manager = mgr
        r._instances = instance_list(0.0) + [("light", identity_transform())]
        cam = Camera(position=(0.0, 2.5, 9.0), target=(0.0, 0.0, 0.0),
                     fov_y=55.0)

        t0 = time.time()
        img = r.render(cam)
        jax.block_until_ready(img)
        first = time.time() - t0

        reps = 5
        t0 = time.time()
        for k in range(reps):
            inst = instance_list(0.02 * (k + 1)) + [
                ("light", identity_transform())
            ]
            img = r.render(cam, instances=inst)
        jax.block_until_ready(img)
        dt = (time.time() - t0) / reps
        assert np.isfinite(np.asarray(img)).all()
        print(json.dumps({
            "tracer": tracer,
            "instances": n,
            "world_tris": int(scene.num_tris),
            "first_frame_s": round(first, 2),
            "steady_frame_ms": round(dt * 1e3, 1),
            "device": str(jax.devices()[0]),
        }))


if __name__ == "__main__":
    main()
