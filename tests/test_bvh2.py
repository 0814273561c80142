"""Two-level BVH (ops/bvh2.py): per-mesh BLAS + instance TLAS vs the
brute-force oracle, and the frame-level drop-in behind tracer="bvh2"."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sunray_tpu.camera import Camera
from sunray_tpu.config import RenderConfig
from sunray_tpu.ops import bvh2 as bvh2_mod
from sunray_tpu.ops import intersect
from sunray_tpu.render.renderer import Renderer
from sunray_tpu.scene.manager import SceneManager
from sunray_tpu.scene.types import identity_transform, translate


def rot_y(deg):
    t = identity_transform()
    c, s = np.cos(np.radians(deg)), np.sin(np.radians(deg))
    t[:3, :3] = np.asarray([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    return t


def scale_xyz(sx, sy, sz):
    t = identity_transform()
    t[0, 0], t[1, 1], t[2, 2] = sx, sy, sz
    return t


def compose(a, b):
    """(3,4) affine a∘b."""
    out = identity_transform()
    out[:, :3] = a[:, :3] @ b[:, :3]
    out[:, 3] = a[:, :3] @ b[:, 3] + a[:, 3]
    return out


def box_mesh(size=0.4):
    s = size
    p = np.asarray(
        [
            [-s, -s, -s], [s, -s, -s], [s, s, -s], [-s, s, -s],
            [-s, -s, s], [s, -s, s], [s, s, s], [-s, s, s],
        ],
        np.float32,
    )
    f = [
        (0, 1, 2), (0, 2, 3), (4, 6, 5), (4, 7, 6),
        (0, 4, 5), (0, 5, 1), (3, 2, 6), (3, 6, 7),
        (0, 3, 7), (0, 7, 4), (1, 5, 6), (1, 6, 2),
    ]
    tris = np.asarray(f, np.int32)
    n = np.zeros((8, 3), np.float32)
    n[:, 1] = 1.0
    return p, n, tris


def quad_mesh():
    p = np.asarray(
        [[-0.5, 0, -0.5], [0.5, 0, -0.5], [0.5, 0, 0.5], [-0.5, 0, 0.5]],
        np.float32,
    )
    n = np.tile(np.asarray([[0, 1.0, 0]], np.float32), (4, 1))
    tris = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    return p, n, tris


def multi_instance_scene(pad=True):
    mgr = SceneManager()
    bp, bn, bt = box_mesh()
    qp, qn, qt = quad_mesh()
    mgr.add_mesh("box", bp, bn, bt, {"base_color": (0.8, 0.8, 0.8, 1.0)})
    mgr.add_mesh("quad", qp, qn, qt,
                 {"base_color": (0.9, 0.9, 0.9, 1.0),
                  "emissive_factor": (1.0, 0.9, 0.8, 10.0)})
    instances = [
        ("box", translate(0.0, 0.0, 0.0)),
        ("box", compose(translate(1.5, 0.2, -0.5), rot_y(30.0))),
        ("box", compose(translate(-1.2, 0.1, 0.8),
                        compose(rot_y(-45.0), scale_xyz(0.5, 2.0, 1.0)))),
        ("quad", translate(0.0, 2.0, 0.0)),
        ("box", compose(translate(0.3, -1.5, 1.2), scale_xyz(2.0, 0.3, 0.7))),
        ("quad", compose(translate(2.0, 0.5, 1.0), rot_y(80.0))),
    ]
    scene = mgr.build(instances, pad_to_capacity=pad)
    return mgr, scene, instances


def random_rays(n, seed):
    g = np.random.default_rng(seed)
    o = g.uniform(-3, 3, (n, 3)).astype(np.float32)
    d = g.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


class TestInvert:
    def test_affine_inverse_rows(self):
        g = np.random.default_rng(3)
        xf = g.normal(size=(7, 3, 4)).astype(np.float32)
        rows = np.asarray(bvh2_mod._invert_affine_rows(jnp.asarray(xf)))
        for i in range(7):
            m = np.eye(4, dtype=np.float32)
            m[:3, :] = xf[i]
            inv = np.linalg.inv(m)
            np.testing.assert_allclose(
                rows[i, :9].reshape(3, 3), inv[:3, :3], rtol=1e-3, atol=1e-4
            )
            np.testing.assert_allclose(
                rows[i, 9:12], inv[:3, 3], rtol=1e-3, atol=1e-4
            )


class TestTraversalParity:
    def _tlas(self, scene):
        blas = bvh2_mod.build_blas_set(scene, leaf_size=4)
        return jax.jit(lambda s: bvh2_mod.build_frame_tlas(blas, s))(scene), blas

    def test_closest_matches_brute(self):
        _, scene, _ = multi_instance_scene()
        tl, _ = self._tlas(scene)
        tris = scene.world_triangle_vertices()
        o, d = random_rays(600, 11)

        ref = intersect.trace_closest_brute(tris, o, d)
        got = bvh2_mod.trace_closest_bvh2(tl, o, d, block=256)

        np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
        h = np.asarray(ref.hit)
        np.testing.assert_allclose(
            np.asarray(got.t)[h], np.asarray(ref.t)[h], rtol=2e-4, atol=2e-4
        )
        # Triangle ids match except possible exact-tie edges.
        same = (np.asarray(got.tri)[h] == np.asarray(ref.tri)[h])
        assert same.mean() > 0.98
        np.testing.assert_allclose(
            np.asarray(got.u)[h][same], np.asarray(ref.u)[h][same],
            rtol=2e-3, atol=2e-3,
        )

    def test_world_ids_identify_instances(self):
        """Rays aimed at a specific instance must return world triangle ids
        belonging to that instance's slice."""
        _, scene, _ = multi_instance_scene()
        tl, _ = self._tlas(scene)
        # Instance 1: box at (1.5, 0.2, -0.5).
        target = np.asarray([1.5, 0.2, -0.5], np.float32)
        o = jnp.asarray(np.tile(target + [0, 0, 5.0], (8, 1)), jnp.float32)
        d = jnp.asarray(np.tile([0, 0, -1.0], (8, 1)), jnp.float32)
        got = bvh2_mod.trace_closest_bvh2(tl, o, d, block=8)
        assert bool(np.asarray(got.hit).all())
        ti = np.asarray(scene.tri_inst)[np.asarray(got.tri)]
        np.testing.assert_array_equal(ti, 1)

    def test_occlusion_matches_brute(self):
        _, scene, _ = multi_instance_scene()
        tl, _ = self._tlas(scene)
        tris = scene.world_triangle_vertices()
        o, d = random_rays(400, 23)
        tmax = jnp.full((400,), 4.0, jnp.float32)

        ref = intersect.trace_occluded_brute(tris, o, d, tmax)
        got = bvh2_mod.trace_occluded_bvh2(tl, o, d, tmax, block=128)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_occlusion_exclude(self):
        _, scene, _ = multi_instance_scene()
        tl, _ = self._tlas(scene)
        tris = scene.world_triangle_vertices()
        o, d = random_rays(300, 31)
        hit = bvh2_mod.trace_closest_bvh2(tl, o, d, block=128)
        h = np.asarray(hit.hit)
        tmax = jnp.where(hit.hit, hit.t + 1e-3, 1e-3)
        ex = hit.tri
        ref = intersect.trace_occluded_brute(tris, o, d, tmax, exclude=ex)
        got = bvh2_mod.trace_occluded_bvh2(tl, o, d, tmax, exclude=ex, block=128)
        agree = np.asarray(got) == np.asarray(ref)
        # t+eps vs the excluded surface makes a few lanes genuinely
        # borderline; demand near-total agreement.
        assert agree.mean() > 0.99

    def test_single_instance_root(self):
        mgr = SceneManager()
        bp, bn, bt = box_mesh()
        mgr.add_mesh("box", bp, bn, bt, {"base_color": (1, 1, 1, 1)})
        scene = mgr.build([("box", translate(0, 0, 0))], pad_to_capacity=False)
        tl, _ = self._tlas(scene)
        tris = scene.world_triangle_vertices()
        o, d = random_rays(200, 5)
        ref = intersect.trace_closest_brute(tris, o, d)
        got = bvh2_mod.trace_closest_bvh2(tl, o, d, block=64)
        np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
        h = np.asarray(ref.hit)
        np.testing.assert_allclose(
            np.asarray(got.t)[h], np.asarray(ref.t)[h], rtol=2e-4, atol=2e-4
        )


class TestFrame:
    CFG = dict(
        width=48, height=32, lighting="nee", bounces=2, virtual_bounces=2,
        denoise_passes=1,
    )
    CAM = Camera(position=(0.0, 1.0, 5.0), target=(0.0, 0.3, 0.0), fov_y=50.0)

    def test_render_matches_brute_backend(self):
        mgr, scene, instances = multi_instance_scene()

        r_brute = Renderer(RenderConfig(tracer="brute", **self.CFG))
        r_brute.load_scene(scene)
        r_brute._manager = mgr
        a = np.asarray(r_brute.render(self.CAM))

        r2 = Renderer(RenderConfig(tracer="bvh2", **self.CFG))
        r2.load_scene(scene)
        r2._manager = mgr
        b = np.asarray(r2.render(self.CAM))

        assert np.isfinite(b).all()
        match = np.isclose(a, b, rtol=1e-4, atol=1e-4).all(axis=-1)
        # Exact-tie edge pixels may pick the other triangle of a quad edge.
        assert match.mean() > 0.99

    def test_blas_cache_survives_instance_motion(self):
        mgr, scene, instances = multi_instance_scene()
        r = Renderer(RenderConfig(tracer="bvh2", **self.CFG))
        r.load_scene(scene)
        r._manager = mgr
        r._instances = instances
        r.render(self.CAM)
        accel1 = r._accel
        assert accel1 is not None
        moved = [(k, compose(translate(0.05, 0.0, 0.0), t))
                 for k, t in instances]
        img = r.render(self.CAM, instances=moved)
        assert np.isfinite(np.asarray(img)).all()
        # Only the per-frame TLAS rebuilt; the object-space BLAS set is
        # reused untouched (the whole point of the two-level split).
        assert r._accel is accel1


class TestAutoPicksTwoLevel:
    def test_auto_uses_blas_set_above_brute_threshold(self):
        """tracer="auto" through the Renderer resolves to the two-level
        backend once the scene exceeds the brute-kernel crossover (and to
        the brute path below it)."""
        mgr, scene, instances = multi_instance_scene()
        cfg = RenderConfig(
            tracer="auto", brute_force_max_tris=16, **TestFrame.CFG
        )
        r = Renderer(cfg)
        r.load_scene(scene)
        r._manager = mgr
        accel = r._scene_accel()
        assert isinstance(accel, bvh2_mod.BlasSet)

        small = Renderer(
            RenderConfig(tracer="auto", brute_force_max_tris=1 << 20,
                         **TestFrame.CFG)
        )
        small.load_scene(scene)
        small._manager = mgr
        assert small._scene_accel() is None

    def test_auto_render_matches_brute(self):
        mgr, scene, instances = multi_instance_scene()
        cam = TestFrame.CAM

        r_brute = Renderer(RenderConfig(tracer="brute", **TestFrame.CFG))
        r_brute.load_scene(scene)
        r_brute._manager = mgr
        a = np.asarray(r_brute.render(cam))

        r_auto = Renderer(
            RenderConfig(tracer="auto", brute_force_max_tris=16,
                         **TestFrame.CFG)
        )
        r_auto.load_scene(scene)
        r_auto._manager = mgr
        b = np.asarray(r_auto.render(cam))

        assert np.isfinite(b).all()
        match = np.isclose(a, b, rtol=1e-4, atol=1e-4).all(axis=-1)
        assert match.mean() > 0.99
