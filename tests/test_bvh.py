"""LBVH build + traversal vs the brute-force oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sunray_tpu.ops import bvh as bvh_mod
from sunray_tpu.ops import intersect
from sunray_tpu.scene import cornell_box, reflection_room


def random_rays(n, seed, center=(1.0, 1.0, 1.0), radius=0.0):
    g = np.random.default_rng(seed)
    o = np.asarray(center, np.float32) + g.normal(size=(n, 3)).astype(np.float32) * radius
    d = g.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def random_soup(t, seed):
    g = np.random.default_rng(seed)
    c = g.uniform(-2, 2, (t, 3)).astype(np.float32)
    e1 = g.normal(size=(t, 3)).astype(np.float32) * 0.3
    e2 = g.normal(size=(t, 3)).astype(np.float32) * 0.3
    return (
        jnp.asarray(c), jnp.asarray(c + e1), jnp.asarray(c + e2)
    )


class TestBuild:
    def test_topology_invariants(self):
        tris = random_soup(100, 0)
        b = bvh_mod.build_bvh(tris, leaf_size=2)
        nl = b.num_leaves
        assert nl == 50
        cl = np.asarray(b.child_l)
        cr = np.asarray(b.child_r)
        # Every node except the root is referenced exactly once.
        refs = np.concatenate([cl, cr])
        counts = np.bincount(refs, minlength=2 * nl - 1)
        assert counts[0] == 0  # root unreferenced
        np.testing.assert_array_equal(counts[1:], 1)
        # All triangle ids appear exactly once in leaves.
        ids = np.asarray(b.leaf_tri).ravel()
        ids = ids[ids >= 0]
        np.testing.assert_array_equal(np.sort(ids), np.arange(100))

    def test_parent_aabb_contains_children(self):
        tris = random_soup(64, 1)
        b = bvh_mod.build_bvh(tris, leaf_size=1)
        nmin = np.asarray(b.node_min)
        nmax = np.asarray(b.node_max)
        cl = np.asarray(b.child_l)
        cr = np.asarray(b.child_r)
        eps = 1e-5
        for i in range(cl.shape[0]):
            for ch in (cl[i], cr[i]):
                assert (nmin[i] <= nmin[ch] + eps).all(), (i, ch)
                assert (nmax[i] >= nmax[ch] - eps).all(), (i, ch)


class TestTraversalVsOracle:
    @pytest.mark.parametrize("leaf_size", [1, 4])
    def test_closest_matches_brute(self, leaf_size):
        scene = cornell_box()
        tris = scene.world_triangle_vertices()
        o, d = random_rays(256, 2)
        b = bvh_mod.build_bvh(tris, leaf_size=leaf_size)
        hb = bvh_mod.trace_closest_bvh(b, tris, o, d, block=64)
        ho = intersect.trace_closest_brute(tris, o, d)
        np.testing.assert_array_equal(np.asarray(hb.hit), np.asarray(ho.hit))
        m = np.asarray(ho.hit)
        np.testing.assert_allclose(
            np.asarray(hb.t)[m], np.asarray(ho.t)[m], rtol=1e-5
        )
        # Same triangle (or a coplanar twin at the same t).
        same_tri = np.asarray(hb.tri)[m] == np.asarray(ho.tri)[m]
        assert same_tri.mean() > 0.98

    def test_random_soup(self):
        tris = random_soup(500, 3)
        o, d = random_rays(200, 4, center=(0, 0, 0), radius=3.0)
        b = bvh_mod.build_bvh(tris, leaf_size=4)
        hb = bvh_mod.trace_closest_bvh(b, tris, o, d, block=64)
        ho = intersect.trace_closest_brute(tris, o, d)
        np.testing.assert_array_equal(np.asarray(hb.hit), np.asarray(ho.hit))
        m = np.asarray(ho.hit)
        np.testing.assert_allclose(
            np.asarray(hb.t)[m], np.asarray(ho.t)[m], rtol=1e-4
        )

    def test_occlusion_matches_brute(self):
        scene = cornell_box()
        tris = scene.world_triangle_vertices()
        o, d = random_rays(256, 5)
        tmax = jnp.full((256,), 1.5)
        b = bvh_mod.build_bvh(tris, leaf_size=4)
        ob = bvh_mod.trace_occluded_bvh(b, tris, o, d, tmax, block=64)
        oo = intersect.trace_occluded_brute(tris, o, d, tmax)
        np.testing.assert_array_equal(np.asarray(ob), np.asarray(oo))

    def test_occlusion_exclude(self):
        scene = cornell_box()
        tris = scene.world_triangle_vertices()
        b = bvh_mod.build_bvh(tris, leaf_size=4)
        # Ray from floor straight up at the light: occluded normally,
        # visible when the hit light triangle is excluded.
        o = jnp.asarray([[1.0, 0.01, 1.0]] * 2)
        d = jnp.asarray([[0.0, 1.0, 0.0]] * 2)
        tmax = jnp.asarray([1.985, 1.985])
        hit = bvh_mod.trace_closest_bvh(b, tris, o, d)
        tri = hit.tri
        occ0 = bvh_mod.trace_occluded_bvh(b, tris, o, d, tmax, block=64)
        occ1 = bvh_mod.trace_occluded_bvh(
            b, tris, o, d, tmax, exclude=tri, block=64
        )
        assert bool(occ0[0]) and not bool(occ1[0])

    def test_single_leaf_bvh(self):
        tris = random_soup(3, 6)
        b = bvh_mod.build_bvh(tris, leaf_size=4)
        assert b.num_leaves == 1
        o, d = random_rays(64, 7, center=(0, 0, 0), radius=3.0)
        hb = bvh_mod.trace_closest_bvh(b, tris, o, d, block=32)
        ho = intersect.trace_closest_brute(tris, o, d)
        np.testing.assert_array_equal(np.asarray(hb.hit), np.asarray(ho.hit))


class TestPipelineWithBvh:
    def test_render_matches_brute(self):
        from sunray_tpu.camera import Camera, camera_matrices
        from sunray_tpu.config import RenderConfig
        from sunray_tpu.render.pipeline import RenderState, render_frame

        scene = cornell_box()
        cam = Camera(position=(1.0, 1.0, 3.4), target=(1.0, 1.0, 0.0), fov_y=45.0)
        base = dict(
            width=48, height=32, bounces=3, virtual_bounces=2,
            ris_candidates=2, di_spatial_samples=1, gi_spatial_samples=1,
            denoise_passes=1, lighting="restir",
        )
        outs = {}
        for tracer in ("brute", "bvh"):
            cfg = RenderConfig(tracer=tracer, **base)
            mats = camera_matrices(cam, cfg.width, cfg.height)
            state = RenderState.create(cfg)
            step = jax.jit(lambda st, c=cfg: render_frame(scene, c, st, mats))
            for _ in range(2):
                state, ldr, _ = step(state)
            outs[tracer] = np.asarray(ldr)
        # A handful of pixels may differ where rays graze shared triangle
        # edges and the two tracers pick different (equal-t) winners; demand
        # near-total agreement rather than exact.
        close = np.all(
            np.abs(outs["brute"] - outs["bvh"]) < 2e-3, axis=-1
        )
        assert close.mean() > 0.995, f"only {close.mean():.4f} pixels match"
