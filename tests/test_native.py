"""Native SAH builder: build, traverse, refit — vs the brute oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from sunray_tpu.native import build_sah_bvh, get_lib
from sunray_tpu.ops import bvh as bvh_mod
from sunray_tpu.ops import intersect
from sunray_tpu.scene import cornell_box

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native toolchain unavailable"
)


def soup(t, seed):
    g = np.random.default_rng(seed)
    c = g.uniform(-2, 2, (t, 3)).astype(np.float32)
    e1 = g.normal(size=(t, 3)).astype(np.float32) * 0.3
    e2 = g.normal(size=(t, 3)).astype(np.float32) * 0.3
    return c, c + e1, c + e2


class TestSahBuild:
    def test_invariants(self):
        v0, v1, v2 = soup(200, 0)
        b = build_sah_bvh(v0, v1, v2, leaf_size=4)
        assert b is not None
        nl = b.num_leaves
        refs = np.concatenate([np.asarray(b.child_l), np.asarray(b.child_r)])
        counts = np.bincount(refs, minlength=2 * nl - 1)
        assert counts[0] == 0
        np.testing.assert_array_equal(counts[1:], 1)
        ids = np.asarray(b.leaf_tri).ravel()
        ids = ids[ids >= 0]
        np.testing.assert_array_equal(np.sort(ids), np.arange(200))
        # ranges: root covers everything
        assert int(b.range_first[0]) == 0
        assert int(b.range_last[0]) == nl - 1

    def test_traversal_matches_brute(self):
        v0, v1, v2 = soup(300, 1)
        tris = (jnp.asarray(v0), jnp.asarray(v1), jnp.asarray(v2))
        b = build_sah_bvh(v0, v1, v2, leaf_size=4)
        g = np.random.default_rng(2)
        o = jnp.asarray(g.uniform(-4, 4, (128, 3)).astype(np.float32))
        d = g.normal(size=(128, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        d = jnp.asarray(d)
        hb = bvh_mod.trace_closest_bvh(b, tris, o, d, block=64)
        ho = intersect.trace_closest_brute(tris, o, d)
        np.testing.assert_array_equal(np.asarray(hb.hit), np.asarray(ho.hit))
        m = np.asarray(ho.hit)
        np.testing.assert_allclose(
            np.asarray(hb.t)[m], np.asarray(ho.t)[m], rtol=1e-4
        )

    def test_refit_after_move(self):
        scene = cornell_box()
        tris = scene.world_triangle_vertices()
        v0, v1, v2 = (np.asarray(x) for x in tris)
        b = build_sah_bvh(v0, v1, v2, leaf_size=4)
        # Move geometry and refit: traversal must match brute on moved tris.
        shift = jnp.asarray([0.3, 0.0, -0.2])
        moved = tuple(jnp.asarray(v) + shift for v in (v0, v1, v2))
        b2 = bvh_mod.refit_bvh(b, moved)
        g = np.random.default_rng(3)
        o = jnp.asarray(
            np.tile(np.array([[1.3, 1.0, 0.8]], np.float32), (64, 1))
        )
        d = g.normal(size=(64, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        d = jnp.asarray(d)
        hb = bvh_mod.trace_closest_bvh(b2, moved, o, d, block=64)
        ho = intersect.trace_closest_brute(moved, o, d)
        np.testing.assert_array_equal(np.asarray(hb.hit), np.asarray(ho.hit))
        m = np.asarray(ho.hit)
        np.testing.assert_allclose(
            np.asarray(hb.t)[m], np.asarray(ho.t)[m], rtol=1e-4
        )

    def test_sah_tree_is_shallower_or_equal_quality(self):
        # Smoke quality check: SAH should not produce more leaves than LBVH
        # needs, and both trace correctly (covered above).
        v0, v1, v2 = soup(128, 4)
        b = build_sah_bvh(v0, v1, v2, leaf_size=4)
        assert b.num_leaves <= 128
