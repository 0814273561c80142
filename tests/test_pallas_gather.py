"""One-hot MXU gather kernel (ops/pallas_gather.py) vs the gather_cols
reference: exactness (bit-identical f32), clamping semantics, int tables,
padding edges, and the segment-sum backward."""

import jax
import jax.numpy as jnp
import numpy as np

from sunray_tpu.ops.linalg import gather_cols
from sunray_tpu.ops.pallas_gather import BLOCK, onehot_gather_cols


def _ref(table, idx):
    flat = np.asarray(table).reshape(table.shape[0], -1)
    cidx = np.clip(np.asarray(idx), 0, flat.shape[0] - 1)
    return tuple(flat[cidx, cc] for cc in range(flat.shape[1]))


def test_matches_reference_f32():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((37, 11)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 37, size=5000), jnp.int32)
    got = onehot_gather_cols(table, idx)
    want = _ref(table, idx)
    assert len(got) == 11
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), w)


def test_block_boundary_sizes():
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.standard_normal((8, 3)), jnp.float32)
    for n in (1, 127, BLOCK, BLOCK + 1, 3 * BLOCK):
        idx = jnp.asarray(rng.integers(0, 8, size=n), jnp.int32)
        got = onehot_gather_cols(table, idx)
        want = _ref(table, idx)
        for g, w in zip(got, want):
            assert g.shape == (n,)
            np.testing.assert_array_equal(np.asarray(g), w)


def test_out_of_range_clamps():
    table = jnp.asarray(np.arange(12, dtype=np.float32).reshape(6, 2))
    idx = jnp.asarray([-5, -1, 0, 5, 6, 99], jnp.int32)
    got = onehot_gather_cols(table, idx)
    want = _ref(table, idx)   # np.clip semantics
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), w)


def test_int_table_roundtrip():
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.integers(0, 1 << 20, size=(19, 5)), jnp.int32)
    idx = jnp.asarray(rng.integers(0, 19, size=777), jnp.int32)
    got = onehot_gather_cols(table, idx)
    want = _ref(table, idx)
    for g, w in zip(got, want):
        assert g.dtype == jnp.int32
        np.testing.assert_array_equal(np.asarray(g), w)


def test_multidim_components():
    rng = np.random.default_rng(3)
    table = jnp.asarray(rng.standard_normal((9, 2, 3)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 9, size=300), jnp.int32)
    got = onehot_gather_cols(table, idx)
    want = _ref(table, idx)
    assert len(got) == 6
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), w)


def test_backward_segment_sum():
    rng = np.random.default_rng(4)
    table = jnp.asarray(rng.standard_normal((13, 4)), jnp.float32)
    idx = jnp.asarray(rng.integers(-2, 16, size=400), jnp.int32)
    wts = jnp.asarray(rng.standard_normal((4, 400)), jnp.float32)

    def loss(tab):
        cols = onehot_gather_cols(tab, idx)
        return sum(jnp.sum(c * wts[k]) for k, c in enumerate(cols))

    g = jax.grad(loss)(table)
    # Reference adjoint: accumulate weights at the clamped rows.
    want = np.zeros((13, 4), np.float32)
    cidx = np.clip(np.asarray(idx), 0, 12)
    for n in range(400):
        for k in range(4):
            want[cidx[n], k] += float(wts[k, n])
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-5, atol=1e-5)


def test_gather_cols_dispatch_unchanged_on_cpu():
    """On CPU gather_cols must keep its existing paths (the one-hot branch
    is TPU-only); this guards the dispatch wiring."""
    rng = np.random.default_rng(5)
    table = jnp.asarray(rng.standard_normal((21, 3)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 21, size=100), jnp.int32)
    got = gather_cols(table, idx)
    want = _ref(table, idx)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), w)


def test_multi_index_matches_single():
    """One launch with G index vectors must equal G single-index gathers,
    forward and backward (shade's 3-corner fetch contract)."""
    from sunray_tpu.ops.pallas_gather import (
        onehot_gather_cols,
        onehot_gather_cols_multi,
    )

    rng = np.random.default_rng(6)
    table = jnp.asarray(rng.standard_normal((33, 10)), jnp.float32)
    idxs = [jnp.asarray(rng.integers(0, 33, size=500), jnp.int32)
            for _ in range(3)]
    multi = onehot_gather_cols_multi(table, idxs)
    for g in range(3):
        single = onehot_gather_cols(table, idxs[g])
        for cm, cs in zip(multi[g], single):
            np.testing.assert_array_equal(np.asarray(cm), np.asarray(cs))

    def loss_multi(tab):
        outs = onehot_gather_cols_multi(tab, idxs)
        return sum(jnp.sum(jnp.sin(c)) for g in outs for c in g)

    def loss_single(tab):
        return sum(
            jnp.sum(jnp.sin(c))
            for i in idxs for c in onehot_gather_cols(tab, i)
        )

    gm = jax.grad(loss_multi)(table)
    gs = jax.grad(loss_single)(table)
    np.testing.assert_allclose(np.asarray(gm), np.asarray(gs),
                               rtol=1e-6, atol=1e-6)
