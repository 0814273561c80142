"""Pallas TPU kernel: small-table row gather as a one-hot MXU matmul.

Why: per-pixel attribute fetches from small tables (vertices, instance
transforms, materials, lights — closest_hit.slang:31-87's buffer loads)
can't use XLA's dynamic gather on TPU (serializes at ~25 ns/scalar when
the table misses scoped VMEM) and currently run as per-row compare+select
chains (ops/linalg.gather_cols). The chains fuse into every consumer and
get RECOMPUTED per fusion: the round-3 device profile shows 9 shade-pass
fusions of 600-730 selects each costing 29.4 ms/frame at 1080p — 17% of
the whole frame on the VPU re-deciding the same winner rows.

Here the gather is one MXU contraction per table: out[c, n] =
sum_k table[c, k] * onehot[k, n] with onehot[k, n] = (k == idx[n]). The
one-hot never exists in HBM — it's built in VMEM per 2048-lane block —
and the MXU does the selection at matmul speed. Precision: the one-hot
entries are exactly 0/1 and each output column sums exactly one table
entry, so a HIGHEST-precision (bf16x3) pass reproduces the f32 table
values bit-exactly (validated in tests/test_pallas_gather.py).

Output layout is (C, N): table components on sublanes, lanes = the 2M
pixel axis — the tile-padding-free orientation (CLAUDE.md: never
materialize tiny trailing dims). Callers receive (N,) column slices.

Int tables ride the same path via f32 staging (exact to 2^24 — indices
and texture slots are far below).

Gradients: custom_vjp; the backward scatters the cotangent back to the
table rows with a segment-sum (the exact adjoint of the clamped gather).
TPU-only and inference-hot; CPU keeps gather_cols' chains/gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BLOCK = 8192   # indices per grid step (lanes; multiple of 128). The
               # in-VMEM one-hot is (Kp, BLOCK) f32 — 4 MB at Kp=128;
               # tables padded past 256 rows drop to BLOCK/4 to stay
               # under the ~16 MB VMEM budget.
MIN_ROWS = 16   # below this a select chain is ~free and FUSES into its
                # consumers — a kernel launch would add an HBM round trip
                # (the everything-onehot A/B regressed 170.8 -> 266.5 ms
                # largely on tiny-table and walk-loop gathers).
MAX_ROWS = 512  # beyond this the MXU pass cost scales linearly; tables
                # larger than this use bvh-style packed/banded gathers.


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(idx_ref, tab_ref, out_ref, *, k_real):
    idx = jnp.clip(idx_ref[0, :], 0, k_real - 1)          # (B,) int32
    b = idx.shape[0]
    kp = tab_ref.shape[1]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (kp, b), 0) == idx[None, :]
    ).astype(jnp.float32)                                  # (Kp, B) in VMEM
    out_ref[...] = jax.lax.dot_general(
        tab_ref[...], onehot,
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )                                                      # (Cp, B)


def _pad_to(x, m):
    return -(-x // m) * m


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _onehot_gather(tab_t, idx):
    """tab_t: (C, K) f32 table, transposed. idx: (N,) int32.
    Returns (C, N) f32 rows gathered by clamped index."""
    return _onehot_gather_fwd_impl(tab_t, idx)


def _onehot_gather_fwd_impl(tab_t, idx):
    c, k = tab_t.shape
    n = idx.shape[0]
    cp = _pad_to(c, 8)
    kp = _pad_to(k, 128)
    block = BLOCK if kp <= 256 else BLOCK // 4
    np_ = _pad_to(max(n, block), block)
    tab_p = jnp.zeros((cp, kp), jnp.float32).at[:c, :k].set(tab_t)
    idx_p = jnp.zeros((1, np_), jnp.int32).at[0, :n].set(idx)
    out = pl.pallas_call(
        functools.partial(_kernel, k_real=k),
        name="onehot_gather",
        grid=(np_ // block,),
        in_specs=[
            pl.BlockSpec((1, block), lambda j: (0, j)),
            pl.BlockSpec((cp, kp), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((cp, block), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((cp, np_), jnp.float32),
        interpret=_interpret(),
    )(idx_p, tab_p)
    return out[:c, :n]


def _onehot_gather_fwd(tab_t, idx):
    out = _onehot_gather_fwd_impl(tab_t, idx)
    return out, (idx, tab_t.shape[1])


def _onehot_gather_bwd(res, ct):
    idx, k = res
    cidx = jnp.clip(idx, 0, k - 1)
    # d table[c, r] = sum_{n: clamp(idx[n]) == r} ct[c, n]
    dtab = jax.ops.segment_sum(ct.T, cidx, num_segments=k).T   # (C, K)
    return dtab, None


_onehot_gather.defvjp(_onehot_gather_fwd, _onehot_gather_bwd)


def _kernel_multi(idx_ref, tab_ref, out_ref, *, k_real, g, cp):
    kp = tab_ref.shape[1]
    b = idx_ref.shape[1]
    for i in range(g):
        idx = jnp.clip(idx_ref[i, :], 0, k_real - 1)        # (B,)
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (kp, b), 0) == idx[None, :]
        ).astype(jnp.float32)
        out_ref[i * cp:(i + 1) * cp, :] = jax.lax.dot_general(
            tab_ref[...], onehot,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _onehot_gather_multi(tab_t, idx):
    """tab_t: (C, K) f32. idx: (G, N) int32 — G index vectors into the SAME
    table, one kernel launch (the table rides VMEM once instead of G
    times; shade's 3 triangle-corner gathers are the canonical caller).
    Returns (G, C, N) f32."""
    return _onehot_gather_multi_fwd_impl(tab_t, idx)


def _onehot_gather_multi_fwd_impl(tab_t, idx):
    c, k = tab_t.shape
    g, n = idx.shape
    cp = _pad_to(c, 8)
    kp = _pad_to(k, 128)
    # Smaller blocks than the single-index kernel: the per-corner one-hots
    # are live together inside one grid step (G x (Kp, B) f32 in VMEM).
    block = (BLOCK // 2) if kp <= 256 else BLOCK // 8
    np_ = _pad_to(max(n, block), block)
    tab_p = jnp.zeros((cp, kp), jnp.float32).at[:c, :k].set(tab_t)
    idx_p = jnp.zeros((g, np_), jnp.int32).at[:, :n].set(idx)
    out = pl.pallas_call(
        functools.partial(_kernel_multi, k_real=k, g=g, cp=cp),
        name="onehot_gather_multi",
        grid=(np_ // block,),
        in_specs=[
            pl.BlockSpec((g, block), lambda j: (0, j)),
            pl.BlockSpec((cp, kp), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((g * cp, block), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((g * cp, np_), jnp.float32),
        interpret=_interpret(),
    )(idx_p, tab_p)
    return out.reshape(g, cp, np_)[:, :c, :n]


def _onehot_gather_multi_fwd(tab_t, idx):
    out = _onehot_gather_multi_fwd_impl(tab_t, idx)
    return out, (idx, tab_t.shape[1])


def _onehot_gather_multi_bwd(res, ct):
    idx, k = res
    g = idx.shape[0]
    cidx = jnp.clip(idx, 0, k - 1)
    dtab = sum(
        jax.ops.segment_sum(ct[i].T, cidx[i], num_segments=k).T
        for i in range(g)
    )                                                         # (C, K)
    return dtab, None


_onehot_gather_multi.defvjp(_onehot_gather_multi_fwd,
                            _onehot_gather_multi_bwd)


def onehot_gather_cols_multi(table, idx_list):
    """Gather rows of one small (K, C...) table by G index vectors in a
    single kernel launch. Returns a list of G tuples of C (N,) columns
    (same contract as onehot_gather_cols per index)."""
    flat = table.reshape(table.shape[0], -1)
    k, c = flat.shape
    orig_dtype = flat.dtype
    idx = jnp.stack([i.reshape(-1).astype(jnp.int32) for i in idx_list])
    out = _onehot_gather_multi(flat.T.astype(jnp.float32), idx)  # (G, C, N)
    res = []
    for gi in range(len(idx_list)):
        if orig_dtype != jnp.float32:
            res.append(tuple(out[gi, cc].astype(orig_dtype)
                             for cc in range(c)))
        else:
            res.append(tuple(out[gi, cc] for cc in range(c)))
    return res


def onehot_gather_cols(table, idx):
    """Gather rows of a small (K, C...) table by (N,) int index on the MXU,
    returning a tuple of C (N,)-shaped f32 columns (gather_cols contract:
    out-of-range indices clamp; callers mask invalid lanes).

    Drop-in for ops.linalg.gather_cols' select-chain branch on TPU.
    """
    flat = table.reshape(table.shape[0], -1)
    k, c = flat.shape
    orig_dtype = flat.dtype
    idx = idx.reshape(-1).astype(jnp.int32)
    out = _onehot_gather(flat.T.astype(jnp.float32), idx)     # (C, N)
    if orig_dtype != jnp.float32:
        return tuple(out[cc].astype(orig_dtype) for cc in range(c))
    return tuple(out[cc] for cc in range(c))
