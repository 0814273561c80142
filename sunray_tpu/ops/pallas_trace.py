"""Pallas TPU kernels for ray-triangle intersection (brute-force path).

Why: the jnp formulation materializes ~10 (rays x tris) intermediates in
HBM per trace, each lane-padded (T=36 -> 128), costing ~75 ms per 2M-ray
closest-hit query on v5e. In Pallas the (T_tile, B) working set lives in
VMEM and only the (B,) results leave the chip: the kernel is VPU
compute-bound instead of HBM-bound.

Layout: rays SoA-transposed to (3, N) so the ray axis is the 128-wide lane
dimension; triangles broadcast along sublanes in T-tiles. Grid over ray
blocks; inner fori over triangle tiles with running-best reduction.

Used for scenes under the brute-force threshold; the BVH path has its own
traversal (Pallas variant later). Numerically identical to
ops.intersect.moller_trumbore (same epsilons, same tie-breaking by lowest
t with argmin over tiles).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sunray_tpu.ops import intersect

BLOCK_RAYS = 2048      # lanes per kernel invocation (multiple of 128)
TRI_TILE = 64          # triangles per inner tile (sublanes, multiple of 8)
DET_EPS = intersect.DET_EPS


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_tris(tris):
    """Pad triangle count to a TRI_TILE multiple with degenerate tris."""
    v0, v1, v2 = tris
    t = v0.shape[0]
    tp = -(-t // TRI_TILE) * TRI_TILE
    if tp != t:
        pad = ((0, tp - t), (0, 0))
        v0 = jnp.pad(v0, pad)
        v1 = jnp.pad(v1, pad)
        v2 = jnp.pad(v2, pad)
    return (v0, v1, v2), t, tp


def _closest_kernel(o_ref, d_ref, v0_ref, v1_ref, v2_ref, tn_ref, tx_ref,
                    t_out, tri_out, u_out, v_out, *, n_tris, tiles):
    ox = o_ref[0, :]
    oy = o_ref[1, :]
    oz = o_ref[2, :]
    dx = d_ref[0, :]
    dy = d_ref[1, :]
    dz = d_ref[2, :]
    tmin = tn_ref[0, :]
    tmax = tx_ref[0, :]

    b = ox.shape[0]
    best_t = jnp.full((b,), jnp.inf, jnp.float32)
    best_tri = jnp.full((b,), -1, jnp.int32)
    best_u = jnp.zeros((b,), jnp.float32)
    best_v = jnp.zeros((b,), jnp.float32)

    def tile_body(ti, carry):
        best_t, best_tri, best_u, best_v = carry
        s = ti * TRI_TILE
        a0 = v0_ref[pl.ds(s, TRI_TILE), :]      # (T, 3)
        a1 = v1_ref[pl.ds(s, TRI_TILE), :]
        a2 = v2_ref[pl.ds(s, TRI_TILE), :]

        e1x = (a1[:, 0] - a0[:, 0])[:, None]    # (T, 1)
        e1y = (a1[:, 1] - a0[:, 1])[:, None]
        e1z = (a1[:, 2] - a0[:, 2])[:, None]
        e2x = (a2[:, 0] - a0[:, 0])[:, None]
        e2y = (a2[:, 1] - a0[:, 1])[:, None]
        e2z = (a2[:, 2] - a0[:, 2])[:, None]

        # pvec = d x e2, broadcast (T, B)
        px = dy[None, :] * e2z - dz[None, :] * e2y
        py = dz[None, :] * e2x - dx[None, :] * e2z
        pz = dx[None, :] * e2y - dy[None, :] * e2x
        det = e1x * px + e1y * py + e1z * pz
        det_ok = jnp.abs(det) > DET_EPS
        inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)

        tx_ = ox[None, :] - a0[:, 0][:, None]
        ty_ = oy[None, :] - a0[:, 1][:, None]
        tz_ = oz[None, :] - a0[:, 2][:, None]
        uu = (tx_ * px + ty_ * py + tz_ * pz) * inv_det
        qx = ty_ * e1z - tz_ * e1y
        qy = tz_ * e1x - tx_ * e1z
        qz = tx_ * e1y - ty_ * e1x
        vv = (dx[None, :] * qx + dy[None, :] * qy + dz[None, :] * qz) * inv_det
        tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det

        tri_ids = s + jax.lax.broadcasted_iota(jnp.int32, (TRI_TILE, 1), 0)
        valid = (
            det_ok
            & (uu >= 0.0)
            & (vv >= 0.0)
            & (uu + vv <= 1.0)
            & (tt >= tmin[None, :])
            & (tt <= tmax[None, :])
            & (tri_ids < n_tris)
        )
        tt = jnp.where(valid, tt, jnp.inf)
        k = jnp.argmin(tt, axis=0)              # (B,)
        sel = jax.lax.broadcasted_iota(jnp.int32, tt.shape, 0) == k[None, :]
        tile_t = jnp.min(tt, axis=0)
        tile_tri = jnp.max(
            jnp.where(sel, jnp.broadcast_to(tri_ids, tt.shape), -1), axis=0
        )
        tile_u = jnp.max(jnp.where(sel, uu, -jnp.inf), axis=0)
        tile_v = jnp.max(jnp.where(sel, vv, -jnp.inf), axis=0)

        better = tile_t < best_t
        best_t = jnp.where(better, tile_t, best_t)
        best_tri = jnp.where(better, tile_tri, best_tri)
        best_u = jnp.where(better, tile_u, best_u)
        best_v = jnp.where(better, tile_v, best_v)
        return best_t, best_tri, best_u, best_v

    best_t, best_tri, best_u, best_v = jax.lax.fori_loop(
        0, tiles, tile_body, (best_t, best_tri, best_u, best_v)
    )
    t_out[0, :] = best_t
    tri_out[0, :] = best_tri
    u_out[0, :] = best_u
    v_out[0, :] = best_v


def trace_closest_pallas(tris, orig, d, tmin=intersect.T_MIN,
                         tmax=intersect.T_MAX) -> intersect.Hit:
    """Closest hit over all triangles, Pallas kernel. tris: each (T, 3)."""
    orig = orig.reshape(-1, 3)
    d = d.reshape(-1, 3)
    n = orig.shape[0]
    (v0, v1, v2), n_tris, tp = _pad_tris(tris)
    tiles = tp // TRI_TILE

    nb = -(-n // BLOCK_RAYS)
    npad = nb * BLOCK_RAYS - n
    o_t = jnp.pad(orig, ((0, npad), (0, 0))).T          # (3, N)
    d_t = jnp.pad(d, ((0, npad), (0, 0)), constant_values=1.0).T
    tn = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,))
    tx = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    tn = jnp.pad(tn, (0, npad))[None]                   # (1, N)
    tx = jnp.pad(tx, (0, npad))[None]

    kernel = functools.partial(_closest_kernel, n_tris=n_tris, tiles=tiles)
    grid = (nb,)
    ray_spec = pl.BlockSpec(
        (3, BLOCK_RAYS), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    scal_spec = pl.BlockSpec(
        (1, BLOCK_RAYS), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    tri_spec = pl.BlockSpec(
        (tp, 3), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out_specs = [
        pl.BlockSpec((1, BLOCK_RAYS), lambda i: (0, i), memory_space=pltpu.VMEM)
        for _ in range(4)
    ]
    t_o, tri_o, u_o, v_o = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[ray_spec, ray_spec, tri_spec, tri_spec, tri_spec,
                  scal_spec, scal_spec],
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((1, nb * BLOCK_RAYS), jnp.float32),
            jax.ShapeDtypeStruct((1, nb * BLOCK_RAYS), jnp.int32),
            jax.ShapeDtypeStruct((1, nb * BLOCK_RAYS), jnp.float32),
            jax.ShapeDtypeStruct((1, nb * BLOCK_RAYS), jnp.float32),
        ],
        interpret=_interpret(),
    )(o_t, d_t, v0, v1, v2, tn, tx)

    t_r = t_o[0, :n]
    tri_r = tri_o[0, :n]
    return intersect.Hit(
        t=t_r,
        tri=jnp.maximum(tri_r, 0),
        u=u_o[0, :n],
        v=v_o[0, :n],
        hit=tri_r >= 0,
    )


def _occluded_kernel(o_ref, d_ref, v0_ref, v1_ref, v2_ref, tn_ref, tx_ref,
                     ex_ref, occ_out, *, n_tris, tiles, use_exclude):
    ox = o_ref[0, :]
    oy = o_ref[1, :]
    oz = o_ref[2, :]
    dx = d_ref[0, :]
    dy = d_ref[1, :]
    dz = d_ref[2, :]
    tmin = tn_ref[0, :]
    tmax = tx_ref[0, :]
    b = ox.shape[0]

    def tile_body(ti, occ):
        s = ti * TRI_TILE
        a0 = v0_ref[pl.ds(s, TRI_TILE), :]
        a1 = v1_ref[pl.ds(s, TRI_TILE), :]
        a2 = v2_ref[pl.ds(s, TRI_TILE), :]
        e1x = (a1[:, 0] - a0[:, 0])[:, None]
        e1y = (a1[:, 1] - a0[:, 1])[:, None]
        e1z = (a1[:, 2] - a0[:, 2])[:, None]
        e2x = (a2[:, 0] - a0[:, 0])[:, None]
        e2y = (a2[:, 1] - a0[:, 1])[:, None]
        e2z = (a2[:, 2] - a0[:, 2])[:, None]
        px = dy[None, :] * e2z - dz[None, :] * e2y
        py = dz[None, :] * e2x - dx[None, :] * e2z
        pz = dx[None, :] * e2y - dy[None, :] * e2x
        det = e1x * px + e1y * py + e1z * pz
        det_ok = jnp.abs(det) > DET_EPS
        inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
        tx_ = ox[None, :] - a0[:, 0][:, None]
        ty_ = oy[None, :] - a0[:, 1][:, None]
        tz_ = oz[None, :] - a0[:, 2][:, None]
        uu = (tx_ * px + ty_ * py + tz_ * pz) * inv_det
        qx = ty_ * e1z - tz_ * e1y
        qy = tz_ * e1x - tx_ * e1z
        qz = tx_ * e1y - ty_ * e1x
        vv = (dx[None, :] * qx + dy[None, :] * qy + dz[None, :] * qz) * inv_det
        tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
        tri_ids = s + jax.lax.broadcasted_iota(jnp.int32, (TRI_TILE, 1), 0)
        valid = (
            det_ok
            & (uu >= 0.0)
            & (vv >= 0.0)
            & (uu + vv <= 1.0)
            & (tt >= tmin[None, :])
            & (tt <= tmax[None, :])
            & (tri_ids < n_tris)
        )
        if use_exclude:
            ex = ex_ref[0, :]
            valid = valid & (jnp.broadcast_to(tri_ids, valid.shape) != ex[None, :])
        return occ | jnp.any(valid, axis=0)

    occ = jax.lax.fori_loop(0, tiles, tile_body, jnp.zeros((b,), bool))
    occ_out[0, :] = occ


def trace_occluded_pallas(tris, orig, d, tmax, tmin=intersect.T_MIN,
                          exclude=None):
    orig = orig.reshape(-1, 3)
    d = d.reshape(-1, 3)
    n = orig.shape[0]
    (v0, v1, v2), n_tris, tp = _pad_tris(tris)
    tiles = tp // TRI_TILE

    nb = -(-n // BLOCK_RAYS)
    npad = nb * BLOCK_RAYS - n
    o_t = jnp.pad(orig, ((0, npad), (0, 0))).T
    d_t = jnp.pad(d, ((0, npad), (0, 0)), constant_values=1.0).T
    tn = jnp.pad(
        jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (n,)), (0, npad)
    )[None]
    tx = jnp.pad(jnp.asarray(tmax, jnp.float32).reshape(-1), (0, npad))[None]
    use_exclude = exclude is not None
    ex = (
        jnp.pad(jnp.asarray(exclude, jnp.int32).reshape(-1), (0, npad),
                constant_values=-1)[None]
        if use_exclude
        else jnp.full((1, nb * BLOCK_RAYS), -1, jnp.int32)
    )

    kernel = functools.partial(
        _occluded_kernel, n_tris=n_tris, tiles=tiles, use_exclude=use_exclude
    )
    ray_spec = pl.BlockSpec((3, BLOCK_RAYS), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    scal_spec = pl.BlockSpec((1, BLOCK_RAYS), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((tp, 3), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    occ = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[ray_spec, ray_spec, tri_spec, tri_spec, tri_spec,
                  scal_spec, scal_spec, scal_spec],
        out_specs=pl.BlockSpec((1, BLOCK_RAYS), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, nb * BLOCK_RAYS), bool),
        interpret=_interpret(),
    )(o_t, d_t, v0, v1, v2, tn, tx, ex)
    return occ[0, :n]
