"""Tracer dispatch: one interface over the brute-force and BVH backends.

The structural analog of the reference's TLAS handle + TraceRay: passes ask
for closest-hit or occlusion queries and don't care how traversal happens
(accel.rs builds the structure; shaders just call TraceRay). `make_tracer`
plays the role of the BLAS/TLAS build step — it is called inside the jitted
frame function, so acceleration data is rebuilt from the (differentiable)
world geometry every frame; XLA CSEs it across passes within the frame.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from sunray_tpu.ops import intersect
from sunray_tpu.ops import bvh as bvh_mod


class TracerCtx(NamedTuple):
    tris: tuple                      # (v0, v1, v2) world-space, each (T, 3)
    bvh: Optional[object]            # ops.bvh.Bvh or None for brute force
    block: int                       # ray block size


def make_tracer(scene, cfg, accel=None) -> TracerCtx:
    """Build the per-frame tracer context.

    accel: optional prebuilt BVH topology (e.g. the native binned-SAH
    builder's output, or a cached LBVH). When provided, its boxes are
    refit against the current (differentiable) world triangles — the AS
    UPDATE path — so instance-transform animation needs no rebuild.
    """
    tris = scene.world_triangle_vertices()
    n_tris = scene.num_tris
    if accel is not None:
        return TracerCtx(
            tris=tris,
            bvh=bvh_mod.refit_bvh(accel, tris),
            block=cfg.trace_block_rays,
        )
    use_bvh = cfg.tracer == "bvh" or (
        cfg.tracer == "auto" and n_tris > cfg.brute_force_max_tris
    )
    bvh = bvh_mod.build_bvh(tris, leaf_size=cfg.bvh_leaf_size) if use_bvh else None
    return TracerCtx(tris=tris, bvh=bvh, block=cfg.trace_block_rays)


def trace_closest(ctx: TracerCtx, orig, d, tmin=intersect.T_MIN, tmax=intersect.T_MAX):
    if ctx.bvh is not None:
        return bvh_mod.trace_closest_bvh(
            ctx.bvh, ctx.tris, orig, d, tmin, tmax, block=ctx.block
        )
    return intersect.trace_closest_brute(
        ctx.tris, orig, d, tmin, tmax, block=ctx.block
    )


def trace_occluded(ctx: TracerCtx, orig, d, tmax, tmin=intersect.T_MIN,
                   exclude=None):
    """Boolean occlusion along segments. Degenerate segments (< 2e-3, the
    reference's TMax<TMin guard, e.g. ray_gen_ris.slang:287) are visible.

    exclude: per-ray triangle id to ignore — the shadow ray's own target
    triangle (a light sample or a reprojected GI surface point lies ON
    geometry; excluding it by id replaces the reference's self-occluding
    absolute TMax epsilon)."""
    tmax = jnp.asarray(tmax)
    degenerate = tmax - tmin <= intersect.T_MIN
    if ctx.bvh is not None:
        occ = bvh_mod.trace_occluded_bvh(
            ctx.bvh, ctx.tris, orig, d, tmax - 1e-3, tmin, exclude,
            block=ctx.block,
        )
    else:
        occ = intersect.trace_occluded_brute(
            ctx.tris, orig, d, tmax - 1e-3, tmin, block=ctx.block,
            exclude=exclude,
        )
    return occ & ~degenerate
