"""Pallas TPU kernel: the whole ReSTIR DI candidate audition in VMEM.

ray_gen_ris.slang:189-231 — K rounds of weighted reservoir sampling
against the unshadowed target. The batched jnp formulation
(restir.ris_audition) still materializes every intermediate plane in HBM
(draws, per-candidate light samples, p_hat, the merge chain) and profiled
~23 ms/frame at 1080p; algorithmically the audition touches only ~60
floats of input and ~10 of output per pixel. This kernel runs the whole
thing per 4096-pixel block with ZERO HBM intermediates:

  - pixels ride (8, 512) tiles (full sublane occupancy — a first cut
    used (1, B) row vectors and ran at 1/8 VPU throughput, costing MORE
    than the jnp planes);
  - the PCG draw chain (rt_utils.slang:54-59) runs in uint32 registers
    (Mosaic has no uint32->f32 cast; draws reconstruct via a 31-bit
    split, exact to one ulp of u);
  - candidate light rows come from a per-row select chain over the
    VMEM-resident light table (Mosaic rejects per-lane dynamic VMEM
    indexing; scenes with > MAX_LIGHTS lights use the jnp path);
  - the GGX/Lambert p_hat evaluation (rt_utils.slang:203-234), the
    sequential reservoir chain, and the winner's W resolve
    (ray_gen_ris.slang:225-231) all run in registers.

Op-for-op the math follows restir._ris_audition_sequential, so results
match the jnp paths to FMA-contraction noise (a last-ulp difference can
flip a reservoir take — the equivalence test uses the same tolerance
scheme as the batched-taps oracle). Gradients route through the jnp
reference (the dispatcher keeps differentiable frames on jnp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

SUB = 8            # sublane rows per plane
LANES = 512        # lanes per block
BLOCK = SUB * LANES
MAX_LIGHTS = 32      # select-chain bound; bigger tables use the MXU fetch
RES_PLANES = 13      # DI-spatial reservoir block planes: pos 3, normal 3,
                     # W, M, idx, emission 3, ok
ONEHOT_MAX = 512     # direct one-hot fetch bound; bigger tables presample
TILE = 128           # presampled-tile size (lights per ray block)
N_TILES = 128        # distinct tiles per frame (RTXDI-style presampling)


def kernel_max_lights() -> int:
    """Round 3 capped the fused kernels at MAX_LIGHTS=32 (select chain)
    and silently fell back to jnp above it. The cap is lifted: 33..512
    lights fetch via an in-kernel one-hot MXU contraction (exact), and
    larger tables (the reference's 65,536-slot arena,
    resource_manager.rs:14) go through per-ray-block presampled tiles
    (ris_fetch_mode() == 'presampled'). Kept for provenance: the value
    above which the audition switches from EXACT uniform sampling to the
    presampled two-level estimator."""
    return ONEHOT_MAX


def ris_fetch_mode(num_lights: int) -> str:
    """Which in-kernel light-fetch strategy the audition uses."""
    if num_lights <= MAX_LIGHTS:
        return "select"
    if num_lights <= ONEHOT_MAX:
        return "onehot"
    return "presampled"
_A = 747796405
_C = 2891336453
_INV_U32_MAX = 1.0 / 4294967295.0
PI = 3.14159  # rt_utils.slang's constant (ops/brdf.py)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _rnd(seed):
    """One PCG draw on an (8, L) uint32 tile; returns (seed', u f32).

    Draw reconstruction is exact to one ulp of u (see module docstring);
    the SEED chain stays uint32-exact."""
    seed = seed * jnp.uint32(_A) + jnp.uint32(_C)
    shift = (seed >> 28) + jnp.uint32(4)
    word = ((seed >> shift) ^ seed) * jnp.uint32(277803737)
    result = (word >> 22) ^ word
    hi = jax.lax.bitcast_convert_type(result >> 1, jnp.int32)
    lo = jax.lax.bitcast_convert_type(result & jnp.uint32(1), jnp.int32)
    u = (hi.astype(jnp.float32) * 2.0 + lo.astype(jnp.float32)) * (
        jnp.float32(_INV_U32_MAX)
    )
    return seed, u


def _fetch_cols(tab_ref, idx, rows, n_cols, fetch):
    """Per-pixel light-row fetch from the VMEM-resident (16, rows_p) tab
    block at row index idx ((8, LANES) int32). Returns n_cols (8, LANES)
    f32 planes.

    fetch="select": compare+select chain over `rows` rows — cheapest for
    tiny tables (the round-3 proven path, rows <= MAX_LIGHTS).
    fetch="onehot": one (16, rows_p) @ (rows_p, LANES) MXU contraction
    per sublane row (the ops/pallas_gather pattern, in-kernel): the
    one-hot is exact 0/1 so HIGHEST-precision reproduces the f32 table
    bit-exactly; cost scales with rows_p but rides the MXU instead of an
    O(rows) VPU chain."""
    if fetch == "select":
        vals = [jnp.zeros(idx.shape, jnp.float32) for _ in range(n_cols)]
        for row in range(rows):
            m = idx == row
            for c in range(n_cols):
                vals[c] = jnp.where(m, tab_ref[c, row], vals[c])
        return vals
    tab = tab_ref[...]                                 # (16, rows_p)
    rows_p = tab.shape[1]
    lanes = idx.shape[1]
    per_row = []
    for r in range(SUB):
        idx_row = idx[r, :]                            # (lanes,)
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (rows_p, lanes), 0)
            == idx_row[None, :]
        ).astype(jnp.float32)                          # (rows_p, lanes) VMEM
        per_row.append(jax.lax.dot_general(
            tab, onehot, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ))                                             # (16, lanes)
    return [
        jnp.stack([per_row[r][c, :] for r in range(SUB)], axis=0)
        for c in range(n_cols)
    ]


def _kernel(attr_ref, seed_ref, en_ref, tab_ref, out_ref, *, k, num_lights,
            fetch, tiled, tab_rows):
    """attr (128, L): rows 8i..8i+7 = plane i — 0-2 pos, 3-5 normal,
                      6-8 view, 9-11 albedo, 12 rough, 13 metal.
       seed (8, L) uint32; en (8, L) int32 (1 = enabled).
       tab  (16, Lp): rows 0-8 v0/v1/v2 xyz, 9-11 emission, 12 global
                      light index (f32-encoded, presampled tiles only).
       out  (128, L): planes 0-2 light_pos, 3-5 light_normal, 6 w_sum,
                      7 M, 8 light_idx (bitcast i32), 9 W, 15 seed'.
       tiled: tab block is a presampled TILE of tab_rows entries drawn
       uniformly (with replacement) from the full num_lights table —
       candidates pick a tile-local row but resolve p_y against the
       GLOBAL uniform pdf (two-level RIS, see ris_audition_pallas)."""

    def attr(i):
        return attr_ref[8 * i : 8 * i + 8, :]

    px = [attr(0), attr(1), attr(2)]
    nx = [attr(3), attr(4), attr(5)]
    vx = [attr(6), attr(7), attr(8)]
    al = [attr(9), attr(10), attr(11)]
    rough = attr(12)
    metal = attr(13)
    enable = en_ref[...] > 0
    seed = seed_ref[...]

    ndv = jnp.maximum(
        nx[0] * vx[0] + nx[1] * vx[1] + nx[2] * vx[2], 0.001
    )
    a_r = rough * rough
    a2 = a_r * a_r

    def eval_p_hat(lpos, lnrm, em):
        l = [lpos[c] - px[c] for c in range(3)]
        d2 = l[0] * l[0] + l[1] * l[1] + l[2] * l[2]
        dist = jnp.maximum(jnp.sqrt(jnp.maximum(d2, 1e-20)), 1e-4)
        l = [l[c] / dist for c in range(3)]
        ndl = jnp.maximum(nx[0] * l[0] + nx[1] * l[1] + nx[2] * l[2], 0.0)
        cos_light = jnp.maximum(
            -(lnrm[0] * l[0] + lnrm[1] * l[1] + lnrm[2] * l[2]), 0.0
        )
        lit = (ndl > 0.0) & (cos_light > 0.0)
        h = [vx[c] + l[c] for c in range(3)]
        h_n = jnp.maximum(
            jnp.sqrt(jnp.maximum(h[0] * h[0] + h[1] * h[1]
                                 + h[2] * h[2], 1e-20)), 1e-12
        )
        h = [h[c] / h_n for c in range(3)]
        ndh = jnp.maximum(nx[0] * h[0] + nx[1] * h[1] + nx[2] * h[2], 0.0)
        vdh = jnp.maximum(vx[0] * h[0] + vx[1] * h[1] + vx[2] * h[2], 0.0)
        denom = ndh * ndh * (a2 - 1.0) + 1.0
        d_term = a2 / (PI * denom * denom)
        ggx_v = ndl * jnp.sqrt(ndv * ndv * (1.0 - a2) + a2)
        ggx_l = ndv * jnp.sqrt(ndl * ndl * (1.0 - a2) + a2)
        v_term = 0.5 / jnp.maximum(ggx_v + ggx_l, 1e-4)
        fres5 = (1.0 - vdh) ** 5
        geometry = ndl * cos_light / jnp.maximum(dist * dist, 1e-4)
        p_hat = None
        for c in range(3):
            f0 = 0.04 * (1.0 - metal) + al[c] * metal
            f = f0 + (1.0 - f0) * fres5
            specular = d_term * v_term * f
            diffuse = al[c] * (1.0 - metal) * (1.0 - f) / PI
            out_c = em[c] * (diffuse + specular) * geometry
            out_c = jnp.where(lit, out_c, 0.0)
            p_hat = out_c if p_hat is None else jnp.maximum(p_hat, out_c)
        return p_hat

    zero = jnp.zeros_like(rough)
    w_sum = zero
    r_idx = jnp.zeros_like(en_ref[...])
    r_pos = [zero, zero, zero]
    r_nrm = [zero, zero, zero]
    r_em = [zero, zero, zero]

    pick_range = tab_rows if tiled else num_lights
    n_cols = 13 if tiled else 12

    for _ in range(k):
        seed, u_pick = _rnd(seed)
        idx = jnp.minimum(
            (u_pick * pick_range).astype(jnp.int32), pick_range - 1
        )
        seed, u1 = _rnd(seed)
        seed, u2 = _rnd(seed)
        cols = _fetch_cols(tab_ref, idx, tab_rows, n_cols, fetch)
        v0 = cols[0:3]
        v1 = cols[3:6]
        v2 = cols[6:9]
        em = cols[9:12]
        gidx = cols[12].astype(jnp.int32) if tiled else idx
        e1 = [v1[c] - v0[c] for c in range(3)]
        e2 = [v2[c] - v0[c] for c in range(3)]
        cr = [
            e1[1] * e2[2] - e1[2] * e2[1],
            e1[2] * e2[0] - e1[0] * e2[2],
            e1[0] * e2[1] - e1[1] * e2[0],
        ]
        cr_n = jnp.sqrt(jnp.maximum(
            cr[0] * cr[0] + cr[1] * cr[1] + cr[2] * cr[2], 1e-20
        ))
        area = 0.5 * cr_n
        nn = jnp.maximum(cr_n, 1e-12)
        nrm = [cr[c] / nn for c in range(3)]
        sqr1 = jnp.sqrt(u1)
        bu = 1.0 - sqr1
        bv = u2 * sqr1
        bw = 1.0 - bu - bv
        pos = [v0[c] * bu + v1[c] * bv + v2[c] * bw for c in range(3)]

        p_hat = eval_p_hat(pos, nrm, em)
        p_y = 1.0 / jnp.maximum(num_lights * area, 1e-4)
        wi = jnp.where(enable, p_hat / p_y, 0.0)
        w_sum = w_sum + wi
        seed, u_keep = _rnd(seed)
        take = enable & (u_keep < wi / jnp.maximum(w_sum, 1e-4))
        r_idx = jnp.where(take, gidx, r_idx)
        for c in range(3):
            r_pos[c] = jnp.where(take, pos[c], r_pos[c])
            r_nrm[c] = jnp.where(take, nrm[c], r_nrm[c])
            r_em[c] = jnp.where(take, em[c], r_em[c])

    m = jnp.where(enable, float(k), 0.0)
    # W resolve (ray_gen_ris.slang:225-231): re-evaluate the winner. The
    # winner's emission is kept in registers from its take (value-equal
    # to a refetch; any lane with w_sum > 0 took at least once — the
    # first wi > 0 candidate always takes — and lanes that never took
    # are masked by the w_sum > 0 clause below).
    p_hat_w = eval_p_hat(r_pos, r_nrm, r_em)
    w = w_sum / jnp.maximum(m * p_hat_w, 1e-4)
    w_final = jnp.where(enable & (w_sum > 0.0), w, 0.0)

    def put(i, plane):
        out_ref[8 * i : 8 * i + 8, :] = plane

    put(0, r_pos[0])
    put(1, r_pos[1])
    put(2, r_pos[2])
    put(3, r_nrm[0])
    put(4, r_nrm[1])
    put(5, r_nrm[2])
    put(6, w_sum)
    put(7, m)
    put(8, jax.lax.bitcast_convert_type(r_idx, jnp.float32))
    put(9, w_final)
    z8 = jnp.zeros_like(rough)
    for i in range(10, 15):
        put(i, z8)
    put(15, jax.lax.bitcast_convert_type(seed, jnp.float32))


def _pad_to(x, m):
    return -(-x // m) * m


def ris_audition_pallas(light_v0, light_v1, light_v2, light_em, seed,
                        hit_pos, hit_normal, v_view, albedo, roughness,
                        metallic, candidates: int, enable):
    """Drop-in forward for restir.ris_audition's compute. Returns
    (seed', dict of reservoir fields). Handles ANY light count
    (round 3 capped at MAX_LIGHTS=32 and silently fell back to jnp):

      - L <= MAX_LIGHTS: VMEM select-chain fetch (round-3 path, exact);
      - L <= ONEHOT_MAX: in-kernel one-hot MXU fetch (exact — the
        candidate distribution is IDENTICAL to the reference's uniform
        sampling, ray_gen_ris.slang:189-231);
      - larger: RTXDI-style presampled light tiles — N_TILES tiles of
        TILE entries drawn uniformly (with replacement) per frame; each
        4096-pixel block auditions from one tile (two-level RIS). Each
        tile entry is marginally Uniform[0, L), so resolving the RIS
        weight against p_y = 1/(L*area) keeps the estimator unbiased in
        expectation over tile construction (Talbot RIS nesting); the
        divergence from the reference is intra-block candidate
        correlation — documented in docs/PARITY.md, quality-checked by
        tests/test_restir_math.py::TestManyLightAudition.
    """
    l = light_v0.shape[0]
    fetch_mode = ris_fetch_mode(l)
    p = hit_pos.shape[0]
    np_ = _pad_to(max(p, BLOCK), BLOCK)
    rows = np_ // SUB

    def plane(x):
        return jnp.zeros((np_,), jnp.float32).at[:p].set(
            x.astype(jnp.float32)
        ).reshape(SUB, rows)

    attr = jnp.concatenate(
        [plane(hit_pos[:, 0]), plane(hit_pos[:, 1]), plane(hit_pos[:, 2]),
         plane(hit_normal[:, 0]), plane(hit_normal[:, 1]),
         plane(hit_normal[:, 2]),
         plane(v_view[:, 0]), plane(v_view[:, 1]), plane(v_view[:, 2]),
         plane(albedo[:, 0]), plane(albedo[:, 1]), plane(albedo[:, 2]),
         plane(roughness), plane(metallic),
         jnp.zeros((2 * SUB, rows), jnp.float32)],
        axis=0,
    )                                                   # (128, rows)
    seed_p = jnp.zeros((np_,), jnp.uint32).at[:p].set(seed).reshape(
        SUB, rows
    )
    en_p = jnp.zeros((np_,), jnp.int32).at[:p].set(
        enable.astype(jnp.int32)
    ).reshape(SUB, rows)

    if fetch_mode == "presampled":
        # Per-frame presampled tiles: N_TILES * TILE entries, each an
        # independent Uniform[0, L) draw seeded from the frame's first
        # pixel seed (decorrelates frames; entries within a frame are
        # iid). Row 12 carries the entry's GLOBAL index for the
        # reservoir output.
        from sunray_tpu.ops import rng as rng_mod

        ts = rng_mod.pcg_hash(
            seed[0] ^ jnp.arange(N_TILES * TILE, dtype=jnp.uint32)
        )
        _, u = rng_mod.rnd(ts)
        entry = jnp.minimum((u * l).astype(jnp.int32), l - 1)
        tab = jnp.zeros((16, N_TILES * TILE), jnp.float32)
        tab = tab.at[0:3, :].set(light_v0[entry].T)
        tab = tab.at[3:6, :].set(light_v1[entry].T)
        tab = tab.at[6:9, :].set(light_v2[entry].T)
        tab = tab.at[9:12, :].set(light_em[entry].T)
        tab = tab.at[12, :].set(entry.astype(jnp.float32))
        tab_spec = pl.BlockSpec((16, TILE), lambda j: (0, j % N_TILES))
        tab_rows = TILE
        fetch = "onehot"
        tiled = True
    else:
        lp = _pad_to(l, 128)
        tab = jnp.zeros((16, lp), jnp.float32)
        tab = tab.at[0:3, :l].set(light_v0.T)
        tab = tab.at[3:6, :l].set(light_v1.T)
        tab = tab.at[6:9, :l].set(light_v2.T)
        tab = tab.at[9:12, :l].set(light_em.T)
        tab_spec = pl.BlockSpec((16, lp), lambda j: (0, 0))
        tab_rows = l
        fetch = fetch_mode
        tiled = False

    out = pl.pallas_call(
        functools.partial(_kernel, k=candidates, num_lights=l,
                          fetch=fetch, tiled=tiled, tab_rows=tab_rows),
        name="ris_audition",
        grid=(rows // LANES,),
        in_specs=[
            pl.BlockSpec((16 * SUB, LANES), lambda j: (0, j)),
            pl.BlockSpec((SUB, LANES), lambda j: (0, j)),
            pl.BlockSpec((SUB, LANES), lambda j: (0, j)),
            tab_spec,
        ],
        out_specs=pl.BlockSpec((16 * SUB, LANES), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((16 * SUB, rows), jnp.float32),
        interpret=_interpret(),
    )(attr, seed_p, en_p, tab)

    def unplane(i, dtype=jnp.float32):
        flat = out[8 * i : 8 * i + 8, :].reshape(np_)[:p]
        if dtype != jnp.float32:
            return jax.lax.bitcast_convert_type(flat, dtype)
        return flat

    seed_out = unplane(15, jnp.uint32)
    fields = dict(
        light_pos=jnp.stack([unplane(0), unplane(1), unplane(2)], axis=-1),
        light_normal=jnp.stack([unplane(3), unplane(4), unplane(5)],
                               axis=-1),
        w_sum=unplane(6),
        M=unplane(7),
        light_idx=unplane(8, jnp.int32),
        W=unplane(9),
    )
    return seed_out, fields


def _di_spatial_kernel(attr_ref, res_ref, tap_ref, seed_ref, flag_ref,
                       out_ref, *, t_n, num_lights, w_clamp,
                       m_clamp, w_spatial_clamp):
    """Phase-B DI spatial reuse at frozen hits (ray_gen_final.slang:
    139-222): center merge + t_n neighbor-tap merges + the winner's W
    resolve and f_y evaluation, all in VMEM.

    attr (128, L): audition attr layout (pos/normal/view/albedo/rough/
                   metal planes).
    res  (104, L): center reservoir planes — 0-2 light_pos, 3-5
                   light_normal, 6 W, 7 M, 8 light_idx (bitcast),
                   9-11 light emission, 12 ok (int bitcast) — the
                   emission rides per-pixel planes (the caller gathers
                   the center's once and shifts it per tap) instead of
                   an in-kernel table fetch, so the kernel has NO light
                   -count cap (round 3 gated it at 32).
    tap  (t_n*104, L): per tap: same 13 planes.
    seed (8, L) uint32; flag (8, L) int32: pending.
    out  (128, L): 0-2 light_pos, 3-5 light_normal, 6 w_sum, 7 M,
                   8 light_idx, 9 w_spatial (clamped), 10-12 f_y_w rgb,
                   13 has (0/1), 15 seed'."""

    def attr(i):
        return attr_ref[8 * i : 8 * i + 8, :]

    px = [attr(0), attr(1), attr(2)]
    nx = [attr(3), attr(4), attr(5)]
    vx = [attr(6), attr(7), attr(8)]
    al = [attr(9), attr(10), attr(11)]
    rough = attr(12)
    metal = attr(13)
    pending = flag_ref[...] > 0
    seed = seed_ref[...]

    ndv = jnp.maximum(
        nx[0] * vx[0] + nx[1] * vx[1] + nx[2] * vx[2], 0.001
    )
    a_r = rough * rough
    a2 = a_r * a_r

    def eval_light(lpos, lnrm, em):
        """Returns (p_hat, f_y rgb list) — rt_utils.slang:203-234."""
        l = [lpos[c] - px[c] for c in range(3)]
        d2 = l[0] * l[0] + l[1] * l[1] + l[2] * l[2]
        dist = jnp.maximum(jnp.sqrt(jnp.maximum(d2, 1e-20)), 1e-4)
        l = [l[c] / dist for c in range(3)]
        ndl = jnp.maximum(nx[0] * l[0] + nx[1] * l[1] + nx[2] * l[2], 0.0)
        cos_light = jnp.maximum(
            -(lnrm[0] * l[0] + lnrm[1] * l[1] + lnrm[2] * l[2]), 0.0
        )
        lit = (ndl > 0.0) & (cos_light > 0.0)
        h = [vx[c] + l[c] for c in range(3)]
        h_n = jnp.maximum(
            jnp.sqrt(jnp.maximum(h[0] * h[0] + h[1] * h[1]
                                 + h[2] * h[2], 1e-20)), 1e-12
        )
        h = [h[c] / h_n for c in range(3)]
        ndh = jnp.maximum(nx[0] * h[0] + nx[1] * h[1] + nx[2] * h[2], 0.0)
        vdh = jnp.maximum(vx[0] * h[0] + vx[1] * h[1] + vx[2] * h[2], 0.0)
        denom = ndh * ndh * (a2 - 1.0) + 1.0
        d_term = a2 / (PI * denom * denom)
        ggx_v = ndl * jnp.sqrt(ndv * ndv * (1.0 - a2) + a2)
        ggx_l = ndv * jnp.sqrt(ndl * ndl * (1.0 - a2) + a2)
        v_term = 0.5 / jnp.maximum(ggx_v + ggx_l, 1e-4)
        fres5 = (1.0 - vdh) ** 5
        geometry = ndl * cos_light / jnp.maximum(dist * dist, 1e-4)
        p_hat = None
        fy = []
        for c in range(3):
            f0 = 0.04 * (1.0 - metal) + al[c] * metal
            f = f0 + (1.0 - f0) * fres5
            specular = d_term * v_term * f
            diffuse = al[c] * (1.0 - metal) * (1.0 - f) / PI
            out_c = em[c] * (diffuse + specular) * geometry
            out_c = jnp.where(lit, out_c, 0.0)
            fy.append(out_c)
            p_hat = out_c if p_hat is None else jnp.maximum(p_hat, out_c)
        return p_hat, fy

    def res_planes(base_ref, off):
        def g(i):
            return base_ref[off + 8 * i : off + 8 * i + 8, :]
        lpos = [g(0), g(1), g(2)]
        lnrm = [g(3), g(4), g(5)]
        w = g(6)
        m = g(7)
        idx = jax.lax.bitcast_convert_type(g(8), jnp.int32)
        em = [g(9), g(10), g(11)]
        ok = jax.lax.bitcast_convert_type(g(12), jnp.int32) > 0
        return lpos, lnrm, w, m, idx, em, ok

    # Center merge (the reservoir's own sample; ray_gen_final:147-158).
    c_pos, c_nrm, c_w, c_m, c_idx_raw, c_em, _c_ok_in = \
        res_planes(res_ref, 0)
    c_ok = pending & (c_w > 0.0) & (c_idx_raw < num_lights)
    c_idx = jnp.minimum(c_idx_raw, num_lights - 1)
    p_hat_c, _ = eval_light(c_pos, c_nrm, c_em)
    seed, u_m = _rnd(seed)

    zero = jnp.zeros_like(rough)
    w_sum = jnp.where(c_ok, p_hat_c * c_w * c_m, 0.0)
    m_acc = jnp.where(c_ok, c_m, 0.0)
    take = c_ok & (u_m < w_sum / jnp.maximum(w_sum, 1e-4))
    r_idx = jnp.where(take, c_idx, jnp.zeros_like(c_idx))
    r_pos = [jnp.where(take, c_pos[c], zero) for c in range(3)]
    r_nrm = [jnp.where(take, c_nrm[c], zero) for c in range(3)]
    r_em = [jnp.where(take, c_em[c], zero) for c in range(3)]

    for t in range(t_n):
        lpos, lnrm, w_raw, m_raw, idx_raw, t_em, ok = \
            res_planes(tap_ref, t * RES_PLANES * SUB)
        w_cl = jnp.minimum(w_raw, w_clamp)
        m_cl = jnp.minimum(m_raw, m_clamp)
        use = pending & ok & (w_cl > 0.0) & (idx_raw < num_lights)
        idx = jnp.minimum(idx_raw, num_lights - 1)
        p_hat_n, _ = eval_light(lpos, lnrm, t_em)
        m_acc = m_acc + jnp.where(use, m_cl, 0.0)
        weight = jnp.where(use, p_hat_n * w_cl * m_cl, 0.0)
        w_sum = w_sum + weight
        seed, u = _rnd(seed)
        take = use & (u < weight / jnp.maximum(w_sum, 1e-4))
        r_idx = jnp.where(take, idx, r_idx)
        for c in range(3):
            r_pos[c] = jnp.where(take, lpos[c], r_pos[c])
            r_nrm[c] = jnp.where(take, lnrm[c], r_nrm[c])
            r_em[c] = jnp.where(take, t_em[c], r_em[c])

    # Resolve + clamp + winner f_y (ray_gen_final.slang:203-222). The
    # winner's emission rides registers from its take (see the audition
    # kernel's W-resolve note for the masked-lane equivalence argument).
    has = pending & (w_sum > 0.0)
    p_hat_w, f_y_w = eval_light(r_pos, r_nrm, r_em)
    w_spatial = w_sum / jnp.maximum(m_acc * p_hat_w, 1e-3)
    w_spatial = jnp.minimum(w_spatial, w_spatial_clamp)

    def put(i, plane):
        out_ref[8 * i : 8 * i + 8, :] = plane

    put(0, r_pos[0])
    put(1, r_pos[1])
    put(2, r_pos[2])
    put(3, r_nrm[0])
    put(4, r_nrm[1])
    put(5, r_nrm[2])
    put(6, w_sum)
    put(7, m_acc)
    put(8, jax.lax.bitcast_convert_type(r_idx, jnp.float32))
    put(9, w_spatial)
    put(10, f_y_w[0])
    put(11, f_y_w[1])
    put(12, f_y_w[2])
    put(13, jnp.where(has, 1.0, 0.0))
    put(14, zero)
    put(15, jax.lax.bitcast_convert_type(seed, jnp.float32))


def di_spatial_pallas(seed, center, taps, pending,
                      hit_pos, hit_normal, v_view, albedo, roughness,
                      metallic, cfg_clamps):
    """Phase-B DI spatial reuse forward. center: dict of (P,)/(P,3)
    reservoir fields INCLUDING 'emission' (P, 3) — the caller gathers
    the center reservoir's light emission once and shifts it per tap
    (so there is no in-kernel light-table fetch and NO light-count cap;
    round 3 gated this kernel at 32 lights). taps: list of (fields dict
    incl. emission, ok (P,) bool).
    cfg_clamps: (w_clamp, m_clamp, w_spatial_clamp, num_lights).
    Returns (seed', dict)."""
    w_clamp, m_clamp, w_spatial_clamp, num_lights = cfg_clamps
    p = hit_pos.shape[0]
    t_n = len(taps)
    np_ = _pad_to(max(p, BLOCK), BLOCK)
    rows = np_ // SUB

    def plane(x, dtype=jnp.float32):
        buf = jnp.zeros((np_,), dtype)
        if dtype == jnp.float32:
            buf = buf.at[:p].set(x.astype(jnp.float32))
        else:
            buf = buf.at[:p].set(x)
        if dtype != jnp.float32:
            buf = jax.lax.bitcast_convert_type(buf, jnp.float32)
        return buf.reshape(SUB, rows)

    attr = jnp.concatenate(
        [plane(hit_pos[:, 0]), plane(hit_pos[:, 1]), plane(hit_pos[:, 2]),
         plane(hit_normal[:, 0]), plane(hit_normal[:, 1]),
         plane(hit_normal[:, 2]),
         plane(v_view[:, 0]), plane(v_view[:, 1]), plane(v_view[:, 2]),
         plane(albedo[:, 0]), plane(albedo[:, 1]), plane(albedo[:, 2]),
         plane(roughness), plane(metallic),
         jnp.zeros((2 * SUB, rows), jnp.float32)],
        axis=0,
    )

    def res_block(f, ok=None):
        parts = [
            plane(f["light_pos"][:, 0]), plane(f["light_pos"][:, 1]),
            plane(f["light_pos"][:, 2]),
            plane(f["light_normal"][:, 0]), plane(f["light_normal"][:, 1]),
            plane(f["light_normal"][:, 2]),
            plane(f["W"]), plane(f["M"]),
            plane(f["light_idx"].astype(jnp.int32), jnp.int32),
            plane(f["emission"][:, 0]), plane(f["emission"][:, 1]),
            plane(f["emission"][:, 2]),
        ]
        parts.append(
            plane((ok if ok is not None
                   else jnp.ones((p,), bool)).astype(jnp.int32), jnp.int32)
        )
        return jnp.concatenate(parts, axis=0)      # (RES_PLANES*8, rows)

    rp8 = RES_PLANES * SUB
    res = res_block(center)
    tap = (jnp.concatenate([res_block(f, ok) for f, ok in taps], axis=0)
           if t_n else jnp.zeros((rp8, rows), jnp.float32))
    seed_p = jnp.zeros((np_,), jnp.uint32).at[:p].set(seed).reshape(
        SUB, rows
    )
    flag = plane(pending.astype(jnp.int32), jnp.int32)
    flag = jax.lax.bitcast_convert_type(flag, jnp.int32)

    out = pl.pallas_call(
        functools.partial(
            _di_spatial_kernel, t_n=t_n, num_lights=num_lights,
            w_clamp=w_clamp, m_clamp=m_clamp,
            w_spatial_clamp=w_spatial_clamp,
        ),
        name="di_spatial_merge",
        grid=(rows // LANES,),
        in_specs=[
            pl.BlockSpec((16 * SUB, LANES), lambda j: (0, j)),
            pl.BlockSpec((rp8, LANES), lambda j: (0, j)),
            pl.BlockSpec((max(t_n, 1) * rp8, LANES), lambda j: (0, j)),
            pl.BlockSpec((SUB, LANES), lambda j: (0, j)),
            pl.BlockSpec((SUB, LANES), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((16 * SUB, LANES), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((16 * SUB, rows), jnp.float32),
        interpret=_interpret(),
    )(attr, res, tap, seed_p, flag)

    def unplane(i, dtype=jnp.float32):
        flat = out[8 * i : 8 * i + 8, :].reshape(np_)[:p]
        if dtype != jnp.float32:
            return jax.lax.bitcast_convert_type(flat, dtype)
        return flat

    return unplane(15, jnp.uint32), dict(
        light_pos=jnp.stack([unplane(0), unplane(1), unplane(2)], axis=-1),
        light_normal=jnp.stack([unplane(3), unplane(4), unplane(5)],
                               axis=-1),
        w_sum=unplane(6),
        M=unplane(7),
        light_idx=unplane(8, jnp.int32),
        w_spatial=unplane(9),
        f_y_w=jnp.stack([unplane(10), unplane(11), unplane(12)], axis=-1),
        has=unplane(13) > 0.5,
    )




GI_ATTR_PLANES = 10    # pos 3, normal 3, albedo 3, metallic
GI_RES_PLANES = 12     # spos 3, snrm 3, srad 3, stri, w_sum, M (center)
GI_TAP_PLANES = 14     # spos 3, snrm 3, srad 3, stri, W, M, jac, ok


def _gi_spatial_kernel(attr_ref, res_ref, tap_ref, seed_ref, flag_ref,
                       out_ref, *, t_n, w_clamp):
    """Phase-B GI spatial reuse merge + final resolve in VMEM
    (ray_gen_final.slang:224-327, minus the per-tap visibility rays and
    jacobian reconstruction, which stay outside — they need the tracer
    and the camera matrices). Replaces the (T, P) jnp p_hat planes +
    merge chain + winner selects + final-resolve chains.

    attr (80, L):  0-2 pos, 3-5 normal, 6-8 albedo, 9 metallic.
    res  (96, L):  center reservoir — 0-2 sample_pos, 3-5 sample_normal,
                   6-8 sample_radiance, 9 sample_tri (bitcast), 10 w_sum,
                   11 M.
    tap  (t_n*112, L): per tap — 0-2 spos, 3-5 snrm, 6-8 srad, 9 stri
                   (bitcast), 10 W, 11 M, 12 jac, 13 ok (bitcast int).
    out  (128, L): 0-2 gdir, 3 gdist, 4 sample_tri (bitcast), 5 try_gi
                   (0/1), 6-8 contrib_pre rgb (sample_radiance *
                   albedo(1-metal)/pi * gndl * w_gi — multiply by
                   throughput and mask by the final visibility outside),
                   15 seed'."""

    def attr(i):
        return attr_ref[8 * i: 8 * i + 8, :]

    px = [attr(0), attr(1), attr(2)]
    nx = [attr(3), attr(4), attr(5)]
    al = [attr(6), attr(7), attr(8)]
    metal = attr(9)
    pending = flag_ref[...] > 0
    seed = seed_ref[...]

    def gi_p_hat(spos, srad):
        w = [spos[c] - px[c] for c in range(3)]
        d = jnp.maximum(jnp.sqrt(jnp.maximum(
            w[0] * w[0] + w[1] * w[1] + w[2] * w[2], 1e-20)), 1e-4)
        wn = [w[c] / d for c in range(3)]
        ndl = jnp.maximum(
            nx[0] * wn[0] + nx[1] * wn[1] + nx[2] * wn[2], 0.0
        )
        p_hat = None
        for c in range(3):
            f_diffuse = al[c] * (1.0 - metal) / PI
            contrib = srad[c] * f_diffuse * ndl
            p_hat = contrib if p_hat is None else jnp.maximum(p_hat,
                                                              contrib)
        return p_hat

    def g(ref, off, i):
        return ref[off + 8 * i: off + 8 * i + 8, :]

    r_pos = [g(res_ref, 0, i) for i in range(3)]
    r_nrm = [g(res_ref, 0, 3 + i) for i in range(3)]
    r_rad = [g(res_ref, 0, 6 + i) for i in range(3)]
    r_tri = jax.lax.bitcast_convert_type(g(res_ref, 0, 9), jnp.int32)
    w_sum = g(res_ref, 0, 10)
    m_acc = g(res_ref, 0, 11)

    for t in range(t_n):
        off = t * GI_TAP_PLANES * SUB
        spos = [g(tap_ref, off, i) for i in range(3)]
        snrm = [g(tap_ref, off, 3 + i) for i in range(3)]
        srad = [g(tap_ref, off, 6 + i) for i in range(3)]
        stri = jax.lax.bitcast_convert_type(g(tap_ref, off, 9), jnp.int32)
        w_t = g(tap_ref, off, 10)
        m_t = g(tap_ref, off, 11)
        jac = g(tap_ref, off, 12)
        ok = jax.lax.bitcast_convert_type(g(tap_ref, off, 13),
                                          jnp.int32) > 0
        p_hat_n = gi_p_hat(spos, srad)
        m_acc = m_acc + jnp.where(ok, m_t, 0.0)
        weight = jnp.where(ok, p_hat_n * w_t * m_t * jac, 0.0)
        w_sum = w_sum + weight
        seed, u = _rnd(seed)
        take = ok & (u < weight / jnp.maximum(w_sum, 1e-4))
        r_tri = jnp.where(take, stri, r_tri)
        for c in range(3):
            r_pos[c] = jnp.where(take, spos[c], r_pos[c])
            r_nrm[c] = jnp.where(take, snrm[c], r_nrm[c])
            r_rad[c] = jnp.where(take, srad[c], r_rad[c])

    # Final resolve (ray_gen_final.slang:305-327).
    p_hat_f = gi_p_hat(r_pos, r_rad)
    w_gi = jnp.where(
        p_hat_f > 1e-3,
        w_sum / jnp.maximum(m_acc, 1.0) / jnp.maximum(p_hat_f, 1e-9),
        0.0,
    )
    w_gi = jnp.minimum(w_gi, w_clamp)
    gv = [r_pos[c] - px[c] for c in range(3)]
    gdist = jnp.maximum(jnp.sqrt(jnp.maximum(
        gv[0] * gv[0] + gv[1] * gv[1] + gv[2] * gv[2], 1e-20)), 1e-4)
    gdir = [gv[c] / gdist for c in range(3)]
    gndl = jnp.maximum(
        nx[0] * gdir[0] + nx[1] * gdir[1] + nx[2] * gdir[2], 0.0
    )
    try_gi = pending & (w_gi > 0.0) & (gndl > 0.0)

    def put(i, plane):
        out_ref[8 * i: 8 * i + 8, :] = plane

    put(0, gdir[0])
    put(1, gdir[1])
    put(2, gdir[2])
    put(3, gdist)
    put(4, jax.lax.bitcast_convert_type(r_tri, jnp.float32))
    put(5, jnp.where(try_gi, 1.0, 0.0))
    for c in range(3):
        f_diffuse = al[c] * (1.0 - metal) / PI
        put(6 + c, r_rad[c] * f_diffuse * gndl * w_gi)
    z8 = jnp.zeros_like(metal)
    for i in range(9, 15):
        put(i, z8)
    put(15, jax.lax.bitcast_convert_type(seed, jnp.float32))


def gi_spatial_pallas(seed, center, taps, pending, hit_pos, hit_normal,
                      albedo, metallic, w_clamp):
    """GI phase-B merge + resolve forward. center: dict with sample_pos/
    sample_normal/sample_radiance (P,3), sample_tri (P,) int, w_sum, M;
    taps: list of dicts with the same sample fields plus W, M, jac, ok.
    Returns (seed', dict(gdir (P,3), gdist, sample_tri, try_gi,
    contrib_pre (P,3))). Gradients route through the jnp planes (the
    dispatcher keeps differentiable frames off this kernel)."""
    p = hit_pos.shape[0]
    t_n = len(taps)
    np_ = _pad_to(max(p, BLOCK), BLOCK)
    rows = np_ // SUB

    def plane(x, dtype=jnp.float32):
        buf = jnp.zeros((np_,), dtype)
        if dtype == jnp.float32:
            buf = buf.at[:p].set(x.astype(jnp.float32))
        else:
            buf = buf.at[:p].set(x)
            buf = jax.lax.bitcast_convert_type(buf, jnp.float32)
        return buf.reshape(SUB, rows)

    attr = jnp.concatenate(
        [plane(hit_pos[:, 0]), plane(hit_pos[:, 1]), plane(hit_pos[:, 2]),
         plane(hit_normal[:, 0]), plane(hit_normal[:, 1]),
         plane(hit_normal[:, 2]),
         plane(albedo[:, 0]), plane(albedo[:, 1]), plane(albedo[:, 2]),
         plane(metallic)],
        axis=0,
    )                                           # (80, rows)

    def sample_planes(f):
        return [
            plane(f["sample_pos"][:, 0]), plane(f["sample_pos"][:, 1]),
            plane(f["sample_pos"][:, 2]),
            plane(f["sample_normal"][:, 0]),
            plane(f["sample_normal"][:, 1]),
            plane(f["sample_normal"][:, 2]),
            plane(f["sample_radiance"][:, 0]),
            plane(f["sample_radiance"][:, 1]),
            plane(f["sample_radiance"][:, 2]),
            plane(f["sample_tri"].astype(jnp.int32), jnp.int32),
        ]

    res = jnp.concatenate(
        sample_planes(center) + [plane(center["w_sum"]),
                                 plane(center["M"])],
        axis=0,
    )                                           # (96, rows)
    tap_blocks = []
    for f in taps:
        tap_blocks.append(jnp.concatenate(
            sample_planes(f)
            + [plane(f["W"]), plane(f["M"]), plane(f["jac"]),
               plane(f["ok"].astype(jnp.int32), jnp.int32)],
            axis=0,
        ))
    rp8 = GI_TAP_PLANES * SUB
    tap = (jnp.concatenate(tap_blocks, axis=0) if t_n
           else jnp.zeros((rp8, rows), jnp.float32))
    seed_p = jnp.zeros((np_,), jnp.uint32).at[:p].set(seed).reshape(
        SUB, rows
    )
    flag = plane(pending.astype(jnp.int32), jnp.int32)
    flag = jax.lax.bitcast_convert_type(flag, jnp.int32)

    out = pl.pallas_call(
        functools.partial(_gi_spatial_kernel, t_n=t_n, w_clamp=w_clamp),
        name="gi_spatial_merge",
        grid=(rows // LANES,),
        in_specs=[
            pl.BlockSpec((GI_ATTR_PLANES * SUB, LANES), lambda j: (0, j)),
            pl.BlockSpec((GI_RES_PLANES * SUB, LANES), lambda j: (0, j)),
            pl.BlockSpec((max(t_n, 1) * rp8, LANES), lambda j: (0, j)),
            pl.BlockSpec((SUB, LANES), lambda j: (0, j)),
            pl.BlockSpec((SUB, LANES), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((16 * SUB, LANES), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((16 * SUB, rows), jnp.float32),
        interpret=_interpret(),
    )(attr, res, tap, seed_p, flag)

    def unplane(i, dtype=jnp.float32):
        flat = out[8 * i: 8 * i + 8, :].reshape(np_)[:p]
        if dtype != jnp.float32:
            return jax.lax.bitcast_convert_type(flat, dtype)
        return flat

    return unplane(15, jnp.uint32), dict(
        gdir=jnp.stack([unplane(0), unplane(1), unplane(2)], axis=-1),
        gdist=unplane(3),
        sample_tri=unplane(4, jnp.int32),
        try_gi=unplane(5) > 0.5,
        contrib_pre=jnp.stack([unplane(6), unplane(7), unplane(8)],
                              axis=-1),
    )


DT_ATTR_PLANES = 16  # pos 3, normal 3, view 3, albedo 3, rough, metal,
                     # virtual_distance, ok (bitcast)
DT_R_PLANES = 13     # audition result: lpos 3, lnrm 3, w_sum, M, idx
                     # (bitcast), W, winner emission 3
DT_H_PLANES = 16     # history: lpos 3, lnrm 3, W, M, idx (bitcast),
                     # em 3, hit_normal 3, depth


def _di_temporal_kernel(attr_ref, r_ref, h_ref, seed_ref, out_ref, *,
                        m_clamp, w_clamp):
    """ReSTIR DI temporal reuse (ray_gen_ris.slang:233-267; the
    post-gather math of render/restir.di_temporal_reuse) in VMEM: the
    confidence smoothsteps, BOTH GGX p_hat evaluations (history sample
    and merged winner), the merge, and the W re-resolve. The jittered
    reprojection draw and the banded history GATHER stay outside (the
    gather is a cross-pixel read, and the jitter draw precedes this
    merge in the reference's per-pixel RNG stream — fusing into the
    audition kernel would reorder the stream and change every image).

    attr (128, L): 0-2 pos, 3-5 normal, 6-8 view, 9-11 albedo, 12 rough,
                   13 metal, 14 virtual_distance, 15 ok (bitcast int —
                   the post-gather validity: enable & reprojection ok &
                   in-band).
    r    (104, L): audition result + its winner's emission (the caller
                   gathers emission at r.light_idx — needed for the
                   merged-winner W resolve when the audition wins).
    h    (128, L): gathered history + ITS sample's emission (gathered at
                   h.light_idx, clamped).
    out  (128, L): merged reservoir — 0-2 lpos, 3-5 lnrm, 6 w_sum, 7 M,
                   8 idx (bitcast), 9 W, 15 seed'."""

    def attr(i):
        return attr_ref[8 * i: 8 * i + 8, :]

    px = [attr(0), attr(1), attr(2)]
    nx = [attr(3), attr(4), attr(5)]
    vx = [attr(6), attr(7), attr(8)]
    al = [attr(9), attr(10), attr(11)]
    rough = attr(12)
    metal = attr(13)
    vdist = attr(14)
    ok = jax.lax.bitcast_convert_type(attr(15), jnp.int32) > 0
    seed = seed_ref[...]

    ndv = jnp.maximum(
        nx[0] * vx[0] + nx[1] * vx[1] + nx[2] * vx[2], 0.001
    )
    a_r = rough * rough
    a2 = a_r * a_r

    def eval_p_hat(lpos, lnrm, em):
        l = [lpos[c] - px[c] for c in range(3)]
        d2 = l[0] * l[0] + l[1] * l[1] + l[2] * l[2]
        dist = jnp.maximum(jnp.sqrt(jnp.maximum(d2, 1e-20)), 1e-4)
        l = [l[c] / dist for c in range(3)]
        ndl = jnp.maximum(nx[0] * l[0] + nx[1] * l[1] + nx[2] * l[2], 0.0)
        cos_light = jnp.maximum(
            -(lnrm[0] * l[0] + lnrm[1] * l[1] + lnrm[2] * l[2]), 0.0
        )
        lit = (ndl > 0.0) & (cos_light > 0.0)
        h = [vx[c] + l[c] for c in range(3)]
        h_n = jnp.maximum(
            jnp.sqrt(jnp.maximum(h[0] * h[0] + h[1] * h[1]
                                 + h[2] * h[2], 1e-20)), 1e-12
        )
        h = [h[c] / h_n for c in range(3)]
        ndh = jnp.maximum(nx[0] * h[0] + nx[1] * h[1] + nx[2] * h[2], 0.0)
        vdh = jnp.maximum(vx[0] * h[0] + vx[1] * h[1] + vx[2] * h[2], 0.0)
        denom = ndh * ndh * (a2 - 1.0) + 1.0
        d_term = a2 / (PI * denom * denom)
        ggx_v = ndl * jnp.sqrt(ndv * ndv * (1.0 - a2) + a2)
        ggx_l = ndv * jnp.sqrt(ndl * ndl * (1.0 - a2) + a2)
        v_term = 0.5 / jnp.maximum(ggx_v + ggx_l, 1e-4)
        fres5 = (1.0 - vdh) ** 5
        geometry = ndl * cos_light / jnp.maximum(dist * dist, 1e-4)
        p_hat = None
        for c in range(3):
            f0 = 0.04 * (1.0 - metal) + al[c] * metal
            f = f0 + (1.0 - f0) * fres5
            specular = d_term * v_term * f
            diffuse = al[c] * (1.0 - metal) * (1.0 - f) / PI
            out_c = em[c] * (diffuse + specular) * geometry
            out_c = jnp.where(lit, out_c, 0.0)
            p_hat = out_c if p_hat is None else jnp.maximum(p_hat, out_c)
        return p_hat

    def g(ref, i):
        return ref[8 * i: 8 * i + 8, :]

    r_pos = [g(r_ref, i) for i in range(3)]
    r_nrm = [g(r_ref, 3 + i) for i in range(3)]
    r_wsum = g(r_ref, 6)
    r_m = g(r_ref, 7)
    r_idx = jax.lax.bitcast_convert_type(g(r_ref, 8), jnp.int32)
    r_w = g(r_ref, 9)
    r_em = [g(r_ref, 10 + i) for i in range(3)]

    h_pos = [g(h_ref, i) for i in range(3)]
    h_nrm = [g(h_ref, 3 + i) for i in range(3)]
    h_w = jnp.minimum(g(h_ref, 6), w_clamp)
    h_m = jnp.minimum(g(h_ref, 7), m_clamp)
    h_idx = jax.lax.bitcast_convert_type(g(h_ref, 8), jnp.int32)
    h_em = [g(h_ref, 9 + i) for i in range(3)]
    h_hn = [g(h_ref, 12 + i) for i in range(3)]
    h_depth = g(h_ref, 15)

    # Confidence (di_temporal_reuse: normal/depth smoothstep gates).
    def smoothstep(e0, e1, x):
        t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
        return t * t * (3.0 - 2.0 * t)

    ndot = nx[0] * h_hn[0] + nx[1] * h_hn[1] + nx[2] * h_hn[2]
    normal_conf = smoothstep(0.9, 0.99, ndot)
    depth_diff = jnp.abs(vdist - h_depth) / jnp.maximum(vdist, 1e-4)
    depth_conf = 1.0 - smoothstep(0.05, 0.20, depth_diff)
    h_m = h_m * (normal_conf * depth_conf)

    use = ok & (h_w > 0.0)
    p_hat_hist = eval_p_hat(h_pos, h_nrm, h_em)

    # merge_di (rt_utils.slang:244-253), masked by `use`.
    m = r_m + jnp.where(use, h_m, 0.0)
    weight = jnp.where(use, p_hat_hist * h_w * h_m, 0.0)
    w_sum = r_wsum + weight
    seed, u_m = _rnd(seed)
    take = use & (u_m < weight / jnp.maximum(w_sum, 1e-4))
    o_idx = jnp.where(take, h_idx, r_idx)
    o_pos = [jnp.where(take, h_pos[c], r_pos[c]) for c in range(3)]
    o_nrm = [jnp.where(take, h_nrm[c], r_nrm[c]) for c in range(3)]
    o_em = [jnp.where(take, h_em[c], r_em[c]) for c in range(3)]

    # W re-resolve on the merged winner (di_temporal_reuse tail).
    p_hat_merged = eval_p_hat(o_pos, o_nrm, o_em)
    w_new = w_sum / jnp.maximum(m * p_hat_merged, 1e-4)
    o_w = jnp.where(use, w_new, r_w)

    def put(i, plane):
        out_ref[8 * i: 8 * i + 8, :] = plane

    put(0, o_pos[0])
    put(1, o_pos[1])
    put(2, o_pos[2])
    put(3, o_nrm[0])
    put(4, o_nrm[1])
    put(5, o_nrm[2])
    put(6, w_sum)
    put(7, m)
    put(8, jax.lax.bitcast_convert_type(o_idx, jnp.float32))
    put(9, o_w)
    z8 = jnp.zeros_like(rough)
    for i in range(10, 15):
        put(i, z8)
    put(15, jax.lax.bitcast_convert_type(seed, jnp.float32))


def di_temporal_pallas(seed, r_fields, r_em, h_fields, h_em, ok,
                       hit_pos, hit_normal, v_view, albedo, roughness,
                       metallic, virtual_distance, m_clamp, w_clamp):
    """DI temporal reuse forward. r_fields: audition-result dict
    (light_pos/light_normal/w_sum/M/light_idx/W); r_em/h_em: (P, 3)
    emission gathered at the respective (clamped) light indices;
    h_fields: gathered-history dict incl. hit_normal and depth; ok: the
    post-gather validity mask. Returns (seed', merged fields dict)."""
    p = hit_pos.shape[0]
    np_ = _pad_to(max(p, BLOCK), BLOCK)
    rows = np_ // SUB

    def plane(x, dtype=jnp.float32):
        buf = jnp.zeros((np_,), dtype)
        if dtype == jnp.float32:
            buf = buf.at[:p].set(x.astype(jnp.float32))
        else:
            buf = buf.at[:p].set(x)
            buf = jax.lax.bitcast_convert_type(buf, jnp.float32)
        return buf.reshape(SUB, rows)

    attr = jnp.concatenate(
        [plane(hit_pos[:, 0]), plane(hit_pos[:, 1]), plane(hit_pos[:, 2]),
         plane(hit_normal[:, 0]), plane(hit_normal[:, 1]),
         plane(hit_normal[:, 2]),
         plane(v_view[:, 0]), plane(v_view[:, 1]), plane(v_view[:, 2]),
         plane(albedo[:, 0]), plane(albedo[:, 1]), plane(albedo[:, 2]),
         plane(roughness), plane(metallic), plane(virtual_distance),
         plane(ok.astype(jnp.int32), jnp.int32)],
        axis=0,
    )
    r = jnp.concatenate(
        [plane(r_fields["light_pos"][:, 0]),
         plane(r_fields["light_pos"][:, 1]),
         plane(r_fields["light_pos"][:, 2]),
         plane(r_fields["light_normal"][:, 0]),
         plane(r_fields["light_normal"][:, 1]),
         plane(r_fields["light_normal"][:, 2]),
         plane(r_fields["w_sum"]), plane(r_fields["M"]),
         plane(r_fields["light_idx"].astype(jnp.int32), jnp.int32),
         plane(r_fields["W"]),
         plane(r_em[:, 0]), plane(r_em[:, 1]), plane(r_em[:, 2])],
        axis=0,
    )
    h = jnp.concatenate(
        [plane(h_fields["light_pos"][:, 0]),
         plane(h_fields["light_pos"][:, 1]),
         plane(h_fields["light_pos"][:, 2]),
         plane(h_fields["light_normal"][:, 0]),
         plane(h_fields["light_normal"][:, 1]),
         plane(h_fields["light_normal"][:, 2]),
         plane(h_fields["W"]), plane(h_fields["M"]),
         plane(h_fields["light_idx"].astype(jnp.int32), jnp.int32),
         plane(h_em[:, 0]), plane(h_em[:, 1]), plane(h_em[:, 2]),
         plane(h_fields["hit_normal"][:, 0]),
         plane(h_fields["hit_normal"][:, 1]),
         plane(h_fields["hit_normal"][:, 2]),
         plane(h_fields["depth"])],
        axis=0,
    )
    seed_p = jnp.zeros((np_,), jnp.uint32).at[:p].set(seed).reshape(
        SUB, rows
    )

    out = pl.pallas_call(
        functools.partial(_di_temporal_kernel, m_clamp=m_clamp,
                          w_clamp=w_clamp),
        name="di_temporal_merge",
        grid=(rows // LANES,),
        in_specs=[
            pl.BlockSpec((DT_ATTR_PLANES * SUB, LANES), lambda j: (0, j)),
            pl.BlockSpec((DT_R_PLANES * SUB, LANES), lambda j: (0, j)),
            pl.BlockSpec((DT_H_PLANES * SUB, LANES), lambda j: (0, j)),
            pl.BlockSpec((SUB, LANES), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((16 * SUB, LANES), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((16 * SUB, rows), jnp.float32),
        interpret=_interpret(),
    )(attr, r, h, seed_p)

    def unplane(i, dtype=jnp.float32):
        flat = out[8 * i: 8 * i + 8, :].reshape(np_)[:p]
        if dtype != jnp.float32:
            return jax.lax.bitcast_convert_type(flat, dtype)
        return flat

    return unplane(15, jnp.uint32), dict(
        light_pos=jnp.stack([unplane(0), unplane(1), unplane(2)], axis=-1),
        light_normal=jnp.stack([unplane(3), unplane(4), unplane(5)],
                               axis=-1),
        w_sum=unplane(6),
        M=unplane(7),
        light_idx=unplane(8, jnp.int32),
        W=unplane(9),
    )
