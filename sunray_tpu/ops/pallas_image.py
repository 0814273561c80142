"""Pallas TPU kernel for the edge-avoiding a-trous denoise pass.

Why: each a-trous pass (shaders/denoise.slang:27-116) is 24 shifted taps
over four guide images; the jnp formulation (pad + static slice per tap,
render/postprocess.atrous_denoise_pass) charges the frame ~65 ms at 1080p
in pad/slice data movement alone (docs/PERFORMANCE.md frame budget). Here
the pass runs banded: each 32-row output band holds its guide window in
VMEM and the 24 taps are static sublane/lane-shifted reads of that
window — only the 3-channel result leaves the chip.

Layout: channels-first planes (10, H, W) — color 3, depth 1, normal 3,
diffuse 3 — so the image dims land on the (sublane, lane) tile. A packed
(H, W, 10) layout would tile-pad the 10-wide trailing dim ~13x (CLAUDE.md:
never materialize tiny trailing dims).

Halo without overlapping BlockSpecs: the padded planes array is passed
four times with different block shapes/index maps — the (block, cw) main
tile, an (hr, cw) bottom-rows strip, a (block, wr) right-cols strip, and
the (hr, wr) corner; the kernel stitches them into one
(block + hr, cw + wr) window whose top-left (block + 4s, cw + 4s) region
covers every tap. hr/wr are the halo thickness 4*step rounded up to the
(8, 128) tile — Mosaic requires block-shape trailing dims divisible by
the tile — so the concats are tile-aligned. Thin strips (instead of
doubled full blocks) plus column blocking keep the scoped-VMEM footprint
well under the 16 MB limit at 1080p — a first cut with two full-block
row views OOM'd it (28.3 MB).

Numerics match atrous_denoise_pass exactly (same weights and epsilons;
zero padding is equivalent to the jnp path's edge padding because both
zero the weight outside the image). Gradients route through the jnp
reference via custom_vjp — the Pallas forward is TPU-only and
inference-hot; the backward (training/inverse rendering) recomputes the
jnp chain's VJP, which is the mathematically exact adjoint of the same
filter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 5x5 B-spline, matches postprocess.ATROUS_KERNEL (denoise.slang:20).
KERNEL_1D = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)
LANE = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _luma(rgb):
    return 0.2126 * rgb[0] + 0.7152 * rgb[1] + 0.0722 * rgb[2]


def _atrous_kernel(ca_ref, cb_ref, cc_ref, cd_ref,
                   ga_ref, gb_ref, gc_ref, gd_ref, out_ref, *, step, halo,
                   h, w, block, cw):
    """One output tile: image rows [i*block, +block) x cols [j*cw, +cw).

    Color (3 planes) and guide (8 planes: depth, normal x3, diffuse x3,
    bypass) arrive as SEPARATE arrays so the pass-invariant guide is
    padded once per frame while only the 3 color planes re-pad per pass.
    a=main tile, b=bottom hr-row strip, c=right wr-col strip, d=corner of
    the padded planes (image starts at padded row/col `halo`); their
    tile-aligned stitching covers the tile's +/-2*step tap window. The
    geometry (halo/strips) is sized for the chain's LARGEST step so every
    pass shares it (halo = 2*s_max >= 2*step; strips hr,wr >= 4*s_max).
    """
    s = step
    i = pl.program_id(0)
    j = pl.program_id(1)

    def stitch(a, b, c, d, nch):
        return [
            jnp.concatenate(
                [
                    jnp.concatenate([a[ch], c[ch]], axis=1),
                    jnp.concatenate([b[ch], d[ch]], axis=1),
                ],
                axis=0,
            )
            for ch in range(nch)
        ]

    wins_c = stitch(ca_ref, cb_ref, cc_ref, cd_ref, 3)
    wins_g = stitch(ga_ref, gb_ref, gc_ref, gd_ref, 8)
    # Demodulated illuminance + luma precomputed ONCE over the window:
    # every tap used to redo 3 divides + a luma per neighbor (24x
    # duplicate work per pixel per pass). Values are element-identical
    # (same formula), only deduplicated.
    wins_il = [
        wins_c[k] / jnp.maximum(wins_g[4 + k], 0.001) for k in range(3)
    ]
    wins_luma = _luma(wins_il)

    def tap(wins, dy, dx):
        r0 = halo + dy * s
        c0 = halo + dx * s
        return [wn[r0 : r0 + block, c0 : c0 + cw] for wn in wins]

    def tap1(win, dy, dx):
        r0 = halo + dy * s
        c0 = halo + dx * s
        return win[r0 : r0 + block, c0 : c0 + cw]

    ctr = tap(wins_c, 0, 0)
    ctr_g = tap(wins_g, 0, 0)
    c_depth = ctr_g[0]
    c_nrm = ctr_g[1:4]
    c_dif = [jnp.maximum(d, 0.001) for d in ctr_g[4:7]]
    bypass = ctr_g[7] > 0.5
    c_il = tap(wins_il, 0, 0)
    c_luma = tap1(wins_luma, 0, 0)

    kc = KERNEL_1D[2] * KERNEL_1D[2]
    acc = [il * kc for il in c_il]
    wsum = jnp.full((block, cw), kc, jnp.float32)

    gy = i * block + jax.lax.broadcasted_iota(jnp.int32, (block, cw), 0)
    gx = j * cw + jax.lax.broadcasted_iota(jnp.int32, (block, cw), 1)

    for dy in range(-2, 3):
        for dx in range(-2, 3):
            if dy == 0 and dx == 0:
                continue
            tg = tap(wins_g, dy, dx)
            s_depth = tg[0]
            s_nrm = tg[1:4]
            s_dif = tg[4:7]
            s_il = tap(wins_il, dy, dx)
            s_luma = tap1(wins_luma, dy, dx)
            # center diffuse clamped, neighbor raw — matches the jnp pass.
            dd = [c_dif[k] - s_dif[k] for k in range(3)]
            diffuse_diff = jnp.sqrt(
                jnp.maximum(dd[0] * dd[0] + dd[1] * dd[1] + dd[2] * dd[2],
                            1e-20)
            )
            luma_diff = jnp.abs(c_luma - s_luma)
            luma_sigma = jnp.maximum(c_luma, s_luma) * 0.4 + 0.01
            luma_ratio = luma_diff / luma_sigma
            ndot = (c_nrm[0] * s_nrm[0] + c_nrm[1] * s_nrm[1]
                    + c_nrm[2] * s_nrm[2])
            power = (
                -jnp.abs(c_depth - s_depth) * 8.0
                + (ndot - 1.0) * 80.0
                - diffuse_diff * 50.0
                - luma_ratio * luma_ratio
            )
            iy = gy + dy * s
            ix = gx + dx * s
            in_b = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
            wgt = jnp.exp(power) * (KERNEL_1D[dx + 2] * KERNEL_1D[dy + 2])
            wgt = jnp.where(in_b, wgt, 0.0)
            for k in range(3):
                acc[k] = acc[k] + s_il[k] * wgt
            wsum = wsum + wgt

    inv = 1.0 / jnp.maximum(wsum, 1e-4)
    # Bypass (sky / smooth) pixels pass the input color through unchanged
    # — the select runs in-kernel so the wrapper never materializes a
    # full-image where() per pass.
    for k in range(3):
        out_ref[k] = jnp.where(bypass, ctr[k], acc[k] * inv * c_dif[k])


def _atrous_geometry(s_max, h, w):
    """Tile geometry shared by every pass of a chain, sized for its
    LARGEST step: the pass-invariant guide planes pad once per frame.
    Returns (halo, hr, wr, block, cw, grid_r, grid_c, rows, cols)."""
    halo = 2 * s_max
    hs = 4 * s_max                     # tap-window halo thickness
    hr = -(-hs // 8) * 8               # bottom strip rows (sublane tile)
    wr = -(-hs // LANE) * LANE         # right strip cols (lane tile)
    block = -(-max(32, hs) // hr) * hr     # rows per tile; hr | block
    # 512-col tiles: 11 planes (3 color + 8 guide) x 4 views at 1024 cols
    # ran the scoped-VMEM stack to 16.98 MB (limit 16 MB) on v5e.
    cw = min(512, -(-w // LANE) * LANE)    # cols per tile; wr | cw
    cw = -(-cw // wr) * wr                 # enforce wr | cw (step >= 64 on
                                           # narrow images would floor mc)
    grid_r = -(-h // block)
    grid_c = -(-w // cw)
    rows = grid_r * block + hr
    cols = grid_c * cw + wr
    return halo, hr, wr, block, cw, grid_r, grid_c, rows, cols


def _pad_planes(planes, geom, h, w):
    """Zero-pad (C, h, w) planes into the chain geometry: image at
    (row, col) offset `halo`, total (C, rows, cols)."""
    halo, _, _, _, _, _, _, rows, cols = geom
    return jnp.pad(
        planes, ((0, 0), (halo, rows - h - halo), (halo, cols - w - halo))
    )


def _atrous_pass_pallas(cpad, gpad, step, geom, h, w):
    """One a-trous pass. cpad: (3, rows, cols) padded color; gpad:
    (8, rows, cols) padded guide (pass-invariant) -> (3, h-tiled, w-tiled)
    denoised re-modulated color with the bypass select applied."""
    halo, hr, wr, block, cw, grid_r, grid_c, _, _ = geom
    mb = block // hr                   # block rows, in bottom-strip units
    mc = cw // wr

    def specs(nch):
        return [
            pl.BlockSpec((nch, block, cw), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, hr, cw), lambda i, j: (0, (i + 1) * mb, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, block, wr), lambda i, j: (0, i, (j + 1) * mc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nch, hr, wr),
                         lambda i, j: (0, (i + 1) * mb, (j + 1) * mc),
                         memory_space=pltpu.VMEM),
        ]

    out = pl.pallas_call(
        functools.partial(_atrous_kernel, step=step, halo=halo, h=h, w=w,
                          block=block, cw=cw),
        name="atrous_banded",
        grid=(grid_r, grid_c),
        in_specs=specs(3) + specs(8),
        out_specs=pl.BlockSpec((3, block, cw), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, grid_r * block, grid_c * cw),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=_interpret(),
    )(cpad, cpad, cpad, cpad, gpad, gpad, gpad, gpad)
    return out


def _atrous_forward(color, depth, normal, roughness, diffuse, passes):
    h, w = color.shape[:2]
    geom = _atrous_geometry(1 << (passes - 1), h, w)
    bypass = ((depth >= 10000.0) | (roughness < 0.1)).astype(jnp.float32)
    guide = jnp.concatenate(
        [depth[None], normal.transpose(2, 0, 1), diffuse.transpose(2, 0, 1),
         bypass[None]],
        axis=0,
    )                                                          # (8, h, w)
    gpad = _pad_planes(guide, geom, h, w)
    cp = color.transpose(2, 0, 1)
    for i in range(passes):
        cpad = _pad_planes(cp, geom, h, w)
        out = _atrous_pass_pallas(cpad, gpad, 1 << i, geom, h, w)
        cp = out[:, :h, :w]
    return cp.transpose(1, 2, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def atrous_denoise_tpu(color, depth, normal, roughness, diffuse, passes):
    """N-pass a-trous chain, Pallas forward / jnp-reference backward."""
    return _atrous_forward(color, depth, normal, roughness, diffuse, passes)


def _atrous_fwd(color, depth, normal, roughness, diffuse, passes):
    out = _atrous_forward(color, depth, normal, roughness, diffuse, passes)
    return out, (color, depth, normal, roughness, diffuse)


def _atrous_bwd(passes, res, ct):
    from sunray_tpu.render.postprocess import atrous_denoise

    color, depth, normal, roughness, diffuse = res
    _, vjp = jax.vjp(
        lambda c, d, n, r, f: atrous_denoise(c, d, n, r, f, passes,
                                             kernel="jnp"),
        color, depth, normal, roughness, diffuse,
    )
    return vjp(ct)


atrous_denoise_tpu.defvjp(_atrous_fwd, _atrous_bwd)


# ---------------------------------------------------------------------------
# TAA clamp+blend (temporal_accumulation.slang:60-132)
# ---------------------------------------------------------------------------
#
# The jnp formulation (render/postprocess.taa_clamp_blend) reads `raw` 8
# times through pad+slice shifts to build the luminance-gated 3x3 min/max
# box — ~20 ms/frame of pad_maximum fusions at 1080p (device profiler).
# Here one banded pass holds a 1-pixel-halo raw window in VMEM, takes the
# 8 taps as static shifted reads, and clamps+blends in place. Same stitched
# four-view halo trick as the a-trous kernel above; the padded planes are
# EDGE-padded so border taps replicate edge texels exactly like _shift2d.
#
# HBM footprint matters here: the 1080p ReSTIR frame runs within ~200 MB of
# the 16 GB chip, and a first cut of this kernel (separate padded raw +
# 4-channel hist/use array) pushed compile OOM by 96 MB. Two folds keep it
# lean: (a) the use_history mask is folded into the history plane before
# the kernel — where use is False, substituting raw for history makes
# clamp+blend an exact identity (the center is always inside its own
# min/max box, so clip(raw) == raw and the lerp returns raw); (b) raw and
# folded history share one 6-plane array passed four ways (same buffer).


def _taa_kernel(a_ref, b_ref, c_ref, d_ref, out_ref, *, block, cw, factor):
    wins = [
        jnp.concatenate(
            [
                jnp.concatenate([a_ref[ch], c_ref[ch]], axis=1),
                jnp.concatenate([b_ref[ch], d_ref[ch]], axis=1),
            ],
            axis=0,
        )
        for ch in range(6)
    ]

    def tap(dy, dx, chans=range(3)):
        return [wins[ch][1 + dy : 1 + dy + block, 1 + dx : 1 + dx + cw]
                for ch in chans]

    ctr = tap(0, 0)
    c_luma = _luma(ctr)
    thr = jnp.maximum(c_luma * 5.0, 0.08)
    mn = list(ctr)
    mx = list(ctr)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            nb = tap(dy, dx)
            ok = jnp.abs(_luma(nb) - c_luma) < thr
            for k in range(3):
                mn[k] = jnp.where(ok, jnp.minimum(mn[k], nb[k]), mn[k])
                mx[k] = jnp.where(ok, jnp.maximum(mx[k], nb[k]), mx[k])

    hist = tap(0, 0, chans=range(3, 6))
    for k in range(3):
        cl = jnp.clip(hist[k], mn[k], mx[k])
        out_ref[k] = cl + (ctr[k] - cl) * factor


def _taa_forward(raw, hist, use_f32, factor):
    h, w = raw.shape[:2]
    hr = 8                              # 1-px halo, sublane-tile-rounded
    wr = LANE
    block = 32
    cw = min(1024, -(-w // LANE) * LANE)
    grid_r = -(-h // block)
    grid_c = -(-w // cw)
    rows = grid_r * block + hr
    cols = grid_c * cw + wr
    hist_folded = jnp.where(use_f32[..., None] > 0.5, hist, raw)
    planes = jnp.pad(
        jnp.concatenate(
            [raw.transpose(2, 0, 1), hist_folded.transpose(2, 0, 1)], axis=0
        ),
        ((0, 0), (1, rows - h - 1), (1, cols - w - 1)),
        mode="edge",
    )
    mb = block // hr
    mc = cw // wr
    out = pl.pallas_call(
        functools.partial(_taa_kernel, block=block, cw=cw, factor=factor),
        name="taa_clamp_blend",
        grid=(grid_r, grid_c),
        in_specs=[
            pl.BlockSpec((6, block, cw), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, hr, cw), lambda i, j: (0, (i + 1) * mb, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, block, wr), lambda i, j: (0, i, (j + 1) * mc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, hr, wr),
                         lambda i, j: (0, (i + 1) * mb, (j + 1) * mc),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, block, cw), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, grid_r * block, grid_c * cw),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=_interpret(),
    )(planes, planes, planes, planes)
    return out[:, :h, :w].transpose(1, 2, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def taa_clamp_blend_tpu(raw, hist, use_f32, factor):
    """Banded Pallas TAA clamp+blend; jnp-reference backward."""
    return _taa_forward(raw, hist, use_f32, factor)


def _taa_fwd(raw, hist, use_f32, factor):
    return _taa_forward(raw, hist, use_f32, factor), (raw, hist, use_f32)


def _taa_bwd(factor, res, ct):
    from sunray_tpu.render.postprocess import taa_clamp_blend

    raw, hist, use_f32 = res
    _, vjp = jax.vjp(
        lambda r, hst: taa_clamp_blend(r, hst, use_f32 > 0.5, factor),
        raw, hist,
    )
    dr, dh = vjp(ct)
    return dr, dh, jnp.zeros_like(use_f32)


taa_clamp_blend_tpu.defvjp(_taa_fwd, _taa_bwd)
