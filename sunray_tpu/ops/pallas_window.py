"""Pallas window-select kernel: the history-read fast paths in one pass.

The frame's temporal history reads (ReSTIR DI/GI reservoirs, TAA color)
resolve — on static/panning cameras — to "every lane reads one of K
globally-shifted copies of the table" (ops/banded.shift_row_gather: a
global motion roll + a (2r+1)^2 / 4-tap / 1-tap residual window). The jnp
formulation costs ~9-12 full-table passes per read (bitcast, dynamic roll,
wrap extension, K shifted read streams through the select chain, write);
the round-4 device profile charged ~2.3 + 1.9 + 1.8 ms to the three
history conds at 1080p (docs/PERFORMANCE.md).

This kernel does the whole thing in ~1.05 table reads + 1 write: the
table rides TRANSPOSED (C, P) — C along sublanes (no tile padding for
13-17 column tables; P minor) — and stays in HBM (memory_space ANY); each
grid step DMAs its [block + window-span] slice into VMEM once and selects
among the K statically-offset streams per lane. The dynamic global-motion
shift g folds into the DMA start (128-aligned; the sub-tile remainder
rides the in-VMEM dynamic slice offsets), so the separate rolled copy of
the table disappears too.

Edge handling: the caller builds the table with `PAD` zero lanes on BOTH
sides (pad_width()) so every block's window is in-bounds whenever
|g| <= max_shift() — no per-block clamping can ever misalign a stream
(the first version clamped and corrupted block 0's negative taps; pinned
by tests/test_banded.py::TestWindowSelectKernel). Faster global motion
than max_shift() must take the banded fallback (banded.auto_row_gather_t
folds that bound into its cond predicates). Lanes whose SOURCE is
off-table read the zero pad / wrapped garbage — exactly
shift_row_gather's contract (callers mask on their in-bounds validity).

Exactness: pure data movement (DMA + bit-preserving selects on the f32-
bitcast view), so lanes whose key selects a tap are BIT-IDENTICAL to the
jnp roll+select chain; int32 columns bitcast through f32 planes never
pass a float datapath (no denormal-flush hazard).

The reference has no analog (hardware texture units make gathers free);
this is a TPU execution strategy for ray_gen_ris.slang:233-267/:408-432's
reprojected history reads, documented in docs/PARITY.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 32768          # lanes (table rows) per grid step; minor-dim block
ALIGN = 128            # DMA start alignment (lane tile)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def block_size(p: int) -> int:
    return min(BLOCK, -(-p // ALIGN) * ALIGN)


def _ceil_align(x: int) -> int:
    return -(-x // ALIGN) * ALIGN


def pads(p: int):
    """(left, right) zero-lane padding the caller must add around the
    (C, P) table (one concatenate — the caller builds the table anyway).
    The right pad additionally rounds the padded width to a lane-tile
    multiple so every DMA window stays 128-aligned (Mosaic requires
    provable alignment for wide VMEM loads)."""
    bp = block_size(p)
    # The extra 2*ALIGN on the right absorbs the floor-alignment slack of
    # g128/min_s128 at the last block (worst case +127 lanes past 4*bp+P).
    return 2 * bp, 2 * bp + (_ceil_align(p) - p) + 2 * ALIGN


def build_table(parts, p):
    """Assemble the kernel's padded transposed table from (k, P) float32
    row groups: C is rounded up to a sublane tile (8 — Mosaic requires
    DMA slices 8-aligned in dim 0) with zero rows, and pads(p) zero lanes
    go on each side, all in one concatenate pair. Returns
    (ceil8(C), pad_l + P + pad_r); consumers read only the first C rows."""
    c_total = sum(x.shape[0] for x in parts)
    c8 = -(-c_total // 8) * 8
    pad_l, pad_r = pads(p)
    rows = list(parts)
    if c8 > c_total:
        rows.append(jnp.zeros((c8 - c_total, p), jnp.float32))
    core = jnp.concatenate(rows, axis=0)
    return jnp.concatenate(
        [jnp.zeros((c8, pad_l), jnp.float32), core,
         jnp.zeros((c8, pad_r), jnp.float32)], axis=1
    )


def max_shift(p: int, span: int) -> int:
    """Largest |global shift| the kernel path serves; beyond it the ladder
    must fall back (window would leave the padded table)."""
    return block_size(p) - span - 4 * ALIGN


def _window_select_kernel(g_ref, tbl_ref, key_ref, out_ref, scratch, sem,
                          *, taps, min_s128, win, bp, pad_l, p_pad):
    i = pl.program_id(0)
    # g rides pre-split: g128 (128-multiple, folds into the DMA start) and
    # gmod in [0, 128) (folds into the per-tap lane rotates) — Mosaic
    # requires VMEM vector loads at provably 128-aligned offsets.
    g128 = pl.multiple_of(g_ref[0], ALIGN)
    gmod = g_ref[1]
    # Lanes [i*bp, (i+1)*bp) read logical table rows i*bp + k + g + s,
    # at pad_l + i*bp + k + g + s in the padded table. The defensive clip
    # never moves the window when the caller honored max_shift().
    start = pad_l + i * bp + g128 + min_s128
    start = pl.multiple_of(jnp.clip(start, 0, p_pad - win), ALIGN)
    dma = pltpu.make_async_copy(
        tbl_ref.at[:, pl.ds(start, win)], scratch, sem
    )
    dma.start()
    dma.wait()
    key = key_ref[0, :]
    out = None
    ext = bp + 2 * ALIGN
    for k, s in enumerate(taps):
        delta = s - min_s128           # static, in [0, span + 128)
        q = (delta // ALIGN) * ALIGN   # static aligned window base
        m = delta - q                  # static sub-tile remainder
        x = scratch[:, q:q + ext]      # aligned static slice
        # stream[j] = x[j + gmod + m]: circular left-rotate by gmod + m
        # (< 256, covered by the 2*ALIGN extension), realized as a right
        # roll by ext - (gmod + m).
        stream = pltpu.roll(x, ext - (gmod + m), axis=1)[:, :bp]
        out = stream if out is None else jnp.where(
            (key == k)[None, :], stream, out
        )
    out_ref[...] = out


def window_select_t(table_pad_t, key, g, taps, p):
    """Select per lane among statically-offset shifted views of a padded
    (C, pl + P + pr) table ((pl, pr) = pads(p) zero lanes around it):
    out[:, i] = table[:, i + g + taps[key[i]]] in LOGICAL row coordinates,
    for key[i] >= 0 (arbitrary data otherwise — callers mask).

    table_pad_t: (C, pl + P + pr) float32 (bitcast int columns upstream).
    key:         (P,) int32 in [-1, len(taps)).
    g:           scalar int32 dynamic global shift, |g| <= max_shift().
    Returns (C, P) float32.
    """
    c, p_pad = table_pad_t.shape
    pad_l, pad_r = pads(p)
    assert p_pad == pad_l + pad_r + p, (p_pad, pad_l, pad_r, p)
    assert c % 8 == 0, c  # sublane-tile alignment (build_table pads)
    min_s = min(taps)
    min_s128 = (min_s // ALIGN) * ALIGN
    span_ext = max(taps) - min_s128    # static, < span + 128
    # All K rotated streams are live in VMEM at the select chain, so the
    # block shrinks with K ((K+3) ~ streams + scratch/out/slack; the
    # 9-tap branch at a fixed 32768 block OOM'd the 16 MB scoped VMEM).
    bp = min(block_size(p),
             (2 * BLOCK // (len(taps) + 3)) // ALIGN * ALIGN)
    win = bp + _ceil_align(span_ext + 2 * ALIGN) + ALIGN
    nb = pl.cdiv(p, bp)
    g = jnp.asarray(g, jnp.int32)
    g128 = (g // ALIGN) * ALIGN        # floor division: gmod in [0, 128)
    g_arr = jnp.stack([g128, g - g128])

    kernel = functools.partial(
        _window_select_kernel, taps=tuple(taps), min_s128=min_s128,
        win=win, bp=bp, pad_l=pad_l, p_pad=p_pad,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, bp), lambda i, g: (0, i)),
        ],
        out_specs=pl.BlockSpec((c, bp), lambda i, g: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((c, win), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        name=f"history_window_select_{len(taps)}tap",
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c, p), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(g_arr, table_pad_t, key[None, :])
