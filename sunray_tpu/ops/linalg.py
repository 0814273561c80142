"""Precision-pinned linear algebra helpers.

On TPU, default-precision einsum/matmul truncates inputs to bfloat16 on the
MXU. Every contraction in this framework is a geometry transform where that
costs visible image error (vertex positions quantized to 8 mantissa bits),
so all modules route through einsum32 (float32-accurate, HIGHEST precision).
Kernels that *want* bf16 throughput must opt in explicitly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def einsum32(subscripts, *operands):
    return jnp.einsum(
        subscripts, *operands, precision=jax.lax.Precision.HIGHEST
    )


# Select-chain vs dynamic gather break-even: XLA's TPU gather runs at
# ~25 ns/element when the table can't live in VMEM (~50 ms per 2M-lane
# gather); a K-row select chain costs K compare+selects of VPU time
# (~2 ms at K=128 for 2M lanes). Chains win by ~25x up to a few hundred
# rows; beyond that compile size grows linearly, so cap conservatively.
SELECT_GATHER_MAX_ROWS = 128


def gather_vec(table, idx):
    """Gather rows of a small-component table by index — TPU-layout safe.

    `table[idx]` with table (K, C...) and small C materializes a (N, C...)
    buffer whose trailing dims get padded to the (8, 128) tile — a 25-60x
    HBM expansion that OOMs 1080p frames (observed: a (P,3,5,2) UV gather
    padding 237MB to 9.9GB). Decomposing into C independent 1-D gathers
    keeps every materialized buffer (N,)-shaped (padding-free); the final
    stack is an elementwise producer XLA fuses into consumers.

    Tables with few rows (lights, materials, instances of small scenes) use
    a select chain instead: XLA's TPU gather emitter serializes dynamic
    gathers it can't cache in VMEM (~25 ns/element — 49 ms for a 72-float
    light table gathered by 6M lanes); per-row compare+select is pure VPU
    and fuses into consumers.
    """
    comp_shape = table.shape[1:]
    flat = table.reshape(table.shape[0], -1)
    k = flat.shape[0]
    # Select chains only pay off on TPU (the serial-gather problem is
    # TPU-specific); on CPU they just bloat compile time.
    use_select = jax.default_backend() == "tpu"
    if use_select and 0 < k <= SELECT_GATHER_MAX_ROWS:
        out = jnp.zeros(idx.shape + (flat.shape[1],), flat.dtype)
        for row in range(k):
            sel = (idx == row)[..., None]
            out = jnp.where(sel, flat[row], out)
        return out.reshape(idx.shape + comp_shape)
    cols = [flat[:, c][idx] for c in range(flat.shape[1])]
    out = jnp.stack(cols, axis=-1)
    return out.reshape(idx.shape + comp_shape)
