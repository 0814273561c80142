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
