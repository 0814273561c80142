"""GPU pack/unpack formats and octahedral normal encoding.

Bit-compatible with shaders/rt_utils.slang:68-114 (which itself matches the
GLSL `OpExtInst` pack/unpack builtins). These are used for compact reservoir
and G-buffer storage; the differentiable render path keeps float32 instead
(packing is a hard quantization, see config.RenderConfig.differentiable).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_U32 = jnp.uint32


def pack_snorm_2x16(v):
    """rt_utils.slang:68-71. v: (..., 2) float -> (...,) uint32."""
    i = jnp.round(jnp.clip(v, -1.0, 1.0) * 32767.0).astype(jnp.int32)
    x = i[..., 0].astype(_U32) & _U32(0xFFFF)
    y = i[..., 1].astype(_U32) & _U32(0xFFFF)
    return x | (y << 16)


def unpack_snorm_2x16(p):
    """rt_utils.slang:72-76."""
    p = jnp.asarray(p, _U32)
    x = (p << 16).astype(jnp.int32) >> 16
    y = p.astype(jnp.int32) >> 16
    v = jnp.stack([x, y], axis=-1).astype(jnp.float32) / 32767.0
    return jnp.clip(v, -1.0, 1.0)


def pack_unorm_4x8(v):
    """rt_utils.slang:77-80. v: (..., 4) float -> (...,) uint32."""
    c = jnp.round(jnp.clip(v, 0.0, 1.0) * 255.0).astype(_U32)
    return c[..., 0] | (c[..., 1] << 8) | (c[..., 2] << 16) | (c[..., 3] << 24)


def unpack_unorm_4x8(p):
    """rt_utils.slang:81-88."""
    p = jnp.asarray(p, _U32)
    return jnp.stack(
        [
            ((p >> 0) & _U32(0xFF)).astype(jnp.float32) / 255.0,
            ((p >> 8) & _U32(0xFF)).astype(jnp.float32) / 255.0,
            ((p >> 16) & _U32(0xFF)).astype(jnp.float32) / 255.0,
            ((p >> 24) & _U32(0xFF)).astype(jnp.float32) / 255.0,
        ],
        axis=-1,
    )


def _f32_to_f16_bits(x):
    h = jnp.asarray(x, jnp.float32).astype(jnp.float16)
    return jax.lax.bitcast_convert_type(h, jnp.uint16).astype(_U32)


def _f16_bits_to_f32(bits):
    h = jax.lax.bitcast_convert_type(bits.astype(jnp.uint16), jnp.float16)
    return h.astype(jnp.float32)


def pack_half_2x16(v):
    """rt_utils.slang:89-91. v: (..., 2) float -> (...,) uint32."""
    return _f32_to_f16_bits(v[..., 0]) | (_f32_to_f16_bits(v[..., 1]) << 16)


def unpack_half_2x16(p):
    """rt_utils.slang:92-94."""
    p = jnp.asarray(p, _U32)
    return jnp.stack(
        [_f16_bits_to_f32(p & _U32(0xFFFF)), _f16_bits_to_f32(p >> 16)],
        axis=-1,
    )


def _sign_not_zero(v):
    return jnp.where(v >= 0.0, 1.0, -1.0)


def pack_normal(n):
    """Octahedral normal packing (rt_utils.slang:101-105).

    n: (..., 3) unit vectors -> (...,) uint32.
    """
    n = n / (jnp.abs(n[..., 0:1]) + jnp.abs(n[..., 1:2]) + jnp.abs(n[..., 2:3]))
    xy = n[..., :2]
    folded = (1.0 - jnp.abs(n[..., [1, 0]])) * _sign_not_zero(xy)
    p = jnp.where(n[..., 2:3] >= 0.0, xy, folded)
    return pack_snorm_2x16(p)


def unpack_normal(p):
    """rt_utils.slang:107-114. -> (..., 3) unit vectors."""
    v = unpack_snorm_2x16(p)
    z = 1.0 - jnp.abs(v[..., 0]) - jnp.abs(v[..., 1])
    t = jnp.maximum(-z, 0.0)
    x = v[..., 0] + jnp.where(v[..., 0] >= 0.0, -t, t)
    y = v[..., 1] + jnp.where(v[..., 1] >= 0.0, -t, t)
    n = jnp.stack([x, y, z], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)
