"""Counter-based PCG RNG, bit-exact with the reference.

Reproduces shaders/rt_utils.slang:38-59 exactly in uint32 arithmetic:
  - pcg_hash:   x ^= x>>16; x *= 0x7feb352d; x ^= x>>15; x *= 0x846ca68b; x ^= x>>16
  - seed init:  pcg_hash(pixel_idx ^ pcg_hash(frame))   (rt_utils.slang:47-52)
  - rnd (LCG + PCG output): seed = seed*747796405 + 2891336453;
        word = ((seed >> ((seed>>28)+4)) ^ seed) * 277803737;
        return ((word>>22) ^ word) / 4294967295

The seed is carried explicitly as a uint32 array (one stream per pixel),
making the whole frame function a pure counter-based computation — the JAX
way to express the reference's per-thread `inout Rng` state. Because our
vectorized control flow evaluates some draws that the reference's divergent
control flow skips, per-pixel sequences match the reference *per call site
count*, not globally; images match statistically (see SURVEY.md section 7
"Hard parts" item 3).
"""

from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32
_INV_U32_MAX = 1.0 / 4294967295.0


def pcg_hash(x):
    """rt_utils.slang:38-45."""
    x = jnp.asarray(x, _U32)
    x = x ^ (x >> 16)
    x = x * _U32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * _U32(0x846CA68B)
    x = x ^ (x >> 16)
    return x


def init_seed(pixel_idx, frame):
    """rt_utils.slang:47-52: seed = pcg_hash(pixel_idx ^ pcg_hash(frame))."""
    pixel_idx = jnp.asarray(pixel_idx, _U32)
    frame = jnp.asarray(frame, _U32)
    return pcg_hash(pixel_idx ^ pcg_hash(frame))


def rnd(seed):
    """rt_utils.slang:54-59. Returns (new_seed, uniform float32 in [0, 1])."""
    seed = seed * _U32(747796405) + _U32(2891336453)
    shift = (seed >> 28) + _U32(4)
    word = ((seed >> shift) ^ seed) * _U32(277803737)
    result = (word >> 22) ^ word
    return seed, result.astype(jnp.float32) * jnp.float32(_INV_U32_MAX)


def rnd2(seed):
    """Two consecutive draws. Returns (new_seed, u1, u2)."""
    seed, u1 = rnd(seed)
    seed, u2 = rnd(seed)
    return seed, u1, u2


def rnd_chain(seed, n: int):
    """n consecutive draws AT ONCE, bit-exact with n sequential rnd calls.

    The seed evolution is a value-independent LCG (seed' = A*seed + C mod
    2^32), so the state after j draws is alpha_j*seed + beta_j with
    compile-time uint32 constants — every draw of a fixed-length chain can
    be evaluated in parallel lanes instead of a sequential dependency
    chain. This is what lets the RIS audition batch its candidates into
    (P, K) planes that read the surface attributes ONCE
    (restir.ris_audition; the sequential form re-read them per candidate —
    the round-3 profile's multiply-reduce wall).

    Returns (new_seed (...,), draws (..., n) float32 in [0, 1])."""
    a = 747796405
    c = 2891336453
    mask = (1 << 32) - 1
    alphas = []
    betas = []
    al, be = 1, 0
    for _ in range(n):
        al = (a * al) & mask
        be = (a * be + c) & mask
        alphas.append(al)
        betas.append(be)
    import numpy as np

    al_v = jnp.asarray(np.asarray(alphas, np.uint32))
    be_v = jnp.asarray(np.asarray(betas, np.uint32))
    seed = jnp.asarray(seed, _U32)
    seeds = seed[..., None] * al_v + be_v              # (..., n) uint32
    shift = (seeds >> 28) + _U32(4)
    word = ((seeds >> shift) ^ seeds) * _U32(277803737)
    result = (word >> 22) ^ word
    return seeds[..., -1], result.astype(jnp.float32) * jnp.float32(
        _INV_U32_MAX
    )
