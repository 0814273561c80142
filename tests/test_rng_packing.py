"""Bit-exactness tests for the PCG RNG and pack/unpack helpers against
straight numpy re-evaluations of the reference formulas
(shaders/rt_utils.slang:38-114)."""

import numpy as np
import jax.numpy as jnp

from sunray_tpu.ops import rng, packing


def np_pcg_hash(x):
    with np.errstate(over="ignore"):
        x = np.uint32(x)
        x ^= x >> np.uint32(16)
        x = np.uint32(x * np.uint32(0x7FEB352D))
        x ^= x >> np.uint32(15)
        x = np.uint32(x * np.uint32(0x846CA68B))
        x ^= x >> np.uint32(16)
    return x


def np_rnd(seed):
    with np.errstate(over="ignore"):
        seed = np.uint32(seed * np.uint32(747796405) + np.uint32(2891336453))
        shift = np.uint32((seed >> np.uint32(28)) + np.uint32(4))
        word = np.uint32(((seed >> shift) ^ seed) * np.uint32(277803737))
        result = np.uint32((word >> np.uint32(22)) ^ word)
    return seed, np.float32(result) / np.float32(4294967295.0)


class TestRng:
    def test_pcg_hash_bit_exact(self):
        xs = np.array([0, 1, 42, 0xDEADBEEF, 0xFFFFFFFF, 123456789], np.uint32)
        got = np.asarray(rng.pcg_hash(jnp.asarray(xs)))
        want = np.array([np_pcg_hash(x) for x in xs], np.uint32)
        np.testing.assert_array_equal(got, want)

    def test_seed_init(self):
        # rt_utils.slang:47-52
        pixel_idx = np.uint32(37 * 640 + 11)
        frame = np.uint32(7)
        want = np_pcg_hash(pixel_idx ^ np_pcg_hash(frame))
        got = np.asarray(rng.init_seed(pixel_idx, frame))
        assert got == want

    def test_rnd_sequence_bit_exact(self):
        seed0 = rng.init_seed(np.uint32(12345), np.uint32(3))
        s_np = np.asarray(seed0)
        s_jx = seed0
        for _ in range(16):
            s_np, u_np = np_rnd(s_np)
            s_jx, u_jx = rng.rnd(s_jx)
            assert np.asarray(s_jx) == s_np
            assert np.float32(u_jx) == u_np

    def test_rnd_uniformity(self):
        seeds = rng.init_seed(jnp.arange(10000, dtype=jnp.uint32), 0)
        _, u = rng.rnd(seeds)
        u = np.asarray(u)
        assert 0.0 <= u.min() and u.max() <= 1.0
        assert abs(u.mean() - 0.5) < 0.02
        assert abs(np.var(u) - 1.0 / 12.0) < 0.01


class TestPacking:
    def test_unorm4x8_roundtrip(self):
        v = np.random.default_rng(0).uniform(0, 1, (64, 4)).astype(np.float32)
        p = packing.pack_unorm_4x8(jnp.asarray(v))
        out = np.asarray(packing.unpack_unorm_4x8(p))
        np.testing.assert_allclose(out, v, atol=1.0 / 255.0 / 2 + 1e-6)

    def test_unorm4x8_bit_layout(self):
        p = packing.pack_unorm_4x8(jnp.asarray([[1.0, 0.0, 0.0, 1.0]]))
        assert np.asarray(p)[0] == np.uint32(0xFF0000FF)

    def test_snorm2x16_roundtrip(self):
        v = np.random.default_rng(1).uniform(-1, 1, (64, 2)).astype(np.float32)
        p = packing.pack_snorm_2x16(jnp.asarray(v))
        out = np.asarray(packing.unpack_snorm_2x16(p))
        np.testing.assert_allclose(out, v, atol=1.0 / 32767.0)

    def test_half2x16_roundtrip(self):
        v = np.array([[0.5, 2.25], [1.0, 0.0], [0.1, 100.0]], np.float32)
        p = packing.pack_half_2x16(jnp.asarray(v))
        out = np.asarray(packing.unpack_half_2x16(p))
        np.testing.assert_allclose(out, v.astype(np.float16).astype(np.float32))

    def test_half2x16_bit_layout(self):
        # 1.0f16 = 0x3C00
        p = np.asarray(packing.pack_half_2x16(jnp.asarray([[1.0, 1.0]])))
        assert p[0] == np.uint32(0x3C003C00)

    def test_octahedral_normal_roundtrip(self):
        g = np.random.default_rng(2)
        n = g.normal(size=(256, 3)).astype(np.float32)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        p = packing.pack_normal(jnp.asarray(n))
        out = np.asarray(packing.unpack_normal(p))
        # snorm16 octahedral is accurate to ~1e-4 radians
        dots = np.sum(out * n, axis=-1)
        assert dots.min() > 0.99999

    def test_octahedral_axes(self):
        axes = np.eye(3, dtype=np.float32)
        axes = np.concatenate([axes, -axes])
        p = packing.pack_normal(jnp.asarray(axes))
        out = np.asarray(packing.unpack_normal(p))
        np.testing.assert_allclose(out, axes, atol=1e-4)
