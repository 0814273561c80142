"""Pallas a-trous denoise kernel vs the jnp reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sunray_tpu.ops.pallas_image import atrous_denoise_tpu
from sunray_tpu.render.postprocess import atrous_denoise


def _inputs(h, w, seed=0):
    k = jax.random.split(jax.random.PRNGKey(seed), 5)
    color = jax.random.uniform(k[0], (h, w, 3), maxval=3.0)
    depth = jax.random.uniform(k[1], (h, w), minval=0.5, maxval=6.0)
    normal = jax.random.normal(k[2], (h, w, 3))
    normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
    roughness = jax.random.uniform(k[3], (h, w))
    diffuse = jax.random.uniform(k[4], (h, w, 3), minval=0.05)
    # Sky and smooth regions exercise the bypass.
    depth = depth.at[:4, :6].set(100000.0)
    roughness = roughness.at[10:14, 3:9].set(0.01)
    return color, depth, normal, roughness, diffuse


@pytest.mark.parametrize("h,w", [(48, 64), (37, 53)])
@pytest.mark.parametrize("passes", [1, 2, 4])
def test_matches_jnp_reference(h, w, passes):
    args = _inputs(h, w)
    ref = atrous_denoise(*args, passes, kernel="jnp")
    out = atrous_denoise_tpu(*args, passes)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_dispatch_forced_pallas_matches():
    args = _inputs(40, 40, seed=3)
    ref = atrous_denoise(*args, 2, kernel="jnp")
    out = atrous_denoise(*args, 2, kernel="pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_large_step_window():
    """step 8 (pass 4) needs the full 2-block row window; tiny image makes
    every tap hit the out-of-bounds mask path."""
    args = _inputs(33, 33, seed=5)
    ref = atrous_denoise(*args, 4, kernel="jnp")
    out = atrous_denoise_tpu(*args, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_gradients_route_through_jnp_reference():
    args = _inputs(32, 40, seed=7)

    def loss_pallas(c, f):
        return jnp.sum(atrous_denoise_tpu(c, args[1], args[2], args[3], f, 2)
                       ** 2)

    def loss_jnp(c, f):
        return jnp.sum(
            atrous_denoise(c, args[1], args[2], args[3], f, 2, kernel="jnp")
            ** 2
        )

    g_p = jax.grad(loss_pallas, argnums=(0, 1))(args[0], args[4])
    g_j = jax.grad(loss_jnp, argnums=(0, 1))(args[0], args[4])
    for a, b in zip(g_p, g_j):
        assert np.isfinite(np.asarray(a)).all()
        # bwd is the jnp VJP evaluated at the same primals; only the
        # cotangent differs (pallas vs jnp forward reassociation), so
        # small absolute noise on near-zero entries is expected.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# TAA clamp+blend kernel
# ---------------------------------------------------------------------------


def _taa_inputs(h, w, seed=11):
    k = jax.random.split(jax.random.PRNGKey(seed), 3)
    raw = jax.random.uniform(k[0], (h, w, 3), maxval=4.0)
    hist = jax.random.uniform(k[1], (h, w, 3), maxval=4.0)
    use = jax.random.bernoulli(k[2], 0.8, (h, w))
    return raw, hist, use


@pytest.mark.parametrize("h,w", [(48, 64), (37, 53), (33, 130)])
def test_taa_matches_jnp_reference(h, w):
    from sunray_tpu.ops.pallas_image import taa_clamp_blend_tpu
    from sunray_tpu.render.postprocess import taa_clamp_blend

    raw, hist, use = _taa_inputs(h, w)
    ref = taa_clamp_blend(raw, hist, use, 0.14)
    out = taa_clamp_blend_tpu(raw, hist, use.astype(jnp.float32), 0.14)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-6, atol=2e-7)


def test_taa_dispatch_in_temporal_accumulate():
    """kernel="pallas" through temporal_accumulate (interpret mode off-TPU)
    matches kernel="jnp" including the banded history fetch."""
    from sunray_tpu.render.postprocess import temporal_accumulate

    h, w = 40, 48
    k = jax.random.split(jax.random.PRNGKey(2), 3)
    raw = jax.random.uniform(k[0], (h, w, 3), maxval=2.0)
    hist = jax.random.uniform(k[1], (h, w, 3), maxval=2.0)
    motion = (jax.random.uniform(k[2], (h, w, 2)) - 0.5) * 0.05
    ref = temporal_accumulate(raw, motion, hist, 5, 0.14,
                              history_band=8, history_halo=8, kernel="jnp")
    out = temporal_accumulate(raw, motion, hist, 5, 0.14,
                              history_band=8, history_halo=8, kernel="pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-6, atol=2e-7)


def test_taa_gradients_route_through_jnp_reference():
    from sunray_tpu.ops.pallas_image import taa_clamp_blend_tpu
    from sunray_tpu.render.postprocess import taa_clamp_blend

    raw, hist, use = _taa_inputs(32, 40, seed=13)

    g_p = jax.grad(
        lambda r, hs: jnp.sum(
            taa_clamp_blend_tpu(r, hs, use.astype(jnp.float32), 0.14) ** 2
        ),
        argnums=(0, 1),
    )(raw, hist)
    g_j = jax.grad(
        lambda r, hs: jnp.sum(taa_clamp_blend(r, hs, use, 0.14) ** 2),
        argnums=(0, 1),
    )(raw, hist)
    for a, b in zip(g_p, g_j):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
