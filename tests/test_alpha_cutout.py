"""Any-hit alpha cutout (any_hit.slang parity)."""

import numpy as np
import jax.numpy as jnp

from sunray_tpu.config import RenderConfig
from sunray_tpu.render.trace import make_tracer, trace_closest, trace_occluded
from sunray_tpu.scene.types import (
    ALPHA_MASK,
    MaterialTable,
    TextureAtlas,
    build_scene,
    identity_transform,
)


def masked_scene():
    """Two parallel quads: front one alpha-MASKED with a half-transparent
    checker texture (left half alpha 0, right half alpha 1), back opaque."""
    positions = np.asarray(
        [
            # front quad at z=1
            [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
            # back quad at z=0
            [-2, -2, 0], [2, -2, 0], [2, 2, 0], [-2, 2, 0],
        ],
        np.float32,
    )
    normals = np.tile(np.asarray([[0, 0, 1.0]], np.float32), (8, 1))
    tris = np.asarray(
        [[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], np.int32
    )
    prim_of_tri = np.asarray([0, 0, 1, 1], np.int32)
    uvs = np.zeros((8, 5, 2), np.float32)
    # front quad uv: x in [0,1]
    uvs[0, :, :] = [0, 0]
    uvs[1, :, :] = [1, 0]
    uvs[2, :, :] = [1, 1]
    uvs[3, :, :] = [0, 1]

    # texture: left half alpha 0, right half alpha 1
    tex = np.ones((1, 8, 8, 4), np.float32)
    tex[:, :, :4, 3] = 0.0
    atlas = TextureAtlas(
        data=jnp.asarray(tex),
        size=jnp.asarray([[8, 8]], jnp.int32),
        wrap=jnp.ones((1, 2), jnp.int32),   # clamp
        filt=jnp.zeros((1,), jnp.int32),    # nearest
    )
    mats = MaterialTable.build(
        [
            {
                "base_color": (1, 1, 1, 1),
                "alpha_mode": ALPHA_MASK,
                "alpha_cutoff": 0.5,
                "tex_index": [0, -1, -1, -1, -1],
            },
            {"base_color": (0.5, 0.5, 0.5, 1.0)},
        ]
    )
    return build_scene(
        positions, normals, tris, prim_of_tri, mats,
        instances=[(0, identity_transform()), (1, identity_transform())],
        uvs=uvs, textures=atlas,
    )


CFG = RenderConfig(width=8, height=8, alpha_mask_tracing=True, tracer="brute")


class TestAlphaCutout:
    def test_closest_skips_cutout(self):
        scene = masked_scene()
        tracer = make_tracer(scene, CFG)
        # Ray through the LEFT half (alpha 0) passes to the back quad;
        # through the RIGHT half (alpha 1) hits the front quad.
        o = jnp.asarray([[-0.5, -0.2, 3.0], [0.5, -0.2, 3.0]])
        d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
        h = trace_closest(tracer, o, d)
        assert bool(h.hit.all())
        np.testing.assert_allclose(float(h.t[0]), 3.0, rtol=1e-4)  # back
        np.testing.assert_allclose(float(h.t[1]), 2.0, rtol=1e-4)  # front

    def test_occlusion_respects_cutout(self):
        scene = masked_scene()
        tracer = make_tracer(scene, CFG)
        o = jnp.asarray([[-0.5, -0.2, 3.0], [0.5, -0.2, 3.0]])
        d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
        tmax = jnp.asarray([2.5, 2.5])  # segment ends between quads
        occ = trace_occluded(tracer, o, d, tmax)
        assert not bool(occ[0])  # left: cutout -> clear
        assert bool(occ[1])      # right: blocked by front quad

    def test_opaque_path_unchanged_without_flag(self):
        scene = masked_scene()
        cfg = CFG.replace(alpha_mask_tracing=False)
        tracer = make_tracer(scene, cfg)
        o = jnp.asarray([[-0.5, -0.2, 3.0]])
        d = jnp.asarray([[0.0, 0.0, -1.0]])
        h = trace_closest(tracer, o, d)
        np.testing.assert_allclose(float(h.t[0]), 2.0, rtol=1e-4)
