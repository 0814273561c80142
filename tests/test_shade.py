"""Shading-normal policy tests.

The reference stores the interpolated normal UNFLIPPED
(closest_hit.slang:49-50), so backfaces shade with a normal pointing away
from the viewer — the firefly-leak class documented in docs/PARITY.md.
`face_forward=True` (cfg.face_forward_normals) is the opt-in mitigation.
"""

import jax.numpy as jnp

from sunray_tpu.ops import intersect
from sunray_tpu.render.shade import shade_hits
from sunray_tpu.scene import cornell_box


def _hit_backface():
    """A ray from OUTSIDE the Cornell box hitting the back wall's backface."""
    scene = cornell_box()
    w = tuple(scene.positions[scene.tri_vidx[:, k]] for k in range(3))
    o = jnp.asarray([[1.0, 1.0, -2.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    h = intersect.trace_closest_brute(w, o, d)
    assert bool(h.hit[0]), "expected the outside ray to hit a wall backface"
    return scene, o, d, h


class TestFaceForwardNormals:
    def test_default_keeps_reference_unflipped(self):
        scene, o, d, h = _hit_backface()
        s = shade_hits(scene, o, d, h)
        # Reference parity: the stored normal faces AWAY from the ray.
        assert float(jnp.sum(s.geo_normal[0] * d[0])) > 0.0
        assert float(jnp.sum(s.normal[0] * d[0])) > 0.0

    def test_face_forward_flips_both_normals(self):
        scene, o, d, h = _hit_backface()
        s0 = shade_hits(scene, o, d, h)
        s1 = shade_hits(scene, o, d, h, face_forward=True)
        assert float(jnp.sum(s1.geo_normal[0] * d[0])) < 0.0
        assert float(jnp.sum(s1.normal[0] * d[0])) < 0.0
        # Pure sign flip — same line, opposite direction.
        assert float(jnp.linalg.norm(s1.geo_normal[0] + s0.geo_normal[0])) < 1e-6
        # Everything else identical.
        assert float(jnp.abs(s1.albedo - s0.albedo).max()) == 0.0
        assert float(jnp.abs(s1.dist - s0.dist).max()) == 0.0

    def test_frontface_untouched(self):
        scene = cornell_box()
        w = tuple(scene.positions[scene.tri_vidx[:, k]] for k in range(3))
        o = jnp.asarray([[1.0, 1.0, 3.0]])   # inside-facing view
        d = jnp.asarray([[0.0, 0.0, -1.0]])
        h = intersect.trace_closest_brute(w, o, d)
        assert bool(h.hit[0])
        s0 = shade_hits(scene, o, d, h)
        s1 = shade_hits(scene, o, d, h, face_forward=True)
        assert float(jnp.abs(s1.normal - s0.normal).max()) == 0.0
        assert float(jnp.abs(s1.geo_normal - s0.geo_normal).max()) == 0.0
