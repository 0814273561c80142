"""Shadow-boundary (visibility) gradient tests — render/boundary.py.

Validates the silhouette-edge boundary estimator against dense-MC
ground truth of the NEE direct-light integral (the quantity whose
derivative the zero-forward injection must reproduce). The rendered
end-to-end check lives in test_grads.py::TestOcclusionBoundary*; these
pin the estimator itself, where FD of the true integral is computable
without per-pixel visibility flip noise.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sunray_tpu.render import boundary, restir
from sunray_tpu.scene import cornell_box
from sunray_tpu.scene.procedural import _MeshBuilder


def _edge_scene_quad(half=0.22, dx=0.0):
    """Occluder quad at y=1 between a floor point and a triangle light
    at y=2 (the controlled case from the module's validation)."""
    q = np.array(
        [[-half, 1.0, -half], [half, 1.0, -half],
         [half, 1.0, half], [-half, 1.0, half]], np.float32,
    )
    q[:, 0] += dx
    tri = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return q, tri


class _Obj:
    pass


def _manual_topology(tri):
    edges = {}
    et, ek = [], []
    for t in range(tri.shape[0]):
        for k in range(3):
            a_, b_ = tri[t, k], tri[t, (k + 1) % 3]
            key = (min(a_, b_), max(a_, b_))
            if key in edges:
                et[edges[key]] = (et[edges[key]][0], t)
            else:
                edges[key] = len(et)
                et.append((t, -1))
                ek.append(k)
    o = _Obj()
    o.edge_tri = jnp.asarray(np.asarray(et, np.int32))
    o.edge_k = jnp.asarray(np.asarray(ek, np.int32))
    return o


class TestEdgeTopology:
    def test_cornell_edges(self):
        scene = boundary.with_edge_topology(cornell_box())
        et = np.asarray(scene.edge_tri)
        ek = np.asarray(scene.edge_k)
        assert et.shape[0] == ek.shape[0]
        # Measured topology of the procedural Cornell box (2026-08-20):
        # 64 unique edges, 44 with two adjacent faces (the two closed
        # boxes contribute 2 x 18 all-paired edges; quad diagonals and
        # wall-wall corner seams pair too), 20 open (outer wall borders
        # + the inset light quad's rim).
        assert et.shape[0] == 64, et.shape
        assert int((et[:, 1] < 0).sum()) == 20
        assert (ek >= 0).all() and (ek < 3).all()

    def test_dedup_is_positional(self):
        """Flat-shaded meshes duplicate vertices per face — adjacency
        must still be found (vertex-id matching would see none). The
        boxes are built with per-face duplicated vertices; every one of
        their 2 x 18 edges must still find its second face."""
        scene = boundary.with_edge_topology(cornell_box())
        et = np.asarray(scene.edge_tri)
        assert int((et[:, 1] >= 0).sum()) == 44


class TestBoundaryEstimator:
    def test_controlled_quad_matches_dense_mc(self):
        """Occluder-quad case: boundary AD vs dense area-MC central FD
        of the true integral. Measured 2026-08-20: ratio 1.023."""
        lv0 = np.array([-0.8, 2.0, -0.8], np.float64)
        lv1 = np.array([0.8, 2.0, -0.8], np.float64)
        lv2 = np.array([0.0, 2.0, 0.9], np.float64)
        em = np.array([3.0, 2.0, 1.0], np.float64)
        x = np.array([0.05, 0.0, 0.02], np.float64)
        n = np.array([0.0, 1.0, 0.0], np.float64)
        alb = np.array([0.7, 0.5, 0.3], np.float64)
        half = 0.22

        def integrand(y):
            d = y - x
            dist = np.linalg.norm(d, axis=-1)
            ld = d / dist[..., None]
            cos_s = np.maximum((ld * n).sum(-1), 0)
            nl = np.cross(lv1 - lv0, lv2 - lv0)
            area = 0.5 * np.linalg.norm(nl)
            nlu = nl / np.linalg.norm(nl)
            cos_l = np.maximum(-(ld * nlu).sum(-1), 0)
            return (em[None, :] * alb[None, :] / np.pi
                    * (cos_s * cos_l / dist ** 2)[..., None]), area

        def blocked(y, dx):
            t = (1.0 - x[1]) / (y[..., 1] - x[1])
            p = x[None, :] + t[..., None] * (y - x[None, :])
            return ((t > 0) & (t < 1)
                    & (np.abs(p[..., 0] - dx) < half)
                    & (np.abs(p[..., 2]) < half))

        def integral(dx, n_s=2_000_000, seed=0):
            rng = np.random.default_rng(seed)
            u = rng.random((n_s, 2))
            s1 = np.sqrt(u[:, 0])
            b0 = 1 - s1
            b1 = u[:, 1] * s1
            b2 = 1 - b0 - b1
            y = b0[:, None] * lv0 + b1[:, None] * lv1 + b2[:, None] * lv2
            f, area = integrand(y)
            v = ~blocked(y, dx)
            return (f * v[:, None]).mean(0) * area

        eps = 2e-3
        fd = (integral(eps) - integral(-eps)) / (2 * eps)

        q, tri = _edge_scene_quad(half)
        w0 = jnp.asarray(q[tri[:, 0]])
        w1 = jnp.asarray(q[tri[:, 1]])
        w2 = jnp.asarray(q[tri[:, 2]])
        scene = _manual_topology(tri)
        lights = _Obj()
        lights.v0 = jnp.asarray(lv0[None].astype(np.float32))
        lights.v1 = jnp.asarray(lv1[None].astype(np.float32))
        lights.v2 = jnp.asarray(lv2[None].astype(np.float32))
        lights.emission = jnp.asarray(em[None].astype(np.float32))
        lights.num = 1

        def term(dx):
            sh = jnp.asarray([1.0, 0, 0], jnp.float32) * dx
            out = boundary.nee_boundary_term(
                scene, lights, (w0 + sh, w1 + sh, w2 + sh),
                jnp.asarray(x[None].astype(np.float32)),
                jnp.asarray(n[None].astype(np.float32)),
                jnp.asarray(alb[None].astype(np.float32)),
                jnp.ones((1,), bool), quadrature=64,
            )
            return out[0]

        # Zero-forward contract.
        np.testing.assert_array_equal(np.asarray(term(0.0)), 0.0)
        g = np.asarray(jax.jacfwd(term)(0.0))
        np.testing.assert_allclose(g, fd, rtol=0.06)

    @pytest.mark.slow
    def test_cornell_grid_matches_traced_truth(self):
        """Real Cornell geometry: boundary AD vs central FD of the
        dense-sampled, tracer-occluded NEE integral over a floor grid
        under translation of the box vertices. Measured 2026-08-20:
        -0.0937 vs -0.0914 (2.5%)."""
        from sunray_tpu.config import RenderConfig
        from sunray_tpu.render.trace import make_tracer, trace_occluded

        scene0 = cornell_box()
        pos0 = np.asarray(scene0.positions)
        interior = (
            (pos0[:, 1] > 1e-4) & (pos0[:, 1] < 1.3)
            & (pos0[:, 0] > 1e-3) & (pos0[:, 0] < 2.0 - 1e-3)
            & (pos0[:, 2] > 1e-3) & (pos0[:, 2] < 2.0 - 1e-3)
        )
        box_verts = np.nonzero(interior)[0]
        scene = boundary.with_edge_topology(scene0)

        g = np.linspace(0.05, 1.95, 24)
        gx, gz = np.meshgrid(g, g)
        x = np.stack(
            [gx.ravel(), np.zeros(gx.size), gz.ravel()], -1
        ).astype(np.float32)
        p = x.shape[0]
        n = np.tile(np.array([0.0, 1.0, 0.0], np.float32), (p, 1))
        alb = np.full((p, 3), 0.73, np.float32)

        def bterm_mean(dx):
            pv = jnp.asarray(pos0).at[jnp.asarray(box_verts), 0].add(dx)
            sc = scene.replace(positions=pv)
            lights = restir.Lights(sc)
            w = sc.world_triangle_vertices()
            t = boundary.nee_boundary_term(
                sc, lights, w, jnp.asarray(x), jnp.asarray(n),
                jnp.asarray(alb), jnp.ones((p,), bool), quadrature=16,
            )
            return jnp.mean(t)

        g_ad = float(jax.jacfwd(bterm_mean)(0.0))

        def true_integral(dx, seed=0, s_n=256):
            pv = pos0.copy()
            pv[box_verts, 0] += dx
            sc = scene0.replace(positions=jnp.asarray(pv))
            lights = restir.Lights(sc)
            lv0, lv1, lv2, lem = (
                np.asarray(a) for a in
                (lights.v0, lights.v1, lights.v2, lights.emission)
            )
            tracer = make_tracer(sc, RenderConfig(width=8, height=8))
            rng = np.random.default_rng(seed)
            total = np.zeros(3)
            for li in range(lights.num):
                u = rng.random((p, s_n, 2)).astype(np.float32)
                s1 = np.sqrt(u[..., 0])
                b0 = 1 - s1
                b1 = u[..., 1] * s1
                b2 = 1 - b0 - b1
                y = (b0[..., None] * lv0[li] + b1[..., None] * lv1[li]
                     + b2[..., None] * lv2[li]).astype(np.float32)
                nl = np.cross(lv1[li] - lv0[li], lv2[li] - lv0[li])
                area = 0.5 * np.linalg.norm(nl)
                nlu = nl / np.linalg.norm(nl)
                d = y - x[:, None, :]
                dist = np.linalg.norm(d, axis=-1)
                ld = d / dist[..., None]
                cos_s = np.maximum((ld * n[:, None, :]).sum(-1), 0)
                cos_l = np.maximum(-(ld * nlu).sum(-1), 0)
                f = (lem[li][None, None, :] * alb[:, None, :] / np.pi
                     * (cos_s * cos_l / dist ** 2)[..., None])
                o = np.broadcast_to(x[:, None, :], (p, s_n, 3))
                occ = np.asarray(trace_occluded(
                    tracer, jnp.asarray(o.reshape(-1, 3)),
                    jnp.asarray(ld.reshape(-1, 3)),
                    jnp.asarray(dist.reshape(-1) - 1e-3),
                    exclude=jnp.full(
                        (p * s_n,),
                        int(np.asarray(lights.world_tri)[li]), jnp.int32,
                    ),
                ))
                v = (~occ).reshape(p, s_n)
                total = total + (f * v[..., None]).mean(axis=(0, 1)) * area
            return total

        eps = 2e-2
        fd = float(
            ((true_integral(eps) - true_integral(-eps)) / (2 * eps)).mean()
        )
        assert abs(fd) > 0.02, fd
        np.testing.assert_allclose(g_ad, fd, rtol=0.20)


class TestCandidatePruning:
    """Top-K silhouette-candidate pruning (cfg.shadow_boundary_candidates)
    must reproduce the dense quadrature's gradient to float precision
    when K covers every active silhouette edge."""

    def test_pruned_matches_dense_gradient(self):
        import numpy as np

        from sunray_tpu.render import boundary, restir
        from sunray_tpu.scene import cornell_box

        scene = boundary.with_edge_topology(cornell_box())
        rng = np.random.default_rng(0)
        p = 256
        x0 = jnp.asarray(rng.uniform(0.2, 1.8, size=(p, 3)).astype(np.float32))
        x0 = x0.at[:, 1].set(0.01)
        nrm = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (p, 3))
        alb = jnp.full((p, 3), 0.7)
        mask = jnp.ones((p,), bool)

        def grad_of(cands):
            def loss(dp):
                sc = scene.replace(positions=scene.positions + dp)
                t = boundary.nee_boundary_term(
                    sc, restir.Lights(sc), sc.world_triangle_vertices(),
                    x0, nrm, alb, mask, candidates=cands)
                return jnp.sum(t)
            return np.asarray(jax.grad(loss)(
                jnp.zeros_like(scene.positions)))

        gd = grad_of(0)
        gp = grad_of(8)
        scale = np.abs(gd).max()
        assert scale > 1.0  # the term actually has gradient signal
        np.testing.assert_allclose(gp, gd, atol=1e-5 * scale)

    def test_forward_stays_zero(self):
        import numpy as np

        from sunray_tpu.render import boundary, restir
        from sunray_tpu.scene import cornell_box

        scene = boundary.with_edge_topology(cornell_box())
        x0 = jnp.asarray([[1.0, 0.01, 1.0]] * 8)
        nrm = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (8, 3))
        t = boundary.nee_boundary_term(
            scene, restir.Lights(scene), scene.world_triangle_vertices(),
            x0, nrm, jnp.full((8, 3), 0.7), jnp.ones((8,), bool),
            candidates=8)
        np.testing.assert_array_equal(np.asarray(t), 0.0)
