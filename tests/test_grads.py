"""Pixel-gradient correctness: AD vs central finite differences — the
BASELINE.md north-star check (camera, vertex, material params)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sunray_tpu.camera import Camera, camera_matrices
from sunray_tpu.config import RenderConfig
from sunray_tpu.render.pipeline import RenderState, render_frame
from sunray_tpu.scene import cornell_box

W, H = 32, 24

CFG = RenderConfig(
    width=W, height=H, lighting="nee", bounces=2, virtual_bounces=2,
    denoise_passes=0, enable_taa=False, differentiable=True,
    tonemap="none",
)


@pytest.fixture(scope="module")
def scene():
    return cornell_box()


def render_loss(scene, cam_pos=None):
    """Mean-luminance loss of one frame. cam_pos overrides the camera eye."""
    pos = cam_pos if cam_pos is not None else jnp.asarray([1.0, 1.0, 3.4])
    cam = Camera(position=pos, target=(1.0, 1.0, 0.0), fov_y=45.0)
    mats = camera_matrices(cam, W, H)
    st = RenderState.create(CFG)
    _, ldr, _ = render_frame(scene, CFG, st, mats)
    return jnp.mean(ldr)


def central_fd(f, x0, eps):
    x0 = np.asarray(x0, np.float64)
    g = np.zeros_like(x0)
    it = np.nditer(x0, flags=["multi_index"])
    for _ in it:
        idx = it.multi_index
        xp = x0.copy(); xp[idx] += eps
        xm = x0.copy(); xm[idx] -= eps
        g[idx] = (float(f(jnp.asarray(xp, jnp.float32)))
                  - float(f(jnp.asarray(xm, jnp.float32)))) / (2 * eps)
    return g


class TestMaterialGrads:
    def test_base_color_fd(self, scene):
        base = np.asarray(scene.materials.base_color)

        @jax.jit
        def loss(bc):
            sc = scene.replace(
                materials=scene.materials.replace(base_color=bc)
            )
            return render_loss(sc)

        g_ad = np.asarray(jax.jit(jax.grad(loss))(jnp.asarray(base)))
        assert np.isfinite(g_ad).all()

        # FD on the white material's red channel and green wall's green.
        for prim, chan in [(0, 0), (2, 1)]:
            def f1(v, prim=prim, chan=chan):
                b = base.copy()
                b[prim, chan] = float(v)
                return loss(jnp.asarray(b))
            eps = 1e-2
            fd = (float(f1(base[prim, chan] + eps))
                  - float(f1(base[prim, chan] - eps))) / (2 * eps)
            ad = g_ad[prim, chan]
            assert fd != 0.0
            np.testing.assert_allclose(ad, fd, rtol=0.15)

    def test_emission_strength_fd(self, scene):
        ef = np.asarray(scene.materials.emissive_factor)

        @jax.jit
        def loss(e):
            sc = scene.replace(
                materials=scene.materials.replace(emissive_factor=e),
                emissive_rgb=e[scene.emissive_prim, :3] * e[scene.emissive_prim, 3:4],
            )
            return render_loss(sc)

        g_ad = np.asarray(jax.grad(loss)(jnp.asarray(ef)))
        assert np.isfinite(g_ad).all()
        # d loss / d strength of the light material (prim 3, w component)
        eps = 0.1
        ep = ef.copy(); ep[3, 3] += eps
        em = ef.copy(); em[3, 3] -= eps
        fd = (float(loss(jnp.asarray(ep))) - float(loss(jnp.asarray(em)))) / (2 * eps)
        assert fd > 0.0  # brighter light -> brighter image
        np.testing.assert_allclose(g_ad[3, 3], fd, rtol=0.15)


class TestCameraGrads:
    def test_camera_position_fd(self, scene):
        @jax.jit
        def loss(pos):
            return render_loss(scene, cam_pos=pos)

        x0 = np.asarray([1.0, 1.0, 3.4], np.float32)
        g_ad = np.asarray(jax.jit(jax.grad(loss))(jnp.asarray(x0)))
        assert np.isfinite(g_ad).all()
        # AD carries *shading* gradients; FD along x/y at this resolution is
        # dominated by silhouette pixels crossing wall edges (visibility
        # discontinuities AD intentionally doesn't differentiate —
        # SURVEY.md section 7 M7). The z dolly direction is smooth: require
        # a tight match there.
        eps = 2e-3
        fd = central_fd(lambda p: loss(p), x0, eps)
        np.testing.assert_allclose(g_ad[2], fd[2], rtol=0.1)


class TestVertexGrads:
    def test_light_height_fd(self, scene):
        """Moving the light down increases floor irradiance — shading
        gradient through emissive triangle positions."""
        pos0 = np.asarray(scene.positions)
        light_verts = np.unique(
            np.asarray(scene.tri_vidx)[
                np.asarray(scene.emissive_prim)[0]
                == np.asarray(scene.inst_prim)[np.asarray(scene.tri_inst)]
            ]
        )

        @jax.jit
        def loss(dy):
            p = jnp.asarray(pos0).at[jnp.asarray(light_verts), 1].add(dy)
            em_v = scene.emissive_v.at[:, :, 1].add(dy)
            sc = scene.replace(positions=p, emissive_v=em_v)
            return render_loss(sc)

        g_ad = float(jax.grad(loss)(0.0))
        assert np.isfinite(g_ad)
        eps = 5e-3
        fd = (float(loss(eps)) - float(loss(-eps))) / (2 * eps)
        assert fd != 0.0
        np.testing.assert_allclose(g_ad, fd, rtol=0.3)


class TestOcclusionBoundaryEnvelope:
    """Measured FD failure envelope for secondary-bounce visibility
    (VERDICT r2 item 6): gradients flow through the differentiable
    hit-attribute recompute (shading terms) and, with edge_antialias,
    through PRIMARY silhouettes — but occlusion of a shadow ray is a
    step function with stop_gradient'd discrete inputs, so a shadow
    boundary sweeping across a receiver produces NO gradient.

    This test pins that gap with numbers (docs/PARITY.md table): a loss
    over floor pixels only (receiver of the boxes' shadows, the boxes
    themselves excluded from the mask) under a translation of the box
    vertices has AD == 0 exactly, while central FD sees the shadow move.

    Round 4: the boundary estimator EXISTS now (render/boundary.py,
    cfg.shadow_boundary_grads, default OFF) — this test keeps pinning
    the DEFAULT config's envelope, and
    TestOcclusionBoundaryMatched asserts the AD==FD flip side with the
    estimator enabled."""

    def test_shadow_boundary_has_no_ad_gradient(self, scene):
        pos0 = np.asarray(scene.positions)
        # Occluder verts = everything above the floor that isn't a wall or
        # the light: the two boxes (y in (0, 1.3), x/z strictly inside).
        interior = (
            (pos0[:, 1] > 1e-4) & (pos0[:, 1] < 1.3)
            & (pos0[:, 0] > 1e-3) & (pos0[:, 0] < 2.0 - 1e-3)
            & (pos0[:, 2] > 1e-3) & (pos0[:, 2] < 2.0 - 1e-3)
        )
        box_verts = np.nonzero(interior)[0]
        assert box_verts.size >= 24  # both boxes present

        # 48x36 (not the module's 32x24): the shadow edge must actually
        # cross floor pixel centers within +/-eps for FD to see it.
        w_l, h_l = 48, 36
        cfg_l = CFG.replace(width=w_l, height=h_l)
        cam = Camera(position=(1.0, 1.0, 3.4), target=(1.0, 1.0, 0.0),
                     fov_y=45.0)
        mats = camera_matrices(cam, w_l, h_l)

        def render(dx):
            p = jnp.asarray(pos0).at[jnp.asarray(box_verts), 0].add(dx)
            sc = scene.replace(positions=p)
            st = RenderState.create(cfg_l)
            _, ldr, aux = render_frame(sc, cfg_l, st, mats)
            return ldr, aux

        _, aux0 = jax.jit(lambda: render(0.0))()
        floor = np.asarray(aux0["normal"])[..., 1] > 0.9   # receiver only
        assert floor.sum() > 20
        mask = jnp.asarray(floor[..., None].astype(np.float32))

        def loss(dx):
            ldr, _ = render(dx)
            return jnp.sum(ldr * mask) / jnp.sum(mask)

        g_ad = float(jax.jit(jax.grad(loss))(0.0))
        lj = jax.jit(loss)
        eps = 2e-2
        fd = (float(lj(eps)) - float(lj(-eps))) / (2 * eps)
        # The measured envelope (2026-08-20, 48x36 CPU): FD moves (the
        # shadow sweeps the floor; +0.67 at eps=2e-2) while AD is zero to
        # float dust (-7e-15) — the boundary term is entirely absent for
        # secondary visibility.
        assert abs(fd) > 0.05, f"shadow FD signal too small: {fd}"
        assert abs(g_ad) < 1e-6 * abs(fd), (
            f"AD gradient through a shadow boundary appeared ({g_ad} vs "
            f"FD {fd}) — did a boundary estimator land? Update the PARITY "
            "envelope."
        )


class TestOcclusionBoundaryMatched:
    """Round 4: the warped-area-class estimator LANDED for first-bounce
    NEE (render/boundary.py, cfg.shadow_boundary_grads) — this is the
    envelope test's flip side: with the boundary term on, AD must MATCH
    central FD on an occluder-translation case (VERDICT r3 item 3).

    Scene design notes (each guards a measured failure of a naive test):
      - the occluder FLOATS above the floor so its shadow is away from
        its own base (the classic Cornell boxes' shadows hug the base,
        where primary-silhouette pixel flips dominate FD);
      - the loss reads the RAW radiance (aux["raw"]), which is linear in
        the estimator: any nonlinear post-transform (even gamma) of a
        discrete 1-spp visibility sample biases pathwise AD vs FD of
        the expectation — measured ratio 0.27 through gamma vs 0.98 raw;
      - FD averages K=12 independently-seeded frames: a single frame's
        central FD is per-pixel visibility-flip noise;
      - the floor mask is eroded 3 px so the box's screen silhouette
        (whose gradient needs edge_antialias, not this estimator) can't
        leak in at the tested eps.

    Measured 2026-08-20 (CPU, 64x48, K=12): AD -0.9252 vs FD -0.9447
    (eps 2e-2) / -0.9363 (eps 1e-2) — ratios 0.979 / 0.988."""

    @pytest.mark.slow
    def test_shadow_boundary_ad_matches_fd(self):
        from scipy import ndimage

        from sunray_tpu.render import boundary
        from sunray_tpu.scene.procedural import _MeshBuilder

        def floating_scene():
            b = _MeshBuilder()
            white = b.add_material(base_color=(0.73, 0.73, 0.73, 1.0),
                                   roughness=1.0)
            light = b.add_material(base_color=(1.0, 1.0, 1.0, 1.0),
                                   emissive_factor=(1.0, 1.0, 1.0, 15.0),
                                   roughness=1.0)
            s = 2.0
            b.add_quad((0, 0, 0), (0, 0, s), (s, 0, s), (s, 0, 0), white)
            b.add_quad((0, 0, 0), (s, 0, 0), (s, s, 0), (0, s, 0), white)
            b.add_quad((0, s, 0), (s, s, 0), (s, s, s), (0, s, s), white)
            ly = s - 0.01
            b.add_quad((0.95, ly, 0.65), (1.55, ly, 0.65),
                       (1.55, ly, 1.35), (0.95, ly, 1.35), light)
            b.add_box((0.9, 1.2, 1.0), (0.5, 0.25, 0.5), white)
            return b.build()

        scene0 = floating_scene()
        pos0 = np.asarray(scene0.positions)
        box_verts = np.nonzero((pos0[:, 1] > 1.0) & (pos0[:, 1] < 1.4))[0]
        assert box_verts.size == 24
        scene = boundary.with_edge_topology(scene0)
        w_l, h_l = 64, 48
        cam = Camera(position=(1.0, 1.7, 3.3), target=(1.0, 0.2, 0.7),
                     fov_y=45.0)
        mats = camera_matrices(cam, w_l, h_l)
        cfg = RenderConfig(
            width=w_l, height=h_l, lighting="nee", bounces=2,
            virtual_bounces=2, denoise_passes=0, enable_taa=False,
            differentiable=True, tonemap="none",
            shadow_boundary_grads=True,
        )
        k_frames = 12

        def render_k(dx):
            p = jnp.asarray(pos0).at[jnp.asarray(box_verts), 0].add(dx)
            sc = scene.replace(positions=p)
            acc = 0.0
            st = RenderState.create(cfg)
            aux = None
            for _ in range(k_frames):
                st, _, aux = render_frame(sc, cfg, st, mats)
                acc = acc + aux["raw"]
            return acc / k_frames, aux

        _, aux0 = jax.jit(lambda: render_k(0.0))()
        floor = np.asarray(aux0["normal"])[..., 1] > 0.9
        er = ndimage.binary_erosion(floor, iterations=3)
        assert er.sum() > 300
        mask = jnp.asarray(er[..., None].astype(np.float32))

        def loss(dx):
            img, _ = render_k(dx)
            return jnp.sum(img * mask) / jnp.sum(mask)

        g_ad = float(jax.jit(jax.grad(loss))(0.0))
        lj = jax.jit(loss)
        eps = 2e-2
        fd = (float(lj(eps)) - float(lj(-eps))) / (2 * eps)
        assert abs(fd) > 0.3, f"shadow FD signal too small: {fd}"
        np.testing.assert_allclose(g_ad, fd, rtol=0.20)


class TestRestirBoundaryMatched:
    """Shadow-boundary gradients through the ReSTIR frame (round 5): the
    zero-forward silhouette term injected at the frozen first-rough hits
    (render/pathtrace._spatial_reuse call site) must track central FD of
    the seed-averaged raw radiance on the occluder-translation case —
    same scene/mask methodology as TestOcclusionBoundaryMatched, with
    the pruned candidate path (K=8) active.

    Measured 2026-08-21 (CPU, 64x48, 16 frames/seed): AD -0.9961 vs FD
    -1.0726 (eps 1e-2) — ratio 0.929; the residual is FD eps-bias plus
    reservoir noise (the eps 2e-2 ratio is 0.847 and improves toward
    smaller eps)."""

    @pytest.mark.slow
    def test_restir_boundary_ad_matches_fd(self):
        from scipy import ndimage

        from sunray_tpu.render import boundary
        from sunray_tpu.scene.procedural import _MeshBuilder

        def floating_scene():
            b = _MeshBuilder()
            white = b.add_material(base_color=(0.73, 0.73, 0.73, 1.0),
                                   roughness=1.0)
            light = b.add_material(base_color=(1.0, 1.0, 1.0, 1.0),
                                   emissive_factor=(1.0, 1.0, 1.0, 15.0),
                                   roughness=1.0)
            s = 2.0
            b.add_quad((0, 0, 0), (0, 0, s), (s, 0, s), (s, 0, 0), white)
            b.add_quad((0, 0, 0), (s, 0, 0), (s, s, 0), (0, s, 0), white)
            b.add_quad((0, s, 0), (s, s, 0), (s, s, s), (0, s, s), white)
            ly = s - 0.01
            b.add_quad((0.95, ly, 0.65), (1.55, ly, 0.65),
                       (1.55, ly, 1.35), (0.95, ly, 1.35), light)
            b.add_box((0.9, 1.2, 1.0), (0.5, 0.25, 0.5), white)
            return b.build()

        scene0 = floating_scene()
        pos0 = np.asarray(scene0.positions)
        box_verts = np.nonzero((pos0[:, 1] > 1.0) & (pos0[:, 1] < 1.4))[0]
        scene = boundary.with_edge_topology(scene0)
        w_l, h_l = 64, 48
        cam = Camera(position=(1.0, 1.7, 3.3), target=(1.0, 0.2, 0.7),
                     fov_y=45.0)
        mats = camera_matrices(cam, w_l, h_l)
        cfg = RenderConfig(
            width=w_l, height=h_l, lighting="restir", bounces=2,
            virtual_bounces=2, ris_candidates=8, di_spatial_samples=2,
            gi_spatial_samples=1, denoise_passes=0, enable_taa=False,
            differentiable=True, tonemap="none",
            shadow_boundary_grads=True, shadow_boundary_candidates=8,
        )
        k_frames = 16

        def render_k(dx):
            # lax.scan over frames: the 16x-unrolled grad program took
            # ~45 min of CPU XLA compile; one scanned frame body
            # compiles in minutes with identical numerics (the frame
            # seeds from state.frame_count, which the scan carries).
            p = jnp.asarray(pos0).at[jnp.asarray(box_verts), 0].add(dx)
            sc = scene.replace(positions=p)
            st0 = RenderState.create(cfg)

            def body(st, _):
                st, _, aux = render_frame(sc, cfg, st, mats)
                return st, aux["raw"]

            _, raws = jax.lax.scan(body, st0, None, length=k_frames)
            _, _, aux = render_frame(sc, cfg, st0, mats)
            return jnp.mean(raws, axis=0), aux

        _, aux0 = jax.jit(lambda: render_k(0.0))()
        floor = np.asarray(aux0["normal"])[..., 1] > 0.9
        er = ndimage.binary_erosion(floor, iterations=3)
        assert er.sum() > 300
        mask = jnp.asarray(er[..., None].astype(np.float32))

        def loss(dx):
            img, _ = render_k(dx)
            return jnp.sum(img * mask) / jnp.sum(mask)

        g_ad = float(jax.jit(jax.grad(loss))(0.0))
        lj = jax.jit(loss)
        eps = 1e-2
        fd = (float(lj(eps)) - float(lj(-eps))) / (2 * eps)
        assert abs(fd) > 0.3, f"shadow FD signal too small: {fd}"
        np.testing.assert_allclose(g_ad, fd, rtol=0.25)
