"""End-to-end frame pipeline tests on tiny images (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sunray_tpu.camera import Camera, camera_matrices
from sunray_tpu.config import RenderConfig
from sunray_tpu.render.pipeline import RenderState, render_frame
from sunray_tpu.scene import cornell_box

W, H = 64, 48

CAM = Camera(position=(1.0, 1.0, 3.4), target=(1.0, 1.0, 0.0), fov_y=45.0)


def small_cfg(**kw):
    base = dict(
        width=W, height=H, bounces=4, virtual_bounces=4, ris_candidates=4,
        di_spatial_samples=2, gi_spatial_samples=1, denoise_passes=1,
        warmup_frames=2, lighting="restir",
    )
    base.update(kw)
    return RenderConfig(**base)


@pytest.fixture(scope="module")
def scene():
    return cornell_box()


def run_frames(scene, cfg, n=3):
    mats = camera_matrices(CAM, cfg.width, cfg.height)
    state = RenderState.create(cfg)
    step = jax.jit(lambda st: render_frame(scene, cfg, st, mats))
    ldr = None
    for _ in range(n):
        state, ldr, aux = step(state)
    return state, np.asarray(ldr), jax.tree_util.tree_map(np.asarray, aux)


class TestNeeMode:
    def test_renders_finite_nonblack(self, scene):
        cfg = small_cfg(lighting="nee")
        state, ldr, aux = run_frames(scene, cfg)
        assert ldr.shape == (H, W, 3)
        assert np.isfinite(ldr).all()
        assert 0.0 <= ldr.min() and ldr.max() <= 1.0
        # The lit Cornell interior must not be black.
        assert ldr.mean() > 0.02
        # Left wall red, right wall green: compare column tints in the
        # interior rows.
        left = ldr[H // 2, 4:10].mean(axis=0)
        right = ldr[H // 2, -10:-4].mean(axis=0)
        assert left[0] > left[1], f"left wall should be red-ish, got {left}"
        assert right[1] > right[0], f"right wall should be green-ish, got {right}"

    def test_depth_and_motion(self, scene):
        cfg = small_cfg(lighting="nee")
        _, _, aux = run_frames(scene, cfg)
        depth = aux["depth"]
        # Static camera: motion should be ~0 for on-screen pixels after
        # frame 0.
        inside = depth < 9000.0
        assert inside.mean() > 0.9  # nearly all pixels see the box
        motion = aux["motion"]
        assert np.abs(motion[inside]).max() < 1e-3

    def test_frame_count_advances(self, scene):
        cfg = small_cfg(lighting="nee")
        state, _, _ = run_frames(scene, cfg, n=3)
        assert int(state.frame_count) == 3


class TestRestirMode:
    def test_renders_finite_nonblack(self, scene):
        cfg = small_cfg(lighting="restir")
        state, ldr, _ = run_frames(scene, cfg, n=4)
        assert np.isfinite(ldr).all()
        assert ldr.mean() > 0.02
        # Reservoirs should be populated: some lanes with M > 0 and W > 0.
        m = np.asarray(state.res_di.M)
        w = np.asarray(state.res_di.W)
        assert (m > 0).mean() > 0.5
        assert (w > 0).mean() > 0.05

    def test_brighter_than_dark_scene(self, scene):
        # Same scene with emission off should be darker.
        cfg = small_cfg(lighting="restir")
        _, lit, _ = run_frames(scene, cfg, n=4)
        dark_scene = scene.replace(
            emissive_rgb=jnp.zeros_like(scene.emissive_rgb),
            materials=scene.materials.replace(
                emissive_factor=jnp.zeros_like(scene.materials.emissive_factor)
            ),
        )
        _, dark, _ = run_frames(dark_scene, cfg, n=4)
        assert lit.mean() > dark.mean() + 0.01


class TestTemporalState:
    def test_taa_converges(self, scene):
        cfg = small_cfg(lighting="nee", denoise_passes=0)
        mats = camera_matrices(CAM, cfg.width, cfg.height)
        state = RenderState.create(cfg)
        step = jax.jit(lambda st: render_frame(scene, cfg, st, mats))
        frames = []
        for _ in range(8):
            state, ldr, _ = step(state)
            frames.append(np.asarray(ldr))
        # Later frame-to-frame deltas should be smaller than early ones
        # (temporal accumulation smoothing noise).
        d_early = np.abs(frames[3] - frames[2]).mean()
        d_late = np.abs(frames[7] - frames[6]).mean()
        assert d_late < d_early * 1.5

    def test_reset_history(self, scene):
        cfg = small_cfg()
        state = RenderState.create(cfg)
        assert int(state.frame_count) == 0
        assert float(jnp.abs(state.accum).max()) == 0.0


class TestPhysics:
    def test_furnace(self):
        """Furnace test: closed enclosure with emissive=e, albedo=a walls.
        Path-traced radiance should converge to e * sum a^k = e(1-a^B)/(1-a)
        (BRDF mode picks up emission each bounce; geometry cancels)."""
        import numpy as np
        from sunray_tpu.scene.procedural import _MeshBuilder

        e, a = 0.4, 0.6
        b = _MeshBuilder()
        m = b.add_material(
            base_color=(a, a, a, 1.0), roughness=1.0,
            emissive_factor=(1.0, 1.0, 1.0, e),
        )
        s = 2.0
        b.add_quad((0, 0, 0), (0, 0, s), (s, 0, s), (s, 0, 0), m)
        b.add_quad((0, s, 0), (s, s, 0), (s, s, s), (0, s, s), m)
        b.add_quad((0, 0, 0), (s, 0, 0), (s, s, 0), (0, s, 0), m)
        b.add_quad((0, 0, s), (0, s, s), (s, s, s), (s, 0, s), m)
        b.add_quad((0, 0, 0), (0, s, 0), (0, s, s), (0, 0, s), m)
        b.add_quad((s, 0, 0), (s, 0, s), (s, s, s), (s, s, 0), m)
        furnace = b.build()

        bounces = 8
        cfg = RenderConfig(
            width=32, height=24, bounces=bounces, virtual_bounces=1,
            lighting="brdf", denoise_passes=0, enable_taa=False,
            tonemap="none", gamma=1.0, russian_roulette_start=bounces + 1,
        )
        cam = Camera(position=(1.0, 1.0, 1.0), target=(1.9, 1.0, 1.0),
                     fov_y=60.0)
        mats_cam = camera_matrices(cam, cfg.width, cfg.height)
        state = RenderState.create(cfg)
        step = jax.jit(lambda st: render_frame(furnace, cfg, st, mats_cam))
        acc = 0.0
        n = 24
        for _ in range(n):
            state, _, aux = step(state)
            acc = acc + np.asarray(aux["raw"])
        mean = float((acc / n).mean())
        expected = e * (1 - a ** bounces) / (1 - a)
        np.testing.assert_allclose(mean, expected, rtol=0.03)


class TestResize:
    def test_resize_resets_state(self):
        from sunray_tpu.render.renderer import Renderer

        scene = cornell_box()
        r = Renderer(small_cfg(lighting="nee"), scene)
        img1 = r.render(CAM)
        assert img1.shape == (H, W, 3)
        assert int(r.state.frame_count) == 1
        r.resize(32, 24)
        assert int(r.state.frame_count) == 0  # lib.rs:639 reset semantics
        img2 = r.render(CAM)
        assert img2.shape == (24, 32, 3)


class TestMovingCamera:
    def test_reprojection_under_motion(self):
        """Temporal reuse + TAA with a translating camera: motion vectors
        must be nonzero, history reprojection must stay finite and sane."""
        import numpy as np

        cfg = small_cfg(lighting="restir")
        scene = cornell_box()
        state = RenderState.create(cfg)
        imgs = []
        for i in range(5):
            cam = Camera(
                position=(1.0 + 0.05 * i, 1.0, 3.4 - 0.05 * i),
                target=(1.0, 1.0, 0.0), fov_y=45.0,
            )
            mats = camera_matrices(cam, cfg.width, cfg.height)
            state, ldr, aux = jax.jit(
                lambda st, m: render_frame(scene, cfg, st, m)
            )(state, mats)
            imgs.append(np.asarray(ldr))
            if i >= 2:
                motion = np.asarray(aux["motion"])
                inside = np.asarray(aux["depth"]) < 9000.0
                # camera moved -> nonzero reprojection offsets
                assert np.abs(motion[inside]).max() > 1e-4
        for img in imgs:
            assert np.isfinite(img).all()
            assert img.mean() > 0.02


class TestPerPixelSpatialTaps:
    def test_perpixel_matches_shapes_and_stays_finite(self):
        """spatial_taps='perpixel' (the reference's exact per-pixel disc
        draws, ray_gen_final.slang:164-167) through the full frame; the
        neighbor reads run through the banded packed gather on TPU and the
        plain gather here on CPU."""
        import numpy as np

        cfg = small_cfg(lighting="restir", spatial_taps="perpixel")
        scene = cornell_box()
        mats = camera_matrices(CAM, cfg.width, cfg.height)
        state = RenderState.create(cfg)
        step = jax.jit(lambda st: render_frame(scene, cfg, st, mats))
        for _ in range(3):
            state, ldr, aux = step(state)
        img = np.asarray(ldr)
        assert img.shape == (H, W, 3)
        assert np.isfinite(img).all()
        assert img.mean() > 0.02

    def test_perpixel_banded_matches_plain_gather(self):
        """Forcing the banded path (as on TPU) must not change perpixel
        spatial reuse: the disc radius fits inside the halo, so every
        in-bounds neighbor is in-band."""
        import numpy as np
        from unittest import mock
        import sunray_tpu.ops.banded as banded_mod

        cfg = small_cfg(lighting="restir", spatial_taps="perpixel",
                        history_gather_band=4, history_gather_halo=4)
        scene = cornell_box()

        mats = camera_matrices(CAM, cfg.width, cfg.height)

        def run():
            state = RenderState.create(cfg)
            step = jax.jit(lambda st: render_frame(scene, cfg, st, mats))
            for _ in range(3):
                state, ldr, _ = step(state)
            return np.asarray(ldr)

        plain = run()
        orig = banded_mod.banded_row_gather
        with mock.patch.object(
            banded_mod, "banded_row_gather",
            lambda *a, **k: orig(*a, **{**k, "force": True}),
        ):
            # restir/postprocess imported the symbol directly; patch there too
            import sunray_tpu.render.restir as restir_mod
            import sunray_tpu.render.postprocess as post_mod
            with mock.patch.object(
                restir_mod, "banded_row_gather",
                lambda *a, **k: orig(*a, **{**k, "force": True}),
            ), mock.patch.object(
                post_mod, "banded_row_gather",
                lambda *a, **k: orig(*a, **{**k, "force": True}),
            ):
                forced = run()
        np.testing.assert_allclose(forced, plain, rtol=2e-5, atol=2e-6)


class TestBatchedSpatialTaps:
    """The batched shared-tap DI spatial reuse vs the sequential
    shared-tap merge loop (SUNRAY_TPU_SEQ_TAPS=1 oracle).

    Exact-equality is unattainable across the two program shapes: XLA's
    codegen may contract a*b+c to fma differently per fusion context, and
    a last-ulp p_hat difference can flip a reservoir take decision
    (u < w/w_sum) into a discretely different (but equally valid) sample.
    The test therefore bounds: almost all pixels at float-noise level, a
    tiny allowance for amplified take flips, and no drift in the mean."""

    def test_frame_matches_sequential_oracle(self):
        import os

        import jax

        from sunray_tpu.camera import Camera, camera_matrices
        from sunray_tpu.config import RenderConfig
        from sunray_tpu.render.pipeline import RenderState, render_frame
        from sunray_tpu.scene import cornell_box

        cfg = RenderConfig(width=96, height=64, lighting="restir",
                           di_spatial_samples=5)
        scene = cornell_box()
        cam = Camera(position=(1.0, 1.0, 3.4), target=(1.0, 1.0, 0.0),
                     fov_y=45.0)
        mats = camera_matrices(cam, cfg.width, cfg.height)

        outs = {}
        for flag in ("0", "1"):
            os.environ["SUNRAY_TPU_SEQ_TAPS"] = flag
            try:
                state = RenderState.create(cfg)
                step = jax.jit(
                    lambda st, _f=flag: render_frame(scene, cfg, st, mats)
                )
                ldr = None
                for _ in range(4):
                    state, ldr, aux = step(state)
                outs[flag] = (np.asarray(ldr), np.asarray(aux["raw"]))
            finally:
                os.environ.pop("SUNRAY_TPU_SEQ_TAPS", None)
        for a, b in zip(outs["0"], outs["1"]):
            d = np.abs(a - b)
            noise_level = (d <= 1e-5).mean()
            assert noise_level > 0.995, (
                f"{(1 - noise_level) * 100:.2f}% of pixels beyond float "
                f"noise (take-flip allowance is 0.5%)"
            )
            assert abs(float(a.mean()) - float(b.mean())) < 1e-4
