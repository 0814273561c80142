"""Primary-silhouette edge AA (render/antialias.py): forward behavior,
projection convention, and the recovered visibility gradients (FD vs AD
across silhouette motion — the term shading-only gradients miss)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sunray_tpu.camera import Camera, camera_matrices, generate_rays
from sunray_tpu.config import RenderConfig
from sunray_tpu.render.pipeline import RenderState, render_frame
from sunray_tpu.scene import cornell_box

W, H = 32, 24
CAM = Camera(position=(1.0, 1.0, 3.4), target=(1.0, 1.0, 0.0), fov_y=45.0)


def make_cfg(**kw):
    base = dict(
        width=W, height=H, lighting="nee", bounces=2, virtual_bounces=2,
        denoise_passes=0, enable_taa=False, differentiable=True,
        tonemap="none",
    )
    base.update(kw)
    return RenderConfig(**base)


@pytest.fixture(scope="module")
def scene():
    return cornell_box()


def test_projection_matches_raygen(scene):
    """A pixel's primary hit point projects back to that pixel's center."""
    from sunray_tpu.render.antialias import _project_px
    from sunray_tpu.render.trace import make_tracer, trace_closest

    cfg = make_cfg()
    mats = camera_matrices(CAM, W, H)
    orig, dirs = generate_rays(mats, W, H)
    tracer = make_tracer(scene, cfg)
    hit = trace_closest(tracer, orig.reshape(-1, 3), dirs.reshape(-1, 3))
    pos = orig.reshape(-1, 3) + dirs.reshape(-1, 3) * hit.t[:, None]
    sx, sy, behind = _project_px(
        mats["view_proj"], pos[:, 0], pos[:, 1], pos[:, 2], W, H
    )
    xs = (jnp.arange(W) + 0.5)[None, :].repeat(H, 0).reshape(-1)
    ys = (jnp.arange(H) + 0.5)[:, None].repeat(W, 1).reshape(-1)
    m = np.asarray(hit.hit)
    assert not np.asarray(behind)[m].any()
    np.testing.assert_allclose(np.asarray(sx)[m], np.asarray(xs)[m],
                               atol=5e-2)
    np.testing.assert_allclose(np.asarray(sy)[m], np.asarray(ys)[m],
                               atol=5e-2)


def _render(scene, cfg, cam_pos=None):
    pos = cam_pos if cam_pos is not None else jnp.asarray(CAM.position)
    cam = Camera(position=pos, target=CAM.target, fov_y=CAM.fov_y)
    mats = camera_matrices(cam, W, H)
    st = RenderState.create(cfg)
    _, ldr, _ = render_frame(scene, cfg, st, mats)
    return ldr


def test_forward_only_touches_silhouettes(scene):
    a = np.asarray(jax.jit(lambda: _render(scene, make_cfg()))())
    b = np.asarray(
        jax.jit(lambda: _render(scene, make_cfg(edge_antialias=True)))()
    )
    assert np.isfinite(b).all()
    changed = np.abs(a - b).max(axis=-1) > 1e-6
    # AA must act somewhere (the box silhouettes) but leave most of the
    # image bit-identical (interior pixels are untouched by construction).
    assert 0 < changed.mean() < 0.35


def _occluder_scene():
    """Noise-free silhouette fixture: two parallel EMISSIVE quads (zero
    albedo, so the image is piecewise-constant emission — no sampling
    noise), bright wall behind a dim occluder whose left edge is
    off-screen. Moving the occluder +x covers more bright wall: the loss
    derivative is almost purely the silhouette (boundary) term."""
    from sunray_tpu.scene.manager import SceneManager
    from sunray_tpu.scene.types import translate

    def quad(w_, h_):
        p = np.asarray(
            [[-w_ / 2, -h_ / 2, 0], [w_ / 2, -h_ / 2, 0],
             [w_ / 2, h_ / 2, 0], [-w_ / 2, h_ / 2, 0]], np.float32)
        n = np.tile(np.asarray([[0, 0, 1.0]], np.float32), (4, 1))
        t = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
        return p, n, t

    mgr = SceneManager()
    wp, wn, wt = quad(8.0, 6.0)
    op, on, ot = quad(2.4, 4.0)
    mgr.add_mesh("wall", wp, wn, wt,
                 {"base_color": (0, 0, 0, 1),
                  "emissive_factor": (1.0, 1.0, 1.0, 0.8)})
    mgr.add_mesh("occ", op, on, ot,
                 {"base_color": (0, 0, 0, 1),
                  "emissive_factor": (1.0, 1.0, 1.0, 0.15)})
    sc = mgr.build([("wall", translate(0, 0, -1.0)),
                    ("occ", translate(-1.1, 0, 1.0))], pad_to_capacity=False)
    vidx = np.asarray(sc.tri_vidx)[np.asarray(sc.tri_inst) == 1].ravel()
    return sc, jnp.asarray(np.unique(vidx))


def test_occluder_silhouette_gradient():
    """d(loss)/d(occluder x): zero without edge AA (no boundary term at
    all), and with edge AA the AD gradient matches the true boundary
    slope (regression fit over a sweep) within 2.5x."""
    sc0, vsel = _occluder_scene()
    cam = Camera(position=(0.0, 0.0, 4.0), target=(0.0, 0.0, 0.0),
                 fov_y=45.0)
    mats = camera_matrices(cam, W, H)

    def loss(dx, cfg):
        sc = sc0.replace(
            positions=jnp.asarray(sc0.positions).at[vsel, 0].add(dx)
        )
        st = RenderState.create(cfg)
        _, ldr, _ = render_frame(sc, cfg, st, mats)
        return jnp.mean(ldr)

    cfg_no = make_cfg()
    g_no = float(jax.grad(lambda d: loss(d, cfg_no))(0.0))
    assert abs(g_no) < 1e-6   # visibility-only dependence: AD sees nothing

    cfg_aa = make_cfg(edge_antialias=True)
    g_aa = float(jax.grad(lambda d: loss(d, cfg_aa))(0.0))
    jl = jax.jit(lambda d: loss(d, cfg_aa))
    xs = np.linspace(-0.08, 0.08, 9)
    vs = [float(jl(float(d))) for d in xs]
    slope = np.polyfit(xs, vs, 1)[0]
    # The reference (no-AA) loss is a descending staircase; AA must turn
    # it into a descending curve whose AD tracks the average slope.
    assert slope < -0.05
    assert g_aa < 0
    assert 0.4 < g_aa / slope < 2.5


def test_camera_x_silhouette_gradient():
    """Same fixture, camera translation: parallax moves the silhouette,
    no-AA AD misses it entirely (only smooth shading terms, here zero);
    AA AD tracks the staircase's average slope."""
    sc0, _ = _occluder_scene()

    def loss(px, cfg):
        cam = Camera(position=(px, 0.0, 4.0), target=(0.0, 0.0, 0.0),
                     fov_y=45.0)
        mats = camera_matrices(cam, W, H)
        st = RenderState.create(cfg)
        _, ldr, _ = render_frame(sc0, cfg, st, mats)
        return jnp.mean(ldr)

    cfg_aa = make_cfg(edge_antialias=True)
    g_aa = float(jax.grad(lambda p: loss(p, cfg_aa))(0.0))
    jl = jax.jit(lambda p: loss(p, cfg_aa))
    xs = np.linspace(-0.08, 0.08, 9)
    vs = [float(jl(float(p))) for p in xs]
    slope = np.polyfit(xs, vs, 1)[0]
    assert abs(slope) > 0.01
    assert np.sign(g_aa) == np.sign(slope)
    assert 0.3 < g_aa / slope < 3.0
