"""egui-class 2D painter (render/overlay2d.py): rasterizer coverage vs a
numpy point-in-triangle reference, barycentric interpolation, winding
independence, clip rects, alpha blending order, textured glyph quads, and
jit-ability of the paint path."""

import numpy as np
import jax
import jax.numpy as jnp

from sunray_tpu.render import overlay2d as o2


def _np_coverage(h, w, xy, tris):
    """Reference coverage: pixel centers inside any triangle."""
    cov = np.zeros((h, w), bool)
    xs = np.arange(w) + 0.5
    ys = np.arange(h) + 0.5
    px, py = np.meshgrid(xs, ys)
    for t in tris:
        (x0, y0), (x1, y1), (x2, y2) = xy[t[0]], xy[t[1]], xy[t[2]]
        area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0)
        if abs(area) < 1e-8:
            continue
        s = -1.0 if area < 0 else 1.0
        e0 = ((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)) * s
        e1 = ((x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)) * s
        e2 = ((x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)) * s
        cov |= (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
    return cov


def test_coverage_matches_reference_both_windings():
    h, w = 24, 32
    xy = np.asarray(
        [(2, 2), (28, 4), (12, 20), (30, 22), (16, 8), (4, 18)], np.float32
    )
    tris = np.asarray([(0, 1, 2), (3, 5, 4)], np.int32)  # mixed windings
    mesh = o2.Mesh2D(
        xy=jnp.asarray(xy), uv=jnp.zeros((6, 2)),
        rgba=jnp.ones((6, 4)), tris=jnp.asarray(tris),
    )
    _, a = o2.rasterize_mesh(h, w, mesh)
    got = np.asarray(a) > 0.5
    want = _np_coverage(h, w, xy, tris)
    assert (got == want).mean() > 0.98  # edge-rule ties only


def test_barycentric_color_interpolation():
    h, w = 16, 16
    xy = np.asarray([(0, 0), (16, 0), (0, 16)], np.float32)
    rgba = np.asarray(
        [(1, 0, 0, 1), (0, 1, 0, 1), (0, 0, 1, 1)], np.float32
    )
    mesh = o2.Mesh2D(
        xy=jnp.asarray(xy), uv=jnp.zeros((3, 2)),
        rgba=jnp.asarray(rgba), tris=jnp.asarray([(0, 1, 2)], np.int32),
    )
    rgb, a = o2.rasterize_mesh(h, w, mesh)
    rgb = np.asarray(rgb)
    # Near the first vertex the color is mostly red, etc.
    assert rgb[1, 1, 0] > 0.7 and rgb[1, 1, 1] < 0.2
    assert rgb[1, 12, 1] > 0.6
    assert rgb[12, 1, 2] > 0.6
    # Channels sum to ~1 inside (barycentric partition of unity).
    inside = np.asarray(a) > 0.5
    sums = rgb.sum(-1)[inside]
    np.testing.assert_allclose(sums, 1.0, atol=1e-4)


def test_last_triangle_wins_and_blend_order():
    h, w = 8, 8
    img = jnp.zeros((h, w, 3))
    red = o2.tess_rect(0, 0, 8, 8, (1, 0, 0, 1))
    green = o2.tess_rect(2, 2, 6, 6, (0, 1, 0, 1))
    out = np.asarray(o2.paint_meshes(img, [red, green]))
    assert out[1, 1, 0] > 0.9           # red outside
    assert out[4, 4, 1] > 0.9           # green painted after red
    # Half-alpha blend on top of black is half the color.
    half = o2.tess_rect(0, 0, 8, 8, (1.0, 1.0, 1.0, 0.5))
    out2 = np.asarray(o2.paint_meshes(jnp.zeros((h, w, 3)), [half]))
    np.testing.assert_allclose(out2[4, 4], 0.5, atol=1e-5)


def test_clip_rect_scissors():
    h, w = 12, 12
    mesh = o2.tess_rect(0, 0, 12, 12, (1, 1, 1, 1), clip=(4, 4, 8, 8))
    _, a = o2.rasterize_mesh(h, w, mesh)
    a = np.asarray(a)
    assert a[6, 6] > 0.9
    assert a[1, 1] == 0.0 and a[10, 10] == 0.0


def test_rounded_rect_trims_corners():
    h, w = 20, 20
    sharp = o2.tess_rect(2, 2, 18, 18, (1, 1, 1, 1))
    round_ = o2.tess_rect(2, 2, 18, 18, (1, 1, 1, 1), rounding=6.0)
    _, a_s = o2.rasterize_mesh(h, w, sharp)
    _, a_r = o2.rasterize_mesh(h, w, round_)
    a_s, a_r = np.asarray(a_s), np.asarray(a_r)
    assert a_s[3, 3] > 0.9 and a_r[3, 3] == 0.0     # corner trimmed
    assert a_r[10, 3] > 0.9 and a_r[10, 10] > 0.9   # edges + center kept


def test_text_renders_glyphs():
    h, w = 16, 80
    mesh = o2.tess_text("FPS 60.0", 2, 4, (1, 1, 1, 1))
    rgb, a = o2.rasterize_mesh(h, w, mesh)
    a = np.asarray(a)
    assert a.max() > 0.5                 # glyph texels present
    assert (a > 0.5).sum() > 40          # several lit pixels
    assert a[:, 60:].sum() < a[:, :60].sum()  # text starts on the left


def test_polyline_and_plot():
    h, w = 32, 64
    meshes = o2.plot_lines(
        [16.0, 17.0, 15.5, 30.0, 16.2], 2, 2, 62, 30
    )
    out = np.asarray(o2.paint_meshes(jnp.zeros((h, w, 3)), meshes))
    assert out.max() > 0.1
    assert np.isfinite(out).all()


def test_paint_is_jittable():
    h, w = 16, 24
    mesh = o2.tess_rect(2, 2, 20, 12, (0.2, 0.4, 0.9, 0.8), rounding=3.0)
    text = o2.tess_text("OK", 4, 4, (1, 1, 1, 1))

    @jax.jit
    def paint(img):
        return o2.paint_meshes(img, [mesh, text])

    out = np.asarray(paint(jnp.zeros((h, w, 3))))
    assert np.isfinite(out).all() and out.max() > 0.1
