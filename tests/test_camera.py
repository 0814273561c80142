"""Camera model tests against hand-computed nalgebra semantics
(src/camera.rs:33-63) and ray-gen geometry (shaders/ray_gen_ris.slang:44-53)."""

import numpy as np
import jax.numpy as jnp

from sunray_tpu.camera import (
    Camera,
    camera_matrices,
    generate_rays,
    look_at_rh,
    perspective_gl,
    project_to_prev_uv,
)


class TestViewMatrix:
    def test_look_at_identityish(self):
        # Camera at origin+z looking at origin: view maps world +z to camera +z
        # (camera looks down -z), i.e. view == identity with z-flip handled by
        # the look direction.
        v = np.asarray(look_at_rh((0, 0, 1), (0, 0, 0), (0, 1, 0)))
        # eye transforms to origin
        np.testing.assert_allclose(v @ np.array([0, 0, 1, 1.0]), [0, 0, 0, 1], atol=1e-6)
        # target (1 unit ahead) lands on -z
        np.testing.assert_allclose(v @ np.array([0, 0, 0, 1.0]), [0, 0, -1, 1], atol=1e-6)

    def test_rigid_inverse(self):
        m = camera_matrices(
            Camera(position=(13.0, 30.0, 25.0), target=(0.0, 13.0, 0.0), fov_y=45.0),
            1600, 1200,
        )
        vi = np.asarray(m["view_inverse"])
        # view_inverse @ origin == eye (ray_gen origin rule)
        np.testing.assert_allclose(vi @ np.array([0, 0, 0, 1.0]), [13, 30, 25, 1], atol=1e-4)

    def test_perspective_matches_gl_convention(self):
        p = np.asarray(perspective_gl(4.0 / 3.0, np.deg2rad(45.0), 0.1, 100.0))
        f = 1.0 / np.tan(np.deg2rad(45.0) / 2)
        np.testing.assert_allclose(p[0, 0], f / (4.0 / 3.0), rtol=1e-6)
        np.testing.assert_allclose(p[1, 1], f, rtol=1e-6)
        np.testing.assert_allclose(p[2, 2], (100.0 + 0.1) / (0.1 - 100.0), rtol=1e-6)
        np.testing.assert_allclose(p[2, 3], 2 * 100.0 * 0.1 / (0.1 - 100.0), rtol=1e-6)
        assert p[3, 2] == -1.0


class TestRayGen:
    def test_center_ray_points_at_target(self):
        cam = Camera(position=(13.0, 30.0, 25.0), target=(0.0, 13.0, 0.0), fov_y=45.0)
        m = camera_matrices(cam, 64, 64)
        o, d = generate_rays(m, 64, 64)
        o = np.asarray(o)
        d = np.asarray(d)
        np.testing.assert_allclose(o[32, 32], [13, 30, 25], atol=1e-4)
        want = np.array([0.0, 13.0, 0.0]) - np.array([13.0, 30.0, 25.0])
        want /= np.linalg.norm(want)
        # center of a 64x64 image is between pixels 31 and 32 — average them
        center = (d[31, 31] + d[32, 32] + d[31, 32] + d[32, 31]) / 4
        center /= np.linalg.norm(center)
        np.testing.assert_allclose(center, want, atol=2e-3)

    def test_image_orientation_y_down(self):
        # Row 0 must be the TOP of the image: with up=(0,1,0) and the Vulkan
        # y-flip, rays in row 0 should have larger world-y than the last row.
        cam = Camera(position=(0, 0, 5), target=(0, 0, 0), fov_y=60.0)
        m = camera_matrices(cam, 16, 16)
        _, d = generate_rays(m, 16, 16)
        d = np.asarray(d)
        assert d[0, 8, 1] > d[15, 8, 1]

    def test_fov_edges(self):
        # Vertical fov: angle between top and bottom edge rays ~ fov_y.
        cam = Camera(position=(0, 0, 0), target=(0, 0, -1), fov_y=90.0)
        h = 512
        m = camera_matrices(cam, h, h)
        _, d = generate_rays(m, h, h)
        d = np.asarray(d)
        top, bottom = d[0, h // 2], d[h - 1, h // 2]
        angle = np.degrees(np.arccos(np.dot(top, bottom)))
        assert abs(angle - 90.0) < 0.5

    def test_reprojection_roundtrip(self):
        cam = Camera(position=(1.0, 2.0, 5.0), target=(0.0, 0.0, 0.0), fov_y=50.0)
        w, h = 128, 96
        m = camera_matrices(cam, w, h)
        o, d = generate_rays(m, w, h)
        # A point 3 units along each ray must reproject to its own pixel uv.
        pts = np.asarray(o) + 3.0 * np.asarray(d)
        uv, valid = project_to_prev_uv(m["view_proj"], jnp.asarray(pts))
        uv = np.asarray(uv)
        px = (np.arange(w) + 0.5) / w
        py = (np.arange(h) + 0.5) / h
        uu, vv = np.meshgrid(px, py)
        want = np.stack([uu, vv], axis=-1)
        # Edge pixels can reproject to uv ~ -1e-6 under f32 roundoff; require
        # validity only in the interior and uv agreement everywhere.
        assert np.asarray(valid)[1:-1, 1:-1].all()
        np.testing.assert_allclose(uv, want, atol=1e-4)
