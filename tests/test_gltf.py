"""glTF loader tests against the reference's checked-in GLB assets."""

import os

import numpy as np
import pytest

ASSETS = "/root/reference/examples/assets"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ASSETS), reason="reference assets not available"
)


@pytest.fixture(scope="module")
def room():
    from sunray_tpu.scene.gltf import load_gltf
    return load_gltf(os.path.join(ASSETS, "ReflectionRoom.glb"))


class TestReflectionRoom:
    def test_structure(self, room):
        assert room.num_tris > 0
        assert room.inst_prim.shape[0] >= 5          # 5 meshes (one has 2 prims)
        assert room.materials.base_color.shape[0] <= 6
        # The emissive light (strength 61.6) must be present.
        ef = np.asarray(room.materials.emissive_factor)
        assert (ef[:, 3] > 60.0).any()
        assert room.num_lights > 0

    def test_transmission_material(self, room):
        tr = np.asarray(room.materials.transmission)
        assert (tr >= 0.99).any()  # the glass material

    def test_geometry_sane(self, room):
        v0, v1, v2 = room.world_triangle_vertices()
        v = np.asarray(v0)
        assert np.isfinite(v).all()
        # Room scale: tens of units (camera at (13, 30, 25) in the example).
        ext = v.max(axis=0) - v.min(axis=0)
        assert (ext > 1.0).all() and (ext < 500.0).all()

    def test_normals_unit(self, room):
        n = np.asarray(room.normals)
        ln = np.linalg.norm(n, axis=-1)
        assert (np.abs(ln - 1.0) < 1e-2).mean() > 0.99

    def test_renders(self, room):
        import jax
        from sunray_tpu.camera import Camera, camera_matrices
        from sunray_tpu.config import RenderConfig
        from sunray_tpu.render.pipeline import RenderState, render_frame

        cfg = RenderConfig(
            width=64, height=48, bounces=3, virtual_bounces=4,
            ris_candidates=4, di_spatial_samples=2, gi_spatial_samples=1,
            denoise_passes=1, lighting="restir",
        )
        cam = Camera(position=(13.0, 30.0, 25.0), target=(0.0, 13.0, 0.0),
                     fov_y=45.0)  # examples/png/main.rs:52-55
        mats = camera_matrices(cam, cfg.width, cfg.height)
        state = RenderState.create(cfg)
        step = jax.jit(lambda st: render_frame(room, cfg, st, mats))
        for _ in range(3):
            state, ldr, _ = step(state)
        img = np.asarray(ldr)
        assert np.isfinite(img).all()
        assert img.mean() > 0.01  # lit scene


class TestRendererFacade:
    def test_load_gltf_render_two_level_auto(self):
        """The examples/png/main.rs flow through the Renderer facade:
        load_gltf -> default instances -> render, with tracer="auto"
        forced over the brute crossover so the manager-built scene rides
        the shared-BLAS two-level backend."""
        from sunray_tpu.camera import Camera
        from sunray_tpu.config import RenderConfig
        from sunray_tpu.render.renderer import Renderer

        cfg = RenderConfig(
            width=64, height=48, bounces=2, virtual_bounces=2,
            ris_candidates=2, di_spatial_samples=1, gi_spatial_samples=1,
            denoise_passes=1, lighting="nee",
            tracer="auto", brute_force_max_tris=16,
        )
        r = Renderer(cfg)
        instances = r.load_gltf(os.path.join(ASSETS, "ReflectionRoom.glb"))
        assert len(instances) >= 5
        from sunray_tpu.ops import bvh2 as bvh2_mod
        assert isinstance(r._scene_accel(), bvh2_mod.BlasSet)
        cam = Camera(position=(13.0, 30.0, 25.0), target=(0.0, 13.0, 0.0),
                     fov_y=45.0)
        img = np.asarray(r.render(cam))
        assert np.isfinite(img).all()
        assert img.mean() > 0.005


class TestOtherAssets:
    @pytest.mark.parametrize("name", ["Room.glb", "Room2.glb", "Room3.glb"])
    def test_loads(self, name):
        from sunray_tpu.scene.gltf import load_gltf
        scene = load_gltf(os.path.join(ASSETS, name))
        assert scene.num_tris > 0
        v0, _, _ = scene.world_triangle_vertices()
        assert np.isfinite(np.asarray(v0)).all()


class TestSceneGroups:
    def _small_cfg(self):
        from sunray_tpu.config import RenderConfig

        return RenderConfig(
            width=48, height=36, bounces=2, virtual_bounces=2,
            ris_candidates=2, di_spatial_samples=1, gi_spatial_samples=1,
            denoise_passes=1, lighting="nee",
        )

    def test_load_unload_scene_group(self):
        """load_gltf twice -> two groups; unload_scene(group2) restores the
        first load's scene content (lib.rs:779/849 group contract)."""
        from sunray_tpu.camera import Camera
        from sunray_tpu.render.renderer import Renderer

        r = Renderer(self._small_cfg())
        r.load_gltf(os.path.join(ASSETS, "Room.glb"))
        g1 = r.last_scene_group
        tris1 = r.scene.num_tris
        n_inst1 = len(r._instances)

        r.load_gltf(os.path.join(ASSETS, "Room2.glb"))
        g2 = r.last_scene_group
        assert g2 != g1
        assert r.scene.num_tris > tris1
        assert len(r._instances) > n_inst1

        cam = Camera(position=(13.0, 30.0, 25.0), target=(0.0, 13.0, 0.0),
                     fov_y=45.0)
        img = np.asarray(r.render(cam))
        assert np.isfinite(img).all()

        r.unload_scene(g2)
        # Real content restored (instance list is the unpadded truth);
        # the ARRAY capacity stays at the high-water mark — the manager's
        # capacity ratchet keeps the compiled program stable across
        # unload/reload cycles (scene/manager.py build()).
        assert len(r._instances) == n_inst1
        assert r.scene.num_tris >= tris1
        img = np.asarray(r.render(cam))
        assert np.isfinite(img).all()

    def test_frame_and_resize_callbacks(self):
        from sunray_tpu.camera import Camera
        from sunray_tpu.render.renderer import Renderer

        r = Renderer(self._small_cfg())
        r.load_gltf(os.path.join(ASSETS, "Room.glb"))
        events = []
        r.add_start_of_frame_callback(lambda: events.append("start"))
        r.add_end_of_frame_callback(lambda rr: events.append(("end", rr is r)))
        r.add_resize_callback(lambda wh: events.append(("resize", wh)))
        cam = Camera(position=(13.0, 30.0, 25.0), target=(0.0, 13.0, 0.0),
                     fov_y=45.0)
        r.render(cam)
        r.render(cam)   # FnOnce: start/end fire exactly once
        assert events == ["start", ("end", True)]
        r.resize(64, 48)
        r.resize(48, 36)  # FnMut: resize fires every time
        assert events[1:] == [("end", True), ("resize", (64, 48)),
                              ("resize", (48, 36))]

    def test_unload_reclaims_textures(self):
        """Repeated load/unload cycles must not grow the texture atlas
        (each unload removes the group's atlas slice and remaps indices)."""
        from sunray_tpu.render.renderer import Renderer

        r = Renderer(self._small_cfg())
        r.load_gltf(os.path.join(ASSETS, "Room.glb"))
        n0 = np.asarray(r._manager._textures.data).shape[0] \
            if r._manager._textures is not None else 0
        ti0 = {k: np.asarray(m.material.get("tex_index")).copy()
               for k, m in r._manager._meshes.items()}
        for _ in range(3):
            r.load_gltf(os.path.join(ASSETS, "Room2.glb"))
            r.unload_scene(r.last_scene_group)
        n1 = np.asarray(r._manager._textures.data).shape[0] \
            if r._manager._textures is not None else 0
        assert n1 == n0
        for k, m in r._manager._meshes.items():
            np.testing.assert_array_equal(
                np.asarray(m.material.get("tex_index")), ti0[k]
            )
