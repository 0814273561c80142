"""Scene manager: runtime mesh/instance churn (the window example's
spawn-at-frame-120 / despawn-at-frame-240 scripted test,
examples/window/main.rs:222-234) and the AsState heuristic."""

import numpy as np
import pytest

from sunray_tpu.camera import Camera
from sunray_tpu.config import RenderConfig
from sunray_tpu.ops import accel_state
from sunray_tpu.render.renderer import Renderer
from sunray_tpu.scene import cornell_box
from sunray_tpu.scene.manager import SceneManager, pad_scene_capacity
from sunray_tpu.scene.types import identity_transform, translate

CFG = RenderConfig(
    width=48, height=32, bounces=3, virtual_bounces=2, ris_candidates=2,
    di_spatial_samples=1, gi_spatial_samples=1, denoise_passes=1,
)
CAM = Camera(position=(1.0, 1.0, 3.4), target=(1.0, 1.0, 0.0), fov_y=45.0)


def tri_mesh():
    """A single bright-white quad facing +z near the box front."""
    positions = np.asarray(
        [[0.6, 0.6, 1.5], [1.4, 0.6, 1.5], [1.4, 1.4, 1.5], [0.6, 1.4, 1.5]],
        np.float32,
    )
    normals = np.tile(np.asarray([[0, 0, 1.0]], np.float32), (4, 1))
    tris = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    return positions, normals, tris


class TestManager:
    def test_roundtrip_from_scene(self):
        scene = cornell_box()
        mgr = SceneManager.from_scene_buffers(scene)
        inst = mgr.default_instances(scene)
        rebuilt = mgr.build(inst, pad_to_capacity=False)
        assert rebuilt.num_tris == scene.num_tris
        assert rebuilt.num_lights == scene.num_lights
        # World triangles must cover the same geometry (order may differ).
        a = np.sort(np.asarray(rebuilt.world_triangle_vertices()[0]), axis=0)
        b = np.sort(np.asarray(scene.world_triangle_vertices()[0]), axis=0)
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_capacity_padding_stabilizes_shapes(self):
        scene = cornell_box()
        mgr = SceneManager.from_scene_buffers(scene)
        inst = mgr.default_instances(scene)
        s1 = mgr.build(inst)
        # Spawn one duplicate instance of the smallest mesh (the 2-triangle
        # light): stays within the padded capacity -> identical shapes.
        smallest = min(
            inst, key=lambda kt: mgr._meshes[kt[0]].tri_vidx.shape[0]
        )[0]
        s2 = mgr.build(inst + [(smallest, translate(0.1, 0.0, 0.1))])
        assert s1.tri_vidx.shape == s2.tri_vidx.shape

    def test_degenerate_padding_never_hits(self):
        from sunray_tpu.ops import intersect
        import jax.numpy as jnp

        scene = pad_scene_capacity(cornell_box())
        tris = scene.world_triangle_vertices()
        o = jnp.asarray([[1.0, 1.0, 1.0]])
        d = jnp.asarray([[0.0, -1.0, 0.0]])
        h = intersect.trace_closest_brute(tris, o, d)
        # must hit the floor, not a padding triangle
        assert bool(h.hit[0])
        assert float(h.t[0]) == pytest.approx(1.0, rel=1e-4)


class TestRuntimeChurn:
    def test_spawn_despawn(self):
        scene = cornell_box()
        r = Renderer(CFG)
        r._manager = SceneManager.from_scene_buffers(scene)
        r._instances = r._manager.default_instances(scene)
        r.scene = r._manager.build(r._instances)

        base = np.asarray(r.render(CAM))
        # Runtime mesh add (load_mesh analog): bright quad appears.
        p, n, t = tri_mesh()
        r.load_mesh("quad", p, n, t, {"base_color": (1, 1, 1, 1),
                                      "emissive_factor": (1, 1, 1, 30.0)})
        with_quad = np.asarray(
            r.render(CAM, r._instances + [("quad", identity_transform())])
        )
        assert with_quad.mean() > base.mean() + 0.005  # emissive quad visible

        # Despawn: back to (approximately) the original image.
        r.unload_mesh("quad")
        r.reset_history()
        after = np.asarray(r.render(CAM, r._instances))
        assert abs(after.mean() - base.mean()) < 0.25 * base.mean() + 0.05


class TestAsState:
    def test_static_settles_to_quality_build(self):
        st = accel_state.AsState()
        st.mark(accel_state.FAST_BUILD, changed=True)
        ops = []
        for _ in range(20):
            op = st.next_op(geometry_changed=False, topology_changed=False)
            ops.append(op)
            st.mark(op, changed=False)
        assert accel_state.SLOW_BUILD in ops
        assert st.optimal

    def test_dynamic_refits_then_rebuilds(self):
        st = accel_state.AsState()
        st.mark(accel_state.FAST_BUILD, changed=True)
        st.mark(accel_state.UPDATE, changed=True)  # enter update mode
        ops = []
        for _ in range(12):
            op = st.next_op(geometry_changed=True, topology_changed=False)
            ops.append(op)
            st.mark(op, changed=True)
        # <=8 consecutive refits between rebuilds (mod.rs:75)
        run = 0
        for op in ops:
            if op == accel_state.UPDATE:
                run += 1
                assert run <= accel_state.MAX_UPDATES_BEFORE_REBUILD
            else:
                run = 0
        assert accel_state.FAST_BUILD in ops

    def test_topology_change_always_rebuilds(self):
        st = accel_state.AsState()
        assert (
            st.next_op(geometry_changed=True, topology_changed=True)
            == accel_state.FAST_BUILD
        )
