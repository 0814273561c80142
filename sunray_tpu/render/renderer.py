"""Stateful Renderer facade over the functional core.

The API twin of the reference's `Renderer` (src/lib.rs:84-198): owns the
scene, config, and cross-frame state; exposes render / render_to_host_memory
/ resize. Under the hood each frame is one jitted call of
pipeline.render_frame with the state pytree donated (the reference's
frames-in-flight + temporal-resource machinery collapses to JAX async
dispatch + buffer donation).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import numpy as np

from sunray_tpu.camera import Camera, camera_matrices
from sunray_tpu.config import RenderConfig
from sunray_tpu.render.pipeline import RenderState, render_frame


class Renderer:
    def __init__(self, config: RenderConfig, scene=None):
        self.config = config
        self.scene = scene
        self.state = RenderState.create(config)
        self._frame_jit = None
        self._manager = None
        self._instances = None
        self._accel = None
        self._accel_for = None
        # Frame/resize callbacks (lib.rs:537-558): start/end callbacks run
        # ONCE then drop (FnOnce); resize callbacks persist (FnMut).
        self._start_frame_cbs = []
        self._end_frame_cbs = []
        self._resize_cbs = []
        # Scene groups (lib.rs:779/849): load_gltf/load_scene hand back a
        # group id that unload_scene() removes wholesale.
        self._groups = {}
        self._next_group = 0
        self._build_frame_fn()

    # -- callbacks (lib.rs:537-558) --
    def add_start_of_frame_callback(self, callback):
        """Run once at the start of the next render() (FnOnce semantics)."""
        self._start_frame_cbs.append(callback)

    def add_end_of_frame_callback(self, callback):
        """Run once after the next render(), receiving this Renderer."""
        self._end_frame_cbs.append(callback)

    def add_resize_callback(self, callback):
        """Run on every resize() with the new (width, height); persistent."""
        self._resize_cbs.append(callback)

    def _build_frame_fn(self):
        cfg = self.config

        def step(scene, state, mats, accel):
            return render_frame(scene, cfg, state, mats, accel)

        # Donate the state: temporal buffers update in place, the analog of
        # the reference's persistent temporal resources (graph.rs:235-266).
        self._frame_jit = jax.jit(step, donate_argnums=(1,))

    def _scene_accel(self):
        """Host-side quality BVH for the current scene (the SLOW_BUILD op):
        native binned-SAH when the toolchain is available, cached per scene
        object; transform animation is handled by in-jit refit."""
        if self.scene is None:
            return None
        cfg = self.config
        # "auto" above the brute-kernel crossover picks the two-level path:
        # object-space BLASes are built once per mesh topology and shared by
        # every instance, and only the tiny instance TLAS rebuilds per frame
        # — strictly cheaper than the unified world BVH, whose host SAH
        # build reruns on every set_instances() (measured 190x on a
        # 64-instance scene, examples/bench_instances.py). The unified path
        # stays reachable as the forced tracer="bvh".
        brute_max = cfg.brute_force_max_tris
        if jax.default_backend() != "tpu":
            brute_max = min(brute_max, 512)
        if cfg.tracer == "binned":
            # Binned cluster-culled tracer (ops/binned_trace.py): the
            # cluster ASSIGNMENT (Morton order) is load-time topology,
            # cached per scene like the unified BVH; per-frame geometry is
            # refit in-jit by make_tracer.
            if self._accel_for != ("binned", id(self.scene)):
                from sunray_tpu.ops.binned_trace import build_cluster_set

                tris = self.scene.world_triangle_vertices()
                self._accel = build_cluster_set(tris, k=cfg.cluster_k)
                self._accel_for = ("binned", id(self.scene))
            return self._accel
        if cfg.tracer == "bvh2" or (
            cfg.tracer == "auto" and self.scene.num_tris > brute_max
        ):
            # Two-level: object-space BLAS set is a function of the mesh
            # TOPOLOGY only — cache survives instance-transform changes
            # (set_instances rebuilds SceneBuffers but not the meshes), the
            # whole point of the BLAS/TLAS split (blas.rs static builds,
            # tlas.rs per-frame builds).
            from sunray_tpu.ops.bvh2 import build_blas_set

            gen = self._manager._generation if self._manager is not None \
                else id(self.scene)
            # A mesh's BLAS is extracted from its first instance's slice of
            # the scene, so gaining a first instance must invalidate too.
            prims = tuple(np.unique(np.asarray(self.scene.inst_prim)))
            key = (gen, prims)
            if self._accel_for != ("bvh2", key):
                self._accel = build_blas_set(
                    self.scene, leaf_size=cfg.bvh_leaf_size
                )
                self._accel_for = ("bvh2", key)
            return self._accel
        use_bvh = cfg.tracer == "bvh" or (
            cfg.tracer == "auto"
            and self.scene.num_tris > cfg.brute_force_max_tris
        )
        if not use_bvh:
            return None
        if self._accel_for is not self.scene:
            from sunray_tpu.native import build_sah_bvh

            tris = self.scene.world_triangle_vertices()
            self._accel = build_sah_bvh(
                np.asarray(tris[0]), np.asarray(tris[1]), np.asarray(tris[2]),
                leaf_size=cfg.bvh_leaf_size,
            )
            self._accel_for = self.scene
        return self._accel

    def _sync_scene_flags(self):
        """Auto-set jit-static flags that depend on the concrete scene
        (alpha-mask traversal)."""
        if self.scene is None:
            return
        want = bool(self.scene.has_alpha_mask)
        if want != self.config.alpha_mask_tracing:
            self.config = self.config.replace(alpha_mask_tracing=want)
            self._build_frame_fn()

    # -- scene management (load_scene / unload_scene analog, lib.rs:779-857) --
    def load_scene(self, scene, reset_history: bool = True):
        self.scene = scene
        self._manager = None
        self._instances = None
        self._groups = {}           # any load_gltf groups are gone with
        self.last_scene_group = None  # the manager they lived in
        self._sync_scene_flags()
        if reset_history:
            self.reset_history()

    def load_gltf(self, path: str):
        """Load a glTF scene and return the caller-owned instance list
        (lib.rs:779-794 contract: the caller hands instances to each frame;
        by default the scene's own placements are used). The scene group id
        for unload_scene() is available as `last_scene_group`."""
        from sunray_tpu.scene.gltf import load_gltf
        from sunray_tpu.scene.manager import SceneManager

        scene = load_gltf(path)
        if self._manager is None:
            self._manager = SceneManager.from_scene_buffers(scene)
            keys = list(self._manager._meshes)
            self._instances = self._manager.default_instances(scene)
            tex0 = self._manager._textures
            tex_range = (0, 0 if tex0 is None
                         else int(np.asarray(tex0.data).shape[0]))
        else:
            from sunray_tpu.scene.types import merge_atlases

            sub = SceneManager.from_scene_buffers(scene)
            atlas, off = merge_atlases(self._manager._textures, sub._textures)
            self._manager._textures = atlas
            tex_range = (off, 0 if sub._textures is None
                         else int(np.asarray(sub._textures.data).shape[0]))
            prefix = f"g{self._next_group}/"
            keys = []
            for key, mesh in sub._meshes.items():
                if off and "tex_index" in mesh.material:
                    ti = np.asarray(mesh.material["tex_index"])
                    mesh.material["tex_index"] = np.where(ti >= 0, ti + off, ti)
                self._manager._meshes[prefix + key] = mesh
                keys.append(prefix + key)
            self._manager._generation += 1
            self._instances = list(self._instances or []) + [
                (prefix + k, t) for k, t in sub.default_instances(scene)
            ]
        group = self._next_group
        self._next_group += 1
        self._groups[group] = {"keys": keys, "tex": tex_range}
        self.last_scene_group = group
        self.scene = self._manager.build(self._instances)
        self._sync_scene_flags()
        self.reset_history()
        return list(self._instances)

    def unload_scene(self, group: int):
        """Remove every mesh (and its atlas textures) a load_gltf() call
        added (lib.rs:849-871). Remaining meshes' texture indices are
        remapped so repeated load/unload cycles don't grow the atlas."""
        if self._manager is None:
            raise KeyError(f"scene group {group} (no manager loaded)")
        rec = self._groups.pop(group)
        keys = set(rec["keys"])
        for k in keys:
            self._manager.remove_mesh(k)
        self._instances = [
            (k, t) for k, t in (self._instances or []) if k not in keys
        ]
        start, count = rec["tex"]
        if count:
            import jax.numpy as jnp

            a = self._manager._textures
            sel = np.r_[0:start, start + count:np.asarray(a.data).shape[0]]
            self._manager._textures = None if sel.size == 0 else type(a)(
                data=jnp.asarray(np.asarray(a.data)[sel]),
                size=jnp.asarray(np.asarray(a.size)[sel]),
                wrap=jnp.asarray(np.asarray(a.wrap)[sel]),
                filt=jnp.asarray(np.asarray(a.filt)[sel]),
            )
            for mesh in self._manager._meshes.values():
                if "tex_index" in mesh.material:
                    ti = np.asarray(mesh.material["tex_index"])
                    mesh.material["tex_index"] = np.where(
                        ti >= start + count, ti - count, ti
                    )
            for g in self._groups.values():
                s0, c0 = g["tex"]
                if s0 >= start + count:
                    g["tex"] = (s0 - count, c0)
        self._manager._generation += 1
        self.scene = self._manager.build(self._instances)
        self._sync_scene_flags()
        self.reset_history()

    # -- runtime mesh churn (load_mesh/unload_mesh analog, lib.rs:873-973) --
    def load_mesh(self, key, positions, normals, tri_vidx, material,
                  tangents=None, uvs=None):
        from sunray_tpu.scene.manager import SceneManager

        if self._manager is None:
            self._manager = SceneManager()
            self._instances = []
        self._manager.add_mesh(
            key, positions, normals, tri_vidx, material, tangents, uvs
        )

    def unload_mesh(self, key):
        self._manager.remove_mesh(key)
        self._instances = [
            (k, t) for k, t in (self._instances or []) if k != key
        ]
        self.scene = self._manager.build(self._instances)

    def set_instances(self, instances):
        """Update the per-frame instance list [(mesh key, (3,4) transform)].
        Capacity padding keeps array shapes stable for small churn, so the
        compiled frame program is reused (the arena/deferred-build analog of
        lib.rs:873-973 — no stall on spawn/despawn)."""
        self._instances = list(instances)
        self.scene = self._manager.build(self._instances)

    def reset_history(self):
        """Temporal-state reset (resize/scene-change semantics, lib.rs:639)."""
        self.state = RenderState.create(self.config)

    def resize(self, width: int, height: int):
        """lib.rs:586-642: rebuild size-dependent resources, reset temporal
        state and the relative frame counter."""
        self.config = self.config.with_size(width, height)
        self._build_frame_fn()
        self.reset_history()
        for cb in self._resize_cbs:
            cb((width, height))

    # -- rendering --
    def render(self, camera: Camera, instances=None):
        """One frame -> (H, W, 3) float32 LDR in [0,1]. Advances state.

        instances: optional caller-owned [(mesh key, transform)] list for
        this frame (the render(..., instances) contract, lib.rs:984)."""
        if self.scene is None and instances is None:
            raise RuntimeError("no scene loaded")
        cbs, self._start_frame_cbs = self._start_frame_cbs, []
        for cb in cbs:
            cb()
        if instances is not None:
            self.set_instances(instances)
        if self.scene is None:
            raise RuntimeError("no scene loaded")
        mats = camera_matrices(camera, self.config.width, self.config.height)
        self.state, ldr, _aux = self._frame_jit(
            self.scene, self.state, mats, self._scene_accel()
        )
        cbs, self._end_frame_cbs = self._end_frame_cbs, []
        for cb in cbs:
            cb(self)
        return ldr

    def render_to_host_memory(self, camera: Camera, warmup: Optional[int] = None):
        """Offline golden-image path (lib.rs:1908-1934): N warm-up frames so
        ReSTIR temporal reuse + TAA have history, then return RGBA8 bytes."""
        warmup = self.config.warmup_frames if warmup is None else warmup
        ldr = None
        for _ in range(warmup + 1):
            ldr = self.render(camera)
        img = np.asarray(ldr)
        rgba = np.concatenate(
            [img, np.ones_like(img[..., :1])], axis=-1
        )
        return (np.clip(rgba, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
