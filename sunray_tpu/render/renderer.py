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
        self._build_frame_fn()

    def _build_frame_fn(self):
        cfg = self.config

        def step(scene, state, mats):
            return render_frame(scene, cfg, state, mats)

        # Donate the state: temporal buffers update in place, the analog of
        # the reference's persistent temporal resources (graph.rs:235-266).
        self._frame_jit = jax.jit(step, donate_argnums=(1,))

    # -- scene management (load_scene / unload_scene analog, lib.rs:779-857) --
    def load_scene(self, scene, reset_history: bool = True):
        self.scene = scene
        if reset_history:
            self.reset_history()

    def load_gltf(self, path: str):
        from sunray_tpu.scene.gltf import load_gltf
        self.load_scene(load_gltf(path))

    def reset_history(self):
        """Temporal-state reset (resize/scene-change semantics, lib.rs:639)."""
        self.state = RenderState.create(self.config)

    def resize(self, width: int, height: int):
        """lib.rs:586-642: rebuild size-dependent resources, reset temporal
        state and the relative frame counter."""
        self.config = self.config.with_size(width, height)
        self._build_frame_fn()
        self.reset_history()

    # -- rendering --
    def render(self, camera: Camera):
        """One frame -> (H, W, 3) float32 LDR in [0,1]. Advances state."""
        if self.scene is None:
            raise RuntimeError("no scene loaded")
        mats = camera_matrices(camera, self.config.width, self.config.height)
        self.state, ldr, _aux = self._frame_jit(self.scene, self.state, mats)
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
