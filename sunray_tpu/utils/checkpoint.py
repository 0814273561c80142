"""Checkpoint / resume for renderer state (SURVEY.md section 5.4).

The reference has no checkpointing; its nearest analog is temporal
resources surviving per-frame graph rebuilds (graph.rs:235-266). Here the
whole cross-frame state (accumulation image, DI/GI reservoirs, frame
counter, prev view-proj) is one pytree, so progressive renders and
training runs resume exactly. Orbax is used when available (async,
multi-host-aware); a plain npz fallback keeps the feature dependency-free.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from sunray_tpu.render.pipeline import RenderState
from sunray_tpu.render import restir


def save_state(state: RenderState, path: str) -> None:
    flat, _ = jax.tree_util.tree_flatten(state)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(
        path, **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
    )


def load_state(path: str, template: RenderState) -> RenderState:
    """Load into the structure of `template` (shapes must match)."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten(template)
    leaves = []
    for i, t in enumerate(flat):
        arr = data[f"leaf_{i}"]
        if arr.shape != tuple(t.shape):
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != {tuple(t.shape)}"
            )
        leaves.append(arr.astype(np.asarray(t).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_state_orbax(state: RenderState, path: str) -> bool:
    """Orbax variant (async-capable); returns False if orbax unavailable."""
    try:
        import orbax.checkpoint as ocp
    except ImportError:  # pragma: no cover
        return False
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    return True


def load_state_orbax(path: str, template: RenderState):
    try:
        import orbax.checkpoint as ocp
    except ImportError:  # pragma: no cover
        return None
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path), item=template)
