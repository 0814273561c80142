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


class AsyncCheckpointManager:
    """Non-blocking step checkpoints for progressive renders and training
    loops: `save(step, state)` returns as soon as the pytree is snapshotted
    and commits to disk on a background thread, overlapping the next
    frames' compute (orbax async; multi-host-aware when sharded). Falls
    back to synchronous npz files when orbax is unavailable — same API.

    Typical loop:
        mgr = AsyncCheckpointManager(dir, max_to_keep=3)
        for step in range(n):
            state, img, _ = frame(state)
            if step % 64 == 0:
                mgr.save(step, state)
        mgr.wait(); mgr.close()
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = None
        try:
            import orbax.checkpoint as ocp

            self._mgr = ocp.CheckpointManager(
                self.directory,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=max_to_keep, enable_async_checkpointing=True
                ),
            )
        except Exception:  # pragma: no cover - orbax missing/incompatible
            self._max_to_keep = max_to_keep

    # -- orbax-free fallback helpers --
    def _npz_path(self, step: int) -> str:
        return os.path.join(self.directory, f"state_{step:012d}.npz")

    def _npz_steps(self):
        out = []
        for f in os.listdir(self.directory):
            if f.startswith("state_") and f.endswith(".npz"):
                out.append(int(f[len("state_"):-len(".npz")]))
        return sorted(out)

    def save(self, step: int, state) -> None:
        if self._mgr is not None:
            import orbax.checkpoint as ocp

            self._mgr.save(step, args=ocp.args.StandardSave(state))
            return
        save_state(state, self._npz_path(step))
        steps = self._npz_steps()
        for s in steps[: max(0, len(steps) - self._max_to_keep)]:
            os.remove(self._npz_path(s))

    def latest_step(self):
        if self._mgr is not None:
            return self._mgr.latest_step()
        steps = self._npz_steps()
        return steps[-1] if steps else None

    def restore(self, template, step: int = None):
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        if self._mgr is not None:
            import orbax.checkpoint as ocp

            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return load_state(self._npz_path(step), template)

    def wait(self) -> None:
        """Block until all in-flight async saves are committed."""
        if self._mgr is not None:
            self._mgr.wait_until_finished()

    def close(self) -> None:
        self.wait()
        if self._mgr is not None:
            self._mgr.close()
