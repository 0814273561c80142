"""Loop helpers: early-exit wavefront loops with a differentiable variant.

The bounce walks are masked full-batch loops. Forward rendering wants
`lax.while_loop` (exit as soon as no lane is active — e.g. the ReSTIR final
walk usually terminates after 1-2 rounds); reverse-mode AD requires a fixed
trip count (`lax.while_loop` has no transpose rule), so the differentiable
path runs the same body a static number of times under `lax.scan` — extra
iterations are no-ops because every state update in the body is masked by
the active lanes.
"""

from __future__ import annotations

import jax


def bounded_loop(cond, body, init, max_iters: int, differentiable: bool):
    """Run `body` until `cond` fails (forward) or exactly max_iters times
    (differentiable). body/cond operate on a single carry pytree."""
    if not differentiable:
        return jax.lax.while_loop(cond, body, init)

    def scan_body(carry, _):
        return body(carry), None

    carry, _ = jax.lax.scan(scan_body, init, None, length=max_iters)
    return carry
