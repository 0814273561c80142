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


def bounded_loop(cond, body, init, max_iters: int, differentiable: bool,
                 peel: int = 0, loop_body=None):
    """Run `body` until `cond` fails (forward) or exactly max_iters times
    (differentiable). body/cond operate on a single carry pytree.

    peel: run the first `peel` iterations UNCONDITIONALLY inline before
    entering the loop. A while_loop boundary materializes the whole carry
    (HBM round-trip) and blocks fusion with the surrounding program —
    measured ~120 ms per walk round at 1080p vs the same body fused
    inline. The bounce walks almost always execute at least one round, so
    peeling it is free fusion. Callers must guarantee the body is a no-op
    (masked) for lanes whose cond already failed; only counters may
    advance. peel > max_iters is clamped.
    """
    peel = min(peel, max_iters)
    for _ in range(peel):
        init = body(init)
    # loop_body: optional distinct body for the looped rounds — e.g. the
    # bounce walks pass coherent=True for the peeled (camera-ray) round
    # and coherent=False inside the loop so the binned tracer
    # coherence-sorts only the genuinely incoherent bounce batches.
    loop_body = body if loop_body is None else loop_body
    if not differentiable:
        return jax.lax.while_loop(cond, loop_body, init)

    def scan_body(carry, _):
        return loop_body(carry), None

    if max_iters - peel <= 0:
        return init
    carry, _ = jax.lax.scan(scan_body, init, None, length=max_iters - peel)
    return carry
