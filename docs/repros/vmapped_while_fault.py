"""Repro 1: vmapped stateful `lax.while_loop` device-faults at >=128k lanes.

A per-lane stack walk (the classic BVH traversal shape: each lane carries a
small int32 stack + scalar state, loop trip count is data-dependent) works
at 8192 and 65536 lanes but device-faults on TPU v5e somewhere at or above
131072 lanes. Suspected: the vmapped while carry (lanes x STACK) exceeds
some scoped-memory budget without a compile-time error.

Usage: python docs/repros/vmapped_while_fault.py [lanes]
Default sweeps 8192 -> 262144, printing each size before running so the
faulting size is visible in the crash output. No fault => prints OK.

Standalone: no sunray_tpu imports.
"""

import sys

import jax
import jax.numpy as jnp

STACK = 64


def walk_one(seed):
    """Data-dependent stack walk; pure toy (pushes pseudo-children)."""
    stack = jnp.zeros((STACK,), jnp.int32).at[0].set(seed % 97)
    state = dict(stack=stack, sp=jnp.int32(1), acc=jnp.float32(0))

    def cond(s):
        return s["sp"] > 0

    def body(s):
        sp = s["sp"] - 1
        node = s["stack"][sp]
        acc = s["acc"] + jnp.float32(node)
        # push two children while node > 1 (bounded depth ~log2(97)+)
        l = node // 2
        r = node // 3
        stack = s["stack"]
        push_l = l > 1
        stack = stack.at[sp].set(jnp.where(push_l, l, stack[sp]))
        sp1 = sp + push_l.astype(jnp.int32)
        push_r = r > 1
        sp1c = jnp.minimum(sp1, STACK - 1)
        stack = stack.at[sp1c].set(jnp.where(push_r, r, stack[sp1c]))
        sp2 = jnp.minimum(sp1 + push_r.astype(jnp.int32), STACK - 1)
        return dict(stack=stack, sp=sp2, acc=acc)

    return jax.lax.while_loop(cond, body, state)["acc"]


def main():
    sizes = [int(sys.argv[1])] if len(sys.argv) > 1 else [
        8192, 65536, 131072, 262144
    ]
    fn = jax.jit(jax.vmap(walk_one))
    for n in sizes:
        print(f"lanes={n} ...", flush=True)
        seeds = jnp.arange(n, dtype=jnp.int32)
        out = fn(seeds)
        jax.block_until_ready(out)
        print(f"lanes={n} done, sum={float(out.sum()):.1f}", flush=True)
    print("OK (issue appears fixed)")


if __name__ == "__main__":
    main()
