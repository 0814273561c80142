"""Repro 2: Mosaic rejects per-lane dynamic VMEM indexing in a Pallas kernel.

The kernel receives a small table (fits VMEM) and a per-lane index vector,
and wants `out[i] = table[idx[i]]` computed IN-KERNEL — the primitive a
tile+halo temporal-reuse kernel or an in-kernel BVH node walk needs.

Observed on the 2026-08 toolchain (TPU v5 lite via axon):

  A. 1-D form  — jnp.take(flat_table, idx) in-kernel:
       NotImplementedError: Only 2D gather is supported
  B. 2-D form  — jnp.take_along_axis(table, idx, axis=0) (idx (8,128),
     table (256,128)): bare AssertionError in the Mosaic gather lowering
     (dimension_numbers check), no user-actionable message.

Round-5 re-test (2026-08-21): SAME-SHAPE take_along_axis now COMPILES
AND IS CORRECT in-kernel for BOTH axes (table (8,128), idx (8,128) —
per-lane dynamic sublane OR lane indexing within a register tile). The
general forms above still fail, so arbitrary-window per-lane gathers
must be decomposed into same-shape chunk gathers + selects; the
perpixel-spatial-taps kernel design sized on top of this lands at
~70 ms/frame extra at 1080p (61-row-value select per axis), documented
in docs/ROADMAP.md — better than the ~50x jnp perpixel mode but far
from shared-tap cost.

Usage: python docs/repros/mosaic_dynamic_vmem_gather.py
Prints OK for each form that compiles+runs (i.e., the issue is fixed).

Standalone: no sunray_tpu imports.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def form_a():
    """1-D flat-table per-lane lookup."""

    def kernel(table_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take(table_ref[...], idx_ref[...], axis=0)

    table = jnp.arange(32768, dtype=jnp.float32)
    idx = jnp.arange(1024, dtype=jnp.int32) * 37 % 32768
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((1024,), jnp.float32)
    )(table, idx)
    assert jnp.allclose(out, table[idx]), "wrong result"


def form_b():
    """2-D per-lane row lookup (take_along_axis shape discipline)."""

    def kernel(table_ref, idx_ref, out_ref):
        out_ref[...] = jnp.take_along_axis(
            table_ref[...], idx_ref[...], axis=0
        )[:8]

    table = jnp.arange(256 * 128, dtype=jnp.float32).reshape(256, 128)
    idx = (jnp.arange(8 * 128, dtype=jnp.int32) * 37 % 256).reshape(8, 128)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)
    )(table, idx)
    assert jnp.allclose(
        out, jnp.take_along_axis(table, idx, axis=0)[:8]
    ), "wrong result"


def main():
    for name, fn in (("A (1-D take)", form_a), ("B (take_along_axis)", form_b)):
        try:
            fn()
            print(f"form {name}: OK (issue appears fixed)")
        except Exception as e:  # noqa: BLE001 — repro script
            print(f"form {name}: still FAILS — {type(e).__name__}: "
                  f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
