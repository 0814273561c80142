"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import pytest


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
class TestDryrun:
    def test_dryrun_multichip_8(self):
        import __graft_entry__ as ge
        ge.dryrun_multichip(8)

    def test_entry_compiles(self):
        import __graft_entry__ as ge
        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        state, ldr, aux = out
        assert np.isfinite(np.asarray(ldr)).all()
