"""Driver-contract tests for __graft_entry__ (CPU)."""

import sys

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy e2e tier

sys.path.insert(0, "/root/repo")


class TestGraftEntry:
    def test_entry_compiles_and_runs(self):
        import __graft_entry__ as g

        fn, args = g.entry()
        logits, loss = jax.jit(fn)(*args)
        assert logits.shape[0] == args[0].shape[0]
        assert np.isfinite(float(np.asarray(loss)))

    def test_dryrun_multichip_all_devices(self):
        import __graft_entry__ as g

        n = len(jax.devices())
        assert n >= 2, "conftest should provide the 8-device CPU mesh"
        g.dryrun_multichip(n)
