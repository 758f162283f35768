"""The driver-facing entry points must always compile and run.

entry() is compile-checked single-chip by the driver and dryrun_multichip
on a virtual CPU mesh; regressions here fail the round, so they are also
pinned in CI (the conftest provides the 8-device CPU mesh)."""

import numpy as np


def test_entry_compiles_and_runs():
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    out.block_until_ready()
    assert out.shape == args[0].shape
    assert np.isfinite(np.asarray(out)).all()
    # The flagship step is a faithful round-trip, not just shape-correct.
    from crlot_tpu.metrics import snr_db

    assert snr_db(np.asarray(args[0]), np.asarray(out)) > 60.0


def test_dryrun_multichip_8(monkeypatch):
    # Small config-5 scale leg: the full 128-ch x 1-min shape (~2.5 min on
    # this CPU) is exercised by the driver run and the artifact
    # generation; CI checks the mechanism.
    monkeypatch.setenv("CRLOT_DRYRUN_SCALE", "small")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
