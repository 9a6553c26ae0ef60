"""The driver's integration hooks must keep working."""

import numpy as np


def test_entry_compiles_and_runs():
    import importlib.util
    spec = importlib.util.spec_from_file_location("graft", "__graft_entry__.py")
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)
    import jax

    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2, 256, 256, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_four_devices():
    import importlib.util
    spec = importlib.util.spec_from_file_location("graft", "__graft_entry__.py")
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)
    graft.dryrun_multichip(4)
