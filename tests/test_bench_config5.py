"""The multi-chip turnkey path (bench_config5) exercised on the virtual
mesh — VERDICT r4 Next #8: ``bench.py --all`` auto-emits the config-5
sharded four-step whenever the backend has > 1 device, so the first
round with real multi-chip hardware produces the BASELINE milestone
numbers with zero new code.  This test keeps that path green on the
8-virtual-device CPU mesh (conftest forces it)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def test_config5_virtual_mesh():
    import jax
    from bench import bench_config5

    # the ambient axon TPU plugin can win jax.devices() even under
    # JAX_PLATFORMS=cpu; the test is defined on the virtual CPU mesh
    devs = jax.devices("cpu")
    assert len(devs) == 8
    out = bench_config5(devices=devs)
    assert out["bits_ok"] is True
    assert out["devices"] == 8
    assert out["virtual"] is True          # flagged: not a perf claim
    assert out["msamples_per_sec"] > 0
