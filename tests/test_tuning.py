"""TPU-generation kernel tuning (ops.tuning) — the XSER-analog chooser."""

import pytest

from intfftk_tpu.config import FFTConfig
from intfftk_tpu.ops import tuning as T
from intfftk_tpu.ops.pallas_fft import FusedAxisFFT, PallasFFTPlan


@pytest.mark.parametrize("kind,gen", [
    ("TPU v5 lite", "v5e"),
    ("TPU v5e", "v5e"),
    ("TPU v5p", "v5p"),
    ("TPU v5", "v5p"),
    ("TPU v4", "v4"),
    ("TPU v6 lite", "v6e"),
    ("TPU v7x", "v7"),
    ("cpu", "cpu"),
    ("Frobnicator 9000", "default"),
])
def test_normalize_kind(kind, gen):
    assert T.normalize_kind(kind) == gen


def test_env_override(monkeypatch):
    monkeypatch.setenv("INTFFTK_TPU_GEN", "v4")
    tn = T.device_tuning()
    assert tn.generation == "v4"
    assert tn.lane_tile == T.TUNINGS["v4"].lane_tile


def test_distinct_parameter_sets():
    # at least two generations carry different parameters (measured v5e
    # vs conservative v4)
    assert T.TUNINGS["v5e"].lane_tile != T.TUNINGS["v4"].lane_tile


def test_plans_record_tuning():
    cfg = FFTConfig(n=256)
    plan = PallasFFTPlan(cfg, interpret=True)
    assert plan.tuning.generation in T.TUNINGS or \
        plan.tuning.generation == "default"
    assert plan.lane_tile == plan.tuning.lane_tile
    # explicit override wins
    plan = FusedAxisFFT(cfg, interpret=True, lane_tile=128)
    assert plan._pass.lane_tile == 128
