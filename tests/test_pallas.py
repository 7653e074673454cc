"""Pallas fused-kernel path vs the golden model — bit-exact in interpreter
mode (CPU CI); the same kernels compile for real TPUs (exercised by
bench.py / __graft_entry__.py on hardware)."""

import numpy as np
import pytest

from intfftk_tpu.config import FFTConfig
from intfftk_tpu.golden import fft_int, random_stimulus
from intfftk_tpu.golden.four_step import four_step_int
from intfftk_tpu.ops.pallas_fft import (LANE_TILE, LargeFFTPlan,
                                        PallasFFTPlan)

MODES = [("unscaled", "truncate"), ("scaled", "truncate"), ("scaled", "round")]


@pytest.mark.parametrize("n", [8, 64, 1024])
@pytest.mark.parametrize("mode,rounding", MODES)
def test_pallas_fwd_bitexact(n, mode, rounding):
    cfg = FFTConfig(n=n, mode=mode, rounding=rounding, data_width=16,
                    twiddle_width=16)
    if cfg.output_width > 32:
        pytest.skip("width")
    re, im = random_stimulus(n, 16, seed=n, batch=(LANE_TILE,))
    gr, gi = fft_int(re, im, cfg)
    dr, di = PallasFFTPlan(cfg, layout="bn", interpret=True)(re, im)
    np.testing.assert_array_equal(gr, np.asarray(dr, np.int64))
    np.testing.assert_array_equal(gi, np.asarray(di, np.int64))


@pytest.mark.parametrize("mode,rounding", MODES)
def test_pallas_inv_bitexact(mode, rounding):
    n = 512
    cfg = FFTConfig(n=n, mode=mode, rounding=rounding, data_width=14,
                    twiddle_width=18)
    if cfg.output_width > 32:
        pytest.skip("width")
    re, im = random_stimulus(n, 14, seed=7, batch=(LANE_TILE,))
    gr, gi = fft_int(re, im, cfg, inverse=True)
    dr, di = PallasFFTPlan(cfg, inverse=True, layout="bn",
                           interpret=True)(re, im)
    np.testing.assert_array_equal(gr, np.asarray(dr, np.int64))
    np.testing.assert_array_equal(gi, np.asarray(di, np.int64))


def test_pallas_nb_layout():
    """Native [n, B] layout, multiple lane tiles."""
    cfg = FFTConfig(n=256)
    re, im = random_stimulus(256, 16, seed=3, batch=(2 * LANE_TILE,))
    gr, gi = fft_int(re, im, cfg)
    dr, di = PallasFFTPlan(cfg, layout="nb", interpret=True)(re.T, im.T)
    np.testing.assert_array_equal(gr.T, np.asarray(dr, np.int64))
    np.testing.assert_array_equal(gi.T, np.asarray(di, np.int64))


def test_pallas_wide_twiddle_limbs():
    """Config driving the multi-limb cmult tiers inside the kernel."""
    cfg = FFTConfig(n=256, mode="scaled", rounding="round", data_width=24,
                    twiddle_width=25)
    re, im = random_stimulus(256, 24, seed=4, batch=(LANE_TILE,))
    gr, gi = fft_int(re, im, cfg)
    dr, di = PallasFFTPlan(cfg, layout="bn", interpret=True)(re, im)
    np.testing.assert_array_equal(gr, np.asarray(dr, np.int64))
    np.testing.assert_array_equal(gi, np.asarray(di, np.int64))


def test_pallas_bypass_fly():
    cfg = FFTConfig(n=128, bypass_fly=True)
    re, im = random_stimulus(128, 16, seed=5, batch=(LANE_TILE,))
    gr, gi = fft_int(re, im, cfg)
    dr, di = PallasFFTPlan(cfg, layout="bn", interpret=True)(re, im)
    np.testing.assert_array_equal(gr, np.asarray(dr, np.int64))
    np.testing.assert_array_equal(gi, np.asarray(di, np.int64))


def test_pallas_guards():
    with pytest.raises(NotImplementedError):
        PallasFFTPlan(FFTConfig(n=8192))
    plan = PallasFFTPlan(FFTConfig(n=64), interpret=True)
    with pytest.raises(ValueError):
        plan(np.zeros((64, 100)), np.zeros((64, 100)))  # batch % 128 != 0
    with pytest.raises(ValueError):
        plan(np.zeros((32, 128)), np.zeros((32, 128)))  # wrong n


@pytest.mark.parametrize("mode,rounding", MODES)
def test_large_fft_vs_four_step_golden(mode, rounding):
    cfg = FFTConfig(n=1 << 15, mode=mode, rounding=rounding, data_width=16,
                    twiddle_width=16)
    if mode == "unscaled":
        cfg = FFTConfig(n=1 << 15, mode=mode, rounding=rounding,
                        data_width=12, twiddle_width=16)
    plan = LargeFFTPlan(cfg, interpret=True)
    re, im = random_stimulus(cfg.n, cfg.data_width - 1, seed=6)
    gr, gi = four_step_int(re, im, cfg, plan.n1, plan.n2)
    dr, di = plan(re, im)
    np.testing.assert_array_equal(gr, np.asarray(dr, np.int64))
    np.testing.assert_array_equal(gi, np.asarray(di, np.int64))


def test_large_fft_inverse():
    cfg = FFTConfig(n=1 << 15, mode="scaled", rounding="truncate",
                    data_width=16, twiddle_width=16)
    plan = LargeFFTPlan(cfg, inverse=True, interpret=True)
    re, im = random_stimulus(cfg.n, 15, seed=8)
    gr, gi = four_step_int(re, im, cfg, plan.n1, plan.n2, inverse=True)
    dr, di = plan(re, im)
    np.testing.assert_array_equal(gr, np.asarray(dr, np.int64))
    np.testing.assert_array_equal(gi, np.asarray(di, np.int64))


def test_pallas_bitrev_order_pair():
    """order='bitrev' raw cores compose into the reference pair: DIF raw
    output feeds DIT raw input with no reorder (int_fft_ifft_pair)."""
    import dataclasses
    cfg = FFTConfig(n=256, mode="unscaled", data_width=12, twiddle_width=16)
    icfg = dataclasses.replace(cfg, mode="scaled", rounding="round",
                               data_width=cfg.output_width)
    re, im = random_stimulus(256, 11, seed=9, batch=(LANE_TILE,))
    fwd = PallasFFTPlan(cfg, layout="bn", order="bitrev", interpret=True)
    inv = PallasFFTPlan(icfg, inverse=True, layout="bn", order="bitrev",
                        interpret=True)
    yr, yi = fwd(re, im)
    xr, xi = inv(yr, yi)
    # unscaled fwd + scaled inv = identity up to twiddle rounding
    assert np.max(np.abs(np.asarray(xr, np.int64) - re)) < 8
    assert np.max(np.abs(np.asarray(xi, np.int64) - im)) < 8
    # and bitrev order is exactly natural order permuted
    from intfftk_tpu.golden import bitrev_indices, fft_int
    gr, gi = fft_int(re, im, cfg)
    rev = bitrev_indices(256)
    np.testing.assert_array_equal(gr[..., rev], np.asarray(yr, np.int64))


def test_large_fft_batched():
    cfg = FFTConfig(n=1 << 14, mode="scaled", rounding="round",
                    data_width=16, twiddle_width=16)
    plan = LargeFFTPlan(cfg, interpret=True)
    re, im = random_stimulus(cfg.n, 15, seed=10, batch=(3,))
    gr, gi = four_step_int(re, im, cfg, plan.n1, plan.n2)
    dr, di = plan(re, im)
    np.testing.assert_array_equal(gr, np.asarray(dr, np.int64))
    np.testing.assert_array_equal(gi, np.asarray(di, np.int64))
