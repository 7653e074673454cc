"""Fused Pallas TPU kernels for the staged integer FFT.

The performance path of the framework — the TPU analog of the reference's
DSP48-mapped butterfly pipeline (``int_dif2_fly.vhd``/``int_dit2_fly.vhd``
with the ``int_delay_line`` commutation network).  Design:

* **Batch-in-lanes layout** ``[n, B]``: the transform runs along the
  *sublane* (row) axis, a tile of B >= 128 independent transforms occupies
  the lanes.  Every butterfly pairs two full 128-lane vectors; the
  inter-stage "cross-commutation" of the reference hardware is pure row
  indexing — no lane shuffles at ANY stage, which is what makes a radix-2
  schedule viable on the VPU (the row-pair structure
  ``[blocks, 2, h, B]`` mirrors ``fn_radix2``'s lane algebra exactly).
* **Whole transform fused in VMEM**: the XLA reference path
  (``transform.py``) sweeps HBM once per stage — 2·log2(n) passes; this
  kernel loads a tile once, runs all log2(n) stages + bit-reversal (an
  in-VMEM row gather) + optional four-step twiddle epilogue, and stores
  once: 2 passes.  HBM traffic shrinks by log2(n)×, which is the roofline
  on this memory-bound op.
* **Large n via two fused passes**: n = n1 x n2 (n1, n2 <= MAX_ROWS).
  Pass 1 treats ``x.reshape(n1, n2)`` as n2 lane-batched n1-point
  transforms and applies the inter-factor twiddle W_N^(n2·k1) in-kernel;
  an XLA corner turn transposes to ``[n2, n1]``; pass 2's row-major output
  IS the natural-order result — no third transpose.  This is the in-chip
  image of the reference's "2D scheme for large N" directive
  (``int_fftNk.vhd:13``).

All arithmetic is the exact int32 limb algebra of ``intmath.py`` — kernel
outputs are bit-identical to the golden model (tests/test_pallas.py).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import FFTConfig
from ..golden.float_model import bitrev_indices
from ..golden.twiddle import circle_twiddles_int, stage_twiddles_int
from .intmath import (CmultPlan, add_round_half_up, cmult_exact, neg_guarded,
                      sub_round_half_up, wrap_width)
from .wideint import (WideCmultPlan, wide_add, wide_cmult, wide_from_i32,
                      wide_neg_guarded, wide_round_half_up, wide_shr1,
                      wide_sub, wide_to_i64_np, wide_from_i64_np)

#: Row budget of one fused tile: n * LANE_TILE * 4 B * (in+out, re+im)
#: must sit in VMEM with headroom -> 4096 rows x 128 lanes = 8 MiB of
#: int32 payload.
MAX_ROWS = 4096
LANE_TILE = 128


def _pack_tables(cfg: FFTConfig, inverse: bool):
    """Pack per-stage twiddle tables into one [n] row vector.

    Stage of twiddle order p >= 2 occupies rows [2^p, 2^(p+1)) — the same
    offset-by-order packing for every config, so the kernel slices
    statically.  (Orders 0/1 are the multiplier-free specializations.)
    """
    n = cfg.n
    w_re = np.zeros((n, 1), dtype=np.int32)
    w_im = np.zeros((n, 1), dtype=np.int32)
    for p in range(2, cfg.stages):
        re, im = stage_twiddles_int(p, cfg.twiddle_width, cfg.twiddle_gen)
        w_re[1 << p: 2 << p, 0] = re
        w_im[1 << p: 2 << p, 0] = im
    return w_re, w_im


def _cmult_plans(cfg: FFTConfig, inverse: bool):
    plans = {}
    for s in range(cfg.stages):
        p = cfg.stage_twiddle_order(s, inverse)
        if p >= 2:
            in_w = cfg.stage_input_width(s)
            dw = in_w if inverse else in_w + 1 - cfg.scale
            plans[s] = CmultPlan(data_width=dw,
                                 twiddle_width=cfg.twiddle_width,
                                 shift=cfg.twiddle_shift, out_width=dw)
    return plans


def _dif_stage_rows(xr, xi, cfg, s, p, w_re, w_im, cplan):
    """One forward stage on a [n, B] tile: rows pair (q*2h + l*h + k)."""
    n = xr.shape[0]
    h = 1 << p
    b = xr.shape[-1]
    scale, rnd = cfg.scale, cfg.rounding == "round"
    in_w = cfg.stage_input_width(s)
    out_w = in_w + 1 - scale
    vr = xr.reshape(n // (2 * h), 2, h, b)
    vi = xi.reshape(n // (2 * h), 2, h, b)
    ar, ai = vr[:, 0], vi[:, 0]
    br, bi = vr[:, 1], vi[:, 1]
    if scale and not rnd:
        ar, ai, br, bi = ar >> 1, ai >> 1, br >> 1, bi >> 1
        sr, si = ar + br, ai + bi
        dr, di = ar - br, ai - bi
    elif scale and rnd:
        sr, si = add_round_half_up(ar, br), add_round_half_up(ai, bi)
        dr, di = sub_round_half_up(ar, br), sub_round_half_up(ai, bi)
    else:
        sr, si = ar + br, ai + bi
        dr, di = ar - br, ai - bi
    # NOTE no wrap_width here: unlike the golden model (which mirrors the
    # hardware register slices literally), the sums of two wrapped w-bit
    # operands always fit the (w+1)-bit output container ([-2^w, 2^w-1]
    # holds +-((2^(w-1)-1)+(2^(w-1))) and the scaled forms fit w bits), so
    # the wrap is the identity -- elided from the hot path, proven by the
    # bit-exactness suite across full-range stimuli.

    if p == 0:
        yr, yi = dr, di
    elif p == 1:
        # W in {1, -j}: k = 1 row -> (re, im) = (im, neg_guarded(re))
        yr = jnp.concatenate([dr[:, :1], di[:, 1:]], axis=1)
        yi = jnp.concatenate([di[:, :1], neg_guarded(dr[:, 1:])], axis=1)
    else:
        tw_r = w_re[h: 2 * h].reshape(1, h, 1)
        tw_i = w_im[h: 2 * h].reshape(1, h, 1)
        yr, yi = cmult_exact(cplan, dr, di, tw_r, tw_i)
    xr = jnp.stack([sr, yr], axis=1).reshape(n, b)
    xi = jnp.stack([si, yi], axis=1).reshape(n, b)
    return xr, xi


def _dit_stage_rows(xr, xi, cfg, s, p, w_re, w_im, cplan):
    """One inverse stage on a [n, B] tile (multiply by conj first)."""
    n = xr.shape[0]
    h = 1 << p
    b = xr.shape[-1]
    scale, rnd = cfg.scale, cfg.rounding == "round"
    in_w = cfg.stage_input_width(s)
    out_w = in_w + 1 - scale
    vr = xr.reshape(n // (2 * h), 2, h, b)
    vi = xi.reshape(n // (2 * h), 2, h, b)
    ar, ai = vr[:, 0], vi[:, 0]
    br, bi = vr[:, 1], vi[:, 1]
    if p == 0:
        bwr, bwi = br, bi
    elif p == 1:
        bwr = jnp.concatenate([br[:, :1], neg_guarded(bi[:, 1:])], axis=1)
        bwi = jnp.concatenate([bi[:, :1], br[:, 1:]], axis=1)
    else:
        tw_r = w_re[h: 2 * h].reshape(1, h, 1)
        tw_i = w_im[h: 2 * h].reshape(1, h, 1)
        bwr, bwi = cmult_exact(cplan, br, bi, tw_r, tw_i, conj=True)
    if scale and not rnd:
        oar = (ar >> 1) + (bwr >> 1)
        oai = (ai >> 1) + (bwi >> 1)
        obr = (ar >> 1) - (bwr >> 1)
        obi = (ai >> 1) - (bwi >> 1)
    elif scale and rnd:
        oar, oai = add_round_half_up(ar, bwr), add_round_half_up(ai, bwi)
        obr, obi = sub_round_half_up(ar, bwr), sub_round_half_up(ai, bwi)
    else:
        oar, oai = ar + bwr, ai + bwi
        obr, obi = ar - bwr, ai - bwi
    # wrap elided: identity by the containment argument above
    xr = jnp.stack([oar, obr], axis=1).reshape(n, b)
    xi = jnp.stack([oai, obi], axis=1).reshape(n, b)
    return xr, xi


def _transform_rows(xr, xi, cfg, inverse, w_re, w_im, cplans, tw_epi=None):
    """Raw staged transform of a [n, B] tile (shared kernel body).

    Order contract — exactly the raw ``int_fftNk``/``int_ifftNk`` cores:
    forward consumes natural rows, emits **bit-reversed** rows; inverse
    consumes bit-reversed rows, emits natural.  Reordering to/from natural
    is a separate row permutation applied by XLA outside the kernel (the
    analog of the reference's standalone ``int_bitrev_order`` buffer) —
    Mosaic cannot gather across vregs along the sublane axis, and the pair
    composition doesn't need the reorder at all.
    """
    if cfg.bypass_fly:
        return xr, xi
    stage = _dit_stage_rows if inverse else _dif_stage_rows
    for s in range(cfg.stages):
        p = cfg.stage_twiddle_order(s, inverse)
        xr, xi = stage(xr, xi, cfg, s, p, w_re, w_im, cplans.get(s))
    if tw_epi is not None:
        er, ei, eplan = tw_epi
        xr, xi = cmult_exact(eplan, xr, xi, er, ei)
    return xr, xi


# ---------------------------------------------------------- wide (>32 bit)

def _wide_cplans(cfg: FFTConfig, inverse: bool):
    plans = {}
    for s in range(cfg.stages):
        p = cfg.stage_twiddle_order(s, inverse)
        if p >= 2:
            in_w = cfg.stage_input_width(s)
            dw = in_w if inverse else in_w + 1 - cfg.scale
            plans[s] = WideCmultPlan(data_width=dw,
                                     twiddle_width=cfg.twiddle_width,
                                     shift=cfg.twiddle_shift)
    return plans


def _stage_rows_wide(xr, xi, cfg, s, p, w_re, w_im, wplan, inverse):
    """One stage on a wide [n, B] tile; xr/xi are (lo, hi) plane pairs.
    Row algebra identical to ``_dif_stage_rows``/``_dit_stage_rows``;
    arithmetic from ``ops.wideint`` (the double/triple-DSP-tier analog)."""
    n = xr[0].shape[0]
    h = 1 << p
    b = xr[0].shape[-1]
    scale, rnd = cfg.scale, cfg.rounding == "round"

    def view(w):
        return tuple(pl_.reshape(n // (2 * h), 2, h, b) for pl_ in w)

    def lane(v, k):
        return tuple(pl_[:, k] for pl_ in v)

    def cat(a, bb):
        # rows [:, :1] from a, [:, 1:] from bb (the k==0 twiddle exception)
        return tuple(jnp.concatenate([pa[:, :1], pb[:, 1:]], axis=1)
                     for pa, pb in zip(a, bb))

    def stack(a, bb):
        return tuple(jnp.stack([pa, pb], axis=1).reshape(n, b)
                     for pa, pb in zip(a, bb))

    vr, vi = view(xr), view(xi)
    ar, ai = lane(vr, 0), lane(vi, 0)
    br, bi = lane(vr, 1), lane(vi, 1)

    if not inverse:
        if scale and not rnd:
            ar, ai = wide_shr1(ar), wide_shr1(ai)
            br, bi = wide_shr1(br), wide_shr1(bi)
            sr, si = wide_add(ar, br), wide_add(ai, bi)
            dr, di = wide_sub(ar, br), wide_sub(ai, bi)
        elif scale and rnd:
            sr = wide_round_half_up(wide_add(ar, br))
            si = wide_round_half_up(wide_add(ai, bi))
            dr = wide_round_half_up(wide_sub(ar, br))
            di = wide_round_half_up(wide_sub(ai, bi))
        else:
            sr, si = wide_add(ar, br), wide_add(ai, bi)
            dr, di = wide_sub(ar, br), wide_sub(ai, bi)
        if p == 0:
            yr, yi = dr, di
        elif p == 1:
            yr = cat(dr, di)
            yi = cat(di, wide_neg_guarded(dr))
        else:
            tw_r = w_re[h: 2 * h].reshape(1, h, 1)
            tw_i = w_im[h: 2 * h].reshape(1, h, 1)
            yr, yi = wide_cmult(wplan, dr, di, tw_r, tw_i)
        return stack(sr, yr), stack(si, yi)

    if p == 0:
        bwr, bwi = br, bi
    elif p == 1:
        bwr = cat(br, wide_neg_guarded(bi))
        bwi = cat(bi, br)
    else:
        tw_r = w_re[h: 2 * h].reshape(1, h, 1)
        tw_i = w_im[h: 2 * h].reshape(1, h, 1)
        bwr, bwi = wide_cmult(wplan, br, bi, tw_r, tw_i, conj=True)
    if scale and not rnd:
        ar, ai = wide_shr1(ar), wide_shr1(ai)
        bwr, bwi = wide_shr1(bwr), wide_shr1(bwi)
        return (stack(wide_add(ar, bwr), wide_sub(ar, bwr)),
                stack(wide_add(ai, bwi), wide_sub(ai, bwi)))
    if scale and rnd:
        return (stack(wide_round_half_up(wide_add(ar, bwr)),
                      wide_round_half_up(wide_sub(ar, bwr))),
                stack(wide_round_half_up(wide_add(ai, bwi)),
                      wide_round_half_up(wide_sub(ai, bwi))))
    return (stack(wide_add(ar, bwr), wide_sub(ar, bwr)),
            stack(wide_add(ai, bwi), wide_sub(ai, bwi)))


class PallasWideFFTPlan:
    """Fused single-pass FFT kernel for data paths wider than 32 bits.

    Same raw-core contract and [n, B] layout as ``PallasFFTPlan``; data is
    carried as int32 limb planes (re_lo, re_hi, im_lo, im_hi) — four tile
    refs in, four out.  ``__call__`` accepts/returns host int64 arrays;
    ``apply`` composes on plane pairs inside larger jitted programs.
    """

    def __init__(self, cfg: FFTConfig, inverse: bool = False,
                 order: str = "natural", interpret: bool = False,
                 lane_tile: int = LANE_TILE):
        if cfg.n > MAX_ROWS:
            raise NotImplementedError(
                f"fused kernel supports n <= {MAX_ROWS}")
        if order not in ("natural", "bitrev"):
            raise ValueError(f"bad order {order!r}")
        self.cfg, self.inverse = cfg, inverse
        self.order, self.interpret = order, interpret
        self.lane_tile = lane_tile
        w_re, w_im = _pack_tables(cfg, inverse)
        self._wplans = _wide_cplans(cfg, inverse)
        self.consts = {"w_re": jnp.asarray(w_re), "w_im": jnp.asarray(w_im),
                       "rev": jnp.asarray(bitrev_indices(cfg.n),
                                          dtype=jnp.int32)}
        self._jitted = None

    def _kernel(self, wr_ref, wi_ref, rl_ref, rh_ref, il_ref, ih_ref,
                orl_ref, orh_ref, oil_ref, oih_ref):
        xr = (rl_ref[:], rh_ref[:])
        xi = (il_ref[:], ih_ref[:])
        wr, wi = wr_ref[:], wi_ref[:]
        if not self.cfg.bypass_fly:
            for s in range(self.cfg.stages):
                p = self.cfg.stage_twiddle_order(s, self.inverse)
                xr, xi = _stage_rows_wide(xr, xi, self.cfg, s, p, wr, wi,
                                          self._wplans.get(s), self.inverse)
        orl_ref[:], orh_ref[:] = xr
        oil_ref[:], oih_ref[:] = xi

    def apply(self, consts, xr, xi):
        """xr/xi: (lo, hi) plane pairs of [n, B] int32 tiles."""
        n, bt = self.cfg.n, self.lane_tile
        b = xr[0].shape[-1]
        data_spec = pl.BlockSpec((n, bt), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
        tab_spec = pl.BlockSpec((n, 1), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            self._kernel,
            grid=(b // bt,),
            in_specs=[tab_spec, tab_spec] + [data_spec] * 4,
            out_specs=(data_spec,) * 4,
            out_shape=(jax.ShapeDtypeStruct((n, b), jnp.int32),) * 4,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 << 20),
            interpret=self.interpret,
        )
        rev = consts["rev"]

        def take(w):
            return tuple(jnp.take(p_, rev, axis=0) for p_ in w)

        natural = self.order == "natural"
        if self.inverse and natural:
            xr, xi = take(xr), take(xi)
        rl, rh, il, ih = out(consts["w_re"], consts["w_im"],
                             xr[0], xr[1], xi[0], xi[1])
        yr, yi = (rl, rh), (il, ih)
        if not self.inverse and natural:
            yr, yi = take(yr), take(yi)
        return yr, yi

    def __call__(self, x_re, x_im):
        """x_re/x_im: [n, B] host integer arrays; returns np.int64."""
        if self._jitted is None:
            self._jitted = jax.jit(self.apply)
        xr = wide_from_i64_np(np.asarray(x_re))
        xi = wide_from_i64_np(np.asarray(x_im))
        yr, yi = self._jitted(self.consts, xr, xi)
        return wide_to_i64_np(yr), wide_to_i64_np(yi)


class PallasFFTPlan:
    """Fused single-pass FFT kernel for n <= MAX_ROWS.

    Layout ``nb``: input/output [n, B] (transform along rows, batch in
    lanes) — the native layout, zero transposes.  Layout ``bn``: [B, n]
    arrays are corner-turned by XLA around the fused kernel.
    B must be a multiple of LANE_TILE (pad host-side).

    ``order`` — spectrum ordering on the external side (the time side is
    always natural):  "natural" applies the bit-reversal row permutation
    with an XLA gather outside the kernel (the reference's
    ``int_bitrev_order`` buffer as a separate component); "bitrev" skips
    it — the raw core contract, free, and what the FFT->IFFT pair uses
    (DIF output order == DIT input order, ``int_fft_ifft_pair``).
    """

    def __init__(self, cfg: FFTConfig, inverse: bool = False,
                 layout: str = "nb", order: str = "natural",
                 interpret: bool = False, lane_tile: int = LANE_TILE):
        if cfg.n > MAX_ROWS:
            raise NotImplementedError(
                f"fused kernel supports n <= {MAX_ROWS}; use "
                f"LargeFFTPlan / FourStepPlan for n = {cfg.n}")
        if cfg.output_width > 32:
            raise NotImplementedError("output width > 32 bits")
        if layout not in ("nb", "bn"):
            raise ValueError(f"bad layout {layout!r}")
        if order not in ("natural", "bitrev"):
            raise ValueError(f"bad order {order!r}")
        self.cfg, self.inverse = cfg, inverse
        self.layout, self.order, self.interpret = layout, order, interpret
        self.lane_tile = lane_tile
        w_re, w_im = _pack_tables(cfg, inverse)
        self._cplans = _cmult_plans(cfg, inverse)
        # device arrays threaded through jit as arguments — never closure
        # constants (HLO constants are re-uploaded per dispatch on
        # remote-tunnel backends; measured ~50x slowdown)
        self.consts = {"w_re": jnp.asarray(w_re), "w_im": jnp.asarray(w_im),
                       "rev": jnp.asarray(bitrev_indices(cfg.n),
                                          dtype=jnp.int32)}
        self._jitted = None

    def _kernel(self, wr_ref, wi_ref, xr_ref, xi_ref, or_ref, oi_ref):
        yr, yi = _transform_rows(xr_ref[:], xi_ref[:], self.cfg,
                                 self.inverse, wr_ref[:], wi_ref[:],
                                 self._cplans)
        or_ref[:] = yr
        oi_ref[:] = yi

    def apply(self, consts, xr, xi):
        """Traceable core over a [n, B] tile in the native row layout;
        ``consts`` = ``self.consts`` threaded through the enclosing jit."""
        n, bt = self.cfg.n, self.lane_tile
        b = xr.shape[-1]
        grid = (b // bt,)
        data_spec = pl.BlockSpec((n, bt), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
        tab_spec = pl.BlockSpec((n, 1), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
        flops = 10 * n * (self.cfg.stages + 1) * b
        # in+out (re,im) + per-stage temps (Mosaic stack-allocates the
        # intermediate stage arrays); measured need is ~25 tile-sized
        # buffers for the 10-stage kernel — give generous headroom, the
        # physical VMEM is far above the 16 MiB default limit
        vmem_need = 64 << 20
        out = pl.pallas_call(
            self._kernel,
            grid=grid,
            in_specs=[tab_spec, tab_spec, data_spec, data_spec],
            out_specs=(data_spec, data_spec),
            out_shape=(jax.ShapeDtypeStruct((n, b), jnp.int32),
                       jax.ShapeDtypeStruct((n, b), jnp.int32)),
            cost_estimate=pl.CostEstimate(
                flops=flops, bytes_accessed=16 * n * b,
                transcendentals=0),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(vmem_need, 100 << 20)),
            interpret=self.interpret,
        )
        w_re, w_im, rev = consts["w_re"], consts["w_im"], consts["rev"]
        natural = self.order == "natural"
        if self.inverse:
            if natural:  # DIT wants bit-reversed rows in
                xr = jnp.take(xr, rev, axis=0)
                xi = jnp.take(xi, rev, axis=0)
            return out(w_re, w_im, xr, xi)
        yr, yi = out(w_re, w_im, xr, xi)
        if natural:      # DIF emits bit-reversed rows
            yr = jnp.take(yr, rev, axis=0)
            yi = jnp.take(yi, rev, axis=0)
        return yr, yi

    def _apply_layout(self, consts, xr, xi):
        if self.layout == "bn":
            xr, xi = xr.T, xi.T
        yr, yi = self.apply(consts, xr, xi)
        if self.layout == "bn":
            yr, yi = yr.T, yi.T
        return yr, yi

    def __call__(self, x_re, x_im):
        xr = jnp.asarray(x_re, jnp.int32)
        xi = jnp.asarray(x_im, jnp.int32)
        shp = (xr.shape[1], xr.shape[0]) if self.layout == "bn" else xr.shape
        if xr.ndim != 2 or shp[0] != self.cfg.n:
            raise ValueError(f"expected [n={self.cfg.n}, B] tile, got "
                             f"{shp}")
        if shp[-1] % self.lane_tile:
            raise ValueError(f"batch {shp[-1]} must be a multiple of "
                             f"{self.lane_tile} (pad host-side)")
        if self._jitted is None:
            self._jitted = jax.jit(self._apply_layout)
        return self._jitted(self.consts, xr, xi)


class LargeFFTPlan:
    """Single-chip large-n FFT: two fused Pallas passes + one XLA corner
    turn (the in-chip four-step; numerics identical to
    ``golden.four_step.four_step_int``).

    Natural-order input [n] (or [B, n]); natural-order output.  The
    inter-factor twiddle multiply is fused into pass 1's epilogue; pass 2's
    row-major output is already X[k2*n1+k1] so no final transpose exists.
    """

    def __init__(self, cfg: FFTConfig, n1: int | None = None,
                 n2: int | None = None, inverse: bool = False,
                 interpret: bool = False):
        n = cfg.n
        if n1 is None or n2 is None:
            # balanced split with both factors <= MAX_ROWS, n2 >= 128 lanes
            l = cfg.stages
            l2 = max(7, l // 2)
            n2 = 1 << l2
            n1 = n >> l2
        if n1 * n2 != n or n1 > MAX_ROWS or n2 > MAX_ROWS:
            raise ValueError(f"bad factors {n1}x{n2} for n={n}")
        if cfg.data_width > 32:
            raise NotImplementedError(
                "LargeFFTPlan input is raw int32 samples (width <= 32); "
                "wider data paths arise internally and escalate to the "
                "wide kernels automatically")
        self.cfg, self.n1, self.n2, self.inverse = cfg, n1, n2, inverse

        cfg1 = dataclasses.replace(cfg, n=n1)
        w1 = cfg1.output_width
        cfg2 = dataclasses.replace(cfg, n=n2, data_width=w1)
        self.out_width = cfg2.output_width
        #: Either pass escalates to the wide limb-plane kernel when its
        #: data path exceeds 32 bits (the double/triple-DSP tier analog).
        self.wide1 = w1 > 32
        self.wide2 = cfg2.output_width > 32

        rev1 = bitrev_indices(n1)
        rev2 = bitrev_indices(n2)
        # Both passes run in the raw (bit-reversed-spectrum) core order —
        # zero data gathers inside the pipeline:
        #  * pass 1's reorder is folded into the twiddle-epilogue table
        #    (raw row i holds k1 = rev1[i], so table row i uses rev1[i]),
        #  * pass 2's reorder + pass 1's lane order are undone by the ONE
        #    final indexed copy below (XLA gather at HBM bandwidth).
        if self.wide1:
            self._p1 = PallasWideFFTPlan(cfg1, inverse=inverse,
                                         order="bitrev", interpret=interpret)
            eplan = WideCmultPlan(data_width=w1,
                                  twiddle_width=cfg.twiddle_width,
                                  shift=cfg.twiddle_shift, out_width=w1)
        else:
            self._p1 = PallasFFTPlan(cfg1, inverse=inverse, layout="nb",
                                     order="bitrev", interpret=interpret)
            eplan = CmultPlan(data_width=w1, twiddle_width=cfg.twiddle_width,
                              shift=cfg.twiddle_shift, out_width=w1)
        wc_re, wc_im = circle_twiddles_int(n, cfg.twiddle_width,
                                           cfg.twiddle_gen)
        if inverse:
            # inverse DIT cores emit natural rows — no folding anywhere
            m = (-np.arange(n1)[:, None] * np.arange(n2)[None, :]) % n
        else:
            # forward raw row i holds k1 = rev1[i]
            m = (rev1[:, None] * np.arange(n2)[None, :]) % n
        self._eplan = eplan

        if self.wide2:
            self._p2 = PallasWideFFTPlan(cfg2, inverse=inverse,
                                         order="bitrev", interpret=interpret)
        else:
            self._p2 = PallasFFTPlan(cfg2, inverse=inverse, layout="nb",
                                     order="bitrev", interpret=interpret)
        # all device tables ride the jit parameter pytree (see PallasFFTPlan)
        self.consts = {
            "p1": self._p1.consts, "p2": self._p2.consts,
            "er": jnp.asarray(wc_re[m], jnp.int32),
            "ei": jnp.asarray(wc_im[m], jnp.int32),
            "rev1": jnp.asarray(rev1, jnp.int32),
            "rev2": jnp.asarray(rev2, jnp.int32),
        }
        self._run = None

    def apply(self, consts, xr, xi):
        """[B, n] -> [B, n]; the transform batch rides the lane dimension
        alongside the four-step columns (lanes = B*n2 in pass 1, B*n1 in
        pass 2), so one dispatch carries the whole batch."""
        n, n1, n2 = self.cfg.n, self.n1, self.n2
        rev1, rev2 = consts["rev1"], consts["rev2"]
        nb = xr.shape[0]

        # plane-generic plumbing: a value is a tuple of int32 planes —
        # 1-tuple on the narrow path, (lo, hi) on the wide path
        def tmap(f, *vs):
            return tuple(f(*ps) for ps in zip(*vs))

        a_r, a_i = (xr,), (xi,)
        if self.wide1:
            a_r, a_i = wide_from_i32(xr), wide_from_i32(xi)
        # [B, n1, n2] -> rows n1, lanes (B, n2)
        turn1 = lambda p: p.reshape(nb, n1, n2).transpose(1, 0, 2)
        a_r, a_i = tmap(turn1, a_r), tmap(turn1, a_i)
        if self.inverse:
            # inverse pass-1 kernel wants bit-reversed rows (raw DIT core)
            a_r = tmap(lambda p: jnp.take(p, rev1, axis=0), a_r)
            a_i = tmap(lambda p: jnp.take(p, rev1, axis=0), a_i)
        # pass 1: column transforms, raw k1 row order
        flat1 = lambda p: p.reshape(n1, nb * n2)
        a_r, a_i = tmap(flat1, a_r), tmap(flat1, a_i)
        if self.wide1:
            b_r, b_i = self._p1.apply(consts["p1"], a_r, a_i)
        else:
            br_, bi_ = self._p1.apply(consts["p1"], a_r[0], a_i[0])
            b_r, b_i = (br_,), (bi_,)
        # twiddle W_N^(+-row*col) broadcast over the batch lane group
        shp1 = lambda p: p.reshape(n1, nb, n2)
        b_r, b_i = tmap(shp1, b_r), tmap(shp1, b_i)
        er = consts["er"][:, None, :]
        ei = consts["ei"][:, None, :]
        if self.wide1:
            b_r, b_i = wide_cmult(self._eplan, b_r, b_i, er, ei)
        else:
            br_, bi_ = cmult_exact(self._eplan, b_r[0], b_i[0], er, ei)
            b_r, b_i = (br_,), (bi_,)
        # corner turn (XLA): rows n2, lanes (B, k1_raw)
        turn2 = lambda p: p.transpose(2, 1, 0)
        c_r, c_i = tmap(turn2, b_r), tmap(turn2, b_i)
        if self.inverse:
            c_r = tmap(lambda p: jnp.take(p, rev2, axis=0), c_r)
            c_i = tmap(lambda p: jnp.take(p, rev2, axis=0), c_i)
        flat2 = lambda p: p.reshape(n2, nb * n1)
        c_r, c_i = tmap(flat2, c_r), tmap(flat2, c_i)
        if self.wide2 and not self.wide1:
            # pass-1 output fits int32; widen planes for the wide core
            c_r, c_i = wide_from_i32(c_r[0]), wide_from_i32(c_i[0])
        if self.wide2:
            d_r, d_i = self._p2.apply(consts["p2"], c_r, c_i)
        else:
            dr_, di_ = self._p2.apply(consts["p2"], c_r[0], c_i[0])
            d_r, d_i = (dr_,), (di_,)
        shp2 = lambda p: p.reshape(n2, nb, n1)
        d_r, d_i = tmap(shp2, d_r), tmap(shp2, d_i)
        if not self.inverse:
            # forward: D is [k2_raw, B, k1_raw] -- one final indexed copy:
            # X[b, k2*n1 + k1] = D[rev2[k2], b, rev1[k1]]
            unrev = lambda p: jnp.take(jnp.take(p, rev2, axis=0), rev1,
                                       axis=2)
            d_r, d_i = tmap(unrev, d_r), tmap(unrev, d_i)
        # inverse: both passes emitted natural rows already
        final = lambda p: p.transpose(1, 0, 2).reshape(nb, n)
        d_r, d_i = tmap(final, d_r), tmap(final, d_i)
        if self.wide2:
            return d_r, d_i
        return d_r[0], d_i[0]

    def __call__(self, x_re, x_im):
        """x: [n] or [B, n] integer natural order (input width <= 32).
        Returns int32 device arrays, or np.int64 when the output path is
        wider than 32 bits."""
        xr = np.asarray(x_re) if self.wide2 else jnp.asarray(x_re, jnp.int32)
        xi = np.asarray(x_im) if self.wide2 else jnp.asarray(x_im, jnp.int32)
        single = xr.ndim == 1
        if single:
            xr, xi = xr[None], xi[None]
        if xr.ndim != 2 or xr.shape[-1] != self.cfg.n:
            raise ValueError(f"expected [B, n={self.cfg.n}], got {xr.shape}")
        if self._run is None:
            self._run = jax.jit(self.apply)
        if self.wide2:
            xr = jnp.asarray(xr.astype(np.int64).astype(np.int32))
            xi = jnp.asarray(xi.astype(np.int64).astype(np.int32))
        yr, yi = self._run(self.consts, xr, xi)
        if self.wide2:
            yr, yi = wide_to_i64_np(yr), wide_to_i64_np(yi)
        return (yr[0], yi[0]) if single else (yr, yi)
