"""Roofline accounting for the integer FFT kernels.

The reference documents per-component resource/latency budgets as its
static "profile" (e.g. ``int_cmult_dbl18_dsp48.vhd:37-38``: 5 DSP / 6 cy);
the TPU analog is a cost model per kernel against the chip's VPU-op and
HBM-byte ceilings, used by the benchmark harness to report achieved
roofline fraction (BASELINE.md: >= 90 % on the butterfly kernel).
"""

from __future__ import annotations

import dataclasses


#: Per-generation ceilings (vector int32 ops/s and HBM bytes/s).  VPU ops:
#: lanes * sublanes * ALUs * clock.  Values are public-spec estimates used
#: only for normalization; refresh per deployment if exact SKUs differ.
TPU_SPECS = {
    # gen:     (int32 Top/s, HBM TB/s)
    "v4":      (1.1e12, 1.2e12),
    "v5e":     (0.9e12, 0.8e12),
    "v5p":     (1.8e12, 2.8e12),
    "v6e":     (1.8e12, 1.6e12),
    "v7":      (7.0e12, 7.4e12),
}


def device_sync_fetch(x):
    """Force true device completion by fetching one scalar to the host.

    ``jax.block_until_ready`` is NOT a reliable synchronization point on
    remote-relay backends (measured: it returns in ~0.1 ms while the
    device is still executing); a host fetch is."""
    import numpy as np
    import jax
    return np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0])


def marginal_time(make_loop, consts, state, k_lo: int = 8, k_hi: int = 32,
                  reps: int = 4) -> float:
    """Marginal per-iteration device time of a chained computation.

    ``make_loop(K)`` returns a jitted fn(consts, state) that applies the
    computation K times IN-GRAPH (lax.scan) and returns a scalar.  The
    per-iteration time is (T(k_hi) - T(k_lo)) / (k_hi - k_lo): dispatch
    latency, sync round-trips, and any fixed per-call overhead cancel —
    the only honest timing on a remote-tunnel backend."""
    import time

    lo, hi = make_loop(k_lo), make_loop(k_hi)

    def timed(fn):
        device_sync_fetch(fn(consts, state))          # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            device_sync_fetch(fn(consts, state))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (timed(hi) - timed(lo)) / (k_hi - k_lo)


def measure_ceilings(nbytes: int = 1 << 28):
    """Empirically calibrate (int32 ops/s, HBM bytes/s) on the local device.

    Device labels can undersell the hardware (tunnelled backends report
    generic kinds), so the honest roofline denominator is measured
    speed-of-light, with the in-graph chained methodology of
    ``marginal_time`` (per-dispatch sync costs ~25 ms on relay backends
    and must cancel out).  Returns (ops_ceiling, bw_ceiling).
    """
    import jax
    import jax.numpy as jnp

    a = jnp.ones((nbytes // 4 // 8192, 8192), jnp.int32)
    b = jnp.ones((1024, 8192), jnp.int32)       # 32 MB compute operand

    def mk_bw(K):
        @jax.jit
        def loop(consts, x):
            def body(c, _):
                return c + 1, None
            c, _ = jax.lax.scan(body, x, None, length=K)
            return c[0, 0]
        return loop

    def mk_ops(K):
        @jax.jit
        def loop(consts, x):
            def body(c, _):
                # data-dependent multiplies: an affine chain (c*3+1) gets
                # algebraically folded by XLA into two ops — measured
                # 20 "Top/s" on a ~2 Top/s VPU — so multiply by (c | 1)
                for _ in range(64):
                    c = c * (c | 1) + 1
                return c, None
            c, _ = jax.lax.scan(body, x, None, length=K)
            return c[0, 0]
        return loop

    dt_bw = marginal_time(mk_bw, None, a, k_lo=4, k_hi=16)
    bw_ceil = 2 * a.size * 4 / dt_bw
    dt_ops = marginal_time(mk_ops, None, b, k_lo=4, k_hi=16)
    # 64 x (or, mul, add) per element per pass, minus the HBM time
    mem_t = 2 * b.size * 4 / bw_ceil
    ops_ceil = 192 * b.size / max(dt_ops - mem_t, 1e-9)
    return ops_ceil, bw_ceil


@dataclasses.dataclass(frozen=True)
class KernelCost:
    """Static cost of one kernel invocation."""

    int_ops: float        # vector int32 operations
    hbm_bytes: float      # bytes moved HBM<->VMEM

    def time_bound(self, gen="v5e") -> float:
        """Lower-bound runtime (s): max of compute and memory time.

        ``gen``: a TPU_SPECS key, or a measured ``(ops/s, bytes/s)`` tuple
        from ``measure_ceilings()``."""
        ops_ceil, bw_ceil = TPU_SPECS[gen] if isinstance(gen, str) else gen
        return max(self.int_ops / ops_ceil, self.hbm_bytes / bw_ceil)


def fft_cost(n: int, batch: int, fused: bool = True,
             ops_per_sample_stage: float = 22.0) -> KernelCost:
    """Cost of a batched n-point integer FFT.

    ops_per_sample_stage: measured VPU ops per complex sample per stage of
    the fused kernel (butterfly add/sub + shared twiddle multiply + wrap;
    the default reflects the 16x16-bit single-limb tier — wider configs
    scale with the limb count like the reference's DSP tiers).
    ``fused=True``: data crosses HBM once each way (the Pallas kernel);
    ``False``: once per stage each way (the staged XLA path).
    """
    import math

    stages = int(math.log2(n))
    samples = n * batch
    ops = samples * stages * ops_per_sample_stage
    passes = 2 if fused else 2 * stages
    hbm = samples * 8 * passes          # int32 re+im per direction
    return KernelCost(int_ops=ops, hbm_bytes=hbm)


def large_fft_cost(n: int, batch: int,
                   ops_per_sample_stage: float = 22.0,
                   itemsize: int = 4) -> KernelCost:
    """Cost of the fused two-pass large-n pipeline (LargeFFTPlan).

    Three device ops end to end: pass-1 kernel (read+write), pass-2
    kernel (read+write), one reorder gather (read+write) — 6 HBM
    crossings of 2*itemsize B per complex sample (itemsize 2 on the
    int16 fast path).  Epilogue-table reads are amortized over the batch
    grid (blocks revisit) and ignored.  Compute: every one of the
    log2(n) stages runs in-VMEM, plus one epilogue complex multiply
    (counted as one extra stage).
    """
    import math

    stages = int(math.log2(n))
    samples = n * batch
    ops = samples * (stages + 1) * ops_per_sample_stage
    return KernelCost(int_ops=ops, hbm_bytes=samples * 2 * itemsize * 6)


def roofline_fraction(measured_s: float, cost: KernelCost,
                      gen: str = "v5e") -> float:
    """Achieved fraction of the roofline bound (1.0 = at the ceiling)."""
    return cost.time_bound(gen) / measured_s
