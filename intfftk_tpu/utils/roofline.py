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


def measure_ceilings(nbytes: int = 1 << 27, iters: int = 30):
    """Empirically calibrate (int32 ops/s, HBM bytes/s) on the local device.

    Device labels can undersell the hardware (tunnelled backends report
    generic kinds), so the honest roofline denominator is measured
    speed-of-light: a dependency-chained elementwise pass for bandwidth and
    a multiply-chain for int32 throughput.  Returns (ops_ceiling,
    bw_ceiling) in ops/s and bytes/s.
    """
    import time

    import jax
    import jax.numpy as jnp

    n = nbytes // 4
    a = jnp.ones((n // 8192, 8192), jnp.int32)

    @jax.jit
    def bw(x):
        return x + 1

    #: 16 multiplies per element per pass keeps the chain compute-bound
    @jax.jit
    def ops(x):
        for _ in range(16):
            x = x * 3 + 1
        return x

    def chain(f, x, its):
        y = f(x)
        jax.block_until_ready(y)
        t0 = time.perf_counter()
        for _ in range(its):
            x = f(x)
        jax.block_until_ready(x)
        return (time.perf_counter() - t0) / its

    dt_bw = chain(bw, a, iters)
    dt_ops = chain(ops, a, iters)
    bw_ceil = 2 * a.size * 4 / dt_bw
    # mul+add = 2 vector ops per iteration of the inner loop
    ops_ceil = 32 * a.size / max(dt_ops - dt_bw / 2, 1e-9)
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


def roofline_fraction(measured_s: float, cost: KernelCost,
                      gen: str = "v5e") -> float:
    """Achieved fraction of the roofline bound (1.0 = at the ceiling)."""
    return cost.time_bound(gen) / measured_s
