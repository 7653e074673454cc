"""Benchmark harness — emits ONE JSON line with the headline metric.

Headline: complex Msamples/s/chip at the 64k-point integer FFT
(BASELINE.md north star), measured on the default JAX backend (the real
TPU chip when present; --smoke runs a tiny interpreted config on CPU).

vs_baseline: the reference publishes no absolute throughput (BASELINE.json
published = {}); its architectural rate is 2 complex samples/clock —
1000 Msamples/s at a representative 500 MHz Ultrascale+ clock, which we use
as the comparison denominator.

Usage:  python bench.py [--smoke] [--all]
  --smoke   tiny CPU-interpret run (CI plumbing check)
  --all     also print per-config lines (channelizer, roundtrip, ...) to
            stderr; the single stdout line stays the headline metric
"""

import json
import sys
import time

import numpy as np

REF_MSPS = 1000.0  # 2 samples/clk @ 500 MHz, the reference's design point


def _bench(fn, args, iters=20, warmup=3):
    """Time steady-state device execution: inputs are placed on the device
    once (the streaming runtime keeps data resident; per-call host
    transfers would measure the host link, not the chip)."""
    import jax
    args = [jax.device_put(a) for a in args]
    jax.block_until_ready(args)
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_64k(interpret=False):
    """64k-point scaled int16 FFT, batched over lanes via the two-pass
    fused Pallas pipeline: Msamples/s."""
    from intfftk_tpu.config import FFTConfig
    from intfftk_tpu.ops.pallas_fft import LargeFFTPlan

    cfg = FFTConfig(n=1 << 16, mode="scaled", rounding="round",
                    data_width=16, twiddle_width=16)
    plan = LargeFFTPlan(cfg, interpret=interpret)
    rng = np.random.default_rng(0)
    xr = rng.integers(-(1 << 14), 1 << 14, cfg.n).astype(np.int32)
    xi = rng.integers(-(1 << 14), 1 << 14, cfg.n).astype(np.int32)
    dt = _bench(plan, (xr, xi))
    return cfg.n / dt / 1e6


def bench_channelizer(interpret=False, n=1024, channels=1024):
    """n-point FFT over a big channel batch (fused kernel): Msamples/s."""
    from intfftk_tpu.config import FFTConfig
    from intfftk_tpu.ops.pallas_fft import PallasFFTPlan

    cfg = FFTConfig(n=n, mode="scaled", rounding="round")
    plan = PallasFFTPlan(cfg, layout="nb", interpret=interpret)
    rng = np.random.default_rng(0)
    xr = rng.integers(-(1 << 14), 1 << 14, (n, channels)).astype(np.int32)
    xi = rng.integers(-(1 << 14), 1 << 14, (n, channels)).astype(np.int32)
    dt = _bench(plan, (xr, xi))
    return n * channels / dt / 1e6


def main():
    smoke = "--smoke" in sys.argv
    all_ = "--all" in sys.argv
    if smoke:
        import jax
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
        msps = bench_channelizer(interpret=True, n=64, channels=128)
        print(json.dumps({"metric": "smoke_64pt_msps", "value": round(msps, 3),
                          "unit": "Msamples/s", "vs_baseline": round(
                              msps / REF_MSPS, 6)}))
        return
    msps = bench_64k()
    if all_:
        ch = bench_channelizer()
        print(f"channelizer 1024pt x 1024ch: {ch:.1f} Msamples/s",
              file=sys.stderr)
    print(json.dumps({
        "metric": "fft64k_int16_msamples_per_sec_per_chip",
        "value": round(msps, 1),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / REF_MSPS, 3),
    }))


if __name__ == "__main__":
    main()
