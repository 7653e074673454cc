"""Benchmark harness — emits ONE JSON line with the headline metric.

Headline: complex Msamples/s/chip at the 64k-point integer FFT
(BASELINE.md north star), measured on the default JAX backend (the real
TPU chip when present; --smoke runs a tiny interpreted config on CPU).

Methodology: stimulus is generated ON the device and stays resident —
the framework's streaming runtime keeps data device-side, and in remote-
tunnel environments a per-call host transfer would measure the link, not
the chip.  Batches amortize dispatch latency the same way the streaming
executor does in production.

vs_baseline: the reference publishes no absolute throughput (BASELINE.json
published = {}); its architectural rate is 2 complex samples/clock —
1000 Msamples/s at a representative 500 MHz Ultrascale+ clock, which we use
as the comparison denominator.

Usage:  python bench.py [--smoke] [--all]
"""

import json
import sys
import time

REF_MSPS = 1000.0  # 2 samples/clk @ 500 MHz, the reference's design point


def _devdata(shape, width=15, seed=0):
    import jax
    import jax.numpy as jnp
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    lim = 1 << (width - 1)
    a = jax.random.randint(k1, shape, -lim, lim, dtype=jnp.int32)
    b = jax.random.randint(k2, shape, -lim, lim, dtype=jnp.int32)
    return jax.block_until_ready((a, b))


def _bench(fn, args, iters=20, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_64k(interpret=False, batch=64):
    """Batched 64k-point scaled int16 FFT via the two-pass fused Pallas
    pipeline: Msamples/s."""
    from intfftk_tpu.config import FFTConfig
    from intfftk_tpu.ops.pallas_fft import LargeFFTPlan

    cfg = FFTConfig(n=1 << 16, mode="scaled", rounding="round",
                    data_width=16, twiddle_width=16)
    plan = LargeFFTPlan(cfg, interpret=interpret)
    xr, xi = _devdata((batch, cfg.n))
    dt = _bench(plan, (xr, xi), iters=10)
    return batch * cfg.n / dt / 1e6


def bench_channelizer(interpret=False, n=1024, channels=4096):
    """n-point FFT over a big channel batch (fused kernel): Msamples/s."""
    from intfftk_tpu.config import FFTConfig
    from intfftk_tpu.ops.pallas_fft import PallasFFTPlan

    cfg = FFTConfig(n=n, mode="scaled", rounding="round")
    plan = PallasFFTPlan(cfg, layout="nb", interpret=interpret)
    xr, xi = _devdata((n, channels))
    dt = _bench(plan, (xr, xi), iters=10)
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
        from intfftk_tpu.utils import fft_cost, roofline_fraction
        from intfftk_tpu.utils.roofline import measure_ceilings
        ch = bench_channelizer()
        cost = fft_cost(1024, 4096, fused=True)
        ceil = measure_ceilings()
        frac = roofline_fraction(1024 * 4096 / (ch * 1e6), cost, ceil)
        print(f"channelizer 1024pt x 4096ch: {ch:.1f} Msamples/s "
              f"(~{100*frac:.0f}% of measured-ceiling roofline; "
              f"device {ceil[0]/1e12:.1f} int-Top/s, {ceil[1]/1e12:.1f} TB/s)",
              file=sys.stderr)
    print(json.dumps({
        "metric": "fft64k_int16_msamples_per_sec_per_chip",
        "value": round(msps, 1),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / REF_MSPS, 3),
    }))


if __name__ == "__main__":
    main()
