"""On-chip tuning sweeps (run on real TPU; takes minutes of chip time).

Sweeps the structural knobs the plans resolve from ``ops.tuning``:

* batch_block (bk) of the whole-fused 64k kernel,
* lane_tile of the SPLIT two-pass pipeline at 1M (beyond the VMEM knee
  the whole kernel cannot cover — lane_tile only matters there),
* lane_tile of the split wide (4-plane) pipeline at 64k
  (``fuse="split"`` forced: the wide whole kernel is also VMEM-feasible
  at 64k, so the split sweep isolates the lane-tile knob).

Results feed ``ops.tuning.TUNINGS`` (measured=True annotations).

Usage:  python tools/sweep_tuning.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def _bench(plan, batch, n, k_lo=4, k_hi=12, blocks=False):
    """``blocks=True``: time the streaming block path (``apply_blocks``,
    square factors only — output blocks feed back as inputs)."""
    import jax
    import jax.numpy as jnp
    from intfftk_tpu.utils.roofline import marginal_time

    rng = np.random.default_rng(0)
    dt16 = jnp.int16 if getattr(plan, "io16", False) else jnp.int32
    shape = (batch,) + plan.block_in_shape if blocks else (batch, n)
    xr = jnp.asarray(rng.integers(-16384, 16384, shape), dt16)
    xi = jnp.asarray(rng.integers(-16384, 16384, shape), dt16)

    ap = plan.apply_blocks if blocks else plan.apply

    def step(consts, s):
        (yr, *_), (yi, *_) = ap(consts, (s[0],), (s[1],))
        return (yr, yi)

    def mk(K):
        @jax.jit
        def loop(c, s):
            def body(cur, _):
                return step(c, cur), None
            out, _ = jax.lax.scan(body, s, None, length=K)
            return jax.tree_util.tree_leaves(out)[0].reshape(-1)[0]
        return loop

    dt = marginal_time(mk, plan.consts, (xr, xi), k_lo=k_lo, k_hi=k_hi)
    return batch * n / dt / 1e6


def main():
    from intfftk_tpu.config import FFTConfig
    from intfftk_tpu.ops.pallas_fft import LargeFFTPlan

    print("== whole-fused 64k: batch_block sweep (batch 64) ==")
    cfg = FFTConfig(n=1 << 16, data_width=16, twiddle_width=16,
                    mode="scaled", rounding="round")
    for bk in (1, 2, 4, 8):
        t0 = time.time()
        plan = LargeFFTPlan(cfg, interpret=False, batch_block=bk)
        msps = _bench(plan, 64, cfg.n, k_lo=8, k_hi=72, blocks=True)
        print(f"bk={bk}: {msps:.0f} Msps  ({time.time()-t0:.0f}s)",
              flush=True)

    print("== split 1M: lane_tile sweep (batch 4) ==")
    cfg = FFTConfig(n=1 << 20, data_width=16, twiddle_width=16,
                    mode="scaled", rounding="round")
    for lt in (256, 512, 1024):
        t0 = time.time()
        plan = LargeFFTPlan(cfg, interpret=False, lane_tile=lt)
        assert not plan.fused_whole
        msps = _bench(plan, 4, cfg.n)
        print(f"lane_tile={lt}: {msps:.0f} Msps  ({time.time()-t0:.0f}s)",
              flush=True)

    print("== split wide 64k unscaled-32: lane_tile sweep (batch 8) ==")
    cfg = FFTConfig(n=1 << 16, data_width=32, twiddle_width=16,
                    mode="unscaled")
    for lt in (128, 256, 512):
        t0 = time.time()
        plan = LargeFFTPlan(cfg, interpret=False, lane_tile=lt,
                            fuse="split")
        msps = _bench(plan, 8, cfg.n)
        print(f"lane_tile={lt}: {msps:.0f} Msps  ({time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
