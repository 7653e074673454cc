"""Compiled-artifact op audit — counts the vector ALU ops of the ACTUAL
Mosaic module jax ships to the chip, not the traced jaxpr.

Round 4 left three roofline numbers spanning 0.838-1.014 (VERDICT r4
Weak #1); a calibrated fraction above 1.0 proves the cost model wrong:
either the jaxpr-traced numerator (``utils.roofline.audit_kernel_ops``,
165.25 ops/sample at 64k) counts ops Mosaic folds, or the probe-chain
denominator under-measures.  This tool removes the model: it intercepts
``jax._src.tpu_custom_call._lower_mosaic_module_to_asm`` to capture the
exact MLIR module serialized into the TPU custom call, canonicalizes it
locally (the same canonicalization is the first thing the server-side
Mosaic pipeline runs), and counts every elementwise ``arith``/``vector``
op — in raw elements AND in physically-executed vregs (ceil-padded to
the (8, 128) int32 tile, the VPU's true issue granularity).

Applying the SAME counter to the ceiling-probe kernels
(``tools/probe_vpu.py`` chains, whose op budgets were hand-counted)
makes numerator and denominator commensurable: the roofline fraction
becomes (mosaic_vreg_ops / sample) / (mosaic-counted probe ceiling),
with no hand count anywhere.

Usage:
  python tools/audit_mosaic.py            audit the headline 64k kernel
  python tools/audit_mosaic.py --probes   also audit the probe chains
"""

from __future__ import annotations

import contextlib
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

#: elementwise arith/vector ops that execute as one VPU op per vreg
ALU_OPS = frozenset([
    "arith.addi", "arith.subi", "arith.muli",
    "arith.shli", "arith.shrsi", "arith.shrui",
    "arith.andi", "arith.ori", "arith.xori",
    "arith.cmpi", "arith.select", "arith.maxsi", "arith.minsi",
    "arith.remsi", "arith.divsi",
])
#: dtype conversions — vreg-granular, VPU-issued, but often fused or
#: free (pack/unpack units); tracked separately
CAST_OPS = frozenset([
    "arith.trunci", "arith.extsi", "arith.extui", "arith.bitcast",
    "tpu.pack_subelements", "tpu.unpack_subelements",
])
#: data movement / relayout — sublane shuffles, transposes, broadcasts
MOVE_OPS = frozenset([
    "vector.transpose", "tpu.transpose", "vector.shape_cast",
    "vector.broadcast", "vector.extract", "vector.insert",
    "vector.extract_strided_slice", "vector.insert_strided_slice",
    "tpu.roll", "tpu.dynamic_rotate", "tpu.rotate", "tpu.gather",
    "tpu.dynamic_gather", "tpu.repeat", "tpu.concatenate", "tpu.iota",
    "vector.shuffle", "tpu.sublane_shuffle", "vector.splat",
])
#: memory ops
MEM_OPS = frozenset([
    "vector.load", "vector.store", "tpu.load", "tpu.store",
    "tpu.strided_load", "tpu.strided_store", "memref.load",
    "memref.store",
])


def _vec_shape(t):
    """Vector shape of an MLIR type string, or None for scalars."""
    s = str(t)
    if not s.startswith("vector<"):
        return None
    body = s[len("vector<"):-1]
    dims = body.split("x")[:-1]          # last piece is the elem type
    try:
        return tuple(int(d) for d in dims)
    except ValueError:
        return tuple()                    # scalable/dynamic — treat 1


def _elem_bits(t):
    s = str(t)
    for w in (64, 32, 16, 8):
        if s.endswith(f"i{w}>") or s.endswith(f"i{w}"):
            return w
    return 32


def _padded_elems(shape, bits=32):
    """Physically-executed lane slots for a vector of ``shape``: vregs
    (minor two dims ceil-padded to the native (8*32/bits, 128) tile,
    leading dims multiplying) times the elems one vreg holds.  Equals
    prod(shape) for tile-aligned shapes; larger when sub-tile shapes
    waste sublanes/lanes.  Scalars count 1."""
    if not shape:
        return 1
    sub = 8 * 32 // bits
    epv = sub * 128
    if len(shape) == 1:
        return math.ceil(shape[0] / 128) * epv
    lead = 1
    for d in shape[:-2]:
        lead *= d
    vregs = lead * math.ceil(shape[-2] / sub) * math.ceil(shape[-1] / 128)
    return vregs * epv


class Counts(dict):
    def add(self, cls, name, elems, vregs, mul):
        e, v, c = self.setdefault(cls, {}).setdefault(name, [0, 0, 0])
        self[cls][name] = [e + elems * mul, v + vregs * mul, c + mul]

    def total(self, cls, idx=0):
        return sum(v[idx] for v in self.get(cls, {}).values())


def _walk(op, counts: Counts, mul: int = 1):
    name = op.operation.name
    if name == "scf.for":
        # trip count from constant bounds (our kernels' only loops are
        # fori_loops with static bounds); fall back to 1 with a warning
        trip = 1
        try:
            lo, hi, step = (op.operation.operands[i] for i in range(3))

            def cval(v):
                o = v.owner
                attr = o.attributes["value"]
                return int(str(attr).split(":")[0].split("=")[-1])
            trip = (cval(hi) - cval(lo)) // max(1, cval(step))
        except Exception:
            print(f"WARNING: non-constant scf.for bounds; weighting 1",
                  file=sys.stderr)
        for r in op.operation.regions:
            for b in r.blocks:
                for inner in b.operations:
                    _walk(inner, counts, mul * trip)
        return
    for r in op.operation.regions:
        for b in r.blocks:
            for inner in b.operations:
                _walk(inner, counts, mul)
    if not op.operation.results:
        if name in MEM_OPS:
            counts.add("mem", name, 0, 0, mul)
        return
    t = op.operation.results[0].type
    shape = _vec_shape(t)
    elems = int(np.prod(shape)) if shape else 1
    vregs = _padded_elems(shape, _elem_bits(t)) if shape is not None else 1
    if name in ALU_OPS:
        counts.add("alu", name, elems, vregs, mul)
    elif name in CAST_OPS:
        counts.add("cast", name, elems, vregs, mul)
    elif name in MOVE_OPS:
        counts.add("move", name, elems, vregs, mul)
    elif name in MEM_OPS:
        counts.add("mem", name, elems, vregs, mul)
    elif name.startswith(("arith.", "vector.", "tpu.", "math.")) and \
            name not in ("arith.constant", "vector.step", "arith.index_cast",
                         "arith.index_castui"):
        counts.add("other", name, elems, vregs, mul)


@contextlib.contextmanager
def capture_mosaic_modules():
    """Intercept the exact Mosaic modules serialized into TPU custom
    calls during lowering inside this context.  Yields a list that fills
    with ``jaxlib.mlir.ir.Module`` clones (pre-serde, post-lowering —
    the compiled artifact's source of truth)."""
    from jax._src import tpu_custom_call as tcc
    captured = []
    orig = tcc._lower_mosaic_module_to_asm

    def spy(module, **kw):
        captured.append(module)          # live module; context has all
        return orig(module, **kw)        # dialects registered

    tcc._lower_mosaic_module_to_asm = spy
    try:
        yield captured
    finally:
        tcc._lower_mosaic_module_to_asm = orig


def count_module(module) -> Counts:
    """Locally canonicalize/CSE a clone of the captured module — the
    same cleanup the server-side Mosaic pipeline front-runs, so
    trivially foldable ops (x>>0, x+0, dead values) don't inflate the
    count — then walk and classify every op."""
    from jaxlib.mlir.passmanager import PassManager
    with module.context:
        clone = module.operation.clone()
        PassManager.parse("builtin.module(canonicalize,cse)").run(clone)
        counts = Counts()
        _walk(clone, counts)
    return counts


def audit_headline(batch_block=None):
    """Capture + count the headline 64k whole-fused kernel.  Returns the
    per-sample numbers the roofline should use."""
    import jax
    import jax.numpy as jnp
    from intfftk_tpu.config import FFTConfig
    from intfftk_tpu.ops.pallas_fft import LargeFFTPlan

    cfg = FFTConfig(n=1 << 16, data_width=16, twiddle_width=16,
                    mode="scaled", rounding="round")
    kw = {} if batch_block is None else {"batch_block": batch_block}
    plan = LargeFFTPlan(cfg, interpret=False, **kw)
    assert plan.fused_whole
    bk = plan._whole.bk
    batch = 2 * bk                       # >= 2 grid steps, exact divisor
    sh = jax.ShapeDtypeStruct((batch,) + plan.block_in_shape,
                              jnp.int16 if plan.io16 else jnp.int32)

    def step(consts, xr, xi):
        (yr,), (yi,) = plan.apply_blocks(consts, (xr,), (xi,))
        return yr, yi

    with capture_mosaic_modules() as mods:
        jax.jit(step).lower(plan.consts, sh, sh)
    assert len(mods) == 1, f"expected 1 Mosaic module, got {len(mods)}"
    counts = count_module(mods[0])
    samples = cfg.n * bk                 # one grid step processes bk items
    return counts, samples, plan


def audit_probe_chain(body, k=64):
    """Count one probe chain's kernel (tools/probe_vpu.py) with the same
    counter.  Returns (alu elems, alu vregs) PER ITERATION per element —
    the honest ops/iter the measured time should be divided by."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    ROWS, LANES = 512, 512

    def kernel(x_ref, o_ref):
        o_ref[:] = jax.lax.fori_loop(0, k, lambda i, c: body(c), x_ref[:])

    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, LANES), x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    sh = jax.ShapeDtypeStruct((ROWS, LANES), jnp.int32)
    with capture_mosaic_modules() as mods:
        jax.jit(run).lower(sh)
    counts = count_module(mods[0])
    per_iter_elems = counts.total("alu", 0) / (ROWS * LANES) / k
    per_iter_padded = counts.total("alu", 1) / (ROWS * LANES) / k
    return per_iter_elems, per_iter_padded, counts


def summarize(counts: Counts, samples: int):
    out = {}
    for cls in ("alu", "cast", "move", "mem", "other"):
        if cls not in counts:
            continue
        out[cls] = {
            "elems_per_sample": round(counts.total(cls, 0) / samples, 2),
            # lane slots actually issued: sub-tile shapes pad to vregs
            "padded_elems_per_sample": round(
                counts.total(cls, 1) / samples, 2),
            "by_op": {k: {"elems_ps": round(v[0] / samples, 2),
                          "padded_ps": round(v[1] / samples, 2),
                          "count": v[2]}
                      for k, v in sorted(counts[cls].items(),
                                         key=lambda kv: -kv[1][1])},
        }
    return out


def main():
    import jax
    print(f"devices: {jax.devices()}", file=sys.stderr)
    counts, samples, plan = audit_headline()
    summary = summarize(counts, samples)
    alu_e = summary["alu"]["elems_per_sample"]
    alu_v = summary["alu"]["padded_elems_per_sample"]
    print(f"headline 64k whole-fused kernel (bk={plan._whole.bk}):",
          file=sys.stderr)
    print(f"  Mosaic ALU: {alu_e} elem-ops/sample, {alu_v} "
          f"padded-lane-slots/sample (8x128 int32 tile padding "
          f"included)", file=sys.stderr)
    from intfftk_tpu.utils.roofline import audit_kernel_ops
    jx_alu, jx_move = audit_kernel_ops(plan.cfg, plan.n1, plan.n2)
    print(f"  jaxpr audit said: {jx_alu} ALU elem-ops/sample "
          f"(delta {alu_e - jx_alu:+.2f})", file=sys.stderr)
    out = {"mosaic_alu_elems_per_sample": alu_e,
           "mosaic_alu_padded_per_sample": alu_v,
           "jaxpr_alu_per_sample": round(jx_alu, 2),
           "classes": {c: {k: v for k, v in d.items() if k != "by_op"}
                       for c, d in summary.items()},
           "top_alu": dict(list(summary["alu"]["by_op"].items())[:8]),
           "top_move": dict(list(summary.get("move", {}).get(
               "by_op", {}).items())[:8])}

    if "--probes" in sys.argv:
        sys.path.insert(0, "tools")
        from probe_vpu import _mixed7, _stage_mix10
        for nm, body, hand in (("mixed7", _mixed7, 7),
                               ("stagemix10", _stage_mix10, 10)):
            e, v, _ = audit_probe_chain(body)
            print(f"  probe {nm}: hand-counted {hand}, Mosaic "
                  f"{e:.2f} elem-ops/iter ({v:.2f} padded)",
                  file=sys.stderr)
            out[f"probe_{nm}"] = {"hand": hand, "mosaic_elems": round(e, 3),
                                  "mosaic_padded": round(v, 3)}
    if "--full" in sys.argv:
        out["full"] = summary
    print(json.dumps(out))


if __name__ == "__main__":
    main()
