"""Distributed overlap-save FFT convolution — halo-exchange parallelism.

The neighbor-exchange ("ring") communication shape of SURVEY §2.8: a long
signal is sharded into contiguous chunks over a mesh axis; every block of
n = L + M - 1 samples needs the M-1 samples preceding it, so each shard
receives its predecessor's tail via one ``jax.lax.ppermute`` hop (ICI
neighbor exchange) per call.  All arithmetic is the exact integer pipeline
of the host oracle ``golden.convolve.overlap_save_int`` — forward unscaled
block FFT, renormalized frequency product, scaled inverse FFT — and the
device result is bit-identical to it (tests/test_convolve.py).

Mesh-less operation (``mesh=None``) runs the same plan on one device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..golden.convolve import ConvSpec, taps_spectrum_int
from ..ops.intmath import CmultPlan, cmult_exact
from ..ops.transform import FFTPlan
from .mesh import FFT_AXIS


class OverlapSaveConv:
    """Streaming integer FIR convolution by overlap-save.

    taps: integer arrays (h_re, h_im) of length spec.taps_len.  The taps
    spectrum is precomputed host-side (exact integer FFT) — the analog of
    the reference precomputing twiddle ROMs at elaboration.

    Call with x_re, x_im of shape [..., T]; T must divide into payload
    blocks across the mesh: T % (L * n_devices) == 0 for the sharded path
    (pad host-side; ``golden.convolve`` documents the semantics).  Returns
    the first T samples of the causal linear convolution, scaled by
    2^-spec.scale_log2.
    """

    def __init__(self, spec: ConvSpec, h_re, h_im, mesh: Mesh | None = None,
                 axis: str = FFT_AXIS):
        self.spec = spec
        self.mesh, self.axis = mesh, axis
        hr, hi = taps_spectrum_int(np.asarray(h_re), np.asarray(h_im), spec)
        self.fwd = FFTPlan(spec.fft_cfg)
        self.inv = FFTPlan(spec.ifft_cfg, inverse=True)
        # device tables ride the jit parameter pytree (never jit closures)
        self.consts = {"hr": jnp.asarray(hr, jnp.int32),
                       "hi": jnp.asarray(hi, jnp.int32),
                       "fwd": self.fwd.consts, "inv": self.inv.consts}
        self._cplan = CmultPlan(data_width=spec.fft_cfg.output_width,
                                twiddle_width=spec.spectrum_width,
                                shift=spec.product_shift,
                                out_width=spec.product_width)
        self._jit = None

    # ----------------------------------------------------------- block math

    def _blocks(self, xr, xi, tail_r, tail_i, consts):
        """[..., C] chunk + [..., M-1] predecessor tail -> conv chunk."""
        spec = self.spec
        n, m, lpay = spec.n, spec.taps_len, spec.payload
        c = xr.shape[-1]
        nb = c // lpay
        er = jnp.concatenate([tail_r, xr], axis=-1)
        ei = jnp.concatenate([tail_i, xi], axis=-1)
        # overlapping windows [..., nb, n] (static gather indices)
        idx = (np.arange(nb)[:, None] * lpay + np.arange(n)[None, :])
        br, bi = er[..., idx], ei[..., idx]
        fr, fi = self.fwd.apply(consts["fwd"], br, bi)
        pr, pi = cmult_exact(self._cplan, fr, fi, consts["hr"], consts["hi"])
        yr, yi = self.inv.apply(consts["inv"], pr, pi)
        shp = xr.shape[:-1]
        return (yr[..., m - 1:].reshape(shp + (c,)),
                yi[..., m - 1:].reshape(shp + (c,)))

    def _local_sharded(self, xr, xi, consts):
        """Per-shard program: halo from the left neighbor via ppermute."""
        m = self.spec.taps_len
        d = self.mesh.shape[self.axis]
        perm = [(i, i + 1) for i in range(d - 1)]  # device 0 receives zeros
        tr = jax.lax.ppermute(xr[..., -(m - 1):], self.axis, perm)
        ti = jax.lax.ppermute(xi[..., -(m - 1):], self.axis, perm)
        return self._blocks(xr, xi, tr, ti, consts)

    # --------------------------------------------------------------- public

    def __call__(self, x_re, x_im):
        spec = self.spec
        if self._jit is None:
            if self.mesh is None:
                def run(xr, xi, consts):
                    zh = jnp.zeros(xr.shape[:-1] + (spec.taps_len - 1,),
                                   jnp.int32)
                    return self._blocks(xr, xi, zh, zh, consts)
                self._jit = jax.jit(run)
            else:
                nb = jnp.ndim(x_re) - 1
                io = P(*(None,) * nb, self.axis)
                # P() is a spec-prefix replicating the consts subtree
                self._jit = jax.jit(jax.shard_map(
                    self._local_sharded, mesh=self.mesh,
                    in_specs=(io, io, P()), out_specs=(io, io)))
        xr = jnp.asarray(x_re, jnp.int32)
        xi = jnp.asarray(x_im, jnp.int32)
        t = xr.shape[-1]
        blk = spec.payload * (self.mesh.shape[self.axis] if self.mesh else 1)
        if t % blk:
            raise ValueError(f"signal length {t} must be a multiple of "
                             f"payload*devices = {blk} (pad host-side)")
        return self._jit(xr, xi, self.consts)
