"""Streaming block executor — the WRAP/CONT protocol analog.

The reference accepts continuous or bursty sample streams under a
``DI_EN``/``DO_VAL`` valid-strobe protocol with WRAP-mode buffers
absorbing arbitrary enable gaps (``int_fftNk.vhd:23-37``,
``int_delay_wrap.vhd``).  Under XLA's synchronous dispatch the same
capability is a host-side concern (SURVEY §2.8): this executor

* accepts arbitrary-length chunks of a channel stream (bursty producers),
* repacks them into the plan's [n, lane_tile] tiles,
* keeps up to ``depth`` dispatches in flight (JAX's async dispatch is the
  double-buffer: the host enqueues tile k+1 while the device transforms
  tile k),
* emits transformed blocks in order.

Latency/occupancy mirror the hardware contract: results appear once a
full tile of samples has arrived, and a ``flush()`` pads the tail tile
with zeros (the testbench's end-of-burst behavior).
"""

from __future__ import annotations

import collections
from typing import Iterator

import numpy as np

import jax
import jax.numpy as jnp


class StreamExecutor:
    """Feed arbitrary-size batches of transforms through a plan.

    ``plan``: any callable (x_re, x_im) -> (y_re, y_im) over [n, B] tiles
    (e.g. ``PallasFFTPlan(layout="nb")``).  ``lane_tile``: transforms per
    dispatch.  Chunks are [n, c] arrays with any c >= 1.
    """

    def __init__(self, plan, n: int, lane_tile: int = 128, depth: int = 2):
        self.plan, self.n = plan, n
        self.lane_tile = lane_tile
        self.depth = depth
        self._pend_re: list[np.ndarray] = []
        self._pend_im: list[np.ndarray] = []
        self._pending_cols = 0
        self._inflight: collections.deque = collections.deque()

    # ------------------------------------------------------------ internals

    def _dispatch(self, tile_re, tile_im, valid: int):
        yr, yi = self.plan(jnp.asarray(tile_re, jnp.int32),
                           jnp.asarray(tile_im, jnp.int32))
        self._inflight.append((yr, yi, valid))

    def _drain_ready(self, force: bool = False) -> Iterator[tuple]:
        while self._inflight and (force
                                  or len(self._inflight) >= self.depth):
            yr, yi, valid = self._inflight.popleft()
            yr = np.asarray(yr)[:, :valid]
            yi = np.asarray(yi)[:, :valid]
            yield yr, yi

    def _try_pack(self) -> Iterator[tuple]:
        bt = self.lane_tile
        while self._pending_cols >= bt:
            re = np.concatenate(self._pend_re, axis=1)
            im = np.concatenate(self._pend_im, axis=1)
            tile_re, rest_re = re[:, :bt], re[:, bt:]
            tile_im, rest_im = im[:, :bt], im[:, bt:]
            self._pend_re = [rest_re] if rest_re.shape[1] else []
            self._pend_im = [rest_im] if rest_im.shape[1] else []
            self._pending_cols = rest_re.shape[1]
            self._dispatch(tile_re, tile_im, bt)
            yield from self._drain_ready()

    # -------------------------------------------------------------- public

    def feed(self, x_re, x_im) -> Iterator[tuple]:
        """Push a chunk [n, c]; yields any completed (re, im) blocks."""
        xr = np.asarray(x_re)
        xi = np.asarray(x_im)
        if xr.ndim == 1:
            xr, xi = xr[:, None], xi[:, None]
        if xr.shape[0] != self.n:
            raise ValueError(f"chunk rows {xr.shape[0]} != n={self.n}")
        self._pend_re.append(xr)
        self._pend_im.append(xi)
        self._pending_cols += xr.shape[1]
        yield from self._try_pack()

    def flush(self) -> Iterator[tuple]:
        """Pad the tail tile with zero transforms and drain everything."""
        if self._pending_cols:
            bt = self.lane_tile
            re = np.concatenate(self._pend_re, axis=1)
            im = np.concatenate(self._pend_im, axis=1)
            valid = re.shape[1]
            pad = bt - valid
            re = np.pad(re, ((0, 0), (0, pad)))
            im = np.pad(im, ((0, 0), (0, pad)))
            self._pend_re, self._pend_im, self._pending_cols = [], [], 0
            self._dispatch(re, im, valid)
        yield from self._drain_ready(force=True)
