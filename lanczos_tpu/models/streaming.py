"""Row-streaming execution: unbounded image height under bounded memory.

The reference's entire reason for existing is processing an unbounded row
stream while holding only a 2a-row window + one tile (<4 MB budget,
``worker.h:140-142``, ``cyclic_buffer.h:63``).  This module is that
capability at TPU scale: output rows are produced in fixed-size chunks,
each computed from just the input-row window it needs (band start
``⌊y·D/N⌋−a+1`` … band end ``+a``), so device memory is bounded by the
chunk, not the frame.  The per-chunk index rebasing is the analog of the
reference's ``seek_write_index``/``curr_offset`` phase bookkeeping
(``worker.cpp:199-202``) and makes execution restartable at any output row
(checkpoint/resume, SURVEY.md §5).

All chunks share one compiled kernel: the banded gather tables are sliced
per chunk host-side and passed as same-shaped device arrays, so chunk k and
chunk k+1 hit the same jit cache entry.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lanczos_tpu.core.config import Order, Precision, ResampleConfig
from lanczos_tpu.core.weights import banded_weights
from lanczos_tpu.ops.resample_xla import apply_banded, quantize_uint8


class StreamingUpscaler:
    """Chunked 2D resample: full-width horizontal pass, row-chunked vertical.

    ``chunk_rows`` is the number of OUTPUT rows per device step (rounded up
    to a multiple of the vertical phase count N so every chunk shares one
    weight layout).
    """

    def __init__(
        self,
        cfg: ResampleConfig,
        chunk_rows: int = 512,
        dtype=jnp.float32,
    ):
        if cfg.precision == Precision.FIXED or cfg.c_faithful:
            raise NotImplementedError(
                "streaming supports the precise float paths only"
            )
        self.cfg = cfg
        self.dtype = dtype
        n, d = cfg.scale_h
        self.chunk = max(n, -(-min(chunk_rows, cfg.out_shape[0]) // n) * n)
        coord = "exact"
        self.op_v = banded_weights(
            cfg.in_shape[0], cfg.out_shape[0], cfg.a, cfg.filter,
            cfg.edge_mode, cfg.normalize, coord_mode=coord,
            align=cfg.align.value,
        )
        self.op_h = banded_weights(
            cfg.in_shape[1], cfg.out_shape[1], cfg.a, cfg.filter,
            cfg.edge_mode, cfg.normalize, coord_mode=coord,
            align=cfg.align.value,
        )
        self.idx_h = jnp.asarray(self.op_h.idx)
        self.w_h = jnp.asarray(self.op_h.weights, dtype)
        # uniform input-window size for every chunk (static jit shape)
        oh = cfg.out_shape[0]
        self.n_chunks = -(-oh // self.chunk)
        lo = np.minimum.reduce(self.op_v.idx, axis=1)
        hi = np.maximum.reduce(self.op_v.idx, axis=1)
        spans = []
        for k in range(self.n_chunks):
            y0, y1 = k * self.chunk, min((k + 1) * self.chunk, oh)
            spans.append((int(lo[y0:y1].min()), int(hi[y0:y1].max()) + 1))
        self.spans = spans
        self.win = max(b - a for a, b in spans)
        # shift-FMA chunk path (the fast device formulation): needs the
        # phase pattern chunk-invariant and height-first linear semantics
        from lanczos_tpu.models.upscaler import _shift_eligible

        ih = cfg.in_shape[0]
        self.use_shift = (
            _shift_eligible(cfg)
            and self.chunk % n == 0
            and cfg.order == Order.HEIGHT_FIRST
            and ih % d == 0
        )
        if self.use_shift:
            from lanczos_tpu.ops.resample_shift_xla import ShiftOps

            self.shift = ShiftOps(cfg, dtype)
            m = self.chunk // n
            self.win = m * d + 2 * self.shift.sup_v
            # unpadded input row origin of chunk k: k·m·d − sup_v
            self.w0_step = m * d
            self._fn = jax.jit(self._chunk_fn_shift)
        else:
            self._fn = jax.jit(self._chunk_fn)

    def _chunk_fn(self, rows, idx_v, w_v):
        """rows: (win, W, C) input window; idx_v rebased to the window."""
        x = rows.astype(self.dtype)
        cfg = self.cfg
        if cfg.order == Order.WIDTH_FIRST:
            x = apply_banded(x, self.idx_h, self.w_h, 1, dering=cfg.dering)
            if cfg.intermediate_quantize:
                x = quantize_uint8(x, self.dtype)
            out = apply_banded(x, idx_v, w_v, 0, dering=cfg.dering)
        else:
            x = apply_banded(x, idx_v, w_v, 0, dering=cfg.dering)
            if cfg.intermediate_quantize:
                x = quantize_uint8(x, self.dtype)
            out = apply_banded(x, self.idx_h, self.w_h, 1, dering=cfg.dering)
        return quantize_uint8(out)

    def _chunk_fn_shift(self, rows):
        """rows: (win, W, C) window already carrying the vertical support
        pad (real neighbor rows interiorly, edge-mode rows at frame ends)."""
        from lanczos_tpu.ops.resample_shift_xla import _axis_shift_pass

        cfg = self.cfg
        sh = self.shift
        x = rows.astype(self.dtype)
        x = _axis_shift_pass(
            x, sh.nv, sh.dv, sh.sup_v, sh.tbl_v, 0, cfg.dering, sh.off_v
        )
        x = jnp.pad(x, [(0, 0), (sh.sup_h, sh.sup_h), (0, 0)], mode=sh.pad_mode)
        x = _axis_shift_pass(
            x, sh.nh, sh.dh, sh.sup_h, sh.tbl_h, 1, cfg.dering, sh.off_h
        )
        return quantize_uint8(x)

    def chunks(
        self,
        get_rows: Callable[[int, int], np.ndarray],
        start_chunk: int = 0,
    ) -> Iterator[Tuple[int, np.ndarray]]:
        """Yield (y0, chunk_output) pairs; resume via ``start_chunk``.

        ``get_rows(lo, hi)`` must return input rows [lo, hi) as
        (hi-lo, W, C) uint8 — from RAM, disk, or a decoder.
        """
        oh = self.cfg.out_shape[0]
        ih = self.cfg.in_shape[0]
        for k in range(start_chunk, self.n_chunks):
            y0, y1 = k * self.chunk, min((k + 1) * self.chunk, oh)
            if self.use_shift:
                s = self.shift.sup_v
                w0 = k * self.w0_step - s  # unpadded origin (may be < 0)
                w1 = w0 + self.win
                lo2, hi2 = max(w0, 0), min(w1, ih)
                rows = np.asarray(get_rows(lo2, hi2))
                top, bot = lo2 - w0, w1 - hi2
                if top or bot:
                    mode = {
                        "edge": "edge", "constant": "constant",
                        "reflect": "reflect",
                    }[self.shift.pad_mode]
                    rows = np.pad(
                        rows,
                        [(top, bot)] + [(0, 0)] * (rows.ndim - 1),
                        mode=mode,
                    )
                out = self._fn(jnp.asarray(rows))
                yield y0, np.asarray(out)[: y1 - y0]
                continue
            lo, hi = self.spans[k]
            hi_pad = lo + self.win  # uniform window: pad by repeating last row
            rows = get_rows(lo, min(hi_pad, self.cfg.in_shape[0]))
            if rows.shape[0] < self.win:
                pad = np.repeat(rows[-1:], self.win - rows.shape[0], axis=0)
                rows = np.concatenate([rows, pad], axis=0)
            # rebase global tap indices into the window; pad chunk rows to
            # self.chunk (tail chunk) with row 0 (output discarded)
            idx = self.op_v.idx[y0:y1] - lo
            w = self.op_v.weights[y0:y1]
            if idx.shape[0] < self.chunk:
                padn = self.chunk - idx.shape[0]
                idx = np.concatenate([idx, np.zeros((padn, idx.shape[1]), idx.dtype)])
                w = np.concatenate([w, np.zeros((padn, w.shape[1]), w.dtype)])
            out = self._fn(
                jnp.asarray(rows),
                jnp.asarray(idx),
                jnp.asarray(w, self.dtype),
            )
            yield y0, np.asarray(out)[: y1 - y0]

    def __call__(self, img: np.ndarray) -> np.ndarray:
        """Whole-frame convenience wrapper over :meth:`chunks`."""
        img = np.asarray(img)
        oh, ow = self.cfg.out_shape
        out = np.empty((oh, ow, img.shape[-1]), dtype=np.uint8)
        for y0, chunk in self.chunks(lambda lo, hi: img[lo:hi]):
            out[y0 : y0 + chunk.shape[0]] = chunk
        return out
