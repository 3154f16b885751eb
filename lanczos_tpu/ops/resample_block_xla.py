"""Blocked banded-matmul resampling — the MXU path for arbitrary scales.

The reference's phase LUT handles any reduced N/D uniformly
(``kernel.cpp:50-59``); on TPU the analogous uniform formulation is the
banded operator ``out = R · x`` applied as a *blocked dense* matmul:

- Output rows are tiled in blocks of ``T``.  A block's tap windows cover a
  contiguous input span of ``S ≈ T·D/N + 2a`` rows, so the whole block is
  one dense ``(T × S) · (S × width)`` matmul — an MXU shape — with the
  band's weights scattered into a per-tile ``(T, S)`` dense matrix at
  build time (zeros elsewhere).
- Unlike the shift-FMA path (``resample_shift_xla.py``, N ≤ 32 phases) or
  the fused Pallas kernel, nothing here depends on N: a 1920→2001 resize
  (N=667) costs the same as 2×.  The FLOP overhead vs the ideal 2a-tap
  stencil is ``S/(2a)`` (~20× at 2× upscale), which the MXU absorbs.
- Edge modes, drop+normalize, per-phase weights, and alignment are all
  pre-resolved inside the scattered weights (duplicate clamped indices
  accumulate), so every *linear* config is eligible — this path replaces
  the gather fallback for drop+normalize and arbitrary-N configs
  (round-1 verdict items 3–4).  The (nonlinear) dering clamp is applied
  on top from two extra tap gathers.
- Both passes run axis-native einsums (no whole-image transpose): the
  horizontal pass contracts over gathered width-tiles in place.

Precision: f32 weights and accumulation by default (within 1 LSB of the
gather path; the einsums are a small fraction of the runtime, so the bf16
MXU rate isn't the lever here).  ``Precision.BF16`` (or ``mxu_split=True``)
switches to bf16 matmuls with *split* operands accumulating in f32 —
weights split hi/lo, a float intermediate split hi/lo with the ``lo·w_lo``
term (≲2⁻³²) dropped — the same trick as the Pallas kernel
(``resample_pallas.py:341-366``).
"""

from __future__ import annotations

import string
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lanczos_tpu.core.config import Order, Precision, ResampleConfig
from lanczos_tpu.core.weights import BandedOperator, banded_weights
from lanczos_tpu.ops.resample_xla import quantize_uint8


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


class _AxisBlock:
    """Blocked dense form of one axis' banded operator."""

    def __init__(self, op: BandedOperator, tile: int = 256, lane_pad: int = 8):
        out, taps = op.idx.shape
        self.out_size = out
        self.in_size = op.in_size
        T = min(tile, _pad_to(out, 8))
        n_tiles = -(-out // T)
        out_pad = n_tiles * T

        idx = op.idx.astype(np.int64)
        w = op.weights
        base = np.empty(n_tiles, np.int64)
        span = 0
        for t in range(n_tiles):
            rows = slice(t * T, min((t + 1) * T, out))
            base[t] = idx[rows].min()
            span = max(span, int(idx[rows].max() - base[t]) + 1)
        S = min(_pad_to(span, lane_pad), op.in_size)
        # pull bases back so every [base, base+S) window is in bounds —
        # avoids padding the whole image (the weight scatter below uses the
        # adjusted bases, so block columns just shift right)
        base = np.clip(base, 0, op.in_size - S)

        Wt = np.zeros((n_tiles, T, S), np.float64)
        rows = np.arange(out)
        tt = rows // T
        rr = rows % T
        for j in range(taps):
            np.add.at(Wt, (tt, rr, idx[:, j] - base[tt]), w[:, j])
        # tile t reads the contiguous input span base[t] .. base[t]+S-1
        # (static starts → XLA slices, far cheaper than a row gather)
        self.base = [int(b) for b in base]
        self.T, self.S, self.n_tiles, self.out_pad = T, S, n_tiles, out_pad
        self.weights64 = Wt
        self.idx = jnp.asarray(op.idx)  # for the dering tap gathers
        self.taps = taps

    def tables(self, split: bool, dtype):
        if split:
            hi = jnp.asarray(self.weights64, jnp.bfloat16)
            lo = jnp.asarray(
                self.weights64 - np.asarray(hi, np.float64), jnp.bfloat16
            )
            return hi, lo
        return jnp.asarray(self.weights64, dtype), None


def _block_pass(x, axis: int, blk: _AxisBlock, tables, dering: bool,
                exact_input: bool):
    """Apply the blocked operator along ``axis`` of x (uint8 or float32;
    values are exact integers when ``exact_input``)."""
    axis = axis % x.ndim
    w_hi, w_lo = tables
    # stack the tiles' contiguous spans: (..., tiles, S, ...) at `axis`
    xt = jnp.stack(
        [
            jax.lax.slice_in_dim(x, b, b + blk.S, axis=axis)
            for b in blk.base
        ],
        axis=axis,
    )
    if exact_input and w_lo is not None:
        xt = xt.astype(jnp.bfloat16)  # exact for uint8-range integers
    else:
        xt = xt.astype(jnp.float32)

    letters = [c for c in string.ascii_lowercase if c not in "tos"]
    pre = "".join(letters[: axis])
    post = "".join(letters[axis : axis + (x.ndim - 1 - axis)])
    rhs = f"{pre}ts{post}"
    out_sub = f"{pre}to{post}"
    eq = f"tos,{rhs}->{out_sub}"

    def mm(w, v):
        # "highest" pins true-f32 contraction on TPU (the default lowers
        # f32 dots to reduced-precision passes: 2-3 LSB drift) — and
        # measures *faster* than default on the dev chip
        return jnp.einsum(
            eq, w, v, preferred_element_type=jnp.float32,
            precision="highest" if v.dtype == jnp.float32 else None,
        )

    if w_lo is None:
        out = mm(w_hi, xt)
    elif exact_input:
        out = mm(w_hi, xt) + mm(w_lo, xt)  # xt already bf16-exact
    else:
        x_hi = xt.astype(jnp.bfloat16)
        x_lo = (xt - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out = mm(w_hi, x_hi) + (mm(w_lo, x_hi) + mm(w_hi, x_lo))
    shape = list(x.shape)
    shape[axis] = blk.out_pad
    out = out.reshape(shape)
    if blk.out_pad != blk.out_size:
        sl = [slice(None)] * out.ndim
        sl[axis] = slice(0, blk.out_size)
        out = out[tuple(sl)]
    if dering:
        a = blk.taps // 2
        c0 = jnp.take(x, blk.idx[:, a - 1], axis=axis).astype(out.dtype)
        c1 = jnp.take(x, blk.idx[:, a], axis=axis).astype(out.dtype)
        out = jnp.clip(out, jnp.minimum(c0, c1), jnp.maximum(c0, c1))
    return out


class BlockOps:
    """Device-resident blocked operators for one config (any linear path)."""

    def __init__(
        self,
        cfg: ResampleConfig,
        dtype=jnp.float32,
        tile: int = 256,
        mxu_split: Optional[bool] = None,
    ):
        if cfg.precision == Precision.FIXED or cfg.c_faithful:
            raise NotImplementedError(
                "block path covers linear float configs only"
            )
        self.cfg = cfg
        self.dtype = (
            jnp.bfloat16 if cfg.precision == Precision.BF16 else dtype
        )
        if mxu_split is None:
            # measured on the dev chip: plain f32 einsums beat the 2-3
            # split-bf16 matmuls here (the matmuls are ~0.03 ms either way;
            # the extra casts/adds dominate) — split only pays in BF16 mode
            mxu_split = False
        self.split = bool(mxu_split) or self.dtype == jnp.bfloat16
        self.op_v = banded_weights(
            cfg.in_shape[0], cfg.out_shape[0], cfg.a, cfg.filter,
            cfg.edge_mode, cfg.normalize, coord_mode="exact",
            align=cfg.align.value,
        )
        self.op_h = banded_weights(
            cfg.in_shape[1], cfg.out_shape[1], cfg.a, cfg.filter,
            cfg.edge_mode, cfg.normalize, coord_mode="exact",
            align=cfg.align.value,
        )
        self.blk_v = _AxisBlock(self.op_v, tile)
        self.blk_h = _AxisBlock(self.op_h, tile)
        self.wv = self.blk_v.tables(self.split, self.dtype)
        self.wh = self.blk_h.tables(self.split, self.dtype)


def resample_2d_block(img: jnp.ndarray, ops: BlockOps) -> jnp.ndarray:
    """Separable 2D resample of (..., H, W, C) via blocked matmuls."""
    cfg = ops.cfg
    was_int = jnp.issubdtype(img.dtype, jnp.integer)
    compute = jnp.float32
    x = img  # passes slice the raw (possibly uint8) array and widen tiles
    h_axis, w_axis = img.ndim - 3, img.ndim - 2

    def vpass(v, exact):
        return _block_pass(v, h_axis, ops.blk_v, ops.wv, cfg.dering, exact)

    def hpass(v, exact):
        return _block_pass(v, w_axis, ops.blk_h, ops.wh, cfg.dering, exact)

    def maybe_q(v):
        return quantize_uint8(v, compute) if cfg.intermediate_quantize else v

    exact0 = bool(was_int)
    exact1 = cfg.intermediate_quantize
    if cfg.order == Order.WIDTH_FIRST:
        x = vpass(maybe_q(hpass(x, exact0)), exact1)
    else:
        x = hpass(maybe_q(vpass(x, exact0)), exact1)

    if was_int or cfg.intermediate_quantize:
        return quantize_uint8(x)
    return x.astype(ops.dtype)  # match the gather/shift backends' dtype
