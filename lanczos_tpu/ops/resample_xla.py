"""Separable resampling as XLA ops (the portable non-Pallas compute path).

The banded operator ``out[y] = Σ_j w[y,j] · x[idx[y,j]]`` is applied as 2a
row-gathers + fused multiply-adds — a pure VPU/memory workload XLA fuses
well.  This is the correctness backbone and the fallback backend; the Pallas
kernels (ops/resample_pallas.py) implement the same contract with explicit
VMEM staging for speed.

The optional dering clamp reproduces the reference's FSR-inspired
anti-ringing step: clamp the accumulator to the [min, max] of the two
central taps (``worker.cpp:64-75``).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from lanczos_tpu.core.config import Order, ResampleConfig
from lanczos_tpu.core.weights import BandedOperator, banded_weights


def quantize_uint8(x: jnp.ndarray, dtype=jnp.uint8) -> jnp.ndarray:
    """The oracle's double→uint8 rule: saturate then truncate toward zero
    (``full_TB.h:29-37``)."""
    return jnp.trunc(jnp.clip(x, 0.0, 255.0)).astype(dtype)


def _axis_shape(v: jnp.ndarray, ndim: int, axis: int):
    shape = [1] * ndim
    shape[axis] = -1
    return v.reshape(shape)


def apply_banded(
    x: jnp.ndarray,
    idx: jnp.ndarray,
    w: jnp.ndarray,
    axis: int,
    a: Optional[int] = None,
    dering: bool = False,
) -> jnp.ndarray:
    """Apply a banded operator along ``axis``.

    x: any float array; idx (out, 2a) int32; w (out, 2a) float.
    """
    axis = axis % x.ndim
    taps = idx.shape[1]
    acc = None
    for j in range(taps):
        term = _axis_shape(w[:, j], x.ndim, axis) * jnp.take(x, idx[:, j], axis=axis)
        acc = term if acc is None else acc + term
    if dering:
        if a is None:
            a = taps // 2
        c0 = jnp.take(x, idx[:, a - 1], axis=axis)
        c1 = jnp.take(x, idx[:, a], axis=axis)
        acc = jnp.clip(acc, jnp.minimum(c0, c1), jnp.maximum(c0, c1))
    return acc


class SeparableOps:
    """Device-resident banded operators for one (config-fixed) 2D resample."""

    def __init__(self, cfg: ResampleConfig, dtype=jnp.float32):
        coord = "c_double" if cfg.c_faithful else "exact"
        self.cfg = cfg
        self.dtype = dtype
        self.op_v: BandedOperator = banded_weights(
            cfg.in_shape[0], cfg.out_shape[0], cfg.a, cfg.filter,
            cfg.edge_mode, cfg.normalize, coord_mode=coord,
            align=cfg.align.value,
        )
        self.op_h: BandedOperator = banded_weights(
            cfg.in_shape[1], cfg.out_shape[1], cfg.a, cfg.filter,
            cfg.edge_mode, cfg.normalize, coord_mode=coord,
            align=cfg.align.value,
        )
        self.idx_v = jnp.asarray(self.op_v.idx)
        self.w_v = jnp.asarray(self.op_v.weights, dtype)
        self.idx_h = jnp.asarray(self.op_h.idx)
        self.w_h = jnp.asarray(self.op_h.weights, dtype)


def resample_2d_xla(img: jnp.ndarray, ops: SeparableOps) -> jnp.ndarray:
    """Separable 2D resample of (..., H, W, C) per the ops' config.

    Returns uint8 if the input was uint8 (or intermediate_quantize is on),
    else the float dtype.
    """
    cfg = ops.cfg
    was_int = jnp.issubdtype(img.dtype, jnp.integer)
    x = img.astype(ops.dtype)
    h_axis, w_axis = img.ndim - 3, img.ndim - 2

    def vpass(v):
        # dering clamps against the BAND's central taps (taps//2 inside
        # apply_banded) — for antialiased downscales support > a, so
        # passing cfg.a here would pick off-center taps
        return apply_banded(v, ops.idx_v, ops.w_v, h_axis, dering=cfg.dering)

    def hpass(v):
        return apply_banded(v, ops.idx_h, ops.w_h, w_axis, dering=cfg.dering)

    def maybe_q(v):
        return quantize_uint8(v, ops.dtype) if cfg.intermediate_quantize else v

    if cfg.c_faithful:
        # the fp64-sequential truncation semantics are NOT reproducible in
        # float32 (see ops/c_exact.py, which the Upscaler routes to)
        raise NotImplementedError("c_faithful requires ops.c_exact.CExactOps")

    if cfg.order == Order.WIDTH_FIRST:
        x = maybe_q(hpass(x))
        x = vpass(x)
    else:
        x = maybe_q(vpass(x))
        x = hpass(x)

    if was_int or cfg.intermediate_quantize:
        return quantize_uint8(x)
    return x
