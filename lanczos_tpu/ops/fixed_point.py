"""Vectorized HLS-faithful fixed-point path (int32 XLA ops).

Bit-exact reconstruction of the reference hardware pipeline's observable
output, validated against the literal stream simulator
(``lanczos_tpu.ref.hls_sim``).  The streaming machine (cyclic line buffer,
quantized step predicate, zero pre-roll, saturate/replicate edges —
``worker.cpp``, ``cyclic_buffer.h``) is flattened host-side into static
gather/LUT index tables by :func:`lanczos_tpu.core.weights.hls_schedule`;
on device the whole pipeline is 2·2a masked gathers + integer MACs:

- vertical MACs are exact in units of 2^-P (byte × P-frac weight);
- horizontal products have 2P fractional bits and are truncated to P per
  MAC (ap_fixed AP_TRN assignment, ``worker.cpp:91-97``) via arithmetic
  shift;
- both passes apply the dering clamp against the two central window taps
  (``worker.cpp:64-75, 101-112``);
- the final byte conversion drops fractional bits (``worker.cpp:118-130``).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from lanczos_tpu.core.config import ResampleConfig
from lanczos_tpu.core.weights import HLSSchedule, hls_lut, hls_schedule


@dataclasses.dataclass
class HLSOps:
    """Device-resident tables for one HLS-faithful 2D upscale."""

    cfg: ResampleConfig
    # vertical
    v_eff: jnp.ndarray  # (OH, 2a) int32
    v_w: jnp.ndarray  # (OH, 2a) int32 — LUT values gathered host-side
    v_valid: jnp.ndarray  # (OH, 2a) int32 mask
    # horizontal
    h_eff: jnp.ndarray
    h_w: jnp.ndarray
    h_valid: jnp.ndarray

    @classmethod
    def build(cls, cfg: ResampleConfig, lut_mode: str = "fp64") -> "HLSOps":
        from lanczos_tpu.core.config import reduced_scale

        P = cfg.bit_precision
        (in_h, in_w), (out_h, out_w) = cfg.in_shape, cfg.out_shape
        n_v, _ = reduced_scale(in_h, out_h)
        n_h, _ = reduced_scale(in_w, out_w)
        lut_v = hls_lut(cfg.a, n_v, P, lut_mode)
        lut_h = hls_lut(cfg.a, n_h, P, lut_mode)
        sv: HLSSchedule = hls_schedule(in_h, out_h, cfg.a, P)
        sh: HLSSchedule = hls_schedule(in_w, out_w, cfg.a, P)
        if sv.lut_overflow or sh.lut_overflow:
            import warnings

            warnings.warn(
                "HLS schedule indexes past the a*N ROM for this scale "
                "(a latent out-of-bounds in the reference hardware, "
                "core/weights.py lut_overflow); the clipped LUT used "
                "here may not match real hardware's undefined OOB read",
                RuntimeWarning,
                stacklevel=2,
            )
        return cls(
            cfg=cfg,
            v_eff=jnp.asarray(sv.eff_idx),
            v_w=jnp.asarray(lut_v[sv.lut_idx].astype(np.int32)),
            v_valid=jnp.asarray(sv.valid.astype(np.int32)),
            h_eff=jnp.asarray(sh.eff_idx),
            h_w=jnp.asarray(lut_h[sh.lut_idx].astype(np.int32)),
            h_valid=jnp.asarray(sh.valid.astype(np.int32)),
        )


def _clamp_central(acc, taps_list, a, scale_lo=0):
    c0, c1 = taps_list[a - 1], taps_list[a]
    lo = jnp.minimum(c0, c1) << scale_lo
    hi = jnp.maximum(c0, c1) << scale_lo
    return jnp.clip(acc, lo, hi)


def hls_vertical_pass(x, eff, w, valid, a: int, P: int, axis: int):
    """Vertical HLS pass: int32 (..., H, ...) → num units 2^-P.

    Exact P-frac accumulation (byte × P-frac weight) + central-tap dering
    clamp (worker.cpp:45-78).  ``eff``/``w``/``valid`` are (OUT, 2a) rows
    of the flattened stream schedule; indices must already be local to x.
    """
    taps = 2 * a

    def bshape(v):
        shape = [1] * x.ndim
        shape[axis] = -1
        return v.reshape(shape)

    vals = []
    acc = None
    for j in range(taps):
        v = jnp.take(x, eff[:, j], axis=axis) * bshape(valid[:, j])
        vals.append(v)
        term = bshape(w[:, j]) * v
        acc = term if acc is None else acc + term
    return _clamp_central(acc, vals, a, scale_lo=P)


def hls_horizontal_pass(mid, eff, w, valid, a: int, P: int, axis: int):
    """Horizontal HLS pass: num units → uint8; per-MAC truncation of
    2P-frac products to P frac (worker.cpp:91-97) + dering + byte clamp."""
    taps = 2 * a

    def bshape(v):
        shape = [1] * mid.ndim
        shape[axis] = -1
        return v.reshape(shape)

    vals = []
    acc = None
    for j in range(taps):
        v = jnp.take(mid, eff[:, j], axis=axis) * bshape(valid[:, j])
        vals.append(v)
        term = (bshape(w[:, j]) * v) >> P
        acc = term if acc is None else acc + term
    out = _clamp_central(acc, vals, a, scale_lo=0)
    return ((out >> P) & 0xFF).astype(jnp.uint8)


def hls_upscale_xla(img: jnp.ndarray, ops: HLSOps) -> jnp.ndarray:
    """(..., H, W, C) uint8 → (..., OH, OW, C) uint8, HLS-path bit-exact."""
    cfg = ops.cfg
    a, P = cfg.a, cfg.bit_precision
    h_axis, w_axis = img.ndim - 3, img.ndim - 2
    x = img.astype(jnp.int32)
    mid = hls_vertical_pass(x, ops.v_eff, ops.v_w, ops.v_valid, a, P, h_axis)
    return hls_horizontal_pass(
        mid, ops.h_eff, ops.h_w, ops.h_valid, a, P, w_axis
    )
