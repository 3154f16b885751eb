"""Fused separable resampling as a single Pallas TPU kernel.

The reference's 3-stage DATAFLOW pipeline (vertical fill ‖ horizontal fill ‖
stream-out over ping-pong tiles, ``lanczos.cpp:68-83``) maps to one fused
kernel: for each output tile, DMA the (haloed) uint8 input slab HBM→VMEM,
apply the vertical then horizontal banded operators entirely in VMEM, and
write the uint8 output tile — the float intermediate never touches HBM.

Three kernel generations live here; ``variant="auto"`` picks the best:

- **MXU variant (v3, the production path)**: both passes are dense
  bf16-split matmuls over per-row-tile / per-column-block weight matrices
  built from :func:`banded_weights`, so EVERYTHING lives in the weights —
  edge modes (incl. drop+normalize), per-phase structure for any rational
  N/D, antialiased downscale stretch, align conventions — generalizing the
  phase-LUT uniformity of ``kernel.cpp:50-59`` to per-tile granularity.
  The input is UNPADDED (window starts come from the exact rational
  coordinate floor, clipped into the image) and so is the output (Mosaic
  masks partial edge blocks).  uint8 pixels are exact in bf16; fp32 mode
  splits weights and the float intermediate into hi+lo bf16 parts (2
  vertical + 3 horizontal matmuls, ≤1 LSB vs the f32 gather path on ~0.1%
  of pixels); BF16 mode runs single matmuls at ~94% of the measured HBM
  roofline.  The FSR dering clamp and the uint8-quantized intermediate
  are fused via one-hot selector rows/cols stacked into the same
  matrices (height-first order only — they are nonlinear).
- **v2 (shift-FMA, transpose-free)**: integer upscales as unit-stride
  shifted-slice FMAs with phase-planar output; bit-exact vs shift_xla —
  kept as the exactness anchor and the CPU-interpret test kernel.
- **v1 (banded tiles + VMEM-scratch transpose)**: the original rational-
  scale study kernel; superseded by the MXU variant for performance.

Key structural facts exploited (SURVEY.md §7):

- A banded matrix materialized at tile granularity is small enough that the
  two per-tile applications are plain MXU matmuls — no gathers, no strided
  accesses, no data-dependent control flow.
- Interior column blocks share one matrix whenever the phase count is
  small (deduped automatically); large-N scales simply carry per-block
  matrices.

Layout: the kernel is planar — (C, H, W) or (B, C, H, W) — so the image
width rides the 128-lane dimension.  Interleaved (..., H, W, C) wrappers
transpose at the boundary.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lanczos_tpu.core.config import EdgeMode, Order, Precision, ResampleConfig
from lanczos_tpu.core.config import reduced_scale


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


from lanczos_tpu.core.weights import phase_table as _phase_table  # noqa: E402


def _phase_band_matrix(
    out_tile: int,
    n: int,
    d: int,
    a: int,
    support: int,
    filter_name: str,
    normalize: bool,
    k_pad: int,
    transpose: bool,
    align: str = "zero",
) -> np.ndarray:
    """Dense (out_tile, k_pad) banded weight matrix for one axis tile.

    Row ``y`` (tile-local) has taps at slab columns ``⌊y·D/N⌋ + 1 + j`` for
    ``j ∈ [0, 2·support)`` — slab coordinates are input coordinates padded
    by ``support`` and rebased to the tile's slab origin ``i·(out_tile·D/N)``.
    Requires ``out_tile % n == 0`` so the pattern is tile-invariant.
    """
    assert out_tile % n == 0
    tbl = _phase_table(n, d, a, support, filter_name, normalize, align)
    off = 0 if align == "zero" else d - n
    W = np.zeros((out_tile, k_pad), dtype=np.float64)
    for y in range(out_tile):
        fl = (2 * y * d + off) // (2 * n)
        W[y, fl + 1 : fl + 1 + 2 * support] = tbl[y % n]
    return W.T.copy() if transpose else W


@dataclasses.dataclass
class _AxisPlan:
    n: int
    d: int
    support: int
    tile_out: int  # output elements per tile (multiple of n)
    stride_in: int  # slab stride  = tile_out * d / n
    k_pad: int  # slab extent (>= stride_in + 2*support + 1), aligned
    num_tiles: int
    in_pad_total: int  # padded input size required


def _plan_axis(
    in_size: int, out_size: int, a: int, tile_target: int, align: int,
    tile_mult: int = 1,
) -> _AxisPlan:
    n, d = reduced_scale(in_size, out_size)
    support = a if n >= d else -(-(a * d) // n)
    if tile_mult > 1:
        # tile_out must be a multiple of lcm(n, tile_mult) when tiling
        # (Mosaic block sublane constraint) — or cover the whole axis
        lcm = n * tile_mult // math.gcd(n, tile_mult)
        whole = _round_up(out_size, n)
        tile_out = max(lcm, (min(tile_target, whole) // lcm) * lcm)
        if tile_out >= whole:
            tile_out = whole
    else:
        tile_out = max(
            n, _round_up(min(tile_target, _round_up(out_size, n)), n)
        )
    stride = tile_out * d // n
    if align == 128 and tile_out < out_size and (stride % 128 or tile_out % 128):
        # the lane (width) axis: the in-kernel chunk slice offset is
        # j·stride, which Mosaic can only lower when 128-aligned (or when
        # there is a single chunk and the slice is static), and the output
        # block's lane extent tile_out must itself be 128-divisible unless
        # it spans the whole axis.  Grow the tile until both align, or
        # collapse to one chunk.
        t = tile_out
        while t < out_size and ((t * d // n) % 128 or t % 128):
            t += n
        tile_out = max(n, _round_up(min(t, _round_up(out_size, n)), n))
        stride = tile_out * d // n
    k = stride + 2 * support + 1
    k_pad = _round_up(k, align)
    num = -(-out_size // tile_out)
    # uint8 band scratch: last dim must stay 128-lane aligned and the row
    # extent 32-sublane aligned for Mosaic vector loads with a dynamic
    # leading (slot) index
    in_pad = _round_up((num - 1) * stride + k_pad, 128 if align == 128 else 1)
    return _AxisPlan(n, d, support, tile_out, stride, k_pad, num, in_pad)


_PAD_MODE = {
    EdgeMode.CLAMP: "edge",
    EdgeMode.DROP: "constant",
    EdgeMode.REFLECT: "reflect",
}


@dataclasses.dataclass
class _MXUPlan:
    """Plan for the MXU fused variant (v3): both passes as dense matmuls.

    Works on the UNPADDED image — edge handling (clamp/drop/reflect and
    per-row normalization) is folded into the weight matrices built from
    :func:`banded_weights`, so the ~0.7 ms whole-image ``jnp.pad`` and the
    v2 phase-plane interleave transpose (~1.1 ms at 4K→8K) both disappear.

    Vertical: output rows tiled by ``tile_out``; tile ``i`` reads input rows
    ``[start_i, start_i + kv)`` (starts clipped into the image) and applies
    a per-tile dense ``(tile_out, kv)`` matrix, delivered to the kernel via
    a pipelined BlockSpec (edge tiles' matrices differ, interior repeat).

    Horizontal: output cols in blocks of ``cb = lcm(N_h, 128)``; block ``b``
    multiplies ``mid[:, start_b : start_b + kh]`` by a dense ``(kh, cb)``
    matrix.  Interior blocks share one matrix (the phase-LUT invariance,
    kernel.cpp:50-59); matrices are deduped and indexed statically by the
    unrolled block loop, and the interleaved uint8 output block is written
    directly — no post-kernel transpose.
    """

    tile_out: int
    nv: int  # reduced vertical scale out/in = nv/dv
    dv: int
    off_v: int  # coordinate convention offset (0 zero-align, dv-nv center)
    back_v: int  # rows of backoff below the tile's first coordinate floor
    kv: int
    num_tiles: int
    ih_eff: int  # 8-aligned input rows after bottom zero-pad
    starts_v: tuple  # per-tile input row starts
    cb: int
    kh: int
    n_cb: int
    starts_h: tuple  # per-block input col starts
    uniq_h: tuple  # per-block index into the deduped horizontal matrices
    wv: np.ndarray  # (num_tiles, tile_out, kv) f64, bf16-split at init
    wh: np.ndarray  # (n_uniq, kh, cb) f64


# VMEM budget for the kernel's working set (band scratch + resident
# horizontal matrices + mid/out values); the scoped limit is 16 MB
_MXU_VMEM_BUDGET = 12 << 20


@functools.lru_cache(maxsize=8)  # plans hold multi-MB f64 weight stacks
def _mxu_plan(
    cfg: ResampleConfig, tile_h: int = 128, cb_target: int = 128
) -> Optional[_MXUPlan]:
    """Build the MXU-variant plan, retrying smaller row tiles when the
    working set exceeds the VMEM budget (e.g. 4K dering triples the
    vertical dot rows); None where no tile fits or a window cannot cover
    its tile (tiny images).  Cached: the auto-backend eligibility check
    and PallasOps both ask for the same config's plan."""
    for t in (tile_h, 96, 64, 48, 32):
        if t > tile_h:
            continue
        plan = _mxu_plan_tile(cfg, t, cb_target)
        if plan is not None:
            return plan
    return None


def transposed_cfg(cfg: ResampleConfig) -> ResampleConfig:
    """The height-first config whose result, applied to the transposed
    image, equals this width-first config on the original: swapping both
    shape axes swaps which operator is "vertical", and the per-output-pixel
    nonlinearities (dering clamp, uint8-quantized intermediate) commute
    with the transpose because they act pointwise after each pass."""
    return dataclasses.replace(
        cfg,
        in_shape=(cfg.in_shape[1], cfg.in_shape[0]),
        out_shape=(cfg.out_shape[1], cfg.out_shape[0]),
        order=Order.HEIGHT_FIRST,
    )


def _mxu_plan_tile(
    cfg: ResampleConfig, tile_h: int, cb_target: int = 128
) -> Optional[_MXUPlan]:
    """Build the MXU-variant plan for one row-tile target, or None where
    it does not apply (VMEM-exceeding windows, or images smaller than one
    contraction window).

    Any *linear* config qualifies — integer and rational scales, upscale
    and antialiased downscale, every edge mode incl. drop+normalize — by
    the same construction: per-tile dense vertical matrices and per-block
    dense horizontal matrices built from :func:`banded_weights`, so edge
    handling, normalization, and arbitrary N/D phase structure all live in
    the weights (generalizing the phase-LUT uniformity of the reference's
    kernel.cpp:50-59 to per-tile granularity)."""
    from lanczos_tpu.core.weights import banded_weights

    (ih, iw), (oh, ow) = cfg.in_shape, cfg.out_shape
    (nv, dv), (nh, dh) = reduced_scale(ih, oh), reduced_scale(iw, ow)
    dering = cfg.dering
    if (dering or cfg.intermediate_quantize) and cfg.order != Order.HEIGHT_FIRST:
        # the fused kernel runs vertical-then-horizontal; through a
        # nonlinearity (dering clamp / quantized intermediate) the pass
        # order is observable
        return None
    kw = dict(
        a=cfg.a, filter_name=cfg.filter, edge_mode=cfg.edge_mode,
        normalize=cfg.normalize, coord_mode="exact", align=cfg.align.value,
    )
    op_v = banded_weights(ih, oh, **kw)
    op_h = banded_weights(iw, ow, **kw)
    off_v = 0 if cfg.align.value == "zero" else dv - nv
    return _build_mxu_plan(cfg, tile_h, op_v, op_h, nv, dv, off_v, cb_target)


def _build_mxu_plan(
    cfg: ResampleConfig,
    tile_h: int,
    op_v,
    op_h,
    nv: int,
    dv: int,
    off_v: int,
    cb_target: int = 128,
) -> Optional[_MXUPlan]:
    """Plan construction core, parameterized on prebuilt banded operators.

    ``cfg`` supplies shapes and the nonlinearity flags; the vertical band
    ``op_v`` must satisfy ``op_v.idx[y].min() >= (2·y·dv + off_v)//(2·nv)
    − (op_v.a − 1)`` in its local coordinates — true for whole-frame
    operators, and for window-rebased slices with ``off_v`` shifted by
    ``2·dv·y0 − 2·nv·row0`` (the streaming chunk path) — every tile is
    validated against the real indices below either way."""
    (ih, iw), (oh, ow) = cfg.in_shape, cfg.out_shape
    nh = reduced_scale(iw, ow)[0]
    dering = cfg.dering
    s_v = op_v.a  # support per side (= a, or ceil(a·D/N) for downscale)
    s_h = op_h.a
    back_v = s_v - 1  # idx min for row y is floor((2yd+off)/2n) - (s-1)

    # ---- vertical tiling ----
    # Per-tile dense matrices need no phase alignment — only the Mosaic
    # 8-sublane block rule.  Prefer a tile that divides OH exactly (a
    # non-dividing grid is handled by masked edge blocks, but full tiles
    # waste no compute); search multiples of 8 downward from tile_h —
    # which is a HARD upper bound, so the VMEM-retry ladder in _mxu_plan
    # genuinely shrinks the working set — and fall back to tile_h floored
    # to 8 (the masked-edge padded grid).
    whole = _round_up(oh, 8)
    tile = 0
    for t in range((min(tile_h, whole) // 8) * 8, max(tile_h // 2, 7), -8):
        if oh % t == 0:
            tile = t
            break
    if not tile:
        tile = max(8, (min(tile_h, whole) // 8) * 8)
    if tile >= whole:
        tile = whole

    def v_start_raw(lo: int) -> int:
        # mirror of the kernel's integer window-start formula
        return (2 * lo * dv + off_v) // (2 * nv) - back_v

    num = -(-oh // tile)
    # first pass: uniform window extent kv from the real band indices
    # (downscale-aware: idx spans tile·D/N + 2·support rows)
    ext = 0
    for i in range(num):
        lo, hi = i * tile, min((i + 1) * tile, oh)
        start0 = (max(v_start_raw(lo), 0) // 8) * 8
        ext = max(ext, int(op_v.idx[lo:hi].max()) - start0 + 1)
    kv = min(_round_up(ext + 7, 8), _round_up(ih, 8))
    # 8-aligned ih_eff (bottom zero-pad, never read by valid outputs) so
    # the kernel's clip bound ih_eff - kv is itself 8-aligned: otherwise
    # the floor-to-8 after the clip loses up to 7 rows and bottom tiles of
    # odd-height images fail the coverage check below
    ih_eff = _round_up(max(ih, kv), 8)
    w_eff = _round_up(iw, 128)
    # dering: the same vertical dot also produces the clamp bounds — rows
    # [tile, 2·tile) and [2·tile, 3·tile) are one-hot selectors of the two
    # central taps (idx[:, s-1], idx[:, s]; worker.cpp:64-75), whose uint8
    # values are exact in bf16 (their bf16-lo split rows are zero)
    rows_v = 3 * tile if dering else tile
    starts_v, wv = [], np.zeros((num, rows_v, kv), np.float64)
    for i in range(num):
        lo, hi = i * tile, min((i + 1) * tile, oh)
        start = (min(max(v_start_raw(lo), 0), ih_eff - kv) // 8) * 8
        band_idx = op_v.idx[lo:hi] - start
        if band_idx.min() < 0 or band_idx.max() >= kv:
            return None  # window cannot cover this tile (tiny image)
        rr = np.arange(hi - lo)
        np.add.at(wv[i], (rr[:, None], band_idx), op_v.weights[lo:hi])
        if dering:
            wv[i][tile + rr, band_idx[:, s_v - 1]] = 1.0
            wv[i][2 * tile + rr, band_idx[:, s_v]] = 1.0
        starts_v.append(start)

    # ---- horizontal blocks ----
    # Block starts are STATIC (baked into the unrolled loop), so they come
    # straight from the operator's band indices — no formula needed.  A
    # small lcm keeps interior blocks identical for dedup; huge phase
    # counts (large N) fall back to cb=128 with per-block matrices.
    cb = nh * 128 // math.gcd(nh, 128)
    if cb > 512:
        cb = 128
    # cb_target widens the block in phase-lcm multiples.  Measured (bf16
    # 4K→8K, don't re-derive): WIDER IS STRICTLY WORSE — cost scales
    # linearly with kh (cb 128/256/512/1024 → 0.265/0.366/0.510/0.781
    # ms/frame), i.e. the 60 small (m=128,k=72,n=128) dots already run at
    # ~85% of MXU peak and the dense-window MAC volume itself is the cost,
    # which the minimum cb minimizes.  The knob stays for ablation.
    cb *= max(1, cb_target // cb)
    n_cb = -(-ow // cb)
    ext_h = 0
    for b in range(n_cb):
        lo, hi = b * cb, min((b + 1) * cb, ow)
        blk = op_h.idx[lo:hi]
        ext_h = max(ext_h, int(blk.max()) - int(blk.min()) + 1)
    kh = min(_round_up(ext_h, 8), w_eff)
    # dering: columns [cb, 2·cb) and [2·cb, 3·cb) select the two central
    # taps of the (vertically clamped) intermediate; the f32 bound is
    # reconstructed exactly as m_hi·S + m_lo·S
    cols_h = 3 * cb if dering else cb
    starts_h, mats = [], []
    for b in range(n_cb):
        lo, hi = b * cb, min((b + 1) * cb, ow)
        start = min(max(int(op_h.idx[lo:hi].min()), 0), w_eff - kh)
        band_idx = op_h.idx[lo:hi] - start
        if band_idx.min() < 0 or band_idx.max() >= kh:
            return None
        W = np.zeros((kh, cols_h), np.float64)
        cc = np.arange(hi - lo)
        np.add.at(W, (band_idx, cc[:, None]), op_h.weights[lo:hi])
        if dering:
            W[band_idx[:, s_h - 1], cb + cc] = 1.0
            W[band_idx[:, s_h], 2 * cb + cc] = 1.0
        starts_h.append(start)
        mats.append(W)
    uniq, uniq_h = [], []
    for W in mats:
        for u, U in enumerate(uniq):
            if np.array_equal(W, U):
                uniq_h.append(u)
                break
        else:
            uniq_h.append(len(uniq))
            uniq.append(W)

    # ---- VMEM feasibility ----
    # band scratch (double-buffered u8) + resident wh (hi+lo bf16) +
    # per-tile wv blocks (hi+lo bf16, pipelined x2) + mid/m_hi/m_lo values
    # + the output block
    ow_pad = n_cb * cb
    vmem = (
        2 * kv * w_eff  # double-buffered u8 band
        + 2 * 2 * len(uniq) * kh * cols_h  # resident wh hi+lo bf16
        + 2 * 2 * 2 * rows_v * kv  # pipelined wv blocks hi+lo bf16
        + rows_v * w_eff * 4  # mid value f32 (3·tile rows when dering)
        + tile * w_eff * (2 + 2)  # m_hi/m_lo bf16 (tile rows only)
        + 2 * tile * ow_pad  # pipelined u8 out block
    )
    if vmem > _MXU_VMEM_BUDGET:
        return None
    return _MXUPlan(
        tile_out=tile, nv=nv, dv=dv, off_v=off_v, back_v=back_v, kv=kv,
        num_tiles=num, ih_eff=ih_eff,
        starts_v=tuple(starts_v), cb=cb, kh=kh, n_cb=n_cb,
        starts_h=tuple(starts_h), uniq_h=tuple(uniq_h),
        wv=wv, wh=np.stack(uniq),
    )


def _split_bf16(w: np.ndarray):
    hi = jnp.asarray(w, jnp.bfloat16)
    lo = jnp.asarray(w - np.asarray(hi, np.float64), jnp.bfloat16)
    return hi, lo


def make_mxu_ops(cfg: ResampleConfig, plan: _MXUPlan, interpret: bool = False):
    """Duck-typed stand-in for PallasOps carrying a hand-built plan —
    the single place that knows which attributes _fused_kernel_mxu /
    _fused_call_mxu read.  Used by the streaming chunk and row-sharded
    paths, whose plans come from window-rebased operator slices rather
    than a whole-frame config.  Set ``mxu_wv = None`` (and pass ``wv=`` at
    call time) when the vertical stacks are per-shard operands."""
    import types

    return types.SimpleNamespace(
        cfg=cfg,
        mxu=plan,
        mxu_wv=_split_bf16(plan.wv),
        mxu_wh=_split_bf16(plan.wh),
        split=cfg.precision != Precision.BF16,
        interpret=interpret,
    )


class PallasOps:
    """Precomputed plan + weight matrices for one fused 2D resample config."""

    def __init__(
        self,
        cfg: ResampleConfig,
        dtype=jnp.float32,
        tile_h: int = 256,
        tile_w: int = 1024,
        interpret: bool = False,
        variant: str = "auto",
    ):
        if cfg.precision == Precision.FIXED:
            raise NotImplementedError("use ops.fixed_point for the HLS path")
        # dering is resolved below once the per-axis plans exist (it needs
        # the shift-FMA variant on both axes)
        if cfg.c_faithful:
            raise NotImplementedError("c_faithful is XLA/ref-backend only")
        self.cfg = cfg
        self.interpret = interpret
        # Width-first nonlinear configs (dering / quantized intermediate
        # make the pass order observable) run as the height-first kernel on
        # the TRANSPOSED image: Y = (kernel_T(X^T))^T exactly.  The two
        # swapaxes cost one extra HBM round-trip (~0.4 ms at 4K->8K) vs the
        # ~39 ms gather path these configs previously fell to.
        self.tr_ops = None
        if cfg.order == Order.WIDTH_FIRST and (
            cfg.dering or cfg.intermediate_quantize
        ):
            self.tr_ops = PallasOps(
                transposed_cfg(cfg), dtype, tile_h, tile_w, interpret, variant
            )
            self.mxu = self.tr_ops.mxu  # eligibility mirrors the inner plan
            return
        # ---- MXU variant (v3): both passes as dense MXU matmuls on the
        # UNPADDED image; fastest fused path on real TPUs (~2x v2 at
        # 4K→8K).  Float summation order differs from the shift paths, so
        # outputs may differ by 1 ulp where a value sits on a truncation
        # boundary — "auto" picks it only on non-CPU backends; v2 remains
        # the bit-exact-vs-shift_xla kernel.
        if variant not in ("auto", "mxu", "v1", "v2"):
            raise ValueError(f"unknown Pallas variant {variant!r}")
        self.mxu = None
        if variant in ("auto", "mxu"):
            self.mxu = _mxu_plan(cfg, tile_h if variant == "mxu" else 128)
            if variant == "mxu" and self.mxu is None:
                raise NotImplementedError(
                    "MXU variant covers any linear config without dering "
                    "whose contraction windows fit VMEM and cover every "
                    "tile; this one's plan is infeasible — use v1/v2 or "
                    "the block backend"
                )
            if variant == "auto" and (
                interpret or jax.default_backend() == "cpu"
            ):
                self.mxu = None  # CPU runs are tests: keep v2 semantics
        if self.mxu is not None:
            self.split = cfg.precision != Precision.BF16
            self.mxu_wv = _split_bf16(self.mxu.wv)
            self.mxu_wh = _split_bf16(self.mxu.wh)
        if cfg.edge_mode == EdgeMode.DROP and cfg.normalize and self.mxu is None:
            raise NotImplementedError(
                "drop-edge with normalization needs the MXU variant "
                "(per-row renormalized weights); zero padding cannot "
                "reproduce it in the shift/banded kernels"
            )
        if cfg.intermediate_quantize and self.mxu is None:
            raise NotImplementedError(
                "the uint8-quantized intermediate is fused only in the MXU "
                "variant (height-first); v1/v2 would silently skip it — "
                "use the block or xla backend"
            )
        if cfg.edge_mode == EdgeMode.DROP and cfg.dering and self.mxu is None:
            # the MXU one-hot bound selectors use the operator's CLIPPED
            # tap indices (banded_weights clips DROP indices and only
            # zeroes the weights), so they reproduce the gather path's
            # x[idx[a-1]]/x[idx[a]] clamp exactly; without a plan the
            # shift kernels have no such selector
            raise NotImplementedError(
                "drop-edge dering without an MXU plan — gather path only"
            )
        (ih, iw), (oh, ow) = cfg.in_shape, cfg.out_shape
        # Numerics: uint8 pixels are EXACT in bf16 (integers ≤ 255 fit in
        # its 8 significand bits) and bf16×bf16 products accumulate in f32
        # on the MXU.  The only precision loss is the weights' bf16
        # rounding, so the precise mode splits each weight matrix into
        # hi + lo bf16 parts (w ≈ hi + lo, residual ~2⁻¹⁶ relative) and
        # runs 2 vertical + 3 horizontal bf16 matmuls — f32-quality output
        # at bf16 MXU rates.  BF16 mode keeps single matmuls (fastest).
        self.split = cfg.precision != Precision.BF16
        # v2 (transpose-free, phase-planar horizontal) covers integer
        # upscales on both axes — the flagship configs; v1 (banded matmul /
        # transpose shift) remains for rational scales
        nv, dv = reduced_scale(ih, oh)
        nh, dh = reduced_scale(iw, ow)
        self.v2 = dv == 1 and dh == 1 and nv <= 16 and nh <= 16
        if self.v2:
            self.pv = _plan_axis(ih, oh, cfg.a, 128, align=32, tile_mult=8)
            self.ph = _plan_axis(iw, ow, cfg.a, ow, align=128)
        else:
            # row tiles are output-block sublanes: must be 8-divisible (or
            # span the axis) for Mosaic's block-shape rule, same as v2
            self.pv = _plan_axis(ih, oh, cfg.a, tile_h, align=32, tile_mult=8)
            self.ph = _plan_axis(iw, ow, cfg.a, tile_w, align=128)
        # Shift-FMA variant: for integer upscales (D == 1) every output
        # phase is a sum of 2a UNIT-STRIDE shifted slices of the slab
        # scaled by compile-time-constant weights — ~2a FMAs per output on
        # the VPU in exact f32, vs the dense banded matmul whose K dim is
        # ~stride+2a (≈100× the band's useful FLOPs).  The matmul path
        # remains for rational scales (D > 1) and huge N.
        self.v_shift = self.pv.d == 1 and self.pv.n <= 16
        self.h_shift = self.ph.d == 1 and self.ph.n <= 16
        al = cfg.align.value
        self.off_v = 0 if al == "zero" else self.pv.d - self.pv.n
        self.off_h = 0 if al == "zero" else self.ph.d - self.ph.n
        if cfg.dering and self.mxu is None:
            if cfg.order != Order.HEIGHT_FIRST:
                raise NotImplementedError(
                    "both fused kernels run vertical-then-horizontal; "
                    "width-first dering is order-observable — use the XLA "
                    "backend"
                )
            if not (self.v_shift and self.h_shift):
                raise NotImplementedError(
                    "dering without an MXU plan requires integer upscale "
                    "factors (shift-FMA variant); use the XLA backend"
                )
        self.tbl_v = _phase_table(
            self.pv.n, self.pv.d, cfg.a, self.pv.support, cfg.filter,
            cfg.normalize, cfg.align.value,
        ).astype(np.float32)
        self.tbl_h = _phase_table(
            self.ph.n, self.ph.d, cfg.a, self.ph.support, cfg.filter,
            cfg.normalize, cfg.align.value,
        ).astype(np.float32)
        if self.v_shift:  # weights are baked into the kernel as constants
            wv = np.zeros((8, 128), dtype=np.float64)
        else:
            wv = _phase_band_matrix(
                self.pv.tile_out, self.pv.n, self.pv.d, cfg.a, self.pv.support,
                cfg.filter, cfg.normalize, self.pv.k_pad, transpose=False,
                align=cfg.align.value,
            )
        if self.h_shift:
            wh = np.zeros((8, 128), dtype=np.float64)
        else:
            wh = _phase_band_matrix(
                self.ph.tile_out, self.ph.n, self.ph.d, cfg.a, self.ph.support,
                cfg.filter, cfg.normalize, self.ph.k_pad, transpose=True,
                align=cfg.align.value,
            )
        self.wv_hi = jnp.asarray(wv, jnp.bfloat16)
        self.wh_hi = jnp.asarray(wh, jnp.bfloat16)
        self.wv_lo = jnp.asarray(
            wv - np.asarray(self.wv_hi, np.float64), jnp.bfloat16
        )
        self.wh_lo = jnp.asarray(
            wh - np.asarray(self.wh_hi, np.float64), jnp.bfloat16
        )
        self.pad_mode = _PAD_MODE[cfg.edge_mode]

    # -- padding -----------------------------------------------------------
    def pad_input(self, x: jnp.ndarray) -> jnp.ndarray:
        """(..., H, W) → (..., Hp, Wp): support-sized edge-correct pad plus
        alignment/overrun padding (never read by valid outputs)."""
        pv, ph = self.pv, self.ph
        lead = [(0, 0)] * (x.ndim - 2)
        # one fused pad: the alignment/overrun region beyond the support
        # halo is never read by valid outputs, so its values don't matter —
        # folding it into the edge pad saves a second whole-image copy
        # (reflect can't extend past the image, so it keeps two pads)
        extra_h = max(pv.in_pad_total - (x.shape[-2] + 2 * pv.support), 0)
        extra_w = max(ph.in_pad_total - (x.shape[-1] + 2 * ph.support), 0)
        both = lead + [
            (pv.support, pv.support + extra_h),
            (ph.support, ph.support + extra_w),
        ]
        if self.pad_mode == "reflect":
            edge = lead + [(pv.support, pv.support), (ph.support, ph.support)]
            x = jnp.pad(x, edge, mode="reflect")
            if extra_h or extra_w:
                x = jnp.pad(
                    x, lead + [(0, extra_h), (0, extra_w)], mode="constant"
                )
            return x
        return jnp.pad(x, both, mode=self.pad_mode)


def _shift_pass(x, plan, tbl, dering: bool = False, off: int = 0):
    """Shift-FMA 1-D resample along axis 0 (sublanes), D == 1.

    Each phase plane is Σ_t w[p,t]·x[1+t : 1+t+m] (unit-stride shifted
    slices × compile-time scalar weights); planes interleave with a
    sublane stack+reshape (out row k·N+p = plane_p[k]), which Mosaic
    supports on non-lane dims.  Lane-dim interleaves are NOT lowerable, so
    the horizontal pass transposes, runs this, and transposes back.

    ``dering`` clamps each output to the [min, max] of the two central
    taps (x[s+k], x[s+1+k]) — the reference's FSR-inspired anti-ringing
    step (worker.cpp:64-75) — two more unit-stride slices per phase.
    """
    m = plan.stride_in
    s = plan.support
    taps = 2 * s
    # With D == 1 phases share tap slices whenever their coordinate floors
    # coincide (always true for zero-align; center-align phases differ by
    # at most one row) — cache slices by start offset so shared ones are
    # extracted once (halves VMEM read traffic for N=2 zero-align).
    cache = {}

    def sl(start):
        if start not in cache:
            cache[start] = x[start : start + m, :]
        return cache[start]

    accs = []
    for p in range(plan.n):
        fp = (2 * p * plan.d + off) // (2 * plan.n)
        slices = [sl(fp + 1 + t) for t in range(taps)]
        acc = None
        for t in range(taps):
            term = float(tbl[p, t]) * slices[t]
            acc = term if acc is None else acc + term
        if dering:
            acc = jnp.clip(
                acc,
                jnp.minimum(slices[s - 1], slices[s]),
                jnp.maximum(slices[s - 1], slices[s]),
            )
        accs.append(acc)
    if plan.n == 1:
        return accs[0]
    return jnp.stack(accs, axis=1).reshape(m * plan.n, x.shape[1])


def _fused_kernel(
    img_ref, wv_hi, wv_lo, wh_hi, wh_lo, out_ref, band, mid, sems,
    *, ops: PallasOps
):
    """Grid-step body: one (channel, row-tile, column-chunk) per step.

    The input DMA fetches a FULL-WIDTH row band — rows are contiguous in
    HBM, so the copy is one linear transfer (the per-column-tile strided
    slab form cost ~10 µs per slab in DMA descriptor overhead and
    dominated the kernel).  The band lives in a persistent 2-slot scratch:
    it is fetched once per (c, i) at the first column chunk (j == 0), and
    the NEXT band's DMA is started at the same moment — so the transfer of
    band b+1 overlaps all n_j chunk computations of band b (the TPU analog
    of the reference's DATAFLOW ping-pong, lanczos.cpp:72-82).  Output
    write-back is double-buffered by Pallas itself.
    """
    pv, ph = ops.pv, ops.ph
    n_i = pv.num_tiles
    c = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    band_lin = c * n_i + i
    bands_total = pl.num_programs(0) * n_i

    def dma_for(band_idx, slot):
        cc = band_idx // n_i
        ii = band_idx % n_i
        return pltpu.make_async_copy(
            img_ref.at[cc, pl.ds(ii * pv.stride_in, pv.k_pad), :],
            band.at[slot],
            sems.at[slot],
        )

    slot = band_lin % 2

    @pl.when((band_lin == 0) & (j == 0))
    def _():
        dma_for(0, 0).start()

    @pl.when((j == 0) & (band_lin + 1 < bands_total))
    def _():
        dma_for(band_lin + 1, (band_lin + 1) % 2).start()

    @pl.when(j == 0)
    def _():
        dma_for(band_lin, slot).wait()

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    # Mosaic has no direct u8->float casts; hop through int32.  The
    # chunk's lane offset j·stride must be static (single chunk) or
    # 128-aligned (_plan_axis guarantees the latter); the dynamic slot
    # index is avoided by loading both slots and selecting — on the RAW
    # u8 values, so the int32 widening runs once, not per slot (measured
    # ~5% faster at 4K→8K, bit-exact).
    if ph.num_tiles == 1:
        sl = slice(0, ph.k_pad)
    else:
        sl = pl.ds(pl.multiple_of(j * ph.stride_in, 128), ph.k_pad)
    xi = jnp.where(slot == 0, band[0, :, sl], band[1, :, sl]).astype(jnp.int32)

    # ---- vertical pass ----
    if ops.v_shift:
        tmp = _shift_pass(
            xi.astype(jnp.float32), pv, ops.tbl_v, ops.cfg.dering, ops.off_v
        )
    else:
        x = xi.astype(jnp.bfloat16)  # exact for 0..255
        if ops.split:
            tmp = dot(wv_hi[...], x) + dot(wv_lo[...], x)
        else:
            tmp = dot(wv_hi[...], x)

    # ---- horizontal pass ----
    if ops.h_shift:
        # Round-trip through VMEM scratch: transposing the freshly
        # stacked/reshaped value sends Mosaic's layout inference into a
        # pathological search (observed compile hang); a ref store/load
        # forces a canonical layout first.
        mid[...] = tmp.astype(jnp.float32)
        y = _shift_pass(mid[...].T, ph, ops.tbl_h, ops.cfg.dering, ops.off_h).T
    elif ops.split:
        t_hi = tmp.astype(jnp.bfloat16)
        t_lo = (tmp - t_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        y = dot(t_hi, wh_hi[...]) + dot(t_lo, wh_hi[...]) + dot(t_hi, wh_lo[...])
    else:
        y = dot(tmp.astype(jnp.bfloat16), wh_hi[...])
    q = jnp.trunc(jnp.clip(y, 0.0, 255.0)).astype(jnp.int32)
    out_ref[0] = q.astype(jnp.uint8)


def _fused_kernel_v2(img_ref, out_ref, band, sems, *, ops: PallasOps):
    """Transpose-free fused body: one (channel, row-tile) per step.

    Round-2 redesign.  Profiling showed the v1 kernel's 4-6 ms at 4K→8K
    was dominated by the horizontal pass's VMEM round-trip + double
    transpose (``mid[...].T`` → Mosaic lane shuffles).  v2 eliminates it:

    - full-width row bands (one DMA per band, double-buffered as in v1);
    - vertical pass: sublane shift-FMA interleave (as v1);
    - horizontal pass: computed PER PHASE as unit-stride *lane* slices of
      the mid band — measured fine in Mosaic when the offsets are static —
      and stored **phase-planar** to out[(c, p, i)]: no lane interleave,
      no transpose.  One cheap XLA transpose+reshape outside the kernel
      interleaves the N_h phase planes into the final width.
    """
    pv, ph = ops.pv, ops.ph
    n_i = pv.num_tiles
    c = pl.program_id(0)
    i = pl.program_id(1)
    band_lin = c * n_i + i
    bands_total = pl.num_programs(0) * n_i

    def dma_for(band_idx, slot):
        cc = band_idx // n_i
        ii = band_idx % n_i
        return pltpu.make_async_copy(
            img_ref.at[cc, pl.ds(ii * pv.stride_in, pv.k_pad), :],
            band.at[slot],
            sems.at[slot],
        )

    slot = band_lin % 2

    @pl.when(band_lin == 0)
    def _():
        dma_for(0, 0).start()

    @pl.when(band_lin + 1 < bands_total)
    def _():
        dma_for(band_lin + 1, (band_lin + 1) % 2).start()

    dma_for(band_lin, slot).wait()

    # select on the raw u8 slots, then widen once (~5% faster, bit-exact)
    xi = jnp.where(slot == 0, band[0], band[1]).astype(jnp.int32)
    xi = xi.astype(jnp.float32)

    mid = _shift_pass(xi, pv, ops.tbl_v, ops.cfg.dering, ops.off_v)

    # horizontal pass, one phase plane at a time (static lane offsets)
    m = ph.stride_in
    s = ph.support
    taps = 2 * s
    for p in range(ph.n):
        fp = (2 * p * ph.d + ops.off_h) // (2 * ph.n)
        slices = [mid[:, fp + 1 + t : fp + 1 + t + m] for t in range(taps)]
        acc = None
        for t in range(taps):
            term = float(ops.tbl_h[p, t]) * slices[t]
            acc = term if acc is None else acc + term
        if ops.cfg.dering:
            acc = jnp.clip(
                acc,
                jnp.minimum(slices[s - 1], slices[s]),
                jnp.maximum(slices[s - 1], slices[s]),
            )
        q = jnp.trunc(jnp.clip(acc, 0.0, 255.0)).astype(jnp.int32)
        out_ref[0, p] = q.astype(jnp.uint8)


def _fused_kernel_mxu(
    img_ref, wv_hi, wv_lo, wh_hi, wh_lo, out_ref, band, sems, *, ops: PallasOps
):
    """Grid-step body for the MXU variant: one (channel, row-tile) per step.

    Both separable passes are dense matmuls (uint8 pixels are EXACT in
    bf16; products accumulate in f32 on the MXU).  FP32 mode splits the
    weights and the float intermediate into hi+lo bf16 parts (2 vertical +
    3 horizontal matmuls, residual ~2⁻¹⁶ relative); BF16 mode runs single
    matmuls.  The input row band is DMA'd double-buffered as in v2, but
    from the UNPADDED image: edge semantics live in the weight matrices,
    and the band start is clipped into the image (matching the plan's
    per-tile matrices).
    """
    mx = ops.mxu
    n_i = mx.num_tiles
    c = pl.program_id(0)
    i = pl.program_id(1)
    band_lin = c * n_i + i
    bands_total = pl.num_programs(0) * n_i

    def dma_for(band_idx, slot):
        cc = band_idx // n_i
        ii = band_idx % n_i
        # must mirror the plan's per-tile start exactly (the exact-rational
        # coordinate floor minus the support backoff, floored to 8 for
        # Mosaic's dynamic-sublane-start divisibility rule); jnp // is
        # floor division, matching the plan's host-side Python //
        lo = ii * mx.tile_out
        raw = (2 * lo * mx.dv + mx.off_v) // (2 * mx.nv) - mx.back_v
        raw = jnp.clip(raw, 0, mx.ih_eff - mx.kv)
        start = pl.multiple_of((raw // 8) * 8, 8)
        return pltpu.make_async_copy(
            img_ref.at[cc, pl.ds(start, mx.kv), :],
            band.at[pl.ds(slot * mx.kv, mx.kv)],
            sems.at[slot],
        )

    slot = band_lin % 2

    @pl.when(band_lin == 0)
    def _():
        dma_for(0, 0).start()

    @pl.when(band_lin + 1 < bands_total)
    def _():
        dma_for(band_lin + 1, (band_lin + 1) % 2).start()

    dma_for(band_lin, slot).wait()

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    # the band scratch is flat (2·kv, w): slot selection is a dynamic
    # 8-aligned sublane-offset load (Mosaic-legal, unlike dynamic leading
    # indices on u8 refs), avoiding a jnp.where that materializes a copy
    # of both slots; widen once (no u8->float in Mosaic: hop through
    # int32; integers <= 255 are exact in bf16)
    xb = band[pl.ds(pl.multiple_of(slot * mx.kv, 8), mx.kv)]
    xb = xb.astype(jnp.int32).astype(jnp.bfloat16)

    if ops.split:
        # hi+lo merged along M: ONE (2r, kv) dot whose halves are summed
        # — identical summation order to two dots (bit-identical,
        # verified on hardware) but one MXU launch instead of two
        # dependent ones; with the horizontal merge below this is a
        # measured −27 µs at 4K→8K fp32 (tools/ablate_mxu.py f32mstack)
        wv_cat = jnp.concatenate([wv_hi[0], wv_lo[0]], axis=0)
        mid2 = dot(wv_cat, xb)
        r = wv_hi.shape[1]
        mid = mid2[:r] + mid2[r:]
    else:
        mid = dot(wv_hi[0], xb)
    der = ops.cfg.dering
    t = mx.tile_out
    if der:
        # rows [t,2t)/[2t,3t) of the same dot are the central-tap values
        # (exact uint8: one-hot selectors are exact in bf16) — the FSR
        # anti-ringing clamp (worker.cpp:64-75)
        mid, c0, c1 = mid[:t], mid[t : 2 * t], mid[2 * t : 3 * t]
        mid = jnp.clip(mid, jnp.minimum(c0, c1), jnp.maximum(c0, c1))
    quant_mid = ops.cfg.intermediate_quantize
    if quant_mid:
        # uint8-quantized intermediate (full_TB.h:63 semantics): integers
        # <= 255 are exact in bf16, so the mid split disappears and the
        # horizontal pass needs only the weight split (2 dots, not 3).
        # NOTE: when this kernel's f32 summation order lands a mid value
        # on the other side of a truncation boundary vs the gather path,
        # the flip cascades through the horizontal taps — isolated pixels
        # may differ by ±2 (measured: 1 pixel in 2.3M at 209×232→4×);
        # the ≤1 LSB agreement contract is for linear configs only
        mid = jnp.trunc(jnp.clip(mid, 0.0, 255.0))
    m_hi = mid.astype(jnp.bfloat16)
    split_mid = ops.split and not quant_mid
    if split_mid:
        # stack [m_hi; m_lo] along rows once per tile: the two Wh_hi
        # products become ONE dot per block (halves summed in the same
        # order as the two-dot chain — bit-identical)
        m_lo = (mid - m_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        m2 = jnp.concatenate([m_hi, m_lo], axis=0)
        tm = m_hi.shape[0]
    cb = mx.cb
    for b in range(mx.n_cb):
        st = mx.starts_h[b]
        u = mx.uniq_h[b]
        xh = m_hi[:, st : st + mx.kh]
        if split_mid:
            p2 = dot(m2[:, st : st + mx.kh], wh_hi[u])
            acc = p2[:tm] + p2[tm:]
        else:
            acc = dot(xh, wh_hi[u])
        if ops.split:
            acc = acc + dot(xh, wh_lo[u])
        if der:
            # cols [cb,2cb)/[2cb,3cb) reconstruct the central-tap bounds
            # exactly (m_hi·S + m_lo·S = mid in f32)
            acc, h0, h1 = acc[:, :cb], acc[:, cb : 2 * cb], acc[:, 2 * cb :]
            acc = jnp.clip(acc, jnp.minimum(h0, h1), jnp.maximum(h0, h1))
        q = jnp.trunc(jnp.clip(acc, 0.0, 255.0)).astype(jnp.int32)
        out_ref[0, :, b * cb : (b + 1) * cb] = q.astype(jnp.uint8)


def _fused_call_mxu(
    ops: PallasOps, img_planar: jnp.ndarray, wv=None
) -> jnp.ndarray:
    """(NC, H, W) uint8 UNPADDED planar → (NC, OH, OW) uint8, MXU variant.

    ``wv`` optionally overrides the vertical (hi, lo) weight stacks — the
    row-sharded path passes each shard its own slice (edge-exact weights
    as sharded operands)."""
    mx = ops.mxu
    nc, ih, w = img_planar.shape
    # zero-pad to the DMA alignment rules (8-sublane rows / 128-lane cols;
    # Mosaic rejects unaligned slice extents).  The pad is never read by
    # valid outputs — edge semantics live in the weights — and is a no-op
    # at aligned sizes (e.g. the 4K flagship).
    w_eff = _round_up(w, 128)
    if mx.ih_eff > ih or w_eff > w:
        img_planar = jnp.pad(
            img_planar, ((0, 0), (0, mx.ih_eff - ih), (0, w_eff - w))
        )
    oh, ow = ops.cfg.out_shape
    ow_pad = mx.n_cb * mx.cb
    wv_hi, wv_lo = ops.mxu_wv if wv is None else wv
    wh_hi, wh_lo = ops.mxu_wh
    kernel = functools.partial(_fused_kernel_mxu, ops=ops)
    nu = wh_hi.shape[0]
    # out_shape is UNPADDED: Mosaic masks the partial edge blocks (verified
    # bit-exact on hardware), so a row grid or column blocks that overrun
    # OH/OW cost no post-kernel slice copy (95 MB HBM→HBM at 4K→8K,
    # ~0.2 ms when the row tile does not divide OH)
    y = pl.pallas_call(
        kernel,
        grid=(nc, mx.num_tiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [
            pl.BlockSpec(
                (1, wv_hi.shape[1], mx.kv),  # 3·tile rows when dering
                lambda c, i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        * 2
        + [
            pl.BlockSpec(
                (nu, mx.kh, wh_hi.shape[2]),  # 3·cb cols when dering
                lambda c, i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        * 2,
        out_specs=pl.BlockSpec(
            (1, mx.tile_out, ow_pad),
            lambda c, i: (c, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nc, oh, ow), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((2 * mx.kv, w_eff), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=ops.interpret,
    )(img_planar, wv_hi, wv_lo, wh_hi, wh_lo)
    return y


def _fused_call_v2(ops: PallasOps, img_planar: jnp.ndarray) -> jnp.ndarray:
    """(NC, Hp, Wp) uint8 padded planar → (NC, OH, OW) uint8, v2 kernel."""
    pv, ph = ops.pv, ops.ph
    nc = img_planar.shape[0]
    wp = img_planar.shape[-1]
    oh, ow = ops.cfg.out_shape
    m = ph.stride_in  # = in_w for integer upscales
    grid = (nc, pv.num_tiles)
    # output rows padded to the tile grid (tile_out is sublane-aligned or
    # the whole axis; sliced back to oh below)
    oh_pad = pv.num_tiles * pv.tile_out
    kernel = functools.partial(_fused_kernel_v2, ops=ops)
    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, ph.n, pv.tile_out, m),
            lambda c, i: (c, 0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nc, ph.n, oh_pad, m), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((2, pv.k_pad, wp), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=ops.interpret,
    )(img_planar)
    # interleave phase planes: out col k·N_h + p = y[:, p, :, k]
    y = jnp.transpose(y[:, :, :oh], (0, 2, 3, 1)).reshape(nc, oh, m * ph.n)
    return y[:, :, :ow]


def _fused_call(ops: PallasOps, img_planar: jnp.ndarray) -> jnp.ndarray:
    """(NC, Hp, Wp) uint8 padded planar → (NC, OH, OW) uint8."""
    pv, ph = ops.pv, ops.ph
    nc = img_planar.shape[0]
    wp = img_planar.shape[-1]
    oh, ow = ops.cfg.out_shape
    grid = (nc, pv.num_tiles, ph.num_tiles)
    kernel = functools.partial(_fused_kernel, ops=ops)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [
            pl.BlockSpec(
                ops.wv_hi.shape, lambda c, i, j: (0, 0), memory_space=pltpu.VMEM
            )
        ]
        * 2
        + [
            pl.BlockSpec(
                ops.wh_hi.shape, lambda c, i, j: (0, 0), memory_space=pltpu.VMEM
            )
        ]
        * 2,
        out_specs=pl.BlockSpec(
            (1, pv.tile_out, ph.tile_out),
            lambda c, i, j: (c, i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nc, oh, ow), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((2, pv.k_pad, wp), jnp.uint8),
            pltpu.VMEM((pv.tile_out, ph.k_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=ops.interpret,
    )(img_planar, ops.wv_hi, ops.wv_lo, ops.wh_hi, ops.wh_lo)


def upscale_planar(img: jnp.ndarray, ops: PallasOps) -> jnp.ndarray:
    """Planar fast path: (C, H, W) or (B, C, H, W) uint8 → same rank uint8."""
    if ops.tr_ops is not None:  # width-first via the transposed kernel
        y = upscale_planar(jnp.swapaxes(img, -1, -2), ops.tr_ops)
        return jnp.swapaxes(y, -1, -2)
    cfg = ops.cfg
    batched = img.ndim == 4
    x = img if batched else img[None]
    b, c = x.shape[0], x.shape[1]
    x = x.reshape(b * c, *x.shape[2:])
    if ops.mxu is not None:  # edge handling folded into weights: no pad
        y = _fused_call_mxu(ops, x)
    else:
        x = ops.pad_input(x)
        y = _fused_call_v2(ops, x) if ops.v2 else _fused_call(ops, x)
    y = y.reshape(b, c, *cfg.out_shape)
    return y if batched else y[0]


def resample_2d_pallas(img: jnp.ndarray, ops: PallasOps) -> jnp.ndarray:
    """Interleaved API: (..., H, W, C) uint8 → (..., OH, OW, C) uint8.

    Transposes to planar at the boundary; prefer :func:`upscale_planar` in
    throughput-critical pipelines to skip the output transpose.
    """
    if img.dtype != jnp.uint8:
        img = jnp.trunc(jnp.clip(img.astype(jnp.float32), 0.0, 255.0)).astype(
            jnp.uint8
        )
    lead = img.shape[:-3]
    x = img.reshape((-1,) + img.shape[-3:])  # (B, H, W, C)
    x = jnp.transpose(x, (0, 3, 1, 2))  # planar
    y = upscale_planar(x, ops)
    y = jnp.transpose(y, (0, 2, 3, 1))
    return y.reshape(lead + y.shape[1:])
