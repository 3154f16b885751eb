"""Fused Pallas kernel (interpret mode) vs the XLA gather path.

The two paths compute the same banded operators with different float
summation orders (tile matmuls vs per-tap FMA), so uint8 outputs may differ
by 1 where a value sits exactly on a truncation boundary; assert ≤1 ULP and
tiny mean difference, plus exact equality of the underlying math on images
designed to avoid boundary values.
"""

import numpy as np
import pytest

from lanczos_tpu.core.config import EdgeMode, Profile, ResampleConfig
from lanczos_tpu.models.upscaler import Upscaler
from lanczos_tpu.ops.resample_pallas import PallasOps, resample_2d_pallas, upscale_planar
from lanczos_tpu.utils.metrics import psnr


def _run_pallas(cfg, img, **kw):
    ops = PallasOps(cfg, interpret=True, **kw)
    return np.asarray(resample_2d_pallas(img, ops))


@pytest.mark.parametrize("scale", [(2, 1), (3, 1), (3, 2)])
def test_pallas_matches_xla_upscale(rng, scale, small_img):
    n, d = scale
    h, w = small_img.shape[:2]
    h, w = (h // d) * d, (w // d) * d
    img = small_img[:h, :w]
    cfg = ResampleConfig.from_profile(Profile.PRECISE, (h, w), scale=scale, a=2)
    ref = np.asarray(Upscaler(cfg, backend="xla")(img))
    out = _run_pallas(cfg, img, tile_h=8 * n, tile_w=128 * n)
    diff = np.abs(ref.astype(int) - out.astype(int))
    assert diff.max() <= 1, f"max diff {diff.max()}"
    assert (diff > 0).mean() < 0.02


@pytest.mark.parametrize("edge", [EdgeMode.CLAMP, EdgeMode.DROP, EdgeMode.REFLECT])
def test_pallas_edge_modes(rng, edge, small_img):
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, small_img.shape[:2], scale=(2, 1), a=3,
        edge_mode=edge, normalize=edge != EdgeMode.DROP,
    )
    ref = np.asarray(Upscaler(cfg, backend="xla")(small_img))
    out = _run_pallas(cfg, small_img, tile_h=16, tile_w=128)
    diff = np.abs(ref.astype(int) - out.astype(int))
    assert diff.max() <= 1


def test_pallas_batched_planar(rng, small_img):
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, small_img.shape[:2], scale=(2, 1), a=2
    )
    batch = np.stack([small_img, small_img[::-1].copy()])
    ops = PallasOps(cfg, interpret=True, tile_h=16, tile_w=128)
    planar = np.transpose(batch, (0, 3, 1, 2)).copy()
    out_p = np.asarray(upscale_planar(planar, ops))
    out_i = np.asarray(resample_2d_pallas(batch, ops))
    np.testing.assert_array_equal(np.transpose(out_p, (0, 2, 3, 1)), out_i)
    assert out_i.shape == (2, *cfg.out_shape, 3)


def test_pallas_nondivisible_tiles(rng, small_img):
    """Output dims not divisible by the tile → partial edge tiles masked."""
    h, w = small_img.shape[:2]
    cfg = ResampleConfig.from_profile(Profile.PRECISE, (h, w), scale=(2, 1), a=2)
    ref = np.asarray(Upscaler(cfg, backend="xla")(small_img))
    out = _run_pallas(cfg, small_img, tile_h=20, tile_w=36)
    diff = np.abs(ref.astype(int) - out.astype(int))
    assert diff.max() <= 1


def test_pallas_psnr_vs_oracle(rng, small_img):
    """End-to-end quality: fused kernel vs fp64 clean resample ≥ 55 dB."""
    from lanczos_tpu.ref.oracle import clean_resample_2d

    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, small_img.shape[:2], scale=(2, 1), a=3
    )
    out = _run_pallas(cfg, small_img, tile_h=16, tile_w=128)
    gold = clean_resample_2d(small_img, cfg)
    gold = np.trunc(np.clip(gold, 0, 255)).astype(np.uint8)
    assert psnr(out, gold) > 55.0


def test_pallas_dering(rng, small_img):
    """FSR-style anti-ringing clamp in the shift-FMA path vs XLA.

    CLAMP edges only: with DROP the XLA path's clamp bounds read
    edge-clamped taps while the kernel's zero padding reads zeros.
    """
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, small_img.shape[:2], scale=(2, 1), a=2, dering=True
    )
    ref = np.asarray(Upscaler(cfg, backend="xla")(small_img))
    out = _run_pallas(cfg, small_img, tile_h=16, tile_w=128)
    diff = np.abs(ref.astype(int) - out.astype(int))
    assert diff.max() <= 1


def test_pallas_dering_rational_scale_raises(small_img):
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, (24, 20), scale=(3, 2), a=2, dering=True
    )
    with pytest.raises(NotImplementedError):
        PallasOps(cfg, interpret=True)


def test_pallas_downscale(rng):
    img = (
        np.linspace(0, 255, 64 * 48 * 3).reshape(64, 48, 3).astype(np.uint8)
    )
    cfg = ResampleConfig.from_profile(Profile.PRECISE, (64, 48), scale=(1, 2), a=2)
    ref = np.asarray(Upscaler(cfg, backend="xla")(img))
    out = _run_pallas(cfg, img, tile_h=16, tile_w=128)
    diff = np.abs(ref.astype(int) - out.astype(int))
    assert diff.max() <= 1


def test_v2_tile_plan_alignment(rng):
    """N=3 upscales must not produce non-sublane-aligned row tiles
    (regression: 48->144 rows planned a 129-row tile, which Mosaic
    rejects); odd/anisotropic/partial-tile shapes all lower."""
    import jax
    import jax.numpy as jnp

    cases = [
        dict(shape=(48, 40), scale=(3, 1), a=2),
        dict(shape=(30, 40), out_shape=(90, 80), a=3),
        dict(shape=(100, 136), scale=(2, 1), a=3),
        dict(shape=(129, 131), scale=(2, 1), a=3),
    ]
    for c in cases:
        kw = {k: v for k, v in c.items() if k not in ("shape",)}
        cfg = ResampleConfig.from_profile(Profile.PRECISE, c["shape"], **kw)
        ops = PallasOps(cfg, interpret=True)
        assert ops.v2
        assert ops.pv.tile_out % 8 == 0 or ops.pv.num_tiles == 1
        img = rng.integers(0, 256, size=(3, *c["shape"]), dtype=np.uint8)
        out = np.asarray(
            jax.jit(lambda x, o=ops: upscale_planar(x, o))(jnp.asarray(img))
        )
        ref = np.asarray(Upscaler(cfg, backend="xla")(np.moveaxis(img, 0, -1)))
        np.testing.assert_array_equal(out, np.moveaxis(ref, -1, 0))


@pytest.mark.parametrize("scale", [(2, 1), (3, 1)])
def test_mxu_matches_xla_upscale(rng, scale, small_img):
    """MXU variant (dense bf16-split matmuls, unpadded input) vs gather."""
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, small_img.shape[:2], scale=scale, a=3
    )
    ref = np.asarray(Upscaler(cfg, backend="xla")(small_img))
    out = _run_pallas(cfg, small_img, variant="mxu")
    diff = np.abs(ref.astype(int) - out.astype(int))
    assert diff.max() <= 1, f"max diff {diff.max()}"
    assert (diff > 0).mean() < 0.02


@pytest.mark.parametrize(
    "scale, align, shape",
    [
        ((3, 2), "zero", (60, 80)),  # rational upscale
        ((7, 5), "zero", (60, 80)),
        ((3, 2), "center", (60, 80)),
        ((1, 2), "zero", (60, 80)),  # antialiased downscale (support widens)
        ((2, 3), "center", (60, 90)),
    ],
)
def test_mxu_rational_and_downscale(rng, scale, align, shape):
    """Generalized MXU plan: per-tile/per-block dense matrices cover any
    linear N/D, incl. downscales, matching the gather reference <= 1 LSB
    (bf16-split summation order)."""
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, shape, scale=scale, a=3, align=align
    )
    img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    ref = np.asarray(Upscaler(cfg, backend="xla")(img))
    out = _run_pallas(cfg, img, variant="mxu")
    diff = np.abs(ref.astype(int) - out.astype(int))
    assert diff.max() <= 1, f"max diff {diff.max()}"


@pytest.mark.parametrize(
    "edge, normalize",
    [
        (EdgeMode.CLAMP, True),
        (EdgeMode.REFLECT, True),
        (EdgeMode.DROP, False),
        (EdgeMode.DROP, True),  # fused drop+normalize: MXU-only capability
    ],
)
def test_mxu_edge_modes(rng, edge, normalize, small_img):
    """Edge semantics live in the per-tile/per-block weight matrices (no
    input padding) — including drop+normalize, which no padded kernel can
    express (per-row renormalization over surviving taps)."""
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, small_img.shape[:2], scale=(2, 1), a=3,
        edge_mode=edge, normalize=normalize,
    )
    ref = np.asarray(Upscaler(cfg, backend="xla")(small_img))
    out = _run_pallas(cfg, small_img, variant="mxu")
    diff = np.abs(ref.astype(int) - out.astype(int))
    assert diff.max() <= 1


def test_mxu_batched_planar_and_partial_tiles(rng):
    """Batched planar == interleaved; odd dims exercise the row/lane
    alignment pads and partial output tiles."""
    shape = (51, 45)
    cfg = ResampleConfig.from_profile(Profile.PRECISE, shape, scale=(2, 1), a=2)
    imgs = rng.integers(0, 256, size=(2, *shape, 3), dtype=np.uint8)
    ops = PallasOps(cfg, interpret=True, variant="mxu")
    planar = np.transpose(imgs, (0, 3, 1, 2)).copy()
    out_p = np.asarray(upscale_planar(planar, ops))
    out_i = np.asarray(resample_2d_pallas(imgs, ops))
    np.testing.assert_array_equal(np.transpose(out_p, (0, 2, 3, 1)), out_i)
    ref = np.asarray(Upscaler(cfg, backend="xla")(imgs[0]))
    assert np.abs(ref.astype(int) - out_i[0].astype(int)).max() <= 1


@pytest.mark.parametrize(
    "scale, edge",
    [
        ((2, 1), EdgeMode.CLAMP),
        ((3, 1), EdgeMode.REFLECT),
        ((3, 2), EdgeMode.CLAMP),  # rational dering: MXU-only fused path
    ],
)
def test_mxu_dering(rng, scale, edge):
    """FSR dering clamp fused via one-hot central-tap bound rows/cols in
    the same matmuls (worker.cpp:64-75): bounds are exact (uint8 one-hots
    vertically; m_hi·S + m_lo·S = mid horizontally), so agreement with the
    gather path stays <= 1 LSB."""
    shape = (60, 80)
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, shape, scale=scale, a=3, dering=True, edge_mode=edge
    )
    img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    ref = np.asarray(Upscaler(cfg, backend="xla")(img))
    out = _run_pallas(cfg, img, variant="mxu")
    diff = np.abs(ref.astype(int) - out.astype(int))
    assert diff.max() <= 1, f"max diff {diff.max()}"


@pytest.mark.parametrize(
    "ins, outs",
    [
        ((60, 80), (120, 120)),  # 2x vertical, 3/2 horizontal
        ((64, 90), (32, 135)),   # downscale vertical, upscale horizontal
        ((50, 64), (175, 64)),   # 7/2 vertical, identity horizontal
    ],
)
def test_mxu_anisotropic(rng, ins, outs):
    """Per-axis independent plans: mixed up/down/identity scales."""
    cfg = ResampleConfig.from_profile(Profile.PRECISE, ins, out_shape=outs, a=3)
    img = rng.integers(0, 256, size=(*ins, 3), dtype=np.uint8)
    ref = np.asarray(Upscaler(cfg, backend="xla")(img))
    out = _run_pallas(cfg, img, variant="mxu")
    assert np.abs(ref.astype(int) - out.astype(int)).max() <= 1


def test_mxu_dering_order_and_drop_gates(rng):
    """Width-first dering has no RAW fused plan (it delegates through the
    transposed config instead); drop-edge dering fuses directly — the
    one-hot bound selectors use the operator's clipped tap indices, which
    is exactly the gather path's x[idx[a-1]]/x[idx[a]] clamp."""
    from lanczos_tpu.core.config import Order
    from lanczos_tpu.ops.resample_pallas import _mxu_plan

    wf = ResampleConfig.from_profile(
        Profile.PRECISE, (48, 64), scale=(2, 1), a=3, dering=True,
        order=Order.WIDTH_FIRST,
    )
    assert _mxu_plan(wf) is None
    for norm in (False, True):
        dr = ResampleConfig.from_profile(
            Profile.PRECISE, (48, 64), scale=(3, 2), a=3, dering=True,
            edge_mode=EdgeMode.DROP, normalize=norm,
        )
        assert _mxu_plan(dr) is not None
        img = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
        ref = np.asarray(Upscaler(dr, backend="xla")(img))
        out = _run_pallas(dr, img, variant="mxu")
        diff = np.abs(ref.astype(int) - out.astype(int))
        assert diff.max() <= 1, f"norm={norm} max diff {diff.max()}"


def test_mxu_intermediate_quantize(rng):
    """uint8-quantized intermediate (full_TB.h:63) fused in-kernel: the
    mid split disappears (integers are exact in bf16) and output matches
    the gather path's quantize-between-passes <= 1 LSB.  WIDTH_FIRST order
    is observable through the nonlinearity, so its plan is refused."""
    from lanczos_tpu.core.config import Order
    from lanczos_tpu.ops.resample_pallas import _mxu_plan

    shape = (48, 64)
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, shape, scale=(2, 1), a=3, intermediate_quantize=True
    )
    img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    ref = np.asarray(Upscaler(cfg, backend="xla")(img))
    out = _run_pallas(cfg, img, variant="mxu")
    diff = np.abs(ref.astype(int) - out.astype(int))
    assert diff.max() <= 1, f"max diff {diff.max()}"
    wf = ResampleConfig.from_profile(
        Profile.PRECISE, shape, scale=(2, 1), a=3,
        intermediate_quantize=True, order=Order.WIDTH_FIRST,
    )
    # the raw plan is height-first only...
    assert _mxu_plan(wf) is None
    # ...but PallasOps routes width-first through the height-first kernel
    # on the transposed image (tr_ops), matching the gather path exactly
    # up to summation-order LSBs
    ref_wf = np.asarray(Upscaler(wf, backend="xla")(img))
    out_wf = _run_pallas(wf, img, variant="mxu")
    diff_wf = np.abs(ref_wf.astype(int) - out_wf.astype(int))
    assert diff_wf.max() <= 1, f"max diff {diff_wf.max()}"
    # pass order is genuinely observable through the quantize: the two
    # orders disagree on this image, so the transpose trick is load-bearing
    assert not np.array_equal(ref_wf, ref)


def test_mxu_width_first_dering(rng):
    """Width-first dering rides the same transposed-kernel delegation."""
    from lanczos_tpu.core.config import Order

    shape = (40, 56)
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, shape, scale=(3, 2), a=3, dering=True,
        order=Order.WIDTH_FIRST,
    )
    img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    ref = np.asarray(Upscaler(cfg, backend="xla")(img))
    out = _run_pallas(cfg, img, variant="mxu")
    diff = np.abs(ref.astype(int) - out.astype(int))
    assert diff.max() <= 1, f"max diff {diff.max()}"
    # batched planar goes through the same delegation
    ops = PallasOps(cfg, interpret=True, variant="mxu")
    assert ops.tr_ops is not None
    batch = np.stack([img, img[::-1].copy()])
    planar = np.transpose(batch, (0, 3, 1, 2)).copy()
    out_p = np.transpose(np.asarray(upscale_planar(planar, ops)), (0, 2, 3, 1))
    np.testing.assert_array_equal(out_p[0], out)


def test_mxu_eligibility():
    """Any linear config plans (incl. rational scales and downscales);
    dering raises for variant='mxu'; variant='auto' keeps v2 on CPU
    (bit-exact test semantics preserved)."""
    rational = ResampleConfig.from_profile(
        Profile.PRECISE, (24, 20), scale=(3, 2), a=2
    )
    assert PallasOps(rational, interpret=True, variant="mxu").mxu is not None
    down = ResampleConfig.from_profile(
        Profile.PRECISE, (24, 20), scale=(1, 2), a=2
    )
    assert PallasOps(down, interpret=True, variant="mxu").mxu is not None
    dering = ResampleConfig.from_profile(
        Profile.PRECISE, (24, 20), scale=(2, 1), a=2, dering=True
    )
    assert PallasOps(dering, interpret=True, variant="mxu").mxu is not None
    drop_dering = ResampleConfig.from_profile(
        Profile.PRECISE, (24, 20), scale=(2, 1), a=2, dering=True,
        edge_mode=EdgeMode.DROP,
    )
    assert PallasOps(drop_dering, interpret=True, variant="mxu").mxu is not None
    ok = ResampleConfig.from_profile(Profile.PRECISE, (24, 20), scale=(2, 1), a=2)
    assert PallasOps(ok, interpret=True, variant="auto").mxu is None
    assert PallasOps(ok, interpret=True, variant="mxu").mxu is not None


def test_mxu_horizontal_block_dedup():
    """Interior column blocks share one matrix (phase-LUT invariance,
    kernel.cpp:50-59): a 4K-wide 2x plan needs <= 3 distinct matrices."""
    from lanczos_tpu.ops.resample_pallas import _mxu_plan

    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, (2160, 3840), out_shape=(4320, 7680), a=3
    )
    plan = _mxu_plan(cfg)
    assert plan is not None
    assert plan.wh.shape[0] <= 3
    assert plan.n_cb == 60


def test_v1_tile_plan_alignment():
    """Mosaic's output-block rule (sublanes %8, lanes %128, unless the
    block spans the axis) must hold for the v1 (rational-scale) planner
    too (regression: 256x384 x3/2 planned a 258-row tile and a 576-lane
    tile over a 576-wide axis — the former crashed lowering on hardware)."""
    cases = [
        ((256, 384), (384, 576), 2),   # the observed crash
        ((2160, 3840), (3240, 5760), 3),  # 4K x3/2
        ((720, 960), (1008, 1344), 3),  # x7/5
        ((300, 500), (180, 300), 2),   # downscale x3/5
        ((64, 4096), (96, 6144), 2),   # wide: multiple column tiles
    ]
    for in_shape, out_shape, a in cases:
        cfg = ResampleConfig.from_profile(
            Profile.PRECISE, in_shape, out_shape=out_shape, a=a
        )
        ops = PallasOps(cfg, interpret=True)
        pv, ph = ops.pv, ops.ph
        assert pv.tile_out % 8 == 0 or pv.num_tiles == 1, (in_shape, out_shape)
        assert ph.tile_out % 128 == 0 or ph.num_tiles == 1, (in_shape, out_shape)
        if ph.num_tiles > 1:
            assert ph.stride_in % 128 == 0, (in_shape, out_shape)
