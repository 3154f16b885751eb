"""XLA resampling path vs the NumPy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from lanczos_tpu.core.config import (
    EdgeMode,
    Order,
    Profile,
    ResampleConfig,
)
from lanczos_tpu.models.upscaler import Upscaler, upscale
from lanczos_tpu.ref.oracle import c_oracle_upscale, clean_resample_2d
from lanczos_tpu.utils.metrics import psnr


@pytest.mark.parametrize("a", [2, 3])
@pytest.mark.parametrize("scale", [(2, 1), (3, 1), (3, 2)])
def test_precise_matches_clean_numpy(a, scale, small_img):
    cfg = ResampleConfig.from_profile(Profile.PRECISE, small_img.shape[:2], scale=scale, a=a)
    got = np.asarray(Upscaler(cfg, backend="xla")(small_img))
    want_f = clean_resample_2d(small_img, cfg)
    want = np.trunc(np.clip(want_f, 0, 255)).astype(np.uint8)
    # fp32 vs fp64 can flip truncation at integer boundaries by 1 LSB
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
    assert psnr(got, want) > 55


@pytest.mark.parametrize("a", [2, 3])
@pytest.mark.parametrize("scale", [(2, 1), (3, 1), (3, 2), (4, 1)])
def test_c_oracle_profile_bit_near(a, scale, small_img):
    """The C_ORACLE profile on device must be bit-near the reference C
    path (PSNR ≥ 60 dB is the BASELINE.md contract; we typically get
    identical-or-±1 from fp32 accumulation)."""
    cfg = ResampleConfig.from_profile(Profile.C_ORACLE, small_img.shape[:2], scale=scale, a=a)
    got = np.asarray(Upscaler(cfg, backend="xla")(small_img))
    want = c_oracle_upscale(small_img, *cfg.out_shape, a)
    assert got.shape == want.shape
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1, f"max diff {diff.max()}"
    assert psnr(got, want) >= 60, f"PSNR {psnr(got, want):.2f} dB"


def test_c_oracle_non_square_scale(small_img):
    """Different H and W scales (generalization beyond the reference's
    single SCALE macro)."""
    h, w = small_img.shape[:2]
    cfg = ResampleConfig.from_profile(
        Profile.C_ORACLE, (h, w), out_shape=(h * 2, w * 3), a=2
    )
    got = np.asarray(Upscaler(cfg, backend="xla")(small_img))
    want = c_oracle_upscale(small_img, h * 2, w * 3, 2)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_batched(small_img, rng):
    imgs = np.stack([small_img, small_img[::-1].copy()])
    cfg = ResampleConfig.from_profile(Profile.PRECISE, small_img.shape[:2], scale=(2, 1), a=2)
    up = Upscaler(cfg, backend="xla")
    got = np.asarray(up(imgs))
    one = np.asarray(up(small_img))
    assert got.shape == (2, *one.shape)
    np.testing.assert_array_equal(got[0], one)


def test_float_input_passthrough(small_img):
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, small_img.shape[:2], scale=(2, 1), a=2
    )
    up = Upscaler(cfg, backend="xla")
    out = up(small_img.astype(np.float32))
    assert out.dtype == jnp.float32


def test_dering_clamps_overshoot():
    """A step edge overshoots with plain Lanczos; dering clamps it into the
    local range (worker.cpp:64-75 semantics)."""
    img = np.zeros((16, 16, 3), np.float32)
    img[8:] = 255.0
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, (16, 16), scale=(2, 1), a=3, dering=True
    )
    out = np.asarray(Upscaler(cfg, backend="xla")(img))
    assert out.min() >= 0.0 and out.max() <= 255.0
    cfg2 = ResampleConfig.from_profile(Profile.PRECISE, (16, 16), scale=(2, 1), a=3)
    out2 = np.asarray(Upscaler(cfg2, backend="xla")(img))
    assert out2.min() < -1.0 or out2.max() > 256.0  # raw path does ring


def test_upscale_functional_api(small_img):
    out = upscale(small_img, scale=(2, 1), profile="precise", a=2, backend="xla")
    assert out.shape == (48, 40, 3)
    assert out.dtype == jnp.uint8


def test_edge_modes_differ(small_img):
    outs = {}
    for mode in (EdgeMode.DROP, EdgeMode.CLAMP, EdgeMode.REFLECT):
        cfg = ResampleConfig.from_profile(
            Profile.PRECISE, small_img.shape[:2], scale=(2, 1), a=2,
            edge_mode=mode, normalize=False,
        )
        outs[mode] = np.asarray(Upscaler(cfg, backend="xla")(small_img))
    assert not np.array_equal(outs[EdgeMode.DROP], outs[EdgeMode.CLAMP])
    # interiors agree
    for m in outs:
        np.testing.assert_array_equal(outs[m][8:-8, 8:-8], outs[EdgeMode.DROP][8:-8, 8:-8])


def test_order_matters_with_quantization(small_img):
    base = dict(in_shape=small_img.shape[:2], out_shape=(48, 40), a=2,
                edge_mode=EdgeMode.DROP, normalize=False, intermediate_quantize=True)
    cfg_w = ResampleConfig(order=Order.WIDTH_FIRST, **base)
    cfg_h = ResampleConfig(order=Order.HEIGHT_FIRST, **base)
    ow = np.asarray(Upscaler(cfg_w, backend="xla")(small_img))
    oh = np.asarray(Upscaler(cfg_h, backend="xla")(small_img))
    assert ow.shape == oh.shape
    assert not np.array_equal(ow, oh)  # uint8 intermediate breaks commutativity


@pytest.mark.parametrize("backend", ["shift_xla", "xla", "block"])
def test_planar_api_matches_interleaved(rng, backend):
    """Upscaler.planar() (cached jit, no per-call retrace) == transposed
    interleaved output on every backend class."""
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, (24, 32), scale=(2, 1), a=2
    )
    m = Upscaler(cfg, backend=backend)
    x = rng.integers(0, 256, size=(3, 24, 32), dtype=np.uint8)
    yp = np.asarray(m.planar(jnp.asarray(x)))
    yp2 = np.asarray(m.planar(jnp.asarray(x)))  # second call: cached fn
    yi = np.asarray(m(jnp.asarray(np.moveaxis(x, 0, -1))))
    np.testing.assert_array_equal(yp, np.moveaxis(yi, -1, 0))
    np.testing.assert_array_equal(yp, yp2)
    # batched planar
    xb = rng.integers(0, 256, size=(2, 3, 24, 32), dtype=np.uint8)
    yb = np.asarray(m.planar(jnp.asarray(xb)))
    assert yb.shape == (2, 3, 48, 64)
