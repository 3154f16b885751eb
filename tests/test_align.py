"""Center-aligned (half-pixel) coordinate convention."""

import numpy as np
import pytest

from lanczos_tpu.core.config import Align, EdgeMode, Profile, ResampleConfig
from lanczos_tpu.core.weights import banded_weights
from lanczos_tpu.models.upscaler import Upscaler


def _cfg(scale, a=3, **kw):
    n, d = scale
    return ResampleConfig.from_profile(
        Profile.PRECISE, (16 * d, 12 * d), scale=scale, a=a,
        align="center", **kw,
    )


def test_center_weights_match_float_formula():
    """Exact-rational band == direct float evaluation of (y+.5)D/N-.5."""
    for in_size, out_size in [(10, 20), (12, 18), (20, 10)]:
        op = banded_weights(in_size, out_size, 3, align="center")
        n, d = out_size // np.gcd(in_size, out_size), in_size // np.gcd(in_size, out_size)
        y = np.arange(out_size)
        x = (y + 0.5) * in_size / out_size - 0.5
        fl = np.floor(x).astype(int)
        np.testing.assert_array_equal(op.base, fl - op.a + 1)


@pytest.mark.parametrize("scale", [(2, 1), (3, 1), (3, 2), (1, 2)])
def test_center_backends_agree(rng, scale):
    n, d = scale
    cfg = _cfg(scale)
    img = rng.integers(0, 256, size=(*cfg.in_shape, 3), dtype=np.uint8)
    ref = np.asarray(Upscaler(cfg, backend="xla")(img))
    for b in ("shift_xla", "pallas"):
        out = np.asarray(Upscaler(cfg, backend=b)(img))
        diff = np.abs(ref.astype(int) - out.astype(int))
        assert diff.max() <= 1, f"{b} {scale}: {diff.max()}"


def test_center_flip_equivariance(rng):
    """Unlike zero-align, center-align IS flip-equivariant."""
    cfg = _cfg((2, 1), a=2)
    img = rng.integers(0, 256, size=(*cfg.in_shape, 3), dtype=np.uint8)
    m = Upscaler(cfg, backend="xla")
    a_ = np.asarray(m(img[::-1].copy()))
    b_ = np.asarray(m(img))[::-1]
    assert np.abs(a_.astype(int) - b_.astype(int)).max() <= 1


def test_center_matches_pil(rng):
    """Sanity vs PIL's Lanczos resize (same convention, its own fixed-point
    weights → close but not identical)."""
    PIL = pytest.importorskip("PIL.Image")
    from lanczos_tpu.utils.metrics import psnr

    img = rng.integers(0, 256, size=(32, 24, 3), dtype=np.uint8)
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, (32, 24), scale=(2, 1), a=3, align="center"
    )
    ours = np.asarray(Upscaler(cfg, backend="xla")(img))
    theirs = np.asarray(
        PIL.fromarray(img).resize((48, 64), PIL.Resampling.LANCZOS)
    )
    assert psnr(ours, theirs) > 35.0


def test_center_rejects_parity_paths():
    with pytest.raises(ValueError):
        ResampleConfig.from_profile(
            Profile.HLS, (16, 16), scale=(2, 1), a=2, align="center"
        )
    with pytest.raises(ValueError):
        ResampleConfig.from_profile(
            Profile.C_ORACLE, (16, 16), scale=(2, 1), a=2, align="center"
        )


def test_center_sharded_and_streaming(rng):
    import jax

    from lanczos_tpu.models.streaming import StreamingUpscaler
    from lanczos_tpu.parallel.sharded import ShardedUpscaler

    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, (32, 16), scale=(2, 1), a=2, align="center"
    )
    img = rng.integers(0, 256, size=(32, 16, 3), dtype=np.uint8)
    ref = np.asarray(Upscaler(cfg, backend="xla")(img))

    mesh = jax.make_mesh((1, 4), ("data", "rows"))
    out_sh = np.asarray(ShardedUpscaler(cfg, mesh)(img[None]))[0]
    np.testing.assert_array_equal(out_sh, ref)

    out_st = StreamingUpscaler(cfg, chunk_rows=16)(img)
    np.testing.assert_array_equal(out_st, ref)


def test_ref_backend_honors_center_align(rng):
    """clean_resample_2d passes cfg.align through (regression: the ref
    backend built zero-aligned weights for center-aligned configs — a
    half-pixel-shifted, silently wrong oracle)."""
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, (16, 12), scale=(2, 1), a=2, align="center"
    )
    img = rng.integers(0, 256, size=(16, 12, 3), dtype=np.uint8)
    dev = np.asarray(Upscaler(cfg, backend="xla")(img)).astype(np.float64)
    ref = np.asarray(Upscaler(cfg, backend="ref")(img))
    ref = np.clip(ref, 0, 255)
    assert np.abs(dev - ref).max() <= 1.0
