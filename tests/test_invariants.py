"""Structural invariants of the resampling operators (all backends).

Cheap properties that catch whole classes of index/weight bugs:
constant preservation, flip equivariance, partition of unity.
"""

import numpy as np
import pytest

from lanczos_tpu.core.config import EdgeMode, Profile, ResampleConfig
from lanczos_tpu.core.weights import banded_weights
from lanczos_tpu.models.upscaler import Upscaler

BACKENDS = ("xla", "shift_xla", "pallas")


@pytest.mark.parametrize("backend", BACKENDS)
def test_constant_image_preserved(backend):
    """Normalized weights + clamp edges must reproduce a constant exactly."""
    img = np.full((24, 20, 3), 137, np.uint8)
    cfg = ResampleConfig.from_profile(Profile.PRECISE, (24, 20), scale=(2, 1), a=3)
    out = np.asarray(Upscaler(cfg, backend=backend)(img))
    np.testing.assert_array_equal(out, np.full((48, 40, 3), 137, np.uint8))


@pytest.mark.parametrize("backend", BACKENDS)
def test_transpose_equivariance(rng, backend):
    """Transposing the image commutes with resampling when both axes use
    the same scale (the two separable passes are the same 1-D operator).

    Note: FLIP equivariance does NOT hold — the reference's sample-0-
    aligned coordinate convention (full_TB.h:57) is asymmetric under
    reversal, and this framework matches the reference.
    """
    img = rng.integers(0, 256, size=(20, 20, 3), dtype=np.uint8)
    cfg = ResampleConfig.from_profile(Profile.PRECISE, (20, 20), scale=(2, 1), a=2)
    m = Upscaler(cfg, backend=backend)
    a_ = np.asarray(m(np.swapaxes(img, 0, 1).copy()))
    b_ = np.swapaxes(np.asarray(m(img)), 0, 1)
    # pass order swaps → float summation differs → ≤1 ULP
    assert np.abs(a_.astype(int) - b_.astype(int)).max() <= 1


def test_partition_of_unity():
    """Normalized banded weights sum to 1 per output position."""
    for scale in [(2, 1), (3, 2), (7, 3), (1, 2)]:
        n, d = scale
        op = banded_weights(24 * d, 24 * n, 3, "lanczos", EdgeMode.CLAMP, True)
        np.testing.assert_allclose(op.weights.sum(axis=1), 1.0, atol=1e-12)


def test_identity_scale():
    """Scale 1/1 with normalized weights is the identity."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    cfg = ResampleConfig.from_profile(Profile.PRECISE, (16, 16), scale=(1, 1), a=3)
    out = np.asarray(Upscaler(cfg, backend="xla")(img))
    np.testing.assert_array_equal(out, img)


def test_channel_independence(rng):
    """Channels resample independently."""
    img = rng.integers(0, 256, size=(16, 12, 3), dtype=np.uint8)
    cfg = ResampleConfig.from_profile(Profile.PRECISE, (16, 12), scale=(2, 1), a=2)
    m = Upscaler(cfg, backend="xla")
    full = np.asarray(m(img))
    for c in range(3):
        mono = np.repeat(img[..., c : c + 1], 3, axis=-1)
        np.testing.assert_array_equal(np.asarray(m(mono))[..., 0], full[..., c])


def test_channel_counts_and_2d_gray(rng):
    """The API accepts any channel count (the reference's NUM_CHANNELS is a
    free macro) and treats a bare 2-D image as 1-channel grayscale
    (stb req_comp=1 behavior), returning it 2-D."""
    from lanczos_tpu.models.upscaler import upscale

    base = rng.integers(0, 256, size=(32, 24, 4), dtype=np.uint8)
    for c in (1, 2, 4):
        out = np.asarray(upscale(base[..., :c], scale=(2, 1), a=2))
        assert out.shape == (64, 48, c)
        # channels resample independently: channel c of the RGBA result
        # equals the 1-channel result of that channel alone
        solo = np.asarray(upscale(base[..., c - 1 : c], scale=(2, 1), a=2))
        np.testing.assert_array_equal(out[..., -1:], solo)

    gray = np.asarray(upscale(base[..., 0], scale=(2, 1), a=2))
    assert gray.shape == (64, 48)
    np.testing.assert_array_equal(
        gray, np.asarray(upscale(base[..., :1], scale=(2, 1), a=2))[..., 0]
    )


def test_uint16_io_contract(rng):
    """uint16 in → uint16 out via the float path + 16-bit trunc-clip; the
    sub-uint8 detail survives and the result tracks the uint8 path."""
    import numpy as np

    from lanczos_tpu.core.config import Profile, ResampleConfig
    from lanczos_tpu.models.upscaler import Upscaler

    ins = (32, 24)
    cfg = ResampleConfig.from_profile(Profile.PRECISE, ins, scale=(2, 1), a=3)
    img8 = rng.integers(0, 256, size=(*ins, 3), dtype=np.uint8)
    img16 = img8.astype(np.uint16) * 257
    for backend in ("shift_xla", "block", "xla"):
        up = Upscaler(cfg, backend=backend)
        out16 = np.asarray(up(img16))
        assert out16.dtype == np.uint16 and out16.shape == (64, 48, 3)
        out8 = np.asarray(up(img8)).astype(np.int64)
        # same pixels at 16-bit width: the two quantizations agree to 1 LSB8
        d = np.abs(np.rint(out16 / 257.0).astype(np.int64) - out8)
        assert d.max() <= 1, f"{backend}: max diff {d.max()}"
    # sub-uint8 detail: a ramp with step 64 (< 257) must not collapse
    ramp = (np.arange(24, dtype=np.uint16) * 64)[None, :, None]
    ramp = np.broadcast_to(ramp, (*ins, 3)).copy()
    out = np.asarray(Upscaler(cfg, backend="shift_xla")(ramp))
    assert len(np.unique(out[:, :, 0])) > 24  # interpolated sub-steps survive


def test_uint16_rejected_on_exact_backends(rng):
    import numpy as np
    import pytest

    from lanczos_tpu.core.config import Profile, ResampleConfig
    from lanczos_tpu.models.upscaler import Upscaler

    cfg = ResampleConfig.from_profile(Profile.HLS, (16, 16), scale=(2, 1), a=2)
    img16 = rng.integers(0, 65536, size=(16, 16, 3), dtype=np.uint16)
    with pytest.raises(ValueError, match="uint16"):
        Upscaler(cfg)(img16)


def test_uint16_ref_backend(rng):
    """The ref backend under PRECISE is float/dtype-agnostic, so uint16
    must work there too (deep Y4M with backend='ref')."""
    import numpy as np

    from lanczos_tpu.core.config import Profile, ResampleConfig
    from lanczos_tpu.models.upscaler import Upscaler

    cfg = ResampleConfig.from_profile(Profile.PRECISE, (16, 12), scale=(2, 1), a=2)
    img16 = rng.integers(0, 65536, size=(16, 12, 3), dtype=np.uint16)
    out = np.asarray(Upscaler(cfg, backend="ref")(img16))
    assert out.dtype == np.uint16 and out.shape == (32, 24, 3)


def test_functional_upscale_caches_upscaler(rng):
    """Repeat upscale() calls with one config reuse the compiled model."""
    import numpy as np

    from lanczos_tpu import upscale
    from lanczos_tpu.models.upscaler import _cached_upscaler

    _cached_upscaler.cache_clear()
    img = rng.integers(0, 256, size=(16, 12, 3), dtype=np.uint8)
    a = np.asarray(upscale(img, scale=(2, 1), a=2))
    b = np.asarray(upscale(img, scale=(2, 1), a=2))
    np.testing.assert_array_equal(a, b)
    info = _cached_upscaler.cache_info()
    assert info.hits == 1 and info.misses == 1


def test_upscale_cache_bounded_by_bytes(rng):
    """Cycling many configs through upscale() must not pin unbounded
    device memory: the cache evicts by total estimated table bytes, not
    just entry count (round-3 verdict #7)."""
    import numpy as np

    from lanczos_tpu import upscale
    from lanczos_tpu.models.upscaler import (
        _cached_upscaler,
        _device_table_bytes,
    )

    _cached_upscaler.cache_clear()
    old_bytes, old_entries = (
        _cached_upscaler.max_bytes,
        _cached_upscaler.max_entries,
    )
    try:
        _cached_upscaler.max_bytes = 100 << 10  # 100 KB: forces byte eviction
        img = rng.integers(0, 256, size=(32, 24, 3), dtype=np.uint8)
        for n in range(2, 16):  # 14 distinct configs
            upscale(img, scale=(n, 1), a=2, backend="xla")
        info = _cached_upscaler.cache_info()
        assert info.currbytes <= max(
            100 << 10,
            max(s for _, s in _cached_upscaler._data.values()),
        )
        assert info.currsize < 14  # something was evicted by bytes
        # newest entry always survives
        assert info.currsize >= 1
        # footprint estimator sees the weight tables
        m = next(iter(_cached_upscaler._data.values()))[0]
        assert _device_table_bytes(m) > 0
    finally:
        _cached_upscaler.max_bytes = old_bytes
        _cached_upscaler.max_entries = old_entries
        _cached_upscaler.cache_clear()


def test_upscale_cache_entry_bound_still_applies(rng):
    import numpy as np

    from lanczos_tpu import upscale
    from lanczos_tpu.models.upscaler import _cached_upscaler

    _cached_upscaler.cache_clear()
    old = _cached_upscaler.max_entries
    try:
        _cached_upscaler.max_entries = 3
        img = rng.integers(0, 256, size=(16, 12, 3), dtype=np.uint8)
        for n in range(2, 8):
            upscale(img, scale=(n, 1), a=2, backend="xla")
        assert _cached_upscaler.cache_info().currsize == 3
    finally:
        _cached_upscaler.max_entries = old
        _cached_upscaler.cache_clear()
