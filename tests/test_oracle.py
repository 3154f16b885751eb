"""C-oracle fidelity: the NumPy oracle must behave exactly like
``lanczos_expected`` (full_TB.h:79-96), including its quirks."""

import numpy as np
import pytest

from lanczos_tpu.ref.oracle import (
    _double_to_uint8,
    c_oracle_upscale,
    oracle_resample_axis0,
)


def scalar_c_oracle(img, out_h, out_w, a):
    """Element-at-a-time transliteration of the C algorithm's *semantics*
    (independent of the vectorized implementation)."""
    in_h, in_w, nc = img.shape
    scale_w = out_w / in_w
    scale_h = out_h / in_h

    def lk(x):
        def sinc(v):
            return 1.0 if v == 0 else np.sin(v) / v

        return sinc(np.pi * x) * sinc(np.pi * x / a)

    def to_u8(x):
        if x > 255:
            return 255
        if x < 0:
            return 0
        return int(x)  # trunc toward zero

    buf = np.zeros((out_h, out_w, nc), dtype=np.uint8)
    # row pass on each input row
    for r in range(in_h):
        for c in range(nc):
            for xx in range(out_w):
                x = xx / scale_w
                s = 0.0
                for i in range(
                    max(0, int(np.floor(x)) - a + 1),
                    min(in_w - 1, int(np.floor(x)) + a) + 1,
                ):
                    s += float(img[r, i, c]) * lk(x - i)
                buf[r, xx, c] = to_u8(s)
    # col pass, in place, descending (full_TB.h:67-77)
    for col in range(out_w):
        for c in range(nc):
            for xx in range(out_h - 1, -1, -1):
                x = xx / scale_h
                s = 0.0
                for i in range(
                    max(0, int(np.floor(x)) - a + 1),
                    min(in_h - 1, int(np.floor(x)) + a) + 1,
                ):
                    s += float(buf[i, col, c]) * lk(x - i)
                buf[xx, col, c] = to_u8(s)
    return buf


def test_double_to_uint8():
    x = np.array([-3.0, 0.0, 0.9, 254.99, 255.0, 255.7, 300.0])
    np.testing.assert_array_equal(
        _double_to_uint8(x), np.array([0, 0, 0, 254, 255, 255, 255], np.uint8)
    )


@pytest.mark.parametrize("a", [2, 3])
@pytest.mark.parametrize("shape,out", [((8, 6), (16, 12)), ((9, 6), (27, 18)), ((8, 6), (12, 9))])
def test_vectorized_oracle_matches_scalar(a, shape, out, rng):
    img = rng.integers(0, 256, size=shape + (3,)).astype(np.uint8)
    got = c_oracle_upscale(img, out[0], out[1], a)
    want = scalar_c_oracle(img, out[0], out[1], a)
    np.testing.assert_array_equal(got, want)


def test_oracle_quirk_rows_differ_from_pure_pass(rng):
    """The in-place col pass makes the top rows differ from a pure
    two-buffer implementation — assert the quirk is actually reproduced."""
    img = rng.integers(0, 256, size=(16, 12, 3)).astype(np.uint8)
    a, oh, ow = 2, 32, 24
    got = c_oracle_upscale(img, oh, ow, a)

    # pure (non-in-place) version
    row = oracle_resample_axis0(img.transpose(1, 0, 2), ow, a).transpose(1, 0, 2)
    mid = _double_to_uint8(row)
    col = oracle_resample_axis0(mid.astype(np.float64), oh, a)
    pure = _double_to_uint8(col)

    assert np.array_equal(got[8:], pure[8:])  # bulk identical
    assert not np.array_equal(got[:4], pure[:4])  # top rows show the quirk


def test_constant_image_interior():
    """A constant image stays nearly constant in the interior.  The oracle's
    weights are unnormalized; Lanczos-2 half-phase rows sum to ~1.019, so two
    passes brighten a 128 constant by up to ~5 LSB — reference behavior."""
    img = np.full((16, 16, 3), 128, np.uint8)
    out = c_oracle_upscale(img, 32, 32, 2)
    interior = out[6:-6, 6:-6]
    assert np.abs(interior.astype(int) - 128).max() <= 5
