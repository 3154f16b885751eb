"""Native C++ oracle height pass vs the pure-Python loop: bit-identical."""

import numpy as np
import pytest

import lanczos_tpu.ref.oracle as oracle_mod
from lanczos_tpu.ref.oracle import c_oracle_upscale


def test_native_matches_python(rng):
    if oracle_mod._oracle_native() is None:
        pytest.skip("no native oracle lib")
    img = rng.integers(0, 256, size=(40, 32, 3), dtype=np.uint8)
    native = c_oracle_upscale(img, 80, 64, 2)
    orig = oracle_mod._oracle_native
    try:
        oracle_mod._oracle_native = lambda: None
        python = c_oracle_upscale(img, 80, 64, 2)
    finally:
        oracle_mod._oracle_native = orig
    np.testing.assert_array_equal(native, python)


def test_native_oracle_speed_enables_big_frames(rng):
    """The native pass makes 512x512-class oracle runs near-instant."""
    if oracle_mod._oracle_native() is None:
        pytest.skip("no native oracle lib")
    import time

    img = rng.integers(0, 256, size=(256, 256, 3), dtype=np.uint8)
    t0 = time.perf_counter()
    out = c_oracle_upscale(img, 512, 512, 2)
    dt = time.perf_counter() - t0
    assert out.shape == (512, 512, 3)
    assert dt < 2.0
