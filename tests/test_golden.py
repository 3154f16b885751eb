"""Golden-image regression tests.

The integer-exact profiles (c_oracle, hls) must reproduce the checked-in
outputs bit-for-bit on any platform — any drift means the reference
semantics were broken.  The float precise profile is checked to ≤1 ULP
against its golden (f32 summation differences across backends/platforms
can flip a truncation boundary).
"""

import os

import numpy as np
import pytest

from lanczos_tpu.core.config import Profile, ResampleConfig
from lanczos_tpu.io import read_png
from lanczos_tpu.models.upscaler import Upscaler

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def golden_input():
    return read_png(os.path.join(DATA, "input_48x40.png"))


@pytest.mark.parametrize("profile,a", [("c_oracle", 2), ("hls", 2)])
def test_integer_profiles_bit_exact(golden_input, profile, a):
    cfg = ResampleConfig.from_profile(profile, (48, 40), scale=(2, 1), a=a)
    out = np.asarray(Upscaler(cfg)(golden_input))
    want = read_png(os.path.join(DATA, f"golden_{profile}_2x_a{a}.png"))
    np.testing.assert_array_equal(out, want)


@pytest.mark.parametrize(
    "profile,scale,a,bp,name",
    [
        ("c_oracle", (2, 1), 3, None, "golden_c_oracle_2x_a3.png"),
        ("hls", (2, 1), 3, None, "golden_hls_2x_a3.png"),
        ("c_oracle", (3, 2), 2, None, "golden_c_oracle_3over2_a2.png"),
        ("hls", (3, 2), 2, None, "golden_hls_3over2_a2.png"),
        ("hls", (2, 1), 2, 6, "golden_hls_2x_a2_p6.png"),
        ("hls", (2, 1), 2, 10, "golden_hls_2x_a2_p10.png"),
    ],
)
def test_extended_goldens_bit_exact(golden_input, profile, scale, a, bp, name):
    """Round-2 coverage: a=3, a rational scale, and bit_precision ∈ {6, 10}
    — all integer-exact paths, pinned bit-for-bit."""
    kw = dict(scale=scale, a=a)
    if bp is not None:
        kw["bit_precision"] = bp
    cfg = ResampleConfig.from_profile(profile, (48, 40), **kw)
    out = np.asarray(Upscaler(cfg)(golden_input))
    want = read_png(os.path.join(DATA, name))
    np.testing.assert_array_equal(out, want)


def test_precise_profile_close_across_backends(golden_input):
    cfg = ResampleConfig.from_profile(Profile.PRECISE, (48, 40), scale=(2, 1), a=3)
    outs = {
        b: np.asarray(Upscaler(cfg, backend=b)(golden_input))
        for b in ("xla", "shift_xla", "pallas")
    }
    for b, out in outs.items():
        diff = np.abs(outs["xla"].astype(int) - out.astype(int))
        assert diff.max() <= 1, f"backend {b} drifted: {diff.max()}"
