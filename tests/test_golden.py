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


def test_precise_profile_close_across_backends(golden_input):
    cfg = ResampleConfig.from_profile(Profile.PRECISE, (48, 40), scale=(2, 1), a=3)
    outs = {
        b: np.asarray(Upscaler(cfg, backend=b)(golden_input))
        for b in ("xla", "shift_xla", "pallas")
    }
    for b, out in outs.items():
        diff = np.abs(outs["xla"].astype(int) - out.astype(int))
        assert diff.max() <= 1, f"backend {b} drifted: {diff.max()}"
