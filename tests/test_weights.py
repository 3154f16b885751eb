"""Weight-table builders: golden values, phase structure, edge modes."""

import numpy as np
import pytest

from lanczos_tpu.core.config import EdgeMode, reduced_scale
from lanczos_tpu.core.filters import get_filter
from lanczos_tpu.core.weights import (
    PhaseWeights,
    banded_weights,
    fixed_point_weights,
    hls_lut,
    hls_schedule,
)


def brute_force_dense(in_size, out_size, a, edge=EdgeMode.DROP, normalize=False):
    """O(out·in) direct construction of the resampling matrix."""
    n, d = reduced_scale(in_size, out_size)
    R = np.zeros((out_size, in_size))
    for y in range(out_size):
        x = y * d / n
        fl = int(np.floor(x))
        w_all, idx_all = [], []
        for i in range(fl - a + 1, fl + a + 1):
            t = x - i
            w = np.sinc(t) * np.sinc(t / a) if abs(t) < a else 0.0
            w_all.append(w)
            idx_all.append(i)
        s = sum(w_all) if normalize else 1.0
        for w, i in zip(w_all, idx_all):
            if edge == EdgeMode.DROP:
                if 0 <= i < in_size:
                    R[y, i] += w / s
            elif edge == EdgeMode.CLAMP:
                R[y, min(max(i, 0), in_size - 1)] += w / s
    return R


@pytest.mark.parametrize("in_size,out_size,a", [(16, 32, 2), (16, 32, 3), (10, 30, 2), (20, 30, 3), (7, 21, 2)])
@pytest.mark.parametrize("edge", [EdgeMode.DROP, EdgeMode.CLAMP])
def test_banded_matches_brute_force(in_size, out_size, a, edge):
    op = banded_weights(in_size, out_size, a, "lanczos", edge, normalize=False)
    R = brute_force_dense(in_size, out_size, a, edge)
    np.testing.assert_allclose(op.dense(), R, atol=1e-14)


def test_normalized_rows_sum_to_one():
    op = banded_weights(17, 51, 3, "lanczos", EdgeMode.CLAMP, normalize=True)
    np.testing.assert_allclose(op.dense().sum(axis=1), 1.0, atol=1e-12)


def test_identity_scale():
    op = banded_weights(16, 16, 2, "lanczos", EdgeMode.CLAMP, normalize=True)
    np.testing.assert_allclose(op.dense(), np.eye(16), atol=1e-12)


def test_phase_structure():
    """Interior rows repeat with period N and stride D — the kernel.cpp:50-59
    invariant the whole design rests on."""
    in_size, out_size, a = 40, 60, 3  # N/D = 3/2
    op = banded_weights(in_size, out_size, a, "lanczos", EdgeMode.DROP, False)
    n, d = reduced_scale(in_size, out_size)
    for y in range(a * 2, out_size - a * 2 - n):
        np.testing.assert_allclose(op.weights[y], op.weights[y + n], atol=1e-14)
        assert op.base[y + n] - op.base[y] == d


def test_phase_weights_match_banded_interior():
    in_size, out_size, a = 40, 60, 2
    pw = PhaseWeights.build(in_size, out_size, a, normalize=False)
    op = banded_weights(in_size, out_size, a, "lanczos", EdgeMode.DROP, False)
    n, d = pw.n, pw.d
    for y in range(2 * a, out_size - 2 * a):
        p, k = y % n, y // n
        np.testing.assert_allclose(pw.table[p], op.weights[y], atol=1e-14)
        assert k * d + pw.off[p] == op.base[y]


def test_downscale_antialias_band_is_wider():
    op = banded_weights(32, 16, 2, "lanczos", EdgeMode.CLAMP, True)
    assert op.a == 4  # stretched support a·D/N = 2·2
    # downscaling a constant signal stays constant (normalized)
    np.testing.assert_allclose(op.dense() @ np.ones(32), 1.0, atol=1e-12)


def test_filters_registry():
    peaks = {"lanczos": 1.0, "triangle": 1.0, "box": 1.0,
             "mitchell": 8.0 / 9.0, "catmull_rom": 1.0}
    for name, peak in peaks.items():
        f = get_filter(name)
        assert f(np.array([0.0]), 2)[0] == pytest.approx(peak)
        # even symmetry
        t = np.linspace(-1.9, 1.9, 21)
        np.testing.assert_allclose(f(t, 2), f(-t, 2), atol=1e-15)


def test_hls_lut_values():
    """LUT[i] = floor(L(i/N)·2^P), LUT[aN] = 0 (kernel.cpp:40-45)."""
    a, n, P = 2, 2, 8
    lut = hls_lut(a, n, P)
    assert lut[0] == 256  # L(0) = 1.0
    assert lut[a * n] == 0
    # L(1/2) = sinc(.5)·sinc(.25) ≈ 0.63662·0.90032
    expected = np.floor(np.sinc(0.5) * np.sinc(0.25) * 256)
    assert lut[1] == expected
    assert lut[2] == 0  # L(1) = 0
    # negative lobe
    assert lut[3] < 0


def test_hls_schedule_2x():
    """2x upscale, a=2: window pre-rolled with one zero row, steps every
    other output row, replicates at the bottom."""
    s = hls_schedule(in_size=8, out_size=16, a=2, bit_precision=8)
    # first output row: window = [-1, 0, 1, 2] → zeros mask on slot 0
    assert list(s.eff_idx[0]) == [0, 0, 1, 2]
    assert list(s.valid[0]) == [False, True, True, True]
    # steps: q = 128, frac(128·k) < 128 ⟺ k even → step after odd y... y+1 even
    assert list(s.eff_idx[2]) == [0, 1, 2, 3]
    assert list(s.valid[2]) == [True] * 4
    # last row: saturated window replicating the bottom row
    assert s.eff_idx[15][-1] == 7
    assert not s.lut_overflow
    # LUT indices stay within the ROM for an exact scale
    assert s.lut_idx.max() <= 2 * 2


def test_hls_schedule_drift_scale3():
    """1/3 is inexact in 8 fractional bits — the quantized predicate drifts
    off the ideal pattern for large images (latent reference OOB)."""
    s = hls_schedule(in_size=300, out_size=900, a=2, bit_precision=8)
    assert s.lut_overflow  # documents the reference bug


def test_fixed_point_weights_truncate():
    op = banded_weights(8, 16, 2, "lanczos", EdgeMode.DROP, False)
    q = fixed_point_weights(op, 8)
    assert np.all(q <= np.ceil(op.weights * 256))
    assert np.all(q >= np.floor(op.weights * 256))
