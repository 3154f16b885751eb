"""Accuracy metrics.

The reference's single quality metric is an RMS error print over all
channels (``full_TB.h:143-166``); we keep it and add PSNR (the BASELINE.md
target is PSNR ≥ 60 dB vs the reference C path).
"""

from __future__ import annotations

import numpy as np


def rms_error(a, b) -> float:
    """RMS over all elements, computed as the reference does
    (``full_TB.h:160-166``): integer diffs, squared, averaged, sqrt."""
    a = np.asarray(a).astype(np.float64)
    b = np.asarray(b).astype(np.float64)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    return float(np.sqrt(np.mean((a - b) ** 2)))


def psnr(a, b, peak: float = 255.0) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical inputs."""
    r = rms_error(a, b)
    if r == 0.0:
        return float("inf")
    return float(20.0 * np.log10(peak / r))


def max_abs_err(a, b) -> float:
    a = np.asarray(a).astype(np.float64)
    b = np.asarray(b).astype(np.float64)
    if a.shape != b.shape:  # same contract as rms_error: no broadcasting
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    return float(np.max(np.abs(a - b)))
