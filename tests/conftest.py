"""Test configuration: run JAX on CPU with 8 virtual devices.

Multi-chip sharding logic is validated on a virtual CPU mesh (the TPU
analog of the reference's "csim as fake device" strategy — SURVEY.md §4);
real-chip numbers come from bench.py.
"""

import os

# Force CPU regardless of ambient JAX_PLATFORMS (the dev box exports a real
# TPU platform via a sitecustomize hook that registers it before conftest
# runs; jax.config.update overrides it even post-import).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def small_img(rng):
    """A 24x20 RGB uint8 test image with structure (gradients + noise)."""
    h, w = 24, 20
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (yy * 255 // max(h - 1, 1)),
            (xx * 255 // max(w - 1, 1)),
            ((yy + xx) * 255 // max(h + w - 2, 1)),
        ],
        axis=-1,
    ).astype(np.int64)
    noise = rng.integers(-40, 40, size=base.shape)
    return np.clip(base + noise, 0, 255).astype(np.uint8)
