"""Bit-exactness of the device c_faithful path (ops/c_exact.py).

Round-2 regression: the former fp32 c_faithful path silently flipped ~2% of
pixels at a=3 because the reference's fp64 oracle truncates on residual
``sin(pi*n) ~ 1e-16`` weights that fp32 cannot see.  The integer-lattice
emulation must match :func:`c_oracle_upscale` — which is itself anchored
byte-for-byte to the *compiled* reference (tests/test_reference_compiled.py)
— for every a and scale.
"""

import numpy as np
import pytest

from lanczos_tpu.core.config import ResampleConfig
from lanczos_tpu.models.upscaler import Upscaler
from lanczos_tpu.ref.oracle import c_oracle_upscale


@pytest.mark.parametrize("a", [2, 3])
@pytest.mark.parametrize(
    "shape,scale",
    [((64, 48), (2, 1)), ((40, 48), (3, 1)), ((36, 44), (3, 2)), ((44, 40), (5, 4))],
)
def test_c_exact_bit_exact_vs_oracle(rng, a, shape, scale):
    h, w = shape
    n, d = scale
    cfg = ResampleConfig.from_profile("c_oracle", shape, scale=scale, a=a)
    up = Upscaler(cfg)
    assert up.backend == "c_exact"
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    got = np.asarray(up(img))
    want = c_oracle_upscale(img, h * n // d, w * n // d, a)
    np.testing.assert_array_equal(got, want)


def test_c_exact_batched(rng):
    cfg = ResampleConfig.from_profile("c_oracle", (32, 24), scale=(2, 1), a=3)
    up = Upscaler(cfg)
    imgs = rng.integers(0, 256, size=(3, 32, 24, 3), dtype=np.uint8)
    got = np.asarray(up(imgs))
    for b in range(3):
        np.testing.assert_array_equal(
            got[b], c_oracle_upscale(imgs[b], 64, 48, 3)
        )


def test_c_exact_extreme_values(rng):
    """All-0 / all-255 / checker images stress the walk's p=0, p=2^k, and
    p=255 edge cases."""
    cfg = ResampleConfig.from_profile("c_oracle", (24, 24), scale=(2, 1), a=3)
    up = Upscaler(cfg)
    imgs = [
        np.zeros((24, 24, 3), np.uint8),
        np.full((24, 24, 3), 255, np.uint8),
        np.full((24, 24, 3), 128, np.uint8),  # p = 2^7 exactly
        np.indices((24, 24)).sum(0).astype(np.uint8)[..., None].repeat(3, -1) % 2 * 255,
        np.full((24, 24, 3), 1, np.uint8),  # p = 2^0, binade edge
    ]
    for img in imgs:
        got = np.asarray(up(img))
        want = c_oracle_upscale(img, 48, 48, 3)
        np.testing.assert_array_equal(got, want)


def test_xla_backend_refuses_c_faithful():
    from lanczos_tpu.ops.resample_xla import SeparableOps, resample_2d_xla
    import jax.numpy as jnp

    cfg = ResampleConfig.from_profile("c_oracle", (16, 16), scale=(2, 1), a=2)
    ops = SeparableOps(cfg)
    with pytest.raises(NotImplementedError):
        resample_2d_xla(jnp.zeros((16, 16, 3), jnp.uint8), ops)
