"""Anisotropic resizes (different scale per axis) across backends."""

import numpy as np
import pytest

from lanczos_tpu.core.config import Profile, ResampleConfig
from lanczos_tpu.models.upscaler import Upscaler


@pytest.mark.parametrize(
    "out_shape", [(48, 60), (72, 20), (24, 80), (30, 30)]
)
def test_anisotropic_backends_agree(rng, out_shape):
    img = rng.integers(0, 256, size=(24, 20, 3), dtype=np.uint8)
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, (24, 20), out_shape=out_shape, a=2
    )
    ref = np.asarray(Upscaler(cfg, backend="xla")(img))
    assert ref.shape == (*out_shape, 3)
    for b in ("shift_xla", "pallas"):
        try:
            out = np.asarray(Upscaler(cfg, backend=b)(img))
        except (NotImplementedError, ValueError):
            continue  # backend legitimately doesn't cover this scale
        diff = np.abs(ref.astype(int) - out.astype(int))
        assert diff.max() <= 1, f"{b}: {diff.max()}"


def test_anisotropic_sharded(rng):
    import jax

    from lanczos_tpu.parallel.sharded import ShardedUpscaler

    mesh = jax.make_mesh((1, 4), ("data", "rows"))
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, (32, 20), out_shape=(64, 30), a=2  # 2x H, 3/2 W
    )
    img = rng.integers(0, 256, size=(1, 32, 20, 3), dtype=np.uint8)
    ref = np.asarray(Upscaler(cfg, backend="xla")(img))
    out = np.asarray(ShardedUpscaler(cfg, mesh)(img))
    np.testing.assert_array_equal(out, ref)
