"""Regression tests for the round-1 code-review findings."""

import jax
import numpy as np
import pytest

from lanczos_tpu.core.config import Profile, ResampleConfig
from lanczos_tpu.models.upscaler import Upscaler


@pytest.mark.filterwarnings(
    "ignore:HLS schedule indexes past:RuntimeWarning"
)
def test_sharded_hls_index_drift(rng):
    """Finding 1: scale 3/2 fixed-point — the quantized step predicate's
    index drift exceeded the a-row halo and corrupted shard output."""
    from lanczos_tpu.parallel.sharded import ShardedUpscaler

    mesh = jax.make_mesh((1, 4), ("data", "rows"))
    cfg = ResampleConfig.from_profile(Profile.HLS, (768, 16), scale=(3, 2), a=2)
    img = rng.integers(0, 256, size=(1, 768, 16, 3), dtype=np.uint8)
    single = np.asarray(Upscaler(cfg)(img[0]))
    out = np.asarray(ShardedUpscaler(cfg, mesh)(img))[0]
    np.testing.assert_array_equal(out, single)


def test_bit_precision_overflow_rejected():
    """Finding 2: P >= 12 overflows the int32 horizontal MAC."""
    with pytest.raises(ValueError):
        ResampleConfig.from_profile(
            Profile.HLS, (16, 16), scale=(2, 1), a=2, bit_precision=12
        )


def test_dering_downscale_central_taps(rng):
    """Finding 3: gather-path dering clamped against off-center taps for
    antialiased downscales (band wider than 2a)."""
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, (64, 64), scale=(1, 2), a=3, dering=True
    )
    img = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    ref = np.asarray(Upscaler(cfg, backend="xla")(img))
    out = np.asarray(Upscaler(cfg, backend="shift_xla")(img))
    assert np.abs(ref.astype(int) - out.astype(int)).max() <= 1


def test_hls_ref_backend_is_independent(rng):
    """Finding 4: backend='ref' for the HLS profile must run the stream
    simulator, not the device path itself."""
    from lanczos_tpu.ref.hls_sim import hls_stream_upscale

    cfg = ResampleConfig.from_profile(Profile.HLS, (24, 16), scale=(2, 1), a=2)
    img = rng.integers(0, 256, size=(24, 16, 3), dtype=np.uint8)
    ref = np.asarray(Upscaler(cfg, backend="ref")(img))
    sim = hls_stream_upscale(img, 48, 32, 2, cfg.bit_precision)
    np.testing.assert_array_equal(ref, sim)
    # and the device path still matches it (bit-exactness contract)
    dev = np.asarray(Upscaler(cfg)(img))
    np.testing.assert_array_equal(dev, sim)


def test_shift_backend_rejects_quantized_intermediate():
    """Finding 5: explicit backend='shift_xla' must fail loudly rather
    than silently dropping the quantized-intermediate semantics."""
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, (24, 20), scale=(2, 1), a=2,
        intermediate_quantize=True,
    )
    with pytest.raises(NotImplementedError):
        Upscaler(cfg, backend="shift_xla")


def test_cli_bench_with_ref_backend(tmp_path, rng):
    """Finding 6: --bench crashed on the ref backend (numpy output)."""
    from lanczos_tpu.cli import main
    from lanczos_tpu.io import write_png

    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    src = tmp_path / "in.png"
    write_png(src, img)
    rc = main([str(src), str(tmp_path / "o.png"), "--scale", "2",
               "--backend", "ref", "--no-psnr", "--bench", "2"])
    assert rc == 0


@pytest.mark.filterwarnings(
    "ignore:HLS schedule indexes past:RuntimeWarning"
)
def test_hls_sim_short_inputs(rng):
    """Finding 7: the stream simulator crashed for inputs with fewer than
    a+1 rows/cols while the device path handled them."""
    from lanczos_tpu.ref.hls_sim import hls_stream_upscale

    img = rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    sim = hls_stream_upscale(img, 4, 6, a=2)
    assert sim.shape == (4, 6, 3)
    cfg = ResampleConfig.from_profile(Profile.HLS, (2, 3), scale=(2, 1), a=2)
    dev = np.asarray(Upscaler(cfg)(img))
    np.testing.assert_array_equal(dev, sim)


def test_c_exact_arbitrary_leading_batch(rng):
    """(..., H, W, C) contract: 5D input through the c_faithful path
    (regression: only ndim 3/4 were handled; 5D resampled a batch dim)."""
    from lanczos_tpu.core.config import Profile, ResampleConfig
    from lanczos_tpu.models.upscaler import Upscaler

    cfg = ResampleConfig.from_profile(
        Profile.C_ORACLE, (8, 8), scale=(2, 1), a=2
    )
    m = Upscaler(cfg)
    x = rng.integers(0, 256, size=(2, 2, 8, 8, 3), dtype=np.uint8)
    out = np.asarray(m(x))
    assert out.shape == (2, 2, 16, 16, 3)
    ref = np.asarray(m(x[0, 0]))
    np.testing.assert_array_equal(out[0, 0], ref)


def test_block_backend_output_dtype_matches_others(rng):
    """Float outputs carry ops.dtype on every backend (regression: block
    cast back to the input dtype, diverging from gather/shift)."""
    import jax.numpy as jnp

    from lanczos_tpu.core.config import Precision, Profile, ResampleConfig
    from lanczos_tpu.models.upscaler import Upscaler

    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, (16, 16), scale=(2, 1), a=2,
        precision=Precision.BF16,
    )
    x = rng.random((16, 16, 3), dtype=np.float32) * 255
    dts = {
        b: Upscaler(cfg, backend=b)(x).dtype
        for b in ("xla", "shift_xla", "block")
    }
    assert len(set(dts.values())) == 1, dts


def test_pallas_backend_float_input_stays_float(rng):
    """The fused kernel is uint8-native; float inputs route to a
    float-capable fallback instead of being silently quantized
    (float-in/float-out contract parity with the other backends)."""
    from lanczos_tpu.core.config import Profile, ResampleConfig
    from lanczos_tpu.models.upscaler import Upscaler

    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, (16, 12), scale=(2, 1), a=2
    )
    x = (rng.random((16, 12, 3)) * 255).astype(np.float32)
    out_p = np.asarray(Upscaler(cfg, backend="pallas")(x))
    out_x = np.asarray(Upscaler(cfg, backend="xla")(x))
    assert out_p.dtype == out_x.dtype == np.float32
    assert np.abs(out_p - out_x).max() < 1e-3
