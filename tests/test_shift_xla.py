"""Strided shift-FMA XLA path vs the gather path (all scales)."""

import numpy as np
import pytest

import jax

from lanczos_tpu.core.config import EdgeMode, Profile, ResampleConfig
from lanczos_tpu.models.upscaler import Upscaler
from lanczos_tpu.ops.resample_shift_xla import ShiftOps, resample_2d_shift_xla


def _run(cfg, img):
    ops = ShiftOps(cfg)
    return np.asarray(jax.jit(lambda x: resample_2d_shift_xla(x, ops))(img))


@pytest.mark.parametrize(
    "scale", [(2, 1), (3, 1), (4, 1), (3, 2), (5, 4), (7, 2), (1, 2), (2, 3)]
)
def test_shift_matches_gather(rng, scale):
    n, d = scale
    h, w = 12 * d, 8 * d
    cfg = ResampleConfig.from_profile(Profile.PRECISE, (h, w), scale=scale, a=3)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    ref = np.asarray(Upscaler(cfg, backend="xla")(img))
    out = _run(cfg, img)
    diff = np.abs(ref.astype(int) - out.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.02


@pytest.mark.parametrize("edge", [EdgeMode.CLAMP, EdgeMode.DROP, EdgeMode.REFLECT])
def test_shift_edge_modes(rng, small_img, edge):
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, small_img.shape[:2], scale=(2, 1), a=2,
        edge_mode=edge, normalize=edge != EdgeMode.DROP,
    )
    ref = np.asarray(Upscaler(cfg, backend="xla")(small_img))
    out = _run(cfg, small_img)
    assert np.abs(ref.astype(int) - out.astype(int)).max() <= 1


def test_shift_dering(rng, small_img):
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, small_img.shape[:2], scale=(2, 1), a=2, dering=True
    )
    ref = np.asarray(Upscaler(cfg, backend="xla")(small_img))
    out = _run(cfg, small_img)
    assert np.abs(ref.astype(int) - out.astype(int)).max() <= 1


def test_shift_batched_and_planar(rng, small_img):
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, small_img.shape[:2], scale=(2, 1), a=2
    )
    ops = ShiftOps(cfg)
    batch = np.stack([small_img, small_img[::-1].copy()])
    out_i = np.asarray(
        jax.jit(lambda x: resample_2d_shift_xla(x, ops))(batch)
    )
    planar = np.moveaxis(batch, -1, 1).copy()
    out_p = np.asarray(
        jax.jit(lambda x: resample_2d_shift_xla(x, ops, channel_last=False))(planar)
    )
    np.testing.assert_array_equal(np.moveaxis(out_p, 1, -1), out_i)
    assert out_i.shape == (2, *cfg.out_shape, 3)


def test_auto_backend_prefers_shift(small_img):
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, small_img.shape[:2], scale=(2, 1), a=3
    )
    m = Upscaler(cfg, backend="auto")
    assert m.backend == "shift_xla"
    out = np.asarray(m(small_img))
    ref = np.asarray(Upscaler(cfg, backend="xla")(small_img))
    assert np.abs(ref.astype(int) - out.astype(int)).max() <= 1


def test_shift_rejects_many_phases():
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, (111 * 4, 111 * 4), scale=(111, 4), a=2
    )
    with pytest.raises(NotImplementedError):
        ShiftOps(cfg)
    assert Upscaler(cfg, backend="auto").backend == "block"
