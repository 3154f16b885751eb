"""Blocked banded-matmul backend (ops/resample_block_xla.py).

Round-2 verdict items 3-4: the MXU path for arbitrary reduced N/D and for
the configs that previously fell to the slow per-tap gather fallback
(drop+normalize, dering with rational scales).  Contract: within 1 LSB of
the f32 gather backend (summation-order truncation flips only).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lanczos_tpu.core.config import EdgeMode, Precision, Profile, ResampleConfig
from lanczos_tpu.models.upscaler import Upscaler, _block_eligible, _shift_eligible


def _close(got, ref, tol=1):
    d = np.abs(got.astype(int) - ref.astype(int))
    assert d.max() <= tol, f"max diff {d.max()}"


@pytest.mark.parametrize("edge", [EdgeMode.CLAMP, EdgeMode.DROP, EdgeMode.REFLECT])
@pytest.mark.parametrize("dering", [False, True])
def test_block_matches_gather(rng, edge, dering):
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, (48, 40), scale=(3, 2), a=3,
        edge_mode=edge, dering=dering,
    )
    img = rng.integers(0, 256, size=(48, 40, 3), dtype=np.uint8)
    ref = np.asarray(Upscaler(cfg, backend="xla")(img))
    _close(np.asarray(Upscaler(cfg, backend="block")(img)), ref)


@pytest.mark.parametrize(
    "shape,scale",
    [
        ((64, 64), (67, 64)),     # N=67 > MAX_PHASES
        ((60, 60), (253, 60)),    # N=253, large upscale
        ((64, 64), (1, 2)),       # downscale (antialiased, wide taps)
        ((48, 48), (35, 48)),     # rational downscale
    ],
)
def test_block_arbitrary_scales(rng, shape, scale):
    n, d = scale
    cfg = ResampleConfig.from_profile(Profile.PRECISE, shape, scale=scale, a=3)
    img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    ref = np.asarray(Upscaler(cfg, backend="xla")(img))
    _close(np.asarray(Upscaler(cfg, backend="block")(img)), ref)


def test_large_n_routes_off_gather():
    """Auto-backend must route N > 32 (shift-ineligible) linear configs to
    the block path, not the gather fallback (round-1 verdict item 3)."""
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, (64, 64), scale=(67, 64), a=3
    )
    assert not _shift_eligible(cfg)
    assert _block_eligible(cfg)
    assert Upscaler(cfg, backend="auto").backend == "block"


def test_drop_normalize_routes_off_gather():
    """drop+normalize (shift-ineligible) also routes to block (item 4)."""
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, (48, 40), scale=(2, 1), a=3,
        edge_mode=EdgeMode.DROP, normalize=True,
    )
    assert not _shift_eligible(cfg)
    assert Upscaler(cfg, backend="auto").backend == "block"


def test_block_batched_and_float(rng):
    cfg = ResampleConfig.from_profile(Profile.PRECISE, (32, 24), scale=(2, 1), a=2)
    imgs = rng.integers(0, 256, size=(2, 32, 24, 3), dtype=np.uint8)
    ref = np.asarray(Upscaler(cfg, backend="xla")(imgs))
    _close(np.asarray(Upscaler(cfg, backend="block")(imgs)), ref)
    fimg = imgs[0].astype(np.float32)
    rf = np.asarray(Upscaler(cfg, backend="xla")(fimg))
    bf = np.asarray(Upscaler(cfg, backend="block")(fimg))
    assert np.abs(rf - bf).max() < 1e-2


def test_block_split_mode(rng):
    """mxu_split (bf16 split-operand matmuls) stays within 1 LSB too."""
    from functools import partial

    from lanczos_tpu.ops.resample_block_xla import BlockOps, resample_2d_block

    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, (48, 40), scale=(2, 1), a=3,
        intermediate_quantize=False,
    )
    img = rng.integers(0, 256, size=(48, 40, 3), dtype=np.uint8)
    ref = np.asarray(Upscaler(cfg, backend="xla")(img))
    ops = BlockOps(cfg, mxu_split=True)
    got = np.asarray(
        jax.jit(partial(resample_2d_block, ops=ops))(jnp.asarray(img))
    )
    _close(got, ref)


def test_block_refuses_fixed_and_c_faithful():
    from lanczos_tpu.ops.resample_block_xla import BlockOps

    with pytest.raises(NotImplementedError):
        BlockOps(ResampleConfig.from_profile("hls", (16, 16), scale=(2, 1), a=2))
    with pytest.raises(NotImplementedError):
        BlockOps(
            ResampleConfig.from_profile("c_oracle", (16, 16), scale=(2, 1), a=2)
        )


def test_block_intermediate_quantize_width_first(rng):
    from lanczos_tpu.core.config import Order

    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, (32, 24), scale=(2, 1), a=2,
        order=Order.WIDTH_FIRST, intermediate_quantize=True, normalize=False,
        edge_mode=EdgeMode.DROP,
    )
    img = rng.integers(0, 256, size=(32, 24, 3), dtype=np.uint8)
    ref = np.asarray(Upscaler(cfg, backend="xla")(img))
    _close(np.asarray(Upscaler(cfg, backend="block")(img)), ref)
