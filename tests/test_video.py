"""Video pipeline: ordering, batching, tail handling."""

import numpy as np

from lanczos_tpu.core.config import Profile, ResampleConfig
from lanczos_tpu.models.upscaler import Upscaler
from lanczos_tpu.models.video import VideoUpscaler


def _frames(rng, t, h, w):
    return rng.integers(0, 256, size=(t, h, w, 3), dtype=np.uint8)


def test_video_matches_per_frame(rng):
    cfg = ResampleConfig.from_profile(Profile.PRECISE, (16, 12), scale=(2, 1), a=2)
    video = _frames(rng, 7, 16, 12)
    vu = VideoUpscaler(cfg, backend="xla", depth=2, batch=3)
    out = vu(video)
    single = Upscaler(cfg, backend="xla")
    for k in range(7):
        np.testing.assert_array_equal(out[k], np.asarray(single(video[k])))


def test_video_frame_iterator_order(rng):
    cfg = ResampleConfig.from_profile(Profile.PRECISE, (16, 12), scale=(2, 1), a=2)
    video = _frames(rng, 5, 16, 12)
    vu = VideoUpscaler(cfg, backend="xla", depth=3)
    outs = list(vu.frames(iter(video)))
    assert len(outs) == 5
    single = Upscaler(cfg, backend="xla")
    for k in range(5):
        np.testing.assert_array_equal(outs[k], np.asarray(single(video[k])))


def test_video_wrong_dims(rng):
    cfg = ResampleConfig.from_profile(Profile.PRECISE, (16, 12), scale=(2, 1), a=2)
    vu = VideoUpscaler(cfg, backend="xla")
    import pytest

    with pytest.raises(ValueError):
        list(vu.frames([np.zeros((8, 8, 3), np.uint8)]))
