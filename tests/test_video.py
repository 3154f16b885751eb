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


def test_sharded_video_stream_matches_single_chip(rng):
    """BASELINE config 5's composition: a 24-frame stream through a
    (data x rows) mesh — frames data-parallel, rows halo-exchanged — is
    bit-identical to single-chip per-frame upscales (VERDICT r4 #1)."""
    import jax

    cfg = ResampleConfig.from_profile(Profile.PRECISE, (32, 24), scale=(2, 1), a=2)
    video = _frames(rng, 24, 32, 24)
    mesh = jax.make_mesh((2, 4), ("data", "rows"))
    vu = VideoUpscaler(cfg, depth=2, batch=4, mesh=mesh)
    assert vu.batch % 2 == 0  # rounded to the data-axis size
    outs = list(vu.frames(iter(video)))
    assert len(outs) == 24
    single = Upscaler(cfg, backend="xla")
    for k in range(24):
        np.testing.assert_array_equal(outs[k], np.asarray(single(video[k])))


def test_sharded_video_call_and_tail(rng):
    """__call__ over a mesh handles a frame count that is not a multiple
    of the (data-rounded) batch."""
    import jax

    cfg = ResampleConfig.from_profile(Profile.PRECISE, (16, 12), scale=(2, 1), a=2)
    video = _frames(rng, 7, 16, 12)
    mesh = jax.make_mesh((4, 2), ("data", "rows"))
    out = VideoUpscaler(cfg, depth=2, batch=3, mesh=mesh)(video)
    single = Upscaler(cfg, backend="xla")
    for k in range(7):
        np.testing.assert_array_equal(out[k], np.asarray(single(video[k])))


def test_video_frames_producer_reuses_buffer(rng):
    """A producer that rewrites ONE preallocated frame buffer between
    pulls (camera/ffmpeg pattern) must not alias into the batch stack
    (round-5 review finding: batching buffered frames by reference)."""
    cfg = ResampleConfig.from_profile(Profile.PRECISE, (16, 12), scale=(2, 1), a=2)
    frames = _frames(rng, 6, 16, 12)
    buf = np.empty_like(frames[0])

    def producer():
        for f in frames:
            buf[...] = f  # same ndarray object every iteration
            yield buf

    vu = VideoUpscaler(cfg, backend="xla", depth=2, batch=3)
    outs = list(vu.frames(producer()))
    single = Upscaler(cfg, backend="xla")
    for k in range(6):
        np.testing.assert_array_equal(outs[k], np.asarray(single(frames[k])))


def test_read_ahead_order_errors_and_abandon():
    """_read_ahead: in-order delivery, producer exceptions re-raise at
    the consumer, and an abandoned consumer joins the producer thread."""
    import threading

    from lanczos_tpu.models.video import _read_ahead

    assert list(_read_ahead(iter(range(50)), depth=3)) == list(range(50))

    def boom():
        yield 1
        raise RuntimeError("decoder died")

    import pytest

    out = []
    with pytest.raises(RuntimeError, match="decoder died"):
        for v in _read_ahead(boom()):
            out.append(v)
    assert out == [1]

    before = threading.active_count()
    g = _read_ahead(iter(range(10_000)), depth=2)
    assert next(g) == 0
    g.close()  # abandon: producer must stop and join
    assert threading.active_count() <= before + 1
