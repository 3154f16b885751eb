"""Streaming (row-chunked) execution vs the whole-frame XLA path."""

import numpy as np
import pytest

from lanczos_tpu.core.config import EdgeMode, Profile, ResampleConfig
from lanczos_tpu.models.streaming import StreamingUpscaler
from lanczos_tpu.models.upscaler import Upscaler


@pytest.mark.parametrize("scale", [(2, 1), (3, 2), (7, 2)])
@pytest.mark.parametrize("chunk", [8, 20, 64])
def test_streaming_matches_whole_frame(rng, scale, chunk):
    n, d = scale
    h, w = 16 * d, 8 * d
    cfg = ResampleConfig.from_profile(Profile.PRECISE, (h, w), scale=scale, a=3)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    ref = np.asarray(Upscaler(cfg, backend="xla")(img))
    out = StreamingUpscaler(cfg, chunk_rows=chunk)(img)
    np.testing.assert_array_equal(out, ref)


def test_streaming_resume(rng):
    """Resume at a later chunk reproduces exactly the remaining rows
    (the seek_write_index/curr_offset analog)."""
    cfg = ResampleConfig.from_profile(Profile.PRECISE, (64, 16), scale=(2, 1), a=2)
    img = rng.integers(0, 256, size=(64, 16, 3), dtype=np.uint8)
    model = StreamingUpscaler(cfg, chunk_rows=16)
    full = dict(model.chunks(lambda lo, hi: img[lo:hi]))
    resumed = dict(model.chunks(lambda lo, hi: img[lo:hi], start_chunk=2))
    assert set(resumed) == {y0 for y0 in full if y0 >= 2 * model.chunk}
    for y0, chunk in resumed.items():
        np.testing.assert_array_equal(chunk, full[y0])


def test_streaming_rows_are_fetched_lazily(rng):
    """get_rows is only asked for the window each chunk needs."""
    cfg = ResampleConfig.from_profile(Profile.PRECISE, (64, 16), scale=(2, 1), a=2)
    img = rng.integers(0, 256, size=(64, 16, 3), dtype=np.uint8)
    model = StreamingUpscaler(cfg, chunk_rows=16)
    calls = []

    def get_rows(lo, hi):
        calls.append((lo, hi))
        return img[lo:hi]

    list(model.chunks(get_rows))
    assert len(calls) == model.n_chunks
    assert all(hi - lo <= model.win for lo, hi in calls)
    assert model.win <= 16 // 2 + 2 * cfg.a + 2


def test_streaming_dering_and_edges(rng):
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, (32, 12), scale=(2, 1), a=2,
        dering=True, edge_mode=EdgeMode.REFLECT,
    )
    img = rng.integers(0, 256, size=(32, 12, 3), dtype=np.uint8)
    ref = np.asarray(Upscaler(cfg, backend="xla")(img))
    out = StreamingUpscaler(cfg, chunk_rows=8)(img)
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize(
    "outs, kw, chunk",
    [
        ((192, 128), {}, 32),  # integer 2x
        ((144, 96), {}, 24),  # rational 3/2
        ((48, 32), {}, 16),  # antialiased downscale 1/2
        ((192, 128), dict(edge_mode=EdgeMode.REFLECT), 32),
        ((192, 128), dict(dering=True), 32),
        ((192, 128), dict(intermediate_quantize=True), 32),
        ((192, 128), dict(align="center"), 32),
    ],
)
def test_streaming_mxu_chunks(rng, outs, kw, chunk):
    """The fused MXU chunk path (one interior-phase plan for every chunk,
    off_eff window-formula shift = the seek_write_index analog) matches
    the whole-frame gather path <= 1 LSB across config families."""
    ins = (96, 64)
    cfg = ResampleConfig.from_profile(Profile.PRECISE, ins, out_shape=outs, a=3, **kw)
    img = rng.integers(0, 256, size=(*ins, 3), dtype=np.uint8)
    sm = StreamingUpscaler(cfg, chunk_rows=chunk, chunk_backend="mxu")
    assert sm.use_mxu
    out = sm(img).astype(int)
    ref = np.asarray(Upscaler(cfg, backend="xla")(img)).astype(int)
    assert np.abs(out - ref).max() <= 1


def test_streaming_mxu_gates():
    """DROP edges and width-first nonlinearity are not expressible in the
    padded-window MXU chunk formulation."""
    drop = ResampleConfig.from_profile(
        Profile.PRECISE, (96, 64), scale=(2, 1), a=3,
        edge_mode=EdgeMode.DROP, normalize=True,
    )
    with pytest.raises(NotImplementedError):
        StreamingUpscaler(drop, chunk_rows=32, chunk_backend="mxu")
