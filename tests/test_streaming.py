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


def test_chunks_pipelined_matches_serial(rng):
    """depth>1 + threaded prefetch must be byte-identical to the serial
    path, yield in order, and call get_rows in ascending-row order from
    one thread at a time (round-3 verdict #4)."""
    import threading

    from lanczos_tpu.core.config import Profile, ResampleConfig
    from lanczos_tpu.models.streaming import StreamingUpscaler

    img = rng.integers(0, 256, size=(96, 40, 3), dtype=np.uint8)
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, (96, 40), scale=(3, 2), a=3
    )
    s = StreamingUpscaler(cfg, chunk_rows=24)

    calls = []
    lock = threading.Lock()
    busy = [False]

    def get_rows(lo, hi):
        with lock:
            assert not busy[0], "get_rows re-entered concurrently"
            busy[0] = True
        calls.append((lo, hi))
        rows = img[lo:hi]
        with lock:
            busy[0] = False
        return rows

    serial = list(s.chunks(lambda lo, hi: img[lo:hi], depth=1,
                           prefetch=False))
    piped = list(s.chunks(get_rows, depth=3, prefetch=True))
    assert [y for y, _ in piped] == [y for y, _ in serial]
    for (y0a, a), (y0b, b) in zip(serial, piped):
        np.testing.assert_array_equal(a, b)
    los = [lo for lo, _ in calls]
    assert los == sorted(los)


def test_chunks_pipelined_resume(rng):
    from lanczos_tpu.core.config import Profile, ResampleConfig
    from lanczos_tpu.models.streaming import StreamingUpscaler

    img = rng.integers(0, 256, size=(64, 32, 3), dtype=np.uint8)
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, (64, 32), scale=(2, 1), a=2
    )
    s = StreamingUpscaler(cfg, chunk_rows=32)
    full = list(s.chunks(lambda lo, hi: img[lo:hi], depth=2))
    resumed = list(
        s.chunks(lambda lo, hi: img[lo:hi], start_chunk=2, depth=2)
    )
    assert [y for y, _ in resumed] == [y for y, _ in full][2:]
    for (_, a), (_, b) in zip(full[2:], resumed):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("chunk_backend", ["gather", "mxu"])
def test_sharded_streaming_matches_streaming(rng, chunk_backend):
    """Rows-sharded chunked execution (VERDICT r4 #3): a frame taller
    than any single shard's window streams through an 8-device rows mesh
    byte-identical to the single-device StreamingUpscaler."""
    import jax

    from lanczos_tpu.models.streaming import ShardedStreamingUpscaler

    mesh = jax.make_mesh((8,), ("rows",))
    ins, outs = (192, 64), (384, 128)
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, ins, out_shape=outs, a=3
    )
    img = rng.integers(0, 256, size=(*ins, 3), dtype=np.uint8)
    kw = dict(chunk_rows=16, chunk_backend=chunk_backend)
    ref = StreamingUpscaler(cfg, **kw)(img)
    sm = ShardedStreamingUpscaler(cfg, mesh, **kw)
    # each shard's window covers one 16-row sub-chunk, far less than the
    # 192-row frame: no device ever holds the frame
    assert sm.win < ins[0] // 2
    out = sm(img)
    np.testing.assert_array_equal(out, ref)


def test_sharded_streaming_tail_and_resume(rng):
    """Non-R-divisible chunk counts pad the last device step; resume
    aligns to super-chunk boundaries."""
    import jax

    from lanczos_tpu.models.streaming import ShardedStreamingUpscaler

    mesh = jax.make_mesh((8,), ("rows",))
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, (88, 16), scale=(2, 1), a=2
    )
    img = rng.integers(0, 256, size=(88, 16, 3), dtype=np.uint8)
    sm = ShardedStreamingUpscaler(cfg, mesh, chunk_rows=16,
                                  chunk_backend="gather")
    assert sm.n_chunks % sm.R  # the tail-padding path is exercised
    full = dict(sm.chunks(lambda lo, hi: img[lo:hi]))
    base = StreamingUpscaler(cfg, chunk_rows=16, chunk_backend="gather")
    want = dict(base.chunks(lambda lo, hi: img[lo:hi]))
    assert full.keys() == want.keys()
    for y0 in want:
        np.testing.assert_array_equal(full[y0], want[y0])
    with pytest.raises(ValueError):
        list(sm.chunks(lambda lo, hi: img[lo:hi], start_chunk=3))
    resumed = dict(sm.chunks(lambda lo, hi: img[lo:hi], start_chunk=0))
    assert resumed.keys() == want.keys()


def test_sharded_streaming_rational_and_edges(rng):
    """Rational scale + reflect edges through the rows-sharded chunked
    path (gather formulation), byte-identical to single-device."""
    import jax

    from lanczos_tpu.models.streaming import ShardedStreamingUpscaler

    mesh = jax.make_mesh((4,), ("rows",))
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, (96, 32), scale=(3, 2), a=3,
        edge_mode=EdgeMode.REFLECT, dering=True,
    )
    img = rng.integers(0, 256, size=(96, 32, 3), dtype=np.uint8)
    ref = StreamingUpscaler(cfg, chunk_rows=12, chunk_backend="gather")(img)
    out = ShardedStreamingUpscaler(
        cfg, mesh, chunk_rows=12, chunk_backend="gather"
    )(img)
    np.testing.assert_array_equal(out, ref)
