"""Y4M container round-trip + the plane-native video upscale pipeline.

The container is an extension beyond the reference's still-image stb
ingest (``full_TB.h:107``) that makes the BASELINE.md streaming-video
configs drivable from a file; frames are planar YCbCr, the layout
``Upscaler.planar`` consumes directly.
"""

import io

import numpy as np
import pytest

from lanczos_tpu.io.y4m import (
    Y4MError,
    parse_header,
    read_y4m,
    write_y4m,
)


def _frames(rng, n, h, w, cs="420jpeg"):
    out = []
    for _ in range(n):
        y = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        if cs == "mono":
            out.append((y,))
            continue
        dh, dw = {"420jpeg": (2, 2), "422": (1, 2), "444": (1, 1)}[cs]
        cb = rng.integers(0, 256, size=(h // dh, w // dw), dtype=np.uint8)
        cr = rng.integers(0, 256, size=(h // dh, w // dw), dtype=np.uint8)
        out.append((y, cb, cr))
    return out


@pytest.mark.parametrize("cs", ["420jpeg", "422", "444", "mono"])
def test_roundtrip(rng, cs):
    frames = _frames(rng, 3, 32, 48, cs)
    buf = io.BytesIO()
    hdr = write_y4m(buf, frames, fps=(30, 1), colorspace=cs)
    assert hdr.colorspace == cs and hdr.fps == (30, 1)
    hdr2, got = read_y4m(buf.getvalue())
    assert hdr2 == hdr
    assert len(got) == 3
    for a, b in zip(frames, got):
        for pa, pb in zip(a, b):
            np.testing.assert_array_equal(pa, pb)


def test_colorspace_inferred(rng):
    frames = _frames(rng, 1, 16, 16, "422")
    buf = io.BytesIO()
    assert write_y4m(buf, frames).colorspace == "422"
    frames = _frames(rng, 1, 16, 16, "mono")
    assert write_y4m(io.BytesIO(), frames).colorspace == "mono"


def test_header_parsing():
    hdr = parse_header(b"YUV4MPEG2 W640 H480 F30000:1001 Ip A1:1 C420mpeg2 Xfoo")
    assert (hdr.width, hdr.height) == (640, 480)
    assert hdr.fps == (30000, 1001)
    assert hdr.colorspace == "420mpeg2"
    assert hdr.extensions == ("foo",)
    with pytest.raises(Y4MError):
        parse_header(b"NOTY4M W2 H2")
    with pytest.raises(Y4MError):
        parse_header(b"YUV4MPEG2 W640 H480 It")  # interlaced
    hdr10 = parse_header(b"YUV4MPEG2 W640 H480 C420p10")  # deep: supported
    assert hdr10.bit_depth == 10 and hdr10.sample_dtype == np.dtype("<u2")
    with pytest.raises(Y4MError):
        parse_header(b"YUV4MPEG2 W641 H480 C420jpeg")  # odd width for 420


def test_frame_params_skipped(rng):
    frames = _frames(rng, 1, 8, 8, "mono")
    buf = io.BytesIO()
    write_y4m(buf, frames, colorspace="mono")
    raw = buf.getvalue().replace(b"FRAME\n", b"FRAME Xsome-param\n")
    _, got = read_y4m(raw)
    np.testing.assert_array_equal(got[0][0], frames[0][0])


def test_truncated_frame_raises(rng):
    buf = io.BytesIO()
    write_y4m(buf, _frames(rng, 2, 8, 8, "mono"), colorspace="mono")
    raw = buf.getvalue()[:-5]
    with pytest.raises(Y4MError, match="truncated"):
        read_y4m(raw)


@pytest.mark.parametrize("cs", ["420jpeg", "mono"])
def test_upscale_y4m_pipeline(rng, cs, tmp_path):
    """File → file 2× upscale matches per-plane Upscaler results and keeps
    subsampling, fps, and frame count (incl. a partial tail batch)."""
    from lanczos_tpu.models.upscaler import upscale
    from lanczos_tpu.models.video import upscale_y4m

    frames = _frames(rng, 5, 24, 32, cs)  # 5 frames, batch 2 -> tail of 1
    src = tmp_path / "in.y4m"
    dst = tmp_path / "out.y4m"
    write_y4m(str(src), frames, fps=(24, 1), colorspace=cs)

    hdr = upscale_y4m(str(src), str(dst), scale=(2, 1), a=2, batch=2)
    assert (hdr.width, hdr.height) == (64, 48)

    hdr2, got = read_y4m(str(dst))
    assert hdr2.colorspace == cs and hdr2.fps == (24, 1)
    assert len(got) == 5
    for src_f, out_f in zip(frames, got):
        for p_in, p_out in zip(src_f, out_f):
            want = np.asarray(upscale(p_in, scale=(2, 1), a=2))
            np.testing.assert_array_equal(p_out, want)


def test_upscale_y4m_subsampling_guard(rng, tmp_path):
    """A scale that breaks 4:2:0 chroma alignment raises, not corrupts."""
    from lanczos_tpu.models.video import upscale_y4m

    src = tmp_path / "in.y4m"
    write_y4m(str(src), _frames(rng, 1, 12, 12, "420jpeg"))
    with pytest.raises(ValueError):
        # luma 12x12 divides by 3/4 (-> 9x9) but the 6x6 chroma does not
        # (4.5): the chroma config must raise rather than silently drift
        upscale_y4m(str(src), str(tmp_path / "o.y4m"), scale=(3, 4), a=2)


def test_cli_y4m(rng, tmp_path, capsys):
    from lanczos_tpu.cli import main

    src = tmp_path / "clip.y4m"
    write_y4m(str(src), _frames(rng, 2, 16, 16, "420jpeg"))
    assert main([str(src), "--scale", "2/1", "--a", "2"]) == 0
    out = tmp_path / "clip_upscaled.y4m"
    hdr, got = read_y4m(str(out))
    assert (hdr.width, hdr.height) == (32, 32) and len(got) == 2


def test_upscale_y4m_out_shape(rng, tmp_path):
    """out_shape (instead of scale) maps chroma proportionally."""
    from lanczos_tpu.models.video import upscale_y4m

    src = tmp_path / "in.y4m"
    write_y4m(str(src), _frames(rng, 2, 24, 32, "420jpeg"))
    hdr = upscale_y4m(
        str(src), str(tmp_path / "o.y4m"), out_shape=(72, 96), a=2, batch=2
    )
    assert (hdr.width, hdr.height) == (96, 72)
    h2, got = read_y4m(str(tmp_path / "o.y4m"))
    assert got[0][1].shape == (36, 48)  # chroma kept at half resolution


def test_upscale_y4m_ref_backend(rng, tmp_path):
    """The host-oracle backend works through the planar video pipeline
    (regression: its moveaxis fallback used to feed the single-image
    oracle a batched stack) and agrees with the device path within the
    usual ±1 LSB after the trunc-clip byte cast."""
    from lanczos_tpu.io.y4m import Y4MReader
    from lanczos_tpu.models.video import upscale_y4m

    src = tmp_path / "in.y4m"
    write_y4m(str(src), _frames(rng, 3, 16, 16, "420jpeg"))
    upscale_y4m(str(src), str(tmp_path / "ref.y4m"), scale=(2, 1), a=2,
                backend="ref", batch=2)
    upscale_y4m(str(src), str(tmp_path / "dev.y4m"), scale=(2, 1), a=2,
                backend="block", batch=2)
    _, ref = read_y4m(str(tmp_path / "ref.y4m"))
    _, dev = read_y4m(str(tmp_path / "dev.y4m"))
    assert len(ref) == len(dev) == 3
    for rf, df in zip(ref, dev):
        for rp, dp in zip(rf, df):
            assert np.abs(rp.astype(int) - dp.astype(int)).max() <= 1


def test_reader_short_reads(rng):
    """Raw/unbuffered streams may return fewer bytes than asked per read();
    the reader must loop, not misreport 'truncated frame'."""
    from lanczos_tpu.io.y4m import Y4MReader

    frames = _frames(rng, 4, 16, 16, "420jpeg")
    buf = io.BytesIO()
    write_y4m(buf, frames)
    data = buf.getvalue()

    class Dribble(io.RawIOBase):
        def __init__(self, data):
            self.data, self.pos = data, 0

        def readable(self):
            return True

        def read(self, n=-1):
            if self.pos >= len(self.data):
                return b""
            n = 3 if n is None or n < 0 else min(n, 3)
            out = self.data[self.pos : self.pos + n]
            self.pos += len(out)
            return out

    got = list(Y4MReader(Dribble(data)))
    assert len(got) == 4
    for g, f in zip(got, frames):
        for gp, fp in zip(g, f):
            np.testing.assert_array_equal(gp, fp)


def test_write_y4m_unknown_subsampling(rng):
    """4:1:1 (or mismatched) chroma raises Y4MError, not a bare KeyError."""
    y = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    c = rng.integers(0, 256, size=(16, 4), dtype=np.uint8)
    with pytest.raises(Y4MError, match="subsampling"):
        write_y4m(io.BytesIO(), [(y, c, c)])


def test_cli_y4m_rejects_image_flags(rng, tmp_path):
    from lanczos_tpu.cli import main

    src = tmp_path / "clip.y4m"
    write_y4m(str(src), _frames(rng, 1, 16, 16, "420jpeg"))
    with pytest.raises(SystemExit):
        main([str(src), "--bench", "5"])
    with pytest.raises(SystemExit):
        main([str(src), "--expected"])


def test_cli_c_exact_requires_c_oracle_profile(rng, tmp_path):
    from lanczos_tpu.cli import main
    from lanczos_tpu.io import write_png

    src = tmp_path / "im.png"
    write_png(str(src), rng.integers(0, 256, (8, 8, 3), np.uint8))
    with pytest.raises(SystemExit):
        main([str(src), "--backend", "c_exact", "--profile", "precise"])


# ------------------------------------------------------------ deep (10-bit+)


def test_deep_header_and_roundtrip(rng):
    from lanczos_tpu.io.y4m import Y4MHeader, parse_header, read_y4m, write_y4m

    hdr = parse_header(b"YUV4MPEG2 W8 H6 F30:1 Ip C420p10")
    assert hdr.bit_depth == 10 and hdr.base_colorspace == "420"
    assert hdr.frame_bytes == (8 * 6 + 2 * 4 * 3) * 2

    frames = []
    for _ in range(3):
        y = rng.integers(0, 1024, size=(6, 8), dtype=np.uint16)
        cb = rng.integers(0, 1024, size=(3, 4), dtype=np.uint16)
        cr = rng.integers(0, 1024, size=(3, 4), dtype=np.uint16)
        frames.append((y, cb, cr))
    buf = io.BytesIO()
    write_y4m(buf, frames, colorspace="420p10")
    buf.seek(0)
    hdr2, got = read_y4m(buf)
    assert hdr2.colorspace == "420p10" and len(got) == 3
    for a, b in zip(frames, got):
        for pa, pb in zip(a, b):
            assert pb.dtype == np.uint16
            np.testing.assert_array_equal(pa, pb)


def test_deep_validation(rng):
    from lanczos_tpu.io.y4m import Y4MError, parse_header, write_y4m

    with pytest.raises(Y4MError, match="unsupported"):
        parse_header(b"YUV4MPEG2 W8 H6 Cmonop10")
    y = rng.integers(0, 1024, size=(6, 8), dtype=np.uint16)
    with pytest.raises(Y4MError, match="explicit colorspace"):
        write_y4m(io.BytesIO(), [(y,)])  # depth not inferable
    big = np.full((6, 8), 2000, np.uint16)  # > 10-bit range
    small = np.zeros((3, 4), np.uint16)
    with pytest.raises(Y4MError, match="exceeds"):
        write_y4m(io.BytesIO(), [(big, small, small)], colorspace="420p10")


def test_upscale_y4m_deep(tmp_path, rng):
    from lanczos_tpu.io.y4m import read_y4m, write_y4m
    from lanczos_tpu.models.video import upscale_y4m

    h, w = 16, 12
    frames = []
    for _ in range(2):
        y = rng.integers(0, 1024, size=(h, w), dtype=np.uint16)
        cb = rng.integers(0, 1024, size=(h // 2, w // 2), dtype=np.uint16)
        cr = rng.integers(0, 1024, size=(h // 2, w // 2), dtype=np.uint16)
        frames.append((y, cb, cr))
    src, dst = tmp_path / "in.y4m", tmp_path / "out.y4m"
    write_y4m(str(src), frames, colorspace="420p10")
    hdr = upscale_y4m(str(src), str(dst), scale=(2, 1), a=2, batch=2)
    assert hdr.colorspace == "420p10" and (hdr.width, hdr.height) == (24, 32)
    hdr2, out = read_y4m(str(dst))
    assert len(out) == 2
    for fr in out:
        assert fr[0].shape == (32, 24) and fr[0].dtype == np.uint16
        assert fr[0].max() <= 1023  # overshoot clamped to the 10-bit range
        assert fr[1].shape == (16, 12)
    # the luma plane tracks an independent uint16-contract upscale
    from lanczos_tpu.core.config import Profile, ResampleConfig
    from lanczos_tpu.models.upscaler import Upscaler

    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, (h, w), scale=(2, 1), a=2, channels=1
    )
    want = np.asarray(Upscaler(cfg)(frames[0][0][..., None]))[..., 0]
    np.testing.assert_array_equal(
        out[0][0], np.minimum(want, 1023).astype(np.uint16)
    )


def test_y4m_truncation_and_bitflips_never_crash(rng):
    """The container honors the codec never-crash contract: corrupt bytes
    raise ValueError subclasses, never IndexError/struct.error."""
    from lanczos_tpu.io.y4m import read_y4m, write_y4m

    y = rng.integers(0, 256, size=(6, 8), dtype=np.uint8)
    c = rng.integers(0, 256, size=(3, 4), dtype=np.uint8)
    buf = io.BytesIO()
    write_y4m(buf, [(y, c, c)] * 2)
    data = buf.getvalue()
    y16 = rng.integers(0, 1024, size=(6, 8), dtype=np.uint16)
    c16 = rng.integers(0, 1024, size=(3, 4), dtype=np.uint16)
    buf = io.BytesIO()
    write_y4m(buf, [(y16, c16, c16)], colorspace="420p10")
    deep = buf.getvalue()
    for blob in (data, deep):
        for cut in range(1, len(blob)):
            try:
                read_y4m(io.BytesIO(blob[:cut]))
            except ValueError:
                pass
        for pos in range(min(64, len(blob))):
            mut = bytearray(blob)
            mut[pos] ^= 0xFF
            try:
                read_y4m(io.BytesIO(bytes(mut)))
            except ValueError:
                pass


def test_upscale_y4m_mesh_matches_single_chip(rng, tmp_path):
    """Multi-chip video streaming (BASELINE config 5): the mesh-driven
    y4m pipeline is byte-identical to the single-chip run."""
    import jax

    from lanczos_tpu.models.video import upscale_y4m

    src = tmp_path / "src.y4m"
    write_y4m(str(src), _frames(rng, 6, 16, 16, "420jpeg"), fps=(24, 1),
              colorspace="420jpeg")
    single, meshed = tmp_path / "single.y4m", tmp_path / "meshed.y4m"
    upscale_y4m(str(src), str(single), scale=(2, 1), a=2, batch=2,
                backend="xla")
    mesh = jax.make_mesh((2, 4), ("data", "rows"))
    hdr = upscale_y4m(str(src), str(meshed), scale=(2, 1), a=2, batch=2,
                      mesh=mesh)
    assert (hdr.width, hdr.height) == (32, 32)
    assert meshed.read_bytes() == single.read_bytes()


def test_upscale_y4m_mesh_deep_stream(rng, tmp_path):
    """10-bit (420p10) streams over the mesh: the ShardedUpscaler uint16
    contract inside the plane-native pipeline, byte-identical to the
    single-chip run."""
    import jax

    from lanczos_tpu.models.video import upscale_y4m

    frames = [
        (
            rng.integers(0, 1024, (16, 16), np.uint16),
            rng.integers(0, 1024, (8, 8), np.uint16),
            rng.integers(0, 1024, (8, 8), np.uint16),
        )
        for _ in range(4)
    ]
    src = tmp_path / "deep.y4m"
    write_y4m(str(src), frames, fps=(24, 1), colorspace="420p10")
    single, meshed = tmp_path / "s.y4m", tmp_path / "m.y4m"
    upscale_y4m(str(src), str(single), scale=(2, 1), a=2, batch=2,
                backend="xla")
    mesh = jax.make_mesh((2, 4), ("data", "rows"))
    upscale_y4m(str(src), str(meshed), scale=(2, 1), a=2, batch=2,
                mesh=mesh)
    assert meshed.read_bytes() == single.read_bytes()
