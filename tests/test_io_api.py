"""stb API-level surface: stbi_info / stbi_load_16 / stbi_load_gif /
desired_channels analogs (probe_image, decode_image_16, decode_gif_frames,
convert_channels)."""

import io
import struct
import zlib

import numpy as np
import pytest
from PIL import Image as PIL

from lanczos_tpu.io import (
    convert_channels,
    decode_image,
    decode_image_16,
    encode_image,
    probe_image,
    read_image_16,
)
from lanczos_tpu.io.formats import (
    decode_gif_frames,
    decode_pnm16,
    decode_psd16,
    encode_hdr,
)
from lanczos_tpu.io.png import decode16


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _rgb(rng, h=13, w=11):
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _pil_bytes(arr, fmt, **kw):
    buf = io.BytesIO()
    im = PIL.fromarray(arr.squeeze(-1) if arr.shape[-1] == 1 else arr)
    im.save(buf, format=fmt, **kw)
    return buf.getvalue()


def _png16(arr16):
    """Hand-built 16-bit big-endian RGB(A)/grey PNG, filter 0 rows."""
    h, w, c = arr16.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 16, color, 0, 0, 0)
    rows = arr16.astype(">u2").tobytes()
    stride = w * c * 2
    raw = b"".join(
        b"\x00" + rows[y * stride : (y + 1) * stride] for y in range(h)
    )

    def chunk(t, body):
        data = t + body
        return struct.pack(">I", len(body)) + data + struct.pack(
            ">I", zlib.crc32(data)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------- probe


@pytest.mark.parametrize(
    "fmt,kw",
    [("PNG", {}), ("JPEG", {}), ("BMP", {}), ("GIF", {}), ("PPM", {})],
)
def test_probe_matches_decode(rng, fmt, kw):
    data = _pil_bytes(_rgb(rng, 24, 17), fmt, **kw)
    info = probe_image(data)
    img = decode_image(data)
    assert (info.width, info.height) == (img.shape[1], img.shape[0])
    assert info.channels == img.shape[2]
    assert info.bits == 8
    assert info.format == fmt.lower().replace("ppm", "pnm")
    assert not info.is_16bit and not info.is_hdr


def test_probe_png_16bit_and_palette(rng):
    arr16 = rng.integers(0, 65536, size=(6, 5, 3), dtype=np.uint16)
    info = probe_image(_png16(arr16))
    assert (info.width, info.height, info.channels, info.bits) == (5, 6, 3, 16)
    assert info.is_16bit
    # paletted PNG reports expanded channels
    im = PIL.fromarray(_rgb(rng, 9, 7)).quantize(16)
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    info = probe_image(buf.getvalue())
    assert info.channels == 3 and info.bits == 8


def test_probe_jpeg_progressive_dims(rng):
    data = _pil_bytes(_rgb(rng, 32, 40), "JPEG", progressive=True)
    info = probe_image(data)
    assert (info.width, info.height, info.channels) == (40, 32, 3)


def test_probe_hdr_psd_pic(rng):
    img = _rgb(rng, 8, 9)
    info = probe_image(encode_image(img, "hdr"))
    assert (info.width, info.height, info.channels, info.format) == (9, 8, 3, "hdr")
    assert info.is_hdr and info.bits == 32

    from tests.test_formats_ext import _pic_header, _psd_header

    psd = _psd_header(3, 4, 6, 8) + struct.pack(">H", 0) + bytes(3 * 4 * 6)
    info = probe_image(psd)
    assert (info.width, info.height, info.channels, info.bits) == (6, 4, 3, 8)

    pic = _pic_header(5, 3, [(8, 0, 0xE0)]) + bytes(3 * 5 * 3)
    info = probe_image(pic)
    assert (info.width, info.height, info.channels, info.format) == (5, 3, 3, "pic")


def test_probe_tga_gated(rng):
    data = _pil_bytes(_rgb(rng, 10, 12), "TGA")
    with pytest.raises(Exception):
        probe_image(data)  # no magic: refused without the extension hint
    info = probe_image(data, tga=True)
    assert (info.width, info.height, info.channels, info.format) == (
        12, 10, 3, "tga",
    )


def test_probe_garbage_raises():
    with pytest.raises(Exception):
        probe_image(b"\x00" * 64)


# ------------------------------------------------------------- 16-bit load


def test_decode16_png_native(rng):
    arr16 = rng.integers(0, 65536, size=(11, 7, 3), dtype=np.uint16)
    got = decode16(_png16(arr16))
    assert got.dtype == np.uint16
    np.testing.assert_array_equal(got, arr16)
    # the 8-bit decode of the same bytes is the high byte
    np.testing.assert_array_equal(
        decode_image(_png16(arr16)), (arr16 >> 8).astype(np.uint8)
    )


def test_decode16_pil_gray16_crosscheck(rng):
    arr = rng.integers(0, 65536, size=(9, 13), dtype=np.uint16)
    buf = io.BytesIO()
    PIL.fromarray(arr).save(buf, format="PNG")
    got = decode_image_16(buf.getvalue())
    np.testing.assert_array_equal(got[..., 0], arr)


def test_decode16_promotes_8bit(rng):
    arr = _rgb(rng)
    data = _pil_bytes(arr, "PNG")
    np.testing.assert_array_equal(
        decode_image_16(data), arr.astype(np.uint16) * 257
    )
    # non-PNG containers promote through the 8-bit decoder too
    np.testing.assert_array_equal(
        decode_image_16(_pil_bytes(arr, "BMP")), arr.astype(np.uint16) * 257
    )


def test_decode16_paletted_promotes_entries(rng):
    im = PIL.fromarray(_rgb(rng, 9, 7)).quantize(16)
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    np.testing.assert_array_equal(
        decode_image_16(buf.getvalue()),
        np.asarray(im.convert("RGB")).astype(np.uint16) * 257,
    )


def test_pnm16_native_and_rescaled(rng):
    arr16 = rng.integers(0, 65536, size=(5, 4, 3), dtype=np.uint16)
    data = b"P6\n4 5\n65535\n" + arr16.astype(">u2").tobytes()
    np.testing.assert_array_equal(decode_pnm16(data), arr16)
    # stb ignores the header maxval for scaling (stbi__pnm_load reads
    # raw samples): maxval 1023 data comes back verbatim, not rescaled
    arr10 = rng.integers(0, 1024, size=(5, 4, 3), dtype=np.uint16)
    data = b"P6\n4 5\n1023\n" + arr10.astype(">u2").tobytes()
    np.testing.assert_array_equal(decode_pnm16(data), arr10)


def test_psd16_native(rng):
    from tests.test_formats_ext import _psd_header

    arr16 = rng.integers(0, 65536, size=(4, 6, 3), dtype=np.uint16)
    planes = arr16.transpose(2, 0, 1).astype(">u2").tobytes()
    data = _psd_header(3, 4, 6, 16) + struct.pack(">H", 0) + planes
    np.testing.assert_array_equal(decode_psd16(data), arr16)
    # 8-bit PSD promotes
    arr8 = _rgb(rng, 4, 6)
    data8 = (
        _psd_header(3, 4, 6, 8)
        + struct.pack(">H", 0)
        + arr8.transpose(2, 0, 1).tobytes()
    )
    np.testing.assert_array_equal(
        decode_psd16(data8), arr8.astype(np.uint16) * 257
    )


def test_read_image_16(tmp_path, rng):
    arr16 = rng.integers(0, 65536, size=(6, 8, 3), dtype=np.uint16)
    p = tmp_path / "x.png"
    p.write_bytes(_png16(arr16))
    np.testing.assert_array_equal(read_image_16(p), arr16)


# ------------------------------------------------------------- GIF frames


def _animated_gif(frames, **kw):
    buf = io.BytesIO()
    ims = [PIL.fromarray(f).quantize(64) for f in frames]
    ims[0].save(
        buf, format="GIF", save_all=True, append_images=ims[1:], **kw
    )
    return buf.getvalue()


def test_gif_frames_vs_pil(rng):
    frames = [_rgb(rng, 16, 20) for _ in range(4)]
    data = _animated_gif(frames, duration=[30, 40, 50, 60], disposal=1)
    got, delays = decode_gif_frames(data)
    assert got.shape == (4, 16, 20, 4) and got.dtype == np.uint8
    assert delays == [30, 40, 50, 60]
    pil = PIL.open(io.BytesIO(data))
    for i in range(4):
        pil.seek(i)
        want = np.asarray(pil.convert("RGB"))
        np.testing.assert_array_equal(got[i, :, :, :3], want)
        assert (got[i, :, :, 3] == 255).all()


def test_gif_frames_disposal_background(rng):
    # frame 2 only covers a sub-rectangle; disposal=2 clears frame 1's
    # region to transparent before frame 2 draws
    f0 = np.full((10, 10, 3), 200, np.uint8)
    f1 = np.full((4, 4, 3), 30, np.uint8)
    buf = io.BytesIO()
    im0 = PIL.fromarray(f0).quantize(8)
    im1 = PIL.fromarray(f1).quantize(8)
    im0.save(
        buf, format="GIF", save_all=True, append_images=[im1],
        duration=20, disposal=2,
    )
    got, _ = decode_gif_frames(buf.getvalue())
    assert got.shape[0] == 2
    # PIL pastes frame 1 at the origin of a cleared canvas
    assert (got[1, :4, :4, :3] == 30).all()
    # the cleared area outside frame 1's rect is transparent
    assert (got[1, 5:, 5:, 3] == 0).all()


def test_gif_single_frame_matches_decode_gif(rng):
    data = _pil_bytes(_rgb(rng, 12, 9), "GIF")
    frames, delays = decode_gif_frames(data)
    assert frames.shape[0] == 1 and len(delays) == 1
    np.testing.assert_array_equal(
        frames[0, :, :, :3], decode_image(data)[..., :3]
    )


# -------------------------------------------------------- convert_channels


def test_convert_rgb_to_grey_stb_formula(rng):
    img = _rgb(rng, 7, 5)
    got = convert_channels(img, 1)
    want = (
        img[..., 0].astype(np.uint32) * 77
        + img[..., 1].astype(np.uint32) * 150
        + img[..., 2].astype(np.uint32) * 29
    ) >> 8
    np.testing.assert_array_equal(got[..., 0], want.astype(np.uint8))


@pytest.mark.parametrize("src,dst", [(1, 3), (1, 4), (2, 3), (2, 4),
                                     (3, 4), (4, 3), (4, 1), (4, 2), (3, 2)])
def test_convert_channel_matrix(rng, src, dst):
    img = rng.integers(0, 256, size=(6, 4, src), dtype=np.uint8)
    out = convert_channels(img, dst)
    assert out.shape == (6, 4, dst) and out.dtype == np.uint8
    if src in (1, 2) and dst in (3, 4):  # grey replicates
        np.testing.assert_array_equal(out[..., 1], img[..., 0])
    if src == 2 and dst == 4:  # alpha carried over
        np.testing.assert_array_equal(out[..., 3], img[..., 1])
    if src == 4 and dst == 3:  # alpha dropped
        np.testing.assert_array_equal(out, img[..., :3])
    if dst == 4 and src in (1, 3):  # synthesized opaque alpha
        assert (out[..., -1] == 255).all()


def test_convert_uint16_and_identity(rng):
    img = rng.integers(0, 65536, size=(5, 5, 3), dtype=np.uint16)
    assert convert_channels(img, 3) is img
    g = convert_channels(img, 1)
    assert g.dtype == np.uint16
    want = (
        img[..., 0].astype(np.uint32) * 77
        + img[..., 1].astype(np.uint32) * 150
        + img[..., 2].astype(np.uint32) * 29
    ) >> 8
    np.testing.assert_array_equal(g[..., 0], want.astype(np.uint16))
    # 2-D input is treated as single-channel
    out = convert_channels(np.zeros((3, 3), np.uint8), 3)
    assert out.shape == (3, 3, 3)


def test_flip_vertical_load_and_write(tmp_path, rng):
    """stbi_set_flip_vertically_on_load / stbi_flip_vertically_on_write
    analogs: explicit arguments instead of process-global flags."""
    from lanczos_tpu.io import read_image, write_image

    arr = _rgb(rng, 9, 7)
    p = tmp_path / "x.png"
    write_image(p, arr)
    np.testing.assert_array_equal(read_image(p, flip_vertical=True), arr[::-1])
    write_image(p, arr, flip_vertical=True)
    np.testing.assert_array_equal(read_image(p), arr[::-1])
    # round trip: both flips cancel
    write_image(p, arr, flip_vertical=True)
    np.testing.assert_array_equal(read_image(p, flip_vertical=True), arr)
    # 16-bit variant
    np.testing.assert_array_equal(
        read_image_16(p, flip_vertical=True), arr.astype(np.uint16) * 257
    )


# ------------------------------------------------ stb disposal semantics
#
# PIL's dispose-2 clears to transparent; stb restores the canvas snapshot
# taken before the disposed frame drew (stb_image.h:6743-6750).  These
# hand-built GIFs pin the stb behavior (round-3 advisor finding).


def _lzw_min(pixels, min_code):
    """Minimal GIF LZW: CLEAR after every literal keeps the code width
    fixed at min_code+1 bits."""
    clear, eoi, width = 1 << min_code, (1 << min_code) + 1, min_code + 1
    out, acc, nbits = bytearray(), 0, 0

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for p in pixels:
        emit(int(p))
        emit(clear)
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _raw_gif(w, h, gpal, frames, bgindex=0):
    """frames: [(x0, y0, idx2d, dispose, transparent_or_None), ...]"""
    szbits = max(0, (len(gpal) - 1).bit_length() - 1)
    out = bytearray(b"GIF89a") + struct.pack("<HH", w, h)
    out += bytes([0x80 | szbits, bgindex, 0]) + bytes(gpal.flatten())
    min_code = max(2, szbits + 1)
    for x0, y0, idx, dispose, transparent in frames:
        out += bytes([
            0x21, 0xF9, 4,
            (dispose << 2) | (1 if transparent is not None else 0),
            0, 0, transparent or 0, 0,
        ])
        fh, fw = idx.shape
        out += bytes([0x2C]) + struct.pack("<HHHH", x0, y0, fw, fh)
        out += bytes([0, min_code])
        lzw = _lzw_min(idx.flatten(), min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += bytes([0])
    out += bytes([0x3B])
    return bytes(out)


_GPAL4 = np.array(
    [[10, 20, 30], [200, 0, 0], [0, 200, 0], [0, 0, 200]], np.uint8
)


def test_gif_dispose2_restores_canvas_snapshot():
    full = np.ones((8, 8), np.uint8)  # palette 1 everywhere
    sub = np.full((4, 4), 2, np.uint8)
    tiny = np.full((2, 2), 3, np.uint8)
    data = _raw_gif(8, 8, _GPAL4, [
        (0, 0, full, 1, None),
        (2, 2, sub, 2, None),
        (0, 0, tiny, 0, None),
    ])
    frames, _ = decode_gif_frames(data)
    assert frames.shape == (3, 8, 8, 4)
    assert (frames[1, 2:6, 2:6, :3] == [0, 200, 0]).all()
    # the dispose-2 frame's rect reverts to frame 0's pixels (the canvas
    # snapshot), NOT transparent black
    assert (frames[2, 2:6, 2:6, :3] == [200, 0, 0]).all()
    assert (frames[2, 2:6, 2:6, 3] == 255).all()
    assert (frames[2, :2, :2, :3] == [0, 0, 200]).all()


def test_gif_dispose3_restores_two_back():
    f0 = np.ones((6, 6), np.uint8)
    f1 = np.full((6, 6), 2, np.uint8)
    tiny = np.full((2, 2), 3, np.uint8)
    data = _raw_gif(6, 6, _GPAL4, [
        (0, 0, f0, 1, None),
        (0, 0, f1, 3, None),
        (0, 0, tiny, 0, None),
    ])
    frames, _ = decode_gif_frames(data)
    # frame 1 (dispose 3) is undone to the frame-0 composite before
    # frame 2 draws
    assert (frames[2, 3:, 3:, :3] == [200, 0, 0]).all()
    assert (frames[2, :2, :2, :3] == [0, 0, 200]).all()


def test_gif_dispose3_without_two_back_remaps_to_2():
    f0 = np.ones((4, 4), np.uint8)
    tiny = np.full((2, 2), 2, np.uint8)
    data = _raw_gif(4, 4, _GPAL4, [
        (0, 0, f0, 3, None),       # dispose 3 but no two-back frame
        (1, 1, tiny, 0, None),
    ])
    frames, _ = decode_gif_frames(data)
    # stb_image.h:6733-6735: falls back to dispose 2 = restore to the
    # (initially transparent) background
    assert (frames[1, 0, 0] == [0, 0, 0, 0]).all()
    assert (frames[1, 1:3, 1:3, :3] == [0, 200, 0]).all()


def test_gif_first_frame_bgindex_fill_stb_quirk():
    tiny = np.full((2, 2), 3, np.uint8)
    data = _raw_gif(8, 8, _GPAL4, [(0, 0, tiny, 0, None)], bgindex=1)
    frames, _ = decode_gif_frames(data)
    # raster-untouched first-frame pixels get the palette row copied the
    # way stb memcpys its BGR-stored table (stb_image.h:6817-6824):
    # palette entry 1 = (200, 0, 0) lands channel-swapped as (0, 0, 200)
    np.testing.assert_array_equal(
        frames[0, 5, 5], np.array([0, 0, 200, 255], np.uint8)
    )
    # the drawn rect itself keeps RGB order (palette 3 = (0, 0, 200))
    assert (frames[0, 0:2, 0:2, :3] == [0, 0, 200]).all()
    assert (frames[0, 0:2, 0:2, 3] == 255).all()


def test_pnm_16bit_narrows_with_shift8():
    """stb narrows 16->8 with a plain >>8 (stbi__convert_16_to_8), not
    *255//maxval: v=256 at maxval=65535 must come back 1, not 0."""
    from lanczos_tpu.io.formats import decode_pnm

    arr = np.array([[[256, 257, 65535]]], np.uint16)
    data = b"P6\n1 1\n65535\n" + arr.astype(">u2").tobytes()
    np.testing.assert_array_equal(
        decode_pnm(data), (arr >> 8).astype(np.uint8)
    )


def test_pnm_maxval_over_65535_rejected():
    from lanczos_tpu.io.formats import FormatError, decode_pnm

    data = b"P5\n1 1\n65536\n" + b"\0\0"
    with pytest.raises(FormatError):
        decode_pnm(data)


def test_error_story_failure_reason_analog():
    """The ``stbi_failure_reason`` analog (PARITY.md "error handling"):
    every codec raises a typed ``ValueError`` subclass whose ``str()``
    carries the human-readable reason — no NULL returns, no process-global
    last-error state to query afterwards."""
    from lanczos_tpu.io.formats import FormatError
    from lanczos_tpu.io.jpeg import JPEGError
    from lanczos_tpu.io.png import PNGError

    cases = [
        (b"\x89PNG\r\n\x1a\n" + bytes(16), PNGError),
        (b"\xff\xd8" + bytes(8), JPEGError),
        (b"BM" + bytes(64), FormatError),
    ]
    for data, exc in cases:
        with pytest.raises(exc) as ei:
            decode_image(data)
        assert isinstance(ei.value, ValueError)  # one common catchable base
        assert str(ei.value)  # the reason rides the exception itself
