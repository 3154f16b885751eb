"""BMP / TGA / PNM / GIF decoders vs PIL-generated fixtures.

Closes the rest of the reference's stb ingest surface (round-1 verdict
item 8; ``stb_image.h`` formats minus the vanishingly-rare PSD/PIC).
"""

import io

import numpy as np
import pytest

PIL = pytest.importorskip("PIL.Image")

from lanczos_tpu.io import decode_image, read_image
from lanczos_tpu.io.formats import (
    FormatError,
    decode_bmp,
    decode_gif,
    decode_pnm,
    decode_tga,
)


def _rgb(rng, h=23, w=17):
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _save(arr, fmt, **kw):
    buf = io.BytesIO()
    im = PIL.fromarray(arr.squeeze(-1) if arr.shape[-1] == 1 else arr)
    im.save(buf, format=fmt, **kw)
    return buf.getvalue()


def test_bmp_24bit(rng):
    arr = _rgb(rng)
    got = decode_bmp(_save(arr, "BMP"))
    np.testing.assert_array_equal(got, arr)


def test_bmp_8bit_palette(rng):
    im = PIL.fromarray(_rgb(rng, 32, 16)).quantize(100)
    buf = io.BytesIO()
    im.save(buf, format="BMP")
    got = decode_bmp(buf.getvalue())
    np.testing.assert_array_equal(got, np.asarray(im.convert("RGB")))


def test_tga_truecolor_and_rle(rng):
    arr = _rgb(rng, 19, 21)
    for rle in (False, True):
        got = decode_tga(_save(arr, "TGA", rle=rle))
        np.testing.assert_array_equal(got, arr)


def test_tga_grayscale(rng):
    arr = rng.integers(0, 256, size=(9, 11, 1), dtype=np.uint8)
    got = decode_tga(_save(arr, "TGA"))
    np.testing.assert_array_equal(got, arr)


def test_pnm_p6_and_p5(rng):
    arr = _rgb(rng)
    np.testing.assert_array_equal(decode_pnm(_save(arr, "PPM")), arr)
    g = rng.integers(0, 256, size=(13, 7, 1), dtype=np.uint8)
    np.testing.assert_array_equal(decode_pnm(_save(g, "PPM")), g)


def test_gif_palette_roundtrip(rng):
    im = PIL.fromarray(_rgb(rng, 25, 33)).quantize(64)
    buf = io.BytesIO()
    im.save(buf, format="GIF")
    got = decode_gif(buf.getvalue())
    np.testing.assert_array_equal(got[..., :3], np.asarray(im.convert("RGB")))


def test_gif_large_dictionary(rng):
    """Enough pixels to grow the LZW code size past 9 bits."""
    arr = (np.indices((64, 128)).sum(0) % 200).astype(np.uint8)
    im = PIL.fromarray(arr, mode="L").convert("P")
    buf = io.BytesIO()
    im.save(buf, format="GIF")
    got = decode_gif(buf.getvalue())
    np.testing.assert_array_equal(got[..., :3], np.asarray(im.convert("RGB")))


def test_dispatch_by_magic_and_extension(tmp_path, rng):
    arr = _rgb(rng)
    assert np.array_equal(decode_image(_save(arr, "BMP")), arr)
    assert np.array_equal(decode_image(_save(arr, "PPM")), arr)
    p = tmp_path / "x.tga"
    p.write_bytes(_save(arr, "TGA"))
    assert np.array_equal(read_image(p), arr)
    with pytest.raises(ValueError):
        decode_image(b"\x00\x01nonsense")


@pytest.mark.parametrize("keep", [0.5, 0.75, 0.9])
def test_gif_truncated_raises(rng, keep):
    """Truncated GIF data raises FormatError at any cut point — either a
    block-structure overrun or the decoded-pixel shortfall (regression:
    a short LZW stream returned np.empty garbage rows)."""
    import io as _io

    im = PIL.fromarray(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8))
    buf = _io.BytesIO()
    im.save(buf, format="GIF")
    data = buf.getvalue()
    with pytest.raises(FormatError):
        decode_gif(data[: int(len(data) * keep)])


def test_lzw_native_matches_python(rng):
    """The C++ LZW fast path is behavior-identical to the pure-Python
    decoder, including on truncated streams (differential fuzz)."""
    import lanczos_tpu.io._native as N
    from lanczos_tpu.io._native import native_lib

    if native_lib() is None or not hasattr(native_lib(), "gif_lzw_decode"):
        pytest.skip("native lzw unavailable")
    im = PIL.fromarray(_rgb(rng, 40, 56)).quantize(100)
    buf = io.BytesIO()
    im.save(buf, format="GIF")
    data = buf.getvalue()
    saved = N._lib
    for cut in list(range(20, len(data), 11)) + [len(data)]:
        chunk = data[:cut]
        try:
            a, a_exc = decode_gif(chunk), None
        except ValueError as e:
            a, a_exc = None, e
        N._lib = None
        N._tried = True
        try:
            try:
                p, p_exc = decode_gif(chunk), None
            except ValueError as e:
                p, p_exc = None, e
        finally:
            N._lib = saved
        assert (a is None) == (p is None), (cut, a_exc, p_exc)
        if a is not None:
            np.testing.assert_array_equal(a, p)


def test_bmp_1bit_and_4bit(rng):
    """stb reads 1/4-bit paletted BMPs (no RLE); bit-unpacked rows."""
    arr = _rgb(rng, 21, 13)
    im1 = PIL.fromarray(arr).convert("L").convert("1")
    buf = io.BytesIO()
    im1.save(buf, format="BMP", bits=1)
    np.testing.assert_array_equal(
        decode_bmp(buf.getvalue()), np.asarray(im1.convert("RGB"))
    )
    im4 = PIL.fromarray(arr).quantize(16)
    buf = io.BytesIO()
    im4.save(buf, format="BMP", bits=4)
    np.testing.assert_array_equal(
        decode_bmp(buf.getvalue()), np.asarray(im4.convert("RGB"))
    )


def test_bmp_16bit_bitfields(rng):
    """16-bit BMP with 565 BITFIELDS masks (hand-built; PIL writes none)."""
    w, h = 7, 5
    px = rng.integers(0, 65536, (h, w), np.uint16)
    stride = (w * 2 + 3) & ~3
    rowbytes = b"".join(
        px[y].astype("<u2").tobytes().ljust(stride, b"\0")
        for y in range(h - 1, -1, -1)
    )
    hdr = (
        b"BM" + (66 + len(rowbytes)).to_bytes(4, "little") + bytes(4)
        + (66).to_bytes(4, "little")
    )
    dib = (
        (40).to_bytes(4, "little") + w.to_bytes(4, "little")
        + h.to_bytes(4, "little") + (1).to_bytes(2, "little")
        + (16).to_bytes(2, "little") + (3).to_bytes(4, "little") + bytes(20)
    )
    masks = b"".join(m.to_bytes(4, "little") for m in (0xF800, 0x07E0, 0x001F))
    got = decode_bmp(hdr + dib + masks + rowbytes)
    # stb's stbi__shiftsigned bit-replication (stb_image.h:5331-5348),
    # NOT (v*255)//maxv — they differ by 1 LSB on some values
    r5 = ((px >> 11) & 31).astype(np.uint32)
    g6 = ((px >> 5) & 63).astype(np.uint32)
    b5 = (px & 31).astype(np.uint32)
    r = (r5 << 3) | (r5 >> 2)
    g = (g6 << 2) | (g6 >> 4)
    b_ = (b5 << 3) | (b5 >> 2)
    np.testing.assert_array_equal(got, np.stack([r, g, b_], -1).astype(np.uint8))


def test_bmp_32bit_bitfields_nondefault_masks(rng):
    """32-bit BI_BITFIELDS with non-BGRA masks must honor the masks via
    stb's shiftsigned (round-4 review finding: the fast path silently
    swapped R/B for e.g. RGBA-ordered masks)."""
    w, h = 5, 4
    r = rng.integers(0, 256, (h, w), np.uint32)
    g = rng.integers(0, 256, (h, w), np.uint32)
    b = rng.integers(0, 256, (h, w), np.uint32)
    a = rng.integers(0, 256, (h, w), np.uint32)
    # RGBA byte order: R in the LOW byte (mask 0x000000FF)
    px = (r | (g << 8) | (b << 16) | (a << 24)).astype("<u4")
    rowbytes = b"".join(px[y].tobytes() for y in range(h - 1, -1, -1))
    off = 14 + 108 + 0
    hdr = (
        b"BM" + (off + len(rowbytes)).to_bytes(4, "little") + bytes(4)
        + off.to_bytes(4, "little")
    )
    dib = (
        (108).to_bytes(4, "little") + w.to_bytes(4, "little")
        + h.to_bytes(4, "little") + (1).to_bytes(2, "little")
        + (32).to_bytes(2, "little") + (3).to_bytes(4, "little")
        + bytes(20)  # SizeImage/XPels/YPels/ClrUsed/ClrImportant
        + (0x000000FF).to_bytes(4, "little")   # R mask
        + (0x0000FF00).to_bytes(4, "little")   # G mask
        + (0x00FF0000).to_bytes(4, "little")   # B mask
        + (0xFF000000).to_bytes(4, "little")   # A mask
        + bytes(108 - 56)
    )
    got = decode_bmp(hdr + dib + rowbytes)
    np.testing.assert_array_equal(got[..., 0], r.astype(np.uint8))
    np.testing.assert_array_equal(got[..., 1], g.astype(np.uint8))
    np.testing.assert_array_equal(got[..., 2], b.astype(np.uint8))
    np.testing.assert_array_equal(got[..., 3], a.astype(np.uint8))


def test_bmp_32bit_default_rgb_masks_no_alpha(rng):
    """Default RGB masks WITHOUT an alpha mask (BITMAPINFOHEADER
    BI_BITFIELDS): stb's easy==2 gate requires ma == 0xFF000000 too, so
    this routes through shiftsigned with img_n = 3 — the 4th byte is
    discarded, not returned as alpha (stb_image.h:5586-5589, :5476)."""
    arr = np.dstack([
        rng.integers(0, 256, (6, 7), np.uint8) for _ in range(4)
    ])
    bgra = arr[:, :, [2, 1, 0, 3]]
    rowbytes = b"".join(
        bgra[y].tobytes() for y in range(5, -1, -1)
    )
    off = 14 + 40 + 12
    hdr = (
        b"BM" + (off + len(rowbytes)).to_bytes(4, "little") + bytes(4)
        + off.to_bytes(4, "little")
    )
    dib = (
        (40).to_bytes(4, "little") + (7).to_bytes(4, "little")
        + (6).to_bytes(4, "little") + (1).to_bytes(2, "little")
        + (32).to_bytes(2, "little") + (3).to_bytes(4, "little")
        + bytes(20)
    )
    masks = b"".join(
        m.to_bytes(4, "little")
        for m in (0x00FF0000, 0x0000FF00, 0x000000FF)
    )
    got = decode_bmp(hdr + dib + masks + rowbytes)
    np.testing.assert_array_equal(got, arr[:, :, :3])


def test_bmp_32bit_all_zero_alpha_forced_opaque(rng):
    """stb's all_a quirk (stb_image.h:5631-5634): a 32-bit image whose
    alpha channel decodes to all zeros comes back fully opaque."""
    rgb = np.dstack([
        rng.integers(0, 256, (4, 5), np.uint8) for _ in range(3)
    ])
    bgra = np.dstack([rgb[:, :, 2], rgb[:, :, 1], rgb[:, :, 0],
                      np.zeros((4, 5), np.uint8)])
    rowbytes = b"".join(bgra[y].tobytes() for y in range(3, -1, -1))
    off = 14 + 40
    hdr = (
        b"BM" + (off + len(rowbytes)).to_bytes(4, "little") + bytes(4)
        + off.to_bytes(4, "little")
    )
    dib = (
        (40).to_bytes(4, "little") + (5).to_bytes(4, "little")
        + (4).to_bytes(4, "little") + (1).to_bytes(2, "little")
        + (32).to_bytes(2, "little") + (0).to_bytes(4, "little")
        + bytes(20)
    )
    got = decode_bmp(hdr + dib + rowbytes)
    np.testing.assert_array_equal(got[..., :3], rgb)
    assert (got[..., 3] == 255).all()


def test_bmp_bitfields_24bpp_rejected(rng):
    """BI_BITFIELDS with 24 bpp is malformed; stb rejects it ("bad BMP")
    instead of silently decoding BGR and ignoring the masks (round-5
    advisor finding)."""
    w, h = 4, 3
    stride = (w * 3 + 3) & ~3
    rowbytes = bytes(stride * h)
    hdr = (
        b"BM" + (66 + len(rowbytes)).to_bytes(4, "little") + bytes(4)
        + (66).to_bytes(4, "little")
    )
    dib = (
        (40).to_bytes(4, "little") + w.to_bytes(4, "little")
        + h.to_bytes(4, "little") + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little") + (3).to_bytes(4, "little") + bytes(20)
    )
    masks = b"".join(
        m.to_bytes(4, "little") for m in (0xFF0000, 0x00FF00, 0x0000FF)
    )
    with pytest.raises(FormatError):
        decode_bmp(hdr + dib + masks + rowbytes)


def test_gif_encode_roundtrip_exact(rng):
    """encode_gif with ≤256 distinct colors is LOSSLESS through our own
    decoder (exact global palette)."""
    from lanczos_tpu.io.formats import encode_gif

    pal = rng.integers(0, 256, (40, 3), np.uint8)
    img = pal[rng.integers(0, 40, (33, 47))]
    got = decode_gif(encode_gif(img))
    np.testing.assert_array_equal(got[..., :3], img)


def test_gif_encode_animation_roundtrip(rng):
    """Animated encode: frames and delays survive our decode_gif_frames
    and PIL cross-decodes the container."""
    import io as _io

    from PIL import Image as PIL

    from lanczos_tpu.io.formats import decode_gif_frames, encode_gif

    pal = rng.integers(0, 256, (16, 3), np.uint8)
    frames = pal[rng.integers(0, 16, (5, 21, 17))]
    data = encode_gif(frames, delays_cs=[2, 3, 4, 5, 6], loop=0)
    got, delays = decode_gif_frames(data)
    assert got.shape[0] == 5
    np.testing.assert_array_equal(got[..., :3], frames)
    assert list(delays) == [20, 30, 40, 50, 60]  # ms
    pim = PIL.open(_io.BytesIO(data))
    assert pim.n_frames == 5
    pim.seek(3)
    np.testing.assert_array_equal(
        np.asarray(pim.convert("RGB")), frames[3]
    )


def test_gif_encode_quantized_many_colors(rng):
    """>256 distinct colors: median-cut palette, bounded error."""
    from lanczos_tpu.io.formats import encode_gif

    img = rng.integers(0, 256, (64, 64, 3), np.uint8)  # ~4096 colors
    got = decode_gif(encode_gif(img))
    err = np.abs(got[..., :3].astype(int) - img.astype(int))
    assert err.mean() < 24  # quantized but in the right ballpark
    assert got[..., :3].dtype == np.uint8


def test_gif_encode_python_native_lzw_identical(rng, monkeypatch):
    """The pure-Python LZW encoder is byte-identical to the native core."""
    from lanczos_tpu.io import _native
    from lanczos_tpu.io.formats import _lzw_decode, _lzw_encode

    idx = rng.integers(0, 200, 7000, dtype=np.uint8)
    native = _lzw_encode(idx, 8)
    monkeypatch.setattr(_native, "native_lib", lambda: None)
    monkeypatch.setattr(
        "lanczos_tpu.io._native.native_lib", lambda: None
    )
    pure = _lzw_encode(idx, 8)
    assert native == pure
    np.testing.assert_array_equal(_lzw_decode(pure, 8, idx.size), idx)


def test_gif_encode_grayscale_and_errors(rng):
    from lanczos_tpu.io.formats import encode_gif

    g = rng.integers(0, 256, (9, 11), np.uint8)
    got = decode_gif(encode_gif(g))
    np.testing.assert_array_equal(got[..., 0], g)
    with pytest.raises(ValueError):
        encode_gif(rng.integers(0, 256, (4, 4, 4), np.uint8))  # RGBA
    with pytest.raises(ValueError):
        encode_gif(np.zeros((4, 4, 3), np.float32))


def test_gif_encode_lzw_table_full_reset(rng, monkeypatch):
    """Streams long enough to fill the 4096-entry LZW table exercise the
    encoder's CLEAR+reset path IN BOTH IMPLEMENTATIONS — the native core
    and the pure-Python fallback must produce byte-identical streams
    (r5 review: the native lib is always present here, so without the
    monkeypatched leg the Python reset branch was never covered)."""
    from lanczos_tpu.io.formats import _lzw_decode, _lzw_encode

    for mcs, hi in ((8, 256), (2, 4)):
        idx = rng.integers(0, hi, 300_000, dtype=np.uint8)
        enc = _lzw_encode(idx, mcs)
        np.testing.assert_array_equal(_lzw_decode(enc, mcs, idx.size), idx)
        with monkeypatch.context() as m:
            m.setattr("lanczos_tpu.io._native.native_lib", lambda: None)
            assert _lzw_encode(idx, mcs) == enc  # pure-Python leg
    # degenerate streams: constant, alternating, single pixel, empty
    from lanczos_tpu.io.formats import encode_gif, decode_gif

    flat = np.full((77, 91, 3), 200, np.uint8)
    np.testing.assert_array_equal(decode_gif(encode_gif(flat))[..., :3], flat)
    alt = np.zeros((64, 64, 3), np.uint8)
    alt[::2] = 255
    np.testing.assert_array_equal(decode_gif(encode_gif(alt))[..., :3], alt)
    one = np.array([[[1, 2, 3]]], np.uint8)
    np.testing.assert_array_equal(decode_gif(encode_gif(one))[..., :3], one)


def test_gif_encode_pil_cross_decode_fuzz(rng):
    """Randomized cross-check: PIL decodes our GIFs to the exact pixels
    for <=256-color content (sizes, palette sizes, frame counts)."""
    import io as _io

    from PIL import Image as PIL

    from lanczos_tpu.io.formats import encode_gif

    for _ in range(6):
        ncol = int(rng.integers(2, 257))
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        t = int(rng.integers(1, 4))
        pal = rng.integers(0, 256, (ncol, 3), np.uint8)
        frames = pal[rng.integers(0, ncol, (t, h, w))]
        data = encode_gif(frames if t > 1 else frames[0])
        pim = PIL.open(_io.BytesIO(data))
        assert (pim.n_frames if t > 1 else 1) == t
        for k in range(t):
            pim.seek(k)
            np.testing.assert_array_equal(
                np.asarray(pim.convert("RGB")), frames[k]
            )
