"""PSD / HDR / PIC codecs — the last of the reference's stb ingest set.

Fixtures are hand-assembled from the format specs (PIL writes none of
these), cross-checked against PIL's PSD reader where available, plus
encode→decode round-trips for HDR.
"""

import io
import struct

import numpy as np
import pytest

from lanczos_tpu.io import decode_image, encode_image
from lanczos_tpu.io.formats import (
    FormatError,
    decode_hdr,
    decode_pic,
    decode_psd,
    encode_hdr,
    hdr_to_ldr,
    ldr_to_hdr,
)


# ---------------------------------------------------------------- PSD


def _psd_header(channels, h, w, depth):
    return (
        b"8BPS"
        + struct.pack(">H", 1)
        + b"\x00" * 6
        + struct.pack(">HIIHH", channels, h, w, depth, 3)
        + struct.pack(">I", 0) * 3  # color-mode / resources / layers
    )


def _pack_bits(row: np.ndarray) -> bytes:
    """Minimal PackBits encoder (literals + runs >= 3)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 3:
            out += bytes((257 - run, row[i]))
            i += run
        else:
            lit = i
            while (
                i < n
                and i - lit < 128
                and not (
                    i + 2 < n and row[i] == row[i + 1] == row[i + 2]
                )
            ):
                i += 1
            out += bytes((i - lit - 1,)) + row[lit:i].tobytes()
    return bytes(out)


def test_psd_raw_8bit(rng):
    arr = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8)
    data = _psd_header(3, 9, 13, 8) + struct.pack(">H", 0) + (
        arr.transpose(2, 0, 1).tobytes()
    )
    np.testing.assert_array_equal(decode_psd(data), arr)
    np.testing.assert_array_equal(decode_image(data), arr)


def test_psd_raw_8bit_vs_pil(rng):
    PIL = pytest.importorskip("PIL.Image")
    arr = rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
    data = _psd_header(3, 6, 8, 8) + struct.pack(">H", 0) + (
        arr.transpose(2, 0, 1).tobytes()
    )
    got_pil = np.asarray(PIL.open(io.BytesIO(data)).convert("RGB"))
    np.testing.assert_array_equal(decode_psd(data), got_pil)


def test_psd_raw_16bit(rng):
    arr16 = rng.integers(0, 65536, size=(5, 7, 3), dtype=np.uint16)
    data = _psd_header(3, 5, 7, 16) + struct.pack(">H", 0) + (
        arr16.transpose(2, 0, 1).astype(">u2").tobytes()
    )
    # stb's 16->8 narrowing is the high byte (stbi__convert_16_to_8)
    want = (arr16 >> 8).astype(np.uint8)
    np.testing.assert_array_equal(decode_psd(data), want)


def test_psd_rle_rgba(rng):
    # runs + literals per row, 4 channels -> RGBA out
    arr = rng.integers(0, 4, size=(11, 37, 4), dtype=np.uint8) * 80
    planes = arr.transpose(2, 0, 1)
    counts, payload = [], []
    for ch in range(4):
        for y in range(11):
            enc = _pack_bits(planes[ch, y])
            counts.append(len(enc))
            payload.append(enc)
    data = (
        _psd_header(4, 11, 37, 8)
        + struct.pack(">H", 1)
        + b"".join(struct.pack(">H", c) for c in counts)
        + b"".join(payload)
    )
    np.testing.assert_array_equal(decode_psd(data), arr)


def test_psd_rejects():
    with pytest.raises(FormatError):
        decode_psd(b"8BPT" + b"\x00" * 30)
    with pytest.raises(FormatError):  # CMYK color mode
        decode_psd(
            b"8BPS" + struct.pack(">H", 1) + b"\x00" * 6
            + struct.pack(">HIIHH", 4, 2, 2, 8, 4) + struct.pack(">I", 0) * 3
            + struct.pack(">H", 0) + b"\x00" * 16
        )


# ---------------------------------------------------------------- HDR


def test_hdr_roundtrip_rle(rng):
    # smooth field + flat patches exercise both literals and runs
    img = (
        np.linspace(0.0, 4.0, 24 * 40 * 3, dtype=np.float32)
        .reshape(24, 40, 3)
    )
    img[3:9, 4:30] = 0.25
    img[12, :, :] = 0.0
    data = encode_hdr(img)
    got = decode_hdr(data)
    assert got.shape == (24, 40, 3)
    # RGBE carries an 8-bit shared-exponent mantissa: ~1/256 relative
    err = np.abs(got - img) / np.maximum(img.max(-1, keepdims=True), 1e-9)
    assert err.max() < 1.0 / 128
    np.testing.assert_array_equal(got[12], 0.0)


def test_hdr_narrow_image_flat_records(rng):
    img = rng.random((5, 4, 3)).astype(np.float32)  # w=4 < 8: flat layout
    got = decode_hdr(encode_hdr(img))
    err = np.abs(got - img)
    assert err.max() < img.max() / 128


def test_hdr_old_style_rle():
    # hand-built: one real pixel then an old-style (1,1,1,n) run marker
    w, h = 10, 1
    head = (
        b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n"
        + f"-Y {h} +X {w}\n".encode()
    )
    px = bytes((128, 64, 32, 129))  # some RGBE pixel
    body = px + bytes((1, 1, 1, 9))  # repeat previous 9 times
    got = decode_hdr(head + body)
    assert got.shape == (1, 10, 3)
    assert np.all(got[0] == got[0, 0])


def test_hdr_ldr_conversions_roundtrip(rng):
    u8 = rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    lifted = ldr_to_hdr(u8)
    assert lifted.dtype == np.float32
    np.testing.assert_array_equal(hdr_to_ldr(lifted), u8)


def test_hdr_decode_image_tone_maps(rng):
    img = rng.random((8, 12, 3)).astype(np.float32)
    data = encode_hdr(img)
    u8 = decode_image(data)
    assert u8.dtype == np.uint8 and u8.shape == (8, 12, 3)
    want = hdr_to_ldr(decode_hdr(data))
    np.testing.assert_array_equal(u8, want)


def test_hdr_encode_accepts_uint8(rng):
    u8 = rng.integers(0, 256, size=(8, 12, 3), dtype=np.uint8)
    got = decode_hdr(encode_image(u8, "hdr"))
    err = np.abs(got - ldr_to_hdr(u8))
    assert err.max() < 1.0 / 64


def test_hdr_rejects():
    with pytest.raises(FormatError):
        decode_hdr(b"not an hdr\n")
    with pytest.raises(FormatError):
        decode_hdr(b"#?RADIANCE\nFORMAT=weird\n\n-Y 1 +X 8\n" + b"\x00" * 32)


# ---------------------------------------------------------------- PIC


def _pic_header(w, h, packets):
    head = (
        b"\x53\x80\xf6\x34" + b"\x00" * 84 + b"PICT"
        + struct.pack(">HH", w, h)
        + struct.pack(">f", 1.0) + struct.pack(">HH", 3, 0)
    )
    plist = b""
    for i, (size, ptype, mask) in enumerate(packets):
        chained = 0 if i == len(packets) - 1 else 1
        plist += bytes((chained, size, ptype, mask))
    return head + plist


def test_pic_uncompressed(rng):
    arr = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    body = arr.tobytes()  # one RGB packet, per-row interleaved
    got = decode_pic(_pic_header(6, 4, [(8, 0, 0xE0)]) + body)
    np.testing.assert_array_equal(got, arr)


def test_pic_mixed_rle_with_alpha(rng):
    w, h = 9, 3
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    alpha = np.full((h, w), 200, np.uint8)
    body = bytearray()
    for y in range(h):
        # RGB packet: literal run of all 9 pixels (count byte = 8)
        body += bytes((w - 1,)) + rgb[y].tobytes()
        # alpha packet: short repeat (count 127+9 -> 9 px? no: 136-127=9)
        body += bytes((127 + w, 200))
    got = decode_pic(
        _pic_header(w, h, [(8, 2, 0xE0), (8, 2, 0x10)]) + bytes(body)
    )
    assert got.shape == (h, w, 4)
    np.testing.assert_array_equal(got[:, :, :3], rgb)
    np.testing.assert_array_equal(got[:, :, 3], alpha)


def test_pic_mixed_rle_long_run(rng):
    w = 300
    body = bytearray()
    # count byte 128 -> explicit 16-bit count
    body += bytes((128,)) + struct.pack(">H", w) + bytes((7, 8, 9))
    got = decode_pic(_pic_header(w, 1, [(8, 2, 0xE0)]) + bytes(body))
    np.testing.assert_array_equal(got[0, :, 0], 7)
    np.testing.assert_array_equal(got[0, :, 2], 9)


def test_pic_pure_rle(rng):
    w = 8
    body = bytes((5, 1, 2, 3)) + bytes((3, 9, 8, 7))
    got = decode_pic(_pic_header(w, 1, [(8, 1, 0xE0)]) + body)
    np.testing.assert_array_equal(got[0, :5], np.tile([1, 2, 3], (5, 1)))
    np.testing.assert_array_equal(got[0, 5:], np.tile([9, 8, 7], (3, 1)))


def test_pic_via_decode_image(rng):
    arr = rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
    data = _pic_header(5, 3, [(8, 0, 0xE0)]) + arr.tobytes()
    np.testing.assert_array_equal(decode_image(data), arr)


def test_pic_rejects():
    with pytest.raises(FormatError):
        decode_pic(b"\x00" * 128)
