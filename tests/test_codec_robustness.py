"""Never-crash contract for the codec layer (the stb analog: corrupt
bytes yield a typed error, not a crash).

Every decoder must raise a ValueError subclass (FormatError / PNGError /
JPEGError) on truncated or bit-flipped input — never IndexError,
struct.error, zlib.error — and must reject implausible header dimensions
before allocating memory sized by them."""

import io
import struct

import numpy as np
import pytest
from PIL import Image as PIL

from lanczos_tpu.io import decode_image, decode_image_16, encode_image, probe_image
from lanczos_tpu.io.formats import (
    FormatError,
    decode_gif_frames,
    decode_pnm,
    decode_psd,
    decode_tga,
)


@pytest.fixture(scope="module")
def fixtures():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(16, 12, 3), dtype=np.uint8)
    out = {}
    for fmt in ("PNG", "JPEG", "BMP", "GIF", "PPM"):
        b = io.BytesIO()
        PIL.fromarray(arr).save(b, format=fmt)
        out[fmt] = b.getvalue()
    b = io.BytesIO()
    PIL.fromarray(arr).save(b, format="JPEG", progressive=True)
    out["JPEGP"] = b.getvalue()
    out["HDR"] = encode_image(arr, "hdr")
    out["TGA"] = encode_image(arr, "tga")
    from tests.test_formats_ext import _pic_header, _psd_header

    out["PSD"] = _psd_header(3, 16, 12, 8) + struct.pack(">H", 0) + bytes(
        arr.transpose(2, 0, 1).tobytes()
    )
    out["PIC"] = _pic_header(12, 16, [(8, 0, 0xE0)]) + arr.tobytes()
    return out


def _try(data, fmt):
    if fmt == "TGA":
        decode_tga(data)
    else:
        decode_image(data)


@pytest.mark.parametrize(
    "fmt",
    ["PNG", "JPEG", "JPEGP", "BMP", "GIF", "PPM", "HDR", "TGA", "PSD", "PIC"],
)
def test_truncation_never_crashes(fixtures, fmt):
    data = fixtures[fmt]
    step = max(1, len(data) // 60)
    for cut in range(1, len(data), step):
        try:
            _try(data[:cut], fmt)
        except ValueError:
            pass  # typed (FormatError/PNGError/JPEGError all subclass it)


@pytest.mark.parametrize(
    "fmt",
    ["PNG", "JPEG", "JPEGP", "BMP", "GIF", "PPM", "HDR", "TGA", "PSD", "PIC"],
)
def test_bitflips_never_crash(fixtures, fmt):
    data = bytearray(fixtures[fmt])
    rng = np.random.default_rng(11)
    positions = list(range(min(64, len(data)))) + [
        int(p) for p in rng.integers(0, len(data), 80)
    ]
    for pos in positions:
        mut = bytearray(data)
        mut[pos] ^= 0xFF
        try:
            _try(bytes(mut), fmt)
        except ValueError:
            pass


def test_probe_truncation_never_crashes(fixtures):
    for fmt, data in fixtures.items():
        for cut in range(1, min(len(data), 200), 7):
            try:
                probe_image(data[:cut], tga=(fmt == "TGA"))
            except ValueError:
                pass


def test_decode16_robust(fixtures):
    for fmt in ("PNG", "PPM", "PSD"):
        data = fixtures[fmt]
        for cut in range(1, len(data), max(1, len(data) // 40)):
            try:
                decode_image_16(data[:cut])
            except ValueError:
                pass


def test_gif_frames_truncation(fixtures):
    data = fixtures["GIF"]
    for cut in range(1, len(data), max(1, len(data) // 50)):
        try:
            decode_gif_frames(data[:cut])
        except ValueError:
            pass


# ------------------------------------------------------ dimension guards


def test_huge_dims_rejected_before_allocation():
    # PNM claiming a petapixel image with a 20-byte body
    with pytest.raises(FormatError, match="implausible"):
        decode_pnm(b"P6\n99999999 99999999\n255\n" + bytes(20))
    # BMP with a poisoned width field
    bmp = bytearray(encode_image(np.zeros((4, 4, 3), np.uint8), "bmp"))
    bmp[18:22] = struct.pack("<i", 1 << 30)
    with pytest.raises(ValueError):
        decode_image(bytes(bmp))
    # PSD with 2^31 rows
    from tests.test_formats_ext import _psd_header

    psd = _psd_header(3, 1 << 31, 8, 8) + struct.pack(">H", 0) + bytes(8)
    with pytest.raises(FormatError, match="implausible"):
        decode_psd(psd)


def test_zero_dims_rejected():
    with pytest.raises(FormatError):
        decode_pnm(b"P6\n0 5\n255\n")


def test_pnm_header_truncations_terminate():
    """Regression: the PNM token walk must terminate on EVERY truncation
    point (an unguarded walk spins forever when a token or the whitespace
    after it reaches EOF — found twice by fuzzing, once in decode_pnm16)."""
    from lanczos_tpu.io.formats import decode_pnm16

    full = b"P5 # comment\n3 2 255\n" + bytes(6)
    for fn in (decode_pnm, decode_pnm16, probe_image):
        for cut in range(1, len(full)):
            try:
                fn(full[:cut])
            except ValueError:
                pass
    # the exact shapes that previously hung: header ends at EOF
    for bad in (b"P5 1 1 255", b"P5 1 1", b"P5 ", b"P6 3", b"P5 #x"):
        for fn in (decode_pnm, decode_pnm16):
            with pytest.raises(ValueError):
                fn(bad)


def test_unknown_magic_is_valueerror():
    with pytest.raises(ValueError):
        decode_image(b"\x00\x01\x02\x03" * 30)
    with pytest.raises(ValueError):
        probe_image(b"\x00\x01\x02\x03" * 30)


def test_gif_bad_min_code_size_rejected(rng):
    """Regression: a corrupted LZW min-code byte (e.g. 24) must raise, not
    overflow the native decoder's 4096-entry dictionary (was a segfault)."""
    from lanczos_tpu.io.formats import decode_gif

    im = PIL.fromarray(rng.integers(0, 256, (8, 8, 3), np.uint8)).quantize(8)
    b = io.BytesIO()
    im.save(b, format="GIF")
    data = bytearray(b.getvalue())
    # walk the block structure to the image descriptor (a bare 0x2C byte
    # search can hit palette data)
    pos = 13 + (3 * (2 << (data[10] & 7)) if data[10] & 0x80 else 0)
    while data[pos] == 0x21:  # extensions
        pos += 2
        while data[pos] != 0:
            pos += data[pos] + 1
        pos += 1
    assert data[pos] == 0x2C
    pal_bytes = 3 * (2 << (data[pos + 9] & 7)) if data[pos + 9] & 0x80 else 0
    mc_pos = pos + 10 + pal_bytes
    for bad in (0, 13, 24, 255):
        mut = bytearray(data)
        mut[mc_pos] = bad
        with pytest.raises(ValueError):
            decode_gif(bytes(mut))
