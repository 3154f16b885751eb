"""Image encoders (the stb_image_write surface) vs PIL and our decoders.

The reference vendors stb_image_write.h (PNG/BMP/TGA/JPG/HDR;
``full_TB.h:172,177`` uses the PNG writer).  These tests pin the write
half: exact round-trips for the lossless containers (through both our
own decoders and PIL), PSNR + cross-decoder agreement for baseline JPEG.
"""

import io

import numpy as np
import pytest

PIL = pytest.importorskip("PIL.Image")

from lanczos_tpu.io import encode_image, read_image, write_image
from lanczos_tpu.io.formats import (
    FormatError,
    decode_bmp,
    decode_pnm,
    decode_tga,
    encode_bmp,
    encode_pnm,
    encode_tga,
)
from lanczos_tpu.io.jpeg import JPEGError, decode as decode_jpeg
from lanczos_tpu.io.jpeg import encode as encode_jpeg
from lanczos_tpu.utils.metrics import psnr


def _rgb(rng, h=23, w=17, c=3):
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


def _smooth(h, w, c=3):
    """Band-limited content (JPEG-friendly)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    chans = [
        128 + 100 * np.sin(yy / 19 + xx / 23),
        128 + 90 * np.cos(yy / 17),
        128 + 80 * np.sin(xx / 29),
    ]
    return np.clip(np.stack(chans[:c], -1), 0, 255).astype(np.uint8)


def _pil_decode(data, mode):
    return np.asarray(PIL.open(io.BytesIO(data)).convert(mode))


# ------------------------------------------------------------ lossless


@pytest.mark.parametrize("shape", [(23, 17, 3), (8, 8, 1), (5, 31, 3)])
def test_bmp_roundtrip_exact(shape):
    img = _rgb(np.random.default_rng(0), *shape)
    data = encode_bmp(img)
    want = np.repeat(img, 3, 2) if shape[2] == 1 else img
    np.testing.assert_array_equal(decode_bmp(data), want)
    np.testing.assert_array_equal(_pil_decode(data, "RGB"), want)


def test_bmp_rgba_alpha_survives():
    img = _rgb(np.random.default_rng(1), 9, 7, 4)
    data = encode_bmp(img)
    np.testing.assert_array_equal(decode_bmp(data), img)
    np.testing.assert_array_equal(_pil_decode(data, "RGBA"), img)


@pytest.mark.parametrize("c", [1, 3, 4])
def test_tga_roundtrip_exact(c):
    img = _rgb(np.random.default_rng(2), 13, 11, c)
    data = encode_tga(img)
    np.testing.assert_array_equal(decode_tga(data), img)
    mode = {1: "L", 3: "RGB", 4: "RGBA"}[c]
    got = _pil_decode(data, mode)
    np.testing.assert_array_equal(got if c > 1 else got[:, :, None], img)


@pytest.mark.parametrize("c", [1, 3])
def test_pnm_roundtrip_exact(c):
    img = _rgb(np.random.default_rng(3), 10, 6, c)
    data = encode_pnm(img)
    np.testing.assert_array_equal(decode_pnm(data), img)
    got = _pil_decode(data, "L" if c == 1 else "RGB")
    np.testing.assert_array_equal(got if c > 1 else got[:, :, None], img)


def test_pnm_rejects_alpha():
    with pytest.raises(FormatError):
        encode_pnm(np.zeros((4, 4, 4), np.uint8))


def test_encoders_reject_non_uint8():
    with pytest.raises(FormatError):
        encode_bmp(np.zeros((4, 4, 3), np.float32))
    with pytest.raises(JPEGError):
        encode_jpeg(np.zeros((4, 4, 3), np.int32))


# ---------------------------------------------------------------- JPEG


@pytest.mark.parametrize(
    "shape,quality,subsample",
    [
        ((64, 48), 90, None),   # 4:4:4 at q>=90, block-aligned dims
        ((61, 45), 75, None),   # 4:2:0, ragged dims
        ((61, 45), 75, False),  # forced 4:4:4
        ((16, 24), 50, True),   # forced 4:2:0, low quality
    ],
)
def test_jpeg_encode_pil_decodes(shape, quality, subsample):
    img = _smooth(*shape)
    data = encode_jpeg(img, quality=quality, subsample=subsample)
    pil = _pil_decode(data, "RGB")
    ours = decode_jpeg(data)
    assert psnr(img, pil) > 33
    # both decoders read the same stream near-identically (fancy
    # upsampling differs from PIL only at chroma edges)
    assert psnr(pil, ours) > 40


def test_jpeg_encode_grayscale():
    img = _smooth(40, 33, 1)[:, :, 0]
    data = encode_jpeg(img, quality=85)
    assert psnr(img[:, :, None], decode_jpeg(data)) > 40
    assert psnr(img, _pil_decode(data, "L")) > 40


def test_jpeg_quality_ladder_monotonic():
    img = _smooth(61, 45)
    sizes, errs = [], []
    for q in (50, 75, 95):
        data = encode_jpeg(img, quality=q)
        sizes.append(len(data))
        errs.append(psnr(img, _pil_decode(data, "RGB")))
    assert sizes == sorted(sizes)
    assert errs == sorted(errs)


def test_jpeg_drops_alpha():
    img = _smooth(24, 24, 3)
    rgba = np.concatenate([img, np.full((24, 24, 1), 7, np.uint8)], -1)
    a = encode_jpeg(rgba, quality=90)
    b = encode_jpeg(img, quality=90)
    assert a == b


def test_jpeg_many_zero_runs():
    """A nearly-flat image exercises ZRL/EOB paths."""
    img = np.full((48, 48, 3), 100, np.uint8)
    img[13, 29] = (250, 0, 250)  # one impulse -> long zero runs
    data = encode_jpeg(img, quality=95)
    assert psnr(img, _pil_decode(data, "RGB")) > 35


# ------------------------------------------------------------ dispatch


def test_write_image_roundtrip(tmp_path):
    img = _rgb(np.random.default_rng(4), 7, 5)
    for ext in ("png", "bmp", "tga", "ppm", "pnm"):
        p = tmp_path / f"x.{ext}"
        write_image(p, img)
        np.testing.assert_array_equal(read_image(p), img)
    p = tmp_path / "x.jpg"
    write_image(p, _smooth(7, 5), quality=95)
    assert read_image(p).shape == (7, 5, 3)
    with pytest.raises(ValueError):
        write_image(tmp_path / "x.xyz", img)


def test_encode_image_format_names():
    img = _rgb(np.random.default_rng(5), 6, 6)
    assert encode_image(img, "PNG")[:8] == b"\x89PNG\r\n\x1a\n"
    assert encode_image(img, ".jpeg")[:2] == b"\xff\xd8"
    assert encode_image(img, "bmp")[:2] == b"BM"


def test_frame_writer_dispatches_by_extension(tmp_path):
    from lanczos_tpu.io.loader import FrameWriter

    img = _rgb(np.random.default_rng(6), 9, 9)
    with FrameWriter(encode_workers=2) as fw:
        fw.write(tmp_path / "a.png", img)
        fw.write(tmp_path / "b.bmp", img)
    np.testing.assert_array_equal(read_image(tmp_path / "a.png"), img)
    np.testing.assert_array_equal(read_image(tmp_path / "b.bmp"), img)
