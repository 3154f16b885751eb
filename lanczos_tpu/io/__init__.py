"""Image I/O: from-scratch codecs (NumPy + zlib + native C++ hot loops).

The TPU-native counterpart of the reference's vendored stb codec
(``stb.cpp:1-13``, ``stb_image/``): PNG decode/encode and baseline JPEG
decode on the host so the test harness and CLI consume/produce the same
byte formats the reference testbench did (``full_TB.h:107,170-177``).

:func:`read_image` sniffs the format from magic bytes (PNG/JPEG/BMP/GIF/
PSD/HDR/PIC/PNM, TGA by extension) — the FULL ``stbi_load`` format set.
:func:`write_image` is the ``stbi_write_*`` counterpart (PNG/JPEG/BMP/
TGA/HDR/PNM by extension, covering stb_image_write.h's raster formats).  Video frames come in through the Y4M container
(:mod:`lanczos_tpu.io.y4m`) — planar YCbCr, the exact layout the fused
kernels consume.
"""

import numpy as np

from lanczos_tpu.io.png import (  # noqa: F401
    PNGError,
    decode,
    encode,
    read_png,
    write_png,
)
from lanczos_tpu.io.jpeg import JPEGError, decode as decode_jpeg  # noqa: F401
from lanczos_tpu.io.y4m import (  # noqa: F401
    Y4MError,
    Y4MHeader,
    Y4MReader,
    Y4MWriter,
    read_y4m,
    write_y4m,
)


def decode_image(data: bytes) -> np.ndarray:
    """Decode image bytes by magic sniffing → (H, W, C) uint8.

    Formats: PNG (incl. Adam7), baseline JPEG, BMP, GIF, PSD, PIC,
    Radiance HDR (tone-mapped to uint8 with stb's gamma-2.2 defaults —
    use :func:`lanczos_tpu.io.formats.decode_hdr` for linear float32),
    and binary PNM.  (TGA has no magic — use :func:`read_image`, which
    falls back to it by file extension, or call ``formats.decode_tga``
    directly.)
    """
    from lanczos_tpu.io import formats

    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return decode(data)
    if data[:2] == b"\xff\xd8":
        return decode_jpeg(data)
    if data[:2] == b"BM":
        return formats.decode_bmp(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return formats.decode_gif(data)
    if data[:4] == b"8BPS":
        return formats.decode_psd(data)
    if data[:2] == b"#?":
        return formats.hdr_to_ldr(formats.decode_hdr(data))
    if data[:4] == b"\x53\x80\xf6\x34" and data[88:92] == b"PICT":
        return formats.decode_pic(data)
    if data[:2] in (b"P5", b"P6"):
        return formats.decode_pnm(data)
    raise ValueError(
        "unrecognized image format (expect PNG/JPEG/BMP/GIF/PSD/HDR/PIC/"
        "PNM; TGA is dispatched by extension in read_image)"
    )


def read_image(path) -> np.ndarray:
    """stbi_load equivalent: load an image file as (H, W, C) uint8."""
    with open(path, "rb") as f:
        data = f.read()
    if str(path).lower().endswith((".tga", ".icb", ".vda", ".vst")):
        from lanczos_tpu.io import formats

        return formats.decode_tga(data)
    return decode_image(data)


def encode_image(img: np.ndarray, format: str, **kw) -> bytes:
    """Encode to image bytes by format name (stbi_write_* analog).

    Formats: ``png`` (kw: ``compress_level``), ``jpeg``/``jpg`` (kw:
    ``quality``, ``subsample``), ``bmp``, ``tga``, ``hdr`` (takes float32
    linear radiance, or uint8 lifted via stb's gamma-2.2 convention),
    ``pnm``/``ppm``/``pgm`` — stb_image_write.h's full format set.
    """
    from lanczos_tpu.io import formats, jpeg

    fmt = format.lower().lstrip(".")
    if fmt == "png":
        return encode(img, **kw)
    if fmt in ("jpg", "jpeg"):
        return jpeg.encode(img, **kw)
    if fmt == "bmp":
        return formats.encode_bmp(img)
    if fmt in ("tga", "icb", "vda", "vst"):
        return formats.encode_tga(img)
    if fmt == "hdr":
        return formats.encode_hdr(img)
    if fmt in ("pnm", "ppm", "pgm"):
        return formats.encode_pnm(img)
    raise ValueError(f"unsupported image write format {format!r}")


def write_image(path, img: np.ndarray, **kw) -> None:
    """stbi_write_* equivalent: save (H, W[, C]) uint8, format from the
    file extension (png/jpg/jpeg/bmp/tga/hdr/pnm/ppm/pgm)."""
    ext = str(path).rsplit(".", 1)[-1] if "." in str(path) else ""
    data = encode_image(img, ext, **kw)
    with open(path, "wb") as f:
        f.write(data)
