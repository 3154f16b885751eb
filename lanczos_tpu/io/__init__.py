"""Image I/O: from-scratch codecs (NumPy + zlib + native C++ hot loops).

The TPU-native counterpart of the reference's vendored stb codec
(``stb.cpp:1-13``, ``stb_image/``): PNG decode/encode and baseline JPEG
decode on the host so the test harness and CLI consume/produce the same
byte formats the reference testbench did (``full_TB.h:107,170-177``).

:func:`read_image` sniffs the format from magic bytes (PNG or JPEG) —
the equivalent of ``stbi_load``'s format dispatch.
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


def decode_image(data: bytes) -> np.ndarray:
    """Decode PNG or JPEG bytes by magic sniffing → (H, W, C) uint8."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return decode(data)
    if data[:2] == b"\xff\xd8":
        return decode_jpeg(data)
    raise ValueError("unrecognized image format (expect PNG or JPEG)")


def read_image(path) -> np.ndarray:
    """stbi_load equivalent: load a PNG or JPEG file as (H, W, C) uint8."""
    with open(path, "rb") as f:
        return decode_image(f.read())
