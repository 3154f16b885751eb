"""Image I/O: from-scratch PNG codec (NumPy + zlib + native C++ hot loops).

The TPU-native counterpart of the reference's vendored stb codec
(``stb.cpp:1-13``, ``stb_image/``): PNG decode/encode on the host so the
test harness and CLI consume/produce the same byte formats the reference
testbench did (``full_TB.h:107,170-177``).
"""

from lanczos_tpu.io.png import (  # noqa: F401
    PNGError,
    decode,
    encode,
    read_png,
    write_png,
)
