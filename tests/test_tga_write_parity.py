"""External parity anchor for the TGA writer: compile the REFERENCE's
vendored ``stb_image_write.h`` out-of-tree and assert :func:`encode_tga`
produces byte-identical files — RLE (the stb default) and uncompressed —
including stb's raw-run scan quirk that compares pixels two apart
(``stb_image_write.h:573-581``).

Skipped when g++ or the reference tree is unavailable.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from lanczos_tpu.io.formats import encode_tga

STB_WRITE = "/root/reference/LanczosUpscaler/stb_image/stb_image_write.h"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(STB_WRITE) and shutil.which("g++")),
    reason="reference tree or g++ unavailable",
)

_DRIVER = r"""
#define STB_IMAGE_WRITE_IMPLEMENTATION
#include "stb_image_write.h"
#include <stdio.h>
#include <stdlib.h>
int main(int argc, char** argv) {
    int w = atoi(argv[2]), h = atoi(argv[3]), comp = atoi(argv[4]);
    stbi_write_tga_with_rle = atoi(argv[6]);
    FILE* f = fopen(argv[1], "rb");
    if (!f) return 2;
    unsigned char* buf = (unsigned char*)malloc((size_t)w*h*comp);
    if (fread(buf, 1, (size_t)w*h*comp, f) != (size_t)w*h*comp) return 3;
    fclose(f);
    return stbi_write_tga(argv[5], w, h, comp, buf) ? 0 : 1;
}
"""


@pytest.fixture(scope="module")
def stb_tga(tmp_path_factory):
    d = tmp_path_factory.mktemp("stbw")
    shutil.copy(STB_WRITE, d / "stb_image_write.h")
    (d / "driver.c").write_text(_DRIVER)
    exe = d / "tga_write"
    subprocess.run(
        ["g++", "-O1", "-o", str(exe), str(d / "driver.c")],
        check=True, cwd=d,
    )

    def run(img, rle):
        h, w, c = img.shape
        raw = d / "in.raw"
        out = d / "out.tga"
        raw.write_bytes(np.ascontiguousarray(img).tobytes())
        subprocess.run(
            [str(exe), str(raw), str(w), str(h), str(c), str(out),
             "1" if rle else "0"],
            check=True,
        )
        return out.read_bytes()

    return run


def _cases(rng):
    yield rng.integers(0, 256, (13, 11, 3), np.uint8)        # noise: raw runs
    yield np.full((7, 300, 3), 42, np.uint8)                  # >128-px RLE runs
    img = rng.integers(0, 256, (9, 37, 4), np.uint8)          # RGBA mixed
    img[:, 10:20] = 7
    yield img
    # alternating pairs trip the two-apart raw-run compare
    stripe = np.zeros((5, 64, 3), np.uint8)
    stripe[:, 0::2] = 200
    yield stripe
    aba = np.zeros((3, 129, 1), np.uint8)                     # gray + odd width
    aba[:, ::3] = 9
    yield aba
    yield rng.integers(0, 256, (2, 1, 3), np.uint8)           # w == 1
    yield rng.integers(0, 256, (1, 2, 3), np.uint8)           # w == 2
    yield rng.integers(0, 2, (6, 257, 3), np.uint8) * 120     # random runs


@pytest.mark.parametrize("rle", [True, False])
def test_encode_tga_byte_identical_to_stb(stb_tga, rle):
    rng = np.random.default_rng(11)
    for i, img in enumerate(_cases(rng)):
        want = stb_tga(img, rle)
        got = encode_tga(img, rle=rle)
        assert got == want, (
            f"case {i} shape {img.shape} rle={rle}: "
            f"{len(got)} vs {len(want)} bytes"
        )
