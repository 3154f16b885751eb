"""External parity anchor: compile the REFERENCE's fp64 oracle and run it.

Every other bit-exactness claim in this repo compares builder code against
builder code (``ref/oracle.py`` vs ``ops/resample_xla.py`` etc.).  This
module closes the loop by compiling the *actual reference source* —
``lanczos_expected`` from ``/root/reference/LanczosUpscaler/full_TB.h:29-96``
— out-of-tree with g++, and asserting that :func:`c_oracle_upscale`
matches its output byte-for-byte.

Mechanics: the reference testbench header is copied into a temp dir at test
time (NOT into the repo) together with original stub headers (``lanczos.h``
replacement providing a minimal ``ap_uint`` + the typedefs sim_tb needs,
``hls_stream.h`` and stb no-op stubs) and a tiny driver that reads a planar
raw image, calls ``lanczos_expected``, and writes the planar result.  The
binary is compiled with ``-ffp-contract=off`` to pin IEEE double semantics
(matching ``ref/_native/oracle.cpp``'s build flags).

Skipped when g++ or the reference tree is unavailable.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from lanczos_tpu.ref.oracle import c_oracle_upscale

REF_TB = "/root/reference/LanczosUpscaler/full_TB.h"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(REF_TB) and shutil.which("g++")),
    reason="reference tree or g++ unavailable",
)

# -- stub headers (original code; they exist only to satisfy full_TB.h's
#    includes so lanczos_expected compiles un-modified) ----------------------

_STUB_LANCZOS_H = r"""
#ifndef lanczos_h
#define lanczos_h
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include "params.h"
#include "hls_stream.h"
#define MIN(a,b) ((a)<(b)?(a):(b))
#define MAX(a,b) ((a)>(b)?(a):(b))
#define SCALE ((double)SCALE_N/SCALE_D)

// Minimal ap_uint: unsigned value masked to W bits; conversion from double
// truncates toward zero (Vivado AP_TRN), conversion out is exact.  Only the
// behaviors lanczos_expected exercises are implemented.
template <int W>
struct ap_uint {
    unsigned long long v;
    static unsigned long long mask() {
        return W >= 64 ? ~0ULL : ((1ULL << W) - 1ULL);
    }
    ap_uint() : v(0) {}
    ap_uint(double x) : v(((unsigned long long)x) & mask()) {}
    ap_uint(int x) : v(((unsigned long long)(long long)x) & mask()) {}
    ap_uint(unsigned long long x) : v(x & mask()) {}
    operator double() const { return (double)v; }
};

typedef ap_uint<8> byte_el_t;
typedef ap_uint<8 * NUM_CHANNELS> byte_t;
typedef ap_uint<32> num_el_t;
typedef ap_uint<64> num_t;

typedef struct {
    byte_el_t channel[NUM_CHANNELS];
} rgb_pixel_t;

inline byte_t pack_blob(byte_el_t in[NUM_CHANNELS]) { (void)in; return byte_t(); }
inline void unpack_blob(byte_t blob, byte_el_t out[NUM_CHANNELS]) {
    (void)blob; (void)out;
}

typedef hls::stream<byte_t>& stream_t;
inline void lanczos(stream_t a, stream_t b) { (void)a; (void)b; }
#endif
"""

_STUB_HLS_STREAM_H = r"""
#ifndef HLS_STREAM_STUB_H
#define HLS_STREAM_STUB_H
namespace hls {
template <class T>
class stream {
public:
    void write(const T&) {}
    void read(T&) {}
};
}  // namespace hls
#endif
"""

_STUB_STB_IMAGE_H = r"""
#ifndef STB_IMAGE_STUB_H
#define STB_IMAGE_STUB_H
#include <stdlib.h>
inline unsigned char* stbi_load(const char*, int*, int*, int*, int) {
    return NULL;
}
#endif
"""

_STUB_STB_WRITE_H = r"""
#ifndef STB_IMAGE_WRITE_STUB_H
#define STB_IMAGE_WRITE_STUB_H
inline int stbi_write_png(const char*, int, int, int, const void*, int) {
    return 0;
}
#endif
"""

_DRIVER_CPP = r"""
#include "full_TB.h"

// Reads planar uint8 (NUM_CHANNELS x IN_HEIGHT x IN_WIDTH) from argv[1],
// runs the reference oracle, writes planar output to argv[2].
int main(int argc, char** argv) {
    if (argc != 3) return 2;
    FILE* fi = fopen(argv[1], "rb");
    if (!fi) return 3;
    for (int c = 0; c < NUM_CHANNELS; c++)
        for (int i = 0; i < IN_HEIGHT; i++)
            for (int j = 0; j < IN_WIDTH; j++) {
                int ch = fgetc(fi);
                if (ch == EOF) { fclose(fi); return 4; }
                img_in[c][i][j] = ch;
            }
    fclose(fi);
    lanczos_expected(img_in, img_out_ex);
    FILE* fo = fopen(argv[2], "wb");
    if (!fo) return 5;
    for (int c = 0; c < NUM_CHANNELS; c++)
        for (int i = 0; i < OUT_HEIGHT; i++)
            for (int j = 0; j < OUT_WIDTH; j++)
                fputc((int)(double)img_out_ex[c][i][j], fo);
    fclose(fo);
    return 0;
}
"""


def _build(tmpdir, in_h, in_w, n, d, a):
    """Compile lanczos_expected for one config; returns binary path."""
    out_h, out_w = in_h * n // d, in_w * n // d
    os.makedirs(os.path.join(tmpdir, "stb_image"), exist_ok=True)
    shutil.copy(REF_TB, os.path.join(tmpdir, "full_TB.h"))
    writes = {
        "lanczos.h": _STUB_LANCZOS_H,
        "hls_stream.h": _STUB_HLS_STREAM_H,
        os.path.join("stb_image", "stb_image.h"): _STUB_STB_IMAGE_H,
        os.path.join("stb_image", "stb_image_write.h"): _STUB_STB_WRITE_H,
        "driver.cpp": _DRIVER_CPP,
        "params.h": "\n".join(
            [
                f"#define IN_WIDTH {in_w}",
                f"#define IN_HEIGHT {in_h}",
                f"#define OUT_WIDTH {out_w}",
                f"#define OUT_HEIGHT {out_h}",
                f"#define SCALE_N {n}",
                f"#define SCALE_D {d}",
                f"#define LANCZOS_A {a}",
                "#define NUM_CHANNELS 3",
                "#define BIT_PRECISION 8",
                "#define ROW_WORKERS 4",
                '#define IN_DIR ""',
                '#define IN_IMG "in.png"',
                '#define OUT_DIR ""',
                '#define OUT_IMG_EX "expected.png"',
                '#define OUT_IMG_OB "observed.png"',
                "",
            ]
        ),
    }
    for name, content in writes.items():
        with open(os.path.join(tmpdir, name), "w") as f:
            f.write(content)
    exe = os.path.join(tmpdir, "oracle_ref")
    subprocess.run(
        ["g++", "-O2", "-ffp-contract=off", "-I", tmpdir,
         os.path.join(tmpdir, "driver.cpp"), "-o", exe],
        check=True, capture_output=True, timeout=120,
    )
    return exe, out_h, out_w


def _run_reference(exe, img, out_h, out_w, workdir):
    """img (H, W, C) uint8 -> reference oracle output (out_h, out_w, C)."""
    fin = os.path.join(workdir, "in.raw")
    fout = os.path.join(workdir, "out.raw")
    # planar C x H x W as the driver expects
    np.ascontiguousarray(img.transpose(2, 0, 1)).tofile(fin)
    subprocess.run([exe, fin, fout], check=True, timeout=120)
    raw = np.fromfile(fout, dtype=np.uint8)
    return raw.reshape(3, out_h, out_w).transpose(1, 2, 0)


CONFIGS = [
    # (in_h, in_w, n, d, a)
    (40, 48, 2, 1, 2),
    (40, 48, 2, 1, 3),
    (36, 44, 3, 2, 2),
    (30, 42, 3, 1, 3),
    (44, 40, 5, 4, 2),
]


@pytest.mark.parametrize("in_h,in_w,n,d,a", CONFIGS)
def test_c_oracle_matches_compiled_reference(tmp_path, rng, in_h, in_w, n, d, a):
    exe, out_h, out_w = _build(str(tmp_path), in_h, in_w, n, d, a)
    for seed in range(3):
        img = np.random.default_rng(seed).integers(
            0, 256, size=(in_h, in_w, 3), dtype=np.uint8
        )
        want = _run_reference(exe, img, out_h, out_w, str(tmp_path))
        got = c_oracle_upscale(img, out_h, out_w, a)
        np.testing.assert_array_equal(got, want)


def test_golden_confirmed_by_compiled_reference(tmp_path):
    """The checked-in c_oracle golden PNG is what the compiled reference
    itself produces on the golden input."""
    from lanczos_tpu.io import read_png

    data = os.path.join(os.path.dirname(__file__), "data")
    img = read_png(os.path.join(data, "input_48x40.png"))
    golden = read_png(os.path.join(data, "golden_c_oracle_2x_a2.png"))
    exe, out_h, out_w = _build(str(tmp_path), 48, 40, 2, 1, 2)
    want = _run_reference(exe, img, out_h, out_w, str(tmp_path))
    np.testing.assert_array_equal(golden, want)
