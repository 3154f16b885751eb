"""Upscale one image 2x with the default (precise) profile.

Usage: python examples/01_image_upscale.py in.png out.png
"""
import sys

import numpy as np

from lanczos_tpu import upscale
from lanczos_tpu.io import read_image, write_png

src, dst = sys.argv[1], sys.argv[2]
img = read_image(src)                      # (H, W, C) uint8 — PNG/JPEG/BMP/...
out = np.asarray(upscale(img, scale=(2, 1), a=3))
write_png(dst, out)
print(f"{img.shape} -> {out.shape} written to {dst}")
