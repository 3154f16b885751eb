"""Upscale a .y4m video plane-natively (no color conversion).

Usage: python examples/02_video_y4m.py in.y4m out.y4m [N/D]
"""
import sys

from lanczos_tpu import upscale_y4m

n, _, d = (sys.argv[3] if len(sys.argv) > 3 else "2/1").partition("/")
scale = (int(n), int(d) if d else 1)  # accept bare "2" like the CLI
hdr = upscale_y4m(sys.argv[1], sys.argv[2], scale=scale, a=3, batch=8)
print(f"wrote {sys.argv[2]}: {hdr.width}x{hdr.height} C{hdr.colorspace}")
