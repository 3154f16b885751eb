"""Bounded-memory streaming: upscale a frame taller than you'd want
resident, chunk by chunk, with resume.

Usage: python examples/04_streaming_tall_frame.py
"""
import numpy as np

from lanczos_tpu import ResampleConfig, StreamingUpscaler
from lanczos_tpu.core.config import Profile

cfg = ResampleConfig.from_profile(Profile.PRECISE, (4096, 960), scale=(2, 1), a=3)
sm = StreamingUpscaler(cfg, chunk_rows=512)

frame = np.random.default_rng(0).integers(0, 256, (4096, 960, 3), np.uint8)
rows = []
for y0, chunk in sm.chunks(lambda lo, hi: frame[lo:hi]):
    rows.append((y0, np.asarray(chunk)))       # device -> host per chunk
out = np.concatenate([c for _, c in rows])
print(f"streamed {len(rows)} chunks -> {out.shape}")
