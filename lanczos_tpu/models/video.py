"""Video / frame-sequence upscaling pipeline.

Drives the fused single-chip kernel (or any Upscaler backend) over a frame
stream with host↔device transfer overlap: JAX's async dispatch pipelines
frame k+1's host→device copy and frame k's compute, and results are
fetched with a sliding in-flight window so the device never idles waiting
for the host (the frame-level analog of the reference's DATAFLOW stage
overlap, ``lanczos.cpp:72-82``).

For frame batches that fit HBM, prefer stacking frames into the batch dim
of :class:`lanczos_tpu.models.upscaler.Upscaler` directly (one kernel
launch); this module is for long/unbounded sequences.
"""

from __future__ import annotations

import collections
from typing import Iterable, Iterator

import jax
import numpy as np

from lanczos_tpu.core.config import ResampleConfig
from lanczos_tpu.models.upscaler import Upscaler


class VideoUpscaler:
    """Stream frames through a jitted upscale with a bounded in-flight queue.

    ``depth`` frames are kept in flight on the device: deep enough to hide
    host transfer latency, shallow enough to bound HBM use.
    """

    def __init__(
        self,
        cfg: ResampleConfig,
        backend: str = "auto",
        depth: int = 3,
        batch: int = 1,
    ):
        self.cfg = cfg
        self.model = Upscaler(cfg, backend=backend)
        self.depth = max(1, depth)
        self.batch = max(1, batch)

    def frames(self, frames: Iterable[np.ndarray]) -> Iterator[np.ndarray]:
        """Yield upscaled frames in order; input (H, W, C) uint8 each."""
        inflight: collections.deque = collections.deque()
        for frame in frames:
            if frame.shape[:2] != tuple(self.cfg.in_shape):
                raise ValueError(
                    f"frame dims {frame.shape[:2]} != config {self.cfg.in_shape}"
                )
            out = self.model(jax.device_put(frame))
            inflight.append(out)
            if len(inflight) >= self.depth:
                yield np.asarray(inflight.popleft())
        while inflight:
            yield np.asarray(inflight.popleft())

    def __call__(self, video: np.ndarray) -> np.ndarray:
        """(T, H, W, C) uint8 → (T, OH, OW, C) uint8, batched in chunks."""
        video = np.asarray(video)
        t = video.shape[0]
        oh, ow = self.cfg.out_shape
        out = np.empty((t, oh, ow, video.shape[-1]), np.uint8)
        b = self.batch
        inflight: collections.deque = collections.deque()
        for k0 in range(0, t, b):
            chunk = video[k0 : k0 + b]
            pad = b - chunk.shape[0]
            if pad:  # keep one jit shape; tail padding discarded
                chunk = np.concatenate([chunk, chunk[-1:].repeat(pad, 0)])
            inflight.append((k0, min(b, t - k0), self.model(chunk)))
            if len(inflight) >= self.depth:
                i0, n, dev = inflight.popleft()
                out[i0 : i0 + n] = np.asarray(dev)[:n]
        while inflight:
            i0, n, dev = inflight.popleft()
            out[i0 : i0 + n] = np.asarray(dev)[:n]
        return out
