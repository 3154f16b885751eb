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


def upscale_y4m(
    src,
    dst,
    scale=None,
    out_shape=None,
    profile="precise",
    a: int = 3,
    backend: str = "auto",
    batch: int = 8,
    depth: int = 3,
    **overrides,
):
    """Upscale a .y4m video file plane-natively: file → file.

    Y4M frames are already planar YCbCr — the layout the fused kernels
    prefer — so each plane batch goes straight through ``Upscaler.planar``
    with no color conversion and no interleave transposes.  Luma and
    chroma get their own configs at the same rational scale (chroma planes
    are subsampled, so their dims differ); the output keeps the input's
    chroma subsampling and frame rate.

    ``batch`` frames share one device dispatch per plane (sub-ms kernels
    are dispatch-bound otherwise); ``depth`` plane-batches stay in flight
    to overlap host I/O with device compute (the frame-level analog of the
    reference's DATAFLOW overlap, ``lanczos.cpp:72-82``).

    Returns the output :class:`lanczos_tpu.io.y4m.Y4MHeader`.
    """
    from lanczos_tpu.core.config import ResampleConfig
    from lanczos_tpu.io.y4m import Y4MError, Y4MHeader, Y4MReader, Y4MWriter

    with Y4MReader(src) as reader:
        hdr = reader.header
        shapes = [(hdr.height, hdr.width)]
        if hdr.chroma_shape is not None:
            shapes.append(hdr.chroma_shape)

        models = []
        for hw in shapes:
            cfg = ResampleConfig.from_profile(
                profile, hw, out_shape=None if out_shape is None else (
                    out_shape[0] * hw[0] // hdr.height,
                    out_shape[1] * hw[1] // hdr.width,
                ),
                scale=scale, a=a, **overrides,
            )
            models.append(Upscaler(cfg, backend=backend))
        oh, ow = models[0].cfg.out_shape
        if hdr.chroma_shape is not None:
            coh, cow = models[1].cfg.out_shape
            div = (hdr.height // hdr.chroma_shape[0],
                   hdr.width // hdr.chroma_shape[1])
            if (coh * div[0], cow * div[1]) != (oh, ow):
                raise Y4MError(
                    f"output {ow}x{oh} cannot keep C{hdr.colorspace} "
                    f"subsampling (chroma maps to {cow}x{coh})"
                )

        out_hdr = Y4MHeader(
            ow, oh, fps=hdr.fps, interlace=hdr.interlace,
            aspect=hdr.aspect, colorspace=hdr.colorspace,
            extensions=hdr.extensions,
        )

        def plane_batches():
            """Yield (n_valid, [plane-stack ...]) per batch of frames."""
            buf = []
            for frame in reader:
                buf.append(frame)
                if len(buf) == batch:
                    yield len(buf), buf
                    buf = []
            if buf:
                yield len(buf), buf

        plane_model = [0] if len(models) == 1 else [0, 1, 1]  # Cb/Cr share

        def launch(frames):
            n = len(frames)
            outs = []
            for p, m in enumerate(plane_model):
                stack = np.stack([f[p] for f in frames])[:, None]  # (B,1,h,w)
                if n < batch:  # keep one jit shape; tail padding discarded
                    pad = np.repeat(stack[-1:], batch - n, 0)
                    stack = np.concatenate([stack, pad])
                outs.append(models[m].planar(jax.device_put(stack)))
            return n, outs

        with Y4MWriter(dst, out_hdr) as writer:
            inflight: collections.deque = collections.deque()

            def drain_one():
                n, outs = inflight.popleft()
                host = [np.asarray(o) for o in outs]
                for k in range(n):
                    writer.write(tuple(h[k, 0] for h in host))

            for _, frames in plane_batches():
                inflight.append(launch(frames))
                if len(inflight) >= depth:
                    drain_one()
            while inflight:
                drain_one()
    return out_hdr
