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


def _pad_to(stack: np.ndarray, b: int) -> np.ndarray:
    """Tail-pad a (B', ...) batch to B rows by repeating the last frame.

    Keeps every launch at one jit shape (no retrace for the tail batch);
    callers discard the padded rows on drain."""
    pad = b - stack.shape[0]
    if pad:
        stack = np.concatenate([stack, np.repeat(stack[-1:], pad, 0)])
    return stack


def _read_ahead(gen, depth: int = 2):
    """Iterate ``gen`` on a background thread, keeping up to ``depth``
    items queued, so the producer's file parse/copy work hides under the
    consumer's device time (the host-I/O analog of
    ``StreamingUpscaler``'s threaded ``get_rows`` prefetch).  Items
    arrive in order; producer exceptions re-raise at the consumer; an
    abandoned consumer stops the producer at the next item and joins."""
    import queue
    import threading

    q: queue.Queue = queue.Queue(maxsize=max(1, depth))
    done = object()
    stop = threading.Event()
    err: list = []

    def run():
        try:
            for item in gen:
                if stop.is_set():
                    return
                q.put(item)
        except BaseException as e:  # re-raised on the consumer side
            err.append(e)
        finally:
            # the sentinel MUST arrive (a full queue would otherwise
            # leave the consumer blocked on get); bounded retries so an
            # abandoned consumer (stop set, queue full) still lets us exit
            while not stop.is_set():
                try:
                    q.put(done, timeout=0.1)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=run, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is done:
                break
            yield item
        if err:
            raise err[0]
    finally:
        stop.set()
        while t.is_alive():  # unblock a full-queue put, then join
            try:
                q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=0.05)


def _pipelined(batches, launch, drain, depth: int) -> None:
    """Run launch() over batches keeping ``depth`` results in flight.

    JAX's async dispatch overlaps batch k+1's host→device copy and launch
    with batch k's compute; drain() (which blocks on device→host readback)
    only runs once the window is full — the frame-level analog of the
    reference's DATAFLOW stage overlap (``lanczos.cpp:72-82``)."""
    inflight: collections.deque = collections.deque()
    for b in batches:
        inflight.append(launch(b))
        if len(inflight) >= depth:
            drain(inflight.popleft())
    while inflight:
        drain(inflight.popleft())


class VideoUpscaler:
    """Stream frames through a jitted upscale with a bounded in-flight queue.

    ``depth`` batches are kept in flight on the device: deep enough to hide
    host transfer latency, shallow enough to bound HBM use.

    With ``mesh`` given, the per-batch model is a
    :class:`~lanczos_tpu.parallel.sharded.ShardedUpscaler` over a
    (data × rows) mesh — frames data-parallel across the ``data`` axis,
    each frame's rows partitioned with ppermute halo exchange — so an
    unbounded frame stream runs through a bounded multi-chip window: the
    reference's stream-feed loop (``full_TB.h:127-138``) promoted to the
    mesh (SURVEY.md §5, BASELINE config 5).  ``batch`` is rounded up to a
    multiple of the data-axis size (every launch keeps one jit shape).
    """

    def __init__(
        self,
        cfg: ResampleConfig,
        backend: str = "auto",
        depth: int = 3,
        batch: int = 1,
        mesh=None,
        data_axis: str = "data",
        rows_axis: str = "rows",
    ):
        self.cfg = cfg
        self.mesh = mesh
        if mesh is not None:
            from lanczos_tpu.parallel.sharded import ShardedUpscaler

            self.model = ShardedUpscaler(
                cfg, mesh, data_axis=data_axis, rows_axis=rows_axis,
                backend=backend,
            )
            d_n = mesh.shape[data_axis]
            self.batch = -(-max(1, batch) // d_n) * d_n
        else:
            self.model = Upscaler(cfg, backend=backend)
            self.batch = max(1, batch)
        self.depth = max(1, depth)

    def frames(self, frames: Iterable[np.ndarray]) -> Iterator[np.ndarray]:
        """Yield upscaled frames in order; input (H, W, C) uint8 each.

        Frames are launched in ``batch``-size stacks (the tail stack is
        pad-repeated to keep one jit shape) with ``depth`` stacks in
        flight — on a mesh this is the full multi-chip streaming
        composition: host feed → data-parallel batch scatter → row-sharded
        halo-exchanged compute → in-order drain."""
        inflight: collections.deque = collections.deque()

        def batches():
            buf = []
            for frame in frames:
                if frame.shape[:2] != tuple(self.cfg.in_shape):
                    raise ValueError(
                        f"frame dims {frame.shape[:2]} != config "
                        f"{self.cfg.in_shape}"
                    )
                # copy when batching: the producer may legally reuse its
                # frame buffer (camera/ffmpeg pattern) between our pulls,
                # and we hold references until the stack flushes
                buf.append(
                    np.array(frame, copy=True)
                    if self.batch > 1 else np.asarray(frame)
                )
                if len(buf) == self.batch:
                    yield buf
                    buf = []
            if buf:
                yield buf

        def drain(item):
            n, dev = item
            host = np.asarray(dev)
            for i in range(n):
                yield host[i]

        for b in batches():
            stack = _pad_to(np.stack(b), self.batch)
            # ShardedUpscaler device_puts with its mesh sharding itself
            x = stack if self.mesh is not None else jax.device_put(stack)
            inflight.append((len(b), self.model(x)))
            if len(inflight) >= self.depth:
                yield from drain(inflight.popleft())
        while inflight:
            yield from drain(inflight.popleft())

    def __call__(self, video: np.ndarray) -> np.ndarray:
        """(T, H, W, C) uint8 → (T, OH, OW, C) uint8, batched in chunks."""
        video = np.asarray(video)
        t = video.shape[0]
        oh, ow = self.cfg.out_shape
        out = np.empty((t, oh, ow, video.shape[-1]), np.uint8)
        b = self.batch

        def launch(k0):
            chunk = _pad_to(video[k0 : k0 + b], b)
            return k0, min(b, t - k0), self.model(chunk)

        def drain(item):
            i0, n, dev = item
            out[i0 : i0 + n] = np.asarray(dev)[:n]

        _pipelined(range(0, t, b), launch, drain, self.depth)
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
    mesh=None,
    data_axis: str = "data",
    rows_axis: str = "rows",
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

    With ``mesh`` given, each plane batch runs through a
    :class:`~lanczos_tpu.parallel.sharded.ShardedUpscaler` over the
    (data × rows) mesh — the full multi-chip video streaming composition
    (BASELINE config 5: unbounded frame count × rows-partitioned frames):
    ``batch`` is rounded up to a multiple of the data-axis size, and every
    plane's in/out heights must divide the rows-axis size (chroma planes
    included).  Bit-identical to the single-chip run of the same profile.

    Returns the output :class:`lanczos_tpu.io.y4m.Y4MHeader`.
    """
    from lanczos_tpu.core.config import ResampleConfig
    from lanczos_tpu.io.y4m import Y4MError, Y4MHeader, Y4MReader, Y4MWriter

    with Y4MReader(src) as reader:
        hdr = reader.header
        shapes = [(hdr.height, hdr.width)]
        if hdr.chroma_shape is not None:
            shapes.append(hdr.chroma_shape)

        if mesh is not None:
            from lanczos_tpu.parallel.sharded import ShardedUpscaler

            d_n = mesh.shape[data_axis]
            batch = -(-max(1, batch) // d_n) * d_n

        models = []
        for hw in shapes:
            cfg = ResampleConfig.from_profile(
                profile, hw, out_shape=None if out_shape is None else (
                    out_shape[0] * hw[0] // hdr.height,
                    out_shape[1] * hw[1] // hdr.width,
                ),
                scale=scale, a=a, **overrides,
            )
            if mesh is not None:
                models.append(ShardedUpscaler(
                    cfg, mesh, data_axis=data_axis, rows_axis=rows_axis,
                    backend=backend,
                ))
            else:
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
            """Yield lists of ``batch`` frames (plane tuples)."""
            buf = []
            for frame in reader:
                buf.append(frame)
                if len(buf) == batch:
                    yield buf
                    buf = []
            if buf:
                yield buf

        def launch(frames):
            n = len(frames)
            # luma (B,1,h,w); Cb+Cr share one (B,2,ch,cw) dispatch — the
            # planes have the same model/shape, and sub-ms kernels are
            # dispatch-bound, so merging saves one launch per batch
            luma = _pad_to(np.stack([f[0] for f in frames])[:, None], batch)
            chroma = (
                _pad_to(np.stack([f[1:] for f in frames]), batch)
                if len(models) > 1 else None
            )
            if mesh is not None:
                # sharded path consumes NHWC (B, h, w, P); it device_puts
                # with its own (data × rows) sharding
                outs = [models[0](np.moveaxis(luma, 1, -1))]
                if chroma is not None:
                    outs.append(models[1](np.moveaxis(chroma, 1, -1)))
            else:
                outs = [models[0].planar(jax.device_put(luma))]
                if chroma is not None:
                    outs.append(models[1].planar(jax.device_put(chroma)))
            return n, outs

        with Y4MWriter(dst, out_hdr) as writer:

            def drain(item):
                n, outs = item
                host = [np.asarray(o) for o in outs]
                if mesh is not None:  # NHWC back to the writer's planar
                    host = [np.moveaxis(h, -1, 1) for h in host]
                if hdr.bit_depth > 8:
                    # deep streams: the uint16 dtype contract clips at
                    # 65535, but the stream's legal range is 2^depth−1 —
                    # clamp the Lanczos overshoot to it (the 8-bit path's
                    # clamp_to_byte at stream width); trunc only floats
                    # (device output is already uint16)
                    lim = (1 << hdr.bit_depth) - 1
                    host = [
                        np.clip(
                            h if h.dtype == np.uint16 else np.trunc(h),
                            0, lim,
                        ).astype(np.uint16)
                        for h in host
                    ]
                else:
                    # the ref backend returns unquantized floats; match the
                    # device paths' trunc-clip byte cast before writing
                    host = [
                        h if h.dtype == np.uint8
                        else np.trunc(np.clip(h, 0, 255)).astype(np.uint8)
                        for h in host
                    ]
                for k in range(n):
                    planes = (host[0][k, 0],)
                    if len(host) > 1:
                        planes += (host[1][k, 0], host[1][k, 1])
                    writer.write(planes)

            # frame parse/copy on a read-ahead thread: container I/O
            # hides under device compute (bounded queue, in order).
            # closing() joins the producer DETERMINISTICALLY on any
            # launch/drain exception — before the with-blocks close the
            # reader the thread is still parsing from
            from contextlib import closing

            with closing(_read_ahead(plane_batches())) as batches:
                _pipelined(batches, launch, drain, depth)
    return out_hdr
