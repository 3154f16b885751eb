"""Threaded frame loading/saving pipeline (the data-loader runtime).

Keeps the device fed: a thread pool decodes PNGs (the native C++ unfilter
releases the GIL through ctypes, so decodes genuinely parallelize) and a
bounded prefetch queue overlaps host decode with device compute — the
host-side analog of the reference testbench's single-threaded
load→stream→write loop (``full_TB.h:107-177``) turned into a pipeline.
"""

from __future__ import annotations

import concurrent.futures as _fut
import os
import queue
import threading
from typing import Callable, Iterator, Optional, Sequence

import numpy as np

from lanczos_tpu.io.png import write_png
from lanczos_tpu.io import read_image


class FrameLoader:
    """Prefetching PNG reader over a list of paths.

    ``decode_workers`` threads decode ahead, at most ``prefetch`` frames
    buffered.  Iteration yields (path, (H, W, C) uint8) in order.
    """

    def __init__(
        self,
        paths: Sequence[str | os.PathLike],
        decode_workers: int = 4,
        prefetch: int = 8,
        transform: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    ):
        self.paths = list(paths)
        self.workers = max(1, decode_workers)
        self.prefetch = max(1, prefetch)
        self.transform = transform

    def __len__(self):
        return len(self.paths)

    def __iter__(self) -> Iterator[tuple[str, np.ndarray]]:
        def load(p):
            img = read_image(p)
            return self.transform(img) if self.transform else img

        with _fut.ThreadPoolExecutor(self.workers) as pool:
            pending: queue.Queue = queue.Queue()
            it = iter(self.paths)

            def submit_next():
                try:
                    p = next(it)
                except StopIteration:
                    return False
                pending.put((p, pool.submit(load, p)))
                return True

            for _ in range(self.prefetch):
                if not submit_next():
                    break
            while not pending.empty():
                path, fut = pending.get()
                img = fut.result()
                submit_next()
                yield str(path), img


class FrameWriter:
    """Asynchronous image writer: encode+write on background threads so
    the device loop never blocks on the host encoder.  Format follows the
    file extension (PNG plus the :func:`lanczos_tpu.io.write_image`
    formats); ``compress_level`` applies to PNG."""

    def __init__(
        self,
        encode_workers: int = 4,
        compress_level: int = 6,
        max_pending: int = 8,
    ):
        self.pool = _fut.ThreadPoolExecutor(max(1, encode_workers))
        self.level = compress_level
        self._futs: list = []
        self._lock = threading.Lock()
        # backpressure: without a bound, a slow encoder buffers whole
        # frames (an 8K RGB frame is ~100 MB) until OOM, and errors only
        # surface at close()
        self._slots = threading.Semaphore(max(1, max_pending))

    def write(self, path, img: np.ndarray) -> None:
        img = np.asarray(img)
        self._slots.acquire()

        def task():
            try:
                if str(path).lower().endswith(".png"):
                    return write_png(path, img, self.level)
                from lanczos_tpu.io import write_image

                return write_image(path, img)
            finally:
                self._slots.release()

        with self._lock:
            self._futs.append(self.pool.submit(task))

    def close(self) -> None:
        with self._lock:
            futs, self._futs = self._futs, []
        for f in futs:
            f.result()  # propagate errors
        self.pool.shutdown(wait=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
