"""Timing, roofline, and trace utilities.

The reference's only observability is printf + the Vivado HLS static
schedule report (SURVEY.md §5).  The TPU equivalents here:

- :func:`time_fn` — wall-clock a jitted callable with ``block_until_ready``
  (compile excluded), the analog of reading the csim run time.
- :class:`Roofline` — the analytic model the HLS latency report played:
  given a config, the minimum HBM bytes a fused resample must move and the
  resulting upper-bound throughput on the current chip.
- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard trace directory for kernel-level inspection.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable, Optional

import jax

from lanczos_tpu.core.config import ResampleConfig

# Peak HBM bandwidth (bytes/s) and bf16 FLOP/s by device-kind substring.
# The single source of chip-spec truth — bench.py/bench_suite.py resolve
# through chip_spec() so the tables cannot drift.
CHIP_SPECS = {
    "v5 lite": (819e9, 394e12),
    "v5e": (819e9, 394e12),
    "v5p": (2765e9, 459e12),
    "v6": (1640e9, 918e12),
    "v4": (1228e9, 275e12),
    "v3": (900e9, 123e12),
    "v2": (700e9, 46e12),
    "cpu": (50e9, 1e12),
}


def chip_spec(device=None):
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "cpu").lower()
    for key, spec in CHIP_SPECS.items():
        if key in kind:
            return spec
    return CHIP_SPECS["v5e"]


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 1) -> float:
    """Mean seconds per call of a device function (first call compiles).

    WARNING: on the tunneled dev chip ``block_until_ready`` does NOT wait
    for execution until the dispatch queue saturates, so short loops
    measure dispatch rate, not compute (discovered round 2 — it inflated
    every round-1 headline ~100×).  Use :func:`steady_time` for honest
    numbers.
    """
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _force(out) -> None:
    """Force one element of a (possibly nested) device output to host —
    the only reliable completion barrier on the tunneled backend.

    Indexes a single scalar (NOT ravel: relayouting a large uint8 array
    for ravel pads the minor dim to the tile size — a 42x HBM copy that
    OOMs on batch outputs)."""
    import numpy as np

    leaves = jax.tree_util.tree_leaves(out)
    leaf = leaves[0]
    shards = getattr(leaf, "addressable_shards", None)
    if shards:
        # sharded outputs: indexing a scalar out of a sharded array is a
        # ShardingTypeError in newer jax (ambiguous out sharding); one
        # local shard's scalar is the same completion barrier
        leaf = shards[0].data
    np.asarray(leaf[(0,) * getattr(leaf, "ndim", 0)])


def readback_cost(samples: int = 3) -> float:
    """Seconds per 1-element host readback on ready data (tunnel latency).
    Also a health probe: a healthy tunnel measures ~30 ms; seconds-scale
    values mean the device queue is backed up with orphaned work."""
    import numpy as np

    x = jax.numpy.zeros((1024,), jax.numpy.uint8)
    jax.block_until_ready(x)
    np.asarray(x[:1])  # first touch
    t0 = time.perf_counter()
    for _ in range(samples):
        np.asarray(x[:1])
    return (time.perf_counter() - t0) / samples


def steady_time(
    fn: Callable, *args, iters: int = 50, rb_cost: Optional[float] = None
) -> float:
    """Honest mean seconds per call: drains the async dispatch queue with a
    host readback (``block_until_ready`` alone is a no-op on the tunneled
    backend until the queue saturates — see time_fn), and measures as the
    *differential* of two drained loops of different lengths so the
    readback constant cancels exactly.  Escalates the loop length until the
    differential is well above readback jitter — a constant-subtraction
    scheme broke down once kernels got faster than the ~30 ms readback
    (elapsed − rb clamped at 0 → multi-TB/s illusions)."""
    if rb_cost is None:
        rb_cost = readback_cost()
    out = fn(*args)
    jax.block_until_ready(out)
    _force(out)  # drain everything queued so far

    def run(n: int) -> float:
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _force(out)
        return time.perf_counter() - t0

    lo, hi = max(iters // 8, 1), max(iters, 2)
    floor = max(0.25, 10 * rb_cost)  # differential SNR target (s)
    t_lo, t_hi = run(lo), run(hi)
    while (t_hi - t_lo) < floor and hi * 4 <= 20000 and t_hi <= 30.0:
        # reuse the drained t_hi as the next round's short-loop timing
        lo, t_lo = hi, t_hi
        hi *= 4
        t_hi = run(hi)
    delta = t_hi - t_lo
    if delta <= 0:
        # timer jitter swamped the differential at an escalation cap —
        # return the (rb-inclusive) drained mean rather than a floored
        # epsilon that would resurrect the multi-TB/s illusion
        import sys

        print(
            f"# WARNING steady_time: non-positive differential "
            f"({delta:.3g}s at hi={hi}); reporting drained mean",
            file=sys.stderr,
        )
        return t_hi / hi
    return delta / (hi - lo)


@dataclasses.dataclass
class Roofline:
    """Minimum-traffic roofline for a fused uint8→uint8 2D resample."""

    cfg: ResampleConfig
    hbm_bytes: int  # minimal HBM traffic per frame
    flops: int  # MXU flops the fused banded-matmul formulation performs
    bw: float  # chip HBM bandwidth
    peak_flops: float

    @classmethod
    def for_config(
        cls, cfg: ResampleConfig, device=None, batch: int = 1
    ) -> "Roofline":
        (ih, iw), (oh, ow) = cfg.in_shape, cfg.out_shape
        c = cfg.channels
        bw, pk = chip_spec(device)
        bytes_min = batch * c * (ih * iw + oh * ow)  # uint8 in + out, once
        # useful banded MACs: every output element of each separable pass
        # touches 2a taps (height-first: vertical emits oh×iw, horizontal
        # oh×ow)
        taps = 2 * cfg.a
        flops = batch * c * 2 * taps * (oh * iw + oh * ow)
        return cls(cfg, bytes_min, int(flops), bw, pk)

    @property
    def min_seconds(self) -> float:
        return max(self.hbm_bytes / self.bw, self.flops / self.peak_flops)

    def mpix_per_s(self) -> float:
        oh, ow = self.cfg.out_shape
        return oh * ow / 1e6 / self.min_seconds

    def fraction(self, measured_seconds: float) -> float:
        return self.min_seconds / measured_seconds


@contextlib.contextmanager
def trace(logdir: str = "/tmp/lanczos_tpu_trace"):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
