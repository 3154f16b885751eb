"""Extended benchmark suite — the BASELINE.md config table.

Reports one row per benchmark config (BASELINE.json `configs`):
  1. 256×256→512×512 a=2 (reference's own test size)
  2. 1080p→4K a=3, single frame
  3. batch-8 1080p→4K fused
  4. 4K→8K a=3 (the headline; bench.py reports this one)
  5. streaming 4K→8K row-chunked (bounded-memory mode)

Usage: python bench_suite.py [--backend auto|xla|pallas] [--iters N]
Prints one JSON line per row plus a human table to stderr.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def run_case(name, fn, in_shape, out_shape, iters, extra=None):
    import jax

    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    from lanczos_tpu.utils.profiling import chip_spec

    bw, _ = chip_spec()
    batch = extra.get("batch", 1) if extra else 1
    out_mpix = batch * out_shape[0] * out_shape[1] / 1e6
    min_bytes = batch * 3 * (
        in_shape[0] * in_shape[1] + out_shape[0] * out_shape[1]
    )
    roof = out_mpix / (min_bytes / bw)
    row = {
        "metric": name,
        "value": round(out_mpix / dt, 1),
        "unit": "Mpix/s",
        "vs_baseline": round(out_mpix / dt / roof, 4),
    }
    print(json.dumps(row))
    print(f"# {name}: {dt*1e3:.2f} ms  roofline {roof:.0f} Mpix/s", file=sys.stderr)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lanczos_tpu.core.config import Profile, ResampleConfig
    from lanczos_tpu.models.upscaler import Upscaler
    from lanczos_tpu.models.streaming import StreamingUpscaler

    rng = np.random.default_rng(0)

    def img(h, w, b=None):
        shape = (b, h, w, 3) if b else (h, w, 3)
        return jnp.asarray(rng.integers(0, 256, size=shape, dtype=np.uint8))

    cases = [
        ("256x256->512x512_a2", (256, 256), (512, 512), 2, None),
        ("1080p->4K_a3", (1080, 1920), (2160, 3840), 3, None),
        ("batch32_1080p->4K_a3", (1080, 1920), (2160, 3840), 3, 32),
        ("4K->8K_a3", (2160, 3840), (4320, 7680), 3, None),
    ]
    for name, ins, outs, a, batch in cases:
        cfg = ResampleConfig.from_profile(Profile.PRECISE, ins, out_shape=outs, a=a)
        model = Upscaler(cfg, backend=args.backend)
        x = img(*ins, batch)
        run_case(
            name, lambda m=model, x=x: m(x), ins, outs, args.iters,
            {"batch": batch or 1},
        )

    # streaming (bounded memory): whole-frame wrapper, host loop included
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, (2160, 3840), out_shape=(4320, 7680), a=3
    )
    sm = StreamingUpscaler(cfg, chunk_rows=1024)
    frame = np.asarray(img(2160, 3840))
    t0 = time.perf_counter()
    out = sm(frame)
    dt0 = time.perf_counter() - t0  # includes compile
    t0 = time.perf_counter()
    for _ in range(max(1, args.iters // 3)):
        out = sm(frame)
    dt = (time.perf_counter() - t0) / max(1, args.iters // 3)
    mpix = 4320 * 7680 / 1e6
    print(json.dumps({
        "metric": "stream4K->8K_a3_chunk1024",
        "value": round(mpix / dt, 1),
        "unit": "Mpix/s",
        "vs_baseline": 0.0,
    }))
    print(f"# streaming: {dt*1e3:.2f} ms/frame (first {dt0*1e3:.0f} ms)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
