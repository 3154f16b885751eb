"""Multi-chip video streaming (BASELINE config 5) + beyond-pod frames.

An unbounded frame stream through a (data x rows) mesh — frames
data-parallel, each frame's rows halo-exchanged — and, second, a single
frame streamed as rows-sharded chunk groups so no device (nor the pod)
ever holds it whole.

Runs on real chips when present, else on a virtual CPU mesh:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/06_sharded_video_stream.py
"""
import jax
import numpy as np

from lanczos_tpu import ResampleConfig
from lanczos_tpu.core.config import Profile
from lanczos_tpu.models.streaming import ShardedStreamingUpscaler
from lanczos_tpu.models.video import VideoUpscaler
from lanczos_tpu.parallel.sharded import choose_mesh_shape

n = len(jax.devices())
rng = np.random.default_rng(0)

# 1) frame stream over the mesh: the reference's stream-feed loop
#    (full_TB.h:127-138) promoted to (data x rows)
data_n, rows_n = choose_mesh_shape(n)
mesh = jax.make_mesh((data_n, rows_n), ("data", "rows"))
cfg = ResampleConfig.from_profile(Profile.PRECISE, (256, 384), scale=(2, 1), a=3)
vu = VideoUpscaler(cfg, mesh=mesh, batch=data_n, depth=2)

def camera(k):  # any iterable of frames works; here a synthetic feed
    for _ in range(k):
        yield rng.integers(0, 256, (256, 384, 3), np.uint8)

count = sum(1 for _ in vu.frames(camera(3 * data_n + 1)))
print(f"streamed {count} frames through the {data_n}x{rows_n} mesh")

# 2) one frame taller than any shard's memory, streamed as rows-sharded
#    chunk groups (the 2a-row cyclic window promoted twice)
rmesh = jax.make_mesh((n,), ("rows",))
tall = ResampleConfig.from_profile(Profile.PRECISE, (n * 256, 256), scale=(2, 1), a=3)
sm = ShardedStreamingUpscaler(tall, rmesh, chunk_rows=64)
frame = rng.integers(0, 256, (n * 256, 256, 3), np.uint8)
rows_out = sum(c.shape[0] for _, c in sm.chunks(lambda lo, hi: frame[lo:hi]))
print(f"tall frame: {frame.shape[0]} rows in, {rows_out} rows out, "
      f"window {sm.win} rows/shard across {n} shards")
