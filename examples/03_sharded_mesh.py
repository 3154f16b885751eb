"""Row-partitioned multi-device upscale on a (data x rows) mesh.

Runs on real chips when present, else on a virtual CPU mesh:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/03_sharded_mesh.py
"""
import jax
import numpy as np

from lanczos_tpu import ResampleConfig, ShardedUpscaler
from lanczos_tpu.core.config import Profile
from lanczos_tpu.parallel.sharded import choose_mesh_shape

n = len(jax.devices())
data_n, rows_n = choose_mesh_shape(n)
mesh = jax.make_mesh((data_n, rows_n), ("data", "rows"))

cfg = ResampleConfig.from_profile(Profile.PRECISE, (512, 768), scale=(2, 1), a=3)
model = ShardedUpscaler(cfg, mesh)  # ring ppermute halo exchange inside

batch = 2 * data_n
img = np.random.default_rng(0).integers(0, 256, (batch, 512, 768, 3), np.uint8)
out = np.asarray(model(img))
print(f"{img.shape} -> {out.shape} across {n} devices ({data_n}x{rows_n} mesh)")
