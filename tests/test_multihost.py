"""Multi-host helpers on the virtual CPU mesh (single process)."""

import jax
import numpy as np
import pytest

from lanczos_tpu.parallel.multihost import dcn_aware_mesh, scaling_efficiency


def test_dcn_aware_mesh_shapes():
    mesh = dcn_aware_mesh(rows_per_host=4)
    assert mesh.shape["rows"] == 4
    assert mesh.shape["data"] == len(jax.devices()) // 4
    mesh2 = dcn_aware_mesh(rows_per_host=2)
    assert mesh2.shape["rows"] == 2


def test_dcn_aware_mesh_runs_sharded_upscaler(rng):
    from lanczos_tpu.core.config import Profile, ResampleConfig
    from lanczos_tpu.parallel.sharded import ShardedUpscaler
    from lanczos_tpu.models.upscaler import Upscaler

    mesh = dcn_aware_mesh(rows_per_host=4)
    cfg = ResampleConfig.from_profile(Profile.PRECISE, (32, 16), scale=(2, 1), a=2)
    img = rng.integers(0, 256, size=(2, 32, 16, 3), dtype=np.uint8)
    out = np.asarray(ShardedUpscaler(cfg, mesh)(img))
    ref = np.asarray(Upscaler(cfg, backend="xla")(img))
    np.testing.assert_array_equal(out, ref)


def test_mesh_divisibility_error():
    with pytest.raises(ValueError):
        dcn_aware_mesh(rows_per_host=3)  # 8 % 3 != 0


def test_scaling_efficiency():
    assert scaling_efficiency(800.0, 100.0, 8) == 1.0
    assert scaling_efficiency(680.0, 100.0, 8) == pytest.approx(0.85)
