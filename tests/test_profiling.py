"""Timing harness invariants (the differential queue-drained scheme)."""

import jax
import jax.numpy as jnp
import numpy as np

from lanczos_tpu.utils.profiling import (
    Roofline,
    chip_spec,
    readback_cost,
    steady_time,
)
from lanczos_tpu.core.config import Profile, ResampleConfig


def test_steady_time_positive_and_bounded():
    """Escalation terminates and returns a sane positive per-call time,
    even for a sub-microsecond fn (the regime where the old
    subtract-the-readback scheme returned 1e-9 illusions)."""
    f = jax.jit(lambda v: v ^ jnp.uint8(1))
    x = jnp.zeros((1 << 16,), jnp.uint8)
    dt = steady_time(f, x, iters=8, rb_cost=readback_cost())
    assert 0 < dt < 1.0


def test_chip_spec_single_source():
    """bench.py resolves nominal bandwidth through the one table."""
    import types

    from bench import peak_bw

    for kind in ("TPU v5 lite", "TPU v4", "cpu"):
        dev = types.SimpleNamespace(device_kind=kind)
        assert peak_bw(dev) == chip_spec(dev)[0]


def test_roofline_fraction():
    cfg = ResampleConfig.from_profile(
        Profile.PRECISE, (2160, 3840), out_shape=(4320, 7680), a=3
    )
    r = Roofline.for_config(cfg)
    assert r.hbm_bytes == 3 * (2160 * 3840 + 4320 * 7680)
    assert 0 < r.fraction(r.min_seconds * 2) <= 0.5 + 1e-9
