"""Differentiability of the float resample path.

The banded resample is linear, so jax.grad/vjp flow through the XLA path
(gather + FMA) for free — the vjp of ``R·x`` is ``Rᵀ·g``, verified against
the dense operator.  (uint8 quantization and the Pallas kernel are
inference-only paths.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from lanczos_tpu.core.config import EdgeMode
from lanczos_tpu.core.weights import banded_weights
from lanczos_tpu.ops.resample_xla import apply_banded


def test_vjp_matches_dense_transpose(rng):
    op = banded_weights(12, 24, 2, "lanczos", EdgeMode.CLAMP, True)
    idx = jnp.asarray(op.idx)
    w = jnp.asarray(op.weights, jnp.float32)
    x = jnp.asarray(rng.standard_normal((12, 5)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((24, 5)), jnp.float32)

    f = lambda v: apply_banded(v, idx, w, axis=0)
    _, vjp = jax.vjp(f, x)
    (gx,) = vjp(g)

    R = op.dense().astype(np.float32)
    np.testing.assert_allclose(np.asarray(gx), R.T @ np.asarray(g), rtol=2e-5, atol=1e-5)


def test_grad_through_2d_resample(rng):
    from lanczos_tpu.core.config import Profile, ResampleConfig
    from lanczos_tpu.ops.resample_xla import SeparableOps, apply_banded

    cfg = ResampleConfig.from_profile(Profile.PRECISE, (8, 6), scale=(2, 1), a=2)
    ops = SeparableOps(cfg)

    def loss(img):
        v = apply_banded(img, ops.idx_v, ops.w_v, 0, cfg.a)
        out = apply_banded(v, ops.idx_h, ops.w_h, 1, cfg.a)
        return jnp.sum(out**2)

    x = jnp.asarray(rng.standard_normal((8, 6, 3)), jnp.float32)
    g = jax.grad(loss)(x)
    assert g.shape == x.shape
    # numerical check on one coordinate
    eps = 1e-3
    e = jnp.zeros_like(x).at[3, 2, 1].set(eps)
    fd = (loss(x + e) - loss(x - e)) / (2 * eps)
    np.testing.assert_allclose(float(g[3, 2, 1]), float(fd), rtol=1e-2)
