"""Pallas fused-AdamW leaf kernel vs the shared fp32 leaf math
(`train/optim.adamw_leaf_delta`) — including bf16 moment STORAGE, where
the kernel must keep the math in fp32 and cast only on store (the
--moments_dtype bf16 contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_diffusion_speedrun_tpu.ops.fused_adamw import adamw_leaf_update
from video_diffusion_speedrun_tpu.train.optim import adamw_leaf_delta

B1, B2, EPS = 0.95, 0.99, 1e-8


def _leaf(moments_dtype, shape=(64, 128)):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    p = jax.random.normal(ks[0], shape, jnp.float32)
    m = (0.01 * jax.random.normal(ks[1], shape)).astype(moments_dtype)
    v = (1e-4 * jax.random.uniform(ks[2], shape)).astype(moments_dtype)
    g = jax.random.normal(ks[3], shape, jnp.float32)
    return p, m, v, g


@pytest.mark.parametrize("moments_dtype", [jnp.float32, jnp.bfloat16])
def test_kernel_matches_reference_leaf_math(moments_dtype):
    p, m, v, g = _leaf(moments_dtype)
    lr, wd = 1e-2, 0.1
    lr_t = jnp.float32(0.5)
    bc1, bc2 = jnp.float32(0.2), jnp.float32(0.1)

    # reference math FIRST: the kernel aliases p/m/v into its outputs
    # (in-place streaming update), so their buffers are stale afterwards
    delta, m2_ref, v2_ref = adamw_leaf_delta(
        g, m, v, p, lr, wd, lr_t=lr_t, bc1=bc1, bc2=bc2,
        b1=B1, b2=B2, eps=EPS)
    p2_ref = np.asarray(p + delta)
    m2_ref = np.asarray(m2_ref.astype(moments_dtype))
    v2_ref = np.asarray(v2_ref.astype(moments_dtype))

    out = adamw_leaf_update(p, m, v, g, lr, wd, lr_t, bc1, bc2, B1, B2, EPS)
    assert out is not None
    p2, m2, v2 = out
    # storage dtype preserved via the aliased outputs
    assert m2.dtype == moments_dtype and v2.dtype == moments_dtype
    assert p2.dtype == p.dtype

    np.testing.assert_allclose(np.asarray(p2), p2_ref,
                               rtol=1e-6, atol=1e-6)
    # ULP-tight, not bit-equal: the interpreted kernel and eager XLA may
    # contract a*b+c into fma differently (observed max 1.5e-8 abs on fp32;
    # bf16 storage rounding swallows it entirely)
    np.testing.assert_allclose(np.asarray(m2, np.float32),
                               m2_ref.astype(np.float32),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(v2, np.float32),
                               v2_ref.astype(np.float32),
                               rtol=1e-5, atol=1e-7)


def test_kernel_inside_jit_with_bf16_moments():
    """Regression: the kernel used to store fp32 into bf16 moment refs and
    crash under VDS_PALLAS_ADAMW=1 + --moments_dtype bf16."""
    p, m, v, g = _leaf(jnp.bfloat16)

    @jax.jit
    def step(p, m, v, g):
        return adamw_leaf_update(p, m, v, g, 1e-2, 0.1, jnp.float32(1.0),
                                 jnp.float32(0.05), jnp.float32(0.01),
                                 B1, B2, EPS)

    p2, m2, v2 = step(p, m, v, g)
    assert m2.dtype == jnp.bfloat16 and v2.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(p2, np.float32)).all()
