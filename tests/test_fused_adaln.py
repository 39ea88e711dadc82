"""Direct unit tests for the fused AdaLN+RMSNorm Pallas kernels
(ops/fused_adaln.py) — fwd and grads vs the unfused XLA composition
(`rms_norm` + the DiT `_modulate`), across hidden widths since the row
blocking scales with D (`_auto_block`: fixed 512-row blocks OOM VMEM at
width 2048). Previously covered only indirectly through the DiT-level and
production-parity suites. Reference semantics: `/root/reference/model.py`
RMSNorm (25-41) + modulate shift/scale.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_diffusion_speedrun_tpu.ops.fused_adaln import (
    adaln_rms_modulate,
    gated_residual_adaln,
)
from video_diffusion_speedrun_tpu.ops.normalization import rms_norm


def _ref_modulate(x, shift, scale, gamma=None, eps=1e-6):
    n = rms_norm(x, gamma, eps=eps)
    return n * (1.0 + scale[:, None, :]) + shift[:, None, :]


def _setup(b=2, l=24, d=64, gamma=True, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    x = jax.random.normal(ks[0], (b, l, d), jnp.float32)
    shift = jax.random.normal(ks[1], (b, d), jnp.float32) * 0.1
    scale = jax.random.normal(ks[2], (b, d), jnp.float32) * 0.1
    g = jax.random.normal(ks[3], (d,), jnp.float32) * 0.1 + 1.0 \
        if gamma else None
    return x, shift, scale, g


class TestAdalnRmsModulate:
    # widths bracket the _auto_block budget regimes; L=24 keeps interpret
    # mode fast while still exercising multi-block rows at width 2048
    @pytest.mark.parametrize("d", [64, 512, 2048])
    @pytest.mark.parametrize("gamma", [True, False])
    def test_fwd_and_grads(self, d, gamma):
        x, shift, scale, g = _setup(d=d, gamma=gamma)

        def loss_fused(*a):
            return jnp.sum(adaln_rms_modulate(*a) ** 2)

        def loss_ref(*a):
            return jnp.sum(_ref_modulate(*a) ** 2)

        args = (x, shift, scale) + ((g,) if gamma else ())
        np.testing.assert_allclose(
            np.asarray(adaln_rms_modulate(*args)),
            np.asarray(_ref_modulate(*args)), atol=1e-5, rtol=1e-5)
        argnums = tuple(range(len(args)))
        gf = jax.grad(loss_fused, argnums=argnums)(*args)
        gr = jax.grad(loss_ref, argnums=argnums)(*args)
        names = ("dx", "dshift", "dscale", "dgamma")[: len(args)]
        for name, a, b in zip(names, gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5, rtol=1e-4, err_msg=name)

    def test_ragged_rows_padded(self):
        # L=19: no 16-aligned divisor → padded tail rows must not leak into
        # outputs or the [B, D] reduction grads
        x, shift, scale, g = _setup(l=19, d=64)

        def loss_fused(x, shift, scale, g):
            return jnp.sum(adaln_rms_modulate(x, shift, scale, g) ** 2)

        def loss_ref(x, shift, scale, g):
            return jnp.sum(_ref_modulate(x, shift, scale, g) ** 2)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, shift, scale, g)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, shift, scale, g)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5, rtol=1e-4)

    def test_bf16_io_fp32_internals(self):
        x, shift, scale, g = _setup(d=128)
        xb = x.astype(jnp.bfloat16)
        got = adaln_rms_modulate(xb, shift.astype(jnp.bfloat16),
                                 scale.astype(jnp.bfloat16),
                                 g.astype(jnp.bfloat16))
        assert got.dtype == jnp.bfloat16
        want = _ref_modulate(xb.astype(jnp.float32),
                             shift.astype(jnp.bfloat16).astype(jnp.float32),
                             scale.astype(jnp.bfloat16).astype(jnp.float32),
                             g.astype(jnp.bfloat16).astype(jnp.float32))
        np.testing.assert_allclose(np.asarray(got.astype(jnp.float32)),
                                   np.asarray(want), atol=2e-2, rtol=2e-2)


class TestGatedResidualAdaln:
    def test_fwd_and_grads(self):
        x, shift, scale, g = _setup(d=64)
        ks = jax.random.split(jax.random.PRNGKey(7), 2)
        delta = jax.random.normal(ks[0], x.shape, jnp.float32)
        gate = jax.random.normal(ks[1], shift.shape, jnp.float32) * 0.1

        def ref(x, delta, gate, shift, scale, g):
            xn = x + delta * gate[:, None, :]
            return xn, _ref_modulate(xn, shift, scale, g)

        xn_f, y_f = gated_residual_adaln(x, delta, gate, shift, scale, g)
        xn_r, y_r = ref(x, delta, gate, shift, scale, g)
        np.testing.assert_allclose(np.asarray(xn_f), np.asarray(xn_r),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_r),
                                   atol=1e-5, rtol=1e-5)

        def loss_fused(*a):
            xn, y = gated_residual_adaln(*a)
            return jnp.sum(y ** 2) + jnp.sum(xn ** 3)

        def loss_ref(*a):
            xn, y = ref(*a)
            return jnp.sum(y ** 2) + jnp.sum(xn ** 3)

        args = (x, delta, gate, shift, scale, g)
        gf = jax.grad(loss_fused, argnums=tuple(range(6)))(*args)
        gr = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
        names = ("dx", "ddelta", "dgate", "dshift", "dscale", "dgamma")
        for name, a, b in zip(names, gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5, rtol=1e-4, err_msg=name)
