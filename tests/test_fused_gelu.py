"""Fused bias+GELU kernel vs jax.nn.gelu(approximate=False), both dtype
paths (fp32 A&S erf, bf16 odd-poly), values + grads + dbias.

Includes the saturated-tail regression (round-2 advisor, low): pre-fix the
clamped bf16 poly left a constant ~4.6e-4 endpoint residual, so
gelu(x) for x < -4.2 returned wrong-signed +|x|·4.6e-4 growing linearly,
and the backward leaked ~1e-3 gradient through saturated units.
"""

import jax
import jax.numpy as jnp
import numpy as np

from video_diffusion_speedrun_tpu.ops.fused_gelu import bias_gelu


def _ref(x, bias=None):
    if bias is not None:
        x = x + bias
    return jax.nn.gelu(x.astype(jnp.float32), approximate=False)


class TestFusedBiasGelu:
    def test_fp32_matches_exact(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 48, 64)) * 3
        b = jax.random.normal(jax.random.PRNGKey(1), (64,)) * 0.5
        got = bias_gelu(x, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(_ref(x, b)),
                                   atol=2e-6, rtol=1e-5)

    def test_fp32_grads(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 64)) * 3
        b = jax.random.normal(jax.random.PRNGKey(3), (64,)) * 0.5
        gf = jax.grad(lambda x, b: jnp.sum(bias_gelu(x, b) ** 2),
                      argnums=(0, 1))(x, b)
        gr = jax.grad(lambda x, b: jnp.sum(_ref(x, b) ** 2),
                      argnums=(0, 1))(x, b)
        np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                                   atol=1e-5, rtol=1e-4, err_msg="dx")
        np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]),
                                   atol=1e-5, rtol=1e-4, err_msg="dbias")

    def test_bf16_poly_matches_exact_after_cast(self):
        x = (jax.random.normal(jax.random.PRNGKey(4), (2, 48, 64)) * 2
             ).astype(jnp.bfloat16)
        got = bias_gelu(x, None)
        want = _ref(x).astype(jnp.bfloat16)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   atol=0.02, rtol=0.02)

    def test_bf16_saturated_tail_values(self):
        """|x| > 4.2: gelu(x) must be exactly x (pos) / exactly 0 (neg) —
        no wrong-signed linear-growing residual."""
        vals = jnp.array([-64.0, -16.0, -8.0, -4.5, 4.5, 8.0, 16.0, 64.0],
                         jnp.bfloat16).reshape(1, 8, 1)
        x = jnp.broadcast_to(vals, (1, 8, 64)).astype(jnp.bfloat16)
        y = np.asarray(bias_gelu(x, None), np.float32)
        xn = np.asarray(x, np.float32)
        neg = xn < -4.2
        pos = xn > 4.2
        np.testing.assert_array_equal(y[neg], 0.0)
        np.testing.assert_array_equal(y[pos], xn[pos])

    def test_bf16_saturated_tail_grads(self):
        """Backward through saturated units: dgelu = 0 (neg tail) / 1 (pos
        tail) — pre-fix the poly endpoint leaked ~1e-3 per unit."""
        vals = jnp.array([-64.0, -8.0, 8.0, 64.0],
                         jnp.bfloat16).reshape(1, 4, 1)
        x = jnp.broadcast_to(vals, (1, 4, 64)).astype(jnp.bfloat16)
        b = jnp.zeros((64,), jnp.bfloat16)
        dx, db = jax.grad(
            lambda x, b: jnp.sum(bias_gelu(x, b).astype(jnp.float32)),
            argnums=(0, 1))(x, b)
        dx = np.asarray(dx, np.float32)
        xn = np.asarray(x, np.float32)
        np.testing.assert_array_equal(dx[xn < -4.2], 0.0)
        np.testing.assert_array_equal(dx[xn > 4.2], 1.0)
        # dbias sums dx over rows: two 0-rows + two 1-rows = 2 per feature
        np.testing.assert_allclose(np.asarray(db, np.float32), 2.0)
