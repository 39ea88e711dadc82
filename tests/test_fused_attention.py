"""Fused RoPE+flash attention (BLHD) vs the unfused reference path
(transpose → apply_rotary → softmax attention), fwd and grads.

Runs the Pallas kernel in interpreter mode on CPU; the same kernel is
exercised compiled on TPU by the benchmarks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_diffusion_speedrun_tpu.models.rope import apply_rotary, rope_cos_sin
from video_diffusion_speedrun_tpu.ops.attention import dot_product_attention
from video_diffusion_speedrun_tpu.ops.fused_attention import (
    rope_flash_attention,
)


H, D = 2, 16


def _setup(b=1, l=40, h=H, d=D, lk=None):
    lk = l if lk is None else lk
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, l, h * d), jnp.float32)
    k = jax.random.normal(ks[1], (b, lk, h * d), jnp.float32)
    v = jax.random.normal(ks[2], (b, lk, h * d), jnp.float32)
    cos, sin = rope_cos_sin(d, 2, 3, 6, jnp.array([1, 2, 3]), num_registers=4)
    return q, k, v, cos, sin


def _reference(q, k, v, cos, sin, h=H):
    b, l, hd = q.shape
    d = hd // h
    qh, kh, vh = (t.reshape(b, -1, h, d).transpose(0, 2, 1, 3)
                  for t in (q, k, v))
    qh = apply_rotary(qh, cos, sin)
    kh = apply_rotary(kh, cos, sin)
    out = dot_product_attention(qh, kh, vh)
    return out.transpose(0, 2, 1, 3).reshape(b, l, hd)


class TestFusedRopeFlash:
    def test_forward_matches_reference(self):
        q, k, v, cos, sin = _setup()
        got = rope_flash_attention(q, k, v, cos, sin, H, block_q=128, block_k=128)
        want = _reference(q, k, v, cos, sin)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)

    def test_grads_match_reference(self):
        q, k, v, cos, sin = _setup()

        def loss_fused(q, k, v):
            return jnp.sum(
                rope_flash_attention(q, k, v, cos, sin, H,
                                     block_q=128, block_k=128) ** 2
            )

        def loss_ref(q, k, v):
            return jnp.sum(_reference(q, k, v, cos, sin) ** 2)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("qkv", gf, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3,
                err_msg=f"d{name}",
            )

    def test_ragged_length_masking(self):
        # L=40 < block 128 exercises the padded-tail mask
        q, k, v, cos, sin = _setup(l=40)
        got = rope_flash_attention(q, k, v, cos, sin, H, block_q=128, block_k=128)
        want = _reference(q, k, v, cos, sin)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)

    def test_dit_fused_matches_xla_path(self):
        """Whole-model check: attention_impl='pallas' (fused kernel,
        interpret) vs 'xla' on identical params/inputs."""
        from video_diffusion_speedrun_tpu.core.config import DiTConfig
        from video_diffusion_speedrun_tpu.models.dit import (
            dit_forward, init_dit,
        )

        cfg_p = DiTConfig(
            in_channels=4, hidden_size=64, depth=2, num_heads=2,
            cross_attn_input_size=32, residual_v=True,
            train_bias_and_rms=True, attention_impl="pallas",
            compute_dtype=jnp.float32, remat=False,
        )
        cfg_x = cfg_p.replace(attention_impl="xla")
        params = init_dit(jax.random.PRNGKey(1), cfg_p)
        # unzero modulation so attention output matters
        params["blocks"]["adaLN_modulation"]["weight"] = (
            jax.random.normal(
                jax.random.PRNGKey(2),
                params["blocks"]["adaLN_modulation"]["weight"].shape) * 0.02
        )
        params["final_proj"]["weight"] = (
            jax.random.normal(jax.random.PRNGKey(3),
                              params["final_proj"]["weight"].shape) * 0.02
        )
        x = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 4, 8, 8))
        ctx = jax.random.normal(jax.random.PRNGKey(5), (1, 5, 32))
        ts = jnp.array([0.5])
        off = jnp.array([0, 0, 0])
        a = dit_forward(params, cfg_p, x, ctx, ts, rope_offsets=off)
        b = dit_forward(params, cfg_x, x, ctx, ts, rope_offsets=off)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


class TestShapeSweep:
    """Edge-shape sweep over both kernel paths, fwd + all grads vs the
    unfused reference — the dispatch/tiling decisions (short auto vs
    explicit blocked, exact-divisor vs padded-tail blocks, multi-batch)
    each hit different kernel code."""

    CASES = [
        # (b, l, block_q, block_k) — None blocks = short auto path
        (1, 24, None, None),     # short, 16-mult, single block
        (1, 72, None, None),     # short, non-16-mult tail mask
        (2, 136, None, None),    # short, multi-batch, 136 = 8·17
        (1, 96, 48, 32),         # long, exact divisor blocks (48, 32)
        (1, 88, 32, 32),         # long, 88 has no 16-aligned divisor → pad
        (2, 64, 16, 64),         # long, block_k = full L, minimal block_q
    ]

    @pytest.mark.parametrize("b,l,bq,bk", CASES)
    def test_fwd_and_grads(self, b, l, bq, bk):
        ks = jax.random.split(jax.random.PRNGKey(l), 3)
        q = jax.random.normal(ks[0], (b, l, H * D), jnp.float32)
        k = jax.random.normal(ks[1], (b, l, H * D), jnp.float32)
        v = jax.random.normal(ks[2], (b, l, H * D), jnp.float32)
        cos, sin = rope_cos_sin(D, 6, 6, 6, jnp.zeros(3, jnp.int32),
                                num_registers=8)
        cos, sin = cos[:l], sin[:l]
        kw = {} if bq is None else {"block_q": bq, "block_k": bk}

        def loss_fused(q, k, v):
            return jnp.sum(rope_flash_attention(
                q, k, v, cos, sin, H, **kw) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(_reference(q, k, v, cos, sin) ** 2)

        np.testing.assert_allclose(
            np.asarray(rope_flash_attention(q, k, v, cos, sin, H, **kw)),
            np.asarray(_reference(q, k, v, cos, sin)),
            atol=2e-5, rtol=1e-4)
        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, b_ in zip("qkv", gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=2e-4, rtol=1e-3,
                                       err_msg=f"d{name} @ L={l}")


class TestNoRopeFused:
    def test_norope_short_matches_reference(self):
        from video_diffusion_speedrun_tpu.ops.fused_attention import (
            norope_flash_attention,
        )

        ks = jax.random.split(jax.random.PRNGKey(11), 3)
        q = jax.random.normal(ks[0], (2, 52, H * D), jnp.float32)
        k = jax.random.normal(ks[1], (2, 52, H * D), jnp.float32)
        v = jax.random.normal(ks[2], (2, 52, H * D), jnp.float32)

        def ref(q, k, v):
            b, l, hd = q.shape
            d = hd // H
            qh, kh, vh = (t.reshape(b, -1, H, d).transpose(0, 2, 1, 3)
                          for t in (q, k, v))
            return dot_product_attention(qh, kh, vh).transpose(
                0, 2, 1, 3).reshape(b, l, hd)

        gf = jax.grad(lambda q, k, v: jnp.sum(
            norope_flash_attention(q, k, v, H) ** 2), argnums=(0, 1, 2))(
            q, k, v)
        gr = jax.grad(lambda q, k, v: jnp.sum(ref(q, k, v) ** 2),
                      argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(
            np.asarray(norope_flash_attention(q, k, v, H)),
            np.asarray(ref(q, k, v)), atol=2e-5, rtol=1e-4)
        for name, a, b in zip("qkv", gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=1e-3,
                                       err_msg=f"d{name}")

    def test_norope_long_path_identity_tables(self):
        """kv > SHORT_MAX_KV routes to the blocked path with cos=1/sin=0
        identity tables; force it with a tiny patched ceiling."""
        from unittest import mock

        from video_diffusion_speedrun_tpu.ops import fused_attention as fa

        ks = jax.random.split(jax.random.PRNGKey(12), 3)
        q = jax.random.normal(ks[0], (1, 200, H * D), jnp.float32)
        k = jax.random.normal(ks[1], (1, 200, H * D), jnp.float32)
        v = jax.random.normal(ks[2], (1, 200, H * D), jnp.float32)

        def ref(q, k, v):
            b, l, hd = q.shape
            d = hd // H
            qh, kh, vh = (t.reshape(b, -1, H, d).transpose(0, 2, 1, 3)
                          for t in (q, k, v))
            return dot_product_attention(qh, kh, vh).transpose(
                0, 2, 1, 3).reshape(b, l, hd)

        with mock.patch.object(fa, "SHORT_MAX_KV", 128), \
                mock.patch.object(fa, "DEFAULT_BLOCK_Q", 128), \
                mock.patch.object(fa, "DEFAULT_BLOCK_K", 128):
            got = fa.norope_flash_attention(q, k, v, H)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref(q, k, v)),
                                   atol=2e-5, rtol=1e-4)

    def test_dit_pallas_norope_matches_xla(self):
        """use_rope=False model on the pallas impl == xla impl (the retired
        v1 kernel's only live role; now the fused no-rope path)."""
        from video_diffusion_speedrun_tpu.core.config import DiTConfig
        from video_diffusion_speedrun_tpu.models.dit import (
            dit_forward, init_dit,
        )

        cfg_p = DiTConfig(
            in_channels=4, hidden_size=64, depth=2, num_heads=2,
            cross_attn_input_size=32, residual_v=True,
            train_bias_and_rms=True, attention_impl="pallas",
            compute_dtype=jnp.float32, remat=False, use_rope=False,
            max_tokens_no_rope=4 * 4 * 4 + 16,
        )
        cfg_x = cfg_p.replace(attention_impl="xla")
        params = init_dit(jax.random.PRNGKey(1), cfg_p)
        params["blocks"]["adaLN_modulation"]["weight"] = (
            jax.random.normal(
                jax.random.PRNGKey(2),
                params["blocks"]["adaLN_modulation"]["weight"].shape) * 0.02)
        params["final_proj"]["weight"] = (
            jax.random.normal(jax.random.PRNGKey(3),
                              params["final_proj"]["weight"].shape) * 0.02)
        x = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 8, 8, 8))
        ctx = jax.random.normal(jax.random.PRNGKey(5), (1, 5, 32))
        ts = jnp.array([0.5])
        a = dit_forward(params, cfg_p, x, ctx, ts)
        b = dit_forward(params, cfg_x, x, ctx, ts)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)

    def test_attention_pallas_impl_retired(self):
        from video_diffusion_speedrun_tpu.ops.attention import attention

        q = jnp.zeros((1, 2, 8, 16))
        with pytest.raises(ValueError, match="retired"):
            attention(q, q, q, impl="pallas")


class TestContextParallelFused:
    def test_cp_kernel_matches_unsharded(self):
        """shard_map'd CP fused attention == single-device fused attention,
        fwd and grads (8-device CPU mesh, context=4)."""
        from video_diffusion_speedrun_tpu.core.config import MeshConfig
        from video_diffusion_speedrun_tpu.ops.fused_attention import (
            cp_rope_flash_attention,
        )
        from video_diffusion_speedrun_tpu.parallel.mesh import (
            build_mesh, token_pspec,
        )
        from jax.sharding import NamedSharding

        mesh = build_mesh(MeshConfig(replica=1, fsdp=2, context=4, tensor=1))
        tok_shd = NamedSharding(mesh, token_pspec())

        b, l, h, d = 2, 64, 2, 16
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (b, l, h * d), jnp.float32)
        k = jax.random.normal(ks[1], (b, l, h * d), jnp.float32)
        v = jax.random.normal(ks[2], (b, l, h * d), jnp.float32)
        cos, sin = rope_cos_sin(d, 4, 4, 4, jnp.zeros(3, jnp.int32))

        def loss_cp(q, k, v):
            out = cp_rope_flash_attention(q, k, v, cos, sin, h, tok_shd,
                                          block_q=128, block_k=128)
            return jnp.sum(out ** 2)

        def loss_plain(q, k, v):
            return jnp.sum(
                rope_flash_attention(q, k, v, cos, sin, h,
                                     block_q=128, block_k=128) ** 2)

        fn = jax.jit(jax.value_and_grad(loss_cp, argnums=(0, 1, 2)))
        lc, gc = fn(jax.device_put(q, tok_shd), jax.device_put(k, tok_shd),
                    jax.device_put(v, tok_shd))
        lp, gp = jax.value_and_grad(loss_plain, argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(float(lc), float(lp), rtol=1e-5)
        for name, a, b2 in zip("qkv", gc, gp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                       atol=1e-4, rtol=1e-3,
                                       err_msg=f"d{name}")

    def test_dit_cp_pallas_matches_plain(self):
        """Whole model with attention_impl='pallas' + CP sharding == the
        unsharded pallas model."""
        from video_diffusion_speedrun_tpu.core.config import (
            DiTConfig, MeshConfig,
        )
        from video_diffusion_speedrun_tpu.models.dit import (
            dit_forward, init_dit,
        )
        from video_diffusion_speedrun_tpu.parallel.mesh import (
            build_mesh, token_pspec,
        )
        from jax.sharding import NamedSharding

        mesh = build_mesh(MeshConfig(replica=1, fsdp=2, context=4, tensor=1))
        tok_shd = NamedSharding(mesh, token_pspec())
        cfg = DiTConfig(
            in_channels=4, hidden_size=64, depth=2, num_heads=2,
            cross_attn_input_size=32, residual_v=True,
            train_bias_and_rms=True, attention_impl="pallas",
            compute_dtype=jnp.float32, remat=False,
        )
        params = init_dit(jax.random.PRNGKey(1), cfg)
        params["blocks"]["adaLN_modulation"]["weight"] = (
            jax.random.normal(
                jax.random.PRNGKey(2),
                params["blocks"]["adaLN_modulation"]["weight"].shape) * 0.02)
        params["final_proj"]["weight"] = (
            jax.random.normal(jax.random.PRNGKey(3),
                              params["final_proj"]["weight"].shape) * 0.02)
        # L must divide context axis: tokens = 16 regs + 4*8*8/8=... use
        # t=4,h=8,w=8 -> L=128+16=144 % 4 == 0
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 4, 16, 8))
        ctx = jax.random.normal(jax.random.PRNGKey(5), (2, 5, 32))
        ts = jnp.array([0.5, 0.8])
        off = jnp.zeros(3, jnp.int32)
        plain = dit_forward(params, cfg, x, ctx, ts, rope_offsets=off)
        cp = jax.jit(
            lambda p, x, c, t: dit_forward(p, cfg, x, c, t, rope_offsets=off,
                                           token_sharding=tok_shd)
        )(params, x, ctx, ts)
        np.testing.assert_allclose(np.asarray(cp), np.asarray(plain),
                                   atol=1e-4, rtol=1e-3)

    def test_cp_ring_nondivisor_block_fallback(self):
        """Regression (round-2 advisor, high): when the per-shard chunk has
        no 16-aligned divisor within the VMEM row budget, fit_block_div
        falls back to a NON-divisor block — the ring chunk kernels must pad
        the q side to the block multiple or tail rows silently get
        uninitialized outputs / wrong gradients. Chunk 1072 = 16·67 with a
        forced budget of 704 picks block 544 (1072//544 = 1 grid step
        unpadded → 528 rows dropped pre-fix)."""
        from unittest import mock

        from video_diffusion_speedrun_tpu.core.config import MeshConfig
        from video_diffusion_speedrun_tpu.ops import fused_attention as fa
        from video_diffusion_speedrun_tpu.parallel.mesh import (
            build_mesh, token_pspec,
        )
        from jax.sharding import NamedSharding

        mesh = build_mesh(MeshConfig(replica=1, fsdp=4, context=2, tensor=1))
        tok_shd = NamedSharding(mesh, token_pspec())

        b, l, h, d = 4, 2144, 1, 16  # chunk = 1072 per shard
        ks = jax.random.split(jax.random.PRNGKey(7), 3)
        q = jax.random.normal(ks[0], (b, l, h * d), jnp.float32)
        k = jax.random.normal(ks[1], (b, l, h * d), jnp.float32)
        v = jax.random.normal(ks[2], (b, l, h * d), jnp.float32)
        cos, sin = rope_cos_sin(d, 16, 12, 12, jnp.zeros(3, jnp.int32))
        cos, sin = cos[:l], sin[:l]

        block = fa._fit_block_div(1072, 704, align=16)
        assert 1072 % block != 0, "repro needs the non-divisor fallback"

        def loss_cp(q, k, v):
            out = fa.cp_rope_flash_attention(q, k, v, cos, sin, h, tok_shd)
            return jnp.sum(out ** 2)

        def loss_plain(q, k, v):
            return jnp.sum(_reference(q, k, v, cos, sin, h) ** 2)

        with mock.patch.object(fa, "_short_row_budget",
                               lambda lk, for_bwd, d: 704):
            lc, gc = jax.jit(jax.value_and_grad(loss_cp, argnums=(0, 1, 2)))(
                q, k, v)
        lp, gp = jax.value_and_grad(loss_plain, argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(float(lc), float(lp), rtol=1e-5)
        for name, a, b2 in zip("qkv", gc, gp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                       atol=2e-3, rtol=1e-3,
                                       err_msg=f"d{name}")

    def test_cp_ring_big_chunk_blocked_fallback(self):
        """Regression (round-2 advisor, medium): per-shard chunks whose full
        k/v + fp32 dk/dv scratch exceed VMEM must fall back to the blocked
        long-path kernels (with the traveling kv-bias threaded through)
        instead of compiling an over-budget kernel. Forced small ceilings
        exercise the fallback on the CPU sim, including a ragged tail."""
        from unittest import mock

        from video_diffusion_speedrun_tpu.core.config import MeshConfig
        from video_diffusion_speedrun_tpu.ops import fused_attention as fa
        from video_diffusion_speedrun_tpu.parallel.mesh import (
            build_mesh, token_pspec,
        )
        from jax.sharding import NamedSharding

        mesh = build_mesh(MeshConfig(replica=1, fsdp=2, context=4, tensor=1))
        tok_shd = NamedSharding(mesh, token_pspec())

        b, l, h, d = 2, 244, 2, 16  # chunk = 64 > forced ceiling 32; ragged
        ks = jax.random.split(jax.random.PRNGKey(9), 3)
        q = jax.random.normal(ks[0], (b, l, h * d), jnp.float32)
        k = jax.random.normal(ks[1], (b, l, h * d), jnp.float32)
        v = jax.random.normal(ks[2], (b, l, h * d), jnp.float32)
        cos, sin = rope_cos_sin(d, 16, 4, 4, jnp.zeros(3, jnp.int32))
        cos, sin = cos[:l], sin[:l]

        def loss_cp(q, k, v):
            out = fa.cp_rope_flash_attention(q, k, v, cos, sin, h, tok_shd)
            return jnp.sum(out ** 2)

        def loss_plain(q, k, v):
            return jnp.sum(_reference(q, k, v, cos, sin, h) ** 2)

        with mock.patch.object(fa, "_RING_FULLK_MAX_FWD", 32), \
                mock.patch.object(fa, "_RING_FULLK_MAX_BWD", 32):
            lc, gc = jax.jit(jax.value_and_grad(loss_cp, argnums=(0, 1, 2)))(
                q, k, v)
        lp, gp = jax.value_and_grad(loss_plain, argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(float(lc), float(lp), rtol=1e-5)
        for name, a, b2 in zip("qkv", gc, gp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                       atol=1e-4, rtol=1e-3,
                                       err_msg=f"d{name}")

    def test_cp_ring_ragged_length(self):
        """Ring CP with token count NOT divisible by the context axis —
        padded + masked by the traveling kv-bias (round-1 VERDICT item 6)."""
        from video_diffusion_speedrun_tpu.core.config import MeshConfig
        from video_diffusion_speedrun_tpu.ops.fused_attention import (
            cp_rope_flash_attention,
        )
        from video_diffusion_speedrun_tpu.parallel.mesh import (
            build_mesh, token_pspec,
        )
        from jax.sharding import NamedSharding

        mesh = build_mesh(MeshConfig(replica=1, fsdp=2, context=4, tensor=1))
        tok_shd = NamedSharding(mesh, token_pspec())

        b, l, h, d = 2, 52, 2, 16  # 52 % 4 != 0 and 52 % 16 != 0
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (b, l, h * d), jnp.float32)
        k = jax.random.normal(ks[1], (b, l, h * d), jnp.float32)
        v = jax.random.normal(ks[2], (b, l, h * d), jnp.float32)
        cos, sin = rope_cos_sin(d, 4, 4, 4, jnp.zeros(3, jnp.int32))
        cos, sin = cos[:l], sin[:l]

        def loss_cp(q, k, v):
            out = cp_rope_flash_attention(q, k, v, cos, sin, h, tok_shd)
            return jnp.sum(out ** 2)

        def loss_plain(q, k, v):
            return jnp.sum(_reference(q, k, v, cos, sin, h) ** 2)

        lc, gc = jax.jit(jax.value_and_grad(loss_cp, argnums=(0, 1, 2)))(
            q, k, v)
        lp, gp = jax.value_and_grad(loss_plain, argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(float(lc), float(lp), rtol=1e-5)
        for name, a, b2 in zip("qkv", gc, gp):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                       atol=1e-4, rtol=1e-3,
                                       err_msg=f"d{name}")


class TestLongPathBackward:
    """The blocked long path (explicit block sizes) — both backward
    variants: fused dq-partials (nk ≤ _MAX_DQ_PARTIALS) and the two-pass
    fallback beyond it."""

    def _check(self, l, bq, bk):
        ks = jax.random.split(jax.random.PRNGKey(2), 3)
        q = jax.random.normal(ks[0], (1, l, H * D), jnp.float32)
        k = jax.random.normal(ks[1], (1, l, H * D), jnp.float32)
        v = jax.random.normal(ks[2], (1, l, H * D), jnp.float32)
        cos, sin = rope_cos_sin(D, 10, 8, 8, jnp.zeros(3, jnp.int32))
        cos, sin = cos[:l], sin[:l]

        def loss_fused(q, k, v):
            return jnp.sum(rope_flash_attention(
                q, k, v, cos, sin, H, block_q=bq, block_k=bk) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(_reference(q, k, v, cos, sin) ** 2)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("qkv", gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=1e-3,
                                       err_msg=f"d{name}")

    def test_fused_dq_partials(self):
        self._check(l=200, bq=64, bk=64)  # nk=4 ≤ 16 → fused partials

    def test_padfree_non128_divisor_blocks(self):
        """Column-layout LSE lets ragged L tile with 16-aligned divisor
        blocks that are NOT 128-multiples (the 8208 = 9×912 production
        case in miniature: 432 = 9×48). Guards the round-3 layout change —
        the old [b,h,1,L] row LSE forced 128-multiple blocks here."""
        from video_diffusion_speedrun_tpu.ops.fused_attention import (
            _ALIGN, _fit_block_div,
        )

        picked = _fit_block_div(432, 128, align=_ALIGN)
        assert picked == 48 and picked % 128 != 0  # the case under test
        self._check(l=432, bq=128, bk=128)

    def test_two_pass_fallback_beyond_partial_cap(self):
        from video_diffusion_speedrun_tpu.ops import fused_attention as fa

        assert -(-600 // 32) > fa._MAX_DQ_PARTIALS  # nk=19 → fallback
        self._check(l=600, bq=96, bk=32)

    def test_explicit_blocks_select_long_path(self):
        """Caller-passed block sizes must not be silently overridden by the
        short-path auto dispatch (they were, pre round-2 review)."""
        from unittest import mock

        from video_diffusion_speedrun_tpu.ops import fused_attention as fa

        called = {}
        orig = fa._forward

        def spy(*a, **kw):
            called["long"] = True
            return orig(*a, **kw)

        ks = jax.random.split(jax.random.PRNGKey(3), 3)
        q = jax.random.normal(ks[0], (1, 64, H * D), jnp.float32)
        cos, sin = rope_cos_sin(D, 4, 4, 4, jnp.zeros(3, jnp.int32))
        with mock.patch.object(fa, "_forward", spy):
            fa.rope_flash_attention(q, q, q, cos[:64], sin[:64], H,
                                    block_q=64, block_k=64)
        assert called.get("long")

    def test_dit_cp_ragged_tokens_matches_plain(self):
        """Whole model under CP with a token count NOT divisible by the
        context axis (ring pads+masks; GSPMD pads the sharding constraint)."""
        from video_diffusion_speedrun_tpu.core.config import (
            DiTConfig, MeshConfig,
        )
        from video_diffusion_speedrun_tpu.models.dit import (
            dit_forward, init_dit,
        )
        from video_diffusion_speedrun_tpu.parallel.mesh import (
            build_mesh, token_pspec,
        )
        from jax.sharding import NamedSharding

        mesh = build_mesh(MeshConfig(replica=1, fsdp=2, context=4, tensor=1))
        tok_shd = NamedSharding(mesh, token_pspec())
        cfg = DiTConfig(
            in_channels=4, hidden_size=64, depth=2, num_heads=2,
            cross_attn_input_size=32, residual_v=True,
            train_bias_and_rms=True, attention_impl="pallas",
            compute_dtype=jnp.float32, remat=False,
        )
        params = init_dit(jax.random.PRNGKey(1), cfg)
        params["blocks"]["adaLN_modulation"]["weight"] = (
            jax.random.normal(
                jax.random.PRNGKey(2),
                params["blocks"]["adaLN_modulation"]["weight"].shape) * 0.02)
        params["final_proj"]["weight"] = (
            jax.random.normal(jax.random.PRNGKey(3),
                              params["final_proj"]["weight"].shape) * 0.02)
        # tokens = 16 registers + 1*1*13 patches = 29; 29 % 4 != 0
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 2, 2, 26))
        ctx = jax.random.normal(jax.random.PRNGKey(5), (2, 5, 32))
        ts = jnp.array([0.5, 0.8])
        off = jnp.zeros(3, jnp.int32)
        plain = dit_forward(params, cfg, x, ctx, ts, rope_offsets=off)
        cp = jax.jit(
            lambda p, x, c, t: dit_forward(p, cfg, x, c, t, rope_offsets=off,
                                           token_sharding=tok_shd)
        )(params, x, ctx, ts)
        np.testing.assert_allclose(np.asarray(cp), np.asarray(plain),
                                   atol=1e-4, rtol=1e-3)


class TestSplitPrefixPath:
    """The split-prefix long path: L = thin prefix + block-divisible bulk
    (the production 8208 = 16 registers + 8192 tokens) runs the bulk×bulk
    quadrant at full blocks plus thin merged slices — exact decomposition,
    checked fwd + grads against the unfused reference."""

    def _setup_l(self, l, seed=7):
        ks = jax.random.split(jax.random.PRNGKey(seed), 3)
        q = jax.random.normal(ks[0], (1, l, H * D), jnp.float32)
        k = jax.random.normal(ks[1], (1, l, H * D), jnp.float32)
        v = jax.random.normal(ks[2], (1, l, H * D), jnp.float32)
        cos, sin = rope_cos_sin(D, 10, 8, 8, jnp.zeros(3, jnp.int32))
        return q, k, v, cos[:l], sin[:l]

    def test_dispatch_rules(self):
        from video_diffusion_speedrun_tpu.ops.fused_attention import (
            DEFAULT_BLOCK_Q, _split_prefix,
        )

        assert _split_prefix(8208, 8208, DEFAULT_BLOCK_Q) == 16  # production
        assert _split_prefix(2064, 2064, DEFAULT_BLOCK_Q) == 16  # 2-block bulk
        assert _split_prefix(8192, 8192, DEFAULT_BLOCK_Q) == 0   # divisible
        assert _split_prefix(8208, 512, DEFAULT_BLOCK_Q) == 0    # cross-attn
        assert _split_prefix(1040, 1040, DEFAULT_BLOCK_Q) == 0   # bulk < 2 blk
        assert _split_prefix(8200, 8200, DEFAULT_BLOCK_Q) == 0   # 8 % 16 != 0

    def _check(self, l, n_pfx, block, seed=7):
        from video_diffusion_speedrun_tpu.ops.fused_attention import (
            _split_rope_flash,
        )

        q, k, v, cos, sin = self._setup_l(l, seed)
        scale = D ** -0.5

        def loss_split(q, k, v):
            return jnp.sum(_split_rope_flash(
                q, k, v, cos, sin, cos, sin, H, scale, n_pfx, block) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(_reference(q, k, v, cos, sin) ** 2)

        o = _split_rope_flash(q, k, v, cos, sin, cos, sin, H, scale, n_pfx,
                              block)
        np.testing.assert_allclose(np.asarray(o),
                                   np.asarray(_reference(q, k, v, cos, sin)),
                                   atol=2e-5, rtol=1e-4)
        gf = jax.grad(loss_split, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip("qkv", gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=1e-3,
                                       err_msg=f"d{name}")

    def test_production_miniature(self):
        # 144 = 16 + 2×64: the 8208 = 16 + 8×1024 case in miniature
        self._check(l=144, n_pfx=16, block=64)

    def test_wide_prefix_multiblock_bulk(self):
        # 240 = 48 + 3×64: prefix wider than one lane group, odd bulk count
        self._check(l=240, n_pfx=48, block=64, seed=11)

    def test_auto_dispatch_routes_through_split(self):
        """rope_flash_attention with no explicit blocks must take the split
        path at thin-remainder L (patched ceilings put 144 in that regime)
        and still match the reference."""
        from unittest import mock

        from video_diffusion_speedrun_tpu.ops import fused_attention as fa

        q, k, v, cos, sin = self._setup_l(144, seed=3)
        called = {}
        orig = fa._split_fwd

        def spy(*a, **kw):
            called["split"] = True
            return orig(*a, **kw)

        with mock.patch.object(fa, "SHORT_MAX_KV", 0), \
                mock.patch.object(fa, "DEFAULT_BLOCK_Q", 64), \
                mock.patch.object(fa, "DEFAULT_BLOCK_K", 64), \
                mock.patch.object(fa, "_split_fwd", spy):
            got = fa.rope_flash_attention(q, k, v, cos, sin, H)
        assert called.get("split")
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(_reference(q, k, v, cos, sin)),
                                   atol=2e-5, rtol=1e-4)

    def test_norope_auto_dispatch_split(self):
        from unittest import mock

        from video_diffusion_speedrun_tpu.ops import fused_attention as fa

        ks = jax.random.split(jax.random.PRNGKey(9), 3)
        q = jax.random.normal(ks[0], (1, 144, H * D), jnp.float32)
        k = jax.random.normal(ks[1], (1, 144, H * D), jnp.float32)
        v = jax.random.normal(ks[2], (1, 144, H * D), jnp.float32)

        def ref(q, k, v):
            b, l, hd = q.shape
            d = hd // H
            qh, kh, vh = (t.reshape(b, -1, H, d).transpose(0, 2, 1, 3)
                          for t in (q, k, v))
            return dot_product_attention(qh, kh, vh).transpose(
                0, 2, 1, 3).reshape(b, l, hd)

        with mock.patch.object(fa, "SHORT_MAX_KV", 0), \
                mock.patch.object(fa, "DEFAULT_BLOCK_Q", 64), \
                mock.patch.object(fa, "DEFAULT_BLOCK_K", 64):
            got = fa.norope_flash_attention(q, k, v, H)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref(q, k, v)),
                                   atol=2e-5, rtol=1e-4)

    def test_dual_subtile_forward(self):
        """block=32 with a 128-row bulk drives the dual-subtile forward
        (_fwd_kernel_noro2: lk % (2·block) == 0 with ≥2 windows) — exact
        vs the unfused reference, fwd + grads."""
        from video_diffusion_speedrun_tpu.ops import fused_attention as fa

        q = jax.random.normal(jax.random.PRNGKey(0), (1, 128, H * D),
                              jnp.float32)
        # sanity: the dispatch condition holds for these shapes
        assert 128 % (2 * 32) == 0 and 128 // (2 * 32) >= 2
        self._check(l=144, n_pfx=16, block=32, seed=13)

    def test_merge_fallback_path(self):
        """With _TAIL_MAX forced to 0 the 3-call merge decomposition runs
        (the fallback for wide prefixes / fp32 VMEM caps) — keep it exact
        now that thin prefixes default to the tail-fused kernels."""
        from unittest import mock

        from video_diffusion_speedrun_tpu.ops import fused_attention as fa

        with mock.patch.object(fa, "_TAIL_MAX", 0):
            self._check(l=144, n_pfx=16, block=64)
            self._check(l=240, n_pfx=48, block=64, seed=11)

    def test_tail_and_merge_paths_agree(self):
        """The tail-fused and 3-call merge decompositions of the same split
        produce matching o and grads (both exact up to fp rounding)."""
        from unittest import mock

        from video_diffusion_speedrun_tpu.ops import fused_attention as fa

        q, k, v, cos, sin = self._setup_l(144, seed=5)
        scale = D ** -0.5

        def run():
            def loss(q, k, v):
                return jnp.sum(fa._split_rope_flash(
                    q, k, v, cos, sin, cos, sin, H, scale, 16, 64) ** 2)
            o = fa._split_rope_flash(q, k, v, cos, sin, cos, sin, H, scale,
                                     16, 64)
            return o, jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

        assert fa._use_tail(q, 16, 128, 64)
        o_tail, g_tail = run()
        with mock.patch.object(fa, "_TAIL_MAX", 0):
            o_merge, g_merge = run()
        np.testing.assert_allclose(np.asarray(o_tail), np.asarray(o_merge),
                                   atol=2e-5, rtol=1e-4)
        for name, a, b in zip("qkv", g_tail, g_merge):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=1e-3,
                                       err_msg=f"d{name}")
