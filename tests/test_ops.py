"""Unit tests for compute primitives, validated against torch-CPU reference
implementations of the semantics in /root/reference/model.py."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_diffusion_speedrun_tpu.ops.embeddings import timestep_embedding
from video_diffusion_speedrun_tpu.ops.normalization import rms_norm
from video_diffusion_speedrun_tpu.ops.patchify import (
    extract_patches,
    patchify,
    unpatchify,
)
from video_diffusion_speedrun_tpu.models.rope import (
    apply_rotary,
    rope_cos_sin,
    rope_inv_freqs,
)


def torch_ref():
    torch = pytest.importorskip("torch")
    return torch


class TestTimestepEmbedding:
    def test_matches_torch_reference(self):
        """Reference semantics: model.py:12-22."""
        torch = torch_ref()
        import math

        def ref(t, dim, max_period=10000):
            half = dim // 2
            freqs = torch.exp(
                -math.log(max_period)
                * torch.arange(start=0, end=half, dtype=torch.float32) / half
            )
            args = t[:, None].float() * freqs[None]
            return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)

        t = np.array([0.0, 0.25, 0.5, 0.99, 1.0], np.float32)
        got = np.asarray(timestep_embedding(jnp.array(t), 512))
        want = ref(torch.tensor(t), 512).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_shape(self):
        assert timestep_embedding(jnp.zeros((4,)), 384).shape == (4, 384)


class TestRMSNorm:
    def test_matches_torch_reference(self):
        """Reference semantics: model.py:25-41 (fp32 compute, eps 1e-6)."""
        torch = torch_ref()
        x = np.random.RandomState(0).randn(2, 7, 64).astype(np.float32)
        scale = np.random.RandomState(1).randn(64).astype(np.float32)

        xt = torch.tensor(x)
        norm = torch.rsqrt(xt.pow(2).mean(-1, keepdim=True) + 1e-6)
        want = (xt * norm * torch.tensor(scale)).numpy()

        got = np.asarray(rms_norm(jnp.array(x), jnp.array(scale)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_no_scale_and_dtype(self):
        x = jnp.ones((2, 3, 8), jnp.bfloat16) * 3
        out = rms_norm(x)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(out, np.float32), 1.0, atol=1e-2)


class TestPatchify:
    def test_roundtrip(self):
        """unpatchify(identity-projected patchify tokens) must reproduce the
        input under the reference's (h w t)/(p1 p2 p3 c) orders."""
        rng = np.random.RandomState(0)
        x = rng.randn(2, 4, 6, 8, 8).astype(np.float32)
        pt, p, c = 2, 2, 4
        patches = extract_patches(jnp.array(x), pt, p)  # [B, L, c*pt*p*p]
        # permute features (c, kt, kh, kw) -> (kh, kw, kt, c) to mimic the
        # final-proj output layout, then unpatchify.
        b, l, f = patches.shape
        feat = patches.reshape(b, l, c, pt, p, p).transpose(0, 1, 4, 5, 3, 2)
        feat = feat.reshape(b, l, f)
        out = unpatchify(feat, 3, 4, 4, pt, p, c)
        np.testing.assert_allclose(np.asarray(out), x, atol=1e-6)

    def test_matches_torch_conv3d(self):
        """Patchify == strided Conv3d + 'b c t h w -> b (h w t) c'
        (model.py:170-186) with kernel = conv_w.reshape(D, -1).T."""
        torch = torch_ref()
        rng = np.random.RandomState(0)
        B, C, T, H, W, D, pt, p = 2, 4, 4, 8, 8, 16, 2, 2
        x = rng.randn(B, C, T, H, W).astype(np.float32)
        conv = torch.nn.Conv3d(C, D, kernel_size=(pt, p, p), stride=(pt, p, p))
        with torch.no_grad():
            y = conv(torch.tensor(x))  # [B, D, T/pt, H/p, W/p]
            y = y.permute(0, 3, 4, 2, 1).reshape(B, -1, D)  # b (h w t) c
        kernel = jnp.array(conv.weight.detach().numpy().reshape(D, -1).T)
        bias = jnp.array(conv.bias.detach().numpy())
        got = patchify(jnp.array(x), kernel, bias, pt, p, compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), y.numpy(), atol=1e-4)


class TestRope:
    def _torch_table(self, dim, base, t, h, w):
        """Reference ThreeDimRotary table construction (model.py:192-217)."""
        torch = torch_ref()
        inv_freq_space = 1.0 / (base ** (torch.arange(0, dim, 4).float() / dim))
        inv_freq_time = 1.0 / (base ** (torch.arange(0, dim, 2).float() / dim))
        t_h = torch.arange(h).float()
        t_w = torch.arange(w).float()
        t_t = torch.arange(t).float()
        freqs_h = torch.outer(t_h, inv_freq_space).reshape(1, h, 1, dim // 4)
        freqs_w = torch.outer(t_w, inv_freq_space).reshape(1, 1, w, dim // 4)
        freqs_t = torch.outer(t_t, inv_freq_time).reshape(t, 1, 1, dim // 2)
        freqs_h = freqs_h.repeat(t, 1, w, 1)
        freqs_w = freqs_w.repeat(t, h, 1, 1)
        freqs_t = freqs_t.repeat(1, h, w, 1)
        return torch.cat([freqs_t, freqs_h, freqs_w], 3)  # [t, h, w, dim]

    def test_matches_reference_table(self):
        head_dim = 32  # rope dim = 16
        T, H, W = 3, 4, 5
        full = self._torch_table(head_dim // 2, 100.0, 8, 8, 8)
        # crop offsets (2, 1, 3), reference order (t h w row-major flatten)
        want = full[2 : 2 + T, 1 : 1 + H, 3 : 3 + W].reshape(T * H * W, -1).numpy()
        cos, sin = rope_cos_sin(
            head_dim, T, H, W, jnp.array([2, 1, 3]), base=100.0,
            num_registers=0, order="reference",
        )
        np.testing.assert_allclose(np.asarray(cos), np.cos(want), atol=1e-5)
        np.testing.assert_allclose(np.asarray(sin), np.sin(want), atol=1e-5)

    def test_matched_order_is_hwt(self):
        head_dim = 32
        T, H, W = 2, 3, 4
        cos_ref, _ = rope_cos_sin(head_dim, T, H, W, jnp.zeros(3, jnp.int32),
                                  order="reference")
        cos_m, _ = rope_cos_sin(head_dim, T, H, W, jnp.zeros(3, jnp.int32),
                                order="matched")
        # token (h, w, t) with t fastest ↔ table row t*H*W + h*W + w
        ref_grid = np.asarray(cos_ref).reshape(T, H, W, -1)
        got = np.asarray(cos_m).reshape(H, W, T, -1)
        np.testing.assert_allclose(got, ref_grid.transpose(1, 2, 0, 3), atol=0)

    def test_registers_identity(self):
        cos, sin = rope_cos_sin(32, 2, 2, 2, jnp.zeros(3, jnp.int32),
                                num_registers=4)
        np.testing.assert_allclose(np.asarray(cos[:4]), 1.0)
        np.testing.assert_allclose(np.asarray(sin[:4]), 0.0)

    def test_apply_rotary_matches_torch(self):
        """apply_rotary == reference apply_rotary_emb (model.py:266-275)."""
        torch = torch_ref()
        rng = np.random.RandomState(0)
        x = rng.randn(2, 3, 10, 16).astype(np.float32)
        cos, sin = rope_cos_sin(16, 1, 2, 5, jnp.zeros(3, jnp.int32))

        xt = torch.tensor(x)
        c = torch.tensor(np.asarray(cos))[None, None]
        s = torch.tensor(np.asarray(sin))[None, None]
        d = 8
        x1, x2 = xt[..., :d], xt[..., d:]
        want = torch.cat([x1 * c + x2 * s, -x1 * s + x2 * c], 3).numpy()

        got = np.asarray(apply_rotary(jnp.array(x), cos, sin))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_inv_freq_lengths(self):
        inv_s, inv_t = rope_inv_freqs(128)
        assert inv_s.shape == (16,)
        assert inv_t.shape == (32,)
