"""Cross-framework sampler trajectory parity vs the ACTUAL torch reference.

Round-4 VERDICT next #6: the sampler tests compared only against this
repo's own two-forward loop. Here the reference `generate_image` sampling
loop (`/root/reference/sampling/sample.py:107-146`) is ported verbatim
into the test — driving the actual `/root/reference/model.py` DiT with two
sequential forwards (cond, zero-embedding uncond), the α=8 time shift on
both t and t_next, and the fp32 accumulator — and its per-step latent
trajectory is compared against `euler_cfg_sample`'s (fused-2B CFG, scanned
trajectory, precomputed context-KV) from the SAME converted weights, noise
and schedule. rope_order="reference" so positions match the torch RoPE
permutation; torch.randint is pinned to zero crop offsets on the torch
side and our side runs jitter-free (both frameworks at offset 0).

Covers: CFG (zero-uncond branch) per-step trajectory + the no-CFG branch's
final latents, fp32 both sides.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_diffusion_speedrun_tpu.core.config import DiTConfig
from video_diffusion_speedrun_tpu.models.convert import torch_dit_to_params
from video_diffusion_speedrun_tpu.sampling import euler

REFERENCE = "/root/reference"
B, C, T, H, W, LC, CTX = 1, 4, 4, 8, 8, 5, 32
STEPS, CFG_SCALE, ALPHA = 8, 6.0, 8.0

CFG = DiTConfig(
    in_channels=C, patch_size=2, time_patch_size=2, hidden_size=64, depth=2,
    num_heads=2, cross_attn_input_size=CTX, residual_v=True,
    train_bias_and_rms=True, rope_order="reference", attention_impl="xla",
    compute_dtype=jnp.float32, remat=False,
)


@pytest.fixture(scope="module")
def torch_side():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE)
    try:
        import model as ref_mod
    finally:
        sys.path.remove(REFERENCE)

    torch.manual_seed(3)
    model = ref_mod.DiT(
        in_channels=C, patch_size=2, time_patch_size=2, hidden_size=64,
        depth=2, num_heads=2, cross_attn_input_size=CTX, residual_v=True,
        train_bias_and_rms=True,
    ).eval()
    state0 = {k: v.clone() for k, v in model.state_dict().items()}
    gen = torch.Generator().manual_seed(11)
    lat0 = torch.randn(B, C, T, H, W, generator=gen)
    ctx = torch.randn(B, LC, CTX, generator=gen)
    return torch, model, state0, lat0, ctx


def _torch_trajectory(torch, model, lat0, ctx, cfg_scale):
    """The generate_image loop (`sample.py:107-146`), fp32, offsets pinned."""
    prompt_embeds = ctx
    negative_embeds = torch.zeros_like(ctx)
    latents = lat0.clone()
    acc = latents.float()
    orig_randint = torch.randint
    torch.randint = lambda *a, **k: torch.zeros((1,), dtype=torch.long)
    trajectory = []
    try:
        with torch.no_grad():
            for i in range(STEPS, 0, -1):
                t = i / STEPS
                t_next = (i - 1) / STEPS
                t = t * ALPHA / (1 + (ALPHA - 1) * t)
                t_next = t_next * ALPHA / (1 + (ALPHA - 1) * t_next)
                dt = t - t_next
                tv = torch.tensor([t] * B)
                out = model(latents, prompt_embeds, tv)
                if cfg_scale > 1:
                    unc = model(latents, negative_embeds, tv)
                    out = unc + cfg_scale * (out - unc)
                acc = acc + dt * out.float()
                latents = acc.clone()
                trajectory.append(acc.numpy().copy())
    finally:
        torch.randint = orig_randint
    return trajectory


def _jax_trajectory(params, lat0, ctx, cfg_scale):
    """euler internals chunked one step at a time to expose the trajectory;
    the final element is asserted equal to the public euler_cfg_sample."""
    ts, dts = euler.schedule(STEPS, ALPHA)
    acc = jnp.asarray(lat0, jnp.float32)
    ckv = None
    if CFG.cross_attn_input_size is not None:
        ctx2 = (jnp.concatenate([ctx, jnp.zeros_like(ctx)], 0)
                if cfg_scale > 1 else ctx)
        from video_diffusion_speedrun_tpu.models.dit import (
            precompute_context_kv,
        )

        ckv = precompute_context_kv(params, CFG, ctx2)
    traj = []
    jrng = jax.random.PRNGKey(0)
    for i in range(STEPS):
        acc, jrng = euler._euler_chunk(
            params, CFG, acc, ckv, ts[i:i + 1], dts[i:i + 1], jrng,
            cfg_scale=cfg_scale, lat_dtype=jnp.float32, use_jitter=False,
            token_sharding=None)
        traj.append(np.asarray(acc))
    return traj


class TestSamplerCrossFrameworkParity:
    def test_cfg_trajectory_matches_reference(self, torch_side):
        torch, model, state0, lat0, ctx = torch_side
        want = _torch_trajectory(torch, model, lat0, ctx, CFG_SCALE)
        params = torch_dit_to_params(state0, CFG)
        got = _jax_trajectory(params, lat0.numpy(), jnp.asarray(ctx.numpy()),
                              CFG_SCALE)
        for i, (g, w) in enumerate(zip(got, want)):
            np.testing.assert_allclose(g, w, rtol=2e-4, atol=2e-4,
                                       err_msg=f"step {i}")
        # public API end-to-end equals the per-step capture
        final = euler.euler_cfg_sample(
            params, CFG, jnp.asarray(lat0.numpy(), jnp.float32),
            jnp.asarray(ctx.numpy()), num_steps=STEPS, cfg_scale=CFG_SCALE,
            alpha=ALPHA)
        np.testing.assert_allclose(np.asarray(final), got[-1], rtol=1e-6,
                                   atol=1e-6)

    def test_nocfg_final_matches_reference(self, torch_side):
        torch, model, state0, lat0, ctx = torch_side
        want = _torch_trajectory(torch, model, lat0, ctx, cfg_scale=1.0)
        params = torch_dit_to_params(state0, CFG)
        final = euler.euler_cfg_sample(
            params, CFG, jnp.asarray(lat0.numpy(), jnp.float32),
            jnp.asarray(ctx.numpy()), num_steps=STEPS, cfg_scale=1.0,
            alpha=ALPHA)
        np.testing.assert_allclose(np.asarray(final), want[-1], rtol=2e-4,
                                   atol=2e-4)
