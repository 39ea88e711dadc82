"""Jitted Euler + CFG rectified-flow sampler.

Semantics of the reference sampler (`/root/reference/sampling/sample.py:
77-159`): timesteps i = N…1 with the α=8 shift applied to both t and t_next
(`sample.py:127-137`), guidance `uncond + s·(cond − uncond)` with
zero-embedding uncond matching the 1% train caption dropout
(`sample.py:100-104,139-142`), fp32 accumulator with bf16 model inputs
(`sample.py:115,145-146`), seeded initial noise
`[B, 16, frames, 2·(H//16), 2·(W//16)]` (`sample.py:108-114`).

TPU-first differences:
- the whole trajectory is ONE compiled program (`lax.scan` over steps);
- cond and uncond run as a single batched forward (2B) per step instead of
  two sequential model calls (`sample.py:139-141`) — same FLOPs, better MXU
  occupancy and half the kernel launches;
- RoPE crop-jitter is OFF by default for deterministic sampling; pass
  `rope_jitter_rng` to re-enable per-step jitter. Note one deliberate
  difference from the reference (which re-jitters on every forward,
  *including* between the cond/uncond branches of one step — SURVEY.md
  §Quirks #2): the batched 2B forward draws ONE offset per step, shared by
  cond and uncond, so the reference's divergent-offset CFG trajectories
  are not bit-reproducible here (a fixed bias of its quirk, like
  rope_order="matched").
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from video_diffusion_speedrun_tpu.core.config import DiTConfig, SamplingConfig
from video_diffusion_speedrun_tpu.models.dit import (
    dit_forward,
    precompute_context_kv,
)
from video_diffusion_speedrun_tpu.models.rope import random_rope_offsets
from video_diffusion_speedrun_tpu.train.loss import time_shift


def initial_latents(rng: jax.Array, cfg: SamplingConfig,
                    channels: int = 16, dtype=jnp.bfloat16) -> jnp.ndarray:
    """[1, C, frames, 2·(H//16), 2·(W//16)] seeded gaussian (`sample.py:109-114`)."""
    shape = (1, channels, cfg.num_latent_frames,
             2 * (cfg.height // 16), 2 * (cfg.width // 16))
    return jax.random.normal(rng, shape, dtype)


def schedule(num_steps: int, alpha: float):
    """(t_i, dt_i) arrays for i = N…1 with the α shift (`sample.py:127-137`)."""
    i = jnp.arange(num_steps, 0, -1, dtype=jnp.float32)
    t = time_shift(i / num_steps, alpha)
    t_next = time_shift((i - 1) / num_steps, alpha)
    return t, t - t_next


@functools.partial(
    jax.jit, static_argnames=("model_cfg", "cfg_scale", "lat_dtype",
                              "use_jitter", "token_sharding")
)
def _euler_chunk(
    params,
    model_cfg: DiTConfig,
    acc0: jnp.ndarray,
    ckv,
    ts: jnp.ndarray,
    dts: jnp.ndarray,
    jrng0: jax.Array,
    *,
    cfg_scale: float,
    lat_dtype,
    use_jitter: bool,
    token_sharding=None,
):
    """scan a slice of the trajectory; one compiled program serves every
    equal-length slice (ts/dts are runtime arrays)."""
    b = acc0.shape[0]
    do_cfg = cfg_scale > 1.0

    def step(carry, inputs):
        acc, jrng = carry
        t, dt = inputs
        lat = acc.astype(lat_dtype)
        tvec = jnp.full((b,), t, jnp.float32)

        if use_jitter:
            jrng, r1 = jax.random.split(jrng)
        else:
            r1 = None

        if do_cfg:
            # batched cond+uncond forward (one 2B model call per step)
            x2 = jnp.concatenate([lat, lat], axis=0)
            t2 = jnp.concatenate([tvec, tvec], axis=0)
            out2 = dit_forward(params, model_cfg, x2, None, t2, rng=r1,
                               context_kv=ckv, token_sharding=token_sharding)
            cond, uncond = jnp.split(out2, 2, axis=0)
            out = uncond.astype(jnp.float32) + cfg_scale * (
                cond.astype(jnp.float32) - uncond.astype(jnp.float32)
            )
        else:
            out = dit_forward(params, model_cfg, lat, None, tvec,
                              rng=r1, context_kv=ckv,
                              token_sharding=token_sharding,
                              ).astype(jnp.float32)

        acc = acc + dt * out
        return (acc, jrng), None

    (acc, jrng), _ = jax.lax.scan(step, (acc0, jrng0), (ts, dts))
    return acc, jrng


def euler_cfg_sample(
    params,
    model_cfg: DiTConfig,
    latents: jnp.ndarray,
    context: jnp.ndarray,
    *,
    num_steps: int = 50,
    cfg_scale: float = 6.0,
    alpha: float = 8.0,
    rope_jitter_rng: Optional[jax.Array] = None,
    token_sharding=None,
    steps_per_call: Optional[int] = None,
) -> jnp.ndarray:
    """Run the full Euler trajectory; returns fp32 latents (the accumulator).

    `latents` [B, C, T, h, w] (bf16 typical), `context` [B, Lc, ctx_dim]
    (the conditional embedding; the uncond branch is zeros, `sample.py:104`).

    `token_sharding` (NamedSharding over [B, L, D], hashable → static)
    context-parallelizes every DiT forward of the trajectory over the
    mesh's `context` axis (ring attention) — long videos whose activations
    exceed one chip sample across the pod. Beyond the reference (its
    sampler is single-GPU, `sample.py:139-141`).

    `steps_per_call` splits the trajectory into several invocations of one
    compiled chunk program (identical numerics — the accumulator and
    jitter rng carry across chunks). Use when a single device program
    would run for minutes: some TPU runtimes watchdog-kill executions at
    the ~1-2 minute mark (a 121-frame-class 512p 50-step trajectory at
    2.8B is ~2 s/step = ~100 s in one program). Default None = whole
    trajectory as one program.
    """
    ts, dts = schedule(num_steps, alpha)
    acc = latents.astype(jnp.float32)
    do_cfg = cfg_scale > 1.0

    # the context is constant across the whole trajectory: project each
    # layer's cross-attention K/V once instead of per step (the reference
    # reprojects in all 2×50 forwards, `sample.py:139-141`)
    ckv = None
    if model_cfg.cross_attn_input_size is not None:
        if do_cfg:
            ctx2 = jnp.concatenate([context, jnp.zeros_like(context)], axis=0)
            ckv = precompute_context_kv(params, model_cfg, ctx2)
        else:
            ckv = precompute_context_kv(params, model_cfg, context)

    jrng = (rope_jitter_rng if rope_jitter_rng is not None
            else jax.random.PRNGKey(0))
    common = dict(cfg_scale=cfg_scale, lat_dtype=latents.dtype,
                  use_jitter=rope_jitter_rng is not None,
                  token_sharding=token_sharding)
    spc = num_steps if steps_per_call is None else max(1, steps_per_call)
    for lo in range(0, num_steps, spc):
        hi = min(lo + spc, num_steps)
        acc, jrng = _euler_chunk(params, model_cfg, acc, ckv,
                                 ts[lo:hi], dts[lo:hi], jrng, **common)
    return acc


def generate_latents(
    params,
    model_cfg: DiTConfig,
    context: jnp.ndarray,
    sampling: SamplingConfig,
    rng: Optional[jax.Array] = None,
    token_sharding=None,
    steps_per_call: Optional[int] = None,
) -> jnp.ndarray:
    """Convenience wrapper: seeded init noise → sampled fp32 latents
    (the `generate_image` core, `sample.py:77-159`, minus T5/decoding)."""
    rng = jax.random.PRNGKey(sampling.seed) if rng is None else rng
    latents = initial_latents(rng, sampling, channels=model_cfg.in_channels)
    return euler_cfg_sample(
        params, model_cfg, latents, context,
        num_steps=sampling.inference_steps, cfg_scale=sampling.cfg_scale,
        alpha=sampling.time_shift_alpha, token_sharding=token_sharding,
        steps_per_call=steps_per_call,
    )
