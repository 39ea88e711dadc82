"""Rectified-flow training loss.

Semantics of the reference's shared train/eval step
(`/root/reference/train.py:51-145`):
- caption dropout: each sample's context zeroed with prob 0.01 for CFG
  (`train.py:86-87`)
- logit-normal timesteps t = sigmoid(N(0,1)), then time-shift toward noise
  t ← tα/(1+(α−1)t) with α=8 (`train.py:90-96`)
- interpolant z_t = x·(1−t) + noise·t, velocity target v = x − noise
  (`train.py:115-117`)
- per-sample MSE over (C,T,H,W) in fp32, then batch mean (`train.py:121-125`)

Pure function of (params, batch, rng) — noise/t/dropout/rope-offset randomness
all threaded through one JAX key (the reference leaves train-time RNG unseeded
and global, SURVEY.md §Quirks; here determinism is the default).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from video_diffusion_speedrun_tpu.core.config import DiTConfig
from video_diffusion_speedrun_tpu.models.dit import dit_forward


def time_shift(t: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """t ← tα/(1+(α−1)t) — shifts sampling density toward noise (`train.py:95-96`)."""
    return t * alpha / (1 + (alpha - 1) * t)


def sample_timesteps(rng: jax.Array, batch: int, alpha: float) -> jnp.ndarray:
    """Logit-normal t with time shift (`train.py:90-96`), fp32."""
    z = jax.random.normal(rng, (batch,), jnp.float32)
    t = jax.nn.sigmoid(z)
    return time_shift(t, alpha)


def rectified_flow_loss(
    params,
    cfg: DiTConfig,
    latent: jnp.ndarray,
    context: jnp.ndarray,
    rng: jax.Array,
    *,
    alpha: float = 8.0,
    caption_dropout: float = 0.01,
    timesteps: Optional[jnp.ndarray] = None,
    noise: Optional[jnp.ndarray] = None,
    rope_offsets: Optional[jnp.ndarray] = None,
    token_sharding=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Returns (loss, aux). Pass explicit `timesteps`/`noise` for fixture-driven
    parity tests (the CAPTURE_INPUT analog, `train.py:98-101`)."""
    t_rng, noise_rng, drop_rng, rope_rng = jax.random.split(rng, 4)
    b = latent.shape[0]
    # floor-crop to patch multiples (Cosmos latents have 1+4k — odd — frames;
    # strided patchify drops the remainder, so the target must too)
    _, _, t_len, h_len, w_len = latent.shape
    pt, p = cfg.time_patch_size, cfg.patch_size
    latent = latent[:, :, : t_len // pt * pt, : h_len // p * p,
                    : w_len // p * p]
    latent = latent.astype(cfg.compute_dtype)

    if timesteps is None:
        timesteps = sample_timesteps(t_rng, b, alpha)
    if noise is None:
        noise = jax.random.normal(noise_rng, latent.shape, cfg.compute_dtype)

    if context is not None:
        # bf16 like the reference (`train.py:84`); also prevents fp32 context
        # from promoting the whole residual stream under mixed precision
        context = context.astype(cfg.compute_dtype)
    if caption_dropout > 0 and context is not None:
        drop = jax.random.uniform(drop_rng, (b,)) < caption_dropout
        context = jnp.where(drop[:, None, None], 0.0, context)

    tr = timesteps.astype(cfg.compute_dtype).reshape(b, 1, 1, 1, 1)
    z_t = latent * (1 - tr) + noise * tr
    v_objective = latent - noise

    out = dit_forward(
        params, cfg, z_t, context, timesteps,
        rng=rope_rng if rope_offsets is None else None,
        rope_offsets=rope_offsets, token_sharding=token_sharding,
    )

    err = v_objective.astype(jnp.float32) - out.astype(jnp.float32)
    loss_per_sample = jnp.mean(jnp.square(err), axis=(1, 2, 3, 4))
    loss = jnp.mean(loss_per_sample)

    # timestep-decile bins — the working version of the reference's dead
    # binning code (`train.py:127-137`, commented out there; logged as zeros).
    tbin = jnp.clip((timesteps * 10).astype(jnp.int32), 0, 9)
    bin_sums = jax.ops.segment_sum(loss_per_sample, tbin, num_segments=10)
    bin_counts = jax.ops.segment_sum(jnp.ones_like(loss_per_sample), tbin,
                                     num_segments=10)

    aux = {
        "loss_per_sample": loss_per_sample,
        "timesteps": timesteps,
        "bin_sums": bin_sums,
        "bin_counts": bin_counts,
    }
    return loss, aux
