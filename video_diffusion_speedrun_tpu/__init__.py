"""video_diffusion_speedrun_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video-diffusion
pretraining + sampling framework.

Re-designed from scratch for TPU with the capabilities of the
fal-ai-community/video-diffusion-speedrun reference (see SURVEY.md):

- ``models``   — pure-functional video DiT (3D patchify, 3D RoPE, AdaLN, value
  residual), T5 text encoder, Cosmos CV4x8x8 video-VAE decoder.
- ``ops``      — TPU compute primitives: Pallas flash attention, patchify as
  reshape+matmul (MXU-friendly), fp32 RMSNorm, timestep embeddings.
- ``parallel`` — device mesh (replica × fsdp × tensor), FSDP parameter-sharding
  rules, collective helpers. Multi-chip via ``jax.sharding`` + GSPMD.
- ``train``    — rectified-flow loss, muP per-parameter AdamW (optax), LR
  schedules, jitted+donated train step, orbax checkpointing.
- ``data``     — Cosmos-latent dataset (torch-free deserializer), per-host
  sharded loading, device prefetch, synthetic generators.
- ``sampling`` — jitted Euler + CFG sampler, VAE decode, mp4 writer.
"""

__version__ = "0.1.0"

from video_diffusion_speedrun_tpu.core.config import (  # noqa: F401
    DiTConfig,
    MeshConfig,
    TrainConfig,
)
