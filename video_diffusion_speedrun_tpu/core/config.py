"""Configuration dataclasses.

Replaces the reference's click-CLI flags (`/root/reference/train.py:148-193`) and its
hardcoded constants (time-shift alpha=8 `train.py:95`, warmup=20 `train.py:349`,
caption-dropout 0.01 `train.py:86`, 16 register tokens `model.py:316`, AdamW betas
(0.95, 0.99) `train.py:342`) with explicit, serializable config objects.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional

import jax.numpy as jnp


@dataclass(frozen=True)
class DiTConfig:
    """Video DiT architecture config.

    Mirrors the constructor surface of the reference DiT
    (`/root/reference/model.py:278-316`) plus TPU-specific execution knobs.
    """

    in_channels: int = 16
    patch_size: int = 2
    time_patch_size: int = 2
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    # None disables cross attention entirely (reference `model.py:68-79`).
    cross_attn_input_size: Optional[int] = 4096
    residual_v: bool = False
    # Gates trainable RMSNorm scales AND q/kv biases (reference quirk:
    # `model.py:61-62,69-73` — the single `qkv_bias` flag controls both).
    train_bias_and_rms: bool = True
    use_rope: bool = True
    num_registers: int = 16

    # 3D RoPE table extents and base (reference `model.py:310-311`, base=100
    # `model.py:192-193`).
    rope_base: float = 100.0
    rope_max_t: int = 128
    rope_max_h: int = 128
    rope_max_w: int = 128
    # Token-order mode for the RoPE position table:
    #   "matched":   positions flattened (h, w, t) — matches the patchify token
    #                order "b c t h w -> b (h w t) c" (`model.py:185`). Clean mode.
    #   "reference": positions flattened (t, h, w) — reproduces the reference's
    #                coordinate-permutation quirk (`model.py:239-240`), where each
    #                token gets a consistent but geometrically scrambled position.
    rope_order: str = "matched"
    # Max sequence length for learned positional embedding when use_rope=False
    # (reference `model.py:314`).
    max_tokens_no_rope: int = 2048

    # --- TPU execution knobs (no reference equivalent) ---
    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16
    # "auto" → Pallas flash attention on TPU, XLA attention elsewhere.
    attention_impl: str = "auto"  # auto | pallas | xla
    # "auto" → fused AdaLN+RMSNorm Pallas kernel on TPU (ops/fused_adaln.py),
    # plain XLA composition elsewhere.
    fused_adaln: str = "auto"  # auto | pallas | off
    # gated-residual+norm join fusion (gated_residual_adaln): lower device
    # self-time but net-slower on the canonical config (pipeline bubbles,
    # PERFORMANCE.md) — off by default, available for bandwidth-bound regimes
    fused_residual: bool = False
    scan_blocks: bool = True
    remat: bool = True
    # remat policy: "nothing" (recompute all) | "dots" (save matmul outputs —
    # cheaper backward, more activation memory) | "attn" (save only the flash
    # kernel outputs o/lse — skips the O(L²) kernel recompute for a few MB
    # per block; the long-context policy) | "dots_attn" (both)
    remat_policy: str = "nothing"

    def __post_init__(self):
        if self.hidden_size % self.num_heads != 0:
            raise ValueError("hidden_size must be divisible by num_heads")
        if self.head_dim % 4 != 0:
            raise ValueError("head_dim must be divisible by 4 for 3D RoPE")
        if self.rope_order not in ("matched", "reference"):
            raise ValueError(f"unknown rope_order: {self.rope_order}")
        # typo'd impls must fail loudly, not silently train on the slow XLA
        # path (models/dit.py falls back to XLA for anything non-pallas)
        if self.attention_impl not in ("auto", "pallas", "xla"):
            raise ValueError(f"unknown attention_impl: {self.attention_impl}")
        if self.fused_adaln not in ("auto", "pallas", "off"):
            raise ValueError(f"unknown fused_adaln: {self.fused_adaln}")
        if self.remat_policy not in ("nothing", "dots", "attn", "dots_attn"):
            raise ValueError(f"unknown remat_policy: {self.remat_policy}")

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def out_channels(self) -> int:
        return self.in_channels

    @property
    def mlp_hidden(self) -> int:
        return int(self.hidden_size * self.mlp_ratio)

    @property
    def patch_dim(self) -> int:
        """Flattened input-patch feature size (c, pt, p, p ordering)."""
        return self.in_channels * self.time_patch_size * self.patch_size * self.patch_size

    @property
    def out_patch_dim(self) -> int:
        """Flattened output-patch feature size (p1, p2, p3, c ordering —
        reference unpatchify `model.py:392-401`)."""
        return self.patch_size * self.patch_size * self.time_patch_size * self.out_channels

    def replace(self, **kw) -> "DiTConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True, kw_only=True)
class MeshConfig:
    """Device-mesh axes. Mirrors the reference 3-axis mesh
    (dp_replicate, dp_shard, tp) (`/root/reference/model.py:475-498`) without its
    world-size-1 NameError bug (`model.py:489`).

    Axis semantics:
      replica — pure data-parallel replicas (DCN axis on multi-slice).
      fsdp    — ZeRO-3 parameter sharding (ICI axis).
      context — sequence (context) parallelism over the spatiotemporal token
                axis — a capability beyond the reference (SURVEY.md §2b: SP/CP
                absent there).
      tensor  — tensor parallelism over attention heads / MLP hidden.
    Any axis may be 1. ``replica * fsdp * context * tensor`` must equal the
    device count; -1 for at most one axis means "use all remaining devices".
    """

    replica: int = 1
    fsdp: int = -1
    context: int = 1
    tensor: int = 1

    def resolve(self, n_devices: int) -> "MeshConfig":
        sizes = {"replica": self.replica, "fsdp": self.fsdp,
                 "context": self.context, "tensor": self.tensor}
        unknown = [k for k, v in sizes.items() if v == -1]
        if len(unknown) > 1:
            raise ValueError("at most one mesh axis may be -1")
        if unknown:
            known = 1
            for k, v in sizes.items():
                if v != -1:
                    known *= v
            if n_devices % known != 0:
                raise ValueError(
                    f"cannot infer {unknown[0]}: {n_devices} devices not divisible "
                    f"by {known}"
                )
            sizes[unknown[0]] = n_devices // known
        total = (sizes["replica"] * sizes["fsdp"] * sizes["context"]
                 * sizes["tensor"])
        if total != n_devices:
            raise ValueError(
                f"mesh {sizes} = {total} devices != available {n_devices}"
            )
        return MeshConfig(**sizes)


@dataclass(frozen=True)
class DataConfig:
    """Dataset / loader config (reference `sharded_dataset.py`, `utils.py:18-35`)."""

    dataset: str = "synthetic"  # synthetic | cosmos_openvid
    hf_name: str = "fal/cosmos-openvid-1m"
    cache_dir: str = "./cache"
    # Reference split arithmetic (`sharded_dataset.py:18-19`): first half of
    # 1,979,810 rows; last 40 rows of that half are the test split.
    total_rows: int = 1_979_810
    test_rows: int = 40
    num_workers: int = 8
    prefetch: int = 2
    shuffle_seed: int = 0
    # synthetic train-split row count (test split uses test_rows)
    synthetic_rows: int = 4096
    # Synthetic-latent shape [C, T, H, W] (Cosmos CV4x8x8 latents of 17-frame
    # 256px clips are [16, 5, 32, 32]).
    synthetic_shape: tuple = (16, 5, 32, 32)
    # variable-length clips: extra T values mixed into the synthetic stream
    # (e.g. (5, 9, 17) ≈ 17/33/65-frame clips); requires bucket_by_shape
    synthetic_t_choices: tuple = ()
    # group rows by latent shape so mixed-length clips form uniform batches
    # (the reference collate crashes on mixed shapes, `utils.py:22`)
    bucket_by_shape: bool = False
    caption_tokens: int = 512
    context_dim: int = 4096
    # permit random stand-in context for non-synthetic datasets without a
    # prompt encoder (smoke runs only; a silent fallback burned real runs)
    allow_random_context: bool = False
    # directory of shard_*.npz files from scripts/precompute_embeddings.py;
    # when set, rows arrive with `context` pre-joined (the "precomputed"
    # tier of the trainer's context priority chain) and no per-step T5
    # encode runs (reference cost: `train.py:77-84` every step)
    embeddings_dir: Optional[str] = None


@dataclass(frozen=True)
class OptimizerConfig:
    """muP AdamW config (reference `train.py:335-364`, `model.py:404-465`)."""

    learning_rate: float = 1e-4
    weight_decay: float = 1e-1  # `train.py:337`
    beta1: float = 0.95
    beta2: float = 0.99
    eps: float = 1e-8
    # lr multiplier applied to bias/norm/lambda params (`model.py:407`).
    no_decay_lr_mult: float = 0.01
    # Adam moment storage dtype: None = param dtype (fp32 production);
    # jnp.bfloat16 halves optimizer HBM (XL one-chip regime). Moment MATH
    # always runs fp32 with cast-out storage (train/optim.py).
    moments_dtype: Any = None
    # optimizer-in-backward (train/inloop.py): fuse the muP-AdamW update
    # into a hand-rolled reverse scan so each block's gradients exist for
    # one iteration only — the regime that fits a 2.8B FULL step on one
    # 16 GB chip (a standard value_and_grad step cannot; PERFORMANCE.md
    # "XL FULL step"). Net-slower below XL scale (measured-and-rejected at
    # width 512); no reference equivalent (its FSDP shards the same memory
    # across GPUs instead, `model.py:512-542`).
    in_backward: bool = False
    # with in_backward: store 2-D block second moments rank-1 (Adafactor
    # factored nu, momentum exact — PaLM-style), dropping nu HBM from
    # O(params) to O(rows+cols). Leaves smaller than nu_factored_min_size
    # keep exact nu.
    nu_factored: bool = False
    nu_factored_min_size: int = 1 << 20
    # names treated as embedding-like constants (`train.py:287`).
    constant_param_classes: tuple = ("patch_proj", "context_kv", "positional_embedding")
    # "time"/"modulation" lr override factor (`model.py:447-450`).
    time_modulation_lr_mult: float = 0.1
    # matrix rule base width (`model.py:433-436`): lr*32/dim, wd*dim/1024.
    mup_base_width: int = 32
    mup_wd_width: int = 1024
    scheduler: str = "cosine"  # cosine | linear | constant
    warmup_steps: int = 20  # hardcoded in reference `train.py:349`


@dataclass(frozen=True)
class TrainConfig:
    """Top-level training config — the reference CLI surface
    (`/root/reference/train.py:148-212`) plus TPU additions."""

    model: DiTConfig = field(default_factory=DiTConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    data: DataConfig = field(default_factory=DataConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)

    num_epochs: int = 2
    batch_size: int = 64  # global batch (reference batch_size is per-rank)
    # microbatching: split each batch into N sequential grad-accumulation
    # steps (beyond the reference — lets big models train at small memory)
    grad_accum: int = 1
    max_steps: int = 10_000
    evaluate_every: int = 20
    eval_batches: int = 9  # reference breaks at batch_idx == 8 (`train.py:542`)
    run_name: str = "diffusion_repa"
    project_name: str = "test_diffusion_test"
    seed: int = 0
    init_std_factor: float = 0.1  # ×2D-param init scale (`train.py:246-251`)
    # rectified-flow constants
    time_shift_alpha: float = 8.0  # `train.py:95`
    caption_dropout: float = 0.01  # `train.py:86`
    # T5 hidden-state index (`train.py:186`); sampling uses -1.
    t5_return_index: int = -8
    load_checkpoint: Optional[str] = None
    checkpoint_dir: str = "checkpoints"
    log_every: int = 10
    wandb: bool = False
    # dump (latent, context, timesteps) at step 0 to test_data/ — the
    # reference's CAPTURE_INPUT fixture mechanism (`train.py:40,98-101`)
    capture_fixtures: bool = False
    # compute+log grad_norm each step (costs a full pass over the grad tree;
    # the reference logs only loss/lr, `train.py:468-477`)
    log_grad_norm: bool = False
    # call jax.distributed.initialize() (multi-host pods)
    distributed: bool = False


@dataclass(frozen=True)
class SamplingConfig:
    """Euler+CFG sampler config (reference `sampling/sample.py:77-171`)."""

    inference_steps: int = 50
    cfg_scale: float = 6.0
    height: int = 512
    width: int = 512
    num_latent_frames: int = 16
    seed: int = 42
    time_shift_alpha: float = 8.0
