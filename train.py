"""Training CLI — flag-compatible with the reference entry point
(`/root/reference/train.py:148-212`), plus TPU-specific knobs (mesh axes,
dataset selection, remat/attention impl).

Examples:
  # tiny smoke on whatever devices exist (synthetic data, random context)
  python train.py --max_steps 20 --model_width 256 --model_depth 4 \
      --dataset synthetic

  # canonical speedrun config (run_debug.sh analog)
  python train.py --batch_size 64 --learning_rate 0.015625 --max_steps 5004 \
      --evaluate_every 500 --model_width 512 --model_depth 24 \
      --model_head_dim 128 --lr_scheduler_type linear
"""

import sys

import click

sys.path.insert(0, ".")

from video_diffusion_speedrun_tpu.core.config import (  # noqa: E402
    DataConfig,
    DiTConfig,
    MeshConfig,
    OptimizerConfig,
    TrainConfig,
)


@click.command()
@click.option("--num_epochs", type=int, default=2)
@click.option("--batch_size", type=int, default=64,
              help="GLOBAL batch (the reference flag is per-rank)")
@click.option("--learning_rate", type=float, default=1e-4)
@click.option("--max_steps", type=int, default=10000)
@click.option("--evaluate_every", type=int, default=20)
@click.option("--log_every", type=int, default=10)
@click.option("--run_name", type=str, default="diffusion_repa")
@click.option("--model_width", type=int, default=512)
@click.option("--model_depth", type=int, default=9)
@click.option("--model_head_dim", type=int, default=128)
@click.option("--optimizer_type", type=str, default="mup_adam")
@click.option("--lr_scheduler_type", type=str, default="cosine")
@click.option("--train_bias_and_rms", type=bool, default=False)
@click.option("--init_std_factor", type=float, default=0.1)
@click.option("--project_name", type=str, default="test_diffusion_test")
@click.option("--return_index", type=int, default=-8,
              help="T5 hidden-state index")
@click.option("--load_checkpoint", type=str, default=None)
@click.option("--rope_order",
              type=click.Choice(["auto", "matched", "reference"]),
              default="auto",
              help="RoPE table token order; 'auto' = 'reference' when "
                   "--load_checkpoint is a torch reference checkpoint "
                   "(whose weights assume the (t,h,w) quirk), else 'matched'")
# --- TPU-native extras (no reference equivalent) ---
@click.option("--dataset", type=click.Choice(["synthetic", "cosmos_openvid"]),
              default="synthetic")
@click.option("--hf_name", type=str, default="fal/cosmos-openvid-1m",
              help="HF dataset name, or a local parquet file/dir with the "
                   "same columns (scripts/make_data_fixture.py) for offline "
                   "end-to-end rehearsal")
@click.option("--cache_dir", type=str, default="./cache",
              help="HF datasets cache dir (reference train.py cache_dir)")
@click.option("--synthetic_rows", type=int, default=4096,
              help="synthetic train-split row count")
@click.option("--synthetic_t_choices", type=str, default="",
              help="comma-separated latent frame counts for variable-length "
                   "synthetic clips (enables shape bucketing), e.g. 5,9,17")
@click.option("--mesh_replica", type=int, default=1)
@click.option("--mesh_fsdp", type=int, default=-1)
@click.option("--mesh_context", type=int, default=1,
              help="sequence-parallel axis size")
@click.option("--mesh_tensor", type=int, default=1)
@click.option("--use_t5", type=bool, default=False,
              help="encode captions with the JAX T5 (needs local weights)")
@click.option("--embeddings_dir", type=str, default=None,
              help="dir of shard_*.npy + manifest.json from "
                   "scripts/precompute_embeddings.py "
                   "(per-split subdirs or flat); rows get offline context "
                   "and no per-step T5 encode runs")
@click.option("--seed", type=int, default=0)
@click.option("--wandb", "use_wandb", type=bool, default=False)
@click.option("--grad_accum", type=int, default=1,
              help="gradient accumulation microbatches per step")
@click.option("--allow_random_context", type=bool, default=False,
              help="permit random stand-in context embeddings when no "
                   "prompt encoder is configured (smoke runs only)")
@click.option("--scan_blocks", type=bool, default=True,
              help="lax.scan over blocks (False=unrolled: ~1.5x faster, "
                   "slower compile, more memory)")
@click.option("--remat", type=bool, default=True,
              help="gradient checkpointing (False at small scale is faster)")
@click.option("--remat_policy", type=click.Choice(
                  ["nothing", "dots", "attn", "dots_attn"]),
              default="nothing",
              help="what the checkpointed backward may reuse: 'dots' saves "
                   "matmul outputs; 'attn' saves the flash kernel's o/lse "
                   "(skips the O(L²) recompute — the long-context policy); "
                   "'dots_attn' both")
@click.option("--optimizer_in_backward", type=bool, default=False,
              help="fuse the muP-AdamW update into the backward's reverse "
                   "scan (train/inloop.py): block grads never materialize "
                   "as a tree — the regime that fits a 2.8B FULL step on "
                   "one 16 GB chip. Net-slower below XL scale "
                   "(PERFORMANCE.md). With --grad_accum N the per-block "
                   "backward is chunked (identical numerics)")
@click.option("--nu_factored", type=bool, default=False,
              help="with --optimizer_in_backward: store large 2-D block "
                   "second moments rank-1 (Adafactor factored nu, momentum "
                   "exact) — nu HBM drops from O(params) to O(rows+cols)")
@click.option("--param_dtype", type=click.Choice(["fp32", "bf16"]),
              default="fp32",
              help="parameter storage dtype. bf16 halves param HBM (the XL "
                   "one-chip regime stores params bf16; FSDP pods keep "
                   "fp32 masters like the reference MixedPrecisionPolicy)")
@click.option("--context_dim", type=int, default=4096,
              help="cross-attention context width — both the model's "
                   "cross_attn_input_size and the loader's context dim "
                   "(4096 = T5-XXL; smoke-encoder embeddings are 64)")
@click.option("--checkpoint_dir", type=str, default="checkpoints",
              help="orbax checkpoint root (run subdir = --run_name)")
@click.option("--moments_dtype", type=click.Choice(["fp32", "bf16"]),
              default="fp32",
              help="Adam moment STORAGE dtype (math stays fp32). bf16 "
                   "halves optimizer HBM — what lets the XL one-chip and "
                   "L=8208 B=2 full steps fit; slightly slower at small "
                   "scale (PERFORMANCE.md)")
@click.option("--platform", type=str, default=None,
              help="force a jax platform (e.g. 'cpu' for the virtual-device "
                   "sim; this image's sitecustomize ignores JAX_PLATFORMS)")
def main(num_epochs, batch_size, learning_rate, max_steps, evaluate_every,
         log_every, run_name, model_width, model_depth, model_head_dim, optimizer_type,
         lr_scheduler_type, train_bias_and_rms, init_std_factor, project_name,
         return_index, load_checkpoint, rope_order, dataset, hf_name,
         cache_dir, synthetic_rows,
         synthetic_t_choices,
         mesh_replica,
         mesh_fsdp, mesh_context, mesh_tensor, use_t5, embeddings_dir, seed,
         use_wandb, grad_accum, allow_random_context, scan_blocks, remat,
         remat_policy, optimizer_in_backward, nu_factored, param_dtype,
         context_dim, checkpoint_dir, moments_dtype, platform):
    if optimizer_type != "mup_adam":
        raise click.BadParameter(f"unknown optimizer type: {optimizer_type}")
    if param_dtype == "bf16" and not optimizer_in_backward:
        # With the standard optimizer, bf16 params would also be the Adam
        # MASTER weights (and, when --moments_dtype is unset, the moment
        # storage): updates below a bf16 ulp of the weight silently vanish.
        # bf16 param storage is the XL one-chip enabler and only the
        # in-backward step pairs it with fp32-math updates; FSDP pods keep
        # fp32 masters like the reference MixedPrecisionPolicy
        # (/root/reference/train.py:323-325).
        raise click.BadParameter(
            "--param_dtype bf16 requires --optimizer_in_backward true "
            "(bf16 masters under the standard optimizer silently round "
            "away small updates; use --moments_dtype bf16 to halve "
            "optimizer HBM instead)")
    if platform is not None:
        import jax

        jax.config.update("jax_platforms", platform)

    import jax.numpy as jnp  # after the optional platform override above

    if rope_order == "auto":
        from video_diffusion_speedrun_tpu.train.checkpoint import (
            is_torch_reference_checkpoint,
        )

        rope_order = "matched"
        if load_checkpoint and is_torch_reference_checkpoint(load_checkpoint):
            rope_order = "reference"
            click.echo(
                "note: torch reference checkpoint -> rope_order='reference' "
                "(its weights assume the (t,h,w) RoPE table order)"
            )

    model = DiTConfig(
        in_channels=16, patch_size=2, time_patch_size=2,
        hidden_size=model_width, depth=model_depth,
        num_heads=model_width // model_head_dim, mlp_ratio=4.0,
        cross_attn_input_size=context_dim, residual_v=True,
        train_bias_and_rms=train_bias_and_rms, use_rope=True,
        rope_order=rope_order, scan_blocks=scan_blocks, remat=remat,
        remat_policy=remat_policy,
        param_dtype=(jnp.bfloat16 if param_dtype == "bf16" else jnp.float32),
    )
    cfg = TrainConfig(
        model=model,
        mesh=MeshConfig(replica=mesh_replica, fsdp=mesh_fsdp,
                        context=mesh_context, tensor=mesh_tensor),
        data=DataConfig(
            dataset=dataset,
            hf_name=hf_name,
            cache_dir=cache_dir,
            synthetic_rows=synthetic_rows,
            synthetic_t_choices=tuple(
                int(t) for t in synthetic_t_choices.split(",") if t
            ),
            bucket_by_shape=bool(synthetic_t_choices),
            allow_random_context=allow_random_context,
            embeddings_dir=embeddings_dir,
            context_dim=context_dim,
        ),
        optimizer=OptimizerConfig(
            learning_rate=learning_rate, scheduler=lr_scheduler_type,
            moments_dtype=(jnp.bfloat16 if moments_dtype == "bf16" else None),
            in_backward=optimizer_in_backward, nu_factored=nu_factored,
        ),
        num_epochs=num_epochs, batch_size=batch_size, max_steps=max_steps,
        grad_accum=grad_accum,
        evaluate_every=evaluate_every, run_name=run_name,
        project_name=project_name, seed=seed,
        init_std_factor=init_std_factor, t5_return_index=return_index,
        load_checkpoint=load_checkpoint, wandb=use_wandb,
        log_every=log_every, checkpoint_dir=checkpoint_dir,
    )

    prompt_encoder = None
    if use_t5:
        from video_diffusion_speedrun_tpu.text.encoder import load_encoder

        prompt_encoder = load_encoder()

    from video_diffusion_speedrun_tpu.train.loop import Trainer

    Trainer(cfg, prompt_encoder=prompt_encoder).train()


if __name__ == "__main__":
    main()
