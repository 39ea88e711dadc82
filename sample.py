"""Sampling CLI — the `generate_image` pipeline (`/root/reference/sampling/
sample.py:77-159`) as a command: checkpoint → T5 encode → jitted Euler+CFG →
Cosmos decode → video file. The browser UI lives in
video_diffusion_speedrun_tpu/sampling/app.py (streamlit, optional).

Example:
  python sample.py --prompt "a mountain range in fog" --checkpoint ckpts/run3 \
      --inference_steps 50 --cfg_scale 6.0 --height 512 --width 512 --seed 42
"""

import sys

import click

sys.path.insert(0, ".")


@click.command()
@click.option("--prompt", type=str, required=True)
@click.option("--checkpoint", type=str, default=None,
              help="orbax dir, torch DCP dir, or .pt (reference ckpt)")
@click.option("--inference_steps", type=int, default=50)
@click.option("--cfg_scale", type=float, default=6.0)
@click.option("--height", type=int, default=512)
@click.option("--width", type=int, default=512)
@click.option("--num_latent_frames", type=int, default=16)
@click.option("--seed", type=int, default=42)
@click.option("--model_width", type=int, default=2048)
@click.option("--model_depth", type=int, default=24)
@click.option("--model_head_dim", type=int, default=128)
@click.option("--return_index", type=int, default=-1,
              help="T5 hidden-state index (sampling default -1, sample.py:93)")
@click.option("--rope_order",
              type=click.Choice(["auto", "matched", "reference"]),
              default="auto",
              help="RoPE table token order; 'auto' = 'reference' for torch "
                   "reference checkpoints, else 'matched'")
@click.option("--decoder_weights", type=str, default=None,
              help="converted Cosmos decoder .npz (scripts/convert_cosmos.py); "
                   "without it the decoder runs with RANDOM weights")
@click.option("--output", type=str, default="./output")
@click.option("--name", type=str, default="test")
@click.option("--random_weights", is_flag=True,
              help="skip checkpoint/T5 (smoke-test the pipeline)")
@click.option("--mesh_context", type=int, default=1,
              help="context-parallel axis: shard every DiT forward's token "
                   "axis over this many chips (ring attention) — long "
                   "videos whose activations exceed one chip's HBM")
@click.option("--steps_per_call", type=int, default=None,
              help="split the Euler trajectory into chunks of this many "
                   "steps per device program (identical numerics); use for "
                   "long videos where one 50-step program would run past "
                   "the TPU runtime's ~1-2 min execution watchdog")
@click.option("--context_dim", type=int, default=4096,
              help="cross-attention context width (must match the trained "
                   "model; 4096 = T5-XXL)")
@click.option("--smoke_encoder", is_flag=True,
              help="encode the prompt with a tiny RANDOM-INIT T5 + "
                   "byte-fallback tokenizer (no FLUX weights needed) — "
                   "drives the real checkpoint→encode→sample→decode "
                   "pipeline offline; embeddings are garbage")
def main(prompt, checkpoint, inference_steps, cfg_scale, height, width,
         num_latent_frames, seed, model_width, model_depth, model_head_dim,
         return_index, rope_order, decoder_weights, output, name,
         random_weights, mesh_context, steps_per_call, context_dim,
         smoke_encoder):
    import jax
    import jax.numpy as jnp

    from video_diffusion_speedrun_tpu.core.config import (
        DiTConfig, SamplingConfig,
    )
    from video_diffusion_speedrun_tpu.models.cosmos_vae import (
        CosmosDecoderConfig, init_cosmos_decoder, load_decoder_params,
    )
    from video_diffusion_speedrun_tpu.models.dit import init_dit
    from video_diffusion_speedrun_tpu.sampling.decode import (
        save_latents_to_video,
    )
    from video_diffusion_speedrun_tpu.sampling.euler import generate_latents
    from video_diffusion_speedrun_tpu.train.checkpoint import (
        is_torch_reference_checkpoint,
    )

    if rope_order == "auto":
        rope_order = (
            "reference"
            if checkpoint and is_torch_reference_checkpoint(checkpoint)
            else "matched"
        )
        if rope_order == "reference":
            click.echo(
                "note: torch reference checkpoint -> rope_order='reference' "
                "(its weights assume the (t,h,w) RoPE table order)"
            )

    # demo-model architecture (`sampling/sample.py:42-53`)
    model_cfg = DiTConfig(
        in_channels=16, patch_size=2, time_patch_size=2,
        hidden_size=model_width, depth=model_depth,
        num_heads=model_width // model_head_dim, mlp_ratio=4.0,
        cross_attn_input_size=context_dim, residual_v=True,
        train_bias_and_rms=False, rope_order=rope_order,
    )
    sampling = SamplingConfig(
        inference_steps=inference_steps, cfg_scale=cfg_scale, height=height,
        width=width, num_latent_frames=num_latent_frames, seed=seed,
    )

    if random_weights or checkpoint is None:
        click.echo("using RANDOM weights (smoke mode)")
        params = init_dit(jax.random.PRNGKey(0), model_cfg, 0.1)
        context = jax.random.normal(jax.random.PRNGKey(1),
                                    (1, 512, context_dim),
                                    jnp.bfloat16) * 0.05
    else:
        from video_diffusion_speedrun_tpu.text.encoder import load_encoder
        from video_diffusion_speedrun_tpu.train.checkpoint import (
            is_orbax_checkpoint,
            load_reference_checkpoint,
            restore_params_for_inference,
        )

        if is_orbax_checkpoint(checkpoint):
            # model_cfg validates tree structure + shapes at restore time
            params = restore_params_for_inference(checkpoint, model_cfg)
        else:  # torch reference checkpoint (DCP dir or .pt)
            params = load_reference_checkpoint(checkpoint, model_cfg)
        if smoke_encoder:
            from video_diffusion_speedrun_tpu.text.t5 import T5Config

            click.echo("smoke encoder: tiny RANDOM T5 (embeddings are "
                       "garbage — pipeline exercise only)")
            tiny = T5Config(d_model=context_dim, d_kv=16, d_ff=128,
                            num_layers=2, num_heads=4)
            encoder = load_encoder(cfg=tiny, allow_random_init=True)
        else:
            encoder = load_encoder()
        context = encoder([prompt], return_index=return_index)

    token_sharding = None
    if mesh_context > 1:
        from jax.sharding import NamedSharding

        from video_diffusion_speedrun_tpu.core.config import MeshConfig
        from video_diffusion_speedrun_tpu.parallel.mesh import (
            build_mesh, token_pspec,
        )

        mesh = build_mesh(MeshConfig(replica=1, fsdp=-1,
                                     context=mesh_context, tensor=1))
        token_sharding = NamedSharding(mesh, token_pspec())
        click.echo(f"context-parallel sampling over {mesh.shape}")

    click.echo(f"sampling {inference_steps} steps, cfg {cfg_scale} ...")
    latents = generate_latents(params, model_cfg, context, sampling,
                               token_sharding=token_sharding,
                               steps_per_call=steps_per_call)
    if token_sharding is not None:
        # gather the mesh-sharded trajectory result to one device before the
        # (single-device) decoder program — feeding it the sharded array
        # would make XLA reshard inside the decode jit
        import numpy as np

        latents = jax.device_put(np.asarray(latents))
    click.echo(f"latents {latents.shape}, std {float(latents.std()):.3f}")

    decoder_cfg = CosmosDecoderConfig()
    if decoder_weights is not None:
        decoder_params = load_decoder_params(decoder_weights, decoder_cfg)
        click.echo(f"loaded Cosmos decoder weights from {decoder_weights}")
    else:
        click.echo(
            "WARNING: no --decoder_weights given — decoding with RANDOM "
            "Cosmos decoder weights; the output video will be noise. Convert "
            "the pretrained decoder with scripts/convert_cosmos.py first."
        )
        decoder_params = init_cosmos_decoder(jax.random.PRNGKey(2), decoder_cfg)
    path = save_latents_to_video(
        latents[0].astype(jnp.bfloat16), decoder_params, decoder_cfg,
        output, name,
    )
    click.echo(f"wrote {path}")


if __name__ == "__main__":
    main()
