"""Streamlit demo — the `/root/reference/sampling/sample.py:162-228` analog.

Run:  streamlit run video_diffusion_speedrun_tpu/sampling/app.py
(streamlit is optional and not in the TPU image; `sample.py` at the repo
root is the headless equivalent.)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    import streamlit as st

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

    st.title("Video DiT Generation (TPU)")

    st.sidebar.header("Generation Settings")
    inference_steps = st.sidebar.slider("Inference Steps", 10, 100, 50)
    cfg_scale = st.sidebar.slider("CFG Scale", 1.0, 20.0, 6.0)
    seed = st.sidebar.number_input("Seed", 0, 1000000, 42)
    height = st.sidebar.number_input("Height", 128, 1024, 512)
    width = st.sidebar.number_input("Width", 128, 1024, 512)
    checkpoint = st.sidebar.text_input("Checkpoint path", "")
    decoder_weights = st.sidebar.text_input(
        "Cosmos decoder weights (.npz)", "",
        help="converted with scripts/convert_cosmos.py; empty = random "
             "weights (output is noise)",
    )

    prompt = st.text_area("Enter your prompt:", height=100)

    @st.cache_resource
    def init_models(ckpt: str, dec_npz: str):
        # reference-trained weights assume the (t,h,w) RoPE table order
        model_cfg = DiTConfig(
            in_channels=16, patch_size=2, time_patch_size=2,
            hidden_size=2048, depth=24, num_heads=16, mlp_ratio=4.0,
            cross_attn_input_size=4096, residual_v=True,
            train_bias_and_rms=False,
            rope_order="reference" if ckpt else "matched",
        )
        if ckpt:
            from video_diffusion_speedrun_tpu.text.encoder import load_encoder
            from video_diffusion_speedrun_tpu.train.checkpoint import (
                load_reference_checkpoint,
            )

            params = load_reference_checkpoint(ckpt, model_cfg)
            encoder = load_encoder()
        else:
            params = init_dit(jax.random.PRNGKey(0), model_cfg, 0.1)
            encoder = None
        dec_cfg = CosmosDecoderConfig()
        if dec_npz:
            dec_params = load_decoder_params(dec_npz, dec_cfg)
        else:
            st.warning(
                "No Cosmos decoder weights given — decoding with RANDOM "
                "weights; the output video will be noise."
            )
            dec_params = init_cosmos_decoder(jax.random.PRNGKey(2), dec_cfg)
        return model_cfg, params, encoder, dec_cfg, dec_params

    if st.button("Generate"):
        if not prompt:
            st.warning("Please enter a prompt.")
            return
        with st.spinner("Generating..."):
            model_cfg, params, encoder, dec_cfg, dec_params = init_models(
                checkpoint, decoder_weights)
            if encoder is not None:
                context = encoder([prompt], return_index=-1)
            else:
                context = jax.random.normal(
                    jax.random.PRNGKey(1), (1, 512, 4096), jnp.bfloat16
                ) * 0.05
            sampling = SamplingConfig(
                inference_steps=inference_steps, cfg_scale=cfg_scale,
                height=int(height), width=int(width), seed=int(seed),
            )
            latents = generate_latents(params, model_cfg, context, sampling)
            out = save_latents_to_video(
                latents[0].astype(jnp.bfloat16), dec_params, dec_cfg,
                "./output", "test",
            )
        if out.endswith(".mp4"):
            st.video(out)
        else:
            st.write(f"wrote frames to {out}")


if __name__ == "__main__":
    main()
