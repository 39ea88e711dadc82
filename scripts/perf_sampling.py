"""End-to-end sampling benchmark — the demo config (`/root/reference/
sampling/sample.py:42-53,166-171`): 2048-wide/24-deep DiT, 50 Euler steps
with CFG 6 (fused 2B forward), 512×512, 16 latent frames → 61 output frames,
plus the Cosmos decode. Reports DiT-sampling frames/sec and decode time."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main(width=2048, depth=24, steps=50, height=512, width_px=512, frames=16,
         steps_per_call=None):
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from video_diffusion_speedrun_tpu.core.config import (
        DiTConfig, SamplingConfig,
    )
    from video_diffusion_speedrun_tpu.models.cosmos_vae import (
        CosmosDecoderConfig, init_cosmos_decoder,
    )
    from video_diffusion_speedrun_tpu.models.dit import init_dit, param_count
    from video_diffusion_speedrun_tpu.sampling.euler import (
        euler_cfg_sample, initial_latents,
    )

    model_cfg = DiTConfig(
        in_channels=16, patch_size=2, time_patch_size=2, hidden_size=width,
        depth=depth, num_heads=width // 128, cross_attn_input_size=4096,
        residual_v=True, train_bias_and_rms=False,
        scan_blocks=True, remat=False,  # inference: no remat; scan for compile
    )
    scfg = SamplingConfig(inference_steps=steps, cfg_scale=6.0, height=height,
                          width=width_px, num_latent_frames=frames, seed=42)

    params = jax.jit(
        lambda k: init_dit(k, model_cfg, 0.1, dtype=jnp.bfloat16)
    )(jax.random.PRNGKey(0))
    print(f"model: {param_count(params)/1e9:.2f}B params", flush=True)
    context = jax.random.normal(jax.random.PRNGKey(1), (1, 512, 4096),
                                jnp.bfloat16) * 0.05
    latents = initial_latents(jax.random.PRNGKey(2), scfg)

    def run():
        out = euler_cfg_sample(params, model_cfg, latents, context,
                               num_steps=steps, cfg_scale=6.0,
                               steps_per_call=steps_per_call)
        return float(out.ravel()[0])

    t0 = time.perf_counter(); run()
    print(f"compile+first sample: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter(); run()
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); run(); run()
    t2 = (time.perf_counter() - t0)
    dt = t2 - t1  # single-run time net of dispatch
    n_frames = 4 * (frames - 1) + 1
    print(f"sampling ({steps} steps, CFG): {dt:.2f} s → "
          f"{n_frames/dt:.2f} frames/s (DiT only)", flush=True)

    # decode (random decoder weights — timing only)
    dec_cfg = CosmosDecoderConfig()
    dec = init_cosmos_decoder(jax.random.PRNGKey(3), dec_cfg)
    dec = jax.tree.map(lambda x: x.astype(jnp.bfloat16), dec)
    from video_diffusion_speedrun_tpu.models.cosmos_vae import decode_video
    lat_b = latents.astype(jnp.bfloat16)

    def decode():
        out = decode_video(dec, dec_cfg, lat_b, chunk_frames=2,
                           context_frames=2)
        return float(out.ravel()[0].astype(jnp.float32))

    t0 = time.perf_counter()
    _ = decode()
    print(f"decode compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    _ = decode()
    ddt = time.perf_counter() - t0
    print(f"decode: {ddt:.2f} s → end-to-end {n_frames/(dt+ddt):.2f} frames/s",
          flush=True)


if __name__ == "__main__":
    # argv: [frames [height width_px [steps [steps_per_call]]]] — e.g.
    # `32 512 512 50 10` is the 125-output-frame long-video shape
    # (L = 16*32*32 = 16384+16 tokens), chunked 10 steps/program (one
    # un-chunked 50-step program runs ~100 s at this shape and trips the
    # runtime's execution watchdog)
    import sys as _sys

    _a = [int(x) for x in _sys.argv[1:]]
    kw = {}
    if len(_a) >= 1:
        kw["frames"] = _a[0]
    if len(_a) >= 3:
        kw["height"], kw["width_px"] = _a[1], _a[2]
    if len(_a) >= 4:
        kw["steps"] = _a[3]
    if len(_a) >= 5:
        kw["steps_per_call"] = _a[4]
    main(**kw)
