"""Benchmark: DiT training step regimes on the real TPU chip.

Default (driver mode, no args) mirrors the reference's implicit baseline —
run_debug.sh's per-device config (batch 8/rank, width 512, depth 24,
head_dim 128; `/root/reference/run_debug.sh:12-25`) measured with the same
semantics as its per-10-step average fwd+bwd step timer
(`train.py:441-451`) — and reports latent tokens/sec/chip + MFU
(BASELINE.md north star: MFU >= 50%). Two JSON lines: the production
odd-frame shape first, the canonical headline LAST (drivers parse the
final line).

Opt-in modes (round-3 VERDICT next #5 — make the north-star numbers
driver-verifiable through ONE harness instead of PERFORMANCE.md prose):

  python bench.py --xl        # DiT-XL 2.8B FULL step on one chip via the
                              # production optimizer-in-backward path
                              # (--optimizer_in_backward in train.py)
  python bench.py --longctx   # L=8208 full step (latent [16,16,64,64])
  python bench.py --sampling  # demo-config end-to-end sampling: 2.76B
                              # DiT, 50 Euler steps fused-2B CFG, 512x512,
                              # 61 frames + chunked causal Cosmos decode

All modes run the SAME production `build_train_step` the Trainer/CLI use
and emit the same JSON schema:
{"metric", "value", "unit", "vs_baseline", ...extras}, vs_baseline =
MFU / 0.50 (the north-star target).
"""

import json
import sys
import time


def main():
    import jax

    # persistent compile cache: the unrolled 24-block program is slow to
    # compile through this image's remote-compile tunnel; cache it across runs
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from video_diffusion_speedrun_tpu.core.config import (
        DiTConfig, MeshConfig, OptimizerConfig, TrainConfig,
    )
    from video_diffusion_speedrun_tpu.parallel.mesh import build_mesh
    from video_diffusion_speedrun_tpu.train.step import build_train_step
    from video_diffusion_speedrun_tpu.utils.flops import (
        dit_train_flops, peak_flops_for,
    )

    n_dev = len(jax.devices())
    device_kind = jax.devices()[0].device_kind

    def measure(model, metric, B_per_chip, T, H, W, LC, optimizer,
                windows=(5, 25), trials=3, config_extra=""):
        B, C = B_per_chip * n_dev, model.in_channels
        cfg = TrainConfig(
            model=model,
            mesh=MeshConfig(replica=1, fsdp=n_dev, tensor=1),
            optimizer=optimizer,
            batch_size=B,
            max_steps=5004,
            seed=0,
        )
        mesh = build_mesh(cfg.mesh)
        init_fn, train_step, _, _ = build_train_step(cfg, mesh)
        state = init_fn(jax.random.PRNGKey(0))

        batch = {
            "latent": jax.random.normal(jax.random.PRNGKey(1),
                                        (B, C, T, H, W), jnp.bfloat16),
            "context": jax.random.normal(
                jax.random.PRNGKey(2),
                (B, LC, model.cross_attn_input_size), jnp.bfloat16),
        }
        rng = jax.random.PRNGKey(3)

        # Timing methodology: the TPU tunnel in this image makes
        # block_until_ready unreliable and per-new-program dispatch
        # expensive, so we (a) warm every program including the scalar
        # readback, then (b) time two window sizes that both end in the
        # same host readback and difference them — fixed dispatch/readback
        # latency cancels, leaving pure per-step device time. The param
        # element read forces the full optimizer chain (the loss alone
        # depends only on the forward).
        def run(n_steps, state, rng):
            for _ in range(n_steps):
                state, metrics = train_step(state, batch, rng)
            leaf = jax.tree.leaves(state.params)[0]
            float(leaf[(0,) * leaf.ndim])
            return state, rng, float(metrics["loss"])

        state, rng, loss = run(3, state, rng)  # compile + warm

        k_small, k_big = windows
        # min each window size independently over `trials`, THEN
        # difference: jitter can only inflate a window, so min() is the
        # clean estimate of each; differencing per-trial then min()-ing
        # would bias dt low when noise lands in a small window
        t_smalls, t_bigs = [], []
        for _ in range(trials):
            t0 = time.perf_counter()
            state, rng, loss = run(k_small, state, rng)
            t_smalls.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            state, rng, loss = run(k_big, state, rng)
            t_bigs.append(time.perf_counter() - t0)
        dt = (min(t_bigs) - min(t_smalls)) / (k_big - k_small)

        # odd T floor-crops to the patch multiple (train/loss.py) — count
        # the tokens/FLOPs the step actually computes
        Tc = T // model.time_patch_size * model.time_patch_size
        tokens_per_sample = (Tc // 2) * (H // 2) * (W // 2)
        tokens_per_sec_per_chip = B * tokens_per_sample / dt / n_dev
        flops = dit_train_flops(model, B, Tc, H, W, LC)
        mfu = flops / dt / (peak_flops_for(device_kind) * n_dev)
        return {
            "metric": metric,
            "value": round(tokens_per_sec_per_chip, 1),
            "unit": "latent_tokens/s/chip",
            "vs_baseline": round(mfu / 0.5, 4),  # vs the 50%-MFU target
            "mfu": round(mfu, 4),
            "step_time_ms": round(dt * 1000, 2),
            "device_kind": device_kind,
            "n_devices": n_dev,
            "config": (f"width{model.hidden_size}_depth{model.depth}_"
                       f"head{model.hidden_size // model.num_heads}_"
                       f"batch{B_per_chip}perchip_latent{C}x{T}x{H}x{W}"
                       + config_extra),
            "loss": loss,
        }

    canonical = DiTConfig(
        # canonical speedrun config (run_debug.sh): width 512, depth 24,
        # head 128. unrolled blocks + no remat measure ~1.65x faster than
        # scan+remat on this config (scripts/perf_ablate.py); memory fits
        # comfortably at width 512. Larger models flip remat back on.
        in_channels=16, patch_size=2, time_patch_size=2, hidden_size=512,
        depth=24, num_heads=4, cross_attn_input_size=4096, residual_v=True,
        train_bias_and_rms=False, scan_blocks=False, remat=False,
    )
    adamw = OptimizerConfig(learning_rate=2 ** -6, scheduler="linear")

    if "--xl" in sys.argv[1:]:
        # DiT-XL (2.8B) FULL train step on ONE chip: bf16 params +
        # optimizer-in-backward (block grads never materialize) + bf16
        # momentum + factored second moments — the north-star regime
        # (PERFORMANCE.md "XL FULL step"); a standard value_and_grad step
        # RESOURCE_EXHAUSTs ("Used 21.28G of 15.75G"). Exactly the config
        # `python train.py --model_width 2048 --model_depth 24
        #  --optimizer_in_backward true --nu_factored true
        #  --param_dtype bf16 --moments_dtype bf16` launches.
        xl = DiTConfig(
            in_channels=16, patch_size=2, time_patch_size=2,
            hidden_size=2048, depth=24, num_heads=16,
            cross_attn_input_size=4096, residual_v=True,
            train_bias_and_rms=False, scan_blocks=True, remat=True,
            remat_policy="nothing", param_dtype=jnp.bfloat16,
        )
        opt = OptimizerConfig(
            learning_rate=2 ** -6, scheduler="linear",
            moments_dtype=jnp.bfloat16, in_backward=True, nu_factored=True,
        )
        # B=16 is the headline batch (PERFORMANCE.md "XL FULL step": B=2
        # measures 38.2%, B=8 49.1%, B=16 50.7% — arithmetic intensity)
        print(json.dumps(measure(
            xl, "dit_xl_fullstep_tokens_per_sec_per_chip", 16, 8, 32, 32,
            512, opt, windows=(2, 8),
            config_extra="_inloop_bf16mu_factorednu")), flush=True)
        return

    if "--longctx" in sys.argv[1:]:
        # L=8208 full step (latent [16,16,64,64] -> 8·32·32 tokens + 16
        # registers): blocked flash path, no remat (remat=attn measured
        # WORSE here — 39.2% vs 44.2%, PERFORMANCE.md "DiT-level
        # long-context"), bf16-stored Adam moments (the HBM lever that
        # lets the B=2 full step fit)
        opt = OptimizerConfig(learning_rate=2 ** -6, scheduler="linear",
                              moments_dtype=jnp.bfloat16)
        print(json.dumps(measure(
            canonical,
            "dit_longctx_fullstep_tokens_per_sec_per_chip", 2, 16, 64, 64,
            512, opt, windows=(2, 8),
            config_extra="_bf16moments")), flush=True)
        return

    if "--sampling" in sys.argv[1:]:
        _sampling_bench(device_kind, n_dev)
        return

    # production odd-frame shape first (the real 17-frame 256px Cosmos row
    # is latent [16,5,32,32] — floor-crop path, round-2 VERDICT weak #5);
    # the canonical headline prints LAST so drivers parsing the final line
    # keep the comparable metric. Per-chip batch 16 here: L=528 has low
    # arithmetic intensity, so the dataset shape wants a bigger batch than
    # the canonical L=1040 proxy (B=8 measured 49.1%, B=16 59.2%, B=24
    # 62.0%; 248M params leave ample HBM) — B=16 is the production choice
    # (global batch 128 on a v5e-8, same 8×16 the reference's 8-GPU node
    # could not fit without grad_accum).
    print(json.dumps(measure(
        canonical, "dit_train_tokens_per_sec_per_chip", 16, 5, 32, 32,
        512, adamw)), flush=True)
    print(json.dumps(measure(
        canonical, "dit_train_tokens_per_sec_per_chip", 8, 8, 32, 32,
        512, adamw)), flush=True)


def _sampling_bench(device_kind, n_dev):
    """End-to-end demo-config sampling (BASELINE.md row 3) as one JSON line:
    2.76B DiT (sampling/sample.py:42-53 analog), 50 Euler steps with the
    fused 2-batch CFG forward, 512×512 × 16 latent frames → 61 output
    frames, then the chunked causal Cosmos decode (random weights — timing
    only). The reference publishes no sampling rate (BASELINE.md), so
    vs_baseline is frames/s over this repo's own round-1 figure
    (1.33 f/s, PERFORMANCE.md end-to-end table)."""
    import time

    import jax
    import jax.numpy as jnp

    from video_diffusion_speedrun_tpu.core.config import (
        DiTConfig, SamplingConfig,
    )
    from video_diffusion_speedrun_tpu.models.cosmos_vae import (
        CosmosDecoderConfig, decode_video, init_cosmos_decoder,
    )
    from video_diffusion_speedrun_tpu.models.dit import init_dit
    from video_diffusion_speedrun_tpu.sampling.euler import (
        euler_cfg_sample, initial_latents,
    )

    steps, frames = 50, 16
    model_cfg = DiTConfig(
        in_channels=16, patch_size=2, time_patch_size=2, hidden_size=2048,
        depth=24, num_heads=16, cross_attn_input_size=4096,
        residual_v=True, train_bias_and_rms=False,
        scan_blocks=True, remat=False,
    )
    scfg = SamplingConfig(inference_steps=steps, cfg_scale=6.0, height=512,
                          width=512, num_latent_frames=frames, seed=42)
    params = jax.jit(
        lambda k: init_dit(k, model_cfg, 0.1, dtype=jnp.bfloat16)
    )(jax.random.PRNGKey(0))
    context = jax.random.normal(jax.random.PRNGKey(1), (1, 512, 4096),
                                jnp.bfloat16) * 0.05
    latents0 = initial_latents(jax.random.PRNGKey(2), scfg)
    dec_cfg = CosmosDecoderConfig()
    dec = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                       init_cosmos_decoder(jax.random.PRNGKey(3), dec_cfg))

    def run():
        lat = euler_cfg_sample(params, model_cfg, latents0, context,
                               num_steps=steps, cfg_scale=6.0)
        out = decode_video(dec, dec_cfg, lat.astype(jnp.bfloat16),
                           chunk_frames=2, context_frames=2)
        return float(out.ravel()[0].astype(jnp.float32))

    def _timed(fn, n):
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        return time.perf_counter() - t0

    run()  # compile + warm (sampler and decoder programs)
    # min-over-trials per window like measure(): a single host hiccup in
    # either window would skew (or even sign-flip) the difference
    # (code-review finding, round 4). Two trials per window — each run is
    # ~40 s of device time, and min-of-2 already discards one-sided jitter.
    t1 = min(_timed(run, 1) for _ in range(2))
    t2 = min(_timed(run, 2) for _ in range(2))
    dt = t2 - t1  # single run net of fixed dispatch
    n_frames = 4 * (frames - 1) + 1
    print(json.dumps({
        "metric": "demo_sampling_frames_per_sec",
        "value": round(n_frames / dt, 3),
        "unit": "output_frames/s",
        "vs_baseline": round(n_frames / dt / 1.33, 4),
        # self-referential on purpose: the reference publishes no sampling
        # rate, so the only honest denominator is this repo's own round-1
        # figure — label it IN the artifact so drivers can't over-read it
        "baseline": "repo round-1 1.33 f/s (reference publishes none)",
        "end_to_end_s": round(dt, 2),
        "device_kind": device_kind,
        "n_devices": n_dev,
        "config": "width2048_depth24_cfg6_steps50_512x512_61frames_decode",
    }), flush=True)


if __name__ == "__main__":
    main()
