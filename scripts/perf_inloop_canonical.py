"""Canonical config (248M) with the optimizer-in-backward step.

The standard canonical step spends ~8 ms of ~85 ms in the fused muP-AdamW
update after the backward (round-2 NOTES #2: ~2.5 ms of that is per-leaf
scheduling). train/inloop.py overlaps each block's HBM-bound update with
the next block's MXU-bound backward inside one reverse scan — measured
here at the canonical shape to see if it claims that tail (round-2
VERDICT next #6: push the canonical bench past 55%).

  python scripts/perf_inloop_canonical.py [batch ...]
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from video_diffusion_speedrun_tpu.core.config import (
        DiTConfig, OptimizerConfig,
    )
    from video_diffusion_speedrun_tpu.models.dit import init_dit, param_count
    from video_diffusion_speedrun_tpu.train.inloop import build_inloop_step
    from video_diffusion_speedrun_tpu.utils.flops import (
        dit_train_flops, peak_flops_for,
    )

    device_kind = jax.devices()[0].device_kind
    peak = peak_flops_for(device_kind)
    C, T, H, W = 16, 8, 32, 32
    LC = 512

    def measure(batch):
        cfg = DiTConfig(
            in_channels=16, patch_size=2, time_patch_size=2,
            hidden_size=512, depth=24, num_heads=4,
            cross_attn_input_size=4096, residual_v=True,
            train_bias_and_rms=False,
            scan_blocks=False, remat=False,
        )
        params = init_dit(jax.random.PRNGKey(0), cfg, 0.1,
                          dtype=jnp.bfloat16)
        n_params = param_count(params)
        # fp32 moments — same numerics as the standard canonical step
        ocfg = OptimizerConfig(learning_rate=2 ** -6, scheduler="linear")
        init_opt, step_fn, _ = build_inloop_step(
            cfg, ocfg, jax.eval_shape(lambda: params), max_steps=5004,
        )
        opt = jax.jit(init_opt)(params)

        lat = jax.random.normal(jax.random.PRNGKey(1), (batch, C, T, H, W),
                                jnp.bfloat16)
        ctx = jax.random.normal(jax.random.PRNGKey(2), (batch, LC, 4096),
                                jnp.bfloat16)
        step = jax.jit(step_fn, donate_argnums=(0, 1))
        rngs = [jax.random.PRNGKey(100 + i) for i in range(16)]

        p, o = params, opt
        p, o, l, _ = step(p, o, lat, ctx, rngs[0])  # compile
        float(l)

        def run(n, p, o):
            for i in range(n):
                p, o, l, _ = step(p, o, lat, ctx, rngs[i % 16])
            float(jnp.asarray(o.count)); float(l)
            return p, o, l

        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); p, o, _ = run(5, p, o)
            ta = time.perf_counter() - t0
            t0 = time.perf_counter(); p, o, l = run(25, p, o)
            tb = time.perf_counter() - t0
            best = min(best, (tb - ta) / 20)
        flops = dit_train_flops(cfg, batch, T, H, W, LC)
        mfu = flops / best / peak
        toks = batch * (T // 2) * (H // 2) * (W // 2) / best
        print(f"CANONICAL-INLOOP 512x24 ({n_params/1e6:.0f}M) B={batch} "
              f"{best*1000:8.2f} ms/step  MFU {mfu*100:5.1f}%  "
              f"{toks:,.0f} tok/s  loss {float(l):.3f}", flush=True)
        return mfu

    batches = [int(a) for a in sys.argv[1:]] or [8]
    for b in batches:
        try:
            measure(b)
        except Exception as e:
            print(f"CANONICAL-INLOOP B={b}: FAILED "
                  f"({type(e).__name__}: {str(e)[:400]})", flush=True)


if __name__ == "__main__":
    main()
