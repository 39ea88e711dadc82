"""XL (2.8B) FULL training step — loss + backward + fused muP-AdamW — on
one chip (round-2 VERDICT next #1: the 64.8% XL headline was loss+backward
only; the north-star regime is DiT-XL *training*).

A standard value_and_grad step CANNOT fit: bf16 params+mu+nu is already
15.45 GiB and the materialized grad tree adds 5.8 GiB against 15.75 GiB of
v5e HBM (measured: "Used 21.28G of 15.75G"). This script therefore runs the
optimizer-in-backward step (train/inloop.py): each block's grads exist only
for one reverse-scan iteration, and the 2-D second moments are
factored rank-1 (Adafactor-style; tracking-tested in tests/test_inloop.py;
8-bit storage was measured and rejected — v5e emulates fp8 casts and pays
a ~400 ms int8 relayout) — peak = p(5.15 GiB) + mu(5.15) + nu(~0) + one
block's grads + the saved per-block input stack.

  python scripts/perf_xl_fullstep.py [batch ...]
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
    LC = 4096

    def measure(batch):
        cfg = DiTConfig(
            in_channels=16, patch_size=2, time_patch_size=2,
            hidden_size=2048, depth=24, num_heads=16,
            cross_attn_input_size=LC, residual_v=True,
            train_bias_and_rms=False,
            scan_blocks=True, remat=True, remat_policy="nothing",
        )
        params = init_dit(jax.random.PRNGKey(0), cfg, 0.1,
                          dtype=jnp.bfloat16)
        n_params = param_count(params)
        ocfg = OptimizerConfig(learning_rate=1e-4, scheduler="constant",
                               warmup_steps=2, moments_dtype=jnp.bfloat16)
        init_opt, step_fn, _ = build_inloop_step(
            cfg, ocfg, jax.eval_shape(lambda: params), max_steps=100000,
            nu_factored=True,
        )
        opt = jax.jit(init_opt)(params)

        lat = jax.random.normal(jax.random.PRNGKey(1), (batch, C, T, H, W),
                                jnp.bfloat16)
        ctx = jax.random.normal(jax.random.PRNGKey(2), (batch, 512, LC),
                                jnp.bfloat16)
        step = jax.jit(step_fn, donate_argnums=(0, 1))
        rngs = [jax.random.PRNGKey(100 + i) for i in range(16)]

        p, o = params, opt
        p, o, l = step(p, o, lat, ctx, rngs[0])  # compile
        float(l)  # readback forces execution through the chip tunnel
        # (block_until_ready alone does not — PERFORMANCE.md env quirks)

        def run(n, p, o):
            for i in range(n):
                p, o, l = step(p, o, lat, ctx, rngs[i % 16])
            # l depends on the forward only; the optimizer chain is forced
            # by the NEXT step's dependence on (p, o) — read back the count
            # (depends on the full update) plus the loss
            float(jnp.asarray(o.count)); float(l)
            return p, o, l

        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); p, o, _ = run(2, p, o)
            ta = time.perf_counter() - t0
            t0 = time.perf_counter(); p, o, l = run(8, p, o)
            tb = time.perf_counter() - t0
            best = min(best, (tb - ta) / 6)
        flops = dit_train_flops(cfg, batch, T, H, W, 512)
        mfu = flops / best / peak
        toks = batch * (T // 2) * (H // 2) * (W // 2) / best
        print(f"XL-FULLSTEP 2048x24 ({n_params/1e9:.2f}B) B={batch} "
              f"inloop-opt bf16-mu factored-nu  {best*1000:8.1f} ms/step  "
              f"MFU {mfu*100:5.1f}%  {toks:,.0f} tok/s  "
              f"loss {float(l):.3f}", flush=True)
        return mfu

    batches = [int(a) for a in sys.argv[1:]] or [2, 4]
    for b in batches:
        try:
            measure(b)
        except Exception as e:
            print(f"XL-FULLSTEP B={b}: FAILED "
                  f"({type(e).__name__}: {str(e)[:400]})", flush=True)


if __name__ == "__main__":
    main()
