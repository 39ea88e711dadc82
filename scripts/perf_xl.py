"""XL-regime (2.8B demo config) training-step ablation on one chip.

The reference's demo/inference config is hidden 2048 / depth 24 / 16 heads
(`/root/reference/sampling/sample.py:42-53`) — the "XL" regime of
BASELINE.md's north star (DiT-XL class, FSDP + grad ckpt). One v5e cannot
hold fp32 Adam state for 2.8B params (33 GB); that state shards across the
`fsdp` axis on a pod (see dryrun_multichip). What one chip CAN measure is
the compute path the north star grades: loss + backward at bf16 with
gradient checkpointing. This script ablates scan/unrolled x remat policy x
batch and prints MFU rows for PERFORMANCE.md.

  python scripts/perf_xl.py
"""

import sys
import time

import click

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from video_diffusion_speedrun_tpu.core.config import DiTConfig
    from video_diffusion_speedrun_tpu.models.dit import init_dit, param_count
    from video_diffusion_speedrun_tpu.train.loss import rectified_flow_loss
    from video_diffusion_speedrun_tpu.utils.flops import (
        dit_train_flops, peak_flops_for,
    )

    device_kind = jax.devices()[0].device_kind
    peak = peak_flops_for(device_kind)
    C, T, H, W = 16, 8, 32, 32
    LC = 4096

    def measure(scan, remat, policy, batch):
        cfg = DiTConfig(
            in_channels=16, patch_size=2, time_patch_size=2,
            hidden_size=2048, depth=24, num_heads=16,
            cross_attn_input_size=LC, residual_v=True,
            train_bias_and_rms=False,
            scan_blocks=scan, remat=remat, remat_policy=policy,
        )
        params = init_dit(jax.random.PRNGKey(0), cfg, 0.1,
                          dtype=jnp.bfloat16)
        n_params = param_count(params)
        lat = jax.random.normal(jax.random.PRNGKey(1), (batch, C, T, H, W),
                                jnp.bfloat16)
        ctx = jax.random.normal(jax.random.PRNGKey(2), (batch, 512, LC),
                                jnp.bfloat16)
        rng = jax.random.PRNGKey(3)

        def loss(p, lat, ctx, rng):
            l, _ = rectified_flow_loss(p, cfg, lat, ctx, rng)
            return l

        # reduce grads to a scalar INSIDE jit: a returned 5.5 GB grad tree
        # alive across back-to-back calls puts three full trees in HBM
        def step(p, lat, ctx, rng):
            l, grads = jax.value_and_grad(loss)(p, lat, ctx, rng)
            gsum = sum(jnp.sum(x.astype(jnp.float32))
                       for x in jax.tree.leaves(grads))
            return l + 0.0 * gsum

        g = jax.jit(step)

        def run(n):
            for _ in range(n):
                o = g(params, lat, ctx, rng)
            return float(o)

        run(2)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); run(2); ta = time.perf_counter() - t0
            t0 = time.perf_counter(); run(8); tb = time.perf_counter() - t0
            best = min(best, (tb - ta) / 6)
        flops = dit_train_flops(cfg, batch, T, H, W, 512)
        mfu = flops / best / peak
        toks = batch * (T // 2) * (H // 2) * (W // 2) / best
        label = ("scan" if scan else "unrolled") + (
            f"+remat[{policy}]" if remat else "+noremat")
        print(f"XL 2048x24 ({n_params/1e9:.2f}B) B={batch} {label:24s} "
              f"{best*1000:8.1f} ms/step  MFU {mfu*100:5.1f}%  "
              f"{toks:,.0f} tok/s", flush=True)
        return mfu

    configs = [
        (True, True, "nothing", 2),
        (True, True, "dots", 2),
        (False, True, "nothing", 2),
        (False, True, "dots", 2),
        (True, True, "nothing", 4),
        (False, True, "nothing", 1),
        (True, True, "dots", 4),
        (True, True, "nothing", 8),
        (True, True, "attn", 4),       # 8: save flash o/lse, skip L² recompute
        (True, True, "attn", 8),
        (True, True, "dots_attn", 4),
        (True, True, "dots_attn", 2),
    ]
    pick = [int(a) for a in sys.argv[1:]] or range(len(configs))
    for i in pick:
        scan, remat, policy, batch = configs[i]
        try:
            measure(scan, remat, policy, batch)
        except Exception as e:  # OOM rows are data too
            label = ("scan" if scan else "unrolled") + (
                f"+remat[{policy}]" if remat else "+noremat")
            print(f"XL B={batch} {label}: FAILED "
                  f"({type(e).__name__}: {str(e)[:120]})", flush=True)


if __name__ == "__main__":
    main()
