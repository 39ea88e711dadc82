"""XL (2.8B) FULL training step — loss + backward + fused muP-AdamW — on
one chip, through the PRODUCTION step (round-3 VERDICT next #1: this
script is now a batch-sweep caller of `build_train_step`, the same path
`python train.py --optimizer_in_backward true` launches; the driver-run
single-config version is `python bench.py --xl`).

A standard value_and_grad step CANNOT fit: bf16 params+mu+nu is already
15.45 GiB and the materialized grad tree adds 5.8 GiB against 15.75 GiB of
v5e HBM (measured: "Used 21.28G of 15.75G"). The production config
therefore runs optimizer-in-backward (train/inloop.py): each block's grads
exist only for one reverse-scan iteration, momentum is stored bf16, and
the 2-D second moments are factored rank-1 (Adafactor-style;
equivalence-tested in tests/test_inloop.py; 8-bit storage was measured and
rejected — v5e emulates fp8 casts and pays a ~400 ms int8 relayout) —
peak = p(5.15 GiB) + mu(5.15) + nu(~0) + one block's grads + the saved
per-block input stack.

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
        DiTConfig, MeshConfig, OptimizerConfig, TrainConfig,
    )
    from video_diffusion_speedrun_tpu.models.dit import param_count
    from video_diffusion_speedrun_tpu.parallel.mesh import build_mesh
    from video_diffusion_speedrun_tpu.train.step import build_train_step
    from video_diffusion_speedrun_tpu.utils.flops import (
        dit_train_flops, peak_flops_for,
    )

    device_kind = jax.devices()[0].device_kind
    peak = peak_flops_for(device_kind)
    C, T, H, W = 16, 8, 32, 32
    LC = 4096

    def measure(batch):
        model = DiTConfig(
            in_channels=16, patch_size=2, time_patch_size=2,
            hidden_size=2048, depth=24, num_heads=16,
            cross_attn_input_size=LC, residual_v=True,
            train_bias_and_rms=False,
            scan_blocks=True, remat=True, remat_policy="nothing",
            param_dtype=jnp.bfloat16,
        )
        cfg = TrainConfig(
            model=model, mesh=MeshConfig(replica=1, fsdp=1, tensor=1),
            optimizer=OptimizerConfig(
                learning_rate=2 ** -6, scheduler="linear",
                moments_dtype=jnp.bfloat16, in_backward=True,
                nu_factored=True),
            batch_size=batch, max_steps=100000, seed=0,
        )
        mesh = build_mesh(cfg.mesh)
        init_fn, train_step, _, _ = build_train_step(cfg, mesh)
        state = init_fn(jax.random.PRNGKey(0))
        n_params = param_count(state.params)

        batch_arrays = {
            "latent": jax.random.normal(jax.random.PRNGKey(1),
                                        (batch, C, T, H, W), jnp.bfloat16),
            "context": jax.random.normal(jax.random.PRNGKey(2),
                                         (batch, 512, LC), jnp.bfloat16),
        }
        rng = jax.random.PRNGKey(3)

        def run(n, state):
            for _ in range(n):
                state, metrics = train_step(state, batch_arrays, rng)
            # the loss depends on the forward only; the param element read
            # forces the optimizer chain through the chip tunnel
            # (block_until_ready alone does not — PERFORMANCE.md quirks)
            leaf = jax.tree.leaves(state.params)[0]
            float(leaf[(0,) * leaf.ndim])
            return state, float(metrics["loss"])

        state, _ = run(1, state)  # compile + warm

        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); state, _ = run(2, state)
            ta = time.perf_counter() - t0
            t0 = time.perf_counter(); state, loss = run(8, state)
            tb = time.perf_counter() - t0
            best = min(best, (tb - ta) / 6)
        flops = dit_train_flops(model, batch, T, H, W, 512)
        mfu = flops / best / peak
        toks = batch * (T // 2) * (H // 2) * (W // 2) / best
        print(f"XL-FULLSTEP 2048x24 ({n_params/1e9:.2f}B) B={batch} "
              f"production-step inloop-opt bf16-mu factored-nu "
              f"{best*1000:8.1f} ms/step  MFU {mfu*100:5.1f}%  "
              f"{toks:,.0f} tok/s  loss {loss:.3f}", flush=True)
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
