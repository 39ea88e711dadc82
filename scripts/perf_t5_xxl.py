"""T5-XXL (4.7B) encode latency on the real chip.

The reference encodes captions with frozen T5-XXL on-device every training
step (`/root/reference/utils.py:38-110`, `train.py:77-84`). This measures
that cost at true scale — 24 layers, d_model 4096, d_ff 10240, 64 heads,
bf16, random weights (the checkpoint is unfetchable here; FLOPs don't care)
— validating the single-chip HBM plan (9.4 GB params) and giving the
PERFORMANCE.md row. hidden_states[-8] + re-norm semantics as in training.

  python scripts/perf_t5_xxl.py [--batch 8]
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    import click

    @click.command()
    @click.option("--batch", type=int, default=8)
    @click.option("--seq", type=int, default=512)
    def run(batch, seq):
        import jax
        import jax.numpy as jnp

        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

        from video_diffusion_speedrun_tpu.text.t5 import (
            T5Config, encode, init_t5,
        )
        from video_diffusion_speedrun_tpu.utils.flops import peak_flops_for

        cfg = T5Config.xxl()
        t0 = time.perf_counter()
        params = init_t5(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        n_params = sum(p.size for p in jax.tree.leaves(params))
        jax.tree.leaves(params)[0].block_until_ready()
        print(f"init: {n_params/1e9:.2f}B params bf16 "
              f"({n_params*2/1e9:.1f} GB) in {time.perf_counter()-t0:.1f}s",
              flush=True)

        ids = jnp.ones((batch, seq), jnp.int32)
        enc = jax.jit(lambda p, i: encode(p, cfg, i, return_index=-8))

        def go(n):
            for _ in range(n):
                out = enc(params, ids)
            return float(out[0, 0, 0].astype(jnp.float32))

        go(2)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); go(2); ta = time.perf_counter() - t0
            t0 = time.perf_counter(); go(12); tb = time.perf_counter() - t0
            best = min(best, (tb - ta) / 10)
        # hidden_states[-8] means XLA dead-code-eliminates the last 7
        # layers (the reference's torch path computes them anyway —
        # `utils.py:62-69`); count only executed matmul params
        n_embed = cfg.vocab_size * cfg.d_model
        per_layer = (n_params - n_embed - cfg.d_model) // cfg.num_layers
        live_layers = cfg.num_layers - 7  # return_index=-8
        flops = 2.0 * per_layer * live_layers * batch * seq
        peak = peak_flops_for(jax.devices()[0].device_kind)
        print(f"T5-XXL encode (hidden_states[-8], {live_layers} live "
              f"layers): batch {batch} x {seq} tokens  "
              f"{best*1000:.1f} ms  ({flops/best/1e12:.1f} TF/s, "
              f"{flops/best/peak*100:.1f}% MFU)", flush=True)

    run()


if __name__ == "__main__":
    main()
