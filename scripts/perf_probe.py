"""Perf probe: step-time across remat/attention settings on the real chip.

Timing uses the same window-differencing as bench.py (the relay tunnel makes
naive block_until_ready timing unreliable).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from video_diffusion_speedrun_tpu.core.config import (
    DiTConfig, MeshConfig, OptimizerConfig, TrainConfig,
)
from video_diffusion_speedrun_tpu.parallel.mesh import build_mesh
from video_diffusion_speedrun_tpu.train.step import build_train_step
from video_diffusion_speedrun_tpu.utils.flops import dit_train_flops, peak_flops_for


def time_config(model, label, B=8, T=8, H=32, W=32, LC=512):
    cfg = TrainConfig(
        model=model, mesh=MeshConfig(replica=1, fsdp=1, tensor=1),
        optimizer=OptimizerConfig(learning_rate=2 ** -6, scheduler="linear"),
        batch_size=B, max_steps=5004, seed=0,
    )
    mesh = build_mesh(cfg.mesh)
    init_fn, train_step, _, _ = build_train_step(cfg, mesh)
    state = init_fn(jax.random.PRNGKey(0))
    batch = {
        "latent": jax.random.normal(jax.random.PRNGKey(1), (B, 16, T, H, W),
                                    jnp.bfloat16),
        "context": jax.random.normal(jax.random.PRNGKey(2), (B, LC, 4096),
                                     jnp.bfloat16),
    }
    rng = jax.random.PRNGKey(3)

    def run(n, state, rng):
        m = None
        for _ in range(n):
            rng, sub = jax.random.split(rng)
            state, m = train_step(state, batch, sub)
        return state, rng, float(m["loss"])

    state, rng, _ = run(3, state, rng)
    t0 = time.perf_counter(); state, rng, _ = run(5, state, rng)
    t_small = time.perf_counter() - t0
    t0 = time.perf_counter(); state, rng, _ = run(25, state, rng)
    t_big = time.perf_counter() - t0
    dt = (t_big - t_small) / 20
    fl = dit_train_flops(model, B, T, H, W, LC)
    mfu = fl / dt / peak_flops_for(jax.devices()[0].device_kind)
    print(f"{label:40s} {dt*1000:8.2f} ms  mfu={mfu:.3f}", flush=True)
    return dt


BASE = DiTConfig(
    in_channels=16, patch_size=2, time_patch_size=2, hidden_size=512,
    depth=24, num_heads=4, cross_attn_input_size=4096, residual_v=True,
    train_bias_and_rms=False,
)

if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "remat"):
        time_config(BASE, "remat=True (nothing_saveable)")
        time_config(BASE.replace(remat=False), "remat=False")
    if which in ("all", "attn"):
        time_config(BASE.replace(remat=False, attention_impl="xla"),
                    "remat=False attention=xla")
