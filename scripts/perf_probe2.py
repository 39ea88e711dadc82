"""Probe: dispatch overhead — per-step jit calls vs K steps fused in one
lax.scan dispatch."""

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
from video_diffusion_speedrun_tpu.train.loss import rectified_flow_loss
from video_diffusion_speedrun_tpu.train.optim import build_optimizer
from video_diffusion_speedrun_tpu.models.dit import init_dit
import optax

MODEL = DiTConfig(
    in_channels=16, patch_size=2, time_patch_size=2, hidden_size=512,
    depth=24, num_heads=4, cross_attn_input_size=4096, residual_v=True,
    train_bias_and_rms=False, remat=True,
)
B, T, H, W, LC = 8, 8, 32, 32, 512


def main():
    params = init_dit(jax.random.PRNGKey(0), MODEL, 0.1)
    tx, _, sched, _ = build_optimizer(params, 2 ** -6, 5004,
                                   OptimizerConfig(scheduler="linear"))
    opt_state = tx.init(params)
    batch_lat = jax.random.normal(jax.random.PRNGKey(1), (B, 16, T, H, W),
                                  jnp.bfloat16)
    batch_ctx = jax.random.normal(jax.random.PRNGKey(2), (B, LC, 4096),
                                  jnp.bfloat16)

    def loss_fn(p, rng):
        l, _ = rectified_flow_loss(p, MODEL, batch_lat, batch_ctx, rng)
        return l

    def one_step(carry, rng):
        p, o = carry
        loss, grads = jax.value_and_grad(loss_fn)(p, rng)
        upd, o = tx.update(grads, o, p)
        p = optax.apply_updates(p, upd)
        return (p, o), loss

    K = 8

    @jax.jit
    def multi_step(p, o, rng):
        rngs = jax.random.split(rng, K)
        (p, o), losses = jax.lax.scan(one_step, (p, o), rngs)
        return p, o, losses[-1]

    # warm
    params, opt_state, loss = multi_step(params, opt_state, jax.random.PRNGKey(3))
    _ = float(loss)

    t0 = time.perf_counter()
    params, opt_state, loss = multi_step(params, opt_state, jax.random.PRNGKey(4))
    _ = float(loss)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(3):
        params, opt_state, loss = multi_step(params, opt_state,
                                             jax.random.PRNGKey(5 + i))
    _ = float(loss)
    t3 = time.perf_counter() - t0
    dt = (t3 - t1) / (2 * K)
    fl = dit_train_flops(MODEL, B, T, H, W, LC)
    mfu = fl / dt / peak_flops_for(jax.devices()[0].device_kind)
    print(f"scan-of-{K}: {dt*1000:.2f} ms/step mfu={mfu:.3f}", flush=True)


if __name__ == "__main__":
    main()
