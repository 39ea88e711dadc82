"""Canonical-config full step with Adam moments stored in bf16 vs fp32.

The muP-AdamW update is HBM-bound: fp32 moments cost ~24 B/param of
optimizer traffic per step (read+write m and v) out of ~36 B/param total.
bf16 storage halves that (moment MATH stays fp32 — storage-rounding only,
parity-checked over 20 steps in tests/test_train_step.py). This probes the
step-time delta on the canonical run_debug.sh config.
"""
import sys
import time

sys.path.insert(0, ".")

import jax

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

MODEL = DiTConfig(
    in_channels=16, patch_size=2, time_patch_size=2, hidden_size=512,
    depth=24, num_heads=4, cross_attn_input_size=4096, residual_v=True,
    train_bias_and_rms=False, scan_blocks=False, remat=False,
)
B, T, H, W, LC = 8, 8, 32, 32, 512


def measure(moments_dtype):
    cfg = TrainConfig(
        model=MODEL, mesh=MeshConfig(replica=1, fsdp=1, tensor=1),
        optimizer=OptimizerConfig(learning_rate=2 ** -6, scheduler="linear",
                                  moments_dtype=moments_dtype),
        batch_size=B, max_steps=5004, seed=0,
    )
    mesh = build_mesh(cfg.mesh)
    init_fn, train_step, _, _ = build_train_step(cfg, mesh)
    state = init_fn(jax.random.PRNGKey(0))
    batch = {
        "latent": jax.random.normal(jax.random.PRNGKey(1),
                                    (B, 16, T, H, W), jnp.bfloat16),
        "context": jax.random.normal(jax.random.PRNGKey(2),
                                     (B, LC, 4096), jnp.bfloat16),
    }
    rng = jax.random.PRNGKey(3)

    def run(n, state):
        for _ in range(n):
            state, metrics = train_step(state, batch, rng)
        return state, float(metrics["loss"])

    state, _ = run(3, state)
    t_smalls, t_bigs = [], []
    for _ in range(3):
        t0 = time.perf_counter(); state, _ = run(5, state)
        t_smalls.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); state, loss = run(25, state)
        t_bigs.append(time.perf_counter() - t0)
    dt = (min(t_bigs) - min(t_smalls)) / 20
    fl = dit_train_flops(MODEL, B, T, H, W, LC)
    peak = peak_flops_for(jax.devices()[0].device_kind)
    name = "bf16" if moments_dtype is not None else "fp32"
    print(f"moments={name}: {dt*1000:.2f} ms/step  {fl/dt/1e12:.1f} TF/s "
          f"({fl/dt/peak*100:.1f}% MFU)  loss {loss:.4f}", flush=True)


if __name__ == "__main__":
    for arg in sys.argv[1:] or ["fp32", "bf16"]:
        measure(jnp.bfloat16 if arg == "bf16" else None)
