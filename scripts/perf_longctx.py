"""Long-context probe: fused RoPE+flash at video sequence lengths (L≈8k),
where XLA attention would materialize L² logits. B=2, latent [16,16,64,64]
→ L = 8·32·32 = 8192 (+16 registers)."""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp

from video_diffusion_speedrun_tpu.core.config import DiTConfig
from video_diffusion_speedrun_tpu.models.dit import init_dit
from video_diffusion_speedrun_tpu.train.loss import rectified_flow_loss
from video_diffusion_speedrun_tpu.utils.flops import (
    dit_train_flops, peak_flops_for,
)

MODEL = DiTConfig(
    in_channels=16, patch_size=2, time_patch_size=2, hidden_size=512,
    depth=24, num_heads=4, cross_attn_input_size=4096, residual_v=True,
    train_bias_and_rms=False, attention_impl="auto",
    scan_blocks=False, remat=False,
)
B, T, H, W, LC = 2, 16, 64, 64, 512
MOMENTS = None
INLOOP = False


def main():
    # "full" measures the FULL training step (its own process: the grad-tree
    # program of the default section holds HBM alongside the train-step
    # program and the pair RESOURCE_EXHAUSTs a v5e at L=8208)
    # "remat=<policy>" switches loss+backward to scan+remat with that
    # policy (e.g. remat=attn saves the flash o/lse instead of re-running
    # the O(L²) kernel); "b=<N>" overrides the batch; "moments=bf16"
    # stores Adam moments in bf16 (halves optimizer HBM — the lever that
    # lets the B=2 full step fit without remat on the current toolchain).
    # "inloop" runs the production optimizer-in-backward step (fused
    # reverse-scan update + factored nu — the XL regime's optimizer) at
    # this length; "pdtype=bf16" stores params bf16.
    global MODEL, B, MOMENTS, INLOOP
    full_step = "full" in sys.argv[1:]
    for a in sys.argv[1:]:
        if a.startswith("remat="):
            MODEL = MODEL.replace(scan_blocks=True, remat=True,
                                  remat_policy=a.split("=", 1)[1])
        elif a.startswith("b="):
            B = int(a.split("=", 1)[1])
        elif a.startswith("moments="):
            MOMENTS = jnp.bfloat16
        elif a == "inloop":
            INLOOP = True
            full_step = True
        elif a.startswith("pdtype="):
            val = a.split("=", 1)[1]
            if val not in ("fp32", "bf16"):
                raise SystemExit(f"pdtype must be fp32|bf16, got {val!r}")
            if val == "bf16":
                MODEL = MODEL.replace(param_dtype=jnp.bfloat16)
    # dtype= must be passed explicitly: init_dit ignores cfg.param_dtype,
    # so without it a pdtype=bf16 probe run would silently measure fp32
    # params (code-review finding, round 4)
    params = init_dit(jax.random.PRNGKey(0), MODEL, 0.1,
                      dtype=MODEL.param_dtype)
    lat = jax.random.normal(jax.random.PRNGKey(1), (B, 16, T, H, W), jnp.bfloat16)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, LC, 4096), jnp.bfloat16)
    rng = jax.random.PRNGKey(3)
    fl = dit_train_flops(MODEL, B, T, H, W, LC)
    peak = peak_flops_for(jax.devices()[0].device_kind)
    tokens = B * (T // 2) * (H // 2) * (W // 2)

    if full_step:
        _measure_full_step(params, lat, ctx, rng, fl, peak, tokens)
        return

    def loss(p):
        l, _ = rectified_flow_loss(p, MODEL, lat, ctx, rng)
        return l

    fn = jax.jit(jax.grad(loss))
    o = fn(params); _ = float(jax.tree.leaves(o)[0].ravel()[0])
    print("warm ok", flush=True)

    def run(n):
        o = None
        for _ in range(n):
            o = fn(params)
        return float(jax.tree.leaves(o)[0].ravel()[0])

    t0 = time.perf_counter(); run(2); t2 = time.perf_counter() - t0
    t0 = time.perf_counter(); run(8); t8 = time.perf_counter() - t0
    dt = (t8 - t2) / 6
    print(f"long-ctx (L=8208) fwd+bwd: {dt*1000:.2f} ms/step  "
          f"{fl/dt/1e12:.1f} TF/s ({fl/dt/peak*100:.1f}% peak)  "
          f"{tokens/dt:.0f} tok/s", flush=True)


def _measure_full_step(params, lat, ctx, rng, fl, peak, tokens):
    # FULL training step (loss+backward+fused muP-AdamW) at the same
    # 121-frame-class shape (round-2 VERDICT next #4: BASELINE's
    # long-context configs had kernel-only numbers)
    from video_diffusion_speedrun_tpu.core.config import (
        MeshConfig, OptimizerConfig, TrainConfig,
    )
    from video_diffusion_speedrun_tpu.parallel.mesh import build_mesh
    from video_diffusion_speedrun_tpu.train.step import build_train_step

    del params  # init_fn builds its own sharded state
    cfg = TrainConfig(
        model=MODEL, mesh=MeshConfig(replica=1, fsdp=1, tensor=1),
        optimizer=OptimizerConfig(learning_rate=2 ** -6,
                                  moments_dtype=MOMENTS,
                                  in_backward=INLOOP, nu_factored=INLOOP),
        batch_size=B, max_steps=5004, seed=0,
    )
    mesh = build_mesh(cfg.mesh)
    init_fn, train_step, _, _ = build_train_step(cfg, mesh)
    state = init_fn(jax.random.PRNGKey(0))
    batch = {"latent": lat, "context": ctx}

    def run_full(n, state):
        for _ in range(n):
            state, metrics = train_step(state, batch, rng)
        # the param element read forces the optimizer chain (the loss
        # depends on the forward only)
        leaf = jax.tree.leaves(state.params)[0]
        float(leaf[(0,) * leaf.ndim])
        return state, float(metrics["loss"])

    state, _ = run_full(3, state)
    t0 = time.perf_counter(); state, _ = run_full(2, state)
    t2 = time.perf_counter() - t0
    t0 = time.perf_counter(); state, loss = run_full(8, state)
    t8 = time.perf_counter() - t0
    dt = (t8 - t2) / 6
    print(f"long-ctx (L=8208) FULL step: {dt*1000:.2f} ms/step  "
          f"{fl/dt/1e12:.1f} TF/s ({fl/dt/peak*100:.1f}% peak)  "
          f"{tokens/dt:.0f} tok/s  loss {loss:.3f}", flush=True)


if __name__ == "__main__":
    main()
