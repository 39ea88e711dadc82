"""Long-horizon numerics evidence for the XL optimizer variant (round-3
VERDICT next #2): overlay >=100-step loss curves of exact muP-AdamW vs the
optimizer-in-backward variant with bf16-stored momentum + factored second
moments — the exact optimizer under the XL 50.7%-MFU headline — at a width
where BOTH fit one chip (1024 x 24, ~0.8B), same data/noise/t (identical
per-step rng; both paths derive t/noise the same way, equivalence-tested in
tests/test_inloop.py).

Both runs go through the PRODUCTION `build_train_step` (the torch-FSDP
reference analog is its AdamW + MixedPrecisionPolicy loop,
`/root/reference/train.py:335-344`).

  python scripts/perf_inloop_parity.py [n_steps] [width] [depth]
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from video_diffusion_speedrun_tpu.core.config import (
        DiTConfig, MeshConfig, OptimizerConfig, TrainConfig,
    )
    from video_diffusion_speedrun_tpu.models.dit import param_count
    from video_diffusion_speedrun_tpu.parallel.mesh import build_mesh
    from video_diffusion_speedrun_tpu.train.step import build_train_step

    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    width = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 24
    # default 2^-8: 2^-6 at width 1024 sits at the edge of stability, where
    # trajectory chaos swamps optimizer-variant differences (measured: a
    # 1e-6 param perturbation of the EXACT optimizer diverged 5x more than
    # the factored variant there)
    lr = float(sys.argv[4]) if len(sys.argv) > 4 else 2 ** -8

    # LC=128 keeps 32 resident batches at ~10 MB each (512-token contexts
    # OOM'd beside the 0.79B fp32 state); loss dynamics are unaffected —
    # the synthetic context is noise either way
    B, C, T, H, W, LC = 8, 16, 8, 32, 32, 128
    model = DiTConfig(
        in_channels=C, patch_size=2, time_patch_size=2, hidden_size=width,
        depth=depth, num_heads=width // 128, cross_attn_input_size=4096,
        residual_v=True, train_bias_and_rms=False,
        scan_blocks=True, remat=True, remat_policy="nothing",
    )

    # 32 distinct synthetic batches cycled so the curve is a real training
    # trajectory, not single-batch overfit; per-step t/noise/dropout keys
    # come from fold_in(base_rng, step) inside the step — identical across
    # the optimizer variants by construction
    batches = []
    for i in range(32):
        batches.append({
            "latent": jax.random.normal(jax.random.PRNGKey(10 + i),
                                        (B, C, T, H, W), jnp.bfloat16),
            "context": jax.random.normal(jax.random.PRNGKey(100 + i),
                                         (B, LC, 4096), jnp.bfloat16),
        })
    base_rng = jax.random.PRNGKey(3)

    def run(tag, optimizer, perturb=0.0):
        cfg = TrainConfig(
            model=model, mesh=MeshConfig(replica=1, fsdp=1, tensor=1),
            optimizer=optimizer, batch_size=B, max_steps=max(n_steps, 100),
            seed=0,
        )
        mesh = build_mesh(cfg.mesh)
        init_fn, train_step, _, _ = build_train_step(cfg, mesh)
        state = init_fn(jax.random.PRNGKey(0))
        if perturb:
            # Lyapunov baseline: the SAME exact optimizer from an initial
            # point displaced by `perturb` relative noise — quantifies the
            # trajectory chaos any two equivalent optimizers accumulate,
            # the envelope the factored variant must be judged against
            noise = jax.tree.map(
                lambda p, k: p * (1 + perturb * jax.random.normal(
                    k, p.shape, jnp.float32).astype(p.dtype)),
                state.params,
                jax.tree.unflatten(
                    jax.tree.structure(state.params),
                    list(jax.random.split(
                        jax.random.PRNGKey(99),
                        len(jax.tree.leaves(state.params))))),
            )
            state = state._replace(params=noise)
        if tag == "exact":
            print(f"params: {param_count(state.params)/1e9:.3f}B",
                  flush=True)
        losses = []
        t0 = time.perf_counter()
        for k in range(n_steps):
            state, m = train_step(state, batches[k % len(batches)], base_rng)
            losses.append(m["loss"])  # defer readback out of the hot loop
        losses = [float(x) for x in losses]
        print(f"{tag}: {n_steps} steps in {time.perf_counter()-t0:.1f}s  "
              f"first {losses[0]:.4f}  last {losses[-1]:.4f}", flush=True)
        # free this run's ~9.5 GB state before the next variant initializes
        # (0.79B params + moments; both resident would RESOURCE_EXHAUST)
        del state
        jax.clear_caches()
        return np.asarray(losses)

    exact = OptimizerConfig(learning_rate=lr, scheduler="linear")
    exact_losses = run("exact", exact)
    eps_losses = run("exact-eps(1e-6)", exact, perturb=1e-6)
    inloop_losses = run("inloop", OptimizerConfig(
        learning_rate=lr, scheduler="linear",
        moments_dtype=jnp.bfloat16, in_backward=True, nu_factored=True))

    def report(tag, losses):
        rel = np.abs(losses - exact_losses) / np.abs(exact_losses)
        tail = losses[-10:].mean()
        tail_e = exact_losses[-10:].mean()
        print(f"{tag} vs exact: per-step |rel| max {rel.max():.4f} "
              f"(step {int(rel.argmax())})  mean {rel.mean():.4f}  "
              f"terminal {rel[-1]:.4f}  trailing-10 mean "
              f"{tail:.4f} vs {tail_e:.4f} "
              f"(rel {abs(tail - tail_e)/tail_e:.4f})")

    print()
    report("exact-eps(1e-6)", eps_losses)
    report("inloop         ", inloop_losses)
    for k in range(0, n_steps, max(1, n_steps // 12)):
        print(f"  step {k:4d}: exact {exact_losses[k]:.4f}  "
              f"eps {eps_losses[k]:.4f}  inloop {inloop_losses[k]:.4f}")


if __name__ == "__main__":
    main()
