"""A/B the split-prefix long path vs divisor-block snapping at L=8208.

The split path (ops/fused_attention.py `_split_prefix`) decomposes
L = 16 registers + 8192 tokens so the bulk tiles at the optimal
1024x1024 blocks instead of snapping to 912 (the largest 16-aligned
divisor of 8208 = 2^4*3^3*19). Kernel-level A/B; step-level A/B lives in
scripts/perf_longctx.py (VDS_NO_SPLIT=1 disables the split dispatch).
"""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, H, L, D = 2, 4, 8208, 128


def timeit(fn, *args, n=40, trials=3):
    """Window-differenced timing, min over trials per window (jitter can
    only inflate a window — see bench.py measure())."""
    o = fn(*args); _ = float(jax.tree.leaves(o)[0].ravel()[0])
    ts, tn = [], []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(4): o = fn(*args)
        _ = float(jax.tree.leaves(o)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        for _ in range(4 + n): o = fn(*args)
        _ = float(jax.tree.leaves(o)[0].ravel()[0])
        tn.append(time.perf_counter() - t0)
    return (min(tn) - min(ts)) / n


def main():
    global L
    for a in sys.argv[1:]:
        if a.startswith("L="):
            L = int(a.split("=", 1)[1])
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    qf = jax.random.normal(ks[0], (B, L, H * D), jnp.bfloat16)
    kf = jax.random.normal(ks[1], (B, L, H * D), jnp.bfloat16)
    vf = jax.random.normal(ks[2], (B, L, H * D), jnp.bfloat16)
    from video_diffusion_speedrun_tpu.models.rope import rope_cos_sin
    tok = 8192 if L >= 8192 else (L // 16) * 16
    cos, sin = rope_cos_sin(D, 8, 32, 32, jnp.zeros(3, jnp.int32),
                            num_registers=max(0, L - tok))
    cos, sin = cos[:L], sin[:L]
    from video_diffusion_speedrun_tpu.ops import fused_attention as fa
    fwd_flops = 4 * B * H * L * L * D

    variants = {
        "auto(split)": dict(),
        "912x912": dict(block_q=912, block_k=912),
        "1024x1024(snap)": dict(block_q=1024, block_k=1024),
    }
    for name, kw in variants.items():
        f = jax.jit(lambda q, k, v, kw=kw: fa.rope_flash_attention(
            q, k, v, cos, sin, H, **kw))
        g = jax.jit(jax.grad(lambda q, k, v, kw=kw: jnp.sum(
            fa.rope_flash_attention(q, k, v, cos, sin, H,
                                    **kw).astype(jnp.float32) ** 2),
            argnums=(0, 1, 2)))
        dtf = timeit(f, qf, kf, vf)
        dtg = timeit(g, qf, kf, vf)
        print(f"{name:18s}: fwd {dtf*1000:7.2f} ms "
              f"({fwd_flops/dtf/1e12:5.1f} TF/s)  "
              f"fwd+bwd {dtg*1000:7.2f} ms "
              f"({3.5*fwd_flops/dtg/1e12:5.1f} TF/s)", flush=True)

    # numerics: split path vs snapped-divisor reference
    o_ref = jax.jit(lambda q, k, v: fa.rope_flash_attention(
        q, k, v, cos, sin, H, block_q=912, block_k=912))(qf, kf, vf)
    o_split = jax.jit(lambda q, k, v: fa.rope_flash_attention(
        q, k, v, cos, sin, H))(qf, kf, vf)
    err = float(jnp.max(jnp.abs(o_ref.astype(jnp.float32)
                                - o_split.astype(jnp.float32))))
    print(f"split vs 912 max|diff| = {err:.3e}")


if __name__ == "__main__":
    main()
