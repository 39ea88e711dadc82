"""Block-size sweep for the fused rope-flash kernel."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, H, L, D = 2, 4, 8192, 128

def timeit(fn, *args, n=10):
    o = fn(*args); _ = float(jax.tree.leaves(o)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(2): o = fn(*args)
    _ = float(jax.tree.leaves(o)[0].ravel()[0]); t2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(2 + n): o = fn(*args)
    _ = float(jax.tree.leaves(o)[0].ravel()[0]); tn = time.perf_counter() - t0
    return (tn - t2) / n

def main():
    # args: [L=<len>] [bqxbk ...] — L=8208 is the production long-context
    # length (8192 tokens + 16 registers); divisor-block fitting snaps
    # requested sizes to divisors of L, so pass exact divisors when probing
    global L
    pick = []
    for a in sys.argv[1:]:
        if a.startswith("L="):
            L = int(a.split("=", 1)[1])
        else:
            pick.append(a)
    sys.argv[1:] = pick
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    qf = jax.random.normal(ks[0], (B, L, H * D), jnp.bfloat16)
    kf = jax.random.normal(ks[1], (B, L, H * D), jnp.bfloat16)
    vf = jax.random.normal(ks[2], (B, L, H * D), jnp.bfloat16)
    from video_diffusion_speedrun_tpu.models.rope import rope_cos_sin
    # token budget 8·32·32 = 8192; anything above is register rows (the
    # production L=8208 = 8192 + 16 registers)
    cos, sin = rope_cos_sin(D, 8, 32, 32, jnp.zeros(3, jnp.int32),
                            num_registers=max(0, L - 8192))
    from video_diffusion_speedrun_tpu.ops.fused_attention import rope_flash_attention
    fwd_flops = 4 * B * H * L * L * D
    pick = sys.argv[1:]
    combos = ([tuple(int(x) for x in a.split("x")) for a in pick] if pick
              else [(1024, 1024), (512, 2048), (2048, 512), (512, 1024),
                    (2048, 1024), (1024, 2048), (2048, 2048), (1024, 512),
                    (4096, 512), (512, 4096)])
    for bq, bk in combos:
        f = jax.jit(lambda q, k, v, bq=bq, bk=bk: rope_flash_attention(
            q, k, v, cos, sin, H, block_q=bq, block_k=bk))
        g = jax.jit(jax.grad(lambda q, k, v, bq=bq, bk=bk: jnp.sum(
            rope_flash_attention(q, k, v, cos, sin, H, block_q=bq,
                                 block_k=bk).astype(jnp.float32) ** 2),
            argnums=(0, 1, 2)))
        try:
            dtf = timeit(f, qf, kf, vf)
            dtg = timeit(g, qf, kf, vf)
            print(f"bq={bq:5d} bk={bk:5d}: fwd {dtf*1000:7.2f} ms "
                  f"({fwd_flops/dtf/1e12:5.1f} TF/s)  fwd+bwd {dtg*1000:7.2f} ms "
                  f"({3.5*fwd_flops/dtg/1e12:5.1f} TF/s)", flush=True)
        except Exception as e:
            print(f"bq={bq} bk={bk}: FAILED {type(e).__name__}", flush=True)

if __name__ == "__main__":
    main()
