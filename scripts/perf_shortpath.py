"""Canonical-shape short-path attention probe (qkv-direct kernel).

The canonical train config runs self-attention at L=1056 (1040 tokens +
16 registers) — kv sits in the MXU LANE dim of the logits matmul, and
1056 = 8×128 + 32 leaves a ragged lane tile. An A/B (pad-free 16-aligned
kv vs kv padded to the next 128-multiple, tail masked in-kernel) showed
a seductive isolated-probe fwd win (0.261 → 0.093 ms, "197 TF/s" = chip
peak — dispatch-pipelining artifact), but the long-window FULL-STEP
bench is the arbiter and rejected it: canonical 85.53 → 86.08 ms,
odd-frame 92.0 → 93.57 ms with padded forwards. The long blocked path
also prefers pad-free divisor blocks (L=8208: fwd 3.24 → 3.49, fwd+bwd
9.62 → 10.91 ms under forced 128-pad). Kernels keep pad-free kv
throughout; see PERFORMANCE.md measured-and-rejected.

Usage: python scripts/perf_shortpath.py [L=1056] [B=8]
"""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

B, H, L, D = 8, 4, 1056, 128


def timeit(fn, *args, n=100):
    o = fn(*args); _ = float(jax.tree.leaves(o)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(10): o = fn(*args)
    _ = float(jax.tree.leaves(o)[0].ravel()[0]); t2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(10 + n): o = fn(*args)
    _ = float(jax.tree.leaves(o)[0].ravel()[0]); tn = time.perf_counter() - t0
    return (tn - t2) / n


def main():
    global B, L
    for a in sys.argv[1:]:
        if a.startswith("L="): L = int(a.split("=", 1)[1])
        if a.startswith("B="): B = int(a.split("=", 1)[1])
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    qkv = jax.random.normal(ks[0], (B, L, 3 * H * D), jnp.bfloat16)
    v = jax.random.normal(ks[1], (B, L, H * D), jnp.bfloat16)
    from video_diffusion_speedrun_tpu.models.rope import rope_cos_sin
    toks = L - 16
    t = max(1, toks // 1024)  # canonical: 4×(16,16) patches per frame pair
    cos, sin = rope_cos_sin(D, t, 32, 32, jnp.zeros(3, jnp.int32),
                            num_registers=L - t * 1024)
    from video_diffusion_speedrun_tpu.ops.fused_attention import (
        qkv_rope_flash_attention,
    )
    fwd_flops = 4 * B * H * L * L * D
    f = jax.jit(lambda qkv, v: qkv_rope_flash_attention(qkv, v, cos, sin, H))
    g = jax.jit(jax.grad(lambda qkv, v: jnp.sum(
        qkv_rope_flash_attention(qkv, v, cos, sin, H).astype(jnp.float32)
        ** 2), argnums=(0, 1)))
    dtf = timeit(f, qkv, v)
    dtg = timeit(g, qkv, v)
    print(f"L={L} B={B}: fwd {dtf*1000:6.3f} ms ({fwd_flops/dtf/1e12:5.1f} "
          f"TF/s)  fwd+bwd {dtg*1000:6.3f} ms "
          f"({3.5*fwd_flops/dtg/1e12:5.1f} TF/s)", flush=True)


if __name__ == "__main__":
    main()
