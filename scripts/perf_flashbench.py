"""Microbench: our fused rope-flash kernel vs jax's builtin TPU flash
attention at video sequence lengths."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp

B, H, L, D = 2, 4, 8192, 128

def timeit(fn, *args, n=10):
    o = fn(*args); _ = float(jax.tree.leaves(o)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(2): o = fn(*args)
    _ = float(jax.tree.leaves(o)[0].ravel()[0])
    t2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(2 + n): o = fn(*args)
    _ = float(jax.tree.leaves(o)[0].ravel()[0])
    tn = time.perf_counter() - t0
    return (tn - t2) / n

def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    qf = jax.random.normal(ks[0], (B, L, H * D), jnp.bfloat16)
    kf = jax.random.normal(ks[1], (B, L, H * D), jnp.bfloat16)
    vf = jax.random.normal(ks[2], (B, L, H * D), jnp.bfloat16)
    from video_diffusion_speedrun_tpu.models.rope import rope_cos_sin
    cos, sin = rope_cos_sin(D, 8, 32, 32, jnp.zeros(3, jnp.int32), num_registers=0)

    from video_diffusion_speedrun_tpu.ops.fused_attention import rope_flash_attention
    fwd_flops = 4 * B * H * L * L * D

    f_ours = jax.jit(lambda q, k, v: rope_flash_attention(q, k, v, cos, sin, H))
    dt = timeit(f_ours, qf, kf, vf)
    print(f"ours fused fwd:        {dt*1000:8.2f} ms  {fwd_flops/dt/1e12:5.1f} TF/s", flush=True)

    g_ours = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
        rope_flash_attention(q, k, v, cos, sin, H).astype(jnp.float32) ** 2), argnums=(0,1,2)))
    dt = timeit(g_ours, qf, kf, vf)
    print(f"ours fused fwd+bwd:    {dt*1000:8.2f} ms  {3.5*fwd_flops/dt/1e12:5.1f} TF/s", flush=True)

    # builtin (BHLD layout)
    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention as jax_flash
    qb = qf.reshape(B, L, H, D).transpose(0, 2, 1, 3)
    kb = kf.reshape(B, L, H, D).transpose(0, 2, 1, 3)
    vb = vf.reshape(B, L, H, D).transpose(0, 2, 1, 3)
    f_jax = jax.jit(lambda q, k, v: jax_flash(q, k, v, causal=False, sm_scale=D ** -0.5))
    dt = timeit(f_jax, qb, kb, vb)
    print(f"jax builtin fwd:       {dt*1000:8.2f} ms  {fwd_flops/dt/1e12:5.1f} TF/s", flush=True)
    g_jax = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
        jax_flash(q, k, v, causal=False, sm_scale=D ** -0.5).astype(jnp.float32) ** 2), argnums=(0,1,2)))
    dt = timeit(g_jax, qb, kb, vb)
    print(f"jax builtin fwd+bwd:   {dt*1000:8.2f} ms  {3.5*fwd_flops/dt/1e12:5.1f} TF/s", flush=True)

if __name__ == "__main__":
    main()
