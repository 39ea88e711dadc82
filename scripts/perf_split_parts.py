"""Micro-profile the split-prefix decomposition's components at L=8208."""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, H, L, D = 2, 4, 8208, 128
PFX = 16
BODY = L - PFX


def timeit(fn, *args, n=40, trials=3):
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
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, L, H * D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, L, H * D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, L, H * D), jnp.bfloat16)
    from video_diffusion_speedrun_tpu.models.rope import rope_cos_sin
    cos, sin = rope_cos_sin(D, 8, 32, 32, jnp.zeros(3, jnp.int32),
                            num_registers=PFX)
    cos, sin = cos[:L], sin[:L]
    from video_diffusion_speedrun_tpu.ops import fused_attention as fa
    scale = D ** -0.5
    c32, s32 = cos.astype(jnp.float32), sin.astype(jnp.float32)

    qm, km, vm = q[:, PFX:], k[:, PFX:], v[:, PFX:]
    qp, kp, vp = q[:, :PFX], k[:, :PFX], v[:, :PFX]
    cm, sm = c32[PFX:], s32[PFX:]
    cp, sp = c32[:PFX], s32[:PFX]

    def t(name, f, *args):
        dt = timeit(jax.jit(f), *args)
        print(f"{name:28s}: {dt*1000:7.3f} ms", flush=True)

    # components of _split_fwd
    t("bulk 8192x8192 @1024", lambda a,b_,c_: fa._forward(
        a, b_, c_, cm, sm, cm, sm, H, scale, 1024, 1024), qm, km, vm)
    t("bulk-q x prefix-kv (16)", lambda a,b_,c_: fa._forward(
        a, b_, c_, cm, sm, cp, sp, H, scale, 1024, PFX), qm, kp, vp)
    t("prefix-q x full-kv", lambda a,b_,c_: fa._forward(
        a, b_, c_, cp, sp, c32, s32, H, scale, PFX, 1024), qp, k, v)
    # merge cost
    o1, l1 = jax.jit(lambda a,b_,c_: fa._forward(
        a, b_, c_, cm, sm, cm, sm, H, scale, 1024, 1024))(qm, km, vm)
    o2, l2 = jax.jit(lambda a,b_,c_: fa._forward(
        a, b_, c_, cm, sm, cp, sp, H, scale, 1024, PFX))(qm, kp, vp)
    t("online merge", lambda a,b_,c_,d_: fa._online_merge(
        a, b_[..., None], c_, d_[..., None], H), o1, l1, o2, l2)
    # whole split fwd for reference
    t("whole _split_fwd", lambda a,b_,c_: fa._split_fwd(
        a, b_, c_, c32, s32, c32, s32, H, scale, PFX, 1024)[0], q, k, v)
    t("whole 912 fwd", lambda a,b_,c_: fa._forward(
        a, b_, c_, c32, s32, c32, s32, H, scale, 912, 912)[0], q, k, v)
    # ragged-kv option: bulk q x FULL kv, non-divisor block_k=1024 with the
    # kernel's masked tail (pad 8208->9216, 9th block 16 valid) - no merge.
    # _forward's divisor-only block choice is a Python-side policy; bypass
    # it for the probe.
    orig = fa._fit_block_div
    fa._fit_block_div = lambda l, b, align=16: b
    try:
        t("bulk-q x ragged-kv 8208", lambda a,b_,c_: fa._forward(
            a, b_, c_, cm, sm, c32, s32, H, scale, 1024, 1024)[0], qm, k, v)
        t("ragged q+kv 8208 @1024", lambda a,b_,c_: fa._forward(
            a, b_, c_, c32, s32, c32, s32, H, scale, 1024, 1024)[0], q, k, v)
    finally:
        fa._fit_block_div = orig


if __name__ == '__main__':
    main()
