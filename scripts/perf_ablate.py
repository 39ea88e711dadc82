"""Ablation: where do the 175 ms go? fwd / fwd+bwd / +opt / attention impl."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import optax

from video_diffusion_speedrun_tpu.core.config import DiTConfig, OptimizerConfig
from video_diffusion_speedrun_tpu.models.dit import init_dit
from video_diffusion_speedrun_tpu.train.loss import rectified_flow_loss
from video_diffusion_speedrun_tpu.train.optim import build_optimizer
from video_diffusion_speedrun_tpu.utils.flops import (
    dit_forward_flops, dit_train_flops, peak_flops_for,
)

BASE = DiTConfig(
    in_channels=16, patch_size=2, time_patch_size=2, hidden_size=512,
    depth=24, num_heads=4, cross_attn_input_size=4096, residual_v=True,
    train_bias_and_rms=False,
)
B, T, H, W, LC = 8, 8, 32, 32, 512
PEAK = None


def bench(label, make_fn, flops):
    global PEAK
    fn, args = make_fn()
    out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].ravel()[0])  # warm incl readback

    def run(n):
        o = None
        for _ in range(n):
            o = fn(*args)
        return float(jax.tree.leaves(o)[0].ravel()[0])

    t0 = time.perf_counter(); run(3); t3 = time.perf_counter() - t0
    t0 = time.perf_counter(); run(13); t13 = time.perf_counter() - t0
    dt = (t13 - t3) / 10
    if PEAK is None:
        PEAK = peak_flops_for(jax.devices()[0].device_kind)
    print(f"{label:36s} {dt*1000:8.2f} ms   {flops/dt/1e12:6.1f} TF/s "
          f"({flops/dt/PEAK*100:4.1f}%)", flush=True)


def main():
    which = set(sys.argv[1:]) or {"fwd", "bwd", "opt", "xla"}
    params = init_dit(jax.random.PRNGKey(0), BASE, 0.1)
    lat = jax.random.normal(jax.random.PRNGKey(1), (B, 16, T, H, W), jnp.bfloat16)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, LC, 4096), jnp.bfloat16)
    rng = jax.random.PRNGKey(3)
    f_fwd = dit_forward_flops(BASE, B, T, H, W, LC)
    f_train = dit_train_flops(BASE, B, T, H, W, LC)

    def loss_fn(p, cfg=BASE):
        def f(pp):
            l, _ = rectified_flow_loss(pp, cfg, lat, ctx, rng)
            return l
        return f

    if "fwd" in which:
        bench("fwd-only (remat cfg irrelevant)",
              lambda: (jax.jit(loss_fn(params)), (params,)), f_fwd)
    if "bwd" in which:
        bench("fwd+bwd remat=True",
              lambda: (jax.jit(jax.grad(loss_fn(params))), (params,)), f_train)
    if "bwdnr" in which:
        cfg = BASE.replace(remat=False)
        bench("fwd+bwd remat=False",
              lambda: (jax.jit(jax.grad(loss_fn(params, cfg))), (params,)),
              f_train)
    if "xla" in which:
        cfg = BASE.replace(attention_impl="xla")
        bench("fwd+bwd remat=True attn=xla",
              lambda: (jax.jit(jax.grad(loss_fn(params, cfg))), (params,)),
              f_train)
    if "fwdxla" in which:
        cfg = BASE.replace(attention_impl="xla")
        bench("fwd-only attn=xla",
              lambda: (jax.jit(loss_fn(params, cfg)), (params,)), f_fwd)
    if "fwdnorope" in which:
        cfg = BASE.replace(use_rope=False)
        p2 = init_dit(jax.random.PRNGKey(0), cfg, 0.1)
        bench("fwd-only no-rope (pallas attn)",
              lambda: (jax.jit(loss_fn(p2, cfg)), (p2,)), f_fwd)
    if "fwdbig" in which:
        lat2 = jax.random.normal(jax.random.PRNGKey(1), (32, 16, T, H, W), jnp.bfloat16)
        ctx2 = jax.random.normal(jax.random.PRNGKey(2), (32, LC, 4096), jnp.bfloat16)
        def loss_big(pp):
            l, _ = rectified_flow_loss(pp, BASE, lat2, ctx2, rng)
            return l
        bench("fwd-only B=32",
              lambda: (jax.jit(loss_big), (params,)),
              dit_forward_flops(BASE, 32, T, H, W, LC))
    if "xl" in which:
        xl = DiTConfig(
            in_channels=16, patch_size=2, time_patch_size=2, hidden_size=1152,
            depth=28, num_heads=9, cross_attn_input_size=4096, residual_v=True,
            train_bias_and_rms=False,
        )
        pxl = init_dit(jax.random.PRNGKey(0), xl, 0.1)
        lat4 = lat[:4]; ctx4 = ctx[:4]
        def loss_xl(pp):
            l, _ = rectified_flow_loss(pp, xl, lat4, ctx4, rng)
            return l
        bench("DiT-XL(1152x28) B=4 fwd+bwd remat",
              lambda: (jax.jit(jax.grad(loss_xl)), (pxl,)),
              dit_train_flops(xl, 4, T, H, W, LC))
    if "xlbf16" in which:
        xl = DiTConfig(
            in_channels=16, patch_size=2, time_patch_size=2, hidden_size=1152,
            depth=28, num_heads=9, cross_attn_input_size=4096, residual_v=True,
            train_bias_and_rms=False,
        )
        pxl = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                           init_dit(jax.random.PRNGKey(0), xl, 0.1))
        def loss_xlb(pp):
            l, _ = rectified_flow_loss(pp, xl, lat, ctx, rng)
            return l
        bench("DiT-XL bf16-params B=8 fwd+bwd",
              lambda: (jax.jit(jax.grad(loss_xlb)), (pxl,)),
              dit_train_flops(xl, B, T, H, W, LC))
    if "lbf16" in which:
        lcfg = DiTConfig(
            in_channels=16, patch_size=2, time_patch_size=2, hidden_size=1024,
            depth=24, num_heads=8, cross_attn_input_size=4096, residual_v=True,
            train_bias_and_rms=False,
        )
        pl = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          init_dit(jax.random.PRNGKey(0), lcfg, 0.1))
        def loss_lb(pp):
            l, _ = rectified_flow_loss(pp, lcfg, lat, ctx, rng)
            return l
        bench("DiT-L bf16-params B=8 fwd+bwd",
              lambda: (jax.jit(jax.grad(loss_lb)), (pl,)),
              dit_train_flops(lcfg, B, T, H, W, LC))
    if "xl2" in which:
        xl = DiTConfig(
            in_channels=16, patch_size=2, time_patch_size=2, hidden_size=1152,
            depth=28, num_heads=9, cross_attn_input_size=4096, residual_v=True,
            train_bias_and_rms=False,
        )
        pxl = init_dit(jax.random.PRNGKey(0), xl, 0.1)
        lat2 = jax.random.normal(jax.random.PRNGKey(1), (B, 16, 16, H, W), jnp.bfloat16)
        def loss_xl2(pp):
            l, _ = rectified_flow_loss(pp, xl, lat2, ctx, rng)
            return l
        bench("DiT-XL T=16 (L=2064) fwd+bwd remat",
              lambda: (jax.jit(jax.grad(loss_xl2)), (pxl,)),
              dit_train_flops(xl, B, 16, H, W, LC))
    if "unroll" in which:
        cfg = BASE.replace(scan_blocks=False)
        bench("fwd+bwd unrolled remat=True",
              lambda: (jax.jit(jax.grad(loss_fn(params, cfg))), (params,)),
              f_train)
    if "unrollnr" in which:
        cfg = BASE.replace(scan_blocks=False, remat=False)
        bench("fwd+bwd unrolled remat=False",
              lambda: (jax.jit(jax.grad(loss_fn(params, cfg))), (params,)),
              f_train)
    if "palshort" in which:
        cfg = BASE.replace(scan_blocks=False, remat=False,
                           attention_impl="pallas")
        bench("fwd+bwd unrolled pallas-attn",
              lambda: (jax.jit(jax.grad(loss_fn(params, cfg))), (params,)),
              f_train)
    if "xlashort" in which:
        cfg = BASE.replace(scan_blocks=False, remat=False,
                           attention_impl="xla")
        bench("fwd+bwd unrolled xla-attn",
              lambda: (jax.jit(jax.grad(loss_fn(params, cfg))), (params,)),
              f_train)
    if "b16" in which:
        cfg = BASE.replace(scan_blocks=False, remat=False)
        lat16 = jax.random.normal(jax.random.PRNGKey(1), (16, 16, T, H, W), jnp.bfloat16)
        ctx16 = jax.random.normal(jax.random.PRNGKey(2), (16, LC, 4096), jnp.bfloat16)
        def loss16(pp):
            l, _ = rectified_flow_loss(pp, cfg, lat16, ctx16, rng)
            return l
        bench("fwd+bwd unrolled B=16",
              lambda: (jax.jit(jax.grad(loss16)), (params,)),
              dit_train_flops(cfg, 16, T, H, W, LC))
    if "xldots" in which:
        xl = DiTConfig(
            in_channels=16, patch_size=2, time_patch_size=2, hidden_size=1152,
            depth=28, num_heads=9, cross_attn_input_size=4096, residual_v=True,
            train_bias_and_rms=False, scan_blocks=True, remat=True,
            remat_policy="dots",
        )
        pxl = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                           init_dit(jax.random.PRNGKey(0), xl, 0.1))
        def loss_xld(pp):
            l, _ = rectified_flow_loss(pp, xl, lat, ctx, rng)
            return l
        bench("DiT-XL bf16 scan remat=dots B=8",
              lambda: (jax.jit(jax.grad(loss_xld)), (pxl,)),
              dit_train_flops(xl, B, T, H, W, LC))
    if "xlunroll" in which:
        xl = DiTConfig(
            in_channels=16, patch_size=2, time_patch_size=2, hidden_size=1152,
            depth=28, num_heads=9, cross_attn_input_size=4096, residual_v=True,
            train_bias_and_rms=False, scan_blocks=False, remat=True,
            remat_policy="dots",
        )
        pxl = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                           init_dit(jax.random.PRNGKey(0), xl, 0.1))
        def loss_xlu(pp):
            l, _ = rectified_flow_loss(pp, xl, lat, ctx, rng)
            return l
        bench("DiT-XL bf16 unroll remat=dots B=8",
              lambda: (jax.jit(jax.grad(loss_xlu)), (pxl,)),
              dit_train_flops(xl, B, T, H, W, LC))
    if "opt" in which:
        tx, _, _, _ = build_optimizer(params, 2 ** -6, 5004,
                                   OptimizerConfig(scheduler="linear"))
        opt_state = tx.init(params)

        @jax.jit
        def opt_only(p, o):
            g = jax.tree.map(jnp.ones_like, p)
            upd, o2 = tx.update(g, o, p)
            return optax.apply_updates(p, upd), o2

        bench("optimizer update only",
              lambda: (opt_only, (params, opt_state)), f_train)


if __name__ == "__main__":
    main()
