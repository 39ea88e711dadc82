"""Video DiT as pure functions over a parameter pytree.

TPU-native redesign of the reference DiT (`/root/reference/model.py:278-402`):
same architecture — 3D patchify, 16 register tokens, 3D RoPE with random
crop-offset augmentation, timestep MLP, N blocks of
[AdaLN-modulated self-attn + cross-attn + MLP] with value-residual mixing,
final AdaLN + RMSNorm + zero-init projection, un-patchify — but structured as
an `init(rng, cfg) -> params` / `forward(params, cfg, x, context, t, ...)`
pair so it composes with `jax.jit`, `jax.grad`, sharding annotations and
`lax.scan` over stacked block parameters (one compiled block body regardless
of depth; FSDP all-gathers happen per scan step, mirroring the reference's
per-block FSDP gather, `model.py:523-533`).

Parameter-tree naming deliberately preserves the reference's muP-relevant name
substrings ("bias", "norm", "lambda", "patch_proj", "context_kv", "time",
"modulation") so the muP lr/wd rules (`model.py:404-465`) apply identically —
see train/mup.py.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from video_diffusion_speedrun_tpu.core.config import DiTConfig
from video_diffusion_speedrun_tpu.models.rope import (
    apply_rotary,
    random_rope_offsets,
    rope_cos_sin,
)
from video_diffusion_speedrun_tpu.ops.attention import attention
from video_diffusion_speedrun_tpu.ops.embeddings import timestep_embedding
from video_diffusion_speedrun_tpu.ops.normalization import rms_norm
from video_diffusion_speedrun_tpu.ops.patchify import patchify, unpatchify

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _linear_init(key, fan_in: int, fan_out: int, *, bias: bool, std_factor: float = 1.0):
    """torch nn.Linear default init: W, b ~ U(±1/sqrt(fan_in)); weight stored
    [fan_in, fan_out] (transposed vs torch). `std_factor` replicates the
    reference's ×init_std_factor scaling of every 2-D weight
    (`/root/reference/train.py:246-251`)."""
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    p = {
        "weight": jax.random.uniform(
            wkey, (fan_in, fan_out), jnp.float32, -bound, bound
        )
        * std_factor
    }
    if bias:
        p["bias"] = jax.random.uniform(bkey, (fan_out,), jnp.float32, -bound, bound)
    return p


def _zero_linear(fan_in: int, fan_out: int, *, bias: bool = True):
    p = {"weight": jnp.zeros((fan_in, fan_out), jnp.float32)}
    if bias:
        p["bias"] = jnp.zeros((fan_out,), jnp.float32)
    return p


def _norm_params(cfg: DiTConfig):
    """Trainable RMSNorm scale, gated by train_bias_and_rms (`model.py:25-33`)."""
    if cfg.train_bias_and_rms:
        return {"scale": jnp.ones((cfg.hidden_size,), jnp.float32)}
    return {}


def init_block(key, cfg: DiTConfig, std_factor: float = 1.0) -> Params:
    """One DiT block's parameters (`model.py:44-94`)."""
    d = cfg.hidden_size
    keys = jax.random.split(key, 8)
    qkv_bias = cfg.train_bias_and_rms
    p: Params = {
        "norm1": _norm_params(cfg),
        "qkv": _linear_init(keys[0], d, 3 * d, bias=qkv_bias, std_factor=std_factor),
        "attn_proj": _linear_init(keys[1], d, d, bias=False, std_factor=std_factor),
        "norm3": _norm_params(cfg),
        "mlp": {
            "fc1": _linear_init(keys[2], d, cfg.mlp_hidden, bias=True, std_factor=std_factor),
            "fc2": _linear_init(keys[3], cfg.mlp_hidden, d, bias=True, std_factor=std_factor),
        },
        # zero-init AdaLN projection (`model.py:93-94`)
        "adaLN_modulation": _zero_linear(d, 9 * d),
    }
    if cfg.residual_v:
        # learnable value-residual mixing scalar, init 0.5 (`model.py:65-66`)
        p["lambda_param"] = jnp.full((1,), 0.5, jnp.float32)
    if cfg.cross_attn_input_size is not None:
        p["norm2"] = _norm_params(cfg)
        p["q_cross"] = _linear_init(keys[4], d, d, bias=qkv_bias, std_factor=std_factor)
        p["context_kv"] = _linear_init(
            keys[5], cfg.cross_attn_input_size, 2 * d, bias=qkv_bias, std_factor=std_factor
        )
        p["cross_proj"] = _linear_init(keys[6], d, d, bias=False, std_factor=std_factor)
    return p


def init_dit(key, cfg: DiTConfig, init_std_factor: float = 1.0,
             dtype=None) -> Params:
    """Full DiT parameter tree.

    `init_std_factor` scales every 2-D weight at init, replicating the
    reference's post-construction `param.data.mul_(0.1)` (`train.py:246-251`;
    note its "fan_in" comment is a misnomer — the multiply is unconditional).
    Block params are stacked along a leading depth axis for `lax.scan` —
    initialized under vmap so peak memory is the final tree size (a
    build-then-stack would transiently double it; at multi-B-param widths
    that alone OOMs a 16 GB chip). `dtype` casts leaves at creation (e.g.
    bf16 inference params).
    """
    d = cfg.hidden_size
    keys = jax.random.split(key, 6 + cfg.depth)

    params: Params = {
        # conv3d-equivalent patch projection (5-D in torch → NOT scaled by
        # init_std_factor there; we match by passing std_factor=1).
        "patch_proj": _linear_init(keys[0], cfg.patch_dim, d, bias=True),
        "register_tokens": jax.random.normal(keys[1], (1, cfg.num_registers, d), jnp.float32),
        "time_embed": {
            "fc1": _linear_init(keys[2], d, 4 * d, bias=True, std_factor=init_std_factor),
            "fc2": _linear_init(keys[3], 4 * d, d, bias=True, std_factor=init_std_factor),
        },
        # zero-init final AdaLN + head (`model.py:347-350`)
        "final_modulation": _zero_linear(d, 2 * d),
        "final_norm": _norm_params(cfg),
        "final_proj": _zero_linear(d, cfg.out_patch_dim),
    }
    if not cfg.use_rope:
        params["positional_embedding"] = jnp.zeros(
            (1, cfg.max_tokens_no_rope, d), jnp.float32
        )

    def _cast(tree):
        if dtype is None:
            return tree
        return jax.tree.map(lambda x: x.astype(dtype), tree)

    # cast INSIDE the vmapped program: XLA fuses generation+cast so the fp32
    # intermediates never materialize in HBM — at multi-B params the
    # cast-after-stack peak (fp32 tree + bf16 copy) alone OOMs a 16 GB chip
    params["blocks"] = jax.vmap(
        lambda k: _cast(init_block(k, cfg, std_factor=init_std_factor))
    )(keys[6:])
    return {k: (_cast(v) if k != "blocks" else v) for k, v in params.items()}


def param_count(params: Params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))


def precompute_context_kv(params: Params, cfg: DiTConfig,
                          context: jnp.ndarray) -> jnp.ndarray:
    """Project the cross-attention K/V for every layer once:
    [depth, B, Lc, 2D]. Pass to `dit_forward(context_kv=...)` when the same
    context is reused across many forwards (sampling)."""
    ckv_p = params["blocks"]["context_kv"]
    cdt = cfg.compute_dtype
    out = jnp.einsum("blc,dcf->dblf", context.astype(cdt),
                     ckv_p["weight"].astype(cdt))
    if "bias" in ckv_p:
        out = out + ckv_p["bias"].astype(cdt)[:, None, None, :]
    return out


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _dense(p: Params, x: jnp.ndarray, compute_dtype) -> jnp.ndarray:
    out = jnp.dot(x, p["weight"].astype(compute_dtype))
    if "bias" in p:
        out = out + p["bias"].astype(compute_dtype)
    return out


def _modulate(x, shift, scale):
    return x * (1 + scale[:, None, :]) + shift[:, None, :]


def _use_fused_adaln(cfg: DiTConfig) -> bool:
    if cfg.fused_adaln == "pallas":
        return True
    return cfg.fused_adaln == "auto" and jax.default_backend() == "tpu"


def _norm_modulate(cfg: DiTConfig, x, gamma, shift, scale):
    """modulate(rms_norm(x, gamma), shift, scale) — as one Pallas VMEM pass on
    TPU (ops/fused_adaln.py; keeps the following matmul's prologue clean for
    the MXU), or the plain XLA composition elsewhere."""
    if _use_fused_adaln(cfg):
        from video_diffusion_speedrun_tpu.ops.fused_adaln import (
            adaln_rms_modulate,
        )

        return adaln_rms_modulate(x, shift, scale, gamma)
    return _modulate(rms_norm(x, gamma), shift, scale)


def _use_fused_attention(cfg: DiTConfig, seq_len: int, cos,
                         cp_enabled: bool = False) -> bool:
    """Fused flash (BLHD) kernel dispatch: explicit "pallas", or "auto" on
    TPU (the fused short-sequence path beats XLA attention at every measured
    L, PERFORMANCE.md). Under context parallelism the kernel runs as a
    ppermute ring inside shard_map (cp_rope_flash_attention); the ring
    kernels are RoPE-fused, so a use_rope=False model under CP takes the
    XLA path instead. The flat-head [B, L, H*D] layout blocks the lane
    dimension by head_dim, and Pallas requires lane blocks to be 128-
    aligned — "auto" falls back to XLA for head_dim % 128 != 0 (tiny/test
    configs); explicit "pallas" still raises so a misconfigured production
    run fails loudly instead of silently losing the kernel."""
    if cos is None and cp_enabled:
        return False
    if cfg.attention_impl == "pallas":
        return True
    if cfg.attention_impl == "auto":
        return jax.default_backend() == "tpu" and cfg.head_dim % 128 == 0
    return False


def block_forward(
    bp: Params,
    cfg: DiTConfig,
    x: jnp.ndarray,
    context: jnp.ndarray,
    t_emb: jnp.ndarray,
    cos: Optional[jnp.ndarray],
    sin: Optional[jnp.ndarray],
    v0: jnp.ndarray,
    use_v0,
    token_sharding=None,
    context_kv: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One DiT block (`model.py:96-167`). Returns (x, v) where v is the
    (possibly value-residual-mixed) self-attention value tensor; the caller
    captures block 0's v as v0 (`model.py:379-384`)."""
    cdt = cfg.compute_dtype
    nh, hd = cfg.num_heads, cfg.head_dim
    b, l, d = x.shape

    mod = _dense(bp["adaLN_modulation"], jax.nn.silu(t_emb), cdt)  # [B, 9D]
    (
        shift_sa, scale_sa, gate_sa,
        shift_ca, scale_ca, gate_ca,
        shift_mlp, scale_mlp, gate_mlp,
    ) = jnp.split(mod, 9, axis=-1)

    # --- Self attention ---
    xn = _norm_modulate(cfg, x, bp["norm1"].get("scale"), shift_sa, scale_sa)
    qkv = _dense(bp["qkv"], xn, cdt)  # [B, L, 3D]
    # feature layout (k, h, d) — reference "b l (k h d)" (`model.py:126`)
    v = qkv[..., 2 * d:]

    if cfg.residual_v:
        lam = bp["lambda_param"].astype(cdt)
        v = jnp.where(use_v0, lam * v + (1 - lam) * v0, v)

    cp_on = token_sharding is not None
    if _use_fused_attention(cfg, l, cos, cp_enabled=cp_on):
        if cp_on:
            from video_diffusion_speedrun_tpu.ops.fused_attention import (
                cp_rope_flash_attention,
            )

            q, k = qkv[..., :d], qkv[..., d:2 * d]
            attn_out = cp_rope_flash_attention(
                q, k, v, cos, sin, nh, token_sharding
            )
        elif cos is None:
            from video_diffusion_speedrun_tpu.ops.fused_attention import (
                norope_flash_attention,
            )

            q, k = qkv[..., :d], qkv[..., d:2 * d]
            attn_out = norope_flash_attention(q, k, v, nh)
        else:
            from video_diffusion_speedrun_tpu.ops.fused_attention import (
                SHORT_MAX_KV,
                qkv_rope_flash_attention,
                rope_flash_attention,
            )

            if l <= SHORT_MAX_KV:
                # q/k read straight from the fused projection — no slices
                attn_out = qkv_rope_flash_attention(qkv, v, cos, sin, nh)
            else:
                q, k = qkv[..., :d], qkv[..., d:2 * d]
                attn_out = rope_flash_attention(q, k, v, cos, sin, nh)
    else:
        q, k = qkv[..., :d], qkv[..., d:2 * d]
        qh, kh, vh = (
            t.reshape(b, l, nh, hd).transpose(0, 2, 1, 3) for t in (q, k, v)
        )
        if cos is not None:
            qh = apply_rotary(qh, cos, sin)
            kh = apply_rotary(kh, cos, sin)
        out = attention(qh, kh, vh, impl="xla")
        attn_out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
    attn_out = _dense(bp["attn_proj"], attn_out, cdt)
    has_cross = cfg.cross_attn_input_size is not None
    if _use_fused_adaln(cfg) and cfg.fused_residual:
        # fuse the residual join with the next sub-layer's norm prologue
        from video_diffusion_speedrun_tpu.ops.fused_adaln import (
            gated_residual_adaln,
        )

        next_norm = ("norm2", shift_ca, scale_ca) if has_cross else (
            "norm3", shift_mlp, scale_mlp)
        x, xn = gated_residual_adaln(
            x, attn_out, gate_sa, next_norm[1], next_norm[2],
            bp[next_norm[0]].get("scale"))
    else:
        x = x + attn_out * gate_sa[:, None, :]
        xn = None

    # --- Cross attention ---
    if has_cross:
        if xn is None:
            xn = _norm_modulate(cfg, x, bp["norm2"].get("scale"), shift_ca,
                                scale_ca)
        qc = _dense(bp["q_cross"], xn, cdt)
        # context K/V: precomputed per generation in the sampler (the context
        # is constant across Euler steps) or projected on the fly in training
        if context_kv is not None:
            ckv = context_kv
        else:
            ckv = _dense(bp["context_kv"], context, cdt)  # [B, Lc, 2D]
        lc = ckv.shape[1]
        if _use_fused_attention(cfg, l, cos):
            # flat-head short-path kernel: k/v are straight column slices of
            # the (2, h, d)-laid-out context projection — no transposes
            from video_diffusion_speedrun_tpu.ops.fused_attention import (
                cross_flash_attention,
            )

            cross_out = cross_flash_attention(qc, ckv[..., :d], ckv[..., d:],
                                              nh)
        else:
            qch = qc.reshape(b, l, nh, hd).transpose(0, 2, 1, 3)
            ckvh = ckv.reshape(b, lc, 2, nh, hd).transpose(2, 0, 3, 1, 4)
            kc, vc = ckvh[0], ckvh[1]
            cross_out = attention(qch, kc, vc, impl="xla")
            cross_out = cross_out.transpose(0, 2, 1, 3).reshape(b, l, d)
        cross_out = _dense(bp["cross_proj"], cross_out, cdt)
        if _use_fused_adaln(cfg) and cfg.fused_residual:
            from video_diffusion_speedrun_tpu.ops.fused_adaln import (
                gated_residual_adaln,
            )

            x, xn = gated_residual_adaln(
                x, cross_out, gate_ca, shift_mlp, scale_mlp,
                bp["norm3"].get("scale"))
        else:
            x = x + cross_out * gate_ca[:, None, :]
            xn = None

    # --- MLP ---
    if xn is None:
        xn = _norm_modulate(cfg, x, bp["norm3"].get("scale"), shift_mlp,
                            scale_mlp)
    if _use_fused_adaln(cfg):
        # bias+GELU via the clip-free FMA-chain Φ poly (ops/fused_gelu
        # _phi_poly, |erf err| below bf16 resolution — same fwd numerics as
        # the pallas bias_gelu kernel), written in XLA so it fuses into the
        # fc1 matmul epilogue: unlike XLA's own erf lowering (measured
        # 0.11 → 0.35 ms dragging the MXU), the 16-op poly rides the
        # epilogue and the pre-GELU activation never round-trips HBM.
        # Step-level A/B vs the pallas kernel: canonical 85.4 → 77.4 ms
        # (52.2 → 57.6% MFU), odd-frame 92.2 → 86.8, L=8208 284.5 → 279.8.
        from video_diffusion_speedrun_tpu.ops.fused_gelu import _phi_poly

        h = jnp.dot(xn, bp["mlp"]["fc1"]["weight"].astype(cdt))
        hf = (h + bp["mlp"]["fc1"]["bias"].astype(cdt)).astype(jnp.float32)
        h = (hf * _phi_poly(hf)).astype(cdt)
    else:
        h = _dense(bp["mlp"]["fc1"], xn, cdt)
        h = jax.nn.gelu(h, approximate=False)  # torch nn.GELU default = exact erf
    h = _dense(bp["mlp"]["fc2"], h, cdt)
    x = x + h * gate_mlp[:, None, :]

    if token_sharding is not None:
        x = jax.lax.with_sharding_constraint(x, token_sharding)

    return x, v


def dit_forward(
    params: Params,
    cfg: DiTConfig,
    x: jnp.ndarray,
    context: jnp.ndarray,
    timesteps: jnp.ndarray,
    *,
    rope_offsets: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    token_sharding=None,
    context_kv: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """DiT forward (`model.py:358-402`).

    x [B, C, T, H, W], context [B, Lc, ctx_dim], timesteps [B] → [B, C, T, H, W].

    RoPE crop-offset augmentation: pass `rng` to draw random offsets per call
    (reference behaviour, `model.py:224-226` — active at eval/sampling too), or
    pass explicit `rope_offsets` [3] for determinism; default is zero offsets.

    `token_sharding` (a NamedSharding over [B, L, D]) enables context
    parallelism: the token axis is sharded over the mesh's `context` axis and
    GSPMD inserts the k/v all-gathers attention needs — sequence lengths can
    then exceed one chip's activation memory (the reference has no SP/CP at
    all, SURVEY.md §2b).

    `context_kv` [depth, B, Lc, 2D] (from `precompute_context_kv`) skips the
    per-layer context projections — for sampling, where the prompt embedding
    is constant across all Euler steps (the reference reprojects it in every
    one of its 2×50 forwards, `sampling/sample.py:139-141`).
    """
    cdt = cfg.compute_dtype
    b, c, t, h, w = x.shape
    gt, gh, gw = t // cfg.time_patch_size, h // cfg.patch_size, w // cfg.patch_size
    r = cfg.num_registers

    tokens = patchify(
        x, params["patch_proj"]["weight"], params["patch_proj"].get("bias"),
        cfg.time_patch_size, cfg.patch_size, compute_dtype=cdt,
    )  # [B, L, D]
    regs = jnp.broadcast_to(
        params["register_tokens"].astype(cdt), (b, r, cfg.hidden_size)
    )
    if token_sharding is not None:
        # anchor BOTH concat operands, not just the result: on 4-axis
        # meshes inside a microbatch scan, shardy otherwise back-propagates
        # a seq-split sharding into the register broadcast while another
        # path wants batch×hidden — an involuntary replicate-repartition
        # per microbatch (round-4 VERDICT weak #2/#6)
        regs = jax.lax.with_sharding_constraint(regs, token_sharding)
        tokens = jax.lax.with_sharding_constraint(tokens, token_sharding)
    tokens = jnp.concatenate([regs, tokens], axis=1)  # [B, R+L, D]
    if token_sharding is not None:
        tokens = jax.lax.with_sharding_constraint(tokens, token_sharding)

    if cfg.use_rope:
        if rope_offsets is None:
            if rng is not None:
                rope_offsets = random_rope_offsets(
                    rng, gt, gh, gw, cfg.rope_max_t, cfg.rope_max_h, cfg.rope_max_w
                )
            else:
                rope_offsets = jnp.zeros((3,), jnp.int32)
        cos, sin = rope_cos_sin(
            cfg.head_dim, gt, gh, gw, rope_offsets,
            base=cfg.rope_base, num_registers=r, order=cfg.rope_order,
        )
    else:
        # working version of the reference's vestigial no-rope path
        # (`model.py:313-314`; its forward unconditionally calls self.rope and
        # would crash with use_rope=False)
        cos = sin = None
        pos = params["positional_embedding"][:, : tokens.shape[1]].astype(cdt)
        tokens = tokens + pos

    t_emb = timestep_embedding(timesteps, cfg.hidden_size).astype(cdt)
    t_emb = _dense(params["time_embed"]["fc2"],
                   jax.nn.silu(_dense(params["time_embed"]["fc1"], t_emb, cdt)), cdt)

    ltot = tokens.shape[1]
    v0_init = jnp.zeros((b, ltot, cfg.hidden_size), cdt)

    block_fn = block_forward
    if cfg.remat:
        # "attn"/"dots_attn" additionally save the flash kernel outputs
        # (named in ops/fused_attention._name_attn_residuals): the `dots`
        # policy cannot see them (a pallas_call is not a dot), so any
        # dots/nothing remat re-executes the O(L²) forward kernel in the
        # backward — the dominant recompute at long context.
        policy = {
            "nothing": jax.checkpoint_policies.nothing_saveable,
            "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            "attn": jax.checkpoint_policies.save_only_these_names(
                "attn_out", "attn_lse"),
            "dots_attn": jax.checkpoint_policies.save_from_both_policies(
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                jax.checkpoint_policies.save_only_these_names(
                    "attn_out", "attn_lse")),
        }[cfg.remat_policy]
        block_fn = jax.checkpoint(
            block_forward,
            policy=policy,
            static_argnums=(1, 9),  # cfg, token_sharding
        )

    if cfg.scan_blocks:
        def scan_body(carry, inputs):
            xx, v0 = carry
            bp, idx, ckv = inputs
            xx, v = block_fn(bp, cfg, xx, context, t_emb, cos, sin, v0,
                             idx > 0, token_sharding, ckv)
            v0 = jnp.where(idx == 0, v, v0)
            return (xx, v0), None

        (tokens, _), _ = jax.lax.scan(
            scan_body,
            (tokens, v0_init),
            (params["blocks"], jnp.arange(cfg.depth), context_kv),
        )
    else:
        xx, v0 = tokens, v0_init
        for i in range(cfg.depth):
            bp = jax.tree.map(lambda p: p[i], params["blocks"])
            xx, v = block_fn(bp, cfg, xx, context, t_emb, cos, sin, v0, i > 0,
                             token_sharding,
                             None if context_kv is None else context_kv[i])
            if i == 0:
                v0 = v
        tokens = xx

    tokens = tokens[:, r:, :]
    fmod = _dense(params["final_modulation"], jax.nn.silu(t_emb), cdt)
    final_shift, final_scale = jnp.split(fmod, 2, axis=-1)  # shift first (`model.py:387`)
    tokens = _norm_modulate(cfg, tokens, params["final_norm"].get("scale"),
                            final_shift, final_scale)
    tokens = _dense(params["final_proj"], tokens, cdt)

    return unpatchify(
        tokens, gt, gh, gw, cfg.time_patch_size, cfg.patch_size, cfg.out_channels
    )
