"""Fused RoPE + flash attention, BLHD layout (Pallas TPU).

v2 of the self-attention hot path: relative to ops/flash_attention.py this
kernel
  - takes q/k/v in their natural flat [B, L, H·D] layout (straight slices of
    the fused qkv projection — no [B,H,L,D] transposes in or out; each grid
    step block-slices one head's D columns, which also satisfies the TPU
    (8, 128) block-tiling rule where a singleton head dim would not), and
  - applies the 3D-RoPE rotation to q/k *inside* the kernel (fp32, on data
    already resident in VMEM), eliminating the rotated-q/k HBM round trip of
    a separate `apply_rotary` (`models/rope.py`).

The backward recomputes P from (Q, K, LSE) like the standard flash backward
and rotates the accumulated dQ/dK back through the transpose of the rotation
(RoPE is orthogonal: forward y = R·x with R = [[c, s], [−s, c]] per frequency
pair — the reference convention `model.py:266-275` — so dx = Rᵀ·dy).

Replaces SDPA+rope of the reference self-attention (`model.py:132-136`).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_diffusion_speedrun_tpu.ops.pallas_utils import (
    cdiv as _cdiv,
    fit_block as _fit_block,
    fit_block_div as _fit_block_div,
    interpret_mode as _interpret,
    pad_dim as _pad_dim,
)

DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 1024
_NEG_INF = -1e30
_LOG2E = 1.4426950408889634  # softmax runs in the exp2 domain (native VPU op)


def _vmem_limit(block_q: int, block_k: int):
    """Scoped-vmem limit override for the blocked kernels: tiles beyond
    1024² exceed the 16 MB compiler default (the fp32 logits-tile family
    alone is ~12 B/logit on the backward); v5e has 128 MB physical VMEM.
    Returns None at the default sizes so standard-tile compiles keep the
    compiler's own budgetting."""
    if block_q * block_k <= 1024 * 1024:
        return None
    return 96 * 1024 * 1024


def _name_attn_residuals(o, lse):
    """Tag the kernel outputs for `jax.checkpoint` save policies.

    Under gradient checkpointing the backward re-runs the block forward to
    regenerate residuals — including this O(L²) kernel, whose recompute
    dominates at long context (the `dots` policy does not catch it: a
    pallas_call is not a dot primitive). Naming o/lse lets the `attn` /
    `dots_attn` policies (models/dit.py) save exactly these two arrays
    (~L·width bf16 + L·H fp32 per block — a few MB) so the backward reuses
    them and recomputes only the cheap projections."""
    return (_checkpoint_name(o, "attn_out"),
            _checkpoint_name(lse, "attn_lse"))


def _rope_rotate(x, cos, sin):
    """y = [x1·c + x2·s, −x1·s + x2·c] (reference convention), fp32."""
    d = x.shape[-1] // 2
    x1, x2 = x[:, :d], x[:, d:]
    return jnp.concatenate([x1 * cos + x2 * sin, -x1 * sin + x2 * cos], -1)


def _rope_rotate_t(x, cos, sin):
    """Transpose (= inverse) rotation: dy → dx."""
    d = x.shape[-1] // 2
    x1, x2 = x[:, :d], x[:, d:]
    return jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], -1)


def _rotate_flat(x, cos, sin, h, transpose=False):
    """RoPE over the flat [B, L, H·D] layout as ONE XLA elementwise pass
    (head h's pair halves at columns [h·D, h·D+D/2) / [h·D+D/2, h·D+D)).

    Used by the pre-rotated long-path mode: at L ≫ block the in-kernel
    rotation re-rotates the same rows once per opposing block (nk×/nq×)
    and re-DMAs a [block, D/2] table slice per grid step — ~1 µs of the
    ~6–13 µs tile budget. Rotating once per layer here costs one
    read+write of x instead. Same rounding points as the in-kernel form:
    fp32 math on the bf16 input, cast back to x.dtype."""
    b, l, hd = x.shape
    d = hd // h
    xr = x.reshape(b, l, h, 2, d // 2).astype(jnp.float32)
    x1, x2 = xr[:, :, :, 0], xr[:, :, :, 1]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    if transpose:
        y1, y2 = x1 * c - x2 * s, x1 * s + x2 * c
    else:
        y1, y2 = x1 * c + x2 * s, -x1 * s + x2 * c
    return jnp.stack([y1, y2], axis=3).reshape(b, l, hd).astype(x.dtype)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel_nobias(q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref, sk_ref,
                       o_ref, lse_ref, m_scr, l_scr, acc_scr,
                       *, scale, kv_len, block_k):
    """No-bias arity: the kb operand is OMITTED entirely when unused — even
    a 16-wide constant-index dummy measured 2x on the long-path forward
    (1.60 → 3.00 ms at L=8192; it breaks the pipeline's double-buffering)."""
    _fwd_kernel(q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref, sk_ref,
                None, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                scale=scale, kv_len=kv_len, block_k=block_k, has_bias=False)


def _fwd_kernel_noro(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr,
                     acc_scr, *, scale, kv_len, block_k):
    """Pre-rotated arity: q/k already carry RoPE (rotated once per layer
    outside — at long L the in-kernel rotation re-rotates the same rows
    nk× and re-DMAs a table block per grid step; see `_rotate_flat`).
    Table operands are OMITTED entirely (same pipeline rule as no-bias)."""
    _fwd_kernel(q_ref, k_ref, v_ref, None, None, None, None,
                None, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                scale=scale, kv_len=kv_len, block_k=block_k, has_bias=False)


def _fwd_kernel_noro2(q_ref, k_ref, v_ref, o_ref, lse_ref,
                      m_scr, l_scr, acc_scr, *, scale, sub):
    """Dual-subtile pre-rotated forward: the single-tile kernel's strict
    serial chain (s → max → exp2 → p·v) leaves MXU and VPU mutually idle
    (trace: fwd 65% of peak vs 94% for the backward, whose dp = do·vᵀ
    chain is independent of the softmax chain). Two independent [bq, sub]
    sub-tiles per grid step give the scheduler parallel chains to
    interleave. kv_len % (2·sub) == 0 guaranteed by the caller."""
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                       # [bq, D] (pre-rotated)
    k = k_ref[0]                       # [2·sub, D]
    v = v_ref[0]
    c = scale * _LOG2E
    s_a = jax.lax.dot_general(q, k[:sub], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32) * c
    s_b = jax.lax.dot_general(q, k[sub:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32) * c

    m_prev = m_scr[:, :1]
    l_prev = l_scr[:, :1]
    m_cur = jnp.maximum(jnp.max(s_a, axis=1, keepdims=True),
                        jnp.max(s_b, axis=1, keepdims=True))
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)
    p_a = jnp.exp2(s_a - m_new)
    p_b = jnp.exp2(s_b - m_new)
    l_scr[:] = jnp.broadcast_to(
        alpha * l_prev + jnp.sum(p_a, 1, keepdims=True)
        + jnp.sum(p_b, 1, keepdims=True), l_scr.shape)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p_a.astype(v.dtype), v[:sub], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        p_b.astype(v.dtype), v[sub:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(ki == nk - 1)
    def _():
        l = l_scr[:, :1]
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)
        lse_ref[0, 0] = m_scr[:, :1] + jnp.log2(l)


def _fwd_kernel(q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref, sk_ref,
                kb_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                *, scale, kv_len, block_k, has_bias=False):
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32)   # [bq, D]
    k = k_ref[0].astype(jnp.float32)   # [bk, D]
    v = v_ref[0]                        # [bk, D]

    if cq_ref is not None:
        q = _rope_rotate(q, cq_ref[:], sq_ref[:])
        k = _rope_rotate(k, ck_ref[:], sk_ref[:])

    # logits in the exp2 domain: fold log2(e) into the scale so the online
    # softmax uses the VPU-native exp2 instead of exp
    s = jax.lax.dot_general(
        q.astype(v.dtype), k.astype(v.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (scale * _LOG2E)
    if has_bias:  # additive kv mask (ring CP tails) — before the pad mask
        s = s + kb_ref[:]

    if kv_len % block_k != 0:  # static: mask only ragged tails
        kmax = kv_len - ki * block_k
        mask = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) < kmax
        s = jnp.where(mask, s, _NEG_INF)

    m_prev = m_scr[:, :1]
    l_prev = l_scr[:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(s - m_new)
    l_scr[:] = jnp.broadcast_to(alpha * l_prev + jnp.sum(p, 1, keepdims=True),
                                l_scr.shape)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(ki == nk - 1)
    def _():
        l = l_scr[:, :1]
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)
        # LSE stays in the exp2 domain (internal to this custom VJP).
        # Column layout [b,h,L,1] at the KERNEL boundary (same as the short
        # path): block_q sits in the sublane dim, so it needs only
        # 8-alignment — which lets fit_block_div tile ragged L (e.g.
        # 8208 = 9×912) exactly instead of padding to the next 128-multiple
        # per block (8208 → 9216: +27% tiles on both grid axes). The
        # function boundary squeezes to [b,h,L]: keeping the 4-D form in
        # the saved residual OOMed the L=8208 full step.
        lse_ref[0, 0] = m_scr[:, :1] + jnp.log2(l)


def _forward(q, k, v, cos_q, sin_q, cos_k, sin_k, h, scale, block_q, block_k,
             kbias=None):
    b, lq, hd = q.shape
    d = hd // h
    lk = k.shape[1]
    has_bias = kbias is not None
    pre_roped = cos_q is None  # q/k already rotated — no table operands
    # prefer exact divisor blocks (16-aligned — block_q/block_k only ever
    # sit in sublane dims) so ragged video lengths (L = tokens + registers,
    # e.g. 8208) tile with zero padding; fall back to minimal 128-pad blocks.
    # The kbias row [1, lk] puts block_k in LANES → 128-mult when present.
    block_q = _fit_block_div(lq, block_q, align=_ALIGN)
    block_k = (_fit_block(lk, block_k) if has_bias
               else _fit_block_div(lk, block_k, align=_ALIGN))

    qp = _pad_dim(q, 1, block_q)
    kp = _pad_dim(k, 1, block_k)
    vp = _pad_dim(v, 1, block_k)
    lqp, lkp = qp.shape[1], kp.shape[1]
    nq, nk = lqp // block_q, lkp // block_k
    dh = d // 2
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, h, qi, ki: (b, qi, h)),
        pl.BlockSpec((1, block_k, d), lambda b, h, qi, ki: (b, ki, h)),
        pl.BlockSpec((1, block_k, d), lambda b, h, qi, ki: (b, ki, h)),
    ]
    operands = [qp, kp, vp]
    if not pre_roped:
        in_specs += [
            pl.BlockSpec((block_q, dh), lambda b, h, qi, ki: (qi, 0)),
            pl.BlockSpec((block_q, dh), lambda b, h, qi, ki: (qi, 0)),
            pl.BlockSpec((block_k, dh), lambda b, h, qi, ki: (ki, 0)),
            pl.BlockSpec((block_k, dh), lambda b, h, qi, ki: (ki, 0)),
        ]
        operands += [_pad_dim(cos_q, 0, block_q), _pad_dim(sin_q, 0, block_q),
                     _pad_dim(cos_k, 0, block_k), _pad_dim(sin_k, 0, block_k)]
    dual = pre_roped and not has_bias and lk % (2 * block_k) == 0 \
        and lk // (2 * block_k) >= 2
    if dual:
        # dual-subtile kv window: block index strides by 2·block_k
        in_specs[1] = pl.BlockSpec((1, 2 * block_k, d),
                                   lambda b, h, qi, ki: (b, ki, h))
        in_specs[2] = pl.BlockSpec((1, 2 * block_k, d),
                                   lambda b, h, qi, ki: (b, ki, h))
        nk = lkp // (2 * block_k)
    if has_bias:  # [1, lk] additive mask, block-sliced along kv
        assert not pre_roped  # ring path always carries tables
        in_specs.append(
            pl.BlockSpec((1, block_k), lambda b, h, qi, ki: (0, ki)))
        operands.append(_pad_dim(kbias, 1, block_k))
        kern = functools.partial(_fwd_kernel, scale=scale, kv_len=lk,
                                 block_k=block_k, has_bias=True)
    elif dual:
        kern = functools.partial(_fwd_kernel_noro2, scale=scale,
                                 sub=block_k)
    elif pre_roped:
        kern = functools.partial(_fwd_kernel_noro, scale=scale, kv_len=lk,
                                 block_k=block_k)
    else:  # no kb operand at all (see _fwd_kernel_nobias)
        kern = functools.partial(_fwd_kernel_nobias, scale=scale, kv_len=lk,
                                 block_k=block_k)

    o, lse = pl.pallas_call(
        kern,
        grid=(b, h, nq, nk),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, h, qi, ki: (b, qi, h)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, qi, ki: (b, h, qi, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, lqp, hd), q.dtype),
            jax.ShapeDtypeStruct((b, h, lqp, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=_vmem_limit(block_q, (2 if dual else 1) * block_k),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lqp * lkp * d,
            bytes_accessed=2 * b * h * (lqp + 2 * lkp) * d,
            transcendentals=b * h * lqp * lkp,
        ),
        interpret=_interpret(),
    )(*operands)
    # boundary layout: [b, h, L] (the 4-D kernel layout is internal)
    return o[:, :lq], lse[:, :, :lq, 0]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_dkv_kernel_nobias(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                           cq_ref, sq_ref, ck_ref, sk_ref,
                           dk_ref, dv_ref, *refs,
                           scale, kv_len, block_k, emit_dq=True):
    """No-bias arity — see _fwd_kernel_nobias."""
    _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    cq_ref, sq_ref, ck_ref, sk_ref, None,
                    dk_ref, dv_ref, *refs,
                    scale=scale, kv_len=kv_len, block_k=block_k,
                    emit_dq=emit_dq, has_bias=False)


def _bwd_dkv_kernel_noro(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dk_ref, dv_ref, *refs,
                         scale, kv_len, block_k, emit_dq=True):
    """Pre-rotated arity (see _fwd_kernel_noro): emits dq partials and dk
    in ROPED space — the caller applies the transpose rotation outside,
    folded into the dq partials reduction / the dk epilogue."""
    _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    None, None, None, None, None,
                    dk_ref, dv_ref, *refs,
                    scale=scale, kv_len=kv_len, block_k=block_k,
                    emit_dq=emit_dq, has_bias=False)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    cq_ref, sq_ref, ck_ref, sk_ref, kb_ref,
                    dk_ref, dv_ref, *refs,
                    scale, kv_len, block_k, emit_dq=True, has_bias=False):
    """dk/dv via scratch accumulation over the q grid, plus per-ki dq
    PARTIALS written to HBM (summed outside) — one s/p recompute for all
    three gradients instead of the two full passes of a separate dq kernel
    (saves ~25% of attention-backward FLOPs; the partial buffer is
    nk × dq-sized — bounded by the _MAX_DQ_PARTIALS fallback)."""
    if emit_dq:
        dqp_ref, dk_scr, dv_scr = refs
    else:
        dk_scr, dv_scr = refs
    qi = pl.program_id(3)
    nq = pl.num_programs(3)
    ki = pl.program_id(2)

    @pl.when(qi == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    if cq_ref is not None:
        q = _rope_rotate(q, cq_ref[:], sq_ref[:])
        k = _rope_rotate(k, ck_ref[:], sk_ref[:])
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0]      # [bq, 1] — column layout (see forward)
    delta = delta_ref[0, 0]

    # every scalar fold lives on a [*, D] operand (block/D× fewer VPU ops
    # than the [bq, bk] logits tile): qs carries scale·log2e into the s
    # matmul (matching the forward's fold bit-for-bit at bf16), and ds
    # stays UNSCALED with `scale` carried by qd/kd into the dk/dq matmuls
    qs = (q * (scale * _LOG2E)).astype(v.dtype)
    qd = (q * scale).astype(v.dtype)
    kc = k.astype(v.dtype)
    s = jax.lax.dot_general(qs, kc, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if has_bias:
        s = s + kb_ref[:]
    p = jnp.exp2(s - lse)  # lse is log2-domain (see forward)
    if kv_len % block_k != 0:  # static: mask only ragged tails
        kmax = kv_len - ki * block_k
        mask = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1) < kmax
        p = jnp.where(mask, p, 0.0)

    pt = p.astype(do.dtype)
    dv_scr[:] += jax.lax.dot_general(pt, do, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = (p * (dp - delta)).astype(do.dtype)
    dk_scr[:] += jax.lax.dot_general(ds, qd, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    if emit_dq:
        kd = (k * scale).astype(v.dtype)
        dq_part = jax.lax.dot_general(ds, kd, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        if cq_ref is not None:
            # rotation is linear: rotate each partial back; the outside sum
            # of rotated partials equals the rotation of the summed dq
            dq_part = _rope_rotate_t(dq_part, cq_ref[:], sq_ref[:])
        dqp_ref[0, 0] = dq_part.astype(dqp_ref.dtype)

    @pl.when(qi == nq - 1)
    def _():
        # rotate accumulated dK (in roped space) back: dk = Rᵀ·dk_roped
        # (pre-rotated mode leaves it roped; the caller rotates outside)
        dk = dk_scr[:]
        if ck_ref is not None:
            dk = _rope_rotate_t(dk, ck_ref[:], sk_ref[:])
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_dq_kernel_nobias(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          cq_ref, sq_ref, ck_ref, sk_ref,
                          dq_ref, dq_scr,
                          *, scale, kv_len, block_k):
    """No-bias arity — see _fwd_kernel_nobias."""
    _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   cq_ref, sq_ref, ck_ref, sk_ref, None,
                   dq_ref, dq_scr,
                   scale=scale, kv_len=kv_len, block_k=block_k,
                   has_bias=False)


def _bwd_dq_kernel_noro(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                        dq_ref, dq_scr, *, scale, kv_len, block_k):
    """Pre-rotated arity — dq emitted in roped space (see
    _bwd_dkv_kernel_noro)."""
    _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   None, None, None, None, None,
                   dq_ref, dq_scr,
                   scale=scale, kv_len=kv_len, block_k=block_k,
                   has_bias=False)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   cq_ref, sq_ref, ck_ref, sk_ref, kb_ref,
                   dq_ref, dq_scr,
                   *, scale, kv_len, block_k, has_bias=False):
    """Separate dq pass for VERY long kv (nk > _MAX_DQ_PARTIALS), where the
    fused dq-partials buffer (nk × |dq| fp32) would grow quadratically in
    L; costs one extra s/p recompute instead."""
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    if cq_ref is not None:
        q = _rope_rotate(q, cq_ref[:], sq_ref[:])
        k = _rope_rotate(k, ck_ref[:], sk_ref[:])
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0]      # [bq, 1] — column layout (see forward)
    delta = delta_ref[0, 0]

    # scalar folds on [*, D] operands — see _bwd_dkv_kernel
    qs = (q * (scale * _LOG2E)).astype(v.dtype)
    kc = k.astype(v.dtype)
    kd = (k * scale).astype(v.dtype)
    s = jax.lax.dot_general(qs, kc, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if has_bias:
        s = s + kb_ref[:]
    p = jnp.exp2(s - lse)
    if kv_len % block_k != 0:
        kmax = kv_len - ki * block_k
        mask = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1) < kmax
        p = jnp.where(mask, p, 0.0)

    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = (p * (dp - delta)).astype(do.dtype)
    dq_scr[:] += jax.lax.dot_general(ds, kd, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _():
        dq = dq_scr[:]
        if cq_ref is not None:
            dq = _rope_rotate_t(dq, cq_ref[:], sq_ref[:])
        dq_ref[0] = dq.astype(dq_ref.dtype)


# above this, the fused dq-partials buffer (nk × fp32 dq) stays < ~16×|q|;
# beyond it fall back to the separate dq pass (one extra s/p recompute)
_MAX_DQ_PARTIALS = 16


def _backward(q, k, v, cos_q, sin_q, cos_k, sin_k, h, o, lse, do, scale,
              block_q, block_k, kbias=None):
    """cos_q=None ⇒ pre-rotated mode: q/k already carry RoPE and the
    returned dq/dk are in ROPED space (callers fold the transpose rotation
    into their own epilogues)."""
    b, lq, hd = q.shape
    d = hd // h
    lk = k.shape[1]
    has_bias = kbias is not None
    pre_roped = cos_q is None
    # divisor blocks (see _forward) — block_q/block_k live in sublane dims
    # everywhere; only the kbias row pins block_k to lanes (128-mult).
    # fp32 inputs double the double-buffered operand windows: at
    # (1024, 1024) the dkv kernel measures ~292 KB over the 16 MB scoped
    # budget, so cap fp32 blocks at 768 (bf16 production path unaffected).
    if q.dtype.itemsize >= 4:
        block_q, block_k = min(block_q, 768), min(block_k, 768)
    block_q = _fit_block_div(lq, block_q, align=_ALIGN)
    block_k = (_fit_block(lk, block_k) if has_bias
               else _fit_block_div(lk, block_k, align=_ALIGN))
    dh = d // 2

    dof = do.astype(jnp.float32).reshape(b, lq, h, d)
    of = o.astype(jnp.float32).reshape(b, lq, h, d)
    delta = jnp.einsum("blhd,blhd->bhl", dof, of)

    qp = _pad_dim(q, 1, block_q)
    dop = _pad_dim(do, 1, block_q)
    kp = _pad_dim(k, 1, block_k)
    vp = _pad_dim(v, 1, block_k)
    lqp, lkp = qp.shape[1], kp.shape[1]
    nq, nk = lqp // block_q, lkp // block_k
    # lse/delta enter at the boundary layout [b,h,L]; the kernels read the
    # 4-D column layout [b,h,Lp,1] (block_q in sublanes — no 128 constraint)
    lsep = _pad_dim(lse, 2, block_q)[..., None]
    deltap = _pad_dim(delta, 2, block_q)[..., None]
    interpret = _interpret()
    common = dict(scale=scale, kv_len=lk, block_k=block_k)
    if not pre_roped:
        tabs = [_pad_dim(cos_q, 0, block_q), _pad_dim(sin_q, 0, block_q),
                _pad_dim(cos_k, 0, block_k), _pad_dim(sin_k, 0, block_k)]
    if has_bias:
        assert not pre_roped  # ring path always carries tables
        common["has_bias"] = True
        kb = [_pad_dim(kbias, 1, block_k)]
        kb_s = [pl.BlockSpec((1, block_k), lambda b, h, ki, qi: (0, ki))]
        kb_s2 = [pl.BlockSpec((1, block_k), lambda b, h, qi, ki: (0, ki))]
        dkv_kern, dq_kern = _bwd_dkv_kernel, _bwd_dq_kernel
    elif pre_roped:
        kb, kb_s, kb_s2 = [], [], []
        dkv_kern, dq_kern = _bwd_dkv_kernel_noro, _bwd_dq_kernel_noro
    else:  # no kb operand at all (see _fwd_kernel_nobias)
        kb, kb_s, kb_s2 = [], [], []
        dkv_kern, dq_kern = _bwd_dkv_kernel_nobias, _bwd_dq_kernel_nobias

    qspec = pl.BlockSpec((1, block_q, d), lambda b, h, ki, qi: (b, qi, h))
    kspec = pl.BlockSpec((1, block_k, d), lambda b, h, ki, qi: (b, ki, h))
    lspec = pl.BlockSpec((1, 1, block_q, 1), lambda b, h, ki, qi: (b, h, qi, 0))
    cq_s = pl.BlockSpec((block_q, dh), lambda b, h, ki, qi: (qi, 0))
    ck_s = pl.BlockSpec((block_k, dh), lambda b, h, ki, qi: (ki, 0))
    tab_s = [] if pre_roped else [cq_s, cq_s, ck_s, ck_s]
    tab_ops = [] if pre_roped else tabs

    fuse_dq = nk <= _MAX_DQ_PARTIALS
    if fuse_dq:
        dqp_spec = pl.BlockSpec((1, 1, block_q, d),
                                lambda b, h, ki, qi: (ki, b, qi, h))
        # partials stored in the INPUT dtype (bf16 on the production path):
        # the nk×|dq| buffer is pure HBM traffic (written by the kernel,
        # reduced outside in fp32) — at L=8208/nk=9 this halves ~600 MB of
        # traffic per layer backward. dq is consumed in q.dtype anyway;
        # fp32 inputs keep fp32 partials (the parity-test path).
        dk, dv, dqp = pl.pallas_call(
            functools.partial(dkv_kern, **common),
            grid=(b, h, nk, nq),
            in_specs=[qspec, kspec, kspec, qspec, lspec, lspec]
                     + tab_s + kb_s,
            out_specs=(kspec, kspec, dqp_spec),
            out_shape=(
                jax.ShapeDtypeStruct((b, lkp, hd), k.dtype),
                jax.ShapeDtypeStruct((b, lkp, hd), v.dtype),
                jax.ShapeDtypeStruct((nk, b, lqp, hd), q.dtype),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_k, d), jnp.float32),
                pltpu.VMEM((block_k, d), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary"),
            ),
            interpret=interpret,
        )(qp, kp, vp, dop, lsep, deltap, *tab_ops, *kb)
        # reduce in fp32 regardless of storage dtype (one fused pass:
        # bf16 reads, fp32 accumulate, bf16 write)
        dq = dqp.sum(axis=0, dtype=jnp.float32).astype(q.dtype)
        return dq[:, :lq], dk[:, :lk], dv[:, :lk]

    dk, dv = pl.pallas_call(
        functools.partial(dkv_kern, emit_dq=False, **common),
        grid=(b, h, nk, nq),
        in_specs=[qspec, kspec, kspec, qspec, lspec, lspec] + tab_s + kb_s,
        out_specs=(kspec, kspec),
        out_shape=(
            jax.ShapeDtypeStruct((b, lkp, hd), k.dtype),
            jax.ShapeDtypeStruct((b, lkp, hd), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=_vmem_limit(block_q, block_k),
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lsep, deltap, *tab_ops, *kb)

    qspec2 = pl.BlockSpec((1, block_q, d), lambda b, h, qi, ki: (b, qi, h))
    kspec2 = pl.BlockSpec((1, block_k, d), lambda b, h, qi, ki: (b, ki, h))
    lspec2 = pl.BlockSpec((1, 1, block_q, 1),
                          lambda b, h, qi, ki: (b, h, qi, 0))
    cq_s2 = pl.BlockSpec((block_q, dh), lambda b, h, qi, ki: (qi, 0))
    ck_s2 = pl.BlockSpec((block_k, dh), lambda b, h, qi, ki: (ki, 0))
    tab_s2 = [] if pre_roped else [cq_s2, cq_s2, ck_s2, ck_s2]
    dq = pl.pallas_call(
        functools.partial(dq_kern, **common),
        grid=(b, h, nq, nk),
        in_specs=[qspec2, kspec2, kspec2, qspec2, lspec2, lspec2]
                 + tab_s2 + kb_s2,
        out_specs=qspec2,
        out_shape=jax.ShapeDtypeStruct((b, lqp, hd), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            vmem_limit_bytes=_vmem_limit(block_q, block_k),
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lsep, deltap, *tab_ops, *kb)
    return dq[:, :lq], dk[:, :lk], dv[:, :lk]


# ---------------------------------------------------------------------------
# short-sequence path: full-L k/v per grid step, single-pass softmax,
# one backward kernel producing dq + dk + dv (one s/p recompute instead of
# the long path's two — the dq-into-dkv fusion)
# ---------------------------------------------------------------------------

# max kv length for the short path: k/v live whole in VMEM, and the
# backward's lk-proportional residents (double-buffered k/v in + dk/dv out,
# fp32 dk/dv scratch, double-buffered rope tables ≈ 4 KB/row at d=128)
# leave bq ≥ 256 only up to ~2.4k rows — measured against the 16 MB limit
# (a 2608-row backward compiled to 17.58 MB under cruder accounting).
SHORT_MAX_KV = 2048
_VMEM_LIMIT = 16 * 1024 * 1024  # the compiler's scoped-vmem limit
_ALIGN = 16  # sublane multiple for bf16 blocks (fp32 needs only 8)


def _short_row_budget(lk: int, for_bwd: bool, d: int) -> int:
    """Max q rows whose VMEM working set fits. Peak logits liveness: fwd
    8 B (the current compiler keeps s AND p resident as fp32 — a long-q
    cross kernel measured 18.23M at the old 6 B/logit budget after a
    toolchain update); bwd 10.5 B (same kernels measured ~10.3 B/logit;
    10.5 still keeps the canonical L=1056 backward a single whole-L
    block). lk-proportional residents — double-buffered k/v in (and dk/dv
    out + fp32 scratch on the bwd) plus double-buffered rope tables — are
    subtracted from the limit (≈4 KB/row at d=128 on the bwd)."""
    per_logit = 10.5 if for_bwd else 8.0
    fixed = lk * d * ((8 + 8 + 8) if for_bwd else 8) + lk * (d // 2) * 16
    budget = max(per_logit * lk * _ALIGN, _VMEM_LIMIT - fixed)
    return max(_ALIGN, int(budget / (per_logit * lk)))


def _short_block_q(lq: int, lk: int, for_bwd: bool, d: int = 128) -> int:
    """Largest 16-aligned q block within the VMEM row budget. Sized so the
    canonical L=1056 backward runs as a single q block per (b,h);
    16-alignment (not 128) keeps it entirely pad-free."""
    bq = _short_row_budget(lk, for_bwd, d)
    nb = max(1, _cdiv(lq, bq))
    return _cdiv(_cdiv(lq, nb), _ALIGN) * _ALIGN


def _rope_dummies(lq: int, lk: int, dh: int, use_rope: bool, cos_q, sin_q,
                  cos_k, sin_k):
    """When RoPE is off the kernels never read the tables — pass 16-row
    dummies (constant index map) so no real table is DMA'd per grid step."""
    if use_rope:
        cqp = _pad_dim(cos_q, 0, lq)
        sqp = _pad_dim(sin_q, 0, lq)
        ckp = _pad_dim(cos_k, 0, lk)
        skp = _pad_dim(sin_k, 0, lk)
        return cqp, sqp, ckp, skp, lq, lk
    z = jnp.zeros((_ALIGN, dh), jnp.float32)
    return z, z, z, z, _ALIGN, _ALIGN


def _fwd_short_kernel(q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref, sk_ref,
                      o_ref, lse_ref, *, scale, kv_len, use_rope):
    q = q_ref[0].astype(jnp.float32)   # [bq, D]
    k = k_ref[0].astype(jnp.float32)   # [Lkp, D]
    v = v_ref[0]                        # [Lkp, D]
    if use_rope:
        q = _rope_rotate(q, cq_ref[:], sq_ref[:])
        k = _rope_rotate(k, ck_ref[:], sk_ref[:])
    q = q * (scale * _LOG2E)  # [bq, D] fold — see _fwd_kernel
    s = jax.lax.dot_general(
        q.astype(v.dtype), k.astype(v.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if kv_len != k.shape[0]:  # static: mask only when kv is padded
        mask = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) < kv_len
        s = jnp.where(mask, s, _NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    acc = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0, 0] = m + jnp.log2(l)  # [bq, 1], exp2-domain


def _forward_short(q, k, v, cos_q, sin_q, cos_k, sin_k, h, scale, use_rope):
    b, lq, hd = q.shape
    d = hd // h
    lk = k.shape[1]
    # 16-aligned pad-free kv. A 128-multiple padded+masked kv looked 2.8×
    # faster in an isolated micro-probe (scripts/perf_shortpath.py) but the
    # reading was dispatch-pipelining noise (197 TF/s = chip peak); the
    # long-window canonical/odd-frame full steps measured pad-free faster
    # (85.53 vs 86.08 ms, 92.0 vs 93.57 ms) — measured-and-rejected.
    lkp = _cdiv(lk, _ALIGN) * _ALIGN
    block_q = _short_block_q(lq, lkp, False, d)
    dh = d // 2

    qp = _pad_dim(q, 1, block_q)
    kp = _pad_dim(k, 1, lkp)
    vp = _pad_dim(v, 1, lkp)
    cqp, sqp, ckp, skp, tq, tk = _rope_dummies(
        qp.shape[1], lkp, dh, use_rope, cos_q, sin_q, cos_k, sin_k)
    bq_t = block_q if use_rope else _ALIGN
    lk_t = lkp if use_rope else _ALIGN
    nq = qp.shape[1] // block_q

    o, lse = pl.pallas_call(
        functools.partial(_fwd_short_kernel, scale=scale, kv_len=lk,
                          use_rope=use_rope),
        grid=(b, h, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, h, qi: (b, qi, h)),
            pl.BlockSpec((1, lkp, d), lambda b, h, qi: (b, 0, h)),
            pl.BlockSpec((1, lkp, d), lambda b, h, qi: (b, 0, h)),
            pl.BlockSpec((bq_t, dh), lambda b, h, qi: (qi if use_rope else 0, 0)),
            pl.BlockSpec((bq_t, dh), lambda b, h, qi: (qi if use_rope else 0, 0)),
            pl.BlockSpec((lk_t, dh), lambda b, h, qi: (0, 0)),
            pl.BlockSpec((lk_t, dh), lambda b, h, qi: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, h, qi: (b, qi, h)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, qi: (b, h, qi, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, qp.shape[1], hd), q.dtype),
            jax.ShapeDtypeStruct((b, h, qp.shape[1], 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * qp.shape[1] * lkp * d,
            bytes_accessed=2 * b * h * (qp.shape[1] + 2 * lkp) * d,
            transcendentals=b * h * qp.shape[1] * lkp,
        ),
        interpret=_interpret(),
    )(qp, kp, vp, cqp, sqp, ckp, skp)
    return o[:, :lq], lse[:, :, :lq]


def _forward_short_qkv(qkv, v, cos_q, sin_q, cos_k, sin_k, h, scale,
                       use_rope):
    """Short-path forward reading q/k directly from the fused [B, L, 3·H·D]
    qkv projection via column index maps (head h's q at block-col h, k at
    block-col H+h) — the q/k slice copies of the flat API never materialize.
    `v` is separate because the caller may value-residual-mix it
    (`model.py:129-130`)."""
    b, lq, hd3 = qkv.shape
    hd = hd3 // 3
    d = hd // h
    lk = lq
    lkp = _cdiv(lk, _ALIGN) * _ALIGN  # pad-free: see _forward_short comment
    block_q = _short_block_q(lq, lkp, False, d)
    dh = d // 2

    lqp = _cdiv(lq, block_q) * block_q
    qkvp = _pad_dim(qkv, 1, block_q)
    if lqp < lkp:  # k window read from qkvp must cover lkp rows
        qkvp = _pad_dim(qkvp, 1, lkp)
    vp = _pad_dim(v, 1, lkp)
    cqp, sqp, ckp, skp, tq, tk = _rope_dummies(
        lqp, lkp, dh, use_rope, cos_q, sin_q, cos_k, sin_k)
    bq_t = block_q if use_rope else _ALIGN
    lk_t = lkp if use_rope else _ALIGN
    nq = lqp // block_q

    o, lse = pl.pallas_call(
        functools.partial(_fwd_short_kernel, scale=scale, kv_len=lk,
                          use_rope=use_rope),
        grid=(b, h, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, hh, qi: (b, qi, hh)),
            pl.BlockSpec((1, lkp, d), lambda b, hh, qi: (b, 0, h + hh)),
            pl.BlockSpec((1, lkp, d), lambda b, hh, qi: (b, 0, hh)),
            pl.BlockSpec((bq_t, dh), lambda b, hh, qi: (qi if use_rope else 0, 0)),
            pl.BlockSpec((bq_t, dh), lambda b, hh, qi: (qi if use_rope else 0, 0)),
            pl.BlockSpec((lk_t, dh), lambda b, hh, qi: (0, 0)),
            pl.BlockSpec((lk_t, dh), lambda b, hh, qi: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, hh, qi: (b, qi, hh)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, hh, qi: (b, hh, qi, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, lqp, hd), qkv.dtype),
            jax.ShapeDtypeStruct((b, h, lqp, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lqp * lkp * d,
            bytes_accessed=2 * b * h * (lqp + 2 * lkp) * d,
            transcendentals=b * h * lqp * lkp,
        ),
        interpret=_interpret(),
    )(qkvp, qkvp, vp, cqp, sqp, ckp, skp)
    return o[:, :lq], lse[:, :, :lq]


def _backward_short_qkv(qkv, v, cos_q, sin_q, cos_k, sin_k, h, o, lse, do,
                        scale, use_rope):
    """Short-path backward with q/k read from the fused qkv array; returns
    (dq, dk, dv) — the caller assembles d(qkv)."""
    b, lq, hd3 = qkv.shape
    hd = hd3 // 3
    d = hd // h
    lk = lq
    lkp = _cdiv(lk, _ALIGN) * _ALIGN
    block_q = _short_block_q(lq, lkp, True, d)
    dh = d // 2

    lqp = _cdiv(lq, block_q) * block_q
    qkvp = _pad_dim(qkv, 1, block_q)
    if lqp < lkp:  # k window read from qkvp must cover lkp rows
        qkvp = _pad_dim(qkvp, 1, lkp)
    vp = _pad_dim(v, 1, lkp)
    dop = _pad_dim(do, 1, block_q)
    op = _pad_dim(o, 1, block_q)
    lsep = _pad_dim(lse, 2, block_q)
    cqp, sqp, ckp, skp, tq, tk = _rope_dummies(
        lqp, lkp, dh, use_rope, cos_q, sin_q, cos_k, sin_k)
    bq_t = block_q if use_rope else _ALIGN
    lk_t = lkp if use_rope else _ALIGN
    nq = lqp // block_q

    qspec_src = pl.BlockSpec((1, block_q, d), lambda b, hh, qi: (b, qi, hh))
    kspec_src = pl.BlockSpec((1, lkp, d), lambda b, hh, qi: (b, 0, h + hh))
    vspec = pl.BlockSpec((1, lkp, d), lambda b, hh, qi: (b, 0, hh))
    qspec = pl.BlockSpec((1, block_q, d), lambda b, hh, qi: (b, qi, hh))
    kspec = pl.BlockSpec((1, lkp, d), lambda b, hh, qi: (b, 0, hh))
    lspec = pl.BlockSpec((1, 1, block_q, 1), lambda b, hh, qi: (b, hh, qi, 0))
    cq_s = pl.BlockSpec((bq_t, dh), lambda b, hh, qi: (qi if use_rope else 0, 0))
    ck_s = pl.BlockSpec((lk_t, dh), lambda b, hh, qi: (0, 0))

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_short_kernel, scale=scale, kv_len=lk,
                          use_rope=use_rope),
        grid=(b, h, nq),
        in_specs=[qspec_src, kspec_src, vspec, qspec, lspec, qspec,
                  cq_s, cq_s, ck_s, ck_s],
        out_specs=(qspec, kspec, kspec),
        out_shape=(
            jax.ShapeDtypeStruct((b, lqp, hd), qkv.dtype),
            jax.ShapeDtypeStruct((b, lkp, hd), qkv.dtype),
            jax.ShapeDtypeStruct((b, lkp, hd), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((lkp, d), jnp.float32),
            pltpu.VMEM((lkp, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * lqp * lkp * d,
            bytes_accessed=2 * b * h * (4 * lqp + 4 * lkp) * d,
            transcendentals=b * h * lqp * lkp,
        ),
        interpret=_interpret(),
    )(qkvp, qkvp, vp, dop, lsep, op, cqp, sqp, ckp, skp)
    return dq[:, :lq], dk[:, :lk], dv[:, :lk]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _qkv_rope_flash(qkv, v, cos_q, sin_q, cos_k, sin_k, h, scale, use_rope):
    o, _ = _forward_short_qkv(qkv, v, cos_q, sin_q, cos_k, sin_k, h, scale,
                              use_rope)
    return o


def _qkv_rope_flash_fwd(qkv, v, cos_q, sin_q, cos_k, sin_k, h, scale,
                        use_rope):
    o, lse = _forward_short_qkv(qkv, v, cos_q, sin_q, cos_k, sin_k, h,
                                scale, use_rope)
    o, lse = _name_attn_residuals(o, lse)
    return o, (qkv, v, cos_q, sin_q, cos_k, sin_k, o, lse)


def _qkv_rope_flash_bwd(h, scale, use_rope, res, g):
    qkv, v, cos_q, sin_q, cos_k, sin_k, o, lse = res
    dq, dk, dv = _backward_short_qkv(qkv, v, cos_q, sin_q, cos_k, sin_k, h,
                                     o, lse, g, scale, use_rope)
    dqkv = jnp.concatenate([dq, dk, jnp.zeros_like(dq)], axis=-1)
    return dqkv, dv, None, None, None, None


_qkv_rope_flash.defvjp(_qkv_rope_flash_fwd, _qkv_rope_flash_bwd)


def qkv_rope_flash_attention(
    qkv: jnp.ndarray,
    v: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    num_heads: int,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Self-attention reading q/k directly from the fused qkv projection
    [B, L, 3·H·D] (no slice copies); `v` passed separately (value-residual
    mixing happens outside). Short path only (L ≤ SHORT_MAX_KV)."""
    d = qkv.shape[-1] // (3 * num_heads)
    scale = d ** -0.5 if scale is None else scale
    cos = jax.lax.stop_gradient(cos.astype(jnp.float32))
    sin = jax.lax.stop_gradient(sin.astype(jnp.float32))
    return _qkv_rope_flash(qkv, v, cos, sin, cos, sin, num_heads, scale,
                           True)


def _bwd_short_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, o_ref,
                      cq_ref, sq_ref, ck_ref, sk_ref,
                      dq_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                      *, scale, kv_len, use_rope):
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    if use_rope:
        q = _rope_rotate(q, cq_ref[:], sq_ref[:])
        k = _rope_rotate(k, ck_ref[:], sk_ref[:])
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0]      # [bq, 1]
    # delta = rowsum(do ⊙ o) computed in-kernel (saves the host-side einsum
    # pass over do/o that a separate delta input would need)
    delta = jnp.sum(do.astype(jnp.float32) * o_ref[0].astype(jnp.float32),
                    axis=-1, keepdims=True)

    # scalar folds on [*, D] operands — see _bwd_dkv_kernel
    qs = (q * (scale * _LOG2E)).astype(v.dtype)
    qd = (q * scale).astype(v.dtype)
    kc = k.astype(v.dtype)
    kd = (k * scale).astype(v.dtype)
    s = jax.lax.dot_general(qs, kc, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = jnp.exp2(s - lse)  # log2-domain lse (see forward)
    if kv_len != k.shape[0]:  # static: zero padded kv columns
        mask = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1) < kv_len
        p = jnp.where(mask, p, 0.0)

    pt = p.astype(do.dtype)
    dv_scr[:] += jax.lax.dot_general(pt, do, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = (p * (dp - delta)).astype(do.dtype)
    dq = jax.lax.dot_general(ds, kd, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if use_rope:
        dq = _rope_rotate_t(dq, cq_ref[:], sq_ref[:])
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_scr[:] += jax.lax.dot_general(ds, qd, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(qi == nq - 1)
    def _():
        dk = dk_scr[:]
        if use_rope:
            dk = _rope_rotate_t(dk, ck_ref[:], sk_ref[:])
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _backward_short(q, k, v, cos_q, sin_q, cos_k, sin_k, h, o, lse, do,
                    scale, use_rope):
    b, lq, hd = q.shape
    d = hd // h
    lk = k.shape[1]
    lkp = _cdiv(lk, _ALIGN) * _ALIGN
    block_q = _short_block_q(lq, lkp, True, d)
    dh = d // 2

    qp = _pad_dim(q, 1, block_q)
    dop = _pad_dim(do, 1, block_q)
    op = _pad_dim(o, 1, block_q)
    lsep = _pad_dim(lse, 2, block_q)
    kp = _pad_dim(k, 1, lkp)
    vp = _pad_dim(v, 1, lkp)
    cqp, sqp, ckp, skp, tq, tk = _rope_dummies(
        qp.shape[1], lkp, dh, use_rope, cos_q, sin_q, cos_k, sin_k)
    bq_t = block_q if use_rope else _ALIGN
    lk_t = lkp if use_rope else _ALIGN
    nq = qp.shape[1] // block_q

    qspec = pl.BlockSpec((1, block_q, d), lambda b, h, qi: (b, qi, h))
    kspec = pl.BlockSpec((1, lkp, d), lambda b, h, qi: (b, 0, h))
    lspec = pl.BlockSpec((1, 1, block_q, 1), lambda b, h, qi: (b, h, qi, 0))
    cq_s = pl.BlockSpec((bq_t, dh), lambda b, h, qi: (qi if use_rope else 0, 0))
    ck_s = pl.BlockSpec((lk_t, dh), lambda b, h, qi: (0, 0))

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_short_kernel, scale=scale, kv_len=lk,
                          use_rope=use_rope),
        grid=(b, h, nq),
        in_specs=[qspec, kspec, kspec, qspec, lspec, qspec,
                  cq_s, cq_s, ck_s, ck_s],
        out_specs=(qspec, kspec, kspec),
        out_shape=(
            jax.ShapeDtypeStruct((b, qp.shape[1], hd), q.dtype),
            jax.ShapeDtypeStruct((b, lkp, hd), k.dtype),
            jax.ShapeDtypeStruct((b, lkp, hd), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((lkp, d), jnp.float32),
            pltpu.VMEM((lkp, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * qp.shape[1] * lkp * d,
            bytes_accessed=2 * b * h * (4 * qp.shape[1] + 4 * lkp) * d,
            transcendentals=b * h * qp.shape[1] * lkp,
        ),
        interpret=_interpret(),
    )(qp, kp, vp, dop, lsep, op, cqp, sqp, ckp, skp)
    return dq[:, :lq], dk[:, :lk], dv[:, :lk]


# ---------------------------------------------------------------------------
# ring attention (context parallelism): k/v chunks rotate around the mesh's
# `context` axis via ppermute; each shard attends its local queries against
# one chunk at a time and merges with a numerically-exact online-softmax
# combine. Per-chip k/v + logits memory is O(L/cp) — the all-gather CP path
# this replaces held full k/v per chip. Padded tail tokens are masked with an
# additive kv-bias that travels with the chunk (static masks can't work: a
# chunk's identity at ring step r is shard-dependent).
# ---------------------------------------------------------------------------


def _ring_fwd_kernel(q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref, sk_ref,
                     kb_ref, o_ref, lse_ref, *, scale):
    q = _rope_rotate(q_ref[0].astype(jnp.float32),
                     cq_ref[:], sq_ref[:]) * (scale * _LOG2E)  # [bq, D] fold
    k = _rope_rotate(k_ref[0].astype(jnp.float32), ck_ref[:], sk_ref[:])
    v = v_ref[0]
    s = jax.lax.dot_general(
        q.astype(v.dtype), k.astype(v.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + kb_ref[:]  # [1, lk] additive mask (0 / -1e30)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    acc = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    # fully-masked chunk: m=-1e30 ⇒ lse≈-1e30 ⇒ zero weight in the merge
    lse_ref[0, 0] = m + jnp.log2(l)


def _ring_bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, o_ref,
                     cq_ref, sq_ref, ck_ref, sk_ref, kb_ref,
                     dq_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                     *, scale):
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = _rope_rotate(q_ref[0].astype(jnp.float32), cq_ref[:], sq_ref[:])
    k = _rope_rotate(k_ref[0].astype(jnp.float32), ck_ref[:], sk_ref[:])
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0]
    delta = jnp.sum(do.astype(jnp.float32) * o_ref[0].astype(jnp.float32),
                    axis=-1, keepdims=True)

    # scalar folds on [*, D] operands — see _bwd_dkv_kernel
    qs = (q * (scale * _LOG2E)).astype(v.dtype)
    qd = (q * scale).astype(v.dtype)
    kc = k.astype(v.dtype)
    kd = (k * scale).astype(v.dtype)
    s = jax.lax.dot_general(qs, kc, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) + kb_ref[:]
    p = jnp.exp2(s - lse)  # global (merged) lse ⇒ exact per-chunk partials

    pt = p.astype(do.dtype)
    dv_scr[:] += jax.lax.dot_general(pt, do, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = (p * (dp - delta)).astype(do.dtype)
    dq = jax.lax.dot_general(ds, kd, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq_ref[0] = _rope_rotate_t(dq, cq_ref[:], sq_ref[:]).astype(dq_ref.dtype)
    dk_scr[:] += jax.lax.dot_general(ds, qd, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(qi == nq - 1)
    def _():
        dk_ref[0] = _rope_rotate_t(dk_scr[:], ck_ref[:],
                                   sk_ref[:]).astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


# full-k ring chunk ceilings: beyond these the chunk's fixed VMEM residents
# (whole k/v + rope tables, + fp32 dk/dv scratch on the bwd) exceed the
# 16 MB budget — dispatch to the blocked long-path kernels (with the
# traveling kv-bias threaded through) instead.
_RING_FULLK_MAX_FWD = 4096
_RING_FULLK_MAX_BWD = SHORT_MAX_KV


def _ring_chunk_fwd(q, k, v, cos_q, sin_q, cos_k, sin_k, kbias, h, scale):
    b, lq, hd = q.shape
    d = hd // h
    lk = k.shape[1]
    if lk > _RING_FULLK_MAX_FWD:
        # blocked fallback: full-k residents would blow VMEM at this chunk
        o, lse = _forward(q, k, v, cos_q, sin_q, cos_k, sin_k, h, scale,
                          DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K, kbias=kbias)
        return o, lse[..., None]  # [b,h,lq] → ring layout [b,h,lq,1]
    # pick a block within budget; pad q to a block multiple when lq has no
    # 16-aligned divisor in budget (fit_block_div's fallback is NOT a
    # divisor — unpadded, tail q rows would silently never be computed)
    block_q = _fit_block_div(lq, _short_row_budget(lk, False, d),
                             align=_ALIGN)
    nq = _cdiv(lq, block_q)
    lqp = nq * block_q
    q = _pad_dim(q, 1, block_q)
    cos_q = _pad_dim(cos_q, 0, block_q)
    sin_q = _pad_dim(sin_q, 0, block_q)
    dh = d // 2

    o, lse = pl.pallas_call(
        functools.partial(_ring_fwd_kernel, scale=scale),
        grid=(b, h, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, h, qi: (b, qi, h)),
            pl.BlockSpec((1, lk, d), lambda b, h, qi: (b, 0, h)),
            pl.BlockSpec((1, lk, d), lambda b, h, qi: (b, 0, h)),
            pl.BlockSpec((block_q, dh), lambda b, h, qi: (qi, 0)),
            pl.BlockSpec((block_q, dh), lambda b, h, qi: (qi, 0)),
            pl.BlockSpec((lk, dh), lambda b, h, qi: (0, 0)),
            pl.BlockSpec((lk, dh), lambda b, h, qi: (0, 0)),
            pl.BlockSpec((1, lk), lambda b, h, qi: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, h, qi: (b, qi, h)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, qi: (b, h, qi, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, lqp, hd), q.dtype),
            jax.ShapeDtypeStruct((b, h, lqp, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=_interpret(),
    )(q, k, v, cos_q, sin_q, cos_k, sin_k, kbias)
    return o[:, :lq], lse[:, :, :lq]


def _ring_chunk_bwd(q, k, v, cos_q, sin_q, cos_k, sin_k, kbias, o, lse, do,
                    h, scale):
    b, lq, hd = q.shape
    d = hd // h
    lk = k.shape[1]
    if lk > _RING_FULLK_MAX_BWD:
        # blocked fallback (full k/v + fp32 dk/dv scratch would blow VMEM);
        # the long-path backward takes lse at the boundary layout [b,h,lq]
        return _backward(q, k, v, cos_q, sin_q, cos_k, sin_k, h, o,
                         lse[..., 0], do, scale, DEFAULT_BLOCK_Q,
                         DEFAULT_BLOCK_K, kbias=kbias)
    block_q = _fit_block_div(lq, _short_row_budget(lk, True, d),
                             align=_ALIGN)
    nq = _cdiv(lq, block_q)
    lqp = nq * block_q
    # pad q-side arrays to the block multiple (see _ring_chunk_fwd); padded
    # do rows are zero ⇒ their ds ≡ 0, so dk/dv pick up no pad contribution
    q = _pad_dim(q, 1, block_q)
    do = _pad_dim(do, 1, block_q)
    o = _pad_dim(o, 1, block_q)
    lse = _pad_dim(lse, 2, block_q)
    cos_q = _pad_dim(cos_q, 0, block_q)
    sin_q = _pad_dim(sin_q, 0, block_q)
    dh = d // 2

    qspec = pl.BlockSpec((1, block_q, d), lambda b, h, qi: (b, qi, h))
    kspec = pl.BlockSpec((1, lk, d), lambda b, h, qi: (b, 0, h))
    lspec = pl.BlockSpec((1, 1, block_q, 1), lambda b, h, qi: (b, h, qi, 0))
    cq_s = pl.BlockSpec((block_q, dh), lambda b, h, qi: (qi, 0))
    ck_s = pl.BlockSpec((lk, dh), lambda b, h, qi: (0, 0))
    kb_s = pl.BlockSpec((1, lk), lambda b, h, qi: (0, 0))

    dq, dk, dv = pl.pallas_call(
        functools.partial(_ring_bwd_kernel, scale=scale),
        grid=(b, h, nq),
        in_specs=[qspec, kspec, kspec, qspec, lspec, qspec,
                  cq_s, cq_s, ck_s, ck_s, kb_s],
        out_specs=(qspec, kspec, kspec),
        out_shape=(
            jax.ShapeDtypeStruct((b, lqp, hd), q.dtype),
            jax.ShapeDtypeStruct((b, lk, hd), k.dtype),
            jax.ShapeDtypeStruct((b, lk, hd), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((lk, d), jnp.float32),
            pltpu.VMEM((lk, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(q, k, v, do, lse, o, cos_q, sin_q, cos_k, sin_k, kbias)
    return dq[:, :lq], dk, dv


def _online_merge(o1, lse1, o2, lse2, h):
    """Exact combine of two normalized partial attentions (exp2-domain lse).
    o [B, L, H·D]; lse [B, H, L, 1]."""
    b, l, hd = o1.shape
    d = hd // h
    m = jnp.maximum(lse1, lse2)
    w1 = jnp.exp2(lse1 - m).transpose(0, 2, 1, 3)  # [B, L, H, 1]
    w2 = jnp.exp2(lse2 - m).transpose(0, 2, 1, 3)
    o1h = o1.reshape(b, l, h, d).astype(jnp.float32)
    o2h = o2.reshape(b, l, h, d).astype(jnp.float32)
    o = (w1 * o1h + w2 * o2h) / (w1 + w2)
    lse = m + jnp.log2(jnp.exp2(lse1 - m) + jnp.exp2(lse2 - m))
    return o.reshape(b, l, hd).astype(o1.dtype), lse


def _ring_perm(cp):
    return [(i, (i + 1) % cp) for i in range(cp)]


def _pp(tree, axis_name, cp):
    return jax.tree.map(
        lambda x: jax.lax.ppermute(x, axis_name, _ring_perm(cp)), tree)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def _ring_attention(q, k, v, cos_q, sin_q, cos_k, sin_k, kbias, h, scale,
                    axis_name, cp):
    o, _ = _ring_attention_fwd_impl(q, k, v, cos_q, sin_q, cos_k, sin_k,
                                    kbias, h, scale, axis_name, cp)
    return o


def _ring_attention_fwd_impl(q, k, v, cos_q, sin_q, cos_k, sin_k, kbias, h,
                             scale, axis_name, cp):
    o = lse = None
    carry = (k, v, cos_k, sin_k, kbias)
    for r in range(cp):
        kc, vc, ck, sk, kb = carry
        o_r, lse_r = _ring_chunk_fwd(q, kc, vc, cos_q, sin_q, ck, sk, kb, h,
                                     scale)
        if o is None:
            o, lse = o_r, lse_r
        else:
            o, lse = _online_merge(o, lse, o_r, lse_r, h)
        if r < cp - 1:
            carry = _pp(carry, axis_name, cp)
    return o, lse


def _ring_attention_vjp_fwd(q, k, v, cos_q, sin_q, cos_k, sin_k, kbias, h,
                            scale, axis_name, cp):
    o, lse = _ring_attention_fwd_impl(q, k, v, cos_q, sin_q, cos_k, sin_k,
                                      kbias, h, scale, axis_name, cp)
    o, lse = _name_attn_residuals(o, lse)
    return o, (q, k, v, cos_q, sin_q, cos_k, sin_k, kbias, o, lse)


def _ring_attention_vjp_bwd(h, scale, axis_name, cp, res, do):
    q, k, v, cos_q, sin_q, cos_k, sin_k, kbias, o, lse = res
    dq_acc = jnp.zeros(q.shape, jnp.float32)
    # dk/dv accumulators travel WITH their chunk around the ring and arrive
    # home after one final rotation
    carry = (k, v, cos_k, sin_k, kbias,
             jnp.zeros(k.shape, jnp.float32), jnp.zeros(v.shape, jnp.float32))
    for r in range(cp):
        kc, vc, ck, sk, kb, dk_c, dv_c = carry
        dq_r, dk_r, dv_r = _ring_chunk_bwd(
            q, kc, vc, cos_q, sin_q, ck, sk, kb, o, lse, do, h, scale)
        dq_acc = dq_acc + dq_r.astype(jnp.float32)
        carry = (kc, vc, ck, sk, kb,
                 dk_c + dk_r.astype(jnp.float32),
                 dv_c + dv_r.astype(jnp.float32))
        if r < cp - 1:
            carry = _pp(carry, axis_name, cp)
    # chunks sit one hop short of home after cp-1 rotations
    _, _, _, _, _, dk_home, dv_home = _pp(carry, axis_name, cp)
    return (dq_acc.astype(q.dtype), dk_home.astype(k.dtype),
            dv_home.astype(v.dtype), None, None, None, None, None)


_ring_attention.defvjp(_ring_attention_vjp_fwd, _ring_attention_vjp_bwd)


# ---------------------------------------------------------------------------
# split-prefix long path
#
# Video sequences are L = n_registers + tokens (e.g. 8208 = 16 + 8192,
# `model.py:316,362`): L itself rarely has a good 16-aligned divisor
# (8208 = 2⁴·3³·19 → 912-row blocks), but stripping the thin prefix leaves a
# bulk that tiles at the optimal (1024, 1024) blocks. 912-row blocks waste
# ceil(912/128)/7.125 = 12.3% of the MXU on BOTH matmul dims (measured:
# ~47% of peak vs 58.8% at 1024² — PERFORMANCE.md L=8208 ceiling entry), so
# the exact decomposition below runs the bulk×bulk quadrant at full blocks
# and covers the two thin slices (prefix rows / prefix columns) with cheap
# extra kernel calls, merged by the same online-softmax identity the ring
# path uses. The backward passes the MERGED o/lse into each quadrant's
# `_backward`, which then yields the exact partial gradients (p is
# recomputed in-kernel as exp2(s − lse_global); delta comes from the merged
# o·do) — the same global-lse chunk math as `_ring_attention_vjp_bwd`.
# ---------------------------------------------------------------------------

_SPLIT_MAX_PFX = 768  # engage only for thin remainders (r = L mod block)

# the split dispatch below tiles the bulk×bulk quadrant with ONE block size
# on both axes; if the two tuned defaults ever diverge this assert forces
# whoever changes them to decide which the split path should use
assert DEFAULT_BLOCK_Q == DEFAULT_BLOCK_K


def _split_prefix(lq: int, lk: int, block: int) -> int:
    """Prefix width r > 0 ⟺ the split-prefix path engages: self-attention
    (lq == lk), a 16-aligned thin remainder, and a bulk of ≥ 2 full blocks
    (below that the divisor path's blocks are fine)."""
    if lq != lk:
        return 0
    r = lq % block
    if r == 0 or r % _ALIGN != 0 or r > _SPLIT_MAX_PFX:
        return 0
    if lq - r < 2 * block:
        return 0
    return r


def _split_parts(q, k, v, cos_q, sin_q, cos_k, sin_k, n_pfx):
    rows = lambda x: (x[:, :n_pfx], x[:, n_pfx:])
    tabs = lambda t: (t[:n_pfx], t[n_pfx:])
    return rows(q), rows(k), rows(v), tabs(cos_q), tabs(sin_q), \
        tabs(cos_k), tabs(sin_k)


# ---------------------------------------------------------------------------
# tail-fused split: for thin prefixes (≤ _TAIL_MAX rows) the prefix k/v is
# processed INSIDE the bulk kernels as an extra online-softmax update at one
# grid step — the kernel emits the already-merged o/lse (fwd) and the exact
# dk/dv/dq including the prefix columns (bwd). This removes the separate
# bulk×prefix kernel call, the `_online_merge` elementwise pass over the
# full [B, L, H·D] output (measured ~18 ms/step at L=8208 — the largest
# single split overhead), and one fp32 dq merge-add per layer. Larger
# prefixes (rare: L is tokens + 16 registers in production) fall back to
# the 3-call merge decomposition below.
# ---------------------------------------------------------------------------

_TAIL_MAX = 128


def _tail_merge_kernel(o_ref, lse_ref, q_ref, kt_ref, vt_ref,
                       oo_ref, lseo_ref, *, scale):
    """One bandwidth-bound pass: attend this q block against the [n_pfx, D]
    prefix k/v (tiny MXU work) and online-merge the result into the bulk
    quadrant's normalized (o, lse). Replaces the separate bulk×prefix
    kernel call AND the XLA `_online_merge` elementwise pass (measured
    ~18 ms/step at L=8208). Kept OUT of the bulk forward kernel itself:
    extra small operands there break its double-buffering (see
    _fwd_kernel_nobias — a 16-wide dummy measured 2×). q/kt arrive
    pre-rotated (`_rotate_flat`)."""
    q = q_ref[0].astype(jnp.float32) * (scale * _LOG2E)
    vt = vt_ref[0]
    st = jax.lax.dot_general(q.astype(vt.dtype), kt_ref[0],
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    m0 = jnp.max(st, axis=1, keepdims=True)
    p0 = jnp.exp2(st - m0)
    l0 = jnp.sum(p0, axis=1, keepdims=True)
    acc0 = jax.lax.dot_general(p0.astype(vt.dtype), vt,
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    # merge: A0 = 2^m0·acc0, Z0 = 2^m0·l0 against the normalized o1 with
    # Z1 = 2^lse1 — numerators/denominators rescaled by 2^-m, m = max
    lse1 = lse_ref[0, 0]               # [block, 1]
    m = jnp.maximum(lse1, m0)
    w1 = jnp.exp2(lse1 - m)
    u0 = jnp.exp2(m0 - m)
    l = w1 + u0 * l0
    o = (w1 * o_ref[0].astype(jnp.float32) + u0 * acc0) / l
    oo_ref[0] = o.astype(oo_ref.dtype)
    lseo_ref[0, 0] = m + jnp.log2(l)


def _forward_tail(q, k, v, kt, vt, h, scale, block):
    """Bulk rows' forward over [prefix ⊕ bulk] kv; q/k/v the PRE-ROTATED
    bulk rows (length % block == 0), kt/vt the [B, n_pfx, H·D] pre-rotated
    prefix rows. The bulk quadrant runs table-free `_forward` (its kernel
    pipeline is operand-count sensitive); the prefix columns fold in via
    one `_tail_merge_kernel` pass."""
    b, lq, hd = q.shape
    d = hd // h
    n_pfx = kt.shape[1]
    nq = lq // block
    o1, lse1 = _forward(q, k, v, None, None, None, None, h, scale,
                        block, block)
    o, lse = pl.pallas_call(
        functools.partial(_tail_merge_kernel, scale=scale),
        grid=(b, h, nq),
        in_specs=[
            pl.BlockSpec((1, block, d), lambda b, h, qi: (b, qi, h)),
            pl.BlockSpec((1, 1, block, 1), lambda b, h, qi: (b, h, qi, 0)),
            pl.BlockSpec((1, block, d), lambda b, h, qi: (b, qi, h)),
            pl.BlockSpec((1, n_pfx, d), lambda b, h, qi: (b, 0, h)),
            pl.BlockSpec((1, n_pfx, d), lambda b, h, qi: (b, 0, h)),
        ],
        out_specs=(
            pl.BlockSpec((1, block, d), lambda b, h, qi: (b, qi, h)),
            pl.BlockSpec((1, 1, block, 1), lambda b, h, qi: (b, h, qi, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, lq, hd), q.dtype),
            jax.ShapeDtypeStruct((b, h, lq, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lq * n_pfx * d,
            bytes_accessed=2 * b * h * 3 * lq * d,
            transcendentals=b * h * lq * n_pfx,
        ),
        interpret=_interpret(),
    )(o1, lse1[..., None], q, kt, vt)
    return o, lse[:, :, :, 0]


def _bwd_dkv_kernel_tail(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         kt_ref, vt_ref,
                         dk_ref, dv_ref, dqp_ref, dkt_ref, dvt_ref,
                         dk_scr, dv_scr, dkt_scr, dvt_scr, dqt_scr,
                         *, scale):
    """`_bwd_dkv_kernel` (fused-dq form, no pad mask) with the prefix
    columns' contributions — dkt/dvt plus the prefix part of dq — computed
    at the ki == 0 grid steps from the same global lse/delta (exact chunked
    flash backward, as in the ring path). q/k/kt arrive PRE-ROTATED
    (`_rotate_flat`); every emitted gradient is in roped space — the
    caller folds the transpose rotation into its epilogue passes."""
    qi = pl.program_id(3)
    nq = pl.num_programs(3)
    ki = pl.program_id(2)

    @pl.when(qi == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0]
    delta = delta_ref[0, 0]

    # scalar folds on [*, D] operands — see _bwd_dkv_kernel
    qs = (q * (scale * _LOG2E)).astype(v.dtype)
    qd = (q * scale).astype(v.dtype)
    kc = k.astype(v.dtype)
    kd = (k * scale).astype(v.dtype)
    s = jax.lax.dot_general(qs, kc, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = jnp.exp2(s - lse)
    pt = p.astype(do.dtype)
    dv_scr[:] += jax.lax.dot_general(pt, do, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = (p * (dp - delta)).astype(do.dtype)
    dk_scr[:] += jax.lax.dot_general(ds, qd, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dq_part = jax.lax.dot_general(ds, kd, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)

    @pl.when(ki == 0)
    def _():
        @pl.when(qi == 0)
        def _():
            dkt_scr[:] = jnp.zeros_like(dkt_scr)
            dvt_scr[:] = jnp.zeros_like(dvt_scr)
        kt = kt_ref[0].astype(jnp.float32)
        ktc = kt.astype(v.dtype)
        ktd = (kt * scale).astype(v.dtype)
        st = jax.lax.dot_general(qs, ktc, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        p_t = jnp.exp2(st - lse)
        dvt_scr[:] += jax.lax.dot_general(
            p_t.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dpt = jax.lax.dot_general(do, vt_ref[0], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dst = (p_t * (dpt - delta)).astype(do.dtype)
        dkt_scr[:] += jax.lax.dot_general(dst, qd, (((0,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)
        # prefix part of this q block's dq, carried through dqp slot ki=0
        dqt_scr[:] = jax.lax.dot_general(dst, ktd, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)

        @pl.when(qi == nq - 1)
        def _():
            dkt_ref[0] = dkt_scr[:].astype(dkt_ref.dtype)
            dvt_ref[0] = dvt_scr[:].astype(dvt_ref.dtype)

    # ki > 0 reads stale dqt_scr; the where() discards it
    dq_part = dq_part + jnp.where(ki == 0, dqt_scr[:], 0.0)
    dqp_ref[0, 0] = dq_part.astype(dqp_ref.dtype)

    @pl.when(qi == nq - 1)
    def _():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _backward_tail(q, k, v, kt, vt, h, o, lse, do, scale, block_q, block_k):
    """Bulk rows' backward over [prefix ⊕ bulk] kv; q/k/kt PRE-ROTATED.
    Returns (dq_bulk, dk_bulk, dv_bulk, dk_pfx, dv_pfx) with the dq/dk
    parts in roped space (callers rotate back, folded into the epilogue)."""
    b, lq, hd = q.shape
    d = hd // h
    n_pfx = kt.shape[1]
    nq, nk = lq // block_q, lq // block_k

    dof = do.astype(jnp.float32).reshape(b, lq, h, d)
    of = o.astype(jnp.float32).reshape(b, lq, h, d)
    delta = jnp.einsum("blhd,blhd->bhl", dof, of)
    lsep = lse[..., None]
    deltap = delta[..., None]

    qspec = pl.BlockSpec((1, block_q, d), lambda b, h, ki, qi: (b, qi, h))
    kspec = pl.BlockSpec((1, block_k, d), lambda b, h, ki, qi: (b, ki, h))
    lspec = pl.BlockSpec((1, 1, block_q, 1),
                         lambda b, h, ki, qi: (b, h, qi, 0))
    ktspec = pl.BlockSpec((1, n_pfx, d), lambda b, h, ki, qi: (b, 0, h))
    dqp_spec = pl.BlockSpec((1, 1, block_q, d),
                            lambda b, h, ki, qi: (ki, b, qi, h))

    dk, dv, dqp, dkt, dvt = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel_tail, scale=scale),
        grid=(b, h, nk, nq),
        in_specs=[qspec, kspec, kspec, qspec, lspec, lspec,
                  ktspec, ktspec],
        out_specs=(kspec, kspec, dqp_spec, ktspec, ktspec),
        out_shape=(
            jax.ShapeDtypeStruct((b, lq, hd), k.dtype),
            jax.ShapeDtypeStruct((b, lq, hd), v.dtype),
            jax.ShapeDtypeStruct((nk, b, lq, hd), q.dtype),
            jax.ShapeDtypeStruct((b, n_pfx, hd), k.dtype),
            jax.ShapeDtypeStruct((b, n_pfx, hd), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((n_pfx, d), jnp.float32),
            pltpu.VMEM((n_pfx, d), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            # the tail residents (prefix k/v + dkt/dvt scratch + the dqt
            # carry) push ~1.7 MB past the 16 MB scoped-vmem default; v5e
            # has 128 MB physical VMEM — grant the kernel headroom rather
            # than shrinking the 1024² blocks the bulk quadrant needs
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(q, k, v, do, lsep, deltap, kt, vt)
    # roped-space dq; the caller's _rotate_flat(transpose=True) epilogue
    # restores it (rotation is linear — rotate-after-sum ≡ sum-of-rotated)
    dq = dqp.sum(axis=0, dtype=jnp.float32).astype(q.dtype)
    return dq, dk, dv, dkt, dvt


def _use_tail(q, n_pfx, bulk, block):
    """Tail-fused split engages for thin prefixes on the bf16 production
    path (fp32 inputs blow the bwd VMEM budget at full-size blocks — they
    keep the 3-call merge path, whose `_backward` caps fp32 blocks)."""
    return (n_pfx <= _TAIL_MAX and bulk // block <= _MAX_DQ_PARTIALS
            and (q.dtype.itemsize < 4 or _interpret()))


def _split_fwd_roped(q_r, k_r, v, h, scale, n_pfx, block):
    """Tail-fused forward over PRE-ROTATED q/k: bulk rows via the
    table-free kernel + one `_tail_merge_kernel` pass; prefix rows via a
    thin table-free call over the full kv."""
    qp, qm = q_r[:, :n_pfx], q_r[:, n_pfx:]
    kp, km = k_r[:, :n_pfx], k_r[:, n_pfx:]
    vp, vm = v[:, :n_pfx], v[:, n_pfx:]
    o_m, lse_m = _forward_tail(qm, km, vm, kp, vp, h, scale, block)
    o_p, lse_p = _forward(qp, k_r, v, None, None, None, None, h, scale,
                          n_pfx, block)
    return (jnp.concatenate([o_p, o_m], axis=1),
            jnp.concatenate([lse_p, lse_m], axis=2))


def _split_bwd_roped(q_r, k_r, v, h, o, lse, do, scale, n_pfx, block):
    """Tail-fused backward over PRE-ROTATED q/k; returns (dq_r, dk_r, dv)
    with dq_r/dk_r still in roped space."""
    qp, qm = q_r[:, :n_pfx], q_r[:, n_pfx:]
    kp, km = k_r[:, :n_pfx], k_r[:, n_pfx:]
    vp, vm = v[:, :n_pfx], v[:, n_pfx:]
    o_p, o_m = o[:, :n_pfx], o[:, n_pfx:]
    lse_p, lse_m = lse[:, :, :n_pfx], lse[:, :, n_pfx:]
    do_p, do_m = do[:, :n_pfx], do[:, n_pfx:]
    f32 = lambda x: x.astype(jnp.float32)
    # ONE kernel yields the bulk rows' dq (incl. prefix columns) and
    # dk/dv for both kv ranges; only the thin prefix-q call remains.
    # Backward blocks are ASYMMETRIC (block/2 × 2·block) when the bulk
    # divides: wider kv halves the dq-partials buffer (nk 8→4 at L=8208,
    # trace-measured reduce 0.22→0.07 ms/layer-call) and the q/do
    # re-streaming, at unchanged logits-tile footprint.
    bulk = qm.shape[1]
    if block % 2 == 0 and bulk % (2 * block) == 0:
        bq_b, bk_b = block // 2, 2 * block
    else:
        bq_b = bk_b = block
    dqm, dkm, dvm, dkp, dvp = _backward_tail(
        qm, km, vm, kp, vp, h, o_m, lse_m, do_m, scale, bq_b, bk_b)
    dqp, dk3, dv3 = _backward(qp, k_r, v, None, None, None, None, h, o_p,
                              lse_p, do_p, scale, n_pfx, block)
    dq_r = jnp.concatenate([dqp, dqm], axis=1)
    dk_r = (f32(dk3) + f32(jnp.concatenate([dkp, dkm], 1))).astype(k_r.dtype)
    dv = (f32(dv3) + f32(jnp.concatenate([dvp, dvm], 1))).astype(v.dtype)
    return dq_r, dk_r, dv


def _split_fwd(q, k, v, cos_q, sin_q, cos_k, sin_k, h, scale, n_pfx, block):
    if _use_tail(q, n_pfx, q.shape[1] - n_pfx, block):
        # rotate ONCE per layer outside the kernels (`_rotate_flat`) —
        # merged o/lse come straight out of the online softmax
        q_r = _rotate_flat(q, cos_q, sin_q, h)
        k_r = _rotate_flat(k, cos_k, sin_k, h)
        return _split_fwd_roped(q_r, k_r, v, h, scale, n_pfx, block)
    (qp, qm), (kp, km), (vp, vm), (cqp, cqm), (sqp, sqm), (ckp, ckm), \
        (skp, skm) = _split_parts(q, k, v, cos_q, sin_q, cos_k, sin_k, n_pfx)
    # bulk×bulk — the FLOP carrier, at exact full-size blocks
    o_mm, lse_mm = _forward(qm, km, vm, cqm, sqm, ckm, skm, h, scale,
                            block, block)
    # bulk-q × prefix-kv: one thin kv block (n_pfx rows sit in sublanes —
    # 16-alignment suffices)
    o_mp, lse_mp = _forward(qm, kp, vp, cqm, sqm, ckp, skp, h, scale,
                            block, n_pfx)
    # prefix-q × FULL kv (its kv side re-derives divisor blocks internally)
    o_p, lse_p = _forward(qp, k, v, cqp, sqp, cos_k, sin_k, h, scale,
                          n_pfx, block)
    o_m, lse_m = _online_merge(o_mm, lse_mm[..., None],
                               o_mp, lse_mp[..., None], h)
    o = jnp.concatenate([o_p, o_m], axis=1)
    lse = jnp.concatenate([lse_p, lse_m[..., 0]], axis=2)
    return o, lse


def _split_bwd(q, k, v, cos_q, sin_q, cos_k, sin_k, h, o, lse, do, scale,
               n_pfx, block):
    """3-call merge-path backward (wide prefixes / fp32); the tail-fused
    backward lives in `_split_bwd_roped` (dispatched by the custom VJP)."""
    (qp, qm), (kp, km), (vp, vm), (cqp, cqm), (sqp, sqm), (ckp, ckm), \
        (skp, skm) = _split_parts(q, k, v, cos_q, sin_q, cos_k, sin_k, n_pfx)
    o_p, o_m = o[:, :n_pfx], o[:, n_pfx:]
    lse_p, lse_m = lse[:, :, :n_pfx], lse[:, :, n_pfx:]
    do_p, do_m = do[:, :n_pfx], do[:, n_pfx:]
    f32 = lambda x: x.astype(jnp.float32)
    # each call gets the global (merged) o/lse for its q rows → exact
    # partial dq and exact dk/dv contributions for its kv range
    dqm1, dkm, dvm = _backward(qm, km, vm, cqm, sqm, ckm, skm, h, o_m,
                               lse_m, do_m, scale, block, block)
    dqm2, dkp, dvp = _backward(qm, kp, vp, cqm, sqm, ckp, skp, h, o_m,
                               lse_m, do_m, scale, block, n_pfx)
    dqp, dk3, dv3 = _backward(qp, k, v, cqp, sqp, cos_k, sin_k, h, o_p,
                              lse_p, do_p, scale, n_pfx, block)
    dqm = (f32(dqm1) + f32(dqm2)).astype(q.dtype)
    dq = jnp.concatenate([dqp, dqm], axis=1)
    dk = (f32(dk3) + f32(jnp.concatenate([dkp, dkm], 1))).astype(k.dtype)
    dv = (f32(dv3) + f32(jnp.concatenate([dvp, dvm], 1))).astype(v.dtype)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _split_rope_flash(q, k, v, cos_q, sin_q, cos_k, sin_k, h, scale, n_pfx,
                      block):
    o, _ = _split_fwd(q, k, v, cos_q, sin_q, cos_k, sin_k, h, scale, n_pfx,
                      block)
    return o


def _split_rope_flash_fwd(q, k, v, cos_q, sin_q, cos_k, sin_k, h, scale,
                          n_pfx, block):
    if _use_tail(q, n_pfx, q.shape[1] - n_pfx, block):
        # the q/k residual slots hold the ROTATED arrays — the backward
        # reuses them instead of re-rotating (the predicate re-derives
        # this choice from shapes/dtype alone)
        q_r = _rotate_flat(q, cos_q, sin_q, h)
        k_r = _rotate_flat(k, cos_k, sin_k, h)
        o, lse = _split_fwd_roped(q_r, k_r, v, h, scale, n_pfx, block)
        o, lse = _name_attn_residuals(o, lse)
        return o, (q_r, k_r, v, cos_q, sin_q, cos_k, sin_k, o, lse)
    o, lse = _split_fwd(q, k, v, cos_q, sin_q, cos_k, sin_k, h, scale,
                        n_pfx, block)
    o, lse = _name_attn_residuals(o, lse)
    return o, (q, k, v, cos_q, sin_q, cos_k, sin_k, o, lse)


def _split_rope_flash_bwd(h, scale, n_pfx, block, res, g):
    q, k, v, cos_q, sin_q, cos_k, sin_k, o, lse = res
    if _use_tail(q, n_pfx, q.shape[1] - n_pfx, block):
        # q/k slots hold rotated arrays (see fwd); grads come back roped
        # and are restored by one fused rotate-back pass each
        dq_r, dk_r, dv = _split_bwd_roped(q, k, v, h, o, lse, g, scale,
                                          n_pfx, block)
        dq = _rotate_flat(dq_r, cos_q, sin_q, h, transpose=True)
        dk = _rotate_flat(dk_r, cos_k, sin_k, h, transpose=True)
        return dq, dk, dv, None, None, None, None
    dq, dk, dv = _split_bwd(q, k, v, cos_q, sin_q, cos_k, sin_k, h, o, lse,
                            g, scale, n_pfx, block)
    return dq, dk, dv, None, None, None, None


_split_rope_flash.defvjp(_split_rope_flash_fwd, _split_rope_flash_bwd)


# ---------------------------------------------------------------------------
# plain long path, pre-rotated: same once-per-layer `_rotate_flat` +
# table-free kernels as the tail-fused split (measured −51 ms/step at
# L=8208 vs in-kernel rope), for block-divisible L with no thin remainder.
# cos_q=None ⇒ no RoPE at all (the norope long path — previously emulated
# with identity tables, which still paid table DMA + rotation mults).
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _preroted_flash(q, k, v, cos_q, sin_q, cos_k, sin_k, h, scale, block_q,
                    block_k):
    q_r = q if cos_q is None else _rotate_flat(q, cos_q, sin_q, h)
    k_r = k if cos_k is None else _rotate_flat(k, cos_k, sin_k, h)
    o, _ = _forward(q_r, k_r, v, None, None, None, None, h, scale,
                    block_q, block_k)
    return o


def _preroted_flash_fwd(q, k, v, cos_q, sin_q, cos_k, sin_k, h, scale,
                        block_q, block_k):
    q_r = q if cos_q is None else _rotate_flat(q, cos_q, sin_q, h)
    k_r = k if cos_k is None else _rotate_flat(k, cos_k, sin_k, h)
    o, lse = _forward(q_r, k_r, v, None, None, None, None, h, scale,
                      block_q, block_k)
    o, lse = _name_attn_residuals(o, lse)
    # rotated q/k saved — the backward reuses them instead of re-rotating
    return o, (q_r, k_r, v, cos_q, sin_q, cos_k, sin_k, o, lse)


def _preroted_flash_bwd(h, scale, block_q, block_k, res, g):
    q_r, k_r, v, cos_q, sin_q, cos_k, sin_k, o, lse = res
    # asymmetric backward blocks when shapes divide cleanly — see
    # _split_bwd_roped (halves the dq-partials buffer + q/do restreaming)
    lq, lk = q_r.shape[1], k_r.shape[1]
    if (block_q == block_k and block_q % 2 == 0
            and lq % (block_q // 2) == 0 and lk % (2 * block_k) == 0):
        block_q, block_k = block_q // 2, 2 * block_k
    dq_r, dk_r, dv = _backward(q_r, k_r, v, None, None, None, None, h, o,
                               lse, g, scale, block_q, block_k)
    dq = dq_r if cos_q is None else _rotate_flat(dq_r, cos_q, sin_q, h,
                                                 transpose=True)
    dk = dk_r if cos_k is None else _rotate_flat(dk_r, cos_k, sin_k, h,
                                                 transpose=True)
    return dq, dk, dv, None, None, None, None


_preroted_flash.defvjp(_preroted_flash_fwd, _preroted_flash_bwd)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _rope_flash(q, k, v, cos_q, sin_q, cos_k, sin_k, h, scale, block_q,
                block_k, use_rope):
    if block_q == 0:  # short path (see rope_flash_attention dispatch)
        o, _ = _forward_short(q, k, v, cos_q, sin_q, cos_k, sin_k, h, scale,
                              use_rope)
    else:
        o, _ = _forward(q, k, v, cos_q, sin_q, cos_k, sin_k, h, scale,
                        block_q, block_k)
    return o


def _rope_flash_fwd(q, k, v, cos_q, sin_q, cos_k, sin_k, h, scale, block_q,
                    block_k, use_rope):
    if block_q == 0:
        o, lse = _forward_short(q, k, v, cos_q, sin_q, cos_k, sin_k, h,
                                scale, use_rope)
    else:
        o, lse = _forward(q, k, v, cos_q, sin_q, cos_k, sin_k, h, scale,
                          block_q, block_k)
    o, lse = _name_attn_residuals(o, lse)
    return o, (q, k, v, cos_q, sin_q, cos_k, sin_k, o, lse)


def _rope_flash_bwd(h, scale, block_q, block_k, use_rope, res, g):
    q, k, v, cos_q, sin_q, cos_k, sin_k, o, lse = res
    if block_q == 0:
        dq, dk, dv = _backward_short(q, k, v, cos_q, sin_q, cos_k, sin_k, h,
                                     o, lse, g, scale, use_rope)
    else:
        dq, dk, dv = _backward(q, k, v, cos_q, sin_q, cos_k, sin_k, h, o,
                               lse, g, scale, block_q, block_k)
    return dq, dk, dv, None, None, None, None


_rope_flash.defvjp(_rope_flash_fwd, _rope_flash_bwd)


def rope_flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    num_heads: int,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
) -> jnp.ndarray:
    """Fused RoPE+flash self-attention over flat [B, L, H·D] (head h lives in
    columns [h·D, (h+1)·D)); cos/sin [L, D/2] fp32; register rows use
    cos=1/sin=0 = identity rotation. Requires head_dim % 128 == 0 on real
    TPUs (block-tiling rule); tests run any D in interpreter mode."""
    d = q.shape[-1] // num_heads
    scale = d ** -0.5 if scale is None else scale
    cos = jax.lax.stop_gradient(cos.astype(jnp.float32))
    sin = jax.lax.stop_gradient(sin.astype(jnp.float32))
    if block_q is None and block_k is None \
            and _cdiv(k.shape[1], 128) * 128 <= SHORT_MAX_KV:
        # auto: short path (full-L k/v, fused dq/dk/dv bwd); explicit block
        # sizes always select the blocked long path
        block_q = block_k = 0
    else:
        if block_q is None and block_k is None:
            n_pfx = _split_prefix(q.shape[1], k.shape[1], DEFAULT_BLOCK_Q)
            if n_pfx:  # thin-remainder L (registers + tokens): exact split
                return _split_rope_flash(q, k, v, cos, sin, cos, sin,
                                         num_heads, scale, n_pfx,
                                         DEFAULT_BLOCK_Q)
        block_q = DEFAULT_BLOCK_Q if block_q is None else block_q
        block_k = DEFAULT_BLOCK_K if block_k is None else block_k
    if block_q != 0:  # blocked long path: pre-rotated mode
        return _preroted_flash(q, k, v, cos, sin, cos, sin, num_heads,
                               scale, block_q, block_k)
    return _rope_flash(q, k, v, cos, sin, cos, sin, num_heads, scale,
                       block_q, block_k, True)


def norope_flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Flat-layout flash self-attention WITHOUT RoPE — the `use_rope=False`
    configs (`model.py:313-314` positional-embedding variant). Short
    sequences skip the rope tables entirely; beyond SHORT_MAX_KV the blocked
    long path runs with identity tables (cos=1, sin=0)."""
    d = q.shape[-1] // num_heads
    scale = d ** -0.5 if scale is None else scale
    dh = d // 2
    if _cdiv(k.shape[1], 128) * 128 <= SHORT_MAX_KV:
        z_q = jnp.zeros((q.shape[1], dh), jnp.float32)
        z_k = jnp.zeros((k.shape[1], dh), jnp.float32)
        return _rope_flash(q, k, v, z_q, z_q, z_k, z_k, num_heads, scale,
                           0, 0, False)
    n_pfx = _split_prefix(q.shape[1], k.shape[1], DEFAULT_BLOCK_Q)
    if n_pfx:  # same thin-remainder decomposition as rope_flash_attention
        c_q = jnp.ones((q.shape[1], dh), jnp.float32)
        s_q = jnp.zeros((q.shape[1], dh), jnp.float32)
        c_k = jnp.ones((k.shape[1], dh), jnp.float32)
        s_k = jnp.zeros((k.shape[1], dh), jnp.float32)
        return _split_rope_flash(q, k, v, c_q, s_q, c_k, s_k, num_heads,
                                 scale, n_pfx, DEFAULT_BLOCK_Q)
    # table-free long path (no identity-table DMA or rotation mults)
    return _preroted_flash(q, k, v, None, None, None, None, num_heads,
                           scale, DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K)


def cross_flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Cross-attention on the short-sequence fused path (no RoPE): flat
    [B, Lq, H·D] q against [B, Lk, H·D] k/v, Lk ≤ SHORT_MAX_KV (the
    reference's 512-token T5 context, `model.py:149-157`). Skips the
    BLHD↔BHLD transposes of the XLA path entirely."""
    d = q.shape[-1] // num_heads
    lkp = _cdiv(k.shape[1], 128) * 128
    if lkp > SHORT_MAX_KV:
        raise ValueError(f"cross_flash_attention: kv length {k.shape[1]} "
                         f"exceeds short-path limit {SHORT_MAX_KV}")
    scale = d ** -0.5 if scale is None else scale
    dh = d // 2
    z_q = jnp.zeros((q.shape[1], dh), jnp.float32)
    z_k = jnp.zeros((k.shape[1], dh), jnp.float32)
    return _rope_flash(q, k, v, z_q, z_q, z_k, z_k, num_heads, scale, 0, 0,
                       False)


def cp_rope_flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    num_heads: int,
    token_sharding,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    """Context-parallel fused attention via a ppermute ring: the token axis
    arrives sharded over the mesh's `context` axis; k/v chunks (with their
    RoPE-table slices and pad mask) rotate around the ring while each shard
    attends its local queries chunk-by-chunk with an exact online-softmax
    merge — per-chip k/v memory is O(L/cp), unlike the previous all-gather
    path (round-1 VERDICT item 6). Token counts need not divide the axis:
    the tail pads to cp·16 and is masked by a traveling additive kv-bias."""
    from jax.sharding import PartitionSpec as P

    from video_diffusion_speedrun_tpu.parallel.mesh import (
        AXIS_CONTEXT, DATA_AXES,
    )

    mesh = token_sharding.mesh
    cp = mesh.shape[AXIS_CONTEXT]
    d = q.shape[-1] // num_heads
    scale = d ** -0.5 if scale is None else scale
    cos = jax.lax.stop_gradient(cos.astype(jnp.float32))
    sin = jax.lax.stop_gradient(sin.astype(jnp.float32))

    lq = q.shape[1]
    chunk = _cdiv(lq, cp * _ALIGN) * _ALIGN
    lp = chunk * cp
    qp = _pad_dim(q, 1, lp)
    kp = _pad_dim(k, 1, lp)
    vp = _pad_dim(v, 1, lp)
    cosp = _pad_dim(cos, 0, lp)
    sinp = _pad_dim(sin, 0, lp)
    kbias = jnp.where(jnp.arange(lp) < lq, 0.0, _NEG_INF).reshape(
        cp, 1, chunk).astype(jnp.float32)  # leading cp dim shards the mask

    def local(q, k, v, cos_q, sin_q, kbias):
        kb = kbias[0]  # [1, chunk]
        return _ring_attention(q, k, v, cos_q, sin_q, cos_q, sin_q, kb,
                               num_heads, scale, AXIS_CONTEXT, cp)

    tok = P(DATA_AXES, AXIS_CONTEXT, None)
    rope_spec = P(AXIS_CONTEXT, None)
    out = jax.shard_map(
        local, mesh=mesh,
        in_specs=(tok, tok, tok, rope_spec, rope_spec,
                  P(AXIS_CONTEXT, None, None)),
        out_specs=tok,
        check_vma=False,
    )(qp, kp, vp, cosp, sinp, kbias)
    return out[:, :lq]
