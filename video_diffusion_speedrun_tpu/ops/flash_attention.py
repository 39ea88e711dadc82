"""Pallas TPU flash attention (forward + backward).

TPU-native replacement for the reference's fused SDPA/FlashAttention calls
(`/root/reference/model.py:136,157`): O(L) memory, blockwise online softmax,
all matmuls on the MXU with fp32 accumulation. Non-causal (video DiT
self-attention is bidirectional over spatiotemporal tokens + registers).

Layout: inputs [B, H, L, D] (D = head dim). The wrapper folds (B, H), pads L
to the block size, and masks padded key columns inside the kernel; padded
query rows are neutralized by zero-padding q/do (see backward notes below).

Backward is the standard two-kernel flash backward:
  delta = rowsum(dO ∘ O)                      (computed in XLA, elementwise)
  dV = Pᵀ dO;  dP = dO Vᵀ;  dS = P ∘ (dP − delta) · scale
  dK = dSᵀ Q;  dQ = dS K
with P recomputed from (Q, K, LSE) — nothing but O and LSE is saved.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_diffusion_speedrun_tpu.ops.pallas_utils import (
    cdiv as _cdiv,
    fit_block as _fit_block,
    interpret_mode as _interpret,
    pad_dim as _pad_dim,
)

DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 1024
_NEG_INF = -1e30  # avoid -inf arithmetic (NaN on fully-masked garbage rows)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                *, scale: float, kv_len: int, block_k: int):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [bq, D]
    k = k_ref[0]  # [bk, D]
    v = v_ref[0]  # [bk, D]
    bq = q.shape[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [bq, bk]

    if kv_len % block_k != 0:  # static: mask only ragged tails
        kmax = kv_len - ki * block_k
        mask = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) < kmax
        s = jnp.where(mask, s, _NEG_INF)

    m_prev = m_scr[:, :1]                      # [bq, 1]
    l_prev = l_scr[:, :1]                      # [bq, 1]
    m_cur = jnp.max(s, axis=1, keepdims=True)  # [bq, 1]
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                     # [bq, bk] fp32
    l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == nk - 1)
    def _finish():
        l = l_scr[:, :1]
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)
        lse = m_scr[:, :1] + jnp.log(l)        # [bq, 1]
        lse_ref[0, 0] = lse.reshape(bq)


def _flash_forward(q, k, v, scale, block_q, block_k):
    bh, lq, d = q.shape
    lk = k.shape[1]
    block_q = _fit_block(lq, block_q)
    block_k = _fit_block(lk, block_k)

    qp = _pad_dim(q, 1, block_q)
    kp = _pad_dim(k, 1, block_k)
    vp = _pad_dim(v, 1, block_k)
    lqp, lkp = qp.shape[1], kp.shape[1]
    nq, nk = lqp // block_q, lkp // block_k

    kernel = functools.partial(
        _fwd_kernel, scale=scale, kv_len=lk, block_k=block_k
    )
    out_shape = (
        jax.ShapeDtypeStruct((bh, lqp, d), q.dtype),
        jax.ShapeDtypeStruct((bh, 1, lqp), jnp.float32),
    )
    o, lse = pl.pallas_call(
        kernel,
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, qi, ki: (b, 0, qi)),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * lqp * lkp * d,
            bytes_accessed=2 * bh * (lqp + 2 * lkp) * d,
            transcendentals=bh * lqp * lkp,
        ),
        interpret=_interpret(),
    )(qp, kp, vp)
    return o[:, :lq], lse[:, 0, :lq]


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr,
                    *, scale: float, kv_len: int, block_k: int):
    qi = pl.program_id(2)
    nq = pl.num_programs(2)
    ki = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0]          # [bq, D]
    k = k_ref[0]          # [bk, D]
    v = v_ref[0]          # [bk, D]
    do = do_ref[0]        # [bq, D]
    bq = q.shape[0]
    lse = lse_ref[0, 0].reshape(bq, 1)   # [bq, 1]
    delta = delta_ref[0, 0].reshape(bq, 1)  # [bq, 1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                   # [bq, bk]
    p = jnp.exp(s - lse)
    if kv_len % block_k != 0:  # static: mask only ragged tails
        kmax = kv_len - ki * block_k
        mask = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1) < kmax
        p = jnp.where(mask, p, 0.0)

    pt = p.astype(do.dtype)
    dv_scr[:] += jax.lax.dot_general(            # Pᵀ dO → [bk, D]
        pt, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(                    # dO Vᵀ → [bq, bk]
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (p * (dp - delta) * scale).astype(q.dtype)
    dk_scr[:] += jax.lax.dot_general(            # dSᵀ Q → [bk, D]
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(qi == nq - 1)
    def _finish():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   dq_ref, dq_scr,
                   *, scale: float, kv_len: int, block_k: int):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    bq = q.shape[0]
    lse = lse_ref[0, 0].reshape(bq, 1)
    delta = delta_ref[0, 0].reshape(bq, 1)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    p = jnp.exp(s - lse)
    if kv_len % block_k != 0:  # static: mask only ragged tails
        kmax = kv_len - ki * block_k
        mask = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1) < kmax
        p = jnp.where(mask, p, 0.0)

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (p * (dp - delta) * scale).astype(q.dtype)
    dq_scr[:] += jax.lax.dot_general(            # dS K → [bq, D]
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == nk - 1)
    def _finish():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _flash_backward(q, k, v, o, lse, do, scale, block_q, block_k):
    bh, lq, d = q.shape
    lk = k.shape[1]
    block_q = _fit_block(lq, block_q)
    block_k = _fit_block(lk, block_k)

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)  # [bh, lq]

    qp = _pad_dim(q, 1, block_q)
    dop = _pad_dim(do, 1, block_q)
    lsep = _pad_dim(lse[:, None, :], 2, block_q)
    deltap = _pad_dim(delta[:, None, :], 2, block_q)
    kp = _pad_dim(k, 1, block_k)
    vp = _pad_dim(v, 1, block_k)
    lqp, lkp = qp.shape[1], kp.shape[1]
    nq, nk = lqp // block_q, lkp // block_k

    common = dict(scale=scale, kv_len=lk, block_k=block_k)
    interpret = _interpret()

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, **common),
        grid=(bh, nk, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, ki, qi: (b, qi, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, ki, qi: (b, 0, qi)),
            pl.BlockSpec((1, 1, block_q), lambda b, ki, qi: (b, 0, qi)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda b, ki, qi: (b, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, ki, qi: (b, ki, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, lkp, d), k.dtype),
            jax.ShapeDtypeStruct((bh, lkp, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * bh * lqp * lkp * d,
            bytes_accessed=2 * bh * (2 * lqp + 4 * lkp) * d,
            transcendentals=bh * lqp * lkp,
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lsep, deltap)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, **common),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, qi, ki: (b, 0, qi)),
            pl.BlockSpec((1, 1, block_q), lambda b, qi, ki: (b, 0, qi)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, lqp, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * lqp * lkp * d,
            bytes_accessed=2 * bh * (2 * lqp + 2 * lkp) * d,
            transcendentals=bh * lqp * lkp,
        ),
        interpret=interpret,
    )(qp, kp, vp, dop, lsep, deltap)

    return dq[:, :lq], dk[:, :lk], dv[:, :lk]


# ---------------------------------------------------------------------------
# Public API (custom VJP over [B, H, L, D])
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention(q, k, v, scale, block_q, block_k):
    o, _ = _flash_forward(q, k, v, scale, block_q, block_k)
    return o


def _flash_fwd_rule(q, k, v, scale, block_q, block_k):
    o, lse = _flash_forward(q, k, v, scale, block_q, block_k)
    return o, (q, k, v, o, lse)


def _flash_bwd_rule(scale, block_q, block_k, res, g):
    q, k, v, o, lse = res
    dq, dk, dv = _flash_backward(q, k, v, o, lse, g, scale, block_q, block_k)
    return dq, dk, dv


_flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jnp.ndarray:
    """Flash attention over [B, H, L, D] (defaults match torch SDPA:
    scale = D^-0.5, no mask)."""
    b, h, lq, d = q.shape
    scale = d ** -0.5 if scale is None else scale
    qf = q.reshape(b * h, lq, d)
    kf = k.reshape(b * h, k.shape[2], d)
    vf = v.reshape(b * h, v.shape[2], d)
    of = _flash_attention(qf, kf, vf, scale, block_q, block_k)
    return of.reshape(b, h, lq, d)
