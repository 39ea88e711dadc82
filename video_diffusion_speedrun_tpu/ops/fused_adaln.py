"""Fused AdaLN-modulated RMSNorm (Pallas TPU) with custom VJP.

The DiT block applies `modulate(rms_norm(x), shift, scale)` before each of
its three matmuls (`/root/reference/model.py:121-165` — there via SDPA/
torch.compile fusion). Under XLA the fp32 RMSNorm + modulate chain gets fused
into the *prologue of the following matmul*, which drags the MXU to 40-100
TF/s on canonical shapes (measured in scripts/profile_step.py; see
PERFORMANCE.md). This kernel computes the whole chain as one bandwidth-optimal
VMEM pass (bf16 in/out, fp32 internally) so the matmul compiles standalone at
full MXU throughput:

    y = rms_norm(x) * gamma? * (1 + scale[:, None, :]) + shift[:, None, :]

The backward is a second single-pass kernel producing dx plus the shift/scale
(/gamma) reductions, accumulated in VMEM scratch across the row grid
(dgamma across the whole grid) — no [B, nL, D] partial buffers.

`gamma` is the optional trainable RMSNorm scale (reference `model.py:25-41`,
gated by train_bias_and_rms).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_diffusion_speedrun_tpu.ops.pallas_utils import (
    fit_block_div as _fit_block,
    interpret_mode as _interpret,
    pad_dim as _pad_dim,
)

DEFAULT_BLOCK_L = 512


def _auto_block(l: int, d: int, for_bwd: bool, cap: int) -> int:
    """Row block sized to the feature width: the backward holds ~5 fp32
    row-copies of the tile (xf, g, n, dn, dx), the forward ~3."""
    per_row = (20 if for_bwd else 12) * d
    budget = 6 * 1024 * 1024
    return _fit_block(l, min(cap, max(16, budget // per_row)))


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, shift_ref, scale_ref, gamma_ref, y_ref, *, eps):
    xf = x_ref[0].astype(jnp.float32)  # [blk, D]
    r = jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    n = xf * r
    mul = 1.0 + scale_ref[0].astype(jnp.float32)  # [1, D] broadcast
    if gamma_ref is not None:
        mul = mul * gamma_ref[0].astype(jnp.float32)
    y_ref[0] = (n * mul + shift_ref[0].astype(jnp.float32)).astype(y_ref.dtype)


def _fwd_kernel_nogamma(x_ref, shift_ref, scale_ref, y_ref, *, eps):
    _fwd_kernel(x_ref, shift_ref, scale_ref, None, y_ref, eps=eps)


def _forward(x, shift, scale, gamma, eps, block_l):
    b, l, d = x.shape
    block_l = _auto_block(l, d, False, block_l)
    xp = _pad_dim(x, 1, block_l)
    nl = xp.shape[1] // block_l

    in_specs = [
        pl.BlockSpec((1, block_l, d), lambda b, li: (b, li, 0)),
        pl.BlockSpec((1, 1, d), lambda b, li: (b, 0, 0)),
        pl.BlockSpec((1, 1, d), lambda b, li: (b, 0, 0)),
    ]
    args = [xp, shift.reshape(b, 1, d), scale.reshape(b, 1, d)]
    kern = _fwd_kernel_nogamma
    if gamma is not None:
        in_specs.append(pl.BlockSpec((1, 1, d), lambda b, li: (0, 0, 0)))
        args.append(gamma.reshape(1, 1, d))
        kern = _fwd_kernel

    y = pl.pallas_call(
        functools.partial(kern, eps=eps),
        grid=(b, nl),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_l, d), lambda b, li: (b, li, 0)),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=_interpret(),
    )(*args)
    return y[:, :l]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(x_ref, shift_ref, scale_ref, gamma_ref, g_ref,
                dx_ref, dshift_ref, dscale_ref, dgamma_ref,
                dsh_scr, dsc_scr, dg_scr, *, eps, has_gamma):
    li = pl.program_id(1)
    nl = pl.num_programs(1)

    @pl.when(li == 0)
    def _():
        dsh_scr[:] = jnp.zeros_like(dsh_scr)
        dsc_scr[:] = jnp.zeros_like(dsc_scr)
        if has_gamma:
            dg_scr[:] = jnp.zeros_like(dg_scr)

    xf = x_ref[0].astype(jnp.float32)  # [blk, D]
    g = g_ref[0].astype(jnp.float32)
    d = xf.shape[-1]
    r = jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    n = xf * r
    one_p_scale = 1.0 + scale_ref[0].astype(jnp.float32)  # [1, D]

    if has_gamma:
        gam = gamma_ref[0].astype(jnp.float32)
        mul = one_p_scale * gam
        dg_scr[:] += jnp.sum(g * n * one_p_scale, axis=0, keepdims=True)
        dsc_scr[:] += jnp.sum(g * n * gam, axis=0, keepdims=True)
    else:
        mul = one_p_scale
        dsc_scr[:] += jnp.sum(g * n, axis=0, keepdims=True)
    dsh_scr[:] += jnp.sum(g, axis=0, keepdims=True)

    dn = g * mul
    # rms backward: dx = r * (dn - n * mean(n*dn))
    dx = r * (dn - n * jnp.sum(n * dn, axis=-1, keepdims=True) / d)
    dx_ref[0] = dx.astype(dx_ref.dtype)

    @pl.when(li == nl - 1)
    def _():
        dshift_ref[0] = dsh_scr[:].astype(dshift_ref.dtype)
        dscale_ref[0] = dsc_scr[:].astype(dscale_ref.dtype)
        if has_gamma:
            dgamma_ref[0] = dg_scr[:].astype(dgamma_ref.dtype)


def _bwd_kernel_nogamma(x_ref, shift_ref, scale_ref, g_ref,
                        dx_ref, dshift_ref, dscale_ref,
                        dsh_scr, dsc_scr, dg_scr, *, eps):
    _bwd_kernel(x_ref, shift_ref, scale_ref, None, g_ref,
                dx_ref, dshift_ref, dscale_ref, None,
                dsh_scr, dsc_scr, dg_scr, eps=eps, has_gamma=False)


def _backward(x, shift, scale, gamma, g, eps, block_l):
    b, l, d = x.shape
    block_l = _auto_block(l, d, True, block_l)
    xp = _pad_dim(x, 1, block_l)
    gp = _pad_dim(g, 1, block_l)  # zero-padded grad rows contribute zero sums
    nl = xp.shape[1] // block_l

    xspec = pl.BlockSpec((1, block_l, d), lambda b, li: (b, li, 0))
    bspec = pl.BlockSpec((1, 1, d), lambda b, li: (b, 0, 0))
    gspec = pl.BlockSpec((1, 1, d), lambda b, li: (0, 0, 0))

    in_specs = [xspec, bspec, bspec]
    args = [xp, shift.reshape(b, 1, d), scale.reshape(b, 1, d)]
    out_specs = [xspec, bspec, bspec]
    out_shape = [
        jax.ShapeDtypeStruct(xp.shape, x.dtype),
        jax.ShapeDtypeStruct((b, 1, d), shift.dtype),
        jax.ShapeDtypeStruct((b, 1, d), scale.dtype),
    ]
    if gamma is not None:
        in_specs.append(gspec)
        args.append(gamma.reshape(1, 1, d))
        out_specs.append(bspec)  # per-b partials, summed outside → b parallel
        out_shape.append(jax.ShapeDtypeStruct((b, 1, d), jnp.float32))
        kern = functools.partial(_bwd_kernel, eps=eps, has_gamma=True)
    else:
        kern = functools.partial(_bwd_kernel_nogamma, eps=eps)
    in_specs.append(xspec)
    args.append(gp)

    outs = pl.pallas_call(
        kern,
        grid=(b, nl),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # scratch accumulates over the row grid only → batch dim parallel
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*args)
    if gamma is not None:
        dx, dshift, dscale, dgamma = outs
        dgamma = dgamma.sum(axis=0).reshape(-1).astype(gamma.dtype)
    else:
        dx, dshift, dscale = outs
        dgamma = None
    return dx[:, :l], dshift.reshape(b, d), dscale.reshape(b, d), dgamma


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _adaln_rms(x, shift, scale, gamma, eps, block_l):
    return _forward(x, shift, scale, gamma, eps, block_l)


def _adaln_rms_fwd(x, shift, scale, gamma, eps, block_l):
    y = _forward(x, shift, scale, gamma, eps, block_l)
    return y, (x, shift, scale, gamma)


def _adaln_rms_bwd(eps, block_l, res, g):
    x, shift, scale, gamma = res
    dx, dshift, dscale, dgamma = _backward(x, shift, scale, gamma, g, eps,
                                           block_l)
    return dx, dshift, dscale, dgamma


_adaln_rms.defvjp(_adaln_rms_fwd, _adaln_rms_bwd)


def adaln_rms_modulate(
    x: jnp.ndarray,
    shift: jnp.ndarray,
    scale: jnp.ndarray,
    gamma: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
    block_l: int = DEFAULT_BLOCK_L,
) -> jnp.ndarray:
    """`rms_norm(x[, gamma]) * (1 + scale) + shift` in one VMEM pass.

    x [B, L, D]; shift/scale [B, D] (broadcast over L); gamma [D] optional.
    Matches ops.normalization.rms_norm + models.dit._modulate bit-for-bit up
    to fp32-accumulation order.
    """
    return _adaln_rms(x, shift, scale, gamma, eps, block_l)


# ---------------------------------------------------------------------------
# gated residual + AdaLN-RMSNorm: x_new = x + delta·gate;
# y = modulated-norm(x_new). Fuses the DiT block's residual join
# (`model.py:139,160` x += gate·out) with the next sub-layer's norm prologue.
# ---------------------------------------------------------------------------


def _gr_fwd_kernel(x_ref, d_ref, gate_ref, shift_ref, scale_ref, gamma_ref,
                   xn_ref, y_ref, *, eps):
    xf = x_ref[0].astype(jnp.float32) + (
        d_ref[0].astype(jnp.float32) * gate_ref[0].astype(jnp.float32)
    )
    xn_ref[0] = xf.astype(xn_ref.dtype)
    r = jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    n = xf * r
    mul = 1.0 + scale_ref[0].astype(jnp.float32)
    if gamma_ref is not None:
        mul = mul * gamma_ref[0].astype(jnp.float32)
    y_ref[0] = (n * mul + shift_ref[0].astype(jnp.float32)).astype(y_ref.dtype)


def _gr_fwd_kernel_nogamma(x_ref, d_ref, gate_ref, shift_ref, scale_ref,
                           xn_ref, y_ref, *, eps):
    _gr_fwd_kernel(x_ref, d_ref, gate_ref, shift_ref, scale_ref, None,
                   xn_ref, y_ref, eps=eps)


def _gr_forward(x, delta, gate, shift, scale, gamma, eps, block_l):
    b, l, d = x.shape
    block_l = _auto_block(l, d, False, block_l)
    xp = _pad_dim(x, 1, block_l)
    dp = _pad_dim(delta, 1, block_l)
    nl = xp.shape[1] // block_l

    xspec = pl.BlockSpec((1, block_l, d), lambda b, li: (b, li, 0))
    bspec = pl.BlockSpec((1, 1, d), lambda b, li: (b, 0, 0))
    in_specs = [xspec, xspec, bspec, bspec, bspec]
    args = [xp, dp, gate.reshape(b, 1, d), shift.reshape(b, 1, d),
            scale.reshape(b, 1, d)]
    kern = _gr_fwd_kernel_nogamma
    if gamma is not None:
        in_specs.append(pl.BlockSpec((1, 1, d), lambda b, li: (0, 0, 0)))
        args.append(gamma.reshape(1, 1, d))
        kern = _gr_fwd_kernel

    xn, y = pl.pallas_call(
        functools.partial(kern, eps=eps),
        grid=(b, nl),
        in_specs=in_specs,
        out_specs=(xspec, xspec),
        out_shape=(
            jax.ShapeDtypeStruct(xp.shape, x.dtype),
            jax.ShapeDtypeStruct(xp.shape, x.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=_interpret(),
    )(*args)
    return xn[:, :l], y[:, :l]


def _gr_bwd_kernel(xn_ref, d_ref, gate_ref, scale_ref, gamma_ref,
                   gx_ref, gy_ref,
                   dx_ref, ddelta_ref, dgate_ref, dshift_ref, dscale_ref,
                   dgamma_ref,
                   dga_scr, dsh_scr, dsc_scr, dg_scr,
                   *, eps, has_gamma):
    li = pl.program_id(1)
    nl = pl.num_programs(1)

    @pl.when(li == 0)
    def _():
        dga_scr[:] = jnp.zeros_like(dga_scr)
        dsh_scr[:] = jnp.zeros_like(dsh_scr)
        dsc_scr[:] = jnp.zeros_like(dsc_scr)
        if has_gamma:
            dg_scr[:] = jnp.zeros_like(dg_scr)

    xf = xn_ref[0].astype(jnp.float32)   # x_new (saved from forward)
    gy = gy_ref[0].astype(jnp.float32)
    d = xf.shape[-1]
    r = jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    n = xf * r
    one_p_scale = 1.0 + scale_ref[0].astype(jnp.float32)

    if has_gamma:
        gam = gamma_ref[0].astype(jnp.float32)
        mul = one_p_scale * gam
        dg_scr[:] += jnp.sum(gy * n * one_p_scale, axis=0, keepdims=True)
        dsc_scr[:] += jnp.sum(gy * n * gam, axis=0, keepdims=True)
    else:
        mul = one_p_scale
        dsc_scr[:] += jnp.sum(gy * n, axis=0, keepdims=True)
    dsh_scr[:] += jnp.sum(gy, axis=0, keepdims=True)

    dn = gy * mul
    dxn = r * (dn - n * jnp.sum(n * dn, axis=-1, keepdims=True) / d)
    dxn = dxn + gx_ref[0].astype(jnp.float32)  # residual-stream cotangent
    dx_ref[0] = dxn.astype(dx_ref.dtype)
    gate = gate_ref[0].astype(jnp.float32)
    ddelta_ref[0] = (dxn * gate).astype(ddelta_ref.dtype)
    dga_scr[:] += jnp.sum(dxn * d_ref[0].astype(jnp.float32), axis=0,
                          keepdims=True)

    @pl.when(li == nl - 1)
    def _():
        dgate_ref[0] = dga_scr[:].astype(dgate_ref.dtype)
        dshift_ref[0] = dsh_scr[:].astype(dshift_ref.dtype)
        dscale_ref[0] = dsc_scr[:].astype(dscale_ref.dtype)
        if has_gamma:
            dgamma_ref[0] = dg_scr[:].astype(dgamma_ref.dtype)


def _gr_bwd_kernel_nogamma(xn_ref, d_ref, gate_ref, scale_ref,
                           gx_ref, gy_ref,
                           dx_ref, ddelta_ref, dgate_ref, dshift_ref,
                           dscale_ref,
                           dga_scr, dsh_scr, dsc_scr, dg_scr, *, eps):
    _gr_bwd_kernel(xn_ref, d_ref, gate_ref, scale_ref, None, gx_ref, gy_ref,
                   dx_ref, ddelta_ref, dgate_ref, dshift_ref, dscale_ref,
                   None, dga_scr, dsh_scr, dsc_scr, dg_scr,
                   eps=eps, has_gamma=False)


def _gr_backward(xn, delta, gate, scale, gamma, gx, gy, eps, block_l):
    b, l, d = xn.shape
    block_l = _auto_block(l, d, True, block_l)
    xnp = _pad_dim(xn, 1, block_l)
    dp = _pad_dim(delta, 1, block_l)
    gxp = _pad_dim(gx, 1, block_l)
    gyp = _pad_dim(gy, 1, block_l)
    nl = xnp.shape[1] // block_l

    xspec = pl.BlockSpec((1, block_l, d), lambda b, li: (b, li, 0))
    bspec = pl.BlockSpec((1, 1, d), lambda b, li: (b, 0, 0))
    gspec = pl.BlockSpec((1, 1, d), lambda b, li: (0, 0, 0))

    in_specs = [xspec, xspec, bspec, bspec]
    args = [xnp, dp, gate.reshape(b, 1, d), scale.reshape(b, 1, d)]
    out_specs = [xspec, xspec, bspec, bspec, bspec]
    out_shape = [
        jax.ShapeDtypeStruct(xnp.shape, xn.dtype),
        jax.ShapeDtypeStruct(xnp.shape, delta.dtype),
        jax.ShapeDtypeStruct((b, 1, d), gate.dtype),
        jax.ShapeDtypeStruct((b, 1, d), jnp.float32),
        jax.ShapeDtypeStruct((b, 1, d), jnp.float32),
    ]
    if gamma is not None:
        in_specs.append(gspec)
        args.append(gamma.reshape(1, 1, d))
        out_specs.append(bspec)  # per-b partials, summed outside → b parallel
        out_shape.append(jax.ShapeDtypeStruct((b, 1, d), jnp.float32))
        kern = functools.partial(_gr_bwd_kernel, eps=eps, has_gamma=True)
    else:
        kern = functools.partial(_gr_bwd_kernel_nogamma, eps=eps)
    in_specs += [xspec, xspec]
    args += [gxp, gyp]

    outs = pl.pallas_call(
        kern,
        grid=(b, nl),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*args)
    if gamma is not None:
        dx, ddelta, dgate, dshift, dscale, dgamma = outs
        dgamma = dgamma.sum(axis=0).reshape(-1).astype(gamma.dtype)
    else:
        dx, ddelta, dgate, dshift, dscale = outs
        dgamma = None
    return (dx[:, :l], ddelta[:, :l], dgate.reshape(b, d),
            dshift.reshape(b, d), dscale.reshape(b, d), dgamma)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _gr_adaln(x, delta, gate, shift, scale, gamma, eps, block_l):
    return _gr_forward(x, delta, gate, shift, scale, gamma, eps, block_l)


def _gr_adaln_fwd(x, delta, gate, shift, scale, gamma, eps, block_l):
    xn, y = _gr_forward(x, delta, gate, shift, scale, gamma, eps, block_l)
    # save x_new (not x): backward then needs no recompute of the residual add
    return (xn, y), (xn, delta, gate, scale, gamma)


def _gr_adaln_bwd(eps, block_l, res, gs):
    xn, delta, gate, scale, gamma = res
    gx, gy = gs
    dx, ddelta, dgate, dshift, dscale, dgamma = _gr_backward(
        xn, delta, gate, scale, gamma, gx, gy, eps, block_l)
    # dshift/dscale computed fp32; cast to the cotangent dtype of shift/scale
    return (dx, ddelta, dgate, dshift.astype(gy.dtype),
            dscale.astype(gy.dtype), dgamma)


_gr_adaln.defvjp(_gr_adaln_fwd, _gr_adaln_bwd)


def gated_residual_adaln(
    x: jnp.ndarray,
    delta: jnp.ndarray,
    gate: jnp.ndarray,
    shift: jnp.ndarray,
    scale: jnp.ndarray,
    gamma: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
    block_l: int = DEFAULT_BLOCK_L,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(x + delta·gate, modulated-norm of it) in one VMEM pass.

    x/delta [B, L, D]; gate/shift/scale [B, D]; gamma [D] optional. Returns
    (x_new, y) — the residual stream and the next sub-layer's normed input.
    """
    return _gr_adaln(x, delta, gate, shift, scale, gamma, eps, block_l)
