"""Fused bias + exact-GELU (Pallas TPU) with custom VJP.

The reference MLP applies torch's default (exact-erf) GELU between fc1 and
fc2 (`/root/reference/model.py:82-87`). On TPU, XLA lowers `erf` to a long
VPU polynomial and fuses it into the fc1 matmul epilogue, dragging the MXU:
measured on v5e, [8448,512]x[512,2048] goes 0.11 ms bare → 0.35 ms with
bias+erf-GELU fused in (scripts in PERFORMANCE.md). This kernel computes
bias + GELU as one bandwidth-optimal VMEM pass using the Abramowitz–Stegun
7.1.26 rational erf approximation evaluated in the exp2 domain (the VPU's
native transcendental): |erf error| ≤ 1.5e-7 — three orders of magnitude
below bf16 resolution, so outputs are bit-identical to exact GELU after the
bf16 cast in practice.

Backward recomputes the activation from the saved pre-bias input (one pass:
dx = g · (Φ(x) + x·φ(x))) and accumulates dbias in VMEM scratch across the
whole grid.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_diffusion_speedrun_tpu.ops.pallas_utils import (
    fit_block_div,
    interpret_mode as _interpret,
    pad_dim as _pad_dim,
)

_LOG2E = 1.4426950408889634
_INV_SQRT2 = 0.7071067811865476
_INV_SQRT2PI = 0.3989422804014327

# Abramowitz & Stegun 7.1.26 coefficients
_AS_P = 0.3275911
_AS_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)

# Odd-Chebyshev minimax-style fits of Φ(x)-1/2 and gelu'(x)-1/2 on
# |x| ≤ _POLY_R (clamped outside; both saturate): pure FMA chains — no
# exp/reciprocal — for the bf16 path where |err| (≤4.8e-4 on Φ, ≤1.4e-3 on
# gelu') sits below bf16 resolution. fp32 inputs use the A&S erf form.
_POLY_R = 4.2
_PHI_C = (1.6730854313132952, -4.819356366004858, 11.665324048457048,
          -19.2571592112833, 20.043393683968894, -11.692634553213583,
          2.887810706082727)
_DGELU_C = (3.3437508389045996, -19.301024758068174, 71.6240707797499,
            -169.03201824319132, 256.1130938463848, -239.9744046965949,
            125.8564616128173, -28.13100148328976)


def _odd_poly(coeffs, t):
    t2 = t * t
    acc = jnp.full_like(t, coeffs[-1])
    for c in reversed(coeffs[:-1]):
        acc = acc * t2 + c
    return acc * t


def _phi_poly(x):
    """Φ(x) = 0.5 + odd-poly(x/R) on |x| ≤ R, hard-saturated to 0/1 beyond:
    the saturation wheres override the raw poly value for every |x| ≥ R
    (a select discards the unselected branch, diverging-poly, ±inf and all
    — NaN inputs still propagate through the phi branch), so no clip on t
    is needed; the exact 0/1 endpoints matter because a ~4.6e-4 poly
    endpoint residual would otherwise leak a wrong-signed +|x|·4.6e-4 into
    gelu(x) for x < −R (growing linearly with |x|)."""
    t = x * (1.0 / _POLY_R)
    phi = 0.5 + _odd_poly(_PHI_C, t)
    return jnp.where(x <= -_POLY_R, 0.0, jnp.where(x >= _POLY_R, 1.0, phi))


def _dgelu_poly(x):
    """gelu'(x) on |x| ≤ R, hard-saturated to 0/1 beyond (true gelu'(±R) is
    within 5e-5 of the asymptote; the unclamped endpoint would leak ~1e-3
    gradient through saturated units). Same no-clip rationale as
    _phi_poly."""
    t = x * (1.0 / _POLY_R)
    dg = 0.5 + _odd_poly(_DGELU_C, t)
    return jnp.where(x <= -_POLY_R, 0.0, jnp.where(x >= _POLY_R, 1.0, dg))


def _erf(u):
    """A&S 7.1.26 erf, fp32, exp2-domain exponential. |err| ≤ 1.5e-7."""
    a = jnp.abs(u)
    t = 1.0 / (1.0 + _AS_P * a)
    poly = t * (_AS_A[0] + t * (_AS_A[1] + t * (_AS_A[2] + t * (_AS_A[3] + t * _AS_A[4]))))
    e = 1.0 - poly * jnp.exp2(-(a * a) * _LOG2E)
    return jnp.sign(u) * e


def _gelu_parts(x):
    """Returns (cdf, pdf·x-ready pieces): Φ(x) = 0.5(1+erf(x/√2))."""
    return 0.5 * (1.0 + _erf(x * _INV_SQRT2))


def _fwd_kernel(x_ref, b_ref, y_ref, *, poly):
    x = x_ref[0].astype(jnp.float32)
    if b_ref is not None:
        x = x + b_ref[0].astype(jnp.float32)
    cdf = _phi_poly(x) if poly else _gelu_parts(x)
    y_ref[0] = (x * cdf).astype(y_ref.dtype)


def _fwd_kernel_nobias(x_ref, y_ref, *, poly):
    _fwd_kernel(x_ref, None, y_ref, poly=poly)


def _bwd_kernel(x_ref, b_ref, g_ref, dx_ref, db_ref, db_scr, *, poly):
    li = pl.program_id(1)
    nl = pl.num_programs(1)
    has_bias = b_ref is not None
    if has_bias:
        @pl.when(li == 0)
        def _():
            db_scr[:] = jnp.zeros_like(db_scr)

    x = x_ref[0].astype(jnp.float32)
    if has_bias:
        x = x + b_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    if poly:
        dg = _dgelu_poly(x)
    else:
        pdf = jnp.exp2(-(x * x) * (0.5 * _LOG2E)) * _INV_SQRT2PI
        dg = _gelu_parts(x) + x * pdf
    dx = g * dg
    dx_ref[0] = dx.astype(dx_ref.dtype)
    if has_bias:
        db_scr[:] += jnp.sum(dx, axis=0, keepdims=True)

        @pl.when(li == nl - 1)
        def _():
            db_ref[0] = db_scr[:].astype(db_ref.dtype)


def _bwd_kernel_nobias(x_ref, g_ref, dx_ref, db_scr, *, poly):
    _bwd_kernel(x_ref, None, g_ref, dx_ref, None, db_scr, poly=poly)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _block_l(l: int, f: int) -> int:
    """Divisor-aligned row block sized so ~3 fp32 copies of the tile fit 6 MB
    (pad-free whenever L has a suitable divisor)."""
    budget = 6 * 1024 * 1024
    blk = max(16, (budget // (12 * f)) // 16 * 16)
    return fit_block_div(l, blk)


def _forward(x, bias):
    b, l, f = x.shape
    blk = _block_l(l, f)
    xp = _pad_dim(x, 1, blk)
    nl = xp.shape[1] // blk
    xspec = pl.BlockSpec((1, blk, f), lambda b, li: (b, li, 0))
    in_specs, args = [xspec], [xp]
    poly = x.dtype == jnp.bfloat16
    kern = functools.partial(_fwd_kernel_nobias, poly=poly)
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, 1, f), lambda b, li: (0, 0, 0)))
        args.append(bias.reshape(1, 1, f))
        kern = functools.partial(_fwd_kernel, poly=poly)
    y = pl.pallas_call(
        kern,
        grid=(b, nl),
        in_specs=in_specs,
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=_interpret(),
    )(*args)
    return y[:, :l]


def _backward(x, bias, g):
    b, l, f = x.shape
    blk = _block_l(l, f)
    xp = _pad_dim(x, 1, blk)
    gp = _pad_dim(g, 1, blk)  # zero grad rows → zero dbias contributions
    nl = xp.shape[1] // blk
    xspec = pl.BlockSpec((1, blk, f), lambda b, li: (b, li, 0))
    poly = x.dtype == jnp.bfloat16
    if bias is not None:
        outs = pl.pallas_call(
            functools.partial(_bwd_kernel, poly=poly),
            grid=(b, nl),
            in_specs=[xspec, pl.BlockSpec((1, 1, f), lambda b, li: (0, 0, 0)),
                      xspec],
            out_specs=(xspec,
                       pl.BlockSpec((1, 1, f), lambda b, li: (b, 0, 0))),
            out_shape=(
                jax.ShapeDtypeStruct(xp.shape, x.dtype),
                jax.ShapeDtypeStruct((b, 1, f), jnp.float32),
            ),
            scratch_shapes=[pltpu.VMEM((1, f), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                # per-b dbias partials summed outside → batch dim parallel
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=_interpret(),
        )(xp, bias.reshape(1, 1, f), gp)
        dx, db = outs
        return dx[:, :l], db.sum(axis=0).reshape(bias.shape).astype(bias.dtype)
    dx = pl.pallas_call(
        functools.partial(_bwd_kernel_nobias, poly=poly),
        grid=(b, nl),
        in_specs=[xspec, xspec],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((1, f), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=_interpret(),
    )(xp, gp)
    return dx[:, :l], None


@jax.custom_vjp
def _bias_gelu(x, bias):
    return _forward(x, bias)


def _bias_gelu_fwd(x, bias):
    return _forward(x, bias), (x, bias)


def _bias_gelu_bwd(res, g):
    x, bias = res
    return _backward(x, bias, g)


_bias_gelu.defvjp(_bias_gelu_fwd, _bias_gelu_bwd)


def bias_gelu(x: jnp.ndarray, bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """GELU(x + bias) in one VMEM pass (exact-erf semantics; A&S 7.1.26).

    x [B, L, F]; bias [F] or None. Matches jax.nn.gelu(approximate=False)
    to ≤1.5e-7 absolute in fp32 (identical after bf16 cast).
    """
    return _bias_gelu(x, bias)
