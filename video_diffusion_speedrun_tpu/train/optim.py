"""muP AdamW as a single fused optax transformation.

TPU-native equivalent of the reference's fused-CUDA AdamW over muP param
groups (`/root/reference/train.py:335-344`): instead of materializing
(lr, wd)-keyed groups, per-leaf lr/wd pytrees are folded into one XLA-fused
update — torch semantics `p ← p − lr_t·(adam_dir + wd·p)` with bias-corrected
Adam (betas (0.95, 0.99) `train.py:342`), scheduler multiplier applied per
step like torch LambdaLR.
"""

from __future__ import annotations

import os
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from video_diffusion_speedrun_tpu.core.config import OptimizerConfig
from video_diffusion_speedrun_tpu.train.mup import mup_table
from video_diffusion_speedrun_tpu.train.schedules import get_schedule


class MupAdamWState(NamedTuple):
    count: jnp.ndarray
    adam: Any


def adamw_leaf_delta(g, m, v, p, lr, wd, *, lr_t, bc1, bc2, b1, b2, eps):
    """The ONE fp32 AdamW leaf update all three in-repo variants share
    (`mup_adamw`, `fused_apply`, and train/inloop.py's non-factored branch)
    — torch semantics `Δ = −lr_t·lr·(adam_dir + wd·p)` with optax
    scale_by_adam op order `(m/bc1) / (sqrt(v/bc2) + eps)`. Keeping the
    math in one place is what makes the standard-vs-inloop fp32
    bit-identity test (`tests/test_inloop.py`) a guarantee instead of a
    manual-sync convention.

    Returns `(delta, m2, v2)`: delta cast to `p.dtype`, moments in fp32
    (callers cast to their storage dtype).
    """
    gf = g.astype(jnp.float32)
    m2 = b1 * m.astype(jnp.float32) + (1.0 - b1) * gf
    v2 = b2 * v.astype(jnp.float32) + (1.0 - b2) * jnp.square(gf)
    direction = (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps)
    delta = (-(lr * lr_t) * (direction + wd * p)).astype(p.dtype)
    return delta, m2, v2


def unzip_leaf_triples(out: Any, treedef) -> tuple:
    """Split a tree of (a, b, c) leaf tuples into three trees."""
    leaves = jax.tree.leaves(out, is_leaf=lambda x: isinstance(x, tuple))
    return tuple(
        jax.tree.unflatten(treedef, [l[i] for l in leaves]) for i in range(3)
    )


def mup_adamw(
    lr_tree: Any,
    wd_tree: Any,
    schedule_fn: Callable,
    b1: float = 0.95,
    b2: float = 0.99,
    eps: float = 1e-8,
    moments_dtype: Any = None,
) -> optax.GradientTransformation:
    """`moments_dtype=None` stores Adam moments in the param dtype (fp32 in
    production); jnp.bfloat16 halves optimizer HBM (the XL one-chip regime)
    — moment math always runs in fp32 with cast-out storage, so fp32
    moments are bit-identical to the optax chain (asserted in tests) and
    bf16 moments differ only by storage rounding (parity-checked over 20
    steps in test_train_step.py)."""

    def _zeros(p):
        return jnp.zeros_like(
            p, dtype=moments_dtype if moments_dtype is not None else p.dtype)

    def init_fn(params):
        return MupAdamWState(
            count=jnp.zeros((), jnp.int32),
            adam=optax.ScaleByAdamState(
                count=jnp.zeros((), jnp.int32),
                mu=jax.tree.map(_zeros, params),
                nu=jax.tree.map(_zeros, params),
            ),
        )

    def update_fn(grads, state, params):
        count = state.adam.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        lr_t = schedule_fn(state.count)

        def leaf(g, m, v, p, lr, wd):
            upd, m2, v2 = adamw_leaf_delta(
                g, m, v, p, lr, wd,
                lr_t=lr_t, bc1=bc1, bc2=bc2, b1=b1, b2=b2, eps=eps)
            return upd, m2.astype(m.dtype), v2.astype(v.dtype)

        out = jax.tree.map(leaf, grads, state.adam.mu, state.adam.nu, params,
                           lr_tree, wd_tree)
        updates, new_m, new_v = unzip_leaf_triples(
            out, jax.tree.structure(params))
        return updates, MupAdamWState(
            count=state.count + 1,
            adam=optax.ScaleByAdamState(count=count, mu=new_m, nu=new_v),
        )

    return optax.GradientTransformation(init_fn, update_fn)


def fused_apply(
    tx_args: tuple,
    grads: Any,
    state: MupAdamWState,
    params: Any,
):
    """One-pass muP-AdamW: returns (new_params, new_state) directly, never
    materializing an update tree. Per leaf XLA fuses read(g, m, v, p) →
    write(m, v, p) into a single loop — the TPU analog of the reference's
    fused-CUDA AdamW (`train.py:340-344`). Numerically identical to
    `mup_adamw`'s update + optax.apply_updates (same op order); equality is
    asserted in tests/test_train_step.py.
    """
    lr_tree, wd_tree, schedule_fn, b1, b2, eps = tx_args
    count = state.adam.count + 1
    bc1 = 1.0 - b1 ** count.astype(jnp.float32)
    bc2 = 1.0 - b2 ** count.astype(jnp.float32)
    lr_t = schedule_fn(state.count)
    # Pallas per-leaf AdamW measured net-slower than XLA's own per-leaf
    # fusions on the canonical config (93.4 vs 90.8 ms/step: ~25 serialized
    # pallas dispatches lose to XLA's overlap) — opt-in only.
    use_pallas = os.environ.get("VDS_PALLAS_ADAMW", "0") == "1"

    def leaf(g, m, v, p, lr, wd):
        if use_pallas:
            from video_diffusion_speedrun_tpu.ops.fused_adamw import (
                adamw_leaf_update,
            )

            out = adamw_leaf_update(p, m, v, g, lr, wd, lr_t, bc1,
                                    bc2, b1, b2, eps)
            if out is not None:
                return out
        delta, m2, v2 = adamw_leaf_delta(
            g, m, v, p, lr, wd,
            lr_t=lr_t, bc1=bc1, bc2=bc2, b1=b1, b2=b2, eps=eps)
        return p + delta, m2.astype(m.dtype), v2.astype(v.dtype)

    out = jax.tree.map(leaf, grads, state.adam.mu, state.adam.nu, params,
                       lr_tree, wd_tree)
    new_p, new_m, new_v = unzip_leaf_triples(out, jax.tree.structure(params))
    new_state = MupAdamWState(
        count=state.count + 1,
        adam=optax.ScaleByAdamState(count=count, mu=new_m, nu=new_v),
    )
    return new_p, new_state


def build_optimizer(
    params: Any,
    learning_rate: float,
    max_steps: int,
    cfg: OptimizerConfig | None = None,
):
    """Construct the muP AdamW optimizer + its settings table for a param tree
    (the analog of `get_mup_setup` + scheduler setup, `train.py:335-364`)."""
    cfg = cfg or OptimizerConfig()
    lr_tree, wd_tree, settings = mup_table(
        params, learning_rate, cfg.weight_decay, cfg
    )
    schedule = get_schedule(cfg.scheduler, cfg.warmup_steps, max_steps)
    tx = mup_adamw(lr_tree, wd_tree, schedule, cfg.beta1, cfg.beta2, cfg.eps,
                   moments_dtype=cfg.moments_dtype)
    tx_args = (lr_tree, wd_tree, schedule, cfg.beta1, cfg.beta2, cfg.eps)
    return tx, settings, schedule, tx_args
