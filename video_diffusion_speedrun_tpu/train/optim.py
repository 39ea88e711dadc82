"""muP AdamW as a single fused optax transformation.

TPU-native equivalent of the reference's fused-CUDA AdamW over muP param
groups (`/root/reference/train.py:335-344`): instead of materializing
(lr, wd)-keyed groups, per-leaf lr/wd pytrees are folded into one XLA-fused
update — torch semantics `p ← p − lr_t·(adam_dir + wd·p)` with bias-corrected
Adam (betas (0.95, 0.99) `train.py:342`), scheduler multiplier applied per
step like torch LambdaLR.
"""

from __future__ import annotations

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


def mup_adamw(
    lr_tree: Any,
    wd_tree: Any,
    schedule_fn: Callable,
    b1: float = 0.95,
    b2: float = 0.99,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    adam = optax.scale_by_adam(b1=b1, b2=b2, eps=eps)

    def init_fn(params):
        return MupAdamWState(count=jnp.zeros((), jnp.int32), adam=adam.init(params))

    def update_fn(grads, state, params):
        adam_dir, adam_state = adam.update(grads, state.adam, params)
        lr_t = schedule_fn(state.count)
        updates = jax.tree.map(
            lambda u, p, lr, wd: (-(lr * lr_t) * (u + wd * p)).astype(p.dtype),
            adam_dir, params, lr_tree, wd_tree,
        )
        return updates, MupAdamWState(count=state.count + 1, adam=adam_state)

    return optax.GradientTransformation(init_fn, update_fn)


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
    tx = mup_adamw(lr_tree, wd_tree, schedule, cfg.beta1, cfg.beta2, cfg.eps)
    return tx, settings, schedule
