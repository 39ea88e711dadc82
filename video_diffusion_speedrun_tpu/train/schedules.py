"""LR schedule multipliers λ(step), jit-traceable.

Semantics of the transformers schedules the reference uses
(`/root/reference/train.py:349-364`): warmup is a linear ramp over
`warmup_steps` (hardcoded 20 there); "constant" is implemented as linear decay
to a 1e10 horizon, reproducing the reference's quirk (`train.py:359-362`).
The schedule multiplies each muP group's absolute lr.
"""

from __future__ import annotations

import jax.numpy as jnp


def linear_with_warmup(warmup_steps: int, total_steps: int):
    warmup_steps = float(warmup_steps)
    total_steps = float(total_steps)  # may exceed int32 (constant = 1e10 horizon)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        decay = jnp.maximum(
            0.0,
            (total_steps - step) / jnp.maximum(1.0, total_steps - warmup_steps),
        )
        return jnp.where(step < warmup_steps, warm, decay)

    return schedule


def cosine_with_warmup(warmup_steps: int, total_steps: int, num_cycles: float = 0.5):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        progress = (step - warmup_steps) / jnp.maximum(1.0, total_steps - warmup_steps)
        cos = jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * num_cycles * 2.0 * progress))
        )
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def constant_with_warmup(warmup_steps: int):
    # reference "constant" = linear schedule with a 1e10 horizon (`train.py:359-362`)
    return linear_with_warmup(warmup_steps, 10_000_000_000)


def get_schedule(name: str, warmup_steps: int, total_steps: int):
    if name == "linear":
        return linear_with_warmup(warmup_steps, total_steps)
    if name == "cosine":
        return cosine_with_warmup(warmup_steps, total_steps)
    if name == "constant":
        return constant_with_warmup(warmup_steps)
    raise ValueError(f"unknown lr scheduler type: {name}")
