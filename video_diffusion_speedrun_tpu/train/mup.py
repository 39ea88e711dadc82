"""muP per-parameter learning-rate / weight-decay table.

Reproduces the reference's `DiT.get_mup_setup` rules
(`/root/reference/model.py:404-465` + constant classes `train.py:287`, base
weight decay 0.1 `train.py:337`) over our parameter pytree. Rule order matters
and is preserved exactly:

1. name contains any of {"bias", "norm", "lambda"} → lr×0.01, wd=0
   (`model.py:406-407,421-426`)
2. otherwise (matrix rule): lr×(32/dim), wd×(dim/1024) where `dim` is the
   torch-layout trailing dimension (`model.py:429-436`). torch Linear weights
   are [out, in] so `dim` is the **fan-in**; our kernels are stored [in, out],
   hence dim = shape[-2] for weight leaves and shape[-1] for everything else.
3. name contains a constant-param class ("patch_proj", "context_kv",
   "positional_embedding") → lr×0.01, wd=0 — overrides 1-2 (`model.py:439-444`)
4. name contains "time" or "modulation" → lr×0.1 — overrides lr only, wd from
   step 2 survives (`model.py:447-450`)

Instead of the reference's (lr, wd)-keyed torch param groups, the table is a
pair of pytrees (absolute lr per leaf, wd per leaf) consumed by a single
fused optax transform — the XLA-jit equivalent of fused-AdamW-with-groups.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax

from video_diffusion_speedrun_tpu.core.config import OptimizerConfig

NO_DECAY_SUBSTRINGS = ("bias", "norm", "lambda")


def _leaf_rule(
    name: str,
    shape: Tuple[int, ...],
    is_weight: bool,
    learning_rate: float,
    weight_decay: float,
    cfg: OptimizerConfig,
) -> Tuple[float, float]:
    """(absolute lr, wd) for one leaf. `is_weight` marks [in, out]-layout
    dense kernels (stacked block leaves [depth, in, out] included — the
    shape[-2] fan-in convention already ignores the leading scan axis)."""
    if any(s in name for s in NO_DECAY_SUBSTRINGS):
        lr = learning_rate * cfg.no_decay_lr_mult
        wd = 0.0
    else:
        if is_weight:
            # torch trailing dim == fan-in == our shape[-2]
            dim = shape[-2]
        else:
            dim = shape[-1]
        lr = learning_rate * (cfg.mup_base_width / dim)
        wd = weight_decay * dim / cfg.mup_wd_width

    if any(c in name for c in cfg.constant_param_classes):
        lr = learning_rate * cfg.no_decay_lr_mult
        wd = 0.0

    if "time" in name or "modulation" in name:
        lr = learning_rate * cfg.time_modulation_lr_mult

    return lr, wd


def mup_table(
    params: Any,
    learning_rate: float,
    weight_decay: float,
    cfg: OptimizerConfig | None = None,
) -> Tuple[Any, Any, Dict[str, Dict]]:
    """Build (lr_tree, wd_tree, settings) for a DiT parameter pytree.

    `settings` mirrors the reference's `final_optimizer_settings`
    (`model.py:457-461`): name → {lr, wd, shape} for logging/tests.
    """
    cfg = cfg or OptimizerConfig()
    settings: Dict[str, Dict] = {}

    def rule_for(path, leaf):
        keys = [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]
        name = ".".join(keys)
        is_weight = keys[-1] == "weight" and leaf.ndim >= 2
        lr, wd = _leaf_rule(
            name, tuple(leaf.shape), is_weight,
            learning_rate, weight_decay, cfg,
        )
        settings[name] = {"lr": lr, "wd": wd, "shape": tuple(leaf.shape)}
        return lr, wd

    pair_tree = jax.tree_util.tree_map_with_path(rule_for, params)
    lr_tree = jax.tree.map(lambda pair: pair[0], pair_tree,
                           is_leaf=lambda x: isinstance(x, tuple))
    wd_tree = jax.tree.map(lambda pair: pair[1], pair_tree,
                           is_leaf=lambda x: isinstance(x, tuple))
    return lr_tree, wd_tree, settings
