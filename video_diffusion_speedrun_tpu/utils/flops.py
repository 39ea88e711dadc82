"""Model-FLOP accounting for throughput / MFU reporting.

The reference only logs wall-clock step times (`/root/reference/
train.py:441-451`); MFU needs a FLOP model. Counts are *useful* model FLOPs
(fwd = below, train ≈ 3× fwd); remat recompute is treated as overhead, so the
reported MFU is conservative.
"""

from __future__ import annotations

from video_diffusion_speedrun_tpu.core.config import DiTConfig

# bf16 peak TFLOP/s per chip
PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5e": 197e12,
    "TPU v5": 459e12,       # v5p
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,  # v6e (Trillium)
    "TPU v6e": 918e12,
}


def peak_flops_for(device_kind: str) -> float:
    for key, val in sorted(PEAK_FLOPS.items(), key=lambda kv: -len(kv[0])):
        if device_kind.startswith(key):
            return val
    return 197e12  # default to v5e


def dit_forward_flops(cfg: DiTConfig, batch: int, t: int, h: int, w: int,
                      context_len: int = 512) -> float:
    """FLOPs of one DiT forward at latent shape [batch, C, t, h, w]."""
    d = cfg.hidden_size
    l = (t // cfg.time_patch_size) * (h // cfg.patch_size) * (w // cfg.patch_size)
    l_tot = l + cfg.num_registers
    lc = context_len

    patch = 2 * l * cfg.patch_dim * d
    per_block = (
        2 * l_tot * d * 3 * d          # qkv
        + 4 * l_tot * l_tot * d        # self-attn: QK^T + PV
        + 2 * l_tot * d * d            # attn proj
        + 4 * l_tot * d * cfg.mlp_hidden  # mlp (fc1 + fc2)
        + 2 * d * 9 * d                # adaLN (per sample)
    )
    if cfg.cross_attn_input_size is not None:  # gated like the model
        per_block += (
            2 * l_tot * d * d          # q_cross
            + 2 * lc * cfg.cross_attn_input_size * 2 * d  # context kv
            + 4 * l_tot * lc * d       # cross-attn
            + 2 * l_tot * d * d        # cross proj
        )
    time_embed = 2 * d * 4 * d * 2
    final = 2 * l * d * cfg.out_patch_dim + 2 * d * 2 * d
    return batch * (patch + cfg.depth * per_block + time_embed + final)


def dit_train_flops(cfg: DiTConfig, batch: int, t: int, h: int, w: int,
                    context_len: int = 512) -> float:
    """fwd + bwd ≈ 3× fwd (useful FLOPs; excludes remat recompute)."""
    return 3.0 * dit_forward_flops(cfg, batch, t, h, w, context_len)
