"""muP lr/wd table tests — the rules of `/root/reference/model.py:404-465`
verified leaf by leaf against hand-computed values."""

import jax
import jax.numpy as jnp
import numpy as np

from video_diffusion_speedrun_tpu.core.config import DiTConfig, OptimizerConfig
from video_diffusion_speedrun_tpu.models.dit import init_dit
from video_diffusion_speedrun_tpu.train.mup import mup_table
from video_diffusion_speedrun_tpu.train.optim import build_optimizer
from video_diffusion_speedrun_tpu.train.schedules import get_schedule

CFG = DiTConfig(
    in_channels=4, patch_size=2, time_patch_size=2, hidden_size=64, depth=2,
    num_heads=2, cross_attn_input_size=32, residual_v=True,
    train_bias_and_rms=True,
)

LR = 1.0
WD = 0.1
D = 64


def _table():
    params = init_dit(jax.random.PRNGKey(0), CFG)
    _, _, settings = mup_table(params, LR, WD, OptimizerConfig())
    return settings


class TestMupTable:
    def test_no_decay_rules(self):
        s = _table()
        # bias / norm / lambda → lr×0.01, wd 0 (`model.py:406-407,421-426`)
        for name in ["blocks.qkv.bias", "blocks.norm1.scale",
                     "blocks.lambda_param", "final_norm.scale"]:
            assert s[name]["lr"] == LR * 0.01, name
            assert s[name]["wd"] == 0.0, name

    def test_matrix_rule_uses_fan_in(self):
        s = _table()
        # qkv weight: torch [3D, D] → dim D (fan-in)
        assert np.isclose(s["blocks.qkv.weight"]["lr"], LR * 32 / D)
        assert np.isclose(s["blocks.qkv.weight"]["wd"], WD * D / 1024)
        # mlp fc2: torch [D, 4D] → dim 4D
        assert np.isclose(s["blocks.mlp.fc2.weight"]["lr"], LR * 32 / (4 * D))
        assert np.isclose(s["blocks.mlp.fc2.weight"]["wd"], WD * 4 * D / 1024)
        # attn_proj: fan-in D
        assert np.isclose(s["blocks.attn_proj.weight"]["lr"], LR * 32 / D)

    def test_register_tokens_matrix_rule(self):
        # 3-D param, trailing dim D (`model.py:429-436` applies with shape[-1])
        s = _table()
        assert np.isclose(s["register_tokens"]["lr"], LR * 32 / D)
        assert np.isclose(s["register_tokens"]["wd"], WD * D / 1024)

    def test_constant_classes_override(self):
        s = _table()
        # patch_proj / context_kv → lr×0.01, wd 0 (`train.py:287`, `model.py:439-444`)
        for name in ["patch_proj.weight", "patch_proj.bias",
                     "blocks.context_kv.weight", "blocks.context_kv.bias"]:
            assert s[name]["lr"] == LR * 0.01, name
            assert s[name]["wd"] == 0.0, name

    def test_time_modulation_override_keeps_wd(self):
        s = _table()
        # adaLN weight: matrix wd survives, lr overridden to 0.1 (`model.py:447-450`)
        assert s["blocks.adaLN_modulation.weight"]["lr"] == LR * 0.1
        assert np.isclose(s["blocks.adaLN_modulation.weight"]["wd"], WD * D / 1024)
        # adaLN bias: no-decay first (wd 0), then lr override 0.1
        assert s["blocks.adaLN_modulation.bias"]["lr"] == LR * 0.1
        assert s["blocks.adaLN_modulation.bias"]["wd"] == 0.0
        # time_embed fc1 weight: matrix rule dim=D then time override
        assert s["time_embed.fc1.weight"]["lr"] == LR * 0.1
        assert np.isclose(s["time_embed.fc1.weight"]["wd"], WD * D / 1024)
        # time_embed fc2 weight: dim=4D
        assert np.isclose(s["time_embed.fc2.weight"]["wd"], WD * 4 * D / 1024)
        assert s["time_embed.fc2.weight"]["lr"] == LR * 0.1
        assert s["final_modulation.weight"]["lr"] == LR * 0.1

    def test_final_proj_matrix_rule(self):
        s = _table()
        assert np.isclose(s["final_proj.weight"]["lr"], LR * 32 / D)
        assert np.isclose(s["final_proj.weight"]["wd"], WD * D / 1024)

    def test_positional_embedding_constant(self):
        cfg = CFG.replace(use_rope=False)
        params = init_dit(jax.random.PRNGKey(0), cfg)
        _, _, s = mup_table(params, LR, WD, OptimizerConfig())
        assert s["positional_embedding"]["lr"] == LR * 0.01
        assert s["positional_embedding"]["wd"] == 0.0


class TestSchedules:
    def test_linear(self):
        sched = get_schedule("linear", 20, 120)
        assert float(sched(0)) == 0.0
        assert np.isclose(float(sched(10)), 0.5)
        assert np.isclose(float(sched(20)), 1.0)
        assert np.isclose(float(sched(70)), 0.5)
        assert float(sched(120)) == 0.0

    def test_cosine(self):
        sched = get_schedule("cosine", 20, 120)
        assert np.isclose(float(sched(10)), 0.5)
        assert np.isclose(float(sched(20)), 1.0)
        assert np.isclose(float(sched(70)), 0.5, atol=1e-6)
        assert np.isclose(float(sched(120)), 0.0, atol=1e-6)

    def test_constant_is_effectively_flat(self):
        sched = get_schedule("constant", 20, 1000)
        assert np.isclose(float(sched(100)), 1.0, atol=1e-5)
        assert np.isclose(float(sched(10000)), 1.0, atol=1e-4)


class TestOptimizerMatchesTorchAdamW:
    def test_single_param_parity(self):
        """Our fused update == torch.optim.AdamW on one tensor, same
        betas/eps/lr/wd (`train.py:340-344` semantics)."""
        import pytest
        torch = pytest.importorskip("torch")

        rng = np.random.RandomState(0)
        w0 = rng.randn(8, 8).astype(np.float32)
        grads = [rng.randn(8, 8).astype(np.float32) for _ in range(5)]
        lr, wd = 0.01, 0.1

        wt = torch.nn.Parameter(torch.tensor(w0.copy()))
        opt = torch.optim.AdamW([wt], lr=lr, betas=(0.95, 0.99), eps=1e-8,
                                weight_decay=wd)
        for g in grads:
            opt.zero_grad()
            wt.grad = torch.tensor(g)
            opt.step()

        from video_diffusion_speedrun_tpu.train.optim import mup_adamw
        params = {"w": jnp.array(w0)}
        tx = mup_adamw({"w": lr}, {"w": wd}, lambda step: 1.0,
                       b1=0.95, b2=0.99, eps=1e-8)
        state = tx.init(params)
        for g in grads:
            updates, state = tx.update({"w": jnp.array(g)}, state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)

        np.testing.assert_allclose(
            np.asarray(params["w"]), wt.detach().numpy(), atol=1e-5
        )
