"""End-to-end numeric parity against the actual torch reference model.

Imports `/root/reference/model.py` (read-only, torch-CPU), builds a small
reference DiT, converts its weights with models/convert.py, and checks our
JAX forward reproduces the torch forward — the fixture-driven parity check
SURVEY.md §4 calls for (upgrade of the CAPTURE_INPUT mechanism,
`train.py:98-101`).
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from video_diffusion_speedrun_tpu.core.config import DiTConfig
from video_diffusion_speedrun_tpu.models.convert import torch_dit_to_params
from video_diffusion_speedrun_tpu.models.dit import dit_forward

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref_model():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE)
    try:
        import model as ref_model_mod
    finally:
        sys.path.remove(REFERENCE)
    return torch, ref_model_mod


def _build(torch, ref_mod, **kw):
    torch.manual_seed(0)
    m = ref_mod.DiT(
        in_channels=4, patch_size=2, time_patch_size=2, hidden_size=64,
        depth=3, num_heads=2, mlp_ratio=4.0, cross_attn_input_size=32,
        **kw,
    ).eval()
    return m


CFG = DiTConfig(
    in_channels=4, patch_size=2, time_patch_size=2, hidden_size=64, depth=3,
    num_heads=2, mlp_ratio=4.0, cross_attn_input_size=32,
    rope_order="reference",  # reproduce the (t,h,w) table-order quirk
    attention_impl="xla", compute_dtype=jnp.float32,
)


def _compare(torch, ref, cfg, atol=2e-4):
    b, c, t, h, w = 2, 4, 4, 8, 8
    gen = torch.Generator().manual_seed(1)
    x = torch.randn(b, c, t, h, w, generator=gen)
    ctx = torch.randn(b, 7, 32, generator=gen)
    ts = torch.tensor([0.3, 0.9])

    # pin the reference's random rope crop offsets to zero
    orig_randint = torch.randint

    def zero_randint(*args, **kwargs):
        return torch.zeros(args[-1] if isinstance(args[-1], tuple) else (1,),
                           dtype=torch.long)

    torch.randint = zero_randint
    try:
        with torch.no_grad():
            want = ref(x, ctx, ts).numpy()
    finally:
        torch.randint = orig_randint

    params = torch_dit_to_params(ref.state_dict(), cfg)
    got = dit_forward(
        params, cfg, jnp.asarray(x.numpy()), jnp.asarray(ctx.numpy()),
        jnp.asarray(ts.numpy()), rope_offsets=jnp.zeros(3, jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=atol, rtol=1e-3)


class TestReferenceParity:
    def test_forward_parity_trainable_rms(self, ref_model):
        torch, ref_mod = ref_model
        ref = _build(torch, ref_mod, residual_v=True, train_bias_and_rms=True)
        _compare(torch, ref, CFG.replace(residual_v=True,
                                         train_bias_and_rms=True))

    def test_forward_parity_demo_flags(self, ref_model):
        """Demo-model flags: residual_v=True, train_bias_and_rms=False
        (`sampling/sample.py:42-53`)."""
        torch, ref_mod = ref_model
        ref = _build(torch, ref_mod, residual_v=True, train_bias_and_rms=False)
        _compare(torch, ref, CFG.replace(residual_v=True,
                                         train_bias_and_rms=False))

    def test_forward_parity_no_residual_v(self, ref_model):
        torch, ref_mod = ref_model
        ref = _build(torch, ref_mod, residual_v=False, train_bias_and_rms=True)
        _compare(torch, ref, CFG.replace(residual_v=False,
                                         train_bias_and_rms=True))

    def test_mup_table_matches_reference(self, ref_model):
        """Our muP lr/wd table == the reference get_mup_setup output,
        name-for-name (`model.py:404-465`)."""
        torch, ref_mod = ref_model
        ref = _build(torch, ref_mod, residual_v=True, train_bias_and_rms=True)
        _, ref_settings = ref.get_mup_setup(
            1.0, 0.1, ["patch_proj", "context_kv", "positional_embedding"]
        )

        from video_diffusion_speedrun_tpu.train.mup import mup_table

        cfg = CFG.replace(residual_v=True, train_bias_and_rms=True)
        params = torch_dit_to_params(ref.state_dict(), cfg)
        _, _, ours = mup_table(params, 1.0, 0.1)

        # map reference names → our names
        def to_ours(name):
            n = (name
                 .replace("patch_embed.patch_proj", "patch_proj")
                 .replace("time_embed.0", "time_embed.fc1")
                 .replace("time_embed.2", "time_embed.fc2")
                 .replace("final_modulation.1", "final_modulation")
                 .replace("adaLN_modulation.1", "adaLN_modulation")
                 .replace("mlp.0", "mlp.fc1")
                 .replace("mlp.2", "mlp.fc2")
                 .replace("norm1.weight", "norm1.scale")
                 .replace("norm2.weight", "norm2.scale")
                 .replace("norm3.weight", "norm3.scale")
                 .replace("final_norm.weight", "final_norm.scale"))
            if n.startswith("blocks."):
                n = "blocks." + n.split(".", 2)[2]  # drop layer index
            return n

        for ref_name, ref_s in ref_settings.items():
            our_name = to_ours(ref_name)
            assert our_name in ours, (ref_name, our_name, sorted(ours))
            assert np.isclose(ours[our_name]["lr"], ref_s["lr"]), (
                ref_name, ours[our_name]["lr"], ref_s["lr"])
            assert np.isclose(ours[our_name]["wd"], ref_s["wd"]), (
                ref_name, ours[our_name]["wd"], ref_s["wd"])


class TestTorchExport:
    def test_export_roundtrip(self):
        """params → reference state dict → params must be exact, and the
        exported names must load into the actual torch reference model."""
        import sys as _sys

        import numpy as np

        from video_diffusion_speedrun_tpu.models.convert import (
            params_to_torch_dit, torch_dit_to_params,
        )
        from video_diffusion_speedrun_tpu.models.dit import init_dit

        cfg = DiTConfig(
            in_channels=4, patch_size=2, time_patch_size=2, hidden_size=64,
            depth=2, num_heads=2, cross_attn_input_size=32, residual_v=True,
            train_bias_and_rms=True, rope_order="reference",
            compute_dtype=jnp.float32,
        )
        params = init_dit(jax.random.PRNGKey(5), cfg, 0.1)
        sd = params_to_torch_dit(params, cfg)
        back = torch_dit_to_params(sd, cfg)
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(back)[0],
        ):
            assert pa == pb
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=str(pa))

        torch = pytest.importorskip("torch")
        _sys.path.insert(0, REFERENCE)
        try:
            import model as ref_mod
        finally:
            _sys.path.remove(REFERENCE)
        model = ref_mod.DiT(
            in_channels=4, patch_size=2, time_patch_size=2, hidden_size=64,
            depth=2, num_heads=2, cross_attn_input_size=32, residual_v=True,
            train_bias_and_rms=True,
        )
        missing, unexpected = model.load_state_dict(
            {k: torch.from_numpy(v.copy()) for k, v in sd.items()},
            strict=False,
        )
        assert not unexpected, unexpected
        # reference buffers (rope cos/sin grids) are not parameters we export
        assert all("rope" in m for m in missing), missing
