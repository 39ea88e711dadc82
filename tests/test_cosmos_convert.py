"""Architecture inference from Cosmos state-dict shapes
(scripts/convert_cosmos.py infer — docs/COSMOS_VERIFICATION.md).

The real decoder.jit is unfetchable here; these tests drive the inference
logic on (a) a synthetic state dict built from the pinned expected map
(must reproduce CosmosDecoderConfig exactly) and (b) mutated variants
modelling the documented alternative-architecture hypotheses (wavelet
unpatcher, factorized upsamplers) — each must be detected, not silently
mapped onto our config."""

import importlib.util
import pathlib
import sys

import pytest

_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))

spec = importlib.util.spec_from_file_location(
    "convert_cosmos", _ROOT / "scripts" / "convert_cosmos.py")
convert_cosmos = importlib.util.module_from_spec(spec)
spec.loader.exec_module(convert_cosmos)

from video_diffusion_speedrun_tpu.models.cosmos_layer_map import (  # noqa: E402
    expected_map,
)
from video_diffusion_speedrun_tpu.models.cosmos_vae import (  # noqa: E402
    CosmosDecoderConfig,
)


@pytest.fixture(scope="module")
def synthetic_shapes():
    """Torch-side {name: shape} exactly as our pinned map expects it."""
    return {e["torch"]: tuple(e["torch_shape"])
            for e in expected_map().values()}


def test_infer_reproduces_config(synthetic_shapes):
    cfg = CosmosDecoderConfig()
    found = convert_cosmos.infer_architecture(synthetic_shapes)
    assert found["z_channels"] == cfg.z_channels
    assert found["block_in"] == cfg.block_in
    assert found["conv_out_channels"] == cfg.out_channels
    assert found["wavelet_unpatcher"] is False
    assert found["n_up_levels"] == len(cfg.channels_mult)
    # torch level order: 0 = shallowest; channels follow channels_mult
    assert found["up_level_channels"] == {
        i: cfg.channels * m for i, m in enumerate(cfg.channels_mult)}
    assert all(n == cfg.num_res_blocks + 1
               for n in found["res_blocks_per_level"].values())
    assert found["mid_attention"] == ["attn_1.0", "attn_1.1"]
    assert found["resblock_kernel"] == (3, 3, 3)
    # our map: every non-top level has a single full-3D upsample conv
    single = [v for v in found["upsamplers"].values() if v.startswith("single")]
    assert len(single) >= 2 and all("(3, 3, 3)" in s for s in single)


def test_infer_detects_wavelet_unpatcher(synthetic_shapes):
    """conv_out fan-out 24 = 3 RGB × 8 sub-bands (1-level 3D Haar)."""
    shapes = dict(synthetic_shapes)
    o, i, kt, kh, kw = 3, 128 * 2, 3, 3, 3
    shapes["decoder.conv_out.conv3d.weight"] = (24, i, kt, kh, kw)
    found = convert_cosmos.infer_architecture(shapes)
    assert found["wavelet_unpatcher"] is True
    assert found["wavelet_subbands"] == 8


def test_infer_detects_factorized_upsample(synthetic_shapes):
    """CausalHybridUpsample3d-style conv1 (temporal) + conv2 (spatial)."""
    shapes = {k: v for k, v in synthetic_shapes.items()
              if not k.startswith("decoder.up.1.upsample.")}
    c = 128 * 4
    shapes["decoder.up.1.upsample.conv1.conv3d.weight"] = (c, c, 3, 1, 1)
    shapes["decoder.up.1.upsample.conv1.conv3d.bias"] = (c,)
    shapes["decoder.up.1.upsample.conv2.conv3d.weight"] = (c, c, 1, 3, 3)
    shapes["decoder.up.1.upsample.conv2.conv3d.bias"] = (c,)
    found = convert_cosmos.infer_architecture(shapes)
    up1 = found["upsamplers"][1]
    assert up1.startswith("factorized")
    assert "(3, 1, 1)" in up1 and "(1, 3, 3)" in up1


def test_infer_partial_dump(synthetic_shapes):
    """A truncated dump yields partial facts, not a crash."""
    shapes = {k: v for k, v in synthetic_shapes.items()
              if k.startswith("decoder.mid.")}
    found = convert_cosmos.infer_architecture(shapes)
    assert found["z_channels"] is None
    assert found["n_up_levels"] is None
    assert found["mid_attention"] == ["attn_1.0", "attn_1.1"]
