"""Cosmos decoder.jit → JAX decoder params: inspection + conversion tool.

The reference's VAE decode path is an opaque TorchScript blob
(`/root/reference/sampling/decoder.py:29`). TorchScript archives still carry
named parameters, so once the public checkpoint is present
(`pretrained_ckpts/Cosmos-Tokenizer-CV4x8x8/decoder.jit` — unavailable in
this zero-egress environment), this tool can:

  inspect  — dump parameter names/shapes (to pin down the exact layer map)
  convert  — map them onto models/cosmos_vae.py's tree and save .npz

Usage:
  python scripts/convert_cosmos.py inspect pretrained_ckpts/.../decoder.jit
  python scripts/convert_cosmos.py convert pretrained_ckpts/.../decoder.jit out.npz
"""

import sys

sys.path.insert(0, ".")


def load_state_dict(jit_path):
    import torch

    module = torch.jit.load(jit_path, map_location="cpu")
    # TorchScript archives may prefix the wrapped module name
    sd = {}
    for k, v in module.state_dict().items():
        for pre in ("_orig_mod.", "module."):
            if k.startswith(pre):
                k = k[len(pre):]
        sd[k] = v
    return sd


def inspect(jit_path, diff=False):
    sd = load_state_dict(jit_path)
    if not diff:
        for k, v in sd.items():
            print(f"{k:70s} {tuple(v.shape)} {v.dtype}")
        print(f"total: {len(sd)} tensors, "
              f"{sum(v.numel() for v in sd.values())/1e6:.1f}M params")
        return
    from video_diffusion_speedrun_tpu.models.cosmos_layer_map import (
        expected_map,
    )

    exp = expected_map()
    want = {e["torch"]: tuple(e["torch_shape"]) for e in exp.values()}
    have = {k: tuple(v.shape) for k, v in sd.items()}
    ok = {k for k in want if have.get(k) == want[k]}
    print(f"matched: {len(ok)}/{len(want)}")
    for k in sorted(set(want) - ok):
        print(f"  expected {k} {want[k]} — checkpoint has "
              f"{have.get(k, '<absent>')}")
    extra = sorted(set(have) - set(want))
    if extra:
        print("checkpoint-only tensors:")
        for k in extra:
            print(f"  {k} {have[k]}")


def convert(jit_path, out_path):
    """Pinned-map conversion: every leaf must match the expected torch name
    AND shape (cosmos_layer_map.expected_map) or the conversion fails with
    an exact diff — no fuzzy candidate search."""
    import numpy as np

    from video_diffusion_speedrun_tpu.models.cosmos_layer_map import (
        expected_map, from_torch,
    )

    sd = {k: v.float().numpy() for k, v in load_state_dict(jit_path).items()}
    exp = expected_map()

    converted, problems = {}, []
    for ours, e in exp.items():
        src = sd.get(e["torch"])
        if src is None:
            problems.append(f"missing in checkpoint: {e['torch']} (for {ours})")
            continue
        if list(src.shape) != e["torch_shape"]:
            problems.append(
                f"shape mismatch {e['torch']}: checkpoint {list(src.shape)} "
                f"vs expected {e['torch_shape']}")
            continue
        converted[ours] = from_torch(src)

    print(f"matched {len(converted)}/{len(exp)} leaves")
    if problems:
        print("CONVERSION FAILED — run `inspect --diff` for the full map:")
        for m in problems[:40]:
            print("  ", m)
        sys.exit(1)
    np.savez(out_path, **converted)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else ""
    if cmd == "inspect":
        inspect(sys.argv[2], diff="--diff" in sys.argv)
    elif cmd == "convert":
        convert(sys.argv[2], sys.argv[3])
    else:
        raise SystemExit(__doc__)
