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

import re
import sys

sys.path.insert(0, ".")


def load_state_dict(jit_path):
    import torch

    module = torch.jit.load(jit_path, map_location="cpu")
    return {k: v for k, v in module.state_dict().items()}


def inspect(jit_path):
    sd = load_state_dict(jit_path)
    for k, v in sd.items():
        print(f"{k:70s} {tuple(v.shape)} {v.dtype}")
    print(f"total: {len(sd)} tensors, "
          f"{sum(v.numel() for v in sd.values())/1e6:.1f}M params")


# name normalization: strip common TorchScript prefixes and the reference's
# wrapper module names so the mapping below keys on the architectural path
_STRIP = ("decoder.", "_orig_mod.", "module.")


def _norm(name: str) -> str:
    for s in _STRIP:
        name = name.replace(s, "")
    return name


def convert(jit_path, out_path):
    import numpy as np

    from video_diffusion_speedrun_tpu.models.cosmos_vae import (
        CosmosDecoderConfig, init_cosmos_decoder,
    )
    import jax

    sd = {_norm(k): v.float().numpy() for k, v in load_state_dict(jit_path).items()}
    cfg = CosmosDecoderConfig()
    template = init_cosmos_decoder(jax.random.PRNGKey(0), cfg)

    # flatten our tree with dotted paths
    flat = jax.tree_util.tree_flatten_with_path(template)[0]
    ours = {}
    for path, leaf in flat:
        keys = [str(getattr(k, "key", getattr(k, "idx", k))) for k in path]
        ours[".".join(keys)] = leaf

    # candidate source name for each of our leaves (best-effort; refine once
    # `inspect` output is known)
    def candidates(name):
        base = (name
                .replace(".w", ".weight").replace(".b", ".bias")
                .replace("scale", "weight"))
        yield base
        yield re.sub(r"up\.(\d+)\.blocks\.(\d+)", r"up.\1.block.\2", base)
        yield re.sub(r"up\.(\d+)\.upsample", r"up.\1.upsample.conv", base)
        yield base.replace("mid.attn_spatial", "mid.attn_1")
        yield base.replace("mid.attn_temporal", "mid.attn_1_temporal")

    converted, missing = {}, []
    for name, leaf in ours.items():
        found = None
        for cand in candidates(name):
            if cand in sd:
                found = sd[cand]
                break
        if found is None:
            missing.append(name)
            continue
        arr = found
        if arr.ndim == 5:  # torch conv3d [O, I, kt, kh, kw] → [kt, kh, kw, I, O]
            arr = arr.transpose(2, 3, 4, 1, 0)
        if arr.shape != leaf.shape:
            missing.append(f"{name} (shape {arr.shape} vs {leaf.shape})")
            continue
        converted[name] = arr

    print(f"matched {len(converted)}/{len(ours)} leaves")
    if missing:
        print("UNMATCHED (fix the candidates() mapping using `inspect`):")
        for m in missing[:40]:
            print("  ", m)
        sys.exit(1)
    np.savez(out_path, **converted)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "inspect":
        inspect(sys.argv[2])
    elif cmd == "convert":
        convert(sys.argv[2], sys.argv[3])
    else:
        raise SystemExit(__doc__)
