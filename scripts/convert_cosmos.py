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


def infer_architecture(shapes):
    """Derive the decoder architecture implied by a real state dict's
    {name: shape} map (docs/COSMOS_VERIFICATION.md): level count,
    per-level channels, res blocks per level, conv kernel factorization,
    attention placement, and wavelet-unpatcher presence (conv_out fan-out
    ≠ 3 ⟹ sub-band channels for an inverse wavelet). Pure shape logic —
    works on any {str: tuple} so tests can feed synthetic dicts.

    Returns a dict of findings; every value is None when the relevant
    tensors are absent (so a partial dump still yields partial facts)."""
    # tolerate either bare names or a uniform "decoder." prefix
    if shapes and all(k.startswith("decoder.") for k in shapes):
        shapes = {k[len("decoder."):]: tuple(v) for k, v in shapes.items()}
    else:
        shapes = {k: tuple(v) for k, v in shapes.items()}

    out = {}

    def conv_w(name):
        s = shapes.get(name + ".conv3d.weight") or shapes.get(name + ".weight")
        return s  # torch layout [O, I, kt, kh, kw]

    ci = conv_w("conv_in")
    out["z_channels"] = ci[1] if ci else None
    out["block_in"] = ci[0] if ci else None

    co = conv_w("conv_out")
    out["conv_out_channels"] = co[0] if co else None
    out["wavelet_unpatcher"] = (co[0] != 3) if co else None
    if co and co[0] != 3 and co[0] % 3 == 0:
        out["wavelet_subbands"] = co[0] // 3  # 8 = 1-level 3D Haar, 64 = 2

    # up levels: up.<i>.block.<j> (public) or up.<i>.blocks.<j> (ours)
    import re

    levels = {}
    for k in shapes:
        m = re.match(r"up\.(\d+)\.blocks?\.(\d+)\.conv1\.", k)
        if m:
            lv, bi = int(m.group(1)), int(m.group(2))
            levels.setdefault(lv, set()).add(bi)
    out["n_up_levels"] = len(levels) if levels else None
    out["res_blocks_per_level"] = (
        {lv: max(b) + 1 for lv, b in sorted(levels.items())} or None)
    # per-level output channels from each level's first res conv1
    ch = {}
    for lv in levels:
        for pre in (f"up.{lv}.block.0.conv1", f"up.{lv}.blocks.0.conv1"):
            w = conv_w(pre)
            if w:
                ch[lv] = w[0]
    out["up_level_channels"] = ch or None

    # upsampler form: one conv (full 3D) vs conv1/conv2[/conv3] (factorized
    # temporal+spatial of the hybrid upsample)
    ups = {}
    for lv in levels:
        sub = {k for k in shapes if k.startswith(f"up.{lv}.upsample.")}
        if not sub:
            ups[lv] = "none"
            continue
        convs = sorted({re.match(rf"up\.{lv}\.upsample\.(conv\d*)\.", k).group(1)
                        for k in sub
                        if re.match(rf"up\.{lv}\.upsample\.(conv\d*)\.", k)})
        if convs == ["conv"] or len(convs) == 1:
            w = conv_w(f"up.{lv}.upsample.{convs[0]}")
            ups[lv] = f"single {tuple(w[2:])}" if w else "single"
        else:
            kerns = []
            for c in convs:
                w = conv_w(f"up.{lv}.upsample.{c}")
                kerns.append(tuple(w[2:]) if w else "?")
            ups[lv] = f"factorized {kerns}"
    out["upsamplers"] = ups or None

    # bottleneck attention: attn_1 alone (spatial only) vs attn_1.0/attn_1.1
    # (Sequential(spatial, temporal)) vs separate names
    attn = sorted({k.split(".")[1] for k in shapes
                   if k.startswith("mid.attn")})
    seq = sorted({".".join(k.split(".")[1:3]) for k in shapes
                  if re.match(r"mid\.attn_1\.\d+\.", k)})
    out["mid_attention"] = seq or attn or None

    # kernel factorization in res blocks: conv1 kernel of mid.block_1
    for pre in ("mid.block_1.conv1",):
        w = conv_w(pre)
        out["resblock_kernel"] = tuple(w[2:]) if w else None
    return out


def _print_inferred(found):
    from video_diffusion_speedrun_tpu.models.cosmos_vae import (
        CosmosDecoderConfig,
    )

    cfg = CosmosDecoderConfig()
    ours = {
        "z_channels": cfg.z_channels,
        "block_in": cfg.block_in,
        "conv_out_channels": cfg.out_channels,
        "wavelet_unpatcher": False,
        "n_up_levels": len(cfg.channels_mult),
        "res_blocks_per_level": {
            i: cfg.num_res_blocks + 1 for i in range(len(cfg.channels_mult))},
        "up_level_channels": {
            # torch up-level order: 0 = shallowest
            i: cfg.channels * m for i, m in enumerate(cfg.channels_mult)},
        "upsamplers": "single (3, 3, 3) per non-top level",
        "mid_attention": ["attn_1.0 (spatial)", "attn_1.1 (temporal)"],
        "resblock_kernel": (3, 3, 3),
    }
    print(f"{'field':24s} {'checkpoint':34s} ours")
    for k, v in found.items():
        mark = "" if str(v) == str(ours.get(k)) else "   <-- DIFFERS"
        print(f"{k:24s} {str(v):34s} {ours.get(k)}{mark}")
    print("(norm num_groups and a final tanh are not shape-inferable — "
          "arbitrate by output parity; docs/COSMOS_VERIFICATION.md #3/#8)")


def infer(path):
    """`infer <decoder.jit|dump.npz>`: print the architecture implied by a
    real state dict next to CosmosDecoderConfig."""
    if path.endswith(".npz"):
        import numpy as np

        shapes = {k: v.shape for k, v in np.load(path).items()}
    else:
        shapes = {k: tuple(v.shape)
                  for k, v in load_state_dict(path).items()}
    _print_inferred(infer_architecture(shapes))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else ""
    if cmd == "inspect":
        inspect(sys.argv[2], diff="--diff" in sys.argv)
    elif cmd == "convert":
        convert(sys.argv[2], sys.argv[3])
    elif cmd == "infer":
        infer(sys.argv[2])
    else:
        raise SystemExit(__doc__)
