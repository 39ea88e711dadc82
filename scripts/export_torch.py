"""Export a TPU checkpoint to the torch reference's state-dict naming.

The reference can only *save* checkpoints (`/root/reference/train.py:581-584`);
this tool closes the loop the other way: an orbax full-state checkpoint
trained here becomes a reference-named weight file that
`model.load_state_dict` accepts (see tests/test_reference_parity.py::
TestTorchExport for the exact-round-trip guarantee).

Saved as .npz (torch-free — this image deadlocks importing torch after the
TPU client starts); load on the torch side with:

    import numpy as np, torch
    sd = {k: torch.from_numpy(v) for k, v in np.load("out.npz").items()}
    model.load_state_dict(sd, strict=False)  # rope grids are buffers

Usage:
  python scripts/export_torch.py --checkpoint checkpoints/run/100 \
      --out dit.npz --model_width 512 --model_depth 24 --model_head_dim 128
"""

import sys

import click

sys.path.insert(0, ".")


@click.command()
@click.option("--checkpoint", required=True,
              help="orbax checkpoint dir (run dir or specific step dir)")
@click.option("--out", required=True, help="output .npz path")
@click.option("--model_width", type=int, default=512)
@click.option("--model_depth", type=int, default=24)
@click.option("--model_head_dim", type=int, default=128)
@click.option("--cross_attn_input_size", type=int, default=4096)
@click.option("--train_bias_and_rms", type=bool, default=False)
@click.option("--rope_order", type=click.Choice(["matched", "reference"]),
              default="matched",
              help="RoPE table order the checkpoint was TRAINED with")
def main(checkpoint, out, model_width, model_depth, model_head_dim,
         cross_attn_input_size, train_bias_and_rms, rope_order):
    import numpy as np

    from video_diffusion_speedrun_tpu.core.config import (
        DiTConfig, TrainConfig,
    )
    from video_diffusion_speedrun_tpu.models.convert import params_to_torch_dit
    from video_diffusion_speedrun_tpu.train.checkpoint import (
        restore_params_for_inference,
    )

    cfg = DiTConfig(
        in_channels=16, patch_size=2, time_patch_size=2,
        hidden_size=model_width, depth=model_depth,
        num_heads=max(1, model_width // model_head_dim),
        cross_attn_input_size=cross_attn_input_size, residual_v=True,
        train_bias_and_rms=train_bias_and_rms,
    )
    if rope_order == "matched":
        # our training default; the torch reference hardcodes the (t,h,w)
        # "reference" order (`model.py:239-240`) — weights trained under
        # "matched" see a different position→frequency pairing there
        click.echo(
            "WARNING: exporting rope_order='matched' weights. The torch "
            "reference applies its own (t,h,w) RoPE order; matched-order "
            "weights will run with scrambled positions there. Train with "
            "rope_order='reference' if torch-side inference is the goal.",
            err=True,
        )
    params = restore_params_for_inference(checkpoint, TrainConfig(model=cfg))
    sd = params_to_torch_dit(params, cfg)
    np.savez(out, **sd)
    n = sum(v.size for v in sd.values())
    click.echo(f"wrote {out}: {len(sd)} tensors, {n/1e6:.1f}M params")


if __name__ == "__main__":
    main()
