"""Dataset pre-download + sanity inspection — the `/root/reference/
download.py` analog. Downloads `fal/cosmos-openvid-1m` into the HF cache and
prints boundary-row shapes/captions through the torch-free deserializer.

  HF_HUB_ENABLE_HF_TRANSFER=1 python download.py --num_proc 32
"""

import sys

import click

sys.path.insert(0, ".")


@click.command()
@click.option("--num_proc", type=int, default=32)
@click.option("--cache_dir", type=str, default="./cache")
@click.option("--hf_name", type=str, default="fal/cosmos-openvid-1m")
def main(num_proc, cache_dir, hf_name):
    from datasets import load_dataset

    from video_diffusion_speedrun_tpu.data.serialization import load_tensor

    ds = load_dataset(hf_name, num_proc=num_proc, cache_dir=cache_dir)
    train = ds["train"]
    click.echo(f"rows: {len(train)}")

    for idx in [0, len(train) // 2 - 1, len(train) - 1]:
        row = train[idx]
        latent = load_tensor(row["serialized_latent"])
        click.echo(f"row {idx}: latent {latent.shape} {latent.dtype} "
                   f"caption: {row['caption'][:80]!r}")


if __name__ == "__main__":
    main()
