"""Build a local parquet fixture of Cosmos-shaped rows for offline
end-to-end rehearsal of the real-data path.

Writes rows with the exact column layout of `fal/cosmos-openvid-1m`
(`/root/reference/sharded_dataset.py:8-32`): `serialized_latent` =
torch.save bytes of a bf16 [16, T, 32, 32] latent, `caption` = text. Point
training at it with:

  python scripts/make_data_fixture.py --out /tmp/fixture.parquet --rows 256
  python train.py --dataset cosmos_openvid --hf_name /tmp/fixture.parquet \
      --allow_random_context true ...

The split arithmetic applies the reference formula to the fixture's row
count (half the rows; last 40 of that half = test), so a 256-row fixture
yields 88 train + 40 test rows.
"""

import io
import sys

import click
import numpy as np

sys.path.insert(0, ".")


@click.command()
@click.option("--out", type=str, required=True, help="output .parquet path")
@click.option("--rows", type=int, default=256)
@click.option("--channels", type=int, default=16)
@click.option("--frames", type=str, default="5",
              help="comma-separated latent T values cycled across rows "
                   "(mixed values exercise shape bucketing)")
@click.option("--height", type=int, default=32)
@click.option("--width", type=int, default=32)
@click.option("--seed", type=int, default=0)
def main(out, rows, channels, frames, height, width, seed):
    import torch  # torch.save bytes — the real dataset's wire format

    t_values = [int(t) for t in frames.split(",") if t]
    rng = np.random.default_rng(seed)
    blobs, captions = [], []
    for i in range(rows):
        t = t_values[i % len(t_values)]
        lat = rng.standard_normal((channels, t, height, width))
        buf = io.BytesIO()
        torch.save(torch.from_numpy(lat).to(torch.bfloat16), buf)
        blobs.append(buf.getvalue())
        captions.append(f"fixture clip {i} ({t} latent frames)")

    import datasets as hfds

    table = hfds.Dataset.from_dict(
        {"serialized_latent": blobs, "caption": captions})
    table.to_parquet(out)
    click.echo(f"wrote {rows} rows to {out} (T in {t_values})")


if __name__ == "__main__":
    main()
