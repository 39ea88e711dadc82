"""Offline T5 embedding precompute.

The reference re-encodes every caption on-device every step
(`/root/reference/train.py:77-84`) — a major step-time sink it never avoids.
This tool encodes a dataset split once and writes raw .npy shards plus a
manifest.json (split + coverage) the training loader mmap-joins as a
precomputed `context` key (data/embeddings.py).

  python scripts/precompute_embeddings.py --split train --return_index -8 \
      --out embeddings/train
"""

import os
import sys

import click
import numpy as np

sys.path.insert(0, ".")


@click.command()
@click.option("--split", type=click.Choice(["train", "test"]), default="test")
@click.option("--return_index", type=int, default=-8)
@click.option("--batch_size", type=int, default=64)
@click.option("--rows_per_shard", type=int, default=8192)
@click.option("--start", type=int, default=0)
@click.option("--limit", type=int, default=None)
@click.option("--out", type=str, required=True)
@click.option("--cache_dir", type=str, default="./cache")
@click.option("--hf_name", type=str, default="fal/cosmos-openvid-1m",
              help="HF dataset name, or a local parquet fixture "
                   "(scripts/make_data_fixture.py)")
@click.option("--smoke_encoder", is_flag=True,
              help="tiny RANDOM-INIT T5 + byte-fallback tokenizer — "
                   "exercises the full precompute→manifest→train pipeline "
                   "without FLUX weights; embeddings are garbage")
def main(split, return_index, batch_size, rows_per_shard, start, limit, out,
         cache_dir, hf_name, smoke_encoder):
    from video_diffusion_speedrun_tpu.data.dataset import LatentDataset
    from video_diffusion_speedrun_tpu.data.embeddings import write_manifest
    from video_diffusion_speedrun_tpu.text.encoder import (
        load_encoder, precompute_embeddings,
    )

    ds = LatentDataset(split=split, cache_dir=cache_dir, hf_name=hf_name)
    if smoke_encoder:
        from video_diffusion_speedrun_tpu.text.t5 import T5Config

        tiny = T5Config(d_model=64, d_kv=16, d_ff=128, num_layers=2,
                        num_heads=4)
        encoder = load_encoder(cfg=tiny, allow_random_init=True)
    else:
        encoder = load_encoder()
    os.makedirs(out, exist_ok=True)

    end = len(ds) if limit is None else min(len(ds), start + limit)
    for shard_lo in range(start, end, rows_per_shard):
        shard_hi = min(shard_lo + rows_per_shard, end)
        captions = [ds[i]["caption"] for i in range(shard_lo, shard_hi)]
        emb = precompute_embeddings(encoder, captions,
                                    return_index=return_index,
                                    batch_size=batch_size)
        path = os.path.join(out, f"shard_{shard_lo:09d}.npy")
        np.save(path, emb.astype(np.float16))
        # manifest updated per shard so an interrupted run stays loadable
        write_manifest(out, split, return_index,
                       {shard_lo: shard_hi - shard_lo})
        click.echo(f"wrote {path} [{shard_lo}, {shard_hi})")


if __name__ == "__main__":
    main()
