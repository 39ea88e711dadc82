"""Cosmos-OpenVid latent dataset.

Reference semantics (`/root/reference/sharded_dataset.py:16-32`): HF
`fal/cosmos-openvid-1m`, first half of 1,979,810 rows; train = rows
[0, 989865-40), test = last 40 rows of that half; each row holds
`serialized_latent` (torch.save bytes) + `caption`.

TPU-first differences: deserialization is torch-free (data/serialization.py)
and rows are fetched through an explicit index so per-host disjoint sharding
is possible (the reference has no DistributedSampler — every rank shuffles
the full split independently, SURVEY.md §Quirks #4).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from video_diffusion_speedrun_tpu.data.serialization import load_tensor


class LatentDataset:
    """Row interface: __getitem__ → {"latent": np.ndarray[C,T,H,W], "caption": str}.

    `hf_name` may also be a local parquet file/directory with the same
    columns (`serialized_latent` bytes + `caption`) — the fixture path for
    offline end-to-end rehearsal (scripts/make_data_fixture.py); the split
    arithmetic then applies the reference formula to the fixture's actual
    row count (half the rows, last TEST_ROWS of that half as test), which
    reduces to the exact reference numbers on the real dataset.
    """

    TOTAL_ROWS = 1_979_810
    TEST_ROWS = 40

    def __init__(self, split: str = "train", cache_dir: str = "./cache",
                 hf_name: str = "fal/cosmos-openvid-1m"):
        from datasets import load_dataset  # lazy: heavy import

        local_fixture = os.path.exists(hf_name)
        if local_fixture:  # local parquet fixture
            if os.path.isdir(hf_name):
                files = sorted(
                    os.path.join(hf_name, f) for f in os.listdir(hf_name)
                    if f.endswith(".parquet")
                )
            else:
                files = [hf_name]
            base = load_dataset("parquet", data_files=files, split="train",
                                cache_dir=cache_dir)
        else:
            base = load_dataset(hf_name, split="train", cache_dir=cache_dir)
        # reference split arithmetic (`sharded_dataset.py:18-19`): MS =
        # 1979810 // 2 — a PINNED constant, not len(dataset); train =
        # [0, MS-40), test = [MS-40, MS). Pinning matters: split-local row
        # indices key checkpoint-comparable eval windows and precomputed-
        # embedding joins, so an upstream row-count drift must fail loudly
        # here rather than silently shift the train/test boundary.
        if not local_fixture:
            if len(base) != self.TOTAL_ROWS:
                raise ValueError(
                    f"{hf_name} has {len(base)} rows but the reference "
                    f"split arithmetic pins {self.TOTAL_ROWS} "
                    "(sharded_dataset.py:18) — the dataset changed "
                    "upstream, or a partial mirror is cached. Refusing to "
                    "shift the train/test boundary silently; point "
                    "hf_name at a local fixture to use dynamic splitting."
                )
        half = (len(base) if local_fixture else self.TOTAL_ROWS) // 2
        test_rows = min(self.TEST_ROWS, half)
        if split == "train":
            rng = range(0, half - test_rows)
        elif split == "test":
            rng = range(half - test_rows, half)
        else:
            raise ValueError(f"unknown split: {split}")
        if len(rng) == 0:
            raise ValueError(
                f"split {split!r} is empty: dataset has {len(base)} rows "
                f"(half={half}, test={test_rows})"
            )
        self.dataset = base.select(rng)

    def __len__(self) -> int:
        return len(self.dataset)

    def __getitem__(self, idx: int) -> Dict:
        item = self.dataset[int(idx)]
        latent = load_tensor(item["serialized_latent"])
        return {"latent": np.asarray(latent), "caption": item["caption"]}
