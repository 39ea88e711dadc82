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

from typing import Dict

import numpy as np

from video_diffusion_speedrun_tpu.data.serialization import load_tensor


class LatentDataset:
    """Row interface: __getitem__ → {"latent": np.ndarray[C,T,H,W], "caption": str}."""

    TOTAL_ROWS = 1_979_810
    TEST_ROWS = 40

    def __init__(self, split: str = "train", cache_dir: str = "./cache",
                 hf_name: str = "fal/cosmos-openvid-1m"):
        from datasets import load_dataset  # lazy: heavy import

        half = self.TOTAL_ROWS // 2
        if split == "train":
            rng = range(0, half - self.TEST_ROWS)
        elif split == "test":
            rng = range(half - self.TEST_ROWS, half)
        else:
            raise ValueError(f"unknown split: {split}")
        self.dataset = load_dataset(
            hf_name, split="train", cache_dir=cache_dir
        ).select(rng)

    def __len__(self) -> int:
        return len(self.dataset)

    def __getitem__(self, idx: int) -> Dict:
        item = self.dataset[int(idx)]
        latent = load_tensor(item["serialized_latent"])
        return {"latent": np.asarray(latent), "caption": item["caption"]}
