"""Precomputed-embedding join: attach offline T5 context to dataset rows.

`scripts/precompute_embeddings.py` encodes a split once and writes
`shard_{row_start:09d}.npz` files (`embeddings` [n, tokens, dim] fp16 +
`row_start`). This wrapper joins those shards back onto latent rows as the
`context` key, keyed by row index — the "precomputed" tier of the trainer's
context priority chain (train/loop.py:_encode_stream), replacing the
reference's per-step on-device encoding (`/root/reference/train.py:77-84`)
with a zero-cost lookup.

Shards load lazily with a small LRU (npz is compressed — a shard
decompresses as a whole), guarded by a lock since the DataLoader's worker
pool calls __getitem__ concurrently.
"""

from __future__ import annotations

import collections
import os
import re
import threading
from typing import Dict, List, Tuple

import numpy as np

_SHARD_RE = re.compile(r"^shard_(\d+)\.npz$")


class PrecomputedEmbeddingJoin:
    """Dataset wrapper: row → base row + `context` from the shard files.

    Row indices are the BASE dataset's indices — precompute and training
    must use the same split so the join key lines up.
    """

    def __init__(self, base, emb_dir: str, cache_shards: int = 2):
        self.base = base
        self.emb_dir = emb_dir
        starts: List[int] = []
        for name in os.listdir(emb_dir):
            m = _SHARD_RE.match(name)
            if m:
                starts.append(int(m.group(1)))
        if not starts:
            raise FileNotFoundError(
                f"no shard_*.npz embedding shards in {emb_dir} — run "
                "scripts/precompute_embeddings.py first"
            )
        self._starts = np.asarray(sorted(starts), np.int64)
        self._cache: "collections.OrderedDict[int, Tuple[int, np.ndarray]]" \
            = collections.OrderedDict()
        self._cache_shards = max(1, cache_shards)
        self._lock = threading.Lock()

    def __len__(self) -> int:
        return len(self.base)

    def _load_shard(self, start: int) -> Tuple[int, np.ndarray]:
        with self._lock:
            if start in self._cache:
                self._cache.move_to_end(start)
                return self._cache[start]
        path = os.path.join(self.emb_dir, f"shard_{start:09d}.npz")
        with np.load(path) as z:
            emb = np.ascontiguousarray(z["embeddings"])
            declared = int(z["row_start"])
        if declared != start:
            raise ValueError(
                f"{path}: row_start metadata {declared} != filename {start}"
            )
        entry = (start, emb)
        with self._lock:
            self._cache[start] = entry
            self._cache.move_to_end(start)
            while len(self._cache) > self._cache_shards:
                self._cache.popitem(last=False)
        return entry

    def _lookup(self, idx: int) -> np.ndarray:
        pos = int(np.searchsorted(self._starts, idx, side="right")) - 1
        if pos < 0:
            raise KeyError(
                f"row {idx} precedes the first embedding shard "
                f"(starts at {int(self._starts[0])})"
            )
        start, emb = self._load_shard(int(self._starts[pos]))
        off = idx - start
        if off >= emb.shape[0]:
            raise KeyError(
                f"row {idx} not covered: shard_{start:09d}.npz holds rows "
                f"[{start}, {start + emb.shape[0]}) and the next shard "
                "starts later — re-run the precompute for the gap"
            )
        return emb[off]

    def __getitem__(self, idx: int) -> Dict:
        row = self.base[int(idx)]
        row["context"] = self._lookup(int(idx)).astype(np.float32)
        return row

    def latent_shapes(self):
        """Pass through the shape declaration for coordinated bucketing."""
        fn = getattr(self.base, "latent_shapes", None)
        return fn() if fn is not None else None
