"""Precomputed-embedding join: attach offline T5 context to dataset rows.

`scripts/precompute_embeddings.py` encodes a split once and writes raw
`shard_{row_start:09d}.npy` files ([n, tokens, dim] fp16) plus a
`manifest.json` declaring the split and the shard coverage. This wrapper
joins those shards back onto latent rows as the `context` key, keyed by row
index — the "precomputed" tier of the trainer's context priority chain
(train/loop.py:_encode_stream), replacing the reference's per-step
on-device encoding (`/root/reference/train.py:77-84`) with a lookup.

Shards are raw .npy so lookups are `np.load(mmap_mode="r")` slices: a row
read touches only that row's pages (the OS page cache is the real cache —
shuffled access across hundreds of shards stays cheap), unlike the earlier
compressed-.npz format whose every miss decompressed a whole shard. The
manifest's `split` field is validated against the training split, so a
flat embeddings dir can never silently join one split's embeddings onto
the other split's rows.
"""

from __future__ import annotations

import collections
import json
import os
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

MANIFEST_NAME = "manifest.json"
MANIFEST_FORMAT = 1


def write_manifest(
    emb_dir: str,
    split: str,
    return_index: int,
    new_shards: Dict[int, int],
) -> dict:
    """Create or merge the embeddings manifest (atomic replace).

    `new_shards` maps row_start → rows. An existing manifest must agree on
    split and return_index (resumed / multi-range precompute runs append
    their shards to it).
    """
    path = os.path.join(emb_dir, MANIFEST_NAME)
    manifest = {
        "format": MANIFEST_FORMAT,
        "split": split,
        "return_index": return_index,
        "shards": {},
    }
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
        for key in ("split", "return_index"):
            if existing.get(key) != manifest[key]:
                raise ValueError(
                    f"{path}: existing manifest has {key}="
                    f"{existing.get(key)!r}, refusing to mix with "
                    f"{manifest[key]!r} — use a fresh --out dir"
                )
        manifest["shards"] = dict(existing.get("shards", {}))
    for start, rows in new_shards.items():
        manifest["shards"][str(int(start))] = int(rows)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, path)
    return manifest


class PrecomputedEmbeddingJoin:
    """Dataset wrapper: row → base row + `context` from the shard files.

    Row indices are the BASE dataset's indices — precompute and training
    must use the same split for the join key to line up, which is why
    `expected_split` is checked against the manifest rather than trusted.
    """

    def __init__(self, base, emb_dir: str, expected_split: Optional[str] = None,
                 cache_shards: int = 8):
        self.base = base
        self.emb_dir = emb_dir
        manifest_path = os.path.join(emb_dir, MANIFEST_NAME)
        if not os.path.exists(manifest_path):
            legacy = [n for n in os.listdir(emb_dir) if n.endswith(".npz")] \
                if os.path.isdir(emb_dir) else []
            hint = (
                " (found legacy compressed .npz shards — re-run "
                "scripts/precompute_embeddings.py, which now writes raw "
                ".npy shards + manifest.json)" if legacy else ""
            )
            raise FileNotFoundError(
                f"no {MANIFEST_NAME} with shard_*.npy embedding shards in "
                f"{emb_dir} — run scripts/precompute_embeddings.py first"
                + hint
            )
        with open(manifest_path) as f:
            manifest = json.load(f)
        if manifest.get("format") != MANIFEST_FORMAT:
            raise ValueError(
                f"{manifest_path}: unsupported format "
                f"{manifest.get('format')!r} (expected {MANIFEST_FORMAT})"
            )
        if expected_split is not None \
                and manifest.get("split") != expected_split:
            raise ValueError(
                f"{manifest_path} was precomputed for split="
                f"{manifest.get('split')!r} but this loader serves split="
                f"{expected_split!r} — row indices would join the wrong "
                "captions' embeddings. Precompute each split into its own "
                f"subdir (<embeddings_dir>/{expected_split})."
            )
        self.split = manifest.get("split")
        shards = {int(k): int(v) for k, v in manifest["shards"].items()}
        if not shards:
            raise FileNotFoundError(
                f"{manifest_path} lists no shards — the precompute wrote "
                "nothing"
            )
        starts: List[int] = sorted(shards)
        self._starts = np.asarray(starts, np.int64)
        self._rows = np.asarray([shards[s] for s in starts], np.int64)
        # LRU of open memory-maps: bounds file descriptors, not memory —
        # row reads go through the OS page cache either way.
        self._cache: "collections.OrderedDict[int, np.ndarray]" \
            = collections.OrderedDict()
        self._cache_shards = max(1, cache_shards)
        self._lock = threading.Lock()

    def __len__(self) -> int:
        return len(self.base)

    def _load_shard(self, start: int, rows: int) -> np.ndarray:
        with self._lock:
            if start in self._cache:
                self._cache.move_to_end(start)
                return self._cache[start]
        path = os.path.join(self.emb_dir, f"shard_{start:09d}.npy")
        emb = np.load(path, mmap_mode="r")
        if emb.shape[0] != rows:
            raise ValueError(
                f"{path}: holds {emb.shape[0]} rows but the manifest "
                f"declares {rows}"
            )
        with self._lock:
            self._cache[start] = emb
            self._cache.move_to_end(start)
            while len(self._cache) > self._cache_shards:
                self._cache.popitem(last=False)
        return emb

    def _lookup(self, idx: int) -> np.ndarray:
        pos = int(np.searchsorted(self._starts, idx, side="right")) - 1
        if pos < 0:
            raise KeyError(
                f"row {idx} precedes the first embedding shard "
                f"(starts at {int(self._starts[0])})"
            )
        start = int(self._starts[pos])
        rows = int(self._rows[pos])
        if idx - start >= rows:
            raise KeyError(
                f"row {idx} not covered: shard_{start:09d}.npy holds rows "
                f"[{start}, {start + rows}) and the next shard starts "
                "later — re-run the precompute for the gap"
            )
        emb = self._load_shard(start, rows)
        # one copy: fp16 mmap row → fp32 batch array (detaches from the
        # mmap so batches never pin shard pages)
        return np.asarray(emb[idx - start], dtype=np.float32)

    def __getitem__(self, idx: int) -> Dict:
        row = self.base[int(idx)]
        row["context"] = self._lookup(int(idx))
        return row

    def latent_shapes(self):
        """Pass through the shape declaration for coordinated bucketing."""
        fn = getattr(self.base, "latent_shapes", None)
        return fn() if fn is not None else None
