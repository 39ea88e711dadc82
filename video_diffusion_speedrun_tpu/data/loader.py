"""Host-side data pipeline: per-host sharded sampling, background workers,
double-buffered device prefetch.

Replaces the reference's torch DataLoader factory (`/root/reference/
utils.py:18-35`) with a TPU-first pipeline:

- `ShardedSampler` gives each host a disjoint, epoch-seeded slice of the
  split — fixing the reference's missing DistributedSampler (every rank
  shuffled the full dataset independently; `utils.py:27-34`).
- `DataLoader` runs a thread pool that decodes rows (torch-free) ahead of
  consumption and collates to numpy (latents stacked to [B, C, T, H, W],
  captions as a list — `utils.py:21-25` semantics).
- `device_prefetch` turns host batches into sharded global `jax.Array`s and
  keeps `depth` batches in flight so the TPU never waits on host→HBM copies.
"""

from __future__ import annotations

import collections
import queue
import sys
import threading
import time
from typing import Any, Callable, Dict, Iterator, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding

from video_diffusion_speedrun_tpu.parallel.mesh import batch_pspec


class ShardedSampler:
    """Deterministic per-host disjoint index stream.

    Epoch e: seeded permutation of the dataset, truncated to a multiple of
    (num_shards × batch), then strided by shard. Every host sees distinct
    rows; the global batch is the union of host slices.
    """

    def __init__(self, num_rows: int, batch_per_shard: int, shard: int,
                 num_shards: int, seed: int = 0, shuffle: bool = True,
                 drop_last: bool = True):
        if not 0 <= shard < num_shards:
            raise ValueError(f"shard {shard} out of range [0, {num_shards})")
        self.num_rows = num_rows
        self.batch = batch_per_shard
        self.shard = shard
        self.num_shards = num_shards
        self.seed = seed
        self.shuffle = shuffle
        step = batch_per_shard * num_shards
        self.rows_per_epoch = (num_rows // step) * step
        if self.rows_per_epoch == 0:
            raise ValueError(
                f"dataset ({num_rows}) smaller than one global batch ({step})"
            )

    def epoch(self, e: int) -> np.ndarray:
        """Indices for this shard in epoch e: [steps, batch_per_shard]."""
        if self.shuffle:
            order = np.random.default_rng(self.seed + e).permutation(self.num_rows)
        else:
            order = np.arange(self.num_rows)
        order = order[: self.rows_per_epoch]
        # contiguous global batches; shard takes its slice of each batch
        batches = order.reshape(-1, self.batch * self.num_shards)
        lo = self.shard * self.batch
        return batches[:, lo: lo + self.batch]


def default_collate(rows: Sequence[Dict]) -> Dict[str, Any]:
    """Stack latents, keep captions as list (`utils.py:21-25`)."""
    out: Dict[str, Any] = {}
    first = rows[0]
    for key, val in first.items():
        if isinstance(val, np.ndarray):
            out[key] = np.stack([r[key] for r in rows])
        else:
            out[key] = [r[key] for r in rows]
    return out


class ShapeBucketingCollate:
    """Collate for variable-length clips (17→121-frame configs).

    The reference collate hard-assumes uniform latent shapes (`utils.py:22` —
    a plain stack that crashes on mixed lengths). Here rows are bucketed by
    latent shape; each call emits one full batch from the largest-ready
    bucket and carries the remainder — batches stay shape-uniform, so jit
    specializes per bucket instead of failing."""

    def __init__(self, batch_size: int):
        self.batch_size = batch_size
        self._buckets: Dict[tuple, list] = {}

    def __call__(self, rows: Sequence[Dict]) -> Optional[Dict[str, Any]]:
        for r in rows:
            self._buckets.setdefault(tuple(r["latent"].shape), []).append(r)
        ready = [k for k, v in self._buckets.items()
                 if len(v) >= self.batch_size]
        if not ready:
            return None
        key = max(ready, key=lambda k: len(self._buckets[k]))
        batch_rows = self._buckets[key][: self.batch_size]
        self._buckets[key] = self._buckets[key][self.batch_size:]
        return default_collate(batch_rows)


class CoordinatedShapeBucketingCollate:
    """Multi-host-safe bucketing: all hosts follow the same seeded shape
    schedule, so every host emits a batch of the SAME latent shape at every
    global step — the SPMD requirement the per-host opportunistic
    `ShapeBucketingCollate` cannot give (hosts would pick different buckets
    and desync the compiled program).

    The schedule draws shape s_t ~ probs from a shared `seed`; each host
    buffers incoming rows per shape and emits only when the scheduled
    shape's bucket is full, then advances the schedule. With row shapes
    i.i.d. across hosts (the sampler hands each host a random disjoint
    slice), buffering stays O(batch · num_shapes) in expectation.

    Finite-stream caveat: at the very end of a bounded epoch stream, hosts
    may be able to fill different numbers of scheduled batches (random
    shape composition of the tail) — bound multi-host runs by `max_steps`
    (the reference always does, `run_debug.sh:12-25`) rather than by
    epoch exhaustion."""

    def __init__(self, batch_size: int, shapes, seed: int = 0, probs=None):
        self.batch_size = batch_size
        # `shapes` may repeat (datasets declare multiplicity); the schedule
        # must match the arrival distribution or starved buckets grow
        # without bound. Caller-supplied probs pair with the CALLER's shape
        # order and aggregate per distinct shape.
        raw = [tuple(s) for s in shapes]
        if probs is None:
            probs = [1.0] * len(raw)
        if len(probs) != len(raw):
            raise ValueError(
                f"probs ({len(probs)}) must pair 1:1 with shapes ({len(raw)})"
            )
        weight: Dict[tuple, float] = {}
        for shp, pr in zip(raw, probs):
            weight[shp] = weight.get(shp, 0.0) + float(pr)
        self.shapes = sorted(weight)
        self.probs = np.asarray([weight[s] for s in self.shapes], np.float64)
        self.probs /= self.probs.sum()
        self._rng = np.random.default_rng(seed)  # identical on every host
        self._target = None
        self._buckets: Dict[tuple, list] = {}

    def _draw(self):
        return self.shapes[int(self._rng.choice(len(self.shapes),
                                                p=self.probs))]

    def __call__(self, rows: Sequence[Dict]) -> Optional[Dict[str, Any]]:
        for r in rows:
            shape = tuple(r["latent"].shape)
            if shape not in self._buckets:
                if shape not in self.shapes:
                    raise ValueError(
                        f"row shape {shape} not in the declared shape set "
                        f"{self.shapes} — the coordinated schedule cannot "
                        "include it"
                    )
                self._buckets[shape] = []
            self._buckets[shape].append(r)
        if self._target is None:
            self._target = self._draw()
        bucket = self._buckets.get(self._target, [])
        if len(bucket) < self.batch_size:
            return None
        batch_rows = bucket[: self.batch_size]
        self._buckets[self._target] = bucket[self.batch_size:]
        self._target = self._draw()
        return default_collate(batch_rows)


class _Fault:
    """Producer-thread exception carrier: re-raised on the consumer side so
    a genuine dataset/collate/device-put error fails the training loop
    instead of silently ending the stream as a clean epoch boundary."""

    __slots__ = ("exc",)

    def __init__(self, exc: BaseException):
        self.exc = exc


class DataLoader:
    """Threaded look-ahead loader over (dataset, sampler)."""

    def __init__(self, dataset, sampler: ShardedSampler,
                 collate: Callable = default_collate, num_workers: int = 4,
                 prefetch: int = 2, num_epochs: Optional[int] = None,
                 skip_batches: int = 0):
        self.dataset = dataset
        self.sampler = sampler
        self.collate = collate
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.num_epochs = num_epochs
        # resume fast-forward: emit the stream a continuous run would emit
        # from batch `skip_batches` on (the reference cannot — its resume
        # restarts the data order, SURVEY.md quirk #8). With the stateless
        # default collate (1 sampler batch -> 1 emitted batch) the skipped
        # prefix costs NO dataset reads; stateful collates (shape
        # bucketing) load-and-discard, which is always exact.
        self.skip_batches = skip_batches

    def _epochs(self) -> Iterator[int]:
        e = 0
        while self.num_epochs is None or e < self.num_epochs:
            yield e
            e += 1

    _END = object()  # end sentinel (collate may legitimately return None
    # to mean "no full bucket yet", see ShapeBucketingCollate)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            fault = None
            try:
                from concurrent.futures import ThreadPoolExecutor

                index_skip = self.collate is default_collate
                to_skip = self.skip_batches
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for e in self._epochs():
                        for batch_idx in self.sampler.epoch(e):
                            if stop.is_set():
                                return
                            if to_skip > 0 and index_skip:
                                to_skip -= 1  # 1 index batch == 1 emitted
                                continue
                            rows = list(pool.map(self.dataset.__getitem__,
                                                 batch_idx))
                            batch = self.collate(rows)
                            if batch is not None:
                                if to_skip > 0:
                                    to_skip -= 1
                                    continue
                                q.put(batch)
            except BaseException as exc:  # re-raised consumer-side
                # swallow only genuine teardown races (consumer exited or
                # interpreter finalizing); anything else is a real error —
                # carry it to the consumer instead of a clean end sentinel
                if not stop.is_set() and not sys.is_finalizing():
                    fault = exc
            finally:
                # guaranteed sentinel delivery (a full bounded queue at
                # stream end must not strand the consumer in q.get())
                payload = DataLoader._END if fault is None else _Fault(fault)
                while not stop.is_set():
                    try:
                        q.put(payload, timeout=0.2)
                        break
                    except queue.Full:
                        continue

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if isinstance(item, _Fault):
                    raise item.exc
                if item is DataLoader._END:
                    return
                yield item
        finally:
            stop.set()
            # drain so the producer can exit (it may be blocked in put).
            # Bounded: a producer stuck inside dataset.__getitem__ (stalled
            # network/NFS read) must not hang stream close — after the
            # deadline abandon the daemon thread (same policy as
            # device_prefetch's 5 s join cap).
            deadline = time.monotonic() + 5.0
            while thread.is_alive() and time.monotonic() < deadline:
                while not q.empty():
                    try:
                        q.get_nowait()
                    except queue.Empty:
                        break
                thread.join(timeout=0.2)


def device_prefetch(host_batches: Iterator[Dict[str, np.ndarray]],
                    mesh: Mesh, depth: int = 2,
                    keys: Sequence[str] = ("latent", "context")):
    """Host batches → sharded global jax.Arrays, `depth` batches in flight.

    Array-valued keys become jax.Arrays sharded batch-over-(replica, fsdp)
    (per-host local data on multi-host via
    `make_array_from_process_local_data`); non-array values pass through.
    The host→device staging runs on a dedicated thread so transfer latency
    (notable through this image's chip relay) overlaps with compute instead
    of landing between steps on the training thread."""
    sharding = NamedSharding(mesh, batch_pspec())

    def to_device(batch):
        out = dict(batch)
        for k in keys:
            if k in out and isinstance(out[k], np.ndarray):
                out[k] = jax.make_array_from_process_local_data(
                    sharding, out[k]
                )
        return out

    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    _END = object()
    stop = threading.Event()

    def stage():
        fault = None
        try:
            for batch in host_batches:
                if stop.is_set():
                    return
                staged = to_device(batch)
                while not stop.is_set():
                    try:
                        q.put(staged, timeout=0.2)
                        break
                    except queue.Full:
                        continue
        except BaseException as exc:  # re-raised consumer-side (see _Fault)
            if not stop.is_set() and not sys.is_finalizing():
                fault = exc
        finally:
            # the sentinel MUST arrive even when the bounded queue is full at
            # stream end (put_nowait would hang the consumer forever)
            payload = _END if fault is None else _Fault(fault)
            while not stop.is_set():
                try:
                    q.put(payload, timeout=0.2)
                    break
                except queue.Full:
                    continue

    thread = threading.Thread(target=stage, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if isinstance(item, _Fault):
                raise item.exc
            if item is _END:
                return
            yield item
    finally:
        stop.set()
        while not q.empty():
            try:
                q.get_nowait()
            except queue.Empty:
                break
        # deterministic wind-down (an abandoned eval iterator must not leak
        # its daemon threads until GC): wait for the stager to exit, then
        # close the upstream generator chain — safe only once no thread is
        # executing it
        thread.join(timeout=5.0)
        if not thread.is_alive():
            close = getattr(host_batches, "close", None)
            if close is not None:
                close()
