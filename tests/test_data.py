"""Data pipeline tests: torch-free deserializer (round-trips real torch.save
bytes), per-host sharded sampling, loader, device prefetch."""

import io

import jax
import numpy as np
import pytest

from video_diffusion_speedrun_tpu.core.config import MeshConfig
from video_diffusion_speedrun_tpu.data.loader import (
    DataLoader,
    ShardedSampler,
    default_collate,
    device_prefetch,
)
from video_diffusion_speedrun_tpu.data.serialization import (
    load_object,
    load_tensor,
)
from video_diffusion_speedrun_tpu.data.synthetic import SyntheticLatentDataset
from video_diffusion_speedrun_tpu.parallel.mesh import build_mesh


def _torch_blob(tensor):
    torch = pytest.importorskip("torch")
    buf = io.BytesIO()
    torch.save(tensor, buf)
    return buf.getvalue()


class TestTorchFreeDeserializer:
    def test_float32_roundtrip(self):
        torch = pytest.importorskip("torch")
        t = torch.randn(16, 5, 32, 32)
        arr = load_tensor(_torch_blob(t))
        np.testing.assert_array_equal(arr, t.numpy())

    def test_bfloat16_roundtrip(self):
        """Cosmos latents are serialized bf16; numpy gets them via ml_dtypes."""
        torch = pytest.importorskip("torch")
        import ml_dtypes

        t = torch.randn(4, 3, 8, 8, dtype=torch.bfloat16)
        arr = load_tensor(_torch_blob(t))
        assert arr.dtype == ml_dtypes.bfloat16
        np.testing.assert_array_equal(
            arr.astype(np.float32), t.float().numpy()
        )

    def test_int_and_bool(self):
        torch = pytest.importorskip("torch")
        for t in [torch.arange(10), torch.tensor([True, False, True])]:
            np.testing.assert_array_equal(load_tensor(_torch_blob(t)), t.numpy())

    def test_noncontiguous_tensor(self):
        torch = pytest.importorskip("torch")
        t = torch.randn(6, 8).t()  # transposed (stride-swapped)
        arr = load_tensor(_torch_blob(t))
        np.testing.assert_array_equal(arr, t.numpy())

    def test_dict_of_tensors(self):
        torch = pytest.importorskip("torch")
        obj = {"a": torch.randn(3), "b": {"c": torch.ones(2, 2)}}
        out = load_object(_torch_blob(obj))
        np.testing.assert_array_equal(out["a"], obj["a"].numpy())
        np.testing.assert_array_equal(out["b"]["c"], obj["b"]["c"].numpy())

    def test_rejects_arbitrary_objects(self):
        torch = pytest.importorskip("torch")
        import datetime
        import pickle

        buf = io.BytesIO()
        torch.save({"x": torch.ones(1), "obj": datetime.datetime.now()}, buf)
        with pytest.raises(pickle.UnpicklingError, match="refusing"):
            load_object(buf.getvalue())

    @staticmethod
    def _crafted_blob(shape, stride, offset, storage_numel):
        """Hand-build a torch.save-format archive whose pickle carries
        attacker-controlled (shape, stride, offset): dataset rows are
        untrusted bytes, so out-of-extent strides must be rejected, not read
        out of the storage buffer."""
        torch = pytest.importorskip("torch")
        import pickle
        import zipfile
        from collections import OrderedDict

        class _Storage:
            pass

        class _Pickler(pickle.Pickler):
            def persistent_id(self, obj):
                if isinstance(obj, _Storage):
                    return ("storage", torch.FloatStorage, "0", "cpu",
                            storage_numel)
                return None

        class _Evil:
            def __reduce__(self):
                return (torch._utils._rebuild_tensor_v2,
                        (_Storage(), offset, tuple(shape), tuple(stride),
                         False, OrderedDict()))

        pkl = io.BytesIO()
        _Pickler(pkl, protocol=2).dump(_Evil())
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
            zf.writestr("archive/data.pkl", pkl.getvalue())
            zf.writestr("archive/data/0", b"\x00" * (4 * storage_numel))
        return buf.getvalue()

    def test_crafted_blob_valid_roundtrips(self):
        # sanity: the crafted format itself parses when extents are in range
        blob = self._crafted_blob((2, 3), (3, 1), 0, 6)
        arr = load_tensor(blob)
        assert arr.shape == (2, 3)

    @pytest.mark.parametrize("shape,stride,offset,numel", [
        ((4, 4), (1000, 1), 0, 16),   # row stride reads far past storage
        ((4, 4), (4, 1), 8, 16),      # offset pushes extent out of range
        ((4, 4), (-4, 1), 2, 16),     # negative stride reads before storage
        ((2, 3), (3,), 0, 6),         # rank-mismatched strides
    ])
    def test_out_of_extent_strides_rejected(self, shape, stride, offset,
                                            numel):
        blob = self._crafted_blob(shape, stride, offset, numel)
        with pytest.raises(ValueError):
            load_tensor(blob)

    def test_native_rejects_out_of_extent_strides(self):
        fastload = pytest.importorskip(
            "video_diffusion_speedrun_tpu.data._native.fastload")
        blob = self._crafted_blob((4, 4), (1000, 1), 0, 16)
        with pytest.raises(ValueError):
            fastload.load_tensor(blob)

    @pytest.mark.parametrize("shape,stride", [
        ((2,), (2 ** 62,)),  # (max_off+1)*4 wraps mod 2^64 (fp32 itemsize)
        ((2 ** 32, 2 ** 32), (2 ** 32, 1)),  # span product wraps int64
    ])
    def test_native_rejects_64bit_overflow_strides(self, shape, stride):
        """Extent arithmetic on untrusted metadata must not wrap: a stride
        of 2^61 with itemsize 8 passes a 64-bit (max_off+1)*itemsize check
        mod 2^64 and reads far out of bounds (round-2 review finding)."""
        fastload = pytest.importorskip(
            "video_diffusion_speedrun_tpu.data._native.fastload")
        blob = self._crafted_blob(shape, stride, 0, 16)
        with pytest.raises(ValueError):
            fastload.load_tensor(blob)
        with pytest.raises(ValueError):
            load_tensor(blob)  # the pure-Python parser must agree


class TestShardedSampler:
    def test_disjoint_and_complete(self):
        n, b, shards = 64, 2, 4
        samplers = [ShardedSampler(n, b, s, shards, seed=1) for s in range(shards)]
        epochs = [s.epoch(0) for s in samplers]
        all_idx = np.concatenate([e.ravel() for e in epochs])
        assert len(all_idx) == len(set(all_idx.tolist()))  # disjoint
        assert len(all_idx) == n  # complete coverage
        # same steps per shard
        assert all(e.shape == epochs[0].shape for e in epochs)

    def test_epoch_reshuffles(self):
        s = ShardedSampler(64, 2, 0, 4, seed=1)
        assert not np.array_equal(s.epoch(0), s.epoch(1))

    def test_no_shuffle_is_sequential(self):
        s = ShardedSampler(16, 2, 0, 2, seed=1, shuffle=False)
        np.testing.assert_array_equal(s.epoch(0)[0], [0, 1])
        np.testing.assert_array_equal(s.epoch(0)[1], [4, 5])

    def test_drop_last(self):
        s = ShardedSampler(65, 2, 0, 4, seed=1)
        assert s.rows_per_epoch == 64


class TestLoader:
    def test_batches_shape_and_captions(self):
        ds = SyntheticLatentDataset(num_rows=32, latent_shape=(4, 2, 8, 8))
        sampler = ShardedSampler(32, 4, 0, 1, seed=0)
        loader = DataLoader(ds, sampler, num_workers=2, num_epochs=1)
        batches = list(loader)
        assert len(batches) == 8
        assert batches[0]["latent"].shape == (4, 4, 2, 8, 8)
        assert len(batches[0]["caption"]) == 4
        assert isinstance(batches[0]["caption"][0], str)

    def test_deterministic_across_runs(self):
        ds = SyntheticLatentDataset(num_rows=32, latent_shape=(4, 2, 8, 8))
        sampler = ShardedSampler(32, 4, 0, 1, seed=0)
        b1 = next(iter(DataLoader(ds, sampler, num_epochs=1)))
        b2 = next(iter(DataLoader(ds, sampler, num_epochs=1)))
        np.testing.assert_array_equal(b1["latent"], b2["latent"])

    def test_producer_error_propagates(self):
        """Regression (round-2 advisor, low): a genuine exception in the
        dataset/collate mid-stream must raise on the consumer side, not
        silently end the stream as a clean epoch boundary."""

        class PoisonDataset:
            def __len__(self):
                return 32

            def __getitem__(self, idx):
                if idx == 17:
                    raise RuntimeError("bad row")
                return {"latent": np.zeros((4, 2, 8, 8), np.float32),
                        "caption": "x"}

        sampler = ShardedSampler(32, 4, 0, 1, seed=0, shuffle=False)
        loader = DataLoader(PoisonDataset(), sampler, num_workers=2,
                            num_epochs=1)
        with pytest.raises(RuntimeError, match="bad row"):
            list(loader)

    def test_stage_error_propagates(self):
        """Same for the device-staging thread of device_prefetch."""
        mesh = build_mesh(MeshConfig(replica=1, fsdp=8, tensor=1))

        def poisoned():
            yield {"latent": np.zeros((8, 4, 2, 8, 8), np.float32)}
            raise ValueError("upstream blew up")

        with pytest.raises(ValueError, match="upstream blew up"):
            list(device_prefetch(poisoned(), mesh))

    def test_early_close_winds_down_threads(self):
        """Regression (round-2 VERDICT weak #4): abandoning the stream at
        eval_batches must not leak producer/stager daemon threads until GC —
        close() winds the whole chain down promptly."""
        import threading
        import time as _time

        mesh = build_mesh(MeshConfig(replica=1, fsdp=8, tensor=1))
        baseline = threading.active_count()
        for _ in range(5):
            ds = SyntheticLatentDataset(num_rows=64,
                                        latent_shape=(4, 2, 8, 8))
            sampler = ShardedSampler(64, 8, 0, 1, seed=0)
            loader = DataLoader(ds, sampler, num_workers=2, num_epochs=None)

            def add_context(batches):
                rng = np.random.default_rng(0)
                for b in batches:
                    b["context"] = rng.standard_normal(
                        (8, 6, 32)).astype(np.float32)
                    yield b

            stream = device_prefetch(add_context(iter(loader)), mesh)
            next(stream)  # consume one batch, then abandon mid-stream
            stream.close()
        deadline = _time.time() + 10
        while threading.active_count() > baseline and _time.time() < deadline:
            _time.sleep(0.1)
        assert threading.active_count() <= baseline, (
            f"{threading.active_count() - baseline} leaked threads after "
            "5 open/close cycles"
        )

    def test_device_prefetch_shards_batch(self):
        mesh = build_mesh(MeshConfig(replica=1, fsdp=8, tensor=1))
        ds = SyntheticLatentDataset(num_rows=32, latent_shape=(4, 2, 8, 8))
        sampler = ShardedSampler(32, 8, 0, 1, seed=0)
        loader = DataLoader(ds, sampler, num_epochs=1)

        def add_context(batches):
            rng = np.random.default_rng(0)
            for b in batches:
                b["context"] = rng.standard_normal((8, 6, 32)).astype(np.float32)
                yield b

        out = list(device_prefetch(add_context(iter(loader)), mesh))
        assert len(out) == 4
        lat = out[0]["latent"]
        assert isinstance(lat, jax.Array)
        assert lat.shape == (8, 4, 2, 8, 8)
        assert len(lat.sharding.device_set) == 8
        assert isinstance(out[0]["caption"], list)


class TestNativeFastload:
    """C++ fastload parity + speed vs the Python parser (and torch)."""

    def _native(self):
        from video_diffusion_speedrun_tpu.data._native import fastload
        return fastload

    def test_native_matches_python(self):
        torch = pytest.importorskip("torch")
        fastload = pytest.importorskip(
            "video_diffusion_speedrun_tpu.data._native.fastload")
        import ml_dtypes

        for t in [torch.randn(16, 5, 32, 32),
                  torch.randn(3, 7, dtype=torch.bfloat16),
                  torch.arange(100).reshape(10, 10),
                  torch.randn(6, 8).t()]:
            blob = _torch_blob(t)
            arr, is_bf16 = fastload.load_tensor(blob)
            if is_bf16:
                arr = arr.view(ml_dtypes.bfloat16)
            np.testing.assert_array_equal(
                arr.astype(np.float32), t.float().numpy())

    def test_native_rejects_containers(self):
        torch = pytest.importorskip("torch")
        fastload = pytest.importorskip(
            "video_diffusion_speedrun_tpu.data._native.fastload")
        with pytest.raises(ValueError):
            fastload.load_tensor(_torch_blob({"a": torch.ones(1)}))

    def test_load_tensor_uses_native_transparently(self):
        torch = pytest.importorskip("torch")
        t = torch.randn(4, 4, dtype=torch.bfloat16)
        arr = load_tensor(_torch_blob(t))
        np.testing.assert_array_equal(
            np.asarray(arr, np.float32), t.float().numpy())

    def test_native_faster_than_torch(self):
        """The point of the native path: beat torch.load on the hot row
        format (Cosmos bf16 latents)."""
        import io
        import time

        torch = pytest.importorskip("torch")
        fastload = pytest.importorskip(
            "video_diffusion_speedrun_tpu.data._native.fastload")
        t = torch.randn(16, 5, 32, 32, dtype=torch.bfloat16)
        blob = _torch_blob(t)

        def timeit(fn, n=50):
            fn()
            t0 = time.perf_counter()
            for _ in range(n):
                fn()
            return (time.perf_counter() - t0) / n

        t_native = timeit(lambda: fastload.load_tensor(blob))
        t_torch = timeit(
            lambda: torch.load(io.BytesIO(blob), weights_only=True))
        assert t_native < t_torch, (t_native, t_torch)


class TestNativeFastloadHardening:
    """Crafted/corrupt blobs must raise cleanly, never read out of bounds.

    Covers the untrusted-input gaps a review found: pickle memo opcodes on
    an empty stack, attacker-sized memo indices, and uint64-wrapping zip64
    offsets in the ZIP bounds checks."""

    def _fastload(self):
        return pytest.importorskip(
            "video_diffusion_speedrun_tpu.data._native.fastload")

    @staticmethod
    def _zip_blob(members):
        import io
        import zipfile

        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
            for name, data in members.items():
                z.writestr(name, data)
        return buf.getvalue()

    def test_memo_put_on_empty_stack_raises(self):
        fastload = self._fastload()
        # data.pkl = BINPUT with nothing on the stack — UB without the guard
        blob = self._zip_blob({"archive/data.pkl": b"q\x00"})
        with pytest.raises(ValueError):
            fastload.load_tensor(blob)

    def test_huge_long_binput_index_raises(self):
        fastload = self._fastload()
        # BININT1 5; LONG_BINPUT 0xFFFFFFFF (would demand a 4-billion-entry
        # memo resize); STOP
        pkl = b"K\x05r\xff\xff\xff\xff."
        blob = self._zip_blob({"archive/data.pkl": pkl})
        with pytest.raises(ValueError):
            fastload.load_tensor(blob)

    def test_wrapping_zip64_local_offset_raises(self):
        """CD entry whose zip64 extra declares a local-header offset near
        UINT64_MAX: `offset + 30` wraps past the bounds check without the
        subtract-form comparison and reads far out of the buffer."""
        import struct

        fastload = self._fastload()
        name = b"archive/data.pkl"
        extra = struct.pack("<HHQ", 0x0001, 8, 0xFFFFFFFFFFFFFFF0)
        cd = struct.pack(
            "<IHHHHHHIIIHHHHHII",
            0x02014B50, 20, 20, 0, 0, 0, 0,  # sig, versions, flags, method, time, date
            0, 2, 2,                          # crc, csize, usize
            len(name), len(extra), 0,         # name/extra/comment lens
            0, 0, 0,                          # disk, int attr, ext attr
            0xFFFFFFFF,                       # lho -> take from zip64 extra
        ) + name + extra
        eocd = struct.pack(
            "<IHHHHIIH", 0x06054B50, 0, 0, 1, 1, len(cd), 0, 0
        )
        with pytest.raises(ValueError):
            fastload.load_tensor(cd + eocd)

    def test_wrapping_eocd64_offset_raises(self):
        """EOCD64 locator pointing near UINT64_MAX: `eocd64 + 56` wraps."""
        import struct

        fastload = self._fastload()
        locator = struct.pack("<IIQI", 0x07064B50, 0, 0xFFFFFFFFFFFFFFF0, 1)
        eocd = struct.pack(
            "<IHHHHIIH", 0x06054B50, 0, 0, 1, 1, 0, 0xFFFFFFFF, 0
        )
        with pytest.raises(ValueError):
            fastload.load_tensor(locator + eocd)


class TestShapeBucketing:
    def test_mixed_shapes_batch_uniform(self):
        from video_diffusion_speedrun_tpu.data.loader import (
            ShapeBucketingCollate,
        )

        rows_a = [{"latent": np.zeros((4, 2, 8, 8)), "caption": "a"}
                  for _ in range(3)]
        rows_b = [{"latent": np.zeros((4, 5, 8, 8)), "caption": "b"}
                  for _ in range(2)]
        coll = ShapeBucketingCollate(batch_size=3)
        out = coll(rows_a[:2] + rows_b)   # no bucket full yet at bs=3? a=2,b=2
        assert out is None
        out = coll([rows_a[2]])           # a reaches 3
        assert out is not None
        assert out["latent"].shape == (3, 4, 2, 8, 8)

    def test_loader_with_bucketing(self):
        from video_diffusion_speedrun_tpu.data.loader import (
            DataLoader, ShapeBucketingCollate, ShardedSampler,
        )

        class VarLenDataset:
            def __len__(self):
                return 32

            def __getitem__(self, i):
                t = 2 if i % 2 == 0 else 5
                return {"latent": np.full((4, t, 8, 8), float(i), np.float32),
                        "caption": str(i)}

        ds = VarLenDataset()
        sampler = ShardedSampler(32, 4, 0, 1, seed=0)
        loader = DataLoader(ds, sampler, collate=ShapeBucketingCollate(4),
                            num_epochs=1)
        batches = list(loader)
        assert batches, "no batches emitted"
        for b in batches:
            assert b["latent"].shape[0] == 4
            assert b["latent"].shape[2] in (2, 5)


class TestLoaderSkip:
    """skip_batches resume fast-forward: the stream from batch k on must be
    EXACTLY what a continuous run emits after k batches — for both the
    index-skip fast path (default collate, no reads for the skipped prefix)
    and the load-and-discard path (stateful bucketing collates)."""

    def test_default_collate_index_skip(self):
        ds = SyntheticLatentDataset(num_rows=32, latent_shape=(4, 2, 8, 8))
        sampler = ShardedSampler(32, 4, 0, 1, seed=0)
        full = list(DataLoader(ds, sampler, num_epochs=2))
        for k in (1, 7, 9):  # within epoch 0, at the boundary, into epoch 1
            skipped = list(DataLoader(ds, sampler, num_epochs=2,
                                      skip_batches=k))
            assert len(skipped) == len(full) - k
            for a, b in zip(full[k:], skipped):
                np.testing.assert_array_equal(a["latent"], b["latent"])
                assert a["caption"] == b["caption"]

    def test_default_collate_skip_does_not_read(self):
        reads = []

        class CountingDataset:
            def __len__(self):
                return 32

            def __getitem__(self, i):
                reads.append(i)
                return {"latent": np.zeros((4, 2, 8, 8), np.float32),
                        "caption": str(i)}

        sampler = ShardedSampler(32, 4, 0, 1, seed=0)
        out = list(DataLoader(CountingDataset(), sampler, num_epochs=1,
                              skip_batches=6))
        assert len(out) == 2
        assert len(reads) == 8  # only the 2 emitted batches were loaded

    def test_bucketing_collate_load_and_discard(self):
        from video_diffusion_speedrun_tpu.data.loader import (
            ShapeBucketingCollate,
        )

        class VarLenDataset:
            def __len__(self):
                return 32

            def __getitem__(self, i):
                t = 2 if i % 2 == 0 else 5
                return {"latent": np.full((4, t, 8, 8), float(i), np.float32),
                        "caption": str(i)}

        ds = VarLenDataset()
        sampler = ShardedSampler(32, 4, 0, 1, seed=0)
        full = list(DataLoader(ds, sampler, collate=ShapeBucketingCollate(4),
                               num_epochs=2))
        k = 3
        skipped = list(DataLoader(ds, sampler,
                                  collate=ShapeBucketingCollate(4),
                                  num_epochs=2, skip_batches=k))
        assert len(skipped) == len(full) - k
        for a, b in zip(full[k:], skipped):
            np.testing.assert_array_equal(a["latent"], b["latent"])


class TestOddFrameLatents:
    """Real Cosmos latents have 1+4k (odd) frames; patchify floor-crops like
    a strided conv and the loss crops the target to match."""

    def test_loss_handles_odd_t(self):
        import jax
        import jax.numpy as jnp
        from video_diffusion_speedrun_tpu.core.config import DiTConfig
        from video_diffusion_speedrun_tpu.models.dit import init_dit
        from video_diffusion_speedrun_tpu.train.loss import rectified_flow_loss

        cfg = DiTConfig(in_channels=4, hidden_size=64, depth=2, num_heads=2,
                        cross_attn_input_size=32, residual_v=True,
                        train_bias_and_rms=True, attention_impl="xla",
                        compute_dtype=jnp.float32)
        params = init_dit(jax.random.PRNGKey(0), cfg)
        latent = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 5, 9, 9))
        ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 32))
        loss, _ = rectified_flow_loss(params, cfg, latent, ctx,
                                      jax.random.PRNGKey(3))
        assert np.isfinite(float(loss))


class TestLatentDatasetOffline:
    """Exercises data/dataset.py end-to-end against an in-memory HF dataset
    (no network): split arithmetic + torch-free deserialization."""

    def _fake_hf(self, monkeypatch, total_rows=200):
        torch = pytest.importorskip("torch")
        import datasets as hfds

        blobs, captions = [], []
        for i in range(total_rows):
            t = torch.full((2, 1, 2, 2), float(i), dtype=torch.bfloat16)
            blobs.append(_torch_blob(t))
            captions.append(f"caption {i}")
        table = hfds.Dataset.from_dict(
            {"serialized_latent": blobs, "caption": captions})

        def fake_load_dataset(name, split=None, cache_dir=None, **kw):
            return table

        import video_diffusion_speedrun_tpu.data.dataset as ds_mod
        monkeypatch.setattr("datasets.load_dataset", fake_load_dataset)
        monkeypatch.setattr(ds_mod.LatentDataset, "TOTAL_ROWS", total_rows)
        monkeypatch.setattr(ds_mod.LatentDataset, "TEST_ROWS", 4)
        return ds_mod

    def test_split_arithmetic_and_rows(self, monkeypatch):
        ds_mod = self._fake_hf(monkeypatch, total_rows=200)
        train = ds_mod.LatentDataset(split="train")
        test = ds_mod.LatentDataset(split="test")
        # first half of 200 = 100 rows; last 4 of that half are test
        assert len(train) == 96
        assert len(test) == 4
        row = train[3]
        assert row["latent"].shape == (2, 1, 2, 2)
        assert float(row["latent"].astype(np.float32)[0, 0, 0, 0]) == 3.0
        assert row["caption"] == "caption 3"
        # test split starts at row 96
        assert float(test[0]["latent"].astype(np.float32)[0, 0, 0, 0]) == 96.0

    def test_bad_split_raises(self, monkeypatch):
        ds_mod = self._fake_hf(monkeypatch)
        with pytest.raises(ValueError, match="unknown split"):
            ds_mod.LatentDataset(split="validation")

    def test_hub_row_count_drift_raises(self, monkeypatch):
        """The reference pins MS = 1979810 // 2 (`sharded_dataset.py:18`)
        rather than len(dataset); an upstream row-count change must fail
        loudly, not silently shift the train/test boundary (split-local
        indices key precomputed-embedding joins)."""
        ds_mod = self._fake_hf(monkeypatch, total_rows=200)
        monkeypatch.setattr(ds_mod.LatentDataset, "TOTAL_ROWS", 198)
        with pytest.raises(ValueError, match="pins 198"):
            ds_mod.LatentDataset(split="train")


class TestCoordinatedBucketing:
    """Multi-host shape coordination: every simulated host must emit the
    same latent-shape sequence (the SPMD requirement; VERDICT r1 item 7)."""

    def _host_stream(self, host, num_hosts, n_batches=12, batch=4, seed=7):
        from video_diffusion_speedrun_tpu.data.loader import (
            CoordinatedShapeBucketingCollate,
            ShardedSampler,
        )
        from video_diffusion_speedrun_tpu.data.synthetic import (
            SyntheticLatentDataset,
        )

        ds = SyntheticLatentDataset(
            num_rows=2048, latent_shape=(4, 5, 8, 8), seed=3,
            t_choices=(5, 9, 17),
        )
        collate = CoordinatedShapeBucketingCollate(
            batch, ds.latent_shapes(), seed=seed)
        sampler = ShardedSampler(len(ds), batch, host, num_hosts, seed=1)
        shapes = []
        for idx_batch in sampler.epoch(0):
            rows = [ds[i] for i in idx_batch]
            out = collate(rows)
            if out is not None:
                shapes.append(tuple(out["latent"].shape))
                if len(shapes) >= n_batches:
                    break
        return shapes

    def test_hosts_emit_identical_shape_sequences(self):
        seqs = [self._host_stream(h, 4) for h in range(4)]
        assert len(seqs[0]) == 12
        for s in seqs[1:]:
            assert s == seqs[0]
        # multiple distinct shapes actually appear
        assert len({s[2] for s in seqs[0]}) > 1

    def test_batches_are_shape_uniform(self):
        shapes = self._host_stream(0, 2, n_batches=8)
        for s in shapes:
            assert s[0] == 4  # full batch of the scheduled shape

    def test_rejects_undeclared_shape(self):
        import numpy as np
        import pytest

        from video_diffusion_speedrun_tpu.data.loader import (
            CoordinatedShapeBucketingCollate,
        )

        collate = CoordinatedShapeBucketingCollate(2, [(4, 5, 8, 8)])
        bad = {"latent": np.zeros((4, 7, 8, 8), np.float32), "caption": "x"}
        with pytest.raises(ValueError):
            collate([bad])
