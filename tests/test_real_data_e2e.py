"""Real-data path rehearsal (round-2 VERDICT missing #4): the full chain
`--dataset cosmos_openvid` → LatentDataset (local parquet fixture) →
fastload (torch.save bytes, torch-free parse) → shape bucketing → Trainer
step, executed end-to-end — previously every link was tested but the chain
had never turned over as a whole. Reference analog: `sharded_dataset.py:8-32`
feeding `train.py:403-434`.
"""

import io
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest


def _make_fixture(path, rows=256, t_values=(2, 3), seed=0):
    torch = pytest.importorskip("torch")
    import datasets as hfds

    rng = np.random.default_rng(seed)
    blobs, captions = [], []
    for i in range(rows):
        t = t_values[i % len(t_values)]
        lat = rng.standard_normal((16, t, 8, 8))
        buf = io.BytesIO()
        torch.save(torch.from_numpy(lat).to(torch.bfloat16), buf)
        blobs.append(buf.getvalue())
        captions.append(f"fixture clip {i}")
    hfds.Dataset.from_dict(
        {"serialized_latent": blobs, "caption": captions}).to_parquet(path)


class TestRealDataPath:
    def test_dataset_reads_fixture_with_reference_splits(self, tmp_path):
        from video_diffusion_speedrun_tpu.data.dataset import LatentDataset

        fx = str(tmp_path / "fixture.parquet")
        _make_fixture(fx, rows=256)
        train = LatentDataset(split="train", hf_name=fx,
                              cache_dir=str(tmp_path / "cache"))
        test = LatentDataset(split="test", hf_name=fx,
                             cache_dir=str(tmp_path / "cache"))
        # half of 256 = 128; last 40 of that half = test
        assert len(train) == 88
        assert len(test) == 40
        row = train[0]
        assert row["latent"].shape == (16, 2, 8, 8)
        assert row["latent"].dtype == np.float32 or \
            str(row["latent"].dtype) == "bfloat16"
        assert row["caption"] == "fixture clip 0"

    def test_trainer_e2e_loss_decreases(self, tmp_path):
        """cosmos_openvid → fastload → bucketing → jitted step for 14 steps;
        the logged loss must decrease."""
        from video_diffusion_speedrun_tpu.core.config import (
            DataConfig, DiTConfig, MeshConfig, OptimizerConfig, TrainConfig,
        )
        from video_diffusion_speedrun_tpu.train.loop import Trainer

        fx = str(tmp_path / "fixture.parquet")
        # mixed latent T (2, 3) exercises ShapeBucketingCollate on the real
        # deserialization path
        _make_fixture(fx, rows=600, t_values=(2, 3))

        model = DiTConfig(
            in_channels=16, hidden_size=64, depth=2, num_heads=2,
            cross_attn_input_size=32, residual_v=True,
            train_bias_and_rms=True, attention_impl="xla",
            compute_dtype=jnp.float32,
        )
        cfg = TrainConfig(
            model=model, mesh=MeshConfig(replica=1, fsdp=8),
            data=DataConfig(
                dataset="cosmos_openvid", hf_name=fx,
                cache_dir=str(tmp_path / "cache"),
                caption_tokens=6, context_dim=32, num_workers=2,
                bucket_by_shape=True, allow_random_context=True,
            ),
            optimizer=OptimizerConfig(learning_rate=0.02,
                                      scheduler="constant", warmup_steps=2),
            num_epochs=8, batch_size=16, max_steps=14, evaluate_every=1000,
            eval_batches=1, run_name="realdata",
            checkpoint_dir=str(tmp_path / "ckpt"), log_every=4, seed=0,
        )
        trainer = Trainer(cfg, prompt_encoder=None)
        losses = []
        orig = trainer._log_train_metrics

        def spy(m, step, avg_ms):
            rec = orig(m, step, avg_ms)
            losses.append(rec["train/total_loss"])
            return rec

        trainer._log_train_metrics = spy
        trainer.train()
        assert len(losses) >= 3
        assert losses[-1] < losses[0], losses
        assert np.isfinite(losses).all()

    def test_fixture_script_cli(self, tmp_path):
        """scripts/make_data_fixture.py writes a loadable fixture."""
        pytest.importorskip("torch")
        out = str(tmp_path / "cli_fixture.parquet")
        r = subprocess.run(
            [sys.executable, "scripts/make_data_fixture.py", "--out", out,
             "--rows", "96", "--frames", "2", "--height", "8", "--width",
             "8"],
            capture_output=True, text=True, cwd=".",
        )
        assert r.returncode == 0, r.stderr
        from video_diffusion_speedrun_tpu.data.dataset import LatentDataset

        ds = LatentDataset(split="test", hf_name=out,
                           cache_dir=str(tmp_path / "cache"))
        assert len(ds) == 40
        assert ds[0]["latent"].shape == (16, 2, 8, 8)
