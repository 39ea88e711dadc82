"""End-to-end Trainer orchestrator test on the CPU mesh (the run_debug.sh
integration analog, SURVEY.md §4.3, as an actual automated test)."""

import json
import os

import jax.numpy as jnp
import numpy as np

from video_diffusion_speedrun_tpu.core.config import (
    DataConfig,
    DiTConfig,
    MeshConfig,
    OptimizerConfig,
    TrainConfig,
)
from video_diffusion_speedrun_tpu.train.loop import Trainer


def _cfg(tmp_path, **kw):
    model = DiTConfig(
        in_channels=16, hidden_size=64, depth=2, num_heads=2,
        cross_attn_input_size=32, residual_v=True, train_bias_and_rms=True,
        attention_impl="xla", compute_dtype=jnp.float32,
    )
    defaults = dict(
        model=model, mesh=MeshConfig(replica=1, fsdp=8),
        data=DataConfig(dataset="synthetic", synthetic_shape=(16, 4, 16, 16),
                        caption_tokens=6, context_dim=32, num_workers=2),
        optimizer=OptimizerConfig(learning_rate=0.01, scheduler="linear",
                                  warmup_steps=2),
        num_epochs=4, batch_size=16, max_steps=12, evaluate_every=10,
        eval_batches=2, run_name="smoke", checkpoint_dir=str(tmp_path),
        log_every=5, seed=0,
    )
    defaults.update(kw)
    return TrainConfig(**defaults)


class TestTrainerLoop:
    def test_trains_evals_checkpoints_and_logs(self, tmp_path):
        trainer = Trainer(_cfg(tmp_path))
        last = trainer.train()

        assert "train/total_loss" in last
        assert np.isfinite(last["train/total_loss"])
        assert "test/total_loss" in last  # eval ran (step 11 % 10 == 1)

        # checkpoint written at the eval step
        ckpt_dir = tmp_path / "smoke"
        steps = [d for d in os.listdir(ckpt_dir) if d.isdigit()]
        assert steps, list(os.listdir(ckpt_dir))

        # metrics.jsonl written with train + eval records
        records = [json.loads(l) for l in open(ckpt_dir / "metrics.jsonl")]
        keys = set().union(*(r.keys() for r in records))
        assert "train/total_loss" in keys and "test/total_loss" in keys
        # working timestep bins (non-zero somewhere, unlike the reference's
        # dead binning code)
        bin_vals = [v for r in records for k, v in r.items()
                    if k.startswith("train_binning/")]
        assert any(v > 0 for v in bin_vals)

    def test_eval_batch_clamped_to_test_split(self, tmp_path):
        """The canonical global batch (64) exceeds the pinned 40-row test
        split; eval must clamp to the largest shardable size, not crash at
        the first eval (the reference sidesteps this by evaluating each
        rank on the full split independently, `train.py:366-374`)."""
        cfg = _cfg(tmp_path, batch_size=64, max_steps=3, evaluate_every=2,
                   run_name="clamp",
                   data=DataConfig(dataset="synthetic",
                                   synthetic_shape=(16, 4, 16, 16),
                                   synthetic_rows=128, test_rows=40,
                                   caption_tokens=6, context_dim=32,
                                   num_workers=2))
        trainer = Trainer(cfg)
        last = trainer.train()
        assert "test/total_loss" in last
        assert np.isfinite(last["test/total_loss"])

    def test_resume_from_full_checkpoint(self, tmp_path):
        cfg = _cfg(tmp_path, max_steps=11, run_name="first")
        t1 = Trainer(cfg)
        t1.train()
        ckpt = str(tmp_path / "first")

        cfg2 = _cfg(tmp_path, max_steps=12, run_name="second",
                    load_checkpoint=ckpt)
        t2 = Trainer(cfg2)
        assert int(t2.state.step) == 11  # resumed at saved step

    def test_inloop_trainer_checkpoint_resume(self, tmp_path):
        """Optimizer-in-backward through the production Trainer: trains,
        evals, checkpoints the InloopOptState (incl. factored-nu FNu
        leaves) via orbax, and resumes — round-3 VERDICT next #1."""
        from video_diffusion_speedrun_tpu.train.inloop import FNu

        okw = OptimizerConfig(learning_rate=0.01, scheduler="linear",
                              warmup_steps=2, in_backward=True,
                              nu_factored=True, nu_factored_min_size=1)
        cfg = _cfg(tmp_path, max_steps=11, run_name="inloop1", optimizer=okw,
                   grad_accum=2)
        t1 = Trainer(cfg)
        last = t1.train()
        assert np.isfinite(last["train/total_loss"])
        assert "test/total_loss" in last

        # max_steps=16 so a log interval (log_every=5 → step 15) lands
        # after the resume point and train() returns fresh train metrics
        cfg2 = _cfg(tmp_path, max_steps=16, run_name="inloop2", optimizer=okw,
                    grad_accum=2, load_checkpoint=str(tmp_path / "inloop1"))
        t2 = Trainer(cfg2)
        assert int(t2.state.step) == 11
        assert int(t2.state.opt_state.count) == 11
        q = t2.state.opt_state.nu["blocks"]["qkv"]["weight"]
        assert isinstance(q, FNu)
        assert float(np.abs(np.asarray(q.vr)).max()) > 0  # real state, not zeros
        last2 = t2.train()  # continues without recompiling surprises
        assert np.isfinite(last2["train/total_loss"])


class TestResumeDeterminism:
    def test_resumed_run_bit_matches_continuous(self, tmp_path):
        """checkpoint at step 6 + resume to 10 produces EXACTLY the params
        of one continuous 10-step run: the restored step re-seeds the
        per-step rng (fold_in) AND the loader fast-forwards the data stream
        (skip_batches) — the reference can do neither (its resume restarts
        the schedule and the data order, SURVEY.md quirk #8)."""
        import jax

        # constant scheduler: the linear decay slope depends on max_steps,
        # so an interrupted run emulated via a smaller max_steps would
        # legitimately take different steps — this test isolates data/rng
        # alignment, which must be exact
        opt = OptimizerConfig(learning_rate=0.01, scheduler="constant",
                              warmup_steps=2)
        cont = Trainer(_cfg(tmp_path, max_steps=10, run_name="cont",
                            evaluate_every=100, optimizer=opt))
        cont.train()

        Trainer(_cfg(tmp_path, max_steps=6, run_name="resA", optimizer=opt,
                     evaluate_every=5)).train()  # saves at 1 and 6
        resumed = Trainer(_cfg(tmp_path, max_steps=10, run_name="resB",
                               evaluate_every=100, optimizer=opt,
                               load_checkpoint=str(tmp_path / "resA")))
        assert int(resumed.state.step) == 6
        resumed.train()

        assert int(cont.state.step) == int(resumed.state.step) == 10
        for a, b in zip(jax.tree.leaves(cont.state.params),
                        jax.tree.leaves(resumed.state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestEncodeStreamResume:
    def test_synthetic_context_is_batch_index_seeded(self, tmp_path):
        """The smoke-mode synthetic context must depend only on (seed,
        global batch index) so a resumed stream attaches the same context
        a continuous run did at the same index."""
        import types

        cfg = _cfg(tmp_path, data=DataConfig(
            dataset="cosmos_openvid", caption_tokens=6, context_dim=32,
            allow_random_context=True))
        stub = types.SimpleNamespace(
            cfg=cfg, prompt_encoder=None, device_context=False,
            logger=__import__("logging").getLogger("t"))

        def batches(n, start):
            return [{"latent": np.full((4, 16, 4, 16, 16), float(start + i),
                                       np.float32)} for i in range(n)]

        enc = Trainer._encode_stream
        cont = list(enc(stub, iter(batches(5, 0)), start_index=0))
        resumed = list(enc(stub, iter(batches(2, 3)), start_index=3))
        for a, b in zip(cont[3:], resumed):
            np.testing.assert_array_equal(a["context"], b["context"])
        # distinct indices draw distinct contexts
        assert not np.array_equal(cont[0]["context"], cont[1]["context"])


class TestVariableLengthTraining:
    def test_mixed_clip_lengths_train(self, tmp_path):
        """BASELINE configs[2]: variable-length clips via shape bucketing —
        each batch is shape-uniform; jit specializes per bucket."""
        cfg = _cfg(
            tmp_path, max_steps=6, evaluate_every=100, run_name="varlen",
            data=DataConfig(
                dataset="synthetic", synthetic_shape=(16, 4, 16, 16),
                synthetic_t_choices=(2, 4), bucket_by_shape=True,
                caption_tokens=6, context_dim=32, num_workers=2,
            ),
        )
        trainer = Trainer(cfg)
        last = trainer.train()
        assert np.isfinite(last["train/total_loss"])
