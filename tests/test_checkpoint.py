"""Checkpoint tests: orbax full-state round trip (params + optimizer + step —
what the reference never persisted, `train.py:553,581-584`) and the torch
reference-checkpoint importer."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_diffusion_speedrun_tpu.core.config import (
    DiTConfig,
    MeshConfig,
    OptimizerConfig,
    TrainConfig,
)
from video_diffusion_speedrun_tpu.parallel.mesh import build_mesh
from video_diffusion_speedrun_tpu.train.checkpoint import CheckpointManager
from video_diffusion_speedrun_tpu.train.step import build_train_step

TINY_MODEL = DiTConfig(
    in_channels=4, patch_size=2, time_patch_size=2, hidden_size=64, depth=2,
    num_heads=2, cross_attn_input_size=32, residual_v=True,
    train_bias_and_rms=True, attention_impl="xla", compute_dtype=jnp.float32,
)
TINY = TrainConfig(
    model=TINY_MODEL, mesh=MeshConfig(replica=1, fsdp=8),
    optimizer=OptimizerConfig(learning_rate=0.01, scheduler="constant",
                              warmup_steps=2),
    batch_size=8, max_steps=50, seed=0,
)


def _batch():
    return {
        "latent": jax.random.normal(jax.random.PRNGKey(1), (8, 4, 4, 8, 8)),
        "context": jax.random.normal(jax.random.PRNGKey(2), (8, 6, 32)),
    }


class TestOrbaxRoundTrip:
    def test_full_state_roundtrip(self, tmp_path):
        mesh = build_mesh(TINY.mesh)
        init_fn, train_step, _, _ = build_train_step(TINY, mesh)
        state = init_fn(jax.random.PRNGKey(0))
        state, _ = train_step(state, _batch(), jax.random.PRNGKey(3))

        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(int(state.step), state)
        mgr.wait()

        state2 = init_fn(jax.random.PRNGKey(99))  # different init
        restored = mgr.restore(None, state2)
        mgr.close()

        assert int(restored.step) == int(state.step) == 1
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # optimizer moments restored too
        np.testing.assert_array_equal(
            np.asarray(state.opt_state.adam.mu["final_proj"]["weight"]),
            np.asarray(restored.opt_state.adam.mu["final_proj"]["weight"]),
        )
        # shardings preserved
        qkv = restored.params["blocks"]["qkv"]["weight"]
        assert len(qkv.sharding.device_set) == 8

    def test_resume_continues_schedule(self, tmp_path):
        """Restored state continues from its step (the reference restarts
        the schedule on 'resume' — SURVEY.md §Quirks #8)."""
        mesh = build_mesh(TINY.mesh)
        init_fn, train_step, _, _ = build_train_step(TINY, mesh)
        state = init_fn(jax.random.PRNGKey(0))
        for _ in range(3):
            state, _ = train_step(state, _batch(), jax.random.PRNGKey(3))
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(int(state.step), state)
        mgr.wait()
        restored = mgr.restore(None, init_fn(jax.random.PRNGKey(1)))
        mgr.close()
        assert int(restored.step) == 3
        assert int(restored.opt_state.count) == 3


class TestTorchImport:
    def test_consolidated_pt_import(self, tmp_path):
        """Round-trip: reference torch DiT → .pt → our params → parity fwd."""
        torch = pytest.importorskip("torch")
        sys.path.insert(0, "/root/reference")
        try:
            import model as ref_mod
        finally:
            sys.path.remove("/root/reference")

        torch.manual_seed(0)
        ref = ref_mod.DiT(
            in_channels=4, patch_size=2, time_patch_size=2, hidden_size=64,
            depth=2, num_heads=2, cross_attn_input_size=32, residual_v=True,
            train_bias_and_rms=True,
        ).eval()
        pt = tmp_path / "weights.pt"
        torch.save({f"module.{k}": v for k, v in ref.state_dict().items()}, pt)

        from video_diffusion_speedrun_tpu.train.checkpoint import (
            load_reference_checkpoint,
        )

        cfg = TINY_MODEL.replace(rope_order="reference")
        params = load_reference_checkpoint(str(pt), cfg)

        from video_diffusion_speedrun_tpu.models.dit import dit_forward

        gen = torch.Generator().manual_seed(1)
        x = torch.randn(1, 4, 4, 8, 8, generator=gen)
        ctx = torch.randn(1, 5, 32, generator=gen)
        ts = torch.tensor([0.4])
        orig_randint = torch.randint
        torch.randint = lambda *a, **k: torch.zeros((1,), dtype=torch.long)
        try:
            with torch.no_grad():
                want = ref(x, ctx, ts).numpy()
        finally:
            torch.randint = orig_randint
        got = dit_forward(params, cfg, jnp.asarray(x.numpy()),
                          jnp.asarray(ctx.numpy()), jnp.asarray(ts.numpy()),
                          rope_offsets=jnp.zeros(3, jnp.int32))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


class TestInferenceRestore:
    def test_restore_params_for_inference(self, tmp_path):
        """sample.py path: restore only params from a full-state checkpoint."""
        from video_diffusion_speedrun_tpu.train.checkpoint import (
            is_orbax_checkpoint, restore_params_for_inference,
        )

        mesh = build_mesh(TINY.mesh)
        init_fn, train_step, _, _ = build_train_step(TINY, mesh)
        state = init_fn(jax.random.PRNGKey(0))
        state, _ = train_step(state, _batch(), jax.random.PRNGKey(3))
        mgr = CheckpointManager(str(tmp_path / "run"))
        mgr.save(int(state.step), state)
        mgr.wait(); mgr.close()

        assert is_orbax_checkpoint(str(tmp_path / "run"))
        assert not is_orbax_checkpoint(str(tmp_path))
        params = restore_params_for_inference(str(tmp_path / "run"), TINY)
        np.testing.assert_array_equal(
            np.asarray(params["final_proj"]["weight"]),
            np.asarray(state.params["final_proj"]["weight"]))

    def test_restore_from_step_dir(self, tmp_path):
        """Pointing sample.py at a specific step dir (checkpoints/run/<N>)
        works too — code-review finding."""
        from video_diffusion_speedrun_tpu.train.checkpoint import (
            is_orbax_checkpoint, restore_params_for_inference,
        )

        mesh = build_mesh(TINY.mesh)
        init_fn, train_step, _, _ = build_train_step(TINY, mesh)
        state = init_fn(jax.random.PRNGKey(0))
        state, _ = train_step(state, _batch(), jax.random.PRNGKey(3))
        mgr = CheckpointManager(str(tmp_path / "run"))
        mgr.save(int(state.step), state)
        mgr.wait(); mgr.close()

        step_dir = str(tmp_path / "run" / "1")
        assert is_orbax_checkpoint(step_dir)
        params = restore_params_for_inference(step_dir, TINY)
        np.testing.assert_array_equal(
            np.asarray(params["final_proj"]["weight"]),
            np.asarray(state.params["final_proj"]["weight"]))

    def test_digit_run_name_not_misparsed_as_step_dir(self, tmp_path):
        """An all-digit run name (e.g. --run_name 20260819) must resolve as
        a run ROOT, not a step dir — code-review finding, round 4."""
        from video_diffusion_speedrun_tpu.train.checkpoint import (
            restore_params_for_inference, split_checkpoint_path,
        )

        mesh = build_mesh(TINY.mesh)
        init_fn, train_step, _, _ = build_train_step(TINY, mesh)
        state = init_fn(jax.random.PRNGKey(0))
        state, _ = train_step(state, _batch(), jax.random.PRNGKey(3))
        run = tmp_path / "20260819"
        mgr = CheckpointManager(str(run))
        mgr.save(int(state.step), state)
        mgr.wait(); mgr.close()

        assert split_checkpoint_path(str(run)) == (str(run), None)
        assert split_checkpoint_path(str(run / "1")) == (str(run), 1)
        params = restore_params_for_inference(str(run), TINY)
        np.testing.assert_array_equal(
            np.asarray(params["final_proj"]["weight"]),
            np.asarray(state.params["final_proj"]["weight"]))

    def test_digit_run_root_without_checkpoints(self, tmp_path):
        """An EXISTING all-digit run root with no step dirs yet (fresh run,
        or mid first async save) is a run root — it must not misparse as a
        step dir of the parent (round-4 follow-up finding). A NONEXISTENT
        digit path keeps the step-dir reading."""
        from video_diffusion_speedrun_tpu.train.checkpoint import (
            split_checkpoint_path,
        )

        run = tmp_path / "20260819"
        run.mkdir()
        assert split_checkpoint_path(str(run)) == (str(run), None)
        # in-flight async save: orbax tmp dirs are not pure digits
        (run / "1.orbax-checkpoint-tmp-0").mkdir()
        assert split_checkpoint_path(str(run)) == (str(run), None)
        # nonexistent digit path: nothing to inspect -> step dir
        gone = tmp_path / "run" / "120"
        assert split_checkpoint_path(str(gone)) == (str(gone.parent), 120)

    def test_restore_validates_model_config(self, tmp_path):
        """A mismatched --model_width fails loudly AT RESTORE TIME."""
        import dataclasses

        from video_diffusion_speedrun_tpu.train.checkpoint import (
            restore_params_for_inference,
        )

        mesh = build_mesh(TINY.mesh)
        init_fn, train_step, _, _ = build_train_step(TINY, mesh)
        state = init_fn(jax.random.PRNGKey(0))
        mgr = CheckpointManager(str(tmp_path / "run"))
        mgr.save(0, state)
        mgr.wait(); mgr.close()

        wrong = dataclasses.replace(TINY_MODEL, hidden_size=128)
        with pytest.raises(ValueError, match="model config"):
            restore_params_for_inference(str(tmp_path / "run"), wrong)

    def test_restore_from_in_backward_checkpoint(self, tmp_path):
        """The XL user journey: the 2.8B one-chip regime trains with
        optimizer_in_backward (InloopOptState with factored FNu leaves in
        the checkpoint); sampling restores params from it WITHOUT knowing
        which optimizer wrote the state (metadata-derived template)."""
        import dataclasses

        from video_diffusion_speedrun_tpu.train.checkpoint import (
            restore_params_for_inference,
        )

        cfg = dataclasses.replace(
            TINY, optimizer=OptimizerConfig(
                learning_rate=0.01, scheduler="constant", warmup_steps=2,
                in_backward=True, nu_factored=True, nu_factored_min_size=1))
        mesh = build_mesh(cfg.mesh)
        init_fn, train_step, _, _ = build_train_step(cfg, mesh)
        state = init_fn(jax.random.PRNGKey(0))
        state, _ = train_step(state, _batch(), jax.random.PRNGKey(3))
        mgr = CheckpointManager(str(tmp_path / "xl"))
        mgr.save(int(state.step), state)
        mgr.wait(); mgr.close()

        params = restore_params_for_inference(str(tmp_path / "xl"))
        for a, b in zip(jax.tree.leaves(params),
                        jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
