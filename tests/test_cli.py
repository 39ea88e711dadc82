"""The click CLI entry points, invoked end-to-end.

The reference's primary surface is its train CLI (`train.py:148-212`) and
the sampling pipeline (`sampling/sample.py:77-159`); these tests drive the
flag-compatible equivalents through click's CliRunner on the 8-device CPU
sim so flag→config wiring is covered, not just the Trainer/sampler
internals the other suites exercise.
"""

import importlib.util
import os

import pytest
from click.testing import CliRunner

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_cli(name):
    spec = importlib.util.spec_from_file_location(
        f"{name}_cli", os.path.join(_ROOT, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestTrainCLI:
    def test_tiny_synthetic_run(self):
        mod = _load_cli("train")
        r = CliRunner().invoke(mod.main, [
            "--max_steps", "3", "--batch_size", "8",
            "--model_width", "64", "--model_depth", "2",
            "--model_head_dim", "32", "--evaluate_every", "3",
            "--log_every", "2", "--dataset", "synthetic",
            "--allow_random_context", "true", "--num_epochs", "1",
            # also exercises bf16 moment storage end-to-end (numerics have
            # their own 20-step parity test in test_train_step.py)
            "--moments_dtype", "bf16",
        ], catch_exceptions=False)
        assert r.exit_code == 0, r.output

    def test_optimizer_in_backward_run(self):
        """The north-star XL regime's optimizer launches from the production
        CLI (tiny shapes here; the XL config itself is bench.py --xl)."""
        mod = _load_cli("train")
        r = CliRunner().invoke(mod.main, [
            "--max_steps", "3", "--batch_size", "8",
            "--model_width", "64", "--model_depth", "2",
            "--model_head_dim", "32", "--evaluate_every", "3",
            "--log_every", "2", "--dataset", "synthetic",
            "--allow_random_context", "true", "--num_epochs", "1",
            "--optimizer_in_backward", "true", "--nu_factored", "true",
            "--param_dtype", "fp32", "--moments_dtype", "bf16",
            "--grad_accum", "2",
        ], catch_exceptions=False)
        assert r.exit_code == 0, r.output

    def test_unknown_optimizer_rejected(self):
        mod = _load_cli("train")
        r = CliRunner().invoke(mod.main, [
            "--optimizer_type", "sgd", "--max_steps", "1",
        ])
        assert r.exit_code != 0
        assert "unknown optimizer type" in str(r.output) + str(r.exception)

    def test_bf16_params_require_in_backward_optimizer(self):
        """--param_dtype bf16 with the standard optimizer would make bf16
        the Adam MASTER weights (small updates round away) — rejected
        loudly (code-review finding, round 4)."""
        mod = _load_cli("train")
        r = CliRunner().invoke(mod.main, [
            "--param_dtype", "bf16", "--max_steps", "1",
        ])
        assert r.exit_code != 0
        assert "optimizer_in_backward" in str(r.output) + str(r.exception)


class TestSampleCLI:
    def test_random_weights_smoke(self, tmp_path):
        """Full pipeline: random DiT + random Cosmos decoder → frames on
        disk (PNG fallback in this image — no ffmpeg backend)."""
        mod = _load_cli("sample")
        out = str(tmp_path / "out")
        r = CliRunner().invoke(mod.main, [
            "--prompt", "a test", "--random_weights",
            "--inference_steps", "2", "--height", "32", "--width", "32",
            "--num_latent_frames", "2", "--model_width", "64",
            "--model_depth", "2", "--model_head_dim", "32",
            "--output", out, "--name", "smoke",
        ], catch_exceptions=False)
        assert r.exit_code == 0, r.output
        # mp4 when an encoder backend exists, else a dir of PNG frames
        wrote = os.listdir(out)
        assert wrote, "sampler wrote nothing"
        target = os.path.join(out, wrote[0])
        if os.path.isdir(target):
            assert any(f.endswith(".png") for f in os.listdir(target))
