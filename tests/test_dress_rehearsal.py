"""Offline dress rehearsal across the CLIs (round-3 VERDICT next #6): the
complete user journey — parquet fixture → precompute_embeddings.py (smoke
encoder) → train.py (cosmos_openvid + embeddings_dir, orbax save) →
sample.py --checkpoint <that run> → decoded frames on disk — as ONE chained
test, each stage consuming the previous stage's real artifacts.

Reference analog: its journey is download.py → train.py → sampling/sample.py
(`/root/reference/README.md:9-21`), which cannot run offline at all; here
only the pretrained weights are stubbed (smoke T5 + random Cosmos decoder),
every format and surface is the production one.
"""

import importlib.util
import io
import json
import os

import numpy as np
import pytest
from click.testing import CliRunner

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_cli(name, path=None):
    spec = importlib.util.spec_from_file_location(
        f"{name}_cli", path or os.path.join(_ROOT, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestDressRehearsal:
    def test_full_user_journey(self, tmp_path):
        torch = pytest.importorskip("torch")
        import datasets as hfds

        # ---- stage 0: the "downloaded dataset" (local parquet fixture of
        # real torch.save latent bytes — the cosmos-openvid wire format)
        rng = np.random.default_rng(0)
        blobs, captions = [], []
        for i in range(120):  # half=60, test=40 -> train=20
            lat = rng.standard_normal((16, 2, 8, 8))
            buf = io.BytesIO()
            torch.save(torch.from_numpy(lat).to(torch.bfloat16), buf)
            blobs.append(buf.getvalue())
            captions.append(f"fixture clip {i}")
        fx = str(tmp_path / "fixture.parquet")
        hfds.Dataset.from_dict(
            {"serialized_latent": blobs, "caption": captions}).to_parquet(fx)
        cache = str(tmp_path / "cache")

        # ---- stage 1: offline embedding precompute (the real producer CLI)
        pre = _load_cli("precompute_embeddings",
                        os.path.join(_ROOT, "scripts",
                                     "precompute_embeddings.py"))
        emb_root = tmp_path / "emb"
        for split in ("train", "test"):
            r = CliRunner().invoke(pre.main, [
                "--split", split, "--hf_name", fx, "--smoke_encoder",
                "--return_index", "-1", "--rows_per_shard", "16",
                "--batch_size", "8", "--out", str(emb_root / split),
                "--cache_dir", cache,
            ], catch_exceptions=False)
            assert r.exit_code == 0, r.output
        man = json.load(open(emb_root / "train" / "manifest.json"))
        assert sum(man["shards"].values()) == 20

        # ---- stage 2: training from those artifacts via the production CLI
        # (real loader + fastload + precomputed context join + orbax save)
        train = _load_cli("train")
        ckpt_root = str(tmp_path / "ckpts")
        r = CliRunner().invoke(train.main, [
            "--max_steps", "6", "--batch_size", "8", "--num_epochs", "8",
            "--model_width", "64", "--model_depth", "2",
            "--model_head_dim", "32", "--context_dim", "64",
            "--evaluate_every", "5", "--log_every", "2",
            "--dataset", "cosmos_openvid", "--hf_name", fx,
            "--cache_dir", cache, "--embeddings_dir", str(emb_root),
            "--allow_random_context", "false",
            "--checkpoint_dir", ckpt_root, "--run_name", "rehearsal",
        ], catch_exceptions=False)
        assert r.exit_code == 0, r.output
        run_dir = os.path.join(ckpt_root, "rehearsal")
        steps = [d for d in os.listdir(run_dir) if d.isdigit()]
        assert "6" in steps, f"no step-6 checkpoint, found {steps}"

        # ---- stage 3: sampling FROM that checkpoint via the production CLI
        # (orbax params-only restore + smoke T5 encode + Euler/CFG + Cosmos
        # decode to frames)
        sample = _load_cli("sample")
        out = str(tmp_path / "out")
        r = CliRunner().invoke(sample.main, [
            "--prompt", "a fixture clip, but cinematic",
            "--checkpoint", run_dir, "--smoke_encoder",
            "--context_dim", "64", "--model_width", "64",
            "--model_depth", "2", "--model_head_dim", "32",
            "--inference_steps", "2", "--height", "32", "--width", "32",
            "--num_latent_frames", "2",
            "--output", out, "--name", "rehearsal",
        ], catch_exceptions=False)
        assert r.exit_code == 0, r.output
        wrote = os.listdir(out)
        assert wrote, "sampler wrote nothing"
        target = os.path.join(out, wrote[0])
        if os.path.isdir(target):  # PNG-frames fallback (no ffmpeg backend)
            assert any(f.endswith(".png") for f in os.listdir(target))
