"""Real 2-process JAX cluster rehearsal on CPU (2 hosts × 4 virtual devices).

Every earlier-round test ran `jax.process_count() == 1`, so the
multi-process branches — `make_array_from_process_local_data` with >1
process (data/loader.py device_prefetch), `avg_scalar_across_hosts` /
`barrier` (parallel/collectives.py), the eval-clamp lcm logic
(train/loop.py), `CoordinatedShapeBucketingCollate`'s cross-host shape
schedule, and multi-process orbax save/restore — were only ever exercised
down their single-process sides (round-4 VERDICT weak #4). This script
drives the REAL thing: `jax.distributed.initialize` over two local
processes (the JAX analog of the reference's `torchrun --nproc-per-node`
launch, `/root/reference/run_debug.sh:12`, `train.py:214-220`), each
process backed by 4 virtual CPU devices, and asserts the training loss
trajectory (train steps, eval, checkpoint save, restore-and-continue)
MATCHES the 1-process 8-device run of the identical config.

Usage:
    python scripts/run_multihost_sim.py            # full matrix -> MULTIHOST JSON
    python scripts/run_multihost_sim.py worker ... # internal

The pytest wrapper (tests/test_multihost.py) runs the parity phase.
"""

import json
import os
import socket
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = int(os.environ.get("VDS_MH_STEPS", "5"))
RESUME_STEPS = int(os.environ.get("VDS_MH_RESUME_STEPS", "2"))
BATCH = 16


def _worker(port: int, pid: int, nproc: int, outdir: str, bucket: bool):
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nproc, process_id=pid)
        assert jax.process_count() == nproc
    assert jax.device_count() == 8, jax.device_count()

    # host-collective smoke: these run their multi-process branches only here
    from video_diffusion_speedrun_tpu.parallel.collectives import (
        avg_scalar_across_hosts, barrier,
    )

    avg = avg_scalar_across_hosts(float(jax.process_index()))
    expect = sum(range(nproc)) / nproc
    assert abs(avg - expect) < 1e-6, (avg, expect)
    barrier("worker-start")

    import jax.numpy as jnp

    from video_diffusion_speedrun_tpu.core.config import (
        DataConfig, DiTConfig, MeshConfig, OptimizerConfig, TrainConfig,
    )
    from video_diffusion_speedrun_tpu.train.loop import Trainer

    model = DiTConfig(
        in_channels=4, patch_size=2, time_patch_size=2, hidden_size=64,
        depth=2, num_heads=2, cross_attn_input_size=32, residual_v=True,
        train_bias_and_rms=True, attention_impl="xla",
        compute_dtype=jnp.float32,
    )
    data = DataConfig(
        dataset="synthetic", synthetic_rows=64, test_rows=12,
        synthetic_shape=(4, 4, 8, 8), caption_tokens=6, context_dim=32,
        num_workers=2, prefetch=2,
        synthetic_t_choices=(8,) if bucket else (),
        bucket_by_shape=bucket,
    )
    cfg = TrainConfig(
        model=model, mesh=MeshConfig(fsdp=-1), data=data,
        optimizer=OptimizerConfig(learning_rate=1e-2, scheduler="linear",
                                  warmup_steps=2),
        batch_size=BATCH, max_steps=STEPS, evaluate_every=4, eval_batches=2,
        log_every=1, seed=0, run_name="phase1", checkpoint_dir=outdir,
        wandb=False,
    )
    Trainer(cfg).train()
    barrier("phase1-done")

    if bucket:
        return

    # restore the phase-1 checkpoint (multi-process orbax restore) and
    # continue: the resumed trajectory is compared against the other
    # process layout by the orchestrator
    import dataclasses

    cfg2 = dataclasses.replace(
        cfg, run_name="resume", max_steps=STEPS + RESUME_STEPS,
        load_checkpoint=os.path.join(outdir, "phase1"))
    Trainer(cfg2).train()
    barrier("resume-done")


def _read_losses(outdir: str, run: str):
    path = os.path.join(outdir, run, "metrics.jsonl")
    train, evals = {}, {}
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if "train/diffusion_loss" in rec:
                train[rec["step"]] = rec["train/diffusion_loss"]
            if "test/total_loss" in rec:
                evals[rec["step"]] = rec["test/total_loss"]
    return train, evals


def _spawn(nproc: int, outdir: str, bucket: bool = False):
    port = None
    if nproc > 1:
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + f" --xla_force_host_platform_device_count="
                              f"{8 // nproc}").strip()
        args = [sys.executable, os.path.abspath(__file__), "worker",
                str(port or 0), str(pid), str(nproc), outdir]
        if bucket:
            args.append("--bucket")
        procs.append(subprocess.Popen(
            args, env=env, cwd=os.path.dirname(env["PWD"])
            if False else None,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs, rcs = [], []
    deadline = time.monotonic() + 1200
    for p in procs:
        try:
            out, _ = p.communicate(timeout=max(10, deadline - time.monotonic()))
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            out += "\n<TIMEOUT>"
        outs.append(out)
        rcs.append(p.returncode)
    return rcs, outs


def run_parity(base: str):
    """Uniform-shape phase: 2×4 vs 1×8 must produce the same trajectory."""
    d2 = os.path.join(base, "p2")
    d1 = os.path.join(base, "p1")
    os.makedirs(d2, exist_ok=True)
    os.makedirs(d1, exist_ok=True)
    rcs2, outs2 = _spawn(2, d2)
    assert rcs2 == [0, 0], "2-process run failed:\n" + "\n".join(outs2)
    rcs1, outs1 = _spawn(1, d1)
    assert rcs1 == [0], "1-process run failed:\n" + "\n".join(outs1)

    result = {"phases": {}}
    for run in ("phase1", "resume"):
        t2, e2 = _read_losses(d2, run)
        t1, e1 = _read_losses(d1, run)
        assert set(t2) == set(t1) and set(e2) == set(e1), (t2, t1, e2, e1)
        dt = max(abs(t2[s] - t1[s]) / max(abs(t1[s]), 1e-9) for s in t1)
        de = max((abs(e2[s] - e1[s]) / max(abs(e1[s]), 1e-9) for s in e1),
                 default=0.0)  # the resume tail ends before the next eval
        assert dt < 5e-5 and de < 5e-5, (run, dt, de, t2, t1)
        result["phases"][run] = {
            "train_steps": len(t1), "evals": len(e1),
            "max_rel_train_loss_diff_2proc_vs_1proc": dt,
            "max_rel_eval_loss_diff_2proc_vs_1proc": de,
            "losses_1proc": t1,
        }
    return result


def run_bucketing(base: str):
    """Mixed-shape phase under CoordinatedShapeBucketingCollate, 2-process:
    batch composition is buffer-timing-dependent so no cross-layout loss
    parity — the assertion is that both hosts follow the shared shape
    schedule (the run completes; desync would hang or crash the compiled
    program) and losses are finite."""
    d = os.path.join(base, "bucket2")
    os.makedirs(d, exist_ok=True)
    rcs, outs = _spawn(2, d, bucket=True)
    assert rcs == [0, 0], "bucketing run failed:\n" + "\n".join(outs)
    t, e = _read_losses(d, "phase1")
    import math

    assert t and all(math.isfinite(v) for v in t.values()), t
    return {"train_steps": len(t), "evals": len(e), "finite": True}


def main():
    base = os.environ.get("VDS_MULTIHOST_DIR", "/tmp/vds_multihost")
    result = {"config": {"processes": 2, "devices_per_process": 4,
                         "global_batch": BATCH, "steps": STEPS,
                         "resume_steps": RESUME_STEPS}}
    result.update(run_parity(base))
    if os.environ.get("VDS_MH_PHASES", "all") == "all":
        result["bucketing_2proc"] = run_bucketing(base)
    out = json.dumps(result)
    print(out)
    with open("MULTIHOST_r05.json", "w") as f:
        f.write(out + "\n")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        _worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
                sys.argv[5], "--bucket" in sys.argv)
    else:
        main()
