"""Test harness: multi-host simulation on CPU.

The reference has no way to exercise distributed code without a real cluster
(SURVEY.md §4); here every test runs against an 8-virtual-device CPU backend
so mesh/FSDP/collective paths are tested on any machine.

Note: the env's sitecustomize force-registers the TPU platform, so
JAX_PLATFORMS must be overridden through jax.config (and XLA_FLAGS set before
backend init). Initializing the CPU backend first also avoids a TPU-client ↔
torch-import thread deadlock observed in this image.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the C++ fastload extension is a build artifact (*.so is gitignored); a
# fresh checkout would silently skip its tests, so build it on demand here
try:
    from video_diffusion_speedrun_tpu.data._native import fastload  # noqa: F401
except ImportError:
    import subprocess

    subprocess.run(
        [sys.executable, "setup.py", "build_ext", "--inplace"],
        cwd=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "video_diffusion_speedrun_tpu", "data", "_native"),
        capture_output=True, check=False,
    )

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# the suite is compile-dominated; persist compiled programs across runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert len(jax.devices()) >= 8, "CPU device-count flag did not take effect"
