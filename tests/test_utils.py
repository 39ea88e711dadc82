"""utils/ units: FLOP model edge cases and the StepTimer's compile-excluding
first window."""

import time

import jax.numpy as jnp

from video_diffusion_speedrun_tpu.core.config import DiTConfig
from video_diffusion_speedrun_tpu.utils.flops import (
    dit_forward_flops,
    dit_train_flops,
)
from video_diffusion_speedrun_tpu.utils.logging import StepTimer


class TestFlops:
    def test_no_cross_attention_config(self):
        """cross_attn_input_size=None must be gated like the model gates it
        (models/dit.py:311), not TypeError."""
        cfg = DiTConfig(hidden_size=64, depth=2, num_heads=2,
                        cross_attn_input_size=None)
        with_cross = DiTConfig(hidden_size=64, depth=2, num_heads=2,
                               cross_attn_input_size=32)
        f_no = dit_forward_flops(cfg, 1, 4, 16, 16)
        f_yes = dit_forward_flops(with_cross, 1, 4, 16, 16)
        assert 0 < f_no < f_yes
        assert dit_train_flops(cfg, 1, 4, 16, 16) == 3.0 * f_no


class TestStepTimer:
    def test_first_window_excludes_pre_first_tick_time(self):
        """The interval between construction and the first tick (= step-0
        jit compile + loader startup in the train loop) must never enter an
        average: the first reported avg would otherwise read seconds."""
        timer = StepTimer(every=2)
        time.sleep(0.2)  # stand-in for compile time
        assert timer.tick() is None          # step 1: starts the window
        assert timer.tick() is not None      # step 2: first (1-step) window
        assert timer.avg_ms < 150, timer.avg_ms  # sleep excluded

    def test_steady_state_cadence(self):
        timer = StepTimer(every=3)
        reports = [timer.tick() for _ in range(10)]
        # report at global ticks 3, 6, 9 (the every-aligned ticks)
        assert [r is not None for r in reports] == [
            False, False, True, False, False, True, False, False, True, False
        ]
