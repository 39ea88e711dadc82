"""Optimizer-in-backward step (train/inloop.py) vs the standard
value_and_grad + fused_apply step: identical math, so multi-step
trajectories must match to accumulation-order noise. Plus the fp8
second-moment storage option's 20-step loss tracking.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from video_diffusion_speedrun_tpu.core.config import (
    DiTConfig, OptimizerConfig,
)
from video_diffusion_speedrun_tpu.models.dit import init_dit
from video_diffusion_speedrun_tpu.train.inloop import build_inloop_step
from video_diffusion_speedrun_tpu.train.loss import rectified_flow_loss
from video_diffusion_speedrun_tpu.train.optim import (
    build_optimizer, fused_apply,
)

CFG = DiTConfig(
    in_channels=4, patch_size=2, time_patch_size=2, hidden_size=64, depth=3,
    num_heads=2, cross_attn_input_size=32, residual_v=True,
    train_bias_and_rms=True, attention_impl="xla", compute_dtype=jnp.float32,
    scan_blocks=True, remat=False,
)
OCFG = OptimizerConfig(learning_rate=0.01, scheduler="constant",
                       warmup_steps=2)


def _data(b=2):
    lat = jax.random.normal(jax.random.PRNGKey(1), (b, 4, 4, 8, 8),
                            jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (b, 6, 32), jnp.float32)
    return lat, ctx


def _standard_step(cfg, ocfg):
    params0 = init_dit(jax.random.PRNGKey(0), cfg, 0.1)
    tx, _, schedule, tx_args = build_optimizer(
        jax.eval_shape(lambda: params0), ocfg.learning_rate, 1000, ocfg)
    opt0 = tx.init(params0)

    def loss_fn(p, lat, ctx, rng):
        l, _ = rectified_flow_loss(p, cfg, lat, ctx, rng)
        return l

    @jax.jit
    def step(p, o, lat, ctx, rng):
        loss, grads = jax.value_and_grad(loss_fn)(p, lat, ctx, rng)
        p2, o2 = fused_apply(tx_args, grads, o, p)
        return p2, o2, loss

    return params0, opt0, step


class TestInloopStep:
    def test_matches_standard_step_trajectory(self):
        lat, ctx = _data()
        params_s, opt_s, step_s = _standard_step(CFG, OCFG)

        params_i = init_dit(jax.random.PRNGKey(0), CFG, 0.1)
        init_opt, step_i_fn, _ = build_inloop_step(
            CFG, OCFG, jax.eval_shape(lambda: params_i), max_steps=1000)
        opt_i = init_opt(params_i)
        step_i = jax.jit(step_i_fn)

        for k in range(3):
            rng = jax.random.PRNGKey(100 + k)
            params_s, opt_s, loss_s = step_s(params_s, opt_s, lat, ctx, rng)
            params_i, opt_i, loss_i, _ = step_i(params_i, opt_i, lat, ctx, rng)
            np.testing.assert_allclose(float(loss_i), float(loss_s),
                                       rtol=1e-5, err_msg=f"step {k}")

        flat_s = jax.tree.leaves(params_s)
        flat_i = jax.tree.leaves(params_i)
        for a, b in zip(flat_i, flat_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5, rtol=1e-4)
        # moments too (mu only: nu identical by same argument)
        for a, b in zip(jax.tree.leaves(opt_i.mu),
                        jax.tree.leaves(opt_s.adam.mu)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5, rtol=1e-4)

    def test_factored_nu_tracks_exact_losses(self):
        """Factored second moment (Adafactor rank-1, momentum exact): the
        loss trajectory over 20 steps must track the exact-nu run
        closely."""
        from video_diffusion_speedrun_tpu.train.inloop import FNu

        lat, ctx = _data()
        runs = {}
        for name, fac in (("exact", False), ("factored", True)):
            params = init_dit(jax.random.PRNGKey(0), CFG, 0.1)
            init_opt, step_fn, _ = build_inloop_step(
                CFG, OCFG, jax.eval_shape(lambda: params), max_steps=1000,
                nu_factored=fac, nu_factored_min_size=1,
            )
            opt = init_opt(params)
            if fac:
                q = opt.nu["blocks"]["qkv"]["weight"]
                assert isinstance(q, FNu)
                w = params["blocks"]["qkv"]["weight"]
                assert q.vr.shape == w.shape[:-1]
                assert q.vc.shape == w.shape[:-2] + w.shape[-1:]
            step = jax.jit(step_fn)
            losses = []
            for k in range(20):
                params, opt, loss, _ = step(params, opt, lat, ctx,
                                            jax.random.PRNGKey(100 + k))
                losses.append(float(loss))
            runs[name] = np.asarray(losses)
        assert runs["factored"][-1] < runs["factored"][0]
        np.testing.assert_allclose(runs["factored"], runs["exact"],
                                   rtol=0.05, atol=0.05)

    def test_grad_accum_chunked_backward_is_exact(self):
        """grad_accum in the inloop step chunks each block's vjp along the
        batch axis (a backward-memory knob) — unlike the standard step's
        per-microbatch rng, the gradients are exactly the full-batch ones,
        so the whole trajectory must match grad_accum=1."""
        lat, ctx = _data(b=4)
        runs = {}
        for name, ga in (("whole", 1), ("chunked", 2)):
            params = init_dit(jax.random.PRNGKey(0), CFG, 0.1)
            init_opt, step_fn, _ = build_inloop_step(
                CFG, OCFG, jax.eval_shape(lambda: params), max_steps=1000,
                grad_accum=ga)
            opt = init_opt(params)
            step = jax.jit(step_fn)
            for k in range(2):
                params, opt, loss, _ = step(params, opt, lat, ctx,
                                            jax.random.PRNGKey(50 + k))
            runs[name] = params
        for a, b in zip(jax.tree.leaves(runs["whole"]),
                        jax.tree.leaves(runs["chunked"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, rtol=1e-5)

    def test_unrolled_equivalence_with_remat_model(self):
        """inloop vs standard with the production-ish flags (remat on in the
        standard model — inloop's per-block vjp IS the remat)."""
        cfg = dataclasses.replace(CFG, remat=True)
        lat, ctx = _data()
        params_s, opt_s, step_s = _standard_step(cfg, OCFG)
        params_i = init_dit(jax.random.PRNGKey(0), cfg, 0.1)
        init_opt, step_fn, _ = build_inloop_step(
            cfg, OCFG, jax.eval_shape(lambda: params_i), max_steps=1000)
        opt_i = init_opt(params_i)
        step_i = jax.jit(step_fn)
        rng = jax.random.PRNGKey(7)
        _, _, loss_s = step_s(params_s, opt_s, lat, ctx, rng)
        _, _, loss_i, _ = step_i(params_i, opt_i, lat, ctx, rng)
        np.testing.assert_allclose(float(loss_i), float(loss_s), rtol=1e-5)


class TestInloopProductionStep:
    """build_train_step with optimizer.in_backward: the production wrapper
    (TrainState interface, sharded over the mesh, metrics parity) around
    the fused reverse-scan step — round-3 VERDICT next #1."""

    def _build(self, in_backward, **okw):
        from video_diffusion_speedrun_tpu.core.config import (
            MeshConfig, TrainConfig,
        )
        from video_diffusion_speedrun_tpu.parallel.mesh import build_mesh
        from video_diffusion_speedrun_tpu.train.step import build_train_step

        cfg = TrainConfig(
            model=CFG, mesh=MeshConfig(replica=1, fsdp=8),
            optimizer=dataclasses.replace(OCFG, in_backward=in_backward,
                                          **okw),
            batch_size=8, max_steps=100, seed=0,
        )
        mesh = build_mesh(cfg.mesh)
        return build_train_step(cfg, mesh)

    def test_matches_standard_production_step(self):
        lat, ctx = _data(b=8)
        batch = {"latent": lat, "context": ctx}
        out = {}
        for ib in (False, True):
            init_fn, train_step, eval_step, _ = self._build(ib)
            state = init_fn(jax.random.PRNGKey(0))
            losses, lrs = [], []
            for _ in range(3):
                state, m = train_step(state, batch, jax.random.PRNGKey(9))
                losses.append(float(m["loss"]))
                lrs.append(float(m["lr_scale"]))
                assert np.isfinite(np.asarray(m["bin_sums"])).all()
            ev = eval_step(state.params, batch, jax.random.PRNGKey(4))
            out[ib] = (losses, lrs, state, float(ev["loss"]))

        np.testing.assert_allclose(out[True][0], out[False][0], rtol=1e-5)
        assert out[True][1] == out[False][1]  # schedule identical
        for a, b in zip(jax.tree.leaves(out[True][2].params),
                        jax.tree.leaves(out[False][2].params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(out[True][3], out[False][3], rtol=1e-5)

    def test_factored_sharded_grad_accum_step(self):
        """All production knobs at once on the 8-dev mesh: in_backward +
        factored nu + grad_accum; loss decreases and the FNu leaves live in
        the TrainState (the shape orbax will checkpoint)."""
        from video_diffusion_speedrun_tpu.train.inloop import FNu

        lat, ctx = _data(b=8)
        batch = {"latent": lat, "context": ctx}
        init_fn, train_step, _, _ = self._build(
            True, nu_factored=True, nu_factored_min_size=1)
        # grad_accum lives on TrainConfig; rebuild with it set
        from video_diffusion_speedrun_tpu.core.config import (
            MeshConfig, TrainConfig,
        )
        from video_diffusion_speedrun_tpu.parallel.mesh import build_mesh
        from video_diffusion_speedrun_tpu.train.step import build_train_step

        cfg = TrainConfig(
            model=CFG, mesh=MeshConfig(replica=1, fsdp=8),
            optimizer=dataclasses.replace(
                OCFG, in_backward=True, nu_factored=True,
                nu_factored_min_size=1),
            batch_size=8, max_steps=100, seed=0, grad_accum=2,
        )
        mesh = build_mesh(cfg.mesh)
        init_fn, train_step, _, _ = build_train_step(cfg, mesh)
        state = init_fn(jax.random.PRNGKey(0))
        assert isinstance(state.opt_state.nu["blocks"]["qkv"]["weight"], FNu)
        losses = []
        for k in range(4):
            state, m = train_step(state, batch, jax.random.PRNGKey(3))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0]
        assert int(state.opt_state.count) == 4
        assert int(state.step) == 4

    def test_rejects_unsupported_configs(self):
        import pytest

        from video_diffusion_speedrun_tpu.core.config import (
            MeshConfig, TrainConfig,
        )
        from video_diffusion_speedrun_tpu.parallel.mesh import build_mesh
        from video_diffusion_speedrun_tpu.train.step import build_train_step

        cfg = TrainConfig(
            model=CFG, mesh=MeshConfig(replica=1, fsdp=4, context=2),
            optimizer=dataclasses.replace(OCFG, in_backward=True),
            batch_size=8, max_steps=100, seed=0,
        )
        with pytest.raises(NotImplementedError, match="context"):
            build_train_step(cfg, build_mesh(cfg.mesh))

        cfg = TrainConfig(
            model=CFG, mesh=MeshConfig(replica=1, fsdp=8),
            optimizer=dataclasses.replace(OCFG, in_backward=True),
            batch_size=8, max_steps=100, seed=0, log_grad_norm=True,
        )
        with pytest.raises(ValueError, match="grad_norm"):
            build_train_step(cfg, build_mesh(cfg.mesh))
