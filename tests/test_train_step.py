"""Sharded train-step tests on the 8-device CPU mesh — the multi-host
simulation the reference lacks entirely (SURVEY.md §4) — plus the
loss-goes-down smoke (the `run_debug.sh` analog)."""

import jax
import jax.numpy as jnp
import numpy as np

from video_diffusion_speedrun_tpu.core.config import (
    DataConfig,
    DiTConfig,
    MeshConfig,
    OptimizerConfig,
    TrainConfig,
)
from video_diffusion_speedrun_tpu.parallel.mesh import build_mesh
from video_diffusion_speedrun_tpu.train.loss import (
    rectified_flow_loss,
    sample_timesteps,
    time_shift,
)
from video_diffusion_speedrun_tpu.train.step import build_train_step

TINY_MODEL = DiTConfig(
    in_channels=4, patch_size=2, time_patch_size=2, hidden_size=64, depth=2,
    num_heads=2, cross_attn_input_size=32, residual_v=True,
    train_bias_and_rms=True, attention_impl="xla", compute_dtype=jnp.float32,
)

TINY = TrainConfig(
    model=TINY_MODEL,
    mesh=MeshConfig(replica=1, fsdp=8, tensor=1),
    optimizer=OptimizerConfig(learning_rate=0.01, scheduler="constant",
                              warmup_steps=2),
    batch_size=8,
    max_steps=50,
    seed=0,
)


def _batch(rng, b=8):
    kl, kc = jax.random.split(rng)
    return {
        "latent": jax.random.normal(kl, (b, 4, 4, 8, 8), jnp.float32),
        "context": jax.random.normal(kc, (b, 6, 32), jnp.float32),
    }


class TestLoss:
    def test_time_shift(self):
        # α=8 shift (`train.py:95-96`): t=0.5 → 0.5·8/(1+7·0.5) = 8/9
        assert np.isclose(float(time_shift(jnp.array(0.5), 8.0)), 8 / 9)
        assert float(time_shift(jnp.array(0.0), 8.0)) == 0.0
        assert float(time_shift(jnp.array(1.0), 8.0)) == 1.0

    def test_timestep_distribution_shifted_to_noise(self):
        t = sample_timesteps(jax.random.PRNGKey(0), 4096, 8.0)
        # logit-normal has mean .5; α=8 shift pushes mass toward t=1 (noise)
        assert float(jnp.mean(t)) > 0.75
        assert float(jnp.min(t)) >= 0.0 and float(jnp.max(t)) <= 1.0

    def test_loss_at_init_near_two(self):
        """Zero-init head → output 0 → loss = E[(x − noise)²] ≈ 2 for unit
        gaussian latents and noise."""
        import video_diffusion_speedrun_tpu.models.dit as dit_mod

        params = dit_mod.init_dit(jax.random.PRNGKey(0), TINY_MODEL)
        batch = _batch(jax.random.PRNGKey(1), b=32)
        loss, _ = rectified_flow_loss(
            params, TINY_MODEL, batch["latent"], batch["context"],
            jax.random.PRNGKey(2),
        )
        assert 1.6 < float(loss) < 2.4

    def test_fixture_injection(self):
        """Explicit timesteps/noise (CAPTURE_INPUT analog) make the loss
        deterministic across calls except rope offsets."""
        import video_diffusion_speedrun_tpu.models.dit as dit_mod

        params = dit_mod.init_dit(jax.random.PRNGKey(0), TINY_MODEL)
        batch = _batch(jax.random.PRNGKey(1), b=4)
        ts = jnp.full((4,), 0.7)
        noise = jnp.ones_like(batch["latent"])
        l1, _ = rectified_flow_loss(
            params, TINY_MODEL, batch["latent"], batch["context"],
            jax.random.PRNGKey(5), timesteps=ts, noise=noise,
            caption_dropout=0.0,
        )
        l2, _ = rectified_flow_loss(
            params, TINY_MODEL, batch["latent"], batch["context"],
            jax.random.PRNGKey(5), timesteps=ts, noise=noise,
            caption_dropout=0.0,
        )
        assert float(l1) == float(l2)


class TestTrainStep:
    def test_loss_decreases_smoke(self):
        """The end-to-end slice: tiny DiT + synthetic latents + sharded train
        step on 8 CPU devices; loss must drop (run_debug.sh analog)."""
        mesh = build_mesh(TINY.mesh)
        init_fn, train_step, eval_step, settings = build_train_step(TINY, mesh)
        state = init_fn(jax.random.PRNGKey(0))

        losses = []
        rng = jax.random.PRNGKey(42)  # base rng; the step folds in state.step
        batch = _batch(jax.random.PRNGKey(7))
        for i in range(60):
            state, metrics = train_step(state, batch, rng)
            losses.append(float(metrics["loss"]))
        # fixed batch, fresh (t, noise) per step: loss must trend down
        assert np.mean(losses[-10:]) < np.mean(losses[:10]) - 0.1, (
            losses[:10], losses[-10:])

    def test_params_actually_sharded(self):
        mesh = build_mesh(TINY.mesh)
        init_fn, *_ = build_train_step(TINY, mesh)
        state = init_fn(jax.random.PRNGKey(0))
        qkv = state.params["blocks"]["qkv"]["weight"]
        # [depth, D, 3D] sharded on fsdp: 8 shards
        assert len(qkv.sharding.device_set) == 8
        assert not qkv.sharding.is_fully_replicated
        # adam moments sharded identically
        mu_qkv = state.opt_state.adam.mu["blocks"]["qkv"]["weight"]
        assert mu_qkv.sharding == qkv.sharding

    def test_eval_step_deterministic(self):
        mesh = build_mesh(TINY.mesh)
        init_fn, _, eval_step, _ = build_train_step(TINY, mesh)
        state = init_fn(jax.random.PRNGKey(0))
        batch = _batch(jax.random.PRNGKey(3))
        m1 = eval_step(state.params, batch, jax.random.PRNGKey(9))
        m2 = eval_step(state.params, batch, jax.random.PRNGKey(9))
        assert float(m1["loss"]) == float(m2["loss"])

    def test_replica_axis_mesh(self):
        """HSDP-style (replica=2, fsdp=4) mesh also trains (the reference's
        scaffolded-but-disabled dp_replicate axis, `model.py:476-478`)."""
        cfg = TrainConfig(
            model=TINY_MODEL, mesh=MeshConfig(replica=2, fsdp=4, tensor=1),
            optimizer=TINY.optimizer, batch_size=8, max_steps=50, seed=0,
        )
        mesh = build_mesh(cfg.mesh)
        init_fn, train_step, _, _ = build_train_step(cfg, mesh)
        state = init_fn(jax.random.PRNGKey(0))
        state, metrics = train_step(state, _batch(jax.random.PRNGKey(7)),
                                    jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))

    def test_tensor_axis_mesh(self):
        """TP axis (tensor=2) — beyond the reference, which hardcodes tp=1
        (`model.py:476`)."""
        cfg = TrainConfig(
            model=TINY_MODEL, mesh=MeshConfig(replica=1, fsdp=4, tensor=2),
            optimizer=TINY.optimizer, batch_size=8, max_steps=50, seed=0,
        )
        mesh = build_mesh(cfg.mesh)
        init_fn, train_step, _, _ = build_train_step(cfg, mesh)
        state = init_fn(jax.random.PRNGKey(0))
        state, metrics = train_step(state, _batch(jax.random.PRNGKey(7)),
                                    jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))

    def test_context_parallel_mesh(self):
        """Sequence parallelism: tokens sharded over a context axis — a
        capability the reference lacks entirely (SURVEY.md §2b)."""
        cfg = TrainConfig(
            model=TINY_MODEL,
            mesh=MeshConfig(replica=1, fsdp=2, context=2, tensor=2),
            optimizer=TINY.optimizer, batch_size=4, max_steps=50, seed=0,
        )
        mesh = build_mesh(cfg.mesh)
        init_fn, train_step, _, _ = build_train_step(cfg, mesh)
        state = init_fn(jax.random.PRNGKey(0))
        batch = {
            "latent": jax.random.normal(jax.random.PRNGKey(1), (4, 4, 4, 8, 8)),
            "context": jax.random.normal(jax.random.PRNGKey(2), (4, 6, 32)),
        }
        state, metrics = train_step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))

    def test_context_parallel_matches_unsharded(self):
        """CP must be numerically equivalent to the unsharded step."""
        batch = {
            "latent": jax.random.normal(jax.random.PRNGKey(1), (4, 4, 4, 8, 8)),
            "context": jax.random.normal(jax.random.PRNGKey(2), (4, 6, 32)),
        }
        losses = {}
        for name, mesh_cfg, devs in [
            ("plain", MeshConfig(replica=1, fsdp=4, context=1, tensor=1),
             jax.devices()[:4]),
            ("cp", MeshConfig(replica=1, fsdp=2, context=2, tensor=1),
             jax.devices()[:4]),
        ]:
            cfg = TrainConfig(model=TINY_MODEL, mesh=mesh_cfg,
                              optimizer=TINY.optimizer, batch_size=4,
                              max_steps=50, seed=0)
            mesh = build_mesh(cfg.mesh, devices=devs)
            init_fn, train_step, _, _ = build_train_step(cfg, mesh)
            state = init_fn(jax.random.PRNGKey(0))
            _, metrics = train_step(state, batch, jax.random.PRNGKey(1))
            losses[name] = float(metrics["loss"])
        assert np.isclose(losses["plain"], losses["cp"], rtol=1e-5), losses

    def test_grad_accum_matches_full_batch(self):
        """grad_accum=2 must produce (numerically) the same update as the
        full-batch step: the loss is a per-sample mean, so microbatch-mean
        of grads == full-batch grads."""
        batch = _batch(jax.random.PRNGKey(7))
        states = {}
        for name, accum in [("full", 1), ("accum", 2)]:
            cfg = TrainConfig(
                model=TINY_MODEL, mesh=MeshConfig(replica=1, fsdp=8),
                optimizer=TINY.optimizer, batch_size=8, max_steps=50,
                seed=0, grad_accum=accum, caption_dropout=0.0,
            )
            mesh = build_mesh(cfg.mesh)
            init_fn, train_step, _, _ = build_train_step(cfg, mesh)
            state = init_fn(jax.random.PRNGKey(0))
            state, m = train_step(state, batch, jax.random.PRNGKey(1))
            states[name] = (state, float(m["loss"]))
        # NOTE: t/noise differ (rng per microbatch), so exact loss equality
        # is not expected — but both must be finite and the mechanism sound:
        for name, (state, loss) in states.items():
            assert np.isfinite(loss), name

    def test_grad_accum_exact_with_fixed_randomness(self):
        """accumulate_grads(accum=2) must EXACTLY equal the manual average of
        two half-batch grads computed with the same per-microbatch rngs."""
        from video_diffusion_speedrun_tpu.models.dit import init_dit
        from video_diffusion_speedrun_tpu.train.loss import (
            rectified_flow_loss,
        )
        from video_diffusion_speedrun_tpu.train.step import accumulate_grads

        params = init_dit(jax.random.PRNGKey(0), TINY_MODEL)
        batch = _batch(jax.random.PRNGKey(7))
        rng = jax.random.PRNGKey(3)
        rngs = jax.random.split(rng, 2)

        def loss_fn(p, mb, r):
            return rectified_flow_loss(
                p, TINY_MODEL, mb["latent"], mb["context"], r,
                caption_dropout=0.0,
            )

        (loss_acc, aux_acc), g_acc = accumulate_grads(
            loss_fn, params, batch, rng, 2)

        losses, g_sum = [], None
        for i in range(2):
            mb = {k: v[i * 4:(i + 1) * 4] for k, v in batch.items()}
            (l, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, mb, rngs[i])
            losses.append(float(l))
            g_sum = g if g_sum is None else jax.tree.map(jnp.add, g_sum, g)
        g_manual = jax.tree.map(lambda x: x / 2, g_sum)

        assert np.isclose(float(loss_acc), np.mean(losses), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(g_acc), jax.tree.leaves(g_manual)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6, rtol=1e-5)
        # aux re-flattened to full-batch shape
        assert aux_acc["loss_per_sample"].shape == (8,)
        assert aux_acc["timesteps"].shape == (8,)


class TestMomentsDtype:
    def test_bf16_moments_track_fp32_over_20_steps(self):
        """bf16 Adam-moment storage (the XL one-chip regime) vs fp32
        moments, 20 full train steps on identical data: the loss curves
        must stay close (moment MATH is fp32 either way; only storage
        rounds). Round-2 VERDICT #1's parity condition."""
        mesh = build_mesh(TINY.mesh)
        import dataclasses

        cfg32 = TINY
        cfg16 = dataclasses.replace(
            TINY, optimizer=dataclasses.replace(
                TINY.optimizer, moments_dtype=jnp.bfloat16))

        losses = {}
        for name, cfg in (("fp32", cfg32), ("bf16", cfg16)):
            init_fn, train_step, _, _ = build_train_step(cfg, mesh)
            state = init_fn(jax.random.PRNGKey(0))
            if name == "bf16":
                mu = state.opt_state.adam.mu["blocks"]["qkv"]["weight"]
                assert mu.dtype == jnp.bfloat16
            rng = jax.random.PRNGKey(42)
            batch = _batch(jax.random.PRNGKey(7))
            ls = []
            for _ in range(20):
                state, m = train_step(state, batch, rng)
                ls.append(float(m["loss"]))
            losses[name] = np.asarray(ls)
        # identical rng/data: same trajectory up to bf16 storage rounding
        np.testing.assert_allclose(losses["bf16"], losses["fp32"],
                                   rtol=0.02, atol=0.02)
        assert losses["bf16"][-1] < losses["bf16"][0]
