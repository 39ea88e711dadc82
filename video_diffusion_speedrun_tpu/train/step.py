"""Jitted, sharded train / eval steps.

TPU-native core of the reference train loop body (`/root/reference/
train.py:403-434`): one `jax.jit`-compiled SPMD program per step —
loss + backward (GSPMD reduce-scatters grads over `fsdp`), fused muP-AdamW
update, schedule step — with the train state donated (in-place HBM update,
the XLA analog of fused-optimizer + zero_grad(set_to_none)). Metric
cross-replica averaging (`utils.py:11-15`) falls out of the sharded mean.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from video_diffusion_speedrun_tpu.core.config import TrainConfig
from video_diffusion_speedrun_tpu.models.dit import init_dit
from video_diffusion_speedrun_tpu.parallel.fsdp import param_shardings
from video_diffusion_speedrun_tpu.parallel.mesh import (
    AXIS_CONTEXT,
    DATA_AXES,
    token_pspec,
)
from video_diffusion_speedrun_tpu.train.loss import rectified_flow_loss
from video_diffusion_speedrun_tpu.train.optim import (
    MupAdamWState,
    build_optimizer,
    fused_apply,
)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def accumulate_grads(loss_fn, params, batch, rng, accum: int):
    """Gradient accumulation: batch reshaped to [accum, micro, ...] and
    scanned; grads/loss are microbatch means (≡ the full-batch mean since the
    loss is a per-sample mean), bin sums/counts are summed, and per-sample aux
    arrays are re-flattened to full-batch shape. Each microbatch folds its
    index into the rng."""
    micro = jax.tree.map(
        lambda x: x.reshape(accum, x.shape[0] // accum, *x.shape[1:]), batch
    )
    rngs = jax.random.split(rng, accum)
    zero_grads = jax.tree.map(jnp.zeros_like, params)

    def body(carry, mb_rng):
        loss_sum, grad_sum = carry
        mb, r = mb_rng
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, mb, r
        )
        carry = (loss_sum + loss, jax.tree.map(jnp.add, grad_sum, grads))
        return carry, aux

    (loss_sum, grad_sum), aux_stack = jax.lax.scan(
        body, (jnp.zeros(()), zero_grads), (micro, rngs)
    )
    inv = 1.0 / accum
    aux = {
        "bin_sums": aux_stack["bin_sums"].sum(0),
        "bin_counts": aux_stack["bin_counts"].sum(0),
        "loss_per_sample": aux_stack["loss_per_sample"].reshape(-1),
        "timesteps": aux_stack["timesteps"].reshape(-1),
    }
    grads = jax.tree.map(lambda g: g * inv, grad_sum)
    return (loss_sum * inv, aux), grads


def state_shardings(params_shd: Any, mesh: Mesh) -> TrainState:
    """Shardings for TrainState: Adam moments mirror the param shardings
    (sharded optimizer state = ZeRO); counters replicate."""
    repl = NamedSharding(mesh, P())
    return TrainState(
        params=params_shd,
        opt_state=MupAdamWState(
            count=repl,
            adam=optax.ScaleByAdamState(count=repl, mu=params_shd, nu=params_shd),
        ),
        step=repl,
    )


def batch_shardings(mesh: Mesh, device_context: bool = False
                    ) -> Dict[str, NamedSharding]:
    data = NamedSharding(mesh, P(DATA_AXES))
    if device_context:
        return {"latent": data}
    return {"latent": data, "context": data}


def build_train_step(cfg: TrainConfig, mesh: Mesh, *,
                     device_context: bool = False):
    """Returns (init_fn, train_step, eval_step, settings).

    init_fn(rng) → TrainState, sharded over the mesh.
    train_step(state, batch, rng) → (state, metrics); jitted, state donated.
    eval_step(params, batch, rng) → metrics; deterministic per explicit rng,
      mirroring the reference's seeded eval generator (`train.py:506`).

    `device_context=True` (synthetic-data runs without a prompt encoder):
    batches carry only `latent`; the 512×4096 context is generated on-device
    inside the jitted step from the step rng. Streaming that context from
    host measured 32 MB/step through the chip tunnel — the dominant cost of
    the real-hardware loop in round 1 (PERFORMANCE.md "Production loop").
    """
    mcfg = cfg.model

    def _make_params(rng):
        return init_dit(rng, mcfg, init_std_factor=cfg.init_std_factor,
                        dtype=mcfg.param_dtype)

    # Abstract params (shapes only) for optimizer construction + shardings.
    params_shape = jax.eval_shape(_make_params, jax.random.PRNGKey(0))
    params_shd = param_shardings(params_shape, mesh)
    b_shd = batch_shardings(mesh, device_context)
    repl = NamedSharding(mesh, P())

    tok_shd = (
        NamedSharding(mesh, token_pspec())
        if mesh.shape[AXIS_CONTEXT] > 1 else None
    )

    def _loss_fn(params, batch, rng):
        context = batch.get("context")
        if context is None:
            b = batch["latent"].shape[0]
            context = 0.05 * jax.random.normal(
                jax.random.fold_in(rng, 0x0C7E),
                (b, cfg.data.caption_tokens, cfg.data.context_dim),
                mcfg.compute_dtype,
            )
            context = jax.lax.with_sharding_constraint(
                context, NamedSharding(mesh, P(DATA_AXES)))
        return rectified_flow_loss(
            params, mcfg, batch["latent"], context, rng,
            alpha=cfg.time_shift_alpha, caption_dropout=cfg.caption_dropout,
            token_sharding=tok_shd,
        )

    if cfg.optimizer.in_backward:
        init_fn, train_step, settings = _build_inloop_branch(
            cfg, mesh, _make_params, params_shape, params_shd, b_shd, repl)
    else:
        tx, settings, schedule, tx_args = build_optimizer(
            params_shape, cfg.optimizer.learning_rate, cfg.max_steps,
            cfg.optimizer)
        st_shd = state_shardings(params_shd, mesh)

        def _init(rng):
            params = _make_params(rng)
            return TrainState(
                params=params,
                opt_state=tx.init(params),
                step=jnp.zeros((), jnp.int32),
            )

        init_fn = jax.jit(_init, out_shardings=st_shd)

        def _grads(params, batch, rng):
            if cfg.grad_accum <= 1:
                return jax.value_and_grad(_loss_fn, has_aux=True)(
                    params, batch, rng)
            return accumulate_grads(_loss_fn, params, batch, rng,
                                    cfg.grad_accum)

        def _train_step(state: TrainState, batch, base_rng
                        ) -> Tuple[TrainState, Dict]:
            # per-step rng derived on-device from the step counter:
            # deterministic, resume-exact, and no host-side key splitting
            # in the hot loop
            rng = jax.random.fold_in(base_rng, state.step)
            (loss, aux), grads = _grads(state.params, batch, rng)
            # one-pass fused muP-AdamW (≡ tx.update + apply_updates;
            # see optim.py)
            params, opt_state = fused_apply(tx_args, grads, state.opt_state,
                                            state.params)
            new_state = TrainState(params, opt_state, state.step + 1)
            metrics = {
                "loss": loss,
                "diffusion_loss": loss,
                "lr_scale": schedule(state.step),
                "bin_sums": aux["bin_sums"],
                "bin_counts": aux["bin_counts"],
            }
            if cfg.log_grad_norm:
                metrics["grad_norm"] = optax.global_norm(grads)
            return new_state, metrics

        train_step = jax.jit(
            _train_step,
            in_shardings=(st_shd, b_shd, repl),
            out_shardings=(st_shd, None),
            donate_argnums=(0,),
        )

    def _eval_step(params, batch, rng):
        loss, aux = _loss_fn(params, batch, rng)
        return {
            "loss": loss,
            "diffusion_loss": loss,
            "bin_sums": aux["bin_sums"],
            "bin_counts": aux["bin_counts"],
        }

    eval_step = jax.jit(_eval_step, in_shardings=(params_shd, b_shd, repl))

    return init_fn, train_step, eval_step, settings


def _build_inloop_branch(cfg: TrainConfig, mesh: Mesh, make_params,
                         params_shape, params_shd, b_shd, repl):
    """Optimizer-in-backward production step (cfg.optimizer.in_backward):
    wraps train/inloop.py's fused reverse-scan step in the TrainState
    interface so the Trainer / CLI / orbax checkpointing drive it exactly
    like the standard step. The regime this enables — a 2.8B FULL train
    step on one 16 GB chip — is the north-star XL config
    (PERFORMANCE.md "XL FULL step")."""
    from video_diffusion_speedrun_tpu.train.inloop import (
        InloopOptState,
        build_inloop_step,
    )
    from video_diffusion_speedrun_tpu.train.schedules import get_schedule

    mcfg = cfg.model
    ocfg = cfg.optimizer
    if mesh.shape[AXIS_CONTEXT] > 1:
        raise NotImplementedError(
            "optimizer_in_backward does not support the context "
            "(sequence-parallel) mesh axis: its hand-rolled forward has no "
            "token_sharding path — use the standard step for CP runs"
        )
    if cfg.log_grad_norm:
        raise ValueError(
            "log_grad_norm is unavailable with optimizer_in_backward: the "
            "full gradient tree never materializes (that is the point)"
        )

    # shardings for ONE block's slice of each stacked tree (leading depth
    # axis dropped): the reverse scan's per-block grads are constrained to
    # these so the while carry keeps the params' own sharding (see
    # build_inloop_step docstring / round-4 VERDICT weak #2)
    def _slice_shd(ns):
        spec = tuple(ns.spec)
        return NamedSharding(mesh, P(*spec[1:]) if spec else P())

    block_slice_shd = jax.tree.map(_slice_shd, params_shd["blocks"])

    init_opt, inloop_step, settings = build_inloop_step(
        mcfg, ocfg, params_shape, max_steps=cfg.max_steps,
        nu_factored=ocfg.nu_factored,
        nu_factored_min_size=ocfg.nu_factored_min_size,
        alpha=cfg.time_shift_alpha,
        caption_dropout=cfg.caption_dropout,
        grad_accum=cfg.grad_accum,
        block_slice_shardings=block_slice_shd,
    )
    schedule = get_schedule(ocfg.scheduler, ocfg.warmup_steps, cfg.max_steps)

    # moments mirror the param shardings leaf-for-leaf (ZeRO); factored-nu
    # FNu leaves get the generic largest-divisible-dim rule (their paths
    # start at "blocks" here, keeping the stacked depth axis unsharded)
    opt_shape = jax.eval_shape(init_opt, params_shape)
    opt_shd = InloopOptState(
        count=repl,
        mu=param_shardings(opt_shape.mu, mesh),
        nu=param_shardings(opt_shape.nu, mesh),
    )
    st_shd = TrainState(params=params_shd, opt_state=opt_shd, step=repl)

    def _init(rng):
        params = make_params(rng)
        return TrainState(params=params, opt_state=init_opt(params),
                          step=jnp.zeros((), jnp.int32))

    init_fn = jax.jit(_init, out_shardings=st_shd)

    def _train_step(state: TrainState, batch, base_rng
                    ) -> Tuple[TrainState, Dict]:
        rng = jax.random.fold_in(base_rng, state.step)
        context = batch.get("context")
        if context is None and mcfg.cross_attn_input_size is not None:
            # same on-device synthetic context as the standard step's
            # _loss_fn (identical fold constant → identical draws)
            b = batch["latent"].shape[0]
            context = 0.05 * jax.random.normal(
                jax.random.fold_in(rng, 0x0C7E),
                (b, cfg.data.caption_tokens, cfg.data.context_dim),
                mcfg.compute_dtype,
            )
            context = jax.lax.with_sharding_constraint(
                context, NamedSharding(mesh, P(DATA_AXES)))
        params, opt, loss, aux = inloop_step(
            state.params, state.opt_state, batch["latent"], context, rng)
        metrics = {
            "loss": loss,
            "diffusion_loss": loss,
            "lr_scale": schedule(state.step),
            "bin_sums": aux["bin_sums"],
            "bin_counts": aux["bin_counts"],
        }
        return TrainState(params, opt, state.step + 1), metrics

    train_step = jax.jit(
        _train_step,
        in_shardings=(st_shd, b_shd, repl),
        out_shardings=(st_shd, None),
        donate_argnums=(0,),
    )
    return init_fn, train_step, settings
