"""Training orchestrator — the `train_fsdp` analog (`/root/reference/
train.py:194-591`) as a class over the jitted SPMD step.

Loop semantics preserved: epoch × step loop bounded by max_steps
(`train.py:403-410`); metrics every `log_every` steps with cross-replica
averaging (free — the loss is a sharded mean) and per-N-step avg step time
(`train.py:441-451`); eval + checkpoint at `step % evaluate_every == 1` with
`eval_batches` batches and a fixed eval seed (`train.py:504-551`); working
timestep-decile loss bins (the reference's are dead code, SURVEY.md
§Quirks #6).

TPU-first: one jit-compiled step (no torch.compile warmup), full-state orbax
checkpoints (resume restores optimizer/schedule/step), deterministic seeded
data order per epoch.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from video_diffusion_speedrun_tpu.core.config import TrainConfig
from video_diffusion_speedrun_tpu.data.loader import (
    CoordinatedShapeBucketingCollate,
    DataLoader,
    ShapeBucketingCollate,
    ShardedSampler,
    default_collate,
    device_prefetch,
)
from video_diffusion_speedrun_tpu.data.synthetic import SyntheticLatentDataset
from video_diffusion_speedrun_tpu.models.dit import param_count
from video_diffusion_speedrun_tpu.parallel.mesh import build_mesh
from video_diffusion_speedrun_tpu.train.checkpoint import CheckpointManager
from video_diffusion_speedrun_tpu.train.step import build_train_step
from video_diffusion_speedrun_tpu.utils.logging import (
    MetricsLogger,
    StepTimer,
    is_main_process,
    make_logger,
)


class Trainer:
    def __init__(self, cfg: TrainConfig, prompt_encoder=None):
        self.cfg = cfg
        if cfg.distributed:
            jax.distributed.initialize()
        self.logger = make_logger()
        self.mesh = build_mesh(cfg.mesh)
        self.prompt_encoder = prompt_encoder

        # synthetic runs without a prompt encoder draw the context on-device
        # inside the step (kills the 32 MB/step host transfer, round-1
        # PERFORMANCE.md "Production loop"); precomputed embeddings
        # (data.embeddings_dir) take precedence — rows arrive with real
        # context pre-joined
        self.device_context = (
            cfg.data.dataset == "synthetic" and prompt_encoder is None
            and cfg.data.embeddings_dir is None
        )
        (self.init_fn, self.train_step, self.eval_step, self.mup_settings
         ) = build_train_step(cfg, self.mesh,
                              device_context=self.device_context)

        self.state = self.init_fn(jax.random.PRNGKey(cfg.seed))
        n_params = param_count(self.state.params)
        self.logger.info("param_count: %.2fM", n_params / 1e6)

        ckpt_dir = os.path.join(cfg.checkpoint_dir, cfg.run_name)
        self.ckpt = CheckpointManager(ckpt_dir)
        if cfg.load_checkpoint is not None:
            self._load_checkpoint(cfg.load_checkpoint)

        self.metrics = MetricsLogger(
            project=cfg.project_name, run_name=cfg.run_name,
            config=dataclasses.asdict(cfg), out_dir=ckpt_dir,
            use_wandb=cfg.wandb,
        )

    # ------------------------------------------------------------------ data

    def _dataset(self, split: str):
        if not hasattr(self, "_dataset_cache"):
            self._dataset_cache = {}
        if split in self._dataset_cache:
            return self._dataset_cache[split]
        ds = self._build_dataset(split)
        self._dataset_cache[split] = ds
        return ds

    def _build_dataset(self, split: str):
        dcfg = self.cfg.data
        if dcfg.dataset == "synthetic":
            rows = dcfg.synthetic_rows if split == "train" else dcfg.test_rows
            ds = SyntheticLatentDataset(
                num_rows=rows, latent_shape=dcfg.synthetic_shape,
                seed=0 if split == "train" else 1,
                t_choices=dcfg.synthetic_t_choices if split == "train" else (),
            )
        else:
            from video_diffusion_speedrun_tpu.data.dataset import LatentDataset

            ds = LatentDataset(split=split, cache_dir=dcfg.cache_dir,
                               hf_name=dcfg.hf_name)
        if dcfg.embeddings_dir is not None:
            from video_diffusion_speedrun_tpu.data.embeddings import (
                PrecomputedEmbeddingJoin,
            )

            # precomputed shards are written per split dir by convention
            # (scripts/precompute_embeddings.py --out <dir>/<split>); a flat
            # dir is accepted because the join validates the manifest's
            # split — a mismatched flat dir raises instead of silently
            # joining the other split's embeddings
            split_dir = os.path.join(dcfg.embeddings_dir, split)
            emb_dir = split_dir if os.path.isdir(split_dir) \
                else dcfg.embeddings_dir
            ds = PrecomputedEmbeddingJoin(ds, emb_dir, expected_split=split)
        return ds

    def _loader(self, split: str) -> Iterator[Dict]:
        dcfg = self.cfg.data
        ds = self._dataset(split)
        global_batch = self.cfg.batch_size
        if split != "train" and global_batch > len(ds):
            # the pinned test split is 40 rows (`sharded_dataset.py:18-19`);
            # the canonical global batch (64 on 8 chips) exceeds it. The
            # reference sidesteps this by evaluating each rank on the full
            # split independently (`train.py:366-374`); here the batch is
            # global, so clamp it to the largest shardable size ≤ len(ds):
            # divisible by the mesh's data shards AND by process_count so
            # every host contributes an equal slice.
            import math

            from video_diffusion_speedrun_tpu.parallel.mesh import DATA_AXES

            n_data = 1
            for ax in DATA_AXES:
                n_data *= self.mesh.shape.get(ax, 1)
            g = math.lcm(n_data, jax.process_count())
            global_batch = (len(ds) // g) * g
            if global_batch == 0:
                raise ValueError(
                    f"test split ({len(ds)} rows) cannot fill one batch "
                    f"slice per data shard ({n_data} shards × "
                    f"{jax.process_count()} hosts)"
                )
            self.logger.info(
                "eval batch clamped %d -> %d (test split has %d rows)",
                self.cfg.batch_size, global_batch, len(ds))
        per_host = global_batch // jax.process_count()
        sampler = ShardedSampler(
            len(ds), per_host, jax.process_index(), jax.process_count(),
            seed=dcfg.shuffle_seed, shuffle=(split == "train"),
        )
        collate = default_collate
        # bucketing applies to BOTH splits: a mixed-length test split would
        # crash the plain stacking collate at eval just like the reference's
        # (`utils.py:22`)
        if dcfg.bucket_by_shape:
            shapes = getattr(ds, "latent_shapes", lambda: None)()
            if shapes is not None:
                # same seeded shape schedule on every host → every host
                # emits the same latent shape at every global step (SPMD-safe
                # on multi-host pods)
                collate = CoordinatedShapeBucketingCollate(
                    per_host, shapes, seed=dcfg.shuffle_seed + 101)
            elif jax.process_count() > 1:
                raise NotImplementedError(
                    "bucket_by_shape on multi-host needs the dataset to "
                    "declare latent_shapes() for the coordinated schedule"
                )
            else:
                collate = ShapeBucketingCollate(per_host)
        # resume continues the data stream where a continuous run would be:
        # skip exactly `restored step` train batches. Row-derived context
        # (precomputed embeddings / T5 captions) follows automatically; the
        # smoke-mode synthetic context is per-batch-index seeded, so it
        # follows too (_encode_stream start_index)
        skip = int(self.state.step) if split == "train" else 0
        loader = DataLoader(
            ds, sampler, collate=collate,
            num_workers=dcfg.num_workers, prefetch=dcfg.prefetch,
            num_epochs=self.cfg.num_epochs if split == "train" else 1,
            skip_batches=skip,
        )
        return device_prefetch(
            self._encode_stream(iter(loader), start_index=skip), self.mesh,
            depth=dcfg.prefetch,
        )

    def _encode_stream(self, batches: Iterator[Dict],
                       start_index: int = 0) -> Iterator[Dict]:
        """Attach `context`: precomputed > T5-encoded captions > synthetic.

        `start_index` is the global batch index of the first incoming batch
        (the loader's skip_batches on resume): the smoke-mode synthetic
        context is seeded per (seed, batch index), not drawn from a stream,
        so a resumed run attaches the SAME context a continuous run would —
        keeping the bit-exact-resume guarantee unconditional."""
        dcfg = self.cfg.data
        warned = False
        for index, batch in enumerate(batches, start=start_index):
            rng = np.random.default_rng((self.cfg.seed + 17, index))
            if "context" not in batch:
                if self.prompt_encoder is not None:
                    emb = self.prompt_encoder(
                        batch["caption"], return_index=self.cfg.t5_return_index
                    )
                    batch["context"] = np.asarray(emb.astype(jnp.float32))
                elif not self.device_context:
                    if not dcfg.allow_random_context:
                        raise RuntimeError(
                            "no context source: rows carry no embeddings and "
                            "no prompt encoder is configured. Pass use_t5 / "
                            "precomputed embeddings, or set "
                            "data.allow_random_context=True for a smoke run."
                        )
                    # explicit smoke mode: random stand-in context
                    if not warned:
                        self.logger.warning(
                            "allow_random_context: training against random "
                            "context embeddings (smoke only)")
                        warned = True
                    from video_diffusion_speedrun_tpu.data.synthetic import (
                        synthetic_context,
                    )

                    batch["context"] = synthetic_context(
                        rng, batch["latent"].shape[0], dcfg.caption_tokens,
                        dcfg.context_dim)
            yield batch

    # ----------------------------------------------------------- checkpoints

    def _load_checkpoint(self, path: str) -> None:
        from video_diffusion_speedrun_tpu.train.checkpoint import (
            is_torch_reference_checkpoint,
        )

        if is_torch_reference_checkpoint(path):
            # torch reference checkpoint: weights only (`train.py:292-320`)
            from video_diffusion_speedrun_tpu.parallel.fsdp import shard_params
            from video_diffusion_speedrun_tpu.train.checkpoint import (
                load_reference_checkpoint,
            )

            if self.cfg.model.rope_order != "reference":
                # can't rewrite the frozen config here (the jitted step was
                # built from it) — construct the TrainConfig with
                # rope_order="reference" instead (train.py CLI does this)
                self.logger.warning(
                    "loading a torch reference checkpoint into a model with "
                    "rope_order=%r — reference weights assume the (t,h,w) "
                    "RoPE order (model.py:239-240); set "
                    "model.rope_order='reference' to match",
                    self.cfg.model.rope_order,
                )
            params = load_reference_checkpoint(path, self.cfg.model)
            params = shard_params(params, self.mesh)
            self.state = self.state._replace(params=params)
            self.logger.info("loaded torch reference checkpoint from %s", path)
        else:
            # a specific step dir may be passed (".../run/120"); digit-named
            # run roots are handled (split_checkpoint_path)
            from video_diffusion_speedrun_tpu.train.checkpoint import (
                split_checkpoint_path,
            )

            path, step = split_checkpoint_path(path)
            # restore from an ABSTRACT template and free the freshly-init'd
            # state first: holding both would double state HBM during the
            # restore — at 2.8B (params+moments ≈ 10.3 GB) that
            # RESOURCE_EXHAUSTs the 15.75 GB chip (measured, round 4)
            template = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                               sharding=x.sharding)
                if hasattr(x, "sharding") else x,
                self.state,
            )
            self.state = None  # drop the only reference; buffers free now
            self.state = CheckpointManager(path).restore(step, template)
            self.logger.info("restored full train state from %s step %s",
                             path, "latest" if step is None else step)

    # ------------------------------------------------------------------ eval

    def evaluate(self, global_step: int) -> Dict[str, float]:
        """Eval with deterministic noise (`train.py:504-551`): fixed seed,
        `eval_batches` batches of the test split."""
        losses = []
        bin_sums = np.zeros(10)
        bin_counts = np.zeros(10)
        rng = jax.random.PRNGKey(self.cfg.seed + 1000)  # fixed eval seed
        stream = self._loader("test")
        try:
            for idx, batch in enumerate(stream):
                rng, sub = jax.random.split(rng)
                m = self.eval_step(
                    self.state.params,
                    {k: batch[k] for k in ("latent", "context") if k in batch},
                    sub)
                losses.append(float(m["loss"]))
                bin_sums += np.asarray(m["bin_sums"])
                bin_counts += np.asarray(m["bin_counts"])
                if idx + 1 >= self.cfg.eval_batches:
                    break
        finally:
            # breaking at eval_batches abandons the generator chain mid-
            # stream; close it so the producer/stager daemon threads exit
            # now, not at GC (hundreds of evals would accumulate threads)
            stream.close()
        out = {"test/total_loss": float(np.mean(losses)),
               "test/diffusion_loss": float(np.mean(losses))}
        for k in range(10):
            out[f"test_binning/{k}"] = float(
                bin_sums[k] / max(bin_counts[k], 1)
            )
        return out

    def _capture_fixtures(self, batch, rng, step) -> None:
        """CAPTURE_INPUT analog (`train.py:98-101`): dump the step-0 inputs
        (and the timesteps the step will draw) for cross-framework parity."""
        from video_diffusion_speedrun_tpu.train.loss import sample_timesteps

        os.makedirs("test_data", exist_ok=True)
        t_rng = jax.random.split(rng, 4)[0]
        b = batch["latent"].shape[0]
        ts = sample_timesteps(t_rng, b, self.cfg.time_shift_alpha)
        np.save(f"test_data/vae_latent_{step}.npy",
                np.asarray(batch["latent"], np.float32))
        if "context" in batch:
            np.save(f"test_data/caption_encoded_{step}.npy",
                    np.asarray(batch["context"], np.float32))
        np.save(f"test_data/timesteps_{step}.npy", np.asarray(ts))

    def _log_train_metrics(self, m, step: int, avg_ms) -> Dict[str, float]:
        cfg = self.cfg
        loss = float(m["loss"])
        record = {
            "train/diffusion_loss": loss,
            "train/total_loss": loss,
            "train/learning_rate_scale": float(m["lr_scale"]),
            "train/step": step,
        }
        if "grad_norm" in m:
            record["train/grad_norm"] = float(m["grad_norm"])
        bins = np.asarray(m["bin_sums"]) / np.maximum(
            np.asarray(m["bin_counts"]), 1)
        for k in range(10):
            record[f"train_binning/{k}"] = float(bins[k])
        if avg_ms is not None:
            record["train/avg_step_ms"] = avg_ms
        self.metrics.log(record, step)
        if is_main_process():
            self.logger.info(
                "step %d/%d loss %.4f%s", step, cfg.max_steps, loss,
                f" avg_step {avg_ms:.1f}ms" if avg_ms else "",
            )
        return record

    # ----------------------------------------------------------------- train

    def train(self) -> Dict[str, float]:
        cfg = self.cfg
        timer = StepTimer(every=cfg.log_every)
        base_rng = jax.random.PRNGKey(cfg.seed + 1)  # folded with step in-step
        global_step = int(self.state.step)
        last: Dict[str, float] = {}
        pending = None  # (metrics, step) deferred one log interval
        t_start = time.time()

        train_iter = self._loader("train")
        try:
            for batch in train_iter:
                if global_step >= cfg.max_steps:
                    break
                global_step, last, pending = self._train_one(
                    batch, cfg, timer, base_rng, global_step, last, pending)
        finally:
            train_iter.close()  # max_steps break abandons the stream

        if pending is not None:
            last.update(self._log_train_metrics(*pending, None))
        self.ckpt.wait()
        self.metrics.finish()
        self.logger.info("trained %d steps in %.1fs", global_step,
                         time.time() - t_start)
        return last

    def _train_one(self, batch, cfg, timer, base_rng, global_step, last,
                   pending):
        """One loop-body step; returns the updated (step, last, pending)."""
        if cfg.capture_fixtures and global_step == 0 and is_main_process():
            self._capture_fixtures(
                batch, jax.random.fold_in(base_rng, 0), global_step)
        self.state, m = self.train_step(
            self.state,
            {k: batch[k] for k in ("latent", "context") if k in batch},
            base_rng,
        )

        if global_step % cfg.log_every == 0:
            avg_ms = timer.tick() if global_step else None
            # read back the metrics stashed at the PREVIOUS log step: the
            # device had a full interval to finish them, so this float()
            # never drains the dispatch pipeline (a same-step readback
            # stalls the async queue and costs ~10% steady-state)
            if pending is not None:
                last.update(self._log_train_metrics(*pending, avg_ms))
            pending = (m, global_step)
        else:
            timer.tick()

        global_step += 1

        if global_step % cfg.evaluate_every == 1:
            ev = self.evaluate(global_step)
            self.metrics.log(ev, global_step)
            if is_main_process():
                self.logger.info("eval @%d: %.4f", global_step,
                                 ev["test/total_loss"])
            self.ckpt.save(global_step, self.state)
            last.update(ev)

        return global_step, last, pending
