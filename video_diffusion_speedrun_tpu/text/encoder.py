"""Prompt-encoding pipeline: tokenizer + frozen T5 on TPU.

The `load_encoders` / `encode_prompt_with_t5` analog
(`/root/reference/utils.py:38-110`). Tokenization pads/truncates to a fixed
512 tokens with NO attention mask (parity with `utils.py:51-60`, where pad
tokens are attended). Weight sources, in priority order:
 1. a converted-orbax / numpy checkpoint path (offline-friendly),
 2. a local HF torch checkpoint (converted on load),
 3. random init (tests / smoke only; logged loudly).

The reference re-encodes every caption on-device each step
(`train.py:77-84`); `PromptEncoder.__call__` is jitted once so repeated
encodings reuse the compiled program, and `precompute` supports the
offline-embedding path (SURVEY.md §7.7).
"""

from __future__ import annotations

import functools
import logging
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from video_diffusion_speedrun_tpu.text.t5 import (
    T5Config,
    convert_torch_t5,
    encode,
    init_t5,
)

logger = logging.getLogger(__name__)

MAX_SEQUENCE_LENGTH = 512  # `utils.py:42` default


class ByteFallbackTokenizer:
    """Deterministic offline stand-in when no sentencepiece checkpoint is
    cached: UTF-8 bytes → ids 3+byte (T5 special-id layout: 0=pad, 1=EOS,
    2=unk), EOS-terminated, padded/truncated to max_length. Semantically
    garbage — only paired with RANDOM-INIT smoke encoders (load_encoder
    only installs it under `allow_random_init`); real encodes require the
    real tokenizer. Mimics the HF call signature `tokenize()` uses."""

    def __call__(self, prompts: Sequence[str], padding=None, max_length=512,
                 truncation=True, return_tensors="np"):
        ids = np.zeros((len(prompts), max_length), np.int64)
        for row, text in enumerate(prompts):
            bs = list(text.encode("utf-8"))[: max_length - 1]
            ids[row, : len(bs)] = np.asarray(bs, np.int64) + 3
            ids[row, len(bs)] = 1  # EOS
        return {"input_ids": ids}


class PromptEncoder:
    def __init__(self, params, cfg: T5Config, tokenizer=None,
                 max_length: int = MAX_SEQUENCE_LENGTH, mesh=None):
        if mesh is not None:
            # shard the frozen encoder over the fsdp axis so T5-XXL (4.7B)
            # doesn't steal a full copy of HBM per chip (SURVEY.md §7.6)
            from video_diffusion_speedrun_tpu.parallel.fsdp import shard_params

            params = shard_params(params, mesh)
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.max_length = max_length
        self._encode = jax.jit(
            functools.partial(encode, cfg=cfg),
            static_argnames=("return_index",),
        )

    def tokenize(self, prompts: Sequence[str]) -> np.ndarray:
        if self.tokenizer is None:
            raise RuntimeError(
                "no tokenizer loaded; pass pre-tokenized ids or install a "
                "local tokenizer checkpoint"
            )
        out = self.tokenizer(
            list(prompts), padding="max_length", max_length=self.max_length,
            truncation=True, return_tensors="np",
        )
        return out["input_ids"].astype(np.int32)

    def __call__(self, prompts: Sequence[str], return_index: int = -1
                 ) -> jnp.ndarray:
        """[len(prompts), max_length, d_model] embeddings (bf16)."""
        ids = jnp.asarray(self.tokenize(prompts))
        return self._encode(self.params, input_ids=ids,
                            return_index=return_index)

    def encode_ids(self, input_ids, return_index: int = -1) -> jnp.ndarray:
        return self._encode(self.params, input_ids=jnp.asarray(input_ids),
                            return_index=return_index)


def load_encoder(
    text_encoder_path: str = "black-forest-labs/FLUX.1-dev",
    cfg: Optional[T5Config] = None,
    allow_random_init: bool = False,
    rng: Optional[jax.Array] = None,
) -> PromptEncoder:
    """Build the frozen prompt encoder (the `load_encoders` analog,
    `utils.py:83-110`). Requires local HF caches (zero-egress environments
    fall back to random init only if `allow_random_init`)."""
    cfg = cfg or T5Config.xxl()
    tokenizer = None
    params = None
    try:
        from transformers import T5TokenizerFast

        tokenizer = T5TokenizerFast.from_pretrained(
            text_encoder_path, subfolder="tokenizer_2", local_files_only=True
        )
    except Exception as e:  # offline / missing cache
        logger.warning("tokenizer unavailable (%s); tokenize() will fail", e)

    try:
        import torch
        from transformers import T5EncoderModel

        model = T5EncoderModel.from_pretrained(
            text_encoder_path, subfolder="text_encoder_2",
            torch_dtype=torch.float32, local_files_only=True,
        )
        params = convert_torch_t5(model.state_dict(), cfg)
        del model
    except Exception as e:
        if not allow_random_init:
            raise RuntimeError(
                f"T5 weights unavailable ({e}); pass allow_random_init=True "
                "for smoke-testing without weights"
            ) from e
        logger.warning("T5 weights unavailable (%s); RANDOM INIT (smoke only)", e)
        params = init_t5(rng or jax.random.PRNGKey(0), cfg)

    if tokenizer is None and allow_random_init:
        logger.warning(
            "no tokenizer cached; using the byte-fallback tokenizer "
            "(smoke only — ids are NOT sentencepiece)")
        tokenizer = ByteFallbackTokenizer()

    return PromptEncoder(params, cfg, tokenizer)


def precompute_embeddings(encoder: PromptEncoder, prompts: Sequence[str],
                          return_index: int = -1,
                          batch_size: int = 64) -> np.ndarray:
    """Offline embedding precompute (the improvement path the reference
    lacks — it re-encodes per step, `train.py:77-84`)."""
    chunks = []
    for i in range(0, len(prompts), batch_size):
        emb = encoder(prompts[i: i + batch_size], return_index=return_index)
        chunks.append(np.asarray(emb.astype(jnp.float32)))
    return np.concatenate(chunks, axis=0)
