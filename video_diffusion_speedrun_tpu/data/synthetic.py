"""Synthetic Cosmos-shaped data — the no-download path (SURVEY.md §7.2).

Generates latents statistically shaped like Cosmos CV4x8x8 outputs (float,
roughly unit-scale — the reference uses raw unnormalized latents,
`train.py:73`) plus either raw captions or pre-encoded T5-like context.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import numpy as np

_CAPTION_VOCAB = (
    "a tranquil mountain range shrouded in fog", "a woman practicing yoga by the ocean",
    "a busy city street at night in the rain", "a golden retriever running on a beach",
    "timelapse of clouds over a desert canyon", "a chef plating a colorful dish",
    "drone shot over a winding forest river", "close-up of raindrops on a window",
)


class SyntheticLatentDataset:
    """Deterministic synthetic dataset with the LatentDataset row interface
    (`sharded_dataset.py:28-32`): row → {"latent": [C,T,H,W], "caption": str}."""

    def __init__(self, num_rows: int = 1024,
                 latent_shape: Tuple[int, int, int, int] = (16, 5, 32, 32),
                 seed: int = 0, dtype=np.float32,
                 t_choices: Tuple[int, ...] = ()):
        self.num_rows = num_rows
        self.latent_shape = latent_shape
        self.seed = seed
        self.dtype = dtype
        # variable-length mode: per-row frame count drawn from t_choices
        self.t_choices = tuple(t_choices)

    def __len__(self) -> int:
        return self.num_rows

    def latent_shapes(self):
        """Latent shapes this dataset emits, WITH multiplicity (the
        coordinated shape schedule weights its draws by arrival frequency —
        t_choices=(5, 5, 9) emits shape-5 rows twice as often)."""
        if not self.t_choices:
            return [tuple(self.latent_shape)]
        c, _, h, w = self.latent_shape
        return [(c, t, h, w) for t in self.t_choices]

    def __getitem__(self, idx: int) -> Dict:
        if not 0 <= idx < self.num_rows:
            raise IndexError(idx)
        rng = np.random.default_rng(self.seed * 1_000_003 + idx)
        shape = self.latent_shape
        if self.t_choices:
            c, _, h, w = shape
            shape = (c, self.t_choices[idx % len(self.t_choices)], h, w)
        latent = rng.standard_normal(shape).astype(self.dtype)
        caption = _CAPTION_VOCAB[idx % len(_CAPTION_VOCAB)]
        return {"latent": latent, "caption": caption}


def synthetic_context(rng: np.random.Generator, batch: int, tokens: int,
                      dim: int, dtype=np.float32) -> np.ndarray:
    """Pre-encoded-context stand-in for T5 embeddings (for the no-T5 smoke
    path, SURVEY.md §7 minimum slice)."""
    return (rng.standard_normal((batch, tokens, dim)) * 0.05).astype(dtype)
