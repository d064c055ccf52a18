"""Shared model plumbing: embedding construction, dtype resolution.

The reference threads ``args`` + a pretrained-embedding injection step
through every model (``neuroir/model.py`` DrQA pattern, SURVEY.md SS2.9).
Here the equivalent is: every model owns an ``Embeddings`` submodule built
from its ``ModelConfig`` (+ optional pretrained matrix captured at
construction), and exposes

- ``score(batch)``   -> ranker score tensor(s)
- ``loss(batch)``    -> scalar loss dict (training)

as flax methods so one jitted train step serves every model.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..ops.layers import Embeddings


def compute_dtype(config: ModelConfig) -> jnp.dtype:
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        config.compute_dtype]


def make_embeddings(config: ModelConfig,
                    pretrained: Optional[np.ndarray],
                    name: str = "embeddings") -> Embeddings:
    assert config.vocab_size > 0, "config.vocab_size must be set"
    return Embeddings(
        vocab_size=config.vocab_size,
        features=config.emsize,
        pretrained=pretrained,
        fixed=config.fix_embeddings,
        dropout=config.dropout_emb,
        dtype=compute_dtype(config),
        quantized=config.quantize_embeddings,
        name=name,
    )
