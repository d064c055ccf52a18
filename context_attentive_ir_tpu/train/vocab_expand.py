"""Vocabulary expansion for fine-tuning on new data.

Parity target: the reference model wrapper's ``expand_dictionary()``
(SURVEY.md SS1 L5, marker ``exp:``): before fine-tuning on a new corpus,
add its unseen words to the dictionary and grow the embedding table
(optionally initializing new rows from the pretrained embedding file).

Functional variant: takes params + dict, returns NEW params + dict +
config; the caller rebuilds the TrainState (optimizer moments for the
grown rows start at zero -- matches the reference, which registers new
rows as fresh parameters).
"""

from __future__ import annotations

from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..data.dictionary import Dictionary, normalize
from ..data.loader import load_embeddings


def expand_dictionary(
    params: dict,
    config: ModelConfig,
    word_dict: Dictionary,
    token_streams: Iterable[Iterable[str]],
    embedding_file: Optional[str] = None,
    seed: int = 1234,
) -> tuple[dict, ModelConfig, Dictionary, int]:
    """Grow the vocab with unseen tokens from ``token_streams``.

    Returns (new params, new config, same Dictionary object grown in
    place, number of added words).  Handles the shared embedding table and
    (for untied generators) the vocab-sized projection.
    """
    old_size = len(word_dict)
    for stream in token_streams:
        for tok in stream:
            word_dict.add(normalize(tok, word_dict.uncase))
    n_new = len(word_dict) - old_size
    if n_new == 0:
        return params, config, word_dict, 0

    rng = np.random.RandomState(seed)
    new_rows = rng.normal(scale=0.1,
                          size=(n_new, config.emsize)).astype(np.float32)
    if embedding_file:
        full, _ = load_embeddings(embedding_file, word_dict, config.emsize)
        new_rows = full[old_size:]

    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy

    def grow(tree: dict):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = grow(v)
            elif k == "embedding" and v.shape[0] == old_size:
                out[k] = jnp.concatenate(
                    [v, jnp.asarray(new_rows, v.dtype)], axis=0)
            elif k == "kernel" and v.ndim == 2 and v.shape[1] == old_size:
                pad = jnp.zeros((v.shape[0], n_new), v.dtype)
                out[k] = jnp.concatenate([v, pad], axis=1)
            elif k == "bias" and v.ndim == 1 and v.shape[0] == old_size:
                out[k] = jnp.concatenate(
                    [v, jnp.zeros((n_new,), v.dtype)], axis=0)
            else:
                out[k] = v
        return out

    new_params = grow(params)
    return new_params, config.replace(vocab_size=len(word_dict)), \
        word_dict, n_new
