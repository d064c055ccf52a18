"""Shared neural ops: the TPU-native replacement for ``neuroir/modules``
(SURVEY.md SS2.3)."""

from .attention import AttentionPool, GlobalAttention
from .decoder import AttnLSTMDecoder
from .layers import (
    CharCNN,
    Embeddings,
    Highway,
    Maxout,
    MLP,
    cosine_similarity,
)
from .masking import (
    NEG_INF,
    mask_logits,
    masked_log_softmax,
    masked_max,
    masked_mean,
    masked_softmax,
    sequence_mask,
)
from .rnn import RNNEncoder, RNNLayer, gru_scan, lstm_scan

__all__ = [
    "AttentionPool", "GlobalAttention", "AttnLSTMDecoder", "CharCNN",
    "Embeddings", "Highway", "Maxout", "MLP", "cosine_similarity",
    "NEG_INF", "mask_logits", "masked_log_softmax", "masked_max",
    "masked_mean", "masked_softmax", "sequence_mask",
    "RNNEncoder", "RNNLayer", "gru_scan", "lstm_scan",
]
