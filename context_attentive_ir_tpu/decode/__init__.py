"""Decoding: greedy rollout + beam search (SURVEY.md SS2.7)."""

from .beam import beam_search, length_penalty
from .greedy import greedy_decode

__all__ = ["beam_search", "greedy_decode", "length_penalty"]
