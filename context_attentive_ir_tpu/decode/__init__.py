"""Decoding: greedy rollout + beam search (SURVEY.md SS2.7)."""

from .beam import beam_search
from .fusedgen import can_fuse_generator, make_fused_beam_step
from .penalties import length_wu as length_penalty  # back-compat alias
from .greedy import greedy_decode

__all__ = ["beam_search", "greedy_decode", "length_penalty",
           "can_fuse_generator", "make_fused_beam_step"]
