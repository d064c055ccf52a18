"""Fused-generator beam-step construction helpers.

Bridges a model's ``decode_step_fused`` (tie projection, no logits
matmul) and the Pallas generator+top-k+logsumexp kernel
(ops/pallas/beamgen.py) into the ``(state, (vals, idx, lse))`` step
contract ``beam_search`` accepts (decode/beam.py fused-generator mode).
Dispatch between this and the plain logits step is a measured decision
(``ops.dispatch.prefer_fused_generator``).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from ..ops.pallas.beamgen import generator_topk_lse


def fused_generator_table(params, dtype=jnp.bfloat16):
    """The transposed tied-embedding table ``[E, V]`` from a param tree,
    or None when the model cannot take the fused path (untied generator
    or int8-quantized table)."""
    emb = params.get("embeddings") if hasattr(params, "get") else None
    if not isinstance(emb, dict) or "embedding" not in emb:
        return None
    table = emb["embedding"]
    if getattr(table, "ndim", 0) != 2:
        return None
    return table.T.astype(dtype)


def can_fuse_generator(model, params) -> bool:
    return (hasattr(model, "decode_step_fused")
            and fused_generator_table(params) is not None)


def make_fused_beam_step(model, var, params, memory, memory_mask,
                         kc: int, dtype=jnp.bfloat16,
                         block_r: int = 320, block_v: int = 2048,
                         interpret: bool = False,
                         pipeline: bool | None = None) -> Optional[Callable]:
    """``(state, tokens) -> (state, (vals, idx, lse))`` or None when the
    model/params cannot take the fused path.  ``memory``/``memory_mask``
    must already be beam-tiled.  The transposed table is computed inside
    the traced step from ``params`` -- loop-invariant, so XLA hoists the
    one-time transpose out of the beam scan.  ``pipeline=None`` resolves
    the serial-vs-software-pipelined kernel variant from the measured
    dispatch table (``ops.dispatch.prefer_pipelined_generator``); both
    variants are bit-exact."""
    if not can_fuse_generator(model, params):
        return None

    if pipeline is None:
        from ..ops.dispatch import prefer_pipelined_generator

        pipeline = prefer_pipelined_generator(memory.shape[0], kc)

    def step(state, tokens):
        table_t = fused_generator_table(params, dtype)
        state, proj, _ = model.apply(var, state, tokens, memory,
                                     memory_mask,
                                     method=model.decode_step_fused)
        return state, generator_topk_lse(proj.astype(dtype), table_t, kc,
                                         block_r=block_r, block_v=block_v,
                                         interpret=interpret,
                                         pipeline=pipeline)

    return step
