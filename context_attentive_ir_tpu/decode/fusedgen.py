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

from ..ops.pallas.beamgen import (generator_topk_lse,
                                  generator_topk_lse_reference)


def fused_generator_table(params, dtype=jnp.bfloat16):
    """``(table_t [E, V], scale [V] | None)`` from a param tree, or None
    when the model cannot take the fused path (untied generator).

    Float tables return ``(table.T.astype(dtype), None)``.  Serve-time
    int8-quantized tables (``embedding_q`` [V, E] + per-row
    ``embedding_scale`` [V, 1], serve.quantize_embedding_params) return
    ``(q.T [E, V] int8, scale [V] f32)`` -- the kernel's int8-table mode
    streams HALF the bytes and computes the same quantized math as the
    XLA tied generator (round 5, VERDICT r4 #1; until round 4 quantized
    engines silently lost the fused path entirely)."""
    emb = params.get("embeddings") if hasattr(params, "get") else None
    if not isinstance(emb, dict):
        return None
    if "embedding_q" in emb and "embedding_scale" in emb:
        q = emb["embedding_q"]
        if getattr(q, "ndim", 0) != 2:
            return None
        return q.T, emb["embedding_scale"].reshape(-1).astype(jnp.float32)
    if "embedding" not in emb:
        return None
    table = emb["embedding"]
    if getattr(table, "ndim", 0) != 2:
        return None
    return table.T.astype(dtype), None


def can_fuse_generator(model, params) -> bool:
    return (hasattr(model, "decode_step_fused")
            and fused_generator_table(params) is not None)


def make_fused_beam_step(model, var, params, memory, memory_mask,
                         kc: int, dtype=jnp.bfloat16,
                         block_r: int = 320, block_v: int = 2048,
                         interpret: bool = False,
                         pipeline: bool | None = None,
                         shortlist=None,
                         prune: bool | None = None) -> Optional[Callable]:
    """``(state, tokens) -> (state, (vals, idx, lse))`` or None when the
    model/params cannot take the fused path.  ``memory``/``memory_mask``
    must already be beam-tiled.  The transposed table is computed inside
    the traced step from ``params`` -- loop-invariant, so XLA hoists the
    one-time transpose out of the beam scan.  ``pipeline=None`` resolves
    the serial-vs-software-pipelined kernel variant from the measured
    dispatch table (``ops.dispatch.prefer_pipelined_generator``); both
    variants are bit-exact.

    ``shortlist``: int32 [C] vocab ids (decode/shortlist.py) -- the
    generator scores ONLY these columns (table gather is loop-invariant,
    hoisted once per decode); returned indices are mapped back to real
    vocab ids so beam_search and the embedding feedback are unchanged.
    Approximate (softmax support restricted to the shortlist);
    quality-gated, see shortlist.py.

    ``prune=None`` resolves the serial kernel's threshold-pruned
    selection from the measured dispatch table
    (``ops.dispatch.prefer_pruned_generator``); exact either way
    (ops/pallas/beamgen.py prune docstring)."""
    if not can_fuse_generator(model, params):
        return None

    if pipeline is None:
        from ..ops.dispatch import prefer_pipelined_generator

        pipeline = prefer_pipelined_generator(memory.shape[0], kc)
    if fused_generator_table(params, dtype)[1] is not None:
        pipeline = False  # int8-table mode is serial-kernel only
    if prune is None:
        from ..ops.dispatch import prefer_pruned_generator

        prune = prefer_pruned_generator(memory.shape[0], kc)
    if pipeline:
        prune = False  # prune is serial-kernel only

    def step(state, tokens):
        table_t, scale = fused_generator_table(params, dtype)
        if shortlist is not None:
            sl = jnp.asarray(shortlist, jnp.int32)
            table_t = jnp.take(table_t, sl, axis=1)   # hoisted: invariant
            if scale is not None:
                scale = jnp.take(scale, sl, axis=0)
        state, proj, _ = model.apply(var, state, tokens, memory,
                                     memory_mask,
                                     method=model.decode_step_fused)
        vals, idx, lse = generator_topk_lse(
            proj.astype(dtype), table_t, kc, block_r=block_r,
            block_v=block_v, interpret=interpret, pipeline=pipeline,
            scale=scale, prune=prune)
        if shortlist is not None:
            idx = jnp.take(jnp.asarray(shortlist, jnp.int32), idx, axis=0)
        return state, (vals, idx, lse)

    return step


def make_shortlist_xla_step(model, var, params, memory, memory_mask,
                            kc: int, dtype=jnp.bfloat16,
                            shortlist=None) -> Optional[Callable]:
    """XLA (non-Pallas) shortlist step: same (vals, idx, lse) contract
    and the same restricted-softmax math as the fused kernel's shortlist
    mode, via the shared ``generator_topk_lse_reference`` on a shortlist
    column gather.  The generator matmul shrinks V -> C exactly like the
    kernel path, so this also accelerates decode on backends without
    Mosaic (and is what CI exercises).  Returns None when the model
    cannot take the tied-table path."""
    if shortlist is None or not can_fuse_generator(model, params):
        return None

    def step(state, tokens):
        table_t, scale = fused_generator_table(params, dtype)
        sl = jnp.asarray(shortlist, jnp.int32)
        table_s = jnp.take(table_t, sl, axis=1)       # hoisted: invariant
        scale_s = None if scale is None else jnp.take(scale, sl, axis=0)
        state, proj, _ = model.apply(var, state, tokens, memory,
                                     memory_mask,
                                     method=model.decode_step_fused)
        vals, idx, lse = generator_topk_lse_reference(
            proj.astype(dtype), table_s, kc, scale=scale_s)
        return state, (vals, jnp.take(sl, idx, axis=0), lse)

    return step
