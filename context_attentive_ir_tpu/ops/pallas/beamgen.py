"""Fused tied-generator beam step: matmul + running top-k + logsumexp.

Parity target: none in the reference -- this attacks the beam-decode
bottleneck of the TPU rebuild (SURVEY.md SS2.7 beam search;
BASELINE.json:5 "seq2seq query-suggestion decoder (with beam search)").
VERDICT r3 weak #3 / next-round #3: every measured beam variant consumes
logits already materialized in HBM -- the generator matmul writes
``[B*K, V]`` (1600 x 50k f32 ~= 320 MB per step at bench shapes), then
logsumexp and top-k read it back (~1 GB of HBM traffic per decode step).

This kernel never materializes the logits: it streams vocab tiles of the
tied-embedding matmul ``x [R, E] @ table_t [E, V]`` through the MXU and
keeps, per row block, three accumulators in VMEM across the vocab sweep:

- a running top-``kc`` (values + vocab indices), updated each tile by
  ``kc`` exact selection passes over ``[scores_tile | buffer]``;
- a running max ``m`` and scaled sum ``s`` for a numerically stable
  logsumexp (the online-softmax recurrence).

HBM traffic per step drops to one read of the (transposed) table per row
block plus O(R * kc) outputs.  Selection is EXACT and follows
``lax.top_k`` tie semantics (equal values ordered by ascending vocab
index): each pass takes the global max and, among equal hits, masks the
smallest-index lane only.  The candidate set always includes the running
buffer, whose indices are disjoint from the current tile's columns, so no
duplicate indices exist by construction.

The price is VPU work: ``kc`` masked max/min reductions over every score
tile (~kc*4 passes over R*V elements) replace XLA's single fused top-k
pass.  Whether the HBM savings beat the VPU cost is a measured dispatch
decision (``ops.dispatch.prefer_fused_generator``, measured by
``scripts/tpu_experiments.py dispatch_table_beamgen``), same policy as
the RNN kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
_KPAD = 128  # lane-aligned top-k buffer width (kc <= _KPAD)


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _beamgen_kernel(x_ref, t_ref, *refs,
                    kc: int, v_logical: int, block_v: int, n_v: int,
                    has_scale: bool = False, prune: bool = False):
    if has_scale:
        # int8 tied table + per-vocab-column scale (the serve-time
        # quantized-embedding layout, ops/layers.Embeddings.attend):
        # logits_v = s_v * (x @ q_v) -- scale applied AFTER the matmul,
        # exactly like the XLA quantized path.  The table stream through
        # HBM halves (int8 vs bf16); int8 -> bf16 dequant of each tile is
        # VPU work inside VMEM.
        s_ref, vals_ref, idx_ref, lse_ref, m_s, s_s = refs
    else:
        vals_ref, idx_ref, lse_ref, m_s, s_s = refs
    j = pl.program_id(1)
    t = t_ref[:]
    if has_scale:
        t = t.astype(jnp.bfloat16)
    scores = jnp.dot(x_ref[:], t,
                     preferred_element_type=jnp.float32)      # [RB, VT]
    if has_scale:
        scores = scores * s_ref[:]
    col = (jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
           + j * block_v)
    # mask table pad columns (only the tail tile has any; one cheap op)
    scores = jnp.where(col < v_logical, scores, NEG)

    @pl.when(j == 0)
    def _():
        m_s[:] = jnp.full_like(m_s, NEG)
        s_s[:] = jnp.zeros_like(s_s)
        vals_ref[:] = jnp.full_like(vals_ref, NEG)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    # online logsumexp
    m_old = m_s[:]                                            # [RB, 1]
    tile_max = jnp.max(scores, -1, keepdims=True)             # [RB, 1]
    m_new = jnp.maximum(m_old, tile_max)
    s_s[:] = (s_s[:] * jnp.exp(m_old - m_new)
              + jnp.sum(jnp.exp(scores - m_new), -1, keepdims=True))
    m_s[:] = m_new

    def _select():
        # running top-kc: kc exact selection passes over [tile | buffer]
        comb_v = jnp.concatenate([scores, vals_ref[:]], -1)   # [RB, VT+KPAD]
        comb_i = jnp.concatenate([col, idx_ref[:]], -1)
        new_v, new_i = [], []
        for _ in range(kc):
            m = jnp.max(comb_v, -1, keepdims=True)            # [RB, 1]
            hit = comb_v == m
            ci = jnp.min(jnp.where(hit, comb_i, jnp.int32(2 ** 30)), -1,
                         keepdims=True)
            comb_v = jnp.where(hit & (comb_i == ci), NEG, comb_v)
            new_v.append(m)
            new_i.append(ci)
        rb = comb_v.shape[0]
        new_v.append(jnp.full((rb, _KPAD - kc), NEG, jnp.float32))
        new_i.append(jnp.zeros((rb, _KPAD - kc), jnp.int32))
        vals_ref[:] = jnp.concatenate(new_v, -1)
        idx_ref[:] = jnp.concatenate(new_i, -1)

    if not prune:
        _select()
    else:
        # threshold-pruned selection (round 5): a tile whose per-row max
        # cannot displace any row's running kc-th value contributes
        # nothing to the top-k buffer -- skip all kc selection passes for
        # the whole row block.  EXACT including lax.top_k tie semantics:
        # tiles are swept in ascending vocab order, so a buffered value
        # always carries a LOWER index than any incoming equal (ties
        # break to the lower index -> an incoming == kth never enters);
        # the lse accumulation above already consumed the full tile.  At
        # j == 0 the buffer is NEG-initialized, the predicate is false,
        # and the first tile always selects.  Whether the skip ever fires
        # is data-dependent (it needs EVERY row in the block to be
        # skippable): frequency-sorted vocabs + trained generators
        # concentrate every row's top-k in the low tiles, so the rare-
        # token tail prunes; random logits never prune (measured, PERF.md
        # r5) -- the non-pruned cost is one extra [RB,1] compare+reduce.
        kth = vals_ref[:, kc - 1:kc]                          # [RB, 1]
        relevant = jnp.any(tile_max > kth)                    # scalar

        @pl.when(relevant)
        def _():
            _select()

    @pl.when(j == n_v - 1)
    def _():
        lse_ref[:] = m_s[:] + jnp.log(s_s[:])


def _beamgen_pipelined_kernel(x_ref, t_ref, vals_ref, idx_ref, lse_ref,
                              sc_s, m_s, s_s, *, kc: int, v_logical: int,
                              block_v: int, n_v: int):
    """Software-pipelined variant: at grid step j, issue the MXU matmul
    for vocab tile j into one half of a double-buffered score scratch,
    and run the VPU selection + online-lse passes on tile j-1's scores
    from the other half.  The two phases touch disjoint data, so Mosaic
    can overlap MXU and VPU work instead of serializing them within each
    step (the measured 1.5 ms/call of the serial kernel splits ~0.8 ms
    VPU selection + ~0.25 ms matmul + overheads; PERF.md r4 #6).  The
    grid is (n_r, n_v + 1): step n_v runs only the drain (selection of
    the last tile + lse epilogue)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        m_s[:] = jnp.full_like(m_s, NEG)
        s_s[:] = jnp.zeros_like(s_s)
        vals_ref[:] = jnp.full_like(vals_ref, NEG)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    @pl.when(j < n_v)
    def _():
        sc_s[j % 2] = jnp.dot(x_ref[:], t_ref[:],
                              preferred_element_type=jnp.float32)

    @pl.when(j > 0)
    def _():
        jj = j - 1                                    # tile being selected
        scores = sc_s[jj % 2]
        col = (jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
               + jj * block_v)
        scores = jnp.where(col < v_logical, scores, NEG)

        m_old = m_s[:]
        m_new = jnp.maximum(m_old, jnp.max(scores, -1, keepdims=True))
        s_s[:] = (s_s[:] * jnp.exp(m_old - m_new)
                  + jnp.sum(jnp.exp(scores - m_new), -1, keepdims=True))
        m_s[:] = m_new

        comb_v = jnp.concatenate([scores, vals_ref[:]], -1)
        comb_i = jnp.concatenate([col, idx_ref[:]], -1)
        new_v, new_i = [], []
        for _ in range(kc):
            m = jnp.max(comb_v, -1, keepdims=True)
            hit = comb_v == m
            ci = jnp.min(jnp.where(hit, comb_i, jnp.int32(2 ** 30)), -1,
                         keepdims=True)
            comb_v = jnp.where(hit & (comb_i == ci), NEG, comb_v)
            new_v.append(m)
            new_i.append(ci)
        rb = comb_v.shape[0]
        new_v.append(jnp.full((rb, _KPAD - kc), NEG, jnp.float32))
        new_i.append(jnp.zeros((rb, _KPAD - kc), jnp.int32))
        vals_ref[:] = jnp.concatenate(new_v, -1)
        idx_ref[:] = jnp.concatenate(new_i, -1)

    @pl.when(j == n_v)
    def _():
        lse_ref[:] = m_s[:] + jnp.log(s_s[:])


@functools.partial(jax.jit, static_argnames=("kc", "block_r", "block_v",
                                             "interpret", "pipeline",
                                             "prune"))
def generator_topk_lse(x: jnp.ndarray, table_t: jnp.ndarray, kc: int,
                       block_r: int = 320, block_v: int = 2048,
                       interpret: bool = False, pipeline: bool = False,
                       scale: jnp.ndarray | None = None,
                       prune: bool = False):
    """Fused ``top_k(x @ table_t, kc)`` + ``logsumexp(x @ table_t)``.

    x [R, E] (bf16/f32), table_t [E, V] -> (vals [R, kc] f32,
    idx [R, kc] i32, lse [R] f32).  The [R, V] logits never exist in HBM.

    ``pipeline=True`` selects the software-pipelined kernel (matmul of
    vocab tile j overlaps selection of tile j-1 via a double-buffered
    VMEM score scratch); bit-identical outputs, measured dispatch.

    ``scale`` [V] f32: int8-table mode (round 5, VERDICT r4 #1) --
    ``table_t`` is the TRANSPOSED per-row-quantized int8 table and
    logits are ``scale_v * (x @ q_v)``, the same math as the XLA
    quantized tied generator (ops/layers.Embeddings.attend).  Halves the
    dominant HBM stream (the [E, V] table crosses HBM once per row
    block).  Serial kernel only.

    ``prune=True`` (round 5): skip the kc selection passes for any vocab
    tile whose per-row max cannot displace any row's running kc-th value
    -- exact (see the kernel comment), data-dependent win on
    frequency-sorted vocabs where trained generators concentrate top-k
    mass in the low tiles.  Serial kernel only; measured dispatch.
    """
    assert 0 < kc <= _KPAD
    assert not (prune and pipeline), "prune is serial-kernel only"
    r, e = x.shape
    e2, v = table_t.shape
    assert e == e2, (x.shape, table_t.shape)
    assert scale is None or not pipeline, (
        "int8-table mode is serial-kernel only")
    rp = _ceil_to(r, block_r)
    vp = _ceil_to(v, block_v)
    ep = _ceil_to(e, 128)
    if rp != r or ep != e:
        x = jnp.pad(x, ((0, rp - r), (0, ep - e)))
    if vp != v or ep != e:
        table_t = jnp.pad(table_t, ((0, ep - e), (0, vp - v)))
    if scale is not None:
        scale = jnp.pad(scale.astype(jnp.float32).reshape(1, v),
                        ((0, 0), (0, vp - v)))
    n_r, n_v = rp // block_r, vp // block_v

    if pipeline:
        kern = functools.partial(_beamgen_pipelined_kernel, kc=kc,
                                 v_logical=v, block_v=block_v, n_v=n_v)
        grid = (n_r, n_v + 1)
        # step n_v only drains; clamp the table block index
        t_map = lambda i, j: (0, jax.lax.min(j, n_v - 1))
        scratch = [
            pltpu.VMEM((2, block_r, block_v), jnp.float32),  # score pingpong
            pltpu.VMEM((block_r, 1), jnp.float32),           # running max
            pltpu.VMEM((block_r, 1), jnp.float32),           # running sumexp
        ]
    else:
        kern = functools.partial(_beamgen_kernel, kc=kc, v_logical=v,
                                 block_v=block_v, n_v=n_v,
                                 has_scale=scale is not None, prune=prune)
        grid = (n_r, n_v)
        t_map = lambda i, j: (0, j)
        scratch = [
            pltpu.VMEM((block_r, 1), jnp.float32),   # running max
            pltpu.VMEM((block_r, 1), jnp.float32),   # running sumexp
        ]
    in_specs = [
        pl.BlockSpec((block_r, ep), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ep, block_v), t_map,
                     memory_space=pltpu.VMEM),
    ]
    operands = [x, table_t]
    if scale is not None:
        in_specs.append(pl.BlockSpec((1, block_v), lambda i, j: (0, j),
                                     memory_space=pltpu.VMEM))
        operands.append(scale)
    vals, idx, lse = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((block_r, _KPAD), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, _KPAD), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rp, _KPAD), jnp.float32),
            jax.ShapeDtypeStruct((rp, _KPAD), jnp.int32),
            jax.ShapeDtypeStruct((rp, 1), jnp.float32),
        ],
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * rp * ep * vp + 5 * kc * rp * vp,
            bytes_accessed=(ep * vp * table_t.dtype.itemsize * n_r
                            + rp * ep * x.dtype.itemsize
                            + rp * (2 * _KPAD + 1) * 4),
            transcendentals=rp * vp,
        ),
        interpret=interpret,
    )(*operands)
    return vals[:r, :kc], idx[:r, :kc], lse[:r, 0]


def generator_topk_lse_reference(x: jnp.ndarray, table_t: jnp.ndarray,
                                 kc: int,
                                 scale: jnp.ndarray | None = None):
    """XLA reference: materialized logits -> top_k + logsumexp (exactly
    what decode/beam.py does today on raw logits).  ``scale`` [V]
    selects the int8-table math (``scale_v * (x @ q_v)``, the quantized
    tied generator -- ops/layers.Embeddings.attend)."""
    if scale is not None:
        logits = jnp.dot(x, table_t.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        logits = logits * scale.astype(jnp.float32)[None, :]
    else:
        logits = jnp.dot(x, table_t,
                         preferred_element_type=jnp.float32)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    vals, idx = jax.lax.top_k(logits, kc)
    return vals, idx.astype(jnp.int32), lse
