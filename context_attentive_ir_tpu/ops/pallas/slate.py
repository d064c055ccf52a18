"""Fused slate-interaction kernel: query-aware attention pooling.

The second native kernel family from the north star (BASELINE.json:5
"match-tensor and attention interaction scoring become batched MXU einsum
kernels"; SURVEY.md SS7 step 8 "fused slate-interaction kernel";
VERDICT round-1 missing item #2).

What it replaces: ``ops.attention.AttentionPool`` applied to the CARS
document slate -- for every candidate document, pool its ``[Ld, H]`` token
states into one vector attended by the query vector:

    h_t    = tanh(states_t @ W_p + b_p)          # [Ld, H]
    s_t    = h_t . q                             # [Ld]
    align  = masked_softmax(s, mask)             # [Ld]
    pooled = sum_t align_t * states_t            # [H]

Why a kernel: at CARS bench shapes the slate token states are
``[B*S*N, Ld, H] = [16000, 30, 256]`` bf16 (~245 MB).  The XLA graph
materializes the ``tanh`` projection (another ~245 MB round-trip) and walks
``states`` again for the weighted sum -- ~3 full HBM passes for an op whose
math is one small matmul per token.  This kernel streams each row block
through VMEM ONCE and keeps every intermediate (projection, scores, softmax
statistics, accumulator) in registers/VMEM: HBM traffic drops to
(read states + write pooled), an ~8 MB output.

Formulation: an *online softmax* (flash-attention style) over the token
axis -- running max ``m``, running denominator ``s``, running weighted sum
``acc`` are rescaled as each token's score arrives, so no ``[TR, Ld]``
score tensor is ever stored:

    m'   = max(m, sc_t)
    a    = exp(m - m')
    p    = exp(sc_t - m') * mask_t
    s'   = s * a + p
    acc' = acc * a + p * states_t

This matches ``masked_softmax`` exactly (masked positions contribute zero;
fully-masked rows pool to zeros) with f32 statistics throughout.

Grid: one axis over row blocks of TR; the whole token/feature extent of a
row block lives in one VMEM block ([TR, Ld*H] reshaped row-major, a free
reshape).  The per-token projection ``[TR, H] @ [H, H]`` runs on the MXU
with f32 accumulation; softmax statistics update on the VPU.

Contract: H % 128 == 0 (lane-aligned features).  Ld is arbitrary.
Backward: XLA replay of the reference formulation (the pool is cheap to
re-differentiate; the kernel win is the forward's HBM traffic).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..masking import masked_softmax


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pool_supported(hidden: int, rows: int) -> bool:
    """Whether the fused pool kernel handles this shape."""
    return hidden % 128 == 0 and rows >= 8


def attn_pool_reference(states, mask, query, w_p, b_p):
    """XLA formulation with the same contract (tests + backward).

    states [R, T, H], mask bool [R, T], query [R, H] -> pooled [R, H].
    Matches ``ops.attention.AttentionPool`` with an external query.
    """
    h = jnp.tanh(jnp.dot(states, w_p) + b_p)
    scores = jnp.einsum("rth,rh->rt", h, query)
    align = masked_softmax(scores, mask, axis=-1)
    return jnp.einsum("rt,rth->rh", align, states)


def _pool_kernel(x_ref, mask_ref, q_ref, wp_ref, bp_ref, out_ref,
                 m_scr, s_scr, acc_scr, *, h: int, tc: int,
                 n_chunks: int):
    """One (row_tile, time_chunk) grid step covering ``tc`` tokens.

    Chunking the token axis bounds Mosaic's stack allocation (a fully
    unrolled T-step loop OOMs scoped VMEM at T=30); the online-softmax
    statistics carry across chunks in f32 VMEM scratch, exactly like the
    LSTM kernel's hidden state.

    x_ref    [TR, tc*H]  token states for this chunk (row-major reshape)
    mask_ref [tc, 1, TR] validity (time-major, like the LSTM kernel)
    q_ref    [TR, H]     query vectors
    wp_ref   [H, H]      pool projection (VMEM-resident)
    bp_ref   [1, H]      pool bias
    out_ref  [TR, H]     pooled vectors (written at the last chunk)
    m/s/acc  scratch     running max / denominator / weighted sum
    """
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        s_scr[:] = jnp.zeros_like(s_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[:].astype(jnp.float32)
    bp = bp_ref[0, :].astype(jnp.float32)[None, :]
    m_run = m_scr[:]
    s_run = s_scr[:]
    acc = acc_scr[:]
    for k in range(tc):
        x_t = x_ref[:, k * h:(k + 1) * h]
        proj = jnp.dot(x_t, wp_ref[:],
                       preferred_element_type=jnp.float32) + bp
        hp = jnp.tanh(proj)
        sc = jnp.sum(hp * q, axis=-1, keepdims=True)      # [TR, 1]
        mk = mask_ref[k, 0, :][:, None].astype(jnp.float32)   # [TR, 1]
        sc = jnp.where(mk > 0, sc, -1e30)
        m_new = jnp.maximum(m_run, sc)
        alpha = jnp.exp(m_run - m_new)
        p = jnp.exp(sc - m_new) * mk
        s_run = s_run * alpha + p
        acc = acc * alpha + p * x_t.astype(jnp.float32)
        m_run = m_new
    m_scr[:] = m_run
    s_scr[:] = s_run
    acc_scr[:] = acc

    @pl.when(c == n_chunks - 1)
    def _emit():
        pooled = acc / jnp.maximum(s_run, 1e-13)
        out_ref[:] = pooled.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("block_r", "time_chunk", "interpret"))
def _pool_fused_impl(states, mask, query, w_p, b_p,
                     block_r: int = 128, time_chunk: int = 6,
                     interpret: bool = False):
    R, T, H = states.shape
    assert H % 128 == 0, "pool kernel needs 128-aligned features"
    TR = min(_round_up(block_r, 16), _round_up(R, 16))
    Rp = _round_up(R, TR)
    TC = min(time_chunk, T)
    Tp = _round_up(T, TC)
    if Rp != R or Tp != T:
        states = jnp.pad(states, ((0, Rp - R), (0, Tp - T), (0, 0)))
        mask = jnp.pad(mask, ((0, Rp - R), (0, Tp - T)))
        query = jnp.pad(query, ((0, Rp - R), (0, 0)))
    x2 = states.reshape(Rp, Tp * H)                # free reshape, no copy
    mask_i = mask.astype(jnp.int32).T[:, None, :]  # [Tp, 1, Rp] (tiny)
    bp2 = b_p.reshape(1, -1)
    n_chunks = Tp // TC

    out = pl.pallas_call(
        functools.partial(_pool_kernel, h=H, tc=TC, n_chunks=n_chunks),
        grid=(Rp // TR, n_chunks),
        in_specs=[
            pl.BlockSpec((TR, TC * H), lambda r, c: (r, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, 1, TR), lambda r, c: (c, 0, r),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, H), lambda r, c: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H), lambda r, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda r, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, H), lambda r, c: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, H), states.dtype),
        scratch_shapes=[
            pltpu.VMEM((TR, 1), jnp.float32),
            pltpu.VMEM((TR, 1), jnp.float32),
            pltpu.VMEM((TR, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Rp * Tp * H * H,
            bytes_accessed=(Rp * Tp * H + Rp * 2 * H + H * H)
            * states.dtype.itemsize,
            transcendentals=Rp * Tp * (H + 2),
        ),
        interpret=interpret,
    )(x2, mask_i, query, w_p, bp2)
    return out[:R]


@jax.custom_vjp
def attn_pool_pallas(states: jnp.ndarray, mask: jnp.ndarray,
                     query: jnp.ndarray, w_p: jnp.ndarray,
                     b_p: jnp.ndarray) -> jnp.ndarray:
    """Fused query-aware attention pooling.

    states [R, T, H], mask bool [R, T], query [R, H] -> pooled [R, H].
    Forward is the Pallas streaming kernel; backward replays the XLA
    reference (see module docstring).
    """
    return _pool_fused_impl(states, mask, query, w_p, b_p)


def _pool_fwd(states, mask, query, w_p, b_p):
    out = attn_pool_pallas(states, mask, query, w_p, b_p)
    return out, (states, mask, query, w_p, b_p)


def _pool_bwd(res, g):
    states, mask, query, w_p, b_p = res

    def ref(states, query, w_p, b_p):
        return attn_pool_reference(states, mask, query, w_p, b_p)

    _, vjp = jax.vjp(ref, states, query, w_p, b_p)
    ds, dq, dwp, dbp = vjp(g)
    return ds, None, dq, dwp, dbp


attn_pool_pallas.defvjp(_pool_fwd, _pool_bwd)
