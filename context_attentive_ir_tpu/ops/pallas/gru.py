"""Fused GRU sequence kernel (Pallas / Mosaic TPU).

Closes VERDICT round-1 missing item #4: ``--rnn_type gru`` (SURVEY.md
SS2.3) previously always fell back to the ``lax.scan`` path, silently
losing the fused-kernel win that the LSTM default gets.

Same design as ``ops/pallas/lstm.py::lstm_pallas_fused`` (see that module
for the full rationale): grid = (batch_tiles, time_chunks), hidden state in
VMEM scratch across the row-major grid walk, input projection computed
INSIDE the kernel with all weights VMEM-resident so the ``[B, T, 3H]`` gate
tensor never touches HBM.  Gate semantics are torch-exact (``r, z, n``
ordering, separate ``b_hh`` for the n-gate: ``n = tanh(xn + r * (h@W_hn +
b_hn))``) matching ``ops.rnn.gru_scan`` -- verified in
tests/test_pallas_gru.py.

Backward: a chunked-rematerialization kernel like the LSTM pair (boundary
h saved per chunk, forward recomputed in-chunk, dW accumulated in
VMEM-resident output blocks) -- with the GRU-specific detail that the
hh-side gate gradient differs from the ih-side in the n slot
(``n = tanh(xn + r*(h@W_hn + b_hn))`` => ``d a_n^hh = da_n * r``).
``RNNLayer`` dispatches the pair for training whenever shapes qualify and
for inference below the measured scan/kernel crossover (ops/rnn.py).

Alignment contract: H % 128 == 0; the embedding dim is zero-padded to the
lane width internally (zero w_ih rows make it exact).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..rnn import gru_scan as _scan_reference
from .lstm import _pad_embed, _round_up


def gru_fused_supported(embed: int, hidden: int, batch: int) -> bool:
    del embed
    return hidden % 128 == 0 and batch >= 8


def _gru_fused_kernel(x_ref, mask_ref, wih_ref, bih_ref, whh_ref, bhh_ref,
                      out_ref, h_scr, *, h: int, e: int, tc: int,
                      reverse: bool):
    """One (batch_tile, time_chunk) grid step, tc timesteps.

    x_ref    [TB, tc*E]   embedded tokens for this chunk
    mask_ref [tc, 1, TB]  per-step validity
    wih_ref  [E, 3H]      input projection (VMEM-resident)
    bih_ref  [1, 3H]      input bias
    whh_ref  [H, 3H]      recurrent weights (VMEM-resident)
    bhh_ref  [1, 3H]      recurrent bias (separate: torch n-gate semantics)
    out_ref  [TB, tc*H]   hidden states
    h_scr    [TB, H]      carried state (f32)
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        h_scr[:] = jnp.zeros_like(h_scr)

    hs = h_scr[:]
    steps = range(tc - 1, -1, -1) if reverse else range(tc)
    for k in steps:
        x_t = x_ref[:, k * e:(k + 1) * e]
        xp = jnp.dot(x_t, wih_ref[:], preferred_element_type=jnp.float32)
        xp += bih_ref[0, :].astype(jnp.float32)[None, :]
        hp = jnp.dot(hs.astype(whh_ref.dtype), whh_ref[:],
                     preferred_element_type=jnp.float32)
        hp += bhh_ref[0, :].astype(jnp.float32)[None, :]
        r = jax.nn.sigmoid(xp[:, :h] + hp[:, :h])
        z = jax.nn.sigmoid(xp[:, h:2 * h] + hp[:, h:2 * h])
        n = jnp.tanh(xp[:, 2 * h:] + r * hp[:, 2 * h:])
        h_new = (1.0 - z) * n + z * hs
        m = mask_ref[k, 0, :][:, None].astype(jnp.float32)
        hs = m * h_new + (1.0 - m) * hs
        out_ref[:, k * h:(k + 1) * h] = (hs * m).astype(out_ref.dtype)
    h_scr[:] = hs


@functools.partial(jax.jit,
                   static_argnames=("reverse", "block_b", "time_chunk",
                                    "interpret"))
def _gru_fused_impl(x, mask, w_ih, b_ih, w_hh, b_hh, reverse: bool = False,
                    block_b: int = 512, time_chunk: int = 6,
                    interpret: bool = False):
    # time_chunk tuned on v5e at the dispatch size (2000 rows, 30x256->
    # 128 bf16): tc=6 3.10 ms vs tc=8 3.84 / tc=10 3.48 (PERF.md r2)
    x, w_ih, _E_orig = _pad_embed(x, w_ih)
    B, T, E = x.shape
    H = w_hh.shape[0]
    assert H % 128 == 0, "fused GRU kernel needs 128-aligned hidden"
    if B <= block_b:
        Bp = TB = _round_up(B, 16)
    else:
        TB = _round_up(block_b, 128)
        Bp = _round_up(B, TB)
    TC = min(time_chunk, T)
    Tp = _round_up(T, TC)

    if Bp != B or Tp != T:
        x = jnp.pad(x, ((0, Bp - B), (0, Tp - T), (0, 0)))
        mask = jnp.pad(mask, ((0, Bp - B), (0, Tp - T)))
    x2 = x.reshape(Bp, Tp * E)
    mask_i = mask.astype(jnp.int32).T[:, None, :]   # [Tp, 1, Bp]
    bih2 = b_ih.reshape(1, -1)
    bhh2 = b_hh.reshape(1, -1)

    n_chunks = Tp // TC
    tsel = ((lambda t: n_chunks - 1 - t) if reverse else (lambda t: t))

    out = pl.pallas_call(
        functools.partial(_gru_fused_kernel, h=H, e=E, tc=TC,
                          reverse=reverse),
        grid=(Bp // TB, n_chunks),
        in_specs=[
            pl.BlockSpec((TB, TC * E), lambda bb, t: (bb, tsel(t)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, 1, TB), lambda bb, t: (tsel(t), 0, bb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 3 * H), lambda bb, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * H), lambda bb, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 3 * H), lambda bb, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * H), lambda bb, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, TC * H), lambda bb, t: (bb, tsel(t)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Tp * H), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((TB, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * Tp * (E + H) * 3 * H,
            bytes_accessed=(Bp * Tp * (E + H) + (E + H) * 3 * H)
            * x.dtype.itemsize,
            transcendentals=Bp * Tp * H * 3,
        ),
        interpret=interpret,
    )(x2, mask_i, w_ih, bih2, w_hh, bhh2)
    return out.reshape(Bp, Tp, H)[:B, :T]


# -- backward: chunked rematerialization ------------------------------------
#
# Same design as the LSTM pair (ops/pallas/lstm.py): the residual forward
# additionally emits the carried h at each chunk boundary; the backward
# kernel walks chunks in reverse processing order, recomputes the forward
# inside the chunk, and runs the cell backward with dW_ih / dW_hh / db
# accumulated in VMEM-resident output blocks.  GRU subtlety: the hh-side
# gate gradient differs from the ih-side in the n slot (d(a_n^hh) =
# da_n * r because n = tanh(xn + r * hn)), so the two concats are built
# separately.


def _gru_fused_res_kernel(x_ref, mask_ref, wih_ref, bih_ref, whh_ref,
                          bhh_ref, out_ref, hb_ref, h_scr, *, h: int,
                          e: int, tc: int, reverse: bool):
    """Forward + chunk-boundary residuals (same math as the fwd kernel)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        h_scr[:] = jnp.zeros_like(h_scr)

    hb_ref[0] = h_scr[:]
    _gru_fused_kernel(x_ref, mask_ref, wih_ref, bih_ref, whh_ref, bhh_ref,
                      out_ref, h_scr, h=h, e=e, tc=tc, reverse=reverse)


def _gru_fused_bwd_kernel(x_ref, mask_ref, wih_ref, bih_ref, whh_ref,
                          bhh_ref, wih_t_ref, whh_t_ref, hb_ref, dout_ref,
                          dx_ref, dwih_ref, dwhh_ref, dbih_ref, dbhh_ref,
                          dh_scr, *, h: int, e: int, tc: int,
                          reverse: bool):
    """One (batch_tile, chunk) backward step (chunks in reverse order)."""
    bb = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init_carry():
        dh_scr[:] = jnp.zeros_like(dh_scr)

    @pl.when(jnp.logical_and(bb == 0, j == 0))
    def _init_acc():
        dwih_ref[:] = jnp.zeros_like(dwih_ref)
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)
        dbih_ref[:] = jnp.zeros_like(dbih_ref)
        dbhh_ref[:] = jnp.zeros_like(dbhh_ref)

    cdt = whh_ref.dtype

    # --- recompute the forward inside this chunk from its boundary ---------
    hs = hb_ref[0]
    ks = list(range(tc - 1, -1, -1) if reverse else range(tc))
    saved = []  # per step: (h_prev, r, z, n, hn, m)
    for k in ks:
        x_t = x_ref[:, k * e:(k + 1) * e]
        xp = jnp.dot(x_t, wih_ref[:], preferred_element_type=jnp.float32)
        xp += bih_ref[0, :].astype(jnp.float32)[None, :]
        hp = jnp.dot(hs.astype(cdt), whh_ref[:],
                     preferred_element_type=jnp.float32)
        hp += bhh_ref[0, :].astype(jnp.float32)[None, :]
        r = jax.nn.sigmoid(xp[:, :h] + hp[:, :h])
        z = jax.nn.sigmoid(xp[:, h:2 * h] + hp[:, h:2 * h])
        hn = hp[:, 2 * h:]
        n = jnp.tanh(xp[:, 2 * h:] + r * hn)
        h_new = (1.0 - z) * n + z * hs
        m = mask_ref[k, 0, :][:, None].astype(jnp.float32)
        saved.append((hs, r, z, n, hn, m))
        hs = m * h_new + (1.0 - m) * hs

    # --- reverse pass over the chunk ---------------------------------------
    dh = dh_scr[:]
    for k, (h_prev, r, z, n, hn, m) in zip(reversed(ks), reversed(saved)):
        dout_t = dout_ref[:, k * h:(k + 1) * h].astype(jnp.float32)
        # out[k] = m*h_new, carry = m*h_new + (1-m)*h_prev: the output
        # grad reaches only h_new; the mask pass-through only the carry
        dh_new = m * (dout_t + dh)
        dh = (1.0 - m) * dh
        dz = dh_new * (h_prev.astype(jnp.float32) - n)
        dn = dh_new * (1.0 - z)
        dh += dh_new * z
        da_n = dn * (1.0 - n * n)
        dr = da_n * hn
        dhn = da_n * r
        da_r = dr * r * (1.0 - r)
        da_z = dz * z * (1.0 - z)
        dg_ih = jnp.concatenate([da_r, da_z, da_n], axis=-1)   # [TB, 3H]
        dg_hh = jnp.concatenate([da_r, da_z, dhn], axis=-1)    # [TB, 3H]
        dg_ih_c = dg_ih.astype(cdt)
        dg_hh_c = dg_hh.astype(cdt)
        dx_ref[:, k * e:(k + 1) * e] = jnp.dot(
            dg_ih_c, wih_t_ref[:],
            preferred_element_type=jnp.float32).astype(dx_ref.dtype)
        dh += jnp.dot(dg_hh_c, whh_t_ref[:],
                      preferred_element_type=jnp.float32)
        x_t = x_ref[:, k * e:(k + 1) * e]
        dwih_ref[:] += jax.lax.dot_general(
            x_t, dg_ih_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dwih_ref.dtype)
        dwhh_ref[:] += jax.lax.dot_general(
            h_prev.astype(cdt), dg_hh_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dwhh_ref.dtype)
        dbih_ref[:] += jnp.sum(dg_ih, axis=0, keepdims=True)
        dbhh_ref[:] += jnp.sum(dg_hh, axis=0, keepdims=True)
    dh_scr[:] = dh


def _gru_tiles(B, T, block_b, time_chunk):
    if B <= block_b:
        Bp = TB = _round_up(B, 16)
    else:
        TB = _round_up(block_b, 128)
        Bp = _round_up(B, TB)
    TC = min(time_chunk, T)
    Tp = _round_up(T, TC)
    return Bp, TB, TC, Tp


@functools.partial(jax.jit,
                   static_argnames=("reverse", "block_b", "time_chunk",
                                    "interpret"))
def _gru_fused_res_impl(x, mask, w_ih, b_ih, w_hh, b_hh,
                        reverse: bool = False, block_b: int = 256,
                        time_chunk: int = 6, interpret: bool = False):
    """Forward returning (out, h_bnd) for the kernel backward."""
    x, w_ih, _E = _pad_embed(x, w_ih)
    B, T, E = x.shape
    H = w_hh.shape[0]
    Bp, TB, TC, Tp = _gru_tiles(B, T, block_b, time_chunk)
    if Bp != B or Tp != T:
        x = jnp.pad(x, ((0, Bp - B), (0, Tp - T), (0, 0)))
        mask = jnp.pad(mask, ((0, Bp - B), (0, Tp - T)))
    x2 = x.reshape(Bp, Tp * E)
    mask_i = mask.astype(jnp.int32).T[:, None, :]
    bih2 = b_ih.reshape(1, -1)
    bhh2 = b_hh.reshape(1, -1)
    n_chunks = Tp // TC
    tsel = ((lambda t: n_chunks - 1 - t) if reverse else (lambda t: t))

    out, hb = pl.pallas_call(
        functools.partial(_gru_fused_res_kernel, h=H, e=E, tc=TC,
                          reverse=reverse),
        grid=(Bp // TB, n_chunks),
        in_specs=[
            pl.BlockSpec((TB, TC * E), lambda bb, t: (bb, tsel(t)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, 1, TB), lambda bb, t: (tsel(t), 0, bb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 3 * H), lambda bb, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * H), lambda bb, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 3 * H), lambda bb, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * H), lambda bb, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TB, TC * H), lambda bb, t: (bb, tsel(t)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, H), lambda bb, t: (tsel(t), bb, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, Tp * H), x.dtype),
            jax.ShapeDtypeStruct((n_chunks, Bp, H), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((TB, H), jnp.float32),
        ],
        interpret=interpret,
    )(x2, mask_i, w_ih, bih2, w_hh, bhh2)
    return out.reshape(Bp, Tp, H)[:B, :T], hb


@functools.partial(jax.jit,
                   static_argnames=("reverse", "block_b", "time_chunk",
                                    "interpret"))
def _gru_fused_bwd_impl(x, mask, w_ih, b_ih, w_hh, b_hh, hb, dout,
                        reverse: bool = False, block_b: int = 256,
                        time_chunk: int = 6, interpret: bool = False):
    x, w_ih, E_orig = _pad_embed(x, w_ih)
    B, T, E = x.shape
    H = w_hh.shape[0]
    Bp, TB, TC, Tp = _gru_tiles(B, T, block_b, time_chunk)
    if Bp != B or Tp != T:
        x = jnp.pad(x, ((0, Bp - B), (0, Tp - T), (0, 0)))
        mask = jnp.pad(mask, ((0, Bp - B), (0, Tp - T)))
        dout = jnp.pad(dout, ((0, Bp - B), (0, Tp - T), (0, 0)))
    x2 = x.reshape(Bp, Tp * E)
    dout2 = dout.reshape(Bp, Tp * H)
    mask_i = mask.astype(jnp.int32).T[:, None, :]
    bih2 = b_ih.reshape(1, -1)
    bhh2 = b_hh.reshape(1, -1)
    n_chunks = Tp // TC
    tsel_f = ((lambda t: n_chunks - 1 - t) if reverse else (lambda t: t))
    jsel = lambda j: tsel_f(n_chunks - 1 - j)

    dx, dwih, dwhh, dbih, dbhh = pl.pallas_call(
        functools.partial(_gru_fused_bwd_kernel, h=H, e=E, tc=TC,
                          reverse=reverse),
        grid=(Bp // TB, n_chunks),
        in_specs=[
            pl.BlockSpec((TB, TC * E), lambda bb, j: (bb, jsel(j)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, 1, TB), lambda bb, j: (jsel(j), 0, bb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 3 * H), lambda bb, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * H), lambda bb, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 3 * H), lambda bb, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * H), lambda bb, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * H, E), lambda bb, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * H, H), lambda bb, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, H), lambda bb, j: (jsel(j), bb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, TC * H), lambda bb, j: (bb, jsel(j)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TB, TC * E), lambda bb, j: (bb, jsel(j)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 3 * H), lambda bb, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 3 * H), lambda bb, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * H), lambda bb, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * H), lambda bb, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, Tp * E), x.dtype),
            jax.ShapeDtypeStruct((E, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((H, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * H), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((TB, H), jnp.float32),
        ],
        interpret=interpret,
    )(x2, mask_i, w_ih, bih2, w_hh, bhh2, w_ih.T, w_hh.T, hb, dout2)
    dx = dx.reshape(Bp, Tp, E)[:B, :T, :E_orig]
    return (dx, dwih[:E_orig].astype(w_ih.dtype),
            dbih[0].astype(b_ih.dtype), dwhh.astype(w_hh.dtype),
            dbhh[0].astype(b_hh.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def gru_pallas_fused(x, mask, w_ih, b_ih, w_hh, b_hh,
                     reverse: bool = False):
    """Fused (input projection + recurrence) masked GRU.

    x [B, T, E] embedded tokens -> hidden states [B, T, H]; zero initial
    state; torch gate semantics.  Differentiable: on TPU the backward is
    the chunked-remat kernel above; elsewhere it falls back to an XLA
    scan replay.
    """
    return _gru_fused_impl(x, mask, w_ih, b_ih, w_hh, b_hh, reverse=reverse)


def gru_pallas_reference(x, mask, w_ih, b_ih, w_hh, b_hh, reverse=False):
    """The scan implementation with the same restricted contract (tests)."""
    B = x.shape[0]
    H = w_hh.shape[0]
    h0 = jnp.zeros((B, H), x.dtype)
    out, _ = _scan_reference(x @ w_ih + b_ih, mask, w_hh, b_hh, h0,
                             reverse=reverse)
    return out


def _gru_fwd(x, mask, w_ih, b_ih, w_hh, b_hh, reverse):
    if jax.default_backend() == "tpu":
        out, hb = _gru_fused_res_impl(x, mask, w_ih, b_ih, w_hh, b_hh,
                                      reverse=reverse)
        return out, (x, mask, w_ih, b_ih, w_hh, b_hh, hb)
    out = _gru_fused_impl(x, mask, w_ih, b_ih, w_hh, b_hh, reverse=reverse)
    return out, (x, mask, w_ih, b_ih, w_hh, b_hh, None)


def _gru_bwd(reverse, res, g):
    x, mask, w_ih, b_ih, w_hh, b_hh, hb = res
    if hb is not None:
        dx, dwih, dbih, dwhh, dbhh = _gru_fused_bwd_impl(
            x, mask, w_ih, b_ih, w_hh, b_hh, hb, g, reverse=reverse)
        return dx, None, dwih, dbih, dwhh, dbhh

    def ref(x, w_ih, b_ih, w_hh, b_hh):
        return gru_pallas_reference(x, mask, w_ih, b_ih, w_hh, b_hh,
                                    reverse=reverse)

    _, vjp = jax.vjp(ref, x, w_ih, b_ih, w_hh, b_hh)
    dx, dwih, dbih, dwhh, dbhh = vjp(g)
    return dx, None, dwih, dbih, dwhh, dbhh


gru_pallas_fused.defvjp(_gru_fwd, _gru_bwd)
