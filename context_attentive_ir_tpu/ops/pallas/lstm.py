"""Fused LSTM sequence kernel (Pallas / Mosaic TPU).

The TPU-native replacement for the reference's cuDNN-backed ``nn.LSTM`` hot
path (SURVEY.md SS2.12: the rebuild's native-code obligation is Pallas
kernels; BASELINE.json:5 "fused Pallas RNN kernels").

Why a kernel: ``lax.scan`` lowers the recurrence to T sequential loop
iterations; each step's tiny ``[B, H] @ [H, 4H]`` matmul round-trips h/c
through HBM and pays loop overhead.  This kernel runs the whole sequence in
ONE pallas_call:

- grid = (batch_tiles, T): TPU iterates the grid row-major, so for a fixed
  batch tile the timesteps arrive in order and the hidden/cell state live
  in VMEM scratch across steps -- zero HBM traffic for the recurrence;
- the input projection ``x @ W_ih + b`` for ALL timesteps is computed
  outside (one big MXU matmul, XLA-fused) exactly like the scan path; the
  kernel consumes it in its natural ``[B, T*4H]`` layout (a free reshape --
  no transpose, no padding);
- the recurrent matmul runs on the MXU with f32 accumulation; gates on the
  VPU; padded timesteps carry state through -- identical masking semantics
  to ``ops.rnn.lstm_scan`` (verified in tests/test_pallas_lstm.py).

Two kernel families live here:

1. ``lstm_pallas``: consumes precomputed gate projections (kept for tests
   and as a building block; measured slower than the scan -- PERF.md).
2. ``lstm_pallas_fused``: the production path.  Computes the input
   projection INSIDE the kernel (weights + state VMEM-resident; the
   [B, T, 4H] gate tensor never touches HBM) and is differentiable via a
   chunked-rematerialization BACKWARD kernel (boundary states saved per
   chunk, forward recomputed in-chunk, dW accumulated in VMEM-resident
   output blocks).  Measured on v5e: forward 1.28x over the XLA
   matmul+scan, training step +27% (PERF.md).

Alignment contract: H (hidden) must be a multiple of 128 (gate chunk
boundaries on the 128-lane registers) -- the framework default
``nhid=128`` is chosen for exactly this (SURVEY.md SS7 design stance).
The embedding dim may be anything (zero-padded to the lane width
internally).  ``fused_supported()`` gates dispatch; unsupported shapes
fall back to the ``lax.scan`` path in ``ops/rnn.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..rnn import lstm_scan as _scan_reference


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _lstm_kernel(xp_ref, mask_ref, whh_ref, out_ref, h_scr, c_scr, *,
                 h: int, tc: int, reverse: bool):
    """One (batch_tile, time_chunk) grid step covering ``tc`` timesteps.

    Chunking amortizes the per-grid-step Mosaic overhead (the dominant cost
    at small [TB, 4H] blocks) across tc sequential cell updates whose
    state stays in VMEM scratch.

    xp_ref   [TB, tc*4H]  input projection slices for this chunk
    mask_ref [tc, 1, TB]  per-step validity (time-major, lane-aligned)
    whh_ref  [H, 4H]      recurrent weights (VMEM-resident)
    out_ref  [TB, tc*H]   hidden states written for this chunk
    h_scr/c_scr [TB, H]   carried state (f32 VMEM scratch)
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    hs = h_scr[:]
    cs = c_scr[:]
    steps = range(tc - 1, -1, -1) if reverse else range(tc)
    for k in steps:
        gates = xp_ref[:, k * 4 * h:(k + 1) * 4 * h].astype(jnp.float32)
        gates += jnp.dot(hs.astype(whh_ref.dtype), whh_ref[:],
                         preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[:, :h])
        f = jax.nn.sigmoid(gates[:, h:2 * h])
        g = jnp.tanh(gates[:, 2 * h:3 * h])
        o = jax.nn.sigmoid(gates[:, 3 * h:])
        c_new = f * cs + i * g
        h_new = o * jnp.tanh(c_new)
        m = mask_ref[k, 0, :][:, None].astype(jnp.float32)
        hs = m * h_new + (1.0 - m) * hs
        cs = m * c_new + (1.0 - m) * cs
        out_ref[:, k * h:(k + 1) * h] = (hs * m).astype(out_ref.dtype)
    h_scr[:] = hs
    c_scr[:] = cs


@functools.partial(jax.jit,
                   static_argnames=("reverse", "block_b", "time_chunk",
                                    "interpret"))
def _lstm_pallas_fwd_impl(x_proj, mask, w_hh, reverse: bool = False,
                          block_b: int = 256, time_chunk: int = 8,
                          interpret: bool = False):
    B, T, G = x_proj.shape
    H = G // 4
    assert H % 128 == 0, "kernel requires hidden % 128 == 0 (see docstring)"
    if B <= block_b:
        Bp = TB = _round_up(B, 16)
    else:
        TB = _round_up(block_b, 128)
        Bp = _round_up(B, TB)
    TC = min(time_chunk, T)
    Tp = _round_up(T, TC)

    xp = x_proj
    if Bp != B or Tp != T:
        # padded timesteps carry zero mask -> state passes through
        xp = jnp.pad(xp, ((0, Bp - B), (0, Tp - T), (0, 0)))
        mask = jnp.pad(mask, ((0, Bp - B), (0, Tp - T)))
    xp2 = xp.reshape(Bp, Tp * G)                   # free reshape, no copy
    mask_i = mask.astype(jnp.int32).T[:, None, :]  # [Tp, 1, Bp] (tiny)

    n_chunks = Tp // TC
    tsel = ((lambda t: n_chunks - 1 - t) if reverse else (lambda t: t))

    out = pl.pallas_call(
        functools.partial(_lstm_kernel, h=H, tc=TC, reverse=reverse),
        grid=(Bp // TB, n_chunks),
        in_specs=[
            pl.BlockSpec((TB, TC * G), lambda b, t: (b, tsel(t)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, 1, TB), lambda b, t: (tsel(t), 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, TC * H), lambda b, t: (b, tsel(t)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Tp * H), x_proj.dtype),
        scratch_shapes=[
            pltpu.VMEM((TB, H), jnp.float32),
            pltpu.VMEM((TB, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * Tp * H * 4 * H,
            bytes_accessed=(Bp * Tp * G + H * G + Bp * Tp * H)
            * x_proj.dtype.itemsize,
            transcendentals=Bp * Tp * H * 5,
        ),
        interpret=interpret,
    )(xp2, mask_i, w_hh)
    return out.reshape(Bp, Tp, H)[:B, :T]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def lstm_pallas(x_proj: jnp.ndarray, mask: jnp.ndarray,
                w_hh: jnp.ndarray, reverse: bool = False) -> jnp.ndarray:
    """Fused-forward masked LSTM over time.

    Same contract as ``ops.rnn.lstm_scan`` restricted to zero initial
    state, returning only the per-step hidden states [B, T, H].
    """
    return _lstm_pallas_fwd_impl(x_proj, mask, w_hh, reverse=reverse)


def _fwd(x_proj, mask, w_hh, reverse):
    return lstm_pallas(x_proj, mask, w_hh, reverse), (x_proj, mask, w_hh)


def _bwd(reverse, res, g):
    x_proj, mask, w_hh = res

    def ref(x_proj, w_hh):
        return lstm_pallas_reference(x_proj, mask, w_hh, reverse=reverse)

    _, vjp = jax.vjp(ref, x_proj, w_hh)
    dxp, dwhh = vjp(g)
    return dxp, None, dwhh


lstm_pallas.defvjp(_fwd, _bwd)


def lstm_pallas_reference(x_proj, mask, w_hh, reverse=False):
    """The scan implementation with the same restricted contract (tests)."""
    B, _, G = x_proj.shape
    H = G // 4
    h0 = jnp.zeros((B, H), x_proj.dtype)
    out, _ = _scan_reference(x_proj, mask, w_hh, h0, h0, reverse=reverse)
    return out


# ---------------------------------------------------------------------------
# Fused variant: input projection INSIDE the kernel
# ---------------------------------------------------------------------------
#
# The scan path (and the kernel above) materialize the gate projections
# ``x @ W_ih`` for the whole sequence in HBM: at CARS bench shapes that is
# ~1 GB written + read back per doc-encoder direction -- the dominant HBM
# traffic of the whole model (PERF.md).  This variant reads only the
# embedded tokens ``x [B, T, E]`` and computes both matmuls per step on the
# MXU with all weights VMEM-resident, so sequence-length traffic drops to
# (read x once + write h once).
#
# Contract: E % 128 == 0 and H % 128 == 0 (TPU lane width).


def fused_supported(embed: int, hidden: int, batch: int) -> bool:
    # any embed dim (padded to the lane width internally); hidden must be
    # lane-aligned (gate chunk boundaries)
    del embed
    return hidden % 128 == 0 and batch >= 8


def _pad_embed(x, w_ih):
    """Zero-pad the embedding axis to the 128-lane boundary (no-op when
    aligned).  Zero rows of w_ih make the padding exact."""
    E = x.shape[-1]
    Ep = _round_up(E, 128)
    if Ep == E:
        return x, w_ih, E
    x = jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, Ep - E),))
    w_ih = jnp.pad(w_ih, ((0, Ep - E), (0, 0)))
    return x, w_ih, E


def _lstm_fused_kernel(x_ref, mask_ref, wih_ref, b_ref, whh_ref, out_ref,
                       h_scr, c_scr, *, h: int, e: int, tc: int,
                       reverse: bool):
    """One (batch_tile, time_chunk) grid step, tc timesteps.

    x_ref    [TB, tc*E]   embedded tokens for this chunk
    mask_ref [tc, 1, TB]  per-step validity
    wih_ref  [E, 4H]      input projection (VMEM-resident)
    b_ref    [1, 4H]      bias
    whh_ref  [H, 4H]      recurrent weights (VMEM-resident)
    out_ref  [TB, tc*H]   hidden states
    h_scr/c_scr [TB, H]   carried state (f32)
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    hs = h_scr[:]
    cs = c_scr[:]
    steps = list(range(tc - 1, -1, -1) if reverse else range(tc))
    bias = b_ref[0, :].astype(jnp.float32)[None, :]
    # HOIST all input-projection dots ahead of the recurrence: they are
    # independent of the carried state, and issuing them back-to-back
    # lets Mosaic pipeline the MXU instead of interleaving each dot with
    # the dependent gate math (round-3 on-chip: 7.22 -> 6.35 ms at
    # [16000, 30, 256]->128; PERF.md r3 ledger)
    xp = {k: jnp.dot(x_ref[:, k * e:(k + 1) * e], wih_ref[:],
                     preferred_element_type=jnp.float32)
          for k in steps}
    for k in steps:
        gates = xp[k] + bias
        gates += jnp.dot(hs.astype(whh_ref.dtype), whh_ref[:],
                         preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[:, :h])
        f = jax.nn.sigmoid(gates[:, h:2 * h])
        g = jnp.tanh(gates[:, 2 * h:3 * h])
        o = jax.nn.sigmoid(gates[:, 3 * h:])
        c_new = f * cs + i * g
        h_new = o * jnp.tanh(c_new)
        m = mask_ref[k, 0, :][:, None].astype(jnp.float32)
        hs = m * h_new + (1.0 - m) * hs
        cs = m * c_new + (1.0 - m) * cs
        out_ref[:, k * h:(k + 1) * h] = (hs * m).astype(out_ref.dtype)
    h_scr[:] = hs
    c_scr[:] = cs


@functools.partial(jax.jit,
                   static_argnames=("reverse", "block_b", "time_chunk",
                                    "interpret"))
def _lstm_fused_impl(x, mask, w_ih, b, w_hh, reverse: bool = False,
                     block_b: int = 128, time_chunk: int = 6,
                     interpret: bool = False):
    # defaults re-tuned on v5e with the hoisted projections (round 3,
    # PERF.md r3 ledger): at 2000 rows (the serving dispatch bucket)
    # hoisted (tc=6, bb=128) 3.63 ms vs unhoisted (6, 512) 3.91 within
    # run; at 16000 rows hoisted bb=128 6.35-6.78 vs 7.2-7.9 unhoisted
    # (bb=512 with hoisting is pathological: 13.6 ms -- the six live
    # [512, 4H] f32 gate buffers spill VMEM)
    x, w_ih, _E_orig = _pad_embed(x, w_ih)
    B, T, E = x.shape
    H = w_hh.shape[0]
    assert H % 128 == 0, "fused kernel needs 128-aligned hidden"
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
    b2 = b.reshape(1, -1)

    n_chunks = Tp // TC
    tsel = ((lambda t: n_chunks - 1 - t) if reverse else (lambda t: t))

    out = pl.pallas_call(
        functools.partial(_lstm_fused_kernel, h=H, e=E, tc=TC,
                          reverse=reverse),
        grid=(Bp // TB, n_chunks),
        in_specs=[
            pl.BlockSpec((TB, TC * E), lambda bb, t: (bb, tsel(t)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, 1, TB), lambda bb, t: (tsel(t), 0, bb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 4 * H), lambda bb, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), lambda bb, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda bb, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, TC * H), lambda bb, t: (bb, tsel(t)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Tp * H), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((TB, H), jnp.float32),
            pltpu.VMEM((TB, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * Tp * (E + H) * 4 * H,
            bytes_accessed=(Bp * Tp * (E + H) + (E + H) * 4 * H)
            * x.dtype.itemsize,
            transcendentals=Bp * Tp * H * 5,
        ),
        interpret=interpret,
    )(x2, mask_i, w_ih, b2, w_hh)
    return out.reshape(Bp, Tp, H)[:B, :T]


# -- backward: chunked rematerialization ------------------------------------
#
# Training-path kernel.  The forward (residual variant) additionally emits
# the carried (h, c) state at each chunk boundary; the backward kernel
# walks chunks in reverse processing order, recomputes the forward inside
# the chunk from its boundary state (cheaper than storing per-step
# activations in HBM), and runs the cell backward: dgates -> dx on the MXU,
# with dW_ih / dW_hh / db accumulated directly in their (VMEM-resident)
# output blocks across the whole grid.  dh/dc carry across chunks in
# scratch, resetting at each batch tile.


def _lstm_fused_res_kernel(x_ref, mask_ref, wih_ref, b_ref, whh_ref,
                           out_ref, hb_ref, cb_ref, h_scr, c_scr, *,
                           h: int, e: int, tc: int, reverse: bool):
    """Forward + chunk-boundary residuals (same math as the fwd kernel)."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        h_scr[:] = jnp.zeros_like(h_scr)
        c_scr[:] = jnp.zeros_like(c_scr)

    hb_ref[0] = h_scr[:]
    cb_ref[0] = c_scr[:]
    _lstm_fused_kernel(x_ref, mask_ref, wih_ref, b_ref, whh_ref, out_ref,
                       h_scr, c_scr, h=h, e=e, tc=tc, reverse=reverse)


def _lstm_fused_bwd_kernel(x_ref, mask_ref, wih_ref, b_ref, whh_ref,
                           wih_t_ref, whh_t_ref, hb_ref, cb_ref, dout_ref,
                           dx_ref, dwih_ref, dwhh_ref, db_ref,
                           dh_scr, dc_scr, *, h: int, e: int, tc: int,
                           reverse: bool):
    """One (batch_tile, chunk) backward step (chunks in reverse order)."""
    bb = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init_carry():
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dc_scr[:] = jnp.zeros_like(dc_scr)

    @pl.when(jnp.logical_and(bb == 0, j == 0))
    def _init_acc():
        dwih_ref[:] = jnp.zeros_like(dwih_ref)
        dwhh_ref[:] = jnp.zeros_like(dwhh_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    cdt = whh_ref.dtype  # compute dtype for MXU operands

    # --- recompute the forward inside this chunk from its boundary ---------
    hs = hb_ref[0]
    cs = cb_ref[0]
    ks = list(range(tc - 1, -1, -1) if reverse else range(tc))
    # hoisted projection dots (independent of the recurrence; see the
    # forward kernel's note)
    xp = {k: jnp.dot(x_ref[:, k * e:(k + 1) * e], wih_ref[:],
                     preferred_element_type=jnp.float32) for k in ks}
    saved = []  # per step: (h_prev, c_prev, i, f, g, o, c_new, m)
    for k in ks:
        gates = xp[k]
        gates += jnp.dot(hs.astype(cdt), whh_ref[:],
                         preferred_element_type=jnp.float32)
        gates += b_ref[0, :].astype(jnp.float32)[None, :]
        i = jax.nn.sigmoid(gates[:, :h])
        f = jax.nn.sigmoid(gates[:, h:2 * h])
        g = jnp.tanh(gates[:, 2 * h:3 * h])
        o = jax.nn.sigmoid(gates[:, 3 * h:])
        c_new = f * cs + i * g
        h_new = o * jnp.tanh(c_new)
        m = mask_ref[k, 0, :][:, None].astype(jnp.float32)
        saved.append((hs, cs, i, f, g, o, c_new, m))
        hs = m * h_new + (1.0 - m) * hs
        cs = m * c_new + (1.0 - m) * cs

    # --- reverse pass over the chunk ---------------------------------------
    dh = dh_scr[:]
    dc = dc_scr[:]
    for k, (h_prev, c_prev, i, f, g, o, c_new, m) in zip(
            reversed(ks), reversed(saved)):
        dout_t = dout_ref[:, k * h:(k + 1) * h].astype(jnp.float32)
        dh_new = m * (dout_t + dh)
        dcn = m * dc
        tanh_c = jnp.tanh(c_new)
        do_ = dh_new * tanh_c
        dcn += dh_new * o * (1.0 - tanh_c * tanh_c)
        df_ = dcn * c_prev
        di_ = dcn * g
        dg_ = dcn * i
        dgates = jnp.concatenate([
            di_ * i * (1.0 - i),
            df_ * f * (1.0 - f),
            dg_ * (1.0 - g * g),
            do_ * o * (1.0 - o),
        ], axis=-1)                                        # [TB, 4H] f32
        dgates_c = dgates.astype(cdt)
        dx_ref[:, k * e:(k + 1) * e] = jnp.dot(
            dgates_c, wih_t_ref[:],
            preferred_element_type=jnp.float32).astype(dx_ref.dtype)
        dh = (1.0 - m) * dh + jnp.dot(
            dgates_c, whh_t_ref[:], preferred_element_type=jnp.float32)
        dc = (1.0 - m) * dc + dcn * f
        x_t = x_ref[:, k * e:(k + 1) * e]
        dwih_ref[:] += jax.lax.dot_general(
            x_t, dgates_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dwih_ref.dtype)
        dwhh_ref[:] += jax.lax.dot_general(
            h_prev.astype(cdt), dgates_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dwhh_ref.dtype)
        db_ref[:] += jnp.sum(dgates, axis=0, keepdims=True)
    dh_scr[:] = dh
    dc_scr[:] = dc


@functools.partial(jax.jit,
                   static_argnames=("reverse", "block_b", "time_chunk",
                                    "interpret"))
def _lstm_fused_res_impl(x, mask, w_ih, b, w_hh, reverse: bool = False,
                         block_b: int = 128, time_chunk: int = 6,
                         interpret: bool = False):
    """Forward returning (out, h_bnd, c_bnd) for the kernel backward.

    Defaults re-tuned round 3 (PERF.md r3 ledger): res+bwd pair (tc=6,
    bb=128) 16.94 ms vs (6, 256) 19.65 at [16000, 30, 256]->128 bf16 --
    the win is the smaller batch tile (unhoisted (6,128) measures 17.01,
    so the pair benefit is tiling, the fwd benefit is the hoist)."""
    x, w_ih, _E_orig = _pad_embed(x, w_ih)
    B, T, E = x.shape
    H = w_hh.shape[0]
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
    mask_i = mask.astype(jnp.int32).T[:, None, :]
    b2 = b.reshape(1, -1)
    n_chunks = Tp // TC
    tsel = ((lambda t: n_chunks - 1 - t) if reverse else (lambda t: t))

    out, hb, cb = pl.pallas_call(
        functools.partial(_lstm_fused_res_kernel, h=H, e=E, tc=TC,
                          reverse=reverse),
        grid=(Bp // TB, n_chunks),
        in_specs=[
            pl.BlockSpec((TB, TC * E), lambda bb, t: (bb, tsel(t)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, 1, TB), lambda bb, t: (tsel(t), 0, bb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 4 * H), lambda bb, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), lambda bb, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda bb, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TB, TC * H), lambda bb, t: (bb, tsel(t)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, H), lambda bb, t: (tsel(t), bb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, H), lambda bb, t: (tsel(t), bb, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, Tp * H), x.dtype),
            jax.ShapeDtypeStruct((n_chunks, Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((n_chunks, Bp, H), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((TB, H), jnp.float32),
            pltpu.VMEM((TB, H), jnp.float32),
        ],
        interpret=interpret,
    )(x2, mask_i, w_ih, b2, w_hh)
    return out.reshape(Bp, Tp, H)[:B, :T], hb, cb


@functools.partial(jax.jit,
                   static_argnames=("reverse", "block_b", "time_chunk",
                                    "interpret"))
def _lstm_fused_bwd_impl(x, mask, w_ih, b, w_hh, hb, cb, dout,
                         reverse: bool = False, block_b: int = 128,
                         time_chunk: int = 6, interpret: bool = False):
    # block_b/time_chunk must match _lstm_fused_res_impl (chunk-boundary
    # layout); defaults re-tuned round 3 (see res impl docstring)
    x, w_ih, E_orig = _pad_embed(x, w_ih)
    B, T, E = x.shape
    H = w_hh.shape[0]
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
        dout = jnp.pad(dout, ((0, Bp - B), (0, Tp - T), (0, 0)))
    x2 = x.reshape(Bp, Tp * E)
    dout2 = dout.reshape(Bp, Tp * H)
    mask_i = mask.astype(jnp.int32).T[:, None, :]
    b2 = b.reshape(1, -1)
    n_chunks = Tp // TC
    # reverse of the forward's processing order
    tsel_f = ((lambda t: n_chunks - 1 - t) if reverse else (lambda t: t))
    jsel = lambda j: tsel_f(n_chunks - 1 - j)

    dx, dwih, dwhh, db = pl.pallas_call(
        functools.partial(_lstm_fused_bwd_kernel, h=H, e=E, tc=TC,
                          reverse=reverse),
        grid=(Bp // TB, n_chunks),
        in_specs=[
            pl.BlockSpec((TB, TC * E), lambda bb, j: (bb, jsel(j)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TC, 1, TB), lambda bb, j: (jsel(j), 0, bb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 4 * H), lambda bb, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), lambda bb, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda bb, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * H, E), lambda bb, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * H, H), lambda bb, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, H), lambda bb, j: (jsel(j), bb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB, H), lambda bb, j: (jsel(j), bb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, TC * H), lambda bb, j: (bb, jsel(j)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TB, TC * E), lambda bb, j: (bb, jsel(j)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, 4 * H), lambda bb, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, 4 * H), lambda bb, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * H), lambda bb, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, Tp * E), x.dtype),
            jax.ShapeDtypeStruct((E, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((H, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((1, 4 * H), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((TB, H), jnp.float32),
            pltpu.VMEM((TB, H), jnp.float32),
        ],
        interpret=interpret,
    )(x2, mask_i, w_ih, b2, w_hh, w_ih.T, w_hh.T, hb, cb, dout2)
    dx = dx.reshape(Bp, Tp, E)[:B, :T, :E_orig]
    return (dx, dwih[:E_orig].astype(w_ih.dtype), db[0].astype(b.dtype),
            dwhh.astype(w_hh.dtype))


@functools.partial(jax.jit,
                   static_argnames=("reverse", "block_b", "time_chunk"))
def _lstm_scan_res_impl(x, mask, w_ih, b, w_hh, reverse: bool = False,
                        block_b: int = 128, time_chunk: int = 6):
    """Scan forward emitting the same (out, h_bnd, c_bnd) residual layout
    as ``_lstm_fused_res_impl`` for the chunked-remat backward kernel.

    Why it exists: the round-2 crossover sweep (PERF.md) showed the XLA
    scan forward beats the fused forward kernel above ~6k rows, while the
    backward KERNEL stays the big training win at every size.  Training at
    large batch therefore runs scan-forward + kernel-backward; the only
    extra cost is emitting the per-step carried (h, c) and slicing the
    chunk boundaries.
    """
    x, w_ih, _E = _pad_embed(x, w_ih)
    B, T, _ = x.shape
    H = w_hh.shape[0]
    if B <= block_b:
        Bp = _round_up(B, 16)
    else:
        TB = _round_up(block_b, 128)
        Bp = _round_up(B, TB)
    TC = min(time_chunk, T)
    Tp = _round_up(T, TC)
    if Bp != B or Tp != T:
        x = jnp.pad(x, ((0, Bp - B), (0, Tp - T), (0, 0)))
        mask = jnp.pad(mask, ((0, Bp - B), (0, Tp - T)))
    n_chunks = Tp // TC

    x_proj = x @ w_ih + b

    def step(carry, inp):
        h, c = carry
        xp, m = inp
        gates = xp + h @ w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        m = m[:, None]
        h = jnp.where(m, h_new, h)
        c = jnp.where(m, c_new, c)
        return (h, c), (h, c)

    h0 = jnp.zeros((Bp, H), x.dtype)
    xs = (jnp.swapaxes(x_proj, 0, 1), jnp.swapaxes(mask, 0, 1))
    _, (h_all, c_all) = jax.lax.scan(step, (h0, h0), xs, reverse=reverse)
    # h_all/c_all [Tp, Bp, H]: carried state after consuming step t
    out = jnp.swapaxes(h_all, 0, 1) * mask[..., None].astype(x.dtype)

    # hb[j]/cb[j] = carry BEFORE processing time-chunk j (processing
    # order; see _lstm_fused_res_kernel).  forward: state after step
    # j*TC-1 (zeros for j=0); reverse: state after consuming step
    # (j+1)*TC descending (zeros for j=n_chunks-1).
    zero = jnp.zeros((1, Bp, H), jnp.float32)
    if not reverse:
        idx = jnp.arange(1, n_chunks) * TC - 1
        hb = jnp.concatenate([zero, h_all[idx].astype(jnp.float32)], 0)
        cb = jnp.concatenate([zero, c_all[idx].astype(jnp.float32)], 0)
    else:
        idx = (jnp.arange(0, n_chunks - 1) + 1) * TC
        hb = jnp.concatenate([h_all[idx].astype(jnp.float32), zero], 0)
        cb = jnp.concatenate([c_all[idx].astype(jnp.float32), zero], 0)
    return out[:B, :T], hb, cb


# inference kernel-vs-scan dispatch lives in ops/dispatch.py (measured
# table + fallback crossover constant); re-exported for back-compat
from ..dispatch import SCAN_FASTER_ROWS  # noqa: E402,F401


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def lstm_pallas_fused(x, mask, w_ih, b, w_hh, reverse: bool = False):
    """Fused (input projection + recurrence) masked LSTM.

    x [B, T, E] embedded tokens -> hidden states [B, T, H]; zero initial
    state.  Differentiable: on TPU the backward is the chunked-remat
    kernel above; elsewhere it falls back to a scan replay.
    """
    return _lstm_fused_impl(x, mask, w_ih, b, w_hh, reverse=reverse)


def _fused_fwd(x, mask, w_ih, b, w_hh, reverse):
    if jax.default_backend() == "tpu":
        # NOTE: a scan-based residual forward (_lstm_scan_res_impl) was
        # measured END-TO-END a wash vs this kernel at 16k rows (50.1 vs
        # 49.3 ms/train step): emitting the (h, c) trace re-adds the HBM
        # traffic the kernel exists to avoid.  The training pair stays
        # kernel-forward + kernel-backward at every size (PERF.md r2 #10);
        # only the no-residual INFERENCE forward dispatches to the scan
        # above the crossover (ops/rnn.RNNLayer._pallas_ok).
        out, hb, cb = _lstm_fused_res_impl(x, mask, w_ih, b, w_hh,
                                           reverse=reverse)
        return out, (x, mask, w_ih, b, w_hh, hb, cb)
    out = _lstm_fused_impl(x, mask, w_ih, b, w_hh, reverse=reverse)
    return out, (x, mask, w_ih, b, w_hh, None, None)


def _fused_bwd(reverse, res, g):
    x, mask, w_ih, b, w_hh, hb, cb = res
    if hb is not None:
        dx, dwih, db, dwhh = _lstm_fused_bwd_impl(
            x, mask, w_ih, b, w_hh, hb, cb, g, reverse=reverse)
        return dx, None, dwih, db, dwhh

    def ref(x, w_ih, b, w_hh):
        x_proj = x @ w_ih + b
        return lstm_pallas_reference(x_proj, mask, w_hh, reverse=reverse)

    _, vjp = jax.vjp(ref, x, w_ih, b, w_hh)
    dx, dwih, db, dwhh = vjp(g)
    return dx, None, dwih, db, dwhh


lstm_pallas_fused.defvjp(_fused_fwd, _fused_bwd)
