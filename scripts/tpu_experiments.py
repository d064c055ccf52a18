"""On-chip perf experiments (run ONE at a time; see PERF.md discipline).

Usage:  JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_tpu \
            python scripts/tpu_experiments.py <exp> [...]

Experiments (each prints a JSON line per variant; ledger goes to PERF.md):
  lstm_sweep    tile-tune the fused LSTM fwd kernel (VERDICT r1 item #5)
  lstm_bwd_sweep  tile-tune the chunked-remat backward pair
  gather        embedding-gather layout experiments (VERDICT r1 item #2)
  pool          fused slate-pool kernel vs the XLA einsum path
  suggest       where beam-5 decode time goes
  gru / gru_small / gru_train  fused GRU kernels vs scan
  scan_vs_fused [rows...]      LSTM scan/kernel crossover
  score_e2e / train_e2e [rnn]  full CARS step, kernel vs scan config
  beam_parts    beam-step top-k formulation shootout
  indexed       cached-doc ranking, +/- cached pool projection
  decode_step_only             model-side decode cost without beam logic
  engine_host   host-inclusive Engine.rank_batch / suggest

Every timing fences with jax.device_get (block_until_ready returns early
under the axon tunnel, CLAUDE.md).  Budget ONE compile per variant; cold
remote Mosaic compiles are minutes each.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def _arm_backend_watchdog(timeout_s: float):
    """Fail fast if the axon tunnel is wedged (it can block forever at
    backend init OR inside ``import jax`` itself -- CLAUDE.md round-3
    outage -- instead of raising UNAVAILABLE).  Must be armed BEFORE the
    module-level ``import jax`` below so the import-time wedge is covered
    too; disarmed in ``__main__`` after one tiny fenced op, so compiles
    (which legitimately take minutes) are never under the timer.
    Twin: bench.py:_backend_up_or_die (imports jax inside the guarded
    function instead, same effect)."""
    import threading

    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            print(json.dumps({"error": "TPU backend init exceeded "
                              f"{timeout_s:.0f}s (tunnel wedged?)"}),
                  file=sys.stderr, flush=True)
            os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()
    return done


_BACKEND_DONE = None
if __name__ == "__main__":
    _BACKEND_DONE = _arm_backend_watchdog(
        float(os.environ.get("TPU_EXP_BACKEND_TIMEOUT", 300)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# bench shapes (doc-encoder view): rows = B*S*N
ROWS, T, E, H = 64 * 5 * 50, 30, 256, 128
VOCAB = 50_000


def timed(fn, *args, warmup=2, iters=10):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    if out is not None:  # warmup=0: prior timed() call already fenced
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def timed_min2(fn, *args, warmup=2, iters=10):
    """min of two ``timed`` passes: single-shot tunnel timings jitter
    +-15% between passes (CLAUDE.md round-3 lesson), enough to corrupt
    small DIFFERENCES of separately-timed variants.  The second pass
    skips warmup (the first pass already fenced the compiled program)."""
    return min(timed(fn, *args, warmup=warmup, iters=iters),
               timed(fn, *args, warmup=0, iters=iters))


def report(name, ms, **kw):
    print(json.dumps({"exp": name, "ms": round(ms * 1e3, 3), **kw}),
          flush=True)


def _lstm_inputs(dtype=jnp.bfloat16, rows=ROWS, t=T, e=E, h=H):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=(rows, t, e)) * 0.3, dtype)
    w_ih = jnp.asarray(rng.normal(size=(e, 4 * h)) * 0.1, dtype)
    b = jnp.asarray(rng.normal(size=(4 * h,)) * 0.1, dtype)
    w_hh = jnp.asarray(rng.normal(size=(h, 4 * h)) * 0.1, dtype)
    mask = jnp.ones((rows, t), bool)
    return x, mask, w_ih, b, w_hh


def lstm_sweep(variants=None):
    from context_attentive_ir_tpu.ops.pallas.lstm import _lstm_fused_impl

    x, mask, w_ih, b, w_hh = _lstm_inputs()
    variants = variants or [(8, 512), (6, 512), (10, 512), (8, 256),
                            (15, 512), (8, 1024)]
    for tc, bb in variants:
        fn = functools.partial(_lstm_fused_impl, reverse=False,
                               block_b=bb, time_chunk=tc)
        ms = timed(fn, x, mask, w_ih, b, w_hh)
        report("lstm_fwd", ms, time_chunk=tc, block_b=bb)


def lstm_bwd_sweep(variants=None):
    from context_attentive_ir_tpu.ops.pallas.lstm import (
        _lstm_fused_bwd_impl,
        _lstm_fused_res_impl,
    )

    x, mask, w_ih, b, w_hh = _lstm_inputs()
    g = jnp.ones((ROWS, T, H), jnp.bfloat16)
    variants = variants or [(4, 256), (6, 256), (8, 256), (4, 512)]
    for tc, bb in variants:
        res = functools.partial(_lstm_fused_res_impl, reverse=False,
                                block_b=bb, time_chunk=tc)
        ms_f = timed(res, x, mask, w_ih, b, w_hh)
        _, hb, cb = res(x, mask, w_ih, b, w_hh)

        def bwd(x, mask, w_ih, b, w_hh, hb, cb, g, _tc=tc, _bb=bb):
            return _lstm_fused_bwd_impl(x, mask, w_ih, b, w_hh, hb, cb, g,
                                        reverse=False, block_b=_bb,
                                        time_chunk=_tc)

        ms_b = timed(bwd, x, mask, w_ih, b, w_hh, hb, cb, g)
        report("lstm_res+bwd", ms_f + ms_b, fwd_ms=round(ms_f * 1e3, 3),
               bwd_ms=round(ms_b * 1e3, 3), time_chunk=tc, block_b=bb)


def gather():
    rng = np.random.RandomState(0)
    n_ids = ROWS * T
    ids = jnp.asarray(rng.randint(4, VOCAB, size=(n_ids,)), jnp.int32)

    def take(table, ids):
        return jnp.take(table, ids, axis=0)

    for name, e_dim, dtype in [
            ("bf16_e256", 256, jnp.bfloat16),
            ("bf16_e300", 300, jnp.bfloat16),
            ("bf16_e384pad", 384, jnp.bfloat16),
            ("bf16_e512", 512, jnp.bfloat16),
            ("f32_e256", 256, jnp.float32),
    ]:
        table = jnp.asarray(rng.normal(size=(VOCAB, e_dim)), dtype)
        ms = timed(jax.jit(take), table, ids)
        gb = n_ids * e_dim * table.dtype.itemsize / 1e9
        report(f"gather_{name}", ms, rows=n_ids,
               eff_gbps=round(gb / ms, 1))

    # gather+pad (current E=300 kernel path) vs gather-from-padded-table
    table300 = jnp.asarray(rng.normal(size=(VOCAB, 300)), jnp.bfloat16)

    @jax.jit
    def gather_then_pad(table, ids):
        x = jnp.take(table, ids, axis=0)
        return jnp.pad(x, ((0, 0), (0, 84)))

    ms = timed(gather_then_pad, table300, ids)
    report("gather_e300_then_pad_x", ms, rows=n_ids)

    @jax.jit
    def pad_table_then_gather(table, ids):
        tp = jnp.pad(table, ((0, 0), (0, 84)))
        return jnp.take(tp, ids, axis=0)

    ms = timed(pad_table_then_gather, table300, ids)
    report("gather_e300_padtable", ms, rows=n_ids)

    # sequential full-table read for scale (what a dense pass would cost)
    @jax.jit
    def table_sum(table):
        return jnp.sum(table.astype(jnp.float32))

    ms = timed(table_sum, table300)
    report("table_full_read", ms)


def gather_kernel():
    """Pallas row-DMA gather probe (round 3).

    Question: XLA's ``jnp.take`` on the bench gather ([480k rows] x E=256
    bf16 from a 50k-row table) runs at ~11.5 ns/row (~44 GB/s) -- is that
    a property of XLA's gather lowering (beatable) or of random 512-byte
    HBM reads on this chip (structural)?  The kernel keeps a sliding
    window of W in-flight single-row DMAs (HBM table row -> VMEM out
    block row) with per-slot semaphores; ids stream through SMEM blocks.
    One compile per (chunk, window) variant -- budget accordingly.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(0)
    n_ids = ROWS * T                              # 480,000
    ids = jnp.asarray(rng.randint(4, VOCAB, size=(n_ids,)), jnp.int32)
    table = jnp.asarray(rng.normal(size=(VOCAB, E)), jnp.bfloat16)
    gb = n_ids * E * 2 / 1e9

    def take(table, ids):
        return jnp.take(table, ids, axis=0)

    ms = timed(jax.jit(take), table, ids)
    report("gather_xla_take", ms, rows=n_ids,
           ns_per_row=round(ms * 1e9 / n_ids, 2),
           eff_gbps=round(gb / ms, 1))

    # Mosaic DMA constraints found on real TPU (interpret mode enforces
    # neither): (a) single-row slices of a 2-D [V, E] bf16 memref are
    # illegal (slices must be 8/16-sublane aligned) -> view the table as
    # [V, 2, 128] so each row is exactly one (2,128) bf16 tile and the
    # sliced dim is untiled; (b) rank-1 SMEM id blocks carry tiling 1024
    # -> chunk must be a multiple of 1024 (ids padded up accordingly).
    table3 = table.reshape(VOCAB, 2, E // 2)

    def make(chunk, window, n):
        def kernel(ids_ref, table_ref, out_ref, sems):
            def dma(j):
                return pltpu.make_async_copy(
                    table_ref.at[ids_ref[j]],
                    out_ref.at[j],
                    sems.at[jax.lax.rem(j, window)],
                )

            def body(j, _):
                @pl.when(j >= window)
                def _():
                    dma(j - window).wait()
                dma(j).start()
                return _

            jax.lax.fori_loop(0, chunk, body, None)

            def drain(j, _):
                dma(j).wait()
                return _

            jax.lax.fori_loop(chunk - window, chunk, drain, None)

        grid = n // chunk
        assert grid * chunk == n
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((chunk,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((chunk, 2, E // 2),
                                   lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((n, 2, E // 2), jnp.bfloat16),
            scratch_shapes=[pltpu.SemaphoreType.DMA((window,))],
        )

    for chunk, window in [(2048, 16), (2048, 64), (4096, 128)]:
        n = (n_ids + chunk - 1) // chunk * chunk
        ids_p = jnp.asarray(
            rng.randint(4, VOCAB, size=(n,)), jnp.int32).at[:n_ids].set(ids)
        try:
            fn = jax.jit(lambda i, t, _k=make(chunk, window, n): _k(i, t))
            ms = timed(fn, ids_p, table3)
            err = float(jnp.max(jnp.abs(
                fn(ids_p, table3).reshape(n, E)[:n_ids].astype(jnp.float32)
                - take(table, ids).astype(jnp.float32))))
            report("gather_dma_kernel", ms, chunk=chunk, window=window,
                   ns_per_row=round(ms * 1e9 / n, 2),
                   eff_gbps=round(n * E * 2 / 1e9 / ms, 1), max_abs_err=err)
        except Exception as e:  # noqa: BLE001 -- probe: record and go on
            print(json.dumps({"exp": "gather_dma_kernel", "chunk": chunk,
                              "window": window,
                              "error": repr(e)[-600:]}), flush=True)


def pool():
    from context_attentive_ir_tpu.ops.pallas.slate import (
        _pool_fused_impl,
        attn_pool_pallas,
        attn_pool_reference,
    )

    rng = np.random.RandomState(0)
    h2 = 2 * H
    states = jnp.asarray(rng.normal(size=(ROWS, T, h2)) * 0.5, jnp.bfloat16)
    mask = jnp.ones((ROWS, T), bool)
    query = jnp.asarray(rng.normal(size=(ROWS, h2)) * 0.5, jnp.bfloat16)
    w_p = jnp.asarray(rng.normal(size=(h2, h2)) * 0.1, jnp.bfloat16)
    b_p = jnp.asarray(rng.normal(size=(h2,)) * 0.1, jnp.bfloat16)

    ms = timed(jax.jit(attn_pool_reference), states, mask, query, w_p, b_p)
    report("pool_xla", ms)
    for br, tc in ((512, 2), (1024, 1), (512, 3), (1024, 2)):
        fn = functools.partial(_pool_fused_impl, block_r=br, time_chunk=tc)
        ms = timed(fn, states, mask, query, w_p, b_p)
        report("pool_pallas", ms, block_r=br, time_chunk=tc)
    # parity on-chip
    out_k = jax.device_get(jax.jit(attn_pool_pallas)(states, mask, query,
                                                     w_p, b_p))
    out_r = jax.device_get(jax.jit(attn_pool_reference)(states, mask,
                                                        query, w_p, b_p))
    err = float(np.max(np.abs(out_k.astype(np.float32)
                              - out_r.astype(np.float32))))
    report("pool_parity", 0.0, max_abs_err=err)


def gru():
    from context_attentive_ir_tpu.ops.pallas.gru import (
        _gru_fused_impl,
        gru_pallas_reference,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=(ROWS, T, E)) * 0.3, jnp.bfloat16)
    w_ih = jnp.asarray(rng.normal(size=(E, 3 * H)) * 0.1, jnp.bfloat16)
    b_ih = jnp.asarray(rng.normal(size=(3 * H,)) * 0.1, jnp.bfloat16)
    w_hh = jnp.asarray(rng.normal(size=(H, 3 * H)) * 0.1, jnp.bfloat16)
    b_hh = jnp.asarray(rng.normal(size=(3 * H,)) * 0.1, jnp.bfloat16)
    mask = jnp.ones((ROWS, T), bool)
    ms = timed(jax.jit(gru_pallas_reference), x, mask, w_ih, b_ih, w_hh,
               b_hh)
    report("gru_scan", ms)
    ms = timed(functools.partial(_gru_fused_impl, block_b=512,
                                 time_chunk=8), x, mask, w_ih, b_ih, w_hh,
               b_hh)
    report("gru_pallas", ms, time_chunk=8, block_b=512)
    out_k = jax.device_get(_gru_fused_impl(x, mask, w_ih, b_ih, w_hh, b_hh))
    out_r = jax.device_get(jax.jit(gru_pallas_reference)(
        x, mask, w_ih, b_ih, w_hh, b_hh))
    err = float(np.max(np.abs(out_k.astype(np.float32)
                              - out_r.astype(np.float32))))
    report("gru_parity", 0.0, max_abs_err=err)


def scan_vs_fused():
    """LSTM scan vs fused kernel at two batch sizes: validates (or
    falsifies) the dispatch policy at bench vs small shapes."""
    from context_attentive_ir_tpu.ops.pallas.lstm import (
        _lstm_fused_impl,
        lstm_pallas_reference,
    )

    rows_list = [int(r) for r in sys.argv[2:]] or [16000, 2000]
    for rows in rows_list:
        x, mask, w_ih, b, w_hh = _lstm_inputs(rows=rows)

        @jax.jit
        def scan_path(x, mask, w_ih, b, w_hh):
            return lstm_pallas_reference(x @ w_ih + b, mask, w_hh)

        ms = timed(scan_path, x, mask, w_ih, b, w_hh)
        report("lstm_scan", ms, rows=rows)
        # production tile (ops/pallas/lstm.py default after the round-3
        # retune; bb=512 is the documented hoisting pathology)
        fn = functools.partial(_lstm_fused_impl, block_b=128, time_chunk=6)
        ms = timed(fn, x, mask, w_ih, b, w_hh)
        report("lstm_fused", ms, rows=rows, time_chunk=6, block_b=128)


def large_r():
    """Root-cause the fused-forward loss to the scan at large rows
    (VERDICT r2 next-round #3).  Hypotheses, <=6 compiles:
      (a/b) block_b too large for DMA double-buffer overlap -> bb 128/256;
      (c/d) in-kernel per-step input projection is the inefficiency (the
            scan path amortizes it as ONE huge XLA matmul) -> precompute
            the projection outside and run the gate-consuming chunked
            kernel (lstm_pallas) at bb 256/512;
      (e)   scan reference at the same shape for the within-run baseline.
    """
    from context_attentive_ir_tpu.ops.pallas.lstm import (
        _lstm_fused_impl,
        _lstm_pallas_fwd_impl,
        lstm_pallas_reference,
    )

    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 16000
    x, mask, w_ih, b, w_hh = _lstm_inputs(rows=rows)

    @jax.jit
    def scan_path(x, mask, w_ih, b, w_hh):
        return lstm_pallas_reference(x @ w_ih + b, mask, w_hh)

    ms = timed(scan_path, x, mask, w_ih, b, w_hh)
    report("lr_scan", ms, rows=rows)

    for bb in (512, 256, 128):
        fn = functools.partial(_lstm_fused_impl, block_b=bb, time_chunk=6)
        ms = timed(fn, x, mask, w_ih, b, w_hh)
        report("lr_fused", ms, rows=rows, block_b=bb, time_chunk=6)

    for bb in (256, 512):
        @jax.jit
        def proj_then_kernel(x, mask, w_ih, b, w_hh, bb=bb):
            x_proj = x @ w_ih + b
            return _lstm_pallas_fwd_impl(x_proj, mask, w_hh,
                                         block_b=bb, time_chunk=6)

        ms = timed(proj_then_kernel, x, mask, w_ih, b, w_hh)
        report("lr_proj_kernel", ms, rows=rows, block_b=bb, time_chunk=6)


def large_r2():
    """Follow-up to large_r: the fused kernel's deficit at big rows is the
    in-kernel PER-STEP input projection (small-M latency-bound dots at
    ~26 TF/s vs XLA's ~120 TF/s one-big-matmul).  Two candidate fixes,
    both keeping the zero-gate-HBM property:
      v_hoist: issue all tc independent projection dots BEFORE the
               recurrence loop (back-to-back MXU pipelining);
      v_batch: take x as 3-D blocks [TB, TC, E] and project the whole
               chunk as ONE [TB*TC, E] @ [E, 4H] dot (high-M MXU rate).
    """
    import functools as ft

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from context_attentive_ir_tpu.ops.pallas.lstm import (
        _pad_embed,
        _round_up,
    )

    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 16000
    variant = sys.argv[3] if len(sys.argv) > 3 else "both"
    bbs = [int(b) for b in sys.argv[4:]] or [512, 128]

    def kern_hoist(x_ref, mask_ref, wih_ref, b_ref, whh_ref, out_ref,
                   h_scr, c_scr, *, h, e, tc):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            h_scr[:] = jnp.zeros_like(h_scr)
            c_scr[:] = jnp.zeros_like(c_scr)

        hs = h_scr[:]
        cs = c_scr[:]
        bias = b_ref[0, :].astype(jnp.float32)[None, :]
        gs = [jnp.dot(x_ref[:, k * e:(k + 1) * e], wih_ref[:],
                      preferred_element_type=jnp.float32)
              for k in range(tc)]
        for k in range(tc):
            gates = gs[k] + bias
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

    def kern_batch(x_ref, mask_ref, wih_ref, b_ref, whh_ref, out_ref,
                   h_scr, c_scr, *, h, e, tc, tb):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            h_scr[:] = jnp.zeros_like(h_scr)
            c_scr[:] = jnp.zeros_like(c_scr)

        hs = h_scr[:]
        cs = c_scr[:]
        bias = b_ref[0, :].astype(jnp.float32)[None, :]
        # ONE high-M projection dot for the whole chunk
        x_all = x_ref[:].reshape(tb * tc, e)
        g_all = jnp.dot(x_all, wih_ref[:],
                        preferred_element_type=jnp.float32)
        g_all = g_all.reshape(tb, tc, 4 * h)
        for k in range(tc):
            gates = g_all[:, k, :] + bias
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

    @ft.partial(jax.jit, static_argnames=("block_b", "time_chunk", "mode"))
    def run(x, mask, w_ih, b, w_hh, block_b=512, time_chunk=6,
            mode="hoist"):
        x, w_ih, _ = _pad_embed(x, w_ih)
        B, T_, E_ = x.shape
        H_ = w_hh.shape[0]
        if B <= block_b:
            Bp = TB = _round_up(B, 16)
        else:
            TB = _round_up(block_b, 128)
            Bp = _round_up(B, TB)
        TC = min(time_chunk, T_)
        Tp = _round_up(T_, TC)
        if Bp != B or Tp != T_:
            x = jnp.pad(x, ((0, Bp - B), (0, Tp - T_), (0, 0)))
            mask = jnp.pad(mask, ((0, Bp - B), (0, Tp - T_)))
        mask_i = mask.astype(jnp.int32).T[:, None, :]
        b2 = b.reshape(1, -1)
        n_chunks = Tp // TC
        if mode == "hoist":
            x_in = x.reshape(Bp, Tp * E_)
            x_spec = pl.BlockSpec((TB, TC * E_), lambda bb, t: (bb, t),
                                  memory_space=pltpu.VMEM)
            kern = ft.partial(kern_hoist, h=H_, e=E_, tc=TC)
        else:
            x_in = x
            x_spec = pl.BlockSpec((TB, TC, E_), lambda bb, t: (bb, t, 0),
                                  memory_space=pltpu.VMEM)
            kern = ft.partial(kern_batch, h=H_, e=E_, tc=TC, tb=TB)
        out = pl.pallas_call(
            kern,
            grid=(Bp // TB, n_chunks),
            in_specs=[
                x_spec,
                pl.BlockSpec((TC, 1, TB), lambda bb, t: (t, 0, bb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((E_, 4 * H_), lambda bb, t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 4 * H_), lambda bb, t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H_, 4 * H_), lambda bb, t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TB, TC * H_), lambda bb, t: (bb, t),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bp, Tp * H_), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((TB, H_), jnp.float32),
                pltpu.VMEM((TB, H_), jnp.float32),
            ],
        )(x_in, mask_i, w_ih, b2, w_hh)
        return out.reshape(Bp, Tp, H_)[:rows, :T_]

    x, mask, w_ih, b, w_hh = _lstm_inputs(rows=rows)
    # correctness first (vs the scan), then timing
    from context_attentive_ir_tpu.ops.pallas.lstm import (
        lstm_pallas_reference,
    )
    ref = np.asarray(jax.device_get(jax.jit(lstm_pallas_reference)(
        (x @ w_ih + b), mask, w_hh)), np.float32)
    for mode in (("hoist", "batch") if variant == "both" else (variant,)):
        # Mosaic requires the 3-D x block's second-to-last dim (the time
        # chunk) to be 8-divisible, so the batched-projection variant runs
        # at tc=8; the 2-D hoist variant keeps the tuned tc=6
        tcs = (8,) if mode == "batch" else (6, 10, 15)
        for tc in tcs:
          for bb in bbs:
            fn = ft.partial(run, block_b=bb, time_chunk=tc, mode=mode)
            out = np.asarray(jax.device_get(fn(x, mask, w_ih, b, w_hh)),
                             np.float32)
            err = float(np.max(np.abs(out - ref))) / max(
                float(np.max(np.abs(ref))), 1e-6)
            ms = timed(fn, x, mask, w_ih, b, w_hh)
            report(f"lr2_{mode}", ms, rows=rows, block_b=bb, time_chunk=tc,
                   rel_err=round(err, 4))


def hoist_check():
    """Validate the productionized hoisted-projection kernels at the
    serving (2000-row) and training shapes, to pick tile defaults."""
    from context_attentive_ir_tpu.ops.pallas.gru import _gru_fused_impl
    from context_attentive_ir_tpu.ops.pallas.lstm import (
        _lstm_fused_bwd_impl,
        _lstm_fused_impl,
        _lstm_fused_res_impl,
    )

    # forward at the sub-crossover serving bucket
    x, mask, w_ih, b, w_hh = _lstm_inputs(rows=2000)
    for tc, bb in ((6, 512), (6, 128), (10, 128)):
        fn = functools.partial(_lstm_fused_impl, block_b=bb, time_chunk=tc)
        ms = timed(fn, x, mask, w_ih, b, w_hh)
        report("hoist_fwd2000", ms, time_chunk=tc, block_b=bb)

    # training pair at the bench shape (r2 best: tc=6 bb=256, 19.43 ms)
    x, mask, w_ih, b, w_hh = _lstm_inputs(rows=16000)
    g = jnp.ones((16000, T, H), jnp.bfloat16)
    for tc, bb in ((6, 256), (6, 128)):
        res = functools.partial(_lstm_fused_res_impl, block_b=bb,
                                time_chunk=tc)
        ms_f = timed(res, x, mask, w_ih, b, w_hh)
        _, hb, cb = res(x, mask, w_ih, b, w_hh)

        def bwd(x, mask, w_ih, b, w_hh, hb, cb, g, _tc=tc, _bb=bb):
            return _lstm_fused_bwd_impl(x, mask, w_ih, b, w_hh, hb, cb, g,
                                        block_b=_bb, time_chunk=_tc)

        ms_b = timed(bwd, x, mask, w_ih, b, w_hh, hb, cb, g)
        report("hoist_pair16k", ms_f + ms_b, fwd_ms=round(ms_f * 1e3, 3),
               bwd_ms=round(ms_b * 1e3, 3), time_chunk=tc, block_b=bb)

    # GRU forward at its dispatch bucket (r2 best: tc=6 bb=512, 3.10 ms)
    rng = np.random.RandomState(0)
    rows = 2000
    x = jnp.asarray(rng.normal(size=(rows, T, E)) * 0.3, jnp.bfloat16)
    w_ih3 = jnp.asarray(rng.normal(size=(E, 3 * H)) * 0.1, jnp.bfloat16)
    b_ih3 = jnp.asarray(rng.normal(size=(3 * H,)) * 0.1, jnp.bfloat16)
    w_hh3 = jnp.asarray(rng.normal(size=(H, 3 * H)) * 0.1, jnp.bfloat16)
    b_hh3 = jnp.asarray(rng.normal(size=(3 * H,)) * 0.1, jnp.bfloat16)
    mask = jnp.ones((rows, T), bool)
    for tc, bb in ((6, 512), (6, 128)):
        fn = functools.partial(_gru_fused_impl, block_b=bb, time_chunk=tc)
        ms = timed(fn, x, mask, w_ih3, b_ih3, w_hh3, b_hh3)
        report("hoist_gru2000", ms, time_chunk=tc, block_b=bb)


def scale_bucketing():
    """AOL-shape scale evidence (VERDICT r2 next-round #10): one CARS
    training epoch at vocab=100k, sessions up to S=10 with an AOL-like
    length distribution (most sessions 2-3 turns), bucketed
    (session_buckets=(3, 5, 10)) vs flat padding to S=10.  Reports wall
    time and trained docs/sec for both -- the bucketing win SURVEY SS7
    hard part (a) promises."""
    from context_attentive_ir_tpu.config import RunConfig, default_config
    from context_attentive_ir_tpu.data import Dictionary
    from context_attentive_ir_tpu.data.objects import (
        Document,
        Query,
        Session,
    )
    from context_attentive_ir_tpu.models import build_model
    from context_attentive_ir_tpu.train import (
        create_train_state,
        make_train_step,
    )
    from context_attentive_ir_tpu.train.trainer import make_iterator

    rng = np.random.RandomState(0)
    VOCAB_N, N_SESS, NCAND = 100_000, 768, 50
    words = [f"w{i}" for i in range(VOCAB_N)]
    word_dict = Dictionary()
    for w in words:
        word_dict.add(w)

    def rand_words(n):
        return [words[i] for i in rng.randint(0, VOCAB_N, size=n)]

    # AOL-ish session length distribution: P(2)=.45 P(3)=.25 P(4)=.12
    # P(5)=.08 P(6..10)=.10
    lens = rng.choice([2, 3, 4, 5, 6, 7, 8, 9, 10], size=N_SESS,
                      p=[.45, .25, .12, .08, .04, .03, .01, .01, .01])
    sessions = []
    for si, L in enumerate(lens):
        qs = []
        for t in range(L):
            docs = [Document(f"d{si}_{t}_{c}", rand_words(
                int(rng.randint(5, 30))), int(c == 0))
                for c in range(NCAND)]
            qs.append(Query(f"q{si}_{t}", rand_words(
                int(rng.randint(2, 8))), docs))
        sessions.append(Session(f"s{si}", qs))
    n_docs = int(sum(len(s.queries) for s in sessions)) * NCAND

    cfg = default_config("cars").replace(
        vocab_size=len(word_dict), emsize=256, nhid=128,
        max_query_len=15, max_doc_len=30, max_session_len=10,
        num_candidates=NCAND, compute_dtype="bfloat16",
        dropout=0.0, dropout_emb=0.0, dropout_rnn=0.0)
    model = build_model(cfg)
    rng_key = jax.random.key(0)

    for buckets in ((), (3, 5, 10)):
        it = make_iterator(sessions, cfg, word_dict, batch_size=32,
                           shuffle=True, seed=1, session_buckets=buckets)
        first = next(iter(it.epoch(0)))
        state = create_train_state(model, cfg, first, jax.random.key(1))
        step = make_train_step(model, cfg)
        # one warmup epoch: all bucket shapes compile + host caches warm
        for batch in it.epoch(0):
            state, m = step(state, batch, rng_key)
        jax.device_get(m["loss"] if isinstance(m, dict)
                       else jax.tree_util.tree_leaves(m)[0])
        t0 = time.perf_counter()
        for batch in it.epoch(1):
            state, m = step(state, batch, rng_key)
        jax.device_get(m["loss"] if isinstance(m, dict)
                       else jax.tree_util.tree_leaves(m)[0])
        dt = time.perf_counter() - t0
        report("scale_bucketing", dt / 1,
               buckets=list(buckets) or "flat",
               epoch_s=round(dt, 2),
               docs_per_sec=round(n_docs / dt, 1))


def dispatch_table():
    """Regenerate ops/dispatch_table.json on the attached chip (VERDICT r2
    next-round #4; breadth: VERDICT r3 missing #4): measure fused-forward
    kernel vs XLA scan at the production tile params across a row grid.

    Usage: dispatch_table [rows...]   (default 2000 8000 16000)
    Env DISPATCH_SHAPES="t:e:h:dtype,..." selects shape families
    (default the bench doc-encoder family 30:256:128:bfloat16, which also
    measures GRU; other families measure LSTM only -- each (shape, rows,
    path) is a cold multi-minute compile).  For e not 128-aligned
    (GloVe 300) inputs are lane-padded exactly as production
    (Embeddings.lookup_padded + RNNLayer.in_features) and the entry is
    keyed by the LOGICAL e.  Env DISPATCH_TRAIN=1 additionally measures
    the TRAINING pair (value_and_grad through the fused kernels vs the
    scan) and writes mode="train" rows -- these override the baked-in
    "training always prefers the kernel pair" default where present
    (ops.dispatch.prefer_kernel)."""
    import os

    from context_attentive_ir_tpu.ops import dispatch
    from context_attentive_ir_tpu.ops.pallas.gru import (
        _gru_fused_impl,
        gru_pallas_fused,
        gru_pallas_reference,
    )
    from context_attentive_ir_tpu.ops.pallas.lstm import (
        _lstm_fused_impl,
        lstm_pallas_fused,
        lstm_pallas_reference,
    )

    rows_list = [int(r) for r in sys.argv[2:]] or [2000, 8000, 16000]
    shapes = []
    for tok in os.environ.get("DISPATCH_SHAPES",
                              f"{T}:{E}:{H}:bfloat16").split(","):
        t_, e_, h_, dt_ = tok.split(":")
        shapes.append((int(t_), int(e_), int(h_), dt_))
    measure_train = os.environ.get("DISPATCH_TRAIN") == "1"
    entries = []
    rng = np.random.RandomState(0)

    # tunnel timing jitters +/-15% between passes (PERF.md r3): measure
    # each path twice and keep the min so one hiccup can't flip dispatch
    timed2 = timed_min2

    for (t_, e_, h_, dt_) in shapes:
        dtype = jnp.dtype(dt_).type
        ep = -(-e_ // 128) * 128 if e_ >= 128 else e_  # production pad
        default_family = (t_, e_, h_, dt_) == (T, E, H, "bfloat16")
        for rows in rows_list:
            x, mask, w_ih, b, w_hh = _lstm_inputs(dtype=dtype, rows=rows,
                                                  t=t_, e=ep, h=h_)
            if ep != e_:  # zero the pad rows like lookup_padded does
                w_ih = w_ih.at[e_:].set(0)

            @jax.jit
            def scan_path(x, mask, w_ih, b, w_hh):
                return lstm_pallas_reference(x @ w_ih + b, mask, w_hh)

            scan_ms = timed2(scan_path, x, mask, w_ih, b, w_hh) * 1e3
            kern_ms = timed2(jax.jit(functools.partial(_lstm_fused_impl)),
                             x, mask, w_ih, b, w_hh) * 1e3
            entries.append(dict(kind="lstm", mode="infer", t=t_, e=e_,
                                h=h_, dtype=dt_, rows=rows,
                                kernel_ms=round(kern_ms, 3),
                                scan_ms=round(scan_ms, 3)))
            report("dispatch_lstm", kern_ms / 1e3, rows=rows, t=t_, e=e_,
                   dtype=dt_, scan_ms=round(scan_ms, 3))

            if measure_train:
                def loss_k(x, w_ih, b, w_hh):
                    return jnp.sum(lstm_pallas_fused(x, mask, w_ih, b,
                                                     w_hh)
                                   .astype(jnp.float32) ** 2)

                def loss_s(x, w_ih, b, w_hh):
                    return jnp.sum(lstm_pallas_reference(
                        x @ w_ih + b, mask, w_hh).astype(jnp.float32) ** 2)

                gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2, 3)))
                gs = jax.jit(jax.grad(loss_s, argnums=(0, 1, 2, 3)))
                ktr = timed2(gk, x, w_ih, b, w_hh) * 1e3
                str_ = timed2(gs, x, w_ih, b, w_hh) * 1e3
                entries.append(dict(kind="lstm", mode="train", t=t_, e=e_,
                                    h=h_, dtype=dt_, rows=rows,
                                    kernel_ms=round(ktr, 3),
                                    scan_ms=round(str_, 3)))
                report("dispatch_lstm_train", ktr / 1e3, rows=rows, t=t_,
                       e=e_, dtype=dt_, scan_ms=round(str_, 3))

            if not default_family and os.environ.get("DISPATCH_GRU") != "1":
                continue  # GRU defaults to the bench family; DISPATCH_GRU=1
                # extends it to the selected shapes (VERDICT r3 #4: >=2
                # measured families per kind)
            w_ih3 = jnp.asarray(rng.normal(size=(ep, 3 * h_)) * 0.1,
                                dtype)
            b_ih3 = jnp.asarray(rng.normal(size=(3 * h_,)) * 0.1, dtype)
            w_hh3 = jnp.asarray(rng.normal(size=(h_, 3 * h_)) * 0.1,
                                dtype)
            b_hh3 = jnp.asarray(rng.normal(size=(3 * h_,)) * 0.1, dtype)
            gscan_ms = timed2(jax.jit(gru_pallas_reference), x, mask,
                              w_ih3, b_ih3, w_hh3, b_hh3) * 1e3
            gkern_ms = timed2(jax.jit(functools.partial(_gru_fused_impl)),
                              x, mask, w_ih3, b_ih3, w_hh3, b_hh3) * 1e3
            entries.append(dict(kind="gru", mode="infer", t=t_, e=e_,
                                h=h_, dtype=dt_, rows=rows,
                                kernel_ms=round(gkern_ms, 3),
                                scan_ms=round(gscan_ms, 3)))
            report("dispatch_gru", gkern_ms / 1e3, rows=rows,
                   scan_ms=round(gscan_ms, 3))

            if measure_train:
                # GRU training pair (chunked-remat bwd) vs scan autodiff
                # (VERDICT r4 missing #4: the always-kernel training
                # default was pure extrapolation for every GRU shape)
                def gloss_k(x, w_ih3, b_ih3, w_hh3, b_hh3):
                    return jnp.sum(gru_pallas_fused(
                        x, mask, w_ih3, b_ih3, w_hh3, b_hh3)
                        .astype(jnp.float32) ** 2)

                def gloss_s(x, w_ih3, b_ih3, w_hh3, b_hh3):
                    return jnp.sum(gru_pallas_reference(
                        x, mask, w_ih3, b_ih3, w_hh3, b_hh3)
                        .astype(jnp.float32) ** 2)

                ggk = jax.jit(jax.grad(gloss_k, argnums=(0, 1, 2, 3, 4)))
                ggs = jax.jit(jax.grad(gloss_s, argnums=(0, 1, 2, 3, 4)))
                gktr = timed2(ggk, x, w_ih3, b_ih3, w_hh3, b_hh3) * 1e3
                gstr = timed2(ggs, x, w_ih3, b_ih3, w_hh3, b_hh3) * 1e3
                entries.append(dict(kind="gru", mode="train", t=t_, e=e_,
                                    h=h_, dtype=dt_, rows=rows,
                                    kernel_ms=round(gktr, 3),
                                    scan_ms=round(gstr, 3)))
                report("dispatch_gru_train", gktr / 1e3, rows=rows, t=t_,
                       e=e_, dtype=dt_, scan_ms=round(gstr, 3))
    # merge: preserve beam-family rows AND any lstm/gru support point not
    # re-measured this run (ops.dispatch.merge_rnn_entries, unit-tested --
    # the old inline merge KeyError'd on beam_bk/beam_gen_pipe rows and
    # would have lost the whole multi-minute run before write_table)
    entries = dispatch.merge_rnn_entries(entries, dispatch._load_table())
    dispatch.write_table(entries)
    print(json.dumps({"exp": "dispatch_table",
                      "written": str(dispatch.TABLE_PATH),
                      "n_entries": len(entries)}), flush=True)


def dispatch_table_beam():
    """Measure exact vs chunked top-(K+1) -- decode/beam._topk_rows, the
    two PRODUCTION formulations, both bit-exact -- inside the current
    beam-step computation (logits matmul -> lse shift -> per-beam
    top-(K+1) -> combine) at the bench decode shape, and merge
    ``beam_topk`` entries into ops/dispatch_table.json so
    ``beam_search(topk_method='auto')`` dispatches on measurement.
    Kc values cover the production beam widths (beam 5 -> 6, beam 3 -> 4);
    override: dispatch_table_beam <kc...>."""
    from context_attentive_ir_tpu.decode.beam import (_chunk_count,
                                                      _topk_rows)
    from context_attentive_ir_tpu.ops import dispatch

    rng = np.random.RandomState(0)
    Bq, Hh = 320, 256
    V = VOCAB

    timed2 = functools.partial(timed_min2, iters=5)

    def scan16(method, kc, k):
        @jax.jit
        def run(h, table, prev):
            def step(carry, _):
                scores32 = (h @ table.T).astype(jnp.float32)
                lse = jax.scipy.special.logsumexp(scores32, axis=-1,
                                                  keepdims=True)
                t1, i1 = _topk_rows(scores32, kc, method)
                total = prev[:, None] + (t1 - lse)
                top, i2 = jax.lax.top_k(total.reshape(Bq, -1), k)
                return carry, top.sum() + i2.sum() + i1.sum()
            _, outs = jax.lax.scan(step, prev, jnp.arange(16))
            return outs
        return run

    kcs = [int(a) for a in sys.argv[2:]] or [6, 4]
    new = []
    for kc in kcs:
        k = kc - 1
        r = Bq * k
        h = jnp.asarray(rng.normal(size=(r, Hh)) * 0.3, jnp.bfloat16)
        table = jnp.asarray(rng.normal(size=(V, Hh)) * 0.3, jnp.bfloat16)
        prev = jnp.zeros((r,), jnp.float32)
        ex = timed2(scan16("exact", kc, k), h, table, prev)
        ch = timed2(scan16("chunked", kc, k), h, table, prev)
        report("dispatch_beam_topk", ch, kc=kc, v=V,
               exact_ms=round(ex * 1e3, 3), chunks=_chunk_count(V, kc))
        new.append(dict(kind="beam_topk", v=V, kc=kc,
                        exact_ms=round(ex * 1e3, 3),
                        chunked_ms=round(ch * 1e3, 3)))
    merged = [e for e in dispatch._load_table()
              if e.get("kind") != "beam_topk"] + new
    dispatch.write_table(merged)
    print(json.dumps({"exp": "dispatch_table_beam",
                      "written": str(dispatch.TABLE_PATH),
                      "n_entries": len(merged)}), flush=True)


def scan_unroll():
    """lax.scan unroll factor on the (step-overhead-bound) LSTM scan."""
    x, mask, w_ih, b, w_hh = _lstm_inputs()
    H_ = w_hh.shape[0]

    def run(unroll):
        @jax.jit
        def f(x, mask, w_ih, b, w_hh):
            x_proj = x @ w_ih + b

            def step(carry, inp):
                h, c = carry
                xp, m = inp
                gates = xp + h @ w_hh
                i, fg, g, o = jnp.split(gates, 4, axis=-1)
                c_new = (jax.nn.sigmoid(fg) * c
                         + jax.nn.sigmoid(i) * jnp.tanh(g))
                h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
                m2 = m[:, None]
                h = jnp.where(m2, h_new, h)
                c = jnp.where(m2, c_new, c)
                return (h, c), h

            xs = (jnp.swapaxes(x_proj, 0, 1), jnp.swapaxes(mask, 0, 1))
            h0 = jnp.zeros((x.shape[0], H_), x.dtype)
            _, outs = jax.lax.scan(step, (h0, h0), xs, unroll=unroll)
            return outs

        return f

    for unroll in (1, 2, 5):
        ms = timed(run(unroll), x, mask, w_ih, b, w_hh)
        report("lstm_scan_unroll", ms, unroll=unroll)


def gru_small():
    from context_attentive_ir_tpu.ops.pallas.gru import (
        _gru_fused_impl,
        gru_pallas_reference,
    )

    rng = np.random.RandomState(0)
    rows = 2000
    x = jnp.asarray(rng.normal(size=(rows, T, E)) * 0.3, jnp.bfloat16)
    w_ih = jnp.asarray(rng.normal(size=(E, 3 * H)) * 0.1, jnp.bfloat16)
    b_ih = jnp.asarray(rng.normal(size=(3 * H,)) * 0.1, jnp.bfloat16)
    w_hh = jnp.asarray(rng.normal(size=(H, 3 * H)) * 0.1, jnp.bfloat16)
    b_hh = jnp.asarray(rng.normal(size=(3 * H,)) * 0.1, jnp.bfloat16)
    mask = jnp.ones((rows, T), bool)
    ms = timed(jax.jit(gru_pallas_reference), x, mask, w_ih, b_ih, w_hh,
               b_hh)
    report("gru_scan", ms, rows=rows)
    ms = timed(functools.partial(_gru_fused_impl, block_b=512,
                                 time_chunk=6), x, mask, w_ih, b_ih, w_hh,
               b_hh)
    report("gru_pallas", ms, rows=rows, time_chunk=6, block_b=512)


def score_e2e():
    """Full CARS score step, fused-kernel config vs scan config (the
    dispatch decision measured end-to-end, not in isolation)."""
    import bench as bench_mod

    for use_pallas in (True, False):
        _, model, params, batch = bench_mod._build_cars(use_pallas)

        @jax.jit
        def score(params, batch):
            return model.apply({"params": params}, batch,
                               method=model.score)

        ms = timed(score, params, batch, warmup=3, iters=20)
        docs = bench_mod.B * bench_mod.S * bench_mod.N
        report("score_e2e", ms, use_pallas_rnn=use_pallas,
               docs_per_sec=round(docs / ms, 1))


def score_parts():
    """Cumulative-prefix attribution of the serving score step (VERDICT
    r3 weak #2 / next-round #7: the component-floor sum left ~1.5 ms of
    the 13.4 ms step unattributed, and the components were timed in
    ISOLATION, which this machine's round-2 lesson says inflates).

    Times jitted PREFIXES of the real score computation -- each prefix is
    the previous plus one stage, the last prefix IS ``model.score`` -- so
    consecutive differences attribute per-stage cost and the stages sum
    EXACTLY to the measured full step by construction.  Caveat (recorded
    with the ledger entry): XLA may fuse/DCE a prefix differently than
    the same ops inside the full graph, so deltas are still an
    approximation -- but a same-process, same-compile-policy one, unlike
    the round-2 isolated timings.  Min-of-2 passes per prefix."""
    import bench as bench_mod

    _cfg, model, params, batch = bench_mod._build_cars(True)

    def red(*xs):
        tot = jnp.float32(0)
        for x in xs:
            for leaf in jax.tree_util.tree_leaves(x):
                tot = tot + jnp.sum(leaf.astype(jnp.float32))
        return tot

    def p_gather(m, b):
        return red(m.embeddings.lookup_padded(b.docs, True))

    def p_docenc(m, b):
        return red(m.encode_docs(b.docs, b.doc_mask, True))

    def p_qenc(m, b):
        d = m.encode_docs(b.docs, b.doc_mask, True)
        return red(d, m._encode_queries(b, True))

    def p_pool(m, b):
        d = m.encode_docs(b.docs, b.doc_mask, True)
        q_states, qv = m._encode_queries(b, True)
        dv = m.doc_pool(d, b.doc_mask,
                        jnp.broadcast_to(qv[:, :, None, :],
                                         d.shape[:3] + (qv.shape[-1],)))
        return red(q_states, qv, dv)

    def p_flows(m, b):
        return red(m.encode_session(b, True))

    def p_full(m, b):
        return red(m.score(b))

    timed2 = functools.partial(timed_min2, warmup=3, iters=20)

    stages = [("gather", p_gather), ("doc_encoder", p_docenc),
              ("query_encoder", p_qenc), ("doc_pool", p_pool),
              ("session_flows", p_flows), ("ctx_attn_rank_head", p_full)]
    prev, out = 0.0, {}
    for name, fn in stages:
        f = jax.jit(lambda p, b, fn=fn: model.apply({"params": p}, b,
                                                    method=fn))
        ms = timed2(f, params, batch) * 1e3
        out[name] = {"cum_ms": round(ms, 3),
                     "delta_ms": round(ms - prev, 3)}
        report("score_parts", ms / 1e3, stage=name,
               delta_ms=round(ms - prev, 3))
        prev = ms
    print(json.dumps({"exp": "score_parts", "attribution": out,
                      "full_ms": round(prev, 3)}), flush=True)


def train_e2e():
    """Full CARS train step (loss+grads+adam), kernel vs scan config.
    Optional argv: rnn_type (lstm|gru)."""
    import bench as bench_mod

    from context_attentive_ir_tpu.train.state import create_train_state
    from context_attentive_ir_tpu.train.steps import make_train_step

    rnn = sys.argv[2] if len(sys.argv) > 2 else "lstm"
    for use_pallas in (True, False):
        cfg, model, _params, batch = bench_mod._build_cars(use_pallas,
                                                           rnn_type=rnn)
        state = create_train_state(model, cfg, batch, jax.random.key(0))
        step = make_train_step(model, cfg)
        rng = jax.random.key(1)
        s = state  # state is donated each step; always chain it
        for _ in range(2):
            s, m = step(s, batch, rng)
        jax.device_get(m["loss"])
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            s, m = step(s, batch, rng)
        jax.device_get(m["loss"])
        ms = (time.perf_counter() - t0) / iters
        docs = bench_mod.B * bench_mod.S * bench_mod.N
        report("train_e2e", ms, use_pallas_rnn=use_pallas, rnn_type=rnn,
               docs_per_sec=round(docs / ms, 1))


def engine_host():
    """Host-inclusive serving throughput: Engine.rank_batch with real text
    requests (fastvec vectorization + H2D + compiled score + D2H)."""
    from context_attentive_ir_tpu.config import default_config
    from context_attentive_ir_tpu.data import build_dictionary
    from context_attentive_ir_tpu.models import build_model
    from context_attentive_ir_tpu.serve import Engine

    rng = np.random.RandomState(0)
    words = [f"w{i}" for i in range(5000)]
    word_dict = build_dictionary([words])
    cfg = default_config("cars").replace(
        vocab_size=len(word_dict), emsize=E, nhid=H,
        max_query_len=15, max_doc_len=T, max_session_len=5,
        num_candidates=50, compute_dtype="bfloat16",
        dropout=0.0, dropout_emb=0.0, dropout_rnn=0.0)
    model = build_model(cfg)
    from context_attentive_ir_tpu.data import build_session_batch
    from context_attentive_ir_tpu.data.objects import (
        Document, Query, Session)

    dummy = Session("s", [Query("q", ["w1"],
                                [Document("d", ["w2"], 0)])])
    from context_attentive_ir_tpu.train.trainer import shapes_from_config
    probe = build_session_batch([dummy], word_dict,
                                shapes_from_config(cfg), batch_size=1)
    params = model.init({"params": jax.random.key(0)}, probe, True)["params"]
    eng = Engine(cfg, word_dict, params, beam_size=5, batch_bucket=16)

    def req():
        q = " ".join(rng.choice(words, 6))
        docs = [" ".join(rng.choice(words, 12)) for _ in range(50)]
        hist = [" ".join(rng.choice(words, 5)) for _ in range(2)]
        return (q, docs, hist)

    reqs = [req() for _ in range(16)]
    eng.rank_batch(reqs)  # compile
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        eng.rank_batch(reqs)
    dt = (time.perf_counter() - t0) / iters
    report("engine_rank_batch", dt,
           requests_per_sec=round(len(reqs) / dt, 1),
           docs_per_sec=round(len(reqs) * 50 / dt, 1))

    sugg_hist = [" ".join(rng.choice(words, 5)) for _ in range(3)]
    eng.suggest(sugg_hist)  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        eng.suggest(sugg_hist)
    dt = (time.perf_counter() - t0) / iters
    report("engine_suggest_single", dt,
           requests_per_sec=round(1 / dt, 1))

    # batched suggestion serving (round 3, VERDICT r2 missing #4)
    sugg_reqs = [[" ".join(rng.choice(words, 5)) for _ in range(3)]
                 for _ in range(16)]
    eng.suggest_batch(sugg_reqs)  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        eng.suggest_batch(sugg_reqs)
    dt = (time.perf_counter() - t0) / iters
    report("engine_suggest_batch", dt,
           requests_per_sec=round(len(sugg_reqs) / dt, 1))


def train_parts():
    """Decompose the CARS train step end-to-end (the training analogue of
    PERF.md's serving structural-floor accounting).  Four jitted variants
    at the bench shape, kernel config, within one run:

      fwd_only    loss value alone (forward in train mode)
      grads_only  value_and_grad + grad_norm, NO clip/optimizer apply
      full        the production step (grads + clip + Adam, donated state)
      fix_emb     full step with ``fix_embeddings=True``: stop_gradient
                  through the table lookup (no [V, E] scatter-add in the
                  backward) AND, since round 4, the table is masked out
                  of the optimizer entirely (train/state.py
                  multi_transform), so this delta covers the scatter-add
                  backward PLUS the table's Adam moment/update passes
                  (resolves the ADVICE r3 mislabeling by making the
                  config do what the label implied)

    Deltas: grads_only-fwd_only = backward; full-grads_only = clip+Adam
    apply (grads_only omits clip_by_global_norm, so the global-norm clip
    transform is part of this delta; ADVICE r3); full-fix_emb =
    embedding scatter-add backward + table optimizer cost.  Each variant
    times min-of-2 passes (tunnel jitter would otherwise corrupt the
    small differences).
    """
    import bench as bench_mod
    import optax

    from context_attentive_ir_tpu.models import build_model
    from context_attentive_ir_tpu.train.state import create_train_state
    from context_attentive_ir_tpu.train.steps import (make_loss_fn,
                                                      make_train_step)

    cfg, model, params, batch = bench_mod._build_cars(True)
    rng = jax.random.key(1)

    loss_fn = make_loss_fn(model, cfg)

    @jax.jit
    def fwd_only(params, batch, rng):
        return loss_fn(params, batch, rng)[0]

    @jax.jit
    def grads_only(params, batch, rng):
        (_, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng)
        return m["loss"], optax.global_norm(grads)

    ms = timed_min2(fwd_only, params, batch, rng, warmup=3, iters=10)
    report("train_parts", ms, variant="fwd_only")
    parts = {"fwd_only": ms}
    ms = timed_min2(grads_only, params, batch, rng, warmup=3, iters=10)
    report("train_parts", ms, variant="grads_only")
    parts["grads_only"] = ms

    rows = bench_mod.B * bench_mod.S * bench_mod.N

    def run_full(cfg, model, batch, variant):
        state = create_train_state(model, cfg, batch, jax.random.key(0))
        step = make_train_step(model, cfg)

        def one_pass(s, warmup, iters=10):
            m = None
            for _ in range(warmup):
                s, m = step(s, batch, rng)
            if m is not None:
                jax.device_get(m["loss"])
            t0 = time.perf_counter()
            for _ in range(iters):
                s, m = step(s, batch, rng)
            jax.device_get(m["loss"])
            return s, (time.perf_counter() - t0) / iters

        # min-of-2 passes (state is donated, so chain it through)
        s, ms1 = one_pass(state, warmup=3)
        _, ms2 = one_pass(s, warmup=0)
        ms = min(ms1, ms2)
        report("train_parts", ms, variant=variant,
               docs_per_sec=round(rows / ms, 1))
        return ms

    parts["full"] = run_full(cfg, model, batch, "full")
    cfg_f = cfg.replace(fix_embeddings=True)
    parts["fix_emb"] = run_full(cfg_f, build_model(cfg_f), batch, "fix_emb")
    print(json.dumps({"exp": "train_parts", "deltas_ms": {
        "backward": round((parts["grads_only"] - parts["fwd_only"]) * 1e3, 2),
        "clip_adam_apply": round(
            (parts["full"] - parts["grads_only"]) * 1e3, 2),
        "emb_grad_plus_table_adam": round(
            (parts["full"] - parts["fix_emb"]) * 1e3, 2),
    }}), flush=True)


def gru_train():
    """GRU fwd+bwd: chunked-remat kernel pair vs scan autodiff, 16k rows."""
    from context_attentive_ir_tpu.ops.pallas.gru import (
        gru_pallas_fused,
        gru_pallas_reference,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=(ROWS, T, E)) * 0.3, jnp.bfloat16)
    w_ih = jnp.asarray(rng.normal(size=(E, 3 * H)) * 0.1, jnp.bfloat16)
    b_ih = jnp.asarray(rng.normal(size=(3 * H,)) * 0.1, jnp.bfloat16)
    w_hh = jnp.asarray(rng.normal(size=(H, 3 * H)) * 0.1, jnp.bfloat16)
    b_hh = jnp.asarray(rng.normal(size=(3 * H,)) * 0.1, jnp.bfloat16)
    mask = jnp.ones((ROWS, T), bool)

    def loss_k(x, w_ih, b_ih, w_hh, b_hh):
        return jnp.sum(gru_pallas_fused(x, mask, w_ih, b_ih, w_hh, b_hh)
                       .astype(jnp.float32) ** 2)

    def loss_s(x, w_ih, b_ih, w_hh, b_hh):
        return jnp.sum(gru_pallas_reference(x, mask, w_ih, b_ih, w_hh,
                                            b_hh).astype(jnp.float32) ** 2)

    gk = jax.jit(jax.grad(loss_k, argnums=(0, 2, 3)))
    gs = jax.jit(jax.grad(loss_s, argnums=(0, 2, 3)))
    ms = timed(gs, x, w_ih, b_ih, w_hh, b_hh)
    report("gru_fwdbwd_scan", ms)
    ms = timed(gk, x, w_ih, b_ih, w_hh, b_hh)
    report("gru_fwdbwd_kernel", ms)
    a = jax.device_get(gk(x, w_ih, b_ih, w_hh, b_hh))
    b = jax.device_get(gs(x, w_ih, b_ih, w_hh, b_hh))
    errs = [float(np.max(np.abs(np.asarray(u, np.float32)
                                - np.asarray(v, np.float32)))
                  / max(float(np.max(np.abs(np.asarray(v, np.float32)))),
                        1e-6)) for u, v in zip(a, b)]
    report("gru_fwdbwd_parity", 0.0, max_rel_errs=[round(e, 4)
                                                   for e in errs])


def decode_step_only():
    """Isolate the model-side decoder step (no beam machinery): a 16-step
    scan of decode_step at beam-expanded rows."""
    import bench as bench_mod

    _, model, params, batch = bench_mod._build_cars(True)
    var = {"params": params}

    @jax.jit
    def run(params, batch):
        var = {"params": params}
        state, memory, memory_mask = model.apply(
            var, batch, method=model.decode_init)
        rep = lambda v: jnp.repeat(v, 5, axis=0)
        state = jax.tree_util.tree_map(rep, state)
        mem_k, mask_k = rep(memory), rep(memory_mask)
        rows = mem_k.shape[0]

        def body(carry, _):
            st, tok = carry
            st, logits, align = model.apply(var, st, tok, mem_k, mask_k,
                                            method=model.decode_step)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            return (st, nxt), logits[:, 0]

        tok0 = jnp.full((rows,), 2, jnp.int32)
        (_, _), outs = jax.lax.scan(body, (state, tok0), jnp.arange(16))
        return outs

    ms = timed(run, params, batch, warmup=2, iters=10)
    report("decode_step_only_x16", ms)
    del var


def indexed():
    """Cached-document ranking throughput, with and without the cached
    pooling projection (serve.py rank_indexed path)."""
    import bench as bench_mod

    _, model, params, batch = bench_mod._build_cars(True)
    n_corpus, Ld, h2 = 20000, 30, 2 * H
    rng = np.random.RandomState(0)
    states = jnp.asarray(rng.normal(size=(n_corpus, Ld, h2)) * 0.5,
                         jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, n_corpus,
                                  size=(bench_mod.B, bench_mod.N)),
                      jnp.int32)

    @jax.jit
    def proj_of(params, states):
        return model.apply({"params": params}, states,
                           method=model.encode_docs_proj)

    proj = proj_of(params, states)

    def run(with_proj):
        @jax.jit
        def score(params, batch, states, idx, proj):
            B, S = batch.query.shape[:2]

            def expand(arr):
                g = jnp.take(arr, idx, axis=0)
                return jnp.broadcast_to(g[:, None], (B, S) + g.shape[1:])

            d_states = expand(states)
            d_proj = expand(proj) if with_proj else None
            return model.apply({"params": params}, batch, d_states,
                               d_proj, method=model.score)

        ms = timed(score, params, batch, states, idx,
                   proj if with_proj else None)
        report("rank_indexed", ms, cached_pool_proj=with_proj,
               docs_per_sec=round(
                   bench_mod.B * bench_mod.S * bench_mod.N / ms, 1))

    run(False)
    run(True)


def beam_parts():
    """Decompose the beam step: generator matmul+log_softmax vs top-k
    formulations over the [B, K*V] expansion."""
    rng = np.random.RandomState(0)
    B_, K, V, Hh = 320, 5, VOCAB, 256
    h = jnp.asarray(rng.normal(size=(B_ * K, Hh)) * 0.3, jnp.bfloat16)
    table = jnp.asarray(rng.normal(size=(V, Hh)) * 0.3, jnp.bfloat16)
    prev = jnp.zeros((B_, K), jnp.float32)

    def scan16(body):
        @jax.jit
        def run(h, table, prev):
            def step(carry, _):
                out = body(h, table, carry)
                return carry, out
            _, outs = jax.lax.scan(step, prev, jnp.arange(16))
            return outs
        return run

    def gen_only(h, table, prev):
        logits = (h @ table.T).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return jnp.sum(logp) * 0 + prev[0, 0]

    ms = timed(scan16(gen_only), h, table, prev, warmup=2, iters=5)
    report("beam_gen_logsoftmax_x16", ms)

    def flat_topk(h, table, prev):
        logits = (h @ table.T).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        total = prev[..., None] + logp.reshape(B_, K, V)
        top, idx = jax.lax.top_k(total.reshape(B_, K * V), K)
        return top.sum() + idx.sum()

    ms = timed(scan16(flat_topk), h, table, prev, warmup=2, iters=5)
    report("beam_flat_topk_x16", ms)

    def two_stage_topk(h, table, prev):
        logits = (h @ table.T).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        t1, i1 = jax.lax.top_k(logp, K)              # [B*K, K] per beam
        total = prev.reshape(B_ * K, 1) + t1
        top, i2 = jax.lax.top_k(total.reshape(B_, K * K), K)
        return top.sum() + i2.sum() + i1.sum()

    ms = timed(scan16(two_stage_topk), h, table, prev, warmup=2, iters=5)
    report("beam_two_stage_topk_x16", ms)

    def approx_two_stage(h, table, prev):
        logits = (h @ table.T).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        t1, i1 = jax.lax.approx_max_k(logp, K, recall_target=0.99)
        total = prev.reshape(B_ * K, 1) + t1
        top, i2 = jax.lax.top_k(total.reshape(B_, K * K), K)
        return top.sum() + i2.sum() + i1.sum()

    ms = timed(scan16(approx_two_stage), h, table, prev, warmup=2, iters=5)
    report("beam_approx_two_stage_x16", ms)

    def bf16_two_stage(h, table, prev):
        # current beam formulation, but top-k/lse on the native bf16
        # logits (no [B*K, V] f32 materialization); exact modulo tie
        # order since the scores are bf16-born anyway
        logits = h @ table.T                              # bf16
        mx = jnp.max(logits, axis=-1, keepdims=True).astype(jnp.float32)
        lse = jnp.log(jnp.sum(
            jnp.exp(logits.astype(jnp.float32) - mx), axis=-1,
            keepdims=True)) + mx
        t1, i1 = jax.lax.top_k(logits, K + 1)
        logp_top = t1.astype(jnp.float32) - lse
        total = prev.reshape(B_ * K, 1) + logp_top
        top, i2 = jax.lax.top_k(total.reshape(B_, K * (K + 1)), K)
        return top.sum() + i2.sum() + i1.sum()

    ms = timed(scan16(bf16_two_stage), h, table, prev, warmup=2, iters=5)
    report("beam_bf16_two_stage_x16", ms)


def beam_topk():
    """Shoot out top-(K+1) formulations in the CURRENT beam formulation
    (raw logits -> lse shift -> per-beam top-(K+1)); the exact f32 top_k
    is the remaining ~2.2 ms/step of beam machinery (STATUS.md).

    Variants: exact (beam.py today), TPU approx_max_k (recall .95/.99),
    and an exact chunked two-stage (top-k per V/G chunk, then top-k over
    the G*(K+1) chunk winners -- exact because every global top-(K+1)
    element is within its own chunk's top-(K+1))."""
    rng = np.random.RandomState(0)
    Bq, K, V, Hh = 320, 5, VOCAB, 256
    R = Bq * K
    Kc = K + 1
    h = jnp.asarray(rng.normal(size=(R, Hh)) * 0.3, jnp.bfloat16)
    table = jnp.asarray(rng.normal(size=(V, Hh)) * 0.3, jnp.bfloat16)
    prev = jnp.zeros((R,), jnp.float32)

    def scan16(body):
        @jax.jit
        def run(h, table, prev):
            def step(carry, _):
                return carry, body(h, table, carry)
            _, outs = jax.lax.scan(step, prev, jnp.arange(16))
            return outs
        return run

    def finish(t1, i1, lse, prev):
        # the rest of the beam step (combine + flat top-k over K*(K+1))
        logp_top = t1 - lse
        total = prev[:, None] + logp_top
        top, i2 = jax.lax.top_k(total.reshape(Bq, K * Kc), K)
        return top.sum() + i2.sum() + i1.sum()

    def exact(h, table, prev):
        scores32 = (h @ table.T).astype(jnp.float32)
        lse = jax.scipy.special.logsumexp(scores32, axis=-1, keepdims=True)
        t1, i1 = jax.lax.top_k(scores32, Kc)
        return finish(t1, i1, lse, prev)

    ms = timed(scan16(exact), h, table, prev, warmup=2, iters=5)
    report("beam_exact_f32_x16", ms)
    ms = timed(scan16(exact), h, table, prev, warmup=0, iters=5)
    report("beam_exact_f32_x16_p2", ms)

    def mk_approx(recall):
        def approx(h, table, prev):
            scores32 = (h @ table.T).astype(jnp.float32)
            lse = jax.scipy.special.logsumexp(scores32, axis=-1,
                                              keepdims=True)
            t1, i1 = jax.lax.approx_max_k(scores32, Kc,
                                          recall_target=recall)
            return finish(t1, i1, lse, prev)
        return approx

    for recall in (0.95, 0.99):
        ms = timed(scan16(mk_approx(recall)), h, table, prev,
                   warmup=2, iters=5)
        report("beam_approx_x16", ms, recall=recall)

    def mk_chunked(G):
        Vc = V // G

        def chunked(h, table, prev):
            scores32 = (h @ table.T).astype(jnp.float32)
            lse = jax.scipy.special.logsumexp(scores32, axis=-1,
                                              keepdims=True)
            c = scores32.reshape(R * G, Vc)
            tc_, ic_ = jax.lax.top_k(c, Kc)               # [R*G, Kc]
            cand = tc_.reshape(R, G * Kc)
            # global ids: chunk base + in-chunk id
            base = (jnp.arange(G, dtype=jnp.int32) * Vc)[None, :, None]
            gid = (ic_.reshape(R, G, Kc) + base).reshape(R, G * Kc)
            t1, sel = jax.lax.top_k(cand, Kc)             # [R, Kc]
            i1 = jnp.take_along_axis(gid, sel, axis=1)
            return finish(t1, i1, lse, prev)
        return chunked

    for G in (8, 25):
        ms = timed(scan16(mk_chunked(G)), h, table, prev,
                   warmup=2, iters=5)
        report("beam_chunked_exact_x16", ms, chunks=G)


def suggest():
    """Decompose beam-5 decode: init vs full; beam width scaling."""
    sys.path.insert(0, str(ROOT))
    import bench as bench_mod

    _, model, params, batch = bench_mod._build_cars(True)

    @jax.jit
    def init_only(params, batch):
        return model.apply({"params": params}, batch,
                           method=model.decode_init)

    ms = timed(init_only, params, batch)
    report("decode_init", ms)

    from context_attentive_ir_tpu.decode import beam_search, greedy_decode

    def mk(beam):
        @jax.jit
        def run(params, batch):
            var = {"params": params}
            state, memory, memory_mask = model.apply(
                var, batch, method=model.decode_init)
            rows = memory.shape[0]
            if beam == 1:
                step = lambda st, toks: model.apply(
                    var, st, toks, memory, memory_mask,
                    method=model.decode_step)
                return greedy_decode(step, state, rows, 16)
            rep = lambda v: jnp.repeat(v, beam, axis=0)
            mem_k, mask_k = rep(memory), rep(memory_mask)
            step = lambda st, toks: model.apply(
                var, st, toks, mem_k, mask_k, method=model.decode_step)
            return beam_search(step, state, rows, 16, beam)
        return run

    for beam in (1, 5):
        ms = timed(mk(beam), params, batch, warmup=2, iters=10)
        report("decode_full", ms, beam=beam,
               qps=round(bench_mod.B * bench_mod.S / ms, 1))


def dispatch_table_beamgen():
    """Fused Pallas generator+top-k+lse kernel vs the XLA formulation,
    measured as END-TO-END DECODE SLOPES (round 5 rewrite; VERDICT r4
    weak #1).  The round-4 harness timed both formulations inside a
    synthetic carry-threaded 16-step scan; honest for the kernel, but
    the XLA side hit a context-dependent lax.top_k pathology (86.9
    ms/step in that scan vs 12.9 ms as a bare jitted call vs 2.9 ms/step
    inside the real production beam scan -- beam_xla_slope /
    beamgen_xla_anatomy, round 5).  Microbench magnitudes for this op
    are therefore meaningless outside the production program; rows now
    come from the only context that matters: full CARS decode at T=2 vs
    T=16, per-step cost = (t16 - t2) / 14, generator step forced each
    way.  kc=2 measures GREEDY decode (rows = Bq); kc=K+1 measures
    beam-K (rows = Bq*K).  Usage: dispatch_table_beamgen [kc...]
    (default 6 2).  Production tiles (320:2048) only -- tile sweeps via
    e2e slopes would cost a fresh multi-minute Mosaic compile per tile.
    """
    import bench as bench_mod

    from context_attentive_ir_tpu.decode import (
        beam_search,
        greedy_decode,
        make_fused_beam_step,
    )
    from context_attentive_ir_tpu.ops import dispatch

    _cfg, model, params, batch = bench_mod._build_cars(True)

    def run(kc, fused, T):
        K = kc - 1

        @jax.jit
        def fn(params, batch):
            var = {"params": params}
            state, memory, mask = model.apply(var, batch,
                                              method=model.decode_init)
            rows = memory.shape[0]
            if kc == 2:
                mem_k, mask_k = memory, mask
            else:
                rep = lambda x: jnp.repeat(x, K, axis=0)
                mem_k, mask_k = rep(memory), rep(mask)
            if fused:
                step = make_fused_beam_step(model, var, params, mem_k,
                                            mask_k, kc=kc)
            else:
                step = lambda st, toks: model.apply(
                    var, st, toks, mem_k, mask_k,
                    method=model.decode_step)
            if kc == 2:
                return greedy_decode(step, state, rows, T)
            return beam_search(step, state, rows, T, K)
        return fn

    timed2 = functools.partial(timed_min2, iters=3)
    Bq = bench_mod.B * bench_mod.S

    kcs = [int(a) for a in sys.argv[2:]] or [6, 2]
    new = []
    for kc in kcs:
        slope, total2 = {}, {}
        for fused in (False, True):
            t2 = timed2(run(kc, fused, 2), params, batch) * 1e3
            t16 = timed2(run(kc, fused, 16), params, batch) * 1e3
            slope[fused] = (t16 - t2) / 14
            total2[fused] = t2
            report("dispatch_beamgen", slope[fused] / 1e3, kc=kc,
                   fused=fused, t2_ms=round(t2, 2), t16_ms=round(t16, 2))
        rows = Bq * (kc - 1) if kc > 2 else Bq
        # rows carry BOTH the per-step slope and the T=2 total: the
        # dispatch decision extrapolates t2 + (T-2)*slope at the
        # caller's decode length, because the two formulations have
        # different INTERCEPTS (the fused kernel's hoisted table prep)
        # and the slope-only comparison picked the wrong greedy winner
        # at T=16 (PERF.md r5 #7).
        new.append(dict(kind="beam_gen", v=VOCAB, e=E, kc=kc, rows=rows,
                        fused_ms=round(slope[True], 3),
                        xla_ms=round(slope[False], 3),
                        fused_t2_ms=round(total2[True], 3),
                        xla_t2_ms=round(total2[False], 3),
                        block_r=320, block_v=2048, method="e2e_slope"))
    # keep beam_gen rows at other (kc, rows) keys: a `dispatch_table_
    # beamgen 2` run must not discard the measured kc=6 beam row
    fresh = {(x["kc"], x["rows"], x["v"], x["e"]) for x in new}
    merged = [e for e in dispatch._load_table()
              if e.get("kind") != "beam_gen"
              or (e["kc"], e["rows"], e["v"], e["e"]) not in fresh] + new
    dispatch.write_table(merged)
    print(json.dumps({"exp": "dispatch_table_beamgen",
                      "written": str(dispatch.TABLE_PATH),
                      "n_entries": len(merged)}), flush=True)




def beam_shortlist_e2e():
    """Candidate-shortlist beam decode, measured END-TO-END (round 5,
    VERDICT r4 weak #3): full CARS beam-5 decode at the bench shape with
    the fused generator restricted to a C-token shortlist
    (decode/shortlist.py) vs the full-vocab fused decode.  Usage:
    beam_shortlist_e2e [C...] (default 8192 4096 2048).  Quality is
    gated separately on trained models (scripts/shortlist_study.py);
    this measures the speed side at production shape."""
    import bench as bench_mod

    from context_attentive_ir_tpu.decode import (
        beam_search,
        make_fused_beam_step,
    )
    from context_attentive_ir_tpu.decode.shortlist import build_shortlist

    _cfg, model, params, batch = bench_mod._build_cars(True)
    Bq = bench_mod.B * bench_mod.S

    def run(sl):
        def impl(params, batch, sl_ids=None):
            var = {"params": params}
            state, memory, mask = model.apply(var, batch,
                                              method=model.decode_init)
            rep = lambda x: jnp.repeat(x, 5, axis=0)
            step = make_fused_beam_step(
                model, var, params, rep(memory), rep(mask), kc=6,
                shortlist=sl_ids)
            return beam_search(step, state, Bq, 16, 5)
        if sl is None:
            return jax.jit(impl)
        fn = jax.jit(impl)
        return lambda p, b: fn(p, b, sl)

    timed2 = functools.partial(timed_min2, iters=3)
    # full-vocab fused baseline
    full = run(None)
    ms_full = timed2(full, params, batch) * 1e3
    report("beam_shortlist_e2e", ms_full / 1e3, c=VOCAB,
           qps=round(Bq / ms_full * 1e3, 1))
    sizes = [int(a) for a in sys.argv[2:]] or [8192, 4096, 2048]
    rng = np.random.RandomState(0)
    for c in sizes:
        sl = jnp.asarray(build_shortlist(
            c, VOCAB, source_ids=np.asarray(batch.query)))
        ms = timed2(run(sl), params, batch) * 1e3
        report("beam_shortlist_e2e", ms / 1e3, c=c,
               qps=round(Bq / ms * 1e3, 1),
               speedup=round(ms_full / ms, 2))


def beamgen_prune_probe():
    """Threshold-pruned beamgen selection (round 5): carry-threaded
    16-step scans of the SAME Pallas kernel with prune on/off, on two
    logits regimes at the bench generator shape ([1600, 256] x
    [256, 50k] bf16, kc=6):

    - ``random``: i.i.d. table -- per-row top-k lands in different tiles
      for different rows, so the all-rows-skip predicate ~never fires;
      measures the prune branch's pure overhead.
    - ``concentrated``: column norms decay Zipf-like (frequency-sorted
      vocab + trained generator), every row's top-k concentrated in the
      first tile -- measures the ceiling when ~24/25 tiles prune.

    Both sides are the same kernel +- one branch on identical inputs, so
    the isolated A/B is meaningful (the r5 #1 top_k context pathology
    applied to XLA's top_k emitter, not to a self-relative Pallas A/B).
    The carry threads x through the kernel's val output so nothing
    hoists (r4 10a lesson)."""
    from context_attentive_ir_tpu.ops.pallas.beamgen import (
        generator_topk_lse,
    )

    rng = np.random.RandomState(0)
    r, e, v, kc = 1600, E, VOCAB, 6
    x0 = jnp.asarray(rng.normal(size=(r, e)) * 0.3, jnp.bfloat16)
    t_rand = jnp.asarray(rng.normal(size=(e, v)) * 0.3, jnp.bfloat16)
    decay = np.ones(v, np.float32) * 0.05
    decay[:2048] = 3.0                       # tile 0 dominates every row
    t_conc = jnp.asarray(np.asarray(t_rand, np.float32)
                         * decay[None, :], jnp.bfloat16)

    def block(table, prune):
        @jax.jit
        def run(x):
            def step(carry, _):
                vals, idx, lse = generator_topk_lse(
                    carry, table, kc, prune=prune)
                # fold the outputs back into the carry so each step
                # depends on the last (nothing hoists)
                carry = carry + (vals[:, :1] * 0 + lse[:, None] * 0
                                 ).astype(carry.dtype)
                return carry, (vals[:, 0], idx[:, 0])
            return jax.lax.scan(step, x, None, length=16)
        return run

    for label, table in (("random", t_rand), ("concentrated", t_conc)):
        for prune in (False, True):
            ms = timed_min2(block(table, prune), x0) * 1e3
            report("beamgen_prune_probe", ms / 1e3, regime=label,
                   prune=prune, per_step_ms=round(ms / 16, 3))


def dispatch_table_beamgen_prune():
    """Threshold-pruned vs unconditional beamgen selection, measured as
    END-TO-END DECODE SLOPES (the r5 #1 methodology: full CARS fused
    decode at T=2 vs T=16, per-step cost = (t16 - t2)/14, prune forced
    each way; both sides bit-exact so this is speed-only).  Random-init
    params are the CONSERVATIVE regime for prune (the all-rows-skip
    predicate ~never fires; trained frequency-sorted vocabs only prune
    MORE -- beamgen_prune_probe: 1.27x random, 3.11x concentrated), so
    a row written here under-promises.  Writes ``beam_gen_prune`` rows
    {rows, kc, prune_ms, base_ms} consulted by
    ``ops.dispatch.prefer_pruned_generator``.  Usage:
    dispatch_table_beamgen_prune [kc...] (default 6)."""
    import bench as bench_mod

    from context_attentive_ir_tpu.decode import (
        beam_search,
        greedy_decode,
        make_fused_beam_step,
    )
    from context_attentive_ir_tpu.ops import dispatch

    _cfg, model, params, batch = bench_mod._build_cars(True)

    def run(kc, prune, T):
        K = kc - 1

        @jax.jit
        def fn(params, batch):
            var = {"params": params}
            state, memory, mask = model.apply(var, batch,
                                              method=model.decode_init)
            rows = memory.shape[0]
            if kc == 2:
                mem_k, mask_k = memory, mask
            else:
                rep = lambda x: jnp.repeat(x, K, axis=0)
                mem_k, mask_k = rep(memory), rep(mask)
            step = make_fused_beam_step(model, var, params, mem_k,
                                        mask_k, kc=kc, pipeline=False,
                                        prune=prune)
            if kc == 2:
                return greedy_decode(step, state, rows, T)
            return beam_search(step, state, rows, T, K)
        return fn

    timed2 = functools.partial(timed_min2, iters=3)
    Bq = bench_mod.B * bench_mod.S

    kcs = [int(a) for a in sys.argv[2:]] or [6]
    new = []
    for kc in kcs:
        slope = {}
        for prune in (False, True):
            t2 = timed2(run(kc, prune, 2), params, batch) * 1e3
            t16 = timed2(run(kc, prune, 16), params, batch) * 1e3
            slope[prune] = (t16 - t2) / 14
            report("dispatch_beamgen_prune", slope[prune] / 1e3, kc=kc,
                   prune=prune, t2_ms=round(t2, 2), t16_ms=round(t16, 2))
        # decoded outputs must agree exactly (both exact selections)
        s1, _ = jax.device_get(run(kc, False, 16)(params, batch))
        s2, _ = jax.device_get(run(kc, True, 16)(params, batch))
        mismatch = int((np.asarray(s1) != np.asarray(s2)).sum())
        rows = Bq * (kc - 1) if kc > 2 else Bq
        new.append(dict(kind="beam_gen_prune", kc=kc, rows=rows,
                        prune_ms=round(slope[True], 3),
                        base_ms=round(slope[False], 3),
                        seq_mismatch=mismatch, method="e2e_slope"))
    fresh = {(x["kc"], x["rows"]) for x in new}
    merged = [e for e in dispatch._load_table()
              if e.get("kind") != "beam_gen_prune"
              or (e["kc"], e["rows"]) not in fresh] + new
    dispatch.write_table(merged)
    print(json.dumps({"exp": "dispatch_table_beamgen_prune",
                      "written": str(dispatch.TABLE_PATH),
                      "n_entries": len(merged)}), flush=True)


def beam_int8_e2e():
    """int8-table fused beam decode, END-TO-END (round 5, VERDICT r4
    next-round #1's beamgen leg): full CARS beam-5 decode at the bench
    shape with (a) the bf16-table fused kernel on float params, (b) the
    int8-table fused kernel on serve-quantized params
    (serve.quantize_embedding_params -- the whole model runs with the
    quantized embeddings, exactly like a quantized Engine).  The kernel's
    dominant HBM stream (the [E, V] table, 25.6 MB bf16 at bench shape)
    halves in (b).  Also reports greedy (kc=2) both ways."""
    import bench as bench_mod

    from context_attentive_ir_tpu.decode import (
        beam_search,
        greedy_decode,
        make_fused_beam_step,
    )
    from context_attentive_ir_tpu.serve import quantize_embedding_params

    cfg, model, params, batch = bench_mod._build_cars(True)
    Bq = bench_mod.B * bench_mod.S
    params_q = quantize_embedding_params(params)
    from context_attentive_ir_tpu.models import build_model

    model_q = build_model(cfg.replace(quantize_embeddings=True))

    def run(mdl, prm, kc):
        K = kc - 1

        @jax.jit
        def fn(prm, batch):
            var = {"params": prm}
            state, memory, mask = mdl.apply(var, batch,
                                            method=mdl.decode_init)
            if kc == 2:
                mem_k, mask_k = memory, mask
            else:
                rep = lambda x: jnp.repeat(x, K, axis=0)
                mem_k, mask_k = rep(memory), rep(mask)
            step = make_fused_beam_step(mdl, var, prm, mem_k, mask_k,
                                        kc=kc)
            assert step is not None
            if kc == 2:
                return greedy_decode(step, state, Bq, 16)
            return beam_search(step, state, Bq, 16, K)
        return lambda p, b: fn(p, b)

    timed2 = functools.partial(timed_min2, iters=3)
    for kc in (6, 2):
        ms_bf = timed2(run(model, params, kc), params, batch) * 1e3
        ms_q = timed2(run(model_q, params_q, kc), params_q, batch) * 1e3
        report("beam_int8_e2e", ms_q / 1e3, kc=kc,
               bf16_ms=round(ms_bf, 2), int8_ms=round(ms_q, 2),
               qps_bf16=round(Bq / ms_bf * 1e3, 1),
               qps_int8=round(Bq / ms_q * 1e3, 1),
               speedup=round(ms_bf / ms_q, 3))


def beam_fused_e2e():
    """END-TO-END confirmation for the fused generator (CLAUDE.md round-2
    lesson: dispatch decisions are confirmed end-to-end, not from
    microbenches): full CARS beam-5 suggestion decode at the bench shape,
    logits step vs fused Pallas step, min-of-2 passes each."""
    import bench as bench_mod

    _cfg, model, params, batch = bench_mod._build_cars(True)

    def run(fused):
        return jax.jit(lambda p, b: _suggest_impl(model, p, b, fused))

    from context_attentive_ir_tpu.decode import (beam_search,
                                                 make_fused_beam_step)

    def _suggest_impl(model, params, batch, fused):
        var = {"params": params}
        state, memory, memory_mask = model.apply(
            var, batch, method=model.decode_init)
        rows = memory.shape[0]
        rep = lambda x: jnp.repeat(x, 5, axis=0)
        mem_k, mask_k = rep(memory), rep(memory_mask)
        if fused:
            step = make_fused_beam_step(model, var, params, mem_k, mask_k,
                                        kc=6)
        else:
            step = lambda st, toks: model.apply(
                var, st, toks, mem_k, mask_k, method=model.decode_step)
        return beam_search(step, state, rows, 16, 5)

    timed2 = timed_min2

    for fused in (False, True):
        ms = timed2(run(fused), params, batch)
        report("beam_fused_e2e", ms, fused=fused,
               qps=round(bench_mod.B * bench_mod.S / ms, 1))
    # decoded-output parity on-chip (sequences must match exactly)
    s1, sc1 = jax.device_get(run(False)(params, batch))
    s2, sc2 = jax.device_get(run(True)(params, batch))
    mismatch = int((np.asarray(s1) != np.asarray(s2)).sum())
    print(json.dumps({"exp": "beam_fused_e2e", "seq_mismatch": mismatch,
                      "score_max_diff": float(np.max(np.abs(
                          np.asarray(sc1) - np.asarray(sc2))))}),
          flush=True)


def early_exit_probe():
    """Overhead of the all-finished early-exit cond (decode/beam.py
    ``early_exit``) in the WORST case: full CARS decode at the bench
    shape with random-init params, which essentially never emit EOS --
    so the skip branch never fires and the probe prices the pure cost
    of the added per-step ``all(finished)`` reduce + ``lax.cond``
    plumbing.  Beam-5 through the fused generator (the production
    dispatch) and greedy through the XLA step (ditto); min-of-2; exact
    sequence parity asserted on-chip.  The WIN side (trained models
    that finish in ~3-5 of max_len steps) is measured on the rehearsal
    model by scripts/aol_shortlist_study.py ``exact`` vs
    ``exact_noearly``."""
    import bench as bench_mod

    from context_attentive_ir_tpu.decode import (
        beam_search,
        greedy_decode,
        make_fused_beam_step,
    )

    _cfg, model, params, batch = bench_mod._build_cars(True)
    Bq = bench_mod.B * bench_mod.S
    timed2 = functools.partial(timed_min2, iters=3)

    def beam(early):
        def impl(params, batch):
            var = {"params": params}
            state, memory, mask = model.apply(var, batch,
                                              method=model.decode_init)
            rep = lambda x: jnp.repeat(x, 5, axis=0)
            step = make_fused_beam_step(model, var, params, rep(memory),
                                        rep(mask), kc=6)
            return beam_search(step, state, Bq, 16, 5, early_exit=early)
        return jax.jit(impl)

    def greedy(early):
        def impl(params, batch):
            var = {"params": params}
            state, memory, mask = model.apply(var, batch,
                                              method=model.decode_init)
            step = lambda st, toks: model.apply(
                var, st, toks, memory, mask, method=model.decode_step)
            return greedy_decode(step, state, Bq, 16, early_exit=early)
        return jax.jit(impl)

    outs = {}
    for name, mk in (("beam", beam), ("greedy", greedy)):
        for early in (False, True):
            fn = mk(early)
            ms = timed2(fn, params, batch)
            report("early_exit_probe", ms, mode=name, early_exit=early,
                   qps=round(Bq / (ms * 1e3), 1))
            outs[(name, early)] = np.asarray(
                jax.device_get(fn(params, batch)[0]))
        mism = int((outs[(name, False)] != outs[(name, True)]).sum())
        print(json.dumps({"exp": "early_exit_probe", "mode": name,
                          "seq_mismatch": mism}), flush=True)


def beam_parts_fused():
    """SUPERSEDED by ``beam_slope`` (PERF.md r4 #5 vs #6) -- kept for the
    record.  This parts decomposition double-counts two artifacts:
    every isolated part carries the ~3-4 ms per-execution timing
    constant (``scan_floor``), and ``kernel_scan`` below consumes
    loop-invariant inputs, so XLA hoists the pallas call out of the scan
    and 16 "steps" price ONE kernel call.  Its "residual ~= bookkeeping"
    conclusion was wrong (the residual was the generator itself); use
    slope fitting (``beam_slope``) for any per-step attribution."""
    import bench as bench_mod

    from context_attentive_ir_tpu.decode import (beam_search,
                                                 make_fused_beam_step)
    from context_attentive_ir_tpu.ops.pallas.beamgen import (
        generator_topk_lse,
    )

    _cfg, model, params, batch = bench_mod._build_cars(True)
    var = {"params": params}
    K, kc = 5, 6

    timed2 = timed_min2

    @jax.jit
    def init_only(params, batch):
        return model.apply({"params": params}, batch,
                           method=model.decode_init)

    init_ms = timed2(init_only, params, batch) * 1e3
    report("beam_parts_fused", init_ms / 1e3, stage="decode_init")

    state, memory, memory_mask = init_only(params, batch)
    rows = memory.shape[0]
    rep = lambda x: jnp.repeat(x, K, axis=0)
    mem_k, mask_k = rep(memory), rep(memory_mask)

    @jax.jit
    def model_scan(params, state):
        var = {"params": params}
        toks = jnp.full((rows * K,), 2, jnp.int32)

        def step(st, _):
            st, proj, _ = model.apply(var, st, toks, mem_k, mask_k,
                                      method=model.decode_step_fused)
            return st, proj.sum()
        st = jax.tree_util.tree_map(lambda x: jnp.repeat(x, K, axis=0),
                                    state)
        _, outs = jax.lax.scan(step, st, jnp.arange(16))
        return outs

    model_ms = timed2(model_scan, params, state) * 1e3
    report("beam_parts_fused", model_ms / 1e3, stage="model_steps_16")

    table_t = params["embeddings"]["embedding"].T.astype(jnp.bfloat16)
    proj = jnp.zeros((rows * K, table_t.shape[0]), jnp.bfloat16)

    @jax.jit
    def kernel_scan(proj, table_t):
        def step(carry, _):
            v, i, l = generator_topk_lse(proj, table_t, kc)
            return carry, v.sum() + i.sum() + l.sum()
        _, outs = jax.lax.scan(step, jnp.float32(0), jnp.arange(16))
        return outs

    kern_ms = timed2(kernel_scan, proj, table_t) * 1e3
    report("beam_parts_fused", kern_ms / 1e3, stage="generator_kernel_16")

    @jax.jit
    def full(params, batch):
        var = {"params": params}
        state, memory, memory_mask = model.apply(
            var, batch, method=model.decode_init)
        mem_k, mask_k = rep(memory), rep(memory_mask)
        step = make_fused_beam_step(model, var, params, mem_k, mask_k,
                                    kc=kc)
        return beam_search(step, state, rows, 16, K)

    full_ms = timed2(full, params, batch) * 1e3
    resid = full_ms - init_ms - model_ms - kern_ms
    report("beam_parts_fused", full_ms / 1e3, stage="full_beam5",
           residual_beam_logic_ms=round(resid, 3))
    print(json.dumps({"exp": "beam_parts_fused", "attribution": {
        "decode_init": round(init_ms, 3),
        "model_steps_16": round(model_ms, 3),
        "generator_kernel_16": round(kern_ms, 3),
        "full_beam5": round(full_ms, 3),
        "residual_beam_logic": round(resid, 3)}}), flush=True)


def dispatch_table_beambk():
    """Beam BOOKKEEPING A/B, measured END-TO-END (CLAUDE.md round-2
    lesson: confirm dispatch decisions end-to-end, not from
    microbenches): full CARS beam suggestion decode at the bench shape
    with the fused generator step, ``legacy`` (lax.top_k merge + row
    gathers + carried sequence buffer) vs ``fused`` (iterative
    masked-max merge with token payload, one-hot select+sum reorders,
    post-scan backpointer reconstruction) bookkeeping (measured +2.3%
    for fused; the step is generator-bound -- PERF.md r4 #6/#7).
    Writes ``beam_bk`` rows keyed (rows=B*K, k) consumed by
    ``ops.dispatch.prefer_fused_bookkeeping``; the merge inputs are the
    same [B, K*(K+1)] arrays under either generator step, so the row
    also decides XLA-generator beams at the same shape.  Both modes are
    bit-exact (CI: tests/test_decode.py); on-chip decoded-output parity
    is asserted anyway.  Usage: dispatch_table_beambk [K...]."""
    import bench as bench_mod

    from context_attentive_ir_tpu.decode import (beam_search,
                                                 make_fused_beam_step)
    from context_attentive_ir_tpu.ops import dispatch

    _cfg, model, params, batch = bench_mod._build_cars(True)
    state0, memory0, _ = jax.jit(lambda p, b: model.apply(
        {"params": p}, b, method=model.decode_init))(params, batch)
    Bq = memory0.shape[0]

    def run(K, bk):
        @jax.jit
        def f(params, batch):
            var = {"params": params}
            state, memory, memory_mask = model.apply(
                var, batch, method=model.decode_init)
            rows = memory.shape[0]
            rep = lambda x: jnp.repeat(x, K, axis=0)
            mem_k, mask_k = rep(memory), rep(memory_mask)
            step = make_fused_beam_step(model, var, params, mem_k, mask_k,
                                        kc=K + 1)
            return beam_search(step, state, rows, 16, K, bookkeeping=bk)
        return f

    timed2 = timed_min2

    widths = [int(a) for a in sys.argv[2:]] or [5]
    new = []
    for K in widths:
        ms, outs = {}, {}
        for bk in ("legacy", "fused"):
            fn = run(K, bk)
            ms[bk] = timed2(fn, params, batch) * 1e3
            outs[bk] = jax.device_get(fn(params, batch))
            report("dispatch_beambk", ms[bk] / 1e3, k=K, bookkeeping=bk,
                   qps=round(Bq / ms[bk] * 1e3, 1))
        mism = int((np.asarray(outs["legacy"][0])
                    != np.asarray(outs["fused"][0])).sum())
        sdiff = float(np.max(np.abs(np.asarray(outs["legacy"][1])
                                    - np.asarray(outs["fused"][1]))))
        print(json.dumps({"exp": "dispatch_beambk", "k": K,
                          "seq_mismatch": mism,
                          "score_max_diff": sdiff}), flush=True)
        new.append(dict(kind="beam_bk", rows=Bq * K, k=K,
                        fused_ms=round(ms["fused"], 3),
                        legacy_ms=round(ms["legacy"], 3)))
    fresh = {(x["rows"], x["k"]) for x in new}
    merged = [e for e in dispatch._load_table()
              if e.get("kind") != "beam_bk"
              or (e["rows"], e["k"]) not in fresh] + new
    dispatch.write_table(merged)
    print(json.dumps({"exp": "dispatch_table_beambk",
                      "written": str(dispatch.TABLE_PATH),
                      "n_entries": len(merged)}), flush=True)


def int8_probe():
    """Quantified headroom check for int8 compute in the serving step
    (VERDICT r4 next-round #1): the three dominant matmul shapes --
    doc-encoder input projection (hoisted [R*T, E] @ [E, 4H]), the
    in-scan recurrent matmul ([R, H] @ [H, 4H], 16-step carry-threaded),
    and the query-aware pool projection ([R*Ld, H2] @ [H2, H2]) -- each
    timed bf16 vs weights-int8 + DYNAMIC per-row activation int8 with
    int32 accumulation (v5e's 2x-peak MXU path; weights-only-with-bf16-
    activations has no MXU speedup by construction, so dynamic is the
    only candidate with headroom).  All carry-threaded per the scan_floor
    lesson.  Also probes the beamgen byte side: streaming the [E, V]
    generator table bf16 vs int8+dequant in a plain XLA matmul."""
    rng = np.random.RandomState(0)
    R = ROWS  # 16000 flattened doc rows at the bench shape

    def q_w(w):
        """Per-output-column int8 weight quantization."""
        s = jnp.max(jnp.abs(w), axis=0) / 127.0
        wq = jnp.clip(jnp.round(w / s[None, :]), -127, 127).astype(jnp.int8)
        return wq, s.astype(jnp.float32)

    def dyn_matmul_i8(x, wq, ws):
        """Dynamic per-row activation int8 -> int8xint8 MXU -> rescale."""
        xs = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
        xs = jnp.maximum(xs, 1e-8)
        xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, wq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * xs * ws[None, :]

    def scan16(body, x0):
        @jax.jit
        def run(x):
            def step(carry, _):
                out = body(x * carry)
                return (out[0, 0] * 1e-6 + 1.0).astype(x.dtype), out.sum()
            _, outs = jax.lax.scan(step, jnp.asarray(1.0, x.dtype),
                                   jnp.arange(16))
            return outs
        return run

    shapes = [
        ("enc_proj", (R * T, E, 4 * H)),       # hoisted input projection
        ("enc_hh", (R, H, 4 * H)),             # per-step recurrent matmul
        ("pool_proj", (R * 30, 2 * H, 2 * H)),  # W_p over doc token states
    ]
    for name, (m, k, n) in shapes:
        x = jnp.asarray(rng.normal(size=(m, k)) * 0.3, jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(k, n)) * 0.1, jnp.float32)
        wbf = w.astype(jnp.bfloat16)
        wq, ws = q_w(w)
        bf_ms = timed_min2(scan16(
            lambda xx: jnp.dot(xx, wbf,
                               preferred_element_type=jnp.float32), x),
            x, iters=3) * 1e3
        i8_ms = timed_min2(scan16(
            lambda xx: dyn_matmul_i8(xx, wq, ws), x), x, iters=3) * 1e3
        report("int8_probe", bf_ms / 1e3, shape=name, m=m, k=k, n=n,
               per_step_bf16_ms=round(bf_ms / 16, 3),
               per_step_int8_ms=round(i8_ms / 16, 3),
               int8_speedup=round(bf_ms / i8_ms, 3))

    # byte-side probe at the beamgen shape: bf16 table vs int8 table
    # (dequantized in-graph -- measures the HBM stream saving only)
    r, V = 1600, VOCAB
    h = jnp.asarray(rng.normal(size=(r, E)) * 0.3, jnp.bfloat16)
    tt = jnp.asarray(rng.normal(size=(E, V)) * 0.1, jnp.float32)
    ttq, tts = q_w(tt)
    ttbf = tt.astype(jnp.bfloat16)
    bf_ms = timed_min2(scan16(
        lambda xx: jnp.dot(xx, ttbf,
                           preferred_element_type=jnp.float32), h),
        h, iters=3) * 1e3
    i8_ms = timed_min2(scan16(
        lambda xx: jnp.dot(xx, ttq.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        * tts[None, :], h), h, iters=3) * 1e3
    i8d_ms = timed_min2(scan16(
        lambda xx: dyn_matmul_i8(xx, ttq, tts), h), h, iters=3) * 1e3
    report("int8_probe", bf_ms / 1e3, shape="beamgen_table", m=r, k=E, n=V,
           per_step_bf16_ms=round(bf_ms / 16, 3),
           per_step_int8_dequant_ms=round(i8_ms / 16, 3),
           per_step_int8_dyn_ms=round(i8d_ms / 16, 3))


def beamgen_xla_anatomy():
    """Decompose the XLA side of the carry-threaded beamgen scan
    (round-5: the regenerated ``beam_gen`` row read 86.8 ms/step for the
    XLA formulation while the e2e XLA beam decode runs ~3.5 ms/step --
    find which op the honest scan makes pathological).  Cumulative
    prefixes at the kc=6 shape: matmul | +lse | +top_k(kc) | full
    reference; each stage carry-threaded exactly like the dispatch
    harness."""
    rng = np.random.RandomState(0)
    Bq, kc = 320, 6
    k = kc - 1
    r = Bq * k
    h0 = jnp.asarray(rng.normal(size=(r, E)) * 0.3, jnp.bfloat16)
    tt = jnp.asarray(rng.normal(size=(E, VOCAB)) * 0.3, jnp.bfloat16)

    def scan16(body):
        """body(x [r,E]) -> (scalar feeding the next step's input, out)"""
        @jax.jit
        def run(h):
            def step(carry, _):
                scale = carry
                s, out = body(h * scale)
                return (s * 1e-6 + 1.0).astype(h.dtype), out
            _, outs = jax.lax.scan(step, jnp.asarray(1.0, h.dtype),
                                   jnp.arange(16))
            return outs
        return run

    def mm_only(x):
        logits = jnp.dot(x, tt, preferred_element_type=jnp.float32)
        return logits[0, 0], logits.sum()

    def mm_lse(x):
        logits = jnp.dot(x, tt, preferred_element_type=jnp.float32)
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        return lse[0], lse.sum()

    def mm_lse_topk(x):
        logits = jnp.dot(x, tt, preferred_element_type=jnp.float32)
        lse = jax.scipy.special.logsumexp(logits, axis=-1)
        vals, idx = jax.lax.top_k(logits, kc)
        return vals[0, 0], vals.sum() + idx.sum() + lse.sum()

    def mm_topk(x):
        logits = jnp.dot(x, tt, preferred_element_type=jnp.float32)
        vals, idx = jax.lax.top_k(logits, kc)
        return vals[0, 0], vals.sum() + idx.sum()

    def mm_barrier_topk(x):
        # materialize the logits before top_k (mimics what any multi-use
        # boundary does in the production beam step): if the plain
        # mm_topk stage is far slower, XLA fused the matmul INTO the
        # sort-based top_k and recomputes it per sort pass
        logits = jnp.dot(x, tt, preferred_element_type=jnp.float32)
        logits = jax.lax.optimization_barrier(logits)
        vals, idx = jax.lax.top_k(logits, kc)
        return vals[0, 0], vals.sum() + idx.sum()

    def mm_barrier_lse_topk(x):
        # the exact production sequence (decode/beam.py XLA branch):
        # materialized scores -> logsumexp + top_k
        logits = jnp.dot(x, tt, preferred_element_type=jnp.float32)
        logits = jax.lax.optimization_barrier(logits)
        lse = jax.scipy.special.logsumexp(logits, axis=-1, keepdims=True)
        vals, idx = jax.lax.top_k(logits, kc)
        return vals[0, 0], (vals - lse).sum() + idx.sum()

    def mm_bf16_topk(x):
        # the PRODUCTION chain (decode/beam.py): the model's logits are
        # bf16 (compute_dtype), upcast to f32 before top_k -- XLA can
        # rewrite sort(convert(x)) to convert(sort(x)) and sort 16-bit
        # keys; forcing f32 matmul output (the probe above) cannot
        logits = jnp.dot(x, tt)                      # bf16 out
        scores32 = logits.astype(jnp.float32)
        vals, idx = jax.lax.top_k(scores32, kc)
        return vals[0, 0], vals.sum() + idx.sum()

    def topk_carried(x):
        # no matmul: top_k over an in-graph pseudo-random array (a real
        # array constant would ship 320 MB through the remote-compile
        # tunnel -> HTTP 413); ~1 ms of VPU hashing replaces the matmul
        i = jax.lax.broadcasted_iota(jnp.float32, (r, VOCAB), 1)
        jr = jax.lax.broadcasted_iota(jnp.float32, (r, VOCAB), 0)
        big = jnp.sin(i * 0.12345 + jr * 0.7311) + x[0, 0].astype(
            jnp.float32)
        vals, idx = jax.lax.top_k(big, kc)
        return vals[0, 0].astype(x.dtype), vals.sum() + idx.sum()

    import os as _os

    only = _os.environ.get("ANATOMY_STAGES", "").split(",")
    stages = [("mm", mm_only), ("mm_lse", mm_lse),
              ("mm_topk", mm_topk), ("mm_lse_topk", mm_lse_topk),
              ("mm_barrier_topk", mm_barrier_topk),
              ("mm_barrier_lse_topk", mm_barrier_lse_topk),
              ("mm_bf16_topk", mm_bf16_topk),
              ("topk_carried_f32", topk_carried)]
    for name, body in stages:
        if only != [""] and name not in only:
            continue
        ms = timed_min2(scan16(body), h0, iters=3) * 1e3
        report("beamgen_xla_anatomy", ms / 1e3, stage=name,
               per_step_ms=round(ms / 16, 3))


def beam_xla_slope():
    """Definitive per-step cost of the PRODUCTION XLA beam step (round
    5): beam_search in logits mode at max_len 2 vs 16 -- the slope is the
    honest per-step cost (the beamgen_xla_anatomy probes say an isolated
    carry-threaded lax.top_k [1600, 50k] costs ~87 ms/step, which the
    ~50 ms 16-step e2e decode flatly contradicts; one of the two is
    measuring something else).  Also: one bare jitted lax.top_k call on a
    resident [1600, 50k] argument."""
    import bench as bench_mod

    _cfg, model, params, batch = bench_mod._build_cars(True)
    from context_attentive_ir_tpu.decode import beam_search

    var = {"params": params}
    state0, memory0, mask0 = jax.jit(lambda p, b: model.apply(
        {"params": p}, b, method=model.decode_init))(params, batch)
    Bq = memory0.shape[0]
    rep = lambda x: jnp.repeat(x, 5, axis=0)
    mem_k, mask_k = rep(memory0), rep(mask0)

    def run(T):
        @jax.jit
        def fn(params, batch):
            var = {"params": params}
            state, memory, mask = model.apply(
                var, batch, method=model.decode_init)
            mem_k, mask_k = (jnp.repeat(memory, 5, axis=0),
                             jnp.repeat(mask, 5, axis=0))
            step = lambda st, toks: model.apply(
                var, st, toks, mem_k, mask_k, method=model.decode_step)
            return beam_search(step, state, Bq, T, 5)
        return fn

    t2 = timed_min2(run(2), params, batch, iters=3) * 1e3
    t16 = timed_min2(run(16), params, batch, iters=3) * 1e3
    report("beam_xla_slope", t16 / 1e3, t2_ms=round(t2, 2),
           t16_ms=round(t16, 2),
           per_step_ms=round((t16 - t2) / 14, 3))

    rng = np.random.RandomState(0)
    big = jnp.asarray(rng.normal(size=(Bq * 5, VOCAB)), jnp.float32)
    one = jax.jit(lambda l: jax.lax.top_k(l, 6))
    ms1 = timed_min2(one, big, iters=3) * 1e3
    report("beam_xla_slope", ms1 / 1e3, stage="bare_topk_call",
           rows=Bq * 5, v=VOCAB)


def dispatch_table_beamgen_pipe():
    """Serial vs software-pipelined beamgen kernel (PERF.md r4 #6 lever:
    overlap tile j's MXU matmul with tile j-1's VPU selection via a
    double-buffered VMEM score scratch).  Measures (a) the carry-threaded
    generator-only 16-step scan (honest per-call cost; nothing hoists),
    (b) END-TO-END CARS beam-5 decode with the kernel variant forced
    each way (the dispatch decision is confirmed end-to-end per the
    round-2 lesson), and (c) on-chip bit-exactness between variants.
    Writes ``beam_gen_pipe`` rows keyed (rows, kc) from the e2e numbers,
    consumed by ``ops.dispatch.prefer_pipelined_generator``.
    Usage: dispatch_table_beamgen_pipe [K...]."""
    import bench as bench_mod

    from context_attentive_ir_tpu.decode import (beam_search,
                                                 make_fused_beam_step)
    from context_attentive_ir_tpu.ops import dispatch
    from context_attentive_ir_tpu.ops.pallas.beamgen import (
        generator_topk_lse,
    )

    _cfg, model, params, batch = bench_mod._build_cars(True)
    state0, memory0, _ = jax.jit(lambda p, b: model.apply(
        {"params": p}, b, method=model.decode_init))(params, batch)
    Bq = memory0.shape[0]
    table_t = params["embeddings"]["embedding"].T.astype(jnp.bfloat16)

    timed2 = timed_min2

    widths = [int(a) for a in sys.argv[2:]] or [5]
    new = []
    for K in widths:
        kc = K + 1
        rows = Bq * K
        proj0 = jnp.full((rows, table_t.shape[0]), 0.01, jnp.bfloat16)

        # (a) honest generator-only scan, serial vs pipelined
        def gen_scan(pipe):
            @jax.jit
            def f(proj0, table_t):
                def body(c, _):
                    v, i, l = generator_topk_lse(proj0 * c, table_t, kc,
                                                 pipeline=pipe)
                    return ((v[0, 0] * 1e-6 + 1.0).astype(jnp.bfloat16),
                            i.sum())
                return jax.lax.scan(body, jnp.bfloat16(1.0),
                                    jnp.arange(16))[1]
            return f

        scan_ms = {}
        for pipe in (False, True):
            scan_ms[pipe] = timed2(gen_scan(pipe), proj0, table_t) * 1e3
            report("beamgen_pipe_scan", scan_ms[pipe] / 1e3, k=K,
                   pipeline=pipe,
                   us_per_call=round(scan_ms[pipe] / 16 * 1e3, 1))

        # (c) on-chip bit-exactness (random real projection)
        x = jax.random.normal(jax.random.key(0),
                              (rows, table_t.shape[0])).astype(jnp.bfloat16)
        a = jax.device_get(generator_topk_lse(x, table_t, kc,
                                              pipeline=False))
        b = jax.device_get(generator_topk_lse(x, table_t, kc,
                                              pipeline=True))
        vdiff = float(np.max(np.abs(np.asarray(a[0]) - np.asarray(b[0]))))
        imism = int((np.asarray(a[1]) != np.asarray(b[1])).sum())
        ldiff = float(np.max(np.abs(np.asarray(a[2]) - np.asarray(b[2]))))

        # (b) end-to-end CARS beam decode, kernel variant forced
        def run(pipe):
            @jax.jit
            def f(params, batch):
                var = {"params": params}
                state, memory, memory_mask = model.apply(
                    var, batch, method=model.decode_init)
                rep = lambda t: jnp.repeat(t, K, axis=0)
                step = make_fused_beam_step(model, var, params,
                                            rep(memory), rep(memory_mask),
                                            kc=kc, pipeline=pipe)
                return beam_search(step, state, Bq, 16, K)
            return f

        ms, outs = {}, {}
        for pipe in (False, True):
            fn = run(pipe)
            ms[pipe] = timed2(fn, params, batch) * 1e3
            outs[pipe] = jax.device_get(fn(params, batch))
            report("dispatch_beamgen_pipe", ms[pipe] / 1e3, k=K,
                   pipeline=pipe, qps=round(Bq / ms[pipe] * 1e3, 1))
        mism = int((np.asarray(outs[False][0])
                    != np.asarray(outs[True][0])).sum())
        print(json.dumps({"exp": "dispatch_beamgen_pipe", "k": K,
                          "kernel_val_max_diff": vdiff,
                          "kernel_idx_mismatch": imism,
                          "kernel_lse_max_diff": ldiff,
                          "e2e_seq_mismatch": mism}), flush=True)
        new.append(dict(kind="beam_gen_pipe", rows=rows, kc=kc,
                        pipe_ms=round(ms[True], 3),
                        serial_ms=round(ms[False], 3)))
    fresh = {(x["rows"], x["kc"]) for x in new}
    merged = [e for e in dispatch._load_table()
              if e.get("kind") != "beam_gen_pipe"
              or (e["rows"], e["kc"]) not in fresh] + new
    dispatch.write_table(merged)
    print(json.dumps({"exp": "dispatch_table_beamgen_pipe",
                      "written": str(dispatch.TABLE_PATH),
                      "n_entries": len(merged)}), flush=True)


def beam_bk_alone():
    """Beam bookkeeping ALONE: ``beam_search`` driven by a near-free
    synthetic fused-generator step over the REAL tiled decoder-state
    pytree, so the 16-step scan prices only the per-step beam logic
    (merge over [B, K*(K+1)], state reorder of the real carry leaves,
    finished/length masks, and -- legacy mode -- the carried sequence
    buffer).  Measured (PERF.md r4 #6): bookkeeping adds 1.25 ms
    (legacy) / 0.39 ms (fused) per 16 steps over the bare scan — the
    old "bookkeeping is 2/3 of the step" parts-residual was an artifact
    (see ``beam_parts_fused``/``beam_slope``).  The synthetic step keeps a
    data dependency through every carry leaf and through the emitted
    (t1, i1, lse) so nothing hoists out of the scan; its own cost is
    measured separately (``step_only``) and subtracted mentally, not
    arithmetically.  Usage: beam_bk_alone [K...]."""
    import bench as bench_mod

    from context_attentive_ir_tpu.constants import EOS
    from context_attentive_ir_tpu.decode import beam_search

    _cfg, model, params, batch = bench_mod._build_cars(True)
    state0, memory0, _ = jax.jit(lambda p, b: model.apply(
        {"params": p}, b, method=model.decode_init))(params, batch)
    Bq = memory0.shape[0]
    V = int(params["embeddings"]["embedding"].shape[0])

    def mk_step(kc):
        def step(st, tok):
            st = jax.tree_util.tree_map(lambda x: x * 0.999, st)
            leaf = jax.tree_util.tree_leaves(st)[0]
            r = tok.shape[0]
            base = (leaf[:, :kc].astype(jnp.float32)
                    + tok[:, None].astype(jnp.float32) * 1e-3)
            lane = jax.lax.broadcasted_iota(jnp.int32, (r, kc), 1)
            # occasional EOS so finished-beam logic is exercised
            i1 = jnp.where((tok[:, None] + lane) % 97 == 0, EOS,
                           (tok[:, None] * 31 + lane * 37 + 7) % V)
            return st, (base, i1, base[:, 0] * 0.1)
        return step

    timed2 = timed_min2

    widths = [int(a) for a in sys.argv[2:]] or [5]
    for K in widths:
        kc = K + 1
        step = mk_step(kc)

        @jax.jit
        def step_only(state):
            st = jax.tree_util.tree_map(
                lambda x: jnp.repeat(x, K, axis=0), state)
            toks = jnp.full((Bq * K,), 2, jnp.int32)

            def body(s, _):
                s, (t1, i1, lse) = step(s, toks)
                return s, t1.sum() + i1.sum() + lse.sum()
            _, outs = jax.lax.scan(body, st, jnp.arange(16))
            return outs

        ms0 = timed2(step_only, state0) * 1e3
        report("beam_bk_alone", ms0 / 1e3, k=K, stage="step_only")
        for bk in ("legacy", "fused"):
            @jax.jit
            def run(state, bk=bk):
                return beam_search(step, state, Bq, 16, K, bookkeeping=bk)
            ms = timed2(run, state0) * 1e3
            report("beam_bk_alone", ms / 1e3, k=K, stage=f"bk_{bk}",
                   bk_minus_step_ms=round(ms - ms0, 3))


def beam_slope():
    """SLOPE attribution of the fused beam-5 decode: time each program at
    max_len 8/16/32 and report the fitted per-step cost (slope) plus
    intercept.  Replaces the parts methodology of ``beam_parts_fused``,
    which double-counted two artifacts ``scan_floor`` exposed: (a) every
    single-program timing through the tunnel carries a ~3-4 ms
    per-EXECUTION constant (so each "part" read ~3 ms high), and (b) the
    isolated generator scan consumed loop-invariant inputs, so XLA
    hoisted the kernel out of the scan and 16 "steps" priced ONE call.
    Slopes cancel both: the constant lands in the intercept, and every
    scanned body here threads the carry through the expensive op so
    nothing hoists.  Programs: full fused beam_search, model-only scan
    (decode_step_fused), generator-only scan (carry-perturbed proj so
    the pallas call runs every step), bookkeeping-only beam (synthetic
    near-free step, fused bookkeeping).  Usage: beam_slope [K]."""
    import bench as bench_mod

    from context_attentive_ir_tpu.decode import (beam_search,
                                                 make_fused_beam_step)
    from context_attentive_ir_tpu.ops.pallas.beamgen import (
        generator_topk_lse,
    )

    _cfg, model, params, batch = bench_mod._build_cars(True)
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    kc = K + 1

    init_only = jax.jit(lambda p, b: model.apply(
        {"params": p}, b, method=model.decode_init))
    state0, memory0, mask0 = init_only(params, batch)
    Bq = memory0.shape[0]
    rep = lambda x: jnp.repeat(x, K, axis=0)
    mem_k, mask_k = rep(memory0), rep(mask0)
    table_t = params["embeddings"]["embedding"].T.astype(jnp.bfloat16)
    V = table_t.shape[1]

    timed2 = timed_min2

    lens = (8, 16, 32)

    def full(T):
        @jax.jit
        def f(params, batch):
            var = {"params": params}
            state, memory, memory_mask = model.apply(
                var, batch, method=model.decode_init)
            step = make_fused_beam_step(model, var, params, rep(memory),
                                        rep(memory_mask), kc=kc)
            return beam_search(step, state, Bq, T, K)
        return f, (params, batch)

    def model_only(T):
        @jax.jit
        def f(params, state):
            var = {"params": params}
            toks = jnp.full((Bq * K,), 2, jnp.int32)

            def body(st, _):
                st, proj, _ = model.apply(var, st, toks, mem_k, mask_k,
                                          method=model.decode_step_fused)
                return st, proj.sum()
            st = jax.tree_util.tree_map(rep, state)
            return jax.lax.scan(body, st, jnp.arange(T))[1]
        return f, (params, state0)

    def gen_only(T):
        proj0 = jnp.full((Bq * K, table_t.shape[0]), 0.01, jnp.bfloat16)

        @jax.jit
        def f(proj0, table_t):
            def body(c, _):
                v, i, l = generator_topk_lse(proj0 * c, table_t, kc)
                # thread the result back into the carry: no hoist
                return (v[0, 0] * 1e-6 + 1.0).astype(jnp.bfloat16), i.sum()
            return jax.lax.scan(body, jnp.bfloat16(1.0), jnp.arange(T))[1]
        return f, (proj0, table_t)

    def bk_only(T):
        def stepfn(st, tok):
            st = jax.tree_util.tree_map(lambda x: x * 0.999, st)
            leaf = jax.tree_util.tree_leaves(st)[0]
            base = (leaf[:, :kc].astype(jnp.float32)
                    + tok[:, None].astype(jnp.float32) * 1e-3)
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (tok.shape[0], kc), 1)
            i1 = (tok[:, None] * 31 + lane * 37 + 7) % V
            return st, (base, i1, base[:, 0] * 0.1)

        @jax.jit
        def f(state):
            return beam_search(stepfn, state, Bq, T, K,
                               bookkeeping="fused")
        return f, (state0,)

    out = {}
    for name, mk in (("full", full), ("model", model_only),
                     ("generator", gen_only), ("bookkeeping", bk_only)):
        ms = {}
        for T in lens:
            fn, args = mk(T)
            ms[T] = timed2(fn, *args) * 1e3
        slope = (ms[lens[-1]] - ms[lens[0]]) / (lens[-1] - lens[0])
        mid_pred = ms[lens[0]] + slope * (lens[1] - lens[0])
        out[name] = {"ms": {str(t): round(m, 3) for t, m in ms.items()},
                     "us_per_step": round(slope * 1e3, 1),
                     "intercept_ms": round(ms[lens[0]] - slope * lens[0], 3),
                     "mid_fit_err_ms": round(ms[lens[1]] - mid_pred, 3)}
        report("beam_slope", ms[lens[1]] / 1e3, program=name,
               us_per_step=out[name]["us_per_step"],
               intercept_ms=out[name]["intercept_ms"])
    print(json.dumps({"exp": "beam_slope", "k": K, "fit": out}),
          flush=True)


def scan_floor():
    """Price the bare 16-iteration ``lax.scan`` on this chip: trivial
    bodies over (a) a scalar carry, (b) a beam-decode-sized carry
    (5 x [1600, 128] f32), each at unroll 1/4/16.  Motivated by
    ``beam_bk_alone``: a trivial-body scan over the real beam carry
    costs ~3.3 ms (~206 us/step), i.e. the fused beam-5 step is
    dominated by per-iteration cost, not by its ops -- this experiment
    separates loop-trip overhead (amortized by unroll) from
    carry-size-proportional cost (buffer copies; unroll-insensitive)."""
    timed2 = timed_min2

    big = [jnp.ones((1600, 128), jnp.float32) * (1 + i * 0.1)
           for i in range(5)]

    for name, carry0 in (("scalar", jnp.float32(1.0)), ("beam_sized", big)):
        for unroll in (1, 4, 16):
            @jax.jit
            def run(c0, unroll=unroll):
                def body(c, _):
                    c = jax.tree_util.tree_map(lambda x: x * 0.999, c)
                    return c, jax.tree_util.tree_leaves(c)[0].sum()
                _, outs = jax.lax.scan(body, c0, jnp.arange(16),
                                       unroll=unroll)
                return outs
            ms = timed2(run, carry0) * 1e3
            report("scan_floor", ms / 1e3, carry=name, unroll=unroll,
                   us_per_step=round(ms / 16 * 1e3, 1))


def greedy_fused_e2e():
    """END-TO-END A/B for the fused generator step under GREEDY decode
    (kc=2; decode/greedy.py fused mode): full CARS greedy suggestion at
    the bench shape, logits step vs fused Pallas step, plus on-chip
    decoded-output parity.  The matching dispatch row comes from
    ``dispatch_table_beamgen 2`` (rows=320 = the greedy row count)."""
    import bench as bench_mod

    from context_attentive_ir_tpu.decode import (greedy_decode,
                                                 make_fused_beam_step)

    _cfg, model, params, batch = bench_mod._build_cars(True)

    def run(fused):
        def impl(params, batch):
            var = {"params": params}
            state, memory, memory_mask = model.apply(
                var, batch, method=model.decode_init)
            rows = memory.shape[0]
            if fused:
                step = make_fused_beam_step(model, var, params, memory,
                                            memory_mask, kc=2)
            else:
                step = lambda st, toks: model.apply(
                    var, st, toks, memory, memory_mask,
                    method=model.decode_step)
            return greedy_decode(step, state, rows, 16)
        return jax.jit(impl)

    timed2 = timed_min2

    for fused in (False, True):
        ms = timed2(run(fused), params, batch)
        report("greedy_fused_e2e", ms, fused=fused,
               qps=round(bench_mod.B * bench_mod.S / ms, 1))
    s1, sc1 = jax.device_get(run(False)(params, batch))
    s2, sc2 = jax.device_get(run(True)(params, batch))
    mismatch = int((np.asarray(s1) != np.asarray(s2)).sum())
    print(json.dumps({"exp": "greedy_fused_e2e", "seq_mismatch": mismatch,
                      "score_max_diff": float(np.max(np.abs(
                          np.asarray(sc1) - np.asarray(sc2))))}),
          flush=True)


if __name__ == "__main__":
    # watchdog was armed before `import jax` (top of file); disarm once
    # backend init + one tiny fenced op complete
    jax.devices()
    float(jax.device_get(jnp.ones((8,), jnp.float32).sum()))
    _BACKEND_DONE.set()
    exp = sys.argv[1] if len(sys.argv) > 1 else "pool"
    {"lstm_sweep": lstm_sweep, "lstm_bwd_sweep": lstm_bwd_sweep,
     "gather": gather, "gather_kernel": gather_kernel,
     "pool": pool, "suggest": suggest, "gru": gru,
     "scan_vs_fused": scan_vs_fused, "gru_small": gru_small,
     "score_e2e": score_e2e, "train_e2e": train_e2e,
     "score_parts": score_parts,
     "beam_parts": beam_parts, "beam_topk": beam_topk,
     "dispatch_table_beam": dispatch_table_beam,
     "indexed": indexed,
     "decode_step_only": decode_step_only, "gru_train": gru_train,
     "train_parts": train_parts,
     "engine_host": engine_host, "scan_unroll": scan_unroll,
     "large_r": large_r, "large_r2": large_r2, "hoist_check": hoist_check,
     "scale_bucketing": scale_bucketing,
     "dispatch_table_beamgen": dispatch_table_beamgen,
     "dispatch_table_beambk": dispatch_table_beambk,
     "beam_bk_alone": beam_bk_alone, "scan_floor": scan_floor,
     "beam_slope": beam_slope,
     "dispatch_table_beamgen_pipe": dispatch_table_beamgen_pipe,
     "beamgen_xla_anatomy": beamgen_xla_anatomy,
     "beam_xla_slope": beam_xla_slope,
     "int8_probe": int8_probe,
     "beam_fused_e2e": beam_fused_e2e,
     "beam_shortlist_e2e": beam_shortlist_e2e,
     "beam_int8_e2e": beam_int8_e2e,
     "beamgen_prune_probe": beamgen_prune_probe,
     "dispatch_table_beamgen_prune": dispatch_table_beamgen_prune,
     "greedy_fused_e2e": greedy_fused_e2e,
     "early_exit_probe": early_exit_probe,
     "beam_parts_fused": beam_parts_fused,
     "dispatch_table": dispatch_table}[exp]()
