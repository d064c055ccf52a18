"""Benchmark: reranked docs/sec/chip at slate=50 (BASELINE.json:2).

Measures the flagship CARS scorer (session-aware ranking over 50-candidate
slates, AOL-scale dims per SURVEY.md: queries <=15 tokens, doc titles <=30,
sessions of 5 turns) on the attached TPU chip, in bfloat16, plus the
suggestion path (beam-5 next-query decode, SURVEY.md SS2.7/SS3.4) --
VERDICT r1 missing item #3.

Before timing, an on-chip kernel REGRESSION HARNESS (VERDICT r1 weak #5)
asserts, at bf16 tolerance: fused Pallas LSTM forward + backward vs the
lax.scan path, the fused GRU pair vs scan autodiff, the fused slate-pool
kernel vs its XLA reference, and a full CARS loss/grad match between the
kernel and scan configurations.  A
parity failure raises (the driver records a non-zero exit) rather than
publishing numbers from a silently-wrong kernel.  Set BENCH_PARITY=0 to
skip (debug only).

``vs_baseline``: the reference implementation is PyTorch (SURVEY.md SS1) and
publishes no throughput numbers (BASELINE.md); no GPU exists on this
machine, so the stand-in baseline is an equivalent PyTorch CARS scorer run
on this host's single-core CPU, RE-MEASURED on every run (VERDICT r3 weak
#1: both sides of the ratio must come from the same toolchain state;
the latest measurement is recorded in BENCH_BASELINE.json for the
record, never read back).  A V100-class GPU would plausibly sit
~100-300x above that CPU number, which would put the honest margin
nearer 2-5x -- see BENCH_DETAILS.json and PERF.md.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

# reuse compiled programs across bench invocations (remote Mosaic compiles
# take minutes cold; see PERF.md) -- must be set before jax initializes
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(ROOT))

# bench dims (AOL-scale).  emsize=256 (not GloVe's 300): lane-aligned
# embeddings are +16% end-to-end and enable the fused LSTM kernel; GloVe
# can be projected to 256-d at init (PERF.md).
VOCAB = 50_000
B, S, N, LQ, LD = 64, 5, 50, 15, 30
EMSIZE, NHID = 256, 128
WARMUP, ITERS = 3, 20
BEAM = 5


def _random_session_batch(rng, b=B, s=S, n=N, lq=LQ, ld=LD, vocab=VOCAB):
    from context_attentive_ir_tpu.data.vectorize import SessionBatch

    def ids(shape):
        return rng.randint(4, vocab, size=shape).astype(np.int32)

    q = ids((b, s, lq))
    d = ids((b, s, n, ld))
    qm = np.ones((b, s, lq), bool)
    dm = np.ones((b, s, n, ld), bool)
    clicks = np.zeros((b, s, n), np.float32)
    clicks[:, :, 0] = 1.0
    tin = ids((b, s, lq + 1))
    return SessionBatch(
        query=q, query_mask=qm, docs=d, doc_mask=dm, clicks=clicks,
        cand_mask=np.ones((b, s, n), bool),
        turn_mask=np.ones((b, s), bool),
        target_in=tin, target_out=tin,
        target_mask=np.ones((b, s, lq + 1), bool),
        row_mask=np.ones((b,), bool),
    )


def _build_cars(use_pallas: bool, b=B, s=S, n=N, vocab=VOCAB,
                rnn_type="lstm", init=True):
    import jax

    from context_attentive_ir_tpu.config import default_config
    from context_attentive_ir_tpu.models import build_model

    cfg = default_config("cars").replace(
        vocab_size=vocab, emsize=EMSIZE, nhid=NHID,
        rnn_type=rnn_type,
        max_query_len=LQ, max_doc_len=LD, max_session_len=s,
        num_candidates=n, compute_dtype="bfloat16",
        # slate kernel stays at its default (off): measured slower than
        # XLA on v5e (PERF.md round-2 ledger)
        use_pallas_rnn=use_pallas,
        dropout=0.0, dropout_emb=0.0, dropout_rnn=0.0)
    model = build_model(cfg)
    if not init:   # config/model only -- skip the on-chip init compile
        return cfg, model, None, None
    batch = jax.device_put(_random_session_batch(np.random.RandomState(0),
                                                 b=b, s=s, n=n, vocab=vocab))
    params = model.init({"params": jax.random.key(0)}, batch, True)["params"]
    return cfg, model, params, batch


# -- on-chip kernel regression harness (VERDICT r1 weak #5) -----------------


def _max_rel_err(a, b) -> float:
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    scale = max(float(np.max(np.abs(b))), 1e-6)
    return float(np.max(np.abs(a - b))) / scale


def kernel_parity_checks() -> dict:
    """Assert fused-kernel vs scan/XLA parity ON THE ATTACHED CHIP at bf16
    tolerance.  Raises RuntimeError on regression."""
    import jax
    import jax.numpy as jnp

    from context_attentive_ir_tpu.ops.pallas.lstm import (
        lstm_pallas_fused,
        lstm_pallas_reference,
    )
    from context_attentive_ir_tpu.ops.pallas.slate import (
        attn_pool_pallas,
        attn_pool_reference,
    )
    from context_attentive_ir_tpu.train.steps import make_loss_fn

    results = {}
    rng = np.random.RandomState(3)
    bt, t, e, h = 256, LD, EMSIZE, NHID
    x = jnp.asarray((rng.normal(size=(bt, t, e)) * 0.3), jnp.bfloat16)
    w_ih = jnp.asarray(rng.normal(size=(e, 4 * h)) * 0.1, jnp.bfloat16)
    bias = jnp.asarray(rng.normal(size=(4 * h,)) * 0.1, jnp.bfloat16)
    w_hh = jnp.asarray(rng.normal(size=(h, 4 * h)) * 0.1, jnp.bfloat16)
    lens = rng.randint(1, t + 1, size=(bt,))
    lens[0] = t
    mask = jnp.asarray(np.arange(t)[None, :] < lens[:, None])

    # 1. fused LSTM forward vs scan
    out_k = jax.device_get(jax.jit(lstm_pallas_fused)(x, mask, w_ih, bias,
                                                      w_hh))
    out_s = jax.device_get(jax.jit(lstm_pallas_reference)(
        x @ w_ih + bias, mask, w_hh))
    results["lstm_fwd_rel_err"] = _max_rel_err(out_k, out_s)

    # 2. fused LSTM backward (chunked-remat kernel) vs scan autodiff
    def loss_k(x, w_ih, bias, w_hh):
        return jnp.sum(lstm_pallas_fused(x, mask, w_ih, bias, w_hh)
                       .astype(jnp.float32) ** 2)

    def loss_s(x, w_ih, bias, w_hh):
        return jnp.sum(lstm_pallas_reference(x @ w_ih + bias, mask, w_hh)
                       .astype(jnp.float32) ** 2)

    # all four gradients (x, w_ih, b, w_hh): dW_ih flows through the
    # in-kernel input projection and must be covered on-chip (ADVICE r2)
    gk = jax.device_get(jax.jit(jax.grad(loss_k, argnums=(0, 1, 2, 3)))(
        x, w_ih, bias, w_hh))
    gs = jax.device_get(jax.jit(jax.grad(loss_s, argnums=(0, 1, 2, 3)))(
        x, w_ih, bias, w_hh))
    results["lstm_bwd_rel_err"] = max(_max_rel_err(a, b)
                                      for a, b in zip(gk, gs))

    # 3. fused GRU forward + backward pair vs scan autodiff (the pair
    #    carries GRU training since round 2)
    from context_attentive_ir_tpu.ops.pallas.gru import (
        gru_pallas_fused,
        gru_pallas_reference,
    )

    w_ih3 = jnp.asarray(rng.normal(size=(e, 3 * h)) * 0.1, jnp.bfloat16)
    b_ih3 = jnp.asarray(rng.normal(size=(3 * h,)) * 0.1, jnp.bfloat16)
    w_hh3 = jnp.asarray(rng.normal(size=(h, 3 * h)) * 0.1, jnp.bfloat16)
    b_hh3 = jnp.asarray(rng.normal(size=(3 * h,)) * 0.1, jnp.bfloat16)

    def gloss_k(x, w_ih3, b_ih3, w_hh3, b_hh3):
        return jnp.sum(gru_pallas_fused(x, mask, w_ih3, b_ih3, w_hh3,
                                        b_hh3).astype(jnp.float32) ** 2)

    def gloss_s(x, w_ih3, b_ih3, w_hh3, b_hh3):
        return jnp.sum(gru_pallas_reference(x, mask, w_ih3, b_ih3, w_hh3,
                                            b_hh3).astype(jnp.float32)
                       ** 2)

    # all five GRU gradients: db_hh is exactly where the n-gate ih/hh
    # gradient asymmetry lives (ADVICE r2 -- previously only CPU interpret
    # tests covered dW_ih / db_hh)
    gk = jax.device_get(jax.jit(jax.grad(gloss_k, argnums=(0, 1, 2, 3, 4)))(
        x, w_ih3, b_ih3, w_hh3, b_hh3))
    gs = jax.device_get(jax.jit(jax.grad(gloss_s, argnums=(0, 1, 2, 3, 4)))(
        x, w_ih3, b_ih3, w_hh3, b_hh3))
    results["gru_bwd_rel_err"] = max(_max_rel_err(a, b)
                                     for a, b in zip(gk, gs))

    # 4. fused slate-pool kernel vs XLA reference
    h2 = 2 * NHID
    states = jnp.asarray(rng.normal(size=(512, t, h2)) * 0.5, jnp.bfloat16)
    pmask = jnp.asarray(np.arange(t)[None, :]
                        < rng.randint(1, t + 1, size=(512, 1)))
    states = states * pmask[..., None]
    query = jnp.asarray(rng.normal(size=(512, h2)) * 0.5, jnp.bfloat16)
    w_p = jnp.asarray(rng.normal(size=(h2, h2)) * 0.1, jnp.bfloat16)
    b_p = jnp.asarray(rng.normal(size=(h2,)) * 0.1, jnp.bfloat16)
    pk = jax.device_get(jax.jit(attn_pool_pallas)(states, pmask, query,
                                                  w_p, b_p))
    pr = jax.device_get(jax.jit(attn_pool_reference)(states, pmask, query,
                                                     w_p, b_p))
    results["pool_rel_err"] = _max_rel_err(pk, pr)

    # 4b. fused beam-generator kernel vs XLA (matmul + top-k + lse).
    #    Measured BIT-EXACT on-chip vs the f32-accumulation reference
    #    (round 4); note the production logits path rounds logits to
    #    bf16 before top-k, so fused beam decode may legitimately
    #    resolve bf16 near-ties differently -- the kernel itself must
    #    match the exact-f32 reference.
    from context_attentive_ir_tpu.ops.pallas.beamgen import (
        generator_topk_lse,
        generator_topk_lse_reference,
    )

    xg = jnp.asarray(rng.normal(size=(1600, EMSIZE)) * 0.3, jnp.bfloat16)
    tg = jnp.asarray(rng.normal(size=(EMSIZE, VOCAB)) * 0.3, jnp.bfloat16)
    vk, ik, lk = jax.device_get(generator_topk_lse(xg, tg, BEAM + 1))
    vr, ir, lr = jax.device_get(generator_topk_lse_reference(xg, tg,
                                                             BEAM + 1))
    results["beamgen_val_rel_err"] = _max_rel_err(vk, vr)
    results["beamgen_lse_rel_err"] = _max_rel_err(lk, lr)
    results["beamgen_idx_agreement"] = float(
        (np.asarray(ik) == np.asarray(ir)).mean())

    # 4b. int8-table beamgen mode (round 5): kernel vs the quantized XLA
    #     reference on a real per-row-quantized table
    from context_attentive_ir_tpu.ops.layers import quantize_embedding_table

    tq, tscale = quantize_embedding_table(
        np.asarray(jax.device_get(tg)).T.astype(np.float32))
    tq_t, tsc = jnp.asarray(tq.T), jnp.asarray(tscale.reshape(-1))
    vk, ik, lk = jax.device_get(generator_topk_lse(xg, tq_t, BEAM + 1,
                                                   scale=tsc))
    vr, ir, lr = jax.device_get(generator_topk_lse_reference(
        xg, tq_t, BEAM + 1, scale=tsc))
    results["beamgen_i8_val_rel_err"] = _max_rel_err(vk, vr)
    results["beamgen_i8_lse_rel_err"] = _max_rel_err(lk, lr)
    results["beamgen_i8_idx_agreement"] = float(
        (np.asarray(ik) == np.asarray(ir)).mean())

    # 4c. threshold-pruned beamgen (round 5; production beam decode's
    #     dispatch default at the bench shape): random logits never fire
    #     the skip predicate, so use column-concentrated logits (Zipf-
    #     decayed table norms, the frequency-sorted-vocab regime) to
    #     force real tile skips on-chip, and assert exactness incl. tie
    #     semantics against the f32 reference.
    decay = jnp.asarray((np.arange(VOCAB) + 1.0) ** -0.35, jnp.float32)
    tgc = (tg.astype(jnp.float32) * decay[None, :]).astype(jnp.bfloat16)
    vk, ik, lk = jax.device_get(generator_topk_lse(xg, tgc, BEAM + 1,
                                                   prune=True))
    vr, ir, lr = jax.device_get(generator_topk_lse_reference(xg, tgc,
                                                             BEAM + 1))
    results["beamgen_prune_val_rel_err"] = _max_rel_err(vk, vr)
    results["beamgen_prune_lse_rel_err"] = _max_rel_err(lk, lr)
    results["beamgen_prune_idx_agreement"] = float(
        (np.asarray(ik) == np.asarray(ir)).mean())

    # 5. end-to-end: CARS loss + grad-norm, kernel config vs scan config
    #    (same params -- the pallas flags do not change the param tree)
    cfg_k, model_k, params, batch = _build_cars(True, b=16, s=3, n=10,
                                                vocab=4096)
    cfg_s, model_s, _, _ = _build_cars(False, b=16, s=3, n=10, vocab=4096,
                                       init=False)  # reuses params/batch
    rng_key = jax.random.key(1)

    def loss_and_gnorm(model, cfg):
        loss_fn = make_loss_fn(model, cfg)

        def scalar(p):
            out = loss_fn(p, batch, rng_key, deterministic=True)
            return out[0] if isinstance(out, tuple) else out

        l, g = jax.jit(jax.value_and_grad(scalar))(params)
        gn = jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                          for x in jax.tree_util.tree_leaves(g)))
        return float(jax.device_get(l)), float(jax.device_get(gn))

    lk, gnk = loss_and_gnorm(model_k, cfg_k)
    ls, gns = loss_and_gnorm(model_s, cfg_s)
    results["train_loss_kernel"] = lk
    results["train_loss_scan"] = ls
    results["train_loss_rel_err"] = abs(lk - ls) / max(abs(ls), 1e-6)
    results["train_gnorm_rel_err"] = abs(gnk - gns) / max(abs(gns), 1e-6)

    tol = {"lstm_fwd_rel_err": 0.05, "lstm_bwd_rel_err": 0.08,
           "gru_bwd_rel_err": 0.08,
           "pool_rel_err": 0.05, "train_loss_rel_err": 0.02,
           "train_gnorm_rel_err": 0.08,
           "beamgen_val_rel_err": 1e-3, "beamgen_lse_rel_err": 1e-3,
           "beamgen_i8_val_rel_err": 1e-3, "beamgen_i8_lse_rel_err": 1e-3,
           "beamgen_prune_val_rel_err": 1e-3,
           "beamgen_prune_lse_rel_err": 1e-3}
    bad = {k: v for k, v in tol.items() if results[k] > v}
    if results["beamgen_idx_agreement"] < 0.999:
        bad["beamgen_idx_agreement"] = results["beamgen_idx_agreement"]
    if results["beamgen_i8_idx_agreement"] < 0.999:
        bad["beamgen_i8_idx_agreement"] = results["beamgen_i8_idx_agreement"]
    if results["beamgen_prune_idx_agreement"] < 0.999:
        bad["beamgen_prune_idx_agreement"] = (
            results["beamgen_prune_idx_agreement"])
    if bad:
        raise RuntimeError(
            f"KERNEL PARITY REGRESSION: {bad} (full: {results})")
    return results


# -- throughput --------------------------------------------------------------


def _timed_loop(fn, *args, warmup=WARMUP, iters=ITERS) -> float:
    """Seconds per iteration.  NOTE: under the axon tunnel
    ``block_until_ready`` returns early, so every sync point is a
    device->host transfer (jax.device_get), which provably waits for the
    dependent computation.  Device execution is in-order, so syncing on the
    last output covers the whole loop."""
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def bench_rank(model, params, batch) -> float:
    import jax

    @jax.jit
    def score(params, batch):
        return model.apply({"params": params}, batch, method=model.score)

    dt = _timed_loop(score, params, batch)
    return (B * S * N) / dt


def bench_suggest(model, params, batch, fused: bool | None = None) -> float:
    """Beam-5 next-query suggestion throughput (queries/sec/chip): every
    session turn decodes a suggestion, mirroring Engine.suggest's compiled
    path (serve.py).  ``fused=None`` resolves the generator formulation
    (plain logits step vs the Pallas fused generator+top-k kernel) via
    the measured dispatch table, like the RNN kernels."""
    import jax
    import jax.numpy as jnp

    from context_attentive_ir_tpu.decode import (
        beam_search,
        make_fused_beam_step,
    )
    from context_attentive_ir_tpu.ops.dispatch import prefer_fused_generator

    max_len = LQ + 1
    if fused is None:
        fused = prefer_fused_generator(B * S * BEAM, VOCAB, EMSIZE,
                                       BEAM + 1, t=max_len)

    @jax.jit
    def suggest(params, batch):
        var = {"params": params}
        state, memory, memory_mask = model.apply(
            var, batch, method=model.decode_init)
        rows = memory.shape[0]
        rep = lambda x: jnp.repeat(x, BEAM, axis=0)
        mem_k, mask_k = rep(memory), rep(memory_mask)
        step = None
        if fused:
            step = make_fused_beam_step(model, var, params, mem_k, mask_k,
                                        kc=BEAM + 1)
        if step is None:
            step = lambda st, toks: model.apply(
                var, st, toks, mem_k, mask_k, method=model.decode_step)
        return beam_search(step, state, rows, max_len, BEAM)

    dt = _timed_loop(suggest, params, batch, warmup=2, iters=10)
    return (B * S) / dt


def bench_train(model, cfg, batch) -> float:
    """Full training-step throughput (loss + grads + Adam update),
    docs/sec/chip -- the fused chunked-remat kernel pair's headline
    (SURVEY.md SS2.12; PERF.md r3 ledger)."""
    import jax

    from context_attentive_ir_tpu.train.state import create_train_state
    from context_attentive_ir_tpu.train.steps import make_train_step

    state = create_train_state(model, cfg, batch, jax.random.key(0))
    step = make_train_step(model, cfg)
    rng = jax.random.key(1)
    s = state  # donated each step; always chain
    for _ in range(2):
        s, m = step(s, batch, rng)
    jax.device_get(m["loss"])
    t0 = time.perf_counter()
    iters = 10
    for _ in range(iters):
        s, m = step(s, batch, rng)
    jax.device_get(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    return (B * S * N) / dt


def bench_torch_cpu() -> float:
    """Equivalent PyTorch CARS-style scorer on host CPU (reference stand-in:
    the reference framework is PyTorch, SURVEY.md SS1)."""
    import torch
    import torch.nn as tnn

    # pin to ONE thread: the published baseline is defined single-core
    # (PERF.md); regenerating on a multi-core host must not inflate it
    torch.set_num_threads(1)

    class TorchCars(tnn.Module):
        def __init__(self):
            super().__init__()
            h2 = NHID * 2
            self.emb = tnn.Embedding(VOCAB, EMSIZE, padding_idx=0)
            self.q_enc = tnn.LSTM(EMSIZE, NHID, batch_first=True,
                                  bidirectional=True)
            self.d_enc = tnn.LSTM(EMSIZE, NHID, batch_first=True,
                                  bidirectional=True)
            self.q_pool = tnn.Linear(h2, h2)
            self.q_v = tnn.Linear(h2, 1, bias=False)
            self.sess = tnn.LSTM(h2, h2, batch_first=True)
            self.click = tnn.LSTM(h2, h2, batch_first=True)
            self.ctx_q = tnn.Linear(h2, h2)
            self.ctx_m = tnn.Linear(h2, h2, bias=False)
            self.ctx_v = tnn.Linear(h2, 1, bias=False)
            self.gate = tnn.Linear(2 * h2, h2)
            self.mlp = tnn.Sequential(tnn.Linear(3 * h2, 256), tnn.Tanh(),
                                      tnn.Linear(256, 1))

        def forward(self, q, d, clicks):
            Bq, Sq, Lq = q.shape
            _, _, Nn, Ld = d.shape
            qe = self.emb(q.view(Bq * Sq, Lq))
            qs, _ = self.q_enc(qe)
            att = torch.softmax(self.q_v(torch.tanh(self.q_pool(qs))), 1)
            qv = (att * qs).sum(1).view(Bq, Sq, -1)
            de = self.emb(d.view(Bq * Sq * Nn, Ld))
            ds, _ = self.d_enc(de)
            att_d = torch.softmax(
                torch.einsum("xth,xh->xt", ds,
                             qv.view(Bq * Sq, -1).repeat_interleave(Nn, 0)
                             ), 1)
            dv = torch.einsum("xt,xth->xh", att_d, ds).view(Bq, Sq, Nn, -1)
            sq, _ = self.sess(qv)
            cr = torch.einsum("bsn,bsnh->bsh", clicks, dv)
            sc, _ = self.click(cr)
            mem = torch.cat([sq, sc], 1)
            scores = self.ctx_v(torch.tanh(
                self.ctx_q(qv)[:, :, None] + self.ctx_m(mem)[:, None]))
            mask = torch.ones(Sq, 2 * Sq)
            for t in range(Sq):
                mask[t, :] = 0
                mask[t, :t] = 1
                mask[t, Sq:Sq + t] = 1
            scores = scores.squeeze(-1).masked_fill(mask[None] == 0, -1e9)
            align = torch.softmax(scores, -1)
            ctx = torch.einsum("btm,bmh->bth", align, mem)
            g = torch.sigmoid(self.gate(torch.cat([qv, ctx], -1)))
            qc = g * qv + (1 - g) * ctx
            qb = qc[:, :, None].expand_as(dv)
            feats = torch.cat([qb, dv, qb * dv], -1)
            return self.mlp(feats).squeeze(-1)

    model = TorchCars().eval()
    rng = np.random.RandomState(0)
    # smaller batch than the TPU run: CPU throughput is batch-insensitive
    # at these sizes and the full B would take many minutes on one core
    TB = 8
    q = torch.from_numpy(rng.randint(4, VOCAB, size=(TB, S, LQ))).long()
    d = torch.from_numpy(rng.randint(4, VOCAB, size=(TB, S, N, LD))).long()
    clicks = torch.zeros(TB, S, N)
    clicks[:, :, 0] = 1
    iters = 6
    with torch.no_grad():
        model(q, d, clicks)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            model(q, d, clicks)
        dt = time.perf_counter() - t0
    return (TB * S * N * iters) / dt


def _backend_up_or_die(timeout_s: float) -> None:
    """Fail FAST if the axon tunnel is wedged instead of hanging forever.

    Observed round 3: the PJRT plugin can block indefinitely at backend
    init (futex + ep_poll on the tunnel socket) rather than raising
    UNAVAILABLE.  A daemon watchdog covers ONLY backend init + one tiny
    fenced op -- never compiles, which legitimately take minutes -- so a
    wedged tunnel yields a clean non-zero exit with a diagnostic line the
    driver can record, instead of a silent hang.
    """
    import threading

    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            print(json.dumps({
                "error": "TPU backend init exceeded "
                         f"{timeout_s:.0f}s (axon tunnel wedged?)",
                "metric": None,
            }), file=sys.stderr, flush=True)
            os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()
    import jax
    import jax.numpy as jnp
    jax.devices()
    float(jax.device_get(jnp.ones((8,), jnp.float32).sum()))
    done.set()


def main():
    _backend_up_or_die(float(os.environ.get("BENCH_BACKEND_TIMEOUT", 420)))
    # the torch stand-in is RE-MEASURED every run (seconds of CPU): the
    # headline ratio must divide two numbers from the same toolchain
    # state, never a fresh TPU pass by a stale cached CPU pass (VERDICT
    # r3 weak #1).  BENCH_BASELINE.json records the latest measurement
    # for the ledger but is never read back.
    torch_dps = bench_torch_cpu()
    baseline = {"torch_cpu_docs_per_sec": torch_dps,
                "note": "PyTorch CARS-equivalent scorer on host CPU "
                        "(reference stand-in; reference publishes no "
                        "throughput numbers and no GPU is attached); "
                        "re-measured on every bench run"}
    (ROOT / "BENCH_BASELINE.json").write_text(json.dumps(baseline,
                                                         indent=2))

    parity = None
    if os.environ.get("BENCH_PARITY", "1") != "0":
        parity = kernel_parity_checks()

    cfg, model, params, batch = _build_cars(True)
    tpu_dps = bench_rank(model, params, batch)
    suggest_qps = bench_suggest(model, params, batch)
    train_dps = bench_train(model, cfg, batch)
    vs = tpu_dps / baseline["torch_cpu_docs_per_sec"]
    details = {
        "tpu_docs_per_sec_per_chip": tpu_dps,
        "suggest_queries_per_sec_per_chip_beam5": suggest_qps,
        "train_docs_per_sec_per_chip": train_dps,
        "torch_cpu_docs_per_sec": baseline["torch_cpu_docs_per_sec"],
        "kernel_parity": parity,
        "shapes": {"batch_sessions": B, "session_len": S, "slate": N,
                   "query_len": LQ, "doc_len": LD, "emsize": EMSIZE,
                   "nhid": NHID, "vocab": VOCAB, "beam": BEAM},
        "dtype": "bfloat16",
        "pallas_fused_lstm": "auto (on-chip-measured dispatch table, "
                             "ops/dispatch_table.json)",
        "pallas_fused_beam_generator": "auto (dispatch table beam_gen "
                                       "rows; round-4 kernel)",
        "pallas_fused_slate_pool": False,
        "model": "cars.score (session-aware slate reranking) + "
                 "cars.decode (beam-5 suggestion)",
    }
    (ROOT / "BENCH_DETAILS.json").write_text(json.dumps(details, indent=2))
    print(json.dumps({
        "metric": "reranked docs/sec/chip @ slate=50 (CARS, bf16)",
        "value": round(tpu_dps, 1),
        "unit": "docs/sec/chip",
        "vs_baseline": round(vs, 2),
        "suggest_qps_beam5": round(suggest_qps, 1),
        "train_docs_per_sec": round(train_dps, 1),
        "kernel_parity": "ok" if parity else "skipped",
    }))


if __name__ == "__main__":
    main()
