"""Benchmark: reranked docs/sec/chip at slate=50 (BASELINE.json:2).

Measures the flagship CARS scorer (session-aware ranking over 50-candidate
slates, AOL-scale dims per SURVEY.md: queries <=15 tokens, doc titles <=30,
sessions of 5 turns) on the attached TPU chip, in bfloat16.

``vs_baseline``: the reference implementation is PyTorch (SURVEY.md SS1) and
publishes no throughput numbers (BASELINE.md); no GPU exists on this
machine, so the stand-in baseline is an equivalent PyTorch CARS scorer run
on this host's CPU (measured once, cached in BENCH_BASELINE.json).  The
ratio is therefore TPU-chip vs host-CPU -- see BENCH_DETAILS.json for raw
numbers on both sides.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
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


def _random_session_batch(rng):
    from context_attentive_ir_tpu.data.vectorize import SessionBatch

    def ids(shape, maxlen_axis):
        return rng.randint(4, VOCAB, size=shape).astype(np.int32)

    q = ids((B, S, LQ), -1)
    d = ids((B, S, N, LD), -1)
    qm = np.ones((B, S, LQ), bool)
    dm = np.ones((B, S, N, LD), bool)
    clicks = np.zeros((B, S, N), np.float32)
    clicks[:, :, 0] = 1.0
    tin = ids((B, S, LQ + 1), -1)
    return SessionBatch(
        query=q, query_mask=qm, docs=d, doc_mask=dm, clicks=clicks,
        cand_mask=np.ones((B, S, N), bool),
        turn_mask=np.ones((B, S), bool),
        target_in=tin, target_out=tin,
        target_mask=np.ones((B, S, LQ + 1), bool),
        row_mask=np.ones((B,), bool),
    )


def bench_tpu() -> float:
    import jax

    from context_attentive_ir_tpu.config import default_config
    from context_attentive_ir_tpu.models import build_model

    cfg = default_config("cars").replace(
        vocab_size=VOCAB, emsize=EMSIZE, nhid=NHID,
        max_query_len=LQ, max_doc_len=LD, max_session_len=S,
        num_candidates=N, compute_dtype="bfloat16",
        use_pallas_rnn=True,
        dropout=0.0, dropout_emb=0.0, dropout_rnn=0.0)
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    batch = _random_session_batch(rng)
    batch = jax.device_put(batch)
    params = model.init({"params": jax.random.key(0)}, batch, True)["params"]

    @jax.jit
    def score(params, batch):
        return model.apply({"params": params}, batch, method=model.score)

    # NOTE: under the axon tunnel ``block_until_ready`` returns early, so
    # every sync point is a device->host transfer (jax.device_get), which
    # provably waits for the dependent computation.  Device execution is
    # in-order, so syncing on the last output covers the whole loop.
    for _ in range(WARMUP):
        jax.device_get(score(params, batch))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = score(params, batch)
    jax.device_get(out)
    dt = time.perf_counter() - t0
    docs = B * S * N * ITERS
    return docs / dt


def bench_torch_cpu() -> float:
    """Equivalent PyTorch CARS-style scorer on host CPU (reference stand-in:
    the reference framework is PyTorch, SURVEY.md SS1)."""
    import torch
    import torch.nn as tnn

    torch.set_num_threads(max(1, (torch.get_num_threads())))

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
    iters = 2
    with torch.no_grad():
        model(q, d, clicks)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            model(q, d, clicks)
        dt = time.perf_counter() - t0
    return (TB * S * N * iters) / dt


def main():
    baseline_file = ROOT / "BENCH_BASELINE.json"
    if baseline_file.exists():
        baseline = json.loads(baseline_file.read_text())
    else:
        torch_dps = bench_torch_cpu()
        baseline = {"torch_cpu_docs_per_sec": torch_dps,
                    "note": "PyTorch CARS-equivalent scorer on host CPU "
                            "(reference stand-in; reference publishes no "
                            "throughput numbers and no GPU is attached)"}
        baseline_file.write_text(json.dumps(baseline, indent=2))

    tpu_dps = bench_tpu()
    vs = tpu_dps / baseline["torch_cpu_docs_per_sec"]
    details = {
        "tpu_docs_per_sec_per_chip": tpu_dps,
        "torch_cpu_docs_per_sec": baseline["torch_cpu_docs_per_sec"],
        "shapes": {"batch_sessions": B, "session_len": S, "slate": N,
                   "query_len": LQ, "doc_len": LD, "emsize": EMSIZE,
                   "nhid": NHID, "vocab": VOCAB},
        "dtype": "bfloat16",
        "pallas_fused_lstm": True,
        "model": "cars.score (session-aware slate reranking)",
    }
    (ROOT / "BENCH_DETAILS.json").write_text(json.dumps(details, indent=2))
    print(json.dumps({
        "metric": "reranked docs/sec/chip @ slate=50 (CARS, bf16)",
        "value": round(tpu_dps, 1),
        "unit": "docs/sec/chip",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
