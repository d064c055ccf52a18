"""Shortlist + pruned-selection study at AOL scale (round 5).

PERF.md r5 #2 shipped `Engine(suggest_shortlist=N)` with a coverage->BLEU
tradeoff measured on the tiny click-keyed corpus (vocab 94, Zipf-less),
where the 1% tolerance demanded near-full coverage, and argued "the
lever is real for production-scale vocabs where session + top-F covers
the next-query distribution".  This script tests that claim at the only
production-shaped setting on this machine: the AOL-scale rehearsal
model (scripts/aol_rehearsal.py -- CARS at E=256/H=128, vocab ~100k
Zipf-ish topic vocab, S<=10, slate 50), decoding the rehearsal test
split through the SERVING surface at several shortlist sizes.

Also A/Bs the threshold-pruned beamgen selection (ops/pallas/beamgen.py
prune=True) on the TRAINED model -- the favorable regime the
beamgen_prune_probe's `concentrated` side models (frequency-sorted
vocab ids + a trained generator concentrate top-k mass in low tiles),
as opposed to the conservative random-init regime the dispatch rows
are measured in.

Requires the rehearsal checkpoint (/tmp/aol_scale/runs/cars_aol.mdl --
run scripts/aol_rehearsal.py first) and a live TPU.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo \
  JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_tpu \
  timeout 3600 python scripts/aol_shortlist_study.py [sizes...]
      (default 16384 8192; each size is a fresh multi-minute Mosaic
       compile -- budget accordingly)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

CKPT = Path("/tmp/aol_scale/runs/cars_aol.mdl")
DATA = Path("/tmp/aol_scale/test.jsonl")
N_SESSIONS = 64          # ~6 requests/session -> ~350 requests
BUCKET = 32
BEAM = 5                 # kc=6: the measured beam_gen/beam_gen_prune rows


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [16384, 8192]
    if not CKPT.exists():
        sys.exit(f"rehearsal checkpoint missing: {CKPT} "
                 "(run scripts/aol_rehearsal.py first)")

    from context_attentive_ir_tpu.data import load_data
    from context_attentive_ir_tpu.eval.bleu import corpus_bleu
    from context_attentive_ir_tpu.serve import Engine

    def build(**kw):
        return Engine.from_checkpoint(CKPT, beam_size=BEAM,
                                      batch_bucket=BUCKET, **kw)

    eng0 = build()
    cfg = eng0.config
    test = load_data(DATA, cfg.max_query_len, cfg.max_doc_len,
                     cfg.num_candidates, cfg.max_session_len)
    test = test[:N_SESSIONS]

    reqs, golds = [], []
    for sess in test:
        hist = []
        for t, q in enumerate(sess.queries):
            clicked = [" ".join(d.tokens) for d in q.documents
                       if d.label == 1]
            hist.append((" ".join(q.tokens), clicked))
            if t + 1 < len(sess.queries):
                reqs.append(list(hist))
                golds.append([sess.queries[t + 1].tokens])
    print(f"[study] vocab={cfg.vocab_size} requests={len(reqs)}",
          flush=True)

    def decode_all(eng):
        hyps = []
        for i in range(0, len(reqs), BUCKET):
            out = eng.suggest_batch(reqs[i:i + BUCKET])
            hyps.extend(o[0][0].split() for o in out)
        return hyps

    hyps_by_mode: dict[str, list] = {}

    def run(label, eng):
        t0 = time.time()
        decode_all(eng)                       # warm: compiles included
        t_warm = time.time() - t0
        t0 = time.time()
        hyps = decode_all(eng)                # measured: steady state
        dt = time.time() - t0
        hyps_by_mode[label] = hyps
        bleu = corpus_bleu(hyps, golds)
        row = {"exp": "aol_shortlist_study", "mode": label,
               "vocab": cfg.vocab_size, "n_requests": len(reqs),
               "wall_s": round(dt, 2), "qps": round(len(reqs) / dt, 1),
               "compile_pass_s": round(t_warm, 1),
               **{f"bleu-{n}": round(b, 4) for n, b in enumerate(bleu, 1)}}
        if label != "exact" and label.startswith("exact"):
            # exact_* legs are exact-by-construction variants of the same
            # decode; at bf16 a recompiled step can still flip near-tie
            # argmaxes (decode/beam.py early_exit caveat), so report the
            # count rather than assert 0
            row["seq_mismatch"] = sum(
                a != b for a, b in zip(hyps, hyps_by_mode["exact"]))
        print(json.dumps(row), flush=True)
        return row

    results = {"exact": run("exact", eng0)}

    # early-exit A/B on the trained model (decode/beam.py early_exit:
    # cond-skip of all-finished steps; trained next queries are ~3-5
    # tokens of the max_len budget, so this is the favorable regime vs
    # the bench's never-finishing random-init params, which pay +5.4%
    # -- PERF.md r5 #8).  The Engine default is ON; this leg turns it
    # off, so `exact` - `exact_noearly` is the trained-model win.
    results["exact_noearly"] = run(
        "exact_noearly", build(suggest_early_exit=False))

    # pruned-selection A/B on the trained model: force prune OFF via the
    # dispatch hook (the exact engine above resolves it from the measured
    # beam_gen_prune rows; if those say off, this A/B is a no-op and the
    # two rows below will read the same)
    from context_attentive_ir_tpu.ops import dispatch

    orig = dispatch.prefer_pruned_generator
    dispatch.prefer_pruned_generator = lambda rows, kc: False
    try:
        results["exact_noprune"] = run("exact_noprune", build())
    finally:
        dispatch.prefer_pruned_generator = orig

    for size in sizes:
        r = run(f"shortlist_{size}", build(suggest_shortlist=size))
        base = results["exact"]["bleu-4"]
        delta = (r["bleu-4"] - base) / max(base, 1e-9)
        print(json.dumps({"exp": "aol_shortlist_study",
                          "mode": f"shortlist_{size}",
                          "coverage_pct": round(100 * size
                                                / cfg.vocab_size, 1),
                          "delta_bleu4_pct": round(100 * delta, 3),
                          "within_1pct": bool(abs(delta) <= 0.01),
                          "speedup_vs_exact": round(
                              results["exact"]["wall_s"] / r["wall_s"],
                              2)}), flush=True)


if __name__ == "__main__":
    main()
