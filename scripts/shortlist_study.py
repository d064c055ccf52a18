"""Quality gate for candidate-shortlist suggestion decode (round 5,
VERDICT r4 weak #3 'measure it or kill it with numbers').

Trains (or loads from the tests' gate cache) the click-keyed CARS --
the repo's hardest suggestion setting: the chain bit lives ONLY in
turn-0's clicked doc, doc-blind generators cap at corpus BLEU-4 0.7186
-- then decodes the test split through the SERVING surface
(Engine.suggest_batch) at several shortlist sizes and reports BLEU.

The shortlist construction (decode/shortlist.py: specials + session
tokens + frequency fill) is expected to be near-lossless here and on
AOL-like data because next queries overwhelmingly reuse session/frequent
tokens; the BASELINE.json:5 tolerance (metrics within 1%) is the gate.

Usage: python scripts/shortlist_study.py [sizes...]   (default 512 64 32 16)
CPU-safe (forces the cpu backend like tests/conftest).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

import numpy as np  # noqa: E402

from context_attentive_ir_tpu.eval.bleu import corpus_bleu  # noqa: E402
from context_attentive_ir_tpu.serve import Engine  # noqa: E402


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [512, 64, 32, 16]

    from gate_cache import cached_params
    from test_discriminative import (
        _click_suggest_setup,
        _train_cars_click_suggest,
    )

    key = dict(gate="cars_click_suggest", corpus="click_keyed_v1",
               n_train=240, n_test=48, n_candidates=6, n_groups=3,
               emsize=64, nhid=64, lr=5e-3, seed=1, epochs=220,
               exit_at=0.85)
    params = cached_params(
        key, lambda: _train_cars_click_suggest(epochs=220)[2])
    params = jax.tree.map(jax.numpy.asarray, params)
    cfg, word_dict, test = _click_suggest_setup()

    # serving-surface histories: (query, [clicked docs]) pairs so the
    # click-flow sees turn-0's click; gold = the next query
    def requests():
        for sess in test:
            hist = []
            for t, q in enumerate(sess.queries):
                clicked = [" ".join(d.tokens) for d in q.documents
                           if d.label == 1]
                hist.append((" ".join(q.tokens), clicked))
                if t + 1 < len(sess.queries):
                    yield list(hist), sess.queries[t + 1].tokens

    reqs = list(requests())
    golds = [[g] for _, g in reqs]
    results = {}
    for size in [0] + sizes:
        eng = Engine(cfg, word_dict, params, beam_size=1,
                     batch_bucket=16, suggest_shortlist=size)
        hyps = []
        for i in range(0, len(reqs), 16):
            out = eng.suggest_batch([h for h, _ in reqs[i:i + 16]])
            hyps.extend(o[0][0].split() for o in out)
        bleu = corpus_bleu(hyps, golds)
        label = "exact" if size == 0 else str(size)
        results[label] = {f"bleu-{n}": round(b, 4)
                          for n, b in enumerate(bleu, 1)}
        print(json.dumps({"exp": "shortlist_study", "shortlist": label,
                          "vocab": cfg.vocab_size, **results[label]}),
              flush=True)
    base = results["exact"]["bleu-4"]
    for label, r in results.items():
        if label == "exact":
            continue
        delta = (r["bleu-4"] - base) / max(base, 1e-9)
        print(json.dumps({"exp": "shortlist_study", "shortlist": label,
                          "delta_bleu4_pct": round(100 * delta, 3),
                          "within_1pct": bool(abs(delta) <= 0.01)}),
              flush=True)


if __name__ == "__main__":
    main()
