"""Click-keyed corpus study: recipe search + evidence for the round-4 gates.

Two questions (VERDICT r3 missing #1/#2, next-round #1/#2):

1. SUGGESTION: on the click-keyed corpus (chain identity revealed only by
   turn-0's CLICKED doc; ``data/synthetic.py:
   generate_click_keyed_suggestion_sessions``), does trained CARS close to
   the context oracle (corpus BLEU-4 ~1.0) while doc-blind generators
   (HRED-QS and, by design, M-NSRF whose decoder reads the query-flow
   only) cap at the blind optimum (0.7186 on the 48-session test split)?

2. RANKING SERVING: with the same trained CARS served through
   ``Engine.rank_batch``, does feeding clicked docs in the request history
   buy the predicted MAP margin over plain-string history (the serving
   analogue of the ``no_click_flow`` ablation)?

Run on CPU (``python scripts/click_gate_study.py [epochs]``); prints one
JSON line per evaluation so the transition epoch is observable, ending
with a summary line.  Results feed RESULTS.md and the distilled CI gates
in tests/test_discriminative.py / tests/test_serve.py.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from context_attentive_ir_tpu.config import default_config  # noqa: E402
from context_attentive_ir_tpu.data import build_dictionary  # noqa: E402
from context_attentive_ir_tpu.data.objects import Session  # noqa: E402
from context_attentive_ir_tpu.data.synthetic import (  # noqa: E402
    generate_click_keyed_suggestion_sessions,
)
from context_attentive_ir_tpu.eval import ranking_metrics  # noqa: E402
from context_attentive_ir_tpu.train import (  # noqa: E402
    create_train_state,
    make_iterator,
    make_train_step,
)
from context_attentive_ir_tpu.train.evaluate import (  # noqa: E402
    build_decode_fn,
    evaluate_ranker,
    evaluate_suggestions,
)
from context_attentive_ir_tpu.train.steps import make_score_step  # noqa: E402

DIMS = dict(emsize=64, nhid=64, nhid_ffnn=128, nfilters=8,
            max_query_len=5, max_doc_len=9, max_session_len=3,
            num_candidates=6, dropout=0.0, dropout_emb=0.0, dropout_rnn=0.0)
KW = dict(n_candidates=6, n_groups=3)


def data():
    train = [Session.from_dict(d)
             for d in generate_click_keyed_suggestion_sessions(
                 n_sessions=240, seed=0, **KW)]
    test = [Session.from_dict(d)
            for d in generate_click_keyed_suggestion_sessions(
                n_sessions=48, seed=2, **KW)]
    streams = [q.tokens for s in train for q in s.queries]
    streams += [d.tokens for s in train for q in s.queries
                for d in q.documents]
    return train, test, build_dictionary(streams)


def train_model(mtype, train, test, word_dict, epochs, lr=5e-3, seed=1,
                eval_every=10, extra=None):
    from context_attentive_ir_tpu.models import build_model, task_family

    cfg = default_config(mtype).replace(
        vocab_size=len(word_dict), learning_rate=lr, **DIMS, **(extra or {}))
    model = build_model(cfg)
    it = make_iterator(train, cfg, word_dict, batch_size=24, shuffle=True,
                       seed=seed)
    state = create_train_state(model, cfg, next(iter(it.epoch(0))),
                               jax.random.key(seed))
    step = make_train_step(model, cfg)
    test_batches = list(make_iterator(test, cfg, word_dict, batch_size=24,
                                      shuffle=False, seed=0))
    decode = build_decode_fn(model, cfg, beam_size=1)
    score = (make_score_step(model, cfg)
             if task_family(mtype) == "multitask" else None)
    rng = jax.random.key(2)
    best = {"bleu-4": 0.0, "map": 0.0}
    t0 = time.time()
    for epoch in range(epochs):
        for batch in it.epoch(epoch):
            state, _ = step(state, batch, rng)
        if (epoch + 1) % eval_every == 0 or epoch == epochs - 1:
            m = evaluate_suggestions(decode, state.params, test_batches,
                                     word_dict)
            row = {"model": mtype, "seed": seed, "lr": lr, "epoch": epoch,
                   "bleu4": round(m["bleu-4"], 4),
                   "min": round((time.time() - t0) / 60, 1)}
            if score is not None:
                row["map"] = round(evaluate_ranker(
                    score, state.params, test_batches)["map"], 4)
                best["map"] = max(best["map"], row["map"])
            best["bleu-4"] = max(best["bleu-4"], m["bleu-4"])
            print(json.dumps(row), flush=True)
            if best["bleu-4"] > 0.98 and (score is None
                                          or best["map"] > 0.9):
                break
    return cfg, model, state, best


def served_map(cfg, word_dict, params, test, with_clicks: bool):
    """MAP of Engine.rank_batch over every turn of ``test`` sessions,
    history as (query, [clicked docs]) pairs or plain strings."""
    from context_attentive_ir_tpu.serve import Engine

    eng = Engine(cfg, word_dict, params, beam_size=1, batch_bucket=16)
    reqs, labels = [], []
    for sess in test:
        hist = []
        for q in sess.queries:
            docs = [" ".join(d.tokens) for d in q.documents]
            reqs.append((" ".join(q.tokens), docs, list(hist)))
            labels.append([float(d.label) for d in q.documents])
            clicked = [" ".join(d.tokens) for d in q.documents
                       if d.label == 1]
            hist.append((" ".join(q.tokens), clicked) if with_clicks
                        else " ".join(q.tokens))
    scores = []
    for i in range(0, len(reqs), 16):
        scores.extend(eng.rank_batch(reqs[i:i + 16]))
    n = max(len(r) for r in labels)
    S = np.full((len(scores), n), -1e9, np.float32)
    L = np.zeros((len(scores), n), np.float32)
    C = np.zeros((len(scores), n), bool)
    for i, (s, l) in enumerate(zip(scores, labels)):
        S[i, :len(s)] = s
        L[i, :len(l)] = l
        C[i, :len(s)] = True
    return ranking_metrics(S, L, C, np.ones(len(scores), bool))["map"]


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    train, test, word_dict = data()
    print(json.dumps({"vocab": len(word_dict), "train": len(train),
                      "test": len(test)}), flush=True)

    # doc-blind floor: HRED-QS (history-reading, doc-blind)
    _, _, _, hred = train_model("hredqs", train, test, word_dict,
                                epochs=min(60, epochs))
    # the designed passing model
    cfg, _, state, cars = train_model("cars", train, test, word_dict,
                                      epochs=epochs)

    m_click = served_map(cfg, word_dict, state.params, test,
                         with_clicks=True)
    m_plain = served_map(cfg, word_dict, state.params, test,
                         with_clicks=False)
    print(json.dumps({
        "summary": {
            "hredqs_best_bleu4": round(hred["bleu-4"], 4),
            "cars_best_bleu4": round(cars["bleu-4"], 4),
            "cars_best_map": round(cars["map"], 4),
            "blind_oracle_bleu4": 0.7186,
            "served_map_with_clicks": round(m_click, 4),
            "served_map_without_clicks": round(m_plain, 4),
        }}), flush=True)


if __name__ == "__main__":
    main()
