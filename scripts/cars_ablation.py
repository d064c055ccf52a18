"""CARS component-ablation study on the discriminative mixed corpus.

Parity target: the paper's ablation analysis (arXiv:1906.02329 SS4;
SURVEY.md SS2.6) -- remove one component at a time and measure what it was
carrying.  The ambiguous corpus (data/synthetic.py) makes each variant's
ceiling PREDICTABLE in advance, which turns the ablation table into a
falsifiable mechanical check of the model:

- full CARS: both key modes visible (query-keyed via query-flow memory,
  click-keyed via click-flow memory) -> should approach ~1.0 MAP;
- ``no_click_flow``: the click-keyed half is invisible -> ideal is
  solving the query half and tying on the click half, ~0.76 at these
  corpus parameters (data/synthetic.py ideals);
- ``no_context_attn``: no history reaches the rank head at all -> the
  session-blind tie ceiling, ~0.58.

Runs at the distilled-gate dims on CPU (each variant ~2-4 min); writes
one JSON line per variant.

Usage:  python scripts/cars_ablation.py [--out /tmp/cars_ablation.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

import conftest  # noqa: E402,F401  -- forces CPU backend before jax use

import jax  # noqa: E402

from context_attentive_ir_tpu.config import default_config  # noqa: E402
from context_attentive_ir_tpu.data import build_dictionary  # noqa: E402
from context_attentive_ir_tpu.data.objects import Session  # noqa: E402
from context_attentive_ir_tpu.data.synthetic import (  # noqa: E402
    generate_ambiguous_sessions,
)
from context_attentive_ir_tpu.models import build_model  # noqa: E402
from context_attentive_ir_tpu.train import (  # noqa: E402
    create_train_state,
    make_iterator,
    make_train_step,
)
from context_attentive_ir_tpu.train.evaluate import evaluate_ranker  # noqa: E402
from context_attentive_ir_tpu.train.steps import make_score_step  # noqa: E402

DIMS = dict(emsize=32, nhid=32, nhid_ffnn=64, nfilters=8, max_query_len=3,
            max_doc_len=5, max_session_len=5, num_candidates=6,
            dropout=0.0, dropout_emb=0.0, dropout_rnn=0.0)


def run_variant(ablation, train, test, word_dict, epochs, seed, lr):
    cfg = default_config("cars").replace(
        vocab_size=len(word_dict), learning_rate=lr,
        cars_ablation=ablation, **DIMS)
    model = build_model(cfg)
    it = make_iterator(train, cfg, word_dict, batch_size=24, shuffle=True,
                       seed=seed)
    state = create_train_state(model, cfg, next(iter(it.epoch(0))),
                               jax.random.key(seed))
    step = make_train_step(model, cfg)
    score_fn = make_score_step(model, cfg)
    test_batches = list(make_iterator(test, cfg, word_dict, batch_size=24,
                                      shuffle=False, seed=0))
    rng = jax.random.key(7)
    best, t0 = 0.0, time.time()
    for epoch in range(epochs):
        for batch in it.epoch(epoch):
            state, _ = step(state, batch, rng)
        if epoch % 5 == 4 or epoch == epochs - 1:
            m = evaluate_ranker(score_fn, state.params, test_batches)["map"]
            best = max(best, m)
    return {"ablation": ablation, "best_map": round(best, 4),
            "epochs": epochs, "seed": seed, "lr": lr,
            "min": round((time.time() - t0) / 60, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/cars_ablation.json")
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--emsize", type=int, default=0,
                    help="override DIMS emsize/nhid (0 = gate dims)")
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--only", default="",
                    help="comma-separated ablation subset")
    args = ap.parse_args()
    if args.emsize:
        DIMS.update(emsize=args.emsize, nhid=args.emsize,
                    nhid_ffnn=2 * args.emsize)

    # BOTH key modes -> the click half separates full CARS from
    # no_click_flow (the gate corpus uses query-only; here mixed is the
    # point)
    kw = dict(n_candidates=6, n_groups=3, modes=("query", "click"))
    train = [Session.from_dict(d) for d in generate_ambiguous_sessions(
        n_sessions=240, seed=0, **kw)]
    test = [Session.from_dict(d) for d in generate_ambiguous_sessions(
        n_sessions=48, seed=2, **kw)]
    streams = [q.tokens for s in train for q in s.queries]
    streams += [d.tokens for s in train for q in s.queries
                for d in q.documents]
    word_dict = build_dictionary(streams)

    variants = (tuple(args.only.split(",")) if args.only
                else ("none", "no_click_flow", "no_context_attn"))
    results = []
    for ab in variants:
        res = run_variant(ab, train, test, word_dict, args.epochs,
                          args.seed, lr=args.lr)
        results.append(res)
        print(json.dumps(res), flush=True)
    Path(args.out).write_text(
        "\n".join(json.dumps(r) for r in results) + "\n")


if __name__ == "__main__":
    main()
