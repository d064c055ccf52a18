"""Click-keyed RANKING serving study (VERDICT r3 missing #1 evidence).

Trains CARS on the click-mode-only ambiguous corpus (sense revealed
ONLY by turn-0's click; 4-5-turn sessions -- the shape where the
click-flow rank association is known to transition at emsize/nhid 64,
RESULTS.md ablation section), then serves the trained model through
``Engine.rank_batch`` twice: history as ``(query, [clicked docs])``
pairs vs plain query strings.  The with-clicks MAP must mirror the
``no_click_flow`` ablation margin; without clicks the served model is
structurally blind on this corpus (tie ceiling ~0.55).

``python scripts/click_rank_study.py [epochs] [seed]`` -- one JSON line
per evaluation + a summary line.  Feeds RESULTS.md and the distilled
serving gate in tests/test_serve.py.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

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

DIMS = dict(emsize=64, nhid=64, nhid_ffnn=128, nfilters=8,
            max_query_len=3, max_doc_len=5, max_session_len=5,
            num_candidates=6, dropout=0.0, dropout_emb=0.0, dropout_rnn=0.0)
KW = dict(n_candidates=6, n_groups=3, modes=("click",))


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    train = [Session.from_dict(d) for d in generate_ambiguous_sessions(
        n_sessions=240, seed=0, **KW)]
    test = [Session.from_dict(d) for d in generate_ambiguous_sessions(
        n_sessions=48, seed=2, **KW)]
    streams = [q.tokens for s in train for q in s.queries]
    streams += [d.tokens for s in train for q in s.queries
                for d in q.documents]
    word_dict = build_dictionary(streams)
    print(json.dumps({"vocab": len(word_dict)}), flush=True)

    cfg = default_config("cars").replace(
        vocab_size=len(word_dict), learning_rate=5e-3, **DIMS)
    model = build_model(cfg)
    it = make_iterator(train, cfg, word_dict, batch_size=24, shuffle=True,
                       seed=seed)
    state = create_train_state(model, cfg, next(iter(it.epoch(0))),
                               jax.random.key(seed))
    step = make_train_step(model, cfg)
    score = make_score_step(model, cfg)
    test_batches = list(make_iterator(test, cfg, word_dict, batch_size=24,
                                      shuffle=False, seed=0))
    rng = jax.random.key(7)
    best, t0 = 0.0, time.time()
    for epoch in range(epochs):
        for batch in it.epoch(epoch):
            state, _ = step(state, batch, rng)
        if epoch % 10 == 9 or epoch == epochs - 1:
            m = evaluate_ranker(score, state.params, test_batches)["map"]
            best = max(best, m)
            print(json.dumps({"seed": seed, "epoch": epoch,
                              "map": round(m, 4),
                              "min": round((time.time() - t0) / 60, 1)}),
                  flush=True)
            if m > 0.9:
                break

    from click_gate_study import served_map
    m_click = served_map(cfg, word_dict, state.params, test,
                         with_clicks=True)
    m_plain = served_map(cfg, word_dict, state.params, test,
                         with_clicks=False)
    print(json.dumps({"summary": {
        "seed": seed, "trained_map": round(best, 4),
        "served_map_with_clicks": round(m_click, 4),
        "served_map_without_clicks": round(m_plain, 4)}}), flush=True)


if __name__ == "__main__":
    main()
