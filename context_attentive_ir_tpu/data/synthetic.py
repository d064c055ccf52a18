"""Synthetic AOL-like fixture generator.

Real AOL logs are not redistributable and not present on this machine
(SURVEY.md SS7 step 1), so this module generates structurally identical
session data: sessions of related queries, each query with a candidate slate
in which topically matching documents carry the click label.  Every model in
the zoo must be able to overfit a small fixture generated here (the
"overfit gate" test strategy, SURVEY.md SS4).

The generator plants learnable structure:
- a topic vocabulary; queries in a session share a topic,
- clicked documents share >=2 tokens with their query; distractors are drawn
  from other topics,
- the next query in a session extends the previous one (so suggestion models
  have signal).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

TOPICS = [
    "jazz guitar chord lesson music theory scales improvisation swing bebop",
    "hiking boots trail mountain gear backpack waterproof alpine summit ridge",
    "pasta recipe tomato basil garlic olive oil italian sauce dinner cooking",
    "python numpy array tutorial machine learning code gradient tensor model",
    "toyota engine repair brake manual transmission oil filter garage mechanic",
    "beach resort hotel vacation island snorkel sunset tropical flight booking",
    "stock market index fund dividend portfolio invest retirement bond yield",
    "soccer league final score goal striker coach transfer stadium champions",
]


def _word(rng: np.random.RandomState, topic_words: list[str]) -> str:
    return topic_words[rng.randint(len(topic_words))]


def generate_sessions(
    n_sessions: int = 50,
    min_turns: int = 2,
    max_turns: int = 4,
    n_candidates: int = 10,
    seed: int = 0,
) -> list[dict]:
    rng = np.random.RandomState(seed)
    topics = [t.split() for t in TOPICS]
    sessions = []
    for s in range(n_sessions):
        topic = topics[rng.randint(len(topics))]
        n_turns = rng.randint(min_turns, max_turns + 1)
        base = [_word(rng, topic) for _ in range(2)]
        queries = []
        for t in range(n_turns):
            # next query refines the previous one: keep a prefix, add a word
            q_tokens = base[: 2 + t] if len(base) >= 2 + t else base
            if t > 0:
                base = base + [_word(rng, topic)]
                q_tokens = base[: 2 + t]
            n_clicked = 1 + int(rng.rand() < 0.2)
            cands = []
            click_pos = rng.permutation(n_candidates)[:n_clicked]
            for c in range(n_candidates):
                if c in click_pos:
                    doc_tokens = list(q_tokens) + [
                        _word(rng, topic) for _ in range(rng.randint(1, 4))
                    ]
                    label = 1
                else:
                    other = topics[rng.randint(len(topics))]
                    doc_tokens = [_word(rng, other) for _ in range(rng.randint(3, 7))]
                    label = 0
                cands.append(
                    {"id": f"d{s}_{t}_{c}", "title": " ".join(doc_tokens),
                     "label": label}
                )
            queries.append(
                {"id": f"q{s}_{t}", "text": " ".join(q_tokens), "candidates": cands}
            )
        sessions.append({"session_id": f"s{s}", "query": queries})
    return sessions


def write_fixture(path: str | Path, **kwargs) -> Path:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for sess in generate_sessions(**kwargs):
            f.write(json.dumps(sess) + "\n")
    return path


def write_glove_fixture(path: str | Path, dim: int = 32, seed: int = 1) -> Path:
    """A tiny GloVe-format file over the synthetic topic vocabulary."""
    rng = np.random.RandomState(seed)
    vocab = sorted({w for t in TOPICS for w in t.split()})
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for w in vocab:
            vec = rng.normal(size=(dim,)).astype(np.float32)
            f.write(w + " " + " ".join(f"{v:.5f}" for v in vec) + "\n")
    return path
