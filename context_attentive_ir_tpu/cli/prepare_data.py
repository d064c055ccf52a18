"""Data preparation CLI.

Parity target: the reference's ``data/`` prep layer (SURVEY.md SS2.11,
marker ``exp:``): the reference README points at preprocessed AOL sessions
(Sordoni et al. 2015 splits with BM25 top-50 title slates) and MS MARCO
variants plus a GloVe download.  Those corpora are license-restricted and
not redistributable, so this CLI provides:

- ``synthetic``: generate a structurally identical synthetic corpus
  (train/dev/test splits + a toy GloVe file) for development and CI;
- ``convert``: convert a generic TSV/JSON click log into the framework's
  JSON-lines session format (documented in ``data/loader.py``).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from ..data import (
    ambiguous_vocab,
    write_ambiguous_fixture,
    write_fixture,
    write_glove_fixture,
)


def cmd_synthetic(args):
    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    splits = {"train": (args.n_train, 0), "dev": (args.n_dev, 1),
              "test": (args.n_test, 2)}
    writer = (write_ambiguous_fixture if args.corpus == "ambiguous"
              else write_fixture)
    for name, (n, seed) in splits.items():
        path = writer(out / f"{name}.jsonl", n_sessions=n,
                      n_candidates=args.num_candidates, seed=seed)
        print(f"wrote {path} ({n} sessions)")
    vocab = ambiguous_vocab() if args.corpus == "ambiguous" else None
    glove = write_glove_fixture(out / "glove.txt", dim=args.glove_dim,
                                vocab=vocab)
    print(f"wrote {glove}")


def cmd_convert(args):
    """TSV rows: session_id <tab> query <tab> doc_title <tab> clicked."""
    sessions: dict[str, dict] = {}
    with open(args.input) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 4:
                continue
            sid, query, title, clicked = parts[:4]
            sess = sessions.setdefault(sid, {"session_id": sid, "query": []})
            if not sess["query"] or sess["query"][-1]["text"] != query:
                sess["query"].append({"id": f"{sid}_{len(sess['query'])}",
                                      "text": query, "candidates": []})
            cands = sess["query"][-1]["candidates"]
            cands.append({"id": f"d{len(cands)}", "title": title,
                          "label": int(clicked)})
    with open(args.output, "w") as f:
        for sess in sessions.values():
            f.write(json.dumps(sess) + "\n")
    print(f"wrote {args.output} ({len(sessions)} sessions)")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    syn = sub.add_parser("synthetic")
    syn.add_argument("--corpus", choices=("topic", "ambiguous"),
                     default="topic",
                     help="topic: overlap-solvable; ambiguous: clicks "
                          "decidable only from session history")
    syn.add_argument("--out_dir", default="data/synthetic")
    syn.add_argument("--n_train", type=int, default=2000)
    syn.add_argument("--n_dev", type=int, default=200)
    syn.add_argument("--n_test", type=int, default=200)
    syn.add_argument("--num_candidates", type=int, default=50)
    syn.add_argument("--glove_dim", type=int, default=300)
    syn.set_defaults(fn=cmd_synthetic)
    conv = sub.add_parser("convert")
    conv.add_argument("--input", required=True)
    conv.add_argument("--output", required=True)
    conv.set_defaults(fn=cmd_convert)
    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
