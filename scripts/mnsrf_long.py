"""Long-budget M-NSRF run on the mixed long-chain corpus (round 3).

RESULTS.md's ladder section notes that on the mixed corpora (query- AND
click-keyed halves) the fixed M-NSRF shows only the beginning of a rank-
side phase transition within the 64-epoch suite budget (best dev MAP
0.621 vs the ~0.59 ceiling; its ideal is ~0.76 = solve the query-keyed
half, tie on the click-keyed half it cannot see).  This script gives it
the budget the query-keyed diagnosis says it needs (transitions at epoch
60-80 there with HALF the signal diluted away here, so 3x): 192 epochs,
patience 64, lr 5e-3 — and records the outcome either way.

Usage:  JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_tpu \
            python scripts/mnsrf_long.py [--data_dir /tmp/suite_sugg]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from context_attentive_ir_tpu.config import RunConfig, default_config  # noqa: E402
from context_attentive_ir_tpu.data import (  # noqa: E402
    build_dictionary,
    load_data,
    load_embeddings,
)
from context_attentive_ir_tpu.train import Trainer  # noqa: E402
from context_attentive_ir_tpu.utils import setup_logging  # noqa: E402

from run_suite import SUGGEST_DIMS  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="/tmp/suite_sugg")
    ap.add_argument("--epochs", type=int, default=192)
    ap.add_argument("--out", default="/tmp/mnsrf_long.json")
    args = ap.parse_args()
    setup_logging()

    data = Path(args.data_dir)
    dims = dict(SUGGEST_DIMS)
    base = default_config("mnsrf").replace(**dims)
    load = lambda p: load_data(p, base.max_query_len, base.max_doc_len,
                               base.num_candidates, base.max_session_len)
    train, dev, test = (load(data / f"{s}.jsonl")
                        for s in ("train", "dev", "test"))
    streams = [q.tokens for s in train for q in s.queries]
    streams += [d.tokens for s in train for q in s.queries
                for d in q.documents]
    word_dict = build_dictionary(streams)
    table, _ = load_embeddings(data / "glove.txt", word_dict,
                               dims["emsize"])

    cfg = default_config("mnsrf").replace(
        vocab_size=len(word_dict), learning_rate=5e-3, **dims)
    run = RunConfig(model_dir=str(data / "runs_long"),
                    model_name="mnsrf_long",
                    batch_size=32, test_batch_size=32,
                    num_epochs=args.epochs, display_iter=1000,
                    early_stop=64, valid_metric="map", beam_size=1,
                    seed=1013, resume=True)
    t0 = time.time()
    tr = Trainer(cfg, run, word_dict, pretrained=table)
    tr.fit(train, dev)
    res = tr.test(test)
    res["model"] = "mnsrf_long"
    res["min"] = round((time.time() - t0) / 60, 1)
    Path(args.out).write_text(json.dumps(res) + "\n")
    print("==", json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
