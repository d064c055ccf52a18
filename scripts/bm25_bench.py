"""Host-side BM25 retrieval throughput at AOL-like scale (no TPU).

The slate-construction step (``cli/prepare_data.py bm25``, SURVEY.md
SS2.11) runs entirely on this machine's single CPU core; this measures
the numpy reference scorer vs the native C++ scorer (native/bm25.cpp)
on a Zipf-token synthetic title corpus, and verifies they agree exactly
on the measured queries.  Prints one JSON line per variant (PERF.md
ledger convention).

Usage: python scripts/bm25_bench.py [n_docs] [n_queries]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from context_attentive_ir_tpu.data.bm25 import BM25Index  # noqa: E402


def zipf_titles(rng, n, vocab_size, lo=3, hi=12):
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = (1.0 / ranks) / np.sum(1.0 / ranks)
    lens = rng.randint(lo, hi + 1, size=n)
    toks = rng.choice(vocab_size, size=int(lens.sum()), p=probs)
    out, pos = [], 0
    for ln in lens:
        out.append(" ".join(f"w{t}" for t in toks[pos:pos + ln]))
        pos += ln
    return out


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    rng = np.random.RandomState(0)
    titles = zipf_titles(rng, n_docs, vocab_size=50_000)
    queries = zipf_titles(rng, n_queries, vocab_size=50_000, lo=2, hi=5)

    t0 = time.perf_counter()
    ix = BM25Index(titles, use_native=True)
    build_s = time.perf_counter() - t0
    print(json.dumps({"exp": "bm25_host", "variant": "index_build",
                      "n_docs": n_docs, "seconds": round(build_s, 2),
                      "docs_per_sec": round(n_docs / build_s)}),
          flush=True)

    k = 50
    if ix._native is not None:
        t0 = time.perf_counter()
        native_res = ix.search_batch(queries, k)
        dt = time.perf_counter() - t0
        print(json.dumps({"exp": "bm25_host", "variant": "native",
                          "n_queries": n_queries,
                          "qps": round(n_queries / dt, 1),
                          "ms_per_query": round(dt / n_queries * 1e3, 3)}),
              flush=True)
    else:
        native_res = None
        print(json.dumps({"exp": "bm25_host",
                          "variant": "native_unavailable"}), flush=True)

    # numpy reference on a subset (dense scores + full sort per query is
    # the semantics path, not the production path)
    sub = queries[:100]
    ix._native = None
    t0 = time.perf_counter()
    ref_res = ix.search_batch(sub, k)
    dt = time.perf_counter() - t0
    print(json.dumps({"exp": "bm25_host", "variant": "numpy",
                      "n_queries": len(sub),
                      "qps": round(len(sub) / dt, 1),
                      "ms_per_query": round(dt / len(sub) * 1e3, 3)}),
          flush=True)

    if native_res is not None:
        mismatch = 0
        for (gi, gs), (wi, ws) in zip(native_res[:100], ref_res):
            if not (np.array_equal(gi, wi) and np.array_equal(gs, ws)):
                mismatch += 1
        print(json.dumps({"exp": "bm25_host", "variant": "parity",
                          "queries_checked": len(sub),
                          "mismatches": mismatch}), flush=True)


if __name__ == "__main__":
    main()
