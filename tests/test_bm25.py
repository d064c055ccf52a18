"""BM25 slate retrieval tests (SURVEY.md SS2.11: the reference's AOL prep
retrieves BM25 top-50 title slates; data/bm25.py + native/bm25.cpp make
that step runnable here).

Covers: the Okapi/Lucene scoring formula against a hand-computed value,
ranking sanity, deterministic tie-breaking, native-vs-numpy equivalence,
and the prepare_data ``bm25`` subcommand end-to-end into ``load_data``.
"""

import math

import numpy as np
import pytest

from context_attentive_ir_tpu.data.bm25 import BM25Index


CORPUS = [
    "cheap flights to boston",          # 0
    "boston weather forecast",          # 1
    "cheap hotels boston downtown",     # 2
    "python programming tutorial",      # 3
    "learn python fast",                # 4
]


def test_hand_computed_score():
    """One-term query against a tiny corpus, formula checked by hand."""
    docs = ["a b", "a a c", "c c"]
    ix = BM25Index(docs, use_native=False)
    n, k1, b = 3, 1.2, 0.75
    avgdl = (2 + 3 + 2) / 3
    df = 2  # 'a' appears in docs 0, 1
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))

    def s(tf, dl):
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    scores = ix.scores("a")
    np.testing.assert_allclose(scores[0], s(1, 2), rtol=1e-6)
    np.testing.assert_allclose(scores[1], s(2, 3), rtol=1e-6)
    assert scores[2] == 0.0


def test_ranking_sanity():
    ix = BM25Index(CORPUS, use_native=False)
    idx, scores = ix.search("cheap flights boston", k=3)
    assert idx[0] == 0                       # all three terms match doc 0
    assert scores[0] > scores[1] >= scores[2]
    idx, _ = ix.search("python tutorial", k=2)
    assert idx[0] == 3
    assert idx[1] == 4


def test_uncase_and_unknown_terms():
    ix = BM25Index(CORPUS, use_native=False)
    np.testing.assert_array_equal(ix.scores("BOSTON Weather"),
                                  ix.scores("boston weather"))
    # all-unknown query: zero scores, top-k = lowest indices (tie-break)
    idx, scores = ix.search("zzz qqq", k=3)
    np.testing.assert_array_equal(idx, [0, 1, 2])
    assert (scores == 0).all()


def test_tie_break_is_doc_index():
    ix = BM25Index(["x y", "x y", "x y", "z"], use_native=False)
    idx, scores = ix.search("x", k=4)
    np.testing.assert_array_equal(idx, [0, 1, 2, 3])
    assert scores[0] == scores[1] == scores[2] > scores[3] == 0


def test_query_term_repetition_adds():
    ix = BM25Index(CORPUS, use_native=False)
    assert ix.scores("boston boston")[1] == 2 * ix.scores("boston")[1]


def test_native_matches_numpy():
    native = BM25Index(CORPUS, use_native=True)
    if native._native is None:
        pytest.skip("native bm25 unavailable")
    plain = BM25Index(CORPUS, use_native=False)
    rng = np.random.RandomState(0)
    vocab = sorted({t for d in CORPUS for t in d.split()}) + ["zzz"]
    queries = [" ".join(rng.choice(vocab, size=rng.randint(1, 5)))
               for _ in range(50)]
    for k in (1, 3, 5):
        got = native.search_batch(queries, k)
        want = plain.search_batch(queries, k)
        for (gi, gs), (wi, ws) in zip(got, want):
            np.testing.assert_array_equal(gi, wi)
            np.testing.assert_array_equal(gs, ws)  # bit-identical f32


def test_native_matches_numpy_larger_random():
    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(200)]
    docs = [" ".join(rng.choice(vocab, size=rng.randint(2, 12)))
            for _ in range(300)]
    native = BM25Index(docs, use_native=True)
    if native._native is None:
        pytest.skip("native bm25 unavailable")
    plain = BM25Index(docs, use_native=False)
    queries = [" ".join(rng.choice(vocab, size=rng.randint(1, 6)))
               for _ in range(40)]
    got = native.search_batch(queries, 50)
    want = plain.search_batch(queries, 50)
    for (gi, gs), (wi, ws) in zip(got, want):
        np.testing.assert_array_equal(gi, wi)
        np.testing.assert_array_equal(gs, ws)


def test_prepare_data_bm25_end_to_end(tmp_path):
    """Click log -> bm25 subcommand -> load_data: slates are top-N, the
    clicked title is present and labeled 1 (append policy)."""
    from context_attentive_ir_tpu.cli.prepare_data import main
    from context_attentive_ir_tpu.data import load_data

    corpus = tmp_path / "titles.txt"
    corpus.write_text("\n".join(CORPUS + [f"filler title {i}"
                                          for i in range(10)]) + "\n")
    log = tmp_path / "log.tsv"
    log.write_text(
        "s1\tcheap flights\tcheap flights to boston\n"
        "s1\tboston hotels\tcheap hotels boston downtown\n"
        "s2\tpython tutorial\tpython programming tutorial\n"
        # second click on the same turn
        "s2\tpython tutorial\tlearn python fast\n")
    out = tmp_path / "sessions.jsonl"
    main(["bm25", "--log", str(log), "--output", str(out),
          "--corpus_file", str(corpus), "--num_candidates", "4",
          "--no_native"])

    sessions = load_data(str(out), max_query_len=10, max_doc_len=10,
                         num_candidates=4, max_session_len=5)
    assert len(sessions) == 2
    s1 = sessions[0]
    assert len(s1.queries) == 2
    for q, clicked_title in zip(s1.queries,
                                ["cheap flights to boston",
                                 "cheap hotels boston downtown"]):
        assert len(q.documents) == 4
        labels = {" ".join(d.tokens): d.label for d in q.documents}
        assert labels[clicked_title] == 1
        assert sum(labels.values()) == 1
    # multi-click turn: both clicked titles labeled 1
    s2 = sessions[1]
    labels = {" ".join(d.tokens): d.label for d in s2.queries[0].documents}
    assert labels["python programming tutorial"] == 1
    assert labels["learn python fast"] == 1


def test_prepare_data_bm25_drop_policy(tmp_path):
    """on_missing_click=drop discards turns whose positive is out of the
    slate (forced here with num_candidates=1 and a click that cannot
    rank first)."""
    from context_attentive_ir_tpu.cli.prepare_data import main

    corpus = tmp_path / "titles.txt"
    corpus.write_text("alpha beta\nalpha beta gamma unrelated\n")
    log = tmp_path / "log.tsv"
    # query matches doc 0 best; click is doc 1 -> missing from top-1
    log.write_text("s1\talpha beta\talpha beta gamma unrelated\n")
    out = tmp_path / "dropped.jsonl"
    main(["bm25", "--log", str(log), "--output", str(out),
          "--corpus_file", str(corpus), "--num_candidates", "1",
          "--on_missing_click", "drop", "--no_native"])
    assert out.read_text() == ""


def test_prepare_data_bm25_duplicate_corpus_titles(tmp_path, capsys):
    """Duplicate titles in --corpus_file are collapsed to the first
    occurrence: with duplicates kept, BM25 retrieves the lower index
    while title_ix maps the text to the LAST one, so a click on a
    duplicated title would be labeled 0 and 'append' could insert the
    same text twice with conflicting labels."""
    import json as _json

    from context_attentive_ir_tpu.cli.prepare_data import main

    corpus = tmp_path / "titles.txt"
    corpus.write_text("cheap flights boston\nother title entirely\n"
                      "cheap flights boston\nfiller one\nfiller two\n")
    log = tmp_path / "log.tsv"
    log.write_text("s1\tcheap flights\tcheap flights boston\n")
    out = tmp_path / "sessions.jsonl"
    main(["bm25", "--log", str(log), "--output", str(out),
          "--corpus_file", str(corpus), "--num_candidates", "3",
          "--no_native"])
    assert "1 duplicate corpus titles collapsed" in capsys.readouterr().out
    turn = _json.loads(out.read_text())["query"][0]
    titles = [c["title"] for c in turn["candidates"]]
    assert len(set(titles)) == len(titles)        # no duplicate slate rows
    labels = {c["title"]: c["label"] for c in turn["candidates"]}
    assert labels["cheap flights boston"] == 1


def test_prepare_data_bm25_append_overflow_warns(tmp_path, capsys):
    """More distinct clicked positives than replaceable slate slots:
    'append' keeps what fits and warns loudly about the rest instead of
    silently violating its every-turn-keeps-its-positives contract."""
    from context_attentive_ir_tpu.cli.prepare_data import main

    corpus = tmp_path / "titles.txt"
    corpus.write_text("alpha match\nbravo unrelated\ncharlie unrelated\n")
    log = tmp_path / "log.tsv"
    # one turn, two distinct clicks, slate of 1 -> at most one positive fits
    log.write_text("s1\tmatch\tbravo unrelated\n"
                   "s1\tmatch\tcharlie unrelated\n")
    out = tmp_path / "sessions.jsonl"
    main(["bm25", "--log", str(log), "--output", str(out),
          "--corpus_file", str(corpus), "--num_candidates", "1",
          "--no_native"])
    assert "WARNING: 1 clicked positives" in capsys.readouterr().out


def test_prepare_data_bm25_click_label_is_case_insensitive(tmp_path):
    """A click differing from its corpus title only by case (or unicode
    form) retrieves the right document AND gets labeled 1: title lookup
    goes through the same NFD+casefold normalization BM25 tokenization
    uses (ADVICE r4)."""
    import json as _json

    from context_attentive_ir_tpu.cli.prepare_data import main

    corpus = tmp_path / "titles.txt"
    corpus.write_text("Cheap Flights Boston\nother title entirely\n"
                      "filler one\n")
    log = tmp_path / "log.tsv"
    log.write_text("s1\tcheap flights\tCHEAP FLIGHTS BOSTON\n")
    out = tmp_path / "sessions.jsonl"
    main(["bm25", "--log", str(log), "--output", str(out),
          "--corpus_file", str(corpus), "--num_candidates", "2",
          "--no_native"])
    turn = _json.loads(out.read_text())["query"][0]
    labels = {c["title"]: c["label"] for c in turn["candidates"]}
    assert labels["Cheap Flights Boston"] == 1


def test_prepare_data_bm25_unmatched_click_warns_and_drops(tmp_path,
                                                           capsys):
    """A clicked title absent from --corpus_file (even after
    normalization) is counted loudly, and under --on_missing_click=drop
    the turn is discarded rather than silently emitted all-negative
    (ADVICE r4)."""
    from context_attentive_ir_tpu.cli.prepare_data import main

    corpus = tmp_path / "titles.txt"
    corpus.write_text("alpha match\nbravo unrelated\n")
    log = tmp_path / "log.tsv"
    log.write_text("s1\tmatch\tnot in the corpus at all\n")
    # keep policy: turn survives all-negative, but warns
    out = tmp_path / "kept.jsonl"
    main(["bm25", "--log", str(log), "--output", str(out),
          "--corpus_file", str(corpus), "--num_candidates", "2",
          "--on_missing_click", "keep", "--no_native"])
    assert "WARNING: 1 clicked titles were not in the corpus" \
        in capsys.readouterr().out
    assert out.read_text().strip()
    # drop policy: the turn goes
    out2 = tmp_path / "dropped.jsonl"
    main(["bm25", "--log", str(log), "--output", str(out2),
          "--corpus_file", str(corpus), "--num_candidates", "2",
          "--on_missing_click", "drop", "--no_native"])
    assert "dropped" in capsys.readouterr().out
    assert out2.read_text() == ""


def test_prepare_data_bm25_qid_positional_under_drop(tmp_path):
    """qids number turns by their original session position, so a
    session whose first turn is dropped emits its second turn as
    sid_1, not sid_0 (ADVICE r4)."""
    import json as _json

    from context_attentive_ir_tpu.cli.prepare_data import main

    corpus = tmp_path / "titles.txt"
    corpus.write_text("alpha beta\nalpha beta gamma unrelated\n"
                      "delta echo\n")
    log = tmp_path / "log.tsv"
    # turn 0: click misses the top-1 slate -> dropped under 'drop'
    # turn 1: click ranks first -> kept
    log.write_text("s1\talpha beta\talpha beta gamma unrelated\n"
                   "s1\tdelta echo\tdelta echo\n")
    out = tmp_path / "sessions.jsonl"
    main(["bm25", "--log", str(log), "--output", str(out),
          "--corpus_file", str(corpus), "--num_candidates", "1",
          "--on_missing_click", "drop", "--no_native"])
    sess = _json.loads(out.read_text())
    assert [q["id"] for q in sess["query"]] == ["s1_1"]
