"""Measured kernel-vs-scan dispatch (VERDICT r2 next-round #4).

The table is on-chip data; these tests pin the lookup semantics: exact
(kind, T, E, H, dtype) match, nearest row-count by log distance, fallback
to the crossover constant for unmeasured shapes, and the training policy
(kernel pair always).
"""

import json

from context_attentive_ir_tpu.ops import dispatch


def _with_table(tmp_path, entries):
    p = tmp_path / "table.json"
    p.write_text(json.dumps({"entries": entries}))
    old = dispatch.TABLE_PATH
    dispatch.TABLE_PATH = p
    dispatch.reload_table()
    return old


def _restore(old):
    dispatch.TABLE_PATH = old
    dispatch.reload_table()


def _entry(rows, kernel_ms, scan_ms, **kw):
    base = dict(kind="lstm", mode="infer", t=30, e=256, h=128,
                dtype="bfloat16", rows=rows, kernel_ms=kernel_ms,
                scan_ms=scan_ms)
    base.update(kw)
    return base


def test_training_always_kernel():
    """Unmeasured training shapes default to the kernel pair (the
    end-to-end-measured rule, PERF.md r2 #7/#11/#16)."""
    assert dispatch.prefer_kernel("lstm", 10 ** 6, 30, 256, 128,
                                  "bfloat16", training=True)
    assert dispatch.prefer_kernel("gru", 8, 5, 32, 128, "float32",
                                  training=True)


def test_training_rule_overridden_by_measured_train_rows(tmp_path):
    """A measured mode='train' row at a matching shape overrides the
    always-kernel default (VERDICT r3 missing #4: the rule was
    extrapolated from one shape family; now it is testable per family)."""
    old = _with_table(tmp_path, [
        _entry(2000, kernel_ms=9.0, scan_ms=1.0, mode="train"),
    ])
    try:
        # measured: scan wins training at this family -> honored
        assert not dispatch.prefer_kernel("lstm", 2000, 30, 256, 128,
                                          "bfloat16", training=True)
        # unmeasured family -> the default rule still applies
        assert dispatch.prefer_kernel("lstm", 2000, 15, 256, 128,
                                      "bfloat16", training=True)
        # and inference at the same family ignores train rows
        assert dispatch.prefer_kernel("lstm", 2000, 30, 256, 128,
                                      "bfloat16", training=False)
    finally:
        _restore(old)


def test_beam_gen_dispatch(tmp_path):
    """prefer_fused_generator: measured beam_gen rows decide; unmeasured
    -> False (the XLA formulation)."""
    old = _with_table(tmp_path, [
        dict(kind="beam_gen", v=50_000, e=256, kc=6, rows=1600,
             fused_ms=6.3, xla_ms=8.9),
        dict(kind="beam_gen", v=5_000, e=256, kc=6, rows=1600,
             fused_ms=3.0, xla_ms=1.0),
        # totals schema: fused wins the SLOPE (0.08 vs 0.11/step) but
        # carries a ~6 ms one-time intercept, so it loses short decodes
        # and wins long ones -- the decision must follow the caller's t
        # (the round-5 greedy regression, PERF.md r5 #7)
        dict(kind="beam_gen", v=50_000, e=256, kc=2, rows=320,
             fused_ms=0.08, xla_ms=0.11,
             fused_t2_ms=6.2, xla_t2_ms=0.3),
    ])
    try:
        assert dispatch.prefer_fused_generator(1600, 50_000, 256, 6)
        assert dispatch.prefer_fused_generator(2000, 40_000, 256, 6)
        assert not dispatch.prefer_fused_generator(1600, 5_000, 256, 6)
        assert not dispatch.prefer_fused_generator(1600, 50_000, 300, 6)
        assert not dispatch.prefer_fused_generator(1600, 50_000, 256, 4)
        # t-aware: intercept-dominated at t=16 -> XLA; slope wins by
        # t=300 (6.2 + 298*0.08 = 30.0 < 0.95 * (0.3 + 298*0.11 = 33.1))
        assert not dispatch.prefer_fused_generator(320, 50_000, 256, 2,
                                                   t=16)
        assert dispatch.prefer_fused_generator(320, 50_000, 256, 2,
                                               t=300)
        # no t -> slope-only fallback (asymptotic decision)
        assert dispatch.prefer_fused_generator(320, 50_000, 256, 2)
        # t given but row predates the totals schema -> slope fallback
        assert dispatch.prefer_fused_generator(1600, 50_000, 256, 6,
                                               t=4)
    finally:
        _restore(old)


def test_beam_gen_pipe_dispatch(tmp_path):
    """prefer_pipelined_generator: measured beam_gen_pipe rows decide;
    unmeasured (kc mismatch / empty table) -> False (serial kernel)."""
    old = _with_table(tmp_path, [
        dict(kind="beam_gen_pipe", rows=1600, kc=6,
             pipe_ms=20.0, serial_ms=30.0),
        dict(kind="beam_gen_pipe", rows=320, kc=2,
             pipe_ms=7.0, serial_ms=6.0),
    ])
    try:
        assert dispatch.prefer_pipelined_generator(1600, 6)
        # nearest rows in log distance at exact kc match
        assert dispatch.prefer_pipelined_generator(3000, 6)
        assert not dispatch.prefer_pipelined_generator(320, 2)
        assert not dispatch.prefer_pipelined_generator(1600, 4)
    finally:
        _restore(old)


def test_beam_gen_prune_dispatch(tmp_path):
    """prefer_pruned_generator: measured beam_gen_prune rows decide;
    unmeasured (kc mismatch / empty table) -> False (unconditional
    selection)."""
    old = _with_table(tmp_path, [
        dict(kind="beam_gen_prune", rows=1600, kc=6,
             prune_ms=1.27, base_ms=1.62),
        dict(kind="beam_gen_prune", rows=320, kc=2,
             prune_ms=1.0, base_ms=1.02),   # near-tie: keep default
    ])
    try:
        assert dispatch.prefer_pruned_generator(1600, 6)
        # nearest rows in log distance at exact kc match
        assert dispatch.prefer_pruned_generator(3000, 6)
        assert not dispatch.prefer_pruned_generator(320, 2)
        assert not dispatch.prefer_pruned_generator(1600, 4)
    finally:
        _restore(old)


def test_nearest_row_point_decides(tmp_path):
    old = _with_table(tmp_path, [
        _entry(2000, kernel_ms=2.0, scan_ms=3.0),   # kernel wins
        _entry(16000, kernel_ms=7.0, scan_ms=5.0),  # scan wins
    ])
    try:
        pk = dispatch.prefer_kernel
        assert pk("lstm", 1000, 30, 256, 128, "bfloat16", False)
        assert pk("lstm", 3000, 30, 256, 128, "bfloat16", False)
        assert not pk("lstm", 12000, 30, 256, 128, "bfloat16", False)
        assert not pk("lstm", 10 ** 6, 30, 256, 128, "bfloat16", False)
        # log-distance midpoint of 2000/16000 is ~5657
        assert pk("lstm", 5000, 30, 256, 128, "bfloat16", False)
        assert not pk("lstm", 7000, 30, 256, 128, "bfloat16", False)
    finally:
        _restore(old)


def test_unmeasured_shape_falls_back_to_constant(tmp_path):
    old = _with_table(tmp_path, [
        _entry(2000, kernel_ms=9.0, scan_ms=1.0),  # kernel awful here...
    ])
    try:
        # ...but a different T/dtype/kind does not match that entry, so the
        # fallback crossover applies
        for kind, t, dt in (("lstm", 15, "bfloat16"),
                            ("lstm", 30, "float32"),
                            ("gru", 30, "bfloat16")):
            assert dispatch.prefer_kernel(
                kind, dispatch.SCAN_FASTER_ROWS - 1, t, 256, 128, dt, False)
            assert not dispatch.prefer_kernel(
                kind, dispatch.SCAN_FASTER_ROWS, t, 256, 128, dt, False)
    finally:
        _restore(old)


def test_missing_table_is_fallback(tmp_path):
    old = _with_table(tmp_path, [])
    try:
        (tmp_path / "table.json").unlink()
        dispatch.reload_table()
        assert dispatch.prefer_kernel("lstm", 100, 30, 256, 128,
                                      "bfloat16", False)
        assert not dispatch.prefer_kernel("lstm", 60000, 30, 256, 128,
                                          "bfloat16", False)
    finally:
        _restore(old)


def test_checked_in_table_is_self_consistent():
    """Every decision at a shipped RNN row's exact shape must follow
    from that row's own ms under the margin rule (data-driven: the
    table is re-measured each round, so this pins lookup SEMANTICS
    against the shipped data, not stale round-N values):

    - infer: kernel only when kernel_ms beats scan_ms by >margin
      (default = the XLA scan);
    - train: kernel unless scan_ms beats kernel_ms by >margin
      (default = the e2e-validated kernel pair)."""
    dispatch.reload_table()
    m = dispatch.NEAR_TIE_MARGIN
    rows_seen = 0
    for e in dispatch._load_table():
        if e.get("kind") not in ("lstm", "gru"):
            continue
        rows_seen += 1
        training = e["mode"] == "train"
        got = dispatch.prefer_kernel(e["kind"], e["rows"], e["t"],
                                     e["e"], e["h"], e["dtype"], training)
        if training:
            want = not (e["scan_ms"] < (1 - m) * e["kernel_ms"])
        else:
            want = e["kernel_ms"] < (1 - m) * e["scan_ms"]
        assert got == want, (e, got, want)
    assert rows_seen >= 8  # the table ships real coverage
    # and the production serving shape (bench doc encoder, 16k rows
    # infer) stays on the XLA scan per the shipped measurements
    assert not dispatch.prefer_kernel("lstm", 16000, 30, 256, 128,
                                      "bfloat16", False)


def test_write_table_round_trip(tmp_path):
    old = dispatch.TABLE_PATH
    try:
        dispatch.TABLE_PATH = tmp_path / "out.json"
        dispatch.write_table([_entry(4000, 1.0, 2.0)],
                             path=dispatch.TABLE_PATH)
        assert dispatch.prefer_kernel("lstm", 4000, 30, 256, 128,
                                      "bfloat16", False)
    finally:
        _restore(old)


def _beam_entry(v, kc, chunked_ms, exact_ms):
    return dict(kind="beam_topk", v=v, kc=kc,
                chunked_ms=chunked_ms, exact_ms=exact_ms)


def test_beam_topk_dispatch(tmp_path):
    """prefer_chunked_topk: exact kc match, nearest vocab by log
    distance, and unmeasured -> exact (False) — the policy behind
    beam_search(topk_method='auto') (decode/beam._resolve_topk_method)."""
    old = _with_table(tmp_path, [
        _beam_entry(50_000, 6, chunked_ms=1.2, exact_ms=2.0),  # chunked wins
        _beam_entry(5_000, 6, chunked_ms=1.0, exact_ms=0.5),   # exact wins
        _beam_entry(50_000, 4, chunked_ms=3.0, exact_ms=1.0),  # exact wins
    ])
    try:
        pc = dispatch.prefer_chunked_topk
        assert pc(50_000, 6)
        assert pc(40_000, 6)          # nearest-v: 50k row decides
        assert not pc(5_000, 6)
        assert not pc(50_000, 4)      # kc is an exact-match key
        assert not pc(50_000, 5)      # unmeasured kc -> exact
    finally:
        _restore(old)


def test_beam_topk_unmeasured_table_is_exact():
    """With no beam rows in the shipped table, 'auto' must resolve to the
    exact baseline everywhere (round-3 outage contract, PERF.md r3 #8)."""
    dispatch.reload_table()
    rows = [x for x in dispatch._load_table() if x["kind"] == "beam_topk"]
    if not rows:  # pre-measurement state: policy must be exact
        assert not dispatch.prefer_chunked_topk(50_000, 6)


def test_merge_rnn_entries_preserves_beam_rows():
    """The regeneration merge must keep every beam-family row (their key
    schemas have no 'mode'/'t'/... -- the pre-fix inline merge KeyError'd
    on beam_bk/beam_gen_pipe and lost the run) and every RNN support
    point not re-measured, while replacing re-measured ones."""
    old_rows = [
        _entry(2000, kernel_ms=1.0, scan_ms=2.0),            # re-measured
        _entry(8000, kernel_ms=3.0, scan_ms=2.5),            # kept
        _entry(2000, kernel_ms=1.1, scan_ms=2.1, mode="train"),  # kept
        dict(kind="beam_topk", v=50_000, kc=6, exact_ms=1.0,
             chunked_ms=3.0),
        dict(kind="beam_gen", v=50_000, e=256, kc=6, rows=1600,
             fused_ms=6.3, xla_ms=8.9, block_r=320, block_v=2048),
        dict(kind="beam_bk", rows=1600, k=5, fused_ms=29.6,
             legacy_ms=30.3),
        dict(kind="beam_gen_pipe", rows=1600, kc=6, pipe_ms=30.0,
             serial_ms=29.8),
    ]
    new_rows = [_entry(2000, kernel_ms=0.9, scan_ms=2.0)]
    merged = dispatch.merge_rnn_entries(new_rows, old_rows)
    kinds = sorted(e["kind"] for e in merged)
    assert kinds == ["beam_bk", "beam_gen", "beam_gen_pipe", "beam_topk",
                     "lstm", "lstm", "lstm"]
    infer_2000 = [e for e in merged if e["kind"] == "lstm"
                  and e["mode"] == "infer" and e["rows"] == 2000]
    assert infer_2000 == [new_rows[0]]      # fresh row replaced the stale


def test_near_tie_margin_keeps_default(tmp_path):
    """Bit-exact speed-only decisions (beam_* kinds) require the
    non-default variant to win by NEAR_TIE_MARGIN (ADVICE r4): ~1-2%
    table deltas are below the documented +/-15% tunnel jitter, so the
    simpler default path keeps them."""
    m = dispatch.NEAR_TIE_MARGIN
    assert 0 < m < 0.15
    old = _with_table(tmp_path, [
        # 2.3% faster fused bookkeeping (the shipped r4 row shape): noise
        dict(kind="beam_bk", rows=80, k=5, fused_ms=29.61,
             legacy_ms=30.31),
        # clear win at another k: honored
        dict(kind="beam_bk", rows=80, k=3, fused_ms=20.0, legacy_ms=30.0),
        # 0.6% pipelined win: noise
        dict(kind="beam_gen_pipe", rows=1600, kc=6, pipe_ms=29.84,
             serial_ms=30.01),
        # 1% fused-generator win: noise
        dict(kind="beam_gen", v=50_000, e=256, kc=6, rows=1600,
             fused_ms=8.8, xla_ms=8.9),
        # 1% chunked-topk win: noise
        dict(kind="beam_topk", v=50_000, kc=6, chunked_ms=8.8,
             exact_ms=8.9),
    ])
    try:
        assert not dispatch.prefer_fused_bookkeeping(80, 5)
        assert dispatch.prefer_fused_bookkeeping(80, 3)
        assert not dispatch.prefer_pipelined_generator(1600, 6)
        assert not dispatch.prefer_fused_generator(1600, 50_000, 256, 6)
        assert not dispatch.prefer_chunked_topk(50_000, 6)
    finally:
        _restore(old)
