"""Utils tests: meters, tables, metrics stream, profiling contexts."""

import json

import jax.numpy as jnp

from context_attentive_ir_tpu.utils import (
    AverageMeter,
    MetricsWriter,
    Timer,
    debug_mode,
    format_table,
    timed,
)


def test_average_meter():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0 and m.val == 3.0 and m.count == 2
    m.reset()
    assert m.avg == 0.0


def test_timer():
    t = Timer()
    assert t.time() >= 0
    t.stop()
    frozen = t.time()
    assert t.time() == frozen
    t.resume()
    assert t.time() >= frozen


def test_metrics_writer(tmp_path):
    w = MetricsWriter(tmp_path / "m.jsonl")
    w.write("epoch", epoch=1, loss=0.5)
    w.write("test", map=0.9)
    lines = [json.loads(x) for x in
             (tmp_path / "m.jsonl").read_text().splitlines()]
    assert lines[0]["event"] == "epoch" and lines[0]["loss"] == 0.5
    assert lines[1]["map"] == 0.9


def test_format_table():
    s = format_table([{"a": 1, "b": 0.12345}, {"a": 22, "b": 3.0}], "t")
    assert "0.123" in s and "22" in s and s.startswith("t")
    assert format_table([], "empty") == "empty"


def test_timed_and_debug_mode():
    x = jnp.ones((4,))
    with timed(sync_value=x) as box:
        y = x + 1
    assert box["seconds"] >= 0
    with debug_mode(nans=True):
        assert float((x + 1).sum()) == 8.0
