"""CLI parsing and config plumbing (no jit)."""

from context_attentive_ir_tpu.cli.main import (
    build_parser,
    run_config_from_args,
)
from context_attentive_ir_tpu.config import config_from_args, default_config


def test_parser_defaults_and_overrides():
    p = build_parser()
    args = p.parse_args([
        "--model_type", "cars", "--train_file", "t.jsonl",
        "--batch_size", "64", "--nhid", "32", "--learning_rate", "0.01",
        "--bidirection", "false", "--session_buckets", "2,4",
        "--beam_size", "5", "--only_test",
    ])
    run = run_config_from_args(args)
    assert run.batch_size == 64
    assert run.beam_size == 5
    assert run.only_test is True
    assert run.session_buckets == (2, 4)
    cfg = config_from_args(args, default_config(args.model_type))
    assert cfg.model_type == "cars"
    assert cfg.nhid == 32
    assert cfg.learning_rate == 0.01
    assert cfg.bidirection is False


def test_parser_model_defaults_apply():
    p = build_parser()
    args = p.parse_args(["--model_type", "dssm"])
    cfg = config_from_args(args, default_config(args.model_type))
    assert cfg.nhid_ffnn == 300  # dssm bundle from MODEL_DEFAULTS
    args2 = p.parse_args(["--model_type", "dssm", "--nhid_ffnn", "64"])
    cfg2 = config_from_args(args2, default_config(args2.model_type))
    assert cfg2.nhid_ffnn == 64


def test_filter_widths_parsing():
    p = build_parser()
    args = p.parse_args(["--model_type", "cdssm", "--filter_widths", "2,3"])
    cfg = config_from_args(args, default_config(args.model_type))
    assert cfg.filter_widths == (2, 3)
