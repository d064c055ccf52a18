"""Official evaluation drivers (validation + test).

Parity target: the reference's ``validate_official`` / test flows
(SURVEY.md SS3.3-SS3.4): accumulate per-query (scores, labels) ->
MAP/MRR/NDCG@k; beam/greedy decode suggestions -> corpus BLEU / ROUGE-L;
dump predictions to file.

Device/host split: scoring and decoding are jit-compiled and slate-batched;
metric aggregation happens on host numpy (not a hot path).
"""

from __future__ import annotations

import json
from functools import partial
from pathlib import Path
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..data.dictionary import Dictionary
from ..data.vectorize import SessionBatch
from ..decode import beam_search, greedy_decode
from ..eval import bleu_metrics, corpus_bleu, ranking_metrics, rouge_metrics
from ..eval.rouge import rouge_l_sentence
from ..eval.text_metrics import exact_match, token_f1
from ..models import task_family


def build_decode_fn(model, config: ModelConfig, beam_size: int = 1,
                    max_len: Optional[int] = None,
                    run: Optional["object"] = None):
    """Returns jitted ``decode(params, batch) -> token ids [rows, T]``.

    rows = B for recommenders, B*S for multitask models (their
    ``decode_init`` flattens the session axis).  ``run`` (a RunConfig)
    supplies beam penalty knobs; defaults match the reference beam.
    """
    max_len = max_len or (config.max_query_len + 1)
    is_acg = config.model_type == "acg"
    beam_kw = {}
    if run is not None:
        beam_kw = dict(alpha=run.beam_alpha,
                       length_penalty=run.beam_length_penalty,
                       coverage_beta=run.beam_coverage_beta,
                       coverage_penalty=run.beam_coverage_penalty,
                       min_length=run.min_decode_len)

    def decode(params, batch, init_method):
        var = {"params": params}
        state, memory, memory_mask = model.apply(var, batch,
                                                 method=init_method)
        rows = memory.shape[0]
        kwargs = {}
        if is_acg:
            kwargs = {"source": batch.source, "source_mask":
                      batch.source_mask}
        if beam_size > 1:
            rep = lambda x: jnp.repeat(x, beam_size, axis=0)
            mem_k, mask_k = rep(memory), rep(memory_mask)
            kw_k = {k: rep(v) for k, v in kwargs.items()}
            step = lambda st, toks: model.apply(
                var, st, toks, mem_k, mask_k, method=model.decode_step,
                **kw_k)
            # early_exit: validation decodes run trained(-ish) models
            # that finish in a few steps of the budget (PERF.md r5 #8)
            seqs, _ = beam_search(step, state, rows, max_len, beam_size,
                                  cov_mask=memory_mask, early_exit=True,
                                  **beam_kw)
        else:
            step = lambda st, toks: model.apply(
                var, st, toks, memory, memory_mask,
                method=model.decode_step, **kwargs)
            seqs, _ = greedy_decode(step, state, rows, max_len,
                                    min_length=beam_kw.get(
                                        'min_length', 0),
                                    early_exit=True)
        return seqs

    fast = jax.jit(partial(decode, init_method=model.decode_init))
    if not hasattr(model, "decode_init_full"):
        return fast

    # CARS: the fast decode_init is exact only up to suggest_max_clicks
    # clicked docs per turn; batches beyond that boundary dispatch to the
    # (compiled-on-demand) full-slate init -- loud, never approximate
    # (VERDICT r2 weak #5 / next-round #6).
    from ..models.multitask.cars import clicks_exceed_suggest_cap

    full = jax.jit(partial(decode, init_method=model.decode_init_full))
    cap = config.suggest_max_clicks

    def dispatch(params, batch):
        if clicks_exceed_suggest_cap(batch, cap):
            dispatch.fallbacks += 1
            return full(params, batch)
        return fast(params, batch)

    dispatch.fallbacks = 0  # observable in tests / logs
    return dispatch


def evaluate_ranker(score_fn: Callable, params, batches: Iterable,
                    dump_path: str | Path | None = None) -> dict:
    """Accumulate slate scores and compute MAP/MRR/NDCG@k/P@k."""
    all_scores, all_labels, all_cand, all_rows = [], [], [], []
    dump = open(dump_path, "w") if dump_path else None
    for batch in batches:
        scores = np.asarray(jax.device_get(score_fn(params, batch)),
                            np.float32)
        if scores.ndim == 3:   # session models: [B, S, N]
            labels, cand = batch.clicks, batch.cand_mask
            rows = batch.turn_mask & batch.row_mask[:, None]
        else:
            labels, cand = batch.labels, batch.cand_mask
            rows = batch.row_mask
        all_scores.append(scores.reshape(-1, scores.shape[-1]))
        all_labels.append(labels.reshape(-1, labels.shape[-1]))
        all_cand.append(cand.reshape(-1, cand.shape[-1]))
        all_rows.append(rows.reshape(-1))
        if dump is not None:
            flat_s = all_scores[-1]
            flat_l = all_labels[-1]
            for i in np.nonzero(all_rows[-1])[0]:
                dump.write(json.dumps(
                    {"scores": flat_s[i].tolist(),
                     "labels": flat_l[i].tolist()}) + "\n")
    if dump is not None:
        dump.close()
    return ranking_metrics(np.concatenate(all_scores),
                           np.concatenate(all_labels),
                           np.concatenate(all_cand),
                           np.concatenate(all_rows))


def evaluate_suggestions(decode_fn: Callable, params, batches: Iterable,
                         word_dict: Dictionary,
                         dump_path: str | Path | None = None) -> dict:
    """Decode next queries and compute BLEU-1..4 / ROUGE-L / EM / F1."""
    hyps, refs = [], []
    dump = open(dump_path, "w") if dump_path else None
    for batch in batches:
        seqs = np.asarray(jax.device_get(decode_fn(params, batch)))
        if isinstance(batch, SessionBatch):
            B, S, Lt = batch.target_out.shape
            targets = batch.target_out.reshape(B * S, Lt)
            valid = (batch.target_mask.any(-1)
                     & batch.row_mask[:, None]).reshape(B * S)
        else:
            targets = batch.target_out
            valid = batch.row_mask
        for i in np.nonzero(valid)[0]:
            hyp = word_dict.decode(seqs[i])
            ref = word_dict.decode(targets[i])
            hyps.append(hyp)
            refs.append([ref])
            if dump is not None:
                # per-sentence scores ride along (reference dumps
                # per-example predictions, SURVEY.md SS4)
                sent = corpus_bleu([hyp], [[ref]], max_n=4, smooth=True)
                dump.write(json.dumps(
                    {"hypothesis": " ".join(hyp),
                     "reference": " ".join(ref),
                     "bleu-4": round(sent[3], 4),
                     "rouge-l": round(rouge_l_sentence(hyp, [ref]), 4),
                     "f1": round(token_f1([hyp], [ref]), 4)}) + "\n")
    if dump is not None:
        dump.close()
    out = bleu_metrics(hyps, refs)
    out.update(rouge_metrics(hyps, refs))
    out["em"] = exact_match(hyps, [r[0] for r in refs])
    out["f1"] = token_f1(hyps, [r[0] for r in refs])
    out["n_queries"] = float(len(hyps))
    return out


def official_eval(model, config: ModelConfig, params, batches: list,
                  word_dict: Dictionary, score_fn=None, decode_fn=None,
                  dump_prefix: str | Path | None = None) -> dict:
    """Task-appropriate metric bundle (the reference's official eval)."""
    family = task_family(config.model_type)
    out: dict = {}
    if family in ("ranker", "multitask") and score_fn is not None:
        dump = f"{dump_prefix}.ranks.jsonl" if dump_prefix else None
        out.update(evaluate_ranker(score_fn, params, batches, dump))
    if family in ("recommender", "multitask") and decode_fn is not None:
        dump = f"{dump_prefix}.hyps.jsonl" if dump_prefix else None
        out.update(evaluate_suggestions(decode_fn, params, batches,
                                        word_dict, dump))
    return out
