"""Beam search / greedy decode unit tests on hand-crafted step functions."""

import jax
import jax.numpy as jnp
import numpy as np

from context_attentive_ir_tpu.constants import BOS, EOS, PAD
from context_attentive_ir_tpu.decode import beam_search, greedy_decode

V = 6  # vocab: 0=PAD 1=UNK 2=BOS 3=EOS 4=a 5=b


def make_step(table):
    """step_fn from a dict mapping current token -> logprob row."""
    logp = jnp.log(jnp.asarray(table))

    def step(state, tokens):
        return state, logp[tokens]

    return step


def test_greedy_follows_argmax_and_stops_at_eos():
    # from BOS: 'a' most likely; from 'a': 'b'; from 'b': EOS
    table = np.full((V, V), 1e-9, np.float32)
    table[BOS, 4] = 0.9
    table[4, 5] = 0.8
    table[5, EOS] = 0.95
    table[EOS, EOS] = 1.0
    table /= table.sum(-1, keepdims=True)
    step = make_step(table)
    toks, score = jax.jit(
        lambda: greedy_decode(step, (), 2, 6))()
    toks = np.asarray(toks)
    np.testing.assert_array_equal(toks[0], [4, 5, EOS, PAD, PAD, PAD])
    assert np.isfinite(np.asarray(score)).all()


def test_beam_finds_higher_probability_path_than_greedy():
    """Classic beam case: greedy takes a locally-best token leading to a
    low-probability continuation; beam recovers the globally better path."""
    table = np.full((V, V), 1e-9, np.float32)
    # from BOS: 'a'=0.51, 'b'=0.49 (greedy picks 'a')
    table[BOS, 4] = 0.51
    table[BOS, 5] = 0.49
    # from 'a': everything bad (uniform), from 'b': EOS = 0.99
    table[4, :] = 0.2
    table[5, EOS] = 0.99
    table[EOS, EOS] = 1.0
    table /= table.sum(-1, keepdims=True)
    step = make_step(table)
    g_toks, _ = greedy_decode(step, (), 1, 4)
    b_toks, b_score = beam_search(step, (), 1, 4, beam_size=3, alpha=0.0)
    assert np.asarray(g_toks)[0, 0] == 4
    assert np.asarray(b_toks)[0, 0] == 5       # beam prefers b -> EOS
    assert np.asarray(b_toks)[0, 1] == EOS


def test_beam_size_one_matches_greedy():
    rng = np.random.RandomState(0)
    table = rng.rand(V, V).astype(np.float32) + 1e-3
    table /= table.sum(-1, keepdims=True)
    step = make_step(table)
    g_toks, _ = greedy_decode(step, (), 3, 5)
    b_toks, _ = beam_search(step, (), 3, 5, beam_size=1, alpha=0.0)
    np.testing.assert_array_equal(np.asarray(g_toks), np.asarray(b_toks))


def test_beam_state_gather_consistency():
    """Step function whose state counts steps per beam; after search the
    state must have been gathered consistently (no cross-batch mixing)."""
    rng = np.random.RandomState(1)
    table = rng.rand(V, V).astype(np.float32)
    table /= table.sum(-1, keepdims=True)
    logp = jnp.log(jnp.asarray(table))

    def step(state, tokens):
        # state: per-row last token; verify it matches what beam fed us
        return tokens, logp[tokens]

    toks, score = beam_search(step, jnp.zeros((2,), jnp.int32), 2, 4,
                              beam_size=2)
    assert np.asarray(toks).shape == (2, 4)
    assert np.isfinite(np.asarray(score)).all()


def test_finished_beams_frozen():
    """Once EOS is emitted the hypothesis must not grow (PAD-only)."""
    table = np.full((V, V), 1e-9, np.float32)
    table[BOS, EOS] = 0.99     # immediately finish
    table[EOS, 4] = 0.99       # tempting continuation (must be ignored)
    table /= table.sum(-1, keepdims=True)
    step = make_step(table)
    toks, _ = beam_search(step, (), 1, 5, beam_size=2)
    t = np.asarray(toks)[0]
    assert t[0] == EOS or t[0] == PAD
    assert (t[1:] == PAD).all()
