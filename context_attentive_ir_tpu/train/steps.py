"""Jit-compiled train / eval step builders.

Parity target: the model wrapper's ``update`` / ``predict`` (forward, loss,
backward, clip, step -- SURVEY.md SS2.9, marker ``exp:``), rebuilt
functionally: ONE compiled function per (model, task family) covers forward
+ loss + grads + optimizer, sharded over the ``('data',)`` mesh when one is
supplied (SURVEY.md SS5.8) -- XLA inserts the ICI all-reduce for gradients.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from ..config import ModelConfig
from ..models import task_family
from ..models.losses import (
    copy_generator_nll_loss,
    rank_loss,
    sequence_nll_loss,
)
from ..parallel.mesh import batch_sharding, replicated
from .state import TrainState


def make_loss_fn(model, config: ModelConfig):
    family = task_family(config.model_type)

    def loss_fn(params, batch, dropout_rng, deterministic: bool = False):
        rngs = {} if deterministic else {"dropout": dropout_rng}
        out = model.apply({"params": params}, batch, deterministic,
                          rngs=rngs)
        if family == "ranker":
            loss = rank_loss(config.loss_type, out, batch.labels,
                             batch.cand_mask, batch.row_mask, config.margin)
            metrics = {"rank_loss": loss}
        elif family == "recommender":
            tmask = batch.target_mask & batch.row_mask[:, None]
            if config.model_type == "acg":
                loss = copy_generator_nll_loss(out, batch.target_out, tmask)
            else:
                loss = sequence_nll_loss(out, batch.target_out, tmask)
            metrics = {"gen_loss": loss,
                       "ppl": jnp.exp(jnp.minimum(loss, 20.0))}
        else:  # multitask: joint objective (SURVEY.md SS2.6)
            rmask = batch.turn_mask & batch.row_mask[:, None]
            l_rank = rank_loss(config.loss_type, out["scores"], batch.clicks,
                               batch.cand_mask, rmask, config.margin)
            tmask = batch.target_mask & batch.row_mask[:, None, None]
            l_gen = sequence_nll_loss(out["gen_logits"], batch.target_out,
                                      tmask)
            loss = l_rank + config.alpha * l_gen
            metrics = {"rank_loss": l_rank, "gen_loss": l_gen}
        if config.regularize_coeff > 0:
            l2 = 0.5 * sum(jnp.sum(jnp.square(p))
                           for p in jax.tree_util.tree_leaves(params))
            loss = loss + config.regularize_coeff * l2
        metrics["loss"] = loss
        return loss, metrics

    return loss_fn


def make_train_step(model, config: ModelConfig,
                    mesh: Optional[Mesh] = None):
    """(state, batch, rng) -> (new_state, metrics)."""
    loss_fn = make_loss_fn(model, config)

    def train_step(state: TrainState, batch, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, batch, dropout_rng)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.apply_gradients(grads=grads)
        return new_state, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))
    rep, bsh = replicated(mesh), batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(rep, bsh, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def make_score_step(model, config: ModelConfig,
                    mesh: Optional[Mesh] = None):
    """(params, batch) -> ranking scores (eval mode)."""
    family = task_family(config.model_type)

    def score_step(params, batch):
        if family == "multitask":
            return model.apply({"params": params}, batch,
                               method=model.score)
        return model.apply({"params": params}, batch, True)

    if mesh is None:
        return jax.jit(score_step)
    rep, bsh = replicated(mesh), batch_sharding(mesh)
    return jax.jit(score_step, in_shardings=(rep, bsh), out_shardings=bsh)


def make_eval_loss_step(model, config: ModelConfig,
                        mesh: Optional[Mesh] = None):
    """(params, batch) -> metrics with dropout off (validation loss)."""
    loss_fn = make_loss_fn(model, config)

    def eval_step(params, batch):
        _, metrics = loss_fn(params, batch, jax.random.key(0),
                             deterministic=True)
        return metrics

    if mesh is None:
        return jax.jit(eval_step)
    rep, bsh = replicated(mesh), batch_sharding(mesh)
    return jax.jit(eval_step, in_shardings=(rep, bsh), out_shardings=rep)
