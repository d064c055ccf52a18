"""Train state + optimizer construction.

Parity target: the model wrapper's ``init_optimizer`` (SGD / Adam / Adamax,
``--learning_rate --weight_decay --momentum --grad_clipping``, lr decay;
SURVEY.md SS2.9, marker ``exp:``), rebuilt on optax: the update rule is a
single fused optax chain inside the jitted train step -- clipping, the
optimizer transform, and (optional) exponential lr decay all run on-device.
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax.training import train_state

from ..config import ModelConfig


class TrainState(train_state.TrainState):
    """Flax TrainState; dropout RNG folds in from the step count."""

    def dropout_rng(self, base_rng: jax.Array) -> jax.Array:
        return jax.random.fold_in(base_rng, self.step)


def make_optimizer(config: ModelConfig) -> optax.GradientTransformation:
    lr: Any = config.learning_rate
    if config.lr_decay_steps > 0 and config.lr_decay < 1.0:
        # exponential decay every lr_decay_steps optimizer steps (the
        # reference's --lr_decay, SURVEY.md SS2.9 'Optimizers')
        lr = optax.exponential_decay(
            config.learning_rate, transition_steps=config.lr_decay_steps,
            decay_rate=config.lr_decay, staircase=True)
    if config.warmup_steps > 0:
        warm = optax.linear_schedule(0.0, config.learning_rate,
                                     config.warmup_steps)
        base = lr
        if callable(base):
            lr = optax.join_schedules([warm, base], [config.warmup_steps])
        else:
            lr = optax.join_schedules(
                [warm, optax.constant_schedule(base)],
                [config.warmup_steps])

    if config.optimizer == "sgd":
        opt = optax.sgd(lr, momentum=config.momentum)
    elif config.optimizer == "adam":
        opt = optax.adam(lr)
    elif config.optimizer == "adamax":
        opt = optax.adamax(lr)
    else:
        raise ValueError(f"unknown optimizer {config.optimizer!r}")

    parts = []
    if config.grad_clipping > 0:
        parts.append(optax.clip_by_global_norm(config.grad_clipping))
    if config.weight_decay > 0:
        parts.append(optax.add_decayed_weights(config.weight_decay))
    parts.append(opt)
    return optax.chain(*parts)


def create_train_state(model, config: ModelConfig, example_batch,
                       rng: jax.Array) -> TrainState:
    params = model.init({"params": rng, "dropout": rng}, example_batch,
                        True)["params"]
    return TrainState.create(apply_fn=model.apply, params=params,
                             tx=make_optimizer(config))


def param_count(state: TrainState) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(state.params))
