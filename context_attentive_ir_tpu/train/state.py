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


# Embedding-table leaf names (ops.layers.Embeddings params).  With
# ``fix_embeddings=True`` these leaves are excluded from the optimizer
# entirely (optax.multi_transform -> masked inner transforms), matching
# the reference wrapper, which builds its optimizer over
# ``requires_grad`` parameters only (SURVEY.md SS2.9 'Optimizers') -- so
# torch Adam never carries moments for a frozen table.  Benefits here:
# no [V, E] m/v moment buffers (2 x table bytes of HBM) and no per-step
# moment/update passes over the table; the lookup additionally
# stop_gradients (ops/layers.py:Embeddings.fixed) so the masked-out
# update is a structural guarantee, not the only line of defense.
_EMBEDDING_PARAM_NAMES = ("embedding", "embedding_q", "embedding_scale")


def _freeze_labels(params) -> Any:
    """Label pytree for multi_transform: 'frozen' for embedding tables."""

    def label(path, _leaf):
        names = {getattr(k, "key", None) for k in path}
        return "frozen" if names & set(_EMBEDDING_PARAM_NAMES) else "train"

    return jax.tree_util.tree_map_with_path(label, params)


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

    inner_parts = []
    if config.weight_decay > 0:
        inner_parts.append(optax.add_decayed_weights(config.weight_decay))
    inner_parts.append(opt)
    inner = optax.chain(*inner_parts)
    if config.fix_embeddings:
        # exclude the frozen table from the optimizer (moments + decay +
        # update); its grads are already zero via stop_gradient, so the
        # global-norm clip below is unaffected.  set_to_zero keeps the
        # frozen leaves' updates exactly 0 regardless of the inner chain.
        inner = optax.multi_transform(
            {"train": inner, "frozen": optax.set_to_zero()}, _freeze_labels)

    parts = []
    if config.grad_clipping > 0:
        parts.append(optax.clip_by_global_norm(config.grad_clipping))
    parts.append(inner)
    return optax.chain(*parts)


def create_train_state(model, config: ModelConfig, example_batch,
                       rng: jax.Array) -> TrainState:
    params = model.init({"params": rng, "dropout": rng}, example_batch,
                        True)["params"]
    return TrainState.create(apply_fn=model.apply, params=params,
                             tx=make_optimizer(config))


def param_count(state: TrainState) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(state.params))
