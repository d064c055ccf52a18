"""Model zoo factory.

Parity target: the per-family ``__init__.py`` factories selecting a model
class by ``--model_type`` (SURVEY.md SS2.4-SS2.6, marker ``exp:``).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..config import MULTITASK, RANKERS, RECOMMENDERS, ModelConfig
from .rankers import RANKER_CLASSES


def _recommender_classes():
    from .recommenders import RECOMMENDER_CLASSES
    return RECOMMENDER_CLASSES


def _multitask_classes():
    from .multitask import MULTITASK_CLASSES
    return MULTITASK_CLASSES


def get_model_class(model_type: str):
    if model_type in RANKER_CLASSES:
        return RANKER_CLASSES[model_type]
    rec = _recommender_classes()
    if model_type in rec:
        return rec[model_type]
    mt = _multitask_classes()
    if model_type in mt:
        return mt[model_type]
    raise ValueError(f"unknown model_type {model_type!r}")


def task_family(model_type: str) -> str:
    """'ranker' | 'recommender' | 'multitask' -- selects batch family and
    metrics (mirrors the reference's three task drivers, SURVEY.md SS1)."""
    if model_type in RANKERS:
        return "ranker"
    if model_type in RECOMMENDERS:
        return "recommender"
    if model_type in MULTITASK:
        return "multitask"
    raise ValueError(f"unknown model_type {model_type!r}")


def build_model(config: ModelConfig,
                pretrained: Optional[np.ndarray] = None):
    cls = get_model_class(config.model_type)
    return cls(config=config, pretrained=pretrained)
