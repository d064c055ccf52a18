"""Device mesh + sharding layout.

Parity statement (SURVEY.md SS2.12): the reference's ONLY parallelism is
single-process ``nn.DataParallel``; TP/PP/SP/EP are absent and out of scope
by design.  The TPU-native equivalent is SPMD data parallelism over a
``('data',)`` mesh: batches shard on their leading axis, parameters and
optimizer state replicate, and XLA inserts the gradient all-reduce over ICI
(SURVEY.md SS5.8).  Everything below is plain ``jax.sharding`` + ``jit`` --
no hand-written collectives, which is exactly how this workload wants to
run on a TPU slice.

Scaling note (SURVEY.md SS5.7): models are ~10-40M params with <=50-token
sequences; the scaling axes are batch and the 50-candidate slate, both of
which ride the data axis.  A model-parallel mesh axis would add latency for
nothing at this size.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Sequence[jax.Device] | None = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis of every leaf across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a host batch with leading-axis sharding.

    Every leaf in our batch pytrees is ``[B, ...]`` with the same B, padded
    to a multiple of the mesh size by the iterator contract.
    """
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k
