"""Batch iterators over vectorized examples.

Parity target: the reference's ``torch.utils.data.Dataset`` +
``DataLoader(--data_workers, shuffle)`` per task family (SURVEY.md SS2.1
'Datasets', marker ``exp:``).

TPU-first redesign: instead of worker processes producing variable-shape
batches, each epoch is a deterministic, seedable permutation of examples cut
into *fixed-size* batches (the final short batch is padded and flagged via
``row_mask``), so every step presents identical shapes to the compiled step
function.  Determinism makes exact checkpoint resume possible
(SURVEY.md SS5.3): the iterator state is (epoch_seed, position).
"""

from __future__ import annotations

from typing import Callable, Generic, Iterator, Sequence, TypeVar

import numpy as np

T = TypeVar("T")
B = TypeVar("B")


class BatchIterator(Generic[T, B]):
    """Deterministic fixed-shape batch stream.

    ``collate(examples, batch_size) -> Batch`` must pad short batches and set
    ``row_mask`` accordingly (the ``build_*_batch`` functions in
    ``vectorize.py`` do).
    """

    def __init__(
        self,
        examples: Sequence[T],
        collate: Callable[[list[T]], B],
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
    ):
        self.examples = list(examples)
        self.collate = collate
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last

    def __len__(self) -> int:
        n = len(self.examples)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def epoch(self, epoch_idx: int, start_batch: int = 0) -> Iterator[B]:
        """Iterate batches of one epoch; resumable from ``start_batch``."""
        order = np.arange(len(self.examples))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + epoch_idx)
            rng.shuffle(order)
        n_batches = len(self)
        for b in range(start_batch, n_batches):
            idx = order[b * self.batch_size: (b + 1) * self.batch_size]
            yield self.collate([self.examples[i] for i in idx])

    def __iter__(self) -> Iterator[B]:
        return self.epoch(0)
