"""Epoch samplers (reference ``data/samplers.py``).

``FixedLengthSampler`` (ref ``:40-79``): shuffled (optionally object-weighted)
index stream with a per-epoch random subset replaced by ``-1`` — the zero-poke
ids — at rate ``1/zero_poke_amount``.  Pure numpy with an explicit Generator.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import numpy as np


class FixedLengthSampler:
    def __init__(
        self,
        dataset_len: int,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        weights: Optional[np.ndarray] = None,
        zero_poke: bool = False,
        zero_poke_amount: Optional[int] = None,
        seed: int = 0,
    ):
        self.n = dataset_len
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.weights = None
        if weights is not None:
            w = np.asarray(weights, np.float64)
            self.weights = w / w.sum()
        self.zero_poke = zero_poke
        self.zero_poke_amount = zero_poke_amount
        if zero_poke:
            assert zero_poke_amount is not None
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        if self.drop_last:
            return self.n // self.batch_size
        return -(-self.n // self.batch_size)

    def __iter__(self) -> Iterator[List[int]]:
        rng = np.random.default_rng((self.seed, self.epoch))
        if self.shuffle:
            if self.weights is not None:
                order = rng.choice(self.n, size=self.n, p=self.weights)
            else:
                order = rng.permutation(self.n)
        else:
            order = np.arange(self.n)

        if self.zero_poke:
            zero_ids = set(
                rng.choice(self.n, size=int(self.n / self.zero_poke_amount),
                           replace=False).tolist()
            )
        else:
            zero_ids = set()

        batch = []
        for idx in order:
            batch.append(-1 if int(idx) in zero_ids else int(idx))
            if len(batch) == self.batch_size:
                yield batch
                batch = []
        if batch and not self.drop_last:
            yield batch
