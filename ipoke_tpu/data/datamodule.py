"""Data module: datasets + samplers + threaded host loader with device prefetch.

Replaces the reference's ``StaticDataModule`` + torch ``DataLoader`` worker
processes (``data/datamodule.py``) with a thread-pool loader (cv2/np release
the GIL for IO and resize) feeding an async ``jax.device_put`` prefetch queue
— the TPU-native input pipeline (SURVEY.md §2.8).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

from .datasets import IperDataset, get_dataset
from .samplers import FixedLengthSampler


def collate(items) -> Dict[str, np.ndarray]:
    out = {}
    for key in items[0]:
        out[key] = np.stack([it[key] for it in items], axis=0)
    return out


class StaticDataModule:
    """Builds train/val/test datasets per the reference's config contract."""

    def __init__(self, config: dict, datakeys: Sequence[str],
                 debug: bool = False, meta=None, data_root=None):
        self.config = config
        self.datakeys = list(datakeys)
        self.batch_size = config["batch_size"]
        self.n_workers = int(config.get("n_workers", 4))
        self.zero_poke = bool(config.get("zero_poke", False))
        self.seed = int(config.get("seed", 0))
        dset_cls = get_dataset(config["dataset"])
        kw = dict(meta=meta, data_root=data_root)
        self.dset_train = dset_cls(config, self.datakeys, train=True, **kw)
        val_keys = list(self.datakeys)
        if dset_cls is IperDataset and "keypoints" in getattr(
            self.dset_train, "datadict", {}
        ):
            val_keys += ["keypoints_rel", "keypoints_abs"]
        self.dset_val = dset_cls(config, val_keys, train=False, **kw)
        self.dset_test = self.dset_val

    def _loader(self, dset, batch_size, train: bool, epoch: int = 0,
                n_batches: Optional[int] = None):
        weights = (dset.datadict.get("weights")
                   if getattr(dset, "obj_weighting", False) else None)
        sampler = FixedLengthSampler(
            len(dset), batch_size, shuffle=True, drop_last=True,
            weights=weights,
            zero_poke=self.zero_poke and train,
            zero_poke_amount=self.config.get("zero_poke_amount", 12)
            if self.zero_poke and train else None,
            seed=self.seed + (0 if train else 7919),
        )
        sampler.set_epoch(epoch)
        return ThreadedLoader(dset, sampler, n_workers=self.n_workers,
                              seed=self.seed + epoch, n_batches=n_batches)

    def train_loader(self, epoch: int = 0, n_batches: Optional[int] = None):
        return self._loader(self.dset_train, self.batch_size, True, epoch,
                            n_batches)

    def val_loader(self, epoch: int = 0, n_batches: Optional[int] = None):
        return self._loader(self.dset_val, self.batch_size, False, epoch,
                            n_batches)

    def test_loader(self, n_batches: Optional[int] = None):
        bs = self.config.get("test_batch_size", self.batch_size)
        return self._loader(self.dset_test, bs, False, 0, n_batches)


class ThreadedLoader:
    """Iterates collated numpy batches; IO fans out over a thread pool and a
    depth-2 queue keeps the accelerator fed."""

    def __init__(self, dataset, sampler, n_workers: int = 4, seed: int = 0,
                 n_batches: Optional[int] = None, prefetch: int = 2):
        self.dataset = dataset
        self.sampler = sampler
        self.n_workers = max(1, n_workers)
        self.seed = seed
        self.n_batches = n_batches
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.sampler)
        return min(n, self.n_batches) if self.n_batches else n

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.n_workers) as pool:
                for bi, batch_ids in enumerate(self.sampler):
                    if self.n_batches is not None and bi >= self.n_batches:
                        break
                    if stop.is_set():
                        break
                    rngs = [
                        np.random.default_rng((self.seed, bi, j))
                        for j in range(len(batch_ids))
                    ]
                    items = list(pool.map(
                        lambda a: self.dataset.get_item(a[0], a[1]),
                        zip(batch_ids, rngs),
                    ))
                    q.put(collate(items))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()


def device_prefetch(it, device=None, depth: int = 2):
    """Overlap host->device transfer with compute: keep up to ``depth``
    batches in flight (device_put is async — the transfers stream while the
    consumer computes on earlier batches; depth 2 double-buffers 128px
    batches without pinning excessive HBM)."""
    import collections

    import jax

    q = collections.deque()
    for batch in it:
        q.append(jax.device_put(batch, device))
        if len(q) >= depth:
            yield q.popleft()
    while q:
        yield q.popleft()
