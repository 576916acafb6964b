"""Data pipeline: dataset registry + a threaded prefetching batch loader.

The reference wraps torch DataLoader worker processes
(data/__init__.py:36-49); the TPU-native equivalent is a host-side thread
pool that decodes/augments ahead of the device and yields fixed-shape numpy
batches (static shapes keep everything on the one compiled XLA program; the
last partial batch is padded and flagged via 'valid').
"""

from __future__ import annotations

import concurrent.futures as _futures
import itertools

import numpy as np

from sketchedit_tpu.data.testimage import TestImageDataset
from sketchedit_tpu.data.editimage import EditImageDataset


class BaseDataset:
    """No-op dataset for entry points that don't read one (the demo server;
    the reference's --dataset_mode default is 'base')."""

    @staticmethod
    def modify_commandline_options(parser, is_train):
        return parser

    def initialize(self, opt):
        self.opt = opt

    def __len__(self):
        return 0


DATASETS = {
    "testimage": TestImageDataset,
    "editimage": EditImageDataset,
    "base": BaseDataset,
}


def find_dataset_using_name(name: str):
    try:
        return DATASETS[name.lower().replace('_', '')]
    except KeyError:
        raise ValueError(
            f"unknown dataset_mode '{name}'; available: {sorted(DATASETS)}")


def get_option_setter(name: str):
    return find_dataset_using_name(name).modify_commandline_options


def _collate(samples, batch_size):
    """Stack samples; pad to batch_size with repeats of the last sample."""
    n = len(samples)
    batch = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], np.ndarray):
            vals = vals + [vals[-1]] * (batch_size - n)
            batch[key] = np.stack(vals)
        else:
            batch[key] = list(vals)
    batch['valid'] = n
    return batch


class DataLoader:
    """Ordered or shuffled batches with background prefetch.

    Yields dicts of (B, H, W, C) numpy arrays plus 'path' (list of length
    'valid') and 'valid' (count of real samples in a padded final batch).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 0, drop_last: bool = False, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(0, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(order)
        bs = self.batch_size
        for start in range(0, len(order), bs):
            idx = order[start:start + bs]
            if self.drop_last and len(idx) < bs:
                return
            yield idx

    def __iter__(self):
        self._epoch += 1
        if self.num_workers == 0:
            for idx in self._index_batches():
                yield _collate([self.dataset[i] for i in idx],
                               self.batch_size)
            return

        with _futures.ThreadPoolExecutor(self.num_workers) as pool:
            batches = self._index_batches()
            inflight = []
            PREFETCH = 2
            for idx in itertools.islice(batches, PREFETCH):
                inflight.append(pool.map(self.dataset.__getitem__, idx))
            for nxt in batches:
                current = inflight.pop(0)
                inflight.append(pool.map(self.dataset.__getitem__, nxt))
                yield _collate(list(current), self.batch_size)
            for current in inflight:
                yield _collate(list(current), self.batch_size)


def create_dataloader(opt):
    cls = find_dataset_using_name(opt.dataset_mode)
    instance = cls()
    instance.initialize(opt)
    print(f"dataset [{type(instance).__name__}] of size {len(instance)} "
          "was created")
    return DataLoader(
        instance,
        batch_size=opt.batchSize,
        shuffle=not opt.serial_batches,
        num_workers=int(opt.nThreads),
        drop_last=opt.isTrain,
    )


def create_dataloader_trainval(opt):
    """Train/val dual loaders (reference data/__init__.py:51-77)."""
    assert opt.isTrain
    loaders = []
    for mode, shuffle, drop in ((opt.dataset_mode_train,
                                 not opt.serial_batches, True),
                                (opt.dataset_mode_val, False, False)):
        cls = find_dataset_using_name(mode)
        instance = cls()
        instance.initialize(opt)
        loaders.append(DataLoader(instance, batch_size=opt.batchSize,
                                  shuffle=shuffle,
                                  num_workers=int(opt.nThreads),
                                  drop_last=drop))
    return tuple(loaders)
