"""Host->device feeding: shuffled epoch batching with device prefetch.

Replaces the reference's single-threaded python generator
(`modules/lidar/train/loader.py:92-162`) — which unpickled three files and
ran a python label-encoding loop per frame — with array slicing plus an
async double-buffered `jax.device_put` pipeline. Label encoding happens on
device inside the train step, so the host only moves raw tensors.

`epoch_indices` reproduces the reference's epoch-fill semantics
(`loader.py:74-87`): when the dataset doesn't divide the batch size, the
remainder is filled with extra samples drawn from a second shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import jax
import numpy as np


def epoch_indices(
    n: int, batch_size: int, rng: np.random.Generator, shuffle: bool = True
) -> np.ndarray:
    """Indices covering one epoch, padded to a whole number of batches."""
    num_batches = n // batch_size + (1 if n % batch_size else 0)
    idx = np.arange(n)
    if shuffle:
        rng.shuffle(idx)
    need = num_batches * batch_size - n
    while need > 0:  # tiny datasets may need several refills
        extra = np.arange(n)
        if shuffle:
            rng.shuffle(extra)
        idx = np.concatenate([idx, extra[:need]])
        need -= min(need, n)
    return idx.reshape(num_batches, batch_size)


class BatchPipeline:
    """Iterate dict-of-arrays datasets in device-resident batches.

    Double buffering: while the consumer works on batch k, batch k+1 is
    already being transferred (device_put is async in JAX, so simply staying
    one batch ahead overlaps H2D with compute).
    """

    def __init__(
        self,
        data: dict[str, np.ndarray],
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        sharding: jax.sharding.Sharding | None = None,
        drop_remainder: bool = False,
        device_resident: bool | None = None,
        device_budget_bytes: int = 4 << 30,
    ):
        self.data = data
        self.n = len(next(iter(data.values())))
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.sharding = sharding
        self.drop_remainder = drop_remainder
        # Device-resident mode: stage the whole dataset on device once and
        # gather each batch on-device. On the axon relay every per-batch
        # host->device transfer leaks its staging buffer in-process
        # (measured: 200 x 22 MB puts retained 3.2 GB RSS; a 60-epoch
        # fusion run was OOM-killed at 130 GB), and the transfer also
        # dominated step wall-clock. Default: resident whenever the data
        # fits the budget and no sharding is requested; streaming puts
        # remain for sharded or outsized datasets.
        if device_resident is None:
            total = sum(np.asarray(v).nbytes for v in data.values())
            device_resident = sharding is None and total <= device_budget_bytes
        self._dev = None
        if device_resident and sharding is None:
            self._dev = {k: jax.numpy.asarray(v) for k, v in data.items()}

    @property
    def batches_per_epoch(self) -> int:
        if self.drop_remainder:
            return self.n // self.batch_size
        return self.n // self.batch_size + (1 if self.n % self.batch_size else 0)

    def _put(self, batch: dict[str, np.ndarray]):
        if self.sharding is not None:
            return {
                k: jax.device_put(v, self.sharding) for k, v in batch.items()
            }
        return jax.device_put(batch)

    def epoch(self) -> Iterator[dict]:
        plan = epoch_indices(self.n, self.batch_size, self.rng, self.shuffle)
        if self.drop_remainder:
            plan = plan[: self.n // self.batch_size]
        pending = None
        for rows in plan:
            if self._dev is not None:
                ridx = jax.numpy.asarray(rows)
                nxt = {k: v[ridx] for k, v in self._dev.items()}
            else:
                nxt = self._put({k: v[rows] for k, v in self.data.items()})
            if pending is not None:
                yield pending
            pending = nxt
        if pending is not None:
            yield pending

    def __iter__(self):
        while True:
            yield from self.epoch()
