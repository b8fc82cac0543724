"""Host-side batch pipeline: sampler + threaded prefetch feeding the mesh.

Replaces the reference's torch ``DataLoader`` + ``DistributedSampler`` stack
(``3d_ldm/utils.py:186-230``). On TPU there is one Python process per host;
replica sharding happens at ``jax.device_put`` time (see
:func:`ldm3d_tpu.parallel.shard_batch`), so the loader's jobs are just
(a) seeded per-epoch shuffling, (b) drop-last batching for uniform shapes,
(c) overlap of host IO with device compute via a small prefetch queue,
(d) per-host slicing when running multi-host.
"""

from __future__ import annotations

import itertools
import queue
import threading
from collections import deque
from typing import Callable, Iterable, Iterator, Sequence

import numpy as np

__all__ = ["BatchLoader", "device_prefetch"]


def device_prefetch(
    batches: Iterable[dict],
    size: int = 2,
    placement: Callable | None = None,
) -> Iterator[dict]:
    """Keep ``size`` host batches in flight to the device ahead of the consumer.

    ``jax.device_put`` is asynchronous, so issuing batch i+1's transfer before
    the train step blocks on batch i overlaps host->device copies with device
    compute — the flax ``jax_utils.prefetch_to_device`` pattern, here for the
    single-process-per-host TPU runtime. ``placement`` maps a host batch dict
    to device arrays (default: plain ``device_put`` of every leaf; pass
    ``ldm3d_tpu.parallel.shard_batch`` partial for a mesh placement).
    """
    import jax

    put = placement or (lambda b: jax.tree_util.tree_map(jax.device_put, b))
    it = iter(batches)
    buf: deque = deque()
    for b in itertools.islice(it, max(1, size)):
        buf.append(put(b))
    while buf:
        nxt = buf.popleft()
        for b in itertools.islice(it, 1):
            buf.append(put(b))
        yield nxt


def _stack(samples: Sequence[dict]) -> dict:
    keys = samples[0].keys()
    out = {}
    for k in keys:
        arrs = [s[k] for s in samples]
        shapes = {a.shape for a in arrs}
        if len(shapes) > 1:
            # crops clamp to each volume's size (MONAI RandSpatialCrop
            # parity), so a dataset mixing volumes smaller than patch_size
            # yields per-sample shapes — name the real cause instead of
            # letting np.stack fail opaquely inside the prefetch worker
            raise ValueError(
                f"batch samples for '{k}' have mixed shapes {sorted(shapes)}: "
                "some source volumes are smaller than patch_size (crops clamp "
                "to the volume) — resample/pad the data or lower patch_size")
        out[k] = np.stack(arrs, axis=0)
    return out


class BatchLoader:
    """Iterates epoch batches with prefetch; one instance per dataset split."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        prefetch: int = 2,
        num_hosts: int = 1,
        host_id: int = 0,
        pad_partial: bool = False,
    ):
        """``batch_size`` is the GLOBAL batch; on a pod each host yields its
        ``batch_size / num_hosts`` shard (assembled into the global array by
        ``shard_batch`` / ``multihost.global_batch``). ``drop_last`` keeps
        uniform compiled batch shapes (reference ``utils.py:215``).
        ``pad_partial`` instead pads a trailing partial batch by repeating its
        last sample — used for small validation sets, where the reference's
        drop-last silently skipped validation entirely."""
        if batch_size <= 0:
            raise ValueError("batch_size must be positive")
        if batch_size % max(1, num_hosts):
            raise ValueError(f"global batch {batch_size} not divisible by {num_hosts} hosts")
        self.dataset = dataset
        self.batch_size = batch_size // max(1, num_hosts)
        self.shuffle = shuffle
        self.drop_last = drop_last and not pad_partial
        self.pad_partial = pad_partial
        self.seed = seed
        self.prefetch = max(1, prefetch)
        self.num_hosts = num_hosts
        self.host_id = host_id

    def steps_per_epoch(self) -> int:
        n = len(self.dataset) // self.num_hosts
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + epoch)
            rng.shuffle(idx)
        # contiguous per-host shard, DistributedSampler-style
        per_host = len(idx) // self.num_hosts
        if per_host == 0:
            raise ValueError("dataset smaller than host count")
        return idx[self.host_id * per_host : (self.host_id + 1) * per_host]

    def epoch(self, epoch: int) -> Iterator[dict]:
        """Yield stacked numpy batches for one epoch, prefetched on a thread."""
        if hasattr(self.dataset, "set_epoch_seed"):
            self.dataset.set_epoch_seed(self.seed + epoch)
        indices = self._epoch_indices(epoch)
        nb = len(indices) // self.batch_size if self.drop_last else (len(indices) + self.batch_size - 1) // self.batch_size
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        _SENTINEL = object()
        err: list[BaseException] = []
        stop = threading.Event()

        def _put(item) -> bool:
            """put() that gives up when the consumer abandoned the epoch —
            otherwise a mid-epoch break (e.g. SIGTERM preemption) would leave
            this thread blocked on a full queue forever."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for b in range(nb):
                    if stop.is_set():
                        return
                    chunk = indices[b * self.batch_size : (b + 1) * self.batch_size]
                    if len(chunk) == 0:
                        break
                    if self.pad_partial and len(chunk) < self.batch_size:
                        pad = np.full(self.batch_size - len(chunk), chunk[-1])
                        chunk = np.concatenate([chunk, pad])
                    if not _put(_stack([self.dataset[int(i)] for i in chunk])):
                        return
            except BaseException as e:  # propagate into consumer
                err.append(e)
            finally:
                _put(_SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _SENTINEL:
                    break
                yield item
            t.join()
            if err:
                raise err[0]
        finally:
            stop.set()
