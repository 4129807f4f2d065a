"""Batched iteration + double-buffered device prefetch.

The reference uses a single-process torch DataLoader whose __getitem__ decodes
PIL images per epoch (datasets.py:114-157). Here batches are cheap array
slices of the packed uint8 arrays; the uint8 -> float32/255 conversion happens
on device, and ``device_prefetch`` overlaps host slicing + H2D transfer with
TPU compute (the reference has no equivalent; its GPU idles during data prep).
"""

from __future__ import annotations

import collections
import threading
from typing import Dict, Iterator, Optional

import numpy as np

import jax
import jax.numpy as jnp

IMAGE_KEYS = ("visual", "tactile", "seg", "final_visual", "final_tactile")


SEQUENCE_KEYS = ("visual", "tactile", "pose", "avail", "shock", "seg")


class BatchLoader:
    """Slices packed per-sequence arrays into (B, T, ...) uint8/float batches.

    drop_last is always-on to match the reference DataLoader (datasets.py:49).

    ``frames`` limits how many leading frames of each sequence are shipped:
    seq_modeling and regression only ever consume frame 0 (the reference's
    ``[::seq_length]`` stride, problems.py:648), so ``frames=1`` cuts
    host->HBM transfer by T x with identical training semantics.

    ``skip`` drops whole fields from every batch (e.g. the seg masks when
    --mask-loss is off — they would be dead weight on the wire).

    The shuffle order of pass ``e`` is a pure function of ``(seed, e)`` (the
    DistributedSampler.set_epoch idiom), NOT of how many passes this process
    has iterated: a preempted run resumed from a checkpoint replays the
    interrupted epoch's exact batch order (train/loop.py preemption path),
    and multi-host processes stay in lockstep even if one is reconstructed.
    """

    def __init__(self, arrays: Dict[str, np.ndarray], batch_size: int,
                 shuffle: bool = True, drop_last: bool = True, seed: int = 0,
                 frames: Optional[int] = None, skip: tuple = (),
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        self.arrays = {k: v for k, v in arrays.items() if k not in skip}
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.frames = frames
        self.seed = seed
        self._epoch = 0
        n = next(iter(arrays.values())).shape[0]
        self.n_sequences = n
        # multi-process: every host runs the same seeded shuffle, so the
        # GLOBAL batch order is identical everywhere; host p materialises
        # only its contiguous row block of each global batch (the block
        # layout matches NamedSharding(P(('data',))) device order, asserted
        # by tests/test_train.py::TestMultiHostLoader)
        self.process_index = 0 if process_index is None else int(process_index)
        self.process_count = 1 if process_count is None else int(process_count)
        if self.process_count > 1 and batch_size % self.process_count:
            raise ValueError(
                f"global batch size {batch_size} must divide evenly across "
                f"{self.process_count} processes")

    def __len__(self):
        # number of GLOBAL batches (identical on every process)
        if self.drop_last:
            return self.n_sequences // self.batch_size
        return -(-self.n_sequences // self.batch_size)

    def set_epoch(self, epoch: int):
        """Pin the pass counter (e.g. after a checkpoint resume) so the next
        iteration shuffles with ``(seed, epoch)``."""
        self._epoch = int(epoch)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(self.n_sequences)
        if self.shuffle:
            np.random.default_rng([self.seed, self._epoch]).shuffle(order)
        self._epoch += 1
        nb = len(self)
        local = self.batch_size // self.process_count
        lo = self.process_index * local
        hi = lo + local
        for b in range(nb):
            idx = order[b * self.batch_size:(b + 1) * self.batch_size]
            if self.process_count > 1:
                idx = idx[lo:hi]
            out = {}
            for k, v in self.arrays.items():
                if self.frames is not None and k in SEQUENCE_KEYS:
                    # slice frames inside the gather so memmapped corpora
                    # only read the needed pages
                    out[k] = v[idx, : self.frames]
                else:
                    out[k] = v[idx]
            yield out


def to_device_batch(batch: Dict[str, np.ndarray], sharding=None):
    """uint8 images -> float32/255 (the ToTensor scaling, datasets.py:25),
    placed on device (optionally with a jax.sharding.Sharding).

    Under multi-process JAX (``jax.distributed.initialize`` before building
    the mesh; each host's BatchLoader constructed with
    ``process_index/process_count``), ``batch`` holds only this host's rows
    of the global batch: the global jax.Array is assembled with
    ``jax.make_array_from_process_local_data``, which places each local row
    block on this host's addressable devices — no cross-host data motion.
    """
    out = {}
    multiprocess = sharding is not None and jax.process_count() > 1
    for k, v in batch.items():
        if multiprocess:
            v = np.asarray(v)
            global_shape = (v.shape[0] * jax.process_count(),) + v.shape[1:]
            arr = jax.make_array_from_process_local_data(sharding, v,
                                                         global_shape)
        elif sharding is not None:
            arr = jnp.asarray(v, device=sharding)
        else:
            arr = jnp.asarray(v)
        if k in IMAGE_KEYS and np.asarray(v).dtype == np.uint8:
            arr = arr.astype(jnp.float32) / 255.0
        out[k] = arr
    return out


def device_prefetch(iterator, size: int = 2, sharding=None):
    """Double-buffered host->device pipeline.

    A background thread slices + enqueues device transfers ``size`` batches
    ahead, so the accelerator never waits on the host. This replaces the
    reference's synchronous ``.to(device)`` per field (problems.py:96-108).
    """
    queue: collections.deque = collections.deque()
    sem_space = threading.Semaphore(size)
    sem_ready = threading.Semaphore(0)
    done = object()

    def producer():
        try:
            for batch in iterator:
                sem_space.acquire()
                queue.append(to_device_batch(batch, sharding))
                sem_ready.release()
            sem_space.acquire()
            queue.append(done)
        except BaseException as e:  # propagate to the consumer, never hang it
            queue.append(e)
        sem_ready.release()

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        sem_ready.acquire()
        item = queue.popleft()
        sem_space.release()
        if item is done:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
