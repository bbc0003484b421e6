"""Host->device streaming for datasets larger than HBM.

The reference's `para_load` machinery (reference src/trainer/
nettrainer.py:701-723, 630-655) runs a loader process that stages the next
data chunk into shared memory while the GPU trains.  The TPU equivalent:
a background thread that calls `jax.device_put` on the next chunk while
the current one computes — XLA transfers overlap compute natively, so a
single-slot double buffer suffices.

For datasets that *do* fit in HBM (all three reference datasets), prefer
TrainData device residency (train/trainer.py) — zero per-step host work.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax


class DevicePrefetcher:
    """Wraps a host-batch iterator; keeps `depth` batches in flight on
    device."""

    def __init__(self, host_iter: Iterator, depth: int = 2, device=None):
        """device: a Device/Sharding for jax.device_put, or a callable
        batch -> staged batch (e.g. a mesh-sharded placement for the
        distributed trainer)."""
        self._host_iter = host_iter
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._device = device
        self._done = object()
        self._error: Optional[BaseException] = None
        self._finished = False
        self._closed = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _put(self, item) -> bool:
        """Bounded put that gives up when the consumer closed us — a
        worker blocked forever in q.put would otherwise pin the staged
        device chunks for the life of the process after an abandoned
        iteration (e.g. fit_streamed raising on a NaN cost)."""
        while not self._closed.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _worker(self):
        # A worker failure must NOT look like clean end-of-data to the
        # consumer: a swallowed MemoryError/transfer error would end the
        # epoch loop early and report a half-trained run as success.  The
        # exception is carried across the thread and re-raised in
        # __next__.
        try:
            for batch in self._host_iter:
                if self._closed.is_set():
                    return
                if callable(self._device):
                    staged = self._device(batch)
                else:
                    staged = jax.device_put(batch, self._device)
                if not self._put(staged):
                    return
        except BaseException as exc:  # noqa: BLE001 - re-raised consumer-side
            self._error = exc
        finally:
            self._put(self._done)

    def close(self):
        """Release the worker and any staged batches (idempotent).  Safe
        to call from a finally around a training loop that may abandon
        iteration early."""
        self._closed.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)
        # an in-flight put racing the drain above can land one more item
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def __iter__(self):
        return self

    def __next__(self):
        # the _done sentinel is consumed exactly once; without this flag a
        # second pass over an exhausted (or closed) iterator would block
        # forever in q.get on a permanently empty queue
        if self._finished or self._closed.is_set():
            raise StopIteration
        item = self._q.get()
        if item is self._done:
            self._finished = True
            if self._error is not None:
                raise RuntimeError(
                    "DevicePrefetcher worker failed"
                ) from self._error
            raise StopIteration
        return item


def aligned_epoch_indices(rng, n: int, batch_size: int):
    """One epoch's sample indices with the reference's alignData tail
    semantics (nettrainer.py:365-413): a fresh permutation of all n
    samples, the last incomplete minibatch padded to batch_size with
    seeded-random repeats — `RandomState(n)`, the reference's pad_random
    seeding quirk (same pad every epoch, "otherwise labels and data mix
    up") — so EVERY frame trains EVERY epoch and shapes stay static.

    Consumes exactly one rng.permutation(n) (resume fast-forwards stay
    in sync).  Returns (ceil(n / batch_size) * batch_size,) indices."""
    import numpy as np

    perm = rng.permutation(n)
    rem = n % batch_size
    if rem == 0:
        return perm
    pad = np.random.RandomState(n).randint(0, n, size=batch_size - rem)
    return np.concatenate([perm, pad])


def chunked_epochs(
    arrays: dict,
    batch_size: int,
    n_epochs: int,
    seed: int = 23455,
):
    """Host-side batch generator over a dict of co-indexed numpy arrays,
    reshuffled per epoch (the macro-batch replacement).  The tail batch
    is alignData-padded (aligned_epoch_indices), never dropped."""
    import numpy as np

    n = next(iter(arrays.values())).shape[0]
    rng = np.random.default_rng(seed)
    for _ in range(n_epochs):
        idx_all = aligned_epoch_indices(rng, n, batch_size)
        for s in range(0, idx_all.shape[0], batch_size):
            idx = idx_all[s : s + batch_size]
            yield {k: v[idx] for k, v in arrays.items()}


def macro_chunks(
    arrays: dict,
    batch_size: int,
    n_epochs: int,
    chunk_steps: int,
    seed: int = 23455,
    start_epoch: int = 0,
    segment_steps: int = 0,
):
    """Macro-batch generator: (k, batch, ...) stacks of `chunk_steps`
    minibatches per yield — the TPU analog of the reference's macro
    batches (nettrainer.py:489-599): one host->device transfer and one
    dispatch then cover k training steps (a lax.scan inside the jit).

    Batches are EXACTLY chunked_epochs' batches in the same order (same
    seed -> same permutations), just stacked: chunks never straddle an
    epoch, and a short epoch tail yields a smaller final chunk (so at
    most two distinct chunk shapes compile).

    segment_steps > 0 additionally keeps chunks from straddling multiples
    of that step count inside the epoch — fit_streamed's sub-epoch
    validation boundaries (reference validation_frequency,
    nettrainer.py:859-889) — at the cost of at most two more compiled
    chunk shapes.  The BATCH stream is unchanged.

    start_epoch > 0 (resume) burns the already-consumed permutations so
    the remaining epochs see the streams an uninterrupted run would."""
    import numpy as np

    n = next(iter(arrays.values())).shape[0]
    steps = -(-n // batch_size)  # tail batch alignData-padded, not dropped
    rng = np.random.default_rng(seed)
    for _ in range(start_epoch):
        rng.permutation(n)
    for _ in range(start_epoch, n_epochs):
        perm = aligned_epoch_indices(rng, n, batch_size)
        s0 = 0
        while s0 < steps:
            k = min(chunk_steps, steps - s0)
            if segment_steps > 0:
                boundary = ((s0 // segment_steps) + 1) * segment_steps
                k = min(k, boundary - s0)
            idx = perm[s0 * batch_size : (s0 + k) * batch_size]
            yield {
                key: v[idx].reshape((k, batch_size) + v.shape[1:])
                for key, v in arrays.items()
            }
            s0 += k
