"""Background host->device prefetch.

The reference hides input latency behind 16 DataLoader worker processes
(dataset.py:283).  Here the host loader is cheap (uint8 slicing from a
RAM cache) but the decode + H2D transfer still serializes with the train
step if done inline.  ``prefetch_to_device`` moves batch assembly and the
sharded device_put onto a background thread with a small queue, so the
device transfer of batch N+k overlaps the compute of batch N — the
JAX-native equivalent of DataLoader prefetching + CUDA streams.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

import numpy as np

from torchsr_tpu.parallel.mesh import put_batch, put_stacked_batch

_SENTINEL = object()


def prefetch_to_device(
    iterator: Iterable, mesh, size: int = 2
) -> Iterator:
    """Yield device-resident (sharded) batches, prefetched ``size`` deep.

    Each item from ``iterator`` must be a tuple of host arrays; they are
    transferred with batch-dim sharding over ``mesh``.  Exceptions from
    the producer propagate to the consumer.
    """
    q: queue.Queue = queue.Queue(maxsize=size)

    def producer() -> None:
        try:
            for item in iterator:
                q.put(put_batch(tuple(item), mesh))
        except BaseException as exc:  # propagate to consumer
            q.put(exc)
            return
        q.put(_SENTINEL)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()

    while True:
        item = q.get()
        if item is _SENTINEL:
            break
        if isinstance(item, BaseException):
            raise item
        yield item


def prefetch_to_device_stacked(
    iterator: Iterable, mesh, steps_per_call: int, size: int = 2
) -> Iterator:
    """Yield device batches grouped for the multi-step scan programs.

    Full groups of ``steps_per_call`` host batches are stacked on a new
    leading step axis and transferred once (sharded on the batch axis),
    yielding ``("multi", stacked_tuple)``; the epoch's ragged tail
    (fewer than ``steps_per_call`` batches left) is yielded per-batch as
    ``("single", batch_tuple)`` so the single-step jit handles it — a
    short tail must NOT trigger a separate trace of the scan program
    per distinct remainder length.

    ``steps_per_call <= 1`` disables fusion entirely: every batch is
    yielded as ``("single", ...)`` (no stacked axis, no scan-of-1
    program), which is the documented ``--steps-per-call 1`` baseline.
    """
    q: queue.Queue = queue.Queue(maxsize=size)

    def producer() -> None:
        try:
            buf: list[tuple] = []
            for item in iterator:
                buf.append(tuple(item))
                if len(buf) == steps_per_call and steps_per_call > 1:
                    stacked = tuple(
                        np.stack([b[i] for b in buf])
                        for i in range(len(buf[0]))
                    )
                    q.put(("multi", put_stacked_batch(stacked, mesh)))
                    buf = []
            for b in buf:
                q.put(("single", put_batch(b, mesh)))
        except BaseException as exc:  # propagate to consumer
            q.put(exc)
            return
        q.put(_SENTINEL)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()

    while True:
        item = q.get()
        if item is _SENTINEL:
            break
        if isinstance(item, BaseException):
            raise item
        yield item
