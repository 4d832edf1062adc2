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

from torchsr_tpu.parallel.mesh import put_batch

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
