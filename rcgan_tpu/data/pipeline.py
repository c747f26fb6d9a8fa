"""Host input pipeline utilities: background prefetching so batch assembly
(native gathers + host→device transfer) overlaps device compute — the
replacement for the reference's synchronous feed_dict stalls
(every ``sess.run`` copied images + 4-5 label tensors host→device,
SURVEY §3 "process→GPU boundary")."""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator


class Prefetcher:
    """Wrap an iterator; a daemon thread keeps ``depth`` items ready."""

    _DONE = object()

    def __init__(self, it: Iterable, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err = None

        def worker():
            try:
                for item in it:
                    self._q.put(item)
            except BaseException as e:  # propagate into consumer
                self._err = e
            finally:
                self._q.put(self._DONE)

        self._t = threading.Thread(target=worker, daemon=True)
        self._t.start()

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._DONE:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


def device_put_prefetch(it: Iterable, sharding=None, depth: int = 2):
    """Prefetch + eager device_put: batches land on device (optionally
    sharded) before the training loop asks for them."""
    import jax

    def gen():
        for item in it:
            if sharding is None:
                yield jax.tree_util.tree_map(jax.device_put, item)
            else:
                yield jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), item)

    return Prefetcher(gen(), depth=depth)
