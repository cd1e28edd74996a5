"""Prefetching data pipeline: background collation double-buffer.

The reference leans on torch DataLoader worker processes; here a bounded
background thread keeps N collated batches ready while the TPU computes —
host collation (tokenize/pad/resize, now largely native C++) overlaps with
device steps instead of serializing with them.
"""

from __future__ import annotations

import queue
import threading


class PrefetchLoader:
    """Wraps any iterable-of-batches loader with a depth-N prefetch thread."""

    _END = object()

    def __init__(self, loader, depth: int = 2):
        self.loader = loader
        self.depth = depth

    def __len__(self):
        return len(self.loader)

    @property
    def dataset(self):
        return self.loader.dataset

    @property
    def batch_size(self):
        return self.loader.batch_size

    @property
    def epoch(self):
        return self.loader.epoch

    @epoch.setter
    def epoch(self, value):
        # resume path (train/loop.py) restores the shuffle epoch counter
        self.loader.epoch = value

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        err: list[BaseException] = []
        stop = threading.Event()

        def producer():
            try:
                for batch in self.loader:
                    # bounded put so an ABANDONED consumer (break / zip
                    # stopping early / an exception upstream) releases this
                    # thread instead of parking it on a full queue forever
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:  # surfaced in the consumer
                err.append(e)
            finally:
                while True:
                    try:
                        q.put(self._END, timeout=0.1)
                        break
                    except queue.Full:
                        if stop.is_set():
                            break

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is self._END:
                    if err:
                        raise err[0]
                    return
                yield item
        finally:
            stop.set()
