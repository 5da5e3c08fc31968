"""Background prefetch: host batcher -> device, double-buffered.

TPU-native replacement for the reference's feeder-thread + tf.FIFOQueue
(reference: datasets/datafeeder_tacotron.py:142-149): a daemon thread keeps a
small queue of batches already transferred to device (optionally sharded over
a mesh's data axis), so the train step never waits on host I/O.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Optional

import jax


class DevicePrefetcher:
    def __init__(self, batcher, put_fn: Optional[Callable[[Any], Any]] = None,
                 buffer_size: int = 2):
        """``put_fn`` maps a host batch to device arrays; default
        ``jax.device_put``.  For sharded training pass a function applying
        ``jax.device_put(x, NamedSharding(mesh, spec))``."""
        self._batcher = batcher
        self._put = put_fn or jax.device_put
        self._queue: "queue.Queue" = queue.Queue(maxsize=buffer_size)
        self._error: Optional[BaseException] = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            for batch in self._batcher:
                if self._stop.is_set():
                    return
                self._queue.put(self._put(batch))
        except BaseException as e:  # propagate into the consumer
            self._error = e
            self._queue.put(None)

    def __iter__(self) -> Iterator[Any]:
        return self

    def __next__(self):
        item = self._queue.get()
        if item is None and self._error is not None:
            raise self._error
        return item

    def stop(self):
        self._stop.set()
        # drain so the producer can exit
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
