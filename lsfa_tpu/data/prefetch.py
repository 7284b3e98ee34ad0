"""Device-transfer prefetching: overlap host->device uploads with compute.

The role of the reference's MultiThreadPrefetchingIter
(lib/utils/PrefetchingIter.py) at the DEVICE boundary: jax.device_put is
asynchronous, so staging the next item's arrays while the current step
computes hides the (tunnel/PCIe) transfer entirely. A background thread
keeps `depth` items in flight.
"""

from __future__ import annotations

import queue
import threading

import jax


class DevicePrefetcher:
    """Wraps an iterator of pytrees-of-host-arrays; yields pytrees of
    device arrays, transferred `depth` items ahead."""

    def __init__(self, it, depth: int = 2, device=None, keys=None,
                 transfer: bool = False):
        """transfer=False (default) prefetches host-side only — the axon
        tunnel runtime faults when device_put overlaps in-flight compute,
        so device transfer stays on the consumer thread there. Set
        transfer=True on runtimes with safe async H2D."""
        self.it = iter(it)
        self.depth = depth
        self.device = device
        self.keys = keys          # optional: only device_put these dict keys
        self.transfer = transfer
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._done = object()
        self._thread = threading.Thread(target=self._pump, daemon=True)
        self._thread.start()

    def _put(self, item):
        if not self.transfer:
            return item
        if self.keys is None:
            return jax.tree.map(lambda x: jax.device_put(x, self.device), item)
        out = dict(item)
        for k in self.keys:
            if k in out:
                out[k] = jax.device_put(out[k], self.device)
        return out

    def _pump(self):
        try:
            for item in self.it:
                self._q.put(self._put(item))
        finally:
            self._q.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            raise StopIteration
        return item
