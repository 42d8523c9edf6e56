"""Background batch prefetching: overlap host batch assembly with device work.

The reference's train loop assembled each batch synchronously between
``sess.run`` calls (SURVEY.md §3.4 — np.load + pad on the critical path).
Here batch assembly (C++ pad/gather in data/native.py + label packing)
runs on a daemon thread ``depth`` batches ahead while the previous jitted
step executes on the TPU; the C++ assembler releases the GIL, so the
overlap is real. Exceptions from the producer re-raise at the consumer.
"""

from __future__ import annotations

import queue
import threading

_SENTINEL = object()


def prefetch(iterable, depth: int = 2):
    """Iterate ``iterable`` with up to ``depth`` items prepared ahead."""
    q: queue.Queue = queue.Queue(maxsize=max(depth, 1))
    errors: list[BaseException] = []

    def worker():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # re-raised on the consumer side
            errors.append(e)
        finally:
            q.put(_SENTINEL)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if errors:
                raise errors[0]
            return
        yield item
