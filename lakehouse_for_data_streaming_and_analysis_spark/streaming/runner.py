"""Multi-query runner with graceful shutdown (SURVEY.md §2.10 T8/T11).

The reference runs 4 concurrent streaming queries on daemon threads
under a FAIR pool and stops them on SIGINT/SIGTERM
(streaming_pipeline.py:54-76). Same contract here, minus the
thread-per-query indirection: StreamingQuery handles are already
async; we track and stop them.
"""

from __future__ import annotations

import signal
import threading
from collections.abc import Callable

from pyspark.sql.streaming import StreamingQuery


class StreamRunner:
    def __init__(self) -> None:
        self._queries: list[StreamingQuery] = []
        self._stop = threading.Event()

    def add(self, query: StreamingQuery) -> StreamingQuery:
        self._queries.append(query)
        return query

    def launch(self, *starters: Callable[[], StreamingQuery]) -> None:
        for s in starters:
            self.add(s())

    def install_signal_handlers(self) -> None:
        def _handler(signum, frame):
            self._stop.set()

        signal.signal(signal.SIGINT, _handler)
        signal.signal(signal.SIGTERM, _handler)

    def await_any_termination(self, timeout: float | None = None) -> None:
        """Block until stop is signalled or all queries end."""
        while not self._stop.is_set() and any(q.isActive for q in self._queries):
            self._stop.wait(1.0)
            if timeout is not None:
                timeout -= 1.0
                if timeout <= 0:
                    break
        self.stop_all()

    def process_all_available(self) -> None:
        """Drain every query (deterministic test barrier)."""
        for q in self._queries:
            q.processAllAvailable()

    def stop_all(self) -> None:
        for q in self._queries:
            if q.isActive:
                q.stop()
        for q in self._queries:
            q.awaitTermination(30)
