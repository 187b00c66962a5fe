"""Error-path handling — reference A11 (Deduplicator.java:61-65,
Main.java:25-29): on a handler exception the reference flushes the
stats once, logs, and tears the app down.

Spark shape: a StreamingQueryListener observes every query; on a
terminated-with-exception event it invokes a flush callback (last
chance to emit/alert on the final stats) and records the failure.
Progress events also surface per-batch row counts — the operational
visibility the reference got from its scheduler logging.
"""

from __future__ import annotations

import logging
from collections.abc import Callable

from pyspark.sql.streaming import StreamingQueryListener

logger = logging.getLogger(__name__)


class DedupQueryListener(StreamingQueryListener):
    """Collects per-query progress and fires ``on_failure`` exactly once
    when a query dies with an exception (the A11 flush hook)."""

    def __init__(self, on_failure: Callable[[str, str], None] | None = None):
        self.progress: dict[str, list] = {}
        self.failures: dict[str, str] = {}
        self._on_failure = on_failure

    def onQueryStarted(self, event) -> None:
        self.progress.setdefault(str(event.id), [])

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.progress.setdefault(str(p.id), []).append(
            {"batchId": p.batchId, "numInputRows": p.numInputRows}
        )

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        if event.exception is not None:
            qid = str(event.id)
            self.failures[qid] = str(event.exception)
            logger.error("streaming query %s failed: %s", qid, event.exception)
            if self._on_failure:
                self._on_failure(qid, str(event.exception))
