"""Rate-limited progress heartbeat for long-running driver loops.

The reference logs periodic progress for per-record loops
(``omicidx_etl/log.py:187-259`` ``LogProgress``: every N items, with
rate/percent/elapsed). In a batch engine the unit of work is a BATCH
whose item count varies by orders of magnitude, so this version rate
limits by TIME (``min_interval_s``) instead of by count — a 2M-event
batch and a 2k-event batch both produce at most one line per interval,
and a stuck job goes visibly silent instead of flooding.

Durable metrics still belong in lineage (``lineage.py`` persists
per-commit rates); this is the ephemeral console heartbeat for an
operator watching a 40-minute ``mega_replay``/``replay_job`` run.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Any, Callable, TextIO


class LogProgress:
    """Heartbeat counter: ``update(n)`` per unit of work, one line per
    ``min_interval_s`` at most (plus always the first update and
    ``complete()``)."""

    def __init__(
        self,
        operation: str,
        total: "int | None" = None,
        min_interval_s: float = 5.0,
        stream: "TextIO | None" = None,
        clock: Callable[[], float] = time.monotonic,
        **extra: Any,
    ) -> None:
        self.operation = operation
        self.total = total
        self.min_interval_s = min_interval_s
        self.stream = stream if stream is not None else sys.stderr
        self.clock = clock
        self.extra = extra
        self.count = 0
        self.t0 = clock()
        self._last_emit: "float | None" = None
        self.lines_emitted = 0

    def _emit(self, label: str) -> None:
        now = self.clock()
        elapsed = max(now - self.t0, 1e-9)
        rec: dict[str, Any] = {
            "progress": self.operation,
            "status": label,
            "processed": self.count,
            "rate_per_sec": round(self.count / elapsed, 1),
            "elapsed_s": round(elapsed, 1),
        }
        if self.total:
            rec["total"] = self.total
            rec["percent"] = round(100.0 * self.count / self.total, 1)
        rec.update(self.extra)
        print(json.dumps(rec), file=self.stream)
        self.stream.flush()
        self._last_emit = now
        self.lines_emitted += 1

    def update(self, n: int = 1) -> None:
        self.count += n
        now = self.clock()
        if self._last_emit is None or now - self._last_emit >= self.min_interval_s:
            self._emit("running")

    def complete(self) -> None:
        self._emit("complete")
