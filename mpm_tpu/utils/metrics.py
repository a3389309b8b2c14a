"""Structured metrics logging.

The reference's observability is GD.Print logging plus the debug-menu
overlay (SURVEY.md §5). Headless equivalent: JSONL metrics stream with
steps/sec as the first-class metric, consumable by any log pipeline.
"""

from __future__ import annotations

import json
import time
from typing import IO


class MetricsLogger:
    def __init__(self, path: str | None = None, stream: IO | None = None):
        self._f = open(path, "a") if path else stream
        self._t0 = time.time()

    def log(self, event: str, **fields):
        if self._f is None:
            return
        rec = {"t": round(time.time() - self._t0, 6), "event": event, **fields}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        if self._f is not None:
            self._f.close()
            self._f = None
