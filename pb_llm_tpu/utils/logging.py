"""Structured JSONL metrics + host-0 logging.

The reference logs with bare print()s and an unused wandb flag
(`gptq_pb/run.py:269-271`, SURVEY.md §5.5); here every metric lands in one
JSONL stream that's easy to diff across runs.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Any, Optional


def is_host0() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:  # pragma: no cover
        return True


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, stream=None):
        self.path = path
        self.stream = stream if stream is not None else sys.stderr
        self._fh = None
        if path and is_host0():
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a")

    def log(self, event: str, **fields: Any) -> None:
        if not is_host0():
            return
        rec = {"ts": round(time.time(), 3), "event": event, **fields}
        line = json.dumps(rec)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self.stream:
            print(line, file=self.stream, flush=True)

    def close(self) -> None:
        if self._fh:
            self._fh.close()
            self._fh = None
