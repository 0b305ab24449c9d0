"""Training observability: metric history, JSONL logs, stdout summaries.

The reference's observability is print() lines and matplotlib dumps
(SURVEY.md §5). Here every epoch's metrics also land in a machine-readable
metrics.jsonl so runs can be compared and resumed."""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Dict, List, Optional


class MetricLogger:
    def __init__(self, log_dir: Optional[str] = None, name: str = "metrics"):
        self.history: Dict[str, List[float]] = defaultdict(list)
        self._path = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._path = os.path.join(log_dir, f"{name}.jsonl")

    def log(self, step: int, **metrics: float):
        rec = {"step": step, "time": time.time()}
        for k, v in metrics.items():
            v = float(v)
            self.history[k].append(v)
            rec[k] = v
        if self._path:
            with open(self._path, "a") as f:
                f.write(json.dumps(rec) + "\n")

    def summary(self, step: int, prefix: str = "") -> str:
        parts = [f"{k}={v[-1]:.4f}" for k, v in sorted(self.history.items()) if v]
        return f"{prefix}[{step}] " + " ".join(parts)
