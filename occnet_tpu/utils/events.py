"""Structured experiment-metric event stream.

The TPU-native replacement for the reference's TensorBoard logger hook
(`projects/configs/_base_/default_runtime.py:6-11`): one JSON object per
logging event appended to `<work_dir>/metrics.jsonl`, trivially plottable
(pandas.read_json(lines=True)) and greppable, with no event-file dependency.
The text logger remains alongside, like the reference's paired
Text+TensorBoard hooks.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class JsonlWriter:
    """Append-only JSONL metric writer; flushes per event so a killed run
    keeps every logged step (the crash-recovery property the reference gets
    from TensorBoard's event flushing)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a", buffering=1)

    def write(self, step: int, tag: str = "train",
              t: Optional[float] = None, **scalars):
        rec = {"ts": time.time() if t is None else t, "step": int(step),
               "tag": tag}
        for k, v in scalars.items():
            rec[k] = float(v) if hasattr(v, "__float__") else v
        self._f.write(json.dumps(rec) + "\n")

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
