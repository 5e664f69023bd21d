"""Tracing / profiling utilities (SURVEY §5 auxiliary subsystems).

The reference's observability is print-based (imgs/s lines, epoch timers —
train_hard_kfold_v2.py:175-187); the durable record is JSON artifacts. The
TPU-native equivalents here:

- :func:`trace` — ``jax.profiler`` device trace of a code region, viewable
  in TensorBoard/Perfetto (captures XLA op timelines, HBM usage);
- :func:`annotate` — named region inside a trace (TraceAnnotation);
- :class:`StructuredLogger` — append-only JSONL metrics log, one record
  per event with wall-clock timestamp; the machine-readable replacement
  for the reference's emoji stdout banners. Trainers keep printing
  human-readable lines; anything that matters is ALSO written here.
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path


@contextlib.contextmanager
def trace(logdir: str | Path, *, create_perfetto_link: bool = False):
    """Capture a jax.profiler device trace for the enclosed region.

    Usage::

        with trace("logs/trace_preproc"):
            out = preprocess_batch(x)
            jax.block_until_ready(out)
    """
    import jax

    Path(logdir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(logdir), create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named sub-region annotation (shows up inside a :func:`trace`)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StructuredLogger:
    """Append-only JSONL metrics log.

    Each call to :meth:`log` writes one line:
    ``{"ts": <unix>, "event": <name>, ...fields}``. Safe to tail while a
    run is in flight; ``read()`` parses the full log back.
    """

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, event: str, **fields) -> None:
        rec = {"ts": round(time.time(), 3), "event": event}
        for k, v in fields.items():
            try:
                json.dumps(v)
                rec[k] = v
            except TypeError:
                rec[k] = str(v)
        with self.path.open("a") as f:
            f.write(json.dumps(rec) + "\n")

    def read(self) -> list[dict]:
        if not self.path.exists():
            return []
        return [
            json.loads(line)
            for line in self.path.read_text().splitlines()
            if line.strip()
        ]
