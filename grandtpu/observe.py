"""Observability: profiler traces, step timing, metrics logging.

Fills the reference's tracing/metrics gap (SURVEY.md §5: wall-clock prints
only, C++ timings computed but never reported). Provides:

- ``profile_trace``: context manager around ``jax.profiler.trace`` (view in
  TensorBoard / xprof)
- ``StepTimer``: per-step latency + throughput (edges/s of the top-k
  aggregation, the training-side analogue of the BASELINE metric)
- ``MetricsLogger``: structured JSONL metrics stream
"""

from __future__ import annotations

import contextlib
import json
import os
import time


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """Capture a device trace for the enclosed block when log_dir is set."""
    if not log_dir:
        yield
        return
    import jax
    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield


class StepTimer:
    """Tracks per-step wall time and derived throughput."""

    def __init__(self, edges_per_step: int = 0):
        self.edges_per_step = edges_per_step
        self.times: list[float] = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        self.times.append(time.time() - self._t0)

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0

    @property
    def edges_per_s(self) -> float:
        return self.edges_per_step / self.mean if self.mean else 0.0

    def summary(self) -> dict:
        return {"batch_time_mean_s": self.mean,
                "batches": len(self.times),
                "train_edges_per_s": self.edges_per_s}


class MetricsLogger:
    """Append-only JSONL metrics file (no-op when path is None).

    Multi-process runs (world > 1 under ``jax.distributed``) write from
    rank 0 only: every rank computes identical metrics (the train state is
    replicated), so one writer keeps the JSONL free of duplicate and
    interleaved lines on a shared filesystem. Non-zero ranks construct a
    no-op logger."""

    def __init__(self, path: str | None):
        if path:
            import jax
            if jax.process_count() > 1 and jax.process_index() != 0:
                path = None   # rank-0-writes
        self.path = path
        self._fh = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a")

    def log(self, **fields):
        if self._fh is None:
            return
        fields.setdefault("ts", time.time())
        self._fh.write(json.dumps(fields) + "\n")
        self._fh.flush()

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None
