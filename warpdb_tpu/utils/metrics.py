"""Observability: per-query metrics, logging, and profiler hooks.

The reference's only observability was ``std::cout`` progress prints
(SURVEY.md §5).  Here every query records wall-clock, rows scanned,
bytes scanned and throughput into a bounded in-process history, the
``warpdb_tpu`` logger reports compile/cache events, and
``profile_trace`` wraps ``jax.profiler.trace`` for XLA-level traces
viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import logging
import threading
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Optional

logger = logging.getLogger("warpdb_tpu")

__all__ = ["QueryMetrics", "record", "history", "last", "timed_query",
           "profile_trace", "logger"]


@dataclass(frozen=True)
class QueryMetrics:
    query: str
    kind: str              # "expression" | "sql" | "sharded" | "streaming"
    wall_s: float
    rows: int
    bytes_scanned: int
    output_rows: int

    @property
    def rows_per_s(self) -> float:
        return self.rows / self.wall_s if self.wall_s > 0 else 0.0

    @property
    def gb_per_s(self) -> float:
        return self.bytes_scanned / self.wall_s / 1e9 if self.wall_s > 0 else 0.0


_lock = threading.Lock()
_history: deque = deque(maxlen=256)


def record(m: QueryMetrics) -> None:
    with _lock:
        _history.append(m)
    logger.debug(
        "query %r: %.3f ms, %.1fM rows/s, %.2f GB/s",
        m.query[:80], m.wall_s * 1e3, m.rows_per_s / 1e6, m.gb_per_s,
    )


def history() -> list:
    with _lock:
        return list(_history)


def last() -> Optional[QueryMetrics]:
    with _lock:
        return _history[-1] if _history else None


@contextlib.contextmanager
def timed_query(query: str, kind: str, rows: int, bytes_scanned: int):
    """Context manager recording one query execution."""
    t0 = time.perf_counter()
    out_rows = [0]
    try:
        yield out_rows
    finally:
        record(
            QueryMetrics(
                query=query,
                kind=kind,
                wall_s=time.perf_counter() - t0,
                rows=rows,
                bytes_scanned=bytes_scanned,
                output_rows=out_rows[0],
            )
        )


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """XLA-level profiler trace (view in TensorBoard / Perfetto)."""
    import jax

    with jax.profiler.trace(log_dir):
        yield
