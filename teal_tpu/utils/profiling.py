"""Profiling + structured metrics (aux-subsystem parity, SURVEY §5).

The reference wraps its last sample in `torch.profiler` and exports a
chrome trace (`gpt-fast/generate.py:460-485`), and prints tokens/s + GB/s
(`:493-506`, with an assembled-but-never-written `debug_data` dict). Here:
`trace()` wraps any region in a `jax.profiler` trace viewable in
TensorBoard/XProf, and `write_metrics` actually persists the structured
run record the reference left dead.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional


@contextlib.contextmanager
def trace(trace_dir: Optional[str]):
    """jax.profiler trace context; no-op when trace_dir is falsy."""
    if not trace_dir:
        yield
        return
    import jax

    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        yield


def write_metrics(path: str, record: dict) -> None:
    """Append one JSON line of run metrics (timestamped)."""
    record = {"ts": time.time(), **record}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")


def device_memory_stats() -> dict:
    """Best-effort live/peak device memory (bytes)."""
    import jax

    try:
        stats = jax.devices()[0].memory_stats() or {}
        return {
            "bytes_in_use": stats.get("bytes_in_use"),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            "bytes_limit": stats.get("bytes_limit"),
        }
    except Exception:
        return {}
