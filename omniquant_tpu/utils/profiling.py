"""Profiling / tracing subsystem (net-new vs the reference, which had only
ad-hoc wall-clock + max_memory logging — SURVEY.md §5).

  * `phase(name)`: context manager accumulating wall-clock per phase, with a
    report() summary — the structured replacement for the reference's
    scattered time.time() calls.
  * `trace(dir)`: wraps jax.profiler.trace for on-TPU timeline capture
    viewable in TensorBoard/Perfetto.
  * `device_memory_stats()`: live/peak HBM per device where the backend
    exposes it (the torch.cuda.max_memory_allocated analog).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class Profiler:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = ["phase                          total_s   calls   mean_ms"]
        for name, total in sorted(
                self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(
                f"{name:<30} {total:8.2f} {n:7d} {total / n * 1e3:9.2f}")
        return "\n".join(lines)

    def as_dict(self):
        return {k: {"total_s": v, "calls": self.counts[k]}
                for k, v in self.totals.items()}


PROFILER = Profiler()
phase = PROFILER.phase


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler timeline capture around a code region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> dict:
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out
