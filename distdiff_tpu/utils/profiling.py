"""First-class profiling/tracing (SURVEY §5: the reference has only
wall-clock meters — ``AverageMeter`` timing and tqdm bars; we add
``jax.profiler`` trace capture and a phase timer that reports a breakdown).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


class PhaseTimer:
    """Accumulates wall-clock per named phase; device-synchronizing."""

    def __init__(self, sync: bool = True):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.sync = sync

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                try:
                    jax.effects_barrier()
                except Exception:
                    pass
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        total = sum(self.totals.values()) or 1.0
        lines = []
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            lines.append(
                f"{name:<24s} {t:8.3f}s {100 * t / total:5.1f}% "
                f"({self.counts[name]}x, {t / max(self.counts[name], 1):.4f}s avg)"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace (viewable in TensorBoard / Perfetto)
    when ``log_dir`` is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, int]:
    """Per-device memory stats where the backend exposes them (the TPU
    analogue of the reference's unused CUDA peak-memory printer,
    ``utils/utils.py:16-18``)."""
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            continue
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use", -1),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use", -1),
            }
    return out
