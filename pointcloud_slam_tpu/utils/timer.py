"""Per-stage timing registry (host side).

Behavioral parity target: reference `src/jueying_lio/include/utils.h:18-110`
(`Timer::Evaluate(lambda, name)`, `PrintAll`, `DumpIntoFile` CSV,
`GetMeanTime`) — the per-stage profile analyzed by `result/plot_*.py`.

On-device work is asynchronous; `evaluate` optionally blocks on the result so
the recorded wall time covers the device execution (pass block=False to time
dispatch only)."""

from __future__ import annotations

import time
from collections import defaultdict
from typing import Any, Callable, Dict, List

import jax


class Timer:
    """Static registry of named timing records (milliseconds)."""

    _records: Dict[str, List[float]] = defaultdict(list)

    @classmethod
    def evaluate(cls, fn: Callable[[], Any], name: str, block: bool = True):
        t0 = time.perf_counter()
        out = fn()
        if block:
            out = jax.block_until_ready(out)
        cls._records[name].append((time.perf_counter() - t0) * 1e3)
        return out

    @classmethod
    def record(cls, name: str, ms: float):
        cls._records[name].append(ms)

    @classmethod
    def mean(cls, name: str) -> float:
        r = cls._records.get(name, [])
        return sum(r) / len(r) if r else 0.0

    @classmethod
    def print_all(cls):
        print(f"{'stage':<40s} {'calls':>8s} {'mean ms':>10s} {'total ms':>10s}")
        for name, r in sorted(cls._records.items()):
            print(f"{name:<40s} {len(r):>8d} {sum(r) / len(r):>10.3f} {sum(r):>10.1f}")

    @classmethod
    def dump_into_file(cls, path: str):
        """CSV: one column per stage (utils.h DumpIntoFile layout)."""
        names = sorted(cls._records.keys())
        rows = max((len(cls._records[n]) for n in names), default=0)
        with open(path, "w") as f:
            f.write(",".join(names) + "\n")
            for i in range(rows):
                f.write(",".join(
                    f"{cls._records[n][i]:.4f}" if i < len(cls._records[n]) else "" for n in names
                ) + "\n")

    @classmethod
    def reset(cls):
        cls._records.clear()
