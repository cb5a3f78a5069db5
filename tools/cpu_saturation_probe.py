"""Hardware saturation probe: how much slower does ONE core get as more
cores go busy? Pure-Python spin loops (no Spark, no IO, no shared state),
one process per core level; prints one JSON line.

Why this exists: scaling efficiency measured at local[N] vs local[4N] on a
single box conflates ENGINE scalability with HARDWARE saturation — turbo
clocking and shared L3/memory bandwidth slow every core down as the socket
fills. Measured here (2026-08-16): identical work per task costs 4.43 s
with 8 busy cores but 5.67 s with 32 busy — a 0.78 per-core ceiling for
8→32 CPU-bound scaling BEFORE any framework overhead. A real 4N-executor
cluster adds machines instead of saturating one socket and does not pay
this. The scaling harness therefore defaults to 4→16 cores (the task's
"N and 4N cores" form), where the probe shows a ~2% per-core penalty, and
records this probe's numbers next to the result.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time


def spin(n: int) -> float:
    t0 = time.time()
    x = 0
    for i in range(n):
        x = (x * 1103 + i) % 2147483647
    return time.time() - t0


def bench(procs: int, n: int = 30_000_000) -> float:
    with mp.Pool(procs) as p:
        times = p.map(spin, [n] * procs)
    return sum(times) / len(times)


def main():
    levels = (1, 4, 8, 16, 32)
    out = {str(p): round(bench(p), 3) for p in levels}
    base = out["1"]
    print(
        json.dumps(
            {
                "probe": "per-task seconds for identical pure-CPU work, by busy-core count",
                "per_task_s": out,
                "per_core_slowdown_vs_1": {
                    k: round(v / base, 3) for k, v in out.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
