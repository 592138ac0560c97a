"""Tag the host's measurement window before/after a bench run.

Round-10 finding: this host's co-tenant interference shows up as MEMORY
BANDWIDTH collapse, not CPU steal — a cache-resident CPU loop stays fast
(so %steal and loadavg look clean) while large-working-set copies drop
from GB/s to ~0.2 GB/s, which is exactly the profile of Spark shuffle /
hash-aggregation work. A 36M-row DECIMAL(38,6) group-aggregate measured
4 s in a quiet window and 94-186 s in a degraded one ON IDENTICAL CODE;
job/stage counts were identical both times. Run this before and after any
timing sweep and record both lines next to the numbers.

Interpretation guide (this host): copy >= 4 GB/s = quiet; 1-4 GB/s =
usable with min-of-N; < 1 GB/s = walls are ambient-dominated, trust only
job/stage counts and interleaved A/B mins.
"""

from __future__ import annotations

import time


def cpu_loop() -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(20_000_000):
        x += i
    return time.perf_counter() - t0


def copy_bw() -> float:
    import numpy as np

    a = np.zeros(200_000_000 // 8, dtype=np.int64)  # 200 MB working set
    t0 = time.perf_counter()
    for _ in range(5):
        a.copy()
    return 5 * 2 * a.nbytes / (time.perf_counter() - t0) / 1e9


def main() -> None:
    print(f"cpu_loop_s={cpu_loop():.2f} copy_gbps={copy_bw():.2f}")


if __name__ == "__main__":
    main()
