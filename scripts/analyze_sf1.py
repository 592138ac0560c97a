"""Compare an sf1 bench run against the sf0.1 per-query BASELINE minimums
and classify growth: with 10x data, a healthy distributed plan should cost
<= ~10x (linear) or ~10x·log10 (sort-ish); anything beyond ~30x is either
(a) inherent quadratic pair structure of the 31-word-vocabulary corpus
(lossless inverted-index candidates grow ~100x — expected, documented), or
(b) a real superlinearity to fix.

Usage: python scripts/analyze_sf1.py /tmp/bench_sf1.json [BASELINE.md]

The reference is the `| query | sec |` minimums table in BASELINE.md (last
occurrence per query wins, i.e. the most recent round's table).
"""

from __future__ import annotations

import json
import re
import sys


def baseline_minimums(path: str) -> dict[str, float]:
    mins: dict[str, float] = {}
    row = re.compile(r"^\|\s*([a-z0-9_]+)\s*\|\s*([0-9]+(?:\.[0-9]+)?)\s*\|\s*$")
    for line in open(path):
        m = row.match(line.strip())
        if m:
            mins[m.group(1)] = float(m.group(2))
    return mins


def main() -> None:
    sf1 = json.load(open(sys.argv[1]))
    ref_path = sys.argv[2] if len(sys.argv) > 2 else "BASELINE.md"
    q1 = sf1["queries"]
    q0 = baseline_minimums(ref_path)
    rows = []
    for name, t1 in q1.items():
        t0 = q0.get(name)
        if t0 is None or t0 <= 0:
            continue
        rows.append((t1 / t0, t0, t1, name))
    rows.sort(reverse=True)
    print(f"{'ratio':>8} {'sf0.1 s':>9} {'sf1 s':>9}  query")
    for r, t0, t1, name in rows:
        flag = " <== CHECK" if r > 30 and t1 > 5 else ""
        print(f"{r:8.1f} {t0:9.2f} {t1:9.2f}  {name}{flag}")
    n_bad = sum(1 for r, _, t1, _ in rows if r > 30 and t1 > 5)
    print(f"\n{len(rows)} compared; {n_bad} above 30x with sf1 > 5s")
    missing = sorted(set(q0) - set(q1))
    errs = sf1.get("errors", {})
    if errs:
        print("errors:", ", ".join(sorted(errs)))
    if missing:
        print("in baseline but not in sf1 run:", ", ".join(missing))


if __name__ == "__main__":
    main()
