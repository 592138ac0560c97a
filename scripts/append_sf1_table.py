"""Append the per-query sf1 superlinearity table to BASELINE.md from a
completed sf1 bench JSON (making SURVEY.md's claim true — VERDICT r4 item 1).

Usage: python scripts/append_sf1_table.py /tmp/bench_sf1_r5.json [BASELINE.md]

Each row records sf1 seconds and the growth ratio vs the sf0.1 per-query
minimum (same parser as scripts/analyze_sf1.py: last `| query | sec |` row
per query wins). Ratio classification at 10x data: <=12x linear, <=30x
sort-ish/log factor, >30x adjudicate (either documented-inherent or a bug).
"""

from __future__ import annotations

import json
import sys

from analyze_sf1 import baseline_minimums


def _load_bench_json(path: str) -> dict:
    """Tolerate capture files where Spark/JVM stderr lines are mixed in
    (``2>&1``): the bench's record is the last line that parses as a JSON
    object with a 'queries' key."""
    with open(path) as f:
        lines = [ln for ln in f if ln.lstrip().startswith("{")]
    for ln in reversed(lines):
        try:
            d = json.loads(ln)
        except json.JSONDecodeError:
            continue
        if isinstance(d, dict) and "queries" in d:
            return d
    raise SystemExit(f"{path}: no bench JSON line found (expected a line with a 'queries' key)")


def main() -> None:
    sf1 = _load_bench_json(sys.argv[1])
    ref_path = sys.argv[2] if len(sys.argv) > 2 else "BASELINE.md"
    q1 = sf1["queries"]
    q0 = baseline_minimums(ref_path)
    rows = []
    for name in sorted(q1):
        t1 = q1[name]
        t0 = q0.get(name)
        ratio = f"{t1 / t0:.1f}" if t0 else "—"
        rows.append(f"| {name} | {t1:.2f} | {ratio} |")
    lines = [
        "",
        "## sf1 superlinearity sweep (round 5)",
        "",
        f"Full registry at sf1 (`scripts/make_sf1.py` corpus: 6 M lineitem / 1.5 M",
        f"orders / 50 k docs ×10-replica vocabulary-bijection, ~10× sf0.1 rows),",
        f"`local[{sf1.get('cpus', '?')}]`, single sample (SPARK_GRAFT_BENCH_REPEATS=1),",
        "host-sized driver memory. `ratio` = sf1 sec / sf0.1 per-query minimum from",
        "the table above; at 10× data, ≤12× is linear, ≤30× carries a log/sort",
        "factor, >30× is adjudicated in prose below the table.",
        "",
        "| query | sf1 sec | ratio vs sf0.1 min |",
        "|---|---|---|",
        *rows,
        "",
    ]
    errs = sf1.get("errors", {})
    if errs:
        lines.append(f"Errors at sf1: {sorted(errs)}")
        lines.append("")
    with open(ref_path, "a") as f:
        f.write("\n".join(lines))
    print(f"appended {len(rows)} rows to {ref_path}; errors: {len(errs)}")


if __name__ == "__main__":
    main()
