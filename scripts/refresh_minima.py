"""Append a refreshed per-query sf0.1 minimums table to BASELINE.md from one
or more completed bench JSONs (VERDICT r4 item 5: rewritten/new queries had
stale or missing rows, so the 2x screen was measuring plans that no longer
exist). Per-query value = MIN across all given runs (each run itself already
min-of-SPARK_GRAFT_BENCH_REPEATS).

analyze_sf1.py's parser takes the LAST `| query | sec |` row per query, so
appending supersedes the old table without rewriting history.

Usage: python scripts/refresh_minima.py out.md run1.json [run2.json ...]
"""

from __future__ import annotations

import json
import os
import sys


def main() -> None:
    out_path = sys.argv[1]
    mins: dict[str, float] = {}
    n_runs = 0
    for path in sys.argv[2:]:
        d = None
        try:  # whole-file JSON (pretty-printed bench records)
            cand = json.load(open(path))
            if isinstance(cand, dict) and "queries" in cand:
                d = cand
        except json.JSONDecodeError:
            pass
        if d is None:  # JSONL / log with one bench line among others
            with open(path) as f:
                lines = [ln for ln in f if ln.lstrip().startswith("{")]
            for ln in reversed(lines):
                try:
                    cand = json.loads(ln)
                except json.JSONDecodeError:
                    continue
                if isinstance(cand, dict) and "queries" in cand:
                    d = cand
                    break
        if d is None:
            raise SystemExit(f"{path}: no bench JSON found (expected a 'queries' key)")
        n_runs += 1
        for name, t in d["queries"].items():
            mins[name] = min(mins.get(name, float("inf")), t)
    title = os.environ.get("MINIMA_TITLE", "Refreshed per-query minimums (sf0.1)")
    note = os.environ.get("MINIMA_NOTE", "")
    rows = [f"| {name} | {mins[name]:.2f} |" for name in sorted(mins)]
    lines = [
        "",
        f"## {title}",
        "",
        f"MIN per query across {n_runs} runs (each itself min-of-repeats,",
        "`local[32]`, quiet host). Supersedes earlier rows for the 2x screen",
        "(the sweep parser takes the LAST row per query).",
        *( [note, ""] if note else [""] ),
        "| query | sec |",
        "|---|---|",
        *rows,
        "",
    ]
    with open(out_path, "a") as f:
        f.write("\n".join(lines))
    print(f"appended {len(rows)} minima rows to {out_path}")


if __name__ == "__main__":
    main()
