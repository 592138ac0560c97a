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
import sys


def main() -> None:
    out_path = sys.argv[1]
    mins: dict[str, float] = {}
    n_runs = 0
    for path in sys.argv[2:]:
        with open(path) as f:
            lines = [ln for ln in f if ln.lstrip().startswith("{")]
        d = None
        for ln in reversed(lines):
            try:
                cand = json.loads(ln)
            except json.JSONDecodeError:
                continue
            if isinstance(cand, dict) and "queries" in cand:
                d = cand
                break
        if d is None:
            raise SystemExit(f"{path}: no bench JSON line found (expected a 'queries' key)")
        n_runs += 1
        for name, t in d["queries"].items():
            mins[name] = min(mins.get(name, float("inf")), t)
    rows = [f"| {name} | {mins[name]:.2f} |" for name in sorted(mins)]
    lines = [
        "",
        "## Round-5 refreshed per-query minimums (sf0.1)",
        "",
        f"MIN per query across {n_runs} full-registry runs (each min-of-3 repeats,",
        "`local[32]`, quiet host, post-whale settle in bench.py). Supersedes the",
        "table above for the 2x screen — the rewritten global-rank queries,",
        "doc_memorization_risk, the media codecs, and the round-5 additions",
        "(tfidf_capped_pairs, cdc_chunk_dedup) now have rows measuring the plans",
        "that actually exist.",
        "",
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
