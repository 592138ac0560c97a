"""The reference's scalar function surface, Spark-side.

Apollo exposes exactly 7 functions + the ``now`` variable
(/root/reference/dsl/functions.go:16-103, dsl/schema.go:372). Semantics notes:

* ``parse_decimals(raw, d)`` divides by 10^d via big.Float and returns
  float64 (dsl/functions.go:26-43) -> we compute in DoubleType.
* ``format_date(layout, s)`` parses with a **Go reference layout**
  ("02-01-2006 15:04") and returns epoch seconds (dsl/functions.go:49-66).
* ``balance`` / ``token_balance`` are chain-context functions: evaluated at
  the row's (chain, block) (dsl/schema.go:186-188,
  chainservice/chainservice.go:244-291). In Spark they become enrichment
  joins against landed ``balances`` / ``token_metadata`` tables (see
  pipeline.py) — per-row RPC inside an expression does not scale.
"""

from __future__ import annotations

import math
import time

from pyspark.sql import Column
from pyspark.sql import functions as F

# ----------------------------------------------------------- Go date layouts

# Go reference-time components -> JDK DateTimeFormatter patterns.
# Ordered longest-first so greedy replacement is unambiguous.
_GO_LAYOUT_TABLE: list[tuple[str, str]] = [
    ("2006", "yyyy"),
    ("January", "MMMM"),
    ("Jan", "MMM"),
    ("Monday", "EEEE"),
    ("Mon", "EEE"),
    ("15", "HH"),
    ("01", "MM"),
    ("02", "dd"),
    ("03", "hh"),
    ("04", "mm"),
    ("05", "ss"),
    ("06", "yy"),
    (".000", ".SSS"),
    ("PM", "a"),
    ("pm", "a"),
    ("-0700", "Z"),
    ("-07:00", "XXX"),
    ("MST", "zzz"),
    ("Z07:00", "XXX"),
]

# The same table for Python strptime (driver-side constant folding).
_GO_TO_STRPTIME: list[tuple[str, str]] = [
    ("2006", "%Y"),
    ("January", "%B"),
    ("Jan", "%b"),
    ("Monday", "%A"),
    ("Mon", "%a"),
    ("15", "%H"),
    ("01", "%m"),
    ("02", "%d"),
    ("03", "%I"),
    ("04", "%M"),
    ("05", "%S"),
    ("06", "%y"),
    ("PM", "%p"),
    ("pm", "%p"),
    ("-0700", "%z"),
]


def _translate(layout: str, table: list[tuple[str, str]]) -> str:
    out: list[str] = []
    i = 0
    while i < len(layout):
        for go, py in table:
            if layout.startswith(go, i):
                out.append(py)
                i += len(go)
                break
        else:
            out.append(layout[i])
            i += 1
    return "".join(out)


def go_layout_to_java(layout: str) -> str:
    return _translate(layout, _GO_LAYOUT_TABLE)


def go_layout_to_strptime(layout: str) -> str:
    return _translate(layout, _GO_TO_STRPTIME)


def format_date_py(layout: str, value: str) -> int:
    """Driver-side format_date: Go layout -> epoch seconds (UTC),
    mirroring dsl/functions.go:49-66 (time.Parse + .Unix())."""
    import calendar
    import datetime as dt

    fmt = go_layout_to_strptime(layout)
    parsed = dt.datetime.strptime(value, fmt)
    if parsed.tzinfo is not None:
        return int(parsed.timestamp())
    return int(calendar.timegm(parsed.timetuple()))


# -------------------------------------------------------- Column-level funcs


def _as_col(v) -> Column:
    return v if isinstance(v, Column) else F.lit(v)


def parse_decimals(raw, decimals) -> Column:
    """raw / 10^decimals as double (reference returns float64,
    dsl/functions.go:33-42)."""
    return _as_col(raw).cast("double") / F.pow(F.lit(10.0), _as_col(decimals).cast("double"))


def format_date_col(layout, value) -> Column:
    """Column version of format_date; layout must be a literal string."""
    if isinstance(layout, Column):
        raise TypeError("format_date layout must be a literal string")
    return F.unix_timestamp(_as_col(value), go_layout_to_java(layout)).cast("long")


def now_epoch() -> int:
    """``now`` variable: epoch seconds at schema parse (dsl/schema.go:372)."""
    return int(time.time())


# Pure Column functions available in expressions. balance/token_balance are
# registered by the pipeline (enrichment joins) — see pipeline.py.
COLUMN_FUNCTIONS = {
    "upper": lambda s: F.upper(_as_col(s)),
    "lower": lambda s: F.lower(_as_col(s)),
    "abs": lambda n: F.abs(_as_col(n)),
    # v2 extension (not in the reference's 7): LONG floor — the bucketing
    # primitive quasi-identifier/binning blocks need (floor on Spark and
    # DuckDB both floor toward -inf, so buckets agree for negatives too)
    "floor": lambda n: F.floor(_as_col(n)),
    "parse_decimals": parse_decimals,
    "format_date": format_date_col,
}

# Driver-side (constant-folding) implementations for the same names.
CONST_FUNCTIONS = {
    "upper": lambda s: str(s).upper(),
    "lower": lambda s: str(s).lower(),
    "abs": lambda n: abs(n),
    "floor": lambda n: math.floor(n),
    "parse_decimals": lambda raw, d: float(raw) / (10.0 ** float(d)),
    "format_date": format_date_py,
}


# v2 aggregate-block functions (SURVEY §2.7/§7 step 8 — the relational tier
# apollo left on its roadmap, ROADMAP.md:77). Only legal inside `aggregate`
# blocks; the pipeline swaps these into the compiler's function table there.
# `sum`/`avg` accumulate in DECIMAL(38,6) and emit double so results are
# summation-order-independent (hash-stable against any SQL oracle).
AGG_FUNCTIONS = {
    "count": lambda *a: F.count(_as_col(a[0])) if a else F.count(F.lit(1)),
    "count_distinct": lambda *a: F.count_distinct(*[_as_col(x) for x in a]),
    "sum": lambda c: F.sum(_as_col(c).cast("decimal(38,6)")).cast("double"),
    "avg": lambda c: F.avg(_as_col(c).cast("decimal(38,6)")).cast("double"),
    "min": lambda c: F.min(_as_col(c)),
    "max": lambda c: F.max(_as_col(c)),
}

# window-block functions (only legal inside `window { ... }` blocks).
# Aggregates run over the running frame (unbounded preceding .. current
# row); ranking/offset functions use the bare ordered window (Spark
# rejects explicit frames for them).
WINDOW_FUNCTIONS = {
    # aggregates WITHOUT the trailing double-cast of AGG_FUNCTIONS: `.over`
    # must attach to the aggregate expression itself, so the result cast is
    # applied after the window wrap (WINDOW_RESULT_CAST)
    "count": lambda *a: F.count(_as_col(a[0])) if a else F.count(F.lit(1)),
    "sum": lambda c: F.sum(_as_col(c).cast("decimal(38,6)")),
    "avg": lambda c: F.avg(_as_col(c).cast("decimal(38,6)")),
    "min": lambda c: F.min(_as_col(c)),
    "max": lambda c: F.max(_as_col(c)),
    "row_number": lambda: F.row_number(),
    "rank": lambda: F.rank(),
    "dense_rank": lambda: F.dense_rank(),
    "lag": lambda c: F.lag(_as_col(c), 1),
    "lead": lambda c: F.lead(_as_col(c), 1),
}

# ranking/offset window functions: ordered window, NO explicit frame
WINDOW_RANKING = {"row_number", "rank", "dense_rank", "lag", "lead"}

# post-.over() result casts (decimal accumulate, double out — same
# convention as AGG_FUNCTIONS)
WINDOW_RESULT_CAST = {"sum": "double", "avg": "double"}

# sort-list helpers (only legal inside `sort = [...]`)
SORT_FUNCTIONS = {
    "desc": lambda c: _as_col(c).desc(),
    "asc": lambda c: _as_col(c).asc(),
}
