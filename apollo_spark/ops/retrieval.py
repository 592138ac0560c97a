"""Hybrid retrieval: rank fusion across heterogeneous retrievers.

A production RAG / training-data curation stack rarely trusts one ranking:
lexical (BM25) and dense (embedding cosine) retrievers fail differently, and
the standard zero-tuning combiner is Reciprocal Rank Fusion (Cormack,
Clarke & Buettcher, SIGIR 2009): ``score(d) = sum_r 1 / (k + rank_r(d))``.

Engine-portable twist: contributions are the INTEGER ``scale // (k + rank)``
(floor division, default scale 1e9), so fused scores are exact integers —
summation order can't perturb them and a DuckDB oracle hash-matches the
fusion bit-for-bit. With scale=1e9 the floor loses < 1e-9·scale relative
resolution per term, far below the 1/(k+r) gaps RRF itself produces for any
rank list shorter than ~30k entries.

Scale shape: each ranking is already a top-N list (tiny); fusion is a union
+ one groupBy on the doc id — the shuffle carries at most ``sum_r N_r`` rows
no matter how large the underlying corpus was.  No reference counterpart
(apollo has no search tier; analytics delegated to Postgres,
/root/reference/ROADMAP.md:77).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RRF_SCALE = 1_000_000_000


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    scale: int = RRF_SCALE,
) -> DataFrame:
    """Fuse ranked lists into ``(id_col, rrf_score, n_lists)``.

    Each input must carry ``id_col`` and a 1-based integer ``rank_col``.
    ``rrf_score = sum over lists of scale // (k + rank)`` (exact integer);
    ``n_lists`` counts how many retrievers surfaced the doc. Ties in the
    fused score are NOT broken here — order on (rrf_score desc, id) at the
    call site for a deterministic presentation.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    tagged = [
        r.select(F.col(id_col), F.col(rank_col).cast("long").alias("__rank")) for r in rankings
    ]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    contrib = F.expr(f"cast({scale} as bigint) div (cast({k} as bigint) + __rank)")
    return u.groupBy(id_col).agg(
        F.sum(contrib).alias("rrf_score"), F.count(F.lit(1)).alias("n_lists")
    )
