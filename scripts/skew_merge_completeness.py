"""Merge-completeness adjudication on the skew rehearsal (rounds 8-9).

On a boilerplate-skewed corpus the TRUTH near-dup set contains a quadratic
clique (short docs sharing the planted boilerplate line genuinely clear the
bigram-Jaccard threshold), so PAIR completeness is the wrong scale target:
a linear-candidate blocker mathematically cannot enumerate a quadratic
clique. What dedup actually consumes is CONNECTIVITY — components feed
keep-best / dup-mass / sample-weights — and the star-link in
_minhash_band_candidates exists precisely to keep clique members reachable
at linear cost.

This script measures that claim: merge completeness
    MC = (|V_truth| - n_components(caught edges)) / (|V_truth| - n_components(truth edges))
i.e. the fraction of the merges dedup needs that the blocker's verified
candidates achieve (1.0 = identical component partition over truth nodes).
Caught edges = truth edges surfaced as candidates, the same intersection
lsh_blocking_metrics counts for PC.

Round 9 adds the two levers the round-8 adjudication named:
  * the AUTOTUNED geometry (blocking_config_profile at the truth threshold
    picks r=1/b=32 with the menu's cap-1024 level-0 ladder allowance:
    analytic capture 0.9992 at j=0.2 vs r=2/b=16's 0.48);
  * the shingle-level boilerplate SCRUB (scrub_hot_shingles) — measured
    against the ORGANIC truth (the pre-skew corpus, same doc_ids), because
    scrub REDEFINES similarity to exclude boilerplate: boilerplate-only
    "dups" stop existing on both sides, and the check is that every
    organic near-dup merge survives. (A bigram-level "scrubbed truth" was
    measured and rejected: on the 40-word-vocab synthetic corpus the 0.04
    df-cap also removes common-word mass and the truth degenerates to
    414k pairs over rare-bigram remnants — recorded in BASELINE round-9.)

Usage: python scripts/skew_merge_completeness.py [sf_dir ...]
       (default: .data/sf1skew .data/sf3skew)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def measure(
    spark,
    sf_dir: str,
    max_bucket: int | None,
    mode: str,
    num_hashes: int = 32,
    bands: int = 16,
    scrub_frac: float | None = None,
    truth_dir: str | None = None,
    label: str | None = None,
) -> dict:
    """``truth_dir``: compute the truth pairs over a DIFFERENT corpus dir
    (same doc_ids). Used for the scrub adjudication: scrub REDEFINES
    similarity to exclude boilerplate, so the meaningful reference is the
    ORGANIC truth — the same documents before the boilerplate was planted
    (sf1skew docs = sf1 docs + appended line). A scrubbed blocker must
    still achieve the organic merges; boilerplate-only "dups" stop
    existing on both sides."""
    from apollo_spark.ops.cache import release_caches
    from apollo_spark.ops.dedup import (
        _minhash_band_candidates,
        _shingle_base,
        connected_components,
        ngram_jaccard_pairs,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    td = spark.read.parquet(f"{truth_dir or sf_dir}/documents.parquet")
    t0 = time.perf_counter()
    base = _shingle_base(d, "doc_id", "text", 3, scrub_frac).persist()
    cand, sig = _minhash_band_candidates(base, num_hashes, bands, max_bucket, mode)
    cand = cand.persist()
    truth = (
        ngram_jaccard_pairs(
            td,
            id_col="doc_id",
            text_col="text",
            n=2,
            threshold=0.2,
            max_df_frac=0.04,
        )
        .select("id_a", "id_b")
        .persist()
    )
    caught = truth.join(cand, ["id_a", "id_b"], "left_semi").persist()
    n_true, n_cand, n_caught = truth.count(), cand.count(), caught.count()

    tv = truth.select(F.col("id_a").alias("id")).unionByName(
        truth.select(F.col("id_b").alias("id"))
    ).distinct().persist()
    n_nodes = tv.count()
    # distinct components over the truth graph and the caught graph,
    # counting truth nodes the caught graph leaves untouched as singletons
    ct = connected_components(truth).select("comp").distinct().count()
    caught_cc = connected_components(caught)
    # nodes in truth but untouched by caught edges are singleton components
    covered = caught_cc.select(F.col("id")).distinct()
    n_isolated = tv.join(covered, "id", "left_anti").count()
    cc = caught_cc.select("comp").distinct().count() + n_isolated
    mc = (n_nodes - cc) / (n_nodes - ct) if n_nodes > ct else 1.0
    out = {
        "sf_dir": sf_dir,
        "mode": label or (mode if max_bucket is not None else "none"),
        "geometry": f"h{num_hashes}/b{bands}/r{num_hashes // bands}",
        "scrub": scrub_frac,
        "n_true": n_true,
        "n_cand": n_cand,
        "n_caught": n_caught,
        "pair_completeness": round(n_caught / n_true, 4) if n_true else None,
        "truth_nodes": n_nodes,
        "truth_components": ct,
        "caught_components": cc,
        "merge_completeness": round(mc, 4),
        "t_sec": round(time.perf_counter() - t0, 1),
    }
    for f in (base, cand, truth, caught, tv):
        f.unpersist()
    release_caches(cand)
    return out


CONFIGS = (
    # round-8 production row (fixed r=2/b=16 geometry, cap 64) — baseline
    dict(max_bucket=64, mode="reband", num_hashes=32, bands=16, label="r2b16-ladder64"),
    # round 9 production: the autotuned geometry at t=0.2 —
    # blocking_config_profile picks r=1/b=32 with the menu's level-0 cap
    # 1024 (r=1 selectivity is j, not j^r: informative buckets are larger)
    dict(max_bucket=1024, mode="reband", num_hashes=32, bands=32, label="autotune-r1b32-ladder1024"),
    # quadratic contrast: the same geometry uncapped
    dict(max_bucket=None, mode="reband", num_hashes=32, bands=32, label="r1b32-uncapped"),
    # the UNIFORM-order geometry (deep r=2 signatures) on the skew shape —
    # the measured reason boilerplate corpora keep r=1: truth-clique pairs
    # sit below r=2's reach even at b=128 (BASELINE round-9 #7)
    dict(max_bucket=64, mode="reband", num_hashes=256, bands=128, label="r2b128-ladder64"),
    # round 9 scrub adjudication: shingle scrub on the blocker, measured
    # against the ORGANIC truth (the pre-skew corpus) — boilerplate edge
    # mass disappears BEFORE banding and the organic merges must survive
    dict(
        max_bucket=1024,
        mode="reband",
        num_hashes=32,
        bands=32,
        scrub_frac=0.04,
        truth_dir="__organic__",
        label="autotune-r1b32-scrub-vs-organic",
    ),
)


def main() -> None:
    from apollo_spark.session import get_spark

    dirs = sys.argv[1:] or [".data/sf1skew", ".data/sf3skew"]
    spark = get_spark("skew_mc")
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in dirs:
        for cfg in CONFIGS:
            cfg = dict(cfg)
            if cfg.get("truth_dir") == "__organic__":
                cfg["truth_dir"] = sf_dir.replace("skew", "")
            r = measure(spark, sf_dir, **cfg)
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
