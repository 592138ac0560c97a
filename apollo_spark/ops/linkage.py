"""Record-linkage / entity-resolution operators.

The reference engine has no linkage tier; this implements the deletion-
neighborhood (SymSpell-style, Garbe 2012 — public algorithm) candidate
generation that makes edit-distance joins feasible at corpus scale: two
strings within Levenshtein distance 1 NECESSARILY share a member of their
deletion-1 neighborhoods (delete the substituted position from both, or the
inserted char from the longer), so an equality join on variants finds every
candidate — no N^2 cross product, no per-row scan of a dictionary.

Completeness argument (why the candidate set is EXACT for max_dist=1):
* equal strings share the identity variant;
* substitution at position i: deleting i from both sides yields the same
  string;
* insertion/deletion: the longer string's deletion at the edit position IS
  the shorter string (whose identity variant is in its set).
False candidates exist (e.g. "ab"/"ba" share deletion variants at distance
2), so every candidate is re-scored with the exact levenshtein() — identical
builtin in Spark and DuckDB, which is what makes the op hash-gateable.

Scale shape: variants are O(total chars) rows; the join is keyed on the
variant string (hash-partitioned, never broadcast-scanned); per-variant
group sizes are bounded by the data's TRUE near-duplicate density, not by
vocabulary heat; the exact re-score touches candidates only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def delete1_variants(col: str) -> Column:
    """The deletion-1 neighborhood of a string column INCLUDING the string
    itself: [s, s minus char 1, s minus char 2, ...], deduplicated. Pure
    SQL-expression (substr arithmetic), replayed verbatim by DuckDB's
    list_transform. The empty string is guarded explicitly because Spark's
    sequence(1, 0) DESCENDS ([1, 0]) where DuckDB's generate_series(1, 0)
    is empty — without the CASE the engines would disagree on '' rows."""
    return F.expr(
        f"CASE WHEN length({col}) = 0 THEN array({col}) "
        f"ELSE array_union(array({col}), "
        f"transform(sequence(1, length({col})), "
        f"i -> concat(substr({col}, 1, i-1), substr({col}, i+1, length({col})-i)))) END"
    )


def _variants_long(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("s")
    ).select("id", "s", F.explode(delete1_variants("s")).alias("v"))


def fuzzy_dup_pairs(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "s",
    max_dist: int = 1,
    collapse_exact: bool = True,
) -> DataFrame:
    """All id-ordered pairs of rows whose ``text_col`` values are within
    Levenshtein distance ``max_dist`` (must be 1 — the deletion-1
    neighborhood is complete exactly for distance <= 1; larger radii need
    the O(L^2)-variant generalization this op intentionally does not grow).

    Returns (id_a, id_b, s_a, s_b, dist). Distance-0 pairs (distinct ids,
    identical text) are included — they share the identity variant.

    ``collapse_exact`` (default True — the production form) is the hot-NAME
    guard the round-9 skew rehearsal exists for: a name shared verbatim by
    m records makes every variant bucket hold m copies, so the variant
    self-join emits >= C(m,2) pairs — quadratic in the hottest name's
    count (the linkage analogue of the LSH mega-bucket). Collapsing
    identical strings to ONE representative (min id) before the
    neighborhood join and re-expanding exact groups as STAR pairs
    (rep -> member, dist 0) bounds the join at one row per DISTINCT string
    and the output at m-1 star edges per group: connected components —
    what linkage consumers (entity_golden_records, dedup) actually use —
    are IDENTICAL, only the redundant intra-clique pair enumeration is
    dropped. On all-distinct corpora (the gate fixtures) the output is
    bit-identical to the uncollapsed form; ``collapse_exact=False`` keeps
    the certified all-pairs semantics."""
    if max_dist != 1:
        raise ValueError(
            "fuzzy_dup_pairs implements the deletion-1 neighborhood: max_dist must be 1"
        )
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("s"))
    if not collapse_exact:
        v = _variants_long(base, "id", "s")
        a = v.select(F.col("id").alias("id_a"), F.col("s").alias("s_a"), "v")
        b = v.select(F.col("id").alias("id_b"), F.col("s").alias("s_b"), "v")
        return (
            a.join(b, "v")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "s_a", "s_b")
            .dropDuplicates(["id_a", "id_b"])
            .withColumn("dist", F.levenshtein("s_a", "s_b"))
            .filter(F.col("dist") <= max_dist)
        )
    reps = base.groupBy("s").agg(F.min("id").alias("id"), F.count(F.lit(1)).alias("__m"))
    stars = (
        base.join(reps.select("s", F.col("id").alias("id_a")), "s")
        .filter(F.col("id") != F.col("id_a"))
        .select(
            "id_a",
            F.col("id").alias("id_b"),
            F.col("s").alias("s_a"),
            F.col("s").alias("s_b"),
            F.lit(0).cast("int").alias("dist"),
        )
    )
    v = _variants_long(reps, "id", "s")
    a = v.select(F.col("id").alias("id_a"), F.col("s").alias("s_a"), "v")
    b = v.select(F.col("id").alias("id_b"), F.col("s").alias("s_b"), "v")
    rep_pairs = (
        a.join(b, "v")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "s_a", "s_b")
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("dist", F.levenshtein("s_a", "s_b"))
        .filter(F.col("dist") <= max_dist)
    )
    return rep_pairs.unionByName(stars.select("id_a", "id_b", "s_a", "s_b", F.col("dist")))


def fuzzy_left_match(
    left: DataFrame,
    right: DataFrame,
    left_id: str = "id",
    left_text: str = "s",
    right_id: str = "id",
    right_text: str = "s",
    max_dist: int = 1,
) -> DataFrame:
    """For every left row, its BEST right-side match within Levenshtein
    distance ``max_dist`` (=1): minimum (dist, right_id) — deterministic.
    Left rows with no match are absent (inner semantics; anti-join the ids
    for the rejects). The dictionary-correction / canonical-entity-lookup
    shape: both sides generate deletion variants, candidates come from one
    keyed equality join, and only candidates pay the exact re-score."""
    if max_dist != 1:
        raise ValueError("fuzzy_left_match: max_dist must be 1 (deletion-1 neighborhood)")
    lv = _variants_long(left, left_id, left_text).select(
        F.col("id").alias("l_id"), F.col("s").alias("l_s"), "v"
    )
    rv = _variants_long(right, right_id, right_text).select(
        F.col("id").alias("r_id"), F.col("s").alias("r_s"), "v"
    )
    cand = (
        lv.join(rv, "v")
        .select("l_id", "l_s", "r_id", "r_s")
        .dropDuplicates(["l_id", "r_id"])
        .withColumn("dist", F.levenshtein("l_s", "r_s"))
        .filter(F.col("dist") <= max_dist)
    )
    best = cand.groupBy("l_id").agg(F.min(F.struct("dist", "r_id")).alias("m"))
    return (
        best.select("l_id", F.col("m.dist").alias("dist"), F.col("m.r_id").alias("r_id"))
        .join(cand.select("l_id", "r_id", "l_s", "r_s"), ["l_id", "r_id"])
        .select(
            F.col("l_id").alias(f"{left_id}_left"),
            F.col("l_s").alias("left_text"),
            F.col("r_id").alias(f"{right_id}_right"),
            F.col("r_s").alias("right_text"),
            "dist",
        )
    )
