"""In-engine linear-classifier training as relational iterations.

The quality filters real pretraining pipelines run (CCNet's LM filter,
fastText lang-ID, quality classifiers a la GPT-3/LLaMA data curation) are
linear models over hashed bag-of-token features. Training one *inside* the
engine — instead of exporting a sample to sklearn — keeps the 100 TB corpus
where it is and makes the model a first-class, reproducible query result.

The trainer is the batch perceptron: ``w_{t+1} = w_t + sum over
misclassified docs of y*x``. Chosen over logistic regression deliberately:
every quantity (feature counts, margins ``y*(w·x)``, updates) is an exact
BIGINT, so the whole training trajectory is engine-portable bit-for-bit and
a DuckDB oracle can replay it by unrolled SQL — the same lattice discipline
as ops/clustering.py (k-means) and ops/graph.py (PageRank). No floats, no
learning-rate tuning, no RNG.

Shape per round (N docs, B buckets): margins = long features (N*avg_nnz
rows) joined to a BROADCAST weight table (B+1 rows) -> groupBy doc (map-side
combinable); update = features of misclassified docs -> groupBy bucket (<=
B+1 rows out). Two bounded shuffles per round; weights are
localCheckpoint'ed so lineage stays flat across rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apollo_spark.ops.sketch import portable_hash60


def hashed_token_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 32,
    salt: str = "feat",
) -> DataFrame:
    """Long-format hashed bag-of-tokens: ``(id, b, n)`` with integer counts
    of whitespace tokens md5-hashed into ``buckets`` buckets, plus the
    constant bias feature at bucket index ``buckets`` (n=1 for every doc,
    including token-less ones). Hashing-trick features (Weinberger et al.
    2009) — dimensionality is fixed up front, so the weight table is
    broadcastable no matter the vocabulary."""
    from apollo_spark.ops.corpus import whitespace_tokens

    toks = df.select(
        F.col(id_col), F.explode(whitespace_tokens(F.lower(F.col(text_col)))).alias("__t")
    )
    counts = (
        toks.select(id_col, (portable_hash60(F.col("__t"), salt) % F.lit(buckets)).cast("int").alias("b"))
        .groupBy(id_col, "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bias = df.select(F.col(id_col), F.lit(buckets).cast("int").alias("b"), F.lit(1).cast("long").alias("n"))
    return counts.unionByName(bias)


def perceptron_train(
    feats: DataFrame,
    labels: DataFrame,
    iters: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """``iters`` batch-perceptron rounds from ``w = 0``; returns the final
    weight table ``(b, weight)`` (one row per bucket that appears in
    ``feats``).

    ``labels`` must be ``(id_col, y)`` with y in {+1, -1}. A doc is
    misclassified when ``y * (w·x) <= 0`` (zero counts as wrong, so round 1
    from the zero vector updates on every doc — the standard convention).
    All arithmetic BIGINT; see module docstring for the per-round shuffle
    shape."""
    fx = feats.join(labels, id_col)  # (id, b, n, y)
    w = fx.select("b").distinct().withColumn("weight", F.lit(0).cast("long"))
    for _ in range(iters):
        margins = (
            fx.join(F.broadcast(w), "b")
            .groupBy(id_col, "y")
            .agg(F.sum(F.col("n") * F.col("weight")).alias("__wx"))
            .withColumn("__margin", F.col("y") * F.col("__wx"))
        )
        wrong = margins.filter(F.col("__margin") <= 0).select(id_col)
        delta = (
            fx.join(wrong, id_col)
            .groupBy("b")
            .agg(F.sum(F.col("y") * F.col("n")).alias("__dw"))
        )
        w = (
            w.join(delta, "b", "left")
            .select("b", (F.col("weight") + F.coalesce("__dw", F.lit(0))).alias("weight"))
            .localCheckpoint(eager=True)  # flat lineage across rounds
        )
    return w


def classifier_margins(
    feats: DataFrame, weights: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Score docs with a trained weight table: ``(id, score)`` where
    ``score = w·x`` (exact BIGINT). Broadcast weights; one map-side
    combinable groupBy — the inference path a 100 TB quality-filter sweep
    runs."""
    return (
        feats.join(F.broadcast(weights), "b")
        .groupBy(id_col)
        .agg(F.sum(F.col("n") * F.col("weight")).alias("score"))
    )
