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

Shape (N docs, B buckets): the binary trainers fold the features into a
per-doc array form ONCE (one shuffle total) and hold the O(B) weight
vector on the driver between rounds, inlined per round as one array
literal — each round is a single job whose only shuffle output is <= B+1
delta rows (margins are exact integer array folds, updates combine
map-side). The multiclass trainer keeps the relational per-round shape:
features joined to a BROADCAST (K*(B+1))-row weight table -> groupBy doc,
update -> groupBy bucket, weights localCheckpoint'ed so lineage stays
flat across rounds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from apollo_spark.ops.cache import scoped_persist
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
    All arithmetic BIGINT, so the trajectory is bit-identical to the
    per-round broadcast-join formulation the DuckDB oracle unrolls.

    Shape: ONE shuffle total builds the per-doc array form ``(id, y, bs,
    ns)`` (persisted); the weight vector is MODEL STATE, O(buckets) by the
    hashing-trick contract, so it lives on the driver between rounds — the
    same bounded sync point as the BPE merge argmax and the k-center
    farthest pick. Each round is a single job: a narrow scan of the
    persisted arrays with the weights inlined as one array literal (margin
    = an exact integer array fold), misclassified docs exploded and
    combined map-side into <= buckets+1 delta rows collected to the
    driver. No per-round broadcast build, no per-round checkpoint, no
    lineage growth — iteration cost is flat in rounds."""
    spark = feats.sparkSession
    fx = feats.join(labels, id_col)
    fxd = (
        fx.groupBy(id_col, "y")
        .agg(F.collect_list("b").alias("bs"), F.collect_list("n").alias("ns"))
        .persist()
    )
    # bounded driver list: <= buckets+1 ints by the hashing-trick contract
    appearing = sorted(
        r["b"] for r in fxd.select(F.explode("bs").alias("b")).distinct().collect()
    )
    if not appearing:
        fxd.unpersist()
        return spark.createDataFrame([], "b int, weight long")
    size = appearing[-1] + 1
    w = {b: 0 for b in appearing}
    for _ in range(iters):
        wlit = F.lit([w.get(i, 0) for i in range(size)]).cast("array<long>")
        z = F.aggregate(
            F.zip_with("bs", "ns", lambda b, n: n * F.element_at(wlit, b + F.lit(1))),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        delta = (
            fxd.filter(F.col("y") * z <= 0)
            .select("y", F.explode(F.arrays_zip("bs", "ns")).alias("p"))
            .groupBy(F.col("p.bs").alias("b"))
            .agg(F.sum(F.col("y") * F.col("p.ns")).alias("__dw"))
            .collect()
        )
        for r in delta:
            w[r["b"]] += r["__dw"]
    fxd.unpersist()
    return spark.createDataFrame([(b, w[b]) for b in appearing], "b int, weight long")


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


# --------------------------------------------------------------------------
# Logistic regression (hard-sigmoid, fixed-point) — gradient magnitudes, not
# just perceptron signs, while keeping the whole trajectory engine-exact.
# --------------------------------------------------------------------------

LOGREG_SCALE = 1_000_000  # weights are BIGINT micro-units


def _pmod(a: Column, b: int) -> Column:
    return ((a % b) + b) % b


def floor_div(a: Column, b: int) -> Column:
    """Floor division on BIGINT, identical in Spark and DuckDB: subtract the
    positive remainder first so truncating division IS floor division —
    ``%`` is truncated remainder in both engines, so this expression
    replays bit-for-bit in the SQL oracle. The numerator is exactly
    divisible by ``b`` after the pmod subtraction, so the double true-division
    is exact below 2^53 and the long cast loses nothing."""
    return ((a - _pmod(a, b)) / F.lit(b)).cast("long")


def logreg_train_hardsigmoid(
    feats: DataFrame,
    labels: DataFrame,
    iters: int = 3,
    lr_inv: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Batch gradient descent for logistic-style regression with the
    HARD sigmoid ``s(z) = clip(z/4 + 1/2, 0, 1)`` in fixed-point integer
    arithmetic; returns the final weight table ``(b, weight)`` in
    micro-units (divide by LOGREG_SCALE for the real-valued weights).

    Versus :func:`perceptron_train`: updates are proportional to the
    *residual* ``s(w.x) - y``, so confident-correct docs stop moving the
    weights and the model calibrates, not just separates. The hard sigmoid
    (the piecewise-linear sigmoid of Courbariaux et al. 2016 /
    tf.keras.activations.hard_sigmoid) is chosen over exp because it is
    RATIONAL: with weights in micro-units every margin, clamp, residual
    numerator, and gradient numerator is an exact BIGINT, and the single
    division per update is :func:`floor_div` — so the whole trajectory
    replays bit-for-bit in a DuckDB oracle (same lattice discipline as
    k-means / PageRank / the perceptron).

    ``labels`` must be ``(id_col, y01)`` with y01 in {0, 1}. Derivation:
    z_int = sum(n * w) (micro-units); u = clamp(z_int + 2S, 0, 4S) so
    s = u / 4S; residual numerator e = u - 4S*y01 in [-4S, 4S]; real
    gradient g_b = sum_docs(e * n) / 4S; update in micro-units
    dw = -g_b * S / lr_inv = -floor_div(sum(e * n), 4 * lr_inv).

    Shape matches :func:`perceptron_train`'s array-fold fast path: ONE
    shuffle builds the persisted per-doc array form ``(id, y01, bs, ns)``;
    weights are driver-held model state (O(buckets) by contract) inlined
    per round as one array literal, so each round is a single job — margin
    and residual as exact integer folds over the arrays, gradient exploded
    and combined map-side into <= B+1 rows collected to the driver, the
    floor_div update applied in Python (``a - pmod(a, g)`` then truncating
    division IS ``a // g`` on ints, so the trajectory replays bit-for-bit
    in the unrolled SQL oracle). Overflow headroom: sum(e*n) <= 4e6 *
    tokens-per-bucket — switch the gradient sum to DECIMAL(38,0) past
    ~1e11 tokens per bucket."""
    S = LOGREG_SCALE
    g = 4 * lr_inv
    spark = feats.sparkSession
    fx = feats.join(labels, id_col)
    fxd = (
        fx.groupBy(id_col, "y01")
        .agg(F.collect_list("b").alias("bs"), F.collect_list("n").alias("ns"))
        .persist()
    )
    # bounded driver list: <= buckets+1 ints by the hashing-trick contract
    appearing = sorted(
        r["b"] for r in fxd.select(F.explode("bs").alias("b")).distinct().collect()
    )
    if not appearing:
        fxd.unpersist()
        return spark.createDataFrame([], "b int, weight long")
    size = appearing[-1] + 1
    w = {b: 0 for b in appearing}
    for _ in range(iters):
        wlit = F.lit([w.get(i, 0) for i in range(size)]).cast("array<long>")
        z = F.aggregate(
            F.zip_with("bs", "ns", lambda b, n: n * F.element_at(wlit, b + F.lit(1))),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        e = (
            F.least(F.greatest(z + F.lit(2 * S).cast("long"), F.lit(0).cast("long")), F.lit(4 * S).cast("long"))
            - F.lit(4 * S).cast("long") * F.col("y01")
        )
        grad = (
            fxd.select(e.alias("__e"), F.explode(F.arrays_zip("bs", "ns")).alias("p"))
            .groupBy(F.col("p.bs").alias("b"))
            .agg(F.sum(F.col("__e") * F.col("p.ns")).alias("__gn"))
            .collect()
        )
        gm = {r["b"]: r["__gn"] for r in grad}
        w = {b: w[b] - (gm.get(b, 0) // g) for b in appearing}
    fxd.unpersist()
    return spark.createDataFrame([(b, w[b]) for b in appearing], "b int, weight long")


# --------------------------------------------------------------------------
# Multi-class one-vs-rest perceptron — the trained language-ID / quality
# classifier path. Same BIGINT lattice discipline as perceptron_train, but
# all K one-vs-rest problems train JOINTLY in one relational iteration:
# weights are keyed (cls, b), so one broadcast join + two bounded shuffles
# per round cover every class at once instead of K sequential trainings.
# --------------------------------------------------------------------------


def hashed_ngram_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    buckets: int = 4096,
    salt: str = "lid",
) -> DataFrame:
    """Long-format hashed token n-gram counts ``(id, b, n)`` plus the bias
    feature at bucket index ``buckets`` (n=1 for every doc). Token n-grams
    (consecutive whitespace tokens joined by one space) give a feature
    space whose effective dimension grows with vocab^n, which is what lets
    a linear model separate classes a unigram space cannot — the fastText
    (Joulin et al. 2016) recipe, hashed per Weinberger et al. 2009 so the
    weight table stays broadcastable at any corpus size. All expressions
    are built-ins (split/transform/explode/md5), SQL-mirrorable."""
    from apollo_spark.ops.corpus import whitespace_tokens

    toks = whitespace_tokens(F.lower(F.col(text_col)))
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", *[F.get(toks, i + k) for k in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        df.select(F.col(id_col), F.explode(grams).alias("__g"))
        .select(
            id_col,
            (portable_hash60(F.col("__g"), salt) % F.lit(buckets)).cast("int").alias("b"),
        )
        .groupBy(id_col, "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bias = df.select(
        F.col(id_col), F.lit(buckets).cast("int").alias("b"), F.lit(1).cast("long").alias("n")
    )
    return counts.unionByName(bias)


def multiclass_perceptron_train(
    feats: DataFrame,
    labels: DataFrame,
    iters: int = 7,
    id_col: str = "doc_id",
    cls_col: str = "cls",
) -> DataFrame:
    """Joint one-vs-rest batch perceptron: ``labels`` is ``(id, cls, y)``
    with one row per (doc, class) and y in {+1, -1}; returns the weight
    table ``(cls, b, weight)`` after ``iters`` rounds from w = 0.

    Per round (N docs, K classes, B buckets): margins = fx (N*nnz*K rows)
    joined to the BROADCAST (K*(B+1))-row weight table -> groupBy (doc,
    cls) (map-side combinable); update = features of per-class
    misclassified docs -> groupBy (cls, b) (<= K*(B+1) rows out). Exactly
    the perceptron_train shuffle shape with K folded into the keys — K
    classifiers for the price of one pass. All arithmetic BIGINT, so a
    DuckDB oracle replays the trajectory by unrolled SQL."""
    fx = feats.join(labels, id_col).persist()  # (id, b, n, cls, y)
    w = fx.select(cls_col, "b").distinct().withColumn("weight", F.lit(0).cast("long"))
    for _ in range(iters):
        margins = (
            fx.join(F.broadcast(w), [cls_col, "b"])
            .groupBy(id_col, cls_col, "y")
            .agg(F.sum(F.col("n") * F.col("weight")).alias("__wx"))
        )
        wrong = margins.filter(F.col("y") * F.col("__wx") <= 0).select(id_col, cls_col)
        delta = (
            fx.join(wrong, [id_col, cls_col])
            .groupBy(cls_col, "b")
            .agg(F.sum(F.col("y") * F.col("n")).alias("__dw"))
        )
        w = (
            w.join(delta, [cls_col, "b"], "left")
            .select(
                cls_col,
                "b",
                (F.col("weight") + F.coalesce("__dw", F.lit(0))).alias("weight"),
            )
            .localCheckpoint(eager=True)  # flat lineage across rounds
        )
    if iters > 0:
        fx.unpersist()  # w is checkpoint-materialized; fx is unreachable from it
        return w
    return scoped_persist(w, fx)


def multiclass_predict(
    feats: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    cls_col: str = "cls",
    out_col: str = "pred",
) -> DataFrame:
    """argmax-class inference ``(id, out_col)`` with a deterministic
    tie-break (highest score, then lexicographically smallest class) that
    both engines replay identically: Spark takes min(struct(-score, cls)),
    the SQL oracle row_number()s by (score DESC, cls ASC). Broadcast
    weights; one map-side-combinable groupBy — the scoring sweep a 100 TB
    corpus runs once per trained model."""
    scores = (
        feats.join(F.broadcast(weights), "b")
        .groupBy(id_col, cls_col)
        .agg(F.sum(F.col("n") * F.col("weight")).alias("score"))
    )
    best = scores.groupBy(id_col).agg(
        F.min(F.struct((-F.col("score")).alias("ns"), F.col(cls_col).alias("c"))).alias("__m")
    )
    return best.select(id_col, F.col("__m.c").alias(out_col))
