"""Similarity search over embedding columns (array<float>).

Two tiers (SURVEY §7 step 9):
* brute-force cosine top-k — exact; JVM-side zip_with/aggregate dot products,
  per-group top-k window. Fine when one side broadcasts (query batch).
* LSH-bucketed (random hyperplanes) — the 100 TB path: each vector lands in
  a small number of buckets; candidate pairs share a bucket; recall is tuned
  by (num_planes, num_tables). No full cross product ever materializes.

Hyperplanes are generated driver-side from a fixed seed (deterministic plans)
and inlined as array literals — they are tiny (num_planes x dim floats).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a):
    return F.sqrt(dot(a, a))


def cosine(a, b):
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact top-k neighbors for each query vector: broadcast the (small)
    query side against the corpus, window top-k per query. One shuffle on
    q_id for the ranking."""
    q = queries.select(F.col(q_id_col), F.col(q_vec_col))
    joined = df.select(F.col(id_col), F.col(vec_col)).crossJoin(F.broadcast(q))
    scored = joined.withColumn("score", cosine(F.col(vec_col), F.col(q_vec_col)))
    w = Window.partitionBy(q_id_col).orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "score", "rank")
    )


def _hyperplanes(dim: int, num_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_planes, dim)).tolist()


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Sign-bit bucket id from random hyperplanes: bit i = sign(<v, p_i>)."""
    bits = [
        F.when(dot(vec_col, F.array(*[F.lit(float(x)) for x in p])) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        for p in planes
    ]
    bucket = F.lit(0).cast("long")
    for i, b in enumerate(bits):
        bucket = bucket.bitwiseOR(F.shiftleft(b, i))
    return bucket


def lsh_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int | None = None,
    num_planes: int = 8,
    num_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: corpus and queries are bucketed by num_tables
    independent hyperplane sets; candidates = bucket-mates in any table;
    exact cosine + top-k over candidates only.

    At 100 TB: corpus bucketing is a narrow map (no shuffle); the join
    shuffles on (table, bucket) — bucket occupancy ~ N / 2^num_planes
    controls the fan-out, tune num_planes to data size.
    """
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    tables = [(_t, _hyperplanes(dim, num_planes, seed + _t)) for _t in range(num_tables)]

    def bucketize(frame: DataFrame, vcol: str) -> DataFrame:
        return frame.withColumn(
            "__tb",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(t).alias("tbl"), lsh_bucket(F.col(vcol), planes).alias("bkt"))
                        for t, planes in tables
                    ]
                )
            ),
        )

    corpus = bucketize(df.select(id_col, vec_col), vec_col)
    qb = bucketize(queries.select(q_id_col, q_vec_col), q_vec_col)
    cand = (
        corpus.join(qb, corpus["__tb"] == qb["__tb"])
        .select(id_col, vec_col, q_id_col, q_vec_col)
        .dropDuplicates([q_id_col, id_col])
    )
    scored = cand.withColumn("score", cosine(F.col(vec_col), F.col(q_vec_col)))
    w = Window.partitionBy(q_id_col).orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "score", "rank")
    )


def train_ivf_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    n_clusters: int = 16,
    iters: int = 10,
    seed: int = 42,
    sample_rows: int = 100_000,
) -> np.ndarray:
    """Driver-side spherical k-means (Lloyd on L2-normalized vectors) over a
    bounded RANDOM sample — the standard IVF training step. At 100 TB the
    sample cap keeps driver memory flat (sample_rows x dim x 8 bytes);
    assignment of the full corpus stays distributed in ivf_assign.

    Sampling must be uniform: a bare ``limit()`` takes the first partitions,
    and on sorted/clustered data (by source, by date) that trains centroids
    on one slice of the distribution — IVF recall then degrades silently for
    everything else. Seeded ``sample()`` touches every partition."""
    sample = df.select(vec_col)
    n = sample.count()
    if n > sample_rows:
        # 1.2x oversample so the post-sample limit() almost never undershoots
        sample = sample.sample(fraction=min(1.0, 1.2 * sample_rows / n), seed=seed).limit(sample_rows)
    pdf = sample.toPandas()
    x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(x, axis=1)
    norms[norms == 0.0] = 1.0
    x = x / norms[:, None]
    return _spherical_kmeans_np(x, n_clusters, iters, seed)


def _spherical_kmeans_np(x: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Numpy spherical k-means (Lloyd on L2-normalized rows) — the training
    core shared by the driver-side flat trainer and the per-cell fine
    trainer that runs INSIDE executor tasks (train_ivf_centroids_twolevel).
    Rows must already be normalized."""
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cent[c] = m / n
    return cent


def train_ivf_centroids_twolevel(
    df: DataFrame,
    vec_col: str = "embedding",
    n_clusters: int = 16,
    iters: int = 10,
    seed: int = 42,
    sample_rows: int = 100_000,
    cell_sample_rows: int = 200_000,
) -> tuple[np.ndarray, DataFrame]:
    """Two-level float IVF index (the inverted-multi-index shape): kc =
    ceil(sqrt(k)) coarse centroids trained driver-side on a bounded sample
    (driver/broadcast footprint is ALWAYS ~sqrt(k) x D), then kf =
    ceil(k/kc) fine lists per cell trained INSIDE one applyInPandas task
    per cell — the fine K x D matrix never exists in any single process.

    This removes the flat trainer's scale ceiling: train_ivf_centroids
    broadcasts the full K x D matrix to ivf_assign, which at
    corpus-proportional k (k ~ sqrt(N), or N/250 for SemDeDup-style use) is
    GBs per executor at 100 TB. Here the only broadcast is kc x D and the
    fine centroids move as a TABLE — one cell's rows (<= kf x D) meet that
    cell's points via cogroup (ivf_assign_twolevel), the same shape
    ops.clustering.kmeans_lattice_twolevel certified for the integer
    lattice (BASELINE.md round-8 #3).

    Returns (coarse kc x D ndarray, fine DataFrame(cell INT, list_id INT,
    centroid ARRAY<DOUBLE>)) with list_id = cell * kf + local fine index —
    a stable global inverted-list id. ``cell_sample_rows`` bounds the
    per-task training set (deterministic md5-ordered head, portable and
    partition-layout-independent)."""
    import pandas as pd

    from apollo_spark.ops.clustering import twolevel_shape

    kc, kf = twolevel_shape(n_clusters)
    coarse = train_ivf_centroids(
        df, vec_col=vec_col, n_clusters=kc, iters=iters, seed=seed, sample_rows=sample_rows
    )
    cells = ivf_assign(df.select(vec_col), coarse, vec_col=vec_col, out_col="__cell")

    def fit(key, pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "cell": pd.Series(dtype="int32"),
                "list_id": pd.Series(dtype="int32"),
                "centroid": pd.Series(dtype="object"),
            }
        )
        if pdf.empty:
            return empty
        cell = int(key[0])
        if len(pdf) > cell_sample_rows:
            # deterministic, layout-independent subsample: md5 of the vector
            # bytes orders rows the same way on any partitioning
            import hashlib

            keys = pdf[vec_col].map(
                lambda v: hashlib.md5(np.asarray(v, dtype=np.float64).tobytes()).hexdigest()
            )
            pdf = pdf.loc[keys.sort_values().index[:cell_sample_rows]]
        x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(x, axis=1)
        norms[norms == 0.0] = 1.0
        x = x / norms[:, None]
        cent = _spherical_kmeans_np(x, kf, iters, seed + cell)
        return pd.DataFrame(
            {
                "cell": np.full(len(cent), cell, dtype=np.int32),
                "list_id": (cell * kf + np.arange(len(cent))).astype(np.int32),
                "centroid": [list(map(float, c)) for c in cent],
            }
        )

    fine = cells.groupBy("__cell").applyInPandas(
        fit, schema="cell INT, list_id INT, centroid ARRAY<DOUBLE>"
    )
    return coarse, fine


def ivf_assign_twolevel(
    df: DataFrame,
    coarse: np.ndarray,
    fine: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "__cluster",
) -> DataFrame:
    """Two-level inverted-list assignment: nearest coarse cell via the small
    kc x D broadcast (narrow map), then nearest fine list WITHIN the cell
    via cogroup — one cell's centroid rows meet that cell's points in one
    task; no process ever holds the full fine matrix. Ties break toward the
    smaller list_id (argmax takes the first maximum over the
    list_id-sorted matrix)."""
    import pandas as pd

    cells = ivf_assign(df, coarse, vec_col=vec_col, out_col="__cell")
    cols = [f for f in cells.schema.fields if f.name != "__cell"]
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in cols)

    def fn(key, ppdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if ppdf.empty:
            return ppdf.drop(columns=["__cell"]).assign(**{out_col: pd.Series(dtype="int32")})
        ppdf = ppdf.drop(columns=["__cell"])
        if cpdf.empty:
            return ppdf.assign(**{out_col: np.int32(-1)})
        cpdf = cpdf.sort_values("list_id")
        cent = np.stack(cpdf["centroid"].to_numpy()).astype(np.float64)
        lids = cpdf["list_id"].to_numpy().astype(np.int32)
        m = np.stack(ppdf[vec_col].to_numpy()).astype(np.float64)
        n = np.linalg.norm(m, axis=1)
        n[n == 0.0] = 1.0
        ppdf = ppdf.copy()
        ppdf[out_col] = lids[np.argmax((m / n[:, None]) @ cent.T, axis=1)]
        return ppdf

    return cells.groupBy("__cell").cogroup(fine.groupBy("cell")).applyInPandas(
        fn, schema=f"{out_schema}, {out_col} INT"
    )


def semantic_decontamination(
    corpus: DataFrame,
    bench: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_id_col: str = "bench_id",
    bench_vec_col: str = "bench_vec",
    impl: str = "jvm",
) -> DataFrame:
    """Embedding-level decontamination: for every corpus row, the maximum
    cosine to ANY benchmark/eval item and a contaminated flag — the
    semantic tier beside the lexical decontamination ops
    (benchmark Jaccard + containment, ops/corpus.py), which PARAPHRASED
    eval leakage slips past: a reworded test question shares few n-grams
    but sits next to the original in embedding space (the screening
    used for modern pretraining sets).

    Returns (id_col, best_bench_id, max_cos, contaminated) — one row per
    corpus vector; best_bench_id ties break toward the smaller bench id on
    the ROUNDED score (6 dp) so cross-engine ulp noise cannot flip either
    the match or the flag.

    Scale: the benchmark side is SMALL by definition (eval suites are
    thousands of items) — broadcast it; ``impl="jvm"`` scores via the
    sequential-fold cosine expression (oracle-replayable; the broadcast
    nested-loop join is N x |bench| ROWS SCANNED but never shuffled) and
    takes a per-corpus-row window keyed by id. ``impl="arrow"`` computes
    the same max/argmax inside one Arrow-batched matmul per partition —
    no cross-product rows materialize at all, the 100 TB form (parity
    pytest pins jvm == arrow)."""
    if impl == "arrow":
        import pandas as pd

        spark = corpus.sparkSession
        bp = bench.select(bench_id_col, bench_vec_col).toPandas().sort_values(bench_id_col)
        bids = bp[bench_id_col].to_numpy()
        bm = np.stack(bp[bench_vec_col].to_numpy()).astype(np.float64)
        bn = np.linalg.norm(bm, axis=1)
        bn[bn == 0.0] = 1.0
        bmn = bm / bn[:, None]
        bc = spark.sparkContext.broadcast((bids, bmn))

        def run(batches):
            ids_b, mat = bc.value
            for pdf in batches:
                if pdf.empty:
                    continue
                m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                n = np.linalg.norm(m, axis=1)
                n[n == 0.0] = 1.0
                # round BEFORE argmax: ties on the 6-dp score go to the
                # smaller bench id (ids sorted ascending, argmax takes the
                # first maximum) — same rule as the JVM window
                sims = np.round((m / n[:, None]) @ mat.T, 6)
                j = np.argmax(sims, axis=1)
                out = pd.DataFrame(
                    {
                        id_col: pdf[id_col].to_numpy(),
                        "best_bench_id": ids_b[j],
                        "max_cos": sims[np.arange(len(j)), j],
                        "contaminated": sims[np.arange(len(j)), j] >= threshold,
                    }
                )
                yield out

        from pyspark.sql import types as T

        id_type = dict(zip(corpus.columns, [f.dataType for f in corpus.schema.fields]))[id_col]
        bid_type = dict(zip(bench.columns, [f.dataType for f in bench.schema.fields]))[bench_id_col]
        schema = T.StructType(
            [
                T.StructField(id_col, id_type),
                T.StructField("best_bench_id", bid_type),
                T.StructField("max_cos", T.DoubleType()),
                T.StructField("contaminated", T.BooleanType()),
            ]
        )
        return corpus.select(id_col, vec_col).mapInPandas(run, schema=schema)

    scored = (
        corpus.select(id_col, vec_col)
        .join(F.broadcast(bench.select(bench_id_col, bench_vec_col)))
        .withColumn("__cos", F.round(cosine(F.col(vec_col), F.col(bench_vec_col)), 6))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("__cos"), F.asc(bench_id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            id_col,
            F.col(bench_id_col).alias("best_bench_id"),
            F.col("__cos").alias("max_cos"),
            (F.col("__cos") >= F.lit(float(threshold))).alias("contaminated"),
        )
    )


# Above this many inverted lists, ivf_topk switches from the flat index
# (driver-trained, full K x D broadcast) to the two-level hierarchy — the
# same 4096 crossover lattice_cluster_assign uses for blocking (gate SFs
# stay far below it, so flat-path oracles are untouched).
IVF_TWOLEVEL_THRESHOLD = 4096


def ivf_topk_twolevel(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_clusters: int = 16,
    n_probe_cells: int = 2,
    n_probe_lists: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k over the two-level index: each query probes its
    ``n_probe_cells`` nearest coarse cells and, within each probed cell,
    the ``n_probe_lists`` nearest fine lists (cogroup — the query rows for
    a cell meet that cell's centroid rows in one task); candidates are the
    probed lists' members, re-scored exactly JVM-side. Probing every cell
    and every list makes it EXACT (== brute_force_topk), which is how the
    oracle gate certifies the machinery. Scale: candidate join shuffles on
    the global list id; the full fine centroid matrix exists nowhere."""
    import pandas as pd

    coarse, fine = train_ivf_centroids_twolevel(
        df, vec_col=vec_col, n_clusters=n_clusters, seed=seed
    )
    fine = fine.persist()
    corpus = ivf_assign_twolevel(df.select(id_col, vec_col), coarse, fine, vec_col=vec_col)

    # query side: nearest cells via the small broadcast, one row per
    # (query, probed cell)...
    qcells = ivf_probe(queries.select(q_id_col, q_vec_col), coarse, n_probe_cells, vec_col=q_vec_col)
    qcells = qcells.withColumnRenamed("__probe", "__cell")

    # ...then the probed cell's fine lists via cogroup
    def fn(key, qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                q_id_col: pd.Series(dtype="int64"),
                q_vec_col: pd.Series(dtype="object"),
                "__probe_list": pd.Series(dtype="int32"),
            }
        )
        if qpdf.empty or cpdf.empty:
            return empty
        cpdf = cpdf.sort_values("list_id")
        cent = np.stack(cpdf["centroid"].to_numpy()).astype(np.float64)
        lids = cpdf["list_id"].to_numpy().astype(np.int32)
        p = min(n_probe_lists, len(lids))
        m = np.stack(qpdf[q_vec_col].to_numpy()).astype(np.float64)
        n = np.linalg.norm(m, axis=1)
        n[n == 0.0] = 1.0
        sims = (m / n[:, None]) @ cent.T
        top = np.argsort(-sims, axis=1)[:, :p]
        out = qpdf[[q_id_col, q_vec_col]].loc[qpdf.index.repeat(p)].reset_index(drop=True)
        out["__probe_list"] = lids[top.reshape(-1)]
        return out

    q_vec_type = dict(zip(queries.columns, [f.dataType.simpleString() for f in queries.schema.fields]))[q_vec_col]
    probed = qcells.groupBy("__cell").cogroup(fine.groupBy("cell")).applyInPandas(
        fn, schema=f"{q_id_col} long, {q_vec_col} {q_vec_type}, __probe_list INT"
    )
    cand = (
        corpus.join(probed, corpus["__cluster"] == probed["__probe_list"])
        .select(id_col, vec_col, q_id_col, q_vec_col)
        .dropDuplicates([q_id_col, id_col])
    )
    scored = cand.withColumn("score", cosine(F.col(vec_col), F.col(q_vec_col)))
    w = Window.partitionBy(q_id_col).orderBy(F.col("score").desc(), F.col(id_col).asc())
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "score", "rank")
    )
    from apollo_spark.ops.cache import scoped_persist

    return scoped_persist(out, fine)


def train_or_load_ivf_twolevel(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    n_clusters: int = 16,
    **train_kw,
) -> tuple[np.ndarray, DataFrame]:
    """Persisted two-level IVF index: BOTH levels in ONE TxTable at ``path``
    (level 0 = coarse centroids under cell ids, level 1 = fine lists),
    train-once/consume-many via train_or_load_table — the ANN analogue of
    ops.clustering.train_or_load_centroids_twolevel. The coarse level is
    tiny (ceil(sqrt(k)) rows) so reading it back to the driver matrix is a
    bounded collect; the fine level stays a TABLE and is consumed by
    cogroup, never collected. Concurrent trainers are CAS-safe (the loser
    reads the winner's snapshot). Returns (coarse ndarray, fine frame) —
    the same shape train_ivf_centroids_twolevel yields fresh."""
    from apollo_spark.table_format import train_or_load_table

    spark = df.sparkSession

    def build() -> DataFrame:
        coarse, fine = train_ivf_centroids_twolevel(
            df, vec_col=vec_col, n_clusters=n_clusters, **train_kw
        )
        coarse_rows = spark.createDataFrame(
            [(0, int(i), -1, [float(v) for v in c]) for i, c in enumerate(coarse)],
            "level INT, cell INT, list_id INT, centroid ARRAY<DOUBLE>",
        )
        return coarse_rows.unionByName(
            fine.select(F.lit(1).alias("level"), "cell", "list_id", "centroid")
        )

    t = train_or_load_table(spark, path, build)
    coarse_pdf = t.filter(F.col("level") == 0).orderBy("cell").toPandas()
    coarse = np.stack(coarse_pdf["centroid"].to_numpy()).astype(np.float64)
    fine = t.filter(F.col("level") == 1).select("cell", "list_id", "centroid")
    return coarse, fine


def save_ivf_centroids(spark, centroids: np.ndarray, path: str) -> None:
    """Persist trained centroids as a tiny (cluster_id, centroid) parquet
    table so the IVF index is trained once and reused across queries and
    jobs. Writing through Spark keeps the artifact on the cluster filesystem
    (HDFS/S3/...), not driver-local disk — required for 1000-executor reuse."""
    rows = [(int(i), [float(v) for v in c]) for i, c in enumerate(centroids)]
    (
        spark.createDataFrame(rows, "cluster_id INT, centroid ARRAY<DOUBLE>")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(path)
    )


def load_ivf_centroids(spark, path: str) -> np.ndarray:
    """Load centroids saved by save_ivf_centroids, row-order restored from
    cluster_id (parquet carries no ordering guarantee)."""
    pdf = spark.read.parquet(path).orderBy("cluster_id").toPandas()
    return np.stack(pdf["centroid"].to_numpy()).astype(np.float64)


def train_or_load_ivf_centroids(df: DataFrame, path: str, **train_kw) -> np.ndarray:
    """Reuse a persisted IVF index if one exists at `path`, else train and
    persist. Makes repeated ANN queries over the same corpus pay the k-means
    cost once instead of per query."""
    from pyspark.errors.exceptions.captured import AnalysisException

    spark = df.sparkSession
    try:
        return load_ivf_centroids(spark, path)
    except AnalysisException:
        cent = train_ivf_centroids(df, **train_kw)
        save_ivf_centroids(spark, cent, path)
        return cent


def ivf_assign(df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding", out_col: str = "__cluster"):
    """Nearest-centroid id per row via Arrow-batched matmul against the
    broadcast centroid matrix (narrow map, no shuffle)."""
    import pandas as pd

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(centroids)
    fields = df.schema.fields

    def run(batches):
        cent = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n = np.linalg.norm(m, axis=1)
            n[n == 0.0] = 1.0
            pdf = pdf.copy()
            pdf[out_col] = np.argmax((m / n[:, None]) @ cent.T, axis=1).astype(np.int32)
            yield pdf

    from pyspark.sql import types as T

    schema = T.StructType(list(fields) + [T.StructField(out_col, T.IntegerType())])
    return df.mapInPandas(run, schema=schema)


def ivf_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: corpus partitioned into n_clusters inverted
    lists by nearest centroid; each query probes its n_probe nearest lists
    and re-scores candidates exactly (JVM-side cosine + top-k window).

    n_probe = n_clusters makes it EXACT (== brute_force_topk). Scale: the
    candidate join shuffles on cluster id — expected fan-in per query is
    n_probe/n_clusters of the corpus, tune n_clusters ~ sqrt(N) so each
    inverted list stays partition-sized.

    Above IVF_TWOLEVEL_THRESHOLD clusters this routes to the two-level
    index automatically (ivf_topk_twolevel — the lattice tier's
    lattice_cluster_assign pattern): the flat path trains driver-side and
    broadcasts the full K x D matrix, which at corpus-proportional k is
    GBs per executor; the hierarchy bounds both at ceil(sqrt(k)) x D.
    n_probe maps to (cells, lists-per-cell) probing the same number of
    inverted lists."""
    if n_clusters > IVF_TWOLEVEL_THRESHOLD:
        from apollo_spark.ops.clustering import twolevel_shape

        kc, kf = twolevel_shape(n_clusters)
        lists = min(kf, max(1, n_probe))
        cells = min(kc, -(-n_probe // lists))
        return ivf_topk_twolevel(
            df, queries, k=k, n_clusters=n_clusters,
            n_probe_cells=cells, n_probe_lists=lists,
            id_col=id_col, vec_col=vec_col, q_id_col=q_id_col, q_vec_col=q_vec_col,
            seed=seed,
        )
    cent = train_ivf_centroids(df, vec_col=vec_col, n_clusters=n_clusters, seed=seed)
    corpus = ivf_assign(df.select(id_col, vec_col), cent, vec_col=vec_col)
    # queries probe their n_probe nearest centroids: explode a per-row array
    probed = ivf_probe(queries.select(q_id_col, q_vec_col), cent, n_probe, vec_col=q_vec_col)
    cand = corpus.join(probed, corpus["__cluster"] == probed["__probe"]).select(
        id_col, vec_col, q_id_col, q_vec_col
    )
    scored = cand.withColumn("score", cosine(F.col(vec_col), F.col(q_vec_col)))
    w = Window.partitionBy(q_id_col).orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, "score", "rank")
    )


def ivf_probe(queries: DataFrame, centroids: np.ndarray, n_probe: int, vec_col: str = "q_vec"):
    """(query, probed cluster id) pairs — top-n_probe centroids by cosine."""
    import pandas as pd

    spark = queries.sparkSession
    bc = spark.sparkContext.broadcast(centroids)
    cols = queries.columns

    def run(batches):
        cent = bc.value
        p = min(n_probe, len(cent))
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n = np.linalg.norm(m, axis=1)
            n[n == 0.0] = 1.0
            sims = (m / n[:, None]) @ cent.T
            top = np.argsort(-sims, axis=1)[:, :p]
            out = pdf.loc[pdf.index.repeat(p)].reset_index(drop=True)
            out["__probe"] = top.reshape(-1).astype(np.int32)
            yield out

    from pyspark.sql import types as T

    schema = T.StructType(list(queries.schema.fields) + [T.StructField("__probe", T.IntegerType())])
    return queries.mapInPandas(run, schema=schema)


def all_pairs_cosine_exact(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
    max_rows: int = 5_000_000,
) -> DataFrame:
    """EXACT all-pairs cosine >= threshold (id_a < id_b), no recall loss.

    Candidate generation is a block-pair matmul: rows hash into ``n_blocks``
    blocks, every unordered block pair (i <= j) becomes one applyInPandas
    group holding both member sets, and the group scores block_i x block_j
    with one BLAS matmul, emitting only pairs above (threshold - margin).
    Survivors are re-scored JVM-side with the sequential-fold ``cosine``
    expression, so final values are bit-identical to naive pairwise
    evaluation regardless of BLAS summation order, and the margin swallows
    ulp-level disagreement at the threshold boundary.

    Scale posture: NO full-corpus copy exists anywhere — not on the driver,
    not per executor. Each task holds two blocks (~2N/n_blocks rows); total
    shuffle volume is N x (n_blocks + 1) rows. Compute is the irreducible
    O(N^2) dot products — raise n_blocks as N grows to keep per-task memory
    flat, or use embedding_near_dups (LSH) beyond the exact tier.
    Requires an integral id column.

    ``max_rows`` is the corpus-scale guard (the driver_threshold pattern of
    connected_components): compute is O(N^2) dot products BY CONSTRUCTION —
    fine as the exact certification tier, lethal if reached for at corpus
    scale. Above the cap this raises immediately, naming the LSH scale path,
    instead of launching a job that burns a cluster-month. The count is one
    bounded aggregate action. Set max_rows=None to bypass (benchmarks that
    knowingly pay the quadratic).
    """
    spark = df.sparkSession
    src = df.select(F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("v"))
    if max_rows is not None:
        n_rows = src.count()
        if n_rows > max_rows:
            raise ValueError(
                f"all_pairs_cosine_exact is O(N^2): {n_rows} rows exceeds "
                f"max_rows={max_rows}. Use embedding_near_dups (LSH-bucketed, "
                "linear shuffle) at corpus scale, or pass max_rows=None / a "
                "higher cap to knowingly pay the quadratic."
            )
    blocked = src.withColumn("__b", F.pmod(F.hash("id"), F.lit(n_blocks)).cast("int"))
    pair_rows = [(i, j) for i in range(n_blocks) for j in range(i, n_blocks)]
    pairs = spark.createDataFrame(pair_rows, "bi int, bj int")
    a_side = blocked.join(F.broadcast(pairs), blocked["__b"] == pairs["bi"]).select(
        "bi", "bj", F.lit("a").alias("side"), "id", "v"
    )
    b_side = blocked.join(F.broadcast(pairs), blocked["__b"] == pairs["bj"]).select(
        "bi", "bj", F.lit("b").alias("side"), "id", "v"
    )
    margin = 1e-9

    def score_block_pair(key, pdf):
        import pandas as pd

        bi, bj = key
        am = pdf[pdf["side"] == "a"]
        bm = pdf[pdf["side"] == "b"]
        if am.empty or bm.empty:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")})
        a_ids = am["id"].to_numpy(dtype=np.int64)
        b_ids = bm["id"].to_numpy(dtype=np.int64)
        a = np.stack(am["v"].to_numpy()).astype(np.float64)
        b = np.stack(bm["v"].to_numpy()).astype(np.float64)
        an = np.linalg.norm(a, axis=1)
        an[an == 0.0] = 1.0
        bn = np.linalg.norm(b, axis=1)
        bn[bn == 0.0] = 1.0
        sims = (a / an[:, None]) @ (b / bn[:, None]).T
        mask = sims >= threshold - margin
        if bi == bj:
            # diagonal: both sides are the same rows — strict < dedups the
            # (x,y)/(y,x) double emission and drops self-pairs
            mask &= a_ids[:, None] < b_ids[None, :]
        rows, cols = np.nonzero(mask)
        if not len(rows):
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")})
        # off-diagonal blocks see each unordered pair once, in arbitrary id
        # order — normalize to id_a < id_b here
        lo = np.minimum(a_ids[rows], b_ids[cols])
        hi = np.maximum(a_ids[rows], b_ids[cols])
        return pd.DataFrame({"id_a": lo, "id_b": hi})

    cand = (
        a_side.unionByName(b_side)
        .groupBy("bi", "bj")
        .applyInPandas(score_block_pair, schema="id_a long, id_b long")
    )
    # Candidate volume is threshold-dependent and unknowable at plan time: at
    # dedup-like thresholds `cand` is tiny, but a low threshold makes it
    # quadratic — a forced broadcast hint here would OOM the driver. Leave the
    # joins unhinted: AQE converts them to broadcast at runtime iff the
    # materialized candidate set is actually under
    # spark.sql.adaptive.autoBroadcastJoinThreshold, and keeps a shuffle join
    # otherwise. (session.py enables AQE; on a cluster the same conf governs.)
    with_a = src.select(F.col("id").alias("id_a"), F.col("v").alias("v_a")).join(cand, "id_a")
    rescored = (
        src.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"))
        .join(with_a, "id_b")
        .withColumn("score", cosine(F.col("v_a"), F.col("v_b")))
        .filter(F.col("score") >= threshold)
    )
    return rescored.select("id_a", "id_b", "score")


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    num_tables: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine >= threshold, LSH-bucketed
    self-join (id_a < id_b). Pass ``dim`` when known — the fallback
    inference runs an eager ``first()`` job at plan-build time."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    tables = [(_t, _hyperplanes(dim, num_planes, seed + _t)) for _t in range(num_tables)]
    bucketed = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).withColumn(
        "__tb",
        F.explode(
            F.array(
                *[F.struct(F.lit(t).alias("tbl"), lsh_bucket(F.col("v"), planes).alias("bkt")) for t, planes in tables]
            )
        ),
    )
    a = bucketed.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"), F.col("__tb").alias("ta"))
    b = bucketed.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"), F.col("__tb").alias("tb"))
    return (
        a.join(b, (a["ta"] == b["tb"]) & (a["id_a"] < b["id_b"]))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("score", cosine(F.col("v_a"), F.col("v_b")))
        .filter(F.col("score") >= threshold)
        .select("id_a", "id_b", "score")
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    n_clusters: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    target_cluster_rows: int = 250,
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster embeddings (spherical
    k-means), then inside each cluster greedily drop any vector whose cosine
    to an already-kept lower-id vector exceeds ``threshold``. Returns the
    kept (id) rows with their cluster id.

    The cluster pass bounds the pairwise work — and the published SemDeDup
    tradeoff includes k GROWING with the corpus: ``n_clusters=None``
    (default) derives k = max(16, ceil(N / target_cluster_rows)), making the
    within-cluster greedy prune O(N * target) — linear in N and each
    cluster's matrix bounded at ~target rows regardless of corpus size. A
    FIXED k would make the prune O(N^2/k) — quadratic — exactly what
    SemDeDup's proportional blocking exists to prevent (round-5 verdict).
    Near-dups split across clusters are missed, accepted for the ~100x cost
    cut. Pass an explicit ``n_clusters`` to pin k (tests / tiny corpora).
    Deterministic given the seed: greedy order is ascending id.

    PRODUCTION NOTE: this float twin is rows-only certified
    (float k-means isn't SQL-replayable); the hash-gated production
    entries are ``semantic_dedup_lattice`` / ``semantic_dedup_twolevel``
    (queries registry) over the engine-exact integer-lattice k-means.
    Scale: above IVF_TWOLEVEL_THRESHOLD clusters the blocking here routes
    through the two-level float index (train_ivf_centroids_twolevel +
    cogrouped assignment), so corpus-proportional k no longer collects or
    broadcasts a K x D matrix — the round-9 fix for the last driver-side
    growth path."""
    import math

    import pandas as pd

    if n_clusters is None:
        n_clusters = max(16, math.ceil(df.count() / target_cluster_rows))
    if n_clusters > IVF_TWOLEVEL_THRESHOLD:
        coarse, fine = train_ivf_centroids_twolevel(
            df, vec_col=vec_col, n_clusters=n_clusters, seed=seed
        )
        assigned = ivf_assign_twolevel(
            df.select(id_col, vec_col), coarse, fine, vec_col=vec_col, out_col="__cluster"
        )
    else:
        cent = train_ivf_centroids(df, vec_col=vec_col, n_clusters=n_clusters, seed=seed)
        assigned = ivf_assign(df.select(id_col, vec_col), cent, vec_col=vec_col)

    def prune(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0.0] = 1.0
        m = m / norms[:, None]
        keep: list[int] = []
        kept_rows: list[np.ndarray] = []
        for i in range(len(pdf)):
            v = m[i]
            if kept_rows and float(np.max(np.stack(kept_rows) @ v)) >= threshold:
                continue
            keep.append(i)
            kept_rows.append(v)
        out = pdf.iloc[keep][[id_col]].copy()
        out["cluster"] = int(key[0])
        return out

    return assigned.groupBy("__cluster").applyInPandas(
        prune, schema=f"{id_col} long, cluster int"
    )


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector scalar int8 quantization: code_i = floor((x_i - min) /
    scale + 0.5) with scale = (max - min)/255 — the storage-shrink step
    (4 bytes -> 1 byte per dim) before ANN serving.

    Everything is a JVM array expression (array_min/max + transform): a
    narrow map, no shuffle, no Python. floor(x + 0.5) is used instead of
    round() because round's tie behavior differs across engines while floor
    is IEEE-exact everywhere — the codes are engine-portable. Constant
    vectors (max == min) quantize to all-zero codes."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    mn = F.array_min(v)
    mx = F.array_max(v)
    scale = (mx - mn) / F.lit(255.0)
    codes = F.when(
        mx == mn, F.transform(v, lambda x: F.lit(0).cast("int"))
    ).otherwise(F.transform(v, lambda x: F.floor((x - mn) / scale + F.lit(0.5)).cast("int")))
    return df.select(
        F.col(id_col),
        mn.alias("vmin"),
        mx.alias("vmax"),
        codes.alias("codes"),
    )


def dequantize_int8(codes: "F.Column", vmin: "F.Column", vmax: "F.Column"):
    """Reconstruct the approximate vector: x_i ~ vmin + code_i * scale."""
    scale = (vmax - vmin) / F.lit(255.0)
    return F.transform(codes, lambda c: vmin + c.cast("double") * scale)


def hard_negatives(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    q_label_col: str = "q_label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the top-k
    most-similar corpus vectors with a DIFFERENT label (the negatives that
    sit closest to the decision boundary). Same broadcast-queries +
    windowed-top-k shape as brute_force_topk; the label inequality prunes
    before ranking so the window only sees admissible candidates."""
    q = queries.select(F.col(q_id_col), F.col(q_vec_col), F.col(q_label_col))
    joined = (
        df.select(F.col(id_col), F.col(vec_col), F.col(label_col))
        .crossJoin(F.broadcast(q))
        .filter(F.col(label_col) != F.col(q_label_col))
    )
    scored = joined.withColumn("score", cosine(F.col(vec_col), F.col(q_vec_col)))
    w = Window.partitionBy(q_id_col).orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, id_col, F.col(label_col), "score", "rank")
    )


def embedding_dim_stats(
    df: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension corpus statistics over an array<float> column:
    (dim, n, mean, std) — the normalization table feature-scaling and
    whitening start from.

    posexplode turns N vectors of d dims into N*d (pos, value) rows; one
    map-side-combined groupBy on pos does the rest — no driver collect, no
    per-row Python. Sums ride DECIMAL(38,6) so mean/variance are
    summation-order-independent (E[x^2]-E[x]^2 on exact sums, never
    running Welford); the only floats are two final IEEE divisions and a
    sqrt. Output is d rows — tiny for any d."""
    ex = df.select(F.posexplode(F.transform(F.col(vec_col), lambda x: x.cast("double"))))
    n = F.count(F.lit(1))
    s1 = F.sum(F.col("col").cast("decimal(38,6)")).cast("double")
    s2 = F.sum((F.col("col") * F.col("col")).cast("decimal(38,6)")).cast("double")
    return (
        ex.groupBy(F.col("pos").alias("dim"))
        .agg(n.alias("n"), s1.alias("__s1"), s2.alias("__s2"))
        .select(
            "dim",
            "n",
            (F.col("__s1") / F.col("n")).alias("mean"),
            F.sqrt(
                F.greatest(
                    F.col("__s2") / F.col("n") - (F.col("__s1") / F.col("n")) * (F.col("__s1") / F.col("n")),
                    F.lit(0.0),
                )
            ).alias("std"),
        )
    )


def random_projection(
    df: DataFrame,
    vec_col: str = "embedding",
    out_dims: int = 8,
    salt: str = "jl",
    prefix: str = "proj_",
) -> DataFrame:
    """Johnson–Lindenstrauss sign random projection: append ``out_dims``
    columns ``proj_j = (1/sqrt(out_dims)) * sum_i (+-1)_{ij} * v_i`` with the
    sign drawn from the repo's portable md5-prefix hash of (j, i)
    (Achlioptas 2003: +-1 entries preserve pairwise distances within
    (1 +- eps) like Gaussian projections do, and need no stored matrix).

    Fully engine-portable: signs are a pure function of (salt, j, i), the
    per-row fold runs in array-index order in both Spark (`transform` +
    ordered `aggregate`) and DuckDB (`list_dot_product` against a
    `list_transform(range(...))` sign vector), so projected doubles are
    bit-identical and the correctness gate can hash them. Per row this is
    O(d * out_dims) JVM-side work — no shuffle, no UDF, no stored
    projection matrix to broadcast."""
    from apollo_spark.ops.sketch import portable_hash60

    scale = 1.0 / float(np.sqrt(out_dims))

    def _signed(j: int):
        # closure factory: a default-arg lambda would grow a third parameter
        # and break pyspark's higher-order-function arity detection
        def f(x, i):
            return F.when(
                portable_hash60(F.concat(F.lit(f"{j}|"), i.cast("string")), salt) % 2 == 0,
                x.cast("double"),
            ).otherwise(-x.cast("double"))

        return f

    cols = []
    for j in range(out_dims):
        signed = F.transform(F.col(vec_col), _signed(j))
        proj = F.aggregate(signed, F.lit(0.0), lambda acc, v: acc + v) * F.lit(scale)
        cols.append(proj.alias(f"{prefix}{j}"))
    return df.select("*", *cols)


def embedding_covariance(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Upper-triangle covariance matrix of an array<float> corpus:
    rows ``(i, j, n, cov)`` for ``i <= j``.

    The d*(d+1)/2 cross products per row are generated *inside* the row via
    nested array transforms (no posexplode self-join — that would shuffle
    N*d rows twice); the groupBy(i, j) then map-side combines to at most
    d^2 groups per partition, so the only wide exchange is
    O(partitions * d^2) regardless of corpus size — the correct 100 TB
    shape for a Gram/covariance accumulation. Sums ride DECIMAL(38,6)
    (order-independent, engine-exact); the only floats are the final
    divisions and the mean product."""
    base = df.select(F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"))
    arr = F.col("__v")

    # Gram accumulation rides ONE Arrow-batched numpy pass. The previous
    # relational form (nested transform lambdas -> explode d*(d+1)/2 structs
    # per row -> hash agg) was exact but interpreted: Spark higher-order
    # functions never enter codegen, so 4M struct allocations cost ~2s at
    # N=2000, d=64. Here each batch emits one d x d partial — shuffle width
    # is O(batches * d^2), corpus-size independent, same as before.
    #
    # Exactness is preserved TERM-BY-TERM: per-element trunc((x*y)*1e6)
    # (toward zero, == Spark's cast-to-bigint == DuckDB trunc()) summed as
    # int64 — identical regardless of batch boundaries, so the DuckDB oracle
    # still hash-matches. Truncation error <= 1e-6 per term, below the
    # ROUND(...,6) presentation grain. int64 headroom: |sum| <= N * max|xy|
    # * 1e6 — switch to DECIMAL(38,0) partials past ~1e11 unit-scale rows.
    def _gram_batches(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["__v"].to_numpy()).astype(np.float64)
            n, d = x.shape
            s = np.zeros((d, d), dtype=np.int64)
            for lo in range(0, n, 256):  # bound the n*d*d intermediate
                blk = x[lo : lo + 256]
                s += np.trunc(np.einsum("ni,nj->nij", blk, blk) * 1e6).astype(np.int64).sum(axis=0)
            iu = np.triu_indices(d)
            yield pd.DataFrame(
                {
                    "i": iu[0].astype(np.int64),
                    "j": iu[1].astype(np.int64),
                    "cnt": np.full(len(iu[0]), n, dtype=np.int64),
                    "sxy": s[iu],
                }
            )

    gram = (
        base.mapInPandas(_gram_batches, "i long, j long, cnt long, sxy long")
        .groupBy("i", "j")
        .agg(
            F.sum("cnt").alias("n"),
            (F.sum("sxy").cast("double") / F.lit(1e6)).alias("__sxy"),
        )
    )
    means = (
        base.select(F.posexplode(arr))
        .groupBy(F.col("pos").alias("mi"))
        .agg(F.sum(F.col("col").cast("decimal(38,6)")).cast("double").alias("__s1"),
             F.count(F.lit(1)).alias("__mn"))
        .select("mi", (F.col("__s1") / F.col("__mn")).alias("mean"))
    )
    ma = means.select(F.col("mi").alias("__ia"), F.col("mean").alias("__mean_i"))
    mb = means.select(F.col("mi").alias("__ib"), F.col("mean").alias("__mean_j"))
    return (
        gram.join(F.broadcast(ma), gram["i"] == ma["__ia"])
        .join(F.broadcast(mb), gram["j"] == mb["__ib"])
        .select(
            "i",
            "j",
            "n",
            (F.col("__sxy") / F.col("n") - F.col("__mean_i") * F.col("__mean_j")).alias("cov"),
        )
    )


def pca_components(df: DataFrame, vec_col: str = "embedding", k: int = 8):
    """Top-k principal components via eigendecomposition of the distributed
    covariance matrix. The d x d matrix is the ONLY thing collected
    (d^2 <= a few thousand doubles — same bounded-driver-action class as
    IVF centroid training); the eigensolve on a d x d symmetric matrix is
    microseconds on the driver and would be identical on a 1000-executor
    cluster. Returns (components ndarray [k, d], eigenvalues ndarray [k]),
    eigenvalue-descending, each component sign-fixed so its
    largest-magnitude coordinate is positive (removes eigh's sign
    ambiguity -> deterministic output)."""
    tri = embedding_covariance(df, vec_col).collect()
    d = max(r.j for r in tri) + 1
    cov = np.zeros((d, d))
    for r in tri:
        cov[r.i, r.j] = r.cov
        cov[r.j, r.i] = r.cov
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # [k, d]
    for c in comps:
        m = np.argmax(np.abs(c))
        if c[m] < 0:
            c *= -1.0
    return comps, vals[order]


def pca_project(
    df: DataFrame,
    components: np.ndarray,
    vec_col: str = "embedding",
    prefix: str = "pc_",
) -> DataFrame:
    """Project rows onto precomputed components: k ordered-fold dot products
    against inlined array literals — JVM-side, shuffle-free, no UDF."""
    arr = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cols = []
    for ci, comp in enumerate(components):
        lit_comp = F.array(*[F.lit(float(v)) for v in comp])
        proj = F.aggregate(
            F.zip_with(arr, lit_comp, lambda x, w: x * w), F.lit(0.0), lambda a, v: a + v
        )
        cols.append(proj.alias(f"{prefix}{ci}"))
    return df.select("*", *cols)


def zca_whiten(
    df: DataFrame,
    vec_col: str = "embedding",
    eps: float = 1e-5,
    out_col: str = "whitened",
) -> DataFrame:
    """ZCA-whiten an ``array<float>`` corpus: ``x_w = W (x - mu)`` with
    ``W = U diag(1/sqrt(lambda + eps)) U^T`` from the eigendecomposition of
    the corpus covariance. After whitening, the corpus covariance is ~I —
    the standard preprocessing before semantic-dedup / clustering when raw
    embedding dimensions are correlated and anisotropic (one dominant
    direction otherwise swamps cosine/L2 structure); ZCA (vs PCA whitening)
    keeps axes maximally close to the originals so per-dimension meaning
    survives.

    Scale shape: mean and covariance come from the distributed DECIMAL-exact
    accumulation in :func:`embedding_covariance` (wide exchange is
    O(partitions * d^2), corpus-size independent); the d x d eigensolve is
    driver-side microseconds (same bounded-collect class as
    :func:`pca_components`); the projection inlines W row literals as d
    ordered zip_with/aggregate folds — JVM-side, shuffle-free, no UDF, no
    broadcast needed because the matrix lives in the plan."""
    tri = embedding_covariance(df, vec_col).collect()
    d = max(r.j for r in tri) + 1
    cov = np.zeros((d, d))
    for r in tri:
        cov[r.i, r.j] = r.cov
        cov[r.j, r.i] = r.cov
    vals, vecs = np.linalg.eigh(cov)
    w_mat = (vecs * (1.0 / np.sqrt(np.maximum(vals, 0.0) + eps))) @ vecs.T  # [d, d] symmetric

    # per-dimension means: same in-row generation discipline as the
    # covariance op (no posexplode shuffle of N*d rows; d groups out)
    arr = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    dims = df.select(F.posexplode(arr).alias("i", "x")).groupBy("i").agg(F.avg("x").alias("mu"))
    mu = np.zeros(d)
    for r in dims.collect():
        mu[r.i] = r.mu

    if d <= 16:
        # tiny d: inline W as plan literals — d^2 expression nodes, pure JVM
        # fold, no Python workers in the pipeline
        centered = F.zip_with(arr, F.array(*[F.lit(float(m)) for m in mu]), lambda x, m: x - m)
        out = df.withColumn("__c", centered)
        rows = []
        for i in range(d):
            lit_row = F.array(*[F.lit(float(v)) for v in w_mat[i]])
            rows.append(
                F.aggregate(
                    F.zip_with(F.col("__c"), lit_row, lambda x, w: x * w),
                    F.lit(0.0),
                    lambda a, v: a + v,
                )
            )
        return out.withColumn(out_col, F.array(*rows)).drop("__c")
    # real dims: d^2 literal folds are a codegen bomb (d=64 -> 4096 plan
    # nodes; measured ~3s of compile before the first row). One vectorized
    # Arrow batch matmul instead — the 32 KB matrix ships in the UDF closure,
    # still shuffle-free and corpus-parallel.
    mu_c, wt = mu.copy(), w_mat.T.copy()

    @F.pandas_udf("array<double>")
    def _zca(batch: pd.Series) -> pd.Series:
        x = np.stack(batch.to_numpy()).astype(np.float64)
        y = (x - mu_c) @ wt
        return pd.Series(list(y))

    return df.withColumn(out_col, _zca(arr))


def mmr_diverse_topk(
    emb: DataFrame,
    query_id: int,
    pool: int = 50,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = 1_000_000.0,
    offset: float = 8.0,
) -> DataFrame:
    """Maximal marginal relevance (Carbonell & Goldstein 1998) re-ranking on
    the engine-exact integer lattice: retrieve a bounded relevance pool
    (top-``pool`` by squared lattice distance to the query, id tie-break),
    then greedily pick ``k`` items maximizing
    ``min_{s in selected} D[x, s] - rel[x]`` — most relevant first, then
    items far from everything already picked (integer weights; step 1 has
    no diversity term).

    Scale shape: the corpus-wide relevance scan is one broadcast-join +
    aggregation; everything after operates on the pool (pool^2 pairwise
    integer distances, computed distributed, then collected — a bounded
    driver action like IVF training, pool^2 <= a few thousand ints). The
    greedy loop itself is sequential by definition; running it on bounded
    collected integers keeps the whole trajectory engine-exact, and the
    unrolled SQL oracle replays selection step by step."""
    from apollo_spark.ops.clustering import embedding_lattice

    long = embedding_lattice(emb, id_col, vec_col, scale, offset)
    qlong = long.filter(F.col(id_col) == query_id).select(
        F.col("d").alias("qd"), F.col("xi").alias("qxi")
    )
    rel = (
        long.filter(F.col(id_col) != query_id)  # the query is not a candidate
        .join(F.broadcast(qlong), long["d"] == qlong["qd"])
        .groupBy(id_col)
        .agg(F.sum((F.col("xi") - F.col("qxi")) * (F.col("xi") - F.col("qxi"))).alias("rel"))
        .orderBy(F.col("rel").asc(), F.col(id_col).asc())
        .limit(pool)
    )
    pool_ids = [r[0] for r in rel.select(id_col).collect()]
    plong = long.filter(F.col(id_col).isin([int(i) for i in pool_ids]))
    other = plong.select(
        F.col(id_col).alias("__y"), F.col("d").alias("__yd"), F.col("xi").alias("__yxi")
    )
    pairs = (
        plong.join(F.broadcast(other), plong["d"] == other["__yd"])
        .filter(F.col(id_col) < F.col("__y"))
        .groupBy(id_col, "__y")
        .agg(F.sum((F.col("xi") - F.col("__yxi")) * (F.col("xi") - F.col("__yxi"))).alias("dd"))
    )
    relmap = {r[0]: int(r[1]) for r in rel.collect()}
    pairmap = {}
    for r in pairs.collect():
        pairmap[(r[0], r[1])] = int(r.dd)
        pairmap[(r[1], r[0])] = int(r.dd)
    selected: list[tuple[int, int]] = []  # (vec_id, mmr_score)
    chosen: set[int] = set()
    for _ in range(min(k, len(relmap))):
        best = None
        for x in sorted(relmap):
            if x in chosen:
                continue
            if not chosen:
                score = -relmap[x]
            else:
                score = min(pairmap[(x, s)] for s in chosen) - relmap[x]
            if best is None or score > best[1] or (score == best[1] and x < best[0]):
                best = (x, score)
        chosen.add(best[0])
        selected.append(best)
    rows = [(i + 1, int(v), int(s)) for i, (v, s) in enumerate(selected)]
    return emb.sparkSession.createDataFrame(
        rows, f"rank INT, {id_col} BIGINT, mmr_score BIGINT"
    )


def cluster_pairwise_cosine(
    a: DataFrame,
    mode: str = "lt",
    group_col: str = "cluster",
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Within-group pairwise cosine scores, pairs GENERATED INSIDE an
    applyInPandas task — (group, x_id, y_id, score) with ``mode="lt"``
    (all pairs x_id < y_id: the SemDeDup prune shape) or ``mode="even_odd"``
    (even ids x odd ids: the bitext two-collection shape).

    Why not the relational join + HOF cosine: the join ships BOTH vectors
    (2 x D doubles) per PAIR through the shuffle and scores each pair with
    an interpreted fold — profiled as the dominant term of
    semantic_dedup_lattice at sf3 (98 s of 130 s after the assignment fix).
    Here Arrow moves each vector ONCE per group (O(N*D)), pairs live only
    as numpy tensors chunked to ~32 MB, and output is 3 narrow columns per
    pair.

    BIT-PARITY (hash-gates unchanged): per-pair products are elementwise
    IEEE float64 multiplies and np.cumsum accumulates STRICTLY
    left-to-right — the same recurrence as the JVM fold
    (aggregate(zip_with(a,b,*), 0.0, acc+v)) and DuckDB's
    list_dot_product; norms, sqrt, and the final divide are correctly
    rounded one-op-at-a-time in all three engines (the matryoshka /
    Arrow-Gram discipline). Ordering inside a group is forced to ascending
    id before pairing, so the emitted pair set is deterministic.

    100 TB note: group sizes are bounded by the lattice blocking's target
    cluster rows (k ∝ N keeps ~constant rows per cluster), so per-task
    memory is flat; a pathological giant cluster degrades to smaller y
    chunks, never OOM."""
    if mode not in ("lt", "even_odd"):
        raise ValueError(f"mode must be 'lt' or 'even_odd', got {mode!r}")
    even_odd = mode == "even_odd"

    def score(key, pdf):
        ids = pdf[id_col].to_numpy().astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        M = np.stack(pdf[vec_col].to_numpy())[order].astype(np.float64)
        n, d = M.shape
        norms = np.sqrt(np.cumsum(M * M, axis=1)[:, -1])
        if even_odd:
            # truncated (JVM/DuckDB-style) remainder, NOT numpy's floored
            # %: a negative odd id yields -1 there, so `= 1` excludes it
            # from the y side in both relational engines. np.fmod keeps
            # the dividend's sign, pinning the identical pair set for
            # negative ids (testdata ids are non-negative, but the three
            # formulations must agree on ANY input).
            rem = np.fmod(ids, 2)
            xi = np.flatnonzero(rem == 0)
            yi = np.flatnonzero(rem == 1)
            if len(xi) == 0 or len(yi) == 0:
                return pd.DataFrame(
                    {group_col: [], "x_id": [], "y_id": [], "score": []}
                ).astype({group_col: "int64", "x_id": "int64", "y_id": "int64", "score": "float64"})
            Mx, My = M[xi], M[yi]
            rows, per_row = len(yi), len(xi) * d * 8
        else:
            rows, per_row = n, n * d * 8
        out_x, out_y, out_s = [], [], []
        # chunk the pair tensor to ~32 MB of float64
        ch = max(1, (1 << 25) // max(per_row, 1))
        for s in range(0, rows, ch):
            if even_odd:
                yc = My[s : s + ch]
                prod = yc[:, None, :] * Mx[None, :, :]
                dots = np.cumsum(prod, axis=2)[:, :, -1]
                sc = dots / (norms[yi[s : s + ch], None] * norms[None, xi])
                yy, xx = np.meshgrid(ids[yi[s : s + ch]], ids[xi], indexing="ij")
                out_x.append(xx.reshape(-1))
                out_y.append(yy.reshape(-1))
                out_s.append(sc.reshape(-1))
            else:
                # y = row j pairs with every x strictly before it (ids asc)
                yc = M[s : s + ch]
                prod = yc[:, None, :] * M[None, :, :]
                dots = np.cumsum(prod, axis=2)[:, :, -1]
                sc = dots / (norms[s : s + ch, None] * norms[None, :])
                for off in range(len(yc)):
                    j = s + off
                    if j == 0:
                        continue
                    out_x.append(ids[:j])
                    out_y.append(np.full(j, ids[j], dtype=np.int64))
                    out_s.append(sc[off, :j])
        if not out_x:
            return pd.DataFrame(
                {group_col: [], "x_id": [], "y_id": [], "score": []}
            ).astype({group_col: "int64", "x_id": "int64", "y_id": "int64", "score": "float64"})
        xcat = np.concatenate(out_x)
        return pd.DataFrame(
            {
                group_col: np.full(len(xcat), key[0], dtype=np.int64),
                "x_id": xcat,
                "y_id": np.concatenate(out_y),
                "score": np.concatenate(out_s),
            }
        )

    return a.select(group_col, id_col, vec_col).groupBy(group_col).applyInPandas(
        score, schema=f"{group_col} long, x_id long, y_id long, score double"
    )


def margin_mined_pairs(
    emb: DataFrame,
    k: int,
    k_neighbors: int = 4,
    threshold: float = 1.05,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Margin-based parallel-pair mining (Artetxe & Schwenk 2019 — the
    LASER/CCMatrix bitext-mining criterion) between two collections: even
    ids form the X side, odd ids the Y side (stand-ins for "source corpus"
    and "target corpus"; real pipelines pass a side column the same way).

    A raw-cosine cutoff mis-mines hub vectors (points close to EVERYTHING).
    The RATIO margin fixes that by scoring each candidate pair against its
    neighborhood: margin(x, y) = cos(x, y) / ((avgNN_k(x) + avgNN_k(y)) / 2)
    where avgNN_k is the mean cosine of the side's top-``k_neighbors``
    candidates. Kept pairs must be MUTUAL best matches (the intersection
    strategy from the paper) with margin >= ``threshold``.

    Candidates are blocked by the engine-exact lattice k-means (cluster
    count ``k`` grows with the corpus, SemDeDup-style — pass
    ``semdedup_k(N)``), so the within-cluster X x Y candidate set stays
    O(N * cluster_rows), never corpus-quadratic; each of the three candidate
    consumers (two neighborhood aggregates + the mutual-top-1 filter) reads
    ONE persisted candidate frame.

    Cross-engine determinism: cosines are sequential left-to-right double
    folds (identical bits on both engines); neighborhood means quantize each
    cosine to DECIMAL(18,6) BEFORE summing, so the top-k mean is
    summation-order-free; every ranking tie breaks toward the smaller id.
    """
    from apollo_spark.ops.cache import scoped_persist
    from apollo_spark.ops.clustering import lattice_cluster_assign

    # flat lattice trajectory below the auto-switch threshold (the bits this
    # op's oracle replays); two-level hierarchy above it so driver/broadcast
    # footprints stay O(sqrt(k) * D) at corpus-proportional k
    assign = lattice_cluster_assign(emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    ev = emb.select(
        F.col(id_col), F.transform(vec_col, lambda x: x.cast("double")).alias("v")
    )
    a = assign.join(ev, id_col)
    wx = Window.partitionBy("x_id").orderBy(F.col("score").desc(), F.col("y_id").asc())
    wy = Window.partitionBy("y_id").orderBy(F.col("score").desc(), F.col("x_id").asc())
    # within-cluster even x odd scoring runs inside applyInPandas (pairs as
    # chunked numpy tensors, cumsum fold — bit-identical to the JVM/DuckDB
    # sequential dot): the old join shipped 2xD doubles per PAIR and scored
    # with an interpreted fold, the dominant term at the sf3 stress scale
    cand = (
        cluster_pairwise_cosine(a, mode="even_odd", id_col=id_col, vec_col="v")
        .select(
            "x_id",
            "y_id",
            "score",
            F.round("score", 6).cast("decimal(18,6)").alias("score_q"),
        )
        .withColumn("rnx", F.row_number().over(wx))
        .withColumn("rny", F.row_number().over(wy))
        .persist()
    )
    nx = (
        cand.filter(F.col("rnx") <= k_neighbors)
        .groupBy("x_id")
        .agg((F.sum("score_q").cast("double") / F.count(F.lit(1))).alias("avg_x"))
    )
    ny = (
        cand.filter(F.col("rny") <= k_neighbors)
        .groupBy("y_id")
        .agg((F.sum("score_q").cast("double") / F.count(F.lit(1))).alias("avg_y"))
    )
    margin = F.col("score") / ((F.col("avg_x") + F.col("avg_y")) / F.lit(2.0))
    out = (
        cand.filter((F.col("rnx") == 1) & (F.col("rny") == 1))
        .join(nx, "x_id")
        .join(ny, "y_id")
        # the Artetxe & Schwenk ratio-margin criterion assumes POSITIVE
        # neighborhood similarities: with a negative or zero mean the
        # inequality inverts (or divides by ~0) and dissimilar pairs pass.
        # Guard explicitly — pairs whose combined neighborhood mean is not
        # positive are unmineable under this criterion and are dropped.
        .filter((F.col("avg_x") + F.col("avg_y")) > 0)
        .withColumn("margin", margin)
        .filter(F.col("margin") >= F.lit(threshold))
        .select("x_id", "y_id", "score", "margin")
    )
    return scoped_persist(out, cand)


def matryoshka_prefix_scores(
    df: DataFrame,
    queries: DataFrame,
    dims: list[int],
    id_col: str = "vec_id",
    vec_col: str = "v",
    q_id_col: str = "q_id",
    q_vec_col: str = "qv",
) -> DataFrame:
    """Arrow-batched prefix-truncated cosine scoring for the matryoshka
    eval: one (id, q_id, dim, score) row per corpus x probe x prefix-dim,
    self-pairs dropped — the numpy replacement for the interpreted
    higher-order-function fold that profiled 16-19 s at sf1 (round-6
    verdict, task 3; same discipline as the round-3 "Arrow Gram" move).

    BIT-PARITY argument (why the hash-gate still holds): the JVM fold
    (``F.aggregate(zip_with(a,b,*), 0.0, acc+v)``) and DuckDB's
    ``list_dot_product`` both accumulate float64 STRICTLY LEFT-TO-RIGHT,
    and ``np.cumsum`` is the same recurrence — every prefix is emitted, so
    the accumulation is forced sequential in index order (no pairwise
    regrouping, unlike ``np.sum``). Elementwise float64 multiply, sqrt,
    and divide are IEEE-correctly-rounded in all three engines, so every
    prefix dot, norm, and score is bit-identical to both the JVM
    expression it replaces and the SQL oracle. One cumsum per (row, probe)
    yields ALL prefix dims at once — the fold paid it per dim.

    Scale shape: probes broadcast (K x D floats), the corpus streams
    through mapInPandas in Arrow batches chunked to ~1k rows so the
    (chunk, K, D) product tensor stays ~10 MB; output is K*|dims| rows per
    corpus row, narrow (no shuffle here — ranking downstream shuffles
    only (id, q_id, dim, score))."""
    spark = df.sparkSession
    qp = queries.select(q_id_col, q_vec_col).toPandas()
    q_ids_v = qp[q_id_col].to_numpy().astype(np.int64)
    Q = np.stack(qp[q_vec_col].to_numpy()).astype(np.float64)
    dims_arr = np.asarray(sorted(dims), dtype=np.int64)
    pos = dims_arr - 1
    bc = spark.sparkContext.broadcast((q_ids_v, Q, dims_arr, pos))

    def run(batches):
        q_ids, Qm, darr, p = bc.value
        K, nd = len(q_ids), len(darr)
        qn = np.sqrt(np.cumsum(Qm * Qm, axis=1)[:, p])  # (K, nd) prefix norms
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy().astype(np.int64)
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            vn = np.sqrt(np.cumsum(M * M, axis=1)[:, p])  # (B, nd)
            CH = 1024
            for s in range(0, len(ids), CH):
                m, v_ids, vnc = M[s : s + CH], ids[s : s + CH], vn[s : s + CH]
                b = len(v_ids)
                prod = m[:, None, :] * Qm[None, :, :]  # (b, K, D)
                cd = np.cumsum(prod, axis=2)[:, :, p]  # (b, K, nd)
                with np.errstate(divide="ignore", invalid="ignore"):
                    score = cd / (vnc[:, None, :] * qn[None, :, :])
                out = pd.DataFrame(
                    {
                        id_col: np.repeat(v_ids, K * nd),
                        q_id_col: np.tile(np.repeat(q_ids, nd), b),
                        "dim": np.tile(darr, b * K).astype("int32"),
                        "score": score.reshape(-1),
                    }
                )
                yield out[out[id_col] != out[q_id_col]]

    schema = f"{id_col} long, {q_id_col} long, dim int, score double"
    return df.select(id_col, vec_col).mapInPandas(run, schema=schema)
