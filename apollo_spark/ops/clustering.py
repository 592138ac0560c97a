"""Distributed k-means (Lloyd iterations) as pure relational algebra on an
engine-exact integer lattice.

Why a lattice: float means are summation-order-dependent, so two engines (or
two partitionings of the same engine!) disagree in the last ulp and the
trajectories diverge after a few iterations. Quantizing coordinates to
``floor((x + offset) * scale)`` BIGINTs makes every step — squared-distance
sums, argmin assignment, mean update via integer division — exact integer
arithmetic with one deterministic answer, which is what lets the driver gate
hash-match a DuckDB oracle running the same unrolled iterations. (Same
posture as ops/graph.py::pagerank's micro-unit lattice.)

Shape per iteration (N vectors, D dims, K clusters):
* assignment: long-format (N*D rows) join a BROADCAST centroid table (K*D
  rows) -> groupBy (vec, cluster) partial-agg distance -> argmin via
  ``min(struct(dist, cluster))`` (no window shuffle; map-side combinable);
* update: join assignments (N rows, broadcast when small) back to the long
  table -> groupBy (cluster, dim) integer-mean. Two shuffles per iteration,
  both on bounded keys; centroids are localCheckpoint'ed each round so the
  lineage (and recompute cost) stays flat — the pagerank lesson.

The ``offset`` must make every lattice coordinate non-negative: Spark's
``div`` truncates toward zero while DuckDB's ``//`` floors, so negative
integer means would disagree across engines. Distances are offset-invariant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_lattice(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = 1_000_000.0,
    offset: float = 8.0,
) -> DataFrame:
    """(id, d, xi): long-format integer-lattice coordinates. ``offset`` must
    exceed ``-min(x)`` so every xi is non-negative (see module docstring)."""
    return emb.select(
        id_col, F.posexplode(vec_col).alias("d", "__x")
    ).select(
        id_col,
        "d",
        F.floor((F.col("__x").cast("double") + F.lit(offset)) * F.lit(scale))
        .cast("long")
        .alias("xi"),
    )


def _collect_centroid_matrix(cent: DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """(cluster, d, ci) long-format centroids -> (cluster ids ASCENDING,
    dense (K, D) int64 matrix). Ascending order is load-bearing: numpy's
    argmin returns the FIRST minimum, which must mean the smallest cluster
    id to match the relational ``min(struct(dist, cluster))`` tie-break."""
    rows = cent.collect()
    clusters = sorted({r["cluster"] for r in rows})
    dmax = max(r["d"] for r in rows)
    idx = {c: i for i, c in enumerate(clusters)}
    C = np.zeros((len(clusters), dmax + 1), dtype=np.int64)
    for r in rows:
        C[idx[r["cluster"]], r["d"]] = r["ci"]
    return np.asarray(clusters, dtype=np.int64), C


def lattice_assign_arrow(
    emb: DataFrame,
    clusters: np.ndarray,
    cent_matrix: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = 1_000_000.0,
    offset: float = 8.0,
) -> DataFrame:
    """Arrow-batched argmin lattice assignment — bit-identical to the
    relational ``long JOIN broadcast(cent) GROUP BY`` form, without the
    N*D*K intermediate-row explosion that made corpus-proportional k
    (SemDeDup / margin mining, k = N/250) an N^2/250 JOIN at scale: the
    profiled sf3 whale run spent most of bitext_margin_mining's 261 s in
    these assignment passes.

    EXACTNESS argument (the "Arrow Gram" discipline, round 3): lattice
    coordinates are floor((float64(x) + offset) * scale) — numpy performs
    the identical IEEE float64 widen/add/multiply/floor — and every
    subsequent step (squared norms, the X @ C^T Gram, dist = xx + cc - 2g)
    is INTEGER arithmetic, associative and exact in int64. Magnitudes are
    bounded: |coord| <= 16.8e6 (offset 8, scale 1e6, |x| < 8.8), so a
    64-dim squared distance <= 64 * (3.4e7)^2 ~ 7.4e16 < 2^63. Ties break
    toward the smaller cluster id because ``clusters`` is ascending and
    np.argmin takes the first minimum."""
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast((clusters, cent_matrix))

    def run(batches):
        cl, C = bc.value
        cc = np.einsum("kd,kd->k", C, C)
        d = C.shape[1]
        for pdf in batches:
            if pdf.empty:
                continue
            # match the relational twin's drop semantics: posexplode emits
            # nothing for a NULL/empty vector, so that id drops out of the
            # assignment there — filter here instead of letting np.stack
            # raise an opaque shape error. A RAGGED vector (wrong non-zero
            # length) is a data bug the relational path would silently
            # half-sum; fail loudly with the offending ids instead.
            vecs = pdf[vec_col]
            lens = vecs.map(lambda v: 0 if v is None else len(v)).to_numpy(dtype=np.int64)
            ragged = (lens != 0) & (lens != d)
            if ragged.any():
                bad = pdf[id_col].to_numpy()[ragged][:5].tolist()
                raise ValueError(
                    f"lattice_assign_arrow: {vec_col} must be length {d}; "
                    f"ragged vectors for {id_col} in {bad}"
                )
            ok = lens == d
            if not ok.all():
                pdf = pdf[ok]
                if pdf.empty:
                    continue
                vecs = pdf[vec_col]
            ids = pdf[id_col].to_numpy()
            M = np.stack(vecs.to_numpy()).astype(np.float64)
            X = np.floor((M + offset) * scale).astype(np.int64)
            xx = np.einsum("bd,bd->b", X, X)
            g = X @ C.T
            dist = xx[:, None] + cc[None, :] - 2 * g
            j = np.argmin(dist, axis=1)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "cluster": cl[j],
                    "dist": dist[np.arange(len(j)), j],
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        run, schema=f"{id_col} long, cluster long, dist long"
    )


def _lattice_update_arrow(
    emb: DataFrame,
    clusters: np.ndarray,
    cent_matrix: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = 1_000_000.0,
    offset: float = 8.0,
) -> DataFrame:
    """One FUSED Lloyd round: assign each vector to its argmin centroid
    (byte-identical integer arithmetic to :func:`lattice_assign_arrow`)
    and emit per-(cluster, d) PARTIAL SUMS — at most K*D rows per Arrow
    batch — instead of N assignment rows. The caller groupBy-sums the
    partials and takes the integer mean, so the N*D lattice join + N-row
    shuffle + per-round checkpoint of the unfused update disappear: the
    only shuffle is batches x K*D map-side-combinable partial rows, tiny
    at any corpus size (guide §2.3, aggregate before you shuffle).

    Exactness: X and the argmin are the proven lattice_assign_arrow
    arithmetic; per-cluster coordinate sums are int64 adds (associative,
    exact — |sum per batch| <= 10^4 rows * 3.4e7 < 2^63), and Spark's
    long SUM of the partials is the same integers in a different order."""
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast((clusters, cent_matrix))

    def run(batches):
        cl, C = bc.value
        cc = np.einsum("kd,kd->k", C, C)
        K, d = C.shape
        dcol = np.arange(d, dtype=np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            vecs = pdf[vec_col]
            lens = vecs.map(lambda v: 0 if v is None else len(v)).to_numpy(dtype=np.int64)
            ragged = (lens != 0) & (lens != d)
            if ragged.any():
                bad = pdf[id_col].to_numpy()[ragged][:5].tolist()
                raise ValueError(
                    f"_lattice_update_arrow: {vec_col} must be length {d}; "
                    f"ragged vectors for {id_col} in {bad}"
                )
            ok = lens == d
            if not ok.all():
                pdf = pdf[ok]
                if pdf.empty:
                    continue
                vecs = pdf[vec_col]
            M = np.stack(vecs.to_numpy()).astype(np.float64)
            X = np.floor((M + offset) * scale).astype(np.int64)
            xx = np.einsum("bd,bd->b", X, X)
            g = X @ C.T
            dist = xx[:, None] + cc[None, :] - 2 * g
            j = np.argmin(dist, axis=1)
            S = np.zeros((K, d), dtype=np.int64)
            np.add.at(S, j, X)
            cnt = np.bincount(j, minlength=K).astype(np.int64)
            ks = np.nonzero(cnt > 0)[0]
            yield pd.DataFrame(
                {
                    "cluster": np.repeat(cl[ks], d),
                    "d": np.tile(dcol, len(ks)),
                    "sxi": S[ks].reshape(-1),
                    "n": np.repeat(cnt[ks], d),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        run, schema="cluster long, d integer, sxi long, n long"
    )


def kmeans_lattice(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = 1_000_000.0,
    offset: float = 8.0,
    impl: str = "arrow",
) -> tuple[DataFrame, DataFrame]:
    """``iters`` Lloyd rounds seeded from the first ``k`` ids' coordinates
    (deterministic — no RNG to reconcile across engines).

    Returns ``(assign, centroids)``:
    * assign: (id, cluster, dist) — final-round argmin assignment with its
      exact squared lattice distance (ties broken toward the smaller
      cluster id);
    * centroids: (cluster, d, ci) — post-update integer centroids (clusters
      that lost every member disappear, same as the SQL formulation).

    ``impl="arrow"`` (default) runs each assignment pass through
    :func:`lattice_assign_arrow` — same bits, no N*D*K row explosion (the
    update step stays relational either way: N*D rows, map-side combined
    onto <= K*D keys). ``impl="relational"`` keeps the pure-DataFrame twin
    the SQL oracles mirror; pytest pins the two paths equal.
    """
    if impl not in ("arrow", "relational"):
        raise ValueError(f"impl must be 'arrow' or 'relational', got {impl!r}")
    spark = emb.sparkSession
    long = embedding_lattice(emb, id_col, vec_col, scale, offset)
    cent = long.filter(F.col(id_col) < k).select(
        F.col(id_col).cast("long").alias("cluster"), "d", F.col("xi").alias("ci")
    )
    assign = None
    if impl == "arrow":
        # fused rounds: one job per round (the K*D partial-sum collect)
        # instead of assignment job + N*D-join update + eager checkpoint.
        # Post-update centroids are bounded driver state by the same
        # contract _collect_centroid_matrix already relies on (flat k is
        # auto-switched to two-level above 4096 clusters), so the (cluster
        # ids, K x D matrix) pair lives in numpy between rounds — no
        # per-round createDataFrame/collect round-trip (measured ~0.5 s
        # each on this driver), no checkpoint, flat lineage by
        # construction. The returned cent frame is built ONCE after the
        # last round.
        clusters, C = _collect_centroid_matrix(cent)
        for it in range(iters):
            if it == iters - 1:
                # returned trajectory: final-round PRE-update argmin
                assign = lattice_assign_arrow(
                    emb, clusters, C, id_col, vec_col, scale, offset
                )
            partial = _lattice_update_arrow(emb, clusters, C, id_col, vec_col, scale, offset)
            rows = (
                partial.groupBy("cluster", "d")
                .agg(F.sum("sxi").alias("sxi"), F.sum("n").alias("n"))
                .collect()
            )
            # next round's matrix straight from the collected partials;
            # xi >= 0 by the lattice offset contract, so Python // is the
            # same floor division as SQL `div` on these values
            kept = sorted({r["cluster"] for r in rows})
            idx = {c: i for i, c in enumerate(kept)}
            C = np.zeros((len(kept), C.shape[1]), dtype=np.int64)
            for r in rows:
                C[idx[r["cluster"]], r["d"]] = r["sxi"] // r["n"]
            clusters = np.asarray(kept, dtype=np.int64)
        cent = spark.createDataFrame(
            [
                (int(clusters[i]), d, int(C[i, d]))
                for i in range(len(clusters))
                for d in range(C.shape[1])
            ],
            "cluster long, d int, ci long",
        )
        return assign, cent
    for _ in range(iters):
        diff = F.col("xi") - F.col("ci")
        dist = (
            long.join(F.broadcast(cent), "d")
            .groupBy(id_col, "cluster")
            .agg(F.sum(diff * diff).alias("dist"))
        )
        assign = (
            dist.groupBy(id_col)
            .agg(F.min(F.struct("dist", "cluster")).alias("m"))
            .select(
                id_col, F.col("m.cluster").alias("cluster"), F.col("m.dist").alias("dist")
            )
        )
        cent = (
            long.join(assign.select(id_col, "cluster"), id_col)
            .groupBy("cluster", "d")
            .agg(F.expr("sum(xi) div count(1)").alias("ci"))
            .localCheckpoint(eager=True)  # flat lineage across rounds
        )
    return assign, cent


def lattice_final_assign(
    emb: DataFrame,
    cent: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = 1_000_000.0,
    offset: float = 8.0,
    impl: str = "arrow",
) -> tuple[DataFrame, DataFrame]:
    """Argmin assignment of every vector to the POST-UPDATE centroids —
    the ``fassign``/``fdist`` step every lattice SQL oracle replays (one
    extra assignment pass beyond kmeans_lattice's returned trajectory,
    which is pre-update of the final round). Shared by the IVF probe path,
    SemDeDup, and margin mining so the tie-break (ties toward the smaller
    cluster id) lives in exactly one place.

    Returns ``(assign, dist)``: assign = (id, cluster); dist = (id,
    cluster, dist) with the exact squared lattice distance to EVERY
    centroid (probe selection ranks over it).

    ``impl="arrow"`` (default) computes ``assign`` via
    :func:`lattice_assign_arrow` (bit-identical, no N*D*K join). The
    ``dist`` frame stays RELATIONAL in both modes — it is lazy, its only
    consumer (IVF probe ranking) filters to a handful of query ids and
    that predicate pushes below the join, so the full N*D*K explosion is
    never paid unless a caller actually asks for every row."""
    if impl not in ("arrow", "relational"):
        raise ValueError(f"impl must be 'arrow' or 'relational', got {impl!r}")
    long = embedding_lattice(emb, id_col, vec_col, scale, offset)
    diff = F.col("xi") - F.col("ci")
    dist = (
        long.join(F.broadcast(cent), "d")
        .groupBy(id_col, "cluster")
        .agg(F.sum(diff * diff).alias("dist"))
    )
    if impl == "arrow":
        clusters, C = _collect_centroid_matrix(cent)
        assign = lattice_assign_arrow(
            emb, clusters, C, id_col, vec_col, scale, offset
        ).select(id_col, "cluster")
    else:
        assign = (
            dist.groupBy(id_col)
            .agg(F.min(F.struct("dist", "cluster")).alias("m"))
            .select(id_col, F.col("m.cluster").alias("cluster"))
        )
    return assign, dist


def kmeans_summary(assign: DataFrame, centroids: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Gate view: per-cluster member count, exact within-cluster sum of
    squares (against the centroids the final assignment was made from), and
    an md5 digest of the post-update centroid lattice."""
    sizes = assign.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"), F.sum("dist").alias("wcss")
    )
    dig = centroids.groupBy("cluster").agg(
        F.md5(
            F.concat_ws(
                ",", F.sort_array(F.collect_list(F.concat_ws(":", F.col("d"), F.col("ci"))))
            )
        ).alias("centroid_digest")
    )
    return sizes.join(dig, "cluster").orderBy("cluster")


def pq_codes(
    emb: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = 1_000_000.0,
    offset: float = 8.0,
) -> DataFrame:
    """Product quantization (Jegou et al. 2011): split each vector into
    ``m`` contiguous subspaces of ``dim//m`` dims and run the engine-exact
    lattice k-means independently in each; a vector's code is its argmin
    centroid id per subspace — ``m * log2(k)`` bits instead of
    ``dim * 32``, the codebook trick behind IVF-PQ indexes at billion-vector
    scale.

    Returns long-format ``(id, subspace, code, dist)`` with ``dist`` the
    exact squared lattice distance to the chosen sub-centroid. Every step
    inherits kmeans_lattice's integer determinism, so the full code table
    is bit-reproducible by an unrolled SQL oracle. Each subspace pass
    broadcasts its k*(dim/m) centroid table; the m passes share the scan
    via whatever caching the caller applies upstream."""
    _, assign, _cent, _cbs = _pq_subspace_kmeans(
        emb, dim, m, k, iters, id_col, vec_col, scale, offset
    )
    return assign.select(
        id_col, F.col("s").alias("subspace"), F.col("cluster").alias("code"), "dist"
    )


def _pq_batch_lattice(pdf, id_col, vec_col, dim, scale, offset):
    """Shared batch preamble for the PQ Arrow passes: drop NULL/empty
    vectors (posexplode semantics), raise on ragged ones, return (ids,
    int64 lattice matrix) or None for an empty batch."""
    vecs = pdf[vec_col]
    lens = vecs.map(lambda v: 0 if v is None else len(v)).to_numpy(dtype=np.int64)
    ragged = (lens != 0) & (lens != dim)
    if ragged.any():
        bad = pdf[id_col].to_numpy()[ragged][:5].tolist()
        raise ValueError(
            f"pq arrow pass: {vec_col} must be length {dim}; ragged vectors for {id_col} in {bad}"
        )
    ok = lens == dim
    if not ok.all():
        pdf = pdf[ok]
        if pdf.empty:
            return None
        vecs = pdf[vec_col]
    M = np.stack(vecs.to_numpy()).astype(np.float64)
    X = np.floor((M + offset) * scale).astype(np.int64)
    return pdf[id_col].to_numpy(), X


def _pq_sub_dists(X, cbs, s, sub_d):
    """(B, k_s) exact integer distance matrix of batch subvectors to
    subspace ``s``'s codebook — the same xx + cc - 2g int64 arithmetic as
    lattice_assign_arrow, restricted to the subspace columns."""
    cl, C = cbs[s]
    Xs = X[:, s * sub_d : (s + 1) * sub_d]
    cc = np.einsum("kd,kd->k", C, C)
    xx = np.einsum("bd,bd->b", Xs, Xs)
    return xx[:, None] + cc[None, :] - 2 * (Xs @ C.T)


def _pq_assign_arrow(emb, cbs, dim, sub_d, id_col, vec_col, scale, offset):
    """(id, s, cluster, dist) argmin assignment of every vector's m
    subvectors against per-subspace codebooks ``cbs`` = [(cluster ids
    ASCENDING, (k_s, sub_d) int64 matrix), ...]. Ties break toward the
    smaller cluster id (ascending ids + argmin-first-minimum), matching
    the relational min(struct(dist, cluster))."""
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(cbs)
    n_sub = dim // sub_d

    def run(batches):
        cbs_ = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            prep = _pq_batch_lattice(pdf, id_col, vec_col, dim, scale, offset)
            if prep is None:
                continue
            ids, X = prep
            out_id, out_s, out_c, out_d = [], [], [], []
            for s in range(n_sub):
                dist = _pq_sub_dists(X, cbs_, s, sub_d)
                j = np.argmin(dist, axis=1)
                out_id.append(ids)
                out_s.append(np.full(len(ids), s, dtype=np.int32))
                out_c.append(cbs_[s][0][j])
                out_d.append(dist[np.arange(len(j)), j])
            yield pd.DataFrame(
                {
                    id_col: np.concatenate(out_id),
                    "s": np.concatenate(out_s),
                    "cluster": np.concatenate(out_c),
                    "dist": np.concatenate(out_d),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        run, schema=f"{id_col} long, s int, cluster long, dist long"
    )


def _pq_update_arrow(emb, cbs, dim, sub_d, id_col, vec_col, scale, offset):
    """One fused PQ Lloyd round: per batch, argmin-assign every subvector
    and emit per-(s, cluster, d) partial sums — at most dim * k rows per
    batch instead of the N*D*K lattice-join explosion (same discipline as
    :func:`_lattice_update_arrow`; d is the GLOBAL dimension index)."""
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(cbs)
    n_sub = dim // sub_d

    def run(batches):
        cbs_ = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            prep = _pq_batch_lattice(pdf, id_col, vec_col, dim, scale, offset)
            if prep is None:
                continue
            _, X = prep
            out_s, out_c, out_d, out_sxi, out_n = [], [], [], [], []
            for s in range(n_sub):
                cl, C = cbs_[s]
                dist = _pq_sub_dists(X, cbs_, s, sub_d)
                j = np.argmin(dist, axis=1)
                Xs = X[:, s * sub_d : (s + 1) * sub_d]
                S = np.zeros((len(cl), sub_d), dtype=np.int64)
                np.add.at(S, j, Xs)
                cnt = np.bincount(j, minlength=len(cl)).astype(np.int64)
                ks = np.nonzero(cnt > 0)[0]
                out_s.append(np.full(len(ks) * sub_d, s, dtype=np.int32))
                out_c.append(np.repeat(cl[ks], sub_d))
                out_d.append(
                    np.tile(np.arange(sub_d, dtype=np.int64) + s * sub_d, len(ks))
                )
                out_sxi.append(S[ks].reshape(-1))
                out_n.append(np.repeat(cnt[ks], sub_d))
            yield pd.DataFrame(
                {
                    "s": np.concatenate(out_s),
                    "cluster": np.concatenate(out_c),
                    "d": np.concatenate(out_d),
                    "sxi": np.concatenate(out_sxi),
                    "n": np.concatenate(out_n),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        run, schema="s int, cluster long, d integer, sxi long, n long"
    )


def _pq_subspace_kmeans(
    emb: DataFrame,
    dim: int,
    m: int,
    k: int,
    iters: int,
    id_col: str,
    vec_col: str,
    scale: float,
    offset: float,
    impl: str = "arrow",
):
    """All ``m`` per-subspace Lloyd trainings fused into ONE iteration: the
    subspace key just partitions the aggregation keyspace, so the m
    independent k-means runs share each round's passes instead of issuing
    m * iters sequential job chains.

    ``impl="arrow"`` (default): each round is ONE fused mapInPandas pass
    emitting per-(s, cluster, d) integer partial sums (<= dim*k rows per
    batch — no N*D*K join), with the codebooks held driver-side between
    rounds exactly like :func:`kmeans_lattice`; bit-identical by the same
    argument (int64 lattice arithmetic, ascending-cluster argmin
    tie-break, exact integer means). ``impl="relational"`` keeps the
    DataFrame twin the SQL oracles mirror; a pytest pins the two equal.

    Returns ``(long, assign, cent, cbs)``: the keyed lattice, the
    final-round pre-update argmin assignment (id, s, cluster, dist), the
    post-update codebook frame (s, cluster, d, ci), and (arrow mode) the
    post-update codebooks as the driver-side list ``cbs[s] = (cluster ids
    ASCENDING, (k_s, sub_d) int64 matrix)`` (None in relational mode)."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    if impl not in ("arrow", "relational"):
        raise ValueError(f"impl must be 'arrow' or 'relational', got {impl!r}")
    sub_d = dim // m
    spark = emb.sparkSession
    long = embedding_lattice(emb, id_col, vec_col, scale, offset).withColumn(
        "s", F.expr(f"cast(d div {sub_d} as int)")
    )
    cent = long.filter(F.col(id_col) < k).select(
        F.col(id_col).cast("long").alias("cluster"), "s", "d", F.col("xi").alias("ci")
    )
    assign = None
    if impl == "arrow":
        cbs = _collect_pq_codebooks(cent.collect(), m, sub_d)
        for it in range(iters):
            if it == iters - 1:
                assign = _pq_assign_arrow(emb, cbs, dim, sub_d, id_col, vec_col, scale, offset)
            partial = _pq_update_arrow(emb, cbs, dim, sub_d, id_col, vec_col, scale, offset)
            rows = (
                partial.groupBy("s", "cluster", "d")
                .agg(F.sum("sxi").alias("sxi"), F.sum("n").alias("n"))
                .collect()
            )
            # xi >= 0 by the lattice offset contract: Python // == SQL div
            cbs = _collect_pq_codebooks(
                [(r["cluster"], r["s"], r["d"], r["sxi"] // r["n"]) for r in rows],
                m,
                sub_d,
                tuples=True,
            )
        cent = spark.createDataFrame(
            [
                (s, int(cl[i]), s * sub_d + d, int(C[i, d]))
                for s, (cl, C) in enumerate(cbs)
                for i in range(len(cl))
                for d in range(sub_d)
            ],
            "s int, cluster long, d int, ci long",
        )
        return long, assign, cent, cbs
    for _ in range(iters):
        diff = F.col("xi") - F.col("ci")
        dist = (
            long.join(F.broadcast(cent), ["s", "d"])
            .groupBy(id_col, "s", "cluster")
            .agg(F.sum(diff * diff).alias("dist"))
        )
        assign = (
            dist.groupBy(id_col, "s")
            .agg(F.min(F.struct("dist", "cluster")).alias("m"))
            .select(id_col, "s", F.col("m.cluster").alias("cluster"), F.col("m.dist").alias("dist"))
        )
        cent = (
            long.join(assign.select(id_col, "s", "cluster"), [id_col, "s"])
            .groupBy("s", "cluster", "d")
            .agg(F.expr("sum(xi) div count(1)").alias("ci"))
            .localCheckpoint(eager=True)  # flat lineage across rounds
        )
    return long, assign, cent, None


def _collect_pq_codebooks(rows, m, sub_d, tuples=False):
    """Rows (cluster, s, d, ci) -> per-subspace (ascending cluster ids,
    (k_s, sub_d) int64 matrix); d is the GLOBAL dimension index."""
    per_s: list[dict] = [dict() for _ in range(m)]
    for r in rows:
        c, s, d, ci = r if tuples else (r["cluster"], r["s"], r["d"], r["ci"])
        per_s[s].setdefault(c, {})[d - s * sub_d] = ci
    out = []
    for s in range(m):
        cl = sorted(per_s[s])
        C = np.zeros((len(cl), sub_d), dtype=np.int64)
        for i, c in enumerate(cl):
            for d, ci in per_s[s][c].items():
                C[i, d] = ci
        out.append((np.asarray(cl, dtype=np.int64), C))
    return out


def twolevel_shape(k: int) -> tuple[int, int]:
    """(k_coarse, k_fine) split for the hierarchical k-means: kc =
    max(2, ceil(sqrt(k))) coarse cells, kf = ceil(k / kc) fine clusters per
    cell — kc * kf >= k with both factors ~sqrt(k). Pure integer math
    (isqrt), mirrored in SQL by GREATEST(2, CEIL(SQRT(k))): IEEE sqrt is
    correctly rounded, so CEIL agrees with the integer form for any
    k < 2^50 (a ULP near an exact square is far smaller than the 1/(2m)
    gap to the next integer)."""
    import math

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    kc = max(2, math.isqrt(k - 1) + 1 if k > 1 else 1)
    kf = -(-k // kc)
    return kc, kf


def _fine_assign_cogroup(
    pts: DataFrame,
    fcent: DataFrame,
    id_col: str,
    vec_col: str,
    scale: float,
    offset: float,
) -> DataFrame:
    """Per-cell argmin WITHOUT any driver collect or broadcast: points and
    their cell's fine centroids meet in the same task via cogroup, so the
    only thing that moves is one cell's centroid rows (<= kf * D) to the
    executors that hold that cell's points. This is the piece that removes
    the K x D driver bottleneck: no single process ever sees more than one
    cell's centroids.

    Bit-parity with the relational ``long JOIN fcent USING (cell, d)``
    argmin: identical lattice quantization, integer Gram distances, ties
    toward the smaller cluster id (centroid matrix sorted ascending,
    np.argmin takes the first minimum) — the same argument as
    lattice_assign_arrow.

    100 TB note: one task holds one cell's points (~N/kc rows); the coarse
    level exists precisely to bound that. A skewed mega-cell is the
    hierarchical analogue of the LSH mega-bucket — if rehearsals surface
    one, the fix is a third level inside that cell, not a bigger task."""
    import pandas as pd

    def fn(key, ppdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {id_col: pd.Series(dtype="int64"), "cell": pd.Series(dtype="int64"),
             "cluster": pd.Series(dtype="int64"), "dist": pd.Series(dtype="int64")}
        )
        if ppdf.empty or cpdf.empty:
            return empty
        clusters = np.sort(cpdf["cluster"].unique()).astype(np.int64)
        dmax = int(cpdf["d"].max())
        idx = {c: i for i, c in enumerate(clusters)}
        C = np.zeros((len(clusters), dmax + 1), dtype=np.int64)
        C[[idx[c] for c in cpdf["cluster"]], cpdf["d"].to_numpy()] = cpdf["ci"].to_numpy()
        d = C.shape[1]
        vecs = ppdf[vec_col]
        ok = vecs.map(lambda v: v is not None and len(v) == d).to_numpy(dtype=bool)
        ppdf = ppdf[ok]
        if ppdf.empty:
            return empty
        ids = ppdf[id_col].to_numpy()
        M = np.stack(ppdf[vec_col].to_numpy()).astype(np.float64)
        X = np.floor((M + offset) * scale).astype(np.int64)
        cc = np.einsum("kd,kd->k", C, C)
        xx = np.einsum("bd,bd->b", X, X)
        dist = xx[:, None] + cc[None, :] - 2 * (X @ C.T)
        j = np.argmin(dist, axis=1)
        return pd.DataFrame(
            {
                id_col: ids,
                "cell": np.full(len(ids), int(key[0]), dtype=np.int64),
                "cluster": clusters[j],
                "dist": dist[np.arange(len(j)), j],
            }
        )

    return pts.groupBy("cell").cogroup(fcent.groupBy("cell")).applyInPandas(
        fn, schema=f"{id_col} long, cell long, cluster long, dist long"
    )


def _fine_update_cogroup(
    pts: DataFrame,
    fcent: DataFrame,
    id_col: str,
    vec_col: str,
    scale: float,
    offset: float,
) -> DataFrame:
    """One FUSED fine Lloyd round: per-cell argmin (bit-identical to
    :func:`_fine_assign_cogroup`) and the post-update integer centroids
    emitted from the SAME cogroup call — the cogroup key is the cell, so
    the call holds the cell's COMPLETE point set and the per-(cluster, d)
    ``sum(xi) div count`` is final, not partial. The unfused round's
    N*D lattice explode, its join onto the N-row assignment and the
    (cell, cluster, d) shuffle disappear (guide §2.3/§1.2: one corpus
    pass and one cell-keyed shuffle per round instead of three).

    Exactness vs the relational twin: identical quantization and integer
    Gram argmin as _fine_assign_cogroup (ties to the smaller cluster id);
    xi >= 0 by the lattice offset contract so numpy ``//`` is SQL ``div``;
    ragged/None vectors are dropped exactly as the assign path drops them
    (the unfused update excluded them via the id join onto the assignment).
    Clusters that lose every member emit no rows, as in the groupBy."""
    import pandas as pd

    def fn(key, ppdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"cell": pd.Series(dtype="int64"), "cluster": pd.Series(dtype="int64"),
             "d": pd.Series(dtype="int32"), "ci": pd.Series(dtype="int64")}
        )
        if ppdf.empty or cpdf.empty:
            return empty
        clusters = np.sort(cpdf["cluster"].unique()).astype(np.int64)
        dmax = int(cpdf["d"].max())
        idx = {c: i for i, c in enumerate(clusters)}
        C = np.zeros((len(clusters), dmax + 1), dtype=np.int64)
        C[[idx[c] for c in cpdf["cluster"]], cpdf["d"].to_numpy()] = cpdf["ci"].to_numpy()
        d = C.shape[1]
        vecs = ppdf[vec_col]
        ok = vecs.map(lambda v: v is not None and len(v) == d).to_numpy(dtype=bool)
        ppdf = ppdf[ok]
        if ppdf.empty:
            return empty
        M = np.stack(ppdf[vec_col].to_numpy()).astype(np.float64)
        X = np.floor((M + offset) * scale).astype(np.int64)
        cc = np.einsum("kd,kd->k", C, C)
        xx = np.einsum("bd,bd->b", X, X)
        j = np.argmin(xx[:, None] + cc[None, :] - 2 * (X @ C.T), axis=1)
        S = np.zeros((len(clusters), d), dtype=np.int64)
        np.add.at(S, j, X)
        cnt = np.bincount(j, minlength=len(clusters)).astype(np.int64)
        ks = np.nonzero(cnt > 0)[0]
        return pd.DataFrame(
            {
                "cell": np.full(len(ks) * d, int(key[0]), dtype=np.int64),
                "cluster": np.repeat(clusters[ks], d),
                "d": np.tile(np.arange(d, dtype=np.int32), len(ks)),
                "ci": (S[ks] // cnt[ks, None]).reshape(-1),
            }
        )

    return pts.groupBy("cell").cogroup(fcent.groupBy("cell")).applyInPandas(
        fn, schema="cell long, cluster long, d integer, ci long"
    )


def kmeans_lattice_twolevel(
    emb: DataFrame,
    k: int,
    iters_coarse: int = 2,
    iters_fine: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = 1_000_000.0,
    offset: float = 8.0,
    impl: str = "arrow",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Two-level (coarse -> fine) engine-exact lattice k-means — the 100 TB
    replacement for flat corpus-proportional k (SemDeDup / margin mining,
    k = N/250): flat training collects and broadcasts ALL K x D centroids
    per Lloyd round (_collect_centroid_matrix), a driver cost that grows
    with the corpus. Here the driver only ever holds the kc = ceil(sqrt(k))
    COARSE centroids; the kc * kf >= k fine centroids live in a distributed
    table keyed by cell and are trained/assigned via cogroup, so driver and
    broadcast footprints are O(sqrt(k) * D) at any corpus size.

    Trajectory (all integer-lattice, hence replayable by an unrolled DuckDB
    oracle bit-for-bit):
    1. coarse: kmeans_lattice(k=kc, iters_coarse) on the full corpus;
       final-assign every vector to its coarse ``cell``;
    2. fine seeds: within each cell, the kf smallest ids' coordinates
       (cluster id = seed vec_id — globally unique, ties in any argmin
       break toward the smaller seed id, same convention as flat);
    3. iters_fine Lloyd rounds restricted to each vector's own cell:
       assignment never compares across cells (cogroup in arrow mode, a
       (cell, d)-keyed join in relational mode — N*D*kf rows, certification
       only); update is the post-assignment (cell, cluster, d) integer
       mean — in arrow mode FUSED into the same cogroup call
       (_fine_update_cogroup: the cell's full point set is already in the
       task, so the round is one cell-keyed shuffle), in relational mode
       one groupBy over the N*D lattice join.

    Returns ``(assign, fcent, ccent)``: assign = final-round pre-update
    (id, cell, cluster, dist); fcent = post-update fine centroids
    (cell, cluster, d, ci); ccent = coarse centroids (cluster, d, ci).
    Cells or clusters that lose every member disappear, as in flat."""
    if impl not in ("arrow", "relational"):
        raise ValueError(f"impl must be 'arrow' or 'relational', got {impl!r}")
    kc, kf = twolevel_shape(k)
    _, ccent = kmeans_lattice(
        emb, k=kc, iters=iters_coarse, id_col=id_col, vec_col=vec_col,
        scale=scale, offset=offset, impl=impl,
    )
    cells, _ = lattice_final_assign(
        emb, ccent, id_col=id_col, vec_col=vec_col, scale=scale, offset=offset, impl=impl
    )
    cells = cells.select(id_col, F.col("cluster").alias("cell")).localCheckpoint(eager=True)
    long = embedding_lattice(emb, id_col, vec_col, scale, offset).join(cells, id_col)
    from pyspark.sql import Window

    w = Window.partitionBy("cell").orderBy(F.col(id_col).asc())
    seeds = (
        cells.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= kf)
        .select(id_col)
    )
    fcent = (
        long.join(seeds, id_col)
        .select("cell", F.col(id_col).cast("long").alias("cluster"), "d", F.col("xi").alias("ci"))
        .localCheckpoint(eager=True)
        # fresh attribute ids: fcent and pts both descend from `cells`, and
        # cogroup would otherwise see the SAME `cell` attribute on both
        # sides (ambiguous-self-join analyzer error)
        .toDF("cell", "cluster", "d", "ci")
    )
    pts = emb.select(id_col, vec_col).join(cells, id_col) if impl == "arrow" else None
    assign = None
    for it in range(iters_fine):
        if impl == "arrow":
            # returned trajectory: final-round PRE-update argmin. Lazy — it
            # only executes if a consumer reads it; the round's update does
            # NOT go through it (fused cogroup below computes the identical
            # argmin internally and emits post-update centroids directly).
            if it == iters_fine - 1:
                assign = _fine_assign_cogroup(pts, fcent, id_col, vec_col, scale, offset)
            fcent = (
                _fine_update_cogroup(pts, fcent, id_col, vec_col, scale, offset)
                .localCheckpoint(eager=True)  # flat lineage across rounds
                .toDF("cell", "cluster", "d", "ci")  # fresh ids (see seeding note)
            )
            continue
        diff = F.col("xi") - F.col("ci")
        dist = (
            long.join(fcent, ["cell", "d"])
            .groupBy(id_col, "cell", "cluster")
            .agg(F.sum(diff * diff).alias("dist"))
        )
        assign = (
            dist.groupBy(id_col, "cell")
            .agg(F.min(F.struct("dist", "cluster")).alias("m"))
            .select(id_col, "cell", F.col("m.cluster").alias("cluster"), F.col("m.dist").alias("dist"))
        )
        fcent = (
            long.join(assign.select(id_col, "cluster"), id_col)
            .groupBy("cell", "cluster", "d")
            .agg(F.expr("sum(xi) div count(1)").alias("ci"))
            .localCheckpoint(eager=True)  # flat lineage across rounds
            .toDF("cell", "cluster", "d", "ci")  # fresh ids (see seeding note)
        )
    return assign, fcent, ccent


def twolevel_final_assign(
    emb: DataFrame,
    ccent: DataFrame,
    fcent: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = 1_000_000.0,
    offset: float = 8.0,
    impl: str = "arrow",
) -> DataFrame:
    """Assignment of every vector against POST-update two-level centroids
    (coarse argmin -> fine argmin within the winning cell) — the fassign
    step a two-level SQL oracle replays, and the serve-path for a persisted
    centroid artifact (train_or_load_centroids_twolevel): no training, two
    bounded passes. Returns (id, cell, cluster, dist)."""
    cells, _ = lattice_final_assign(
        emb, ccent, id_col=id_col, vec_col=vec_col, scale=scale, offset=offset, impl=impl
    )
    cells = cells.select(id_col, F.col("cluster").alias("cell"))
    if impl == "arrow":
        pts = emb.select(id_col, vec_col).join(cells, id_col)
        return _fine_assign_cogroup(pts, fcent, id_col, vec_col, scale, offset)
    long = embedding_lattice(emb, id_col, vec_col, scale, offset).join(cells, id_col)
    diff = F.col("xi") - F.col("ci")
    dist = (
        long.join(fcent, ["cell", "d"])
        .groupBy(id_col, "cell", "cluster")
        .agg(F.sum(diff * diff).alias("dist"))
    )
    return (
        dist.groupBy(id_col, "cell")
        .agg(F.min(F.struct("dist", "cluster")).alias("m"))
        .select(id_col, "cell", F.col("m.cluster").alias("cluster"), F.col("m.dist").alias("dist"))
    )


# Above this many clusters, production blocking switches from flat lattice
# k-means (driver collects K x D per Lloyd round) to the two-level hierarchy
# (driver bounded at ceil(sqrt(k)) x D). Every gate SF derives k far below
# this, so the oracle-replayed flat trajectory is untouched; at 100 TB
# (k = N/250 ~ millions) the two-level path engages automatically.
TWOLEVEL_THRESHOLD = 4096


def lattice_cluster_assign(
    emb: DataFrame,
    k: int,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = 1_000_000.0,
    offset: float = 8.0,
    twolevel_threshold: int = TWOLEVEL_THRESHOLD,
) -> DataFrame:
    """THE production cluster-blocking entry (SemDeDup, margin mining):
    final-assignment (id, cluster) per vector. k <= twolevel_threshold runs
    the flat trajectory the DuckDB oracles replay bit-for-bit; above it,
    the two-level hierarchy keeps the driver at O(sqrt(k) * D) — cluster
    ids remain globally-unique seed vec_ids in both paths, so downstream
    blocking semantics (group by cluster, ties toward smaller id) are
    identical in shape. Correctness of the two-level path is hash-gated at
    small scale by the forced-two-level queries (kmeans_twolevel_summary,
    semantic_dedup_twolevel)."""
    if k <= twolevel_threshold:
        _, cent = kmeans_lattice(
            emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col, scale=scale, offset=offset
        )
        assign, _ = lattice_final_assign(
            emb, cent, id_col=id_col, vec_col=vec_col, scale=scale, offset=offset
        )
        return assign.select(id_col, "cluster")
    _, fcent, ccent = kmeans_lattice_twolevel(
        emb, k, iters_coarse=iters, iters_fine=iters,
        id_col=id_col, vec_col=vec_col, scale=scale, offset=offset,
    )
    return twolevel_final_assign(
        emb, ccent, fcent, id_col=id_col, vec_col=vec_col, scale=scale, offset=offset
    ).select(id_col, "cluster")


def train_or_load_centroids_twolevel(
    emb: DataFrame,
    k: int,
    path: str,
    iters_coarse: int = 2,
    iters_fine: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = 1_000_000.0,
    offset: float = 8.0,
) -> tuple[DataFrame, DataFrame]:
    """Persisted two-level centroid artifact (same train-once/consume-many
    TxTable shape as ops.dedup.train_or_load_components): one table holds
    both levels — level=0 rows are the coarse centroids (cell == cluster),
    level=1 rows the fine centroids keyed by cell. Returns (ccent, fcent)
    frames read back FROM the table, so every consumer (assignment, probe
    selection, SemDeDup prune) shares one committed training run instead of
    re-paying iters_coarse + iters_fine Lloyd rounds. Concurrent builders
    are safe via train_or_load_table's idempotent CAS commit."""
    from apollo_spark.table_format import train_or_load_table

    spark = emb.sparkSession

    def build() -> DataFrame:
        _, fcent, ccent = kmeans_lattice_twolevel(
            emb, k, iters_coarse, iters_fine, id_col, vec_col, scale, offset
        )
        coarse = ccent.select(
            F.lit(0).alias("level"), F.col("cluster").alias("cell"),
            "cluster", "d", "ci",
        )
        fine = fcent.select(F.lit(1).alias("level"), "cell", "cluster", "d", "ci")
        return coarse.unionByName(fine)

    t = train_or_load_table(spark, path, build)
    ccent = t.filter(F.col("level") == 0).select("cluster", "d", "ci")
    fcent = t.filter(F.col("level") == 1).select("cell", "cluster", "d", "ci")
    return ccent, fcent


def kcenter_select(
    emb: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, int, float]]:
    """Greedy farthest-point (k-center / Gonzalez 1985) coreset selection:
    seed with the smallest id, then ``k-1`` times pick the vector whose
    minimum squared L2 distance to the already-selected set is LARGEST
    (ties toward the smaller id). The classic 2-approximation for the
    k-center objective and the standard diverse-subset / data-pruning
    primitive (e.g. coreset seeding for the SSL-prototype pruning of
    Sorscher et al. 2022).

    Returns ``[(sel_order, vec_id, radius2), ...]`` where ``radius2`` is the
    selected point's min squared distance to the prior set at selection time
    (0.0 for the seed) — the coverage radius trajectory.

    Scale shape: exactly ``k`` bounded driver rounds; each is ONE distributed
    scan — the ≤k selected vectors ride a broadcast, each candidate computes its
    min distance map-side (no shuffle on the data side beyond the 1-row
    argmax reduce), and only a single (id, dist) row is ever collected.
    The (id, vector, self-norm) frame is cast and persisted ONCE — every
    round (and the center lookup inside it) reads the cache, so the source
    is scanned once for all k rounds and no dot product is ever recomputed;
    cross-term work is O(k^2 · N · d) JVM-side with flat lineage (each
    round's plan starts at the cached frame, not the prior round's plan) —
    fine for the small k a coreset seed uses.

    Determinism: d2 = <y,y> - 2<y,c> + <c,c> with every dot a sequential
    left-to-right double fold — the exact expression an unrolled SQL oracle
    replays (min/argmax are comparisons, which never diverge).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    ev = emb.select(
        F.col(id_col).alias("__id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("__v"),
    )
    # self-norms once for ALL rounds (candidates and centers alike read the
    # same cached column — _kcenter_round's d2 and __cn2 both come from it)
    ev = ev.withColumn("__n2", _dot(F.col("__v"), F.col("__v"))).persist()
    try:
        seed = ev.select(F.min("__id").alias("m")).first()["m"]
        if seed is None:  # empty input: nothing to select (explicit, not TypeError)
            return []
        selected: list[tuple[int, int, float]] = [(0, int(seed), 0.0)]
        for it in range(1, k):
            ids = [vid for _, vid, _ in selected]
            row = _kcenter_round(ev, ids).first()
            if row is None:  # fewer distinct points than k
                break
            selected.append((it, int(row["__id"]), float(row["mind"])))
        return selected
    finally:
        ev.unpersist()


def _dot(a, b):  # sequential fold — SQL-replayable bit-for-bit
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _kcenter_round(ev: DataFrame, ids: list[int]) -> DataFrame:
    """One greedy k-center round: the 1-row (id, min-dist) argmax of
    ``ev`` = (__id, __v double[], __n2) against the ≤k selected centers.
    The center side rides a BroadcastNestedLoopJoin (it IS tiny by
    contract); the data side is one pass over the caller's cached frame
    with a map-side-combinable min.

    Squared norms ride in from the caller's persisted ``__n2`` column on
    BOTH sides (center norms are the same cached values, just aliased) —
    d2 = <y,y> - 2<y,c> + <c,c> evaluates the same sequential folds the
    SQL oracle replays, so the values are bit-identical, but only the
    cross term is a per-(candidate, center) fold (the naive per-pair form
    tripled the array work on the hot scan)."""
    cent = ev.filter(F.col("__id").isin(ids)).select(
        F.col("__v").alias("__cv"), F.col("__n2").alias("__cn2")
    )
    d2 = (
        F.col("__n2")
        - F.lit(2.0) * _dot(F.col("__v"), F.col("__cv"))
        + F.col("__cn2")
    )
    return (
        ev.filter(~F.col("__id").isin(ids))
        .crossJoin(F.broadcast(cent))
        .groupBy("__id")
        .agg(F.min(d2).alias("mind"))
        .orderBy(F.col("mind").desc(), F.col("__id").asc())
        .limit(1)
    )


__all__ = [
    "embedding_lattice",
    "kmeans_lattice",
    "kmeans_lattice_twolevel",
    "kmeans_summary",
    "lattice_cluster_assign",
    "lattice_final_assign",
    "kcenter_select",
    "pq_codes",
    "pq_adc_topk",
    "train_or_load_centroids_twolevel",
    "twolevel_final_assign",
    "twolevel_shape",
]


def pq_adc_topk(
    emb: DataFrame,
    query_ids: list[int],
    dim: int,
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    topk: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = 1_000_000.0,
    offset: float = 8.0,
) -> DataFrame:
    """Asymmetric distance computation (ADC) search over PQ codebooks: for
    each query, build the m x k table of exact squared lattice distances
    from the query's subvectors to every sub-centroid, then score each
    corpus vector as the SUM of table lookups at its codes — the
    IVF-PQ-style search that never touches raw corpus vectors at query
    time.

    Codes here are argmin against the FINAL post-update codebook (one extra
    assignment pass beyond kmeans_lattice's returned trajectory), which is
    the codebook ADC must use for consistency. Everything stays on the
    integer lattice, so the ranked result is engine-exact.

    Scale shape: codebooks (k * dim/m rows) and per-query distance tables
    (|queries| * k rows per subspace) ride broadcasts; the corpus is never
    shuffled until the (q_id, id) score aggregation, and at real scale an
    IVF cell filter in front bounds that fan-out to the probed cells.
    Ties break toward the smaller corpus id (deterministic ranking)."""
    qlit = [int(q) for q in query_ids]
    long, _assign, cent, cbs = _pq_subspace_kmeans(
        emb, dim, m, k, iters, id_col, vec_col, scale, offset
    )
    sub_d = dim // m
    if cbs is not None:
        # arrow path: codes vs the POST-update codebooks are one fused
        # assignment pass (no N*D*K lattice join); the per-query m x k
        # distance tables are a bounded driver computation — |queries| is
        # a caller-supplied list, so collecting those few vectors and
        # evaluating the same int64 lattice arithmetic in numpy replaces
        # the dist-table persist the codes argmin used to share
        codes = _pq_assign_arrow(emb, cbs, dim, sub_d, id_col, vec_col, scale, offset).select(
            id_col, "s", F.col("cluster").alias("code")
        )
        qrows = (
            emb.filter(F.col(id_col).isin(qlit)).select(id_col, vec_col).collect()
        )
        qd_rows = []
        for r in qrows:
            v = r[vec_col]
            if v is None or len(v) == 0:
                continue  # posexplode drops empty vectors in the relational twin
            if len(v) != dim:
                raise ValueError(f"pq_adc_topk: query {r[id_col]} vector length {len(v)} != {dim}")
            X = np.floor((np.asarray(v, dtype=np.float64) + offset) * scale).astype(
                np.int64
            )[None, :]
            for s in range(m):
                dist = _pq_sub_dists(X, cbs, s, sub_d)[0]
                cl = cbs[s][0]
                qd_rows.extend(
                    (int(r[id_col]), s, int(cl[i]), int(dist[i])) for i in range(len(cl))
                )
        qd = emb.sparkSession.createDataFrame(
            qd_rows, f"q_id long, s int, code long, qd long"
        )
    else:
        diff = F.col("xi") - F.col("ci")
        dist = (
            long.join(F.broadcast(cent), ["s", "d"])
            .groupBy(id_col, "s", "cluster")
            .agg(F.sum(diff * diff).alias("dist"))
            .persist()  # shared by the codes argmin and the query distance table
        )
        codes = (
            dist.groupBy(id_col, "s")
            .agg(F.min(F.struct("dist", "cluster")).alias("m"))
            .select(id_col, "s", F.col("m.cluster").alias("code"))
        )
        qd = dist.filter(F.col(id_col).isin(qlit)).select(
            F.col(id_col).alias("q_id"), "s", F.col("cluster").alias("code"), F.col("dist").alias("qd")
        )
    scored = (
        codes.join(F.broadcast(qd), ["s", "code"])
        .groupBy("q_id", id_col)
        .agg(F.sum("qd").alias("adc_dist"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("q_id", id_col, "adc_dist", "rank")
    )
    if cbs is not None:
        return out
    from apollo_spark.ops.cache import scoped_persist

    return scoped_persist(out, dist)
