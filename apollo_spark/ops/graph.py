"""Iterative graph algorithms over edge DataFrames.

The family connected_components (ops/dedup.py) belongs to, generalized: the
standard Spark iterative-join loop — per-iteration state is a small (node,
value) frame co-shuffled with the edge list, lineage truncated every
iteration with an eager localCheckpoint so the k-th iteration's action
doesn't re-execute the previous k-1 (the classic Spark iterative-algorithm
trap). At 100 TB the edge list dwarfs the node state: edges are scanned once
per iteration with map-side contribution combines; state never leaves the
cluster.

Engine-reproducible float policy (see memory: oracle-fp conventions): every
cross-row sum goes through DECIMAL(38,6) (order-independent), and the rank
state is re-quantized to DECIMAL(38,6) each iteration, so the whole
trajectory is bit-identical between Spark and any ANSI engine — PageRank is
gate-able against a DuckDB oracle with unrolled iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from apollo_spark.ops.cache import scoped_persist


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 5,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """Weighted PageRank with uniform dangling-mass redistribution, a fixed
    number of synchronous iterations (the deterministic formulation — no
    convergence test, so the result is a pure function of the graph):

        r_{t+1}(v) = (1-d)/N + d * (sum_{u->v} r_t(u) * w(u,v)/wout(u)
                                    + dangling_t / N)

    ``weight`` defaults to 1 per edge; integral weights (e.g. transition
    counts) keep every sum exact. Returns (node, rank) for every node that
    appears as a source or destination.

    Float policy — the whole trajectory lives on an INTEGER lattice: ranks
    are micro-units (rank * 1e6) held as BIGINT, every per-edge/per-node
    rounding is the engine-portable floor(x + 0.5), and every cross-row sum
    is an exact integer sum. DECIMAL(38,6) quantization was tried first and
    diverged: quantized ranks times binary-exact w/wout ratios (1/2, 1/4)
    land EXACTLY on .5 boundaries where Spark's HALF_UP double->decimal cast
    and DuckDB's disagree; floor on a deterministic double never does.

    Scale notes: |V| and the per-iteration dangling mass are the two
    bounded driver scalars (single longs — |V| additionally sizes the
    iteration shuffle width from the DATA, ~10k nodes/partition capped at
    the cluster's default parallelism, instead of inheriting a CPU-count
    constant for 100-row state; the dangling mass is a 1-row aggregate
    over the previous iteration's checkpoint, collected instead of riding
    a per-iteration BroadcastExchange); contributions combine map-side
    before the shuffle on dst; ranks are checkpointed eagerly per
    iteration to truncate lineage. Each iteration is ONE shuffle (contribs ∪ zero-state
    grouped by node) — the per-iteration left-join back onto the node table
    was replaced by a union with a zero-rank frame carrying the node set
    and its dangling flags, which the same groupBy folds in. Mirrors the
    reference's absence — apollo has no iterative tier at all (SURVEY §2.7
    gap family).
    """
    from decimal import Decimal

    scale = 1_000_000
    # (1-d) on the micro-lattice, computed in decimal space: for d=0.85 this
    # is exactly 150000 — Python's (1.0-0.85)*1e6 would be 150000.00000000003
    base_u = float(int((Decimal(1) - Decimal(str(damping))) * scale))
    spark = edges.sparkSession
    w = (F.col(weight) if weight else F.lit(1)).cast("double")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    # bounded driver scalar: |V| (one long), documented per repo convention.
    # Replaces the per-iteration crossJoin(broadcast(count)) AND derives the
    # iteration partition width from the graph instead of the core count.
    n_nodes = nodes.count()
    cap = spark.sparkContext.defaultParallelism
    parts = max(1, min(cap, (n_nodes + 9999) // 10000))
    nn = F.lit(n_nodes).cast("long")
    # integral edge weights sum exactly in double; wout is an exact integer
    outw = e.groupBy("src").agg(F.sum("w").alias("wout"))
    ed = e.join(outw, "src").repartition(parts, F.col("src")).persist()
    # dangling membership is a property of the GRAPH, not the iteration:
    # compute the flag once and carry it through the rank state, so the
    # per-iteration dangling mass is a conditional aggregate over `ranks`
    # instead of five rebuilt anti-joins against the edge table
    has_out = (
        outw.select(F.col("src").alias("node")).withColumn("__has_out", F.lit(True))
    )
    nodes_n = (
        nodes.join(has_out, "node", "left")
        .withColumn("__has_out", F.coalesce("__has_out", F.lit(False)))
        .repartition(parts, F.col("node"))
        .persist()
    )
    # zero-contribution frame: one row per node with its dangling flag —
    # unioned under every iteration's groupBy so absent-inlink nodes
    # surface with iu=0 and every node's flag rides along (max ignores the
    # NULL flags on contribution rows)
    zero = nodes_n.select("node", "__has_out", F.lit(None).cast("long").alias("cu"))
    # initial rank 1/N in micro-units
    ranks = nodes_n.select(
        "node", "__has_out", F.floor(F.lit(float(scale)) / nn + F.lit(0.5)).alias("ru")
    )
    from apollo_spark.ops.cache import flat_iteration

    # AQE off for the loop only: every round's shuffle width is the
    # |V|-derived `parts` above, so adaptive re-planning can change
    # nothing — it only adds a scheduling round-trip per materialized
    # exchange (measured ~2x on tiny-state rounds; plans/results identical)
    with flat_iteration(edges.sparkSession):
        for _ in range(iterations):
            # merge hint: both sides are already hash-partitioned on the
            # join key at the same width, so sort-merge zips them without
            # any exchange — the planner's size-based auto-broadcast would
            # otherwise build + ship a BroadcastExchange (a separate job)
            # EVERY iteration
            contribs = ed.join(ranks.hint("merge"), ed["src"] == ranks["node"]).select(
                F.col("dst").alias("node"),
                F.lit(None).cast("boolean").alias("__has_out"),
                # ru*w is an exact integer product (< 2^53); /wout is one IEEE
                # division; floor(x+0.5) rounds identically in any engine
                F.floor(F.col("ru") * F.col("w") / F.col("wout") + F.lit(0.5)).alias("cu"),
            )
            # dangling mass: a 1-row exact-long aggregate over the PREVIOUS
            # iteration's materialized checkpoint — collected as a bounded
            # driver scalar (one long, same convention as |V|) instead of
            # riding a per-iteration BroadcastExchange + crossJoin: the
            # broadcast build was a separate job per round
            du = ranks.agg(
                F.coalesce(F.sum(F.when(~F.col("__has_out"), F.col("ru"))), F.lit(0)).alias("du")
            ).first()["du"]
            ranks = (
                contribs.unionByName(zero)
                .repartition(parts, F.col("node"))
                .groupBy("node")
                .agg(
                    F.coalesce(F.sum("cu"), F.lit(0)).alias("iu"),  # exact long sum
                    F.max("__has_out").alias("__has_out"),
                )
                .select(
                    "node",
                    "__has_out",
                    F.floor(
                        F.lit(base_u) / nn
                        + F.lit(damping)
                        * (
                            F.col("iu").cast("double")
                            + F.lit(du).cast("long").cast("double") / nn
                        )
                        + F.lit(0.5)
                    ).alias("ru"),
                )
                # eager per-iteration checkpoint is load-bearing twice over:
                # truncates lineage AND materializes `ranks`, which the next
                # iteration reads TWICE (contributions + dangling mass) —
                # checkpointing every 2nd iteration was measured SLOWER (5.8s
                # vs 4.3s warm at sf0.1) because both subtrees recompute the
                # uncheckpointed iteration
                .localCheckpoint(eager=True)
            )
    out = ranks.select("node", (F.col("ru").cast("double") / F.lit(float(scale))).alias("rank"))
    if iterations > 0:
        # the last eager localCheckpoint materialized `ranks`, so the loop
        # intermediates are no longer reachable from `out` — free them now
        for f in (nodes, ed, nodes_n):
            f.unpersist()
        return out
    return scoped_persist(out, nodes, ed, nodes_n)


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected canonical form: drop self-loops, order endpoints
    (least, greatest), distinct."""
    a, b = F.col(src), F.col(dst)
    return (
        edges.filter(a != b)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
    )


def _degrees(canon: DataFrame) -> DataFrame:
    """(node, deg) of a canonical edge list — union both endpoints, count."""
    return (
        canon.select(F.col("a").alias("v"))
        .unionByName(canon.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def _oriented_wedges(edges: DataFrame, src: str, dst: str):
    """Shared triangle machinery: canonicalize (undirected, no self-loops,
    distinct), compute degrees, orient each edge low->high by (degree, id),
    and build the ordered wedge + closing-edge frames.

    Orientation bounds every out-degree by O(sqrt(m)), so total wedges are
    O(m^{3/2}) — the known worst-case optimum — instead of sum(d^2), which a
    hub node makes quadratic. Degree joins are UNHINTED: the degree table is
    O(nodes) (forced broadcast would OOM on a billion-node graph); AQE still
    broadcasts small build sides at runtime. Returns (canon, deg, wedges,
    closing); wedge rows carry (u, v, x) with (v, x) ordered by the same
    (degree, id) key the closing edges use, so each triangle closes exactly
    once. The oriented edge list is persisted alongside canon: THREE
    consumers read it (both wedge self-join branches and the closing-edge
    frame), and without the cache each re-runs the canon->degree->orient
    join chain — the before-plan of copurchase_triangles carried 139
    Exchange nodes from exactly that duplication (round-10 measurement)."""
    # persist is MEMORY_AND_DISK and LRU-evictable — a long session running
    # many graph queries sheds these blocks under pressure; callers needing a
    # hard release can spark.catalog.clearCache()
    canon = _canonical_edges(edges, src, dst).persist()
    deg = _degrees(canon)
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b"))
    keyed = canon.join(da, "a").join(db, "b")
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = keyed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("w"),
        F.when(a_first, F.col("deg_b")).otherwise(F.col("deg_a")).alias("deg_w"),
    ).persist()
    o1 = oriented.select(F.col("u"), F.col("w").alias("v"), F.col("deg_w").alias("deg_v"))
    o2 = oriented.select(F.col("u"), F.col("w").alias("x"), F.col("deg_w").alias("deg_x"))
    wedges = o1.join(o2, "u").filter(
        (F.col("deg_v") < F.col("deg_x"))
        | ((F.col("deg_v") == F.col("deg_x")) & (F.col("v") < F.col("x")))
    )
    closing = oriented.select(F.col("u").alias("v"), F.col("w").alias("x"))
    return canon, deg, wedges, closing, oriented


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Exact global triangle census via degree-ordered orientation (the
    node-iterator++ / Latapy algorithm; see _oriented_wedges for the scale
    argument). Input edges may be directed/duplicated/self-looped. Returns a
    1-row frame: n_nodes, n_edges, max_degree, n_triangles (exact BIGINTs)."""
    canon, deg, wedges, closing, ori = _oriented_wedges(edges, src, dst)
    tri = wedges.join(closing, ["v", "x"]).agg(F.count(F.lit(1)).alias("n_triangles"))
    summary = canon.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(
        deg.agg(F.count(F.lit(1)).alias("n_nodes"), F.max("deg").alias("max_degree"))
    )
    return scoped_persist(
        summary.crossJoin(tri).select("n_nodes", "n_edges", "max_degree", "n_triangles"),
        canon,
        ori,
    )


def local_clustering(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle participation + local clustering coefficient
    (Watts-Strogatz): c(v) = 2*tri(v) / (deg(v)*(deg(v)-1)), 0 for
    degree<2 nodes. Same oriented wedges as triangle_count; each closed
    triangle (u,v,x) explodes back to its three member nodes for the
    per-node census. Returns (node, deg, n_tri, coeff)."""
    canon, deg, wedges, closing, ori = _oriented_wedges(edges, src, dst)
    tri_nodes = (
        wedges.join(closing, ["v", "x"])
        .select(F.explode(F.array("u", "v", "x")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    coeff = F.when(
        F.col("deg") >= 2,
        F.lit(2.0) * F.col("n_tri").cast("double")
        / (F.col("deg") * (F.col("deg") - 1)).cast("double"),
    ).otherwise(F.lit(0.0))
    return scoped_persist(
        deg.select(F.col("v").alias("node"), "deg")
        .join(tri_nodes, "node", "left")
        .withColumn("n_tri", F.coalesce("n_tri", F.lit(0)))
        .select("node", "deg", "n_tri", coeff.alias("coeff")),
        canon,
        ori,
    )


def k_core_peel(
    edges: DataFrame,
    k: int = 2,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """k-core decomposition by synchronous peeling: each round removes every
    node whose CURRENT degree is < k together with its incident edges; after
    enough rounds the survivors are exactly the k-core (the standard
    dense-subgraph extractor — e.g. keeping only strongly-connected
    communities of a near-dup graph).

    Deterministic formulation: a FIXED number of synchronous rounds (like
    pagerank's fixed iterations), so the result is a pure function of
    (graph, k, rounds) and engine-reproducible — an unrolled SQL oracle
    replays it exactly. With rounds >= the peeling depth the result IS the
    k-core fixpoint; fewer rounds give the partially-peeled graph, same in
    both engines.

    Scale: each round is one degree groupBy + two semi-joins on the
    surviving edge list, lineage truncated per round with an eager
    localCheckpoint (the edge list is the big side; state never leaves the
    cluster). Returns (node, deg) of the surviving subgraph."""
    alive = _canonical_edges(edges, src, dst).localCheckpoint(eager=True)
    for _ in range(rounds):
        keep = _degrees(alive).filter(F.col("deg") >= k).select(F.col("v").alias("node"))
        alive = (
            alive.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
    return _degrees(alive).select(F.col("v").alias("node"), "deg")


def label_propagation(
    edges: DataFrame,
    rounds: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan et al.
    2007), made deterministic: every node starts labeled with its own id;
    each round it adopts the MOST FREQUENT label among its neighbors, ties
    broken toward the smallest label; isolated votes keep the current
    label. A FIXED round count makes the result a pure function of
    (graph, rounds) — an unrolled SQL oracle replays it exactly (the
    classic async/random-order LPA is unreproducible across engines).

    Distinct from connected components: frequency voting splits a sparse
    bridge between two dense clusters instead of flooding one min-id over
    everything reachable.

    Scale: per round one co-partitioned join of the edge list with the
    label table, a map-side-combined (node, label) count, and a per-node
    window over that node's distinct neighbor labels (frame = neighbor
    label count, not corpus). Lineage truncated per round with eager
    localCheckpoints, same iterative posture as pagerank/k_core_peel."""
    canon = _canonical_edges(edges, src, dst)
    und = (
        canon.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(canon.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .localCheckpoint(eager=True)
    )
    labels = und.select(F.col("u").alias("node")).distinct().withColumn("label", F.col("node"))
    for _ in range(rounds):
        votes = (
            und.join(labels.withColumnRenamed("node", "__vn"), und["v"] == F.col("__vn"))
            .groupBy("u", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        w = Window.partitionBy("u").orderBy(F.col("cnt").desc(), F.col("label").asc())
        best = (
            votes.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(F.col("u").alias("node"), F.col("label").alias("__new"))
        )
        labels = (
            labels.join(best, "node", "left")
            .select("node", F.coalesce(F.col("__new"), F.col("label")).alias("label"))
            .localCheckpoint(eager=True)
        )
    return labels


def random_walks(
    edges: DataFrame,
    walks_per_node: int = 2,
    walk_len: int = 4,
    src: str = "src",
    dst: str = "dst",
    salt: str = "walk",
) -> DataFrame:
    """Deterministic unweighted random walks (DeepWalk / node2vec p=q=1 data
    prep, Perozzi et al. 2014): ``walks_per_node`` walks of ``walk_len``
    steps from every node with out-edges.

    No RNG state: the step-t choice for walk (start, rep) is
    ``portable_hash60(salt|start|rep|t) % outdeg(cur)``, resolved against a
    per-source neighbor ranking (row_number by dst). That makes the walk set
    a pure function of the graph — resumable, engine-replayable (the SQL
    oracle unrolls the same joins), and shard-independent.

    Scale shape: one ranking window over the edge list, then walk_len
    equi-joins frontier-to-edges on (node, rank) — each step shuffles the
    frontier (nodes x walks_per_node rows), never the cross product. Walks
    stop early at sink nodes (inner join drops them). walk_len is a plan
    constant (loop unrolled into the DAG), matching the unrolled-iteration
    posture of pagerank/k-core above.

    Returns (start, rep, step, node): step 0 is the start node itself.
    """
    from apollo_spark.ops.sketch import portable_hash60

    # persist: every one of the walk_len steps re-joins ranked, and each
    # union branch re-evaluates its whole prefix — without this the
    # distinct+window upstream runs O(walk_len^2) times
    ranked = (
        edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d"))
        .distinct()
        .withColumn("__r", F.row_number().over(Window.partitionBy("__s").orderBy("__d")) - 1)
        .withColumn("__deg", F.count(F.lit(1)).over(Window.partitionBy("__s")))
        .persist()
    )
    starts = ranked.select(F.col("__s").alias("start")).distinct()
    frontier = starts.select(
        "start", F.explode(F.array(*[F.lit(r) for r in range(walks_per_node)])).alias("rep")
    ).select("start", "rep", F.col("start").alias("node"))
    out = [frontier.select("start", "rep", F.lit(0).alias("step"), "node")]
    for t in range(1, walk_len + 1):
        pick = portable_hash60(
            F.concat_ws("|", F.lit(salt), F.col("start"), F.col("rep"), F.lit(t))
        )
        # fresh aliases per step: the loop re-joins the same ranked plan, and
        # reused attribute ids would make the join condition ambiguous
        e = ranked.select(
            F.col("__s").alias(f"__s{t}"),
            F.col("__d").alias(f"__d{t}"),
            F.col("__r").alias(f"__r{t}"),
            F.col("__deg").alias(f"__deg{t}"),
        )
        frontier = (
            frontier.withColumn("__pick", pick)
            .join(e, F.col("node") == F.col(f"__s{t}"))
            .filter(F.col(f"__r{t}") == F.col("__pick") % F.col(f"__deg{t}"))
            .select("start", "rep", F.col(f"__d{t}").alias("node"))
        )
        out.append(frontier.select("start", "rep", F.lit(t).alias("step"), "node"))
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return scoped_persist(res, ranked)
