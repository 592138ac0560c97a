"""Physical-plan audits: pin the scale-critical plan properties so a
regression (lost pushdown, broadcast degrading to sort-merge/cartesian,
widened scans) fails CI before it costs anything at 100 TB.

These assert on `.explain("formatted")` output of the headline queries at
sf0.001 — plan shape is scale-invariant, so the small inputs are fine.
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest

from apollo_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def plan(spark, name: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES[name](spark, SF).explain("formatted")
    return buf.getvalue()


def scan_blocks(p: str) -> list[str]:
    """The per-scan detail blocks (PushedFilters/ReadSchema lines grouped)."""
    return re.split(r"\n\(\d+\) ", p)


def test_q6_filters_pushed_and_columns_pruned(spark):
    p = plan(spark, "q6_revenue_forecast")
    # every predicate reaches the parquet reader
    assert "GreaterThanOrEqual(l_shipdate" in p
    assert "LessThan(l_quantity,24.0)" in p
    assert "GreaterThanOrEqual(l_discount,0.03)" in p
    # scan reads exactly the 4 referenced columns of lineitem's 16
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_shipdate",
    }


def test_q5_all_joins_broadcast(spark):
    p = plan(spark, "q5_local_supplier_volume")
    # 5 dim joins, every one a broadcast hash join; the only shuffles are the
    # final aggregation/sort, never a join
    assert p.count("BroadcastHashJoin") >= 5
    assert "SortMergeJoin" not in p
    assert "ShuffledHashJoin" not in p
    # the region filter is pushed into the region scan, not applied post-join
    assert "EqualTo(r_name,ASIA)" in p


def test_dsl_pipeline_filter_pushdown(spark):
    # HCL schema -> Column compilation must stay Catalyst-transparent: the
    # compiled filter expression lands in the parquet PushedFilters
    p = plan(spark, "events_etl_dsl")
    assert "Not(EqualTo(value,0.0))" in p
    assert "Filter" in p or "PushedFilters: [IsNotNull(value)" in p


def test_asof_join_is_single_window_no_join(spark):
    # union+window as-of formulation: no join node at all, and both scans
    # push their event_type predicate
    p = plan(spark, "purchases_asof_click")
    assert "Window" in p
    assert "Join" not in p
    assert "EqualTo(event_type,purchase)" in p
    assert "EqualTo(event_type,click)" in p


def test_range_join_broadcasts_interval_side(spark):
    p = plan(spark, "orders_by_year_rangejoin")
    assert "BroadcastNestedLoopJoin" in p  # 7-row interval dim: broadcast, not shuffle
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {"o_totalprice", "o_orderdate"}


def test_semijoin_stays_semi_and_prunes(spark):
    p = plan(spark, "order_priority_semijoin")
    # EXISTS must compile to a semi join (match set never materialized),
    # and the orders date range must reach the scan
    assert "LeftSemi" in p
    assert "GreaterThanOrEqual(o_orderdate" in p
    # lineitem side reads only the two columns the condition needs
    ms = re.findall(r"ReadSchema: struct<([^>]*)>", p)
    li = [m for m in ms if "l_orderkey" in m]
    assert li and set(c.split(":")[0] for c in li[0].split(",")) == {"l_orderkey", "l_shipdate"}


def test_disjunctive_join_broadcasts_and_prunes(spark):
    p = plan(spark, "disjunctive_part_revenue")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    # Catalyst pushes each side's projection of the OR clause to its scan:
    # the brand/size disjunction to part, the quantity disjunction to lineitem
    assert "Or(Or(And(EqualTo(p_brand,Brand#1)" in p
    assert "GreaterThanOrEqual(l_quantity,1.0)" in p
    ms = re.findall(r"ReadSchema: struct<([^>]*)>", p)
    li = [m for m in ms if "l_partkey" in m]
    assert li and set(c.split(":")[0] for c in li[0].split(",")) == {
        "l_partkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    }


def test_trade_volume_dims_broadcast(spark):
    p = plan(spark, "nation_trade_volume")
    # both nation aliases + supplier broadcast; no cartesian anywhere
    assert p.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_returned_items_takeordered_not_full_sort(spark):
    p = plan(spark, "returned_items_report")
    # top-20 must plan as TakeOrderedAndProject, not a global sort
    assert "TakeOrderedAndProject" in p
    # returnflag filter reaches the lineitem scan
    assert "EqualTo(l_returnflag,R)" in p


def test_knn_broadcasts_query_side(spark):
    p = plan(spark, "knn_bruteforce")
    assert "BroadcastExchange" in p
    assert "LessThan(vec_id,3)" in p  # probe-set predicate pushed to its scan
    assert "SortMergeJoin" not in p


def test_top_customers_single_shuffle_window(spark):
    p = plan(spark, "top_customers_per_nation")
    assert "SortMergeJoin" not in p  # nation dim must broadcast
    assert "Window" in p


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Co-located join: both sides bucketed on the key -> SortMergeJoin with
    ZERO Exchange operators (the shuffle was paid once at landing)."""
    from apollo_spark.sources.tables import Catalog

    cat = Catalog(spark, SF)
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey", "l_quantity")
    o = spark.read.parquet(f"{SF}/orders.parquet").select("o_orderkey", "o_totalprice")
    lb = cat.land_bucketed("li_b", li, ["l_orderkey"], buckets=4, sort_cols=["l_orderkey"], path=str(tmp_path / "li_b"))
    ob = cat.land_bucketed("o_b", o, ["o_orderkey"], buckets=4, sort_cols=["o_orderkey"], path=str(tmp_path / "o_b"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lb.join(ob, lb["l_orderkey"] == ob["o_orderkey"])
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        p = buf.getvalue()
        assert "SortMergeJoin" in p
        assert "Exchange" not in p, p
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")


def test_partitioned_logs_prune_by_chain(spark, tmp_path, catalog):
    """100 TB layout: logs partitioned by chain -> a chain-filtered scan must
    prune partitions (PartitionFilters), not read-and-filter."""
    logs = catalog.table("logs")
    part_dir = str(tmp_path / "logs_part")
    logs.write.partitionBy("chain").parquet(part_dir)
    df = spark.read.parquet(part_dir).filter("chain = 'arbitrum'")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert re.search(r"PartitionFilters: \[.*chain.*arbitrum", p), p
    # the chain predicate is satisfied by pruning alone — no row-level filter
    assert df.count() == logs.filter("chain = 'arbitrum'").count()


def test_part_value_concentration_total_is_broadcast(spark):
    """The one-row global total must broadcast into the threshold filter,
    never shuffle the per-part side against it."""
    p = plan(spark, "part_value_concentration")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_late_delivery_suppliers_join_strategies(spark):
    """Semi stays semi, anti stays anti (no materialized intermediate), and
    the supplier dim broadcasts."""
    p = plan(spark, "late_delivery_suppliers")
    assert "LeftSemi" in p
    assert "LeftAnti" in p
    assert "BroadcastHashJoin" in p


def test_token_budget_sample_single_group_shuffle(spark):
    """One hash exchange on source for the running-sum window — the mix
    step must stay per-source parallel with no global sort."""
    p = plan(spark, "corpus_token_budget_sample")
    # exactly 2 exchanges: window partition + final presentation orderBy
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 2
    assert "hashpartitioning(source" in p
    # no Python in the row path
    assert "EvalPython" not in p


def test_pii_and_shuffle_queries_stay_jvm_side(spark):
    """Regex PII scan and the deterministic shuffle compile to pure JVM
    expressions — no Arrow/Python eval stage anywhere."""
    for name in ("pii_scrub_stats", "training_order_shuffle", "benchmark_decontamination"):
        p = plan(spark, name)
        assert "EvalPython" not in p, name


def test_market_share_dims_broadcast_facts_coshuffle(spark):
    """q8 shape: all 4 dimension joins broadcast; the only sort-merge-able
    pair is lineitem-orders (fact-fact) — and no cartesian anywhere."""
    p = plan(spark, "nation_market_share")
    assert p.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in p
    # region filter pushed into the region scan
    assert "EqualTo(r_name,ASIA)" in p


def test_bm25_scalars_broadcast_no_python(spark):
    """BM25: df table and the 1-row (N, avgdl) stats both broadcast; the only
    real shuffles are the token aggregations. Pure JVM — no Python eval."""
    p = plan(spark, "bm25_doc_search")
    assert p.count("BroadcastExchange") >= 2  # dfreq + stats (+ possibly doclen)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "CartesianProduct" not in p  # scalar crossJoin plans as broadcast NLJ
    assert "TakeOrderedAndProject" in p  # top-20 never global-sorts


def test_dsir_ratio_table_broadcast_no_python(spark):
    """DSIR: the log-ratio table (<= buckets rows) broadcasts into the
    per-doc join; corpus-side work is explode + hash aggregations only."""
    p = plan(spark, "dsir_importance_weights")
    assert "BroadcastExchange" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "CartesianProduct" not in p


def test_boilerplate_scrub_anti_join_unhinted_and_jvm_side(spark):
    """strip_hot_lines: the hot-segment anti-join carries NO broadcast hint —
    the optimizer may broadcast a hot set it estimates small (it is, at this
    SF), but nothing in the plan forces that when the hot set is huge at
    100 TB (AQE falls back to a shuffled join from runtime stats). Verified
    by planning with autoBroadcastJoinThreshold=-1: an unhinted plan degrades
    to a shuffled anti-join; a hinted one would still broadcast."""
    import contextlib
    import io

    p = plan(spark, "doc_boilerplate_scrub")
    assert "LeftAnti" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            QUERIES["doc_boilerplate_scrub"](spark, SF).explain("formatted")
        p2 = buf.getvalue()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    anti2 = [b for b in scan_blocks(p2) if "LeftAnti" in b]
    assert anti2 and not any("Broadcast" in b for b in anti2)


def test_corpus_order_windows_are_bucket_partitioned(spark):
    """pack_sequences / training_order must never run a corpus-sized
    unpartitioned window (one-task global sort): the doc-level window is
    partitioned by the 256-bucket hash prefix; the only unpartitioned
    windows operate on the 256-row bucket-offset frame."""
    p = plan(spark, "sequence_packing")
    assert re.search(r"windowspecdefinition\(__b#\d+, __h#\d+ ASC", p), p
    p2 = plan(spark, "training_order_shuffle")
    assert re.search(r"windowspecdefinition\(__b#\d+, shuffle_key#\d+ ASC", p2), p2
    # every UNPARTITIONED window spec (sort-spec-first, no leading partition
    # column) must be over the 256-row bucket-offset frame (__b), never a
    # corpus-sized input
    for pp in (p, p2):
        unpartitioned = re.findall(r"windowspecdefinition\((\S+) (?:ASC|DESC)", pp)
        assert unpartitioned, pp  # the bucket-offset window must exist
        for col in unpartitioned:
            assert col.startswith("__b#"), (col, pp)


def test_bloom_probe_is_broadcast_only_no_probe_shuffle(spark):
    """bloom_order_pruning: the orders probe side must see only broadcast
    exchanges before its aggregation — the whole point of the filter is to
    prune facts WITHOUT shuffling them. The bloom words and the exact dim
    both ride broadcasts; the only wide exchange is the final groupBy."""
    p = plan(spark, "bloom_order_pruning")
    assert "SortMergeJoin" not in p
    assert "ShuffledHashJoin" not in p
    # exactly one non-broadcast exchange: the per-priority aggregation
    wide = re.findall(r"Exchange hashpartitioning", p)
    assert len(wide) <= 2, p  # agg (+AQE may add one for the tiny bloom agg)


def test_jl_projection_is_scan_project_only(spark):
    """embedding_jl_projection must be a pure scan+project (per-row folds):
    no exchange at all before the final orderBy's range partitioning."""
    p = plan(spark, "embedding_jl_projection")
    assert "hashpartitioning" not in p, p


def test_covariance_exchange_is_bounded_by_dims(spark):
    """embedding_covariance_matrix: the wide exchanges must be keyed on
    dimension indices (i, j) / (pos) — never on vec_id — so the shuffle
    volume is O(partitions * d^2) regardless of corpus size."""
    p = plan(spark, "embedding_covariance_matrix")
    assert re.search(r"hashpartitioning\(i#\d+L?, j#\d+L?", p), "gram groupBy must key on (i, j)"
    assert not re.search(r"hashpartitioning\(vec_id", p), "no shuffle may be keyed on vec_id"


def test_winnowing_single_exchange_no_join(spark):
    """The winnowing rewrite's whole point: one shuffle on doc_id, three
    pipelined Window operators, NO join and NO distinct aggregate — a
    regression back to the argmin self-join would triple the exchanges."""
    p = plan(spark, "doc_winnowing_fingerprints")
    # exactly one data exchange besides the output sort's range partitioning
    hash_ex = len(re.findall(r"Arguments: hashpartitioning", p))
    assert hash_ex == 1, f"expected 1 hash exchange, plan:\n{p}"
    assert "Join" not in p
    assert len(re.findall(r"\(\d+\) Window", p)) >= 3


def test_minhash_portable_band_join_on_scalar_key(spark):
    """Band join must be a shuffled equi-join on the scalar band key (never a
    nested-loop over array keys), and the exact-verify joins stay equi."""
    p = plan(spark, "minhash_portable_dup_pairs")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_minhash_autotuned_arrow_sig_plan(spark):
    """The 256-hash autotuned pipeline (round 10): signatures ride the
    Arrow mapInPandas fast path — asserted on the signature frame itself
    (the query plan hides it behind the persisted InMemoryRelation and the
    ladder's localCheckpoint) — and every verify join in the full query
    (size prune + hashed-array rescore) stays equi (no cartesian, no
    broadcast nested loop)."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from apollo_spark.ops.dedup import _portable_sig_arrow, _shingle_base
    from apollo_spark.ops.sketch import portable_hash60

    d = spark.read.parquet(f"{SF}/documents.parquet")
    base = _shingle_base(d, "doc_id", "text", 3, None)
    hashed = base.select("id", F.explode("sh").alias("s")).select(
        "id", portable_hash60(F.col("s")).alias("h")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        _portable_sig_arrow(hashed, 256, with_fp=True).explain("formatted")
    sig_plan = buf.getvalue()
    assert "MapInPandas" in sig_plan
    # partial mins stay map-side combinable: the final agg is a plain
    # HashAggregate pair over the Arrow partials
    assert "HashAggregate" in sig_plan

    p = plan(spark, "minhash_autotuned_dup_pairs")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_simhash_portable_votes_are_hash_aggregate(spark):
    """Signature votes ride one partial+final HashAggregate pair (map-side
    combined), not an interpreted array fold; pairing joins stay equi."""
    p = plan(spark, "simhash_portable_near_dups")
    assert "HashAggregate" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_split_assignment_no_shuffle_before_agg(spark):
    """Split membership is a narrow map: the only exchange is the final
    (source, split) aggregation."""
    p = plan(spark, "corpus_split_assignment")
    assert len(re.findall(r"Arguments: hashpartitioning", p)) <= 1


def test_random_walks_frontier_joins_are_equi(spark):
    p = plan(spark, "item_transition_walks")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_tfidf_pairs_no_cartesian_and_stats_broadcast(spark):
    """The inverted-index self-join must stay an equi-join on term (a
    cartesian here is the df^2 catastrophe at scale), and the one-row corpus
    stats must ride a broadcast, not a shuffle."""
    p = plan(spark, "tfidf_dup_pairs")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p  # one-row stats crossJoin
    # scan reads only the two referenced columns of documents
    doc_scans = [b for b in scan_blocks(p) if "documents.parquet" in b]
    assert doc_scans and all("text" in b and "n_chars" not in b for b in doc_scans)


def test_tfidf_capped_rescore_not_full_selfjoin(spark):
    """The capped tfidf path must re-score candidates via keyed joins of the
    candidate set onto the weight table (fan-out bounded by candidates x
    terms-per-doc), never a second full inverted-index self-join — the full
    join is the quadratic the cap exists to avoid — and never per-pair
    term->weight MAP payloads (the round-9 shape: map_from_entries +
    interpreted aggregate over map_entries, measured ~5x the keyed-join
    rescore at sf0.1). The candidate join itself stays an equi-join on
    term."""
    p = plan(spark, "tfidf_capped_pairs")
    # per-pair maps gone: no map build, no interpreted map-entries fold
    assert "map_from_entries" not in p
    # b's weights attach through the keyed (id_b, term) equi-join — the
    # signature of the candidate-bounded rescore shape
    assert re.search(r"Left keys \[2\]: \[id_b#\d+L?, term#\d+\]", p), p[:2000]
    assert "CartesianProduct" not in p


def test_cdc_chunks_windows_are_doc_partitioned(spark):
    """CDC chunking is per-document array work (higher-order functions
    inside one projection) — the plan must carry NO window at all: the old
    explode -> per-doc-window form paid two sorts plus collect_list object
    churn and grew 6x per 3x data on the stress corpus. Any window that
    sneaks back in must at least stay doc-partitioned."""
    p = plan(spark, "cdc_chunk_dedup")
    specs = re.findall(r"windowspecdefinition\((\S+?),", p)
    assert specs == [], specs


def test_rag_chunks_windows_are_doc_partitioned(spark):
    """Sentence chunking's running word count rides per-document windows —
    same no-corpus-sized-window rule as CDC."""
    p = plan(spark, "doc_rag_chunks")
    for col in re.findall(r"windowspecdefinition\((\S+?),", p):
        assert col.startswith("id#"), col


def test_source_frequency_cap_first_window_is_salted(spark):
    """The per-source cap must rank within (source, __s) FIRST — a plain
    per-source window is the one-hot-domain-one-task hazard the op exists
    to avoid. The unsalted second window is legal: it sees <= salt*k
    survivors per key."""
    p = plan(spark, "source_frequency_cap")
    assert re.search(r"windowspecdefinition\(source#\d+, __s#\d+L?,", p), p[:2000]


def test_matryoshka_first_window_is_salted(spark):
    """matryoshka_recall's per-(q_id, dim) top-10 must rank within
    (q_id, dim, __s) FIRST — a plain (q_id, dim) window holds the whole
    corpus per probe (80 partitions x N rows, one task each). The unsalted
    second window sees <= salt*k survivors. Mirror of
    test_source_frequency_cap_first_window_is_salted."""
    p = plan(spark, "matryoshka_recall")
    assert re.search(r"windowspecdefinition\(q_id#\d+L?, dim#\d+, __s#\d+L?,", p), p[:2000]


def test_global_rank_queries_have_no_unbounded_onetask_window(spark):
    """The former scale-killers (global NTILE/rank over a corpus- or
    entity-sized frame in ONE task) must stay on the two-phase bucketed
    rank: every data-sized window is partitioned by __b; the only
    unpartitioned windows run over the <= n_buckets-row offset frame
    (leading sort column __b)."""
    for name in (
        "customer_balance_deciles",
        "customer_rfm_segments",
        "customer_pareto_share",
        "ccnet_quality_buckets",
    ):
        p = plan(spark, name)
        # the bucketed per-partition window must exist (__b-partitioned, or
        # (__m, __b)-partitioned for the single-shuffle multi-metric form)...
        assert re.search(r"windowspecdefinition\((?:__m#\d+, )?__b#\d+L?, ", p), name
        # ...and every UNPARTITIONED spec (sort-spec-first) is offsets-only
        for col in re.findall(r"windowspecdefinition\((\S+) (?:ASC|DESC)", p):
            assert col.startswith("__b#"), (name, col)


def test_topk_rank_queries_use_takeordered_not_global_window(spark):
    """zipf_token_slope / hybrid_rrf_search rank a top-k: the k-selection
    must be TakeOrderedAndProject (distributed per-partition top-k), with
    any rank window running over the <= k-row result — never a full-input
    single-task window."""
    for name, k_windows in (("zipf_token_slope", 1), ("hybrid_rrf_search", 4)):
        p = plan(spark, name)
        assert "TakeOrderedAndProject" in p, name
        unpartitioned = re.findall(r"windowspecdefinition\(\S+ (?:ASC|DESC)", p)
        # only the post-limit rank windows remain (plan reuse may repeat
        # them); they are bounded by the limit, not by input size
        assert len(unpartitioned) <= k_windows, (name, unpartitioned)


def test_top_revenue_suppliers_max_is_broadcast_scalar(spark):
    """The q15 global-max compare must be a broadcast scalar crossJoin, not
    a single-partition max window over the per-supplier rollup."""
    p = plan(spark, "top_revenue_suppliers")
    assert "windowspecdefinition" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p


def test_approx_ntile_has_no_sort_or_window(spark):
    """approx_ntile (the lake-scale quantile form): the whole point is ZERO
    ordered shuffles — the plan must contain no Sort, no Window, and no
    wide exchange on the data side; the percentile_approx cutoffs ride one
    broadcast into a crossJoin."""
    from pyspark.sql import functions as F

    from apollo_spark.ops.rank import approx_ntile

    cust = spark.read.parquet(f"{SF}/customer.parquet")
    out = approx_ntile(cust, F.col("c_acctbal"), 10)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    p = buf.getvalue()
    assert "Sort " not in p and "Window" not in p, p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p, p
    # the only allowed hash exchange is the cutoff aggregation's own
    # (1-row) partial->final step, never a repartition of the data side
    assert len(re.findall(r"Exchange hashpartitioning", p)) == 0, p


def test_memorization_risk_no_shingle_rejoin(spark):
    """doc_memorization_risk must NOT re-join the exploded shingle table
    against shingle-df (the corpus-sized, hot-key-skewed shape it shipped
    with): n_shared is derived algebraically (total - df==1 owned), so the
    only joins are doc-count-sized, and the only exchange over exploded
    shingles is the one map-side-combined groupBy on the shingle key."""
    p = plan(spark, "doc_memorization_risk")
    # no join keyed on the shingle column
    assert not re.search(r"Join.*\[s(#\d+)?\]", p), p
    # a single hash exchange on the shingle key
    assert len(re.findall(r"hashpartitioning\(s#", p)) == 1, p
    # top-20 is TakeOrdered, not a global sort
    assert "TakeOrderedAndProject" in p, p


def test_fuzzy_pairs_join_is_keyed_not_cartesian(spark):
    """The deletion-neighborhood join must be an equality join on the
    variant string (hash/sort-merge) — a cartesian or nested-loop here is
    the O(N^2) the op exists to avoid. Column pruning: the scan reads only
    (c_custkey, c_name)."""
    p = plan(spark, "fuzzy_entity_dup_pairs")
    assert "CartesianProduct" not in p and "NestedLoop" not in p
    assert re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", p), p[:1500]
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    assert m and set(re.findall(r"(\w+):", m.group(1))) == {"c_custkey"}, m and m.group(1)


def test_web_queries_prune_columns(spark):
    """url_canonical_dedup / blocked_domain_filter synthesize from
    (doc_id, source): the documents scan must not read text (the wide
    column)."""
    for name in ("url_canonical_dedup", "blocked_domain_filter"):
        p = plan(spark, name)
        for m in re.finditer(r"ReadSchema: struct<([^>]*)>", p):
            assert "text" not in m.group(1), (name, m.group(1))


def test_kcenter_round_broadcasts_centers_no_shuffle_before_agg(spark):
    """Each greedy k-center round must broadcast the ≤k selected centers
    against the corpus scan (BroadcastNestedLoopJoin) — a shuffle-based
    cross join would move the DATA side every round."""
    from apollo_spark.ops.clustering import _dot, _kcenter_round
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    ev = emb.select(
        F.col("vec_id").alias("__id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("__v"),
    )
    # kcenter_select's contract: self-norms ride in on the cached frame
    ev = ev.withColumn("__n2", _dot(F.col("__v"), F.col("__v")))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        _kcenter_round(ev, [0, 2, 5]).explain("formatted")
    p = buf.getvalue()
    assert "BroadcastNestedLoopJoin" in p, p[:2000]
    assert "CartesianProduct" not in p, p[:2000]


def test_bitext_margin_candidates_keyed_on_cluster_not_cartesian(spark):
    """The mining candidate join must be keyed on the lattice cluster id
    (hash or sort-merge on `cluster`) and the centroid joins must ride
    broadcasts — a CartesianProduct would be the corpus-quadratic shape the
    k∝N blocking exists to prevent."""
    p = plan(spark, "bitext_margin_mining")
    assert "CartesianProduct" not in p, p[:2000]
    assert "BroadcastExchange" in p, p[:2000]
    # the even x odd candidate join carries the cluster equi-key
    assert re.search(r"\[cluster#\d+L?\]", p), p[:2000]


def test_twolevel_kmeans_plan_cogroup_no_cartesian(spark):
    """Round-8 two-level k-means: the forced-two-level summary must run the
    fine level through cogroup (FlatMapCoGroupsInPandas — one cell's points
    meet one cell's centroids in a task), never a CartesianProduct or
    nested-loop join; no unpartitioned window anywhere (the per-cell seed
    row_number is partitioned by cell)."""
    p = plan(spark, "kmeans_twolevel_summary")
    assert "FlatMapCoGroupsInPandas" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    # every Window in the plan is keyed (no global-sort single-task window)
    for m in re.finditer(r"Arguments: \[[^\]]*row_number[^\]]*\], \[([^\]]*)\]", p):
        assert m.group(1).strip(), "unpartitioned window in twolevel plan"


def test_merge_completeness_plan_no_cartesian(spark):
    """lsh_merge_completeness composes banding + ladder + truth + two CC
    passes: the only nested-loop allowed is the 1-row scalar crossJoin tail
    (BroadcastNestedLoopJoin over single-row aggregates); a CartesianProduct
    anywhere is the quadratic the guard exists to avoid."""
    p = plan(spark, "lsh_merge_completeness")
    assert "CartesianProduct" not in p


def test_ivf_twolevel_plan_cogroup_no_centroid_broadcast(spark):
    """Round-9 two-level float IVF: fine-list assignment and query probing
    must run through cogroup (FlatMapCoGroupsInPandas — one cell's points
    meet one cell's centroid ROWS in a task). The fine centroid table must
    never ride a BroadcastExchange or nested-loop join: the whole point of
    the hierarchy is that the full K x D matrix exists in no single
    process (only the ceil(sqrt(k)) x D coarse matrix is broadcast, as an
    sc.broadcast inside the Arrow UDF, invisible to the plan)."""
    p = plan(spark, "knn_ivf_twolevel_full_probe")
    assert p.count("FlatMapCoGroupsInPandas") >= 2, p[:2000]  # assign + probe
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BroadcastExchange" not in p, "fine centroid table must not be broadcast"


def test_blocking_autotune_plan_one_vocab_shuffle_no_cartesian(spark):
    """blocking_autotune_config: the data-dependent cost must be ONE
    vocabulary-sized groupBy; the menu/stats composition rides 1-row/6-row
    broadcast nested-loop joins (never a CartesianProduct) and nothing
    sorts globally except the 6-row menu's LIMIT 1 selection."""
    p = plan(spark, "blocking_autotune_config")
    assert "CartesianProduct" not in p
    # the stats pass: exactly one aggregate over the exploded shingle vocab
    assert p.count("Exchange hashpartitioning(s#") <= 2, p[:1500]


def test_semantic_decontamination_plan_broadcast_bench(spark):
    """semantic_decontamination_report: the benchmark side must BROADCAST
    (tiny by definition) — a shuffled or cartesian corpus-vs-bench join is
    the quadratic this op exists to avoid — and the per-row argmax window
    must be keyed by vec_id, not global."""
    p = plan(spark, "semantic_decontamination_report")
    assert "BroadcastNestedLoopJoin BuildRight" in p or "BroadcastExchange" in p, p[:2000]
    assert "CartesianProduct" not in p
    for m in re.finditer(r"row_number\(\).*partitionBy=\[([^\]]*)\]", p):
        assert m.group(1).strip(), "unpartitioned argmax window"


def test_embedding_outlier_plan_keyed_window_arrow_assign(spark):
    """embedding_outlier_report: assignment runs through the Arrow map
    (MapInPandas/ArrowEvalPython — never the N x K relational distance
    join), and the outlier ranking window is cluster-keyed."""
    p = plan(spark, "embedding_outlier_report")
    assert "MapInPandas" in p or "ArrowEvalPython" in p, p[:2000]
    assert "CartesianProduct" not in p
    for m in re.finditer(r"Arguments: \[[^\]]*row_number[^\]]*\], \[([^\]]*)\]", p):
        assert m.group(1).strip(), "unpartitioned outlier window"
