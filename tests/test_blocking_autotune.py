"""Corpus-adaptive blocking geometry + boilerplate scrub (round 9).

The round-8 skew rehearsal's conclusion (BASELINE.md round-8 #2): no
mega-bucket guard can buy back recall the fixed r=2/b=16 geometry never had
at low truth thresholds, and the real fix for boilerplate cliques is
upstream removal. These tests pin the two levers that landed for it:

* blocking_config_profile / blocking_autotune — in-plan selection of
  (num_hashes, bands, rows, max_df_frac, scrub) from the analytic S-curve
  + a vocabulary-sized df pass (hash-gated end-to-end by the
  blocking_autotune_config registry query; here: the selection LOGIC);
* scrub_hot_shingles / scrub_max_df_frac threading — hot shingles removed
  from the shingle sets before signatures AND scoring, so
  boilerplate-only similarity never produces a pair.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

BOILER = "click here to subscribe now and never miss another weekly update from our team"


def _skewed_docs(spark, n_boiler=60, n_unique=30):
    """n_boiler docs sharing only BOILER (plus per-doc unique words) + two
    genuine duplicates + n_unique unrelated docs."""
    rows = [(i, f"{BOILER} u{i} v{i}") for i in range(n_boiler)]
    rows += [(100, "alpha beta gamma delta epsilon zeta"), (101, "alpha beta gamma delta epsilon zeta")]
    rows += [(200 + i, f"w{i} x{i} y{i} z{i} q{i} r{i} s{i}") for i in range(n_unique)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_profile_geometry_tracks_threshold(spark):
    """The chosen geometry is the cheapest qualifying menu entry under the
    corpus's preference order: r=4/b=8 at t=0.8 and the certified r=2/b=16
    default at t=0.5 (both orders agree); at t=0.2 — where the r=2/b=16
    capture is only 0.48 — a UNIFORM corpus takes the deep-signature
    r=2/b=128 entry (bounded low-j admission) while a boilerplate-flagged
    corpus takes r=1/b=32 (clique connectivity; frac_floor=0 exposes the
    flag at unit-test size)."""
    from apollo_spark.ops.dedup import blocking_config_profile

    d = _skewed_docs(spark)
    expect = {0.8: (32, 8, 4), 0.5: (32, 16, 2), 0.2: (256, 128, 2)}
    for t, (nh, b, r) in expect.items():
        row = blocking_config_profile(d, threshold=t).collect()[0]
        assert (row["rec_num_hashes"], row["rec_bands"], row["rec_rows"]) == (nh, b, r), t
        # capture matches the same IEEE chain computed in plain Python
        s = t**1 if r == 1 else (t * t if r == 2 else (t * t) * (t * t))
        x = 1.0 - s
        for _ in range(b.bit_length() - 1):
            x = x * x
        assert row["capture_at_threshold"] == 1.0 - x
        assert row["capture_at_threshold"] >= 0.95
    # the boilerplate order flips t=0.2 to the r=1 connectivity geometry
    row = blocking_config_profile(d, threshold=0.2, frac_floor=0).collect()[0]
    assert (row["rec_num_hashes"], row["rec_bands"], row["rec_rows"]) == (32, 32, 1)
    assert row["rec_max_bucket"] == 1024 and row["rec_scrub"] is True


def test_profile_flags_boilerplate_skew(spark):
    """rec_scrub fires on a corpus where hot shingles (df above the
    production cap) carry real occurrence mass, and stays off on a clean
    corpus. frac_floor=0 exposes the fraction semantics at unit-test size
    (production keeps 1024 so tiny corpora are never 'hot')."""
    from apollo_spark.ops.dedup import blocking_config_profile

    skew = blocking_config_profile(_skewed_docs(spark), frac_floor=0).collect()[0]
    assert skew["rec_scrub"] is True
    assert skew["hot_shingle_share"] > 0.002

    clean = spark.createDataFrame(
        [(i, f"a{i} b{i} c{i} d{i} e{i} f{i}") for i in range(50)], "doc_id long, text string"
    )
    row = blocking_config_profile(clean, frac_floor=0).collect()[0]
    assert row["rec_scrub"] is False
    assert row["hot_shingle_share"] == 0.0


def test_profile_frac_under_budget_monotone(spark):
    """rec_max_df_frac is the largest grid fraction whose predicted fan-out
    fits the linear budget; with a huge budget that is the grid max, with a
    zero budget the fallback keeps the cheapest (= smallest-fanout) tier."""
    from apollo_spark.ops.dedup import BLOCKING_FRAC_GRID, blocking_config_profile

    d = _skewed_docs(spark)
    big = blocking_config_profile(d, pair_budget_per_doc=10**9).collect()[0]
    assert big["rec_max_df_frac"] == BLOCKING_FRAC_GRID[-1]
    # zero budget: nothing qualifies -> fallback keeps the cheapest tier
    # (est is monotone in frac, ties broken toward the largest
    # equal-cost frac), so its fan-out can never exceed the budgeted pick
    zero = blocking_config_profile(d, pair_budget_per_doc=0, frac_floor=0).collect()[0]
    big0 = blocking_config_profile(d, pair_budget_per_doc=10**9, frac_floor=0).collect()[0]
    assert zero["est_capped_pairs"] <= big0["est_capped_pairs"]
    assert zero["rec_max_df_frac"] in BLOCKING_FRAC_GRID


def test_scrub_hot_shingles_removes_boilerplate(spark):
    """Hot shingles disappear from every doc's set; docs left with nothing
    informative are dropped; informative shingles survive untouched."""
    from apollo_spark.ops.dedup import _shingle_base, scrub_hot_shingles

    rows = [(i, f"{BOILER} u{i}") for i in range(20)]
    rows += [(50, BOILER)]  # pure boilerplate: nothing informative left
    rows += [(60, "alpha beta gamma delta")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    raw = _shingle_base(d, "doc_id", "text", 3, None)
    clean = scrub_hot_shingles(raw, 0.5).collect()
    by_id = {r["id"]: set(r["sh"]) for r in clean}
    assert 50 not in by_id  # pure-boilerplate doc dropped
    assert by_id[60] == {"alpha beta gamma", "beta gamma delta"}  # untouched
    # boiler docs keep only their unique boundary shingles
    for i in range(20):
        assert all(f"u{i}" in s for s in by_id[i])


def test_scrub_floor_small_corpus_survives(spark):
    """Round-10 ADVICE regression: on a corpus with n_docs < 1/frac the
    fractional cutoff floors to 0, and without the frac_floor guard every
    shingle (df >= 1) counted as hot — ALL docs were scrubbed away and
    near-dedup silently returned zero pairs. With the default floor of 1,
    df=1 (necessarily informative) shingles always survive; a threaded
    higher floor restores exact-dup pairing on tiny corpora."""
    from apollo_spark.ops.dedup import _shingle_base, scrub_hot_shingles

    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),  # exact dup of 1
        (3, "zeta eta theta iota kappa"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    # 3 docs at frac 0.04: floor(0.12) = 0 -> pre-fix cutoff 0, all hot,
    # EVERY doc dropped. Post-fix cutoff max(0, 1) = 1: doc 3's df=1
    # shingles survive; the dup pair's df=2 shingles are still over it.
    raw = _shingle_base(d, "doc_id", "text", 3, None)
    clean = scrub_hot_shingles(raw, 0.04).collect()
    assert 3 in {r["id"] for r in clean}  # unique content never wiped out
    # threading frac_floor=2 lets the exact-dup shingles (df=2) through too
    floored = scrub_hot_shingles(raw, 0.04, frac_floor=2).collect()
    assert {r["id"] for r in floored} == {1, 2, 3}


def test_minhash_scrub_kills_boilerplate_only_pairs(spark):
    """With scrub_max_df_frac, pairs similar ONLY via the planted hot line
    vanish while genuine duplicates still pair at jaccard 1.0 — the
    'clique edge mass disappears before banding' claim, in miniature."""
    from apollo_spark.ops.dedup import minhash_portable_pairs

    d = _skewed_docs(spark)
    loose = minhash_portable_pairs(d, threshold=0.3, max_bucket=8, max_bucket_mode="reband")
    boiler_pairs = loose.filter(F.col("id_a") < 100).count()
    assert boiler_pairs > 0  # boilerplate similarity pairs exist unscrubbed
    assert loose.filter((F.col("id_a") == 100) & (F.col("id_b") == 101)).count() == 1

    scrubbed = minhash_portable_pairs(
        d, threshold=0.3, max_bucket=8, max_bucket_mode="reband", scrub_max_df_frac=0.2
    )
    assert scrubbed.filter(F.col("id_a") < 100).count() == 0  # clique mass gone
    survivors = scrubbed.filter((F.col("id_a") == 100) & (F.col("id_b") == 101)).collect()
    assert len(survivors) == 1 and survivors[0]["jaccard"] == 1.0


def test_ngram_scrub_matches_minhash_semantics(spark):
    """ngram_jaccard_pairs under scrub scores the SCRUBBED sets: the
    boilerplate-only pairs fall below threshold, genuine dups stay 1.0."""
    from apollo_spark.ops.dedup import ngram_jaccard_pairs

    d = _skewed_docs(spark)
    pairs = ngram_jaccard_pairs(
        d, n=3, threshold=0.3, max_df=None, scrub_max_df_frac=0.2
    )
    assert pairs.filter(F.col("id_a") < 100).count() == 0
    assert pairs.filter((F.col("id_a") == 100) & (F.col("id_b") == 101)).count() == 1


def test_sig_arrow_bit_parity(spark):
    """The Arrow slot-min fast path (_portable_sig_arrow) is bit-identical
    to the interpreted JVM expression form at every geometry — the parity
    that keeps the DuckDB oracle replay valid."""
    from apollo_spark.ops.dedup import (
        _LO30,
        MH_PRIME,
        _mh_consts,
        _portable_sig_arrow,
        _shingle_base,
    )
    from apollo_spark.ops.sketch import portable_hash60

    rows = [(i, f"alpha beta gamma doc {i} with words {i % 7} {i % 3}") for i in range(40)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    base = _shingle_base(d, "doc_id", "text", 3, None)
    hashed = base.select("id", F.explode("sh").alias("s")).select(
        "id", portable_hash60(F.col("s")).alias("h")
    )
    for K in (64, 256):
        arrow = _portable_sig_arrow(hashed, K)
        hi = F.shiftright(F.col("h"), 30)
        lo = F.col("h").bitwiseAND(F.lit(_LO30))
        aggs = []
        for i in range(K):
            a, b, c = _mh_consts(i)
            aggs.append(
                F.min((hi * F.lit(a) + lo * F.lit(b) + F.lit(c)) % F.lit(MH_PRIME)).alias(f"m{i}")
            )
        jvm = hashed.groupBy("id").agg(*aggs)
        assert arrow.exceptAll(jvm).count() == 0
        assert jvm.exceptAll(arrow).count() == 0


def test_sig_arrow_tile_boundary_parity(spark):
    """Round 11: the Arrow pass computes slots in 512-row L2-resident tiles
    (the 32-proc DRAM-collapse fix); a doc whose postings SPAN tile
    boundaries emits one partial-min row per tile, and the final GROUP BY
    must recombine them to the exact JVM values — pinned here with a
    ~1500-posting doc (3 tiles) on both the plain and with_fp paths."""
    from apollo_spark.ops.dedup import (
        _LO30,
        MH_PRIME,
        _mh_consts,
        _portable_sig_arrow,
        _shingle_base,
    )
    from apollo_spark.ops.sketch import portable_hash60

    big = " ".join(f"w{i}" for i in range(1500))  # ~1498 distinct 3-shingles
    rows = [(0, big)] + [
        (i, f"alpha beta gamma doc {i} with words {i % 7}") for i in range(1, 8)
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
    base = _shingle_base(d, "doc_id", "text", 3, None)
    hashed = base.select("id", F.explode("sh").alias("s")).select(
        "id", portable_hash60(F.col("s")).alias("h")
    )
    K = 64
    arrow = _portable_sig_arrow(hashed, K)
    hi = F.shiftright(F.col("h"), 30)
    lo = F.col("h").bitwiseAND(F.lit(_LO30))
    aggs = []
    for i in range(K):
        a, b, c = _mh_consts(i)
        aggs.append(
            F.min((hi * F.lit(a) + lo * F.lit(b) + F.lit(c)) % F.lit(MH_PRIME)).alias(f"m{i}")
        )
    jvm = hashed.groupBy("id").agg(*aggs)
    assert arrow.exceptAll(jvm).count() == 0
    assert jvm.exceptAll(arrow).count() == 0
    # with_fp path: fingerprints must also recombine across tiles — compare
    # against themselves computed with postings split across MANY batches
    # (repartition forces different tile/batch boundaries)
    fp1 = _portable_sig_arrow(hashed, K, with_fp=True).select("id", "fparr")
    fp2 = _portable_sig_arrow(hashed.repartition(7), K, with_fp=True).select("id", "fparr")
    assert fp1.exceptAll(fp2).count() == 0
    assert fp2.exceptAll(fp1).count() == 0


def test_estimate_verify_equals_full(spark):
    """The estimate+rescore-sliver verify emits EXACTLY the full verify's
    pairs (same ids, same exact jaccard values) — estimation only prunes,
    and the margin keeps every true pair inside the rescored sliver."""
    from apollo_spark.ops.dedup import minhash_portable_pairs

    rows = []
    for i in range(30):
        rows.append((i, f"the quick brown fox {i} jumps over the lazy dog {i % 5}"))
        # planted near-dups: same text with a small suffix change
        rows.append((100 + i, f"the quick brown fox {i} jumps over the lazy dog {(i + 1) % 5}"))
    d = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(n=3, num_hashes=64, bands=32, threshold=0.3)
    full = sorted(
        tuple(r) for r in minhash_portable_pairs(d, verify="full", **kw).collect()
    )
    est = sorted(
        tuple(r) for r in minhash_portable_pairs(d, verify="estimate", **kw).collect()
    )
    assert len(full) > 0  # the planted dups actually pair
    assert est == full


def test_estimate_verify_prunes(spark):
    """A tight explicit margin really prunes: with margin ~0 the sliver
    excludes candidates whose estimate sits below the threshold, so the
    low-j candidate mass never reaches the shingle join (count via the
    plan: same emitted pairs here because estimates are tight at K=256)."""
    from apollo_spark.ops.dedup import minhash_portable_pairs

    rows = [(i, f"document number {i} about topic {i % 4} stuff words") for i in range(40)]
    rows += [(200, "exact duplicate pair text alpha beta gamma delta")]
    rows += [(201, "exact duplicate pair text alpha beta gamma delta")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = minhash_portable_pairs(
        d, n=3, num_hashes=64, bands=32, threshold=0.5, verify="estimate", estimate_margin=0.05
    ).collect()
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out}
    assert pairs[(200, 201)] == 1.0


def test_estimate_pathological_short_docs(spark):
    """Round-10 regression for the measured estimator pathology: the
    banding family's 2-universal LINEAR mix is unusable as a jaccard
    estimator — a shingle whose 60-bit md5 is small has near-minimal
    hi*a + lo*b + c for
    EVERY (a, b) and wins the argmin of all banding slots of the doc that
    contains it, so a true near-dup pair differing only in that shingle
    shows collapsed slot agreement (the first estimate-prune
    implementation dropped a j=0.947 pair exactly this way at sf0.1).
    This planted pair (verified offline against replicated slot
    arithmetic): linear-slot agreement 0.16 but true j = 10/13 = 0.769 —
    a band candidate the OLD estimator (0.16 < 0.5 - 0.15) silently
    pruned. The shipped estimator uses an independent splitmix64 avalanche
    family; the pair must survive with its exact jaccard."""
    from apollo_spark.ops.dedup import minhash_portable_pairs

    base_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    rows = [
        (1, base_text),
        (2, base_text + " tok0 filler word"),
    ]
    # background docs so banding has something to do
    rows += [(10 + i, f"unrelated doc {i} about topic {i} things {i}") for i in range(20)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = minhash_portable_pairs(
        d, n=3, num_hashes=256, bands=128, threshold=0.5, verify="estimate"
    ).collect()
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out}
    assert (1, 2) in pairs
    assert abs(pairs[(1, 2)] - 10.0 / 13.0) < 1e-9


def test_autotuned_pairs_end_to_end(spark):
    """minhash_autotuned_pairs: profile -> geometry -> ladder-guarded pairs.
    On the boilerplate corpus the profile recommends scrub (auto mode), so
    boilerplate-only pairs are gone and genuine dups survive."""
    from apollo_spark.ops.dedup import blocking_autotune, minhash_autotuned_pairs

    d = _skewed_docs(spark)
    cfg = blocking_autotune(d, threshold=0.3, frac_floor=0)
    assert cfg["scrub"] is True
    assert cfg["bands"] * cfg["rows"] == cfg["num_hashes"]
    pairs = minhash_autotuned_pairs(d, threshold=0.3, config=cfg, scrub=0.2)
    assert pairs.filter((F.col("id_a") == 100) & (F.col("id_b") == 101)).count() == 1
    assert pairs.filter(F.col("id_a") < 100).count() == 0


def test_dsl_autotune_and_scrub_validation():
    from apollo_spark.dsl.schema import SchemaError, parse_schema

    def q(body):
        return f"""
query x {{
  chain = "ethereum"
  source_table = "documents"
  dedup {{ {body} }}
  save {{ doc_id = doc_id }}
}}
"""

    with pytest.raises(SchemaError, match="autotune"):
        parse_schema(q('method = "exact"\n autotune = true'))
    # ngram_jaccard and tfidf accept autotune (profile-chosen df-cap;
    # tfidf since round 10)
    assert parse_schema(q('method = "ngram_jaccard"\n autotune = true')).queries[0].dedup.autotune
    assert parse_schema(q('method = "tfidf"\n autotune = true')).queries[0].dedup.autotune
    with pytest.raises(SchemaError, match="near-dup"):
        parse_schema(q('method = "exact"\n scrub_boilerplate = true'))
    with pytest.raises(SchemaError, match="shingle-level scrub"):
        parse_schema(q('method = "tfidf"\n scrub_boilerplate = true'))
    with pytest.raises(SchemaError, match="scrub_mode"):
        parse_schema(q('method = "minhash"\n scrub_mode = "words"'))
    s = parse_schema(
        q('method = "minhash"\n autotune = true\n scrub_boilerplate = true\n scrub_max_df_frac = 0.2')
    )
    spec = s.queries[0].dedup
    assert spec.autotune is True and spec.scrub_boilerplate is True
    assert spec.scrub_max_df_frac == 0.2 and spec.scrub_mode == "shingle"
    # unset scrub_boilerplate stays None (= auto under autotune)
    assert parse_schema(q('method = "minhash"')).queries[0].dedup.scrub_boilerplate is None


def test_dsl_dedup_scrub_shingle_e2e(spark, tmp_path):
    """`dedup { method="minhash", scrub_boilerplate = true }`: grouping runs
    over scrubbed shingles — boilerplate-only twins BOTH survive, genuine
    dups still collapse, and output rows keep their ORIGINAL text."""
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.pipeline import compile_query
    from apollo_spark.sources.tables import Catalog

    rows = [(i, f"{BOILER} unique{i} tail{i}") for i in range(1, 9)]
    rows += [(20, "alpha beta gamma delta epsilon"), (21, "alpha beta gamma delta epsilon")]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    catalog = Catalog(spark, str(tmp_path))
    schema = parse_schema(
        """
query scrub_dedup {
  chain = "ethereum"
  source_table = "documents"
  dedup {
    method = "minhash"
    threshold = 0.3
    scrub_boilerplate = true
    scrub_max_df_frac = 0.3
  }
  save {
    doc_id = doc_id
    text = text
  }
}
"""
    )
    out = compile_query(spark, catalog, schema.queries[0], schema).toPandas()
    ids = sorted(out["doc_id"])
    assert 20 in ids and 21 not in ids  # genuine dup still collapses
    assert all(i in ids for i in range(1, 9))  # boilerplate-only twins all survive
    # original text preserved on survivors
    assert out.set_index("doc_id").loc[1, "text"].startswith(BOILER.split()[0])

    # control: same corpus without scrub at the same threshold merges the
    # boilerplate family into one survivor
    schema2 = parse_schema(
        """
query noscrub_dedup {
  chain = "ethereum"
  source_table = "documents"
  dedup {
    method = "minhash"
    threshold = 0.3
  }
  save { doc_id = doc_id }
}
"""
    )
    out2 = compile_query(spark, catalog, schema2.queries[0], schema2).toPandas()
    assert sum(1 for i in out2["doc_id"] if i < 20) < 8


def test_dsl_dedup_scrub_lines_e2e(spark, tmp_path):
    """`scrub_mode = "lines"` composes strip_hot_lines with the dedup block:
    a newline boilerplate banner shared by most docs stops creating dup
    groups, while docs identical up to the banner still collapse."""
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.pipeline import compile_query
    from apollo_spark.sources.tables import Catalog

    banner = "subscribe to the newsletter"
    rows = [(i, f"{banner}\nwa{i} wb{i} wc{i} wd{i} we{i} wf{i}") for i in range(1, 8)]
    # 10 and 11: identical real content, one carries the banner
    rows += [(10, f"{banner}\nshared corpus text body"), (11, "shared corpus text body")]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    catalog = Catalog(spark, str(tmp_path))
    schema = parse_schema(
        """
query line_scrub {
  chain = "ethereum"
  source_table = "documents"
  dedup {
    method = "ngram_jaccard"
    shingle_n = 1
    threshold = 0.6
    scrub_boilerplate = true
    scrub_mode = "lines"
    scrub_max_df_frac = 0.5
  }
  save { doc_id = doc_id }
}
"""
    )
    out = compile_query(spark, catalog, schema.queries[0], schema).toPandas()
    ids = sorted(out["doc_id"])
    assert all(i in ids for i in range(1, 8))  # banner alone groups nothing
    assert 10 in ids and 11 not in ids  # banner-stripped twins collapse


def test_component_artifact_scrub_option(spark, tmp_path):
    """doc_component_table / train_or_load_components accept the scrub: on a
    planted-boilerplate corpus the unscrubbed table merges the banner
    family into one component while the scrubbed artifact keeps only the
    genuine duplicate pair grouped — and the scrubbed table persists/loads
    through the TxTable path like any other component artifact."""
    from apollo_spark.ops.dedup import doc_component_table, train_or_load_components

    rows = [(i, f"{BOILER} unique{i} tail{i}") for i in range(1, 9)]
    rows += [(20, "alpha beta gamma delta epsilon"), (21, "alpha beta gamma delta epsilon")]
    d = spark.createDataFrame(rows, "doc_id long, text string")

    plain = doc_component_table(d, threshold=0.3).toPandas()
    fam = plain[plain["doc_id"] < 20]["component"]
    assert len(fam) == 8 and fam.nunique() == 1  # banner family merged

    scrubbed = doc_component_table(d, threshold=0.3, scrub_max_df_frac=0.3).toPandas()
    ids = set(scrubbed["doc_id"])
    assert ids == {20, 21}  # only the genuine dup pair remains grouped

    path = str(tmp_path / "comp_scrub")
    a = train_or_load_components(
        d, path=path, threshold=0.3, scrub_max_df_frac=0.3
    ).toPandas().sort_values("doc_id").reset_index(drop=True)
    b = train_or_load_components(
        d, path=path, threshold=0.3, scrub_max_df_frac=0.3
    ).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b) and set(a["doc_id"]) == {20, 21}


def test_dsl_ngram_autotune_e2e(spark, tmp_path):
    """`dedup { method = "ngram_jaccard", autotune = true }` takes the
    profile's budgeted df-cap instead of the static 0.04 and still drops
    the planted duplicate."""
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.pipeline import compile_query
    from apollo_spark.sources.tables import Catalog

    rows = [(i, f"uw{i} ux{i} uy{i} uz{i} uq{i}") for i in range(1, 30)]
    rows += [(50, "alpha beta gamma delta epsilon"), (51, "alpha beta gamma delta epsilon")]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    catalog = Catalog(spark, str(tmp_path))
    schema = parse_schema(
        """
query ngram_auto {
  chain = "ethereum"
  source_table = "documents"
  dedup {
    method = "ngram_jaccard"
    threshold = 0.5
    shingle_n = 1
    autotune = true
  }
  save { doc_id = doc_id }
}
"""
    )
    out = compile_query(spark, catalog, schema.queries[0], schema).toPandas()
    ids = sorted(out["doc_id"])
    assert 50 in ids and 51 not in ids
    assert all(i in ids for i in range(1, 30))


def test_dsl_decontaminate_block_e2e(spark, tmp_path):
    """`decontaminate { benchmark_table = ... }`: docs sharing a 5-gram with
    any benchmark row are dropped before dedup; clean docs survive; a
    missing benchmark table is a compile-time pipeline error."""
    import pytest as _pytest

    from apollo_spark.dsl.schema import SchemaError, parse_schema
    from apollo_spark.pipeline import PipelineError, compile_query
    from apollo_spark.sources.tables import Catalog

    leak = "what is the capital of france answer paris"
    rows = [(1, f"intro text {leak} trailing words"), (2, "independent document about rivers and dams entirely"), (3, "another clean doc on graph algorithms and spark shuffles")]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    spark.createDataFrame([(100, leak)], "bench_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "benchmark.parquet"))
    catalog = Catalog(spark, str(tmp_path))
    schema = parse_schema(
        """
query decon {
  chain = "ethereum"
  source_table = "documents"
  decontaminate {
    benchmark_table = "benchmark"
    ngram = 5
  }
  save { doc_id = doc_id }
}
"""
    )
    out = compile_query(spark, catalog, schema.queries[0], schema).toPandas()
    assert sorted(out["doc_id"]) == [2, 3]

    with _pytest.raises(SchemaError, match="benchmark_table"):
        parse_schema(
            """
query bad {
  chain = "ethereum"
  source_table = "documents"
  decontaminate { ngram = 5 }
  save { doc_id = doc_id }
}
"""
        )
    schema2 = parse_schema(
        """
query missing_tbl {
  chain = "ethereum"
  source_table = "documents"
  decontaminate { benchmark_table = "nope" }
  save { doc_id = doc_id }
}
"""
    )
    with _pytest.raises(PipelineError, match="nope"):
        compile_query(spark, catalog, schema2.queries[0], schema2).collect()


def test_uniform_geometry_matches_profile_selection(spark):
    """uniform_geometry's analytic replication (plain-Python squaring
    chains over the same menu) equals what blocking_config_profile picks
    on a UNIFORM corpus at the same thresholds — the guarantee that the
    scrub-time geometry override selects exactly what profiling the
    scrubbed corpus would have."""
    from apollo_spark.ops.dedup import blocking_config_profile, uniform_geometry

    clean = spark.createDataFrame(
        [(i, f"a{i} b{i} c{i} d{i} e{i} f{i}") for i in range(60)], "doc_id long, text string"
    )
    for t in (0.8, 0.5, 0.2):
        row = blocking_config_profile(clean, threshold=t).collect()[0]
        g = uniform_geometry(t)
        assert (g["num_hashes"], g["bands"], g["rows"], g["max_bucket"]) == (
            row["rec_num_hashes"],
            row["rec_bands"],
            row["rec_rows"],
            row["rec_max_bucket"],
        ), t
        assert g["capture"] == row["capture_at_threshold"], t


def test_scrub_overrides_r1_geometry(spark):
    """Round-10 disk-death regression (sf3skew DSL rehearsal): when the
    profile flags boilerplate (r=1 geometry) AND scrub engages, the
    banding must take the uniform-order geometry — r=1 over the scrubbed
    uniform remnants is the measured-quadratic saturated-vocab regime.
    Pinned through minhash_autotuned_pairs: with scrub auto on a flagged
    corpus the genuine dup still pairs (uniform geometry at work), and
    boilerplate-only docs produce no pairs."""
    from apollo_spark.ops.dedup import blocking_autotune, minhash_autotuned_pairs

    d = _skewed_docs(spark)
    cfg = blocking_autotune(d, threshold=0.2, frac_floor=0)
    assert cfg["rows"] == 1 and cfg["scrub"] is True  # the hazard setup
    pairs = minhash_autotuned_pairs(
        d, threshold=0.2, config=cfg, scrub=0.2, max_bucket=8
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert got.get((100, 101)) == 1.0  # genuine dup pairs under the override
    assert not any(a < 100 and b < 100 for (a, b) in got)  # boiler-only mass gone


def test_dsl_autotune_flags_skew_e2e(spark, tmp_path):
    """`dedup { autotune = true }` on a boilerplate-skewed corpus, through
    the USER-FACING DSL path with PRODUCTION profile defaults (frac_floor
    1024 — the corpus is sized past it): the profile flags skew on its
    own, scrub engages automatically, the planted organic dup collapses,
    and boilerplate-only docs all survive (their similarity was boilerplate,
    not content). The miniature of scripts/skew_dsl_rehearsal.py."""
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.pipeline import compile_query
    from apollo_spark.sources.tables import Catalog

    # 1100 boiler docs (df > the 1024 production floor), one organic dup
    # pair, 48 unique docs
    rows = [(i, f"{BOILER} u{i} v{i}") for i in range(1100)]
    rows += [(2000, "alpha beta gamma delta epsilon zeta"),
             (2001, "alpha beta gamma delta epsilon zeta")]
    rows += [(3000 + i, f"w{i} x{i} y{i} z{i} q{i} r{i}") for i in range(48)]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    # the profile itself flags skew with production defaults
    from apollo_spark.ops.dedup import blocking_autotune

    d = spark.read.parquet(str(tmp_path / "documents.parquet"))
    cfg = blocking_autotune(d, threshold=0.2)
    assert cfg["scrub"] is True
    assert (cfg["num_hashes"], cfg["bands"], cfg["rows"]) == (32, 32, 1)

    schema = parse_schema(
        """
query skew_auto {
  chain = "ethereum"
  source_table = "documents"
  dedup {
    method = "minhash"
    threshold = 0.2
    autotune = true
  }
  save { doc_id = doc_id }
}
"""
    )
    out = compile_query(spark, Catalog(spark, str(tmp_path)), schema.queries[0], schema)
    ids = {int(r["doc_id"]) for r in out.select("doc_id").collect()}
    assert 2000 in ids and 2001 not in ids  # organic dup collapses
    assert all(3000 + i in ids for i in range(48))  # unique docs untouched
    # boilerplate-only docs survive under auto scrub (similarity redefined
    # over the informative remainder)
    assert sum(1 for i in ids if i < 1100) == 1100
