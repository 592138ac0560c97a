"""Operator-library tests: relational helpers, dedup family, similarity
search, text analysis, multimodal plumbing — validated against DuckDB oracles
or brute-force numpy where SQL can't express the op."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


# ------------------------------------------------------------- relational


def test_asof_join_backward(spark):
    from apollo_spark.ops.relational import asof_join

    left = spark.createDataFrame(
        [("a", 10), ("a", 25), ("a", 5), ("b", 10)], "k string, ts long"
    )
    right = spark.createDataFrame(
        [("a", 8, 1.0), ("a", 20, 2.0), ("b", 12, 3.0)], "k string, ts long, v double"
    )
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts", value_cols=["v"])
    got = {(r.k, r.ts): r.v for r in out.collect()}
    assert got == {("a", 10): 1.0, ("a", 25): 2.0, ("a", 5): None, ("b", 10): None}


def test_asof_join_forward_and_ties(spark):
    from apollo_spark.ops.relational import asof_join

    left = spark.createDataFrame([("a", 10)], "k string, ts long")
    right = spark.createDataFrame([("a", 10, 7.0), ("a", 30, 9.0)], "k string, ts long, v double")
    back = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts", value_cols=["v"])
    fwd = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts", value_cols=["v"], direction="forward")
    assert back.collect()[0].v == 7.0  # inclusive at equal ts
    assert fwd.collect()[0].v == 7.0


def test_top_k(spark):
    from apollo_spark.ops.relational import top_k

    df = spark.range(100).withColumn("g", F.col("id") % 4)
    out = top_k(df, ["g"], [F.col("id").desc()], 3)
    assert out.count() == 12
    top_g0 = sorted(r.id for r in out.filter("g = 0").collect())
    assert top_g0 == [88, 92, 96]


# ----------------------------------------------------------------- dedup


def test_exact_dedup_vs_oracle(spark, docs):
    from apollo_spark.ops.dedup import exact_dedup

    out = exact_dedup(docs)
    con = duckdb.connect()
    expected = con.sql(
        f"""
        SELECT count(*) FROM (
          SELECT min(doc_id) FROM '{SF}/documents.parquet'
          GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
        )
        """
    ).fetchone()[0]
    assert out.count() == expected
    # idempotent
    assert exact_dedup(out).count() == expected


def test_minhash_lsh_finds_planted_dups(spark):
    from apollo_spark.ops.dedup import minhash_lsh_pairs, near_dedup

    base = "the quick brown fox jumps over the lazy dog and runs far away into the green forest tonight"
    variant = base.replace("green", "dark")  # high-jaccard near-dup
    other = "completely different text about spark execution plans and shuffle partitioning strategies overall"
    rows = [(1, base), (2, variant), (3, other), (4, base + " extra")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(df, threshold=0.5, n=3, num_hashes=64, bands=16)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got and (1, 4) in got
    assert not any(3 in p for p in got)
    kept = near_dedup(df, threshold=0.5, n=3, num_hashes=64, bands=16)
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert ids == {1, 3}  # canonical min-id survives, 2 and 4 drop


def test_simhash_hamming(spark):
    from apollo_spark.ops.dedup import simhash64, simhash_pairs

    base = " ".join(f"word{i}" for i in range(60))
    near = base.replace("word30", "word30x")
    rows = [(1, base), (2, base), (3, near), (4, "totally unrelated words describing database query optimizers tonight")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sims = {r.doc_id: r.sim for r in df.select("doc_id", simhash64(F.col("text")).alias("sim")).collect()}
    assert sims[1] == sims[2]  # identical text -> identical fingerprint
    ham = lambda a, b: bin((sims[a] ^ sims[b]) & ((1 << 64) - 1)).count("1")
    assert ham(1, 3) < ham(1, 4)  # near-dup closer than unrelated
    # exact duplicates always collide in every bucket block
    pairs = simhash_pairs(df)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert got.get((1, 2)) == 0


def test_connected_components(spark):
    from apollo_spark.ops.dedup import connected_components

    edges = spark.createDataFrame([(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (3, 4)], "id_a long, id_b long")
    comps = connected_components(edges)
    got = {r.id: r.comp for r in comps.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


# ------------------------------------------------------------- similarity


def test_brute_force_topk_matches_numpy(spark, emb):
    from apollo_spark.ops.similarity import brute_force_topk

    pdf = emb.toPandas()
    mat = np.array([np.array(v) for v in pdf["embedding"]])
    q = mat[:3]
    qdf = spark.createDataFrame(
        [(int(i), [float(x) for x in q[i]]) for i in range(3)], "q_id long, q_vec array<float>"
    )
    out = brute_force_topk(emb, qdf, k=5).toPandas()
    norms = np.linalg.norm(mat, axis=1)
    for qi in range(3):
        scores = mat @ q[qi] / (norms * np.linalg.norm(q[qi]))
        expect = set(np.argsort(-scores)[:5])
        got = set(out[out.q_id == qi].sort_values("rank")["vec_id"])
        ids = pdf["vec_id"].to_numpy()
        assert got == {int(ids[j]) for j in expect}


def test_lsh_topk_recall(spark, emb):
    from apollo_spark.ops.similarity import brute_force_topk, lsh_topk

    qdf = spark.createDataFrame(
        [(int(r.vec_id), r.embedding) for r in emb.limit(5).collect()], "q_id long, q_vec array<float>"
    )
    exact = brute_force_topk(emb, qdf, k=10).toPandas()
    # near-uniform random embeddings are LSH's worst case; wide buckets
    # (4 planes x 12 tables) still must recover most true neighbors
    approx = lsh_topk(emb, qdf, k=10, num_planes=4, num_tables=12).toPandas()
    recalls = []
    for qid in exact.q_id.unique():
        e = set(exact[exact.q_id == qid]["vec_id"])
        a = set(approx[approx.q_id == qid]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5, recalls  # probabilistic but generous bound
    # the query vector itself is always its own top hit
    for qid in exact.q_id.unique():
        top = approx[(approx.q_id == qid) & (approx["rank"] == 1)]["vec_id"].iloc[0]
        assert top == qid


# ------------------------------------------------------------------ text


def test_token_count_vs_oracle(spark, docs):
    from apollo_spark.ops.text import token_count

    out = docs.select("doc_id", token_count(F.col("text")).alias("n_tokens")).toPandas()
    con = duckdb.connect()
    expected = con.sql(
        f"""
        SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE length(regexp_split_to_array(trim(lower(text)), '\\s+')) END AS n_tokens
        FROM '{SF}/documents.parquet'
        """
    ).df()
    merged = out.merge(expected, on="doc_id", suffixes=("_s", "_d"))
    assert (merged.n_tokens_s == merged.n_tokens_d).all()


def test_language_id_sane(spark):
    from apollo_spark.ops.text import language_id

    rows = [
        (1, "the cat and the dog went to the park in the morning"),
        (2, "der Hund und die Katze sind nicht in das Haus"),
        (3, "le chat est dans la maison avec les enfants"),
        (4, "xyzzy plugh 12345"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r.id: r.lang for r in df.select("id", language_id(F.col("text")).alias("lang")).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "unknown"}


def test_fingerprint_matches_duckdb(spark, docs):
    from apollo_spark.ops.text import fingerprint

    out = docs.select("doc_id", fingerprint(F.col("text")).alias("fp")).toPandas()
    con = duckdb.connect()
    expected = con.sql(
        f"SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp FROM '{SF}/documents.parquet'"
    ).df()
    merged = out.merge(expected, on="doc_id", suffixes=("_s", "_d"))
    assert (merged.fp_s == merged.fp_d).all()


def test_quality_score_range(spark, docs):
    from apollo_spark.ops.text import quality_score

    stats = docs.select(quality_score(F.col("text")).alias("q")).agg(
        F.min("q").alias("lo"), F.max("q").alias("hi")
    ).collect()[0]
    assert 0.0 <= stats.lo <= stats.hi <= 1.0


# ------------------------------------------------------------- multimodal


def test_multimodal_features_deterministic(spark):
    from apollo_spark.ops.multimodal import extract_features, fake_media_table

    media = fake_media_table(spark, n=30)
    f1 = extract_features(media, dim=16).toPandas().sort_values("media_id").reset_index(drop=True)
    f2 = extract_features(media, dim=16).toPandas().sort_values("media_id").reset_index(drop=True)
    assert len(f1) == 30 and all(len(v) == 16 for v in f1["features"])
    for a, b in zip(f1["features"], f2["features"]):
        assert list(a) == list(b)


def test_multimodal_frame_sampling(spark):
    from apollo_spark.ops.multimodal import fake_media_table, sample_frames

    media = fake_media_table(spark, n=30)
    frames = sample_frames(media, every_ms=1000)
    n_videos = media.filter("kind = 'video'").count()
    assert frames.count() == n_videos * 5  # 5000ms / 1000ms
    assert frames.schema["frame"].dataType.typeName() == "binary"
    # non-default id column: output columns must track the parameter
    renamed = media.withColumnRenamed("media_id", "vid")
    fr2 = sample_frames(renamed, every_ms=1000, id_col="vid")
    assert fr2.columns[0] == "vid" and fr2.count() == n_videos * 5


def test_ngram_jaccard_max_df_cap_keeps_scores_exact(spark):
    """The hot-shingle cap prunes candidate generation only; surviving pairs
    must carry the SAME exact jaccard as the lossless path (full-set
    re-score), and near-dup pairs that share at least one sub-cap shingle
    are still found."""
    from apollo_spark.ops.dedup import ngram_jaccard_pairs

    # 3 near-dup pairs + filler docs all sharing one hot phrase
    hot = "the quick brown fox jumps over the lazy dog again and again"
    rows = []
    for i in range(30):
        rows.append((i, f"{hot} filler text number {i} unique tail {i * 7}"))
    rows += [
        (100, "alpha beta gamma delta epsilon zeta eta theta"),
        (101, "alpha beta gamma delta epsilon zeta eta iota"),
        (102, "one two three four five six seven eight nine"),
        (103, "one two three four five six seven eight ten"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = ngram_jaccard_pairs(df, threshold=0.3).toPandas()
    capped = ngram_jaccard_pairs(df, threshold=0.3, max_df=10).toPandas()
    key = lambda p: p.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    e, c = key(exact), key(capped)
    # planted pairs survive the cap with identical scores
    planted = {(100, 101), (102, 103)}
    assert planted <= set(zip(c["id_a"], c["id_b"]))
    ce = c.merge(e, on=["id_a", "id_b"], suffixes=("_c", "_e"))
    assert len(ce) == len(c)  # capped ⊆ exact (no false positives)
    assert (ce["jaccard_c"] == ce["jaccard_e"]).all()  # scores bit-identical


def test_ngram_jaccard_mega_cluster_star_recovery(spark):
    """Documents whose EVERY shingle is hotter than the cap vanish from the
    pruned index entirely; exact duplicates among them must come back as
    jaccard-1.0 star pairs (cluster min id -> member), and near-identical
    -but-unequal members are the documented recall loss (absent)."""
    from apollo_spark.ops.dedup import ngram_jaccard_pairs

    boiler = "terms of service apply all rights reserved contact us here"
    rows = [(i, boiler) for i in range(20)]  # 20 exact copies, every bigram df=20+
    rows += [(50, boiler + " tiny variation")]  # near-identical, NOT exact
    rows += [(60 + i, f"unique document number {i} with rare words {i * 13}") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = ngram_jaccard_pairs(df, threshold=0.3, max_df=10).toPandas()
    stars = out[out["jaccard"] == 1.0]
    # the 20-copy cluster returns as a 19-edge star on min id 0
    assert set(zip(stars["id_a"], stars["id_b"])) == {(0, i) for i in range(1, 20)}
    # doc 50 shares only hot shingles and isn't set-equal: documented miss
    assert 50 not in set(out["id_a"]) | set(out["id_b"])


def test_ngram_jaccard_max_df_frac_matches_absolute_cap(spark):
    """The scale-relative cap must agree bit-for-bit with the absolute cap
    at the equivalent cutoff (floor(frac * n_docs) == max_df), and reject
    being combined with an explicit absolute cap."""
    import pytest as _pytest

    from apollo_spark.ops.dedup import ngram_jaccard_pairs

    hot = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, f"{hot} filler text number {i} unique tail {i * 7}") for i in range(30)]
    rows += [
        (100, "alpha beta gamma delta epsilon zeta eta theta"),
        (101, "alpha beta gamma delta epsilon zeta eta iota"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # 32 docs; frac 10/32 -> floor = 10 == absolute cap
    rel = ngram_jaccard_pairs(df, threshold=0.3, max_df_frac=10 / 32).toPandas()
    ab = ngram_jaccard_pairs(df, threshold=0.3, max_df=10).toPandas()
    key = lambda p: p.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    rel, ab = key(rel), key(ab)
    assert (rel.values == ab.values).all()
    with _pytest.raises(ValueError, match="not both"):
        ngram_jaccard_pairs(df, max_df=5, max_df_frac=0.5)
    # an EXPLICIT max_df equal to the default value must also raise — the
    # mutual-exclusion check keys on a sentinel, not the numeric value
    with _pytest.raises(ValueError, match="not both"):
        ngram_jaccard_pairs(df, max_df=100_000, max_df_frac=0.5)
    # max_df=None ("no absolute cap") with a frac cap stays accepted
    ngram_jaccard_pairs(df, threshold=0.3, max_df=None, max_df_frac=10 / 32).limit(1).collect()


def test_ivf_full_probe_is_exact(spark, emb):
    from apollo_spark.ops.similarity import brute_force_topk, ivf_topk

    qdf = spark.createDataFrame(
        [(int(r.vec_id), r.embedding) for r in emb.limit(3).collect()], "q_id long, q_vec array<float>"
    )
    exact = brute_force_topk(emb, qdf, k=5).toPandas().sort_values(["q_id", "rank"]).reset_index(drop=True)
    full = (
        ivf_topk(emb, qdf, k=5, n_clusters=8, n_probe=8)
        .toPandas()
        .sort_values(["q_id", "rank"])
        .reset_index(drop=True)
    )
    assert (exact["vec_id"] == full["vec_id"]).all()
    assert np.allclose(exact["score"], full["score"])


def test_ivf_partial_probe_recall(spark, emb):
    from apollo_spark.ops.similarity import brute_force_topk, ivf_topk

    qdf = spark.createDataFrame(
        [(int(r.vec_id), r.embedding) for r in emb.limit(5).collect()], "q_id long, q_vec array<float>"
    )
    exact = brute_force_topk(emb, qdf, k=10).toPandas()
    approx = ivf_topk(emb, qdf, k=10, n_clusters=8, n_probe=4).toPandas()
    recalls = []
    for qid in exact.q_id.unique():
        e = set(exact[exact.q_id == qid]["vec_id"])
        a = set(approx[approx.q_id == qid]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5, recalls
    # probing half the lists must always include the query's own list
    for qid in exact.q_id.unique():
        top = approx[(approx.q_id == qid) & (approx["rank"] == 1)]["vec_id"].iloc[0]
        assert top == qid


def test_range_join_precasts_widening_bounds(spark):
    from datetime import date, datetime

    from apollo_spark.ops.relational import range_join

    left = spark.createDataFrame(
        [(i, datetime(1995 + i % 4, 6, 15)) for i in range(200)], "id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(y, date(y, 1, 1), date(y + 1, 1, 1)) for y in range(1995, 1999)], "yr int, lo date, hi date"
    )
    out = range_join(left, right, on=[], left_point="ts", right_lo="lo", right_hi="hi")
    # helper columns must not leak; every row lands in its year bucket
    assert set(out.columns) == {"id", "ts", "yr", "lo", "hi"}
    pdf = out.toPandas()
    assert len(pdf) == 200 and (pdf["yr"] == pdf["ts"].dt.year).all()
    # the widening cast must run on the 4-row build side, not per join pair:
    # the join condition in the physical plan carries no cast
    plan = out._jdf.queryExecution().executedPlan().toString()
    join_line = next(ln for ln in plan.splitlines() if (("Join" in ln) or ("CartesianProduct" in ln)) and ">=" in ln)
    assert "cast(" not in join_line, join_line


def test_ivf_centroid_persistence_roundtrip(spark, emb, tmp_path):
    from apollo_spark.ops.similarity import (
        load_ivf_centroids,
        save_ivf_centroids,
        train_ivf_centroids,
        train_or_load_ivf_centroids,
    )

    path = str(tmp_path / "ivf_centroids")
    cent = train_ivf_centroids(emb, n_clusters=8)
    save_ivf_centroids(spark, cent, path)
    loaded = load_ivf_centroids(spark, path)
    assert loaded.shape == cent.shape
    assert np.allclose(loaded, cent)
    # train_or_load must return the persisted index, not retrain (a retrain
    # with different params would diverge; identical array proves reuse)
    reused = train_or_load_ivf_centroids(emb, path, n_clusters=4)
    assert reused.shape == cent.shape and np.allclose(reused, cent)
    # cold path: trains and persists
    path2 = str(tmp_path / "ivf_fresh")
    fresh = train_or_load_ivf_centroids(emb, path2, n_clusters=8)
    assert np.allclose(fresh, load_ivf_centroids(spark, path2))


def test_salted_join_matches_plain_join(spark):
    from apollo_spark.ops.relational import salted_join

    # power-law key distribution: key 0 holds half the rows
    left = spark.range(0, 2000).selectExpr("CASE WHEN id % 2 = 0 THEN 0 ELSE id END AS k", "id AS v")
    right = spark.createDataFrame([(i, f"r{i}") for i in range(0, 100)], "k long, label string")
    plain = left.join(right, "k").select("k", "v", "label").toPandas()
    salted = salted_join(left, right, on=["k"], salt=8).select("k", "v", "label").toPandas()
    key = lambda df: df.sort_values(["k", "v", "label"]).reset_index(drop=True)
    a, b = key(plain), key(salted)
    assert len(a) == len(b) and (a.values == b.values).all()
    # left join parity: unmatched LEFT rows appear exactly once
    plain_l = left.join(right, "k", "left").select("k", "v", "label").toPandas()
    salted_l = salted_join(left, right, on=["k"], salt=8, how="left").select("k", "v", "label").toPandas()
    kl = lambda df: df.fillna("__null__").sort_values(["k", "v", "label"]).reset_index(drop=True)
    al, bl = kl(plain_l), kl(salted_l)
    assert len(al) == len(bl) and (al.values == bl.values).all()
    # right-preserving modes would emit unmatched right rows salt x: rejected
    for bad in ("right", "full", "full_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(left, right, on=["k"], salt=8, how=bad)


def test_catalog_reads_jsonl_and_csv(spark, tmp_path):
    import json as _json

    from apollo_spark.sources.tables import Catalog

    (tmp_path / "docs.jsonl").write_text("\n".join(_json.dumps({"id": i, "t": f"x{i}"}) for i in range(5)))
    (tmp_path / "dim.csv").write_text("k,v\n1,a\n2,b\n")
    cat = Catalog(spark, tmp_path)
    assert cat.has("docs") and cat.has("dim") and not cat.has("nope")
    assert cat.table("docs").count() == 5
    rows = {r.k: r.v for r in cat.table("dim").collect()}
    assert rows == {1: "a", 2: "b"}


def test_chunk_documents_coverage_and_overlap(spark):
    from apollo_spark.ops.text import chunk_documents

    df = spark.createDataFrame([(1, "a" * 1000), (2, "b" * 10), (3, "")], "doc_id long, text string")
    out = chunk_documents(df, size=512, overlap=64).toPandas()
    d1 = out[out.doc_id == 1].sort_values("chunk_id")
    # stride 448: starts 0,448,896 -> 3 chunks, last truncated to 104 chars
    assert list(d1.n_chars) == [512, 512, 104]
    # consecutive chunks overlap by exactly 64 chars
    assert d1.iloc[0].chunk[-64:] == d1.iloc[1].chunk[:64]
    assert list(out[out.doc_id == 2].n_chars) == [10]
    assert (out.doc_id != 3).all()  # empty doc -> no chunks


def test_token_budget_sample_keeps_crossing_doc(spark):
    from apollo_spark.ops.corpus import token_budget_sample

    rows = [
        (1, "s1", "a b c"),        # 3 tokens, cum 3
        (2, "s1", "d e f g"),      # 4 tokens, cum 7  <- crosses budget 6, kept
        (3, "s1", "h i"),          # prev cum 7 >= 6 -> dropped
        (4, "s2", ""),             # empty doc: 0 tokens, kept
        (5, "s2", "  x   y  "),    # ragged whitespace: 2 tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = token_budget_sample(df, budget_tokens=6, by="source", order_col="doc_id").toPandas()
    assert sorted(out["doc_id"]) == [1, 2, 4, 5]
    got = dict(zip(out["doc_id"], out["n_tokens"]))
    assert got[4] == 0 and got[5] == 2


def test_training_order_deterministic_and_salted(spark):
    from apollo_spark.ops.corpus import training_order

    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    a = training_order(df).select("doc_id", "train_rank").toPandas().sort_values("doc_id")
    b = training_order(df).select("doc_id", "train_rank").toPandas().sort_values("doc_id")
    assert (a.values == b.values).all()  # reproducible
    assert sorted(a["train_rank"]) == list(range(1, 101))  # a permutation
    assert list(a["train_rank"]) != list(range(1, 101))  # ...that actually shuffles
    c = training_order(df, salt="epoch2").select("doc_id", "train_rank").toPandas().sort_values("doc_id")
    assert list(c["train_rank"]) != list(a["train_rank"])  # new salt, new order


def test_decontaminate_finds_planted_overlap(spark):
    from apollo_spark.ops.corpus import decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "contaminated copy the quick brown fox jumps here"),  # shares 4-grams
            (2, "completely different words without any overlap at all"),
            (3, "QUICK Brown Fox Jumps elsewhere"),  # case-folded match
        ],
        "doc_id long, text string",
    )
    out = decontaminate(docs, bench, n=4).toPandas()
    assert set(out["doc_id"]) == {1, 3}
    # doc 1 shares 'the quick brown fox'+'quick brown fox jumps' = 2 grams
    assert int(out.set_index("doc_id").loc[1, "n_shared"]) == 2
    # benchmark side is broadcast (eval sets are tiny)
    plan = decontaminate(docs, bench, n=4)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_pii_scrub_and_counts(spark):
    from apollo_spark.ops.text import pii_counts, pii_scrub

    df = spark.createDataFrame(
        [(1, "mail a.user+x@sub.example.org from 192.168.1.77 call +44 20-7946 0958 done")],
        "id long, text string",
    )
    counts = pii_counts(F.col("text"))
    row = df.select(
        counts["email"].alias("e"), counts["ipv4"].alias("i"), counts["phone"].alias("p"),
        pii_scrub(F.col("text")).alias("s"),
    ).collect()[0]
    assert (row.e, row.i, row.p) == (1, 1, 1)
    assert "<EMAIL>" in row.s and "<IPV4>" in row.s and "<PHONE>" in row.s
    assert "example.org" not in row.s and "192.168" not in row.s


def test_semantic_dedup_drops_planted_dups(spark, emb):
    """SemDeDup: planted near-identical embeddings collapse to the lowest-id
    representative; distinct vectors all survive."""
    from apollo_spark.ops.similarity import semantic_dedup

    base = emb.limit(40)
    pdf = base.toPandas()
    planted = []
    for j in range(3):  # 3 near-copies of vector 0, tiny perturbation
        v = [float(x) * (1.0 + 1e-4 * (j + 1)) for x in pdf["embedding"].iloc[0]]
        planted.append((10_000 + j, v, 0))
    dup = spark.createDataFrame(planted, "vec_id long, embedding array<float>, label int")
    df = base.unionByName(dup)
    kept = semantic_dedup(df, threshold=0.99, n_clusters=4).toPandas()
    ids = set(kept["vec_id"])
    # scaled copies have cosine 1.0 with the original: only the original stays
    assert not ({10_000, 10_001, 10_002} & ids)
    assert int(pdf["vec_id"].iloc[0]) in ids
    # distinct random vectors survive (cosine ~0 pairwise)
    assert len(ids) == 40
    # deterministic across runs
    kept2 = semantic_dedup(df, threshold=0.99, n_clusters=4).toPandas()
    assert ids == set(kept2["vec_id"])


def test_quantize_roundtrip_error_bounded(spark, emb):
    """int8 quantize/dequantize reconstruction error is bounded by scale/2
    per dimension."""
    from apollo_spark.ops.similarity import dequantize_int8, quantize_int8

    q = quantize_int8(emb.limit(50))
    joined = emb.limit(50).join(q, "vec_id")
    err = joined.select(
        F.array_max(
            F.zip_with(
                F.transform("embedding", lambda x: x.cast("double")),
                dequantize_int8(F.col("codes"), F.col("vmin"), F.col("vmax")),
                lambda a, b: F.abs(a - b),
            )
        ).alias("max_err"),
        ((F.col("vmax") - F.col("vmin")) / 255.0 / 2.0 * 1.0001).alias("bound"),
    ).toPandas()
    assert (err["max_err"] <= err["bound"]).all()
    # codes are genuine int8 range
    rng = q.select(F.array_min("codes").alias("lo"), F.array_max("codes").alias("hi")).toPandas()
    assert (rng["lo"] >= 0).all() and (rng["hi"] <= 255).all()


def test_stratified_hash_sample_deterministic(spark, docs):
    from apollo_spark.ops.corpus import stratified_hash_sample

    a = stratified_hash_sample(docs, rates={"src0": 50}, default_pct=20).toPandas()
    b = stratified_hash_sample(docs, rates={"src0": 50}, default_pct=20).toPandas()
    assert set(a["doc_id"]) == set(b["doc_id"])  # pure function of id
    # rates roughly honored (hash buckets are uniform-ish)
    src0 = a[a.source == "src0"]
    n0_total = docs.filter("source = 'src0'").count()
    assert 0.25 * n0_total <= len(src0) <= 0.75 * n0_total


def test_continuous_rollup_incremental_and_lambda_read(spark, tmp_path):
    """Continuous aggregate: refresh materializes only complete new buckets,
    re-refresh is a no-op, and read() == full recompute at any refresh lag."""
    from apollo_spark.ops.rollup import ContinuousRollup

    def mkraw(rows):
        return spark.createDataFrame(rows, "ts_s long, user_id long, value double")

    base = (1_700_000_000 // 3600 + 1) * 3600  # bucket-aligned epoch
    rows1 = [(base + b * 3600 + o, b % 3, float(b + o)) for b in range(4) for o in (0, 100)]
    raw1 = mkraw(rows1)
    roll = ContinuousRollup(
        str(tmp_path / "roll"),
        bucket_seconds=3600,
        keys=["user_id"],
        aggs={"n_events": F.count(F.lit(1)), "sum_value": F.sum(F.col("value").cast("decimal(38,6)")).cast("double")},
    )
    # buckets 0..2 are complete (bucket 3 holds the max event -> incomplete)
    assert roll.refresh(raw1) == 3
    assert roll.high_water(spark) == base + 2 * 3600
    # idempotent: nothing new -> no writes
    assert roll.refresh(raw1) == 0

    def full(df):
        return {
            (r.bucket_start, r.user_id): (r.n_events, r.sum_value)
            for r in roll._aggregate(df).collect()
        }

    # lambda read covers the unmaterialized tail (bucket 3)
    assert {
        (r.bucket_start, r.user_id): (r.n_events, r.sum_value) for r in roll.read(raw1).collect()
    } == full(raw1)

    # new data arrives: bucket 4 closes bucket 3
    rows2 = rows1 + [(base + 4 * 3600 + 50, 9, 1.0)]
    raw2 = mkraw(rows2)
    assert roll.refresh(raw2) == 1  # only bucket 3 materializes
    assert roll.high_water(spark) == base + 3 * 3600
    assert {
        (r.bucket_start, r.user_id): (r.n_events, r.sum_value) for r in roll.read(raw2).collect()
    } == full(raw2)


def test_strip_hot_lines_removes_corpus_boilerplate(spark):
    """C4-style line dedup: segments repeated across > max_line_df docs are
    stripped, documents reassemble in original order, fully-boilerplate docs
    come back empty rather than vanishing."""
    from apollo_spark.ops.dedup import strip_hot_lines

    banner = "subscribe to our newsletter"
    rows = [
        (1, f"{banner}. unique alpha text. more alpha"),
        (2, f"unique beta text. {banner}. beta tail"),
        (3, f"gamma head. {banner}"),
        (4, banner),  # fully boilerplate
        (5, "only unique delta content"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r.doc_id: r for r in strip_hot_lines(df, max_line_df=2, sep=". ").collect()}
    assert len(out) == 5
    assert out[1].clean_text == "unique alpha text. more alpha"
    assert out[2].clean_text == "unique beta text. beta tail"
    assert out[3].clean_text == "gamma head"
    assert out[4].clean_text == ""  # kept, emptied
    assert out[5].clean_text == "only unique delta content"
    assert (out[1].n_lines, out[1].n_removed) == (3, 1)
    assert (out[4].n_lines, out[4].n_removed) == (1, 1)
    # normalization: case/whitespace variants of the banner count as one key
    rows2 = [
        (1, "Subscribe  To Our Newsletter. keep me"),
        (2, "subscribe to our newsletter. also keep"),
        (3, "SUBSCRIBE TO OUR NEWSLETTER"),
    ]
    df2 = spark.createDataFrame(rows2, "doc_id int, text string")
    out2 = {r.doc_id: r.clean_text for r in strip_hot_lines(df2, max_line_df=2, sep=". ").collect()}
    assert out2 == {1: "keep me", 2: "also keep", 3: ""}


def test_strip_hot_lines_fractional_threshold(spark):
    """max_df_frac scales with corpus size: a token in >50% of docs is
    stripped without any absolute tuning."""
    from apollo_spark.ops.dedup import strip_hot_lines

    rows = [(i, f"common w{i}") for i in range(10)]  # 'common' in 10/10 docs
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r.doc_id: r for r in strip_hot_lines(df, max_df_frac=0.5, sep=" ").collect()}
    assert all(out[i].clean_text == f"w{i}" for i in range(10))
    assert all(out[i].n_removed == 1 for i in range(10))
    with pytest.raises(ValueError):
        strip_hot_lines(df)
    with pytest.raises(ValueError):
        strip_hot_lines(df, max_line_df=1, max_df_frac=0.5)


def test_bm25_ranks_relevance(spark):
    """BM25 semantics: more query-term occurrences rank higher; documents
    without any query term are absent; rarer terms contribute more idf."""
    from apollo_spark.ops.text import bm25_scores

    rows = [
        (1, "spark spark spark streaming engine"),
        (2, "spark appears once here in a much longer document " + "filler " * 20),
        (3, "completely unrelated text about cooking"),
        (4, "rare unicorn word document"),
        (5, "common words only " + "filler " * 5),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r.doc_id: r.bm25 for r in bm25_scores(df, ["spark", "unicorn"]).collect()}
    assert set(out) == {1, 2, 4}  # doc 3/5 match nothing
    assert out[1] > out[2]  # tf=3 short doc beats tf=1 long doc
    # 'unicorn' (df=1) outweighs 'spark' (df=2) for a single occurrence
    assert out[4] > out[2]
    assert all(v > 0 for v in out.values())


def test_dsir_importance_upweights_target_domain(spark):
    """DSIR: documents sharing the target domain's n-gram distribution get
    higher log importance weights than off-domain documents."""
    from apollo_spark.ops.corpus import dsir_importance

    target_rows = [(100 + i, f"machine learning model training run {i}") for i in range(5)]
    corpus_rows = [
        (1, "machine learning model training pipeline"),  # in-domain
        (2, "grilled cheese sandwich recipe with tomato soup"),  # off-domain
        (3, "machine learning training data quality"),  # in-domain
        (4, "weather forecast rain tomorrow afternoon"),  # off-domain
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id int, text string")
    target = spark.createDataFrame(target_rows, "doc_id int, text string")
    out = {r.doc_id: r.logw for r in dsir_importance(corpus, target, buckets=128).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert min(out[1], out[3]) > max(out[2], out[4])


def test_pagerank_known_graph(spark):
    """PageRank sanity on a hand-checkable graph: symmetric pair has equal
    ranks, a hub everyone links to ranks highest, dangling mass is
    redistributed so total rank stays ~1."""
    from apollo_spark.ops.graph import pagerank

    # 1<->2 symmetric, 3/4/5 -> hub 6; 6 dangling (no out-edges)
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 6), (4, 6), (5, 6)], "src int, dst int"
    )
    out = {r.node: r.rank for r in pagerank(edges, iterations=10).collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6}
    assert out[1] == out[2]  # symmetry
    assert out[6] > out[3]  # the hub outranks its leaf contributors
    assert out[1] > out[6]  # the closed 2-cycle retains mass and beats the hub
    assert abs(sum(out.values()) - 1.0) < 1e-3  # mass conserved (dangling redistributed)
    assert out[3] == out[4] == out[5]

    # weighted: heavier edge pulls more rank
    wedges = spark.createDataFrame(
        [(1, 2, 9.0), (1, 3, 1.0), (2, 1, 1.0), (3, 1, 1.0)], "src int, dst int, w double"
    )
    wout = {r.node: r.rank for r in pagerank(wedges, iterations=10, weight="w").collect()}
    assert wout[2] > wout[3]


def test_cdc_chunk_groups_insertion_robust(spark):
    """CDC's defining property: inserting a sentence mid-document perturbs
    only the chunks it touches — the chunks before and after the edit keep
    their content hashes and still group across the original and the edited
    copy. A byte/word-offset chunking (fixed-size blocks) would shift every
    downstream block and share nothing."""
    import numpy.random as npr

    from apollo_spark.ops.dedup import cdc_chunk_groups

    rng = npr.default_rng(7)
    vocab = [f"w{i}" for i in range(50)]
    words = [vocab[i] for i in rng.integers(0, 50, size=400)]
    original = " ".join(words)
    edited = " ".join(words[:200] + ["inserted", "novel", "sentence", "here"] + words[200:])
    df = spark.createDataFrame(
        [(1, original), (2, edited), (3, "completely unrelated short text")],
        "doc_id long, text string",
    )
    out = cdc_chunk_groups(df, window=3, divisor=16, min_docs=2).toPandas()
    # at ~16-word expected chunks a 400-word doc has ~25 chunks; the edit
    # touches ~1-2 of them, so well over half must still match
    assert out["n_docs"].eq(2).all()
    assert len(out) >= 8, f"only {len(out)} shared chunks survived the insertion"
    # determinism: same input -> same groups
    out2 = cdc_chunk_groups(df, window=3, divisor=16, min_docs=2).toPandas()
    assert sorted(out["chunk_hash"]) == sorted(out2["chunk_hash"])


def test_cdc_chunk_groups_validates_params(spark):
    import pytest as _pytest

    from apollo_spark.ops.dedup import cdc_chunk_groups

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        cdc_chunk_groups(df, window=0)
    with _pytest.raises(ValueError):
        cdc_chunk_groups(df, divisor=1)


def test_incremental_cdc_novelty_across_batches(spark, tmp_path):
    """Span-level novelty for continuous ingest: a re-crawled doc scores ~0,
    an edited re-crawl pays only for its edit, a fresh doc scores 1.0,
    intra-batch duplicates charge only the first copy, and replaying a batch
    with the same txn ids neither grows the index nor changes the report."""
    import numpy.random as npr

    from apollo_spark.ops.dedup import incremental_cdc_novelty
    from apollo_spark.table_format import TxTable

    rng = npr.default_rng(11)
    vocab = [f"w{i}" for i in range(60)]
    words = [vocab[i] for i in rng.integers(0, 60, size=300)]
    base_text = " ".join(words)
    fresh_text = " ".join(vocab[i] for i in rng.integers(0, 60, size=300))
    idx = str(tmp_path / "cdc_index")

    b1 = spark.createDataFrame([(1, base_text)], "doc_id long, text string")
    r1 = incremental_cdc_novelty(idx, b1, txn_app="t", txn_batch=1).toPandas()
    assert r1.iloc[0]["novel_frac"] == 1.0  # empty index: everything is new

    edited = " ".join(words[:150] + ["brand", "new", "insert"] + words[150:])
    b2 = spark.createDataFrame(
        [(2, base_text),        # exact re-crawl
         (3, edited),           # edited re-crawl
         (4, fresh_text),       # genuinely new
         (5, fresh_text)],      # intra-batch duplicate of 4
        "doc_id long, text string",
    )
    r2 = (
        incremental_cdc_novelty(idx, b2, txn_app="t", txn_batch=2)
        .toPandas().set_index("id").sort_index()
    )
    assert r2.loc[2, "novel_frac"] == 0.0
    # the edit perturbs only the chunks it touches
    assert 0.0 < r2.loc[3, "novel_frac"] < 0.35
    assert r2.loc[4, "novel_frac"] == 1.0
    assert r2.loc[5, "novel_frac"] == 0.0  # intra-batch dup: first copy pays
    v2 = TxTable(idx).current_version()
    n2 = TxTable(idx).read(spark).count()

    # exactly-once: same (app, batch) replay is a no-op for the index; the
    # replayed REPORT sees the already-committed hashes (novelty 0) — by
    # contract the report sink carries the same txn guard, so a replayed
    # report is discarded downstream rather than double-applied
    r2b = (
        incremental_cdc_novelty(idx, b2, txn_app="t", txn_batch=2)
        .toPandas().set_index("id").sort_index()
    )
    assert TxTable(idx).current_version() == v2
    assert TxTable(idx).read(spark).count() == n2
    assert (r2b["novel_chunks"] == 0).all()


def test_incremental_cdc_novelty_crash_between_report_and_index(spark, tmp_path):
    """The report-first commit order survives a crash between the two
    commits: batch 2's report lands, the driver dies before the index
    append, and the REPLAY (same txn ids) recomputes the identical report
    against the still-unmoved index — the report sink's txn guard skips the
    duplicate, the index append then proceeds, and a third run is a full
    no-op. Under the old index-first order this exact crash permanently
    recorded zero novelty for fresh content (round-5 ADVICE, medium)."""
    from apollo_spark.ops.dedup import incremental_cdc_novelty
    from apollo_spark.table_format import TxTable

    import numpy.random as npr

    idx = str(tmp_path / "cdc_idx")
    rep = str(tmp_path / "cdc_rep")
    # random draws (not modular sequences): periodic token streams create
    # real intra-doc duplicate chunks that legitimately score < 1.0
    rng = npr.default_rng(7)
    t1 = " ".join(f"w{k}" for k in rng.integers(0, 70, size=200))
    t2 = " ".join(f"x{k}" for k in rng.integers(0, 70, size=200))
    b1 = spark.createDataFrame([(1, t1)], "doc_id long, text string")
    b2 = spark.createDataFrame([(2, t2)], "doc_id long, text string")

    def report_sink(out, batch):
        TxTable(rep).write(out, mode="append", txn_app="t", txn_batch=batch)

    incremental_cdc_novelty(
        idx, b1, txn_app="t", txn_batch=1, commit_report=lambda o: report_sink(o, 1)
    )
    idx_v1 = TxTable(idx).current_version()

    class Boom(RuntimeError):
        pass

    def crashing_sink(out):
        report_sink(out, 2)
        raise Boom()  # driver dies AFTER the report commit, BEFORE the index append

    # attempt 1: report commits, index does not (the crash window)
    import pytest as _pytest

    with _pytest.raises(Boom):
        incremental_cdc_novelty(idx, b2, txn_app="t", txn_batch=2, commit_report=crashing_sink)
    assert TxTable(idx).current_version() == idx_v1  # index never moved
    rep_after_crash = TxTable(rep).read(spark).filter("id = 2").collect()
    assert rep_after_crash[0].novel_frac == 1.0  # the TRUE report is already durable

    # replay: recomputed report is identical, txn guard discards the dup,
    # index append finally lands
    r = incremental_cdc_novelty(
        idx, b2, txn_app="t", txn_batch=2, commit_report=lambda o: report_sink(o, 2)
    ).collect()
    assert r[0].novel_frac == 1.0  # recomputed against the unmoved index
    assert TxTable(idx).current_version() > idx_v1
    reports = TxTable(rep).read(spark).filter("id = 2").collect()
    assert len(reports) == 1 and reports[0].novel_frac == 1.0

    # third run: both commits are no-ops
    v_idx, v_rep = TxTable(idx).current_version(), TxTable(rep).current_version()
    incremental_cdc_novelty(
        idx, b2, txn_app="t", txn_batch=2, commit_report=lambda o: report_sink(o, 2)
    )
    assert TxTable(idx).current_version() == v_idx
    assert TxTable(rep).current_version() == v_rep


def test_duplicated_spans_flags_planted_span(spark):
    """A 8-token span planted in two docs is counted at every position it
    covers in both docs; a doc with no shared span reports zero dups (and is
    filterable); within-doc repeats also count (the Lee et al. definition)."""
    from apollo_spark.ops.dedup import duplicated_spans

    span = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, f"intro words here {span} trailing tail tokens"),
        (2, f"{span} other material entirely different closing"),
        (3, "totally unrelated text with enough tokens to window over fine"),
        (4, f"{span} and again {span}"),  # internal repeat
        (5, "short text"),  # < w tokens -> no output row
    ]
    out = (
        duplicated_spans(spark.createDataFrame(rows, "doc_id long, text string"), w=8)
        .toPandas()
        .set_index("doc_id")
    )
    assert 5 not in out.index  # too short to window
    assert int(out.loc[3, "n_dup_windows"]) == 0
    # every doc containing the planted span has >= 1 duplicated position
    assert int(out.loc[1, "n_dup_windows"]) >= 1
    assert int(out.loc[2, "n_dup_windows"]) >= 1
    assert int(out.loc[4, "n_dup_windows"]) >= 2  # both copies count
    assert (out["dup_frac"] <= 1.0).all() and (out["dup_frac"] >= 0.0).all()


def test_lm_cross_entropy_separates_domains(spark):
    """Docs drawn from the reference vocabulary score lower cross-entropy
    than out-of-domain gibberish; n_tokens is the whitespace token count."""
    from apollo_spark.ops.text import lm_cross_entropy

    ref = spark.createDataFrame(
        [(100, "the cat sat on the mat"), (101, "the dog sat on the rug")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the rug"),      # in-domain
            (2, "zyx qwv jkl pqr mno stu"),     # all OOV
        ],
        "doc_id long, text string",
    )
    out = lm_cross_entropy(docs, ref).toPandas().set_index("doc_id")
    assert int(out.loc[1, "n_tokens"]) == 6
    assert out.loc[1, "ce"] < out.loc[2, "ce"]
    # OOV-only doc: every token gets the same smoothed floor probability
    import math
    t_ref, v_ref = 12, 7  # 12 ref tokens, 7 distinct
    floor_ce = -math.log(1.0 / (t_ref + v_ref + 1))
    assert abs(out.loc[2, "ce"] - floor_ce) < 1e-5


def test_gopher_repetition_flags_repetitive_doc(spark):
    from apollo_spark.ops.text import gopher_repetition

    rows = [
        (1, "spam spam spam spam spam spam"),                      # one bigram dominates
        (2, "every token here is completely distinct wording"),
        (3, "buy now. buy now. buy now. limited offer"),           # duplicate segments
        (4, "x"),                                                  # too short for 2/3-grams
    ]
    out = (
        gopher_repetition(spark.createDataFrame(rows, "doc_id long, text string"))
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[1, "top2_frac"] == 1.0 and out.loc[1, "top3_frac"] == 1.0
    assert out.loc[2, "top2_frac"] < 0.5 and out.loc[2, "dup_seg_frac"] == 0.0
    assert out.loc[3, "dup_seg_frac"] == 0.5  # 4 segments, 2 are repeats
    assert out.loc[4, "top2_frac"] == 0.0 and out.loc[4, "top3_frac"] == 0.0


# ------------------------------------------------------------- sketches


def test_hll_estimate_within_error_bound(spark):
    """HLL(p=10) standard error is 1.04/sqrt(1024) ~ 3.3%; assert the
    estimate lands within 4 sigma of the exact distinct count."""
    from apollo_spark.ops.sketch import hll_count_distinct

    e = spark.read.parquet(f"{SF}/events.parquet")
    est = {
        r["event_type"]: r["estimate"]
        for r in hll_count_distinct(e, F.col("user_id").cast("string"), ["event_type"]).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type").agg(F.count_distinct("user_id").alias("n")).collect()
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert abs(est[k] - n) / n < 4 * 1.04 / 32.0, (k, est[k], n)


def test_hll_merge_equals_whole(spark):
    """Mergeability: sketch(A) max-merged with sketch(B) == sketch(A ∪ B) —
    the property that makes partial sketches shuffle-cheap at 100 TB."""
    from apollo_spark.ops.sketch import hll_merge, hll_registers, hll_summary

    e = spark.read.parquet(f"{SF}/events.parquet")
    val = F.col("user_id").cast("string")
    whole = hll_summary(hll_registers(e, val, ["event_type"]), ["event_type"]).collect()
    a = hll_registers(e.filter(F.col("event_id") % 2 == 0), val, ["event_type"])
    b = hll_registers(e.filter(F.col("event_id") % 2 == 1), val, ["event_type"])
    merged = hll_summary(hll_merge(a, b, ["event_type"]), ["event_type"]).collect()
    key = lambda rows: {r["event_type"]: (r["harmonic_scaled"], r["register_digest"]) for r in rows}
    assert key(whole) == key(merged)


def test_cms_never_underestimates(spark, docs):
    """CMS guarantee: estimate >= true count for every item, and the
    overestimate is bounded by e/width * total (with margin)."""
    from apollo_spark.ops.sketch import cms_counts, cms_estimate

    toks = docs.filter(F.length(F.trim("text")) > 0).select(
        F.explode(F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")).alias("t")
    )
    total = toks.count()
    counts = cms_counts(toks, "t", depth=4, width=1024)
    est = cms_estimate(counts, toks.distinct(), "t", depth=4, width=1024)
    truth = toks.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    rows = est.join(truth, "t").collect()
    assert rows
    for r in rows:
        assert r["cms_count"] >= r["n"], r
        assert r["cms_count"] - r["n"] <= 3 * total / 1024, r


def test_unimax_waterfill_invariants(spark, docs):
    """Budget-binding case: capped languages get exactly cap_tokens, uncapped
    ones share one common water level tau <= every uncapped cap, and the
    realized allocation sums to the budget."""
    from apollo_spark.ops.corpus import unimax_weights, whitespace_tokens

    lt = docs.groupBy("lang").agg(
        F.sum(F.size(whitespace_tokens(F.col("text")))).cast("long").alias("lang_tokens")
    )
    rows = lt.collect()
    total = sum(r["lang_tokens"] for r in rows)
    budget = total // 2
    out = unimax_weights(lt, budget, max_epochs=4).collect()
    assert len(out) == len(rows)
    alloc_sum = sum(r["alloc_tokens"] for r in out)
    assert abs(alloc_sum - budget) < 1e-6 * budget
    taus = {r["alloc_tokens"] for r in out if not r["is_capped"]}
    assert len(taus) <= 1  # single water level
    for r in out:
        if r["is_capped"]:
            assert r["alloc_tokens"] == float(r["cap_tokens"])
        else:
            assert r["alloc_tokens"] <= r["cap_tokens"] + 1e-9
            assert abs(r["epochs_used"] - r["alloc_tokens"] / r["lang_tokens"]) < 1e-12
        assert abs(r["weight"] - r["alloc_tokens"] / alloc_sum) < 1e-12


def test_unimax_all_capped_when_budget_exceeds_caps(spark, docs):
    """Non-binding budget: every language is capped at max_epochs and the
    leftover budget is simply unspent (UniMax semantics)."""
    from apollo_spark.ops.corpus import unimax_weights, whitespace_tokens

    lt = docs.groupBy("lang").agg(
        F.sum(F.size(whitespace_tokens(F.col("text")))).cast("long").alias("lang_tokens")
    )
    total = sum(r["lang_tokens"] for r in lt.collect())
    out = unimax_weights(lt, total * 100, max_epochs=4).collect()
    assert all(r["is_capped"] == 1 for r in out)
    assert all(r["alloc_tokens"] == float(r["cap_tokens"]) for r in out)
    assert all(abs(r["epochs_used"] - 4.0) < 1e-12 for r in out)


def test_kmeans_lattice_converges(spark, emb):
    """Lloyd monotonicity: total within-cluster sum of squares never
    increases with more iterations; every vector gets exactly one cluster."""
    from apollo_spark.ops.clustering import kmeans_lattice

    n = emb.count()
    wcss = {}
    for iters in (1, 3):
        assign, cent = kmeans_lattice(emb, k=4, iters=iters)
        rows = assign.collect()
        assert len(rows) == n
        assert len({r["vec_id"] for r in rows}) == n
        assert {r["cluster"] for r in rows} <= set(range(4))
        wcss[iters] = sum(r["dist"] for r in rows)
    assert wcss[3] <= wcss[1]


def test_lattice_assign_arrow_equals_relational(spark, emb):
    """The Arrow assignment fast path must be BIT-IDENTICAL to the
    relational twin the SQL oracles mirror: same (id, cluster, dist)
    trajectory through every Lloyd round, same post-update centroids, same
    final assignment — including arithmetic (exact int64) and the
    ties-to-smaller-cluster-id rule (ascending centroid order + argmin's
    first-minimum)."""
    from apollo_spark.ops.clustering import kmeans_lattice, lattice_final_assign

    a_assign, a_cent = kmeans_lattice(emb, k=7, iters=2, impl="arrow")
    r_assign, r_cent = kmeans_lattice(emb, k=7, iters=2, impl="relational")
    assert a_assign.exceptAll(r_assign).count() == 0
    assert r_assign.exceptAll(a_assign).count() == 0
    assert a_cent.exceptAll(r_cent).count() == 0
    assert r_cent.exceptAll(a_cent).count() == 0

    fa_a, _ = lattice_final_assign(emb, a_cent, impl="arrow")
    fa_r, _ = lattice_final_assign(emb, r_cent, impl="relational")
    assert fa_a.exceptAll(fa_r).count() == 0
    assert fa_r.exceptAll(fa_a).count() == 0


def test_lattice_assign_arrow_tie_breaks_to_smaller_cluster(spark):
    """Two identical centroids -> every vector is equidistant; the winner
    must be the smaller cluster id (the relational min(struct) rule)."""
    from apollo_spark.ops.clustering import lattice_assign_arrow

    import numpy as np

    emb = spark.createDataFrame(
        [(0, [0.1, 0.2]), (1, [0.3, 0.4])], "vec_id long, embedding array<float>"
    )
    C = np.array([[5, 5], [5, 5]], dtype=np.int64)
    out = lattice_assign_arrow(
        emb, np.array([3, 9], dtype=np.int64), C
    ).collect()
    assert {r["cluster"] for r in out} == {3}


def test_twolevel_shape_matches_sql_form():
    """twolevel_shape's integer kc must equal the SQL GREATEST(2, CEIL(SQRT(k)))
    the oracle derives, and kc * kf must cover k."""
    import math

    from apollo_spark.ops.clustering import twolevel_shape

    for k in list(range(1, 200)) + [4096, 4097, 65536, 10**9]:
        kc, kf = twolevel_shape(k)
        assert kc == max(2, math.ceil(math.sqrt(k))), k
        assert kc * kf >= k, k
        assert kf == math.ceil(k / kc), k


def test_kmeans_twolevel_arrow_equals_relational(spark, emb):
    """The cogroup Arrow fine path (no driver collect, no broadcast) must be
    BIT-IDENTICAL to the relational (cell, d)-keyed join twin the two-level
    SQL oracles mirror — assignments, post-update fine centroids, and the
    final coarse->fine assignment."""
    from apollo_spark.ops.clustering import kmeans_lattice_twolevel, twolevel_final_assign

    a_assign, a_fc, a_cc = kmeans_lattice_twolevel(emb, k=7, iters_coarse=2, iters_fine=2, impl="arrow")
    r_assign, r_fc, r_cc = kmeans_lattice_twolevel(emb, k=7, iters_coarse=2, iters_fine=2, impl="relational")
    for a, r in ((a_assign, r_assign), (a_fc, r_fc), (a_cc, r_cc)):
        assert a.exceptAll(r).count() == 0
        assert r.exceptAll(a).count() == 0
    fa = twolevel_final_assign(emb, a_cc, a_fc, impl="arrow")
    fr = twolevel_final_assign(emb, r_cc, r_fc, impl="relational")
    assert fa.exceptAll(fr).count() == 0
    assert fr.exceptAll(fa).count() == 0


def test_kmeans_twolevel_partition_of_corpus(spark, emb):
    """Every vector lands in exactly one fine cluster; each fine cluster's
    members share its cell; cluster count is capped by kc * kf."""
    from apollo_spark.ops.clustering import kmeans_lattice_twolevel, twolevel_final_assign, twolevel_shape

    n = emb.count()
    k = 9
    kc, kf = twolevel_shape(k)
    _, fc, cc = kmeans_lattice_twolevel(emb, k=k)
    fin = twolevel_final_assign(emb, cc, fc)
    rows = fin.collect()
    assert len(rows) == n
    assert len({r["vec_id"] for r in rows}) == n
    cl2cell = {}
    for r in rows:
        assert cl2cell.setdefault(r["cluster"], r["cell"]) == r["cell"]
    assert len(cl2cell) <= kc * kf
    assert len({r["cell"] for r in rows}) <= kc


def test_lattice_cluster_assign_routes_by_threshold(spark, emb):
    """Below the threshold the production entry reproduces the flat
    trajectory (the oracles' bits); forcing two-level reproduces
    twolevel_final_assign. Both return (id, cluster)."""
    from apollo_spark.ops.clustering import (
        kmeans_lattice,
        kmeans_lattice_twolevel,
        lattice_cluster_assign,
        lattice_final_assign,
        twolevel_final_assign,
    )

    flat = lattice_cluster_assign(emb, k=7, iters=2)
    _, cent = kmeans_lattice(emb, k=7, iters=2)
    ref, _ = lattice_final_assign(emb, cent)
    assert flat.exceptAll(ref.select("vec_id", "cluster")).count() == 0
    assert ref.select("vec_id", "cluster").exceptAll(flat).count() == 0

    two = lattice_cluster_assign(emb, k=7, iters=2, twolevel_threshold=0)
    _, fc, cc = kmeans_lattice_twolevel(emb, k=7, iters_coarse=2, iters_fine=2)
    ref2 = twolevel_final_assign(emb, cc, fc).select("vec_id", "cluster")
    assert two.exceptAll(ref2).count() == 0
    assert ref2.exceptAll(two).count() == 0


def test_train_or_load_centroids_twolevel_artifact(spark, emb, tmp_path):
    """The persisted centroid artifact round-trips: first call trains and
    commits, second call loads the SAME centroids without retraining (bit
    equality), and both levels are present."""
    from apollo_spark.ops.clustering import (
        kmeans_lattice_twolevel,
        train_or_load_centroids_twolevel,
    )

    path = str(tmp_path / "cents")
    cc1, fc1 = train_or_load_centroids_twolevel(emb, k=7, path=path)
    cc2, fc2 = train_or_load_centroids_twolevel(emb, k=7, path=path)
    assert cc1.exceptAll(cc2).count() == 0 and fc1.exceptAll(fc2).count() == 0
    _, fc_ref, cc_ref = kmeans_lattice_twolevel(emb, k=7)
    assert cc1.exceptAll(cc_ref).count() == 0 and cc_ref.exceptAll(cc1).count() == 0
    assert fc1.exceptAll(fc_ref).count() == 0 and fc_ref.exceptAll(fc1).count() == 0


def test_triangle_count_matches_bruteforce(spark):
    """Degree-ordered orientation vs itertools brute force on a seeded
    random graph (plus messy input: duplicates, reversed edges, self-loops)."""
    import itertools
    import random

    from apollo_spark.ops.graph import triangle_count

    rng = random.Random(7)
    nodes = list(range(30))
    undirected = {tuple(sorted(rng.sample(nodes, 2))) for _ in range(120)}
    adj = set(undirected)
    expected = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in adj and (b, c) in adj and (a, c) in adj
    )
    rows = []
    for a, b in undirected:
        rows.append((a, b))
        if rng.random() < 0.5:
            rows.append((b, a))  # reversed duplicate
    rows.append((3, 3))  # self-loop
    df = spark.createDataFrame(rows, ["src", "dst"])
    out = triangle_count(df).first()
    assert out["n_triangles"] == expected
    assert out["n_edges"] == len(undirected)
    assert out["n_nodes"] == len({v for e in undirected for v in e})


def test_all_pairs_cosine_low_threshold_quadratic_candidates(spark):
    """A low threshold makes the candidate set quadratic; the re-score joins
    must not force a driver-sized broadcast of it (AQE decides at runtime).
    Full N*(N-1)/2 output with scores matching numpy pins correctness of the
    unhinted-join path."""
    import numpy as np

    from apollo_spark.ops.similarity import all_pairs_cosine_exact

    rng = np.random.default_rng(7)
    n, dim = 40, 8
    vecs = rng.normal(size=(n, dim))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)], "vec_id long, embedding array<double>"
    )
    out = all_pairs_cosine_exact(df, threshold=-1.0).toPandas()
    assert len(out) == n * (n - 1) // 2
    norms = np.linalg.norm(vecs, axis=1)
    sims = (vecs / norms[:, None]) @ (vecs / norms[:, None]).T
    got = {(int(r.id_a), int(r.id_b)): r.score for r in out.itertuples()}
    for (a, b), s in got.items():
        assert abs(s - sims[a, b]) < 1e-9, (a, b)


def test_all_pairs_cosine_refuses_above_max_rows(spark):
    """O(N^2)-by-construction exact tier must refuse at corpus scale with an
    error naming the LSH path (the connected_components driver_threshold
    pattern); max_rows=None bypasses knowingly."""
    import pytest as _pytest

    from apollo_spark.ops.similarity import all_pairs_cosine_exact

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="embedding_near_dups"):
        all_pairs_cosine_exact(df, threshold=0.9, max_rows=10)
    out = all_pairs_cosine_exact(df, threshold=0.999999, max_rows=None)
    assert out.count() >= 0  # bypass path still plans and runs


def test_ppm_codec_roundtrip():
    import numpy as np

    from apollo_spark.ops.multimodal import decode_ppm, encode_ppm

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (11, 7, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    # ascii P3 with a comment line parses to the same pixels
    flat = " ".join(str(v) for v in img.ravel())
    p3 = f"P3\n# a comment\n7 11\n255\n{flat}\n".encode()
    assert (decode_ppm(p3) == img).all()


def test_wav_codec_roundtrip_and_spectral_peak():
    import numpy as np

    from apollo_spark.ops.multimodal import audio_features, decode_wav, encode_wav

    rate, freq = 8000, 440.0
    t = np.arange(rate) / rate  # 1s
    x = 0.5 * np.sin(2 * np.pi * freq * t)
    y, got_rate = decode_wav(encode_wav(x, rate))
    assert got_rate == rate and len(y) == len(x)
    assert np.abs(y - x).max() < 1e-3  # 16-bit quantization error only
    # the spectral fingerprint peaks in the band holding 440 Hz
    feat = audio_features(y, rate, dim=64)
    n_bins = len(np.fft.rfft(y))
    peak_bin = int(round(freq * len(y) / rate))
    expected_band = next(
        i for i, b in enumerate(np.array_split(np.arange(n_bins), 64)) if peak_bin in b
    )
    assert int(np.argmax(feat)) == expected_band


def test_extract_features_real_codecs(spark):
    """fake=False end-to-end over genuinely decodable payloads — the codec
    tier is executable in-container for PPM and WAV (VERDICT r2 item 7)."""
    import numpy as np

    from apollo_spark.ops.multimodal import (
        decode_features,
        extract_features,
        real_media_table,
    )

    media = real_media_table(spark, n=10)
    out = extract_features(media, dim=64, fake=False).toPandas()
    assert len(out) == 10
    local = {int(r.media_id): decode_features(bytes(r.payload), 64) for r in media.toPandas().itertuples()}
    for r in out.itertuples():
        assert np.allclose(np.array(r.features, dtype=np.float32), local[int(r.media_id)])
    # image features are block-mean gray in [0,1]; audio spectra are nonneg
    assert all(np.isfinite(v).all() for v in (np.array(r.features) for r in out.itertuples()))


def test_extract_features_unsupported_magic_is_explicit(spark):
    """Genuinely-unsupported formats stay explicit NotImplementedError seams
    (PNG/GIF/JPEG now really decode, so they are no longer seam examples);
    corrupt payloads of a *supported* format surface as ValueError."""
    import pytest as _pytest

    from apollo_spark.ops.multimodal import decode_features

    # BMP and MP3 have no codec in this repo — explicit seam.
    with _pytest.raises(NotImplementedError):
        decode_features(b"BM" + b"\x00" * 32, 64)
    with _pytest.raises(NotImplementedError):
        decode_features(b"ID3" + b"\x00" * 32, 64)
    # A truncated PNG is a *supported* magic with a corrupt body: ValueError.
    with _pytest.raises(ValueError):
        decode_features(b"\x89PNG\r\n\x1a\n....", 64)
    # A 4-byte PNG prefix with a mangled 8-byte signature (what CRLF
    # corruption produces — the very case the signature exists to catch) is
    # also ValueError, not a missing-codec seam.
    with _pytest.raises(ValueError, match="corrupt PNG signature"):
        decode_features(b"\x89PNG\n\n\n\n....", 64)


def test_sentence_chunks_budget_and_boundaries(spark):
    """Sentences are never split across chunks; assignment is floor
    bucketing on the global running word count (chunk =
    floor(words_before/budget)) — ids are monotone per doc but may SKIP
    when one sentence spans >= 2x budget; embedded U+001E control chars
    can't forge sentence boundaries."""
    from apollo_spark.ops.corpus import sentence_chunks

    text = (
        "one two three four five. six seven eight! nine ten eleven twelve? "
        "thirteen fourteen. fifteen sixteen seventeen eighteen nineteen twenty."
    )
    df = spark.createDataFrame([(1, text), (2, "no terminal punctuation here")],
                               "doc_id long, text string")
    out = sentence_chunks(df, budget_words=8).toPandas().sort_values(["doc_id", "chunk_id"])
    d1 = out[out.doc_id == 1].reset_index(drop=True)
    # words_before per sentence: 0,5,8,12,14 -> chunks 0,0,1,1,1
    assert list(d1["chunk_id"]) == [0, 1]
    assert list(d1["n_sentences"]) == [2, 3]
    assert list(d1["n_words"]) == [8, 12]
    assert d1.loc[0, "chunk_text"] == "one two three four five. six seven eight!"
    # a punctuation-free doc is one sentence -> one chunk, never split
    d2 = out[out.doc_id == 2]
    assert len(d2) == 1 and d2.iloc[0]["n_sentences"] == 1
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sentence_chunks(df, budget_words=0)


def test_sentence_chunks_skipped_ids_and_marker_hygiene(spark):
    """Documented non-dense behavior: a 20-word sentence at budget 8 puts
    the next sentence at words_before=20 -> chunk 2 (chunk 1 never exists).
    A raw U+001E in the text is normalized to a space, not a boundary."""
    from apollo_spark.ops.corpus import sentence_chunks

    long_sent = " ".join(f"w{i}" for i in range(20)) + "."
    df = spark.createDataFrame(
        [(1, long_sent + " short tail sentence."),
         (2, "alpha\x1ebeta gamma. delta epsilon zeta eta theta iota kappa lam mu nu.")],
        "doc_id long, text string",
    )
    out = sentence_chunks(df, budget_words=8).toPandas()
    d1 = out[out.doc_id == 1].sort_values("chunk_id")
    assert list(d1["chunk_id"]) == [0, 2]  # id 1 skipped, by contract
    d2 = out[out.doc_id == 2].sort_values("chunk_id")
    # \x1e became a space: first sentence is 'alpha beta gamma.' (3 words),
    # NOT two forged sentences
    assert d2.iloc[0]["chunk_text"].startswith("alpha beta gamma.")
    assert d2["n_sentences"].sum() == 2


def test_sentence_chunks_vertical_tab_cross_engine(spark):
    """Java regex \\s matches U+000B (vertical tab); RE2/DuckDB \\s does not —
    sentence_chunks therefore uses the explicit class [ \\t\\n\\f\\r] so a \\v
    after terminal punctuation or inside a word run splits IDENTICALLY in
    both engines (round-5 ADVICE). Certify by replaying the op's exact
    regexes in DuckDB on a \\v-bearing document and comparing chunk hashes."""
    import duckdb

    from apollo_spark.ops.corpus import sentence_chunks

    # \v after '.': NOT a sentence boundary in either engine now.
    # \v inside 'mid\vword': one word in both engines.
    text = "alpha beta gamma.\vdelta epsilon. zeta mid\vword eta theta iota kappa."
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = (
        sentence_chunks(df, budget_words=6)
        .toPandas()
        .sort_values("chunk_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    ddf = con.execute(
        r"""
WITH base AS (
  SELECT 1 AS doc_id,
         string_split(regexp_replace(replace(trim(?), chr(30), ' '),
                                     '([.!?])[ \t\n\f\r]+', '\1' || chr(30), 'g'), chr(30)) AS arr
),
sents AS (
  SELECT doc_id, i - 1 AS sidx, trim(arr[i]) AS sentence,
         len(string_split_regex(trim(arr[i]), '[ \t\n\f\r]+')) AS n_words
  FROM base, UNNEST(generate_series(1, len(arr))) AS u(i)
  WHERE length(trim(arr[i])) > 0
),
chunked AS (
  SELECT doc_id, sidx, sentence, n_words,
         CAST(floor(COALESCE(SUM(n_words) OVER (
           PARTITION BY doc_id ORDER BY sidx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 6.0) AS BIGINT) AS chunk_id
  FROM sents
)
SELECT chunk_id, CAST(COUNT(*) AS BIGINT) AS n_sentences,
       CAST(SUM(n_words) AS BIGINT) AS n_words,
       md5(string_agg(sentence, ' ' ORDER BY sidx)) AS chunk_hash
FROM chunked GROUP BY chunk_id ORDER BY chunk_id
""",
        [text],
    ).df()
    assert list(out["chunk_hash"]) == list(ddf["chunk_hash"])
    assert list(out["n_words"]) == list(ddf["n_words"])
    # and the \v really was load-bearing: the first sentence runs THROUGH it
    assert "gamma.\vdelta" in out.iloc[0]["chunk_text"]


def test_pack_sequences_tape_is_contiguous(spark):
    """The bucketed two-phase running sum must equal a naive global cumsum:
    documents tile the token tape with no gaps or overlaps, and sequence
    spans follow from start_pos arithmetic."""
    from apollo_spark.ops.corpus import pack_sequences

    rows = [(i, " ".join(["w"] * (1 + (i * 13) % 40))) for i in range(200)]
    rows.append((999, "   "))  # empty doc: dropped, occupies no tape
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, seq_len=64).toPandas()
    assert 999 not in set(out["doc_id"])
    laid = out.sort_values("start_pos").reset_index(drop=True)
    # no gaps/overlaps: each start = previous start + previous length
    expect = 0
    for r in laid.itertuples():
        assert r.start_pos == expect
        assert r.seq_first == r.start_pos // 64
        assert r.seq_last == (r.start_pos + r.n_tokens - 1) // 64
        assert r.offset_in_seq == r.start_pos % 64
        expect += r.n_tokens
    # deterministic: same input -> same layout
    again = pack_sequences(df, seq_len=64).toPandas().sort_values("start_pos").reset_index(drop=True)
    assert (again["doc_id"].to_numpy() == laid["doc_id"].to_numpy()).all()


def test_mixture_weights_temperature_limits(spark):
    """alpha=1 reproduces proportional sampling; small alpha flattens toward
    uniform; weights always sum to ~1."""
    import numpy as np

    from apollo_spark.ops.corpus import mixture_weights_temperature

    df = spark.createDataFrame(
        [("a", 1000), ("b", 100), ("c", 10)], "source string, group_tokens long"
    )
    w1 = {r.source: r.weight for r in mixture_weights_temperature(df, alpha=1.0).collect()}
    assert abs(w1["a"] - 1000 / 1110) < 1e-6
    w0 = {r.source: r.weight for r in mixture_weights_temperature(df, alpha=0.01).collect()}
    assert abs(sum(w0.values()) - 1.0) < 1e-6
    assert max(w0.values()) - min(w0.values()) < 0.05  # near uniform
    spread1 = w1["a"] - w1["c"]
    w5 = {r.source: r.weight for r in mixture_weights_temperature(df, alpha=0.5).collect()}
    assert w5["a"] - w5["c"] < spread1  # smoothing monotone in alpha


def test_histogram_sketch_merge_and_quantile_accuracy(spark):
    """Split-then-merge equals whole (the mergeability contract), and the
    interpolated quantile lands within one bin width of the exact value."""
    from apollo_spark.ops.sketch import histogram_merge, histogram_quantile, histogram_sketch

    df = spark.range(10_000).select(
        (F.col("id") % 3).cast("string").alias("g"), (F.col("id") % 1000).cast("double").alias("v")
    )
    lo, hi, bins = 0.0, 1000.0, 50
    whole = histogram_sketch(df, "v", lo, hi, bins, ["g"])
    a = histogram_sketch(df.filter("id % 2 = 0"), "v", lo, hi, bins, ["g"])
    b = histogram_sketch(df.filter("id % 2 = 1"), "v", lo, hi, bins, ["g"])
    merged = histogram_merge(a, b, ["g"])
    wm = {(r.g, r.bin): r.n for r in whole.collect()}
    mm = {(r.g, r.bin): r.n for r in merged.collect()}
    assert wm == mm
    q = histogram_quantile(whole, 0.5, lo, hi, bins, ["g"]).collect()
    for r in q:
        assert abs(r.quantile_est - 500.0) <= (hi - lo) / bins + 1e-9  # exact p50 ~ 499.5
    # out-of-range values clamp, never drop
    oob = spark.createDataFrame([("x", -5.0), ("x", 2000.0)], "g string, v double")
    h = histogram_sketch(oob, "v", lo, hi, bins, ["g"]).collect()
    assert sorted((r.bin, r.n) for r in h) == [(0, 1), (bins - 1, 1)]


def test_catalog_reads_orc(spark, tmp_path):
    from apollo_spark.sources.tables import Catalog

    spark.range(7).selectExpr("id", "id * 3 AS v").write.orc(str(tmp_path / "t.orc"))
    cat = Catalog(spark, tmp_path)
    assert cat.has("t") and cat.table("t").count() == 7


def test_bpe_learn_merges_matches_greedy_reference(spark):
    """Full trajectory equality with a pure-python greedy BPE learner —
    including the run-merge edge cases ('aaaa' -> 'aa aa', never 'aa a a')
    that a naive single-space string replace gets wrong."""
    import re as _re
    from collections import Counter

    from apollo_spark.ops.text import bpe_learn_merges

    texts = [
        "the theater thesis then there other breathe",
        "banana bandana ananas banana banana",
        "aaaa aaaaa aa aaaa",
        "the the the other theory",
    ]

    wc = Counter()
    for t in texts:
        for w in _re.split(r"\s+", t.strip().lower()):
            if 0 < len(w) <= 24:
                wc[w] += 1
    words = {w: list(w) for w in wc}
    expected = []
    for rank in range(1, 7):
        pc = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc[w]
        if not pc:
            break
        best_c = max(pc.values())
        l, r = sorted(k for k, v in pc.items() if v == best_c)[0]
        expected.append((rank, l, r, pc[(l, r)]))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in bpe_learn_merges(df, 6).orderBy("merge_rank").collect()
    ]
    assert got == expected


def test_local_clustering_known_graph(spark):
    """K4 plus a pendant: every K4 node closes all its K4 wedges; the
    pendant-attached node's coefficient dilutes; degree-1 node is 0."""
    from apollo_spark.ops.graph import local_clustering

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    edges = spark.createDataFrame(k4 + [(4, 5)], "src long, dst long")
    got = {r.node: (r.deg, r.n_tri, round(r.coeff, 6)) for r in local_clustering(edges).collect()}
    assert got[1] == (3, 3, 1.0)
    assert got[2] == (3, 3, 1.0)
    assert got[3] == (3, 3, 1.0)
    assert got[4] == (4, 3, 0.5)  # 3 triangles of C(4,2)=6 possible pairs
    assert got[5] == (1, 0, 0.0)


def test_extract_features_skips_poison_payloads(spark):
    """One null/truncated/unsupported payload must drop, not kill the job
    (the malformed-row posture of the ABI decoder and Kafka adapter)."""
    from apollo_spark.ops.multimodal import MEDIA_SCHEMA, encode_ppm, extract_features
    import numpy as np
    import pytest as _pytest

    good = encode_ppm(np.zeros((4, 4, 3), dtype=np.uint8))
    meta = {"mime": None, "width": None, "height": None, "duration_ms": None}
    rows = [
        (1, "image", bytearray(good), meta),
        (2, "image", None, meta),                      # null payload
        (3, "image", bytearray(b"P6\n4 4\n255\n\x00"), meta),  # truncated raster
        (4, "image", bytearray(b"\x89PNG...."), meta),  # corrupt PNG signature
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = extract_features(df, dim=16, fake=False).toPandas()
    assert list(out["media_id"]) == [1]
    with _pytest.raises(Exception):
        extract_features(df, dim=16, fake=False, on_error="raise").toPandas()


def test_image_features_16bit_normalization():
    """8-bit and 16-bit renderings of the same scene must produce the same
    [0,1] feature vector (normalization follows pixel dtype)."""
    import numpy as np

    from apollo_spark.ops.multimodal import decode_ppm, image_features

    img8 = np.full((4, 4, 3), 128, dtype=np.uint8)
    img16 = (img8.astype(np.uint16) * 257)  # 0..255 -> 0..65535 scale
    f8 = image_features(img8, 16)
    f16 = image_features(img16, 16)
    assert np.allclose(f8, f16, atol=1e-6)
    assert f16.max() <= 1.0
    # and a decoded 16-bit P6 stays in range end-to-end
    hdr = b"P6\n2 2\n65535\n" + img16[:2, :2].astype(">u2").tobytes()
    assert image_features(decode_ppm(hdr), 16).max() <= 1.0


def test_ngram_jaccard_cap_recovers_mega_duplicate_clusters(spark):
    """Documents duplicated more often than max_df lose ALL shingles to the
    prune; the exact set-hash recovery must still emit their jaccard-1.0
    star pairs (canonical min id -> member)."""
    from apollo_spark.ops.dedup import ngram_jaccard_pairs

    dup = "exact duplicate boilerplate page content here"
    rows = [(i, dup) for i in range(12)]
    rows += [(100, "alpha beta gamma delta epsilon zeta"), (101, "alpha beta gamma delta epsilon eta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = ngram_jaccard_pairs(df, threshold=0.3, max_df=5).toPandas()
    star = {(r.id_a, r.id_b): r.jaccard for r in out.itertuples() if r.id_b < 100}
    assert set(star) == {(0, i) for i in range(1, 12)}  # min-id star over the cluster
    assert all(v == 1.0 for v in star.values())
    assert (100, 101) in {(r.id_a, r.id_b) for r in out.itertuples()}  # normal pairs intact


def test_k_core_peel_known_graph(spark):
    """Triangle + tail: 2-core peels the tail chain (iteratively — the chain
    end keeps cascading), leaving exactly the triangle with degree 2 each."""
    from apollo_spark.ops.graph import k_core_peel

    # triangle 1-2-3 plus a chain 3-4-5
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    got = {r.node: r.deg for r in k_core_peel(edges, k=2, rounds=3).collect()}
    assert got == {1: 2, 2: 2, 3: 2}
    # one round only removes node 5; node 4 survives round 1 with deg 2
    got1 = {r.node: r.deg for r in k_core_peel(edges, k=2, rounds=1).collect()}
    assert set(got1) == {1, 2, 3, 4}


def test_weighted_sample_bias_and_determinism(spark):
    from apollo_spark.ops.corpus import weighted_sample

    rows = [(i, 1000.0 if i == 0 else 1.0) for i in range(40)]
    rows.append((99, 0.0))  # zero weight: never sampled
    df = spark.createDataFrame(rows, "doc_id long, w double")
    hits = 0
    for salt in map(str, range(12)):
        picked = {r.doc_id for r in weighted_sample(df, k=3, weight_col="w", salt=salt).collect()}
        assert 99 not in picked and len(picked) == 3
        hits += 0 in picked
    assert hits >= 10  # ~1000x the mass of any other doc -> nearly always in
    a = [r.doc_id for r in weighted_sample(df, k=5, weight_col="w").collect()]
    b = [r.doc_id for r in weighted_sample(df, k=5, weight_col="w").collect()]
    assert a == b  # reproducible


def test_image_features_header_maxval_normalization():
    """Normalization must follow the PPM header's declared white point, not
    the storage dtype: a 10-bit image (maxval=1023, stored uint16) and the
    8-bit rendering of the same scene produce the same features."""
    import numpy as np

    from apollo_spark.ops.multimodal import decode_features

    # same scene at two bit depths: gray level 50% everywhere
    img8 = b"P6\n2 2\n255\n" + bytes([128] * 12)
    img10 = b"P6\n2 2\n1023\n" + np.full(12, 512, dtype=">u2").tobytes()
    f8 = decode_features(img8, 4)
    f10 = decode_features(img10, 4)
    assert np.allclose(f8, f10, atol=2e-3)  # 128/255 vs 512/1023
    assert f10.max() <= 1.0


def test_extract_features_skips_null_media_id(spark):
    from apollo_spark.ops.multimodal import MEDIA_SCHEMA, encode_ppm, extract_features
    import numpy as np

    good = encode_ppm(np.zeros((4, 4, 3), dtype=np.uint8))
    meta = {"mime": None, "width": None, "height": None, "duration_ms": None}
    df = spark.createDataFrame(
        [(7, "image", bytearray(good), meta), (None, "image", bytearray(good), meta)],
        MEDIA_SCHEMA,
    )
    out = extract_features(df, dim=16, fake=False).toPandas()
    assert list(out["media_id"]) == [7]


def test_nfc_normalize_composes_and_preserves(spark):
    import unicodedata

    from apollo_spark.ops.text import nfc_normalize

    rows = [
        (1, "café olé"),        # decomposed accents -> composed
        (2, "café"),                   # already NFC: unchanged
        (3, "ﬁn"),                     # ligature: NFC preserves (not NFKC)
        (4, None),
        (5, "plain ascii"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.n for r in df.select("doc_id", nfc_normalize(F.col("text")).alias("n")).collect()}
    for i, t in rows:
        assert got[i] == (unicodedata.normalize("NFC", t) if t is not None else None)
    assert got[1] == "café olé" and got[3] == "ﬁn"


def test_bloom_no_false_negatives_and_merge(spark):
    from apollo_spark.ops.sketch import bloom_build, bloom_merge, bloom_might_contain

    a = spark.range(0, 300).select(F.col("id").cast("string").alias("k"))
    b = spark.range(300, 600).select(F.col("id").cast("string").alias("k"))
    whole = bloom_build(a.unionByName(b), "k", m_bits=4096, k=3)
    merged = bloom_merge(
        bloom_build(a, "k", m_bits=4096, k=3), bloom_build(b, "k", m_bits=4096, k=3)
    )
    # merge of two halves is bit-identical to building over the union
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))

    probe = spark.range(0, 3000).select(F.col("id").cast("string").alias("k"))
    res = bloom_might_contain(probe, "k", whole, m_bits=4096, k=3)
    members = res.filter(F.col("id" if "id" in res.columns else "k").cast("long") < 600)
    # every true member must pass (no false negatives — the Bloom guarantee)
    assert members.filter(~F.col("might_member")).count() == 0
    # false-positive rate stays near theory: (1-e^{-kn/m})^k ~ 4.6% here;
    # allow generous slack for hash variance on 2400 negatives
    fp = res.filter((F.col("k").cast("long") >= 600) & F.col("might_member")).count()
    assert fp / 2400 < 0.15


def test_random_projection_preserves_distances(spark, emb):
    from apollo_spark.ops.similarity import random_projection

    sample = emb.limit(40)
    out = random_projection(sample, out_dims=16).collect()
    full = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in out}
    proj = {r.vec_id: np.array([r[f"proj_{j}"] for j in range(16)]) for r in out}
    ids = sorted(full)
    # JL lemma sanity: squared-distance ratios concentrate around 1; with
    # k=16 the per-pair variance is high, so check the MEDIAN ratio tightly
    # and individual pairs loosely
    ratios = []
    for a in ids[:20]:
        for b in ids[:20]:
            if a >= b:
                continue
            d_full = np.sum((full[a] - full[b]) ** 2)
            d_proj = np.sum((proj[a] - proj[b]) ** 2)
            if d_full > 0:
                ratios.append(d_proj / d_full)
    med = float(np.median(ratios))
    assert 0.6 < med < 1.4, med
    assert all(0.05 < r < 5.0 for r in ratios), (min(ratios), max(ratios))


def test_embedding_covariance_and_pca_match_numpy(spark, emb):
    from apollo_spark.ops.similarity import embedding_covariance, pca_components, pca_project

    pdf = emb.toPandas()
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    npcov = np.cov(X.T, bias=True)

    tri = embedding_covariance(emb).collect()
    d = X.shape[1]
    got = np.zeros((d, d))
    for r in tri:
        got[r.i, r.j] = r.cov
        got[r.j, r.i] = r.cov
    # decimal-quantized sums: agreement to ~1e-5 absolute
    assert np.max(np.abs(got - npcov)) < 1e-4

    comps, vals = pca_components(emb, k=4)
    npvals = np.sort(np.linalg.eigvalsh(npcov))[::-1][:4]
    assert np.allclose(vals, npvals, atol=1e-3)
    # components orthonormal, variance-ordered
    assert np.allclose(comps @ comps.T, np.eye(4), atol=1e-6)
    assert all(vals[i] >= vals[i + 1] - 1e-12 for i in range(3))

    proj = pca_project(emb, comps).select("vec_id", "pc_0", "pc_1", "pc_2", "pc_3")
    got_proj = {r.vec_id: np.array([r.pc_0, r.pc_1, r.pc_2, r.pc_3]) for r in proj.collect()}
    want = X @ comps.T
    ids = pdf["vec_id"].to_numpy()
    err = max(np.max(np.abs(got_proj[i] - want[n])) for n, i in enumerate(ids))
    assert err < 1e-9


def test_label_propagation_splits_bridged_clusters(spark):
    from apollo_spark.ops.graph import label_propagation

    # two 4-cliques {0..3} and {10..13} joined by one bridge 3-10:
    # frequency voting must keep two communities (CC would merge them)
    clique = lambda ns: [(a, b) for a in ns for b in ns if a < b]
    edges = clique([0, 1, 2, 3]) + clique([10, 11, 12, 13]) + [(3, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r.node: r.label for r in label_propagation(df, rounds=4).collect()}
    left = {out[n] for n in (0, 1, 2, 3)}
    right = {out[n] for n in (10, 11, 12, 13)}
    assert left == {0}
    assert right == {10} or right == {0, 10} or len(right) == 1
    # the two cliques must NOT share one label throughout
    assert {out[0], out[11]} != {out[0]}


def test_pq_codes_structure_and_compression_gain(spark, emb):
    from apollo_spark.ops.clustering import pq_codes

    out = pq_codes(emb, dim=64, m=4, k=8, iters=2).collect()
    by_vec = {}
    for r in out:
        by_vec.setdefault(r.vec_id, {})[r.subspace] = (r.code, r.dist)
    # every vector gets exactly one code per subspace; codes within [0, k)
    assert all(sorted(d) == [0, 1, 2, 3] for d in by_vec.values())
    assert all(0 <= c < 8 and dist >= 0 for d in by_vec.values() for c, dist in d.values())
    # quantization actually clusters: total residual with k=8 must beat k=1
    # (everything assigned to the mean). The synthetic embeddings are
    # near-isotropic noise, where k-means gains are inherently modest in
    # 16-dim subspaces — any structured corpus does far better; the point
    # here is a strict, deterministic improvement.
    tot8 = sum(dist for d in by_vec.values() for _, dist in d.values())
    out1 = pq_codes(emb, dim=64, m=4, k=1, iters=2).collect()
    tot1 = sum(r.dist for r in out1)
    assert tot8 < 0.95 * tot1, (tot8, tot1)


def test_gopher_quality_rules_fire_correctly(spark):
    from apollo_spark.ops.text import gopher_quality_keep, gopher_quality_rules

    rows = [
        (1, "the quick brown fox jumps over the lazy dog and runs off to the "
            "hills with great speed because it must have been chased by hounds "
            "that would not give up easily on such a fine morning indeed"),
        (2, "# # # # # # # # # # the of and to be that have with " * 4),  # hash spam
        (3, "word " * 30),  # no stopwords, repetitive
        (4, "- item one\n- item two\n- item three\n- item four"),  # all bullets
        (5, "the story continues... and continues... " * 10),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    rules = gopher_quality_rules(F.col("text"), min_words=20)
    out = {
        r.doc_id: r.asDict()
        for r in df.select(
            "doc_id",
            *[c.alias(n) for n, c in rules.items()],
            gopher_quality_keep(F.col("text"), min_words=20).alias("keep"),
        ).collect()
    }
    assert out[1]["keep"] is True
    assert out[2]["rule_hash_ratio"] is False and out[2]["keep"] is False
    assert out[3]["rule_stopwords"] is False and out[3]["keep"] is False
    assert out[4]["rule_bullet_lines"] is False
    assert out[5]["rule_ellipsis_ratio"] is False


def test_pq_adc_search_minimality_and_shape(spark, emb):
    from apollo_spark.ops.clustering import pq_adc_topk

    out = pq_adc_topk(emb, [0, 1, 2], dim=64, m=4, k=8, iters=2, topk=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.q_id, []).append(r)
    assert sorted(by_q) == [0, 1, 2]
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
        assert all(rows[i].adc_dist <= rows[i + 1].adc_dist for i in range(4))
        # the query's own codes are per-subspace argmins, so the query
        # achieves the global minimum ADC score — it must appear in the
        # top-5 (rank >1 only behind same-coded vectors with smaller ids)
        assert any(r.vec_id == q for r in rows), (q, [(r.vec_id, r.adc_dist) for r in rows])
        top1 = rows[0]
        self_score = next(r.adc_dist for r in rows if r.vec_id == q)
        assert top1.adc_dist == self_score


def test_resize_images_real_codec_roundtrip(spark):
    from apollo_spark.ops.multimodal import (
        decode_ppm,
        real_media_table,
        resize_images,
        resize_nearest,
    )

    media = real_media_table(spark, n=6).filter(F.col("kind") == "image")
    out = resize_images(media, height=8, width=12).collect()
    assert len(out) == media.count()
    for r in out:
        img = decode_ppm(bytes(r.payload))
        assert img.shape == (8, 12, 3)
    # pixel-level correctness of the index mapping on a known gradient
    src = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    small = resize_nearest(src, 2, 3)
    assert small.shape == (2, 3, 3)
    assert (small == src[[0, 2]][:, [0, 2, 4]]).all()
    # poison payload is skipped, not fatal
    bad = spark.createDataFrame([(99, bytearray(b"nonsense"))], "media_id long, payload binary")
    assert resize_images(bad, 4, 4).count() == 0


def test_mmr_diversifies_over_plain_topk(spark, emb):
    from apollo_spark.ops.clustering import embedding_lattice
    from apollo_spark.ops.similarity import mmr_diverse_topk

    out = mmr_diverse_topk(emb, query_id=0, pool=30, k=5).collect()
    ids = [r.vec_id for r in sorted(out, key=lambda r: r.rank)]
    assert len(set(ids)) == 5 and 0 not in ids

    # exact lattice distances for verification
    long = {(r[0], r[1]): r[2] for r in embedding_lattice(emb).collect()}
    dims = sorted({d for _, d in long})

    def dist(a, b):
        return sum((long[(a, d)] - long[(b, d)]) ** 2 for d in dims)

    # rank 1 must be the true nearest neighbor (query excluded)
    all_ids = sorted({i for i, _ in long} - {0})
    nn = min(all_ids, key=lambda x: (dist(0, x), x))
    assert ids[0] == nn

    # diversity: MMR's min pairwise distance >= plain top-5's
    plain = sorted(all_ids, key=lambda x: (dist(0, x), x))[:5]
    min_pair = lambda sel: min(
        dist(a, b) for i, a in enumerate(sel) for b in sel[i + 1 :]
    )
    assert min_pair(ids) >= min_pair(plain), (min_pair(ids), min_pair(plain))


def test_theta_sketch_accuracy_and_set_algebra(spark):
    from pyspark.sql import functions as F

    from apollo_spark.ops.sketch import (
        theta_diff,
        theta_estimate,
        theta_intersect,
        theta_sketch,
        theta_union,
    )

    # A = [0, 12000), B = [8000, 20000): |A|=12000 |B|=12000 |A∩B|=4000 |A∪B|=20000
    a_df = spark.range(0, 12000)
    b_df = spark.range(8000, 20000)
    k2 = 3  # K=8
    a = theta_sketch(a_df, "id", log2_k=k2).persist()
    b = theta_sketch(b_df, "id", log2_k=k2).persist()

    def est(sk):
        return theta_estimate(sk, log2_k=k2).collect()[0][0]

    import math

    for got, true in [
        (est(a), 12000),
        (est(b), 12000),
        (est(theta_union(a, b)), 20000),
        (est(theta_intersect(a, b)), 4000),
        (est(theta_diff(a, b)), 8000),
    ]:
        # retained ~ true/K; rel stderr ~ sqrt((K-1)/retained); allow 5 sigma
        sigma = true * math.sqrt((2**k2 - 1) / max(true / 2**k2, 1.0))
        assert abs(got - true) <= 5 * sigma, (got, true)

    # mergeability: sketch(A ∪ B rows) == theta_union(sketch(A), sketch(B))
    whole = theta_sketch(a_df.unionByName(b_df), "id", log2_k=k2)
    sym = theta_union(whole, theta_union(a, b)).subtract(theta_intersect(whole, theta_union(a, b)))
    assert sym.count() == 0

    # estimates are exact multiples of K (pure-integer contract for the oracle)
    assert est(a) % 2**k2 == 0


def test_ahash_banded_pairs_lossless_vs_bruteforce(spark):
    import itertools
    import random

    from pyspark.sql import functions as F

    from apollo_spark.ops.multimodal import ahash64, ahash_pairs, image_luma

    rng = random.Random(7)
    hashes = [(i, rng.getrandbits(16)) for i in range(300)]
    hdf = spark.createDataFrame(hashes, "media_id long, ahash long")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in ahash_pairs(hdf, max_hamming=2, bits=16).collect()
    }
    want = {
        (a, b, bin(ha ^ hb).count("1"))
        for (a, ha), (b, hb) in itertools.combinations(hashes, 2)
        if bin(ha ^ hb).count("1") <= 2
    }
    assert got == want

    # end-to-end: identical rasters -> hamming 0 via the REAL PPM decode
    raster = bytes(range(48))
    payload = b"P6\n4 4\n255\n" + raster
    media = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(payload))], "media_id long, payload binary"
    )
    h = ahash64(image_luma(media))
    rows = {r.media_id: (r.ahash, r.n_px) for r in h.collect()}
    assert rows[1] == rows[2] and rows[1][1] == 16
    # python replay of the integer aHash definition
    luma = [sum(raster[3 * p : 3 * p + 3]) for p in range(16)]
    tot = sum(luma)
    want_hash = sum(1 << p for p in range(16) if 16 * luma[p] > tot)
    assert rows[1][0] == want_hash


def test_rrf_fuse_known_answer(spark):
    from apollo_spark.ops.retrieval import rrf_fuse

    lex = spark.createDataFrame([(10, 1), (20, 2), (30, 3)], "doc_id long, rank int")
    dense = spark.createDataFrame([(20, 1), (10, 2), (40, 3)], "doc_id long, rank int")
    out = {r.doc_id: (r.rrf_score, r.n_lists) for r in rrf_fuse([lex, dense]).collect()}
    s = 1_000_000_000
    assert out[10] == (s // 61 + s // 62, 2)
    assert out[20] == (s // 62 + s // 61, 2)
    assert out[30] == (s // 63, 1)
    assert out[40] == (s // 63, 1)
    # docs seen by both retrievers outrank single-list docs of equal rank
    assert out[10][0] > out[30][0]


def test_perceptron_exact_trajectory_and_separable_convergence(spark):
    from pyspark.sql import functions as F

    from apollo_spark.ops.ml import classifier_margins, perceptron_train

    # hand-checkable 2-feature problem: y = sign(x0 - x1)
    #   docs: (id, {b: n}), labels
    feats_rows = [
        (1, 0, 3), (1, 1, 1),   # x0=3, x1=1 -> +1
        (2, 0, 1), (2, 1, 4),   # x0=1, x1=4 -> -1
        (3, 0, 5), (3, 1, 2),   # +1
        (4, 0, 0), (4, 1, 3),   # -1
    ]
    feats = spark.createDataFrame(feats_rows, "doc_id long, b int, n long")
    labels = spark.createDataFrame([(1, 1), (2, -1), (3, 1), (4, -1)], "doc_id long, y int")

    # python replay of the batch rule
    import collections

    fd = collections.defaultdict(dict)
    for i, b, n in feats_rows:
        fd[i][b] = n
    ys = {1: 1, 2: -1, 3: 1, 4: -1}
    w = {0: 0, 1: 0}
    for _ in range(4):
        wrong = [i for i in fd if ys[i] * sum(n * w[b] for b, n in fd[i].items()) <= 0]
        for i in wrong:
            for b, n in fd[i].items():
                w[b] += ys[i] * n
    got = {r.b: r.weight for r in perceptron_train(feats, labels, iters=4).collect()}
    assert got == w

    # the learned separator classifies the separable set perfectly
    wdf = spark.createDataFrame(list(w.items()), "b int, weight long")
    sc = {r.doc_id: r.score for r in classifier_margins(feats, wdf).collect()}
    assert all(ys[i] * sc[i] > 0 for i in fd)


def test_bigram_cross_entropy_known_answer(spark):
    import math

    from apollo_spark.ops.text import bigram_cross_entropy

    ref = spark.createDataFrame([(100, "a b a b")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "z z")], "doc_id long, text string"
    )
    out = {r.doc_id: (r.n_bigrams, r.ce2) for r in bigram_cross_entropy(docs, ref).collect()}
    # ref: c(a)=2, c(b)=2, T=4, V=2; bigrams (a,b)x2, (b,a)x1
    p_ab = 0.7 * (2 / 2) + (1.0 - 0.7) * ((2 + 1) / (4 + 2 + 1))
    assert out[1][0] == 1
    assert abs(out[1][1] - (-math.log(p_ab))) < 1e-6  # DECIMAL(38,6) term grain
    # unseen context z: bigram term 0, pure unigram floor
    p_zz = 0.0 + (1.0 - 0.7) * ((0 + 1) / (4 + 2 + 1))
    assert abs(out[2][1] - (-math.log(p_zz))) < 1e-6
    # out-of-domain doc scores strictly worse (higher cross-entropy)
    assert out[2][1] > out[1][1]


def test_skipgram_pairs_no_subsample_known_answer(spark):
    from apollo_spark.ops.corpus import skipgram_pairs

    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    out = {(r.center, r.context): r.n for r in skipgram_pairs(docs, window=2, subsample_t=None).collect()}
    # ±2 pairs over a b c d: symmetric, 10 ordered pairs
    want = {
        ("a", "b"): 1, ("a", "c"): 1,
        ("b", "a"): 1, ("b", "c"): 1, ("b", "d"): 1,
        ("c", "a"): 1, ("c", "b"): 1, ("c", "d"): 1,
        ("d", "b"): 1, ("d", "c"): 1,
    }
    assert out == want

    # subsampling keeps rare words: with tiny t all high-freq words drop more
    docs2 = spark.createDataFrame(
        [(i, "the the the the rareword the the") for i in range(50)],
        "doc_id long, text string",
    )
    pairs = skipgram_pairs(docs2, window=2, subsample_t=1e-3).collect()
    kept_the = sum(r.n for r in pairs if r.center == "the")
    total_the_pairs_nosub = sum(
        r.n for r in skipgram_pairs(docs2, window=2, subsample_t=None).collect() if r.center == "the"
    )
    assert kept_the < total_the_pairs_nosub  # aggressive downsampling of the stopword


# --------------------------------------------------------------------------
# round 3: interval_join / hash_sample / zca_whiten / hard-sigmoid logreg
# --------------------------------------------------------------------------


def _interval_fixture(spark):
    left = spark.createDataFrame(
        [(1, 0, 10), (1, 100, 200), (2, 5, 15), (2, 7000, 7200)],
        "k long, lo long, hi long",
    ).withColumnsRenamed({"lo": "l_lo", "hi": "l_hi"})
    right = spark.createDataFrame(
        [(1, 5, 12), (1, 500, 600), (2, 0, 4), (2, 7100, 7150), (3, 0, 100)],
        "k long, lo long, hi long",
    ).withColumnsRenamed({"lo": "r_lo", "hi": "r_hi"})
    return left, right


def test_interval_join_plain_equals_bucketed(spark):
    from apollo_spark.ops.relational import interval_join

    left, right = _interval_fixture(spark)
    want = {(1, 0, 10, 5, 12), (2, 7000, 7200, 7100, 7150)}
    plain = interval_join(left, right, ["k"], "l_lo", "l_hi", "r_lo", "r_hi")
    assert {tuple(r) for r in plain.collect()} == want
    # bucketed: identical result, exactly-once even when a pair shares many
    # buckets (width 8 splits [0,10]x[5,12] across 2 shared buckets)
    for w in (8, 50, 100_000):
        b = interval_join(left, right, ["k"], "l_lo", "l_hi", "r_lo", "r_hi", bucket_width=w)
        assert {tuple(r) for r in b.collect()} == want, f"width={w}"


def test_interval_join_touching_endpoints_inclusive(spark):
    from apollo_spark.ops.relational import interval_join

    left = spark.createDataFrame([(1, 0, 10)], "k long, l_lo long, l_hi long")
    right = spark.createDataFrame([(1, 10, 20), (1, 21, 30)], "k long, r_lo long, r_hi long")
    out = interval_join(left, right, ["k"], "l_lo", "l_hi", "r_lo", "r_hi", bucket_width=4)
    assert [(r.r_lo, r.r_hi) for r in out.collect()] == [(10, 20)]  # closed-interval touch


def test_hash_sample_mergeable_and_coordinated(spark):
    from apollo_spark.ops.sketch import hash_sample

    df = spark.range(0, 4000).select(F.col("id"))
    s_all = {r.id for r in hash_sample(df, "id", 8).collect()}
    # mergeable: union of part-samples == sample of union (same salt/denom)
    lo, hi = df.filter("id < 2000"), df.filter("id >= 2000")
    merged = {r.id for r in hash_sample(lo, "id", 8).union(hash_sample(hi, "id", 8)).collect()}
    assert merged == s_all
    # coordinated: the same key draws the same verdict in a different table
    other = spark.range(0, 4000).select(F.col("id"), (F.col("id") * 2).alias("v"))
    s_other = {r.id for r in hash_sample(other, "id", 8).collect()}
    assert s_other == s_all
    # rate lands near 1/8 (md5 uniformity)
    assert 0.06 < len(s_all) / 4000 < 0.19


def test_zca_whiten_identity_covariance(spark):
    from apollo_spark.ops.similarity import zca_whiten

    rng = np.random.default_rng(7)
    x = rng.normal(size=(400, 4))
    x[:, 1] = 0.9 * x[:, 0] + 0.1 * x[:, 1]  # strong correlation to remove
    rows = [(i, [float(v) for v in x[i]]) for i in range(len(x))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = zca_whiten(df, "embedding", eps=1e-8, out_col="w")
    w = np.array([r.w for r in out.orderBy("vec_id").collect()])
    cov = np.cov(w, rowvar=False, bias=True)
    assert np.allclose(cov, np.eye(4), atol=0.05)
    # numpy parity of the transform itself
    xf = x.astype(np.float32).astype(np.float64)
    mu = xf.mean(axis=0)
    c = np.cov(xf, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(c)
    wm = (vecs * (1.0 / np.sqrt(np.maximum(vals, 0) + 1e-8))) @ vecs.T
    ref = (xf - mu) @ wm.T
    # engine covariance rides DECIMAL(38,6) sums -> ~1e-6 grain in cov, so
    # per-coordinate parity holds to ~1e-4, not machine epsilon
    assert np.allclose(w, ref, atol=1e-4)


def test_floor_div_matches_python_floor(spark):
    from apollo_spark.ops.ml import floor_div

    df = spark.createDataFrame([(a,) for a in (-130, -64, -1, 0, 1, 63, 64, 130)], "a long")
    got = {r.a: r.q for r in df.select("a", floor_div(F.col("a"), 64).alias("q")).collect()}
    assert got == {a: a // 64 for a in got}


def test_logreg_hard_sigmoid_learns_and_calms(spark):
    from apollo_spark.ops.ml import (
        LOGREG_SCALE,
        classifier_margins,
        hashed_token_features,
        logreg_train_hardsigmoid,
    )

    rows = [(i, "good clean prose", 1) for i in range(30)] + [
        (i + 30, "spam junk noise", 0) for i in range(30)
    ]
    docs = spark.createDataFrame([(i, t) for i, t, _ in rows], "doc_id long, text string")
    labels = spark.createDataFrame([(i, y) for i, _, y in rows], "doc_id long, y01 int")
    feats = hashed_token_features(docs, buckets=16, salt="t")
    w = logreg_train_hardsigmoid(feats, labels, iters=4, lr_inv=16)
    scores = classifier_margins(feats, w).join(labels, "doc_id")
    rowsc = scores.collect()
    # separation: every positive scores above every negative
    pos = [r.score for r in rowsc if r.y01 == 1]
    neg = [r.score for r in rowsc if r.y01 == 0]
    assert min(pos) > max(neg)
    # calibration pressure: once hard-sigmoid saturates (|z| >= 2) the
    # residual is exactly 0/1-side-capped, so weights stop growing — unlike
    # a perceptron trained past separation, gradients vanish. Verify the
    # saturated margins sit beyond the 2.0 knee in real units.
    assert min(pos) / (4 * LOGREG_SCALE) > -2.0


def test_logreg_gradient_magnitude_step(spark):
    # one round, one feature, from w=0: z=0 -> s=1/2; residual = 1/2 - y01.
    # doc (n=1, y=1): e_num = -2e6; grad = -2e6; dw = -floor(-2e6/64) = 31250.
    from apollo_spark.ops.ml import logreg_train_hardsigmoid

    spark_df = spark.createDataFrame([(1, 0, 1)], "doc_id long, b int, n long")
    labels = spark.createDataFrame([(1, 1)], "doc_id long, y01 int")
    w = logreg_train_hardsigmoid(spark_df, labels, iters=1, lr_inv=16)
    assert [(r.b, r.weight) for r in w.collect()] == [(0, 31250)]


def test_ngram_prefix_filter_equals_full_index(spark):
    """PPJoin prefix-filtered candidates are lossless: identical pair set +
    scores as the full-inverted-index lossless config, at a low and a high
    (dedup-grade) threshold."""
    from apollo_spark.ops.dedup import ngram_jaccard_pairs, ngram_jaccard_pairs_prefix

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for t in (0.2, 0.5):
        full = {
            (r.id_a, r.id_b): round(r.jaccard, 9)
            for r in ngram_jaccard_pairs(d, n=2, threshold=t, max_df=None).collect()
        }
        pref = {
            (r.id_a, r.id_b): round(r.jaccard, 9)
            for r in ngram_jaccard_pairs_prefix(d, n=2, threshold=t).collect()
        }
        assert pref == full, f"t={t}: {len(pref)} vs {len(full)} pairs"
    assert full  # non-vacuous: the corpus does contain qualifying pairs


def test_incremental_minhash_dedup_across_batches(spark, tmp_path):
    """Continuous-ingest dedup: a later increment's near-dup of an earlier
    batch's doc is found WITHOUT rescanning batch 1's text; same-batch dups
    are found too; the index grows append-only."""
    from apollo_spark.ops.dedup import incremental_minhash_dedup
    from apollo_spark.table_format import TxTable

    idx = str(tmp_path / "mh_index")
    long_a = " ".join(f"tok{i}" for i in range(60))
    long_b = " ".join(f"other{i}" for i in range(60))
    b1 = spark.createDataFrame(
        [(1, long_a), (2, long_b)], "doc_id long, text string"
    )
    m1 = incremental_minhash_dedup(idx, b1, threshold=0.6)
    assert m1.count() == 0  # no dups inside batch 1

    near_a = " ".join(f"tok{i}" for i in range(58)) + " changed1 changed2"
    b2 = spark.createDataFrame(
        [(10, near_a), (11, near_a + " x"), (12, "totally unrelated words here")],
        "doc_id long, text string",
    )
    corpus = b1.unionByName(b2)
    m2 = incremental_minhash_dedup(idx, b2, threshold=0.6, corpus=corpus)
    got = {(r.new_id, r.match_id) for r in m2.collect()}
    assert (10, 1) in got      # cross-batch near-dup, batch-1 text never rehashed
    assert (10, 11) in got     # same-batch near-dup (id-ordered)
    assert all(nid != 12 and mid != 12 for nid, mid in got)
    # exact re-score present and sane
    assert all(0.6 <= r.jaccard <= 1.0 for r in m2.collect())
    # index state: bands table holds both batches' docs
    bands = TxTable(f"{idx}/bands").read(spark)
    assert {r.id for r in bands.select("id").distinct().collect()} == {1, 2, 10, 11, 12}


def test_minhash_portable_matches_planted_dups(spark):
    from apollo_spark.ops.dedup import minhash_portable_pairs

    base = "the quick brown fox jumps over the lazy dog and runs far away into the green forest tonight"
    variant = base.replace("green", "dark")
    other = "completely different text about spark execution plans and shuffle partitioning strategies overall"
    rows = [(1, base), (2, variant), (3, other), (4, base + " extra")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.id_a, r.id_b): r.jaccard for r in minhash_portable_pairs(df, threshold=0.5).collect()}
    assert (1, 2) in pairs and (1, 4) in pairs
    assert not any(3 in p for p in pairs)
    # verify stage reports EXACT jaccard (not the minhash estimate)
    from apollo_spark.ops.dedup import shingles

    sh = {r.doc_id: set(r.sh) for r in df.select("doc_id", shingles(F.col("text"), 3).alias("sh")).collect()}
    for (a, b), j in pairs.items():
        exact = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
        assert abs(j - exact) < 1e-12


def test_simhash_portable_pigeonhole_lossless(spark):
    """The 4x15-bit block join must return EXACTLY the naive all-pairs
    hamming<=3 answer (pigeonhole: 3 flipped bits can't hit 4 blocks)."""
    from apollo_spark.ops.dedup import simhash60_portable, simhash_portable_pairs

    texts = [(i, " ".join(f"tok{j}" for j in range(i, i + 30))) for i in range(40)]
    texts += [(100, texts[0][1]), (101, texts[0][1].replace("tok3", "tok3x"))]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    sims = {r.doc_id: r.sim for r in df.select("doc_id", simhash60_portable(F.col("text")).alias("sim")).collect()}
    naive = {
        (a, b, bin(sims[a] ^ sims[b]).count("1"))
        for a in sims
        for b in sims
        if a < b and bin(sims[a] ^ sims[b]).count("1") <= 3
    }
    got = {(r.id_a, r.id_b, r.hamming) for r in simhash_portable_pairs(df).collect()}
    assert got == naive
    assert (0, 100, 0) in got  # exact dup pair survives


def test_winnowing_matches_naive_and_guarantees_shared_runs(spark):
    from apollo_spark.ops.text import winnowing_fingerprints

    k, w = 3, 4
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, "intro words here " + shared + " tail one"),
        (2, shared + " completely other ending tokens follow now"),
        (3, "unrelated document about query planning and shuffles"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_id, r.pos, r.fp) for r in winnowing_fingerprints(df, k=k, w=w).collect()}

    # naive reference: hash every positional k-gram, leftmost-min per window
    import hashlib

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    expect = set()
    for doc_id, text in rows:
        ws = text.lower().split()
        grams = [" ".join(ws[i : i + k]) for i in range(max(len(ws) - k + 1, 1))]
        hs = [h60(g) for g in grams]
        for q in range(max(len(hs) - w + 1, 1)):
            win = hs[q : q + w]
            m = min(win)
            expect.add((doc_id, q + win.index(m), m))
    assert got == expect

    # guarantee: docs 1 and 2 share a >= w+k-1 word run -> share a fingerprint VALUE
    fps = lambda d: {fp for (doc, _, fp) in got if doc == d}
    assert fps(1) & fps(2)
    assert not (fps(3) & (fps(1) | fps(2)))


def test_split_assignment_deterministic_and_partitioned(spark, docs):
    from apollo_spark.ops.corpus import split_assignment

    out = split_assignment(docs, fractions=(90, 5))
    got = {r.doc_id: r.split for r in out.select("doc_id", "split").collect()}
    # pure function of the id: identical on recompute and under repartition
    again = {
        r.doc_id: r.split
        for r in split_assignment(docs.repartition(7), fractions=(90, 5)).select("doc_id", "split").collect()
    }
    assert got == again
    assert set(got.values()) == {"train", "val", "test"}
    n = len(got)
    frac_train = sum(1 for v in got.values() if v == "train") / n
    assert 0.8 < frac_train < 0.97  # ~90% up to hash noise on a small corpus


def test_random_walks_deterministic_and_valid(spark):
    from apollo_spark.ops.graph import random_walks

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 1), (3, 4)], "src int, dst int"
    )
    out = random_walks(edges, walks_per_node=2, walk_len=3)
    rows = {(r.start, r.rep, r.step): r.node for r in out.collect()}
    # every start node with out-edges launches walks_per_node walks at step 0
    assert {(s, r) for (s, r, t) in rows if t == 0} == {(s, r) for s in (1, 2, 3) for r in (0, 1)}
    assert all(rows[(s, r, 0)] == s for (s, r, t) in rows if t == 0)
    # every step follows a real edge
    eset = {(1, 2), (1, 3), (2, 3), (3, 1), (3, 4)}
    for (s, r, t), node in rows.items():
        if t > 0:
            assert (rows[(s, r, t - 1)], node) in eset
    # node 4 is a sink: walks reaching it stop early (no step from 4)
    # determinism: identical on recompute
    rows2 = {(r.start, r.rep, r.step): r.node for r in random_walks(edges, walks_per_node=2, walk_len=3).collect()}
    assert rows == rows2


def test_tfidf_cosine_pairs_planted_and_cap_monotone(spark):
    """Planted rare-vocabulary near-dups are found at t=0.9; the max_df cap
    prunes candidate GENERATION only — every recalled pair re-scores to the
    exact lossless cosine (bit-identical), and the capped pair set is a
    subset of the lossless one. The hot phrase is deliberately NOT in every
    doc (idf > 0), so the exact re-score genuinely exercises the full-vector
    map path rather than zero-weight terms."""
    from apollo_spark.ops.dedup import tfidf_cosine_pairs

    hot = "common shared boilerplate words everywhere always"
    rows = [(i, f"{hot} unique tail {i} {i * 13}") for i in range(20)]
    rows += [
        (100, f"{hot} zephyr quasar nebula pulsar quark meson lepton boson"),
        (101, f"{hot} zephyr quasar nebula pulsar quark meson lepton hadron"),
        # no hot phrase: keeps every hot bigram's df < n_docs so idf > 0
        (200, "solo document entirely distinct vocabulary island"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lossless = tfidf_cosine_pairs(df, threshold=0.5, max_df=None).toPandas()
    capped = tfidf_cosine_pairs(df, threshold=0.5, max_df=10).toPandas()
    frac = tfidf_cosine_pairs(df, threshold=0.5, max_df=None, max_df_frac=0.45).toPandas()
    assert (100, 101) in set(zip(lossless["id_a"], lossless["id_b"]))
    assert (100, 101) in set(zip(capped["id_a"], capped["id_b"]))
    assert (100, 101) in set(zip(frac["id_a"], frac["id_b"]))
    for sub in (capped, frac):
        merged = sub.merge(lossless, on=["id_a", "id_b"], suffixes=("_c", "_l"))
        assert len(merged) == len(sub)  # capped ⊆ lossless at equal threshold
        # exact re-score: identical scores on every recalled pair
        assert (merged["cosine_c"] - merged["cosine_l"]).abs().max() < 1e-12


def test_tfidf_cosine_pairs_max_df_frac_exclusive(spark):
    """Explicit max_df combined with max_df_frac raises (the sentinel
    default does not count as explicit)."""
    import pytest as _pytest

    from apollo_spark.ops.dedup import tfidf_cosine_pairs

    df = spark.createDataFrame([(1, "a b c"), (2, "a b d")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="not both"):
        tfidf_cosine_pairs(df, max_df=50, max_df_frac=0.5).count()
    # sentinel default + frac is fine
    assert tfidf_cosine_pairs(df, max_df_frac=0.9, threshold=0.1).count() >= 0


def test_scoped_persist_release(spark):
    """Ops that persist intermediates attach them to the returned frame;
    release_caches drops them so a long-lived session's executor storage
    doesn't accumulate across repeated invocations (bench/test gate call
    this after every query)."""
    from apollo_spark.ops.cache import release_caches
    from apollo_spark.ops.dedup import tfidf_cosine_pairs

    spark.catalog.clearCache()
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"), (3, "unrelated words here")],
        "doc_id long, text string",
    )
    out = tfidf_cosine_pairs(docs, "doc_id", "text", threshold=0.5)
    out.count()
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert not cm.isEmpty(), "op should have persisted an intermediate"
    release_caches(out)
    assert cm.isEmpty(), "release_caches must unpersist every attached intermediate"
    release_caches(out)  # idempotent


# --------------------------------------------------------------------------
# ops.rank: distributed two-phase global rank / ntile
# --------------------------------------------------------------------------


def _rank_fixture(spark):
    import random

    random.seed(41)
    # mixed continuous + heavily-tied keys so bucket-boundary ties are hit
    rows = [
        (i, random.choice([random.uniform(-50.0, 50.0), float(random.randint(-3, 3))]),
         random.randint(0, 9))
        for i in range(1500)
    ]
    return spark.createDataFrame(rows, "id long, key double, w long")


def test_bucketed_rank_matches_global_window(spark):
    """bucketed_rank (range-bucket + per-bucket window + broadcast offsets)
    must be bit-identical to the single-task global window it replaces,
    including the shared-pass running sum."""
    from pyspark.sql import Window

    from apollo_spark.ops.rank import bucketed_rank

    df = _rank_fixture(spark)
    got = bucketed_rank(
        df, F.col("key"), tiebreak=[F.col("id").asc()], out_col="r",
        cumsum={"cw": F.col("w")},
    )
    w = Window.orderBy(F.col("key").asc(), F.col("id").asc())
    exp = df.withColumn("r", F.row_number().over(w)).withColumn(
        "cw", F.sum("w").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    a = {x.id: (x.r, x.cw) for x in got.collect()}
    b = {x.id: (x.r, x.cw) for x in exp.collect()}
    assert a == b


def test_bucketed_ntile_matches_window_ntile(spark):
    """bucketed_ntile's closed-form tile arithmetic must reproduce SQL
    NTILE(n) exactly for uneven splits, descending order, and n > N."""
    from pyspark.sql import Window

    from apollo_spark.ops.rank import bucketed_ntile

    df = _rank_fixture(spark)
    for n in (3, 4, 10, 7, 2000):
        got = bucketed_ntile(
            df, F.col("key"), n, descending=True,
            tiebreak=[F.col("id").asc()], out_col="t",
        )
        wd = Window.orderBy(F.col("key").desc(), F.col("id").asc())
        exp = df.withColumn("t", F.ntile(n).over(wd))
        assert {x.id: x.t for x in got.collect()} == {x.id: x.t for x in exp.collect()}, n


def test_bucketed_rank_constant_key_and_decimal_exact_order(spark):
    """Degenerate single-bucket input (hi == lo) still ranks; and within-
    bucket ordering uses the EXACT key type — decimals that collapse to the
    same double must still order by their true value, not the tiebreak."""
    from apollo_spark.ops.rank import bucketed_rank

    cdf = spark.createDataFrame([(i, 5.0) for i in range(10)], "id long, key double")
    got = bucketed_rank(cdf, F.col("key"), tiebreak=[F.col("id").asc()], out_col="r")
    assert sorted((x.id, x.r) for x in got.collect()) == [(i, i + 1) for i in range(10)]

    # 1 and 1 + 1e-20 are the same double but different DECIMAL(38,24);
    # id tiebreak alone would rank id=2 first — exact-key ordering must not
    rows = [(1, "1.000000000000000000000001"), (2, "1.000000000000000000000000")]
    ddf = spark.createDataFrame(rows, "id long, s string").select(
        "id", F.col("s").cast("decimal(38,24)").alias("key")
    )
    got = {x.id: x.r for x in bucketed_rank(
        ddf, F.col("key"), tiebreak=[F.col("id").asc()], out_col="r"
    ).collect()}
    assert got == {2: 1, 1: 2}


def test_bucketed_ntile_multi_matches_three_windows(spark):
    """The single-shuffle multi-metric ntile must reproduce three separate
    NTILE windows (mixed asc/desc) exactly, and restore the metric values
    through the explode/pivot round-trip."""
    from pyspark.sql import Window

    from apollo_spark.ops.rank import bucketed_ntile_multi

    df = _rank_fixture(spark).withColumn("w2", F.col("w") * 3 + 1)
    got = bucketed_ntile_multi(
        df,
        {"a": (F.col("key"), False), "b": (F.col("w"), True), "c": (F.col("w2"), True)},
        4,
        id_col="id",
    )
    wa = Window.orderBy(F.col("key").asc(), F.col("id").asc())
    wb = Window.orderBy(F.col("w").desc(), F.col("id").asc())
    wc = Window.orderBy(F.col("w2").desc(), F.col("id").asc())
    exp = (
        df.withColumn("a_q", F.ntile(4).over(wa))
        .withColumn("b_q", F.ntile(4).over(wb))
        .withColumn("c_q", F.ntile(4).over(wc))
    )
    a = {x.id: (x.a_q, x.b_q, x.c_q, x.a_val, float(x.b_val), float(x.c_val)) for x in got.collect()}
    b = {x.id: (x.a_q, x.b_q, x.c_q, x.key, float(x.w), float(x.w2)) for x in exp.collect()}
    assert a == b


def test_connected_components_distributed_matches_union_find(spark):
    """driver_threshold=0 forces the distributed star-contraction branch; it
    must produce the same (id, comp) labeling as the driver union-find on
    adversarial shapes — including an 80-node PATH, whose diameter would
    defeat O(diameter) min-label propagation within any sane round cap."""
    import random

    from apollo_spark.ops.dedup import connected_components

    random.seed(11)
    edges = []
    # 80-node path (deep diameter)
    edges += [(1000 + i, 1000 + i + 1) for i in range(79)]
    # star
    edges += [(2000, 2000 + i) for i in range(1, 30)]
    # two cliques bridged by one edge
    for grp in (3000, 3100):
        ids = [grp + i for i in range(8)]
        edges += [(a, b) for a in ids for b in ids if a < b]
    edges.append((3005, 3105))
    # random sprinkle
    edges += [(random.randint(4000, 4200), random.randint(4000, 4200)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "id_a long, id_b long")

    dist = connected_components(df, max_iter=40, driver_threshold=0)
    drv = connected_components(df, driver_threshold=10**9)
    a = {r.id: r.comp for r in dist.collect()}
    b = {r.id: r.comp for r in drv.collect()}
    assert a == b
    # the path collapses to one component labeled by its min id
    assert all(a[1000 + i] == 1000 for i in range(80))


def test_png_codec_roundtrip_and_color_types(spark):
    """Pure-stdlib PNG decode: round-trip through every scanline filter, the
    non-RGB color types (hand-built chunks), CRC rejection, and the honest
    NotImplementedError seams (16-bit, Adam7)."""
    import zlib

    from apollo_spark.ops.multimodal import _PNG_SIG, decode_png, encode_png

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
    for f in range(5):
        assert (decode_png(encode_png(img, filters=[f] * 7)) == img).all(), f
    assert (decode_png(encode_png(img, filters=[4, 3, 2, 1, 0, 4, 2])) == img).all()

    def chunk(ctype, data):
        return (
            len(data).to_bytes(4, "big") + ctype + data
            + (zlib.crc32(ctype + data) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    def build(w, h, depth, color, raster, plte=None, interlace=0):
        ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes(
            [depth, color, 0, 0, interlace]
        )
        body = chunk(b"IHDR", ihdr)
        if plte is not None:
            body += chunk(b"PLTE", plte)
        return _PNG_SIG + body + chunk(b"IDAT", zlib.compress(raster)) + chunk(b"IEND", b"")

    # grayscale (type 0): value replicates across channels
    gray = bytes([0, 10, 20, 0, 30, 40])  # 2x2, filter 0 rows
    out = decode_png(build(2, 2, 8, 0, gray))
    assert out.shape == (2, 2, 3) and out[0, 0].tolist() == [10, 10, 10]
    # palette (type 3)
    pal = bytes([255, 0, 0, 0, 255, 0])  # idx0=red idx1=green
    out = decode_png(build(2, 1, 8, 3, bytes([0, 0, 1]), plte=pal))
    assert out[0, 0].tolist() == [255, 0, 0] and out[0, 1].tolist() == [0, 255, 0]
    # RGBA (type 6): alpha dropped
    rgba = bytes([0, 1, 2, 3, 99, 4, 5, 6, 77])
    out = decode_png(build(2, 1, 8, 6, rgba))
    assert out[0, 0].tolist() == [1, 2, 3] and out[0, 1].tolist() == [4, 5, 6]
    # gray+alpha (type 4)
    ga = bytes([0, 50, 200, 60, 10])
    out = decode_png(build(2, 1, 8, 4, ga))
    assert out[0, 0].tolist() == [50, 50, 50] and out[0, 1].tolist() == [60, 60, 60]

    # corrupted CRC must be rejected, not silently decoded
    good = encode_png(img)
    bad = bytearray(good)
    bad[-5] ^= 0xFF  # flip a bit inside IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    # honest seams
    with pytest.raises(NotImplementedError, match="depth"):
        decode_png(build(1, 1, 16, 0, bytes([0, 0, 0])))
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_png(build(1, 1, 8, 0, bytes([0, 0]), interlace=1))


def test_top_k_per_key_matches_plain_window_under_skew(spark):
    """Two-phase salted top-k is row-identical to the single-window form
    for any salt — verified on a deliberately skewed input (one key owns
    90% of rows) and with salt values that do and don't divide the data."""
    import pandas as pd

    from apollo_spark.ops.rank import top_k_per_key

    rows = [("hot", i, (i * 37) % 1000) for i in range(900)]
    rows += [("cold", 10_000 + i, i) for i in range(20)]
    rows += [("tiny", 20_000, 5)]
    df = spark.createDataFrame(rows, "k string, id long, v long")
    pdf = pd.DataFrame(rows, columns=["k", "id", "v"])
    expect = (
        pdf.sort_values(["k", "v", "id"], ascending=[True, False, True])
        .groupby("k")
        .head(7)
        .reset_index(drop=True)
    )
    expect["rank"] = expect.groupby("k").cumcount() + 1
    for salt in (1, 4, 32):
        got = (
            top_k_per_key(
                df, ["k"], [F.col("v").desc(), F.col("id").asc()], k=7,
                salt_col=F.crc32(F.col("id").cast("string")), salt=salt,
            )
            .toPandas()
            .sort_values(["k", "rank"])
            .reset_index(drop=True)
        )
        assert got[["k", "id", "v", "rank"]].values.tolist() == expect[
            ["k", "id", "v", "rank"]
        ].values.tolist(), f"salt={salt}"
    # keys with fewer than k rows keep everything
    assert (got[got.k == "tiny"]["rank"] == [1]).all()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        top_k_per_key(df, ["k"], [F.col("v")], k=0, salt_col=F.col("id"))


def test_approx_ntile_bounds_disagreement_vs_exact(spark):
    """The lake-form approx_ntile (percentile_approx cutoffs, zero ordered
    shuffles) must stay close to the exact bucketed_ntile on real data:
    tiles never differ by more than one, and under 2% of rows disagree at
    accuracy=10000 on the sf0.1 customer table (~15k rows)."""
    from apollo_spark.ops.cache import release_caches
    from apollo_spark.ops.rank import approx_ntile, bucketed_ntile

    cust = spark.read.parquet("/root/testdata/sf0.1/customer.parquet").select(
        "c_custkey", "c_acctbal"
    )
    exact = bucketed_ntile(
        cust, F.col("c_acctbal"), 10,
        tiebreak=[F.col("c_custkey").asc()], out_col="t_exact",
    )
    approx = approx_ntile(cust, F.col("c_acctbal"), 10, out_col="t_approx")
    joined = exact.join(approx.select("c_custkey", "t_approx"), "c_custkey")
    stats = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("t_exact") != F.col("t_approx")).cast("int")).alias("diff"),
        F.max(F.abs(F.col("t_exact") - F.col("t_approx"))).alias("maxgap"),
    ).first()
    release_caches(exact)
    assert stats.n > 10000
    assert stats.maxgap <= 1, "approx tile off by more than one"
    assert stats.diff / stats.n < 0.02, f"{stats.diff}/{stats.n} rows disagree"


def test_fuzzy_dup_pairs_exact_for_distance_one(spark):
    """The deletion-neighborhood candidate set must be COMPLETE for
    Levenshtein <= 1 (substitution, insertion, deletion, and exact-text
    twins under different ids) and the exact re-score must kill the false
    candidates blocking lets through ('ab'/'ba' share variants at distance
    2). Verified against a brute-force O(N^2) Levenshtein matrix —
    collapse_exact=False is the certified LOSSLESS all-pairs form (the
    default collapses exact-text groups to star pairs, tested below)."""
    import itertools

    from apollo_spark.ops.linkage import fuzzy_dup_pairs

    rows = [
        (1, "kitten"), (2, "sitten"),   # substitution -> dist 1
        (3, "kitte"),                   # deletion of 1 -> dist 1
        (4, "kittens"),                 # insertion -> dist 1
        (5, "ab"), (6, "ba"),           # shared variants, dist 2 -> excluded
        (7, "zzz"), (8, "kitten"),      # exact twin of 1 -> dist 0
        (9, ""), (10, "x"),             # empty-string guard: dist 1
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_dup_pairs(df, "id", "s", collapse_exact=False).collect()
    }

    def lev(a, b):
        d = [[i + j if 0 in (i, j) else 0 for j in range(len(b) + 1)] for i in range(len(a) + 1)]
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                d[i][j] = min(d[i-1][j] + 1, d[i][j-1] + 1, d[i-1][j-1] + (a[i-1] != b[j-1]))
        return d[len(a)][len(b)]

    want = {
        (ia, ib, lev(sa, sb))
        for (ia, sa), (ib, sb) in itertools.combinations(rows, 2)
        if lev(sa, sb) <= 1
    }
    assert got == want
    assert (1, 8, 0) in got and (5, 6, 2) not in got and (9, 10, 1) in got


def test_fuzzy_left_match_picks_best_deterministically(spark):
    """Left rows match their minimum-(dist, right_id) dictionary entry;
    rows with no entry within distance 1 are absent."""
    from apollo_spark.ops.linkage import fuzzy_left_match

    left = spark.createDataFrame(
        [(1, "color"), (2, "colou"), (3, "qqqqq")], "id long, s string"
    )
    right = spark.createDataFrame(
        [(10, "color"), (11, "colour"), (12, "colors")], "id long, s string"
    )
    got = {
        r.id_left: (r.id_right, r.dist)
        for r in fuzzy_left_match(left, right).collect()
    }
    # 1: exact 'color' (dist 0) beats 'colour'/'colors' (dist 1)
    # 2: 'color' and 'colour' both dist 1 -> smaller right id (10) wins
    assert got == {1: (10, 0), 2: (10, 1)}


def test_canonical_url_collapses_and_separates(spark):
    """Canonicalization merges scheme/host case, default ports, tracking
    params, param order, fragments, and trailing slashes — and must NOT
    merge different param payloads, non-default ports, or different
    paths. Junk rows canonicalize to ''."""
    from apollo_spark.ops.web import canonical_url

    urls = [
        "http://www.ex.com/a",
        "HTTP://WWW.EX.COM/a/",
        "http://www.ex.com:80/a?utm_source=x&fbclid=y",
        "http://www.ex.com/a?b=2&a=1#frag",
        "http://www.ex.com/a?a=1&b=2",
        "http://www.ex.com:8080/a",   # non-default port: distinct
        "https://www.ex.com/a",       # different scheme: distinct
        "http://www.ex.com/a?a=2",    # different payload: distinct
        "http://user:pw@www.ex.com/a",  # userinfo stripped, not parsed as host
        "not a url",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = [r.c for r in df.select(canonical_url("url").alias("c")).collect()]
    assert out[0] == out[1] == out[2] == "http://www.ex.com/a"
    assert out[3] == out[4] == "http://www.ex.com/a?a=1&b=2"
    assert out[5] == "http://www.ex.com:8080/a"
    assert out[6] == "https://www.ex.com/a"
    assert out[7] == "http://www.ex.com/a?a=2"
    assert out[8] == "http://www.ex.com/a"  # credentials never reach the key
    assert out[9] == ""
    assert len({out[0], out[3], out[5], out[6], out[7]}) == 5


def test_domain_suffix_filter_semantics(spark):
    """Suffix blocking: example.com drops its subdomains but not
    example.com.evil.net (suffix must align on label boundaries) nor
    notexample.com (no substring matching)."""
    from apollo_spark.ops.web import domain_suffix_filter

    df = spark.createDataFrame(
        [
            (1, "www.example.com"),
            (2, "a.b.example.com"),
            (3, "example.com"),
            (4, "notexample.com"),
            (5, "example.com.evil.net"),
            (6, "safe.org"),
        ],
        "id long, host string",
    )
    blocked = spark.createDataFrame([("example.com",)], "domain string")
    kept = sorted(r.id for r in domain_suffix_filter(df, blocked).collect())
    assert kept == [4, 5, 6]


def test_fix_mojibake_repairs_and_scores(spark):
    """The cp1252 repair chain restores the true characters (so a
    mojibake'd re-crawl hashes like its clean twin), leaves clean text
    bit-identical, resolves double-encoding deterministically, and the
    score counts the excess chars removed."""
    from apollo_spark.ops.text import (
        _sloppy_cp1252,
        fix_mojibake,
        mojibake_chars_repaired,
    )

    cafe_bad = "caf" + _sloppy_cp1252("é".encode())          # cafÃ©
    quote_bad = "it" + _sloppy_cp1252("’".encode()) + "s"    # itâ€™s
    double_bad = "caf" + _sloppy_cp1252(_sloppy_cp1252("é".encode()).encode())
    df = spark.createDataFrame(
        [(1, cafe_bad), (2, quote_bad), (3, "plain ascii"), (4, double_bad)],
        "id long, t string",
    )
    out = {
        r.id: (r.f, r.n)
        for r in df.select(
            "id",
            fix_mojibake("t").alias("f"),
            mojibake_chars_repaired("t").alias("n"),
        ).collect()
    }
    assert out[1] == ("café", 1)
    assert out[2] == ("it’s", 2)
    assert out[3] == ("plain ascii", 0)
    # double-encoding unwinds fully inside ONE pass because the chain order
    # repairs 'Â©' and 'Ãƒ' before the 'Ã©' rule runs (table comment)
    assert out[4] == ("café", 3)


def test_phrase_blocklist_word_boundaries_and_filter(spark):
    """Phrases match as word sequences only: blocking 'ass' must not flag
    'class'; multi-word phrases count every (overlapping) occurrence; the
    filter face keeps exactly the unflagged documents."""
    from apollo_spark.ops.corpus import phrase_blocklist_filter, phrase_blocklist_hits

    docs = spark.createDataFrame(
        [
            (1, "the class is great"),          # 'ass' must NOT hit
            (2, "what an ass he is"),           # 1-gram hit
            (3, "bad phrase here bad phrase"),  # 2-gram hits twice
            (4, "clean text entirely"),
            (5, "bad phrase phrase bad"),       # 1 overlap-free hit
        ],
        "doc_id long, text string",
    )
    phrases = spark.createDataFrame([("ass",), ("bad phrase",)], "phrase string")
    hits = {
        (r.id, r.phrase): r.n_hits
        for r in phrase_blocklist_hits(docs, phrases).collect()
    }
    assert hits == {(2, "ass"): 1, (3, "bad phrase"): 2, (5, "bad phrase"): 1}
    kept = sorted(r.doc_id for r in phrase_blocklist_filter(docs, phrases).collect())
    assert kept == [1, 4]


# ------------------------------------------------- privacy / coreset / mining


def test_k_anonymize_suppresses_small_classes(spark):
    from apollo_spark.ops.privacy import k_anonymize

    rows = [("a", 1, 10.0)] * 5 + [("a", 2, 20.0)] * 2 + [("b", 1, 30.0)] * 1
    df = spark.createDataFrame(rows, "seg string, b int, v double")
    out = k_anonymize(df, ["seg", "b"], k=3, value_col="v").collect()
    got = {(r.seg, r.b): (r.n_classes, r.n_rows, r.avg_value) for r in out}
    # one kept class, the two small ones folded into the catch-all
    assert got[("a", "1")] == (1, 5, 10.0)
    assert got[("*", "*")] == (2, 3, (2 * 20.0 + 30.0) / 3)
    assert len(got) == 2


def test_k_anonymize_no_suppressed_row_when_all_classes_big(spark):
    from apollo_spark.ops.privacy import k_anonymize

    df = spark.createDataFrame([("a", 1.0)] * 4, "seg string, v double")
    out = k_anonymize(df, ["seg"], k=2, value_col="v").collect()
    assert len(out) == 1 and out[0].seg == "a"
    # every released class satisfies k; no '*' row materializes
    assert all(r.n_rows >= 2 for r in out)


def test_k_anonymize_rejects_bad_k(spark):
    from apollo_spark.ops.privacy import k_anonymize

    df = spark.createDataFrame([("a", 1.0)], "seg string, v double")
    with pytest.raises(ValueError):
        k_anonymize(df, ["seg"], k=0, value_col="v")


def test_kcenter_select_matches_numpy_greedy(spark, emb):
    from apollo_spark.ops.clustering import kcenter_select

    got = kcenter_select(emb, k=6)
    pdf = emb.toPandas().sort_values("vec_id")
    ids = pdf.vec_id.to_numpy()
    V = np.stack(pdf.embedding.to_numpy()).astype(np.float64)
    sel = [0]
    radii = [0.0]
    for _ in range(5):
        mind = np.full(len(ids), np.inf)
        for s in sel:
            d = ((V - V[s]) ** 2).sum(axis=1)
            mind = np.minimum(mind, d)
        mind[sel] = -np.inf
        nxt = int(np.argmax(mind))  # argmax takes first (smallest id) on ties
        sel.append(nxt)
        radii.append(float(mind[nxt]))
    assert [(o, v) for o, v, _ in got] == [(i, int(ids[s])) for i, s in enumerate(sel)]
    for (_, _, r_got), r_np in zip(got, radii):
        assert abs(r_got - r_np) < 1e-6 * max(1.0, abs(r_np))


def test_kcenter_radius_monotone_nonincreasing(spark, emb):
    from apollo_spark.ops.clustering import kcenter_select

    got = kcenter_select(emb, k=8)
    radii = [r for _, _, r in got][1:]  # skip the seed's 0.0
    assert all(a >= b for a, b in zip(radii, radii[1:]))


def test_margin_mined_pairs_mutual_best_and_margin(spark, emb):
    """Every mined pair must be a mutual best match within its blocked
    candidate set, and its margin must replay from the raw scores."""
    from apollo_spark.ops.similarity import cosine, margin_mined_pairs

    out = margin_mined_pairs(emb, k=8, k_neighbors=4, threshold=1.0).collect()
    assert out, "no pairs mined at threshold 1.0 — the fixture should yield some"
    # recompute the candidate scores brute-force per cluster, numpy-side
    from apollo_spark.ops.clustering import kmeans_lattice, lattice_final_assign

    _, cent = kmeans_lattice(emb, k=8, iters=2)
    assign, _ = lattice_final_assign(emb, cent)
    assign = assign.toPandas()
    pdf = emb.toPandas()
    V = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64) for _, r in pdf.iterrows()}
    cl = dict(zip(assign.vec_id.astype(int), assign.cluster.astype(int)))

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    for row in out:
        x, y = int(row.x_id), int(row.y_id)
        assert x % 2 == 0 and y % 2 == 1 and cl[x] == cl[y]
        mates_y = [v for v in cl if v % 2 == 1 and cl[v] == cl[x]]
        mates_x = [v for v in cl if v % 2 == 0 and cl[v] == cl[y]]
        sxy = cos(V[x], V[y])
        # mutual best (ties broken toward smaller id can only help x,y)
        assert all(sxy >= cos(V[x], V[v]) - 1e-9 for v in mates_y)
        assert all(sxy >= cos(V[u], V[y]) - 1e-9 for u in mates_x)
        assert row.margin >= 1.0 - 1e-9


def test_minhash_band_max_bucket_drops_mega_buckets(spark):
    """The production mega-bucket guard (sf10 finding: one structural
    boilerplate shingle's bucket grows with the corpus -> quadratic
    candidates): docs whose ONLY collision is a shared boilerplate shingle
    must vanish from the capped candidate set, while a genuine duplicate
    pair that also collides on its own content survives."""
    from apollo_spark.ops.dedup import _minhash_band_candidates, shingles

    # 60 docs sharing one boilerplate phrase + unique tails -> the phrase's
    # shingles bucket all of them; 2 true duplicates with distinct content
    boiler = "click here to subscribe now and never miss another weekly update from our team"
    rows = [(i, f"{boiler} u{i} v{i}") for i in range(60)]
    rows += [(100, "alpha beta gamma delta epsilon zeta"), (101, "alpha beta gamma delta epsilon zeta")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    base = d.select(F.col("doc_id").alias("id"), shingles(F.col("text"), 3).alias("sh")).filter(
        F.size("sh") > 0
    )
    raw, sig1 = _minhash_band_candidates(base, 32, 16)
    capped, sig2 = _minhash_band_candidates(base, 32, 16, max_bucket=10, max_bucket_mode="drop")
    n_raw, n_capped = raw.count(), capped.count()
    assert n_raw >= (60 * 59 // 2) * 0.5  # boilerplate mega-buckets dominate
    assert n_capped < n_raw / 10
    # the true duplicate pair still surfaces (collides in its own bucket of 2)
    assert capped.filter((F.col("id_a") == 100) & (F.col("id_b") == 101)).count() == 1
    sig1.unpersist(), sig2.unpersist()


def test_minhash_band_reband_ladder_preserves_components(spark):
    """The round-8 recursive banding ladder (max_bucket_mode="reband")
    CONNECTIVITY INVARIANT: the ladder's candidate graph has exactly the
    same connected-component partition as the raw uncapped banding —
    every raw pair shares a bucket, and that bucket is either under some
    level's cap (full pairing) or starred through its hub; conversely
    every ladder edge (descent pairs agree on a superset slot run; star
    pairs share the hot bucket) is a raw pair, so the ladder is a
    component-preserving SUBGRAPH. Dedup consumers (components, keep-best,
    dup-mass) therefore see identical groups at linear candidate cost."""
    from apollo_spark.ops.dedup import _minhash_band_candidates, shingles

    boiler = "click here to subscribe now and never miss another weekly update from our team"
    rows = [(i, f"{boiler} u{i} v{i}") for i in range(60)]
    rows += [(100, "alpha beta gamma delta epsilon zeta"), (101, "alpha beta gamma delta epsilon zeta")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    base = d.select(F.col("doc_id").alias("id"), shingles(F.col("text"), 3).alias("sh")).filter(
        F.size("sh") > 0
    )
    raw, sig1 = _minhash_band_candidates(base, 32, 16)
    ladder, sig2 = _minhash_band_candidates(base, 32, 16, max_bucket=10, max_bucket_mode="reband")
    raw_pairs = {(r.id_a, r.id_b) for r in raw.collect()}
    ladder_pairs = {(r.id_a, r.id_b) for r in ladder.collect()}
    assert (100, 101) in ladder_pairs  # the true dup survives
    assert ladder_pairs <= raw_pairs  # subgraph: ladder invents no pairs

    def components(pairs):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            parent[find(a)] = find(b)
        out = {}
        for x in list(parent):
            out.setdefault(find(x), set()).add(x)
        return {frozenset(v) for v in out.values()}

    assert components(ladder_pairs) == components(raw_pairs)
    sig1.unpersist(), sig2.unpersist()


def test_minhash_fast_path_ladder_guard(spark):
    """The xxhash fast path shares the ladder guard: under a planted
    boilerplate mega-bucket the guarded run must still find the true
    duplicate pair, emit a subset of the raw VERIFIED pairs (the ladder
    only removes candidates; verification is identical), and be non-empty
    star-or-descent coverage for the boilerplate clique at a low verify
    threshold (connectivity surfaced as verified pairs)."""
    from apollo_spark.ops.dedup import minhash_lsh_pairs

    boiler = "click here to subscribe now and never miss another weekly update from our team"
    rows = [(i, f"{boiler} u{i} v{i}") for i in range(60)]
    rows += [(100, "alpha beta gamma delta epsilon zeta"), (101, "alpha beta gamma delta epsilon zeta")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    raw = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(d, threshold=0.5).collect()}
    guarded = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(d, threshold=0.5, max_bucket=10).collect()
    }
    assert (100, 101) in guarded
    assert guarded <= raw
    # boilerplate docs share >= 10/13 shingles (jaccard ~ 0.6+): some of the
    # clique's verified pairs must survive the guard (stars + descent)
    assert any(a < 60 and b < 60 for a, b in guarded)
    spark.catalog.clearCache()


def test_blocking_quality_ladder_matches_oracle_under_hot_buckets(spark, tmp_path):
    """The gate corpora have no over-cap buckets, so the driver gate never
    exercises the recursive ladder: pin Spark == DuckDB on a corpus that
    FORCES it (boilerplate line on half the docs, cap 8 -> hot coarse
    buckets, multi-level descent, floor stars). Compares the full
    lsh_blocking_metrics row against _blocking_quality_oracle bit-for-bit."""
    import duckdb

    from apollo_spark.ops.dedup import lsh_blocking_metrics
    from apollo_spark.queries.mining import _blocking_quality_oracle

    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    boiler = " subscribe to our newsletter for weekly data updates"
    d = src.withColumn(
        "text",
        F.when(F.col("doc_id") % 2 == 0, F.concat(F.col("text"), F.lit(boiler))).otherwise(
            F.col("text")
        ),
    )
    p = str(tmp_path / "docs_hot.parquet")
    d.write.mode("overwrite").parquet(p)
    d2 = spark.read.parquet(p)

    row = lsh_blocking_metrics(
        d2, block_n=3, truth_n=2, num_hashes=32, bands=16,
        truth_threshold=0.2, max_df_frac=0.04, max_bucket=8, max_bucket_mode="reband",
    ).collect()[0]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM parquet_scan('{p}/*.parquet')")
    sql = _blocking_quality_oracle(
        block_n=3, truth_n=2, truth_threshold=0.2, max_bucket=8, max_bucket_mode="reband"
    )
    o = con.execute(sql).fetchone()
    assert (row.n_docs, row.n_true, row.n_cand, row.n_caught) == (o[0], o[1], o[2], o[3])
    assert row.pair_completeness == o[4] and row.reduction_ratio == o[5]
    # the planted corpus must actually exercise the guard: candidates differ
    # from the uncapped run
    raw = lsh_blocking_metrics(
        d2, block_n=3, truth_n=2, num_hashes=32, bands=16,
        truth_threshold=0.2, max_df_frac=0.04, max_bucket=None,
    ).collect()[0]
    assert raw.n_cand != row.n_cand

    # merge-completeness twin: same forced-ladder corpus, connectivity metric
    from apollo_spark.ops.dedup import lsh_merge_completeness

    mrow = lsh_merge_completeness(
        d2, block_n=3, truth_n=2, num_hashes=32, bands=16,
        truth_threshold=0.2, max_df_frac=0.04, max_bucket=8, max_bucket_mode="reband",
    ).collect()[0]
    msql = _blocking_quality_oracle(
        block_n=3, truth_n=2, truth_threshold=0.2, max_bucket=8,
        max_bucket_mode="reband", select="merge",
    )
    mo = con.execute(msql).fetchone()
    assert (
        mrow.n_true, mrow.n_caught, mrow.truth_nodes,
        mrow.truth_components, mrow.caught_components,
    ) == (mo[0], mo[1], mo[2], mo[3], mo[4])
    assert mrow.merge_completeness == mo[5]
    assert 0.0 <= mrow.merge_completeness <= 1.0
    spark.catalog.clearCache()


def test_lsh_blocking_metrics_counts_consistent(spark, docs):
    from apollo_spark.ops.dedup import lsh_blocking_metrics

    row = lsh_blocking_metrics(docs, block_n=3, truth_n=2, num_hashes=32, bands=16).collect()[0]
    assert row.n_docs > 0 and row.n_cand >= 0
    assert 0 <= row.n_caught <= min(row.n_true, row.n_cand)
    if row.n_true:
        assert abs(row.pair_completeness - row.n_caught / row.n_true) < 1e-12
    assert 0.0 <= row.reduction_ratio <= 1.0
    spark.catalog.clearCache()


def test_join_skew_profile_counts_and_share(spark):
    from apollo_spark.ops.relational import join_skew_profile

    left = spark.createDataFrame([("a",)] * 3 + [("b",)] * 2 + [("c",)], "k string")
    right = spark.createDataFrame([("a",)] * 4 + [("b",)], "k string")
    out = join_skew_profile(left, right, "k", top_n=10).collect()
    got = {r.key: (r.cnt_a, r.cnt_b, r.est_pairs, r.share) for r in out}
    assert got["a"] == (3, 4, 12, 12 / 14)
    assert got["b"] == (2, 1, 2, 2 / 14)
    assert "c" not in got  # unmatched keys produce no join output
    assert [r.key for r in out] == ["a", "b"]  # est_pairs desc


def test_dup_aware_sample_weights_partition_of_unity(spark):
    """Each component's weights sum to exactly 1 (so the weighted corpus
    counts every CONTENT once), every document appears, and csize is the
    true component population."""
    from apollo_spark.queries import QUERIES

    out = QUERIES["dup_aware_sample_weights"](spark, SF).toPandas()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(out) == n_docs
    assert abs(out.weight.sum() - out.component.nunique()) < 1e-9
    g = out.groupby("component")
    assert (g.size() == g.csize.first()).all()
    spark.catalog.clearCache()


def test_k_anonymize_withholds_sub_k_catchall(spark):
    """The '*' catch-all must itself honor k: with one kept class and one
    singleton outlier, releasing a catch-all of n_rows=1 would hand an
    attacker the outlier's exact value — it is withheld entirely."""
    from apollo_spark.ops.privacy import k_anonymize

    rows = [("a", 10.0)] * 25 + [("b", 99.0)]
    df = spark.createDataFrame(rows, "seg string, v double")
    out = k_anonymize(df, ["seg"], k=25, value_col="v").collect()
    assert {r.seg for r in out} == {"a"}  # no '*' row
    assert out[0].n_rows == 25


def test_k_anonymize_rejects_star_qi(spark):
    """The literal '*' is reserved as the suppression marker: a QI value
    colliding with it must raise up front, never be released ambiguously
    (ADVICE round 6)."""
    import pytest as _pytest

    from apollo_spark.ops.privacy import k_anonymize

    df = spark.createDataFrame(
        [("*", 1.0)] * 3 + [("x", 2.0)] * 3, "qi string, v double"
    )
    with _pytest.raises(ValueError, match="reserved as the suppression marker"):
        k_anonymize(df, ["qi"], k=2, value_col="v")


def test_ivf_twolevel_full_probe_is_exact(spark, emb):
    """Two-level float IVF (coarse cells -> per-cell fine lists trained
    inside tasks, cogrouped assignment) with every cell and list probed
    equals brute force — the machinery check for the 100 TB index shape
    where the full K x D centroid matrix exists in no single process."""
    from apollo_spark.ops.clustering import twolevel_shape
    from apollo_spark.ops.similarity import brute_force_topk, ivf_topk_twolevel

    qdf = spark.createDataFrame(
        [(int(r.vec_id), r.embedding) for r in emb.limit(3).collect()], "q_id long, q_vec array<float>"
    )
    exact = brute_force_topk(emb, qdf, k=5).toPandas().sort_values(["q_id", "rank"]).reset_index(drop=True)
    kc, kf = twolevel_shape(8)
    full = (
        ivf_topk_twolevel(emb, qdf, k=5, n_clusters=8, n_probe_cells=kc, n_probe_lists=kf)
        .toPandas()
        .sort_values(["q_id", "rank"])
        .reset_index(drop=True)
    )
    assert (exact["vec_id"] == full["vec_id"]).all()
    assert np.allclose(exact["score"], full["score"])


def test_ivf_twolevel_partial_probe_recall_parity(spark, emb):
    """Two-level IVF probing ~half the index keeps recall at the flat
    path's bar — the recall-parity check the round-9 verdict asked for."""
    from apollo_spark.ops.similarity import brute_force_topk, ivf_topk_twolevel

    qdf = spark.createDataFrame(
        [(int(r.vec_id), r.embedding) for r in emb.limit(5).collect()], "q_id long, q_vec array<float>"
    )
    exact = brute_force_topk(emb, qdf, k=10).toPandas()
    approx = ivf_topk_twolevel(
        emb, qdf, k=10, n_clusters=8, n_probe_cells=2, n_probe_lists=2
    ).toPandas()
    recalls = []
    for qid in exact.q_id.unique():
        e = set(exact[exact.q_id == qid]["vec_id"])
        a = set(approx[approx.q_id == qid]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.5, recalls
    # a query always probes its own cell's best list first
    for qid in exact.q_id.unique():
        top = approx[(approx.q_id == qid) & (approx["rank"] == 1)]["vec_id"].iloc[0]
        assert top == qid


def test_ivf_topk_auto_switches_to_twolevel(spark, emb, monkeypatch):
    """ivf_topk above IVF_TWOLEVEL_THRESHOLD routes to the two-level index
    (threshold patched down so the crossover is testable at fixture size);
    results stay exact under full probing either way."""
    import apollo_spark.ops.similarity as sim

    qdf = spark.createDataFrame(
        [(int(r.vec_id), r.embedding) for r in emb.limit(2).collect()], "q_id long, q_vec array<float>"
    )
    exact = sim.brute_force_topk(emb, qdf, k=3).toPandas().sort_values(["q_id", "rank"]).reset_index(drop=True)
    monkeypatch.setattr(sim, "IVF_TWOLEVEL_THRESHOLD", 4)
    routed = (
        sim.ivf_topk(emb, qdf, k=3, n_clusters=8, n_probe=8)
        .toPandas().sort_values(["q_id", "rank"]).reset_index(drop=True)
    )
    assert (exact["vec_id"] == routed["vec_id"]).all()
    assert np.allclose(exact["score"], routed["score"])



def test_fuzzy_collapse_exact_preserves_components(spark):
    """collapse_exact=True (the production hot-name guard): the pair set is
    a SUBGRAPH of the lossless all-pairs output with IDENTICAL connected
    components — exact-text groups shrink from C(m,2) intra-clique pairs to
    m-1 star edges (linear in the hottest name), cross-string matches ride
    the per-distinct-string representative. On an all-distinct corpus the
    two forms are bit-identical (which is why the oracle gates hold)."""
    from apollo_spark.ops.linkage import fuzzy_dup_pairs

    rows = [(i, "hotname") for i in range(1, 31)]          # one hot exact group
    rows += [(100, "hotnames"), (101, "hotnam")]           # d1 satellites
    rows += [(200, "alpha"), (201, "alphb"), (202, "zzz")] # sparse tail
    df = spark.createDataFrame(rows, "id long, s string")
    lossless = {(r.id_a, r.id_b) for r in fuzzy_dup_pairs(df, "id", "s", collapse_exact=False).collect()}
    collapsed = {(r.id_a, r.id_b) for r in fuzzy_dup_pairs(df, "id", "s").collect()}
    assert collapsed <= lossless
    # hot group: 29 star edges instead of C(30,2)=435 intra-clique pairs
    intra = {(a, b) for (a, b) in collapsed if a >= 1 and b <= 30}
    assert len(intra) == 29 and all(a == 1 for a, _ in intra)

    def comps(pairs, nodes):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            parent[find(a)] = find(b)
        out = {}
        for n in nodes:
            out.setdefault(find(n), set()).add(n)
        return {frozenset(v) for v in out.values()}

    nodes = {i for i, _ in rows}
    assert comps(collapsed, nodes) == comps(lossless, nodes)

    # all-distinct corpus: bit-identical outputs
    sparse = spark.createDataFrame(
        [(i, f"name{i}") for i in range(50)] + [(100, "name1x")], "id long, s string"
    )
    a = sorted(map(tuple, fuzzy_dup_pairs(sparse, "id", "s").collect()))
    b = sorted(map(tuple, fuzzy_dup_pairs(sparse, "id", "s", collapse_exact=False).collect()))
    assert a == b


def test_semantic_dedup_routes_twolevel_above_threshold(spark, emb, monkeypatch):
    """semantic_dedup at corpus-proportional k above IVF_TWOLEVEL_THRESHOLD
    routes blocking through the two-level float index (no K x D collect or
    broadcast); the greedy prune semantics are unchanged — every planted
    exact duplicate still collapses (threshold patched down so the
    crossover is testable)."""
    import apollo_spark.ops.similarity as sim
    from pyspark.sql import functions as F

    # plant exact dups: copy vec 0 into new ids
    base = emb.select("vec_id", "embedding")
    dup = base.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    d = base.unionByName(dup)
    monkeypatch.setattr(sim, "IVF_TWOLEVEL_THRESHOLD", 4)
    kept = sim.semantic_dedup(d, threshold=0.999, n_clusters=8).toPandas()
    assert 100000 not in set(kept["vec_id"])  # the exact dup is pruned
    assert 0 in set(kept["vec_id"])



def test_semantic_decontamination_jvm_arrow_parity(spark, emb):
    """impl="arrow" (per-partition matmul, no cross-product rows) must equal
    impl="jvm" (broadcast + fold-cosine + window) bit-for-bit: same 6-dp
    rounding before the argmax, same smaller-bench-id tie-break; and the
    planted verbatim leak flags at exactly 1.0."""
    from pyspark.sql import functions as F

    from apollo_spark.ops.similarity import semantic_decontamination

    e = emb.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    bench = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("bench_id"), F.col("v").alias("bench_vec")
    )
    jvm = (
        semantic_decontamination(e, bench, threshold=0.999, vec_col="v")
        .toPandas().sort_values("vec_id").reset_index(drop=True)
    )
    arrow = (
        semantic_decontamination(e, bench, threshold=0.999, vec_col="v", impl="arrow")
        .toPandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert jvm.equals(arrow), (jvm.compare(arrow) if jvm.shape == arrow.shape else (jvm.shape, arrow.shape))
    flagged = jvm[jvm["contaminated"]]
    assert set(flagged["vec_id"]) == {0, 1, 2}
    assert (flagged["max_cos"] == 1.0).all()



def test_embedding_outlier_report_flags_planted_corrupt_vector(spark, emb, tmp_path):
    """A scaled-out-of-distribution vector must top its cluster's distance
    ranking with the extreme flag set (2.5x an existing vector: far from
    every centroid but not so far that Lloyd hands it its own singleton
    cluster — a TRULY extreme vector captures a cluster instead, which the
    report also surfaces: rank-1 singleton at dist 0)."""
    from pyspark.sql import functions as F

    from apollo_spark.queries import QUERIES

    r0 = emb.select("embedding").first()[0]
    bad = [(999999, [float(x) * 2.5 for x in r0])]
    base = emb.select("vec_id", F.transform("embedding", lambda x: x.cast("float")).alias("embedding"))
    planted = base.unionByName(
        spark.createDataFrame(bad, "vec_id long, embedding array<float>")
    )
    planted.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = QUERIES["embedding_outlier_report"](spark, str(tmp_path)).toPandas()
    hit = out[out["vec_id"] == 999999]
    assert len(hit) == 1 and hit.iloc[0]["rank"] == 1 and bool(hit.iloc[0]["extreme"])



def test_train_or_load_ivf_twolevel_roundtrip(spark, emb, tmp_path):
    """Two-level IVF artifact: first call trains + commits one TxTable
    holding both levels; second call LOADS (no new version) and returns
    identical coarse bits and fine rows; assignment through the loaded
    index equals assignment through a fresh one."""
    import numpy as np

    from apollo_spark.ops.similarity import (
        ivf_assign_twolevel,
        train_or_load_ivf_twolevel,
    )
    from apollo_spark.table_format import TxTable

    path = str(tmp_path / "ivf2l")
    c1, f1 = train_or_load_ivf_twolevel(emb, path, n_clusters=8, seed=11)
    assert TxTable(path).current_version() == 1
    c2, f2 = train_or_load_ivf_twolevel(emb, path, n_clusters=8, seed=11)
    assert TxTable(path).current_version() == 1  # loaded, not retrained
    assert np.array_equal(c1, c2)
    p1 = f1.toPandas().sort_values("list_id").reset_index(drop=True)
    p2 = f2.toPandas().sort_values("list_id").reset_index(drop=True)
    assert p1["list_id"].tolist() == p2["list_id"].tolist()
    a1 = ivf_assign_twolevel(emb.select("vec_id", "embedding"), c1, f1).toPandas()
    a2 = ivf_assign_twolevel(emb.select("vec_id", "embedding"), c2, f2).toPandas()
    assert a1.sort_values("vec_id").reset_index(drop=True).equals(
        a2.sort_values("vec_id").reset_index(drop=True)
    )



def test_pq_subspace_kmeans_arrow_equals_relational(spark, emb):
    """The fused Arrow PQ trainer (per-batch partial sums, driver-held
    codebooks) must reproduce the relational twin bit-for-bit: same
    final-round pre-update assignment (id, s, cluster, dist) and the same
    post-update codebook (s, cluster, d, ci)."""
    from apollo_spark.ops.clustering import _pq_subspace_kmeans

    _, a_assign, a_cent, cbs = _pq_subspace_kmeans(
        emb, 64, 4, 8, 2, "vec_id", "embedding", 1_000_000.0, 8.0, impl="arrow"
    )
    _, r_assign, r_cent, none = _pq_subspace_kmeans(
        emb, 64, 4, 8, 2, "vec_id", "embedding", 1_000_000.0, 8.0, impl="relational"
    )
    assert cbs is not None and none is None
    key = lambda r: (r["vec_id"], r["s"])
    a = sorted((r["vec_id"], r["s"], r["cluster"], r["dist"]) for r in a_assign.collect())
    b = sorted((r["vec_id"], r["s"], r["cluster"], r["dist"]) for r in r_assign.collect())
    assert a == b
    ac = sorted((r["s"], r["cluster"], r["d"], r["ci"]) for r in a_cent.collect())
    rc = sorted((r["s"], r["cluster"], r["d"], r["ci"]) for r in r_cent.collect())
    assert ac == rc
