"""Persisted near-dup component artifact (round 7): build-once /
consume-everywhere via TxTable, plus the env-routed bench/production path."""

from __future__ import annotations

import os

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_train_or_load_components_roundtrip(spark, docs, tmp_path):
    """First call builds + commits version 0; second call LOADS (no
    rebuild: version unchanged) and returns the same table."""
    from apollo_spark.ops.dedup import train_or_load_components
    from apollo_spark.table_format import TxTable

    path = str(tmp_path / "comp")
    a = train_or_load_components(docs, path=path).toPandas().sort_values("doc_id")
    assert TxTable(path).current_version() == 1
    b = train_or_load_components(docs, path=path).toPandas().sort_values("doc_id")
    assert TxTable(path).current_version() == 1  # no second commit
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    fresh = train_or_load_components(docs, path=None).toPandas().sort_values("doc_id")
    assert a.reset_index(drop=True).equals(fresh.reset_index(drop=True))


def test_doc_components_env_routing(spark, tmp_path, monkeypatch):
    """queries._doc_components: with APOLLO_SPARK_ARTIFACT_DIR set, the
    three component consumers share one TxTable build; results equal the
    self-contained path bit-for-bit."""
    from apollo_spark.queries import QUERIES
    from apollo_spark.table_format import TxTable

    monkeypatch.delenv("APOLLO_SPARK_ARTIFACT_DIR", raising=False)
    plain = QUERIES["near_dup_components"](spark, SF).toPandas()
    monkeypatch.setenv("APOLLO_SPARK_ARTIFACT_DIR", str(tmp_path))
    routed = QUERIES["near_dup_components"](spark, SF).toPandas()
    assert plain.equals(routed)
    tag = SF.strip("/").replace("/", "_")
    t = TxTable(f"{tmp_path}/doc_components_{tag}")
    assert t.current_version() == 1
    # the other consumers reuse the same committed version — no rebuild
    QUERIES["dedup_keep_best"](spark, SF).count()
    QUERIES["dup_aware_sample_weights"](spark, SF).count()
    assert t.current_version() == 1


def test_blocking_profile_artifact_roundtrip(spark, docs, tmp_path):
    """Round 10 'one profile, every consumer': the one-row blocking profile
    commits as a TxTable on first use, is NOT rebuilt on later loads, and
    the artifact-backed dict equals the fresh-profiled dict exactly."""
    from apollo_spark.ops.dedup import (
        blocking_autotune,
        train_or_load_blocking_profile,
    )
    from apollo_spark.table_format import TxTable

    path = str(tmp_path / "blocking_profile")
    fresh = blocking_autotune(docs, threshold=0.2)
    routed = train_or_load_blocking_profile(docs, path=path, threshold=0.2)
    assert routed == fresh
    assert TxTable(path).current_version() == 1
    again = train_or_load_blocking_profile(docs, path=path, threshold=0.2)
    assert TxTable(path).current_version() == 1  # no rebuild
    assert again == fresh


def test_component_table_profile_config_parity(spark, docs):
    """doc_component_table(config=profile) equals the self-contained call
    with the profile's recommendations threaded by hand — the routing adds
    no semantics, it only removes the hand-threading."""
    from apollo_spark.ops.dedup import blocking_autotune, doc_component_table

    cfg = blocking_autotune(docs, n=2, threshold=0.2)
    routed = doc_component_table(docs, n=2, threshold=0.2, config=cfg).toPandas()
    manual = doc_component_table(
        docs,
        n=2,
        threshold=0.2,
        max_df_frac=cfg["max_df_frac"],
        scrub_max_df_frac=0.04 if cfg["scrub"] else None,
    ).toPandas()
    r = routed.sort_values("doc_id").reset_index(drop=True)
    m = manual.sort_values("doc_id").reset_index(drop=True)
    assert r.equals(m)


def test_dsl_autotune_profile_artifact(spark, docs, tmp_path, monkeypatch):
    """The DSL dedup autotune path commits its profile as a TxTable when
    APOLLO_SPARK_ARTIFACT_DIR is set, reuses it on re-run, and produces the
    same survivors as the self-contained path."""
    import glob

    from apollo_spark.pipeline import _apply_dedup
    from apollo_spark.dsl.schema import DedupSpec
    from apollo_spark.table_format import TxTable

    spec = DedupSpec(method="ngram_jaccard", threshold=0.2, autotune=True)
    monkeypatch.delenv("APOLLO_SPARK_ARTIFACT_DIR", raising=False)
    plain = _apply_dedup(docs, spec).toPandas().sort_values("doc_id").reset_index(drop=True)
    monkeypatch.setenv("APOLLO_SPARK_ARTIFACT_DIR", str(tmp_path))
    routed = _apply_dedup(docs, spec).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert plain.equals(routed)
    profs = glob.glob(f"{tmp_path}/blocking_profile_*")
    assert len(profs) == 1
    assert TxTable(profs[0]).current_version() == 1
    _apply_dedup(docs, spec).count()  # re-run: reads the committed profile
    assert TxTable(profs[0]).current_version() == 1


def test_dsl_tfidf_autotune(spark, docs):
    """method=tfidf now accepts autotune: the profile's budgeted df-cap
    replaces the static default; survivors match the hand-threaded call."""
    from apollo_spark.ops.dedup import blocking_autotune
    from apollo_spark.pipeline import _apply_dedup
    from apollo_spark.dsl.schema import DedupSpec

    spec = DedupSpec(method="tfidf", threshold=0.8, shingle_n=2, autotune=True)
    routed = _apply_dedup(docs, spec).toPandas().sort_values("doc_id").reset_index(drop=True)
    cfg = blocking_autotune(docs, n=2, threshold=0.8)
    manual_spec = DedupSpec(
        method="tfidf", threshold=0.8, shingle_n=2, max_df_frac=cfg["max_df_frac"]
    )
    manual = _apply_dedup(docs, manual_spec).toPandas().sort_values("doc_id").reset_index(drop=True)
    assert routed.equals(manual)


def test_langid_model_artifact_routing(spark, tmp_path, monkeypatch):
    """Trained-langid weight artifact: with APOLLO_SPARK_ARTIFACT_DIR set,
    the three trained queries share ONE committed weight table and the
    predictions equal the self-contained path bit-for-bit."""
    from apollo_spark.queries import QUERIES
    from apollo_spark.table_format import TxTable

    monkeypatch.delenv("APOLLO_SPARK_ARTIFACT_DIR", raising=False)
    plain = QUERIES["doc_language_id_trained"](spark, SF).toPandas()
    monkeypatch.setenv("APOLLO_SPARK_ARTIFACT_DIR", str(tmp_path))
    routed = QUERIES["doc_language_id_trained"](spark, SF).toPandas()
    assert plain.equals(routed)
    tag = SF.strip("/").replace("/", "_")
    t = TxTable(f"{tmp_path}/langid_model_{tag}")
    assert t.current_version() == 1
    QUERIES["langid_confusion_matrix"](spark, SF).count()
    assert t.current_version() == 1  # reused, not retrained
    # the per-doc PREDICTION table is itself an artifact (round 7): the
    # second/third consumers read one committed row per doc instead of
    # re-paying feature extraction + scoring
    p = TxTable(f"{tmp_path}/langid_preds_{tag}")
    assert p.current_version() == 1
    QUERIES["doc_quality_filter_trained"](spark, SF).count()
    assert p.current_version() == 1  # read, not rebuilt


def test_entity_pairs_artifact_routing(spark, tmp_path, monkeypatch):
    """Entity-linkage pair artifact: fuzzy_entity_dup_pairs and
    entity_golden_records share one committed SymSpell pair table when the
    artifact dir is set; results equal the self-contained path."""
    from apollo_spark.queries import QUERIES
    from apollo_spark.table_format import TxTable

    monkeypatch.delenv("APOLLO_SPARK_ARTIFACT_DIR", raising=False)
    plain = QUERIES["fuzzy_entity_dup_pairs"](spark, SF).toPandas()
    gplain = QUERIES["entity_golden_records"](spark, SF).toPandas()
    monkeypatch.setenv("APOLLO_SPARK_ARTIFACT_DIR", str(tmp_path))
    routed = QUERIES["fuzzy_entity_dup_pairs"](spark, SF).toPandas()
    assert plain.equals(routed)
    tag = SF.strip("/").replace("/", "_")
    t = TxTable(f"{tmp_path}/entity_pairs_{tag}")
    assert t.current_version() == 1
    grouted = QUERIES["entity_golden_records"](spark, SF).toPandas()
    assert gplain.equals(grouted)
    assert t.current_version() == 1  # reused, not rebuilt


def test_lsh_eval_substrate_env_routing(spark, tmp_path, monkeypatch):
    """Shared LSH evaluation substrate (round 9): with
    APOLLO_SPARK_ARTIFACT_DIR set, lsh_blocking_quality and
    lsh_merge_completeness read ONE committed (cand, truth) TxTable pair
    instead of each re-paying signatures + ladder + df-capped truth;
    results equal the self-contained path bit-for-bit and nothing is
    rebuilt for the second consumer."""
    from apollo_spark.queries import QUERIES
    from apollo_spark.table_format import TxTable

    monkeypatch.delenv("APOLLO_SPARK_ARTIFACT_DIR", raising=False)
    plain_q = QUERIES["lsh_blocking_quality"](spark, SF).toPandas()
    plain_mc = QUERIES["lsh_merge_completeness"](spark, SF).toPandas()

    monkeypatch.setenv("APOLLO_SPARK_ARTIFACT_DIR", str(tmp_path))
    routed_q = QUERIES["lsh_blocking_quality"](spark, SF).toPandas()
    # the artifact path embeds the shared eval config (round-10 ADVICE:
    # a parameter change must never serve a stale substrate)
    from apollo_spark.queries.mining import _lsh_eval_tag

    tag = _lsh_eval_tag(SF)
    cand_t = TxTable(f"{tmp_path}/lsh_eval_cand_{tag}")
    truth_t = TxTable(f"{tmp_path}/lsh_eval_truth_{tag}")
    assert cand_t.current_version() == 1 and truth_t.current_version() == 1
    routed_mc = QUERIES["lsh_merge_completeness"](spark, SF).toPandas()
    # second consumer reused the committed substrate — no new versions
    assert cand_t.current_version() == 1 and truth_t.current_version() == 1
    assert plain_q.equals(routed_q)
    assert plain_mc.equals(routed_mc)


def test_bpe_merges_env_routing(spark, tmp_path, monkeypatch):
    """Shared BPE merge-rule artifact (round 10): with
    APOLLO_SPARK_ARTIFACT_DIR set, bpe_merge_rules and bpe_encode_by_source
    share ONE committed 8-round training run; results equal the
    self-contained path bit-for-bit and the second consumer rebuilds
    nothing."""
    from apollo_spark.queries import QUERIES
    from apollo_spark.table_format import TxTable

    monkeypatch.delenv("APOLLO_SPARK_ARTIFACT_DIR", raising=False)
    plain_rules = QUERIES["bpe_merge_rules"](spark, SF).toPandas()
    plain_enc = QUERIES["bpe_encode_by_source"](spark, SF).toPandas()

    monkeypatch.setenv("APOLLO_SPARK_ARTIFACT_DIR", str(tmp_path))
    routed_rules = QUERIES["bpe_merge_rules"](spark, SF).toPandas()
    tag = SF.strip("/").replace("/", "_")
    t = TxTable(f"{tmp_path}/bpe_merges8_{tag}")
    assert t.current_version() == 1
    routed_enc = QUERIES["bpe_encode_by_source"](spark, SF).toPandas()
    assert t.current_version() == 1  # encode reused the committed rules
    assert plain_rules.equals(routed_rules)
    assert plain_enc.equals(routed_enc)
