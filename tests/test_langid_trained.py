"""Trained language-ID classifier (round 7): in-engine multiclass
perceptron over hashed token trigrams — diagonal-dominant confusion on the
labeled slice, deterministic tie-breaks, and the quality_keep /
curation.curate / DSL QualitySpec routing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_trained_langid_diagonal_dominant(spark, docs):
    """Every gold class's diagonal cell is a strict majority of its row —
    the round-6 heuristic collapsed everything to en/unknown; the trained
    classifier memorizes the labeled slice (the text is label-independent
    by construction, so train-slice fit is the demonstrable metric)."""
    from apollo_spark.ops.text import trained_language_id

    preds = trained_language_id(docs).toPandas().set_index("doc_id")["pred_lang"]
    gold = docs.select("doc_id", "lang").toPandas().set_index("doc_id")["lang"]
    joined = gold.to_frame("gold").join(preds.to_frame("pred"))
    for g, grp in joined.groupby("gold"):
        diag = (grp["pred"] == g).sum()
        assert diag > len(grp) / 2, f"class {g}: {diag}/{len(grp)} not a majority"
    acc = (joined["gold"] == joined["pred"]).mean()
    assert acc > 0.9


def test_trained_langid_reuses_weights(spark, docs):
    """Scoring with a precomputed weight table (the train-once /
    score-everywhere production path) gives the same predictions as the
    self-contained path."""
    from apollo_spark.ops.text import language_id_model, trained_language_id

    w = language_id_model(docs)
    a = trained_language_id(docs, weights=w).toPandas().sort_values("doc_id")
    b = trained_language_id(docs).toPandas().sort_values("doc_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_multiclass_predict_tiebreak_min_class(spark):
    """Equal scores -> lexicographically smallest class (mirrors the
    oracle's ROW_NUMBER ... ORDER BY score DESC, cls ASC)."""
    from apollo_spark.ops.ml import multiclass_predict

    feats = spark.createDataFrame([(1, 0, 1)], "doc_id long, b int, n long")
    weights = spark.createDataFrame(
        [("zz", 0, 5), ("aa", 0, 5), ("mm", 0, 4)], "cls string, b int, weight long"
    )
    out = multiclass_predict(feats, weights).collect()
    assert out[0]["pred"] == "aa"


def test_quality_keep_lang_pred_col_routes(spark):
    """quality_keep with lang_pred_col gates on the supplied column, not
    the heuristic: a doc whose heuristic lang is 'en' but whose supplied
    prediction is 'fr' is dropped, and vice versa."""
    from apollo_spark.ops.text import quality_keep

    good = "the quick brown fox and the lazy dog that is for the win " * 3
    df = spark.createDataFrame(
        [(1, good, "fr"), (2, good, "en")], "doc_id long, text string, pred_lang string"
    )
    kept = df.filter(quality_keep(F.col("text"), lang_pred_col="pred_lang"))
    assert [r["doc_id"] for r in kept.collect()] == [2]


def test_curate_with_lang_pred(spark):
    """curate(lang_pred=...) keeps exactly the docs the prediction table
    marks as the target language (quality/token gates permitting)."""
    from apollo_spark.ops.curation import curate

    good = "the quick brown fox and the lazy dog that is for the win " * 3
    df = spark.createDataFrame(
        [(1, good), (2, good), (3, "x")], "doc_id long, text string"
    )
    preds = spark.createDataFrame(
        [(1, "en"), (2, "de"), (3, "en")], "doc_id long, pred_lang string"
    )
    out = curate(df, seq_len=32, lang_pred=preds).select("doc_id").distinct().collect()
    assert {r["doc_id"] for r in out} == {1}


def test_dsl_quality_trained_langid(spark, tmp_path):
    """DSL quality block with langid="trained": trains on the frame's own
    labeled slice and gates on the predictions end-to-end."""
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.pipeline import compile_query
    from apollo_spark.sources.tables import Catalog

    good = "the quick brown fox and the lazy dog that is for the win " * 3
    # two distinguishable classes: repeated distinct trigram bodies
    rows = [(i, good + f" marker{i % 2} alpha beta", "en" if i % 2 == 0 else "fr") for i in range(20)]
    spark.createDataFrame(rows, "doc_id long, text string, lang string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    catalog = Catalog(spark, str(tmp_path))
    schema = parse_schema(
        """
query filtered_trained {
  chain = "ethereum"
  source_table = "documents"
  quality {
    ruleset = "basic"
    langid = "trained"
    min_quality = 0.5
    min_tokens = 10
  }
  save {
    doc_id = doc_id
  }
}
"""
    )
    out = compile_query(spark, catalog, schema.queries[0], schema).toPandas()
    assert set(out["doc_id"]) == {i for i in range(20) if i % 2 == 0}


def test_dsl_quality_bad_langid_raises(spark):
    from apollo_spark.dsl.schema import SchemaError, parse_schema

    with pytest.raises(SchemaError, match="quality langid"):
        parse_schema(
            """
query q {
  chain = "ethereum"
  source_table = "documents"
  quality {
    ruleset = "basic"
    langid = "vibes"
  }
}
"""
        )
