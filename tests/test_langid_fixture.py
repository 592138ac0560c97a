"""Trained language ID generalizes on text with real signal (round 9).

The driver corpus is label-independent (SURVEY round 7), so the trained
classifier can only memorize there. This suite runs the SAME pipeline
(ops.text.language_id_model -> trained_language_id, i.e.
hashed_ngram_features + multiclass_perceptron_train + multiclass_predict)
on the in-tree multilingual fixture (ops.langdata) with a deterministic
train/test split and pins:

* held-out accuracy >= 0.9 on documents the model NEVER saw;
* a diagonal-dominant confusion matrix per language (same aggregation as
  the langid_confusion_matrix registry query);
* the signal really is in the text: shuffled labels collapse to chance.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def fixture_df(spark):
    from apollo_spark.ops.langdata import multilingual_fixture_df

    return multilingual_fixture_df(spark).persist()


def _split(df):
    # deterministic hash split: ~25% held out, stratified by construction
    # (doc_ids interleave languages in blocks, md5 scrambles them)
    test_flag = F.conv(F.substring(F.md5(F.concat(F.lit("split"), F.col("doc_id").cast("string"))), 1, 8), 16, 10) % 4 == 0
    return df.filter(~test_flag), df.filter(test_flag)


def test_fixture_shape(fixture_df):
    from apollo_spark.ops.langdata import LANGS

    counts = {r["lang"]: r["n"] for r in fixture_df.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == set(LANGS) and all(v == 120 for v in counts.values())
    # deterministic: same seed, same bytes
    from apollo_spark.ops.langdata import multilingual_fixture_rows

    assert multilingual_fixture_rows()[:3] == multilingual_fixture_rows()[:3]


def test_trained_langid_generalizes_held_out(spark, fixture_df):
    from apollo_spark.ops.text import language_id_model, trained_language_id

    train, test = _split(fixture_df)
    n_train, n_test = train.count(), test.count()
    assert n_test >= 100 and n_train + n_test == 600
    weights = language_id_model(train)
    preds = trained_language_id(test, weights=weights).join(
        test.select("doc_id", "lang"), "doc_id"
    )
    rows = preds.collect()
    acc = sum(1 for r in rows if r["pred_lang"] == r["lang"]) / len(rows)
    assert acc >= 0.9, f"held-out accuracy {acc:.3f} on {len(rows)} unseen docs"

    # diagonal dominance per language (the confusion-matrix query's view):
    # every gold language's most-predicted class is itself
    from collections import Counter

    by_gold: dict[str, Counter] = {}
    for r in rows:
        by_gold.setdefault(r["lang"], Counter())[r["pred_lang"]] += 1
    for gold, c in by_gold.items():
        assert c.most_common(1)[0][0] == gold, (gold, dict(c))


def test_confusion_matrix_query_shape_on_fixture(spark, fixture_df):
    """The registry's confusion aggregation (_confusion_from_preds) pointed
    at the fixture: held-out confusion is diagonal-dominant row by row —
    the generalization demonstration the synthetic corpus cannot give."""
    from apollo_spark.ops.text import language_id_model, trained_language_id
    from apollo_spark.queries.text_dedup import _confusion_from_preds

    train, test = _split(fixture_df)
    weights = language_id_model(train)
    preds = trained_language_id(test, weights=weights).select(
        "doc_id", F.col("pred_lang").alias("pred")
    )
    conf = _confusion_from_preds(test, preds).toPandas()
    for gold, grp in conf.groupby("gold"):
        top = grp.sort_values("n", ascending=False).iloc[0]
        assert top["pred"] == gold, conf.to_string()
        assert top["share_of_gold"] >= 0.7, conf.to_string()


def test_signal_is_in_the_text_not_the_split(spark, fixture_df):
    """Control: destroy the text-label association (labels rotated by one
    language) and held-out accuracy against the TRUE labels collapses to
    ~chance — the fixture's accuracy comes from lexical signal, not from
    any leak through the split or the hashing."""
    from apollo_spark.ops.langdata import LANGS
    from apollo_spark.ops.text import language_id_model, trained_language_id

    rot = dict(zip(LANGS, LANGS[1:] + LANGS[:1]))
    mapping = F.create_map(*[F.lit(x) for kv in rot.items() for x in kv])
    train, test = _split(fixture_df)
    scrambled = train.withColumn("lang", mapping[F.col("lang")])
    weights = language_id_model(scrambled)
    preds = trained_language_id(test, weights=weights).join(
        test.select("doc_id", "lang"), "doc_id"
    )
    rows = preds.collect()
    acc = sum(1 for r in rows if r["pred_lang"] == r["lang"]) / len(rows)
    assert acc <= 0.3, f"rotated-label control should be ~chance, got {acc:.3f}"
