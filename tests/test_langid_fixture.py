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


# --------------------------------------------------------------------------
# Quality axis (round 10): the trained quality classifier generalizes on
# text with real signal, through the SAME binary pipeline the registry's
# perceptron/logreg quality queries run (hashed_token_features ->
# perceptron_train -> classifier_margins).
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def quality_df(spark):
    from apollo_spark.ops.langdata import quality_fixture_df

    return quality_fixture_df(spark).persist()


def test_quality_fixture_shape(quality_df):
    from apollo_spark.ops.langdata import quality_fixture_rows

    counts = {r["kind"]: r["n"] for r in quality_df.groupBy("kind").agg(F.count("*").alias("n")).collect()}
    assert counts == {"fluent": 150, "gibberish": 75, "boilerplate": 75}
    assert quality_fixture_rows()[:3] == quality_fixture_rows()[:3]  # deterministic


def test_trained_quality_generalizes_held_out(spark, quality_df):
    from apollo_spark.ops.ml import (
        classifier_margins,
        hashed_token_features,
        perceptron_train,
    )

    train, test = _split(quality_df)
    n_train, n_test = train.count(), test.count()
    assert n_test >= 50 and n_train + n_test == 300
    feats_tr = hashed_token_features(train)
    labels = train.select("doc_id", F.when(F.col("label") == 1, 1).otherwise(-1).alias("y"))
    w = perceptron_train(feats_tr, labels, iters=3)
    preds = (
        classifier_margins(hashed_token_features(test), w)
        .join(test.select("doc_id", "label", "kind"), "doc_id")
        .collect()
    )
    acc = sum(1 for r in preds if (r["score"] > 0) == (r["label"] == 1)) / len(preds)
    assert acc >= 0.9, f"held-out accuracy {acc:.3f} on {len(preds)} unseen docs"
    # both degradation modes are caught, not just the easy one
    from collections import Counter

    by_kind: dict[str, Counter] = {}
    for r in preds:
        by_kind.setdefault(r["kind"], Counter())[(r["score"] > 0)] += 1
    for kind in ("gibberish", "boilerplate"):
        c = by_kind.get(kind)
        if c:  # a split can hold out few of one kind; majority must be caught
            assert c[False] >= c[True], (kind, dict(c))


def test_quality_signal_is_in_text_not_labels(spark, quality_df):
    """Rotated-label control (the langid honesty pin, quality edition):
    training on labels decoupled from the text collapses held-out accuracy
    to chance — the fixture's accuracy comes from real lexical signal."""
    from apollo_spark.ops.ml import (
        classifier_margins,
        hashed_token_features,
        perceptron_train,
    )

    train, test = _split(quality_df)
    # decouple labels from text deterministically: relabel by doc_id parity
    fake = train.select("doc_id", F.when(F.col("doc_id") % 2 == 0, 1).otherwise(-1).alias("y"))
    w = perceptron_train(hashed_token_features(train), fake, iters=3)
    preds = (
        classifier_margins(hashed_token_features(test), w)
        .join(test.select("doc_id", "label"), "doc_id")
        .collect()
    )
    acc = sum(1 for r in preds if (r["score"] > 0) == (r["label"] == 1)) / len(preds)
    assert acc <= 0.75, f"parity-label control should be near chance, got {acc:.3f}"


def test_logreg_quality_generalizes_held_out(spark, quality_df):
    """The CALIBRATED trainer (logreg_train_hardsigmoid — the registry's
    logreg_quality_weights pipeline) also generalizes on the quality
    fixture: held-out accuracy >= 0.9 with score s(w.x) > 1/2, i.e.
    z_int > 0 in micro-units. Covers the second (residual-driven) trainer
    the way the perceptron test covers the first."""
    from apollo_spark.ops.ml import (
        classifier_margins,
        hashed_token_features,
        logreg_train_hardsigmoid,
    )

    train, test = _split(quality_df)
    labels = train.select("doc_id", F.col("label").alias("y01"))
    w = logreg_train_hardsigmoid(hashed_token_features(train), labels, iters=3)
    preds = (
        classifier_margins(hashed_token_features(test), w)
        .join(test.select("doc_id", "label"), "doc_id")
        .collect()
    )
    acc = sum(1 for r in preds if (r["score"] > 0) == (r["label"] == 1)) / len(preds)
    assert acc >= 0.9, f"held-out accuracy {acc:.3f} on {len(preds)} unseen docs"
