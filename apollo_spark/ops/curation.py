"""End-to-end corpus curation: the standard pretraining-data chain as one
composable call.

Every step is an already-gated operator; this module is the recipe that
strings them together the way a training-data job actually runs them:

    raw documents
      -> exact dedup              (one content-digest shuffle)
      -> language / quality / length filter   (narrow, no shuffle)
      -> concat-then-chunk sequence packing   (bucketed two-phase layout)

The composition stays one lazy Catalyst plan end-to-end — no intermediate
materialization, filters run before the packing shuffle, and the whole
output layout is deterministic (hash order), so a re-run resumes to
byte-identical sequences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curate(
    df: DataFrame,
    seq_len: int = 512,
    lang: str = "en",
    min_quality: float = 0.6,
    min_tokens: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_pred: DataFrame | None = None,
) -> DataFrame:
    """raw docs -> packed training sequences (see module docstring).

    ``lang_pred`` (optional): a precomputed ``(id_col, pred_lang)`` frame —
    e.g. ops.text.trained_language_id scored once and persisted — routed
    into the language gate instead of the stopword heuristic. The
    production shape at 100 TB: train the classifier on the labeled slice,
    broadcast-score the corpus ONCE, persist the prediction table, and
    every curation run joins it rather than re-deriving language.

    Returns pack_sequences' layout columns (id, n_tokens, start_pos,
    seq_first, seq_last, offset_in_seq) for every surviving document."""
    from apollo_spark.ops.corpus import pack_sequences
    from apollo_spark.ops.dedup import exact_dedup
    from apollo_spark.ops.text import quality_keep

    kept = exact_dedup(df, id_col=id_col, text_col=text_col)
    if lang_pred is not None:
        kept = kept.join(lang_pred, id_col).filter(
            quality_keep(
                F.col(text_col), lang, min_quality, min_tokens, lang_pred_col="pred_lang"
            )
        ).drop("pred_lang")
    else:
        kept = kept.filter(quality_keep(F.col(text_col), lang, min_quality, min_tokens))
    return pack_sequences(kept, seq_len, id_col=id_col, text_col=text_col)
