"""Corpus curation tier: sampling, ordering, decontamination, PII, BPE; additional TPC-H shapes.

Mechanically split from the single-file registry (round 8); content unchanged.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from apollo_spark.ops.cache import carry_caches, scoped_persist
from apollo_spark.ops.dedup import exact_dedup, minhash_lsh_pairs
from apollo_spark.ops.relational import asof_join
from apollo_spark.ops.similarity import cosine
from apollo_spark.ops.text import STOPWORDS, fingerprint, language_id, quality_score, token_count
from apollo_spark.queries._shared import _events, _t, dsum
from apollo_spark.queries.text_dedup import ORACLE_DEDUP_EXACT
from apollo_spark.queries.corpus import ORACLE_QUALITY_FILTER


def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable equi-width histogram sketch + quantile estimates per
    event_type (ops.sketch.histogram_sketch): the 100 TB answer to exact
    percentiles — the shuffle carries <=32 integer bins per group instead of
    a per-group sort of every value. p50/p95 are deterministic interpolations
    of integer counts; the oracle mirrors bin assignment and interpolation."""
    from apollo_spark.ops.sketch import histogram_quantile, histogram_sketch

    e = _events(spark, sf_dir)
    h = histogram_sketch(e, "value", lo=0.0, hi=512.0, bins=32, group_cols=["event_type"]).persist()
    p50 = histogram_quantile(h, 0.5, lo=0.0, hi=512.0, bins=32, group_cols=["event_type"])
    p95 = histogram_quantile(h, 0.95, lo=0.0, hi=512.0, bins=32, group_cols=["event_type"])
    return scoped_persist(
        p50.select("event_type", F.round("quantile_est", 6).alias("p50"), "total")
        .join(
            p95.select("event_type", F.round("quantile_est", 6).alias("p95")),
            "event_type",
        )
        .select("event_type", "total", "p50", "p95")
        .orderBy("event_type"),
        h,
    )


ORACLE_VALUE_HISTOGRAM = """
WITH h AS (
  SELECT event_type,
         CAST(LEAST(31, GREATEST(0, FLOOR(CAST(value AS DOUBLE) / 16.0))) AS INT) AS bin,
         COUNT(*) AS n
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
c AS (
  SELECT event_type, bin, n,
         CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS total
  FROM h
),
q AS (
  SELECT event_type, total,
         MAX(CASE WHEN cum >= CAST(CEIL(0.5 * total) AS BIGINT)
                   AND cum - n < CAST(CEIL(0.5 * total) AS BIGINT)
              THEN ROUND((CAST(bin AS DOUBLE)
                   + CAST(CAST(CEIL(0.5 * total) AS BIGINT) - (cum - n) AS DOUBLE)
                     / CAST(n AS DOUBLE)) * 16.0, 6) END) AS p50,
         MAX(CASE WHEN cum >= CAST(CEIL(0.95 * total) AS BIGINT)
                   AND cum - n < CAST(CEIL(0.95 * total) AS BIGINT)
              THEN ROUND((CAST(bin AS DOUBLE)
                   + CAST(CAST(CEIL(0.95 * total) AS BIGINT) - (cum - n) AS DOUBLE)
                     / CAST(n AS DOUBLE)) * 16.0, 6) END) AS p95
  FROM c GROUP BY event_type, total
)
SELECT event_type, total, p50, p95 FROM q ORDER BY event_type
"""


def _bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared 8-round BPE merge-rule table consumed by bpe_merge_rules
    (the training report) and bpe_encode_by_source (encode-time rules).

    Artifact-routed like _doc_components: with APOLLO_SPARK_ARTIFACT_DIR set
    (bench.py's per-run tmpdir; a production job points it at the lake) the
    tokenizer is TRAINED ONCE per corpus and committed as a TxTable — the
    train-once/encode-everywhere shape of a real tokenizer pipeline; the
    second consumer reads the committed snapshot instead of re-paying the 8
    argmax rounds. Unset (the driver's gate), each query trains
    self-contained so its oracle replays the full trajectory."""
    import os as _os

    from apollo_spark.ops.text import bpe_learn_merges

    d = _t(spark, sf_dir, "documents")
    art = _os.environ.get("APOLLO_SPARK_ARTIFACT_DIR")
    if art:
        from apollo_spark.table_format import train_or_load_table

        tag = sf_dir.strip("/").replace("/", "_")
        return train_or_load_table(
            spark, f"{art}/bpe_merges8_{tag}", lambda: bpe_learn_merges(d, n_merges=8)
        )
    return bpe_learn_merges(d, n_merges=8)


def bpe_merge_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (ops.text.bpe_learn_merges): 8
    merge rounds over the documents corpus, each round one word-table
    groupBy + a deterministic argmax + a greedy merge via the doubled-space
    replace invariant. The oracle unrolls the same 8 rounds in SQL — the
    whole trajectory (counts, tie-breaks, merge applications) is
    engine-exact integer/string arithmetic."""
    return _bpe_merges(spark, sf_dir).orderBy("merge_rank")


def _bpe_ctes(n_merges: int = 8, max_word_len: int = 24) -> str:
    """Shared unrolled-iteration CTE chain mirroring bpe_learn_merges: the
    word table w0..wk (word carried alongside its symbol string) and the
    per-round best pairs b1..bk."""
    parts = [
        f"""WITH w0 AS (
  SELECT w, ' ' || array_to_string(list_filter(string_split(w, ''), x -> x <> ''), '  ') || ' ' AS s, n
  FROM (
    SELECT w, COUNT(*) AS n FROM (
      SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w FROM documents
    ) WHERE length(w) BETWEEN 1 AND {max_word_len} GROUP BY w
  )
)"""
    ]
    for i in range(1, n_merges + 1):
        prev = f"w{i - 1}"
        parts.append(
            f"""p{i} AS (
  SELECT p[1] AS l, p[2] AS r, CAST(SUM(n) AS BIGINT) AS c
  FROM (
    SELECT n, unnest(list_zip(a[1:len(a)-1], a[2:len(a)])) AS p
    FROM (SELECT string_split(trim(s), '  ') AS a, n FROM {prev})
  ) GROUP BY 1, 2
),
b{i} AS (SELECT l, r, c FROM p{i} ORDER BY c DESC, l ASC, r ASC LIMIT 1),
w{i} AS (
  SELECT w, replace(s, ' ' || b.l || '  ' || b.r || ' ', ' ' || b.l || b.r || ' ') AS s, n
  FROM {prev} CROSS JOIN b{i} b
)"""
        )
        # the merged-word table w{i} feeds the next round
    return ",\n".join(parts)


def _bpe_oracle(n_merges: int = 8, max_word_len: int = 24) -> str:
    """Unrolled-iteration DuckDB mirror of bpe_learn_merges."""
    selects = "\nUNION ALL\n".join(
        f"SELECT {i} AS merge_rank, l AS left, r AS right, c AS pair_count FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    return _bpe_ctes(n_merges, max_word_len) + f"\n{selects}\nORDER BY merge_rank"


ORACLE_BPE_MERGES = _bpe_oracle(8)


def bpe_encode_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE parity: learn 8 merges on the corpus, then apply them to
    the distinct-word table and report exact per-source token mass
    (ops.text.bpe_token_counts). Long words bypass BPE one-char-per-token;
    the oracle replays training AND encoding in one unrolled SQL chain."""
    from apollo_spark.ops.text import bpe_token_counts

    d = _t(spark, sf_dir, "documents")
    rules = [(r.left, r.right) for r in _bpe_merges(spark, sf_dir).orderBy("merge_rank").collect()]
    return bpe_token_counts(d, rules).orderBy("source")


def _bpe_encode_oracle(n_merges: int = 8, max_word_len: int = 24) -> str:
    return (
        _bpe_ctes(n_merges, max_word_len)
        + f""",
occ AS (
  SELECT source AS g, w, COUNT(*) AS n_occ FROM (
    SELECT source, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w FROM documents
  ) WHERE length(w) > 0 GROUP BY 1, 2
),
enc AS (
  SELECT w, CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS n_sym FROM w{n_merges}
)
SELECT g AS source,
       CAST(SUM(n_occ) AS BIGINT) AS n_words,
       CAST(SUM(n_occ * length(w)) AS BIGINT) AS n_chars,
       CAST(SUM(n_occ * COALESCE(n_sym, length(w))) AS BIGINT) AS n_bpe_tokens
FROM occ LEFT JOIN enc USING (w)
GROUP BY g ORDER BY source
"""
    )


ORACLE_BPE_ENCODE = _bpe_encode_oracle(8)


def simhash_doc_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document (xxhash64-based -> not reproducible in
    ANSI SQL; rows-only check)."""
    from apollo_spark.ops.dedup import simhash64

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", simhash64(F.col("text")).alias("simhash")).orderBy("doc_id")


# --------------------------------------------------------------------------
# corpus curation tier: sampling, ordering, decontamination, PII
# --------------------------------------------------------------------------


def corpus_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mix step: cap every source at 600 whitespace tokens in
    doc_id order (the crossing document is kept). One shuffle on source;
    per-source window — the 100 TB mix-building primitive."""
    from apollo_spark.ops.corpus import token_budget_sample

    d = _t(spark, sf_dir, "documents")
    return (
        token_budget_sample(d, budget_tokens=600, by="source", order_col="doc_id")
        .select("doc_id", "source", "n_tokens", "cum_tokens")
        .orderBy("doc_id")
    )


ORACLE_TOKEN_BUDGET = r"""
WITH toks AS (
  SELECT doc_id, source,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, source, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
  FROM toks
)
SELECT doc_id, source, n_tokens, cum_tokens
FROM cum WHERE cum_tokens - n_tokens < 600 ORDER BY doc_id
"""


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing (ops.corpus.pack_sequences):
    deterministic md5-ordered token tape, chunked into 512-token training
    sequences. Bucketed running sums (256-way parallel) + broadcast bucket
    offsets — NOT a single global window; exact BIGINT layout is
    reproduced by the oracle's windowed cumulative sums."""
    from apollo_spark.ops.corpus import pack_sequences

    d = _t(spark, sf_dir, "documents")
    return pack_sequences(d, seq_len=512).orderBy("doc_id")


def _packing_sql(source_rel: str, seq_len: int) -> str:
    """The pack_sequences oracle (CTEs + final select, no leading WITH) over
    an arbitrary (doc_id, text) relation — ONE definition shared by the
    standalone gate and the curation-pipeline composition so the layout
    arithmetic can never silently diverge between them."""
    return rf"""pk_base AS (
  SELECT doc_id,
         md5(CAST(doc_id AS VARCHAR)) AS h,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS b,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens
  FROM {source_rel}
),
pk_cum AS (
  SELECT doc_id, b, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY b ORDER BY h ASC, doc_id ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_in
  FROM pk_base
),
pk_boff AS (
  SELECT b, CAST(COALESCE(SUM(bt) OVER (ORDER BY b ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
  FROM (SELECT b, SUM(n_tokens) AS bt FROM pk_base GROUP BY b)
)
SELECT doc_id, n_tokens,
       off + cum_in - n_tokens AS start_pos,
       CAST(FLOOR((off + cum_in - n_tokens) / {seq_len}) AS BIGINT) AS seq_first,
       CAST(FLOOR((off + cum_in - 1) / {seq_len}) AS BIGINT) AS seq_last,
       (off + cum_in - n_tokens) % {seq_len} AS offset_in_seq
FROM pk_cum JOIN pk_boff USING (b)
WHERE n_tokens > 0
ORDER BY doc_id
"""


ORACLE_SEQ_PACKING = "WITH " + _packing_sql("documents", 512)


def source_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed source mixture (alpha=0.5, XLM-R style) over
    per-source token mass (ops.corpus.mixture_weights_temperature). The pow
    is one IEEE op on an exact integer; the normalizing sum rides
    DECIMAL(38,6) so it is order-independent in both engines."""
    from apollo_spark.ops.corpus import mixture_weights_temperature, whitespace_tokens

    d = _t(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.sum(F.size(whitespace_tokens(F.col("text"))).cast("long")).alias("group_tokens")
    )
    out = mixture_weights_temperature(per_src, alpha=0.5, by="source")
    return out.select(
        "source", "n_tokens", "smoothed_mass", F.round("weight", 6).alias("weight")
    ).orderBy("source")


ORACLE_TEMPERATURE_WEIGHTS = r"""
WITH t AS (
  SELECT source,
         CAST(SUM(CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT)) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
p AS (
  SELECT source, n_tokens,
         CAST(ROUND(pow(CAST(n_tokens AS DOUBLE), 0.5), 6) AS DECIMAL(38,6)) AS pm
  FROM t
)
SELECT source, n_tokens,
       CAST(pm AS DOUBLE) AS smoothed_mass,
       ROUND(CAST(pm AS DOUBLE) / CAST((SELECT SUM(pm) FROM p) AS DOUBLE), 6) AS weight
FROM p ORDER BY source
"""


def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation chain in one plan (ops.curation.curate): exact
    dedup -> en/quality/length filter -> 512-token sequence packing. Every
    stage is individually gated elsewhere; this entry gates their
    COMPOSITION — the oracle chains the same dedup, quality, and packing
    SQL over the intersected survivor set."""
    from apollo_spark.ops.curation import curate

    d = _t(spark, sf_dir, "documents")
    return curate(d, seq_len=512).orderBy("doc_id")


def _curation_oracle(seq_len: int = 512) -> str:
    dedup_ids = ORACLE_DEDUP_EXACT.strip().removesuffix("ORDER BY doc_id").strip()
    quality_q = ORACLE_QUALITY_FILTER.strip().removesuffix("ORDER BY doc_id").strip()
    return rf"""
WITH sel AS (
  SELECT doc_id FROM ({dedup_ids})
  INTERSECT
  SELECT doc_id FROM ({quality_q})
),
src AS (SELECT d.doc_id, d.text FROM documents d JOIN sel USING (doc_id)),
{_packing_sql("src", seq_len)}"""


ORACLE_CURATION = _curation_oracle(512)


def doc_nfc_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC cleanup (ops.text.nfc_normalize, Arrow-batched pandas
    UDF): per document, the digest of the canonically-composed text and
    whether normalization changed it. Python unicodedata and DuckDB's
    nfc_normalize implement the same UAX#15 tables, so the digests are
    hash-gateable — a rare oracle-able Python-row-path op."""
    from apollo_spark.ops.text import nfc_normalize

    d = _t(spark, sf_dir, "documents")
    norm = nfc_normalize(F.col("text"))
    return d.select(
        "doc_id",
        F.md5(norm).alias("nfc_md5"),
        (norm != F.col("text")).cast("int").alias("changed"),
        F.length(norm).alias("n_chars_nfc"),
    ).orderBy("doc_id")


ORACLE_NFC = """
SELECT doc_id, md5(nfc_normalize(text)) AS nfc_md5,
       CAST(nfc_normalize(text) <> text AS INT) AS changed,
       CAST(length(nfc_normalize(text)) AS INT) AS n_chars_nfc
FROM documents ORDER BY doc_id
"""


def training_order_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle: global rank by md5(doc_id) —
    reproducible pseudo-random order, executed as a range-partitioned
    distributed sort (no single-node ordering)."""
    from apollo_spark.ops.corpus import training_order

    d = _t(spark, sf_dir, "documents")
    return training_order(d, id_col="doc_id").select("doc_id", "shuffle_key", "train_rank").orderBy("train_rank")


ORACLE_TRAIN_ORDER = """
SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS shuffle_key,
       CAST(ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS BIGINT) AS train_rank
FROM documents ORDER BY train_rank
"""


def benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: documents sharing any word 4-gram with the
    'benchmark' slice (doc_id % 29 == 0 stands in for a held-out eval set).
    Benchmark grams broadcast (eval sets are tiny); corpus side is a narrow
    explode + broadcast join + one count shuffle."""
    from apollo_spark.ops.corpus import decontaminate

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 29 == 0)
    corpus = d.filter(F.col("doc_id") % 29 != 0)
    return (
        decontaminate(corpus, bench, id_col="doc_id", text_col="text", n=4)
        .withColumn("n_shared", F.col("n_shared").cast("long"))
        .orderBy("doc_id")
    )


ORACLE_DECONTAM = r"""
WITH words AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(w[i:i+3], ' ') AS g
  FROM words, LATERAL (SELECT unnest(range(1, len(w) - 2)) AS i) t(i)
  WHERE len(w) >= 4
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 29 = 0),
docg AS (SELECT DISTINCT doc_id, g FROM grams WHERE doc_id % 29 <> 0)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM docg JOIN bench USING (g) GROUP BY doc_id ORDER BY doc_id
"""


def contamination_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source contamination rate — the number a curation report leads
    with when an eval-leak scan comes back: for every source, total docs,
    docs sharing any word 4-gram with the benchmark slice (the
    benchmark_decontamination config), and the contaminated fraction.
    Composes the certified decontaminate op with one groupBy; the fraction
    is a single division of exact counts."""
    from apollo_spark.ops.corpus import decontaminate

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 29 == 0)
    corpus = d.filter(F.col("doc_id") % 29 != 0)
    hits = decontaminate(corpus, bench, id_col="doc_id", text_col="text", n=4).select(
        "doc_id", F.lit(True).alias("__hit")
    )
    return (
        corpus.select("doc_id", "source")
        .join(hits, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("__hit"), 1).otherwise(0)).cast("long").alias("n_contaminated"),
        )
        .select(
            "source",
            "n_docs",
            "n_contaminated",
            (F.col("n_contaminated").cast("double") / F.col("n_docs").cast("double")).alias(
                "contaminated_frac"
            ),
        )
        .orderBy("source")
    )


ORACLE_CONTAMINATION_BY_SOURCE = r"""
WITH words AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(w[i:i+3], ' ') AS g
  FROM words, LATERAL (SELECT unnest(range(1, len(w) - 2)) AS i) t(i)
  WHERE len(w) >= 4
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 29 = 0),
docg AS (SELECT DISTINCT doc_id, g FROM grams WHERE doc_id % 29 <> 0),
hits AS (SELECT DISTINCT doc_id FROM docg JOIN bench USING (g))
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       CAST(SUM(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS contaminated_frac
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % 29 <> 0
GROUP BY d.source
ORDER BY d.source
"""


def pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect + redact over a derived column that plants synthetic PII
    (the corpus itself is clean, so the plant makes the gate non-trivial):
    per-source totals of emails/IPs/phones found plus scrubbed length delta.
    All JVM regexp_count/regexp_replace — no Python in the row path."""
    from apollo_spark.ops.text import pii_counts, pii_scrub

    d = _t(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 tel +1 555-01"),
        F.format_string("%02d", (F.col("doc_id") % 100).cast("int")),
    )
    counts = pii_counts(planted)
    return (
        d.withColumn("__p", planted)
        .select(
            "source",
            counts["email"].alias("__e"),
            counts["ipv4"].alias("__i"),
            counts["phone"].alias("__ph"),
            (F.length("__p") - F.length(pii_scrub(F.col("__p")))).alias("__delta"),
        )
        .groupBy("source")
        .agg(
            F.sum("__e").alias("n_emails"),
            F.sum("__i").alias("n_ips"),
            F.sum("__ph").alias("n_phones"),
            F.sum("__delta").alias("redacted_chars"),
        )
        .orderBy("source")
    )


ORACLE_PII = r"""
WITH planted AS (
  SELECT source,
         text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or 10.0.'
              || CAST(doc_id % 256 AS VARCHAR) || '.7 tel +1 555-01' || format('{:02d}', doc_id % 100) AS p
  FROM documents
),
scored AS (
  SELECT source,
         len(regexp_extract_all(p, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS e,
         len(regexp_extract_all(p, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS i,
         len(regexp_extract_all(p, '\+?\d[\d\- ]{7,}\d')) AS ph,
         length(p) - length(
           regexp_replace(
             regexp_replace(
               regexp_replace(p, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g'),
             '\+?\d[\d\- ]{7,}\d', '<PHONE>', 'g')
         ) AS delta
  FROM planted
)
SELECT source, CAST(SUM(e) AS BIGINT) AS n_emails, CAST(SUM(i) AS BIGINT) AS n_ips,
       CAST(SUM(ph) AS BIGINT) AS n_phones, CAST(SUM(delta) AS BIGINT) AS redacted_chars
FROM scored GROUP BY source ORDER BY source
"""


def embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of every embedding: per-vector min/max +
    an md5 digest of the code array (digest instead of the raw array so the
    hash compare is engine-portable). Narrow map, no shuffle; floor(x+0.5)
    rounding because round() tie behavior differs across engines."""
    from apollo_spark.ops.similarity import quantize_int8

    e = _t(spark, sf_dir, "embeddings")
    q = quantize_int8(e, id_col="vec_id", vec_col="embedding")
    return q.select(
        "vec_id",
        "vmin",
        "vmax",
        F.md5(F.concat_ws(",", F.transform(F.col("codes"), lambda c: c.cast("string")))).alias(
            "code_digest"
        ),
    ).orderBy("vec_id")


ORACLE_QUANT = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv FROM embeddings
),
s AS (
  SELECT vec_id, vv, list_min(vv) AS vmin, list_max(vv) AS vmax FROM v
)
SELECT vec_id, vmin, vmax,
       md5(array_to_string(
         CASE WHEN vmax = vmin THEN list_transform(vv, x -> 0)
              ELSE list_transform(vv, x -> CAST(FLOOR((x - vmin) / ((vmax - vmin) / 255.0) + 0.5) AS INT))
         END, ',')) AS code_digest
FROM s ORDER BY vec_id
"""


def stratified_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible per-source sampling: keep a doc iff its Knuth hash
    bucket falls under the source's rate (src0 60%, src1 10%, default 30%).
    Membership is a pure function of doc_id — stable across reruns,
    partitionings, and engines; a narrow filter with no shuffle or RNG."""
    from apollo_spark.ops.corpus import stratified_hash_sample

    d = _t(spark, sf_dir, "documents")
    return (
        stratified_hash_sample(d, rates={"src0": 60, "src1": 10}, by="source", id_col="doc_id")
        .select("doc_id", "source", "bucket")
        .orderBy("doc_id")
    )


ORACLE_STRAT_SAMPLE = """
WITH b AS (
  SELECT doc_id, source, (doc_id * 2654435761) % 100 AS bucket FROM documents
)
SELECT doc_id, source, bucket FROM b
WHERE bucket < CASE source WHEN 'src0' THEN 60 WHEN 'src1' THEN 10 ELSE 30 END
ORDER BY doc_id
"""


def semantic_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: cluster, then greedily keep the
    lowest-id representative of every >=0.93-cosine group inside each
    cluster. k-means makes it non-SQL-expressible -> rows-only gate; the
    planted-duplicate behavior is pinned in tests/test_ops.py. n_clusters is
    auto-derived (k = max(16, ceil(N/250))) so the per-cluster prune stays
    linear in corpus size — SemDeDup's own k-grows-with-N blocking."""
    from apollo_spark.ops.similarity import semantic_dedup

    e = _t(spark, sf_dir, "embeddings")
    return semantic_dedup(e, threshold=0.93).orderBy("vec_id")


# --------------------------------------------------------------------------
# additional TPC-H-shaped relational queries
# --------------------------------------------------------------------------


def shipping_delay_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q12-shaped: bucket order->ship delay into 30-day bands, conditional
    counts of high- vs low-priority orders per band. One fact-fact join on
    orderkey + one agg shuffle."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    delay = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .filter(delay >= 0)
        .withColumn("delay_band", F.floor(delay / 30).cast("long"))
        .groupBy("delay_band")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_lines"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_priority_lines"),
        )
        .orderBy("delay_band")
    )


ORACLE_SHIPMODE = """
SELECT CAST(FLOOR(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) / 30.0) AS BIGINT) AS delay_band,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_lines,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_priority_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) >= 0
GROUP BY 1 ORDER BY delay_band
"""


def part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q11-shaped: parts whose revenue exceeds 1/1400 of total revenue.
    Both the per-part and the global sum accumulate in decimal from base
    rows (order-independent), so the threshold compare is deterministic;
    the one-row global side is a broadcast cross join."""
    l = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = l.groupBy("l_partkey").agg(dsum(rev).alias("value"))
    total = l.agg(dsum(rev).alias("__total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") * 1400 > F.col("__total"))
        .select("l_partkey", "value")
        .orderBy(F.col("value").desc(), F.col("l_partkey").asc())
    )


ORACLE_PART_CONC = """
WITH per_part AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS value
  FROM lineitem GROUP BY l_partkey
),
total AS (
  SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS t
  FROM lineitem
)
SELECT l_partkey, value FROM per_part, total
WHERE value * 1400 > t ORDER BY value DESC, l_partkey ASC
"""


def late_delivery_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q21-shaped semi+anti combo: suppliers that shipped > 60 days after
    the order date on a multi-supplier order where NO other supplier was
    late — the classic 'who alone held up the order' scan. Three passes over
    lineitem keyed on l_orderkey (co-partitioned shuffles) + broadcast
    supplier dim."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    s = _t(spark, sf_dir, "supplier")
    delay = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    # `late` feeds three consumers (semi-join probe, anti-join build, and
    # as the driving side) — persist so the lineitem-orders join + distinct
    # runs once, not three times (guide §5)
    late = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .filter(delay > 60)
        .select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk"))
        .distinct()
        .persist()
    )
    all_pairs = l.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk")).distinct()
    other_exists = late.alias("x").join(
        all_pairs.alias("y"),
        (F.col("x.ok") == F.col("y.ok")) & (F.col("x.sk") != F.col("y.sk")),
        "left_semi",
    )
    no_other_late = other_exists.alias("x").join(
        late.alias("z"),
        (F.col("x.ok") == F.col("z.ok")) & (F.col("x.sk") != F.col("z.sk")),
        "left_anti",
    )
    return scoped_persist(
        no_other_late.groupBy("sk")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(s), F.col("sk") == s["s_suppkey"])
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20),
        late,
    )


ORACLE_LATE_SUPP = """
WITH late AS (
  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 60
),
all_pairs AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
sole AS (
  SELECT x.ok, x.sk FROM late x
  WHERE EXISTS (SELECT 1 FROM all_pairs y WHERE y.ok = x.ok AND y.sk <> x.sk)
    AND NOT EXISTS (SELECT 1 FROM late z WHERE z.ok = x.ok AND z.sk <> x.sk)
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM sole JOIN supplier ON sk = s_suppkey
GROUP BY s_name ORDER BY numwait DESC, s_name ASC LIMIT 20
"""


def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q8-shaped market share: per order-year, the fraction of ASIA-region
    revenue supplied by NATION_3's suppliers. 6-way join — every dim side
    broadcasts, lineitem-orders co-shuffle on orderkey; numerator/denominator
    both decimal-exact conditional sums so the ratio is deterministic."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    cust_region = (
        c.join(F.broadcast(n.withColumnRenamed("n_nationkey", "__ck")), c["c_nationkey"] == F.col("__ck"))
        .join(F.broadcast(r), F.col("n_regionkey") == r["r_regionkey"])
        .filter(F.col("r_name") == "ASIA")
        .select(F.col("c_custkey").alias("__cust"))
    )
    supp_nation = s.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("__sk"), F.col("n_name").alias("supp_nation"))),
        s["s_nationkey"] == F.col("__sk"),
    ).select(F.col("s_suppkey").alias("__supp"), "supp_nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(cust_region, o["o_custkey"] == F.col("__cust"))  # ASIA customers only
        .join(F.broadcast(supp_nation), l["l_suppkey"] == F.col("__supp"))
        .withColumn("o_year", F.year(F.to_date("o_orderdate")).cast("long"))
    )
    target = F.when(F.col("supp_nation") == "NATION_3", rev.cast("decimal(38,6)")).otherwise(
        F.lit(0).cast("decimal(38,6)")
    )
    return (
        base.groupBy("o_year")
        .agg(
            F.sum(target).cast("double").alias("nation_revenue"),
            dsum(rev).alias("total_revenue"),
        )
        .withColumn("mkt_share", F.col("nation_revenue") / F.col("total_revenue"))
        .orderBy("o_year")
    )


ORACLE_MKT_SHARE = """
WITH base AS (
  SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount) AS rev, n2.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN CAST(rev AS DECIMAL(38,6)) ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) AS nation_revenue,
       CAST(SUM(CAST(rev AS DECIMAL(38,6))) AS DOUBLE) AS total_revenue,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN CAST(rev AS DECIMAL(38,6)) ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
         / CAST(SUM(CAST(rev AS DECIMAL(38,6))) AS DOUBLE) AS mkt_share
FROM base GROUP BY o_year ORDER BY o_year
"""


def top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q15-shaped: suppliers whose total revenue equals the global maximum.
    The max is a scalar aggregate broadcast back with a crossJoin (the same
    shape every other scalar in this file uses) — distributed partial max,
    no single-partition window over the per-supplier frame; equality is
    exact because both sides are the same decimal-derived doubles."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_supp = l.groupBy("l_suppkey").agg(dsum(rev).alias("total_revenue"))
    mx = per_supp.agg(F.max("total_revenue").alias("__max"))
    return (
        per_supp.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__max"))
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


ORACLE_TOP_SUPP = """
WITH per_supp AS (
  SELECT l_suppkey, CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS total_revenue
  FROM lineitem GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM per_supp)
ORDER BY s_suppkey
"""


def substring_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact-duplicate scan (Lee et al. 2022 ExactSubstr): per-doc
    count/fraction of 8-token windows that occur >= 2 times corpus-wide.
    Two bounded shuffles (global window counts + many-to-one positions join);
    dup_frac is a BIGINT/BIGINT IEEE division — engine-exact."""
    from apollo_spark.ops.dedup import duplicated_spans

    d = _t(spark, sf_dir, "documents")
    res = duplicated_spans(d, w=8, min_count=2)
    return carry_caches(res.filter(F.col("n_dup_windows") > 0).orderBy("doc_id"), res)


ORACLE_SPAN_DEDUP = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
  FROM documents WHERE length(trim(text)) > 0
),
pos AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t) - 7)) AS i
  FROM toks WHERE len(t) >= 8
),
wins AS (SELECT doc_id, array_to_string(t[i:i+7], ' ') AS win FROM pos),
counts AS (SELECT win, COUNT(*) AS c FROM wins GROUP BY win)
SELECT doc_id,
       COUNT(*) AS n_windows,
       CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
       CAST(CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS dup_frac
FROM wins JOIN counts USING (win)
GROUP BY doc_id
HAVING CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) > 0
ORDER BY doc_id
"""


def doc_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality score: add-one unigram LM trained on the
    doc_id % 7 == 0 slice (stand-in for the curated target domain), every
    document scored by per-token cross-entropy in nats. Reference LM
    broadcasts; corpus side is one explode + map-side join + one agg."""
    from apollo_spark.ops.text import lm_cross_entropy

    d = _t(spark, sf_dir, "documents")
    ref = d.filter(F.col("doc_id") % 7 == 0)
    return lm_cross_entropy(d, ref).orderBy("doc_id")


ORACLE_LM_QUALITY = r"""
WITH ref AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
  FROM documents WHERE doc_id % 7 = 0 AND length(trim(text)) > 0
),
counts AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM ref GROUP BY term),
scal AS (
  SELECT CAST(SUM(c) AS BIGINT) AS t_ref, CAST(COUNT(*) AS BIGINT) AS v_ref
  FROM counts
),
toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
  FROM documents WHERE length(trim(text)) > 0
)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       -CAST(SUM(CAST(ln((COALESCE(c, 0) + 1) / (t_ref + v_ref + 1)) AS DECIMAL(38,6))) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS ce
FROM toks LEFT JOIN counts USING (term) CROSS JOIN scal
GROUP BY doc_id
ORDER BY doc_id
"""


def doc_bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KenLM-shaped CCNet filter: interpolated BIGRAM-LM cross-entropy
    (ops.text.bigram_cross_entropy, lam=0.7 Jelinek-Mercer over an add-one
    unigram floor), trained on the doc_id % 7 == 0 slice. Ref n-gram
    tables broadcast; corpus side is one bigram explode + map-side joins
    + one agg."""
    from apollo_spark.ops.text import bigram_cross_entropy

    d = _t(spark, sf_dir, "documents")
    ref = d.filter(F.col("doc_id") % 7 == 0)
    out = bigram_cross_entropy(d, ref, lam=0.7)
    return out.select("doc_id", "n_bigrams", F.round("ce2", 6).alias("ce2")).orderBy("doc_id")


ORACLE_BIGRAM_LM = r"""
WITH base AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
  FROM documents WHERE length(trim(text)) > 0
),
ref_uni AS (
  SELECT unnest(t) AS term FROM base WHERE doc_id % 7 = 0
),
counts AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM ref_uni GROUP BY term),
scal AS (
  SELECT CAST(SUM(c) AS BIGINT) AS t_ref, CAST(COUNT(*) AS BIGINT) AS v_ref FROM counts
),
ref_bi AS (
  SELECT t[i] AS w1, t[i+1] AS w2, CAST(COUNT(*) AS BIGINT) AS cb
  FROM base, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) s(i)
  WHERE doc_id % 7 = 0 AND len(t) >= 2
  GROUP BY 1, 2
),
toks AS (
  SELECT doc_id, t[i] AS w1, t[i+1] AS w2
  FROM base, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) s(i)
  WHERE len(t) >= 2
),
terms AS (
  SELECT doc_id,
         ln(0.7 * (CASE WHEN cu.c > 0 THEN COALESCE(cb, 0) / cu.c ELSE 0.0 END)
            + (1.0 - 0.7) * ((COALESCE(c2.c, 0) + 1) / (t_ref + v_ref + 1))) AS lp
  FROM toks
  LEFT JOIN ref_bi USING (w1, w2)
  LEFT JOIN counts cu ON cu.term = toks.w1
  LEFT JOIN counts c2 ON c2.term = toks.w2
  CROSS JOIN scal
)
SELECT doc_id, COUNT(*) AS n_bigrams,
       ROUND(-CAST(SUM(CAST(lp AS DECIMAL(38,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS ce2
FROM terms GROUP BY doc_id ORDER BY doc_id
"""


def skipgram_training_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec skip-gram data prep (ops.corpus.skipgram_pairs): hash-
    deterministic frequent-word subsampling -> re-compacted stream ->
    (center, context) pairs within ±2 via offset-explode equi-join (no
    theta-join), top-30 pair counts. The whole pipeline — subsample
    randomness included — replays bit-for-bit in SQL."""
    from apollo_spark.ops.corpus import skipgram_pairs

    d = _t(spark, sf_dir, "documents")
    out = skipgram_pairs(d, window=2, subsample_t=1e-3)
    return out.orderBy(F.col("n").desc(), "center", "context").limit(30)


ORACLE_SKIPGRAM = r"""
WITH base AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
  FROM documents WHERE length(trim(text)) > 0
),
toks AS (
  SELECT doc_id, i - 1 AS pos, t[i] AS w
  FROM base, LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) s(i)
),
freq AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY w),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t_all FROM freq),
kept0 AS (
  SELECT doc_id, pos, w
  FROM toks JOIN freq USING (w) CROSS JOIN tot
  WHERE ('0x' || substr(md5('sg' || doc_id || ':' || pos || ':' || w), 1, 15))::BIGINT
          / 1152921504606846976.0
        < (sqrt((c / t_all) / 0.001) + 1.0) * (0.001 / (c / t_all))
),
kept AS (
  SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos ASC) - 1 AS p, w
  FROM kept0
)
SELECT a.w AS center, b.w AS context, CAST(COUNT(*) AS BIGINT) AS n
FROM kept a JOIN kept b
  ON a.doc_id = b.doc_id AND abs(a.p - b.p) BETWEEN 1 AND 2
GROUP BY 1, 2
ORDER BY n DESC, center, context
LIMIT 30
"""


def doc_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition-filter signals (Rae et al. 2021 Table A1): per-doc
    duplicate-segment fraction + top-bigram/trigram token shares. Integer-
    ratio divisions only — engine-exact."""
    from apollo_spark.ops.text import gopher_repetition

    d = _t(spark, sf_dir, "documents")
    return gopher_repetition(d).orderBy("doc_id")


ORACLE_GOPHER_REP = r"""
WITH base AS (SELECT doc_id, text FROM documents WHERE length(trim(text)) > 0),
segs AS (SELECT doc_id, unnest(string_split(text, '. ')) AS seg FROM base),
seg_stats AS (
  SELECT doc_id, COUNT(*) AS n_segments, COUNT(DISTINCT seg) AS n_distinct
  FROM segs GROUP BY doc_id
),
toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM base
),
pos2 AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
  FROM toks WHERE len(t) >= 2
),
c2 AS (
  SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g, COUNT(*) AS c
  FROM pos2 GROUP BY 1, 2
),
t2 AS (
  SELECT doc_id, CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top2_frac
  FROM c2 GROUP BY doc_id
),
pos3 AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
  FROM toks WHERE len(t) >= 3
),
c3 AS (
  SELECT doc_id, array_to_string(t[i:i+2], ' ') AS g, COUNT(*) AS c
  FROM pos3 GROUP BY 1, 2
),
t3 AS (
  SELECT doc_id, CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top3_frac
  FROM c3 GROUP BY doc_id
)
SELECT doc_id, n_segments,
       CAST(n_segments - n_distinct AS DOUBLE) / CAST(n_segments AS DOUBLE) AS dup_seg_frac,
       COALESCE(top2_frac, 0.0) AS top2_frac,
       COALESCE(top3_frac, 0.0) AS top3_frac
FROM seg_stats LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id)
ORDER BY doc_id
"""


def ccnet_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet head/middle/tail partition: documents terciled by unigram-LM
    cross-entropy against the doc_id%7==0 reference slice. The tercile is a
    distributed two-phase rank (ops.rank.bucketed_ntile: range-bucket on ce,
    per-bucket window + broadcast offsets) — bit-identical to a global
    NTILE(3) window but never a corpus-sized single task. Fully
    deterministic order (ce, doc_id) keeps both engines' tile assignment
    identical."""
    from apollo_spark.ops.rank import bucketed_ntile
    from apollo_spark.ops.text import lm_cross_entropy

    d = _t(spark, sf_dir, "documents")
    scored = lm_cross_entropy(d, d.filter(F.col("doc_id") % 7 == 0))
    lab = (
        F.when(F.col("nt") == 1, "head").when(F.col("nt") == 2, "middle").otherwise("tail")
    )
    nt = bucketed_ntile(
        scored, F.col("ce"), 3, tiebreak=[F.col("doc_id").asc()], out_col="nt"
    )
    return carry_caches(
        nt.withColumn("bucket", lab)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("ce").alias("min_ce"),
            F.max("ce").alias("max_ce"),
        )
        .orderBy("bucket"),
        nt,
    )


ORACLE_CCNET_BUCKETS = r"""
WITH ref AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
  FROM documents WHERE doc_id % 7 = 0 AND length(trim(text)) > 0
),
counts AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM ref GROUP BY term),
scal AS (
  SELECT CAST(SUM(c) AS BIGINT) AS t_ref, CAST(COUNT(*) AS BIGINT) AS v_ref
  FROM counts
),
toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
  FROM documents WHERE length(trim(text)) > 0
),
scored AS (
  SELECT doc_id,
         COUNT(*) AS n_tokens,
         -CAST(SUM(CAST(ln((COALESCE(c, 0) + 1) / (t_ref + v_ref + 1)) AS DECIMAL(38,6))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS ce
  FROM toks LEFT JOIN counts USING (term) CROSS JOIN scal
  GROUP BY doc_id
),
b AS (SELECT *, NTILE(3) OVER (ORDER BY ce, doc_id) AS nt FROM scored)
SELECT CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       MIN(ce) AS min_ce,
       MAX(ce) AS max_ce
FROM b GROUP BY bucket ORDER BY bucket
"""


