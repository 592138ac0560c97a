"""Round-6/7 waves: linkage, web curation, mining, privacy, blocking evaluation, EVM raw surface + cross-chain DSL.

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
from apollo_spark.queries._shared import _events, _t
from apollo_spark.queries.text_dedup import knn_bruteforce
from apollo_spark.queries.corpus import SEMDEDUP_K_SQL, _doc_components, _lattice_common_ctes, knn_ivf_lattice_approx, semdedup_k


# round 6: linkage + web-curation tier
# --------------------------------------------------------------------------


def _entity_pairs(spark: SparkSession, sf_dir: str):
    """Shared SymSpell candidate-pair table over the planted-twin customer
    entity strings, consumed by fuzzy_entity_dup_pairs AND
    entity_golden_records. Artifact-routed like _doc_components /
    _trained_langid_preds: with APOLLO_SPARK_ARTIFACT_DIR set the
    deletion-neighborhood join is paid once per corpus and committed as a
    TxTable; unset, each query builds self-contained for its oracle.
    Returns (base_entities, pairs)."""
    import os as _os

    from apollo_spark.ops.linkage import fuzzy_dup_pairs

    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.md5(F.col("c_custkey").cast("string")).alias("s")
    )
    planted = c.filter(F.pmod("id", F.lit(3)) == 0).select(
        (F.col("id") + F.lit(10_000_000)).alias("id"),
        F.concat(
            F.expr("substr(s, 1, pmod(id, length(s)))"),
            F.expr("substr(s, pmod(id, length(s)) + 2, length(s) - pmod(id, length(s)) - 1)"),
        ).alias("s"),
    )
    base = c.unionByName(planted)

    def build() -> DataFrame:
        return fuzzy_dup_pairs(base, "id", "s").select(
            "id_a", "id_b", F.col("dist").cast("int").alias("dist")
        )

    art = _os.environ.get("APOLLO_SPARK_ARTIFACT_DIR")
    if art:
        from apollo_spark.table_format import train_or_load_table

        tag = sf_dir.strip("/").replace("/", "_")
        return base, train_or_load_table(spark, f"{art}/entity_pairs_{tag}", build)
    return base, build()


def fuzzy_entity_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution without a cross product (ops.linkage.fuzzy_dup_pairs):
    SymSpell deletion-neighborhood candidate generation — strings within
    Levenshtein distance 1 necessarily share a deletion-1 variant, so one
    keyed equality join on variants finds every candidate and only
    candidates pay the exact levenshtein() re-score. Entity strings are
    md5(c_custkey) hexes (one UNIQUE sparse string per customer) with a
    planted distance-1 twin for every 3rd row (one char deleted at an
    id-keyed position), so the matcher provably fires at every SF while
    candidate groups stay bounded (linear growth). The driver tables'
    natural string columns are both measured worst cases and deliberately
    avoided: consecutive customer names saturate the numeric keyspace
    (deletion-variant groups grow with density — 236 s at sf1, 82x at 10x
    data, round-6 adjudication) and part names have only 64 distinct values
    (every same-name pair is a distance-0 hit: output itself quadratic).
    Sparse near-unique strings are the workload a fuzzy joiner exists for;
    data this hot belongs to exact_dedup's hash-groupBy instead."""
    _, pairs = _entity_pairs(spark, sf_dir)
    return pairs.orderBy("id_a", "id_b")


ORACLE_FUZZY_NAME_PAIRS = r"""
WITH c AS (SELECT c_custkey AS id, md5(CAST(c_custkey AS VARCHAR)) AS s FROM customer),
planted AS (
  SELECT id + 10000000 AS id,
         concat(substr(s, 1, id % length(s)),
                substr(s, id % length(s) + 2, length(s) - id % length(s) - 1)) AS s
  FROM c WHERE id % 3 = 0
),
base AS (SELECT * FROM c UNION ALL SELECT * FROM planted),
v AS (
  SELECT id, s,
         unnest(list_distinct(list_prepend(s,
           list_transform(generate_series(1, length(s)),
             i -> concat(substr(s, 1, i-1), substr(s, i+1, length(s)-i)))))) AS v
  FROM base
),
cand AS (
  SELECT DISTINCT a.id AS id_a, a.s AS s_a, b.id AS id_b, b.s AS s_b
  FROM v a JOIN v b USING (v) WHERE a.id < b.id
)
SELECT id_a, id_b, CAST(levenshtein(s_a, s_b) AS INT) AS dist
FROM cand WHERE levenshtein(s_a, s_b) <= 1
ORDER BY id_a, id_b
"""


_URL_SYNTH_SPARK = """
CASE pmod(doc_id, 5)
  WHEN 0 THEN concat('http://www.', source, '.example.com/page/', cast(pmod(doc_id, 40) as string))
  WHEN 1 THEN concat('HTTP://WWW.', upper(source), '.EXAMPLE.COM/page/', cast(pmod(doc_id, 40) as string), '/')
  WHEN 2 THEN concat('http://www.', source, '.example.com:80/page/', cast(pmod(doc_id, 40) as string), '?utm_source=feed')
  WHEN 3 THEN concat('http://www.', source, '.example.com/page/', cast(pmod(doc_id, 40) as string), '?b=2&a=1#frag')
  ELSE concat('http://www.', source, '.example.com/page/', cast(pmod(doc_id, 40) as string), '?a=1&b=2&gclid=xyz')
END
"""


def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier URL dedup (ops.web.url_dup_groups): the same page
    arrives as http/HTTP, with :80, with utm_*/gclid tracking params, with
    param-order shuffles, fragments, and trailing slashes — canonicalization
    must collapse all of them WITHOUT merging genuinely different URLs
    (different ?a=1&b=2 payloads stay distinct). The corpus has no URL
    column, so one deterministic CASE synthesizes five raw variants per
    (source, page) — replayed verbatim by the oracle — and the group stats
    certify the whole expression chain cross-engine."""
    from apollo_spark.ops.web import url_dup_groups

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.expr(_URL_SYNTH_SPARK.strip()).alias("url")
    )
    return (
        url_dup_groups(d, url_col="url", id_col="doc_id")
        .select("canonical_url", "n_docs", "n_raw_forms", "keep_id")
        .orderBy("canonical_url")
    )


ORACLE_URL_CANONICAL_DEDUP = r"""
WITH d AS (
  SELECT doc_id, source,
    CASE doc_id % 5
      WHEN 0 THEN concat('http://www.', source, '.example.com/page/', CAST(doc_id % 40 AS VARCHAR))
      WHEN 1 THEN concat('HTTP://WWW.', upper(source), '.EXAMPLE.COM/page/', CAST(doc_id % 40 AS VARCHAR), '/')
      WHEN 2 THEN concat('http://www.', source, '.example.com:80/page/', CAST(doc_id % 40 AS VARCHAR), '?utm_source=feed')
      WHEN 3 THEN concat('http://www.', source, '.example.com/page/', CAST(doc_id % 40 AS VARCHAR), '?b=2&a=1#frag')
      ELSE concat('http://www.', source, '.example.com/page/', CAST(doc_id % 40 AS VARCHAR), '?a=1&b=2&gclid=xyz')
    END AS url
  FROM documents
),
p AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
         lower(regexp_extract(regexp_replace(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1), '^[^@]*@', ''), '^([^:]+)', 1)) AS host,
         regexp_extract(regexp_replace(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1), '^[^@]*@', ''), ':([0-9]+)$', 1) AS port,
         regexp_replace(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1), '/+$', '') AS path,
         list_sort(list_filter(string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
                   x -> len(x) > 0 AND NOT regexp_matches(x, '^(utm_[A-Za-z0-9_]*|fbclid|gclid)='))) AS kept
  FROM d
),
c AS (
  SELECT doc_id, url,
         concat(scheme, '://', host,
                CASE WHEN port = '' OR (scheme = 'http' AND port = '80') OR (scheme = 'https' AND port = '443')
                     THEN '' ELSE concat(':', port) END,
                path,
                CASE WHEN len(kept) = 0 THEN '' ELSE concat('?', array_to_string(kept, '&')) END) AS canonical_url
  FROM p WHERE scheme != '' AND host != ''
)
SELECT canonical_url,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw_forms,
       MIN(doc_id) AS keep_id
FROM c
GROUP BY canonical_url HAVING COUNT(*) >= 2
ORDER BY canonical_url
"""


_HOST_SYNTH_SPARK = """
CASE pmod(doc_id, 4)
  WHEN 0 THEN concat('www.', source, '.com')
  WHEN 1 THEN concat('cdn.', source, '.com')
  WHEN 2 THEN 'ads.tracker.net'
  ELSE concat(source, '.org')
END
"""

_BLOCKLIST = ["src1.com", "tracker.net"]


def blocked_domain_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist curation by domain SUFFIX (ops.web.domain_suffix_filter):
    blocking src1.com must drop www.src1.com and cdn.src1.com but NOT
    src1.org; blocking tracker.net drops ads.tracker.net. The host explodes
    into its dot-suffixes and ONE keyed equality join against the blocklist
    decides every host — no per-row regex scan, so the blocklist can hold a
    million domains at the cost of a hash join. Hosts synthesized
    deterministically (no host column in the corpus); per-source keep/total
    counts certify the suffix semantics cross-engine."""
    from apollo_spark.ops.web import domain_suffix_filter

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.expr(_HOST_SYNTH_SPARK.strip()).alias("host")
    )
    blocked = spark.createDataFrame([(b,) for b in _BLOCKLIST], "domain string")
    kept = domain_suffix_filter(d, blocked, host_col="host")
    totals = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    kept_counts = kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))
    return (
        totals.join(kept_counts, "source", "left")
        .select(
            "source",
            "n_total",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
        .orderBy("source")
    )


ORACLE_BLOCKED_DOMAIN_FILTER = r"""
WITH d AS (
  SELECT doc_id, source,
    CASE doc_id % 4
      WHEN 0 THEN concat('www.', source, '.com')
      WHEN 1 THEN concat('cdn.', source, '.com')
      WHEN 2 THEN 'ads.tracker.net'
      ELSE concat(source, '.org')
    END AS host
  FROM documents
),
hosts AS (SELECT DISTINCT host FROM d),
sfx AS (
  SELECT host,
         unnest(list_transform(generate_series(1, len(string_split(host, '.'))),
           i -> array_to_string(list_slice(string_split(host, '.'), i, len(string_split(host, '.'))), '.'))) AS s
  FROM hosts
),
bad AS (SELECT DISTINCT host FROM sfx WHERE s IN ('src1.com', 'tracker.net'))
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN host IN (SELECT host FROM bad) THEN 0 ELSE 1 END) AS BIGINT) AS n_kept
FROM d GROUP BY source ORDER BY source
"""


def corpus_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-look corpus health report a curation run starts from: per
    source — document count, whitespace-token volume, distinct languages,
    exact-duplicate rate (1 - distinct text hashes / docs), and mean
    document length. Pure aggregate expressions (one groupBy shuffle), every
    component an exact integer or a single final division, so the report
    hash-gates cross-engine."""
    d = _t(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim("text"), r"[ \t\n\f\r]+")).cast("long")
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(toks).alias("n_tokens"),
            F.countDistinct("lang").alias("n_langs"),
            F.countDistinct(F.md5("text")).alias("n_unique_texts"),
            F.sum("n_chars").alias("total_chars"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_langs",
            (F.lit(1.0) - F.col("n_unique_texts").cast("double") / F.col("n_docs").cast("double")).alias("exact_dup_rate"),
            (F.col("total_chars").cast("double") / F.col("n_docs").cast("double")).alias("mean_chars"),
        )
        .orderBy("source")
    )


ORACLE_CORPUS_QUALITY_REPORT = r"""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split_regex(trim(text), '[ \t\n\f\r]+'))) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS exact_dup_rate,
       CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_chars
FROM documents GROUP BY source ORDER BY source
"""


def doc_mojibake_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-corruption repair (ops.text.fix_mojibake): the scraper
    classic — UTF-8 bytes mis-decoded as cp1252 turn 'café' into 'cafÃ©'
    and RIGHT SINGLE QUOTE into 'â€™'; the repair chain must restore the
    original so a mojibake'd re-crawl hashes identically to its clean twin
    (run BEFORE dedup). The corpus is ASCII-clean, so the query plants
    deterministic corruptions (doc_id-keyed CASE, replayed by the oracle
    via chr() literals — no encoding ambiguity in the SQL text) and
    certifies repaired-doc counts, chars saved, and distinct fixed hashes
    per source."""
    from apollo_spark.ops.text import _sloppy_cp1252, fix_mojibake

    m = {c: _sloppy_cp1252(c.encode("utf-8")) for c in "é’°“”"}
    d = _t(spark, sf_dir, "documents")
    corrupted = (
        F.when(F.pmod("doc_id", F.lit(4)) == 0, F.concat(F.lit("caf" + m["é"] + " "), F.col("text")))
        .when(
            F.pmod("doc_id", F.lit(4)) == 1,
            F.concat(F.lit("it" + m["’"] + "s "), F.col("text"), F.lit(" 20" + m["°"] + "C")),
        )
        .when(
            F.pmod("doc_id", F.lit(4)) == 2,
            F.concat(F.lit(m["“"]), F.col("text"), F.lit(m["”"])),
        )
        .otherwise(F.col("text"))
    )
    base = d.select("doc_id", "source", corrupted.alias("raw"))
    fixed = base.withColumn("fixed", fix_mojibake(F.col("raw")))
    return (
        fixed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("fixed") != F.col("raw")).cast("long")).alias("n_repaired_docs"),
            F.sum(F.length("raw") - F.length("fixed")).alias("chars_saved"),
            F.countDistinct(F.md5("fixed")).alias("n_distinct_fixed"),
        )
        .orderBy("source")
    )


def _mojibake_oracle() -> str:
    from apollo_spark.ops.text import _sloppy_cp1252, mojibake_oracle_expr

    def lit(s: str) -> str:
        return " || ".join(f"chr({ord(ch)})" for ch in s)

    m = {c: _sloppy_cp1252(c.encode("utf-8")) for c in "é’°“”"}
    fix = mojibake_oracle_expr("raw")
    return f"""
WITH base AS (
  SELECT doc_id, source,
    CASE doc_id % 4
      WHEN 0 THEN concat('caf' || {lit(m["é"])} || ' ', text)
      WHEN 1 THEN concat('it' || {lit(m["’"])} || 's ', text, ' 20' || {lit(m["°"])} || 'C')
      WHEN 2 THEN concat({lit(m["“"])}, text, {lit(m["”"])})
      ELSE text
    END AS raw
  FROM documents
),
f AS (SELECT doc_id, source, raw, {fix} AS fixed FROM base)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN fixed != raw THEN 1 ELSE 0 END) AS BIGINT) AS n_repaired_docs,
       CAST(SUM(length(raw) - length(fixed)) AS BIGINT) AS chars_saved,
       CAST(COUNT(DISTINCT md5(fixed)) AS BIGINT) AS n_distinct_fixed
FROM f GROUP BY source ORDER BY source
"""


ORACLE_DOC_MOJIBAKE_REPAIR = _mojibake_oracle()

_BANNED_PHRASES = ["slow", "batch batch", "table scan", "no such phrase here"]


def banned_phrase_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banned-phrase curation (ops.corpus.phrase_blocklist_hits): multi-word
    blocklist matching by word-boundary-aligned n-gram equality joins — one
    keyed join per distinct phrase LENGTH, so a million-phrase list costs a
    few hash joins, never a contains() scan per (doc, phrase). Per-source
    flagged counts + total hit volume certify the n-gram/join machinery
    cross-engine (the unmatched 4-word phrase proves absent lengths cost
    nothing and match nothing)."""
    from apollo_spark.ops.corpus import phrase_blocklist_hits

    d = _t(spark, sf_dir, "documents")
    phrases = spark.createDataFrame([(p,) for p in _BANNED_PHRASES], "phrase string")
    hits = phrase_blocklist_hits(d, phrases).groupBy("id").agg(
        F.sum("n_hits").alias("h")
    )
    return (
        d.join(hits, d["doc_id"] == hits["id"], "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("id").alias("n_flagged"),
            F.coalesce(F.sum("h"), F.lit(0)).cast("long").alias("total_hits"),
        )
        .orderBy("source")
    )


ORACLE_BANNED_PHRASE_FILTER = r"""
WITH w AS (
  SELECT doc_id, source, string_split_regex(lower(trim(text)), '\s+') AS w FROM documents
),
g1 AS (SELECT doc_id, unnest(w) AS g FROM w),
g2 AS (
  SELECT doc_id, concat(w[i], ' ', w[i + 1]) AS g
  FROM w, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2
),
hits AS (
  SELECT doc_id, g FROM g1 WHERE g IN ('slow')
  UNION ALL
  SELECT doc_id, g FROM g2 WHERE g IN ('batch batch', 'table scan')
),
per_doc AS (SELECT doc_id, COUNT(*) AS h FROM hits GROUP BY doc_id)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(p.doc_id) AS BIGINT) AS n_flagged,
       CAST(COALESCE(SUM(p.h), 0) AS BIGINT) AS total_hits
FROM documents d LEFT JOIN per_doc p USING (doc_id)
GROUP BY d.source ORDER BY d.source
"""


def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-efficiency report per language: chars per whitespace word
    and FERTILITY (BPE-ish subword tokens per word — the metric that decides
    how much context window a language burns; multilingual-tokenizer papers
    report exactly this). Uses ops.text.bpe_ish_token_count's GPT-2-ish
    pre-tokenizer shape; exact integer sums, one double division at the
    end — hash-gates cross-engine."""
    from apollo_spark.ops.text import bpe_ish_token_count

    d = _t(spark, sf_dir, "documents")
    ws = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    return (
        d.select("lang", F.length("text").alias("ch"), ws.alias("ws"), bpe_ish_token_count(F.col("text")).cast("long").alias("bpe"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws").alias("n_words"),
            F.sum("bpe").alias("n_bpe_tokens"),
            (F.sum("ch").cast("double") / F.sum("ws").cast("double")).alias("chars_per_word"),
            (F.sum("bpe").cast("double") / F.sum("ws").cast("double")).alias("fertility"),
        )
        .orderBy("lang")
    )


ORACLE_TOKENIZER_FERTILITY = r"""
WITH t AS (
  SELECT lang, length(text) AS ch,
         len(string_split_regex(trim(text), '\s+')) AS ws,
         len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ws) AS BIGINT) AS n_words,
       CAST(SUM(bpe) AS BIGINT) AS n_bpe_tokens,
       CAST(SUM(ch) AS DOUBLE) / CAST(SUM(ws) AS DOUBLE) AS chars_per_word,
       CAST(SUM(bpe) AS DOUBLE) / CAST(SUM(ws) AS DOUBLE) AS fertility
FROM t GROUP BY lang ORDER BY lang
"""


# ---------------------------------------------------------------------------
# round 6, second wave: mining / coreset / privacy / blocking-evaluation tier
# ---------------------------------------------------------------------------


def bitext_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based parallel-pair mining (Artetxe & Schwenk 2019, the
    LASER/CCMatrix bitext criterion): even vec_ids play the source
    collection, odd ids the target; candidates are blocked by the
    engine-exact lattice k-means with SemDeDup-style corpus-proportional k
    (ops.similarity.margin_mined_pairs), each pair scored by the RATIO
    margin against its top-4 neighborhood means, and only mutual best
    matches above margin 1.02 are mined. Cosines are sequential double
    folds and neighborhood means ride DECIMAL(18,6) sums, so the DuckDB
    oracle replays every score, rank, and margin bit-for-bit."""
    from apollo_spark.ops.similarity import margin_mined_pairs

    e = _t(spark, sf_dir, "embeddings")
    k = semdedup_k(e.count())
    m = margin_mined_pairs(e, k=k, k_neighbors=4, threshold=1.02, iters=2)
    res = m.select(
        "x_id",
        "y_id",
        F.round("score", 4).alias("score"),
        F.round("margin", 4).alias("margin"),
    ).orderBy("x_id", "y_id")
    return carry_caches(res, m)


def _bitext_margin_oracle(kn: int = 4, threshold: float = 1.02) -> str:
    """Mirror of bitext_margin_mining: shared lattice-k-means CTEs (same
    corpus-derived k), within-cluster even x odd candidate join, decimal
    neighborhood means, mutual-rank-1 + margin filter."""
    ctes = _lattice_common_ctes(SEMDEDUP_K_SQL, 2)
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
av AS (SELECT a.vec_id, a.cluster, e.v FROM fassign a JOIN e USING (vec_id)),
cand AS (
  SELECT x.vec_id AS x_id, y.vec_id AS y_id,
         list_dot_product(x.v, y.v)
         / (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) AS score
  FROM av x JOIN av y ON x.cluster = y.cluster
  WHERE x.vec_id % 2 = 0 AND y.vec_id % 2 = 1
),
r AS (
  SELECT x_id, y_id, score,
         CAST(ROUND(score, 6) AS DECIMAL(18,6)) AS score_q,
         ROW_NUMBER() OVER (PARTITION BY x_id ORDER BY score DESC, y_id ASC) AS rnx,
         ROW_NUMBER() OVER (PARTITION BY y_id ORDER BY score DESC, x_id ASC) AS rny
  FROM cand
),
nx AS (SELECT x_id, CAST(SUM(score_q) AS DOUBLE) / COUNT(*) AS avg_x FROM r WHERE rnx <= {kn} GROUP BY x_id),
ny AS (SELECT y_id, CAST(SUM(score_q) AS DOUBLE) / COUNT(*) AS avg_y FROM r WHERE rny <= {kn} GROUP BY y_id)
SELECT r.x_id, r.y_id, ROUND(r.score, 4) AS score,
       ROUND(r.score / ((nx.avg_x + ny.avg_y) / 2.0), 4) AS margin
FROM r JOIN nx USING (x_id) JOIN ny USING (y_id)
WHERE rnx = 1 AND rny = 1
  AND (nx.avg_x + ny.avg_y) > 0
  AND r.score / ((nx.avg_x + ny.avg_y) / 2.0) >= {threshold}
ORDER BY x_id, y_id"""
    )


ORACLE_BITEXT_MARGIN = _bitext_margin_oracle()


def coreset_kcenter_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy farthest-point (k-center) coreset over the embeddings
    (ops.clustering.kcenter_select): seed at the smallest vec_id, then 7
    rounds of pick-the-point-farthest-from-the-selected-set — the classic
    2-approximation diverse-subset primitive behind coreset-based data
    pruning. Exactly k bounded driver rounds, each one distributed scan
    against a broadcast center set; the unrolled-iteration oracle replays
    every squared distance (pure dot-product arithmetic) and argmax
    tie-break."""
    from apollo_spark.ops.clustering import kcenter_select

    e = _t(spark, sf_dir, "embeddings")
    sel = kcenter_select(e, k=8)
    out = spark.createDataFrame(sel, "sel_order INT, vec_id BIGINT, r2 DOUBLE")
    return out.select("sel_order", "vec_id", F.round("r2", 4).alias("r2")).orderBy("sel_order")


def _kcenter_oracle(k: int = 8) -> str:
    """Mirror of coreset_kcenter_sample: unrolled greedy rounds; round i
    scans all not-yet-selected vectors against the i selected centers."""
    ctes = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        "s0 AS (SELECT 0 AS sel_order, vec_id, 0.0 AS r2 FROM e WHERE vec_id = (SELECT MIN(vec_id) FROM e))",
    ]
    prev = "s0"
    for i in range(1, k):
        ctes.append(
            f"""p{i} AS (
  SELECT {i} AS sel_order, vec_id, mind AS r2 FROM (
    SELECT y.vec_id,
           MIN(list_dot_product(y.v, y.v) - 2.0 * list_dot_product(y.v, c.v) + list_dot_product(c.v, c.v)) AS mind
    FROM e y CROSS JOIN (SELECT e2.v FROM {prev} s JOIN e e2 ON e2.vec_id = s.vec_id) c
    WHERE y.vec_id NOT IN (SELECT vec_id FROM {prev})
    GROUP BY y.vec_id)
  ORDER BY mind DESC, vec_id ASC LIMIT 1
)"""
        )
        ctes.append(f"s{i} AS (SELECT * FROM s{i - 1} UNION ALL SELECT * FROM p{i})")
        prev = f"s{i}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT sel_order, vec_id, ROUND(r2, 4) AS r2 FROM {prev} ORDER BY sel_order"
    )


ORACLE_KCENTER = _kcenter_oracle(k=8)


def customer_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymous aggregate release (ops.privacy.k_anonymize, k=25) over
    the quasi-identifiers (mktsegment, acctbal-thousand bucket): classes
    with fewer than 25 customers collapse into one '*' catch-all row so no
    released group is re-identifiable, while the release still accounts for
    every customer. Balance sums ride DECIMAL, so the per-class average is
    engine-exact."""
    from apollo_spark.ops.privacy import k_anonymize

    c = _t(spark, sf_dir, "customer")
    out = k_anonymize(
        c.select(
            F.col("c_mktsegment").alias("segment"),
            F.floor(F.col("c_acctbal") / F.lit(1000.0)).alias("bal_bucket"),
            F.col("c_acctbal"),
        ),
        qi_cols=["segment", "bal_bucket"],
        k=25,
        value_col="c_acctbal",
        value_scale=2,
    )
    res = out.select(
        "segment",
        "bal_bucket",
        "n_classes",
        "n_rows",
        # deliberately UNROUNDED: the operands (exact decimal sum, integer
        # count) are bit-identical across engines, so the double quotient
        # is too — while ROUND would tie at the cut digit for divisors
        # like 32 (sum/3200 has exact 5-terminated expansions) and the two
        # engines break string-vs-binary ties differently.
        F.col("avg_value").alias("avg_bal"),
    ).orderBy("segment", "bal_bucket")
    # select/orderBy derived a new frame — move the persist scope onto the
    # one bench.py's release_caches actually sees
    return carry_caches(res, out)


ORACLE_K_ANONYMITY = """
WITH g AS (
  SELECT c_mktsegment AS segment,
         CAST(CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS VARCHAR) AS bal_bucket,
         COUNT(*) AS n_rows,
         SUM(CAST(ROUND(c_acctbal, 2) AS DECIMAL(18,2))) AS s
  FROM customer GROUP BY 1, 2
),
kept AS (
  SELECT segment, bal_bucket, CAST(1 AS BIGINT) AS n_classes, n_rows,
         CAST(s AS DECIMAL(38,6)) AS s
  FROM g WHERE n_rows >= 25
),
supp AS (
  SELECT '*' AS segment, '*' AS bal_bucket, CAST(COUNT(*) AS BIGINT) AS n_classes,
         CAST(SUM(n_rows) AS BIGINT) AS n_rows, CAST(SUM(s) AS DECIMAL(38,6)) AS s
  FROM g WHERE n_rows < 25 HAVING COUNT(*) > 0 AND SUM(n_rows) >= 25
)
SELECT segment, bal_bucket, n_classes, n_rows,
       CAST(s AS DOUBLE) / CAST(n_rows AS DOUBLE) AS avg_bal
FROM (SELECT * FROM kept UNION ALL SELECT * FROM supp)
ORDER BY segment, bal_bucket
"""


# ONE shared constant drives the LSH-evaluation substrate AND its two
# consumer queries (lsh_blocking_quality / lsh_merge_completeness) — the
# candidate geometry, the truth config, and the artifact path tag all derive
# from it, so a parameter change in one place cannot silently serve a
# mismatched persisted substrate (the artifact name embeds the config).
LSH_EVAL_CONFIG: dict = {
    "block_n": 3,
    "truth_n": 2,
    "num_hashes": 32,
    "bands": 16,
    "truth_threshold": 0.2,
    "max_df_frac": 0.04,
    "max_bucket": 64,
    "max_bucket_mode": "reband",
}


def _lsh_eval_tag(sf_dir: str) -> str:
    c = LSH_EVAL_CONFIG
    cfg = (
        f"b{c['block_n']}h{c['num_hashes']}x{c['bands']}mb{c['max_bucket']}{c['max_bucket_mode']}"
        f"_t{c['truth_n']}j{c['truth_threshold']}f{c['max_df_frac']}"
    )
    return f"{sf_dir.strip('/').replace('/', '_')}_{cfg}"


def _lsh_eval_cand_truth(spark: SparkSession, sf_dir: str):
    """Shared LSH-evaluation substrate (round 9): lsh_blocking_quality and
    lsh_merge_completeness consume the SAME ladder candidate set and the
    SAME df-capped exact-Jaccard truth, and recomputing both twice was
    ~11% of the whole bench (8.9 s + 10.9 s at sf0.1) — the same double-pay
    at rehearsal/production scale. With APOLLO_SPARK_ARTIFACT_DIR set
    (bench.py's per-run tmpdir; a production job points it at the lake),
    the two pair frames are built ONCE per corpus snapshot and committed
    as TxTables (train_or_load_table, CAS-idempotent); each metric query
    then runs only its aggregate/component tail. Unset (the driver's
    gate), returns None and each query builds self-contained so its oracle
    replays the full trajectory."""
    import os as _os

    art = _os.environ.get("APOLLO_SPARK_ARTIFACT_DIR")
    if not art:
        return None
    from apollo_spark.ops.cache import release_caches
    from apollo_spark.ops.dedup import (
        _minhash_band_candidates,
        _shingle_base,
        ngram_jaccard_pairs,
    )
    from apollo_spark.table_format import train_or_load_table

    d = _t(spark, sf_dir, "documents")
    c = LSH_EVAL_CONFIG
    tag = _lsh_eval_tag(sf_dir)
    leaks = []

    def build_cand():
        base = _shingle_base(d, "doc_id", "text", c["block_n"], None).persist()
        cand, sig = _minhash_band_candidates(
            base, c["num_hashes"], c["bands"], c["max_bucket"], c["max_bucket_mode"]
        )
        leaks.extend([base, sig])
        return cand.select("id_a", "id_b")

    def build_truth():
        tp = ngram_jaccard_pairs(
            d,
            id_col="doc_id",
            text_col="text",
            n=c["truth_n"],
            threshold=c["truth_threshold"],
            max_df_frac=c["max_df_frac"],
        )
        leaks.append(tp)
        return tp.select("id_a", "id_b")

    cand = train_or_load_table(spark, f"{art}/lsh_eval_cand_{tag}", build_cand)
    truth = train_or_load_table(spark, f"{art}/lsh_eval_truth_{tag}", build_truth)
    for f in leaks:
        if hasattr(f, "unpersist"):
            try:
                f.unpersist()
            except Exception:
                pass
        release_caches(f)
    return cand, truth


def lsh_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality evaluation of the MinHash-LSH candidate generator
    (ops.dedup.lsh_blocking_metrics): pair completeness against the
    df-capped exact bigram-Jaccard ground truth (the benchmarked
    ngram_jaccard_capped_pairs config) and reduction ratio against the
    quadratic all-pairs space — the two record-linkage numbers that say
    whether a blocker is safe to trust at scale. The blocker hashes TRIGRAM
    shingles while truth is defined on bigram Jaccard >= 0.2 — independent
    systems by design (non-circular evaluation) and each individually
    benchmarked linear; the docstring of lsh_blocking_metrics records the
    two rejected shared-n configurations (bigram banding: candidates ~4% of
    ALL pairs, quadratic; trigram truth: df cap dodged, index fan-out,
    39.7 s vs ~8 s at sf0.1). PC < 1 on the driver corpus — the blocker
    genuinely misses low-J true pairs, the honest S-curve number.

    ``max_bucket=64``: the sf10 rehearsal caught the r=2 banding going
    QUADRATIC under structural boilerplate shingles (one hot trigram's
    bucket grows with the corpus: candidates 1.46M/13.1M/145M at
    sf1/sf3/sf10, 11.4 GB spill, 337 s) — the exact mega-bucket pathology
    web boilerplate produces at 100 TB. The evaluated configuration is
    therefore the GUARDED blocker, the one a production pipeline would
    run. Round 8 upgraded the guard from drop to the RECURSIVE BANDING
    LADDER (max_bucket_mode="reband", _minhash_band_candidates): over-cap
    bucket members descend with doubled r per level until their buckets
    fall under the cap (full pairing there), and floor buckets —
    signature-identical cliques — are star-linked, so pairs glued by one
    boilerplate argmin split apart while broadly-similar pairs keep full
    pairing: recall preserved instead of dropped, candidates provably
    linear. The PC this query reports prices the production geometry
    honestly."""
    from apollo_spark.ops.dedup import lsh_blocking_metrics

    d = _t(spark, sf_dir, "documents")
    m = lsh_blocking_metrics(
        d, **LSH_EVAL_CONFIG,
        cand_truth=_lsh_eval_cand_truth(spark, sf_dir),
    )
    res = m.select(
        "n_docs",
        "n_true",
        "n_cand",
        "n_caught",
        # unrounded: pure integer-ratio doubles are bit-identical across
        # engines, while ROUND can tie at the cut digit (see
        # customer_k_anonymity).
        "pair_completeness",
        "reduction_ratio",
    )
    return carry_caches(res, m)


def _blocking_quality_oracle(
    block_n: int = 3,
    truth_n: int = 2,
    num_hashes: int = 32,
    bands: int = 16,
    truth_threshold: float = 0.2,
    max_df_frac: float = 0.04,
    max_bucket: int | None = None,
    max_bucket_mode: str = "reband",
    select: str = "quality",
) -> str:
    """Mirror of lsh_blocking_quality: the portable-MinHash banding CTEs
    (m-prefixed, same family as ORACLE_MINHASH_PORTABLE) + the df-capped
    exact-Jaccard truth CTEs (t-prefixed, same pipeline as
    ORACLE_NGRAM_JACCARD_CAPPED) + four scalar counts. With
    ``max_bucket_mode="reband"`` the over-cap bucket members descend the
    recursive 'R{level}|'-prefixed banding ladder (r doubled per level,
    full pairing under the cap, floor star), exactly as
    _minhash_band_candidates does. ``select="merge"`` swaps the final
    section for the connectivity evaluation lsh_merge_completeness mirrors
    (recursive-CTE components over the truth and caught graphs, isolated
    truth nodes counted as singletons)."""
    from apollo_spark.ops.dedup import _mh_consts

    if select == "quality":
        tail = """nd AS (SELECT COUNT(*) AS n_docs FROM msh WHERE len(sh) > 0),
nt AS (SELECT COUNT(*) AS n_true FROM truth),
nc AS (SELECT COUNT(*) AS n_cand FROM mcand),
ng AS (SELECT COUNT(*) AS n_caught FROM truth t JOIN mcand c ON t.id_a = c.id_a AND t.id_b = c.id_b)
SELECT n_docs, n_true, n_cand, n_caught,
       CASE WHEN n_true > 0 THEN CAST(n_caught AS DOUBLE) / CAST(n_true AS DOUBLE) END AS pair_completeness,
       CASE WHEN n_docs > 1 THEN 1.0 - CAST(n_cand AS DOUBLE) / (CAST(n_docs * (n_docs - 1) AS DOUBLE) / 2.0) END AS reduction_ratio
FROM nd, nt, nc, ng"""
    elif select == "merge":
        tail = """caught AS MATERIALIZED (
  SELECT t.id_a, t.id_b FROM truth t JOIN mcand c ON t.id_a = c.id_a AND t.id_b = c.id_b
),
tnodes AS MATERIALIZED (
  SELECT DISTINCT id FROM (SELECT id_a AS id FROM truth UNION ALL SELECT id_b AS id FROM truth)
),
tedges AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM truth UNION ALL SELECT id_b AS src, id_a AS dst FROM truth
),
treach(id, comp) AS (
  SELECT src, src FROM tedges
  UNION
  SELECT e.dst, r.comp FROM treach r JOIN tedges e ON e.src = r.id
),
tcomp AS MATERIALIZED (SELECT id, MIN(comp) AS comp FROM treach GROUP BY id),
cedges AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM caught UNION ALL SELECT id_b AS src, id_a AS dst FROM caught
),
creach(id, comp) AS (
  SELECT src, src FROM cedges
  UNION
  SELECT e.dst, r.comp FROM creach r JOIN cedges e ON e.src = r.id
),
ccomp AS MATERIALIZED (SELECT id, MIN(comp) AS comp FROM creach GROUP BY id),
agg AS (
  SELECT (SELECT COUNT(*) FROM truth) AS n_true,
         (SELECT COUNT(*) FROM caught) AS n_caught,
         (SELECT COUNT(*) FROM tnodes) AS truth_nodes,
         (SELECT COUNT(DISTINCT comp) FROM tcomp) AS truth_components,
         (SELECT COUNT(DISTINCT comp) FROM ccomp)
           + (SELECT COUNT(*) FROM tnodes WHERE id NOT IN (SELECT id FROM ccomp)) AS caught_components
)
SELECT n_true, n_caught, truth_nodes, truth_components, caught_components,
       CASE WHEN truth_nodes > truth_components
            THEN CAST(truth_nodes - caught_components AS DOUBLE)
                 / CAST(truth_nodes - truth_components AS DOUBLE)
            ELSE 1.0 END AS merge_completeness
FROM agg"""
    else:
        raise ValueError(f"select must be 'quality' or 'merge', got {select!r}")

    rows = num_hashes // bands
    mins = ",\n         ".join(
        f"MIN(((h >> 30) * {a} + (h & 1073741823) * {b} + {c}) % 2305843009213693951) AS m{i}"
        for i, (a, b, c) in ((i, _mh_consts(i)) for i in range(num_hashes))
    )
    band_rows = "\n  UNION ALL\n  ".join(
        "SELECT doc_id, ('0x' || substr(md5(concat_ws('|', {b}, {cols})), 1, 15))::BIGINT AS bkey FROM msig".format(
            b=b, cols=", ".join(f"m{b * rows + j}" for j in range(rows))
        )
        for b in range(bands)
    )
    reband = max_bucket is not None and max_bucket_mode == "reband"
    reband_ctes = ""
    cand_body = """
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM mbands a JOIN mbands b ON a.bkey = b.bkey AND a.doc_id < b.doc_id"""
    if reband:
        # recursive banding ladder mirror (ops.dedup._minhash_band_candidates):
        # level l re-keys the previous level's over-cap members at doubled r
        # under the 'R{l}|' prefix; the floor star-links signature-identical
        # still-hot buckets. Every multiply-read CTE is MATERIALIZED — DuckDB
        # otherwise inlines per reference and re-derives the 32-min signature
        # aggregate dozens of times (measured 504 s vs 1.2 s at sf0.001).
        lvl_ctes: list[str] = []
        pair_selects = [
            """SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM mbands a JOIN mbands b ON a.bkey = b.bkey AND a.doc_id < b.doc_id"""
        ]
        prev_b, prev_c = "mbands0", "mbcnt"
        level, r_cur = 0, rows
        while True:
            # geometrically-relaxed caps, mirroring the Spark ladder:
            # level l (the one READ from prev_b/prev_c here) used cap*4^l
            prev_cap = int(max_bucket) * 4 ** level
            # per-level STAR of this level's hot buckets (the connectivity
            # guarantee — same edges _minhash_band_candidates emits)
            lvl_ctes.append(
                f"""mr{level}star AS (
  SELECT MIN(doc_id) OVER (PARTITION BY bkey) AS id_a, doc_id AS id_b
  FROM (SELECT mb.doc_id, mb.bkey FROM {prev_b} mb JOIN {prev_c} USING (bkey) WHERE c > {prev_cap})
  QUALIFY doc_id != id_a
)"""
            )
            pair_selects.append(f"SELECT id_a, id_b FROM mr{level}star")
            r_next = r_cur * 2
            if r_cur >= num_hashes or num_hashes % r_next != 0:
                break
            level += 1
            bname, cname, iname, sname = (
                f"mr{level}bands", f"mr{level}cnt", f"mr{level}ids", f"mr{level}cold"
            )
            lvl_ctes.append(
                f"{iname} AS MATERIALIZED (SELECT DISTINCT mb.doc_id "
                f"FROM {prev_b} mb JOIN {prev_c} USING (bkey) WHERE c > {prev_cap})"
            )
            band_sel = "\n  UNION ALL\n  ".join(
                f"SELECT doc_id, ('0x' || substr(md5(concat_ws('|', 'R{level}', {b}, "
                + ", ".join(f"m{b * r_next + j}" for j in range(r_next))
                + f")), 1, 15))::BIGINT AS bkey FROM msig JOIN {iname} USING (doc_id)"
                for b in range(num_hashes // r_next)
            )
            lvl_ctes.append(f"{bname} AS MATERIALIZED (\n  {band_sel}\n)")
            lvl_ctes.append(
                f"{cname} AS MATERIALIZED (SELECT bkey, COUNT(*) AS c FROM {bname} GROUP BY bkey)"
            )
            lvl_ctes.append(
                f"{sname} AS MATERIALIZED (SELECT mb.doc_id, mb.bkey "
                f"FROM {bname} mb JOIN {cname} USING (bkey) "
                f"WHERE c <= {int(max_bucket) * 4 ** level})"
            )
            pair_selects.append(
                f"""SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM {sname} a JOIN {sname} b ON a.bkey = b.bkey AND a.doc_id < b.doc_id"""
            )
            prev_b, prev_c = bname, cname
            r_cur = r_next
        reband_ctes = ",\n" + ",\n".join(lvl_ctes)
        cand_body = (
            "\n  SELECT DISTINCT id_a, id_b FROM (\n    "
            + "\n    UNION ALL\n    ".join(pair_selects)
            + "\n  )"
        )
    return rf"""
WITH RECURSIVE mt AS MATERIALIZED (
  SELECT doc_id, regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents
),
msh AS (
  SELECT doc_id,
         CASE WHEN len(w) < {block_n} THEN [array_to_string(w, ' ')]
              ELSE list_distinct(list_transform(generate_series(1, len(w) - {block_n - 1}),
                                                i -> {" || ' ' || ".join(f"w[i+{j}]" for j in range(block_n))})) END AS sh
  FROM mt
),
mex AS (SELECT doc_id, unnest(sh) AS s FROM msh),
mh AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM mex),
msig AS MATERIALIZED (
  SELECT doc_id,
         {mins}
  FROM mh GROUP BY doc_id
),
mbands0 AS MATERIALIZED (
  {band_rows}
),
mbcnt AS (SELECT bkey, COUNT(*) AS c FROM mbands0 GROUP BY bkey),
mbands AS (
  SELECT mb.doc_id, mb.bkey FROM mbands0 mb JOIN mbcnt USING (bkey)
  WHERE {f"c <= {int(max_bucket)}" if max_bucket is not None else "TRUE"}
){reband_ctes},
mcand AS ({cand_body}
),
td0 AS (
  SELECT doc_id,
         CASE WHEN len(t) < {truth_n} THEN [array_to_string(t, ' ')]
              ELSE list_distinct(list_transform(generate_series(1, len(t) - {truth_n - 1}),
                                                i -> {" || ' ' || ".join(f"t[i+{j}]" for j in range(truth_n))})) END AS sh
  FROM (SELECT doc_id, regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        FROM documents)
  WHERE len(t) >= 1
),
td AS (SELECT * FROM td0 WHERE len(sh) > 0),
tkcap AS (SELECT CAST(floor({max_df_frac} * COUNT(*)) AS BIGINT) AS cap FROM td),
tex AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS s FROM td),
tdfreq AS (SELECT s, COUNT(*) AS c FROM tex GROUP BY s),
tkept AS (SELECT tex.doc_id, tex.n, tex.s FROM tex JOIN tdfreq USING (s), tkcap WHERE c <= tkcap.cap),
tcand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM tkept a JOIN tkept b
    ON a.s = b.s AND a.doc_id < b.doc_id
   AND a.n >= {truth_threshold} * b.n - 1e-9 AND b.n >= {truth_threshold} * a.n - 1e-9
),
tscored AS (
  SELECT id_a, id_b,
         CAST(len(list_intersect(da.sh, db.sh)) AS DOUBLE)
         / (len(da.sh) + len(db.sh) - len(list_intersect(da.sh, db.sh))) AS jaccard
  FROM tcand JOIN td da ON da.doc_id = tcand.id_a JOIN td db ON db.doc_id = tcand.id_b
),
tallhot AS (
  SELECT doc_id, list_sort(sh) AS seth FROM td
  WHERE doc_id NOT IN (SELECT doc_id FROM tkept)
),
tstar AS (
  SELECT MIN(doc_id) OVER (PARTITION BY seth) AS id_a, doc_id AS id_b
  FROM tallhot QUALIFY doc_id != id_a
),
truth AS (
  SELECT id_a, id_b FROM tscored WHERE jaccard >= {truth_threshold}
  UNION ALL SELECT id_a, id_b FROM tstar
),
{tail}
"""


ORACLE_BLOCKING_QUALITY = _blocking_quality_oracle(**LSH_EVAL_CONFIG)


def lsh_merge_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connectivity-level blocking evaluation (round 8,
    ops.dedup.lsh_merge_completeness): merge completeness = the fraction of
    the truth graph's component merges the verified candidate set achieves.
    The skew rehearsal (BASELINE.md round-8 #2) is the motivation: under
    boilerplate skew the TRUE near-dup set is a quadratic clique, so pair
    completeness punishes every linear blocker — while dedup's actual
    consumers (components, keep-best, dup-mass, sample weights) only need
    the clique CONNECTED. Same production configuration as
    lsh_blocking_quality (trigram banding, bigram df-capped truth, cap 64,
    recursive ladder); the oracle replays banding, ladder, truth AND both
    component computations (recursive CTEs) bit-for-bit."""
    from apollo_spark.ops.dedup import lsh_merge_completeness as _mc

    d = _t(spark, sf_dir, "documents")
    m = _mc(
        d, **LSH_EVAL_CONFIG,
        cand_truth=_lsh_eval_cand_truth(spark, sf_dir),
    )
    res = m.select(
        "n_true", "n_caught", "truth_nodes", "truth_components",
        "caught_components", "merge_completeness",
    )
    return carry_caches(res, m)


ORACLE_MERGE_COMPLETENESS = _blocking_quality_oracle(**LSH_EVAL_CONFIG, select="merge")


def dup_aware_sample_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication-aware sampling weights (the soft alternative to hard
    dedup, e.g. SlimPajama-style cluster reweighting): every document gets
    weight 1/|its near-dup component|, so a sampler drawing by weight sees
    each CONTENT once in expectation instead of once per copy — no document
    is discarded, survivorship stays debuggable. Components ride the same
    capped edge generation near_dup_components certifies (frac_floor=1024:
    capped == lossless at every gate SF); docs in no component are their own
    singleton (weight 1.0). Weight is a division of exact integers —
    engine-identical unrounded."""
    d = _t(spark, sf_dir, "documents")
    comp = _doc_components(spark, sf_dir)
    full = d.select("doc_id").join(comp, "doc_id", "left").select(
        "doc_id", F.coalesce("component", F.col("doc_id")).alias("component")
    )
    sz = full.groupBy("component").agg(F.count(F.lit(1)).alias("csize"))
    return (
        full.join(sz, "component")
        .select(
            "doc_id",
            "component",
            "csize",
            (F.lit(1.0) / F.col("csize").cast("double")).alias("weight"),
        )
        .orderBy("doc_id")
    )


ORACLE_DUP_WEIGHTS = r"""
WITH RECURSIVE d AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(t)-1), i -> t[i] || ' ' || t[i+1])) AS sh
  FROM (SELECT doc_id, regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        FROM documents)
  WHERE len(t) >= 1
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM d a JOIN d b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.2
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(id, comp) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id
),
comp AS (SELECT id AS doc_id, MIN(comp) AS component FROM reach GROUP BY id),
fullc AS (
  SELECT a.doc_id, COALESCE(c.component, a.doc_id) AS component
  FROM (SELECT doc_id FROM documents) a LEFT JOIN comp c USING (doc_id)
),
sz AS (SELECT component, COUNT(*) AS csize FROM fullc GROUP BY component)
SELECT f.doc_id, f.component, s.csize,
       CAST(1.0 AS DOUBLE) / CAST(s.csize AS DOUBLE) AS weight
FROM fullc f JOIN sz s USING (component)
ORDER BY doc_id
"""


def join_skew_profile_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight join-skew profile (ops.relational.join_skew_profile) of
    the documents-by-language self-join — the 'accidental mega-key' shape:
    5 languages over the whole corpus, with 'en' holding ~44% of docs, so
    its key alone carries ~66% of the estimated join output (est_pairs
    218^2 vs 64^2 for the tail language at sf0.01 — an 11x per-task
    imbalance). The profile is two key-count aggregates joined (never the
    data-sized join itself); its est_pairs/share output is the number that
    says 'salt this or broadcast that' BEFORE the shuffle is paid."""
    from apollo_spark.ops.relational import join_skew_profile

    d = _t(spark, sf_dir, "documents")
    return join_skew_profile(d, d, "lang", top_n=10)


def entity_golden_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution: SymSpell fuzzy candidate pairs
    (ops.linkage.fuzzy_dup_pairs, Levenshtein <= 1, same planted-twin input
    as fuzzy_entity_dup_pairs) -> connected components (min-label
    propagation) -> one GOLDEN record per multi-member entity with a
    deterministic survivorship rule: keep the longest string (the planted
    twins are one char shorter than their originals, so longest = most
    complete), ties toward the smaller id. This is the linkage tier's
    missing last step — match, cluster, merge — and every stage is the
    already-certified building block, so the composition hash-gates."""
    from apollo_spark.ops.dedup import connected_components

    base, p = _entity_pairs(spark, sf_dir)
    pairs = p.select("id_a", "id_b")
    comp = connected_components(pairs).select(
        F.col("id").cast("long").alias("id"), F.col("comp").cast("long").alias("comp")
    )
    m = comp.join(base, "id")
    g = (
        m.groupBy("comp")
        .agg(
            F.min("id").alias("entity_id"),
            F.count(F.lit(1)).alias("n_members"),
            F.countDistinct("s").alias("n_variants"),
            F.min(
                F.struct(
                    (-F.length("s")).alias("nl"), F.col("id").alias("i"), F.col("s").alias("sv")
                )
            ).alias("g"),
        )
        .filter(F.col("n_members") >= 2)
    )
    return g.select(
        "entity_id", "n_members", "n_variants", F.col("g.sv").alias("golden")
    ).orderBy("entity_id")


ORACLE_GOLDEN_RECORDS = r"""
WITH RECURSIVE c AS (SELECT c_custkey AS id, md5(CAST(c_custkey AS VARCHAR)) AS s FROM customer),
planted AS (
  SELECT id + 10000000 AS id,
         concat(substr(s, 1, id % length(s)),
                substr(s, id % length(s) + 2, length(s) - id % length(s) - 1)) AS s
  FROM c WHERE id % 3 = 0
),
base AS (SELECT * FROM c UNION ALL SELECT * FROM planted),
v AS (
  SELECT id, s,
         unnest(list_distinct(list_prepend(s,
           list_transform(generate_series(1, length(s)),
             i -> concat(substr(s, 1, i-1), substr(s, i+1, length(s)-i)))))) AS v
  FROM base
),
cand AS (
  SELECT DISTINCT a.id AS id_a, a.s AS s_a, b.id AS id_b, b.s AS s_b
  FROM v a JOIN v b USING (v) WHERE a.id < b.id
),
pairs AS (SELECT id_a, id_b FROM cand WHERE levenshtein(s_a, s_b) <= 1),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(id, comp) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id
),
comp AS (SELECT id, MIN(comp) AS comp FROM reach GROUP BY id),
m AS (SELECT comp.comp, base.id, base.s FROM comp JOIN base USING (id)),
r AS (
  SELECT comp, id, s,
         ROW_NUMBER() OVER (PARTITION BY comp ORDER BY length(s) DESC, id ASC) AS rn
  FROM m
),
g AS (
  SELECT comp, MIN(id) AS entity_id, COUNT(*) AS n_members, COUNT(DISTINCT s) AS n_variants
  FROM m GROUP BY comp HAVING COUNT(*) >= 2
)
SELECT g.entity_id, g.n_members, g.n_variants, r.s AS golden
FROM g JOIN r ON r.comp = g.comp AND r.rn = 1
ORDER BY entity_id
"""


def ivf_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the lattice-IVF 2-probe search against the exact
    brute-force top-5, computed fully IN-ENGINE as a first-class gated
    metric (the pytest recall pin made this a unit property; this makes it
    a reportable number a pipeline can alert on). Composes the two already
    certified queries — knn_ivf_lattice_approx (approximate side) and
    knn_bruteforce's ranking (exact side) — so the whole comparison,
    including the recall ratio, replays bit-for-bit in the oracle."""
    approx = knn_ivf_lattice_approx(spark, sf_dir).select("q_id", "vec_id")
    exact = knn_bruteforce(spark, sf_dir).select("q_id", "vec_id")
    hits = (
        exact.join(approx, ["q_id", "vec_id"], "left_semi")
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        exact.select("q_id")
        .distinct()
        .join(hits, "q_id", "left")
        .select(
            "q_id",
            F.coalesce(F.col("n_hits"), F.lit(0).cast("long")).alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0).cast("long")).cast("double") / F.lit(5.0)).alias(
                "recall_at_5"
            ),
        )
        .orderBy("q_id")
    )


def _ivf_recall_oracle(k: int = 8, iters: int = 2, probe: int = 2, topk: int = 5) -> str:
    """Mirror of ivf_recall_report: the lattice-IVF CTEs (same as
    ORACLE_IVF_LATTICE) + the brute-force ranking (same as ORACLE_KNN) +
    the per-query intersection count."""
    ctes = _lattice_common_ctes(k, iters)
    ctes.append(
        f"""probed AS (
  SELECT vec_id AS q_id, cluster FROM (
    SELECT vec_id, cluster,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cluster ASC) AS rn
    FROM fdist WHERE vec_id < 3) WHERE rn <= {probe}
)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
ascored AS (
  SELECT p.q_id, a.vec_id,
         list_dot_product(e.v, q.v) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.v, q.v))) AS score
  FROM fassign a JOIN probed p USING (cluster)
  JOIN e ON e.vec_id = a.vec_id
  JOIN e q ON q.vec_id = p.q_id
),
approx AS (
  SELECT q_id, vec_id FROM (
    SELECT q_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id ASC) AS rank
    FROM ascored) WHERE rank <= {topk}
),
qv AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 3),
bscored AS (
  SELECT qv.q_id, e.vec_id,
         list_dot_product(e.v, qv.qv) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(qv.qv, qv.qv))) AS score
  FROM e CROSS JOIN qv
),
exact AS (
  SELECT q_id, vec_id FROM (
    SELECT q_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id ASC) AS rank
    FROM bscored) WHERE rank <= {topk}
),
hits AS (
  SELECT exact.q_id, COUNT(*) AS n_hits
  FROM exact JOIN approx USING (q_id, vec_id) GROUP BY exact.q_id
)
SELECT x.q_id, COALESCE(h.n_hits, CAST(0 AS BIGINT)) AS n_hits,
       CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / 5.0 AS recall_at_5
FROM (SELECT DISTINCT q_id FROM exact) x LEFT JOIN hits h USING (q_id)
ORDER BY q_id"""
    )


ORACLE_IVF_RECALL = _ivf_recall_oracle()


CUSTOMERS_DSL_KANON = """
query customers_kanon {
  chain = "ethereum"
  source_table = "customer"
  transform {
    segment = c_mktsegment
    bal_bucket = floor(c_acctbal / 1000.0)
  }
  privacy {
    qi = ["segment", "bal_bucket"]
    k = 25
    value = "c_acctbal"
  }
  save {
    segment = segment
    bal_bucket = bal_bucket
    n_classes = n_classes
    n_rows = n_rows
    avg_bal = avg_value
  }
  sort = [segment, bal_bucket]
}
"""


def customers_dsl_kanon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k-anonymity release as ONE declarative HCL query: transform
    derives the quasi-identifiers (the new `floor` v2 function buckets the
    balance), the `privacy` block is the terminal release aggregation, save
    renames against the released shape. Output is identical to the
    customer_k_anonymity op-level query, so the SAME oracle certifies the
    whole DSL path — parse, transform compile, privacy stage, post-release
    save — end to end."""
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.pipeline import compile_query
    from apollo_spark.sources.tables import Catalog

    schema = parse_schema(CUSTOMERS_DSL_KANON)
    return compile_query(spark, Catalog(spark, sf_dir), schema.queries[0], schema)


def events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of the
    event stream's date range (split at 2024-01-16, the corpus midpoint) per
    event_type — THE production drift-monitor number: PSI < 0.1 stable,
    0.1-0.25 moderate shift, > 0.25 investigate. Shape: one groupBy on
    (event_type) with map-side-combinable conditional sums; scalar totals
    ride a broadcast crossJoin; the 5-bin term sum is a frame-sized window.
    Each PSI term is DECIMAL(38,6)-quantized before summing (the
    source_kl_divergence posture: ln is fixed-order IEEE, the quantization
    absorbs any final-ulp libm difference and makes the sum
    order-independent); bins empty on either side contribute NULL (excluded
    from the total) rather than a fake epsilon."""
    e = _events(spark, sf_dir)
    cut = 1_705_363_200 * 1_000_000_000  # 2024-01-16 00:00:00 UTC in nanos
    b = e.select(
        "event_type", F.when(F.col("ts") < F.lit(cut), 1).otherwise(0).alias("is_ref")
    )
    g = b.groupBy("event_type").agg(
        F.sum("is_ref").alias("n_ref"),
        (F.count(F.lit(1)) - F.sum("is_ref")).alias("n_cur"),
    )
    t = g.agg(F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur"))
    p_ref = F.col("n_ref").cast("double") / F.col("t_ref").cast("double")
    p_cur = F.col("n_cur").cast("double") / F.col("t_cur").cast("double")
    x = g.crossJoin(F.broadcast(t)).select(
        "event_type", "n_ref", "n_cur", p_ref.alias("p_ref"), p_cur.alias("p_cur")
    )
    term = F.when(
        (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
        ((F.col("p_cur") - F.col("p_ref")) * F.log(F.col("p_cur") / F.col("p_ref"))).cast(
            "decimal(38,6)"
        ),
    )
    w = Window.partitionBy(F.lit(1))
    return (
        x.withColumn("__term", term)
        .select(
            "event_type",
            "n_ref",
            "n_cur",
            "p_ref",
            "p_cur",
            F.col("__term").cast("double").alias("psi_term"),
            F.sum("__term").over(w).cast("double").alias("total_psi"),
        )
        .orderBy("event_type")
    )


ORACLE_PSI_DRIFT = """
WITH b AS (
  SELECT event_type,
         CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 0 END AS is_ref
  FROM events
),
g AS (
  SELECT event_type,
         CAST(SUM(is_ref) AS BIGINT) AS n_ref,
         CAST(COUNT(*) - SUM(is_ref) AS BIGINT) AS n_cur
  FROM b GROUP BY event_type
),
t AS (SELECT SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur FROM g),
x AS (
  SELECT event_type, n_ref, n_cur,
         CAST(n_ref AS DOUBLE) / CAST(t_ref AS DOUBLE) AS p_ref,
         CAST(n_cur AS DOUBLE) / CAST(t_cur AS DOUBLE) AS p_cur
  FROM g, t
),
y AS (
  SELECT event_type, n_ref, n_cur, p_ref, p_cur,
         CASE WHEN n_ref > 0 AND n_cur > 0
              THEN CAST((p_cur - p_ref) * ln(p_cur / p_ref) AS DECIMAL(38,6)) END AS term
  FROM x
)
SELECT event_type, n_ref, n_cur, p_ref, p_cur,
       CAST(term AS DOUBLE) AS psi_term,
       CAST(SUM(term) OVER () AS DOUBLE) AS total_psi
FROM y ORDER BY event_type
"""


def dedup_cost_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight cost profile of the bigram inverted-index dedup join: per
    shingle the candidate join emits C(df, 2) pairs, so the TOTAL lossless
    fan-out is sum(df*(df-1)/2) — the exact quantity behind the measured
    380-422x sf1 whales — and the capped fan-out re-sums over shingles with
    df <= floor(max_df_frac * n_docs). One exploded groupBy (map-side
    combinable) + one 1-row aggregate: the profile costs one shuffle over
    the shingle vocabulary and PREDICTS, before any pair is generated,
    whether the lossless form is affordable (the lossless-vs-capped
    decision the DSL dedup block's `lossless` flag controls). All counts
    are exact integers; the reduction ratio is a division of identical
    operands."""
    from apollo_spark.ops.dedup import shingles

    d = _t(spark, sf_dir, "documents")
    ex = (
        d.select("doc_id", F.explode(shingles(F.col("text"), 2)).alias("s"))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    nd = d.agg(F.count(F.lit(1)).alias("n_docs"))
    pairs = F.col("df") * (F.col("df") - F.lit(1)) / F.lit(2)
    x = ex.crossJoin(F.broadcast(nd)).select(
        "df",
        "n_docs",
        pairs.cast("long").alias("pairs"),
        (F.col("df") <= F.floor(F.lit(0.04) * F.col("n_docs"))).alias("under_cap"),
    )
    return x.groupBy("n_docs").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.when(~F.col("under_cap"), 1).otherwise(0)).cast("long").alias("n_hot"),
        F.sum("pairs").alias("est_pairs_lossless"),
        F.sum(F.when(F.col("under_cap"), F.col("pairs")).otherwise(F.lit(0))).alias(
            "est_pairs_capped"
        ),
    ).select(
        "n_docs",
        "n_shingles",
        "n_hot",
        "est_pairs_lossless",
        "est_pairs_capped",
        (
            F.lit(1.0)
            - F.col("est_pairs_capped").cast("double")
            / F.col("est_pairs_lossless").cast("double")
        ).alias("fanout_reduction"),
    )


ORACLE_DEDUP_COST = r"""
WITH d0 AS (
  SELECT doc_id,
         CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
              ELSE list_distinct(list_transform(generate_series(1, len(t)-1), i -> t[i] || ' ' || t[i+1])) END AS sh
  FROM (SELECT doc_id, regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
        FROM documents)
),
dfreq AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS df FROM (SELECT doc_id, unnest(sh) AS s FROM d0) GROUP BY s),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
x AS (
  SELECT df, n_docs,
         CAST(df * (df - 1) / 2 AS BIGINT) AS pairs,
         df <= CAST(floor(0.04 * n_docs) AS BIGINT) AS under_cap
  FROM dfreq, nd
)
SELECT n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN under_cap THEN 0 ELSE 1 END) AS BIGINT) AS n_hot,
       CAST(SUM(pairs) AS BIGINT) AS est_pairs_lossless,
       CAST(SUM(CASE WHEN under_cap THEN pairs ELSE 0 END) AS BIGINT) AS est_pairs_capped,
       1.0 - CAST(SUM(CASE WHEN under_cap THEN pairs ELSE 0 END) AS DOUBLE)
           / CAST(SUM(pairs) AS DOUBLE) AS fanout_reduction
FROM x GROUP BY n_docs
"""


def lsh_scurve_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytic S-curve of the repo's MinHash banding geometry (b=16,
    r=2): P(candidate | jaccard=j) = 1 - (1 - j^2)^16, tabulated on a
    0.05-step grid — the PREDICTED capture probability whose measured
    counterpart is lsh_blocking_quality's pair completeness. The 16th power
    is an explicit squaring chain (x2=x*x, x4=x2*x2, x8=x4*x4, x16=x8*x8):
    every step is one IEEE multiplication, identical on both engines, so
    the whole table is engine-exact with no pow() libm dependence. (sf_dir
    is unused — the curve is a property of the geometry, not the data; it
    stays a registry query so the driver certifies the arithmetic.)"""
    j = (F.col("i").cast("double") * F.lit(0.05)).alias("j")
    base = spark.range(1, 20).select(F.col("id").alias("i")).select("i", j)
    x = F.lit(1.0) - F.col("j") * F.col("j")
    x2 = (x * x).alias("__x2")
    t = base.select("i", "j", x2)
    x4 = (F.col("__x2") * F.col("__x2")).alias("__x4")
    t = t.select("i", "j", x4)
    x8 = (F.col("__x4") * F.col("__x4")).alias("__x8")
    t = t.select("i", "j", x8)
    return t.select(
        F.col("i").cast("int").alias("i"),
        "j",
        (F.col("j") * F.col("j")).alias("p_band"),
        (F.lit(1.0) - F.col("__x8") * F.col("__x8")).alias("p_candidate"),
    ).orderBy("i")


def blocking_scurve_menu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytic S-curve of EVERY blocking-menu geometry on the 0.05
    jaccard grid — the browsable companion to blocking_autotune_config:
    where lsh_scurve_table tabulates the b=16/r=2 default, this emits
    P(candidate | j) = 1-(1-j^r)^b for all seven BLOCKING_GEOMETRY_MENU
    entries, so a user can SEE why the uniform order escalates to deep
    r=2/b=128 at low thresholds while the boilerplate order takes r=1/b=32
    (BASELINE round-9 #7). Same exactness discipline: j^r and the band
    power are explicit multiply/squaring chains — no pow()/libm — so every
    value is bit-identical cross-engine. (sf_dir unused: the table is a
    property of the menu, kept as a registry query so the driver certifies
    the arithmetic.)"""
    from apollo_spark.ops.dedup import BLOCKING_GEOMETRY_MENU, _capture_columns

    menu = spark.createDataFrame(
        list(BLOCKING_GEOMETRY_MENU),
        "pref_u INT, pref_b INT, num_hashes INT, rpb INT, max_bucket INT",
    )
    grid = spark.range(1, 20).select((F.col("id").cast("double") * F.lit(0.05)).alias("j"))
    t = F.col("j")
    s = (
        F.when(F.col("rpb") == 1, t)
        .when(F.col("rpb") == 2, t * t)
        .otherwise((t * t) * (t * t))
    )
    caps = _capture_columns(s)
    bands_col = (F.col("num_hashes") / F.col("rpb")).cast("int")
    capture = (
        F.when(bands_col == 8, caps[8])
        .when(bands_col == 16, caps[16])
        .when(bands_col == 32, caps[32])
        .when(bands_col == 64, caps[64])
        .otherwise(caps[128])
    )
    return (
        menu.crossJoin(grid)
        .select(
            "num_hashes",
            bands_col.alias("bands"),
            "rpb",
            "j",
            capture.alias("p_candidate"),
        )
        .orderBy("num_hashes", "bands", "j")
    )


def _scurve_menu_oracle() -> str:
    from apollo_spark.ops.dedup import BLOCKING_GEOMETRY_MENU

    menu_vals = ", ".join(
        f"({pu}, {pb}, {h}, {r}, {mb})" for pu, pb, h, r, mb in BLOCKING_GEOMETRY_MENU
    )
    return f"""
WITH menu(pref_u, pref_b, num_hashes, rpb, max_bucket) AS (VALUES {menu_vals}),
g AS (SELECT CAST(i AS DOUBLE) * 0.05 AS j FROM generate_series(1, 19) t(i)),
m1 AS (
  SELECT num_hashes, rpb, CAST(num_hashes // rpb AS INT) AS bands, j,
         1.0 - CASE rpb WHEN 1 THEN j WHEN 2 THEN j * j ELSE (j * j) * (j * j) END AS x
  FROM menu, g
),
m2 AS (SELECT *, x * x AS x2 FROM m1),
m3 AS (SELECT *, x2 * x2 AS x4 FROM m2),
m4 AS (SELECT *, x4 * x4 AS x8 FROM m3),
m5 AS (SELECT *, x8 * x8 AS x16 FROM m4),
m6 AS (SELECT *, x16 * x16 AS x32 FROM m5),
m7 AS (SELECT *, x32 * x32 AS x64 FROM m6),
m8 AS (SELECT *, x64 * x64 AS x128 FROM m7)
SELECT num_hashes, bands, rpb, j,
       1.0 - CASE bands WHEN 8 THEN x8 WHEN 16 THEN x16 WHEN 32 THEN x32 WHEN 64 THEN x64 ELSE x128 END AS p_candidate
FROM m8 ORDER BY num_hashes, bands, j
"""


ORACLE_SCURVE_MENU = _scurve_menu_oracle()


ORACLE_LSH_SCURVE = """
WITH g AS (SELECT CAST(i AS INT) AS i, CAST(i AS DOUBLE) * 0.05 AS j FROM generate_series(1, 19) t(i)),
s AS (SELECT i, j, (1.0 - j * j) * (1.0 - j * j) AS x2 FROM g),
s4 AS (SELECT i, j, x2 * x2 AS x4 FROM s),
s8 AS (SELECT i, j, x4 * x4 AS x8 FROM s4)
SELECT i, j, j * j AS p_band, 1.0 - x8 * x8 AS p_candidate
FROM s8 ORDER BY i
"""


def blocking_autotune_config(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-adaptive blocking geometry selection (round 9) — the
    composition the round-8 skew rehearsal called for (BASELINE.md round-8
    #2): dedup_cost_profile's vocabulary-sized df pass + lsh_scurve_table's
    exact capture arithmetic, fused into ONE in-plan configuration choice
    of (num_hashes, bands, rows, max_df_frac, scrub) for the MinHash
    blocking tier. Run here at truth threshold 0.2 (the blocking-evaluation
    operating point where the fixed r=2/b=16 geometry's capture is only
    0.48): the profile escalates to r=1/b=32 (capture 0.9992) and flags
    boilerplate skew from hot-shingle occupancy. The oracle replays the
    ENTIRE selection — trigram df stats, squaring-chain capture math, menu
    ordering, and the budgeted df-cap argmax — so the gate certifies the
    decision procedure, not just its inputs. See
    ops/dedup.py::blocking_config_profile."""
    from apollo_spark.ops.dedup import blocking_config_profile

    d = _t(spark, sf_dir, "documents")
    return blocking_config_profile(d, n=3, threshold=0.2)


def _blocking_autotune_oracle(
    n: int = 3,
    threshold: float = 0.2,
    capture_target: float = 0.95,
    pair_budget: int = 64,
    frac_floor: int = 1024,
    hot_frac: float = 0.04,
    scrub_share: float = 0.002,
) -> str:
    """DuckDB mirror of blocking_config_profile, generated from the SAME
    menu/grid constants (single source of truth — the SQL cannot drift from
    the op). All double literals are CAST(... AS DOUBLE) so both engines do
    the identical IEEE multiply (DuckDB would otherwise keep exact DECIMAL
    arithmetic and floor() could disagree at integer boundaries)."""
    from apollo_spark.ops.dedup import BLOCKING_FRAC_GRID, BLOCKING_GEOMETRY_MENU

    k = len(BLOCKING_FRAC_GRID)
    grams = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    est_cols = ",\n         ".join(
        f"CAST(SUM(CASE WHEN df <= GREATEST(CAST(floor(CAST({f!r} AS DOUBLE) * n_docs) AS BIGINT), {frac_floor}) "
        f"THEN (df*(df-1))//2 ELSE 0 END) AS BIGINT) AS est{i}"
        for i, f in enumerate(BLOCKING_FRAC_GRID)
    )
    menu_vals = ", ".join(
        f"({pu}, {pb}, {h}, {r}, {mb})" for pu, pb, h, r, mb in BLOCKING_GEOMETRY_MENU
    )
    t = f"CAST({threshold!r} AS DOUBLE)"
    budget_frac = " ".join(
        f"WHEN est{i} <= {pair_budget} * n_docs THEN CAST({BLOCKING_FRAC_GRID[i]!r} AS DOUBLE)"
        for i in reversed(range(k))
    )
    budget_est = " ".join(
        f"WHEN est{i} <= {pair_budget} * n_docs THEN est{i}" for i in reversed(range(k))
    )
    tie_frac = " ".join(
        f"WHEN est{i} = est0 THEN CAST({BLOCKING_FRAC_GRID[i]!r} AS DOUBLE)"
        for i in reversed(range(1, k))
    )
    return rf"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
  FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(w) < {n} THEN [array_to_string(w, ' ')]
              ELSE list_distinct(list_transform(generate_series(1, len(w) - {n - 1}), i -> {grams})) END AS sh
  FROM t
),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM sh WHERE len(sh) > 0),
ex AS (SELECT doc_id, unnest(sh) AS s FROM sh WHERE len(sh) > 0),
dfreq AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS df FROM ex GROUP BY s),
stats AS (
  SELECT n_docs,
         CAST(COUNT(*) AS BIGINT) AS n_shingles,
         CAST(SUM(CASE WHEN df > GREATEST(CAST(floor(CAST({hot_frac!r} AS DOUBLE) * n_docs) AS BIGINT), {frac_floor}) THEN df ELSE 0 END) AS BIGINT) AS hot_mass,
         CAST(SUM(df) AS BIGINT) AS total_mass,
         {est_cols}
  FROM dfreq, nd GROUP BY n_docs
),
menu(pref_u, pref_b, num_hashes, rpb, max_bucket) AS (VALUES {menu_vals}),
m1 AS (
  SELECT pref_u, pref_b, num_hashes, rpb, max_bucket, CAST(num_hashes // rpb AS INT) AS bands,
         1.0 - CASE rpb WHEN 1 THEN {t} WHEN 2 THEN {t} * {t} ELSE ({t} * {t}) * ({t} * {t}) END AS x
  FROM menu
),
m2 AS (SELECT *, x * x AS x2 FROM m1),
m3 AS (SELECT *, x2 * x2 AS x4 FROM m2),
m4 AS (SELECT *, x4 * x4 AS x8 FROM m3),
m5 AS (SELECT *, x8 * x8 AS x16 FROM m4),
m6 AS (SELECT *, x16 * x16 AS x32 FROM m5),
m7 AS (SELECT *, x32 * x32 AS x64 FROM m6),
m8 AS (SELECT *, x64 * x64 AS x128 FROM m7),
mg AS (
  SELECT pref_u, pref_b, num_hashes, rpb, max_bucket, bands,
         1.0 - CASE bands WHEN 8 THEN x8 WHEN 16 THEN x16 WHEN 32 THEN x32 WHEN 64 THEN x64 ELSE x128 END AS capture_at_threshold
  FROM m8
),
chosen AS (
  SELECT * FROM stats, mg
  ORDER BY (capture_at_threshold >= CAST({capture_target!r} AS DOUBLE)) DESC,
           CASE WHEN capture_at_threshold >= CAST({capture_target!r} AS DOUBLE)
                THEN CAST(CASE WHEN CAST(hot_mass AS DOUBLE) > CAST({scrub_share!r} AS DOUBLE) * CAST(total_mass AS DOUBLE)
                               THEN pref_b ELSE pref_u END AS DOUBLE)
                ELSE -capture_at_threshold END ASC,
           CASE WHEN CAST(hot_mass AS DOUBLE) > CAST({scrub_share!r} AS DOUBLE) * CAST(total_mass AS DOUBLE)
                THEN pref_b ELSE pref_u END ASC
  LIMIT 1
)
SELECT {t} AS threshold,
       n_docs, n_shingles,
       CAST(hot_mass AS DOUBLE) / CAST(total_mass AS DOUBLE) AS hot_shingle_share,
       CAST(hot_mass AS DOUBLE) > CAST({scrub_share!r} AS DOUBLE) * CAST(total_mass AS DOUBLE) AS rec_scrub,
       CASE {budget_frac} ELSE CASE {tie_frac} ELSE CAST({BLOCKING_FRAC_GRID[0]!r} AS DOUBLE) END END AS rec_max_df_frac,
       CASE {budget_est} ELSE CASE WHEN est{k - 1} = est0 THEN est{k - 1} {" ".join(f"WHEN est{i} = est0 THEN est{i}" for i in reversed(range(1, k - 1)))} ELSE est0 END END AS est_capped_pairs,
       CAST(num_hashes AS INT) AS rec_num_hashes,
       CAST(bands AS INT) AS rec_bands,
       CAST(rpb AS INT) AS rec_rows,
       CAST(max_bucket AS INT) AS rec_max_bucket,
       capture_at_threshold
FROM chosen
"""


ORACLE_BLOCKING_AUTOTUNE = _blocking_autotune_oracle()


ORACLE_JOIN_SKEW = """
WITH c AS (SELECT lang AS key, COUNT(*) AS cnt FROM documents GROUP BY lang),
j AS (SELECT key, cnt AS cnt_a, cnt AS cnt_b,
             CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE) AS est_pairs FROM c),
t AS (SELECT SUM(est_pairs) AS tot FROM j)
SELECT key, cnt_a, cnt_b, est_pairs,
       CAST(est_pairs AS DOUBLE) / CAST(tot AS DOUBLE) AS share
FROM j, t ORDER BY est_pairs DESC, key ASC LIMIT 10
"""


def events_raw_selector_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 'unverified events' recon surface (reference ROADMAP.md:78,
    unshipped there; SURVEY §1.1's reserved raw table): a logs-shaped frame
    synthesized DETERMINISTICALLY from the events table (topic0 keyed by
    event_type, indexed-arg arity from event_id parity, payload size
    4..32 bytes from event_id) pushed through the REAL decode-less
    operators — sources.logs.raw_log_source (projection + reserved MapType
    raw column) then selector_profile (per-signature-shape frequency /
    contract-cardinality / block-span / payload stats). The profile is the
    table a user consults to decide which ABI-less signatures carry the
    volume to justify sourcing an ABI; real-EVM-logs coverage of the same
    operators lives in tests/test_raw_logs.py."""
    from apollo_spark.sources.logs import raw_log_source, selector_profile

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")  # events.ts
    e = _t(spark, sf_dir, "events").select("event_id", "event_type", "user_id", "props")
    eid = F.col("event_id").cast("string")
    t0 = F.md5(F.concat(F.lit("t0"), F.col("event_type")))
    t1 = F.md5(F.concat(F.lit("u"), F.col("user_id").cast("string")))
    t2 = F.md5(F.concat(F.lit("x"), eid))
    hexlen = (F.lit(2) * (F.lit(4) + F.pmod("event_id", F.lit(29)))).cast("int")
    data = F.unhex(
        F.substring(
            F.concat(F.md5(F.concat(F.lit("d"), F.col("props"))), F.md5(F.concat(F.lit("e"), eid))),
            F.lit(1),
            hexlen,
        )
    )
    synth = e.select(
        F.lit("ethereum").alias("chain"),
        F.md5(F.concat(F.lit("a"), F.pmod("user_id", F.lit(50)).cast("string"))).alias("address"),
        F.pmod("event_id", F.lit(10000)).alias("block_number"),
        F.md5(F.concat(F.lit("bh"), eid)).alias("block_hash"),
        F.md5(F.concat(F.lit("tx"), eid)).alias("tx_hash"),
        F.pmod("event_id", F.lit(300)).cast("int").alias("tx_index"),
        F.pmod("event_id", F.lit(10)).cast("int").alias("log_index"),
        F.slice(
            F.array(t0, t1, t2), F.lit(1), (F.lit(2) + F.pmod("event_id", F.lit(2))).cast("int")
        ).alias("topics"),
        data.alias("data"),
    )
    return selector_profile(raw_log_source(synth))


ORACLE_RAW_SELECTOR_PROFILE = """
WITH synth AS (
  SELECT md5('t0' || event_type) AS topic0,
         CAST(2 + event_id % 2 AS INT) AS n_topics,
         md5('a' || CAST(user_id % 50 AS VARCHAR)) AS address,
         event_id % 10000 AS block_number,
         CAST(octet_length(unhex(substr(
           md5('d' || props) || md5('e' || CAST(event_id AS VARCHAR)),
           1, CAST(2 * (4 + event_id % 29) AS INT)))) AS BIGINT) AS data_bytes
  FROM events
)
SELECT topic0, n_topics, CAST(COUNT(*) AS BIGINT) AS n_logs,
       CAST(COUNT(DISTINCT address) AS BIGINT) AS n_contracts,
       MIN(block_number) AS first_block, MAX(block_number) AS last_block,
       CAST(SUM(data_bytes) AS BIGINT) AS total_data_bytes,
       MAX(data_bytes) AS max_data_bytes
FROM synth GROUP BY 1, 2
ORDER BY n_logs DESC, topic0 ASC, n_topics ASC
"""


LINEITEM_MONITOR_DSL = """
loop {
  items = [1, 2, 3]
  query xchain_monitor {
    chain = "ethereum"
    source_table = "lineitem"
    filter = [
      l_linenumber == item,
      l_suppkey == 10 || l_partkey == 10
    ]
    save {
      net = item
      block = l_orderkey
      sender = l_suppkey
      receiver = l_partkey
      amount = l_quantity
    }
  }
}
"""


def lineitem_dsl_crosschain_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated twin of dsl.templates.cross_chain_monitor_hcl's
    semantics (reference ROADMAP.md:79 'Cross-chain address monitoring'):
    loop-over-networks UNION under one query name + watched-party
    either-side `||` filter + per-network context save — the exact
    composition the template writes over global event scans (certified
    end-to-end on a real 2-chain EVM log fixture in
    tests/test_raw_logs.py::test_cross_chain_monitor_template_e2e). Here
    the same loop/compile machinery runs over lineitem (networks =
    l_linenumber 1..3, watched party 10 as supplier OR part) so the DuckDB
    oracle replays the published union bit-for-bit."""
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.pipeline import compile_schema
    from apollo_spark.sources.tables import Catalog

    schema = parse_schema(LINEITEM_MONITOR_DSL)
    out = compile_schema(spark, Catalog(spark, sf_dir), schema)
    return out["xchain_monitor"].orderBy("net", "block", "sender", "receiver")


ORACLE_XCHAIN_MONITOR = """
SELECT l_linenumber AS net, l_orderkey AS block, l_suppkey AS sender,
       l_partkey AS receiver, l_quantity AS amount
FROM lineitem
WHERE l_linenumber IN (1, 2, 3) AND (l_suppkey = 10 OR l_partkey = 10)
ORDER BY net, block, sender, receiver
"""
