"""Corpus curation ops for training-data pipelines: token-budget sampling,
deterministic training order, and benchmark decontamination.

These are the selection/ordering steps between "deduped documents" and "a
training mix": cap each source at a token budget, shuffle deterministically
(so the run is reproducible and resumable), and drop documents that overlap
eval benchmarks. All three are pure JVM column plans — one shuffle each, no
Python in the row path — so they hold at 100 TB:

* token budget: one window over (by) — partition-parallel across sources;
* training order: one global sort on a hash key (Spark's range-partitioned
  sort, the standard distributed shuffle-for-training);
* decontamination: benchmark n-grams are tiny (eval sets are small by
  definition) — broadcast them; the corpus side is a narrow explode+join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def whitespace_tokens(col: Column) -> Column:
    """Whitespace tokenization with an empty-string guard (split('') yields
    [''] — one phantom token)."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_budget_sample(
    df: DataFrame,
    budget_tokens: int,
    by: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep documents per ``by`` group, in ``order_col`` order, until the
    group's cumulative whitespace-token count exceeds ``budget_tokens``
    (the document that crosses the budget is the last one kept).

    The standard "cap each source at N tokens" mix step. One shuffle on
    ``by``; the running sum is a window over the group — per-source
    parallelism, no global bottleneck. Deterministic given ``order_col``
    (use a hash order upstream for an unbiased cap)."""
    w = Window.partitionBy(by).orderBy(F.col(order_col).asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        df.withColumn("n_tokens", F.size(whitespace_tokens(F.col(text_col))).cast("long"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter((F.col("cum_tokens") - F.col("n_tokens")) < budget_tokens)
    )


def _bucket_offsets(base: DataFrame, weight: Column) -> DataFrame:
    """The 256-row cumulative-offset frame of the two-phase global-order
    pattern: ``base`` must carry ``__b`` (first two hex chars of the md5
    order key — a string PREFIX, so bucket order == hash order, which is the
    correctness invariant of the whole scheme). Returns (__b, __off) where
    __off = total ``weight`` mass of all preceding buckets. Combined with a
    256-way-parallel per-bucket window, this reproduces a global running
    sum/rank bit-exactly without ever collapsing the corpus into the single
    task an unpartitioned window would."""
    w_b = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    return (
        base.groupBy("__b")
        .agg(F.sum(weight).alias("__bm"))
        .withColumn("__off", F.coalesce(F.sum("__bm").over(w_b), F.lit(0)))
        .select("__b", "__off")
    )


def training_order(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic pseudo-random global order: rank by md5(salt || id).

    Training runs need a shuffled-but-reproducible document order; md5 is
    engine-portable (same bytes in Spark, DuckDB, Python) unlike xxhash64
    whose seeds differ per engine. Change ``salt`` per epoch for a fresh
    permutation. Global rank = per-bucket row_number + broadcast bucket
    offsets (_bucket_offsets) — bit-identical to the naive global window,
    256-way parallel."""
    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    base = df.withColumn("shuffle_key", h).withColumn("__b", F.substring(h, 1, 2))
    w_in = Window.partitionBy("__b").orderBy(F.col("shuffle_key").asc(), F.col(id_col).asc())
    return (
        base.withColumn("__r", F.row_number().over(w_in))
        .join(F.broadcast(_bucket_offsets(base, F.lit(1))), "__b")
        .withColumn("train_rank", (F.col("__off") + F.col("__r")).cast("long"))
        .drop("__b", "__r", "__off")
    )


def word_ngrams(text_col: Column, n: int) -> Column:
    """Lowercased word n-grams as space-joined strings (array; empty when
    the document has fewer than n words).

    Linear construction: n whole-array slices zipped positionally (the same
    form as dedup.shingles) — the per-position ``slice`` lambda alternative
    is one slice per word, O(words^2) per document, and dominated runtime on
    long documents."""
    w = F.split(F.lower(F.trim(text_col)), r"\s+")
    m = F.greatest(F.size(w) - (n - 1), F.lit(0))  # number of n-grams
    shifted = [F.slice(w, i + 1, m).alias(f"w{i}") for i in range(n)]
    zipped = F.slice(F.arrays_zip(*shifted), 1, m)
    grams = F.transform(zipped, lambda s: F.concat_ws(" ", *[s[f"w{i}"] for i in range(n)]))
    return F.when(F.size(w) >= n, grams).otherwise(F.array().cast("array<string>"))


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """(id, n_shared) for corpus documents sharing >= 1 word ``n``-gram with
    any benchmark document — the eval-contamination scan (the n-gram-overlap
    method used by large-LM training pipelines).

    Benchmark sets are small, so their distinct grams broadcast; the corpus
    side explodes to (id, gram) — narrow, no self-join. The broadcast join is
    map-side, so it runs BEFORE any shuffle: the only wide exchange is the
    per-doc distinct count over grams that actually hit the benchmark set (a
    tiny fraction of the corpus), never over the full corpus gram stream.
    n_shared counts DISTINCT shared grams."""
    bench_grams = (
        benchmark.select(F.explode(word_ngrams(F.col(text_col), n)).alias("g")).distinct()
    )
    doc_grams = docs.select(
        F.col(id_col), F.explode(word_ngrams(F.col(text_col), n)).alias("g")
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "g")
        .groupBy(id_col)
        .agg(F.count_distinct("g").alias("n_shared"))
    )


def hash_bucket(id_col: Column, buckets: int = 100) -> Column:
    """Deterministic integer hash bucket (Knuth multiplicative): pure BIGINT
    arithmetic, so any engine computes the identical bucket — the primitive
    for reproducible sampling that survives reruns and engine swaps."""
    return (id_col.cast("long") * F.lit(2654435761)) % buckets


def stratified_hash_sample(
    df: DataFrame,
    rates: dict[str, int] | None,
    by: str = "source",
    id_col: str = "doc_id",
    default_pct: int = 30,
) -> DataFrame:
    """Per-group deterministic sampling: keep a row iff its id's hash bucket
    falls under the group's percentage. Unlike ``sample()``, membership is a
    pure function of the id — stable across reruns, partitionings, and
    engines (the property training-data pipelines need for resumability).
    A narrow filter: no shuffle, no RNG state."""
    bucket = hash_bucket(F.col(id_col))
    rate: Column = F.lit(default_pct)
    for k, v in (rates or {}).items():
        rate = F.when(F.col(by) == k, F.lit(v)).otherwise(rate)
    return df.withColumn("bucket", bucket).filter(F.col("bucket") < rate)


def hashed_ngram_features(text_col: Column, buckets: int = 1024, n: int = 2) -> Column:
    """Hashed unigram+``n``-gram feature buckets (one entry per occurrence,
    multiplicity preserved — DSIR counts features, not distinct features).
    Bucket = first 8 md5 hex chars as an integer mod ``buckets`` — the
    engine-portable hash (xxhash64 seeds differ between Spark and DuckDB;
    md5 does not). Unigrams are lowercased to match ``word_ngrams`` (one
    canonical token form across feature orders)."""
    grams = F.concat(whitespace_tokens(F.lower(text_col)), word_ngrams(text_col, n))
    return F.transform(
        grams,
        lambda g: (F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long") % buckets).cast("int"),
    )


def dsir_importance(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """Data Selection with Importance Resampling (Xie et al., NeurIPS 2023):
    per-document log importance weight log w(x) = sum_f count_f(x) *
    ln(p_target(f) / p_corpus(f)) over hashed n-gram features — the standard
    cheap way to upweight corpus documents that look like a target domain
    before resampling a training mix.

    Spark shape: both distributions are ``buckets``-row aggregates with
    Laplace smoothing ((c + alpha) / (total + alpha*buckets)); the log-ratio
    table is broadcast (it is at most ``buckets`` rows regardless of corpus
    size) and joined against per-document bucket counts — one explode + two
    shuffles total, no Python in the row path. Per-bucket contributions are
    cast to DECIMAL(38,6) before the per-document sum, making the total
    independent of summation order (exact oracle parity; ln() itself is the
    only cross-engine ulp risk and is absorbed by the 6dp quantization).

    Returns (id, logw) for every corpus document (docs with zero features
    get logw = 0).
    """
    feats = lambda df: df.select(
        F.col(id_col).alias("__id"),
        F.explode(hashed_ngram_features(F.col(text_col), buckets)).alias("__b"),
    )
    tgt = feats(target).groupBy("__b").agg(F.count(F.lit(1)).alias("__ct"))
    cor = feats(corpus).groupBy("__b").agg(F.count(F.lit(1)).alias("__cc"))
    tgt_total = tgt.agg(F.sum("__ct").alias("__tt"))
    cor_total = cor.agg(F.sum("__cc").alias("__ct_all"))
    # full bucket domain so unseen-in-target buckets still get smoothed mass
    dom = corpus.sparkSession.range(buckets).select(F.col("id").cast("int").alias("__b"))
    ratios = (
        dom.join(tgt, "__b", "left")
        .join(cor, "__b", "left")
        .crossJoin(tgt_total)
        .crossJoin(cor_total)
        .select(
            "__b",
            F.log(
                ((F.coalesce("__ct", F.lit(0)) + F.lit(alpha)) / (F.col("__tt") + F.lit(alpha * buckets)))
                / ((F.coalesce("__cc", F.lit(0)) + F.lit(alpha)) / (F.col("__ct_all") + F.lit(alpha * buckets)))
            ).alias("__lr"),
        )
    )
    doc_counts = feats(corpus).groupBy("__id", "__b").agg(F.count(F.lit(1)).alias("__n"))
    contribs = doc_counts.join(F.broadcast(ratios), "__b").withColumn(
        "__c", (F.col("__n") * F.col("__lr")).cast("decimal(38,6)")
    )
    per_doc = contribs.groupBy("__id").agg(F.sum("__c").cast("double").alias("logw"))
    return (
        corpus.select(F.col(id_col).alias("__id"))
        .join(per_doc, "__id", "left")
        .select(F.col("__id").alias(id_col), F.coalesce("logw", F.lit(0.0)).alias("logw"))
    )


def unimax_weights(
    lang_tokens: DataFrame,
    budget_tokens: int | Column,
    max_epochs: int = 4,
    lang_col: str = "lang",
    tokens_col: str = "lang_tokens",
) -> DataFrame:
    """UniMax language-mixture allocation (Chung et al. 2023): spread a token
    budget across languages as uniformly as possible, capping each language
    at ``max_epochs`` passes over its data.

    Waterfilling closed form: sort languages by cap u_i = c_i * E ascending;
    a language is *capped* (gets all of u_i) while
    ``u_i * (n - i + 1) + prefix_{i-1} <= B`` — with ascending u this flag is
    a prefix, so the water level is ``tau = (B - prefix_k) / (n - k)`` for k =
    last capped index, and every uncapped language gets exactly tau.

    Scale posture: the frame has one row per LANGUAGE (hundreds at most), so
    the single-partition global window is the right plan — the heavy part is
    the upstream per-language token count, one map-side-combined groupBy. The
    condition arithmetic is all BIGINT-exact; tau and the weights are single
    IEEE divisions of exact integers, deterministic across engines (no
    order-dependent float summation anywhere).

    Output per language: cap_tokens, is_capped, alloc_tokens, weight (share
    of the realized budget), epochs_used.
    """
    w_ord = Window.orderBy("__u", lang_col)
    w_all = Window.partitionBy()
    n = F.count(F.lit(1)).over(w_all)
    prefix = F.sum("__u").over(w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    b = F.lit(budget_tokens) if isinstance(budget_tokens, int) else budget_tokens
    base = (
        lang_tokens.select(
            F.col(lang_col),
            F.col(tokens_col).cast("long").alias("__c"),
            (F.col(tokens_col).cast("long") * F.lit(max_epochs)).alias("__u"),
            b.cast("long").alias("__b"),
        )
        .withColumn("__i", F.row_number().over(w_ord))
        .withColumn("__n", n)
        .withColumn("__prefix", prefix)
        .withColumn(
            "__capped",
            (F.col("__u") * (F.col("__n") - F.col("__i") + 1) + F.col("__prefix") - F.col("__u"))
            <= F.col("__b"),
        )
    )
    k = F.sum(F.when(F.col("__capped"), 1).otherwise(0)).over(w_all)
    prefix_k = F.coalesce(
        F.max(F.when(F.col("__capped"), F.col("__prefix"))).over(w_all), F.lit(0)
    )
    base = base.withColumn("__k", k).withColumn("__pk", prefix_k)
    tau = F.when(
        F.col("__n") > F.col("__k"),
        (F.col("__b") - F.col("__pk")).cast("double")
        / (F.col("__n") - F.col("__k")).cast("double"),
    ).otherwise(F.lit(0.0))
    base = base.withColumn("__tau", tau)
    alloc = F.when(F.col("__capped"), F.col("__u").cast("double")).otherwise(F.col("__tau"))
    total = F.col("__pk").cast("double") + F.col("__tau") * (F.col("__n") - F.col("__k")).cast("double")
    return base.select(
        F.col(lang_col),
        F.col("__c").alias("lang_tokens"),
        F.col("__u").alias("cap_tokens"),
        F.col("__capped").cast("int").alias("is_capped"),
        alloc.alias("alloc_tokens"),
        (alloc / total).alias("weight"),
        (alloc / F.col("__c").cast("double")).alias("epochs_used"),
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "",
) -> DataFrame:
    """GPT-style concat-then-chunk sequence packing: documents, in a
    deterministic pseudo-random order, are laid end-to-end on one global
    token tape; training sequence k owns tape positions
    [k*seq_len, (k+1)*seq_len). Each document reports where it landed:
    start_pos, the first/last sequence it touches, and its offset inside the
    first sequence. No padding waste; documents may straddle boundaries (the
    standard pretraining tradeoff).

    Scale posture — the global running sum is NOT a single global window
    (that collapses 100 TB into one task). The order key md5(salt||id)
    is uniform, so its first two hex chars define 256 ORDERED buckets:
    per-bucket running sums are a partitionBy window (256-way parallel,
    AQE-balanced), and the global offset of each bucket is a broadcast of 256
    cumulative totals. Exact global order = (bucket, h, id); everything is
    BIGINT arithmetic, so the layout is bit-reproducible in any engine.
    """
    h = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    base = df.select(
        F.col(id_col),
        h.alias("__h"),
        F.substring(h, 1, 2).alias("__b"),
        F.size(whitespace_tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    w_in = Window.partitionBy("__b").orderBy(F.col("__h").asc(), F.col(id_col).asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    base = base.withColumn("__cum_in", F.sum("n_tokens").over(w_in))
    offs = _bucket_offsets(base, F.col("n_tokens"))
    start = F.col("__off") + F.col("__cum_in") - F.col("n_tokens")
    end = F.col("__off") + F.col("__cum_in") - 1  # inclusive last token pos
    return (
        base.join(F.broadcast(offs), "__b")
        .filter(F.col("n_tokens") > 0)
        .select(
            id_col,
            "n_tokens",
            start.alias("start_pos"),
            F.floor(start / F.lit(seq_len)).cast("long").alias("seq_first"),
            F.floor(end / F.lit(seq_len)).cast("long").alias("seq_last"),
            (start % F.lit(seq_len)).alias("offset_in_seq"),
        )
    )


def sentence_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget_words: int = 64,
) -> DataFrame:
    """RAG-style retrieval chunking: split each document into SENTENCES
    (terminal ``.!?`` followed by whitespace), then assign consecutive
    sentences to chunks by FLOOR-BUCKETED word position — a sentence joins
    chunk ``floor(words_before_it / budget_words)``. No sentence is ever
    split mid-way, and chunks average ~budget words. Note this is floor
    bucketing on the GLOBAL running count, not a greedy
    reset-at-each-boundary packer: an overrunning sentence's excess carries
    into the position of later boundaries, and a single sentence spanning
    >= 2x budget makes the next sentence skip chunk ids (ids are
    monotonically increasing per document but NOT guaranteed dense) — the
    trade that keeps the rule a pure window expression, replayable
    verbatim in ANSI SQL. Deterministic: same text -> same chunk ids,
    texts, and hashes in any engine — the sentence splitter is a
    capture-group marker substitution (no lookbehind, so it replays in RE2
    engines like DuckDB's), and the running word count is integer
    arithmetic over per-document windows (bounded frames, never
    corpus-sized). Any pre-existing U+001E record separators in the text
    are normalized to spaces first so scraped control chars can't forge
    sentence boundaries. Whitespace is matched with the explicit class
    ``[ \\t\\n\\f\\r]`` rather than ``\\s`` because Java regex ``\\s``
    matches U+000B (vertical tab) while RE2/DuckDB ``\\s`` does not — with
    the explicit class a vertical tab is a non-space character in BOTH
    engines, so real scraped text containing one splits identically.

    Returns (id, chunk_id, n_sentences, n_words, chunk_hash, chunk_text).
    """
    if budget_words < 1:
        raise ValueError("budget_words >= 1 required")
    marker = "\x1e"
    clean = F.translate(F.trim(F.col(text_col)), marker, " ")
    sent_arr = F.split(
        F.regexp_replace(clean, r"([.!?])[ \t\n\f\r]+", "$1" + marker), marker
    )
    sents = (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col).alias("id"), F.posexplode(sent_arr).alias("sidx", "sentence"))
        .filter(F.length(F.trim("sentence")) > 0)
        .select(
            "id",
            "sidx",
            F.trim("sentence").alias("sentence"),
            F.size(F.split(F.trim("sentence"), r"[ \t\n\f\r]+")).cast("long").alias("n_words"),
        )
    )
    w_before = Window.partitionBy("id").orderBy("sidx").rowsBetween(
        Window.unboundedPreceding, -1
    )
    chunked = sents.withColumn(
        "chunk_id",
        F.floor(F.coalesce(F.sum("n_words").over(w_before), F.lit(0)) / F.lit(budget_words)),
    )
    chunk_text = F.concat_ws(
        " ",
        F.transform(F.array_sort(F.collect_list(F.struct("sidx", "sentence"))), lambda x: x["sentence"]),
    )
    return (
        chunked.groupBy("id", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_sentences"),
            F.sum("n_words").alias("n_words"),
            chunk_text.alias("chunk_text"),
        )
        .select(
            F.col("id").alias(id_col),
            "chunk_id",
            "n_sentences",
            "n_words",
            F.md5("chunk_text").alias("chunk_hash"),
            "chunk_text",
        )
    )


def phrase_blocklist_hits(
    df: DataFrame,
    phrases: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    phrase_col: str = "phrase",
) -> DataFrame:
    """Multi-word blocklist matching at corpus scale (the RefinedWeb-style
    banned-phrase curation step): a phrase hits a document iff it appears as
    a word-boundary-aligned word sequence (lowercased) — never substring
    matching, so blocking 'ass' cannot flag 'class'. For each distinct word
    LENGTH in the blocklist, the document's word n-grams of that length join
    the phrases by equality — one keyed hash join per length, no per-row
    scan over the blocklist (a million-phrase list costs a few joins, not a
    million contains() per document). The only driver-side action is
    collecting the distinct phrase LENGTHS (bounded by the longest phrase —
    a handful of ints, never data-sized).

    Returns (id, phrase, n_hits): one row per (document, phrase) with the
    occurrence count."""
    p = (
        phrases.select(F.lower(F.trim(F.col(phrase_col))).alias("g"))
        .filter(F.length("g") > 0)
        .distinct()
        .withColumn("__n", F.size(F.split("g", r"\s+")))
    )
    lengths = sorted(r["__n"] for r in p.select("__n").distinct().collect())
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))
    outs = []
    for n in lengths:
        grams = base.select("id", F.explode(word_ngrams(F.col("__t"), n)).alias("g"))
        outs.append(grams.join(p.filter(F.col("__n") == n).select("g"), "g"))
    if not outs:
        spark = df.sparkSession
        return spark.createDataFrame([], f"id long, phrase string, n_hits long")
    hits = outs[0]
    for o in outs[1:]:
        hits = hits.unionByName(o)
    return hits.groupBy("id", F.col("g").alias("phrase")).agg(
        F.count(F.lit(1)).alias("n_hits")
    )


def phrase_blocklist_filter(
    df: DataFrame,
    phrases: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    phrase_col: str = "phrase",
) -> DataFrame:
    """Keep only documents with ZERO blocklist hits — the filter face of
    phrase_blocklist_hits (one anti-join on the flagged ids)."""
    flagged = phrase_blocklist_hits(df, phrases, id_col, text_col, phrase_col).select(
        F.col("id").alias(id_col)
    ).distinct()
    return df.join(flagged, id_col, "left_anti")


def mixture_weights_temperature(
    group_tokens: DataFrame,
    alpha: float,
    by: str = "source",
    tokens_col: str = "group_tokens",
) -> DataFrame:
    """Temperature-based sampling weights (multilingual-pretraining
    standard, e.g. XLM-R): p_i = n_i^alpha / sum_j n_j^alpha. alpha=1 is
    proportional sampling, alpha->0 approaches uniform; 0.3-0.7 are the
    usual smoothing values.

    Float policy: n^alpha is one pow() on an exact BIGINT (same IEEE result
    in any engine), quantized to DECIMAL(38,6) so the normalizing sum is
    exact and order-independent; the final weight is a single double
    division. Frame is one row per group — the broadcast crossJoin of the
    total is the whole shuffle story; the heavy groupBy that produced
    ``group_tokens`` happens upstream."""
    p = F.round(F.pow(F.col(tokens_col).cast("double"), F.lit(float(alpha))), 6).cast(
        "decimal(38,6)"
    )
    scored = group_tokens.select(
        F.col(by), F.col(tokens_col).cast("long").alias("n_tokens"), p.alias("__p")
    )
    tot = scored.agg(F.sum("__p").alias("__tot"))
    return scored.crossJoin(F.broadcast(tot)).select(
        by,
        "n_tokens",
        F.col("__p").cast("double").alias("smoothed_mass"),
        (F.col("__p").cast("double") / F.col("__tot").cast("double")).alias("weight"),
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    by: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES): each row draws u ~ Uniform(0,1) from an md5 hash of its
    id and ranks by u^(1/w) — the top-k of that key is an exact weighted
    sample. Used to pick a quality-weighted corpus subset reproducibly.

    Everything is engine-portable: u = (h+1)/(16^13+1) from the md5 prefix
    (same bytes in Spark/DuckDB), the key compared in log space
    (ln(u)/w — monotone in u^(1/w), one ln + one division, identical IEEE
    results), ties broken by id. ``by`` makes it a per-group top-k (window);
    global top-k otherwise (TakeOrdered — no full sort materializes).
    Rows with weight <= 0 are excluded (zero-probability mass)."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 13), 16, 10).cast(
        "decimal(20,0)"
    )
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float(16**13 + 1))
    key = F.log(u) / F.col(weight_col).cast("double")
    scored = (
        df.filter(F.col(weight_col).cast("double") > 0)
        .withColumn("__key", key)
    )
    if by is not None:
        w = Window.partitionBy(by).orderBy(F.col("__key").desc(), F.col(id_col).asc())
        return (
            scored.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= k)
            .drop("__r")
            .withColumnRenamed("__key", "sample_key")
        )
    return (
        scored.orderBy(F.col("__key").desc(), F.col(id_col).asc())
        .limit(k)
        .withColumnRenamed("__key", "sample_key")
    )


def skipgram_pairs(
    df: DataFrame,
    window: int = 2,
    subsample_t: float | None = 1e-3,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "sg",
) -> DataFrame:
    """word2vec-style (center, context) skip-gram pair counts (Mikolov et
    al. 2013), the training-data prep for embedding models:

    1. frequent-word SUBSAMPLING: occurrence (doc, pos, w) survives iff
       ``u < (sqrt(f/t) + 1) * (t/f)`` with ``f = c(w)/T`` and ``u`` a
       deterministic md5-hash uniform of the occurrence — the standard
       aggressive downweighting of stopword-like tokens, made reproducible
       (and oracle-replayable) by hashing instead of RNG;
    2. survivors re-compact to consecutive positions per doc (word2vec
       pairs over the POST-drop stream, so dropped words widen effective
       context);
    3. pairs: every (center, context) with 1 <= |Δpos| <= ``window`` via an
       offset explode + equi-join on (doc, pos+off) — never a theta-join.

    Scale shape: token frequencies broadcast (vocabulary-bounded); the
    re-compaction window partitions by doc (bounded rows per doc); the
    pairing is ``2*window`` copies of the kept stream equi-joined on
    (doc, pos) keys; final counts map-side combine. Returns
    ``(center, context, n)``.
    """
    from apollo_spark.ops.sketch import portable_hash60

    toks = df.select(
        F.col(id_col).alias("__id"), F.posexplode(whitespace_tokens(F.lower(F.col(text_col)))).alias("pos", "w")
    )
    if subsample_t is not None:
        freq = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
        tot = freq.agg(F.sum("c").alias("t_all"))
        occ_key = F.concat_ws(":", F.col("__id"), F.col("pos"), F.col("w"))
        u = portable_hash60(occ_key, salt) / F.lit(float(1 << 60))
        f = F.col("c") / F.col("t_all")
        p_keep = (F.sqrt(f / F.lit(subsample_t)) + F.lit(1.0)) * (F.lit(subsample_t) / f)
        toks = (
            toks.join(F.broadcast(freq), "w")
            .crossJoin(F.broadcast(tot))
            .filter(u < p_keep)
            .select("__id", "pos", "w")
        )
    w_recompact = Window.partitionBy("__id").orderBy(F.col("pos").asc())
    kept = toks.withColumn("p", F.row_number().over(w_recompact) - 1).select("__id", "p", "w")
    offs = F.array(*[F.lit(o) for o in range(-window, window + 1) if o != 0])
    centers = kept.select(
        "__id", F.col("w").alias("center"), F.explode(offs).alias("__off"), (F.col("p") + F.col("__off")).alias("p2")
    )
    contexts = kept.select("__id", F.col("p").alias("p2"), F.col("w").alias("context"))
    return (
        centers.join(contexts, ["__id", "p2"])
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def split_assignment(
    df: DataFrame,
    id_col: str = "doc_id",
    fractions: tuple[int, int] = (96, 2),
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: split is a pure function of
    the row id (md5-prefix bucket 0..99), so membership is stable across
    reruns, repartitionings, and engines — no RNG, no shuffle, a narrow map.
    ``fractions`` = (train_pct, val_pct); the remainder is test.  The md5
    bucket (not Knuth multiplicative) deliberately decorrelates from
    ``hash_bucket`` so sampling and splitting never alias each other.
    """
    from apollo_spark.ops.sketch import portable_hash60

    train_pct, val_pct = fractions
    b = portable_hash60(F.col(id_col).cast("string"), salt=salt) % 100
    return df.withColumn(
        "split",
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )
