"""Text-analysis operators for training-data pipelines: language ID
(stopword-hit heuristic), quality scoring, token counting, fingerprinting.

Everything is built from JVM-side column expressions (no Python in the row
path) with semantics simple enough to reproduce exactly in ANSI SQL for the
DuckDB oracle — deliberate: these run inside the per-round correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny public stopword seeds per language (subset chosen for determinism, not
# linguistic completeness — the heuristic is hit-count ratio, CCNet-style).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "de": ["der", "die", "und", "das", "nicht", "ist", "ein", "zu"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "que"],
    "es": ["el", "los", "una", "por", "con", "para", "este", "como"],
}


def _sloppy_cp1252(bs: bytes) -> str:
    """UTF-8 bytes mis-decoded the way broken scrapers do it: cp1252 with a
    latin-1 fallback for cp1252's five undefined bytes (ftfy's
    'sloppy-windows-1252' convention — public)."""
    out = []
    for b in bs:
        try:
            out.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(b))
    return "".join(out)


# The curated repair subset: accented Latin letters + common punctuation.
# A general re-encode(latin1)->decode(utf8) round trip is not expressible in
# ANSI SQL, so the op commits to the table-driven subset BOTH engines replay
# via an identical fixed-order replace chain (longest mojibake first, so the
# 3-char 'â€¦'-family never gets half-eaten by a 2-char rule; chained
# double-encodings resolve deterministically in the same order cross-engine).
# 'Ã' and 'Â' are included so DOUBLE-encoded text unwinds within one pass:
# the chain runs in fixed (-len, char) order, so 'Â©'->'©' then 'Ãƒ'->'Ã'
# then 'Ã©'->'é' turns the twice-corrupted 'cafÃƒÂ©' back into 'café'.
MOJIBAKE_CHARS = "éèêëàâäçîïôöùûüñáíóú’“”–—…°€×Ã©®«»Â"
MOJIBAKE_REPAIRS: list[tuple[str, str]] = sorted(
    ((_sloppy_cp1252(c.encode("utf-8")), c) for c in MOJIBAKE_CHARS),
    key=lambda t: (-len(t[0]), t[1]),
)


def fix_mojibake(text_col) -> Column:
    """Repair UTF-8-mis-decoded-as-cp1252 sequences ('Ã©' -> 'é',
    'â€™' -> RIGHT SINGLE QUOTE, ...) via the MOJIBAKE_REPAIRS chain — the
    data-cleaning step run before tokenization/dedup so a mojibake'd
    re-crawl hashes identically to its clean original. Pure nested
    ``replace`` expressions (JVM-side, no regex, no Python)."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    for bad, good in MOJIBAKE_REPAIRS:
        col = F.replace(col, F.lit(bad), F.lit(good))
    return col


def mojibake_chars_repaired(text_col) -> Column:
    """How many excess characters the repair removed (each hit collapses
    len(bad) chars to 1) — 0 means the text was clean; use as a corruption
    score for filtering or source triage."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return (F.length(col) - F.length(fix_mojibake(col))).cast("long")


def mojibake_oracle_expr(col: str) -> str:
    """The EXACT SQL mirror of fix_mojibake as nested replace() calls, every
    non-ASCII literal built from chr(codepoint) so the oracle text is
    encoding-ambiguity-free."""

    def lit(s: str) -> str:
        return " || ".join(f"chr({ord(ch)})" for ch in s)

    expr = col
    for bad, good in MOJIBAKE_REPAIRS:
        expr = f"replace({expr}, {lit(bad)}, {lit(good)})"
    return expr


def words(text_col) -> Column:
    """Whitespace tokenization of the lowercased text."""
    return F.split(F.trim(F.lower(text_col)), r"\s+")


def token_count(text_col) -> Column:
    """Whitespace token count (empty text -> 0)."""
    return F.when(F.length(F.trim(text_col)) == 0, F.lit(0)).otherwise(F.size(words(text_col)))


def bpe_ish_token_count(text_col) -> Column:
    """BPE-flavored proxy: count word-piece-ish units = words + punctuation
    runs + digit runs (regexp-extracted, GPT-2-ish pre-tokenizer shape)."""
    return F.size(F.regexp_extract_all(F.lower(text_col), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0))


def stopword_hits(text_col, lang: str) -> Column:
    w = words(text_col)
    sw = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    return F.size(F.filter(w, lambda x: F.array_contains(sw, x)))


def language_id(text_col) -> Column:
    """argmax over per-language stopword hit counts; ties and zero hits ->
    'unknown'. Deterministic and SQL-reproducible."""
    hits = [(lang, stopword_hits(text_col, lang)) for lang in STOPWORDS]
    best = F.greatest(*[h for _, h in hits])
    # reversed build so the FIRST language in STOPWORDS wins ties
    result = F.lit("unknown")
    for lang, h in reversed(list(hits)):
        result = F.when((h == best) & (best > 0), F.lit(lang)).otherwise(result)
    return result


def quality_score(text_col) -> Column:
    """Composite [0,1] quality heuristic (Gopher-rules-flavored):
    mean word length in sane band, alpha ratio, stopword presence, length."""
    n_chars = F.length(text_col).cast("double")
    n_words = token_count(text_col).cast("double")
    mean_word_len = F.when(n_words > 0, n_chars / n_words).otherwise(F.lit(0.0))
    alpha_ratio = F.when(
        n_chars > 0,
        F.length(F.regexp_replace(F.lower(text_col), r"[^a-z]", "")).cast("double") / n_chars,
    ).otherwise(F.lit(0.0))
    sw_ratio = F.when(n_words > 0, stopword_hits(text_col, "en").cast("double") / n_words).otherwise(F.lit(0.0))
    len_ok = F.when((n_words >= 5) & (n_words <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    word_len_ok = F.when((mean_word_len >= 3) & (mean_word_len <= 12), F.lit(1.0)).otherwise(F.lit(0.0))
    return (
        F.lit(0.3) * len_ok
        + F.lit(0.2) * word_len_ok
        + F.lit(0.3) * F.least(alpha_ratio * F.lit(1.25), F.lit(1.0))
        + F.lit(0.2) * F.least(sw_ratio * F.lit(5.0), F.lit(1.0))
    )


def quality_keep(
    text_col,
    lang: str = "en",
    min_quality: float = 0.6,
    min_tokens: int = 10,
    lang_pred_col=None,
) -> Column:
    """THE corpus keep predicate (language + rounded quality + token floor)
    — one definition shared by the doc_quality_filter gate and
    curation.curate, so the pipeline and its oracle can never silently
    diverge (round-to-6 matches the SQL mirror's convention).

    ``lang_pred_col`` (column or name) supplies a PRECOMPUTED language
    prediction — the trained-classifier route (:func:`trained_language_id`)
    — replacing the zero-setup stopword heuristic, whose confusion matrix
    on this corpus is documented unusable (langid_confusion_matrix,
    round 6). Production shape: train once, score once, persist the
    (id, pred_lang) table, and pass its column here."""
    if lang_pred_col is not None:
        lang_ok = (
            F.col(lang_pred_col) if isinstance(lang_pred_col, str) else lang_pred_col
        ) == lang
    else:
        lang_ok = language_id(text_col) == lang
    return (
        lang_ok
        & (F.round(quality_score(text_col), 6) >= min_quality)
        & (token_count(text_col) >= min_tokens)
    )


def language_id_model(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "lang",
    buckets: int = 4096,
    iters: int = 7,
    ngram: int = 3,
    salt: str = "lid",
):
    """Train the in-engine language-ID classifier on a LABELED slice:
    joint one-vs-rest batch perceptron (ops.ml.multiclass_perceptron_train)
    over hashed token-trigram features — the fastText recipe (Joulin et al.
    2016) run entirely as relational iterations, every weight an exact
    BIGINT so the training trajectory hash-gates against an unrolled-SQL
    DuckDB oracle. Returns the broadcastable weight table (cls, b, weight).

    The class set is read from the data (distinct ``label_col``), so the
    model covers whatever languages the labeled slice carries. At 100 TB
    the labeled slice is small (human- or lexicon-labeled); weights are
    K*(buckets+1) rows — broadcast to every executor for the scoring
    sweep, the corpus never moves."""
    from apollo_spark.ops.ml import hashed_ngram_features, multiclass_perceptron_train

    feats = hashed_ngram_features(
        df, text_col=text_col, id_col=id_col, n=ngram, buckets=buckets, salt=salt
    )
    classes = df.select(F.col(label_col).alias("cls")).distinct()
    labels = (
        df.select(id_col, label_col)
        .crossJoin(F.broadcast(classes))
        .select(
            id_col,
            "cls",
            F.when(F.col(label_col) == F.col("cls"), 1).otherwise(-1).cast("int").alias("y"),
        )
    )
    return multiclass_perceptron_train(feats, labels, iters=iters, id_col=id_col)


def train_or_load_langid_model(df, path: str | None = None, **kw):
    """Reuse a persisted language-ID weight table if one exists at ``path``
    (a TxTable — transactional, time-travelable), else train via
    :func:`language_id_model` and persist. Same "train once, score
    everywhere" artifact shape as ops.dedup.train_or_load_components: at
    100 TB the model is trained once on the labeled slice and every
    scoring sweep broadcasts the committed weights. ``path=None`` trains
    fresh with no I/O — the self-contained gate path. Concurrent writers:
    see train_or_load_table (loser's commit is an idempotent no-op)."""
    if path is None:
        return language_id_model(df, **kw)
    from apollo_spark.table_format import train_or_load_table

    return train_or_load_table(
        df.sparkSession, path, lambda: language_id_model(df, **kw)
    )


def trained_language_id(
    df,
    weights=None,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "lang",
    buckets: int = 4096,
    iters: int = 7,
    ngram: int = 3,
    salt: str = "lid",
):
    """Per-doc language prediction ``(id_col, pred_lang)`` from the trained
    classifier — argmax over per-class scores with a deterministic
    tie-break (ops.ml.multiclass_predict). Pass ``weights`` (a
    :func:`language_id_model` result, possibly loaded from a persisted
    artifact) to score WITHOUT retraining — the production path; omit it
    to train on ``df``'s own labeled slice first (the self-contained gate
    path).

    Honesty note for the driver corpus: the synthetic documents' text is
    statistically independent of the gold ``lang`` label (token
    distributions converge as N grows — measured round 7), so NO
    classifier can generalize here; the trained model memorizes the
    labeled slice (96% train accuracy at sf0.01, diagonal-dominant
    confusion) which is exactly what the machinery should do and what the
    evaluation queries report. On a real corpus the same pipeline
    generalizes because real text carries the signal."""
    from apollo_spark.ops.ml import hashed_ngram_features, multiclass_predict

    if weights is None:
        weights = language_id_model(
            df,
            text_col=text_col,
            id_col=id_col,
            label_col=label_col,
            buckets=buckets,
            iters=iters,
            ngram=ngram,
            salt=salt,
        )
    feats = hashed_ngram_features(
        df, text_col=text_col, id_col=id_col, n=ngram, buckets=buckets, salt=salt
    )
    return multiclass_predict(feats, weights, id_col=id_col, out_col="pred_lang")


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_rules(text_col, min_words: int = 20) -> dict[str, Column]:
    """The named Gopher quality rule set (Rae et al. 2021, table A1) as
    individual boolean columns — distinct from the composite
    ``quality_score``: these are the published hard filters a
    Gopher/MassiveText-style pipeline applies verbatim.

    * word count within [min_words, 100k] (paper: 50; parameterized down
      for short-doc corpora),
    * mean word length within [3, 10],
    * '#'-to-word ratio < 0.1 and '...'-to-word ratio < 0.3,
    * >= 80% of words contain at least one alphabetic character,
    * at least 2 of the 8 canonical stop words appear,
    * < 90% of lines start with a bullet, < 30% end with an ellipsis.

    Every rule is a built-in-function expression (counts, regexes, list
    filters) — SQL-mirrorable, shuffle-free, whole-stage codegen."""
    toks = words(text_col)
    n_words = token_count(text_col).cast("double")
    nonspace = F.length(F.regexp_replace(text_col, r"\s", "")).cast("double")
    mean_wl = F.when(n_words > 0, nonspace / n_words).otherwise(F.lit(0.0))
    n_hash = (F.length(text_col) - F.length(F.regexp_replace(text_col, r"#", ""))).cast("double")
    n_ellipsis = (
        (F.length(text_col) - F.length(F.replace(text_col, F.lit("..."), F.lit(""))))
        / F.lit(3)
    ).cast("double")
    alpha_words = F.size(F.filter(toks, lambda w: w.rlike("[a-z]"))).cast("double")
    sw_present = None
    for s in GOPHER_STOPWORDS:
        hit = F.when(F.array_contains(toks, s), 1).otherwise(0)
        sw_present = hit if sw_present is None else sw_present + hit
    lines = F.split(text_col, r"\n")
    n_lines = F.size(lines).cast("double")
    bullet_lines = F.size(
        F.filter(lines, lambda ln: F.trim(ln).rlike("^[-*\u2022]\\s"))
    ).cast("double")
    ellipsis_lines = F.size(F.filter(lines, lambda ln: F.trim(ln).rlike(r"\.\.\.$"))).cast(
        "double"
    )
    return {
        "n_words": n_words.cast("long"),
        "rule_word_count": (n_words >= min_words) & (n_words <= 100_000),
        "rule_mean_word_len": (mean_wl >= 3.0) & (mean_wl <= 10.0),
        "rule_hash_ratio": F.when(n_words > 0, n_hash / n_words < 0.1).otherwise(F.lit(False)),
        "rule_ellipsis_ratio": F.when(n_words > 0, n_ellipsis / n_words < 0.3).otherwise(
            F.lit(False)
        ),
        "rule_alpha_words": F.when(n_words > 0, alpha_words / n_words >= 0.8).otherwise(
            F.lit(False)
        ),
        "rule_stopwords": sw_present >= 2,
        "rule_bullet_lines": F.when(n_lines > 0, bullet_lines / n_lines < 0.9).otherwise(
            F.lit(True)
        ),
        "rule_ellipsis_lines": F.when(n_lines > 0, ellipsis_lines / n_lines < 0.3).otherwise(
            F.lit(True)
        ),
    }


def gopher_quality_keep(text_col, min_words: int = 20) -> Column:
    """AND of every Gopher hard filter."""
    rules = gopher_quality_rules(text_col, min_words)
    keep = F.lit(True)
    for name, col in rules.items():
        if name.startswith("rule_"):
            keep = keep & col
    return keep


def fingerprint(text_col) -> Column:
    """Content fingerprint: md5 of the normalized text (lowercase, collapsed
    whitespace). md5 exists identically in DuckDB -> oracle-able."""
    return F.md5(F.trim(F.regexp_replace(F.lower(text_col), r"\s+", " ")))


def rolling_fingerprints(text_col, window: int = 8) -> Column:
    """Winnowing-style document sketch: xxhash64 over every ``window``-word
    shingle, keep the per-document minimum 4 (a tiny robust sketch)."""
    # linear construction (window whole-array slices zipped positionally) —
    # a per-position slice lambda over the inline words() expression would
    # re-run the regex split for every position (O(words^2) per doc)
    w = words(text_col)
    m = F.greatest(F.size(w) - (window - 1), F.lit(1))
    shifted = [F.slice(w, i + 1, m).alias(f"w{i}") for i in range(window)]
    zipped = F.slice(F.arrays_zip(*shifted), 1, m)
    grams = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[f"w{i}"] for i in range(window)])
    )
    hashes = F.transform(grams, lambda g: F.xxhash64(g))
    return F.slice(F.array_sort(hashes), 1, 4)


def chunk_documents(
    df,
    size: int = 512,
    overlap: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Fixed-size character chunks with overlap (stride = size - overlap) —
    the standard context-window prep for training/embedding pipelines.
    Pure JVM expressions (sequence + posexplode + substring): a narrow map,
    no shuffle, no Python. Empty documents yield no chunks."""
    if overlap >= size:
        raise ValueError("overlap must be < size")
    step = size - overlap
    starts = F.sequence(F.lit(0), F.greatest(F.length(text_col) - 1, F.lit(0)), F.lit(step))
    return (
        df.filter(F.length(text_col) > 0)
        .select(F.col(id_col), F.col(text_col), F.posexplode(starts).alias("chunk_id", "__start"))
        .select(
            id_col,
            "chunk_id",
            F.substring(F.col(text_col), F.col("__start") + 1, size).alias("chunk"),
        )
        .withColumn("n_chars", F.length("chunk"))
    )


# -- PII detection / redaction ------------------------------------------------
# Patterns are deliberately RE2-compatible (no lookarounds/backrefs) so the
# SAME strings run in Spark (java.util.regex) and in DuckDB/RE2 oracles.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+?\d[\d\- ]{7,}\d",
}


def pii_counts(text_col) -> dict[str, Column]:
    """Per-kind PII occurrence counts (non-overlapping scan, JVM-side
    regexp_count — no Python in the row path)."""
    return {kind: F.regexp_count(text_col, F.lit(pat)) for kind, pat in PII_PATTERNS.items()}


def pii_scrub(text_col) -> Column:
    """Redact every PII match with a typed placeholder. Order matters:
    emails first (an email contains digit runs the phone pattern could
    partially eat), then IPs, then phones."""
    out = text_col
    for kind in ("email", "ipv4", "phone"):
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out


def bm25_scores(
    df,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
):
    """Okapi BM25 relevance of every matching document to a small query-term
    set (Robertson/Sparck Jones; the Lucene-practical form with
    idf = ln(1 + (N - df + 0.5)/(df + 0.5))).

    All JVM column expressions: one token explode feeds document lengths,
    term frequencies, and document frequencies; N and avgdl are 1-row
    aggregates crossJoined in (scalars, not driver actions). Per-term
    contributions are cast to DECIMAL(38,6) before the per-document sum so
    the total is independent of summation order — exact-parity safe for the
    DuckDB gate (per oracle-fp conventions). avgdl is exact: an integer sum
    divided by an integer count is one IEEE division in both engines.

    Returns (id, bm25) for documents containing >= 1 query term.
    """
    from pyspark.sql import functions as F

    terms = sorted({t.lower() for t in query_terms})
    # empty documents would otherwise contribute a phantom '' token to N and
    # avgdl (split('') -> ['']) — exclude them from the collection stats
    src = df.filter(F.length(F.trim(F.col(text_col))) > 0)
    toks = src.select(F.col(id_col), F.explode(words(F.col(text_col))).alias("term"))
    doclen = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("term").isin(terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    norm = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.col("avgdl")
    )
    contrib = idf * (F.col("tf") * F.lit(k1 + 1.0)) / norm
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(doclen, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn("__c", contrib.cast("decimal(38,6)"))
        .groupBy(id_col)
        .agg(F.sum("__c").cast("double").alias("bm25"))
    )


def lm_cross_entropy(
    docs,
    ref,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Unigram-LM cross-entropy quality score (the CCNet recipe, Wenzek et
    al. 2020 LREC — KenLM stood in by an add-one-smoothed unigram model
    trained in-engine on ``ref``, the trusted/target-domain slice):

        ce(d) = -(1/|d|) * sum_{tok in d} ln p(tok)
        p(tok) = (c_ref(tok) + 1) / (T_ref + V_ref + 1)

    Lower ce = closer to the reference domain; pipelines keep the head/middle
    buckets and drop the tail (CCNet partitions at the ppl terciles).

    Engine-exactness (drives the DuckDB gate): p is a BIGINT/BIGINT IEEE
    division (identical in both engines), ln() is one libm call on identical
    doubles, per-token terms are cast DECIMAL(38,6) before the per-document
    sum (order-independent), and the final divide is one IEEE op — the same
    conventions the BM25 operator pins.

    Scale: the LM is a groupBy over the REFERENCE slice only (small by
    construction — it's the curated target domain) and broadcasts; the corpus
    side is one token explode + map-side broadcast join + one per-doc
    aggregation. T/V are a 1-row aggregate crossJoined in, not driver
    actions. For reference vocabularies too large to broadcast, hash the
    terms into buckets first (the DSIR operator's layout in ops/corpus.py).

    Returns (id, n_tokens, ce) for documents with >= 1 token.
    """
    from pyspark.sql import functions as F

    ref_toks = (
        ref.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.explode(words(F.col(text_col))).alias("term"))
    )
    counts = ref_toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    scal = counts.agg(
        F.sum("c").alias("t_ref"), F.count(F.lit(1)).alias("v_ref")
    )
    toks = (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col), F.explode(words(F.col(text_col))).alias("term"))
    )
    p = (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1)) / (
        F.col("t_ref") + F.col("v_ref") + F.lit(1)
    )
    return (
        toks.join(F.broadcast(counts), "term", "left")
        .crossJoin(F.broadcast(scal))
        .withColumn("__t", F.log(p).cast("decimal(38,6)"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (-F.sum("__t").cast("double") / F.count(F.lit(1)).cast("double")).alias("ce"),
        )
    )


def bigram_cross_entropy(
    docs,
    ref,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.7,
):
    """Interpolated BIGRAM-LM cross-entropy (the KenLM-shaped upgrade of
    lm_cross_entropy's unigram stand-in — CCNet proper filters on an n-gram
    LM, Wenzek et al. 2020):

        ce2(d) = -(1/(|d|-1)) * sum over transitions ln p(w2 | w1)
        p(w2|w1) = lam * c_ref(w1,w2)/c_ref(w1)  (0 when w1 unseen)
                 + (1-lam) * (c_ref(w2)+1)/(T_ref+V_ref+1)

    Jelinek-Mercer interpolation with the add-one unigram as the backoff
    floor — p is never zero, every document scores.

    Engine-exactness: both mixture terms are BIGINT/BIGINT IEEE divisions,
    the mixture is two fixed-order multiply-adds, ln() one libm call,
    per-transition terms DECIMAL(38,6)-summed. Same conventions as the
    unigram op, so the DuckDB gate replays it bit-for-bit.

    Scale: bigram/unigram tables come from the curated REF slice only
    (bounded by construction) and ride broadcasts; the corpus side is one
    bigram explode + two map-side joins + one per-doc agg. For ref tables
    too large to broadcast, drop the broadcast() hints — the joins key on
    (w1, w2)/(w1) and shuffle fine (or hash-bucket as in ops/corpus.py).

    Returns (id, n_bigrams, ce2) for documents with >= 2 tokens.
    """
    from pyspark.sql import functions as F

    def _bigrams(df, *extra):
        w = words(F.col(text_col))
        m = F.size(w) - 1
        zipped = F.slice(
            F.arrays_zip(F.slice(w, 1, m).alias("w1"), F.slice(w, 2, m).alias("w2")), 1, m
        )
        return (
            df.filter(F.size(words(F.col(text_col))) >= 2)
            .select(*extra, F.explode(zipped).alias("__p"))
            .select(*extra, F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2"))
        )

    ref_uni = (
        ref.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.explode(words(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    scal = ref_uni.agg(F.sum("c").alias("t_ref"), F.count(F.lit(1)).alias("v_ref"))
    ref_bi = _bigrams(ref).groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))

    toks = _bigrams(docs, F.col(id_col))
    cu = ref_uni.select(F.col("term").alias("w1"), F.col("c").alias("cu"))
    c2 = ref_uni.select(F.col("term").alias("w2"), F.col("c").alias("c2"))
    pb = F.when(
        F.col("cu") > 0, F.coalesce(F.col("cb"), F.lit(0)) / F.col("cu")
    ).otherwise(F.lit(0.0))
    pu = (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1)) / (
        F.col("t_ref") + F.col("v_ref") + F.lit(1)
    )
    p = F.lit(lam) * pb + F.lit(1.0 - lam) * pu
    return (
        toks.join(F.broadcast(ref_bi), ["w1", "w2"], "left")
        .join(F.broadcast(cu), "w1", "left")
        .join(F.broadcast(c2), "w2", "left")
        .crossJoin(F.broadcast(scal))
        .withColumn("__t", F.log(p).cast("decimal(38,6)"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (-F.sum("__t").cast("double") / F.count(F.lit(1)).cast("double")).alias("ce2"),
        )
    )


def gopher_repetition(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_sep: str = ". ",
):
    """The Gopher repetition-filter signals (Rae et al. 2021, arXiv:2112.11446
    Table A1): per-document duplicate-segment fraction and top-bigram /
    top-trigram token share — the standard "remove self-repetitive documents"
    curation rules.

        dup_seg_frac = (n_segments - n_distinct_segments) / n_segments
        top2_frac    = count(most frequent bigram)  / n_bigrams
        top3_frac    = count(most frequent trigram) / n_trigrams

    All three are integer-ratio IEEE divisions — engine-exact for the gate.
    Documents too short for an n-gram level report 0.0 at that level (the
    Gopher rules pass short docs through; the length rules are separate).

    One token/segment explode per signal with map-side combines; everything
    shuffles on (id, gram) then id — no self-joins, no Python in the row
    path. Returns (id, n_segments, dup_seg_frac, top2_frac, top3_frac).
    """
    import re as _re

    from pyspark.sql import functions as F

    from apollo_spark.ops.corpus import word_ngrams

    base = df.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col).alias("id"), F.col(text_col).alias("__t")
    )
    segs = base.select(
        "id", F.explode(F.split("__t", _re.escape(seg_sep), -1)).alias("seg")
    )
    seg_stats = segs.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.count_distinct("seg").alias("n_distinct"),
    )

    def top_share(n: int, out: str):
        grams = base.select("id", F.explode(word_ngrams(F.col("__t"), n)).alias("g"))
        counts = grams.groupBy("id", "g").agg(F.count(F.lit(1)).alias("c"))
        return counts.groupBy("id").agg(
            (F.max("c").cast("double") / F.sum("c").cast("double")).alias(out)
        )

    return (
        seg_stats.withColumn(
            "dup_seg_frac",
            (F.col("n_segments") - F.col("n_distinct")).cast("double")
            / F.col("n_segments").cast("double"),
        )
        .join(top_share(2, "top2_frac"), "id", "left")
        .join(top_share(3, "top3_frac"), "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_segments",
            "dup_seg_frac",
            F.coalesce("top2_frac", F.lit(0.0)).alias("top2_frac"),
            F.coalesce("top3_frac", F.lit(0.0)).alias("top3_frac"),
        )
    )


def bpe_learn_merges(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    max_word_len: int = 24,
) -> DataFrame:
    """Learn byte-pair-encoding merge rules from a corpus — the tokenizer-
    TRAINING step (Sennrich et al. 2016), distributed as relational
    iterations instead of the usual single-node dictionary loop.

    State is the classic BPE word table: (word as a symbol string, corpus
    frequency) — one row per DISTINCT word, so each round's cost scales with
    vocabulary size, not corpus size; the corpus is scanned exactly once by
    the initial word count. Each round: explode adjacent symbol pairs
    weighted by word frequency (one map-side-combined groupBy), take the
    max-count pair under a deterministic (count desc, left asc, right asc)
    tie-break, then apply the merge to every word.

    Merge application uses the DOUBLED-SPACE invariant: symbols are joined
    by two spaces (" a  b  c "), so each pair occurrence " l  r " owns its
    boundary spaces exclusively and a plain left-to-right non-overlapping
    ``replace`` — identical semantics in Spark, DuckDB, Python — performs
    exactly the greedy BPE merge scan ("a a a a" -> "aa aa", never "aa a a"
    or overlap artifacts). That makes the whole trajectory engine-exact, so
    the op carries a DuckDB oracle with unrolled iterations.

    Words are truncated to ``max_word_len`` chars (standard: length-cap the
    word table so pathological tokens don't dominate). Returns
    (merge_rank, left, right, pair_count) — the ordered rule table a
    tokenizer applies at encode time.

    Scale notes: the per-round driver `first()` on the 1-row argmax is the
    synchronization point every iterative algorithm has; the word table is
    re-persisted per round and old state unpersisted. For thousands of
    merges, batch rules per round (top-k non-conflicting) — not needed for
    the gate sizes here.
    """
    from apollo_spark.ops.cache import coalesce_tiny_state

    spark = df.sparkSession

    toks = F.explode(words(F.col(text_col))).alias("w")
    sym = F.concat(
        F.lit(" "),
        F.concat_ws("  ", F.filter(F.split(F.col("w"), ""), lambda c: c != F.lit(""))),
        F.lit(" "),
    )
    wf = (
        df.select(toks)
        .filter((F.length("w") > 0) & (F.length("w") <= max_word_len))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(sym.alias("s"), "n")
        .persist()
    )
    rules: list[tuple[int, str, str, int]] = []
    cur, prev = wf, None
    # word-table rounds are tiny-state iterations: coalesce each round's
    # pair-count shuffle by BYTES (1 task for a KB-scale vocabulary, grows
    # with the vocab at scale), not the session's default parallelism
    with coalesce_tiny_state(spark):
        for rank in range(1, n_merges + 1):
            arr = F.split(F.trim("s"), "  ")
            m = F.greatest(F.size(arr) - 1, F.lit(0))
            zipped = F.slice(
                F.arrays_zip(F.slice(arr, 1, m).alias("l"), F.slice(arr, 2, m).alias("r")), 1, m
            )
            pairs = cur.select("n", F.explode(zipped).alias("p")).select(
                F.col("p")["l"].alias("l"), F.col("p")["r"].alias("r"), "n"
            )
            best = (
                pairs.groupBy("l", "r")
                .agg(F.sum("n").alias("c"))
                .orderBy(F.col("c").desc(), F.col("l").asc(), F.col("r").asc())
                .limit(1)
                .first()
            )
            # the argmax action above materialized `cur`'s cache (its first
            # use) — only NOW is the previous round's table safe to drop;
            # unpersisting it before this action would force every round to
            # rebuild the whole replace chain from wf (O(n_merges^2)
            # recomputation)
            if prev is not None and prev is not wf:
                prev.unpersist()
            if best is None or best["c"] is None:
                break
            l, r, c = best["l"], best["r"], int(best["c"])
            rules.append((rank, l, r, c))
            pat, rep = F.lit(f" {l}  {r} "), F.lit(f" {l}{r} ")
            cur, prev = cur.select(F.replace(F.col("s"), pat, rep).alias("s"), "n").persist(), cur
    if cur is not wf:
        cur.unpersist()
    if prev is not None and prev is not wf and prev is not cur:
        prev.unpersist()  # normal exhaustion leaves the penultimate table cached
    wf.unpersist()
    return spark.createDataFrame(rules, "merge_rank int, left string, right string, pair_count long")


def bpe_token_counts(
    df: DataFrame,
    rules: list[tuple[str, str]],
    text_col: str = "text",
    group_col: str = "source",
    max_word_len: int = 24,
) -> DataFrame:
    """Apply an ordered BPE merge-rule list at ENCODE time and report token
    mass per group: (group, n_words, n_chars, n_bpe_tokens).

    The encode cost trick mirrors training: merges are applied to the
    DISTINCT word table (vocabulary-sized), then per-group token counts are
    an exact-integer join-and-sum against per-(group, word) occurrence
    counts — the corpus is scanned once and no merge work repeats per
    occurrence. Words longer than ``max_word_len`` bypass BPE (they were
    never in the training table) and count one token per character, keeping
    encode and training caps consistent. All integer arithmetic; oracle-exact.
    """
    toks = F.explode(words(F.col(text_col))).alias("w")
    occ = (
        df.select(F.col(group_col).alias("g"), toks)
        .filter(F.length("w") > 0)
        .groupBy("g", "w")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    sym = F.concat(
        F.lit(" "),
        F.concat_ws("  ", F.filter(F.split(F.col("w"), ""), lambda c: c != F.lit(""))),
        F.lit(" "),
    )
    enc = occ.select("w").distinct().filter(F.length("w") <= max_word_len).select(
        "w", sym.alias("s")
    )
    s = F.col("s")
    for l, r in rules:
        s = F.replace(s, F.lit(f" {l}  {r} "), F.lit(f" {l}{r} "))
    enc = enc.select("w", F.size(F.split(F.trim(s), "  ")).cast("long").alias("n_sym"))
    joined = occ.join(enc, "w", "left")
    n_tok = F.coalesce("n_sym", F.length("w").cast("long"))
    return (
        joined.groupBy(F.col("g").alias(group_col))
        .agg(
            F.sum("n_occ").alias("n_words"),
            F.sum(F.col("n_occ") * F.length("w")).cast("long").alias("n_chars"),
            F.sum(F.col("n_occ") * n_tok).cast("long").alias("n_bpe_tokens"),
        )
    )


def nfc_normalize(text_col) -> Column:
    """Unicode NFC normalization as an Arrow-batched scalar pandas UDF —
    the canonical-composition cleanup (é as one codepoint, ligature/width
    folding stays OUT: NFC is the lossless form dedup and tokenization
    want before hashing; NFKC would conflate distinct content).

    Python in the row path is the right call here: the JVM has no NFC
    built-in, unicodedata implements the same UAX#15 tables DuckDB's
    nfc_normalize uses (oracle-verified identical), and Arrow batching
    amortizes the crossing. NULLs pass through."""
    from pyspark.sql.functions import pandas_udf

    def _nfc(s):
        import unicodedata

        return s.map(lambda x: unicodedata.normalize("NFC", x) if x is not None else None)

    # annotate via __annotations__ so the hint resolver sees pd.Series without
    # a module-level pandas import in this otherwise JVM-only module
    import pandas as pd

    _nfc.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_nfc, "string")(text_col)


def winnowing_fingerprints(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    w: int = 5,
):
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003 — the
    MOSS algorithm): hash every positional word k-gram, slide a w-window over
    the hash sequence, keep the leftmost minimum of each window.  Guarantees
    every shared run of >= w+k-1 words between two documents yields a shared
    fingerprint, with ~2/(w+1) selection density.

    Relational formulation: ONE shuffle on id_col, one sort, three pipelined
    Window operators over the same (id, pos) ordering, zero joins and zero
    distinct exchanges —
    * ``wmin``  = MIN(h)                 over [CURRENT, w-1 FOLLOWING];
    * ``selp``  = MIN_BY(p, (h, p))      over the same frame (leftmost-min,
      deterministic tie-break in both engines);
    * window validity via LEAD(p, w-1) (positions are dense, so a full
      window exists iff a row w-1 ahead does; p = 0 keeps the one truncated
      window of a document shorter than w grams);
    * dedup via LAG: once a position stops being selected it can never be
      selected again (any later-entering smaller hash outlives it in every
      subsequent window), so selections form consecutive runs and
      ``selp != lag(selp)`` is exactly DISTINCT — without the extra
      shuffle DISTINCT would cost.  (The SQL oracle keeps the
      self-join + MIN(pos) formulation — two independent derivations of the
      same selection rule hash-matching is a stronger gate than one
      translated plan.)

    Hashes are 60-bit md5 prefixes, so the op is SQL-oracle-replayable.
    Documents shorter than k words contribute their whole text as one gram.

    Returns (id_col, pos, fp) — the selected k-gram positions and their
    60-bit fingerprints.
    """
    from pyspark.sql import Window as W

    from apollo_spark.ops.dedup import normalize_text
    from apollo_spark.ops.sketch import portable_hash60

    # materialize the token array as a column before the per-position lambda:
    # an inline split expression would be RE-EVALUATED by every slice() in
    # the transform (O(positions * full-regex-splits) per doc — the same
    # trap measured at 14s -> <1s in tfidf_cosine_pairs)
    base = df.select(F.col(id_col), F.split(normalize_text(F.col(text_col)), " ").alias("__wa"))
    wa = F.col("__wa")
    m = F.greatest(F.size(wa) - (k - 1), F.lit(1))
    grams = F.transform(F.sequence(F.lit(1), m), lambda i: F.concat_ws(" ", F.slice(wa, i, k)))
    g = base.select(F.col(id_col), F.posexplode(grams).alias("p", "__s")).select(
        id_col, "p", portable_hash60(F.col("__s")).alias("h")
    )
    ow = W.partitionBy(id_col).orderBy("p")
    owf = ow.rowsBetween(0, w - 1)
    return (
        g.withColumn("wmin", F.min("h").over(owf))
        .withColumn("selp", F.min_by("p", F.struct("h", "p")).over(owf))
        .withColumn("__nxt", F.lead("p", w - 1).over(ow))
        .filter(F.col("__nxt").isNotNull() | (F.col("p") == 0))
        .withColumn("__prev", F.lag("selp").over(ow))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col("selp")))
        .select(F.col(id_col), F.col("selp").alias("pos"), F.col("wmin").alias("fp"))
    )
