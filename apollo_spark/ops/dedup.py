"""Deduplication family for large-scale text corpora (north-star mandate).

All operators take a DataFrame with (id_col, text_col) and are built for the
100 TB posture: no driver-side loops, no crossJoin of the full corpus —
candidate generation always goes through bucketed shuffles whose width is
controlled by the signature parameters, and pair verification only touches
bucket-mates.

Scale notes per operator:
* exact_dedup      — one shuffle on a 128-bit content hash.
* minhash_lsh      — b bands x r rows: P(candidate) = 1-(1-j^r)^b; the band
                     join shuffles (band, band-signature) keys only.
* simhash          — 64-bit fingerprint; near-dup = bucket collision on
                     rotated prefixes (hamming<=k probabilistic).
* ngram_jaccard    — inverted-index candidate join on rare shingles, exact
                     verify; the rare-shingle cap bounds bucket fan-out.
* embedding_cosine — see similarity.py (LSH hyperplane buckets).

Components are resolved with iterative min-label propagation (alternating
frontier joins), the standard Spark connected-components loop; iterations are
O(diameter) which for dup-clusters is tiny.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from apollo_spark.ops.cache import scoped_persist


def normalize_text(col):
    """Canonical text form shared by the dedup family: lowercase, collapse
    whitespace, strip. Mirrors what public pipelines (CCNet/Gopher-style) do
    before hashing."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", keep: str = "min_id"
) -> DataFrame:
    """Keep one row per distinct normalized text — survivor = min id
    (default) or longest raw text, tie-break min id (``keep="longest"`` —
    same policy names as dedup_losers, so the DSL `keep` attribute means the
    same thing for every method). Deterministic, oracle-able; single
    hash-shuffle on the content digest."""
    if keep not in ("min_id", "longest"):
        raise ValueError(f"keep must be min_id|longest, got {keep!r}")
    keyed = df.withColumn("__key", F.md5(normalize_text(F.col(text_col))))
    order = (
        [F.length(F.col(text_col)).desc(), F.col(id_col).asc()]
        if keep == "longest"
        else [F.col(id_col).asc()]
    )
    w = Window.partitionBy("__key").orderBy(*order)
    return keyed.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__key", "__rn")


def exact_dup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, canonical_id) for every row, canonical = min id of its exact-dup
    group — the assignment view of exact_dedup."""
    keyed = df.select(F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("__key"))
    w = Window.partitionBy("__key")
    return keyed.withColumn("canonical_id", F.min(id_col).over(w)).select(id_col, "canonical_id")


def shingles(col, n: int = 3):
    """Word n-gram shingle array (distinct).

    Overlapping n-grams come from ONE compiled-regex pass over the
    normalized string: a lookahead group captures the n-word window while
    the scanner consumes one word per match. The previous slice+arrays_zip+
    transform build was linear too, but transform() is an interpreted
    higher-order function evaluated per shingle — the regex is ~2x faster
    at corpus scale and bit-identical (pinned by the oracle gate across
    every shingle consumer). Texts shorter than n words yield one
    whole-text shingle (the normalized string itself — it IS the
    space-joined word sequence).
    """
    norm = normalize_text(col)
    w = F.split(norm, " ")
    if n == 1:
        return F.array_distinct(w)
    pat = r"(?=((?:\S+ ){%d}\S+))\S+ ?" % (n - 1)
    grams = F.regexp_extract_all(norm, F.lit(pat), 1)
    return F.array_distinct(F.when(F.size(w) < n, F.array(norm)).otherwise(grams))


def minhash_signature(shingle_col, num_hashes: int = 64):
    """num_hashes minhash values: ONE xxhash64 over each shingle string, then
    per-slot re-hash of that 8-byte long with a seed column — fixed-width
    re-hashing is ~the cost of a multiply but can't overflow under ANSI mode,
    and xxhash64 gives a proper independent family."""
    base = F.transform(shingle_col, lambda s: F.xxhash64(s))
    # ONE fold over the shingle hashes with a num_hashes-wide running-min
    # accumulator — per-slot array_min re-traversed the array num_hashes
    # times (3.5x slower at 5k docs). Empty input yields all-null slots,
    # matching array_min's semantics on an empty array.
    seeds = F.array(*[F.lit(i) for i in range(num_hashes)])
    max_long = (1 << 63) - 1
    fold = F.aggregate(
        base,
        F.array_repeat(F.lit(max_long).cast("long"), num_hashes),
        lambda acc, h: F.zip_with(acc, seeds, lambda a, i: F.least(a, F.xxhash64(h, i))),
    )
    return F.when(F.size(shingle_col) == 0, F.array_repeat(F.lit(None).cast("long"), num_hashes)).otherwise(fold)


def _band_ladder_pairs(
    sig: DataFrame,
    banded: DataFrame,
    num_hashes: int,
    rows: int,
    max_bucket: int | None,
    max_bucket_mode: str,
    key_fn,
) -> DataFrame:
    """Shared mega-bucket guard over a banded signature frame — the
    recursive banding ladder used by BOTH the portable (md5) and fast
    (xxhash64) MinHash paths; see the max_bucket_mode docstring on
    _minhash_band_candidates for semantics and the two pytest-pinned
    invariants (subgraph of the raw pairs; identical component partition).
    ``sig`` = (id, m0..m{num_hashes-1}); ``banded`` = (id, bkey) at the base
    geometry; ``key_fn(level, band, slot_cols) -> Column`` builds a level's
    band key in that path's hash family. Returns candidate (id_a, id_b)
    rows BEFORE dedup."""

    def _pairs(frame: DataFrame) -> DataFrame:
        left = frame.select(F.col("id").alias("id_a"), F.col("bkey").alias("ka"))
        right = frame.select(F.col("id").alias("id_b"), F.col("bkey").alias("kb"))
        return left.join(
            right, (left["ka"] == right["kb"]) & (left["id_a"] < right["id_b"])
        ).select("id_a", "id_b")

    if max_bucket is None:
        return _pairs(banded)
    if max_bucket_mode not in ("reband", "drop"):
        raise ValueError(f"max_bucket_mode must be 'reband' or 'drop', got {max_bucket_mode!r}")
    # the guarded path reads `banded` several times (the hot-bucket count,
    # both split probes, both self-join sides, the per-level emptiness
    # check) and each read re-evaluated the full band-key md5 projection —
    # cut it once; rows are (id, bkey) scalars, linear in corpus x bands
    banded = banded.localCheckpoint(eager=True)

    def _split(frame: DataFrame, cap: int) -> tuple[DataFrame, DataFrame]:
        # hot keys are FEW by construction (each needs > cap members
        # agreeing on this level's slot run) -> broadcast both probes
        hotk = (
            frame.groupBy("bkey")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > int(cap))
            .select("bkey")
        )
        return (
            frame.join(F.broadcast(hotk), "bkey", "left_anti"),
            frame.join(F.broadcast(hotk), "bkey", "left_semi"),
        )

    def _star(frame: DataFrame) -> DataFrame:
        hub = frame.groupBy("bkey").agg(F.min("id").alias("id_a"))
        return (
            frame.join(hub, "bkey")
            .filter(F.col("id") != F.col("id_a"))
            .select("id_a", F.col("id").alias("id_b"))
        )

    cold, hot = _split(banded, max_bucket)
    cand = _pairs(cold)
    if max_bucket_mode == "drop":
        return cand
    level, r_cur = 0, rows
    while True:
        # EARLY EXIT when no bucket exceeds the cap (round 10): on uniform
        # corpora the ladder never engages, yet the loop used to run every
        # level — log2(num_hashes/rows) eager localCheckpoints and
        # deep-slot key expressions over EMPTY frames (~12 s of the 256-hash
        # bench line at sf0.1, measured). One cheap head-1 probe per level;
        # output identical (star/descend of an empty hot set adds nothing).
        if hot.isEmpty():
            break
        cand = cand.unionByName(_star(hot))
        r_next = r_cur * 2
        if r_cur >= num_hashes or num_hashes % r_next != 0:
            break
        level += 1
        members = hot.select("id").distinct()
        keys = [
            key_fn(level, b, [F.col(f"m{b * r_next + j}") for j in range(r_next)])
            for b in range(num_hashes // r_next)
        ]
        cur = (
            sig.join(members, "id", "left_semi")
            .select("id", F.explode(F.array(*keys)).alias("bkey"))
            # materialize each level: _split + pairs + the next level's
            # membership all re-read it, and without a cut the recompute
            # fans out ~5x PER LEVEL through the previous levels' lineage
            # (measured 303 s vs ~30 s at sf1). Levels shrink
            # geometrically, so the checkpointed frames are small.
            .localCheckpoint(eager=True)
        )
        cold, hot = _split(cur, max_bucket * 4**level)
        cand = cand.unionByName(_pairs(cold))
        r_cur = r_next
    return cand


def scrub_hot_shingles(
    base: DataFrame, scrub_max_df_frac: float, frac_floor: int = 1
) -> DataFrame:
    """Shingle-level boilerplate scrub: drop every shingle whose document
    frequency exceeds ``greatest(floor(scrub_max_df_frac * n_docs),
    frac_floor)`` from the (id, sh) frame and return the cleaned (id, sh)
    sets — documents left with NO informative shingles are dropped (they
    carry only boilerplate).

    ``frac_floor`` (default 1, the same convention as ngram_jaccard_pairs /
    blocking_config_profile): without it, a corpus with
    ``n_docs < 1/scrub_max_df_frac`` (e.g. < 25 docs at the default 0.04)
    gets ``floor(frac*n_docs) = 0``, every shingle (df >= 1) counts as hot,
    and ALL documents are scrubbed away — near-dedup would silently return
    zero pairs even for exact duplicates. The floor guarantees df = 1
    shingles (necessarily informative) always survive.

    This is the upstream fix for the LSH boilerplate pathology measured in
    BASELINE.md round-8 #2: a structural line shared by 10% of a crawl makes
    its shingles the argmin of every container (mega band buckets) AND
    inflates pairwise Jaccard between otherwise-unrelated docs (a quadratic
    truth clique). Removing hot shingles BEFORE signatures/scoring deletes
    that edge mass at its source — similarity is then measured over the
    informative remainder, which is what a dedup decision should use.
    strip_hot_lines is the text-level form of the same idea for corpora
    with line structure; this form needs none.

    Scale: one vocabulary-sized df count (map-combinable), one anti-join
    against the hot set (shuffled, not broadcast — at 100 TB the hot
    vocabulary can itself be large), one regroup. The corpus-size cutoff is
    a 1-row scalar crossJoin (no driver action)."""
    # the df count and the anti-join regroup both read the exploded raw
    # shingling; persist so the shingles() regex pass runs once, and hand
    # the cache handle to the caller via the returned frame's scope
    ex = base.select("id", F.explode("sh").alias("s")).persist()
    nd = base.agg(F.count(F.lit(1)).alias("__n_docs"))
    cut = F.greatest(
        F.floor(F.lit(float(scrub_max_df_frac)) * F.col("__n_docs")),
        F.lit(int(frac_floor)),
    )
    hot = (
        ex.groupBy("s")
        .agg(F.count(F.lit(1)).alias("__df"))
        .crossJoin(F.broadcast(nd))
        .filter(F.col("__df") > cut)
        .select("s")
    )
    return scoped_persist(
        ex.join(hot, "s", "left_anti")
        .groupBy("id")
        .agg(F.collect_set("s").alias("sh")),
        ex,
    )


def _shingle_base(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    scrub_max_df_frac: float | None = None,
) -> DataFrame:
    """(id, sh) shingle-set frame shared by the near-dup pair generators;
    ``scrub_max_df_frac`` routes through scrub_hot_shingles. Under scrub the
    exploded raw shingling is persisted inside scrub_hot_shingles (the df
    count and the anti-join regroup both read it) and attached to the
    returned frame's cache scope — release_caches on any frame that carries
    the returned frame releases it transitively."""
    raw = df.select(F.col(id_col).alias("id"), shingles(F.col(text_col), n).alias("sh")).filter(
        F.size("sh") > 0
    )
    if scrub_max_df_frac is None:
        return raw
    return scrub_hot_shingles(raw, scrub_max_df_frac)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    max_bucket: int | None = None,
    max_bucket_mode: str = "reband",
    scrub_max_df_frac: float | None = None,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    shingle -> minhash(num_hashes) -> band buckets -> self-join per band ->
    exact-jaccard verify on candidates only. Band join keys are
    (band_idx, band_signature) so the shuffle never sees the corpus cross
    product; verify recomputes true jaccard from the shingle sets.

    ``max_bucket``/``max_bucket_mode``: the same production mega-bucket
    guard as the portable path (_minhash_band_candidates) — the recursive
    banding ladder keeps boilerplate-glued buckets from going quadratic
    while preserving the candidate graph's component partition. Default
    None preserves the historical raw geometry (this path's gates are
    rows-only, so the guard is opt-in here rather than the certified
    default).

    ``scrub_max_df_frac``: shingle-level boilerplate scrub (see
    scrub_hot_shingles) — hot shingles are removed before signatures AND
    before the exact-jaccard verify, so boilerplate-only similarity never
    produces a pair.
    """
    rows = num_hashes // bands
    spark = df.sparkSession
    # small corpora arrive as one parquet split; spread the CPU-bound
    # shingle/hash work across cores (at lake scale the scan is already
    # multi-split and this coalesces to the shuffle width, not a blow-up)
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    base = _shingle_base(
        df.repartition(parts, F.col(id_col)), id_col, text_col, n, scrub_max_df_frac
    ).persist()
    # signature via explode + grouped min: each shingle is string-hashed ONCE,
    # each of the num_hashes slots is a cheap fixed-width re-hash, and the
    # groupBy gets map-side partial mins (array_min-over-transform x64 would
    # re-evaluate the base hash array per slot — 64x the work)
    from apollo_spark.ops.sqlwide import sql_over

    hashed = base.select("id", F.explode("sh").alias("s")).select("id", F.xxhash64("s").alias("h"))
    # wide generated SQL (one py4j roundtrip), not num_hashes F.min chains —
    # same parsed expressions; see ops/sqlwide.py for the measured driver cost
    sig = sql_over(
        hashed,
        "SELECT id, "
        + ", ".join(f"min(xxhash64(h, {i})) AS m{i}" for i in range(num_hashes))
        + " FROM {v} GROUP BY id",
    )
    # band key = xxhash64(band_idx, r signature slots): a scalar long, so the
    # self-join is a plain shuffled hash join (array-typed keys would force a
    # nested-loop plan); hash collisions are harmless because the verify stage
    # recomputes exact jaccard.
    banded = sql_over(
        sig,
        "SELECT id, explode(array("
        + ", ".join(
            "xxhash64({b}, {cols})".format(
                b=b, cols=", ".join(f"m{b * rows + j}" for j in range(rows))
            )
            for b in range(bands)
        )
        + ")) AS bkey FROM {v}",
    )
    cand = _band_ladder_pairs(
        sig,
        banded,
        num_hashes,
        rows,
        max_bucket,
        max_bucket_mode,
        # distinct per-level key space in this path's hash family (string
        # level tag; cross-space collisions are harmless — verify rechecks)
        lambda level, b, slots: F.xxhash64(F.lit(f"R{level}"), F.lit(b), *slots),
    ).dropDuplicates(["id_a", "id_b"])
    # round-10 verify (same stack as the portable path): lossless
    # size-ratio prune on a sizes-only join, then exact jaccard over
    # xxhash64-hashed shingle arrays — array<long> payload instead of raw
    # strings (~3x fewer shuffle bytes; |hash(A) ∩ hash(B)| = |A ∩ B|
    # absent a 2^-64 within-pair collision). This path's gate is
    # rows-only, and the sf10 payload ceiling the portable path measured
    # applies identically here.
    sizes = base.select("id", F.size("sh").alias("ns"))
    cand = (
        cand.join(sizes.select(F.col("id").alias("id_a"), F.col("ns").alias("ns_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("ns").alias("ns_b")), "id_b")
        .filter(
            F.least("ns_a", "ns_b").cast("double")
            >= F.lit(float(threshold)) * F.greatest("ns_a", "ns_b").cast("double")
        )
    )
    hs_map = base.select("id", F.transform("sh", lambda s: F.xxhash64(s)).alias("hs"))
    cand = (
        cand.join(hs_map.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a")), "id_a")
        .join(hs_map.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b")), "id_b")
    )
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    union = F.col("ns_a") + F.col("ns_b") - inter
    return scoped_persist(
        cand.withColumn("jaccard", inter.cast("double") / union.cast("double"))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard"),
        base,
    )


def simhash64(text_col, n: int = 2, bits: int = 64):
    """64-bit SimHash over word n-gram features, built entirely from JVM
    expressions: per-feature xxhash64, per-bit +/-1 votes, sign -> bit.

    The per-bit vote is an F.aggregate over the feature-hash array (bits
    passes over the array, all inside codegen — no Python in the row path).
    """
    sh = shingles(text_col, n)
    hashes = F.transform(sh, lambda s: F.xxhash64(s))
    # bit b's mask; bit 63 must be the signed-long sign bit, not 2^63
    # (Java long overflow)
    masks = F.array(*[F.lit((1 << b) if b < 63 else -(1 << 63)).cast("long") for b in range(bits)])
    # ONE fold over the feature array with a `bits`-wide vote accumulator —
    # the per-bit formulation (bits separate F.aggregate folds) re-traversed
    # the array per bit and ran 26x slower at 5k docs
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(acc, masks, lambda a, m: a + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1)),
    )
    return F.aggregate(
        F.zip_with(votes, masks, lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def simhash_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2, prefix_bits: int = 16) -> DataFrame:
    """Candidate near-dup pairs by SimHash: bucket on 4 rotated prefix blocks
    (any pair within hamming distance ~<= 3 collides in >=1 block w.h.p.),
    then verify hamming distance via bit_count."""
    sig = df.select(F.col(id_col).alias("id"), simhash64(F.col(text_col), n).alias("sim"))
    blocks = 64 // prefix_bits
    keyed = sig.withColumn(
        "bk",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned(F.col("sim"), i * prefix_bits)
                        .bitwiseAND(F.lit((1 << prefix_bits) - 1).cast("long"))
                        .alias("key"),
                    )
                    for i in range(blocks)
                ]
            )
        ),
    )
    a = keyed.select(F.col("id").alias("id_a"), F.col("sim").alias("sim_a"), F.col("bk").alias("ka"))
    b = keyed.select(F.col("id").alias("id_b"), F.col("sim").alias("sim_b"), F.col("bk").alias("kb"))
    cand = (
        a.join(b, (a["ka"] == b["kb"]) & (a["id_a"] < b["id_b"]))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
    )
    return cand.select("id_a", "id_b", "hamming")


# Distinct default sentinel: lets the mutual-exclusion check tell "caller
# explicitly passed max_df=100_000" apart from "caller left the default" —
# any EXPLICIT max_df combined with max_df_frac must raise.
_MAX_DF_DEFAULT = 100_000


class _MaxDfDefault(int):
    pass


_MAX_DF_SENTINEL = _MaxDfDefault(_MAX_DF_DEFAULT)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    threshold: float = 0.2,
    max_df: int | None = _MAX_DF_SENTINEL,
    max_df_frac: float | None = None,
    frac_floor: int = 0,
    scrub_max_df_frac: float | None = None,
) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs (id_a < id_b, jaccard >= t).

    Candidate generation is a lossless inverted-index self-join: any pair
    with jaccard > 0 shares at least one shingle, so joining on exploded
    shingles (then dedup) reaches every qualifying pair — no probabilistic
    recall loss, unlike MinHash. The shuffle fans out quadratically in the
    document frequency of each shingle — one hot bigram ("of the") at 100 TB
    is a df^2 explosion on a single join key.

    ``max_df`` bounds that fan-out: shingles with document frequency > max_df
    are dropped from the inverted index (candidate generation only — emitted
    Jaccard scores stay exact). A pair whose shared shingles are ALL hotter
    than max_df is missed; such pairs share only ultra-common n-grams and sit
    far below any useful threshold. The DEFAULT is a finite 100_000 cap: at
    100 TB a single df=10^6 shingle alone would shuffle 10^12 candidate rows,
    so lossless-by-default is a scale hazard. Pass ``max_df=None`` for the
    certified-lossless config (the oracle queries do so explicitly).

    ``max_df_frac`` is the scale-relative form of the same cap (sklearn's
    max_df semantics): a shingle is hot when its df exceeds
    floor(frac * corpus size). The cutoff is computed IN-PLAN (scalar count
    agg joined onto the df table — no driver action), so the op stays a
    single lazy DataFrame and the hot set tracks corpus growth: at 10x the
    data the same fraction prunes the same boilerplate, where an absolute
    max_df silently stops pruning. Mutually exclusive with ``max_df``.

    ``frac_floor`` (with ``max_df_frac``) puts an absolute minimum under the
    relative cutoff: hot iff df > max(floor(frac * n_docs), frac_floor). At
    tiny corpus sizes a bare fraction is pathological — floor(0.04 * 5) = 0
    prunes EVERY shared shingle and recall collapses to set-equality; a floor
    of e.g. 1024 makes small inputs effectively lossless (nothing has df that
    high) while the fraction takes over exactly where pruning starts to
    matter. 0 (default) preserves the pure-fraction semantics.

    Capped-path exactness: intersection counts over the pruned index
    undercount pairs that also share hot shingles by at most
    min(hot_a, hot_b) (hot_d = shingles of d dropped from the index). Since
    jaccard = I/(n_a+n_b-I) is increasing in I, that gives tight per-pair
    bounds; pairs whose bound interval is a point (or entirely below the
    threshold) are decided from counts alone, and only the ambiguous sliver
    is re-scored exactly from the full shingle arrays. With no shingle over
    the cap the plan degenerates to the lossless one.

    Mega-cluster recovery: documents whose shingles are ALL hotter than the
    cap (content duplicated more than max_df times — the most important
    dedup target) are re-covered via an exact shingle-set hash, emitted as
    jaccard-1.0 STAR pairs (cluster-canonical min id -> member, not the
    inherently quadratic all-pairs) — connected components reconstruct the
    full cluster. The residual recall loss of the cap is only
    near-identical-but-unequal members of such clusters.

    ``scrub_max_df_frac`` (scrub_hot_shingles): removes hot shingles from
    the shingle SETS themselves — unlike max_df/max_df_frac (candidate
    generation only; scores stay lossless), scrub changes the measured
    similarity to "jaccard over informative shingles", deleting
    boilerplate-driven edge mass at its source.
    """
    spark = df.sparkSession
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    base = _shingle_base(
        df.repartition(parts, F.col(id_col)), id_col, text_col, n, scrub_max_df_frac
    ).persist()
    # shingles() is distinct per doc, so |A ∩ B| = the number of shared
    # shingle postings per pair — a count aggregate over the inverted-index
    # join, and |A ∪ B| = |A| + |B| - |A ∩ B|. Counting instead of carrying
    # full shingle arrays through the shuffle (array_intersect/union per
    # candidate) cuts shuffle width from O(doc length) to O(1) per posting.
    # Length filter (Arasu et al. / PPJoin lemma): jaccard(A,B) <= min/max of
    # the set sizes, so any pair with min(n_a,n_b) < t*max(n_a,n_b) cannot
    # reach the threshold. Applying it AS A JOIN PREDICATE kills those pairs
    # before the per-pair aggregation instead of after it; the 1e-9 slack
    # keeps the prune conservative against double rounding at the boundary
    # (the final exact `jaccard >= threshold` filter still decides inclusion).
    # Carrying n in the postings costs 8 bytes/posting and removes both
    # post-aggregation size joins — sizes ride along as grouping keys (they
    # are functionally dependent on the ids).
    ex = base.select("id", F.size("sh").alias("n"), F.explode("sh").alias("s"))
    len_ok = (F.col("a.n") >= threshold * F.col("b.n") - 1e-9) & (
        F.col("b.n") >= threshold * F.col("a.n") - 1e-9
    )
    if max_df_frac is not None:
        if max_df is not None and not isinstance(max_df, _MaxDfDefault):
            raise ValueError("pass max_df or max_df_frac, not both")
        dfreq = ex.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
        # scale-relative cutoff, computed in-plan: 1-row scalar agg broadcast
        # onto the (small, <= |vocab|^n rows) df table
        total = base.agg(F.count(F.lit(1)).alias("n_docs"))
        cutoff = F.greatest(
            F.floor(F.lit(max_df_frac) * F.col("n_docs")), F.lit(int(frac_floor))
        )
        hot = dfreq.crossJoin(F.broadcast(total)).filter(F.col("df") > cutoff)
        idx = ex.join(F.broadcast(hot.select("s")), "s", "left_anti")
    elif max_df is None:
        idx = ex
    else:
        hot = ex.groupBy("s").agg(F.count(F.lit(1)).alias("df")).filter(F.col("df") > max_df)
        idx = ex.join(F.broadcast(hot.select("s")), "s", "left_anti")
    # CAPPED paths: the pruned inverted index feeds both self-join branches
    # AND the per-doc kept-count — persist so the explode + df-count +
    # anti-join chain runs once, not three times (guide §5; the capped
    # before-plan carried 159 Exchange nodes of exactly this duplication).
    # The LOSSLESS config (idx is ex) deliberately stays unpersisted: its
    # only two readers are the self-join branches, and re-running the
    # explode off the persisted base fuses into each branch's codegen
    # cheaper than a cache materialization barrier (A/B-measured).
    if idx is not ex:
        idx = idx.persist()
    inter = (
        idx.alias("a")
        .join(
            idx.alias("b"),
            (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")) & len_ok,
        )
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )

    def _jac(i):
        return i.cast("double") / (F.col("n_a") + F.col("n_b") - i).cast("double")

    if max_df is None and max_df_frac is None:
        # lossless: the pruned-index intersection count IS the exact
        # intersection, so jaccard falls out of counts alone
        j = inter.withColumn("jaccard", _jac(F.col("inter")))
        return scoped_persist(
            j.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard"), base, idx
        )
    # capped: bound the hot-shingle undercount per pair. hot_d = full size -
    # rows surviving the prune; true I is in [inter, inter + min(hot_a, hot_b)].
    kept = idx.groupBy("id").agg(F.count(F.lit(1)).alias("n_kept"))
    # (id, n) per doc straight off the cached base — the old
    # ex.dropDuplicates(["id"]) re-ran the shingle explode over the corpus
    # and shuffled one row per POSTING just to recover one row per doc
    hot_of = base.select("id", F.size("sh").alias("n")).join(kept, "id", "left").select(
        "id", (F.col("n") - F.coalesce("n_kept", F.lit(0))).alias("n_hot")
    )
    bounded = (
        inter.join(hot_of.select(F.col("id").alias("id_a"), F.col("n_hot").alias("hot_a")), "id_a")
        .join(hot_of.select(F.col("id").alias("id_b"), F.col("n_hot").alias("hot_b")), "id_b")
        .withColumn("i_max", F.col("inter") + F.least("hot_a", "hot_b"))
    )
    # decided from counts: bound interval is a point (no shared-hot ambiguity)
    tight = (
        bounded.filter(F.col("i_max") == F.col("inter"))
        .withColumn("jaccard", _jac(F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    # ambiguous sliver: upper bound clears the threshold but I isn't pinned —
    # re-score exactly from full shingle arrays (few rows carry wide arrays)
    maybe = bounded.filter(
        (F.col("i_max") > F.col("inter")) & (_jac(F.col("i_max")) >= threshold)
    ).select("id_a", "id_b")
    rescored = (
        maybe.join(base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.size("sh_a") + F.size("sh_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    # mega-cluster recovery: a document duplicated more often than max_df has
    # EVERY shingle pruned (n_kept is null) and would otherwise vanish from
    # the index entirely — the worst possible miss, since the most-duplicated
    # content is the primary dedup target. Those fully-pruned docs are
    # re-covered exactly: identical shingle SETS pair up with jaccard 1.0
    # through a window partitioned on the sorted shingle array ITSELF (not a
    # hash of it — an md5 collision between distinct sets would emit a false
    # jaccard-1.0 pair, and the DuckDB oracle groups on the exact list, so
    # grouping on the array keeps the two paths formally equivalent). Shuffle
    # cost is one row per fully-pruned doc, never df^2. Near-identical-but-
    # unequal members of a mega-cluster remain the documented recall loss.
    pruned_out = (
        base.join(kept, base["id"] == kept["id"], "left_anti")
        .select("id", F.array_sort("sh").alias("seth"))
    )
    w_set = Window.partitionBy("seth").orderBy("id")
    exact_pairs = (
        pruned_out.withColumn("id_a", F.first("id").over(w_set))
        .filter(F.col("id") != F.col("id_a"))
        .select("id_a", F.col("id").alias("id_b"), F.lit(1.0).alias("jaccard"))
    )
    return scoped_persist(tight.unionByName(rescored).unionByName(exact_pairs), base, idx)


def _tfidf_dot_agg(w: DataFrame):
    """Exactness-preserving fast path for the pair-cardinality dot SUM.

    The dot product sums per-term weight products cast to DECIMAL(38,6).
    A declared sum precision of 38 (> 18 digits) forces Spark's hash
    aggregate to store each group's buffer as a 16-byte binary and box a
    BigDecimal on EVERY update — measured 43x slower than a long sum over
    the identical 36M-row / 10M-group shape. But a decimal(38,6) is an
    integer count of 10^-6: summing the UNSCALED int64 values is the same
    exact, order-independent integer arithmetic, and reconstructing
    decimal(38,6) from the total (x 10^-6, exact multiply) yields the
    IDENTICAL (unscaled, scale) representation the decimal sum produces —
    so the final cast to double is bit-identical.

    Safe only while no per-row unscaled value, no partial sum, and no
    group total can leave int64. Certificate (one vocabulary-sized pass
    over the persisted ``w``; conservative double arithmetic): every
    joined product |wa*wb| appears under exactly one shared term, and
    sum_{pairs in term t} |wa*wb| <= (sum_{i in t} |w_i|)^2 / 2 = S_t^2/2,
    while cast-to-decimal rounding adds <= 0.5 per product row and the
    row count is sum_t C(df_t, 2) <= sum_t df_t^2 / 2. So
    sum|unscaled| <= (1e6 * sum_t S_t^2 + sum_t df_t^2) / 2; the check
    requires 4x that bound below 2^62, swamping the double summation
    error. Any partial sum of int64 addends is bounded by sum|addends|,
    so overflow is impossible in any order. Corpora exceeding the bound
    (or an empty w) keep the exact DECIMAL(38,6) aggregation — identical
    results either way, hash-gated.

    Returns a function mapping the raw product Column to the aggregate
    expression ``dot`` (double)."""
    from decimal import Decimal

    row = (
        w.groupBy("term")
        .agg(
            F.sum(F.abs(F.col("w"))).alias("s"),
            F.count(F.lit(1)).cast("double").alias("c"),
        )
        .agg(
            F.sum(F.col("s") * F.col("s")).alias("ss"),
            F.sum(F.col("c") * F.col("c")).alias("cc"),
        )
        .collect()[0]
    )
    ss, cc = row["ss"], row["cc"]
    safe = ss is not None and (ss * 1e6 + cc) * 2.0 < float(1 << 62)
    # the long-sum/decimal switch is invisible at runtime (results proven
    # identical) — log the choice and the bound so a boundary-crossing
    # corpus is diagnosable (round-10 ADVICE)
    import logging

    logging.getLogger(__name__).debug(
        "tfidf dot agg path=%s ss=%s cc=%s bound=%.3e limit=%.3e",
        "unscaled-long" if safe else "decimal(38,6)",
        ss,
        cc,
        ((ss or 0.0) * 1e6 + (cc or 0.0)) * 2.0,
        float(1 << 62),
    )
    if not safe:
        return lambda prod: F.sum(prod.cast("decimal(38,6)")).cast("double").alias("dot")
    micro = F.lit(Decimal("0.000001"))
    return lambda prod: (
        (
            F.sum((prod.cast("decimal(38,6)") * F.lit(1000000)).cast("long"))
            .cast("decimal(38,0)")
            * micro
        )
        .cast("double")
        .alias("dot")
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    threshold: float = 0.6,
    max_df: int | None = _MAX_DF_SENTINEL,
    max_df_frac: float | None = None,
    frac_floor: int = 0,
) -> DataFrame:
    """TF-IDF weighted cosine near-dup pairs (id_a < id_b, cosine >= t) —
    the lexical-vector sibling of ngram_jaccard_pairs: Jaccard treats every
    shingle equally, TF-IDF cosine discounts boilerplate vocabulary, so it
    separates "same rare content" from "same stopwords".

    The term unit is a word ``n``-gram (WITH multiplicity — tf counts every
    occurrence, unlike the distinct shingle sets of Jaccard). ``n=1`` is
    classic unigram TF-IDF; it degenerates on small-vocabulary corpora
    (every term hot -> df^2 join blowup AND idf ~ 0), so the default is
    bigrams, whose vocabulary grows combinatorially and keeps the inverted
    index selective.

    Plan: word n-grams -> per-doc term frequencies -> document frequencies
    -> w = tf * ln(N/df) -> inverted-index self-join on term accumulating
    the dot product. All shuffles are keyed by term or by (id_a, id_b); the
    corpus-wide N rides a broadcast crossJoin of a one-row aggregate (no
    driver collect). Dot products and squared norms accumulate through
    DECIMAL(38,6) (order-independent), so cosine is bit-identical across
    engines and the op hash-gates against a SQL oracle.

    ``max_df`` prunes terms hotter than the cap from the inverted index —
    same df^2 fan-out hazard as ngram_jaccard_pairs. ``max_df_frac`` is the
    scale-relative form (cutoff = max(floor(frac * n_docs), frac_floor),
    computed in-plan — the 100 TB configuration, since an absolute cap
    silently stops biting as the corpus grows); mutually exclusive with an
    explicit ``max_df``. Capped semantics mirror ngram_jaccard_pairs: the
    pruned index generates CANDIDATES only, and every candidate pair is
    re-scored EXACTLY over the full term vectors (norms and dots both
    lossless), so the cap costs recall — pairs sharing only hot terms are
    missed — but every emitted (pair, cosine) is bit-identical to the
    lossless twin's. Pass ``max_df=None`` for the certified-lossless
    config (the oracle query does). Measured on the sf1 stress corpus
    (tiny shared vocabulary — every bigram hot): the lossless config is
    ~quadratic (2.85 s at sf0.1 -> 1203 s at sf1, BASELINE.md round-5
    sweep) while the frac-capped config stays linear.
    """
    spark = df.sparkSession
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # Materialize the token array as a column BEFORE the n-gram lambda: an
    # inline `split(...)` expression would be re-evaluated by every
    # element_at inside the transform (O(tokens * full-regex-splits) per doc
    # — measured 14s vs <1s at sf0.1). The repartition also breaks the
    # single-file scan so the explode fans out across cores.
    tok_arr = (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col).alias("id"), F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("t"))
        .repartition(parts, F.col("id"))
    )
    t = F.col("t")
    if n == 1:
        grams = t
    else:
        grams = F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: F.concat_ws(" ", *[F.element_at(t, i + k + 1) for k in range(n)]),
        )
    toks = tok_arr.filter(F.size(t) >= n).select("id", F.explode(grams).alias("term"))
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = tf.select(F.countDistinct("id").alias("n_docs"))
    w = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "id",
            "term",
            (F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df"))).alias("w"),
            # df rides along (one long per row) so the join branches below
            # can prune singleton terms without a second vocabulary pass
            "df",
        )
    )
    # both self-join branches and the norm aggregate consume w: persist so
    # the scan->explode->tf->df chain runs once, not three times
    w = w.persist()
    # Lossless singleton prune (guide §2.3 — shuffle fewer bytes): a term
    # with df == 1 appears in exactly one document, so it can never be
    # SHARED by a pair — it contributes to norms only. Every join branch
    # below (lossless self-join, capped candidate index, exact re-score)
    # may therefore drop df == 1 rows before the exchange: the joined
    # multiset of shared-term products — and hence every DECIMAL(38,6)
    # dot — is bit-identical. Norms keep the full w. On natural-language
    # bigram vocabularies singletons are the majority of postings
    # (hapax-legomena mass), so this halves-or-better the self-join input.
    wj = w.filter(F.col("df") >= 2).select("id", "term", "w")
    # norms over the FULL term set — pruning applies to CANDIDATE GENERATION
    # only (every candidate pair re-scores exactly over full vectors below),
    # so the capped pair set is a subset of lossless with bit-identical
    # scores on every recalled pair
    norm2 = w.groupBy("id").agg(
        F.sum((F.col("w") * F.col("w")).cast("decimal(38,6)")).cast("double").alias("n2")
    )
    if max_df_frac is not None:
        if max_df is not None and not isinstance(max_df, _MaxDfDefault):
            raise ValueError("pass max_df or max_df_frac, not both")
        cutoff = F.greatest(
            F.floor(F.lit(max_df_frac) * F.col("n_docs")), F.lit(int(frac_floor))
        )
        # `stats` (1-row n_docs over tf) already exists for idf — reuse it
        # rather than re-running the tokenize->explode->tf chain
        hot = dfreq.crossJoin(F.broadcast(stats)).filter(F.col("df") > cutoff).select("term")
        idx = wj.join(F.broadcast(hot), "term", "left_anti")
    elif max_df is not None:
        hot = dfreq.filter(F.col("df") > int(max_df)).select("term")
        idx = wj.join(F.broadcast(hot), "term", "left_anti")
    else:
        idx = None
    # The pair-cardinality dot SUM is the measured whale of this op: a
    # DECIMAL(38,6) sum buffer is >18 digits, so Spark's hash aggregate
    # stores it as a 16-byte binary with a BigDecimal (de)serialization per
    # update — measured 43x slower than a long sum over the same 36M-row /
    # 10M-group shape (94-186 s vs 4 s, same window). A decimal(38,6) value
    # IS an integer count of 10^-6, so when no intermediate can leave
    # int64, summing the unscaled longs is the SAME exact integer
    # arithmetic (guide §2.3, narrower types — provably safe). The
    # certificate below proves it from the persisted w table (one
    # vocabulary-sized pass, conservative double arithmetic with a 4x
    # margin); corpora that exceed the bound keep the exact decimal path.
    dot_agg = _tfidf_dot_agg(w)
    if idx is None:
        # lossless: full inverted-index self-join — the certification config.
        # Both sides read the singleton-pruned wj (see above): df==1 terms
        # join with nothing, so dropping them before the exchange changes
        # no product and no emitted dot — only the shuffled/joined bytes.
        dots = (
            wj.alias("a")
            .join(wj.alias("b"), (F.col("a.term") == F.col("b.term")) & (F.col("a.id") < F.col("b.id")))
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .agg(dot_agg(F.col("a.w") * F.col("b.w")))
        )
    else:
        # capped: the PRUNED index generates candidates only; each candidate
        # pair is then re-scored EXACTLY over the full term vectors (per-doc
        # term->weight map join — rows ~ candidates x terms-per-doc, linear),
        # so the cap costs recall, never score fidelity. Same structure as
        # ngram_jaccard_pairs' capped exact re-score.
        cand = (
            idx.alias("a")
            .join(idx.alias("b"), (F.col("a.term") == F.col("b.term")) & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct()
        )
        # exact re-score over the FULL vectors as two keyed JVM joins:
        # cand fans out by id_a over a's terms (rows ~ candidates x
        # terms-per-doc, the same linear bound the per-pair map form had),
        # then the (id_b, term) equi-join keeps exactly the terms present in
        # BOTH vectors. Same multiset of products, same per-product
        # DECIMAL(38,6) cast before the SUM (exact, order-independent), so
        # the dot is bit-identical to the lossless branch and the SQL
        # oracle. This replaces a per-pair term->weight map join whose
        # interpreted aggregate-over-map-entries lambda (plus two full maps
        # shipped per candidate) was the #1 line of the round-10 bench
        # (tfidf_capped_pairs 6.9 s vs the lossless twin's 1.2 s at sf0.1).
        # both re-score sides read the singleton-pruned wj: a term shared
        # by a pair has df >= 2 by definition, so the kept (term-in-both)
        # product multiset — and the exact dot — is unchanged, while the
        # id_a fan-out drops every hapax posting before it is built.
        dots = (
            cand.join(
                wj.select(F.col("id").alias("id_a"), "term", F.col("w").alias("wa")), "id_a"
            )
            .join(
                wj.select(F.col("id").alias("id_b"), "term", F.col("w").alias("wb")),
                ["id_b", "term"],
            )
            .groupBy("id_a", "id_b")
            .agg(dot_agg(F.col("wa") * F.col("wb")))
        )
    cos = (
        dots.join(norm2.select(F.col("id").alias("id_a"), F.col("n2").alias("na2")), "id_a")
        .join(norm2.select(F.col("id").alias("id_b"), F.col("n2").alias("nb2")), "id_b")
        .select("id_a", "id_b", (F.col("dot") / (F.sqrt("na2") * F.sqrt("nb2"))).alias("cosine"))
    )
    return scoped_persist(cos.filter(F.col("cosine") >= threshold), w)


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    threshold: float = 0.2,
) -> DataFrame:
    """EXACT n-gram Jaccard pairs via PPJoin-style PREFIX FILTERING
    (Bayardo et al. WWW'07; Xiao et al. PPJoin) — a lossless alternative
    candidate generator to :func:`ngram_jaccard_pairs`'s full inverted
    index.

    Canonical order = ascending global document frequency (shingle
    tie-break), so the indexed prefix holds each document's RAREST
    shingles. Prefix length ``p = |S| - ceil(t*|S|) + 1``: under the length
    filter (|B| >= t|A|), any pair with jaccard >= t needs overlap
    >= ceil(t*|A|), and two sets whose canonical prefixes are disjoint can
    overlap at most min(|A| - p_A, |B| - p_B) = ceil(t*|X|) - 1 < that — so
    every qualifying pair collides on some prefix shingle and the filter is
    lossless. The epsilon inside ceil() rounds the boundary DOWN (longer
    prefix), keeping the prune conservative against float error.

    Scale trade vs the full index: only the (1-t) rarest fraction of each
    document's shingles is indexed AND the join keys are by construction
    the LOW-df shingles, so the df^2 posting fan-out on hot keys — the
    thing ``max_df`` exists to cap — largely disappears without losing
    recall. Cost: survivors re-score from full shingle arrays (one join
    back to the corpus), which is O(|S|) per CANDIDATE, vs the full
    index's O(1)-per-posting count aggregation.

    MEASURED VERDICT on the driver corpus (sf0.1, short docs, near-uniform
    shingle df): the count-based full index wins by 10-45x at every
    threshold (t=0.7: 1.7s vs 47s) — with no hot keys to dodge, prefix
    filtering only pays the re-score surcharge. Reach for this variant
    when the corpus has genuinely hot shingles (web boilerplate) AND a
    high threshold; otherwise prefer :func:`ngram_jaccard_pairs` with a
    finite ``max_df``. Kept lossless-verified (pytest pins equality with
    the full index) rather than benched as a headline query.
    """
    spark = df.sparkSession
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    base = (
        df.repartition(parts, F.col(id_col))
        .select(F.col(id_col).alias("id"), shingles(F.col(text_col), n).alias("sh"))
        .filter(F.size("sh") > 0)
        .persist()
    )
    ex = base.select("id", F.size("sh").alias("n"), F.explode("sh").alias("s"))
    dfreq = ex.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    w_doc = Window.partitionBy("id").orderBy(F.col("df").asc(), F.col("s").asc())
    prefix = (
        ex.join(dfreq, "s")
        .withColumn("__pos", F.row_number().over(w_doc))
        .filter(
            F.col("__pos")
            <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n") - 1e-9) + 1
        )
        .select("id", "n", "s")
    )
    len_ok = (F.col("a.n") >= threshold * F.col("b.n") - 1e-9) & (
        F.col("b.n") >= threshold * F.col("a.n") - 1e-9
    )
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")) & len_ok,
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return scoped_persist(
        cand.join(base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.size("sh_a") + F.size("sh_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard"),
        base,
    )


def strip_hot_lines(
    df: DataFrame,
    max_line_df: int | None = None,
    max_df_frac: float | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = ". ",
) -> DataFrame:
    """Corpus-level boilerplate removal: drop text segments that repeat
    across more than ``max_line_df`` documents (or more than ``max_df_frac``
    of the corpus) and reassemble each document from its surviving segments
    in original order — the C4/RefinedWeb "remove lines duplicated across
    documents" curation step (navboxes, cookie banners, license footers).

    Exactly one of ``max_line_df`` (absolute document-frequency cap) and
    ``max_df_frac`` (fraction of corpus size — scale-stable across SFs) must
    be given. ``sep`` picks the segment granularity: ``"\\n"`` for true
    lines, ``". "`` for sentences, ``" "`` for tokens.

    Output: (id, clean_text, n_lines, n_removed) for EVERY input document
    (a fully-boilerplate document comes back with clean_text = '').

    Scale: one shuffle to count per-segment document frequency, an anti-join
    against the hot set (shuffled, NOT broadcast — at 100 TB the hot-segment
    set is itself large), and one groupBy to reassemble. The fractional
    threshold joins a 1-row corpus-size aggregate (crossJoin of a scalar) —
    declarative, no driver-side count action at plan-build time.
    """
    if (max_line_df is None) == (max_df_frac is None):
        raise ValueError("exactly one of max_line_df / max_df_frac is required")
    import re as _re

    lines = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.split(F.col(text_col), _re.escape(sep), -1)).alias("__pos", "__line"),
    )
    keyed = lines.withColumn("__lkey", F.md5(normalize_text(F.col("__line"))))
    dfreq = keyed.groupBy("__lkey").agg(F.count_distinct("__id").alias("__ldf"))
    if max_line_df is not None:
        hot = dfreq.filter(F.col("__ldf") > max_line_df)
    else:
        total = keyed.agg(F.count_distinct("__id").alias("__n_docs"))
        hot = dfreq.crossJoin(total).filter(
            F.col("__ldf").cast("double") > F.lit(float(max_df_frac)) * F.col("__n_docs")
        )
    kept = keyed.join(hot.select("__lkey"), "__lkey", "left_anti")
    rebuilt = kept.groupBy("__id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))), lambda s: s["__line"]
            ),
            sep,
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    totals = lines.groupBy("__id").agg(F.count(F.lit(1)).alias("n_lines"))
    return (
        totals.join(rebuilt, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_lines",
            (F.col("n_lines") - F.coalesce("__n_kept", F.lit(0))).alias("n_removed"),
        )
    )


def connected_components(edges: DataFrame, max_iter: int = 20, driver_threshold: int = 2_000_000) -> DataFrame:
    """Undirected edges (id_a, id_b) -> (id, comp) with comp = min id in the
    component.

    Near-dup candidate graphs are tiny relative to the corpus (edges ~= dup
    pairs, not documents), so up to driver_threshold edges this runs
    path-compressed union-find on the driver — one collect, no iterative
    shuffles. Above it, distributed min-label propagation (two shuffles per
    iteration, lineage truncated per round) takes over.

    Disk posture: exactly ONE checkpoint of the E-row canonical (hi, lo)
    edge list is materialized up front — NOT the 2E symmetric view (derived
    lazily per round) and NOT an extra full-shuffle distinct (duplicate
    edges are harmless to union-find and are absorbed by round-1's own
    distincts). At sf1 the earlier 3x materialization (2E sym checkpoint +
    E distinct checkpoint) of a quadratic lossless near-dup edge set filled
    the disk and killed the job."""
    canon = (
        edges.select(
            F.greatest("id_a", "id_b").alias("hi"), F.least("id_a", "id_b").alias("lo")
        )
        # materialize once: everything below re-reads canon (the driver path
        # counts then collects; the loop runs 2 actions per iteration), and
        # without this the entire upstream edge-generation DAG (e.g. a
        # shingle self-join) re-executes per action
        .localCheckpoint(eager=True)
    )
    n_edges = canon.count()
    if n_edges <= driver_threshold:
        pairs = canon.collect()  # read the checkpoint, NOT edges (whose DAG would re-execute)
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:
                parent[x], x = root, parent[x]
            return root

        for r in pairs:
            a, b = find(r[0]), find(r[1])
            if a != b:
                lo, hi = (a, b) if (a < b) else (b, a)
                parent[hi] = lo
        nodes = {v for r in pairs for v in (r[0], r[1])}
        out = [(n, find(n)) for n in sorted(nodes)]
        id_type = canon.schema["hi"].dataType
        spark = edges.sparkSession
        from pyspark.sql import types as T

        return spark.createDataFrame(out, T.StructType([T.StructField("id", id_type), T.StructField("comp", id_type)]))
    return _cc_star_contraction(canon, max_iter, n_edges)


def _cc_star_contraction(canon: DataFrame, max_iter: int, n_edges: int | None = None) -> DataFrame:
    """Distributed connected components by alternating large-star /
    small-star contraction (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14) — O(log n) rounds instead of the
    O(diameter) rounds naive min-label propagation needs (a 1M-node dup
    chain converges in ~20 rounds, not 1M).

    * large-star: every node points its LARGER neighbors at the minimum of
      its closed neighborhood;
    * small-star: every node points its smaller-or-equal neighbors (and
      itself) at that minimum.

    Both preserve connectivity; their alternation converges to stars
    centered at each component's minimum id. Per round: two groupBy
    shuffles over the (shrinking) edge set, one checksum aggregate for the
    stability test, lineage truncated by localCheckpoint.

    ``canon`` is the already-checkpointed canonical (hi >= lo) edge list —
    duplicates and self-loops are tolerated (absorbed by round-1's own
    distincts); returns (id, comp). ``n_edges`` (if known) gates a JVM GC
    nudge after whale rounds so the previous round's checkpoint blocks are
    actually reclaimed (ContextCleaner frees them only after a GC notices
    the RDD is unreachable — at sf1 round-1's quadratic edge checkpoint
    otherwise coexists with round 2's and exhausts the disk)."""
    spark = canon.sparkSession
    # node universe, pinned BEFORE the loop: the final left-join must not
    # depend on round-0 canon once later rounds have replaced (and freed) it
    nodes = (
        canon.select(F.col("hi").alias("id"))
        .unionByName(canon.select(F.col("lo").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sig = None
    prev_n = n_edges
    for _ in range(max_iter):
        # ---- large-star over the symmetric view of canon
        edges = canon.select(F.col("hi").alias("u"), F.col("lo").alias("v")).unionByName(
            canon.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        mins = (
            edges.groupBy("u")
            .agg(F.min("v").alias("__mn"))
            .select("u", F.least(F.col("__mn"), F.col("u")).alias("m"))
        )
        large = (
            edges.join(mins, "u")
            .filter(F.col("v") > F.col("u"))  # larger neighbors -> min(Γ(u) ∪ u)
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .select(F.greatest("a", "b").alias("hi"), F.least("a", "b").alias("lo"))
            .distinct()
        )
        # ---- small-star over the larger->smaller orientation
        mins2 = large.groupBy("hi").agg(F.min("lo").alias("m"))
        small = (
            large.join(mins2, "hi")
            .filter(F.col("lo") != F.col("m"))  # smaller neighbors -> min
            .select(F.col("lo").alias("a"), F.col("m").alias("b"))
            .unionByName(mins2.select(F.col("hi").alias("a"), F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .select(F.greatest("a", "b").alias("hi"), F.least("a", "b").alias("lo"))
            .distinct()
            .localCheckpoint(eager=True)  # truncate lineage per round
        )
        canon = small  # drop the only reference to the old round's checkpoint
        # stability: the canonical edge set is a fixed point (count + an
        # order-independent hash checksum — one tiny aggregate per round)
        # bit_xor: order-independent, cannot overflow (ANSI-safe at any n)
        sig = canon.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("hi", "lo")).alias("h"),
        ).first()
        if prev_n is not None and prev_n > 10_000_000:
            # the round we just replaced was checkpoint-materialized at whale
            # size; force the unreachable-RDD sweep now rather than waiting
            # for the periodic cleaner GC
            spark.sparkContext._jvm.System.gc()
        prev_n = sig.n
        if prev_sig == (sig.n, sig.h):
            break
        prev_sig = (sig.n, sig.h)
    else:
        raise RuntimeError(
            f"connected_components: star contraction did not converge in "
            f"{max_iter} rounds (component structure deeper than 2^{max_iter}?)"
        )
    # converged: canon rows are (member, component-min) stars
    return (
        nodes.join(
            canon.select(F.col("hi").alias("id"), F.col("lo").alias("__c")), "id", "left"
        )
        .select("id", F.coalesce("__c", F.col("id")).alias("comp"))
    )


def dedup_losers(
    comps: DataFrame,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: str = "min_id",
) -> DataFrame:
    """Representative selection over dup components ``(id, comp)``: the ids
    to DROP under a keep policy — ``min_id`` (cheapest: the component label
    IS the survivor) or ``longest`` (keep max length(text), tie-break min
    id — the standard quality-preserving near-dedup policy). The longest
    path adds one join + one window keyed by component (dup-group-count
    sized, not corpus sized)."""
    if keep == "min_id":
        return comps.filter(F.col("comp") != F.col("id")).select(F.col("id").alias(id_col))
    if keep != "longest":
        raise ValueError(f"keep must be min_id|longest, got {keep!r}")
    sized = comps.join(
        df.select(F.col(id_col).alias("id"), F.length(F.col(text_col)).alias("__len")), "id"
    )
    w = Window.partitionBy("comp").orderBy(F.col("__len").desc(), F.col("id").asc())
    return (
        sized.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") != 1)
        .select(F.col("id").alias(id_col))
    )


def near_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    keep: str = "min_id",
    **lsh_kwargs,
) -> DataFrame:
    """MinHash-LSH near-dedup: returns df minus non-representative members of
    each duplicate component (representative per ``keep`` policy)."""
    pairs = minhash_lsh_pairs(df, id_col, text_col, threshold=threshold, **lsh_kwargs)
    comps = connected_components(pairs)
    losers = dedup_losers(comps, df, id_col, text_col, keep)
    return df.join(losers, id_col, "left_anti")


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = 8,
    min_count: int = 2,
) -> DataFrame:
    """Span-level exact-duplicate detection (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", arXiv:2107.06499 — the
    ExactSubstr criterion re-expressed relationally): slide a ``w``-token
    window over every document; a window POSITION is duplicated iff its
    w-token string occurs >= ``min_count`` times anywhere in the corpus
    (any document, including repeats within the same one — the paper's
    definition, which also catches internal boilerplate).

    The reference paper builds a corpus-wide suffix array; on Spark the same
    predicate falls out of two bounded shuffles — (1) global window counts,
    (2) a many-to-one join of window positions against those counts — with
    no suffix structure, no driver state, and per-key fan-out bounded by the
    window count of the hottest span (positions join against ONE count row
    each, so even a boilerplate span that appears a million times costs a
    million join rows, never a million-squared).

    Output, for every document with >= w tokens:
      (id, n_windows, n_dup_windows, dup_frac)
    where dup_frac = n_dup_windows / n_windows (one BIGINT/BIGINT IEEE
    division — engine-exact for the oracle gate).
    """
    from apollo_spark.ops.corpus import word_ngrams

    # wins feeds both the global count and the re-join: persist so the
    # window explode runs once, not twice
    wins = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_ngrams(F.col(text_col), w)).alias("win"),
    ).persist()
    counts = wins.groupBy("win").agg(F.count(F.lit(1)).alias("c"))
    return scoped_persist(
        wins.join(counts, "win")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.when(F.col("c") >= min_count, 1).otherwise(0)).alias("n_dup_windows"),
        )
        .withColumn(
            "dup_frac", F.col("n_dup_windows").cast("double") / F.col("n_windows").cast("double")
        )
        .select(F.col("id").alias(id_col), "n_windows", "n_dup_windows", "dup_frac"),
        wins,
    )


def _cdc_chunks(
    df: DataFrame, id_col: str, text_col: str, window: int, divisor: int
) -> DataFrame:
    """Shared CDC machinery: word-stream rolling-md5 boundary cut, per-doc
    chunk ids in document order, chunk assembly. Returns (id, chunk_id,
    chunk_text, n_words) — see cdc_chunk_groups for the algorithm and scale
    argument.

    Everything happens INSIDE each document's token array via higher-order
    functions — no posexplode to a corpus-sized token table, no per-doc
    window sorts, no collect_list re-assembly. The document is the natural
    unit of work (chunking never crosses documents), so the old
    explode -> 2 windows -> collect_list pipeline paid three wide stages
    and object-agg GC for what one narrow projection can do; measured on
    the 30x stress corpus the window form grew 6x per 3x data (sort +
    object churn) while this form is sublinear (sf1 6.5 s -> sf3 16.2 s),
    bit-identical output at every SF. The boundary rule, hash, and chunk
    text are unchanged, so the cross-engine oracle hash-gate is untouched.

    chunk_id = index of the chunk in document order == the old prefix-sum
    id: a cut at the final token would start an EMPTY trailing chunk (start
    > end) which the old form never materialized either — dropping it
    cannot shift earlier ids.
    """
    if window < 1 or divisor < 2:
        raise ValueError("window >= 1 and divisor >= 2 required")
    spark = df.sparkSession
    try:
        # AQE may report 'auto' / a non-integer here; fall back rather than die
        parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    except (ValueError, TypeError):
        parts = 32
    base = df.filter(F.length(F.trim(F.col(text_col))) > 0)
    # single-file inputs otherwise run the whole tokenize+md5 stage in one
    # task; documents are the parallelism unit here. Skip the shuffle when
    # the scan already yields enough parallelism (multi-file 100 TB inputs).
    if base.rdd.getNumPartitions() < parts:
        base = base.repartition(parts)
    tok = (
        base
        .select(
            F.col(id_col).alias("id"),
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("t"),
        )
    )
    t = F.col("t")

    def rolling(i):
        # window of the last `window` words ENDING at 0-based position i
        # (clamped at the doc start); slice() is 1-based
        return F.concat_ws(
            " ",
            F.slice(t, F.greatest(i - window + 2, F.lit(1)), F.least(i + F.lit(1), F.lit(window))),
        )

    # 60-bit md5 prefix — same portable int both engines inline exactly.
    # Guard: sequence(start, stop) DESCENDS when start > stop, so a doc
    # shorter than the rolling window would evaluate boundary hashes at
    # fabricated positions and emit spurious cuts (the old explode form's
    # pos >= window-1 gate made short docs cut-free; keep that semantics)
    cuts = F.when(
        F.size(t) >= window,
        F.filter(
            F.sequence(F.lit(window - 1), F.size(t) - 1),
            lambda i: F.conv(F.substring(F.md5(rolling(i)), 1, 15), 16, 10).cast("long")
            % divisor
            == 0,
        ),
    ).otherwise(F.array().cast("array<int>"))
    # chunk spans: starts = 0 then cut+1; ends = each cut then the last token
    starts = F.concat(F.array(F.lit(0)), F.transform(cuts, lambda c: c + 1))
    spans = F.filter(
        F.zip_with(
            starts,
            F.concat(cuts, F.array(F.size(t) - 1)),
            lambda s, e: F.struct(s.alias("s"), e.alias("e")),
        ),
        lambda p: p["e"] >= p["s"],
    )
    return tok.select(
        "id",
        F.posexplode(
            F.transform(
                spans,
                lambda p: F.struct(
                    F.concat_ws(" ", F.slice(t, p["s"] + 1, p["e"] - p["s"] + 1)).alias(
                        "chunk_text"
                    ),
                    (p["e"] - p["s"] + 1).cast("long").alias("n_words"),
                ),
            )
        ).alias("chunk_id", "c"),
    ).select("id", F.col("chunk_id").cast("long").alias("chunk_id"), "c.chunk_text", "c.n_words")


def cdc_chunk_groups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 3,
    divisor: int = 16,
    min_docs: int = 2,
) -> DataFrame:
    """Content-defined chunking (CDC) dedup over the WORD stream — the
    insertion-robust chunk-level modality (LBFS, Muthitacharoen et al. SOSP
    2001; FastCDC, Xia et al. ATC 2016): a rolling hash over the last
    ``window`` words cuts a chunk boundary wherever hash % divisor == 0, so
    an edit only perturbs the chunks it touches — every other chunk keeps
    its content hash and still matches across documents. Shingle/minhash
    dedup asks "are these documents similar?"; CDC asks "which exact spans
    recur corpus-wide?" and is how file-level dedup storage and
    training-data span-dedup both work.

    Rolling hash = md5 of the window's space-joined words (boundary when
    the 60-bit hex prefix % divisor == 0 — expected chunk length ~``divisor``
    words), portable verbatim to ANSI SQL, so the op hash-gates cross-engine.
    The boundary CUTS AFTER the window's last word (LBFS convention).

    Plan shape: one explode + per-document window (partitionBy id — bounded
    frames, never corpus-sized), one (id, chunk) aggregate, one chunk-hash
    aggregate. All shuffles are keyed by document or chunk hash; nothing is
    quadratic in corpus size, and chunk-hash group sizes are capped by the
    corpus's true duplication, not by vocabulary heat.

    Returns (chunk_hash, n_words, n_docs, n_occurrences) for chunks seen in
    >= ``min_docs`` distinct documents.
    """
    chunks = _cdc_chunks(df, id_col, text_col, window, divisor)
    return (
        chunks.groupBy(F.md5("chunk_text").alias("chunk_hash"))
        .agg(
            F.max("n_words").alias("n_words"),
            F.countDistinct("id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def incremental_cdc_novelty(
    index_dir: str,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 3,
    divisor: int = 16,
    txn_app: str | None = None,
    txn_batch: int | None = None,
    commit_report: Callable[[DataFrame], None] | None = None,
) -> DataFrame:
    """Continuous-ingest SPAN-level novelty — "only pay for new content":
    chunk the increment with CDC, mark each chunk occurrence novel iff its
    content hash is absent from the persistent chunk index (TxTable at
    ``index_dir``) AND it is the first occurrence within the increment
    (first = min (id, chunk_id) per hash — deterministic), then report per
    document how much of it is new. An ingest pipeline keeps documents whose
    ``novel_frac`` clears a threshold and drops boilerplate re-crawls; the
    insertion-robust boundaries mean an edited re-crawl only pays for its
    edits.

    Scale shape mirrors incremental_minhash_dedup: each batch hashes ITS OWN
    words and joins increment chunk hashes against the index — the shuffle
    moves the increment, never the history — and the index grows by the
    increment's NOVEL hashes only (so re-ingesting duplicates never grows
    it). Pass ``txn_app``/``txn_batch`` from a foreachBatch sink for
    exactly-once index maintenance across checkpoint restarts.

    Commit ORDER matters for crash safety: the caller's report must commit
    BEFORE the index moves, because a replayed batch recomputes novelty
    against whatever index state it finds. If the index committed first and
    the driver crashed before the report landed, the replay would see its
    own hashes already indexed, report zero novelty, and that wrong report
    would become the batch's first (and permanent) commit. Pass
    ``commit_report`` — a callback invoked with the materialized per-doc
    report — and this function runs it BEFORE the index append, both under
    the same (app, batch) guard: crash before the report → full replay;
    crash between report and index → replay recomputes the identical
    report against the still-unmoved index, the report sink's txn guard
    skips it, and the index append then proceeds; crash after both → both
    writes are no-ops. Callers that sink the report only AFTER this
    function returns inherit the unsafe ordering — use the callback.

    Returns one row per input document: (id, n_chunks, n_words,
    novel_chunks, novel_words, novel_frac).
    """
    from apollo_spark.table_format import TxTable

    spark = new_docs.sparkSession
    idx_t = TxTable(index_dir)
    # persisted: per_doc totals, the novelty aggregate, AND the index append
    # all branch from this frame — unpersisted, the index write would re-run
    # the whole tokenize->rolling-hash->window->chunk pipeline a second time
    # per micro-batch (round-5 ADVICE)
    chunks = (
        _cdc_chunks(new_docs, id_col, text_col, window, divisor)
        .withColumn("chunk_hash", F.md5("chunk_text"))
        .persist()
    )
    seen = (
        idx_t.read(spark).select("chunk_hash")
        if idx_t.current_version() is not None
        else None
    )
    unseen = chunks if seen is None else chunks.join(seen, "chunk_hash", "left_anti")
    # first occurrence within the increment: min (id, chunk_id) per hash
    w_first = Window.partitionBy("chunk_hash").orderBy("id", "chunk_id")
    # persisted: consumed twice (per-doc novelty aggregate + index append);
    # covers the index anti-join re-scan too
    novel = (
        unseen.withColumn("__r", F.row_number().over(w_first))
        .withColumn("novel", (F.col("__r") == 1).cast("int"))
        .drop("__r")
        .persist()
    )
    per_doc = (
        chunks.groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_chunks"), F.sum("n_words").alias("n_words"))
        .join(
            novel.filter(F.col("novel") == 1)
            .groupBy("id")
            .agg(
                F.count(F.lit(1)).alias("novel_chunks"),
                F.sum("n_words").alias("novel_words"),
            ),
            "id",
            "left",
        )
        .select(
            "id",
            "n_chunks",
            "n_words",
            F.coalesce("novel_chunks", F.lit(0)).alias("novel_chunks"),
            F.coalesce("novel_words", F.lit(0)).alias("novel_words"),
            (
                F.coalesce("novel_words", F.lit(0)).cast("double")
                / F.col("n_words").cast("double")
            ).alias("novel_frac"),
        )
    )
    out = per_doc.persist()
    out.count()  # materialize before the index moves
    if commit_report is not None:
        commit_report(out)  # report FIRST — see docstring's crash analysis
    idx_t.write(
        novel.filter(F.col("novel") == 1).select("chunk_hash"),
        mode="append",
        txn_app=txn_app,
        txn_batch=txn_batch,
    )
    return scoped_persist(out, out, chunks, novel)


# --------------------------------------------------------------------------
# Incremental near-dup index (continuous-ingest dedup)
# --------------------------------------------------------------------------


def _minhash_bands_and_sigs(
    df: DataFrame, id_col: str, text_col: str, n: int, num_hashes: int, bands: int
):
    """(bands_df: id|bkey, sigs_df: id|sig array<long>) for a doc batch —
    the same banded xxhash64 pipeline as minhash_lsh_pairs."""
    rows = num_hashes // bands
    base = df.select(F.col(id_col).alias("id"), shingles(F.col(text_col), n).alias("sh")).filter(
        F.size("sh") > 0
    )
    hashed = base.select("id", F.explode("sh").alias("s")).select(
        "id", F.xxhash64("s").alias("h")
    )
    from apollo_spark.ops.sqlwide import sql_over

    # generated SQL over the wide slot/band expressions — one py4j roundtrip
    # each, same parsed plan (see ops/sqlwide.py)
    sig = sql_over(
        hashed,
        "SELECT id, "
        + ", ".join(f"min(xxhash64(h, {i})) AS m{i}" for i in range(num_hashes))
        + " FROM {v} GROUP BY id",
    )
    banded = sql_over(
        sig,
        "SELECT id, explode(array("
        + ", ".join(
            "xxhash64({b}, {cols})".format(
                b=b, cols=", ".join(f"m{b * rows + j}" for j in range(rows))
            )
            for b in range(bands)
        )
        + ")) AS bkey FROM {v}",
    )
    sigs = sig.selectExpr(
        "id", "array(" + ", ".join(f"m{i}" for i in range(num_hashes)) + ") AS sig"
    )
    return banded, sigs


def incremental_minhash_dedup(
    index_dir: str,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    corpus: DataFrame | None = None,
    txn_app: str | None = None,
    txn_batch: int | None = None,
) -> DataFrame:
    """Continuous-ingest near-dup detection: match a NEW document increment
    against everything already ingested — without rescanning the historical
    corpus — then commit the increment's index state.

    This is the production shape of fuzzy dedup at 100 TB/day: a one-shot
    ``minhash_lsh_pairs`` over (history + increment) re-hashes the entire
    lake every batch; this maintains a persistent LSH band index
    (TxTable at ``index_dir``/bands, O(bands) longs per doc) plus a
    signature table (``index_dir``/sigs, num_hashes longs per doc) and each
    increment only (a) hashes ITS OWN documents, (b) joins its band keys
    against the index — the shuffle moves the increment, never the corpus.

    Returns matches ``(new_id, match_id, est_jaccard[, jaccard])``:
    new-vs-history collisions plus new-vs-new (id-ordered) within the
    increment, scored by the signature agreement fraction ``est_jaccard``
    (unbiased minhash estimate, stderr ~ 1/sqrt(num_hashes)). Pass
    ``corpus`` (id/text of ALL previously ingested + new docs — the lake
    table itself) to add an exact ``jaccard`` re-score and filter at
    ``threshold`` exactly; without it the filter uses the estimate
    (document the tolerance in the pipeline contract).

    Commit ordering: matches are computed BEFORE the increment's rows are
    appended (so the same batch is never matched against itself twice);
    pass ``txn_app``/``txn_batch`` from a foreachBatch sink for
    exactly-once index maintenance across checkpoint restarts. The two
    table commits are not atomic together; on a crash between them the
    bands table may lead the sigs table by one batch — re-running the
    batch (same txn ids) heals it because each commit is idempotent.
    """
    from apollo_spark.table_format import TxTable

    spark = new_docs.sparkSession
    bands_t = TxTable(f"{index_dir}/bands")
    sigs_t = TxTable(f"{index_dir}/sigs")
    new_bands, new_sigs = _minhash_bands_and_sigs(
        new_docs, id_col, text_col, n, num_hashes, bands
    )
    new_bands = new_bands.persist()
    new_sigs = new_sigs.persist()

    old_bands = bands_t.read(spark) if bands_t.current_version() is not None else None
    vs_hist = (
        new_bands.alias("a")
        .join(old_bands.alias("b"), F.col("a.bkey") == F.col("b.bkey"))
        .select(F.col("a.id").alias("new_id"), F.col("b.id").alias("match_id"))
        if old_bands is not None
        else None
    )
    vs_self = (
        new_bands.alias("a")
        .join(
            new_bands.alias("b"),
            (F.col("a.bkey") == F.col("b.bkey")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("new_id"), F.col("b.id").alias("match_id"))
    )
    cand = (vs_self if vs_hist is None else vs_hist.unionByName(vs_self)).dropDuplicates(
        ["new_id", "match_id"]
    )

    all_sigs = (
        new_sigs if sigs_t.current_version() is None else sigs_t.read(spark).unionByName(new_sigs)
    )
    est = (
        cand.join(all_sigs.select(F.col("id").alias("new_id"), F.col("sig").alias("__sa")), "new_id")
        .join(all_sigs.select(F.col("id").alias("match_id"), F.col("sig").alias("__sb")), "match_id")
        .withColumn(
            "est_jaccard",
            F.aggregate(
                F.zip_with("__sa", "__sb", lambda a, b: (a == b).cast("int")),
                F.lit(0),
                lambda acc, x: acc + x,
            ).cast("double")
            / F.lit(float(num_hashes)),
        )
        .drop("__sa", "__sb")
    )
    if corpus is not None:
        texts = corpus.select(
            F.col(id_col).alias("__tid"), shingles(F.col(text_col), n).alias("__tsh")
        )
        est = (
            est.join(texts.select(F.col("__tid").alias("new_id"), F.col("__tsh").alias("__ha")), "new_id")
            .join(texts.select(F.col("__tid").alias("match_id"), F.col("__tsh").alias("__hb")), "match_id")
            .withColumn(
                "jaccard",
                F.size(F.array_intersect("__ha", "__hb")).cast("double")
                / F.size(F.array_union("__ha", "__hb")).cast("double"),
            )
            .drop("__ha", "__hb")
            .filter(F.col("jaccard") >= threshold)
        )
    else:
        est = est.filter(F.col("est_jaccard") >= threshold)
    matches = est.persist()
    matches.count()  # materialize before the index moves

    bands_t.write(new_bands, mode="append", txn_app=txn_app, txn_batch=txn_batch)
    sigs_t.write(new_sigs, mode="append", txn_app=txn_app, txn_batch=txn_batch)
    new_bands.unpersist()
    new_sigs.unpersist()
    # `matches` is already materialized; hand the cache handle to the caller
    # (release_caches) rather than leaking it into session storage
    return scoped_persist(matches, matches)


# --------------------------------------------------------------------------
# Portable (engine-replayable) MinHash / SimHash
# --------------------------------------------------------------------------
# The xxhash64 variants above are the fast path (one JVM intrinsic per
# shingle).  The variants below trade ~2x hash cost for *portability*: every
# hash is either an md5 prefix or 2-universal modular arithmetic, both of
# which DuckDB replays bit-for-bit — so the ENTIRE LSH pipeline (shingle ->
# signature -> band -> candidate join -> exact verify) is SQL-oracle-gateable,
# not just rows-only-checked.  Same shuffle geometry as the fast path: band
# keys are scalar longs, candidate fan-out is bounded by band width.

MH_PRIME = (1 << 61) - 1  # Mersenne prime; slot values fit signed 64-bit
_LO30 = (1 << 30) - 1


def _mh_consts(i: int) -> tuple[int, int, int]:
    """Per-slot (a, b, c) for the 2-universal mix ((hi*a + lo*b + c) mod P).
    Derived from md5 so both engines inline the same literals; a, b nonzero
    and < 2^30 so hi*a + lo*b + c < 2^62 (no ANSI overflow)."""
    import hashlib

    d = hashlib.md5(f"mh{i}".encode()).digest()
    a = int.from_bytes(d[0:4], "big") % ((1 << 30) - 1) + 1
    b = int.from_bytes(d[4:8], "big") % ((1 << 30) - 1) + 1
    c = int.from_bytes(d[8:12], "big") % (1 << 30)
    return a, b, c


# Arrow fast path engages at this signature width (the 256-hash autotuned
# geometry): below it the interpreted per-slot expression chains are cheap
# enough that Python-worker startup would dominate.
_SIG_ARROW_MIN_HASHES = 64


# splitmix64 finalizer constants — the ESTIMATOR slot family (full-avalanche
# mixing, unlike the banding family's linear 2-universal mix; see
# _portable_sig_arrow with_fp and the minhash_portable_pairs docstring for
# the measured pathology that makes the linear family unusable as a
# jaccard ESTIMATOR even though it is fine for banding).
_SM_GOLD = 0x9E3779B97F4A7C15
_SM_M1 = 0xBF58476D1CE4E5B9
_SM_M2 = 0x94D049BB133111EB
_EST_SLOTS = 256  # estimator width; sigma(est | j=0.2) = 0.025


def _portable_sig_arrow(hashed: DataFrame, num_hashes: int, with_fp: bool = False) -> DataFrame:
    """Arrow fast path for the 2-universal slot mins: ONE mapInPandas pass
    computes all ``num_hashes`` slots per (id, h) batch as a single numpy
    int64 matrix op, with a per-batch pandas groupby partial min; a JVM
    groupBy finishes the min across batch/partition boundaries.

    Bit parity with the expression form (the oracle-replayed arithmetic) is
    exact, not approximate: h < 2^60 so hi < 2^30 and a,b < 2^30 give
    hi*a + lo*b + c < 2^62 — no int64 overflow — and numpy ``%`` equals the
    JVM/DuckDB ``%`` on nonnegative operands. Pinned by
    test_sig_arrow_bit_parity.

    Shuffle geometry is unchanged vs the JVM expression path: explode keeps
    a doc's postings contiguous within a partition, so the per-batch
    partial emits ~one row per doc (a doc straddles at most one batch
    boundary) and the final agg shuffles exactly what the JVM path's
    map-side combine would. The 256-slot interpreted expression chain this
    replaces was the #1 line of the round-9 bench
    (minhash_autotuned_dup_pairs, 16-20 s — VERDICT round 9 'What's wrong'
    #4).

    ``with_fp=True`` additionally computes ``_EST_SLOTS`` ESTIMATOR slot
    mins (emitted packed 8-per-long as the single ``fparr`` array<long>
    column — see the packing note at the end of this function) from an
    INDEPENDENT splitmix64 family (full
    avalanche, masked to 63 bits so numpy-uint64 mins and the JVM signed
    final min order identically). These back the verify="estimate"
    fingerprint prune. They are deliberately NOT the banding slots: the
    2-universal linear mix is fine for banding but unusable as a jaccard
    estimator — a shingle whose 60-bit hash is tiny has near-minimal
    hi*a + lo*b + c for EVERY (a,b), so it wins the argmin of all slots at
    once, and a true near-dup pair differing only in such a shingle shows
    ~0 slot agreement (measured on the sf0.1 corpus: a j=0.947 pair of
    18/19-shingle docs with 23/256 slot agreement)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    consts = np.array([_mh_consts(i) for i in range(num_hashes)], dtype=np.int64)
    A, B, C = consts[:, 0].copy(), consts[:, 1].copy(), consts[:, 2].copy()
    cols = [f"m{i}" for i in range(num_hashes)]
    ecols = [f"e{i}" for i in range(_EST_SLOTS)] if with_fp else []
    id_field = next(f for f in hashed.schema.fields if f.name == "id")
    schema = StructType(
        [StructField("id", id_field.dataType)]
        + [StructField(c, LongType()) for c in cols + ecols]
    )
    if with_fp:
        salts = (
            np.arange(1, _EST_SLOTS + 1, dtype=np.uint64) * np.uint64(_SM_GOLD)
        )

    # Tile size for the slot matrices (round 11). A 10k-row batch's slot
    # matrix is rows x num_hashes x 8 B ~ 25 MB plus same-sized temporaries
    # — DRAM-resident. This HOST (and any co-tenant VM like it) collapses
    # under many concurrent DRAM-streaming workers: the measured aggregate
    # throughput of exactly this computation was 490k rows/s at 8 procs but
    # 51k at 32 procs (per-proc 61k -> 1.6k — the round-10 'inverse
    # scaling' of the minhash whales, root-caused this round). Tiling to
    # 512 rows (~1.3 MB per buffer at the widest 320-slot geometry, L2-
    # resident) with preallocated in-place buffers measured 7.8M rows/s
    # aggregate at 32 procs — 153x — and restores positive 8->32 scaling.
    # Bit-exactness: identical int64/uint64 arithmetic, same op order,
    # in-place ops equal out-of-place; a doc spanning tiles emits one
    # partial-min row per tile, which the final GROUP BY re-mins exactly
    # (the same contract that already covered batch boundaries).
    tile = 512

    def gen(batches):
        nb_ = num_hashes
        band_buf = np.empty((tile, nb_), dtype=np.int64)
        band_tmp = np.empty((tile, nb_), dtype=np.int64)
        if with_fp:
            z_buf = np.empty((tile, _EST_SLOTS), dtype=np.uint64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            h = pdf["h"].to_numpy(dtype=np.int64)
            idv = pdf["id"].to_numpy()
            out_ids, out_mins = [], []
            for s in range(0, len(h), tile):
                hh = h[s : s + tile]
                ii = idv[s : s + tile]
                n = len(hh)
                b, t = band_buf[:n], band_tmp[:n]
                np.multiply((hh >> np.int64(30))[:, None], A, out=b)
                np.multiply((hh & np.int64(_LO30))[:, None], B, out=t)
                b += t
                b += C
                b %= np.int64(MH_PRIME)
                # per-tile partial min per id-RUN via one reduceat pass —
                # explode keeps a doc's postings contiguous, so runs ==
                # docs-in-tile; the final GROUP BY re-combines partials
                starts = np.nonzero(np.r_[True, ii[1:] != ii[:-1]])[0]
                mins = np.minimum.reduceat(b, starts, axis=0)
                if with_fp:
                    z = z_buf[:n]
                    np.add(hh.astype(np.uint64)[:, None], salts, out=z)
                    z ^= z >> np.uint64(30)
                    z *= np.uint64(_SM_M1)
                    z ^= z >> np.uint64(27)
                    z *= np.uint64(_SM_M2)
                    z ^= z >> np.uint64(31)
                    # mask to 63 bits: numpy's per-tile uint64 min and the
                    # JVM's signed cross-tile min must order identically
                    z >>= np.uint64(1)
                    emins = np.minimum.reduceat(z.view(np.int64), starts, axis=0)
                    mins = np.concatenate([mins, emins], axis=1)
                out_ids.append(ii[starts])
                out_mins.append(mins)
            # reduceat/concatenate outputs are fresh arrays (never views of
            # the reused tile buffers), so the frame can wrap them copy-free
            allm = out_mins[0] if len(out_mins) == 1 else np.concatenate(out_mins)
            out = pd.DataFrame(allm, columns=cols + ecols, copy=False)
            out.insert(0, "id", np.concatenate(out_ids))
            yield out

    partial = hashed.mapInPandas(gen, schema=schema)
    # one generated-SQL roundtrip, not 320 F.min().alias() py4j calls: the
    # wide final agg was measured costing ~1 s of DRIVER time per plan
    # build (see ops/sqlwide.py) — the parsed plan is identical
    from apollo_spark.ops.sqlwide import sql_over

    mins = ", ".join(f"min({c}) AS {c}" for c in cols + ecols)
    if not with_fp:
        return sql_over(partial, f"SELECT id, {mins} FROM {{v}} GROUP BY id")
    # estimator slots leave this function PACKED: 8-bit fingerprints
    # (slot & 255) 8-per-long, as ONE array<long> column. Packing in the
    # same generated SQL costs one projection over the ~1-row-per-doc agg
    # output; downstream the prune then joins/ships a single narrow array
    # column instead of 256 scalar columns (the round-10 column form spent
    # seconds per run in codegen compile + interpreted eval of the
    # 2048-term match-count CASE chain — see _fp_match_count_arrow).
    # Byte-equality may only OVER-estimate slot agreement (collision prob
    # 1/256 per differing slot) — the safe direction for a prune.
    nb = _EST_SLOTS // 8
    packs = ", ".join(
        "("
        + " | ".join(f"shiftleft(e{8 * j + k} & 255, {8 * k})" for k in range(8))
        + ")"
        for j in range(nb)
    )
    mcols = ", ".join(cols)
    return sql_over(
        partial,
        f"SELECT id, {mcols}, array({packs}) AS fparr "
        f"FROM (SELECT id, {mins} FROM {{v}} GROUP BY id)",
    )


def _minhash_band_candidates(
    base: DataFrame,
    num_hashes: int,
    bands: int,
    max_bucket: int | None = None,
    max_bucket_mode: str = "reband",
    with_fp: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Banded MinHash candidate pairs over ``base`` = (id, sh) with the
    portable hash family: 60-bit md5 shingle hash, 2-universal modular
    slots (_mh_consts), md5-prefix band keys. Returns ``(cand, sig)`` —
    distinct (id_a < id_b) candidate pairs and the PERSISTED signature
    frame both band-join sides read (the caller releases it). Shared by
    minhash_portable_pairs (verify-and-emit) and lsh_blocking_metrics
    (blocking-quality evaluation of the raw candidate set).

    ``max_bucket``: band buckets holding more than this many docs are
    pulled out of the coarse self-join BEFORE it runs — the production
    guard against LSH's mega-bucket pathology. Measured on the sf10 stress
    corpus (round 7): a structural boilerplate trigram ("query data
    data"-style repeated-word shingles, exactly what web boilerplate
    produces at 100 TB) is the argmin of every doc containing it at r=2,
    so its bucket grows WITH THE CORPUS and candidates go quadratic —
    1.46M -> 13.1M -> 145M at sf1/sf3/sf10 uncapped (11.4 GB spill),
    linear again with a cap. ``None`` keeps the raw candidate set.

    ``max_bucket_mode`` picks what happens to over-cap bucket MEMBERS
    (round 8):

    * ``"reband"`` (default): a RECURSIVE banding ladder. Members of
      over-cap buckets descend one level with doubled row count (r=2 -> 4
      -> 8 -> ... up to the whole signature), each level under a distinct
      'R{level}|' key prefix; every bucket that falls under the cap at some
      level is fully self-joined there. Doubling r squares the per-band
      collision probability (s^2 -> s^4 on the S-curve), so buckets glued
      together by ONE shared boilerplate argmin split within a level or
      two, while genuinely-similar pairs (agreeing on long slot runs) keep
      full pairing. At the FLOOR — one band spanning all ``num_hashes``
      slots — a bucket still over the cap holds signature-identical docs,
      a bona-fide near-dup clique (the round-8 skew rehearsal planted one
      via a boilerplate line in 10% of docs and measured the single-level
      full refined join going 6.4x at 3x data); a clique's pairs are
      redundant for what dedup consumes — connectivity — so its members
      are STAR-LINKED through the bucket's min id. Invariants: no hot
      bucket's members are ever silently separated, and candidate count is
      <= cap * (total banded rows across levels) + one star edge per floor
      membership — linear in the corpus. Each level's keyed frame is
      localCheckpoint'ed: levels shrink geometrically and the cut stops a
      ~5x-per-level lineage-recompute fan-out (303 s -> ~30 s at sf1).
    * ``"drop"``: the round-7 behavior — hot buckets vanish and their
      exclusive pairs are lost; the cheap opt-in when recall inside
      boilerplate clusters is explicitly not wanted.

    Either way the recall cost/benefit is MEASURED, not assumed:
    lsh_blocking_quality reports PC for the production configuration."""
    from apollo_spark.ops.sketch import portable_hash60

    rows = num_hashes // bands
    hashed = base.select("id", F.explode("sh").alias("s")).select(
        "id", portable_hash60(F.col("s")).alias("h")
    )
    # both band-join sides re-derive from sig: persist so the explode +
    # slot-min aggregate runs once, not twice. Wide geometries take the
    # Arrow path (numpy matrix op, bit-identical — see _portable_sig_arrow).
    from apollo_spark.ops.sqlwide import sql_over

    if num_hashes >= _SIG_ARROW_MIN_HASHES:
        sig = _portable_sig_arrow(hashed, num_hashes, with_fp=with_fp).persist()
    else:
        # generated SQL, not num_hashes F.min() chains: one py4j roundtrip
        # (the parsed expressions are the byte-identical 2-universal mix)
        mins = ", ".join(
            "min((shiftright(h, 30) * {a} + (h & {lo}) * {b} + {c}) % {p}) AS m{i}".format(
                a=a, b=b, c=c, lo=_LO30, p=MH_PRIME, i=i
            )
            for i, (a, b, c) in ((i, _mh_consts(i)) for i in range(num_hashes))
        )
        sig = sql_over(hashed, f"SELECT id, {mins} FROM {{v}} GROUP BY id").persist()
    # band keys as ONE generated explode: 128 keys x ~8 Column calls each
    # was ~2 s of py4j chatter per plan build at the autotuned geometry
    keys_sql = ", ".join(
        "CAST(conv(substring(md5(concat_ws('|', {b}, {cols})), 1, 15), 16, 10) AS BIGINT)".format(
            b=b, cols=", ".join(f"m{b * rows + j}" for j in range(rows))
        )
        for b in range(bands)
    )
    banded = sql_over(sig, f"SELECT id, explode(array({keys_sql})) AS bkey FROM {{v}}")
    # recursive banding ladder (shared impl, _band_ladder_pairs). Two
    # mechanisms per level:
    # * STAR every hot bucket through its min id (one candidate edge per
    #   membership row — linear): the CONNECTIVITY guarantee. A descending
    #   member can land only in singleton refined buckets (its unique
    #   shingles win some slot in every window) — without the per-level
    #   star it would silently separate from bucket mates it genuinely
    #   near-duplicates (the first ladder draft did exactly that; pinned
    #   by the component-partition test).
    # * DESCEND members one level with DOUBLED row count (r -> 2r:
    #   per-band collision prob squares) and a geometrically-RELAXED cap
    #   (4^level: selectivity squares while the allowance only quadruples,
    #   so the per-level pair bound rows_l * cap_l grows 2^l over <=
    #   log2(num_hashes/rows) levels — linear in N): full PAIR recovery
    #   for genuinely-similar sub-groups.
    # At the floor (one band = whole signature) hot buckets are
    # signature-identical cliques; their star is the last one emitted.
    cand = _band_ladder_pairs(
        sig,
        banded,
        num_hashes,
        rows,
        max_bucket,
        max_bucket_mode,
        # the portable md5 key family with a distinct 'R{level}|' prefix —
        # byte-replayed by the DuckDB oracle
        lambda level, b, slots: F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(f"R{level}"), F.lit(b), *slots)), 1, 15
            ),
            16,
            10,
        ).cast("long"),
    )
    return cand.dropDuplicates(["id_a", "id_b"]), sig


def _fp_match_count_arrow() -> "F.Column":
    """Vectorized count of agreeing packed-fingerprint BYTES between two
    array<long> fingerprint columns (see _portable_sig_arrow with_fp): XOR
    the 32-long vectors, count zero bytes — 256 byte comparisons per pair
    as three numpy ops over the whole Arrow batch.

    Why a pandas UDF and not JVM expressions (round 10): the flat
    2048-term CASE chain over 64 scalar columns this replaces spent ~3 s
    in Janino codegen compile on first execution and ~1 s per 16k rows in
    interpreted evaluation after (measured at sf0.1); the higher-order
    zip_with/aggregate array form is interpreted too (2.1x slower
    end-to-end, big-doc rehearsal). Arrow ships 2x32 longs per candidate
    (exactly what the scalar columns shipped) and numpy does the byte
    compare at memory bandwidth. Byte-zero count is order-independent, so
    the little-endian view equals the JVM shiftrightunsigned byte walk
    bit-for-bit."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _match(a: "pd.Series", b: "pd.Series") -> "pd.Series":
        if len(a) == 0:
            return pd.Series([], dtype="int64")
        xa = np.stack(a.to_numpy()).astype(np.int64, copy=False)
        xb = np.stack(b.to_numpy()).astype(np.int64, copy=False)
        x = (xa ^ xb).view(np.uint8)  # (n, 32) longs -> (n, 256) bytes
        return pd.Series((x == 0).sum(axis=1).astype(np.int64))

    _match.__annotations__ = {"a": pd.Series, "b": pd.Series, "return": pd.Series}
    return pandas_udf(_match, "long")


def minhash_portable_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket: int | None = None,
    max_bucket_mode: str = "reband",
    scrub_max_df_frac: float | None = None,
    verify: str = "full",
    estimate_margin: float | None = None,
) -> DataFrame:
    """MinHash-LSH near-dup pairs with a fully SQL-replayable hash family.
    ``max_bucket`` pulls mega band buckets out of the coarse self-join (see
    _minhash_band_candidates — the production guard for boilerplate-driven
    quadratic buckets at r=2; None preserves the certified raw set);
    ``max_bucket_mode="reband"`` sends their members down the recursive
    finer-r banding ladder (recall-preserving, linear), ``"drop"`` discards
    them (round-7 behavior).

    Shingle hash = 60-bit md5 prefix; slot i = min over shingles of the
    2-universal mix with _mh_consts(i); band key = md5 prefix of the
    '|'-joined (band, slot values) string.  b=16 x r=2 default:
    P(candidate | j=0.5) = 1-(1-0.25)^16 ~ 0.99.  Candidates are verified
    with exact shingle jaccard, so band-hash collisions are harmless.
    ``scrub_max_df_frac`` removes hot shingles before signatures and the
    verify (scrub_hot_shingles) — the upstream boilerplate fix.

    Verify-stage scale design (round 10 — the sf10 disk-ceiling fix,
    VERDICT round 9 #1). The round-9 verify joined BOTH raw shingle-string
    arrays onto EVERY candidate (~2x3 KB at web-doc sizes) — at the
    256-hash uniform geometry the sf10 rehearsal exhausted this host's
    local disk on that shuffle (BASELINE.md round-9 second wave). Both
    verify modes now apply two deterministic reductions first:

    * HASHED-SET payload: candidates join ``array<long>`` 60-bit-md5
      shingle hashes, not strings (~3x fewer bytes, cheaper comparisons).
      |hash(A) ∩ hash(B)| = |A ∩ B| unless two distinct shingles inside
      ONE pair's union share a 60-bit md5 prefix (P ~ n^2/2^60 per pair —
      vanishing, and deterministic either way); the gates confirm values
      are unchanged on the gate corpora.
    * SIZE-RATIO prune: J(A,B) <= min(|A|,|B|)/max(|A|,|B|), so pairs
      whose set sizes differ by more than 1/threshold are dropped by a
      sizes-only join (2 longs per side) BEFORE any array ships. Provably
      lossless — pure algebra, no estimator.

    ``verify="estimate"`` additionally prunes on a 256-slot MinHash
    jaccard estimate carried as 8-bit fingerprints packed 8-per-long (32
    longs per side, ~100x smaller than raw string arrays): candidates with
    estimate < threshold - estimate_margin never reach the array join;
    the surviving sliver is exact-rescored and every emitted pair carries
    the exact jaccard. The estimator slots are an INDEPENDENT splitmix64
    family (computed in the Arrow signature pass, engaged when num_hashes
    >= 64), NOT the banding slots: the banding family's 2-universal linear
    mix is unusable as an estimator — a shingle with a tiny 60-bit hash
    wins the argmin of every slot at once, and the first implementation of
    this prune dropped a TRUE j=0.947 pair of short docs whose one
    differing shingle did exactly that (23/256 slot agreement; see
    test_estimate_pathological_short_docs). With the avalanche family the
    estimate concentrates: P(drop | j >= t) < exp(-2*256*margin^2)
    (Hoeffding; 1e-5 at the default margin 0.15, per at-threshold pair —
    pairs above threshold are exponentially safer). Equality vs the full
    verify is pinned by test_estimate_verify_equals_full; the oracle
    replays the full verify, so gates certify the estimate path emits
    nothing extra and drops nothing on the gate corpora."""
    # small corpora arrive as one parquet split; spread the CPU-bound
    # shingle/md5/slot work across cores before it runs (same rationale as
    # minhash_lsh_pairs — at lake scale the scan is already multi-split and
    # this coalesces to the shuffle width, not a blow-up). Round 10: the
    # single-split form ran the whole 256-slot signature map single-threaded
    # (~6 s of the 16 s bench line).
    parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    if verify not in ("full", "estimate"):
        raise ValueError(f"verify must be 'full' or 'estimate', got {verify!r}")
    from apollo_spark.ops.sketch import portable_hash60

    base = _shingle_base(
        df.repartition(parts, F.col(id_col)), id_col, text_col, n, scrub_max_df_frac
    ).persist()
    with_fp = verify == "estimate" and num_hashes >= _SIG_ARROW_MIN_HASHES
    cand, sig = _minhash_band_candidates(
        base, num_hashes, bands, max_bucket, max_bucket_mode, with_fp=with_fp
    )
    # deterministic size-ratio prune: J <= min/max sizes, a sizes-only join
    sizes = base.select("id", F.size("sh").alias("ns"))
    cand = (
        cand.join(sizes.select(F.col("id").alias("id_a"), F.col("ns").alias("ns_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("ns").alias("ns_b")), "id_b")
        .filter(
            F.least("ns_a", "ns_b").cast("double")
            >= F.lit(float(threshold)) * F.greatest("ns_a", "ns_b").cast("double")
        )
    )
    if with_fp:
        # prune on the splitmix-fingerprint jaccard estimate; only the
        # sliver near/over the threshold pays the hashed-array join. The
        # fingerprints ride ONE array<long> column per side and the match
        # count is an Arrow/numpy pass (see _fp_match_count_arrow); the
        # __est projection is pruned away after the filter, so the UDF
        # evaluates once, under the filter only.
        margin = 0.15 if estimate_margin is None else float(estimate_margin)
        fp = sig.select("id", "fparr")
        match = _fp_match_count_arrow()
        cand = (
            cand.join(fp.select(F.col("id").alias("id_a"), F.col("fparr").alias("__fpa")), "id_a")
            .join(fp.select(F.col("id").alias("id_b"), F.col("fparr").alias("__fpb")), "id_b")
            .withColumn(
                "__est",
                match(F.col("__fpa"), F.col("__fpb")).cast("double")
                / F.lit(float(_EST_SLOTS)),
            )
            .filter(F.col("__est") >= F.lit(float(threshold - margin)))
        )
    cand = cand.select("id_a", "id_b", "ns_a", "ns_b")
    # hashed-set exact verify: array<long> payload, |A ∩ B| on longs;
    # union from the pre-joined exact sizes (sets are distinct)
    hs_map = base.select("id", F.transform("sh", lambda s: portable_hash60(s)).alias("hs"))
    cand = cand.join(
        hs_map.select(F.col("id").alias("id_a"), F.col("hs").alias("hs_a")), "id_a"
    ).join(hs_map.select(F.col("id").alias("id_b"), F.col("hs").alias("hs_b")), "id_b")
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    union = F.col("ns_a") + F.col("ns_b") - inter
    return scoped_persist(
        cand.withColumn("jaccard", inter.cast("double") / union.cast("double"))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard"),
        base,
        sig,
    )


def simhash60_portable(text_col, n: int = 2):
    """60-bit SimHash whose feature hash is the 60-bit md5 prefix — the
    signature (not just its row count) is reproducible in DuckDB.  60 bits
    also sidesteps the Java sign-bit special case of the 64-bit variant:
    every mask is a positive long."""
    from apollo_spark.ops.sketch import portable_hash60

    bits = 60
    sh = shingles(text_col, n)
    hashes = F.transform(sh, lambda s: portable_hash60(s))
    masks = F.array(*[F.lit(1 << b).cast("long") for b in range(bits)])
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(acc, masks, lambda a, m: a + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1)),
    )
    return F.aggregate(
        F.zip_with(votes, masks, lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, x: acc.bitwiseOR(x),
    )


def simhash_portable_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    max_hamming: int = 3,
) -> DataFrame:
    """ALL pairs within hamming distance max_hamming of the portable 60-bit
    SimHash — lossless by pigeonhole: 4 blocks of 15 bits, <=3 differing bits
    cannot touch all 4 blocks, so every qualifying pair collides in >=1 block.
    The block join shuffles (block, 15-bit key) scalars; candidates are
    verified with bit_count, so this is exact (same trick as the image
    ahash pairing, which is what makes a naive-join SQL oracle valid).

    Signatures here go through explode + one groupBy with 60 conditional-sum
    votes (map-side combined, whole-stage codegen) rather than the
    column-level array fold of simhash60_portable: the fold re-walks a
    60-wide accumulator per shingle inside a lambda interpreter and measures
    ~5x slower on a real corpus.  Both produce identical bits."""
    blocks, bbits = 4, 15
    bits = 60
    from apollo_spark.ops.sketch import portable_hash60

    ex = df.select(F.col(id_col).alias("id"), F.explode(shingles(F.col(text_col), n)).alias("s")).select(
        "id", portable_hash60(F.col("s")).alias("h")
    )
    # generated SQL for the 60-vote agg + bit reassembly: one py4j roundtrip
    # per step instead of ~500 Column calls, identical parsed expressions
    # (see ops/sqlwide.py)
    from apollo_spark.ops.sqlwide import sql_over

    votes = sql_over(
        ex,
        "SELECT id, "
        + ", ".join(
            f"sum(CASE WHEN (shiftright(h, {b}) & 1) = 1 THEN 1 ELSE -1 END) AS v{b}"
            for b in range(bits)
        )
        + " FROM {v} GROUP BY id",
    )
    sim_sql = " + ".join(
        f"CASE WHEN v{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for b in range(bits)
    )
    # both sides of the block self-join consume the signatures: persist so
    # the shingle explode + 60-vote aggregate runs once, not twice
    sig = votes.selectExpr("id", f"({sim_sql}) AS sim").persist()
    keyed = sig.select(
        "id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned(F.col("sim"), i * bbits)
                        .bitwiseAND(F.lit((1 << bbits) - 1).cast("long"))
                        .alias("key"),
                    )
                    for i in range(blocks)
                ]
            )
        ).alias("bk"),
    )
    a = keyed.select(F.col("id").alias("id_a"), F.col("sim").alias("sim_a"), F.col("bk").alias("ka"))
    b = keyed.select(F.col("id").alias("id_b"), F.col("sim").alias("sim_b"), F.col("bk").alias("kb"))
    return scoped_persist(
        a.join(b, (a["ka"] == b["kb"]) & (a["id_a"] < b["id_b"]))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming"),
        sig,
    )


def lsh_blocking_metrics(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_n: int = 3,
    truth_n: int = 2,
    num_hashes: int = 32,
    bands: int = 16,
    truth_threshold: float = 0.2,
    max_df_frac: float | None = 0.04,
    max_bucket: int | None = None,
    max_bucket_mode: str = "reband",
    cand_truth: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Blocking-quality evaluation of the MinHash-LSH candidate generator —
    the record-linkage literature's two standard numbers (Christen 2012):

    * pair completeness (PC): fraction of TRUE near-dup pairs (exact
      ``truth_n``-gram Jaccard >= ``truth_threshold``, candidates from the
      df-capped inverted index — the linear-scale ground truth) that the
      banded ``block_n``-gram signature join surfaces as candidates;
    * reduction ratio (RR): 1 - candidates / all-pairs — how much of the
      quadratic comparison space the blocker never touches.

    ``block_n`` and ``truth_n`` are independent ON PURPOSE: the blocker and
    the truth definition are different systems (that is what keeps the
    evaluation non-circular), and their scale behavior pulls opposite ways —
    trigram banding stays near-linear because inter-document trigram overlap
    decays fast, while the bigram truth rides the df cap that prunes exactly
    the hot bigrams driving inverted-index fan-out. Forcing one shared n was
    measured at sf0.1 and rejected both ways: bigram banding admits ~4% of
    ALL pairs (candidates grow quadratically with natural corpus growth),
    trigram truth dodges the df cap (index join fan-out, 39.7 s vs ~8 s).

    One row: n_docs, n_true, n_cand, n_caught, pair_completeness,
    reduction_ratio. Every count is a 1-row aggregate riding crossJoins
    (declarative — no driver count); the candidate and truth frames are
    each computed once and persisted for their two consumers.

    ``cand_truth``: precomputed (candidate, truth) pair frames — the shared
    evaluation substrate (round 9): this metric and lsh_merge_completeness
    consume the SAME signatures, ladder candidates, and df-capped exact
    truth, and recomputing them twice was ~11% of the whole bench. Callers
    route both queries through one artifact (queries.mining's
    APOLLO_SPARK_ARTIFACT_DIR path, built once per corpus snapshot via
    train_or_load_table) and only the metric tail runs here.
    """
    releasable: list[DataFrame] = []
    tp = None
    if cand_truth is None:
        base = (
            df.select(F.col(id_col).alias("id"), shingles(F.col(text_col), block_n).alias("sh"))
            .filter(F.size("sh") > 0)
            .persist()
        )
        cand, sig = _minhash_band_candidates(base, num_hashes, bands, max_bucket, max_bucket_mode)
        cand = cand.persist()
        tp = ngram_jaccard_pairs(
            df, id_col=id_col, text_col=text_col, n=truth_n,
            threshold=truth_threshold, max_df_frac=max_df_frac,
        )
        truth = tp.select("id_a", "id_b").persist()
        nd = base.agg(F.count(F.lit(1)).alias("n_docs"))
        releasable = [base, sig, cand, truth]
    else:
        cand, truth = cand_truth
        cand, truth = cand.persist(), truth.persist()
        nd = (
            df.select(F.col(id_col).alias("id"), shingles(F.col(text_col), block_n).alias("sh"))
            .filter(F.size("sh") > 0)
            .agg(F.count(F.lit(1)).alias("n_docs"))
        )
        releasable = [cand, truth]
    caught = truth.join(cand, ["id_a", "id_b"], "left_semi")
    nt = truth.agg(F.count(F.lit(1)).alias("n_true"))
    nc = cand.agg(F.count(F.lit(1)).alias("n_cand"))
    ng = caught.agg(F.count(F.lit(1)).alias("n_caught"))
    all_pairs = (F.col("n_docs") * (F.col("n_docs") - F.lit(1))).cast("double") / F.lit(2.0)
    out = (
        nd.crossJoin(nt).crossJoin(nc).crossJoin(ng)
        .withColumn(
            "pair_completeness",
            F.when(
                F.col("n_true") > 0,
                F.col("n_caught").cast("double") / F.col("n_true").cast("double"),
            ),
        )
        .withColumn(
            "reduction_ratio",
            F.when(F.col("n_docs") > 1, F.lit(1.0) - F.col("n_cand").cast("double") / all_pairs),
        )
    )
    from apollo_spark.ops.cache import carry_caches

    out = scoped_persist(out, *releasable)
    return carry_caches(out, tp) if tp is not None else out


def lsh_merge_completeness(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_n: int = 3,
    truth_n: int = 2,
    num_hashes: int = 32,
    bands: int = 16,
    truth_threshold: float = 0.2,
    max_df_frac: float | None = 0.04,
    max_bucket: int | None = None,
    max_bucket_mode: str = "reband",
    cand_truth: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Connectivity-level blocking evaluation — the round-8 companion to
    lsh_blocking_metrics' pair completeness. The skew rehearsal
    (BASELINE.md round-8 #2) showed WHY it exists: boilerplate makes the
    TRUE near-dup set a quadratic clique, so no linear-candidate blocker
    can enumerate it — but dedup consumes COMPONENTS (keep-best, dup-mass,
    sample weights), and a clique is merged by any spanning set of caught
    edges. Merge completeness prices exactly that:

        MC = (|V_t| - n_components(caught)) / (|V_t| - n_components(truth))

    over the truth graph's nodes, where caught = truth pairs surfaced as
    candidates and truth nodes untouched by caught edges count as
    singletons. 1.0 = the blocker achieves every merge dedup needs; the
    guard modes are compared by MC in BASELINE.md (ladder doubles drop's
    MC on the skew rehearsal at linear cost).

    One row: n_true, n_caught, truth_nodes, truth_components,
    caught_components, merge_completeness. Components run through the same
    connected_components op production dedup uses (driver union-find under
    2M edges, star-contraction above), so this evaluation scales with the
    thing it evaluates.

    ``cand_truth``: precomputed (candidate, truth) pair frames — the shared
    substrate with lsh_blocking_metrics (see there); only the component
    tail runs here."""
    releasable: list[DataFrame] = []
    tp = None
    if cand_truth is None:
        base = (
            df.select(F.col(id_col).alias("id"), shingles(F.col(text_col), block_n).alias("sh"))
            .filter(F.size("sh") > 0)
            .persist()
        )
        cand, sig = _minhash_band_candidates(base, num_hashes, bands, max_bucket, max_bucket_mode)
        cand = cand.persist()
        tp = ngram_jaccard_pairs(
            df, id_col=id_col, text_col=text_col, n=truth_n,
            threshold=truth_threshold, max_df_frac=max_df_frac,
        )
        truth = tp.select("id_a", "id_b").persist()
        releasable = [base, sig, cand, truth]
    else:
        cand, truth = cand_truth
        cand, truth = cand.persist(), truth.persist()
        releasable = [cand, truth]
    caught = truth.join(cand, ["id_a", "id_b"], "left_semi").persist()
    tnodes = (
        truth.select(F.col("id_a").alias("id"))
        .unionByName(truth.select(F.col("id_b").alias("id")))
        .distinct()
        .persist()
    )
    tcomp = connected_components(truth).select("comp").distinct()
    ccc = connected_components(caught).persist()
    isolated = tnodes.join(ccc.select("id"), "id", "left_anti")
    nt = truth.agg(F.count(F.lit(1)).alias("n_true"))
    ng = caught.agg(F.count(F.lit(1)).alias("n_caught"))
    nn = tnodes.agg(F.count(F.lit(1)).alias("truth_nodes"))
    ct = tcomp.agg(F.count(F.lit(1)).alias("truth_components"))
    cc = ccc.select("comp").distinct().agg(F.count(F.lit(1)).alias("__cc")).crossJoin(
        isolated.agg(F.count(F.lit(1)).alias("__iso"))
    ).select((F.col("__cc") + F.col("__iso")).alias("caught_components"))
    out = (
        nt.crossJoin(ng).crossJoin(nn).crossJoin(ct).crossJoin(cc)
        .withColumn(
            "merge_completeness",
            F.when(
                F.col("truth_nodes") > F.col("truth_components"),
                (F.col("truth_nodes") - F.col("caught_components")).cast("double")
                / (F.col("truth_nodes") - F.col("truth_components")).cast("double"),
            ).otherwise(F.lit(1.0)),
        )
    )
    from apollo_spark.ops.cache import carry_caches

    out = scoped_persist(out, *releasable, caught, tnodes, ccc)
    return carry_caches(out, tp) if tp is not None else out


# --------------------------------------------------------------------------
# Corpus-adaptive blocking geometry (round 9) — the round-8 skew rehearsal's
# conclusion (BASELINE.md round-8 #2) was that no mega-bucket GUARD can buy
# back recall the fixed r=2/b=16 geometry never had on low-similarity truth:
# at truth jaccard 0.2 the analytic capture of b=16 x r=2 is only
# 1-(1-0.04)^16 = 0.48, so even the UNCAPPED candidate set merges ~55% of
# what dedup needs. The fix is choosing the geometry PER (corpus, threshold)
# from the engine's own instruments: the analytic S-curve (lsh_scurve_table's
# math, generalized over a menu) picks (num_hashes, bands), and a
# vocabulary-sized df pass (dedup_cost_profile's math, at the blocker's n)
# picks the truth-side df cap and detects boilerplate skew.
# --------------------------------------------------------------------------

# (pref_uniform, pref_boiler, num_hashes, rows-per-band, max_bucket): two
# preference orders over one menu, chosen IN-PLAN by the corpus's
# boilerplate-skew flag — the round-9 rehearsals measured that low-j
# capture has two very different right answers:
#
# * BOILERPLATE-SKEWED corpora (hot-shingle mass > 0): the truth contains
#   cliques glued by a shared line whose pairs sit at very LOW blocker-n
#   jaccard — only r=1 (per-band selectivity j, not j^r) reaches them;
#   merge completeness at sf1skew: r=1/b=32/cap1024 0.68 vs r=2/b=128's
#   0.38. r=1's junk admission is the price of clique connectivity.
# * UNIFORM corpora: no cliques to connect; r=1 admits essentially every
#   pair on a saturated vocabulary (measured: ~116M candidates at sf1,
#   284 s at sf3, disk-exhausted at sf10), while DEEP r=2 signatures
#   (256 hashes, b=128) hold capture 0.9946 at j=0.2 with ~100x less
#   admission at the corpus's background similarity (1.75M candidates at
#   sf1) — more hashes cost linearly, shallow rows cost quadratically.
#
# Within each order: sharpest usable S-curve first, then fewer hashes.
# bands = num_hashes/rows stays a power of two, so every capture
# probability is an exact squaring chain (no pow()/libm dependence).
# max_bucket is the ladder guard's level-0 cap, a static property of the
# geometry (r=1's informative buckets are legitimately larger: cap 64
# holds skew MC to 0.39 where 1024 recovers the uncapped 0.68).
BLOCKING_GEOMETRY_MENU: tuple[tuple[int, int, int, int, int], ...] = (
    (1, 1, 32, 4, 64),
    (2, 2, 64, 4, 64),
    (3, 3, 32, 2, 64),
    (4, 4, 64, 2, 64),
    (5, 7, 256, 2, 64),
    (6, 5, 32, 1, 1024),
    (7, 6, 64, 1, 1024),
)

# candidate truth-side df-cap fractions (ngram_jaccard_pairs max_df_frac),
# ascending; the profile picks the largest whose predicted inverted-index
# fan-out fits a linear budget.
BLOCKING_FRAC_GRID: tuple[float, ...] = (0.005, 0.01, 0.02, 0.04, 0.08)


def _capture_columns(s):
    """1-(1-s)^b for b in {8,16,32,64,128} via explicit squaring chains (the
    lsh_scurve_table discipline: every step one IEEE multiply, identical on
    Spark/DuckDB/numpy)."""
    x = F.lit(1.0) - s
    x2 = x * x
    x4 = x2 * x2
    x8 = x4 * x4
    x16 = x8 * x8
    x32 = x16 * x16
    x64 = x32 * x32
    x128 = x64 * x64
    return {
        8: F.lit(1.0) - x8,
        16: F.lit(1.0) - x16,
        32: F.lit(1.0) - x32,
        64: F.lit(1.0) - x64,
        128: F.lit(1.0) - x128,
    }


def blocking_config_profile(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    capture_target: float = 0.95,
    pair_budget_per_doc: int = 64,
    frac_floor: int = 1024,
    hot_frac: float = 0.04,
    scrub_share: float = 0.002,
) -> DataFrame:
    """ONE-ROW corpus-adaptive blocking configuration — the composition of
    dedup_cost_profile (vocabulary-sized df pass) and the analytic S-curve
    (lsh_scurve_table's exact squaring chains) into a per-(corpus,
    threshold) choice of (num_hashes, bands, max_df_frac, scrub):

    * geometry: the first BLOCKING_GEOMETRY_MENU entry whose analytic
      capture 1-(1-t^r)^b at the dedup ``threshold`` meets
      ``capture_target`` (preference: sharper S-curves first — they admit
      the least low-similarity junk); if none qualifies, the max-capture
      entry. At t=0.5 this reproduces the certified r=2/b=16 default; at
      t=0.2 it escalates to r=1/b=32 (capture 0.9992 vs r=2/b=16's 0.48 —
      the round-8 skew-rehearsal gap, BASELINE.md round-8 #2).
    * rec_max_df_frac: the largest BLOCKING_FRAC_GRID fraction whose
      predicted truth-index fan-out sum_{df<=cap} C(df,2) (cap =
      max(floor(frac*n_docs), frac_floor), production ngram_jaccard
      semantics) fits ``pair_budget_per_doc * n_docs`` — a LINEAR budget;
      if none fits, the cheapest fraction (ties broken toward more recall,
      exploiting monotonicity of the fan-out in frac).
    * rec_scrub: hot-shingle occupancy (share of shingle postings whose
      df exceeds the production ``hot_frac`` cap) above ``scrub_share``
      flags a boilerplate-skewed corpus — measured 0.0115 on the skew
      rehearsal vs exactly 0.0 on every uniform corpus/SF, so the flag is
      a clean separator, not a tuned knife-edge.

    Everything is computed IN-PLAN (1-row aggregates riding crossJoins, a
    6-row literal menu, CASE selection; the only driver constants are the
    menu and grid literals), so the DuckDB oracle replays the entire
    selection — stats, capture arithmetic, and the argmax — bit-for-bit.
    Scale: one shingle-vocabulary groupBy (map-combinable) is the whole
    data-dependent cost."""
    spark = df.sparkSession
    # spread the shingling across cores (single-split small corpora;
    # coalesces to shuffle width at lake scale — see minhash_portable_pairs)
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # the doc count and the df pass both shingle the corpus: persist the
    # (id, shingle-array) base so the regex tokenize+distinct runs once
    base = df.repartition(parts, F.col(id_col)).select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), n).alias("sh")
    ).filter(F.size("sh") > 0).persist()
    ex = base.select("id", F.explode("sh").alias("s"))
    nd = base.agg(F.count(F.lit(1)).alias("n_docs"))
    dfreq = ex.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    x = dfreq.crossJoin(F.broadcast(nd))
    # C(df,2) via shiftright: exact BIGINT halving of the (always even)
    # product — no double round-trip, replayed as integer // in the oracle
    pairs = F.shiftright(F.col("df") * (F.col("df") - F.lit(1)), 1)
    cut_hot = F.greatest(F.floor(F.lit(float(hot_frac)) * F.col("n_docs")), F.lit(int(frac_floor)))
    aggs = [
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.when(F.col("df") > cut_hot, F.col("df")).otherwise(F.lit(0))).alias("__hot_mass"),
        F.sum("df").alias("__total_mass"),
    ]
    for i, frac in enumerate(BLOCKING_FRAC_GRID):
        cut = F.greatest(F.floor(F.lit(float(frac)) * F.col("n_docs")), F.lit(int(frac_floor)))
        aggs.append(
            F.sum(F.when(F.col("df") <= cut, pairs).otherwise(F.lit(0))).alias(f"__est{i}")
        )
    stats = x.groupBy("n_docs").agg(*aggs)

    budget = F.lit(int(pair_budget_per_doc)) * F.col("n_docs")
    k = len(BLOCKING_FRAC_GRID)
    # largest frac under the linear budget ...
    sel_frac = None
    sel_est = None
    for i in reversed(range(k)):
        cond = F.col(f"__est{i}") <= budget
        lit_f, col_e = F.lit(float(BLOCKING_FRAC_GRID[i])), F.col(f"__est{i}")
        sel_frac = F.when(cond, lit_f) if sel_frac is None else sel_frac.when(cond, lit_f)
        sel_est = F.when(cond, col_e) if sel_est is None else sel_est.when(cond, col_e)
    # ... else the cheapest (= smallest-frac, fan-out is monotone in frac),
    # ties broken toward the LARGEST equal-cost frac (more recall, same cost)
    fall_frac = F.lit(float(BLOCKING_FRAC_GRID[0]))
    fall_est = F.col("__est0")
    for i in range(1, k):
        tie = F.col(f"__est{i}") == F.col("__est0")
        fall_frac = F.when(tie, F.lit(float(BLOCKING_FRAC_GRID[i]))).otherwise(fall_frac)
        # each iteration WRAPS the previous chain as its otherwise, so the
        # outermost (last-built, largest-frac) tie check wins
        fall_est = F.when(tie, F.col(f"__est{i}")).otherwise(fall_est)
    sel_frac = sel_frac.otherwise(fall_frac)
    sel_est = sel_est.otherwise(fall_est)

    # "rpb" = rows per band ("rows" is a window-frame keyword in both
    # engines' SQL grammars)
    menu = spark.createDataFrame(
        list(BLOCKING_GEOMETRY_MENU),
        "pref_u INT, pref_b INT, num_hashes INT, rpb INT, max_bucket INT",
    )
    t = F.lit(float(threshold))
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
    mg = menu.select(
        "pref_u",
        "pref_b",
        "num_hashes",
        "rpb",
        "max_bucket",
        bands_col.alias("bands"),
        capture.alias("capture_at_threshold"),
    )
    # selection is CORPUS-AWARE: the boilerplate flag picks which preference
    # order ranks the capture-qualified rows (see BLOCKING_GEOMETRY_MENU)
    boiler = F.col("__hot_mass").cast("double") > F.lit(float(scrub_share)) * F.col(
        "__total_mass"
    ).cast("double")
    eff_pref = F.when(boiler, F.col("pref_b")).otherwise(F.col("pref_u"))
    meets = F.col("capture_at_threshold") >= F.lit(float(capture_target))
    chosen = (
        stats.crossJoin(F.broadcast(mg))
        .orderBy(
            meets.desc(),
            F.when(meets, eff_pref.cast("double"))
            .otherwise(-F.col("capture_at_threshold"))
            .asc(),
            eff_pref.asc(),
        )
        .limit(1)
    )

    from apollo_spark.ops.cache import scoped_persist

    return scoped_persist(
        chosen.select(
            F.lit(float(threshold)).alias("threshold"),
            "n_docs",
            "n_shingles",
            (F.col("__hot_mass").cast("double") / F.col("__total_mass").cast("double")).alias(
                "hot_shingle_share"
            ),
            (
                F.col("__hot_mass").cast("double")
                > F.lit(float(scrub_share)) * F.col("__total_mass").cast("double")
            ).alias("rec_scrub"),
            sel_frac.alias("rec_max_df_frac"),
            sel_est.cast("long").alias("est_capped_pairs"),
            F.col("num_hashes").alias("rec_num_hashes"),
            F.col("bands").alias("rec_bands"),
            F.col("rpb").alias("rec_rows"),
            F.col("max_bucket").alias("rec_max_bucket"),
            "capture_at_threshold",
        ),
        base,
    )


def _profile_row_to_config(row) -> dict:
    """blocking_config_profile's one row -> the plan-construction dict;
    shared by the fresh (blocking_autotune) and artifact-backed
    (train_or_load_blocking_profile) paths so the two can never drift."""
    return {
        "num_hashes": int(row["rec_num_hashes"]),
        "bands": int(row["rec_bands"]),
        "rows": int(row["rec_rows"]),
        "max_bucket": int(row["rec_max_bucket"]),
        "max_df_frac": float(row["rec_max_df_frac"]),
        "scrub": bool(row["rec_scrub"]),
        "capture": float(row["capture_at_threshold"]),
        "hot_shingle_share": float(row["hot_shingle_share"]),
        "n_docs": int(row["n_docs"]),
    }


def uniform_geometry(threshold: float, capture_target: float = 0.95) -> dict:
    """The BLOCKING_GEOMETRY_MENU selection under the UNIFORM preference
    order, computed analytically (no data pass — the only data-dependent
    input to geometry choice is the boilerplate flag, which this function
    exists to OVERRIDE). Capture arithmetic replicates
    blocking_config_profile's exact squaring chains (repeated IEEE
    squaring, not pow), so the choice here equals what the in-plan
    selection would pick with the uniform order.

    Why it exists (round 10, measured): on a boilerplate-flagged corpus
    the profile picks r=1/b=32 for CLIQUE CONNECTIVITY — the right call
    when the boilerplate-driven edges must be found. But when the scrub
    engages (auto or forced), those edges are REMOVED before banding:
    similarity is redefined over the informative remnants, which form a
    uniform (often small-vocabulary) corpus — and r=1 banding on a
    saturated vocabulary is the quadratic regime round 9 measured
    disk-fatal on the uniform replicas. The sf3skew DSL rehearsal
    reproduced exactly that: profile flags boiler -> r=1, scrub removes
    the boiler, r=1 bands the 40-word-vocab remnants -> ~76 GB of
    candidates -> No space left on device. Under scrub, geometry must
    follow the SCRUBBED corpus's shape: the uniform order."""
    rows = []
    for pref_u, _pref_b, num_hashes, rpb, max_bucket in BLOCKING_GEOMETRY_MENU:
        bands = num_hashes // rpb
        s = (
            threshold
            if rpb == 1
            else (threshold * threshold if rpb == 2 else (threshold * threshold) * (threshold * threshold))
        )
        x = 1.0 - s
        for _ in range(bands.bit_length() - 1):
            x = x * x
        rows.append(
            {
                "num_hashes": num_hashes,
                "bands": bands,
                "rows": rpb,
                "max_bucket": max_bucket,
                "capture": 1.0 - x,
                "_pref": pref_u,
            }
        )
    qualified = [r for r in rows if r["capture"] >= capture_target]
    best = (
        min(qualified, key=lambda r: r["_pref"])
        if qualified
        else max(rows, key=lambda r: r["capture"])
    )
    return {k: v for k, v in best.items() if not k.startswith("_")}


def blocking_autotune(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    **profile_kw,
) -> dict:
    """Materialize blocking_config_profile's ONE row (a bounded driver
    action — the repo's bounded-collect discipline) as a plain dict for
    plan construction: {'num_hashes', 'bands', 'rows', 'max_df_frac',
    'scrub', 'capture', 'hot_shingle_share', 'n_docs'}."""
    from apollo_spark.ops.cache import release_caches

    profile = blocking_config_profile(
        df, id_col=id_col, text_col=text_col, n=n, threshold=threshold, **profile_kw
    )
    row = profile.collect()[0]
    release_caches(profile)
    return _profile_row_to_config(row)


def train_or_load_blocking_profile(
    df: DataFrame,
    path: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    **profile_kw,
) -> dict:
    """Artifact-backed blocking_autotune (round 10 — 'one profile, every
    consumer'): persist blocking_config_profile's ONE row as a TxTable at
    ``path`` (train_or_load_table — CAS-idempotent, build-once/read-many,
    time-travelable) and return the plan dict. ``path=None`` profiles fresh
    with no I/O — the self-contained gate path.

    The production shape: a corpus snapshot is profiled ONCE; the dedup
    job, the persisted component artifact, sampling-weight jobs, and the
    DSL dedup block all read the SAME committed geometry/scrub/df-cap
    instead of each re-paying the vocabulary pass — and, more importantly,
    instead of drifting apart when one caller forgets to thread
    rec_scrub/rec_max_df_frac by hand (the round-9 gap). The version
    history pins which profile a downstream dedup ran under."""
    if path is None:
        return blocking_autotune(
            df, id_col=id_col, text_col=text_col, n=n, threshold=threshold, **profile_kw
        )
    from apollo_spark.table_format import train_or_load_table

    frame = train_or_load_table(
        df.sparkSession,
        path,
        lambda: blocking_config_profile(
            df, id_col=id_col, text_col=text_col, n=n, threshold=threshold, **profile_kw
        ),
    )
    return _profile_row_to_config(frame.collect()[0])


def minhash_autotuned_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_bucket: int | None = None,
    max_bucket_mode: str = "reband",
    scrub: bool | float | str = "auto",
    config: dict | None = None,
    verify: str = "full",
) -> DataFrame:
    """minhash_portable_pairs under the corpus-adaptive geometry: profile
    once (blocking_autotune), then band with the chosen (num_hashes, bands)
    behind the production ladder guard at the geometry's recommended
    level-0 cap (``max_bucket=None`` defers to the profile; pass an int to
    override). ``scrub="auto"`` applies the
    shingle-level boilerplate scrub at the profile's hot_frac (0.04) iff
    the profile flags boilerplate skew; True/float forces it, False
    disables. ``config`` short-circuits the profiling pass (reuse a
    collected blocking_autotune dict across operators).

    ``verify``: both modes ride the round-10 deterministic verify
    (hashed-array payload + lossless size-ratio prune — the fix for the
    sf10 disk ceiling, VERDICT round 9 #1). "estimate" adds the
    fingerprint prune. Measured positioning (BASELINE round-10): "full"
    is the default because the estimate mode pays a real CPU premium —
    the 256 splitmix estimator slots cost one extra numpy op-chain per
    posting (sf replicas: sf1 35.8 vs 40.0 s, sf3 83.0 vs 93.5 s; big-doc
    rehearsal, 20k x 600-word docs: 42.2 vs 74.7 s — identical outputs
    everywhere). What "estimate" buys is SHUFFLE BYTES, not time: 32
    longs/side through the candidate join instead of the full hashed
    arrays (~20x at 600-word docs), which matters exactly when the
    verify shuffle is disk-bound (the round-9 sf10 failure mode) — the
    escape hatch for candidate volumes beyond what local spill absorbs.
    Emitted pairs are exactly scored either way; equality pins at
    sf0.1/sf1/sf3 and the big-doc corpus, and the gated
    minhash_estimate_dup_pairs query certifies estimate == full against
    the full-verify SQL oracle on every driver run."""
    cfg = config or blocking_autotune(df, id_col=id_col, text_col=text_col, n=n, threshold=threshold)
    if scrub == "auto":
        scrub_frac = 0.04 if cfg.get("scrub") else None
    elif scrub is True:
        scrub_frac = 0.04
    elif scrub is False or scrub is None:
        scrub_frac = None
    else:
        scrub_frac = float(scrub)
    geo = cfg
    if scrub_frac is not None and cfg["rows"] == 1:
        # scrub REMOVES the boilerplate the r=1 geometry was chosen to
        # connect: banding then operates on the informative remnants — a
        # uniform corpus — where r=1 is the measured-quadratic saturated-
        # vocabulary regime (sf3skew DSL rehearsal: ~76 GB of candidates,
        # disk-fatal). Under scrub the geometry follows the SCRUBBED
        # corpus's shape: the uniform preference order (see
        # uniform_geometry). Scrub OFF keeps r=1 — the clique edges are
        # then real and must be found.
        geo = {**cfg, **uniform_geometry(threshold)}
    return minhash_portable_pairs(
        df,
        id_col=id_col,
        text_col=text_col,
        n=n,
        num_hashes=geo["num_hashes"],
        bands=geo["bands"],
        threshold=threshold,
        max_bucket=geo["max_bucket"] if max_bucket is None else max_bucket,
        max_bucket_mode=max_bucket_mode,
        scrub_max_df_frac=scrub_frac,
        verify=verify,
    )


# --------------------------------------------------------------------------
# Persisted near-dup component artifact — "dedup once, consume everywhere".
# near_dup_components / dedup_keep_best / dup_aware_sample_weights (and any
# production consumer: survivor selection, sampling weights, dup-mass
# reports) all need the SAME edges -> connected-components table; at 100 TB
# that is the expensive step, and it is write-once-read-many by nature.
# --------------------------------------------------------------------------


def doc_component_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    threshold: float = 0.2,
    max_df: int | None = None,
    max_df_frac: float | None = 0.04,
    frac_floor: int = 1024,
    scrub_max_df_frac: float | None = None,
    config: dict | None = None,
) -> DataFrame:
    """The near-dup component table ``(id_col, component)`` over capped
    n-gram-Jaccard edges (singleton docs excluded, matching
    connected_components). One definition shared by every consumer query so
    grouping semantics can never drift between them.

    ``scrub_max_df_frac`` (round 9): the boilerplate scrub for the
    PERSISTED artifact — hot shingles removed from the sets before edges
    are scored (scrub_hot_shingles), so a boilerplate-skewed corpus's
    component table groups on informative similarity instead of merging
    everything that shares a banner line. The default (None) keeps the
    certified oracle semantics; production jobs set it when
    blocking_config_profile flags skew (rec_scrub).

    ``config`` (round 10): a blocking_autotune /
    train_or_load_blocking_profile dict — its budgeted ``max_df_frac`` and
    ``scrub`` recommendation REPLACE the static ``max_df_frac`` /
    ``scrub_max_df_frac`` arguments, so the persisted artifact rides the
    same corpus-adaptive selection as the DSL dedup path instead of a
    hand-remembered cap. The gate queries pass None (static certified
    semantics, oracles unchanged)."""
    from apollo_spark.ops.cache import release_caches

    if config is not None:
        max_df_frac = float(config["max_df_frac"])
        scrub_max_df_frac = 0.04 if config.get("scrub") else None

    edges_op = ngram_jaccard_pairs(
        df,
        id_col=id_col,
        text_col=text_col,
        n=n,
        threshold=threshold,
        max_df=max_df,
        max_df_frac=max_df_frac,
        frac_floor=frac_floor,
        scrub_max_df_frac=scrub_max_df_frac,
    )
    comp = connected_components(edges_op.select("id_a", "id_b"))
    # connected_components is eager (localCheckpoint + count), so the edge
    # op's persisted shingle frame is releasable immediately
    release_caches(edges_op)
    return comp.select(
        F.col("id").cast("long").alias(id_col), F.col("comp").cast("long").alias("component")
    )


def train_or_load_components(df: DataFrame, path: str | None = None, **kw) -> DataFrame:
    """Reuse a persisted component table if one exists at ``path``
    (a TxTable — transactional CAS commit, time-travelable), else build it
    via :func:`doc_component_table` and persist. ``path=None`` builds fresh
    with no I/O — the self-contained gate path.

    The production shape at 100 TB: the dedup job writes this table ONCE
    per corpus snapshot; survivor selection, duplication-aware sampling
    weights, duplicate-mass reports, and golden-record merges all read the
    artifact instead of re-paying the edge shuffle + CC rounds. Concurrent
    writers are safe via train_or_load_table's idempotent commit (the CAS
    loser wastes its build but commits nothing and reads the winner's
    snapshot), and the version history pins which corpus snapshot a
    downstream sample was drawn against."""
    if path is None:
        return doc_component_table(df, **kw)
    from apollo_spark.table_format import train_or_load_table

    return train_or_load_table(
        df.sparkSession, path, lambda: doc_component_table(df, **kw)
    )
