"""Pipeline compiler: QuerySpec -> DataFrame.

The Spark realization of apollo's per-row eval loop
(/root/reference/main.go:173-193, dsl/schema.go:174-211): one declarative
plan per query —

    source (logs decode | method grid | landed table)
      -> withColumns(transform)        EvalTransforms, dsl/schema.go:87-127
      -> filter(AND(filters))          EvalFilter,     dsl/schema.go:131-164
      -> select(save aliases)          save decode,    dsl/schema.go:203-206

Catalyst then collapses the projections, pushes the filter into the scan, and
runs the whole tail in whole-stage codegen — the row loop disappears.

Scoping matches the reference: each (contract | global event) gets its own
transform environment (identifier scoping, dsl/schema.go:94,112); filters and
save see context vars + that scope's transform vars + query ``variables``.
Multi-contract / multi-event queries become a unionByName of per-scope plans
(same shape by construction — one save block per query).

``balance()`` / ``token_balance()`` enrichments compile to as-of joins
against landed ``balances`` (+ broadcast ``token_metadata``) tables — the
scale-correct replacement for per-row ``eth_getBalance`` RPC
(chainservice/chainservice.go:244-291).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from apollo_spark.dsl.ast import Body
from apollo_spark.dsl.compiler import CompilerContext, Enrichment, ExpressionCompiler
from apollo_spark.dsl.schema import ContractSpec, EventSpec, QuerySpec, Schema
from apollo_spark.ops.relational import asof_join
from apollo_spark.sources.calls import ClientFactory, method_call_source
from apollo_spark.sources.logs import decoded_event_source
from apollo_spark.sources.tables import Catalog


class PipelineError(ValueError):
    pass


@dataclass
class PipelineOptions:
    realtime: bool = False
    rate_limit: float | None = None
    client_factory: ClientFactory | None = None
    # initial range-split for live eth_getLogs fetches (apollo --log-parts,
    # flags.go:43-48); consumed by sources.rpc_logs.rpc_log_source
    log_parts: int = 50
    # run `expect` block validation (an eager aggregate action). The CLI
    # turns this off under --check/--explain so "compile only" really runs
    # nothing; compile_schema/compile_query honor it.
    validate_expect: bool = True


def _scope_env(df: DataFrame, variables: dict[str, Any], chain: str | None) -> dict[str, Any]:
    """Context vars (GenerateContextVars, dsl/schema.go:485-521): every source
    column by name, plus ``blocknumber`` aliasing block_number."""
    env: dict[str, Any] = {c: F.col(c) for c in df.columns}
    if "block_number" in df.columns:
        env["blocknumber"] = F.col("block_number")
    if chain is not None:
        env["chain"] = F.lit(chain)
    env.update(variables)
    return env


def _apply_enrichments(df: DataFrame, enrichments: list[Enrichment], catalog: Catalog) -> DataFrame:
    for e in enrichments:
        if e.func == "balance":
            if not catalog.has("balances"):
                raise PipelineError("balance() needs a landed 'balances' table")
            balances = catalog.table("balances").filter(F.col("token_address").isNull())
            addr = e.args[0] if isinstance(e.args[0], Column) else F.lit(e.args[0])
            df = df.withColumn("__addr", addr)
            joined = asof_join(
                df,
                balances.select(
                    F.col("chain"),
                    F.col("address").alias("__addr"),
                    F.col("block_number").alias("__bal_block"),
                    F.col("raw_balance"),
                ),
                on=["chain", "__addr"],
                left_ts="block_number",
                right_ts="__bal_block",
                value_cols=["raw_balance"],
            )
            # native balance scaled /1e18 -> float64 (chainservice.go:254-258)
            df = joined.withColumn(e.placeholder, F.col("raw_balance").cast("double") / F.lit(1e18)).drop(
                "raw_balance", "__addr"
            )
        elif e.func == "token_balance":
            if not (catalog.has("balances") and catalog.has("token_metadata")):
                raise PipelineError("token_balance() needs landed 'balances' + 'token_metadata' tables")
            addr = e.args[0] if isinstance(e.args[0], Column) else F.lit(e.args[0])
            token = e.args[1] if isinstance(e.args[1], Column) else F.lit(e.args[1])
            df = df.withColumn("__addr", addr).withColumn("__token", token)
            balances = catalog.table("balances").filter(F.col("token_address").isNotNull())
            joined = asof_join(
                df,
                balances.select(
                    F.col("chain"),
                    F.col("address").alias("__addr"),
                    F.col("token_address").alias("__token"),
                    F.col("block_number").alias("__bal_block"),
                    F.col("raw_balance"),
                ),
                on=["chain", "__addr", "__token"],
                left_ts="block_number",
                right_ts="__bal_block",
                value_cols=["raw_balance"],
            )
            # scaled by the token's decimals() — immutable-call cache becomes
            # a broadcast dim join (cached_client.go:59-70 -> SURVEY §4)
            meta = catalog.table("token_metadata").select(
                F.col("chain").alias("__m_chain"),
                F.col("token_address").alias("__m_token"),
                F.col("decimals").alias("__m_decimals"),
            )
            joined = joined.join(
                F.broadcast(meta),
                (joined["chain"] == meta["__m_chain"]) & (joined["__token"] == meta["__m_token"]),
                "left",
            )
            df = joined.withColumn(
                e.placeholder,
                F.col("raw_balance").cast("double") / F.pow(F.lit(10.0), F.coalesce(F.col("__m_decimals"), F.lit(18)).cast("double")),
            ).drop("raw_balance", "__addr", "__token", "__m_chain", "__m_token", "__m_decimals")
        elif e.func == "is_contract":
            # roadmap item the reference never shipped (ROADMAP.md:81):
            # membership in the landed code-bearing-address dim, broadcast
            if not catalog.has("contracts"):
                raise PipelineError("is_contract() needs a landed 'contracts' table")
            addr = e.args[0] if isinstance(e.args[0], Column) else F.lit(str(e.args[0]).lower())
            contracts = catalog.table("contracts").select(
                F.col("chain").alias("__c_chain"),
                F.col("address").alias("__c_addr"),
                F.lit(True).alias("__c_hit"),
            )
            df = df.withColumn("__probe_addr", F.lower(addr))
            df = (
                df.join(
                    F.broadcast(contracts),
                    (df["chain"] == contracts["__c_chain"]) & (df["__probe_addr"] == contracts["__c_addr"]),
                    "left",
                )
                .withColumn(e.placeholder, F.coalesce(F.col("__c_hit"), F.lit(False)))
                .drop("__c_chain", "__c_addr", "__c_hit", "__probe_addr")
            )
        elif e.func in ("tx_sender", "tx_receiver"):
            # full transaction context on events (ROADMAP.md:78, unshipped in
            # the reference): resolve the row's (chain, tx_hash) against the
            # landed transactions table. Plain equi-join — both sides can be
            # lake-sized, so they co-shuffle on the join key (AQE broadcasts
            # iff the tx side turns out small); duplicates collapse first so
            # the join can't fan rows out.
            if not catalog.has("transactions"):
                raise PipelineError(f"{e.func}() needs a landed 'transactions' table")
            src_col = "from_address" if e.func == "tx_sender" else "to_address"
            txs = (
                catalog.table("transactions")
                .select(
                    F.col("chain").alias("__t_chain"),
                    F.col("tx_hash").alias("__t_hash"),
                    F.col(src_col).alias("__t_val"),
                )
                .dropDuplicates(["__t_chain", "__t_hash"])
            )
            df = (
                df.join(
                    txs,
                    (df["chain"] == txs["__t_chain"]) & (df["tx_hash"] == txs["__t_hash"]),
                    "left",
                )
                .withColumn(e.placeholder, F.col("__t_val"))
                .drop("__t_chain", "__t_hash", "__t_val")
            )
        elif e.func == "get_price":
            # get_price(token) at the row's block: as-of join on the landed
            # prices table (commented-out stub, dsl/functions.go:105-121)
            if not catalog.has("prices"):
                raise PipelineError("get_price() needs a landed 'prices' table")
            token = e.args[0] if isinstance(e.args[0], Column) else F.lit(str(e.args[0]).lower())
            df = df.withColumn("__price_token", F.lower(token))
            prices = catalog.table("prices").select(
                F.col("chain"),
                F.col("token_address").alias("__price_token"),
                F.col("block_number").alias("__p_block"),
                F.col("price_usd"),
            )
            joined = asof_join(
                df,
                prices,
                on=["chain", "__price_token"],
                left_ts="block_number",
                right_ts="__p_block",
                value_cols=["price_usd"],
            )
            df = joined.withColumn(e.placeholder, F.col("price_usd").cast("double")).drop(
                "price_usd", "__price_token"
            )
        else:
            raise PipelineError(f"unknown enrichment {e.func}")
    return df


def _apply_joins(df: DataFrame, joins: list, catalog: Catalog) -> DataFrame:
    """v2 `join` blocks: equi-join to catalog tables before the eval tail.
    `broadcast = true` forces the small side JVM-broadcast (no shuffle)."""
    for j in joins:
        right = catalog.table(j.table)
        if j.select is not None:
            right = right.select(*dict.fromkeys(list(j.right_on) + list(j.select)))
        if len(j.left_on) != len(j.right_on):
            raise PipelineError(f"join {j.table}: left_on/right_on arity mismatch")
        cond = reduce(
            lambda a, b: a & b,
            [df[l] == right[r] for l, r in zip(j.left_on, j.right_on)],
        )
        r = F.broadcast(right) if j.broadcast else right
        joined = df.join(r, cond, j.how)
        # drop the duplicate right-side key columns (equi-join convention)
        for rk, lk in zip(j.right_on, j.left_on):
            if rk != lk:
                joined = joined.drop(right[rk])
        df = joined
    return df


def _eval_tail(
    df: DataFrame,
    *,
    transform: Body | None,
    filters: list,
    save: Body | None,
    variables: dict[str, Any],
    chain: str | None,
    catalog: Catalog,
    joins: list | None = None,
    aggregate: Body | None = None,
    window: Body | None = None,
    dedup=None,
    sample=None,
    quality=None,
    decontaminate=None,
    privacy=None,
    sort: list | None = None,
    limit: int | None = None,
    user_functions: dict | None = None,
) -> DataFrame:
    """joins -> transform -> filter -> sample -> quality -> decontaminate ->
    dedup -> privacy -> window -> aggregate -> save -> sort/limit over an
    already-decoded source frame. privacy is the terminal release aggregation (k-anonymous
    classes), mutually exclusive with window/aggregate (schema-enforced)."""
    if joins:
        df = _apply_joins(df, joins, catalog)
    env = _scope_env(df, variables, chain)
    ctx = CompilerContext(env=env, user_functions=user_functions or {})
    compiler = ExpressionCompiler(ctx)

    transform_cols: dict[str, Column] = {}
    if transform is not None:
        for name, attr in transform.attributes.items():
            col = compiler.compile(attr.expr)
            transform_cols[name] = col
            env[name] = col  # later transforms/filters/save may reference it

    filter_col: Column | None = None
    if filters:
        preds = [compiler.compile(fexpr) for fexpr in filters]
        filter_col = reduce(lambda a, b: a & b, preds)

    save_cols: list[Column] = []
    if aggregate is None and window is None and privacy is None and save is not None:
        # compile save BEFORE applying enrichments so balance()/token_balance()
        # calls inside save register their join placeholders
        for name, attr in save.attributes.items():
            save_cols.append(compiler.compile(attr.expr).alias(name))

    df = _apply_enrichments(df, ctx.enrichments, catalog)
    if transform_cols:
        df = df.withColumns(transform_cols)
    if filter_col is not None:
        df = df.filter(filter_col)

    if sample is not None:
        # before dedup: sampling first keeps the dedup stage's shuffles over
        # 1/denominator of the rows (the verdicts are key-deterministic, so
        # order vs dedup only affects cost, not which survivors qualify)
        from apollo_spark.ops.sketch import hash_sample

        df = hash_sample(df, sample.key, sample.denominator, sample.salt)

    if quality is not None:
        # after sample (score 1/denominator of the rows), before dedup
        # (don't pay LSH shuffles for rows quality drops anyway)
        df = _apply_quality(df, quality)

    if decontaminate is not None:
        # after quality (cheaper corpus to scan), before dedup (contaminated
        # rows must not survive as dedup representatives)
        df = _apply_decontaminate(df, decontaminate, catalog)

    if dedup is not None:
        df = _apply_dedup(df, dedup)

    def _recompile_save(frame: DataFrame) -> list[Column]:
        # save sees the reshaped frame (post-privacy/window/aggregate):
        # compile against its columns. Enrichment functions aren't
        # supported after a reshape — same caveat for all three stages.
        env2 = _scope_env(frame, variables, chain)
        compiler2 = ExpressionCompiler(
            CompilerContext(env=env2, user_functions=user_functions or {})
        )
        return [compiler2.compile(attr.expr).alias(name) for name, attr in save.attributes.items()]

    if privacy is not None:
        # terminal release aggregation: the output IS the k-anonymous class
        # table, so save (if any) compiles against its columns
        from apollo_spark.ops.privacy import k_anonymize

        df = k_anonymize(
            df, list(privacy.qi), privacy.k, privacy.value, privacy.value_scale
        )
        _privacy_src = df
        if save is not None:
            save_cols = _recompile_save(df)

    if window is not None:
        df = _apply_window(df, window, variables, chain, user_functions)
        if aggregate is None and save is not None:
            save_cols = _recompile_save(df)

    if aggregate is not None:
        df = _apply_aggregate(df, aggregate, variables, chain, user_functions)
        if save is not None:
            save_cols = _recompile_save(df)
    if save_cols:
        df = df.select(*save_cols)

    if sort:
        from apollo_spark.dsl.functions import SORT_FUNCTIONS

        sort_env = _scope_env(df, variables, chain)
        sort_ctx = CompilerContext(env=sort_env, functions=dict(SORT_FUNCTIONS))
        sort_compiler = ExpressionCompiler(sort_ctx)
        df = df.orderBy(*[sort_compiler.compile(s) for s in sort])
    if limit is not None:
        df = df.limit(limit)
    if privacy is not None:
        # the select/sort/limit above derived NEW frames — move the
        # k_anonymize persist scope onto the one the caller releases
        from apollo_spark.ops.cache import carry_caches

        df = carry_caches(df, _privacy_src)
    return df


class ExpectationError(PipelineError):
    """An `expect` block constraint failed — the query output is not
    published (the caller never receives the frame)."""


def _apply_expect(df: DataFrame, spec) -> None:
    """v2 `expect` block: eager Great-Expectations/Deequ-style constraint
    validation on the FINAL frame. One bounded aggregate action computes
    every check (row count, per-column null counts, composite-key distinct)
    — no per-constraint scans; a violation raises ExpectationError so bad
    output never reaches a sink. Batch-only by construction: a streaming
    frame cannot run the validation action."""
    if df.isStreaming:
        raise PipelineError("expect block is batch-only (streaming frames cannot run the validation action)")
    for c in list(spec.not_null) + list(spec.unique):
        if c not in df.columns:
            raise PipelineError(f"expect references unknown column {c!r} (have {df.columns})")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in spec.not_null:
        aggs.append(F.count(c).alias(f"__nn_{c}"))
    if spec.unique:
        aggs.append(F.countDistinct(*[F.col(c) for c in spec.unique]).alias("__nd"))
        # countDistinct skips rows with any NULL key part; count them apart
        null_key = reduce(lambda a, b: a | b, [F.col(c).isNull() for c in spec.unique])
        aggs.append(F.sum(null_key.cast("long")).alias("__nullkey"))
    row = df.agg(*aggs).first()
    violations = []
    if spec.min_rows is not None and row["__n"] < spec.min_rows:
        violations.append(f"min_rows: {row['__n']} < {spec.min_rows}")
    for c in spec.not_null:
        nulls = row["__n"] - row[f"__nn_{c}"]
        if nulls > 0:
            violations.append(f"not_null[{c}]: {nulls} null rows")
    if spec.unique:
        dupes = row["__n"] - (row["__nullkey"] or 0) - row["__nd"]
        if dupes > 0:
            violations.append(f"unique[{','.join(spec.unique)}]: {dupes} duplicate rows")
        if (row["__nullkey"] or 0) > 0:
            violations.append(f"unique[{','.join(spec.unique)}]: {row['__nullkey']} rows with NULL key")
    if violations:
        raise ExpectationError("; ".join(violations))


def _apply_quality(df: DataFrame, spec) -> DataFrame:
    """v2 `quality` block: route to the ops/text.py filter tier. Both
    rulesets are pure built-in expressions — a narrow filter, no shuffle, so
    placement before dedup only reduces downstream cost."""
    from pyspark.sql import functions as F

    from apollo_spark.ops.text import gopher_quality_keep, quality_keep

    if spec.ruleset == "gopher":
        return df.filter(gopher_quality_keep(F.col(spec.text), min_words=spec.min_words))
    if getattr(spec, "langid", "heuristic") == "trained":
        # in-engine trained classifier (round 7): train on this frame's
        # labeled slice, broadcast-score, join predictions, gate on them —
        # replaces the stopword heuristic whose confusion matrix is
        # documented unusable (queries.langid_heuristic_confusion)
        from apollo_spark.ops.text import trained_language_id

        preds = trained_language_id(
            df, text_col=spec.text, id_col=spec.id, label_col=spec.label
        )
        return (
            df.join(preds, spec.id)
            .filter(
                quality_keep(
                    F.col(spec.text),
                    lang=spec.lang,
                    min_quality=spec.min_quality,
                    min_tokens=spec.min_tokens,
                    lang_pred_col="pred_lang",
                )
            )
            .drop("pred_lang")
        )
    return df.filter(
        quality_keep(
            F.col(spec.text),
            lang=spec.lang,
            min_quality=spec.min_quality,
            min_tokens=spec.min_tokens,
        )
    )


def _apply_decontaminate(df: DataFrame, spec, catalog: Catalog) -> DataFrame:
    """v2 `decontaminate` block: drop documents sharing more than
    ``max_shared`` distinct word n-grams with any benchmark row
    (ops/corpus.py::decontaminate — benchmark grams broadcast, corpus side
    narrow; the only wide exchange is the per-doc count over grams that
    HIT the benchmark set)."""
    from apollo_spark.ops.corpus import decontaminate

    if not catalog.has(spec.benchmark_table):
        raise PipelineError(
            f"decontaminate block needs a landed '{spec.benchmark_table}' table"
        )
    bench = catalog.table(spec.benchmark_table)
    flagged = decontaminate(df, bench, id_col=spec.id, text_col=spec.text, n=spec.ngram)
    drop = flagged.filter(F.col("n_shared") > int(spec.max_shared)).select(spec.id)
    return df.join(drop, spec.id, "left_anti")


def _apply_dedup(df: DataFrame, spec) -> DataFrame:
    """v2 `dedup` block: route to the ops/dedup.py tier. Runs after filters
    (dedup the rows the query actually keeps) and before window/aggregate
    (stats over the deduplicated corpus). Survivor = min id per group."""
    from pyspark.sql import functions as F

    from apollo_spark.ops.dedup import (
        connected_components,
        dedup_losers,
        exact_dedup,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        strip_hot_lines,
        tfidf_cosine_pairs,
    )

    if spec.method == "exact":
        return exact_dedup(df, spec.id, spec.text, keep=spec.keep)

    # round 9: corpus-adaptive geometry + boilerplate scrub. The autotune
    # profile is ONE bounded driver action (1-row collect); its scrub flag
    # resolves scrub_boilerplate = null ("auto"). Lines-mode scrub swaps the
    # TEXT used for pair generation (strip_hot_lines over "\n" segments);
    # shingle-mode threads scrub_max_df_frac into the shingle ops
    # (scrub_hot_shingles). Either way grouping happens over the scrubbed
    # view while survivor selection and output keep the ORIGINAL rows.
    pair_frame = df
    shingle_scrub = None
    cfg = None
    if spec.autotune and spec.method in ("minhash", "ngram_jaccard", "tfidf"):
        import os as _os

        from apollo_spark.ops.dedup import train_or_load_blocking_profile

        # minhash profiles at the blocker's trigram granularity; ngram/tfidf
        # at their own shingle_n (the profile's df-cap grid predicts THAT
        # inverted index's fan-out)
        prof_n = 3 if spec.method == "minhash" else spec.shingle_n
        # one profile, every consumer (round 10): with an artifact dir the
        # one-row profile is committed as a TxTable keyed by (columns, n,
        # threshold) — the dedup job, the component artifact, and sampling
        # jobs against the same corpus snapshot all read the SAME selection
        art = _os.environ.get("APOLLO_SPARK_ARTIFACT_DIR")
        ppath = (
            f"{art}/blocking_profile_{spec.id}_{spec.text}_n{prof_n}_t{spec.threshold}"
            if art
            else None
        )
        cfg = train_or_load_blocking_profile(
            df,
            path=ppath,
            id_col=spec.id,
            text_col=spec.text,
            n=prof_n,
            threshold=spec.threshold,
        )
    scrub_on = spec.scrub_boilerplate
    if scrub_on is None:
        scrub_on = bool(cfg and cfg["scrub"])
        # tfidf's shingle-mode scrub is invalid by schema rule (idf already
        # downweights hot terms); an AUTO scrub recommendation on tfidf
        # engages only when the user opted into lines mode
        if scrub_on and spec.method == "tfidf" and spec.scrub_mode != "lines":
            scrub_on = False
    if scrub_on:
        if spec.scrub_mode == "lines":
            clean = strip_hot_lines(
                df,
                max_df_frac=spec.scrub_max_df_frac,
                id_col=spec.id,
                text_col=spec.text,
                sep="\n",
            )
            pair_frame = clean.select(F.col(spec.id), F.col("clean_text").alias(spec.text))
        else:
            shingle_scrub = spec.scrub_max_df_frac

    if spec.method == "minhash":
        # scale-safe default: the recursive banding ladder guards against
        # boilerplate mega-buckets (BASELINE.md round-8 #1/#2); `lossless =
        # true` opts back into the raw geometry, same convention as the
        # ngram/tfidf methods' lossless flag
        guard = {} if spec.lossless else {"max_bucket": 64, "max_bucket_mode": "reband"}
        geo = {}
        if cfg:
            eff = cfg
            if (scrub_on or shingle_scrub is not None) and cfg["rows"] == 1:
                # scrub removes the boilerplate the r=1 geometry exists to
                # connect; banding then sees uniform informative remnants,
                # where r=1 is the measured-quadratic regime (sf3skew DSL
                # rehearsal: disk-fatal). Geometry follows the SCRUBBED
                # corpus: the uniform preference order.
                from apollo_spark.ops.dedup import uniform_geometry

                eff = {**cfg, **uniform_geometry(spec.threshold)}
            geo = {"num_hashes": eff["num_hashes"], "bands": eff["bands"]}
            if not spec.lossless:
                # the profile's level-0 cap compensates r=1's shallower
                # per-band selectivity (see BLOCKING_GEOMETRY_MENU)
                guard["max_bucket"] = eff["max_bucket"]
        pairs = minhash_lsh_pairs(
            pair_frame,
            spec.id,
            spec.text,
            threshold=spec.threshold,
            scrub_max_df_frac=shingle_scrub,
            **geo,
            **guard,
        )
    elif spec.method == "tfidf":
        # same scale default as ngram_jaccard below: the lossless tfidf
        # inverted-index self-join measured ~quadratic at sf1 (2.85 s ->
        # 1203 s, BASELINE.md "sf1 superlinearity" round 5); the frac-capped
        # form stays linear — the cap prunes CANDIDATE GENERATION only and
        # every recalled pair re-scores to the exact lossless cosine
        # (recall loss possible, scores and thresholds never shift)
        tf_kwargs = (
            {"max_df": None, "max_df_frac": None}
            if spec.lossless
            else {
                "max_df": None,
                # autotune (round 10): the profile's budgeted df-cap
                # replaces the static default, same as ngram_jaccard below
                "max_df_frac": cfg["max_df_frac"] if cfg else spec.max_df_frac,
                "frac_floor": 1024,
            }
        )
        pairs = tfidf_cosine_pairs(
            pair_frame, spec.id, spec.text, n=spec.shingle_n, threshold=spec.threshold, **tf_kwargs
        )
    else:
        # DEFAULT is the scale-relative hot-shingle cap: the lossless
        # inverted-index self-join measured ~quadratic at sf1 (2.8 s -> 441 s,
        # BASELINE.md "sf1 superlinearity"); the capped form stays linear and
        # re-scores the ambiguous sliver exactly. `lossless = true` opts back
        # into the exact form for oracle certification / small corpora.
        kwargs = (
            {"max_df": None, "max_df_frac": None}
            if spec.lossless
            else {
                "max_df": None,
                # autotune: the profile's budgeted df-cap replaces the static
                # default (largest grid fraction whose predicted C(df,2)
                # fan-out fits the linear budget — BASELINE round-9 #1)
                "max_df_frac": cfg["max_df_frac"] if cfg else spec.max_df_frac,
                "frac_floor": 1024,
            }
        )
        pairs = ngram_jaccard_pairs(
            pair_frame,
            spec.id,
            spec.text,
            n=spec.shingle_n,
            threshold=spec.threshold,
            scrub_max_df_frac=shingle_scrub,
            **kwargs,
        )
    comps = connected_components(pairs.select("id_a", "id_b"))
    losers = dedup_losers(comps, df, spec.id, spec.text, spec.keep)
    return df.join(losers, spec.id, "left_anti")


def _apply_window(
    df: DataFrame, window: Body, variables: dict[str, Any], chain: str | None, user_functions: dict | None = None
) -> DataFrame:
    """v2 `window` block: ``partition_by = [exprs]``, ``order_by = [exprs]``
    (sort helpers legal), plus named attrs that must each be ONE window
    function call (WINDOW_FUNCTIONS). Aggregates run over the running frame
    (unbounded preceding .. current row); ranking/offset functions get the
    bare ordered window — Spark rejects explicit frames for them. One
    shuffle on the partition keys, shared by every attr in the block."""
    from pyspark.sql import Window as W

    from apollo_spark.dsl.ast import Call, ListExpr
    from apollo_spark.dsl.functions import (
        SORT_FUNCTIONS,
        WINDOW_FUNCTIONS,
        WINDOW_RANKING,
        WINDOW_RESULT_CAST,
    )

    env = _scope_env(df, variables, chain)
    row_ctx = CompilerContext(env=env, functions=dict(SORT_FUNCTIONS), user_functions=user_functions or {})
    row_compiler = ExpressionCompiler(row_ctx)

    def compile_list(attr_name: str) -> list[Column]:
        a = window.attr(attr_name)
        if a is None:
            return []
        if not isinstance(a, ListExpr):
            raise PipelineError(f"window.{attr_name} must be a list")
        return [row_compiler.compile(x) for x in a.items]

    parts = compile_list("partition_by")
    orders = compile_list("order_by")
    base = W.partitionBy(*parts) if parts else W.partitionBy(F.lit(1))
    ordered = base.orderBy(*orders) if orders else base
    running = ordered.rowsBetween(W.unboundedPreceding, W.currentRow)

    wctx = CompilerContext(env=env, functions=dict(WINDOW_FUNCTIONS), user_functions=user_functions or {})
    wcompiler = ExpressionCompiler(wctx)
    new_cols: dict[str, Column] = {}
    for name, attr in window.attributes.items():
        if name in ("partition_by", "order_by"):
            continue
        e = attr.expr
        if not isinstance(e, Call) or e.func not in WINDOW_FUNCTIONS:
            raise PipelineError(
                f"window.{name} must be a single window-function call "
                f"({', '.join(sorted(WINDOW_FUNCTIONS))})"
            )
        if e.func in WINDOW_RANKING and not orders:
            raise PipelineError(f"window.{name}: {e.func}() needs order_by")
        frame = ordered if e.func in WINDOW_RANKING else (running if orders else base)
        col = wcompiler.compile(e).over(frame)
        if e.func in WINDOW_RESULT_CAST:
            col = col.cast(WINDOW_RESULT_CAST[e.func])
        new_cols[name] = col
    if not new_cols:
        raise PipelineError("window block needs at least one window-function attribute")
    return df.withColumns(new_cols)


def _apply_aggregate(
    df: DataFrame, aggregate: Body, variables: dict[str, Any], chain: str | None, user_functions: dict | None = None
) -> DataFrame:
    """v2 `aggregate` block (the tier apollo left on its roadmap,
    ROADMAP.md:77): `group_by = [exprs]`, named aggregate attrs using
    AGG_FUNCTIONS, optional `having = [post-agg predicates]`."""
    from apollo_spark.dsl.ast import ListExpr
    from apollo_spark.dsl.functions import AGG_FUNCTIONS

    env = _scope_env(df, variables, chain)
    ctx = CompilerContext(env=env, functions=dict(AGG_FUNCTIONS), user_functions=user_functions or {})
    compiler = ExpressionCompiler(ctx)

    group_attr = aggregate.attr("group_by")
    group_cols: list[Column] = []
    if group_attr is not None:
        if not isinstance(group_attr, ListExpr):
            raise PipelineError("aggregate.group_by must be a list")
        # alias grouping exprs by their source text so bare column refs keep
        # their name and computed keys get a stable one
        from apollo_spark.dsl.ast import Variable

        for i, g in enumerate(group_attr.items):
            col = compiler.compile(g)
            group_cols.append(col if isinstance(g, Variable) else col.alias(f"group_{i}"))

    agg_cols: list[Column] = []
    for name, attr in aggregate.attributes.items():
        if name in ("group_by", "having"):
            continue
        agg_cols.append(compiler.compile(attr.expr).alias(name))
    if not agg_cols:
        raise PipelineError("aggregate block needs at least one aggregate expression")

    out = df.groupBy(*group_cols).agg(*agg_cols) if group_cols else df.agg(*agg_cols)

    having_attr = aggregate.attr("having")
    if having_attr is not None:
        if not isinstance(having_attr, ListExpr):
            raise PipelineError("aggregate.having must be a list")
        henv = {c: F.col(c) for c in out.columns}
        henv.update(variables)
        hctx = CompilerContext(env=henv)
        hcompiler = ExpressionCompiler(hctx)
        preds = [hcompiler.compile(h) for h in having_attr.items]
        out = out.filter(reduce(lambda a, b: a & b, preds))
    return out


def _contract_event_frame(
    spark: SparkSession,
    catalog: Catalog,
    query: QuerySpec,
    contract: ContractSpec,
    event: EventSpec,
    schema: Schema,
) -> DataFrame:
    logs = catalog.table("logs")
    blocks = catalog.table("blocks") if catalog.has("blocks") else None
    abi = contract.abi
    if abi is None:
        raise PipelineError(f"contract {contract.address}: ABI not loaded")
    if event.name not in abi.events:
        raise PipelineError(f"event {event.name} not in ABI {contract.abi_name}")
    df = decoded_event_source(
        logs,
        abi.events[event.name],
        chain=query.chain,
        address=contract.address,
        from_block=query.start_block,
        to_block=query.end_block,
        outputs=event.outputs or None,
        blocks=blocks,
    )
    # event-attached method calls (S7, events.go:93-104): enrichment join on
    # (contract, block_number + offset) against the landed method-result table
    for m in event.methods:
        if not catalog.has("method_results"):
            raise PipelineError("event-attached methods need a landed 'method_results' table")
        mr = catalog.table("method_results")
        wanted = m.outputs or [c for c in mr.columns if c not in ("chain", "contract_address", "block_number")]
        mr = mr.select(
            F.col("chain").alias("__m_chain"),
            F.col("contract_address").alias("__m_addr"),
            F.col("block_number").alias("__m_block"),
            *[F.col(c) for c in wanted],
        )
        df = df.join(
            mr,
            (df["chain"] == mr["__m_chain"])
            & (df["contract_address"] == mr["__m_addr"])
            & (mr["__m_block"] == df["block_number"] + m.block_offset),
            "inner",
        ).drop("__m_chain", "__m_addr", "__m_block")
    return df


def compile_query(
    spark: SparkSession,
    catalog: Catalog,
    query: QuerySpec,
    schema: Schema,
    options: PipelineOptions | None = None,
    _defer_expect: bool = False,
) -> DataFrame:
    """Compile one QuerySpec into its result DataFrame.

    `expect` validation runs here on the FINAL frame (after the unionByName
    over contracts / global events / table sources — ExpectSpec's documented
    contract), unless `_defer_expect` is set by compile_schema, which instead
    validates once per query NAME so loop-expanded same-name queries are
    checked on their union (min_rows must see the whole output; unique must
    see duplicates that span expansion items)."""
    options = options or PipelineOptions()
    variables = dict(schema.variables)
    if query.item is not None:
        variables.setdefault("item", query.item)
    frames: list[DataFrame] = []

    if query.source_sql is not None:
        # read_sql source (schema-ideas.hcl:124-126): ANSI SQL over the
        # catalog's tables as views — full Catalyst SQL surface inside the
        # schema DSL, sharing the transform/filter/save tail
        catalog.register_views()
        frames.append(
            _eval_tail(
                spark.sql(query.source_sql),
                transform=query.transform,
                filters=query.filters,
                save=query.save,
                variables=variables,
                chain=None,
                catalog=catalog,
                joins=query.joins,
                aggregate=query.aggregate,
                window=query.window,
                dedup=query.dedup,
                sample=query.sample,
                decontaminate=query.decontaminate,
                    quality=query.quality,
                    privacy=query.privacy,
                sort=query.sort,
                limit=query.limit,
                user_functions=schema.functions,
            )
        )
    if query.source_table is not None:
        # v2 table query: already-decoded rows; transform at query level
        df = catalog.table(query.source_table)
        frames.append(
            _eval_tail(
                df,
                transform=query.transform,
                filters=query.filters,
                save=query.save,
                variables=variables,
                chain=None,
                catalog=catalog,
                joins=query.joins,
                aggregate=query.aggregate,
                window=query.window,
                dedup=query.dedup,
                sample=query.sample,
                decontaminate=query.decontaminate,
                    quality=query.quality,
                    privacy=query.privacy,
                sort=query.sort,
                limit=query.limit,
                user_functions=schema.functions,
            )
        )
    for contract in query.contracts:
        for event in contract.events:
            df = _contract_event_frame(spark, catalog, query, contract, event, schema)
            frames.append(
                _eval_tail(
                    df,
                    transform=contract.transform or query.transform,
                    filters=query.filters,
                    save=query.save,
                    variables=variables,
                    chain=query.chain,
                    catalog=catalog,
                    joins=query.joins,
                    aggregate=query.aggregate,
                    window=query.window,
                    dedup=query.dedup,
                sample=query.sample,
                decontaminate=query.decontaminate,
                    quality=query.quality,
                    privacy=query.privacy,
                    sort=query.sort,
                    limit=query.limit,
                    user_functions=schema.functions,
                )
            )
        if contract.methods:
            if options.client_factory is not None:
                if query.start_block is None or query.end_block is None or query.block_interval is None:
                    raise PipelineError(f"query {query.name}: method calls need block range + interval")
                df = method_call_source(
                    spark,
                    contract,
                    chain=query.chain,
                    start_block=query.start_block,
                    end_block=query.end_block,
                    interval=query.block_interval,
                    client_factory=options.client_factory,
                    rate_limit=options.rate_limit,
                )
            elif catalog.has("method_results"):
                df = catalog.table("method_results").filter(
                    (F.col("chain") == query.chain) & (F.col("contract_address") == contract.address)
                )
                if query.start_block is not None:
                    df = df.filter(F.col("block_number") >= query.start_block)
                if query.end_block is not None:
                    df = df.filter(F.col("block_number") <= query.end_block)
                if query.block_interval:
                    df = df.filter((F.col("block_number") - (query.start_block or 0)) % query.block_interval == 0)
            else:
                raise PipelineError(f"query {query.name}: no RPC client and no landed method_results table")
            if catalog.has("blocks") and "timestamp" not in df.columns:
                hdr = catalog.table("blocks").select(
                    F.col("chain").alias("__b_chain"),
                    F.col("block_number").alias("__b_number"),
                    "timestamp",
                )
                df = df.join(
                    F.broadcast(hdr),
                    (df["chain"] == hdr["__b_chain"]) & (df["block_number"] == hdr["__b_number"]),
                    "left",
                ).drop("__b_chain", "__b_number")
            frames.append(
                _eval_tail(
                    df,
                    transform=contract.transform or query.transform,
                    filters=query.filters,
                    save=query.save,
                    variables=variables,
                    chain=query.chain,
                    catalog=catalog,
                    joins=query.joins,
                    aggregate=query.aggregate,
                    window=query.window,
                    dedup=query.dedup,
                sample=query.sample,
                decontaminate=query.decontaminate,
                    quality=query.quality,
                    privacy=query.privacy,
                    sort=query.sort,
                    limit=query.limit,
                    user_functions=schema.functions,
                )
            )
    for event in query.global_events:
        # global events: address-unfiltered scan (events.go:121-216)
        abi = event.abi
        if abi is None or event.name not in abi.events:
            raise PipelineError(f"global event {event.name}: ABI missing")
        df = decoded_event_source(
            catalog.table("logs"),
            abi.events[event.name],
            chain=query.chain,
            address=None,
            from_block=query.start_block,
            to_block=query.end_block,
            outputs=event.outputs or None,
            blocks=catalog.table("blocks") if catalog.has("blocks") else None,
        )
        frames.append(
            _eval_tail(
                df,
                transform=event.transform or query.transform,
                filters=query.filters,
                save=query.save,
                variables=variables,
                chain=query.chain,
                catalog=catalog,
                joins=query.joins,
                aggregate=query.aggregate,
                window=query.window,
                dedup=query.dedup,
                sample=query.sample,
                decontaminate=query.decontaminate,
                    quality=query.quality,
                    privacy=query.privacy,
                sort=query.sort,
                limit=query.limit,
                user_functions=schema.functions,
            )
        )

    if not frames:
        raise PipelineError(f"query {query.name}: no sources")
    df = reduce(lambda a, b: a.unionByName(b), frames)
    if query.expect is not None and options.validate_expect and not _defer_expect:
        df = _validate_expect(df, query.expect)
    return df


def _validate_expect(df: DataFrame, spec) -> DataFrame:
    """Persist, then run the expect aggregate action. Persisting first means
    the validation scan is the SAME computation the sink write reuses —
    without it every expect-gated query executes twice (once for the agg,
    once for the write). The persisted frame is returned; SinkWriter /
    callers unpersist after the terminal action (cli.py does)."""
    df = df.persist()
    try:
        _apply_expect(df, spec)
    except Exception:
        df.unpersist()
        raise
    return df


def compile_schema(
    spark: SparkSession,
    catalog: Catalog,
    schema: Schema,
    options: PipelineOptions | None = None,
) -> dict[str, DataFrame]:
    """All queries; loop-expanded queries with the same name are unioned
    (Q2/Q3 semantics: one output table per query name). `expect` blocks are
    validated once per NAME on that union — not per expansion item — so
    `unique` catches duplicates spanning items and `min_rows` is judged on
    the full published output."""
    options = options or PipelineOptions()
    out: dict[str, DataFrame] = {}
    expects: dict[str, Any] = {}
    for q in schema.queries:
        df = compile_query(spark, catalog, q, schema, options, _defer_expect=True)
        out[q.name] = out[q.name].unionByName(df) if q.name in out else df
        if q.expect is not None:
            expects[q.name] = q.expect
    if options.validate_expect:
        for name, spec in expects.items():
            out[name] = _validate_expect(out[name], spec)
    return out


def compile_streaming_query(
    spark: SparkSession,
    catalog: Catalog,
    query: QuerySpec,
    schema: Schema,
    bridge_dir: str,
    options: PipelineOptions | None = None,
) -> DataFrame:
    """Realtime compile: apollo runs the SAME transform/filter/save tail over
    live subscription rows as over historical ones (main.go:173-193's shared
    EvalSave loop; events.go:280-320) — this is the Spark mirror, returning
    ONE streaming DataFrame per query:

    * each contract/global event becomes a bridge-fed ``event_stream`` with
      watermarked replay dedup (exactly-once over a reconnecting bridge);
    * interval method calls (S6) tick via ``method_call_stream`` when the
      query declares ``time_interval`` and an RPC client is configured;
    * every source goes through the same ``_eval_tail`` column plan as batch
      (Spark's batch/streaming unification — the plan compiles identically);
    * the per-source tails are unioned into one stream, so a query has ONE
      sink writer and ONE checkpoint regardless of how many events feed it
      (several independent writers appending to one table is how data races
      start; several frames into one union is just a plan).

    ``sort``/``limit``/``aggregate`` blocks are batch-only: append-mode
    streams can't globally sort, and unbounded aggregation needs an output
    mode the CSV/JDBC sinks don't model — the error says so up front instead
    of failing at .start()."""
    from apollo_spark.sources.streaming import (
        dedup_event_stream,
        event_stream,
        method_call_stream,
    )

    options = options or PipelineOptions()
    variables = dict(schema.variables)
    if query.item is not None:
        variables.setdefault("item", query.item)
    if query.sort or query.limit is not None or query.aggregate is not None or query.window is not None:
        raise PipelineError(
            f"query {query.name}: sort/limit/aggregate/window are batch-only "
            "(append-mode streams have no global order and the row sinks "
            "don't model update semantics)"
        )
    if query.expect is not None:
        raise PipelineError(
            f"query {query.name}: expect block is batch-only "
            "(streaming frames cannot run the validation action)"
        )
    if query.privacy is not None:
        raise PipelineError(
            f"query {query.name}: privacy block is batch-only (it IS a release "
            "aggregation; silently emitting raw rows would defeat the guarantee)"
        )

    def tail(df: DataFrame, transform: Body | None) -> DataFrame:
        return _eval_tail(
            df,
            transform=transform,
            filters=query.filters,
            save=query.save,
            variables=variables,
            chain=query.chain,
            catalog=catalog,
            joins=query.joins,
            user_functions=schema.functions,
        )

    frames: list[DataFrame] = []
    for contract in query.contracts:
        abi = contract.abi
        for event in contract.events:
            if abi is None or event.name not in abi.events:
                raise PipelineError(f"event {event.name} not in ABI {contract.abi_name}")
            stream = event_stream(
                spark,
                bridge_dir,
                abi.events[event.name],
                chain=query.chain,
                address=contract.address,
                outputs=event.outputs or None,
            )
            frames.append(tail(dedup_event_stream(stream), contract.transform or query.transform))
        if contract.methods:
            if options.client_factory is None:
                raise PipelineError(
                    f"query {query.name}: realtime method calls need an RPC client "
                    "(rpc endpoints in config.yml)"
                )
            interval = query.time_interval or (query.block_interval or 1) * 12
            stream = method_call_stream(
                spark,
                contract,
                chain=query.chain,
                interval_seconds=int(interval),
                client_factory=options.client_factory,
            )
            frames.append(tail(stream, contract.transform or query.transform))
    for event in query.global_events:
        abi = event.abi
        if abi is None or event.name not in abi.events:
            raise PipelineError(f"global event {event.name}: ABI missing")
        stream = event_stream(
            spark,
            bridge_dir,
            abi.events[event.name],
            chain=query.chain,
            outputs=event.outputs or None,
        )
        frames.append(tail(dedup_event_stream(stream), event.transform or query.transform))

    if not frames:
        raise PipelineError(f"query {query.name}: no realtime sources")
    return reduce(lambda a, b: a.unionByName(b), frames)
