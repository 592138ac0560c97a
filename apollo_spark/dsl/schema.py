"""Schema parsing: HCL document -> QuerySpec dataclasses.

Mirrors the three-phase decode of /root/reference/dsl/schema.go:381-479:
  (a) top-level attrs + ``variables`` evaluated with functions + ``now``;
  (b) ``loop`` expansion re-binding ``item`` per element (dsl/schema.go:427-442);
  (c) ABI files loaded and attached per contract / global event
      (dsl/schema.go:446-476).
Validation rules ported from Validate (dsl/schema.go:213-250).

Unlike apollo, transform/filter/save bodies are NOT re-decoded per row — they
are kept as AST and compiled once into Catalyst expressions (pipeline.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

from apollo_spark.abi import Abi
from apollo_spark.dsl.ast import Block, Body, Node
from apollo_spark.dsl.compiler import eval_const
from apollo_spark.dsl.functions import now_epoch
from apollo_spark.dsl.parser import parse_document

CHAINS = ("ethereum", "avax", "arbitrum", "optimism", "polygon", "fantom")


class SchemaError(ValueError):
    pass


@dataclass
class MethodSpec:
    name: str
    inputs: dict[str, Any] = field(default_factory=dict)  # constant args
    outputs: list[str] = field(default_factory=list)
    block_offset: int = 0  # event-attached calls at block+offset (dsl/schema.go:300-302)


@dataclass
class EventSpec:
    name: str
    outputs: list[str] = field(default_factory=list)
    abi_name: str | None = None  # set for standalone/global events
    methods: list[MethodSpec] = field(default_factory=list)  # event-attached (events.go:93-104)
    transform: Body | None = None  # global events carry their own transform
    abi: Abi | None = None


@dataclass
class ContractSpec:
    address: str
    abi_name: str
    events: list[EventSpec] = field(default_factory=list)
    methods: list[MethodSpec] = field(default_factory=list)
    transform: Body | None = None  # contract-level transform (dsl/schema.go:94)
    abi: Abi | None = None


@dataclass
class JoinSpec:
    """v2 `join` block: equi-join the query frame to another catalog table
    (SURVEY §2.7 — apollo has no joins; here they're one declarative block)."""

    table: str
    left_on: list[str]
    right_on: list[str]
    how: str = "inner"
    broadcast: bool = False  # small dims: force broadcast, never shuffle
    select: list[str] | None = None  # right-side columns to keep (None = all)


@dataclass
class DedupSpec:
    """v2 `dedup` block: corpus deduplication as ONE declarative block over
    the ops/dedup.py tier — exact (content-digest), minhash (LSH near-dup),
    or ngram_jaccard (exact-threshold near-dup). Canonical survivor is the
    min id of each duplicate group; everything else is dropped."""

    method: str = "exact"  # exact | minhash | ngram_jaccard | tfidf
    id: str = "doc_id"
    text: str = "text"
    threshold: float = 0.7
    shingle_n: int = 2
    keep: str = "min_id"  # survivor policy: min_id | longest
    # ngram_jaccard / tfidf: the DEFAULT is the scale-relative hot-term cap
    # (sklearn max_df semantics) — the lossless inverted-index self-join
    # measured ~quadratic at sf1 (ngram 2.8 s -> 441 s, tfidf 2.85 s ->
    # 1203 s) on a small-vocabulary corpus, so lossless-by-default is a
    # 100 TB hazard. `lossless = true` opts back into the exact form
    # (oracle certification / small corpora).
    lossless: bool = False
    max_df_frac: float = 0.04
    # round 9: corpus-adaptive blocking (minhash | ngram_jaccard) — profile
    # the corpus once (ops/dedup.py::blocking_autotune: analytic capture at
    # the dedup threshold + vocabulary df pass); minhash bands with the
    # chosen (num_hashes, bands, ladder cap) instead of the fixed r=2/b=16
    # default, ngram_jaccard takes the profile's budgeted df-cap.
    autotune: bool = False
    # round 9: boilerplate scrub before pair generation. None = auto (scrub
    # iff the autotune profile flags boilerplate skew; off without autotune),
    # True/False = explicit. scrub_mode "shingle" removes hot shingles from
    # the shingle sets (scrub_hot_shingles — works on any corpus shape;
    # minhash/ngram_jaccard); "lines" runs strip_hot_lines on the text
    # (line-structured corpora; any near-dup method). Grouping happens over
    # the scrubbed view; emitted rows keep their ORIGINAL text.
    scrub_boilerplate: bool | None = None
    scrub_max_df_frac: float = 0.04
    scrub_mode: str = "shingle"  # shingle | lines


@dataclass
class DecontaminateSpec:
    """v2 `decontaminate` block: eval-set decontamination as a declarative
    stage (ops/corpus.py::decontaminate) — drop every document sharing more
    than ``max_shared`` distinct word ``ngram``-grams with ANY row of the
    ``benchmark_table`` catalog table (the n-gram-overlap screen large-LM
    pipelines run before training). Runs after quality and before dedup:
    contaminated rows shouldn't cost LSH shuffles or survive as dedup
    representatives. The benchmark side broadcasts (eval suites are small);
    the corpus side never self-joins."""

    benchmark_table: str = ""
    id: str = "doc_id"
    text: str = "text"
    ngram: int = 5
    max_shared: int = 0


@dataclass
class ExpectSpec:
    """v2 `expect` block: Great-Expectations/Deequ-style output constraints,
    validated EAGERLY (one bounded aggregate action on the final frame) —
    a failed expectation aborts the query instead of publishing bad rows.
    Batch-only (streaming frames cannot run the validation action)."""

    not_null: list[str] = field(default_factory=list)  # each column fully populated
    unique: list[str] = field(default_factory=list)  # composite key uniqueness
    min_rows: int | None = None


@dataclass
class SampleSpec:
    """v2 `sample` block: deterministic coordinated hash-rate sampling
    (ops/sketch.py::hash_sample) as a declarative stage — keep rows whose
    portable hash of ``key`` is 0 mod ``denominator``. Mergeable across
    increments and coordinated across tables (same key, same verdict), so
    sampled pipelines compose; unlike TABLESAMPLE the survivor set is
    reproducible run to run and engine to engine."""

    key: str
    denominator: int = 16
    salt: str = "samp"


@dataclass
class QualitySpec:
    """v2 `quality` block: corpus quality filtering as ONE declarative stage
    over the ops/text.py tier — ``ruleset = "gopher"`` applies the published
    Rae et al. 2021 hard-filter table, ``ruleset = "basic"`` the
    lang-aware heuristic score (length/punct/stopword ratios). Runs after
    sampling (cheaper) and before dedup (don't pay LSH for rows quality
    would drop anyway)."""

    ruleset: str = "gopher"  # gopher | basic
    text: str = "text"
    min_words: int = 20  # gopher
    lang: str = "en"  # basic
    min_quality: float = 0.6  # basic
    min_tokens: int = 10  # basic
    # basic only: "heuristic" (zero-setup stopword scorer) or "trained"
    # (in-engine perceptron over hashed trigrams, trained on the frame's
    # labeled `label` column — requires `id` and `label` columns present)
    langid: str = "heuristic"
    id: str = "doc_id"  # trained: join key for the prediction table
    label: str = "lang"  # trained: gold-label column of the labeled slice


@dataclass
class PrivacySpec:
    """v2 `privacy` block: k-anonymous aggregate RELEASE as the terminal
    stage (ops/privacy.py::k_anonymize) — the output becomes one row per
    quasi-identifier equivalence class with >= k members plus a single '*'
    catch-all absorbing every smaller class. Mutually exclusive with
    aggregate/window (it IS the release aggregation)."""

    qi: list[str] = field(default_factory=list)  # quasi-identifier columns
    k: int = 5
    value: str = "value"  # column averaged per released class
    value_scale: int = 2  # DECIMAL quantization of the value sums


@dataclass
class QuerySpec:
    name: str
    chain: str
    contracts: list[ContractSpec] = field(default_factory=list)
    global_events: list[EventSpec] = field(default_factory=list)
    filters: list[Node] = field(default_factory=list)
    save: Body | None = None
    # v2 relational tier (§7 step 8): joins -> transform -> filter ->
    # aggregate (group_by/having) -> save -> sort/limit
    joins: list[JoinSpec] = field(default_factory=list)
    aggregate: Body | None = None
    # v2 `window` block: partition_by/order_by + named window-function attrs
    window: Body | None = None
    # v2 `dedup` block: declarative corpus deduplication (ops/dedup.py tier)
    dedup: DedupSpec | None = None
    # v2 `sample` block: deterministic hash-rate sampling (ops/sketch.py)
    sample: SampleSpec | None = None
    decontaminate: DecontaminateSpec | None = None
    # v2 `quality` block: declarative corpus quality filter (ops/text.py)
    quality: QualitySpec | None = None
    # v2 `privacy` block: k-anonymous aggregate release (ops/privacy.py)
    privacy: PrivacySpec | None = None
    # v2 `expect` block: eager output-constraint validation (batch-only)
    expect: ExpectSpec | None = None
    sort: list[Node] = field(default_factory=list)
    limit: int | None = None
    start_block: int | None = None
    end_block: int | None = None
    block_interval: int | None = None
    time_interval: int | None = None
    # v2 extension: run over an already-decoded landed table (no EVM source)
    source_table: str | None = None
    # read_sql source (schema-ideas.hcl:124-126): ANSI SQL over catalog views
    source_sql: str | None = None
    # contract-level transform for table queries lives at query level too (v2)
    transform: Body | None = None
    # loop binding that produced this query (None outside loops)
    item: Any = None

    @property
    def has_contract_events(self) -> bool:
        return any(c.events for c in self.contracts)

    @property
    def has_contract_methods(self) -> bool:
        return any(c.methods for c in self.contracts)

    @property
    def has_global_events(self) -> bool:
        return bool(self.global_events)


@dataclass
class Schema:
    queries: list[QuerySpec]
    variables: dict[str, Any] = field(default_factory=dict)
    # user-defined functions (ROADMAP.md:58-60): name -> (params, body AST)
    functions: dict[str, tuple[list[str], Any]] = field(default_factory=dict)
    start_time: int | None = None  # epoch seconds (resolved at parse)
    end_time: int | None = None

    def validate(self, realtime: bool = False) -> None:
        """Cross-field rules ported from Validate (dsl/schema.go:213-250)."""
        for q in self.queries:
            if q.chain not in CHAINS:
                raise SchemaError(f"query {q.name}: unknown chain {q.chain!r}")
            if q.has_contract_methods:
                if realtime and q.time_interval is None and q.block_interval is None:
                    raise SchemaError(f"query {q.name}: realtime methods need time_interval or block_interval")
                if not realtime:
                    has_range = (q.start_block is not None and q.end_block is not None) or (
                        self.start_time is not None and self.end_time is not None
                    )
                    if not has_range or (q.block_interval is None and q.time_interval is None):
                        raise SchemaError(
                            f"query {q.name}: historical methods need start/end (block or time) and an interval"
                        )
            if (q.has_contract_events or q.has_global_events) and not realtime:
                if q.block_interval is not None or q.time_interval is not None:
                    raise SchemaError(f"query {q.name}: historical events must not set an interval")


# ------------------------------------------------------------------- parsing


def _const(body: Body, name: str, env: dict[str, Any], default: Any = None) -> Any:
    e = body.attr(name)
    return eval_const(e, env) if e is not None else default


def _parse_method(block: Block, env: dict[str, Any]) -> MethodSpec:
    b = block.body
    inputs: dict[str, Any] = {}
    inputs_expr = b.attr("inputs")
    if inputs_expr is not None:
        inputs = dict(eval_const(inputs_expr, env))
    return MethodSpec(
        name=block.labels[0] if block.labels else str(_const(b, "name", env)),
        inputs=inputs,
        outputs=list(_const(b, "outputs", env, []) or []),
        block_offset=int(_const(b, "block_offset", env, 0) or 0),
    )


def _parse_event(block: Block, env: dict[str, Any], *, standalone: bool) -> EventSpec:
    b = block.body
    transform_blocks = b.blocks_of("transform")
    return EventSpec(
        name=block.labels[0] if block.labels else str(_const(b, "name", env)),
        outputs=list(_const(b, "outputs", env, []) or []),
        abi_name=str(_const(b, "abi", env)) if (standalone or b.attr("abi") is not None) else None,
        methods=[_parse_method(mb, env) for mb in b.blocks_of("method")],
        transform=transform_blocks[0].body if transform_blocks else None,
    )


def _parse_contract(block: Block, env: dict[str, Any]) -> ContractSpec:
    b = block.body
    # label forms (docs/schema-examples.md vs schema.example.hcl):
    #   contract "0xADDR" { }                      -> address only
    #   contract some_name "0xADDR" { }            -> name + address
    #   contract some_name { address = "0xADDR" }  -> name, address attr
    if len(block.labels) >= 2:
        address = block.labels[1]
    elif block.labels and block.labels[0].lower().startswith("0x"):
        address = block.labels[0]
    else:
        addr_val = _const(b, "address", env)
        if addr_val is None:
            label = block.labels[0] if block.labels else "<unnamed>"
            raise SchemaError(
                f"contract {label!r}: no address — give a 0x label "
                f'(contract {label} "0x..." {{}}) or an address attribute'
            )
        address = str(addr_val)
    transform_blocks = b.blocks_of("transform")
    events = [_parse_event(eb, env, standalone=False) for eb in b.blocks_of("event")]
    abi_name = _const(b, "abi", env)
    template_name = _const(b, "template", env)
    if template_name is not None:
        # template expansion (ROADMAP.md:82-87): standard events prepended,
        # explicitly-declared events override same-named template entries
        from apollo_spark.dsl.templates import TEMPLATES

        tpl = TEMPLATES.get(str(template_name))
        if tpl is None:
            raise SchemaError(f"unknown contract template {template_name!r}")
        abi_name = abi_name or tpl["abi"]
        declared = {e.name for e in events}
        wanted = _const(b, "template_events", env)  # subset selection; None = all
        events = [
            EventSpec(name=n, outputs=list(outs))
            for n, outs in tpl["events"].items()
            if n not in declared and (wanted is None or n in list(wanted))
        ] + events
    if abi_name is None:
        raise SchemaError(f"contract {address}: abi is required (or use template)")
    return ContractSpec(
        address=address.lower(),
        abi_name=str(abi_name),
        events=events,
        methods=[_parse_method(mb, env) for mb in b.blocks_of("method")],
        transform=transform_blocks[0].body if transform_blocks else None,
    )


def _parse_query(block: Block, env: dict[str, Any], item: Any = None) -> QuerySpec:
    b = block.body
    name = block.labels[0] if block.labels else str(_const(b, "name", env))
    save_blocks = b.blocks_of("save")
    filters_expr = b.attr("filter")
    filters: list[Node] = []
    if filters_expr is not None:
        from apollo_spark.dsl.ast import ListExpr

        if not isinstance(filters_expr, ListExpr):
            raise SchemaError(f"query {name}: filter must be a list of boolean expressions")
        filters = list(filters_expr.items)

    def opt_int(attr: str) -> int | None:
        v = _const(b, attr, env)
        return int(v) if v is not None else None

    def _parse_join(jb: Block) -> JoinSpec:
        jbody = jb.body
        table = jb.labels[0] if jb.labels else str(_const(jbody, "table", env))
        left_on = _const(jbody, "left_on", env) or _const(jbody, "on", env)
        right_on = _const(jbody, "right_on", env) or _const(jbody, "on", env)
        if left_on is None:
            raise SchemaError(f"query {name}: join {table!r} needs on or left_on/right_on")
        as_list = lambda v: [v] if isinstance(v, str) else list(v)
        sel = _const(jbody, "select", env)
        return JoinSpec(
            table=table,
            left_on=as_list(left_on),
            right_on=as_list(right_on),
            how=str(_const(jbody, "how", env, "inner")),
            broadcast=bool(_const(jbody, "broadcast", env, False)),
            select=(as_list(sel) if sel is not None else None),
        )

    sort_expr = b.attr("sort")
    sort_items: list[Node] = []
    if sort_expr is not None:
        from apollo_spark.dsl.ast import ListExpr

        if not isinstance(sort_expr, ListExpr):
            raise SchemaError(f"query {name}: sort must be a list of expressions")
        sort_items = list(sort_expr.items)

    agg_blocks = b.blocks_of("aggregate")
    window_blocks = b.blocks_of("window")
    transform_blocks = b.blocks_of("transform")

    dedup_spec = None
    dedup_blocks = b.blocks_of("dedup")
    if dedup_blocks:
        dbody = dedup_blocks[0].body
        method = str(_const(dbody, "method", env, "exact"))
        if method not in ("exact", "minhash", "ngram_jaccard", "tfidf"):
            raise SchemaError(
                f"query {name}: dedup method must be exact|minhash|ngram_jaccard|tfidf, got {method!r}"
            )
        keep = str(_const(dbody, "keep", env, "min_id"))
        if keep not in ("min_id", "longest"):
            raise SchemaError(f"query {name}: dedup keep must be min_id|longest, got {keep!r}")
        lossless = bool(_const(dbody, "lossless", env, False))
        if lossless and method not in ("ngram_jaccard", "tfidf"):
            raise SchemaError(
                f"query {name}: dedup `lossless` applies to method=ngram_jaccard|tfidf only"
            )
        max_df_frac = float(_const(dbody, "max_df_frac", env, 0.04))
        if not 0.0 < max_df_frac <= 1.0:
            raise SchemaError(
                f"query {name}: dedup max_df_frac must be in (0, 1], got {max_df_frac}"
            )
        autotune = bool(_const(dbody, "autotune", env, False))
        if autotune and method not in ("minhash", "ngram_jaccard", "tfidf"):
            raise SchemaError(
                f"query {name}: dedup `autotune` applies to method=minhash|ngram_jaccard|tfidf"
            )
        scrub_raw = _const(dbody, "scrub_boilerplate", env, None)
        scrub_boilerplate = None if scrub_raw is None else bool(scrub_raw)
        scrub_mode = str(_const(dbody, "scrub_mode", env, "shingle"))
        if scrub_mode not in ("shingle", "lines"):
            raise SchemaError(
                f"query {name}: dedup scrub_mode must be shingle|lines, got {scrub_mode!r}"
            )
        if scrub_boilerplate and method == "exact":
            raise SchemaError(
                f"query {name}: dedup scrub_boilerplate applies to near-dup methods only"
            )
        if scrub_boilerplate and scrub_mode == "shingle" and method == "tfidf":
            raise SchemaError(
                f"query {name}: shingle-level scrub applies to minhash|ngram_jaccard "
                "(tfidf's idf weighting already downweights hot terms; use scrub_mode = \"lines\")"
            )
        scrub_max_df_frac = float(_const(dbody, "scrub_max_df_frac", env, 0.04))
        if not 0.0 < scrub_max_df_frac <= 1.0:
            raise SchemaError(
                f"query {name}: dedup scrub_max_df_frac must be in (0, 1], got {scrub_max_df_frac}"
            )
        dedup_spec = DedupSpec(
            method=method,
            id=str(_const(dbody, "id", env, "doc_id")),
            text=str(_const(dbody, "text", env, "text")),
            threshold=float(_const(dbody, "threshold", env, 0.7)),
            shingle_n=int(_const(dbody, "shingle_n", env, 2)),
            keep=keep,
            lossless=lossless,
            max_df_frac=max_df_frac,
            autotune=autotune,
            scrub_boilerplate=scrub_boilerplate,
            scrub_max_df_frac=scrub_max_df_frac,
            scrub_mode=scrub_mode,
        )

    sample_spec = None
    sample_blocks = b.blocks_of("sample")
    if sample_blocks:
        sbody = sample_blocks[0].body
        key = _const(sbody, "key", env, None)
        if key is None:
            raise SchemaError(f"query {name}: sample block requires a `key` attribute")
        denom = int(_const(sbody, "denominator", env, 16))
        if denom < 1:
            raise SchemaError(f"query {name}: sample denominator must be >= 1, got {denom}")
        sample_spec = SampleSpec(
            key=str(key), denominator=denom, salt=str(_const(sbody, "salt", env, "samp"))
        )

    decon_spec = None
    decon_blocks = b.blocks_of("decontaminate")
    if decon_blocks:
        dcb = decon_blocks[0].body
        bt = _const(dcb, "benchmark_table", env, None)
        if not bt:
            raise SchemaError(
                f"query {name}: decontaminate block requires `benchmark_table`"
            )
        ng = int(_const(dcb, "ngram", env, 5))
        if ng < 1:
            raise SchemaError(f"query {name}: decontaminate ngram must be >= 1, got {ng}")
        ms = int(_const(dcb, "max_shared", env, 0))
        if ms < 0:
            raise SchemaError(
                f"query {name}: decontaminate max_shared must be >= 0, got {ms}"
            )
        decon_spec = DecontaminateSpec(
            benchmark_table=str(bt),
            id=str(_const(dcb, "id", env, "doc_id")),
            text=str(_const(dcb, "text", env, "text")),
            ngram=ng,
            max_shared=ms,
        )

    quality_spec = None
    quality_blocks = b.blocks_of("quality")
    if quality_blocks:
        qbody = quality_blocks[0].body
        ruleset = str(_const(qbody, "ruleset", env, "gopher"))
        if ruleset not in ("gopher", "basic"):
            raise SchemaError(
                f"query {name}: quality ruleset must be gopher|basic, got {ruleset!r}"
            )
        langid = str(_const(qbody, "langid", env, "heuristic"))
        if langid not in ("heuristic", "trained"):
            raise SchemaError(
                f"query {name}: quality langid must be heuristic|trained, got {langid!r}"
            )
        quality_spec = QualitySpec(
            ruleset=ruleset,
            text=str(_const(qbody, "text", env, "text")),
            min_words=int(_const(qbody, "min_words", env, 20)),
            lang=str(_const(qbody, "lang", env, "en")),
            min_quality=float(_const(qbody, "min_quality", env, 0.6)),
            min_tokens=int(_const(qbody, "min_tokens", env, 10)),
            langid=langid,
            id=str(_const(qbody, "id", env, "doc_id")),
            label=str(_const(qbody, "label", env, "lang")),
        )

    privacy_spec = None
    privacy_blocks = b.blocks_of("privacy")
    if privacy_blocks:
        pbody = privacy_blocks[0].body
        qi_raw = _const(pbody, "qi", env, None)
        if qi_raw is None:
            raise SchemaError(f"query {name}: privacy block requires a `qi` attribute")
        qi = [str(x) for x in (qi_raw if isinstance(qi_raw, list) else [qi_raw])]
        if not qi:
            raise SchemaError(f"query {name}: privacy qi must name at least one column")
        pk = int(_const(pbody, "k", env, 5))
        if pk < 1:
            raise SchemaError(f"query {name}: privacy k must be >= 1, got {pk}")
        value = _const(pbody, "value", env, None)
        if value is None:
            raise SchemaError(f"query {name}: privacy block requires a `value` attribute")
        if agg_blocks or window_blocks:
            raise SchemaError(
                f"query {name}: privacy is the release aggregation — it cannot be combined "
                f"with aggregate/window blocks"
            )
        privacy_spec = PrivacySpec(
            qi=qi,
            k=pk,
            value=str(value),
            value_scale=int(_const(pbody, "value_scale", env, 2)),
        )

    expect_spec = None
    expect_blocks = b.blocks_of("expect")
    if expect_blocks:
        ebody = expect_blocks[0].body

        def _cols(attr: str) -> list[str]:
            v = _const(ebody, attr, env, None)
            if v is None:
                return []
            if isinstance(v, str):
                return [v]
            return [str(x) for x in v]

        mr = _const(ebody, "min_rows", env, None)
        expect_spec = ExpectSpec(
            not_null=_cols("not_null"),
            unique=_cols("unique"),
            min_rows=int(mr) if mr is not None else None,
        )
        if not (expect_spec.not_null or expect_spec.unique or expect_spec.min_rows is not None):
            raise SchemaError(f"query {name}: expect block needs not_null, unique, or min_rows")

    return QuerySpec(
        name=name,
        joins=[_parse_join(jb) for jb in b.blocks_of("join")],
        aggregate=agg_blocks[0].body if agg_blocks else None,
        window=window_blocks[0].body if window_blocks else None,
        dedup=dedup_spec,
        sample=sample_spec,
        decontaminate=decon_spec,
        quality=quality_spec,
        privacy=privacy_spec,
        expect=expect_spec,
        sort=sort_items,
        limit=(int(_const(b, "limit", env)) if b.attr("limit") is not None else None),
        chain=str(_const(b, "chain", env)),
        contracts=[_parse_contract(cb, env) for cb in b.blocks_of("contract")],
        global_events=[_parse_event(eb, env, standalone=True) for eb in b.blocks_of("event")],
        filters=filters,
        save=save_blocks[0].body if save_blocks else None,
        start_block=opt_int("start_block"),
        end_block=opt_int("end_block"),
        block_interval=opt_int("block_interval"),
        time_interval=opt_int("time_interval"),
        source_table=(str(_const(b, "source_table", env)) if b.attr("source_table") is not None else None),
        source_sql=(str(_const(b, "source_sql", env)) if b.attr("source_sql") is not None else None),
        transform=transform_blocks[0].body if transform_blocks else None,
        item=item,
    )


def parse_schema(src: str, confdir: str | Path | None = None) -> Schema:
    doc = parse_document(src)
    env: dict[str, Any] = {"now": now_epoch()}

    # phase (a): top-level variables (may call functions — dsl/schema.go:399-408)
    vars_expr = doc.attr("variables")
    variables: dict[str, Any] = {}
    if vars_expr is not None:
        variables = dict(eval_const(vars_expr, env))
    env.update(variables)

    start_time = _const(doc, "start_time", env)
    end_time = _const(doc, "end_time", env)

    # user function definitions: `function f { params = ["x"]; expr = x * 2 }`
    functions: dict[str, tuple[list[str], Any]] = {}
    for fb in doc.blocks_of("function"):
        fname = fb.labels[0] if fb.labels else str(_const(fb.body, "name", env))
        params = _const(fb.body, "params", env) or []
        expr = fb.body.attr("expr")
        if expr is None:
            raise SchemaError(f"function {fname}: expr attribute required")
        functions[fname] = ([str(p) for p in params], expr)

    # phase (b): query blocks + loop expansion (dsl/schema.go:427-442)
    queries: list[QuerySpec] = []
    for qb in doc.blocks_of("query"):
        queries.append(_parse_query(qb, env))
    for lb in doc.blocks_of("loop"):
        items_expr = lb.body.attr("items")
        if items_expr is None:
            raise SchemaError("loop block requires items")
        items = eval_const(items_expr, env)
        for item in items:
            item_env = dict(env)
            item_env["item"] = item
            for qb in lb.body.blocks_of("query"):
                queries.append(_parse_query(qb, item_env, item=item))

    # phase (b2): bare top-level contract blocks — the abbreviated form the
    # reference's docs/schema-examples.md uses (no wrapping query block).
    # Each becomes an implicit single-contract query named after the
    # contract label; save may sit at contract level in this form. chain
    # falls back to a top-level attr, then ethereum. Time/interval bounds
    # stay unset (the fragments omit them) — callers supply them at run
    # time, so validate() is deferred to execution for these.
    for cb in doc.blocks_of("contract"):
        c = _parse_contract(cb, env)
        cname = cb.labels[0] if cb.labels and not cb.labels[0].lower().startswith("0x") else c.address
        saves = cb.body.blocks_of("save")
        queries.append(
            QuerySpec(
                name=cname,
                chain=str(_const(doc, "chain", env, "ethereum")),
                contracts=[c],
                save=saves[0].body if saves else None,
            )
        )

    # phase (c): attach ABIs (dsl/schema.go:446-476)
    if confdir is not None:
        confdir = Path(confdir)
        cache: dict[str, Abi] = {}

        def load(name: str) -> Abi:
            if name not in cache:
                cache[name] = Abi.from_file(confdir / name)
            return cache[name]

        for q in queries:
            for c in q.contracts:
                c.abi = load(c.abi_name)
            for ev in q.global_events:
                if ev.abi_name:
                    ev.abi = load(ev.abi_name)

    return Schema(
        queries=queries,
        variables=variables,
        functions=functions,
        start_time=int(start_time) if start_time is not None else None,
        end_time=int(end_time) if end_time is not None else None,
    )


def parse_schema_file(path: str | Path) -> Schema:
    path = Path(path)
    return parse_schema(path.read_text(), confdir=path.parent)
