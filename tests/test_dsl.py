"""DSL tests: lexer/parser shapes, constant evaluation semantics
(/root/reference/dsl/schema.go three-phase decode), Go date layouts, and
Column compilation via a live Spark session."""

from __future__ import annotations

from pathlib import Path

import pytest

from apollo_spark.dsl.ast import Binary, Call, Conditional, Literal, Template, Variable
from apollo_spark.dsl.compiler import CompileError, compile_expr, eval_const
from apollo_spark.dsl.functions import format_date_py, go_layout_to_java
from apollo_spark.dsl.parser import parse_document, parse_expression
from apollo_spark.dsl.schema import SchemaError, parse_schema, parse_schema_file


def test_parse_expression_shapes():
    e = parse_expression("a + b * 2 == 7 ? upper(name) : \"x${y}z\"")
    assert isinstance(e, Conditional)
    assert isinstance(e.cond, Binary) and e.cond.op == "=="
    assert isinstance(e.then, Call) and e.then.func == "upper"
    assert isinstance(e.otherwise, Template)


def test_precedence():
    # 1 + 2 * 3 -> 7 ; (1+2)*3 -> 9 ; unary minus binds tight
    assert eval_const(parse_expression("1 + 2 * 3"), {}) == 7
    assert eval_const(parse_expression("(1 + 2) * 3"), {}) == 9
    assert eval_const(parse_expression("-2 * 3"), {}) == -6
    assert eval_const(parse_expression("4 / 2 / 2"), {}) == 1.0
    assert eval_const(parse_expression("1 < 2 && 3 > 2"), {}) is True
    assert eval_const(parse_expression("!false || false"), {}) is True


def test_template_and_object():
    env = {"item": {"chain": "arbitrum", "n": 3}}
    assert eval_const(parse_expression('"${item.chain}-x"'), env) == "arbitrum-x"
    assert eval_const(parse_expression("item.n + 1"), env) == 4
    obj = eval_const(parse_expression('{a = 1, b = "two"}'), {})
    assert obj == {"a": 1, "b": "two"}
    lst = eval_const(parse_expression('["a", "b"][1]'), {})
    assert lst == "b"


def test_const_functions():
    assert eval_const(parse_expression('upper("eth_buy")'), {}) == "ETH_BUY"
    assert eval_const(parse_expression("parse_decimals(1500000, 6)"), {}) == 1.5
    assert eval_const(parse_expression("abs(0 - 5)"), {}) == 5


def test_go_date_layout():
    assert go_layout_to_java("02-01-2006 15:04") == "dd-MM-yyyy HH:mm"
    assert go_layout_to_java("2006-01-02") == "yyyy-MM-dd"
    # matches the reference example: 25-05-2022 12:00 UTC
    assert format_date_py("02-01-2006 15:04", "25-05-2022 12:00") == 1653480000


def test_parse_reference_example_schema():
    src = Path("/root/reference/schema.example.hcl").read_text()
    s = parse_schema(src, confdir="/root/reference/test")
    assert s.variables == {"b": "ETH_BUY", "s": "ETH_SELL"}
    assert s.start_time == 1653480000
    q = s.queries[0]
    assert q.name == "usdc_eth_swaps" and q.chain == "arbitrum"
    assert q.contracts[0].events[0].name == "Swap"
    assert list(q.save.attributes) == [
        "timestamp", "block", "contract", "tx_hash", "swap_price", "direction", "size_in_udsc",
    ]
    s.validate()


def test_parse_reference_loop_schema():
    s = parse_schema_file("/root/reference/test/schema.hcl")
    assert [(q.name, q.chain) for q in s.queries] == [("pairs_created", "ethereum"), ("pairs_created", "arbitrum")]
    ev = s.queries[0].global_events[0]
    assert ev.name == "PairCreated" and ev.abi is not None


def test_validation_rules():
    # historical events with an interval must fail (dsl/schema.go:213-250)
    src = """
query bad {
  chain = "ethereum"
  block_interval = 10
  event Transfer { abi = "erc20.abi.json" outputs = ["value"] }
  save { v = value }
}
"""
    s = parse_schema(src, confdir="/root/reference/test")
    with pytest.raises(SchemaError):
        s.validate(realtime=False)
    # unknown chain
    s2 = parse_schema('query q { chain = "dogechain" \n save { a = 1 } }')
    with pytest.raises(SchemaError):
        s2.validate()


def test_unknown_variable_and_function():
    with pytest.raises(CompileError):
        eval_const(parse_expression("nope + 1"), {})
    with pytest.raises(CompileError):
        eval_const(parse_expression("nope()"), {})


def test_comments_and_newlines():
    doc = parse_document(
        """
// line comment
a = 1 # hash comment
/* block
   comment */
b = "two"
blk "lbl" {
  c = a
}
"""
    )
    assert set(doc.attributes) == {"a", "b"}
    assert doc.blocks[0].labels == ["lbl"]


def test_column_compilation(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(2.0, 10, "abc"), (0.0, 4, "xyz")], "x double, y long, s string")
    env = {c: F.col(c) for c in df.columns}
    col = compile_expr(parse_expression('x != 0 ? y / x : 0 - 1'), env)
    out = df.select(col.alias("r")).collect()
    assert [r.r for r in out] == [5.0, -1.0]
    col2 = compile_expr(parse_expression('upper(s)'), env)
    assert [r[0] for r in df.select(col2).collect()] == ["ABC", "XYZ"]
    col3 = compile_expr(parse_expression('"v=${y}"'), env)
    assert [r[0] for r in df.select(col3).collect()] == ["v=10", "v=4"]
    # parse_decimals: double division semantics (dsl/functions.go:33-42)
    col4 = compile_expr(parse_expression("parse_decimals(y, 1)"), env)
    assert [r[0] for r in df.select(col4).collect()] == [1.0, 0.4]


def test_parse_v2_relational_blocks():
    """v2 join/aggregate/sort/limit blocks parse into QuerySpec fields."""
    from apollo_spark.dsl.schema import parse_schema

    schema = parse_schema(
        """
query seg_revenue {
  chain = "ethereum"
  source_table = "events"
  join customer {
    left_on = "user_id"
    right_on = "c_custkey"
    how = "left"
    broadcast = true
    select = ["c_mktsegment", "c_name"]
  }
  aggregate {
    group_by = [c_mktsegment]
    n = count()
    revenue = sum(value)
    having = [n > 5]
  }
  sort = [desc(revenue)]
  limit = 10
}
"""
    )
    q = schema.queries[0]
    assert len(q.joins) == 1
    j = q.joins[0]
    assert j.table == "customer" and j.left_on == ["user_id"] and j.right_on == ["c_custkey"]
    assert j.how == "left" and j.broadcast is True and j.select == ["c_mktsegment", "c_name"]
    assert q.aggregate is not None
    assert {a for a in q.aggregate.attributes} == {"group_by", "n", "revenue", "having"}
    assert len(q.sort) == 1
    assert q.limit == 10


def test_user_defined_functions():
    """ROADMAP.md:58-60 custom function definitions: macro-expanded at
    compile, usable in transform/filter/save, composable and nestable."""
    from pyspark.sql import functions as F

    from apollo_spark.dsl.compiler import CompilerContext, ExpressionCompiler
    from apollo_spark.dsl.schema import parse_schema

    schema = parse_schema(
        """
function eth {
  params = ["x"]
  expr = x / 1000000000000000000
}
function spread {
  params = ["a", "b"]
  expr = eth(a) - eth(b)
}
query q {
  chain = "ethereum"
  source_table = "events"
  save {
    s = spread(value, value)
  }
}
"""
    )
    assert set(schema.functions) == {"eth", "spread"}
    ctx = CompilerContext(env={"value": F.col("value")}, user_functions=schema.functions)
    col = ExpressionCompiler(ctx).compile(schema.queries[0].save.attributes["s"].expr)
    assert "value" in str(col)


def test_user_function_e2e(spark):
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.pipeline import compile_query
    from apollo_spark.sources.tables import Catalog

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = parse_schema(
        """
function double_it {
  params = ["x"]
  expr = x * 2
}
query doubled {
  chain = "ethereum"
  source_table = "events"
  filter = [
    double_it(value) > 100
  ]
  save {
    event_id = event_id
    v2 = double_it(value)
  }
}
"""
    )
    df = compile_query(spark, Catalog(spark, "/root/testdata/sf0.001"), schema.queries[0], schema)
    pdf = df.toPandas()
    assert len(pdf) > 0
    assert (pdf["v2"] > 100).all()


def test_compiler_column_path_matches_const_path(spark):
    """Property: for random arithmetic/comparison/ternary trees, compiling
    against Columns and evaluating on a row must agree with the constant
    folder evaluating the same tree over plain Python values (both are IEEE
    double semantics, so equality is exact)."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    from apollo_spark.dsl.ast import Binary, Conditional, Literal, Variable
    from apollo_spark.dsl.compiler import CompilerContext, ExpressionCompiler, eval_const

    nums = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False)

    def leaves():
        return st.one_of(
            st.builds(Literal, nums),
            st.sampled_from([Variable("x"), Variable("y")]),
        )

    def trees(children):
        arith = st.builds(Binary, st.sampled_from(["+", "-", "*"]), children, children)
        # division: nonzero literal divisor only (ANSI mode throws on /0)
        div = st.builds(
            Binary, st.just("/"), children,
            st.builds(Literal, nums.filter(lambda v: abs(v) > 1e-3)),
        )
        cmp_ = st.builds(Binary, st.sampled_from(["<", ">", "<=", ">=", "==", "!="]), children, children)
        tern = st.builds(Conditional, cmp_, children, children)
        return st.one_of(arith, div, tern)

    exprs = st.recursive(leaves(), trees, max_leaves=8)

    @settings(max_examples=20, deadline=None)
    @given(expr=exprs, x=nums, y=nums)
    def check(expr, x, y):
        expected = eval_const(expr, {"x": x, "y": y})
        ctx = CompilerContext(env={"x": F.col("x"), "y": F.col("y")})
        col = ExpressionCompiler(ctx).compile(expr)
        row = spark.createDataFrame([(x, y)], "x double, y double").select(col.alias("r")).first()
        got = row.r
        assert got is not None and expected is not None
        if isinstance(expected, bool):
            assert bool(got) == expected
        else:
            assert math.isclose(float(got), float(expected), rel_tol=0, abs_tol=0) or float(got) == float(expected)

    check()


def test_window_block_error_paths(spark, tmp_path):
    import pytest

    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.pipeline import PipelineError, compile_query
    from apollo_spark.sources.tables import Catalog

    events = spark.createDataFrame(
        [(1, 10, "a", 1.0), (2, 10, "b", 2.0)], "event_id long, user_id long, event_type string, value double"
    )
    events.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    catalog = Catalog(spark, str(tmp_path))

    def run(body):
        schema = parse_schema(
            "query w {\n  chain = \"ethereum\"\n  source_table = \"events\"\n" + body + "\n}"
        )
        return compile_query(spark, catalog, schema.queries[0], schema)

    # ranking needs order_by
    with pytest.raises(PipelineError, match="needs order_by"):
        run("window {\n  partition_by = [user_id]\n  r = row_number()\n}").collect()
    # attrs must be single window-function calls
    with pytest.raises(PipelineError, match="single window-function call"):
        run("window {\n  order_by = [event_id]\n  r = value + 1\n}").collect()
    # empty block
    with pytest.raises(PipelineError, match="at least one window-function"):
        run("window {\n  order_by = [event_id]\n}").collect()
    # happy path: running sum without partition (global frame)
    out = run(
        "window {\n  order_by = [event_id]\n  rt = sum(value)\n}\n  save {\n    event_id = event_id\n    rt = rt\n  }\n  sort = [event_id]"
    ).collect()
    assert [(r.event_id, r.rt) for r in out] == [(1, 1.0), (2, 3.0)]


def test_dedup_block_exact_and_minhash(spark, tmp_path):
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.pipeline import compile_query
    from apollo_spark.sources.tables import Catalog

    rows = [
        (1, "the quick brown fox", "en"),
        (2, "THE  quick   Brown fox", "en"),   # exact dup after normalization
        (3, "a completely different document about spark", "en"),
        (4, "the quick brown fox jumps", "en"),  # near-dup of 1, not exact
        (5, "unrelated text entirely about databases and storage", "en"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string, lang string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    catalog = Catalog(spark, str(tmp_path))

    schema = parse_schema(
        """
query deduped {
  chain = "ethereum"
  source_table = "documents"
  dedup {
    method = "exact"
  }
  save {
    doc_id = doc_id
    lang = lang
  }
}
"""
    )
    out = compile_query(spark, catalog, schema.queries[0], schema).toPandas()
    # doc 2 collapses into doc 1 (min id survives); 1,3,4,5 remain
    assert sorted(out["doc_id"]) == [1, 3, 4, 5]
    assert set(out.columns) == {"doc_id", "lang"}

    schema2 = parse_schema(
        """
query near_deduped {
  chain = "ethereum"
  source_table = "documents"
  dedup {
    method = "ngram_jaccard"
    threshold = 0.5
    shingle_n = 1
  }
  save {
    doc_id = doc_id
  }
}
"""
    )
    out2 = compile_query(spark, catalog, schema2.queries[0], schema2).toPandas()
    # unigram jaccard(1,4) = 4/5 >= 0.5 -> doc 4 collapses too
    assert sorted(out2["doc_id"]) == [1, 3, 5]


def test_dedup_ngram_capped_default_and_lossless_optout(spark, tmp_path):
    """DSL ngram_jaccard dedup defaults to the scale-relative capped form
    (the lossless self-join measured ~quadratic at sf1: 2.8 s -> 441 s);
    `lossless = true` opts back in. On a planted-dup corpus both must drop
    the planted near-dup — the frac_floor=1024 guard keeps small corpora
    effectively lossless under the default."""
    from apollo_spark.dsl.schema import SchemaError, parse_schema
    from apollo_spark.pipeline import compile_query
    from apollo_spark.sources.tables import Catalog

    import pytest as _pytest

    rows = [(1, "alpha beta gamma delta epsilon", "en"),
            (2, "alpha beta gamma delta zeta", "en"),  # planted near-dup of 1
            (3, "totally unrelated prose about spark plans", "en")]
    spark.createDataFrame(rows, "doc_id long, text string, lang string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    catalog = Catalog(spark, str(tmp_path))

    def run(extra):
        schema = parse_schema(
            f"""
query q {{
  chain = "ethereum"
  source_table = "documents"
  dedup {{
    method = "ngram_jaccard"
    threshold = 0.5
    shingle_n = 1
{extra}
  }}
  save {{ doc_id = doc_id }}
}}
"""
        )
        return sorted(
            compile_query(spark, catalog, schema.queries[0], schema).toPandas()["doc_id"]
        )

    assert run("") == [1, 3]  # capped default drops the planted dup
    assert run("    lossless = true") == [1, 3]  # exact opt-out agrees

    with _pytest.raises(SchemaError, match="lossless"):
        parse_schema(
            """
query bad { chain = "ethereum"
  source_table = "documents"
  dedup { method = "exact"
    lossless = true }
  save { doc_id = doc_id }
}
"""
        )
    with _pytest.raises(SchemaError, match="max_df_frac"):
        parse_schema(
            """
query bad2 { chain = "ethereum"
  source_table = "documents"
  dedup { method = "ngram_jaccard"
    max_df_frac = 1.5 }
  save { doc_id = doc_id }
}
"""
        )


def test_dedup_block_bad_method_raises(spark):
    from apollo_spark.dsl.schema import SchemaError, parse_schema

    import pytest as _pytest

    with _pytest.raises(SchemaError, match="dedup method"):
        parse_schema(
            """
query q {
  chain = "ethereum"
  source_table = "documents"
  dedup {
    method = "sketchy"
  }
}
"""
        )


def test_quality_block_gopher_and_basic(spark, tmp_path):
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.pipeline import compile_query
    from apollo_spark.sources.tables import Catalog

    good = (
        "the general availability of well formed prose with a healthy mixture of "
        "common stopwords and ordinary sentence structure makes this document pass "
        "every published hard filter rule without any trouble at all today"
    )
    rows = [
        (1, good, "en"),
        (2, "short", "en"),  # fails min_words
        (3, "### ### ### " * 30, "en"),  # symbol soup fails quality rules
    ]
    spark.createDataFrame(rows, "doc_id long, text string, lang string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    catalog = Catalog(spark, str(tmp_path))

    schema = parse_schema(
        """
query filtered {
  chain = "ethereum"
  source_table = "documents"
  quality {
    ruleset = "gopher"
    min_words = 20
  }
  save {
    doc_id = doc_id
  }
}
"""
    )
    out = compile_query(spark, catalog, schema.queries[0], schema).toPandas()
    assert sorted(out["doc_id"]) == [1]

    schema2 = parse_schema(
        """
query filtered_basic {
  chain = "ethereum"
  source_table = "documents"
  quality {
    ruleset = "basic"
    min_quality = 0.5
    min_tokens = 10
  }
  save {
    doc_id = doc_id
  }
}
"""
    )
    out2 = compile_query(spark, catalog, schema2.queries[0], schema2).toPandas()
    assert 1 in set(out2["doc_id"]) and 2 not in set(out2["doc_id"])


def test_quality_block_bad_ruleset_raises(spark):
    import pytest as _pytest

    from apollo_spark.dsl.schema import SchemaError, parse_schema

    with _pytest.raises(SchemaError, match="quality ruleset"):
        parse_schema(
            """
query q {
  chain = "ethereum"
  source_table = "documents"
  quality {
    ruleset = "vibes"
  }
}
"""
        )


def test_docs_schema_examples_parse_as_is():
    """Every ```hcl block in the reference's docs/schema-examples.md parses
    unmodified: bare top-level contract blocks become implicit queries
    (name + address labels, contract-level save, ternary transforms,
    method inputs maps) with ABIs resolved from the reference test dir."""
    import re

    md = Path("/root/reference/docs/schema-examples.md").read_text()
    blocks = re.findall(r"```hcl\n(.*?)```", md, re.S)
    assert len(blocks) == 3
    schemas = [parse_schema(b, confdir="/root/reference/test") for b in blocks]

    q0 = schemas[0].queries[0]
    assert q0.name == "usdc_to_eth_swaps"
    assert q0.contracts[0].address == "0x905dfcd5649217c42684f23958568e533c711aa3"
    assert q0.contracts[0].events[0].name == "Swap"
    assert q0.contracts[0].events[0].outputs == ["amount1In", "amount0Out", "amount0In", "amount1Out"]
    assert list(q0.save.attributes) == ["timestamp", "block", "contract", "tx_hash", "price", "dir", "size"]
    assert q0.contracts[0].abi is not None  # unipair.abi.json resolved

    q1 = schemas[1].queries[0]
    assert q1.contracts[0].methods[0].name == "getReserves"
    assert q1.contracts[0].methods[0].outputs == ["_reserve0", "_reserve1"]
    assert "mid_price" in list(q1.save.attributes)

    q2 = schemas[2].queries[0]
    m = q2.contracts[0].methods[0]
    assert m.name == "balanceOf"
    assert m.outputs == ["balance"]
    assert list(m.inputs) == ["address"]
    assert list(q2.save.attributes) == ["account", "account_balance"]


def test_dedup_block_tfidf(spark, tmp_path):
    """`dedup { method = "tfidf" }` routes to tfidf_cosine_pairs: docs whose
    idf-weighted bigram vectors are near-parallel collapse to the min id."""
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.pipeline import compile_query
    from apollo_spark.sources.tables import Catalog

    rows = [
        (1, "zephyr quasar nebula pulsar quark meson lepton boson", "en"),
        (2, "zephyr quasar nebula pulsar quark meson lepton boson extra", "en"),  # near-dup of 1
        (3, "completely different words about spark and storage engines", "en"),
        (4, "another unrelated document mentioning databases entirely", "en"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string, lang string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    catalog = Catalog(spark, str(tmp_path))
    schema = parse_schema(
        """
query tfidf_deduped {
  chain = "ethereum"
  source_table = "documents"
  dedup {
    method = "tfidf"
    threshold = 0.6
    shingle_n = 2
  }
  save {
    doc_id = doc_id
  }
}
"""
    )
    out = compile_query(spark, catalog, schema.queries[0], schema).toPandas()
    assert sorted(out["doc_id"]) == [1, 3, 4]
    # lossless opt-out (round 5: tfidf defaults to the frac-capped candidate
    # index like ngram_jaccard; at this corpus size the frac_floor makes
    # capped == lossless, so both forms must agree)
    schema_ll = parse_schema(
        """
query tfidf_deduped_lossless {
  chain = "ethereum"
  source_table = "documents"
  dedup {
    method = "tfidf"
    threshold = 0.6
    shingle_n = 2
    lossless = true
  }
  save {
    doc_id = doc_id
  }
}
"""
    )
    out_ll = compile_query(spark, catalog, schema_ll.queries[0], schema_ll).toPandas()
    assert sorted(out_ll["doc_id"]) == [1, 3, 4]


def test_dedup_block_keep_longest(spark, tmp_path):
    """`dedup { keep = "longest" }`: the longest member of each near-dup
    group survives instead of the min id."""
    from apollo_spark.dsl.schema import SchemaError, parse_schema
    from apollo_spark.pipeline import compile_query
    from apollo_spark.sources.tables import Catalog

    import pytest as _pytest

    rows = [
        (1, "the quick brown fox", "en"),
        (2, "the quick brown fox jumps over everything", "en"),  # longest of the group
        (3, "a completely different document about spark", "en"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string, lang string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    catalog = Catalog(spark, str(tmp_path))
    schema = parse_schema(
        """
query keep_longest {
  chain = "ethereum"
  source_table = "documents"
  dedup {
    method = "ngram_jaccard"
    threshold = 0.4
    shingle_n = 1
    keep = "longest"
  }
  save {
    doc_id = doc_id
  }
}
"""
    )
    out = compile_query(spark, catalog, schema.queries[0], schema).toPandas()
    assert sorted(out["doc_id"]) == [2, 3]  # doc 2 (longest) survives, not min-id 1

    with _pytest.raises(SchemaError, match="dedup keep"):
        parse_schema(
            """
query bad { chain = "ethereum"
  source_table = "documents"
  dedup { keep = "newest" }
  save { doc_id = doc_id }
}
"""
        )


def test_expect_block_validates_and_rejects(spark, tmp_path):
    """`expect` block: passing constraints publish the frame; a violated
    uniqueness or min_rows constraint raises ExpectationError before any
    sink sees rows."""
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.pipeline import ExpectationError, compile_query
    from apollo_spark.sources.tables import Catalog

    import pytest as _pytest

    rows = [(1, "alpha text", "en"), (2, "beta text", "en"), (3, "gamma text", "de")]
    spark.createDataFrame(rows, "doc_id long, text string, lang string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    catalog = Catalog(spark, str(tmp_path))

    ok = parse_schema(
        """
query checked {
  chain = "ethereum"
  source_table = "documents"
  expect {
    not_null = ["doc_id", "lang"]
    unique = ["doc_id"]
    min_rows = 2
  }
  save {
    doc_id = doc_id
    lang = lang
  }
}
"""
    )
    out = compile_query(spark, catalog, ok.queries[0], ok).toPandas()
    assert len(out) == 3  # all constraints hold -> frame published

    dup = parse_schema(
        """
query dup_check {
  chain = "ethereum"
  source_table = "documents"
  expect {
    unique = ["lang"]
  }
  save { lang = lang }
}
"""
    )
    with _pytest.raises(ExpectationError, match=r"unique\[lang\]"):
        compile_query(spark, catalog, dup.queries[0], dup)

    small = parse_schema(
        """
query rows_check {
  chain = "ethereum"
  source_table = "documents"
  expect { min_rows = 100 }
  save { doc_id = doc_id }
}
"""
    )
    with _pytest.raises(ExpectationError, match="min_rows"):
        compile_query(spark, catalog, small.queries[0], small)


def test_expect_validates_union_across_loop_frames(spark, tmp_path):
    """expect runs once per query NAME on the loop-expanded union (not per
    frame): `unique` must catch duplicates that span expansion items, and
    `min_rows` must be judged on the whole published output (a per-frame
    check would spuriously abort)."""
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.pipeline import ExpectationError, compile_schema
    from apollo_spark.sources.tables import Catalog

    import pytest as _pytest

    rows = [(1, "alpha", "en"), (2, "beta", "de")]
    spark.createDataFrame(rows, "doc_id long, text string, lang string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    catalog = Catalog(spark, str(tmp_path))

    # each frame holds ONE row with k=1: per-frame unique passes, the union
    # has a duplicate -> must raise
    dup = parse_schema(
        """
loop {
  items = ["en", "de"]
  query xframe {
    chain = "ethereum"
    source_table = "documents"
    filter = [ lang == item ]
    expect { unique = ["k"] }
    save {
      k = 1
      id = doc_id
    }
  }
}
"""
    )
    with _pytest.raises(ExpectationError, match=r"unique\[k\]"):
        compile_schema(spark, catalog, dup)

    # min_rows=2 is only met by the union (1 row per frame) -> must pass
    ok = parse_schema(
        """
loop {
  items = ["en", "de"]
  query xframe {
    chain = "ethereum"
    source_table = "documents"
    filter = [ lang == item ]
    expect { min_rows = 2 }
    save { id = doc_id }
  }
}
"""
    )
    out = compile_schema(spark, catalog, ok)
    assert out["xframe"].count() == 2


def test_expect_skipped_when_validate_expect_off(spark, tmp_path):
    """--check/--explain promise compile-only: with validate_expect=False a
    failing expect block must NOT raise (no action runs)."""
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.pipeline import PipelineOptions, compile_schema
    from apollo_spark.sources.tables import Catalog

    rows = [(1, "alpha", "en")]
    spark.createDataFrame(rows, "doc_id long, text string, lang string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    catalog = Catalog(spark, str(tmp_path))
    bad = parse_schema(
        """
query would_fail {
  chain = "ethereum"
  source_table = "documents"
  expect { min_rows = 100 }
  save { id = doc_id }
}
"""
    )
    frames = compile_schema(spark, catalog, bad, PipelineOptions(validate_expect=False))
    assert frames["would_fail"].schema is not None  # compiled, never executed


def test_dedup_exact_honors_keep_longest(spark, tmp_path):
    """dedup { method = "exact", keep = "longest" } must keep the longest
    raw text per content group, not silently the min id."""
    from apollo_spark.dsl.schema import parse_schema
    from apollo_spark.pipeline import compile_query
    from apollo_spark.sources.tables import Catalog

    # ids 1/2 normalize to the same key but differ in raw length (trailing
    # whitespace is normalized away); keep=longest must pick id 2
    rows = [(1, "same text", "en"), (2, "same   text  ", "en"), (3, "other", "en")]
    spark.createDataFrame(rows, "doc_id long, text string, lang string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    catalog = Catalog(spark, str(tmp_path))
    schema = parse_schema(
        """
query keep_longest {
  chain = "ethereum"
  source_table = "documents"
  dedup {
    method = "exact"
    keep = "longest"
  }
  save { id = doc_id }
}
"""
    )
    out = {int(r.id) for r in compile_query(spark, catalog, schema.queries[0], schema).collect()}
    assert out == {2, 3}


def test_contract_without_address_is_schema_error():
    """A contract with a bare name label and no address attribute used to
    stringify None into a match-nothing address filter; it must raise."""
    from apollo_spark.dsl.schema import SchemaError, parse_schema

    import pytest as _pytest

    with _pytest.raises(SchemaError, match="no address"):
        parse_schema(
            """
query q {
  chain = "ethereum"
  contract my_pair {
    event Transfer {
      abi = "erc20.abi.json"
      outputs = ["value"]
    }
  }
  save { v = value }
}
""",
            confdir="/root/reference/test",
        )


def test_privacy_block_parses_and_validates():
    """privacy block: qi/k/value parse; missing qi or value, bad k, and
    combining with aggregate are schema errors (privacy IS the release
    aggregation)."""
    s = parse_schema(
        'query q { chain = "ethereum" \n source_table = "customer" \n'
        ' privacy { qi = ["c_mktsegment"] \n k = 10 \n value = "c_acctbal" } }'
    )
    p = s.queries[0].privacy
    assert p.qi == ["c_mktsegment"] and p.k == 10 and p.value == "c_acctbal"

    with pytest.raises(SchemaError):
        parse_schema(
            'query q { chain = "e" \n source_table = "t" \n privacy { k = 5 \n value = "v" } }'
        )
    with pytest.raises(SchemaError):
        parse_schema(
            'query q { chain = "e" \n source_table = "t" \n privacy { qi = ["a"] \n k = 0 \n value = "v" } }'
        )
    with pytest.raises(SchemaError):
        parse_schema(
            'query q { chain = "e" \n source_table = "t" \n privacy { qi = ["a"] } }'
        )
    with pytest.raises(SchemaError):
        parse_schema(
            'query q { chain = "e" \n source_table = "t" \n'
            ' privacy { qi = ["a"] \n value = "v" } \n'
            " aggregate { group_by = [a] \n n = count() } }"
        )


def test_floor_function_column_and_const():
    """The v2 `floor` DSL function: Column form floors toward -inf (matches
    DuckDB for negative buckets); constant-folding form matches math.floor."""
    from apollo_spark.dsl.functions import COLUMN_FUNCTIONS, CONST_FUNCTIONS

    assert CONST_FUNCTIONS["floor"](2.7) == 2
    assert CONST_FUNCTIONS["floor"](-0.1) == -1  # toward -inf, not zero
    assert "floor" in COLUMN_FUNCTIONS
