"""AST -> pyspark.sql.Column compiler + driver-side constant evaluator.

Replaces apollo's per-row cty evaluation (/root/reference/dsl/schema.go:87-211)
with one-time compilation into Catalyst expressions: the whole
transform/filter/save tail runs inside whole-stage codegen, no Python in the
row path.

Numeric fidelity: apollo evaluates arithmetic in big.Float and outputs
float64 (dsl/functions.go:33-42, output/output.go:64-77), so arithmetic here
is computed in DoubleType (SURVEY.md §1.2). Comparisons are left to Spark's
native coercion (decimal-vs-int compares stay exact).

``balance``/``token_balance`` calls (dsl/functions.go:71-103) cannot be pure
Column expressions — they need the row's (chain, block) context plus chain
state. The compiler emits a placeholder column and records an
:class:`Enrichment`; the pipeline satisfies it with an as-of join against the
landed ``balances``/``token_metadata`` tables (see pipeline.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from apollo_spark.dsl.ast import (
    Binary,
    Call,
    Conditional,
    GetAttr,
    Index,
    ListExpr,
    Literal,
    Node,
    ObjectExpr,
    Template,
    Unary,
    Variable,
)
from apollo_spark.dsl.functions import COLUMN_FUNCTIONS, CONST_FUNCTIONS

_ARITH = {"+", "-", "*", "/", "%"}
_COMPARE = {"==", "!=", "<", ">", "<=", ">="}

CHAIN_FUNCTIONS = ("balance", "token_balance", "is_contract", "get_price", "tx_sender", "tx_receiver")


class CompileError(ValueError):
    pass


@dataclass
class Enrichment:
    """A chain-function call to be satisfied by the pipeline via join."""

    func: str  # 'balance' | 'token_balance'
    placeholder: str  # output column name the expression refers to
    args: list[Any]  # compiled argument values (Column or constant)


@dataclass
class CompilerContext:
    env: dict[str, Any]  # variable -> Column | python constant
    functions: dict[str, Callable[..., Any]] = field(default_factory=dict)
    # user-defined DSL functions (ROADMAP.md:58-60): name -> (params, body
    # AST); expanded macro-style at compile, so they cost nothing at runtime
    user_functions: dict[str, tuple[list[str], Any]] = field(default_factory=dict)
    enrichments: list[Enrichment] = field(default_factory=list)
    _counter: int = 0
    _depth: int = 0

    def placeholder(self, func: str) -> str:
        self._counter += 1
        return f"__{func}_{self._counter}"


def _is_col(v: Any) -> bool:
    return isinstance(v, Column)


def _lit(v: Any) -> Column:
    return v if _is_col(v) else F.lit(v)


def _to_str(v: Any) -> Column:
    return _lit(v).cast("string")


class ExpressionCompiler:
    """Compile expression AST nodes given an environment.

    Mixed constant/Column trees constant-fold eagerly: ops over two Python
    values are computed in Python (mirroring the parse-time ``variables``
    phase, dsl/schema.go:399-408); anything touching a Column builds a
    Catalyst expression.
    """

    def __init__(self, ctx: CompilerContext):
        self.ctx = ctx
        self.functions = dict(COLUMN_FUNCTIONS)
        self.functions.update(ctx.functions)

    def compile(self, node: Node) -> Column:
        v = self._eval(node)
        return _lit(v)

    # value: Column | python constant
    def _eval(self, node: Node) -> Any:
        if isinstance(node, Literal):
            return node.value
        if isinstance(node, Variable):
            if node.name in self.ctx.env:
                return self.ctx.env[node.name]
            raise CompileError(f"unknown variable {node.name!r}")
        if isinstance(node, GetAttr):
            obj = self._eval(node.obj)
            if _is_col(obj):
                return obj.getField(node.name)
            if isinstance(obj, dict):
                return obj[node.name]
            raise CompileError(f"cannot access .{node.name} on {type(obj).__name__}")
        if isinstance(node, Index):
            obj = self._eval(node.obj)
            idx = self._eval(node.index)
            if _is_col(obj):
                return obj.getItem(idx if not _is_col(idx) else idx)
            return obj[idx]
        if isinstance(node, Unary):
            v = self._eval(node.operand)
            if node.op == "-":
                return -v if not _is_col(v) else -v
            if node.op == "!":
                return (not v) if not _is_col(v) else ~v
            raise CompileError(f"bad unary {node.op}")
        if isinstance(node, Binary):
            return self._binary(node)
        if isinstance(node, Conditional):
            cond = self._eval(node.cond)
            if not _is_col(cond):
                return self._eval(node.then if cond else node.otherwise)
            then = self._eval(node.then)
            other = self._eval(node.otherwise)
            return F.when(cond, _lit(then)).otherwise(_lit(other))
        if isinstance(node, Template):
            parts = [p if isinstance(p, str) else self._eval(p) for p in node.parts]
            if all(not _is_col(p) for p in parts):
                return "".join(_const_str(p) for p in parts)
            return F.concat(*[_to_str(p) for p in parts])
        if isinstance(node, ListExpr):
            items = [self._eval(i) for i in node.items]
            if all(not _is_col(i) for i in items):
                return items
            return F.array(*[_lit(i) for i in items])
        if isinstance(node, ObjectExpr):
            vals = {k: self._eval(v) for k, v in node.items}
            if all(not _is_col(v) for v in vals.values()):
                return vals
            return F.struct(*[_lit(v).alias(k) for k, v in vals.items()])
        if isinstance(node, Call):
            return self._call(node)
        raise CompileError(f"unsupported node {type(node).__name__}")

    def _binary(self, node: Binary) -> Any:
        left = self._eval(node.left)
        right = self._eval(node.right)
        op = node.op
        if not _is_col(left) and not _is_col(right):
            return _const_binary(op, left, right)
        if op in _ARITH:
            # big.Float semantics -> DoubleType arithmetic (SURVEY §1.2)
            lc = _lit(left).cast("double")
            rc = _lit(right).cast("double")
            return {
                "+": lc + rc,
                "-": lc - rc,
                "*": lc * rc,
                "/": lc / rc,
                "%": lc % rc,
            }[op]
        lc, rc = _lit(left), _lit(right)
        if op in _COMPARE:
            return {
                "==": lc == rc,
                "!=": lc != rc,
                "<": lc < rc,
                ">": lc > rc,
                "<=": lc <= rc,
                ">=": lc >= rc,
            }[op]
        if op == "&&":
            return lc & rc
        if op == "||":
            return lc | rc
        raise CompileError(f"bad operator {op}")

    def _call(self, node: Call) -> Any:
        if node.func in self.ctx.user_functions:
            params, body = self.ctx.user_functions[node.func]
            if len(node.args) != len(params):
                raise CompileError(f"{node.func}() takes {len(params)} args, got {len(node.args)}")
            if self.ctx._depth > 16:
                raise CompileError(f"user function {node.func!r}: expansion too deep (recursive?)")
            args = [self._eval(a) for a in node.args]
            child_env = dict(self.ctx.env)
            child_env.update(dict(zip(params, args)))
            child_ctx = CompilerContext(
                env=child_env,
                functions=self.ctx.functions,
                user_functions=self.ctx.user_functions,
                enrichments=self.ctx.enrichments,  # shared: placeholders propagate
                _counter=self.ctx._counter,
                _depth=self.ctx._depth + 1,
            )
            result = ExpressionCompiler(child_ctx)._eval(body)
            self.ctx._counter = child_ctx._counter
            return result
        if node.func in CHAIN_FUNCTIONS:
            args = [self._eval(a) for a in node.args]
            ph = self.ctx.placeholder(node.func)
            self.ctx.enrichments.append(Enrichment(node.func, ph, args))
            return F.col(ph)
        fn = self.functions.get(node.func)
        if fn is None:
            raise CompileError(f"unknown function {node.func!r}")
        args = [self._eval(a) for a in node.args]
        if all(not _is_col(a) for a in args) and node.func in CONST_FUNCTIONS:
            return CONST_FUNCTIONS[node.func](*args)
        return fn(*args)


def _const_str(v: Any) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def _const_binary(op: str, left: Any, right: Any) -> Any:
    if op in _ARITH:
        # dispatch lazily: an eager dict literal would evaluate EVERY op,
        # so `0 + 0` used to raise ZeroDivisionError via the unused "/" entry
        # (caught by the hypothesis property test)
        import operator as _op

        lf, rf = float(left), float(right)
        return {"+": _op.add, "-": _op.sub, "*": _op.mul, "/": _op.truediv, "%": _op.mod}[op](lf, rf)
    if op in _COMPARE:
        import operator as _op

        return {"==": _op.eq, "!=": _op.ne, "<": _op.lt, ">": _op.gt, "<=": _op.le, ">=": _op.ge}[op](left, right)
    if op == "&&":
        return bool(left) and bool(right)
    if op == "||":
        return bool(left) or bool(right)
    raise CompileError(f"bad operator {op}")


def compile_expr(node: Node, env: dict[str, Any]) -> Column:
    """Convenience: compile a single expression with no chain functions."""
    ctx = CompilerContext(env=env)
    col = ExpressionCompiler(ctx).compile(node)
    if ctx.enrichments:
        raise CompileError("balance()/token_balance() need a pipeline context")
    return col


def eval_const(node: Node, env: dict[str, Any]) -> Any:
    """Driver-side evaluation (parse-time ``variables``, start/end times)."""
    ctx = CompilerContext(env=env)
    v = ExpressionCompiler(ctx)._eval(node)
    if _is_col(v) or ctx.enrichments:
        raise CompileError("expression is not a parse-time constant")
    return v
