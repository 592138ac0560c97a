"""HCL-subset DSL: lexer -> parser -> AST -> pyspark Column compiler.

Covers the grammar the reference's schemas actually use
(/root/reference/schema.example.hcl, test/schema.hcl, schema-ideas.hcl):
attributes, labeled blocks, arithmetic/comparison/logical/ternary expressions,
string templates, list/object literals, indexing, attribute traversal, and
function calls.
"""

from apollo_spark.dsl.ast import (
    Attribute,
    Binary,
    Block,
    Body,
    Call,
    Conditional,
    GetAttr,
    Index,
    ListExpr,
    Literal,
    ObjectExpr,
    Template,
    Unary,
    Variable,
)
from apollo_spark.dsl.compiler import ExpressionCompiler, compile_expr
from apollo_spark.dsl.parser import parse_document, parse_expression
from apollo_spark.dsl.schema import ContractSpec, EventSpec, MethodSpec, QuerySpec, Schema, parse_schema

__all__ = [
    "Attribute",
    "Binary",
    "Block",
    "Body",
    "Call",
    "Conditional",
    "ContractSpec",
    "EventSpec",
    "ExpressionCompiler",
    "GetAttr",
    "Index",
    "ListExpr",
    "Literal",
    "MethodSpec",
    "ObjectExpr",
    "QuerySpec",
    "Schema",
    "Template",
    "Unary",
    "Variable",
    "compile_expr",
    "parse_document",
    "parse_expression",
    "parse_schema",
]
