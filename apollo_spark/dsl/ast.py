"""AST node types for the HCL-subset expression/document grammar.

The reference evaluates HCL bodies per row with hashicorp/hcl2 + cty
(/root/reference/dsl/schema.go:87-211); we parse once into this AST and
compile to pyspark Columns at plan-build time.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


class Node:
    __slots__ = ()


# ---------------------------------------------------------------- expressions


@dataclass(frozen=True)
class Literal(Node):
    """Number (int/float), string (no interpolation), bool, or None."""

    value: Any


@dataclass(frozen=True)
class Variable(Node):
    name: str


@dataclass(frozen=True)
class GetAttr(Node):
    obj: Node
    name: str


@dataclass(frozen=True)
class Index(Node):
    obj: Node
    index: Node


@dataclass(frozen=True)
class Call(Node):
    func: str
    args: tuple[Node, ...]


@dataclass(frozen=True)
class Unary(Node):
    op: str  # '-' | '!'
    operand: Node


@dataclass(frozen=True)
class Binary(Node):
    op: str  # + - * / % == != < > <= >= && ||
    left: Node
    right: Node


@dataclass(frozen=True)
class Conditional(Node):
    cond: Node
    then: Node
    otherwise: Node


@dataclass(frozen=True)
class Template(Node):
    """Interpolated string: parts are str literals or expression Nodes."""

    parts: tuple[Any, ...]


@dataclass(frozen=True)
class ListExpr(Node):
    items: tuple[Node, ...]


@dataclass(frozen=True)
class ObjectExpr(Node):
    items: tuple[tuple[str, Node], ...]


# ------------------------------------------------------------------ structure


@dataclass
class Attribute(Node):
    name: str
    expr: Node


@dataclass
class Block(Node):
    type: str
    labels: list[str]
    body: "Body"


@dataclass
class Body(Node):
    attributes: dict[str, Attribute] = field(default_factory=dict)
    blocks: list[Block] = field(default_factory=list)

    def blocks_of(self, type_: str) -> list[Block]:
        return [b for b in self.blocks if b.type == type_]

    def attr(self, name: str, default: Any = None) -> Node | Any:
        a = self.attributes.get(name)
        return a.expr if a is not None else default
