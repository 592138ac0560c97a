"""Recursive-descent parser: tokens -> Body / expression AST.

Precedence (loosest to tightest), matching HCL2:
  ternary ?:  ->  ||  ->  &&  ->  == !=  ->  < > <= >=  ->  + -  ->  * / %
  ->  unary - !  ->  postfix . [] ()  ->  primary
"""

from __future__ import annotations

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
    Node,
    ObjectExpr,
    Template,
    Unary,
    Variable,
)
from apollo_spark.dsl.lexer import Lexer, Token


class ParseError(ValueError):
    pass


class Parser:
    def __init__(self, tokens: list[Token]):
        self.toks = tokens
        self.i = 0

    # ------------------------------------------------------------- utilities

    def peek(self, off: int = 0) -> Token:
        i = min(self.i + off, len(self.toks) - 1)
        return self.toks[i]

    def next(self) -> Token:
        t = self.toks[self.i]
        if t.kind != "EOF":
            self.i += 1
        return t

    def error(self, msg: str) -> ParseError:
        t = self.peek()
        return ParseError(f"line {t.line}:{t.col}: {msg} (got {t.kind} {t.value!r})")

    def expect(self, kind: str, value: object = None) -> Token:
        t = self.next()
        if t.kind != kind or (value is not None and t.value != value):
            self.i = max(self.i - 1, 0)
            raise self.error(f"expected {value or kind}")
        return t

    def skip_newlines(self) -> None:
        while self.peek().kind == "NEWLINE":
            self.next()

    def at_punct(self, p: str) -> bool:
        t = self.peek()
        return t.kind == "PUNCT" and t.value == p

    def eat_punct(self, p: str) -> bool:
        if self.at_punct(p):
            self.next()
            return True
        return False

    # ------------------------------------------------------------- structure

    def parse_body(self, *, top: bool = True) -> Body:
        body = Body()
        while True:
            self.skip_newlines()
            t = self.peek()
            if t.kind == "EOF":
                if not top:
                    raise self.error("unexpected EOF inside block")
                return body
            if t.kind == "PUNCT" and t.value == "}":
                if top:
                    raise self.error("unexpected }")
                return body
            if t.kind != "IDENT":
                raise self.error("expected attribute or block")
            # lookahead: IDENT '=' -> attribute; IDENT (IDENT|STRING)* '{' -> block
            off = 1
            labels: list[str] = []
            while True:
                la = self.peek(off)
                if la.kind == "IDENT":
                    labels.append(la.value)  # type: ignore[arg-type]
                    off += 1
                elif la.kind == "STRING":
                    parts = la.value
                    if not (isinstance(parts, list) and len(parts) == 1 and isinstance(parts[0], str)):
                        raise self.error("block label must be a plain string")
                    labels.append(parts[0])
                    off += 1
                else:
                    break
            la = self.peek(off)
            if la.kind == "PUNCT" and la.value == "{":
                name = self.next().value
                for _ in labels:
                    self.next()
                self.next()  # {
                inner = self.parse_body(top=False)
                self.expect("PUNCT", "}")
                body.blocks.append(Block(str(name), labels, inner))
            elif self.peek(1).kind == "PUNCT" and self.peek(1).value == "=":
                name = str(self.next().value)
                self.next()  # =
                expr = self.parse_expr()
                body.attributes[name] = Attribute(name, expr)
            else:
                raise self.error("expected '=' or '{' after identifier")

    # ----------------------------------------------------------- expressions

    def parse_expr(self) -> Node:
        return self._ternary()

    def _ternary(self) -> Node:
        cond = self._binary(0)
        if self.at_punct("?"):
            self.next()
            self.skip_newlines()
            then = self._ternary()
            self.skip_newlines()
            self.expect("PUNCT", ":")
            self.skip_newlines()
            other = self._ternary()
            return Conditional(cond, then, other)
        return cond

    _LEVELS: list[list[str]] = [["||"], ["&&"], ["==", "!="], ["<", ">", "<=", ">="], ["+", "-"], ["*", "/", "%"]]

    def _binary(self, level: int) -> Node:
        if level >= len(self._LEVELS):
            return self._unary()
        left = self._binary(level + 1)
        while self.peek().kind == "PUNCT" and self.peek().value in self._LEVELS[level]:
            op = str(self.next().value)
            self.skip_newlines()
            right = self._binary(level + 1)
            left = Binary(op, left, right)
        return left

    def _unary(self) -> Node:
        if self.at_punct("-"):
            self.next()
            return Unary("-", self._unary())
        if self.at_punct("!"):
            self.next()
            return Unary("!", self._unary())
        return self._postfix()

    def _postfix(self) -> Node:
        node = self._primary()
        while True:
            if self.at_punct("."):
                # numbers never reach here (lexer folds decimal points)
                self.next()
                name = self.expect("IDENT").value
                node = GetAttr(node, str(name))
            elif self.at_punct("["):
                self.next()
                self.skip_newlines()
                idx = self.parse_expr()
                self.skip_newlines()
                self.expect("PUNCT", "]")
                node = Index(node, idx)
            else:
                return node

    def _primary(self) -> Node:
        t = self.peek()
        if t.kind == "NUMBER":
            self.next()
            return Literal(t.value)
        if t.kind == "STRING":
            self.next()
            parts = t.value
            assert isinstance(parts, list)
            if len(parts) == 1 and isinstance(parts[0], str):
                return Literal(parts[0])
            out: list[object] = []
            for p in parts:
                if isinstance(p, str):
                    out.append(p)
                else:
                    out.append(parse_expression(p[1]))
            return Template(tuple(out))
        if t.kind == "IDENT":
            name = str(t.value)
            if name in ("true", "false"):
                self.next()
                return Literal(name == "true")
            if name == "null":
                self.next()
                return Literal(None)
            if self.peek(1).kind == "PUNCT" and self.peek(1).value == "(":
                self.next()
                self.next()  # (
                args: list[Node] = []
                self.skip_newlines()
                if not self.at_punct(")"):
                    while True:
                        args.append(self.parse_expr())
                        self.skip_newlines()
                        if self.eat_punct(","):
                            self.skip_newlines()
                            if self.at_punct(")"):
                                break
                            continue
                        break
                self.expect("PUNCT", ")")
                return Call(name, tuple(args))
            self.next()
            return Variable(name)
        if self.at_punct("("):
            self.next()
            self.skip_newlines()
            e = self.parse_expr()
            self.skip_newlines()
            self.expect("PUNCT", ")")
            return e
        if self.at_punct("["):
            self.next()
            items: list[Node] = []
            self.skip_newlines()
            while not self.at_punct("]"):
                items.append(self.parse_expr())
                self.skip_newlines()
                if self.eat_punct(","):
                    self.skip_newlines()
            self.expect("PUNCT", "]")
            return ListExpr(tuple(items))
        if self.at_punct("{"):
            self.next()
            obj: list[tuple[str, Node]] = []
            self.skip_newlines()
            while not self.at_punct("}"):
                kt = self.next()
                if kt.kind == "IDENT":
                    key = str(kt.value)
                elif kt.kind == "STRING" and isinstance(kt.value, list) and isinstance(kt.value[0], str):
                    key = kt.value[0]
                else:
                    raise self.error("expected object key")
                if not (self.eat_punct("=") or self.eat_punct(":")):
                    raise self.error("expected '=' or ':' in object")
                self.skip_newlines()
                obj.append((key, self.parse_expr()))
                self.skip_newlines()
                self.eat_punct(",")
                self.skip_newlines()
            self.expect("PUNCT", "}")
            return ObjectExpr(tuple(obj))
        raise self.error("expected expression")


def parse_document(src: str) -> Body:
    return Parser(Lexer(src).tokens()).parse_body(top=True)


def parse_expression(src: str) -> Node:
    p = Parser(Lexer(src).tokens())
    p.skip_newlines()
    e = p.parse_expr()
    p.skip_newlines()
    if p.peek().kind != "EOF":
        raise p.error("trailing input after expression")
    return e
