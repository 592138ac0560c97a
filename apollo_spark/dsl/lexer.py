"""Tokenizer for the HCL subset.

Handles: identifiers, numbers, double-quoted strings with ``${...}``
interpolation markers, punctuation/operators, ``//`` ``#`` line comments and
``/* */`` block comments, and newlines (significant as attribute separators,
as in HCL).
"""

from __future__ import annotations

from dataclasses import dataclass

PUNCT = [
    "==", "!=", "<=", ">=", "&&", "||",
    "{", "}", "[", "]", "(", ")",
    "=", ",", ":", "?", ".",
    "+", "-", "*", "/", "%", "<", ">", "!",
]


@dataclass(frozen=True)
class Token:
    kind: str  # IDENT NUMBER STRING PUNCT NEWLINE EOF
    value: object
    line: int
    col: int


class LexError(ValueError):
    pass


def _is_ident_start(c: str) -> bool:
    return c.isalpha() or c == "_"


def _is_ident(c: str) -> bool:
    return c.isalnum() or c in "_-"


class Lexer:
    def __init__(self, src: str):
        self.src = src
        self.pos = 0
        self.line = 1
        self.col = 1

    def error(self, msg: str) -> LexError:
        return LexError(f"line {self.line}:{self.col}: {msg}")

    def _advance(self, n: int = 1) -> None:
        for _ in range(n):
            if self.pos < len(self.src) and self.src[self.pos] == "\n":
                self.line += 1
                self.col = 1
            else:
                self.col += 1
            self.pos += 1

    def _peek(self, off: int = 0) -> str:
        i = self.pos + off
        return self.src[i] if i < len(self.src) else ""

    def tokens(self) -> list[Token]:
        out: list[Token] = []
        while True:
            tok = self._next()
            out.append(tok)
            if tok.kind == "EOF":
                return out

    def _next(self) -> Token:
        src = self.src
        # skip whitespace (not newlines) and comments
        while self.pos < len(src):
            c = src[self.pos]
            if c in " \t\r":
                self._advance()
            elif c == "/" and self._peek(1) == "/":
                while self.pos < len(src) and src[self.pos] != "\n":
                    self._advance()
            elif c == "#":
                while self.pos < len(src) and src[self.pos] != "\n":
                    self._advance()
            elif c == "/" and self._peek(1) == "*":
                self._advance(2)
                while self.pos < len(src) and not (src[self.pos] == "*" and self._peek(1) == "/"):
                    self._advance()
                if self.pos >= len(src):
                    raise self.error("unterminated block comment")
                self._advance(2)
            else:
                break
        line, col = self.line, self.col
        if self.pos >= len(src):
            return Token("EOF", None, line, col)
        c = src[self.pos]
        if c == "\n":
            self._advance()
            return Token("NEWLINE", "\n", line, col)
        if _is_ident_start(c):
            start = self.pos
            while self.pos < len(src) and _is_ident(src[self.pos]):
                self._advance()
            return Token("IDENT", src[start : self.pos], line, col)
        if c.isdigit() or (c == "." and self._peek(1).isdigit()):
            return self._number(line, col)
        if c == '"':
            return self._string(line, col)
        for p in PUNCT:
            if src.startswith(p, self.pos):
                self._advance(len(p))
                return Token("PUNCT", p, line, col)
        raise self.error(f"unexpected character {c!r}")

    def _number(self, line: int, col: int) -> Token:
        src = self.src
        start = self.pos
        if src.startswith("0x", self.pos) or src.startswith("0X", self.pos):
            self._advance(2)
            while self.pos < len(src) and src[self.pos] in "0123456789abcdefABCDEF":
                self._advance()
            return Token("NUMBER", int(src[start : self.pos], 16), line, col)
        is_float = False
        while self.pos < len(src) and (src[self.pos].isdigit() or src[self.pos] in ".eE"):
            ch = src[self.pos]
            if ch == ".":
                if not self._peek(1).isdigit():
                    break  # attribute traversal dot, not a decimal point
                is_float = True
            if ch in "eE":
                nxt = self._peek(1)
                if not (nxt.isdigit() or (nxt in "+-" and self._peek(2).isdigit())):
                    break
                is_float = True
                self._advance()  # consume the sign with the exponent marker
            self._advance()
        text = src[start : self.pos]
        return Token("NUMBER", float(text) if is_float else int(text), line, col)

    def _string(self, line: int, col: int) -> Token:
        """Returns a STRING token whose value is a list of parts: str literals
        and ``("interp", raw_expr_source)`` tuples for ``${...}`` segments."""
        src = self.src
        self._advance()  # opening quote
        parts: list[object] = []
        buf: list[str] = []
        while True:
            if self.pos >= len(src):
                raise self.error("unterminated string")
            c = src[self.pos]
            if c == '"':
                self._advance()
                break
            if c == "\\":
                esc = self._peek(1)
                mapping = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\"}
                if esc in mapping:
                    buf.append(mapping[esc])
                    self._advance(2)
                    continue
                raise self.error(f"bad escape \\{esc}")
            if c == "$" and self._peek(1) == "{":
                if buf:
                    parts.append("".join(buf))
                    buf = []
                self._advance(2)
                depth = 1
                start = self.pos
                while self.pos < len(src) and depth:
                    if src[self.pos] == "{":
                        depth += 1
                    elif src[self.pos] == "}":
                        depth -= 1
                        if depth == 0:
                            break
                    self._advance()
                if depth:
                    raise self.error("unterminated ${ interpolation")
                parts.append(("interp", src[start : self.pos]))
                self._advance()  # closing }
                continue
            buf.append(c)
            self._advance()
        if buf or not parts:
            parts.append("".join(buf))
        return Token("STRING", parts, line, col)
