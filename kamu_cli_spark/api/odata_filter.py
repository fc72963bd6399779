"""OData v4 ``$filter`` → Spark Column translation.

Covers the expression subset the reference's OData adapter accepts
(src/adapter/odata/src/handler.rs:50-254): comparison operators
(eq ne gt ge lt le), boolean combinators (and/or/not, parentheses),
literals (quoted strings with '' escape, numbers, true/false/null) and
the common string functions contains/startswith/endswith/
tolower/toupper. Parsed with a recursive-descent parser into a Column
tree — the filter executes JVM-side and participates in predicate
pushdown like any other Spark filter.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


class ODataFilterError(Exception):
    pass


_TOKEN_RE = re.compile(
    r"\s*(?:"
    r"(?P<string>'(?:[^']|'')*')"
    r"|(?P<number>-?\d+(?:\.\d+)?)"
    r"|(?P<ident>[A-Za-z_][A-Za-z0-9_]*)"
    r"|(?P<lparen>\()|(?P<rparen>\))|(?P<comma>,)"
    r")"
)

_COMPARE = {
    "eq": lambda a, b: a.eqNullSafe(b) if b is None else a == b,
    "ne": lambda a, b: ~a.eqNullSafe(b) if b is None else a != b,
    "gt": lambda a, b: a > b,
    "ge": lambda a, b: a >= b,
    "lt": lambda a, b: a < b,
    "le": lambda a, b: a <= b,
}

_FUNCTIONS = {
    "contains": lambda col, pat: col.contains(pat),
    "startswith": lambda col, pat: col.startswith(pat),
    "endswith": lambda col, pat: col.endswith(pat),
    "tolower": lambda col: F.lower(col),
    "toupper": lambda col: F.upper(col),
}


def _tokenize(text: str) -> list[tuple[str, str]]:
    tokens, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == pos:
            if text[pos:].strip() == "":
                break
            raise ODataFilterError(f"bad token at: {text[pos:]!r}")
        pos = m.end()
        kind = m.lastgroup
        tokens.append((kind, m.group(kind)))
    return tokens


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.tokens = tokens
        self.i = 0

    def peek(self):
        return self.tokens[self.i] if self.i < len(self.tokens) else (None, None)

    def next(self):
        tok = self.peek()
        self.i += 1
        return tok

    def expect(self, kind: str):
        k, v = self.next()
        if k != kind:
            raise ODataFilterError(f"expected {kind}, got {v!r}")
        return v

    # expr := and_expr ('or' and_expr)*
    def expr(self) -> Column:
        left = self.and_expr()
        while self.peek() == ("ident", "or"):
            self.next()
            left = left | self.and_expr()
        return left

    def and_expr(self) -> Column:
        left = self.unary()
        while self.peek() == ("ident", "and"):
            self.next()
            left = left & self.unary()
        return left

    def unary(self) -> Column:
        if self.peek() == ("ident", "not"):
            self.next()
            return ~self.unary()
        return self.comparison()

    def comparison(self) -> Column:
        if self.peek()[0] == "lparen":
            self.next()
            inner = self.expr()
            self.expect("rparen")
            left: Column | object = inner
        else:
            left = self.operand()
        k, v = self.peek()
        if k == "ident" and v in _COMPARE:
            self.next()
            right = self.operand_value()
            if not isinstance(left, Column):
                raise ODataFilterError("left side of comparison must be a field")
            return _COMPARE[v](left, right)
        if isinstance(left, Column):
            return left  # bare boolean expression (e.g. contains(...))
        raise ODataFilterError(f"expected comparison operator near {v!r}")

    def operand(self) -> Column:
        k, v = self.next()
        if k == "ident":
            if v in _FUNCTIONS and self.peek()[0] == "lparen":
                return self._call(v)
            if v in ("true", "false", "null"):
                raise ODataFilterError(f"literal {v} cannot start a comparison")
            return F.col(v)
        raise ODataFilterError(f"expected field or function, got {v!r}")

    def operand_value(self):
        k, v = self.peek()
        if k == "string":
            self.next()
            return v[1:-1].replace("''", "'")
        if k == "number":
            self.next()
            return float(v) if "." in v else int(v)
        if k == "ident" and v in ("true", "false"):
            self.next()
            return v == "true"
        if k == "ident" and v == "null":
            self.next()
            return None
        return self.operand()

    def _call(self, name: str) -> Column:
        self.expect("lparen")
        args = [self.operand_value()]
        while self.peek()[0] == "comma":
            self.next()
            args.append(self.operand_value())
        self.expect("rparen")
        fn = _FUNCTIONS[name]
        try:
            return fn(*args)
        except TypeError as e:
            raise ODataFilterError(f"{name}: {e}") from e


def parse_filter(text: str) -> Column:
    parser = _Parser(_tokenize(text))
    col = parser.expr()
    if parser.i != len(parser.tokens):
        raise ODataFilterError(
            f"trailing tokens: {parser.tokens[parser.i:]!r}"
        )
    return col
