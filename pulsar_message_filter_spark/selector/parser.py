"""Tokenizer + recursive-descent parser for the message-selector language.

Grammar (JMS 2.0 §3.8 [public spec], plus documented supersets — SURVEY.md
§2.B).  Operator precedence, loosest to tightest::

    selector   := or_expr
    or_expr    := and_expr ( OR and_expr )*
    and_expr   := not_expr ( AND not_expr )*
    not_expr   := NOT not_expr | predicate
    predicate  := additive ( cmp_op additive
                           | [NOT] BETWEEN additive AND additive
                           | [NOT] IN '(' literal (',' literal)* ')'
                           | [NOT] LIKE string [ESCAPE string]
                           | [NOT] REGEXP string
                           | IS [NOT] NULL )?
    additive   := multiplic ( ('+'|'-') multiplic )*
    multiplic  := unary ( ('*'|'/'|'%') unary )*
    unary      := ('-'|'+') unary | primary
    primary    := literal | ident | param | '(' or_expr ')'
    literal    := number | 'string' | TRUE | FALSE
    param      := '${' name '}'            -- subscription-property template (B15)

Parse-once / evaluate-per-row: the upstream entry-filter contract parses a
subscription's selector at consumer-attach and evaluates it per dispatched
entry (PIP-105, public).  Here the parse happens once per ``Selector`` and
evaluation is vectorized whole-stage-codegen (SURVEY.md §3.2).
"""

from __future__ import annotations

import re

from pulsar_message_filter_spark.selector.ast_nodes import (
    And,
    Arith,
    Between,
    Cmp,
    Ident,
    In,
    IsNull,
    Like,
    Lit,
    Node,
    Not,
    Or,
    Regex,
    Unary,
)


class SelectorSyntaxError(ValueError):
    """Raised on any lexical or syntactic error, with position context."""


_KEYWORDS = {
    "AND",
    "OR",
    "NOT",
    "BETWEEN",
    "IN",
    "LIKE",
    "ESCAPE",
    "REGEXP",
    "IS",
    "NULL",
    "TRUE",
    "FALSE",
}

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<param>\$\{[A-Za-z_][A-Za-z0-9_]*\})
  | (?P<num>(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<str>'(?:[^']|'')*')
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)
  | (?P<op><>|<=|>=|=|<|>|\+|-|\*|/|%|\(|\)|,)
    """,
    re.VERBOSE,
)


def tokenize(text: str) -> list[tuple[str, str, int]]:
    """Lex into (kind, value, pos) triples; kind ∈ {num,str,ident,kw,op,param}."""
    tokens: list[tuple[str, str, int]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise SelectorSyntaxError(
                f"unexpected character {text[pos]!r} at position {pos} in selector: {text!r}"
            )
        kind = m.lastgroup
        value = m.group()
        if kind != "ws":
            if kind == "ident" and value.upper() in _KEYWORDS:
                tokens.append(("kw", value.upper(), pos))
            else:
                tokens.append((kind, value, pos))
        pos = m.end()
    tokens.append(("eof", "", pos))
    return tokens


class Parser:
    def __init__(self, text: str, params: dict[str, object] | None = None):
        self.text = text
        self.params = params or {}
        self.tokens = tokenize(text)
        self.i = 0

    # --- token helpers -------------------------------------------------
    def _peek(self) -> tuple[str, str, int]:
        return self.tokens[self.i]

    def _next(self) -> tuple[str, str, int]:
        tok = self.tokens[self.i]
        self.i += 1
        return tok

    def _accept_kw(self, *kws: str) -> str | None:
        kind, value, _ = self._peek()
        if kind == "kw" and value in kws:
            self.i += 1
            return value
        return None

    def _accept_op(self, *ops: str) -> str | None:
        kind, value, _ = self._peek()
        if kind == "op" and value in ops:
            self.i += 1
            return value
        return None

    def _expect_op(self, op: str) -> None:
        if not self._accept_op(op):
            kind, value, pos = self._peek()
            raise SelectorSyntaxError(
                f"expected {op!r} at position {pos}, found {value!r} in: {self.text!r}"
            )

    def _expect_kw(self, kw: str) -> None:
        if not self._accept_kw(kw):
            kind, value, pos = self._peek()
            raise SelectorSyntaxError(
                f"expected {kw} at position {pos}, found {value!r} in: {self.text!r}"
            )

    # --- grammar --------------------------------------------------------
    def parse(self) -> Node:
        node = self.or_expr()
        kind, value, pos = self._peek()
        if kind != "eof":
            raise SelectorSyntaxError(
                f"trailing input {value!r} at position {pos} in: {self.text!r}"
            )
        return node

    def or_expr(self) -> Node:
        node = self.and_expr()
        while self._accept_kw("OR"):
            node = Or(node, self.and_expr())
        return node

    def and_expr(self) -> Node:
        node = self.not_expr()
        while self._accept_kw("AND"):
            node = And(node, self.not_expr())
        return node

    def not_expr(self) -> Node:
        if self._accept_kw("NOT"):
            return Not(self.not_expr())
        return self.predicate()

    def predicate(self) -> Node:
        left = self.additive()
        # IS [NOT] NULL
        if self._accept_kw("IS"):
            negated = bool(self._accept_kw("NOT"))
            self._expect_kw("NULL")
            return IsNull(left, negated)
        negated = bool(self._accept_kw("NOT"))
        if self._accept_kw("BETWEEN"):
            low = self.additive()
            self._expect_kw("AND")
            high = self.additive()
            return Between(left, low, high, negated)
        if self._accept_kw("IN"):
            self._expect_op("(")
            values = [self._literal()]
            while self._accept_op(","):
                values.append(self._literal())
            self._expect_op(")")
            return In(left, values, negated)
        if self._accept_kw("LIKE"):
            pattern = self._string_literal()
            escape = None
            if self._accept_kw("ESCAPE"):
                escape = self._string_literal()
                if len(escape) != 1:
                    raise SelectorSyntaxError(
                        f"ESCAPE must be a single character, got {escape!r}"
                    )
            return Like(left, pattern, escape, negated)
        if self._accept_kw("REGEXP"):
            return Regex(left, self._string_literal(), negated)
        if negated:
            kind, value, pos = self._peek()
            raise SelectorSyntaxError(
                f"expected BETWEEN/IN/LIKE/REGEXP after NOT at position {pos} in: {self.text!r}"
            )
        op = self._accept_op("=", "<>", "<", "<=", ">", ">=")
        if op:
            return Cmp(op, left, self.additive())
        return left  # bare boolean expression (TRUE, boolean ident, parenthesized)

    def additive(self) -> Node:
        node = self.multiplic()
        while True:
            op = self._accept_op("+", "-")
            if not op:
                return node
            node = Arith(op, node, self.multiplic())

    def multiplic(self) -> Node:
        node = self.unary()
        while True:
            op = self._accept_op("*", "/", "%")
            if not op:
                return node
            node = Arith(op, node, self.unary())

    def unary(self) -> Node:
        op = self._accept_op("-", "+")
        if op:
            return Unary(op, self.unary())
        return self.primary()

    def primary(self) -> Node:
        kind, value, pos = self._peek()
        if kind == "op" and value == "(":
            self._next()
            node = self.or_expr()
            self._expect_op(")")
            return node
        if kind in ("num", "str", "param") or (kind == "kw" and value in ("TRUE", "FALSE")):
            return self._literal()
        if kind == "ident":
            self._next()
            return Ident(value)
        raise SelectorSyntaxError(
            f"unexpected token {value!r} at position {pos} in: {self.text!r}"
        )

    # --- literals ---------------------------------------------------------
    def _literal(self) -> Lit:
        kind, value, pos = self._next()
        if kind == "num":
            if any(c in value for c in ".eE"):
                return Lit(float(value), "double")
            return Lit(int(value), "long")
        if kind == "str":
            return Lit(value[1:-1].replace("''", "'"), "string")
        if kind == "kw" and value in ("TRUE", "FALSE"):
            return Lit(value == "TRUE", "boolean")
        if kind == "param":
            return self._param_literal(value[2:-1], pos)
        raise SelectorSyntaxError(
            f"expected a literal at position {pos}, found {value!r} in: {self.text!r}"
        )

    def _param_literal(self, name: str, pos: int) -> Lit:
        """Subscription-property templating (B15): ``${name}`` becomes a typed
        literal from the subscription's property map at compile time — the
        upstream parameterize-by-subscription-properties contract."""
        if name not in self.params:
            raise SelectorSyntaxError(
                f"unbound subscription property ${{{name}}} at position {pos}; "
                f"available: {sorted(self.params)}"
            )
        v = self.params[name]
        if isinstance(v, bool):
            return Lit(v, "boolean")
        if isinstance(v, int):
            return Lit(v, "long")
        if isinstance(v, float):
            return Lit(v, "double")
        if isinstance(v, str):
            return Lit(v, "string")
        raise SelectorSyntaxError(
            f"subscription property ${{{name}}} has unsupported type {type(v).__name__}"
        )

    def _string_literal(self) -> str:
        kind, value, pos = self._next()
        if kind == "str":
            return value[1:-1].replace("''", "'")
        if kind == "param":
            lit = self._param_literal(value[2:-1], pos)
            if lit.kind != "string":
                raise SelectorSyntaxError(
                    f"expected a string-valued property at position {pos}"
                )
            return str(lit.value)
        raise SelectorSyntaxError(
            f"expected a string literal at position {pos}, found {value!r}"
        )


def parse(text: str, params: dict[str, object] | None = None) -> Node:
    """Parse a selector string (with optional subscription properties) to AST."""
    return Parser(text, params).parse()
