"""Selector AST → (typed AST) → PySpark ``Column`` / DuckDB oracle SQL.

Three passes (SURVEY.md §3.2):

1. :func:`annotate` — type inference + JMS context coercion (B11).  Message
   properties extracted from the JSON ``props`` column are ``dynamic``
   (string at rest); numeric context wraps them in a try-cast to double,
   timestamp context casts string literals to timestamp.  Try-cast (NULL on
   failure) matches the JMS rule that an inconvertible property makes the
   predicate UNKNOWN — and keeps Spark's ANSI mode from throwing.
2. :func:`to_column` — builds a native ``pyspark.sql.Column`` tree.  The
   output is ordinary Catalyst IR, so predicate pushdown / column pruning /
   whole-stage codegen apply with zero extra work (SURVEY.md §4.2).
3. :func:`to_sql` — renders the *same* typed AST as SQL in either the
   ``duckdb`` (oracle) or ``spark`` dialect; dialects differ only in JSON
   extraction and regex-match spelling.  One AST feeding both engines is
   what makes every selector query oracle-checkable by construction.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pulsar_message_filter_spark.selector.ast_nodes import (
    And,
    Arith,
    Between,
    Cast,
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


class SelectorTypeError(TypeError):
    """Raised when a selector is grammatically valid but ill-typed."""


# --------------------------------------------------------------------------
# Schema / identifier resolution
# --------------------------------------------------------------------------

_NUMERIC = ("long", "double")


@dataclass(frozen=True)
class Schema:
    """Column name→type map plus the JSON message-properties column.

    Identifier resolution order (JMS: every non-header identifier is a
    message property; headers are typed columns):

    1. a declared column (``event_type``, ``value`` …) — typed;
    2. ``<props_col>.key`` — explicit property access (B9);
    3. any other bare identifier — implicit property access, JMS-style.
    """

    columns: dict[str, str] = field(default_factory=dict)
    props_col: str | None = "props"

    def resolve(self, name: str) -> tuple[str, str]:
        """→ ('col', type) | ('prop', json_key)."""
        if name in self.columns:
            return "col", self.columns[name]
        if self.props_col:
            prefix = self.props_col + "."
            if name.startswith(prefix):
                return "prop", name[len(prefix) :]
            if "." not in name:
                return "prop", name
        raise SelectorTypeError(
            f"cannot resolve identifier {name!r}: not a column "
            f"({sorted(self.columns)}) and no properties column is configured"
        )


#: The ``events`` fixture — the engine's message-stream analog (SURVEY §1.2).
EVENTS_SCHEMA = Schema(
    columns={
        "event_id": "long",
        "ts": "timestamp",
        "user_id": "long",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    props_col="props",
)


# --------------------------------------------------------------------------
# Pass 1 — type inference + coercion
# --------------------------------------------------------------------------


def _coerce(node: Node, target: str) -> Node:
    cast = Cast(node, target)
    cast.type = target
    return cast


def _numeric_ctx(node: Node) -> Node:
    """Coerce a node for numeric context (JMS B11)."""
    if node.type in _NUMERIC:
        return node
    if node.type in ("dynamic", "string"):
        return _coerce(node, "double")
    raise SelectorTypeError(f"expected a numeric expression, got {node.type}")


def _string_ctx(node: Node) -> Node:
    if node.type in ("string", "dynamic"):
        return node
    raise SelectorTypeError(f"expected a string expression, got {node.type}")


def _boolean_ctx(node: Node) -> Node:
    """Boolean context (AND/OR/NOT operands, selector root).

    JMS boolean properties: a bare property identifier used as a predicate
    term reads as its boolean value (``getBooleanProperty``); an
    inconvertible value yields UNKNOWN — hence try-cast."""
    if node.type == "boolean":
        return node
    if node.type == "dynamic":
        return _coerce(node, "boolean")
    raise SelectorTypeError(f"expected a boolean expression, got {node.type}")


def annotate(node: Node, schema: Schema) -> Node:
    """Infer types bottom-up, inserting :class:`Cast` nodes; returns the
    (possibly wrapped) node with ``.type`` set on every descendant."""
    if isinstance(node, Lit):
        node.type = "string" if node.kind == "string" else node.kind
        return node

    if isinstance(node, Ident):
        kind, detail = schema.resolve(node.name)
        node.type = detail if kind == "col" else "dynamic"
        node.resolved = (kind, detail)  # type: ignore[attr-defined]
        return node

    if isinstance(node, Unary):
        node.operand = _numeric_ctx(annotate(node.operand, schema))
        node.type = node.operand.type
        return node

    if isinstance(node, Arith):
        node.left = _numeric_ctx(annotate(node.left, schema))
        node.right = _numeric_ctx(annotate(node.right, schema))
        if node.op == "/":
            node.type = "double"  # both engines do float division for '/'
        else:
            node.type = (
                "long"
                if node.left.type == "long" and node.right.type == "long"
                else "double"
            )
        return node

    if isinstance(node, Cmp):
        node.left = annotate(node.left, schema)
        node.right = annotate(node.right, schema)
        lt, rt = node.left.type, node.right.type
        if lt in _NUMERIC or rt in _NUMERIC:
            node.left, node.right = _numeric_ctx(node.left), _numeric_ctx(node.right)
        elif "timestamp" in (lt, rt):
            if lt != "timestamp":
                node.left = _coerce(_string_ctx(node.left), "timestamp")
            if rt != "timestamp":
                node.right = _coerce(_string_ctx(node.right), "timestamp")
        elif lt == "boolean" or rt == "boolean":
            # JMS permits equality of a boolean property with TRUE/FALSE:
            # a dynamic side reads through Boolean.valueOf (same try-cast as
            # the bare-identifier predicate form); anything else is ill-typed.
            node.left = _boolean_ctx(node.left)
            node.right = _boolean_ctx(node.right)
            if node.op not in ("=", "<>"):
                raise SelectorTypeError(
                    f"boolean comparison supports only = and <>, got {node.op!r}"
                )
        # else: string/dynamic vs string/dynamic → string comparison as-is
        node.type = "boolean"
        return node

    if isinstance(node, Between):
        node.operand = annotate(node.operand, schema)
        node.low = annotate(node.low, schema)
        node.high = annotate(node.high, schema)
        types = {node.operand.type, node.low.type, node.high.type}
        if types & set(_NUMERIC):
            node.operand = _numeric_ctx(node.operand)
            node.low = _numeric_ctx(node.low)
            node.high = _numeric_ctx(node.high)
        elif "timestamp" in types:
            for attr in ("operand", "low", "high"):
                child = getattr(node, attr)
                if child.type != "timestamp":
                    setattr(node, attr, _coerce(_string_ctx(child), "timestamp"))
        node.type = "boolean"
        return node

    if isinstance(node, In):
        node.operand = annotate(node.operand, schema)
        for v in node.values:
            annotate(v, schema)
        kinds = {v.type for v in node.values}
        if kinds & set(_NUMERIC):
            node.operand = _numeric_ctx(node.operand)
        elif node.operand.type not in ("string", "dynamic"):
            raise SelectorTypeError(
                f"IN list of {kinds} does not match operand type {node.operand.type}"
            )
        node.type = "boolean"
        return node

    if isinstance(node, (Like, Regex)):
        node.operand = _string_ctx(annotate(node.operand, schema))
        node.type = "boolean"
        return node

    if isinstance(node, IsNull):
        node.operand = annotate(node.operand, schema)
        node.type = "boolean"
        return node

    if isinstance(node, Not):
        node.operand = _boolean_ctx(annotate(node.operand, schema))
        node.type = "boolean"
        return node

    if isinstance(node, (And, Or)):
        node.left = _boolean_ctx(annotate(node.left, schema))
        node.right = _boolean_ctx(annotate(node.right, schema))
        node.type = "boolean"
        return node

    if isinstance(node, Cast):  # pre-coerced subtree (idempotent re-annotate)
        return node

    raise SelectorTypeError(f"unknown AST node {node!r}")


# --------------------------------------------------------------------------
# Pass 2 — PySpark Column backend
# --------------------------------------------------------------------------


def like_pattern_to_regex(pattern: str, escape: str | None) -> str:
    """Translate a SQL LIKE pattern (with optional ESCAPE) to an anchored
    regex — used only for the LIKE…ESCAPE form, which the pyspark ``Column``
    API does not expose directly.  Semantics match SQL: ``%`` → ``.*``,
    ``_`` → ``.``, escaped wildcard chars are literal."""
    import re as _re

    out, i = ["(?s)^"], 0
    while i < len(pattern):
        ch = pattern[i]
        if escape is not None and ch == escape and i + 1 < len(pattern):
            out.append(_re.escape(pattern[i + 1]))
            i += 2
            continue
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(_re.escape(ch))
        i += 1
    out.append("$")
    return "".join(out)


def to_column(node: Node, schema: Schema):
    """Typed AST → native pyspark Column (requires an active session)."""
    from pyspark.sql import functions as F

    def build(n: Node):
        if isinstance(n, Lit):
            return F.lit(n.value)
        if isinstance(n, Ident):
            kind, detail = n.resolved  # type: ignore[attr-defined]
            if kind == "col":
                return F.col(n.name)
            return F.get_json_object(F.col(schema.props_col), f"$.{detail}")
        if isinstance(n, Cast):
            if n.to == "boolean":
                # JMS Boolean.valueOf: true iff equalsIgnoreCase("true");
                # any other string is false; missing property stays NULL
                # (engines' native string→bool casts disagree on 'yes'/'y').
                return F.lower(build(n.operand)) == "true"
            return build(n.operand).try_cast(n.to)
        if isinstance(n, Unary):
            c = build(n.operand)
            return -c if n.op == "-" else c
        if isinstance(n, Arith):
            l, r = build(n.left), build(n.right)
            return {
                "+": l + r,
                "-": l - r,
                "*": l * r,
                "/": l / r,
                "%": l % r,
            }[n.op]
        if isinstance(n, Cmp):
            l, r = build(n.left), build(n.right)
            return {
                "=": l == r,
                "<>": l != r,
                "<": l < r,
                "<=": l <= r,
                ">": l > r,
                ">=": l >= r,
            }[n.op]
        if isinstance(n, Between):
            c = build(n.operand).between(build(n.low), build(n.high))
            return ~c if n.negated else c
        if isinstance(n, In):
            c = build(n.operand).isin([v.value for v in n.values])
            return ~c if n.negated else c
        if isinstance(n, Like):
            col = build(n.operand)
            if n.escape is None:
                c = col.like(n.pattern)
            else:
                c = col.rlike(like_pattern_to_regex(n.pattern, n.escape))
            return ~c if n.negated else c
        if isinstance(n, Regex):
            c = build(n.operand).rlike(n.pattern)
            return ~c if n.negated else c
        if isinstance(n, IsNull):
            c = build(n.operand)
            return c.isNotNull() if n.negated else c.isNull()
        if isinstance(n, Not):
            return ~build(n.operand)
        if isinstance(n, And):
            return build(n.left) & build(n.right)
        if isinstance(n, Or):
            return build(n.left) | build(n.right)
        raise SelectorTypeError(f"unknown AST node {n!r}")

    return build(node)


# --------------------------------------------------------------------------
# Pass 3 — SQL backends (duckdb oracle / spark debug)
# --------------------------------------------------------------------------


def _sql_str(value: str) -> str:
    return "'" + value.replace("'", "''") + "'"


def to_sql(node: Node, schema: Schema, dialect: str = "duckdb") -> str:
    """Render the typed AST as SQL.  ``duckdb`` is the oracle dialect;
    ``spark`` is a debugging/`F.expr` surface.  Dialect differences:

    ===================  ==============================  =========================
    construct            duckdb                          spark
    ===================  ==============================  =========================
    property access      json_extract_string(p,'$.k')    get_json_object(p,'$.k')
    try-cast             TRY_CAST(x AS T)                TRY_CAST(x AS T)
    regex match          regexp_matches(x,'p')           x RLIKE 'p'
    ===================  ==============================  =========================
    """
    if dialect not in ("duckdb", "spark"):
        raise ValueError(f"unknown dialect {dialect!r}")

    type_names = {
        "double": "DOUBLE",
        "long": "BIGINT",
        "timestamp": "TIMESTAMP",
        "string": "VARCHAR",
        "boolean": "BOOLEAN",
    }

    def render(n: Node) -> str:
        if isinstance(n, Lit):
            if n.kind == "string":
                return _sql_str(str(n.value))
            if n.kind == "boolean":
                return "TRUE" if n.value else "FALSE"
            return repr(n.value)
        if isinstance(n, Ident):
            kind, detail = n.resolved  # type: ignore[attr-defined]
            if kind == "col":
                return n.name
            if dialect == "duckdb":
                return f"json_extract_string({schema.props_col}, '$.{detail}')"
            return f"get_json_object({schema.props_col}, '$.{detail}')"
        if isinstance(n, Cast):
            if n.to == "boolean":
                # JMS Boolean.valueOf — see the Column backend twin
                return f"(lower({render(n.operand)}) = 'true')"
            return f"TRY_CAST({render(n.operand)} AS {type_names[n.to]})"
        if isinstance(n, Unary):
            return f"({n.op}{render(n.operand)})"
        if isinstance(n, Arith):
            return f"({render(n.left)} {n.op} {render(n.right)})"
        if isinstance(n, Cmp):
            return f"({render(n.left)} {n.op} {render(n.right)})"
        if isinstance(n, Between):
            kw = "NOT BETWEEN" if n.negated else "BETWEEN"
            return f"({render(n.operand)} {kw} {render(n.low)} AND {render(n.high)})"
        if isinstance(n, In):
            kw = "NOT IN" if n.negated else "IN"
            vals = ", ".join(render(v) for v in n.values)
            return f"({render(n.operand)} {kw} ({vals}))"
        if isinstance(n, Like):
            kw = "NOT LIKE" if n.negated else "LIKE"
            esc = f" ESCAPE {_sql_str(n.escape)}" if n.escape else ""
            return f"({render(n.operand)} {kw} {_sql_str(n.pattern)}{esc})"
        if isinstance(n, Regex):
            if dialect == "duckdb":
                expr = f"regexp_matches({render(n.operand)}, {_sql_str(n.pattern)})"
            else:
                expr = f"({render(n.operand)} RLIKE {_sql_str(n.pattern)})"
            return f"(NOT {expr})" if n.negated else expr
        if isinstance(n, IsNull):
            kw = "IS NOT NULL" if n.negated else "IS NULL"
            return f"({render(n.operand)} {kw})"
        if isinstance(n, Not):
            return f"(NOT {render(n.operand)})"
        if isinstance(n, And):
            return f"({render(n.left)} AND {render(n.right)})"
        if isinstance(n, Or):
            return f"({render(n.left)} OR {render(n.right)})"
        raise SelectorTypeError(f"unknown AST node {n!r}")

    return render(node)
