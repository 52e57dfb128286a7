"""AST node types for the message-selector language (SURVEY.md §2.B, §3.2).

The grammar is the JMS 2.0 §3.8 message-selector language (public spec) with
the engine's documented supersets: full string ordering comparisons, regex
match (``~``/``REGEXP``), numeric IN-lists, and ``${param}``
subscription-property templating (B15).

Nodes carry a ``type`` slot filled by the inference pass in
``compiler.annotate_types``:

* ``'long' | 'double'`` — exact / approximate numeric (JMS promotion)
* ``'string'``, ``'boolean'``, ``'timestamp'``
* ``'dynamic'`` — a message property extracted from the JSON properties
  column; it is a string at rest and coerces by *context* (B11): numeric
  comparison or arithmetic casts it to double, string context keeps it
  string.  This mirrors the JMS rule that property values convert per the
  requested accessor type.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Node:
    type: str | None = field(default=None, init=False, compare=False)


@dataclass
class Lit(Node):
    value: object  # int | float | str | bool | None
    kind: str  # 'long' | 'double' | 'string' | 'boolean' | 'null'


@dataclass
class Ident(Node):
    name: str  # 'value', 'event_type', 'props.k', bare property 'k'


@dataclass
class Unary(Node):
    op: str  # '-' | '+'
    operand: Node


@dataclass
class Arith(Node):
    op: str  # '+' '-' '*' '/' '%'
    left: Node
    right: Node


@dataclass
class Cmp(Node):
    op: str  # '=' '<>' '<' '<=' '>' '>='
    left: Node
    right: Node


@dataclass
class Between(Node):
    operand: Node
    low: Node
    high: Node
    negated: bool = False


@dataclass
class In(Node):
    operand: Node
    values: list[Lit]
    negated: bool = False


@dataclass
class Like(Node):
    operand: Node
    pattern: str
    escape: str | None = None
    negated: bool = False


@dataclass
class Regex(Node):
    """Engine extension (B8): ``expr REGEXP 'pattern'``."""

    operand: Node
    pattern: str
    negated: bool = False


@dataclass
class IsNull(Node):
    operand: Node
    negated: bool = False


@dataclass
class Cast(Node):
    """Inserted by the type-inference pass (never produced by the parser) to
    make JMS context coercion (B11) explicit: dynamic properties cast to
    double in numeric context, strings cast to timestamp against timestamp
    columns.  Both backends render it as a *try*-cast (NULL on failure) so
    malformed property values yield UNKNOWN — the JMS rule — instead of a
    runtime error under Spark's ANSI mode."""

    operand: Node
    to: str  # 'double' | 'long' | 'timestamp' | 'string'


@dataclass
class Not(Node):
    operand: Node


@dataclass
class And(Node):
    left: Node
    right: Node


@dataclass
class Or(Node):
    left: Node
    right: Node
