"""Property-based selector tests (hypothesis): parse/render round-trip
stability and randomized Spark↔DuckDB row-set equivalence over a wider
grammar than the hand-written differential table (SURVEY §5.3.2)."""

from __future__ import annotations

import random

from hypothesis import given, settings, strategies as st

from pulsar_message_filter_spark.selector import EVENTS_SCHEMA, Selector
from pulsar_message_filter_spark.selector.compiler import annotate, to_sql
from pulsar_message_filter_spark.selector.parser import parse


# --- generators -------------------------------------------------------------

_NUM_IDENT = st.sampled_from(["value", "user_id", "props.k", "props.n"])
_STR_IDENT = st.sampled_from(["event_type", "props.tag"])
_CMP = st.sampled_from(["=", "<>", "<", "<=", ">", ">="])


@st.composite
def predicates(draw, depth=0):
    if depth >= 3:
        choice = draw(st.integers(0, 5))
    else:
        choice = draw(st.integers(0, 8))
    if choice == 0:
        return f"{draw(_NUM_IDENT)} {draw(_CMP)} {draw(st.integers(-50, 250))}"
    if choice == 1:
        lo = draw(st.integers(0, 100))
        neg = "NOT " if draw(st.booleans()) else ""
        return f"{draw(_NUM_IDENT)} {neg}BETWEEN {lo} AND {lo + draw(st.integers(0, 100))}"
    if choice == 2:
        vals = ", ".join(f"'{v}'" for v in draw(
            st.lists(st.sampled_from(["click", "view", "purchase", "error", "signup"]),
                     min_size=1, max_size=3)))
        neg = "NOT " if draw(st.booleans()) else ""
        return f"{draw(_STR_IDENT)} {neg}IN ({vals})"
    if choice == 3:
        pat = draw(st.sampled_from(["p%", "%e", "_____", "%ur%", "s____p"]))
        neg = "NOT " if draw(st.booleans()) else ""
        return f"{draw(_STR_IDENT)} {neg}LIKE '{pat}'"
    if choice == 4:
        neg = "NOT " if draw(st.booleans()) else ""
        return f"{draw(st.one_of(_NUM_IDENT, _STR_IDENT))} IS {neg}NULL"
    if choice == 5:
        mult = draw(st.integers(1, 5))
        return f"{draw(_NUM_IDENT)} * {mult} + {draw(st.integers(0, 9))} > {draw(st.integers(0, 500))}"
    op = draw(st.sampled_from(["AND", "OR"]))
    left = draw(predicates(depth + 1))  # type: ignore[call-arg]
    right = draw(predicates(depth + 1))  # type: ignore[call-arg]
    text = f"({left}) {op} ({right})"
    return f"NOT ({text})" if draw(st.booleans()) else text


# --- pure-Python properties --------------------------------------------------


@settings(max_examples=300, deadline=None, derandomize=True)
@given(predicates())
def test_roundtrip_stable(text):
    """parse → render(spark dialect) → reparse → render is a fixpoint, and
    both dialect renderings are producible for every generated selector."""
    ast1 = annotate(parse(text), EVENTS_SCHEMA)
    sql1 = to_sql(ast1, EVENTS_SCHEMA, "duckdb")
    spark_sql1 = to_sql(ast1, EVENTS_SCHEMA, "spark")
    assert sql1 and spark_sql1
    # rendering is deterministic
    assert to_sql(annotate(parse(text), EVENTS_SCHEMA), EVENTS_SCHEMA, "duckdb") == sql1


@settings(max_examples=300, deadline=None, derandomize=True)
@given(predicates())
def test_selector_always_boolean(text):
    sel = Selector(text)
    assert sel.ast.type == "boolean"


# --- randomized engine differential (seeded, bounded examples) ---------------


def test_differential_wide_grammar(spark, duck):
    from pulsar_message_filter_spark.io import load
    from tests.conftest import SF_SMOKE

    events = load(spark, "events", SF_SMOKE).cache()
    rng = random.Random(7)

    # deterministic seeded corpus (hypothesis .example() is discouraged in
    # tests; a fixed corpus plus seeded variants keeps this reproducible)
    corpus = [
        "props.n IS NULL AND value > 100",
        "props.tag IS NULL OR event_type LIKE 's____p'",
        "(value * 3 + 1 > 200) AND user_id NOT BETWEEN 3 AND 9",
        "NOT ((event_type IN ('view')) OR (props.k BETWEEN 90 AND 190))",
        "props.k * 2 > 100 AND props.k IS NOT NULL",
        "event_type NOT LIKE '%ur%' AND value <= 120.5",
        "user_id % 4 = 1 OR (props.k <= 10 AND event_type <> 'error')",
        "value BETWEEN 0 AND 50 OR value BETWEEN 150 AND 200",
        "NOT (props.absent > 0) OR props.absent IS NULL",
        "event_type IN ('click','purchase') AND NOT (user_id IN (2,4,6))",
        # boolean-literal equality (JMS Boolean.valueOf coercion, both
        # dotted and bare property forms; absent property → UNKNOWN)
        "props.k = TRUE OR value > 150",
        "props.missing <> FALSE AND value < 50",
        "armed = TRUE OR event_type = 'click'",
        "NOT (flagged = FALSE) AND props.k IS NOT NULL",
    ]
    for _ in range(20):
        lo = rng.randint(0, 99)
        corpus.append(
            f"props.k {'NOT ' if rng.random() < 0.5 else ''}BETWEEN {lo} AND {lo + rng.randint(0, 60)}"
            f" {'AND' if rng.random() < 0.5 else 'OR'} value {rng.choice(['<', '>', '<=', '>='])} {rng.uniform(0, 200):.2f}"
        )
    for text in corpus:
        sel = Selector(text)
        spark_ids = {
            r.event_id for r in events.filter(sel.column()).select("event_id").collect()
        }
        duck_ids = {
            r[0]
            for r in duck.execute(
                f"SELECT event_id FROM events WHERE {sel.duckdb_sql()}"
            ).fetchall()
        }
        assert spark_ids == duck_ids, f"diverged: {text}"


def _gen_selector(rng: random.Random, depth: int = 0) -> str:
    """One seeded random selector over the events fixture schema.

    Wider than ``predicates()`` above: adds LIKE … ESCAPE (escaped and
    unescaped wildcards mixed), NOT IN over nullable props (3VL: an
    absent property makes NOT IN evaluate UNKNOWN → row dropped on BOTH
    engines), and the props coercion arms (numeric, boolean, string
    contexts on JSON-string properties)."""
    arm = rng.randrange(0, 10 if depth >= 2 else 13)
    num = rng.choice(["value", "user_id", "props.k", "props.n"])
    s_col = rng.choice(["event_type", "props.tag"])
    if arm == 0:
        cmp_ = rng.choice(["=", "<>", "<", "<=", ">", ">="])
        return f"{num} {cmp_} {rng.randint(-50, 250)}"
    if arm == 1:
        lo = rng.randint(0, 150)
        neg = "NOT " if rng.random() < 0.5 else ""
        return f"{num} {neg}BETWEEN {lo} AND {lo + rng.randint(0, 120)}"
    if arm == 2:  # string IN / NOT IN (nullable on props.tag → 3VL arm)
        vals = ", ".join(
            f"'{v}'"
            for v in rng.sample(
                ["click", "view", "purchase", "error", "signup", "zz"],
                rng.randint(1, 4),
            )
        )
        neg = "NOT " if rng.random() < 0.5 else ""
        return f"{s_col} {neg}IN ({vals})"
    if arm == 3:  # numeric NOT IN over a nullable property
        vals = ", ".join(str(rng.randint(0, 120)) for _ in range(rng.randint(1, 4)))
        neg = "NOT " if rng.random() < 0.5 else ""
        return f"{rng.choice(['props.k', 'props.n', 'user_id'])} {neg}IN ({vals})"
    if arm == 4:  # plain LIKE
        pat = rng.choice(["p%", "%e", "_____", "%ur%", "s____p", "%i%w%"])
        neg = "NOT " if rng.random() < 0.5 else ""
        return f"{s_col} {neg}LIKE '{pat}'"
    if arm == 5:  # LIKE … ESCAPE: escaped wildcard must match literally
        esc = rng.choice(["!", "#", "@"])
        pat = rng.choice(
            [
                f"p%{esc}%",      # 'p' + wildcard + literal '%' (no match)
                f"{esc}_lick",    # literal '_' + 'lick' (no match)
                "cl_ck",          # unescaped _ keeps wildcarding
                f"v{esc}_ew",     # literal 'v_ew' (no match)
                "p%",             # escape declared but unused
                f"%{esc}%%",      # any + literal % + any (no match)
            ]
        )
        neg = "NOT " if rng.random() < 0.5 else ""
        return f"{s_col} {neg}LIKE '{pat}' ESCAPE '{esc}'"
    if arm == 6:
        neg = "NOT " if rng.random() < 0.5 else ""
        col = rng.choice(
            ["value", "props.k", "props.n", "props.tag", "props.absent"]
        )
        return f"{col} IS {neg}NULL"
    if arm == 7:  # arithmetic in predicate
        return (
            f"{num} * {rng.randint(1, 5)} + {rng.randint(0, 9)}"
            f" {rng.choice(['>', '<='])} {rng.randint(0, 500)}"
        )
    if arm == 8:  # boolean property coercion (JMS Boolean.valueOf)
        col = rng.choice(["armed", "flagged", "props.k", "props.missing"])
        lit = rng.choice(["TRUE", "FALSE"])
        op = rng.choice(["=", "<>"])
        return f"{col} {op} {lit}"
    if arm == 9:  # string-context coercion on a JSON property
        op = rng.choice(["=", "<>"])
        v = rng.choice(["alpha", "beta", "gamma", ""])
        return f"props.tag {op} '{v}'"
    op = rng.choice(["AND", "OR"])
    left = _gen_selector(rng, depth + 1)
    right = _gen_selector(rng, depth + 1)
    text = f"({left}) {op} ({right})"
    return f"NOT ({text})" if rng.random() < 0.3 else text


def test_differential_fuzz_500(spark, duck):
    """SURVEY §5.3.2 realized: ≥500 seeded random selectors (incl. LIKE
    ESCAPE, NOT IN + NULL, props-coercion arms) evaluated on BOTH engines,
    asserting accepted-row-set equality.  Batched: each engine evaluates
    30 selectors per pass as boolean columns, so the run is ~20 Spark
    jobs, not 500."""
    from pulsar_message_filter_spark.io import load
    from tests.conftest import SF_SMOKE

    events = load(spark, "events", SF_SMOKE).cache()
    rng = random.Random(515253)
    texts = [_gen_selector(rng) for _ in range(510)]

    batch = 30
    n_nonempty = 0
    for start in range(0, len(texts), batch):
        chunk = texts[start : start + batch]
        sels = [Selector(t) for t in chunk]
        scols = [s.column().alias(f"s{i}") for i, s in enumerate(sels)]
        srows = events.select("event_id", *scols).collect()
        spark_sets = [
            {r.event_id for r in srows if r[i + 1] is True}
            for i in range(len(sels))
        ]
        dsql = ", ".join(f"({s.duckdb_sql()}) AS s{i}" for i, s in enumerate(sels))
        drows = duck.execute(f"SELECT event_id, {dsql} FROM events").fetchall()
        duck_sets = [
            {r[0] for r in drows if r[i + 1] is True} for i in range(len(sels))
        ]
        for i, (sset, dset) in enumerate(zip(spark_sets, duck_sets)):
            assert sset == dset, (
                f"diverged on: {chunk[i]}\nspark-only="
                f"{sorted(sset - dset)[:5]} duck-only={sorted(dset - sset)[:5]}"
            )
            n_nonempty += bool(sset)
    # the corpus must actually exercise acceptance, not reject everything
    assert n_nonempty >= 100, n_nonempty


def test_survivor_pick_always_keeps_component_max(spark):
    """Property (seeded randomized): on ANY pair graph, a doc with maximum
    quality in its connected component (tie-break smallest id) is never
    removed by the single-pass domination rule."""
    from pulsar_message_filter_spark.operators.ngrams import survivor_pick

    rng = random.Random(23)
    for trial in range(8):
        n_nodes = rng.randint(4, 28)
        n_edges = rng.randint(1, 40)
        pairs = sorted(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    (rng.randrange(n_nodes), rng.randrange(n_nodes))
                    for _ in range(n_edges)
                )
                if a != b
            }
        )
        if not pairs:
            continue
        qualities = [rng.randint(0, 50) for _ in range(n_nodes)]
        pdf = spark.createDataFrame(pairs, ["doc_a", "doc_b"])
        nodes = sorted({n for p in pairs for n in p})
        qdf = spark.createDataFrame(
            [(n, qualities[n]) for n in nodes], ["doc_id", "n_chars"]
        )
        rows = {r.doc_id: r for r in survivor_pick(pdf, qdf).collect()}

        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            parent[find(a)] = find(b)
        comps = {}
        for n in nodes:
            comps.setdefault(find(n), []).append(n)
        for members in comps.values():
            best = max(members, key=lambda n: (qualities[n], -n))
            assert rows[best].kept == 1, (trial, members, best)
