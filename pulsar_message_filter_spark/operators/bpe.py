"""Byte-pair-encoding vocabulary induction — the statistics side of
tokenizer training (Sennrich, Haddow & Birch '16, public paper), run as
relational queries over the ``documents`` corpus.

The reference snapshot ships no code (SURVEY.md §0); the binding spec's
LLM-data-pipeline brief names "token counting (whitespace + a BPE-ish
regex)" — ``text.py`` covers the *counting* half, this module covers the
*training* half: pair statistics, greedy merge rounds, and corpus
encoding with the learned merges.

Relationship to earlier graded queries (deliberate, not duplication):
``f53_bpe_pair_merges`` (ngrams.py) grades ROUND-ONE pair stats under a
whitespace tokenizer and explicitly defers the trainer loop ("a full BPE
trainer loops argmax-merge N times on the driver") — this module IS that
trainer, with its own normalizing tokenizer (``lower`` + ``[^a-z]+``
split, required so the merge/rewrite chain and its oracle share one
alphabet).  ``f55_vocab_coverage`` (lm.py) sizes a WORD vocabulary by
frequency coverage; ``vocab_oov_rate`` here grades the per-source OOV
consequence of such a cut.

Scale notes (100 TB):

* **The corpus collapses to the vocabulary at the first aggregation.**
  ``word_freqs`` is a map-side-combinable groupBy on the word string;
  everything after it — pair explode, merge selection, merge
  application, encoding — runs over VOCAB rows (Heaps' law: vocab grows
  ~O(corpus^0.5); a 100 TB web corpus has ~1e8 distinct words, i.e. a
  few GB of state cluster-wide, while the corpus itself never gets
  re-scanned).  This is the same collapse discipline as drift.py's KS
  (group-on-value first).
* **One driver round-trip per merge round, one ROW per trip.**  The
  greedy argmax pair is a ``LIMIT 1`` over the pair aggregate —
  bounded-collect class (the repo's documented contract for driver
  materialization).  R merge rounds = R vocab-sized shuffles + R
  single-row collects; no corpus scan after round 0.
* **Merge application is a scan-side ``replace``** (no join, no UDF):
  each learned pair is rewritten to a fresh private-use-area codepoint
  (U+E000..), so the "1 character = 1 symbol" invariant holds across
  rounds and the next round's pair statistics are again a plain
  adjacent-character explode.  Both engines' ``replace`` is greedy
  left-to-right non-overlapping — exactly BPE's merge procedure —
  probed cross-engine before this module landed ('aaa' + pair 'aa' →
  ['aa','a'] in both).

Oracle notes: placeholder codepoints are embedded in the SQL text as
literal UTF-8 (the e2g unicode-fold work established codepoint-exact
parity for 3-byte chars); DuckDB ``sum(BIGINT)`` → HUGEINT is cast back
to BIGINT; the compression ratio is graded in exact integer math
(``chars * 1e6 div tokens``) so no float rounding rule is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pulsar_message_filter_spark.io import load
from pulsar_message_filter_spark.registry import graded

#: Number of greedy merge rounds the graded queries run.  Kept small so
#: the oracle (one nested CTE block per round) stays readable; the Spark
#: loop itself takes any R.
BPE_ROUNDS = 4

#: Fresh symbols for merged pairs: private-use-area codepoints that can
#: never appear in the [a-z] word alphabet, so "1 char = 1 symbol" holds
#: after every merge and replace() can never false-match corpus text.
_PLACEHOLDERS = [chr(0xE000 + i) for i in range(BPE_ROUNDS)]

#: Shared oracle fragment: word-frequency vocabulary from ``documents``.
_VOCAB_SQL = """
        words AS (
            SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
            FROM documents
        ),
        v0 AS (
            SELECT w, CAST(count(*) AS BIGINT) AS freq
            FROM words WHERE w <> '' GROUP BY 1
        )
"""


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``(w, freq)`` word-frequency vocabulary: lowercased ``[a-z]+``
    runs of ``text_col``.  The ONLY corpus-sized stage in this module —
    map-side combinable, collapses the corpus to its vocabulary."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )


def pair_counts(vocab: DataFrame) -> DataFrame:
    """``(pair, pair_count)`` — adjacent-symbol pair statistics over a
    ``(w, freq)`` vocabulary, weighted by word frequency.  One explode +
    one combinable groupBy over VOCAB rows (never the corpus).

    The ``length >= 2`` guard is load-bearing: Spark's
    ``sequence(1, 0)`` yields the DESCENDING list ``[1, 0]``, not an
    empty one, so 1-symbol words must be filtered before the transform.
    """
    return (
        vocab.filter(F.length("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w)-1),"
                    " i -> substring(w, i, 2))"
                )
            ).alias("pair"),
            "freq",
        )
        .groupBy("pair")
        .agg(F.sum("freq").alias("pair_count"))
    )


def bpe_train(
    vocab: DataFrame, rounds: int = BPE_ROUNDS
) -> tuple[list[tuple[str, int]], DataFrame]:
    """Greedy BPE training: ``rounds`` iterations of (pair stats →
    argmax → rewrite).  Returns the learned merges ``[(pair, count)]``
    (symbols still in placeholder form) and the final rewritten vocab.

    Ties break by pair string ascending (binary codepoint order — the
    same rule the oracle's ``ORDER BY c DESC, pair`` applies), so the
    merge sequence is deterministic across engines and partitionings.
    Each iteration collects exactly ONE row (bounded-collect class);
    the vocab is localCheckpointed once so the R rewrite projections
    don't re-run the corpus-collapsing aggregation per round.
    """
    if rounds > len(_PLACEHOLDERS):
        raise ValueError(f"rounds > {len(_PLACEHOLDERS)} placeholders")
    cur = vocab.localCheckpoint(eager=False)
    merges: list[tuple[str, int]] = []
    for r in range(rounds):
        best = (
            pair_counts(cur)
            .orderBy(F.desc("pair_count"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        pair, cnt = best[0].pair, best[0].pair_count
        merges.append((pair, int(cnt)))
        cur = cur.withColumn(
            "w", F.replace(F.col("w"), F.lit(pair), F.lit(_PLACEHOLDERS[r]))
        )
    return merges, cur


def expand_symbol(sym: str, merges: list[tuple[str, int]]) -> str:
    """Human-readable form of a (possibly placeholder) symbol: expand
    placeholders high-round-first so nested merges unfold fully."""
    for r in range(len(merges) - 1, -1, -1):
        sym = sym.replace(_PLACEHOLDERS[r], merges[r][0])
    return sym


def _expand_sql(col: str, upto_round: int) -> str:
    """Oracle twin of :func:`expand_symbol`: a reverse-order replace
    chain substituting each placeholder with its (already expandable)
    pair via scalar subqueries on the per-round ``b{r}`` CTEs."""
    expr = col
    for r in range(upto_round, 0, -1):
        expr = f"replace({expr}, '{_PLACEHOLDERS[r - 1]}', (SELECT pair FROM b{r}))"
    # the inserted pair text may itself contain lower placeholders; the
    # chain above already runs strictly high->low, so apply it TWICE is
    # not needed -- each b{r}.pair only contains placeholders < r, and
    # those are replaced by the remaining (lower) links of the chain.
    return expr


def _rounds_sql() -> str:
    """CTE chain for ``BPE_ROUNDS`` greedy rounds over the oracle vocab:
    c{r} = pair stats, b{r} = argmax pair, v{r} = rewritten vocab."""
    parts = []
    for r in range(1, BPE_ROUNDS + 1):
        prev = f"v{r - 1}"
        parts.append(
            f"""
        c{r} AS (
            SELECT unnest(list_transform(generate_series(1, length(w)-1),
                          i -> substr(w, i, 2))) AS pair, freq
            FROM {prev} WHERE length(w) >= 2
        ),
        b{r} AS (
            SELECT pair, CAST(sum(freq) AS BIGINT) AS c
            FROM c{r} GROUP BY 1 ORDER BY c DESC, pair LIMIT 1
        ),
        v{r} AS (
            -- coalesce: if merges exhaust before round {r} (degenerate
            -- corpus, no adjacent pairs left), b{r} is empty and the
            -- scalar subquery is NULL; replace(w, NULL, ..) would NULL
            -- the whole vocab.  The fallback is a control-char pair that
            -- can never occur in an [a-z]+placeholder alphabet, so the
            -- rewrite is a no-op and later rounds/stats flow unchanged —
            -- matching the Spark loop's early break exactly.
            SELECT replace(w, coalesce((SELECT pair FROM b{r}),
                                       chr(1) || chr(2)),
                           '{_PLACEHOLDERS[r - 1]}') AS w, freq
            FROM {prev}
        )"""
        )
    return ",".join(parts)


def _encode_sql(col: str) -> str:
    """Oracle encode chain: apply the learned merges IN ORDER (round 1
    first — later merges may reference earlier placeholders) with the
    same exhaustion hardening as the ``v{r}`` chain."""
    expr = col
    for r in range(1, BPE_ROUNDS + 1):
        expr = (
            f"replace({expr}, coalesce((SELECT pair FROM b{r}), "
            f"chr(1) || chr(2)), '{_PLACEHOLDERS[r - 1]}')"
        )
    return expr


@graded(
    "bpe_pair_counts",
    oracle=f"""
        WITH {_VOCAB_SQL},
        pairs AS (
            SELECT unnest(list_transform(generate_series(1, length(w)-1),
                          i -> substr(w, i, 2))) AS pair, freq
            FROM v0 WHERE length(w) >= 2
        ),
        agg AS (
            SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_count
            FROM pairs GROUP BY 1
        )
        SELECT * FROM (
            SELECT CAST(row_number() OVER (ORDER BY pair_count DESC, pair)
                        AS BIGINT) AS rk,
                   pair, pair_count
            FROM agg
        ) WHERE rk <= 40
    """,
    section="F15,F6,F8,C11,F14",
    description="BPE training statistics, round 1: frequency-weighted "
    "adjacent-character pair counts over the word-frequency vocabulary "
    "(corpus collapses to vocab at the first combinable groupBy; pair "
    "explode runs over vocab rows only), top-40 with deterministic "
    "rank tie-break",
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE iteration's pair statistics — the exact argmax table
    tokenizer training reads.  Plan shape: corpus scan → combinable
    word count → vocab-sized explode + combinable pair sum → top-40
    (TakeOrderedAndProject, no global sort)."""
    docs = load(spark, "documents", sf_dir)
    pc = pair_counts(word_freqs(docs))
    # top-40 via TakeOrderedAndProject FIRST, then rank the bounded
    # 40-row frame — the global row_number window never sees more than
    # 40 rows (vs ranking the full pair aggregate single-partition)
    top = pc.orderBy(F.desc("pair_count"), F.asc("pair")).limit(40)
    w = Window.orderBy(F.desc("pair_count"), F.asc("pair"))
    return top.select(
        F.row_number().over(w).cast("long").alias("rk"), "pair", "pair_count"
    )


@graded(
    "bpe_merge_rounds",
    oracle=f"""
        WITH {_VOCAB_SQL},
        {_rounds_sql()}
        SELECT * FROM (
    """
    + "\n            UNION ALL\n".join(
        f"""
            SELECT CAST({r} AS BIGINT) AS round,
                   {_expand_sql(f"substr(pair, 1, 1)", r - 1)} AS left_sym,
                   {_expand_sql(f"substr(pair, 2, 1)", r - 1)} AS right_sym,
                   c AS merge_count
            FROM b{r}"""
        for r in range(1, BPE_ROUNDS + 1)
    )
    + """
        ) ORDER BY round
    """,
    section="F15,F6,F14",
    description=f"BPE greedy merge schedule: {BPE_ROUNDS} rounds of "
    "(vocab-sized pair stats -> argmax -> scan-side placeholder "
    "rewrite), each round ONE collected row; merged symbols expanded "
    "back to readable form on both engines via the same reverse-order "
    "replace chain",
)
def bpe_merge_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table — what a tokenizer trainer persists.

    The distributed work is the per-round pair aggregation over VOCAB
    rows; only the argmax row crosses to the driver each round
    (bounded-collect class), so the output frame is built from
    ``BPE_ROUNDS`` literal rows.  Symbol expansion happens driver-side
    from the collected merges; the oracle performs the identical
    expansion with a reverse-order replace chain over its per-round
    argmax CTEs."""
    docs = load(spark, "documents", sf_dir)
    merges, _ = bpe_train(word_freqs(docs))
    rows = [
        (
            r + 1,
            expand_symbol(pair[0], merges[:r]),
            expand_symbol(pair[1], merges[:r]),
            cnt,
        )
        for r, (pair, cnt) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "round long, left_sym string, right_sym string, merge_count long"
    ).orderBy("round")


@graded(
    "bpe_encode_corpus",
    oracle=f"""
        WITH {_VOCAB_SQL},
        {_rounds_sql()},
        stats0 AS (
            SELECT CAST(count(*) AS BIGINT) AS n_vocab,
                   CAST(sum(freq) AS BIGINT) AS total_words,
                   CAST(sum(freq * length(w)) AS BIGINT) AS total_chars
            FROM v0
        ),
        stats{BPE_ROUNDS} AS (
            SELECT CAST(sum(freq * length(w)) AS BIGINT) AS total_tokens
            FROM v{BPE_ROUNDS}
        )
        SELECT n_vocab, total_words, total_chars, total_tokens,
               total_chars - total_tokens AS tokens_saved,
               total_chars * 1000000 // total_tokens AS chars_per_token_ppm
        FROM stats0 CROSS JOIN stats{BPE_ROUNDS}
    """,
    section="F15,F6,C11,F14",
    description=f"BPE encode with the learned {BPE_ROUNDS}-merge table: "
    "corpus token count before/after at character-symbol level, "
    "compression graded in exact integer math (chars*1e6 div tokens) "
    "so no float rounding rule applies",
)
def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-encode in one plan: the merge loop's final vocab IS
    the encoded form (placeholder chars = one token each), so token
    totals are frequency-weighted length sums over vocab rows.  The
    corpus is scanned exactly once (inside ``word_freqs``)."""
    docs = load(spark, "documents", sf_dir)
    vocab = word_freqs(docs).localCheckpoint(eager=False)
    _, encoded = bpe_train(vocab)
    stats0 = vocab.agg(
        F.count("*").alias("n_vocab"),
        F.sum("freq").alias("total_words"),
        F.sum(F.col("freq") * F.length("w")).alias("total_chars"),
    )
    stats_r = encoded.agg(
        F.sum(F.col("freq") * F.length("w")).alias("total_tokens")
    )
    return stats0.crossJoin(stats_r).select(
        "n_vocab",
        "total_words",
        "total_chars",
        "total_tokens",
        (F.col("total_chars") - F.col("total_tokens")).alias("tokens_saved"),
        F.expr("total_chars * 1000000 div total_tokens").alias(
            "chars_per_token_ppm"
        ),
    )


@graded(
    "bpe_tokens_by_source",
    oracle=f"""
        WITH {_VOCAB_SQL},
        {_rounds_sql()},
        src_words AS (
            SELECT source,
                   unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
            FROM documents
        ),
        src_vocab AS (
            SELECT source, w, CAST(count(*) AS BIGINT) AS freq
            FROM src_words WHERE w <> '' GROUP BY 1, 2
        ),
        enc AS (
            SELECT source, freq, length(w) AS chars,
                   length({_encode_sql("w")}) AS toks
            FROM src_vocab
        )
        SELECT source,
               CAST(sum(freq) AS BIGINT) AS total_words,
               CAST(sum(freq * chars) AS BIGINT) AS total_chars,
               CAST(sum(freq * toks) AS BIGINT) AS total_tokens,
               CAST(sum(freq * chars) * 1000000 // sum(freq * toks)
                    AS BIGINT) AS chars_per_token_ppm
        FROM enc GROUP BY 1
    """,
    section="F15,F6,F11,C11,F14",
    description="per-source token accounting with the learned BPE "
    "merges — the number a mixture/token-budget pass consumes (ties "
    "tokenizer training to curation): global merges applied to the "
    "per-source vocabulary, totals and compression per source in exact "
    "integer math",
)
def bpe_tokens_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token totals per data source under the globally-trained merges.

    Scale shape: merges train once on the GLOBAL vocab (bounded
    collects); the per-source pass is one corpus-collapsing
    ``groupBy(source, w)`` count followed by scan-side replaces and a
    k-row final aggregate — sources × vocab rows, never data-sized,
    after the one corpus scan."""
    docs = load(spark, "documents", sf_dir)
    merges, _ = bpe_train(word_freqs(docs))
    src_vocab = (
        docs.select(
            "source",
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w"),
        )
        .filter(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count("*").alias("freq"))
    )
    enc = F.col("w")
    for r, (pair, _cnt) in enumerate(merges):
        enc = F.replace(enc, F.lit(pair), F.lit(_PLACEHOLDERS[r]))
    return (
        src_vocab.withColumn("toks", F.length(enc))
        .groupBy("source")
        .agg(
            F.sum("freq").alias("total_words"),
            F.sum(F.col("freq") * F.length("w")).alias("total_chars"),
            F.sum(F.col("freq") * F.col("toks")).alias("total_tokens"),
        )
        .select(
            "source",
            "total_words",
            "total_chars",
            "total_tokens",
            F.expr(
                "total_chars * 1000000 div total_tokens"
            ).alias("chars_per_token_ppm"),
        )
    )


@graded(
    "vocab_oov_rate",
    oracle=f"""
        WITH {_VOCAB_SQL},
        topk AS (
            SELECT w FROM v0 ORDER BY freq DESC, w LIMIT 20
        ),
        src_words AS (
            SELECT source,
                   unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
            FROM documents
        ),
        marked AS (
            SELECT s.source, s.w,
                   CASE WHEN t.w IS NULL THEN 1 ELSE 0 END AS oov
            FROM src_words s LEFT JOIN topk t USING (w)
            WHERE s.w <> ''
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(oov) AS BIGINT) AS n_oov,
               CAST(sum(oov) AS BIGINT) * 1000000 // count(*) AS oov_ppm
        FROM marked GROUP BY 1
    """,
    section="F15,F6,C6,C8,F14",
    description="tokenizer-coverage eval: per-source out-of-vocabulary "
    "word rate against the global top-20 frequency vocabulary "
    "(deterministic tie-break) — broadcast membership join, exact "
    "integer ppm",
)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source OOV rate vs the top-K global vocabulary.

    Scale shape: top-K via TakeOrderedAndProject over the collapsed
    vocab, broadcast onto the per-(source, word) count frame (vocab ×
    sources rows — the corpus is scanned once, in the counts); the OOV
    mark is a broadcast LEFT join, never a shuffle of word strings."""
    docs = load(spark, "documents", sf_dir)
    vocab = word_freqs(docs)
    topk = vocab.orderBy(F.desc("freq"), F.asc("w")).limit(20).select("w")
    src_counts = (
        docs.select(
            "source",
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("w"),
        )
        .filter(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count("*").alias("freq"))
    )
    marked = src_counts.join(
        F.broadcast(topk.withColumn("in_vocab", F.lit(1))), "w", "left"
    )
    return (
        marked.groupBy("source")
        .agg(
            F.sum("freq").alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), F.col("freq")).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            "source",
            "n_tokens",
            "n_oov",
            F.expr("n_oov * 1000000 div n_tokens").alias("oov_ppm"),
        )
    )
