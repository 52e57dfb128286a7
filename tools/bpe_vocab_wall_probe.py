"""Does the BPE training path scale in VOCABULARY, not corpus?
(Round-19 companion to the scale_smoke density legs — those held the
word alphabet fixed, so x16 corpus left the vocab byte-identical and
every BPE stage read flat.  This probe varies the two axes separately.)

The module docstring's 100 TB claim is: ``word_freqs`` collapses the
corpus at a map-side-combinable groupBy (linear in rows, the only
corpus-sized stage), and every later stage — pair explode, argmax,
rewrite — is linear in VOCAB (Heaps' law: ~O(corpus^0.5) for natural
text).  Two measured legs:

* **vocab leg** — synthetic ``(w, freq)`` vocab frames built directly
  (no corpus, isolating the post-collapse stages) at V ∈ {1e4, 1e5,
  1e6} distinct 8-char words; measure one full pair-stats + argmax
  round.  Expected: ~linear in V once past fixed overhead.
* **corpus leg** — raw word frames at fixed V = 1e5 and N ∈ {20M,
  80M} rows; measure ``word_freqs`` alone.  Expected: ~linear in N
  (map-side combine; shuffle stays V-sized).

Words are ``translate(md5-hex-prefix)`` → 8 chars drawn from [a-p]:
deterministic, letter-only (the splitter's [a-z] alphabet), uniform.

Usage::

    python tools/bpe_vocab_wall_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import functions as F

    from pulsar_message_filter_spark.operators.bpe import pair_counts
    from pulsar_message_filter_spark.session import get_spark

    spark = get_spark("pmf-bpe-vocab-probe")

    def word(col):
        return F.translate(
            F.substring(F.md5(col.cast("string")), 1, 8),
            "0123456789",
            "ghijklmnop",
        )

    out = {"vocab_leg": [], "corpus_leg": []}

    # --- vocab leg: post-collapse stages vs V, freq mass fixed ---
    for v in (10_000, 100_000, 1_000_000, 10_000_000):
        vocab = spark.range(v).select(
            word(F.col("id")).alias("w"),
            F.lit(max(1, 20_000_000 // v)).cast("long").alias("freq"),
        )
        # one training round = pair stats + argmax (the per-round cost)
        def round_once():
            t0 = time.time()
            pair_counts(vocab).orderBy(
                F.desc("pair_count"), F.asc("pair")
            ).limit(1).collect()
            return time.time() - t0

        round_once()  # warm
        sec = round(min(round_once(), round_once()), 3)
        out["vocab_leg"].append({"V": v, "round_sec": sec})
        print(f"vocab leg V={v:>9,}: {sec}s", file=sys.stderr)

    # --- corpus leg: word_freqs vs N, V fixed at 1e5 ---
    for n in (20_000_000, 80_000_000):
        words = spark.range(n).select(word(F.col("id") % 100_000).alias("w"))

        def collapse():
            t0 = time.time()
            words.groupBy("w").agg(F.count("*").alias("freq")).write.format(
                "noop"
            ).mode("overwrite").save()
            return time.time() - t0

        collapse()  # warm
        sec = round(min(collapse(), collapse()), 3)
        out["corpus_leg"].append({"N": n, "collapse_sec": sec})
        print(f"corpus leg N={n:>11,}: {sec}s", file=sys.stderr)

    import math

    v1, v2 = out["vocab_leg"][0]["round_sec"], out["vocab_leg"][-1]["round_sec"]
    out["vocab_exponent_1e4_to_1e6"] = round(math.log(v2 / v1) / math.log(100), 2)
    c1, c2 = out["corpus_leg"][0]["collapse_sec"], out["corpus_leg"][-1]["collapse_sec"]
    out["corpus_exponent_x4"] = round(math.log(c2 / c1) / math.log(4), 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
