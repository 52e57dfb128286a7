"""Regenerate ``registry._DRIVER_VERIFIED_ROUND`` from driver evidence.

Round protocol (TODO.md): the driver grades only the FIRST 50 entries of
``queries()`` per round, so ``registry.all_graded()`` orders
never-driver-graded queries first and — since round 9's evidence-freshness
policy — driver-verified names by STALEST evidence round first.  At the
start of each round, run::

    python tools/rotate_driver_verified.py CORRECTNESS_r*.json

and paste the emitted ``_DRIVER_VERIFIED_ROUND`` dict into
``registry.py`` (names graded by the driver move out of
``_LOCALLY_VERIFIED`` so provenance stays explicit).  Only hash-green rows
(or rows-only rows with recorded counts) earn an entry; a name whose
LATEST row has ``err``/``hash_match: false`` is dropped entirely so it
re-surfaces at the front of the window.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    from pulsar_message_filter_spark.registry import (
        _DRIVER_VERIFIED_ROUND,
        _LOCALLY_VERIFIED,
    )

    rounds: dict[str, int] = dict(_DRIVER_VERIFIED_ROUND)
    newly, failed = [], []
    for path in sorted(sys.argv[1:]):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            print(f"# skipping {path}: no round number in filename")
            continue
        rnum = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            ok_hash = row.get("hash_match") is True
            # Rows-only rows earn an entry only when the driver actually
            # RECORDED a positive row count — `.get(..., 0) >= 0` was
            # vacuously true for rows with the key missing (ADVICE r09).
            ok_rows_only = (
                row.get("err") == "no_oracle"
                and isinstance(row.get("spark_rows"), int)
                and row["spark_rows"] > 0
            )
            if ok_hash or ok_rows_only:
                if name not in rounds:
                    newly.append(name)
                rounds[name] = max(rounds.get(name, 0), rnum)
            elif row.get("err") or row.get("hash_match") is False:
                failed.append((name, rnum, row.get("err") or "hash_mismatch"))

    print(f"# newly verified: {len(newly)}")
    for n in sorted(newly):
        print(f"#   + {n}")
    if failed:
        print(f"# ATTENTION — {len(failed)} rows did NOT verify; their names")
        print("# are REMOVED below so they re-surface first (fix the query!):")
        for n, rnum, e in failed:
            print(f"#   ! {n} (r{rnum:02d}): {e}")
            # only drop if the failure is from the newest round seen for it
            if rounds.get(n, 0) <= rnum:
                rounds.pop(n, None)

    local = set(_LOCALLY_VERIFIED) - set(rounds)
    print("_DRIVER_VERIFIED_ROUND: dict[str, int] = {")
    for n in sorted(rounds):
        print(f'    "{n}": {rounds[n]},')
    print("}")
    body = ", ".join(f'"{n}"' for n in sorted(local))
    print(f"_LOCALLY_VERIFIED: frozenset = frozenset({{{body}}})"
          if local else "_LOCALLY_VERIFIED: frozenset = frozenset()")
    return 0


if __name__ == "__main__":
    sys.exit(main())
