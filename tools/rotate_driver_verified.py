"""Print the updated ``_DRIVER_VERIFIED`` set after a driver correctness run.

Round protocol (TODO.md): the driver grades only the FIRST 50 entries of
``queries()`` per round, so ``registry.all_graded()`` orders
not-yet-verified queries first.  At the start of each round, run::

    python tools/rotate_driver_verified.py CORRECTNESS_r03.json

and paste the emitted frozensets into ``registry._DRIVER_VERIFIED`` /
``registry._LOCALLY_VERIFIED`` (names graded by the driver move out of
the locally-verified set so provenance stays explicit).  Only hash-green
rows (or rows-only rows with matching counts) rotate in; rows with
``err`` stay unverified so they surface first again.
"""

from __future__ import annotations

import json
import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    from pulsar_message_filter_spark.registry import (
        _DRIVER_VERIFIED,
        _LOCALLY_VERIFIED,
    )

    verified = set(_DRIVER_VERIFIED)
    local = set(_LOCALLY_VERIFIED)
    newly, failed = [], []
    for path in sys.argv[1:]:
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            ok_hash = row.get("hash_match") is True
            ok_rows_only = row.get("err") == "no_oracle" and row.get("spark_rows", 0) >= 0
            if ok_hash or ok_rows_only:
                if name not in verified:
                    newly.append(name)
                verified.add(name)
            elif row.get("err") or row.get("hash_match") is False:
                failed.append((name, row.get("err") or "hash_mismatch"))

    print(f"# newly verified: {len(newly)}")
    for n in sorted(newly):
        print(f"#   + {n}")
    if failed:
        print(f"# ATTENTION — {len(failed)} rows did NOT verify (fix before rotating):")
        for n, e in failed:
            print(f"#   ! {n}: {e}")
    local -= verified
    for title, names in (("_DRIVER_VERIFIED", verified), ("_LOCALLY_VERIFIED", local)):
        body = ", ".join(f'"{n}"' for n in sorted(names))
        print(f"{title} = frozenset(")
        print(textwrap.fill("{" + body + "}", width=76, initial_indent="    ", subsequent_indent="    "))
        print(")")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
