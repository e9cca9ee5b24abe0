"""Merge freshly-hunted per-config rows into SUITE_r05.json.

Usage: python scripts/merge_suite.py ROW.json [ROW.json ...]
Each ROW.json is one result record (as written by the round-5 hunter,
``.hunter/r05b.sh``). A new row replaces the existing row for its config;
the artifact's date is refreshed and a ``history`` list keeps superseded
verified rows (measurement honesty: never silently discard a verified row).
"""

from __future__ import annotations

import datetime
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATH = os.path.join(HERE, "SUITE_r05.json")


def main() -> None:
    doc = json.load(open(PATH))
    rows = {r["config"]: r for r in doc["results"]}
    hist = doc.setdefault("history", [])
    for p in sys.argv[1:]:
        r = json.load(open(p))
        c = r["config"]
        old = rows.get(c)
        if old is not None and old.get("verified") \
                and old.get("msps") != r.get("msps"):
            hist.append(old)
        rows[c] = r
    doc["results"] = sorted(rows.values(),
                            key=lambda r: (len(str(r["config"])),
                                           str(r["config"])))
    doc["date"] = datetime.datetime.now(datetime.timezone.utc) \
        .strftime("%Y-%m-%dT%H:%M:%SZ")
    json.dump(doc, open(PATH, "w"), indent=1)
    n_ver = sum(bool(r.get("verified")) for r in doc["results"])
    print(f"merged {len(sys.argv) - 1} rows -> {PATH}: "
          f"{n_ver}/{len(doc['results'])} verified")


if __name__ == "__main__":
    main()
