"""Named-test diagnosis of on-chip suite failures.

The curated tally (scripts/tpu_suite.py) runs each file with ``-x`` — a FAIL
row stops at the first failure and hides the name. This runner re-runs the
failing files WITHOUT ``-x`` and with ``-rf``, collecting the failed test
ids + short tracebacks into a JSON report for triage.

Usage: python scripts/tpu_diagnose.py [--files a.py,b.py] [--out FILE]
(defaults: the rc!=0 rows of docs/TPU_SUITE_TALLY.json)
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", default=None)
    ap.add_argument("--timeout", type=int, default=600)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.files:
        files = [f.strip() for f in args.files.split(",")]
    else:
        tally = json.load(open(os.path.join(HERE, "docs",
                                            "TPU_SUITE_TALLY.json")))
        files = [r["file"] for r in tally["rows"] if r.get("rc") != 0]
    report = {"date": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
              "note": "on-chip (GR4TPU_TEST_TPU=1) named-failure diagnosis, "
                      "fresh pytest process per file, no -x",
              "files": []}
    for f in files:
        try:
            r = subprocess.run(
                [sys.executable, "-m", "pytest", os.path.join("tests", f),
                 "-q", "-rf", "--no-header", "-p", "no:cacheprovider"],
                env={**os.environ, "GR4TPU_TEST_TPU": "1"},
                capture_output=True, text=True, cwd=HERE,
                timeout=args.timeout)
        except subprocess.TimeoutExpired:
            # a hung file (transport wedge / compile hang) must not lose the
            # rest of the diagnosis — record it and keep going
            rec = {"file": f, "rc": -1, "failed": [],
                   "summary": f"TIMEOUT after {args.timeout}s (transport "
                              f"wedge or compile hang)"}
            report["files"].append(rec)
            print(json.dumps(rec), flush=True)
            continue
        failed = re.findall(r"^FAILED (\S+)(?: - (.*))?$", r.stdout,
                            re.MULTILINE)
        tail = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        rec = {"file": f, "rc": r.returncode,
               "failed": [{"test": t, "reason": (why or "")[:300]}
                          for t, why in failed],
               "summary": tail}
        report["files"].append(rec)
        print(json.dumps(rec), flush=True)
    if args.out:
        json.dump(report, open(args.out, "w"), indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
