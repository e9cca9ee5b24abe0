"""Curated on-chip suite tally (VERDICT r3 item 5).

Runs a chip-safe subset of the test suite against the REAL TPU
(``GR4TPU_TEST_TPU=1`` — tests/conftest.py then keeps the axon backend), one
pytest process per file with a hard timeout (a wedged D2H must cost one file,
not the run), and writes a dated pass/fail table:

  python scripts/tpu_suite.py --out docs/TPU_SUITE_TALLY.json

Curation rules: files that exercise the device compute path with small
assertion readbacks. Excluded: multi-process tests (multihost, zeromq),
host-only subsystems (ring/native fileio, imchart/imgraph, scaffold, uri,
pmt, yaml, capture fuzz — pure NumPy/host logic the chip adds nothing to),
and the virtual-mesh suites that need 8 devices (mesh_scheduler, parallel,
collective_audit — covered by dryrun_multichip instead).
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import re
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# device-compute-path files, roughly cheapest first so a closing window still
# yields a prefix of results
FILES = [
    "test_fir_methods.py",
    "test_ops.py",
    "test_e2e_chain.py",
    "test_tag_semantics.py",
    "test_zombie.py",
    "test_scheduler.py",
    "test_graph.py",
    "test_feedback.py",
    "test_blocklen_invariance.py",
    "test_resample_channelize.py",
    "test_fm_receiver.py",
    "test_tag_accurate_settings.py",
    "test_step_batching.py",
    "test_steady_state.py",
    "test_async_delivery.py",
    "test_pallas_kernels.py",
    "test_device_vector_source.py",
    "test_dsp_extras.py",
    "test_math_golden.py",
    "test_signal_core_golden.py",
    "test_acceptance.py",
    "test_checkpoint_head.py",
    "test_scheduled_subgraph.py",
    "test_pipeline_stages.py",
    "test_uncertain_stream.py",
    "test_squelch.py",
    "test_channels.py",
    "test_equalizer.py",
    "test_ldpc.py",
    "test_polar.py",
    "test_golay_hamming.py",
    "test_examples.py",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(HERE, "docs",
                                                  "TPU_SUITE_TALLY.json"))
    ap.add_argument("--per-file-timeout", type=float, default=420.0)
    ap.add_argument("--deadline-s", type=float, default=3600.0)
    ap.add_argument("--files", default=None,
                    help="comma-separated override of the curated list")
    args = ap.parse_args()
    t_end = time.monotonic() + args.deadline_s
    files = args.files.split(",") if args.files else FILES
    rows = []
    env = {**os.environ, "GR4TPU_TEST_TPU": "1"}
    if os.environ.get("GR4_TALLY_FORCE_CPU") == "1":   # harness smoke tests
        env.pop("GR4TPU_TEST_TPU")
    for f in files:
        if time.monotonic() > t_end:
            rows.append({"file": f, "status": "SKIPPED (deadline)"})
            continue
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-m", "pytest", os.path.join("tests", f),
                 "-q", "-x", "--no-header", "-p", "no:cacheprovider"],
                cwd=HERE, env=env, capture_output=True, text=True,
                timeout=args.per_file_timeout)
            tail = (r.stdout.strip().splitlines() or ["?"])[-1]
            m = re.search(r"(\d+) passed", tail)
            fm = re.search(r"(\d+) failed", tail)
            row = {"file": f, "rc": r.returncode,
                   "passed": int(m.group(1)) if m else 0,
                   "failed": int(fm.group(1)) if fm else
                   (0 if r.returncode == 0 else None),
                   "seconds": round(time.time() - t0, 1),
                   "status": "PASS" if r.returncode == 0 else f"FAIL: {tail}"}
        except subprocess.TimeoutExpired:
            row = {"file": f, "status": "TIMEOUT (transport wedge)",
                   "seconds": round(time.time() - t0, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    n_pass = sum(r.get("passed", 0) for r in rows)
    ok_files = sum(1 for r in rows if r.get("status") == "PASS")
    payload = {
        "date": datetime.datetime.now(datetime.timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "platform_note": "real TPU via axon relay (GR4TPU_TEST_TPU=1), one "
                         "pytest process per file, per-file timeout "
                         f"{args.per_file_timeout:.0f}s",
        "files_pass": ok_files, "files_total": len(rows),
        "tests_passed": n_pass,
        "rows": rows,
    }
    with open(args.out, "w") as fp:
        json.dump(payload, fp, indent=1)
    print(f"# {ok_files}/{len(rows)} files green, {n_pass} tests passed — "
          f"wrote {args.out}", flush=True)
    return 0 if ok_files == len(rows) else 1


if __name__ == "__main__":
    sys.exit(main())
