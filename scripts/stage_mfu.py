"""Slope-measured per-stage MFU / HBM fractions (VERDICT r3 item 1).

Reads sweep JSONL records (scripts/bench_sweep.py — readback-terminated
differential timing, so each ms_per_step is a measured slope, not an
analytic estimate) and combines them with the per-stage operation model to
print the roofline table for docs/PERFORMANCE.md:

  python scripts/stage_mfu.py .hunter/sweep.jsonl [...]

MFU fraction = measured MXU MAC rate / peak; HBM fraction = modeled stream
bytes at the measured rate / peak bandwidth. The BYTES model counts the
streams each stage must move through HBM (inputs once, outputs once,
materialized intermediates per the lowering actually used); MACs count the
dense banded/FFT work dispatched to the MXU including padding/pass
multiplicity (HIGH = 3 bf16 passes).
"""

from __future__ import annotations

import json
import sys

V5E_PEAK_BF16_MACS = 197e12 / 2.0      # MAC/s (2 FLOPs per MAC)
V5E_HBM_BPS = 819e9

# per-sample operation model of each sweep stage at 8 Mi complex64 samples.
# macs = bf16-pass MACs dispatched per input sample (dense, incl. the
# two-view split's 2x and the HIGH-precision 3x pass multiplicity where the
# stage uses it); bytes = HBM stream traffic per input sample under the
# lowering's materialization behavior (complex64 = 8 B, f32 = 4 B).
STAGE_MODEL = {
    # 4 rail dots x 2 views x 128 x 3 passes; rails materialize (r/i extract)
    "fir127[high]":     {"macs": 4 * 2 * 128 * 3 / 2, "bytes": 8 + 8 + 16},
    # interleaved: 2 dots x 2 views x 256 wide per 2 f32 outputs, 3 passes
    "fir127_ilv[high]": {"macs": 2 * 2 * 256 * 3 / 2, "bytes": 8 + 8},
    "xlate_old[high]":  {"macs": 8 * 2 * 128 * 3 / 2, "bytes": 8 + 8 + 16},
    "xlate_old_ilv[high]": {"macs": 2 * 2 * 256 * 3 / 2, "bytes": 8 + 8},
    "xlate_new[high]":  {"macs": 4 * 2 * 128 * 3 / 2, "bytes": 8 + 8 + 8 + 16},
    "audio_d8[high]":   {"macs": 2 * 702 / 8 * 3, "bytes": 4 + 4 / 8},
    "audio_d8[bf16]":   {"macs": 2 * 702 / 8, "bytes": 4 + 4 + 4 / 8},
    # FFT4096: 5 N log2 N real FLOPs/frame -> /2 as MAC-equivalents (VPU work,
    # shown for scale); bytes: read + write complex spectra, mag write f32
    "fft_hlo":          {"macs": 5 * 12 / 2, "bytes": 8 + 4},
    "fft_matmul[n1=64,high]": {"macs": (64 + 64) * 4 * 3, "bytes": 8 + 8 + 4},
    "fft_matmul[n1=64,bf16]": {"macs": (64 + 64) * 4, "bytes": 8 + 8 + 4},
    "tone_direct":      {"macs": 0, "bytes": 8},
    "tone_factored":    {"macs": 0, "bytes": 8},
    "tone_poly":        {"macs": 0, "bytes": 8},
    "nco_only[high]":   {"macs": 0, "bytes": 8 + 8 + 8 + 8},
    "quad_demod":       {"macs": 0, "bytes": 8 + 4},
}


def main() -> int:
    rows = []
    for path in sys.argv[1:]:
        for line in open(path):
            line = line.strip()
            if not line.startswith("{"):
                continue
            r = json.loads(line)
            if not r.get("verified") or r.get("platform") != "tpu":
                continue
            rows.append(r)
    seen = {}
    for r in rows:               # last measurement of each stage wins
        seen[r["name"]] = r
    print(f"| stage | ms/step | Msps | MXU MAC fraction | HBM fraction |")
    print(f"|---|---|---|---|---|")
    for name, r in seen.items():
        m = STAGE_MODEL.get(name)
        if m is None:
            continue
        sps = r["msps"] * 1e6
        mfu = sps * m["macs"] / V5E_PEAK_BF16_MACS
        hbm = sps * m["bytes"] / V5E_HBM_BPS
        print(f"| {name} | {r['ms_per_step']} | {r['msps']:.0f} "
              f"| {mfu * 100:.1f}% | {hbm * 100:.1f}% |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
