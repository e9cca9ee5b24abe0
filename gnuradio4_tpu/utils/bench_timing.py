"""Shared differential-timing helpers for the bench harnesses.

The readback-terminated differential protocol (docs/PERFORMANCE.md) needs a
drift guard: a two-point slope in a flapping window produced
physically-impossible "verified" rows (SUITE_r05 first pass, 2026-08-20).
Every harness (bench.py, bench_suite._run/_run_sched, bench_sweep.measure)
uses THESE helpers so "verified" means the same thing everywhere.
"""

from __future__ import annotations

DRIFT_TOL = 0.4   # the two independent slopes must agree within 40%


def three_windows(lo: int, hi: int) -> tuple[int, int, int]:
    """Strictly-increasing (small, mid, big) window sizes from a requested
    range — degenerate requests (hi - lo < 2) are widened, never collapsed
    (a repeated point would divide by zero in the slope)."""
    lo = max(int(lo), 2)
    hi = max(int(hi), lo + 2)
    mid = max((lo + hi) // 2, lo + 1)
    if mid >= hi:
        mid = hi - 1
    return lo, mid, hi


def guarded_slope(pts: tuple[int, int, int], walls: dict[int, float],
                  tol: float = DRIFT_TOL) -> tuple[float | None, str]:
    """Per-step slope over three (count, wall) points with the drift guard.

    Returns ``(dt_per_step, "")`` when the two independent slopes are
    positive and agree within ``tol``, else ``(None, reason)``.
    """
    a, b, c = pts
    dt_a = (walls[b] - walls[a]) / (b - a)
    dt_b = (walls[c] - walls[b]) / (c - b)
    if dt_a <= 0 or dt_b <= 0:
        return None, (f"non-positive slope ({dt_a * 1e3:.3f} / "
                      f"{dt_b * 1e3:.3f} ms/step; walls {walls})")
    if abs(dt_a - dt_b) > tol * max(dt_a, dt_b):
        return None, (f"window drift: slopes {dt_a * 1e3:.3f} vs "
                      f"{dt_b * 1e3:.3f} ms/step disagree")
    return (walls[c] - walls[a]) / (c - a), ""
