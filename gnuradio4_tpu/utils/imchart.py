"""Terminal (ANSI/Braille) plotting — ≈ reference algorithm ImCanvas.hpp /
ImChart.hpp (the prototype's UI): XY line charts rendered as Unicode braille
dots with axes, labels and multiple datasets.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np

_BRAILLE_BASE = 0x2800
# braille dot bit for (col 0-1, row 0-3) within a 2×4 cell
_DOT_BITS = [[0x01, 0x08], [0x02, 0x10], [0x04, 0x20], [0x40, 0x80]]

_COLORS = ["\x1b[36m", "\x1b[33m", "\x1b[35m", "\x1b[32m", "\x1b[31m",
           "\x1b[34m"]
_RESET = "\x1b[0m"


class ImCanvas:
    """Braille dot canvas: width×height in character cells (2×4 dots each)."""

    def __init__(self, width: int = 80, height: int = 20):
        self.width = width
        self.height = height
        self._cells = np.zeros((height, width), dtype=np.uint32)
        self._colors = np.zeros((height, width), dtype=np.int8)

    def clear(self) -> None:
        self._cells[:] = 0
        self._colors[:] = 0

    def dot(self, x: float, y: float, color: int = 0) -> None:
        """Plot a dot in dot-coordinates: x ∈ [0, 2·width), y ∈ [0, 4·height),
        y=0 at the bottom."""
        xi, yi = int(x), int(y)
        if not (0 <= xi < 2 * self.width and 0 <= yi < 4 * self.height):
            return
        row = self.height - 1 - yi // 4
        col = xi // 2
        self._cells[row, col] |= _DOT_BITS[3 - yi % 4][xi % 2]
        self._colors[row, col] = color + 1

    def line(self, x0: float, y0: float, x1: float, y1: float,
             color: int = 0) -> None:
        """Dot-resolution line segment (interpolated; ≈ ImCanvas drawLine)."""
        steps = max(1, int(abs(x1 - x0)), int(abs(y1 - y0)))
        for s in range(steps + 1):
            t = s / steps
            self.dot(x0 + t * (x1 - x0), y0 + t * (y1 - y0), color)

    def hline(self, y: float, color: int = 0) -> None:
        self.line(0, y, 2 * self.width - 1, y, color)

    def vline(self, x: float, color: int = 0) -> None:
        self.line(x, 0, x, 4 * self.height - 1, color)

    def text(self, row: int, col: int, s: str) -> None:
        """Character-cell text overlay (≈ ImCanvas drawText); overwrites dots."""
        if not hasattr(self, "_texts"):
            self._texts: dict[tuple[int, int], str] = {}
        for i, ch in enumerate(s):
            if 0 <= row < self.height and 0 <= col + i < self.width:
                self._texts[(row, col + i)] = ch

    def render(self, *, color: bool = True) -> str:
        texts = getattr(self, "_texts", {})
        lines = []
        for r in range(self.height):
            chars = []
            for c in range(self.width):
                if (r, c) in texts:
                    chars.append(texts[(r, c)])
                    continue
                bits = int(self._cells[r, c])
                ch = chr(_BRAILLE_BASE + bits) if bits else " "
                if color and bits and self._colors[r, c] > 0:
                    ch = _COLORS[(self._colors[r, c] - 1) % len(_COLORS)] + ch \
                        + _RESET
                chars.append(ch)
            lines.append("".join(chars))
        return "\n".join(lines)


def _nice_num(v: float) -> str:
    if v == 0:
        return "0"
    if abs(v) >= 1e4 or abs(v) < 1e-3:
        return f"{v:.2e}"
    return f"{v:.4g}"


class ImChart:
    """XY chart over an ImCanvas with axes + legends (≈ ImChart.hpp)."""

    def __init__(self, width: int = 80, height: int = 16, *,
                 x_label: str = "", y_label: str = ""):
        self.canvas = ImCanvas(width, height)
        self.x_label = x_label
        self.y_label = y_label
        self.datasets: list[tuple[str, np.ndarray, np.ndarray, str]] = []

    def plot(self, y: Sequence[float], x: Sequence[float] | None = None,
             label: str = "", style: str = "line") -> "ImChart":
        """Add a dataset. ``style``: 'line' (interpolated), 'points'
        (scatter — constellations), 'bars' (vertical bars from the baseline —
        histograms/PSD bins); ≈ the reference's chart styles."""
        if style not in ("line", "points", "bars"):
            raise ValueError(f"unknown style {style!r}")
        y = np.asarray(y, dtype=np.float64).ravel()
        x = np.arange(len(y), dtype=np.float64) if x is None \
            else np.asarray(x, dtype=np.float64).ravel()
        self.datasets.append((label, x, y, style))
        return self

    def vmarker(self, x: float, label: str = "") -> "ImChart":
        """Vertical marker line at data-x (trigger/frequency markers)."""
        if not hasattr(self, "_vmarkers"):
            self._vmarkers: list[tuple[float, str]] = []
        self._vmarkers.append((float(x), label))
        return self

    def hmarker(self, y: float, label: str = "") -> "ImChart":
        """Horizontal marker line at data-y (thresholds)."""
        if not hasattr(self, "_hmarkers"):
            self._hmarkers: list[tuple[float, str]] = []
        self._hmarkers.append((float(y), label))
        return self

    def render(self, *, color: bool = True, y_ticks: int = 3) -> str:
        if not self.datasets:
            return "(empty chart)"
        self.canvas.clear()
        all_x = np.concatenate([d[1] for d in self.datasets])
        all_y = np.concatenate([d[2] for d in self.datasets])
        fin = np.isfinite(all_y)
        x0, x1 = float(np.min(all_x)), float(np.max(all_x))
        y0 = float(np.min(all_y[fin])) if fin.any() else 0.0
        y1 = float(np.max(all_y[fin])) if fin.any() else 1.0
        for ym, _ in getattr(self, "_hmarkers", ()):
            y0, y1 = min(y0, ym), max(y1, ym)
        if x1 == x0:
            x1 = x0 + 1
        if y1 == y0:
            y1 = y0 + 1
        w_dots = 2 * self.canvas.width
        h_dots = 4 * self.canvas.height

        def sx(x):
            return (x - x0) / (x1 - x0) * (w_dots - 1)

        def sy(y):
            return (y - y0) / (y1 - y0) * (h_dots - 1)

        for ci, (_, x, y, style) in enumerate(self.datasets):
            px, py = sx(x), sy(y)
            if style == "points":
                for i in range(len(px)):
                    if np.isfinite(py[i]):
                        self.canvas.dot(px[i], py[i], ci)
            elif style == "bars":
                base = sy(max(y0, min(0.0, y1)) if y0 <= 0.0 <= y1 else y0)
                for i in range(len(px)):
                    if np.isfinite(py[i]):
                        self.canvas.line(px[i], base, px[i], py[i], ci)
            else:
                for i in range(len(px) - 1):
                    if not (np.isfinite(py[i]) and np.isfinite(py[i + 1])):
                        continue
                    self.canvas.line(px[i], py[i], px[i + 1], py[i + 1], ci)
        marker_color = len(self.datasets)
        for xm, _ in getattr(self, "_vmarkers", ()):
            self.canvas.vline(sx(xm), marker_color)
        for ym, _ in getattr(self, "_hmarkers", ()):
            self.canvas.hline(sy(ym), marker_color)
        body = self.canvas.render(color=color)
        # axes annotation with intermediate ticks (≈ ImChart axis grid)
        lines = body.split("\n")
        n_rows = len(lines)
        tick_rows = {0: y1, n_rows - 1: y0}
        for k in range(1, max(0, y_ticks - 1)):
            r = round(k * (n_rows - 1) / max(1, y_ticks - 1))
            tick_rows.setdefault(r, y1 + (y0 - y1) * r / (n_rows - 1))
        out = []
        for i, ln in enumerate(lines):
            if i in tick_rows:
                prefix = f"{_nice_num(tick_rows[i]):>10s} ┤"
            else:
                prefix = " " * 11 + "│"
            out.append(prefix + ln)
        x_axis = " " * 11 + "└" + "─" * self.canvas.width
        labels = (f"{_nice_num(x0)}"
                  f"{' ' * max(1, self.canvas.width - len(_nice_num(x0)) - len(_nice_num(x1)))}"
                  f"{_nice_num(x1)}")
        out.append(x_axis)
        out.append(" " * 12 + labels)
        legend = "   ".join(
            (_COLORS[i % len(_COLORS)] if color else "") + "⣿ " + (lbl or f"set{i}")
            + (_RESET if color else "")
            for i, (lbl, _, _, _) in enumerate(self.datasets))
        if any(d[0] for d in self.datasets):
            out.append(" " * 12 + legend)
        if self.x_label:
            out.append(" " * 12 + self.x_label)
        return "\n".join(out)


def quick_plot(y, x=None, *, width=78, height=14, label="", color=False) -> str:
    return ImChart(width, height).plot(y, x, label=label).render(color=color)
