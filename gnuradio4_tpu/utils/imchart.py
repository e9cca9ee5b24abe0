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

    def render(self, *, color: bool = True) -> str:
        lines = []
        for r in range(self.height):
            chars = []
            for c in range(self.width):
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
        self.datasets: list[tuple[str, np.ndarray, np.ndarray]] = []

    def plot(self, y: Sequence[float], x: Sequence[float] | None = None,
             label: str = "") -> "ImChart":
        y = np.asarray(y, dtype=np.float64).ravel()
        x = np.arange(len(y), dtype=np.float64) if x is None \
            else np.asarray(x, dtype=np.float64).ravel()
        self.datasets.append((label, x, y))
        return self

    def render(self, *, color: bool = True) -> str:
        if not self.datasets:
            return "(empty chart)"
        self.canvas.clear()
        all_x = np.concatenate([x for _, x, _ in self.datasets])
        all_y = np.concatenate([y for _, _, y in self.datasets])
        fin = np.isfinite(all_y)
        x0, x1 = float(np.min(all_x)), float(np.max(all_x))
        y0 = float(np.min(all_y[fin])) if fin.any() else 0.0
        y1 = float(np.max(all_y[fin])) if fin.any() else 1.0
        if x1 == x0:
            x1 = x0 + 1
        if y1 == y0:
            y1 = y0 + 1
        w_dots = 2 * self.canvas.width
        h_dots = 4 * self.canvas.height
        for ci, (_, x, y) in enumerate(self.datasets):
            px = (x - x0) / (x1 - x0) * (w_dots - 1)
            py = (y - y0) / (y1 - y0) * (h_dots - 1)
            # draw with linear interpolation between consecutive points
            for i in range(len(px) - 1):
                if not (np.isfinite(py[i]) and np.isfinite(py[i + 1])):
                    continue
                steps = max(1, int(abs(px[i + 1] - px[i])),
                            int(abs(py[i + 1] - py[i])))
                for s in range(steps + 1):
                    t = s / steps
                    self.canvas.dot(px[i] + t * (px[i + 1] - px[i]),
                                    py[i] + t * (py[i + 1] - py[i]), ci)
        body = self.canvas.render(color=color)
        # axes annotation
        top = f"{_nice_num(y1):>10s} ┤"
        bot = f"{_nice_num(y0):>10s} ┤"
        lines = body.split("\n")
        out = []
        for i, ln in enumerate(lines):
            prefix = top if i == 0 else bot if i == len(lines) - 1 else " " * 11 + "│"
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
            for i, (lbl, _, _) in enumerate(self.datasets) if lbl or True)
        if any(lbl for lbl, _, _ in self.datasets):
            out.append(" " * 12 + legend)
        if self.x_label:
            out.append(" " * 12 + self.x_label)
        return "\n".join(out)


def quick_plot(y, x=None, *, width=78, height=14, label="", color=False) -> str:
    return ImChart(width, height).plot(y, x, label=label).render(color=color)
