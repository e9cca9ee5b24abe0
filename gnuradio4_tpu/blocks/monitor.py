"""ImChartMonitor — live terminal scope sink (≈ reference blocks/testing/
ImChartMonitor.hpp): renders incoming samples as a braille chart every
``refresh_every`` steps."""

from __future__ import annotations

import sys

import numpy as np

from ..core.block import Port, SinkBlock, UICategory
from ..core.registry import register_block
from ..core.settings import Setting
from ..utils.history import HistoryBuffer
from ..utils.imchart import ImChart


@register_block("ImChartMonitor")
class ImChartMonitor(SinkBlock):
    IN = (Port("in"),)
    UI_CATEGORY = UICategory.CONTENT
    window = Setting(default=2048, kind="static", limits=(16, 1 << 22))
    refresh_every = Setting(default=8, kind="static", limits=(1, 1 << 20))
    width = Setting(default=78, kind="static")
    height = Setting(default=14, kind="static")
    color = Setting(default=True, kind="static")
    stream = Setting(default="stderr", kind="static", choices=("stderr", "stdout",
                                                               "none"))

    def __init__(self, name=None, **settings):
        super().__init__(name=name, **settings)
        self._hist = HistoryBuffer(int(self.settings.get("window")),
                                   newest_first=False)
        self._n_consumed = 0
        self._renders = 0
        self.last_render = ""

    def consume(self, arrays, tags, n_valid, abs_index):
        x = arrays["in"][..., :n_valid]
        if x.ndim > 1:
            x = x[0]
        if np.iscomplexobj(x):
            x = np.abs(x)
        self._hist.push(x)
        self._n_consumed += 1
        if self._n_consumed % int(self.settings.get("refresh_every")):
            return
        chart = ImChart(int(self.settings.get("width")),
                        int(self.settings.get("height")))
        chart.plot(self._hist.view(), label=self.name)
        self.last_render = chart.render(color=bool(self.settings.get("color")))
        self._renders += 1
        dest = self.settings.get("stream")
        if dest == "stderr":
            print("\x1b[2J\x1b[H" + self.last_render, file=sys.stderr)
        elif dest == "stdout":
            print(self.last_render)

    def draw(self, config=None):
        """Drawable protocol: render the current history on demand."""
        if len(self._hist.view()) == 0:
            return None  # nothing consumed yet (e.g. dashboard's first frame)
        chart = ImChart(int(self.settings.get("width")),
                        int(self.settings.get("height")))
        chart.plot(self._hist.view(), label=self.name)
        self.last_render = chart.render(
            color=bool((config or {}).get("color",
                                          self.settings.get("color"))))
        return self.last_render
