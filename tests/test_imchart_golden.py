"""Golden mirrors of the reference's qa_ImChart.cpp / qa_ImCanvas.cpp:
axis-transform endpoint/roundtrip contracts, optimal tick placement
properties, chart styles (Braille/Bars/Marker), log axes, fixed boundaries,
mountain-range waterfall, and the 24-bit colour math."""

import numpy as np
import pytest

from gnuradio4_tpu.utils.imchart import (
    ImCanvas, ImChart, LinearAxisTransform, LogAxisTransform,
    optimal_tick_positions, interpolate_rgb, interpolate_hsv, rgb_to_hsv,
    hsv_to_rgb, to_hex_rgb, parse_hex_rgb, ansi_rgb, quick_plot)


class TestAxisTransforms:
    """≈ qa_ImChart.cpp LinearAxisTransform/LogAxisTransform suites."""

    def test_linear_endpoints_and_roundtrip(self):
        xmin, xmax, off, width = 10.0, 100.0, 5, 65
        assert LinearAxisTransform.to_screen(xmin, xmin, xmax, off, width) == off
        assert LinearAxisTransform.to_screen(xmax, xmin, xmax, off, width) \
            == width - 1
        for coord in range(off, width):
            v = LinearAxisTransform.from_screen(coord, xmin, xmax, off, width)
            back = LinearAxisTransform.to_screen(v, xmin, xmax, off, width)
            assert abs(back - coord) <= 2.2  # binning limited (qa_ImChart:26)

    def test_log_endpoints_and_roundtrip(self):
        xmin, xmax, off, width = 0.1, 10000.0, 5, 65
        assert LogAxisTransform.to_screen(xmin, xmin, xmax, off, width) == off
        assert LogAxisTransform.to_screen(xmax, xmin, xmax, off, width) \
            == width - 1
        for coord in range(off, width):
            v = LogAxisTransform.from_screen(coord, xmin, xmax, off, width)
            back = LogAxisTransform.to_screen(v, xmin, xmax, off, width)
            assert abs(back - coord) <= 2.2

    def test_log_throws_on_nonpositive(self):
        # qa_ImChart.cpp:48-52
        with pytest.raises(ValueError):
            LogAxisTransform.to_screen(0.0, 10.0, 100.0, 5, 65)
        with pytest.raises(ValueError):
            LogAxisTransform.to_screen(1.0, 0.0, 100.0, 5, 65)
        with pytest.raises(ValueError):
            LogAxisTransform.to_screen(1.0, 10.0, 0.0, 5, 65)
        with pytest.raises(ValueError):
            LogAxisTransform.from_screen(40, 0.0, 100.0, 5, 65)
        with pytest.raises(ValueError):
            LogAxisTransform.from_screen(40, 10.0, 0.0, 5, 65)


class TestOptimalTicks:
    """≈ qa_ImChart.cpp optimalTickScreenPositions suite (:56-74)."""

    @pytest.mark.parametrize("width", list(range(2, 130)))
    def test_properties(self, width):
        min_gap = 1
        ticks = optimal_tick_positions(width, min_gap)
        assert ticks, f"no ticks at width {width}"
        assert len(ticks) >= 2
        assert ticks[0] == 0
        assert ticks[-1] == width - 1
        gaps = np.diff(ticks)
        assert (gaps == gaps[0]).all(), f"uneven spacing at width {width}"
        assert gaps[0] >= min_gap

    def test_preferred_divisors(self):
        # width 81 → reduced 80, first divisor 10 → segment 8 → 11 ticks
        assert optimal_tick_positions(81) == list(range(0, 81, 8))
        # width 11 → reduced 10 ≥ 10 → segment 10/10=1?  reduced%10==0,
        # reduced//10=1 which is NOT > min_gap(1) → try 8,5: 10%5==0,
        # 10//5=2>1 → segment = 10//5 = 2
        assert optimal_tick_positions(11) == [0, 2, 4, 6, 8, 10]


class TestChartStyles:
    """≈ qa_ImChart.cpp draw<Style::…> suites — all styles render without
    error and produce the expected glyph families."""

    def setup_method(self):
        self.t = np.linspace(0, 1, 120)
        self.y = np.sin(2 * np.pi * 3 * self.t)

    def test_braille(self):
        art = ImChart(60, 12).plot(self.y, self.t, label="sine-like") \
            .render(color=False)
        assert any("⠀" < ch <= "⣿" for ch in art)
        assert "⣿ sine-like" in art

    def test_bars_blocks(self):
        gauss = np.exp(-0.5 * ((self.t - 0.5) / 0.1) ** 2)
        art = ImChart(60, 12).plot(gauss, self.t, style="bars") \
            .render(color=False)
        assert "█" in art          # solid fill
        assert any(g in art for g in "▁▂▃▄▅▆▇")  # partial top cells

    def test_marker_glyphs(self):
        c = ImChart(60, 12)
        c.plot(self.y, self.t, style="marker")
        c.plot(0.5 * self.y, self.t, style="marker")
        art = c.render(color=False)
        assert "X" in art and "O" in art  # kMarker[0], kMarker[1]

    def test_empty_dataset_is_noop(self):
        # qa_ImChart.cpp:110 — drawing an empty dataset must not throw
        art = ImChart(40, 8).plot([], []).plot([1.0, 2.0]).render(color=False)
        assert isinstance(art, str)

    def test_log_x_axis(self):
        f = np.logspace(-1, 4, 200)
        resp = -20 * np.log10(1 + (f / 100.0) ** 2)
        art = ImChart(70, 14, x_transform="log",
                      bounds=((0.1, 1e4), None)) \
            .plot(resp, f, label="low-pass1").render(color=False)
        assert "⣿ low-pass1" in art
        # tick labels span the log range: both small and large decades shown
        assert "0.1" in art and ("1e+04" in art or "10000" in art
                                 or "1.00e+04" in art)

    def test_fixed_bounds_clip(self):
        # points outside fixed boundaries are clipped, not wrapped
        art = ImChart(30, 8, bounds=((0.0, 1.0), (-1.0, 1.0))) \
            .plot([5.0, -5.0, 0.5], [0.1, 0.5, 0.9]).render(color=False)
        assert isinstance(art, str)

    def test_colour_render_has_ansi(self):
        art = ImChart(30, 6).plot(self.y, self.t).render(color=True)
        assert "\x1b[" in art


class TestMountainRange:
    """≈ qa_ImChart.cpp / ImChart.hpp:582 drawMountainRange."""

    def test_waterfall_renders_all_traces(self):
        t = np.linspace(0, 1, 80)
        traces = [np.exp(-0.5 * ((t - 0.3 - 0.05 * i) / 0.05) ** 2)
                  for i in range(4)]
        c = ImChart(70, 16)
        c.mountain_range(traces, t, base_label="trace")
        art = c.render(color=False)
        for i in range(4):
            assert f"trace[{i}]" in art
        # newest trace (index 0) must be drawn last → on top
        assert c.datasets[-1][0] == "trace[0]"

    def test_offsets_expand_bounds(self):
        t = np.linspace(0, 1, 50)
        c = ImChart(40, 10)
        traces = [np.sin(t), np.cos(t)]
        c.mountain_range(traces, t)
        (bx0, bx1) = c._bounds_x
        (by0, by1) = c._bounds_y
        data_min = min(float(np.min(tr)) for tr in traces)
        data_max = max(float(np.max(tr)) for tr in traces)
        assert bx1 > 1.0               # room for x offsets
        assert by1 > data_max          # room for y offsets + padding
        assert by0 < data_min          # 5% padding below the data minimum


class TestColourMath:
    """≈ qa_ImCanvas.cpp colour suites (interpolateRGB/HSV, hex)."""

    def test_rgb_interpolation_endpoints_midpoint(self):
        red, blue = (255, 0, 0), (0, 0, 255)
        assert interpolate_rgb(red, blue, 0.0) == red
        assert interpolate_rgb(red, blue, 1.0) == blue
        mid = interpolate_rgb(red, blue, 0.5)
        assert mid == (127, 0, 127)
        # t clamped
        assert interpolate_rgb(red, blue, -1.0) == red
        assert interpolate_rgb(red, blue, 2.0) == blue

    def test_hsv_roundtrip_primaries(self):
        for c in [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0),
                  (0, 255, 255), (255, 0, 255), (255, 255, 255), (0, 0, 0),
                  (128, 64, 32)]:
            h, s, v = rgb_to_hsv(c)
            back = hsv_to_rgb(h, s, v)
            assert all(abs(a - b) <= 1 for a, b in zip(c, back)), (c, back)

    def test_hsv_known_values(self):
        assert rgb_to_hsv((255, 0, 0))[0] == pytest.approx(0.0)
        assert rgb_to_hsv((0, 255, 0))[0] == pytest.approx(120.0)
        assert rgb_to_hsv((0, 0, 255))[0] == pytest.approx(240.0)

    def test_hsv_interpolation_shortest_path(self):
        # red (h=0) → blue (h=240): shortest path is backwards through
        # magenta (h=300), not forwards through green
        mid = interpolate_hsv((255, 0, 0), (0, 0, 255), 0.5)
        h_mid, _, _ = rgb_to_hsv(mid)
        assert 290.0 < h_mid < 310.0

    def test_hex_roundtrip(self):
        assert to_hex_rgb((255, 128, 0)) == "#FF8000"
        assert parse_hex_rgb("#FF8000") == (255, 128, 0)
        assert parse_hex_rgb("#F80") == (255, 136, 0)
        assert parse_hex_rgb("nonsense") is None
        assert parse_hex_rgb("#GG0000") is None

    def test_ansi_rgb_escape(self):
        assert ansi_rgb((1, 2, 3)) == "\x1b[38;2;1;2;3m"
        assert ansi_rgb((1, 2, 3), foreground=False) == "\x1b[48;2;1;2;3m"


class TestCanvasRgb:
    def test_rgb_dot_renders_truecolor(self):
        cv = ImCanvas(10, 3)
        cv.dot(2, 2, color=(10, 20, 30))
        art = cv.render(color=True)
        assert "\x1b[38;2;10;20;30m" in art

    def test_text_with_color(self):
        cv = ImCanvas(10, 3)
        cv.text(0, 0, "hi", color=(255, 0, 0))
        art = cv.render(color=True)
        assert "\x1b[38;2;255;0;0m" in art
        assert "hi" in cv.render(color=False).replace("\x1b", "")


def test_quick_plot_back_compat():
    y = np.sin(np.linspace(0, 4 * np.pi, 400))
    out = quick_plot(y, width=60, height=10)
    lines = out.split("\n")
    assert len(lines) >= 12
    assert "1" in lines[0]
