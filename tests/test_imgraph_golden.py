"""Golden mirror of the reference's qa_ImGraph.cpp
(algorithm/test/qa_ImGraph.cpp:43-224): the five demo topologies — fan-in,
fan-out, the two cyclic control-loop examples (horizontal + vertical layout
preference), auto layout, and the large mixed example with block/edge
colouring and feedback-loop detection."""

import re

import pytest

import gnuradio4_tpu as gr
from gnuradio4_tpu.utils.imgraph import (colour, detect_feedback_loops,
                                         render_graph, style, to_dot)

ANSI = re.compile("\x1b\\[[0-9;]*m")


def example_base1():
    # qa_ImGraph.cpp:43 — two sources fan into an adder
    g = gr.Graph()
    s1 = g.emplace("ConstantSource", name="src#1")
    s2 = g.emplace("ConstantSource", name="src#2")
    add = g.emplace("Add", n_inputs=2, name="add")
    snk = g.emplace("NullSink", name="snk#1")
    g.connect(s1, add, dst_port="in0")
    g.connect(s2, add, dst_port="in1")
    g.connect(add, snk)
    return g


def example_base2():
    # qa_ImGraph.cpp:62 — a splitter fans out to two sinks
    g = gr.Graph()
    src = g.emplace("ConstantSource", name="src#1")
    split = g.emplace("Copy", name="split")
    s1 = g.emplace("NullSink", name="snk#1")
    s2 = g.emplace("NullSink", name="snk#2")
    g.connect(src, split)
    g.connect(split, s1)
    g.connect(split, s2)
    return g


def example_cyclic(vertical=False):
    # qa_ImGraph.cpp:79/101 — the classic control loop Σ→D(s)→G(s)→M(s)→Σ
    g = gr.Graph()
    src = g.emplace("ConstantSource", name="src#1")
    sm = g.emplace("Add", n_inputs=2, name="sum")
    if vertical:
        sm.ui_constraints = {"layout_pref": "vertical"}
    ds = g.emplace("Copy", name="D(s)")
    gs = g.emplace("Copy", name="G(s)")
    ms = g.emplace("Copy", name="M(s)")
    snk = g.emplace("NullSink", name="snk#1")
    g.connect(src, sm, dst_port="in0")
    g.connect(sm, ds)
    g.connect(ds, gs)
    g.connect(gs, snk)
    g.connect(gs, ms)
    g.connect(ms, sm, dst_port="in1", feedback=True)
    return g


def names_in(art):
    return lambda name: name in art


class TestImGraphTopologies:
    def test_base1_fan_in(self):
        art = render_graph(example_base1(), color=False)
        for name in ("src#1", "src#2", "add", "snk#1"):
            assert name in art
        diagram = art.split("edges:")[0]
        # fan-in lanes merge at a ┬ junction into add, plus the snk arrow
        assert diagram.count("▶") >= 2 and "┬" in diagram

    def test_base2_fan_out(self):
        art = render_graph(example_base2(), color=False)
        for name in ("src#1", "split", "snk#1", "snk#2"):
            assert name in art
        diagram = art.split("edges:")[0]
        assert diagram.count("▶") == 3      # split in + two fan-out arrows
        # the two sink boxes sit in the same column (same x of box labels)
        lines = art.split("edges:")[0].split("\n")
        xs = [l.index("snk") for l in lines if "│ snk" in l]
        assert len(xs) == 2 and len(set(xs)) == 1

    def test_cyclic_feedback_routed(self):
        art = render_graph(example_cyclic(), color=False)
        for name in ("sum", "D(s)", "G(s)", "M(s)"):
            assert name in art
        assert "▲" in art                   # feedback arrow back into Σ
        assert "(feedback)" in art          # appendix row

    def test_cyclic_vertical_preference(self):
        # qa_ImGraph.cpp:107 ui_constraints {"layout_pref": "vertical"}
        art = render_graph(example_cyclic(vertical=True), color=False)
        assert "▼" in art                   # downward forward arrows
        assert "◀" in art                   # feedback arrow back up
        # vertical: src box is ABOVE the sum box
        lines = art.split("\n")
        y_src = next(i for i, l in enumerate(lines) if "src#1" in l)
        y_sum = next(i for i, l in enumerate(lines) if "sum" in l)
        assert y_src < y_sum

    def test_explicit_direction_overrides(self):
        art_h = render_graph(example_cyclic(vertical=True),
                             direction="horizontal", color=False)
        assert "▶" in art_h and "▼" not in art_h.split("edges:")[0]


class TestFeedbackLoopDetection:
    def test_detect_feedback_loops(self):
        # ≈ qa_ImGraph.cpp:202 detectFeedbackLoops
        loops = detect_feedback_loops(example_cyclic())
        assert len(loops) == 1
        loop = loops[0]
        assert getattr(loop[-1], "feedback", False)
        hops = [(e.src.name, e.dst.name) for e in loop]
        assert hops == [("sum", "D(s)"), ("D(s)", "G(s)"),
                        ("G(s)", "M(s)"), ("M(s)", "sum")]

    def test_acyclic_graph_has_no_loops(self):
        assert detect_feedback_loops(example_base1()) == []


class TestStyling:
    def test_block_and_edge_colouring(self):
        # ≈ qa_ImGraph.cpp:199-212 colour/style
        g = example_cyclic()
        sm = next(b for b in g.blocks if b.name == "sum")
        colour(sm, "bright_green")
        for loop in detect_feedback_loops(g):
            colour(loop[-1], "cyan")
        art = render_graph(g, color=True)
        assert "\x1b[92m" in art            # bright green block
        assert "\x1b[36m" in art            # cyan feedback wire
        plain = render_graph(g, color=False)
        assert not ANSI.search(plain)
        # same geometry with and without colour
        assert ANSI.sub("", art) == plain

    def test_style_raw_sgr(self):
        g = example_base1()
        add = next(b for b in g.blocks if b.name == "add")
        style(add, "\x1b[1;93m")
        art = render_graph(g)
        assert "\x1b[1;93m" in art

    def test_named_edge_in_appendix(self):
        g = gr.Graph()
        src = g.emplace("ConstantSource", name="src#2")
        snk = g.emplace("NullSink", name="snk#2")
        g.connect(src, snk, name="special edge")
        art = render_graph(g, color=False)
        assert "[special edge]" in art      # qa_ImGraph.cpp:192

    def test_to_dot_marks_feedback(self):
        dot = to_dot(example_cyclic())
        assert "digraph" in dot and "style=dashed, color=red" in dot
