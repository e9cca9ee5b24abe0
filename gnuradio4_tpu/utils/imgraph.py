"""ASCII flow-graph renderer (≈ reference algorithm ImGraph.hpp — the terminal
flowgraph layout view). Lays the topologically-ordered blocks out in columns by
depth and draws box nodes with edge annotations.
"""

from __future__ import annotations

from typing import Any

from ..core.graph import Graph


def _depths(graph: Graph) -> dict[Any, int]:
    depth: dict[Any, int] = {}
    for b in graph.topological_order():
        preds = [e.src for e in graph.edges if e.dst is b]
        depth[b] = 1 + max((depth[p] for p in preds), default=-1)
    return depth


def render_graph(graph: Graph, *, max_width: int = 110) -> str:
    """Render the flowgraph as ASCII columns (sources left, sinks right)."""
    flat = graph.flatten()
    if not flat.blocks:
        return "(empty graph)"
    depth = _depths(flat)
    n_cols = max(depth.values()) + 1
    cols: list[list[Any]] = [[] for _ in range(n_cols)]
    for b in flat.topological_order():
        cols[depth[b]].append(b)

    def label(b) -> str:
        t = type(b).__name__
        return b.name if b.name != b.unique_name else t

    boxes: dict[Any, list[str]] = {}
    col_w: list[int] = []
    for col in cols:
        w = max((len(label(b)) for b in col), default=0) + 4
        col_w.append(w)
        for b in col:
            lbl = label(b)
            inner = w - 2
            boxes[b] = [
                "┌" + "─" * inner + "┐",
                "│ " + lbl.ljust(inner - 2) + " │",
                "└" + "─" * inner + "┘",
            ]

    # rows: place each column's blocks stacked; connect with arrows on the
    # middle line of each box when src is in col c and dst in col c+1
    n_rows = max(len(c) for c in cols)
    lines: list[str] = []
    for r in range(n_rows):
        for sub in range(3):
            parts = []
            for c, col in enumerate(cols):
                if r < len(col):
                    b = col[r]
                    seg = boxes[b][sub]
                else:
                    seg = " " * col_w[c]
                # arrow gap between columns
                if c < n_cols - 1:
                    has_edge = (r < len(col) and sub == 1 and any(
                        e.src is col[r] for e in flat.edges
                        if depth[e.dst] == c + 1))
                    gap = "──▶" if has_edge else "   "
                    seg = seg + gap
                parts.append(seg)
            line = "".join(parts).rstrip()
            if line:
                lines.append(line[:max_width])
        lines.append("")
    # edge list appendix (complete connectivity incl. skips/fan-in)
    lines.append("edges:")
    for e in flat.edges:
        extra = f" [{e.samples_per_step} samp/step]" if e.samples_per_step else ""
        lines.append(f"  {label(e.src)}.{e.src_port} ─▶ "
                     f"{label(e.dst)}.{e.dst_port}{extra}")
    return "\n".join(lines)


def to_dot(graph: Graph) -> str:
    """Graphviz DOT rendering of the flowgraph (for docs/visualization tools)."""
    flat = graph.flatten()
    lines = ["digraph flowgraph {", "  rankdir=LR;",
             '  node [shape=box, fontname="monospace"];']

    def ident(b) -> str:
        return b.unique_name.replace("#", "_")

    for b in flat.blocks:
        label = b.name if b.name != b.unique_name else type(b).__name__
        lines.append(f'  {ident(b)} [label="{label}\\n{type(b).__name__}"];')
    for e in flat.edges:
        attrs = f' [label="{e.samples_per_step}"]' if e.samples_per_step else ""
        lines.append(f"  {ident(e.src)} -> {ident(e.dst)}{attrs};")
    for src, dst in flat.message_edges:
        lines.append(f"  {ident(src)} -> {ident(dst)} [style=dashed];")
    lines.append("}")
    return "\n".join(lines)
