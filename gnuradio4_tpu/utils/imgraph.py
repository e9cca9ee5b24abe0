"""Terminal flow-graph renderer (≈ reference algorithm ImGraph.hpp — the
ASCII/ANSI flowgraph layout view).

Layout is layered (Sugiyama-style): blocks go into columns by longest-path
depth, skip-level edges get virtual pass-through nodes, rows are ordered by
predecessor barycenter to reduce crossings, and every edge is routed
orthogonally through a lane gutter between columns — fan-out, fan-in and
multi-column spans all render faithfully (┬/┴/├/┤/┼ junctions), unlike a
simple per-row arrow chain.
"""

from __future__ import annotations

from typing import Any

from ..core.graph import Graph

# character-combination table for overlapping wires
_MERGE = {
    ("─", "│"): "┼", ("│", "─"): "┼",
    ("─", "─"): "─", ("│", "│"): "│",
    ("─", "╮"): "┬", ("─", "╭"): "┬", ("─", "╯"): "┴", ("─", "╰"): "┴",
    ("╮", "─"): "┬", ("╭", "─"): "┬", ("╯", "─"): "┴", ("╰", "─"): "┴",
    ("│", "╮"): "┤", ("│", "╯"): "┤", ("│", "╭"): "├", ("│", "╰"): "├",
    ("╮", "│"): "┤", ("╯", "│"): "┤", ("╭", "│"): "├", ("╰", "│"): "├",
    ("╮", "╯"): "┤", ("╯", "╮"): "┤", ("╭", "╰"): "├", ("╰", "╭"): "├",
    ("╮", "╰"): "┼", ("╰", "╮"): "┼", ("╭", "╯"): "┼", ("╯", "╭"): "┼",
}


class _Canvas:
    def __init__(self) -> None:
        self.cells: dict[tuple[int, int], str] = {}

    def put(self, y: int, x: int, ch: str, *, force: bool = False) -> None:
        old = self.cells.get((y, x))
        if old is None or old == " " or force:
            self.cells[(y, x)] = ch
            return
        if ch == " ":
            return
        self.cells[(y, x)] = _MERGE.get((old, ch), ch)

    def text(self, y: int, x: int, s: str) -> None:
        for i, ch in enumerate(s):
            self.put(y, x + i, ch, force=True)

    def render(self, max_width: int) -> str:
        if not self.cells:
            return ""
        ys = [y for y, _ in self.cells]
        xs = [x for _, x in self.cells]
        out = []
        for y in range(min(ys), max(ys) + 1):
            row = "".join(self.cells.get((y, x), " ")
                          for x in range(0, max(xs) + 1))
            out.append(row.rstrip()[:max_width])
        return "\n".join(out)


class _VNode:
    """Virtual pass-through node for an edge spanning multiple columns."""

    def __init__(self, edge) -> None:
        self.edge = edge


def _label(b) -> str:
    return b.name if b.name != b.unique_name else type(b).__name__


def render_graph(graph: Graph, *, max_width: int = 120) -> str:
    """Render the flowgraph as a routed ASCII diagram + an edge appendix."""
    flat = graph.flatten()
    if not flat.blocks:
        return "(empty graph)"
    order = flat.topological_order()
    fwd = [e for e in flat.edges if not getattr(e, "feedback", False)]
    depth: dict[Any, int] = {}
    for b in order:
        preds = [e.src for e in fwd if e.dst is b]
        depth[b] = 1 + max((depth[p] for p in preds), default=-1)
    n_cols = max(depth.values()) + 1

    # segments: each edge becomes a chain of per-gutter hops through virtual
    # nodes so every hop connects adjacent columns (Sugiyama virtual nodes)
    cols: list[list[Any]] = [[] for _ in range(n_cols)]
    for b in order:
        cols[depth[b]].append(b)
    hops: list[tuple[Any, Any, Any]] = []   # (src_node, dst_node, edge)
    for e in fwd:
        d0, d1 = depth[e.src], depth[e.dst]
        prev: Any = e.src
        for c in range(d0 + 1, d1):
            v = _VNode(e)
            cols[c].append(v)
            hops.append((prev, v, e))
            prev = v
        hops.append((prev, e.dst, e))

    # barycenter row ordering, two sweeps
    row: dict[Any, int] = {}
    for c, col in enumerate(cols):
        for i, nd in enumerate(col):
            row[nd] = i
    preds_of: dict[Any, list[Any]] = {}
    succs_of: dict[Any, list[Any]] = {}
    for s, d, _ in hops:
        preds_of.setdefault(d, []).append(s)
        succs_of.setdefault(s, []).append(d)
    for sweep_cols, nbrs in ((range(1, n_cols), preds_of),
                             (range(n_cols - 2, -1, -1), succs_of)):
        for c in sweep_cols:
            def key(nd):
                ns = nbrs.get(nd, [])
                return (sum(row[x] for x in ns) / len(ns) if ns else row[nd],
                        row[nd])
            cols[c].sort(key=key)
            for i, nd in enumerate(cols[c]):
                row[nd] = i

    # geometry
    pitch = 4                      # vertical rows per slot (3-line box + gap)
    box_w: list[int] = []
    for col in cols:
        labels = [_label(b) for b in col if not isinstance(b, _VNode)]
        box_w.append(max((len(s) for s in labels), default=2) + 4)
    gutter_lanes = [max(1, sum(1 for s, d, _ in hops
                               if (s in cols[c]) and (d in cols[c + 1])))
                    for c in range(n_cols - 1)]
    x0: list[int] = []
    x = 0
    for c in range(n_cols):
        x0.append(x)
        x += box_w[c]
        if c < n_cols - 1:
            x += 2 * gutter_lanes[c] + 3

    cv = _Canvas()

    def y_mid(nd) -> int:
        return row[nd] * pitch + 1

    # boxes + virtual pass-throughs
    for c, col in enumerate(cols):
        for nd in col:
            if isinstance(nd, _VNode):
                y = y_mid(nd)
                for xx in range(x0[c], x0[c] + box_w[c]):
                    cv.put(y, xx, "─")
                continue
            lbl = _label(nd)
            w = box_w[c]
            y = row[nd] * pitch
            cv.text(y, x0[c], "┌" + "─" * (w - 2) + "┐")
            cv.text(y + 1, x0[c], "│ " + lbl.ljust(w - 4) + " │")
            cv.text(y + 2, x0[c], "└" + "─" * (w - 2) + "┘")

    # routed hops per gutter: horizontal out → lane vertical → horizontal in ▶
    for c in range(n_cols - 1):
        lane_x0 = x0[c] + box_w[c] + 1
        gutter_hops = [(s, d, e) for s, d, e in hops
                       if s in cols[c] and d in cols[c + 1]]
        gutter_hops.sort(key=lambda h: (y_mid(h[0]), y_mid(h[1])))
        for lane, (s, d, e) in enumerate(gutter_hops):
            lx = lane_x0 + 2 * lane
            ys, yd = y_mid(s), y_mid(d)
            for xx in range(x0[c] + box_w[c], lx):
                cv.put(ys, xx, "─")
            if ys == yd:
                for xx in range(lx, x0[c + 1] - 1):
                    cv.put(ys, xx, "─")
            else:
                down = yd > ys
                cv.put(ys, lx, "╮" if down else "╯")
                step = 1 if down else -1
                for yy in range(ys + step, yd, step):
                    cv.put(yy, lx, "│")
                cv.put(yd, lx, "╰" if down else "╭")
                for xx in range(lx + 1, x0[c + 1] - 1):
                    cv.put(yd, xx, "─")
            cv.put(yd, x0[c + 1] - 1,
                   "▶" if not isinstance(d, _VNode) else "─", force=True)

    from .formatting import edge as fmt_edge
    lines = [cv.render(max_width), "", "edges:"]
    for e in flat.edges:
        fb = " (feedback)" if getattr(e, "feedback", False) else ""
        lines.append("  " + fmt_edge(e) + fb)
    for src, dst in flat.message_edges:
        lines.append(f"  {_label(src)} ╌▶ {_label(dst)} (message)")
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
        attrs = []
        if e.samples_per_step:
            attrs.append(f'label="{e.samples_per_step}"')
        if getattr(e, "feedback", False):
            attrs.append("style=dashed, color=red, constraint=false")
        a = f" [{', '.join(attrs)}]" if attrs else ""
        lines.append(f"  {ident(e.src)} -> {ident(e.dst)}{a};")
    for src, dst in flat.message_edges:
        lines.append(f"  {ident(src)} -> {ident(dst)} [style=dashed];")
    lines.append("}")
    return "\n".join(lines)
