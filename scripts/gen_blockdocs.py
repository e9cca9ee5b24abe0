#!/usr/bin/env python
"""Generate docs/BLOCKS.md — the full registered-block reference — from the
live registry (same metadata `python -m gnuradio4_tpu describe` prints)."""

from __future__ import annotations

import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import gnuradio4_tpu as gr  # noqa: E402
from gnuradio4_tpu import blocks  # noqa: F401,E402


def main() -> None:
    reg = gr.global_registry
    by_module: dict[str, list[str]] = defaultdict(list)
    for name in reg.known_blocks():
        cls = reg.get(name)
        by_module[cls.__module__.rsplit(".", 1)[-1]].append(name)

    out = ["# Block reference",
           "",
           "Auto-generated from the registry (`scripts/gen_blockdocs.py`); "
           "the same metadata backs `python -m gnuradio4_tpu describe <Type>`.",
           ""]
    total = 0
    for module in sorted(by_module):
        out.append(f"## {module}")
        out.append("")
        for name in sorted(by_module[module]):
            total += 1
            cls = reg.get(name)
            doc = (cls.__doc__ or "").strip().split("\n")[0]
            ins = [p.name for p in getattr(cls, "IN", ())]
            outs = [p.name for p in getattr(cls, "OUT", ())]
            ports = (f"in: {', '.join(ins) if ins else '—'}; "
                     f"out: {', '.join(outs) if outs else '—'}")
            out.append(f"### {name}")
            out.append("")
            if doc:
                out.append(doc)
            out.append("")
            out.append(f"*Ports* — {ports}")
            spec = getattr(cls, "_settings_spec", {})
            if spec:
                out.append("")
                out.append("| setting | default | notes |")
                out.append("|---|---|---|")
                for k, s in sorted(spec.items()):
                    notes = []
                    if s.unit:
                        notes.append(s.unit)
                    if s.choices:
                        notes.append("choices: " +
                                     ", ".join(map(str, s.choices)))
                    if s.limits:
                        notes.append(f"limits: {s.limits}")
                    notes.append("static" if s.kind == "static" else "dynamic")
                    if s.description:
                        notes.append(s.description)
                    default = repr(s.default)
                    if len(default) > 40:
                        default = default[:37] + "..."
                    out.append(f"| `{k}` | `{default}` | "
                               f"{'; '.join(notes)} |")
            out.append("")
    out.insert(3, f"**{total} registered block types.**")
    out.insert(4, "")
    path = Path(__file__).resolve().parent.parent / "docs" / "BLOCKS.md"
    path.write_text("\n".join(out))
    print(f"wrote {path} ({total} blocks)")


if __name__ == "__main__":
    main()
