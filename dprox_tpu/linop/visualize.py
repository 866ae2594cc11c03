"""Expression-tree visualization.

Counterpart of the reference's CompGraph.visualize (graphviz,
/root/reference/dprox/linop/comp_graph.py:284-340) — emits graphviz dot
when the package is available, else an indented text rendering.
"""
from __future__ import annotations

from .base import LinOp, Variable, Constant, Placeholder


def _label(op: LinOp) -> str:
    if isinstance(op, Variable):
        return f"Variable({op.name})"
    if isinstance(op, Placeholder):
        return f"Placeholder({op.name})"
    if isinstance(op, Constant):
        return f"Constant{tuple(op.value.shape)}"
    extra = ""
    if hasattr(op, "scalar"):
        extra = f" x{op.scalar:g}"
    return f"{type(op).__name__}{extra}"


def to_text(op: LinOp, indent: int = 0) -> str:
    lines = ["  " * indent + _label(op)]
    for c in op.children:
        lines.append(to_text(c, indent + 1))
    return "\n".join(lines)


def to_dot(op: LinOp) -> str:
    lines = ["digraph linop {", "  rankdir=BT;"]
    seen = {}

    def walk(node):
        if id(node) in seen:
            return seen[id(node)]
        nid = f"n{len(seen)}"
        seen[id(node)] = nid
        lines.append(f'  {nid} [label="{_label(node)}"];')
        for c in node.children:
            cid = walk(c)
            lines.append(f"  {cid} -> {nid};")
        return nid

    walk(op)
    lines.append("}")
    return "\n".join(lines)


def visualize(op: LinOp, filename: str = None):
    """Render the tree; returns dot source (and writes a png if graphviz
    is importable and a filename is given)."""
    dot = to_dot(op)
    if filename:
        try:
            import graphviz

            graphviz.Source(dot).render(filename, format="png", cleanup=True)
        except Exception:
            with open(filename + ".dot", "w") as f:
                f.write(dot)
    return dot
