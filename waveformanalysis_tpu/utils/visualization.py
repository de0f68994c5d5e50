"""Lineage and waveform visualization.

Behavioral analog of the reference visualizers
(reference: waveform_analysis/utils/visualization/lineage_visualizer.py and
waveform_visualizer.py): layered "labview"-style lineage rendering with
matplotlib, an optional plotly variant, critical-path highlighting, and
waveform plots. All functions degrade to pure-data layouts when plotting
backends are unavailable.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def lineage_to_graph(lineage: Dict[str, Any], target: str
                     ) -> Tuple[List[str], List[Tuple[str, str]], Dict[str, Dict]]:
    """Flatten a recursive lineage dict into (nodes, edges, node_info)."""
    nodes: List[str] = []
    edges: List[Tuple[str, str]] = []
    info: Dict[str, Dict] = {}

    def walk(name: str, lin: Dict[str, Any]) -> None:
        if name in info:
            return
        nodes.append(name)
        info[name] = {
            "plugin_class": lin.get("plugin_class", "?"),
            "version": lin.get("plugin_version", ""),
            "config": lin.get("config", {}),
        }
        for dep, sub in (lin.get("depends_on") or {}).items():
            edges.append((dep, name))
            walk(dep, sub or {})

    walk(target, lineage)
    return nodes, edges, info


def layered_layout(nodes: Sequence[str], edges: Sequence[Tuple[str, str]]
                   ) -> Dict[str, Tuple[float, float]]:
    """Left-to-right layered positions (dependencies left of consumers)."""
    deps: Dict[str, List[str]] = {n: [] for n in nodes}
    for src, dst in edges:
        deps.setdefault(dst, []).append(src)
        deps.setdefault(src, [])
    level: Dict[str, int] = {}

    def level_of(n: str, seen=frozenset()) -> int:
        if n in level:
            return level[n]
        if n in seen:
            return 0
        lvl = max((level_of(d, seen | {n}) for d in deps.get(n, [])), default=-1) + 1
        level[n] = lvl
        return lvl

    for n in nodes:
        level_of(n)
    by_level: Dict[int, List[str]] = {}
    for n in nodes:
        by_level.setdefault(level[n], []).append(n)
    pos: Dict[str, Tuple[float, float]] = {}
    for lvl, members in by_level.items():
        for i, n in enumerate(sorted(members)):
            pos[n] = (float(lvl), -float(i) + (len(members) - 1) / 2.0)
    return pos


def plot_lineage_labview(
    lineage: Dict[str, Any],
    target: str,
    context: Any = None,
    analysis_result: Any = None,
    highlight_critical_path: bool = False,
    highlight_bottlenecks: bool = False,
    ax: Any = None,
):
    """Matplotlib block-diagram lineage plot (reference:
    plot_lineage_labview)."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    from matplotlib.patches import FancyArrowPatch, FancyBboxPatch

    nodes, edges, info = lineage_to_graph(lineage, target)
    pos = layered_layout(nodes, edges)

    critical = set()
    bottlenecks = set()
    if analysis_result is not None:
        if highlight_critical_path:
            critical = set(getattr(analysis_result, "critical_path", []))
        if highlight_bottlenecks:
            bottlenecks = {n for n, _ in getattr(analysis_result, "bottlenecks", [])}

    if ax is None:
        width = max(8.0, 3.0 * (max(x for x, _ in pos.values()) + 1))
        height = max(4.0, 1.6 * (len(nodes) / 2 + 1))
        _fig, ax = plt.subplots(figsize=(width, height))

    W, H = 0.72, 0.4
    for name in nodes:
        x, y = pos[name]
        color = "#ffd27f" if name in bottlenecks else (
            "#9fd3a5" if name in critical else "#cfe2ff"
        )
        box = FancyBboxPatch(
            (x - W / 2, y - H / 2), W, H,
            boxstyle="round,pad=0.04", facecolor=color, edgecolor="#344",
        )
        ax.add_patch(box)
        label = name
        version = info[name].get("version")
        if version:
            label += f"\nv{version}"
        ax.text(x, y, label, ha="center", va="center", fontsize=8)

    for src, dst in edges:
        x0, y0 = pos[src]
        x1, y1 = pos[dst]
        arrow = FancyArrowPatch(
            (x0 + W / 2, y0), (x1 - W / 2, y1),
            arrowstyle="-|>", mutation_scale=12, color="#667",
            connectionstyle="arc3,rad=0.08",
        )
        ax.add_patch(arrow)

    xs = [x for x, _ in pos.values()]
    ys = [y for _, y in pos.values()]
    ax.set_xlim(min(xs) - 1, max(xs) + 1)
    ax.set_ylim(min(ys) - 1, max(ys) + 1)
    ax.axis("off")
    ax.set_title(f"Lineage: {target}")
    return ax


def plot_lineage_plotly(lineage: Dict[str, Any], target: str) -> Any:
    """Plotly variant; returns a Figure (raises if plotly missing)."""
    import plotly.graph_objects as go  # type: ignore

    nodes, edges, info = lineage_to_graph(lineage, target)
    pos = layered_layout(nodes, edges)
    edge_x, edge_y = [], []
    for src, dst in edges:
        edge_x += [pos[src][0], pos[dst][0], None]
        edge_y += [pos[src][1], pos[dst][1], None]
    fig = go.Figure()
    fig.add_trace(go.Scatter(x=edge_x, y=edge_y, mode="lines",
                             line=dict(color="#99a", width=1.5),
                             hoverinfo="none"))
    fig.add_trace(go.Scatter(
        x=[pos[n][0] for n in nodes],
        y=[pos[n][1] for n in nodes],
        mode="markers+text",
        text=nodes,
        textposition="top center",
        marker=dict(size=24, color="#7aa6e8"),
        hovertext=[
            f"{n}<br>{info[n]['plugin_class']} v{info[n]['version']}"
            for n in nodes
        ],
        hoverinfo="text",
    ))
    fig.update_layout(title=f"Lineage: {target}", showlegend=False,
                      xaxis_visible=False, yaxis_visible=False)
    return fig


def plot_waveforms(
    waves: Any,
    baselines: Optional[Any] = None,
    hits: Optional[Any] = None,
    max_events: int = 16,
    ax: Any = None,
):
    """Waveform plot with optional baseline lines and hit markers
    (reference: waveform_visualizer.py)."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    waves = np.asarray(waves)[:max_events]
    if ax is None:
        _fig, ax = plt.subplots(figsize=(10, 5))
    for i, w in enumerate(waves):
        ax.plot(w, alpha=0.6, lw=0.9, label=f"evt {i}" if len(waves) <= 8 else None)
    if baselines is not None:
        for b in np.asarray(baselines)[:max_events]:
            ax.axhline(float(b), color="gray", ls="--", lw=0.5, alpha=0.4)
    if hits is not None:
        positions = np.asarray(hits["position"]) if "position" in getattr(
            hits, "dtype", hits
        ) or (hasattr(hits, "__contains__") and "position" in hits) else None
        if positions is not None:
            for p in positions:
                ax.axvline(int(p), color="crimson", ls=":", lw=0.8, alpha=0.6)
    if len(waves) <= 8:
        ax.legend(fontsize=7)
    ax.set_xlabel("sample")
    ax.set_ylabel("ADC")
    return ax
