"""SVG plot writers — the engine's answer to the reference's PNG plots.

The reference renders convergence / top-k / rank-histogram / speedup
charts with matplotlib (/root/reference/visualization/
visualize_pagerank.py:46-204, /root/reference/benchmark/
scalability_study.py:104-165). This container has no plotting library,
so these writers emit self-contained SVG from the standard library —
same one-command artifacts, no dependency. Inputs are the engine's own
metrics structures (``history`` rows, rank tables, bench JSON), never
raw datasets: plotting always happens on driver-side summaries, so
nothing here touches data at scale.
"""

from __future__ import annotations

import math
from collections.abc import Iterable, Mapping

_W, _H = 640, 400
_ML, _MR, _MT, _MB = 64, 16, 36, 48  # margins
_COLORS = ["#2563eb", "#dc2626", "#059669", "#d97706", "#7c3aed", "#0891b2"]


def _esc(s: str) -> str:
    return (
        str(s).replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def _ticks(lo: float, hi: float, n: int = 5) -> list[float]:
    if hi <= lo:
        hi = lo + 1.0
    span = hi - lo
    step = 10 ** math.floor(math.log10(span / max(n, 1)))
    for mult in (1, 2, 5, 10):
        if span / (step * mult) <= n:
            step *= mult
            break
    start = math.ceil(lo / step) * step
    out = []
    v = start
    while v <= hi + 1e-12 * span:
        out.append(round(v, 12))
        v += step
    return out or [lo, hi]


class _Frame:
    """Axes frame with linear or log-10 y scaling."""

    def __init__(
        self,
        xlo: float,
        xhi: float,
        ylo: float,
        yhi: float,
        logy: bool = False,
    ) -> None:
        self.logy = logy
        if logy:
            ylo = math.log10(max(ylo, 1e-300))
            yhi = math.log10(max(yhi, 1e-300))
        if xhi <= xlo:
            xhi = xlo + 1.0
        if yhi <= ylo:
            yhi = ylo + 1.0
        self.xlo, self.xhi, self.ylo, self.yhi = xlo, xhi, ylo, yhi

    def x(self, v: float) -> float:
        f = (v - self.xlo) / (self.xhi - self.xlo)
        return _ML + f * (_W - _ML - _MR)

    def y(self, v: float) -> float:
        if self.logy:
            v = math.log10(max(v, 1e-300))
        f = (v - self.ylo) / (self.yhi - self.ylo)
        return _H - _MB - f * (_H - _MT - _MB)


def _axes(frame: _Frame, title: str, xlabel: str, ylabel: str) -> list[str]:
    parts = [
        f'<rect x="0" y="0" width="{_W}" height="{_H}" fill="white"/>',
        f'<text x="{_W / 2}" y="20" text-anchor="middle" '
        f'font-size="15" font-family="sans-serif">{_esc(title)}</text>',
        f'<text x="{_W / 2}" y="{_H - 10}" text-anchor="middle" '
        f'font-size="12" font-family="sans-serif">{_esc(xlabel)}</text>',
        f'<text x="14" y="{_H / 2}" text-anchor="middle" font-size="12" '
        f'font-family="sans-serif" transform="rotate(-90 14 {_H / 2})">'
        f"{_esc(ylabel)}</text>",
        f'<rect x="{_ML}" y="{_MT}" width="{_W - _ML - _MR}" '
        f'height="{_H - _MT - _MB}" fill="none" stroke="#333"/>',
    ]
    for tx in _ticks(frame.xlo, frame.xhi):
        px = frame.x(tx)
        parts.append(
            f'<line x1="{px:.1f}" y1="{_H - _MB}" x2="{px:.1f}" '
            f'y2="{_H - _MB + 4}" stroke="#333"/>'
            f'<text x="{px:.1f}" y="{_H - _MB + 16}" text-anchor="middle" '
            f'font-size="10" font-family="sans-serif">{tx:g}</text>'
        )
    ylo, yhi = frame.ylo, frame.yhi
    for ty in _ticks(ylo, yhi):
        vy = 10**ty if frame.logy else ty
        py = frame.y(vy)
        label = f"1e{ty:g}" if frame.logy else f"{ty:g}"
        parts.append(
            f'<line x1="{_ML - 4}" y1="{py:.1f}" x2="{_ML}" y2="{py:.1f}" '
            f'stroke="#333"/>'
            f'<text x="{_ML - 7}" y="{py + 3:.1f}" text-anchor="end" '
            f'font-size="10" font-family="sans-serif">{label}</text>'
        )
    return parts


def svg_line_chart(
    series: Mapping[str, Iterable[tuple[float, float]]],
    path: str,
    title: str = "",
    xlabel: str = "",
    ylabel: str = "",
    logy: bool = False,
) -> str:
    """Multi-series line chart -> self-contained SVG file at ``path``."""
    pts = {k: [(float(x), float(y)) for x, y in v] for k, v in series.items()}
    allx = [x for v in pts.values() for x, _ in v] or [0.0, 1.0]
    ally = [y for v in pts.values() for _, y in v if not logy or y > 0] or [1.0]
    frame = _Frame(min(allx), max(allx), min(ally), max(ally), logy=logy)
    parts = _axes(frame, title, xlabel, ylabel)
    for i, (name, v) in enumerate(pts.items()):
        color = _COLORS[i % len(_COLORS)]
        poly = " ".join(
            f"{frame.x(x):.1f},{frame.y(max(y, 1e-300) if logy else y):.1f}"
            for x, y in v
        )
        parts.append(
            f'<polyline points="{poly}" fill="none" stroke="{color}" '
            f'stroke-width="1.8"/>'
        )
        ly = _MT + 14 + 14 * i
        parts.append(
            f'<line x1="{_W - _MR - 110}" y1="{ly}" x2="{_W - _MR - 86}" '
            f'y2="{ly}" stroke="{color}" stroke-width="2"/>'
            f'<text x="{_W - _MR - 80}" y="{ly + 4}" font-size="11" '
            f'font-family="sans-serif">{_esc(name)}</text>'
        )
    return _write(path, parts)


def svg_bar_chart(
    labels: list[str],
    values: list[float],
    path: str,
    title: str = "",
    xlabel: str = "",
    ylabel: str = "",
) -> str:
    """Vertical bar chart -> SVG file at ``path``."""
    n = max(len(values), 1)
    frame = _Frame(0, n, 0, max(values, default=1.0))
    parts = _axes(frame, title, xlabel, ylabel)
    bw = (_W - _ML - _MR) / n * 0.8
    for i, (lab, val) in enumerate(zip(labels, values)):
        x0 = frame.x(i + 0.1)
        y0 = frame.y(val)
        parts.append(
            f'<rect x="{x0:.1f}" y="{y0:.1f}" width="{bw:.1f}" '
            f'height="{_H - _MB - y0:.1f}" fill="{_COLORS[0]}"/>'
        )
        parts.append(
            f'<text x="{x0 + bw / 2:.1f}" y="{_H - _MB + 28}" '
            f'text-anchor="middle" font-size="9" font-family="sans-serif">'
            f"{_esc(str(lab)[:12])}</text>"
        )
    return _write(path, parts)


def _write(path: str, parts: list[str]) -> str:
    body = "\n".join(parts)
    svg = (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" '
        f'height="{_H}" viewBox="0 0 {_W} {_H}">\n{body}\n</svg>\n'
    )
    with open(path, "w") as f:
        f.write(svg)
    return path


# --- engine-artifact writers (reference plot parity) -----------------------


def write_convergence_svg(history: list[dict], path: str) -> str:
    """l1 + max_err per iteration, log y — the reference's convergence
    plot (visualize_pagerank.py:46-75)."""
    return svg_line_chart(
        {
            "l1": [(h["iter"], h["l1"]) for h in history if "l1" in h],
            "max_err": [
                (h["iter"], h["max_err"]) for h in history if "max_err" in h
            ],
        },
        path,
        title="PageRank convergence",
        xlabel="iteration",
        ylabel="error",
        logy=True,
    )


def write_topk_svg(
    labels: list[str], ranks: list[float], path: str, k: int = 20
) -> str:
    """Top-k ranks bar chart (visualize_pagerank.py:118-146)."""
    return svg_bar_chart(
        [str(l) for l in labels[:k]],
        [float(r) for r in ranks[:k]],
        path,
        title=f"Top-{min(k, len(labels))} PageRank",
        xlabel="vertex",
        ylabel="rank",
    )


def write_rank_histogram_svg(
    bin_edges: list[float], counts: list[int], path: str
) -> str:
    """Rank distribution histogram (visualize_pagerank.py:148-176)."""
    labels = [f"{e:.2e}" for e in bin_edges[:-1]]
    return svg_bar_chart(
        labels,
        [float(c) for c in counts],
        path,
        title="Rank distribution",
        xlabel="rank bin",
        ylabel="vertices",
    )


def write_scaling_svg(cpu_throughputs: Mapping[int, float], path: str) -> str:
    """Measured vs ideal speedup (scalability_study.py:104-165)."""
    cpus = sorted(cpu_throughputs)
    base_c = cpus[0]
    base_t = cpu_throughputs[base_c]
    speedup = [(c, cpu_throughputs[c] / base_t) for c in cpus]
    ideal = [(c, c / base_c) for c in cpus]
    return svg_line_chart(
        {"measured": speedup, "ideal": ideal},
        path,
        title="Scaling",
        xlabel="CPUs",
        ylabel="speedup",
    )
