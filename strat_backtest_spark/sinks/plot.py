"""Plot sink (SURVEY.md §2.1 S9) — a driver-side convenience wrapper.

The reference renders matplotlib line/area charts with a ticker
watermark and light/dark styles and writes PNGs under ``./Graphs``
(strats.py:422-486, finance_data.py:41-88).  Plotting is inherently a
driver-side, small-data operation — the correct Spark shape is: reduce
on the cluster (the portfolio/net-worth frame is one row per trading
day), ``toPandas()`` the reduced frame, then hand it to matplotlib.

matplotlib is not part of the engine's runtime dependencies (and is
absent in the test container), so the render step is gated behind an
import-try: everything up to the pandas hand-off is real and tested;
``_render`` raises :class:`PlotUnavailableError` when matplotlib is
missing.
"""

from __future__ import annotations

import os
from typing import Optional

import pandas as pd

from pyspark.sql import DataFrame

GRAPH_DIR = "Graphs"  # reference: strats.py:484-486

# Line/figure styling lifted from the reference's bundled .mplstyle
# files' intent (light/dark text + watermark), re-expressed as rcParams
# so we need not ship style files.
_STYLES = {
    "LIGHT": {"facecolor": "white", "text": "black"},
    "DARK": {"facecolor": "#1e1e1e", "text": "white"},
}


class PlotUnavailableError(RuntimeError):
    """Raised when matplotlib is not installed in this environment."""


def _collect_series(df: DataFrame, x: str, ys: list[str], max_rows: int) -> pd.DataFrame:
    """Cluster-side reduce + driver hand-off.

    Guard against accidentally collecting a huge frame: plots beyond
    ``max_rows`` points are visually indistinguishable, so downsample
    with an every-Nth-row filter BEFORE toPandas (a cheap window-free
    modulo on a monotonic id would not preserve order guarantees; use
    tablesample-style fraction instead).
    """
    cols = [x] + ys
    out = df.select(*cols).orderBy(x)
    n = out.count()
    if n > max_rows:
        out = out.sample(fraction=max_rows / n, seed=7).orderBy(x)
    pdf = out.toPandas()
    return pdf.set_index(x)


def plot_series(
    df: DataFrame,
    x: str = "date",
    ys: Optional[list[str]] = None,
    title: str = "Stocks",
    xlabel: str = "Date",
    ylabel: str = "Return",
    filename: str = "data.png",
    color: str = "LIGHT",
    area: bool = False,
    watermark: Optional[str] = None,
    max_rows: int = 100_000,
) -> str:
    """Render ``ys`` over ``x`` to ``Graphs/<filename>``.

    Parameter surface mirrors ``Strategy.plot_data`` (strats.py:422-433):
    title/xlabel/ylabel/filename/color/area, plus the ticker watermark.
    Returns the written path.
    """
    if ys is None:
        ys = [c for c in df.columns if c != x]
    pdf = _collect_series(df, x, ys, max_rows)
    return _render(
        pdf,
        title=title,
        xlabel=xlabel,
        ylabel=ylabel,
        filename=filename,
        color=color,
        area=area,
        watermark=watermark,
    )


def _render(
    pdf: pd.DataFrame,
    *,
    title: str,
    xlabel: str,
    ylabel: str,
    filename: str,
    color: str,
    area: bool,
    watermark: Optional[str],
) -> str:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as exc:  # container ships no matplotlib
        raise PlotUnavailableError(
            "matplotlib is not installed; plot_series collected the data "
            "but cannot render. `pip install matplotlib` to enable the "
            "plot sink."
        ) from exc

    style = _STYLES.get(color.upper(), _STYLES["LIGHT"])
    fig, ax = plt.subplots(facecolor=style["facecolor"])
    if area:
        pdf.plot.area(ax=ax, stacked=False, zorder=10)
    else:
        pdf.plot(ax=ax, zorder=10)
    ax.grid(zorder=0)
    ax.set_title(title, color=style["text"])
    ax.set_xlabel(xlabel, color=style["text"])
    ax.set_ylabel(ylabel, color=style["text"])
    if watermark:
        ax.text(
            0.5,
            0.5,
            watermark,
            horizontalalignment="center",
            verticalalignment="center",
            transform=ax.transAxes,
            fontsize=76,
            weight="bold",
            alpha=0.3,
            color=style["text"],
            zorder=3,
        )
    os.makedirs(GRAPH_DIR, exist_ok=True)
    path = os.path.join(GRAPH_DIR, filename)
    fig.savefig(path)
    plt.close(fig)
    return path
