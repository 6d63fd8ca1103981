"""Chart render decisions (reference ``dashboard/components/chat.py:9-25``).

The reference's ``render_chart`` owns three decisions and one side
effect: (1) a frame with fewer than two columns gets no chart, (2) the
chart type maps bar/line/pie onto (x=first column, y/values=second
column), (3) anything else renders nothing — then it calls plotly +
streamlit. This module keeps the decisions and returns a plain SPEC
dict; any renderer (plotly express, vega-lite, a test) consumes it.
"""

from __future__ import annotations

#: chart types the decision layer recognizes (chat.py's if/elif chain).
SUPPORTED = ("bar", "line", "pie")


def chart_spec(
    columns: list[str], chart_type: str, title: str
) -> dict | None:
    """The render decision: None when no chart should be drawn, else
    ``{type, x, y, title}`` with x/y bound to the first two columns
    (for pie, x is the name column and y the value column)."""
    if len(columns) < 2 or chart_type not in SUPPORTED:
        return None
    return {
        "type": chart_type,
        "x": columns[0],
        "y": columns[1],
        "title": title,
    }


def render_plotly(df, spec: dict | None):
    """Optional plotly-express materialization of a spec — the side
    effect half of the reference's render_chart, import-gated because
    plotly is app chrome, not engine."""
    if spec is None:
        return None
    try:
        import plotly.express as px
    except ImportError as exc:  # pragma: no cover - no plotly here
        raise NotImplementedError(
            "plotly is not installed; consume chart_spec() with your "
            "own renderer"
        ) from exc
    kind = spec["type"]
    if kind == "bar":
        return px.bar(df, x=spec["x"], y=spec["y"], title=spec["title"])
    if kind == "line":
        return px.line(df, x=spec["x"], y=spec["y"], title=spec["title"])
    return px.pie(
        df, names=spec["x"], values=spec["y"], title=spec["title"]
    )
