"""Driver-side debug visualization (SURVEY §2.9).

The reference draws boxes/text onto PIL canvases (visualization.py:224-571).
That is presentation, not data processing — the engine keeps only a tiny
sampled-rows debug helper, and renders SVG strings (zero image deps) with
the same information content: one rect/outline per block, label = type,
opacity by score.
"""

from __future__ import annotations

from html import escape
from typing import Optional

_PALETTE = {
    "Text": "#4c78a8",
    "Title": "#f58518",
    "List": "#54a24b",
    "Table": "#b279a2",
    "Figure": "#e45756",
    "Header": "#9d755d",
    "Footer": "#9d755d",
    "Nav": "#bab0ac",
    "Aside": "#bab0ac",
}


def draw_blocks_svg(
    page_w: float,
    page_h: float,
    blocks,
    show_text: bool = False,
    scale: float = 0.5,
) -> str:
    """blocks: iterable of TEXTBLOCK Rows/dicts (rectangles or quads)."""
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" '
        f'width="{page_w * scale:.0f}" height="{page_h * scale:.0f}" '
        f'viewBox="0 0 {page_w:.0f} {page_h:.0f}">'
    ]
    for b in blocks:
        d = b.asDict() if hasattr(b, "asDict") else dict(b)
        color = _PALETTE.get(d.get("type") or "", "#333333")
        op = 0.25 + 0.5 * float(d.get("score") or 1.0)
        if d.get("block_type") == "quadrilateral" and d.get("points"):
            pts = d["points"]
            pstr = " ".join(
                f"{pts[2*i]:.1f},{pts[2*i+1]:.1f}" for i in range(4)
            )
            parts.append(
                f'<polygon points="{pstr}" fill="{color}" '
                f'fill-opacity="{op*0.3:.2f}" stroke="{color}"/>'
            )
            x, y = pts[0], pts[1]
        else:
            x, y = d.get("x_1") or 0, d.get("y_1") or 0
            w = (d.get("x_2") or 0) - x
            h = (d.get("y_2") or 0) - y
            parts.append(
                f'<rect x="{x:.1f}" y="{y:.1f}" width="{w:.1f}" '
                f'height="{h:.1f}" fill="{color}" '
                f'fill-opacity="{op*0.3:.2f}" stroke="{color}"/>'
            )
        label = d.get("type") or d.get("block_type") or ""
        if show_text and d.get("text"):
            label = f"{label}: {d['text'][:40]}"
        parts.append(
            f'<text x="{x + 3:.1f}" y="{y + 14:.1f}" font-size="12" '
            f'fill="{color}">{escape(label)}</text>'
        )
    parts.append("</svg>")
    return "".join(parts)


def draw_sample(
    df,
    n: int = 3,
    blocks_col: str = "blocks",
    out_path: Optional[str] = None,
) -> list:
    """Sample n documents from a layout DataFrame and render each to SVG;
    optionally write <out_path>/doc_<i>.svg.  Debug only — collects to the
    driver by design."""
    rows = df.select("page_data", blocks_col).limit(n).collect()
    svgs = []
    for i, r in enumerate(rows):
        pd_ = r.page_data
        svg = draw_blocks_svg(
            pd_["width"] or 1280, pd_["height"] or 1000, r[blocks_col]
        )
        svgs.append(svg)
        if out_path:
            import os

            os.makedirs(out_path, exist_ok=True)
            with open(f"{out_path}/doc_{i}.svg", "w") as f:
                f.write(svg)
    return svgs
