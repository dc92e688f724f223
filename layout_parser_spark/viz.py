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


def draw_text_svg(
    page_w: float,
    page_h: float,
    blocks,
    arrangement: str = "lr",
    font_size: int = 12,
    text_color: str = "#000000",
    text_background_color: str = "#ffffff",
    text_background_alpha: float = 1.0,
    with_box_on_text: bool = False,
    text_box_alpha: float = 0.5,
    with_layout: bool = False,
    scale: float = 0.5,
) -> str:
    """SVG analogue of the reference's ``draw_text``
    (visualization.py:417-571): a side-by-side canvas — the original box
    layout on one side, each block's TEXT drawn at its own coordinates on
    the other — for visual comparison.  ``arrangement`` 'lr' (left/right)
    or 'ud' (up/down); alphas validated like the reference
    (visualization.py:506-511)."""
    if not 0 <= text_background_alpha <= 1:
        raise ValueError("The text_background_alpha value must be within [0, 1]")
    if not 0 <= text_box_alpha <= 1:
        raise ValueError("The text_box_alpha value must be within [0, 1]")
    if arrangement not in ("lr", "ud"):
        raise ValueError(f"Invalid arrangement {arrangement!r} (use 'lr' or 'ud')")

    if arrangement == "lr":
        total_w, total_h = 2 * page_w, page_h
        dx, dy = page_w, 0.0
    else:
        total_w, total_h = page_w, 2 * page_h
        dx, dy = 0.0, page_h

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" '
        f'width="{total_w * scale:.0f}" height="{total_h * scale:.0f}" '
        f'viewBox="0 0 {total_w:.0f} {total_h:.0f}">'
    ]
    # text panel background
    parts.append(
        f'<rect x="{dx:.0f}" y="{dy:.0f}" width="{page_w:.0f}" '
        f'height="{page_h:.0f}" fill="{text_background_color}" '
        f'fill-opacity="{text_background_alpha:.2f}"/>'
    )
    inner = draw_blocks_svg(page_w, page_h, blocks, scale=1.0)
    # strip the outer <svg> wrapper and re-embed as the layout panel
    body = inner[inner.index(">") + 1 : inner.rindex("</svg>")]
    parts.append(f"<g>{body}</g>")
    if with_layout:
        # reference with_layout=True also draws the boxes on the text
        # panel (visualization.py:545-553)
        parts.append(
            f'<g transform="translate({dx:.0f},{dy:.0f})" opacity="0.4">'
            f"{body}</g>"
        )
    for b in blocks:
        d = b.asDict() if hasattr(b, "asDict") else dict(b)
        if d.get("block_type") == "quadrilateral" and d.get("points"):
            x, y = d["points"][0], d["points"][1]
        else:
            x, y = d.get("x_1") or 0, d.get("y_1") or 0
        txt = d.get("text") or ""
        if with_box_on_text:
            color = _PALETTE.get(d.get("type") or "", "#333333")
            x2 = d.get("x_2") or x
            y2 = d.get("y_2") or y
            parts.append(
                f'<rect x="{x + dx:.1f}" y="{y + dy:.1f}" '
                f'width="{x2 - x:.1f}" height="{y2 - y:.1f}" fill="none" '
                f'stroke="{color}" stroke-opacity="{text_box_alpha:.2f}"/>'
            )
        parts.append(
            f'<text x="{x + dx:.1f}" y="{y + dy + font_size:.1f}" '
            f'font-size="{font_size}" fill="{text_color}">'
            f"{escape(txt[:120])}</text>"
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
