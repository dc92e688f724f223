"""Pure-python oracle of the reference geometry semantics for
property-based testing (independent of the Spark expression library).

Shapes are dicts: {"kind": "i", "start", "end", "axis", "ch", "cw"} or
{"kind": "r", "x1", "y1", "x2", "y2"} or {"kind": "q", "pts": [(x,y)×4]}.
Semantics mirror /root/reference/src/layoutparser/elements/layout_elements.py.
"""

from __future__ import annotations


def coords(s):
    if s["kind"] == "i":
        if s["axis"] == "x":
            return (s["start"], 0.0, s["end"], s["ch"])
        return (0.0, s["start"], s["cw"], s["end"])
    if s["kind"] == "r":
        return (s["x1"], s["y1"], s["x2"], s["y2"])
    xs = [p[0] for p in s["pts"]]
    ys = [p[1] for p in s["pts"]]
    return (min(xs), min(ys), max(xs), max(ys))


def center(s):
    if s["kind"] == "r":
        return ((s["x1"] + s["x2"]) / 2.0, (s["y1"] + s["y2"]) / 2.0)
    if s["kind"] == "q":
        xs = [p[0] for p in s["pts"]]
        ys = [p[1] for p in s["pts"]]
        return (sum(xs) / 4.0, sum(ys) / 4.0)
    raise ValueError("interval center is 1-D")


def _vertex_in_poly(v, pts):
    sx = [p[0] - v[0] for p in pts]
    sy = [p[1] - v[1] for p in pts]
    for i in range(4):
        j = (i + 1) % 4
        if sx[i] * sy[j] - sy[i] * sx[j] < 0:
            return False
    return True


def is_in(a, o, center_mode=False):
    """layout_elements.py:268-297 / :620-657 / :981-1018.  The reference
    ALWAYS calls other.pad(**soft_margin) with safe_mode=True — so even
    with no soft margin, `other`'s negative coordinates clamp to 0 first
    (pad defined further down in this module)."""
    o = pad(o)
    ox1, oy1, ox2, oy2 = coords(o)
    if a["kind"] == "i":
        c = (a["start"] + a["end"]) / 2.0
        if o["kind"] == "i":
            if a["axis"] != o["axis"]:
                return False
            if center_mode:
                return o["start"] <= c <= o["end"]
            return o["start"] <= a["start"] <= a["end"] <= o["end"]
        lo, hi = (ox1, ox2) if a["axis"] == "x" else (oy1, oy2)
        if center_mode:
            return lo <= c <= hi
        return lo <= a["start"] <= a["end"] <= hi
    # rect / quad self
    ax1, ay1, ax2, ay2 = coords(a)
    cx, cy = center(a)
    if o["kind"] == "i":
        if o["axis"] == "x":
            if center_mode:
                return o["start"] <= cx <= o["end"]
            return o["start"] <= ax1 <= ax2 <= o["end"]
        if center_mode:
            return o["start"] <= cy <= o["end"]
        return o["start"] <= ay1 <= ay2 <= o["end"]
    if o["kind"] == "r":
        if center_mode:
            return ox1 <= cx <= ox2 and oy1 <= cy <= oy2
        return ox1 <= ax1 <= ax2 <= ox2 and oy1 <= ay1 <= ay2 <= oy2
    # o quad
    if center_mode:
        return _vertex_in_poly((cx, cy), o["pts"])
    if a["kind"] == "q":
        verts = a["pts"]
    else:
        verts = [(ax1, ay1), (ax2, ay1), (ax2, ay2), (ax1, ay2)]
    return all(_vertex_in_poly(v, o["pts"]) for v in verts)


def _ixr(i, rc, lo, hi):
    """Interval × rect-coords combine (layout_elements.py:312-323/:360-371):
    lo/hi = (max, min) for intersect, (min, max) for union."""
    x1, y1, x2, y2 = rc
    if i["axis"] == "x":
        return ("r", lo(x1, i["start"]), y1, hi(x2, i["end"]), y2)
    return ("r", x1, lo(y1, i["start"]), x2, hi(y2, i["end"]))


def intersect(a, o):
    """strict=False semantics (quads downcast to bbox)."""
    if a["kind"] == "i" and o["kind"] == "i":
        if a["axis"] == o["axis"]:
            return (
                "i",
                max(a["start"], o["start"]),
                min(a["end"], o["end"]),
                a["axis"],
                a["ch"],
                a["cw"],
            )
        if a["axis"] == "x":
            return ("r", a["start"], o["start"], a["end"], o["end"])
        return ("r", o["start"], a["start"], o["end"], a["end"])
    if a["kind"] == "i":
        return _ixr(a, coords(o), max, min)
    if o["kind"] == "i":
        return _ixr(o, coords(a), max, min)
    ax1, ay1, ax2, ay2 = coords(a)
    ox1, oy1, ox2, oy2 = coords(o)
    return ("r", max(ax1, ox1), max(ay1, oy1), min(ax2, ox2), min(ay2, oy2))


def union(a, o, compat=True):
    """strict=False semantics; compat replicates the Rectangle.union(
    Interval) bug (only for TRUE-rectangle self)."""
    if a["kind"] == "i" and o["kind"] == "i":
        assert a["axis"] == o["axis"], "cross-axis union raises"
        return (
            "i",
            min(a["start"], o["start"]),
            max(a["end"], o["end"]),
            a["axis"],
            a["ch"],
            a["cw"],
        )
    if a["kind"] == "i":
        return _ixr(a, coords(o), min, max)
    if o["kind"] == "i":
        if compat and a["kind"] == "r":
            return _ixr(o, coords(a), max, min)  # the bug: intersection
        return _ixr(o, coords(a), min, max)
    ax1, ay1, ax2, ay2 = coords(a)
    ox1, oy1, ox2, oy2 = coords(o)
    return ("r", min(ax1, ox1), min(ay1, oy1), max(ax2, ox2), max(ay2, oy2))


def pad(s, left=0, right=0, top=0, bottom=0, safe=True):
    if s["kind"] == "i":
        if s["axis"] == "x":
            start, end = s["start"] - left, s["end"] + right
        else:
            start, end = s["start"] - top, s["end"] + bottom
        if safe:
            start = max(0.0, start)
        return dict(s, start=start, end=end)
    if s["kind"] == "r":
        x1, y1 = s["x1"] - left, s["y1"] - top
        if safe:
            x1, y1 = max(0.0, x1), max(0.0, y1)
        return dict(s, x1=x1, y1=y1, x2=s["x2"] + right, y2=s["y2"] + bottom)
    # quad: stable rank-order maps
    xs = [p[0] for p in s["pts"]]
    ys = [p[1] for p in s["pts"]]

    def ranks(vals):
        out = []
        for i, v in enumerate(vals):
            r = sum(1 for j, u in enumerate(vals) if u < v or (u == v and j < i))
            out.append(r)
        return out

    xr, yr = ranks(xs), ranks(ys)
    pts = []
    for i in range(4):
        nx = xs[i] + (-left if xr[i] <= 1 else right)
        ny = ys[i] + (-top if yr[i] <= 1 else bottom)
        if safe:
            nx, ny = max(0.0, nx), max(0.0, ny)
        pts.append((nx, ny))
    return dict(s, pts=pts)
