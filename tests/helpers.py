"""Assertion helpers: compare collected TEXTBLOCK struct Rows against
expected reference-style dicts (only the features the reference element
would carry; everything else must be NULL)."""

from __future__ import annotations

import math

META = ("text", "id", "type", "parent", "next", "score")
FEATURES = {
    "interval": ("start", "end", "axis", "canvas_height", "canvas_width"),
    "rectangle": ("x_1", "y_1", "x_2", "y_2"),
    "quadrilateral": ("points", "height", "width"),
}


def _close(a, b, tol=1e-9):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, str) or isinstance(b, str):
        return a == b
    if isinstance(a, (list, tuple)):
        return len(a) == len(b) and all(_close(x, y, tol) for x, y in zip(a, b))
    return math.isclose(float(a), float(b), rel_tol=tol, abs_tol=tol)


def assert_block(row, block_type, meta=None, **features):
    d = row.asDict(recursive=True) if hasattr(row, "asDict") else dict(row)
    assert d["block_type"] == block_type, d
    own = FEATURES[block_type]
    for name in own:
        exp = features.get(name)
        if name in ("canvas_height", "canvas_width") and exp is None:
            exp = 0.0  # Interval.__init__ coerces falsy canvas dims to 0
        assert _close(d[name], exp), f"{name}: {d[name]!r} != {exp!r} ({d})"
    # features of OTHER shapes must be NULL (sparse tagged union)
    for bt, names in FEATURES.items():
        if bt == block_type:
            continue
        for name in names:
            if name in own:
                continue
            assert d[name] is None, f"{name} should be NULL, got {d[name]!r}"
    meta = meta or {}
    for name in META:
        assert _close(d[name], meta.get(name)), (
            f"meta {name}: {d[name]!r} != {meta.get(name)!r}"
        )


def assert_points_close(row, expected_flat, tol=1e-6):
    d = row.asDict(recursive=True) if hasattr(row, "asDict") else dict(row)
    assert d["block_type"] == "quadrilateral", d
    got = d["points"]
    assert len(got) == 8
    for g, e in zip(got, expected_flat):
        assert math.isclose(g, e, rel_tol=tol, abs_tol=tol), (got, expected_flat)
