"""Driver-window rotation invariant (established round 5): the driver's
correctness harness checks only the FIRST 50 ``queries()`` keys, so any
key past index 49 gets no fresh driver row.  The invariant is that every
tail query was driver-green within the last TWO recorded rounds — a
builder who forgets to rotate the window sees this fail instead of a
judge seeing stale coverage."""

import glob
import json
import os
import re

import __spark_entry__ as entry

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def _correctness_rounds():
    """{round_number: {query: all-green bool}} from CORRECTNESS_r*.json."""
    out = {}
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            data = json.load(f)
        out[int(m.group(1))] = {
            name: bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            )
            for name, row in data.items()
        }
    return out


def test_tail_queries_were_green_within_two_rounds():
    rounds = _correctness_rounds()
    assert rounds, "no CORRECTNESS_r*.json found"
    recent = sorted(rounds)[-2:]
    stale = {}
    for name in list(entry.queries())[WINDOW:]:
        ok_rounds = [r for r in recent if rounds[r].get(name)]
        if not ok_rounds:
            last_green = max(
                (r for r in rounds if rounds[r].get(name)), default=None
            )
            stale[name] = f"last green: r{last_green}"
    assert stale == {}, (
        f"tail queries without a green driver row in rounds {recent}: "
        f"{stale} — rotate them back into the first-{WINDOW} window"
    )


def test_front_window_covers_every_new_or_changed_query():
    """Every query that has NEVER had a driver row must sit in the
    checked front window (new queries start at the front)."""
    rounds = _correctness_rounds()
    seen = set()
    for rows in rounds.values():
        seen.update(rows)
    q = list(entry.queries())
    never_checked_in_tail = [n for n in q[WINDOW:] if n not in seen]
    assert never_checked_in_tail == [], (
        f"never-driver-checked queries hidden in the tail: "
        f"{never_checked_in_tail}"
    )
