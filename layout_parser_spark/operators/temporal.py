"""Temporal join operators Spark's DataFrame API lacks as primitives:
as-of join and bucketed range join — re-expressed as compositions of
built-in ops (union+window, bucket-explode+equi-join) so Catalyst keeps
optimizing them; no Python anywhere.

* ``asof_join`` — each left row matched to the LATEST right row with
  ``right.ts <= left.ts`` per key (the event↔dimension-snapshot join:
  prices, configs, crawler policies at fetch time).  The distributed
  shape is the UNION trick: tag both sides, sort per key by
  (ts, side) with the right side first on ties, carry the right
  payload forward with ``last_value(ignoreNulls)`` over an unbounded
  preceding window, keep left rows.  ONE shuffle on the key — no
  per-key Python, no range self-join.
* ``range_join`` — join points to intervals (lo ≤ v < hi) via the
  standard bucketing decomposition: each interval explodes to the
  fixed-width buckets it overlaps, points map to their bucket, the join
  is an EQUI-join on the bucket with the exact predicate as a residual
  filter.  Candidate count per point is bounded by intervals-per-bucket
  — never the full cross product a naive theta-join plans.

Both have exact oracles: DuckDB ships a native ASOF JOIN, and the range
join checks against the plain inequality join.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: List[str],
    ts_col: str = "ts",
    direction: str = "backward",
) -> DataFrame:
    """All left columns + the right side's non-key payload columns from
    the latest right row at-or-before the left row's timestamp (NULLs
    when no prior right row exists).  ``direction='backward'`` only (the
    asof semantics the snapshot join needs)."""
    if direction != "backward":
        raise ValueError("only backward as-of is implemented")
    payload = [
        c for c in right.columns if c not in set(on) | {ts_col}
    ]
    clash = sorted(set(left.columns) & set(payload))
    if clash:
        # silently nulling the left columns (the union alignment below
        # overwrites same-named ones) would return corrupted left data
        raise ValueError(
            f"asof_join: left columns {clash} collide with right payload "
            "columns — rename or drop them on one side first"
        )
    lt = left.withColumn("_side", F.lit(1))
    rt = right.select(
        *on, ts_col, *payload
    ).withColumn("_side", F.lit(0))
    # align schemas: left lacks payload, right lacks left extras
    for c in payload:
        lt = lt.withColumn(c, F.lit(None).cast(rt.schema[c].dataType))
    left_extras = [
        c for c in left.columns if c not in set(on) | {ts_col}
    ]
    for c in left_extras:
        rt = rt.withColumn(c, F.lit(None).cast(lt.schema[c].dataType))
    u = lt.select(*on, ts_col, "_side", *left_extras, *payload).unionByName(
        rt.select(*on, ts_col, "_side", *left_extras, *payload)
    )
    # right rows sort BEFORE left rows at equal ts → "<=" semantics
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        *on, ts_col, "_side", *left_extras,
        *[
            F.last(
                F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True
            ).over(w).alias(c)
            for c in payload
        ],
    )
    return carried.where(F.col("_side") == 1).drop("_side")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float = 10.0,
) -> DataFrame:
    """Rows of ``points`` joined to every interval with
    ``lo <= value < hi`` — bucketed so the planner gets an equi-join on
    ``floor(coordinate / bucket_width)`` plus the exact residual
    predicate.  Pick ``bucket_width`` near the typical interval length:
    each interval then explodes into O(1) buckets and each point probes
    one bucket."""
    bw = float(bucket_width)
    ib = intervals.withColumn(
        "_b",
        F.explode_outer(
            F.sequence(
                F.floor(F.col(lo_col) / bw).cast("long"),
                F.floor(
                    (F.col(hi_col) - F.lit(1e-9)) / bw
                ).cast("long"),
            )
        ),
    ).where(F.col("_b").isNotNull())
    pb = points.withColumn(
        "_b", F.floor(F.col(value_col) / bw).cast("long")
    )
    return (
        pb.join(ib, on="_b")
        .where(
            (F.col(value_col) >= F.col(lo_col))
            & (F.col(value_col) < F.col(hi_col))
        )
        .drop("_b")
    )


def hypertable_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    key_cols: List[str] = ("user_id",),
    value_col: str = "value",
    fine: str = "hour",
    coarse: str = "day",
) -> DataFrame:
    """Timescale-style continuous-aggregate rollup: the FINE level
    aggregates raw events into time buckets; the COARSE level aggregates
    FROM THE FINE PARTIALS, not from raw — the shape that lets a 100 TB
    hypertable maintain day/month rollups by touching only hour partials
    (all aggregates here are re-aggregable: count/sum/min/max).

    Output: key_cols + (level, bucket_ts, n_events, sum_value,
    min_value, max_value) stacked for both levels."""
    keys = list(key_cols)
    fine_agg = (
        events.groupBy(
            *keys, F.date_trunc(fine, F.col(ts_col)).alias("bucket_ts")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
    )
    coarse_agg = (
        fine_agg.groupBy(
            *keys,
            F.date_trunc(coarse, F.col("bucket_ts")).alias("bucket_ts"),
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )
    return fine_agg.withColumn("level", F.lit(fine)).unionByName(
        coarse_agg.withColumn("level", F.lit(coarse))
    )
