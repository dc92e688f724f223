"""Plan lint over the ENTIRE driver contract: no query may plan a
Cartesian product, and BroadcastNestedLoopJoin is allowed only where the
broadcast side is a known O(1)-size constant (a one-row corpus total, a
4-row region dim, the query-vector set, a centroid-array attach).

This is the scale regression guard: a refactor that silently turns an
equi-join into a cross join fails here long before it fails at 100 TB.
Planning only — nothing executes."""

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"

#: BNLJ against an O(1)-size broadcast side — benign by construction.
BNLJ_ALLOWED = {
    "geom_is_in_join",      # 4-row region dim, crossJoin+aggregate
    "docs_lm_score",        # one-row corpus-total attach
    "ann_cosine_topk",      # broadcast query-vector set (exact baseline)
    "ann_ivf",              # one-row centroid-array attach
    "ann_ivf_kmeans",       # same, per k-means round
    "ann_pq",               # one-row codebook attaches + broadcast
                            # query-table set (the ADC scan pattern)
}


def test_no_cartesian_or_unexpected_bnlj(spark):
    offenders = {}
    for name, fn in entry.queries().items():
        plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_ALLOWED:
            flags.append("BroadcastNestedLoopJoin")
        if flags:
            offenders[name] = flags
    assert offenders == {}, f"scale-hostile join shapes: {offenders}"


def test_constructed_geometry_folds_to_arithmetic(spark):
    """Constructor-folding guard (BENCH/PLANS.md r4): queries that CONSTRUCT
    blocks with a literal block_type must optimize to bare scan-column
    arithmetic — no materialized block struct, no runtime block_type
    dispatch.  A refactor that re-stages the constructor through an
    aliased projection reintroduces a 24-field per-row struct build and a
    CASE WHEN per geometry op (3-4x slower at sf0.1, worse at scale)."""
    qs = entry.queries()
    for name in ["geom_rect_algebra", "geom_quad_shoelace"]:
        plan = qs[name](spark, SF)._jdf.queryExecution().optimizedPlan().toString()
        assert "block_type" not in plan, f"{name}: unfolded type dispatch"
        assert "struct(" not in plan, f"{name}: materialized block struct"
    # hybrid queries stage exactly ONE struct level (its literal
    # block_type FIELD may appear in the plan); the constructor level
    # below must still fold — no runtime dispatch COMPARISON survives
    for name in ["geom_interval_ops", "geom_intersect_union"]:
        plan = qs[name](spark, SF)._jdf.queryExecution().optimizedPlan().toString()
        assert ".block_type =" not in plan, f"{name}: unfolded type dispatch"
