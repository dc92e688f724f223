"""Property pins for the xxhash64-based operators that have no SQL oracle:
MinHash+LSH, SimHash, random-hyperplane LSH — plus the grouping/CCA tools
ported from test_tools.py."""

import pytest
from pyspark.sql import functions as F

from layout_parser_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_buckets,
    word_shingles,
)
from layout_parser_spark.operators.grouping import (
    detect_lines_local,
    gcca_1d,
)
from layout_parser_spark.operators.similarity import cosine_topk, lsh_topk, ivf_topk


BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "near the warm fire and dreams of fish"
)


@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = [
        (0, BASE, "s"),
        (1, BASE, "s"),  # exact duplicate of 0
        (2, BASE.replace("dog", "wolf"), "s"),  # near-dup of 0
        (3, "completely different words about spark query engines and "
            "columnar execution with vectorized operators", "s"),
        (4, "another unrelated text mentioning parquet iceberg shuffle "
            "partitions and adaptive execution plans", "s"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_minhash_lsh_finds_dups(spark, dup_docs):
    pairs = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_lsh_pairs(
            dup_docs, num_hashes=32, bands=16, threshold=0.3
        ).collect()
    }
    assert pairs.get((0, 1)) == 1.0  # exact dup: all signatures agree
    assert (0, 2) in pairs or (1, 2) in pairs  # near-dup found
    assert (0, 3) not in pairs and (3, 4) not in pairs


def test_simhash_hamming(spark, dup_docs):
    rows = simhash_buckets(dup_docs).collect()
    ham = {(r.id_a, r.id_b): r.hamming for r in rows}
    assert ham.get((0, 1)) == 0  # identical text → identical simhash
    if (0, 2) in ham:
        assert ham[(0, 2)] <= 16  # near-dup → small distance
    # unrelated docs should not collide in all-bucket terms with tiny dist
    for k, v in ham.items():
        if k in [(0, 3), (1, 3), (0, 4)]:
            assert v > 4


def test_ngram_jaccard_exact_pair(spark, dup_docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            dup_docs, threshold=0.1, block_col="source"
        ).collect()
    }
    assert pairs.get((0, 1)) == 1.0
    assert 0.5 < pairs.get((0, 2), 0) < 1.0  # one word changed


def test_lsh_topk_recall_vs_bruteforce(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb = emb.withColumn("embedding", F.col("embedding").cast("array<double>"))
    q = emb.where("vec_id < 2").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    v = emb.where("vec_id >= 2")
    exact = cosine_topk(v, q, k=10).collect()
    approx = lsh_topk(v, q, dim=64, k=10, n_planes=2).collect()
    exact_ids = {(r.query_id, r.vec_id) for r in exact}
    approx_ids = {(r.query_id, r.vec_id) for r in approx}
    # 2 planes → 4 buckets → ~25% of vectors share the query's bucket;
    # recall of the true top-10 should be well above random
    recall = len(exact_ids & approx_ids) / len(exact_ids)
    assert recall >= 0.2, recall
    # approx results are genuine (scores match the exact computation)
    exact_scores = {(r.query_id, r.vec_id): r.cosine_sim for r in exact}
    for r in approx:
        if (r.query_id, r.vec_id) in exact_scores:
            assert abs(exact_scores[(r.query_id, r.vec_id)] - r.cosine_sim) < 1e-9


def test_ivf_full_probe_equals_exact(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb = emb.withColumn("embedding", F.col("embedding").cast("array<double>"))
    q = emb.where("vec_id < 2").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    v = emb.where("vec_id >= 2")
    exact = {(r.query_id, r.rank): r.vec_id for r in cosine_topk(v, q, k=5).collect()}
    ivf = {(r.query_id, r.rank): r.vec_id for r in ivf_topk(v, q, k=5, nlist=8, nprobe=8).collect()}
    assert exact == ivf  # nprobe == nlist → exhaustive → exact


# ---------------------------------------------------------------------------
# grouping tools — ported from reference tests/test_tools.py
# ---------------------------------------------------------------------------
def test_gcca_integer_sequences():
    """test_tools.py:22-52: tolerance-1 CCA over [1,2,3,5,6,7] → 2 comps."""
    seq = [1, 2, 3, 5, 6, 7]
    comps = gcca_1d(seq, lambda a, b: abs(a - b) <= 1)
    assert comps == [[1, 2, 3], [5, 6, 7]]
    comps = gcca_1d(seq, lambda a, b: abs(a - b) <= 2)
    assert comps == [[1, 2, 3, 5, 6, 7]]
    # aggregation function applied per component
    comps = gcca_1d(seq, lambda a, b: abs(a - b) <= 1, sum)
    assert comps == [6, 18]


def test_line_detection_tolerance_swap():
    """The call-site tolerance swap (shape_operations.py:126-130): passing
    asymmetric tolerances must behave SWAPPED — x_tolerance acts on y."""
    # two tokens on the same row, 5px horizontal gap, same center y
    a = (0.0, 0.0, 10.0, 10.0)
    b = (15.0, 0.0, 25.0, 10.0)
    # gap = 5; same y.  y_tolerance (which acts as the horizontal gap
    # budget, due to the swap) = 6 → merged; 4 → not merged.
    assert len(detect_lines_local([a, b], x_tolerance=0, y_tolerance=6)) == 1
    assert len(detect_lines_local([a, b], x_tolerance=0, y_tolerance=4)) == 2
    # vertical offset 5 with x_tolerance (vertical budget, swapped) 6 vs 4
    c = (15.0, 5.0, 25.0, 15.0)
    assert len(detect_lines_local([a, c], x_tolerance=6, y_tolerance=6)) == 1
    assert len(detect_lines_local([a, c], x_tolerance=4, y_tolerance=6)) == 2


def test_line_detection_counts_multirow():
    """Default tolerances group a 2-row word grid into 2 lines (the
    reference invariant style: 15 lines on example.pdf)."""
    row1 = [(i * 20.0, 0.0, i * 20.0 + 15.0, 10.0) for i in range(5)]
    row2 = [(i * 20.0, 30.0, i * 20.0 + 15.0, 40.0) for i in range(5)]
    lines = detect_lines_local(row1 + row2)
    assert len(lines) == 2
    assert lines[0] == (0.0, 0.0, 95.0, 10.0)
    assert lines[1] == (0.0, 30.0, 95.0, 40.0)


def test_gcca_apply_matches_local_kernel(spark):
    """The distributed generic-scoring slot (gcca_apply) equals the
    reference-form local gcca_1d run per document, for an asymmetric
    custom scoring function."""
    import random

    from layout_parser_spark.operators.grouping import (
        _union_boxes,
        gcca_apply,
        gcca_1d,
    )

    rng = random.Random(5)
    rows = []
    for doc in range(6):
        for i in range(rng.randint(1, 25)):
            x1 = rng.uniform(0, 200)
            y1 = rng.uniform(0, 200)
            rows.append(
                (doc, i, x1, y1, x1 + rng.uniform(5, 60), y1 + 10.0)
            )
    df = spark.createDataFrame(
        rows,
        "doc long, block_id long, x_1 double, y_1 double, "
        "x_2 double, y_2 double",
    )

    def score(a, b):  # ≥40% x-overlap of the narrower box
        ov = min(a[2], b[2]) - max(a[0], b[0])
        return 1 if ov >= 0.4 * min(a[2] - a[0], b[2] - b[0]) else 0

    got = {}
    out = gcca_apply(
        df.repartition(5), ["doc"], score, id_col="block_id"
    ).collect()
    for r in out:
        got.setdefault(r.doc, {})[r.comp_id] = (
            round(r.x_1, 9), round(r.y_1, 9),
            round(r.x_2, 9), round(r.y_2, 9), r.n_blocks,
        )
    for doc in range(6):
        boxes = [
            (r[2], r[3], r[4], r[5])
            for r in sorted(rows, key=lambda t: t[1]) if r[0] == doc
        ]
        want = {
            ci: (*[round(v, 9) for v in _union_boxes(comp)], len(comp))
            for ci, comp in enumerate(
                gcca_1d(boxes, score, lambda xs: xs)
            )
        }
        assert got[doc] == want, f"doc {doc}"


def test_embedding_near_dup_lsh_path_recall(spark):
    """Unblocked embedding_near_dup_pairs must use LSH candidates (an
    equi-join, never a cross join) and recover most true near-dup pairs;
    every emitted score must equal the exact cosine."""
    from layout_parser_spark.operators.dedup import embedding_near_dup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb = emb.withColumn("embedding", F.col("embedding").cast("array<double>"))

    thr = 0.3
    # exact all-pairs baseline via the blocked path with ONE block
    exact = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in embedding_near_dup_pairs(
            emb.withColumn("one", F.lit(1)), threshold=thr, block_col="one"
        ).collect()
    }
    # r/b matched to the LOW test threshold: p(0.3) ≈ 0.60 → recall
    # 1−(1−p²)⁸ ≈ 0.97.  The default (r=6, b=4) targets s ≥ 0.9.
    approx_df = embedding_near_dup_pairs(
        emb, threshold=thr, block_col=None, n_planes=2, n_tables=8
    )
    # plan shape: candidate generation must be an equi-join (hash/sort-merge
    # join with join keys), not a cartesian/broadcast-nested-loop product
    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    approx = {(r.id_a, r.id_b): r.cosine_sim for r in approx_df.collect()}

    assert exact, "baseline found no pairs — test corpus/threshold wrong"
    recall = len(set(approx) & set(exact)) / len(exact)
    assert recall >= 0.5, (recall, len(exact), len(approx))
    for k, v in approx.items():
        assert k in exact and abs(exact[k] - v) < 1e-9


def test_detect_lines_distributed_equals_local(spark):
    """The pure-relational CCA (banded candidate join + min-label
    propagation) must produce exactly the per-document kernel's lines —
    same boxes, counts, AND line_id order."""
    from layout_parser_spark.operators.grouping import (
        detect_lines_distributed,
        detect_lines_local,
    )

    # deterministic corpus: several docs, multi-row word grids with
    # varying gaps (some above tolerance), plus chained overlaps that make
    # label propagation actually iterate
    rows = []
    for doc in range(6):
        boxes = []
        for r in range(4):
            for i in range(20):
                x = i * (12.0 + (r % 3))  # gap 12/13/14 vs eff_x_tol=10
                y = r * 30.0 + doc
                boxes.append((x, y, x + 10.0, y + 10.0))
        # a long chain on one line: 60 adjacent tokens
        for i in range(60):
            boxes.append((i * 15.0, 200.0 + doc, i * 15.0 + 10.0, 210.0 + doc))
        rows.extend(
            (doc, bid, *b) for bid, b in enumerate(boxes)
        )
    df = spark.createDataFrame(
        rows, "doc_id long, block_id long, x_1 double, y_1 double, "
              "x_2 double, y_2 double"
    )
    got = detect_lines_distributed(
        df, ["doc_id"], id_col="block_id", x_tolerance=10, y_tolerance=10
    ).collect()

    by_doc = {}
    for r in rows:
        by_doc.setdefault(r[0], []).append(tuple(r[2:]))
    expected = {}
    for doc, boxes in by_doc.items():
        for li, u in enumerate(detect_lines_local(boxes, 10, 10)):
            expected[(doc, li)] = u
    got_map = {(r.doc_id, r.line_id): (r.x_1, r.y_1, r.x_2, r.y_2) for r in got}
    assert got_map == expected
    # token counts: chain line has 60
    counts = {(r.doc_id, r.line_id): r.n_tokens for r in got}
    assert max(counts.values()) == 60


def test_kmeans_centroids_deterministic_and_improving(spark):
    """DataFrame-native Lloyd's k-means: deterministic across runs, and
    mean distortion (cosine to assigned centroid) does not decrease with
    iterations; full-probe IVF over trained centroids stays exact."""
    from layout_parser_spark.operators.similarity import (
        assign_to_centroids,
        cosine_topk,
        ivf_topk,
        kmeans_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb = emb.withColumn("embedding", F.col("embedding").cast("array<double>"))
    v = emb.where("vec_id >= 2")

    def mean_sim(cents):
        return (
            assign_to_centroids(v, cents)
            .agg(F.avg("c_sim"))
            .collect()[0][0]
        )

    c0 = kmeans_centroids(v, nlist=8, dim=64, iters=0)
    c3 = kmeans_centroids(v, nlist=8, dim=64, iters=3)
    c3b = kmeans_centroids(v, nlist=8, dim=64, iters=3)
    # determinism: identical centroids bit-for-bit
    rows_a = sorted((r.c_id, tuple(r.c_vec)) for r in c3.collect())
    rows_b = sorted((r.c_id, tuple(r.c_vec)) for r in c3b.collect())
    assert rows_a == rows_b
    # training improves (or at least never worsens) assignment similarity
    assert mean_sim(c3) >= mean_sim(c0) - 1e-9

    # full probe with trained centroids is still the exact answer
    q = emb.where("vec_id < 2").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = {(r.query_id, r.rank): r.vec_id for r in cosine_topk(v, q, k=5).collect()}
    ivf = {
        (r.query_id, r.rank): r.vec_id
        for r in ivf_topk(v, q, k=5, nlist=8, nprobe=8, centroids=c3).collect()
    }
    assert exact == ivf


def test_repeated_line_removal_newline_delim(spark):
    from layout_parser_spark.operators.dedup import repeated_line_removal

    nav = "home | products | contact"
    foot = "(c) 2026 example inc"
    docs = [
        (0, f"{nav}\nunique alpha\n{foot}"),
        (1, f"{nav}\nunique beta\n{foot}"),
        (2, f"{nav}\nunique gamma\n{foot}"),
        (3, f"{nav}\n{foot}"),  # boilerplate-only → empty after cleaning
        (4, "standalone page"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r.id: r
        for r in repeated_line_removal(df, delim="\n", max_df=2).collect()
    }
    assert out[0].clean_text == "unique alpha"
    assert out[1].clean_text == "unique beta"
    assert out[2].clean_text == "unique gamma"
    assert (out[0].n_kept, out[0].n_dropped) == (1, 2)
    assert out[3].clean_text == "" and out[3].n_kept == 0
    assert out[3].n_dropped == 2
    assert out[4].clean_text == "standalone page"  # df=1 survives


def test_repeated_line_removal_preserves_order(spark):
    from layout_parser_spark.operators.dedup import repeated_line_removal

    # repeated segment interleaved between unique ones; order must hold
    docs = [(i, f"u{i}a\nSPAM\nu{i}b\nSPAM\nu{i}c") for i in range(5)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r.id: r
        for r in repeated_line_removal(df, delim="\n", max_df=3).collect()
    }
    for i in range(5):
        assert out[i].clean_text == f"u{i}a\nu{i}b\nu{i}c"
        assert out[i].n_dropped == 2


def test_duplicated_span_removal(spark):
    from layout_parser_spark.operators.dedup import duplicated_span_removal

    spam = "click here to subscribe now"  # 5 tokens, shared verbatim
    docs = [
        (0, f"alpha beta gamma {spam} delta0"),
        (1, f"{spam} epsilon zeta eta theta1"),
        (2, "totally unique content with no repeats at all"),
        (3, f"{spam}"),  # nothing but the duplicated span
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.id: r for r in duplicated_span_removal(df, n=5).collect()}
    # the 5-token spam span occurs in docs 0, 1, 3 -> removed everywhere;
    # n=5 windows also cover tokens overlapping the span boundary
    assert spam.split()[0] not in out[0].clean_text
    assert out[2].clean_text == docs[2][1]  # unique doc untouched
    assert out[2].n_removed == 0
    assert out[3].clean_text == "" and out[3].n_removed == 5
    # every kept token order-preserved and from the original
    assert out[0].clean_text.startswith("alpha beta gamma")
    total = out[0].n_kept + out[0].n_removed
    assert total == len(docs[0][1].split())


def test_hashed_linear_score_exact(spark):
    """Hashing-trick classifier: integer weight sums computed by hand
    must match, and the broadcast-literal lookup must not join."""
    import hashlib

    from layout_parser_spark.operators.text_analysis import (
        hashed_linear_score,
        model_weights,
    )

    W = model_weights(1024)

    def lane(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)

    docs = [(0, "alpha beta gamma"), (1, "delta delta")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.id: (r.score_int, r.keep)
           for r in hashed_linear_score(df).collect()}
    for did, text in docs:
        want = sum(W[lane(t) % 1024] for t in text.split(" "))
        assert out[did] == (want, want > 0)
    plan = hashed_linear_score(df)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # weight lookup is a literal-array index


def test_hash_split_stability_and_packing(spark):
    """A doc's split never changes when the corpus grows; packing bins
    are contiguous in-order with offsets that match the running sum."""
    from pyspark.sql import functions as F

    from layout_parser_spark.operators.text_analysis import (
        hash_split,
        pack_sequences,
    )

    small = spark.range(0, 50).select(F.col("id").alias("doc_id"))
    big = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    s_small = {
        r.doc_id: r.s
        for r in small.select(
            "doc_id", hash_split(F.col("doc_id")).alias("s")
        ).collect()
    }
    s_big = {
        r.doc_id: r.s
        for r in big.select(
            "doc_id", hash_split(F.col("doc_id")).alias("s")
        ).collect()
    }
    assert all(s_big[k] == v for k, v in s_small.items())
    assert set(s_big.values()) == {"train", "val", "test"}

    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * (3 + i % 4))) for i in range(20)],
        "doc_id long, text string",
    )
    packed = sorted(
        pack_sequences(docs, target_tokens=10).collect(),
        key=lambda r: r.id,
    )
    run = 0
    for r in packed:
        assert r.bin_id == run // 10 and r.bin_offset == run % 10
        run += r.n_tokens


def test_pack_sequences_multi_part_sharding(spark):
    """part_col accepts a SEQUENCE of names (the 100 TB shape: compose
    the low-cardinality split with a shard key so no window reducer
    sorts a whole split); packing is then independent per (part, shard)
    group and equals the single-group packing of that group's docs."""
    from pyspark.sql import functions as F

    from layout_parser_spark.operators.text_analysis import pack_sequences

    docs = spark.createDataFrame(
        [
            (i, "a" if i % 2 else "b", i % 3, " ".join(["tok"] * (2 + i % 5)))
            for i in range(60)
        ],
        "doc_id long, grp string, shard long, text string",
    )
    out = pack_sequences(
        docs, target_tokens=7, part_col=["grp", "shard"]
    ).collect()
    # multi-col mode keeps the original column names
    assert {"grp", "shard"} <= set(out[0].asDict())
    by_group = {}
    for r in sorted(out, key=lambda r: r.id):
        by_group.setdefault((r.grp, r.shard), []).append(r)
    assert len(by_group) == 6
    for rows in by_group.values():
        run = 0
        for r in rows:  # id-ascending within the group
            assert r.bin_id == run // 7 and r.bin_offset == run % 7
            run += r.n_tokens


def test_pq_topk_recall_on_clustered_data(spark):
    """PQ + exact refinement equals brute force on clusterable vectors
    (recall-1 configuration); on pure-noise embeddings the lossy codes
    genuinely cannot guarantee that — which is why the driver query runs
    over the deterministic clustered fixture."""
    from pyspark.sql import functions as F

    from layout_parser_spark.operators.similarity import (
        cosine_topk,
        pq_topk,
    )

    DIM = 32

    def vec(c, d):
        return F.array(
            *[
                ((c * 31 + i * 17) % 13 - 6).cast("double")
                + ((d * 7 + i * 3) % 5 - 2).cast("double") * 0.01
                for i in range(DIM)
            ]
        )

    base = spark.range(200).select(F.col("id").alias("vec_id"))
    d = F.col("vec_id")
    vectors = base.select("vec_id", vec(d % 10, d).alias("embedding"))
    queries = spark.range(3).select(
        F.col("id").alias("query_id"),
        vec(F.col("id"), F.col("id") * 0).alias("query_vec"),
    )
    pq = sorted(
        (r.query_id, r.rank, r.vec_id, r.cosine_sim)
        for r in pq_topk(
            vectors, queries, k=5, m=4, k_codes=16, refine=40, dim=DIM
        ).collect()
    )
    ex = sorted(
        (r.query_id, r.rank, r.vec_id, round(r.cosine_sim, 6))
        for r in cosine_topk(vectors, queries, k=5).collect()
    )
    assert pq == ex


def test_scrub_pii_and_stratified_sample(spark):
    from pyspark.sql import functions as F

    from layout_parser_spark.operators.text_analysis import (
        scrub_pii,
        stratified_sample,
    )

    df = spark.createDataFrame(
        [
            (0, "mail a.b+c@x-corp.io now and 192.168.0.1 or +44 207-946-0958"),
            (1, "clean text with no identifiers at all"),
        ],
        "doc_id long, text string",
    )
    out = {r.id: r for r in scrub_pii(df).collect()}
    assert "<EMAIL>" in out[0].clean_text
    assert "<IP>" in out[0].clean_text
    assert "<PHONE>" in out[0].clean_text
    assert "a.b+c@x-corp.io" not in out[0].clean_text
    assert (out[0].n_emails, out[0].n_ips, out[0].n_phones) == (1, 1, 1)
    assert out[1].clean_text == "clean text with no identifiers at all"
    assert (out[1].n_emails, out[1].n_ips, out[1].n_phones) == (0, 0, 0)

    # sampler: rate-0 stratum drops everything, rate-1 keeps everything,
    # kept set is stable under corpus growth
    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "keepall").otherwise("dropall")
        .alias("source"),
    )
    kept = stratified_sample(
        docs, {"keepall": 1.0, "dropall": 0.0}, strata_col="source"
    ).collect()
    assert {r.source for r in kept} == {"keepall"}
    assert len(kept) == 150
    half = stratified_sample(
        docs, {"keepall": 0.5, "dropall": 0.0}, strata_col="source"
    )
    kept_ids = {r.doc_id for r in half.collect()}
    assert 45 <= len(kept_ids) <= 105  # ~50% of 150, hash-binomial
    grown = docs.union(
        spark.range(300, 600).select(
            F.col("id").alias("doc_id"), F.lit("keepall").alias("source")
        )
    )
    kept_ids2 = {
        r.doc_id
        for r in stratified_sample(
            grown, {"keepall": 0.5, "dropall": 0.0}, strata_col="source"
        ).collect()
        if r.doc_id < 300
    }
    assert kept_ids2 == kept_ids  # growth never flips a decision


def test_kmv_sketch_partition_invariant(spark):
    """The two-level bounded k-minima aggregation (level 1 per input
    partition, level 2 merge) must give the identical sketch for ANY
    partitioning of the input — the mergeability the operator advertises
    for 1000-executor combines."""
    from pyspark.sql import functions as F

    from layout_parser_spark.operators.dedup import kmv_distinct_sketch

    df = spark.range(5000).select(
        (F.col("id") % 7).alias("g"), F.col("id").cast("string").alias("v")
    )
    outs = []
    for nparts in (1, 13):
        rows = kmv_distinct_sketch(
            df.repartition(nparts), "v", k=32, group_cols=["g"]
        ).collect()
        outs.append(
            sorted((r.g, r.n_sketch, r.kth_lane, r.est_distinct)
                   for r in rows)
        )
    assert outs[0] == outs[1]


def test_cosine_topk_partition_invariant(spark):
    """The de-skewed partial-top-k path (per-partition k-minima → merge
    → posexplode rank) must be invariant to vector partitioning and must
    equal the straightforward global ranking."""
    import numpy as np
    from pyspark.sql import functions as F

    from layout_parser_spark.operators.similarity import cosine_topk

    rng = np.random.RandomState(11)
    vecs = [(i, [float(x) for x in rng.randn(8)]) for i in range(300)]
    qs = [(100 + j, [float(x) for x in rng.randn(8)]) for j in range(2)]
    v = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = spark.createDataFrame(
        qs, "query_id long, query_vec array<double>"
    )

    def rows(df):
        return sorted(
            (r.query_id, r.rank, r.vec_id, r.cosine_sim)
            for r in df.collect()
        )

    base = rows(cosine_topk(v.repartition(1), q, k=7))
    assert rows(cosine_topk(v.repartition(17), q, k=7)) == base
    # oracle: plain numpy global ranking with the same round-then-rank
    # and (sim desc, vec_id asc) tie-break
    want = []
    for qid, qv in qs:
        qv = np.array(qv)
        sims = [
            (round(float(
                np.dot(e, qv) / (np.linalg.norm(e) * np.linalg.norm(qv))
            ), 6), vid)
            for vid, e in ((vid, np.array(e)) for vid, e in vecs)
        ]
        sims.sort(key=lambda t: (-t[0], t[1]))
        want += [
            (qid, r + 1, vid, s) for r, (s, vid) in enumerate(sims[:7])
        ]
    assert base == sorted(want)


def test_kmv_sketch_properties(spark):
    """Exact below k; estimate within ~2/sqrt(k) above k; MERGEABLE:
    sketch(A ∪ B) == merge of sketch(A), sketch(B) by k-smallest."""
    import hashlib

    from pyspark.sql import functions as F

    from layout_parser_spark.operators.dedup import kmv_distinct_sketch

    small = spark.range(40).select(F.col("id").cast("string").alias("v"))
    r = kmv_distinct_sketch(small, "v", k=64).collect()[0]
    assert (r.n_sketch, r.est_distinct) == (40, 40)  # exact under k

    big = spark.range(20000).select(F.col("id").cast("string").alias("v"))
    r = kmv_distinct_sketch(big, "v", k=64).collect()[0]
    assert r.n_sketch == 64
    assert abs(r.est_distinct - 20000) / 20000 < 0.35  # 2/sqrt(64)=0.25ish

    # mergeability: python twin over md5 lanes
    def lane(x):
        return int(hashlib.md5(x.encode()).hexdigest()[:15], 16)

    a = sorted(lane(str(i)) for i in range(0, 10000))[:64]
    b = sorted(lane(str(i)) for i in range(5000, 20000))[:64]
    merged_kth = sorted(set(a) | set(b))[63]
    assert merged_kth == sorted(lane(str(i)) for i in range(20000))[63]


def test_minhash_vectorized_kernel_equals_column_fold(spark):
    """The Arrow signature kernel must be BIT-IDENTICAL to the pure-Column
    fold (minhash_from_bases) — including the empty-array identity [p]*k
    — so swapping execution paths can never change LSH results."""
    from layout_parser_spark.operators.dedup import (
        MINHASH_P,
        minhash_from_bases,
        minhash_signatures_vectorized,
    )

    # bases are always pmod(lane, p) upstream — the kernel/fold domain is
    # [0, p): a·x then stays < 2^62, exact in int64/BIGINT alike
    rows = [
        (0, [123456789, 987654321, 5, MINHASH_P - 1]),
        (1, [0]),
        (2, []),                      # empty → identity vector
        (3, list(range(1000, 1300))),  # chunk-filler
        (4, [MINHASH_P - 2, 1, MINHASH_P // 2]),
    ]
    df = spark.createDataFrame(rows, "id long, bases array<long>")
    fold = {r.id: r.sig for r in df.select(
        "id", minhash_from_bases(F.col("bases"), 16).alias("sig")).collect()}
    kern = {r.id: r.sig for r in df.select(
        "id", minhash_signatures_vectorized(16)(F.col("bases")).alias("sig")).collect()}
    # the fold returns [p]*k for empty input arrays as well
    assert kern == fold


def test_minhash_fused_text_kernel_equals_staged_pipeline(spark):
    """The r6 fused text→signature kernel (tokenize+shingle+md5+minima
    in one Arrow slot) must be BIT-IDENTICAL to the staged Column
    pipeline (split → shingles_from_tokens → minhash_base_hashes →
    vectorized minima) on real-ish and adversarial texts, so swapping
    the signature stage can never change LSH results."""
    from layout_parser_spark.operators.dedup import (
        minhash_base_hashes,
        minhash_signatures_from_text,
        minhash_signatures_vectorized,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "a b c",                       # exactly n tokens → one shingle
        "dup dup dup dup dup",         # repeated shingles → distinct set
        "x  y   z w",                  # empty tokens from double spaces
        "汉字 分词 测试 汉字 分词",       # multibyte utf-8 shingles
        "tab\tinside token here ok",
        " leading and trailing space ",
        "the quick brown fox " * 40,   # long doc, heavy dup shingles
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    toksd = df.select("id", F.split("text", " ").alias("_toks"))
    from layout_parser_spark.operators.dedup import shingles_from_tokens

    staged = toksd.select(
        "id", shingles_from_tokens(F.col("_toks"), 3).alias("_sh")
    ).select("id", minhash_base_hashes(F.col("_sh")).alias("_bases"))
    old = {
        r.id: r.sig
        for r in staged.select(
            "id",
            minhash_signatures_vectorized(16)(F.col("_bases")).alias("sig"),
        ).collect()
    }
    new = {
        r.id: r.sig
        for r in df.select(
            "id",
            minhash_signatures_from_text(16, 3)(F.col("text")).alias("sig"),
        ).collect()
    }
    # note: docs with < 3 tokens go through the staged path as k<1 →
    # empty shingles → identity vector; the kernel matches that too
    assert new == old


def test_simhash_fused_text_kernel_equals_staged_pipeline(spark):
    """The r6 fused text→simhash kernel (tokenize + per-token md5 lane +
    bit-majority in one Arrow slot) must be BIT-IDENTICAL to the staged
    pipeline (split → transform(md5_lane60) → simhash_vectorized),
    including empty/whitespace/multibyte texts."""
    from layout_parser_spark.operators.dedup import (
        md5_lane60,
        simhash_from_text_vectorized,
        simhash_vectorized,
    )

    texts = [
        "",
        " ",
        "  ",
        "a",
        "the quick brown fox",
        "dup dup dup",
        "汉字 分词 测试 汉字",
        "x  y   z",
        " lead",
        "trail ",
        "the " * 200,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    toksd = df.select("id", F.split("text", " ").alias("_toks"))
    hashed = toksd.select(
        "id",
        F.transform("_toks", md5_lane60).alias("_h"),
        F.size("_toks").alias("_n"),
    )
    old = {
        r.id: r.s
        for r in hashed.select(
            "id",
            simhash_vectorized()(F.col("_h"), F.col("_n")).alias("s"),
        ).collect()
    }
    new = {
        r.id: r.s
        for r in df.select(
            "id",
            simhash_from_text_vectorized()(F.col("text")).alias("s"),
        ).collect()
    }
    assert new == old


def test_simhash_buckets_first_match_uniqueness(spark):
    """simhash_buckets emits every bucket-mate pair EXACTLY once (the
    first-agreeing-chunk guard replaces the dropDuplicates exchange) —
    uniqueness plus set-equality with the dedup-exchange construction."""
    from layout_parser_spark.operators.dedup import simhash_buckets

    # doc pairs engineered to agree on multiple chunks (identical texts
    # agree on ALL 4) plus partially-similar docs
    texts = [
        "alpha beta gamma delta",
        "alpha beta gamma delta",      # identical → 4-chunk agreement
        "alpha beta gamma epsilon",
        "zeta eta theta iota",
        "zeta eta theta iota",
        "completely different words here",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = simhash_buckets(df).collect()
    pairs = [(r.id_a, r.id_b) for r in out]
    assert len(pairs) == len(set(pairs))  # unique by construction
    assert (0, 1) in set(pairs) and (3, 4) in set(pairs)
    for r in out:
        if (r.id_a, r.id_b) in ((0, 1), (3, 4)):
            assert r.hamming == 0


def test_simhash_vectorized_kernel_equals_column_fold(spark):
    """The Arrow simhash kernel must be BIT-IDENTICAL to the pure-Column
    fold (simhash_from_hashes) on every edge the fold defines: normal
    rows, the empty-array all-bits-set vote (2·0 ≥ 0), NULL hash arrays
    (every lane falls to otherwise(0)), and NULL n_toks (NULL comparison
    → false → 0) — so swapping execution paths can never change buckets."""
    import hashlib

    from layout_parser_spark.operators.dedup import (
        SIMHASH_BITS,
        md5_lane60,
        simhash_from_hashes,
        simhash_vectorized,
    )

    lanes = [
        int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
        for w in ["alpha", "beta", "gamma", "delta", "alpha"]
    ]
    rows = [
        (0, lanes, 5),
        (1, lanes[:1], 1),
        (2, [], 0),                # empty → every majority vote passes
        (3, None, 0),              # NULL hashes → 0
        (4, lanes[:3], None),      # NULL n_toks → 0
        (5, [(1 << SIMHASH_BITS) - 1], 1),  # all-ones lane
        (6, list(range(7, 700)), 693),      # chunk filler
    ]
    df = spark.createDataFrame(rows, "id long, h array<long>, n long")
    fold = {r.id: r.sim for r in df.select(
        "id", simhash_from_hashes(F.col("h"), F.col("n")).alias("sim")).collect()}
    kern = {r.id: r.sim for r in df.select(
        "id", simhash_vectorized()(F.col("h"), F.col("n")).alias("sim")).collect()}
    assert fold[2] == (1 << SIMHASH_BITS) - 1  # pin the empty-array edge
    assert kern == fold

    # and through the real staging: token lanes from text
    docs = spark.createDataFrame(
        [(0, "a b c a"), (1, ""), (2, "z")], "doc_id long, text string")
    staged = docs.select(
        "doc_id",
        F.transform(F.split("text", " "), md5_lane60).alias("h"),
        F.size(F.split("text", " ")).alias("n"),
    )
    f2 = {r.doc_id: r.sim for r in staged.select(
        "doc_id", simhash_from_hashes(F.col("h"), F.col("n")).alias("sim")).collect()}
    k2 = {r.doc_id: r.sim for r in staged.select(
        "doc_id", simhash_vectorized()(F.col("h"), F.col("n")).alias("sim")).collect()}
    assert k2 == f2


def test_span_removal_materialized_grams_same_result(spark, dup_docs):
    """materialize_grams persists the gram table for its two consumers;
    results must be identical to the default single-derivation plan."""
    from layout_parser_spark.operators.dedup import duplicated_span_removal

    base = {r.id: (r.clean_text, r.n_kept, r.n_removed)
            for r in duplicated_span_removal(dup_docs, n=3).collect()}
    mat = {r.id: (r.clean_text, r.n_kept, r.n_removed)
           for r in duplicated_span_removal(
               dup_docs, n=3, materialize_grams=True).collect()}
    assert mat == base


def test_simhash_kernel_property_random_arrays(spark):
    """Hypothesis sweep: the Arrow simhash kernel equals the Column fold
    on arbitrary 60-bit hash arrays and token counts (incl. counts that
    disagree with the array length, the contract's general case)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from layout_parser_spark.operators.dedup import (
        SIMHASH_BITS,
        simhash_from_hashes,
        simhash_vectorized,
    )

    lane = st.integers(min_value=0, max_value=(1 << SIMHASH_BITS) - 1)
    row = st.tuples(
        st.lists(lane, min_size=0, max_size=40),
        st.integers(min_value=0, max_value=60),
    )

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(st.lists(row, min_size=1, max_size=30))
    def check(rows):
        df = spark.createDataFrame(
            [(i, h, n) for i, (h, n) in enumerate(rows)],
            "id long, h array<long>, n long",
        )
        fold = {r.id: r.s for r in df.select(
            "id", simhash_from_hashes(F.col("h"), F.col("n")).alias("s")
        ).collect()}
        kern = {r.id: r.s for r in df.select(
            "id", simhash_vectorized()(F.col("h"), F.col("n")).alias("s")
        ).collect()}
        assert kern == fold

    check()


def test_pairwise_cosine_group_kernel_bit_identical_to_fold(spark):
    """The applyInPandas pairwise kernel behind embedding_near_dup_pairs
    must emit EXACTLY the pairs (and bit-equal cosine doubles) of the
    former per-pair Column fold construction (self-join + zip_with/
    aggregate cosine + ROUND + filter), which the oracle certifies —
    on adversarial vectors: denormals, negative zeros, mixed magnitudes,
    NULL vectors, and mismatched lengths.  (Zero-norm vectors are pinned
    separately below: under ANSI mode the former fold RAISED
    DIVIDE_BY_ZERO on them, while the kernel drops them like the DuckDB
    oracle's NaN — fixtures contain none, so no declared query result
    changes.)"""
    import math
    import struct

    from layout_parser_spark.operators.dedup import embedding_near_dup_pairs
    from layout_parser_spark.operators.similarity import cosine

    rows = [
        (1, "x", [1.0, 2.0, 3.0, 4.0]),
        (2, "x", [1.0, 2.0, 3.0, 4.000001]),
        (3, "x", [-1.0, -2.0, -3.0, -4.0]),
        (6, "x", [5e-324, -5e-324, 5e-308, 1.0]),  # denormals
        (7, "x", [1e150, 1e150, -1e150, 1e-150]),  # huge/tiny mix
        (8, "x", [1.0, 2.0, 3.0]),                 # length mismatch
        (9, "x", None),                            # NULL vector
        (10, "x", [0.1 + 0.2, 0.3, 0.7, 1.1]),     # non-representable sums
        (11, "y", [1.0, 1.0, 1.0, 1.0]),
        (12, "y", [1.0, 1.0, 1.0, 0.999999999]),
        (13, "y", [1.0, 2.0, 3.0]),                # same length as 8, other blk
        (14, "y", [2.0, 4.0, 6.0]),                # exact colinear (sim 1.0)
        (15, "y", [-2.0, -4.0, -6.0]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )
    for thr in (0.3, -0.5, 0.9999995):
        got = embedding_near_dup_pairs(
            df, threshold=thr, block_col="label"
        ).collect()
        # the former construction, verbatim
        v = df.select(
            F.col("vec_id").alias("id"),
            F.col("embedding").cast("array<double>").alias("v"),
            F.col("label").alias("blk"),
        )
        a, b = v.alias("a"), v.alias("b")
        pairs = a.join(b, on="blk").where(F.col("a.id") < F.col("b.id"))
        sim = cosine(F.col("a.v"), F.col("b.v"))
        want = pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(sim, 6).alias("cosine_sim"),
        ).where(F.col("cosine_sim") >= thr).collect()

        def norm(rs):
            out = {}
            for r in rs:
                assert r.cosine_sim is not None and not math.isnan(r.cosine_sim)
                out[(r.id_a, r.id_b)] = struct.pack("<d", r.cosine_sim)
            return out

        g, w = norm(got), norm(want)
        assert g == w, (
            f"thr={thr}: kernel pairs != fold pairs "
            f"(only-kernel={set(g) - set(w)}, only-fold={set(w) - set(g)}, "
            f"bit-diff={[k for k in g if k in w and g[k] != w[k]]})"
        )
        assert g, f"thr={thr}: empty comparison is vacuous"

    # zero-norm vectors: the kernel's NaN sim is never emitted (the
    # DuckDB oracle's 0/0 is NaN and fails >= too); pairs among the
    # well-formed rows are unaffected by the degenerate rows' presence
    zdf = spark.createDataFrame(
        [
            (1, "z", [0.0, 0.0]),
            (2, "z", [-0.0, -0.0]),
            (3, "z", [1.0, 1.0]),
            (4, "z", [2.0, 2.0]),
        ],
        "vec_id long, label string, embedding array<double>",
    )
    zgot = embedding_near_dup_pairs(
        zdf, threshold=-2.0, block_col="label"
    ).collect()
    assert {(r.id_a, r.id_b) for r in zgot} == {(3, 4)}
    assert [r.cosine_sim for r in zgot] == [1.0]
