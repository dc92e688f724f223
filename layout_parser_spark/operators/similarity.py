"""Similarity search over an embedding column (array<float>).

* ``cosine_topk`` — brute-force exact top-k: broadcast the (small) query
  set, JVM-side dot products via ``zip_with``/``aggregate``, per-query
  top-k by window.  The correctness baseline.
* ``lsh_topk`` — random-hyperplane LSH: deterministic hyperplanes derived
  from xxhash64 of (dim, plane) — reproducible without RNG state; bucket
  equi-join prunes candidates, then exact cosine re-ranks inside buckets.
  The scale path: candidate generation is a shuffle on the signature, not
  a cross join.
* ``ivf_topk`` — IVF-style coarse quantization: k-means-free variant using
  the nearest of NLIST deterministic "centroid" vectors (drawn from the
  dataset by id), probe the closest NPROBE lists.

All distance math is columnar (no UDFs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "query_vec",
) -> DataFrame:
    """Exact brute-force cosine top-k of each query against ``vectors``.
    The query side is broadcast (small); ties broken by ascending vector
    id for determinism.  Output: (query_id, vec_id, cosine_sim, rank).

    Skew shape: a plain ``Window.partitionBy(query_id)`` rank would
    serialize ALL N candidate rows of a query through one reducer — with
    few queries that is a single-reducer job.  Instead each input
    partition reduces its candidates to a k-minima array (struct sort
    key = (−sim, vec_id), state bounded by partition size), the merge
    combines ≤P arrays of ≤k rows per query, and the final rank is a
    posexplode over k rows — no stage ever moves more than P·k rows per
    query."""
    j = vectors.crossJoin(F.broadcast(queries))
    sim = cosine(F.col(vec_col), F.col(qvec_col))
    scored = j.select(
        F.col(qid_col).alias("query_id"),
        F.col(id_col).alias("vec_id"),
        F.round(sim, 6).alias("cosine_sim"),
    )
    key = F.struct(
        (-F.col("cosine_sim")).alias("_negsim"),
        F.col("vec_id").alias("vec_id"),
        F.col("cosine_sim").alias("cosine_sim"),
    )
    part = scored.groupBy(
        "query_id", F.spark_partition_id().alias("_pid")
    ).agg(F.slice(F.array_sort(F.collect_list(key)), 1, k).alias("_top"))
    merged = part.groupBy("query_id").agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("_top"))), 1, k
        ).alias("_top")
    )
    return merged.select(
        "query_id", F.posexplode("_top").alias("_r", "_t")
    ).select(
        "query_id",
        F.col("_t.vec_id").alias("vec_id"),
        F.col("_t.cosine_sim").alias("cosine_sim"),
        (F.col("_r") + 1).cast("int").alias("rank"),
    )


def hyperplane_components(dim: int, plane_idx: int) -> "list[float]":
    """Deterministic pseudo-random hyperplane as plain floats: component
    d = (md5_lane(plane, d) % 1001 − 500) / 500, uniform in [−1, 1] and
    centered on 0 — reproducible everywhere with no RNG state, and
    embeddable verbatim in the DuckDB oracle SQL (repr() of a float
    round-trips exactly)."""
    import hashlib

    comps = []
    for d in range(dim):
        h = int(
            hashlib.md5(f"hp:{plane_idx}:{d}".encode()).hexdigest()[:15], 16
        )
        comps.append((h % 1001 - 500) / 500.0)
    return comps


def hyperplane(dim: int, plane_idx: int) -> Column:
    """The hyperplane as a literal array column (constants fold at plan
    time — no per-row hash evaluation)."""
    return F.array(*[F.lit(c) for c in hyperplane_components(dim, plane_idx)])


def rh_signature(
    vec: Column, dim: int, n_planes: int = 8, plane_offset: int = 0
) -> Column:
    """Random-hyperplane signature as an n_planes-bit int.
    ``plane_offset`` selects an independent plane family — multi-table
    LSH uses offsets t·n_planes for table t."""
    bits = []
    for p in range(n_planes):
        d = dot(vec, hyperplane(dim, plane_offset + p))
        bits.append(
            F.when(d > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: equi-join on the hyperplane signature bucket,
    exact cosine re-rank inside the bucket.  Recall trades with n_planes;
    at scale the join is a hash shuffle on the signature (candidates ≪ n),
    vs the brute-force cross join."""
    v = vectors.withColumn("_sig", rh_signature(F.col(vec_col), dim, n_planes))
    q = queries.withColumn("_sig", rh_signature(F.col(qvec_col), dim, n_planes))
    j = v.join(F.broadcast(q), on="_sig")
    sim = cosine(F.col(vec_col), F.col(qvec_col))
    scored = j.select(
        F.col(qid_col).alias("query_id"),
        F.col(id_col).alias("vec_id"),
        F.round(sim, 6).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def assign_to_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment SHUFFLE-FREE: broadcast ONE row holding
    the (sorted) centroid array, argmax by a fold — replaces the
    explode-n×nlist-rows + per-vector row_number window, the wrong shape
    at 10^9 vectors.  Output: (id_col, vec_col, c_id, c_sim)."""
    cent_row = centroids.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("c_id"), F.col("c_vec")))
        ).alias("_cents")
    )

    def _best(vec, cents):
        # fold keeping (sim, c_id) of the best centroid; strict > keeps
        # the FIRST (smallest c_id, array is sorted) on ties — same
        # semantics as orderBy(c_sim desc, c_id asc) row_number()=1
        init = F.struct(
            F.lit(-2.0).cast("double").alias("s"),
            F.lit(None).cast("long").alias("c"),
        )
        return F.aggregate(
            cents,
            init,
            lambda acc, c: F.when(
                cosine(vec, c["c_vec"]) > acc["s"],
                F.struct(
                    cosine(vec, c["c_vec"]).alias("s"),
                    c["c_id"].cast("long").alias("c"),
                ),
            ).otherwise(acc),
        )

    return (
        vectors.crossJoin(F.broadcast(cent_row))
        .withColumn("_best", _best(F.col(vec_col), F.col("_cents")))
        .select(
            id_col,
            vec_col,
            F.col("_best.c").alias("c_id"),
            F.col("_best.s").alias("c_sim"),
        )
    )


def kmeans_centroids(
    vectors: DataFrame,
    nlist: int,
    dim: int,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd's k-means as pure DataFrame iterations (the
    trained-centroid path for IVF): init = the nlist smallest-id vectors
    (no RNG state), each round assigns via the broadcast argmax fold and
    recomputes centroids as element-wise means (dim known → one avg
    aggregate per component, plain map-side-combined groupBy); clusters
    that empty out keep their previous centroid.  Output (c_id, c_vec)."""
    cents = (
        vectors.orderBy(F.col(id_col).asc())
        .limit(nlist)
        .select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        assigned = assign_to_centroids(vectors, cents, id_col, vec_col)
        means = assigned.groupBy("c_id").agg(
            F.array(
                *[
                    F.avg(F.element_at(F.col(vec_col), i + 1))
                    for i in range(dim)
                ]
            ).alias("_mean")
        )
        cents = (
            cents.join(means, on="c_id", how="left")
            .select(
                "c_id",
                F.coalesce(F.col("_mean"), F.col("c_vec")).alias("c_vec"),
            )
            .localCheckpoint(eager=True)  # constant lineage per round
        )
    return cents


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "query_vec",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF ANN: coarse centroids are either supplied (``kmeans_centroids``
    for trained lists), or default to the NLIST smallest-id vectors
    (k-means-free, deterministic).  Every vector is assigned to its
    nearest centroid (broadcast argmax fold); each query probes its
    NPROBE nearest lists.  Exact cosine re-rank within probed lists."""
    if centroids is None:
        centroids = (
            vectors.orderBy(F.col(id_col).asc())
            .limit(nlist)
            .select(
                F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")
            )
        )
    assigned = assign_to_centroids(vectors, centroids, id_col, vec_col)
    # queries probe nprobe nearest lists
    qc = queries.crossJoin(F.broadcast(centroids)).select(
        qid_col,
        qvec_col,
        "c_id",
        cosine(F.col(qvec_col), F.col("c_vec")).alias("c_sim"),
    )
    wq = Window.partitionBy(qid_col).orderBy(
        F.col("c_sim").desc(), F.col("c_id").asc()
    )
    probes = (
        qc.withColumn("r", F.row_number().over(wq))
        .where(F.col("r") <= nprobe)
        .select(qid_col, qvec_col, "c_id")
    )
    j = assigned.join(F.broadcast(probes), on="c_id")
    sim = cosine(F.col(vec_col), F.col(qvec_col))
    scored = j.select(
        F.col(qid_col).alias("query_id"),
        F.col(id_col).alias("vec_id"),
        F.round(sim, 6).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


# ---------------------------------------------------------------------------
# product quantization (PQ) — the vector-compression ANN path
# ---------------------------------------------------------------------------


def l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance between two double arrays (one fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _argmin_code(vec: Column, cb: Column) -> Column:
    """1-based index of the nearest (squared-L2) centroid in the
    broadcast codebook array ``cb`` (array<array<double>>) — a fold over
    indices, strict < keeps the FIRST on ties (deterministic)."""
    init = F.struct(
        F.lit(float("inf")).alias("d"), F.lit(1).alias("i")
    )
    return F.aggregate(
        F.sequence(F.lit(1), F.size(cb)),
        init,
        lambda acc, i: F.when(
            l2sq(vec, F.element_at(cb, i)) < acc["d"],
            F.struct(
                l2sq(vec, F.element_at(cb, i)).alias("d"), i.alias("i")
            ),
        ).otherwise(acc),
    )["i"]


def pq_codebook(
    vectors: DataFrame,
    j: int,
    sub_dim: int,
    k_codes: int,
    iters: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """ONE-ROW DataFrame carrying subspace ``j``'s codebook as a sorted
    array<array<double>> column ``cb{j}`` — deterministic L2 Lloyd's
    (init = the k smallest-id sub-vectors; empty clusters keep their
    previous centroid).  The one-row form broadcasts into every
    downstream stage, so neither training nor encoding ever shuffles on
    the vector id."""
    subv = vectors.select(
        F.col(id_col).alias("_id"),
        F.slice(F.col(vec_col), j * sub_dim + 1, sub_dim).alias("_sv"),
    )
    cb_row = (
        subv.orderBy(F.col("_id").asc())
        .limit(k_codes)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_id"), F.col("_sv")))
            ).alias("_init")
        )
        .select(
            F.transform(F.col("_init"), lambda s: s["_sv"]).alias("cb")
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        assigned = subv.crossJoin(F.broadcast(cb_row)).select(
            "_sv", _argmin_code(F.col("_sv"), F.col("cb")).alias("code")
        )
        means = assigned.groupBy("code").agg(
            F.array(
                *[
                    F.avg(F.element_at(F.col("_sv"), c + 1))
                    for c in range(sub_dim)
                ]
            ).alias("mv")
        )
        # one-row merge: new[i] = mean of cluster i if non-empty else old
        mean_map = means.agg(
            F.map_from_arrays(
                F.collect_list("code"), F.collect_list("mv")
            ).alias("mm")
        )
        cb_row = (
            cb_row.crossJoin(F.broadcast(mean_map))
            .select(
                F.transform(
                    F.sequence(F.lit(1), F.size(F.col("cb"))),
                    lambda i: F.coalesce(
                        F.element_at(F.col("mm"), i),
                        F.element_at(F.col("cb"), i),
                    ),
                ).alias("cb")
            )
            .localCheckpoint(eager=True)
        )
    return cb_row.select(F.col("cb").alias(f"cb{j}"))


def pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 4,
    k_codes: int = 16,
    iters: int = 3,
    refine: int = 100,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "query_vec",
) -> DataFrame:
    """Product-quantization ANN with exact refinement (Jégou et al.
    2011): split ``dim`` into ``m`` subspaces, train a ``k_codes``-entry
    codebook per subspace, encode every vector as m small codes, score
    query↔vector by the ADC table sum (squared L2 is ADDITIVE over
    subspaces, so per-pair cost drops from O(dim) to O(m) lookups — the
    compression win that makes 10^11-vector scans affordable), keep the
    top ``refine`` ADC candidates per query, then re-rank those
    EXACTLY by cosine to the final top-k.

    Output matches ``cosine_topk``: (query_id, vec_id, cosine_sim,
    rank) — with ``refine`` ≫ k the result equals the exact baseline
    (recall-1 configuration), which is the driver-oracle contract.

    Scale shape: codebooks are one-row broadcasts (training shuffles
    only k_codes×m tiny aggregates); encoding is map-side; ADC scoring
    is the broadcast-queries pattern of ``cosine_topk`` with O(m) work
    per pair; only the ``refine`` winners per query reach the exact
    re-rank (an equi-join on the vector id).

    Vectors are L2-NORMALIZED before training/encoding (map-side): on
    the unit sphere ‖a−b‖² = 2 − 2·cos(a,b), so the squared-L2 ADC
    ordering matches the cosine ordering the re-rank uses — without
    this, norm variance corrupts recall."""
    sub_dim = dim // m

    def _unit(vc: Column) -> Column:
        n = F.sqrt(dot(vc, vc))
        return F.transform(
            vc, lambda x: F.when(n > 0, x / n).otherwise(x)
        )

    nvec = vectors.select(
        id_col, vec_col, _unit(F.col(vec_col)).alias("_nv")
    )
    nv = nvec.select(id_col, F.col("_nv").alias(vec_col))
    nq = queries.select(
        qid_col, _unit(F.col(qvec_col)).alias(qvec_col)
    )
    books = [
        pq_codebook(nv, j, sub_dim, k_codes, iters, id_col, vec_col)
        for j in range(m)
    ]
    # encode map-side: m one-row broadcasts attach, m argmin folds
    coded = nv.select(id_col, vec_col)
    for j, b in enumerate(books):
        coded = coded.crossJoin(F.broadcast(b)).withColumn(
            f"code{j}",
            _argmin_code(
                F.slice(F.col(vec_col), j * sub_dim + 1, sub_dim),
                F.col(f"cb{j}"),
            ),
        ).drop(f"cb{j}")
    coded = coded.drop(vec_col).localCheckpoint(eager=True)

    # per-query ADC tables: distance from the query's sub-vector to every
    # centroid of that subspace.  NB the lambda must take ONE argument —
    # a second (even defaulted) python parameter receives the ELEMENT
    # INDEX in Spark HOFs, silently corrupting the slice — so the
    # subspace offset is closed over via a factory.
    def _qtable(j: int) -> Column:
        qslice = F.slice(F.col(qvec_col), j * sub_dim + 1, sub_dim)
        return F.transform(F.col(f"cb{j}"), lambda c: l2sq(qslice, c))

    qt = nq
    for j, b in enumerate(books):
        qt = qt.crossJoin(F.broadcast(b)).withColumn(
            f"t{j}", _qtable(j)
        ).drop(f"cb{j}")

    adc = coded.crossJoin(F.broadcast(qt.drop(qvec_col)))
    score = sum(
        (F.element_at(F.col(f"t{j}"), F.col(f"code{j}")) for j in range(m)),
        F.lit(0.0),
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.col("_adc").asc(), F.col(id_col).asc()
    )
    cands = (
        adc.withColumn("_adc", score)
        .withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= refine)
        .select(qid_col, id_col)
    )
    # exact re-rank of the candidate set only
    pairs = (
        cands.join(vectors.select(id_col, vec_col), on=id_col)
        .join(F.broadcast(queries), on=qid_col)
    )
    sim = cosine(F.col(vec_col), F.col(qvec_col))
    scored = pairs.select(
        F.col(qid_col).alias("query_id"),
        F.col(id_col).alias("vec_id"),
        F.round(sim, 6).alias("cosine_sim"),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
    )
