"""Checkpoint manifests + exact resume (north_rule: "resumable from
checkpoint with per-partition lineage + metrics").

Batch Spark has no built-in exactly-once resume over a 10^12-doc input, so
the engine provides plain-DataFrame bookkeeping:

* the input is split into BUCKETS by ``pmod(xxhash64(url), n_buckets)`` —
  the same hash family as the Iceberg ``bucket(N, url)`` table layout, so
  a bucket is a stable, partition-pruned unit of work;
* each completed bucket writes one MANIFEST row ``(bucket_id, run_id,
  doc_count, byte_count, status, n_input_files, input_files_digest)``
  next to its output — the file digest records the SOURCE SNAPSHOT
  backing the run (md5 of the sorted backing-file list from
  ``DataFrame.inputFiles()``, a file-index listing, not a Spark job;
  ``inputFiles()`` reflects the whole relation, not the bucket filter,
  so it is computed once per run and stamped on every bucket row), so
  an audit can prove which snapshot of the source each committed
  bucket was produced from;
* a resumed run anti-joins the bucket list against the manifest and only
  processes pending buckets.

Output + manifest are written per bucket (separate subdirectories), so a
crashed bucket leaves no committed manifest row and is simply redone —
idempotent at-least-once execution with exactly-once OUTPUT visibility via
the manifest.
"""

from __future__ import annotations

import hashlib as _hashlib
import os
from typing import Callable, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = (
    "bucket_id int, run_id string, doc_count long, byte_count long, "
    "status string, n_input_files long, input_files_digest string"
)


def bucket_of(url_col, n_buckets: int, method: str = "xxhash64"):
    """Resume-bucket expression.  ``method='iceberg'`` uses the table's
    own ``system.bucket(N, url)`` transform (Murmur3, Iceberg spec
    Appendix B) so the bucket filter prunes to exactly one partition of a
    ``PARTITIONED BY (bucket(N, url))`` table; requires an Iceberg
    catalog.  Default xxhash64 works on any source (no pruning)."""
    if method == "iceberg":
        from ..sources.iceberg import iceberg_bucket_of

        name = url_col if isinstance(url_col, str) else "url"
        return iceberg_bucket_of(name, n_buckets)
    return F.pmod(F.xxhash64(url_col), F.lit(n_buckets)).cast("int")


def _manifest_dir(root: str) -> str:
    return os.path.join(root, "_manifest")


def read_manifest(spark: SparkSession, root: str) -> DataFrame:
    path = _manifest_dir(root)
    try:
        return spark.read.schema(MANIFEST_SCHEMA).parquet(path)
    except Exception:
        return spark.createDataFrame([], MANIFEST_SCHEMA)


def completed_buckets(spark: SparkSession, root: str) -> List[int]:
    m = read_manifest(spark, root)
    return [
        r.bucket_id
        for r in m.where(F.col("status") == "done")
        .select("bucket_id")
        .distinct()
        .collect()
    ]


def run_with_manifest(
    spark: SparkSession,
    pages: DataFrame,
    out_root: str,
    n_buckets: int,
    pipeline: Callable[[DataFrame], DataFrame],
    run_id: str = "r0",
    url_col: str = "url",
    text_col: str = "extracted_text",
    max_buckets_per_run: Optional[int] = None,
    bucket_method: str = "xxhash64",
) -> dict:
    """Process all PENDING buckets of ``pages`` through ``pipeline``,
    committing one output directory + manifest row per bucket.

    Returns {"processed": [...], "skipped": [...]} bucket ids.  Calling it
    again after an interruption resumes exactly where it stopped (the
    anti-join is against the committed manifest)."""
    done = set(completed_buckets(spark, out_root))
    pending = [b for b in range(n_buckets) if b not in done]
    if max_buckets_per_run is not None:
        pending = pending[:max_buckets_per_run]

    withb = pages.withColumn(
        "_bucket", bucket_of(url_col, n_buckets, method=bucket_method)
    )
    # source-snapshot lineage: inputFiles() returns the relation's full
    # (unpruned) file listing whatever filter sits on top, so one digest
    # per run is the honest granularity — every bucket row this run
    # stamps the same snapshot it was read from.  Computed only when
    # there is pending work: a fully-resumed run should not pay the
    # file-index listing (ADVICE r5).
    files: list = []
    fdigest = ""
    if pending:
        files = sorted(pages.inputFiles())
        fdigest = _hashlib.md5("\n".join(files).encode()).hexdigest()
    processed = []
    for b in pending:
        part = withb.where(F.col("_bucket") == b).drop("_bucket")
        out = pipeline(part)
        out_path = os.path.join(out_root, f"bucket={b}")
        out.write.mode("overwrite").parquet(out_path)
        stats = spark.read.parquet(out_path).agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(F.length(text_col)), F.lit(0)).alias("b"),
        ).collect()[0]
        row = [
            (
                b,
                run_id,
                int(stats.n),
                int(stats.b),
                "done",
                len(files),
                fdigest,
            )
        ]
        spark.createDataFrame(row, MANIFEST_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(_manifest_dir(out_root))
        processed.append(b)
    return {"processed": processed, "skipped": sorted(done)}
