"""E2E smoke of the spark-submit entry (job.py) through its real CLI —
pins the two r4 field bugs: (1) table-format input without an Iceberg
runtime must fall back to xxhash64 resume buckets instead of dying in
analysis on system.bucket; (2) --curate over a RAW pages table must run
the extraction front-end before the funnel (curate_corpus needs
extracted_text)."""

import json
import subprocess
import sys

import pytest

REPO = "/root/repo"


def _run(args, timeout=420):
    return subprocess.run(
        [sys.executable, f"{REPO}/job.py", *args],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
    )


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    from layout_parser_spark.sources import synth_pages

    d = str(tmp_path_factory.mktemp("job_pages") / "pages")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    synth_pages(docs.limit(200)).write.mode("overwrite").parquet(d)
    return d


def test_extract_resume_and_iceberg_fallback(spark, pages_dir, tmp_path):
    out = str(tmp_path / "out")
    # input-format=table on a plain path: must warn + fall back, not die
    r = _run(["--input", pages_dir, "--input-format", "table",
              "--output", out, "--buckets", "3", "--salt-partitions", "2"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "processed=3" in r.stdout
    assert "no Iceberg runtime" in r.stderr
    # byte-identity of the job output against the source corpus
    res = spark.read.parquet(f"{out}/bucket=*")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = sorted(row.extracted_text for row in res.collect())
    want = sorted(row.text for row in docs.limit(200).collect())
    assert got == want
    # exact resume: second run must skip all committed buckets
    r2 = _run(["--input", pages_dir, "--input-format", "table",
               "--output", out, "--buckets", "3", "--salt-partitions", "2"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "processed=0" in r2.stdout and "skipped(previously done)=3" in r2.stdout


def test_curate_from_raw_pages(pages_dir, tmp_path):
    out = str(tmp_path / "cur")
    r = _run(["--input", pages_dir, "--output", out,
              "--salt-partitions", "2", "--curate"])
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(r.stdout.strip().splitlines()[-1])
    # monotone funnel over the full input
    assert stats["n_input"] == 200
    assert (stats["n_input"] >= stats["url_keep"] >= stats["exact_keep"]
            >= stats["cluster_keep"] >= stats["quality_keep"] == stats["keep"])


def test_stream_incremental_exactly_once(spark, tmp_path):
    """--stream drains only files not yet committed in the checkpoint:
    first run extracts the initial files, an immediate re-run processes 0
    rows, and after appending new page files a third run picks up ONLY
    the new ones — with byte-identical extracted text throughout."""
    from pyspark.sql import functions as F

    from layout_parser_spark.sources import synth_pages

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    synth_pages(docs.where(F.col("doc_id") < 100)).write.parquet(pages)

    r1 = _run(["--input", pages, "--output", out, "--stream"])
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert "input_rows=100" in r1.stdout

    r2 = _run(["--input", pages, "--output", out, "--stream"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "input_rows=0" in r2.stdout

    synth_pages(
        docs.where((F.col("doc_id") >= 100) & (F.col("doc_id") < 150))
    ).write.mode("append").parquet(pages)
    r3 = _run(["--input", pages, "--output", out, "--stream"])
    assert r3.returncode == 0, r3.stderr[-2000:]
    assert "input_rows=50" in r3.stdout

    res = spark.read.parquet(f"{out}/extracted")
    got = sorted(r.extracted_text for r in res.collect())
    want = sorted(
        r.text for r in docs.where(F.col("doc_id") < 150).collect()
    )
    assert got == want


def test_warc_input_through_cli(spark, tmp_path):
    """--input-format warc through the real CLI: .warc.gz segments →
    pages → extraction with manifest resume, byte-identical output."""
    from layout_parser_spark.sources import render_page_html
    from layout_parser_spark.sources.warc import write_warc_file

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).where("doc_id < 50").collect()
    d = tmp_path / "warc"
    d.mkdir()
    recs = [
        {"url": f"https://w{r.doc_id % 7}.example.com/d/{r.doc_id}",
         "date": "2024-02-01T00:00:00Z",
         "html": render_page_html(r.doc_id, r.text).encode("utf-8"),
         "text": r.text}
        for r in docs
    ]
    (d / "seg-0.warc.gz").write_bytes(
        write_warc_file(recs[:25], gzip_members=True))
    (d / "seg-1.warc.gz").write_bytes(
        write_warc_file(recs[25:], gzip_members=True))

    out = str(tmp_path / "out")
    r = _run(["--input", str(d) + "/*.warc.gz", "--input-format", "warc",
              "--output", out, "--buckets", "2"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "processed=2" in r.stdout
    got = sorted(
        row.extracted_text
        for row in spark.read.parquet(f"{out}/bucket=*").collect()
    )
    assert got == sorted(r2["text"] for r2 in recs)
    # exact resume over the warc source too
    r2 = _run(["--input", str(d) + "/*.warc.gz", "--input-format", "warc",
               "--output", out, "--buckets", "2"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "processed=0" in r2.stdout
