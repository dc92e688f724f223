"""Web-graph operators: link extraction, host graph, fixed-point
PageRank (operators/webgraph.py)."""

import pytest
from pyspark.sql import functions as F

from layout_parser_spark.operators.webgraph import (
    PAGERANK_UNIT,
    extract_links,
    host_link_graph,
    pagerank_hosts,
)


def test_extract_links_and_host_graph(spark):
    pages = spark.createDataFrame(
        [
            (
                "https://a.com/p1",
                b'<html><a href="https://b.com/x">b</a> '
                b'<a href="https://a.com/p2">self</a> '
                b'<a href="/relative">rel</a> <a>bare</a></html>',
            ),
            ("https://b.com/p1", b"<html>no links</html>"),
        ],
        "url string, html binary",
    )
    links = extract_links(pages).collect()
    assert {(r.src_url, r.href) for r in links} == {
        ("https://a.com/p1", "https://b.com/x"),
        ("https://a.com/p1", "https://a.com/p2"),
        ("https://a.com/p1", "/relative"),
    }
    g = {
        (r.src_host, r.dst_host): r.n_links
        for r in host_link_graph(extract_links(pages)).collect()
    }
    # relative link dropped; self-host edge kept
    assert g == {("a.com", "b.com"): 1, ("a.com", "a.com"): 1}


def _edges(spark, rows):
    return spark.createDataFrame(
        rows, "src_host string, dst_host string, n_links long"
    )


def test_pagerank_mass_conserved_and_dangling(spark):
    """b is a pure sink (dangling): its mass redistributes uniformly;
    total mass stays ≈ UNIT (integer flooring loses < n_nodes+n_edges
    micro-units per iteration)."""
    e = _edges(spark, [("a", "b", 2), ("c", "a", 1), ("a", "c", 1)])
    ranks = {r.host: r.rank_micro for r in pagerank_hosts(e, iters=3).collect()}
    assert set(ranks) == {"a", "b", "c"}
    total = sum(ranks.values())
    assert abs(total - PAGERANK_UNIT) < 100  # micro-units of flooring loss
    # b receives 2/3 of a's emitted mass vs c's 1/3 → b outranks c
    assert ranks["b"] > ranks["c"]


def test_pagerank_symmetric_cycle_uniform(spark):
    """A symmetric 2-cycle must stay exactly uniform — any asymmetry
    would be an engine artifact."""
    e = _edges(spark, [("a", "b", 1), ("b", "a", 1)])
    ranks = {r.host: r.rank_micro for r in pagerank_hosts(e, iters=4).collect()}
    assert ranks["a"] == ranks["b"]


def test_pagerank_deterministic_across_runs(spark):
    e = _edges(
        spark,
        [("a", "b", 3), ("b", "c", 1), ("c", "a", 2), ("a", "c", 5)],
    )
    r1 = sorted(
        (r.host, r.rank_micro) for r in pagerank_hosts(e, iters=3).collect()
    )
    r2 = sorted(
        (r.host, r.rank_micro) for r in pagerank_hosts(e, iters=3).collect()
    )
    assert r1 == r2


def test_canonicalize_url_cases(spark):
    from layout_parser_spark.operators.webgraph import canonicalize_url

    cases = [
        # (input, canonical)
        ("https://A.Com/Path", "https://a.com/Path"),          # host lc, path kept
        ("HTTPS://a.com:443/x", "https://a.com/x"),            # scheme lc + default port
        ("http://a.com:80/", "http://a.com/"),
        ("http://a.com:8080/", "http://a.com:8080/"),          # non-default port kept
        ("https://a.com", "https://a.com/"),                   # empty path → /
        ("https://a.com/x#sec-2", "https://a.com/x"),          # fragment dropped
        ("https://a.com/x?utm_source=n&b=2&a=1", "https://a.com/x?a=1&b=2"),
        ("https://a.com/x?b=2&a=1&gclid=z", "https://a.com/x?a=1&b=2"),
        ("https://a.com/x?utm_campaign=only", "https://a.com/x"),  # all-tracking → no query
        ("https://a.com/x?", "https://a.com/x"),               # empty query dropped
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r.c for r in df.select(canonicalize_url("url").alias("c")).collect()
    ]
    assert got == [want for _, want in cases]


def test_url_dedup_collapses_variants(spark):
    from layout_parser_spark.operators.webgraph import url_dedup

    df = spark.createDataFrame(
        [
            (0, "https://a.com/x?b=2&a=1"),
            (1, "HTTPS://A.COM:443/x?a=1&b=2&utm_source=m#top"),
            (2, "https://a.com/y"),
        ],
        "doc_id long, url string",
    )
    out = {r.canonical_url: (r.keep_id, r.n_variants)
           for r in url_dedup(df).collect()}
    assert out == {
        "https://a.com/x?a=1&b=2": (0, 2),
        "https://a.com/y": (2, 1),
    }


def test_connected_components_chain_and_singleton(spark):
    """A 5-node chain (worst case for 1-hop propagation) collapses to
    min-label in O(log n) pointer-doubling rounds; separate pair forms
    its own component."""
    from layout_parser_spark.operators.webgraph import connected_components

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], "u long, v long"
    )
    out = {r.id: r.lbl for r in connected_components(e).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_dedup_clusters_transitive(spark):
    """A≈B and B≈C but A̸≈C must still cluster together (the reason
    pairs alone can't drive a keep-list)."""
    from layout_parser_spark.operators.dedup import dedup_clusters

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today"),
            (1, "the quick brown fox jumps over the lazy cat today"),
            (2, "a quick brown fox jumps over the lazy cat today ok"),
            (3, "completely unrelated text about distributed dataframes"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.id: (r.cluster_id, r.is_keeper)
        for r in dedup_clusters(
            docs, num_hashes=32, bands=16, threshold=0.05
        ).collect()
    }
    assert out[0] == (0, True)
    # 1 and 2 chain through shared shingles into doc 0's cluster
    assert out[1][0] == out[2][0] == 0
    assert not out[1][1] and not out[2][1]
    assert out[3] == (3, True)  # singleton keeps itself


def test_registered_domain(spark):
    from layout_parser_spark.operators.webgraph import registered_domain

    cases = [
        ("www.bbc.co.uk", "bbc.co.uk"),
        ("news.example.com", "example.com"),
        ("a.b.deep.example.org", "example.org"),
        ("shop.foo.com.au", "foo.com.au"),
        ("example.com", "example.com"),
        ("localhost", "localhost"),
        ("site3.example.com", "example.com"),
        ("t.co", "t.co"),  # 2-label host passes through
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host string")
    got = [
        r.d for r in df.select(registered_domain("host").alias("d")).collect()
    ]
    assert got == [want for _, want in cases]


def test_canonicalize_url_idempotent_property(spark):
    """Property: canonicalization is idempotent — canon(canon(u)) ==
    canon(u) — over a generated grid of scheme/case/port/params/fragment
    combinations (exhaustive 384-case grid; evaluation batched through
    ONE Spark job for speed)."""
    from itertools import product

    from layout_parser_spark.operators.webgraph import canonicalize_url

    urls = []
    for scheme, host, port, path, query, frag in product(
        ["http", "HTTPS"],
        ["A.com", "www.b.co.uk"],
        ["", ":80", ":443", ":8080"],
        ["", "/", "/X/y"],
        ["", "?b=2&a=1", "?utm_source=x", "?utm_a=1&z=9&b=2"],
        ["", "#frag"],
    ):
        urls.append(f"{scheme}://{host}{port}{path}{query}{frag}")
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(
        F.col("url"), canonicalize_url(F.col("url")).alias("c1")
    )
    both = once.select(
        "url", "c1", canonicalize_url(F.col("c1")).alias("c2")
    ).collect()
    bad = [(r.url, r.c1, r.c2) for r in both if r.c1 != r.c2]
    assert not bad, f"non-idempotent: {bad[:5]}"
    # and the canonical form never retains fragments or tracking params
    assert all("#" not in r.c1 and "utm_" not in r.c1 for r in both)
