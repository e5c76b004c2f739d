"""Triangle counting: ground-truth semantics on known graphs (the
degree-oriented plan must count each triangle exactly once, regardless
of orientation ties). Spark<->DuckDB parity is pinned by the driver
oracle."""

from __future__ import annotations

import itertools

from webcrawler_spark.queries import _pagerank_edges, q_triangle_count

SF = "/root/testdata/sf0.001"


def test_known_graph_counts(spark, monkeypatch):
    # K4 on {0,1,2,3} (4 triangles, each node in 3) plus a pendant 3-4
    # and an isolated edge 5-6 (no triangles).
    edges = list(itertools.combinations(range(4), 2)) + [(3, 4), (5, 6)]
    df = spark.createDataFrame(
        [(a, b) for a, b in edges] + [(b, a) for a, b in edges],
        "src long, dst long",
    )
    monkeypatch.setattr(
        "webcrawler_spark.queries._pagerank_edges", lambda s, d: df
    )
    got = {r.node: r.n_triangles for r in q_triangle_count(spark, SF).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_total_is_brute_force(spark):
    und = {
        tuple(sorted((r.src, r.dst)))
        for r in _pagerank_edges(spark, SF).collect()
    }
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    brute = sum(
        1
        for a, b in und
        for c in adj[a] & adj[b]
        if a < b < c
    )
    got = sum(r.n_triangles for r in q_triangle_count(spark, SF).collect())
    assert got == 3 * brute and brute > 0
