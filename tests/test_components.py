"""Connected-components near-dup resolution: the min-label propagation
must compute the exact transitive closure (chains deeper than one hop),
matching what the DuckDB recursive-CTE oracle checks on the real table."""

from __future__ import annotations

from webcrawler_spark.queries import connected_components


def test_components_transitive_chain(spark):
    # 1-2, 2-3, 3-4 is one component (diameter 3 — needs >1 propagation
    # round); 10-11 a second; 99 appears nowhere (singletons are the
    # caller's join-back, not emitted here)
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], ["a_id", "b_id"]
    )
    got = {r.doc_id: r.rep for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_components_star_and_cycle(spark):
    # star with a high-id hub + a cycle; min id wins everywhere
    edges = spark.createDataFrame(
        [(100, 7), (100, 8), (100, 9), (20, 21), (21, 22), (22, 20)],
        ["a_id", "b_id"],
    )
    got = {r.doc_id: r.rep for r in connected_components(edges).collect()}
    assert got == {7: 7, 8: 7, 9: 7, 100: 7, 20: 20, 21: 20, 22: 20}
