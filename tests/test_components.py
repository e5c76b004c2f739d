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


def _star(spark, pairs, max_rounds=25):
    from webcrawler_spark.queries import connected_components_star

    df = spark.createDataFrame(pairs, ["a_id", "b_id"])
    rounds = []
    out = connected_components_star(df, max_rounds=max_rounds, rounds_out=rounds)
    return {r.doc_id: r.rep for r in out.collect()}, rounds[0]


def test_star_matches_propagation_on_mixed_graph(spark):
    # chain + star + cycle + singleton pair, shuffled ids
    pairs = [
        (10, 20), (20, 30), (30, 40),          # chain -> rep 10
        (100, 101), (100, 102), (100, 103),    # star  -> rep 100
        (7, 8), (8, 9), (9, 7),                # cycle -> rep 7
        (500, 600),                            # pair  -> rep 500
    ]
    labels, _ = _star(spark, pairs)
    df = spark.createDataFrame(pairs, ["a_id", "b_id"])
    want = {r.doc_id: r.rep for r in connected_components(df).collect()}
    assert labels == want


def test_star_converges_logarithmically_on_deep_chain(spark):
    # a 256-node path: diameter 255. Min-label propagation needs ~255
    # rounds (its max_iters=32 would NOT finish); star contraction is
    # O(log^2 n) — this is exactly why it is the scale path.
    n = 256
    pairs = [(i, i + 1) for i in range(n - 1)]
    labels, rounds = _star(spark, pairs, max_rounds=25)
    assert labels == {i: 0 for i in range(n)}
    assert rounds <= 12, rounds


def test_star_matches_union_find_on_random_graphs(spark):
    """Seeded random graphs vs a driver-side union-find oracle — catches
    star-contraction edge cases (multi-min merges, isolated pairs,
    dense blobs) that hand-built graphs miss."""
    import random

    rng = random.Random(20260818)
    for trial in range(4):
        n = rng.randint(10, 60)
        m = rng.randint(5, 2 * n)
        pairs = []
        for _ in range(m):
            a, b = rng.randint(0, n - 1), rng.randint(0, n - 1)
            if a != b:
                pairs.append((a, b))
        if not pairs:
            continue
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        nodes = {x for p in pairs for x in p}
        want = {x: find(x) for x in nodes}
        got, _ = _star(spark, pairs)
        assert got == want, (trial, n, m)
