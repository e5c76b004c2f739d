"""ANN quality checks: the IVF probe path must actually retrieve most of
the true (brute-force) top-k — a rows-only driver check alone proves the
query *runs*, not that it *searches* (VERDICT.md round 1, item 5)."""

from __future__ import annotations

import os

from webcrawler_spark.queries import q_ann_cosine_topk, q_ann_ivf

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


def test_ann_ivf_recall_vs_bruteforce(spark):
    truth = {r.vec_id for r in q_ann_cosine_topk(spark, SF_DIR).collect()}
    got = {r.vec_id for r in q_ann_ivf(spark, SF_DIR).collect()}
    assert len(truth) == 20 and len(got) == 20
    recall = len(truth & got) / len(truth)
    # probe-2-of-n cells: near-dup clusters share a label, so the top
    # neighbourhood of vec 0 is concentrated in few cells; require the
    # scale path to find at least 70% of the exact top-20.
    assert recall >= 0.7, f"IVF recall@20 too low: {recall}"
