"""ANN quality checks: the IVF probe path must actually retrieve most of
the true (brute-force) top-k — a rows-only driver check alone proves the
query *runs*, not that it *searches* (VERDICT.md round 1, item 5)."""

from __future__ import annotations

import os

from webcrawler_spark.queries import (
    ANN_HAM_RADIUS,
    _hamming_planes,
    q_ann_cosine_topk,
    q_ann_hamming,
    q_ann_ivf,
)

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


def test_ann_hamming_recall_and_pruning(spark):
    """The LSH-signature path must (a) retrieve >=85% of the brute-force
    top-20 and (b) actually prune — the Hamming prefilter must pass well
    under half the corpus to the exact rerank, or it isn't a scale path."""
    import numpy as np

    truth = {r.vec_id for r in q_ann_cosine_topk(spark, SF_DIR).collect()}
    got = {r.vec_id for r in q_ann_hamming(spark, SF_DIR).collect()}
    assert len(truth) == 20 and len(got) == 20
    recall = len(truth & got) / len(truth)
    assert recall >= 0.85, f"Hamming-LSH recall@20 too low: {recall}"

    # pruning: recompute the candidate fraction with the same planes
    rows = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    V = np.array([r.embedding for r in rows], dtype=np.float64)
    ids = np.array([r.vec_id for r in rows])
    W = _hamming_planes()
    bits = (V @ W.T) >= 0
    qb = bits[ids == 0][0]
    ham = (bits != qb).sum(1)
    frac = ((ham <= ANN_HAM_RADIUS) & (ids != 0)).mean()
    assert frac <= 0.35, f"Hamming prefilter passes too much: {frac:.3f}"


def test_ann_pq_recall_vs_bruteforce(spark):
    """PQ+ADC with exact rerank of the top-100 must retrieve most of the
    brute-force top-20 — 8x16 codebooks quantize hard, but the rerank
    restores precision for everything ADC lets through."""
    from webcrawler_spark.queries import q_ann_pq

    truth = {r.vec_id for r in q_ann_cosine_topk(spark, SF_DIR).collect()}
    got = {r.vec_id for r in q_ann_pq(spark, SF_DIR).collect()}
    assert len(truth) == 20 and len(got) == 20
    recall = len(truth & got) / len(truth)
    assert recall >= 0.7, f"PQ recall@20 too low: {recall}"


# ---------------------------------------------------- mrl_truncate_eval


def test_mrl_truncate_eval_python_replication(spark):
    import math

    from webcrawler_spark.queries import _MRL_DIMS, _MRL_KS, q_mrl_truncate_eval

    emb = {r.vec_id: [float(x) for x in r.embedding]
           for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()}
    ref = emb[0]

    def cos(a, b):
        d = na = nb = 0.0
        for x, y in zip(a, b):
            d += x * y
            na += x * x
            nb += y * y
        return d / (math.sqrt(na) * math.sqrt(nb))

    ids = sorted(i for i in emb if i != 0)
    rank_f = sorted(ids, key=lambda i: (-cos(emb[i], ref), i))
    rank_t = sorted(ids, key=lambda i: (-cos(emb[i][:_MRL_DIMS], ref[:_MRL_DIMS]), i))
    rows = {r.k: r for r in q_mrl_truncate_eval(spark, SF_DIR).collect()}
    assert set(rows) == set(_MRL_KS)
    for k in _MRL_KS:
        want = len(set(rank_f[:k]) & set(rank_t[:k]))
        assert rows[k].n_overlap == want, (k, rows[k].n_overlap, want)
        assert rows[k].recall_ppm == want * 1_000_000 // k
    # truncation must retain SOME signal (overlap beats the random
    # expectation k^2/N at the largest k)
    n = len(ids)
    assert rows[20].n_overlap > 20 * 20 / n, rows[20]
