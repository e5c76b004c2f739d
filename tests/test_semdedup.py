"""SemDeDup semantic dedup (queries.q_semdedup_prune): ground-truth
semantics re-derived in numpy on the same sf0.001 embeddings table.
Spark<->DuckDB parity is pinned by the driver oracle; this pins the
*meaning* — within-label cosine pairs above tau prune the member closest
to its label centroid (Abbas et al. 2023, arXiv:2303.09540)."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
import pyarrow.parquet as pq

from webcrawler_spark.queries import _SEMDEDUP_TAU, q_semdedup_prune

SF = "/root/testdata/sf0.001"


def _round_half_up(x: float, n: int) -> float:
    # matches Spark F.round / DuckDB round (HALF_UP, away from zero)
    s = -1.0 if x < 0 else 1.0
    return s * math.floor(abs(x) * 10**n + 0.5) / 10**n


def _numpy_oracle():
    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    by_label: dict[int, list[tuple[int, np.ndarray]]] = defaultdict(list)
    for _, r in t.iterrows():
        by_label[int(r.label)].append(
            (int(r.vec_id), np.asarray(r.embedding, dtype=np.float64))
        )
    out: dict[tuple[int, int], int] = defaultdict(int)
    csims: dict[tuple[int, int], float] = {}
    for label, members in by_label.items():
        E = np.stack([v for _, v in members])
        centroid = np.array([_round_half_up(c, 6) for c in E.mean(axis=0)])
        cn = math.sqrt(float(centroid @ centroid))
        csim = {
            vid: _round_half_up(float(v @ centroid) / (math.sqrt(float(v @ v)) * cn), 6)
            for vid, v in members
        }
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                (ia, va), (ib, vb) = members[i], members[j]
                a, b = (ia, va), (ib, vb)
                if ia > ib:
                    a, b = b, a
                cos = _round_half_up(
                    float(a[1] @ b[1])
                    / (math.sqrt(float(a[1] @ a[1])) * math.sqrt(float(b[1] @ b[1]))),
                    4,
                )
                if cos < _SEMDEDUP_TAU:
                    continue
                ca, cb = csim[a[0]], csim[b[0]]
                if ca > cb:
                    loser, lc = a[0], ca
                elif cb > ca:
                    loser, lc = b[0], cb
                else:
                    loser, lc = max(a[0], b[0]), cb
                out[(label, loser)] += 1
                csims[(label, loser)] = lc
    return out, csims


def test_semdedup_matches_numpy_ground_truth(spark):
    got = {
        (r.label, r.pruned_id): (r.n_pairs, r.csim)
        for r in q_semdedup_prune(spark, SF).collect()
    }
    want_counts, want_csims = _numpy_oracle()
    assert set(got) == set(want_counts)
    for key, (n, csim) in got.items():
        assert n == want_counts[key], key
        assert abs(csim - want_csims[key]) < 1e-6, key


def test_semdedup_prunes_centroid_closest_member(spark):
    """For every reported pair the pruned member's centroid-cosine is >=
    the kept member's (outliers survive — the SemDeDup diversity rule)."""
    _, csims = _numpy_oracle()
    rows = q_semdedup_prune(spark, SF).collect()
    assert rows, "expected near-dup pairs at sf0.001"
    for r in rows:
        assert abs(r.csim - csims[(r.label, r.pruned_id)]) < 1e-6
