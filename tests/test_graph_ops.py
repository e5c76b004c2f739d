"""Graph-suite additions: k-core peeling, deterministic label
propagation, and the retrieval-eval harness. Ground-truth semantics on
known graphs plus brute-force parity on the real derived graph;
Spark<->DuckDB parity is pinned by the driver oracle."""

from __future__ import annotations

import itertools

from webcrawler_spark.queries import (
    _KCORE_K,
    _pagerank_edges,
    q_k_core,
    q_label_propagation,
    q_retrieval_eval,
)

SF = "/root/testdata/sf0.001"


def _fake_edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs],
        "src long, dst long",
    )


def test_k_core_known_graph(spark, monkeypatch):
    # K4 on {0,1,2,3} (3-core), a pendant chain 3-4-5 and an isolated
    # edge 6-7: everything outside the K4 peels away at k=3.
    pairs = list(itertools.combinations(range(4), 2)) + [(3, 4), (4, 5), (6, 7)]
    monkeypatch.setattr(
        "webcrawler_spark.queries._pagerank_edges",
        lambda s, d: _fake_edges(spark, pairs),
    )
    got = {r.node: r.core_deg for r in q_k_core(spark, SF).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_k_core_brute_force_parity(spark):
    und = {
        tuple(sorted((r.src, r.dst)))
        for r in _pagerank_edges(spark, SF).collect()
    }
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        doomed = [n for n, ns in adj.items() if len(ns) < _KCORE_K]
        changed = bool(doomed)
        for n in doomed:
            for m in adj.pop(n):
                adj[m].discard(n)
    got = {r.node: r.core_deg for r in q_k_core(spark, SF).collect()}
    assert got == {n: len(ns) for n, ns in adj.items()}


def test_label_propagation_two_cliques(spark, monkeypatch):
    # Two disjoint cliques: deterministic min-tie LPA converges each
    # clique to its smallest member id within the 4 fixed rounds.
    k1 = list(itertools.combinations([0, 1, 2, 3], 2))
    k2 = list(itertools.combinations([10, 11, 12], 2))
    monkeypatch.setattr(
        "webcrawler_spark.queries._pagerank_edges",
        lambda s, d: _fake_edges(spark, k1 + k2),
    )
    got = {r.node: r.community for r in q_label_propagation(spark, SF).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10, 12: 10}


def test_label_propagation_deterministic(spark):
    a = sorted(map(tuple, q_label_propagation(spark, SF).collect()))
    b = sorted(map(tuple, q_label_propagation(spark, SF).collect()))
    assert a == b and len(a) == 50


def test_retrieval_eval_metric_bounds(spark):
    rows = q_retrieval_eval(spark, SF).collect()
    assert len(rows) == 5 and {r.qid for r in rows} == set(range(5))
    for r in rows:
        assert 0.0 <= r.prec_at_10 <= 1.0
        assert 0.0 <= r.mrr <= 1.0
        assert 0.0 <= r.ndcg <= 1.0
        if r.n_rel == 0:
            assert r.ndcg == 0.0 and r.prec_at_10 == 0.0 and r.mrr == 0.0


def test_opic_mass_conservation(spark):
    # OPIC's invariant (Abiteboul 2003): total cash stays 1.0 every
    # round and total banked history equals the round count — the
    # property that makes importance = (hist+cash)/(t+1) a distribution
    from webcrawler_spark.queries import _OPIC_ITERS, q_opic_importance

    rows = q_opic_importance(spark, SF).collect()
    # outputs are rounded 6dp per row, so sums carry up to n*5e-7 slack
    assert abs(sum(r.cash for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.hist for r in rows) - float(_OPIC_ITERS)) < 1e-4
    assert abs(sum(r.importance for r in rows) - 1.0) < 1e-4
    assert all(r.importance >= 0.0 for r in rows)


def test_opic_star_graph(spark, monkeypatch):
    # hub 0 -> {1,2,3}, back-edges to 0: the hub must accumulate the
    # most importance (it receives every spoke's full cash each round)
    pairs = [(0, 1), (0, 2), (0, 3)]
    monkeypatch.setattr(
        "webcrawler_spark.queries._pagerank_edges",
        lambda s, d: _fake_edges(spark, pairs),
    )
    from webcrawler_spark.queries import q_opic_importance

    got = {r.node: r.importance for r in q_opic_importance(spark, SF).collect()}
    assert max(got, key=got.get) == 0


def test_trust_rank_mass_and_seed_bias(spark):
    from webcrawler_spark.queries import q_trust_rank

    rows = q_trust_rank(spark, SF).collect()
    # personalized PageRank conserves mass: sum(trust) = 1 (6dp rounding slack)
    assert abs(sum(r.trust for r in rows) - 1.0) < 1e-4
    seeds = [r.trust for r in rows if r.is_seed]
    others = [r.trust for r in rows if not r.is_seed]
    assert seeds and others
    # trust concentrates on/near the seed set: seed mean dominates
    assert sum(seeds) / len(seeds) > sum(others) / len(others)
    # every node with zero trust path stays at (1-d)*tele = 0 for non-seeds
    assert all(r.trust >= 0 for r in rows)


def test_trust_rank_unreachable_spam_gets_zero(spark, monkeypatch):
    # a clique {21,22} (no seeds: seed set is node%10==0) disconnected
    # from the seed component (0 -> 1) must end at exactly 0 trust —
    # the defining TrustRank property PageRank lacks
    pairs = [(0, 1), (21, 22)]
    monkeypatch.setattr(
        "webcrawler_spark.queries._pagerank_edges",
        lambda s, d: _fake_edges(spark, pairs),
    )
    from webcrawler_spark.queries import q_trust_rank

    got = {r.node: r.trust for r in q_trust_rank(spark, SF).collect()}
    assert got[21] == 0.0 and got[22] == 0.0
    assert got[0] > 0.0 and got[1] > 0.0


def test_graph_modularity_python_recount(spark):
    """Exact integer recount of e_c / deg_c / m on the real derived graph,
    plus the closed-form Q contribution per community."""
    from webcrawler_spark.queries import _MOD_COMMS, q_graph_modularity

    edges = {
        (min(r.src, r.dst), max(r.src, r.dst))
        for r in _pagerank_edges(spark, SF).collect()
    }
    m = len(edges)
    deg: dict[int, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    rows = {r.comm: r for r in q_graph_modularity(spark, SF).collect()}
    assert set(rows) == set(range(_MOD_COMMS))
    total_q = 0.0
    for c, r in rows.items():
        ec = sum(1 for a, b in edges if a % _MOD_COMMS == c and b % _MOD_COMMS == c)
        dc = sum(d for n, d in deg.items() if n % _MOD_COMMS == c)
        nn = sum(1 for n in deg if n % _MOD_COMMS == c)
        assert r.internal_edges == ec
        assert r.deg_sum == dc
        assert r.n_nodes == nn
        assert r.q_contrib == round(ec / m - (dc * dc) / (4.0 * m * m), 8)
        total_q += r.q_contrib
    # a hash partition of a hash graph is ~random: |Q| stays far from 1
    assert -0.5 < total_q < 0.5


def test_graph_modularity_perfect_partition(spark, monkeypatch):
    """Two disjoint cliques split exactly by comm = node % _MOD_COMMS
    (nodes chosen so each clique lands in one community) => each
    community's contribution is e_c/m - (deg_c/2m)^2 with zero
    cross edges, and total Q = 1/2 - sum (deg_c/2m)^2 > 0."""
    from webcrawler_spark.queries import _MOD_COMMS, q_graph_modularity

    assert _MOD_COMMS == 4
    # clique A on {0,4,8} (all % 4 == 0), clique B on {1,5,9} (% 4 == 1)
    a_nodes, b_nodes = [0, 4, 8], [1, 5, 9]
    pairs = list(itertools.combinations(a_nodes, 2)) + list(
        itertools.combinations(b_nodes, 2)
    )
    monkeypatch.setattr(
        "webcrawler_spark.queries._pagerank_edges",
        lambda s, d: _fake_edges(spark, pairs),
    )
    rows = {r.comm: r for r in q_graph_modularity(spark, SF).collect()}
    m = len(pairs)
    for comm in (0, 1):
        r = rows[comm]
        assert r.internal_edges == 3 and r.deg_sum == 6 and r.n_nodes == 3
        assert r.q_contrib == round(3 / m - 36 / (4.0 * m * m), 8)
    assert sum(r.q_contrib for r in rows.values()) > 0.4


def test_hyperanf_python_replication_and_bfs_tracking(spark):
    """Replicate the register max-merge + estimate in python exactly;
    assert estimates are exact-HLL-identical and track BFS ball growth."""
    import hashlib
    import math

    from webcrawler_spark.queries import (
        _ANF_LOW,
        _ANF_P,
        _ANF_ROUNDS,
        q_hyperanf_neighborhood,
    )

    m = 1 << _ANF_P
    edges = [(r.src, r.dst) for r in _pagerank_edges(spark, SF).collect()]
    nodes = sorted({n for e in edges for n in e})
    out: dict[int, list] = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)

    def sketch(n):
        hv = int(hashlib.md5(str(n).encode()).hexdigest()[:15], 16)
        bucket, w = hv >> _ANF_LOW, hv & ((1 << _ANF_LOW) - 1)
        rho = _ANF_LOW + 1 if w == 0 else _ANF_LOW - w.bit_length() + 1
        return {bucket: rho}

    def estimate(regs):
        alpha = 0.7213 / (1.0 + 1.079 / m)
        s_total = float(
            sum(1 << (52 - r) for r in regs.values()) + (m - len(regs)) * (1 << 52)
        )
        raw = alpha * m * m * float(1 << 52) / s_total
        zeros = m - len(regs)
        if raw <= 2.5 * m and zeros > 0:
            return float(m) * math.log(float(m) / zeros)
        return raw

    state = {n: sketch(n) for n in nodes}
    got = {(r.t, r.node): r.ball_est for r in q_hyperanf_neighborhood(spark, SF).collect()}
    # exact BFS balls for the tracking assertion
    for t in range(1, _ANF_ROUNDS + 1):
        new = {}
        for n in nodes:
            regs = dict(state[n])
            for nb in out.get(n, []):
                for b, r in state[nb].items():
                    regs[b] = max(regs.get(b, 0), r)
            new[n] = regs
        state = new
        for n in nodes:
            assert got[(t, n)] == round(estimate(state[n]), 4)
    # monotone: ball estimates never shrink round-over-round per node
    for n in nodes:
        for t in range(2, _ANF_ROUNDS + 1):
            assert got[(t, n)] >= got[(t - 1, n)]


def test_edge_reciprocity_known_graph_and_recount(spark, monkeypatch):
    from webcrawler_spark.queries import q_edge_reciprocity

    # directed: 0<->1 mutual, 0->2 one-way, 2->3 one-way
    def _directed(s, d):
        return spark.createDataFrame(
            [(0, 1), (1, 0), (0, 2), (2, 3)], "src long, dst long"
        )

    monkeypatch.setattr("webcrawler_spark.queries._pagerank_edges", _directed)
    rows = {r.node: r for r in q_edge_reciprocity(spark, SF).collect()}
    assert rows[0].out_deg == 2 and rows[0].reciprocated == 1
    assert rows[0].recip_ppm == 500000
    assert rows[1].out_deg == 1 and rows[1].reciprocated == 1
    assert rows[1].recip_ppm == 1000000
    assert rows[2].out_deg == 1 and rows[2].reciprocated == 0
    assert rows[2].recip_ppm == 0
    assert 3 not in rows  # no out-edges => no row (out-degree table drives)


def test_edge_reciprocity_real_graph_recount(spark):
    from webcrawler_spark.queries import q_edge_reciprocity

    edges = {(r.src, r.dst) for r in _pagerank_edges(spark, SF).collect()}
    rows = {r.node: r for r in q_edge_reciprocity(spark, SF).collect()}
    outs: dict[int, int] = {}
    recs: dict[int, int] = {}
    for s, d in edges:
        outs[s] = outs.get(s, 0) + 1
        if (d, s) in edges:
            recs[s] = recs.get(s, 0) + 1
    assert set(rows) == set(outs)
    for n, r in rows.items():
        assert r.out_deg == outs[n]
        assert r.reciprocated == recs.get(n, 0)
        assert r.recip_ppm == recs.get(n, 0) * 1000000 // outs[n]


def test_ktruss_peel_known_graph(spark, monkeypatch):
    """K5 on {0..4} plus a triangle {10,11,12} plus a pendant edge:
    every K5 edge has support 3 >= 2 and survives all peels; the lone
    triangle's edges (support 1) and the pendant (0) peel away in
    round 1."""
    from webcrawler_spark.queries import q_ktruss_peel

    k5 = list(itertools.combinations(range(5), 2))
    tri = [(10, 11), (10, 12), (11, 12)]
    pend = [(0, 20)]
    monkeypatch.setattr(
        "webcrawler_spark.queries._pagerank_edges",
        lambda s, d: _fake_edges(spark, k5 + tri + pend),
    )
    rows = {(r.a, r.b): r.support for r in q_ktruss_peel(spark, SF).collect()}
    assert set(rows) == set(k5)
    assert all(s == 3 for s in rows.values())


def test_ktruss_peel_python_fixpoint_recount(spark):
    """Replicate the bounded peel in python on the real graph; assert the
    surviving edge set and final supports match exactly."""
    from webcrawler_spark.queries import _KTRUSS_K, _KTRUSS_ROUNDS, q_ktruss_peel

    edges = {
        (min(r.src, r.dst), max(r.src, r.dst))
        for r in _pagerank_edges(spark, SF).collect()
    }

    def supports(es):
        sup = {e: 0 for e in es}
        nodes = sorted({n for e in es for n in e})
        es_set = set(es)
        for a, b, c in itertools.combinations(nodes, 3):
            if (a, b) in es_set and (a, c) in es_set and (b, c) in es_set:
                sup[(a, b)] += 1
                sup[(a, c)] += 1
                sup[(b, c)] += 1
        return sup

    cur = set(edges)
    for _ in range(_KTRUSS_ROUNDS):
        sup = supports(cur)
        cur = {e for e in cur if sup.get(e, 0) >= _KTRUSS_K - 2}
    final_sup = supports(cur)
    got = {(r.a, r.b): r.support for r in q_ktruss_peel(spark, SF).collect()}
    assert got == {e: final_sup[e] for e in cur}


def test_effective_diameter_monotone_and_final(spark):
    from webcrawler_spark.queries import (
        _ANF_ROUNDS,
        q_effective_diameter,
        q_hyperanf_neighborhood,
    )

    rows = sorted(q_effective_diameter(spark, SF).collect(), key=lambda r: r.t)
    assert [r.t for r in rows] == list(range(1, _ANF_ROUNDS + 1))
    # N(t) is monotone nondecreasing and the final round is 100% of itself
    for a, b in zip(rows, rows[1:]):
        assert b.nf_micro >= a.nf_micro
    assert rows[-1].frac_of_final == 1.0 and rows[-1].reached90 == 1
    # cross-check nf against the hyperanf rows it aggregates
    anf = q_hyperanf_neighborhood(spark, SF).collect()
    nf = {}
    for r in anf:
        nf[r.t] = nf.get(r.t, 0) + round(r.ball_est * 10000)
    for r in rows:
        assert r.nf_micro == nf[r.t]


# ------------------------------------------------------------------ salsa_scores


def test_salsa_python_replication(spark):
    """Integer-exact python replication of the 2-round SALSA propagation
    (h div out_deg / a div in_deg edge shipping) over the derived host
    graph — pins both the walk normalization and the nano-unit integer
    division semantics."""
    import hashlib

    from webcrawler_spark.queries import (
        _PR_NODES,
        _SALSA_ITERS,
        _SALSA_UNIT,
        q_salsa_scores,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    edges = set()
    for r in ev:
        src = r.user_id % _PR_NODES
        dst = int(hashlib.md5(str(r.event_id).encode()).hexdigest()[:4], 16) % _PR_NODES
        if src != dst:
            edges.add((src, dst))
    og, ig = {}, {}
    for s, d in edges:
        og[s] = og.get(s, 0) + 1
        ig[d] = ig.get(d, 0) + 1
    h = {s: _SALSA_UNIT for s in og}
    a = {}
    for _ in range(_SALSA_ITERS):
        a = {}
        for s, d in edges:
            if s in h:
                a[d] = a.get(d, 0) + h[s] // og[s]
        h = {}
        for s, d in edges:
            if d in a:
                h[s] = h.get(s, 0) + a[d] // ig[d]
    got = {r.node: (r.auth_nano, r.hub_nano) for r in q_salsa_scores(spark, SF).collect()}
    want = {
        n: (a.get(n, 0), h.get(n, 0)) for n in set(a) | set(h)
    }
    assert got == want
    # walk conservation: integer division only sheds mass, never creates it
    assert sum(v for v, _ in got.values()) <= len(og) * _SALSA_UNIT
    assert sum(v for _, v in got.values()) <= sum(v for v, _ in got.values())


# ------------------------------------------------- community_conductance


def test_conductance_python_recount(spark):
    from webcrawler_spark.queries import _COND_K, _pagerank_edges, q_community_conductance

    edges = [(r.src, r.dst) for r in _pagerank_edges(spark, SF).collect()]
    vol = {c: 0 for c in range(_COND_K)}
    cut = {c: 0 for c in range(_COND_K)}
    for s, d in edges:
        ca, cb = s % _COND_K, d % _COND_K
        vol[ca] += 1
        vol[cb] += 1
        if ca != cb:
            cut[ca] += 1
            cut[cb] += 1
    vol_all = 2 * len(edges)
    rows = q_community_conductance(spark, SF).collect()
    assert [r.community for r in rows] == sorted(c for c in vol if vol[c] > 0)
    for r in rows:
        assert (r.vol, r.cut) == (vol[r.community], cut[r.community]), r
        assert r.phi_micro == cut[r.community] * 1_000_000 // min(
            vol[r.community], vol_all - vol[r.community]
        )
        # planted mod-K blocks on an md5-random graph: conductance sits in
        # the random regime (≈ 1 - 1/K), far from a real community's
        assert 500_000 < r.phi_micro <= 1_000_000, r


# ------------------------------------------------------ bipartite_check


def test_bipartite_python_recount(spark):
    """Replicate BFS parity coloring + witness-edge counting in pure
    Python on the same synthetic edge set."""
    from webcrawler_spark.queries import _BFS_ROUNDS, _BFS_SEED_MOD, q_bipartite_check

    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    edges = set()
    for s in range(n):
        for d in ((s * 7 + 3) % n, (s // 3) % n):
            if s != d:
                edges.add((s, d))
    # multi-source BFS, _BFS_ROUNDS rounds, directed relaxation
    lev = {i: (0 if i % _BFS_SEED_MOD == 0 else None) for i in range(n)}
    for _ in range(_BFS_ROUNDS):
        nxt = dict(lev)
        for s, d in edges:
            if lev[s] is not None:
                c = lev[s] + 1
                if nxt[d] is None or c < nxt[d]:
                    nxt[d] = c
        lev = nxt
    color = {i: (-1 if lev[i] is None else lev[i] % 2) for i in range(n)}
    conf = [(s, d) for s, d in edges if color[s] >= 0 and color[s] == color[d]]
    ninc = {i: 0 for i in range(n)}
    for s, d in conf:
        ninc[s] += 1
        ninc[d] += 1
    rows = q_bipartite_check(spark, SF).collect()
    assert len(rows) == n
    for r in rows:
        assert (r.color, r.n_conflicts) == (color[r.doc_id], ninc[r.doc_id]), r
    # the synthetic graph is NOT bipartite — witnesses must exist, and
    # unreached nodes must report color -1 with zero conflicts
    assert sum(r.n_conflicts for r in rows) > 0
    for r in rows:
        if r.color == -1:
            assert r.n_conflicts == 0
