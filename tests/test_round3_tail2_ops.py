"""Ground-truth recounts for the later round-3 tail queries: the
queue-backlog Lindley closed form vs a literal loop, cache-policy hit
counts vs an actual LRU simulation, the secretary rule vs a sequential
replay, RFM terciles, and the n-gram ladder's diminishing returns."""

from __future__ import annotations

from collections import OrderedDict

SF = "/root/testdata/sf0.001"


def _events(spark, *cols):
    return spark.read.parquet(f"{SF}/events.parquet").select(*cols).collect()


# ------------------------------------------------------- queue_backlog_trace


def test_queue_backlog_matches_literal_lindley_loop(spark):
    from webcrawler_spark.queries import q_queue_backlog_trace

    rows = _events(spark, "event_type", "ts")
    per: dict = {}
    for r in rows:
        h = r.ts.replace(minute=0, second=0, microsecond=0)
        per.setdefault(r.event_type, {}).setdefault(h, 0)
        per[r.event_type][h] += 1
    got = {r.event_type: r for r in q_queue_backlog_trace(spark, SF).collect()}
    from datetime import timedelta

    for et, hours in per.items():
        h0, h1 = min(hours), max(hours)
        span = int((h1 - h0).total_seconds() // 3600) + 1
        tot = sum(hours.values())
        cap = (12 * tot + 10 * span - 1) // (10 * span)
        backlog = 0
        peak = 0
        congested = 0
        h = h0
        n_hours = 0
        while h <= h1:
            backlog = max(0, backlog + hours.get(h, 0) - cap)
            peak = max(peak, backlog)
            congested += backlog > 0
            n_hours += 1
            h += timedelta(hours=1)
        r = got[et]
        assert r.capacity_per_hour == cap, et
        assert r.n_hours == n_hours, et
        assert r.peak_backlog == peak, (et, r.peak_backlog, peak)
        assert r.congested_milli == 1000 * congested // n_hours, et


# ------------------------------------------------------- cache_policy_compare


def test_cache_policy_lru_matches_real_lru_simulation(spark):
    from webcrawler_spark.queries import q_cache_policy_compare

    rows = sorted(
        _events(spark, "event_id", "ts", "user_id"),
        key=lambda r: (r.ts, r.event_id),
    )
    got = {r.cache_size: r for r in q_cache_policy_compare(spark, SF).collect()}
    for size in (8, 32):
        cache: OrderedDict = OrderedDict()
        hits = 0
        re_accesses = 0
        seen = set()
        for r in rows:
            item = r.user_id
            if item in seen:
                re_accesses += 1
                if item in cache:
                    hits += 1
            seen.add(item)
            if item in cache:
                cache.move_to_end(item)
            else:
                cache[item] = True
                if len(cache) > size:
                    cache.popitem(last=False)
        g = got[size]
        assert g.re_accesses == re_accesses, size
        # reuse-distance < size is EXACTLY an LRU hit for a stack policy
        assert g.lru_hits == hits, (size, g.lru_hits, hits)


# --------------------------------------------------------- secretary_rule_eval


def test_secretary_rule_matches_sequential_replay(spark):
    from webcrawler_spark.queries import q_secretary_rule_eval

    rows = _events(spark, "event_type", "ts", "event_id", "value")
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    got = {r.event_type: r for r in q_secretary_rule_eval(spark, SF).collect()}
    for et, seq in by_type.items():
        seq.sort(key=lambda r: (r.ts, r.event_id))
        n = len(seq)
        cutoff = n * 368 // 1000
        best_seen = None
        accepted = None
        accepted_at = None
        for i, r in enumerate(seq, start=1):
            if i > cutoff and best_seen is not None and r.value > best_seen:
                accepted = r.value
                accepted_at = i
                break
            best_seen = r.value if best_seen is None else max(best_seen, r.value)
        if accepted is None:
            accepted = seq[-1].value
            accepted_at = n
        g = got[et]
        assert g.n == n and g.cutoff == cutoff, et
        assert g.accepted_at == accepted_at, et
        assert abs(g.accepted_value - accepted) < 1e-6, et
        assert g.captured_max == int(accepted == max(r.value for r in seq)), et


# ----------------------------------------------------------------- rfm_segments


def test_rfm_segments_partition_all_users(spark):
    from webcrawler_spark.queries import q_rfm_segments

    rows = q_rfm_segments(spark, SF).collect()
    users = {r.user_id for r in _events(spark, "user_id")}
    assert sum(r.n_users for r in rows) == len(users)
    for r in rows:
        assert 1 <= r.r_t <= 3 and 1 <= r.f_t <= 3 and 1 <= r.m_t <= 3


# ------------------------------------------------------------ ngram_order_ladder


def test_ngram_ladder_monotone_in_context(spark):
    from webcrawler_spark.queries import q_ngram_order_ladder

    rows = sorted(
        q_ngram_order_ladder(spark, SF).collect(), key=lambda r: r.order_n
    )
    assert [r.order_n for r in rows] == [1, 2, 3]
    assert all(r.xent_nats > 0 for r in rows)
    # each extra order drops n-1 scoring positions per doc
    scored = [r.n_scored for r in rows]
    assert scored[0] > scored[1] > scored[2]
    # this corpus is random word soup: context CANNOT help, and Laplace
    # over the growing n-gram vocabulary must make held-out surprisal
    # strictly worse with order — the ladder correctly exposes that the
    # corpus has no n-gram structure (on natural text it bends the other
    # way; the direction IS the signal)
    xs = [r.xent_nats for r in rows]
    assert xs[0] < xs[1] < xs[2]


# ------------------------------------------------------- multi_index_hamming_plan


def test_multi_index_pigeonhole_guarantee(spark):
    from webcrawler_spark.queries import (
        _FPR_BITS,
        q_multi_index_hamming_plan,
    )

    rows = sorted(
        q_multi_index_hamming_plan(spark, SF).collect(), key=lambda r: r.b
    )
    assert [r.b for r in rows] == [2, 4, 8]
    for r in rows:
        assert r.guaranteed_radius == r.b - 1
        assert r.used_buckets <= r.b * (1 << (_FPR_BITS // r.b))
    # more blocks => smaller keys => more collisions => more candidates
    cands = [r.cand_per_query_milli for r in rows]
    assert cands == sorted(cands)
