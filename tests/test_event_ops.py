"""Event-analytics operators: as-of join (union-and-carry composition —
Spark has no ASOF JOIN) and gap-based sessionization. Python recounts pin
semantics; plan audits pin the single-shuffle shape."""

from __future__ import annotations

import contextlib
import io

from webcrawler_spark.queries import (
    _SESSION_GAP_US,
    q_asof_join,
    q_sessionize,
)

SF = "/root/testdata/sf0.001"


def plan_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _events(spark):
    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    return [
        (r.event_id, r.ts, r.user_id, r.event_type, r.value) for r in rows
    ]


def _us(ts) -> int:
    import calendar

    return calendar.timegm(ts.timetuple()) * 1_000_000 + ts.microsecond


def test_asof_join_matches_python_recount(spark):
    ev = _events(spark)
    by_user_views = {}
    for eid, ts, uid, etype, _ in ev:
        if etype == "view":
            by_user_views.setdefault(uid, []).append((ts, eid))
    for v in by_user_views.values():
        v.sort()
    expect = {}
    for eid, ts, uid, etype, _ in ev:
        if etype != "click":
            continue
        best = None
        for vts, vid in by_user_views.get(uid, []):
            if vts <= ts:
                best = (vid, vts)
            else:
                break
        expect[eid] = (
            uid,
            _us(ts),
            best[0] if best else None,
            _us(best[1]) if best else None,
            _us(ts) - _us(best[1]) if best else None,
        )
    got = {
        r.click_id: (r.user_id, r.click_ts_us, r.view_id, r.view_ts_us, r.gap_us)
        for r in q_asof_join(spark, SF).collect()
    }
    assert got == expect
    assert any(v[2] is None for v in got.values()) or len(got) > 0
    # non-trivial: most clicks should have a prior view at this density
    matched = sum(1 for v in got.values() if v[2] is not None)
    assert matched > 0


def _op_names(plan: str) -> list[str]:
    """Operator names from the formatted plan's numbered sections."""
    import re as _re

    return _re.findall(r"^\(\d+\) (\w+)", plan, _re.M)


def test_asof_join_single_shuffle_no_join(spark):
    p = plan_str(q_asof_join(spark, SF))
    ops = _op_names(p)
    assert ops.count("Exchange") == 1, ops
    for op in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct",
               "BroadcastNestedLoopJoin"):
        assert op not in ops


def test_sessionize_matches_python_recount(spark):
    ev = _events(spark)
    per_user = {}
    for eid, ts, uid, _etype, value in ev:
        per_user.setdefault(uid, []).append((ts, value))
    expect = {}
    for uid, rows in per_user.items():
        rows.sort()
        sess = 0
        prev = None
        for ts, value in rows:
            if prev is None or _us(ts) - _us(prev) > _SESSION_GAP_US:
                sess += 1
            prev = ts
            key = (uid, sess)
            n, start, end, sv = expect.get(key, (0, None, None, 0.0))
            expect[key] = (
                n + 1,
                min(start, _us(ts)) if start is not None else _us(ts),
                max(end, _us(ts)) if end is not None else _us(ts),
                sv + value,
            )
    got = {
        (r.user_id, r.session_num): (r.n_events, r.start_us, r.end_us, r.sum_value)
        for r in q_sessionize(spark, SF).collect()
    }
    assert set(got) == set(expect)
    for k, (n, start, end, sv) in expect.items():
        gn, gs, ge, gsv = got[k]
        assert (gn, gs, ge) == (n, start, end), k
        assert abs(gsv - sv) < 1e-6, k


def test_sessionize_single_shuffle(spark):
    p = plan_str(q_sessionize(spark, SF))
    # both windows AND the (user, session) aggregation reuse the single
    # hash partitioning by user — one Exchange, partial+final agg
    ops = _op_names(p)
    assert ops.count("Exchange") == 1, ops
    assert ops.count("HashAggregate") == 2, ops


# ------------------------------------------------ haar_wavelet_energy


def test_haar_python_replication(spark):
    """Replicate the full pyramid transform sequentially and compare
    level energies with the closed-form signed-sum version, plus
    Parseval-style bookkeeping on the unnormalized transform."""
    import calendar
    import datetime

    from webcrawler_spark.queries import _HAAR_BASE, _HAAR_LEVELS, q_haar_wavelet_energy

    base = calendar.timegm(
        datetime.datetime.strptime(_HAAR_BASE, "%Y-%m-%d %H:%M:%S").timetuple()
    ) * 1000
    n = 1 << _HAAR_LEVELS
    cnt = [0] * n
    for e in spark.read.parquet(f"{SF}/events.parquet").collect():
        ms = calendar.timegm(e.ts.timetuple()) * 1000 + e.ts.microsecond // 1000
        h = (ms - base) // 3600000
        if 0 <= h < n:
            cnt[h] += 1
    present = {h for h in range(n) if cnt[h] > 0}
    # classic sequential pyramid: a -> (sums, diffs); the engine only
    # materializes blocks containing >=1 event-hour (absent blocks are
    # exact zeros: no energy, no max contribution)
    want = {}
    a = cnt[:]
    for level in range(1, _HAAR_LEVELS + 1):
        sums, diffs = [], []
        for i in range(0, len(a), 2):
            sums.append(a[i] + a[i + 1])
            diffs.append(a[i] - a[i + 1])
        nonempty = {h >> level for h in present}
        mx = max((abs(diffs[b]) for b in nonempty), default=0)
        want[level] = (len(nonempty), sum(d * d for d in diffs), mx)
        a = sums
    rows = {r.level: r for r in q_haar_wavelet_energy(spark, SF).collect()}
    assert set(rows) == set(want)
    for level, (ncoef, energy, mx) in want.items():
        r = rows[level]
        assert (r.n_coeffs, r.energy, r.max_abs_coef) == (ncoef, energy, mx), level


# ---------------------------------------------------- busy_intervals


def test_busy_intervals_python_recount(spark):
    import calendar

    from webcrawler_spark.queries import _BUSY_HOLD_S, q_busy_intervals

    by_user: dict[int, list] = {}
    for e in spark.read.parquet(f"{SF}/events.parquet").collect():
        t = calendar.timegm(e.ts.timetuple()) * 1000 + e.ts.microsecond // 1000
        by_user.setdefault(e.user_id, []).append(t // 1000)
    rows = {r.user_id: r for r in q_busy_intervals(spark, SF).collect()}
    assert set(rows) == set(by_user)
    for uid, ts in by_user.items():
        ts.sort()
        islands = []
        for t in ts:
            if islands and t < islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], t + _BUSY_HOLD_S)
            else:
                islands.append([t, t + _BUSY_HOLD_S])
        busy = sum(e - s for s, e in islands)
        r = rows[uid]
        assert (r.n_events, r.n_islands, r.busy_sec) == (len(ts), len(islands), busy), uid
        # merging can only shrink the naive estimate
        assert r.busy_sec <= len(ts) * _BUSY_HOLD_S
        assert r.busy_sec >= _BUSY_HOLD_S  # at least one island


# -------------------------------------------------- sequence_patterns


def test_sequence_patterns_recount(spark):
    import calendar

    from webcrawler_spark.queries import q_sequence_patterns

    span: dict[tuple, list] = {}
    for e in spark.read.parquet(f"{SF}/events.parquet").collect():
        t = calendar.timegm(e.ts.timetuple()) * 1000 + e.ts.microsecond // 1000
        k = (e.user_id, e.event_type)
        if k not in span:
            span[k] = [t, t]
        else:
            span[k][0] = min(span[k][0], t)
            span[k][1] = max(span[k][1], t)
    users: dict[int, dict] = {}
    for (u, et), (f, l) in span.items():
        users.setdefault(u, {})[et] = (f, l)
    want: dict[tuple, list] = {}
    for u, types in users.items():
        for a in types:
            for b in types:
                if a != b:
                    k = (a, b)
                    want.setdefault(k, [0, 0])
                    want[k][0] += 1
                    want[k][1] += int(types[a][0] < types[b][1])
    rows = q_sequence_patterns(spark, SF).collect()
    assert {(r.a, r.b) for r in rows} == set(want)
    for r in rows:
        both, sup = want[(r.a, r.b)]
        assert (r.n_users_both, r.support) == (both, sup), r
        assert r.support_ppm == sup * 1_000_000 // both
        # existence-ordering is near-symmetric on dense histories but
        # must stay a valid fraction
        assert 0 <= r.support_ppm <= 1_000_000


# ------------------------------------------------ mutual_information


def test_mutual_information_recount(spark):
    import calendar
    import math

    from webcrawler_spark.queries import _MI_HOD_BUCKETS, q_mutual_information

    cells: dict[tuple, int] = {}
    for e in spark.read.parquet(f"{SF}/events.parquet").collect():
        ms = calendar.timegm(e.ts.timetuple()) * 1000 + e.ts.microsecond // 1000
        hod = ((ms // 3600000) % 24) // (24 // _MI_HOD_BUCKETS)
        cells[(e.event_type, hod)] = cells.get((e.event_type, hod), 0) + 1
    cx: dict[str, int] = {}
    cy: dict[int, int] = {}
    n = 0
    for (et, hod), c in cells.items():
        cx[et] = cx.get(et, 0) + c
        cy[hod] = cy.get(hod, 0) + c
        n += c
    want: dict[str, int] = {}
    for (et, hod), c in cells.items():
        lnq = math.floor(math.log((c * n) / float(cx[et] * cy[hod])) * 1_000_000)
        want[et] = want.get(et, 0) + c * lnq
    rows = {r.et: r for r in q_mutual_information(spark, SF).collect()}
    assert set(rows) == set(cx)
    for et, r in rows.items():
        assert (r.n_events, r.mi_contrib_micro) == (cx[et], want[et]), et
    # MI >= 0 up to per-cell floor-quantization (each floor loses < 1
    # micro-nat per count): the total can only undershoot by < N micros
    total = sum(want.values())
    assert total >= -n, total


# ---------------------------------------------- pagerank_convergence


def test_pagerank_convergence_geometric(spark):
    from webcrawler_spark.queries import _PR_DAMPING, q_pagerank_convergence

    rows = sorted(q_pagerank_convergence(spark, SF).collect(), key=lambda r: r.iter)
    assert [r.iter for r in rows] == [1, 2, 3, 4]
    for r in rows:
        assert 0 <= r.linf_delta <= r.l1_delta
    # residuals decay and the decay is at least geometric-ish in the
    # damping factor (each iteration contracts by <= d up to mixing)
    for a, b in zip(rows, rows[1:]):
        assert b.l1_delta < a.l1_delta, (a, b)
        assert b.l1_delta <= a.l1_delta * (_PR_DAMPING + 0.1) + 1e-6
    # and the final ranks of q_pagerank correspond to a nearly-converged
    # state: last residual is small relative to the first
    assert rows[-1].l1_delta < 0.25 * rows[0].l1_delta


# ------------------------------------------------ k_anonymity_audit


def test_k_anonymity_recount(spark):
    import calendar

    from webcrawler_spark.queries import _MI_HOD_BUCKETS, q_k_anonymity_audit

    groups: dict[tuple, list] = {}
    for e in spark.read.parquet(f"{SF}/events.parquet").collect():
        ms = calendar.timegm(e.ts.timetuple()) * 1000 + e.ts.microsecond // 1000
        hod = ((ms // 3600000) % 24) // (24 // _MI_HOD_BUCKETS)
        groups.setdefault((e.event_type, hod), []).append(e.user_id)
    rows = q_k_anonymity_audit(spark, SF).collect()
    assert {(r.et, r.hod) for r in rows} == set(groups)
    for r in rows:
        us = groups[(r.et, r.hod)]
        assert (r.k_count, r.l_distinct) == (len(us), len(set(us))), r
        assert r.meets_k20 == int(len(us) >= 20)
        assert r.meets_l5 == int(len(set(us)) >= 5)
        assert r.l_distinct <= r.k_count


# ------------------------------------------ kaplan_meier_survival


def test_kaplan_meier_recount(spark):
    import calendar
    import math

    from webcrawler_spark.queries import _KM_CENSOR_DAYS, q_kaplan_meier_survival

    spans: dict[int, tuple] = {}
    wmax = 0
    for e in spark.read.parquet(f"{SF}/events.parquet").collect():
        ms = calendar.timegm(e.ts.timetuple()) * 1000 + e.ts.microsecond // 1000
        lo, hi = spans.get(e.user_id, (ms, ms))
        spans[e.user_id] = (min(lo, ms), max(hi, ms))
        wmax = max(wmax, ms)
    durs = [
        ((hi - lo) // 86400000, hi < wmax - _KM_CENSOR_DAYS * 86400000)
        for lo, hi in spans.values()
    ]
    byt: dict[int, list] = {}
    for t, churn in durs:
        d, c = byt.get(t, (0, 0))
        byt[t] = (d + int(churn), c + int(not churn))
    rows = sorted(q_kaplan_meier_survival(spark, SF).collect(), key=lambda r: r.t_days)
    assert [r.t_days for r in rows] == sorted(byt)
    cum_before = 0
    cum_ln = 0
    prev_risk = None
    for r in rows:
        d, c = byt[r.t_days]
        n_risk = len(durs) - cum_before
        assert (r.n_risk, r.d_churn, r.c_censored) == (n_risk, d, c), r
        if n_risk > d:
            step = math.floor(math.log((n_risk - d) / n_risk) * 1_000_000)
            assert r.step_micro == step
            cum_ln += step
            assert r.cum_ln_micro == cum_ln
            assert step <= 0  # log-survival steps never increase
        else:
            assert r.step_micro is None
        if prev_risk is not None:
            assert n_risk < prev_risk  # risk set strictly shrinks per event time
        prev_risk = n_risk
        cum_before += d + c
    # everyone is accounted for: last risk set minus its events/censorings = 0
    assert cum_before == len(durs)


# --------------------------------------- gorilla_timestamp_bits


def test_gorilla_bits_recount(spark):
    import calendar

    from webcrawler_spark.queries import q_gorilla_timestamp_bits

    series: dict[str, list] = {}
    for e in spark.read.parquet(f"{SF}/events.parquet").collect():
        ms = calendar.timegm(e.ts.timetuple()) * 1000 + e.ts.microsecond // 1000
        series.setdefault(e.event_type, []).append((ms // 1000, e.event_id))
    rows = {r.et: r for r in q_gorilla_timestamp_bits(spark, SF).collect()}
    assert set(rows) == set(series)
    for et, pts in series.items():
        pts.sort()
        total = 0
        counts = {0: 0, 9: 0, 12: 0, 16: 0, 36: 0}
        prev_t = prev_d = None
        for i, (t, _) in enumerate(pts):
            if i == 0:
                total += 64
            elif i == 1:
                total += 14
                prev_d = t - prev_t
            else:
                d = t - prev_t
                dod = d - prev_d
                prev_d = d
                if dod == 0:
                    b = 1
                elif -63 <= dod <= 64:
                    b = 9
                elif -255 <= dod <= 256:
                    b = 12
                elif -2047 <= dod <= 2048:
                    b = 16
                else:
                    b = 36
                counts[0 if b == 1 else b] += 1
                total += b
            prev_t = t
        r = rows[et]
        assert r.n_pts == len(pts), et
        assert (r.c_dod0, r.c_bits9, r.c_bits12, r.c_bits16, r.c_bits36) == (
            counts[0],
            counts[9],
            counts[12],
            counts[16],
            counts[36],
        ), et
        assert r.total_bits == total, et
        assert r.bits_per_pt_milli == total * 1000 // len(pts)
        # cost model sanity: never below the all-dod0 floor nor above the header-max
        assert 64 + 14 + (len(pts) - 2) * 1 <= total <= 64 + 14 + (len(pts) - 2) * 36
