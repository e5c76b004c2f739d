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
