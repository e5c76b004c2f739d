"""Physical-plan audits for the session-11 registry queries: the scale
posture each docstring claims must be visible in `.explain` — the
reuse-distance block join must be a hash join (never nested-loop) and
run wide of the single-partition window, bounded frames broadcast,
sequential detectors stay window-only, and no row-at-a-time Python
anywhere."""

from __future__ import annotations

import contextlib
import io

from webcrawler_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def plan_str(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def _q(name, spark):
    fn, _ = REGISTRY[name]
    return fn(spark, SF)


def test_reuse_distance_block_join_is_hash_not_nested_loop(spark):
    # the 143s regression fixed this session: the gap join must be an
    # equi hash join on the block key (range predicates as filters),
    # never a BroadcastNestedLoopJoin over raw non-equi predicates,
    # and an explicit exchange must break the single-partition window
    # chain before the heavy stages. Audited on the pre-checkpoint
    # builder (q_reuse_distance_mrc's localCheckpoint truncates the
    # visible plan).
    from webcrawler_spark.queries import _reuse_distance_dists

    p = plan_str(_reuse_distance_dists(spark, SF))
    assert "BroadcastHashJoin" in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "REPARTITION_BY_COL" in p or "hashpartitioning(b#" in p


def test_cusum_and_page_hinkley_are_window_only(spark):
    # prefix-sum rewrites: no joins beyond the 1-row moment broadcast,
    # no Python, the detector is pure window algebra
    for name in ("cusum_drift", "page_hinkley_drift"):
        p = plan_str(_q(name, spark))
        assert "BatchEvalPython" not in p
        assert "CartesianProduct" not in p
        assert "Window" in p


def test_lof_pairs_are_label_bucketed(spark):
    # the pairwise stage must join on the label bucket key — a plan
    # with a pure cross join would be corpus-quadratic
    p = plan_str(_q("lof_outliers", spark))
    assert "CartesianProduct" not in p
    assert "label" in p


def test_oph_audit_no_python_and_bounded_grid_join(spark):
    # signature build + densification are all JVM expressions; the
    # <=k x k per-doc borrow join must not appear as a cartesian
    p = plan_str(_q("oph_minhash_audit", spark))
    assert "BatchEvalPython" not in p
    assert "CartesianProduct" not in p


def test_mahalanobis_stats_broadcast(spark):
    # the 64-row per-dim moment frame must broadcast back into the
    # score fold (shuffling the corpus against 64 rows would be wrong)
    p = plan_str(_q("mahalanobis_diag_outliers", spark))
    assert "BroadcastHashJoin" in p
    assert "BatchEvalPython" not in p


def test_newey_west_lag_join_broadcasts_the_lag_grid(spark):
    # the 24-row lag frame joins the series via broadcast, not an
    # exchange of the series per lag
    p = plan_str(_q("newey_west_se", spark))
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    assert "BatchEvalPython" not in p


def test_haar_synopsis_prefix_joins_pruned(spark):
    # coefficient frame joins the prefix sums on equi index keys;
    # the parquet scan must only read ts (column pruning)
    p = plan_str(_q("haar_synopsis_error", spark))
    assert "BatchEvalPython" not in p
    scan = p[p.find("FileScan parquet") :][:400]
    assert "value" not in scan.split("ReadSchema")[-1][:120]


def test_segmented_break_single_cumulative_pass(spark):
    # the O(n) sweep: one window subtree computing all five prefix
    # sums, then scalar algebra — never a per-breakpoint re-aggregate
    p = plan_str(_q("segmented_regression_break", spark))
    assert "BatchEvalPython" not in p
    # the five prefix sums ride in ONE Window node over the series —
    # count physical Window NODES (formatted mode prints each node in
    # the tree AND the detail list, so match detail headers)
    import re

    nodes = len(re.findall(r"\(\d+\) Window", p))
    assert nodes <= 5, nodes


def test_logrank_range_frame_at_risk(spark):
    # at-risk counts must come from RANGE-frame windows (ties pooled),
    # not a per-death-time join against the lifetime table
    p = plan_str(_q("logrank_test", spark))
    assert "specifiedwindowframe(RangeFrame" in p or "RangeFrame" in p
    assert "CartesianProduct" not in p


def test_youden_and_average_precision_single_sweep(spark):
    # ROC/PR sweeps are one ordered pass + fold — no threshold x data
    # join anywhere
    for name in ("youden_threshold", "average_precision"):
        p = plan_str(_q(name, spark))
        assert "CartesianProduct" not in p
        assert "BatchEvalPython" not in p
        assert "Window" in p
