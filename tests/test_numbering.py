"""Distributed first-seen id assignment (VERDICT round 1, item 4): the
two-phase numbering must reproduce the exact global (dr, pos) order of the
old single-partition Window — while actually running wide (no 1-task
global sort stage)."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from webcrawler_spark.plans.crawler import dense_first_seen_ids


def _entities(spark, n_rows, nb, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n_rows):
        rows.append((f"u{i}", rng.randrange(nb), rng.randrange(1000)))
    # distinct (dr,pos) per row for a total order (mimics first-emitter dedup)
    seen = set()
    rows = [
        (u, dr, pos)
        for u, dr, pos in rows
        if (dr, pos) not in seen and not seen.add((dr, pos))
    ]
    return spark.createDataFrame(rows, "url string, dr int, pos int"), rows


def test_matches_global_window_order(spark):
    df, rows = _entities(spark, 500, nb=16)
    got, total = dense_first_seen_ids(df, "url", "seed_id", base=100, nb=16, n_parts=4)
    assert total == len(rows)
    want = (
        df.select(
            "url",
            (F.row_number().over(Window.orderBy("dr", "pos")) + F.lit(99)).alias(
                "seed_id"
            ),
        )
        .collect()
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want))


def test_runs_wide_not_single_task(spark):
    df, _ = _entities(spark, 2000, nb=32)
    got, _ = dense_first_seen_ids(df, "url", "seed_id", base=1, nb=32, n_parts=8)
    # the assignment pass runs over the bucket-partitioned checkpoint: more
    # than one non-empty partition => no serial global-sort bottleneck
    sizes = got.rdd.glom().map(len).collect()
    assert len([s for s in sizes if s > 0]) > 1


def test_budget1_degenerates_gracefully(spark):
    df = spark.createDataFrame([("a", 0, 3), ("b", 0, 1)], "url string, dr int, pos int")
    got, total = dense_first_seen_ids(df, "url", "seed_id", base=5, nb=1, n_parts=4)
    assert total == 2
    assert {(r["url"], r["seed_id"]) for r in got.collect()} == {("b", 5), ("a", 6)}


def test_empty_input(spark):
    df = spark.createDataFrame([], "url string, dr int, pos int")
    got, total = dense_first_seen_ids(df, "url", "seed_id", base=1, nb=4, n_parts=4)
    assert total == 0
    assert got.count() == 0
