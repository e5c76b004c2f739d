"""Physical-layout scale evidence: the three cluster-side techniques the
100 TB posture leans on but that no oracle query can show — bucketed
co-located joins (zero-shuffle repeated joins on a stable key), AQE
skew-join splitting (hot-host fan-in bounded at runtime), and
partition-pruned reads on a partitioned layout (wave/date pruning for
the frontier tables). Each test pins the plan property, not a timing."""

from __future__ import annotations

import contextlib
import io

import pytest

from pyspark.sql import functions as F


def _final_plan(df) -> str:
    # the AQE-final executed plan — only meaningful after an action
    return df._jdf.queryExecution().executedPlan().toString()


def plan_str(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@contextlib.contextmanager
def _confs(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        old[key] = spark.conf.get(key, None)
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Tables bucketed+sorted on the join key join WITHOUT any Exchange:
    the layout the frontier/seen/url_ids tables would use on a real
    deployment so every wave's joins are co-located instead of
    re-shuffling 10^10 rows. (catalog.py emulates the Iceberg commit
    protocol; bucketing is the companion physical layout.)"""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS layoutdb LOCATION '{tmp_path}/wh'")
    try:
        a = spark.range(0, 10_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("va")
        )
        b = spark.range(0, 10_000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
        )
        for name, df in (("ta", a), ("tb", b)):
            (
                df.write.mode("overwrite")
                .bucketBy(8, "k")
                .sortBy("k")
                .saveAsTable(f"layoutdb.{name}")
            )
        with _confs(spark, spark__sql__autoBroadcastJoinThreshold="-1"):
            j = spark.table("layoutdb.ta").join(spark.table("layoutdb.tb"), "k")
            p = plan_str(j)
            # co-located: a sort-merge join with ZERO shuffle exchanges
            assert "SortMergeJoin" in p
            assert "Exchange hashpartitioning" not in p
            assert j.count() == 10_000
    finally:
        spark.sql("DROP DATABASE IF EXISTS layoutdb CASCADE")


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join handling: a deliberately hot key (the hot-domain
    shape from synth.py's host 0) gets its reducer partition split at
    runtime — `skew=true` in the final executed plan — so one hot host
    cannot serialize a wave's join. Complements the engine's static
    salting (crawler.py politeness window)."""
    big = spark.range(0, 200_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))  # 90% of rows on key 0
        .otherwise(F.col("id") % 1000)
        .alias("k"),
        F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("pad"),
    )
    small = spark.range(0, 1000).select(
        F.col("id").alias("k"), F.lit(1).alias("one")
    )
    with _confs(
        spark,
        spark__sql__autoBroadcastJoinThreshold="-1",
        spark__sql__adaptive__skewJoin__enabled="true",
        spark__sql__adaptive__skewJoin__skewedPartitionFactor="2",
        spark__sql__adaptive__skewJoin__skewedPartitionThresholdInBytes="256KB",
        spark__sql__adaptive__advisoryPartitionSizeInBytes="64KB",
        spark__sql__adaptive__coalescePartitions__enabled="false",
    ):
        j = big.join(small, "k")
        # execute THIS DataFrame (count() would run a derived plan and
        # leave j's own adaptive plan unfinalized)
        assert len(j.collect()) == 200_000
        fp = _final_plan(j)
        assert "isFinalPlan=true" in fp
        assert "skew=true" in fp


def test_partitioned_layout_prunes_partitions(spark, tmp_path):
    """A layout partitioned by a coarse key (wave id / crawl date for the
    frontier and dispatch_log tables) must serve a single-partition
    predicate by reading ONLY that partition — partition pruning visible
    in the scan, independent of row-group statistics."""
    df = spark.range(0, 10_000).select(
        (F.col("id") % 8).alias("wave"), F.col("id").alias("seed_id")
    )
    path = f"{tmp_path}/frontier"
    df.write.mode("overwrite").partitionBy("wave").parquet(path)
    rd = spark.read.parquet(path).filter(F.col("wave") == 3)
    p = plan_str(rd)
    scan = p[p.index("Scan parquet") :]
    assert "PartitionFilters" in scan
    # the wave predicate rides the partition filter, not a row filter
    pf = scan.split("PartitionFilters:")[1].splitlines()[0]
    assert "wave" in pf
    assert rd.count() == 10_000 // 8
    # only the wave=3 directory is touched at runtime (input_file_name
    # observes the files actually read, unlike the unpruned FileIndex)
    files = [
        r.f
        for r in rd.select(F.input_file_name().alias("f")).distinct().collect()
    ]
    assert files and all("wave=3" in f for f in files)
