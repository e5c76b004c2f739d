"""Partitioned Cuckoo filter: no-false-negatives, prefilter equivalence
with the exact anti-join, and fingerprint deletion (recrawl expiry)."""

from __future__ import annotations

from pyspark.sql import functions as F

from webcrawler_spark.sources.cuckoo import PartitionedCuckoo, _FP_SALT, _IX_SALT, _salted


def _urls(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("http://c.example.org/page/"), F.col("id")).alias("url")
    )


def _probe_col(cuckoo, spark, df):
    probe = cuckoo.might_contain_udf(spark)
    return df.withColumn("m", probe(_salted("url", _FP_SALT), _salted("url", _IX_SALT)))


def test_no_false_negatives(spark):
    seen = _urls(spark, 0, 3000)
    ck = PartitionedCuckoo(n_shards=8, buckets_per_shard=1 << 10)
    ck.add_df(seen)
    assert ck.n_overflow == 0
    assert _probe_col(ck, spark, seen).filter(~F.col("m")).count() == 0
    assert 0.0 < ck.load_factor < 1.0


def test_prefilter_equals_exact(spark):
    seen = _urls(spark, 0, 1500)
    cand = _urls(spark, 1000, 3000)
    ck = PartitionedCuckoo(n_shards=8, buckets_per_shard=1 << 10)
    ck.add_df(seen)
    got = sorted(r["url"] for r in ck.prefilter(cand, seen).collect())
    want = sorted(r["url"] for r in cand.join(seen, "url", "left_anti").collect())
    assert got == want


def test_delete_expires_membership(spark):
    """The feature bloom cannot do: expire seen-entries for recrawl."""
    seen = _urls(spark, 0, 1000)
    ck = PartitionedCuckoo(n_shards=8, buckets_per_shard=1 << 10)
    ck.add_df(seen)
    expired = _urls(spark, 0, 200)
    ck.delete_df(expired)
    # expired keys probe False again (eligible for refetch)...
    assert _probe_col(ck, spark, expired).filter(F.col("m")).count() <= 200 * 0.01
    # ...while every retained key still has no false negatives
    kept = _urls(spark, 200, 1000)
    assert _probe_col(ck, spark, kept).filter(~F.col("m")).count() == 0


def test_incremental_add(spark):
    ck = PartitionedCuckoo(n_shards=4, buckets_per_shard=1 << 10)
    ck.add_df(_urls(spark, 0, 500))
    ck.add_df(_urls(spark, 500, 1000))
    assert ck.n_overflow == 0
    assert _probe_col(ck, spark, _urls(spark, 0, 1000)).filter(~F.col("m")).count() == 0
