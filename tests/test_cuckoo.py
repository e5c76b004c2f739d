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


def test_colliding_keys_survive_deletion():
    """Two DISTINCT keys that collide on (fingerprint, bucket pair) must
    each hold a slot: deleting one may not expire the other (the ADVICE
    false-negative case — a shared slot would break the prefilter's
    no-false-negatives contract)."""
    import numpy as np

    from webcrawler_spark.sources.cuckoo import PartitionedCuckoo, _alt_index

    m, slots = 256, 4
    table = np.zeros((m, slots), dtype=np.uint16)
    rng = np.random.default_rng(0)
    # two distinct keys, same fingerprint, same primary bucket
    fp, i1 = 77, 13
    over = PartitionedCuckoo._insert_batch(
        table, [fp, fp], [i1, i1], m, slots, 500, rng
    )
    assert over == 0
    i2 = int(_alt_index(np.array([i1], dtype=np.uint64),
                        np.array([fp], dtype=np.uint16), m)[0])
    copies = int((table[i1] == fp).sum() + (table[i2] == fp).sum())
    assert copies == 2  # duplicate stored, not skipped
    # expire ONE of them (single-slot removal, as delete_df does)
    hit = np.where(table[i1] == fp)[0]
    table[i1][hit[0]] = 0
    copies = int((table[i1] == fp).sum() + (table[i2] == fp).sum())
    assert copies == 1  # the other key still probes as present


def test_same_key_batch_deduped(spark):
    """The SAME url listed twice in one add batch occupies one slot (the
    safe idempotency), so load does not grow with repeated mentions."""
    ck = PartitionedCuckoo(n_shards=4, buckets_per_shard=1 << 10)
    dup = _urls(spark, 0, 300).unionAll(_urls(spark, 0, 300))
    ck.add_df(dup)
    used = sum(int((t != 0).sum()) for t in ck.tables.values())
    assert used == 300
