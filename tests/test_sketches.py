"""Sketch-state operators: the DuckDB oracle pins the register/counter
tables bit-for-bit; these tests pin what the sketches MEAN — the HLL
estimate tracks the exact distinct count, the CMS point estimate is an
upper bound that is tight for heavy hitters, and lsh_eval's confusion
counts reconcile with the exact pair set."""

from __future__ import annotations

from pyspark.sql import functions as F

from webcrawler_spark.queries import (
    _CMS_D,
    _CMS_W,
    _HLL_P,
    q_countmin_sketch,
    q_hll_registers,
    q_lsh_eval,
    q_minhash_lsh_candidates,
    q_ngram_jaccard_pairs,
    _read,
    _tokens,
)

SF = "/root/testdata/sf0.001"


def test_hll_estimate_tracks_exact_distinct(spark):
    m = 1 << _HLL_P
    alpha = 0.7213 / (1 + 1.079 / m)
    regs = {}
    for r in q_hll_registers(spark, SF).collect():
        regs.setdefault(r.lang, {})[r.bucket] = r.rho
    docs = _tokens(_read(spark, SF, "documents")).filter(F.expr("size(toks) >= 3"))
    exact = {
        r.lang: r.n
        for r in docs.select(
            "lang",
            F.explode(
                F.expr(
                    "array_distinct(transform(sequence(1, size(toks) - 2), i -> "
                    "concat_ws(' ', element_at(toks, i), element_at(toks, i+1), element_at(toks, i+2))))"
                )
            ).alias("s"),
        )
        .groupBy("lang")
        .agg(F.countDistinct("s").alias("n"))
        .collect()
    }
    assert set(regs) == set(exact)
    for lang, by_bucket in regs.items():
        # raw HLL estimator; empty registers contribute 2^0
        s = sum(2.0 ** -by_bucket.get(b, 0) for b in range(m))
        est = alpha * m * m / s
        n = exact[lang]
        # 256 registers -> standard error 6.5%; 20% is a 3-sigma bound
        assert abs(est - n) / n < 0.20, (lang, est, n)


def test_cms_point_estimate_upper_bounds_truth(spark):
    cells = {
        (r.r, r.b): r.counter for r in q_countmin_sketch(spark, SF).collect()
    }
    tf = (
        _tokens(_read(spark, SF, "documents"))
        .select(F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    total = sum(r.c for r in tf)
    import hashlib

    def bucket(row: int, term: str) -> int:
        h = hashlib.md5(f"{row}:{term}".encode()).hexdigest()
        return int(h[:8], 16) % _CMS_W

    for r in tf:
        est = min(cells[(row, bucket(row, r.term))] for row in range(_CMS_D))
        assert est >= r.c, r.term  # never underestimates
        # collision error bound: overshoot < total stream mass (loose
        # deterministic form of the e/w * ||f||_1 guarantee)
        assert est - r.c <= total - r.c

    # every counter row sums the full stream: column sums == ||f||_1
    for row in range(_CMS_D):
        assert sum(v for (rr, _), v in cells.items() if rr == row) == total


def test_lsh_eval_reconciles_with_exact_pair_sets(spark):
    row = q_lsh_eval(spark, SF).collect()[0]
    n_truth = q_ngram_jaccard_pairs(spark, SF).count()
    n_cand = q_minhash_lsh_candidates(spark, SF).count()
    assert row.tp + row.fn == n_truth
    assert row.tp + row.fp == n_cand
    assert 0.0 <= row.precision <= 1.0 and 0.0 <= row.recall <= 1.0
    # 4 bands x 2 hashes at J>=0.5 catches most true pairs on this corpus
    assert row.recall >= 0.5


# ------------------------------------------------------------------ ams_f2_sketch


def test_ams_f2_python_replication_and_bound(spark):
    """Integer-exact replication of the tug-of-war sketch: per-term md5
    signs, Z sums, lower-median of 4 means-of-4; plus the estimator
    sanity bound (median-of-means keeps the estimate within a small
    constant factor of exact F2 on this corpus)."""
    import hashlib

    from webcrawler_spark.queries import _AMS_K, q_ams_f2_sketch

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    tf = {}
    for r in docs:
        for t in r.text.lower().split():
            if t:
                tf[(r.lang, t)] = tf.get((r.lang, t), 0) + 1
    langs = sorted({lang for lang, _ in tf})
    want = {}
    for lang in langs:
        z = [0] * _AMS_K
        exact = 0
        for (lg, term), f in tf.items():
            if lg != lang:
                continue
            exact += f * f
            for k in range(_AMS_K):
                bit = int(hashlib.md5(f"{k}|{term}".encode()).hexdigest()[0], 16) % 2
                z[k] += f if bit == 0 else -f
        gs = sorted(
            sum(z[k] * z[k] for k in range(g * 4, g * 4 + 4)) for g in range(4)
        )
        med4 = gs[1]  # lower median of 4
        est = med4 // 4
        want[lang] = (exact, est, abs(est - exact) * 1_000_000 // exact)
    got = {
        r.lang: (r.f2_exact, r.f2_est, r.err_ppm)
        for r in q_ams_f2_sketch(spark, SF).collect()
    }
    assert got == want
    for exact, est, err_ppm in got.values():
        assert est > 0
        # loose deterministic form of the AMS median-of-means guarantee
        assert err_ppm <= 2_000_000, (exact, est)
