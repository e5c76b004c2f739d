"""max_df scale path of ngram_jaccard: hot shingles excluded from
candidate generation (the d^2 blowup guard), Jaccard still computed
EXACTLY over candidates' full shingle sets."""

from __future__ import annotations

from webcrawler_spark.queries import ngram_jaccard


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_maxdf_matches_exact_when_hot_not_loadbearing(spark):
    """Near-dup pairs share plenty of rare shingles here, so dropping the
    hot boilerplate shingle from candidate generation changes nothing —
    and the verification stage must reproduce the exact jaccard
    (including the hot shingle's contribution to |intersection|)."""
    boiler = "all rights reserved worldwide"  # in every doc -> hot shingles
    common = "alpha beta gamma delta epsilon zeta theta iota kappa lambda"
    rows = [
        (1, f"{common} one {boiler}"),
        (2, f"{common} two {boiler}"),  # near-dup of 1 (jaccard ~0.625)
        (3, f"q w e r t y u i o p {boiler}"),
        (4, f"a s d f g h j k l m {boiler}"),
    ]
    exact = sorted(map(tuple, ngram_jaccard(_docs(spark, rows)).collect()))
    capped = sorted(map(tuple, ngram_jaccard(_docs(spark, rows), max_df=3).collect()))
    assert exact == capped
    assert exact, "scenario must produce at least one near-dup pair"


def test_maxdf_drops_pairs_held_only_by_hot_shingles(spark):
    """Docs 3/4 share ONLY the boilerplate (hot) shingles; the capped
    path must not emit them as candidates, while 1/2 (rare overlap)
    survive with their exact jaccard."""
    boiler = "x y z w v u t s r q p o n m l k"  # long shared boilerplate
    rows = [
        (1, f"alpha beta gamma delta {boiler}"),
        (2, f"alpha beta gamma delta {boiler}"),
        (3, boiler),
        (4, boiler),
    ]
    exact = {(r["a_id"], r["b_id"]) for r in ngram_jaccard(_docs(spark, rows)).collect()}
    capped_rows = ngram_jaccard(_docs(spark, rows), max_df=2).collect()
    capped = {(r["a_id"], r["b_id"]) for r in capped_rows}
    assert (3, 4) in exact  # identical docs — exact path reports them
    assert (3, 4) not in capped  # only-hot overlap -> stop-shingle removal
    assert (1, 2) in capped
    # the surviving pair's jaccard is the EXACT value (full shingle sets)
    exact_j = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in ngram_jaccard(_docs(spark, rows)).collect()
    }
    for r in capped_rows:
        assert r["jaccard"] == exact_j[(r["a_id"], r["b_id"])]


def test_maxdf_equals_exact_on_sf0001(spark):
    """On the driver corpus a generous cap changes nothing: every result
    pair shares at least one sub-cap shingle."""
    from webcrawler_spark.queries import _docs_parallel

    docs = _docs_parallel(spark, "/root/testdata/sf0.001")
    exact = sorted(map(tuple, ngram_jaccard(docs).collect()))
    capped = sorted(map(tuple, ngram_jaccard(docs, max_df=20).collect()))
    assert exact == capped
