"""TuneVocabulary (L1-L4) + sampler pivot (S9) tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from webcrawler_spark.plans.tune import (
    build_pairs,
    learn_epoch,
    render_sample,
    sampler_pivot,
    tune_vocabulary,
)


def _graph(spark):
    """Linked pages share 'linkword'; unlinked pairs share only noise."""
    vectors = spark.createDataFrame(
        [
            (1, ["linkword", "alpha", "noise"]),
            (2, ["linkword", "beta", "noise"]),
            (3, ["linkword", "gamma"]),
            (4, ["delta", "noise"]),
            (5, ["epsilon", "noise"]),
            (6, ["zeta"]),
        ],
        "id long, words array<string>",
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src long, dst long"
    )
    return vectors, edges


def test_build_pairs_shapes(spark):
    vectors, edges = _graph(spark)
    pairs = build_pairs(vectors, edges, seed=7)
    rows = pairs.collect()
    pos = [r for r in rows if r["haslink"]]
    neg = [r for r in rows if not r["haslink"]]
    assert len(pos) == 3
    assert len(neg) <= 3  # anti-joined vs edge set, dup ids possible
    # positives carry the shared word
    for r in pos:
        assert "linkword" in set(r["w1"]) & set(r["w2"])


def test_edges_require_known_endpoints(spark):
    """readMatrix semi-join (TuneVocabulary.scala:86-89): edges touching
    unknown ids are dropped."""
    vectors, _ = _graph(spark)
    edges = spark.createDataFrame([(1, 2), (1, 99)], "src long, dst long")
    pairs = build_pairs(vectors, edges, seed=7)
    assert pairs.filter("haslink").count() == 1


def test_learn_separates(spark):
    vectors, edges = _graph(spark)
    net, errs = tune_vocabulary(vectors, edges, epochs=8, seed=7)
    # the discriminative word gets positive weight
    assert net.get("linkword", 0.0) > 0.0
    # training error reaches 0 on this separable toy
    assert errs[-1] == 0 or min(errs) < errs[0]


def test_learn_epoch_counts_errors(spark):
    vectors, edges = _graph(spark)
    pairs = build_pairs(vectors, edges, seed=7)
    # zero net: every linked pair scores 0 -> misclassified (dot <= 0);
    # unlinked pairs score 0 -> correct (dot <= 0)
    _, err = learn_epoch(pairs, {})
    assert err == pairs.filter("haslink").count()


def test_pair_ids_stable_without_cache(spark):
    """pid is a pure function of pair provenance, so the score and delta
    jobs inside learn_epoch agree even when the pairs plan is recomputed
    from scratch between jobs (no cache — the eviction scenario)."""
    vectors, edges = _graph(spark)
    pairs = build_pairs(vectors, edges, seed=7)  # deliberately NOT cached
    assert "pid" in pairs.columns
    rows = pairs.collect()
    assert len({r["pid"] for r in rows}) == len(rows)  # unique ids
    # two full epochs on the uncached frame: identical results both times
    net_a, err_a = learn_epoch(pairs, {"linkword": 0.5})
    net_b, err_b = learn_epoch(pairs, {"linkword": 0.5})
    assert err_a == err_b
    assert net_a == net_b


def _dense_graph(spark):
    """Pairs dense enough to pass the sample.main filters: every doc
    carries 20 shared words (count(v1∩v2) > 5, count(v) > 10)."""
    shared = [f"s{i}" for i in range(20)]
    vectors = spark.createDataFrame(
        [(i, shared + [f"own{i}a", f"own{i}b"]) for i in range(1, 9)],
        "id long, words array<string>",
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (5, 6), (6, 7), (7, 8)], "src long, dst long"
    )
    return vectors, edges


def test_octave_sample_export_bytes(spark):
    """G4 sample.main (TuneVocabulary.scala:165-230): byte parity of
    index.dat/sample.dat against an independent pure-Python render of the
    reference's logic (filter thresholds, 1-based rows, 0-based columns,
    (col,row) triplet sort, Octave struct header layout)."""
    from webcrawler_spark.plans.tune import octave_sample_export

    vectors, edges = _dense_graph(spark)
    pairs = build_pairs(vectors, edges, seed=7)
    files = octave_sample_export(pairs, max_words=100, seed=7)

    # -- independent oracle: replay the scala logic on the collected pairs
    widx = {}
    for line in files["index.dat"].splitlines():
        n, w = line.split(" : ")
        widx[w] = int(n)
    rows = pairs.collect()  # same deterministic sample order
    filtered = []
    for r in rows:
        s1 = {w for w in r["w1"] if w in widx}
        s2 = {w for w in r["w2"] if w in widx}
        both = s1 & s2
        if len(s1) > 10 and len(s2) > 10 and len(both) > 5:
            filtered.append((sorted(widx[w] for w in both), bool(r["haslink"])))
    assert filtered, "filters must keep some samples for the test to bite"
    trip = [(n + 1, j) for n, (js, _) in enumerate(filtered) for j in js]
    trip.sort(key=lambda t: (t[1], t[0]))
    want = (
        "\n# Created by Octave 3.2.4, Sun Feb 16 14:54:23 2014 MSK "
        "<cray@cray-To-be-filled-by-O-E-M>\n"
        "# name: sample\n# type: struct\n# length: 2\n# name: X\n"
        "# type: cell\n# rows: 1\n# columns: 1\n# name: <cell-element>\n"
        "# type: sparse matrix\n"
        f"# nnz: {len(trip)}\n# rows: {len(filtered)}\n# columns: {len(widx)}\n"
        + "".join(f"{i} {j} 1\n" for i, j in trip)
        + "\n# name: Y\n# type: cell\n# rows: 1\n# columns: 1\n"
        "# name: <cell-element>\n# type: matrix\n"
        f"# rows: {len(filtered)}\n# columns: 1\n"
        + "".join("1\n" if l else "0\n" for _, l in filtered)
    )
    assert files["sample.dat"] == want
    # index covers the full word universe here (< max_words cap)
    n_words = vectors.select(F.explode("words")).distinct().count()
    assert len(widx) == n_words


def test_sampler_pivot_and_render(spark):
    linkctx = spark.createDataFrame(
        [("l1", "div", 1.0)] * 6
        + [("l2", "div", 2.0)] * 6
        + [("l1", "rare", 1.0)],
        "link string, feature string, weight double",
    )
    prios = spark.createDataFrame(
        [("l1", 0.5), ("l2", 0.1)], "link string, priority double"
    )
    piv = sampler_pivot(linkctx, prios, min_count=10)
    rows = piv.collect()
    # 'div' count = 12 > 10 kept; 'rare' dropped
    assert piv.columns == ["link", "div", "priority"]
    assert [r["link"] for r in rows] == ["l2", "l1"]  # ascending priority
    assert rows[0]["div"] == 12.0  # sum of weights for l2
    text = render_sample(piv)
    assert text.splitlines()[-1] == "div"
    assert text.splitlines()[0].endswith(": 12")


def test_sampler_pivot_bounded(spark):
    """max_links keeps only the top-K links by priority — the in-loop
    dump's bound against unbounded driver collects — and the kept slice
    renders identically to its rows in the unbounded matrix."""
    n = 50
    linkctx = spark.createDataFrame(
        [(f"l{i}", "div", 1.0) for i in range(n) for _ in range(3)],
        "link string, feature string, weight double",
    )
    prios = spark.createDataFrame(
        [(f"l{i}", float(i)) for i in range(n)], "link string, priority double"
    )
    piv = sampler_pivot(linkctx, prios, min_count=10, max_links=5)
    rows = piv.collect()
    assert len(rows) == 5
    # the top-5 by priority, still rendered ascending
    assert [r["link"] for r in rows] == [f"l{i}" for i in range(45, 50)]
    full = sampler_pivot(linkctx, prios, min_count=10).collect()
    assert rows == full[-5:]
