"""Golden-file export tests — ports of the reference's own scenarios:

- GML: TestGMLStorage.scala:28-71 vs data/network{1,2}.gml
- linked vectors: TestLinkedVectorsStorage.scala:26-78 vs
  data/matrix{1,2}.dat, data/map{1,2}.lst, data/{1,2}.dat

The comparison mirrors the reference tests' readLines semantics
(line-sequence equality)."""

from __future__ import annotations

import pytest

from webcrawler_spark.kernels.vectors import SparseVector
from webcrawler_spark.plans.estimators import SemanticEstimator
from webcrawler_spark.plans.exports import (
    compute_statistics,
    gml_ids,
    gml_matrix,
    render_gml,
    render_linked_vectors,
    render_statistic,
)

GOLD = "/root/reference/data"


def uri(n: int) -> str:
    return f"http://example.org/{n}"


def gold_lines(name: str) -> list[str]:
    with open(f"{GOLD}/{name}") as f:
        return f.read().splitlines()


def log_df(spark, events):
    """events: list of (ord, url, links, terms)."""
    return spark.createDataFrame(
        events, "ord long, url string, links array<string>, terms map<string,double>"
    )


@pytest.fixture(scope="module")
def estimator():
    # reference test: new SemanticEstimator(Vector(1 -> 3.0)) —
    # central = v; factor = target.normal - average.normal = 0
    return SemanticEstimator.create(SparseVector({"1": 3.0}))


def render_from_log(spark, events, est, with_incomplete=False) -> list[str]:
    log = log_df(spark, events)
    ids = gml_ids(log)
    terms, out_edges = gml_matrix(log, ids)
    return render_gml(
        ids, terms, out_edges, est.central, est.factor, with_incomplete
    ).splitlines()


def test_gml_network1(spark, estimator):
    events = [(0, uri(1), [uri(1), uri(2), uri(3)], {"1": 1.0})]
    assert render_from_log(spark, events, estimator) == gold_lines("network1.gml")


def test_gml_network2(spark, estimator):
    events = [
        (0, uri(1), [uri(1), uri(2), uri(3)], {"1": 1.0}),
        (1, uri(2), [uri(1), uri(2), uri(3)], {"2": 2.0}),
    ]
    assert render_from_log(spark, events, estimator) == gold_lines("network2.gml")


def test_linked_vectors_golden(spark):
    # first event only -> matrix1/map1/1.dat
    ev1 = [(0, uri(1), [uri(1), uri(2), uri(3)], {"one": 1.0})]
    files = render_linked_vectors(log_df(spark, ev1))
    assert files["matrix.dat"].splitlines() == gold_lines("matrix1.dat")
    assert files["map.lst"].splitlines() == gold_lines("map1.lst")
    assert files["1.dat"].splitlines() == gold_lines("1.dat")

    # both events -> matrix2/map2/2.dat (1.dat unchanged)
    ev2 = ev1 + [(1, uri(2), [uri(3), uri(4)], {"two": 2.0})]
    files = render_linked_vectors(log_df(spark, ev2))
    assert files["matrix.dat"].splitlines() == gold_lines("matrix2.dat")
    assert files["map.lst"].splitlines() == gold_lines("map2.lst")
    assert files["1.dat"].splitlines() == gold_lines("1.dat")
    assert files["2.dat"].splitlines() == gold_lines("2.dat")


def test_statistics_two_nodes(spark, estimator):
    """A9-A12 sanity on the 2-node golden scenario: orthogonal unit-ish
    vectors {1:1} and {2:2} -> every normalized pair distance^2 = 2."""
    events = [
        (0, uri(1), [uri(1), uri(2), uri(3)], {"1": 1.0}),
        (1, uri(2), [uri(1), uri(2), uri(3)], {"2": 2.0}),
    ]
    log = log_df(spark, events)
    ids = gml_ids(log)
    terms, out_edges = gml_matrix(log, ids)
    stats = compute_statistics(
        terms,
        out_edges,
        central=estimator.central,
        target_normal=estimator.target.normal,
        factor=estimator.factor,
    )
    assert stats["size"] == 2
    # edges between the two distinct nodes have d2 = 2; self-edges d2 = 0;
    # edge set = {1->1, 1->2, 2->1, 2->2} -> mean = 1.0
    assert stats["density_net"] == pytest.approx(1.0)
    # cloud pairs exclude self-pairs -> mean = 2.0
    assert stats["density_cloud"] == pytest.approx(2.0)
    # central = {1:3}: dev to {1:1} is 0, to {2:1} is 2 -> mean 1.0
    assert stats["deviation_central"] == pytest.approx(1.0)
    # factor = 0 vector -> accumulated priority 0
    assert stats["accumulated_priority"] == pytest.approx(0.0)
    text = render_statistic(stats)
    assert text.splitlines()[1] == "Size of Network : 2"
    assert "Density of Network : 1.0" in text


def test_statistics_density_cloud_sampled(spark, estimator, monkeypatch):
    """Above CLOUD_EXACT_MAX nodes density_cloud switches to a seeded
    Monte-Carlo pair sample (GMLStorage.scala:221-251 semantics) instead
    of the exact O(n²) crossJoin; the estimate must track the exact mean."""
    import webcrawler_spark.plans.exports as exports

    n = 120
    # two orthogonal clusters: within-cluster d2 = 0, across = 2;
    # exact mean over ordered distinct pairs = 2·(2·60·60)/(120·119)
    rows = [(g, "a" if g < 60 else "b", 1.0) for g in range(n)]
    terms = spark.createDataFrame(rows, "gid long, word string, w double")
    edges = spark.createDataFrame([], "gid long, dst_gid long")
    args = dict(
        central=estimator.central,
        target_normal=estimator.target.normal,
        factor=estimator.factor,
    )
    exact = compute_statistics(terms, edges, **args)["density_cloud"]
    assert exact == pytest.approx(2 * 2 * 60 * 60 / (120 * 119))

    monkeypatch.setattr(exports, "CLOUD_EXACT_MAX", 50)
    monkeypatch.setattr(exports, "CLOUD_SAMPLE_PAIRS", 2500)
    sampled = compute_statistics(terms, edges, **args)["density_cloud"]
    assert sampled == pytest.approx(exact, abs=0.15)


def test_gml_incomplete_filter(spark, estimator):
    """G1: a fetched page with no outlinks is dropped unless
    with_incomplete (GMLStorage.scala:37-41)."""
    events = [
        (0, uri(1), [uri(2)], {"1": 1.0}),
        (1, uri(2), [], {"2": 2.0}),
    ]
    lines = render_from_log(spark, events, estimator)
    assert sum(1 for l in lines if l == "node") == 1
    lines_inc = render_from_log(spark, events, estimator, with_incomplete=True)
    assert sum(1 for l in lines_inc if l == "node") == 2
