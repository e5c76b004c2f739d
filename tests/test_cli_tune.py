"""CLI entry points for the offline tuning jobs (reference
TuneVocabulary.main / sample.main, TuneVocabulary.scala:92-112,165-199):
`webcrawler-spark tune --path D` reads D/vectors/ (the S7 export file
set) and writes vocabulary_tuned.dat; `... sample` writes
index.dat/sample.dat."""

from __future__ import annotations

import os

from webcrawler_spark.cli import main


def _write_vectors_dir(root):
    """Hand-build a tiny S7 export: linked nodes share 'linkword'."""
    vdir = os.path.join(root, "vectors")
    os.makedirs(vdir)
    words = {
        1: ["linkword", "alpha", "noise"],
        2: ["linkword", "beta", "noise"],
        3: ["linkword", "gamma"],
        4: ["delta", "noise"],
        5: ["epsilon", "noise"],
        6: ["zeta"],
    }
    edges = {1: [2, 3], 2: [3], 3: [], 4: [], 5: [], 6: []}
    with open(os.path.join(vdir, "matrix.dat"), "w") as f:
        for nid, outs in edges.items():
            f.write(f"{nid} : {' '.join(str(o) for o in outs)}\n")
    with open(os.path.join(vdir, "map.lst"), "w") as f:
        for nid in words:
            f.write(f"{nid} : http://example.org/{nid}\n")
    for nid, ws in words.items():
        with open(os.path.join(vdir, f"{nid}.dat"), "w") as f:
            for w in ws:
                f.write(f"{w:<40} : 1.000\n")


def test_cli_tune_writes_tuned_vocabulary(spark, tmp_path):
    _write_vectors_dir(str(tmp_path))
    rc = main(["tune", "--path", str(tmp_path), "--epochs", "6", "--seed", "7"])
    assert rc == 0
    out = os.path.join(str(tmp_path), "vocabulary_tuned.dat")
    with open(out) as f:
        net = {}
        for line in f:
            w, v = line.split(":")
            net[w.strip()] = float(v)
    # the discriminative word separates linked from unlinked pairs
    assert net.get("linkword", 0.0) > 0.0


def test_cli_sample_writes_octave_files(spark, tmp_path):
    _write_vectors_dir(str(tmp_path))
    rc = main(["sample", "--path", str(tmp_path), "--seed", "7"])
    assert rc == 0
    with open(os.path.join(str(tmp_path), "index.dat")) as f:
        index = f.read()
    assert "linkword" in index
    with open(os.path.join(str(tmp_path), "sample.dat")) as f:
        sample = f.read()
    assert "# name: sample" in sample and "# type: sparse matrix" in sample


def test_cli_query_list_and_run(spark, capsys, tmp_path):
    # --list needs no Spark session and must cover the whole registry
    from webcrawler_spark.queries import REGISTRY

    rc = main(["query", "--list"])
    assert rc == 0
    listed = [ln.split(" ", 1)[1] for ln in capsys.readouterr().out.splitlines()]
    assert set(listed) == set(REGISTRY)
    # unknown name is a usage error, not a crash
    assert main(["query", "no_such_query"]) == 2
    # a real run writes parquet (reuses the test session via getOrCreate)
    out = str(tmp_path / "q_out")
    rc = main(["query", "token_stats", "--sf-dir", "/root/testdata/sf0.001",
               "--out", out])
    assert rc == 0
    assert spark.read.parquet(out).count() > 0
