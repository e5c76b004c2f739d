"""Launch-path evidence (north rule): the engine must run via
``spark-submit --py-files engine.zip`` — the cluster submit shape
(reference ships an assembly jar; WebCrawler.scala:13-44).

Shells out to scripts/submit_smoke.sh, which zips the package, moves to
a directory without the checkout, clears PYTHONPATH, and crawls a
120-page synthetic site on local[4]. The printed module path proves the
import resolved from the shipped zip, not the repo.
"""

import json
import pathlib
import subprocess

REPO = pathlib.Path(__file__).resolve().parents[1]


def test_spark_submit_pyfiles_crawl():
    proc = subprocess.run(
        ["bash", str(REPO / "scripts" / "submit_smoke.sh"), "local[4]"],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert "engine.zip/webcrawler_spark" in res["engine_module"]
    assert res["processed"] == 24
    assert res["waves"] >= 2
    assert not res["aborted"]
