"""Single-node baseline: time each headline query's DuckDB oracle SQL at
the given sf dir vs the Spark implementation on local[CPUS]. The
reference publishes no performance numbers (BASELINE.md), so DuckDB —
a state-of-the-art single-node engine running the semantically identical
SQL — stands in as the single-node comparison point.

Usage: python scripts/duckdb_baseline.py [sf_dir] [cpus]
Prints a markdown table.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import bench
    from webcrawler_spark.queries import REGISTRY

    con = duckdb.connect()
    con.execute(f"SET threads={cpus}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    spark = bench.make_spark(cpus, "duckdb_baseline")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in bench.HEADLINE if REGISTRY[n][1] is not None]
    rows = []
    for name in names:
        fn, sql = REGISTRY[name]
        # warm both engines once, then time
        fn(spark, sf_dir).count()
        t0 = time.time()
        fn(spark, sf_dir).count()
        t_spark = time.time() - t0
        con.execute(sql).fetchall()
        t0 = time.time()
        n = len(con.execute(sql).fetchall())
        t_duck = time.time() - t0
        rows.append((name, t_spark, t_duck, n))
        print(f"  {name}: spark {t_spark:.2f}s duckdb {t_duck:.2f}s", file=sys.stderr)

    print(f"\n| query | Spark local[{cpus}] (warm, s) | DuckDB {cpus}t (warm, s) | rows |")
    print("|---|---|---|---|")
    for name, ts, td, n in rows:
        print(f"| {name} | {ts:.2f} | {td:.2f} | {n} |")
    spark.stop()


if __name__ == "__main__":
    main()
