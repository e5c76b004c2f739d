"""Snapshot table catalog — a thin Iceberg-style layer over parquet.

No Iceberg runtime jar exists in this sandbox (and no network), so the
engine's per-wave state commits go through this: each committed wave
writes under ``root/wave=N/`` with a ``manifest.json`` whose presence
marks the commit complete (written last). Writes go to a temp dir first
and are renamed into place, so a killed run can never leave a
half-visible wave — resume scans for the latest manifest and replays from
there (the north rule's checkpoint/lineage requirement; the reference has
no equivalent — its state dies with the JVM, Gather.scala:126).

Tables commit in one of two modes (exactly Iceberg's snapshot model:
append data files + delete metadata, manifests chaining to parents):

- ``full``  — the wave dir holds the complete table (used for the small,
  heavily-rewritten frontier);
- ``delta`` — the wave dir holds only rows ADDED since the parent commit,
  plus an optional small delete-key list in the manifest (rows removed
  from earlier waves, e.g. re-fetch overwrites). Commit cost is O(wave),
  not O(state) — the property that makes per-wave durability affordable
  at a 10^10-row frontier. ``load_table`` folds the chain:
  latest full (or empty) → per-wave [anti-delete → union delta].

On a real cluster this maps 1:1 onto Iceberg snapshots + MERGE INTO; the
manifest carries the same lineage facts (parent wave, per-table mode,
delete keys, row metrics, driver state).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        # crash recovery for in-place rewrites: a `wave=N.old` aside with no
        # `wave=N` means the rewrite died mid-swap — restore the original;
        # with both present the swap finished — drop the aside
        for d in os.listdir(root):
            if d.startswith("wave=") and d.endswith(".old"):
                final = os.path.join(root, d[: -len(".old")])
                aside = os.path.join(root, d)
                if os.path.exists(final):
                    shutil.rmtree(aside)
                else:
                    os.rename(aside, final)

    def _wave_dir(self, wave: int) -> str:
        return os.path.join(self.root, f"wave={wave:06d}")

    # ------------------------------------------------------------------
    # commit
    # ------------------------------------------------------------------
    def commit(
        self,
        wave: int,
        tables: dict[str, DataFrame],
        state: dict,
        modes: dict[str, str] | None = None,
        deletes: dict[str, dict] | None = None,
    ) -> dict:
        """Atomically commit one wave.

        ``tables[name]`` is the FULL table when ``modes.get(name, 'full')``
        is ``full``, else the DELTA rows added since the parent commit.
        ``deletes[name]`` is a list of ``{"key": col, "values": [...]}``
        records — rows (by key) removed from pre-existing data as of this
        wave, applied before this wave's delta on read.
        """
        modes = modes or {}
        deletes = deletes or {}
        tmp = os.path.join(self.root, f"_tmp_wave_{wave:06d}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        table_meta = {}
        # per-table writes are independent Spark jobs — run them
        # concurrently (each job's fixed scheduling latency overlaps; the
        # commit is still atomic because the manifest lands last)
        from concurrent.futures import ThreadPoolExecutor

        to_write = {n: df for n, df in tables.items() if df is not None}
        if to_write:
            with ThreadPoolExecutor(max_workers=min(8, len(to_write))) as ex:
                futs = {
                    name: ex.submit(
                        df.write.mode("overwrite").parquet,
                        os.path.join(tmp, name),
                    )
                    for name, df in to_write.items()
                }
                for f in futs.values():
                    f.result()
        for name, df in tables.items():
            table_meta[name] = {
                "mode": modes.get(name, "full"),
                "written": df is not None,
                "deletes": deletes.get(name),
            }
        manifest = {
            "wave": wave,
            "parent_wave": self._latest_wave(),
            "tables": table_meta,
            "state": state,
        }
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        final = self._wave_dir(wave)
        if os.path.exists(final):
            # in-place rewrite (compaction): never a moment with no valid
            # wave dir on disk — the old dir is renamed aside, the new one
            # renamed in, then the aside dropped; __init__ repairs either
            # crash window from the aside
            aside = final + ".old"
            if os.path.exists(aside):
                shutil.rmtree(aside)
            os.rename(final, aside)
            os.rename(tmp, final)
            shutil.rmtree(aside)
        else:
            os.rename(tmp, final)
        return manifest

    # ------------------------------------------------------------------
    # read side
    # ------------------------------------------------------------------
    def _manifests(self) -> list[dict]:
        out = []
        if not os.path.isdir(self.root):
            return out
        for d in sorted(os.listdir(self.root)):
            if not d.startswith("wave="):
                continue
            mpath = os.path.join(self.root, d, "manifest.json")
            if os.path.exists(mpath):
                with open(mpath) as f:
                    out.append(json.load(f))
        return out

    def _latest_wave(self) -> int | None:
        ms = self._manifests()
        return ms[-1]["wave"] if ms else None

    def latest(self) -> dict | None:
        ms = self._manifests()
        return ms[-1] if ms else None

    def load_table(self, wave: int, name: str) -> DataFrame:
        """Reconstruct ``name`` as of committed ``wave`` by folding the
        manifest chain: start at the latest full commit ≤ wave, then per
        delta wave apply [anti-delete → union delta]."""
        chain = [m for m in self._manifests() if m["wave"] <= wave]
        if not chain:
            raise FileNotFoundError(f"no commits ≤ wave {wave}")
        # find the latest full commit for this table (a wave that did not
        # touch the table does NOT reset the chain)
        start = 0
        for i in reversed(range(len(chain))):
            meta = chain[i]["tables"].get(name)
            if meta is not None and meta.get("mode", "full") == "full":
                start = i
                break
        df: DataFrame | None = None
        for m in chain[start:]:
            meta = m["tables"].get(name)
            if meta is None:
                continue
            for dels in meta.get("deletes") or []:
                if df is not None and dels.get("values"):
                    df = df.filter(~F.col(dels["key"]).isin(dels["values"]))
            if meta.get("written", True):
                part = self.spark.read.parquet(
                    os.path.join(self._wave_dir(m["wave"]), name)
                )
                df = part if df is None else df.unionByName(part)
        if df is None:
            raise FileNotFoundError(f"table {name} absent in chain ≤ wave {wave}")
        return df

    def compact(self, wave: int | None = None) -> dict:
        """Rewrite the latest (or given) committed wave as FULL commits for
        every table, resetting all delta chains — the Iceberg 'rewrite
        data files' maintenance action. After compaction, prune() can drop
        all older waves. Cost: O(state), run off the hot path."""
        m = self.latest() if wave is None else next(
            x for x in self._manifests() if x["wave"] == wave
        )
        if m is None:
            raise FileNotFoundError("nothing to compact")
        w = m["wave"]
        tables = {}
        for name in m["tables"]:
            try:
                tables[name] = self.load_table(w, name)
            except FileNotFoundError:
                tables[name] = None  # never-written (empty) delta chain
        # rewrite in place as a full commit (same wave id, fresh manifest)
        return self.commit(w, tables, m["state"], modes={}, deletes={})

    def prune(self, keep_last: int = 2):
        """Drop waves that can never be read again: for each table, find
        the newest wave holding a FULL commit of it — every load starts at
        such a wave, so waves strictly older than the minimum across tables
        are dead history (after a compact() that is everything but the
        head). Always retains the newest ``keep_last`` manifests."""
        ms = self._manifests()
        if len(ms) <= keep_last:
            return
        latest_full: dict[str, int] = {}
        all_tables: set[str] = set()
        for m in ms:
            for name, meta in m["tables"].items():
                all_tables.add(name)
                if meta.get("mode", "full") == "full":
                    latest_full[name] = max(latest_full.get(name, -1), m["wave"])
        if all_tables - set(latest_full):
            return  # some table has no full commit anywhere: keep all history
        cut = min(min(latest_full.values()), ms[-keep_last]["wave"])
        for m in ms:
            if m["wave"] < cut:
                shutil.rmtree(self._wave_dir(m["wave"]))
