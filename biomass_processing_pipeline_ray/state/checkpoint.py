"""Checkpoint store: per-partition lineage + metrics, resumable output.

Replaces the reference's ``processing_checkpoints`` Postgres table
(upsert per batch, ``database_manager_v3.py:529-614``; resume read
``comprehensive_biomass_processor_v3.py:139-149``) with an
object-store-friendly layout the north rule asks for:

    out_dir/
      county_fips=17001/part-*.parquet      (the data, one dir per zone)
      _lineage/17001.json                   (lineage record + metrics)
      _MANIFEST.json                        (completed partitions)

Writes are atomic (temp file + ``os.replace``) and idempotent per
partition; resume = filter pending partitions against the manifest
(anti-join on the driver — the manifest is tiny).
"""

from __future__ import annotations

import json
import os
import time


class CheckpointStore:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.lineage_dir = os.path.join(out_dir, "_lineage")
        os.makedirs(self.lineage_dir, exist_ok=True)
        self.manifest_path = os.path.join(out_dir, "_MANIFEST.json")

    # -- manifest ------------------------------------------------------------

    def completed(self) -> set[str]:
        if not os.path.exists(self.manifest_path):
            return set()
        with open(self.manifest_path) as f:
            return set(json.load(f).get("completed", []))

    def _write_manifest(self, completed: set[str]) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"completed": sorted(completed), "updated_at": time.time()}, f)
        os.replace(tmp, self.manifest_path)

    def mark_complete(self, partition: str, lineage: dict) -> None:
        """Atomically record a partition's lineage + add it to the manifest."""
        lpath = os.path.join(self.lineage_dir, f"{partition}.json")
        tmp = lpath + ".tmp"
        lineage = dict(lineage, partition=partition, completed_at=time.time())
        with open(tmp, "w") as f:
            json.dump(lineage, f)
        os.replace(tmp, lpath)
        done = self.completed()
        done.add(partition)
        self._write_manifest(done)

    def lineage(self, partition: str) -> dict | None:
        lpath = os.path.join(self.lineage_dir, f"{partition}.json")
        if not os.path.exists(lpath):
            return None
        with open(lpath) as f:
            return json.load(f)

    def pending(self, partitions: list[str]) -> list[str]:
        done = self.completed()
        return [p for p in partitions if p not in done]

    # -- partitioned data ----------------------------------------------------

    def partition_dir(self, partition: str) -> str:
        return os.path.join(self.out_dir, f"county_fips={partition}")

    def write_partition(self, partition: str, table, lineage: dict) -> None:
        """Write one partition's parquet atomically, then mark complete."""
        import pyarrow.parquet as pq

        pdir = self.partition_dir(partition)
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, ".part-0.parquet.tmp")
        pq.write_table(table, tmp)
        os.replace(tmp, os.path.join(pdir, "part-0.parquet"))
        self.mark_complete(partition, lineage)
