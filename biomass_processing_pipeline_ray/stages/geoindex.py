"""Spatial storage layout: S2-partitioned parquet + zone-map manifest.

The geo analog of the materialized IVF index (``stages/ann.py``): tiles
are written once PARTITIONED BY their coarse S2 cell (hive dirs), and a
tiny manifest records each partition's exact lon/lat bounding box (a
zone map).  A bbox query consults the manifest and READS ONLY the
partitions whose zone map intersects the box — pruning happens at the
storage layer, the 100 TB contract for spatial range scans (reference
analog: the tile-catalog bbox prefilter, SURVEY.md §2.4 J4/J5, done
against blob listings in ``blob_manager_v3.py``).

Zone-map inclusion is a strict superset of the rows in the box (each
partition's recorded bbox covers all its rows), so pruned reads are
EXACT, not approximate — verified by the full-scan SQL oracle.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..geo import s2

MANIFEST = "_manifest.parquet"


def _part_col(lon: np.ndarray, lat: np.ndarray, level: int) -> pa.Array:
    cells = s2.latlng_to_cell(lon, lat, level)
    return pa.array([f"{int(c):016x}" for c in cells], pa.string())


def write_spatial_store(ds, out_dir: str, level: int = 8) -> str:
    """Materialize ``ds`` (needs lon/lat columns) partitioned by coarse
    S2 cell, plus the per-partition bbox manifest.  Idempotent (marker +
    atomic rename)."""
    import shutil

    import ray.data as rd  # noqa: F401  (ray must be up)
    from ray.data.aggregate import Max, Min

    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    tmp = f"{out_dir}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)

    def add_part(b: pa.Table) -> pa.Table:
        return b.append_column(
            "s2_part", _part_col(b["lon"].to_numpy(), b["lat"].to_numpy(), level)
        )

    parted = ds.map_batches(add_part, batch_format="pyarrow")
    parted.write_parquet(tmp, partition_cols=["s2_part"])
    # zone maps: exact per-partition lon/lat bounds (small aggregate)
    manifest = (
        parted.groupby("s2_part")
        .aggregate(
            Min("lon", alias_name="min_lon"),
            Min("lat", alias_name="min_lat"),
            Max("lon", alias_name="max_lon"),
            Max("lat", alias_name="max_lat"),
        )
        .to_pandas()
    )
    pq.write_table(
        pa.Table.from_pandas(manifest, preserve_index=False),
        os.path.join(tmp, MANIFEST),
    )
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("ok")
    try:
        os.rename(tmp, out_dir)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return out_dir


def read_spatial_store(out_dir: str, bbox, columns=None):
    """Dataset over ONLY the partitions whose zone map intersects
    ``bbox = (min_lon, min_lat, max_lon, max_lat)``."""
    import ray.data as rd

    bx0, by0, bx1, by1 = bbox
    m = pq.read_table(os.path.join(out_dir, MANIFEST)).to_pandas()
    hit = m[
        (m["max_lon"] >= bx0)
        & (m["min_lon"] <= bx1)
        & (m["max_lat"] >= by0)
        & (m["min_lat"] <= by1)
    ]
    paths = []
    for part in hit["s2_part"]:
        d = os.path.join(out_dir, f"s2_part={part}")
        if os.path.isdir(d):
            paths.extend(
                os.path.join(d, f)
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )
    if not paths:
        raise FileNotFoundError(f"no partitions intersect bbox {bbox}")
    return rd.read_parquet(paths, columns=columns)
