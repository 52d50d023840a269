"""Conditional coverage for the Lance read branch (VERDICT r4 item 5).

BASELINE.json's input_hint names Lance as the primary tile format;
``sources/tiles.read_tiles`` prefers ``rd.read_lance`` and falls back
to the parquet mirror.  This environment has Ray's ``read_lance`` API
but not the ``lance`` backend (no pip install allowed), so:

- the TRUE lance e2e test runs only where ``import lance`` succeeds
  (skip-if-absent), and
- the fallback path — the one every run here actually takes — is
  pinned: a ``.lance``-named directory whose backend import fails must
  fall through to the parquet mirror with identical content.
"""

import os

import pytest


def test_read_tiles_lance_fallback_mirror(ray_session, tmp_path):
    """No lance backend: read_tiles('*.lance') must serve the parquet
    mirror at the same path, identical to a direct parquet read."""
    from biomass_processing_pipeline_ray.sources.tiles import (
        generate_tiles_parquet,
        read_tiles,
    )

    mirror = str(tmp_path / "tiles.lance")  # parquet content, lance name
    generate_tiles_parquet(256, mirror)
    got = (
        read_tiles(mirror, columns=["image_id", "w", "h", "fmt"])
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    import ray.data as rd

    exp = (
        rd.read_parquet(mirror, columns=["image_id", "w", "h", "fmt"])
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert len(got) == 256
    assert got.equals(exp)


def test_read_tiles_lance_native(ray_session, tmp_path):
    """TRUE lance e2e — runs only in environments with the backend."""
    lance = pytest.importorskip("lance")
    import pyarrow.parquet as pq

    from biomass_processing_pipeline_ray.sources.tiles import (
        generate_tiles_parquet,
        read_tiles,
    )

    src = str(tmp_path / "tiles_pq")
    generate_tiles_parquet(256, src)
    tbl = pq.read_table(src)
    ds_path = str(tmp_path / "tiles.lance")
    lance.write_dataset(tbl, ds_path)
    got = (
        read_tiles(ds_path, columns=["image_id", "w", "h", "fmt"])
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    exp = (
        tbl.select(["image_id", "w", "h", "fmt"])
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    assert got.equals(exp)
