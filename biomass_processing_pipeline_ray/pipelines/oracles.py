"""Generated oracle tables for queries DuckDB can't derive from the
input tables alone.

The driver's correctness gate runs our ``oracle_sql()`` strings over the
sf0.01 parquet; for the pixel-decoding flagship the ground truth is the
tile IMAGE content, which SQL cannot decode.  So an INDEPENDENT
single-process reimplementation (the same brute-force oracle strategy as
``tests/test_pipeline.py::_oracle_frame`` — ground-truth pixels from
``make_pixels`` → codec round-trip → per-image float math, no pipeline
stages, no Ray Data operators) writes a small per-tile parquet under
``/tmp``, and the registered SQL aggregates THAT file.  This turns the
rows-only flagship check into a full value-hash check: the engine's
fused decode→PIP→zonal path must reproduce, bit-for-bit after lattice
snapping, what the trivial sequential decoder computes.

The per-tile oracle carries ``(tile_id, ndvi, biomass, phash)``:

- ``ndvi``/``biomass`` power the ``zonal_biomass_px`` D entry;
- ``phash`` (stored uint64 so DuckDB band/xor arithmetic is logical,
  not sign-extending) powers the ``phash_neardup`` D entry — the pair
  finding itself runs in PURE SQL (4 banded equi-joins + bit_count),
  independent of the engine's banded-shuffle implementation.

Generation is chunk-parallel via plain ``ray.remote`` tasks when Ray is
up (each chunk is still the sequential reference implementation), and
falls back to a single-process loop otherwise.  Files are written
atomically (tmp + ``os.replace``) and cached by universe size.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ORACLE_DIR = "/tmp/graft_cache/oracles"


def px_oracle_path(n: int) -> str:
    return os.path.join(ORACLE_DIR, f"px_n{n}_v2.parquet")


def _px_oracle_chunk(ids: np.ndarray) -> pa.Table:
    """Sequential per-tile ground truth for a chunk of tile ids.

    Mirrors the reference's per-parcel decode→NDVI→biomass chain
    (``vegetation_analyzer_v3.py:139-141`` × ``forest_analyzer_v3.py:
    409-427``) with the exact float op order of ``stages/decode.py`` so
    equality is bitwise, not approximate.
    """
    from ..image import codecs, phash as PH
    from ..sources import tiles as T

    ids = np.asarray(ids, dtype=np.int64)
    n = len(ids)
    ndvi = np.empty(n, dtype=np.float64)
    biomass = np.empty(n, dtype=np.float64)
    ph = np.empty(n, dtype=np.uint64)
    for j, i in enumerate(ids):
        px = T.make_pixels(int(i))
        w, h, fidx = T.tile_dims(np.asarray([i], dtype=np.int64))
        fmt = T.FMTS[int(fidx[0])]
        dec = codecs.decode(codecs.encode(px, fmt), fmt, int(h[0]), int(w[0]))
        red = dec[:, :, 0].astype(np.float64)
        nir = dec[:, :, 2].astype(np.float64)
        nd = np.mean((nir - red) / (nir + red + 1.0))
        area_m2 = dec.shape[0] * dec.shape[1] * 10.0 * 10.0
        ndvi[j] = nd
        biomass[j] = (nd + 1.0) * area_m2 * 0.01
        ph[j] = np.uint64(np.int64(PH.dhash(dec)).astype(np.uint64))
    return pa.table(
        {
            "tile_id": pa.array(ids),
            "ndvi": pa.array(ndvi),
            "biomass": pa.array(biomass),
            "phash": pa.array(ph),
        }
    )


def ensure_px_oracle(n: int, chunk: int = 2048) -> str:
    """Generate (once, cached) the per-tile decode oracle parquet."""
    path = px_oracle_path(n)
    if os.path.exists(path):
        return path
    os.makedirs(ORACLE_DIR, exist_ok=True)
    all_ids = np.arange(n, dtype=np.int64)
    chunks = [all_ids[lo : lo + chunk] for lo in range(0, n, chunk)]
    tables: list[pa.Table]
    try:
        import ray

        ray_up = ray.is_initialized()
    except Exception:  # pragma: no cover - ray is a hard dep in practice
        ray_up = False
    if ray_up and len(chunks) > 1:
        import ray

        fn = ray.remote(_px_oracle_chunk)
        tables = ray.get([fn.remote(c) for c in chunks])
    else:
        tables = [_px_oracle_chunk(c) for c in chunks]
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(pa.concat_tables(tables), tmp)
    os.replace(tmp, path)
    return path


def sql_zonal_px(n: int) -> str:
    """DuckDB twin of the flagship: arithmetic county assignment (the
    PIP parity surface already D-checked by ``zonal_biomass``) ×
    oracle-decoded per-tile scalars, lattice-snapped on both sides."""
    from ..functions import georef as G
    from ..functions.rounding import sql_snap

    lon, lat = G.sql_lonlat("tile_id")
    fips = G.sql_county_fips(lon, lat)
    return f"""
    SELECT county_fips, CAST(COUNT(*) AS BIGINT) AS tile_count,
           ROUND(SUM(b), 4) AS biomass_sum,
           ROUND(SUM(b) / COUNT(*), 4) AS biomass_mean,
           ROUND(SUM(nd), 4) AS ndvi_sum,
           ROUND(SUM(nd) / COUNT(*), 4) AS ndvi_mean
    FROM (SELECT {fips} AS county_fips,
                 {sql_snap('ndvi')} AS nd,
                 {sql_snap('biomass')} AS b
          FROM read_parquet('{px_oracle_path(n)}'))
    GROUP BY county_fips
    """


def sql_phash_neardup(n: int, max_hamming: int = 3) -> str:
    """Pure-SQL banded Hamming pair oracle over the decode-oracle
    phash column (uint64 → logical shifts; pigeonhole over 4×16-bit
    bands finds every pair with Hamming ≤ 3)."""
    iid_a = "'img' || lpad(CAST(ta AS VARCHAR), 12, '0')"
    iid_b = "'img' || lpad(CAST(tb AS VARCHAR), 12, '0')"
    band_joins = "\n      UNION\n".join(
        f"""      SELECT x.tile_id AS ta, y.tile_id AS tb
      FROM h x JOIN h y
        ON ((x.phash >> {16 * b}) & 65535) = ((y.phash >> {16 * b}) & 65535)
       AND x.tile_id < y.tile_id"""
        for b in range(4)
    )
    return f"""
    WITH h AS (SELECT tile_id, phash FROM read_parquet('{px_oracle_path(n)}')),
    cand AS (
{band_joins}
    )
    SELECT {iid_a} AS a, {iid_b} AS b,
           CAST(bit_count(xor(ha.phash, hb.phash)) AS BIGINT) AS hamming
    FROM cand JOIN h ha ON ha.tile_id = cand.ta
              JOIN h hb ON hb.tile_id = cand.tb
    WHERE bit_count(xor(ha.phash, hb.phash)) <= {max_hamming}
    """
