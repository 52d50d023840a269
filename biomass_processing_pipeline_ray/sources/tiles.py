"""Synthetic deterministic tile table — the primary input fixture.

Schema is fixed by BASELINE.json input_hint:
``(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64)``.  Georeferencing is derived, not stored
(``functions/georef.py``), mirroring the reference deriving tile bounds
from tile ids (``/root/reference/src/core/coordinate_utils_v3.py:360-389``).

Determinism: pixels come from ``np.random.PCG64(SeedSequence([seed, i]))``
— stable across processes and numpy versions — plus a latitude-driven
NIR gradient so zonal biomass varies by county.  ``phash`` is the dHash
of the *decoded* bytes, so tests can recompute it from the column alone.

Generation itself is a Ray Data pipeline (``rd.range → map_batches``)
so bench-scale fixtures (500k tiles) are built in parallel and written
as partitioned parquet.  ``read_tiles`` prefers ``read_lance`` when the
lance reader exists in the environment, else parquet (documented
fallback, same schema).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..functions import georef as G
from ..image import codecs, phash as _ph

FMTS = ("png", "jpeg", "raw")
DEFAULT_SEED = 42


def tile_dims(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(w, h, fmt_idx) per id — pure arithmetic on the georef key."""
    key = G.derive_key(ids)
    w = (32 + 16 * (key % 3)).astype(np.int32)
    h = (32 + 16 * ((key // 3) % 3)).astype(np.int32)
    fmt_idx = (key % 3).astype(np.int64)
    return w, h, fmt_idx


PLANT_PERIOD = 97  # ids with i % 97 in (1, 2) copy a nearby same-dims donor
_PLANT_WINDOW = 40


def plant_donor(i: int) -> int | None:
    """Donor id for a planted near-duplicate tile, else None.

    To make the phash near-dup operator testable (a random fixture has
    ~zero Hamming≤3 pairs), ~2 % of tiles are planted copies: ``i %
    PLANT_PERIOD == 1`` duplicates a nearby tile exactly (Hamming-0
    pair), ``== 2`` copies it with a one-pixel flip (Hamming ≈ 0–2).
    The donor is the nearest smaller non-planted id in the same (w, h)
    class — dims derive from ``key % 9`` (w: key%3, h: (key//3)%3) and
    key = 9m+r gives (key//3)%3 = (r//3)%3 — so the tile's stored dims
    stay consistent with the arithmetic spec the SQL oracles mirror.
    """
    r = i % PLANT_PERIOD
    if r not in (1, 2) or i < _PLANT_WINDOW:
        return None
    cls = int(G.derive_key(np.asarray([i], dtype=np.int64))[0]) % 9
    for d in range(i - 1, i - _PLANT_WINDOW, -1):
        if d % PLANT_PERIOD in (1, 2):
            continue
        if int(G.derive_key(np.asarray([d], dtype=np.int64))[0]) % 9 == cls:
            return d
    return None


def make_pixels(i: int, seed: int = DEFAULT_SEED) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 pixels for tile id ``i``."""
    donor = plant_donor(i)
    if donor is not None:
        px = make_pixels(donor, seed).copy()  # donor is never planted itself
        if i % PLANT_PERIOD == 2:
            px[0, 0, :] ^= 255  # near-dup: one-pixel flip, dhash Hamming ≲ 2
        return px
    ids = np.asarray([i], dtype=np.int64)
    w, h, _ = tile_dims(ids)
    w, h = int(w[0]), int(h[0])
    rng = np.random.Generator(np.random.PCG64(np.random.SeedSequence([seed, int(i)])))
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    # latitude-driven NIR (channel 2) gradient so biomass varies by zone
    _, lat = G.derive_lonlat(ids)
    f = (lat[0] - G.LAT0) / G.LAT_SPAN  # 0..1 south→north
    nir = px[:, :, 2].astype(np.float64) * 0.5 + 127.0 * f
    px[:, :, 2] = np.clip(np.floor(nir), 0, 255).astype(np.uint8)
    return px


def make_tile(i: int, seed: int = DEFAULT_SEED) -> dict:
    ids = np.asarray([i], dtype=np.int64)
    w, h, fmt_idx = tile_dims(ids)
    fmt = FMTS[int(fmt_idx[0])]
    px = make_pixels(i, seed)
    buf = codecs.encode(px, fmt)
    dec = codecs.decode(buf, fmt, int(h[0]), int(w[0]))
    lon, lat = G.derive_lonlat(ids)
    return {
        "image_id": f"img{i:012d}",
        "bytes": buf,
        "w": int(w[0]),
        "h": int(h[0]),
        "fmt": fmt,
        "caption": f"synthetic tile img{i:012d} at lon {lon[0]:.4f} lat {lat[0]:.4f}",
        "phash": _ph.dhash(dec),
    }


def gen_tiles_batch(ids: np.ndarray, seed: int = DEFAULT_SEED) -> pa.Table:
    rows = [make_tile(int(i), seed) for i in np.asarray(ids, dtype=np.int64)]
    return pa.table(
        {
            "image_id": pa.array([r["image_id"] for r in rows], pa.string()),
            "bytes": pa.array([r["bytes"] for r in rows], pa.binary()),
            "w": pa.array([r["w"] for r in rows], pa.int32()),
            "h": pa.array([r["h"] for r in rows], pa.int32()),
            "fmt": pa.array([r["fmt"] for r in rows], pa.string()),
            "caption": pa.array([r["caption"] for r in rows], pa.string()),
            "phash": pa.array([r["phash"] for r in rows], pa.int64()),
        }
    )


def generate_tiles_parquet(
    n: int, out_dir: str, seed: int = DEFAULT_SEED, num_blocks: int | None = None
) -> str:
    """Build the n-tile fixture with a Ray Data pipeline → parquet dir.

    Idempotent AND concurrency-safe: generation goes to a private temp
    dir that is atomically renamed into place — two processes racing to
    build the same fixture cannot interleave files (the loser discards
    its copy).  The _SUCCESS marker inside the dir signals completeness.
    """
    import shutil

    import ray.data as rd

    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    if os.path.isdir(out_dir):  # stale partial from a killed generator
        import shutil as _sh

        # re-check the marker immediately before the rmtree: a concurrent
        # generator may have completed its os.rename since the check above,
        # and deleting a just-completed fixture out from under readers is
        # worse than losing this process's own attempt
        if os.path.exists(marker):
            return out_dir
        _sh.rmtree(out_dir, ignore_errors=True)
    tmp_dir = f"{out_dir}.tmp.{os.getpid()}"
    os.makedirs(tmp_dir, exist_ok=True)
    num_blocks = num_blocks or max(1, n // 4096)
    ds = rd.range(n, override_num_blocks=num_blocks)

    def gen(batch: pa.Table) -> pa.Table:
        return gen_tiles_batch(batch["id"].to_numpy(), seed)

    ds.map_batches(gen, batch_format="pyarrow", batch_size=2048).write_parquet(tmp_dir)
    with open(os.path.join(tmp_dir, "_SUCCESS"), "w") as f:
        f.write("ok")
    if os.path.exists(marker):  # a concurrent generator finished first
        shutil.rmtree(tmp_dir, ignore_errors=True)
        return out_dir
    try:
        os.rename(tmp_dir, out_dir)
    except OSError:
        # a concurrent generator won the rename; keep theirs
        shutil.rmtree(tmp_dir, ignore_errors=True)
    return out_dir


def read_tiles(
    path: str,
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
):
    """Dataset over the tile table — Lance if available, else parquet.

    ``override_num_blocks`` defaults to one block per file: Ray's
    default then splits each file into sub-blocks, and the extra
    per-block metadata/slicing costs ~2× on wide binary rows.
    """
    import ray.data as rd

    if path.endswith(".lance") and hasattr(rd, "read_lance"):
        try:
            return rd.read_lance(path, columns=columns)
        except Exception:
            pass  # fall back to parquet mirror
    if override_num_blocks is None and os.path.isdir(path):
        override_num_blocks = max(
            1, sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
        )
    return rd.read_parquet(
        path, columns=columns, override_num_blocks=override_num_blocks
    )


def image_ids_to_int(ids: pa.Array) -> np.ndarray:
    """Vectorized 'img%012d' → int64 via pyarrow kernels (no Python loop)."""
    import pyarrow.compute as pc

    arr = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
    return pc.cast(pc.utf8_slice_codeunits(arr, 3, 99), pa.int64()).to_numpy()
