"""Deduplication family: exact, MinHash-LSH, SimHash, n-gram Jaccard,
phash-Hamming — the scale operators the reference lacks (SURVEY.md §2.7
notes only a Python-set dedup; these are first-class here).

Design per the Ray guide's aggregation-at-scale pattern:

- **exact**: md5(text) added vectorized in ``map_batches`` →
  ``groupby(hash)`` keeps the min-id row.  md5 (not Python ``hash``) so
  DuckDB's ``md5()`` is the oracle.
- **MinHash-LSH**: per-batch shingle → 64-perm minhash (affine
  transforms of a crc32 base hash, vectorized) → explode to
  (band_id, band_key, doc_id) rows → ``groupby`` band buckets →
  candidate pairs → exact Jaccard verify.  Sketches are mergeable; only
  tiny signature rows shuffle.
- **SimHash**: 64-bit sign-sum of token hashes; 4×16-bit band blocking
  for Hamming ≤ 3 candidates.
- **phash-Hamming**: same blocking trick on the image perceptual hash.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

# -- exact dedup -------------------------------------------------------------


def add_md5_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    hashes = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch[col].to_pylist()]
    return batch.append_column("text_md5", pa.array(hashes, pa.string()))


def exact_dedup(ds, col: str = "text"):
    """Keep the lowest doc_id per identical text; returns (kept_ds)."""
    hashed = ds.map_batches(lambda b: add_md5_batch(b, col), batch_format="pyarrow")

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        out = g.head(1).copy()
        out["dup_count"] = len(g)
        return out[["doc_id", "text_md5", "dup_count"]]

    return hashed.groupby("text_md5").map_groups(keep_first, batch_format="pandas")


# -- minhash / LSH ------------------------------------------------------------

N_PERM = 64
BANDS = 16  # 16 bands × 4 rows
ROWS_PER_BAND = N_PERM // BANDS
_MH_P = np.uint64((1 << 61) - 1)
_rng = np.random.Generator(np.random.PCG64(12345))
_MH_A = _rng.integers(1, 1 << 32, N_PERM, dtype=np.uint64)
_MH_B = _rng.integers(0, 1 << 32, N_PERM, dtype=np.uint64)


def shingle_set(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingles hashed with crc32 (deterministic)."""
    words = text.split()
    if len(words) < k:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    return np.unique(
        np.asarray([zlib.crc32(g.encode("utf-8")) for g in grams], dtype=np.uint64)
    )


def minhash_signature(shingles: np.ndarray) -> np.ndarray:
    if len(shingles) == 0:
        return np.full(N_PERM, np.iinfo(np.uint64).max, dtype=np.uint64)
    # affine transforms in uint64; values < 2^32 so a*h+b < 2^64 safe-ish
    v = (shingles[:, None] * _MH_A[None, :] + _MH_B[None, :]) % _MH_P
    return v.min(axis=0)


def minhash_bands_batch(batch: pa.Table) -> pa.Table:
    """Explode each doc into BANDS (band_id, band_key, doc_id) rows."""
    ids = batch["doc_id"].to_numpy()
    texts = batch["text"].to_pylist()
    doc_col, band_col, key_col = [], [], []
    for i, t in enumerate(texts):
        sig = minhash_signature(shingle_set(t))
        for b in range(BANDS):
            chunk = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
            key = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
            doc_col.append(int(ids[i]))
            band_col.append(b)
            key_col.append(key)
    return pa.table(
        {
            "doc_id": pa.array(doc_col, pa.int64()),
            "band_id": pa.array(band_col, pa.int32()),
            "band_key": pa.array(key_col, pa.string()),
        }
    )


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)


def minhash_lsh_pairs(ds, texts_ref=None, threshold: float = 0.7):
    """Candidate pairs from LSH buckets, verified with exact Jaccard.

    ``texts_ref`` is a ray.put broadcast {doc_id: text} for the verify
    stage (small at test scale; at 10^12 scale the verify becomes a
    co-partitioned join on doc_id — documented scale path).
    """
    bands = ds.map_batches(minhash_bands_batch, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []})
        ii, jj = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[ii], "b": ids[jj]})

    pairs = (
        bands.groupby(["band_id", "band_key"])
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({"a": [], "b": [], "jaccard": []})
        import ray

        texts = ray.get(texts_ref)
        batch = batch.drop_duplicates(["a", "b"])
        out = []
        cache: dict[int, np.ndarray] = {}
        for a, b in zip(batch["a"].astype(np.int64), batch["b"].astype(np.int64)):
            sa = cache.setdefault(int(a), shingle_set(texts[int(a)]))
            sb = cache.setdefault(int(b), shingle_set(texts[int(b)]))
            j = jaccard(sa, sb)
            if j >= threshold:
                out.append((int(a), int(b), j))
        return pd.DataFrame(out, columns=["a", "b", "jaccard"])

    verified = pairs.map_batches(verify, batch_format="pandas")

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return verified.groupby(["a", "b"]).map_groups(dedup_pairs, batch_format="pandas")


# -- simhash -----------------------------------------------------------------


def simhash64(text: str) -> int:
    words = text.split()
    if not words:
        return 0
    hs = np.asarray([zlib.crc32(w.encode("utf-8")) for w in words], dtype=np.uint64)
    # widen to 64 bits deterministically: h64 = crc32(w) * golden ^ shifted
    h64 = hs * np.uint64(0x9E3779B97F4A7C15)
    bits = ((h64[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    acc = np.where(bits == 1, 1, -1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out.astype(np.int64))


def simhash_batch(batch: pa.Table) -> pa.Table:
    sims = np.asarray([simhash64(t) for t in batch["text"].to_pylist()], dtype=np.int64)
    out = pa.table({"doc_id": batch["doc_id"], "simhash": pa.array(sims)})
    u = sims.astype(np.uint64)
    for b in range(4):
        band = ((u >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
        out = out.append_column(f"sim_band{b}", pa.array(band))
    return out


def simhash_neardup_pairs(ds, max_hamming: int = 3):
    """Hamming ≤ max_hamming pairs via 4×16-bit band blocking.

    Any pair within Hamming 3 of 64 bits agrees exactly on ≥1 of the 4
    16-bit bands (pigeonhole), so banding finds all of them.
    """
    from ..image.phash import hamming_i64

    sims = ds.map_batches(simhash_batch, batch_format="pyarrow")

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").drop_duplicates("doc_id")
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": [], "hamming": []})
        ii, jj = np.triu_indices(len(ids), k=1)
        hd = hamming_i64(hs[ii], hs[jj])
        keep = hd <= max_hamming
        return pd.DataFrame(
            {"a": ids[ii][keep], "b": ids[jj][keep], "hamming": hd[keep]}
        )

    allpairs = []
    for b in range(4):
        p = sims.groupby(f"sim_band{b}").map_groups(band_pairs, batch_format="pandas")
        allpairs.append(p)
    union = allpairs[0]
    for p in allpairs[1:]:
        union = union.union(p)

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return union.groupby(["a", "b"]).map_groups(dedup_pairs, batch_format="pandas")


# -- phash hamming near-dup (images) -----------------------------------------


def phash_bands_batch(batch: pa.Table) -> pa.Table:
    u = batch["phash"].to_numpy().astype(np.uint64)
    out = pa.table({"image_id": batch["image_id"], "phash": batch["phash"]})
    for b in range(4):
        band = ((u >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
        out = out.append_column(f"ph_band{b}", pa.array(band))
    return out


def phash_neardup_pairs(ds, max_hamming: int = 3):
    from ..image.phash import hamming_i64

    banded = ds.map_batches(phash_bands_batch, batch_format="pyarrow")

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("image_id").drop_duplicates("image_id")
        ids = g["image_id"].to_numpy()
        hs = g["phash"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": [], "hamming": []})
        ii, jj = np.triu_indices(len(ids), k=1)
        hd = hamming_i64(hs[ii], hs[jj])
        keep = hd <= max_hamming
        return pd.DataFrame(
            {"a": ids[ii][keep], "b": ids[jj][keep], "hamming": hd[keep]}
        )

    allpairs = None
    for b in range(4):
        p = banded.groupby(f"ph_band{b}").map_groups(band_pairs, batch_format="pandas")
        allpairs = p if allpairs is None else allpairs.union(p)

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return allpairs.groupby(["a", "b"]).map_groups(dedup_pairs, batch_format="pandas")
