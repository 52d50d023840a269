"""Deterministic corpus sampling & token-shard packing.

Two training-data-export primitives over the documents table:

- ``stratified_sample``: per-stratum deterministic fraction sample
  keyed by a Knuth multiplicative hash, selected WITHOUT a data
  shuffle — a bounded (stratum, key-bin) histogram pins the selection
  threshold, one tiny boundary-bin collection resolves it exactly,
  and a final filter pass emits the sample.  Three narrow column
  scans, zero all-to-all: the shape that survives a 10^12-row corpus
  where a per-stratum sort/top-k shuffle would move 20 % of the data.
- ``shard_packing``: assign documents (in global doc_id order) to
  fixed-token-budget shards by exclusive prefix token offset — the
  "concatenate and split every N tokens" layout of pretraining
  shards.  Distributed prefix sum: per-id-range partials → bounded
  driver cumsum → per-range local cumsum + offset, one shuffle.

Both are exact/deterministic (integer arithmetic end-to-end) and
carry DuckDB SQL twins in pipelines/queries.py.  Beyond-reference
ops: the reference's closest analog is fixed-size county processing
chunks (reference src/pipeline/optimized_county_processor_v3.py),
which is a batching detail there, not a data-layout operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .textstages import NONWS_RUN_PY

_KNUTH = np.uint64(2654435761)
_M32 = np.uint64(0xFFFFFFFF)
_BIN_SHIFT = np.uint64(20)  # 4096 histogram bins over the 32-bit key space


def skey_u32(doc_id: np.ndarray) -> np.ndarray:
    """Deterministic 32-bit sample key: (doc_id * 2654435761) mod 2^32.

    uint64 multiply wraps mod 2^64, the mask takes it mod 2^32 — equal
    to the SQL twin's ``(doc_id * 2654435761) % 4294967296`` whenever
    the SQL product fits BIGINT (doc_id < ~4.3e9; holds for the test
    tables — at larger ids the SQL twin, not the engine, is the limit).
    """
    return (doc_id.astype(np.uint64) * _KNUTH) & _M32


def stratified_sample(ds, stratum: str = "source", id_col: str = "doc_id",
                      frac_pct: int = 20):
    """keep max(1, floor(n_s * frac_pct / 100)) rows per stratum — the
    rows with the SMALLEST (skey, id) — without shuffling the data.

    Pass 1: bounded (stratum, skey>>20) histogram via per-batch
    partials + one small bucketed aggregate (≤ strata × 4096 rows).
    Driver: per stratum, walk the bin cumsum to the boundary bin b*
    and the residual rank r* inside it.
    Pass 2: collect ONLY boundary-bin rows (expected n_s/4096 per
    stratum) and take the exact r*-th (skey, id) as the inclusive
    threshold; ties broken by the unique id.
    Pass 3: filter — bin < b*, or bin == b* and (skey, id) ≤ threshold.

    At extreme per-stratum skew the boundary bin itself can be large;
    the fix is recursing with a narrower bin width over that bin only
    (same machinery), noted here rather than implemented — 4096 bins
    keep the driver state ≤ a few MB up to ~10^7 rows per stratum.
    """
    from .zonal import bucketed_agg

    def hist_partial(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        sk = skey_u32(ids)
        bins = (sk >> _BIN_SHIFT).astype(np.int64)
        df = pd.DataFrame({"s": b[stratum].to_pylist(), "bin": bins})
        g = df.groupby(["s", "bin"], as_index=False).size()
        return pa.table(
            {
                "s": pa.array(g["s"].astype(str), pa.string()),
                "bin": pa.array(g["bin"].to_numpy(np.int64)),
                "cnt": pa.array(g["size"].to_numpy(np.int64)),
            }
        )

    hist = bucketed_agg(
        ds.map_batches(hist_partial, batch_format="pyarrow"),
        ["s", "bin"],
        {"cnt": ("cnt", "sum")},
        nb=64,
    ).to_pandas()

    # driver: boundary bin + residual rank per stratum (bounded state)
    bounds: dict[str, tuple[int, int]] = {}
    for s, g in hist.groupby("s"):
        g = g.sort_values("bin")
        n_s = int(g["cnt"].sum())
        keep = max(1, n_s * frac_pct // 100)
        cum = g["cnt"].cumsum().to_numpy()
        i = int(np.searchsorted(cum, keep, side="left"))
        b_star = int(g["bin"].iloc[i])
        before = int(cum[i - 1]) if i else 0
        bounds[s] = (b_star, keep - before)  # rank r* >= 1 inside b*

    def boundary_rows(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        sk = skey_u32(ids)
        bins = (sk >> _BIN_SHIFT).astype(np.int64)
        ss = np.asarray(b[stratum].to_pylist(), dtype=object)
        m = np.zeros(len(ids), dtype=bool)
        for s, (b_star, _) in bounds.items():
            m |= (ss == s) & (bins == b_star)
        return pa.table(
            {
                "s": pa.array(ss[m].astype(str), pa.string()),
                "skey": pa.array(sk[m].astype(np.int64)),
                "id": pa.array(ids[m]),
            }
        )

    edge = ds.map_batches(boundary_rows, batch_format="pyarrow").to_pandas()
    thresh: dict[str, tuple[int, int]] = {}
    for s, (b_star, r) in bounds.items():
        g = edge[edge["s"] == s].sort_values(["skey", "id"])
        row = g.iloc[r - 1]
        thresh[s] = (int(row["skey"]), int(row["id"]))

    def final_filter(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy()
        sk = skey_u32(ids).astype(np.int64)
        bins = sk >> int(_BIN_SHIFT)
        ss = np.asarray(b[stratum].to_pylist(), dtype=object)
        m = np.zeros(len(ids), dtype=bool)
        for s, (b_star, _) in bounds.items():
            tk, ti = thresh[s]
            in_s = ss == s
            m |= in_s & (
                (bins < b_star)
                | ((sk < tk) | ((sk == tk) & (ids <= ti))) & (bins == b_star)
            )
        return pa.table(
            {
                stratum: pa.array(ss[m].astype(str), pa.string()),
                id_col: pa.array(ids[m].astype(np.int64)),
                "skey": pa.array(sk[m]),
            }
        )

    return ds.map_batches(final_filter, batch_format="pyarrow")


def shard_packing(ds, budget: int, id_col: str = "doc_id",
                  text_col: str = "text", n_rows: int | None = None,
                  max_id: int | None = None):
    """Pack documents into fixed-token-budget shards by global doc_id
    order; returns per-shard stats (shard_id, n_docs, tokens, min_doc,
    max_doc).

    shard_id = (exclusive prefix sum of whitespace-token counts in
    doc_id order) // budget — i.e. documents are laid end to end and
    the stream is cut every ``budget`` tokens; a document belongs to
    the shard holding its first token.  Exact distributed prefix sum:

    1. tokenize once into a narrow (id, ntok) table — materialized
       because BOTH passes below consume it (16 B/row, spill-friendly;
       re-running the lineage would re-tokenize the full text twice);
    2. per id-range bucket (bucket = id // width, order-preserving)
       token sums → driver exclusive cumsum over ≤ ~4k buckets;
    3. one groupby(bucket) pass: in-range sort by id, local cumsum +
       range offset → shard ids → per-(bucket, shard) partials;
    4. shards spanning range boundaries merge in a final bucketed
       aggregate over shard_id (cardinality = total_tokens/budget, so
       high-cardinality-safe machinery).
    """
    from .zonal import bucketed_agg

    def tok(b: pa.Table) -> pa.Table:
        s = pd.Series(b[text_col].to_pylist())
        return pa.table(
            {
                "id": b[id_col],
                "ntok": pa.array(
                    s.str.count(NONWS_RUN_PY).to_numpy(np.int64)
                ),
            }
        )

    counts = ds.map_batches(tok, batch_format="pyarrow").materialize()
    if n_rows is None:
        n_rows = counts.count()
    if max_id is None:
        max_id = int(counts.max("id"))
    nb = int(np.clip(n_rows // 1000, 8, 4096))
    width = max(1, (max_id + nb) // nb)

    def range_sums(b: pa.Table) -> pa.Table:
        bk = b["id"].to_numpy() // width
        uniq, inv = np.unique(bk, return_inverse=True)
        return pa.table(
            {
                "bucket": pa.array(uniq.astype(np.int64)),
                "toks": pa.array(
                    np.bincount(
                        inv, weights=b["ntok"].to_numpy(), minlength=len(uniq)
                    ).astype(np.int64)
                ),
            }
        )

    per_range = bucketed_agg(
        counts.map_batches(range_sums, batch_format="pyarrow"),
        ["bucket"],
        {"toks": ("toks", "sum")},
        nb=64,
    ).to_pandas().sort_values("bucket")
    offs = dict(
        zip(
            per_range["bucket"].to_numpy(np.int64),
            np.concatenate([[0], per_range["toks"].cumsum().to_numpy()[:-1]]),
        )
    )

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "bucket", pa.array((b["id"].to_numpy() // width).astype(np.int64))
        )

    def pack(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values("id")
        nt = g["ntok"].to_numpy(np.int64)
        start = int(offs[int(g["bucket"].iloc[0])]) + np.cumsum(nt) - nt
        shard = start // budget
        ids = g["id"].to_numpy(np.int64)
        uniq, inv = np.unique(shard, return_inverse=True)
        return pa.table(
            {
                "shard_id": pa.array(uniq),
                "n_docs": pa.array(
                    np.bincount(inv, minlength=len(uniq)).astype(np.int64)
                ),
                "tokens": pa.array(
                    np.bincount(inv, weights=nt, minlength=len(uniq)).astype(
                        np.int64
                    )
                ),
                "min_doc": pa.array(
                    np.minimum.reduceat(ids, np.flatnonzero(np.r_[1, np.diff(inv)]))
                ),
                "max_doc": pa.array(
                    np.maximum.reduceat(ids, np.flatnonzero(np.r_[1, np.diff(inv)]))
                ),
            }
        )

    partials = (
        counts.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pack, batch_format="pandas")
    )
    return bucketed_agg(
        partials,
        ["shard_id"],
        {
            "n_docs": ("n_docs", "sum"),
            "tokens": ("tokens", "sum"),
            "min_doc": ("min_doc", "min"),
            "max_doc": ("max_doc", "max"),
        },
        nb=256,
    )
