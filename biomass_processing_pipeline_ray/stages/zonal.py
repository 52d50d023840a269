"""Zonal aggregation: per-county sum/mean biomass — the headline output.

Reference semantics: the county/processing summary G7
(``comprehensive_biomass_processor_v3.py:554-591``,
``optimized_county_processor_v3.py:513-549``) — totals, counts, means.

Scale design (SURVEY.md §7.3): a bare ``groupby(county).aggregate``
shuffles every tile row.  Instead each input batch is collapsed to ONE
partial row per county inside ``map_batches`` (the combiner), and only
those tiny partials shuffle.  This also defuses county-size skew (the
reference's McLean-vs-Rich 6× imbalance): a hot county contributes at
most ``num_batches`` partial rows, not 10^9 tile rows, so no salting of
the final key is needed — the salt is effectively the batch id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.rounding import round_away

_SUM_COLS = ("biomass", "ndvi")


def combine_partials(partial, keys, aggs):
    """groupby().aggregate() for BOUNDED-cardinality partials.

    Combiner outputs are one row per key per input block — hundreds to
    hundreds of thousands of near-empty blocks at scale, and Ray's
    sort-aggregate pays a fixed per-block cost (measured ~50 ms/block:
    7+ s of the round-2 headline went to aggregating 9k tiny rows).
    Coalesce the partials into a few substantial blocks first
    (``repartition`` without shuffle = plain split/merge, no all-to-all)
    and aggregate those.  Block count scales with the cluster so the
    AggregateMap still parallelizes across nodes; float parity is
    unaffected because every summed double is lattice-snapped, making
    partial-sum merges exact in any grouping/order (functions/rounding).
    Only for small-key aggregates — high-cardinality groupbys (dedup
    pair keys) keep their block-parallel layout."""
    import ray

    ncpus = int(ray.cluster_resources().get("CPU", 4))
    k = max(4, ncpus // 4)
    return partial.repartition(k).groupby(keys).aggregate(*aggs)


def bucketed_agg(ds, keys: list[str], aggs: dict[str, tuple[str, str]],
                 nb: int = 1024):
    """Grouped aggregate for HIGH-cardinality keys: coarse hash buckets
    + ONE vectorized in-bucket pandas groupby.

    Ray's native sort-aggregate pays per-distinct-key costs that turn
    pathological beyond ~10⁴ keys (measured: 84 s for a 3-Sum over 37k
    hex cells vs ~2 s through this path; 20 s → ~4 s for the
    heavy-hitter summary merge).  `combine_partials` stays the path for
    BOUNDED-key aggregates, where the coalesce + native aggregate is
    simpler and equally fast.

    ``aggs`` maps output column → (source column, how) with how ∈
    {"sum", "min", "max", "size"}.  Results are grouping-invariant
    (exact int / lattice-float sums, order-free min/max), so the gate
    hashes are unaffected by the bucket layout.  The bucket hash only
    partitions work — any deterministic row hash will do; composite and
    string keys hash via ``pd.util.hash_pandas_object``.
    """

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_bk"] = (
            pd.util.hash_pandas_object(df[keys], index=False).to_numpy() % nb
        ).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        spec = {out: (src, how) for out, (src, how) in aggs.items()}
        r = g.groupby(keys, as_index=False).agg(**spec)
        for out, (_, how) in aggs.items():
            if how == "size":
                r[out] = r[out].astype(np.int64)
        return r

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bk")
        .map_groups(merge, batch_format="pandas")
    )


def zonal_partial(batch: pa.Table, key: str = "county_fips", sum_cols=_SUM_COLS) -> pa.Table:
    """Combiner: one partial row per county per batch."""
    keys = np.asarray(batch[key].to_pylist(), dtype=object)
    uniq, inv = np.unique(keys.astype(str), return_inverse=True)
    out = {key: pa.array(uniq, pa.string())}
    out["tile_count"] = pa.array(np.bincount(inv, minlength=len(uniq)).astype(np.int64))
    for c in sum_cols:
        vals = batch[c].to_numpy()
        out[f"{c}_sum"] = pa.array(np.bincount(inv, weights=vals, minlength=len(uniq)))
    return pa.table(out)


def zonal_aggregate(
    ds,
    key: str = "county_fips",
    sum_cols=_SUM_COLS,
    mean_round: int | None = 4,
    sum_round: int | None = 4,
):
    """partial-combine → small groupby → finalize means. Returns a Dataset."""
    from ray.data.aggregate import Sum

    partial = ds.map_batches(
        lambda b: zonal_partial(b, key, sum_cols), batch_format="pyarrow"
    )
    aggs = [Sum("tile_count", alias_name="tile_count")]
    for c in sum_cols:
        aggs.append(Sum(f"{c}_sum", alias_name=f"{c}_sum"))
    merged = combine_partials(partial, key, aggs)

    def finalize(batch: pa.Table) -> pa.Table:
        cnt = batch["tile_count"].to_numpy().astype(np.float64)
        cols: dict = {
            key: batch[key],
            "tile_count": batch["tile_count"],
        }
        for c in sum_cols:
            s = batch[f"{c}_sum"].to_numpy()
            cols[f"{c}_sum"] = pa.array(
                s if sum_round is None else round_away(s, sum_round)
            )
            m = s / cnt
            cols[f"{c}_mean"] = pa.array(
                m if mean_round is None else round_away(m, mean_round)
            )
        return pa.table(cols)

    return merged.map_batches(finalize, batch_format="pyarrow")
