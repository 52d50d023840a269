"""Stream-shaped operators over the ``events`` log: tumbling windows,
sessionization, as-of join.

Ray Data has no event-time watermarks; per the public guidance these are
expressed as partition-by-key + sort-within-group (the events table is
an ordered, partitioned log).  Reference analog: none (SURVEY.md §2.9 —
the reference's "streaming" is lazy IO), so these are scale-path
additions with DuckDB SQL oracles.

Determinism: ties in ``ts`` order by ``event_id``; window buckets use
integer microsecond arithmetic (no float epoch) on both sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

US_PER_HOUR = 3_600_000_000
SESSION_GAP_US = 1_800_000_000  # 30 min


def tumbling_partial(batch: pa.Table, width_us: int = US_PER_HOUR) -> pa.Table:
    """Per-batch partial: (event_type, bucket) → count, value sum.

    Values are snapped to the 2^-20 lattice (see functions/rounding) so
    partial sums merge exactly.
    """
    from ..functions.rounding import snap_binary

    ts = batch["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    bucket = ts // width_us
    etype = np.asarray(batch["event_type"].to_pylist(), dtype=object)
    val = snap_binary(batch["value"].to_numpy())
    df = pd.DataFrame({"event_type": etype, "hour_bucket": bucket, "value": val})
    g = df.groupby(["event_type", "hour_bucket"], as_index=False).agg(
        n=("value", "size"), value_sum=("value", "sum")
    )
    g["n"] = g["n"].astype(np.int64)
    return pa.Table.from_pandas(g, preserve_index=False)


def tumbling_aggregate(ds, width_us: int = US_PER_HOUR):
    from ray.data.aggregate import Sum

    partial = ds.map_batches(
        lambda b: tumbling_partial(b, width_us), batch_format="pyarrow"
    )
    return partial.groupby(["event_type", "hour_bucket"]).aggregate(
        Sum("n", alias_name="n"), Sum("value_sum", alias_name="value_sum")
    )


def sessionize(ds, gap_us: int = SESSION_GAP_US):
    """Per-user session counts with a gap rule (sorted within group)."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        new_session = np.ones(len(g), dtype=np.int64)
        if len(g) > 1:
            new_session[1:] = (np.diff(ts) > gap_us).astype(np.int64)
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_sessions": [int(new_session.sum())],
                "n_events": [len(g)],
            }
        )

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


def asof_join_orders_events(orders_ds, events_ds):
    """For each order: the latest event of that user at/before order time.

    Both-sides-large pattern: tag-union the two datasets, co-partition by
    the key with one groupby, and resolve the as-of inside ``map_groups``
    with a vectorized searchsorted (pandas merge_asof semantics, ties
    broken by max event_id via sort order).
    """

    def tag_orders(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table(
            {
                "key": b["o_custkey"],
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "o_orderkey": b["o_orderkey"],
                "ts": b["o_orderdate"],
                "event_id": pa.array(np.full(n, -1, dtype=np.int64)),
                "value": pa.array(np.full(n, np.nan)),
            }
        )

    def tag_events(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table(
            {
                "key": b["user_id"],
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "o_orderkey": pa.array(np.full(n, -1, dtype=np.int64)),
                "ts": b["ts"],
                "event_id": b["event_id"],
                "value": b["value"],
            }
        )

    unioned = orders_ds.map_batches(tag_orders, batch_format="pyarrow").union(
        events_ds.map_batches(tag_events, batch_format="pyarrow")
    )

    def asof_group(g: pd.DataFrame) -> pd.DataFrame:
        orders = g[g["side"] == 0]
        events = g[g["side"] == 1].sort_values(["ts", "event_id"])
        if len(orders) == 0:
            return pd.DataFrame(
                {"o_orderkey": [], "o_custkey": [], "last_event_id": [], "last_value": []}
            )
        ots = orders["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        if len(events) == 0:
            eid = np.full(len(orders), -1, dtype=np.int64)
            val = np.full(len(orders), np.nan)
        else:
            ets = events["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            pos = np.searchsorted(ets, ots, side="right") - 1
            has = pos >= 0
            safe = np.clip(pos, 0, None)
            eid = np.where(has, events["event_id"].to_numpy()[safe], -1)
            val = np.where(has, events["value"].to_numpy()[safe], np.nan)
        return pd.DataFrame(
            {
                "o_orderkey": orders["o_orderkey"].to_numpy(),
                "o_custkey": orders["key"].to_numpy(),
                "last_event_id": eid.astype(np.int64),
                "last_value": val,
            }
        )

    return unioned.groupby("key").map_groups(asof_group, batch_format="pandas")


def asof_join_events_orders(events_ds, orders_ds):
    """For each event: the latest order of that user at/before event time.

    Same co-partition + searchsorted skeleton as
    :func:`asof_join_orders_events`, with orders as the as-of side.
    """

    def tag_events(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table(
            {
                "key": b["user_id"],
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "event_id": b["event_id"],
                "ts": b["ts"],
                "o_orderkey": pa.array(np.full(n, -1, dtype=np.int64)),
                "o_totalprice": pa.array(np.full(n, np.nan)),
            }
        )

    def tag_orders(b: pa.Table) -> pa.Table:
        n = len(b)
        return pa.table(
            {
                "key": b["o_custkey"],
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "event_id": pa.array(np.full(n, -1, dtype=np.int64)),
                "ts": b["o_orderdate"],
                "o_orderkey": b["o_orderkey"],
                "o_totalprice": b["o_totalprice"],
            }
        )

    unioned = events_ds.map_batches(tag_events, batch_format="pyarrow").union(
        orders_ds.map_batches(tag_orders, batch_format="pyarrow")
    )

    def asof_group(g: pd.DataFrame) -> pd.DataFrame:
        events = g[g["side"] == 0]
        orders = g[g["side"] == 1].sort_values(["ts", "o_orderkey"])
        if len(events) == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype=np.int64),
                    "user_id": pd.Series([], dtype=np.int64),
                    "last_orderkey": pd.Series([], dtype=np.int64),
                    "last_totalprice": pd.Series([], dtype=np.float64),
                }
            )
        ets = events["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        if len(orders) == 0:
            okey = np.full(len(events), -1, dtype=np.int64)
            oval = np.full(len(events), np.nan)
        else:
            ots = orders["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            pos = np.searchsorted(ots, ets, side="right") - 1
            has = pos >= 0
            safe = np.clip(pos, 0, None)
            okey = np.where(has, orders["o_orderkey"].to_numpy()[safe], -1)
            oval = np.where(has, orders["o_totalprice"].to_numpy()[safe], np.nan)
        return pd.DataFrame(
            {
                "event_id": events["event_id"].to_numpy(),
                "user_id": events["key"].to_numpy(),
                "last_orderkey": okey.astype(np.int64),
                "last_totalprice": oval,
            }
        )

    return unioned.groupby("key").map_groups(asof_group, batch_format="pandas")
