"""Relational building blocks: broadcast hash join, semi/anti join, top-k.

Join strategy per the Ray guide: the small side (dimension table) is
``ray.put`` ONCE and merged per batch inside ``map_batches`` — no
shuffle of the big side.  The reference's key join J3
(``plt_cn = ANY(...)``, ``database_config_v3.py:117-128``) maps to
exactly this shape.  Big–big joins co-partition via groupby (see
``windows.asof_join_orders_events`` for the pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


class BroadcastJoiner:
    """map_batches actor merging a broadcast pandas dimension table."""

    def __init__(self, small_ref=None, small: pd.DataFrame | None = None, on=None, how="inner"):
        if small is None:
            import ray

            small = ray.get(small_ref)
        self.small = small
        self.on = on
        self.how = how

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(self.small, on=self.on, how=self.how)


def broadcast_join(ds, small_df: pd.DataFrame, on, how: str = "inner", concurrency=(1, 4)):
    import ray

    ref = ray.put(small_df)
    return ds.map_batches(
        BroadcastJoiner,
        fn_constructor_kwargs={"small_ref": ref, "on": on, "how": how},
        batch_format="pandas",
        concurrency=concurrency,
    )


def semi_join(ds, keys: np.ndarray, col: str):
    """Rows of ds whose col is in the broadcast key set."""
    import ray

    ref = ray.put(np.unique(np.asarray(keys)))

    class Semi:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch[np.isin(batch[col].to_numpy(), self.keys)]

    return ds.map_batches(Semi, batch_format="pandas", concurrency=(1, 4))


def anti_join(ds, keys: np.ndarray, col: str):
    import ray

    ref = ray.put(np.unique(np.asarray(keys)))

    class Anti:
        def __init__(self):
            self.keys = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch[~np.isin(batch[col].to_numpy(), self.keys)]

    return ds.map_batches(Anti, batch_format="pandas", concurrency=(1, 4))


def topk(ds, by: str, k: int, descending: bool = True, tie_col: str | None = None):
    """Exact global top-k without a full sort: per-batch partial top-k
    (combiner) → tiny driver-side finish."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cols = [by] + ([tie_col] if tie_col else [])
        asc = [not descending] + ([True] if tie_col else [])
        return batch.sort_values(cols, ascending=asc).head(k)

    small = ds.map_batches(partial, batch_format="pandas").to_pandas()
    cols = [by] + ([tie_col] if tie_col else [])
    asc = [not descending] + ([True] if tie_col else [])
    return small.sort_values(cols, ascending=asc).head(k).reset_index(drop=True)
