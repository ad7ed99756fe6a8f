"""Joins for the scale tiers the broadcast pattern can't reach.

The reference has no joins (SURVEY.md §2.5); these exist so the engine
covers the standard data-processing surface:

- small × large  → broadcast lookup inside map_batches (see
  pipelines/queries.py mktsegment_revenue / customers_without_orders)
- large × large  → :func:`bucket_hash_join`: both sides get a
  ``bucket = hash(key) % B`` column, bucket pairs join independently
  inside ``map_groups`` (the portable partitioned hash join from
  ray_guide.md). Partitioning assumption: each bucket pair's two sides
  fit one worker's heap — size B to data volume, salt hot keys by
  raising B.
- as-of join     → :func:`asof_join`: sort both sides by (key, ts)
  within buckets, ``pd.merge_asof`` per bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..hashing import murmur64a
from ..keys import canonical_flat_bytes

__all__ = ["bucket_hash_join", "asof_join"]


def _with_bucket(ds, key: str, num_buckets: int, side: str):
    def add(t: pa.Table) -> pa.Table:
        data, offsets = canonical_flat_bytes(t.column(key))
        b = (murmur64a(data, offsets) % np.uint64(num_buckets)).astype(np.int64)
        t = t.append_column("__bucket", pa.array(b))
        return t.append_column("__side", pa.array(np.full(t.num_rows, side == "r")))

    return ds.map_batches(add, batch_format="pyarrow")


def bucket_hash_join(
    left,
    right,
    on: str,
    how: str = "inner",
    num_buckets: int = 64,
    suffixes: tuple[str, str] = ("", "_r"),
):
    """Partitioned hash join of two Datasets on one key column.

    Both sides are tagged with the same hash bucket, unioned, grouped by
    bucket, and joined pairwise with pandas inside each group — one
    shuffle total, work distributed across B independent bucket tasks.
    """
    lcols = [c for c in left.schema().names]
    rcols = [c for c in right.schema().names]
    l_tagged = _with_bucket(left, on, num_buckets, "l")
    r_tagged = _with_bucket(right, on, num_buckets, "r")
    both = l_tagged.union(r_tagged)

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[~g["__side"]][lcols]
        rg = g[g["__side"]][rcols]
        out = lg.merge(rg, on=on, how=how, suffixes=suffixes)
        return out

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")


def asof_join(
    left,
    right,
    key: str,
    ts: str,
    num_buckets: int = 64,
    direction: str = "backward",
    suffixes: tuple[str, str] = ("", "_r"),
):
    """As-of join: for each left row, the latest right row with the same
    ``key`` and ``right.ts <= left.ts`` (direction="backward").

    Same bucket-pair decomposition as bucket_hash_join; inside each
    bucket both sides sort by ts and use ``pd.merge_asof`` (per-key
    exact via ``by=key``)."""
    lcols = [c for c in left.schema().names]
    rcols = [c for c in right.schema().names]
    l_tagged = _with_bucket(left, key, num_buckets, "l")
    r_tagged = _with_bucket(right, key, num_buckets, "r")
    both = l_tagged.union(r_tagged)

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[~g["__side"]][lcols].sort_values(ts)
        rg = g[g["__side"]][rcols].sort_values(ts)
        if lg.empty:
            return lg
        if rg.empty:
            out = lg.copy()
            for c in rcols:
                if c not in (key, ts):
                    out[c + (suffixes[1] if c in lcols else "")] = pd.NA
            return out
        return pd.merge_asof(lg, rg, on=ts, by=key, direction=direction,
                             suffixes=suffixes)

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")
