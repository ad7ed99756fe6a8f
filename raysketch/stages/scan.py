"""Distributed ordered prefix scan.

``ordered_prefix_sum`` computes, for every row, the sum of ``val_col``
over all rows with a strictly smaller ``key_col`` — the distributed
twin of ``SUM(val) OVER (ORDER BY key ROWS UNBOUNDED PRECEDING AND 1
PRECEDING)`` — via the classic two-phase scan:

1. one streaming pass folds per-RANGE-bucket partial sums on the
   driver (B small integers, never rows), and an exclusive prefix over
   the bucket totals yields each bucket's base offset;
2. one range-bucket shuffle of the (key, val) rows; within each bucket
   a vectorized sort + exclusive cumsum + the broadcast base gives the
   exact global prefix.

Only the (key, val) pairs ever shuffle — 16 bytes/row — and every
stage is bounded by a bucket's row count, so the scan survives any
corpus the bucket shuffle survives. Keys must be unique (they are row
identities); ties would make "strictly smaller" ambiguous across
buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["ordered_prefix_sum"]


def ordered_prefix_sum(ds, key_col: str, val_col: str,
                       num_buckets: int = 64):
    """Return a Dataset of (key_col, val_col, prefix) where
    ``prefix[i] = sum(val over keys < key[i])``. See module docstring.
    """
    import pandas as pd
    import ray

    # pass 0: key range + per-bucket totals, folded on the driver.
    # B totals per block reach the driver — never rows.
    def minmax_sums(t: pa.Table) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        v = t.column(val_col).to_numpy(zero_copy_only=False)
        return pa.table({"lo": pa.array([int(k.min()) if len(k) else 0]),
                         "hi": pa.array([int(k.max()) if len(k) else 0]),
                         "n": pa.array([len(k)]),
                         "s": pa.array([int(v.sum()) if len(k) else 0])})

    ds = ds.select_columns([key_col, val_col]).materialize()
    meta = ds.map_batches(minmax_sums, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    if "n" in meta.columns:  # empty dataset loses its schema
        meta = meta[meta["n"] > 0]
    if not len(meta):
        return ds.map_batches(
            lambda t: t.append_column(
                "prefix", pa.array(np.zeros(t.num_rows, dtype=np.int64))),
            batch_format="pyarrow")
    lo, hi = int(meta["lo"].min()), int(meta["hi"].max())
    B = int(num_buckets)
    span = max(hi - lo + 1, 1)

    def bucket_of(k: np.ndarray) -> np.ndarray:
        return ((k.astype(np.int64) - lo) * B // span).astype(np.int64)

    def bucket_sums(t: pa.Table) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        v = t.column(val_col).to_numpy(zero_copy_only=False)
        return pa.table({
            "b": pa.array(np.arange(B, dtype=np.int64)),
            "s": pa.array(np.bincount(bucket_of(k), weights=v,
                                      minlength=B).astype(np.int64))})

    part = ds.map_batches(bucket_sums, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    totals = np.zeros(B, dtype=np.int64)
    np.add.at(totals, part["b"].to_numpy(), part["s"].to_numpy())
    base = np.concatenate(([0], np.cumsum(totals)[:-1]))
    base_ref = ray.put(base)

    # pass 1: range-bucket shuffle + within-bucket exclusive cumsum
    def tag(t: pa.Table) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        return t.append_column("__rb", pa.array(bucket_of(k)))

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(base_ref)
        k = g[key_col].to_numpy()
        v = g[val_col].to_numpy()
        order = np.argsort(k, kind="stable")
        k, v = k[order], v[order]
        pre = np.concatenate(([0], np.cumsum(v)[:-1])) + b[int(g["__rb"].iloc[0])]
        return pd.DataFrame({key_col: k, val_col: v, "prefix": pre})

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__rb").map_groups(scan, batch_format="pandas")
