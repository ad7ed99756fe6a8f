"""Range-partitioned sorted parquet sink.

``sorted_partitioned_write`` produces a globally-sorted table layout
without Ray's all-to-all sort operator: one driver-folded pass finds
the key range, rows shuffle ONCE into contiguous range buckets, each
bucket sorts locally (vectorized) and writes its own parquet file, and
the returned manifest records per-bucket (n_rows, key_min, key_max,
path). Because bucket key ranges are disjoint and ascending, the file
sequence IS the global sort order — and a resumed / downstream
consumer can binary-search the manifest instead of scanning, or skip
buckets a previous run already wrote (the resumability layout the
100 TB story needs: never one giant file, never a global sort
shuffle).

Bucket bounds are the same deterministic integer arithmetic as
:mod:`raysketch.stages.scan` (``(key - lo) * B // span``), so the
manifest is exactly reproducible — and SQL-checkable.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

__all__ = ["sorted_partitioned_write"]


def sorted_partitioned_write(ds, key_col: str, out_dir: str,
                             num_buckets: int = 32):
    """Write ``ds`` as ``out_dir/bucket-%05d.parquet`` files, each
    sorted by ``key_col`` (int64-coercible), covering disjoint
    ascending key ranges. Returns the manifest as a pandas DataFrame
    (bucket, n_rows, key_min, key_max, path) sorted by bucket; empty
    buckets are omitted. See module docstring."""
    import pandas as pd
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)

    def minmax(t: pa.Table) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        return pa.table({"lo": pa.array([int(k.min()) if len(k) else 0]),
                         "hi": pa.array([int(k.max()) if len(k) else 0]),
                         "n": pa.array([len(k)])})

    ds = ds.materialize()
    meta = ds.map_batches(minmax, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    if "n" in meta.columns:
        meta = meta[meta["n"] > 0]
    if not len(meta):
        return pd.DataFrame({"bucket": pd.Series([], dtype="int64"),
                             "n_rows": pd.Series([], dtype="int64"),
                             "key_min": pd.Series([], dtype="int64"),
                             "key_max": pd.Series([], dtype="int64"),
                             "path": pd.Series([], dtype="object")})
    lo, hi = int(meta["lo"].min()), int(meta["hi"].max())
    B = int(num_buckets)
    span = max(hi - lo + 1, 1)

    def tag(t: pa.Table) -> pa.Table:
        k = t.column(key_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        b = (k - lo) * B // span
        return t.append_column("__rb", pa.array(b.astype(np.int64)))

    def write_bucket(g: "pd.DataFrame") -> "pd.DataFrame":
        b = int(g["__rb"].iloc[0])
        g = g.drop(columns=["__rb"]) \
            .sort_values(key_col, kind="stable").reset_index(drop=True)
        path = os.path.join(out_dir, f"bucket-{b:05d}.parquet")
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False), path)
        k = g[key_col].to_numpy()
        return pd.DataFrame({"bucket": [b], "n_rows": [len(g)],
                             "key_min": [int(k.min())],
                             "key_max": [int(k.max())],
                             "path": [path]})

    manifest = ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__rb").map_groups(write_bucket, batch_format="pandas") \
        .to_pandas()
    manifest = manifest.sort_values("bucket").reset_index(drop=True)
    for c in ("bucket", "n_rows", "key_min", "key_max"):
        manifest[c] = manifest[c].astype("int64")
    return manifest
