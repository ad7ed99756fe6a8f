"""Hash-BUCKETED table layout + co-partitioned ZERO-SHUFFLE join —
the lakehouse "bucketed tables" feature (Hive/Spark bucketing): pay
each table's key exchange ONCE at write time; every later equi-join
on that key runs with no runtime shuffle at all, because bucket k of
table A can only match bucket k of table B (both layouts share the
same bucket function — splitmix64(key) % B, recorded in meta.json and
validated at join time).

Join execution is embarrassingly parallel: a Dataset of bucket ids
fans out one task per bucket; each task reads its two bucket files
directly (node-local after first touch), merges the already
key-sorted sides, and emits a bounded partial aggregate — no
exchange operator anywhere in the plan. At 100 TB the write cost
amortizes across every downstream join/groupby on the key, buckets
scale with data volume (fixed target bytes per bucket), and a failed
join re-runs per bucket.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa

__all__ = ["write_bucketed", "bucket_files", "cobucket_join_fold"]


def _bucket_of(key: np.ndarray, num_buckets: int) -> np.ndarray:
    from .dedup import _splitmix64

    return (_splitmix64(key.astype(np.uint64)) %
            np.uint64(num_buckets)).astype(np.int64)


def write_bucketed(ds, key_col: str, out_dir: str,
                   num_buckets: int = 32) -> dict:
    """Write ``ds`` bucketed by ``splitmix64(key) % num_buckets``,
    key-sorted within each bucket; meta.json written LAST."""
    import pandas as pd

    def tag(t: pa.Table) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        return t.append_column("__b", pa.array(_bucket_of(k, num_buckets)))

    def sort_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(key_col, kind="stable").reset_index(drop=True)

    bdir = os.path.join(out_dir, "buckets")
    shutil.rmtree(bdir, ignore_errors=True)
    os.makedirs(bdir, exist_ok=True)
    ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__b").map_groups(sort_bucket, batch_format="pandas") \
        .write_parquet(bdir, partition_cols=["__b"])
    meta = {"kind": "bucketed", "key_col": key_col,
            "num_buckets": num_buckets, "bucket_fn": "splitmix64"}
    mpath = os.path.join(out_dir, "meta.json")
    with open(mpath + ".tmp", "w") as f:
        json.dump(meta, f)
    os.replace(mpath + ".tmp", mpath)
    return meta


def _meta(out_dir: str) -> dict:
    with open(os.path.join(out_dir, "meta.json")) as f:
        return json.load(f)


def bucket_files(out_dir: str, k: int) -> list[str]:
    return sorted(glob.glob(os.path.join(out_dir, "buckets",
                                         f"__b={k}", "*.parquet")))


def cobucket_join_fold(dir_a: str, dir_b: str, per_bucket_fn,
                       columns_a=None, columns_b=None):
    """Zero-shuffle co-partitioned join: for every bucket k, one task
    reads bucket k of both layouts and applies
    ``per_bucket_fn(table_a, table_b) -> pa.Table`` (a join + bounded
    partial reduce). Returns the concatenated partials as a Ray
    Dataset for the caller to fold. Raises if the layouts are not
    co-bucketed (different key function or bucket count)."""
    import pyarrow.parquet as pq
    import ray.data

    ma, mb = _meta(dir_a), _meta(dir_b)
    if (ma["num_buckets"] != mb["num_buckets"]
            or ma["bucket_fn"] != mb["bucket_fn"]):
        raise ValueError("layouts are not co-bucketed: "
                         f"{ma} vs {mb}")
    nb = ma["num_buckets"]

    def join_bucket(t: pa.Table) -> pa.Table:
        outs = []
        for k in t.column("b").to_pylist():
            fa = bucket_files(dir_a, k)
            fb = bucket_files(dir_b, k)
            if not fa or not fb:
                continue
            ta = pq.read_table(fa, columns=columns_a)
            tb = pq.read_table(fb, columns=columns_b)
            r = per_bucket_fn(ta, tb)
            if r.num_rows:
                outs.append(r)
        if not outs:
            return per_bucket_fn(
                pq.read_table(next(f for k in range(nb)
                                   for f in bucket_files(dir_a, k)[:1]),
                              columns=columns_a).slice(0, 0),
                pq.read_table(next(f for k in range(nb)
                                   for f in bucket_files(dir_b, k)[:1]),
                              columns=columns_b).slice(0, 0))
        return pa.concat_tables(outs)

    ids = ray.data.from_items([{"b": k} for k in range(nb)])
    return ids.map_batches(join_bucket, batch_format="pyarrow",
                           batch_size=1)
