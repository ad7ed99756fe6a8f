"""Distributed ordered prefix scan.

``ordered_prefix_scan`` computes, for every row, an associative fold
(sum / max / min) of ``val_col`` over all rows with a strictly smaller
``key_col`` — the distributed twin of ``SUM/MAX/MIN(val) OVER (ORDER
BY key ROWS UNBOUNDED PRECEDING AND 1 PRECEDING)`` — via the classic
two-phase scan:

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

__all__ = ["ordered_prefix_scan", "ordered_prefix_sum"]

_OPS = {
    "sum": dict(identity=0,
                bucket=lambda idx, vals, B: _bincount_i64(idx, vals, B),
                cum=np.cumsum),
    "max": dict(identity=np.iinfo(np.int64).min,
                bucket=lambda idx, vals, B: _reduce_at_i64(
                    idx, vals, B, np.maximum, np.iinfo(np.int64).min),
                cum=np.maximum.accumulate),
    "min": dict(identity=np.iinfo(np.int64).max,
                bucket=lambda idx, vals, B: _reduce_at_i64(
                    idx, vals, B, np.minimum, np.iinfo(np.int64).max),
                cum=np.minimum.accumulate),
}


def _bincount_i64(idx, vals, B):
    return np.bincount(idx, weights=vals, minlength=B).astype(np.int64)


def _reduce_at_i64(idx, vals, B, ufunc, identity):
    out = np.full(B, identity, dtype=np.int64)
    ufunc.at(out, idx, vals)
    return out


def ordered_prefix_scan(ds, key_col: str, val_col: str, op: str = "sum",
                        num_buckets: int = 64, carry_cols=()):
    """Return a Dataset of (key_col, val_col, *carry_cols, prefix)
    where ``prefix[i] = fold(val over keys < key[i])`` for ``op`` in
    sum | max | min. Rows with no predecessor get the fold identity
    (0 for sum, int64 min/max for max/min). ``carry_cols`` ride along
    through the bucket shuffle (no separate re-join needed downstream).
    See module docstring.
    """
    import pandas as pd
    import ray

    if op not in _OPS:
        raise ValueError(f"op must be one of {sorted(_OPS)}, got {op!r}")
    spec = _OPS[op]
    identity = spec["identity"]

    # pass 0: key range + per-bucket partials, folded on the driver.
    # B partials per block reach the driver — never rows.
    def minmax(t: pa.Table) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        return pa.table({"lo": pa.array([int(k.min()) if len(k) else 0]),
                         "hi": pa.array([int(k.max()) if len(k) else 0]),
                         "n": pa.array([len(k)])})

    carry_cols = list(carry_cols)
    ds = ds.select_columns([key_col, val_col] + carry_cols).materialize()
    meta = ds.map_batches(minmax, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    if "n" in meta.columns:  # empty dataset loses its schema
        meta = meta[meta["n"] > 0]
    if not len(meta):
        return ds.map_batches(
            lambda t: t.append_column(
                "prefix", pa.array(np.full(t.num_rows, identity,
                                           dtype=np.int64))),
            batch_format="pyarrow")
    lo, hi = int(meta["lo"].min()), int(meta["hi"].max())
    B = int(num_buckets)
    span = max(hi - lo + 1, 1)
    # ceil-width division, NOT (k-lo)*B//span: the multiply overflows
    # int64 once keys span more than 2^63/B (e.g. the composite
    # (cents<<32|id) ranking keys), which silently yields negative
    # bucket ids. Same monotone partition of [lo, hi] into ≤B cells;
    # scan results are bucket-boundary-invariant (locked by the
    # partition-invariance tests).
    width = max(-(-span // B), 1)

    def bucket_of(k: np.ndarray) -> np.ndarray:
        return ((k.astype(np.int64) - lo) // width).astype(np.int64)

    def bucket_partials(t: pa.Table) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        v = t.column(val_col).to_numpy(zero_copy_only=False)
        return pa.table({
            "b": pa.array(np.arange(B, dtype=np.int64)),
            "s": pa.array(spec["bucket"](bucket_of(k), v, B))})

    part = ds.map_batches(bucket_partials, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    totals = np.full(B, identity, dtype=np.int64)
    if op == "sum":
        np.add.at(totals, part["b"].to_numpy(), part["s"].to_numpy())
    elif op == "max":
        np.maximum.at(totals, part["b"].to_numpy(), part["s"].to_numpy())
    else:
        np.minimum.at(totals, part["b"].to_numpy(), part["s"].to_numpy())
    base = np.concatenate(([identity], spec["cum"](totals)[:-1]))
    base_ref = ray.put(base)

    # pass 1: range-bucket shuffle + within-bucket exclusive scan
    def tag(t: pa.Table) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        return t.append_column("__rb", pa.array(bucket_of(k)))

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(base_ref)
        k = g[key_col].to_numpy()
        v = g[val_col].to_numpy()
        order = np.argsort(k, kind="stable")
        k, v = k[order], v[order]
        excl = np.concatenate(([identity], spec["cum"](v)[:-1]))
        base_b = b[int(g["__rb"].iloc[0])]
        if op == "sum":
            pre = excl + base_b
        elif op == "max":
            pre = np.maximum(excl, base_b)
        else:
            pre = np.minimum(excl, base_b)
        out = {key_col: k, val_col: v}
        for c in carry_cols:
            out[c] = g[c].to_numpy()[order]
        out["prefix"] = pre
        return pd.DataFrame(out)

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__rb").map_groups(scan, batch_format="pandas")


def ordered_prefix_sum(ds, key_col: str, val_col: str,
                       num_buckets: int = 64):
    """``ordered_prefix_scan(..., op="sum")`` — kept as the named
    entry the packing pipeline documents."""
    return ordered_prefix_scan(ds, key_col, val_col, op="sum",
                               num_buckets=num_buckets)
