"""Sketch ROLLUP tables: pre-aggregated mergeable states as a parquet
state table — the warehouse pattern (Druid / Apache DataSketches
"sketch columns", and the reference's own dump()-to-redis loop
industrialized: /root/reference/junk/redis-interop.php stores per-key
HLL dumps and merges them at read time).

Build once per ingest: one row per key (e.g. day, source) holding the
merged serialized state. Query any key RANGE later by merging the
matching rows' states — cost ∝ number of keys, never the raw rows, so
"distinct users over any date range" on a 100-TB event table becomes
a read of a few KB-rows. Appends are trivial: new ingests write MORE
rows for their keys (even duplicate keys); range reads merge
everything that matches, so compaction is an optimization, not a
correctness step.

Determinism: rollup building uses the dynamic-batch fold + grouped
tree merge, so only IDEMPOTENT/commutative-merge families (HLL's
register max, ExactSet's set union, Bloom's OR, moments/DDSketch's
integer sums) produce byte-stable stored blobs; order-sensitive
families (KLL/t-digest/REQ/FD) would need the per-file-fold discipline
at build time. Range reads merge blobs in lexicographic (key, blob)
order — deterministic for every family.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa

from ..sketches import SKETCHES

__all__ = ["build_sketch_rollup", "read_rollup_range", "compact_rollup"]


def build_sketch_rollup(ds, key_col: str, on: str, sketch: str,
                        out_dir: str, **params) -> None:
    """Fold ``ds[on]`` into one merged ``sketch`` state per distinct
    ``key_col`` value and write the state table to ``out_dir`` as
    parquet rows ``(key_col, state: binary)``. Distributed end to end:
    per-batch partials (≤1 row per key per batch) → grouped tree merge
    → parquet sink; raw rows never leave their fold tasks."""
    from ..agg import SketchMerge, fold_partials

    partials = fold_partials(ds, sketch, on, by=[key_col], **params)
    agg = SketchMerge(sketch, on="sketch", alias_name="state",
                      mode="bytes", **params)
    rolled = partials.groupby(key_col).aggregate(agg)
    tmp = out_dir + ".tmp"
    import shutil

    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    rolled.write_parquet(tmp)
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.replace(tmp, out_dir)


def read_rollup_range(path: str | list[str], key_lo, key_hi, sketch: str,
                      key_col: str, **params):
    """Merge the states of every rollup row with ``key_lo <= key <=
    key_hi`` (inclusive; filters pushed into the parquet read) and
    return the merged sketch object. ``path`` may be one rollup
    directory or a LIST of directories — separate ingests of the same
    table append by writing new directories, and range reads merge
    across all of them (duplicate keys are fine: states are mergeable).
    Blobs merge in lexicographic (key, blob) order → deterministic for
    every family."""
    import pyarrow.parquet as pq

    dirs = [path] if isinstance(path, str) else list(path)
    files: list[str] = []
    for d in dirs:
        files.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
    if not files:
        raise FileNotFoundError(f"no rollup files under {dirs}")
    t = pq.read_table(files, columns=[key_col, "state"],
                      filters=[(key_col, ">=", key_lo),
                               (key_col, "<=", key_hi)])
    cls = SKETCHES[sketch]
    acc = cls.empty(**params)
    pairs = sorted(zip(t.column(key_col).to_pylist(),
                       t.column("state").to_pylist()))
    for _, blob in pairs:
        acc = acc.merge(cls.from_bytes(blob))
    return acc


def compact_rollup(paths: list[str], out_dir: str, sketch: str,
                   key_col: str, **params) -> int:
    """Compact several append directories of one rollup into a single
    state table with ONE row per key (duplicate keys' states merged).

    Appends write new directories and range reads merge across all of
    them (correct forever), but per-read file opens grow with ingest
    count — the same unbounded-small-file failure mode the incremental
    dedup indexes had (VERDICT r03 item 4). Compaction is purely an
    optimization: range answers before and after are identical because
    states are mergeable and read_rollup_range merges blobs in
    lexicographic order anyway.

    Distributed shape: read only (key, state) rows → grouped tree merge
    per key → atomic directory swap (build_sketch_rollup's tmp+rename
    discipline). Returns the number of distinct keys written."""
    import shutil

    import ray.data

    from ..agg import SketchMerge

    files: list[str] = []
    for d in paths:
        files.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
    if not files:
        raise FileNotFoundError(f"no rollup files under {paths}")
    ds = ray.data.read_parquet(files, columns=[key_col, "state"])
    n_in = ds.count()  # input rows upper-bound the distinct keys
    agg = SketchMerge(sketch, on="state", alias_name="state",
                      mode="bytes", **params)
    # coalesce the groupby's many tiny output blocks so the compacted
    # table lands in ~500k-key files, not one file per block (the
    # whole point is bounding file count)
    rolled = ds.groupby(key_col).aggregate(agg) \
        .repartition(max(1, -(-n_in // 500_000)))
    tmp = out_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    rolled.write_parquet(tmp)
    n_keys = int(ray.data.read_parquet(tmp).count())
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.replace(tmp, out_dir)
    return int(n_keys)
