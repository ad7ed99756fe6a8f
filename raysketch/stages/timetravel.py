"""Versioned table with a commit LOG + TIME-TRAVEL reads — the
Delta-Lake/Iceberg snapshot pattern (Armbrust et al., VLDB'20): a table
is a directory of immutable parquet data files plus an ordered log of
atomic commits, each listing the files it ADDS and REMOVES. Updates are
COPY-ON-WRITE at partition granularity (rewrite only the partitions a
change touches); a reader resolves ``AS OF version v`` by replaying log
entries 0..v into the active file set and reads exactly those files —
no per-version data copies, every old version stays readable until
``vacuum`` reclaims its files.

Scale shape: the log is O(commits) tiny JSON; snapshot resolution is a
driver-side set replay; the reads are plain pruned ``read_parquet``
over the resolved file list. Commit atomicity = write data files first,
then publish the numbered log entry with an os.replace rename — a crash
in between leaves orphan data files that no log references (invisible
to readers, reclaimed by vacuum).
"""

from __future__ import annotations

import glob
import json
import os

__all__ = ["commit", "active_files", "read_as_of", "latest_version",
           "vacuum", "write_partitioned_files", "file_column_stats",
           "commit_with_stats", "active_files_pruned", "changed_files"]


def _log_dir(path: str) -> str:
    return os.path.join(path, "_log")


def latest_version(path: str) -> int:
    """Highest committed version, or -1 for an empty/absent table."""
    entries = glob.glob(os.path.join(_log_dir(path), "*.json"))
    return max((int(os.path.basename(e)[:-5]) for e in entries), default=-1)


def commit(path: str, add: list[str], remove: list[str] = ()) -> int:
    """Publish the next version atomically. File paths are stored
    RELATIVE to the table root so the table directory is relocatable."""
    os.makedirs(_log_dir(path), exist_ok=True)
    v = latest_version(path) + 1
    rel = [os.path.relpath(f, path) for f in sorted(add)]
    relrm = [os.path.relpath(f, path) for f in sorted(remove)]
    entry = {"version": v, "add": rel, "remove": relrm}
    dst = os.path.join(_log_dir(path), f"{v:08d}.json")
    tmp = dst + ".tmp"
    with open(tmp, "w") as f:
        json.dump(entry, f)
    os.replace(tmp, dst)
    return v


def active_files(path: str, version: int | None = None) -> list[str]:
    """Replay the log through ``version`` (default: latest) into the
    active file set."""
    last = latest_version(path)
    if last < 0:
        raise ValueError(f"not a versioned table (no log): {path}")
    v = last if version is None else int(version)
    if v < 0 or v > last:
        raise ValueError(f"version {v} out of range [0, {last}]")
    active: set[str] = set()
    for i in range(v + 1):
        with open(os.path.join(_log_dir(path), f"{i:08d}.json")) as f:
            e = json.load(f)
        active -= set(e["remove"])
        active |= set(e["add"])
    out = [os.path.join(path, r) for r in sorted(active)]
    missing = [f for f in out if not os.path.exists(f)]
    if missing:
        raise ValueError(
            f"version {v} is no longer readable: {len(missing)} of its "
            f"files were vacuumed (e.g. {missing[0]})")
    return out


def read_as_of(path: str, version: int | None = None, columns=None):
    """``ray.data.read_parquet`` over exactly the files active at
    ``version`` — the time-travel read."""
    import ray.data

    return ray.data.read_parquet(active_files(path, version),
                                 columns=columns)


def vacuum(path: str, keep_from: int) -> list[str]:
    """Delete data files only referenced by versions < ``keep_from``
    (plus orphans no version references); versions ≥ keep_from stay
    byte-identical. Returns the deleted paths."""
    last = latest_version(path)
    if last < 0:
        raise ValueError(f"not a versioned table (no log): {path}")
    keep: set[str] = set()
    for v in range(max(0, int(keep_from)), last + 1):
        keep |= {os.path.relpath(f, path) for f in active_files(path, v)}
    deleted = []
    for f in glob.glob(os.path.join(path, "**", "*.parquet"),
                       recursive=True):
        if os.path.relpath(f, path) not in keep:
            os.remove(f)
            deleted.append(f)
    return sorted(deleted)


def write_partitioned_files(ds, out_dir: str,
                            partition_col: str) -> list[str]:
    """Write a Dataset as one parquet directory tree partitioned by
    ``partition_col`` and return the file list (commit input). The
    caller owns WHICH versions these files join — this only produces
    immutable data files under a fresh subdirectory."""
    os.makedirs(out_dir, exist_ok=True)
    ds.write_parquet(out_dir, partition_cols=[partition_col])
    return sorted(glob.glob(os.path.join(out_dir, "**", "*.parquet"),
                            recursive=True))


def file_column_stats(files: list[str], column: str) -> dict:
    """Per-file (min, max) of ``column`` from parquet FOOTER metadata
    only (no data pages read) — the stats a commit embeds so readers
    can skip files by predicate, Iceberg-manifest style."""
    import pyarrow.parquet as pq

    out = {}
    for f in files:
        md = pq.ParquetFile(f).metadata
        lo = hi = None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                if c.path_in_schema == column and c.statistics is not None:
                    s = c.statistics
                    if s.has_min_max:
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
        out[f] = (lo, hi)
    return out


def commit_with_stats(path: str, add: list[str], column: str,
                      remove: list[str] = ()) -> int:
    """Commit that embeds per-added-file (min, max) stats of ``column``
    in the log entry — data skipping served from the LOG alone (no
    footer reads at query time)."""
    stats = file_column_stats(add, column)
    v = commit(path, add, remove)
    entry_path = os.path.join(_log_dir(path), f"{v:08d}.json")
    with open(entry_path) as f:
        e = json.load(f)
    e["stats_column"] = column
    e["stats"] = {os.path.relpath(f0, path): [s[0], s[1]]
                  for f0, s in stats.items()}
    tmp = entry_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(e, f)
    os.replace(tmp, entry_path)
    return v


def _log_stats(path: str, version: int) -> dict:
    """rel-file → (min, max) union over log entries ≤ version."""
    out = {}
    for i in range(version + 1):
        with open(os.path.join(_log_dir(path), f"{i:08d}.json")) as f:
            e = json.load(f)
        for rel, s in (e.get("stats") or {}).items():
            out[rel] = (s[0], s[1])
    return out


def active_files_pruned(path: str, version: int | None, lo, hi
                        ) -> tuple[list[str], int]:
    """Active files at ``version`` whose logged [min, max] intersects
    [lo, hi] — files with stats disjoint from the predicate are
    SKIPPED without opening them; files lacking stats are kept
    (pruning must never drop rows). Returns (files, n_total_active)."""
    act = active_files(path, version)
    last = latest_version(path) if version is None else int(version)
    stats = _log_stats(path, last)
    kept = []
    for f in act:
        rel = os.path.relpath(f, path)
        s = stats.get(rel)
        if s is None or s[0] is None:
            kept.append(f)
        elif not (s[1] < lo or s[0] > hi):
            kept.append(f)
    return kept, len(act)


def changed_files(path: str, v_from: int, v_to: int
                  ) -> tuple[list[str], list[str]]:
    """(added, removed) file lists between two snapshots — the
    copy-on-write dividend: files shared by both versions never appear,
    so a snapshot diff reads ONLY what changed, not either snapshot."""
    a = set(active_files(path, v_from))
    b = set(active_files(path, v_to))
    return sorted(b - a), sorted(a - b)
