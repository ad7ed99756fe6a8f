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
           "vacuum", "write_partitioned_files"]


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
