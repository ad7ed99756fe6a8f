"""Multi-format table sources: one front door for every tabular format
a reference user might hold (the reference reads only stdin lines —
hllcnt.c:17-26; an engine replacing it must also ingest the tables the
queries run on).

All formats land in the SAME Dataset/Arrow shape, so every stage and
query downstream is format-agnostic; parquet remains the performance
path (column pruning + row-group predicate pushdown), csv/json exist
for interchange. Schema drift across formats (CSV's string-typed ints,
JSON's int64 widening) is normalized by casting to an explicit or
inferred Arrow schema after the read.
"""

from __future__ import annotations

import glob
import os

__all__ = ["read_table"]

_READERS = {"parquet": "read_parquet", "csv": "read_csv", "json": "read_json"}

#: formats Ray Data has no native reader for — read per FILE in tasks
#: (one task per file, column projection pushed into the format reader)
_FILE_READERS = {"orc", "feather"}


def _read_one(path: str, fmt: str, columns):
    import pyarrow.feather as paf
    import pyarrow.orc as paorc

    if fmt == "orc":
        return paorc.ORCFile(path).read(columns=list(columns) if columns
                                        else None)
    return paf.read_table(path, columns=list(columns) if columns else None)


def _read_file_tasks(src, fmt: str, columns):
    """Dataset over per-file read tasks — the distributed shape for
    formats without a ray.data reader: files are the unit of
    parallelism (exactly like the per-file sketch folds), projection
    happens inside the format reader, and downstream operators see the
    same Arrow blocks the parquet path produces."""
    import pyarrow as pa
    import ray.data

    files = [src] if isinstance(src, str) else list(src)

    def load(t: "pa.Table") -> "pa.Table":
        tabs = [_read_one(p, fmt, columns)
                for p in t.column("path").to_pylist()]
        return tabs[0] if len(tabs) == 1 else pa.concat_tables(tabs)

    return ray.data.from_items([{"path": p} for p in files]) \
        .map_batches(load, batch_size=1, batch_format="pyarrow")


def _expand(path: str, ext: str) -> list[str] | str:
    """A directory becomes its sorted member files of the right
    extension (ray.data treats list entries as FILES, never dirs)."""
    if os.path.isdir(path):
        hits = sorted(glob.glob(os.path.join(path, f"*.{ext}")))
        if not hits and ext == "json":
            hits = sorted(glob.glob(os.path.join(path, "*.jsonl")))
        if not hits:
            raise FileNotFoundError(f"no *.{ext} files under {path}")
        return hits
    return path


def read_table(path: str, fmt: str = "parquet", columns=None, schema=None):
    """Read a table in any supported format into a ``ray.data.Dataset``.

    ``fmt``: "parquet" (columns pushed into the read), "csv", "json"
    (newline-delimited), "orc", or "feather" (Arrow IPC). ``columns``
    is pushed into the read for parquet/orc/feather and projects after
    the read for csv/json (those readers parse whole records).
    ``schema``: optional ``pyarrow.Schema`` the batches are cast to —
    pass the parquet file's schema to make csv/json reads
    bit-compatible with the parquet path (CSV round-trips
    timestamps/ints as strings otherwise).
    """
    import ray.data

    if fmt not in _READERS and fmt not in _FILE_READERS:
        raise ValueError(
            f"fmt must be one of {sorted(set(_READERS) | _FILE_READERS)}, "
            f"got {fmt!r}")
    src = _expand(path, "jsonl" if fmt == "json" else fmt)
    if fmt in _FILE_READERS:
        ds = _read_file_tasks(src, fmt, columns)
    elif fmt == "parquet":
        ds = ray.data.read_parquet(src, columns=columns)
    else:
        ds = getattr(ray.data, _READERS[fmt])(src)
        if columns:
            ds = ds.select_columns(list(columns))
    if schema is not None:
        import pyarrow as pa

        want = {f.name: f.type for f in schema}

        def cast(t: "pa.Table") -> "pa.Table":
            arrays = []
            for name in t.column_names:
                col = t.column(name)
                if name in want and col.type != want[name]:
                    col = col.cast(want[name])
                arrays.append(col)
            return pa.table(dict(zip(t.column_names, arrays)))

        ds = ds.map_batches(cast, batch_format="pyarrow")
    return ds
