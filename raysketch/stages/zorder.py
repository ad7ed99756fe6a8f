"""Z-ORDER (Morton-curve) clustered storage layout for 2-D range
pruning — the multi-dimensional analog of the clustered writer: rows
are sorted by the bit-interleave of two 16-bit coordinates and written
as one parquet directory per aligned z-PREFIX cell.

Why aligned prefix cells: the top ``2j`` bits of a z-value (j bits from
each dimension) identify an AXIS-ALIGNED rectangle — the z-curve
visits each such cell's points contiguously — so a file holding one
cell covers exactly the rectangle

    x ∈ [cx << (16-j), (cx+1) << (16-j)),
    y ∈ [cy << (16-j), (cy+1) << (16-j))

and a 2-D box query can decide file relevance with an EXACT
rectangle-intersection test (no BIGMIN curve walking, no false
dismissals, conservative only at cell granularity). Within a cell the
rows are z-sorted, so parquet row groups are short z-runs = small
rectangles and the reader's x/y min/max statistics stay tight for
row-group-level pruning too.

At 100 TB: the layout build is one map_batches (z computation) + one
cell-hash exchange (groupby(cell)) + a partitioned write — the same
cost as any clustered write; queries then touch only the cells whose
rectangles intersect the box, independent of corpus size. ``j`` scales
with the data (cells ≈ corpus_bytes / target_file_size).

Public pieces: :func:`interleave16` / :func:`deinterleave16` (exact
inverses, property-tested), :func:`cell_bounds`,
:func:`build_zorder_layout`, :func:`zorder_box_read`.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa

__all__ = ["interleave16", "deinterleave16", "cell_bounds",
           "build_zorder_layout", "zorder_box_read"]

_M1 = np.uint64(0x00FF00FF)
_M2 = np.uint64(0x0F0F0F0F)
_M3 = np.uint64(0x33333333)
_M4 = np.uint64(0x55555555)


def _spread(v: np.ndarray) -> np.ndarray:
    v = (v | (v << np.uint64(8))) & _M1
    v = (v | (v << np.uint64(4))) & _M2
    v = (v | (v << np.uint64(2))) & _M3
    v = (v | (v << np.uint64(1))) & _M4
    return v


def interleave16(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Morton z-value of two uint16 coordinates → int64 in [0, 2³²):
    bit i of x lands at bit 2i, bit i of y at bit 2i+1."""
    x = np.asarray(x, dtype=np.uint64)
    y = np.asarray(y, dtype=np.uint64)
    if len(x) and (int(x.max()) >= (1 << 16) or int(y.max()) >= (1 << 16)):
        raise ValueError("z-order coordinates must fit in 16 bits")
    return (_spread(x) | (_spread(y) << np.uint64(1))).astype(np.int64)


def _squash(v: np.ndarray) -> np.ndarray:
    v = v & _M4
    v = (v | (v >> np.uint64(1))) & _M3
    v = (v | (v >> np.uint64(2))) & _M2
    v = (v | (v >> np.uint64(4))) & _M1
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF)
    return v


def deinterleave16(z: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact inverse of :func:`interleave16`."""
    z = np.asarray(z, dtype=np.uint64)
    return (_squash(z).astype(np.int64),
            _squash(z >> np.uint64(1)).astype(np.int64))


def cell_bounds(cell: int, j: int) -> tuple[int, int, int, int]:
    """Half-open rectangle (x0, x1, y0, y1) covered by z-prefix
    ``cell`` (the top 2j bits of z, i.e. cell = z >> (32 - 2j))."""
    cx, cy = deinterleave16(np.array([cell << (32 - 2 * j)],
                                     dtype=np.uint64))
    w = 1 << (16 - j)
    x0 = int(cx[0])
    y0 = int(cy[0])
    return x0, x0 + w, y0, y0 + w


def build_zorder_layout(ds, out_dir: str, xy_fn, j: int = 2,
                        sort_cols: tuple[str, ...] = ()) -> dict:
    """Write ``ds`` as a z-clustered layout under ``out_dir``:
    one hive directory per aligned z-prefix cell (top 2j bits), rows
    z-sorted within each cell (``sort_cols`` break z ties so the
    layout is byte-deterministic). ``xy_fn(table) -> (x, y)`` returns
    the two uint16 coordinate arrays. meta.json is written LAST
    (completeness marker, the invindex convention)."""
    import pandas as pd

    shift = np.int64(32 - 2 * j)

    def add_z(t: pa.Table) -> pa.Table:
        x, y = xy_fn(t)
        z = interleave16(x, y)
        return t.append_column("__z", pa.array(z)) \
            .append_column("__cell", pa.array(z >> shift))

    def sort_cell(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["__z", *sort_cols],
                             kind="stable").reset_index(drop=True)

    cells_dir = os.path.join(out_dir, "cells")
    shutil.rmtree(cells_dir, ignore_errors=True)
    os.makedirs(cells_dir, exist_ok=True)
    ds.map_batches(add_z, batch_format="pyarrow") \
        .groupby("__cell").map_groups(sort_cell, batch_format="pandas") \
        .write_parquet(cells_dir, partition_cols=["__cell"])
    meta = {"kind": "zorder", "j": j, "n_cells": 1 << (2 * j)}
    mpath = os.path.join(out_dir, "meta.json")
    with open(mpath + ".tmp", "w") as f:
        json.dump(meta, f)
    os.replace(mpath + ".tmp", mpath)
    return meta


def zorder_box_read(out_dir: str, x_lo: int, x_hi: int, y_lo: int,
                    y_hi: int, columns=None, audit: dict | None = None):
    """Ray Dataset over ONLY the layout cells whose rectangle
    intersects the closed box [x_lo, x_hi] × [y_lo, y_hi] — exact
    cell-level pruning; the caller applies the exact row filter.
    ``audit`` receives {"cells_read", "cells_total", "files_read",
    "files_total"}."""
    import ray.data

    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    j = meta["j"]
    keep_dirs, all_files, keep_files = [], [], []
    for d in sorted(glob.glob(os.path.join(out_dir, "cells",
                                           "__cell=*"))):
        cell = int(os.path.basename(d).split("=", 1)[1])
        fs = sorted(glob.glob(os.path.join(d, "*.parquet")))
        all_files.extend(fs)
        x0, x1, y0, y1 = cell_bounds(cell, j)
        if x0 <= x_hi and x_lo < x1 and y0 <= y_hi and y_lo < y1:
            keep_dirs.append(d)
            keep_files.extend(fs)
    if audit is not None:
        audit["cells_read"] = len(keep_dirs)
        audit["cells_total"] = len(glob.glob(
            os.path.join(out_dir, "cells", "__cell=*")))
        audit["files_read"] = len(keep_files)
        audit["files_total"] = len(all_files)
    if not keep_files:
        return None
    return ray.data.read_parquet(keep_files, columns=columns)
