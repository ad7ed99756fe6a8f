"""Bitmap index — per-VALUE bitsets over a dense row-id space, the
classic OLAP index (O'Neil & Quass, SIGMOD'97; roaring/concise are the
compressed descendants): one bit per row per distinct value of a
low-cardinality column, so any boolean predicate combination
(AND/OR/NOT across columns) evaluates as word-wise bit algebra plus a
popcount — WITHOUT rescanning the fact table.

Distributed build: each batch OR-folds its rows into sparse
(column, value, word_index, word_bits) partials — ≤ touched-words rows,
never row-count rows — and the driver OR-scatters them into the final
bitmaps (an index is small by design: n_rows/64 words per value). The
index persists as one parquet state table; SERVING a predicate grid
reads only that table (bytes ≪ fact table) — the same state-table
discipline as the inverted index and sketch rollups.

Determinism: OR is commutative/associative/idempotent, so any batch
layout (and task retry) produces identical bitmaps.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["bitmap_partials", "build_bitmap_index", "load_bitmaps",
           "popcount"]


def popcount(words: np.ndarray) -> int:
    """Total set bits of a uint64 word array (numpy<2 has no
    bitwise_count; unpackbits over the byte view is exact and fast at
    index scale)."""
    if not len(words):
        return 0
    return int(np.unpackbits(words.view(np.uint8)).sum())


def bitmap_partials(ids: np.ndarray, codes: np.ndarray,
                    col: str, values: list) -> pd.DataFrame:
    """One batch's sparse bitmap contribution: rows (col, value, word,
    bits) with per-(value, word) bits OR-folded (lexsort + reduceat —
    no per-row Python)."""
    if not len(ids):
        return pd.DataFrame({"col": pd.Series([], dtype=object),
                             "value": pd.Series([], dtype=object),
                             "word": pd.Series([], dtype=np.int64),
                             "bits": pd.Series([], dtype=np.int64)})
    word = ids >> 6
    bit = np.uint64(1) << (ids & np.int64(63)).astype(np.uint64)
    order = np.lexsort((word, codes))
    c, w, b = codes[order], word[order], bit[order]
    key_change = np.r_[True, (c[1:] != c[:-1]) | (w[1:] != w[:-1])]
    starts = np.flatnonzero(key_change)
    folded = np.bitwise_or.reduceat(b, starts) if len(b) else b
    # values serialize as strings so mixed-type columns (str types,
    # int day-of-week) share one Arrow schema across the union
    vstr = np.asarray([str(v) for v in values], dtype=object)
    return pd.DataFrame({
        "col": col,
        "value": vstr[c[starts]],
        "word": w[starts].astype(np.int64),
        "bits": folded.astype(np.uint64).view(np.int64),
    })


def build_bitmap_index(ds, id_col: str, columns: dict, n_rows: int,
                       out_path: str) -> str:
    """Build and persist bitmaps for each entry of ``columns``:
    name → (values list, fn(pa.Table) -> int codes). Row ids must be
    dense in [0, n_rows). Returns the parquet path (atomic publish)."""
    import pyarrow.parquet as pq

    def part(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        outs = []
        for col, (values, fn) in columns.items():
            outs.append(bitmap_partials(ids, fn(t), col, values))
        return pa.Table.from_pandas(pd.concat(outs, ignore_index=True),
                                    preserve_index=False)

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    nw = (n_rows + 63) >> 6
    rows = []
    for (col, value), g in parts.groupby(["col", "value"], sort=True):
        bm = np.zeros(nw, dtype=np.uint64)
        np.bitwise_or.at(bm, g["word"].to_numpy(dtype=np.int64),
                         g["bits"].to_numpy(dtype=np.int64)
                         .view(np.uint64))
        rows.append({"col": col, "value": value,
                     "bits": bm.view(np.int64).tobytes()})
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    tmp = out_path + ".tmp"
    pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows),
                                        preserve_index=False), tmp)
    os.replace(tmp, out_path)
    return out_path


def load_bitmaps(path: str) -> dict:
    """(col, str(value)) → uint64 word array, from the persisted index
    — the only input the serve path touches."""
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    out = {}
    for col, value, blob in zip(t.column("col").to_pylist(),
                                t.column("value").to_pylist(),
                                t.column("bits").to_pylist()):
        out[(col, value)] = np.frombuffer(blob, dtype=np.int64) \
            .view(np.uint64)
    return out
