"""Duplicated-substring (span-level) deduplication: find every k-token
window whose content occurs two or more times ANYWHERE in the corpus
(across docs or within one), keep the first occurrence, and mark all
other occurrences' token positions for removal — the span-level exact
dedup of Lee et al., "Deduplicating Training Data Makes Language Models
Better" (ACL'22), where the unit of removal is the repeated passage,
not the whole document (doc-level exact/near dedup misses boilerplate
shared by otherwise-distinct docs).

Distributed shape: one pass emits fixed-width (gram_hash, doc, pos)
rows — O(tokens) rows of 24 bytes, never text — then ONE hash-bucket
exchange groups equal grams (a gram's hash fully determines its bucket,
so global occurrence groups are complete per bucket), and all but the
lexicographically first (doc, pos) occurrence are marked. A second
bucket exchange keyed on doc id merges each doc's marked windows into
a token-coverage count (interval union, vectorized reduceat).

Gram equality is a k-fold splitmix chain over per-token murmur hashes:
two grams collide only if the 64-bit chain collides (~n²/2⁶⁴ across
distinct gram strings — the exact_dedup_keep_ids collision argument).
Tokenization is single-space splitting, bit-compatible with DuckDB's
``string_split(text, ' ')`` so the whole operator is SQL-oracle
checkable (window functions over exploded grams).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import arrow_to_flat_bytes, murmur64a
from .dedup import _splitmix64

__all__ = ["duplicated_window_marks", "span_removal_stats",
           "remove_duplicate_spans"]


def _token_windows(t: pa.Table, text_col: str, id_col: str, k: int):
    """Batch → (doc ids, window start positions, window gram hashes,
    per-doc token counts). Single-space tokenization (== DuckDB
    string_split); consecutive spaces yield empty tokens on BOTH
    sides, preserving oracle parity."""
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    words = pc.split_pattern(t.column(text_col).combine_chunks(), " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    data, off = arrow_to_flat_bytes(flat)
    tokh = murmur64a(data, off)
    doff = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    nw = doff[1:] - doff[:-1]
    wcounts = np.maximum(nw - k + 1, 0)
    total = int(wcounts.sum())
    if total == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.uint64), ids, nw)
    woff = np.zeros(len(wcounts) + 1, dtype=np.int64)
    np.cumsum(wcounts, out=woff[1:])
    pos = np.arange(total, dtype=np.int64) - np.repeat(woff[:-1], wcounts)
    base = np.repeat(doff[:-1], wcounts) + pos
    h = np.zeros(total, dtype=np.uint64)
    for j in range(k):  # chain-mix the k token hashes of every window
        h = _splitmix64(h ^ tokh[base + j])
    return np.repeat(ids, wcounts), pos, h, ids, nw


def duplicated_window_marks(ds, text_col: str = "text",
                            id_col: str = "doc_id", k: int = 5,
                            num_buckets: int = 64):
    """Dataset → (id_col, pos) rows: every k-token window occurrence
    whose gram occurs ≥2 times corpus-wide, EXCEPT the first occurrence
    by (doc id, position) — i.e. exactly the windows span-dedup
    removes."""
    import pandas as pd

    def gram_rows(t: pa.Table) -> pa.Table:
        gid, pos, h, _, _ = _token_windows(t, text_col, id_col, k)
        return pa.table({
            id_col: pa.array(gid),
            "pos": pa.array(pos),
            "gram": pa.array(h.astype(np.int64)),
            "__b": pa.array((h % np.uint64(num_buckets)).astype(np.int64)),
        })

    def mark_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        gr = g["gram"].to_numpy()
        di = g[id_col].to_numpy()
        po = g["pos"].to_numpy()
        order = np.lexsort((po, di, gr))
        gr, di, po = gr[order], di[order], po[order]
        first = np.r_[True, gr[1:] != gr[:-1]]
        starts = np.nonzero(first)[0]
        sizes = np.diff(np.r_[starts, len(gr)])
        # occurrences of multi-occurrence grams, minus each gram's first
        dup_occ = np.repeat(sizes >= 2, sizes)
        dup_occ[starts] = False
        return pd.DataFrame({id_col: di[dup_occ], "pos": po[dup_occ]})

    return ds.map_batches(gram_rows, batch_format="pyarrow") \
        .groupby("__b").map_groups(mark_in_bucket, batch_format="pandas")


def remove_duplicate_spans(ds, text_col: str = "text",
                           id_col: str = "doc_id", k: int = 5,
                           num_buckets: int = 64):
    """Emit the CLEANED corpus: every duplicated k-token window's
    non-first occurrence is excised from its document (the union of
    marked [pos, pos+k) token intervals is dropped; remaining tokens
    are re-joined with single spaces). This is the span-dedup
    deliverable of Lee et al. ACL'22 — `span_removal_stats` reports
    what WOULD be removed; this operator actually removes it.

    Distributed shape: `duplicated_window_marks` (one gram-hash
    exchange over 24-byte rows) + ONE doc-id-hash exchange that
    co-locates each doc's text with its marks (marks ride as
    (id, pos) rows; text crosses the wire exactly once). The rewrite
    itself is vectorized Arrow: split → flat-token keep mask →
    filter → ListArray rebuild → `binary_join` — no per-row Python.

    Returns a Dataset of (id_col, clean_text) over ALL docs
    (unaffected docs pass through with their text re-joined, which is
    byte-identical under single-space tokenization).
    """
    import pandas as pd

    marks = duplicated_window_marks(ds, text_col, id_col, k, num_buckets)

    def doc_wire(t: pa.Table) -> pa.Table:
        i = t.column(id_col).to_numpy(zero_copy_only=False)
        n = len(t)
        return pa.table({
            id_col: t.column(id_col),
            "pos": pa.array(np.full(n, -1, dtype=np.int64)),
            "text": t.column(text_col).cast(pa.string()),
            "tag": pa.array(np.zeros(n, dtype=np.int64)),
            "__db": pa.array(
                (_splitmix64(i.astype(np.uint64)) % np.uint64(num_buckets))
                .astype(np.int64)),
        })

    def mark_wire(t: pa.Table) -> pa.Table:
        i = t.column(id_col).to_numpy(zero_copy_only=False)
        n = len(t)
        return pa.table({
            id_col: t.column(id_col),
            "pos": t.column("pos"),
            "text": pa.array([""] * n, type=pa.string()),
            "tag": pa.array(np.ones(n, dtype=np.int64)),
            "__db": pa.array(
                (_splitmix64(i.astype(np.uint64)) % np.uint64(num_buckets))
                .astype(np.int64)),
        })

    def rewrite(g: pd.DataFrame) -> pd.DataFrame:
        is_doc = g["tag"].to_numpy() == 0
        docs = g[is_doc]
        if not len(docs):
            return pd.DataFrame({
                id_col: pd.Series([], dtype="int64"),
                "clean_text": pd.Series([], dtype="str")})
        did = docs[id_col].to_numpy()
        order = np.argsort(did, kind="stable")
        did = did[order]
        texts = pa.array(
            docs["text"].to_numpy()[order].tolist(), type=pa.string())
        words = pc.split_pattern(texts, " ")
        flat = words.flatten()
        doff = words.offsets.to_numpy().astype(np.int64)
        keep = np.ones(len(flat), dtype=bool)
        nmark = int((~is_doc).sum())
        if nmark:
            mi = g[id_col].to_numpy()[~is_doc]
            mp = g["pos"].to_numpy()[~is_doc]
            idx = np.searchsorted(did, mi)
            # a mark's doc hashes to the same bucket, so it is present
            start = doff[idx] + mp
            rem = (start[:, None] + np.arange(k, dtype=np.int64)).ravel()
            keep[rem] = False
        csum = np.zeros(len(flat) + 1, dtype=np.int64)
        np.cumsum(keep, out=csum[1:])
        new_off = csum[doff]
        kept = flat.filter(pa.array(keep))
        lst = pa.LargeListArray.from_arrays(
            pa.array(new_off, type=pa.int64()), kept)
        clean = pc.binary_join(lst, " ")
        return pd.DataFrame({
            id_col: did,
            "clean_text": clean.to_pandas().astype(str)})

    wired = ds.map_batches(doc_wire, batch_format="pyarrow").union(
        marks.map_batches(mark_wire, batch_format="pyarrow"))
    return wired.groupby("__db").map_groups(rewrite, batch_format="pandas")


def span_removal_stats(ds, text_col: str = "text", id_col: str = "doc_id",
                       k: int = 5, num_buckets: int = 64):
    """Per-doc span-dedup statistics: (id_col, n_tokens, n_removed)
    as a pandas frame over ALL docs, where n_removed is the size of
    the union of the marked windows' token intervals [pos, pos+k).

    The marked-window set is reduced to one count row per affected doc
    with a second bucket exchange (id-hash); the final frame is
    O(corpus docs) — the natural query result (a 100-TB deployment
    would write it to parquet instead of returning it)."""
    import pandas as pd

    marks = duplicated_window_marks(ds, text_col, id_col, k, num_buckets)

    def id_bucket(t: pa.Table) -> pa.Table:
        i = t.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: t.column(id_col), "pos": t.column("pos"),
            "__db": pa.array(
                (_splitmix64(i.astype(np.uint64)) % np.uint64(num_buckets))
                .astype(np.int64)),
        })

    def coverage(g: pd.DataFrame) -> pd.DataFrame:
        di = g[id_col].to_numpy()
        po = g["pos"].to_numpy()
        order = np.lexsort((po, di))
        di, po = di[order], po[order]
        new_doc = np.r_[True, di[1:] != di[:-1]]
        starts = np.nonzero(new_doc)[0]
        # union length of [p, p+k): sum of min(k, gap to next start in
        # the same doc) with k for each doc's last window
        gap = np.r_[po[1:] - po[:-1], k]
        gap[np.r_[starts[1:] - 1, len(po) - 1]] = k
        contrib = np.minimum(gap, k)
        return pd.DataFrame({
            id_col: di[starts],
            "n_removed": np.add.reduceat(contrib, starts)
            if len(po) else np.zeros(0, dtype=np.int64)})

    removed = marks.map_batches(id_bucket, batch_format="pyarrow") \
        .groupby("__db").map_groups(coverage, batch_format="pandas") \
        .to_pandas()

    def doc_lengths(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t.column(text_col).combine_chunks(), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        return pa.table({id_col: t.column(id_col),
                         "n_tokens": pc.list_value_length(words)})

    lengths = ds.map_batches(doc_lengths, batch_format="pyarrow").to_pandas()
    if len(removed) == 0:
        removed = pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                "n_removed": pd.Series([], dtype="int64")})
    out = lengths.merge(removed, on=id_col, how="left")
    out["n_removed"] = out["n_removed"].fillna(0).astype("int64")
    out["n_tokens"] = out["n_tokens"].astype("int64")
    return out.sort_values(id_col).reset_index(drop=True)
