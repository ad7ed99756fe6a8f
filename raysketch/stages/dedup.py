"""Deduplication pipelines: exact, MinHash+LSH, SimHash, n-gram Jaccard
verification, embedding-cosine near-dup.

Shared scale shape (ray_guide.md "Exact dedup / Near-dup"): vectorized
per-batch signature computation → explode to (bucket, doc) rows →
``groupby(bucket)`` over *small* rows (never document bodies) →
candidate pairs → verify → connected components. The only all-to-all
exchanges move fixed-width signature/bucket rows; text leaves the
object store exactly once (at signature time).

Component resolution is two-tier (``components="auto"``): while the
verified pair set is ≤ ``DRIVER_PAIR_LIMIT`` it gathers to the driver
(vectorized verify + union-find, one Ray round trip); past the guard
the verify runs as distributed bucket exchanges
(:func:`score_pairs_distributed` — payloads never reach the driver)
feeding the distributed min-label propagation
(:func:`propagate_components`). Both tiers produce identical
components (root = component min id), locked by equality tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import arrow_to_flat_bytes, murmur64a
from ..util import auto_concurrency
from ..keys import canonical_flat_bytes

__all__ = [
    "exact_dedup_keep_ids",
    "exact_dedup_drop_ids",
    "anti_join_rows_by_id",
    "MinHasher",
    "lsh_candidate_pairs",
    "SimHasher",
    "simhash_candidate_pairs",
    "union_find_components",
    "propagate_components",
    "score_pairs_distributed",
    "minhash_agreement_scorer",
    "minhash_band_floor",
    "band_floor_filter",
    "cosine_scorer",
    "make_exact_jaccard_scorer",
    "minhash_dedup",
    "verify_pairs_exact_jaccard",
    "simhash_dedup",
    "embedding_dedup",
    "semdedup",
    "ngram_jaccard",
    "DRIVER_PAIR_LIMIT",
]

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x + _MIX
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _wire_codec(vtype):
    """(wire_type, to_wire, from_wire) for shipping a payload column
    through a union/exchange.

    Fixed-size-list payloads (minhash signatures, fixed-dim
    embeddings) travel as large_binary on the wire: pa.nulls() for a
    fixed-size list ALLOCATES the full child storage, so a null-padded
    union side ships payload_width bytes of padding PER ROW (measured
    1.04 GB of nulls for 1M pairs × 128 u64 — the exchange cost ~142 s
    at 8M turns). As binary, payload rows carry their raw bytes and
    padded rows carry zero-length strings; consumers reconstruct the
    typed array zero-copy. Other types pass through unchanged."""
    if pa.types.is_fixed_size_list(vtype):
        _W = vtype.list_size
        _vdt = np.dtype(vtype.value_type.to_pandas_dtype())
        _BW = _W * _vdt.itemsize
        wire_type = pa.large_binary()
        _empty_fsl = pa.FixedSizeListArray.from_arrays(
            pa.array(np.empty(0, dtype=_vdt)), _W)

        def _to_wire(col):
            a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
                else col
            if len(a) == 0:
                return pa.array([], type=wire_type)
            flat = np.ascontiguousarray(
                a.flatten().to_numpy(zero_copy_only=False))
            offs = np.arange(0, (len(a) + 1) * _BW, _BW, dtype=np.int64)
            return pa.LargeBinaryArray.from_buffers(
                wire_type, len(a),
                [None, pa.py_buffer(offs), pa.py_buffer(flat.view(np.uint8))])

        def _from_wire(arr):
            a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) \
                else arr
            if len(a) == 0:
                return _empty_fsl
            offs = np.frombuffer(a.buffers()[1], dtype=np.int64,
                                 count=len(a) + 1, offset=a.offset * 8)
            # the zero-copy view assumes dense _BW-byte rows (what
            # _to_wire emits); a sliced / non-dense / null-bearing
            # LargeBinary would misalign every downstream payload —
            # validate and fall back to a safe per-row copy (ADVICE r03)
            if (a.null_count == 0
                    and int(offs[-1] - offs[0]) == len(a) * _BW
                    and bool(np.all(np.diff(offs) == _BW))):
                raw = np.frombuffer(a.buffers()[2], dtype=np.uint8,
                                    count=int(offs[-1] - offs[0]),
                                    offset=int(offs[0]))
            else:
                rows = a.to_pylist()
                bad = [i for i, r in enumerate(rows)
                       if r is None or len(r) != _BW]
                if bad:
                    raise ValueError(
                        f"payload wire row(s) {bad[:5]} are not "
                        f"{_BW}-byte dense binaries")
                raw = np.frombuffer(b"".join(rows), dtype=np.uint8)
            return pa.FixedSizeListArray.from_arrays(
                pa.array(raw.view(_vdt)), _W)
    else:
        wire_type = vtype

        def _to_wire(col):
            a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
                else col
            return a.cast(vtype)

        def _from_wire(arr):
            return arr

    return wire_type, _to_wire, _from_wire


def anti_join_rows_by_id(rows_ds, ids_ds, id_col: str = "doc_id",
                         num_buckets: int = 64):
    """``rows_ds`` minus rows whose ``id_col`` appears in ``ids_ds``
    — the shuffle-tier complement of a drop-set broadcast filter
    (VERDICT r04 item 3: a 40%-duplicate corpus makes the drop set
    tens of GB, too big to ``ray.put``).

    ONE id-hash bucket exchange: both sides land in the same bucket
    (same hash), rows are kept iff no probe id matches in-bucket.
    Payload columns ride wire-packed (fixed-size lists → large_binary
    via :func:`_wire_codec`; probe rows carry empty strings / typed
    zeros — never ``pa.nulls`` padding, which allocates full child
    storage for fixed-size lists and upcasts int group frames), and
    are reconstructed zero-copy after the filter."""
    import pyarrow.compute as pc

    schema = rows_ds.schema()
    fields = list(zip(schema.names, schema.types))
    payload = [(n, t) for n, t in fields if n != id_col]
    codecs = {n: _wire_codec(t) for n, t in payload}

    def tag_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        b = (_splitmix64(ids) % np.uint64(num_buckets)).astype(np.int64)
        cols = {id_col: t.column(id_col)}
        for n, _ in payload:
            cols[n] = codecs[n][1](t.column(n))
        cols["__b"] = pa.array(b)
        cols["__probe"] = pa.array(np.zeros(t.num_rows, dtype=bool))
        return pa.table(cols)

    def tag_probes(t: pa.Table) -> pa.Table:
        u = pc.unique(t.column(id_col).combine_chunks())
        ids = u.to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (_splitmix64(ids) % np.uint64(num_buckets)).astype(np.int64)
        cols = {id_col: u}
        for n, _ in payload:
            wt = codecs[n][0]
            if pa.types.is_large_binary(wt) or pa.types.is_binary(wt):
                cols[n] = pa.array([b""] * len(u), type=wt)
            elif pa.types.is_string(wt) or pa.types.is_large_string(wt):
                cols[n] = pa.array([""] * len(u), type=wt)
            elif pa.types.is_integer(wt) or pa.types.is_floating(wt) \
                    or pa.types.is_boolean(wt):
                cols[n] = pa.array(np.zeros(len(u)), type=wt)
            else:
                cols[n] = pa.nulls(len(u), type=wt)  # cheap: var-size only
        cols["__b"] = pa.array(b)
        cols["__probe"] = pa.array(np.ones(len(u), dtype=bool))
        return pa.table(cols)

    out_cols = [id_col] + [n for n, _ in payload]

    def filter_bucket(t: pa.Table) -> pa.Table:
        probe = t.column("__probe").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        keep = ~probe & ~np.isin(ids, ids[probe])
        return t.filter(pa.array(keep)).select(out_cols)

    filtered = rows_ds.map_batches(tag_rows, batch_format="pyarrow") \
        .union(ids_ds.map_batches(tag_probes, batch_format="pyarrow")) \
        .groupby("__b").map_groups(filter_bucket, batch_format="pyarrow")

    def unpack(t: pa.Table) -> pa.Table:
        cols = {id_col: t.column(id_col)}
        for n, _ in payload:
            cols[n] = codecs[n][2](t.column(n))
        return pa.table(cols)

    return filtered.map_batches(unpack, batch_format="pyarrow")


# ------------------------------------------------------------------ exact
def exact_dedup_keep_ids(ds, text_col: str = "text", id_col: str = "doc_id",
                         num_buckets: int = 64):
    """Keep the smallest id per identical content; the shuffle carries
    only (hash, length, id) rows, never bodies.

    Grouping key is (64-bit content murmur, byte length) — a false merge
    (silently dropping a distinct doc) needs two different texts of
    EQUAL length with colliding 64-bit hashes: P ≈ n²/2⁶⁵ per length
    class, ~3·10⁻⁸ even at 10⁹ same-length docs (ADVICE r01: the
    documented bound; group on the composite rather than the bare hash
    so unequal-length texts can never merge at all).

    Reduction is ONE hash-bucket shuffle + per-bucket lexsort/reduceat
    min — Ray's per-group aggregate costs ~40 µs/group even for the
    built-in Min (measured 29.8 s vs 1.3 s for 2M rows / 1.26M groups
    at 16 cpus); group counts here scale with corpus size, so the
    vectorized path is the only one that survives 100×."""
    import pandas as pd

    def add_hash(t: pa.Table) -> pa.Table:
        data, offsets = canonical_flat_bytes(t.column(text_col))
        h = murmur64a(data, offsets)
        ln = offsets[1:] - offsets[:-1]
        b = (_splitmix64(h) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({id_col: t.column(id_col),
                         "content_hash": pa.array(h.astype(np.int64)),
                         "content_len": pa.array(ln),
                         "__b": pa.array(b)})

    def min_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ch = g["content_hash"].to_numpy()
        cl = g["content_len"].to_numpy()
        di = g[id_col].to_numpy()
        order = np.lexsort((di, cl, ch))
        ch, cl, di = ch[order], cl[order], di[order]
        new_grp = np.r_[True, (ch[1:] != ch[:-1]) | (cl[1:] != cl[:-1])]
        starts = np.nonzero(new_grp)[0]
        return pd.DataFrame({id_col: np.minimum.reduceat(di, starts)
                             if len(di) else di})

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(min_in_bucket, batch_format="pandas")
    )


def exact_dedup_drop_ids(ds, text_col: str = "text", id_col: str = "doc_id",
                         num_buckets: int = 64):
    """The COMPLEMENT of :func:`exact_dedup_keep_ids`: every id that is
    NOT its content group's minimum — i.e. the rows exact dedup removes.

    Same (hash, len) grouping and one bucket exchange; the point is the
    SIZE asymmetry at scale: the keep set is O(corpus) while the drop
    set is O(duplicates), so a broadcast NOT-IN filter over drops stays
    viable (8 bytes/id on the driver) long after a keep-set broadcast
    stops fitting — the curation sink's resumable write depends on the
    filter being a pure per-shard broadcast op."""
    import pandas as pd

    from ..hashing import murmur64a
    from ..keys import canonical_flat_bytes

    def add_hash(t: pa.Table) -> pa.Table:
        data, offsets = canonical_flat_bytes(t.column(text_col))
        h = murmur64a(data, offsets)
        ln = offsets[1:] - offsets[:-1]
        b = (_splitmix64(h) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({id_col: t.column(id_col),
                         "content_hash": pa.array(h.astype(np.int64)),
                         "content_len": pa.array(ln),
                         "__b": pa.array(b)})

    def drops_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ch = g["content_hash"].to_numpy()
        cl = g["content_len"].to_numpy()
        di = g[id_col].to_numpy()
        order = np.lexsort((di, cl, ch))
        ch, cl, di = ch[order], cl[order], di[order]
        new_grp = np.r_[True, (ch[1:] != ch[:-1]) | (cl[1:] != cl[:-1])]
        return pd.DataFrame({id_col: di[~new_grp]})  # all but each group min

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(drops_in_bucket, batch_format="pandas")
    )


# --------------------------------------------------------------- minhash
def _window_hashes(data: np.ndarray, offsets: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Hash every k-byte shingle window (k ≤ 8) of every doc in one shot.

    Equivalent to MurmurHash64A on each window (tail-only path since
    k ≤ 8). Returns (window hashes, per-doc window-count offsets)."""
    assert 1 <= k <= 8
    lens = offsets[1:] - offsets[:-1]
    wcounts = np.maximum(lens - k + 1, 0)
    woff = np.zeros(len(wcounts) + 1, dtype=np.int64)
    np.cumsum(wcounts, out=woff[1:])
    total = int(woff[-1])
    if total == 0:
        return np.empty(0, dtype=np.uint64), woff
    # window start positions in the flat buffer
    base = np.repeat(offsets[:-1], wcounts) + (
        np.arange(total, dtype=np.int64) - np.repeat(woff[:-1], wcounts)
    )
    # hash EVERY flat position once via one contiguous copy of the
    # stride-1 sliding windows, then gather the valid starts — the
    # (total, 8) int64 index matrix this replaces allocated 64 B/window
    # (1.3 GB at 20 MB text) and elementwise-gathered; 2.6× faster warm
    # and ~6× less fresh-page churn (this sandbox faults at ~70 MB/s).
    # Bytes past each window's k-th column are zeroed in both schemes,
    # so padding with zeros (vs capping the gather index) is invisible.
    n = len(data)
    dp = np.zeros(n + 8, dtype=np.uint8)
    dp[:n] = data
    c = np.ascontiguousarray(
        np.lib.stride_tricks.sliding_window_view(dp, 8)[:n])
    if k < 8:
        c[:, k:] = 0
    # murmur64a tail-only round, in place over c's memory
    m = np.uint64(0xC6A4A7935BD1E995)
    h = c.view(np.uint64).ravel()
    h ^= np.uint64(0xADC83B19 ^ ((k * 0xC6A4A7935BD1E995)
                                 & 0xFFFFFFFFFFFFFFFF))
    h *= m
    h ^= h >> np.uint64(47)
    h *= m
    h ^= h >> np.uint64(47)
    return h[base], woff


def _occurrence_expand(wh: np.ndarray, woff: np.ndarray) -> np.ndarray:
    """Integer-weighted multiset → SET reduction (weighted MinHash):
    the i-th within-doc occurrence of a shingle hash h becomes the
    distinct element mix(h, i), so the k-gram MULTISET {g×tf} maps
    injectively to the set {(g,0)..(g,tf−1)}. Set Jaccard of two
    expanded sets is EXACTLY the weighted Jaccard Σ_g min(tf_a,tf_b) /
    Σ_g max(tf_a,tf_b) (Σmax = |A|+|B|−Σmin), so every set-MinHash /
    LSH / verification tier downstream applies unchanged — no ICWS
    float sampling needed for integer weights (Haveliwala/Broder
    rounding construction; cf. Ioffe ICDM'10 §1 for the real-weight
    generalization this deliberately avoids).

    Input/output are aligned with ``woff``: per-doc segments keep their
    positions (the lexsort's primary key ``doc_of`` is already
    nondecreasing), only values within each doc are reordered — and
    MinHash reductions are order-free within a doc."""
    n = len(woff) - 1
    if not len(wh):
        return wh
    doc_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(woff))
    order = np.lexsort((wh, doc_of))
    hs, ds_ = wh[order], doc_of[order]
    new_g = np.r_[True, (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])]
    starts = np.nonzero(new_g)[0]
    seg = np.diff(np.r_[starts, len(hs)])
    occ = (np.arange(len(hs), dtype=np.int64)
           - np.repeat(starts, seg)).astype(np.uint64)
    return _splitmix64(hs ^ (occ * np.uint64(0x9E3779B97F4A7C15)))


class MinHasher:
    """map_batches stage: text → MinHash signature (``num_perms`` × u64)
    over k-byte character shingles.

    Permutations are multiply-shift universal hashes of one strong base
    window hash (Broder resemblance sketches; Li & König's b-bit /
    one-hash literature justifies the construction). Signature column is
    a fixed-size-list<uint64> so downstream banding is zero-copy.

    Actor-pool stage: the permutation constants are built once per actor.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 num_perms: int = 128, shingle_k: int = 5, seed: int = 1,
                 mode: str = "kperm", weighted: bool = False):
        """``mode="kperm"``: classic k independent permutations — O(P·W)
        work per doc, the accuracy baseline. ``mode="oph"``: one-
        permutation hashing with rotation densification (Li, Owen &
        Zhang NIPS'12; Shrivastava's densification) — O(W) work, one
        pass over the shingles regardless of P; the scale default for
        corpus-wide dedup (requires P a power of two).
        ``weighted=True``: signatures estimate the WEIGHTED Jaccard of
        the shingle multisets (tf-weighted) via the occurrence-expansion
        reduction (:func:`_occurrence_expand`) — same cost, the window
        list already carries one row per occurrence."""
        self.text_col = text_col
        self.id_col = id_col
        self.P = num_perms
        self.k = shingle_k
        self.mode = mode
        self.weighted = weighted
        if mode == "oph" and num_perms & (num_perms - 1):
            raise ValueError("oph mode requires num_perms to be a power of two")
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 2**63, size=num_perms, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 2**63, size=num_perms, dtype=np.uint64)

    def _sig_kperm(self, wh, woff, n):
        sig = np.full((n, self.P), np.iinfo(np.uint64).max, dtype=np.uint64)
        nonempty = np.nonzero(woff[1:] > woff[:-1])[0]
        if len(wh):
            red_off = woff[:-1][nonempty]
            for p in range(self.P):
                mixed = wh * self.a[p] + self.b[p]
                sig[nonempty, p] = np.minimum.reduceat(mixed, red_off)
        return sig

    def _sig_oph(self, wh, woff, n):
        MAX = np.iinfo(np.uint64).max
        sig = np.full((n, self.P), MAX, dtype=np.uint64)
        if len(wh):
            pbits = int(np.log2(self.P))
            bins = (wh >> np.uint64(64 - pbits)).astype(np.int64)
            vals = wh * self.a[0] + self.b[0]  # decorrelate value from bin
            doc_of = np.repeat(np.arange(n), woff[1:] - woff[:-1])
            np.minimum.at(sig, (doc_of, bins), vals)
        # rotation densification: an empty bin borrows from the nearest
        # filled bin to its right (circular), offset by the distance so
        # borrowed values stay distinct across bins
        filled = sig != MAX
        any_filled = filled.any(axis=1)
        out = sig.copy()
        for _ in range(self.P):
            empty = out == MAX
            if not empty.any():
                break
            rolled = np.roll(out, -1, axis=1)
            borrow = np.where(rolled == MAX, MAX, rolled + np.uint64(0x9E37))
            out = np.where(empty, borrow, out)
        out[~any_filled] = MAX  # truly empty docs stay empty
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = pc.utf8_lower(batch.column(self.text_col))
        data, offsets = arrow_to_flat_bytes(
            txt.combine_chunks() if isinstance(txt, pa.ChunkedArray) else txt
        )
        wh, woff = _window_hashes(data, offsets, self.k)
        if self.weighted:
            wh = _occurrence_expand(wh, woff)
        n = len(offsets) - 1
        sig = self._sig_oph(wh, woff, n) if self.mode == "oph" else self._sig_kperm(wh, woff, n)
        flat = pa.array(sig.reshape(-1).astype(np.uint64))
        sig_col = pa.FixedSizeListArray.from_arrays(flat, self.P)
        return pa.table({self.id_col: batch.column(self.id_col), "minhash": sig_col})


def _dedupe_pairs_driver(df, reduce_spec: dict):
    """Pandas twin of :func:`_dedupe_pair_rows` for the driver tier:
    when the caller materializes the pair set next anyway (verify →
    union-find), a distributed distinct is one pure-overhead shuffle
    (the r02 ngram-join lesson, applied to every candidate generator)."""
    import pandas as pd

    cols = ["id_a", "id_b"] + list(reduce_spec)
    if "id_a" not in df.columns:  # empty dataset loses its schema
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    named = {}
    for out_col, (op, in_col) in reduce_spec.items():
        named[out_col] = ("id_a", "size") if op == "count" else (in_col, op)
    out = df.groupby(["id_a", "id_b"], as_index=False).agg(**named)
    return out[cols]


def lsh_candidate_pairs(sig_ds, id_col: str = "doc_id", num_bands: int = 32,
                        sig_col: str = "minhash", max_bucket_size: int = 1000,
                        num_salts: int = 256, dedupe: str = "shuffle",
                        screen_threshold: float | None = None,
                        defer_above: int = 16):
    """Signatures → LSH banding → candidate pairs with estimated Jaccard.

    The distributed shape follows the bucket-exchange LSH join of
    "Implementing Distributed Similarity Joins using Locality Sensitive
    Hashing" (EDBT 2022): band buckets are the exchange key, pairs are
    emitted within buckets only, never all-pairs.

    Emits (band, band_hash, id) rows, groups by bucket, and yields pairs
    within each bucket. Buckets larger than ``max_bucket_size`` would
    explode quadratically (a bucket of 100k identical docs = 5e9 pairs);
    such a bucket is truncated to its ``max_bucket_size`` smallest ids
    and an explicit ``truncated_bucket`` marker row is emitted so the
    cap is never silent — downstream treats the surviving clique as one
    duplicate group, which is semantically what a mega-bucket is. Every
    non-truncated bucket emits its FULL clique — the marker flags exactly
    the buckets whose pair emission is incomplete, so n_bands-based
    filters (band_floor_filter) stay output-preserving by keeping
    flagged pairs unconditionally.

    Pair emission groups on the salted key ``(band, bucket % num_salts)``
    — the salt is a pure function of the bucket, so a bucket never spans
    two salt cells and the emitted pair set is identical to a plain
    per-band grouping, but parallelism is ``num_bands × num_salts``
    (scales with data) and no single ``map_groups`` task ever holds more
    than ~``1/num_salts`` of the corpus's bucket rows.

    ``screen_threshold`` (signature-agreement est, ONLY valid when the
    downstream verifier keeps exactly est ≥ that threshold): buckets
    bigger than ``defer_above`` skip clique emission and are instead
    exactly verified in place by :func:`_screen_deferred_buckets`, which
    emits only their est-passing pairs (flagged to bypass n_bands
    filters) — output-identical to full-clique emission + est-verify,
    without materializing O(m²) pair rows for template mega-buckets.
    ``defer_above`` trades clique pair rows (m(m−1)/2 × 24 B) against
    screen member rows (m × sig bytes): 16 measured best at sf0.1
    (buckets 17+ carry 2.6× more pairs than members; below that the
    signature wire outweighs the pair rows — 8 measured WORSE).
    """
    buckets = sig_ds.map_batches(
        _make_minhash_band_rows(id_col, sig_col, num_bands, num_salts),
        batch_format="pyarrow",
    )

    # Groups are (band, salt) cells, not individual buckets: per-(band,
    # bucket) map_groups would spawn a Python call per bucket (≈ n_docs ×
    # bands tiny groups); instead each cell task segments its sorted
    # bucket column with numpy and emits pairs only for multi-member
    # buckets.
    pairs = buckets.groupby(["band", "salt"]).map_groups(
        _make_band_pair_emitter(
            id_col, max_bucket_size,
            defer_above=defer_above if screen_threshold is not None else None),
        batch_format="pandas",
    )

    if screen_threshold is not None:
        pairs = pairs.materialize()
        deferred = pairs.map_batches(
            lambda t: t.filter(pc.greater_equal(
                t.column("truncated_bucket"), pa.scalar(_MARK_DEFER))),
            batch_format="pyarrow")
        pairs = pairs.map_batches(
            lambda t: t.filter(pc.less(
                t.column("truncated_bucket"), pa.scalar(_MARK_DEFER))),
            batch_format="pyarrow")
        n_def = deferred.count()
        if n_def > 0:
            pairs = pairs.union(_screen_deferred_buckets(
                deferred, sig_ds, id_col, sig_col, screen_threshold,
                n_deferred=n_def))

    if dedupe == "raw":  # caller picks the dedupe tier after counting
        return pairs
    # dedupe pairs found in multiple bands; keep the truncation marker
    return _dedupe_pair_rows(pairs, {
        "n_bands": ("count", None),
        "truncated_bucket": ("max", "truncated_bucket"),
    })


def collapse_exact_signatures(sig_ds, id_col: str = "doc_id",
                              sig_col: str = "minhash",
                              num_buckets: int = 64,
                              broadcast_threshold: int = 50_000_000):
    """Collapse docs with IDENTICAL signature vectors before LSH banding.

    Mass-duplicate corpora put hundreds of byte-identical signatures in
    every band bucket, so full-clique pair emission pays O(m²) per
    bucket for edges that are est = 1.0 by construction (a 479-copy
    cluster at sf0.1 emitted ~1.8M raw pair rows alone). Signature-
    agreement similarity depends ONLY on the two vectors, so collapsing
    each identical-signature group to its min-id representative plus
    (rep, member) star edges is exactly output-preserving for verified
    components at any threshold t ≤ 1: star edges have est = 1.0
    (identical vectors) so they always pass verification; any cross-
    group pair's estimate equals its representatives' estimate; and
    component vertex sets — hence min-id labels — are unchanged
    (equality locked by test_collapse_exact_signatures_equivalent).

    The group key is a 128-bit signature hash (two independent splitmix
    folds): a false merge needs a 128-bit collision, P ≈ n²/2¹²⁹ —
    negligible at 10¹⁰ docs. The exchange carries 32-byte rows; the
    representative filter broadcasts the DROP set (non-representative
    members, O(exact-duplicates) — the exact_dedup_drop_ids asymmetry).
    Past ``broadcast_threshold`` dropped ids (a 40%-duplicate 100 TB
    corpus makes the drop set tens of GB — VERDICT r04 item 3) it
    falls back to :func:`anti_join_rows_by_id`: one id-hash exchange,
    signatures wire-packed, no driver/broadcast materialization
    (equality locked by test_collapse_forced_anti_join_fallback).

    Returns ``(reps_ds, edges_ds, n_edges)``: ``reps_ds`` is ``sig_ds``
    minus non-representative members; ``edges_ds`` has
    (id_a=rep, id_b=member) rows, or None when ``n_edges == 0`` (then
    ``reps_ds`` is ``sig_ds`` unchanged — no shuffle, no broadcast)."""
    import pandas as pd
    import ray

    def sig_hash_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).combine_chunks()
        sig = np.asarray(t.column(sig_col).combine_chunks().flatten()
                         .to_numpy(zero_copy_only=False)) \
            .reshape(t.num_rows, -1).astype(np.uint64)
        h1 = np.full(t.num_rows, 0x243F6A8885A308D3, dtype=np.uint64)
        h2 = np.full(t.num_rows, 0x13198A2E03707344, dtype=np.uint64)
        for j in range(sig.shape[1]):
            c = sig[:, j]
            h1 = _splitmix64(h1 ^ c)
            h2 = _splitmix64(h2 ^ _splitmix64(c ^ np.uint64(2 * j + 1)))
        return pa.table({
            id_col: ids,
            "h1": pa.array(h1.astype(np.int64)),
            "h2": pa.array(h2.astype(np.int64)),
            "__b": pa.array((h1 % np.uint64(num_buckets)).astype(np.int64)),
        })

    def emit_edges(g: pd.DataFrame) -> pd.DataFrame:
        h1 = g["h1"].to_numpy()
        h2 = g["h2"].to_numpy()
        di = g[id_col].to_numpy()
        order = np.lexsort((di, h2, h1))
        h1, h2, di = h1[order], h2[order], di[order]
        new = np.r_[True, (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])]
        starts = np.nonzero(new)[0]
        seg = np.diff(np.r_[starts, len(di)])
        rep = np.repeat(di[starts], seg)  # segment min (ids sorted)
        mask = rep != di
        return pd.DataFrame({"id_a": rep[mask].astype(np.int64),
                             "id_b": di[mask].astype(np.int64)})

    edges_ds = sig_ds.select_columns([id_col, sig_col]) \
        .map_batches(sig_hash_rows, batch_format="pyarrow") \
        .groupby("__b").map_groups(emit_edges, batch_format="pandas") \
        .materialize()
    n_edges = edges_ds.count()
    if n_edges == 0:
        return sig_ds, None, 0

    if n_edges > broadcast_threshold:
        drops = edges_ds.select_columns(["id_b"]) \
            .map_batches(lambda t: t.rename_columns([id_col]),
                         batch_format="pyarrow")
        reps = anti_join_rows_by_id(sig_ds, drops, id_col, num_buckets)
        return reps, edges_ds, n_edges

    drop = np.sort(edges_ds.select_columns(["id_b"]).to_pandas()["id_b"]
                   .to_numpy().astype(np.int64))
    drop_ref = ray.put(drop)

    def keep_reps(t: pa.Table) -> pa.Table:
        dr = ray.get(drop_ref)
        d = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.minimum(np.searchsorted(dr, d), len(dr) - 1)
        return t.filter(pa.array(dr[pos] != d))

    reps = sig_ds.map_batches(keep_reps, batch_format="pyarrow")
    return reps, edges_ds, n_edges


def _dedupe_pair_rows(pairs_ds, reduce_spec: dict, num_buckets: int = 64):
    """Distinct (id_a, id_b) with per-pair reductions, as a bucketed
    shuffle + vectorized within-bucket segmentation.

    ``reduce_spec``: {out_col: ("count", None) | ("min"|"max", in_col)}.

    Ray's generic ``groupby([id_a, id_b]).aggregate(...)`` pays per-GROUP
    Python accumulator overhead — 428k candidate-pair groups took 126 s
    at sf0.1 where this takes 0.5 s (measured; identical output). One
    shuffle on a 64-valued pair-hash bucket, then lexsort + reduceat
    inside each bucket."""
    import pandas as pd

    def add_bucket(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t.column("id_b").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _splitmix64(a ^ _splitmix64(b))
        return t.append_column(
            "__pb", pa.array((h % np.uint64(num_buckets)).astype(np.int64))
        )

    def dedupe(g: pd.DataFrame) -> pd.DataFrame:
        a = g["id_a"].to_numpy()
        b = g["id_b"].to_numpy()
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        new = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        starts = np.nonzero(new)[0]
        out = {"id_a": a[starts], "id_b": b[starts]}
        for out_col, (op, in_col) in reduce_spec.items():
            if op == "count":
                out[out_col] = np.diff(np.r_[starts, len(a)]).astype(np.int64)
            else:
                v = g[in_col].to_numpy()[order]
                red = np.minimum.reduceat if op == "min" else np.maximum.reduceat
                out[out_col] = red(v, starts)
        return pd.DataFrame(out)

    return pairs_ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__pb").map_groups(dedupe, batch_format="pandas")


def _make_minhash_band_rows(id_col: str, sig_col: str, num_bands: int,
                            num_salts: int):
    """Vectorized signature → (band, bucket, salt, id) explosion."""

    def band_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sig = np.asarray(t.column(sig_col).combine_chunks().flatten().to_numpy(
            zero_copy_only=False)).reshape(len(ids), -1).astype(np.uint64)
        P = sig.shape[1]
        r = P // num_bands
        out_band, out_hash, out_id = [], [], []
        for b in range(num_bands):
            chunk = sig[:, b * r : (b + 1) * r]
            h = np.zeros(len(ids), dtype=np.uint64)
            for j in range(r):  # mix band columns into one 64-bit bucket hash
                h = _splitmix64(h ^ chunk[:, j])
            out_band.append(np.full(len(ids), b, dtype=np.int32))
            out_hash.append(h.astype(np.int64))
            out_id.append(ids)
        bucket = np.concatenate(out_hash)
        return pa.table({
            "band": pa.array(np.concatenate(out_band)),
            "bucket": pa.array(bucket),
            "salt": pa.array((bucket % num_salts).astype(np.int32)),
            id_col: pa.array(np.concatenate(out_id)),
        })

    return band_rows


#: ``truncated_bucket`` marker values in emitted rows. 0/1 rows are
#: pairs (1 = incomplete-emission bucket: keep through n_bands filters);
#: ≥DEFERRED rows are (member, bucket_key) deferral records consumed by
#: :func:`_screen_deferred_buckets`, never pairs.
_MARK_TRUNC = 1
_MARK_DEFER = 2


def _make_band_pair_emitter(id_col: str, max_bucket_size: int,
                            defer_above: int | None = None):
    """Vectorized within-band pair emission: sort by (bucket, id), find
    bucket boundaries, loop only over multi-member buckets (≈ number of
    duplicate groups, not corpus size).

    With ``defer_above`` set (the screened path), buckets larger than it
    emit ONE row per member — (id_a=member, id_b=64-bit bucket key,
    marker ≥ _MARK_DEFER) — instead of their O(m²) clique; the screen
    stage verifies those buckets in place and emits only passing pairs.
    An earlier version star-linearized buckets >64 members; that
    silently suppressed (x,y) rows for non-min pairs, which (a)
    undercounted n_bands so band_floor_filter could drop a pair with
    est ≥ t, and (b) lost (x,y) edges whose min-id links fail
    verification, splitting components in ALL tiers (ADVICE r03;
    test_minhash_band_floor_output_preserving's 80-member cluster).
    Without ``defer_above``, every non-truncated bucket emits its FULL
    clique; only >``max_bucket_size`` mega-buckets are coarsened (kept
    ids star-linked + flagged, documented semantics)."""
    import pandas as pd

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        b = g["bucket"].to_numpy()
        ids = g[id_col].to_numpy()
        band = np.uint64(int(g["band"].iloc[0]))  # one band per group
        order = np.lexsort((ids, b))
        b, ids = b[order], ids[order]
        starts = np.nonzero(np.r_[True, b[1:] != b[:-1]])[0]
        ends = np.r_[starts[1:], len(b)]
        out_a, out_b, out_t = [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            sub = ids[s:e]
            truncated = len(sub) > max_bucket_size
            if truncated:
                sub = sub[:max_bucket_size]
            if defer_above is not None and len(sub) > defer_above:
                # globally-unique 64-bit key for (band, bucket): a key
                # collision would merge two buckets in the screen stage,
                # which only ADDS exactly-verified pairs — harmless at
                # P ≈ buckets²/2⁶⁴
                key = _splitmix64(
                    b[s : s + 1].astype(np.uint64)
                    ^ _splitmix64(np.array([band + np.uint64(1)],
                                           dtype=np.uint64))
                ).astype(np.int64)[0]
                out_a.append(sub)
                out_b.append(np.full(len(sub), key, dtype=np.int64))
                out_t.append(np.full(len(sub),
                                     _MARK_DEFER + int(truncated),
                                     dtype=np.int64))
                continue
            if truncated:
                # star pattern (min id ↔ rest) keeps the pathological
                # mega-bucket linear while preserving connectivity;
                # its pairs carry the flag so they bypass n_bands
                # filters unconditionally
                a = np.zeros(len(sub) - 1, dtype=np.int64)
                bb = np.arange(1, len(sub), dtype=np.int64)
            else:
                a, bb = np.triu_indices(len(sub), k=1)
            out_a.append(sub[a])
            out_b.append(sub[bb])
            out_t.append(np.full(len(a), int(truncated), dtype=np.int64))
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "truncated_bucket": pd.Series([], dtype="int64")})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "truncated_bucket": np.concatenate(out_t)})

    return emit


def _screen_rows_against_matrix(ids: np.ndarray, bk: np.ndarray,
                                gids: np.ndarray, mat: np.ndarray,
                                threshold: float) -> "pa.Table":
    """Per-bucket tiled signature-agreement screen of (member, bucket)
    rows against a sorted (gids, mat) signature matrix; emits only
    est ≥ threshold pairs, flagged past n_bands filters. Shared by the
    driver and distributed-broadcast screen tiers (identical output by
    construction)."""
    order = np.lexsort((ids, bk))
    bk, ids = bk[order], ids[order]
    rows = np.searchsorted(gids, ids)  # every member was gathered
    P = mat.shape[1]
    need = int(np.ceil(threshold * P - 1e-9))
    starts = np.nonzero(np.r_[True, bk[1:] != bk[:-1]])[0] \
        if len(bk) else np.empty(0, np.int64)
    ends = np.r_[starts[1:], len(bk)] if len(bk) else starts
    out_a, out_b = [], []
    for s0, e0 in zip(starts, ends):
        m = e0 - s0
        if m < 2:
            continue
        sub_ids = ids[s0:e0]
        bm = mat[rows[s0:e0]]
        for i0 in range(0, m, 128):  # tile: ≤128×m×P bools
            blk = (bm[i0: i0 + 128, None, :] == bm[None, :, :]) \
                .sum(axis=2)
            ii, jj = np.nonzero(blk >= need)
            gi = ii + i0
            keep = gi < jj
            out_a.append(sub_ids[gi[keep]])
            out_b.append(sub_ids[jj[keep]])
    a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
    b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
    return pa.table({
        "id_a": pa.array(a.astype(np.int64)),
        "id_b": pa.array(b.astype(np.int64)),
        "truncated_bucket": pa.array(np.ones(len(a), dtype=np.int64))})


def _screen_deferred_buckets(deferred_ds, sig_ds, id_col: str, sig_col: str,
                             threshold: float, num_buckets: int = 64,
                             bloom_bits: int = 1 << 22,
                             broadcast_limit: int = 100_000,
                             n_deferred: int | None = None):
    """Exact in-place verification of big LSH buckets: attach member
    signatures via one Bloom-pruned hash exchange, then compute the
    FULL pairwise signature-agreement matrix inside each bucket task
    and emit only pairs with est ≥ ``threshold``.

    This replaces O(m²) pair-row materialization for buckets deferred
    by the emitter (template families put thousands of DISTINCT
    signatures in one bucket — full-clique emission produced 11.2M raw
    pair rows at sf0.1 where the verified set is 83). Emitting the
    est-passing subset of the clique is exactly output-preserving for
    any downstream that keeps only est ≥ threshold pairs (which the
    estimate-verify tiers do by definition); emitted rows carry the
    floor-bypass flag because their n_bands counts are incomplete.
    The same mega-cluster recurs in ~every band, so the screen recomputes
    it once per band — pure vectorized compute, no pair shuffle; tile
    chunking bounds each agreement block to ~16 MB.

    ``deferred_ds`` rows: (id_a=member, id_b=bucket_key, marker). NOT
    sound for exact-TEXT verification (see minhash_band_floor): equal
    signatures ≠ equal texts — callers gate on verify="estimate".
    Returns pair rows (id_a, id_b, truncated_bucket=1).

    Tiering: ≤ ``broadcast_limit`` deferral rows take the DRIVER tier —
    one distributed gather of the member signatures, then the same
    per-bucket tiled agreement locally (the whole screen compute is
    ~10⁸ element ops at sf0.1) — replacing the Bloom pass + union + two
    exchanges with ONE dataset execution (each exchange is ~1 s of
    fixed overhead at any sf). Past the limit the exchange path runs
    unchanged (template mega-corpora at 100 TB)."""
    import pandas as pd
    import ray

    from .joins import _build_key_bloom

    if n_deferred is None:
        n_deferred = deferred_ds.count()
    dd = None
    if n_deferred <= broadcast_limit:
        dd = deferred_ds.to_pandas()
        # driver tier gated on the actual tiled agreement WORK
        # (Σ m(m−1)/2 over buckets), not the row count — conv-scale
        # deferred sets (few huge buckets, 10⁷⁺ comparisons in 100k
        # rows) belong on the exchange tier. A middle tier that
        # distributed this same per-bucket screen against a broadcast
        # signature matrix MEASURED WORSE than the exchange tier
        # (conv sf0.1: 22-23 s vs 14-16 s — the ~100 MB gather +
        # broadcast costs more than the exchange it saves); two tiers
        # only, by measurement.
        sizes = dd.groupby("id_b").size().to_numpy()
        if int((sizes * (sizes - 1) // 2).sum()) > 1_000_000:
            dd = None
    if dd is not None:
        t = _gather_rows_by_id(sig_ds, id_col, set(dd["id_a"]))
        gids = t.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        mat = np.asarray(t.column(sig_col).combine_chunks().flatten()
                         .to_numpy(zero_copy_only=False)) \
            .reshape(len(gids), -1)
        gorder = np.argsort(gids)
        gids, mat = gids[gorder], mat[gorder]
        tbl = _screen_rows_against_matrix(
            dd["id_a"].to_numpy(dtype=np.int64),
            dd["id_b"].to_numpy(dtype=np.int64),
            gids, mat, threshold)
        import ray.data

        return ray.data.from_arrow(tbl)

    B = np.uint64(num_buckets)

    def member_ids(t: pa.Table) -> pa.Table:
        return pa.table({"cid": t.column("id_a").combine_chunks()
                         .cast(pa.int64())})

    bloom_ref = ray.put(_build_key_bloom(
        deferred_ds.map_batches(member_ids, batch_format="pyarrow"),
        "cid", bloom_bits))

    def prune(t: pa.Table) -> pa.Table:
        bf = ray.get(bloom_ref)
        return t.filter(pa.array(bf.contains_batch(t.column(id_col))))

    def sig_to_wire(col) -> tuple[pa.Array, int]:
        a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        flat = np.ascontiguousarray(np.asarray(
            a.flatten().to_numpy(zero_copy_only=False)).astype(np.uint64))
        bw = (len(flat) // len(a)) * 8 if len(a) else 0
        offs = np.arange(0, (len(a) + 1) * bw, bw, dtype=np.int64) \
            if bw else np.zeros(len(a) + 1, dtype=np.int64)
        return pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), len(a),
            [None, pa.py_buffer(offs), pa.py_buffer(flat.view(np.uint8))])

    def _kb(k_np: np.ndarray) -> pa.Array:
        return pa.array((_splitmix64(k_np.astype(np.uint64)) % B)
                        .astype(np.int64))

    def tag_member(t: pa.Table) -> pa.Table:
        m = t.column("id_a").combine_chunks().cast(pa.int64())
        return pa.table({
            "k": m,
            "bkey": t.column("id_b").combine_chunks().cast(pa.int64()),
            "v": pa.array([b""] * t.num_rows, type=pa.large_binary()),
            "s": pa.array(np.zeros(t.num_rows, dtype=bool)),
            "__b": _kb(m.to_numpy(zero_copy_only=False)),
        })

    def tag_sig(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).combine_chunks().cast(pa.int64())
        return pa.table({
            "k": ids,
            "bkey": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            "v": sig_to_wire(t.column(sig_col)),
            "s": pa.array(np.ones(t.num_rows, dtype=bool)),
            "__b": _kb(ids.to_numpy(zero_copy_only=False)),
        })

    def attach(g: pa.Table) -> pa.Table:
        s = g.column("s").to_numpy(zero_copy_only=False)
        lab, ed = g.filter(pa.array(s)), g.filter(pa.array(~s))
        keys = lab.column("k").to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        keys_s = keys[order]
        ek = ed.column("k").to_numpy(zero_copy_only=False)
        if len(keys_s):
            pos = np.minimum(np.searchsorted(keys_s, ek), len(keys_s) - 1)
            hit = keys_s[pos] == ek
        else:
            hit = np.zeros(len(ek), dtype=bool)
            pos = np.zeros(len(ek), dtype=np.int64)
        ed = ed.filter(pa.array(hit))
        v = lab.column("v").combine_chunks().take(
            pa.array(order[pos[hit]], type=pa.int64()))
        bk = ed.column("bkey").combine_chunks()
        return pa.table({
            "k": ed.column("k").combine_chunks(),
            "bkey": bk,
            "v": v,
            "__b2": _kb(bk.to_numpy(zero_copy_only=False)),
        })

    def screen(g: pa.Table) -> pa.Table:
        bk = g.column("bkey").to_numpy(zero_copy_only=False)
        ids = g.column("k").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, bk))
        bk, ids = bk[order], ids[order]
        v = g.column("v").combine_chunks().take(
            pa.array(order, type=pa.int64()))
        offs = np.frombuffer(v.buffers()[1], dtype=np.int64,
                             count=len(v) + 1, offset=v.offset * 8)
        raw = np.frombuffer(v.buffers()[2], dtype=np.uint8)
        starts = np.nonzero(np.r_[True, bk[1:] != bk[:-1]])[0]
        ends = np.r_[starts[1:], len(bk)]
        out_a, out_b = [], []
        for s0, e0 in zip(starts, ends):
            m = e0 - s0
            if m < 2:
                continue
            bw = int(offs[s0 + 1] - offs[s0])
            P = bw // 8
            mat = raw[int(offs[s0]): int(offs[e0])].view(np.uint64) \
                .reshape(m, P)
            sub = ids[s0:e0]
            need = int(np.ceil(threshold * P - 1e-9))
            for i0 in range(0, m, 128):  # tile: ≤128×m×P bools ≈ 16 MB
                blk = (mat[i0: i0 + 128, None, :] == mat[None, :, :]) \
                    .sum(axis=2)
                ii, jj = np.nonzero(blk >= need)
                gi = ii + i0
                keep = gi < jj
                out_a.append(sub[gi[keep]])
                out_b.append(sub[jj[keep]])
        if not out_a:
            return pa.table({
                "id_a": pa.array([], type=pa.int64()),
                "id_b": pa.array([], type=pa.int64()),
                "truncated_bucket": pa.array([], type=pa.int64())})
        a = np.concatenate(out_a)
        return pa.table({
            "id_a": pa.array(a),
            "id_b": pa.array(np.concatenate(out_b)),
            "truncated_bucket": pa.array(np.ones(len(a), dtype=np.int64))})

    sigs_pruned = sig_ds.select_columns([id_col, sig_col]) \
        .map_batches(prune, batch_format="pyarrow")
    return deferred_ds.map_batches(tag_member, batch_format="pyarrow") \
        .union(sigs_pruned.map_batches(tag_sig, batch_format="pyarrow")) \
        .groupby("__b").map_groups(attach, batch_format="pyarrow") \
        .groupby("__b2").map_groups(screen, batch_format="pyarrow")


def _gather_rows_by_id(ds, id_col: str, want_ids) -> "pa.Table":
    """Distributed gather: broadcast the (small) candidate id set, filter
    inside map_batches, collect only matching rows — the corpus itself
    never reaches the driver."""
    import ray

    want = np.array(sorted(int(x) for x in set(want_ids)), dtype=np.int64)
    want_ref = ray.put(want)

    # plain task fn (no actor-pool startup): ray.get of the broadcast
    # id set is plasma-local after the first fetch per worker
    def filt(t: pa.Table) -> pa.Table:
        w = ray.get(want_ref)
        if not len(w):
            return t.slice(0, 0)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(w, ids), len(w) - 1)
        return t.filter(pa.array(w[pos] == ids))

    batches = ds.map_batches(filt, batch_format="pyarrow",
                             batch_size=None).to_arrow_refs()
    import pyarrow as _pa

    tables = [ray.get(r) for r in batches]
    tables = [t for t in tables if t.num_rows]
    return _pa.concat_tables(tables) if tables else None


def estimate_pair_jaccard(pairs_df, sig_ds, id_col: str = "doc_id",
                          sig_col: str = "minhash"):
    """Estimated Jaccard = fraction of agreeing minhash coordinates.
    Candidate signatures are gathered with a distributed broadcast-filter
    (candidates ≪ corpus; the signature set itself never leaves the
    object store)."""
    want = set(pairs_df["id_a"]).union(pairs_df["id_b"])
    t = _gather_rows_by_id(sig_ds, id_col, want)
    out = pairs_df.copy()
    if t is None or not len(pairs_df):
        out["est_jaccard"] = 0.0
        return out
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    arr = np.asarray(t.column(sig_col).combine_chunks().flatten().to_numpy(
        zero_copy_only=False)).reshape(len(ids), -1)
    order = np.argsort(ids)
    ids_s, arr = ids[order], arr[order]

    def rows_of(col):
        v = pairs_df[col].to_numpy(dtype=np.int64)
        pos = np.minimum(np.searchsorted(ids_s, v), len(ids_s) - 1)
        return pos, ids_s[pos] == v

    ia, oka = rows_of("id_a")
    ib, okb = rows_of("id_b")
    # PER-COLUMN gathers instead of (n_pairs × P) row-matrix gathers:
    # materializing both sides as big matrices pays first-touch page
    # faults on 10⁸-byte buffers every call (measured 4-15 s for 417k
    # pairs; np.take(out=) also hits numpy's slow buffered path). One
    # pass per signature column gathers m elements from a ~40 KB
    # cache-resident column and accumulates the agreement count —
    # 0.25 s for the same input, cold or warm, no large allocations.
    P = arr.shape[1] if arr.ndim == 2 else 1
    arrT = np.ascontiguousarray(arr.T.reshape(P, -1))
    cnt = np.zeros(len(ia), dtype=np.int16)  # P ≤ 32767 agreements
    for j in range(P):
        col = arrT[j]
        cnt += col[ia] == col[ib]
    est = cnt / P
    est[~(oka & okb)] = 0.0
    out["est_jaccard"] = est
    return out


# --------------------------------------------------------------- simhash
class SimHasher:
    """map_batches stage: text → 64-bit SimHash (Charikar 2002) over
    word-token hashes; near-duplicates differ in few bits."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = pc.utf8_lower(batch.column(self.text_col))
        toks = pc.split_pattern_regex(txt, r"\W+")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = toks.flatten()
        toff = toks.offsets.to_numpy().astype(np.int64)
        data, offsets = arrow_to_flat_bytes(flat)
        wh = murmur64a(data, offsets)
        # drop empty tokens (regex split artifacts)
        tok_lens = offsets[1:] - offsets[:-1]
        n_docs = len(toff) - 1
        votes = np.zeros((n_docs, 64), dtype=np.int64)
        if len(wh):
            doc_of = np.repeat(np.arange(n_docs), toff[1:] - toff[:-1])
            keep = tok_lens > 0
            wh_k, doc_k = wh[keep], doc_of[keep]
            for j in range(64):
                bit = ((wh_k >> np.uint64(j)) & np.uint64(1)).astype(np.int64) * 2 - 1
                np.add.at(votes[:, j], doc_k, bit)
        bits = (votes > 0).astype(np.uint64)
        sim = np.zeros(n_docs, dtype=np.uint64)
        for j in range(64):
            sim |= bits[:, j] << np.uint64(j)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "simhash": pa.array(sim.astype(np.int64)),
        })


def simhash_candidate_pairs(sim_ds, id_col: str = "doc_id", max_hamming: int = 3,
                            num_salts: int = 256, dedupe: str = "shuffle"):
    """Bucket by 4 × 16-bit bands (pigeonhole: any pair within hamming
    ≤ 3 shares at least one intact band), then verify exact hamming.

    Grouped on the salted ``(band, salt)`` key (salt = bucket %
    num_salts, a pure function of the bucket) so pair emission
    parallelism is 4 × num_salts, not 4 — see ``lsh_candidate_pairs``.
    """
    import pandas as pd

    def band_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sim = t.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        bands, buckets, oids, sims = [], [], [], []
        for b in range(4):
            bands.append(np.full(len(ids), b, dtype=np.int32))
            buckets.append(((sim >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64))
            oids.append(ids)
            sims.append(sim.astype(np.int64))
        bucket = np.concatenate(buckets)
        return pa.table({
            "band": pa.array(np.concatenate(bands)),
            "bucket": pa.array(bucket),
            "salt": pa.array((bucket % num_salts).astype(np.int32)),
            id_col: pa.array(np.concatenate(oids)),
            "simhash": pa.array(np.concatenate(sims)),
        })

    buckets = sim_ds.map_batches(band_rows, batch_format="pyarrow")

    def emit_band(g: pd.DataFrame) -> pd.DataFrame:
        # one task per (band, salt) cell; buckets segmented vectorized
        # (see _make_band_pair_emitter for the rationale)
        b = g["bucket"].to_numpy()
        ids = g[id_col].to_numpy()
        sims = g["simhash"].to_numpy().astype(np.uint64)
        order = np.lexsort((ids, b))
        b, ids, sims = b[order], ids[order], sims[order]
        starts = np.nonzero(np.r_[True, b[1:] != b[:-1]])[0]
        ends = np.r_[starts[1:], len(b)]
        out_a, out_b, out_h = [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            sub_i, sub_s = ids[s:e], sims[s:e]
            a, bb = np.triu_indices(len(sub_i), k=1)
            x = sub_s[a] ^ sub_s[bb]
            ham = np.zeros(len(x), dtype=np.int64)
            for j in range(64):
                ham += ((x >> np.uint64(j)) & np.uint64(1)).astype(np.int64)
            keep = ham <= max_hamming
            out_a.append(sub_i[a][keep])
            out_b.append(sub_i[bb][keep])
            out_h.append(ham[keep])
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "hamming": np.concatenate(out_h)})

    pairs = buckets.groupby(["band", "salt"]).map_groups(emit_band, batch_format="pandas")
    if dedupe == "raw":
        return pairs
    return _dedupe_pair_rows(pairs, {"hamming": ("min", "hamming")})


# --------------------------------------------------- components / driver
def union_find_components(pairs_df, ids=None) -> dict[int, int]:
    """Union-find over candidate pairs → {id: component root (min id)}."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs_df["id_a"], pairs_df["id_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    out = {x: find(x) for x in list(parent)}
    if ids is not None:
        for x in ids:
            out.setdefault(int(x), int(x))
    return out



def _bucket_min_by_node(ds_in, key_col: str, val_col: str, num_buckets: int):
    """(key, val) rows → one (node=key, label=min val) row per key, via
    a hash-bucket shuffle + per-bucket lexsort/reduceat — Ray's
    per-group aggregate pays ~40 µs/GROUP even for the built-in Min,
    and node counts here scale with the pair set."""
    import pandas as pd

    def ab(t: pa.Table) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (_splitmix64(k) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({key_col: t.column(key_col),
                         val_col: t.column(val_col),
                         "__mb": pa.array(b)})

    def mb(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key_col].to_numpy(dtype=np.int64)
        v = g[val_col].to_numpy(dtype=np.int64)
        order = np.lexsort((v, k))
        k, v = k[order], v[order]
        starts = np.nonzero(np.r_[True, k[1:] != k[:-1]])[0]
        return pd.DataFrame({
            "node": k[starts],
            "label": np.minimum.reduceat(v, starts) if len(v)
            else v})

    return ds_in.map_batches(ab, batch_format="pyarrow") \
        .groupby("__mb").map_groups(mb, batch_format="pandas")


# single-node streaming-executor safety knobs (see the livelock
# note inside propagate_components); kept module-level so stress
# runs can coarsen blocks without code edits
_EDGE_BLOCK_CAP = 96
_LABEL_BLOCK_CAP = 96
# warn when ONE round's union+sort working set approaches the cluster
# object-store budget: past it Ray 2.49's streaming executor does not
# degrade, it LIVELOCKS (scheduler thread spins in resource
# accounting, workers idle, zero output — measured at 1e8 edges /
# ~19 GB rounds vs a 38 GiB default store; BASELINE.md round-5 table).
# A loud early warning with the fix beats a silent hang.
_STORE_WARN_FRACTION = 0.5


def propagate_components(pairs_ds, rounds: int | None = None,
                         num_buckets: int = 64,
                         stats: dict | None = None):
    """Distributed min-label propagation for candidate-pair sets too
    large for driver-side union-find.

    Each round joins the (node, peer) edge set against the current
    (node, label) table with a bucketed integer hash join — both sides
    get ``bucket = key % num_buckets``, bucket groups relabel peers via
    a vectorized ``np.searchsorted`` lookup — then takes the per-node
    min. Labels never touch the driver; convergence is detected with a
    scalar ``sum(label)`` aggregate (labels are monotone non-increasing,
    so an unchanged sum means a fixed point).

    Every round ALSO feeds the label table back as jump edges
    ``(v → label(v))`` so a node adopts ``label(label(v))`` — pointer
    jumping, which collapses long chains in O(log diameter) rounds
    (the hash-to-min idea of Rastogi et al., ICDE'13) instead of
    O(diameter). ``rounds=None`` (default) runs to the fixed point —
    always terminating, since integer labels are bounded below and
    strictly decrease in sum until convergence; an explicit ``rounds``
    caps the iteration for tests.
    """
    import pandas as pd

    def symmetrize(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays([t.column("id_a").combine_chunks().cast(pa.int64()),
                                      t.column("id_b").combine_chunks().cast(pa.int64())]),
            "peer": pa.concat_arrays([t.column("id_b").combine_chunks().cast(pa.int64()),
                                      t.column("id_a").combine_chunks().cast(pa.int64())]),
        })

    # the other side's unused field is padded with ZEROS, not nulls:
    # an int64 column containing nulls becomes float64 in the pandas
    # map_groups frame, silently corrupting ids above 2^53 (e.g. the
    # 63-bit hashed doc ids conv-level dedup produces); the padded
    # fields are never read on their padded side
    def edge_bucket(t: pa.Table) -> pa.Table:
        peer = t.column("peer").to_numpy(zero_copy_only=False)
        b = (peer.astype(np.uint64) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({
            "node": t.column("node"), "peer": t.column("peer"),
            "label": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            "__b": pa.array(b),
            "__side": pa.array(np.zeros(t.num_rows, dtype=bool)),
        })

    def label_bucket(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy(zero_copy_only=False)
        b = (node.astype(np.uint64) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({
            "node": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            "peer": t.column("node"),  # join key: label's node == edge's peer
            "label": t.column("label"),
            "__b": pa.array(b),
            "__side": pa.array(np.ones(t.num_rows, dtype=bool)),
        })

    def jump_bucket(t: pa.Table) -> pa.Table:
        # pointer-jump edges (v → label(v)): v reads label(label(v))
        lab = t.column("label").to_numpy(zero_copy_only=False)
        b = (lab.astype(np.uint64) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({
            "node": t.column("node"),
            "peer": t.column("label"),
            "label": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            "__b": pa.array(b),
            "__side": pa.array(np.zeros(t.num_rows, dtype=bool)),
        })

    def relabel_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["__side"]]
        ed = g[~g["__side"]]
        keys = lab["peer"].to_numpy(dtype=np.int64)
        vals = lab["label"].to_numpy(dtype=np.int64)
        order = np.argsort(keys)
        keys, vals = keys[order], vals[order]
        peer = ed["peer"].to_numpy(dtype=np.int64)
        out = peer.copy()  # default: unknown peer labels itself
        if len(keys):
            pos = np.searchsorted(keys, peer)
            pos = np.minimum(pos, len(keys) - 1)
            hit = keys[pos] == peer
            out[hit] = vals[pos[hit]]
        return pd.DataFrame({"node": ed["node"].to_numpy(dtype=np.int64),
                             "label": out})

    edges = pairs_ds.map_batches(symmetrize, batch_format="pyarrow") \
        .map_batches(edge_bucket, batch_format="pyarrow").materialize()
    # Bound the per-round union's TOTAL input block count: Ray's
    # streaming executor livelocks when a multi-input union feeding a
    # sort holds too many queued bundles — the scheduling thread goes
    # CPU-bound in per-tick resource accounting (process_completed_
    # tasks / ExecutionResources.subtract) and produces no output for
    # tens of minutes (observed at 1e8 edges: 526 union-input blocks
    # spin, 292 stream fine; faulthandler stacks in BASELINE.md notes).
    # Caps: edges ≤ 96 blocks here, labels ≤ 96 below → union inputs
    # ≤ 96 + 2·96 = 288, under the known-good count, with blocks still
    # ≥ ~1M rows so per-task vectorization stays efficient.
    if edges.num_blocks() > _EDGE_BLOCK_CAP:
        edges = edges.repartition(_EDGE_BLOCK_CAP).materialize()
    labels = _bucket_min_by_node(edges, "node", "peer", num_buckets)
    labels = labels.map_batches(
        lambda t: pa.table({"node": t.column("node"),
                            "label": pc.min_element_wise(t.column("node"), t.column("label"))}),
        batch_format="pyarrow",
    ).materialize()
    prev_sum = labels.sum("label")
    # per-round coalesce target: labels are 16-byte rows, one per node,
    # constant across rounds — ~1M rows per block, floor 2, cap 512
    n_nodes = labels.count()
    try:
        import ray as _ray

        store = float(_ray.cluster_resources().get(
            "object_store_memory", 0.0))
        # per-round union = symmetrized edge rows + 2 label tables,
        # ~41 B/row wired, roughly doubled in flight across the two
        # sorts of a round
        est = 2.0 * 41.0 * (edges.count() + 2.0 * n_nodes)
        if store and est > _STORE_WARN_FRACTION * store:
            import warnings

            warnings.warn(
                f"propagate_components round working set ~{est/2**30:.1f}"
                f" GiB vs object store {store/2**30:.1f} GiB: Ray's "
                "streaming executor can LIVELOCK (not degrade) when a "
                "union+sort round exceeds its memory budget — raise "
                "object_store_memory (with spill disk to match) or "
                "shard the edge set; see BASELINE.md round-5 notes",
                RuntimeWarning, stacklevel=2)
    except Exception:
        pass  # resource introspection is advisory only
    label_blocks = int(max(2, min(_LABEL_BLOCK_CAP,
                                   n_nodes // 1_000_000 + 2)))
    labels = labels.repartition(label_blocks).materialize()
    r = 0
    while rounds is None or r < rounds:
        r += 1
        tagged = labels.map_batches(label_bucket, batch_format="pyarrow")
        jumps = labels.map_batches(jump_bucket, batch_format="pyarrow")
        nxt = _bucket_min_by_node(
            edges.union(jumps).union(tagged)
            .groupby("__b").map_groups(relabel_bucket, batch_format="pandas"),
            "node", "label", num_buckets,
        )
        # coalesce to a FIXED block count before materializing: the
        # label table feeds two map_batches branches next round, and
        # groupby/map_groups preserve input block counts, so without
        # this the per-round block count (and wall time) doubles —
        # 12→28→60→…→1020 blocks by round 7 on a 200-node chain.
        nxt = nxt.map_batches(
            lambda t: pa.table({"node": t.column("node"),
                                "label": pc.min_element_wise(t.column("node"), t.column("label"))}),
            batch_format="pyarrow",
        ).repartition(label_blocks).materialize()
        new_sum = nxt.sum("label")
        labels = nxt
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    if stats is not None:
        # observability for the O(log diameter) + bounded-block-count
        # claims (VERDICT r04 item 7): rounds includes the final
        # no-change confirmation round
        stats["rounds"] = r
        stats["label_blocks"] = label_blocks
        stats["n_nodes"] = n_nodes
    return labels


def synthetic_component_edges(n_comps: int, chain_len: int,
                              seed: int = 7):
    """Deterministic chain+star component mix plus one long chain —
    the :func:`propagate_components` stress harness (VERDICT r04
    item 7). Fully vectorized generation. Returns
    ``(edges_df(id_a, id_b), expected_df(node, label))`` where the
    expected label of every node is its component's min id."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    sizes = rng.integers(2, 7, size=n_comps)
    starts = np.zeros(n_comps, dtype=np.int64)
    np.cumsum(sizes[:-1], out=starts[1:])
    total = int(sizes.sum())
    comp_of = np.repeat(np.arange(n_comps), sizes)
    idx = np.arange(total, dtype=np.int64)
    offset = idx - starts[comp_of]
    is_last = offset == sizes[comp_of] - 1
    star = (np.arange(n_comps) % 2 == 0)
    chain_mask = ~is_last & ~star[comp_of]
    a1, b1 = idx[chain_mask], idx[chain_mask] + 1
    star_mask = (offset > 0) & star[comp_of]
    a2, b2 = starts[comp_of[star_mask]], idx[star_mask]
    base = total
    a3 = base + np.arange(chain_len - 1, dtype=np.int64)
    b3 = a3 + 1
    edges = pd.DataFrame({
        "id_a": np.concatenate([a1, a2, a3]),
        "id_b": np.concatenate([b1, b2, b3])})
    expected = pd.DataFrame({
        "node": np.concatenate([idx, base + np.arange(chain_len)]),
        "label": np.concatenate([
            starts[comp_of],
            np.full(chain_len, base, dtype=np.int64)])})
    return edges, expected


# --------------------------------------- distributed pair verification
# Past this many candidate pairs the near-dup drivers switch from the
# driver path (pairs → pandas, vectorized verify, union-find) to the
# fully distributed one (bucket-exchange verify + min-label components).
# Below it the driver path is both correct and faster (one Ray round
# trip instead of four shuffles); the crossover is conservative — 500k
# pairs ≈ 8 MB of pair rows, far under driver memory, while the
# distributed path's fixed cost is ~2-4 s of exchanges.
DRIVER_PAIR_LIMIT = 500_000


def minhash_agreement_scorer(va: pa.Array, vb: pa.Array) -> np.ndarray:
    """Estimated Jaccard = fraction of agreeing minhash coordinates
    (same statistic as :func:`estimate_pair_jaccard`, batched)."""
    a = np.asarray(va.flatten().to_numpy(zero_copy_only=False)).reshape(len(va), -1)
    b = np.asarray(vb.flatten().to_numpy(zero_copy_only=False)).reshape(len(vb), -1)
    return (a == b).sum(axis=1) / a.shape[1]


def cosine_scorer(va: pa.Array, vb: pa.Array) -> np.ndarray:
    """Exact cosine over two gathered embedding columns — one matrix op
    per bucket task (VERDICT r02 item 2: replaces the per-pair Python
    loop)."""
    a = np.asarray(va.flatten().to_numpy(zero_copy_only=False)) \
        .reshape(len(va), -1).astype(np.float64)
    b = np.asarray(vb.flatten().to_numpy(zero_copy_only=False)) \
        .reshape(len(vb), -1).astype(np.float64)
    num = (a * b).sum(axis=1)
    den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1) + 1e-300
    return num / den


def _char_gram_set(k: int):
    def gram_set(text: str):
        return {text[i: i + k] for i in range(max(0, len(text) - k + 1))}
    return gram_set


def _word_gram_set(k: int):
    def gram_set(text: str):
        w = text.split(" ")
        return {tuple(w[i: i + k]) for i in range(max(0, len(w) - k + 1))}
    return gram_set


def _expand_multiset(grams) -> set:
    """Multiset → set of (gram, occurrence-index): the exact-verify twin
    of :func:`_occurrence_expand`. Set Jaccard over two expanded sets
    IS the weighted Jaccard Σmin(tf)/Σmax(tf) of the multisets."""
    cnt: dict = {}
    out = set()
    for g in grams:
        c = cnt.get(g, 0)
        cnt[g] = c + 1
        out.add((g, c))
    return out


def _char_gram_multiset(k: int):
    def gram_set(text: str):
        return _expand_multiset(
            text[i: i + k] for i in range(max(0, len(text) - k + 1)))
    return gram_set


def _word_gram_multiset(k: int):
    def gram_set(text: str):
        w = text.split(" ")
        return _expand_multiset(
            tuple(w[i: i + k]) for i in range(max(0, len(w) - k + 1)))
    return gram_set


def make_exact_jaccard_scorer(gram_set):
    """Exact set-Jaccard scorer over two gathered TEXT columns. Gram
    sets are memoized by text within the bucket task (docs recur across
    pairs); empty∩empty = 1.0 matches :func:`ngram_jaccard`."""

    def score(va: pa.Array, vb: pa.Array) -> np.ndarray:
        memo: dict[str, frozenset] = {}

        def gs(x):
            x = x or ""
            s = memo.get(x)
            if s is None:
                s = gram_set(x)
                memo[x] = s
            return s

        out = np.empty(len(va), dtype=np.float64)
        for i, (x, y) in enumerate(zip(va.to_pylist(), vb.to_pylist())):
            sa, sb = gs(x), gs(y)
            out[i] = len(sa & sb) / len(sa | sb) if (sa or sb) else 1.0
        return out

    return score


def score_pairs_distributed(pairs_ds, payload_ds, id_col: str,
                            payload_col: str, scorer,
                            score_col: str = "score",
                            num_buckets: int = 64,
                            bloom_bits: int = 1 << 22,
                            score_dtype=np.float64):
    """Distributed candidate-pair verification: attach each side's
    payload (signature / embedding / text) via two hash-bucket
    exchanges, score vectorized inside bucket tasks, never touching the
    driver — the 100×-scale replacement for the gather-to-driver verify
    dicts (VERDICT r02 item 2).

    ``pairs_ds``: Dataset with int64 ``id_a``/``id_b``. ``payload_ds``:
    Dataset with (``id_col``, ``payload_col``). ``scorer(payload_a,
    payload_b) -> float64 array`` receives two row-aligned Arrow arrays.

    The payload side is Bloom-pruned to candidate ids BEFORE either
    exchange, so the shuffles carry O(candidates) payload rows, not the
    corpus (false positives ride through and are dropped by the exact
    key match inside the bucket). Pairs whose id has no payload row are
    dropped — they cannot be verified. Returns a Dataset of
    (id_a, id_b, score_col)."""
    import ray

    from .joins import _build_key_bloom

    B = np.uint64(num_buckets)

    def pair_ids(t: pa.Table) -> pa.Table:
        a = t.column("id_a").combine_chunks().cast(pa.int64())
        b = t.column("id_b").combine_chunks().cast(pa.int64())
        return pa.table({"cid": pa.concat_arrays([a, b])})

    bloom_ref = ray.put(_build_key_bloom(
        pairs_ds.map_batches(pair_ids, batch_format="pyarrow"),
        "cid", bloom_bits))

    def prune(t: pa.Table) -> pa.Table:
        bf = ray.get(bloom_ref)
        return t.filter(pa.array(bf.contains_batch(t.column(id_col))))

    payload = payload_ds.select_columns([id_col, payload_col]) \
        .map_batches(prune, batch_format="pyarrow").materialize()
    # a fragmented payload (many tiny blocks, e.g. one per input shard)
    # multiplies every downstream task count through the two exchanges
    # — coalesce to the bucket count before tagging
    if payload.num_blocks() > 2 * num_buckets:
        payload = payload.repartition(num_buckets).materialize()
    vtype = dict(zip(payload.schema().names,
                     payload.schema().types))[payload_col]

    wire_type, _to_wire, _from_wire = _wire_codec(vtype)

    def _kb(k_np: np.ndarray) -> pa.Array:
        return pa.array((_splitmix64(k_np.astype(np.uint64)) % B)
                        .astype(np.int64))

    def tag_payload(t: pa.Table) -> pa.Table:
        k = t.column(id_col).combine_chunks().cast(pa.int64())
        return pa.table({
            "k": k,
            "o": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            "v": _to_wire(t.column(payload_col)),
            "s": pa.array(np.ones(t.num_rows, dtype=bool)),
            "__b": _kb(k.to_numpy(zero_copy_only=False)),
        })

    def tag_pairs(t: pa.Table) -> pa.Table:
        k = t.column("id_a").combine_chunks().cast(pa.int64())
        o = t.column("id_b").combine_chunks().cast(pa.int64())
        return pa.table({
            "k": k, "o": o,
            "v": pa.nulls(t.num_rows, type=wire_type),  # never read
            "s": pa.array(np.zeros(t.num_rows, dtype=bool)),
            "__b": _kb(k.to_numpy(zero_copy_only=False)),
        })

    def _attach(g: pa.Table):
        """Split a bucket into payload/pair rows, searchsorted-join the
        payload onto each pair row by exact key; returns (pair rows with
        a match, row-aligned payload values)."""
        s = g.column("s").to_numpy(zero_copy_only=False)
        lab, ed = g.filter(pa.array(s)), g.filter(pa.array(~s))
        keys = lab.column("k").to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        keys_s = keys[order]
        ek = ed.column("k").to_numpy(zero_copy_only=False)
        if len(keys_s):
            pos = np.minimum(np.searchsorted(keys_s, ek), len(keys_s) - 1)
            hit = keys_s[pos] == ek
        else:
            pos = np.zeros(len(ek), dtype=np.int64)
            hit = np.zeros(len(ek), dtype=bool)
        ed = ed.filter(pa.array(hit))
        v = lab.column("v").combine_chunks().take(
            pa.array(order[pos[hit]], type=pa.int64()))
        return ed, v

    def attach_a(g: pa.Table) -> pa.Table:
        ed, v = _attach(g)
        k = ed.column("o").combine_chunks()   # re-key on id_b for phase 2
        return pa.table({
            "k": k,
            "o": ed.column("k").combine_chunks(),  # carry id_a
            "v": v,
            "s": pa.array(np.zeros(len(v), dtype=bool)),
            "__b": _kb(k.to_numpy(zero_copy_only=False)),
        })

    def score_b(g: pa.Table) -> pa.Table:
        ed, vb = _attach(g)
        va = ed.column("v").combine_chunks()
        sc = scorer(_from_wire(va), _from_wire(vb)) if len(vb) \
            else np.empty(0, dtype=score_dtype)
        # every bucket (including empty ones) must emit ONE dtype for
        # the union schema; integer scorers (packed containment
        # triples) must not round-trip through float64
        sc = np.asarray(sc).astype(score_dtype)
        return pa.table({
            "id_a": ed.column("o").combine_chunks(),
            "id_b": ed.column("k").combine_chunks(),
            score_col: pa.array(sc),
        })

    tagged_payload = payload.map_batches(tag_payload, batch_format="pyarrow")
    mid = pairs_ds.select_columns(["id_a", "id_b"]) \
        .map_batches(tag_pairs, batch_format="pyarrow") \
        .union(tagged_payload) \
        .groupby("__b").map_groups(attach_a, batch_format="pyarrow")
    return mid.union(tagged_payload) \
        .groupby("__b").map_groups(score_b, batch_format="pyarrow")


def _components_frame(labels_ds, id_col: str):
    """(node, label) Dataset → the dedup drivers' standard pandas
    {id, component} result frame."""
    import pandas as pd

    df = labels_ds.to_pandas()
    if len(df) == 0:
        return pd.DataFrame({id_col: [], "component": []})
    return df.rename(columns={"node": id_col, "label": "component"}) \
        .sort_values(id_col).reset_index(drop=True) \
        .astype({id_col: "int64", "component": "int64"})


def minhash_band_floor(num_perms: int, num_bands: int,
                       threshold: float) -> int:
    """Sound candidate pre-filter for signature-AGREEMENT verification
    (the bands and the scorer read the same ``num_perms`` components):
    a pair passing est = agree/P ≥ t disagrees on at most
    P − ceil(t·P) components, each of which can break at most one
    band, so it must fully collide in ≥ B − (P − ceil(t·P)) bands —
    and a fully-equal band always emits the pair (equal rows ⇒ equal
    band hash, incomplete-emission buckets aside). Filtering candidates
    to n_bands ≥ this floor before the payload-attach exchanges is
    therefore exactly output-preserving; callers must keep
    ``truncated_bucket``-flagged pairs unconditionally (the flag marks
    buckets whose pair emission is incomplete, which undercounts
    n_bands; all other buckets emit their full clique). The
    epsilon only ever LOWERS the floor (keeps more), so float error
    cannot break soundness. Returns 1 when the bound is vacuous
    (e.g. the 32×4 t≈0.5 default). Does NOT apply to exact-text
    verification — there the scorer reads different evidence."""
    import math

    agree_min = math.ceil(threshold * num_perms - 1e-9)
    return max(1, num_bands - (num_perms - agree_min))


def band_floor_filter(pairs_ds, floor_b: int):
    """Apply :func:`minhash_band_floor` to deduped pair rows
    (n_bands / truncated_bucket columns), keeping truncated buckets."""
    if floor_b <= 1:
        return pairs_ds

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.or_(
            pc.greater_equal(t.column("n_bands"), pa.scalar(floor_b)),
            pc.cast(t.column("truncated_bucket"), pa.bool_())))

    return pairs_ds.map_batches(keep, batch_format="pyarrow")


def _resolve_components(verified_pairs_ds, id_col: str):
    """Verified pairs Dataset → {id, component}. Re-tiers on the
    VERIFIED count (the module-docstring contract): at ≤
    ``DRIVER_PAIR_LIMIT`` verified pairs the frame gathers to the
    driver for vectorized union-find (one Ray round trip beats the
    O(log diameter) propagate rounds); past it, distributed min-label
    propagation (labels never touch the driver; the returned frame is
    the RESULT set — O(duplicate docs), not O(corpus)). Both tiers
    produce identical components (root = component min id)."""
    import pandas as pd

    verified_pairs_ds = verified_pairs_ds.materialize()
    n = verified_pairs_ds.count()
    if n == 0:
        return pd.DataFrame({id_col: [], "component": []})
    if n <= DRIVER_PAIR_LIMIT:
        comp = union_find_components(
            verified_pairs_ds.select_columns(["id_a", "id_b"]).to_pandas())
        return pd.DataFrame(
            {id_col: list(comp), "component": [comp[k] for k in comp]}
        ).sort_values(id_col).reset_index(drop=True) \
            .astype({id_col: "int64", "component": "int64"})
    # run to the fixed point (pointer jumping makes that O(log
    # diameter) rounds; LSH clusters are near-cliques anyway)
    return _components_frame(
        propagate_components(verified_pairs_ds), id_col)


# ------------------------------------------------------------ end-to-end
def verify_pairs_exact_jaccard(pairs_df, ds, text_col="text", id_col="doc_id",
                               k: int = 5, gram_set=None):
    """Exact character-k-gram Jaccard for candidate pairs: texts gathered
    via the distributed broadcast-filter (only candidates reach the
    driver), then set Jaccard per pair. ``gram_set`` overrides the
    default char-k-gram set builder (e.g. :func:`_char_gram_multiset`
    for weighted/multiset Jaccard)."""
    gs_fn = gram_set or _char_gram_set(k)
    want = set(pairs_df["id_a"]).union(pairs_df["id_b"])
    t = _gather_rows_by_id(ds.select_columns([id_col, text_col]), id_col, want)
    grams: dict = {}
    if t is not None:
        for i, x in zip(t.column(id_col).to_pylist(), t.column(text_col).to_pylist()):
            grams[int(i)] = gs_fn(x or "")
    empty: frozenset = frozenset()
    out = pairs_df.copy()
    jac = []
    for a, b in zip(pairs_df["id_a"], pairs_df["id_b"]):
        sa = grams.get(int(a), empty)
        sb = grams.get(int(b), empty)
        jac.append(len(sa & sb) / len(sa | sb) if (sa or sb) else 1.0)
    out["jaccard"] = jac
    return out


def minhash_dedup(ds, text_col="text", id_col="doc_id", num_perms=128,
                  shingle_k=5, num_bands=32, threshold=0.7,
                  verify: str = "estimate", mode: str = "oph",
                  components: str = "auto",
                  driver_pair_limit: int = DRIVER_PAIR_LIMIT,
                  weighted: bool = False):
    """Full near-dup pipeline → pandas {id, component} for verified dups.

    ``verify="estimate"`` uses signature-agreement Jaccard (no re-read of
    text); ``verify="exact"`` computes exact k-gram Jaccard on candidate
    texts.

    ``weighted=True`` switches BOTH the signatures and the exact verify
    to WEIGHTED (tf-multiset) k-gram Jaccard via the occurrence-
    expansion reduction (:func:`_occurrence_expand` /
    :func:`_char_gram_multiset`) — a doc and its self-concatenation
    share ~all grams as SETS (J≈1) but only half the MASS (weighted
    J≈0.5); weighted mode tells boilerplate-repetition apart from true
    near-duplication. Every tier (collapse, banding, floor, screen,
    distributed verify, components) applies unchanged because the
    expansion is a plain set-Jaccard reduction.

    ``components``: ``"auto"`` (default) takes the driver path —
    candidate pairs → pandas, vectorized verify, union-find — while the
    pair count is ≤ ``driver_pair_limit``, and otherwise the fully
    distributed one: :func:`score_pairs_distributed` verify (bucket
    exchanges, payloads never reach the driver) feeding
    :func:`propagate_components` min-label CC. ``"driver"`` /
    ``"distributed"`` force a path. Both produce identical components
    (root = component min id; locked by equality tests)."""
    import pandas as pd

    sigs = ds.map_batches(
        MinHasher, fn_constructor_args=(text_col, id_col, num_perms, shingle_k),
        fn_constructor_kwargs={"mode": mode, "weighted": weighted},
        batch_format="pyarrow", concurrency=auto_concurrency(),
    ).materialize()
    # collapse identical-signature groups before banding (exactly
    # output-preserving for signature-agreement verification — see
    # collapse_exact_signatures; NOT applied under verify="exact", where
    # equal signatures don't imply equal k-gram Jaccard of the texts)
    if verify == "estimate":
        reps, exact_edges, n_exact = collapse_exact_signatures(
            sigs, id_col, "minhash")
    else:
        reps, exact_edges, n_exact = sigs, None, 0
    # raw (band-duplicated) pair rows: the dedupe tier is picked AFTER
    # counting — on the driver tier the distinct would be a pure-
    # overhead shuffle right before a to_pandas (ngram-join lesson).
    # Estimate verification screens mega-buckets in place (emits only
    # est ≥ threshold pairs — exactly what verification keeps).
    raw = lsh_candidate_pairs(
        reps, id_col, num_bands, dedupe="raw",
        screen_threshold=threshold if verify == "estimate" else None,
    ).materialize()
    n_pairs = raw.count()  # band-inflated upper bound on distinct pairs
    if n_pairs == 0 and n_exact == 0:
        return pd.DataFrame({id_col: [], "component": []})
    if n_pairs == 0:  # only exact-signature duplicates
        return _resolve_components(exact_edges, id_col)
    if components == "distributed" or (components == "auto"
                                       and n_pairs + n_exact
                                       > driver_pair_limit):
        pairs_ds = _dedupe_pair_rows(raw, {
            "n_bands": ("count", None),
            "truncated_bucket": ("max", "truncated_bucket"),
        })
        if verify == "exact":
            gs = _char_gram_multiset(shingle_k) if weighted \
                else _char_gram_set(shingle_k)
            scored = score_pairs_distributed(
                pairs_ds, ds.select_columns([id_col, text_col]), id_col,
                text_col, make_exact_jaccard_scorer(gs),
                "jaccard")
            col = "jaccard"
        else:
            # provably output-preserving candidate cut before the
            # payload-attach exchanges (see minhash_band_floor)
            pairs_ds = band_floor_filter(
                pairs_ds,
                minhash_band_floor(num_perms, num_bands, threshold))
            scored = score_pairs_distributed(
                pairs_ds, reps, id_col, "minhash",
                minhash_agreement_scorer, "est_jaccard")
            col = "est_jaccard"
        verified_ds = scored.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column(col),
                                                pa.scalar(threshold))),
            batch_format="pyarrow")
        if n_exact:
            verified_ds = verified_ds.select_columns(["id_a", "id_b"]) \
                .union(exact_edges)
        return _resolve_components(verified_ds, id_col)
    pairs = _dedupe_pairs_driver(raw.to_pandas(), {
        "n_bands": ("count", None),
        "truncated_bucket": ("max", "truncated_bucket"),
    })
    if verify == "exact":
        pairs = verify_pairs_exact_jaccard(
            pairs, ds, text_col, id_col, shingle_k,
            gram_set=_char_gram_multiset(shingle_k) if weighted else None)
        verified = pairs[pairs["jaccard"] >= threshold]
    else:
        pairs = estimate_pair_jaccard(pairs, reps, id_col)
        verified = pairs[pairs["est_jaccard"] >= threshold]
    if n_exact:
        verified = pd.concat([verified[["id_a", "id_b"]],
                              exact_edges.to_pandas()], ignore_index=True)
    comp = union_find_components(verified)
    return pd.DataFrame(
        {id_col: list(comp), "component": [comp[k] for k in comp]}
    ).sort_values(id_col).reset_index(drop=True)


def simhash_dedup(ds, text_col="text", id_col="doc_id", max_hamming=3,
                  components: str = "auto",
                  driver_pair_limit: int = DRIVER_PAIR_LIMIT):
    """SimHash near-dup components. Pairs are hamming-verified inside
    the band tasks already; past ``driver_pair_limit`` the component
    resolution runs distributed (:func:`propagate_components`) instead
    of driver union-find — see :func:`minhash_dedup`."""
    import pandas as pd

    sims = ds.map_batches(SimHasher, fn_constructor_args=(text_col, id_col),
                          batch_format="pyarrow", concurrency=auto_concurrency())
    raw = simhash_candidate_pairs(sims, id_col, max_hamming,
                                  dedupe="raw").materialize()
    n_pairs = raw.count()  # band-inflated upper bound
    if n_pairs == 0:  # empty corpus / no candidates: no columns either
        return pd.DataFrame({id_col: [], "component": []})
    if components == "distributed" or (components == "auto"
                                       and n_pairs > driver_pair_limit):
        return _resolve_components(
            _dedupe_pair_rows(raw, {"hamming": ("min", "hamming")}), id_col)
    comp = union_find_components(
        _dedupe_pairs_driver(raw.to_pandas(), {"hamming": ("min", "hamming")}))
    return pd.DataFrame(
        {id_col: list(comp), "component": [comp[k] for k in comp]}
    ).sort_values(id_col).reset_index(drop=True)


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact character-k-gram Jaccard (the verifier for candidate pairs)."""
    sa = {text_a[i : i + k] for i in range(max(0, len(text_a) - k + 1))}
    sb = {text_b[i : i + k] for i in range(max(0, len(text_b) - k + 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def embedding_dedup(ds, vec_col="embedding", id_col="vec_id",
                    threshold=0.95, num_planes=64, seed=3,
                    components: str = "auto",
                    driver_pair_limit: int = DRIVER_PAIR_LIMIT):
    """Embedding near-dup: random-hyperplane LSH (sign sketch) buckets →
    exact cosine verify within buckets. The sketch is 64 bits/vector, so
    the shuffle moves (bucket, id, bits) rows, not vectors; exact verify
    touches only candidate vectors. Past ``driver_pair_limit`` pairs the
    verify runs as a distributed bucket-exchange matrix op and the
    components via min-label propagation (see :func:`minhash_dedup`);
    below it, candidates gather to the driver and cosine is one chunked
    matrix op (never a per-pair loop)."""
    import pandas as pd

    first = ds.take_batch(1, batch_format="pyarrow")
    dim = len(first[vec_col][0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, num_planes))

    import ray

    planes_ref = ray.put(planes)

    class SignSketch:
        def __init__(self):
            self.planes = ray.get(planes_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            emb = np.asarray(
                t.column(vec_col).combine_chunks().flatten().to_numpy(zero_copy_only=False)
            ).reshape(t.num_rows, -1).astype(np.float64)
            proj = emb @ self.planes
            bits = (proj > 0).astype(np.uint64)
            sig = np.zeros(len(emb), dtype=np.uint64)
            for j in range(bits.shape[1]):
                sig |= bits[:, j] << np.uint64(j)
            norm = np.linalg.norm(emb, axis=1)
            return pa.table({
                id_col: t.column(id_col),
                "sig": pa.array(sig.astype(np.int64)),
            })

    sigs = ds.map_batches(SignSketch, batch_format="pyarrow",
                          concurrency=auto_concurrency())

    num_salts = 256

    def band_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sig = t.column("sig").to_numpy(zero_copy_only=False).astype(np.uint64)
        bands, buckets, oids = [], [], []
        for b in range(4):
            bands.append(np.full(len(ids), b, dtype=np.int32))
            buckets.append(((sig >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64))
            oids.append(ids)
        bucket = np.concatenate(buckets)
        return pa.table({"band": pa.array(np.concatenate(bands)),
                         "bucket": pa.array(bucket),
                         "salt": pa.array((bucket % num_salts).astype(np.int32)),
                         id_col: pa.array(np.concatenate(oids))})

    buckets = sigs.map_batches(band_rows, batch_format="pyarrow")

    raw = buckets.groupby(["band", "salt"]).map_groups(
        _make_band_pair_emitter(id_col, max_bucket_size=1000),
        batch_format="pandas",
    ).materialize()
    n_pairs = raw.count()  # band-inflated upper bound
    if n_pairs == 0:
        return pd.DataFrame({id_col: [], "component": []})
    if components == "distributed" or (components == "auto"
                                       and n_pairs > driver_pair_limit):
        pairs_ds = _dedupe_pair_rows(raw, {"n": ("count", None)})
        scored = score_pairs_distributed(
            pairs_ds, ds.select_columns([id_col, vec_col]), id_col, vec_col,
            cosine_scorer, "cosine")
        verified_ds = scored.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("cosine"),
                                                pa.scalar(threshold))),
            batch_format="pyarrow")
        return _resolve_components(verified_ds, id_col)

    pairs = _dedupe_pairs_driver(raw.to_pandas(), {"n": ("count", None)})
    # exact cosine verify on candidates (distributed broadcast-filter
    # gather — only candidate vectors reach the driver), scored as ONE
    # chunked matrix op (64k-pair chunks reuse the allocator pool; see
    # estimate_pair_jaccard's first-touch rationale)
    want = set(pairs["id_a"]).union(pairs["id_b"])
    t = _gather_rows_by_id(ds, id_col, want)
    cos = np.zeros(len(pairs), dtype=np.float64)
    if t is not None and t.num_rows:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        emb = np.asarray(
            t.column(vec_col).combine_chunks().flatten().to_numpy(zero_copy_only=False)
        ).reshape(t.num_rows, -1).astype(np.float64)
        order = np.argsort(ids)
        ids_s, emb = ids[order], emb[order]

        def rows_of(col):
            v = pairs[col].to_numpy(dtype=np.int64)
            pos = np.minimum(np.searchsorted(ids_s, v), len(ids_s) - 1)
            return pos, ids_s[pos] == v

        ia, oka = rows_of("id_a")
        ib, okb = rows_of("id_b")
        step = 65536
        for s in range(0, len(ia), step):
            e = min(s + step, len(ia))
            A, Bm = emb[ia[s:e]], emb[ib[s:e]]
            cos[s:e] = (A * Bm).sum(axis=1) / (
                np.linalg.norm(A, axis=1) * np.linalg.norm(Bm, axis=1) + 1e-300)
        cos[~(oka & okb)] = 0.0
    pairs = pairs.copy()
    pairs["cosine"] = cos
    verified = pairs[pairs["cosine"] >= threshold]
    comp = union_find_components(verified)
    return pd.DataFrame(
        {id_col: list(comp), "component": [comp[k] for k in comp]}
    ).sort_values(id_col).reset_index(drop=True)


# ---------------------------------------------- n-gram Jaccard similarity join
def _expand_or_dedup_token_rows(h, doc_idx, n_docs, weighted: bool):
    """Shared tail of the gram-row emitters: lexsort (doc, hash), then
    either keep DISTINCT (doc, hash) rows with n = per-doc distinct
    count (set semantics), or occurrence-expand duplicates into
    distinct (hash, occ) tokens with n = per-doc TOTAL gram count
    (multiset/weighted semantics — set machinery downstream then
    computes weighted Jaccard exactly; see :func:`_occurrence_expand`).
    Returns (tokens int64-safe u64 masked to 63 bits, doc_idx, sizes
    per doc)."""
    order = np.lexsort((h, doc_idx))
    hs, ds_ = h[order], doc_idx[order]
    new_g = np.r_[True, (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])]
    if weighted:
        starts = np.nonzero(new_g)[0]
        seg = np.diff(np.r_[starts, len(hs)])
        occ = (np.arange(len(hs), dtype=np.int64)
               - np.repeat(starts, seg)).astype(np.uint64)
        hs = _splitmix64(hs ^ (occ * np.uint64(0x9E3779B97F4A7C15))) \
            & np.uint64(0x7FFFFFFFFFFFFFFF)
        sizes = np.bincount(ds_, minlength=n_docs)
    else:
        hs, ds_ = hs[new_g], ds_[new_g]
        sizes = np.bincount(ds_, minlength=n_docs)
    return hs, ds_, sizes


def _char_gram_rows(text_col: str, id_col: str, k: int,
                    weighted: bool = False):
    """map_batches fn: doc → one row per DISTINCT character-k-gram
    (``weighted=True``: per occurrence-expanded gram, multiset
    semantics — see :func:`_expand_or_dedup_token_rows`).

    Grams are CHARACTER windows (UTF-32 codepoints, matching Python
    slicing and SQL ``substr`` semantics), hashed to 63-bit tokens
    (63 so downstream Ray sorts — signed int64 — agree with numpy
    unsigned orderings, see CLAUDE.md). Output columns: ``token``
    (int64), id_col, ``n`` (the doc's distinct-gram count — carried on
    every row so prefix selection and length filtering never need a
    second lookup)."""

    def rows(t: pa.Table) -> pa.Table:
        texts = pc.fill_null(t.column(text_col), "").to_pylist()
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = "".join(texts)
        cps = np.frombuffer(flat.encode("utf-32-le"), dtype=np.uint32)
        lens = np.fromiter((len(s) for s in texts), dtype=np.int64,
                           count=len(texts))
        offsets = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        wcounts = np.maximum(lens - k + 1, 0)
        woff = np.zeros(len(wcounts) + 1, dtype=np.int64)
        np.cumsum(wcounts, out=woff[1:])
        total = int(woff[-1])
        empty = pa.table({"token": pa.array([], type=pa.int64()),
                          id_col: pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64())})
        if total == 0:
            return empty
        base = np.repeat(offsets[:-1], wcounts) + (
            np.arange(total, dtype=np.int64) - np.repeat(woff[:-1], wcounts)
        )
        # polynomial rolling hash over the k codepoints of each window
        h = np.zeros(total, dtype=np.uint64)
        for j in range(k):
            h = h * _MIX + cps[base + j].astype(np.uint64)
        h = _splitmix64(h) & np.uint64(0x7FFFFFFFFFFFFFFF)
        # per-doc distinct (or occurrence-expanded) token rows
        doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), wcounts)
        hs, ds_, sizes = _expand_or_dedup_token_rows(
            h, doc_idx, len(lens), weighted)
        return pa.table({
            "token": pa.array(hs.astype(np.int64)),
            id_col: pa.array(ids[ds_]),
            "n": pa.array(sizes[ds_].astype(np.int64)),
        })

    return rows



def _word_gram_rows(text_col: str, id_col: str, n: int,
                    weighted: bool = False):
    """map_batches fn: doc → one row per DISTINCT word-``n``-gram
    (shingle; ``weighted=True``: per occurrence-expanded shingle —
    multiset semantics). Words split on a single space (SQL ``string_split``
    parity — consecutive spaces yield empty words on both sides); each
    word murmur-hashed over its UTF-8 bytes, shingles combined with an
    order-sensitive polynomial, masked to 63 bits. Word shingles keep
    the token universe combinatorially diverse — document-frequencies
    stay small even on low-entropy corpora, where character k-grams
    degenerate (measured: 2k distinct char-5-grams over 1M token rows
    on the word-soup test corpus → prefix groups of hundreds; 27k
    distinct word-3-grams → mean df ≈ 10)."""

    def rows(t: pa.Table) -> pa.Table:
        words_list = pc.split_pattern(
            pc.fill_null(t.column(text_col), ""), " ").combine_chunks()
        wcounts = pc.list_value_length(words_list) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        data, offsets = arrow_to_flat_bytes(pc.list_flatten(words_list))
        wh = murmur64a(data, offsets)
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        woff = np.zeros(len(wcounts) + 1, dtype=np.int64)
        np.cumsum(wcounts, out=woff[1:])
        scounts = np.maximum(wcounts - n + 1, 0)
        soff = np.zeros(len(scounts) + 1, dtype=np.int64)
        np.cumsum(scounts, out=soff[1:])
        total = int(soff[-1])
        if total == 0:
            return pa.table({"token": pa.array([], type=pa.int64()),
                             id_col: pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        base = np.repeat(woff[:-1], scounts) + (
            np.arange(total, dtype=np.int64) - np.repeat(soff[:-1], scounts)
        )
        h = wh[base].copy()
        for j in range(1, n):
            h = h * _MIX + wh[base + j]
        h = _splitmix64(h) & np.uint64(0x7FFFFFFFFFFFFFFF)
        doc_idx = np.repeat(np.arange(len(wcounts), dtype=np.int64), scounts)
        hs, ds_, sizes = _expand_or_dedup_token_rows(
            h, doc_idx, len(wcounts), weighted)
        return pa.table({
            "token": pa.array(hs.astype(np.int64)),
            id_col: pa.array(ids[ds_]),
            "n": pa.array(sizes[ds_].astype(np.int64)),
        })

    return rows


def word_ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    """Exact word-n-gram (shingle) Jaccard — the verifier twin of
    :func:`ngram_jaccard` for ``unit="word"``. Split on single spaces
    for SQL string_split parity."""
    wa, wb = text_a.split(" "), text_b.split(" ")
    sa = {tuple(wa[i: i + n]) for i in range(max(0, len(wa) - n + 1))}
    sb = {tuple(wb[i: i + n]) for i in range(max(0, len(wb) - n + 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def _fold_df_counts(tok_ds, limit: int | None):
    """Per-BLOCK token value_counts → driver numpy merge
    (sort + reduceat), early-exiting the stream once the distinct
    vocabulary provably exceeds ``limit``.

    Returns ``(tokens_sorted int64[], df int64[])`` or None if the
    vocabulary is too large to broadcast (caller falls back to the
    shuffle df-attach).  Rows in tok_ds are distinct per (token, doc),
    so a token's row count IS its document frequency. Whole-block
    batches everywhere: the driver sees one pre-reduced (token, count)
    array per block, not Ray's default 256-row slivers."""

    def part(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t.column("token").combine_chunks())
        return pa.table({"token": vc.field("values"),
                         "c": pc.cast(vc.field("counts"), pa.int64())})

    merged_t = merged_c = None
    toks, cnts, pending = [], [], 0

    def merge():
        nonlocal merged_t, merged_c, toks, cnts, pending
        if not toks:
            return
        at = np.concatenate(([merged_t] if merged_t is not None else [])
                            + toks)
        ac = np.concatenate(([merged_c] if merged_c is not None else [])
                            + cnts)
        order = np.argsort(at, kind="stable")
        at, ac = at[order], ac[order]
        starts = np.nonzero(np.r_[True, at[1:] != at[:-1]])[0]
        merged_t, merged_c = at[starts], np.add.reduceat(ac, starts)
        toks, cnts, pending = [], [], 0

    for b in tok_ds.map_batches(part, batch_format="pyarrow",
                                batch_size=None) \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_rows == 0:
            continue
        toks.append(b.column("token").to_numpy(
            zero_copy_only=False).astype(np.int64))
        cnts.append(b.column("c").to_numpy(zero_copy_only=False))
        pending += b.num_rows
        # pending rows are an upper bound on NEW distinct tokens; only
        # a real merge can prove the limit is exceeded, so merge once
        # the bound allows it (4x slack amortizes the sort)
        if limit is not None and \
                pending + (len(merged_t) if merged_t is not None else 0) \
                > 4 * max(limit, 1):
            merge()
            if len(merged_t) > limit:
                return None
    merge()
    if merged_t is None:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    if limit is not None and len(merged_t) > limit:
        return None
    return merged_t, merged_c.astype(np.int64)


class _BroadcastDFAttach:
    """map_batches actor: attach global token document-frequencies from
    a broadcast (sorted tokens, df) pair via np.searchsorted — the
    no-shuffle twin of the by-token df-attach groupby."""

    def __init__(self, vocab_ref):
        import ray

        self.vocab, self.df = (ray.get(vocab_ref)
                               if isinstance(vocab_ref, ray.ObjectRef)
                               else vocab_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        tok = t.column("token").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(self.vocab, tok)
        return t.append_column("df", pa.array(self.df[idx]))


def _prefix_keep_arrays(tok, ids, n, df, threshold):
    """Rarest-first prefix selection over COMPLETE per-doc token rows:
    order each doc's tokens by (df, token), keep the first
    ``n - floor(t*n) + 1``. Caller guarantees every row of a doc is
    present in the input arrays (a by-id bucket group, or a fused
    batch whose rows_fn emitted whole docs). Returns the surviving
    (tok, ids, n) arrays."""
    order = np.lexsort((tok, df, ids))
    ids, df, tok, n = ids[order], df[order], tok[order], n[order]
    starts = np.nonzero(np.r_[True, ids[1:] != ids[:-1]])[0]
    seg = np.diff(np.r_[starts, len(ids)])
    rank = np.arange(len(ids)) - np.repeat(starts, seg)
    plen = n - np.floor(threshold * n).astype(np.int64) + 1
    m = rank < plen
    return tok[m], ids[m], n[m]


class _FusedPrefixRows:
    """map_batches actor fusing gram-extract → broadcast-df attach →
    prefix keep into ONE pass over DOC batches. Valid because rows_fn
    emits every distinct gram of a doc within its own batch's output,
    so per-doc prefix selection never needs the by-id shuffle; df is
    global via the broadcast vocabulary. Output: the ~(1-t)·n
    surviving (token, id, n) prefix rows per doc."""

    def __init__(self, rows_fn, vocab_ref, threshold, id_col):
        import ray

        self.rows_fn = rows_fn
        self.vocab, self.df = (ray.get(vocab_ref)
                               if isinstance(vocab_ref, ray.ObjectRef)
                               else vocab_ref)
        self.threshold = threshold
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = self.rows_fn(t)
        tok = rows.column("token").to_numpy(zero_copy_only=False)
        ids = rows.column(self.id_col).to_numpy(zero_copy_only=False)
        n = rows.column("n").to_numpy(zero_copy_only=False)
        df = self.df[np.searchsorted(self.vocab, tok)]
        tok, ids, n = _prefix_keep_arrays(tok, ids, n, df, self.threshold)
        return pa.table({"token": pa.array(tok.astype(np.int64)),
                         self.id_col: pa.array(ids.astype(np.int64)),
                         "n": pa.array(n.astype(np.int64))})


def _emit_prefix_pairs(threshold, id_col):
    """Group fn for the by-token emit shuffle: within each token
    segment, emit all id pairs passing the length filter
    min(na,nb) ≥ t·max(na,nb) (J ≥ t implies it; ε for roundoff)."""
    import pandas as pd

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        tok = g["token"].to_numpy()
        ids = g[id_col].to_numpy()
        n = g["n"].to_numpy()
        order = np.lexsort((ids, tok))
        tok, ids, n = tok[order], ids[order], n[order]
        starts = np.nonzero(np.r_[True, tok[1:] != tok[:-1]])[0]
        ends = np.r_[starts[1:], len(tok)]
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            ii, jj = np.triu_indices(e - s, k=1)
            na, nb = n[s:e][ii], n[s:e][jj]
            ok = np.minimum(na, nb) >= threshold * np.maximum(na, nb) - 1e-9
            out_a.append(ids[s:e][ii[ok]])
            out_b.append(ids[s:e][jj[ok]])
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b)})

    return emit_pairs


def _driver_dedupe_pairs(raw_ds):
    """Distinct (id_a, id_b) on the driver — right when the caller
    materializes the pair set next anyway (e.g. for exact verify), so
    a fourth shuffle just to distinct them is pure overhead."""
    import pandas as pd

    df_pairs = raw_ds.to_pandas()
    if "id_a" not in df_pairs.columns:  # empty dataset loses its schema
        df_pairs = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
    return df_pairs.drop_duplicates() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)


def prefix_filter_candidates(tok_ds, id_col: str, threshold: float,
                             num_buckets: int = 64,
                             dedupe: str = "bucketed",
                             df_mode: str = "auto",
                             broadcast_df_limit: int = 2_000_000):
    """Complete candidate-pair generation for Jaccard ≥ ``threshold``
    over per-doc token sets, via df-ordered prefix filtering
    (AllPairs / PPJoin family — Bayardo et al. WWW'07; distributed
    shape after Vernica et al. SIGMOD'10).

    Tokens are globally ordered by (document-frequency, token) — rarest
    first — and each doc emits only its first ``n - floor(t·n) + 1``
    tokens. Theorem (same-α prefix lemma, α = ceil(t·max(na, nb)) ≤
    |A∩B|): any pair with Jaccard ≥ t shares at least one emitted
    token, so grouping emitted rows by token yields a candidate
    SUPERSET — no false negatives; an exact verify pass decides.
    ``floor`` (not ceil) guards against float roundoff ever shortening
    a prefix below the proven bound.

    Up to three bucket shuffles, each carrying ≤ the (token, id, n)
    row set:
    (1) by token — attach global df (all rows of a token share a
    bucket, so the in-group segment length IS the global df). With
    ``df_mode="auto"`` (default) this shuffle is REPLACED by a
    driver-side streaming value_counts fold + a broadcast
    searchsorted attach whenever the distinct-token count stays under
    ``broadcast_df_limit`` (the fold early-exits past the cap, so an
    unbounded vocabulary costs one partial pass before falling back
    to the shuffle — ``df_mode="shuffle"`` skips the attempt);
    (2) by id — order each doc's tokens by (df, token), keep the
    prefix (~(1-t)·n rows survive);
    (3) by token — emit within-segment pairs (rarest-first ordering
    keeps segments tiny), then distinct via the bucketed pair dedupe
    (``dedupe="bucketed"``, the scale path) or a driver-side
    ``drop_duplicates`` (``dedupe="driver"`` — right when the caller
    materializes the pair set next anyway, e.g. for exact verify).
    """
    import pandas as pd

    if df_mode not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"df_mode must be auto|broadcast|shuffle, "
                         f"got {df_mode!r}")
    B = np.uint64(num_buckets)

    def tb(t: pa.Table) -> pa.Table:
        tok = t.column("token").to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "__tb", pa.array((_splitmix64(tok) % B).astype(np.int64)))

    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        tok = g["token"].to_numpy()
        ids = g[id_col].to_numpy()
        n = g["n"].to_numpy()
        order = np.lexsort((ids, tok))
        tok, ids, n = tok[order], ids[order], n[order]
        starts = np.nonzero(np.r_[True, tok[1:] != tok[:-1]])[0]
        seg = np.diff(np.r_[starts, len(tok)])
        df = np.repeat(seg, seg).astype(np.int64)
        return pd.DataFrame({"token": tok, id_col: ids, "n": n, "df": df})

    def ib(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "__ib", pa.array((_splitmix64(ids) % B).astype(np.int64)))

    def keep_prefix(g: pd.DataFrame) -> pd.DataFrame:
        tok, ids, n = _prefix_keep_arrays(
            g["token"].to_numpy(), g[id_col].to_numpy(), g["n"].to_numpy(),
            g["df"].to_numpy(), threshold)
        return pd.DataFrame({"token": tok, id_col: ids, "n": n})

    with_df = None
    if df_mode != "shuffle":
        # materialize once: the fold and the attach read the SAME
        # blocks (no recompute, and identical tokens even under a
        # nondeterministic upstream)
        tok_ds = tok_ds.materialize()
        vocab = _fold_df_counts(
            tok_ds, None if df_mode == "broadcast" else broadcast_df_limit)
        if vocab is not None:
            import ray

            with_df = tok_ds.map_batches(
                _BroadcastDFAttach, fn_constructor_args=(ray.put(vocab),),
                batch_format="pyarrow", concurrency=auto_concurrency())
    if with_df is None:
        with_df = tok_ds.map_batches(tb, batch_format="pyarrow") \
            .groupby("__tb").map_groups(attach_df, batch_format="pandas")
    prefix = with_df.map_batches(ib, batch_format="pyarrow") \
        .groupby("__ib").map_groups(keep_prefix, batch_format="pandas")
    raw = prefix.map_batches(tb, batch_format="pyarrow") \
        .groupby("__tb").map_groups(_emit_prefix_pairs(threshold, id_col),
                                    batch_format="pandas")
    if dedupe == "driver":
        import ray.data

        return ray.data.from_pandas(_driver_dedupe_pairs(raw))
    return _dedupe_pair_rows(raw, {}, num_buckets=num_buckets)


def ngram_jaccard_join(ds, text_col: str = "text", id_col: str = "doc_id",
                       k: int = 3, threshold: float = 0.8,
                       num_buckets: int = 64, unit: str = "word",
                       broadcast_df_limit: int = 2_000_000,
                       verify_driver_limit: int = 200_000,
                       prefix_driver_limit: int = 2_000_000,
                       weighted: bool = False):
    """EXACT n-gram Jaccard similarity self-join: every doc pair with
    Jaccard ≥ ``threshold``, with the exact similarity.

    ``weighted=True``: WEIGHTED (multiset) Jaccard — Σ_g min(tf_a,tf_b)
    / Σ_g max(tf_a,tf_b) — via the occurrence-expansion reduction: the
    i-th within-doc occurrence of a gram becomes the distinct token
    (gram, i), so weighted J of multisets equals set J of the expanded
    sets and the ENTIRE set pipeline below (df fold, prefix-filter
    completeness lemma, pair emission, exact verify) applies verbatim;
    ``n`` becomes the doc's total gram count and the verify builds
    expanded (gram, occ) sets (:func:`_char_gram_multiset`).

    ``unit="word"`` (default): word-``k``-gram shingles — the standard
    document-dedup definition, and the one that SCALES: the shingle
    universe grows combinatorially with the vocabulary, so document
    frequencies (→ prefix-group sizes → candidate volume) stay small
    on any corpus. ``unit="char"``: character-``k``-gram sets; exact
    too, but on low-entropy corpora the char-gram vocabulary saturates
    (measured: 2k distinct 5-grams over 1M token rows → prefix groups
    of hundreds → candidate blowup) — use it only for short/diverse
    strings.

    Candidates via df-ordered prefix filtering (provably complete —
    no LSH recall loss, unlike minhash_dedup; see
    :func:`prefix_filter_candidates` for the lemma), then an exact
    verify on the candidate set only (texts gathered by
    broadcast-filter, so results match SQL substr/string_split
    semantics bit-for-bit).

    Fast path (vocabulary ≤ ``broadcast_df_limit`` distinct grams —
    the common case for word shingles): document frequencies are
    folded on the driver in one streaming pass, then gram-extract →
    broadcast-df attach → prefix keep run FUSED in a single
    map_batches over doc batches (:class:`_FusedPrefixRows` — valid
    because rows_fn emits whole docs per batch), leaving ONE token
    shuffle for pair emission instead of three. An oversized
    vocabulary early-exits the fold and falls back to the full
    shuffle pipeline, so the fast path never degrades completeness.
    Collision caveat as dedup_docs_exact: candidate tokens are 63-bit
    hashes, so a gram collision (~n²/2⁶³) could in principle perturb
    candidate generation; the verify pass uses true text grams, so
    reported pairs and similarities are always exact.

    Returns pandas (id_a, id_b, jaccard) sorted by (id_a, id_b)."""
    import pandas as pd

    if unit == "word":
        rows_fn = _word_gram_rows(text_col, id_col, k, weighted=weighted)
        gram_set = _word_gram_multiset(k) if weighted else _word_gram_set(k)
    elif unit == "char":
        rows_fn = _char_gram_rows(text_col, id_col, k, weighted=weighted)
        gram_set = _char_gram_multiset(k) if weighted else _char_gram_set(k)
    else:
        raise ValueError(f"unit must be 'word' or 'char', got {unit!r}")
    docs = ds.select_columns([id_col, text_col])
    tok = docs.map_batches(rows_fn, batch_format="pyarrow")
    vocab = _fold_df_counts(tok, broadcast_df_limit)
    if vocab is None:
        pairs = prefix_filter_candidates(
            tok, id_col, threshold, num_buckets,
            dedupe="driver", df_mode="shuffle").to_pandas()
    else:
        import ray

        vocab_ref = ray.put(vocab)
        holder: list = []

        # plain TASK fn, not an actor pool: __init__ was just a
        # ray.get of the broadcast (plasma-local after first fetch per
        # worker), and the pool startup cost ~1.5 s per call at every
        # sf (the q7 precedent; VERDICT r03 item 6)
        def fused_fn(t: pa.Table) -> pa.Table:
            if not holder:
                holder.append(_FusedPrefixRows(rows_fn, vocab_ref,
                                               threshold, id_col))
            return holder[0](t)

        kept = docs.map_batches(fused_fn,
                                batch_format="pyarrow").materialize()
        if kept.count() <= prefix_driver_limit:
            # the pair set is pulled to the driver right after anyway
            # (_driver_dedupe_pairs), so while the PREFIX rows fit the
            # driver (16-byte rows), the by-token exchange before it is
            # pure fixed overhead — emit locally instead (one lexsort)
            import pandas as pd

            kdf = kept.to_pandas()
            if "token" not in kdf.columns:  # empty ds loses its schema
                pairs = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                      "id_b": pd.Series([], dtype="int64")})
            else:
                pairs = _emit_prefix_pairs(threshold, id_col)(kdf) \
                    .drop_duplicates() \
                    .sort_values(["id_a", "id_b"]).reset_index(drop=True)
        else:
            B = np.uint64(num_buckets)

            def tb(t: pa.Table) -> pa.Table:
                h = t.column("token").to_numpy(
                    zero_copy_only=False).astype(np.uint64)
                return t.append_column(
                    "__tb", pa.array((_splitmix64(h) % B).astype(np.int64)))

            raw = kept.map_batches(tb, batch_format="pyarrow") \
                .groupby("__tb") \
                .map_groups(_emit_prefix_pairs(threshold, id_col),
                            batch_format="pandas")
            pairs = _driver_dedupe_pairs(raw)
    if len(pairs) == 0:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})
    if len(pairs) > verify_driver_limit:
        # distributed exact verify (VERDICT r02 item 2): texts attach to
        # pairs via bucket exchanges and are scored inside bucket tasks
        # — no driver dict of candidate texts
        import ray.data as _rd

        scored = score_pairs_distributed(
            _rd.from_pandas(pairs[["id_a", "id_b"]].reset_index(drop=True)),
            docs, id_col, text_col,
            make_exact_jaccard_scorer(gram_set), "jaccard")
        out = scored.to_pandas()
        out = out[out["jaccard"] >= threshold]
        return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    want = set(pairs["id_a"]).union(pairs["id_b"])
    t = _gather_rows_by_id(docs, id_col, want)
    # gram sets built ONCE per doc (docs recur across many pairs),
    # exact scorer semantics (empty∩empty = 1.0) preserved below
    grams = {}
    if t is not None:
        for i, x in zip(t.column(id_col).to_pylist(),
                        t.column(text_col).to_pylist()):
            grams[int(i)] = gram_set(x or "")
    empty = frozenset()
    pairs = pairs.copy()
    pairs["jaccard"] = [
        (len(sa & sb) / len(sa | sb)) if (sa or sb) else 1.0
        for sa, sb in ((grams.get(int(a), empty), grams.get(int(b), empty))
                       for a, b in zip(pairs["id_a"], pairs["id_b"]))
    ]
    out = pairs[pairs["jaccard"] >= threshold]
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


class _CrossDocGramStats:
    """map_batches actor fusing gram-extract → broadcast-df attach →
    per-doc shared-gram counting into one pass over DOC batches (valid
    because rows_fn emits every distinct gram of a doc within its own
    batch's output; df is global via the broadcast vocabulary).
    Emits one row per input doc — including gram-less docs."""

    def __init__(self, rows_fn, vocab_ref, id_col):
        import ray

        self.rows_fn = rows_fn
        self.vocab, self.df = (ray.get(vocab_ref)
                               if isinstance(vocab_ref, ray.ObjectRef)
                               else vocab_ref)
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids_b = t.column(self.id_col).to_numpy(zero_copy_only=False)
        order = np.argsort(ids_b, kind="stable")
        sorted_ids = ids_b[order]
        rows = self.rows_fn(t)
        n_grams = np.zeros(len(ids_b), dtype=np.int64)
        n_shared = np.zeros(len(ids_b), dtype=np.int64)
        if rows.num_rows:
            tok = rows.column("token").to_numpy(zero_copy_only=False)
            rid = rows.column(self.id_col).to_numpy(zero_copy_only=False)
            df = self.df[np.searchsorted(self.vocab, tok)]
            pos = order[np.searchsorted(sorted_ids, rid)]
            n_grams = np.bincount(pos, minlength=len(ids_b))
            n_shared = np.bincount(pos, weights=(df > 1).astype(np.float64),
                                   minlength=len(ids_b)).astype(np.int64)
        return pa.table({
            self.id_col: t.column(self.id_col),
            "n_grams": pa.array(n_grams.astype(np.int64)),
            "n_shared_grams": pa.array(n_shared),
            "shared_frac": pa.array(
                n_shared / np.maximum(n_grams, 1).astype(np.float64)),
        })


def crossdoc_gram_stats(ds, text_col: str = "text", id_col: str = "doc_id",
                        k: int = 3, broadcast_df_limit: int = 2_000_000):
    """Cross-document n-gram repetition rate (the corpus-level signal
    behind substring-dedup / contamination filters — Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): for
    each doc, how many of its DISTINCT word-``k``-grams also occur in
    at least one OTHER document.

    Zero-shuffle fast path: gram document-frequencies are folded on
    the driver (streaming per-block value_counts merge,
    :func:`_fold_df_counts` — rows are distinct per (gram, doc), so a
    gram's row count IS its df), broadcast once via ``ray.put``, then
    gram-extract → df attach → per-doc counting run FUSED in a single
    map_batches over doc batches. A vocabulary past
    ``broadcast_df_limit`` early-exits the fold and falls back to two
    bucket shuffles (by token to attach df, by id to re-aggregate
    per-doc) — same semantics, never a full-corpus group.

    Grams are 63-bit hashes (:func:`_word_gram_rows`); a cross-gram
    collision (~n_grams²/2⁶³) could overcount sharing — negligible at
    any realistic vocabulary.
    """
    import ray

    docs = ds.select_columns([id_col, text_col])
    rows_fn = _word_gram_rows(text_col, id_col, k)
    tok = docs.map_batches(rows_fn, batch_format="pyarrow")
    vocab = _fold_df_counts(tok, broadcast_df_limit)
    if vocab is not None:
        return docs.map_batches(
            _CrossDocGramStats,
            fn_constructor_args=(rows_fn, ray.put(vocab), id_col),
            batch_format="pyarrow", concurrency=auto_concurrency())

    # shuffle fallback: df via by-token bucket groupby (segment length
    # within a token bucket IS the global df), per-doc re-aggregate via
    # by-id bucket groupby; doc ids with zero grams re-enter with a
    # zero row emitted per doc batch
    import pandas as pd

    B = np.uint64(64)

    def tb(t: pa.Table) -> pa.Table:
        h = t.column("token").to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "__tb", pa.array((_splitmix64(h) % B).astype(np.int64)))

    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        tok_a = g["token"].to_numpy()
        order = np.argsort(tok_a, kind="stable")
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        s = tok_a[order]
        starts = np.nonzero(np.r_[True, s[1:] != s[:-1]])[0]
        seg = np.diff(np.r_[starts, len(s)])
        df = np.repeat(seg, seg)[inv]
        return pd.DataFrame({g.columns[1]: g[g.columns[1]].to_numpy(),
                             "shared": (df > 1).astype(np.int64)})

    def ib(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "__ib", pa.array((_splitmix64(ids) % B).astype(np.int64)))

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        sh = g["shared"].to_numpy()
        zero = g["n_grams"].to_numpy() == 0  # zero-marker rows
        order = np.argsort(ids, kind="stable")
        ids_s, sh_s, zero_s = ids[order], sh[order], zero[order]
        starts = np.nonzero(np.r_[True, ids_s[1:] != ids_s[:-1]])[0]
        uid = ids_s[starts]
        tot = np.add.reduceat((~zero_s).astype(np.int64), starts)
        shd = np.add.reduceat(np.where(zero_s, 0, sh_s), starts)
        return pd.DataFrame({
            id_col: uid, "n_grams": tot, "n_shared_grams": shd,
            "shared_frac": shd / np.maximum(tot, 1)})

    def zero_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "token": pa.array(np.zeros(n, dtype=np.int64)),
            id_col: t.column(id_col),
            "shared": pa.array(np.zeros(n, dtype=np.int64)),
            "n_grams": pa.array(np.zeros(n, dtype=np.int64)),
        })

    with_df = tok.map_batches(tb, batch_format="pyarrow") \
        .groupby("__tb") \
        .map_groups(lambda g: attach_df(g[["token", id_col]])
                    .assign(n_grams=1), batch_format="pandas")
    marked = with_df.union(
        docs.map_batches(zero_rows, batch_format="pyarrow")
            .drop_columns(["token"]))
    return marked.map_batches(ib, batch_format="pyarrow") \
        .groupby("__ib").map_groups(per_doc, batch_format="pandas")


# ------------------------------------------------------------ SemDeDup
def semdedup_assignments(ds, vec_col: str = "embedding",
                         id_col: str = "vec_id", n_seeds: int | None = None,
                         clustering: str = "trained",
                         max_cluster: int = 8192,
                         sample_size: int = 4096, seed: int = 0):
    """Cluster assignment for :func:`semdedup`, exposed for testing the
    size guard. Returns (assigned_ds with ``cluster``/``cell`` columns,
    seed_ids, normalized centroid matrix).

    ``clustering="trained"``: k-means centroids from a deterministic
    bounded sample (similarity.train_centroids); ``n_seeds=None``
    derives the count from the corpus so expected cluster size stays
    ~1024 (the VERDICT r03 item 2 scaling fix — a constant seed count
    makes within-cluster work O(n²/k) corpus-wide). Clusters that still
    exceed ``max_cluster`` (skew: k-means can collapse mass-duplicate
    corpora into one cell) are split by a deterministic VECTOR-content
    hash salt into cells of expected size ≤ max_cluster — a strictly
    FINER partition, so the SemDeDup semantics (dedup within a cluster)
    degrade monotonically, per-task work stays bounded, and
    byte-identical vectors (exact duplicates) can never be separated.

    ``clustering="fixed_seeds"``: the SQL-oracle-parity variant (min-id
    seed vectors, no size guard) used by the oracle-checked query."""
    import pandas as pd
    import ray

    def _normalize(M):
        return M / (np.linalg.norm(M, axis=1, keepdims=True) + 1e-300)

    if clustering == "trained":
        if n_seeds is None:
            n_seeds = max(16, int(np.ceil(ds.count() / 1024)))
        from .similarity import train_centroids

        S = _normalize(train_centroids(ds, n_seeds, vec_col, id_col,
                                       sample_size, seed).astype(np.float64))
        seed_ids = np.arange(len(S), dtype=np.int64)
    elif clustering == "fixed_seeds":
        if n_seeds is None:
            n_seeds = 16

        def local_seeds(t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            if len(ids) > n_seeds:
                sel = np.sort(np.argpartition(ids, n_seeds)[:n_seeds])
                t = t.take(pa.array(sel))
            return t.select([id_col, vec_col])

        cand = ds.map_batches(local_seeds, batch_format="pyarrow").to_pandas()
        cand = cand.sort_values(id_col).head(n_seeds)
        seed_ids = cand[id_col].to_numpy().astype(np.int64)
        S = _normalize(np.stack(cand[vec_col].to_numpy()).astype(np.float64))
    else:
        raise ValueError(f"unknown clustering {clustering!r}")

    ref = ray.put((seed_ids, S))

    def assign(t: pa.Table) -> pa.Table:
        sids, Sm = ray.get(ref)
        X = np.asarray(t.column(vec_col).combine_chunks().flatten()
                       .to_numpy(zero_copy_only=False)) \
            .reshape(t.num_rows, -1).astype(np.float64)
        Xn = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-300)
        cl = sids[np.argmax(Xn @ Sm.T, axis=1)]
        return pa.table({id_col: t.column(id_col),
                         "cluster": pa.array(cl.astype(np.int64)),
                         vec_col: t.column(vec_col)})

    assigned = ds.map_batches(assign, batch_format="pyarrow")

    if clustering == "fixed_seeds":
        # oracle-parity path: no guard, cell ≡ 0
        assigned = assigned.map_batches(
            lambda t: t.append_column(
                "cell", pa.array(np.zeros(t.num_rows, dtype=np.int64))),
            batch_format="pyarrow")
        return assigned, seed_ids, S

    assigned = assigned.materialize()
    # size guard: count per cluster (bounded — ≤ n_seeds rows), split
    # oversized clusters by a deterministic vector-content-hash salt
    sizes = np.zeros(len(seed_ids), dtype=np.int64)

    def count_part(t: pa.Table) -> pa.Table:
        c = np.bincount(t.column("cluster").to_numpy(zero_copy_only=False),
                        minlength=len(seed_ids))
        return pa.table({"cluster": pa.array(
            np.arange(len(seed_ids), dtype=np.int64)),
            "n": pa.array(c.astype(np.int64))})

    for b in assigned.map_batches(count_part, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow"):
        # iter_batches may concatenate several partial count tables into
        # one batch → duplicate cluster indices; += would drop them
        np.add.at(sizes, b.column("cluster").to_numpy(),
                  b.column("n").to_numpy())
    n_cells = np.maximum(1, -(-sizes // max_cluster))  # ceil div
    cells_ref = ray.put(n_cells)

    def add_cell(t: pa.Table) -> pa.Table:
        nc = ray.get(cells_ref)
        cl = t.column("cluster").to_numpy(zero_copy_only=False)
        # salt by VECTOR CONTENT, not id: byte-identical vectors can
        # never land in different cells, so exact duplicates always
        # stay comparable even under the split
        X = np.asarray(t.column(vec_col).combine_chunks().flatten()
                       .to_numpy(zero_copy_only=False)) \
            .reshape(t.num_rows, -1).astype(np.float64)
        h = np.zeros(t.num_rows, dtype=np.uint64)
        for j in range(X.shape[1]):
            h = _splitmix64(h ^ X[:, j].view(np.uint64))
        cell = (h % nc[cl].astype(np.uint64)).astype(np.int64)
        return t.append_column("cell", pa.array(cell))

    return assigned.map_batches(add_cell, batch_format="pyarrow"), \
        seed_ids, S


def semdedup(ds, vec_col: str = "embedding", id_col: str = "vec_id",
             n_seeds: int | None = 16, threshold: float = 0.95,
             block: int = 2048, clustering: str = "fixed_seeds",
             max_cluster: int = 8192, sample_size: int = 4096):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540 "SemDeDup:
    Data-efficient learning at web-scale through semantic
    deduplication"): partition the embedding space into clusters, then
    inside each cluster remove every item whose cosine similarity to an
    EARLIER (smaller-id) cluster member meets ``threshold`` — pairwise
    comparison cost drops from O(n²) corpus-wide to O(Σ m_c²) within
    clusters.

    Clustering (``clustering=``):

    - ``"fixed_seeds"`` (default, the SQL-oracle-parity variant): the
      ``n_seeds`` vectors with the globally smallest ids are the
      centroids and every vector joins the seed maximizing cosine
      (exact ties → smaller seed id, = numpy argmax-first) — the whole
      operator stays expressible as a SQL oracle (argmax via ROW_NUMBER
      over a cross join).
    - ``"trained"`` (the scale path, VERDICT r03 item 2): k-means
      centroids from a deterministic bounded sample
      (similarity.train_centroids), ``n_seeds=None`` derived from the
      corpus size (n/1024), plus a per-cluster size guard that splits
      skew-collapsed clusters by vector-content-hash salt into ≤ ``max_cluster``
      expected-size cells (a strictly finer partition — removals only
      shrink, work stays bounded).

    Distributed shape: the normalized centroid matrix is ONE broadcast
    (ray.put, read via ray.get inside plain task fns — no actor pool,
    setup is just a plasma read); assignment is one matmul per batch;
    members exchange ONCE keyed on (cluster, cell); the in-cluster
    pairwise check runs blockwise (m × ``block`` matmuls) so task
    memory stays O(m·block) doubles regardless of cluster size.
    Returns only the REMOVED rows: (id, cluster seed id, dup_of =
    smallest qualifying earlier member).
    """
    import pandas as pd

    assigned, _seed_ids, _S = semdedup_assignments(
        ds, vec_col, id_col, n_seeds, clustering, max_cluster, sample_size)

    empty = pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                          "cluster": pd.Series([], dtype="int64"),
                          "dup_of": pd.Series([], dtype="int64")})

    def dedup_cluster(g: "pd.DataFrame") -> "pd.DataFrame":
        order = np.argsort(g[id_col].to_numpy(), kind="stable")
        ids = g[id_col].to_numpy()[order].astype(np.int64)
        V = np.stack(g[vec_col].to_numpy()[order]).astype(np.float64)
        V /= np.linalg.norm(V, axis=1, keepdims=True) + 1e-300
        m = len(ids)
        if m < 2:
            return empty.copy()
        out_id, out_dup = [], []
        for j0 in range(1, m, block):
            j1 = min(j0 + block, m)
            G = V[:j1] @ V[j0:j1].T            # (j1, j1-j0)
            cols = np.arange(j0, j1)
            hit = (G >= threshold) & (np.arange(j1)[:, None] < cols)
            any_ = hit.any(axis=0)
            first = hit.argmax(axis=0)         # min index = min id (sorted)
            out_id.append(ids[cols[any_]])
            out_dup.append(ids[first[any_]])
        rid = np.concatenate(out_id)
        if not len(rid):
            return empty.copy()
        return pd.DataFrame({
            id_col: rid,
            "cluster": np.full(len(rid), int(g["cluster"].iloc[0]),
                               dtype=np.int64),
            "dup_of": np.concatenate(out_dup)})

    removed = assigned \
        .groupby(["cluster", "cell"]) \
        .map_groups(dedup_cluster, batch_format="pandas") \
        .to_pandas()
    if not len(removed):
        return empty.copy()
    return removed.astype({id_col: "int64", "cluster": "int64",
                           "dup_of": "int64"}) \
        .sort_values(id_col).reset_index(drop=True)


def containment_join(ds, text_col: str = "text", id_col: str = "doc_id",
                     k: int = 3, t_num: int = 9, t_den: int = 10,
                     num_buckets: int = 64,
                     broadcast_df_limit: int = 2_000_000,
                     verify_driver_limit: int = 200_000):
    """EXACT n-gram CONTAINMENT self-join: every pair with
    max(|A∩B|/|A|, |A∩B|/|B|) ≥ t_num/t_den — the ASYMMETRIC near-dup
    semantics Jaccard cannot see: a document quoted whole inside a
    larger one has containment 1 but Jaccard |A|/|B| → 0 as the host
    grows (Broder '97 separates resemblance from containment; this is
    the quote/superset-dedup operator).

    Candidates are provably complete via ONE-SIDED prefix filtering:
    if |A∩B| ≥ ⌈t·nA⌉ then any (nA−⌈t·nA⌉+1)-subset of A's tokens hits
    A∩B ⊆ B — so under the global (df, token) order, A's PREFIX of
    that length shares a token with B's FULL set. Hence PROBE rows
    (each doc's containment prefix) pair against INDEX rows (each
    doc's full token set) in one token-hash exchange; the asymmetry is
    exactly why the index side cannot be pruned (the Jaccard prefix
    filter's both-sides cut is unsound here). Candidate volume is
    Σ_token df_prefix·df — bounded on word shingles (df ≈ 10 on this
    corpus). If the vocabulary exceeds the broadcast cap the probe
    side degrades to the FULL token set (prefix = everything): still
    provably complete, just more candidates — a correctness-preserving
    fallback, not an error.

    Verify is exact on true text grams. Returns
    (id_a, id_b, inter, n_a, n_b) with id_a < id_b — ALL integers, so
    the SQL twin value-hashes with no float anywhere."""
    import pandas as pd

    rows_fn = _word_gram_rows(text_col, id_col, k)
    gram_set = _word_gram_set(k)
    docs = ds.select_columns([id_col, text_col])
    tok = docs.map_batches(rows_fn, batch_format="pyarrow")
    vocab = _fold_df_counts(tok, broadcast_df_limit)

    def ceil_t(n):
        return -(-t_num * n) // t_den

    if vocab is not None:
        import ray

        vocab_ref = ray.put(vocab)
        holder: list = []

        def probe_index_rows(t: pa.Table) -> pa.Table:
            if not holder:
                holder.append(ray.get(vocab_ref))
            vt, vc = holder[0]
            r = rows_fn(t)
            token = r.column("token").to_numpy(zero_copy_only=False)
            did = r.column(id_col).to_numpy(zero_copy_only=False)
            n = r.column("n").to_numpy(zero_copy_only=False)
            df = vc[np.searchsorted(vt, token)]
            # rank tokens per doc by (df, token); prefix = first
            # n - ceil(t·n) + 1
            order = np.lexsort((token, df, did))
            did_s, tok_s, n_s = did[order], token[order], n[order]
            starts = np.flatnonzero(np.r_[True, did_s[1:] != did_s[:-1]])
            rank = np.arange(len(did_s), dtype=np.int64) \
                - np.repeat(starts, np.diff(np.r_[starts, len(did_s)]))
            plen = n_s - ceil_t(n_s) + 1
            probe = rank < plen
            return pa.table({"token": tok_s, id_col: did_s,
                             "probe": probe,
                             "__tb": (_splitmix64(tok_s.astype(np.uint64))
                                      % np.uint64(num_buckets))
                             .astype(np.int64)})
    else:
        def probe_index_rows(t: pa.Table) -> pa.Table:
            r = rows_fn(t)
            token = r.column("token").to_numpy(zero_copy_only=False)
            did = r.column(id_col).to_numpy(zero_copy_only=False)
            return pa.table({"token": token, id_col: did,
                             "probe": np.ones(len(token), dtype=bool),
                             "__tb": (_splitmix64(token.astype(np.uint64))
                                      % np.uint64(num_buckets))
                             .astype(np.int64)})

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        tok_a = g["token"].to_numpy(dtype=np.int64)
        did = g[id_col].to_numpy(dtype=np.int64)
        pr = g["probe"].to_numpy(dtype=bool)
        order = np.argsort(tok_a, kind="stable")
        tok_s, did_s, pr_s = tok_a[order], did[order], pr[order]
        starts = np.flatnonzero(np.r_[True, tok_s[1:] != tok_s[:-1]])
        ends = np.r_[starts[1:], len(tok_s)]
        pa_, pb_ = [], []
        for s, e in zip(starts, ends):
            d = did_s[s:e]
            p = pr_s[s:e]
            probes = d[p]
            if not len(probes):
                continue
            lo = np.minimum.outer(probes, d).ravel()
            hi = np.maximum.outer(probes, d).ravel()
            m = lo != hi
            pa_.append(lo[m])
            pb_.append(hi[m])
        if not pa_:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        return pd.DataFrame({"id_a": np.concatenate(pa_),
                             "id_b": np.concatenate(pb_)}) \
            .drop_duplicates()

    raw = docs.map_batches(probe_index_rows, batch_format="pyarrow") \
        .groupby("__tb").map_groups(emit_pairs, batch_format="pandas")
    pairs = _driver_dedupe_pairs(raw)
    empty = pd.DataFrame({
        "id_a": pd.Series([], dtype="int64"),
        "id_b": pd.Series([], dtype="int64"),
        "inter": pd.Series([], dtype="int64"),
        "n_a": pd.Series([], dtype="int64"),
        "n_b": pd.Series([], dtype="int64")})
    if len(pairs) == 0:
        return empty
    if len(pairs) > verify_driver_limit:
        # distributed verify tier (scale parity with the Jaccard join):
        # texts attach via two bucket exchanges; the exact
        # (inter, n_a, n_b) triple packs into ONE int64 (20 bits each,
        # docs capped at 2^20 distinct grams) so the generic scorer
        # plumbing carries it losslessly
        import ray.data as _rd

        def pack_scorer(va: pa.Array, vb: pa.Array) -> np.ndarray:
            memo: dict[str, frozenset] = {}

            def gs(x):
                x = x or ""
                s = memo.get(x)
                if s is None:
                    s = frozenset(gram_set(x))
                    memo[x] = s
                return s

            out = np.empty(len(va), dtype=np.int64)
            for i, (x, y) in enumerate(zip(va.to_pylist(),
                                           vb.to_pylist())):
                sa, sb = gs(x), gs(y)
                out[i] = ((len(sa & sb) << 40)
                          | (min(len(sa), (1 << 20) - 1) << 20)
                          | min(len(sb), (1 << 20) - 1))
            return out

        scored = score_pairs_distributed(
            _rd.from_pandas(pairs[["id_a", "id_b"]].reset_index(drop=True)),
            docs, id_col, text_col, pack_scorer, "packed",
            score_dtype=np.int64).to_pandas()
        p = scored["packed"].to_numpy(dtype=np.int64)
        inter = p >> 40
        na = (p >> 20) & ((1 << 20) - 1)
        nb = p & ((1 << 20) - 1)
        keep = ((na > 0) & (inter * t_den >= t_num * na)) \
            | ((nb > 0) & (inter * t_den >= t_num * nb))
        out = pd.DataFrame({
            "id_a": scored["id_a"].to_numpy(dtype=np.int64)[keep],
            "id_b": scored["id_b"].to_numpy(dtype=np.int64)[keep],
            "inter": inter[keep], "n_a": na[keep], "n_b": nb[keep]})
        if not len(out):
            return empty
        return out.sort_values(["id_a", "id_b"]).reset_index(drop=True) \
            .astype("int64")
    want = set(pairs["id_a"]).union(pairs["id_b"])
    t = _gather_rows_by_id(docs, id_col, want)
    grams = {}
    if t is not None:
        for i, x in zip(t.column(id_col).to_pylist(),
                        t.column(text_col).to_pylist()):
            grams[int(i)] = gram_set(x or "")
    out_rows = []
    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ga, gb = grams.get(int(a), set()), grams.get(int(b), set())
        inter = len(ga & gb)
        na, nb = len(ga), len(gb)
        if (na and inter * t_den >= t_num * na) or \
                (nb and inter * t_den >= t_num * nb):
            out_rows.append((int(a), int(b), inter, na, nb))
    if not out_rows:
        return empty
    return pd.DataFrame(out_rows,
                        columns=["id_a", "id_b", "inter", "n_a", "n_b"]) \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True) \
        .astype("int64")


# ------------------------------------------------- exact substring dedup
def _long_window_hashes(data: np.ndarray, offsets: np.ndarray,
                        L: int) -> tuple[np.ndarray, np.ndarray]:
    """Hash every L-byte window of every doc, L a multiple of 8.

    Builds on :func:`_window_hashes` (exact MurmurHash64A of each 8-byte
    chunk) and chains the L/8 non-overlapping chunk hashes of each
    window through a splitmix round — equal windows always hash equal
    (chunk hashes are functions of the bytes alone); unequal windows
    collide with probability ~n²/2⁶⁴ like every hash-keyed exchange in
    this module. Returns (window hashes, per-doc window-count offsets),
    aligned like :func:`_window_hashes`."""
    assert L >= 8 and L % 8 == 0
    wh8, woff8 = _window_hashes(data, offsets, 8)
    lens = offsets[1:] - offsets[:-1]
    wc = np.maximum(lens - L + 1, 0)
    woffL = np.zeros(len(wc) + 1, dtype=np.int64)
    np.cumsum(wc, out=woffL[1:])
    total = int(woffL[-1])
    if total == 0:
        return np.empty(0, dtype=np.uint64), woffL
    base8 = np.repeat(woff8[:-1], wc) + (
        np.arange(total, dtype=np.int64) - np.repeat(woffL[:-1], wc))
    h = wh8[base8].copy()
    for c in range(8, L, 8):
        h = _splitmix64((h * np.uint64(0x9E3779B97F4A7C15)) ^ wh8[base8 + c])
    return h, woffL


def _dup_span_stats_exchange(ds, text_col: str = "text",
                             id_col: str = "doc_id", L: int = 32,
                             masked: bool = False, num_buckets: int = 64):
    """Attach-positions tier of :func:`dup_span_stats` — the fallback
    when the duplicated-hash set is too big to broadcast.

    Two bucket exchanges, no full-corpus group and nothing on the
    driver (dup positions never leave the workers):

    1. window rows (hash, doc, pos) bucket-exchange BY HASH — a window
       content's full occurrence list lives in exactly one bucket, so a
       within-bucket segment count IS the global occurrence count;
       rows in segments of length ≥2 are the duplicated positions.
    2. duplicated (doc, pos) rows + per-doc meta rows (window count,
       byte length — and the text itself when ``masked=True``) union
       into a BY-DOC bucket exchange; per doc, sorted span starts
       merge via the gaps-and-islands identity
       ``cover = Σ min(next_start − start, L)`` (last span counts L).
    """
    import pandas as pd

    B = np.uint64(num_buckets)
    Li = np.int64(L)

    def window_rows(t: pa.Table) -> pa.Table:
        data, offsets = arrow_to_flat_bytes(t.column(text_col))
        wh, woff = _long_window_hashes(data, offsets.astype(np.int64), L)
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        wc = np.diff(woff)
        total = int(woff[-1])
        doc = np.repeat(ids, wc)
        pos = (np.arange(total, dtype=np.int64)
               - np.repeat(woff[:-1], wc))
        return pa.table({
            "__hb": pa.array(((_splitmix64(wh) % B)).astype(np.int64)),
            "h": pa.array(wh.view(np.int64)),  # signed wire; bits intact
            id_col: pa.array(doc),
            "pos": pa.array(pos),
        })

    def dup_rows(g: pd.DataFrame) -> pd.DataFrame:
        h = g["h"].to_numpy()
        di = g[id_col].to_numpy()
        ps = g["pos"].to_numpy()
        order = np.argsort(h, kind="stable")
        hs = h[order]
        new_g = np.r_[True, hs[1:] != hs[:-1]]
        starts = np.nonzero(new_g)[0]
        seg = np.diff(np.r_[starts, len(hs)])
        dup = np.repeat(seg, seg) >= 2
        keep = order[dup]
        return pd.DataFrame({id_col: di[keep], "pos": ps[keep]})

    dup = (
        ds.map_batches(window_rows, batch_format="pyarrow")
        .groupby("__hb")
        .map_groups(dup_rows, batch_format="pandas")
    )

    with_text = bool(masked)

    def meta_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        tl = pc.binary_length(t.column(text_col)).to_numpy(
            zero_copy_only=False).astype(np.int64)
        nw = np.maximum(tl - Li + 1, 0)
        cols = {
            id_col: pa.array(ids),
            "pos": pa.array(np.full(len(ids), -1, dtype=np.int64)),
            "n_windows": pa.array(nw),
            "text_len": pa.array(tl),
        }
        if with_text:
            cols["__txt"] = pc.cast(t.column(text_col), pa.large_binary())
        return pa.table(cols)

    def dup_pad(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {
            id_col: t.column(id_col),
            "pos": t.column("pos"),
            "n_windows": pa.array(np.zeros(n, dtype=np.int64)),
            "text_len": pa.array(np.zeros(n, dtype=np.int64)),
        }
        if with_text:
            cols["__txt"] = pa.array([b""] * n, type=pa.large_binary())
        return pa.table(cols)

    def ib(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "__ib", pa.array((_splitmix64(ids) % B).astype(np.int64)))

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        ps = g["pos"].to_numpy()
        meta = ps < 0
        m = g[meta].sort_values(id_col)
        uid = m[id_col].to_numpy()
        nw = m["n_windows"].to_numpy()
        tl = m["text_len"].to_numpy()
        d_ids, d_ps = ids[~meta], ps[~meta]
        order = np.lexsort((d_ps, d_ids))
        d_ids, d_ps = d_ids[order], d_ps[order]
        same = np.r_[d_ids[1:] == d_ids[:-1], False]
        nxt = np.r_[d_ps[1:], 0]
        contrib = np.where(same, np.minimum(nxt - d_ps, Li), Li)
        starts = np.nonzero(np.r_[True, d_ids[1:] != d_ids[:-1]])[0]
        if len(d_ids):
            cover_per = np.add.reduceat(contrib, starts)
            nd_per = np.diff(np.r_[starts, len(d_ids)])
            dup_uid = d_ids[starts]
        else:
            cover_per = nd_per = dup_uid = np.empty(0, dtype=np.int64)
        idx = np.searchsorted(uid, dup_uid)
        cover = np.zeros(len(uid), dtype=np.int64)
        nd = np.zeros(len(uid), dtype=np.int64)
        cover[idx] = cover_per
        nd[idx] = nd_per
        out = pd.DataFrame({
            id_col: uid, "n_windows": nw, "n_dup_windows": nd,
            "dup_cover_chars": cover, "kept_chars": tl - cover})
        if with_text:
            txts = m["__txt"].to_numpy()
            doc_pos: dict[int, np.ndarray] = {}
            if len(d_ids):
                for k, s in enumerate(starts):
                    e = s + nd_per[k]
                    doc_pos[int(dup_uid[k])] = d_ps[s:e]
            kept = []
            for k, i in enumerate(uid):
                t_b = bytes(txts[k])
                sp = doc_pos.get(int(i))
                if sp is None:
                    kept.append(t_b)
                    continue
                mask = np.zeros(len(t_b), dtype=bool)
                for p in sp:  # bounded: per-doc span count
                    mask[p:p + L] = True
                arr = np.frombuffer(t_b, dtype=np.uint8)
                kept.append(arr[~mask].tobytes())
            out["text_kept"] = [b.decode("utf-8", "surrogateescape")
                                for b in kept]
        return out

    meta = ds.map_batches(meta_rows, batch_format="pyarrow")
    return (
        dup.map_batches(dup_pad, batch_format="pyarrow")
        .union(meta)
        .map_batches(ib, batch_format="pyarrow")
        .groupby("__ib")
        .map_groups(per_doc, batch_format="pandas")
    )


def dup_span_stats(ds, text_col: str = "text", id_col: str = "doc_id",
                   L: int = 32, masked: bool = False, num_buckets: int = 64,
                   broadcast_limit: int = 50_000_000):
    """Exact duplicated-substring spans (Lee et al. 2021, the ExactSubstr
    dedup of "Deduplicating Training Data Makes Language Models Better"):
    an L-byte window is *duplicated* when its byte content occurs ≥2
    times anywhere in the corpus (any doc, any position — including a
    second time in the same doc); every duplicated window's [pos, pos+L)
    span is marked, overlapping/adjacent spans merge, and each doc
    reports how much of it is covered by duplicated content.

    Returns per-doc ``(doc_id, n_windows, n_dup_windows,
    dup_cover_chars, kept_chars)``; with ``masked=True`` additionally
    ``text_kept`` — the doc's bytes with every duplicated span removed
    (the actual dedup output). Positions/lengths are BYTE-based; on
    ASCII corpora they equal SQL character semantics.

    Scale tiers (the dup-HASH set, not the corpus, decides):

    - Common tier: ONE exchange of per-batch-deduped 16-byte
      ``(hash, count)`` rows (never positions — a window's global
      count is the sum of its per-batch counts, and a hash's rows all
      land in one bucket); the duplicated-hash SET — typically ≪
      corpus — broadcasts once via ``ray.put``; a second zero-shuffle
      pass re-hashes each doc locally (hashing is cheap; wire is not),
      marks positions against the broadcast set (sorted-array
      searchsorted) and emits final stats/masked text directly.
    - Past ``broadcast_limit`` duplicated hashes the broadcast would
      be the scale-killer the exact-dedup drop-set guard exists for —
      fall back to :func:`_dup_span_stats_exchange` (positions ride
      the hash exchange, spans assemble in a by-doc exchange; nothing
      driver-side). Both tiers are output-identical (same hash
      function, same span algebra) — equality-locked in pytest.
    """
    import pandas as pd
    import ray

    B = np.uint64(num_buckets)
    Li = np.int64(L)

    def hash_count_rows(t: pa.Table) -> pa.Table:
        data, offsets = arrow_to_flat_bytes(t.column(text_col))
        wh, _ = _long_window_hashes(data, offsets.astype(np.int64), L)
        hu, cnt = np.unique(wh, return_counts=True)
        return pa.table({
            "__hb": pa.array((_splitmix64(hu) % B).astype(np.int64)),
            "h": pa.array(hu.view(np.int64)),
            "c": pa.array(cnt.astype(np.int64)),
        })

    def dup_hashes(g) -> "pa.Table":
        h = g["h"].to_numpy()
        c = g["c"].to_numpy()
        order = np.argsort(h, kind="stable")
        hs, cs = h[order], c[order]
        starts = np.nonzero(np.r_[True, hs[1:] != hs[:-1]])[0]
        tot = np.add.reduceat(cs, starts)
        return pd.DataFrame({"h": hs[starts][tot >= 2]})

    dup_ds = (
        ds.map_batches(hash_count_rows, batch_format="pyarrow")
        .groupby("__hb")
        .map_groups(dup_hashes, batch_format="pandas")
    ).materialize()
    n_dup = dup_ds.count()
    if n_dup > broadcast_limit:
        return _dup_span_stats_exchange(ds, text_col, id_col, L,
                                        masked, num_buckets)
    if n_dup:
        # empty map_groups outputs surface as schema-less zero-row
        # blocks — skip any block without the column
        blocks = [t.column("h").to_numpy(zero_copy_only=False)
                  for t in (ray.get(r) for r in dup_ds.to_arrow_refs())
                  if "h" in t.column_names and t.num_rows]
        arr = np.sort(np.concatenate(blocks)) if blocks \
            else np.empty(0, dtype=np.int64)
    else:
        arr = np.empty(0, dtype=np.int64)
    ref = ray.put(arr)
    with_text = bool(masked)

    def span_pass(t: pa.Table) -> pa.Table:
        dup_arr = ray.get(ref)
        data, offsets = arrow_to_flat_bytes(t.column(text_col))
        offsets = offsets.astype(np.int64)
        wh, woff = _long_window_hashes(data, offsets, L)
        hv = wh.view(np.int64)
        if len(dup_arr):
            idx = np.searchsorted(dup_arr, hv)
            idx[idx == len(dup_arr)] = 0
            is_dup = dup_arr[idx] == hv
        else:
            is_dup = np.zeros(len(hv), dtype=bool)
        n = t.num_rows
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        tl = (offsets[1:] - offsets[:-1])
        nw = np.diff(woff)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), nw)
        pos = np.arange(int(woff[-1]), dtype=np.int64) \
            - np.repeat(woff[:-1], nw)
        d_doc, d_pos = doc_of[is_dup], pos[is_dup]
        # per-doc merged cover: starts sorted already (pos ascending
        # within each doc, docs in order)
        same = np.r_[d_doc[1:] == d_doc[:-1], False]
        nxt = np.r_[d_pos[1:], 0]
        contrib = np.where(same, np.minimum(nxt - d_pos, Li), Li)
        starts = np.nonzero(np.r_[True, d_doc[1:] != d_doc[:-1]])[0] \
            if len(d_doc) else np.empty(0, dtype=np.int64)
        cover = np.zeros(n, dtype=np.int64)
        ndw = np.zeros(n, dtype=np.int64)
        if len(d_doc):
            cover[d_doc[starts]] = np.add.reduceat(contrib, starts)
            ndw[d_doc[starts]] = np.diff(np.r_[starts, len(d_doc)])
        cols = {
            id_col: pa.array(ids),
            "n_windows": pa.array(nw),
            "n_dup_windows": pa.array(ndw),
            "dup_cover_chars": pa.array(cover),
            "kept_chars": pa.array(tl - cover),
        }
        if with_text:
            kept = []
            for i in range(n):
                b = data[offsets[i]:offsets[i + 1]]
                if not ndw[i]:
                    kept.append(b.tobytes())
                    continue
                mask = np.zeros(len(b), dtype=bool)
                sl = slice(*np.searchsorted(d_doc, [i, i + 1]))
                for p in d_pos[sl]:
                    mask[p:p + L] = True
                kept.append(b[~mask].tobytes())
            cols["text_kept"] = pa.array(
                [x.decode("utf-8", "surrogateescape") for x in kept])
        return pa.table(cols)

    return ds.map_batches(span_pass, batch_format="pyarrow")
