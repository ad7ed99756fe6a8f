"""Joins for the scale tiers the broadcast pattern can't reach.

The reference has no joins (SURVEY.md §2.5); these exist so the engine
covers the standard data-processing surface:

- small × large  → broadcast lookup inside map_batches (see
  pipelines/queries.py mktsegment_revenue / customers_without_orders)
- large × large  → :func:`bucket_hash_join`: both sides get a
  ``bucket = hash(key) % B`` column, bucket pairs join independently
  inside ``map_groups`` (the portable partitioned hash join from
  ray_guide.md). Partitioning assumption: each bucket pair's two sides
  fit one worker's heap — size B to data volume, salt hot keys by
  raising B.
- as-of join     → :func:`asof_join`: sort both sides by (key, ts)
  within buckets, ``pd.merge_asof`` per bucket.
- range join     → :func:`range_join`: per-key interval match
  ``right_ts ∈ [left_ts+lo, left_ts+hi)`` via rank-encoded composite
  searchsorted spans inside each bucket (count or pair output).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..hashing import murmur64a
from ..keys import canonical_flat_bytes

__all__ = ["bucket_hash_join", "bucket_full_outer_join", "bucket_anti_join",
           "bucket_semi_join", "asof_join", "range_join", "band_count_self"]


def _with_bucket(ds, key: str, num_buckets: int, side: str, null_cols=None):
    """Tag rows with a hash bucket + side marker, and append typed
    padding columns for the OTHER side's exclusive fields so the two
    tagged datasets union with one schema (Ray blocks are not
    schema-aligned across a union otherwise).

    Integer/float padding uses typed ZEROS, not nulls: a padded value is
    never read (each side's own columns are selected before any output),
    but an int64 column containing nulls converts to float64 in the
    pandas group frame — silently rounding ids beyond 2^53 on the REAL
    side's rows too (the upcast hits the whole column)."""
    null_cols = list(null_cols or [])

    def add(t: pa.Table) -> pa.Table:
        data, offsets = canonical_flat_bytes(t.column(key))
        b = (murmur64a(data, offsets) % np.uint64(num_buckets)).astype(np.int64)
        t = t.append_column("__bucket", pa.array(b))
        t = t.append_column("__side", pa.array(np.full(t.num_rows, side == "r")))
        for name, typ in null_cols:
            if pa.types.is_integer(typ) or pa.types.is_floating(typ):
                pad = pa.array(np.zeros(t.num_rows), type=typ)
            else:
                pad = pa.nulls(t.num_rows, type=typ)
            t = t.append_column(name, pad)
        return t

    return ds.map_batches(add, batch_format="pyarrow")


def _schema_fields(ray_schema) -> list[tuple[str, "pa.DataType"]]:
    """(name, arrow type) pairs from a ray.data Schema (which may wrap an
    Arrow schema or a pandas block schema with numpy dtypes)."""
    out = []
    for name, typ in zip(ray_schema.names, ray_schema.types):
        if not isinstance(typ, pa.DataType):
            dt = np.dtype(typ)
            typ = pa.string() if dt == np.dtype("O") else pa.from_numpy_dtype(dt)
        out.append((name, typ))
    return out


def _exclusive_cols(fields_self, fields_other, shared):
    """(name, type) of the other side's columns this side lacks."""
    mine = {n for n, _ in fields_self}
    return [(n, t) for n, t in fields_other if n not in mine and n not in shared]


def _build_key_bloom(ds_in, on: str, num_bits: int):
    """Fold a mergeable Bloom filter over a key column: per-batch
    partial filters (vectorized add_batch), OR-merged on the driver
    (n_batches × num_bits/8 bytes — MBs, not rows)."""
    from ..sketches import BloomFilter

    def part(t: pa.Table) -> pa.Table:
        bf = BloomFilter(num_bits=num_bits)
        bf.add_batch(t.column(on))
        return pa.table({"state": pa.array([bf.to_bytes()], type=pa.binary())})

    out = BloomFilter(num_bits=num_bits)
    for blob in ds_in.map_batches(part, batch_format="pyarrow")             .to_pandas()["state"]:
        out = out.merge(BloomFilter.from_bytes(blob))
    return out


def bucket_hash_join(
    left,
    right,
    on: str,
    how: str = "inner",
    num_buckets: int = 64,
    suffixes: tuple[str, str] = ("", "_r"),
    bloom_prefilter: bool = False,
    bloom_bits: int = 1 << 23,
):
    """Partitioned hash join of two Datasets on one key column.

    Both sides are tagged with the same hash bucket, unioned, grouped by
    bucket, and joined pairwise with pandas inside each group — one
    shuffle total, work distributed across B independent bucket tasks.

    ``bloom_prefilter=True`` (inner joins only) first folds a Bloom
    filter over the RIGHT side's keys and drops left rows that cannot
    match BEFORE they enter the shuffle — the classic shuffle-volume
    reducer when the left side is much larger than the join hit rate.
    False positives just ride through and fall out of the pandas merge,
    so the result is identical; left/outer joins must keep unmatched
    left rows and reject the option.
    """
    if bloom_prefilter:
        if how != "inner":
            raise ValueError("bloom_prefilter requires how='inner' "
                             "(other joins keep unmatched left rows)")
        import ray

        bloom_ref = ray.put(_build_key_bloom(right, on, bloom_bits))

        class BloomPrune:
            def __init__(self):
                self.bf = ray.get(bloom_ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                return t.filter(pa.array(self.bf.contains_batch(t.column(on))))

        from ..util import auto_concurrency

        left = left.map_batches(BloomPrune, batch_format="pyarrow",
                                concurrency=auto_concurrency())
    lfields, rfields = _schema_fields(left.schema()), _schema_fields(right.schema())
    lcols, rcols = [n for n, _ in lfields], [n for n, _ in rfields]
    l_tagged = _with_bucket(left, on, num_buckets, "l",
                            _exclusive_cols(lfields, rfields, {on}))
    r_tagged = _with_bucket(right, on, num_buckets, "r",
                            _exclusive_cols(rfields, lfields, {on}))
    both = l_tagged.union(r_tagged)

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[~g["__side"]][lcols]
        rg = g[g["__side"]][rcols]
        out = lg.merge(rg, on=on, how=how, suffixes=suffixes)
        return out

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")


def bucket_full_outer_join(
    left,
    right,
    on: str,
    num_buckets: int = 64,
    suffixes: tuple[str, str] = ("", "_r"),
    fill: dict | None = None,
):
    """FULL OUTER partitioned hash join: every row of BOTH sides
    survives — matched pairs joined, unmatched rows of either side kept
    with the other side's columns filled.

    Same single-shuffle bucket-pair decomposition as
    :func:`bucket_hash_join` (a key's rows land in the same bucket on
    both sides, so unmatched detection is exact per bucket).
    ``bucket_hash_join(how="outer")`` already produces FULL OUTER rows
    but leaves pandas' NaN-upcast dtypes as-is; this variant exists for
    exact integer outputs. The FULL
    OUTER complication is dtype discipline: an outer merge leaves NaN in
    unmatched rows, which upcasts int64 columns to float64 — silently
    rounding ids beyond 2^53. ``fill`` maps OUTPUT column name → fill
    value; every filled column is ``fillna(fill)`` then cast back to its
    source dtype, so integer columns you keep MUST appear in ``fill``
    (the join key itself never needs one — it is present on whichever
    side matched). Numeric columns not in ``fill`` are emitted as
    float64-with-NaN in every bucket so the union schema stays
    consistent even for buckets with no unmatched rows.
    """
    fill = dict(fill or {})
    lfields = _schema_fields(left.schema())
    rfields = _schema_fields(right.schema())
    lcols, rcols = [n for n, _ in lfields], [n for n, _ in rfields]
    # output name → source dtype (suffix collisions resolved like pandas)
    out_dtypes = {on: dict(lfields)[on].to_pandas_dtype()}
    for n, t in lfields:
        if n != on:
            out_dtypes[n + (suffixes[0] if n in rcols else "")] = t.to_pandas_dtype()
    for n, t in rfields:
        if n != on:
            out_dtypes[n + (suffixes[1] if n in lcols else "")] = t.to_pandas_dtype()
    unknown = set(fill) - set(out_dtypes)
    if unknown:
        raise ValueError(f"fill for columns not in the output: {sorted(unknown)}")
    l_tagged = _with_bucket(left, on, num_buckets, "l",
                            _exclusive_cols(lfields, rfields, {on}))
    r_tagged = _with_bucket(right, on, num_buckets, "r",
                            _exclusive_cols(rfields, lfields, {on}))
    both = l_tagged.union(r_tagged)
    # int columns cross the merge as pandas nullable Int64: an outer
    # merge upcasts a plain int64 column to float64 for the WHOLE bucket
    # the moment the other side has one unmatched row, rounding matched
    # values beyond 2^53 before any fillna could save them
    null_int_l = {n: "Int64" for n, t in lfields
                  if n != on and pa.types.is_integer(t)}
    null_int_r = {n: "Int64" for n, t in rfields
                  if n != on and pa.types.is_integer(t)}

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[~g["__side"]][lcols].astype(null_int_l)
        rg = g[g["__side"]][rcols].astype(null_int_r)
        out = lg.merge(rg, on=on, how="outer", suffixes=suffixes)
        for c in out.columns:
            dt = out_dtypes[c]
            if c in fill:
                out[c] = out[c].fillna(fill[c]).astype(dt)
            elif c == on or not np.issubdtype(np.dtype(dt), np.number):
                out[c] = out[c].astype(dt)
            else:
                out[c] = out[c].astype(np.float64)
        return out

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")


def _bucket_filter_join(left, right, on: str, num_buckets: int,
                        keep_matches: bool):
    """Shared semi/anti plumbing: right side shrunk to per-batch distinct
    keys, both sides bucket-tagged, per-bucket membership filter. Output
    dtypes are restored from the left schema — the union pads the right
    side's missing columns with nulls, which upcasts int64 columns to
    float64 in the pandas group frame (silently corrupting ids beyond
    2^53 if left as-is)."""
    import pyarrow.compute as pc

    lfields = _schema_fields(left.schema())
    lcols = [n for n, _ in lfields]
    l_dtypes = {n: t.to_pandas_dtype() for n, t in lfields}

    def keys_only(t: pa.Table) -> pa.Table:
        return pa.table({on: pc.unique(t.column(on).combine_chunks())})

    r_keys = right.map_batches(keys_only, batch_format="pyarrow")
    l_tagged = _with_bucket(left, on, num_buckets, "l", [])
    r_tagged = _with_bucket(
        r_keys, on, num_buckets, "r",
        [(n, t) for n, t in lfields if n != on],
    )

    def filter_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[~g["__side"]][lcols]
        rk = g[g["__side"]][on]
        mask = lg[on].isin(rk)
        out = lg[mask if keep_matches else ~mask]
        for c, dt in l_dtypes.items():  # undo the null-union upcast
            if out[c].dtype != dt:
                out = out.astype({c: dt})
        return out

    return l_tagged.union(r_tagged).groupby("__bucket").map_groups(
        filter_bucket, batch_format="pandas"
    )


def bucket_anti_join(left, right, on: str, num_buckets: int = 64):
    """Rows of ``left`` whose ``on`` key never appears in ``right`` —
    the shuffle-based anti join for when the right key set is too large
    to broadcast (the fallback path behind the broadcast anti joins in
    pipelines/queries.py)."""
    return _bucket_filter_join(left, right, on, num_buckets, keep_matches=False)


def bucket_semi_join(left, right, on: str, num_buckets: int = 64):
    """Rows of ``left`` whose ``on`` key appears in ``right`` (each left
    row at most once) — the shuffle-based fallback for broadcast
    keep-set filters whose key set outgrows the object store."""
    return _bucket_filter_join(left, right, on, num_buckets, keep_matches=True)


def asof_join(
    left,
    right,
    key: str,
    ts: str,
    num_buckets: int = 64,
    direction: str = "backward",
    suffixes: tuple[str, str] = ("", "_r"),
):
    """As-of join: for each left row, the latest right row with the same
    ``key`` and ``right.ts <= left.ts`` (direction="backward").

    Same bucket-pair decomposition as bucket_hash_join; inside each
    bucket both sides sort by ts and use ``pd.merge_asof`` (per-key
    exact via ``by=key``)."""
    lfields, rfields = _schema_fields(left.schema()), _schema_fields(right.schema())
    lcols, rcols = [n for n, _ in lfields], [n for n, _ in rfields]
    l_tagged = _with_bucket(left, key, num_buckets, "l",
                            _exclusive_cols(lfields, rfields, {key, ts}))
    r_tagged = _with_bucket(right, key, num_buckets, "r",
                            _exclusive_cols(rfields, lfields, {key, ts}))
    both = l_tagged.union(r_tagged)
    # the asof output schema: left columns + right's exclusive columns
    r_extra = [c + (suffixes[1] if c in lcols else "")
               for c in rcols if c not in (key, ts)]

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[~g["__side"]][lcols].sort_values(ts)
        rg = g[g["__side"]][rcols].sort_values(ts)
        if lg.empty:
            out = lg.copy()
            for name in r_extra:
                out[name] = pd.Series([], dtype="object")
            return out
        if rg.empty:
            out = lg.copy()
            for name in r_extra:
                out[name] = pd.NA
            return out
        return pd.merge_asof(lg, rg, on=ts, by=key, direction=direction,
                             suffixes=suffixes)

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")


def range_join(
    left,
    right,
    key: str,
    left_ts: str,
    right_ts: str,
    lo,
    hi,
    how: str = "count",
    count_col: str = "n_matches",
    num_buckets: int = 64,
    suffixes: tuple[str, str] = ("", "_r"),
):
    """Keyed interval join: for each left row, the right rows with the
    same ``key`` and ``right_ts ∈ [left_ts + lo, left_ts + hi)``.

    ``how="count"`` returns the left columns + ``count_col`` (0 when no
    match — LEFT JOIN COUNT semantics); ``how="inner"`` emits one row
    per matched pair (can multiply rows; bounded by the per-bucket
    match volume).

    Same bucket-pair decomposition as :func:`bucket_hash_join` (shuffle
    on ``hash(key) % B``; assumption: each bucket pair fits a worker).
    Inside a bucket the match is fully vectorized: both sides' (key, ts)
    are rank-encoded into one int64 composite, the right side sorted
    once, and every left row's match span found with two
    ``np.searchsorted`` calls — no per-row loop, no pandas merge blowup.

    ``lo``/``hi`` must be offsets in the ts column's algebra
    (``pd.Timedelta`` for datetime columns, numbers for numeric ts).
    """
    if how not in ("count", "inner"):
        raise ValueError(f"how must be 'count' or 'inner', got {how!r}")
    lfields, rfields = _schema_fields(left.schema()), _schema_fields(right.schema())
    lcols, rcols = [n for n, _ in lfields], [n for n, _ in rfields]
    shared = {key} | ({left_ts} if left_ts == right_ts else set())
    l_tagged = _with_bucket(left, key, num_buckets, "l",
                            _exclusive_cols(lfields, rfields, shared))
    r_tagged = _with_bucket(right, key, num_buckets, "r",
                            _exclusive_cols(rfields, lfields, shared))
    both = l_tagged.union(r_tagged)
    r_out = [(c, c + (suffixes[1] if c in lcols else ""))
             for c in rcols if c not in (key, right_ts)] if how == "inner" else []
    l_dtypes = {n: t.to_pandas_dtype() for n, t in lfields}

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[~g["__side"]][lcols]
        rg = g[g["__side"]][rcols]
        for c, dt in l_dtypes.items():  # undo the null-union upcast
            if c in lg and lg[c].dtype != dt:
                lg = lg.astype({c: dt})
        key_l = lg[key].to_numpy()
        ts_l = lg[left_ts].to_numpy()
        lo_b, hi_b = ts_l + lo, ts_l + hi
        key_r = rg[key].to_numpy()
        ts_r = rg[right_ts].to_numpy()
        # rank-encode (key, ts) into one sortable int64 composite
        uk = np.unique(np.concatenate([key_r, key_l]))
        ut = np.unique(np.concatenate([ts_r, lo_b, hi_b]))
        M = np.int64(len(ut) + 1)
        comp_r = np.searchsorted(uk, key_r) * M + np.searchsorted(ut, ts_r)
        order_r = np.argsort(comp_r, kind="stable")
        comp_r = comp_r[order_r]
        kr_l = np.searchsorted(uk, key_l) * M
        s = np.searchsorted(comp_r, kr_l + np.searchsorted(ut, lo_b))
        e = np.searchsorted(comp_r, kr_l + np.searchsorted(ut, hi_b))
        counts = e - s
        if how == "count":
            out = lg.reset_index(drop=True)
            out[count_col] = counts.astype(np.int64)
            return out
        total = int(counts.sum())
        li = np.repeat(np.arange(len(lg)), counts)
        ri = order_r[np.repeat(s, counts)
                     + (np.arange(total) - np.repeat(np.cumsum(counts) - counts,
                                                     counts))]
        out = lg.reset_index(drop=True).iloc[li].reset_index(drop=True)
        rg = rg.reset_index(drop=True)
        for src, dst in r_out:
            out[dst] = rg[src].to_numpy()[ri]
        return out

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")


def band_count_self(
    ds,
    on: str,
    d: int,
    carry: tuple = (),
    num_buckets: int = 64,
    count_col: str = "n_near",
    bounds: tuple | None = None,
):
    """Keyless numeric band self-join, count form: for every row, how
    many rows of the WHOLE table (itself included) have ``on`` within
    ±``d`` inclusive. ``on`` must be an INTEGER column (fixed-point
    money, epoch micros, ...) so the ±d boundaries are exact — float
    bands silently disagree with SQL at the boundary.

    This is the classic distributed band join (the non-equi join no
    hash exchange can route): partition the VALUE domain into
    fixed-width ranges and replicate each row into every adjacent range
    its ±d halo touches — the "ghost cell" exchange of stencil codes.
    Width is ``max(span/num_buckets, 2d+1)``, so a halo reaches at most
    the two adjacent ranges and duplication is ≤3× worst-case (~1× when
    width ≫ d). Each row is OWNED by its home range alone; halo copies
    only serve as neighbors, so every (row, neighbor) relation is
    examined in exactly one bucket and the count is exact with ONE
    exchange and no pair enumeration: per bucket the combined values
    sort once and each owner's answer is two ``np.searchsorted``
    probes.

    Partitioning assumption: the value distribution spreads across
    ranges (skew bound: a single 2d-wide value cluster lands in one
    worker). ``carry`` columns ride on owner rows only (halo copies pad
    typed zeros, never read — the int64-null upcast trap). ``bounds=
    (lo, hi)`` skips the min/max pre-pass.
    """
    import ray.data.aggregate as ragg

    d = int(d)
    if bounds is None:
        mm = ds.aggregate(ragg.Min(on), ragg.Max(on))
        lo, hi = int(mm[f"min({on})"]), int(mm[f"max({on})"])
    else:
        lo, hi = int(bounds[0]), int(bounds[1])
    span = hi - lo + 1
    w = max(-(-span // num_buckets), 2 * d + 1)
    nb = -(-span // w)
    carry = list(carry)

    def emit(t: pa.Table) -> pa.Table:
        v = t.column(on).to_numpy(zero_copy_only=False).astype(np.int64)
        home = (v - lo) // w
        cols = {c: t.column(c).to_numpy(zero_copy_only=False) for c in carry}
        parts_v, parts_b = [v], [home]
        parts_o, parts_c = [np.ones(len(v), bool)], [cols]
        for shift in (-d, d):
            hb = np.clip((v + shift - lo) // w, 0, nb - 1)
            m = hb != home
            if m.any():
                parts_v.append(v[m])
                parts_b.append(hb[m])
                parts_o.append(np.zeros(int(m.sum()), bool))
                parts_c.append({c: np.zeros(int(m.sum()), dtype=a.dtype)
                                if a.dtype.kind in "iuf" else a[m]
                                for c, a in cols.items()})
        out = {"__b": np.concatenate(parts_b).astype(np.int64),
               on: np.concatenate(parts_v),
               "__own": np.concatenate(parts_o)}
        for c in carry:
            out[c] = np.concatenate([p[c] for p in parts_c])
        return pa.table(out)

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        v = g[on].to_numpy()
        own = g["__own"].to_numpy()
        vo = v[own]
        sv = np.sort(v)
        cnt = (np.searchsorted(sv, vo + d, side="right")
               - np.searchsorted(sv, vo - d, side="left"))
        out = g.loc[own, carry].reset_index(drop=True)
        out[count_col] = cnt.astype(np.int64)
        return out

    return ds.map_batches(emit, batch_format="pyarrow") \
        .groupby("__b").map_groups(count_bucket, batch_format="pandas")


def interval_overlap_count(
    left,
    right,
    left_cols: tuple,
    right_cols: tuple = ("lo", "hi"),
    id_cols: tuple = (),
    num_buckets: int = 64,
    count_col: str = "n_overlaps",
):
    """KEYLESS interval-overlap join, count form: for every left
    interval [a, b], how many right intervals [lo, hi] OVERLAP it
    (closed-ended: lo ≤ b ∧ hi ≥ a) — the temporal join behind
    "which incident windows touched my session" that no equi-exchange
    can route.

    Range-partition the TIME axis; every interval is replicated to each
    range its span touches (replication factor = span/width + 1 — skew
    bound: one pathological hour-long bucket of intervals lands on one
    worker). Each overlapping pair is counted EXACTLY ONCE via the
    OVERLAP-START ownership rule: the pair belongs to the range
    containing max(a, lo), which both intervals provably touch. Inside
    a bucket everything is searchsorted algebra over the bucket's
    sorted lo/hi arrays:

    - case lo ≥ a (start = lo): count lo ∈ [max(a, BLO), min(b, BHI)]
      — hi ≥ a holds automatically, and restricting lo to the bucket
      range dedups across the window's other copies;
    - case lo < a (start = a): evaluated ONLY by the left copy in a's
      home bucket: count (lo < a) − (hi < a) (every such window's span
      contains a, so its copy is present here).

    Left ``id_cols`` ride every copy; partial counts (including zeros —
    LEFT-join semantics) sum per id in one final small groupby. Two
    exchanges total, no pair materialization. Integer endpoints only.
    """
    import ray.data.aggregate as ragg

    la_col, lb_col = left_cols
    rlo_col, rhi_col = right_cols
    id_cols = list(id_cols)

    mm_l = left.aggregate(ragg.Min(la_col), ragg.Max(lb_col))
    mm_r = right.aggregate(ragg.Min(rlo_col), ragg.Max(rhi_col))
    axis_lo = int(min(mm_l[f"min({la_col})"],
                      mm_r[f"min({rlo_col})"] if mm_r[f"min({rlo_col})"]
                      is not None else mm_l[f"min({la_col})"]))
    axis_hi = int(max(mm_l[f"max({lb_col})"],
                      mm_r[f"max({rhi_col})"] if mm_r[f"max({rhi_col})"]
                      is not None else mm_l[f"max({lb_col})"]))
    w = max(1, -(-(axis_hi - axis_lo + 1) // num_buckets))

    def replicate(t: pa.Table, a_col, b_col, side: str,
                  carry: list) -> pa.Table:
        a = t.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b0 = (a - axis_lo) // w
        b1 = (b - axis_lo) // w
        reps = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(a)), reps)
        # bucket of copy j of row i = b0[i] + j
        off = np.arange(int(reps.sum()), dtype=np.int64) \
            - np.repeat(np.cumsum(reps) - reps, reps)
        cols = {"__bk": np.repeat(b0, reps) + off,
                "__s": np.full(int(reps.sum()), side == "r"),
                "__a": a[idx], "__b": b[idx]}
        for c in carry:
            v = t.column(c).to_numpy(zero_copy_only=False)
            cols[c] = v[idx]
        return pa.table(cols)

    pad_int = [(c, np.int64(0)) for c in id_cols]

    l_rep = left.map_batches(
        lambda t: replicate(t, la_col, lb_col, "l", id_cols),
        batch_format="pyarrow")
    r_rep = right.map_batches(
        lambda t: _pad_right(replicate(t, rlo_col, rhi_col, "r", []),
                             pad_int),
        batch_format="pyarrow")
    both = l_rep.union(r_rep)

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        bk = int(g["__bk"].iloc[0])
        blo = axis_lo + bk * w
        bhi = blo + w - 1  # inclusive range end
        is_r = g["__s"].to_numpy(dtype=bool)
        rlo = np.sort(g.loc[is_r, "__a"].to_numpy(dtype=np.int64))
        rhi = np.sort(g.loc[is_r, "__b"].to_numpy(dtype=np.int64))
        lg = g[~is_r]
        a = lg["__a"].to_numpy(dtype=np.int64)
        b = lg["__b"].to_numpy(dtype=np.int64)
        # case 1: lo in [max(a, blo), min(b, bhi)]
        lo_from = np.maximum(a, blo)
        lo_to = np.minimum(b, bhi)
        c1 = (np.searchsorted(rlo, lo_to, side="right")
              - np.searchsorted(rlo, lo_from, side="left"))
        c1 = np.where(lo_to >= lo_from, c1, 0)
        # case 2: lo < a ≤ hi, only in a's home bucket
        home = (blo <= a) & (a <= bhi)
        c2 = (np.searchsorted(rlo, a, side="left")
              - np.searchsorted(rhi, a, side="left"))
        n = c1 + np.where(home, c2, 0)
        out = lg[id_cols].reset_index(drop=True)
        out[count_col] = n.astype(np.int64)
        return out

    parts = both.groupby("__bk") \
        .map_groups(count_bucket, batch_format="pandas")

    # final per-interval sum across its copies' partials — DISTRIBUTED
    # (one id-hash exchange): the partial set is n_left × replication
    # rows, which must never fold on the driver at scale
    from ..hashing import murmur64a
    from ..keys import canonical_flat_bytes

    def id_bucket(t: pa.Table) -> pa.Table:
        data, offsets = canonical_flat_bytes(t.column(id_cols[0]))
        h = murmur64a(data, offsets)
        return t.append_column("__ib", pa.array(
            (h % np.uint64(num_buckets)).astype(np.int64)))

    def sum_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(id_cols, as_index=False)[count_col].sum()
        return out.astype({count_col: "int64"})

    agg = parts.map_batches(id_bucket, batch_format="pyarrow") \
        .groupby("__ib").map_groups(sum_bucket, batch_format="pandas") \
        .to_pandas()
    return agg.astype({count_col: "int64"})


def _pad_right(t: pa.Table, pad_int: list) -> pa.Table:
    """Typed-zero padding for the right side's missing id columns
    (int64 nulls upcast whole bucket frames to float64 — the 2^53 id
    trap)."""
    for c, z in pad_int:
        t = t.append_column(c, pa.array(
            np.zeros(t.num_rows, dtype=np.int64)))
    return t
