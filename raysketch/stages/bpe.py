"""Distributed BPE tokenizer training past the 2-merge demo
(VERDICT r03 item 5): N merge rounds over an int32 SYMBOL corpus
(0 = document boundary, 1..255 = raw UTF-8 bytes, 256+r = the round-r
merge symbol), with INCREMENTAL pair-count maintenance — each round's
rewrite also emits the exact sparse count delta from the spans it
touched, so the global pair-count vector is updated in O(merge sites)
instead of a full corpus recount (Sennrich et al. 2016, the
occurrence-list trick of the reference implementations re-expressed as
a per-batch vectorized delta).

Distributed shape: the corpus lives as a materialized Dataset of flat
per-batch symbol runs (int32, wire-packed as large_binary); each round
is ONE map_batches pass (rewrite + delta fused — zero shuffles), the
≤(256+N)²-entry sparse deltas fold on the driver, and the winner pick
is a driver argmax. N materialized rewrites are inherent to BPE
training; real systems train on a bounded sample — pass such a
Dataset in.

Greedy left-to-right non-overlapping merge semantics (``'aaa'`` with
merge (a,a) → ``(aa)a``), identical to the ``replace_substring`` /
SQL-``replace`` semantics the oracle-checked 2-merge twin
(pipelines/queries.py bpe_two_merges) locks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["bpe_train", "bpe_encode", "bounded_symbol_sample"]


def bounded_symbol_sample(ds, char_budget: int, text_col: str = "text",
                          id_col: str = "doc_id", seed: int = 0x5157):
    """Deterministic symbol-budget cap on a training corpus (VERDICT
    r04 item 2): admit WHOLE documents in ``murmur64a(id)`` order until
    the cumulative UTF-8 byte count reaches ``char_budget``, then
    filter the Dataset to the admitted ids — the bottom-k-by-hash
    idiom (similarity.py deterministic_sample) sized by a byte budget
    instead of a row count.

    Deterministic at any parallelism / batch layout: admission is a
    pure function of the (id, text-length) set.  Only 16-byte
    (hash, n_bytes) rows ever shuffle — text stays in place and is
    filtered by ONE zero-shuffle pass against the driver-held cutoff
    hash.  The driver reads the sorted tiny table only up to the
    budget (O(sample docs), not O(corpus)).  When the whole corpus
    fits the budget every document is admitted, so training equals
    the uncapped run exactly (equality lock in
    test_bpe_budget_cap_admits_all)."""
    from ..hashing import murmur64a
    from ..keys import canonical_flat_bytes

    sd = np.uint64((seed & 0xFFFFFFFF) | 1)

    def _doc_hashes(t: pa.Table) -> np.ndarray:
        data, off = canonical_flat_bytes(t.column(id_col))
        h = murmur64a(data, off, sd).astype(np.uint64)
        # 63-bit so signed Dataset sort and unsigned numpy agree
        return (h >> np.uint64(1)).astype(np.int64)

    def hnb(t: pa.Table) -> pa.Table:
        nb = pc.fill_null(
            pc.binary_length(pc.cast(t.column(text_col),
                                     pa.large_binary())), 0)
        return pa.table({"h": pa.array(_doc_hashes(t)),
                         "nb": pc.cast(nb, pa.int64())})

    cutoff = None
    cum = 0
    for b in ds.map_batches(hnb, batch_format="pyarrow").sort("h") \
            .iter_batches(batch_format="pyarrow", batch_size=4096):
        h = b.column("h").to_numpy()
        nb = b.column("nb").to_numpy()
        run = cum + np.cumsum(nb)
        # admit while the PRIOR cumulative total is under budget
        adm = np.flatnonzero(run - nb < char_budget)
        if len(adm):
            cutoff = int(h[adm[-1]])
        cum = int(run[-1])
        if cum >= char_budget:
            break
    if cutoff is None:
        cutoff = -1  # empty corpus or zero budget → admit nothing

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(_doc_hashes(t) <= cutoff))

    return ds.map_batches(keep, batch_format="pyarrow")


def _to_symbol_rows(text_col: str):
    """Doc batch → ONE row holding the batch's flat int32 symbol run
    (docs joined by the 0 boundary symbol), packed as large_binary."""

    def fn(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        s = np.frombuffer("\x00".join(x or "" for x in texts)
                          .encode("utf-8"), dtype=np.uint8)
        return pa.table({"seq": pa.array([s.astype(np.int32).tobytes()],
                                         type=pa.large_binary())})

    return fn


def _seq_of(row_val: bytes) -> np.ndarray:
    return np.frombuffer(row_val, dtype=np.int32)


def _pair_codes(seq: np.ndarray, V: int) -> np.ndarray:
    """Adjacent-pair codes a·V+b, boundary-containing pairs dropped."""
    if len(seq) < 2:
        return np.empty(0, dtype=np.int64)
    a = seq[:-1].astype(np.int64)
    b = seq[1:].astype(np.int64)
    m = (a != 0) & (b != 0)
    return a[m] * V + b[m]


def _greedy_sites(seq: np.ndarray, a: int, b: int) -> np.ndarray:
    """Left-to-right non-overlapping match positions of (a, b)."""
    m = np.nonzero((seq[:-1] == a) & (seq[1:] == b))[0]
    if len(m) == 0 or a != b:
        # a != b → matches are never adjacent (overlap needs s[p+1]=b=a)
        return m
    # runs of consecutive positions: keep even offsets within each run
    run_start = np.r_[True, np.diff(m) > 1]
    run_idx = np.cumsum(run_start) - 1
    first = m[run_start]
    return m[(m - first[run_idx]) % 2 == 0]


def _apply_merge(seq: np.ndarray, kept: np.ndarray, z: int) -> np.ndarray:
    out = seq.copy()
    out[kept] = z
    mask = np.ones(len(seq), dtype=bool)
    mask[kept + 1] = False
    return out[mask]


def _merge_delta(seq: np.ndarray, new: np.ndarray, kept: np.ndarray,
                 V: int) -> tuple[np.ndarray, np.ndarray]:
    """Exact sparse pair-count delta of one merge pass over one run:
    pairs whose content or adjacency changed all lie in the ±1 windows
    around merge sites (old side) / merged symbols (new side); every
    other pair is only position-shifted and contributes identically."""
    oidx = np.unique(np.concatenate([kept - 1, kept, kept + 1]))
    oidx = oidx[(oidx >= 0) & (oidx < len(seq) - 1)]
    oa = seq[oidx].astype(np.int64)
    ob = seq[oidx + 1].astype(np.int64)
    om = (oa != 0) & (ob != 0)
    rem = oa[om] * V + ob[om]
    # new position of merge i = kept[i] − i (each earlier site deleted
    # exactly one element before it)
    npos = kept - np.arange(len(kept))
    nidx = np.unique(np.concatenate([npos - 1, npos]))
    nidx = nidx[(nidx >= 0) & (nidx < len(new) - 1)]
    na = new[nidx].astype(np.int64)
    nb = new[nidx + 1].astype(np.int64)
    nm = (na != 0) & (nb != 0)
    add = na[nm] * V + nb[nm]
    codes = np.concatenate([add, rem])
    vals = np.concatenate([np.ones(len(add), np.int64),
                           -np.ones(len(rem), np.int64)])
    order = np.argsort(codes, kind="stable")
    codes, vals = codes[order], vals[order]
    starts = np.nonzero(np.r_[True, codes[1:] != codes[:-1]])[0] \
        if len(codes) else np.empty(0, np.int64)
    c = codes[starts]
    v = np.add.reduceat(vals, starts) if len(starts) else vals
    nz = v != 0
    return c[nz], v[nz]


def _pick_winner(counts: np.ndarray, singles, V: int, score: str):
    """Argmax over the global pair-count vector — shared by the
    distributed round loop and the bounded driver-local loop so the
    two paths cannot diverge. Returns (a, b, n) or None."""
    nz = np.flatnonzero(counts > 1)
    if not len(nz):
        return None
    n = counts[nz]
    la, lb = nz // V, nz % V
    if score == "wordpiece":
        ca, cb = singles[la], singles[lb]
        f = n / (ca.astype(np.float64) * cb.astype(np.float64))
        near = np.flatnonzero(f >= f.max() * (1.0 - 1e-9))
        win = -1
        for i in near.tolist():  # exact rational argmax over ties
            if win < 0:
                win = i
                continue
            lhs = int(n[i]) * int(ca[win]) * int(cb[win])
            rhs = int(n[win]) * int(ca[i]) * int(cb[i])
            if lhs > rhs or (lhs == rhs and (la[i], lb[i])
                             < (la[win], lb[win])):
                win = i
    else:
        win = np.lexsort((lb, la, -n))[0]
    return int(la[win]), int(lb[win]), int(n[win])


def _train_local(seq: np.ndarray, V: int, n_merges: int,
                 score: str) -> list[dict]:
    """Driver-local round loop over ONE bounded symbol run — used when
    a char_budget proves the training input small. Byte-equal to the
    distributed loop: same kernels (_greedy_sites/_apply_merge/
    _merge_delta), same _pick_winner, and one concatenated
    boundary-joined run has the identical global pair/singles counts
    as the per-row runs it came from (boundary pairs are masked)."""
    counts = np.zeros(V * V, dtype=np.int64)
    codes = _pair_codes(seq, V)
    if len(codes):
        counts += np.bincount(codes, minlength=V * V)
    singles = np.bincount(seq, minlength=V).astype(np.int64)
    singles[0] = 0
    merges: list[dict] = []
    for r in range(n_merges):
        w = _pick_winner(counts, singles, V, score)
        if w is None:
            break
        a, b, cnt = w
        z = 256 + r
        merges.append({"round": np.int64(r + 1), "left": np.int64(a),
                       "right": np.int64(b), "new_sym": np.int64(z),
                       "n": np.int64(cnt)})
        kept = _greedy_sites(seq, a, b)
        if len(kept):
            new = _apply_merge(seq, kept, z)
            dc, dv = _merge_delta(seq, new, kept, V)
            np.add.at(counts, dc, dv)
            singles[a] -= len(kept)
            singles[b] -= len(kept)
            singles[z] += len(kept)
            seq = new
    return merges


def bpe_train(ds, text_col: str = "text", n_merges: int = 50,
              incremental: bool = True,
              score: str = "bpe", char_budget: int | None = None,
              id_col: str = "doc_id") -> pd.DataFrame:
    """Learn ``n_merges`` merges over ``ds[text_col]``. Returns
    DataFrame(round, left, right, new_sym, n) — winner each round by
    (score desc, left asc, right asc); stops early when no pair
    repeats. ``incremental=False`` is the full-recount twin (one
    corpus-wide pair count per round) used to equality-lock the delta
    maintenance (test_bpe_incremental_equals_recount).

    ``score="bpe"`` ranks candidates by raw pair count (Sennrich'16);
    ``score="wordpiece"`` ranks by the WordPiece likelihood gain
    count(ab)/(count(a)·count(b)) (Schuster & Nakajima ICASSP'12, the
    BERT tokenizer), which additionally needs the per-SYMBOL counts —
    maintained incrementally from the per-row merge-site counts the
    rewrite pass already knows (count(z) += sites, count(a) -= sites,
    count(b) -= sites). The argmax is EXACT: float64 pre-ranking keeps
    only candidates within 1e-9 relative of the top (float ratio error
    is ~1e-15), then Python-int cross-multiplication
    n₁·c(a₂)·c(b₂) vs n₂·c(a₁)·c(b₁) decides — no float tie can
    mis-order."""
    if score not in ("bpe", "wordpiece"):
        raise ValueError(f"score must be 'bpe' or 'wordpiece', got {score!r}")
    V = 256 + n_merges
    if char_budget is not None:
        # bounded-sample training input (VERDICT r04 item 2): real
        # systems never train a tokenizer on the full corpus; a budget
        # at or above the corpus size reproduces the uncapped merges
        # exactly (whole corpus admitted). The budget also BOUNDS the
        # gathered sample (≤ budget + one overshoot doc per admission
        # boundary), so the N-round loop runs driver-local — 50
        # materialize rounds of Ray scheduling cost more than the
        # entire bounded compute. Equality with the distributed loop
        # is locked by test_bpe_budget_cap_admits_all.
        sampled = bounded_symbol_sample(ds, char_budget, text_col, id_col)
        runs = [
            _seq_of(rv)
            for t in sampled.map_batches(_to_symbol_rows(text_col),
                                         batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow", batch_size=None)
            for rv in t.column("seq").to_pylist()
        ]
        sep = np.zeros(1, dtype=np.int32)
        parts: list[np.ndarray] = []
        for x in runs:
            if parts:
                parts.append(sep)
            parts.append(x)
        seq = np.concatenate(parts) if parts \
            else np.empty(0, dtype=np.int32)
        merges = _train_local(seq, V, n_merges, score)
        return pd.DataFrame(
            merges, columns=["round", "left", "right", "new_sym", "n"]) \
            .astype({c: "int64" for c in
                     ("round", "left", "right", "new_sym", "n")})

    state = ds.map_batches(_to_symbol_rows(text_col),
                           batch_format="pyarrow").materialize()

    def singles_counts(st) -> np.ndarray:
        total = np.zeros(V, dtype=np.int64)

        def part(t: pa.Table) -> pa.Table:
            acc = np.zeros(V, dtype=np.int64)
            for rv in t.column("seq").to_pylist():
                acc += np.bincount(_seq_of(rv), minlength=V)
            acc[0] = 0
            nz = np.flatnonzero(acc)
            return pa.table({"c": pa.array(nz.astype(np.int64)),
                             "v": pa.array(acc[nz])})

        for b in st.map_batches(part, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow", batch_size=None):
            np.add.at(total, b.column("c").to_numpy(),
                      b.column("v").to_numpy())
        return total

    def full_counts(st) -> np.ndarray:
        total = np.zeros(V * V, dtype=np.int64)

        def part(t: pa.Table) -> pa.Table:
            acc = np.zeros(V * V, dtype=np.int64)
            for rv in t.column("seq").to_pylist():
                codes = _pair_codes(_seq_of(rv), V)
                if len(codes):
                    acc += np.bincount(codes, minlength=V * V)
            nz = np.flatnonzero(acc)
            return pa.table({"c": pa.array(nz.astype(np.int64)),
                             "v": pa.array(acc[nz])})

        for b in st.map_batches(part, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow", batch_size=None):
            np.add.at(total, b.column("c").to_numpy(),
                      b.column("v").to_numpy())
        return total

    counts = full_counts(state)
    singles = singles_counts(state) if score == "wordpiece" else None
    merges = []
    for r in range(n_merges):
        w = _pick_winner(counts, singles, V, score)
        if w is None:
            break
        a, b, cnt = w
        z = 256 + r
        merges.append({"round": np.int64(r + 1), "left": np.int64(a),
                       "right": np.int64(b), "new_sym": np.int64(z),
                       "n": np.int64(cnt)})

        def rewrite(t: pa.Table, _a=a, _b=b, _z=z) -> pa.Table:
            seqs, dcs, dvs, nss = [], [], [], []
            for rv in t.column("seq").to_pylist():
                seq = _seq_of(rv)
                kept = _greedy_sites(seq, _a, _b)
                if len(kept):
                    new = _apply_merge(seq, kept, _z)
                    dc, dv = _merge_delta(seq, new, kept, V)
                else:
                    new, dc = seq, np.empty(0, np.int64)
                    dv = np.empty(0, np.int64)
                seqs.append(new.tobytes())
                dcs.append(dc)
                dvs.append(dv)
                nss.append(len(kept))
            return pa.table({
                "seq": pa.array(seqs, type=pa.large_binary()),
                "dc": pa.array([x.tolist() for x in dcs],
                               type=pa.large_list(pa.int64())),
                "dv": pa.array([x.tolist() for x in dvs],
                               type=pa.large_list(pa.int64())),
                "ns": pa.array(np.array(nss, dtype=np.int64)),
            })

        state = state.map_batches(rewrite,
                                  batch_format="pyarrow").materialize()
        if incremental:
            sites = 0
            for blk in state.select_columns(["dc", "dv", "ns"]) \
                    .iter_batches(batch_format="pyarrow", batch_size=None):
                dc = blk.column("dc").combine_chunks().flatten() \
                    .to_numpy(zero_copy_only=False)
                dv = blk.column("dv").combine_chunks().flatten() \
                    .to_numpy(zero_copy_only=False)
                if len(dc):
                    np.add.at(counts, dc, dv)
                sites += int(blk.column("ns").to_numpy().sum())
            if score == "wordpiece":
                # a == b decrements the same slot twice — correct: each
                # merge consumes TWO copies of that symbol
                singles[a] -= sites
                singles[b] -= sites
                singles[z] += sites
        else:
            counts = full_counts(state)
            if score == "wordpiece":
                singles = singles_counts(state)

    return pd.DataFrame(
        merges, columns=["round", "left", "right", "new_sym", "n"]) \
        .astype({c: "int64" for c in
                 ("round", "left", "right", "new_sym", "n")})


def bpe_encode(ds, merges: pd.DataFrame, text_col: str = "text",
               id_col: str = "doc_id"):
    """Apply a learned merge table (bpe_train output) to a document
    Dataset — the tokenizer-APPLY half of the train→apply loop.
    Merges apply in training order with the same greedy left-to-right
    non-overlapping semantics training used (Sennrich'16 encode).

    Distributed shape: the ≤n_merges-row merge table is a plain
    closure constant (bytes, not an object-store citizen); encoding is
    ONE zero-shuffle map_batches pass — each batch becomes one flat
    int32 symbol run (docs joined by the 0 boundary, which no merge
    can cross since training masks boundary pairs), every merge is a
    vectorized scan over the run, and per-doc token counts fall out of
    one bincount over separator-cumsum doc indices. Returns a Dataset
    of (id, n_bytes, n_tokens)."""
    mlist = [(int(r.left), int(r.right), int(r.new_sym))
             for r in merges.itertuples()]

    def enc(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        nd = len(texts)
        bs = [(x or "").encode("utf-8") for x in texts]
        seq = np.frombuffer(b"\x00".join(bs), dtype=np.uint8) \
            .astype(np.int32)
        for a, b, z in mlist:
            kept = _greedy_sites(seq, a, b)
            if len(kept):
                seq = _apply_merge(seq, kept, z)
        doc = np.cumsum(seq == 0)
        ntok = np.bincount(doc[seq != 0], minlength=nd) if len(seq) \
            else np.zeros(nd, dtype=np.int64)
        return pa.table({
            id_col: t.column(id_col),
            "n_bytes": pa.array(np.array([len(x) for x in bs],
                                         dtype=np.int64)),
            "n_tokens": pa.array(ntok.astype(np.int64)),
        })

    return ds.map_batches(enc, batch_format="pyarrow")
