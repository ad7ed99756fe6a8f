"""SentencePiece-style UNIGRAM LM tokenizer — distributed hard-EM
(Viterbi) training (Kudo, ACL'18 "Subword Regularization", the unigram
model; hard-EM is the deterministic variant: E-step = best
segmentation counts, M-step = add-one-smoothed count ratios).

Everything is EXACT so the result is bit-identical at any parallelism
and twice-implementable for tests:

- Piece probabilities are exact rationals p_i = (c_i + 1)/(Σ(c_j + 1))
  over int64 counts folded commutatively.
- A segmentation's score Π p_i is compared CROSS-MULTIPLIED in big-int
  Python arithmetic (num_a·den^k_b vs num_b·den^k_a) — no float ever
  enters the DP, so ties are decided by the documented deterministic
  order (higher score, then fewer pieces, then lexicographically
  smaller piece-id path) on every engine the same way.

Scale shape: the corpus collapses ONCE to a distinct-WORD count table
(one hash exchange over (word, count) rows — the word table, not the
corpus, is the unit of all later work). Each EM round is one
map_batches over the word table: the ≤seed_vocab piece table rides in
as a broadcast, each task runs the per-word DP (a Python loop over
DISTINCT words — corpus-size-independent; each word is ≤ a few dozen
chars so the DP is O(len·max_piece_len) with tiny big-ints) and emits
ONE piece-count partial vector per batch; the driver folds
piece-bounded int64 vectors, never rows. Seeding folds substring
counts the same way under an explicit cap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["word_count_table", "train_unigram", "viterbi_encode",
           "UnigramModel"]


def word_count_table(ds, text_col: str = "text",
                     num_buckets: int = 32):
    """Corpus → globally-reduced (word, count) Dataset: per-batch
    value_counts shrink the exchange, one word-hash bucket shuffle
    finishes the reduction."""
    import pandas as pd

    from ..hashing import murmur64a
    from ..keys import canonical_flat_bytes
    from .dedup import _splitmix64

    def part(t: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.split_pattern(
            pc.fill_null(t.column(text_col), ""), " "))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = pc.value_counts(toks.combine_chunks())
        words = vc.field("values")
        data, offsets = canonical_flat_bytes(words)
        h = murmur64a(data, offsets)
        b = (_splitmix64(h) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({"word": words,
                         "count": pc.cast(vc.field("counts"),
                                          pa.int64()),
                         "__b": pa.array(b)})

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("word", as_index=False)["count"].sum()
        return out.sort_values("word").reset_index(drop=True)

    return ds.map_batches(part, batch_format="pyarrow") \
        .groupby("__b").map_groups(reduce_bucket, batch_format="pandas")


class UnigramModel:
    """Trained piece table: ``pieces`` (sorted unique strings),
    ``counts`` (final Viterbi counts, int64), smoothed probability
    numerators ``nums = counts + 1`` over denominator ``den``."""

    def __init__(self, pieces: list[str], counts: np.ndarray):
        self.pieces = list(pieces)
        self.counts = np.asarray(counts, dtype=np.int64)
        self.nums = self.counts + 1
        self.den = int(self.nums.sum())
        self.lookup = {p: i for i, p in enumerate(self.pieces)}
        self.max_len = max((len(p) for p in self.pieces), default=1)

    def table(self):
        import pandas as pd

        return pd.DataFrame({"piece": self.pieces,
                             "count": self.counts})


def viterbi_encode(word: str, model: UnigramModel) -> tuple[int, ...]:
    """Best segmentation of ``word`` as a tuple of piece ids —
    exact big-int rational DP, deterministic tiebreak (score desc,
    fewer pieces, lexicographically smaller id path). Raises if the
    word is unsegmentable (a char outside the piece table)."""
    L = len(word)
    nums = model.nums
    den = model.den
    look = model.lookup
    # best[pos] = (num, k, path)
    best: list = [None] * (L + 1)
    best[0] = (1, 0, ())
    for i in range(L):
        cur = best[i]
        if cur is None:
            continue
        na, ka, path = cur
        for j in range(i + 1, min(L, i + model.max_len) + 1):
            pid = look.get(word[i:j])
            if pid is None:
                continue
            cn, ck = na * int(nums[pid]), ka + 1
            old = best[j]
            if old is None:
                best[j] = (cn, ck, path + (pid,))
                continue
            ob, ok, opath = old
            lhs = cn * den ** ok
            rhs = ob * den ** ck
            npath = path + (pid,)
            if (lhs > rhs or (lhs == rhs and
                              (ck < ok or (ck == ok and npath < opath)))):
                best[j] = (cn, ck, npath)
    if best[L] is None:
        raise ValueError(f"unsegmentable word: {word!r}")
    return best[L][2]


def _fold_piece_counts(word_ds, model: UnigramModel) -> np.ndarray:
    """One E-step: Viterbi-count every distinct word (weighted by its
    corpus count), folded as piece-bounded int64 partial vectors."""
    import ray

    n = len(model.pieces)
    model_ref = ray.put(model)

    def part(t: pa.Table) -> pa.Table:
        m = ray.get(model_ref)
        out = np.zeros(n, dtype=np.int64)
        words = t.column("word").to_pylist()
        cnts = t.column("count").to_numpy(zero_copy_only=False)
        for w, c in zip(words, cnts):
            for pid in viterbi_encode(w, m):
                out[pid] += int(c)
        return pa.table({"v": pa.array([out.tolist()])})

    acc = np.zeros(n, dtype=np.int64)
    for b in word_ds.map_batches(part, batch_format="pyarrow",
                                 batch_size=None) \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_rows:
            acc += np.asarray(b.column("v").to_pylist()[0],
                              dtype=np.int64)
    return acc


def _seed_pieces(word_ds, max_piece_len: int, seed_vocab: int,
                 sub_cap: int = 2_000_000) -> tuple[list[str], np.ndarray]:
    """Seed piece table: every substring of length ≤ max_piece_len of
    every distinct word, counted × word count, folded on the driver
    (streamed per-block partials, pandas merge); single chars are
    always kept (coverage), multi-char pieces keep the top
    ``seed_vocab`` by (count desc, piece asc). Raises past ``sub_cap``
    distinct substrings (the vocab-cap convention — a corpus that
    exceeds it needs a shuffle-reduce seed, the word_count_table
    shape)."""
    import pandas as pd

    def part(t: pa.Table) -> pa.Table:
        words = t.column("word").to_pylist()
        cnts = t.column("count").to_numpy(zero_copy_only=False)
        acc: dict = {}
        for w, c in zip(words, cnts):
            c = int(c)
            L = len(w)
            for i in range(L):
                for j in range(i + 1, min(L, i + max_piece_len) + 1):
                    s = w[i:j]
                    acc[s] = acc.get(s, 0) + c
        return pa.table({"sub": pa.array(list(acc.keys()),
                                         pa.large_string()),
                         "c": pa.array(list(acc.values()), pa.int64())})

    frames = []
    total = None
    for b in word_ds.map_batches(part, batch_format="pyarrow",
                                 batch_size=None) \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        if not b.num_rows:
            continue
        frames.append(b.to_pandas())
        if sum(len(f) for f in frames) > 4 * sub_cap:
            frames = [pd.concat(frames).groupby("sub", as_index=False)
                      ["c"].sum()]
        if len(frames[-1]) > sub_cap:
            raise ValueError("substring universe exceeds sub_cap")
    if not frames:
        return [], np.zeros(0, dtype=np.int64)
    folded = pd.concat(frames).groupby("sub", as_index=False)["c"].sum()
    if len(folded) > sub_cap:
        raise ValueError("substring universe exceeds sub_cap")
    singles = folded[folded["sub"].str.len() == 1]
    multi = folded[folded["sub"].str.len() > 1] \
        .sort_values(["c", "sub"], ascending=[False, True],
                     kind="stable").head(max(0, seed_vocab - len(singles)))
    keep = pd.concat([singles, multi]).sort_values("sub") \
        .reset_index(drop=True)
    return keep["sub"].tolist(), keep["c"].to_numpy(dtype=np.int64)


def train_unigram(word_ds, max_piece_len: int = 4,
                  seed_vocab: int = 160, vocab_size: int = 48,
                  em_rounds: int = 2) -> UnigramModel:
    """Train: seed → ``em_rounds`` Viterbi-EM rounds → prune to
    ``vocab_size`` (all single chars always survive; multi-char pieces
    by final count desc, piece asc) → one final E-step so the returned
    counts describe the returned vocabulary. The word table is
    materialized once and re-streamed per round."""
    word_ds = word_ds.materialize()
    pieces, counts = _seed_pieces(word_ds, max_piece_len, seed_vocab)
    model = UnigramModel(pieces, counts)
    for _ in range(em_rounds):
        counts = _fold_piece_counts(word_ds, model)
        model = UnigramModel(pieces, counts)

    import pandas as pd

    df = pd.DataFrame({"piece": pieces, "count": counts})
    singles = df[df["piece"].str.len() == 1]
    multi = df[(df["piece"].str.len() > 1)] \
        .sort_values(["count", "piece"], ascending=[False, True],
                     kind="stable").head(max(0, vocab_size - len(singles)))
    keep = pd.concat([singles, multi]).sort_values("piece") \
        .reset_index(drop=True)
    model = UnigramModel(keep["piece"].tolist(),
                         keep["count"].to_numpy(dtype=np.int64))
    final = _fold_piece_counts(word_ds, model)
    return UnigramModel(model.pieces, final)
