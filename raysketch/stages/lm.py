"""Character-bigram language-model quality scoring — the CCNet-style
curation signal (Wenzek et al. 2020, "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data": rank documents by LM score,
keep the fluent tail; gibberish has improbable character transitions).

The model is interpolated bigram/unigram over raw UTF-8 bytes:

    p(b | a) = λ·c(ab)/c(a·)  +  (1−λ)·c(·b)/N

trained DISTRIBUTED with the 65536-bincount combiner (one zero-shuffle
pass — the bpe_two_merges / top_char_bigrams shape; doc boundaries are
the joined \\x00 separator, masked out, so no cross-document pairs).
A document's score is Σ over its adjacent byte pairs of p(b|a) in
EXACT FIXED POINT — each term is integer floor division

    (λ_num·c(ab)·S) // (λ_den·c(a·)) + (λ_den−λ_num)·c(·b)·S // (λ_den·N)

so a DuckDB oracle states the identical integer (`//` is floor
division in both engines; SUM of per-pair terms is integer-exact in
any order, unlike float log-probs whose libm and summation order
differ between engines). Log-perplexity is monotone-related for
ranking purposes; the fixed-point mean transition probability is the
same quality ordering signal without cross-engine float hazards.

int64 bounds: λ_num·c(ab)·S needs c(ab) < 2⁶³/(λ_num·S) ≈ 6·10¹³ at
S=2¹⁴ — comfortable beyond 10 TB of text per training shard.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["train_char_bigram_counts", "CharBigramLMScore",
           "char_bigram_lm_scores", "fp_pair_scores"]

_S = 16384  # 2^14 fixed-point scale
_LAM_NUM = 9
_LAM_DEN = 10


def _pair_arrays(texts: list) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch texts → (first-byte, second-byte, doc-index) arrays of all
    within-document adjacent byte pairs."""
    s = np.frombuffer("\x00".join(x or "" for x in texts)
                      .encode("utf-8"), dtype=np.uint8)
    if len(s) < 2:
        z = np.empty(0, dtype=np.int64)
        return z, z, z
    a = s[:-1].astype(np.int64)
    b = s[1:].astype(np.int64)
    doc = np.cumsum(s == 0)[:-1]  # separator count before each pair
    m = (a != 0) & (b != 0)
    return a[m], b[m], doc[m]


def train_char_bigram_counts(ds, text_col: str = "text") -> np.ndarray:
    """Global 65536-entry bigram count vector — per-batch bincount
    partials folded on the driver (≤256 KB per partial)."""

    def part(t: pa.Table) -> pa.Table:
        a, b, _ = _pair_arrays(t.column(text_col).to_pylist())
        cnt = np.bincount(a * 256 + b, minlength=65536).astype(np.int64) \
            if len(a) else np.zeros(65536, dtype=np.int64)
        return pa.table({"v": pa.array([cnt.tolist()])})

    total = np.zeros(65536, dtype=np.int64)
    for blk in ds.map_batches(part, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for row in blk.column("v").to_pylist():
            total += np.asarray(row, dtype=np.int64)
    return total


def fp_pair_scores(a: np.ndarray, b: np.ndarray,
                   counts: np.ndarray) -> np.ndarray:
    """Per-pair exact fixed-point interpolated probability under the LM
    given by a 65536-entry bigram count vector, SAFE for pairs the
    model never saw (a subset-trained model — the DSIR target LM —
    can meet unseen contexts): t1 is 0 when c(ab)=0 or c(a·)=0, t2 is
    0 when the model is empty. Matches the SQL statement
    COALESCE((9·cab·S)//(10·ca),0) + COALESCE((1·cb·S)//(10·N),0)
    term by term (LEFT-JOIN nulls ≡ zero counts)."""
    m = np.asarray(counts, dtype=np.int64).reshape(256, 256)
    cab = m.reshape(-1)[a * 256 + b]
    ca = m.sum(axis=1)[a]
    cb = m.sum(axis=0)[b]
    n = int(m.sum())
    t1 = np.where(ca > 0,
                  (_LAM_NUM * cab * _S) // np.maximum(_LAM_DEN * ca, 1),
                  np.int64(0))
    t2 = ((_LAM_DEN - _LAM_NUM) * cb * _S) // (_LAM_DEN * n) \
        if n > 0 else np.zeros(len(b), dtype=np.int64)
    return t1 + t2


class CharBigramLMScore:
    """map_batches stage: per-doc exact fixed-point LM score from the
    broadcast count vector. Plain-function use is fine too (setup is
    one plasma read)."""

    def __init__(self, counts_ref, text_col: str = "text",
                 id_col: str = "doc_id"):
        import ray

        total = (ray.get(counts_ref)
                 if isinstance(counts_ref, ray.ObjectRef) else counts_ref)
        m = np.asarray(total, dtype=np.int64).reshape(256, 256)
        self.cab = m.reshape(-1)
        self.ca = m.sum(axis=1)
        self.cb = m.sum(axis=0)
        self.n = int(m.sum())
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        a, b, doc = _pair_arrays(t.column(self.text_col).to_pylist())
        score = np.zeros(t.num_rows, dtype=np.int64)
        npairs = np.zeros(t.num_rows, dtype=np.int64)
        if len(a):
            cab = self.cab[a * 256 + b]
            ca = self.ca[a]          # ≥ cab ≥ 1 for every observed pair
            t1 = (_LAM_NUM * cab * _S) // (_LAM_DEN * ca)
            t2 = ((_LAM_DEN - _LAM_NUM) * self.cb[b] * _S) \
                // (_LAM_DEN * self.n)
            np.add.at(score, doc, t1 + t2)
            np.add.at(npairs, doc, 1)
        return pa.table({
            self.id_col: t.column(self.id_col),
            "n_pairs": pa.array(npairs),
            "lm_score_fp": pa.array(score),
        })


def char_bigram_lm_scores(ds, text_col: str = "text",
                          id_col: str = "doc_id"):
    """Train + score in two zero-shuffle passes. Returns a Dataset of
    (id, n_pairs, lm_score_fp). Rank quality by lm_score_fp/n_pairs
    (mean transition probability in 1/16384 units)."""
    import ray

    ref = ray.put(train_char_bigram_counts(ds, text_col))
    holder: list = []

    def score_fn(t: pa.Table) -> pa.Table:
        if not holder:
            holder.append(CharBigramLMScore(ref, text_col, id_col))
        return holder[0](t)

    return ds.map_batches(score_fn, batch_format="pyarrow")
