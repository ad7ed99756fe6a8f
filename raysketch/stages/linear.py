"""Distributed linear-model quality classification: hashed bag-of-words
features, driver-side logistic-regression training on a deterministic
bounded sample, broadcast-weight distributed inference — the
fastText-style quality-filter workflow of real LLM data pipelines
(CCNet / GPT-3 style: a weak-supervision rule labels a seed set, a
cheap linear model generalizes it, inference runs over the full
corpus).

Scale shape (the IVFIndex precedent): training data is a deterministic
bounded sample (per-batch local bottom-k by id hash — k rows per block
reach the driver, never the corpus), training itself is tiny dense
numpy on the driver, and the only full-corpus pass is inference with
the weight vector broadcast ONCE (``ray.put``, read via ``ray.get``
inside plain task fns — setup is a plasma read, no actor pool needed:
CLAUDE.md q7 precedent). Features are RAW hashed token counts (no
length normalization) so any rule that thresholds token counts is
exactly linearly representable. Inference is vectorized: one murmur
hash per token, ``np.add.reduceat`` of gathered weights per document —
zero per-row Python, zero shuffles.

Determinism: the sample is a pure function of ids, training is
fixed-iteration float64 numpy on sorted rows, and each document's
score is a pure function of (its own tokens, w) — independent of Ray's
nondeterministic batch boundaries.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import arrow_to_flat_bytes, murmur64a
from .dedup import _splitmix64

__all__ = ["hashed_token_cols", "deterministic_sample",
           "train_logreg_hashed", "score_logreg"]


def hashed_token_cols(texts, dim: int):
    """Arrow string array/chunked-array → (hashed column id per token,
    per-doc token starts, per-doc token counts). Tokenization is
    single-space splitting (the suite-wide convention)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    words = pc.split_pattern(pc.fill_null(texts, ""), " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    flat = words.flatten()
    data, off = arrow_to_flat_bytes(flat)
    cols = (murmur64a(data, off) % np.uint64(dim)).astype(np.int64)
    doff = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return cols, doff[:-1], doff[1:] - doff[:-1]


def deterministic_sample(ds, id_col: str, cols: list, k: int,
                         seed: int = 0):
    """k rows with the smallest splitmix64(id ^ seed) — a uniform,
    parallelism-independent sample. Per-batch local bottom-k bounds
    driver traffic at k rows per block."""

    def local(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        h = _splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
        if len(h) > k:
            sel = np.sort(np.argpartition(h, k)[:k])
            t = t.take(pa.array(sel))
            h = h[sel]
        return t.select(cols).append_column("__h", pa.array(
            h.astype(np.int64)))

    cand = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    # uint64 hashes were stored as int64 bit patterns; restore order
    order = np.argsort(cand["__h"].to_numpy().astype(np.uint64),
                       kind="stable")[:k]
    return cand.iloc[order].drop(columns="__h").reset_index(drop=True)


def train_logreg_hashed(texts: list, y: np.ndarray, dim: int = 65536,
                        iters: int = 300, lr: float = 0.5):
    """Full-batch logistic regression over raw hashed-count features,
    driver-side (the sample is bounded). Returns (w float64[dim],
    bias). Deterministic: fixed iterations, float64, fixed row order."""
    arr = pa.array(texts, type=pa.string())
    cols, starts, counts = hashed_token_cols(arr, dim)
    n = len(texts)
    doc_of = np.repeat(np.arange(n, dtype=np.int64), counts)
    y = y.astype(np.float64)
    w = np.zeros(dim, dtype=np.float64)
    b = 0.0
    for _ in range(iters):
        z = np.bincount(doc_of, weights=w[cols], minlength=n) + b
        p = 1.0 / (1.0 + np.exp(-z))
        err = p - y
        g = np.zeros(dim, dtype=np.float64)
        np.add.at(g, cols, err[doc_of])
        w -= (lr / n) * g
        b -= (lr / n) * float(err.sum())
    return w, b


def score_logreg(ds, text_col: str, id_col: str, w, b: float,
                 dim: int, extra_fn=None):
    """Distributed inference: broadcast (w, b) once, score every row,
    emit (id, pred). ``extra_fn(table) -> dict[str, np.ndarray]``
    optionally appends extra per-row columns (e.g. a rule label to
    confuse against) computed in the same pass."""
    import ray

    ref = ray.put((np.asarray(w, dtype=np.float64), float(b)))

    def score(t: pa.Table) -> pa.Table:
        wv, bv = ray.get(ref)
        cols_, starts, counts = hashed_token_cols(t.column(text_col), dim)
        z = np.add.reduceat(wv[cols_], starts) \
            if len(cols_) else np.zeros(0, dtype=np.float64)
        z = np.where(counts > 0, z, 0.0) + bv
        out = {id_col: t.column(id_col),
               "pred": pa.array((z > 0).astype(np.int8))}
        if extra_fn is not None:
            for k_, v in extra_fn(t).items():
                out[k_] = pa.array(v)
        return pa.table(out)

    return ds.map_batches(score, batch_format="pyarrow")
