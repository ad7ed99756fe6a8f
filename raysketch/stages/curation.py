"""Training-data curation operators: decontamination, repetition-quality
signals, PII scrubbing, stratified sampling.

These are the LLM-corpus operations the reference's sketch toolkit gets
used *for* in practice (the reference itself stops at the sketches —
SURVEY.md §2.5); each one here is a Ray-Data-first batch transform:

- **Decontamination** (train/eval n-gram overlap): the benchmark/eval
  side of a decontamination pass is small by construction (benchmark
  suites ≪ the training corpus), so its n-gram set is broadcast once via
  ``ray.put`` — a Bloom filter for the O(1)-per-gram probe plus the exact
  gram-string set for collision-free verification — and the 100-TB train
  side streams through ``map_batches`` untouched by any shuffle.  This is
  the standard contamination-check shape (e.g. GPT-3 appendix C / PaLM
  13-gram overlap); the Bloom probe is the scale path, the exact verify
  makes the output bit-deterministic.

- **Repetition signals** (Gopher-style quality heuristics, Rae et al.
  2021 §A1.1): fraction of words in the most common word, most common
  word bigram, and duplicate-word fraction.  Everything is computed
  per-document *inside one batch* with factorize + lexsort/reduceat —
  a document's words never leave the batch that read it, so the stage
  is embarrassingly parallel with zero shuffle.

- **PII scrub**: ordered (pattern → replacement) rewrite with
  ``pc.replace_substring_regex`` (RE2, same engine DuckDB uses, so SQL
  oracles with ``regexp_replace(..., 'g')`` are bit-comparable).
  Patterns compile once per actor in ``__init__``.

- **Stratified sampling**: deterministic id-arithmetic sampler
  (``(id·PRIME) mod 1000 < rate``) so the decision is reproducible on
  any node, at any parallelism, with no RNG state to ship — and is
  exactly replicable in SQL for the oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sketches.bloom import BloomFilter

__all__ = [
    "word_ngrams",
    "collect_gram_broadcast",
    "ContaminationFlag",
    "RepetitionStats",
    "ScrubText",
    "PII_PATTERNS",
]


# ------------------------------------------------------------------ grams
def word_ngrams(texts, n: int):
    """Vectorized word n-grams per document.

    Returns ``(grams, doc_of)``: a flat Arrow string array of
    space-joined n-grams and the int64 row index each gram came from.
    Word = ``split_pattern(text, " ")`` token — the exact same universe
    as SQL ``string_split(text, ' ')`` so oracles can reproduce it.
    """
    words = pc.split_pattern(pc.fill_null(texts, ""), " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    counts = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = words.flatten()
    n_docs = len(counts)
    n_grams = np.maximum(counts - (n - 1), 0)
    if n_grams.sum() == 0:
        return pa.array([], type=pa.string()), np.empty(0, np.int64)
    starts = np.cumsum(counts) - counts
    # flat index of each gram's first word: starts[d] + 0..n_grams[d]-1
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), n_grams)
    first = np.arange(len(doc_of), dtype=np.int64) - np.repeat(
        np.cumsum(n_grams) - n_grams, n_grams) + np.repeat(starts, n_grams)
    # join n consecutive words with spaces via Arrow binary_join_element_wise
    cols = [flat.take(pa.array(first + j)) for j in range(n)]
    grams = pc.binary_join_element_wise(*cols, " ")
    return grams, doc_of


def collect_gram_broadcast(ds, n: int, text_col: str = "text",
                           fp_rate: float = 1e-4):
    """Fold the small (eval) side's distinct n-grams into a broadcastable
    (BloomFilter, frozenset-of-strings) pair.

    The exact set is what makes the output collision-free; the Bloom is
    what the 100-TB train side probes first (at real scale the exact set
    stays proportional to the *benchmark* corpus — MBs, not the training
    corpus — so broadcasting it is the textbook small-side pattern).
    """
    grams: set[str] = set()
    for t in ds.map_batches(
            lambda t: pa.table(
                {"gram": word_ngrams(t.column(text_col), n)[0]}),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        grams.update(t.column("gram").to_pylist())
    bloom = BloomFilter(capacity=max(len(grams), 64), fp_rate=fp_rate)
    if grams:
        bloom.add_batch(pa.array(sorted(grams)))
    return bloom, frozenset(grams)


class ContaminationFlag:
    """map_batches actor stage: flag train documents sharing any word
    n-gram with the broadcast eval gram set.

    Two-phase probe per batch: vectorized Bloom ``contains_batch`` over
    every gram (no false negatives), then exact string-set verification
    of only the Bloom-positive grams — output has zero false positives
    and is independent of Bloom sizing.  Emits one row per contaminated
    doc with the count of DISTINCT matching grams.
    """

    def __init__(self, bloom_ref, grams_ref, n: int,
                 id_col: str = "doc_id", text_col: str = "text"):
        import ray

        self.bloom: BloomFilter = (ray.get(bloom_ref)
                                   if isinstance(bloom_ref, ray.ObjectRef)
                                   else bloom_ref)
        self.grams: frozenset = (ray.get(grams_ref)
                                 if isinstance(grams_ref, ray.ObjectRef)
                                 else grams_ref)
        self.n = n
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        id_arr = batch.column(self.id_col)
        if isinstance(id_arr, pa.ChunkedArray):
            id_arr = id_arr.combine_chunks()
        grams, doc_of = word_ngrams(batch.column(self.text_col), self.n)
        empty = pa.table({self.id_col: pa.array([], type=batch.schema.field(self.id_col).type),
                          "n_hit_grams": pa.array([], type=pa.int64())})
        if len(grams) == 0:
            return empty
        cand = self.bloom.contains_batch(grams)
        if not cand.any():
            return empty
        # exact verify only the Bloom-positive slice (rare at scale)
        import pandas as pd

        sub = pd.Series(grams.take(pa.array(np.flatnonzero(cand))).to_pylist())
        hit = sub.isin(self.grams).to_numpy()
        if not hit.any():
            return empty
        hit_docs = doc_of[np.flatnonzero(cand)[hit]]
        hit_grams = sub[hit].to_numpy()
        # distinct grams per doc
        uniq = pd.DataFrame({"d": hit_docs, "g": hit_grams}).drop_duplicates()
        per = uniq.groupby("d", sort=True).size()
        return pa.table({
            self.id_col: id_arr.take(pa.array(per.index.to_numpy())),
            "n_hit_grams": pa.array(per.to_numpy().astype(np.int64)),
        })


# ------------------------------------------------------- repetition stats
class RepetitionStats:
    """Gopher-style repetition quality signals, fully vectorized.

    Per document: word count, distinct-word count, top-word count,
    bigram count, top-bigram count (counts are exact; fraction columns
    are IEEE doubles of exact int ratios so SQL oracles reproduce them
    bit-for-bit).  A document's words are processed entirely within the
    batch that carries it — no shuffle, no per-row Python.
    """

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(
            pc.fill_null(batch.column(self.text_col), ""), " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        counts = pc.list_value_length(words).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = words.flatten()
        n_docs = len(counts)
        parent = np.repeat(np.arange(n_docs, dtype=np.int64), counts)

        # factorize words batch-wide via Arrow dictionary encoding (exact
        # string identity — no hash-collision caveat; codes are
        # batch-local, fine: every aggregation is keyed by (parent, code))
        code = flat.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)

        n_distinct = np.zeros(n_docs, np.int64)
        top_word = np.zeros(n_docs, np.int64)
        if len(code):
            order = np.lexsort((code, parent))
            p_s, c_s = parent[order], code[order]
            bound = np.flatnonzero(
                np.r_[True, (p_s[1:] != p_s[:-1]) | (c_s[1:] != c_s[:-1])])
            grp_cnt = np.diff(np.r_[bound, len(p_s)])
            grp_doc = p_s[bound]
            np.add.at(n_distinct, grp_doc, 1)
            np.maximum.at(top_word, grp_doc, grp_cnt)

        # bigrams: consecutive word pairs within the same document
        n_bigrams = np.maximum(counts - 1, 0)
        top_bigram = np.zeros(n_docs, np.int64)
        if len(code) > 1:
            same = parent[1:] == parent[:-1]
            bp = parent[:-1][same]
            b1, b2 = code[:-1][same], code[1:][same]
            if len(bp):
                order = np.lexsort((b2, b1, bp))
                p_s, a_s, b_s = bp[order], b1[order], b2[order]
                bound = np.flatnonzero(np.r_[True, (p_s[1:] != p_s[:-1])
                                             | (a_s[1:] != a_s[:-1])
                                             | (b_s[1:] != b_s[:-1])])
                grp_cnt = np.diff(np.r_[bound, len(p_s)])
                np.maximum.at(top_bigram, p_s[bound], grp_cnt)

        safe_w = np.maximum(counts, 1)
        safe_b = np.maximum(n_bigrams, 1)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "n_words": pa.array(counts),
            "n_distinct_words": pa.array(n_distinct),
            "top_word_n": pa.array(top_word),
            "n_bigrams": pa.array(n_bigrams),
            "top_bigram_n": pa.array(top_bigram),
            "top_word_frac": pa.array(top_word / safe_w),
            "top_bigram_frac": pa.array(top_bigram / safe_b),
            "dup_word_frac": pa.array((counts - n_distinct) / safe_w),
        })


# ----------------------------------------------------------------- scrub
# RE2-compatible (pyarrow AND DuckDB both run RE2, so the exact same
# pattern string is used in the SQL oracle).
PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{4}\b", "<PHONE>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


class ScrubText:
    """map_batches stage: ordered regex redaction (PII scrub shape).

    ``patterns`` is a list of (RE2 pattern, replacement) applied in
    order with ``pc.replace_substring_regex`` (all occurrences).  Also
    emits a per-pattern match count (taken BEFORE that pattern's
    rewrite, AFTER the previous ones) so downstream stats don't need a
    second pass.
    """

    def __init__(self, patterns=None, text_col: str = "text",
                 out_col: str = "scrubbed", count_cols=None):
        self.patterns = list(patterns if patterns is not None else PII_PATTERNS)
        self.text_col = text_col
        self.out_col = out_col
        self.count_cols = count_cols  # None → no count columns

    def __call__(self, batch: pa.Table) -> pa.Table:
        cur = pc.fill_null(batch.column(self.text_col), "")
        counts = {}
        for i, (pat, rep) in enumerate(self.patterns):
            if self.count_cols is not None:
                counts[self.count_cols[i]] = pc.count_substring_regex(cur, pat)
            cur = pc.replace_substring_regex(cur, pat, rep)
        cols = {name: batch.column(name) for name in batch.column_names
                if name != self.text_col}
        cols[self.out_col] = cur
        for k, v in counts.items():
            cols[k] = pc.cast(v, pa.int64())
        return pa.table(cols)


# ------------------------------------------------------------- sampling
SAMPLE_PRIME = 2654435761  # Knuth multiplicative constant


def sample_keep_mask(ids: np.ndarray, rate_permille: np.ndarray) -> np.ndarray:
    """Deterministic keep decision: ``(id · PRIME) mod 1000 < rate``.

    Pure integer arithmetic → identical on every node, at any
    parallelism, and exactly replicable in SQL (int64 throughout; ids
    here are small so the product cannot overflow — documented caller
    contract, use a pre-hash for >2^31 id spaces).
    """
    mix = (ids.astype(np.int64) * np.int64(SAMPLE_PRIME)) % np.int64(1000)
    return mix < rate_permille
