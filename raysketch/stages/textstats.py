"""Text-analysis stages for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

Each stage is a callable CLASS for ``map_batches(Cls, concurrency=N)``
— expensive setup (compiled regexes, n-gram profiles) happens once per
actor in ``__init__``, per-batch work is vectorized (pyarrow.compute /
numpy); nothing iterates Python rows in the hot path except the
bounded-size per-document aggregation steps.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import arrow_to_flat_bytes, murmur64a

__all__ = ["TokenCount", "LangId", "QualityScore", "Fingerprint"]


class TokenCount:
    """Whitespace tokens + a BPE-ish regex token count (GPT-2-style
    pattern: word pieces, numbers, punctuation runs)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        # public GPT-2 pre-tokenizer shape (contractions, letter runs,
        # digit runs, punctuation runs, whitespace)
        self.bpe = re.compile(
            r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = batch.column(self.text_col)
        n_chars = pc.cast(pc.utf8_length(txt), pa.int64())
        n_ws = pc.cast(pc.count_substring_regex(txt, r"\S+"), pa.int64())
        bpe = self.bpe
        n_bpe = pa.array(
            [len(bpe.findall(s)) if s else 0 for s in txt.to_pylist()],
            type=pa.int64(),
        )
        return (
            batch.append_column("n_chars", n_chars)
            .append_column("n_tokens_ws", n_ws)
            .append_column("n_tokens_bpe", n_bpe)
        )


# Compact character-trigram profiles per language (most-frequent trigrams
# from public frequency tables; enough for a heuristic over latin-script
# text). Ranked lists — score = inverse-rank overlap.
_PROFILES = {
    "en": ["the", "and", "ing", "ion", "tio", "ent", "ati", "for", "her", "ter",
           "hat", "tha", "ere", "ate", "his", "con", "res", "ver", "all", "ons"],
    "de": ["der", "die", "und", "den", "ein", "che", "ich", "sch", "ung", "gen",
           "hen", "nde", "ten", "ine", "eit", "ers", "ver", "das", "ber", "ste"],
    "fr": ["les", "ent", "des", "ion", "que", "ait", "lle", "our", "ant", "tio",
           "eur", "ons", "men", "ais", "son", "par", "ure", "con", "est", "eme"],
    "es": ["que", "ent", "ion", "los", "ado", "con", "res", "cio", "del", "est",
           "nte", "aci", "par", "era", "las", "ien", "sta", "una", "ara", "des"],
    "it": ["che", "ent", "ion", "della", "con", "per", "ato", "are", "lla", "zio",
           "one", "ell", "nte", "gli", "ere", "anc", "del", "ver", "ita", "men"],
}


class LangId:
    """n-gram-heuristic language ID: inverse-rank trigram overlap against
    built-in profiles. Returns the best language and a confidence margin
    (0 = tie). ~Latin scripts only; "und" (undetermined) for empty or
    out-of-profile text."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col = text_col
        self.out_col = out_col
        self.langs = list(_PROFILES)
        self.rank = [
            {t: 1.0 / (i + 1) for i, t in enumerate(_PROFILES[l])} for l in self.langs
        ]
        self.word = re.compile(r"[a-zà-ÿ]+")

    def _score_one(self, s: str) -> tuple[str, float]:
        s = s.lower()
        tris: dict[str, int] = {}
        for w in self.word.findall(s):
            for i in range(len(w) - 2):
                t = w[i : i + 3]
                tris[t] = tris.get(t, 0) + 1
        if not tris:
            return "und", 0.0
        scores = [
            sum(cnt * rk.get(t, 0.0) for t, cnt in tris.items()) for rk in self.rank
        ]
        order = np.argsort(scores)[::-1]
        best, second = scores[order[0]], scores[order[1]]
        if best <= 0:
            return "und", 0.0
        return self.langs[order[0]], float((best - second) / best)

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, margins = [], []
        for s in batch.column(self.text_col).to_pylist():
            p, m = self._score_one(s or "")
            preds.append(p)
            margins.append(m)
        return batch.append_column(
            self.out_col, pa.array(preds, type=pa.string())
        ).append_column("lang_margin", pa.array(margins, type=pa.float64()))


_STOPWORDS = (
    "the a an and or of to in is are was were be been it this that for on with as"
).split()


class QualityScore:
    """Heuristic document-quality signals (Gopher/C4-style filters):
    length, mean word length, alpha ratio, punctuation ratio, stopword
    ratio, max word-repetition fraction — plus a composite keep-score."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.word = re.compile(r"[A-Za-z]+")
        self.stop = set(_STOPWORDS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = batch.column(self.text_col)
        n_chars = pc.utf8_length(txt).to_numpy(zero_copy_only=False).astype(np.float64)
        alpha = pc.count_substring_regex(txt, r"[A-Za-z]").to_numpy(zero_copy_only=False)
        punct = pc.count_substring_regex(txt, r"[^\w\s]").to_numpy(zero_copy_only=False)
        nz = np.maximum(n_chars, 1)
        alpha_ratio = alpha / nz
        punct_ratio = punct / nz

        stop_ratio = np.zeros(len(txt))
        mean_wlen = np.zeros(len(txt))
        rep_frac = np.zeros(len(txt))
        for i, s in enumerate(txt.to_pylist()):
            ws = self.word.findall((s or "").lower())
            if not ws:
                continue
            stop_ratio[i] = sum(w in self.stop for w in ws) / len(ws)
            mean_wlen[i] = sum(map(len, ws)) / len(ws)
            counts: dict[str, int] = {}
            for w in ws:
                counts[w] = counts.get(w, 0) + 1
            rep_frac[i] = max(counts.values()) / len(ws)

        score = (
            (n_chars >= 20)
            & (n_chars <= 100_000)
            & (alpha_ratio > 0.5)
            & (punct_ratio < 0.3)
            & (mean_wlen > 2)
            & (mean_wlen < 12)
            & (rep_frac < 0.5)
        ).astype(np.float64)
        return (
            batch.append_column("alpha_ratio", pa.array(alpha_ratio))
            .append_column("punct_ratio", pa.array(punct_ratio))
            .append_column("stopword_ratio", pa.array(stop_ratio))
            .append_column("mean_word_len", pa.array(mean_wlen))
            .append_column("max_word_rep", pa.array(rep_frac))
            .append_column("quality_keep", pa.array(score))
        )


class Fingerprint:
    """64-bit document fingerprint: MurmurHash64A over the
    whitespace-normalized, lowercased text (vectorized over the whole
    batch). Identical normalized content ⇒ identical fingerprint —
    the key for exact dedup at scale."""

    def __init__(self, text_col: str = "text", out_col: str = "fingerprint"):
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = pc.utf8_lower(batch.column(self.text_col))
        norm = pc.replace_substring_regex(txt, r"\s+", " ")
        norm = pc.utf8_trim_whitespace(norm)
        data, offsets = arrow_to_flat_bytes(
            norm.combine_chunks() if isinstance(norm, pa.ChunkedArray) else norm
        )
        h = murmur64a(data, offsets).astype(np.int64)
        return batch.append_column(self.out_col, pa.array(h, type=pa.int64()))
