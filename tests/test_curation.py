"""Unit tests for the curation stage kernels (decontamination,
repetition quality, PII scrub, stratified sampling) against brute-force
Python ground truth; the end-to-end query↔SQL-oracle equivalence is
enforced by test_oracle_gate.py and scripts/check_correctness.py."""

import numpy as np
import pyarrow as pa
import pytest

from raysketch.sketches.bloom import BloomFilter
from raysketch.stages.curation import (
    PII_PATTERNS,
    ContaminationFlag,
    RepetitionStats,
    ScrubText,
    sample_keep_mask,
    word_ngrams,
)

VOCAB = "the fast key order sort table scan merge part window small hash".split()


def _soup(rng, n_words):
    return " ".join(rng.choice(VOCAB, size=n_words))


def _brute_ngrams(text, n):
    w = text.split(" ")
    return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]


def test_word_ngrams_matches_brute_force():
    rng = np.random.default_rng(7)
    texts = [_soup(rng, rng.integers(0, 15)) for _ in range(50)] + ["", "one two"]
    grams, doc_of = word_ngrams(pa.array(texts), 3)
    got = {}
    for g, d in zip(grams.to_pylist(), doc_of):
        got.setdefault(int(d), []).append(g)
    for i, t in enumerate(texts):
        assert got.get(i, []) == _brute_ngrams(t, 3), f"doc {i}"


def test_repetition_stats_matches_brute_force():
    rng = np.random.default_rng(11)
    texts = [_soup(rng, rng.integers(1, 40)) for _ in range(64)] + [""]
    t = pa.table({"doc_id": pa.array(range(len(texts))),
                  "text": pa.array(texts)})
    out = RepetitionStats()(t).to_pandas().set_index("doc_id")
    from collections import Counter

    for i, txt in enumerate(texts):
        w = txt.split(" ")
        wc, bc = Counter(w), Counter(zip(w, w[1:]))
        row = out.loc[i]
        assert row["n_words"] == len(w)
        assert row["n_distinct_words"] == len(wc)
        assert row["top_word_n"] == max(wc.values())
        assert row["n_bigrams"] == max(len(w) - 1, 0)
        assert row["top_bigram_n"] == (max(bc.values()) if bc else 0)
        assert row["top_word_frac"] == max(wc.values()) / len(w)
        assert row["dup_word_frac"] == (len(w) - len(wc)) / len(w)


def test_scrub_text_redacts_pii():
    t = pa.table({
        "doc_id": pa.array([1, 2, 3]),
        "text": pa.array([
            "mail a.b+c@x-y.co and spam@sub.domain.example.org now",
            "call 555-0199 or 800-1234 from 192.168.0.1",
            "clean text with no pii at all",
        ]),
    })
    out = ScrubText(PII_PATTERNS,
                    count_cols=["n_email", "n_phone", "n_ip"])(t).to_pandas()
    assert out["scrubbed"][0] == "mail <EMAIL> and <EMAIL> now"
    assert out["scrubbed"][1] == "call <PHONE> or <PHONE> from <IP>"
    assert out["scrubbed"][2] == "clean text with no pii at all"
    assert list(out["n_email"]) == [2, 0, 0]
    assert list(out["n_phone"]) == [0, 2, 0]
    assert list(out["n_ip"]) == [0, 1, 0]


def test_scrub_matches_duckdb_regexp_replace():
    """pyarrow and DuckDB both run RE2 — same pattern, same rewrite."""
    import duckdb

    texts = ["x user7@mail.example.com 555-0007 10.0.0.7 y",
             "a@b.co c@d.org 1.2.3.4 999-1234", "nothing here"]
    t = pa.table({"doc_id": pa.array([0, 1, 2]), "text": pa.array(texts)})
    got = ScrubText(PII_PATTERNS)(t).to_pandas()["scrubbed"].tolist()
    con = duckdb.connect()
    for txt, g in zip(texts, got):
        cur = txt
        for pat, rep in PII_PATTERNS:
            cur = con.execute(
                "SELECT regexp_replace(?, ?, ?, 'g')", [cur, pat, rep]
            ).fetchone()[0]
        assert cur == g


def _flag(eval_texts, train_texts, n=4, fp_rate=1e-4):
    grams = set(word_ngrams(pa.array(eval_texts), n)[0].to_pylist())
    bloom = BloomFilter(capacity=max(len(grams), 64), fp_rate=fp_rate)
    if grams:
        bloom.add_batch(pa.array(sorted(grams)))
    t = pa.table({"doc_id": pa.array(range(len(train_texts))),
                  "text": pa.array(train_texts)})
    return ContaminationFlag(bloom, frozenset(grams), n)(t).to_pandas()


def test_contamination_flag_finds_planted_overlap():
    ev = ["alpha beta gamma delta epsilon zeta"]
    tr = [
        "unrelated words only here nothing shared",
        "prefix junk alpha beta gamma delta suffix",   # one shared 4-gram
        "alpha beta gamma delta epsilon zeta copied",  # 3 shared 4-grams
    ]
    out = _flag(ev, tr)
    assert list(out["doc_id"]) == [1, 2]
    assert list(out["n_hit_grams"]) == [1, 3]


def test_contamination_flag_exact_verify_kills_bloom_fps():
    """A deliberately tiny/saturated Bloom produces false positives;
    the exact-set verify must still yield zero flagged docs."""
    ev = ["alpha beta gamma delta"]
    rng = np.random.default_rng(3)
    tr = [_soup(rng, 30) for _ in range(100)]  # vocab disjoint from eval
    grams = set(word_ngrams(pa.array(ev), 4)[0].to_pylist())
    bloom = BloomFilter(num_bits=64, num_hashes=1)  # saturates instantly
    bloom.add_batch(pa.array(sorted(grams)))
    t = pa.table({"doc_id": pa.array(range(len(tr))), "text": pa.array(tr)})
    fired = int(bloom.contains_batch(
        word_ngrams(pa.array(tr), 4)[0]).sum())
    assert fired > 0  # the Bloom really is lying
    out = ContaminationFlag(bloom, frozenset(grams), 4)(t).to_pandas()
    assert len(out) == 0


def test_contamination_flag_empty_inputs():
    out = _flag(["alpha beta gamma delta"], [""])
    assert len(out) == 0


def test_sample_keep_mask_deterministic_and_rate_bounded():
    ids = np.arange(100000, dtype=np.int64)
    m1 = sample_keep_mask(ids, np.int64(250))
    m2 = sample_keep_mask(ids.copy(), np.int64(250))
    assert (m1 == m2).all()
    # Knuth-mix residues are near-uniform: observed rate ≈ 250/1000
    assert abs(m1.mean() - 0.25) < 0.01
    # per-id rates: a row's decision depends only on (id, its own rate)
    rates = np.where(ids % 2 == 0, 1000, 0).astype(np.int64)
    m = sample_keep_mask(ids, rates)
    assert m[ids % 2 == 0].all() and not m[ids % 2 == 1].any()
