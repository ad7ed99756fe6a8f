"""HLL correctness vs golden outputs from the reference binary, plus the
reference test suite's behavioral contract (FIXTURES.md §2) and merge
algebra property tests (FIXTURES.md §3)."""

import hashlib
import json
import os
import random

import numpy as np
import pytest

from raysketch import HLL
from raysketch.sketches.hll import _dense_pack, _dense_unpack, _sparse_decode, _sparse_encode

GOLD = os.path.join(os.path.dirname(__file__), "golden")
with open(os.path.join(GOLD, "estimates.json")) as f:
    EST = json.load(f)
with open(os.path.join(GOLD, "sparse_dumps.json")) as f:
    SPARSE_DUMPS = json.load(f)


def golden_set(name):
    """Regenerate the element lists exactly as tests/golden were produced."""
    def ints(a, b):
        return [str(i) for i in range(a, b)]

    if name == "tiny4":
        return ["abc", "def", "ghi", "jkl"]
    if name == "empty_plus_a":
        return ["", "a"]
    if name == "dup_collapse":
        return ["a", "a", "a"]
    if name == "ints_10k":
        return ints(0, 10000)
    if name == "ints_100x100":
        return ints(0, 100) * 100
    if name == "elems_100k":
        return [f"elem-{i}" for i in range(100000)]
    if name == "ints_offset_10k":
        return ints(1000000, 1010000)
    if name == "ints_300":
        return ints(0, 300)
    if name == "words_like":
        rng2 = random.Random(7)
        words = ["".join(rng2.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(4)) for _ in range(12238)]
        return [words[rng2.randrange(len(words))] for _ in range(72786)]
    raise KeyError(name)


@pytest.mark.parametrize("name", list(EST.keys()))
def test_golden_estimates(name):
    """Estimates must equal the reference binary's output exactly."""
    h = HLL()
    h.add_batch(golden_set(name))
    exp = EST[name].get("estimate_dense", EST[name].get("estimate_sparse"))
    assert h.finalize() == exp


@pytest.mark.parametrize("name", ["tiny4", "ints_10k", "elems_100k"])
def test_golden_dense_dump_bytes(name):
    """Serialized dense dumps are byte-identical to the reference's."""
    if "dense_dump_sha256" not in EST[name]:
        pytest.skip("no dense dump golden")
    h = HLL()
    h.add_batch(golden_set(name))
    b = h.to_bytes()
    assert len(b) == EST[name]["dense_dump_len"] == 12304
    assert hashlib.sha256(b).hexdigest() == EST[name]["dense_dump_sha256"]


@pytest.mark.parametrize("name", list(SPARSE_DUMPS.keys()))
def test_reference_sparse_dumps_load(name):
    """Sparse dumps written by the reference load and estimate identically."""
    h = HLL.from_bytes(bytes.fromhex(SPARSE_DUMPS[name]))
    exp = EST[name].get("estimate_sparse", EST[name].get("estimate_dense"))
    assert h.finalize() == exp
    # and re-folding the same elements into a fresh sketch gives the same registers
    h2 = HLL()
    h2.add_batch(golden_set(name))
    assert np.array_equal(h.regs, h2.regs)


def test_tiny_exact_counts():
    """php/tests/hll_add_distinct.phpt / hll_add_string.phpt contract."""
    assert HLL().add("abc").add("def").add("ghi").add("jkl").finalize() == 4
    assert HLL().finalize() == 0
    h = HLL()
    h.add_batch(["", ""])
    assert h.finalize() == 1
    h = HLL()
    h.add_batch(["", "a"])
    assert h.finalize() == 2


def test_type_coercion_int_float_bool():
    """100 ≡ "100", 100.1 ≡ "100.1", true ≡ "1", false ≡ "" (phpt coercion suite)."""
    import pyarrow as pa

    a = HLL()
    a.add_batch(pa.array([100, 200], type=pa.int64()))
    b = HLL()
    b.add_batch(["100", "200"])
    assert np.array_equal(a.regs, b.regs)

    a = HLL()
    a.add_batch(pa.array([100.1], type=pa.float64()))
    b = HLL()
    b.add_batch(["100.1"])
    assert np.array_equal(a.regs, b.regs)

    a = HLL()
    a.add_batch(pa.array([True, False]))
    b = HLL()
    b.add_batch(["1", ""])
    assert np.array_equal(a.regs, b.regs)


def test_tolerance_band_10k():
    h = HLL()
    h.add_batch([str(i) for i in range(10000)])
    assert abs(h.finalize() - 10000) / 10000 < 0.01


def test_merge_overlapping():
    """php/tests/hll_count_merged.phpt: overlaps counted once."""
    h1 = HLL().add("abc").add("def")
    h2 = HLL().add("def").add("ghi")
    h3 = HLL().add("ghi").add("jkl")
    assert HLL.union([h1, h2]).finalize() == 3
    assert HLL.union([h1, h2, h3]).finalize() == 4
    # merge into self leaves count unchanged
    before = h1.finalize()
    assert h1.merge(h1).finalize() == before
    # merge of two empties = 0
    assert HLL().merge(HLL()).finalize() == 0


def test_merge_algebra_property():
    """Random splits / orders give byte-identical registers (FIXTURES.md §3)."""
    rng = random.Random(99)
    elements = [f"e{i}" for i in range(5000)]
    reference = HLL()
    reference.add_batch(elements)

    for trial in range(5):
        shuffled = elements[:]
        rng.shuffle(shuffled)
        nparts = rng.randint(2, 7)
        cuts = sorted(rng.sample(range(1, len(elements)), nparts - 1))
        parts = []
        prev = 0
        for c in cuts + [len(elements)]:
            parts.append(shuffled[prev:c])
            prev = c
        sketches = []
        for p in parts:
            s = HLL()
            if p:
                s.add_batch(p)
            sketches.append(s)
        rng.shuffle(sketches)
        merged = HLL.union(sketches)
        assert np.array_equal(merged.regs, reference.regs)
        # idempotence: merging a partial twice changes nothing
        merged.merge(sketches[0])
        assert np.array_equal(merged.regs, reference.regs)


def test_dump_load_roundtrip():
    """php/tests/hll_dump_load.phpt: sparse & dense, several cardinalities."""
    for elems in [[], ["a"], [str(i) for i in range(100)] * 100,
                  [str(i) for i in range(1000000, 1010000)]]:
        for sparse in (False, True):
            h = HLL(sparse=sparse)
            if elems:
                h.add_batch(elems)
            h2 = HLL.from_bytes(h.to_bytes())
            assert h2.finalize() == h.finalize()
            assert np.array_equal(h2.regs, h.regs)


def test_sparse_dense_encoding_state_machine():
    """hll_create_dense/sparse, hll_promote, hll_info contracts."""
    h = HLL()
    assert h.info()["encoding"] == "dense"
    hs = HLL(sparse=True)
    assert hs.info()["encoding"] == "sparse"
    hs.promote()
    assert hs.info()["encoding"] == "dense"
    hs.promote()  # idempotent
    assert hs.info()["encoding"] == "dense"

    # sparse dump beats dense at low cardinality and auto-promotes on size
    small = HLL(sparse=True)
    small.add_batch([str(i) for i in range(100)])
    assert len(small.to_bytes()) < 12304
    big = HLL(sparse=True)
    big.add_batch([str(i) for i in range(50000)])
    assert len(big.to_bytes()) == 12304  # promoted on size (redis.c:32)


def test_sparse_codec_roundtrip():
    rng = np.random.default_rng(5)
    regs = np.zeros(16384, dtype=np.uint8)
    pos = rng.choice(16384, size=700, replace=False)
    regs[pos] = rng.integers(1, 33, size=700)
    enc = _sparse_encode(regs)
    assert enc is not None
    assert np.array_equal(_sparse_decode(enc, 16384), regs)
    # values > 32 cannot be sparse-encoded
    regs[pos[0]] = 40
    assert _sparse_encode(regs) is None


def test_dense_codec_roundtrip():
    rng = np.random.default_rng(6)
    regs = rng.integers(0, 64, size=16384, dtype=np.uint8)
    assert np.array_equal(_dense_unpack(_dense_pack(regs), 16384), regs)


def test_pickle_roundtrip():
    import pickle

    h = HLL()
    h.add_batch([str(i) for i in range(1000)])
    h2 = pickle.loads(pickle.dumps(h))
    assert h2 == h


def test_invalid_dumps_rejected():
    with pytest.raises(ValueError):
        HLL.from_bytes(b"NOPE" + bytes(20))
    with pytest.raises(ValueError):
        HLL.from_bytes(b"HYLL" + bytes([0, 0, 0, 0]) + bytes(8) + bytes(100))
    with pytest.raises(ValueError):
        HLL.from_bytes(b"HYLL" + bytes([7, 0, 0, 0]) + bytes(8) + bytes(12288))


def test_constant_memory():
    """50k adds leave the state at a fixed size (hll_add_mem.phpt analog)."""
    h = HLL()
    h.add_batch([f"x{i}" for i in range(50000)])
    assert h.regs.nbytes == 16384
    assert len(h.to_bytes()) == 12304


def test_error_bound_decades():
    """Self-test analog (hyperloglog.c:1576-1676): abs error ≤ 6σ at each
    decade up to 10^6 (scaled down from the reference's 10^7)."""
    sigma = 1.04 / np.sqrt(16384)
    h = HLL()
    added = 0
    for decade in [10, 100, 1000, 10000, 100000, 1000000]:
        h.add_batch([f"st-{i}" for i in range(added, decade)])
        added = decade
        est = h.finalize()
        assert abs(est - decade) <= 6 * sigma * decade + 1


def test_error_bound_decades_to_1e7():
    """Full reference self-test cycle (hyperloglog.c:1622-1667): abs
    error ≤ 6σ at each decade up to 10^7 (closing the last fidelity gap
    with the compiled-in self test; elements are int ids, which hash as
    their decimal-string canonical form). ~15 s — the suite's one slow
    test, kept because the reference compiles this exact check in."""
    import pyarrow as pa

    from raysketch import HLL

    sigma = 1.04 / np.sqrt(16384)
    h = HLL()
    added = 0
    for decade in [10, 100, 1000, 10_000, 100_000, 1_000_000, 10_000_000]:
        h.add_batch(pa.array(np.arange(added, decade, dtype=np.int64)))
        added = decade
        est = h.finalize()
        assert abs(est - decade) <= 6 * sigma * decade + 1, (decade, est)


def test_register_set_get_roundtrip():
    """Self-test part 1 analog (hyperloglog.c:1576-1620): random register
    patterns survive dump/load through BOTH encodings, register-exact
    (read back via the PFDEBUG-style getreg/getregs introspection)."""
    from raysketch import HLL

    rng = np.random.default_rng(9)
    for trial in range(5):
        h = HLL()
        # sparse-representable pattern (values ≤ 32), mostly zeros
        idx = rng.choice(16384, size=200, replace=False)
        vals = rng.integers(1, 33, size=200)
        h.regs[idx] = vals.astype(np.uint8)
        h.encoding = "sparse"
        back = HLL.from_bytes(h.to_bytes())
        assert back.getregs() == h.regs.tolist()
        assert all(back.getreg(int(i)) == int(v) for i, v in zip(idx, vals))
        # dense round-trip of an arbitrary pattern (values to 63)
        h2 = HLL()
        h2.regs[:] = rng.integers(0, 64, size=16384).astype(np.uint8)
        h2.encoding = "dense"
        back2 = HLL.from_bytes(h2.to_bytes())
        assert np.array_equal(back2.regs, h2.regs)


def test_pfdebug_decode_runs():
    """PFDEBUG DECODE analog: the run listing reconstructs the register
    vector exactly and refuses non-sparse-representable states."""
    from raysketch import HLL

    h = HLL()
    h.regs[5] = 3
    h.regs[6] = 3
    h.regs[100] = 1
    runs = h.decode()
    regs = []
    for op, val, ln in runs:
        regs.extend([val if op == "v" else 0] * ln)
    assert regs == h.regs.tolist()
    assert ("v", 3, 2) in runs
    h.regs[7] = 40  # > SPARSE_VAL_MAX
    with pytest.raises(ValueError):
        h.decode()
    assert h.todense().info()["encoding"] == "dense"


def test_intersection_and_jaccard_estimates():
    """Inclusion-exclusion set-operation estimates: 30k ∩ 30k with 10k
    overlap → both estimates within the compounded HLL error band."""
    from raysketch import HLL

    a, b = HLL(), HLL()
    a.add_batch([f"x{i}" for i in range(30_000)])          # 0..30k
    b.add_batch([f"x{i}" for i in range(20_000, 50_000)])  # 20k..50k
    inter = HLL.intersection_estimate(a, b)
    jac = HLL.jaccard_estimate(a, b)
    assert abs(inter - 10_000) < 0.04 * 50_000  # ≈ union-scale error
    assert abs(jac - 10_000 / 50_000) < 0.04
    # disjoint sets → clipped at 0
    c = HLL()
    c.add_batch([f"y{i}" for i in range(1000)])
    d = HLL()
    d.add_batch([f"z{i}" for i in range(1000)])
    assert HLL.intersection_estimate(c, d) < 0.03 * 2000
    assert HLL.jaccard_estimate(HLL(), HLL()) == 1.0  # empty∩empty convention
