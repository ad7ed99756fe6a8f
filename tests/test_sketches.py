"""Bloom / Count-Min / KLL / t-digest: published error bounds, merge
algebra, serialization round-trips (FIXTURES.md §3)."""

import pickle
import random

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from raysketch.sketches.bloom import BloomFilter
from raysketch.sketches.cms import CountMin
from raysketch.sketches.kll import KLL
from raysketch.sketches.tdigest import TDigest


# ---------------------------------------------------------------- Bloom
class TestBloom:
    def test_no_false_negatives(self):
        bf = BloomFilter(capacity=10000, fp_rate=0.01)
        items = [f"item-{i}" for i in range(10000)]
        bf.add_batch(items)
        assert bf.contains_batch(items).all()

    def test_fp_rate_within_bound(self):
        bf = BloomFilter(capacity=10000, fp_rate=0.01)
        bf.add_batch([f"item-{i}" for i in range(10000)])
        probes = [f"absent-{i}" for i in range(20000)]
        fpr = bf.contains_batch(probes).mean()
        assert fpr < 0.02  # 2x the configured 1% bound

    def test_merge_or_semantics(self):
        a = BloomFilter(num_bits=1 << 14, num_hashes=5)
        b = BloomFilter(num_bits=1 << 14, num_hashes=5)
        a.add_batch(["x", "y"])
        b.add_batch(["z"])
        a.merge(b)
        assert a.contains("x") and a.contains("z")
        # idempotent
        before = a.words.copy()
        a.merge(b)
        assert np.array_equal(a.words, before)

    def test_roundtrip_and_estimate(self):
        bf = BloomFilter(capacity=5000, fp_rate=0.01)
        bf.add_batch([str(i) for i in range(5000)])
        bf2 = BloomFilter.from_bytes(bf.to_bytes())
        assert np.array_equal(bf.words, bf2.words)
        est = bf2.finalize()["estimated_items"]
        assert abs(est - 5000) / 5000 < 0.05
        bf3 = pickle.loads(pickle.dumps(bf))
        assert np.array_equal(bf.words, bf3.words)

    def test_mismatched_merge_rejected(self):
        with pytest.raises(ValueError):
            BloomFilter(num_bits=128, num_hashes=3).merge(BloomFilter(num_bits=256, num_hashes=3))


# ------------------------------------------------------------- CountMin
class TestCountMin:
    def test_point_queries_zipf(self):
        rng = np.random.default_rng(3)
        zipf = rng.zipf(1.3, size=50000)
        items = [f"tool-{z}" for z in np.minimum(zipf, 500)]
        cm = CountMin(eps=0.001, delta=0.01)
        cm.add_batch(items)
        from collections import Counter

        truth = Counter(items)
        n = len(items)
        eps = np.e / cm.w
        for key, true_cnt in list(truth.items())[:100]:
            est = cm.estimate(key)
            assert est >= true_cnt  # never underestimates
            assert est <= true_cnt + eps * n + 1

    def test_weights_and_merge_add(self):
        a = CountMin(width=1024, depth=4)
        b = CountMin(width=1024, depth=4)
        a.add_batch(["x"], weights=[10])
        b.add_batch(["x"], weights=[5])
        b.add_batch(["y"])
        a.merge(b)
        assert a.estimate("x") == 15
        assert a.estimate("y") == 1
        assert a.total == 16

    def test_merge_associative(self):
        items = [f"e{i % 50}" for i in range(1000)]
        parts = [items[i::3] for i in range(3)]
        sketches = []
        for p in parts:
            c = CountMin(width=2048, depth=5)
            c.add_batch(p)
            sketches.append(c)
        ab_c = CountMin(width=2048, depth=5).merge(sketches[0]).merge(sketches[1]).merge(sketches[2])
        c_ba = CountMin(width=2048, depth=5).merge(sketches[2]).merge(sketches[1]).merge(sketches[0])
        assert np.array_equal(ab_c.table, c_ba.table)

    def test_roundtrip(self):
        cm = CountMin(width=512, depth=3)
        cm.add_batch([str(i % 20) for i in range(100)])
        cm2 = CountMin.from_bytes(cm.to_bytes())
        assert np.array_equal(cm.table, cm2.table) and cm2.total == 100
        cm3 = pickle.loads(pickle.dumps(cm))
        assert np.array_equal(cm.table, cm3.table)

    def test_int_str_canonicalization(self):
        import pyarrow as pa

        cm = CountMin(width=512, depth=3)
        cm.add_batch(pa.array([100, 100], type=pa.int64()))
        assert cm.estimate("100") == 2


# ------------------------------------------------------------------ KLL
class TestKLL:
    def test_rank_error_bound(self):
        rng = np.random.default_rng(11)
        data = rng.lognormal(5, 1.5, size=200000)
        kll = KLL(k=200)
        for i in range(0, len(data), 10000):
            kll.add_batch(data[i : i + 10000])
        s = np.sort(data)
        for q in [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]:
            est = kll.quantile(q)
            true_rank = np.searchsorted(s, est) / len(s)
            assert abs(true_rank - q) < 0.025, (q, est, true_rank)

    def test_merge_preserves_bound(self):
        rng = np.random.default_rng(12)
        data = rng.normal(0, 1, size=100000)
        parts = np.array_split(data, 7)
        sketches = []
        for p in parts:
            s = KLL(k=200)
            s.add_batch(p)
            sketches.append(s)
        merged = sketches[0]
        for s in sketches[1:]:
            merged.merge(s)
        assert merged.n == len(data)
        s_sorted = np.sort(data)
        for q in [0.1, 0.5, 0.9]:
            est = merged.quantile(q)
            true_rank = np.searchsorted(s_sorted, est) / len(s_sorted)
            assert abs(true_rank - q) < 0.03

    def test_small_exact(self):
        kll = KLL(k=200)
        kll.add_batch([1.0, 2.0, 3.0, 4.0, 5.0])
        assert abs(kll.quantile(0.5) - 3.0) < 1.0
        assert kll.n == 5

    def test_roundtrip(self):
        kll = KLL(k=128)
        kll.add_batch(np.arange(10000, dtype=np.float64))
        k2 = KLL.from_bytes(kll.to_bytes())
        assert k2.n == kll.n
        assert abs(k2.quantile(0.5) - kll.quantile(0.5)) < 1e-9
        k3 = pickle.loads(pickle.dumps(kll))
        assert k3.n == kll.n

    def test_nulls_dropped(self):
        import pyarrow as pa

        kll = KLL()
        kll.add_batch(pa.array([1.0, None, 3.0]))
        assert kll.n == 2


# -------------------------------------------------------------- TDigest
class TestTDigest:
    def test_quantile_accuracy(self):
        rng = np.random.default_rng(21)
        data = rng.lognormal(5, 1.5, size=200000)
        td = TDigest(compression=100)
        for i in range(0, len(data), 10000):
            td.add_batch(data[i : i + 10000])
        s = np.sort(data)
        for q in [0.01, 0.1, 0.5, 0.9, 0.99]:
            est = td.quantile(q)
            true_rank = np.searchsorted(s, est) / len(s)
            # t-digest: tighter at tails
            tol = 0.01 if q in (0.01, 0.99) else 0.03
            assert abs(true_rank - q) < tol, (q, est, true_rank)

    def test_centroid_budget(self):
        td = TDigest(compression=100)
        td.add_batch(np.random.default_rng(1).normal(size=100000))
        td._compress()
        assert len(td.means) <= 2 * td.delta + 10

    def test_merge(self):
        rng = np.random.default_rng(22)
        data = rng.normal(0, 1, size=100000)
        parts = np.array_split(data, 5)
        ds = []
        for p in parts:
            t = TDigest(compression=100)
            t.add_batch(p)
            ds.append(t)
        merged = ds[0]
        for t in ds[1:]:
            merged.merge(t)
        assert merged.n == len(data)
        s = np.sort(data)
        for q in [0.05, 0.5, 0.95]:
            est = merged.quantile(q)
            true_rank = np.searchsorted(s, est) / len(s)
            assert abs(true_rank - q) < 0.03

    def test_min_max_exact(self):
        td = TDigest()
        td.add_batch([5.0, 1.0, 9.0])
        assert td.min == 1.0 and td.max == 9.0
        assert td.quantile(0.0) == 1.0
        assert td.quantile(1.0) == 9.0

    def test_roundtrip(self):
        td = TDigest(compression=50)
        td.add_batch(np.arange(1000, dtype=np.float64))
        t2 = TDigest.from_bytes(td.to_bytes())
        assert t2.n == td.n and t2.min == td.min and t2.max == td.max
        assert abs(t2.quantile(0.5) - td.quantile(0.5)) < 1e-9
        t3 = pickle.loads(pickle.dumps(td))
        assert t3.n == td.n


# ------------------------------------------------------------- BottomK
class TestBottomK:
    def test_deterministic_sample_and_merge(self):
        from raysketch.sketches.bottomk import BottomK

        items = [f"doc-{i}" for i in range(5000)]
        whole = BottomK(k=256)
        whole.add_batch(items)
        parts = [items[i::4] for i in range(4)]
        sketches = []
        for p in parts:
            s = BottomK(k=256)
            s.add_batch(p)
            sketches.append(s)
        merged = BottomK(k=256)
        for s in sketches[::-1]:
            merged.merge(s)
        assert np.array_equal(merged.hashes, whole.hashes)
        assert merged.sample() == whole.sample()
        # idempotent
        merged.merge(sketches[0])
        assert np.array_equal(merged.hashes, whole.hashes)

    def test_distinct_estimate(self):
        from raysketch.sketches.bottomk import BottomK

        s = BottomK(k=512)
        s.add_batch([str(i) for i in range(50000)] * 2)  # dups collapse
        est = s.distinct_estimate()
        assert abs(est - 50000) / 50000 < 0.15  # ~1/sqrt(k) error
        small = BottomK(k=512)
        small.add_batch(["a", "b", "a"])
        assert small.distinct_estimate() == 2.0  # exact below k

    def test_roundtrip(self):
        from raysketch.sketches.bottomk import BottomK

        s = BottomK(k=64)
        s.add_batch([f"x{i}" for i in range(1000)])
        s2 = BottomK.from_bytes(s.to_bytes())
        assert np.array_equal(s.hashes, s2.hashes)
        assert s.sample() == s2.sample()
        s3 = pickle.loads(pickle.dumps(s))
        assert s3.sample() == s.sample()

    def test_sample_uniform_over_distinct(self):
        from raysketch.sketches.bottomk import BottomK

        # heavy duplication must not bias the sample
        s = BottomK(k=200)
        s.add_batch(["hot"] * 100000 + [f"cold-{i}" for i in range(2000)])
        samp = s.sample()
        assert sum(1 for e in samp if e == b"hot") <= 1


class TestExactSet:
    def test_collect_merge_roundtrip(self):
        import pyarrow as pa

        from raysketch.sketches import ExactSet

        a = ExactSet.empty(max_items=100)
        a.add_batch(pa.array(["x", "y", "x", "z"]))
        b = ExactSet.empty(max_items=100)
        b.add_batch(pa.array(["y", "w"]))
        m = ExactSet.from_bytes(a.to_bytes()).merge(ExactSet.from_bytes(b.to_bytes()))
        assert m.values_str() == ["w", "x", "y", "z"]
        assert not m.truncated
        rt = ExactSet.from_bytes(m.to_bytes())
        assert rt.values() == m.values() and rt.max_items == 100

    def test_cap_is_deterministic_and_associative(self):
        import pyarrow as pa

        from raysketch.sketches import ExactSet

        vals = [f"v{i:03d}" for i in range(50)]
        import random

        rng = random.Random(0)
        states = []
        for _ in range(4):
            sh = vals[:]
            rng.shuffle(sh)
            s = ExactSet.empty(max_items=10)
            s.add_batch(pa.array(sh))
            states.append(s)
        # any merge order → smallest 10 of the union, truncated flag set
        import functools

        m1 = functools.reduce(lambda x, y: x.merge(y),
                              [ExactSet.from_bytes(s.to_bytes()) for s in states])
        m2 = functools.reduce(lambda x, y: x.merge(y),
                              [ExactSet.from_bytes(s.to_bytes()) for s in states[::-1]])
        assert m1.values() == m2.values() == [v.encode() for v in sorted(vals)[:10]]
        assert m1.truncated and m2.truncated

    def test_int_str_coercion(self):
        import pyarrow as pa

        from raysketch.sketches import ExactSet

        s = ExactSet.empty()
        s.add_batch(pa.array([5, 6]))
        s.add_batch(pa.array(["5"]))
        assert s.finalize()["n_distinct"] == 2  # int 5 ≡ "5" canonical bytes


class TestKLLDeterminism:
    def test_merge_commutative_bitwise(self):
        from raysketch.sketches import KLL

        rng = np.random.default_rng(5)
        parts = []
        for _ in range(6):
            s = KLL(k=128)
            s.add_batch(rng.standard_normal(5000) * 100)
            parts.append(s.to_bytes())
        ab = KLL.from_bytes(parts[0]).merge(KLL.from_bytes(parts[1]))
        ba = KLL.from_bytes(parts[1]).merge(KLL.from_bytes(parts[0]))
        assert ab.to_bytes() == ba.to_bytes()

    def test_distributed_rerun_byte_identical(self):
        """Same partials + same reduce structure → byte-identical merged
        state, run after run (content-derived coins, no RNG state)."""
        import functools

        from raysketch.sketches import KLL

        rng = np.random.default_rng(6)
        data = [rng.standard_normal(4000) * 50 for _ in range(8)]

        def run():
            parts = []
            for d in data:
                s = KLL(k=200)
                s.add_batch(d)
                parts.append(s)
            return functools.reduce(lambda a, b: a.merge(b), parts).to_bytes()

        assert run() == run()

    def test_error_still_within_band(self):
        from raysketch.sketches import KLL

        rng = np.random.default_rng(7)
        vals = rng.standard_normal(200_000)
        s = KLL(k=200)
        s.add_batch(vals)
        for q in (0.1, 0.5, 0.9, 0.99):
            true = np.quantile(vals, q)
            est = s.quantile(q)
            r_err = abs((vals <= est).mean() - q)
            assert r_err < 0.02, (q, r_err)


class TestBottomKSetOps:
    """KMV combined-sketch set-operation estimates (Beyer et al.
    SIGMOD'07): direct intersection via the union's k-th-smallest
    threshold — error scales with the UNION estimate, unlike HLL
    inclusion-exclusion."""

    def _sketch(self, items, k=2048):
        from raysketch.sketches.bottomk import BottomK

        s = BottomK(k)
        s.add_batch(list(items))
        return s

    @pytest.mark.parametrize("na,nb,nc", [(20000, 10000, 5000),
                                          (5000, 5000, 4500),
                                          (10000, 10000, 0)])
    def test_accuracy(self, na, nb, nc):
        from raysketch.sketches.bottomk import set_op_estimates

        A = [f"a{i}" for i in range(na)] + [f"c{i}" for i in range(nc)]
        B = [f"b{i}" for i in range(nb)] + [f"c{i}" for i in range(nc)]
        est = set_op_estimates(self._sketch(A), self._sketch(B))
        true_union = na + nb + nc
        sigma = true_union / np.sqrt(2048)
        assert abs(est["union"] - true_union) < 6 * sigma
        assert abs(est["intersection"] - nc) < 6 * sigma
        assert abs(est["difference_a"] - na) < 8 * sigma

    def test_exact_below_k_and_inputs_unchanged(self):
        from raysketch.sketches.bottomk import set_op_estimates

        sa = self._sketch([f"x{i}" for i in range(100)] + ["s1", "s2"])
        sb = self._sketch([f"y{i}" for i in range(50)] + ["s1", "s2"])
        na, nb = len(sa.hashes), len(sb.hashes)
        est = set_op_estimates(sa, sb)
        # everything fits below k → exact
        assert est["union"] == 152 and est["intersection"] == 2
        assert est["jaccard"] == 2 / 152
        assert len(sa.hashes) == na and len(sb.hashes) == nb  # inputs untouched
        with pytest.raises(ValueError):
            set_op_estimates(sa, self._sketch(["z"], k=64))

    def test_empty(self):
        from raysketch.sketches.bottomk import set_op_estimates

        est = set_op_estimates(self._sketch([]), self._sketch([]))
        assert est == {"union": 0.0, "intersection": 0.0, "jaccard": 0.0,
                       "difference_a": 0.0}


class TestMisraGries:
    """Misra–Gries heavy-hitter summary: under-estimate-only, exact
    error-bound tracking, PODS'12 mergeability, coverage guarantee."""

    def _zipf_col(self, n=200_000, seed=1):
        import pyarrow as pa

        rng = np.random.default_rng(seed)
        z = np.clip(rng.zipf(1.3, size=n), 1, 400)
        return pa.array([f"w{int(v):03d}" for v in z])

    def test_guarantees_single_pass(self):
        import collections

        from raysketch.sketches import MisraGries

        col = self._zipf_col()
        mg = MisraGries(k=64)
        mg.add_batch(col)
        true = collections.Counter(col.to_pylist())
        n = len(col)
        assert mg.n == n and mg.decr <= n // 65
        for e, c in true.items():
            est = mg.counters.get(e.encode(), 0)
            assert est <= c  # never over-counts
            if e.encode() in mg.counters:
                assert c - est <= mg.decr  # exact per-element bound
            if c > n / 65:  # coverage: heavy items always tracked
                assert e.encode() in mg.counters

    def test_merge_keeps_coverage_and_counts(self):
        import collections

        from raysketch.sketches import MisraGries

        col = self._zipf_col()
        true = collections.Counter(col.to_pylist())
        n = len(col)
        merged = MisraGries(k=64)
        for i in range(7):
            p = MisraGries(k=64)
            p.add_batch(col.slice(i * 30_000, 30_000))
            merged.merge(p)
        assert merged.n == n
        for e, c in true.items():
            if c > n / 65:
                assert e.encode() in merged.counters
            est = merged.counters.get(e.encode(), 0)
            assert est <= c and (est == 0 or c - est <= merged.decr)

    def test_bytes_roundtrip_and_k_mismatch(self):
        from raysketch.sketches import MisraGries

        mg = MisraGries(k=8)
        mg.add_batch(self._zipf_col(n=5000))
        rt = MisraGries.from_bytes(mg.to_bytes())
        assert (rt.counters, rt.n, rt.decr, rt.k) == \
               (mg.counters, mg.n, mg.decr, mg.k)
        with pytest.raises(ValueError):
            mg.merge(MisraGries(k=16))
        with pytest.raises(ValueError):
            MisraGries.from_bytes(b"nope")

    def test_exact_below_k(self):
        import pyarrow as pa

        from raysketch.sketches import MisraGries

        mg = MisraGries(k=64)
        mg.add_batch(pa.array(["a", "b", "a", "c", "a", "b"]))
        assert mg.decr == 0
        assert mg.counters == {b"a": 3, b"b": 2, b"c": 1}
        assert mg.finalize()["candidates"][0] == ("a", 3)


# --------------------------------------------------------- Count-Sketch
class TestCountSketch:
    """AMS Count-Sketch: unbiased two-sided point estimates, F₂
    (self-join size) within the published variance band, bit-exact
    merge commutativity (pure integer adds), wire round-trip."""

    def _zipf(self, n=200_000, seed=3):
        import pyarrow as pa

        rng = np.random.default_rng(seed)
        z = np.clip(rng.zipf(1.3, size=n), 1, 400)
        return pa.array([f"u{int(v):03d}" for v in z])

    def test_f2_within_band(self):
        import collections

        from raysketch.sketches import CountSketch

        col = self._zipf()
        cs = CountSketch(width=1 << 13, depth=5)
        cs.add_batch(col)
        true = collections.Counter(col.to_pylist())
        f2 = sum(c * c for c in true.values())
        # per-row Var ≤ 2F₂²/w → σ/F₂ ≈ 1.56% at w=8192; median of 5
        # rows. 4σ ≈ 6.3% — deterministic hashes make this stable.
        assert abs(cs.f2_estimate() - f2) <= 0.063 * f2
        assert cs.total == len(col)

    def test_point_estimates_two_sided_band(self):
        import collections

        from raysketch.sketches import CountSketch

        col = self._zipf()
        cs = CountSketch(width=1 << 13, depth=5)
        cs.add_batch(col)
        true = collections.Counter(col.to_pylist())
        f2 = sum(c * c for c in true.values())
        noise = 3 * (f2 / (1 << 13)) ** 0.5
        import pyarrow as pa

        keys = sorted(true)
        ests = cs.estimate_batch(pa.array(keys))
        errs = np.array([abs(int(e) - true[k]) for k, e in zip(keys, ests)])
        # median-of-5 rows: the 3σ-per-row band holds for ~all keys
        assert (errs <= noise).mean() >= 0.99
        # unlike CMS the error is two-sided: under a deliberately tiny
        # width (forced collisions) some estimates undershoot and some
        # overshoot — CMS can only overshoot
        tiny = CountSketch(width=1 << 6, depth=3)
        tiny.add_batch(col)
        t_ests = tiny.estimate_batch(pa.array(keys))
        signed = np.array([int(e) - true[k] for k, e in zip(keys, t_ests)])
        assert (signed < 0).any() and (signed > 0).any()

    def test_merge_partition_invariance_bitexact(self):
        from raysketch.sketches import CountSketch

        col = self._zipf(n=70_000)
        whole = CountSketch(width=1 << 10, depth=3)
        whole.add_batch(col)
        merged = CountSketch(width=1 << 10, depth=3)
        for i in range(7):
            p = CountSketch(width=1 << 10, depth=3)
            p.add_batch(col.slice(i * 10_000, 10_000))
            merged.merge(p)
        assert np.array_equal(whole.table, merged.table)
        assert whole.f2_estimate() == merged.f2_estimate()
        assert whole.total == merged.total

    def test_weights_equal_repetition(self):
        import pyarrow as pa

        from raysketch.sketches import CountSketch

        a = CountSketch(width=1 << 8, depth=3)
        a.add_batch(pa.array(["x", "y"]), weights=[3, 2])
        b = CountSketch(width=1 << 8, depth=3)
        b.add_batch(pa.array(["x", "x", "x", "y", "y"]))
        assert np.array_equal(a.table, b.table) and a.total == b.total

    def test_bytes_roundtrip_and_errors(self):
        from raysketch.sketches import CountSketch

        cs = CountSketch(width=1 << 9, depth=5)
        cs.add_batch(self._zipf(n=5000))
        rt = CountSketch.from_bytes(cs.to_bytes())
        assert np.array_equal(rt.table, cs.table)
        assert (rt.d, rt.w, rt.total) == (cs.d, cs.w, cs.total)
        with pytest.raises(ValueError):
            cs.merge(CountSketch(width=1 << 8, depth=5))
        with pytest.raises(ValueError):
            CountSketch.from_bytes(b"nope")
        with pytest.raises(ValueError):
            CountSketch(width=64, depth=4)  # even depth: no median row


class TestDDSketch:
    """DDSketch (Masson et al. VLDB'19): value-relative quantile
    guarantee, exact-integer bucket boundaries (no libm), and the
    family's headline property here — commutative additive merges that
    are byte-deterministic at ANY partitioning and merge order, with
    no per-file-fold crutch."""

    def _vals(self, n=100000, seed=11):
        rng = np.random.default_rng(seed)
        return rng.integers(1, 10**12, size=n)

    def test_relative_error_bound(self):
        from raysketch.sketches import DDSketch

        vals = self._vals()
        s = DDSketch(a_num=1, a_den=100)  # alpha = 1%
        s.add_batch(vals)
        sv = np.sort(vals)
        for q in (0.001, 0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999):
            true = float(sv[max(1, int(np.ceil(q * len(sv)))) - 1])
            assert abs(s.quantile(q) - true) <= 0.01 * true + 1e-9

    def test_merge_any_partition_any_order_byte_identical(self):
        import random

        from raysketch.sketches import DDSketch

        vals = self._vals(n=20000, seed=3)
        whole = DDSketch()
        whole.add_batch(vals)
        for n_parts, seed in ((2, 0), (7, 1), (64, 2)):
            parts = np.array_split(vals, n_parts)
            sks = []
            for p in parts:
                d = DDSketch()
                d.add_batch(p)
                sks.append(d)
            random.Random(seed).shuffle(sks)
            m = sks[0]
            for d in sks[1:]:
                m = m.merge(d)
            assert m.to_bytes() == whole.to_bytes()

    def test_exact_integer_thresholds(self):
        from fractions import Fraction

        from raysketch.sketches.ddsketch import _thresholds

        t = _thresholds(1, 100)
        g = Fraction(101, 99)
        for k in (0, 1, 7, 99, 1000, len(t) - 2):
            assert t[k] == int(g ** (k + 1))
        assert t[-1] == (1 << 63) - 1  # covers all of int64
        assert len(t) < 2500  # log-bounded: no collapse pass needed

    def test_zero_negative_and_wire(self):
        from raysketch.sketches import DDSketch

        s = DDSketch()
        s.add_batch(np.array([-1000, -10, 0, 0, 10, 1000]))
        assert s.n == 6 and s.zero == 2
        assert s.quantile(0.5) == 0.0
        assert s.quantile(1.0) > 0 and s.quantile(0.01) < 0
        rt = DDSketch.from_bytes(s.to_bytes())
        assert rt.to_bytes() == s.to_bytes()
        with pytest.raises(ValueError):
            s.merge(DDSketch(a_num=2, a_den=100))
        with pytest.raises(ValueError):
            DDSketch.from_bytes(b"nope")
        with pytest.raises(ValueError):
            DDSketch(a_num=100, a_den=100)

    def test_distributed_fold_bit_identical_any_parallelism(self, ray_session):
        """The engine-level claim: plain sketch_aggregate through Ray's
        nondeterministic dynamic batcher, at different partition counts,
        produces the IDENTICAL DDSketch — no per-file fold needed."""
        import pandas as pd
        import ray.data

        from raysketch.agg import sketch_aggregate
        from raysketch.sketches import DDSketch

        vals = self._vals(n=50000, seed=9)
        df = pd.DataFrame({"v": vals})
        blobs = []
        for n_blocks in (1, 4, 16):
            ds = ray.data.from_pandas(df).repartition(n_blocks)
            blobs.append(sketch_aggregate(ds, "ddsketch", on="v",
                                          mode="bytes"))
        assert blobs[0] == blobs[1] == blobs[2]
        ref = DDSketch()
        ref.add_batch(vals)
        assert blobs[0] == ref.to_bytes()


class TestREQ:
    """REQ relative-error quantiles (PODS'21 shape, engineering
    variant — see module docstring): tail rank error bounded relative
    to the TAIL size, strictly better than additive-KLL at the extreme
    tail, deterministic content-coin compaction."""

    def _vals(self, dist, n=10**6, seed=2):
        rng = np.random.default_rng(seed)
        return (rng.uniform(0, 1e9, n) if dist == "uniform"
                else rng.pareto(1.5, n) * 1000)

    @pytest.mark.parametrize("dist", ["uniform", "pareto"])
    def test_tail_rank_error_relative(self, dist):
        from raysketch.sketches import REQ

        vals = self._vals(dist)
        sv = np.sort(vals)
        n = len(sv)
        r = REQ(k=128)
        r.add_batch(vals)
        assert sum(len(l) for l in r.levels) < 50 * 128  # sublinear state
        for q in (0.9, 0.99, 0.999, 0.9999):
            est = r.quantile(q)
            tr = np.searchsorted(sv, est, side="right")
            rel_tail = abs(tr - q * n) / max(1, n - q * n + 1)
            assert rel_tail <= 0.15, (q, rel_tail)  # measured ≤ 0.045

    def test_tail_beats_additive_kll(self):
        from raysketch.sketches import KLL, REQ

        vals = self._vals("uniform")
        sv = np.sort(vals)
        n = len(sv)
        r = REQ(k=128)
        r.add_batch(vals)
        kl = KLL(k=200)  # comparable state size
        kl.add_batch(vals)
        q = 0.9999
        err = {}
        for name, sk in (("req", r), ("kll", kl)):
            tr = np.searchsorted(sv, sk.quantile(q), side="right")
            err[name] = abs(tr - q * n) / max(1, n - q * n + 1)
        assert err["req"] < err["kll"] / 10

    def test_merge_commutative_bytes_and_wire(self):
        from raysketch.sketches import REQ

        vals = self._vals("uniform", n=50000, seed=5)
        a1, b1, a2, b2 = (REQ(k=64) for _ in range(4))
        a1.add_batch(vals[:30000]); a2.add_batch(vals[:30000])
        b1.add_batch(vals[30000:]); b2.add_batch(vals[30000:])
        m1 = a1.merge(b1)
        m2 = b2.merge(a2)
        assert m1.to_bytes() == m2.to_bytes()
        rt = REQ.from_bytes(m1.to_bytes())
        assert rt.to_bytes() == m1.to_bytes() and rt.n == m1.n
        with pytest.raises(ValueError):
            m1.merge(REQ(k=32))
        with pytest.raises(ValueError):
            REQ.from_bytes(b"zzzz")
        with pytest.raises(ValueError):
            REQ(k=7)

    def test_top_items_exact_below_protection(self):
        """The top-k items of level 0 are never compacted: with
        n <= 2k the sketch is exact everywhere."""
        from raysketch.sketches import REQ

        vals = np.arange(1, 201, dtype=np.float64)
        r = REQ(k=128)
        r.add_batch(vals)
        for q in (0.1, 0.5, 0.9, 1.0):
            want = np.quantile(vals, q, method="lower")
            assert abs(r.quantile(q) - want) <= 1.0


class TestNewFamiliesProperties:
    """Hypothesis property tests for the round-4 families: DDSketch's
    α bound and partition-invariant merges, REQ's merge commutativity
    and count conservation, on adversarially small/duplicated inputs
    the fixed-seed tests don't reach."""

    @given(
        vals=st.lists(st.integers(min_value=-10**6, max_value=10**6),
                      min_size=1, max_size=400),
        n_parts=st.integers(min_value=1, max_value=7),
        q=st.sampled_from([0.01, 0.25, 0.5, 0.75, 0.99]),
    )
    @settings(max_examples=60, deadline=None)
    def test_ddsketch_alpha_bound_and_partition_invariance(
            self, vals, n_parts, q):
        from raysketch.sketches import DDSketch

        arr = np.array(vals, dtype=np.int64)
        whole = DDSketch()
        whole.add_batch(arr)
        merged = DDSketch()
        for p in np.array_split(arr, n_parts):
            d = DDSketch()
            d.add_batch(p)
            merged.merge(d)
        assert merged.to_bytes() == whole.to_bytes()

        sv = np.sort(arr)
        true = float(sv[max(1, int(np.ceil(q * len(sv)))) - 1])
        est = whole.quantile(q)
        if true == 0:
            assert est == 0.0
        else:
            assert abs(est - true) <= 0.01 * abs(true) + 1e-9

    @given(
        vals=st.lists(st.integers(min_value=0, max_value=10**9),
                      min_size=2, max_size=500),
        cut=st.floats(min_value=0.1, max_value=0.9),
    )
    @settings(max_examples=60, deadline=None)
    def test_req_merge_commutative_and_n_conserved(self, vals, cut):
        from raysketch.sketches import REQ

        arr = np.array(vals, dtype=np.float64)
        k = int(len(arr) * cut)
        a1, b1, a2, b2 = (REQ(k=16) for _ in range(4))
        a1.add_batch(arr[:k]); a2.add_batch(arr[:k])
        b1.add_batch(arr[k:]); b2.add_batch(arr[k:])
        m1, m2 = a1.merge(b1), b2.merge(a2)
        assert m1.to_bytes() == m2.to_bytes()
        assert m1.n == len(arr)
        # every retained item is a real input value (no invention)
        inp = set(arr.tolist())
        for lvl in m1.levels:
            assert set(lvl.tolist()) <= inp


class TestMomentsSketch:
    """Moments sketch (Gan et al. VLDB'18): quantiles from EXACT
    big-int power sums — the smallest mergeable quantile state
    (~150 B at k=8), integer-addition merges (commutative, associative,
    exact ⇒ byte-deterministic at any partitioning), and a maxent
    quantile estimate whose accuracy is asserted as MEASURED (the
    paper's guarantee is distribution-dependent, so no universal
    bound is claimed)."""

    def test_power_sums_exact_vs_bruteforce(self):
        from raysketch.sketches import MomentsSketch

        rng = np.random.default_rng(5)
        vals = rng.integers(0, 2**31, size=3000)
        s = MomentsSketch(k=8)
        s.add_batch(vals)
        py = [int(x) for x in vals]
        for p in range(1, 9):
            assert s.sums[p - 1] == sum(v ** p for v in py)  # big ints
        assert s.vmin == min(py) and s.vmax == max(py)
        assert s.n == len(py)

    def test_merge_any_partition_any_order_byte_identical(self):
        import random

        from raysketch.sketches import MomentsSketch

        rng = np.random.default_rng(2)
        vals = rng.integers(0, 10**6, size=20000)
        whole = MomentsSketch()
        whole.add_batch(vals)
        for n_parts, seed in ((2, 0), (7, 1), (64, 2)):
            parts = np.array_split(vals, n_parts)
            sks = []
            for p in parts:
                d = MomentsSketch()
                d.add_batch(p)
                sks.append(d)
            random.Random(seed).shuffle(sks)
            m = sks[0]
            for d in sks[1:]:
                m = m.merge(d)
            assert m.to_bytes() == whole.to_bytes()

    def test_maxent_quantile_rank_error(self):
        """Measured rank-error band on three shapes (smooth unimodal,
        uniform, heavy-tailed): ≤ 3% of n at the four headline
        quantiles — what the smoke measurements showed with margin."""
        from raysketch.sketches import MomentsSketch

        rng = np.random.default_rng(7)
        shapes = {
            "binomial": rng.binomial(1000, 0.3, size=20000),
            "uniform": rng.integers(0, 5000, size=20000),
            "lognormal": np.exp(rng.normal(5, 0.8, 20000)).astype(np.int64),
        }
        for name, v in shapes.items():
            v = np.asarray(v, dtype=np.int64)
            s = MomentsSketch()
            s.add_batch(v)
            for q in (0.1, 0.5, 0.9, 0.99):
                est = s.quantile(q)
                rank_err = abs(float((v <= est).mean()) - q)
                assert rank_err <= 0.03, (name, q, est, rank_err)

    def test_wire_empty_constant_and_errors(self):
        from raysketch.sketches import MomentsSketch

        s = MomentsSketch()
        rt = MomentsSketch.from_bytes(s.to_bytes())
        assert rt.to_bytes() == s.to_bytes() and rt.n == 0
        with pytest.raises(ValueError):
            s.quantile(0.5)
        # constant data: quantile is exact
        c = MomentsSketch()
        c.add_batch(np.full(100, 42, dtype=np.int64))
        assert c.quantile(0.5) == 42.0
        # negatives round-trip (signed big ints on the wire)
        neg = MomentsSketch()
        neg.add_batch(np.array([-5, -3, 7], dtype=np.int64))
        rt2 = MomentsSketch.from_bytes(neg.to_bytes())
        assert rt2.sums == neg.sums and rt2.vmin == -5
        with pytest.raises(ValueError):
            neg.merge(MomentsSketch(k=4))
        with pytest.raises(ValueError):
            MomentsSketch.from_bytes(b"nope")
        with pytest.raises(ValueError):
            MomentsSketch(k=0)
        with pytest.raises(TypeError):
            MomentsSketch().add_batch(np.array([1.5]))

    def test_distributed_fold_bit_identical_any_parallelism(self, ray_session):
        """Plain sketch_aggregate through Ray's nondeterministic dynamic
        batcher, at different partition counts, produces the IDENTICAL
        state — commutative exact merges, no per-file fold needed."""
        import pandas as pd
        import ray.data

        from raysketch.agg import sketch_aggregate
        from raysketch.sketches import MomentsSketch

        rng = np.random.default_rng(9)
        vals = rng.integers(0, 4096, size=50000)
        df = pd.DataFrame({"v": vals})
        blobs = []
        for n_blocks in (1, 4, 16):
            ds = ray.data.from_pandas(df).repartition(n_blocks)
            blobs.append(sketch_aggregate(ds, "moments", on="v",
                                          mode="bytes"))
        assert blobs[0] == blobs[1] == blobs[2]
        ref = MomentsSketch()
        ref.add_batch(vals)
        assert blobs[0] == ref.to_bytes()


class TestFrequentDirections:
    """Frequent Directions (Liberty KDD'13 / GLPW SICOMP'16): the
    matrix-sketch family — deterministic spectral guarantee
    0 ⪯ AᵀA−BᵀB ⪯ shed·I with shed ≤ 2‖A‖²_F/ℓ, preserved under the
    paper's append-and-reshrink merge."""

    def _mat(self, n=2000, d=64, seed=1):
        rng = np.random.default_rng(seed)
        U = rng.normal(size=(n, 5))
        V = rng.normal(size=(5, d))
        return U @ V * 3 + rng.normal(size=(n, d)) * 0.5

    def test_spectral_guarantee_single_pass(self):
        from raysketch.sketches import FrequentDirections

        A = self._mat()
        fd = FrequentDirections(ell=32)
        fd.add_batch(A)
        B = fd._final_rows()
        diff = np.linalg.eigvalsh(A.T @ A - B.T @ B)
        assert diff.min() >= -1e-6  # AᵀA − BᵀB ⪰ 0
        assert diff.max() <= fd.shed + 1e-6  # a-posteriori
        assert fd.shed <= fd.error_bound() + 1e-6  # a-priori 2‖A‖²_F/ℓ
        svA = np.linalg.svd(A, compute_uv=False)
        svB = fd.singular_values()
        for i in range(5):
            assert svB[i] <= svA[i] + 1e-9  # never overestimates
            assert svA[i] ** 2 - svB[i] ** 2 <= fd.shed + 1e-6

    def test_merge_preserves_guarantee(self):
        from raysketch.sketches import FrequentDirections

        A = self._mat(seed=3)
        parts = np.array_split(A, 8)
        sks = []
        for p in parts:
            f = FrequentDirections(ell=32)
            f.add_batch(p)
            sks.append(f)
        m = sks[0]
        for f in sks[1:]:
            m = m.merge(f)
        assert m.n == len(A)
        assert abs(m.fro2 - float((A * A).sum())) < 1e-4 * m.fro2
        B = m._final_rows()
        diff = np.linalg.eigvalsh(A.T @ A - B.T @ B)
        assert diff.min() >= -1e-6
        assert diff.max() <= m.shed + 1e-6
        assert m.shed <= m.error_bound() + 1e-6

    def test_wire_empty_and_errors(self):
        from raysketch.sketches import FrequentDirections

        e = FrequentDirections(ell=8)
        rt = FrequentDirections.from_bytes(e.to_bytes())
        assert rt.to_bytes() == e.to_bytes() and rt.n == 0
        assert len(e.singular_values()) == 0
        f = FrequentDirections(ell=8)
        f.add_batch(self._mat(n=100, d=16, seed=4))
        rt2 = FrequentDirections.from_bytes(f.to_bytes())
        assert rt2.to_bytes() == f.to_bytes()
        assert np.array_equal(rt2._final_rows(), f._final_rows())
        # merging an empty sketch is identity on the state rows
        g = FrequentDirections(ell=8)
        before = f.to_bytes()
        assert f.merge(g).to_bytes() == before
        with pytest.raises(ValueError):
            f.merge(FrequentDirections(ell=16))
        with pytest.raises(ValueError):
            h = FrequentDirections(ell=8)
            h.add_batch(self._mat(n=10, d=8, seed=5))
            f.merge(h)
        with pytest.raises(ValueError):
            FrequentDirections.from_bytes(b"nope")
        with pytest.raises(ValueError):
            FrequentDirections(ell=1)

    def test_arrow_list_column_fold(self):
        import pyarrow as pa

        from raysketch.sketches import FrequentDirections

        A = self._mat(n=300, d=16, seed=6)
        lst = pa.array([row.tolist() for row in A])  # list<double>
        fsl = pa.FixedSizeListArray.from_arrays(
            pa.array(A.reshape(-1)), 16)
        a1, a2, a3 = (FrequentDirections(ell=16) for _ in range(3))
        a1.add_batch(A)
        a2.add_batch(lst)
        a3.add_batch(fsl)
        assert a1.to_bytes() == a2.to_bytes() == a3.to_bytes()


class TestCuckooFilter:
    def _items(self, n, tag="u"):
        import pyarrow as pa

        return pa.array([f"{tag}-{i}" for i in range(n)])

    def test_no_false_negatives_and_fpr(self):
        import pyarrow as pa

        from raysketch.sketches import CuckooFilter

        cf = CuckooFilter(capacity=50_000)
        items = self._items(40_000)
        cf.add_batch(items)
        assert cf.contains_batch(items).all()
        ghosts = self._items(40_000, "ghost")
        fpr = cf.contains_batch(ghosts).mean()
        # theoretical 2*4*load/2^16 ≈ 2.2e-4 at this load; 5x slack
        assert fpr < 5 * cf.finalize()["fp_rate_estimate"] + 1e-4

    def test_delete_removes_without_harming_survivors(self):
        import pyarrow as pa

        from raysketch.sketches import CuckooFilter

        cf = CuckooFilter(capacity=50_000)
        items = self._items(30_000)
        cf.add_batch(items)
        dels = self._items(10_000)  # first 10k (known inserted)
        assert cf.delete_batch(dels).all()
        survivors = pa.array([f"u-{i}" for i in range(10_000, 30_000)])
        assert cf.contains_batch(survivors).all()  # contract: no FN
        # deleted items only linger as false positives
        assert cf.contains_batch(dels).mean() < 0.01

    def test_lookup_order_independent(self):
        import numpy as np
        import pyarrow as pa

        from raysketch.sketches import CuckooFilter

        rng = np.random.default_rng(3)
        base = [f"k-{i}" for i in range(20_000)]
        shuf = list(base)
        rng.shuffle(shuf)
        a, b = CuckooFilter(capacity=30_000), CuckooFilter(capacity=30_000)
        a.add_batch(pa.array(base))
        b.add_batch(pa.array(shuf))
        probe = pa.array(base + [f"g-{i}" for i in range(20_000)])
        assert (a.contains_batch(probe) == b.contains_batch(probe)).all()

    def test_merge_equals_union_lookups(self):
        import pyarrow as pa

        from raysketch.sketches import CuckooFilter

        items = self._items(30_000)
        a, b = CuckooFilter(capacity=50_000), CuckooFilter(capacity=50_000)
        a.add_batch(pa.array(items[:15_000]))
        b.add_batch(pa.array(items[15_000:]))
        a.merge(b)
        assert a.contains_batch(items).all()
        one = CuckooFilter(capacity=50_000)
        one.add_batch(items)
        probe = self._items(30_000, "g")
        # same stored multiset → identical probe answers modulo FP sets;
        # both must agree on every inserted item and stored count
        assert a.items_stored() == one.items_stored()
        with pytest.raises(ValueError):
            a.merge(CuckooFilter(capacity=1024))

    def test_multiset_semantics(self):
        import pyarrow as pa

        from raysketch.sketches import CuckooFilter

        cf = CuckooFilter(capacity=1024)
        cf.add_batch(pa.array(["x", "x"]))
        assert cf.items_stored() == 2
        cf.delete_batch(pa.array(["x"]))
        assert cf.contains("x")  # one copy remains
        cf.delete_batch(pa.array(["x"]))
        assert cf.items_stored() == 0

    def test_roundtrip_and_bad_dump(self):
        import pyarrow as pa

        from raysketch.sketches import CuckooFilter

        cf = CuckooFilter(capacity=2048)
        cf.add_batch(self._items(1000))
        rt = CuckooFilter.from_bytes(cf.to_bytes())
        assert (rt.buckets == cf.buckets).all()
        with pytest.raises(ValueError):
            CuckooFilter.from_bytes(b"nope")
        with pytest.raises(ValueError):
            CuckooFilter.from_bytes(cf.to_bytes()[:10])

    def test_full_filter_raises(self):
        import pyarrow as pa

        from raysketch.sketches import CuckooFilter

        cf = CuckooFilter(capacity=8)  # nb=4 → 16 slots
        with pytest.raises(RuntimeError):
            cf.add_batch(self._items(4000))

    def test_int_str_canonicalization(self):
        import pyarrow as pa

        from raysketch.sketches import CuckooFilter

        cf = CuckooFilter(capacity=1024)
        cf.add_batch(pa.array([100, 200], type=pa.int64()))
        assert cf.contains("100") and cf.contains("200")


def test_cuckoo_churn_membership_exact_twin(ray_session):
    """The query's n_members must dominate the exact
    |error ∩ (view \\ purchase)| (no false negatives) and stay within
    the FP envelope above it; counts match the exact sets."""
    import duckdb

    import __ray_entry__ as e

    sf_dir = "/root/testdata/sf0.001"
    got = e.queries()["cuckoo_churn_membership"](sf_dir)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_dir}/events.parquet'")
    nv, nd, np_, nm = con.execute("""
        WITH v AS (SELECT DISTINCT user_id FROM events WHERE event_type='view'),
             p AS (SELECT DISTINCT user_id FROM events WHERE event_type='purchase'),
             er AS (SELECT DISTINCT user_id FROM events WHERE event_type='error')
        SELECT (SELECT COUNT(*) FROM v),
               (SELECT COUNT(*) FROM v JOIN p USING (user_id)),
               (SELECT COUNT(*) FROM er),
               (SELECT COUNT(*) FROM er JOIN v USING (user_id)
                WHERE user_id NOT IN (SELECT user_id FROM p))
    """).fetchone()
    assert int(got["n_viewers"].iloc[0]) == nv
    assert int(got["n_deleted"].iloc[0]) == nd
    assert int(got["n_probes"].iloc[0]) == np_
    assert nm <= int(got["n_members"].iloc[0]) <= nm + max(2, int(0.01 * np_))
