"""Ray Data aggregation layer: distributed fold/merge equals local fold
byte-for-byte, grouped estimates match exact counts, all five sketch
families run through groupby-aggregate."""

import numpy as np
import pyarrow as pa
import pytest

import raysketch
from raysketch import HLL
from raysketch.agg import SketchMerge, fold_partials, sketch_aggregate
from raysketch.sketches import CountMin, KLL, TDigest
from raysketch.sources.transcripts import gen_transcripts


@pytest.fixture(scope="module")
def transcripts(ray_session):
    import ray.data

    tbl = gen_transcripts(20000, seed=42)
    return ray.data.from_arrow(tbl).repartition(8), tbl


def test_global_hll_matches_local_fold(transcripts):
    ds, tbl = transcripts
    est = sketch_aggregate(ds, "hll", on="conv_id", mode="estimate")
    local = HLL()
    local.add_batch(tbl.column("conv_id"))
    assert est == local.finalize()
    exact = len(set(tbl.column("conv_id").to_pylist()))
    assert abs(est - exact) / max(exact, 1) < 0.02


def test_global_hll_registers_identical(transcripts):
    """Distributed tree merge produces byte-identical registers to a
    single-process fold (merge order independence at the Ray level)."""
    ds, tbl = transcripts
    blob = sketch_aggregate(ds, "hll", on="conv_id", mode="bytes")
    local = HLL()
    local.add_batch(tbl.column("conv_id"))
    assert np.array_equal(HLL.from_bytes(blob).regs, local.regs)


def test_grouped_hll_by_role(transcripts):
    ds, tbl = transcripts
    out = sketch_aggregate(
        ds, "hll", on="conv_id", by="role", mode="estimate", alias_name="distinct_convs"
    ).to_pandas()
    df = tbl.to_pandas()
    exact = df.groupby("role")["conv_id"].nunique()
    assert set(out["role"]) == set(exact.index)
    for _, row in out.iterrows():
        e = exact[row["role"]]
        assert abs(row["distinct_convs"] - e) / max(e, 1) < 0.02


def test_grouped_global_mode_matches_shuffle(transcripts):
    """by_mode='global' (one tree reduce over a {key: state} dict) must
    produce register-identical grouped merges to the groupby-shuffle
    path — merge associativity, at the Ray level (VERDICT r02 item 7)."""
    ds, tbl = transcripts
    shuffle = sketch_aggregate(
        ds, "hll", on="conv_id", by="role", mode="bytes", alias_name="blob"
    ).to_pandas().sort_values("role").reset_index(drop=True)
    glob = sketch_aggregate(
        ds, "hll", on="conv_id", by="role", mode="bytes", alias_name="blob",
        by_mode="global",
    ).sort_values("role").reset_index(drop=True)
    assert list(shuffle["role"]) == list(glob["role"])
    for a, b in zip(shuffle["blob"], glob["blob"]):
        assert np.array_equal(HLL.from_bytes(a).regs, HLL.from_bytes(b).regs)


def test_grouped_global_mode_guard(transcripts):
    """The global by-path must refuse high-cardinality keys instead of
    silently building an unbounded driver-side dict."""
    ds, tbl = transcripts
    with pytest.raises(Exception, match="max_groups|groups"):
        sketch_aggregate(ds, "hll", on="role", by="conv_id",
                         mode="estimate", by_mode="global", max_groups=16)


def test_composite_key_hll(transcripts):
    ds, tbl = transcripts
    est = sketch_aggregate(ds, "hll", on=["role", "tool"], mode="estimate")
    df = tbl.to_pandas()
    exact = len(df.groupby(["role", "tool"]).size())
    assert abs(est - exact) <= max(1, 0.02 * exact)


def test_countmin_heavy_hitters(transcripts):
    ds, tbl = transcripts
    blob = sketch_aggregate(ds, "countmin", on="tool", mode="bytes", width=1 << 14, depth=5)
    cm = CountMin.from_bytes(blob)
    df = tbl.to_pandas()
    truth = df["tool"].value_counts()
    assert cm.total == len(df)
    for tool, cnt in truth.head(10).items():
        est = cm.estimate(tool)
        assert est >= cnt
        assert est <= cnt + np.e / cm.w * cm.total + 1


def test_quantile_sketches(transcripts):
    import pyarrow.compute as pc

    ds, tbl = transcripts
    ds_len = ds.map_batches(
        lambda t: t.append_column("text_len", pc.cast(pc.utf8_length(t.column("text")), pa.int64())),
        batch_format="pyarrow",
    )
    lens = pc.utf8_length(tbl.column("text")).to_numpy().astype(np.float64)
    for name, cls in [("kll", KLL), ("tdigest", TDigest)]:
        blob = sketch_aggregate(ds_len, name, on="text_len", mode="bytes")
        sk = cls.from_bytes(blob)
        s = np.sort(lens)
        for q in [0.1, 0.5, 0.9]:
            est = sk.quantile(q)
            # discrete data: a repeated value occupies a rank *interval*
            lo = np.searchsorted(s, est, side="left") / len(s)
            hi = np.searchsorted(s, est, side="right") / len(s)
            assert lo - 0.035 <= q <= hi + 0.035, (name, q, est, lo, hi)


def test_bloom_membership(transcripts):
    from raysketch.sketches import BloomFilter

    ds, tbl = transcripts
    blob = sketch_aggregate(ds, "bloom", on="conv_id", mode="bytes",
                            capacity=10000, fp_rate=0.01)
    bf = BloomFilter.from_bytes(blob)
    convs = list(set(tbl.column("conv_id").to_pylist()))
    assert bf.contains_batch(convs).all()
    absent = [f"conv-x{i}" for i in range(5000)]
    assert bf.contains_batch(absent).mean() < 0.02


def test_partial_fold_shapes(transcripts):
    ds, _ = transcripts
    partials = fold_partials(ds, "hll", on="conv_id", by=["role"])
    t = partials.take(3)
    assert set(t[0].keys()) == {"role", "sketch", "partial_n"}
    assert isinstance(t[0]["sketch"], bytes)


def test_multi_sketch_single_pass(transcripts):
    """One pass over the data updates all five sketch families; results
    match the individual aggregates."""
    import pyarrow.compute as pc

    from raysketch.agg import multi_sketch_aggregate
    from raysketch.sketches import CountMin

    ds, tbl = transcripts
    ds_len = ds.map_batches(
        lambda t: t.append_column(
            "text_len", pc.cast(pc.utf8_length(t.column("text")), pa.int64())
        ),
        batch_format="pyarrow",
    )
    out = multi_sketch_aggregate(ds_len, {
        "distinct_convs": {"sketch": "hll", "on": "conv_id"},
        "distinct_pairs": {"sketch": "hll", "on": ["role", "tool"]},
        "tool_counts": {"sketch": "countmin", "on": "tool", "mode": "bytes",
                        "width": 1 << 14, "depth": 5},
        "len_quantiles": {"sketch": "tdigest", "on": "text_len"},
        "seen": {"sketch": "bloom", "on": "conv_id", "mode": "bytes",
                 "capacity": 10000},
    })
    df = tbl.to_pandas()
    exact = df["conv_id"].nunique()
    assert abs(out["distinct_convs"] - exact) / exact < 0.02
    exact_pairs = len(df.groupby(["role", "tool"]).size())
    assert abs(out["distinct_pairs"] - exact_pairs) <= max(1, 0.02 * exact_pairs)
    cm = CountMin.from_bytes(out["tool_counts"])
    assert cm.total == len(df)
    assert out["len_quantiles"]["n"] == len(df)

    # grouped variant
    g = multi_sketch_aggregate(ds_len, {
        "distinct_convs": {"sketch": "hll", "on": "conv_id"},
        "len_q": {"sketch": "kll", "on": "text_len",
                  "mode": lambda sk: sk.quantile(0.5)},
    }, by="role").to_pandas()
    per_role = df.groupby("role")["conv_id"].nunique()
    for _, r in g.iterrows():
        e = per_role[r["role"]]
        assert abs(r["distinct_convs"] - e) / max(e, 1) < 0.02
        assert r["len_q"] >= 0


def test_salted_two_stage_identical(transcripts):
    """Skew defusal: salted two-stage grouped merge must equal the
    direct grouped merge exactly (merge associativity)."""
    ds, tbl = transcripts
    direct = sketch_aggregate(ds, "hll", on="conv_id", by="role",
                              mode="estimate", alias_name="d").to_pandas()
    salted = sketch_aggregate(ds, "hll", on="conv_id", by="role",
                              mode="estimate", alias_name="d",
                              salt=8).to_pandas()
    a = direct.sort_values("role").reset_index(drop=True)
    b = salted.sort_values("role").reset_index(drop=True)
    assert a.equals(b)


def test_null_keys_and_empty_strings(ray_session):
    """Null group keys and empty-string elements flow through (the
    reference treats "" as a real element; nulls coerce to "")."""
    import ray.data

    t = pa.table({
        "k": pa.array(["a", None, "a", None]),
        "v": pa.array(["", "x", None, "y"]),
    })
    ds = ray.data.from_arrow(t)
    out = sketch_aggregate(ds, "hll", on="v", by="k",
                           mode="estimate", alias_name="n").to_pandas()
    # group "a": elements {"", null→""} → 1 distinct; group null: {x, y} → 2
    got = {row["k"]: row["n"] for _, row in out.iterrows()}
    assert got["a"] == 1
    assert got[None] == 2


@pytest.mark.parametrize("p", [8, 10, 12, 16])
def test_hll_precision_range(ray_session, p):
    """Error bound 1.04/sqrt(2^p) holds across the precision range."""
    h = HLL(p=p)
    n = 50000
    h.add_batch([f"e{i}" for i in range(n)])
    sigma = 1.04 / np.sqrt(1 << p)
    assert abs(h.finalize() - n) <= 4 * sigma * n + 1
    # round-trips through the private wire format
    h2 = HLL.from_bytes(h.to_bytes())
    assert h2.p == p and np.array_equal(h2.regs, h.regs)
    # cross-precision merges rejected
    with pytest.raises(ValueError):
        HLL(p=p).merge(HLL(p=14))


def test_fold_with_empty_batches(ray_session):
    """Batches that become empty after a filter must not break the fold."""
    import pyarrow.compute as pc
    import ray.data

    t = pa.table({"k": ["a"] * 100 + ["b"] * 100, "v": [str(i) for i in range(200)]})
    ds = ray.data.from_arrow(t).repartition(4).map_batches(
        lambda b: b.filter(pc.equal(b.column("k"), "a")), batch_format="pyarrow"
    )
    est = sketch_aggregate(ds, "hll", on="v", mode="estimate")
    assert est == 100
    out = sketch_aggregate(ds, "hll", on="v", by="k", mode="estimate",
                           alias_name="n").to_pandas()
    assert dict(zip(out["k"], out["n"])) == {"a": 100}


def test_distributed_equals_reference_binary_golden(ray_session):
    """End-to-end parity statement: the distributed Ray pipeline over the
    words-like corpus produces EXACTLY the estimate the reference binary
    printed for the same lines (tests/golden/estimates.json)."""
    import json
    import os
    import random

    import ray.data

    gold = json.load(open(os.path.join(os.path.dirname(__file__), "golden", "estimates.json")))
    rng2 = random.Random(7)
    words = ["".join(rng2.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(4)) for _ in range(12238)]
    corpus = [words[rng2.randrange(len(words))] for _ in range(72786)]
    ds = ray.data.from_arrow(pa.table({"w": corpus})).repartition(16)
    est = sketch_aggregate(ds, "hll", on="w", mode="estimate")
    assert est == gold["words_like"]["estimate_dense"]


def test_multi_key_grouped_aggregate(transcripts):
    ds, tbl = transcripts
    out = sketch_aggregate(ds, "hll", on="conv_id", by=["role", "tool"],
                           mode="estimate", alias_name="n").to_pandas()
    df = tbl.to_pandas()
    exact = df.groupby(["role", "tool"])["conv_id"].nunique()
    assert len(out) == len(exact)
    for _, r in out.iterrows():
        e = exact[(r["role"], r["tool"])]
        assert abs(r["n"] - e) / max(e, 1) < 0.03


def test_salted_global_identical(transcripts):
    ds, tbl = transcripts
    direct = sketch_aggregate(ds, "hll", on="conv_id", mode="bytes")
    salted = sketch_aggregate(ds, "hll", on="conv_id", mode="bytes", salt=8)
    assert np.array_equal(HLL.from_bytes(direct).regs, HLL.from_bytes(salted).regs)


def test_sketch_aggregate_files_deterministic(ray_session, tmp_path):
    """Per-file folds + canonical reduce: global AND grouped results are
    byte-identical across reruns and parallelism (the determinism story
    for order-sensitive sketches — Ray's batcher boundaries vary)."""
    import glob

    import pyarrow.parquet as pq_

    from raysketch.agg import sketch_aggregate_files
    from raysketch.sources.transcripts import write_transcripts

    root = str(tmp_path / "t")
    path = write_transcripts(30000, root=root, rows_per_file=5000)
    files = sorted(glob.glob(path + "/*.parquet"))

    def textlen(t):
        import pyarrow.compute as pc_

        return pc_.cast(pc_.utf8_length(t.column("text")), pa.int64())

    a = sketch_aggregate_files(files, "kll", on="text", column_fn=textlen, k=128)
    b = sketch_aggregate_files(files, "kll", on="text", column_fn=textlen, k=128)
    assert a == b
    # grouped: per-(file, role) partials, per-group canonical merge
    g1 = sketch_aggregate_files(files, "kll", on="text", column_fn=textlen,
                                by=["role"], mode="bytes", k=128).to_pandas()
    g2 = sketch_aggregate_files(files, "kll", on="text", column_fn=textlen,
                                by=["role"], mode="bytes", k=128).to_pandas()
    d1 = dict(zip(g1["role"], g1["kll_merged"]))
    d2 = dict(zip(g2["role"], g2["kll_merged"]))
    assert d1 == d2 and len(d1) >= 3
    # grouped estimates match a direct per-role local fold's data
    import pandas as pd

    df = pd.concat([pq_.read_table(f, columns=["role", "text"]).to_pandas() for f in files])
    from raysketch.sketches import KLL

    for role, blob in d1.items():
        sk = KLL.from_bytes(blob)
        vals = df[df["role"] == role]["text"].str.len().to_numpy()
        est = sk.quantile(0.5)
        exact = np.quantile(vals, 0.5)
        assert abs((vals <= est).mean() - 0.5) < 0.03, role


def test_actor_pool_fold_matches_aggregate(ray_session):
    """Actor-pool fold (streaming_split, one sketch held per actor)
    produces register-identical HLL state to the per-batch fold +
    groupby-aggregate path (idempotent max-merge algebra), and CMS
    totals match exactly (add-merge, every row folded exactly once)."""
    import ray.data

    from raysketch.agg import actor_pool_fold, sketch_aggregate
    from raysketch.sketches import HLL, CountMin
    from raysketch.sources.transcripts import gen_transcripts

    tbl = gen_transcripts(40000)
    ds = lambda: ray.data.from_arrow(tbl).repartition(8)
    b1 = actor_pool_fold(ds(), "hll", on="conv_id", mode="bytes", num_actors=3)
    b2 = sketch_aggregate(ds(), "hll", on="conv_id", mode="bytes")
    assert np.array_equal(HLL.from_bytes(b1).regs, HLL.from_bytes(b2).regs)
    c1 = actor_pool_fold(ds(), "countmin", on="tool", mode="bytes",
                         num_actors=3, width=1 << 12, depth=4)
    cm = CountMin.from_bytes(c1)
    assert cm.total == 40000
    c2 = CountMin.from_bytes(
        sketch_aggregate(ds(), "countmin", on="tool", mode="bytes",
                         width=1 << 12, depth=4))
    assert np.array_equal(cm.table, c2.table)


def test_canonical_reduce_cells_path(ray_session):
    """The content-addressed cells path (taken when the partial count
    exceeds driver_merge_max) is deterministic across reruns and, for
    idempotent HLL, register-identical to the driver-sort path."""
    import ray.data

    from raysketch.agg import canonical_sketch_reduce, fold_partials
    from raysketch.sketches import HLL
    from raysketch.sources.transcripts import gen_transcripts

    tbl = gen_transcripts(40000)
    parts = fold_partials(ray.data.from_arrow(tbl).repartition(8),
                          "hll", "conv_id", None, None, 2048).materialize()
    assert parts.count() > 10  # many partials
    cells1 = canonical_sketch_reduce(parts, "hll", mode="bytes",
                                     driver_merge_max=0)
    cells2 = canonical_sketch_reduce(parts, "hll", mode="bytes",
                                     driver_merge_max=0)
    driver = canonical_sketch_reduce(parts, "hll", mode="bytes")
    assert cells1 == cells2  # deterministic
    assert np.array_equal(HLL.from_bytes(cells1).regs, HLL.from_bytes(driver).regs)

    # order-sensitive KLL: each path is deterministic with itself
    pk = fold_partials(ray.data.from_arrow(tbl).repartition(8),
                       "kll", "turn_idx", None, None, 2048, k=128).materialize()
    k1 = canonical_sketch_reduce(pk, "kll", mode="bytes", driver_merge_max=0)
    k2 = canonical_sketch_reduce(pk, "kll", mode="bytes", driver_merge_max=0)
    assert k1 == k2


def test_worker_death_retry_preserves_results(ray_session, tmp_path):
    """Fault tolerance at the Ray layer: a worker process dying
    mid-batch (os._exit — a system failure, not an app exception) is
    retried transparently, the aggregate over the re-executed task is
    exact, AND the HLL fold is bit-identical to an undisturbed run —
    per-file partials + canonical reduce make re-execution invisible
    (the at-least-once story the 100-TB checkpoint layer relies on)."""
    import os

    import pyarrow as pa
    import ray.data

    from raysketch.agg import sketch_aggregate

    marker = str(tmp_path / "died_once")

    def flaky(t: pa.Table) -> pa.Table:
        if not os.path.exists(marker):
            open(marker, "w").write("x")
            os._exit(1)
        return t

    path = "/root/testdata/sf0.001/lineitem.parquet"
    ds = ray.data.read_parquet(path, columns=["l_quantity", "l_orderkey"])
    total = ds.map_batches(flaky, batch_format="pyarrow").sum("l_quantity")
    import duckdb

    exact = duckdb.sql(
        f"SELECT SUM(l_quantity) FROM '{path}'").fetchone()[0]
    assert abs(total - exact) < 1e-9
    assert os.path.exists(marker)          # the death actually happened

    # sketch fold twin: estimate bit-identical with and without a death
    marker2 = str(tmp_path / "died_twice")

    def flaky2(t: pa.Table) -> pa.Table:
        if not os.path.exists(marker2):
            open(marker2, "w").write("x")
            os._exit(1)
        return t

    base = ray.data.read_parquet(path, columns=["l_orderkey"])
    est_clean = sketch_aggregate(base, "hll", on="l_orderkey",
                                 mode="estimate")
    est_flaky = sketch_aggregate(
        base.map_batches(flaky2, batch_format="pyarrow"), "hll",
        on="l_orderkey", mode="estimate")
    assert os.path.exists(marker2)
    assert est_clean == est_flaky
