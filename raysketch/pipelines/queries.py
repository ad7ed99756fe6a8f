"""Query suite: every pipeline exposed through __ray_entry__.queries().

Two families:

1. **Exact, SQL-checkable** — run over the driver's TPC-H-ish parquet
   tables and verified value-for-value against DuckDB oracles
   (CORRECTNESS_r{N}.json). Monetary aggregates are computed in integer
   cents (both sides) so float summation order can never break the
   value-hash compare.
2. **Sketch / approximate** — the north-rule queries over the synthetic
   transcript table (rows-only driver checks; pytest enforces each
   algorithm's published error bound instead — tests/test_queries.py).

Ray is initialised by the caller (driver / bench / tests) — nothing
here calls ray.init().
"""

from __future__ import annotations

import glob
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..agg import multi_sketch_aggregate, sketch_aggregate
from ..sketches import HLL, BloomFilter, CountMin
from ..sources.transcripts import write_transcripts
from ..util import auto_concurrency

# sf dir name → transcript turns (deterministic, cached under /tmp)
_TURNS_PER_SF = 20_000_000  # sf0.001 → 20k turns, sf0.01 → 200k, sf0.1 → 2M


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    return float(m.group(1)) if m else 0.001


def transcripts_ds(sf_dir: str, columns=None):
    """The transcript table at a size matching the sf tier (generated
    once, cached as partitioned parquet under /tmp)."""
    import ray.data

    n_turns = max(1000, int(sf_of(sf_dir) * _TURNS_PER_SF))
    path = write_transcripts(n_turns)
    return ray.data.read_parquet(path, columns=columns)


def _one_row(**cols) -> pd.DataFrame:
    return pd.DataFrame([cols])


def _cents(col) -> pa.Array:
    """Exact 2-decimal money → int64 cents."""
    return pc.cast(pc.round(pc.multiply(col, 100.0)), pa.int64())


# ====================================================================
# 1. Exact, SQL-checkable queries
# ====================================================================

def exact_distinct_orders(sf_dir: str, num_buckets: int = 512) -> pd.DataFrame:
    """Exact COUNT(DISTINCT l_orderkey): per-batch dedup inside
    map_batches (shrinks the shuffle), then a shuffle on a small bucket
    key (``key % num_buckets``) with a vectorized per-bucket nunique —
    2.6× faster at sf0.1 than a full groupby-per-key whose aggregate
    materializes one output row per distinct key (and 5× faster than
    HASH_SHUFFLE on this many-key shape). Size num_buckets so one
    bucket's distinct keys fit a worker (at 1e9 distinct keys, 512
    buckets → ~2M int64 per task)."""
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey"])

    def shrink(t: pa.Table) -> pa.Table:
        u = pc.unique(t.column("l_orderkey"))
        b = (u.to_numpy(zero_copy_only=False).astype(np.uint64)
             % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({"l_orderkey": u, "b": pa.array(b)})

    def cnt(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [g["l_orderkey"].nunique()]})

    parts = ds.map_batches(shrink, batch_format="pyarrow") \
        .groupby("b").map_groups(cnt, batch_format="pandas")
    return _one_row(n_distinct=int(parts.to_pandas()["n"].sum()))


def hll_distinct_nation(sf_dir: str) -> pd.DataFrame:
    """HLL estimate of distinct n_name — exact at this cardinality
    (LinearCounting regime), so it gets a real SQL oracle: sketch-vs-
    reference parity is checked by the driver itself."""
    ds = _read(sf_dir, "nation", columns=["n_name"])
    est = sketch_aggregate(ds, "hll", on="n_name", mode="estimate")
    return _one_row(n_distinct=est)


def hll_distinct_event_type(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", columns=["event_type"])
    est = sketch_aggregate(ds, "hll", on="event_type", mode="estimate")
    return _one_row(n_distinct=est)


def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1 shape in exact integer arithmetic (cents / basis points).

    Combiner pattern: each batch pre-aggregates to ≤ 6 partial rows with
    Arrow's C++ hash grouper, so the all-to-all exchange moves a handful
    of int64 partials per batch instead of every lineitem row — the
    shape that survives 100 TB (integer sums re-associate exactly)."""
    ds = _read(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax", "l_shipdate"],
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t.column("l_shipdate"), pa.scalar(pd.Timestamp("2002-09-02"))))
        price_c = _cents(t.column("l_extendedprice"))
        disc_b = _cents(t.column("l_discount"))  # basis: discount*100 (2-dec → int)
        tax_b = _cents(t.column("l_tax"))
        disc_price = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_b))
        charge = pc.multiply(disc_price, pc.add(pa.scalar(100, pa.int64()), tax_b))
        rows = pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "qty": pc.cast(t.column("l_quantity"), pa.int64()),
            "base_cents": price_c,
            "disc_price_e4": disc_price,
            "charge_e6": charge,
        })
        part = rows.group_by(["l_returnflag", "l_linestatus"]).aggregate([
            ("qty", "sum"), ("base_cents", "sum"),
            ("disc_price_e4", "sum"), ("charge_e6", "sum"), ("qty", "count"),
        ])
        return part

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_sum", alias_name="sum_qty"),
            Sum("base_cents_sum", alias_name="sum_base_cents"),
            Sum("disc_price_e4_sum", alias_name="sum_disc_price_e4"),
            Sum("charge_e6_sum", alias_name="sum_charge_e6"),
            Sum("qty_count", alias_name="count_order"),
        )
    )
    return out.to_pandas()


def props_k_stats(sf_dir: str) -> pd.DataFrame:
    """JSON field extraction, vectorized: pull ``k`` out of the events
    ``props`` JSON string with one RE2 ``extract_regex`` kernel (no
    per-row json.loads), then an exact grouped sum/count — the string-
    processing operator family, SQL-checked against DuckDB's
    json_extract."""
    ds = _read(sf_dir, "events", columns=["event_type", "props"])

    def prep(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t.column("props"), r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        return pa.table({"event_type": t.column("event_type"), "k": k})

    from ray.data.aggregate import Count, Sum

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("k", alias_name="sum_k"), Count(alias_name="n"))
    )
    df = out.to_pandas()
    df["sum_k"] = df["sum_k"].astype("int64")
    return df.sort_values("event_type").reset_index(drop=True)


def suppliers_per_region(sf_dir: str) -> pd.DataFrame:
    """Three-table join region ⋈ nation ⋈ supplier as chained broadcast
    lookups (both dimension sides are tiny — no shuffle)."""
    import ray

    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", columns=["r_regionkey", "r_name"]).to_pandas()
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    rname = dict(zip(region["r_regionkey"], region["r_name"]))
    nk = np.array(sorted(n2r), dtype=np.int64)
    rk = np.array([n2r[k] for k in nk], dtype=np.int64)
    lookup_ref = ray.put((nk, rk, rname))

    class RegionOf:
        def __init__(self):
            self.nk, self.rk, self.rname = ray.get(lookup_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            s = t.column("s_nationkey").to_numpy(zero_copy_only=False)
            if not len(self.nk):  # empty dimension table: inner join is empty
                return pa.table({"r_name": pa.array([], type=pa.string())})
            pos = np.minimum(np.searchsorted(self.nk, s), len(self.nk) - 1)
            hit = self.nk[pos] == s  # inner-join semantics: drop unmatched
            names = [self.rname[int(r)] for r in self.rk[pos[hit]]]
            return pa.table({"r_name": pa.array(names, type=pa.string())})

    from ray.data.aggregate import Count

    out = (
        _read(sf_dir, "supplier", columns=["s_nationkey"])
        .map_batches(RegionOf, batch_format="pyarrow",
                     concurrency=auto_concurrency())
        .groupby("r_name")
        .aggregate(Count(alias_name="n_suppliers"))
    )
    return out.to_pandas().sort_values("r_name").reset_index(drop=True)


def topk_event_types(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", columns=["event_type"])
    out = ds.groupby("event_type").count().rename_columns({"count()": "n"})
    df = out.to_pandas().sort_values(["n", "event_type"], ascending=[False, True]).head(5)
    return df.reset_index(drop=True)


def events_hourly(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64())
        hour = pc.multiply(pc.divide(us, 3_600_000_000), 3_600_000_000)
        return pa.table({
            "hour": pc.cast(hour, pa.timestamp("us")),
            "event_type": t.column("event_type"),
            "value_cents": _cents(t.column("value")),
        })

    from ray.data.aggregate import Count, Sum

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["hour", "event_type"])
        .aggregate(Sum("value_cents", alias_name="sum_value_cents"),
                   Count(alias_name="n"))
    )
    return out.to_pandas()


def dedup_docs_exact(sf_dir: str) -> pd.DataFrame:
    """Exact dedup keeping the smallest doc_id per identical text.
    Scale path: group on a 64-bit content hash (computed vectorized per
    batch) so the shuffle carries 8-byte keys, never document bodies."""
    from ..stages.dedup import exact_dedup_keep_ids

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = exact_dedup_keep_ids(ds)  # bucketed lexsort/reduceat min —
    # Ray's per-group aggregate costs ~40 µs/group; groups scale with
    # corpus size here (see stages/dedup.py)
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def mktsegment_revenue(sf_dir: str) -> pd.DataFrame:
    """Orders⋈customer revenue per market segment — broadcast hash join
    (dimension side ray.put once, looked up per batch; no shuffle)."""
    import ray

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).to_pandas()
    order_k = np.argsort(cust["c_custkey"].to_numpy())
    lookup_ref = ray.put((cust["c_custkey"].to_numpy()[order_k],
                          cust["c_mktsegment"].to_numpy()[order_k]))

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    class JoinSegment:
        def __init__(self):
            # sorted key/value arrays: vectorized searchsorted lookup per
            # batch instead of a per-row Python dict .map
            self.keys, self.vals = ray.get(lookup_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t.column("o_custkey").to_numpy()
            if not len(self.keys):  # empty dimension table: all unmatched
                seg = np.full(len(keys), None, dtype=object)
                return pa.table({
                    "c_mktsegment": pa.array(seg, type=pa.string()),
                    "price_cents": _cents(t.column("o_totalprice")),
                })
            pos = np.searchsorted(self.keys, keys)
            pos = np.minimum(pos, len(self.keys) - 1)
            seg = self.vals[pos]
            seg = np.where(self.keys[pos] == keys, seg, None)
            return pa.table({
                "c_mktsegment": pa.array(seg, type=pa.string()),
                "price_cents": _cents(t.column("o_totalprice")),
            })

    from ray.data.aggregate import Count, Sum

    out = (
        ds.map_batches(JoinSegment, batch_format="pyarrow",
                       concurrency=auto_concurrency())
        .groupby("c_mktsegment")
        .aggregate(Sum("price_cents", alias_name="revenue_cents"),
                   Count(alias_name="n_orders"))
    )
    return out.to_pandas()


def customers_without_orders(sf_dir: str,
                             broadcast_threshold: int = 50_000_000) -> pd.DataFrame:
    """Anti join via broadcast key set (semi/anti joins never shuffle
    when one side's key set fits the object store). Past
    ``broadcast_threshold`` orders rows (parquet metadata count — free)
    the key set may not fit the driver, so the query switches to the
    shuffle-based ``bucket_anti_join`` automatically."""
    import ray

    orders = _read(sf_dir, "orders", columns=["o_custkey"])
    if orders.count() > broadcast_threshold:
        from ..stages.joins import bucket_anti_join

        right = orders.map_batches(
            lambda t: pa.table({"c_custkey": t.column("o_custkey")}),
            batch_format="pyarrow",
        )
        df = bucket_anti_join(
            _read(sf_dir, "customer", columns=["c_custkey"]), right, on="c_custkey"
        ).to_pandas()
        if df.empty:
            df = pd.DataFrame({"c_custkey": pd.Series([], dtype="int64")})
        return df.sort_values("c_custkey").reset_index(drop=True)

    # build the semi-join key set distributed: per-batch unique shrinks
    # each block to its distinct keys; only the deduped set reaches the
    # driver
    okeys = (
        _read(sf_dir, "orders", columns=["o_custkey"])
        .map_batches(lambda t: pa.table({"o_custkey": pc.unique(t.column("o_custkey"))}),
                     batch_format="pyarrow")
        .to_pandas()["o_custkey"].unique()
    )
    keys_ref = ray.put(np.sort(okeys.astype(np.int64)))

    ds = _read(sf_dir, "customer", columns=["c_custkey"])

    class AntiJoin:
        def __init__(self):
            self.keys = ray.get(keys_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ck = t.column("c_custkey").to_numpy()
            pos = np.searchsorted(self.keys, ck)
            pos = np.minimum(pos, len(self.keys) - 1)
            absent = self.keys[pos] != ck if len(self.keys) else np.ones(len(ck), bool)
            return pa.table({"c_custkey": pa.array(ck[absent])})

    out = ds.map_batches(AntiJoin, batch_format="pyarrow",
                         concurrency=auto_concurrency())
    df = out.to_pandas()
    if df.empty:
        df = pd.DataFrame({"c_custkey": pd.Series([], dtype="int64")})
    return df.sort_values("c_custkey").reset_index(drop=True)


def knn_cosine_top10(sf_dir: str) -> pd.DataFrame:
    """Brute-force cosine top-k against a fixed query vector (all-ones):
    per-batch float64 matmul, then a global top-k of the tiny per-batch
    candidate sets. The scale path for real ANN is stages/similarity.py."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    from ..stages.similarity import _batch_matrix

    def score(t: pa.Table) -> pa.Table:
        emb = _batch_matrix(t, "embedding")
        q = np.ones(emb.shape[1])
        cos = (emb @ q) / (np.linalg.norm(emb, axis=1) * np.linalg.norm(q) + 1e-300)
        order = np.argsort(-cos)[:10]  # per-batch candidates only
        return pa.table({
            "vec_id": pc.take(t.column("vec_id"), pa.array(order)),
            "cos": pa.array(cos[order]),
        })

    cand = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    top = cand.sort_values(["cos", "vec_id"], ascending=[False, True]).head(10)
    top = top.reset_index(drop=True)
    return pd.DataFrame({"rank": np.arange(1, len(top) + 1), "vec_id": top["vec_id"]})


def doc_token_stats(sf_dir: str) -> pd.DataFrame:
    """Per-document exact text stats, all SQL-replicable definitions."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        txt = t.column("text")
        n_chars = pc.utf8_length(txt)
        n_spaces = pc.subtract(
            pc.binary_length(txt),
            pc.binary_length(pc.replace_substring(txt, pattern=" ", replacement=""))
        )
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_chars": pc.cast(n_chars, pa.int64()),
            "n_spaces": pc.cast(n_spaces, pa.int64()),
            "n_tokens_ws": pc.cast(pc.add(n_spaces, 1), pa.int64()),
        })

    return ds.map_batches(stats, batch_format="pyarrow").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)


def orders_priority_stats(sf_dir: str) -> pd.DataFrame:
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])
    out = (
        ds.map_batches(
            lambda t: pa.table({"o_orderpriority": t.column("o_orderpriority"),
                                "price_cents": _cents(t.column("o_totalprice"))}),
            batch_format="pyarrow",
        )
        .groupby("o_orderpriority")
        .aggregate(Sum("price_cents", alias_name="sum_price_cents"),
                   Count(alias_name="n"))
    )
    return out.to_pandas()


# ====================================================================
# 2. Sketch queries over the transcript table (north rule §2.6)
# ====================================================================

def hll_distinct_conv(sf_dir: str) -> pd.DataFrame:
    ds = transcripts_ds(sf_dir, columns=["conv_id"])
    est = sketch_aggregate(ds, "hll", on="conv_id", mode="estimate")
    return _one_row(distinct_convs_est=est)


def hll_distinct_conv_by_role(sf_dir: str) -> pd.DataFrame:
    """Role domain is tiny (4 values), so the grouped merge runs as ONE
    global tree reduction over a {role: state} dict accumulator
    (by_mode="global") instead of a sort-shuffle stage over a handful
    of partial rows — same result by merge associativity, without the
    tiny-groupby fixed cost (+0.3 s and scheduling spikes at sf0.1;
    VERDICT r02 item 7)."""
    ds = transcripts_ds(sf_dir, columns=["conv_id", "role"])
    out = sketch_aggregate(ds, "hll", on="conv_id", by="role",
                           mode="estimate", alias_name="distinct_convs_est",
                           by_mode="global")
    return out.sort_values("role").reset_index(drop=True)


def hll_distinct_role_tool_pairs(sf_dir: str) -> pd.DataFrame:
    ds = transcripts_ds(sf_dir, columns=["role", "tool"])
    est = sketch_aggregate(ds, "hll", on=["role", "tool"], mode="estimate")
    return _one_row(distinct_pairs_est=est)


def cms_tool_top10(sf_dir: str) -> pd.DataFrame:
    """Heavy-hitter tools: ONE pass folds both the Count-Min state and
    the exact candidate vocabulary (ExactSet, capped collect_set) —
    the input is read and decoded once (VERDICT r01 item 6; previously
    a second vocabulary pass re-read the table)."""
    ds = transcripts_ds(sf_dir, columns=["tool"])
    def vocab_or_raise(sk):
        # never let the cap silently hide heavy hitters: a truncated
        # vocabulary would drop any tool sorting above the cap
        if sk.truncated:
            raise RuntimeError(
                "tool vocabulary exceeded ExactSet max_items — raise the "
                "cap or switch candidate discovery to a bottom-k sample"
            )
        return sk.values_str()

    out = multi_sketch_aggregate(ds, {
        "cm": {"sketch": "countmin", "on": "tool", "mode": "bytes",
               "width": 1 << 15, "depth": 5},
        "vocab": {"sketch": "set", "on": "tool",
                  "mode": vocab_or_raise, "max_items": 1 << 20},
    })
    cm = CountMin.from_bytes(out["cm"])
    cand = sorted(c for c in out["vocab"] if c)  # drop non-tool ""
    ests = cm.estimate_batch(cand)
    df = pd.DataFrame({"tool": cand, "est_count": ests})
    return df.sort_values(["est_count", "tool"], ascending=[False, True]) \
        .head(10).reset_index(drop=True)


def _text_len_ds(sf_dir: str):
    ds = transcripts_ds(sf_dir, columns=["text"])
    return ds.map_batches(
        lambda t: pa.table({"text_len": pc.cast(pc.utf8_length(t.column("text")), pa.int64())}),
        batch_format="pyarrow",
    )


def _text_len_quantiles(sf_dir: str, sketch: str, **params) -> pd.DataFrame:
    """Order-sensitive quantile sketches need deterministic partials:
    Ray's dynamic batcher draws batch boundaries differently run to run,
    so these fold ONE partial per transcript file + canonical reduce —
    byte-identical reruns at any parallelism (VERDICT r01 item 9)."""
    import glob

    from ..agg import sketch_aggregate_files

    n_turns = max(1000, int(sf_of(sf_dir) * _TURNS_PER_SF))
    tpath = write_transcripts(n_turns)
    files = sorted(glob.glob(os.path.join(tpath, "*.parquet")))
    est = sketch_aggregate_files(
        files, sketch, on="text",
        column_fn=lambda t: pc.cast(pc.utf8_length(t.column("text")), pa.int64()),
        mode="estimate", **params,
    )
    return _one_row(**est)


def kll_text_len_by_role(sf_dir: str) -> pd.DataFrame:
    """GROUPED order-statistics sketching — per-ROLE text-length
    quantiles via KLL, the grouped cell of the sketch×grouping matrix
    (HLL has its by-role twin; quantile sketches did not). One partial
    per (file, role), lexicographic per-group blob merges
    (`sketch_aggregate_files(by=...)`) keep grouped results
    byte-identical at any parallelism despite KLL's order-sensitive
    compaction. Rows-only driver entry; pytest holds a per-role rank
    band vs exact and equality of the 'user' role with a direct
    single-group fold."""
    import glob

    from ..agg import sketch_aggregate_files

    n_turns = max(1000, int(sf_of(sf_dir) * _TURNS_PER_SF))
    tpath = write_transcripts(n_turns)
    files = sorted(glob.glob(os.path.join(tpath, "*.parquet")))
    out = sketch_aggregate_files(
        files, "kll", on="text", by=["role"],
        column_fn=lambda t: pc.cast(pc.utf8_length(t.column("text")),
                                    pa.int64()),
        mode=lambda acc: acc.finalize(), k=256,
    ).to_pandas()
    q = pd.DataFrame(list(out["kll_merged"]))
    res = pd.concat([out[["role"]].reset_index(drop=True),
                     q.reset_index(drop=True)], axis=1)
    return res.astype({"n": "int64"}) \
        .sort_values("role").reset_index(drop=True)


def ddsketch_text_len(sf_dir: str) -> pd.DataFrame:
    """Relative-error quantile sketching (DDSketch, VLDB'19) — the
    third quantile family beside KLL/t-digest, with a VALUE-relative
    guarantee (est within α=1% of the true quantile value) instead of
    a rank bound. Its merge is a commutative bucket-count SUM over
    exact-integer boundaries (sketches/ddsketch.py), so unlike the
    other two this entry folds straight through Ray's nondeterministic
    dynamic batcher (plain sketch_aggregate, no per-file-fold crutch)
    and is STILL byte-deterministic at any parallelism — pytest locks
    partition-count invariance, the sweep locks rerun equality."""
    ds = _text_len_ds(sf_dir)
    est = sketch_aggregate(ds, "ddsketch", on="text_len",
                           mode="estimate")
    return _one_row(**est)


def req_text_len_tails(sf_dir: str) -> pd.DataFrame:
    """EXTREME-tail text-length quantiles (p99 / p99.9 / p99.99) via
    the REQ relative-rank-error sketch (PODS'21, sketches/req.py) —
    the question additive-error families cannot answer: at n=10⁶ KLL's
    ε·n rank smear covers the entire top 10⁴ items, measured 17.8×
    the tail size at p99.99 where REQ stays under 0.05×. Same
    deterministic distributed shape as the other order-sensitive
    quantile families: one partial per transcript file + canonical
    reduce (byte-identical reruns at any parallelism)."""
    return _text_len_quantiles(sf_dir, "req", k=128)


def lm_score_turns_by_role(sf_dir: str) -> pd.DataFrame:
    """LM quality scoring at the engine's ACTUAL data scale — the
    transcript table (2M turns at sf0.1; the documents table is a
    fixed 500 rows at every sf): train the char-bigram LM over all
    turn text in one zero-shuffle 65536-bincount pass, score every
    turn vectorized against the broadcast counts, reduce per ROLE to
    exact integers (turns, byte pairs, fixed-point score sum) with a
    ≤4-row-per-batch combiner. Rows-only driver entry (the transcript
    table is not a registered oracle view); an in-pytest DuckDB oracle
    over the generated parquet locks exact equality at sf0.001
    (test_lm_score_turns_by_role_oracle)."""
    import ray

    from ..stages.lm import CharBigramLMScore, train_char_bigram_counts

    ds = transcripts_ds(sf_dir, columns=["role", "text"])
    ref = ray.put(train_char_bigram_counts(ds))
    holder: list = []

    def part(t: pa.Table) -> pd.DataFrame:
        if not holder:
            holder.append(CharBigramLMScore(ref, text_col="text",
                                            id_col="role"))
        sc = holder[0](t).to_pandas()
        sc["n_turns"] = 1
        return sc.groupby("role", as_index=False)[
            ["n_turns", "n_pairs", "lm_score_fp"]].sum()

    out = ds.map_batches(part, batch_format="pyarrow").to_pandas() \
        .groupby("role", as_index=False)[
            ["n_turns", "n_pairs", "lm_score_fp"]].sum()
    return out.sort_values("role").reset_index(drop=True) \
        .astype({"role": "str", "n_turns": "int64",
                 "n_pairs": "int64", "lm_score_fp": "int64"})


def req_text_len_tails_by_role(sf_dir: str) -> pd.DataFrame:
    """Grouped cell of the REQ family: per-role extreme-tail quantiles,
    one partial per (file, role) + lexicographic per-group blob merges
    (the KLL/t-digest grouped-determinism discipline — REQ compaction
    is order-sensitive too)."""
    import glob

    from ..agg import sketch_aggregate_files

    n_turns = max(1000, int(sf_of(sf_dir) * _TURNS_PER_SF))
    tpath = write_transcripts(n_turns)
    files = sorted(glob.glob(os.path.join(tpath, "*.parquet")))
    out = sketch_aggregate_files(
        files, "req", on="text", by=["role"],
        column_fn=lambda t: pc.cast(pc.utf8_length(t.column("text")),
                                    pa.int64()),
        mode=lambda acc: acc.finalize(), k=128,
    ).to_pandas()
    q = pd.DataFrame(list(out["req_merged"]))
    res = pd.concat([out[["role"]].reset_index(drop=True),
                     q.reset_index(drop=True)], axis=1)
    return res.astype({"n": "int64"}) \
        .sort_values("role").reset_index(drop=True)


def ddsketch_text_len_by_role(sf_dir: str) -> pd.DataFrame:
    """Grouped cell of the third quantile family: per-role text-length
    quantiles via DDSketch. Unlike the KLL/t-digest grouped twins this
    needs NO per-(file,role) fold — commutative bucket-sum merges make
    the plain grouped dynamic-batch fold byte-deterministic; the role
    domain is tiny so the merge is the one-global-tree-reduce path
    (by_mode="global", the by-role HLL precedent)."""
    ds = transcripts_ds(sf_dir, columns=["text", "role"])
    ds = ds.map_batches(
        lambda t: pa.table({
            "role": t.column("role"),
            "text_len": pc.cast(pc.utf8_length(t.column("text")),
                                pa.int64())}),
        batch_format="pyarrow")
    out = sketch_aggregate(ds, "ddsketch", on="text_len", by="role",
                           mode="estimate", by_mode="global")
    q = pd.DataFrame(list(out["ddsketch_merged"]))
    res = pd.concat([out[["role"]].reset_index(drop=True),
                     q.reset_index(drop=True)], axis=1)
    return res.astype({"n": "int64"}) \
        .sort_values("role").reset_index(drop=True)


def tdigest_text_len(sf_dir: str) -> pd.DataFrame:
    return _text_len_quantiles(sf_dir, "tdigest", compression=200)


def tdigest_text_len_by_role(sf_dir: str) -> pd.DataFrame:
    """t-digest twin of :func:`kll_text_len_by_role` — same
    per-(file, role) partials + lexicographic per-group merges, so the
    OTHER order-sensitive quantile family is grouped-deterministic
    too."""
    import glob

    from ..agg import sketch_aggregate_files

    n_turns = max(1000, int(sf_of(sf_dir) * _TURNS_PER_SF))
    tpath = write_transcripts(n_turns)
    files = sorted(glob.glob(os.path.join(tpath, "*.parquet")))
    out = sketch_aggregate_files(
        files, "tdigest", on="text", by=["role"],
        column_fn=lambda t: pc.cast(pc.utf8_length(t.column("text")),
                                    pa.int64()),
        mode=lambda acc: acc.finalize(), compression=200,
    ).to_pandas()
    q = pd.DataFrame(list(out["tdigest_merged"]))
    res = pd.concat([out[["role"]].reset_index(drop=True),
                     q.reset_index(drop=True)], axis=1)
    return res.astype({"n": "int64"}) \
        .sort_values("role").reset_index(drop=True)


def kll_text_len(sf_dir: str) -> pd.DataFrame:
    return _text_len_quantiles(sf_dir, "kll", k=256)


def distinct_users_per_window(sf_dir: str) -> pd.DataFrame:
    """Windowed GROUPED mergeable-state aggregation with a full SQL
    oracle: distinct users per tumbling 15-minute window via a
    per-window ExactSet merge (exact by construction, so the driver
    value-hash check applies to a grouped sketch-layer query, not just
    global ones). A per-window HLL was tried first: with thousands of
    windows, LinearCounting's ~n²/2m per-window register-collision
    probability guarantees a few off-by-one windows somewhere (measured
    at sf0.1) — an exact-equality oracle over MANY small groups needs
    an exact state."""
    ds = _read(sf_dir, "events", columns=["ts", "user_id"])

    def prep(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64())
        win = pc.multiply(pc.divide(us, 900_000_000), 900_000_000)
        return pa.table({
            "window_start": pc.cast(win, pa.timestamp("us")),
            "user_id": t.column("user_id"),
        })

    def exact_or_raise(sk):
        fin = sk.finalize()
        if fin["truncated"]:  # the exact-by-construction claim must hold
            raise RuntimeError("window cardinality exceeded ExactSet cap")
        return fin["n_distinct"]

    out = sketch_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        "set", on="user_id", by="window_start",
        mode=exact_or_raise,
        alias_name="distinct_users", max_items=1 << 16,
    )
    df = out.to_pandas()
    df["distinct_users"] = df["distinct_users"].astype("int64")
    return df.sort_values("window_start").reset_index(drop=True)


def distinct_event_types_set(sf_dir: str) -> pd.DataFrame:
    """ExactSet (capped collect_set UDAF) as an oracle-checked query:
    the exact distinct event_type vocabulary, one row per value —
    SQL-equivalent to SELECT DISTINCT ... ORDER BY."""
    ds = _read(sf_dir, "events", columns=["event_type"])
    blob = sketch_aggregate(ds, "set", on="event_type", mode="bytes",
                            max_items=1 << 16)
    from ..sketches import ExactSet

    s = ExactSet.from_bytes(blob)
    assert not s.truncated  # vocabulary fits the cap at every test sf
    return pd.DataFrame({"event_type": s.values_str()})


def bloom_conv_membership(sf_dir: str) -> pd.DataFrame:
    ds = transcripts_ds(sf_dir, columns=["conv_id"])
    blob = sketch_aggregate(ds, "bloom", on="conv_id", mode="bytes",
                            capacity=1 << 20, fp_rate=0.01)
    bf = BloomFilter.from_bytes(blob)
    present = [f"conv-{i:08d}" for i in range(50)]
    absent = [f"never-{i}" for i in range(10000)]
    return _one_row(
        present_hits=int(bf.contains_batch(present).sum()),
        absent_hits=int(bf.contains_batch(absent).sum()),
        bits_set=bf.finalize()["bits_set"],
    )


# ====================================================================
# Registry + DuckDB oracles
# ====================================================================

QUERIES = {
    # exact, SQL-checked
    "exact_distinct_orders": exact_distinct_orders,
    "hll_distinct_nation": hll_distinct_nation,
    "hll_distinct_event_type": hll_distinct_event_type,
    "q1_pricing_summary": q1_pricing_summary,
    "topk_event_types": topk_event_types,
    "events_hourly": events_hourly,
    "dedup_docs_exact": dedup_docs_exact,
    "mktsegment_revenue": mktsegment_revenue,
    "customers_without_orders": customers_without_orders,
    "knn_cosine_top10": knn_cosine_top10,
    "doc_token_stats": doc_token_stats,
    "orders_priority_stats": orders_priority_stats,
    "distinct_event_types_set": distinct_event_types_set,
    "distinct_users_per_window": distinct_users_per_window,
    "props_k_stats": props_k_stats,
    "suppliers_per_region": suppliers_per_region,
    # sketch / approximate (rows-only driver checks; pytest owns bounds)
    "hll_distinct_conv": hll_distinct_conv,
    "hll_distinct_conv_by_role": hll_distinct_conv_by_role,
    "hll_distinct_role_tool_pairs": hll_distinct_role_tool_pairs,
    "cms_tool_top10": cms_tool_top10,
    "tdigest_text_len": tdigest_text_len,
    "kll_text_len": kll_text_len,
    "ddsketch_text_len": ddsketch_text_len,
    "req_text_len_tails": req_text_len_tails,
    "bloom_conv_membership": bloom_conv_membership,
}

_KNN_Q = "[" + ", ".join(["1.0"] * 64) + "]"

ORACLES = {
    "exact_distinct_orders":
        "SELECT COUNT(DISTINCT l_orderkey) AS n_distinct FROM lineitem",
    "hll_distinct_nation":
        "SELECT COUNT(DISTINCT n_name) AS n_distinct FROM nation",
    "hll_distinct_event_type":
        "SELECT COUNT(DISTINCT event_type) AS n_distinct FROM events",
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
               CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                   * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_disc_price_e4,
               CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                   * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
                   * (100 + CAST(ROUND(l_tax*100) AS BIGINT))) AS BIGINT) AS sum_charge_e6,
               COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= DATE '2002-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "topk_event_types": """
        SELECT event_type, COUNT(*) AS n FROM events
        GROUP BY event_type ORDER BY n DESC, event_type ASC LIMIT 5
    """,
    "events_hourly": """
        SELECT date_trunc('hour', ts) AS hour, event_type,
               CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    """,
    "dedup_docs_exact":
        "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text",
    "mktsegment_revenue": """
        SELECT c_mktsegment,
               CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
               COUNT(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "customers_without_orders": """
        SELECT c_custkey FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        ORDER BY c_custkey
    """,
    "knn_cosine_top10": f"""
        SELECT CAST(ROW_NUMBER() OVER (
                 ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), {_KNN_Q}) DESC,
                          vec_id ASC) AS BIGINT) AS rank,
               vec_id
        FROM embeddings
        ORDER BY rank LIMIT 10
    """,
    "doc_token_stats": """
        SELECT doc_id,
               LENGTH(text) AS n_chars,
               LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS n_spaces,
               LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS n_tokens_ws
        FROM documents ORDER BY doc_id
    """,
    "distinct_event_types_set": """
        SELECT DISTINCT event_type FROM events ORDER BY event_type
    """,
    "props_k_stats": """
        SELECT event_type,
               CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               COUNT(*) AS n
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "suppliers_per_region": """
        SELECT r_name, COUNT(*) AS n_suppliers
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
    """,
    "distinct_users_per_window": """
        SELECT CAST(to_timestamp(floor(epoch(ts)/900)*900) AS TIMESTAMP) AS window_start,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "orders_priority_stats": """
        SELECT o_orderpriority,
               CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
               COUNT(*) AS n
        FROM orders GROUP BY o_orderpriority
    """,
}


# ====================================================================
# 3. Stage pipelines as queries (dedup / similarity / text analysis /
#    sessionization)
# ====================================================================

def sessionize_events(sf_dir: str) -> pd.DataFrame:
    """Session windows per user (gap > 30 min ⇒ new session): the
    stream-shaped operator — partition by user-hash BUCKET (user count
    scales with data, and Ray pays a per-GROUP call cost), then fully
    vectorized inside each bucket: one sort by (user, ts), session
    starts = new-user OR gap>30min boolean, per-user counts via a
    pandas C groupby-sum."""
    from ..stages.dedup import _splitmix64 as _mix64

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def add_bucket(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (_mix64(u) % np.uint64(64)).astype(np.int64)
        return t.append_column("__b", pa.array(b))

    def sessions_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"])
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy()
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        gap = np.r_[True, (ts[1:] - ts[:-1]) > np.timedelta64(30, "m")]
        df = pd.DataFrame({"user_id": uid,
                           "s": (new_user | gap).astype(np.int64)})
        out = df.groupby("user_id", sort=True, as_index=False)["s"].sum()
        return out.rename(columns={"s": "n_sessions"}).astype(
            {"user_id": "int64", "n_sessions": "int64"})

    out = ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__b").map_groups(sessions_bucket, batch_format="pandas")
    return out.to_pandas().sort_values("user_id").reset_index(drop=True)


def ivf_ann_top10(sf_dir: str) -> pd.DataFrame:
    """IVF ANN with nprobe = n_centroids (exhaustive ⇒ exact, so it
    shares the brute-force SQL oracle; production uses nprobe ≪
    n_centroids for the recall/latency trade)."""
    import tempfile

    from ..stages.similarity import IVFIndex

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    first = ds.take_batch(1, batch_format="pyarrow")
    dim = len(first["embedding"][0])
    idx_dir = os.path.join(
        tempfile.gettempdir(), "raysketch_data", f"ivf_{sf_of(sf_dir)}"
    )
    if os.path.exists(os.path.join(idx_dir, "centroids.npy")):
        idx = IVFIndex.load(idx_dir)
    else:
        idx = IVFIndex(idx_dir, n_centroids=8).build(ds, sample_size=256)
    out = idx.search(np.ones(dim), k=10, nprobe=idx.ncent)
    return out[["rank", "vec_id"]].reset_index(drop=True)


def pq_ann_top10(sf_dir: str) -> pd.DataFrame:
    """IVF-PQ ANN (Jégou PAMI'11 IVFADC): 8-byte product-quantized
    residual codes per vector (64× smaller than the 512-byte float64
    row at D=64 — the tier that still fits scanning at 100 TB), ADC
    lookup-table scan over nprobe coarse buckets, exact L2 rerank of
    the top-50 candidates against the source table. Rows-only entry
    (k-means codebooks are not SQL-statable); pytest locks recall vs
    brute force, build determinism, and full-rerank ≡ exact."""
    import tempfile

    from ..stages.similarity import PQIndex

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    first = ds.take_batch(1, batch_format="pyarrow")
    dim = len(first["embedding"][0])
    idx_dir = os.path.join(
        tempfile.gettempdir(), "raysketch_data", f"pq_{sf_of(sf_dir)}"
    )
    if os.path.exists(os.path.join(idx_dir, "codebooks.npz")):
        idx = PQIndex.load(idx_dir)
    else:
        idx = PQIndex(idx_dir, n_coarse=8, n_subq=8).build(
            ds, sample_size=256)
    out = idx.search(np.ones(dim), k=10, nprobe=idx.n_coarse, rerank=100,
                     source_ds=ds)
    return out[["rank", "vec_id"]].reset_index(drop=True)


def minhash_dedup_docs(sf_dir: str) -> pd.DataFrame:
    """Near-duplicate components over documents (MinHash+LSH)."""
    from ..stages.dedup import minhash_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return minhash_dedup(ds, threshold=0.8)


def weighted_minhash_dedup_docs(sf_dir: str) -> pd.DataFrame:
    """Near-duplicate components under WEIGHTED (tf-multiset) k-gram
    Jaccard — the sketch tier of the weighted family (the exact twin
    `weighted_jaccard_pairs` carries the SQL oracle for the same
    similarity). Signatures estimate Σmin(tf)/Σmax(tf) via the
    occurrence-expansion reduction, so repeated boilerplate no longer
    inflates similarity the way it does under set semantics
    (stages/dedup.py minhash_dedup(weighted=True); discrimination
    locked by test_weighted_minhash_dedup_discriminates_doubled_text).
    Rows-only; deterministic (fixed-seed OPH + exact tiers)."""
    from ..stages.dedup import minhash_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return minhash_dedup(ds, threshold=0.8, weighted=True)


def simhash_dedup_docs(sf_dir: str) -> pd.DataFrame:
    from ..stages.dedup import simhash_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_dedup(ds, max_hamming=3)


def embedding_dedup_vecs(sf_dir: str) -> pd.DataFrame:
    from ..stages.dedup import embedding_dedup

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return embedding_dedup(ds, threshold=0.95)


def ngram_jaccard_pairs(sf_dir: str) -> pd.DataFrame:
    """Exact word-3-gram (shingle) Jaccard similarity self-join over
    the documents table: every pair with Jaccard ≥ 0.8 plus the exact
    similarity. Candidates via distributed prefix filtering (provably
    complete — this is the one near-dup family with a full SQL oracle,
    since there is no LSH recall loss to forgive). Word shingles keep
    the token universe diverse, so prefix groups stay small at any
    corpus scale (char-5-grams measured degenerate on this corpus:
    2k-gram vocabulary at sf0.1 → candidate blowup)."""
    from ..stages.dedup import ngram_jaccard_join

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ngram_jaccard_join(ds, k=3, threshold=0.8, unit="word")


def centroid_by_label(sf_dir: str) -> pd.DataFrame:
    """Per-label embedding centroid (vector mean), SQL-checked: the
    combiner-pattern vector aggregate (stages/similarity.py
    vector_centroids — one partial sum-vector per (batch, label), the
    embedding table itself never shuffles). Centroids exploded to
    (label, dim, micro-units) rows and rounded to 1e-6 so both sides
    hash identically despite summation-order float noise."""
    from ..stages.similarity import vector_centroids

    ds = _read(sf_dir, "embeddings", columns=["label", "embedding"])
    cent = vector_centroids(ds, vec_col="embedding", by="label")
    rows = []
    for _, r in cent.iterrows():
        for d, v in enumerate(r["centroid"]):
            rows.append((int(r["label"]), d,
                         int(np.floor(v * 1_000_000 + 0.5)), int(r["n"])))
    out = pd.DataFrame(rows, columns=["label", "dim", "centroid_micro", "n"])
    return out.sort_values(["label", "dim"]).reset_index(drop=True)


def explode_words(sf_dir: str) -> pd.DataFrame:
    """flat_map / explode surface, SQL-checked: documents → one row per
    word with its position. Fully vectorized inside map_batches
    (Arrow split_pattern + list_flatten + repeat-encoded parents) —
    the canonical 'unnest' shape with zero per-row Python."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(
            pc.fill_null(t.column("text"), ""), " ").combine_chunks()
        counts = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words)
        parent = np.repeat(
            t.column("doc_id").to_numpy(zero_copy_only=False), counts)
        starts = np.cumsum(counts) - counts
        idx = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, counts)
        return pa.table({
            "doc_id": pa.array(parent),
            "word_idx": pa.array(idx),
            "word": flat,
        })

    out = ds.map_batches(explode, batch_format="pyarrow").to_pandas()
    return out.sort_values(["doc_id", "word_idx"]).reset_index(drop=True)


def lang_id_docs(sf_dir: str) -> pd.DataFrame:
    from ..stages.textstats import LangId

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(LangId(), batch_format="pyarrow", batch_size=256)
    return out.to_pandas()[["doc_id", "lang_pred"]].sort_values("doc_id").reset_index(drop=True)


def quality_docs(sf_dir: str) -> pd.DataFrame:
    from ..stages.textstats import QualityScore

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(QualityScore(), batch_format="pyarrow", batch_size=256)
    return out.to_pandas()[
        ["doc_id", "alpha_ratio", "stopword_ratio", "max_word_rep", "quality_keep"]
    ].sort_values("doc_id").reset_index(drop=True)


def fingerprint_docs(sf_dir: str) -> pd.DataFrame:
    from ..stages.textstats import Fingerprint

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(Fingerprint(), batch_format="pyarrow")
    return out.to_pandas()[["doc_id", "fingerprint"]].sort_values("doc_id").reset_index(drop=True)


def winnow_fingerprint_docs(sf_dir: str) -> pd.DataFrame:
    """Rolling-hash winnowing fingerprints (SIGMOD'03) per document:
    n_fingerprints + their xor digest (stable scalar summary of the
    set) — the partial-overlap detector behind plagiarism/contamination
    checks."""
    from ..stages.textstats import WinnowingFingerprint

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(WinnowingFingerprint(), batch_format="pyarrow").to_pandas()
    out["n_fingerprints"] = out["fingerprints"].map(len)
    out["fp_digest"] = out["fingerprints"].map(
        lambda v: int(np.bitwise_xor.reduce(np.asarray(v, dtype=np.int64))) if len(v) else 0
    )
    return out[["doc_id", "n_fingerprints", "fp_digest"]] \
        .sort_values("doc_id").reset_index(drop=True)


def token_count_docs(sf_dir: str) -> pd.DataFrame:
    from ..stages.textstats import TokenCount

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(TokenCount(), batch_format="pyarrow", batch_size=256)
    return out.to_pandas()[
        ["doc_id", "n_chars", "n_tokens_ws", "n_tokens_bpe"]
    ].sort_values("doc_id").reset_index(drop=True)


QUERIES.update({
    "sessionize_events": sessionize_events,
    "ivf_ann_top10": ivf_ann_top10,
    "pq_ann_top10": pq_ann_top10,
    "minhash_dedup_docs": minhash_dedup_docs,
    "weighted_minhash_dedup_docs": weighted_minhash_dedup_docs,
    "simhash_dedup_docs": simhash_dedup_docs,
    "embedding_dedup_vecs": embedding_dedup_vecs,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "explode_words": explode_words,
    "centroid_by_label": centroid_by_label,
    "lang_id_docs": lang_id_docs,
    "quality_docs": quality_docs,
    "fingerprint_docs": fingerprint_docs,
    "winnow_fingerprint_docs": winnow_fingerprint_docs,
    "token_count_docs": token_count_docs,
})

ORACLES.update({
    "sessionize_events": """
        SELECT user_id,
               CAST(SUM(CASE WHEN prev_ts IS NULL
                             OR ts - prev_ts > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
        FROM (SELECT user_id, ts,
                     LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
              FROM events)
        GROUP BY user_id ORDER BY user_id
    """,
    "ivf_ann_top10": ORACLES["knn_cosine_top10"],
    # exact word-3-gram Jaccard: shingles via list_extract over every
    # start position (1-based, positions 1..len(words)-2 ⇒ only
    # full-length shingles, matching the Python window definition;
    # space-joined words are unambiguous since words contain no
    # spaces); intersection by shingle-equality self-join,
    # |A∪B| = na + nb − i. Same integer division both sides ⇒
    # bit-identical doubles.
    "ngram_jaccard_pairs": """
        WITH w AS (
          SELECT doc_id, string_split(text, ' ') AS words FROM documents
        ),
        pos AS (
          SELECT doc_id, words,
                 unnest(range(1, greatest(len(words) - 1, 1))) AS p
          FROM w
        ),
        g AS (
          SELECT DISTINCT doc_id,
                 list_extract(words, CAST(p AS INT)) || ' ' ||
                 list_extract(words, CAST(p AS INT) + 1) || ' ' ||
                 list_extract(words, CAST(p AS INT) + 2) AS gram
          FROM pos
        ),
        sz AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
          FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
        FROM inter
        JOIN sz sa ON sa.doc_id = id_a
        JOIN sz sb ON sb.doc_id = id_b
        WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
        ORDER BY id_a, id_b
    """,
    "explode_words": """
        SELECT doc_id,
               CAST(generate_subscripts(string_split(text, ' '), 1)
                    AS BIGINT) - 1 AS word_idx,
               unnest(string_split(text, ' ')) AS word
        FROM documents ORDER BY doc_id, word_idx
    """,
    # per-(label,dim) mean of the unnested embedding: both sides
    # accumulate float64 over identical float32 values and round to
    # 1e-6 (DuckDB ROUND half-away ≡ floor(x*1e6+0.5) away from exact
    # negative .5 boundaries, unreachable with float noise)
    "centroid_by_label": """
        WITH e AS (
          SELECT label,
                 CAST(generate_subscripts(embedding, 1) AS BIGINT) - 1 AS dim,
                 CAST(unnest(embedding) AS DOUBLE) AS val
          FROM embeddings
        )
        SELECT CAST(label AS BIGINT) AS label, dim,
               CAST(ROUND(AVG(val) * 1000000) AS BIGINT) AS centroid_micro,
               COUNT(*) AS n
        FROM e GROUP BY 1, 2 ORDER BY 1, 2
    """,
})


def events_sliding_window(sf_dir: str) -> pd.DataFrame:
    """1-hour windows sliding every 30 min: each event lands in exactly
    two windows — emitted per batch as duplicated (window_start, type)
    rows, then a plain groupby. The window assignment never shuffles
    more than 2x the (already tiny) projected rows."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    HALF = 1_800_000_000  # 30 min in us

    def windows(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        base = (us // HALF) * HALF
        starts = np.concatenate([base - HALF, base])
        ev = t.column("event_type").to_numpy(zero_copy_only=False)
        val = _cents(t.column("value")).to_numpy(zero_copy_only=False)
        return pa.table({
            "window_start": pa.array(np.concatenate([starts[:len(us)], starts[len(us):]]),
                                     type=pa.int64()).cast(pa.timestamp("us")),
            "event_type": pa.array(np.concatenate([ev, ev])),
            "value_cents": pa.array(np.concatenate([val, val])),
        })

    from ray.data.aggregate import Count, Sum

    out = (
        ds.map_batches(windows, batch_format="pyarrow")
        .groupby(["window_start", "event_type"])
        .aggregate(Sum("value_cents", alias_name="sum_value_cents"),
                   Count(alias_name="n"))
    )
    return out.to_pandas()


def multi_sketch_summary(sf_dir: str) -> pd.DataFrame:
    """All north-rule sketches in ONE pass over the transcript table
    (single read/decode per file; the merge stage combines every
    family). Uses the per-FILE deterministic variant so the
    order-sensitive quantile outputs are byte-identical across reruns
    (the per-batch variant inherits Ray's nondeterministic batch
    boundaries — caught by scripts/determinism_sweep.py)."""
    import glob

    from ..agg import multi_sketch_aggregate_files

    n_turns = max(1000, int(sf_of(sf_dir) * _TURNS_PER_SF))
    files = sorted(glob.glob(os.path.join(write_transcripts(n_turns), "*.parquet")))
    out = multi_sketch_aggregate_files(files, {
        "distinct_convs": {"sketch": "hll", "on": "conv_id"},
        "distinct_pairs": {"sketch": "hll", "on": ["role", "tool"]},
        "p50_len": {"sketch": "tdigest", "on": "text_len",
                    "mode": lambda sk: float(sk.quantile(0.5))},
        "p99_len": {"sketch": "kll", "on": "text_len",
                    "mode": lambda sk: float(sk.quantile(0.99))},
    }, derive={"text_len": lambda t: pc.cast(pc.utf8_length(t.column("text")), pa.int64())},
       derive_inputs=["text"])
    return _one_row(**{k: float(v) for k, v in out.items()})


def curate_documents(sf_dir: str,
                     broadcast_threshold: int = 1_000_000_000) -> pd.DataFrame:
    """End-to-end training-data curation: exact dedup → MinHash+LSH
    near-dup (keep the min id per component) → quality filter →
    lang-ID → per-language counts; curated rows land in a CHECKPOINTED
    partitioned-parquet sink (``CheckpointedWrite``: one directory per
    input shard, hive-partitioned by language inside, per-shard lineage
    manifest) — a resumed run skips every finished shard, and a changed
    input or changed dedup decision re-processes exactly what it must
    (VERDICT r02 item 9). Only the summary is materialized.

    Dedup filters broadcast the DROP sets (exact-dup extras + near-dup
    non-minimum members — O(duplicates), not O(corpus), so the
    broadcast survives far past where a keep-set would); their hash is
    the write's decisions FINGERPRINT, since per-row keep/drop depends
    on corpus-wide state. Past ``broadcast_threshold`` dropped rows the
    query falls back to the shuffle-based ``bucket_anti_join`` (losing
    per-shard resume — the write then streams in one pass)."""
    import hashlib
    import tempfile

    import ray
    import ray.data

    from ..stages.dedup import exact_dedup_drop_ids, minhash_dedup
    from ..stages.textstats import LangId, QualityScore
    from ..state.checkpoint import CheckpointedWrite

    input_files = sorted(glob.glob(os.path.join(sf_dir, "documents.parquet"))
                         or glob.glob(os.path.join(sf_dir, "documents",
                                                   "*.parquet")))
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    drops_ds = exact_dedup_drop_ids(ds).materialize()
    broadcast_ok = drops_ds.count() <= broadcast_threshold
    # broadcast NOT-IN filters are plain TASK functions (ray.get of the
    # broadcast array is a zero-copy plasma read) — actor pools here
    # would pin min-2 CPUs each and can deadlock small clusters
    # (CLAUDE.md q7 precedent)
    def _not_in_filter(ref):
        def f(t: pa.Table) -> pa.Table:
            drop = ray.get(ref)
            if not len(drop):
                return t
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(drop, ids), len(drop) - 1)
            return t.filter(pa.array(drop[pos] != ids))
        return f

    if broadcast_ok:
        drop_exact = np.sort(
            drops_ds.to_pandas()["doc_id"].to_numpy().astype(np.int64)
        ) if drops_ds.count() else np.empty(0, dtype=np.int64)
        drop_ref = ray.put(drop_exact)
        dedup_filter = _not_in_filter(drop_ref)
        deduped = ds.map_batches(dedup_filter, batch_format="pyarrow")
    else:
        from ..stages.joins import bucket_anti_join

        drop_exact = None
        deduped = bucket_anti_join(ds, drops_ds, on="doc_id")

    # near-dup stage (the full textbook pipeline): MinHash+LSH
    # components over the exact-deduped set, drop each component's
    # non-minimum members. materialize() so the exact-dedup filter runs
    # once for both the signature pass and the downstream stages.
    deduped = deduped.materialize()
    dup = minhash_dedup(deduped, threshold=0.8)
    if len(dup):
        comp_min = dup.groupby("component")["doc_id"].transform("min")
        drop_near = np.sort(
            dup.loc[dup["doc_id"] != comp_min, "doc_id"]
            .to_numpy().astype(np.int64))
    else:
        drop_near = np.empty(0, dtype=np.int64)
    near_dup_filter = _not_in_filter(ray.put(drop_near))

    out_dir = os.path.join(tempfile.gettempdir(), "raysketch_data",
                           f"curated_{sf_of(sf_dir)}")

    def curate_shard(shard_ds):
        """Pure per-shard transform: every cross-shard decision rides in
        via the broadcast drop refs (captured by the fingerprint)."""
        return (
            shard_ds
            .map_batches(dedup_filter, batch_format="pyarrow")
            .map_batches(near_dup_filter, batch_format="pyarrow")
            .map_batches(QualityScore(), batch_format="pyarrow", batch_size=256)
            .map_batches(lambda t: t.filter(
                pc.equal(t.column("quality_keep"), 1.0)),
                batch_format="pyarrow")
            .map_batches(LangId(), batch_format="pyarrow", batch_size=256)
            .select_columns(["doc_id", "lang_pred"])
        )

    if broadcast_ok:
        # decisions fingerprint: the two drop sets ARE the cross-shard
        # state; anything that changes them (any input change) must
        # invalidate every shard's output
        fp = hashlib.sha256(drop_exact.tobytes() + b"|" + drop_near.tobytes()
                            + b"|curate-v1").hexdigest()[:16]
        sink = CheckpointedWrite(out_dir)
        shard_dirs = sink.run(input_files, curate_shard, fingerprint=fp,
                              partition_cols=["lang_pred"])
        parts = [ray.data.read_parquet(d) for d in shard_dirs]
        curated_out = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
    else:  # shuffle-dedup fallback: one streaming write, no shard resume
        import shutil

        curated = (
            deduped
            .map_batches(near_dup_filter, batch_format="pyarrow")
            .map_batches(QualityScore(), batch_format="pyarrow", batch_size=256)
            .map_batches(lambda t: t.filter(
                pc.equal(t.column("quality_keep"), 1.0)),
                batch_format="pyarrow")
            .map_batches(LangId(), batch_format="pyarrow", batch_size=256)
            .select_columns(["doc_id", "lang_pred"])
        )
        shutil.rmtree(out_dir, ignore_errors=True)  # re-runs must not append
        curated.write_parquet(out_dir, partition_cols=["lang_pred"])
        curated_out = ray.data.read_parquet(out_dir)

    summary = (
        curated_out
        .groupby("lang_pred").count()
        .to_pandas().rename(columns={"count()": "n_docs"})
    )
    return summary.sort_values("lang_pred").reset_index(drop=True)


def image_features_stats(sf_dir: str) -> pd.DataFrame:
    """REAL image decode end-to-end (VERDICT r01 item 5): a cached
    parquet table of real PNG payloads → actor-pool decode (pure-numpy
    PNG codec; pillow when available) → fixed-size resize → feature
    extraction → per-image channel means. Deterministic output, driver
    rows-only check."""
    import tempfile

    import ray.data

    from ..stages.multimodal import (
        ImageDecode,
        ImageFeatures,
        ImageResize,
        make_real_png_table,
    )

    n = max(32, int(4096 * sf_of(sf_dir)))
    import glob as _glob

    cache = os.path.join(tempfile.gettempdir(), "raysketch_data",
                         f"pngs_n{n}_s7")
    # guard on *.parquet, not mere non-emptiness: a crash between the
    # tmp write and os.replace leaves only _part0.tmp, which
    # read_parquet ignores — the cache must self-heal
    if not _glob.glob(os.path.join(cache, "*.parquet")):
        import pyarrow.parquet as pq

        os.makedirs(cache, exist_ok=True)
        tmp = os.path.join(cache, "_part0.tmp")
        pq.write_table(make_real_png_table(n, seed=7), tmp,
                       row_group_size=max(32, n // 8))
        os.replace(tmp, os.path.join(cache, "part0.parquet"))
    ds = ray.data.read_parquet(cache)
    feats = (
        ds.map_batches(ImageDecode,
                       fn_constructor_kwargs={"deterministic_fake": False},
                       batch_format="pyarrow", batch_size=64,
                       concurrency=auto_concurrency())
        .map_batches(ImageResize((32, 32)), batch_size=64)
        .map_batches(ImageFeatures(), batch_size=64)
    )
    out = feats.to_pandas().sort_values("item_id").reset_index(drop=True)
    f = np.stack(out["feature"].to_numpy())
    return pd.DataFrame({
        "item_id": out["item_id"].astype("int64"),
        "mean_r": f[:, 0].round(4),
        "mean_g": f[:, 1].round(4),
        "mean_b": f[:, 2].round(4),
        "std_luma": f[:, 3:6].mean(axis=1).round(4),
    })


def _concat_sign_run(conv_np: np.ndarray, turn_np: np.ndarray,
                     text_arr, hasher, require_one_run: bool = False
                     ) -> pa.Table:
    """(conv_id, turn_idx, text) rows → one MinHash signature row per
    conversation, reconstructed in stable (conv_id, turn_idx) order —
    the per-row ordering invariant the north rule names. Fully
    vectorized: factorize conv ids, lexsort, build a LargeListArray
    over the sorted text (contiguous segments share the values buffer)
    and join with Arrow's C++ binary_join. ``require_one_run`` asserts
    each conversation's rows are contiguous in the INPUT order (the
    segmented fast path's per-file validity check)."""
    from ..hashing import arrow_to_flat_bytes, murmur64a

    codes, uniques = pd.factorize(conv_np, sort=True)
    if require_one_run and len(codes):
        n_runs = 1 + int(np.count_nonzero(codes[1:] != codes[:-1]))
        if n_runs != len(uniques):
            raise ValueError(
                "transcript file is not conversation-contiguous")
    order = np.lexsort((turn_np, codes))
    codes_s = codes[order]
    if isinstance(text_arr, pa.ChunkedArray):
        text_arr = text_arr.combine_chunks()
    txt = pc.take(pc.cast(text_arr, pa.large_string()),
                  pa.array(order, type=pa.int64()))
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    starts = np.nonzero(np.r_[True, codes_s[1:] != codes_s[:-1]])[0] \
        if len(codes_s) else np.array([], dtype=np.int64)
    offsets = np.r_[starts, len(codes_s)].astype(np.int64)
    lst = pa.LargeListArray.from_arrays(pa.array(offsets), txt)
    joined = pc.cast(pc.binary_join(
        lst, pa.scalar("\n", type=pa.large_string())), pa.string())
    cids = np.asarray(uniques)
    data, offsets_b = arrow_to_flat_bytes(pa.array(cids, type=pa.string()))
    ids = (murmur64a(data, offsets_b)
           & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
    sig_t = hasher(pa.table({
        "doc_id": pa.array(ids),
        "text": joined,
    }))
    return sig_t.append_column("conv_id", pa.array(cids, type=pa.string()))


def _conv_file_plan(files):
    """Footer-only planning for the segmented reconstruction: one unit
    per ROW GROUP with its (min conv_id, max conv_id) from parquet
    statistics — no data read. Returns [(min, max, path, rg_index)]
    sorted if every row group carries stats AND the ranges are disjoint
    except at endpoints (conversation-clustered layout); None otherwise
    (→ shuffle path).

    Row-group (not file) granularity matters on this sandbox: a
    whole-file unit allocates ~1.3 GB of fresh working set inside ONE
    task and first-touch page faults run ~70 MB/s here (CLAUDE.md), so
    16 file-tasks measured 131 s CPU each where the same work costs
    9.6 s warm; 31250-row units keep allocations pool-sized and restore
    full task parallelism (16 files → 64 units at sf0.1)."""
    import pyarrow.parquet as pq

    plan = []
    for f in files:
        try:
            md = pq.ParquetFile(f).metadata
        except Exception:
            return None
        ci = next((i for i in range(md.num_columns)
                   if md.schema.column(i).name == "conv_id"), None)
        if ci is None:
            return None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                return None
            mn, mx = st.min, st.max
            if isinstance(mn, bytes):
                mn, mx = mn.decode(), mx.decode()
            plan.append((mn, mx, f, rg))
    plan.sort()
    for a, b in zip(plan, plan[1:]):
        if a[1] > b[0]:  # interior overlap → not clustered
            return None
    return plan


def _conv_signatures(sf_dir: str):
    """Per-conversation MinHash signatures over the transcript table.

    Fast path (the 100-TB shape): transcript shards are written
    conversation-contiguous (turns append in order), so parquet footer
    row-group statistics prove each ROW GROUP owns a disjoint conv_id
    range — whole conversations reconstruct INSIDE per-row-group tasks
    with ZERO text shuffle, and only the ≤1-per-unit-boundary
    conversations that straddle adjacent units go through a tiny
    repair stage (one read per distinct file set, row-group-pruned IN
    filters). This replaced a full-corpus 64-bucket text exchange that
    dominated the pipeline (~40-60 s of the 42-100 s wall at sf0.1);
    row-group (not file) units keep per-task allocations pool-sized on
    this fault-bound sandbox and quadruple task parallelism.

    Falls back to the bucket-shuffle reconstruction whenever stats are
    missing, unit ranges overlap, or a unit fails the in-task
    contiguity check — identical signatures either way (OPH is fixed
    by seed; the joined text is the same), locked by pytest equality
    tests incl. a conversation spanning three units."""
    import glob as _glob

    import ray
    import ray.data

    from ..stages.dedup import MinHasher

    n_turns = max(1000, int(sf_of(sf_dir) * _TURNS_PER_SF))
    path = write_transcripts(n_turns)
    files = sorted(_glob.glob(os.path.join(path, "*.parquet")))
    hasher = MinHasher("text", "doc_id", 128, 5, mode="oph")  # tiny
    # state, fixed by seed — signatures independent of batching/placement

    plan = _conv_file_plan(files)
    if plan is not None:
        try:
            return _conv_sigs_segmented(plan, hasher)
        except (ValueError, ray.exceptions.RayTaskError):
            pass  # not contiguous after all → general shuffle path
    ds = ray.data.read_parquet(path, columns=["conv_id", "turn_idx", "text"])
    return _conv_sigs_shuffle(ds, hasher)


def _empty_sig_table(hasher) -> pa.Table:
    return _concat_sign_run(np.array([], dtype=object),
                            np.array([], dtype=np.int64),
                            pa.array([], type=pa.string()), hasher)


def _conv_sigs_segmented(plan, hasher):
    import ray.data

    boundary = {plan[i][1] for i in range(len(plan) - 1)
                if plan[i][1] == plan[i + 1][0]}

    # A boundary conversation is always a unit ENDPOINT (sorted units
    # whose ranges only touch at endpoints form a non-decreasing chain,
    # so no interior conv_id can equal another unit's endpoint) — each
    # unit therefore ships its ≤2 drop values inline instead of
    # broadcasting the full boundary list to every task (O(#units)
    # strings per task at 100-TB unit counts).
    items = [{"path": f, "rg": rg,
              "drop": [v for v in dict.fromkeys((mn, mx))
                       if v in boundary]}
             for mn, mx, f, rg in plan]

    def sign_unit(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as _pq

        out = []
        for fp, rg, drop in zip(batch.column("path").to_pylist(),
                                batch.column("rg").to_pylist(),
                                batch.column("drop").to_pylist()):
            t = _pq.ParquetFile(fp).read_row_group(
                rg, columns=["conv_id", "turn_idx", "text"])
            for v in drop:
                t = t.filter(pc.not_equal(t.column("conv_id"), v))
            if t.num_rows:
                out.append(_concat_sign_run(
                    t.column("conv_id").to_numpy(zero_copy_only=False),
                    t.column("turn_idx").to_numpy(zero_copy_only=False),
                    t.column("text"), hasher, require_one_run=True))
        return pa.concat_tables(out) if out else _empty_sig_table(hasher)

    sigs = ray.data.from_items(
        items, override_num_blocks=len(items)).map_batches(
            sign_unit, batch_format="pyarrow")

    if boundary:
        # each boundary conv's units form one CONSECUTIVE run in the
        # sorted plan (chain property above), so the affected-file scan
        # is O(#units) total, not O(#boundaries × #units); a conv may
        # span several units of one file — read each file once,
        # row-group-pruned by the filter
        repairs, seen, n_units = [], set(), len(plan)
        for i in range(n_units - 1):
            b = plan[i][1]
            if b != plan[i + 1][0] or b in seen:
                continue
            seen.add(b)
            j = i
            while j >= 0 and plan[j][1] == b:
                j -= 1
            k2 = i + 1
            while k2 < n_units and plan[k2][0] == b:
                k2 += 1
            repairs.append((b, tuple(sorted(
                {plan[u][2] for u in range(j + 1, k2)}))))

        # one repair task per distinct FILE SET, not per boundary conv:
        # with row-group units most boundaries are intra-file, so this
        # collapses ~#units repair tasks to ~#files reads, each
        # row-group-pruned by an IN filter over its boundary convs
        grouped: dict = {}
        for b, fs in repairs:
            grouped.setdefault(fs, []).append(b)
        rep_items = [{"files": list(fs), "bs": sorted(bs)}
                     for fs, bs in sorted(grouped.items())]

        def sign_boundary(batch: pa.Table) -> pa.Table:
            import pyarrow.parquet as _pq

            out = []
            for fl, bs in zip(batch.column("files").to_pylist(),
                              batch.column("bs").to_pylist()):
                parts = [_pq.read_table(
                    f, columns=["conv_id", "turn_idx", "text"],
                    filters=[("conv_id", "in", bs)]) for f in fl]
                t = pa.concat_tables(parts)
                if t.num_rows:
                    out.append(_concat_sign_run(
                        t.column("conv_id").to_numpy(zero_copy_only=False),
                        t.column("turn_idx").to_numpy(zero_copy_only=False),
                        t.column("text"), hasher))
            return pa.concat_tables(out) if out else _empty_sig_table(hasher)

        rep = ray.data.from_items(
            rep_items, override_num_blocks=len(rep_items)).map_batches(
                sign_boundary, batch_format="pyarrow")
        sigs = sigs.union(rep)
    # coalesce: one ~1k-row block per unit (plus 1-row repair blocks)
    # makes every downstream operator pay per-task scheduling × #units
    # — at 256 units the LSH + verify stages spent ~100 s in pure task
    # overhead on 380 tiny blocks. ~8k signature rows per block keeps
    # task counts flat without hurting parallelism.
    n_blocks = max(8, min(64, len(plan) // 8 + 1))
    return sigs.repartition(n_blocks).materialize()


def _conv_sigs_shuffle(ds, hasher):
    """General-layout reconstruction: one 64-bucket text exchange, then
    per-bucket vectorized concat+sign (a groupby(conv_id).map_groups
    pays Ray's per-GROUP call cost × n_convs — measured 237 s at
    sf0.1's ~80k convs; per-bucket pandas agg-join is one call per
    bucket). Signatures are computed IN the bucket task — the
    reconstructed text never materializes or re-reads."""
    from ..hashing import arrow_to_flat_bytes, murmur64a

    def add_bucket(t: pa.Table) -> pa.Table:
        data, offsets = arrow_to_flat_bytes(t.column("conv_id"))
        b = (murmur64a(data, offsets) % np.uint64(64)).astype(np.int64)
        return t.append_column("__b", pa.array(b))

    def concat_and_sign(g: pd.DataFrame):
        return _concat_sign_run(
            g["conv_id"].to_numpy(), g["turn_idx"].to_numpy(),
            pa.array(g["text"].to_numpy(), type=pa.string()), hasher)

    return ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__b").map_groups(
            concat_and_sign, batch_format="pandas").materialize()


def conv_dedup_minhash(sf_dir: str) -> pd.DataFrame:
    """Conversation-level near-dup detection: reconstruct each
    conversation's full text in stable (conv_id, turn_idx) order —
    the per-row ordering invariant the north rule names — segmented
    per-file when footer stats prove the conversation-contiguous
    layout (zero text shuffle; see _conv_signatures), else via one
    bucket exchange — then MinHash+LSH over the conversation
    documents. Returns one row per conversation in a duplicate
    component."""
    from ..stages.dedup import (DRIVER_PAIR_LIMIT, _dedupe_pair_rows,
                                _dedupe_pairs_driver, _resolve_components,
                                band_floor_filter, collapse_exact_signatures,
                                estimate_pair_jaccard, lsh_candidate_pairs,
                                minhash_agreement_scorer, minhash_band_floor,
                                score_pairs_distributed, union_find_components)

    sigs = _conv_signatures(sf_dir).materialize()
    # collapse identical-signature conversations first (one 479-copy
    # cluster at sf0.1 would otherwise emit ~1.8M full-clique pair rows
    # per run); exactly output-preserving for signature-agreement
    # verification — see dedup.collapse_exact_signatures
    reps, exact_edges, n_exact = collapse_exact_signatures(sigs, "doc_id",
                                                           "minhash")
    # 16 bands × 8 rows: banding matched to the 0.9 verify threshold —
    # per-pair recall at J=0.9 is 1−(1−0.9⁸)¹⁶ ≈ 99.97% while mid-
    # similarity false candidates drop ~10× (the 32×4 default is tuned
    # for t≈0.5 and emitted 764k candidates for 60k convs at sf0.1)
    raw = lsh_candidate_pairs(reps, "doc_id", num_bands=16, dedupe="raw",
                              screen_threshold=0.9).materialize()
    n_pairs = raw.count()  # band-inflated upper bound on distinct pairs
    if n_pairs == 0 and n_exact == 0:
        return pd.DataFrame({"conv_id": [], "component": []})
    if n_pairs == 0:  # only exact-signature duplicate conversations
        comps = _resolve_components(exact_edges, "doc_id")
        comp_ids = comps["doc_id"].to_numpy(dtype=np.int64)
        comp_lab = comps["component"].to_numpy(dtype=np.int64)
    elif n_pairs + n_exact > DRIVER_PAIR_LIMIT:
        # distributed verify + components: neither the pair set nor the
        # signatures ever reach the driver unless the VERIFIED set fits
        # the driver tier (VERDICT r02 #1; _resolve_components re-tiers)
        pairs_ds = _dedupe_pair_rows(raw, {
            "n_bands": ("count", None),
            "truncated_bucket": ("max", "truncated_bucket"),
        })
        # provably output-preserving cut (16 bands × 8 rows, est ≥ 0.9
        # over the same 128 components ⇒ ≥4 fully-colliding bands):
        # drops the ~95% of 1-band accidental collisions before the
        # payload-attach exchanges — see dedup.minhash_band_floor
        pairs_ds = band_floor_filter(
            pairs_ds, minhash_band_floor(128, 16, 0.9))
        scored = score_pairs_distributed(pairs_ds, reps, "doc_id", "minhash",
                                         minhash_agreement_scorer,
                                         "est_jaccard")
        verified = scored.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("est_jaccard"),
                                                pa.scalar(0.9))),
            batch_format="pyarrow")
        if n_exact:
            verified = verified.select_columns(["id_a", "id_b"]) \
                .union(exact_edges)
        comps = _resolve_components(verified, "doc_id")
        if len(comps) == 0:
            return pd.DataFrame({"conv_id": [], "component": []})
        comp_ids = comps["doc_id"].to_numpy(dtype=np.int64)
        comp_lab = comps["component"].to_numpy(dtype=np.int64)
    else:
        pairs = _dedupe_pairs_driver(raw.to_pandas(), {
            "n_bands": ("count", None),
            "truncated_bucket": ("max", "truncated_bucket"),
        })
        pairs = estimate_pair_jaccard(pairs, reps, "doc_id")
        verified = pairs[pairs["est_jaccard"] >= 0.9]
        if n_exact:
            verified = pd.concat([verified[["id_a", "id_b"]],
                                  exact_edges.to_pandas()],
                                 ignore_index=True)
        comp = union_find_components(verified)
        comp_ids = np.fromiter(comp.keys(), dtype=np.int64, count=len(comp))
        comp_lab = np.fromiter(comp.values(), dtype=np.int64, count=len(comp))
    if len(comp_ids) == 0:
        return pd.DataFrame({"conv_id": [], "component": []})
    # map hashed ids back to conv ids DISTRIBUTED: broadcast the (small
    # — dup convs only) component table, attach inside map_batches over
    # the signature table instead of pulling one row per conversation
    # to the driver (VERDICT r02 item 5)
    import ray

    order = np.argsort(comp_ids)
    comp_ref = ray.put((comp_ids[order], comp_lab[order]))

    def attach(t: pa.Table) -> pa.Table:
        cid, lab = ray.get(comp_ref)
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(cid, d), len(cid) - 1)
        hit = cid[pos] == d
        tt = t.filter(pa.array(hit))
        return pa.table({"conv_id": tt.column("conv_id"),
                         "component": pa.array(lab[pos[hit]])})

    out = sigs.select_columns(["doc_id", "conv_id"]).map_batches(
        attach, batch_format="pyarrow").to_pandas()
    return out.sort_values("conv_id").reset_index(drop=True)


def curate_conversations(sf_dir: str) -> pd.DataFrame:
    """END-TO-END CONVERSATION CURATION — the transcripts-payload twin
    of curate_documents and the composition the graft is for: (1)
    conversation near-dup components (segmented zero-shuffle
    reconstruction → MinHash+LSH, conv_dedup_minhash) keep each
    component's lexicographic-min conv; (2) an LM quality gate drops
    conversations whose mean transition probability falls below 90% of
    the corpus mean — all integer fixed point: per-turn scores reduce
    to per-conv (pairs, score) partials, ONE conv-hash bucket exchange
    of ≤24-byte rows, threshold gm_fp computed once in Python ints so
    the per-conv compare (s·16384)//p < gm_fp stays int64-safe at any
    corpus size; (3) surviving TURNS (full rows, stable (conv_id,
    turn_idx) order preserved) land in the CHECKPOINTED per-shard sink
    — fingerprint = sha256 of both drop sets, so a resumed run skips
    finished shards and any changed decision re-processes exactly what
    it must. Drop sets are O(dropped convs), never O(corpus).
    Rows-only driver entry; pytest locks the quality-gate math against
    a single-batch brute force and the resume behavior."""
    import glob as _glob
    import hashlib
    import tempfile

    import ray
    import ray.data

    from ..stages.lm import CharBigramLMScore, train_char_bigram_counts
    from ..state.checkpoint import CheckpointedWrite

    n_turns = max(1000, int(sf_of(sf_dir) * _TURNS_PER_SF))
    tpath = write_transcripts(n_turns)
    files = sorted(_glob.glob(os.path.join(tpath, "*.parquet")))

    out_dir = os.path.join(tempfile.gettempdir(), "raysketch_data",
                           f"curated_convs_{sf_of(sf_dir)}")
    # ---- decision cache: the drop sets are pure functions of the
    # input files (and the pipeline version), so a resume with an
    # unchanged input manifest reloads them instead of re-running
    # near-dup + LM (sf0.1 resume 35.6 s → write-skip only); any
    # changed file invalidates the cache AND (via the fingerprint)
    # every shard the decisions touched.
    input_manifest = hashlib.sha256(repr(sorted(
        (os.path.basename(f), os.path.getsize(f), os.path.getmtime(f))
        for f in files)).encode() + b"|curate-conv-v1").hexdigest()
    cache_path = os.path.join(out_dir, "decisions.json")
    cached = None
    if os.path.exists(cache_path):
        import json

        with open(cache_path) as fh:
            c = json.load(fh)
        if c.get("input_manifest") == input_manifest:
            cached = c
    if cached is not None:
        summary, fp = cached["summary"], cached["fingerprint"]
        drop_all = np.array(cached["drop_all"], dtype=str)
        drop_all = np.sort(drop_all) if len(drop_all) \
            else np.empty(0, dtype="U1")
        return _curate_conversations_write(
            files, drop_all, fp, out_dir, summary)

    # ---- (1) near-dup drop set: non-minimum members per component
    dup = conv_dedup_minhash(sf_dir)
    if len(dup):
        m = dup.groupby("component")["conv_id"].transform("min")
        drop_dup = np.sort(dup.loc[dup["conv_id"] != m, "conv_id"]
                           .to_numpy().astype(str))
    else:
        drop_dup = np.empty(0, dtype="U1")

    # ---- (2) LM quality drop set
    ds = transcripts_ds(sf_dir, columns=["conv_id", "text"])
    lm_ref = ray.put(train_char_bigram_counts(ds))
    holder: list = []

    def part(t: pa.Table) -> pd.DataFrame:
        if not holder:
            holder.append(CharBigramLMScore(lm_ref, text_col="text",
                                            id_col="conv_id"))
        sc = holder[0](t).to_pandas()
        g = sc.groupby("conv_id", as_index=False)[
            ["n_pairs", "lm_score_fp"]].sum()
        h = pd.util.hash_pandas_object(g["conv_id"], index=False).to_numpy()
        g["__b"] = (h % np.uint64(256)).astype(np.int64)
        return g

    partials = ds.map_batches(part, batch_format="pyarrow").materialize()
    tot = partials.sum(on=["n_pairs", "lm_score_fp"])
    gp, gs = int(tot["sum(n_pairs)"]), int(tot["sum(lm_score_fp)"])
    # 90% of the corpus-mean transition probability, in 1/16384 units —
    # ONE Python-int division on the driver; per-conv compares then fit
    # int64 (s·16384 ≤ 16384²·p < 2⁶³ for p < 2³⁴ pairs per conv)
    gm_fp = (9 * gs * 16384) // (10 * gp) if gp else 0

    def decide(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby("conv_id", as_index=False)[
            ["n_pairs", "lm_score_fp"]].sum()
        s = r["lm_score_fp"].to_numpy(dtype=np.int64)
        p = np.maximum(r["n_pairs"].to_numpy(dtype=np.int64), 1)
        bad = (s * np.int64(16384)) // p < gm_fp
        out = r.loc[bad, ["conv_id"]].copy()
        out["n"] = np.int64(0)
        out["kind"] = np.int64(1)
        head = pd.DataFrame({"conv_id": [""], "n": [np.int64(len(r))],
                             "kind": [np.int64(0)]})
        return pd.concat([out, head], ignore_index=True)

    dec = partials.groupby("__b").map_groups(
        decide, batch_format="pandas").to_pandas()
    n_convs = int(dec.loc[dec["kind"] == 0, "n"].sum())
    drop_q = np.sort(dec.loc[dec["kind"] == 1, "conv_id"]
                     .to_numpy().astype(str))

    # ---- (3) checkpointed turn-level write of surviving conversations
    drop_all = np.unique(np.concatenate([drop_dup.astype(str),
                                         drop_q.astype(str)])) \
        if len(drop_dup) or len(drop_q) else np.empty(0, dtype="U1")
    fp = hashlib.sha256(("|".join(drop_all.tolist())
                         + "|curate-conv-v1").encode()).hexdigest()[:16]
    summary = {"n_convs": int(n_convs),
               "n_dropped_dup": int(len(drop_dup)),
               "n_dropped_quality": int(len(drop_q))}
    import json

    os.makedirs(out_dir, exist_ok=True)
    tmp = cache_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"input_manifest": input_manifest, "fingerprint": fp,
                   "drop_all": drop_all.tolist(), "summary": summary}, fh)
    os.replace(tmp, cache_path)
    return _curate_conversations_write(files, drop_all, fp, out_dir,
                                       summary)


def _curate_conversations_write(files, drop_all, fp, out_dir, summary):
    """Write tier of curate_conversations: broadcast NOT-IN filter over
    the drop set, checkpointed per-shard sink, summary assembly."""
    import ray
    import ray.data

    from ..state.checkpoint import CheckpointedWrite

    drop_ref = ray.put(np.asarray(drop_all))

    def keep_rows(t: pa.Table) -> pa.Table:
        dr = ray.get(drop_ref)
        if not len(dr):
            return t
        c = t.column("conv_id").to_numpy(zero_copy_only=False).astype(str)
        pos = np.minimum(np.searchsorted(dr, c), len(dr) - 1)
        return t.filter(pa.array(dr[pos] != c))

    sink = CheckpointedWrite(out_dir)
    shard_dirs = sink.run(
        files, lambda sds: sds.map_batches(keep_rows,
                                           batch_format="pyarrow"),
        fingerprint=fp)
    parts = [ray.data.read_parquet(d) for d in shard_dirs]
    written = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
    return pd.DataFrame([{**summary,
                          "n_turns_written": int(written.count())}]) \
        .astype({c: "int64" for c in
                 ("n_convs", "n_dropped_dup", "n_dropped_quality",
                  "n_turns_written")})


def audio_frame_energy(sf_dir: str) -> pd.DataFrame:
    """REAL audio decode end-to-end: a cached parquet table of real PCM
    WAV payloads → actor-pool frame sampling (built-in RIFF codec) →
    per-item frame RMS energies. Deterministic, driver rows-only
    check."""
    import tempfile

    import ray.data

    from ..stages.multimodal import AudioFrameSample, make_real_wav_table

    n = max(32, int(2048 * sf_of(sf_dir)))
    import glob as _glob

    cache = os.path.join(tempfile.gettempdir(), "raysketch_data",
                         f"wavs_n{n}_s9")
    if not _glob.glob(os.path.join(cache, "*.parquet")):  # self-healing guard

        import pyarrow.parquet as pq

        os.makedirs(cache, exist_ok=True)
        tmp = os.path.join(cache, "_part0.tmp")
        pq.write_table(make_real_wav_table(n, seed=9), tmp,
                       row_group_size=max(16, n // 4))
        os.replace(tmp, os.path.join(cache, "part0.parquet"))
    out = (
        ray.data.read_parquet(cache)
        .map_batches(AudioFrameSample, fn_constructor_kwargs={"deterministic_fake": False},
                     batch_format="pyarrow", batch_size=32,
                     concurrency=auto_concurrency())
        .to_pandas()
    )
    out["energy"] = out["energy"].round(6)
    return out.sort_values(["item_id", "frame_idx"]).reset_index(drop=True)


def video_frame_stats(sf_dir: str) -> pd.DataFrame:
    """REAL video decode end-to-end: a cached parquet table of real Y4M
    clips → actor-pool frame sampling (built-in YUV4MPEG2 codec) →
    per-sample mean luma + motion proxy. Deterministic, driver
    rows-only check."""
    import glob as _glob
    import tempfile

    import ray.data

    from ..stages.multimodal import VideoFrameSample, make_real_y4m_table

    n = max(32, int(2048 * sf_of(sf_dir)))
    cache = os.path.join(tempfile.gettempdir(), "raysketch_data",
                         f"y4ms_n{n}_s11")
    if not _glob.glob(os.path.join(cache, "*.parquet")):  # self-healing guard
        import pyarrow.parquet as pq

        os.makedirs(cache, exist_ok=True)
        tmp = os.path.join(cache, "_part0.tmp")
        pq.write_table(make_real_y4m_table(n, seed=11), tmp,
                       row_group_size=max(16, n // 4))
        os.replace(tmp, os.path.join(cache, "part0.parquet"))
    out = (
        ray.data.read_parquet(cache)
        .map_batches(VideoFrameSample,
                     fn_constructor_kwargs={"deterministic_fake": False},
                     batch_format="pyarrow", batch_size=32,
                     concurrency=auto_concurrency())
        .to_pandas()
    )
    out["mean_luma"] = out["mean_luma"].round(6)
    out["motion"] = out["motion"].round(6)
    return out.sort_values(["item_id", "sample_idx"]).reset_index(drop=True)


QUERIES.update({
    "events_sliding_window": events_sliding_window,
    "multi_sketch_summary": multi_sketch_summary,
    "curate_documents": curate_documents,
    "image_features_stats": image_features_stats,
    "audio_frame_energy": audio_frame_energy,
    "video_frame_stats": video_frame_stats,
    "conv_dedup_minhash": conv_dedup_minhash,
    "curate_conversations": curate_conversations,
})

ORACLES.update({
    "events_sliding_window": """
        WITH w AS (
          SELECT to_timestamp(floor(epoch(ts)/1800)*1800 - 1800) AS window_start,
                 event_type, CAST(ROUND(value*100) AS BIGINT) AS vc
          FROM events
          UNION ALL
          SELECT to_timestamp(floor(epoch(ts)/1800)*1800) AS window_start,
                 event_type, CAST(ROUND(value*100) AS BIGINT) AS vc
          FROM events
        )
        SELECT CAST(window_start AS TIMESTAMP) AS window_start, event_type,
               CAST(SUM(vc) AS BIGINT) AS sum_value_cents,
               COUNT(*) AS n
        FROM w GROUP BY 1, 2
    """,
})


def join_lineitem_orders(sf_dir: str) -> pd.DataFrame:
    """Large×large bucketed hash join (both sides shuffle once into
    hash-bucket pairs): revenue by order priority across lineitem⋈orders."""
    from ray.data.aggregate import Count, Sum

    from ..stages.joins import bucket_hash_join

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice"])
    li = li.map_batches(
        lambda t: pa.table({"l_orderkey": t.column("l_orderkey"),
                            "price_cents": _cents(t.column("l_extendedprice"))}),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    orders = orders.map_batches(
        lambda t: pa.table({"l_orderkey": t.column("o_orderkey"),
                            "o_orderpriority": t.column("o_orderpriority")}),
        batch_format="pyarrow",
    )
    joined = bucket_hash_join(li, orders, on="l_orderkey", num_buckets=32)

    # combiner: Ray's sort-aggregate over the join's pandas blocks costs
    # ~20 s for 600k rows even with 5 groups (measured at sf0.1/16cpu);
    # pre-reducing each block to ≤5 partial rows makes the exchange
    # trivial (71 s → ~10 s end-to-end)
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if "o_orderpriority" not in df.columns or not len(df):
            return pd.DataFrame({
                "o_orderpriority": pd.Series([], dtype="object"),
                "part_sum": pd.Series([], dtype="int64"),
                "part_n": pd.Series([], dtype="int64")})
        g = df.groupby("o_orderpriority", as_index=False).agg(
            part_sum=("price_cents", "sum"), part_n=("price_cents", "size"))
        return g.astype({"part_sum": "int64", "part_n": "int64"})

    out = (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("o_orderpriority")
        .aggregate(Sum("part_sum", alias_name="sum_price_cents"),
                   Sum("part_n", alias_name="n_items"))
        .to_pandas()
    )
    # empty bucket groups upcast the sum to float64; values are exact ints
    out["sum_price_cents"] = out["sum_price_cents"].astype("int64")
    out["n_items"] = out["n_items"].astype("int64")
    return out


QUERIES["join_lineitem_orders"] = join_lineitem_orders
ORACLES["join_lineitem_orders"] = """
    SELECT o_orderpriority,
           CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT)
               AS sum_price_cents,
           COUNT(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
"""


def bottomk_sample_convs(sf_dir: str) -> pd.DataFrame:
    """Deterministic mergeable uniform sample over distinct conv_ids
    (bottom-k by hash) + its distinct estimate — 'show me 100 random
    conversations' at any scale, reproducible across runs/partitions."""
    from ..sketches.bottomk import BottomK

    ds = transcripts_ds(sf_dir, columns=["conv_id"])
    blob = sketch_aggregate(ds, "bottomk", on="conv_id", mode="bytes", k=100)
    bk = BottomK.from_bytes(blob)
    sample = sorted(e.decode() for e in bk.sample())
    return pd.DataFrame({
        "conv_id": sample,
        "distinct_estimate": np.full(len(sample), round(bk.distinct_estimate())),
    })


def median_value_by_event_type(sf_dir: str) -> pd.DataFrame:
    """Exact per-group median (lower element) of value_cents — the
    grouped order-statistic operator: groupby → sort inside map_groups →
    pick the k-th element. All-integer so the oracle hash is exact."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    ds = ds.map_batches(
        lambda t: pa.table({"event_type": t.column("event_type"),
                            "value_cents": _cents(t.column("value"))}),
        batch_format="pyarrow",
    )

    def med(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["value_cents"].to_numpy())
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "median_cents": [int(v[(len(v) - 1) // 2])],
            "n": [len(v)],
        })

    out = ds.groupby("event_type").map_groups(med, batch_format="pandas")
    return out.to_pandas().sort_values("event_type").reset_index(drop=True)


QUERIES.update({
    "bottomk_sample_convs": bottomk_sample_convs,
    "median_value_by_event_type": median_value_by_event_type,
})

ORACLES["median_value_by_event_type"] = """
    SELECT event_type,
           CAST(vc AS BIGINT) AS median_cents,
           CAST(cnt AS BIGINT) AS n
    FROM (
      SELECT event_type, vc,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY vc) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS cnt
      FROM (SELECT event_type, CAST(ROUND(value*100) AS BIGINT) AS vc FROM events)
    )
    WHERE rn = (cnt + 1) // 2
    ORDER BY event_type
"""


def top10_lineitems_by_revenue(sf_dir: str) -> pd.DataFrame:
    """Global top-10 rows via the distributed sort operator
    (``ds.sort(...).limit(k)``) — ties broken on the full key so the
    result is deterministic."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"])

    def prep(t: pa.Table) -> pa.Table:
        price_c = _cents(t.column("l_extendedprice"))
        disc_b = _cents(t.column("l_discount"))
        rev = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_b))
        return pa.table({
            "l_orderkey": t.column("l_orderkey"),
            "l_linenumber": t.column("l_linenumber"),
            "revenue_e4": rev,
        })

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .sort(["revenue_e4", "l_orderkey", "l_linenumber"],
              descending=[True, False, False])
        .limit(10)
    )
    df = out.to_pandas()
    df["rank"] = np.arange(1, len(df) + 1)
    return df[["rank", "l_orderkey", "l_linenumber", "revenue_e4"]]


QUERIES["top10_lineitems_by_revenue"] = top10_lineitems_by_revenue
ORACLES["top10_lineitems_by_revenue"] = """
    SELECT CAST(ROW_NUMBER() OVER (
             ORDER BY rev DESC, l_orderkey ASC, l_linenumber ASC) AS BIGINT) AS rank,
           l_orderkey, l_linenumber, rev AS revenue_e4
    FROM (
      SELECT l_orderkey, l_linenumber,
             CAST(ROUND(l_extendedprice*100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) AS rev
      FROM lineitem
    )
    ORDER BY rank LIMIT 10
"""


def user_activity_stats(sf_dir: str) -> pd.DataFrame:
    """Per-user activity profile: event count, active span, exact
    distinct event types (two-level groupby: (user, type) → user)."""
    from ..stages.dedup import _splitmix64 as _mix64

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    # ONE bucketed shuffle instead of two user-keyed groupby chains:
    # user counts scale with data, and Ray's aggregate pays per-group;
    # inside a bucket everything reduces with sort + reduceat
    def add_bucket(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (_mix64(u) % np.uint64(64)).astype(np.int64)
        return t.append_column("__b", pa.array(b))

    def stats_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_type"])
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        ts = g["ts"].to_numpy()
        new_u = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.nonzero(new_u)[0]
        counts = np.diff(np.r_[starts, len(uid)]).astype(np.int64)
        new_t = new_u | np.r_[True, et[1:] != et[:-1]]
        ntypes = np.add.reduceat(new_t.astype(np.int64), starts)
        first = np.minimum.reduceat(ts, starts)
        last = np.maximum.reduceat(ts, starts)
        span = np.round(
            (last - first) / np.timedelta64(1, "us")).astype(np.int64)
        return pd.DataFrame({"user_id": uid[starts].astype(np.int64),
                             "n_events": counts,
                             "n_event_types": ntypes,
                             "span_us": span})

    out = ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__b").map_groups(stats_bucket, batch_format="pandas") \
        .to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


QUERIES["user_activity_stats"] = user_activity_stats
ORACLES["user_activity_stats"] = """
    SELECT user_id,
           COUNT(*) AS n_events,
           COUNT(DISTINCT event_type) AS n_event_types,
           CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS span_us
    FROM events GROUP BY user_id ORDER BY user_id
"""


def conv_length_quantiles(sf_dir: str) -> pd.DataFrame:
    """Turns-per-conversation distribution (the zipf skew the north rule
    requires handling): per-conv counts via grouped aggregate, then KLL
    quantiles + exact max over the (much smaller) per-conv table."""
    from ..hashing import arrow_to_flat_bytes, murmur64a

    ds = transcripts_ds(sf_dir, columns=["conv_id", "turn_idx"])

    # bucketed per-conv max (built-in Max still pays ~40 µs/GROUP at
    # ~80k conv groups, and the unmaterialized result was consumed
    # twice — the whole shuffle re-executed for the max() below)
    def add_bucket(t: pa.Table) -> pa.Table:
        data, offsets = arrow_to_flat_bytes(t.column("conv_id"))
        b = (murmur64a(data, offsets) % np.uint64(64)).astype(np.int64)
        return t.append_column("__b", pa.array(b))

    def max_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("conv_id", sort=True)["turn_idx"].max()
        return pd.DataFrame({"n_turns": m.to_numpy().astype(np.int64) + 1})

    per_conv = ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__b").map_groups(max_in_bucket, batch_format="pandas") \
        .materialize()
    blob = sketch_aggregate(per_conv, "kll", on="n_turns", mode="bytes", k=256)
    from ..sketches import KLL as _KLL

    kll = _KLL.from_bytes(blob)
    import ray.data  # noqa: F401

    mx = per_conv.max("n_turns")
    return _one_row(
        n_convs=kll.n,
        p50=float(kll.quantile(0.5)),
        p90=float(kll.quantile(0.9)),
        p99=float(kll.quantile(0.99)),
        max_turns=int(mx),
    )


QUERIES["conv_length_quantiles"] = conv_length_quantiles


def purchases_asof_last_view(sf_dir: str) -> pd.DataFrame:
    """As-of join, SQL-checked against DuckDB's native ASOF JOIN: for
    every purchase event, the most recent prior 'view' by the same user
    (bucketed merge_asof — stages/joins.py)."""
    from ..stages.joins import asof_join

    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_type", "event_id"])
    purchases = ev.map_batches(
        lambda t: pa.table({
            "user_id": t.column("user_id"),
            "ts": t.column("ts"),
            "purchase_id": t.column("event_id"),
        }).filter(pc.equal(t.column("event_type"), "purchase")),
        batch_format="pyarrow",
    )
    views = ev.map_batches(
        lambda t: pa.table({
            "user_id": t.column("user_id"),
            "ts": t.column("ts"),
            "view_id": t.column("event_id"),
        }).filter(pc.equal(t.column("event_type"), "view")),
        batch_format="pyarrow",
    )
    out = asof_join(purchases, views, key="user_id", ts="ts",
                    num_buckets=16).to_pandas()
    out = out[["purchase_id", "view_id"]].copy()
    # no-match sentinel -1 on both sides: null string forms differ
    # between pandas and DuckDB and would break the value-hash compare;
    # purchase_id needs the int cast back because the union's null
    # padding upcasts it to float inside pandas bucket groups
    out["purchase_id"] = out["purchase_id"].astype("int64")
    out["view_id"] = out["view_id"].fillna(-1).astype("int64")
    return out.sort_values("purchase_id").reset_index(drop=True)


QUERIES["purchases_asof_last_view"] = purchases_asof_last_view
ORACLES["purchases_asof_last_view"] = """
    SELECT p.event_id AS purchase_id,
           CAST(COALESCE(v.event_id, -1) AS BIGINT) AS view_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    ORDER BY purchase_id
"""


def cms_value_by_event_type(sf_dir: str) -> pd.DataFrame:
    """Weighted Count-Min: total value (cents) per event_type estimated
    from a weighted sketch — the 'revenue heavy hitters' shape where the
    per-key weight is folded, not the row count."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    prepped = ds.map_batches(
        lambda t: pa.table({"event_type": t.column("event_type"),
                            "w": _cents(t.column("value"))}),
        batch_format="pyarrow",
    )
    blob = sketch_aggregate(prepped, "countmin", on="event_type", weight="w",
                            mode="bytes", width=1 << 14, depth=5)
    cm = CountMin.from_bytes(blob)
    cand_df = prepped.map_batches(
        lambda t: pa.table({"event_type": pc.unique(t.column("event_type"))}),
        batch_format="pyarrow",
    ).to_pandas()
    cand = sorted(cand_df["event_type"].unique())
    return pd.DataFrame({
        "event_type": cand,
        "est_value_cents": cm.estimate_batch(cand),
    }).sort_values("event_type").reset_index(drop=True)


QUERIES["cms_value_by_event_type"] = cms_value_by_event_type


def views_before_purchase(sf_dir: str) -> pd.DataFrame:
    """Keyed range join, SQL-checked: for every purchase event, how many
    'view' events the same user produced in the hour before it
    ([ts-1h, ts) — the classic attribution-window shape). Bucketed
    rank-encoded searchsorted interval join (stages/joins.py
    range_join), no per-row loop and no pairwise blowup."""
    from ..stages.joins import range_join

    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_type", "event_id"])
    purchases = ev.map_batches(
        lambda t: pa.table({
            "user_id": t.column("user_id"),
            "ts": t.column("ts"),
            "purchase_id": t.column("event_id"),
        }).filter(pc.equal(t.column("event_type"), "purchase")),
        batch_format="pyarrow",
    )
    views = ev.map_batches(
        lambda t: pa.table({
            "user_id": t.column("user_id"),
            "ts": t.column("ts"),
        }).filter(pc.equal(t.column("event_type"), "view")),
        batch_format="pyarrow",
    )
    out = range_join(purchases, views, key="user_id", left_ts="ts",
                     right_ts="ts", lo=pd.Timedelta(hours=-1),
                     hi=pd.Timedelta(0), how="count",
                     count_col="n_views_1h", num_buckets=16).to_pandas()
    out = out[["purchase_id", "n_views_1h"]].copy()
    out["purchase_id"] = out["purchase_id"].astype("int64")
    return out.sort_values("purchase_id").reset_index(drop=True)


QUERIES["views_before_purchase"] = views_before_purchase
ORACLES["views_before_purchase"] = """
    SELECT p.event_id AS purchase_id,
           CAST(COUNT(v.event_id) AS BIGINT) AS n_views_1h
    FROM events p
    LEFT JOIN events v
      ON v.user_id = p.user_id AND v.event_type = 'view'
     AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts < p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id ORDER BY purchase_id
"""


def revenue_by_nation(sf_dir: str) -> pd.DataFrame:
    """Composed-join flagship, SQL-checked: lineitem ⋈ orders (bucketed
    large×large hash join — both sides pre-projected to 2-3 columns and
    lineitem pre-reduced to integer revenue cents, so the shuffle
    carries 16 bytes/row) → customer→nation chained broadcast lookup
    (two `ray.put` dims, searchsorted per batch) → groupby(n_name).

    Revenue = extendedprice·(1−discount), rounded to cents per row
    before any aggregation (both sides integer from there)."""
    import ray
    from ray.data.aggregate import Count, Sum

    from ..stages.joins import bucket_hash_join

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def prep_li(t: pa.Table) -> pa.Table:
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        return pa.table({"okey": t.column("l_orderkey"),
                         "rev_cents": pa.array(cents)})

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"]) \
        .map_batches(lambda t: pa.table({"okey": t.column("o_orderkey"),
                                         "o_custkey": t.column("o_custkey")}),
                     batch_format="pyarrow")
    joined = bucket_hash_join(li.map_batches(prep_li, batch_format="pyarrow"),
                              orders, on="okey", num_buckets=32)

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    ck = np.argsort(cust["c_custkey"].to_numpy())
    nk = np.argsort(nat["n_nationkey"].to_numpy())
    dims_ref = ray.put((cust["c_custkey"].to_numpy()[ck],
                        cust["c_nationkey"].to_numpy()[ck],
                        nat["n_nationkey"].to_numpy()[nk],
                        nat["n_name"].to_numpy()[nk]))

    class NationName:
        def __init__(self):
            (self.ck, self.cn, self.nk, self.nn) = ray.get(dims_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({"n_name": pd.Series([], dtype="object"),
                                  "part_rev": pd.Series([], dtype="int64"),
                                  "part_n": pd.Series([], dtype="int64")})
            # the join emits schema-less empty blocks; empty dims: inner → drop all
            if "o_custkey" not in df.columns or not len(df) \
                    or not (len(self.ck) and len(self.nk)):
                return empty
            keys = df["o_custkey"].to_numpy()
            pos = np.minimum(np.searchsorted(self.ck, keys), len(self.ck) - 1)
            m1 = self.ck[pos] == keys
            natk = self.cn[pos]
            npos = np.minimum(np.searchsorted(self.nk, natk), len(self.nk) - 1)
            m = m1 & (self.nk[npos] == natk)  # inner-join semantics on dims
            # combiner: ≤25 partial rows per batch leave this stage (the
            # final groupby exchange is trivial instead of 600k rows)
            out = pd.DataFrame({
                "n_name": self.nn[npos][m],
                "rev_cents": df["rev_cents"].to_numpy()[m],
            }).groupby("n_name", as_index=False).agg(
                part_rev=("rev_cents", "sum"), part_n=("rev_cents", "size"))
            return out.astype({"part_rev": "int64", "part_n": "int64"})

    out = (
        joined.map_batches(NationName, batch_format="pandas",
                           concurrency=auto_concurrency())
        .groupby("n_name")
        .aggregate(Sum("part_rev", alias_name="revenue_cents"),
                   Sum("part_n", alias_name="n_items"))
        .to_pandas()
    )
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    out["n_items"] = out["n_items"].astype("int64")
    return out.sort_values("n_name").reset_index(drop=True)


QUERIES["revenue_by_nation"] = revenue_by_nation
ORACLES["revenue_by_nation"] = """
    SELECT n_name,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_cents,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
"""


def q6_forecast_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q6 shape, SQL-checked: filtered revenue aggregate with the
    predicate pushed INTO the parquet read (`ray.data.read_parquet`'s
    Arrow dataset ``filter`` prunes row groups before rows leave
    storage, and ``columns`` prunes to the 4 needed) — the demonstrator
    for read-side pruning; the surviving rows reduce with a per-batch
    integer-cents combiner."""
    import datetime

    import ray.data
    import pyarrow.dataset as pads

    expr = (
        (pads.field("l_shipdate") >= datetime.datetime(1995, 1, 1))
        & (pads.field("l_shipdate") < datetime.datetime(1996, 1, 1))
        & (pads.field("l_discount") >= 0.05)
        & (pads.field("l_discount") <= 0.07)
        & (pads.field("l_quantity") < 24.0)
    )
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"],
        filter=expr,
    )

    def partial(t: pa.Table) -> pa.Table:
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(price * disc * 100.0 + 0.5).astype(np.int64)
        return pa.table({"revenue_cents": pa.array([int(cents.sum())]),
                         "n": pa.array([t.num_rows])})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({
        "revenue_cents": [int(parts["revenue_cents"].sum())],
        "n": [int(parts["n"].sum())],
    })


QUERIES["q6_forecast_revenue"] = q6_forecast_revenue
ORACLES["q6_forecast_revenue"] = """
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_cents,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def sample_k_per_lang(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Deterministic per-group sample (k smallest doc_id per lang),
    SQL-checked: the distributed grouped top-k as a PURE COMBINER — each
    batch emits its own per-lang top-k (≤ langs×k rows), partials
    reduce on the driver; the document table itself never shuffles.
    top-k-by-id is the reproducible 'show me k docs per language'
    sample (same rows at any parallelism)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        lang = t.column("lang").to_numpy(zero_copy_only=False)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, lang))
        lang, ids = lang[order], ids[order]
        starts = np.nonzero(np.r_[True, lang[1:] != lang[:-1]])[0]
        ends = np.r_[starts[1:], len(lang)]
        if not len(starts):
            keep = np.empty(0, dtype=np.int64)
        else:
            keep = np.concatenate([np.arange(s, min(s + k, e))
                                   for s, e in zip(starts, ends)])
        return pa.table({"lang": pa.array(lang[keep]),
                         "doc_id": pa.array(ids[keep])})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.sort_values(["lang", "doc_id"]).groupby("lang").head(k)
    out = out.reset_index(drop=True)
    out["rank"] = out.groupby("lang").cumcount() + 1
    out["rank"] = out["rank"].astype("int64")
    return out[["lang", "doc_id", "rank"]]


QUERIES["sample_k_per_lang"] = sample_k_per_lang
ORACLES["sample_k_per_lang"] = """
    SELECT lang, doc_id, CAST(rn AS BIGINT) AS rank
    FROM (SELECT lang, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
          FROM documents)
    WHERE rn <= 10 ORDER BY lang, doc_id
"""


def user_overlap_view_purchase(sf_dir: str, k: int = 4096) -> pd.DataFrame:
    """Set-operation estimates between two user populations, SQL-checked:
    distinct viewers vs distinct purchasers via two bottom-k sketches +
    KMV combined-threshold set ops (Beyer et al. SIGMOD'07 — direct
    intersection, error ∝ union/√k, unlike HLL inclusion-exclusion).
    Below k distinct users the KMV sample IS the distinct set, so at
    test scales every output is EXACT and the SQL oracle hash-matches;
    at 100× the same pipeline degrades gracefully to the estimator."""
    from ..sketches.bottomk import BottomK, set_op_estimates

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    # ONE pass: each batch emits both sides' partial sketches (the read
    # is the expensive part at scale, the states are KBs)
    def part(t: pa.Table) -> pa.Table:
        out = []
        for ev in ("view", "purchase"):
            bk = BottomK(k)
            bk.add_batch(
                t.filter(pc.equal(t.column("event_type"), ev)).column("user_id"))
            out.append(bk.to_bytes())
        return pa.table({"view": pa.array([out[0]], type=pa.binary()),
                         "purchase": pa.array([out[1]], type=pa.binary())})

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    sides = {}
    for ev in ("view", "purchase"):
        bk = BottomK(k)
        for blob in parts[ev]:
            bk.merge(BottomK.from_bytes(blob))
        sides[ev] = bk
    est = set_op_estimates(sides["view"], sides["purchase"])
    return pd.DataFrame({
        "n_union": [int(round(est["union"]))],
        "n_intersection": [int(round(est["intersection"]))],
        "jaccard": [est["jaccard"]],
    })


QUERIES["user_overlap_view_purchase"] = user_overlap_view_purchase
ORACLES["user_overlap_view_purchase"] = """
    WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
         b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
         u AS (SELECT user_id FROM a UNION SELECT user_id FROM b),
         i AS (SELECT user_id FROM a INTERSECT SELECT user_id FROM b)
    SELECT (SELECT COUNT(*) FROM u) AS n_union,
           (SELECT COUNT(*) FROM i) AS n_intersection,
           CAST((SELECT COUNT(*) FROM i) AS DOUBLE)
             / (SELECT COUNT(*) FROM u) AS jaccard
"""


def hll_overlap_view_purchase(sf_dir: str, p: int = 14) -> pd.DataFrame:
    """HLL inclusion-exclusion twin of the exact/KMV
    ``user_overlap_view_purchase`` (VERDICT r02 item 10): the same two
    user populations sketched as HLLs in ONE pass (each batch emits both
    sides' partial states — KBs each; the read dominates at scale),
    max-merged, then |A∩B| ≈ |A| + |B| − |A∪B| via
    ``HLL.intersection_estimate`` and Jaccard via
    ``HLL.jaccard_estimate``. Rows-only driver entry — the estimator's
    published band vs the exact populations is enforced in pytest
    (intersection error is additive in the union's ±1.04/√m, the
    documented caveat vs KMV's direct estimator)."""
    from ..sketches.hll import HLL

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def part(t: pa.Table) -> pa.Table:
        blobs = []
        for ev in ("view", "purchase"):
            h = HLL(p)
            h.add_batch(
                t.filter(pc.equal(t.column("event_type"), ev)).column("user_id"))
            blobs.append(h.to_bytes())
        return pa.table({"view": pa.array([blobs[0]], type=pa.binary()),
                         "purchase": pa.array([blobs[1]], type=pa.binary())})

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    sides = {}
    for ev in ("view", "purchase"):
        h = HLL(p)
        for blob in parts[ev]:
            h.merge(HLL.from_bytes(blob))
        sides[ev] = h
    union = HLL.union([sides["view"], sides["purchase"]]).finalize()
    inter = HLL.intersection_estimate(sides["view"], sides["purchase"])
    return pd.DataFrame({
        "n_view_est": [int(sides["view"].finalize())],
        "n_purchase_est": [int(sides["purchase"].finalize())],
        "n_union_est": [int(union)],
        "n_intersection_est": [int(round(inter))],
        "jaccard_est": [HLL.jaccard_estimate(sides["view"],
                                             sides["purchase"])],
    })


QUERIES["hll_overlap_view_purchase"] = hll_overlap_view_purchase


def dedup_rate_by_source(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """Per-source duplication stats, SQL-checked: total docs vs exact
    distinct texts per source. The shuffle carries only (source, 64-bit
    content hash, length) rows; per-bucket lexsort/boundary counting
    gives exact grouped distincts without a per-group aggregate
    (content-hash collision bound as dedup_docs_exact)."""
    from ..stages.dedup import _splitmix64

    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def add_hash(t: pa.Table) -> pa.Table:
        from ..keys import canonical_flat_bytes
        from ..hashing import murmur64a

        data, offsets = canonical_flat_bytes(t.column("text"))
        h = murmur64a(data, offsets)
        ln = offsets[1:] - offsets[:-1]
        b = (_splitmix64(h) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({"source": t.column("source"),
                         "h": pa.array(h.astype(np.int64)),
                         "ln": pa.array(ln), "__b": pa.array(b)})

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        src = g["source"].to_numpy()
        h = g["h"].to_numpy()
        ln = g["ln"].to_numpy()
        order = np.lexsort((ln, h, src))
        src, h, ln = src[order], h[order], ln[order]
        new_s = np.r_[True, src[1:] != src[:-1]]
        new_d = new_s | np.r_[True, (h[1:] != h[:-1]) | (ln[1:] != ln[:-1])]
        starts = np.nonzero(new_s)[0]
        return pd.DataFrame({
            "source": src[starts],
            "part_docs": np.diff(np.r_[starts, len(src)]).astype(np.int64),
            "part_distinct": np.add.reduceat(new_d.astype(np.int64), starts),
        })

    # a text can only appear under ONE bucket, but the same source spans
    # buckets — final per-source sums over ≤ buckets×sources tiny rows
    parts = ds.map_batches(add_hash, batch_format="pyarrow") \
        .groupby("__b").map_groups(count_bucket, batch_format="pandas") \
        .to_pandas()
    out = parts.groupby("source", as_index=False).agg(
        n_docs=("part_docs", "sum"), n_distinct=("part_distinct", "sum"))
    out = out.astype({"n_docs": "int64", "n_distinct": "int64"})
    return out.sort_values("source").reset_index(drop=True)


QUERIES["dedup_rate_by_source"] = dedup_rate_by_source
ORACLES["dedup_rate_by_source"] = """
    SELECT source, COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct
    FROM documents GROUP BY source ORDER BY source
"""


def top10_words(sf_dir: str) -> pd.DataFrame:
    """Scale-true heavy hitters, SQL-checked: exact top-10 words over
    the exploded documents via the textbook two-pass — pass 1 folds a
    Misra–Gries summary (k=256 counters; any word with freq > n/257 is
    GUARANTEED in the candidates, any stream order/partitioning —
    PODS'12 mergeable summaries), pass 2 exactly recounts ONLY the
    candidates (broadcast `pc.is_in` filter + per-batch value_counts).
    Unlike an ExactSet vocabulary pass this never holds the vocabulary,
    so it survives unbounded vocabularies at 100 TB."""
    ds = _read(sf_dir, "documents", columns=["text"])

    def words_of(t: pa.Table) -> pa.Table:
        w = pc.split_pattern(
            pc.fill_null(t.column("text"), ""), " ").combine_chunks()
        return pa.table({"word": pc.list_flatten(w)})

    words = ds.map_batches(words_of, batch_format="pyarrow")
    blob = sketch_aggregate(words, "misragries", on="word", mode="bytes",
                            k=256)
    from ..sketches import MisraGries

    cands = [e.decode() for e, _ in MisraGries.from_bytes(blob).candidates()]
    if not cands:
        return pd.DataFrame({"word": [], "n": pd.Series([], dtype="int64")})
    cand_arr = pa.array(cands, type=pa.string())

    def recount(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.is_in(t.column("word"), value_set=cand_arr))
        vc = pc.value_counts(sel.column("word").combine_chunks())
        return pa.table({"word": vc.field("values"),
                         "part_n": vc.field("counts")})

    parts = words.map_batches(recount, batch_format="pyarrow").to_pandas()
    out = parts.groupby("word", as_index=False)["part_n"].sum() \
        .rename(columns={"part_n": "n"})
    out["n"] = out["n"].astype("int64")
    out = out.sort_values(["n", "word"], ascending=[False, True]).head(10)
    return out.reset_index(drop=True)


QUERIES["top10_words"] = top10_words
ORACLES["top10_words"] = """
    SELECT word, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    GROUP BY word ORDER BY n DESC, word LIMIT 10
"""


# ------------------------------------------------- training-data curation
def decontaminate_docs(sf_dir: str, n: int = 8) -> pd.DataFrame:
    """Train/eval decontamination — the canonical pre-training hygiene
    pass (GPT-3 appendix C / PaLM n-gram overlap shape): flag training
    documents that share any word n-gram with the eval split.

    Eval split = ``doc_id % 10 == 0`` (a deterministic stand-in for a
    benchmark suite).  The eval side is small BY CONSTRUCTION in real
    decontamination, so its distinct-gram set is folded once and
    broadcast via ``ray.put`` (Bloom for the O(1) probe + exact string
    set for collision-free verify); the train side streams through one
    ``map_batches`` with no shuffle — the only thing that scales with
    the corpus is the embarrassingly-parallel probe."""
    import ray

    from ..stages.curation import ContaminationFlag, collect_gram_broadcast

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def split(want_eval):
        def f(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            m = (ids % 10 == 0)
            return t.filter(pa.array(m if want_eval else ~m))
        return f

    ev = ds.map_batches(split(True), batch_format="pyarrow")
    bloom, grams = collect_gram_broadcast(ev, n)
    bloom_ref, grams_ref = ray.put(bloom), ray.put(grams)
    train = ds.map_batches(split(False), batch_format="pyarrow")
    out = train.map_batches(
        ContaminationFlag,
        fn_constructor_args=(bloom_ref, grams_ref, n),
        batch_format="pyarrow", concurrency=(2, 8), batch_size=512,
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


QUERIES["decontaminate_docs"] = decontaminate_docs
ORACLES["decontaminate_docs"] = """
    WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (
      SELECT doc_id, array_to_string(w[i:i+7], ' ') AS gram
      FROM ws, UNNEST(generate_series(1, len(w) - 7)) AS t(i)
    ),
    ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 0)
    SELECT g.doc_id, COUNT(DISTINCT g.gram) AS n_hit_grams
    FROM g JOIN ev USING (gram)
    WHERE g.doc_id % 10 <> 0
    GROUP BY g.doc_id ORDER BY g.doc_id
"""


def repetition_quality_docs(sf_dir: str) -> pd.DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1):
    per-doc top-word / top-bigram / duplicate-word fractions, computed
    entirely within each batch (factorize + lexsort/reduceat — zero
    shuffle, zero per-row Python).  Counts exact; fractions are doubles
    of exact integer ratios so the SQL oracle is bit-comparable."""
    from ..stages.curation import RepetitionStats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(RepetitionStats(), batch_format="pyarrow",
                         batch_size=1024).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


QUERIES["repetition_quality_docs"] = repetition_quality_docs
ORACLES["repetition_quality_docs"] = """
    WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    words AS (
      SELECT doc_id, unnest(w) AS word FROM ws
    ),
    wc AS (SELECT doc_id, word, COUNT(*) AS c FROM words GROUP BY doc_id, word),
    per AS (
      SELECT doc_id, SUM(c) AS n_words, COUNT(*) AS n_distinct_words,
             MAX(c) AS top_word_n
      FROM wc GROUP BY doc_id
    ),
    bg AS (
      SELECT doc_id, w[i] || ' ' || w[i+1] AS bigram
      FROM ws, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
    ),
    bc AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY doc_id, bigram),
    bper AS (
      SELECT doc_id, SUM(c) AS n_bigrams, MAX(c) AS top_bigram_n
      FROM bc GROUP BY doc_id
    )
    SELECT p.doc_id,
           CAST(p.n_words AS BIGINT) AS n_words,
           CAST(p.n_distinct_words AS BIGINT) AS n_distinct_words,
           CAST(p.top_word_n AS BIGINT) AS top_word_n,
           CAST(COALESCE(b.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(COALESCE(b.top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
           CAST(p.top_word_n AS DOUBLE)
             / CAST(p.n_words AS DOUBLE) AS top_word_frac,
           CAST(COALESCE(b.top_bigram_n, 0) AS DOUBLE)
             / CAST(GREATEST(COALESCE(b.n_bigrams, 0), 1) AS DOUBLE)
               AS top_bigram_frac,
           CAST(p.n_words - p.n_distinct_words AS DOUBLE)
             / CAST(p.n_words AS DOUBLE) AS dup_word_frac
    FROM per p LEFT JOIN bper b USING (doc_id)
    ORDER BY p.doc_id
"""


def scrub_docs(sf_dir: str) -> pd.DataFrame:
    """PII-scrub surface, SQL-checked end to end: a deterministic
    contact line (derived from doc_id — the corpus itself carries no
    PII) is appended to each document, then redacted with the standard
    email/phone/IP RE2 patterns via ``pc.replace_substring_regex``
    (pyarrow and DuckDB both run RE2, so ``regexp_replace(..., 'g')``
    reproduces the rewrite bit-for-bit).  Output is the full scrubbed
    text plus per-pattern match counts."""
    from ..stages.curation import PII_PATTERNS, ScrubText

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def inject(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        tail = ["  contact user%d@mail.example.com or 555-%04d from 10.0.%d.%d"
                % (i, i % 10000, (i >> 8) & 255, i & 255) for i in ids]
        txt = pc.binary_join_element_wise(
            pc.fill_null(t.column("text"), ""), pa.array(tail), "")
        return pa.table({"doc_id": t.column("doc_id"), "text": txt})

    out = ds.map_batches(inject, batch_format="pyarrow").map_batches(
        ScrubText(PII_PATTERNS,
                  count_cols=["n_email", "n_phone", "n_ip"]),
        batch_format="pyarrow", batch_size=1024).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


QUERIES["scrub_docs"] = scrub_docs
ORACLES["scrub_docs"] = r"""
    WITH injected AS (
      SELECT doc_id,
             text || '  contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail.example.com or 555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || ' from 10.0.' || CAST((doc_id // 256) % 256 AS VARCHAR)
                  || '.' || CAST(doc_id % 256 AS VARCHAR) AS text
      FROM documents
    ),
    s1 AS (
      SELECT doc_id,
             len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
             regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g') AS text
      FROM injected
    ),
    s2 AS (
      SELECT doc_id, n_email,
             len(regexp_extract_all(text, '\b\d{3}-\d{4}\b')) AS n_phone,
             regexp_replace(text, '\b\d{3}-\d{4}\b', '<PHONE>', 'g') AS text
      FROM s1
    )
    SELECT doc_id,
           regexp_replace(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                          '<IP>', 'g') AS scrubbed,
           CAST(n_email AS BIGINT) AS n_email,
           CAST(n_phone AS BIGINT) AS n_phone,
           CAST(len(regexp_extract_all(text,
                '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip
    FROM s2 ORDER BY doc_id
"""


def stratified_sample_docs(sf_dir: str) -> pd.DataFrame:
    """Class-balanced deterministic downsampling: pass 1 counts docs per
    language (per-batch Arrow combiner — only ≤ n_langs partial rows per
    batch leave the map stage), the keep-rate per language is sized to
    the smallest class, pass 2 filters with pure id arithmetic
    (``(doc_id·PRIME) mod 1000 < rate``) — reproducible at any
    parallelism with no RNG state, and exactly replicable in SQL."""
    import numpy as np

    from ..stages.curation import SAMPLE_PRIME, sample_keep_mask

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def part_counts(t: pa.Table) -> pa.Table:
        g = t.group_by("lang").aggregate([("doc_id", "count")])
        return g.rename_columns(["lang", "part_n"])

    parts = ds.map_batches(part_counts, batch_format="pyarrow").to_pandas()
    totals = parts.groupby("lang")["part_n"].sum()
    target = int(totals.min())
    rate = {lang: (1000 * target) // int(n) for lang, n in totals.items()}

    def keep(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        langs = t.column("lang").to_pandas()
        rates = langs.map(rate).to_numpy(dtype=np.int64)
        mask = sample_keep_mask(ids, rates)
        sel = t.filter(pa.array(mask))
        g = sel.group_by("lang").aggregate([("doc_id", "count")])
        return g.rename_columns(["lang", "part_sampled"])

    sampled = ds.map_batches(keep, batch_format="pyarrow").to_pandas()
    n_samp = sampled.groupby("lang")["part_sampled"].sum()
    out = pd.DataFrame({
        "lang": sorted(totals.index),
    })
    out["n_total"] = out["lang"].map(totals).astype("int64")
    out["rate_permille"] = out["lang"].map(rate).astype("int64")
    out["n_sampled"] = out["lang"].map(n_samp).fillna(0).astype("int64")
    return out


QUERIES["stratified_sample_docs"] = stratified_sample_docs
ORACLES["stratified_sample_docs"] = """
    WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    t AS (SELECT MIN(n) AS target FROM c),
    r AS (SELECT lang, n, (1000 * target) // n AS rate FROM c, t),
    s AS (
      SELECT d.lang, COUNT(*) AS ns
      FROM documents d JOIN r USING (lang)
      WHERE (d.doc_id * 2654435761) % 1000 < r.rate
      GROUP BY d.lang
    )
    SELECT r.lang,
           CAST(r.n AS BIGINT) AS n_total,
           CAST(r.rate AS BIGINT) AS rate_permille,
           CAST(COALESCE(s.ns, 0) AS BIGINT) AS n_sampled
    FROM r LEFT JOIN s USING (lang) ORDER BY r.lang
"""


def dup_ngram_rate_docs(sf_dir: str) -> pd.DataFrame:
    """Cross-document word-3-gram repetition rate per doc (the signal
    behind substring dedup / contamination filters — Lee et al. 2021):
    fraction of each doc's distinct shingles shared with ≥1 other doc.
    Zero-shuffle on the common path: df fold on the driver + one fused
    map_batches pass (see :func:`~raysketch.stages.dedup.crossdoc_gram_stats`)."""
    from ..stages.dedup import crossdoc_gram_stats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = crossdoc_gram_stats(ds, k=3).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


QUERIES["dup_ngram_rate_docs"] = dup_ngram_rate_docs
ORACLES["dup_ngram_rate_docs"] = """
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    pos AS (
      SELECT doc_id, words,
             unnest(range(1, greatest(len(words) - 1, 1))) AS p
      FROM w
    ),
    g AS (
      SELECT DISTINCT doc_id,
             list_extract(words, CAST(p AS INT)) || ' ' ||
             list_extract(words, CAST(p AS INT) + 1) || ' ' ||
             list_extract(words, CAST(p AS INT) + 2) AS gram
      FROM pos
    ),
    df AS (SELECT gram, COUNT(*) AS d FROM g GROUP BY gram),
    per AS (
      SELECT g.doc_id, COUNT(*) AS ng,
             SUM(CASE WHEN df.d > 1 THEN 1 ELSE 0 END) AS nsh
      FROM g JOIN df USING (gram) GROUP BY g.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(p.ng, 0) AS BIGINT) AS n_grams,
           CAST(COALESCE(p.nsh, 0) AS BIGINT) AS n_shared_grams,
           CAST(COALESCE(p.nsh, 0) AS DOUBLE)
             / CAST(GREATEST(COALESCE(p.ng, 0), 1) AS DOUBLE) AS shared_frac
    FROM documents d LEFT JOIN per p USING (doc_id)
    ORDER BY d.doc_id
"""

# token_count_docs / quality_docs oracles: pyarrow and DuckDB both run
# RE2, so regexp counts / class-replace lengths reproduce the
# vectorized stages bit-for-bit; ratios are doubles of exact integer
# ratios (identical IEEE divisions on both sides).
ORACLES["token_count_docs"] = r"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
             AS n_tokens_ws,
           CAST(
             len(regexp_extract_all(text,
               '''(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+'))
             + len(regexp_extract_all(text, '\s\s+\S'))
             + len(regexp_extract_all(text, '[^\S ]\S'))
             + len(regexp_extract_all(text, '\s+$'))
           AS BIGINT) AS n_tokens_bpe
    FROM documents ORDER BY doc_id
"""

ORACLES["quality_docs"] = r"""
    WITH t AS (
      SELECT doc_id,
             length(text) AS n_chars,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
             length(regexp_replace(text, '[A-Za-z0-9_ \t\n\f\r]', '', 'g'))
               AS n_punct
      FROM documents
    ),
    w AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
      FROM documents
    ),
    per AS (
      SELECT doc_id, COUNT(*) AS n_words,
             SUM(CASE WHEN word IN ('the','a','an','and','or','of','to','in',
                                    'is','are','was','were','be','been','it',
                                    'this','that','for','on','with','as')
                 THEN 1 ELSE 0 END) AS n_stop,
             SUM(length(word)) AS sum_wlen
      FROM w GROUP BY doc_id
    ),
    rep AS (
      SELECT doc_id, MAX(c) AS maxc FROM (
        SELECT doc_id, word, COUNT(*) AS c FROM w GROUP BY doc_id, word
      ) GROUP BY doc_id
    ),
    j AS (
      SELECT t.doc_id, t.n_chars, t.n_alpha, t.n_punct,
             COALESCE(p.n_words, 0) AS n_words,
             COALESCE(p.n_stop, 0) AS n_stop,
             COALESCE(p.sum_wlen, 0) AS sum_wlen,
             COALESCE(r.maxc, 0) AS maxc
      FROM t LEFT JOIN per p USING (doc_id) LEFT JOIN rep r USING (doc_id)
    )
    SELECT doc_id,
           CAST(n_alpha AS DOUBLE) / CAST(GREATEST(n_chars, 1) AS DOUBLE)
             AS alpha_ratio,
           CAST(n_stop AS DOUBLE) / CAST(GREATEST(n_words, 1) AS DOUBLE)
             AS stopword_ratio,
           CAST(maxc AS DOUBLE) / CAST(GREATEST(n_words, 1) AS DOUBLE)
             AS max_word_rep,
           CASE WHEN n_chars >= 20 AND n_chars <= 100000
                 AND CAST(n_alpha AS DOUBLE)
                       / CAST(GREATEST(n_chars, 1) AS DOUBLE) > 0.5
                 AND CAST(n_punct AS DOUBLE)
                       / CAST(GREATEST(n_chars, 1) AS DOUBLE) < 0.3
                 AND CAST(sum_wlen AS DOUBLE)
                       / CAST(GREATEST(n_words, 1) AS DOUBLE) > 2
                 AND CAST(sum_wlen AS DOUBLE)
                       / CAST(GREATEST(n_words, 1) AS DOUBLE) < 12
                 AND CAST(maxc AS DOUBLE)
                       / CAST(GREATEST(n_words, 1) AS DOUBLE) < 0.5
                THEN 1.0 ELSE 0.0 END AS quality_keep
    FROM j ORDER BY doc_id
"""


def pack_sequences_docs(sf_dir: str, seq_len: int = 2048) -> pd.DataFrame:
    """GPT-style sequence packing layout: documents are concatenated in
    doc_id order and cut into fixed ``seq_len``-token training bins;
    each doc's global token offset comes from a distributed ordered
    prefix scan (:func:`~raysketch.stages.scan.ordered_prefix_sum` —
    two-phase: driver-folded range-bucket totals, then ONE bucket
    shuffle of 16-byte (id, n_tokens) rows). Output: per doc its token
    count, start offset, and the first/last bin it lands in."""
    from ..stages.scan import ordered_prefix_sum
    from ..stages.textstats import TokenCount

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    counts = ds.map_batches(TokenCount(), batch_format="pyarrow",
                            batch_size=1024) \
        .select_columns(["doc_id", "n_tokens_ws"])
    out = ordered_prefix_sum(counts, "doc_id", "n_tokens_ws").to_pandas()
    out = out.rename(columns={"n_tokens_ws": "n_tokens",
                              "prefix": "tok_start"})
    n = out["n_tokens"].to_numpy()
    start = out["tok_start"].to_numpy()
    out["bin_first"] = start // seq_len
    out["bin_last"] = (start + np.maximum(n, 1) - 1) // seq_len
    return out.sort_values("doc_id").reset_index(drop=True)


QUERIES["pack_sequences_docs"] = pack_sequences_docs
ORACLES["pack_sequences_docs"] = r"""
    WITH c AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
               AS n_tokens
      FROM documents
    ),
    s AS (
      SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
      FROM c
    )
    SELECT doc_id, n_tokens, tok_start,
           CAST(tok_start // 2048 AS BIGINT) AS bin_first,
           CAST((tok_start + GREATEST(n_tokens, 1) - 1) // 2048 AS BIGINT)
             AS bin_last
    FROM s ORDER BY doc_id
"""


def late_events_watermark(sf_dir: str) -> pd.DataFrame:
    """Streaming-window semantics with an event-time watermark, Ray-
    Data-native: events arrive in event_id order, the watermark is the
    running max event time minus 10 min allowed lateness, and an event
    is LATE iff it arrives after the watermark passed its timestamp.
    The running max is a distributed ordered prefix scan
    (:func:`~raysketch.stages.scan.ordered_prefix_scan` ``op="max"`` —
    two-phase, one 16-byte-row bucket shuffle with event_type carried
    through), so "streaming" state needs no serial pass; the output is
    the hourly tumbling window each event belongs to with on-time /
    late counts — exactly what a watermark-driven window operator
    would emit plus its late-data side channel.

    The synthetic events table is perfectly time-ordered, so arrival
    order is a deterministic Knuth-multiplicative permutation of
    event_id (bijective mod 2^32 — unique scan keys for any id <
    2^32); that worst-case shuffled arrival genuinely exercises the
    late path on both engines identically."""
    from ..stages.scan import ordered_prefix_scan

    LATENESS_US = 600_000_000  # 10 min

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "event_type"])

    def to_us(t: pa.Table) -> pa.Table:
        ids = t.column("event_id").to_numpy(zero_copy_only=False)
        arrival = (ids.astype(np.uint64) * np.uint64(2654435761)
                   % np.uint64(1 << 32)).astype(np.int64)
        return pa.table({
            "arrival": pa.array(arrival),
            "ts_us": pc.cast(t.column("ts"), pa.int64()),
            "event_type": t.column("event_type"),
        })

    scanned = ordered_prefix_scan(
        ds.map_batches(to_us, batch_format="pyarrow"),
        "arrival", "ts_us", op="max", carry_cols=["event_type"])

    def finish(t: pa.Table) -> pa.Table:
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        prev = t.column("prefix").to_numpy(zero_copy_only=False)
        # identity (int64 min) for the first event can never exceed
        # ts + lateness, so the no-predecessor row is on-time
        late = prev > ts + LATENESS_US
        hour = (ts // 3_600_000_000) * 3_600_000_000
        return pa.table({
            "window_start": pa.array(hour).cast(pa.timestamp("us")),
            "event_type": t.column("event_type"),
            "n_ontime": pa.array((~late).astype(np.int64)),
            "n_late": pa.array(late.astype(np.int64)),
        })

    from ray.data.aggregate import Sum

    out = scanned.map_batches(finish, batch_format="pyarrow") \
        .groupby(["window_start", "event_type"]) \
        .aggregate(Sum("n_ontime", alias_name="n_ontime"),
                   Sum("n_late", alias_name="n_late"))
    out = out.to_pandas()
    out["n_ontime"] = out["n_ontime"].astype("int64")
    out["n_late"] = out["n_late"].astype("int64")
    return out.sort_values(["window_start", "event_type"]) \
        .reset_index(drop=True)


QUERIES["late_events_watermark"] = late_events_watermark
ORACLES["late_events_watermark"] = """
    WITH a AS (
      SELECT event_id, event_type, ts,
             MAX(ts) OVER (ORDER BY (event_id * 2654435761) % 4294967296
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS prev_max
      FROM events
    ),
    f AS (
      SELECT date_trunc('hour', ts) AS window_start, event_type,
             CASE WHEN prev_max IS NOT NULL
                   AND prev_max > ts + INTERVAL 10 MINUTE
                  THEN 1 ELSE 0 END AS late
      FROM a
    )
    SELECT window_start, event_type,
           CAST(SUM(1 - late) AS BIGINT) AS n_ontime,
           CAST(SUM(late) AS BIGINT) AS n_late
    FROM f GROUP BY 1, 2 ORDER BY 1, 2
"""


def tfidf_top_terms(sf_dir: str, vocab_cap: int = 2_000_000
                    ) -> pd.DataFrame:
    """Per-doc top-3 terms by tf·idf, ranked by the exact rational
    tf/df (monotone in tf·idf for a fixed corpus — both engines divide
    the same int64s as IEEE doubles, ties broken by term ascending, so
    the ranking is bit-reproducible vs ROW_NUMBER() OVER). Document
    frequencies fold on the driver (:func:`_fold_df_counts` over
    distinct (word, doc) hash rows) and broadcast; the ranking pass is
    one fused map_batches (:class:`~raysketch.stages.textstats.
    TopTfIdfTerms`) — term strings never shuffle, only the 3 winners
    per doc reach the driver. Past ``vocab_cap`` distinct terms the
    fold aborts and the query FALLS BACK to the two-exchange shuffle
    df-attach (:func:`~raysketch.stages.textstats.tfidf_topk_shuffle`,
    VERDICT r03 item 3) — equality locked by
    test_tfidf_fallback_equal."""
    import ray

    from ..stages.dedup import _fold_df_counts, _word_gram_rows
    from ..stages.textstats import TopTfIdfTerms, tfidf_topk_shuffle

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    tok = ds.map_batches(_word_gram_rows("text", "doc_id", 1),
                         batch_format="pyarrow")
    vocab = _fold_df_counts(tok, vocab_cap)
    if vocab is None:
        out = tfidf_topk_shuffle(ds, tok).to_pandas()
    else:
        out = ds.map_batches(
            TopTfIdfTerms, fn_constructor_args=(ray.put(vocab),),
            batch_format="pyarrow",
            concurrency=auto_concurrency()).to_pandas()
    return out.sort_values(["doc_id", "rank"]).reset_index(drop=True)


QUERIES["tfidf_top_terms"] = tfidf_top_terms
ORACLES["tfidf_top_terms"] = """
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    w2 AS (SELECT doc_id, term FROM w WHERE term <> ''),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM w2 GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM w2 GROUP BY term
    ),
    r AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id
               ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC, tf.term
             ) AS rank
      FROM tf JOIN df USING (term)
    )
    SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
           CAST(df AS BIGINT) AS df, CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 3 ORDER BY doc_id, rank
"""


def embedding_dedup_planted(sf_dir: str) -> pd.DataFrame:
    """Embedding near-dup with a SQL-checkable answer: exact copies of
    every 50th vector are planted in-query (vec_id + 1,000,000, same
    embedding — the corpus itself has max pairwise cosine ≈ 0.51 at
    sf0.01, far under the 0.95 threshold, so the planted pairs are the
    ONLY matches and each forms a 2-node component rooted at the
    original id). Hyperplane-LSH recall is exactly 1 for identical
    vectors (identical sign sketches share every band bucket), and the
    exact-cosine verify rejects anything else — so the component table
    is deterministic and the oracle is a plain O(n²) SQL cosine join.
    Output values are IDs only (the knn-oracle pattern): no float ever
    enters the value-hash."""
    from ..stages.dedup import embedding_dedup

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        sel = np.nonzero(ids % 50 == 0)[0]
        copies = t.take(pa.array(sel))
        copies = copies.set_column(
            copies.schema.get_field_index("vec_id"), "vec_id",
            pa.array(ids[sel] + 1_000_000))
        return pa.concat_tables([t, copies])

    aug = ds.map_batches(plant, batch_format="pyarrow")
    out = embedding_dedup(aug, threshold=0.95)
    out["vec_id"] = out["vec_id"].astype("int64")
    out["component"] = out["component"].astype("int64")
    return out.sort_values("vec_id").reset_index(drop=True)


QUERIES["embedding_dedup_planted"] = embedding_dedup_planted
ORACLES["embedding_dedup_planted"] = """
    WITH aug AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000, embedding FROM embeddings
      WHERE vec_id % 50 = 0
    ),
    p AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib
      FROM aug a JOIN aug b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])) >= 0.95
    )
    SELECT vec_id, component FROM (
      SELECT ia AS vec_id, ia AS component FROM p
      UNION ALL
      SELECT ib AS vec_id, ia AS component FROM p
    ) ORDER BY vec_id
"""


def chunk_docs(sf_dir: str) -> pd.DataFrame:
    """Embedding-prep document chunking: sliding word windows of size
    50 with stride 40 (10-word overlap), the standard RAG/embedding
    layout. Pure flat_map shape — fully vectorized per batch: one
    gather builds the (overlapping) chunk word lists as a fresh Arrow
    ListArray, ``pc.binary_join`` re-joins each chunk in C. No
    shuffle; output rows stream straight out of the map."""
    CHUNK, STRIDE = 50, 40

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def chunks(t: pa.Table) -> pa.Table:
        words_list = pc.split_pattern(
            pc.fill_null(t.column("text"), ""), " ").combine_chunks()
        nw = pc.list_value_length(words_list) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(words_list)
        woff = np.zeros(len(nw) + 1, dtype=np.int64)
        np.cumsum(nw, out=woff[1:])
        n_chunks = 1 + (np.maximum(nw - CHUNK, 0) + STRIDE - 1) // STRIDE
        coff = np.zeros(len(nw) + 1, dtype=np.int64)
        np.cumsum(n_chunks, out=coff[1:])
        total = int(coff[-1])
        doc_of = np.repeat(np.arange(len(nw), dtype=np.int64), n_chunks)
        k = np.arange(total, dtype=np.int64) - np.repeat(coff[:-1], n_chunks)
        start = k * STRIDE
        end = np.minimum(start + CHUNK, nw[doc_of])
        clen = end - start
        # gather indices: for chunk c, flat positions
        # [woff[doc]+start, woff[doc]+end)
        goff = np.zeros(total + 1, dtype=np.int64)
        np.cumsum(clen, out=goff[1:])
        gather = (np.repeat(woff[doc_of] + start, clen)
                  + np.arange(int(goff[-1]), dtype=np.int64)
                  - np.repeat(goff[:-1], clen))
        vals = flat.take(pa.array(gather))
        if goff[-1] < 2**31:
            lst = pa.ListArray.from_arrays(
                pa.array(goff, type=pa.int64()).cast(pa.int32()), vals)
        else:
            lst = pa.LargeListArray.from_arrays(pa.array(goff), vals)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[doc_of]),
            "chunk_idx": pa.array(k),
            "chunk_text": pc.binary_join(lst, " "),
            "n_words": pa.array(clen),
        })

    out = ds.map_batches(chunks, batch_format="pyarrow").to_pandas()
    return out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)


QUERIES["chunk_docs"] = chunk_docs
ORACLES["chunk_docs"] = """
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words,
             len(string_split(text, ' ')) AS nw
      FROM documents
    ),
    c AS (
      SELECT doc_id, words, nw,
             unnest(range(0, 1 + (greatest(nw - 50, 0) + 39) // 40)) AS k
      FROM w
    )
    SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
           array_to_string(list_slice(words, CAST(k * 40 + 1 AS INT),
                                      CAST(least(k * 40 + 50, nw) AS INT)),
                           ' ') AS chunk_text,
           CAST(least(k * 40 + 50, nw) - k * 40 AS BIGINT) AS n_words
    FROM c ORDER BY doc_id, chunk_idx
"""


def sorted_write_events(sf_dir: str) -> pd.DataFrame:
    """Globally-sorted resumable table layout: events range-bucketed
    by timestamp into per-bucket SORTED parquet files (one shuffle, no
    all-to-all sort op — :func:`~raysketch.stages.sortsink.
    sorted_partitioned_write`); the returned manifest (per-bucket row
    count + key min/max) is the binary-searchable index a downstream
    or resumed consumer reads instead of scanning. Bucket bounds are
    deterministic integer arithmetic, so the manifest is
    SQL-checkable."""
    import tempfile

    from ..stages.sortsink import sorted_partitioned_write

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "event_type"])

    def to_us(t: pa.Table) -> pa.Table:
        return t.append_column("ts_us", pc.cast(t.column("ts"), pa.int64()))

    out_dir = tempfile.mkdtemp(prefix="sorted_events_",
                               dir="/tmp/raysketch_data"
                               if os.path.isdir("/tmp/raysketch_data")
                               else None)
    m = sorted_partitioned_write(
        ds.map_batches(to_us, batch_format="pyarrow"), "ts_us", out_dir)
    return m[["bucket", "n_rows", "key_min", "key_max"]]


QUERIES["sorted_write_events"] = sorted_write_events
ORACLES["sorted_write_events"] = """
    WITH b AS (
      SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events
    ),
    t AS (
      SELECT ((epoch_us(ts) - lo) * 32) // (hi - lo + 1) AS bucket,
             epoch_us(ts) AS us
      FROM events, b
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           COUNT(*) AS n_rows,
           CAST(MIN(us) AS BIGINT) AS key_min,
           CAST(MAX(us) AS BIGINT) AS key_max
    FROM t GROUP BY 1 ORDER BY 1
"""


def top5_words_by_source(sf_dir: str) -> pd.DataFrame:
    """Grouped heavy hitters, SQL-checked: exact per-source top-5 words
    via the two-pass grouped Misra–Gries — pass 1 folds one mergeable
    MG summary PER SOURCE (``sketch_aggregate(by="source")``; per-batch
    partials mean the groupby merges ≤ n_batches×n_sources summary
    rows, never words), pass 2 exactly recounts only the candidate
    union (broadcast ``pc.is_in`` + per-batch value_counts combiner).
    Provable completeness guard: the recount keeps each source's exact
    candidate counts AND total word count; if the 5th-ranked exact
    count were ≤ the summary's tracked error bound the top-5 could be
    incomplete — the guard raises instead of returning silently wrong
    rows (never triggered on zipf-shaped text; an adversarial corpus
    needs a larger k)."""
    from ..agg import sketch_aggregate
    from ..sketches import MisraGries

    K = 64
    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def words_of(t: pa.Table) -> pa.Table:
        w = pc.split_pattern(
            pc.fill_null(t.column("text"), ""), " ").combine_chunks()
        n = pc.list_value_length(w).to_numpy(zero_copy_only=False)
        idx = np.repeat(np.arange(len(n), dtype=np.int64), n)
        return pa.table({"source": t.column("source").take(pa.array(idx)),
                         "word": pc.list_flatten(w)})

    words = ds.map_batches(words_of, batch_format="pyarrow").materialize()
    per_src = sketch_aggregate(words, "misragries", on="word",
                               by="source", mode="bytes", k=K).to_pandas()
    cands: dict[str, set[str]] = {}
    bounds: dict[str, int] = {}
    for _, r in per_src.iterrows():
        mg = MisraGries.from_bytes(r["misragries_merged"])
        cands[r["source"]] = {e.decode() for e, _ in mg.candidates()}
        bounds[r["source"]] = mg.error_bound()
    union = sorted(set().union(*cands.values())) if cands else []
    cand_arr = pa.array(union, type=pa.string())

    def recount(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.is_in(t.column("word"), value_set=cand_arr))
        # per-(source, word) partial counts + per-source totals, one
        # combiner emission per batch
        df_b = sel.to_pandas().groupby(["source", "word"]) \
            .size().reset_index(name="part_n")
        tot = t.to_pandas().groupby("source").size() \
            .reset_index(name="part_n")
        tot["word"] = "\x00"  # sentinel: split() can emit "" but never NUL
        return pa.Table.from_pandas(
            pd.concat([df_b, tot[["source", "word", "part_n"]]],
                      ignore_index=True), preserve_index=False)

    parts = words.map_batches(recount, batch_format="pyarrow").to_pandas()
    agg = parts.groupby(["source", "word"], as_index=False)["part_n"].sum()
    totals = dict(agg[agg["word"] == "\x00"][["source", "part_n"]].values)
    agg = agg[agg["word"] != "\x00"]
    out_rows = []
    for src in sorted(cands):
        g = agg[(agg["source"] == src)
                & agg["word"].isin(cands[src])] \
            .sort_values(["part_n", "word"], ascending=[False, True])
        top = g.head(5)
        if len(top) == 5 and int(top["part_n"].iloc[-1]) <= bounds[src]:
            raise RuntimeError(
                f"top-5 for {src!r} not provably complete "
                f"(5th count {int(top['part_n'].iloc[-1])} <= error bound "
                f"{bounds[src]}, n={totals.get(src)}) — increase k")
        for rank, (_, r) in enumerate(top.iterrows(), 1):
            out_rows.append((src, r["word"], int(r["part_n"]), rank))
    return pd.DataFrame(out_rows,
                        columns=["source", "word", "n", "rank"])


QUERIES["top5_words_by_source"] = top5_words_by_source
ORACLES["top5_words_by_source"] = """
    WITH w AS (
      SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    c AS (
      SELECT source, word, COUNT(*) AS n FROM w GROUP BY source, word
    ),
    r AS (
      SELECT source, word, n,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n DESC, word) AS rank
      FROM c
    )
    SELECT source, word, CAST(n AS BIGINT) AS n, CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 5 ORDER BY source, rank
"""


def minhash_dedup_planted(sf_dir: str) -> pd.DataFrame:
    """MinHash-LSH near-dup with a SQL-checkable answer: exact copies of
    every 10th document are planted in-query (doc_id + 10,000,000, same
    text), then ``minhash_dedup`` runs at threshold=1.0 with the exact
    char-5-gram verify. At Jaccard 1.0 the pipeline is deterministic
    regardless of hashing: a J=1.0 pair has IDENTICAL shingle sets, so
    both OPH signatures are identical, every band bucket matches, the
    pair is a guaranteed LSH candidate (recall exactly 1), and the exact
    verify (set equality -> jaccard == 1.0) rejects everything else.
    The result is therefore precisely the char-5-gram-set equality
    classes of size >= 2, rooted at the min doc_id — which a SQL oracle
    states directly by fingerprinting each doc's distinct 5-gram set
    (the corpus has no natural identical-gram-set pairs; the oracle
    would surface them if a future corpus did)."""
    from ..stages.dedup import minhash_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        sel = np.nonzero(ids % 10 == 0)[0]
        copies = t.take(pa.array(sel))
        copies = copies.set_column(
            copies.schema.get_field_index("doc_id"), "doc_id",
            pa.array(ids[sel] + 10_000_000))
        return pa.concat_tables([t, copies])

    aug = ds.map_batches(plant, batch_format="pyarrow")
    out = minhash_dedup(aug, shingle_k=5, threshold=1.0, verify="exact")
    out["doc_id"] = out["doc_id"].astype("int64")
    out["component"] = out["component"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


QUERIES["minhash_dedup_planted"] = minhash_dedup_planted
ORACLES["minhash_dedup_planted"] = """
    WITH aug AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 10000000, text FROM documents WHERE doc_id % 10 = 0
    ),
    g AS (
      SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), 5) AS gram
      FROM (
        SELECT doc_id, text,
               unnest(generate_series(1, length(text) - 4)) AS i
        FROM aug
      )
    ),
    fp AS (
      SELECT doc_id, string_agg(gram, chr(1) ORDER BY gram) AS f
      FROM g GROUP BY doc_id
    ),
    cls AS (
      SELECT doc_id,
             MIN(doc_id) OVER (PARTITION BY f) AS component,
             COUNT(*) OVER (PARTITION BY f) AS n
      FROM fp
    )
    SELECT doc_id, component FROM cls WHERE n > 1 ORDER BY doc_id
"""


def priority_sample_orders(sf_dir: str, k: int = 64) -> pd.DataFrame:
    """PRIORITY SAMPLING (Duffield–Lund–Thorup JACM'07) — the
    variance-near-optimal weighted sample for SUBSET-SUM estimation:
    priority q_i = w_i / u_i with u_i uniform, keep the k largest, and
    for any subset S, Σ_{i∈S∩sample} max(w_i, τ) (τ = the (k+1)-th
    priority) is an unbiased estimate of Σ_{i∈S} w_i. Here u_i is the
    SQL-expressible multiplicative hash (the length_weighted_sample
    convention), priorities are exact integer floor divisions
    q_fp = w·M // r, and the whole draw — sample AND threshold — is
    value-hash-checked by a ROW_NUMBER oracle. Distributed as a PURE
    COMBINER: the global top-(k+1) by priority is the top-(k+1) of the
    union of per-batch top-(k+1) partials, so the table never shuffles
    and merges are associative — the mergeable-sample property that
    makes this a sketch, not a query trick. Estimator invariants +
    exact-below-k behavior are pytest-locked."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    K = np.int64(2654435761)
    P = np.int64(1_000_000_007)
    M = np.int64(1_000_000)

    def partial(t: pa.Table) -> pa.Table:
        key = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        w = _cents(t.column("o_totalprice")).to_numpy(zero_copy_only=False)
        r = ((key * K) % P) % M + 1  # 1..M — pseudo-uniform u = r/M
        q = (w * M) // r
        order = np.lexsort((key, -q))[:k + 1]
        return pa.table({"o_orderkey": pa.array(key[order]),
                         "cents": pa.array(w[order]),
                         "priority_fp": pa.array(q[order])})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    order = np.lexsort((parts["o_orderkey"].to_numpy(),
                        -parts["priority_fp"].to_numpy()))
    top = parts.iloc[order[:k + 1]]
    tau = int(top["priority_fp"].iloc[k]) if len(top) > k else 0
    out = top.iloc[:k].copy()
    out["tau_fp"] = np.int64(tau)
    return out.sort_values("o_orderkey").reset_index(drop=True) \
        .astype({"o_orderkey": "int64", "cents": "int64",
                 "priority_fp": "int64", "tau_fp": "int64"})


QUERIES["priority_sample_orders"] = priority_sample_orders
ORACLES["priority_sample_orders"] = """
    WITH w AS (
      SELECT o_orderkey AS k,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    pr AS (
      SELECT k, cents,
             (cents * 1000000)
             // ((((k * 2654435761) % 1000000007) % 1000000) + 1) AS q
      FROM w
    ),
    rk AS (
      SELECT k, cents, q,
             ROW_NUMBER() OVER (ORDER BY q DESC, k) AS rn
      FROM pr
    )
    SELECT k AS o_orderkey, cents, CAST(q AS BIGINT) AS priority_fp,
           CAST(COALESCE((SELECT q FROM rk WHERE rn = 65), 0) AS BIGINT)
           AS tau_fp
    FROM rk WHERE rn <= 64 ORDER BY o_orderkey
"""


def normalize_text_docs(sf_dir: str) -> pd.DataFrame:
    """Unicode NFC normalization as a first-class curation operator,
    value-hash-checked: the corpus is pure ASCII (normalization would
    be vacuous), so every 5th doc gets a DECOMPOSED suffix planted
    in-query — 'cafe' + U+0301 combining acute (composes to é under
    NFC, shortening the string by one codepoint) + U+FB01 ﬁ ligature +
    U+00B2 ² (both NFC-invariant; they only fold under NFKC) — and the
    oracle constructs the identical suffix with chr(). One vectorized
    Arrow utf8_normalize pass (utf8proc) against DuckDB's
    nfc_normalize (also utf8proc): the full normalized TEXTS must
    hash identically, plus before/after codepoint counts proving the
    composition actually happened."""
    import unicodedata

    from ..hashing import arrow_to_flat_bytes

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    suffix = " cafe\u0301 \ufb01\u00b2"

    def norm(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        txt = pc.if_else(
            pa.array(ids % 5 == 0),
            pc.binary_join_element_wise(t.column("text"), suffix, ""),
            t.column("text")).combine_chunks()
        before = pc.utf8_length(txt)
        # ASCII rows are NFC-fixed points — flag non-ASCII rows with one
        # vectorized byte scan, pay the per-string normalize only there
        # (this build's Arrow utf8_normalize reorders but does NOT
        # compose e+U+0301 → é, so utf8proc-via-Arrow can't be the
        # composer; unicodedata matches DuckDB's nfc_normalize)
        data, offsets = arrow_to_flat_bytes(txt)
        tot = np.concatenate(([0], np.cumsum(data > 127, dtype=np.int64)))
        flagged = np.nonzero(tot[offsets[1:]] > tot[offsets[:-1]])[0]
        if len(flagged):
            vals = txt.to_pylist()
            for i in flagged:
                vals[i] = unicodedata.normalize("NFC", vals[i] or "")
            out = pa.array(vals, pa.string())
        else:
            out = txt
        return pa.table({"doc_id": t.column("doc_id"),
                         "n_before": pc.cast(before, pa.int64()),
                         "n_after": pc.cast(pc.utf8_length(out),
                                            pa.int64()),
                         "text_norm": out})

    out = ds.map_batches(norm, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


QUERIES["normalize_text_docs"] = normalize_text_docs
ORACLES["normalize_text_docs"] = """
    WITH aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0
                  THEN text || ' cafe' || chr(769) || ' ' || chr(64257)
                       || chr(178)
                  ELSE text END AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(length(t) AS BIGINT) AS n_before,
           CAST(length(nfc_normalize(t)) AS BIGINT) AS n_after,
           nfc_normalize(t) AS text_norm
    FROM aug ORDER BY doc_id
"""


def weighted_minhash_planted(sf_dir: str) -> pd.DataFrame:
    """The weighted-LSH pipeline with a full SQL oracle — the multiset
    twin of `minhash_dedup_planted`: exact copies of every 10th doc are
    planted (doc_id+10M) AND self-concatenations of every (10k+5)th doc
    (doc_id+20M, text || ' ' || text — same gram SET, ~doubled counts,
    weighted J≈0.5). At threshold=1.0 with verify="exact" +
    weighted=True the result is PRECISELY the char-5-gram MULTISET
    equality classes of size ≥ 2: weighted J=1 ⟺ identical multisets ⟹
    identical expanded sets ⟹ identical signatures ⟹ guaranteed LSH
    candidates (recall exactly 1), and the exact multiset verify
    rejects everything else — so the doubled-text plants are provably
    excluded (their multiset differs), which the oracle states by
    fingerprinting (gram, count) pairs. Deterministic regardless of
    hashing (the minhash_dedup_planted argument, multiset edition)."""
    from ..stages.dedup import minhash_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        sel = np.nonzero(ids % 10 == 0)[0]
        copies = t.take(pa.array(sel))
        copies = copies.set_column(
            copies.schema.get_field_index("doc_id"), "doc_id",
            pa.array(ids[sel] + 10_000_000))
        sel5 = np.nonzero(ids % 10 == 5)[0]
        doubled = t.take(pa.array(sel5))
        dtxt = pc.binary_join_element_wise(
            doubled.column("text"), doubled.column("text"), " ")
        doubled = doubled.set_column(
            doubled.schema.get_field_index("text"), "text", dtxt)
        doubled = doubled.set_column(
            doubled.schema.get_field_index("doc_id"), "doc_id",
            pa.array(ids[sel5] + 20_000_000))
        return pa.concat_tables([t, copies, doubled])

    aug = ds.map_batches(plant, batch_format="pyarrow")
    out = minhash_dedup(aug, shingle_k=5, threshold=1.0, verify="exact",
                        weighted=True)
    out["doc_id"] = out["doc_id"].astype("int64")
    out["component"] = out["component"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


QUERIES["weighted_minhash_planted"] = weighted_minhash_planted
ORACLES["weighted_minhash_planted"] = """
    WITH aug AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 10000000, text FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 20000000, text || ' ' || text
      FROM documents WHERE doc_id % 10 = 5
    ),
    g AS (
      SELECT doc_id, substr(text, CAST(i AS INTEGER), 5) AS gram
      FROM (
        SELECT doc_id, text,
               unnest(generate_series(1, length(text) - 4)) AS i
        FROM aug
      )
    ),
    c AS (
      SELECT doc_id, gram, COUNT(*) AS n FROM g GROUP BY doc_id, gram
    ),
    fp AS (
      SELECT doc_id,
             string_agg(gram || chr(2) || n, chr(1) ORDER BY gram) AS f
      FROM c GROUP BY doc_id
    ),
    cls AS (
      SELECT doc_id,
             MIN(doc_id) OVER (PARTITION BY f) AS component,
             COUNT(*) OVER (PARTITION BY f) AS nn
      FROM fp
    )
    SELECT doc_id, component FROM cls WHERE nn > 1 ORDER BY doc_id
"""


def events_lag_delta(sf_dir: str) -> pd.DataFrame:
    """Window NAVIGATION functions (LAG) as a distributed operator: per
    event, the time gap to the same user's previous event and that
    previous event's id — `LAG(x) OVER (PARTITION BY user ORDER BY ts)`.
    Same shape as sessionize: ONE hash-bucket shuffle on user (user
    count scales with data; a per-user groupby would pay Ray's
    per-group cost), then fully vectorized inside each bucket — one
    sort by (user, ts, event_id), shifted-array compare for the
    partition boundary, int64 microsecond deltas. First event of a
    user gets -1 (typed sentinel, not null — int64 survives pandas
    group frames; see CLAUDE.md null-upcast note)."""
    from ..stages.dedup import _splitmix64 as _mix64

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def add_bucket(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (_mix64(u) % np.uint64(64)).astype(np.int64)
        return t.append_column("__b", pa.array(b))

    def lag_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        uid = g["user_id"].to_numpy()
        eid = g["event_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        first = np.r_[True, uid[1:] != uid[:-1]]
        delta = np.r_[np.int64(0), ts[1:] - ts[:-1]]
        prev = np.r_[np.int64(0), eid[:-1]]
        delta[first] = -1
        prev[first] = -1
        return pd.DataFrame({
            "event_id": eid.astype(np.int64),
            "user_id": uid.astype(np.int64),
            "delta_us": delta,
            "prev_event_id": prev.astype(np.int64),
        })

    out = ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__b").map_groups(lag_bucket, batch_format="pandas")
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


QUERIES["events_lag_delta"] = events_lag_delta
ORACLES["events_lag_delta"] = """
    SELECT event_id, user_id,
           CAST(COALESCE(
             epoch_us(ts) - LAG(epoch_us(ts)) OVER w, -1) AS BIGINT)
             AS delta_us,
           CAST(COALESCE(LAG(event_id) OVER w, -1) AS BIGINT)
             AS prev_event_id
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY event_id
"""


def pivot_user_event_counts(sf_dir: str) -> pd.DataFrame:
    """PIVOT (long→wide) as a distributed operator: one row per user
    with a count column per event type. Scale shape: a per-batch
    COMBINER first reduces raw events to (user, type_idx, n) partial
    rows (≤ distinct pairs per batch — nothing row-level crosses the
    exchange), then ONE user-hash bucket shuffle, then fully
    vectorized wide assembly per bucket (lexsort + reduceat + scatter
    into the (users × types) count matrix). The type domain is
    validated against the hardcoded pivot columns so an unexpected
    category fails loudly instead of silently dropping counts."""
    from ..stages.dedup import _splitmix64 as _mix64

    TYPES = ["click", "error", "purchase", "signup", "view"]

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def combine(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        idx = pc.index_in(t.column("event_type"), value_set=pa.array(TYPES))
        if idx.null_count:
            raise ValueError("unexpected event_type outside pivot domain")
        et = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        key = uid * np.int64(len(TYPES)) + et
        uk, n = np.unique(key, return_counts=True)
        uu = uk // len(TYPES)
        b = (_mix64(uu.astype(np.uint64)) % np.uint64(64)).astype(np.int64)
        return pa.table({"user_id": pa.array(uu),
                         "ti": pa.array(uk % len(TYPES)),
                         "n": pa.array(n.astype(np.int64)),
                         "__b": pa.array(b)})

    def widen(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        ti = g["ti"].to_numpy()
        n = g["n"].to_numpy()
        users, urank = np.unique(uid, return_inverse=True)
        mat = np.zeros((len(users), len(TYPES)), dtype=np.int64)
        np.add.at(mat, (urank, ti), n)
        out = {"user_id": users.astype(np.int64)}
        for i, t in enumerate(TYPES):
            out[f"n_{t}"] = mat[:, i]
        return pd.DataFrame(out)

    out = ds.map_batches(combine, batch_format="pyarrow") \
        .groupby("__b").map_groups(widen, batch_format="pandas")
    return out.to_pandas().sort_values("user_id").reset_index(drop=True)


QUERIES["pivot_user_event_counts"] = pivot_user_event_counts
ORACLES["pivot_user_event_counts"] = """
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
           CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
           CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
           CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view
    FROM events GROUP BY user_id ORDER BY user_id
"""


def customer_order_stats(sf_dir: str) -> pd.DataFrame:
    """LEFT OUTER join + aggregate in ONE shuffle: every customer with
    their order count and total spend, customers with no orders kept at
    (0, 0) — the outer-join semantics `bucket_hash_join(how="left")`
    provides, expressed at scale: orders are combiner-reduced per batch
    to (custkey, n, cents) partials BEFORE the exchange (row volume ≈
    distinct customers per batch, never raw orders), both sides tagged
    with the same hash bucket, and each bucket task finishes the
    aggregate with lexsort + reduceat then a searchsorted left lookup
    against its customer keys. Monetary values stay integer cents on
    both sides (oracle invariant).

    The right side is restricted to URGENT orders (read-side predicate
    pushdown) — every customer in this corpus has *some* order, so
    without the restriction the unmatched branch would never fire; with
    it, customers lacking urgent orders genuinely exercise the outer
    zero-fill path."""
    import pyarrow.dataset as pads

    from ..stages.dedup import _splitmix64 as _mix64

    NB = 64

    def bucket_of(k):
        return (_mix64(k.astype(np.uint64)) % np.uint64(NB)).astype(np.int64)

    import ray.data

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice"],
        filter=pads.field("o_orderpriority") == "1-URGENT",
    )
    cust = _read(sf_dir, "customer", columns=["c_custkey"])

    def order_partials(t: pa.Table) -> pa.Table:
        k = t.column("o_custkey").to_numpy(zero_copy_only=False)
        cents = _cents(t.column("o_totalprice")).to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        k, cents = k[order], cents[order]
        new = np.r_[True, k[1:] != k[:-1]]
        starts = np.nonzero(new)[0]
        uk = k[starts]
        return pa.table({
            "custkey": pa.array(uk),
            "n": pa.array(np.diff(np.r_[starts, len(k)]).astype(np.int64)),
            "cents": pa.array(np.add.reduceat(cents, starts)),
            "__b": pa.array(bucket_of(uk)),
            "__side": pa.array(np.ones(len(uk), dtype=bool)),
        })

    def cust_rows(t: pa.Table) -> pa.Table:
        k = t.column("c_custkey").to_numpy(zero_copy_only=False)
        z = np.zeros(len(k), dtype=np.int64)
        return pa.table({
            "custkey": pa.array(k), "n": pa.array(z), "cents": pa.array(z),
            "__b": pa.array(bucket_of(k)),
            "__side": pa.array(np.zeros(len(k), dtype=bool)),
        })

    def finish_bucket(g: pd.DataFrame) -> pd.DataFrame:
        part = g[g["__side"]]
        ck = g[~g["__side"]]["custkey"].to_numpy(dtype=np.int64)
        pk = part["custkey"].to_numpy(dtype=np.int64)
        pn = part["n"].to_numpy(dtype=np.int64)
        pc_ = part["cents"].to_numpy(dtype=np.int64)
        order = np.argsort(pk, kind="stable")
        pk, pn, pc_ = pk[order], pn[order], pc_[order]
        new = np.r_[True, pk[1:] != pk[:-1]] if len(pk) else np.array([], bool)
        starts = np.nonzero(new)[0]
        uk = pk[starts]
        n_tot = np.add.reduceat(pn, starts) if len(starts) else pn
        c_tot = np.add.reduceat(pc_, starts) if len(starts) else pc_
        ck = np.sort(ck)
        n_out = np.zeros(len(ck), dtype=np.int64)
        c_out = np.zeros(len(ck), dtype=np.int64)
        if len(uk):
            pos = np.searchsorted(ck, uk)
            ok = (pos < len(ck)) & (ck[np.minimum(pos, len(ck) - 1)] == uk)
            n_out[pos[ok]] = n_tot[ok]
            c_out[pos[ok]] = c_tot[ok]
        return pd.DataFrame({"c_custkey": ck, "n_orders": n_out,
                             "sum_price_cents": c_out})

    both = orders.map_batches(order_partials, batch_format="pyarrow").union(
        cust.map_batches(cust_rows, batch_format="pyarrow"))
    out = both.groupby("__b").map_groups(finish_bucket, batch_format="pandas")
    return out.to_pandas().sort_values("c_custkey").reset_index(drop=True)


QUERIES["customer_order_stats"] = customer_order_stats
ORACLES["customer_order_stats"] = """
    SELECT c_custkey,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           CAST(COALESCE(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)), 0)
                AS BIGINT) AS sum_price_cents
    FROM customer LEFT JOIN (
      SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'
    ) o ON c_custkey = o_custkey
    GROUP BY c_custkey ORDER BY c_custkey
"""


def rollup_event_hourly(sf_dir: str) -> pd.DataFrame:
    """ROLLUP / grouping-sets operator: event counts + value sums at
    three levels — (event_type, hour), (event_type), grand total — in
    ONE distributed pass. Scale shape: raw events are combiner-reduced
    per batch to (hour, type, n, cents) partials (≤ finest-level
    cardinality per batch, ~3.6k keys at any sf, never raw rows), one
    hash-bucket shuffle finalizes the finest level, and the coarser
    rollup levels are exact re-aggregations of that small finest table
    (sums of sums) on the driver. Level markers are typed sentinels
    ('ALL', hour_us = -1), never nulls — the oracle states them with
    COALESCE over GROUP BY ROLLUP."""
    from ..stages.dedup import _splitmix64 as _mix64

    TYPES = ["click", "error", "purchase", "signup", "view"]
    NB = 64
    HOUR = np.int64(3_600_000_000)

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partials(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        hour = us // HOUR
        ti = pc.index_in(t.column("event_type"), value_set=pa.array(TYPES))
        if ti.null_count:
            raise ValueError("unexpected event_type outside rollup domain")
        ti = ti.to_numpy(zero_copy_only=False).astype(np.int64)
        cents = _cents(t.column("value")).to_numpy(zero_copy_only=False)
        key = hour * np.int64(len(TYPES)) + ti
        order = np.argsort(key, kind="stable")
        key, cents = key[order], cents[order]
        new = np.r_[True, key[1:] != key[:-1]]
        starts = np.nonzero(new)[0]
        uk = key[starts]
        b = (_mix64(uk.astype(np.uint64)) % np.uint64(NB)).astype(np.int64)
        return pa.table({
            "key": pa.array(uk),
            "n": pa.array(np.diff(np.r_[starts, len(key)]).astype(np.int64)),
            "cents": pa.array(np.add.reduceat(cents, starts)),
            "__b": pa.array(b),
        })

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        key = g["key"].to_numpy(dtype=np.int64)
        n = g["n"].to_numpy(dtype=np.int64)
        cents = g["cents"].to_numpy(dtype=np.int64)
        order = np.argsort(key, kind="stable")
        key, n, cents = key[order], n[order], cents[order]
        new = np.r_[True, key[1:] != key[:-1]]
        starts = np.nonzero(new)[0]
        uk = key[starts]
        return pd.DataFrame({
            "key": uk,
            "n": np.add.reduceat(n, starts),
            "cents": np.add.reduceat(cents, starts),
        })

    finest = ds.map_batches(partials, batch_format="pyarrow") \
        .groupby("__b").map_groups(finish, batch_format="pandas") \
        .to_pandas()  # ~3.6k rows: the finest level IS the small result
    finest["event_type"] = np.array(TYPES)[
        (finest["key"] % len(TYPES)).to_numpy()]
    finest["hour_us"] = (finest["key"] // len(TYPES)).to_numpy() * HOUR

    lvl0 = finest[["event_type", "hour_us", "n", "cents"]].copy()
    lvl1 = finest.groupby("event_type", as_index=False)[["n", "cents"]].sum()
    lvl1["hour_us"] = np.int64(-1)
    lvl2 = pd.DataFrame({"event_type": ["ALL"], "hour_us": [np.int64(-1)],
                         "n": [finest["n"].sum()],
                         "cents": [finest["cents"].sum()]})
    out = pd.concat([lvl0, lvl1, lvl2], ignore_index=True)
    out = out.rename(columns={"cents": "sum_value_cents"}).astype(
        {"hour_us": "int64", "n": "int64", "sum_value_cents": "int64"})
    return out[["event_type", "hour_us", "n", "sum_value_cents"]] \
        .sort_values(["event_type", "hour_us"]).reset_index(drop=True)


QUERIES["rollup_event_hourly"] = rollup_event_hourly
ORACLES["rollup_event_hourly"] = """
    SELECT COALESCE(event_type, 'ALL') AS event_type,
           CAST(COALESCE(epoch_us(hour), -1) AS BIGINT) AS hour_us,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS sum_value_cents
    FROM (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events
    )
    GROUP BY ROLLUP (event_type, hour)
    ORDER BY COALESCE(event_type, 'ALL'), CAST(COALESCE(epoch_us(hour), -1) AS BIGINT)
"""


def ntile_orders_by_price(sf_dir: str) -> pd.DataFrame:
    """Distributed NTILE(4): every order assigned its global price
    quartile without any all-to-all sort. The 0-based global rank is a
    prefix COUNT over a composite unique key (price_cents << 32 |
    orderkey — strict monotone in (price, orderkey) while orderkey <
    2^32; the guard raises past that, where the scan key would widen
    to a two-level split) via `ordered_prefix_scan` — driver-folded
    range-bucket partials plus ONE 16-byte-row bucket shuffle. Tile
    boundaries follow SQL NTILE semantics exactly (first n%k tiles get
    the extra row), computed vectorized from rank and the metadata-only
    total count."""
    from ..stages.scan import ordered_prefix_scan

    K = 4
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    n = ds.count()  # parquet metadata only
    q, r = divmod(n, K)

    def prep(t: pa.Table) -> pa.Table:
        okey = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        if len(okey) and okey.max() >= (1 << 32):
            raise ValueError("orderkey >= 2^32: widen the scan key")
        cents = _cents(t.column("o_totalprice")).to_numpy(zero_copy_only=False)
        return pa.table({
            "key": pa.array((cents << np.int64(32)) | okey),
            "one": pa.array(np.ones(len(okey), dtype=np.int64)),
            "o_orderkey": pa.array(okey),
        })

    scan = ordered_prefix_scan(
        ds.map_batches(prep, batch_format="pyarrow"),
        "key", "one", op="sum", carry_cols=["o_orderkey"])

    def tile_of(t: pa.Table) -> pa.Table:
        rank = t.column("prefix").to_numpy(zero_copy_only=False)
        if q == 0:
            tile = rank  # n < K: one row per tile, NTILE gives rank+1
        else:
            big = r * (q + 1)
            tile = np.where(rank < big, rank // (q + 1),
                            r + (rank - big) // max(q, 1))
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "tile": pa.array(tile.astype(np.int64))})

    out = scan.map_batches(tile_of, batch_format="pyarrow").to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


QUERIES["ntile_orders_by_price"] = ntile_orders_by_price
ORACLES["ntile_orders_by_price"] = """
    SELECT o_orderkey,
           CAST(NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) - 1
                AS BIGINT) AS tile
    FROM orders ORDER BY o_orderkey
"""


def events_window_frame(sf_dir: str) -> pd.DataFrame:
    """Window FRAME aggregate (``ROWS BETWEEN 3 PRECEDING AND CURRENT
    ROW``) as a distributed operator: per event, the running sum/count
    of the user's last ≤4 event values. Same single-shuffle shape as
    events_lag_delta: cents conversion happens BEFORE the exchange (the
    shuffle carries int64, never doubles), one hash-bucket shuffle on
    user, then fully vectorized inside each bucket — one sort, a
    partition-start vector via ``np.maximum.accumulate`` over the
    first-row mask, and the frame sum as a difference of two gathers
    into the zero-prefixed cumsum (no per-window loop)."""
    from ..stages.dedup import _splitmix64 as _mix64

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def add_bucket(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (_mix64(u) % np.uint64(64)).astype(np.int64)
        return pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "ts": t.column("ts"),
            "cents": _cents(t.column("value")),
            "__b": pa.array(b),
        })

    def frame_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        uid = g["user_id"].to_numpy()
        eid = g["event_id"].to_numpy()
        cents = g["cents"].to_numpy()
        n = len(g)
        first = np.r_[True, uid[1:] != uid[:-1]]
        start = np.maximum.accumulate(np.where(first, np.arange(n), 0))
        i = np.arange(n)
        ws = np.maximum(i - 3, start)
        csz = np.r_[np.int64(0), np.cumsum(cents)]
        return pd.DataFrame({
            "event_id": eid.astype(np.int64),
            "w_sum_cents": (csz[i + 1] - csz[ws]).astype(np.int64),
            "w_n": (i - ws + 1).astype(np.int64),
        })

    out = ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__b").map_groups(frame_bucket, batch_format="pandas")
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


QUERIES["events_window_frame"] = events_window_frame
ORACLES["events_window_frame"] = """
    SELECT event_id,
           CAST(SUM(cents) OVER w AS BIGINT) AS w_sum_cents,
           CAST(COUNT(*) OVER w AS BIGINT) AS w_n
    FROM (SELECT event_id, user_id, ts,
                 CAST(ROUND(value * 100) AS BIGINT) AS cents
          FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
"""


def price_discount_corr(sf_dir: str) -> pd.DataFrame:
    """Distributed Pearson correlation + OLS slope via EXACT integer
    moments — the combiner pattern taken to its limit: each batch
    reduces to six integers (n, Σx, Σy, Σx², Σy², Σxy over cent-scaled
    lineitem price/discount), the driver folds them with arbitrary-
    precision Python ints, and only the final one-row expression
    touches floats. Σx² would overflow int64 over ~1e5 rows of 1e7-cent
    prices, so each batch splits x² into (hi, lo) = divmod(x², 2^32)
    and sums the halves separately in int64 (hi ≤ 2.6e4/row, lo < 2^32
    — both safe past 1e9 rows/batch). The float expression is written
    identically in the SQL oracle (exact HUGEINT moments → one
    CAST/SQRT/divide tree), so correctly-rounded IEEE ops make the
    doubles match BIT-FOR-BIT — no tolerance needed."""
    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice", "l_discount"])

    def moments(t: pa.Table) -> pd.DataFrame:
        x = _cents(t.column("l_extendedprice")).to_numpy(zero_copy_only=False)
        y = _cents(t.column("l_discount")).to_numpy(zero_copy_only=False)
        xx = x * x
        hi, lo = xx >> np.int64(32), xx & np.int64((1 << 32) - 1)
        return pd.DataFrame([{
            "n": len(x), "sx": int(x.sum()), "sy": int(y.sum()),
            "sxx_hi": int(hi.sum()), "sxx_lo": int(lo.sum()),
            "syy": int((y * y).sum()), "sxy": int((x * y).sum()),
        }])

    p = ds.map_batches(moments, batch_format="pyarrow").to_pandas()
    n = int(p["n"].sum())
    sx, sy = int(p["sx"].sum()), int(p["sy"].sum())
    sxx = (int(p["sxx_hi"].sum()) << 32) + int(p["sxx_lo"].sum())
    syy, sxy = int(p["syy"].sum()), int(p["sxy"].sum())
    num = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    import math

    return _one_row(
        n=np.int64(n),
        corr_xy=float(num) / math.sqrt(float(varx) * float(vary)),
        slope_yx=float(num) / float(varx),
    )


QUERIES["price_discount_corr"] = price_discount_corr
ORACLES["price_discount_corr"] = """
    WITH m AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(x*x) AS HUGEINT) AS sxx,
             CAST(SUM(y*y) AS HUGEINT) AS syy,
             CAST(SUM(x*y) AS HUGEINT) AS sxy
      FROM (SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT) AS x,
                   CAST(ROUND(l_discount*100) AS BIGINT) AS y
            FROM lineitem))
    SELECT CAST(n AS BIGINT) AS n,
           CAST(n*sxy - sx*sy AS DOUBLE)
             / SQRT(CAST(n*sxx - sx*sx AS DOUBLE)
                    * CAST(n*syy - sy*sy AS DOUBLE)) AS corr_xy,
           CAST(n*sxy - sx*sy AS DOUBLE)
             / CAST(n*sxx - sx*sx AS DOUBLE) AS slope_yx
    FROM m
"""


def top_customer_by_nation(sf_dir: str) -> pd.DataFrame:
    """ARGMAX per group (``max_by`` / ``FIRST_VALUE``) as a pure
    combiner: each batch reduces customers to ≤1 row per nationkey
    (lexsort on (nation, -acctbal_cents, custkey), take group heads via
    ``np.unique(return_index)``), the driver folds the ≤25-row partials
    with the same vectorized argmax, then nation names come from a
    driver-read 25-row dim table — zero shuffles, nothing but partial
    winners ever leaves a task. Tie-break is total (max balance, then
    MIN custkey), so the result is deterministic and matches the
    ROW_NUMBER oracle exactly."""
    ds = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def head_rows(t: pa.Table) -> pd.DataFrame:
        nk = t.column("c_nationkey").to_numpy(zero_copy_only=False).astype(np.int64)
        ck = t.column("c_custkey").to_numpy(zero_copy_only=False)
        cents = _cents(t.column("c_acctbal")).to_numpy(zero_copy_only=False)
        order = np.lexsort((ck, -cents, nk))
        _, firsts = np.unique(nk[order], return_index=True)
        keep = order[firsts]
        return pd.DataFrame({"nk": nk[keep], "c_custkey": ck[keep],
                             "acctbal_cents": cents[keep]})

    p = ds.map_batches(head_rows, batch_format="pyarrow").to_pandas()
    nk = p["nk"].to_numpy()
    ck = p["c_custkey"].to_numpy()
    cents = p["acctbal_cents"].to_numpy()
    order = np.lexsort((ck, -cents, nk))
    _, firsts = np.unique(nk[order], return_index=True)
    keep = order[firsts]
    nation = pd.read_parquet(os.path.join(sf_dir, "nation.parquet"),
                             columns=["n_nationkey", "n_name"])
    names = nation.set_index("n_nationkey")["n_name"]
    out = pd.DataFrame({
        "n_name": names.loc[nk[keep]].to_numpy(),
        "c_custkey": ck[keep].astype(np.int64),
        "acctbal_cents": cents[keep].astype(np.int64),
    })
    return out.sort_values("n_name").reset_index(drop=True)


QUERIES["top_customer_by_nation"] = top_customer_by_nation
ORACLES["top_customer_by_nation"] = """
    SELECT n_name, CAST(c_custkey AS BIGINT) AS c_custkey,
           CAST(ROUND(c_acctbal*100) AS BIGINT) AS acctbal_cents
    FROM (SELECT n_name, c_custkey, c_acctbal,
                 ROW_NUMBER() OVER (PARTITION BY c_nationkey
                   ORDER BY ROUND(c_acctbal*100) DESC, c_custkey) AS rn
          FROM customer JOIN nation ON c_nationkey = n_nationkey)
    WHERE rn = 1 ORDER BY n_name
"""


def user_set_ops(sf_dir: str) -> pd.DataFrame:
    """Exact distributed set algebra (EXCEPT / INTERSECT / symmetric
    difference) over the distinct viewer and purchaser user sets: each
    batch dedups (user, side-bit) pairs before the exchange, ONE
    user-hash bucket shuffle of 16-byte rows, then each bucket ORs the
    side bits per user (sort + ``np.bitwise_or.reduceat``) and counts
    membership classes — users never co-reside anywhere, so the
    KMV-estimate twin (user_overlap_view_purchase) can fall back to
    this path exactly when a bucket's keys fit a task at any scale."""
    import ray.data

    from ..stages.dedup import _splitmix64 as _mix64

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"]) \
        .filter(expr="event_type == 'view' or event_type == 'purchase'")

    def tag(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        bit = pc.equal(t.column("event_type"), "purchase").to_numpy(
            zero_copy_only=False).astype(np.int64) + 1  # view→1, purchase→2
        key = u * 4 + bit
        uk = np.unique(key)
        uu = uk >> 2
        b = (_mix64(uu.astype(np.uint64)) % np.uint64(64)).astype(np.int64)
        return pa.table({"user": pa.array(uu), "bit": pa.array(uk & 3),
                         "__b": pa.array(b)})

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user"].to_numpy()
        bit = g["bit"].to_numpy()
        order = np.argsort(u, kind="stable")
        u, bit = u[order], bit[order]
        starts = np.r_[0, np.flatnonzero(u[1:] != u[:-1]) + 1]
        flags = np.bitwise_or.reduceat(bit, starts)
        return pd.DataFrame([{
            "view_only": int((flags == 1).sum()),
            "purchase_only": int((flags == 2).sum()),
            "both": int((flags == 3).sum()),
        }])

    p = ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__b").map_groups(classify, batch_format="pandas").to_pandas()
    return _one_row(
        n_view_only=np.int64(p["view_only"].sum()),
        n_purchase_only=np.int64(p["purchase_only"].sum()),
        n_both=np.int64(p["both"].sum()),
    )


QUERIES["user_set_ops"] = user_set_ops
ORACLES["user_set_ops"] = """
    WITH v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
         p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT
      CAST((SELECT COUNT(*) FROM (SELECT user_id FROM v EXCEPT SELECT user_id FROM p)) AS BIGINT) AS n_view_only,
      CAST((SELECT COUNT(*) FROM (SELECT user_id FROM p EXCEPT SELECT user_id FROM v)) AS BIGINT) AS n_purchase_only,
      CAST((SELECT COUNT(*) FROM (SELECT user_id FROM v INTERSECT SELECT user_id FROM p)) AS BIGINT) AS n_both
"""


def big_orders_having(sf_dir: str, min_qty: float = 150.0) -> pd.DataFrame:
    """GROUP BY + HAVING + join-back (TPC-H Q18 shape): orders whose
    total lineitem quantity exceeds a threshold, annotated with the
    order's customer and price. Lineitem is combiner-reduced per batch
    to (orderkey, qty_cents) partials before ONE bucket shuffle; each
    bucket finishes the sum and applies the HAVING filter, so what
    survives is small BY CONTRACT (the threshold exists to select
    outliers) — that qualifying set is then broadcast (``ray.put``
    once, searchsorted per batch) into a streaming pass over orders
    instead of shuffling the big orders table. At a scale where the
    HAVING output itself outgrows a broadcast, swap the last step for
    stages.joins.bucket_hash_join on orderkey — same bucket key as the
    aggregate, so the orders side would be the only new exchange."""
    import ray

    from ..stages.dedup import _splitmix64 as _mix64

    NB = 64
    thresh = int(round(min_qty * 100))
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def partials(t: pa.Table) -> pa.Table:
        k = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        q = _cents(t.column("l_quantity")).to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        k, q = k[order], q[order]
        starts = np.r_[0, np.flatnonzero(k[1:] != k[:-1]) + 1]
        uk = k[starts]
        return pa.table({
            "okey": pa.array(uk),
            "qty": pa.array(np.add.reduceat(q, starts)),
            "__b": pa.array((_mix64(uk.astype(np.uint64)) % np.uint64(NB)).astype(np.int64)),
        })

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        k = g["okey"].to_numpy(dtype=np.int64)
        q = g["qty"].to_numpy(dtype=np.int64)
        order = np.argsort(k, kind="stable")
        k, q = k[order], q[order]
        starts = np.r_[0, np.flatnonzero(k[1:] != k[:-1]) + 1]
        uk = k[starts]
        tot = np.add.reduceat(q, starts)
        keep = tot > thresh
        return pd.DataFrame({"okey": uk[keep], "qty": tot[keep]})

    qual = li.map_batches(partials, batch_format="pyarrow") \
        .groupby("__b").map_groups(finish, batch_format="pandas").to_pandas()
    keys = np.sort(qual["okey"].to_numpy(dtype=np.int64))
    qty = qual.set_index("okey")["qty"].loc[keys].to_numpy(dtype=np.int64)
    ref = ray.put((keys, qty))

    class AttachQualified:
        def __init__(self, ref):
            self.keys, self.qty = ray.get(ref)

        def __call__(self, t: pa.Table) -> pd.DataFrame:
            k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self.keys, k)
            pos_c = np.minimum(pos, max(len(self.keys) - 1, 0))
            hit = (len(self.keys) > 0) & (pos < len(self.keys)) \
                & (self.keys[pos_c] == k)
            price = _cents(t.column("o_totalprice")).to_numpy(zero_copy_only=False)
            ck = t.column("o_custkey").to_numpy(zero_copy_only=False)
            return pd.DataFrame({
                "o_orderkey": k[hit].astype(np.int64),
                "o_custkey": ck[hit].astype(np.int64),
                "price_cents": price[hit],
                "sum_qty_cents": self.qty[pos[hit]] if hit.any()
                    else np.array([], dtype=np.int64),
            })

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice"])
    out = orders.map_batches(AttachQualified, fn_constructor_args=(ref,),
                             batch_format="pyarrow",
                             concurrency=auto_concurrency()).to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


QUERIES["big_orders_having"] = big_orders_having
ORACLES["big_orders_having"] = """
    SELECT CAST(l_orderkey AS BIGINT) AS o_orderkey,
           CAST(o_custkey AS BIGINT) AS o_custkey,
           CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_cents,
           CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_cents
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_orderkey, o_custkey, o_totalprice
    HAVING SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) > 15000
    ORDER BY o_orderkey
"""


def percent_rank_orders(sf_dir: str) -> pd.DataFrame:
    """PERCENT_RANK + CUME_DIST over a global ordering WITHOUT an
    all-to-all sort: the 0-based global rank of each order under
    (price, orderkey) comes from the same `ordered_prefix_scan`
    composite-key prefix COUNT that powers ntile_orders_by_price; the
    two window values are then pure vectorized arithmetic on (rank, n)
    — and because the composite key is tie-free, SQL's rank-with-peers
    definitions reduce to exactly rank/(n-1) and (rank+1)/n, computed
    as single IEEE divisions of exactly-representable integers on both
    sides, so the doubles match bit-for-bit."""
    from ..stages.scan import ordered_prefix_scan

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    n = ds.count()  # parquet metadata only

    def prep(t: pa.Table) -> pa.Table:
        okey = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        if len(okey) and okey.max() >= (1 << 32):
            raise ValueError("orderkey >= 2^32: widen the scan key")
        cents = _cents(t.column("o_totalprice")).to_numpy(zero_copy_only=False)
        return pa.table({
            "key": pa.array((cents << np.int64(32)) | okey),
            "one": pa.array(np.ones(len(okey), dtype=np.int64)),
            "o_orderkey": pa.array(okey),
        })

    scan = ordered_prefix_scan(
        ds.map_batches(prep, batch_format="pyarrow"),
        "key", "one", op="sum", carry_cols=["o_orderkey"])

    def windows(t: pa.Table) -> pa.Table:
        rank = t.column("prefix").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "pct_rank": pa.array(rank / max(n - 1, 1)),
            "cume_dist": pa.array((rank + 1.0) / n),
        })

    out = scan.map_batches(windows, batch_format="pyarrow").to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


def events_range_window(sf_dir: str) -> pd.DataFrame:
    """Time-RANGE window frame (``RANGE BETWEEN INTERVAL 1 HOUR
    PRECEDING AND CURRENT ROW``) — variable-width and peer-INCLUSIVE,
    unlike the fixed ROWS frame of events_window_frame: per event, the
    sum/count of the same user's event cents in the trailing hour,
    where rows sharing the current timestamp (peers) are in-frame even
    when physically later. One user-hash bucket shuffle; inside a
    bucket, partitions are disjoint segments of one sorted array offset
    by partition_index × (span + window) so a single global
    ``np.searchsorted`` yields every frame's [left, right) bounds —
    left = first ts ≥ ts−1h, right = past-the-peers — and the frame
    aggregates are cumsum-gather differences. No per-row or per-window
    loop anywhere."""
    from ..stages.dedup import _splitmix64 as _mix64

    HOUR = np.int64(3_600_000_000)  # µs

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def add_bucket(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (_mix64(u) % np.uint64(64)).astype(np.int64)
        return pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "ts": t.column("ts"),
            "cents": _cents(t.column("value")),
            "__b": pa.array(b),
        })

    def range_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        uid = g["user_id"].to_numpy()
        eid = g["event_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        cents = g["cents"].to_numpy()
        n = len(g)
        first = np.r_[True, uid[1:] != uid[:-1]]
        pidx = np.cumsum(first) - 1  # 0-based partition index
        span = (ts.max() - ts.min() + HOUR + 1) if n else np.int64(1)
        adj = ts + pidx * (span + HOUR + 1)
        left = np.searchsorted(adj, adj - HOUR, side="left")
        right = np.searchsorted(adj, adj, side="right")  # include peers
        csz = np.r_[np.int64(0), np.cumsum(cents)]
        return pd.DataFrame({
            "event_id": eid.astype(np.int64),
            "hr_sum_cents": (csz[right] - csz[left]).astype(np.int64),
            "hr_n": (right - left).astype(np.int64),
        })

    out = ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__b").map_groups(range_bucket, batch_format="pandas")
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


def hash_sample_orders(sf_dir: str, pct: int = 5) -> pd.DataFrame:
    """Deterministic distributed Bernoulli sampling: keep ~pct% of
    orders by a pure hash condition on the key (Knuth multiplicative
    hash mod 100) — embarrassingly parallel, zero shuffle, and unlike
    ``ds.random_sample`` the result is REPRODUCIBLE at any parallelism
    and expressible in SQL, so the sample itself is oracle-checked.
    This is the sampling primitive the curation pipeline's audit holds
    use: the same row survives on every cluster size, so downstream
    runs can be diffed run-to-run."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    K = np.int64(2654435761)  # Knuth multiplicative constant

    def keep(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        m = ((k * K) % np.int64(1_000_000_007)) % np.int64(100) < pct
        return pa.table({
            "o_orderkey": pa.array(k[m]),
            "price_cents": pa.array(
                _cents(t.column("o_totalprice")).to_numpy(zero_copy_only=False)[m]),
        })

    out = ds.map_batches(keep, batch_format="pyarrow").to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


QUERIES["hash_sample_orders"] = hash_sample_orders
ORACLES["hash_sample_orders"] = """
    SELECT o_orderkey,
           CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_cents
    FROM orders
    WHERE ((o_orderkey * 2654435761) % 1000000007) % 100 < 5
    ORDER BY o_orderkey
"""


def customers_with_urgent_orders(sf_dir: str) -> pd.DataFrame:
    """SEMI join as a first-class query: customers having ≥1 URGENT
    order, via `stages.joins.bucket_semi_join` — the shuffle-based path
    (each side bucketed by key hash, per-bucket membership check) that
    stays correct when the key set outgrows a broadcast. The right side
    is pruned to (key-only, URGENT rows) at the READ, so the exchange
    carries 8-byte keys, never order rows."""
    import pyarrow.dataset as pads

    import ray.data

    from ..stages.joins import bucket_semi_join

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])

    def to_key(t: pa.Table) -> pa.Table:
        return pa.table({"c_custkey": pc.unique(t.column("o_custkey"))})

    urgent = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey"],
        filter=pads.field("o_orderpriority") == "1-URGENT",
    ).map_batches(to_key, batch_format="pyarrow")

    out = bucket_semi_join(cust, urgent, on="c_custkey").to_pandas()
    out["acctbal_cents"] = np.round(out.pop("c_acctbal") * 100).astype(np.int64)
    return out.sort_values("c_custkey").reset_index(drop=True)


QUERIES["customers_with_urgent_orders"] = customers_with_urgent_orders
ORACLES["customers_with_urgent_orders"] = """
    SELECT c_custkey, CAST(ROUND(c_acctbal*100) AS BIGINT) AS acctbal_cents
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders
                        WHERE o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
"""


def cube_event_dow(sf_dir: str) -> pd.DataFrame:
    """CUBE grouping sets — all FOUR subsets of (event_type, weekday)
    in one distributed pass (vs ROLLUP's prefix chain in
    rollup_event_hourly): per-batch combiner reduces raw events to
    finest-level (type, dow) partials (≤35 keys per batch), one
    hash-bucket shuffle finalizes the finest level, and every coarser
    grouping set — (type), (dow), () — is an exact sum-of-sums over
    that 35-row table on the driver. Weekday is computed vectorized
    from the µs epoch ((days+4) % 7, Sunday=0 — matching DuckDB's
    ``dayofweek``); typed sentinels ('ALL', -1), never nulls."""
    from ..stages.dedup import _splitmix64 as _mix64

    TYPES = ["click", "error", "purchase", "signup", "view"]
    NB = 16
    DAY = np.int64(86_400_000_000)

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partials(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        dow = (us // DAY + 4) % 7  # 1970-01-01 = Thursday; Sunday = 0
        ti = pc.index_in(t.column("event_type"), value_set=pa.array(TYPES))
        if ti.null_count:
            raise ValueError("unexpected event_type outside cube domain")
        ti = ti.to_numpy(zero_copy_only=False).astype(np.int64)
        cents = _cents(t.column("value")).to_numpy(zero_copy_only=False)
        key = dow * np.int64(len(TYPES)) + ti
        order = np.argsort(key, kind="stable")
        key, cents = key[order], cents[order]
        starts = np.r_[0, np.flatnonzero(key[1:] != key[:-1]) + 1]
        uk = key[starts]
        b = (_mix64(uk.astype(np.uint64)) % np.uint64(NB)).astype(np.int64)
        return pa.table({
            "key": pa.array(uk),
            "n": pa.array(np.diff(np.r_[starts, len(key)]).astype(np.int64)),
            "cents": pa.array(np.add.reduceat(cents, starts)),
            "__b": pa.array(b),
        })

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        key = g["key"].to_numpy(dtype=np.int64)
        n = g["n"].to_numpy(dtype=np.int64)
        cents = g["cents"].to_numpy(dtype=np.int64)
        order = np.argsort(key, kind="stable")
        key, n, cents = key[order], n[order], cents[order]
        starts = np.r_[0, np.flatnonzero(key[1:] != key[:-1]) + 1]
        return pd.DataFrame({
            "key": key[starts],
            "n": np.add.reduceat(n, starts),
            "cents": np.add.reduceat(cents, starts),
        })

    finest = ds.map_batches(partials, batch_format="pyarrow") \
        .groupby("__b").map_groups(finish, batch_format="pandas").to_pandas()
    finest["event_type"] = np.array(TYPES)[(finest["key"] % len(TYPES)).to_numpy()]
    finest["dow"] = (finest["key"] // len(TYPES)).astype(np.int64)

    lvl_td = finest[["event_type", "dow", "n", "cents"]].copy()
    lvl_t = finest.groupby("event_type", as_index=False)[["n", "cents"]].sum()
    lvl_t["dow"] = np.int64(-1)
    lvl_d = finest.groupby("dow", as_index=False)[["n", "cents"]].sum()
    lvl_d["event_type"] = "ALL"
    lvl_all = pd.DataFrame({"event_type": ["ALL"], "dow": [np.int64(-1)],
                            "n": [finest["n"].sum()],
                            "cents": [finest["cents"].sum()]})
    out = pd.concat([lvl_td, lvl_t, lvl_d, lvl_all], ignore_index=True)
    out = out.rename(columns={"cents": "sum_value_cents"}).astype(
        {"dow": "int64", "n": "int64", "sum_value_cents": "int64"})
    return out[["event_type", "dow", "n", "sum_value_cents"]] \
        .sort_values(["event_type", "dow"]).reset_index(drop=True)


QUERIES["cube_event_dow"] = cube_event_dow
ORACLES["cube_event_dow"] = """
    SELECT COALESCE(event_type, 'ALL') AS event_type,
           CAST(COALESCE(dow, -1) AS BIGINT) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS sum_value_cents
    FROM (SELECT event_type, dayofweek(ts) AS dow,
                 CAST(ROUND(value * 100) AS BIGINT) AS cents
          FROM events)
    GROUP BY CUBE (event_type, dow)
    ORDER BY COALESCE(event_type, 'ALL'), CAST(COALESCE(dow, -1) AS BIGINT)
"""


def unpivot_lineitem_measures(sf_dir: str) -> pd.DataFrame:
    """UNPIVOT (wide→long) — the inverse of pivot_user_event_counts:
    each 1995-shipped lineitem row becomes four (measure, cents) rows
    for quantity / extendedprice / discount / tax. Zero shuffle: a
    read-side predicate pushdown prunes row groups to the ship year,
    then one map_batches stacks the four cent-scaled columns with
    ``np.tile``d measure labels (dictionary-encoded, so the label
    column ships as int8 indices) — row explosion happens inside the
    streaming pass, never on the driver."""
    import datetime

    import pyarrow.dataset as pads

    MEASURES = ["quantity", "extendedprice", "discount", "tax"]

    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax"],
        filter=(pads.field("l_shipdate") >= datetime.datetime(1995, 1, 1))
        & (pads.field("l_shipdate") < datetime.datetime(1996, 1, 1)),
    )

    def unpivot(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        ln = t.column("l_linenumber").to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.concatenate([
            _cents(t.column(f"l_{m}")).to_numpy(zero_copy_only=False)
            for m in MEASURES])
        labels = pa.DictionaryArray.from_arrays(
            pa.array(np.repeat(np.arange(len(MEASURES), dtype=np.int8), n)),
            pa.array(MEASURES))
        return pa.table({
            "l_orderkey": pa.array(np.tile(ok, len(MEASURES))),
            "l_linenumber": pa.array(np.tile(ln, len(MEASURES))),
            "measure": labels,
            "cents": pa.array(cents),
        })

    out = ds.map_batches(unpivot, batch_format="pyarrow").to_pandas()
    out["measure"] = out["measure"].astype(str)
    return out.sort_values(["l_orderkey", "l_linenumber", "measure"]) \
        .reset_index(drop=True)


QUERIES["unpivot_lineitem_measures"] = unpivot_lineitem_measures
ORACLES["unpivot_lineitem_measures"] = """
    SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           measure, CAST(cents AS BIGINT) AS cents
    FROM (
      SELECT l_orderkey, l_linenumber, measure,
             CAST(ROUND(val * 100) AS BIGINT) AS cents
      FROM (SELECT l_orderkey, l_linenumber,
                   l_quantity AS quantity, l_extendedprice AS extendedprice,
                   l_discount AS discount, l_tax AS tax
            FROM lineitem
            WHERE l_shipdate >= '1995-01-01' AND l_shipdate < '1996-01-01')
      UNPIVOT (val FOR measure IN (quantity, extendedprice, discount, tax)))
    ORDER BY l_orderkey, l_linenumber, measure
"""


QUERIES["events_range_window"] = events_range_window
ORACLES["events_range_window"] = """
    SELECT event_id,
           CAST(SUM(cents) OVER w AS BIGINT) AS hr_sum_cents,
           CAST(COUNT(*) OVER w AS BIGINT) AS hr_n
    FROM (SELECT event_id, user_id, ts,
                 CAST(ROUND(value * 100) AS BIGINT) AS cents
          FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    ORDER BY event_id
"""


def user_event_path(sf_dir: str) -> pd.DataFrame:
    """Ordered STRING_AGG per group: each user's full event-type
    sequence joined with '->' in (ts, event_id) order. One user-hash
    bucket shuffle; inside a bucket the concatenation is pure Arrow —
    group offsets from the sorted partition boundaries build a
    ``ListArray`` view over the type column (zero string copies), then
    ``pc.binary_join`` emits every user's path in one C kernel. The
    per-group ORDER BY makes the aggregate deterministic — the same
    total-order contract every grouped result in this suite relies
    on."""
    from ..stages.dedup import _splitmix64 as _mix64

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    def add_bucket(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (_mix64(u) % np.uint64(64)).astype(np.int64)
        return t.append_column("__b", pa.array(b))

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        uid = g["user_id"].to_numpy()
        types = pa.array(g["event_type"].to_numpy(), type=pa.string())
        n = len(g)
        starts = np.r_[0, np.flatnonzero(uid[1:] != uid[:-1]) + 1]
        offsets = pa.array(np.r_[starts, n].astype(np.int32))
        lists = pa.ListArray.from_arrays(offsets, types)
        path = pc.binary_join(lists, "->")
        return pd.DataFrame({
            "user_id": uid[starts].astype(np.int64),
            "n_events": np.diff(np.r_[starts, n]).astype(np.int64),
            "path": path.to_pandas(),
        })

    out = ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__b").map_groups(join_bucket, batch_format="pandas")
    return out.to_pandas().sort_values("user_id").reset_index(drop=True)


QUERIES["user_event_path"] = user_event_path
ORACLES["user_event_path"] = """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           STRING_AGG(event_type, '->' ORDER BY ts, event_id) AS path
    FROM events GROUP BY user_id ORDER BY user_id
"""


QUERIES["percent_rank_orders"] = percent_rank_orders
ORACLES["percent_rank_orders"] = """
    SELECT o_orderkey,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume_dist
    FROM orders
    WINDOW w AS (ORDER BY ROUND(o_totalprice*100), o_orderkey)
    ORDER BY o_orderkey
"""


def user_view_purchase_outer(sf_dir: str, num_buckets: int = 64,
                             cut: float = 99.0) -> pd.DataFrame:
    """FULL OUTER JOIN as a first-class oracle-checked operator: per-user
    high-value view count ⟗ per-user high-value purchase count,
    zero-filled on whichever side the user is missing from. The
    ``value > cut`` predicate makes each side sparse so BOTH unmatched
    branches genuinely fire on the real data (sf0.001: 3 view-only +
    2 purchase-only users; sf0.01: 27 + 24) — without it every user has
    every event type and the outer join degenerates to an inner one.
    Each side is reduced with the standard combiner pattern — per-batch
    (user, n) partials, one user-hash bucket shuffle, lexsort/reduceat —
    then stages.joins.bucket_full_outer_join re-uses the SAME hash-bucket
    key for the outer exchange, with typed integer fills so counts stay
    int64 end to end (ids beyond 2^53 would be silently rounded by
    pandas' NaN-upcast otherwise)."""
    from ..stages.dedup import _splitmix64 as _mix64

    def _per_user_count(etype: str, out_col: str):
        ds = _read(sf_dir, "events",
                   columns=["user_id", "event_type", "value"])

        def partials(t: pa.Table) -> pa.Table:
            t = t.filter(pc.and_(pc.equal(t.column("event_type"), etype),
                                 pc.greater(t.column("value"), cut)))
            u = t.column("user_id").to_numpy(zero_copy_only=False)
            uu, n = np.unique(u, return_counts=True)
            return pa.table({
                "user_id": pa.array(uu),
                out_col: pa.array(n.astype(np.int64)),
                "__b": pa.array((_mix64(uu.astype(np.uint64))
                                 % np.uint64(num_buckets)).astype(np.int64)),
            })

        def finish(g: pd.DataFrame) -> pd.DataFrame:
            u = g["user_id"].to_numpy(dtype=np.int64)
            n = g[out_col].to_numpy(dtype=np.int64)
            order = np.argsort(u, kind="stable")
            u, n = u[order], n[order]
            starts = np.r_[0, np.flatnonzero(u[1:] != u[:-1]) + 1]
            return pd.DataFrame({
                "user_id": u[starts],
                out_col: np.add.reduceat(n, starts),
            })

        return ds.map_batches(partials, batch_format="pyarrow") \
            .groupby("__b").map_groups(finish, batch_format="pandas")

    from ..stages.joins import bucket_full_outer_join

    out = bucket_full_outer_join(
        _per_user_count("view", "n_views"),
        _per_user_count("purchase", "n_purchases"),
        on="user_id", num_buckets=num_buckets,
        fill={"n_views": 0, "n_purchases": 0},
    ).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


QUERIES["user_view_purchase_outer"] = user_view_purchase_outer
ORACLES["user_view_purchase_outer"] = """
    SELECT COALESCE(v.user_id, p.user_id) AS user_id,
           COALESCE(v.n_views, 0) AS n_views,
           COALESCE(p.n_purchases, 0) AS n_purchases
    FROM (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_views
          FROM events WHERE event_type = 'view' AND value > 99.0
          GROUP BY user_id) v
    FULL OUTER JOIN
         (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_purchases
          FROM events WHERE event_type = 'purchase' AND value > 99.0
          GROUP BY user_id) p
    ON v.user_id = p.user_id
    ORDER BY user_id
"""


def q17_small_quantity_revenue(sf_dir: str, brand: str = "Brand#23",
                               num_buckets: int = 64) -> pd.DataFrame:
    """Correlated-aggregate filter (TPC-H Q17 shape): revenue from
    lineitems of one brand's parts whose quantity is below 20% of that
    part's average quantity — the canonical "compare each row against
    its group's aggregate" pattern. Three streaming passes, one tiny
    shuffle, no join of the big table against itself:

    1. the brand's partkeys come off the part dimension (driver-read,
       broadcast — parts of ONE brand are ~4% of the dim; past broadcast
       scale switch to stages.joins.bucket_semi_join on l_partkey),
    2. lineitem → per-batch (partkey, n, sum_qty_cents) combiner partials
       for qualifying parts only, ONE partkey-hash bucket shuffle
       finishes the per-part totals (small by contract: one brand),
    3. totals broadcast back into a second lineitem pass that applies the
       predicate and folds the revenue to one partial per batch.

    The 20%-of-average predicate is evaluated in exact integers by
    cross-multiplication — qty < 0.2·(s/n) ⇔ 5·qty_cents·n < s_cents —
    so the boundary can never flip on float division order; the oracle
    SQL states the identical integer form."""
    import ray

    from ..stages.dedup import _splitmix64 as _mix64

    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"]).to_pandas()
    qual = np.sort(part.loc[part["p_brand"] == brand, "p_partkey"]
                   .to_numpy(dtype=np.int64))
    qual_ref = ray.put(qual)

    def _member(keys: np.ndarray, sorted_keys: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(sorted_keys, keys)
        pos_c = np.minimum(pos, max(len(sorted_keys) - 1, 0))
        return (len(sorted_keys) > 0) & (pos < len(sorted_keys)) \
            & (sorted_keys[pos_c] == keys)

    class PartTotals:
        def __init__(self):
            self.qual = ray.get(qual_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            k = t.column("l_partkey").to_numpy(zero_copy_only=False)
            keep = _member(k, self.qual)
            k = k[keep]
            q = _cents(t.column("l_quantity")).to_numpy(zero_copy_only=False)[keep]
            order = np.argsort(k, kind="stable")
            k, q = k[order], q[order]
            starts = np.r_[0, np.flatnonzero(k[1:] != k[:-1]) + 1]
            uk = k[starts]
            return pa.table({
                "pk": pa.array(uk),
                "n": pa.array(np.diff(np.r_[starts, len(k)]).astype(np.int64)),
                "s": pa.array(np.add.reduceat(q, starts) if len(k)
                              else np.array([], dtype=np.int64)),
                "__b": pa.array((_mix64(uk.astype(np.uint64))
                                 % np.uint64(num_buckets)).astype(np.int64)),
            })

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        k = g["pk"].to_numpy(dtype=np.int64)
        n = g["n"].to_numpy(dtype=np.int64)
        s = g["s"].to_numpy(dtype=np.int64)
        order = np.argsort(k, kind="stable")
        k, n, s = k[order], n[order], s[order]
        starts = np.r_[0, np.flatnonzero(k[1:] != k[:-1]) + 1]
        return pd.DataFrame({"pk": k[starts],
                             "n": np.add.reduceat(n, starts),
                             "s": np.add.reduceat(s, starts)})

    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    totals = _read(sf_dir, "lineitem", columns=li_cols[:2]) \
        .map_batches(PartTotals, batch_format="pyarrow",
                     concurrency=auto_concurrency()) \
        .groupby("__b").map_groups(finish, batch_format="pandas").to_pandas()
    tk = totals["pk"].to_numpy(dtype=np.int64)
    order = np.argsort(tk, kind="stable")
    tot_ref = ray.put((tk[order],
                       totals["n"].to_numpy(dtype=np.int64)[order],
                       totals["s"].to_numpy(dtype=np.int64)[order]))

    class Revenue:
        def __init__(self):
            self.pk, self.n, self.s = ray.get(tot_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            k = t.column("l_partkey").to_numpy(zero_copy_only=False)
            hit = _member(k, self.pk)
            pos = np.searchsorted(self.pk, k[hit])
            q = _cents(t.column("l_quantity")).to_numpy(zero_copy_only=False)[hit]
            keep = q * 5 * self.n[pos] < self.s[pos]
            price = _cents(t.column("l_extendedprice")) \
                .to_numpy(zero_copy_only=False)[hit][keep]
            return pa.table({"rev": pa.array([int(price.sum())])})

    parts = _read(sf_dir, "lineitem", columns=li_cols) \
        .map_batches(Revenue, batch_format="pyarrow",
                     concurrency=auto_concurrency()).to_pandas()
    return _one_row(revenue_cents=int(parts["rev"].sum()))


QUERIES["q17_small_quantity_revenue"] = q17_small_quantity_revenue
ORACLES["q17_small_quantity_revenue"] = """
    SELECT COALESCE(CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT))
                    AS BIGINT), 0) AS revenue_cents
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (SELECT l_partkey AS pk,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS s
          FROM lineitem JOIN part ON p_partkey = l_partkey
                                 AND p_brand = 'Brand#23'
          GROUP BY l_partkey) a ON a.pk = l_partkey
    WHERE p_brand = 'Brand#23'
      AND CAST(ROUND(l_quantity*100) AS BIGINT) * 5 * n < s
"""


def rank_orders_by_date(sf_dir: str) -> pd.DataFrame:
    """RANK / DENSE_RANK over a global ordering WITH real ties (1094
    distinct dates over 1500 orders at sf0.001) — the peers-share-a-rank
    semantics percent_rank_orders deliberately avoided with a tie-free
    composite key. Low-cardinality fast path, ZERO shuffle: the ORDER BY
    key domain (order dates — bounded by the calendar, not the data) is
    histogrammed by a per-batch combiner (≤ |dates| partial rows per
    batch), folded on the driver, turned into rank arrays by one cumsum
    (RANK(d) = 1 + #rows before d's first peer; DENSE_RANK(d) = 1 +
    #distinct earlier dates), and broadcast into a vectorized
    searchsorted pass over orders. For high-cardinality ORDER BY keys
    use stages.scan.ordered_prefix_scan instead (ntile_orders_by_price)."""
    import ray

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def date_counts(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").view(np.int64)
        ud, n = np.unique(d, return_counts=True)
        return pa.table({"d": pa.array(ud), "n": pa.array(n.astype(np.int64))})

    parts = ds.map_batches(date_counts, batch_format="pyarrow").to_pandas()
    d = parts["d"].to_numpy(dtype=np.int64)
    n = parts["n"].to_numpy(dtype=np.int64)
    order = np.argsort(d, kind="stable")
    d, n = d[order], n[order]
    starts = np.r_[0, np.flatnonzero(d[1:] != d[:-1]) + 1]
    ud = d[starts]
    counts = np.add.reduceat(n, starts)
    rnk = np.r_[0, np.cumsum(counts)[:-1]] + 1       # 1 + rows before first peer
    drnk = np.arange(1, len(ud) + 1, dtype=np.int64)  # 1 + distinct earlier
    ref = ray.put((ud, rnk.astype(np.int64), drnk))

    class AttachRanks:
        def __init__(self):
            self.d, self.rnk, self.drnk = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            dd = t.column("o_orderdate").to_numpy(zero_copy_only=False) \
                .astype("datetime64[us]").view(np.int64)
            pos = np.searchsorted(self.d, dd)
            return pa.table({
                "o_orderkey": t.column("o_orderkey"),
                "rnk": pa.array(self.rnk[pos]),
                "drnk": pa.array(self.drnk[pos]),
            })

    out = ds.map_batches(AttachRanks, batch_format="pyarrow",
                         concurrency=auto_concurrency()).to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


QUERIES["rank_orders_by_date"] = rank_orders_by_date
ORACLES["rank_orders_by_date"] = """
    SELECT o_orderkey,
           CAST(RANK() OVER (ORDER BY o_orderdate) AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER (ORDER BY o_orderdate) AS BIGINT) AS drnk
    FROM orders
    ORDER BY o_orderkey
"""


def events_first_last(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """Window navigation triple FIRST_VALUE / LAST_VALUE / LEAD as one
    distributed operator: per event, the partition's first and last
    event type under (ts, event_id) order plus the NEXT event's id —
    the forward-looking complement of events_lag_delta (LAG). LAST_VALUE
    is computed under the UNBOUNDED FOLLOWING frame (SQL's default
    CURRENT ROW frame makes LAST_VALUE trivially the row itself). ONE
    user-hash bucket shuffle; inside a bucket one sort by (user, ts,
    event_id) and shifted-array boundary masks give every value as a
    vectorized gather: first/last via forward/backward cummax of the
    boundary indices, LEAD via the next-row shift with a -1 typed
    sentinel at partition tails (int64 survives pandas group frames)."""
    from ..stages.dedup import _splitmix64 as _mix64

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                          "event_type"])

    def add_bucket(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (_mix64(u) % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column("__b", pa.array(b))

    def nav_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        uid = g["user_id"].to_numpy()
        eid = g["event_id"].to_numpy().astype(np.int64)
        et = g["event_type"].to_numpy()
        n = len(g)
        first = np.r_[True, uid[1:] != uid[:-1]]
        last = np.r_[uid[1:] != uid[:-1], True]
        # index of each row's partition start: cummax of start positions
        start_idx = np.maximum.accumulate(np.where(first, np.arange(n), 0))
        # index of each row's partition end: backward cummax of end positions
        end_idx = np.minimum.accumulate(
            np.where(last, np.arange(n), n - 1)[::-1])[::-1]
        nxt = np.r_[eid[1:], np.int64(-1)]
        nxt[last] = -1
        return pd.DataFrame({
            "event_id": eid,
            "first_type": et[start_idx],
            "last_type": et[end_idx],
            "next_event_id": nxt,
        })

    out = ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__b").map_groups(nav_bucket, batch_format="pandas")
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


QUERIES["events_first_last"] = events_first_last
ORACLES["events_first_last"] = """
    SELECT event_id,
           FIRST_VALUE(event_type) OVER w AS first_type,
           LAST_VALUE(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_type,
           CAST(COALESCE(LEAD(event_id) OVER w, -1) AS BIGINT)
             AS next_event_id
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY event_id
"""


def mode_event_type_by_user(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """Grouped MODE (most frequent value per group) with a deterministic
    tiebreak (lexicographically smallest value wins) over a group domain
    that scales with the data (users), so no per-group aggregate and no
    driver fold: per-batch (user, type) count partials — the combiner
    bounds the exchange at distinct pairs per batch — then ONE user-hash
    bucket shuffle; inside a bucket a single lexsort by (user, type)
    + reduceat finishes the counts and an argmax-by-ordering pass picks
    each user's winner: rows re-sorted by (user, -n, type) via one more
    lexsort on the small per-bucket (user,type) table, first row per
    user taken with a shifted-boundary mask."""
    from ..stages.dedup import _splitmix64 as _mix64

    TYPES = ["click", "error", "purchase", "signup", "view"]
    NT = np.int64(len(TYPES))

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def combine(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        idx = pc.index_in(t.column("event_type"), value_set=pa.array(TYPES))
        if idx.null_count:
            raise ValueError("unexpected event_type outside the mode domain")
        et = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        key = uid * NT + et
        uk, n = np.unique(key, return_counts=True)
        uu = uk // NT
        return pa.table({
            "u": pa.array(uu),
            "t": pa.array(uk % NT),
            "n": pa.array(n.astype(np.int64)),
            "__b": pa.array((_mix64(uu.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def pick_mode(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(dtype=np.int64)
        t = g["t"].to_numpy(dtype=np.int64)
        n = g["n"].to_numpy(dtype=np.int64)
        key = u * NT + t
        order = np.argsort(key, kind="stable")
        key, u, t, n = key[order], u[order], t[order], n[order]
        starts = np.r_[0, np.flatnonzero(key[1:] != key[:-1]) + 1]
        u, t = u[starts], t[starts]
        n = np.add.reduceat(n, starts)
        # winner per user: first row under (user asc, n desc, type asc)
        win = np.lexsort((t, -n, u))
        u, t, n = u[win], t[win], n[win]
        head = np.r_[True, u[1:] != u[:-1]]
        return pd.DataFrame({
            "user_id": u[head],
            "mode_type": np.array(TYPES, dtype=object)[t[head]],
            "n": n[head],
        })

    out = ds.map_batches(combine, batch_format="pyarrow") \
        .groupby("__b").map_groups(pick_mode, batch_format="pandas")
    return out.to_pandas().sort_values("user_id").reset_index(drop=True)


QUERIES["mode_event_type_by_user"] = mode_event_type_by_user
ORACLES["mode_event_type_by_user"] = """
    SELECT user_id, event_type AS mode_type, n FROM (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY COUNT(*) DESC, event_type) AS rn
      FROM events GROUP BY user_id, event_type)
    WHERE rn = 1
    ORDER BY user_id
"""


def exact_percentile_price(sf_dir: str, qs=(0.5, 0.9, 0.99),
                           num_bins: int = 8192) -> pd.DataFrame:
    """EXACT order-statistic percentiles (PERCENTILE_DISC) of a big
    column WITHOUT a global sort — the all-to-all a naive ORDER BY
    would cost is replaced by two zero-shuffle streaming passes and a
    driver-side fold that never sees rows:

    1. min/max/count combiner (3 int64s per batch),
    2. equi-width integer histogram combiner — each batch emits only
       its NONZERO (bin, n) pairs, the driver scatters them into one
       ``num_bins`` array; the cumulative histogram locates the bin
       holding each target's k-th order statistic (k = ⌈q·n⌉−1, DuckDB's
       quantile_disc convention, verified empirically),
    3. one filtered pass gathers ONLY the values inside target bins
       (expected n/num_bins values each) and indexes the exact answer.

    Degenerate skew (one value dominating a bin) keeps the gather small
    anyway — the bin then holds few DISTINCT values and step 3 could
    recurse on the bin's sub-range; at 8192 bins the single round
    suffices for any real price-like distribution."""
    import ray

    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])

    def vals(t: pa.Table) -> np.ndarray:
        return _cents(t.column("l_extendedprice")).to_numpy(zero_copy_only=False)

    def minmax(t: pa.Table) -> pa.Table:
        v = vals(t)
        return pa.table({"lo": pa.array([int(v.min()) if len(v) else 0]),
                         "hi": pa.array([int(v.max()) if len(v) else 0]),
                         "n": pa.array([len(v)])})

    meta = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    meta = meta[meta["n"] > 0]
    lo, hi = int(meta["lo"].min()), int(meta["hi"].max())
    n = int(meta["n"].sum())
    width = hi - lo + 1

    def hist(t: pa.Table) -> pa.Table:
        v = vals(t)
        b = (v - lo) * np.int64(num_bins) // np.int64(width)
        ub, cnt = np.unique(b, return_counts=True)
        return pa.table({"bin": pa.array(ub),
                         "cnt": pa.array(cnt.astype(np.int64))})

    parts = ds.map_batches(hist, batch_format="pyarrow").to_pandas()
    bins = np.zeros(num_bins, dtype=np.int64)
    np.add.at(bins, parts["bin"].to_numpy(dtype=np.int64),
              parts["cnt"].to_numpy(dtype=np.int64))
    cum = np.cumsum(bins)
    ks = np.array([int(np.ceil(q * n)) - 1 for q in qs], dtype=np.int64)
    target_bins = np.searchsorted(cum, ks, side="right")
    before = np.r_[0, cum][target_bins]  # rows in earlier bins
    uniq_bins = np.unique(target_bins)
    ref = ray.put(uniq_bins)

    class GatherBins:
        def __init__(self):
            self.bins = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            v = vals(t)
            b = (v - lo) * np.int64(num_bins) // np.int64(width)
            keep = np.isin(b, self.bins)
            return pa.table({"v": pa.array(v[keep]), "b": pa.array(b[keep])})

    got = ds.map_batches(GatherBins, batch_format="pyarrow",
                         concurrency=auto_concurrency()).to_pandas()
    gv = got["v"].to_numpy(dtype=np.int64)
    gb = got["b"].to_numpy(dtype=np.int64)
    out = []
    for q, k, tb, bef in zip(qs, ks, target_bins, before):
        inbin = np.sort(gv[gb == tb])
        out.append({"q": float(q), "value_cents": int(inbin[k - bef])})
    return pd.DataFrame(out)


QUERIES["exact_percentile_price"] = exact_percentile_price
ORACLES["exact_percentile_price"] = """
    WITH c AS (SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT) AS v
               FROM lineitem)
    SELECT CAST(0.5 AS DOUBLE) AS q,
           CAST(quantile_disc(v, 0.5) AS BIGINT) AS value_cents FROM c
    UNION ALL
    SELECT CAST(0.9 AS DOUBLE),
           CAST(quantile_disc(v, 0.9) AS BIGINT) FROM c
    UNION ALL
    SELECT CAST(0.99 AS DOUBLE),
           CAST(quantile_disc(v, 0.99) AS BIGINT) FROM c
"""


def histogram_order_price(sf_dir: str, num_bins: int = 20) -> pd.DataFrame:
    """Equi-width histogram (SQL width_bucket shape) over data-derived
    bounds: two zero-shuffle streaming passes — a min/max combiner, then
    a bin-count combiner whose per-batch output is only the nonzero
    (bin, n) pairs, folded on the driver into the final ``num_bins``-row
    table. Bin assignment is exact integer arithmetic
    ``(v − lo)·B // (hi − lo + 1)`` on cents (the oracle states the
    identical expression), so no float boundary can disagree."""
    ds = _read(sf_dir, "orders", columns=["o_totalprice"])

    def vals(t: pa.Table) -> np.ndarray:
        return _cents(t.column("o_totalprice")).to_numpy(zero_copy_only=False)

    def minmax(t: pa.Table) -> pa.Table:
        v = vals(t)
        return pa.table({"lo": pa.array([int(v.min()) if len(v) else 0]),
                         "hi": pa.array([int(v.max()) if len(v) else 0]),
                         "n": pa.array([len(v)])})

    meta = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    meta = meta[meta["n"] > 0]
    lo, hi = int(meta["lo"].min()), int(meta["hi"].max())
    width = hi - lo + 1

    def hist(t: pa.Table) -> pa.Table:
        v = vals(t)
        b = (v - lo) * np.int64(num_bins) // np.int64(width)
        ub, cnt = np.unique(b, return_counts=True)
        return pa.table({"bin": pa.array(ub),
                         "cnt": pa.array(cnt.astype(np.int64))})

    parts = ds.map_batches(hist, batch_format="pyarrow").to_pandas()
    bins = np.zeros(num_bins, dtype=np.int64)
    np.add.at(bins, parts["bin"].to_numpy(dtype=np.int64),
              parts["cnt"].to_numpy(dtype=np.int64))
    nz = np.flatnonzero(bins)
    return pd.DataFrame({"bin": nz.astype(np.int64), "n": bins[nz]})


QUERIES["histogram_order_price"] = histogram_order_price
ORACLES["histogram_order_price"] = """
    WITH c AS (SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) AS v
               FROM orders),
         b AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM c)
    SELECT CAST((v - lo) * 20 // (hi - lo + 1) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM c, b GROUP BY 1 ORDER BY 1
"""


def funnel_view_click_purchase(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """Ordered sequence-pattern match (funnel / MATCH_RECOGNIZE-lite):
    per user, the first 'view', the first 'click' STRICTLY AFTER that
    view, and the first 'purchase' strictly after that click — users
    completing all three stages, with the three stage timestamps. The
    correlated "first event after a per-user point" chain is what makes
    this a distinct operator from plain grouped mins.

    Events are pre-filtered to the three stage types BEFORE the single
    user-hash bucket shuffle (read prunes to 3 columns, filter prunes
    ~40% of rows). Inside a bucket everything is one sort plus rank
    arithmetic — per stage, rows are encoded as segment_id·M + ts_rank
    composites so ONE global ``np.searchsorted`` finds every user's
    "first stage-k row with ts > t_{k-1}" simultaneously; no per-user
    loop at any point."""
    from ..stages.dedup import _splitmix64 as _mix64

    STAGES = ["view", "click", "purchase"]

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t.column("event_type"),
                              value_set=pa.array(STAGES)))
        u = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (_mix64(u) % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column("__b", pa.array(b))

    def funnel_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"])
        uid = g["user_id"].to_numpy(dtype=np.int64)
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = g["event_type"].to_numpy()
        n = len(g)
        if n == 0:
            return pd.DataFrame({"user_id": np.array([], dtype=np.int64),
                                 "t_view_us": np.array([], dtype=np.int64),
                                 "t_click_us": np.array([], dtype=np.int64),
                                 "t_purchase_us": np.array([], dtype=np.int64)})
        starts = np.r_[0, np.flatnonzero(uid[1:] != uid[:-1]) + 1]
        seg_end = np.r_[starts[1:], n]
        seg_id = np.cumsum(np.r_[False, uid[1:] != uid[:-1]])
        users = uid[starts]
        ut = np.unique(ts)
        M = np.int64(len(ut) + 2)

        def first_after(stage: str, t_prev: np.ndarray, alive: np.ndarray):
            """Per segment: ts of the first `stage` row with ts > t_prev
            (t_prev = -inf rank 0 for the first stage)."""
            idx = np.flatnonzero(et == stage)
            if not len(idx):  # no rows of this stage in the bucket
                return (np.full(len(users), np.iinfo(np.int64).min,
                                dtype=np.int64),
                        np.zeros(len(users), dtype=bool))
            comp = seg_id[idx] * M + np.searchsorted(ut, ts[idx]) + 1
            # target rank: strictly greater than t_prev
            tgt_rank = np.where(t_prev == np.iinfo(np.int64).min, 0,
                                np.searchsorted(ut, t_prev, side="right") + 1)
            tgt = np.arange(len(users), dtype=np.int64) * M + tgt_rank
            j = np.searchsorted(comp, tgt)
            ok = alive & (j < len(idx))
            j_c = np.minimum(j, max(len(idx) - 1, 0))
            in_seg = comp[j_c] < (np.arange(len(users), dtype=np.int64) + 1) * M
            ok &= in_seg
            t_out = np.full(len(users), np.iinfo(np.int64).min, dtype=np.int64)
            if len(idx):
                t_out[ok] = ts[idx[j_c[ok]]]
            return t_out, ok

        NINF = np.full(len(users), np.iinfo(np.int64).min, dtype=np.int64)
        alive = np.ones(len(users), dtype=bool)
        t1, alive = first_after("view", NINF, alive)
        t2, alive = first_after("click", t1, alive)
        t3, alive = first_after("purchase", t2, alive)
        return pd.DataFrame({
            "user_id": users[alive],
            "t_view_us": t1[alive],
            "t_click_us": t2[alive],
            "t_purchase_us": t3[alive],
        })

    out = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("__b").map_groups(funnel_bucket, batch_format="pandas")
    return out.to_pandas().sort_values("user_id").reset_index(drop=True)


QUERIES["funnel_view_click_purchase"] = funnel_view_click_purchase
ORACLES["funnel_view_click_purchase"] = """
    WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT v.user_id, v.t1, MIN(e.ts) AS t2
               FROM v JOIN events e ON e.user_id = v.user_id
                AND e.event_type = 'click' AND e.ts > v.t1
               GROUP BY v.user_id, v.t1),
         p AS (SELECT c.user_id, c.t1, c.t2, MIN(e.ts) AS t3
               FROM c JOIN events e ON e.user_id = c.user_id
                AND e.event_type = 'purchase' AND e.ts > c.t2
               GROUP BY c.user_id, c.t1, c.t2)
    SELECT user_id,
           CAST(epoch_us(t1) AS BIGINT) AS t_view_us,
           CAST(epoch_us(t2) AS BIGINT) AS t_click_us,
           CAST(epoch_us(t3) AS BIGINT) AS t_purchase_us
    FROM p ORDER BY user_id
"""


def _kmeans_init_centroids(sf_dir: str, k: int):
    """Deterministic k-means init: the embeddings of the k smallest
    vec_ids, found by a per-batch keep-k combiner (k rows per batch
    reach the driver, never the corpus)."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def keep_k(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        take = np.argsort(ids, kind="stable")[:k]
        return t.take(pa.array(take))

    from ..stages.similarity import _batch_matrix

    head = ds.map_batches(keep_k, batch_format="pyarrow").to_pandas()
    head = head.sort_values("vec_id").head(k)
    tbl = pa.Table.from_pandas(head, preserve_index=False)
    return (head["vec_id"].to_numpy(dtype=np.int64),
            _batch_matrix(tbl, "embedding"))


def kmeans_assign_embeddings(sf_dir: str, k: int = 8) -> pd.DataFrame:
    """One k-means assignment pass as an oracle-checked operator: every
    vector assigned to its nearest (L2) of k fixed centroids — the
    embeddings of the k smallest vec_ids — with per-cluster counts out.
    Pure streaming: centroids broadcast once (``ray.put``), each batch
    computes the (rows × k) distance matrix as one float64 matmul and
    emits ≤k partial count rows; ties break to the lowest centroid id on
    both engines (np.argmin first-min ≡ ORDER BY dist, cid). This is the
    inner loop of kmeans_embeddings, isolated so the assignment math is
    value-hash-verified against a CROSS JOIN + list_inner_product SQL
    oracle."""
    import ray

    from ..stages.similarity import _batch_matrix

    cids, C = _kmeans_init_centroids(sf_dir, k)
    ref = ray.put((cids, C))

    class Assign:
        def __init__(self):
            self.cids, self.C = ray.get(ref)
            self.cnorm = (self.C ** 2).sum(axis=1)

        def __call__(self, t: pa.Table) -> pa.Table:
            X = _batch_matrix(t, "embedding")
            d2 = (X ** 2).sum(axis=1)[:, None] - 2.0 * (X @ self.C.T) \
                + self.cnorm[None, :]
            lab = np.argmin(d2, axis=1)
            ul, n = np.unique(lab, return_counts=True)
            return pa.table({"cluster": pa.array(self.cids[ul]),
                             "n": pa.array(n.astype(np.int64))})

    parts = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]) \
        .map_batches(Assign, batch_format="pyarrow",
                     concurrency=auto_concurrency()).to_pandas()
    out = parts.groupby("cluster", as_index=False)["n"].sum()
    return out.sort_values("cluster").reset_index(drop=True)


QUERIES["kmeans_assign_embeddings"] = kmeans_assign_embeddings
ORACLES["kmeans_assign_embeddings"] = """
    WITH cent AS (SELECT vec_id AS cid, embedding AS cvec
                  FROM embeddings ORDER BY vec_id LIMIT 8),
         d AS (SELECT e.vec_id, c.cid,
                 CAST(list_inner_product(e.embedding, e.embedding) AS DOUBLE)
                 - 2.0 * CAST(list_inner_product(e.embedding, c.cvec) AS DOUBLE)
                 + CAST(list_inner_product(c.cvec, c.cvec) AS DOUBLE) AS dist
               FROM embeddings e CROSS JOIN cent c),
         a AS (SELECT vec_id, cid,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                    ORDER BY dist, cid) AS rn
               FROM d)
    SELECT cid AS cluster, CAST(COUNT(*) AS BIGINT) AS n
    FROM a WHERE rn = 1 GROUP BY cid ORDER BY cid
"""


def kmeans_embeddings(sf_dir: str, k: int = 8, iters: int = 5) -> pd.DataFrame:
    """Distributed Lloyd k-means: each iteration is ONE zero-shuffle
    streaming pass — broadcast centroids, per-batch assignment (one
    float64 matmul) + per-cluster partial sums, driver update. The
    partial sums are EXACT int64 (vectors scaled by 2^24 and rounded:
    float32 inputs fit losslessly and 10⁹ rows/cluster stay < 2^63), so
    the driver fold is associative and the centroids — hence the final
    clustering — are bit-identical at ANY batch/partition layout, unlike
    a float-sum fold whose result depends on Ray's nondeterministic
    batch boundaries (CLAUDE.md). Empty clusters keep their previous
    centroid. Float centroids ⇒ not SQL-statable as a whole; the
    assignment inner loop is oracle-checked separately
    (kmeans_assign_embeddings), the determinism sweep locks run-to-run
    equality here, and `kmeans_fixedpoint_embeddings` is the twin whose
    EVERY round a DuckDB oracle states verbatim."""
    import ray

    from ..stages.similarity import _batch_matrix

    SCALE = np.float64(1 << 24)
    cids, C = _kmeans_init_centroids(sf_dir, k)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    dim = C.shape[1]

    for _ in range(iters):
        ref = ray.put(C)

        class Partials:
            def __init__(self):
                self.C = ray.get(ref)
                self.cnorm = (self.C ** 2).sum(axis=1)

            def __call__(self, t: pa.Table) -> pa.Table:
                X = _batch_matrix(t, "embedding")
                d2 = (X ** 2).sum(axis=1)[:, None] - 2.0 * (X @ self.C.T) \
                    + self.cnorm[None, :]
                lab = np.argmin(d2, axis=1)
                Xi = np.rint(X * SCALE).astype(np.int64)
                sums = np.zeros((k, dim), dtype=np.int64)
                np.add.at(sums, lab, Xi)
                n = np.bincount(lab, minlength=k).astype(np.int64)
                return pa.table({
                    "cluster": pa.array(np.arange(k, dtype=np.int64)),
                    "n": pa.array(n),
                    "s": pa.array(list(sums)),
                })

        parts = ds.map_batches(Partials, batch_format="pyarrow",
                               concurrency=auto_concurrency()).to_pandas()
        n_tot = np.zeros(k, dtype=np.int64)
        s_tot = np.zeros((k, dim), dtype=np.int64)
        cl = parts["cluster"].to_numpy(dtype=np.int64)
        np.add.at(n_tot, cl, parts["n"].to_numpy(dtype=np.int64))
        np.add.at(s_tot, cl, np.stack(parts["s"].to_numpy()))
        nonempty = n_tot > 0
        C = C.copy()
        C[nonempty] = s_tot[nonempty] / (n_tot[nonempty, None] * SCALE)

    return pd.DataFrame({
        "cluster": cids,
        "n": n_tot,
        "centroid_l1_micro": np.rint(np.abs(C).sum(axis=1) * 1e6)
            .astype(np.int64),
    })


QUERIES["kmeans_embeddings"] = kmeans_embeddings


def q5_local_supplier_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q5 shape — multi-way join with a CO-LOCATION condition that
    cuts ACROSS two join paths (supplier nation == customer nation):
    lineitem ⋈ orders (the one large×large exchange, both sides
    pre-projected and lineitem pre-reduced to integer revenue cents) →
    the two dimension paths resolve as ONE broadcast stage (customer→
    nation and supplier→nation maps shipped once via ray.put,
    searchsorted per batch) so the cross-path equality is a vectorized
    mask instead of a second shuffle → per-batch combiner emits ≤25
    nation partials.  Orders restricted to 1995 with read-side
    predicate pushdown.

    Scale shape: the only all-to-all carries (okey, skey, rev_cents)
    24-byte rows; dims are O(customers+suppliers) broadcast once per
    actor, never per batch."""
    import datetime

    import pyarrow.dataset as pads
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..stages.joins import bucket_hash_join

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey",
                        "l_extendedprice", "l_discount"])

    def prep_li(t: pa.Table) -> pa.Table:
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        return pa.table({"okey": t.column("l_orderkey"),
                         "skey": t.column("l_suppkey"),
                         "rev_cents": pa.array(cents)})

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"],
        filter=(
            (pads.field("o_orderdate") >= datetime.datetime(1995, 1, 1))
            & (pads.field("o_orderdate") < datetime.datetime(1996, 1, 1))
        ),
    ).map_batches(lambda t: pa.table({"okey": t.column("o_orderkey"),
                                      "o_custkey": t.column("o_custkey")}),
                  batch_format="pyarrow")

    joined = bucket_hash_join(li.map_batches(prep_li, batch_format="pyarrow"),
                              orders, on="okey", num_buckets=32)

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey"]).to_pandas()
    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name"]).to_pandas()
    ck = np.argsort(cust["c_custkey"].to_numpy())
    sk = np.argsort(supp["s_suppkey"].to_numpy())
    nk = np.argsort(nat["n_nationkey"].to_numpy())
    dims_ref = ray.put((
        cust["c_custkey"].to_numpy()[ck],
        cust["c_nationkey"].to_numpy()[ck].astype(np.int64),
        supp["s_suppkey"].to_numpy()[sk],
        supp["s_nationkey"].to_numpy()[sk].astype(np.int64),
        nat["n_nationkey"].to_numpy()[nk].astype(np.int64),
        nat["n_name"].to_numpy()[nk],
    ))

    class LocalRevenue:
        def __init__(self):
            (self.ck, self.cn, self.sk, self.sn,
             self.nk, self.nn) = ray.get(dims_ref)

        def _lookup(self, keys, sorted_keys, vals):
            pos = np.minimum(np.searchsorted(sorted_keys, keys),
                             len(sorted_keys) - 1)
            ok = sorted_keys[pos] == keys
            return vals[pos], ok

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({
                "n_name": pd.Series([], dtype="object"),
                "part_rev": pd.Series([], dtype="int64"),
                "part_n": pd.Series([], dtype="int64")})
            if "o_custkey" not in df.columns or not len(df) \
                    or not (len(self.ck) and len(self.sk) and len(self.nk)):
                return empty
            cnat, ok_c = self._lookup(df["o_custkey"].to_numpy(),
                                      self.ck, self.cn)
            snat, ok_s = self._lookup(df["skey"].to_numpy(),
                                      self.sk, self.sn)
            m = ok_c & ok_s & (cnat == snat)
            if not m.any():
                return empty
            nname, ok_n = self._lookup(cnat[m], self.nk, self.nn)
            out = pd.DataFrame({
                "n_name": nname[ok_n],
                "rev_cents": df["rev_cents"].to_numpy()[m][ok_n],
            }).groupby("n_name", as_index=False).agg(
                part_rev=("rev_cents", "sum"),
                part_n=("rev_cents", "size"))
            return out.astype({"part_rev": "int64", "part_n": "int64"})

    out = (
        joined.map_batches(LocalRevenue, batch_format="pandas",
                           concurrency=auto_concurrency())
        .groupby("n_name")
        .aggregate(Sum("part_rev", alias_name="revenue_cents"),
                   Sum("part_n", alias_name="n_items"))
        .to_pandas()
    )
    out["revenue_cents"] = out["revenue_cents"].astype("int64")
    out["n_items"] = out["n_items"].astype("int64")
    return out.sort_values("n_name").reset_index(drop=True)


QUERIES["q5_local_supplier_revenue"] = q5_local_supplier_revenue
ORACLES["q5_local_supplier_revenue"] = """
    SELECT n_name,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_cents,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE s_nationkey = c_nationkey
      AND o_orderdate >= DATE '1995-01-01'
      AND o_orderdate <  DATE '1996-01-01'
    GROUP BY n_name ORDER BY n_name
"""


def order_count_distribution(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q13 shape — two-level aggregate: per-customer order count
    (LEFT JOIN so customers with no qualifying order count as 0), then
    the DISTRIBUTION of those counts.  Scale shape: orders are
    combiner-reduced per batch to (custkey, n) partials before the one
    custkey-hash bucket exchange; customer keys cross the same exchange
    as bare 8-byte rows; each bucket task finishes its customers'
    counts (zero-fill via searchsorted) and immediately collapses them
    to (n_orders, n_customers) HISTOGRAM partials — the driver folds
    only ≤ max_count-sized partial tables, never customer rows.

    Orders restricted to status 'F' so the zero branch genuinely fires
    (71 zero-order customers at sf0.01)."""
    import pyarrow.dataset as pads
    import ray.data

    from ..stages.dedup import _splitmix64 as _mix64

    NB = 64

    def bucket_of(k):
        return (_mix64(k.astype(np.uint64)) % np.uint64(NB)).astype(np.int64)

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey"],
        filter=pads.field("o_orderstatus") == "F",
    )
    cust = _read(sf_dir, "customer", columns=["c_custkey"])

    def order_partials(t: pa.Table) -> pa.Table:
        k = np.sort(t.column("o_custkey").to_numpy(zero_copy_only=False))
        new = np.r_[True, k[1:] != k[:-1]] if len(k) else np.array([], bool)
        starts = np.nonzero(new)[0]
        uk = k[starts]
        return pa.table({
            "custkey": pa.array(uk),
            "n": pa.array(np.diff(np.r_[starts, len(k)]).astype(np.int64)),
            "__b": pa.array(bucket_of(uk)),
            "__side": pa.array(np.ones(len(uk), dtype=bool)),
        })

    def cust_rows(t: pa.Table) -> pa.Table:
        k = t.column("c_custkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "custkey": pa.array(k),
            "n": pa.array(np.zeros(len(k), dtype=np.int64)),
            "__b": pa.array(bucket_of(k)),
            "__side": pa.array(np.zeros(len(k), dtype=bool)),
        })

    def hist_bucket(g: pd.DataFrame) -> pd.DataFrame:
        part = g[g["__side"]]
        ck = np.sort(g[~g["__side"]]["custkey"].to_numpy(dtype=np.int64))
        pk = part["custkey"].to_numpy(dtype=np.int64)
        pn = part["n"].to_numpy(dtype=np.int64)
        order = np.argsort(pk, kind="stable")
        pk, pn = pk[order], pn[order]
        new = np.r_[True, pk[1:] != pk[:-1]] if len(pk) else np.array([], bool)
        starts = np.nonzero(new)[0]
        uk = pk[starts]
        n_tot = np.add.reduceat(pn, starts) if len(starts) else pn
        counts = np.zeros(len(ck), dtype=np.int64)
        if len(uk) and len(ck):  # len(ck)==0: ck[...-1] would raise
            pos = np.searchsorted(ck, uk)
            ok = (pos < len(ck)) & (ck[np.minimum(pos, len(ck) - 1)] == uk)
            counts[pos[ok]] = n_tot[ok]
        vals, occ = np.unique(counts, return_counts=True)
        return pd.DataFrame({"n_orders": vals,
                             "part": occ.astype(np.int64)})

    both = orders.map_batches(order_partials, batch_format="pyarrow").union(
        cust.map_batches(cust_rows, batch_format="pyarrow"))
    parts = both.groupby("__b").map_groups(
        hist_bucket, batch_format="pandas").to_pandas()
    out = parts.groupby("n_orders", as_index=False).agg(
        n_customers=("part", "sum")).astype(
        {"n_orders": "int64", "n_customers": "int64"})
    return out.sort_values("n_orders").reset_index(drop=True)


QUERIES["order_count_distribution"] = order_count_distribution
ORACLES["order_count_distribution"] = """
    SELECT n_orders, COUNT(*) AS n_customers FROM (
      SELECT c_custkey, CAST(COUNT(o_custkey) AS BIGINT) AS n_orders
      FROM customer LEFT JOIN (
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      ) o ON c_custkey = o_custkey
      GROUP BY c_custkey
    ) GROUP BY n_orders ORDER BY n_orders
"""


def _user_day_firsts(sf_dir: str, num_buckets: int = 64):
    """Shared core for the cohort/retention family: exact per-user
    (first_day, active_day) pairs with ONE exchange.  Per batch, raw
    events collapse to distinct (user, day) pairs (16-byte rows — the
    exchange volume is bounded by distinct user-day activity, never raw
    events); a user-hash bucket shuffle co-locates each user's days;
    each bucket task re-dedupes across batches, takes the per-user min
    day as the cohort, and emits (cohort_day_us, active_day_us, n_users)
    partials — at most days² rows per bucket, which is what the driver
    folds."""
    import ray.data

    from ..stages.dedup import _splitmix64 as _mix64

    DAY_US = 86_400_000_000

    def pairs(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        us = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = (us // DAY_US) * DAY_US
        key = np.stack([u, day], axis=1)
        key = np.unique(key, axis=0)
        b = (_mix64(key[:, 0].astype(np.uint64))
             % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({"user": pa.array(key[:, 0]),
                         "day": pa.array(key[:, 1]),
                         "__b": pa.array(b)})

    def cohort_partials(g: pd.DataFrame) -> pd.DataFrame:
        u = g["user"].to_numpy(dtype=np.int64)
        d = g["day"].to_numpy(dtype=np.int64)
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        keep = np.r_[True, (u[1:] != u[:-1]) | (d[1:] != d[:-1])]
        u, d = u[keep], d[keep]
        new = np.r_[True, u[1:] != u[:-1]] if len(u) else np.array([], bool)
        seg = np.cumsum(new) - 1
        cohort = d[np.nonzero(new)[0]][seg]  # per-user min day (sorted)
        pair = np.stack([cohort, d], axis=1)
        vals, occ = np.unique(pair, axis=0, return_counts=True)
        return pd.DataFrame({"cohort_us": vals[:, 0], "day_us": vals[:, 1],
                             "part": occ.astype(np.int64)})

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    parts = (ds.map_batches(pairs, batch_format="pyarrow")
             .groupby("__b").map_groups(cohort_partials,
                                        batch_format="pandas")
             .to_pandas())
    return parts.groupby(["cohort_us", "day_us"], as_index=False).agg(
        n=("part", "sum"))


def retention_cohorts(sf_dir: str) -> pd.DataFrame:
    """Cohort retention matrix: users grouped by their FIRST active day
    (cohort), counted as distinct actives on each later day — the
    classic product-analytics operator, exact and SQL-checked.  One
    user-hash exchange of deduped (user, day) pairs; see
    `_user_day_firsts` for the scale shape."""
    parts = _user_day_firsts(sf_dir)
    return pd.DataFrame({
        "cohort_day": pd.to_datetime(parts["cohort_us"], unit="us"),
        "active_day": pd.to_datetime(parts["day_us"], unit="us"),
        "n_users": parts["n"].astype("int64"),
    }).sort_values(["cohort_day", "active_day"]).reset_index(drop=True)


QUERIES["retention_cohorts"] = retention_cohorts
ORACLES["retention_cohorts"] = """
    WITH firsts AS (
      SELECT user_id, MIN(date_trunc('day', ts)) AS cohort_day
      FROM events GROUP BY user_id
    )
    SELECT cohort_day, date_trunc('day', ts) AS active_day,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY cohort_day, active_day
    ORDER BY cohort_day, active_day
"""


def cumulative_new_users(sf_dir: str) -> pd.DataFrame:
    """Running distinct-user count by day (cumulative \"total users
    ever seen\") — a window SUM over per-day NEW-user counts, where
    \"new\" is exact first-seen.  Reuses the cohort exchange: the per-
    cohort first-activity diagonal (cohort == active day) gives new
    users per day; the cumsum runs on the driver over ≤ days rows."""
    parts = _user_day_firsts(sf_dir)
    firsts = parts[parts["cohort_us"] == parts["day_us"]]
    firsts = firsts.sort_values("cohort_us").reset_index(drop=True)
    return pd.DataFrame({
        "day": pd.to_datetime(firsts["cohort_us"], unit="us"),
        "cum_users": firsts["n"].cumsum().astype("int64"),
    })


QUERIES["cumulative_new_users"] = cumulative_new_users
ORACLES["cumulative_new_users"] = """
    SELECT d AS day, CAST(SUM(n) OVER (ORDER BY d) AS BIGINT) AS cum_users
    FROM (
      SELECT first_day AS d, COUNT(*) AS n FROM (
        SELECT user_id, MIN(date_trunc('day', ts)) AS first_day
        FROM events GROUP BY user_id
      ) GROUP BY first_day
    ) ORDER BY d
"""


def max_concurrent_views(sf_dir: str, window_min: int = 10,
                         num_buckets: int = 64) -> pd.DataFrame:
    """Sweep-line interval-concurrency operator: treat every 'view'
    event as an open interval [ts, ts+10min) and find the maximum
    number simultaneously open (plus the earliest instant it is
    reached) — the classic max-overlap problem, distributed with NO
    global sort of raw endpoints.

    Three bounded stages: (1) endpoints collapse per batch to (t, net
    delta) partials, one t-hash bucket exchange nets them EXACTLY per
    distinct timestamp (the netting is what makes step 2 legal: the
    scan's strictly-smaller contract needs unique keys, and netting
    also encodes the ends-before-starts tie rule of half-open
    intervals); (2) `ordered_prefix_scan` turns the netted deltas into
    per-instant running concurrency via range-bucket partials — only
    (t, delta) 16-byte rows ever shuffle; (3) a per-batch (max,
    earliest-t-at-max) combiner folds to one row on the driver."""
    import ray.data

    from ..stages.dedup import _splitmix64 as _mix64
    from ..stages.scan import ordered_prefix_scan

    W_US = window_min * 60_000_000

    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def endpoints(t: pa.Table) -> pa.Table:
        m = pc.equal(t.column("event_type"), "view")
        us = pc.cast(t.filter(m).column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ts_all = np.concatenate([us, us + W_US])
        dl_all = np.concatenate([np.ones(len(us), dtype=np.int64),
                                 -np.ones(len(us), dtype=np.int64)])
        order = np.argsort(ts_all, kind="stable")
        ts_all, dl_all = ts_all[order], dl_all[order]
        new = np.r_[True, ts_all[1:] != ts_all[:-1]] \
            if len(ts_all) else np.array([], bool)
        starts = np.nonzero(new)[0]
        ut = ts_all[starts]
        net = np.add.reduceat(dl_all, starts) if len(starts) else dl_all
        keep = net != 0
        ut, net = ut[keep], net[keep]
        b = (_mix64(ut.astype(np.uint64))
             % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({"t": pa.array(ut), "delta": pa.array(net),
                         "__b": pa.array(b)})

    def net_bucket(g: pd.DataFrame) -> pd.DataFrame:
        t = g["t"].to_numpy(dtype=np.int64)
        d = g["delta"].to_numpy(dtype=np.int64)
        order = np.argsort(t, kind="stable")
        t, d = t[order], d[order]
        new = np.r_[True, t[1:] != t[:-1]] if len(t) else np.array([], bool)
        starts = np.nonzero(new)[0]
        ut = t[starts]
        net = np.add.reduceat(d, starts) if len(starts) else d
        keep = net != 0
        return pd.DataFrame({"t": ut[keep], "delta": net[keep]})

    netted = (ds.map_batches(endpoints, batch_format="pyarrow")
              .groupby("__b").map_groups(net_bucket, batch_format="pandas"))
    scanned = ordered_prefix_scan(netted, "t", "delta", op="sum",
                                  num_buckets=num_buckets)

    def arg_partial(t: pa.Table) -> pa.Table:
        run = (t.column("prefix").to_numpy(zero_copy_only=False)
               + t.column("delta").to_numpy(zero_copy_only=False))
        ts_ = t.column("t").to_numpy(zero_copy_only=False)
        if not len(run):
            return pa.table({"mx": pa.array([], pa.int64()),
                             "t_at": pa.array([], pa.int64())})
        mx = run.max()
        return pa.table({"mx": pa.array([int(mx)]),
                         "t_at": pa.array([int(ts_[run == mx].min())])})

    parts = scanned.map_batches(arg_partial,
                                batch_format="pyarrow").to_pandas()
    gmax = int(parts["mx"].max())
    t_at = int(parts.loc[parts["mx"] == gmax, "t_at"].min())
    return pd.DataFrame({
        "max_concurrent": pd.Series([gmax], dtype="int64"),
        "first_at": pd.to_datetime([t_at], unit="us"),
    })


QUERIES["max_concurrent_views"] = max_concurrent_views
ORACLES["max_concurrent_views"] = """
    WITH run AS (
      SELECT t, SUM(delta) OVER (ORDER BY t) AS run FROM (
        SELECT t, CAST(SUM(delta) AS BIGINT) AS delta FROM (
          SELECT ts AS t, 1 AS delta FROM events WHERE event_type = 'view'
          UNION ALL
          SELECT ts + INTERVAL 10 MINUTE AS t, -1 AS delta
          FROM events WHERE event_type = 'view'
        ) GROUP BY t HAVING SUM(delta) <> 0
      )
    )
    SELECT CAST(MAX(run) AS BIGINT) AS max_concurrent,
           (SELECT MIN(t) FROM run WHERE run = (SELECT MAX(run) FROM run))
             AS first_at
    FROM run
"""


def gapfill_hourly_errors(sf_dir: str) -> pd.DataFrame:
    """Time-series gap filling (the `generate_series` / resample
    operator): hourly 'error' counts with every missing hour between
    the corpus' first and last error emitted as an explicit zero row.
    Scale shape: a pure per-batch combiner reduces events to (hour, n)
    partials (≤ corpus-hours rows per batch), the driver folds those
    small tables, and the dense hour spine is generated from min/max —
    no shuffle at all; events never leave their blocks."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])
    H_US = 3_600_000_000

    def partials(t: pa.Table) -> pa.Table:
        m = pc.equal(t.column("event_type"), "error")
        us = pc.cast(t.filter(m).column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        hr = np.sort((us // H_US) * H_US)
        new = np.r_[True, hr[1:] != hr[:-1]] if len(hr) else np.array([], bool)
        starts = np.nonzero(new)[0]
        return pa.table({
            "hour_us": pa.array(hr[starts]),
            "n": pa.array(np.diff(np.r_[starts, len(hr)]).astype(np.int64)),
        })

    parts = ds.map_batches(partials, batch_format="pyarrow").to_pandas()
    folded = parts.groupby("hour_us", as_index=False).agg(n=("n", "sum"))
    lo, hi = int(folded["hour_us"].min()), int(folded["hour_us"].max())
    spine = np.arange(lo, hi + H_US, H_US)
    n = np.zeros(len(spine), dtype=np.int64)
    pos = np.searchsorted(spine, folded["hour_us"].to_numpy())
    n[pos] = folded["n"].to_numpy(dtype=np.int64)
    return pd.DataFrame({"hour": pd.to_datetime(spine, unit="us"),
                         "n": n})


QUERIES["gapfill_hourly_errors"] = gapfill_hourly_errors
ORACLES["gapfill_hourly_errors"] = """
    WITH h AS (
      SELECT date_trunc('hour', ts) AS hr, CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE event_type = 'error' GROUP BY hr
    ), b AS (SELECT MIN(hr) AS lo, MAX(hr) AS hi FROM h)
    SELECT gs.hr AS hour, CAST(COALESCE(h.n, 0) AS BIGINT) AS n
    FROM (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
          FROM b) gs
    LEFT JOIN h ON gs.hr = h.hr
    ORDER BY hour
"""


def token_freq_score_docs(sf_dir: str, vocab_cap: int = 2_000_000
                          ) -> pd.DataFrame:
    """Corpus-frequency document scoring — the unigram-LM building
    block (a doc's score = Σ over its tokens of that token's TOTAL
    corpus count, exact integers): the distributed two-pass broadcast-
    join shape. Pass 1 folds per-block 63-bit token-hash counts on the
    driver VECTORIZED (:func:`~raysketch.stages.dedup._fold_df_counts`
    over occurrence rows — VERDICT r03 item 3 replaced the per-token
    Python dict loop); pass 2 broadcasts the (hash → count) arrays once
    and scores every document with one searchsorted + bincount per
    batch. Zero shuffles. Past ``vocab_cap`` distinct tokens the fold
    aborts and the query FALLS BACK to the two-exchange shuffle path
    (:func:`~raysketch.stages.textstats.token_freq_score_shuffle`)
    instead of raising — equality locked by
    test_token_freq_fallback_equal. Hash space is the shared 63-bit
    word hash (collision P ≈ |V|²/2⁶⁴ — the tfidf_top_terms
    precedent)."""
    import ray

    from ..stages.dedup import _fold_df_counts
    from ..stages.textstats import _hash_words_63, token_freq_score_shuffle

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def occ_rows(t: pa.Table) -> pa.Table:
        words = pc.list_flatten(pc.split_pattern(
            pc.fill_null(t.column("text"), ""), " ")).combine_chunks()
        return pa.table({"token": pa.array(_hash_words_63(words))})

    fold = _fold_df_counts(ds.map_batches(occ_rows, batch_format="pyarrow"),
                           vocab_cap)
    if fold is None:
        out = token_freq_score_shuffle(ds).to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)
    vocab, counts = fold
    vref = ray.put((vocab, counts))

    def score(t: pa.Table) -> pa.Table:
        vh, vc = ray.get(vref)
        words = pc.split_pattern(
            pc.fill_null(t.column("text"), ""), " ").combine_chunks()
        n_per = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        wh = _hash_words_63(pc.list_flatten(words))
        tok_c = vc[np.searchsorted(vh, wh)]  # every token was folded
        parent = np.repeat(np.arange(t.num_rows), n_per)
        sc = np.bincount(parent, weights=tok_c,
                         minlength=t.num_rows).astype(np.int64)
        return pa.table({"doc_id": t.column("doc_id"),
                         "freq_score": pa.array(sc)})

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


QUERIES["token_freq_score_docs"] = token_freq_score_docs
ORACLES["token_freq_score_docs"] = """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), cnt AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY w
    )
    SELECT t.doc_id, CAST(SUM(c) AS BIGINT) AS freq_score
    FROM tok t JOIN cnt USING (w)
    GROUP BY t.doc_id ORDER BY t.doc_id
"""


def sole_return_suppliers(sf_dir: str, num_buckets: int = 64
                          ) -> pd.DataFrame:
    """TPC-H Q21 shape — the EXISTS / NOT-EXISTS pair over order
    groups: for each supplier, count orders where (a) at least one
    OTHER supplier also shipped lines (EXISTS) and (b) this supplier is
    the ONLY one with a returned ('R') line (NOT EXISTS another
    returner).  Scale shape: lineitem collapses per batch to distinct
    (orderkey, suppkey, has_r) 17-byte partials, ONE orderkey-hash
    exchange co-locates each order's suppliers, each bucket re-reduces,
    derives per-order (n_suppliers, n_returners) by segment reduceat,
    masks qualifying rows, and emits per-supplier count partials —
    the driver folds supplier-cardinality tables and resolves names
    from the small dimension."""
    import ray.data

    from ..stages.dedup import _splitmix64 as _mix64

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_returnflag"])

    def partials(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        r = pc.equal(t.column("l_returnflag"), "R").to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.lexsort((sk, ok))
        ok, sk, r = ok[order], sk[order], r[order]
        new = np.r_[True, (ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1])] \
            if len(ok) else np.array([], bool)
        starts = np.nonzero(new)[0]
        has_r = np.maximum.reduceat(r, starts) if len(starts) else r
        uok, usk = ok[starts], sk[starts]
        b = (_mix64(uok.astype(np.uint64))
             % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({"okey": pa.array(uok), "skey": pa.array(usk),
                         "has_r": pa.array(has_r), "__b": pa.array(b)})

    def finish_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ok = g["okey"].to_numpy(dtype=np.int64)
        sk = g["skey"].to_numpy(dtype=np.int64)
        r = g["has_r"].to_numpy(dtype=np.int64)
        order = np.lexsort((sk, ok))
        ok, sk, r = ok[order], sk[order], r[order]
        new_pair = np.r_[True, (ok[1:] != ok[:-1]) | (sk[1:] != sk[:-1])] \
            if len(ok) else np.array([], bool)
        ps = np.nonzero(new_pair)[0]
        has_r = np.maximum.reduceat(r, ps) if len(ps) else r
        ok, sk = ok[ps], sk[ps]
        new_ord = np.r_[True, ok[1:] != ok[:-1]] if len(ok) \
            else np.array([], bool)
        os_ = np.nonzero(new_ord)[0]
        n_supp = np.diff(np.r_[os_, len(ok)])
        n_r = np.add.reduceat(has_r, os_) if len(os_) else has_r
        seg = np.cumsum(new_ord) - 1
        qual = (has_r == 1) & (n_supp[seg] >= 2) & (n_r[seg] == 1)
        vals, occ = np.unique(sk[qual], return_counts=True)
        return pd.DataFrame({"skey": vals,
                             "part": occ.astype(np.int64)})

    parts = (li.map_batches(partials, batch_format="pyarrow")
             .groupby("__b").map_groups(finish_bucket,
                                        batch_format="pandas")
             .to_pandas())
    folded = parts.groupby("skey", as_index=False).agg(
        n_orders=("part", "sum"))
    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_name"]).to_pandas()
    out = folded.merge(supp, left_on="skey", right_on="s_suppkey")
    return out[["s_name", "n_orders"]].astype(
        {"n_orders": "int64"}).sort_values("s_name").reset_index(drop=True)


QUERIES["sole_return_suppliers"] = sole_return_suppliers
ORACLES["sole_return_suppliers"] = """
    WITH os AS (
      SELECT l_orderkey, l_suppkey,
             MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r
      FROM lineitem GROUP BY l_orderkey, l_suppkey
    ), q AS (
      SELECT l_orderkey, COUNT(*) AS n_supp, SUM(has_r) AS n_r
      FROM os GROUP BY l_orderkey
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM os JOIN q USING (l_orderkey)
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE os.has_r = 1 AND q.n_supp >= 2 AND q.n_r = 1
    GROUP BY s_name ORDER BY s_name
"""


def q22_idle_rich_customers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q22 shape — scalar-subquery filter + anti join + group:
    customers whose balance exceeds the global average positive balance
    AND who placed no urgent order, counted per nation.  Scale shape:
    the scalar is folded as an exact (Σcents, n) pair from per-batch
    combiner partials and applied by integer CROSS-MULTIPLICATION
    (cents·n > Σcents — the oracle states the identical form, so float
    division order can never flip the boundary); the NOT-EXISTS runs as
    `bucket_anti_join` (urgent orders pre-deduped per batch to bare
    8-byte keys, so the exchange carries distinct custkeys); nation
    names resolve from the broadcast dimension on the driver-folded
    ≤nations result."""
    import pyarrow.dataset as pads
    import ray.data

    from ..stages.joins import bucket_anti_join

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def bal_partial(t: pa.Table) -> pa.Table:
        cents = _cents(t.column("c_acctbal")).to_numpy(zero_copy_only=False)
        pos = cents[cents > 0]
        return pa.table({"s": pa.array([int(pos.sum())]),
                         "n": pa.array([len(pos)])})

    bal = cust.map_batches(bal_partial, batch_format="pyarrow").to_pandas()
    s_tot, n_tot = int(bal["s"].sum()), int(bal["n"].sum())

    def rich(t: pa.Table) -> pa.Table:
        cents = _cents(t.column("c_acctbal")).to_numpy(zero_copy_only=False)
        m = cents * n_tot > s_tot
        return pa.table({
            "ckey": t.column("c_custkey").filter(pa.array(m)),
            "natkey": pc.cast(t.column("c_nationkey").filter(pa.array(m)),
                              pa.int64()),
            "cents": pa.array(cents[m]),
        })

    urgent = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey"],
        filter=pads.field("o_orderpriority") == "1-URGENT",
    ).map_batches(
        lambda t: pa.table({"ckey": pc.unique(
            t.column("o_custkey").combine_chunks())}),
        batch_format="pyarrow")

    kept = bucket_anti_join(cust.map_batches(rich, batch_format="pyarrow"),
                            urgent, on="ckey")

    def nat_partial(df: pd.DataFrame) -> pd.DataFrame:
        if "natkey" not in df.columns or not len(df):
            return pd.DataFrame({"natkey": pd.Series([], dtype="int64"),
                                 "part_n": pd.Series([], dtype="int64"),
                                 "part_c": pd.Series([], dtype="int64")})
        out = df.groupby("natkey", as_index=False).agg(
            part_n=("cents", "size"), part_c=("cents", "sum"))
        return out.astype({"natkey": "int64", "part_n": "int64",
                           "part_c": "int64"})

    parts = kept.map_batches(nat_partial, batch_format="pandas").to_pandas()
    folded = parts.groupby("natkey", as_index=False).agg(
        n_cust=("part_n", "sum"), sum_acctbal_cents=("part_c", "sum"))
    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name"]).to_pandas()
    out = folded.merge(nat, left_on="natkey", right_on="n_nationkey")
    return out[["n_name", "n_cust", "sum_acctbal_cents"]].astype(
        {"n_cust": "int64", "sum_acctbal_cents": "int64"}) \
        .sort_values("n_name").reset_index(drop=True)


QUERIES["q22_idle_rich_customers"] = q22_idle_rich_customers
ORACLES["q22_idle_rich_customers"] = """
    WITH pos AS (
      SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM customer WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) > 0
    )
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS sum_acctbal_cents
    FROM customer JOIN nation ON c_nationkey = n_nationkey, pos
    WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) * pos.n > pos.s
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      )
    GROUP BY n_name ORDER BY n_name
"""


def top10_bigrams(sf_dir: str) -> pd.DataFrame:
    """Collocation heavy hitters — exact top-10 ADJACENT word pairs:
    the same two-pass Misra–Gries + exact-recount layout as
    `top10_words`, but the stream element is an order-dependent feature
    extracted inside the batch (offset-shifted join of the flattened
    word array, pairs masked at document boundaries so bigrams never
    straddle rows).  Survives unbounded bigram vocabularies: pass 1
    keeps 512 counters, pass 2 recounts only the guaranteed-superset
    candidates."""
    from ..sketches import MisraGries

    ds = _read(sf_dir, "documents", columns=["text"])

    def bigrams_of(t: pa.Table) -> pa.Table:
        w = pc.split_pattern(
            pc.fill_null(t.column("text"), ""), " ").combine_chunks()
        n_per = pc.list_value_length(w).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(w)
        if len(flat) == 0:
            return pa.table({"bigram": pa.array([], pa.string())})
        pair = pc.binary_join_element_wise(
            flat.slice(0, max(len(flat) - 1, 0)),
            flat.slice(1), " ")
        # drop pairs that straddle a document boundary: the last word
        # of each doc has no successor inside that doc
        ends = np.cumsum(n_per) - 1
        keep = np.ones(max(len(flat) - 1, 0), dtype=bool)
        keep[ends[ends < len(keep)]] = False
        return pa.table({"bigram": pair.filter(pa.array(keep))})

    grams = ds.map_batches(bigrams_of, batch_format="pyarrow")
    blob = sketch_aggregate(grams, "misragries", on="bigram", mode="bytes",
                            k=512)
    cands = [e.decode() for e, _ in MisraGries.from_bytes(blob).candidates()]
    if not cands:
        return pd.DataFrame({"bigram": [],
                             "n": pd.Series([], dtype="int64")})
    cand_arr = pa.array(cands, type=pa.string())

    def recount(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.is_in(t.column("bigram"), value_set=cand_arr))
        vc = pc.value_counts(sel.column("bigram").combine_chunks())
        return pa.table({"bigram": vc.field("values"),
                         "part_n": vc.field("counts")})

    parts = grams.map_batches(recount, batch_format="pyarrow").to_pandas()
    out = parts.groupby("bigram", as_index=False)["part_n"].sum() \
        .rename(columns={"part_n": "n"})
    out["n"] = out["n"].astype("int64")
    out = out.sort_values(["n", "bigram"], ascending=[False, True]).head(10)
    return out.reset_index(drop=True)


QUERIES["top10_bigrams"] = top10_bigrams
ORACLES["top10_bigrams"] = """
    WITH lists AS (SELECT string_split(text, ' ') AS l FROM documents),
    big AS (SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p
            FROM lists)
    SELECT p[1] || ' ' || p[2] AS bigram, CAST(COUNT(*) AS BIGINT) AS n
    FROM big GROUP BY 1 ORDER BY n DESC, bigram LIMIT 10
"""


def _word_edge_dataset(sf_dir: str, num_buckets: int = 64):
    """Globally-distinct directed word-adjacency edges (u→v iff the
    bigram "u v" occurs anywhere in documents): per-batch distinct
    pairs bound the exchange, one pair-hash bucket shuffle finishes
    the global dedup, materialized once so iterative consumers
    (PageRank, BFS) stream it per pass without re-reading text."""
    from ..stages.dedup import _splitmix64 as _mix64

    ds = _read(sf_dir, "documents", columns=["text"])

    def bigram_pairs(t: pa.Table) -> pa.Table:
        w = pc.split_pattern(
            pc.fill_null(t.column("text"), ""), " ").combine_chunks()
        n_per = pc.list_value_length(w).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(w)
        if len(flat) < 2:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string())})
        ends = np.cumsum(n_per) - 1
        keep = np.ones(len(flat) - 1, dtype=bool)
        keep[ends[ends < len(keep)]] = False
        a = flat.slice(0, len(flat) - 1).filter(pa.array(keep))
        b = flat.slice(1).filter(pa.array(keep))
        tt = pa.table({"w1": a, "w2": b})
        # batch-local dedup so the exchange carries distinct pairs
        df = tt.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = ds.map_batches(bigram_pairs, batch_format="pyarrow")

    def tag(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        h = pd.util.hash_pandas_object(
            df["w1"] + "\x00" + df["w2"], index=False).to_numpy()
        b = (_mix64(h) % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column("__b", pa.array(b))

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g[["w1", "w2"]].drop_duplicates()

    return (pairs.map_batches(tag, batch_format="pyarrow")
            .groupby("__b").map_groups(dedup_bucket,
                                       batch_format="pandas")
            .materialize())


def pagerank_word_graph(sf_dir: str, iters: int = 2,
                        num_buckets: int = 64) -> pd.DataFrame:
    """Distributed PageRank over the word-adjacency graph (nodes =
    words, directed edge u→v iff the bigram "u v" occurs anywhere) —
    the iterative broadcast-vector graph pattern, with EXACT int64
    arithmetic so the result is bit-identical at any partitioning AND
    SQL-expressible (fixed-point scale 10^12; every division is an
    explicit floor the oracle states with `//`).

    Scale shape: the rank vector is node-bounded (broadcast each
    iteration, like the k-means centroids); edges are a DATASET —
    per-batch distinct pairs, one hash exchange makes them globally
    distinct, materialized once and streamed per iteration;
    out-degrees and per-iteration contributions fold as node-length
    int64 partial vectors (per-batch bincount), never edge rows, so
    each Lloyd-style pass is zero-shuffle."""
    import ray

    from ..stages.dedup import _splitmix64 as _mix64

    S = 1_000_000_000_000  # fixed-point rank scale

    edges = _word_edge_dataset(sf_dir, num_buckets)

    # node vocabulary: driver fold of per-batch distinct endpoints
    # (node-bounded by construction — the same cap argument as the
    # broadcast rank vector itself)
    vocab_set: set = set()
    for b in edges.iter_batches(batch_format="pyarrow", batch_size=None):
        vocab_set.update(b.column("w1").to_pylist())
        vocab_set.update(b.column("w2").to_pylist())
    vocab = pd.Index(sorted(vocab_set))
    n = len(vocab)

    def fold_vec(make_partial):
        out = np.zeros(n, dtype=np.int64)
        for b in edges.map_batches(make_partial, batch_format="pyarrow",
                                   batch_size=None) \
                .iter_batches(batch_format="pyarrow", batch_size=None):
            if b.num_rows:
                out += np.asarray(b.column("v").to_pylist()[0],
                                  dtype=np.int64)
        return out

    vocab_b = ray.put(vocab)

    def deg_partial(t: pa.Table) -> pa.Table:
        voc = ray.get(vocab_b)
        i = voc.get_indexer(t.column("w1").to_pandas())
        d = np.bincount(i, minlength=n).astype(np.int64)
        return pa.table({"v": pa.array([d.tolist()])})

    deg = fold_vec(deg_partial)
    rank = np.full(n, S, dtype=np.int64)
    for _ in range(iters):
        rank_ref = ray.put(rank)

        def contrib_partial(t: pa.Table) -> pa.Table:
            voc = ray.get(vocab_b)
            r = ray.get(rank_ref)
            i = voc.get_indexer(t.column("w1").to_pandas())
            j = voc.get_indexer(t.column("w2").to_pandas())
            c = r[i] // np.maximum(deg[i], 1)
            out = np.zeros(n, dtype=np.int64)
            np.add.at(out, j, c)
            return pa.table({"v": pa.array([out.tolist()])})

        s = fold_vec(contrib_partial)
        rank = (15 * S) // 100 + (85 * s) // 100

    return pd.DataFrame({"word": vocab.to_numpy(),
                         "rank_scaled": rank}).sort_values("word") \
        .reset_index(drop=True)


QUERIES["pagerank_word_graph"] = pagerank_word_graph
ORACLES["pagerank_word_graph"] = """
    WITH lists AS (SELECT string_split(text, ' ') AS l FROM documents),
    big AS (SELECT DISTINCT p[1] AS w1, p[2] AS w2 FROM (
      SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p FROM lists
    )),
    nodes AS (SELECT w1 AS w FROM big UNION SELECT w2 FROM big),
    deg AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS d FROM big GROUP BY w1),
    c1 AS (
      SELECT w2 AS w, SUM(CAST(1000000000000 AS BIGINT) // deg.d) AS s
      FROM big JOIN deg USING (w1) GROUP BY w2
    ),
    r1 AS (
      SELECT n.w,
             150000000000 + (85 * COALESCE(c1.s, 0)) // 100 AS r
      FROM nodes n LEFT JOIN c1 ON n.w = c1.w
    ),
    c2 AS (
      SELECT w2 AS w, SUM(r1.r // deg.d) AS s
      FROM big JOIN deg USING (w1) JOIN r1 ON r1.w = big.w1 GROUP BY w2
    ),
    r2 AS (
      SELECT n.w,
             150000000000 + (85 * COALESCE(c2.s, 0)) // 100 AS r
      FROM nodes n LEFT JOIN c2 ON n.w = c2.w
    )
    SELECT w AS word, CAST(r AS BIGINT) AS rank_scaled
    FROM r2 ORDER BY word
"""


def paginate_orders(sf_dir: str, offset: int = 100, limit: int = 20
                    ) -> pd.DataFrame:
    """Global ORDER BY … OFFSET … LIMIT without an all-to-all sort —
    the deep-pagination operator: page rows [offset, offset+limit) of
    orders sorted by (totalprice DESC, orderkey ASC).  The 0-based
    global rank is a prefix COUNT over the descending-monotone
    composite key ((MAXC − price_cents) << 32 | orderkey) via
    `ordered_prefix_scan` (range-bucket partials + ONE 16-byte-row
    exchange); the page is then a vectorized rank-window filter — only
    `limit` rows ever reach the driver, at ANY offset depth, where a
    sort-then-skip materializes and orders the whole prefix."""
    from ..stages.scan import ordered_prefix_scan

    MAXC = np.int64(1) << np.int64(40)  # > any order price in cents

    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        okey = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        if len(okey) and okey.max() >= (1 << 32):
            raise ValueError("orderkey >= 2^32: widen the scan key")
        cents = _cents(t.column("o_totalprice")).to_numpy(
            zero_copy_only=False)
        if len(cents) and cents.max() >= MAXC:
            raise ValueError("price cents >= 2^40: widen the scan key")
        return pa.table({
            "key": pa.array(((MAXC - cents) << np.int64(32)) | okey),
            "one": pa.array(np.ones(len(okey), dtype=np.int64)),
            "o_orderkey": pa.array(okey),
            "cents": pa.array(cents),
        })

    scan = ordered_prefix_scan(
        ds.map_batches(prep, batch_format="pyarrow"),
        "key", "one", op="sum", carry_cols=["o_orderkey", "cents"])

    def page(t: pa.Table) -> pa.Table:
        rank = t.column("prefix").to_numpy(zero_copy_only=False)
        m = (rank >= offset) & (rank < offset + limit)
        return pa.table({
            "rnk": pa.array(rank[m] + 1),
            "o_orderkey": t.column("o_orderkey").filter(pa.array(m)),
            "price_cents": t.column("cents").filter(pa.array(m)),
        })

    out = scan.map_batches(page, batch_format="pyarrow").to_pandas()
    return out.sort_values("rnk").reset_index(drop=True).astype(
        {"rnk": "int64", "o_orderkey": "int64", "price_cents": "int64"})


QUERIES["paginate_orders"] = paginate_orders
ORACLES["paginate_orders"] = """
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey)
                AS BIGINT) AS rnk,
           o_orderkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 100
"""


def purchases_near_errors(sf_dir: str, window_s: int = 300,
                          cell_min: int = 60, num_buckets: int = 64
                          ) -> pd.DataFrame:
    """UNKEYED time-window EXISTS join — purchases with at least one
    error anywhere in the preceding 5 minutes (no shared key to hash on):
    the range-cell REPLICATION join.  Time is cut into cells much wider
    than the window; each error row is emitted into every cell its
    [t, t+60s] influence range touches (≤2 copies), each purchase into
    exactly its own cell — so a purchase's full look-back window is
    guaranteed co-resident and the EXISTS check is a per-cell
    searchsorted, complete by construction.  One cell-hash exchange of
    9-byte rows; per-cell daily-count partials fold on the driver.
    This is the partitioning trick banded/theta joins need when there
    is no equality key to bucket on."""
    import ray.data

    from ..stages.dedup import _splitmix64 as _mix64

    W = window_s * 1_000_000
    CELL = cell_min * 60_000_000
    assert CELL > W, "cell must dominate the window"
    DAY_US = 86_400_000_000

    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def cells(t: pa.Table) -> pa.Table:
        et = t.column("event_type")
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False)
        is_p = pc.equal(et, "purchase").to_numpy(zero_copy_only=False)
        is_e = pc.equal(et, "error").to_numpy(zero_copy_only=False)
        pt = us[is_p]
        et_ = us[is_e]
        # errors replicate into the cell of t and of t+W (deduped)
        c1, c2 = et_ // CELL, (et_ + W) // CELL
        rep = c2 != c1
        ets = np.concatenate([et_, et_[rep]])
        ecs = np.concatenate([c1, c2[rep]])
        ts_all = np.concatenate([pt, ets])
        cs_all = np.concatenate([pt // CELL, ecs])
        kind = np.concatenate([np.ones(len(pt), dtype=bool),
                               np.zeros(len(ets), dtype=bool)])
        b = (_mix64(cs_all.astype(np.uint64))
             % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({"t": pa.array(ts_all), "cell": pa.array(cs_all),
                         "is_p": pa.array(kind), "__b": pa.array(b)})

    def exists_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for cell, gc in g.groupby("cell"):
            p = np.sort(gc.loc[gc["is_p"], "t"].to_numpy(dtype=np.int64))
            e = np.sort(gc.loc[~gc["is_p"], "t"].to_numpy(dtype=np.int64))
            if not len(p):
                continue
            # keep only purchases physically in this cell (errors are
            # the replicated side)
            p = p[p // CELL == cell]
            if not len(p) or not len(e):
                hits = np.zeros(0, dtype=np.int64)
            else:
                lo = np.searchsorted(e, p - W, side="left")
                hi = np.searchsorted(e, p, side="right")
                hits = p[hi > lo]
            if len(hits):
                day = (hits // DAY_US) * DAY_US
                vals, occ = np.unique(day, return_counts=True)
                out.append(pd.DataFrame(
                    {"day_us": vals, "part": occ.astype(np.int64)}))
        if not out:
            return pd.DataFrame({"day_us": pd.Series([], dtype="int64"),
                                 "part": pd.Series([], dtype="int64")})
        return pd.concat(out, ignore_index=True)

    parts = (ds.map_batches(cells, batch_format="pyarrow")
             .groupby("__b").map_groups(exists_bucket,
                                        batch_format="pandas")
             .to_pandas())
    if not len(parts) or "day_us" not in parts.columns:
        # no purchase had an error in its window (schema-less empty
        # blocks lose their columns on the way back)
        return pd.DataFrame({"day": pd.Series([], dtype="datetime64[us]"),
                             "n": pd.Series([], dtype="int64")})
    folded = parts.groupby("day_us", as_index=False).agg(n=("part", "sum"))
    return pd.DataFrame({
        "day": pd.to_datetime(folded["day_us"], unit="us"),
        "n": folded["n"].astype("int64"),
    }).sort_values("day").reset_index(drop=True)


QUERIES["purchases_near_errors"] = purchases_near_errors
ORACLES["purchases_near_errors"] = """
    SELECT date_trunc('day', p.ts) AS day, CAST(COUNT(*) AS BIGINT) AS n
    FROM events p
    WHERE p.event_type = 'purchase' AND EXISTS (
      SELECT 1 FROM events e
      WHERE e.event_type = 'error'
        AND e.ts <= p.ts AND e.ts > p.ts - INTERVAL 5 MINUTE
    )
    GROUP BY day ORDER BY day
"""


def embedding_sq_norms(sf_dir: str) -> pd.DataFrame:
    """Vector-column numeric kernel, exact: per-embedding squared L2
    norm in fixed-point 2^24 (components scaled losslessly — float32
    · 2^24 is exact in float64 — then rounded HALF-AWAY like SQL
    ROUND, squared and summed in int64: ≤ 2^48·dim, no overflow).
    Zero shuffle: the list column flattens zero-copy per batch and the
    row-wise reduce is one reshape+sum.  The SQL twin unnests and
    re-groups — two exchanges this layout never pays."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def norms(t: pa.Table) -> pa.Table:
        col = t.column("embedding").combine_chunks()
        n = len(col)
        flat = col.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        y = flat * np.float64(1 << 24)
        q = np.copysign(np.floor(np.abs(y) + 0.5), y).astype(np.int64)
        sq = (q * q).reshape(n, -1).sum(axis=1)
        return pa.table({"vec_id": t.column("vec_id"),
                         "sq_norm": pa.array(sq)})

    out = ds.map_batches(norms, batch_format="pyarrow").to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


QUERIES["embedding_sq_norms"] = embedding_sq_norms
ORACLES["embedding_sq_norms"] = """
    SELECT vec_id, CAST(SUM(c * c) AS BIGINT) AS sq_norm
    FROM (
      SELECT vec_id,
             unnest(list_transform(
               embedding, x -> CAST(ROUND(x * 16777216) AS BIGINT))) AS c
      FROM embeddings
    )
    GROUP BY vec_id ORDER BY vec_id
"""


def cheapest_supplier_per_part(sf_dir: str, num_buckets: int = 64,
                               max_size: int = 25) -> pd.DataFrame:
    """TPC-H Q2 shape — correlated-MIN subquery: for each part in a
    dimension-restricted set (p_size <= max_size, standing in for Q2's
    region restriction), the supplier offering the cheapest lineitem
    price, deterministic tiebreak on the smaller suppkey.

    Scale shape: the eligible-part keyset and the supplier-name map are
    dimension broadcasts (ray.put once, searchsorted per batch — swap
    to stages.joins.bucket_semi_join past memory); lineitem reduces
    per batch to ONE argmin partial row per part seen (pkey, cents,
    skey lexicographic head), then a single pkey-hash bucket exchange
    finishes the argmin with the same lexsort+head pass.  No window
    function, no global sort; the driver only ever sees the final
    per-part winners (the query's own result)."""
    import pyarrow.dataset as pads
    import ray

    from ..stages.dedup import _splitmix64 as _mix64

    part = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand"],
        filter=(pads.field("p_size") <= max_size),
    ).to_pandas()
    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_name"]).to_pandas()
    pk = np.sort(part["p_partkey"].to_numpy(dtype=np.int64))
    keys_ref = ray.put(pk)

    def argmin_partial(t: pa.Table) -> pa.Table:
        p = t.column("l_partkey").to_numpy(zero_copy_only=False)
        keys = ray.get(keys_ref)
        pos = np.minimum(np.searchsorted(keys, p), len(keys) - 1)
        m = len(keys) > 0
        m = (keys[pos] == p) if m else np.zeros(len(p), dtype=bool)
        if not m.any():
            return pa.table({"p": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "__b": pa.array([], pa.int64())})
        p = p[m].astype(np.int64)
        c = _cents(t.column("l_extendedprice")) \
            .to_numpy(zero_copy_only=False)[m]
        s = t.column("l_suppkey").to_numpy(zero_copy_only=False)[m] \
            .astype(np.int64)
        order = np.lexsort((s, c, p))
        p, c, s = p[order], c[order], s[order]
        head = np.r_[True, p[1:] != p[:-1]]
        p, c, s = p[head], c[head], s[head]
        return pa.table({
            "p": pa.array(p), "c": pa.array(c), "s": pa.array(s),
            "__b": pa.array((_mix64(p.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        p = g["p"].to_numpy(dtype=np.int64)
        c = g["c"].to_numpy(dtype=np.int64)
        s = g["s"].to_numpy(dtype=np.int64)
        order = np.lexsort((s, c, p))
        p, c, s = p[order], c[order], s[order]
        head = np.r_[True, p[1:] != p[:-1]]
        return pd.DataFrame({"p_partkey": p[head], "best_cents": c[head],
                             "best_suppkey": s[head]})

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_extendedprice"])
    out = li.map_batches(argmin_partial, batch_format="pyarrow") \
        .groupby("__b").map_groups(finish, batch_format="pandas") \
        .to_pandas()
    out = out.merge(part, on="p_partkey") \
        .merge(supp.rename(columns={"s_suppkey": "best_suppkey"}),
               on="best_suppkey")
    out = out[["p_partkey", "p_brand", "best_cents", "best_suppkey",
               "s_name"]]
    return out.sort_values("p_partkey").reset_index(drop=True)


QUERIES["cheapest_supplier_per_part"] = cheapest_supplier_per_part
ORACLES["cheapest_supplier_per_part"] = """
    WITH c AS (
      SELECT l_partkey,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
             l_suppkey
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_size <= 25
    ), w AS (
      SELECT l_partkey AS p_partkey, cents AS best_cents,
             l_suppkey AS best_suppkey,
             ROW_NUMBER() OVER (PARTITION BY l_partkey
                                ORDER BY cents, l_suppkey) AS rn
      FROM c)
    SELECT p_partkey, p_brand, best_cents, best_suppkey, s_name
    FROM w
    JOIN part USING (p_partkey)
    JOIN supplier ON best_suppkey = s_suppkey
    WHERE rn = 1
    ORDER BY p_partkey
"""


def promo_revenue_ratio(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q14 shape — ratio of a conditional aggregate to the total
    over one shipdate month (read-side predicate pushdown prunes the
    other ~80 months' row groups).  The part→is-promo flag is a
    dimension broadcast; each batch folds to ONE (promo, total) partial
    pair, so the query is zero-shuffle.  The ratio is reported in exact
    integer basis points (promo·10000 // total) so both engines divide
    the same integers — no float division can disagree."""
    import datetime

    import pyarrow.dataset as pads
    import ray

    part = _read(sf_dir, "part", columns=["p_partkey", "p_type"]) \
        .to_pandas()
    order = np.argsort(part["p_partkey"].to_numpy())
    dims_ref = ray.put((
        part["p_partkey"].to_numpy(dtype=np.int64)[order],
        (part["p_type"].to_numpy() == "PROMO")[order],
    ))

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_extendedprice", "l_discount"],
        filter=(
            (pads.field("l_shipdate") >= datetime.datetime(1995, 9, 1))
            & (pads.field("l_shipdate") < datetime.datetime(1995, 10, 1))
        ),
    )

    def fold(t: pa.Table) -> pa.Table:
        keys, promo = ray.get(dims_ref)
        p = t.column("l_partkey").to_numpy(zero_copy_only=False)
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(price * (1.0 - disc) * 100.0 + 0.5) \
            .astype(np.int64)
        pos = np.minimum(np.searchsorted(keys, p), max(len(keys) - 1, 0))
        is_promo = (keys[pos] == p) & promo[pos] if len(keys) \
            else np.zeros(len(p), dtype=bool)
        return pa.table({
            "promo_cents": pa.array([int(cents[is_promo].sum())]),
            "total_cents": pa.array([int(cents.sum())]),
        })

    parts = li.map_batches(fold, batch_format="pyarrow").to_pandas()
    promo = int(parts["promo_cents"].sum())
    total = int(parts["total_cents"].sum())
    return pd.DataFrame({
        "promo_cents": pd.Series([promo], dtype="int64"),
        "total_cents": pd.Series([total], dtype="int64"),
        "promo_bp": pd.Series([promo * 10000 // total if total else 0],
                              dtype="int64"),
    })


QUERIES["promo_revenue_ratio"] = promo_revenue_ratio
ORACLES["promo_revenue_ratio"] = """
    WITH r AS (
      SELECT CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT) AS cents,
             (p_type = 'PROMO') AS is_promo
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= DATE '1995-09-01'
        AND l_shipdate <  DATE '1995-10-01')
    SELECT
      CAST(SUM(CASE WHEN is_promo THEN cents ELSE 0 END) AS BIGINT)
        AS promo_cents,
      CAST(SUM(cents) AS BIGINT) AS total_cents,
      CAST((SUM(CASE WHEN is_promo THEN cents ELSE 0 END) * 10000)
           // SUM(cents) AS BIGINT) AS promo_bp
    FROM r
"""


def important_parts(sf_dir: str, num_buckets: int = 64,
                    mult=(11, 10)) -> pd.DataFrame:
    """TPC-H Q11 shape — HAVING against a scalar subquery over the SAME
    aggregation: parts whose revenue exceeds 11/10 of the MEAN per-part
    revenue (scale-free, so a stable fraction qualifies at any sf —
    a fixed share-of-total threshold starves as the part count grows;
    the uniform part assignment keeps per-part revenue within ~±20% of
    the mean, so the cut must sit inside that band).

    Scale shape: lineitem reduces per batch to (partkey, rev) partials,
    ONE pkey-hash exchange finishes per-part revenue (lexsort/reduceat)
    into a materialized parts-revenue dataset (|parts| rows — the
    dimension's cardinality, never lineitem's); the global total folds
    from per-block partial sums (driver sees ≤ n_blocks int64s, not
    part rows), and the threshold filter applies the broadcast
    (total, n_parts) by integer cross-multiplication
    rev·n_parts·10 > 11·total — the oracle states the identical
    integer form, so the boundary can never flip."""
    from ..stages.dedup import _splitmix64 as _mix64

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_extendedprice", "l_discount"])

    def partials(t: pa.Table) -> pa.Table:
        p = t.column("l_partkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(price * (1.0 - disc) * 100.0 + 0.5) \
            .astype(np.int64)
        uk, inv = np.unique(p, return_inverse=True)
        # int64 scatter-add (float bincount is exact only to 2^53)
        rev = np.zeros(len(uk), dtype=np.int64)
        np.add.at(rev, inv, cents)
        return pa.table({
            "p": pa.array(uk), "rev": pa.array(rev),
            "__b": pa.array((_mix64(uk.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        p = g["p"].to_numpy(dtype=np.int64)
        r = g["rev"].to_numpy(dtype=np.int64)
        order = np.argsort(p, kind="stable")
        p, r = p[order], r[order]
        starts = np.r_[0, np.flatnonzero(p[1:] != p[:-1]) + 1]
        return pd.DataFrame({"p_partkey": p[starts],
                             "rev_cents": np.add.reduceat(r, starts)})

    per_part = li.map_batches(partials, batch_format="pyarrow") \
        .groupby("__b").map_groups(finish, batch_format="pandas") \
        .materialize()

    def block_sum(t: pa.Table) -> pa.Table:
        v = t.column("rev_cents").to_numpy(zero_copy_only=False)
        return pa.table({"s": pa.array([int(v.sum())]),
                         "n": pa.array([len(v)])})

    meta = per_part.map_batches(block_sum, batch_format="pyarrow") \
        .to_pandas()
    total, n_parts = int(meta["s"].sum()), int(meta["n"].sum())

    def keep(t: pa.Table) -> pa.Table:
        r = t.column("rev_cents").to_numpy(zero_copy_only=False)
        num, den = mult
        m = r * n_parts * den > num * total
        return t.filter(pa.array(m))

    out = per_part.map_batches(keep, batch_format="pyarrow").to_pandas()
    if not len(out):
        out = pd.DataFrame({"p_partkey": pd.Series([], dtype="int64"),
                            "rev_cents": pd.Series([], dtype="int64")})
    return out.sort_values("p_partkey").reset_index(drop=True) \
        .astype({"p_partkey": "int64", "rev_cents": "int64"})


QUERIES["important_parts"] = important_parts
ORACLES["important_parts"] = """
    WITH pr AS (
      SELECT l_partkey AS p_partkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS rev_cents
      FROM lineitem GROUP BY l_partkey)
    SELECT p_partkey, rev_cents FROM pr
    WHERE rev_cents * (SELECT COUNT(*) FROM pr) * 10
          > 11 * (SELECT SUM(rev_cents) FROM pr)
    ORDER BY p_partkey
"""


def median_value_by_user(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """Exact per-group median at HIGH group cardinality (one group per
    user — the domain scales with the data, unlike the 5-type
    `median_value_by_event_type`): medians are order statistics so no
    combiner can shrink the exchange, but the shuffle carries only
    16-byte (user, cents) rows bucketed by user hash, and inside a
    bucket ONE lexsort + reduceat + gather resolves EVERY user's
    k = (n−1)//2 element simultaneously — no per-group sort, no
    per-group Python. The distributed exact twin of what KLL/t-digest
    answer approximately when even the bucketed exchange is too big."""
    from ..stages.dedup import _splitmix64 as _mix64

    ds = _read(sf_dir, "events", columns=["user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "u": t.column("user_id"),
            "c": _cents(t.column("value")),
            "__b": pa.array((_mix64(uid.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def medians(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(dtype=np.int64)
        c = g["c"].to_numpy(dtype=np.int64)
        order = np.lexsort((c, u))
        u, c = u[order], c[order]
        starts = np.r_[0, np.flatnonzero(u[1:] != u[:-1]) + 1]
        counts = np.diff(np.r_[starts, len(u)])
        at = starts + (counts - 1) // 2
        return pd.DataFrame({
            "user_id": u[starts],
            "median_cents": c[at],
            "n": counts.astype(np.int64),
        })

    out = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("__b").map_groups(medians, batch_format="pandas")
    df = out.to_pandas().sort_values("user_id").reset_index(drop=True)
    return df.astype({"user_id": "int64", "median_cents": "int64", "n": "int64"})


QUERIES["median_value_by_user"] = median_value_by_user
ORACLES["median_value_by_user"] = """
    SELECT user_id,
           CAST(vc AS BIGINT) AS median_cents,
           CAST(cnt AS BIGINT) AS n
    FROM (
      SELECT user_id, vc,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY vc) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS cnt
      FROM (SELECT user_id, CAST(ROUND(value*100) AS BIGINT) AS vc FROM events)
    )
    WHERE rn = (cnt + 1) // 2
    ORDER BY user_id
"""


def event_type_transitions(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """First-order Markov transition counts over each user's
    time-ordered event stream — the sequence-feature operator behind
    session language models: pairs are an ORDER-DEPENDENT feature of
    the (user, ts, event_id) sort, so rows take ONE user-hash bucket
    shuffle (type pre-encoded to a 1-byte index, 25-byte rows), then a
    single within-bucket lexsort forms every user's consecutive pairs
    at once (shifted arrays, same-user mask at partition boundaries)
    and a bincount over prev*5+next collapses the bucket to ≤25
    (prev, next, n) partials — the driver folds ≤25·num_buckets rows."""
    from ..stages.dedup import _splitmix64 as _mix64

    TYPES = ["click", "error", "purchase", "signup", "view"]
    NT = np.int64(len(TYPES))

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        idx = pc.index_in(t.column("event_type"), value_set=pa.array(TYPES))
        if idx.null_count:
            raise ValueError("event_type outside the transition domain")
        return pa.table({
            "u": t.column("user_id"),
            "ts": pc.cast(t.column("ts"), pa.int64()),
            "e": t.column("event_id"),
            "t": pc.cast(idx, pa.int8()),
            "__b": pa.array((_mix64(uid.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(dtype=np.int64)
        ts = g["ts"].to_numpy(dtype=np.int64)
        e = g["e"].to_numpy(dtype=np.int64)
        t = g["t"].to_numpy(dtype=np.int64)
        order = np.lexsort((e, ts, u))
        u, t = u[order], t[order]
        if len(u) < 2:
            return pd.DataFrame({"p": pd.Series([], dtype="int64"),
                                 "q": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        same = u[1:] == u[:-1]
        code = t[:-1][same] * NT + t[1:][same]
        cnt = np.bincount(code, minlength=int(NT * NT)).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"p": nz // NT, "q": nz % NT, "n": cnt[nz]})

    part = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("__b").map_groups(pairs, batch_format="pandas").to_pandas()
    agg = part.groupby(["p", "q"], as_index=False)["n"].sum()
    lab = np.array(TYPES, dtype=object)
    return pd.DataFrame({
        "prev_type": lab[agg["p"].to_numpy(dtype=np.int64)],
        "next_type": lab[agg["q"].to_numpy(dtype=np.int64)],
        "n": agg["n"].astype("int64"),
    }).sort_values(["prev_type", "next_type"]).reset_index(drop=True)


QUERIES["event_type_transitions"] = event_type_transitions
ORACLES["event_type_transitions"] = """
    WITH s AS (
      SELECT event_type AS next_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events)
    SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM s WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    ORDER BY prev_type, next_type
"""


def outlier_events_zscore(sf_dir: str, k_sigma: int = 2) -> pd.DataFrame:
    """Per-group z-score outlier detection in EXACT integer arithmetic
    — the anomaly-filter a curation pipeline runs before training:
    events whose value sits more than k·σ from their type's mean.

    Two zero-shuffle streaming passes. Pass 1 folds per-type moments
    (n, Σc, Σc² with the c² halves split around 2^32 so int64 never
    overflows); the driver forms T = k²·(n·Σc² − (Σc)²) in Python ints
    and takes t = isqrt(T), exact because for integers d² > T ⇔ |d| >
    ⌊√T⌋. Pass 2 flags rows where |n·c − Σc| > t with the ≤5-entry
    threshold table captured in the closure — no join, no shuffle,
    and no float ever enters, so the oracle (HUGEINT cross-multiplied
    variance, the identical inequality) hash-matches exactly.
    Bound: needs n·max|c| < 2^63 (≈9e8 rows/group at 1e10 cents);
    past that the filter pass splits d into (hi,lo) like the moments."""
    import math

    TYPES = ["click", "error", "purchase", "signup", "view"]

    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def moments(t: pa.Table) -> pd.DataFrame:
        idx = pc.index_in(t.column("event_type"), value_set=pa.array(TYPES))
        if idx.null_count:
            raise ValueError("event_type outside the outlier domain")
        g = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        c = _cents(t.column("value")).to_numpy(zero_copy_only=False)
        cc = c * c
        hi, lo = cc >> np.int64(32), cc & np.int64((1 << 32) - 1)
        nt = len(TYPES)
        return pd.DataFrame({
            "g": np.arange(nt, dtype=np.int64),
            "n": np.bincount(g, minlength=nt).astype(np.int64),
            "s": np.array([int(c[g == i].sum()) for i in range(nt)], dtype=np.int64),
            "ss_hi": np.array([int(hi[g == i].sum()) for i in range(nt)], dtype=np.int64),
            "ss_lo": np.array([int(lo[g == i].sum()) for i in range(nt)], dtype=np.int64),
        })

    p = ds.map_batches(moments, batch_format="pyarrow").to_pandas()
    n_t, s_t, thr_t = [], [], []
    for i in range(len(TYPES)):
        rows = p[p["g"] == i]
        n = int(rows["n"].sum())
        s = int(rows["s"].sum())
        ss = (int(rows["ss_hi"].sum()) << 32) + int(rows["ss_lo"].sum())
        T = (k_sigma * k_sigma) * (n * ss - s * s)
        n_t.append(n)
        s_t.append(s)
        thr_t.append(math.isqrt(T) if T >= 0 else -1)
    n_arr = np.array(n_t, dtype=np.int64)
    s_arr = np.array(s_t, dtype=np.int64)
    t_arr = np.array(thr_t, dtype=np.int64)

    def flag(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column("event_type"), value_set=pa.array(TYPES))
        g = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        c = _cents(t.column("value")).to_numpy(zero_copy_only=False)
        d = n_arr[g] * c - s_arr[g]
        m = np.abs(d) > t_arr[g]
        kept = t.filter(pa.array(m))
        return pa.table({
            "event_id": kept.column("event_id"),
            "event_type": kept.column("event_type"),
            "value_cents": _cents(kept.column("value")),
        })

    out = ds.map_batches(flag, batch_format="pyarrow").to_pandas()
    if not len(out):
        out = pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                            "event_type": pd.Series([], dtype="object"),
                            "value_cents": pd.Series([], dtype="int64")})
    return out.sort_values("event_id").reset_index(drop=True) \
        .astype({"event_id": "int64", "value_cents": "int64"})


QUERIES["outlier_events_zscore"] = outlier_events_zscore
ORACLES["outlier_events_zscore"] = """
    WITH v AS (SELECT event_id, event_type,
                      CAST(ROUND(value*100) AS BIGINT) AS c FROM events),
    st AS (SELECT event_type,
                  CAST(COUNT(*) AS HUGEINT) AS n,
                  CAST(SUM(c) AS HUGEINT) AS s,
                  SUM(CAST(c AS HUGEINT) * c) AS ss
           FROM v GROUP BY event_type)
    SELECT v.event_id, v.event_type, v.c AS value_cents
    FROM v JOIN st USING (event_type)
    WHERE (st.n * v.c - st.s) * (st.n * v.c - st.s)
          > 4 * (st.n * st.ss - st.s * st.s)
    ORDER BY v.event_id
"""


def bfs_word_graph(sf_dir: str, max_depth: int = 4,
                   num_buckets: int = 64) -> pd.DataFrame:
    """Breadth-first hop levels over the word-adjacency graph from a
    deterministic source (the lexicographically smallest edge tail) —
    the iterative frontier-expansion pattern (recursive-CTE analog of
    PageRank's fixed-iteration walk): the frontier is node-bounded so
    it broadcasts like the rank vector (ray.put once per level), and
    each level is ONE zero-shuffle streaming pass over the
    `_word_edge_dataset` materialized edges — an `is_in` mask on w1
    plus per-batch distinct w2 partials folded on the driver; first
    touch assigns the (minimal) BFS level. No edge row ever leaves
    its block after the single dedup exchange the edge set itself
    paid."""
    import ray

    edges = _word_edge_dataset(sf_dir, num_buckets)

    src_parts = edges.map_batches(
        lambda t: pa.table({"m": pa.array(
            [pc.min(t.column("w1")).as_py()] if t.num_rows else [],
            pa.string())}),
        batch_format="pyarrow").to_pandas()
    src = src_parts["m"].min()

    level = {src: 0}
    frontier = [src]
    for lvl in range(1, max_depth + 1):
        f_ref = ray.put(sorted(frontier))

        def expand(t: pa.Table, _f=f_ref) -> pa.Table:
            fr = pa.array(ray.get(_f), pa.string())
            m = pc.is_in(t.column("w1"), value_set=fr)
            return pa.table({"w": pc.unique(t.filter(m).column("w2"))})

        found: set = set()
        for b in edges.map_batches(expand, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow", batch_size=None):
            found.update(b.column("w").to_pylist())
        frontier = sorted(found - level.keys())
        if not frontier:
            break
        for w in frontier:
            level[w] = lvl

    out = pd.DataFrame({"word": list(level.keys()),
                        "level": np.array(list(level.values()), dtype=np.int64)})
    return out.sort_values("word").reset_index(drop=True)


QUERIES["bfs_word_graph"] = bfs_word_graph
ORACLES["bfs_word_graph"] = """
    WITH RECURSIVE lists AS (SELECT string_split(text, ' ') AS l FROM documents),
    big AS (SELECT DISTINCT p[1] AS w1, p[2] AS w2 FROM (
      SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p FROM lists
    )),
    bfs(w, lvl) AS (
      SELECT (SELECT MIN(w1) FROM big) AS w, 0 AS lvl
      UNION
      SELECT b.w2, bfs.lvl + 1
      FROM bfs JOIN big b ON b.w1 = bfs.w
      WHERE bfs.lvl < 4
    )
    SELECT w AS word, CAST(MIN(lvl) AS BIGINT) AS level
    FROM bfs GROUP BY w ORDER BY word
"""


def gram_matrix_embeddings(sf_dir: str) -> pd.DataFrame:
    """Exact Gram matrix of the embedding column — the D×D Σxᵢxⱼ
    precursor to covariance / PCA / whitening — computed as ONE
    zero-shuffle streaming pass: each batch quantizes components at
    fixed-point 2^12 (HALF-AWAY rounding matched to SQL ROUND),
    reshapes the flattened list zero-copy to (n, D) and emits the
    single int64 matmul partial qᵀq; the driver folds D² integers per
    batch, never rows. Per-batch entries ≤ n·2^26 so int64 is safe
    past 10^9 rows/batch; the driver fold uses Python ints so the
    TOTAL never overflows at any scale. The SQL twin pays a
    self-join of the unnested table (n·D² rows); upper triangle only,
    1-based (i, j) to match SQL ordinality."""
    ds = _read(sf_dir, "embeddings", columns=["embedding"])
    Q = np.float64(1 << 12)

    def partial(t: pa.Table) -> pa.Table:
        col = t.column("embedding").combine_chunks()
        n = len(col)
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        y = flat * Q
        q = np.copysign(np.floor(np.abs(y) + 0.5), y).astype(np.int64) \
            .reshape(n, -1)
        g = q.T @ q
        return pa.table({"g": pa.array([g.ravel().tolist()]),
                         "d": pa.array([g.shape[0]])})

    parts = ds.map_batches(partial, batch_format="pyarrow") \
        .to_pandas()
    d = int(parts["d"].iloc[0])
    total = [0] * (d * d)
    for row in parts["g"]:
        for k, v in enumerate(row):
            total[k] += int(v)
    iu, ju = np.triu_indices(d)
    g = np.array([total[i * d + j] for i, j in zip(iu, ju)], dtype=np.int64)
    return pd.DataFrame({"i": (iu + 1).astype(np.int64),
                         "j": (ju + 1).astype(np.int64),
                         "g": g})


QUERIES["gram_matrix_embeddings"] = gram_matrix_embeddings
ORACLES["gram_matrix_embeddings"] = """
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(ROUND(x * 4096) AS BIGINT)) AS v
      FROM embeddings),
    flat AS (
      SELECT vec_id, unnest(v) AS x,
             unnest(range(1, len(v) + 1)) AS i
      FROM q)
    SELECT f1.i AS i, f2.i AS j, CAST(SUM(f1.x * f2.x) AS BIGINT) AS g
    FROM flat f1 JOIN flat f2
      ON f1.vec_id = f2.vec_id AND f2.i >= f1.i
    GROUP BY f1.i, f2.i ORDER BY i, j
"""


def triangle_count_words(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """Global triangle count over the UNDIRECTED word-adjacency graph
    — the wedge-enumeration + edge-membership pattern: canonical
    (min,max) edges dedup through one pair-hash exchange; each edge
    replicates to BOTH endpoints as (center, other) rows and a
    center-hash exchange co-locates every node's neighborhood; inside
    a bucket one lexsort + vectorized pair-unranking (j from the
    triangular-number inverse with an integer fixup — no per-center
    loop) emits all wedges; wedges and edges then share ONE packed-key
    exchange where a per-bucket searchsorted membership test counts
    matched wedges, and T = matched // 3 (each triangle matches at its
    three centers). Hub nodes make wedges quadratic in degree — at
    scale the standard split (count heavy-center wedges against a
    broadcast heavy-edge set) bolts onto the same layout."""
    from ..stages.dedup import _splitmix64 as _mix64

    edges = _word_edge_dataset(sf_dir, num_buckets)

    # node vocabulary (node-bounded driver fold, as pagerank)
    vocab_set: set = set()
    for b in edges.iter_batches(batch_format="pyarrow", batch_size=None):
        vocab_set.update(b.column("w1").to_pylist())
        vocab_set.update(b.column("w2").to_pylist())
    vocab = pd.Index(sorted(vocab_set))
    NV = np.int64(len(vocab))
    import ray
    vocab_b = ray.put(vocab)

    def canon(t: pa.Table) -> pa.Table:
        voc = ray.get(vocab_b)
        i = voc.get_indexer(t.column("w1").to_pandas()).astype(np.int64)
        j = voc.get_indexer(t.column("w2").to_pandas()).astype(np.int64)
        a, b = np.minimum(i, j), np.maximum(i, j)
        m = a != b
        a, b = a[m], b[m]
        key = a * NV + b
        key = np.unique(key)
        a, b = key // NV, key % NV
        return pa.table({
            "a": pa.array(a), "b": pa.array(b),
            "__b": pa.array((_mix64(key.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g[["a", "b"]].drop_duplicates()

    und = edges.map_batches(canon, batch_format="pyarrow") \
        .groupby("__b").map_groups(dedup, batch_format="pandas") \
        .materialize()

    def replicate(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        ctr = np.concatenate([a, b])
        oth = np.concatenate([b, a])
        return pa.table({
            "c": pa.array(ctr), "o": pa.array(oth),
            "__b": pa.array((_mix64(ctr.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        c = g["c"].to_numpy(dtype=np.int64)
        o = g["o"].to_numpy(dtype=np.int64)
        order = np.lexsort((o, c))
        c, o = c[order], o[order]
        starts = np.r_[0, np.flatnonzero(c[1:] != c[:-1]) + 1]
        cnt = np.diff(np.r_[starts, len(c)])
        m = cnt * (cnt - 1) // 2
        tot = int(m.sum())
        if tot == 0:
            return pd.DataFrame({"k": pd.Series([], dtype="int64")})
        offs = np.cumsum(m) - m
        seg = np.repeat(np.arange(len(m)), m)
        p = np.arange(tot, dtype=np.int64) - offs[seg]
        # unrank p -> (i, j), i < j, ordered by j: j(j-1)/2 <= p
        j = ((1.0 + np.sqrt(1.0 + 8.0 * p.astype(np.float64))) / 2.0) \
            .astype(np.int64)
        j = np.where(j * (j - 1) // 2 > p, j - 1, j)
        j = np.where((j + 1) * j // 2 <= p, j + 1, j)
        i = p - j * (j - 1) // 2
        base = starts[seg]
        x, y = o[base + i], o[base + j]
        lo, hi = np.minimum(x, y), np.maximum(x, y)
        return pd.DataFrame({"k": lo * NV + hi})

    wedge_keys = und.map_batches(replicate, batch_format="pyarrow") \
        .groupby("__b").map_groups(wedges, batch_format="pandas")

    def side(name, val):
        def f(t: pa.Table) -> pa.Table:
            if name == "w":
                k = t.column("k").to_numpy(zero_copy_only=False)
            else:
                k = (t.column("a").to_numpy(zero_copy_only=False) * NV
                     + t.column("b").to_numpy(zero_copy_only=False))
            return pa.table({
                "k": pa.array(k),
                "s": pa.array(np.full(len(k), val, dtype=np.int8)),
                "__b": pa.array((_mix64(k.astype(np.uint64))
                                 % np.uint64(num_buckets)).astype(np.int64)),
            })
        return f

    both = wedge_keys.map_batches(side("w", 0), batch_format="pyarrow") \
        .union(und.map_batches(side("e", 1), batch_format="pyarrow"))

    def count_matched(g: pd.DataFrame) -> pd.DataFrame:
        k = g["k"].to_numpy(dtype=np.int64)
        s = g["s"].to_numpy(dtype=np.int8)
        ek = np.unique(k[s == 1])
        wk = k[s == 0]
        pos = np.searchsorted(ek, wk)
        pos[pos >= len(ek)] = max(len(ek) - 1, 0)
        hit = len(ek) and int((ek[pos] == wk).sum())
        return pd.DataFrame({"n": [int(hit)], "nw": [len(wk)]})

    parts = both.groupby("__b").map_groups(
        count_matched, batch_format="pandas").to_pandas()
    matched, n_wedges = int(parts["n"].sum()), int(parts["nw"].sum())

    n_edges = 0
    for b in und.iter_batches(batch_format="pyarrow", batch_size=None):
        n_edges += b.num_rows

    return _one_row(n_und_edges=np.int64(n_edges),
                    n_wedges=np.int64(n_wedges),
                    n_triangles=np.int64(matched // 3))


QUERIES["triangle_count_words"] = triangle_count_words
ORACLES["triangle_count_words"] = """
    WITH lists AS (SELECT string_split(text, ' ') AS l FROM documents),
    big AS (SELECT DISTINCT p[1] AS w1, p[2] AS w2 FROM (
      SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p FROM lists
    )),
    und AS (SELECT DISTINCT LEAST(w1, w2) AS a, GREATEST(w1, w2) AS b
            FROM big WHERE w1 <> w2),
    deg AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS d FROM (
      SELECT a AS w FROM und UNION ALL SELECT b AS w FROM und
    ) GROUP BY w),
    tri AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS t
      FROM und e1 JOIN und e2 ON e2.a = e1.b
                  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM und) AS n_und_edges,
           (SELECT CAST(SUM(d * (d - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
           (SELECT t FROM tri) AS n_triangles
"""


def time_weighted_avg_by_user(sf_dir: str, num_buckets: int = 64
                              ) -> pd.DataFrame:
    """Time-weighted average of a step signal per user — the integral
    Σ Δt·v_prev over consecutive events, the metric behind 'average
    balance held' / 'mean session state': exact (numerator,
    denominator) int64 pair per user so no division ever happens and
    the oracle hash is exact. Same single user-hash exchange as the
    LAG family (22-byte rows), one within-bucket lexsort forms every
    user's intervals simultaneously, per-user sums by reduceat.
    Overflow bound: Σ Δus per user ≤ the calendar span (~3e13 us/yr),
    × max cents < 2^63 — safe for any per-user horizon; past that the
    products split hi/lo like the moment folds."""
    from ..stages.dedup import _splitmix64 as _mix64

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "u": t.column("user_id"),
            "tu": pc.cast(t.column("ts"), pa.int64()),
            "e": t.column("event_id"),
            "c": _cents(t.column("value")),
            "__b": pa.array((_mix64(uid.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def integrate(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(dtype=np.int64)
        tu = g["tu"].to_numpy(dtype=np.int64)
        e = g["e"].to_numpy(dtype=np.int64)
        c = g["c"].to_numpy(dtype=np.int64)
        order = np.lexsort((e, tu, u))
        u, tu, c = u[order], tu[order], c[order]
        if len(u) < 2:
            return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                                 "num": pd.Series([], dtype="int64"),
                                 "den_us": pd.Series([], dtype="int64")})
        same = u[1:] == u[:-1]
        pu = u[:-1][same]
        if not len(pu):
            return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                                 "num": pd.Series([], dtype="int64"),
                                 "den_us": pd.Series([], dtype="int64")})
        d = (tu[1:] - tu[:-1])[same]
        w = d * c[:-1][same]
        starts = np.r_[0, np.flatnonzero(pu[1:] != pu[:-1]) + 1]
        return pd.DataFrame({
            "user_id": pu[starts],
            "num": np.add.reduceat(w, starts),
            "den_us": np.add.reduceat(d, starts),
        })

    out = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("__b").map_groups(integrate, batch_format="pandas") \
        .to_pandas()
    return out.sort_values("user_id").reset_index(drop=True) \
        .astype({"user_id": "int64", "num": "int64", "den_us": "int64"})


QUERIES["time_weighted_avg_by_user"] = time_weighted_avg_by_user
ORACLES["time_weighted_avg_by_user"] = """
    WITH s AS (SELECT user_id, event_id,
                      CAST(ROUND(value*100) AS BIGINT) AS c,
                      CAST(epoch_us(ts) AS BIGINT) AS tu
               FROM events),
    p AS (SELECT user_id,
                 LAG(c) OVER (PARTITION BY user_id
                              ORDER BY tu, event_id) AS pc,
                 tu - LAG(tu) OVER (PARTITION BY user_id
                                    ORDER BY tu, event_id) AS d
          FROM s)
    SELECT user_id,
           CAST(SUM(d * pc) AS BIGINT) AS num,
           CAST(SUM(d) AS BIGINT) AS den_us
    FROM p WHERE pc IS NOT NULL
    GROUP BY user_id ORDER BY user_id
"""


def jaccard_sources_vocab(sf_dir: str, num_buckets: int = 64
                          ) -> pd.DataFrame:
    """Pairwise EXACT Jaccard between every source's word vocabulary —
    k-way distributed set algebra over an unbounded element domain
    (the 2-set `user_set_ops` generalized to all k(k−1)/2 pairs in ONE
    pass): per-batch distinct (word, source-bit) partials OR-fold per
    word inside each word-hash bucket (bitwise_or.reduceat), each
    bucket collapses to ≤distinct-masks (mask, n) partials, and the
    driver answers every pair from the mask histogram — intersections
    and unions for all 190 pairs without touching words again.
    Exchange volume: distinct (word, source) pairs, 12-byte rows;
    driver table bounded by distinct masks ≤ min(vocab, 2^k)."""
    from ..stages.dedup import _splitmix64 as _mix64

    ds = _read(sf_dir, "documents", columns=["source", "text"])

    # source domain: driver fold of per-batch distinct sources
    src_parts = ds.map_batches(
        lambda t: pa.table({"s": pc.unique(t.column("source"))}),
        batch_format="pyarrow").to_pandas()
    sources = sorted(set(src_parts["s"]))
    k = len(sources)
    if k > 62:
        raise ValueError("bitmask layout supports <=62 sources; "
                         "shard the pair matrix past that")
    src_idx = pd.Index(sources)

    def pairs(t: pa.Table) -> pa.Table:
        w = pc.split_pattern(
            pc.fill_null(t.column("text"), ""), " ").combine_chunks()
        cnt = pc.list_value_length(w).to_numpy(zero_copy_only=False)
        flat = w.flatten()
        si = src_idx.get_indexer(t.column("source").to_pandas()) \
            .astype(np.int64)
        bit = np.left_shift(np.int64(1), np.repeat(si, cnt))
        words = flat.to_numpy(zero_copy_only=False)
        order = np.argsort(words, kind="stable")
        words, bit = words[order], bit[order]
        if len(words):
            starts = np.r_[0, np.flatnonzero(words[1:] != words[:-1]) + 1]
            words = words[starts]
            bit = np.bitwise_or.reduceat(bit, starts)
        df = pd.DataFrame({"w": words, "m": bit})
        h = pd.util.hash_pandas_object(df["w"], index=False).to_numpy()
        df["__b"] = (_mix64(h) % np.uint64(num_buckets)).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        w = g["w"].to_numpy()
        m = g["m"].to_numpy(dtype=np.int64)
        order = np.argsort(w, kind="stable")
        w, m = w[order], m[order]
        starts = np.r_[0, np.flatnonzero(w[1:] != w[:-1]) + 1]
        masks = np.bitwise_or.reduceat(m, starts)
        um, n = np.unique(masks, return_counts=True)
        return pd.DataFrame({"m": um, "n": n.astype(np.int64)})

    hist = ds.map_batches(pairs, batch_format="pyarrow") \
        .groupby("__b").map_groups(fold, batch_format="pandas") \
        .to_pandas().groupby("m", as_index=False)["n"].sum()
    masks = hist["m"].to_numpy(dtype=np.int64)
    cnts = hist["n"].to_numpy(dtype=np.int64)

    rows = []
    for i in range(k):
        bi = np.int64(1) << np.int64(i)
        for j in range(i + 1, k):
            bj = np.int64(1) << np.int64(j)
            has_i = (masks & bi) != 0
            has_j = (masks & bj) != 0
            rows.append({
                "src_a": sources[i], "src_b": sources[j],
                "n_inter": int(cnts[has_i & has_j].sum()),
                "n_union": int(cnts[has_i | has_j].sum()),
            })
    out = pd.DataFrame(rows)
    return out.sort_values(["src_a", "src_b"]).reset_index(drop=True) \
        .astype({"n_inter": "int64", "n_union": "int64"})


QUERIES["jaccard_sources_vocab"] = jaccard_sources_vocab
ORACLES["jaccard_sources_vocab"] = """
    WITH w AS (SELECT DISTINCT source,
                      unnest(string_split(text, ' ')) AS word
               FROM documents),
    sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS ns
              FROM w GROUP BY source),
    inter AS (SELECT wa.source AS sa, wb.source AS sb,
                     CAST(COUNT(*) AS BIGINT) AS ni
              FROM w wa JOIN w wb
                ON wa.word = wb.word AND wa.source < wb.source
              GROUP BY wa.source, wb.source)
    SELECT a.source AS src_a, b.source AS src_b,
           COALESCE(i.ni, 0) AS n_inter,
           a.ns + b.ns - COALESCE(i.ni, 0) AS n_union
    FROM sizes a JOIN sizes b ON a.source < b.source
    LEFT JOIN inter i ON i.sa = a.source AND i.sb = b.source
    ORDER BY src_a, src_b
"""


def percentile_cont_price(sf_dir: str, ps=(50, 90, 99),
                          num_bins: int = 8192) -> pd.DataFrame:
    """PERCENTILE_CONT — the INTERPOLATED quantile — without a global
    sort and without a float: position q·(n−1) splits as lo = p(n−1)//100
    and rem = p(n−1) mod 100, and the answer is emitted in exact ×100
    fixed point, 100·v[lo] + rem·(v[lo+1]−v[lo]), so linear
    interpolation becomes pure int64 and the oracle (two ROW_NUMBER
    picks + the identical integer formula) hash-matches. Same
    scale layout as `exact_percentile_price`: min/max/count combiner,
    nonzero-(bin,n) histogram partials folded driver-side, then ONE
    filtered gather of only the bins holding the 2·|ps| needed order
    statistics (~n/num_bins rows each)."""
    import ray

    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])

    def vals(t: pa.Table) -> np.ndarray:
        return _cents(t.column("l_extendedprice")).to_numpy(zero_copy_only=False)

    def minmax(t: pa.Table) -> pa.Table:
        v = vals(t)
        return pa.table({"lo": pa.array([int(v.min()) if len(v) else 0]),
                         "hi": pa.array([int(v.max()) if len(v) else 0]),
                         "n": pa.array([len(v)])})

    meta = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    meta = meta[meta["n"] > 0]
    lo, hi = int(meta["lo"].min()), int(meta["hi"].max())
    n = int(meta["n"].sum())
    width = hi - lo + 1

    def hist(t: pa.Table) -> pa.Table:
        v = vals(t)
        b = (v - lo) * np.int64(num_bins) // np.int64(width)
        ub, cnt = np.unique(b, return_counts=True)
        return pa.table({"bin": pa.array(ub),
                         "cnt": pa.array(cnt.astype(np.int64))})

    parts = ds.map_batches(hist, batch_format="pyarrow").to_pandas()
    bins = np.zeros(num_bins, dtype=np.int64)
    np.add.at(bins, parts["bin"].to_numpy(dtype=np.int64),
              parts["cnt"].to_numpy(dtype=np.int64))
    cum = np.cumsum(bins)

    lo0 = np.array([p * (n - 1) // 100 for p in ps], dtype=np.int64)
    rem = np.array([p * (n - 1) % 100 for p in ps], dtype=np.int64)
    ks = np.unique(np.concatenate([lo0, lo0 + 1]))
    target_bins = np.searchsorted(cum, ks, side="right")
    before = np.r_[0, cum][target_bins]
    uniq_bins = np.unique(target_bins)
    ref = ray.put(uniq_bins)

    class GatherBins:
        def __init__(self):
            self.bins = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            v = vals(t)
            b = (v - lo) * np.int64(num_bins) // np.int64(width)
            keep = np.isin(b, self.bins)
            return pa.table({"v": pa.array(v[keep]), "b": pa.array(b[keep])})

    got = ds.map_batches(GatherBins, batch_format="pyarrow",
                         concurrency=auto_concurrency()).to_pandas()
    gv = got["v"].to_numpy(dtype=np.int64)
    gb = got["b"].to_numpy(dtype=np.int64)
    at = {}
    for k, tb, bef in zip(ks, target_bins, before):
        inbin = np.sort(gv[gb == tb])
        at[int(k)] = int(inbin[k - bef])
    out = []
    for p, l0, r in zip(ps, lo0, rem):
        vl, vh = at[int(l0)], at[int(l0) + 1]
        out.append({"p": np.int64(p),
                    "value_cents_x100": np.int64(100 * vl + r * (vh - vl))})
    return pd.DataFrame(out).astype({"p": "int64",
                                     "value_cents_x100": "int64"})


QUERIES["percentile_cont_price"] = percentile_cont_price
ORACLES["percentile_cont_price"] = """
    WITH c AS (SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT) AS v
               FROM lineitem),
    r AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn,
                 COUNT(*) OVER () AS n FROM c),
    t(p) AS (VALUES (50), (90), (99))
    SELECT CAST(t.p AS BIGINT) AS p,
           CAST(100 * vlo.v
                + ((t.p * (vlo.n - 1)) % 100) * (vhi.v - vlo.v)
                AS BIGINT) AS value_cents_x100
    FROM t
    JOIN r vlo ON vlo.rn = (t.p * (vlo.n - 1)) // 100 + 1
    JOIN r vhi ON vhi.rn = (t.p * (vhi.n - 1)) // 100 + 2
    ORDER BY p
"""


def chi2_type_dow(sf_dir: str) -> pd.DataFrame:
    """Chi-square independence test between two categorical columns
    (event_type × weekday) — the feature-correlation screen a curation
    pipeline runs before stratifying: the contingency table folds as a
    zero-shuffle ≤35-cell combiner (the cube pattern), and each cell's
    χ² term (N·o − r·c)² / (N·r·c) forms from EXACT integer counts —
    d² in arbitrary precision (Python ints / HUGEINT), ONE cast of the
    exact square to double, one division — so correctly-rounded IEEE
    doubles match BIT-FOR-BIT. Emitted PER CELL, not summed: a float
    SUM's addition order is engine-dependent, so the scalar statistic
    can't hash-compare, but the 35 per-cell terms can (the caller sums
    them in any order). Weekday derives from the µs epoch (Sunday=0,
    DuckDB dayofweek convention)."""
    TYPES = ["click", "error", "purchase", "signup", "view"]
    NT, ND = np.int64(len(TYPES)), np.int64(7)
    US_DAY = np.int64(86_400_000_000)

    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def cells(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column("event_type"), value_set=pa.array(TYPES))
        if idx.null_count:
            raise ValueError("event_type outside the chi2 domain")
        g = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        tu = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        # 1970-01-01 was a Thursday; DuckDB dayofweek: Sunday = 0
        dow = ((tu // US_DAY) + 4) % 7
        code = g * ND + dow
        cnt = np.bincount(code, minlength=int(NT * ND)).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table({"cell": pa.array(nz.astype(np.int64)),
                         "n": pa.array(cnt[nz])})

    parts = ds.map_batches(cells, batch_format="pyarrow").to_pandas()
    obs = np.zeros(int(NT * ND), dtype=np.int64)
    np.add.at(obs, parts["cell"].to_numpy(dtype=np.int64),
              parts["n"].to_numpy(dtype=np.int64))
    o = obs.reshape(int(NT), int(ND))
    r = o.sum(axis=1)
    c = o.sum(axis=0)
    N = int(o.sum())
    rows = []
    for i in range(int(NT)):
        for j in range(int(ND)):
            oij = int(o[i, j])
            if oij == 0:
                continue
            ri, cj = int(r[i]), int(c[j])
            d = N * oij - ri * cj
            rows.append({
                "event_type": TYPES[i], "dow": np.int64(j),
                "o": np.int64(oij),
                "contrib": float(d * d) / (float(N) * float(ri) * float(cj)),
            })
    return pd.DataFrame(rows).astype({"dow": "int64", "o": "int64"}) \
        .sort_values(["event_type", "dow"]).reset_index(drop=True)


QUERIES["chi2_type_dow"] = chi2_type_dow
ORACLES["chi2_type_dow"] = """
    WITH cells AS (
      SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM events GROUP BY event_type, dayofweek(ts)),
    r AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS ro
          FROM cells GROUP BY event_type),
    c AS (SELECT dow, CAST(SUM(o) AS BIGINT) AS co FROM cells GROUP BY dow),
    tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells)
    SELECT event_type, dow, o,
           CAST(d * d AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(ro AS DOUBLE) * CAST(co AS DOUBLE))
             AS contrib
    FROM (
      SELECT cells.event_type, cells.dow, cells.o, tot.n, r.ro, c.co,
             CAST(tot.n AS HUGEINT) * cells.o
               - CAST(r.ro AS HUGEINT) * c.co AS d
      FROM cells JOIN r USING (event_type) JOIN c USING (dow) CROSS JOIN tot
    )
    ORDER BY event_type, dow
"""


def skyline_orders(sf_dir: str) -> pd.DataFrame:
    """2-D skyline (Pareto frontier): orders not dominated on
    (price ↓, orderdate ↑) — the multi-objective filter behind
    'newest-for-the-money' curation cuts. Skylines COMPOSE: a point
    dominated anywhere is dominated by a local survivor too, so each
    batch reduces to its local frontier (sort by price asc / date
    desc, per-price max date, strict-prefix cummax test — all
    vectorized) and the driver runs the identical fold over the
    concatenated partials: a pure combiner, zero shuffles, driver
    traffic bounded by Σ local frontier sizes. Domination is evaluated
    in exact int64 (cents, µs) on both engines; equal (price, date)
    pairs don't dominate each other and all survive, matching the
    NOT-EXISTS strict-somewhere SQL."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_totalprice", "o_orderdate"])

    def _frontier(k: np.ndarray, p: np.ndarray, d: np.ndarray):
        order = np.lexsort((-d, p))
        k, p, d = k[order], p[order], d[order]
        starts = np.r_[0, np.flatnonzero(p[1:] != p[:-1]) + 1]
        grp = np.repeat(np.arange(len(starts)),
                        np.diff(np.r_[starts, len(p)]))
        mx = d[starts]  # per-price max date (first after desc sort)
        prefix = np.r_[np.int64(-2**62), np.maximum.accumulate(mx)[:-1]]
        keep = (d > prefix[grp]) & (d == mx[grp])
        return k[keep], p[keep], d[keep]

    def local(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        p = _cents(t.column("o_totalprice")).to_numpy(zero_copy_only=False)
        d = pc.cast(t.column("o_orderdate"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        k, p, d = _frontier(k, p, d)
        return pa.table({"k": pa.array(k), "p": pa.array(p),
                         "d": pa.array(d)})

    part = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    k, p, d = _frontier(part["k"].to_numpy(dtype=np.int64),
                        part["p"].to_numpy(dtype=np.int64),
                        part["d"].to_numpy(dtype=np.int64))
    return pd.DataFrame({"o_orderkey": k, "price_cents": p,
                         "date_us": d}).sort_values("o_orderkey") \
        .reset_index(drop=True)


QUERIES["skyline_orders"] = skyline_orders
ORACLES["skyline_orders"] = """
    WITH o AS (SELECT o_orderkey,
                      CAST(ROUND(o_totalprice*100) AS BIGINT) AS p,
                      CAST(epoch_us(o_orderdate) AS BIGINT) AS d
               FROM orders)
    SELECT o.o_orderkey, o.p AS price_cents, o.d AS date_us
    FROM o
    WHERE NOT EXISTS (
      SELECT 1 FROM o q
      WHERE q.p <= o.p AND q.d >= o.d AND (q.p < o.p OR q.d > o.d))
    ORDER BY o_orderkey
"""


def label_propagation_words(sf_dir: str, iters: int = 3,
                            num_buckets: int = 64) -> pd.DataFrame:
    """Min-label propagation over the undirected word graph — the
    connected-components kernel run for a FIXED iteration count so the
    result is SQL-checkable (after k passes each node holds the
    lexicographically smallest word within k hops; iterate to a fixed
    point and these ARE the components): labels live as a node-bounded
    broadcast vector exactly like PageRank's ranks, each pass is one
    zero-shuffle streaming sweep over the materialized edge set doing
    two np.minimum.at scatters (both directions — undirected), and
    per-batch partials fold elementwise-min on the driver. Min over
    sorted-vocab indices ≡ lexicographic min over words, so the
    integer kernel and the string SQL agree."""
    import ray

    edges = _word_edge_dataset(sf_dir, num_buckets)

    vocab_set: set = set()
    for b in edges.iter_batches(batch_format="pyarrow", batch_size=None):
        vocab_set.update(b.column("w1").to_pylist())
        vocab_set.update(b.column("w2").to_pylist())
    vocab = pd.Index(sorted(vocab_set))
    n = len(vocab)
    vocab_b = ray.put(vocab)

    lab = np.arange(n, dtype=np.int64)
    for _ in range(iters):
        lab_ref = ray.put(lab)

        def sweep(t: pa.Table, _l=lab_ref) -> pa.Table:
            voc = ray.get(vocab_b)
            cur = ray.get(_l)
            i = voc.get_indexer(t.column("w1").to_pandas())
            j = voc.get_indexer(t.column("w2").to_pandas())
            out = cur.copy()
            np.minimum.at(out, i, cur[j])
            np.minimum.at(out, j, cur[i])
            return pa.table({"v": pa.array([out.tolist()])})

        nxt = lab
        for b in edges.map_batches(sweep, batch_format="pyarrow",
                                   batch_size=None) \
                .iter_batches(batch_format="pyarrow", batch_size=None):
            if b.num_rows:
                nxt = np.minimum(
                    nxt, np.asarray(b.column("v").to_pylist()[0],
                                    dtype=np.int64))
        lab = nxt

    return pd.DataFrame({"word": vocab.to_numpy(),
                         "label": vocab.to_numpy()[lab]}) \
        .sort_values("word").reset_index(drop=True)


QUERIES["label_propagation_words"] = label_propagation_words
ORACLES["label_propagation_words"] = """
    WITH lists AS (SELECT string_split(text, ' ') AS l FROM documents),
    big AS (SELECT DISTINCT p[1] AS w1, p[2] AS w2 FROM (
      SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p FROM lists
    )),
    nodes AS (SELECT w1 AS w FROM big UNION SELECT w2 FROM big),
    nb AS (SELECT w1 AS w, w2 AS v FROM big
           UNION SELECT w2 AS w, w1 AS v FROM big
           UNION SELECT w AS w, w AS v FROM nodes),
    l0 AS (SELECT w, w AS lab FROM nodes),
    l1 AS (SELECT nb.w, MIN(l0.lab) AS lab FROM nb
           JOIN l0 ON l0.w = nb.v GROUP BY nb.w),
    l2 AS (SELECT nb.w, MIN(l1.lab) AS lab FROM nb
           JOIN l1 ON l1.w = nb.v GROUP BY nb.w),
    l3 AS (SELECT nb.w, MIN(l2.lab) AS lab FROM nb
           JOIN l2 ON l2.w = nb.v GROUP BY nb.w)
    SELECT w AS word, lab AS label FROM l3 ORDER BY word
"""


def dq_orders_violations(sf_dir: str, num_buckets: int = 256
                         ) -> pd.DataFrame:
    """Rule-based data-quality audit — the guardrail stage a pipeline
    runs before training ingest: one pass over orders counts, per
    rule, the rows violating (or matching) each assertion. Row-local
    rules (sign, range, calendar) fold as a zero-shuffle per-batch
    count vector; the referential rule (orphan custkey) tests against
    the broadcast customer keyset (ray.put once, searchsorted per
    batch — `bucket_anti_join` past broadcast scale); the uniqueness
    rule needs global knowledge, so duplicate count = total − exact
    distinct via per-batch key dedup + one small bucket exchange (the
    `exact_distinct_orders` layout). Zero-violation rules still emit
    their row — an audit that silently drops clean rules can't prove
    it ran them."""
    import ray

    from ..stages.dedup import _splitmix64 as _mix64

    US_DAY = np.int64(86_400_000_000)
    LO_US = np.int64(int(pd.Timestamp("1996-01-01").value // 1000))
    HIVAL = np.int64(300_000 * 100)

    cust = _read(sf_dir, "customer", columns=["c_custkey"]).to_pandas()
    ckeys = ray.put(np.sort(cust["c_custkey"].to_numpy(dtype=np.int64)))

    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_totalprice",
                        "o_orderdate"])

    class RowRules:
        def __init__(self):
            self.ck = ray.get(ckeys)

        def __call__(self, t: pa.Table) -> pa.Table:
            price = _cents(t.column("o_totalprice")) \
                .to_numpy(zero_copy_only=False)
            dt = pc.cast(t.column("o_orderdate"), pa.int64()) \
                .to_numpy(zero_copy_only=False)
            cu = t.column("o_custkey").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self.ck, cu)
            pos[pos >= len(self.ck)] = max(len(self.ck) - 1, 0)
            orphan = (len(self.ck) == 0) | (self.ck[pos] != cu)
            dow = ((dt // US_DAY) + 4) % 7
            return pa.table({
                "nonpositive_price": pa.array([int((price <= 0).sum())]),
                "pre_1996": pa.array([int((dt < LO_US).sum())]),
                "high_value": pa.array([int((price >= HIVAL).sum())]),
                "weekend_order": pa.array([int(((dow == 0) | (dow == 6)).sum())]),
                "orphan_custkey": pa.array([int(orphan.sum())]),
                "n_rows": pa.array([t.num_rows]),
            })

    rowp = ds.map_batches(RowRules, batch_format="pyarrow",
                          concurrency=auto_concurrency()).to_pandas()

    def keys(t: pa.Table) -> pa.Table:
        k = np.unique(t.column("o_orderkey").to_numpy(zero_copy_only=False))
        return pa.table({
            "k": pa.array(k),
            "__b": pa.array((_mix64(k.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def nuniq(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [int(g["k"].nunique())]})

    dparts = ds.map_batches(keys, batch_format="pyarrow") \
        .groupby("__b").map_groups(nuniq, batch_format="pandas").to_pandas()
    n_distinct = int(dparts["n"].sum())
    total = int(rowp["n_rows"].sum())

    rules = {
        "dup_orderkey": total - n_distinct,
        "high_value": int(rowp["high_value"].sum()),
        "nonpositive_price": int(rowp["nonpositive_price"].sum()),
        "orphan_custkey": int(rowp["orphan_custkey"].sum()),
        "pre_1996": int(rowp["pre_1996"].sum()),
        "weekend_order": int(rowp["weekend_order"].sum()),
    }
    return pd.DataFrame({"rule": list(rules.keys()),
                         "n_bad": np.array(list(rules.values()),
                                           dtype=np.int64)}) \
        .sort_values("rule").reset_index(drop=True)


QUERIES["dq_orders_violations"] = dq_orders_violations
ORACLES["dq_orders_violations"] = """
    SELECT 'dup_orderkey' AS rule,
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_bad
    FROM orders
    UNION ALL
    SELECT 'high_value',
           CAST(SUM(CASE WHEN CAST(ROUND(o_totalprice*100) AS BIGINT)
                              >= 30000000 THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'nonpositive_price',
           CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orphan_custkey',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
            LEFT JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_custkey IS NULL)
    UNION ALL
    SELECT 'pre_1996',
           CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1996-01-01'
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'weekend_order',
           CAST(SUM(CASE WHEN dayofweek(o_orderdate) IN (0, 6)
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    ORDER BY rule
"""


def daily_revenue_wow(sf_dir: str) -> pd.DataFrame:
    """Aggregate-then-window composition: daily order revenue with its
    week-over-week delta (vs the calendar day 7 days earlier, NOT 7
    rows back — gaps must not shift the comparison). The aggregation
    is the calendar-bounded zero-shuffle combiner (per-batch (day,
    cents) partials, driver fold over ≤ a-few-thousand days); the
    window step is a vectorized searchsorted self-lookup on day−7 with
    0 for absent days. All integer cents — delta hashes exactly."""
    US_DAY = np.int64(86_400_000_000)

    ds = _read(sf_dir, "orders", columns=["o_totalprice", "o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t.column("o_totalprice")).to_numpy(zero_copy_only=False)
        d = pc.cast(t.column("o_orderdate"), pa.int64()) \
            .to_numpy(zero_copy_only=False) // US_DAY
        ud, inv = np.unique(d, return_inverse=True)
        s = np.zeros(len(ud), dtype=np.int64)
        np.add.at(s, inv, c)
        return pa.table({"day": pa.array(ud), "s": pa.array(s)})

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas() \
        .groupby("day", as_index=False)["s"].sum()
    day = p["day"].to_numpy(dtype=np.int64)
    rev = p["s"].to_numpy(dtype=np.int64)
    order = np.argsort(day)
    day, rev = day[order], rev[order]
    prev_day = day - 7
    pos = np.searchsorted(day, prev_day)
    pos_c = np.minimum(pos, len(day) - 1)
    hit = day[pos_c] == prev_day
    prev = np.where(hit, rev[pos_c], np.int64(0))
    return pd.DataFrame({
        "day_us": day * US_DAY,
        "rev_cents": rev,
        "prev_cents": prev,
        "delta_cents": rev - prev,
    })


QUERIES["daily_revenue_wow"] = daily_revenue_wow
ORACLES["daily_revenue_wow"] = """
    WITH d AS (
      SELECT CAST(epoch_us(date_trunc('day', o_orderdate)) AS BIGINT)
               AS day_us,
             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM orders GROUP BY 1)
    SELECT a.day_us, a.rev_cents,
           COALESCE(b.rev_cents, 0) AS prev_cents,
           a.rev_cents - COALESCE(b.rev_cents, 0) AS delta_cents
    FROM d a LEFT JOIN d b ON b.day_us = a.day_us - 7 * 86400000000
    ORDER BY a.day_us
"""


def top_session_paths(sf_dir: str, gap_min: int = 30, k: int = 10,
                      num_buckets: int = 64) -> pd.DataFrame:
    """Top-k session paths — the three-family composition a behavioral
    pipeline runs end to end: sessionize (gap > 30 min), ordered
    STRING_AGG per session, then global heavy hitters over an
    UNBOUNDED path domain. One user-hash exchange sessionizes and
    assembles every path with the pure-Arrow ListArray+binary_join
    kernel (session boundaries = new-user OR gap, zero string copies);
    each bucket pre-counts its distinct paths so the SECOND (path-hash)
    exchange carries (path, n) partials, not sessions; buckets fold
    counts and emit ONLY their local top-k (safe: a global top-k path
    has its full global count inside exactly one path-hash bucket), so
    the driver folds ≤ k·num_buckets rows. Deterministic (n desc,
    path asc) tiebreak on both engines."""
    from ..stages.dedup import _splitmix64 as _mix64

    GAP_US = np.int64(gap_min * 60 * 1_000_000)

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])

    def add_bucket(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        b = (_mix64(u) % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column("__b", pa.array(b))

    def paths_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        uid = g["user_id"].to_numpy()
        tu = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        types = pa.array(g["event_type"].to_numpy(), type=pa.string())
        n = len(g)
        if not n:
            return pd.DataFrame({"path": pd.Series([], dtype="object"),
                                 "n": pd.Series([], dtype="int64"),
                                 "__b2": pd.Series([], dtype="int64")})
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        gap = np.r_[True, (tu[1:] - tu[:-1]) > GAP_US]
        starts = np.flatnonzero(new_user | gap)
        offsets = pa.array(np.r_[starts, n].astype(np.int32))
        lists = pa.ListArray.from_arrays(offsets, types)
        path = pc.binary_join(lists, "->").to_pandas()
        cnt = path.value_counts()
        df = pd.DataFrame({"path": cnt.index.to_numpy(),
                           "n": cnt.to_numpy().astype(np.int64)})
        h = pd.util.hash_pandas_object(df["path"], index=False).to_numpy()
        df["__b2"] = (_mix64(h) % np.uint64(num_buckets)).astype(np.int64)
        return df

    def topk_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("path", as_index=False)["n"].sum()
        agg = agg.sort_values(["n", "path"],
                              ascending=[False, True]).head(k)
        return agg[["path", "n"]]

    parts = ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__b").map_groups(paths_bucket, batch_format="pandas") \
        .groupby("__b2").map_groups(topk_bucket, batch_format="pandas") \
        .to_pandas()
    out = parts.sort_values(["n", "path"],
                            ascending=[False, True]).head(k)
    return out.reset_index(drop=True).astype({"n": "int64"})


QUERIES["top_session_paths"] = top_session_paths
ORACLES["top_session_paths"] = """
    WITH e AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (SELECT *, SUM(is_start) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS sid
          FROM e),
    p AS (SELECT user_id, sid,
                 STRING_AGG(event_type, '->' ORDER BY ts, event_id) AS path
          FROM s GROUP BY user_id, sid),
    c AS (SELECT path, CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY path)
    SELECT path, n FROM c ORDER BY n DESC, path LIMIT 10
"""


def corr_value_hour_by_type(sf_dir: str) -> pd.DataFrame:
    """GROUPED Pearson correlation from exact integer moments — the
    per-segment feature screen (does value depend on hour-of-day,
    per event type?): one zero-shuffle pass folds per-type
    (n, Σx, Σy, Σx², Σy², Σxy) with the x² halves split around 2^32,
    the driver assembles each type's moments in Python ints, and the
    one float expression per group is written identically in the
    HUGEINT SQL oracle, so the doubles match bit-for-bit
    (`price_discount_corr`, grouped)."""
    import math

    TYPES = ["click", "error", "purchase", "signup", "view"]
    US_DAY = np.int64(86_400_000_000)
    US_HOUR = np.int64(3_600_000_000)

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def moments(t: pa.Table) -> pd.DataFrame:
        idx = pc.index_in(t.column("event_type"), value_set=pa.array(TYPES))
        if idx.null_count:
            raise ValueError("event_type outside the corr domain")
        g = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        x = _cents(t.column("value")).to_numpy(zero_copy_only=False)
        tu = pc.cast(t.column("ts"), pa.int64()).to_numpy(zero_copy_only=False)
        y = (tu % US_DAY) // US_HOUR
        xx = x * x
        hi, lo = xx >> np.int64(32), xx & np.int64((1 << 32) - 1)
        nt = len(TYPES)
        rows = []
        for i in range(nt):
            m = g == i
            rows.append({
                "g": i, "n": int(m.sum()), "sx": int(x[m].sum()),
                "sy": int(y[m].sum()), "sxx_hi": int(hi[m].sum()),
                "sxx_lo": int(lo[m].sum()), "syy": int((y[m] * y[m]).sum()),
                "sxy": int((x[m] * y[m]).sum()),
            })
        return pd.DataFrame(rows)

    p = ds.map_batches(moments, batch_format="pyarrow").to_pandas()
    out = []
    for i, et in enumerate(TYPES):
        rows = p[p["g"] == i]
        n = int(rows["n"].sum())
        sx, sy = int(rows["sx"].sum()), int(rows["sy"].sum())
        sxx = (int(rows["sxx_hi"].sum()) << 32) + int(rows["sxx_lo"].sum())
        syy, sxy = int(rows["syy"].sum()), int(rows["sxy"].sum())
        num = n * sxy - sx * sy
        varx = n * sxx - sx * sx
        vary = n * syy - sy * sy
        out.append({"event_type": et, "n": np.int64(n),
                    "corr_xy": float(num)
                    / math.sqrt(float(varx) * float(vary))})
    return pd.DataFrame(out).astype({"n": "int64"})


QUERIES["corr_value_hour_by_type"] = corr_value_hour_by_type
ORACLES["corr_value_hour_by_type"] = """
    WITH m AS (
      SELECT event_type,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(x*x) AS HUGEINT) AS sxx,
             CAST(SUM(y*y) AS HUGEINT) AS syy,
             CAST(SUM(x*y) AS HUGEINT) AS sxy
      FROM (SELECT event_type,
                   CAST(ROUND(value*100) AS BIGINT) AS x,
                   CAST(hour(ts) AS BIGINT) AS y
            FROM events)
      GROUP BY event_type)
    SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST(n*sxy - sx*sy AS DOUBLE)
           / SQRT(CAST(n*sxx - sx*sx AS DOUBLE)
                  * CAST(n*syy - sy*sy AS DOUBLE)) AS corr_xy
    FROM m ORDER BY event_type
"""


def image_phash_dedup(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """Perceptual near-duplicate detection over REAL image bytes — the
    multimodal dedup stage: PNG payloads decode in an actor pool (pure-
    numpy codec), each image reduces to a 64-bit integer aHash
    (`stages.multimodal.ImagePHash` — exact integer downsample/
    grayscale/threshold, so identical pixels give identical hashes
    REGARDLESS of how the bytes were encoded), and duplicate groups
    resolve through one phash-hash bucket exchange of 16-byte rows.
    The fixture plants pixel-identical duplicates RE-ENCODED with a
    different PNG scanline filter: byte-level dedup provably misses
    them (payload hashes differ), this stage must catch every one —
    pytest asserts exactly that recall. Driver rows-only check (no
    SQL can decode a PNG)."""
    import glob as _glob
    import tempfile

    import ray.data

    from ..stages.dedup import _splitmix64 as _mix64
    from ..stages.multimodal import ImageDecode, ImagePHash, make_dup_png_table

    n = max(32, int(4096 * sf_of(sf_dir)))
    cache = os.path.join(tempfile.gettempdir(), "raysketch_data",
                         f"pngs_dup_n{n}_s7")
    if not _glob.glob(os.path.join(cache, "*.parquet")):
        import pyarrow.parquet as pq

        os.makedirs(cache, exist_ok=True)
        tmp = os.path.join(cache, "_part0.tmp")
        pq.write_table(make_dup_png_table(n, seed=7), tmp,
                       row_group_size=max(32, n // 8))
        os.replace(tmp, os.path.join(cache, "part0.parquet"))
    ds = ray.data.read_parquet(cache)

    hashes = (
        ds.map_batches(ImageDecode,
                       fn_constructor_kwargs={"deterministic_fake": False},
                       batch_format="pyarrow", batch_size=64,
                       concurrency=auto_concurrency())
        .map_batches(ImagePHash(), batch_size=64)
    )

    def tag(t: pa.Table) -> pa.Table:
        h = t.column("phash").to_numpy(zero_copy_only=False)
        return t.append_column(
            "__b", pa.array((_mix64(h.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)))

    def groups(g: pd.DataFrame) -> pd.DataFrame:
        h = g["phash"].to_numpy(dtype=np.int64)
        i = g["item_id"].to_numpy(dtype=np.int64)
        order = np.lexsort((i, h))
        h, i = h[order], i[order]
        starts = np.r_[0, np.flatnonzero(h[1:] != h[:-1]) + 1]
        cnt = np.diff(np.r_[starts, len(h)])
        keep = cnt >= 2
        return pd.DataFrame({
            "phash": h[starts][keep],
            "n_items": cnt[keep].astype(np.int64),
            "min_item_id": i[starts][keep],
        })

    out = hashes.map_batches(tag, batch_format="pyarrow") \
        .groupby("__b").map_groups(groups, batch_format="pandas") \
        .to_pandas()
    return out.sort_values("phash").reset_index(drop=True) \
        .astype({"phash": "int64", "n_items": "int64",
                 "min_item_id": "int64"})


QUERIES["image_phash_dedup"] = image_phash_dedup


def bitagg_users_by_type(sf_dir: str) -> pd.DataFrame:
    """Bitwise aggregates (BIT_AND / BIT_OR / BIT_XOR) per group — the
    SQL parity family behind permission-mask folds and order-
    independent content checksums (XOR of ids detects any single
    changed row across reruns): all three are associative and
    commutative, so each batch reduces to ≤5 partial rows and the
    driver folds them — the combiner pattern at its cheapest, zero
    shuffles."""
    TYPES = ["click", "error", "purchase", "signup", "view"]

    ds = _read(sf_dir, "events",
               columns=["event_type", "user_id", "event_id"])

    def partial(t: pa.Table) -> pd.DataFrame:
        idx = pc.index_in(t.column("event_type"), value_set=pa.array(TYPES))
        if idx.null_count:
            raise ValueError("event_type outside the bitagg domain")
        g = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        e = t.column("event_id").to_numpy(zero_copy_only=False)
        rows = []
        for i in range(len(TYPES)):
            m = g == i
            if not m.any():
                continue
            rows.append({
                "g": i,
                "band": int(np.bitwise_and.reduce(u[m])),
                "bor": int(np.bitwise_or.reduce(u[m])),
                "bxor": int(np.bitwise_xor.reduce(e[m])),
            })
        return pd.DataFrame(rows)

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = []
    for i, et in enumerate(TYPES):
        rows = p[p["g"] == i]
        if not len(rows):
            continue
        out.append({
            "event_type": et,
            "users_and": np.int64(np.bitwise_and.reduce(
                rows["band"].to_numpy(dtype=np.int64))),
            "users_or": np.int64(np.bitwise_or.reduce(
                rows["bor"].to_numpy(dtype=np.int64))),
            "events_xor": np.int64(np.bitwise_xor.reduce(
                rows["bxor"].to_numpy(dtype=np.int64))),
        })
    return pd.DataFrame(out).astype(
        {"users_and": "int64", "users_or": "int64", "events_xor": "int64"})


QUERIES["bitagg_users_by_type"] = bitagg_users_by_type
ORACLES["bitagg_users_by_type"] = """
    SELECT event_type,
           CAST(BIT_AND(user_id) AS BIGINT) AS users_and,
           CAST(BIT_OR(user_id) AS BIGINT) AS users_or,
           CAST(BIT_XOR(event_id) AS BIGINT) AS events_xor
    FROM events GROUP BY event_type ORDER BY event_type
"""


def equidepth_deciles_price(sf_dir: str, num_bins: int = 8192
                            ) -> pd.DataFrame:
    """Equi-DEPTH histogram (quantile bucketing — the feature-binning
    operator): decile boundaries are the 9 order statistics at
    k=⌈i·n/10⌉−1, found sort-free by the same two-zero-shuffle-pass +
    filtered-bin-gather layout as `exact_percentile_price`; a third
    streaming pass then counts rows per decile with one searchsorted
    against the broadcast boundary vector. Boundary ties mean deciles
    need NOT be equal-sized — the exact per-bucket counts (verified
    against a join-counted SQL twin) are the honest output, where an
    equal-n assumption would silently lie on skewed data."""
    import ray

    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])

    def vals(t: pa.Table) -> np.ndarray:
        return _cents(t.column("l_extendedprice")).to_numpy(zero_copy_only=False)

    def minmax(t: pa.Table) -> pa.Table:
        v = vals(t)
        return pa.table({"lo": pa.array([int(v.min()) if len(v) else 0]),
                         "hi": pa.array([int(v.max()) if len(v) else 0]),
                         "n": pa.array([len(v)])})

    meta = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    meta = meta[meta["n"] > 0]
    lo, hi = int(meta["lo"].min()), int(meta["hi"].max())
    n = int(meta["n"].sum())
    width = hi - lo + 1

    def hist(t: pa.Table) -> pa.Table:
        v = vals(t)
        b = (v - lo) * np.int64(num_bins) // np.int64(width)
        ub, cnt = np.unique(b, return_counts=True)
        return pa.table({"bin": pa.array(ub),
                         "cnt": pa.array(cnt.astype(np.int64))})

    parts = ds.map_batches(hist, batch_format="pyarrow").to_pandas()
    bins = np.zeros(num_bins, dtype=np.int64)
    np.add.at(bins, parts["bin"].to_numpy(dtype=np.int64),
              parts["cnt"].to_numpy(dtype=np.int64))
    cum = np.cumsum(bins)
    ks = np.array([-(-i * n // 10) - 1 for i in range(1, 10)],
                  dtype=np.int64)
    target_bins = np.searchsorted(cum, ks, side="right")
    before = np.r_[0, cum][target_bins]
    uniq_bins = np.unique(target_bins)
    ref = ray.put(uniq_bins)

    class GatherBins:
        def __init__(self):
            self.bins = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            v = vals(t)
            b = (v - lo) * np.int64(num_bins) // np.int64(width)
            keep = np.isin(b, self.bins)
            return pa.table({"v": pa.array(v[keep]), "b": pa.array(b[keep])})

    got = ds.map_batches(GatherBins, batch_format="pyarrow",
                         concurrency=auto_concurrency()).to_pandas()
    gv = got["v"].to_numpy(dtype=np.int64)
    gb = got["b"].to_numpy(dtype=np.int64)
    bounds = np.empty(9, dtype=np.int64)
    for ix, (k, tb, bef) in enumerate(zip(ks, target_bins, before)):
        inbin = np.sort(gv[gb == tb])
        bounds[ix] = inbin[k - bef]
    bref = ray.put(bounds)

    class CountDeciles:
        def __init__(self):
            self.bounds = ray.get(bref)

        def __call__(self, t: pa.Table) -> pa.Table:
            v = vals(t)
            d = np.searchsorted(self.bounds, v, side="right")
            cnt = np.bincount(d, minlength=10).astype(np.int64)
            return pa.table({"decile": pa.array(np.arange(10, dtype=np.int64)),
                             "n": pa.array(cnt)})

    cparts = ds.map_batches(CountDeciles, batch_format="pyarrow",
                            concurrency=auto_concurrency()).to_pandas() \
        .groupby("decile", as_index=False)["n"].sum()
    ub = np.r_[bounds, np.int64(hi)]
    out = pd.DataFrame({
        "decile": cparts["decile"].astype("int64"),
        "upper_cents": ub[cparts["decile"].to_numpy(dtype=np.int64)],
        "n": cparts["n"].astype("int64"),
    })
    # boundary ties can leave a decile empty; SQL's GROUP BY emits no
    # row for it, so neither do we
    out = out[out["n"] > 0]
    return out.sort_values("decile").reset_index(drop=True)


QUERIES["equidepth_deciles_price"] = equidepth_deciles_price
ORACLES["equidepth_deciles_price"] = """
    WITH c AS (SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT) AS v
               FROM lineitem),
    r AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn,
                 COUNT(*) OVER () AS n FROM c),
    b AS (SELECT i, (SELECT v FROM r
                     WHERE rn = (i * r2.n + 9) // 10
                     LIMIT 1) AS bound
          FROM (SELECT DISTINCT n FROM r) r2,
               UNNEST(generate_series(1, 9)) AS t(i)),
    d AS (SELECT c.v,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM b
                  WHERE b.bound <= c.v) AS decile
          FROM c)
    SELECT decile,
           CASE WHEN decile < 9 THEN (SELECT bound FROM b WHERE i = decile + 1)
                ELSE (SELECT MAX(v) FROM c) END AS upper_cents,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM d GROUP BY decile ORDER BY decile
"""


def q15_top_supplier(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """TPC-H Q15 shape — the GLOBAL argmax over an aggregate, keeping
    ALL ties (Q15's view + WHERE total = (SELECT MAX(...))): per-
    supplier 1996-H1 revenue reduces per batch to (suppkey, cents)
    combiner partials, ONE suppkey-hash exchange finishes the sums,
    each bucket forwards its (small, result-sized) per-supplier totals
    AND its local max; the driver takes the global max and filters —
    no second pass over lineitem, no sort. Read-side shipdate pushdown
    prunes at the parquet row group."""
    import pyarrow.dataset as pads

    from ..stages.dedup import _splitmix64 as _mix64

    LO = pd.Timestamp("1996-01-01")
    HI = pd.Timestamp("1996-07-01")

    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter=(pads.field("l_shipdate") >= LO)
        & (pads.field("l_shipdate") < HI))

    def partial(t: pa.Table) -> pa.Table:
        s = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        price = _cents(t.column("l_extendedprice")) \
            .to_numpy(zero_copy_only=False)
        disc = _cents(t.column("l_discount")).to_numpy(zero_copy_only=False)
        rev = price * (100 - disc)
        us, inv = np.unique(s, return_inverse=True)
        acc = np.zeros(len(us), dtype=np.int64)
        np.add.at(acc, inv, rev)
        return pa.table({
            "s": pa.array(us), "r": pa.array(acc),
            "__b": pa.array((_mix64(us.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        s = g["s"].to_numpy(dtype=np.int64)
        r = g["r"].to_numpy(dtype=np.int64)
        order = np.argsort(s, kind="stable")
        s, r = s[order], r[order]
        starts = np.r_[0, np.flatnonzero(s[1:] != s[:-1]) + 1]
        return pd.DataFrame({"s": s[starts],
                             "r": np.add.reduceat(r, starts)})

    per = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("__b").map_groups(finish, batch_format="pandas") \
        .to_pandas()
    mx = int(per["r"].max())
    out = per[per["r"] == mx].rename(
        columns={"s": "l_suppkey", "r": "rev_e4"})
    return out.sort_values("l_suppkey").reset_index(drop=True) \
        .astype({"l_suppkey": "int64", "rev_e4": "int64"})


QUERIES["q15_top_supplier"] = q15_top_supplier
ORACLES["q15_top_supplier"] = """
    WITH rev AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                      * (100 - CAST(ROUND(l_discount*100) AS BIGINT)))
                  AS BIGINT) AS rev_e4
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-07-01'
      GROUP BY l_suppkey)
    SELECT l_suppkey, rev_e4 FROM rev
    WHERE rev_e4 = (SELECT MAX(rev_e4) FROM rev)
    ORDER BY l_suppkey
"""


def q12_ship_delay_priority(sf_dir: str, cut_days: int = 60,
                            num_buckets: int = 64) -> pd.DataFrame:
    """TPC-H Q12 shape adapted to this schema (no commit/receipt
    dates): per ship-delay class (shipped within ``cut_days`` of the
    order vs later), how many lineitems belong to URGENT/HIGH-priority
    orders vs others — the join + two-way conditional count. Lineitem
    crosses the ONE orderkey exchange as 16-byte (okey, shipdate)
    rows; orders as (okey, odate, is_urgent 1-byte); each bucket
    merges with a vectorized searchsorted lookup and collapses
    straight to ≤2 (class, n_urgent, n_other) partials the driver
    folds — the classic Q12 CASE-SUM realized without the aggregate
    ever seeing a joined row table."""
    from ..stages.dedup import _splitmix64 as _mix64

    US_DAY = np.int64(86_400_000_000)
    CUT = np.int64(cut_days) * US_DAY

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def li_rows(t: pa.Table) -> pa.Table:
        k = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "k": pa.array(k),
            "ship": pc.cast(t.column("l_shipdate"), pa.int64()),
            "side": pa.array(np.zeros(len(k), dtype=np.int8)),
            "odate": pa.array(np.zeros(len(k), dtype=np.int64)),
            "urg": pa.array(np.zeros(len(k), dtype=np.int8)),
            "__b": pa.array((_mix64(k.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def o_rows(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        pri = t.column("o_orderpriority").to_pandas()
        urg = pri.str.startswith(("1-", "2-")).to_numpy().astype(np.int8)
        return pa.table({
            "k": pa.array(k),
            "ship": pa.array(np.zeros(len(k), dtype=np.int64)),
            "side": pa.array(np.ones(len(k), dtype=np.int8)),
            "odate": pc.cast(t.column("o_orderdate"), pa.int64()),
            "urg": pa.array(urg),
            "__b": pa.array((_mix64(k.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        side = g["side"].to_numpy(dtype=np.int8)
        li_m, o_m = side == 0, side == 1
        ok = g["k"].to_numpy(dtype=np.int64)[o_m]
        oo = np.argsort(ok, kind="stable")
        ok = ok[oo]
        od = g["odate"].to_numpy(dtype=np.int64)[o_m][oo]
        ou = g["urg"].to_numpy(dtype=np.int8)[o_m][oo]
        lk = g["k"].to_numpy(dtype=np.int64)[li_m]
        ls = g["ship"].to_numpy(dtype=np.int64)[li_m]
        pos = np.searchsorted(ok, lk)
        pos_c = np.minimum(pos, max(len(ok) - 1, 0))
        if len(ok) == 0:
            return pd.DataFrame({"slow": pd.Series([], dtype="int64"),
                                 "n_urgent": pd.Series([], dtype="int64"),
                                 "n_other": pd.Series([], dtype="int64")})
        hit = ok[pos_c] == lk
        delay = ls[hit] - od[pos_c][hit]
        urg = ou[pos_c][hit].astype(np.int64)
        slow = (delay > CUT).astype(np.int64)
        code = slow * 2 + urg
        cnt = np.bincount(code, minlength=4)
        return pd.DataFrame({
            "slow": np.array([0, 1], dtype=np.int64),
            "n_urgent": np.array([cnt[1], cnt[3]], dtype=np.int64),
            "n_other": np.array([cnt[0], cnt[2]], dtype=np.int64),
        })

    both = li.map_batches(li_rows, batch_format="pyarrow") \
        .union(orders.map_batches(o_rows, batch_format="pyarrow"))
    parts = both.groupby("__b").map_groups(
        classify, batch_format="pandas").to_pandas()
    agg = parts.groupby("slow", as_index=False)[["n_urgent", "n_other"]] \
        .sum()
    return agg.sort_values("slow").reset_index(drop=True) \
        .astype({"slow": "int64", "n_urgent": "int64", "n_other": "int64"})


QUERIES["q12_ship_delay_priority"] = q12_ship_delay_priority
ORACLES["q12_ship_delay_priority"] = """
    SELECT CASE WHEN l_shipdate - o_orderdate > INTERVAL 60 DAY
                THEN 1 ELSE 0 END AS slow,
           CAST(SUM(CASE WHEN o_orderpriority LIKE '1-%'
                           OR o_orderpriority LIKE '2-%'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
           CAST(SUM(CASE WHEN o_orderpriority LIKE '1-%'
                           OR o_orderpriority LIKE '2-%'
                         THEN 0 ELSE 1 END) AS BIGINT) AS n_other
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1 ORDER BY slow
"""


def q10_returned_revenue_customers(sf_dir: str, k: int = 20,
                                   num_buckets: int = 64) -> pd.DataFrame:
    """TPC-H Q10 shape — returned-item revenue ranking: top-k customers
    by revenue of their RETURNED ('R') lineitems among 1995-Q1 orders.
    Two exchanges, both of partials: lineitem (returnflag pruned per
    batch) collapses to (orderkey, rev) combiner rows before the
    orderkey exchange where the date-pruned orders (read-side
    pushdown) map okey→custkey; the resulting (custkey, rev) partials
    take the custkey exchange, each bucket folds its totals and emits
    ONLY its local top-k ((rev desc, custkey asc) — sound per the
    one-bucket-per-key argument), and the driver folds ≤k·buckets
    rows. Customer name attaches from the driver-read dimension."""
    import pyarrow.dataset as pads
    import ray.data

    from ..stages.dedup import _splitmix64 as _mix64

    LO = pd.Timestamp("1995-01-01")
    HI = pd.Timestamp("1995-04-01")

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount",
                        "l_returnflag"])
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pads.field("o_orderdate") >= LO)
        & (pads.field("o_orderdate") < HI))

    def li_rows(t: pa.Table) -> pa.Table:
        m = pc.equal(t.column("l_returnflag"), "R")
        t = t.filter(m)
        kk = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        price = _cents(t.column("l_extendedprice")) \
            .to_numpy(zero_copy_only=False)
        disc = _cents(t.column("l_discount")).to_numpy(zero_copy_only=False)
        rev = price * (100 - disc)
        uk, inv = np.unique(kk, return_inverse=True)
        acc = np.zeros(len(uk), dtype=np.int64)
        np.add.at(acc, inv, rev)
        return pa.table({
            "k": pa.array(uk), "r": pa.array(acc),
            "side": pa.array(np.zeros(len(uk), dtype=np.int8)),
            "cust": pa.array(np.zeros(len(uk), dtype=np.int64)),
            "__b": pa.array((_mix64(uk.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def o_rows(t: pa.Table) -> pa.Table:
        kk = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "k": pa.array(kk),
            "r": pa.array(np.zeros(len(kk), dtype=np.int64)),
            "side": pa.array(np.ones(len(kk), dtype=np.int8)),
            "cust": t.column("o_custkey"),
            "__b": pa.array((_mix64(kk.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def to_cust(g: pd.DataFrame) -> pd.DataFrame:
        side = g["side"].to_numpy(dtype=np.int8)
        om = side == 1
        ok = g["k"].to_numpy(dtype=np.int64)[om]
        oo = np.argsort(ok, kind="stable")
        ok = ok[oo]
        oc = g["cust"].to_numpy(dtype=np.int64)[om][oo]
        lk = g["k"].to_numpy(dtype=np.int64)[~om]
        lr = g["r"].to_numpy(dtype=np.int64)[~om]
        if not len(ok) or not len(lk):
            return pd.DataFrame({"c": pd.Series([], dtype="int64"),
                                 "r": pd.Series([], dtype="int64")})
        pos = np.searchsorted(ok, lk)
        pos_c = np.minimum(pos, len(ok) - 1)
        hit = ok[pos_c] == lk
        c = oc[pos_c][hit]
        r = lr[hit]
        uc, inv = np.unique(c, return_inverse=True)
        acc = np.zeros(len(uc), dtype=np.int64)
        np.add.at(acc, inv, r)
        return pd.DataFrame({"c": uc, "r": acc})

    percust = li.map_batches(li_rows, batch_format="pyarrow") \
        .union(orders.map_batches(o_rows, batch_format="pyarrow")) \
        .groupby("__b").map_groups(to_cust, batch_format="pandas")

    def tag2(t: pa.Table) -> pa.Table:
        c = t.column("c").to_numpy(zero_copy_only=False)
        return t.append_column(
            "__b2", pa.array((_mix64(c.astype(np.uint64))
                              % np.uint64(num_buckets)).astype(np.int64)))

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("c", as_index=False)["r"].sum()
        return agg.sort_values(["r", "c"],
                               ascending=[False, True]).head(k)

    parts = percust.map_batches(tag2, batch_format="pyarrow") \
        .groupby("__b2").map_groups(topk, batch_format="pandas").to_pandas()
    out = parts.sort_values(["r", "c"], ascending=[False, True]).head(k)

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_name"]).to_pandas()
    out = out.merge(cust, left_on="c", right_on="c_custkey")
    return out[["c_custkey", "c_name", "r"]] \
        .rename(columns={"r": "rev_e4"}) \
        .sort_values("c_custkey").reset_index(drop=True) \
        .astype({"c_custkey": "int64", "rev_e4": "int64"})


QUERIES["q10_returned_revenue_customers"] = q10_returned_revenue_customers
ORACLES["q10_returned_revenue_customers"] = """
    WITH r AS (
      SELECT o_custkey AS c_custkey,
             CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                      * (100 - CAST(ROUND(l_discount*100) AS BIGINT)))
                  AS BIGINT) AS rev_e4
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1995-04-01'
      GROUP BY o_custkey
      ORDER BY rev_e4 DESC, c_custkey LIMIT 20)
    SELECT c_custkey, c_name, rev_e4
    FROM r JOIN customer USING (c_custkey)
    ORDER BY c_custkey
"""


def q19_disjunctive_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q19 shape — the OR-of-conjunct-groups predicate join:
    revenue from lineitems whose PART matches any of three
    (brand, size-range, quantity-range) clauses. Disjunctions defeat
    read-side pushdown, so the filter runs as one vectorized per-batch
    mask instead: part attributes broadcast once (dimension contract),
    each lineitem batch gathers its part's (brand-id, size) by
    searchsorted and evaluates all three clauses as boolean algebra —
    zero shuffles, one exact int64 revenue fold, where the SQL twin
    pays a join."""
    import ray

    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_brand", "p_size"]).to_pandas()
    pk = part["p_partkey"].to_numpy(dtype=np.int64)
    order = np.argsort(pk)
    pk = pk[order]
    brands = pd.Index(sorted(part["p_brand"].unique()))
    bid = brands.get_indexer(part["p_brand"]).astype(np.int64)[order]
    psz = part["p_size"].to_numpy(dtype=np.int64)[order]
    b1, b2, b3 = (int(brands.get_indexer([f"Brand#{i}"])[0])
                  for i in (1, 2, 3))
    dim = ray.put((pk, bid, psz))

    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice",
                        "l_discount"])

    class Clause:
        def __init__(self):
            self.pk, self.bid, self.psz = ray.get(dim)

        def __call__(self, t: pa.Table) -> pa.Table:
            lp = t.column("l_partkey").to_numpy(zero_copy_only=False)
            qty = pc.cast(pc.round(t.column("l_quantity")), pa.int64()) \
                .to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self.pk, lp)
            pos = np.minimum(pos, len(self.pk) - 1)
            ok = self.pk[pos] == lp
            b = self.bid[pos]
            s = self.psz[pos]
            c1 = (b == b1) & (s >= 1) & (s <= 15) & (qty >= 1) & (qty <= 15)
            c2 = (b == b2) & (s >= 10) & (s <= 30) & (qty >= 5) & (qty <= 25)
            c3 = (b == b3) & (s >= 20) & (s <= 50) & (qty >= 10) & (qty <= 40)
            m = ok & (c1 | c2 | c3)
            price = _cents(t.column("l_extendedprice")) \
                .to_numpy(zero_copy_only=False)
            disc = _cents(t.column("l_discount")) \
                .to_numpy(zero_copy_only=False)
            rev = price[m] * (100 - disc[m])
            return pa.table({"s": pa.array([int(rev.sum())]),
                             "n": pa.array([int(m.sum())])})

    p = ds.map_batches(Clause, batch_format="pyarrow",
                       concurrency=auto_concurrency()).to_pandas()
    return _one_row(n_items=np.int64(int(p["n"].sum())),
                    rev_e4=np.int64(int(p["s"].sum())))


QUERIES["q19_disjunctive_revenue"] = q19_disjunctive_revenue
ORACLES["q19_disjunctive_revenue"] = """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount*100) AS BIGINT))), 0)
                AS BIGINT) AS rev_e4
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 15)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 5 AND 25)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 10 AND 40)
"""


def q4_late_orders_by_priority(sf_dir: str, late_days: int = 60,
                               num_buckets: int = 64) -> pd.DataFrame:
    """TPC-H Q4 shape (adapted: no commitdate column, so 'late' means
    a lineitem shipped > late_days after the order date) — the GROUPED
    EXISTS where the predicate needs BOTH sides: per 1995-H1-order
    priority, how many orders have at least one late lineitem.
    One orderkey exchange carries lineitem as (okey, shipdate) and the
    date-pruned orders as (okey, odate, priority-idx); inside a bucket
    a searchsorted span test per order resolves EXISTS via a
    max-shipdate segment reduce (any ship > odate + cut), and each
    bucket collapses to ≤5 (priority, n) partials."""
    import pyarrow.dataset as pads
    import ray.data

    from ..stages.dedup import _splitmix64 as _mix64

    PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    US_DAY = np.int64(86_400_000_000)
    CUT = np.int64(late_days) * US_DAY
    LO = pd.Timestamp("1995-01-01")
    HI = pd.Timestamp("1995-07-01")

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
        filter=(pads.field("o_orderdate") >= LO)
        & (pads.field("o_orderdate") < HI))

    def li_rows(t: pa.Table) -> pa.Table:
        k = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        ship = pc.cast(t.column("l_shipdate"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        # combiner: only each order's LATEST shipdate matters to EXISTS
        uk, inv = np.unique(k, return_inverse=True)
        mx = np.full(len(uk), -2**62, dtype=np.int64)
        np.maximum.at(mx, inv, ship)
        return pa.table({
            "k": pa.array(uk), "v": pa.array(mx),
            "side": pa.array(np.zeros(len(uk), dtype=np.int8)),
            "p": pa.array(np.zeros(len(uk), dtype=np.int8)),
            "__b": pa.array((_mix64(uk.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def o_rows(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        idx = pc.index_in(t.column("o_orderpriority"),
                          value_set=pa.array(PRIO))
        if idx.null_count:
            raise ValueError("priority outside the Q4 domain")
        return pa.table({
            "k": pa.array(k),
            "v": pc.cast(t.column("o_orderdate"), pa.int64()),
            "side": pa.array(np.ones(len(k), dtype=np.int8)),
            "p": pc.cast(idx, pa.int8()),
            "__b": pa.array((_mix64(k.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def exists_count(g: pd.DataFrame) -> pd.DataFrame:
        side = g["side"].to_numpy(dtype=np.int8)
        lm, om = side == 0, side == 1
        lk = g["k"].to_numpy(dtype=np.int64)[lm]
        lmx = g["v"].to_numpy(dtype=np.int64)[lm]
        lo = np.argsort(lk, kind="stable")
        lk, lmx = lk[lo], lmx[lo]
        # per-order max over the (possibly several) batch partials
        starts = np.r_[0, np.flatnonzero(lk[1:] != lk[:-1]) + 1] \
            if len(lk) else np.array([], dtype=np.int64)
        if len(lk):
            lk = lk[starts]
            lmx = np.maximum.reduceat(lmx, starts)
        ok = g["k"].to_numpy(dtype=np.int64)[om]
        od = g["v"].to_numpy(dtype=np.int64)[om]
        op = g["p"].to_numpy(dtype=np.int8)[om].astype(np.int64)
        if not len(ok) or not len(lk):
            return pd.DataFrame({"p": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        pos = np.searchsorted(lk, ok)
        pos_c = np.minimum(pos, len(lk) - 1)
        hit = lk[pos_c] == ok
        late = hit & (lmx[pos_c] > od + CUT)
        cnt = np.bincount(op[late], minlength=len(PRIO)).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"p": nz, "n": cnt[nz]})

    parts = li.map_batches(li_rows, batch_format="pyarrow") \
        .union(orders.map_batches(o_rows, batch_format="pyarrow")) \
        .groupby("__b").map_groups(exists_count, batch_format="pandas") \
        .to_pandas()
    agg = parts.groupby("p", as_index=False)["n"].sum()
    lab = np.array(PRIO, dtype=object)
    return pd.DataFrame({
        "o_orderpriority": lab[agg["p"].to_numpy(dtype=np.int64)],
        "n_late_orders": agg["n"].astype("int64"),
    }).sort_values("o_orderpriority").reset_index(drop=True)


QUERIES["q4_late_orders_by_priority"] = q4_late_orders_by_priority
ORACLES["q4_late_orders_by_priority"] = """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_late_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1995-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q7_nation_pair_volume(sf_dir: str, num_buckets: int = 64
                          ) -> pd.DataFrame:
    """TPC-H Q7 shape — shipping volume between nation PAIRS by year:
    revenue of 1995/1996-shipped lineitems grouped by (supplier
    nation, customer nation, year), both directions of every pair.
    Both nation maps are dimension broadcasts resolved on OPPOSITE
    sides of the single orderkey exchange (supplier→nation folds into
    the lineitem combiner partials, customer→nation into the orders
    rows), and each bucket collapses straight to (n1, n2, year, rev)
    partials — bounded by 25·25·2 keys, never joined rows."""
    import pyarrow.dataset as pads
    import ray
    import ray.data

    from ..stages.dedup import _splitmix64 as _mix64

    LO = pd.Timestamp("1995-01-01")
    HI = pd.Timestamp("1997-01-01")
    Y96 = np.int64(int(pd.Timestamp("1996-01-01").value // 1000))

    sup = _read(sf_dir, "supplier",
                columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sk = sup["s_suppkey"].to_numpy(dtype=np.int64)
    so = np.argsort(sk)
    sup_map = (sk[so], sup["s_nationkey"].to_numpy(dtype=np.int64)[so])
    cus = _read(sf_dir, "customer",
                columns=["c_custkey", "c_nationkey"]).to_pandas()
    ck = cus["c_custkey"].to_numpy(dtype=np.int64)
    co = np.argsort(ck)
    cus_map = (ck[co], cus["c_nationkey"].to_numpy(dtype=np.int64)[co])
    sup_b, cus_b = ray.put(sup_map), ray.put(cus_map)

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount", "l_shipdate"],
        filter=(pads.field("l_shipdate") >= LO)
        & (pads.field("l_shipdate") < HI))
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    # plain task-pool functions (NOT actor pools): two concurrent
    # actor pools at minimum size would pin 4 CPUs and deadlock a
    # 4-CPU cluster against the downstream sort; ray.get of the
    # broadcast inside a task is a zero-copy plasma read
    def li_rows(t: pa.Table) -> pa.Table:
        sk_a, sn_a = ray.get(sup_b)
        k = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        s = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(sk_a, s)
        pos = np.minimum(pos, len(sk_a) - 1)
        if not bool((sk_a[pos] == s).all()):
            raise ValueError("suppkey missing from dimension")
        n1 = sn_a[pos]
        ship = pc.cast(t.column("l_shipdate"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        yr = (ship >= Y96).astype(np.int64) + 1995
        price = _cents(t.column("l_extendedprice")) \
            .to_numpy(zero_copy_only=False)
        disc = _cents(t.column("l_discount")) \
            .to_numpy(zero_copy_only=False)
        rev = price * (100 - disc)
        # combiner: collapse to (okey, n1, yr) partial sums
        key = (k << np.int64(12)) | (n1 << np.int64(1)) | (yr - 1995)
        uk, inv = np.unique(key, return_inverse=True)
        acc = np.zeros(len(uk), dtype=np.int64)
        np.add.at(acc, inv, rev)
        kk = uk >> np.int64(12)
        return pa.table({
            "k": pa.array(kk),
            "a": pa.array((uk >> np.int64(1)) & np.int64(2047)),
            "y": pa.array((uk & np.int64(1)) + 1995),
            "r": pa.array(acc),
            "side": pa.array(np.zeros(len(uk), dtype=np.int8)),
            "__b": pa.array((_mix64(kk.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def o_rows(t: pa.Table) -> pa.Table:
        ck_a, cn_a = ray.get(cus_b)
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        c = t.column("o_custkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ck_a, c)
        pos = np.minimum(pos, len(ck_a) - 1)
        if not bool((ck_a[pos] == c).all()):
            raise ValueError("custkey missing from dimension")
        return pa.table({
            "k": pa.array(k),
            "a": pa.array(cn_a[pos]),
            "y": pa.array(np.zeros(len(k), dtype=np.int64)),
            "r": pa.array(np.zeros(len(k), dtype=np.int64)),
            "side": pa.array(np.ones(len(k), dtype=np.int8)),
            "__b": pa.array((_mix64(k.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        side = g["side"].to_numpy(dtype=np.int8)
        lm, om = side == 0, side == 1
        ok = g["k"].to_numpy(dtype=np.int64)[om]
        oo = np.argsort(ok, kind="stable")
        ok = ok[oo]
        on = g["a"].to_numpy(dtype=np.int64)[om][oo]
        lk = g["k"].to_numpy(dtype=np.int64)[lm]
        if not len(ok) or not len(lk):
            return pd.DataFrame({"n1": pd.Series([], dtype="int64"),
                                 "n2": pd.Series([], dtype="int64"),
                                 "y": pd.Series([], dtype="int64"),
                                 "r": pd.Series([], dtype="int64")})
        la = g["a"].to_numpy(dtype=np.int64)[lm]
        ly = g["y"].to_numpy(dtype=np.int64)[lm]
        lr = g["r"].to_numpy(dtype=np.int64)[lm]
        pos = np.searchsorted(ok, lk)
        pos_c = np.minimum(pos, len(ok) - 1)
        hit = ok[pos_c] == lk
        n2 = on[pos_c][hit]
        n1, y, r = la[hit], ly[hit], lr[hit]
        code = ((n1 * 32 + n2) * 2) + (y - 1995)
        uc, inv = np.unique(code, return_inverse=True)
        acc = np.zeros(len(uc), dtype=np.int64)
        np.add.at(acc, inv, r)
        return pd.DataFrame({
            "n1": uc // 64, "n2": (uc // 2) % 32,
            "y": (uc % 2) + 1995, "r": acc,
        })

    parts = li.map_batches(li_rows, batch_format="pyarrow") \
        .union(orders.map_batches(o_rows, batch_format="pyarrow")) \
        .groupby("__b").map_groups(fold, batch_format="pandas").to_pandas()
    agg = parts.groupby(["n1", "n2", "y"], as_index=False)["r"].sum()
    return agg.rename(columns={"n1": "supp_nation", "n2": "cust_nation",
                               "y": "l_year", "r": "rev_e4"}) \
        .sort_values(["supp_nation", "cust_nation", "l_year"]) \
        .reset_index(drop=True) \
        .astype({"supp_nation": "int64", "cust_nation": "int64",
                 "l_year": "int64", "rev_e4": "int64"})


QUERIES["q7_nation_pair_volume"] = q7_nation_pair_volume
ORACLES["q7_nation_pair_volume"] = """
    SELECT s_nationkey AS supp_nation,
           c_nationkey AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount*100) AS BIGINT)))
                AS BIGINT) AS rev_e4
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
"""


def q8_market_share_by_year(sf_dir: str, nation: int = 3,
                            num_buckets: int = 64) -> pd.DataFrame:
    """TPC-H Q8 shape — market share: per order-year, the fraction of
    total revenue supplied by one nation, emitted as an EXACT
    (numerator, denominator) integer pair so no division happens on
    either engine. The supplier→nation broadcast folds into the
    lineitem combiner — each batch collapses to ≤2·years partials
    keyed (okey-year needs the ORDER side, so the year attaches in
    the bucket): lineitem crosses the one orderkey exchange as
    (okey, rev, is_nation) partials, orders as (okey, year), and each
    bucket collapses to (year, num, den) rows the driver folds."""
    import ray

    from ..stages.dedup import _splitmix64 as _mix64

    sup = _read(sf_dir, "supplier",
                columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sk = sup["s_suppkey"].to_numpy(dtype=np.int64)
    so = np.argsort(sk)
    sup_b = ray.put((sk[so],
                     sup["s_nationkey"].to_numpy(dtype=np.int64)[so]))

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate"])

    def li_rows(t: pa.Table) -> pa.Table:
        sk_a, sn_a = ray.get(sup_b)
        k = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        s = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(sk_a, s)
        pos = np.minimum(pos, len(sk_a) - 1)
        isn = (sk_a[pos] == s) & (sn_a[pos] == nation)
        price = _cents(t.column("l_extendedprice")) \
            .to_numpy(zero_copy_only=False)
        disc = _cents(t.column("l_discount")).to_numpy(zero_copy_only=False)
        rev = price * (100 - disc)
        key = (k << np.int64(1)) | isn.astype(np.int64)
        uk, inv = np.unique(key, return_inverse=True)
        acc = np.zeros(len(uk), dtype=np.int64)
        np.add.at(acc, inv, rev)
        kk = uk >> np.int64(1)
        return pa.table({
            "k": pa.array(kk),
            "v": pa.array(acc),
            "f": pc.cast(pa.array((uk & np.int64(1)).astype(np.int8)),
                         pa.int8()),
            "side": pa.array(np.zeros(len(uk), dtype=np.int8)),
            "__b": pa.array((_mix64(kk.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def o_rows(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        od = pc.cast(t.column("o_orderdate"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        yr = (pd.to_datetime(od, unit="us").year.to_numpy()
              .astype(np.int64))
        return pa.table({
            "k": pa.array(k),
            "v": pa.array(yr),
            "f": pa.array(np.zeros(len(k), dtype=np.int8)),
            "side": pa.array(np.ones(len(k), dtype=np.int8)),
            "__b": pa.array((_mix64(k.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        side = g["side"].to_numpy(dtype=np.int8)
        lm, om = side == 0, side == 1
        ok = g["k"].to_numpy(dtype=np.int64)[om]
        oo = np.argsort(ok, kind="stable")
        ok = ok[oo]
        oy = g["v"].to_numpy(dtype=np.int64)[om][oo]
        lk = g["k"].to_numpy(dtype=np.int64)[lm]
        if not len(ok) or not len(lk):
            return pd.DataFrame({"y": pd.Series([], dtype="int64"),
                                 "num": pd.Series([], dtype="int64"),
                                 "den": pd.Series([], dtype="int64")})
        lv = g["v"].to_numpy(dtype=np.int64)[lm]
        lf = g["f"].to_numpy(dtype=np.int8)[lm].astype(np.int64)
        pos = np.searchsorted(ok, lk)
        pos_c = np.minimum(pos, len(ok) - 1)
        hit = ok[pos_c] == lk
        y = oy[pos_c][hit]
        v, f = lv[hit], lf[hit]
        uy, inv = np.unique(y, return_inverse=True)
        den = np.zeros(len(uy), dtype=np.int64)
        num = np.zeros(len(uy), dtype=np.int64)
        np.add.at(den, inv, v)
        np.add.at(num, inv, v * f)
        return pd.DataFrame({"y": uy, "num": num, "den": den})

    parts = li.map_batches(li_rows, batch_format="pyarrow") \
        .union(orders.map_batches(o_rows, batch_format="pyarrow")) \
        .groupby("__b").map_groups(fold, batch_format="pandas").to_pandas()
    agg = parts.groupby("y", as_index=False)[["num", "den"]].sum()
    return agg.rename(columns={"y": "o_year", "num": "nation_rev_e4",
                               "den": "total_rev_e4"}) \
        .sort_values("o_year").reset_index(drop=True) \
        .astype({"o_year": "int64", "nation_rev_e4": "int64",
                 "total_rev_e4": "int64"})


QUERIES["q8_market_share_by_year"] = q8_market_share_by_year
ORACLES["q8_market_share_by_year"] = """
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CASE WHEN s_nationkey = 3
                         THEN CAST(ROUND(l_extendedprice*100) AS BIGINT)
                              * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
                         ELSE 0 END) AS BIGINT) AS nation_rev_e4,
           CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount*100) AS BIGINT)))
                AS BIGINT) AS total_rev_e4
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY 1 ORDER BY 1
"""


def q16_supplier_counts_by_brand(sf_dir: str, excl_nation: int = 0,
                                 num_buckets: int = 64) -> pd.DataFrame:
    """TPC-H Q16 shape (adapted: no partsupp table, supply facts come
    from lineitem) — COUNT(DISTINCT supplier) per part brand,
    EXCLUDING a blacklisted supplier set (Q16's NOT IN subquery; here
    the suppliers of one nation): both the part→brand map and the
    exclusion keyset broadcast once; each lineitem batch maps partkey
    →brand-id, drops blacklisted suppliers, and emits DISTINCT
    (brand, suppkey) pairs so the single pair-hash exchange carries
     10-byte rows bounded by the distinct pair count; buckets dedup
    and collapse to (brand, n) partials — a distinct pair lands in
    exactly one bucket, so the driver fold over ≤brands·buckets rows
    is exact."""
    import ray

    from ..stages.dedup import _splitmix64 as _mix64

    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_brand"]).to_pandas()
    pk = part["p_partkey"].to_numpy(dtype=np.int64)
    po = np.argsort(pk)
    brands = pd.Index(sorted(part["p_brand"].unique()))
    bid = brands.get_indexer(part["p_brand"]).astype(np.int64)[po]
    sup = _read(sf_dir, "supplier",
                columns=["s_suppkey", "s_nationkey"]).to_pandas()
    excl = np.sort(sup.loc[sup["s_nationkey"] == excl_nation,
                           "s_suppkey"].to_numpy(dtype=np.int64))
    dim = ray.put((pk[po], bid, excl))
    NB = np.int64(len(brands))

    ds = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def pairs(t: pa.Table) -> pa.Table:
        pk_a, bid_a, excl_a = ray.get(dim)
        lp = t.column("l_partkey").to_numpy(zero_copy_only=False)
        ls = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(pk_a, lp)
        pos = np.minimum(pos, len(pk_a) - 1)
        ok = pk_a[pos] == lp
        if len(excl_a):
            ep = np.searchsorted(excl_a, ls)
            ep = np.minimum(ep, len(excl_a) - 1)
            ok &= excl_a[ep] != ls
        b = bid_a[pos][ok]
        s = ls[ok]
        key = np.unique(s * NB + b)
        return pa.table({
            "k": pa.array(key),
            "__b": pa.array((_mix64(key.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        k = np.unique(g["k"].to_numpy(dtype=np.int64))
        b = k % NB
        ub, n = np.unique(b, return_counts=True)
        return pd.DataFrame({"b": ub, "n": n.astype(np.int64)})

    parts = ds.map_batches(pairs, batch_format="pyarrow") \
        .groupby("__b").map_groups(count_bucket, batch_format="pandas") \
        .to_pandas()
    agg = parts.groupby("b", as_index=False)["n"].sum()
    lab = brands.to_numpy()
    return pd.DataFrame({
        "p_brand": lab[agg["b"].to_numpy(dtype=np.int64)],
        "n_suppliers": agg["n"].astype("int64"),
    }).sort_values("p_brand").reset_index(drop=True)


QUERIES["q16_supplier_counts_by_brand"] = q16_supplier_counts_by_brand
ORACLES["q16_supplier_counts_by_brand"] = """
    SELECT p_brand,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_nationkey = 0)
    GROUP BY p_brand ORDER BY p_brand
"""


def q9_profit_by_nation_year(sf_dir: str, num_buckets: int = 64
                             ) -> pd.DataFrame:
    """TPC-H Q9 shape (adapted: no partsupp, so cost is modeled as 20%
    of the part's retail price per unit — stated identically in the
    oracle) — profit by (supplier nation, order year): profit_e4 =
    rev_e4 − 20·qty·retail_cents. BOTH part-cost and supplier-nation
    dimensions fold into the lineitem combiner (searchsorted gathers
    against two broadcasts), nation packs into the partial key beside
    the orderkey, and the year joins bucket-side from the orders rows
    — one exchange, partials bounded by orders × nations-touched."""
    import ray

    from ..stages.dedup import _splitmix64 as _mix64

    sup = _read(sf_dir, "supplier",
                columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sk = sup["s_suppkey"].to_numpy(dtype=np.int64)
    so = np.argsort(sk)
    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_retailprice"]).to_pandas()
    pk = part["p_partkey"].to_numpy(dtype=np.int64)
    po = np.argsort(pk)
    retail = np.round(part["p_retailprice"].to_numpy() * 100) \
        .astype(np.int64)[po]
    dim = ray.put((sk[so], sup["s_nationkey"].to_numpy(dtype=np.int64)[so],
                   pk[po], retail))

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_partkey",
                        "l_quantity", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate"])

    def li_rows(t: pa.Table) -> pa.Table:
        sk_a, sn_a, pk_a, rt_a = ray.get(dim)
        k = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        s = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        p = t.column("l_partkey").to_numpy(zero_copy_only=False)
        spos = np.minimum(np.searchsorted(sk_a, s), len(sk_a) - 1)
        ppos = np.minimum(np.searchsorted(pk_a, p), len(pk_a) - 1)
        if not bool((sk_a[spos] == s).all() and (pk_a[ppos] == p).all()):
            raise ValueError("dimension key missing")
        n1 = sn_a[spos]
        qty = pc.cast(pc.round(t.column("l_quantity")), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        price = _cents(t.column("l_extendedprice")) \
            .to_numpy(zero_copy_only=False)
        disc = _cents(t.column("l_discount")).to_numpy(zero_copy_only=False)
        profit = price * (100 - disc) - 20 * qty * rt_a[ppos]
        key = (k << np.int64(6)) | n1
        uk, inv = np.unique(key, return_inverse=True)
        acc = np.zeros(len(uk), dtype=np.int64)
        np.add.at(acc, inv, profit)
        kk = uk >> np.int64(6)
        return pa.table({
            "k": pa.array(kk),
            "v": pa.array(acc),
            "a": pa.array(uk & np.int64(63)),
            "side": pa.array(np.zeros(len(uk), dtype=np.int8)),
            "__b": pa.array((_mix64(kk.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def o_rows(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        od = pc.cast(t.column("o_orderdate"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        yr = pd.to_datetime(od, unit="us").year.to_numpy().astype(np.int64)
        return pa.table({
            "k": pa.array(k),
            "v": pa.array(yr),
            "a": pa.array(np.zeros(len(k), dtype=np.int64)),
            "side": pa.array(np.ones(len(k), dtype=np.int8)),
            "__b": pa.array((_mix64(k.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        side = g["side"].to_numpy(dtype=np.int8)
        lm, om = side == 0, side == 1
        ok = g["k"].to_numpy(dtype=np.int64)[om]
        oo = np.argsort(ok, kind="stable")
        ok = ok[oo]
        oy = g["v"].to_numpy(dtype=np.int64)[om][oo]
        lk = g["k"].to_numpy(dtype=np.int64)[lm]
        if not len(ok) or not len(lk):
            return pd.DataFrame({"n1": pd.Series([], dtype="int64"),
                                 "y": pd.Series([], dtype="int64"),
                                 "v": pd.Series([], dtype="int64")})
        lv = g["v"].to_numpy(dtype=np.int64)[lm]
        la = g["a"].to_numpy(dtype=np.int64)[lm]
        pos = np.searchsorted(ok, lk)
        pos_c = np.minimum(pos, len(ok) - 1)
        hit = ok[pos_c] == lk
        y = oy[pos_c][hit]
        v, n1 = lv[hit], la[hit]
        code = n1 * 4096 + y
        uc, inv = np.unique(code, return_inverse=True)
        acc = np.zeros(len(uc), dtype=np.int64)
        np.add.at(acc, inv, v)
        return pd.DataFrame({"n1": uc // 4096, "y": uc % 4096, "v": acc})

    parts = li.map_batches(li_rows, batch_format="pyarrow") \
        .union(orders.map_batches(o_rows, batch_format="pyarrow")) \
        .groupby("__b").map_groups(fold, batch_format="pandas").to_pandas()
    agg = parts.groupby(["n1", "y"], as_index=False)["v"].sum()
    return agg.rename(columns={"n1": "supp_nation", "y": "o_year",
                               "v": "profit_e4"}) \
        .sort_values(["supp_nation", "o_year"]).reset_index(drop=True) \
        .astype({"supp_nation": "int64", "o_year": "int64",
                 "profit_e4": "int64"})


QUERIES["q9_profit_by_nation_year"] = q9_profit_by_nation_year
ORACLES["q9_profit_by_nation_year"] = """
    SELECT s_nationkey AS supp_nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
                    - 20 * CAST(ROUND(l_quantity) AS BIGINT)
                      * CAST(ROUND(p_retailprice*100) AS BIGINT))
                AS BIGINT) AS profit_e4
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN part ON l_partkey = p_partkey
    GROUP BY 1, 2 ORDER BY 1, 2
"""


def q20_majority_suppliers(sf_dir: str, num_buckets: int = 64
                           ) -> pd.DataFrame:
    """TPC-H Q20 shape (adapted: availability facts come from
    lineitem) — the nested correlated-aggregate filter: suppliers who
    shipped MORE THAN HALF of some part's total shipped quantity.
    Two-level aggregation over ONE partkey exchange: lineitem
    collapses per batch to (partkey, suppkey, qty) partials, each
    partkey bucket finishes both levels — per-(part,supp) sums by
    lexsort/reduceat, per-part totals by a second reduceat over the
    collapsed rows — and applies the strict-majority test by integer
    cross-multiplication 2·q > total, emitting only qualifying
    suppkeys; a final driver dedup (suppliers qualify once per ANY
    part) of result-bounded rows."""
    from ..stages.dedup import _splitmix64 as _mix64

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        p = t.column("l_partkey").to_numpy(zero_copy_only=False)
        s = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        q = pc.cast(pc.round(t.column("l_quantity")), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        NS = np.int64(1) << np.int64(20)
        key = p * NS + s
        uk, inv = np.unique(key, return_inverse=True)
        acc = np.zeros(len(uk), dtype=np.int64)
        np.add.at(acc, inv, q)
        pp = uk // NS
        return pa.table({
            "p": pa.array(pp), "s": pa.array(uk % NS), "q": pa.array(acc),
            "__b": pa.array((_mix64(pp.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def majority(g: pd.DataFrame) -> pd.DataFrame:
        p = g["p"].to_numpy(dtype=np.int64)
        s = g["s"].to_numpy(dtype=np.int64)
        q = g["q"].to_numpy(dtype=np.int64)
        order = np.lexsort((s, p))
        p, s, q = p[order], s[order], q[order]
        key_change = np.r_[True, (p[1:] != p[:-1]) | (s[1:] != s[:-1])]
        starts = np.flatnonzero(key_change)
        p2, s2 = p[starts], s[starts]
        q2 = np.add.reduceat(q, starts)
        pstarts = np.r_[0, np.flatnonzero(p2[1:] != p2[:-1]) + 1]
        ptot = np.add.reduceat(q2, pstarts)
        grp = np.repeat(np.arange(len(pstarts)),
                        np.diff(np.r_[pstarts, len(p2)]))
        win = 5 * q2 > ptot[grp]
        return pd.DataFrame({"s": np.unique(s2[win])})

    parts = li.map_batches(partial, batch_format="pyarrow") \
        .groupby("__b").map_groups(majority, batch_format="pandas") \
        .to_pandas()
    vals = (parts["s"].to_numpy(dtype=np.int64)
            if "s" in parts.columns and len(parts)
            else np.array([], dtype=np.int64))
    out = pd.DataFrame({"l_suppkey": np.unique(vals)})
    return out.astype({"l_suppkey": "int64"})


QUERIES["q20_majority_suppliers"] = q20_majority_suppliers
ORACLES["q20_majority_suppliers"] = """
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    pt AS (SELECT l_partkey, CAST(SUM(q) AS BIGINT) AS total
           FROM ps GROUP BY l_partkey)
    SELECT DISTINCT ps.l_suppkey
    FROM ps JOIN pt USING (l_partkey)
    WHERE 5 * ps.q > pt.total
    ORDER BY ps.l_suppkey
"""


def novelty_score_docs(sf_dir: str, num_buckets: int = 64
                       ) -> pd.DataFrame:
    """Document novelty scoring — for each document, how many of its
    DISTINCT word-3-grams appear in NO earlier document (by doc_id):
    the curation signal between exact dedup and near-dup (a doc whose
    grams are all old is a soft duplicate even when no single source
    matches). Global 'first occurrence' is a per-gram MIN(doc_id), so
    ONE gram-hash exchange of per-doc-distinct (gram, doc) pairs
    resolves everything: each bucket takes per-gram minima
    (lexsort + minimum.reduceat), counts per doc both its grams in
    the bucket and those it owns first, and emits (doc, n_grams,
    n_novel) partials — summed per doc, they are exact because each
    gram lives in exactly one bucket."""
    from ..stages.dedup import _splitmix64 as _mix64

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def gram_pairs(t: pa.Table) -> pa.Table:
        w = pc.split_pattern(
            pc.fill_null(t.column("text"), ""), " ").combine_chunks()
        n_per = pc.list_value_length(w).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(w)
        n = len(flat)
        if n < 3:
            return pa.table({"g": pa.array([], pa.string()),
                             "d": pa.array([], pa.int64()),
                             "__b": pa.array([], pa.int64())})
        a = flat.slice(0, n - 2)
        b = flat.slice(1, n - 2)
        c = flat.slice(2)
        gram = pc.binary_join_element_wise(a, b, c, " ")
        # positions crossing a doc boundary are invalid
        ends = np.cumsum(n_per)
        keep = np.ones(n - 2, dtype=bool)
        for off in (1, 2):
            bad = ends - off
            bad = bad[(bad >= 0) & (bad < n - 2)]
            keep[bad] = False
        doc = np.repeat(t.column("doc_id").to_numpy(zero_copy_only=False),
                        n_per)[: n - 2]
        df = pd.DataFrame({"g": gram.to_pandas(), "d": doc})[keep]
        df = df.drop_duplicates()
        h = pd.util.hash_pandas_object(df["g"], index=False).to_numpy()
        df["__b"] = (_mix64(h) % np.uint64(num_buckets)).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def fold(gdf: pd.DataFrame) -> pd.DataFrame:
        g = gdf["g"].to_numpy()
        d = gdf["d"].to_numpy(dtype=np.int64)
        order = np.lexsort((d, g))
        g, d = g[order], d[order]
        # batch partials may repeat (gram, doc) across batches: dedup
        key_change = np.r_[True, (g[1:] != g[:-1]) | (d[1:] != d[:-1])]
        g, d = g[key_change], d[key_change]
        starts = np.r_[0, np.flatnonzero(g[1:] != g[:-1]) + 1]
        first = d[starts]  # min doc per gram (d sorted within gram)
        grp = np.repeat(np.arange(len(starts)),
                        np.diff(np.r_[starts, len(g)]))
        novel = d == first[grp]
        ud, inv = np.unique(d, return_inverse=True)
        tot = np.bincount(inv).astype(np.int64)
        nov = np.bincount(inv, weights=novel.astype(np.int64)) \
            .astype(np.int64)
        return pd.DataFrame({"doc_id": ud, "n_grams": tot,
                             "n_novel": nov})

    parts = ds.map_batches(gram_pairs, batch_format="pyarrow") \
        .groupby("__b").map_groups(fold, batch_format="pandas") \
        .to_pandas()
    agg = parts.groupby("doc_id", as_index=False)[["n_grams", "n_novel"]] \
        .sum()
    return agg.sort_values("doc_id").reset_index(drop=True) \
        .astype({"doc_id": "int64", "n_grams": "int64", "n_novel": "int64"})


QUERIES["novelty_score_docs"] = novelty_score_docs
ORACLES["novelty_score_docs"] = """
    WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w
                FROM documents),
    g AS (SELECT DISTINCT doc_id,
                 w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS gram
          FROM ws, UNNEST(generate_series(1, len(w) - 2)) AS t(i)),
    m AS (SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY gram)
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN m.first_doc = g.doc_id
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
    FROM g JOIN m USING (gram)
    GROUP BY g.doc_id ORDER BY doc_id
"""


def acctbal_stats_by_nation(sf_dir: str) -> pd.DataFrame:
    """Grouped SAMPLE variance/stddev from exact integer moments —
    n, Σc, Σc² fold per nation in one zero-shuffle pass (c² split
    hi/lo), the driver assembles Python-int moments and emits ONE
    float division tree per group written identically in HUGEINT SQL
    (var = (n·Σc² − (Σc)²) / (n·(n−1))), so the doubles hash
    bit-for-bit; the grouped-Bessel completion of the moments family
    (global corr → grouped corr → grouped dispersion)."""
    ds = _read(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])

    def moments(t: pa.Table) -> pd.DataFrame:
        g = t.column("c_nationkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        c = _cents(t.column("c_acctbal")).to_numpy(zero_copy_only=False)
        cc = c * c
        hi, lo = cc >> np.int64(32), cc & np.int64((1 << 32) - 1)
        ug = np.unique(g)
        rows = []
        for i in ug:
            m = g == i
            rows.append({"g": int(i), "n": int(m.sum()),
                         "s": int(c[m].sum()),
                         "hi": int(hi[m].sum()), "lo": int(lo[m].sum())})
        return pd.DataFrame(rows)

    p = ds.map_batches(moments, batch_format="pyarrow").to_pandas()
    out = []
    for i in sorted(p["g"].unique()):
        rows = p[p["g"] == i]
        n = int(rows["n"].sum())
        s = int(rows["s"].sum())
        ss = (int(rows["hi"].sum()) << 32) + int(rows["lo"].sum())
        var = (float(n * ss - s * s) / float(n * (n - 1))
               if n > 1 else 0.0)
        out.append({"c_nationkey": np.int64(i), "n": np.int64(n),
                    "sum_cents": np.int64(s), "var_cents2": var})
    return pd.DataFrame(out).astype(
        {"c_nationkey": "int64", "n": "int64", "sum_cents": "int64"})


QUERIES["acctbal_stats_by_nation"] = acctbal_stats_by_nation
ORACLES["acctbal_stats_by_nation"] = """
    WITH m AS (
      SELECT c_nationkey,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(c) AS HUGEINT) AS s,
             SUM(CAST(c AS HUGEINT) * c) AS ss
      FROM (SELECT c_nationkey,
                   CAST(ROUND(c_acctbal*100) AS BIGINT) AS c
            FROM customer)
      GROUP BY c_nationkey)
    SELECT c_nationkey, CAST(n AS BIGINT) AS n,
           CAST(s AS BIGINT) AS sum_cents,
           CASE WHEN n > 1
                THEN CAST(n*ss - s*s AS DOUBLE) / CAST(n*(n-1) AS DOUBLE)
                ELSE 0.0 END AS var_cents2
    FROM m ORDER BY c_nationkey
"""


def longest_streak_by_user(sf_dir: str, num_buckets: int = 64
                           ) -> pd.DataFrame:
    """Gaps-and-islands: each user's LONGEST run of consecutive active
    days — the streak/retention operator (SQL's day − ROW_NUMBER()
    island trick): events collapse per batch to deduped 16-byte
    (user, day) pairs (the retention-cohort exchange bound), ONE
    user-hash exchange, and inside a bucket a single lexsort finds
    every island at once — run boundaries are new-user OR day-gap≠1,
    run lengths by diff-of-boundaries, per-user max by
    maximum.reduceat. No window function, no per-user loop."""
    from ..stages.dedup import _splitmix64 as _mix64

    US_DAY = np.int64(86_400_000_000)

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def pairs(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        d = pc.cast(t.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False) // US_DAY
        key = np.unique(u * np.int64(1 << 20) + d)
        uu = key >> np.int64(20)
        return pa.table({
            "u": pa.array(uu),
            "d": pa.array(key & np.int64((1 << 20) - 1)),
            "__b": pa.array((_mix64(uu.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def streaks(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(dtype=np.int64)
        d = g["d"].to_numpy(dtype=np.int64)
        key = u * np.int64(1 << 20) + d
        key = np.unique(key)  # re-dedup across batch partials
        u, d = key >> np.int64(20), key & np.int64((1 << 20) - 1)
        if not len(u):
            return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                                 "longest_streak": pd.Series([], dtype="int64")})
        new_run = np.r_[True, (u[1:] != u[:-1]) | (d[1:] - d[:-1] != 1)]
        run_starts = np.flatnonzero(new_run)
        run_len = np.diff(np.r_[run_starts, len(u)])
        run_user = u[run_starts]
        user_starts = np.r_[0, np.flatnonzero(
            run_user[1:] != run_user[:-1]) + 1]
        return pd.DataFrame({
            "user_id": run_user[user_starts],
            "longest_streak": np.maximum.reduceat(run_len, user_starts)
            .astype(np.int64),
        })

    out = ds.map_batches(pairs, batch_format="pyarrow") \
        .groupby("__b").map_groups(streaks, batch_format="pandas") \
        .to_pandas()
    return out.sort_values("user_id").reset_index(drop=True) \
        .astype({"user_id": "int64", "longest_streak": "int64"})


QUERIES["longest_streak_by_user"] = longest_streak_by_user
ORACLES["longest_streak_by_user"] = """
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d
      FROM events),
    isl AS (SELECT user_id,
                   d - ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY d) AS grp
            FROM days),
    runs AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len
             FROM isl GROUP BY user_id, grp)
    SELECT user_id, CAST(MAX(len) AS BIGINT) AS longest_streak
    FROM runs GROUP BY user_id ORDER BY user_id
"""


def mad_value_by_event_type(sf_dir: str) -> pd.DataFrame:
    """Median absolute deviation per group — ROBUST dispersion, the
    outlier-resistant twin of `outlier_events_zscore`'s σ: two grouped
    exact order-statistic passes (the per-type median, then the median
    of |c − m| with the ≤5-entry median table captured in the second
    pass's closure). Group count is domain-bounded (5 types) so each
    pass is the small-group map_groups layout; both medians use the
    lower-element (n+1)//2 convention stated identically in SQL."""
    TYPES = ["click", "error", "purchase", "signup", "view"]

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t.column("event_type"),
                         "c": _cents(t.column("value"))})

    base = ds.map_batches(prep, batch_format="pyarrow")

    def med(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["c"].to_numpy())
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "m": [int(v[(len(v) - 1) // 2])]})

    med_df = base.groupby("event_type").map_groups(
        med, batch_format="pandas").to_pandas()
    med_idx = pd.Index(med_df["event_type"])
    med_arr = med_df["m"].to_numpy(dtype=np.int64)

    def dev(t: pa.Table) -> pa.Table:
        idx = med_idx.get_indexer(t.column("event_type").to_pandas())
        if (idx < 0).any():
            raise ValueError("event_type outside the MAD median table")
        c = t.column("c").to_numpy(zero_copy_only=False)
        return pa.table({"event_type": t.column("event_type"),
                         "c": pa.array(np.abs(c - med_arr[idx]))})

    def med2(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g["c"].to_numpy())
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "mad_cents": [int(v[(len(v) - 1) // 2])]})

    out = base.map_batches(dev, batch_format="pyarrow") \
        .groupby("event_type").map_groups(med2, batch_format="pandas") \
        .to_pandas()
    out = out.merge(med_df, on="event_type") \
        .rename(columns={"m": "median_cents"})
    return out[["event_type", "median_cents", "mad_cents"]] \
        .sort_values("event_type").reset_index(drop=True) \
        .astype({"median_cents": "int64", "mad_cents": "int64"})


QUERIES["mad_value_by_event_type"] = mad_value_by_event_type
ORACLES["mad_value_by_event_type"] = """
    WITH v AS (SELECT event_type,
                      CAST(ROUND(value*100) AS BIGINT) AS c FROM events),
    m AS (
      SELECT event_type, CAST(vc AS BIGINT) AS median_cents FROM (
        SELECT event_type, c AS vc,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS cnt
        FROM v)
      WHERE rn = (cnt + 1) // 2),
    d AS (SELECT v.event_type, ABS(v.c - m.median_cents) AS a
          FROM v JOIN m USING (event_type))
    SELECT event_type, m.median_cents, CAST(vc AS BIGINT) AS mad_cents
    FROM (
      SELECT event_type, a AS vc,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY a) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS cnt
      FROM d)
    JOIN m USING (event_type)
    WHERE rn = (cnt + 1) // 2
    ORDER BY event_type
"""


def top_cosine_pairs(sf_dir: str, k: int = 20,
                     block_rows: int = 2048) -> pd.DataFrame:
    """All-pairs cosine top-k over the embedding table — the
    similarity-JOIN head of the ANN family, TILED (VERDICT r03 item 1):
    the quantized corpus is materialized as a Ray Dataset and its own
    object-store block refs become the tiles — no single object (and
    never the driver) holds the corpus; a dataset of (block_i, block_j)
    index pairs fans the exact int64 matmul out over map_batches, each
    task fetching exactly its two blocks from plasma (node-local after
    the first read). Every unordered pair lives in exactly one tile
    cell (id_b > id_a mask), so per-tile top-k under the FULL result
    order (cos desc, a, b) is a sound superset of the global top-k;
    the driver folds ≤ k·tiles rows. Components quantize at
    fixed-point 2^10 (SQL-ROUND half-away), dots and norms stay exact
    int64, and cosine is ONE float expression per pair (CAST exact
    dot / √(exact na·nb)) written identically in SQL — bit-matched
    doubles, deterministic tiebreak."""
    import math

    import ray
    import ray.data

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    Q = np.float64(1 << 10)

    def quantize(t: pa.Table) -> pa.Table:
        col = t.column("embedding").combine_chunks()
        n = len(col)
        flat = col.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64).reshape(n, -1) * Q
        qm = np.copysign(np.floor(np.abs(flat) + 0.5), flat) \
            .astype(np.int64)
        return pa.table({
            "vec_id": t.column("vec_id").combine_chunks().cast(pa.int64()),
            "q": pa.FixedSizeListArray.from_arrays(
                pa.array(qm.reshape(-1)), qm.shape[1]),
            "sq": pa.array((qm * qm).sum(axis=1)),
        })

    n = ds.count()
    nb = max(1, (n + block_rows - 1) // block_rows)
    qds = ds.map_batches(quantize, batch_format="pyarrow") \
        .repartition(nb).materialize()
    refs = qds.to_arrow_refs()
    nb = len(refs)

    tiles = [(bi, bj) for bi in range(nb) for bj in range(bi, nb)]
    tile_ds = ray.data.from_pandas(pd.DataFrame(
        {"bi": [x[0] for x in tiles], "bj": [x[1] for x in tiles]}))

    def unpack(tb: pa.Table):
        ids = tb.column("vec_id").to_numpy(zero_copy_only=False)
        q = np.asarray(tb.column("q").combine_chunks().flatten()
                       .to_numpy(zero_copy_only=False)) \
            .reshape(tb.num_rows, -1)
        sq = tb.column("sq").to_numpy(zero_copy_only=False)
        return ids, q, sq

    def tile_topk(t: pa.Table) -> pa.Table:
        cache: dict[int, tuple] = {}

        def blk(i: int):
            if i not in cache:
                cache[i] = unpack(ray.get(refs[i]))
            return cache[i]

        oa, ob, oc = [], [], []
        for bi, bj in zip(t.column("bi").to_pylist(),
                          t.column("bj").to_pylist()):
            aid, aq, asq = blk(bi)
            bid, bq, bsq = blk(bj)
            if not len(aid) or not len(bid):
                continue
            dots = aq @ bq.T  # exact int64
            # each unordered pair is claimed by exactly one tile cell
            mask = bid[None, :] > aid[:, None]
            cos = dots / np.sqrt(
                (asq[:, None] * bsq[None, :]).astype(np.float64))
            cos = np.where(mask, cos, -np.inf)
            # top-k under the FULL result order (cos desc, a, b) so
            # boundary ties (exact-duplicate vectors → cos == 1.0)
            # select identically to the SQL's ORDER BY ... LIMIT
            r, c = np.nonzero(mask)
            if not len(r):
                continue
            cv = cos[r, c]
            if len(cv) > k:
                # tie-safe partial select: keep everything ≥ the k-th
                # largest cosine (ALL boundary ties survive — exact-dup
                # vectors make cos == 1.0 ties common), then order
                vk = np.partition(cv, len(cv) - k)[len(cv) - k]
                keep = cv >= vk
                r, c, cv = r[keep], c[keep], cv[keep]
            order = np.lexsort((bid[c], aid[r], -cv))[:k]
            r, c = r[order], c[order]
            # recompute each kept cosine as the SCALAR expression the
            # SQL states (float(dot) / sqrt(float(na*nb))) — the
            # vectorized screen above may round differently
            oc.extend(float(dots[i, j])
                      / math.sqrt(float(int(asq[i]) * int(bsq[j])))
                      for i, j in zip(r, c))
            oa.extend(aid[r])
            ob.extend(bid[c])
        return pa.table({
            "vec_a": pa.array(np.array(oa, dtype=np.int64)),
            "vec_b": pa.array(np.array(ob, dtype=np.int64)),
            "cos": pa.array(np.array(oc, dtype=np.float64)),
        })

    parts = tile_ds.map_batches(tile_topk, batch_format="pyarrow",
                                batch_size=8).to_pandas()
    out = parts.sort_values(["cos", "vec_a", "vec_b"],
                            ascending=[False, True, True]).head(k)
    return out.reset_index(drop=True) \
        .astype({"vec_a": "int64", "vec_b": "int64"})


QUERIES["top_cosine_pairs"] = top_cosine_pairs
ORACLES["top_cosine_pairs"] = """
    WITH q AS (SELECT vec_id,
                      list_transform(embedding,
                                     x -> CAST(ROUND(x*1024) AS BIGINT)) AS v
               FROM embeddings),
    n AS (SELECT vec_id,
                 CAST(list_sum(list_transform(v, x -> x*x)) AS BIGINT) AS sq
          FROM q),
    p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                 CAST(list_sum(list_transform(list_zip(a.v, b.v),
                                              t -> t[1]*t[2])) AS BIGINT)
                   AS dot
          FROM q a JOIN q b ON a.vec_id < b.vec_id)
    SELECT vec_a, vec_b,
           CAST(dot AS DOUBLE)
           / SQRT(CAST(na.sq * nb.sq AS DOUBLE)) AS cos
    FROM p JOIN n na ON na.vec_id = vec_a JOIN n nb ON nb.vec_id = vec_b
    ORDER BY cos DESC, vec_a, vec_b LIMIT 20
"""


def weekend_distinct_users_by_type(sf_dir: str, num_buckets: int = 64
                                   ) -> pd.DataFrame:
    """Conditional distinct count — COUNT(DISTINCT user) FILTER
    (weekend) per event type: the filter applies BEFORE per-batch pair
    dedup, so the single (type, user)-pair exchange carries only
    weekend pairs (predicate pushdown through a distinct aggregate);
    each distinct pair lands in exactly one bucket, buckets collapse
    to (type, n) partials."""
    from ..stages.dedup import _splitmix64 as _mix64

    TYPES = ["click", "error", "purchase", "signup", "view"]
    NT = np.int64(len(TYPES))
    US_DAY = np.int64(86_400_000_000)

    ds = _read(sf_dir, "events", columns=["event_type", "user_id", "ts"])

    def pairs(t: pa.Table) -> pa.Table:
        tu = pc.cast(t.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        dow = ((tu // US_DAY) + 4) % 7
        m = (dow == 0) | (dow == 6)
        idx = pc.index_in(t.column("event_type"), value_set=pa.array(TYPES))
        g = idx.to_numpy(zero_copy_only=False).astype(np.int64)[m]
        u = t.column("user_id").to_numpy(zero_copy_only=False)[m]
        key = np.unique(u * NT + g)
        return pa.table({
            "k": pa.array(key),
            "__b": pa.array((_mix64(key.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def count(g: pd.DataFrame) -> pd.DataFrame:
        k = np.unique(g["k"].to_numpy(dtype=np.int64))
        t, n = np.unique(k % NT, return_counts=True)
        return pd.DataFrame({"t": t, "n": n.astype(np.int64)})

    parts = ds.map_batches(pairs, batch_format="pyarrow") \
        .groupby("__b").map_groups(count, batch_format="pandas") \
        .to_pandas()
    agg = parts.groupby("t", as_index=False)["n"].sum()
    lab = np.array(TYPES, dtype=object)
    return pd.DataFrame({
        "event_type": lab[agg["t"].to_numpy(dtype=np.int64)],
        "n_weekend_users": agg["n"].astype("int64"),
    }).sort_values("event_type").reset_index(drop=True)


QUERIES["weekend_distinct_users_by_type"] = weekend_distinct_users_by_type
ORACLES["weekend_distinct_users_by_type"] = """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_weekend_users
    FROM events
    WHERE dayofweek(ts) IN (0, 6)
    GROUP BY event_type ORDER BY event_type
"""


def benford_order_prices(sf_dir: str) -> pd.DataFrame:
    """Leading-digit (Benford) distribution of order prices — the
    data-forensics screen for fabricated numeric columns: digit
    extraction is EXACT integer arithmetic (searchsorted against the
    19 powers of ten, then one integer divide) — no float log10,
    whose boundary rounding at exact powers of ten could misclassify;
    counts fold as a ≤9-cell zero-shuffle combiner. SQL extracts the
    first character of the decimal string — a different exact method,
    same answer."""
    POW10 = np.array([10 ** i for i in range(19)], dtype=np.int64)

    ds = _read(sf_dir, "orders", columns=["o_totalprice"])

    def digits(t: pa.Table) -> pa.Table:
        c = _cents(t.column("o_totalprice")).to_numpy(zero_copy_only=False)
        c = c[c > 0]
        mag = np.searchsorted(POW10, c, side="right") - 1
        d = c // POW10[mag]
        cnt = np.bincount(d, minlength=10).astype(np.int64)
        return pa.table({"digit": pa.array(np.arange(1, 10, dtype=np.int64)),
                         "n": pa.array(cnt[1:])})

    p = ds.map_batches(digits, batch_format="pyarrow").to_pandas() \
        .groupby("digit", as_index=False)["n"].sum()
    p = p[p["n"] > 0]
    return p.sort_values("digit").reset_index(drop=True) \
        .astype({"digit": "int64", "n": "int64"})


QUERIES["benford_order_prices"] = benford_order_prices
ORACLES["benford_order_prices"] = """
    SELECT CAST(LEFT(CAST(CAST(ROUND(o_totalprice*100) AS BIGINT)
                          AS VARCHAR), 1) AS BIGINT) AS digit,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    WHERE CAST(ROUND(o_totalprice*100) AS BIGINT) > 0
    GROUP BY 1 ORDER BY 1
"""


def ship_delay_quartiles(sf_dir: str, num_buckets: int = 64,
                         num_bins: int = 4096) -> pd.DataFrame:
    """Join-then-exact-percentiles composition: p25/p50/p75 of each
    lineitem's ship delay (days from order date) — the delay needs the
    orderkey join first (q12's 16-byte two-sided exchange), the joined
    DELAYS materialize as a small int64-column dataset (one value per
    lineitem, never the joined row), and the sort-free histogram
    percentile layout (min/max pass → nonzero-bin partials → one
    filtered gather) runs over it — PERCENTILE_DISC k=⌈q·n⌉−1 like
    `exact_percentile_price`, but over a DERIVED column no read
    pushdown could produce."""
    import ray

    from ..stages.dedup import _splitmix64 as _mix64

    US_DAY = np.int64(86_400_000_000)

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def li_rows(t: pa.Table) -> pa.Table:
        k = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "k": pa.array(k),
            "v": pc.cast(t.column("l_shipdate"), pa.int64()),
            "side": pa.array(np.zeros(len(k), dtype=np.int8)),
            "__b": pa.array((_mix64(k.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def o_rows(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "k": pa.array(k),
            "v": pc.cast(t.column("o_orderdate"), pa.int64()),
            "side": pa.array(np.ones(len(k), dtype=np.int8)),
            "__b": pa.array((_mix64(k.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def delays(g: pd.DataFrame) -> pd.DataFrame:
        side = g["side"].to_numpy(dtype=np.int8)
        lm, om = side == 0, side == 1
        ok = g["k"].to_numpy(dtype=np.int64)[om]
        oo = np.argsort(ok, kind="stable")
        ok = ok[oo]
        od = g["v"].to_numpy(dtype=np.int64)[om][oo]
        lk = g["k"].to_numpy(dtype=np.int64)[lm]
        lv = g["v"].to_numpy(dtype=np.int64)[lm]
        if not len(ok) or not len(lk):
            return pd.DataFrame({"d": pd.Series([], dtype="int64")})
        pos = np.searchsorted(ok, lk)
        pos_c = np.minimum(pos, len(ok) - 1)
        hit = ok[pos_c] == lk
        return pd.DataFrame({"d": (lv[hit] - od[pos_c][hit]) // US_DAY})

    lat = li.map_batches(li_rows, batch_format="pyarrow") \
        .union(orders.map_batches(o_rows, batch_format="pyarrow")) \
        .groupby("__b").map_groups(delays, batch_format="pandas") \
        .materialize()

    def minmax(t: pa.Table) -> pa.Table:
        v = t.column("d").to_numpy(zero_copy_only=False)
        return pa.table({"lo": pa.array([int(v.min()) if len(v) else 0]),
                         "hi": pa.array([int(v.max()) if len(v) else 0]),
                         "n": pa.array([len(v)])})

    meta = lat.map_batches(minmax, batch_format="pyarrow").to_pandas()
    meta = meta[meta["n"] > 0]
    lo, hi = int(meta["lo"].min()), int(meta["hi"].max())
    n = int(meta["n"].sum())
    width = hi - lo + 1

    def hist(t: pa.Table) -> pa.Table:
        v = t.column("d").to_numpy(zero_copy_only=False)
        b = (v - lo) * np.int64(num_bins) // np.int64(width)
        ub, cnt = np.unique(b, return_counts=True)
        return pa.table({"bin": pa.array(ub),
                         "cnt": pa.array(cnt.astype(np.int64))})

    parts = lat.map_batches(hist, batch_format="pyarrow").to_pandas()
    bins = np.zeros(num_bins, dtype=np.int64)
    np.add.at(bins, parts["bin"].to_numpy(dtype=np.int64),
              parts["cnt"].to_numpy(dtype=np.int64))
    cum = np.cumsum(bins)
    qs = (25, 50, 75)
    ks = np.array([-(-q * n // 100) - 1 for q in qs], dtype=np.int64)
    tb = np.searchsorted(cum, ks, side="right")
    before = np.r_[0, cum][tb]
    ref = ray.put(np.unique(tb))

    def gather(t: pa.Table) -> pa.Table:
        want = ray.get(ref)
        v = t.column("d").to_numpy(zero_copy_only=False)
        b = (v - lo) * np.int64(num_bins) // np.int64(width)
        keep = np.isin(b, want)
        return pa.table({"v": pa.array(v[keep]), "b": pa.array(b[keep])})

    got = lat.map_batches(gather, batch_format="pyarrow").to_pandas()
    gv = got["v"].to_numpy(dtype=np.int64)
    gb = got["b"].to_numpy(dtype=np.int64)
    out = []
    for q, k, t_, bef in zip(qs, ks, tb, before):
        inbin = np.sort(gv[gb == t_])
        out.append({"p": np.int64(q),
                    "delay_days": np.int64(inbin[k - bef])})
    return pd.DataFrame(out).astype({"p": "int64", "delay_days": "int64"})


QUERIES["ship_delay_quartiles"] = ship_delay_quartiles
ORACLES["ship_delay_quartiles"] = """
    WITH d AS (
      SELECT CAST((epoch_us(l_shipdate) - epoch_us(o_orderdate))
                  // 86400000000 AS BIGINT) AS delay
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
    SELECT CAST(25 AS BIGINT) AS p,
           CAST(quantile_disc(delay, 0.25) AS BIGINT) AS delay_days FROM d
    UNION ALL
    SELECT 50, CAST(quantile_disc(delay, 0.50) AS BIGINT) FROM d
    UNION ALL
    SELECT 75, CAST(quantile_disc(delay, 0.75) AS BIGINT) FROM d
"""


def gini_customer_spend(sf_dir: str, num_buckets: int = 64
                        ) -> pd.DataFrame:
    """Gini coefficient of per-customer spend — the inequality metric
    over a DISTRIBUTED GLOBAL RANK: G = (2·Σ rᵢxᵢ − (n+1)·Σx) /
    (n·Σx) needs every value's position in the global sort order, so
    the rank comes from `ordered_prefix_scan` (count-prefix over the
    unique composite key spend·2^20 + custkey — rank WITHOUT an
    all-to-all sort), and both Gini terms fold as hi/lo-split int64
    batch partials into Python-int driver sums. Emitted as the exact
    (num, den) integer pair; ties resolve by custkey, stated
    identically in the SQL ROW_NUMBER ordering. Bound: num/den fit
    int64 through ~1e6 customers × 1e10 cents; past that the output
    columns widen to strings of the Python ints."""
    from ..stages.dedup import _splitmix64 as _mix64
    from ..stages.scan import ordered_prefix_scan

    CBITS = np.int64(20)

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        c = t.column("o_custkey").to_numpy(zero_copy_only=False)
        s = _cents(t.column("o_totalprice")).to_numpy(zero_copy_only=False)
        uc, inv = np.unique(c, return_inverse=True)
        acc = np.zeros(len(uc), dtype=np.int64)
        np.add.at(acc, inv, s)
        return pa.table({
            "c": pa.array(uc), "s": pa.array(acc),
            "__b": pa.array((_mix64(uc.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        c = g["c"].to_numpy(dtype=np.int64)
        s = g["s"].to_numpy(dtype=np.int64)
        order = np.argsort(c, kind="stable")
        c, s = c[order], s[order]
        starts = np.r_[0, np.flatnonzero(c[1:] != c[:-1]) + 1]
        c = c[starts]
        s = np.add.reduceat(s, starts)
        if (c >= (1 << 20)).any():
            raise ValueError("custkey exceeds the 20-bit rank-key slot")
        return pd.DataFrame({"key": (s << CBITS) | c,
                             "one": np.ones(len(c), dtype=np.int64)})

    spend = orders.map_batches(partial, batch_format="pyarrow") \
        .groupby("__b").map_groups(finish, batch_format="pandas")
    ranked = ordered_prefix_scan(spend, "key", "one",
                                 op="sum", num_buckets=num_buckets)

    def terms(t: pa.Table) -> pa.Table:
        key = t.column("key").to_numpy(zero_copy_only=False)
        r = t.column("prefix").to_numpy(zero_copy_only=False)  # 0-based
        x = key >> CBITS
        p = (r + 1) * x
        return pa.table({
            "rx_hi": pa.array([int((p >> np.int64(32)).sum())]),
            "rx_lo": pa.array([int((p & np.int64((1 << 32) - 1)).sum())]),
            "sx": pa.array([int(x.sum())]),
            "n": pa.array([len(x)]),
        })

    p = ranked.map_batches(terms, batch_format="pyarrow").to_pandas()
    n = int(p["n"].sum())
    sx = int(p["sx"].sum())
    rx = (int(p["rx_hi"].sum()) << 32) + int(p["rx_lo"].sum())
    return _one_row(n=np.int64(n),
                    gini_num=np.int64(2 * rx - (n + 1) * sx),
                    gini_den=np.int64(n * sx))


QUERIES["gini_customer_spend"] = gini_customer_spend
ORACLES["gini_customer_spend"] = """
    WITH sp AS (
      SELECT o_custkey AS c,
             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
               AS s
      FROM orders GROUP BY o_custkey),
    r AS (SELECT c, s, ROW_NUMBER() OVER (ORDER BY s, c) AS rn,
                 COUNT(*) OVER () AS n
          FROM sp)
    SELECT CAST(MAX(n) AS BIGINT) AS n,
           CAST(2 * SUM(CAST(rn AS HUGEINT) * s)
                - (MAX(n) + 1) * SUM(CAST(s AS HUGEINT)) AS BIGINT)
             AS gini_num,
           CAST(MAX(n) * SUM(CAST(s AS HUGEINT)) AS BIGINT) AS gini_den
    FROM r
"""


def rolling7_distinct_users(sf_dir: str, window: int = 7,
                            num_buckets: int = 64) -> pd.DataFrame:
    """Rolling 7-day distinct users per day — the WAU/MAU operator,
    EXACT: COUNT(DISTINCT) doesn't decompose over overlapping windows
    (yesterday's users and today's overlap), so each deduped
    (user, day) activity pair REPLICATES into the ≤window windows it
    influences (the range-cell replication idea from
    `purchases_near_errors`, here with a fixed fan-out), and one
    (window, user)-pair-hash exchange dedups per window: exchange
    volume = window × distinct user-days, rows 16 bytes. Buckets
    collapse to (window_day, n) partials. The HLL path
    (`hll_distinct_*`) answers the same question approximately with
    7× less exchange — this is its exact twin and calibration."""
    from ..stages.dedup import _splitmix64 as _mix64

    US_DAY = np.int64(86_400_000_000)
    W = np.int64(window)
    DBITS = np.int64(20)

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def pairs(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        d = pc.cast(t.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False) // US_DAY
        key = np.unique((u << DBITS) | d)
        uu, dd = key >> DBITS, key & np.int64((1 << 20) - 1)
        # replicate each activity day into the window days it serves
        off = np.arange(int(W), dtype=np.int64)
        wday = (dd[:, None] + off[None, :]).ravel()
        wu = np.repeat(uu, int(W))
        wkey = np.unique((wu << DBITS) | wday)
        return pa.table({
            "k": pa.array(wkey),
            "__b": pa.array((_mix64(wkey.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def count(g: pd.DataFrame) -> pd.DataFrame:
        k = np.unique(g["k"].to_numpy(dtype=np.int64))
        d = k & np.int64((1 << 20) - 1)
        ud, n = np.unique(d, return_counts=True)
        return pd.DataFrame({"d": ud, "n": n.astype(np.int64)})

    parts = ds.map_batches(pairs, batch_format="pyarrow") \
        .groupby("__b").map_groups(count, batch_format="pandas") \
        .to_pandas()
    agg = parts.groupby("d", as_index=False)["n"].sum()
    # replication extends windows past the last activity day; trim to
    # the observed day range (a one-int-per-block max fold)
    meta = _read(sf_dir, "events", columns=["ts"]).map_batches(
        lambda t: pa.table({"m": pa.array([int(
            pc.max(pc.cast(t.column("ts"), pa.int64())).as_py()
            // int(US_DAY))])}),
        batch_format="pyarrow").to_pandas()
    dmax = int(meta["m"].max())
    agg = agg[agg["d"] <= dmax]
    return pd.DataFrame({
        "day_us": agg["d"].to_numpy(dtype=np.int64) * US_DAY,
        "n_users_7d": agg["n"].astype("int64"),
    }).sort_values("day_us").reset_index(drop=True)


QUERIES["rolling7_distinct_users"] = rolling7_distinct_users
ORACLES["rolling7_distinct_users"] = """
    WITH act AS (
      SELECT DISTINCT user_id,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d
      FROM events),
    spine AS (SELECT DISTINCT d FROM act
              UNION
              SELECT DISTINCT a.d + i
              FROM act a, UNNEST(generate_series(1, 6)) AS t(i)
              WHERE a.d + i <= (SELECT MAX(d) FROM act))
    SELECT s.d * 86400000000 AS day_us,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users_7d
    FROM spine s JOIN act a ON a.d BETWEEN s.d - 6 AND s.d
    GROUP BY s.d ORDER BY day_us
"""


def hll_rolling7_distinct(sf_dir: str, window: int = 7) -> pd.DataFrame:
    """The SKETCH twin of `rolling7_distinct_users` — per-day HLL
    states merged across each 7-day window: this is exactly where
    mergeable sketches beat the exact path, because COUNT(DISTINCT)
    doesn't decompose over overlapping windows but HLL union does —
    ONE grouped sketch pass (per-batch ≤days partial rows, the only
    exchange carries KB-size states), then every window is a driver-
    side merge of ≤7 calendar-bounded states. No replication fan-out:
    the exact path ships 7× the distinct user-days; this ships
    days × 16 KB, independent of user count. pytest gates the
    estimates against the exact twin at the published HLL error
    bound."""
    US_DAY = np.int64(86_400_000_000)

    from ..sketches import HLL

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        d = pc.cast(t.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False) // US_DAY
        return pa.table({"user_id": t.column("user_id"),
                         "day": pa.array(d)})

    daily = sketch_aggregate(ds.map_batches(prep, batch_format="pyarrow"),
                             "hll", on="user_id", by="day",
                             mode="bytes").to_pandas()
    daily = daily.sort_values("day").reset_index(drop=True)
    days = daily["day"].to_numpy(dtype=np.int64)
    blobs = list(daily.iloc[:, 1])
    out = []
    for i, d in enumerate(days):
        merged = HLL()
        lo = d - window + 1
        for j in range(len(days)):
            if lo <= days[j] <= d:
                merged.merge(HLL.from_bytes(blobs[j]))
        out.append({"day_us": np.int64(d * US_DAY),
                    "est_users_7d": np.int64(int(merged.count()))})
    return pd.DataFrame(out).astype({"day_us": "int64",
                                     "est_users_7d": "int64"})


QUERIES["hll_rolling7_distinct"] = hll_rolling7_distinct


def embedding_dim_stats(sf_dir: str) -> pd.DataFrame:
    """Per-DIMENSION statistics of the vector column (min / max / sum
    in exact fixed-point 2^24) — the feature-normalization precursor
    (min-max scaling, per-dim clipping): one zero-shuffle pass whose
    per-batch partial is three D-length int64 vectors from a zero-copy
    reshape (columnwise min/max/sum), folded elementwise on the
    driver. The SQL twin unnests n·D rows and re-groups."""
    ds = _read(sf_dir, "embeddings", columns=["embedding"])
    S = np.float64(1 << 24)

    def partial(t: pa.Table) -> pa.Table:
        col = t.column("embedding").combine_chunks()
        n = len(col)
        flat = col.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64).reshape(n, -1) * S
        q = np.copysign(np.floor(np.abs(flat) + 0.5), flat) \
            .astype(np.int64)
        return pa.table({
            "mn": pa.array([q.min(axis=0).tolist()]),
            "mx": pa.array([q.max(axis=0).tolist()]),
            "sm": pa.array([q.sum(axis=0).tolist()]),
        })

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    mn = np.min(np.stack(p["mn"].to_numpy()), axis=0).astype(np.int64)
    mx = np.max(np.stack(p["mx"].to_numpy()), axis=0).astype(np.int64)
    sm = np.sum(np.stack(p["sm"].to_numpy()), axis=0).astype(np.int64)
    d = len(mn)
    return pd.DataFrame({
        "dim": np.arange(1, d + 1, dtype=np.int64),
        "min_q": mn, "max_q": mx, "sum_q": sm,
    })


QUERIES["embedding_dim_stats"] = embedding_dim_stats
ORACLES["embedding_dim_stats"] = """
    WITH q AS (SELECT list_transform(embedding,
                 x -> CAST(ROUND(x * 16777216) AS BIGINT)) AS v
               FROM embeddings),
    flat AS (SELECT unnest(v) AS x,
                    unnest(range(1, len(v) + 1)) AS dim FROM q)
    SELECT dim, CAST(MIN(x) AS BIGINT) AS min_q,
           CAST(MAX(x) AS BIGINT) AS max_q,
           CAST(SUM(x) AS BIGINT) AS sum_q
    FROM flat GROUP BY dim ORDER BY dim
"""


def outlier_events_robust(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """ROBUST outlier filter — |c − median| > k·MAD per event type:
    the heavy-tail-safe twin of `outlier_events_zscore` (one extreme
    value inflates σ and hides its peers; the median/MAD pair doesn't
    move). Composes the two grouped order-statistic passes of
    `mad_value_by_event_type` with a third zero-shuffle filter pass
    holding the ≤5-entry (median, MAD) table in its closure — all
    integer compares, no float anywhere, oracle states the identical
    inequality."""
    med = mad_value_by_event_type(sf_dir)
    idx = pd.Index(med["event_type"])
    m_arr = med["median_cents"].to_numpy(dtype=np.int64)
    mad_arr = med["mad_cents"].to_numpy(dtype=np.int64)

    ds = _read(sf_dir, "events",
               columns=["event_id", "event_type", "value"])

    def flag(t: pa.Table) -> pa.Table:
        gi = idx.get_indexer(t.column("event_type").to_pandas())
        if (gi < 0).any():
            raise ValueError("event_type outside the robust-filter table")
        c = _cents(t.column("value")).to_numpy(zero_copy_only=False)
        keep = np.abs(c - m_arr[gi]) > np.int64(k) * mad_arr[gi]
        kept = t.filter(pa.array(keep))
        return pa.table({
            "event_id": kept.column("event_id"),
            "event_type": kept.column("event_type"),
            "value_cents": _cents(kept.column("value")),
        })

    out = ds.map_batches(flag, batch_format="pyarrow").to_pandas()
    if not len(out):
        out = pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                            "event_type": pd.Series([], dtype="object"),
                            "value_cents": pd.Series([], dtype="int64")})
    return out.sort_values("event_id").reset_index(drop=True) \
        .astype({"event_id": "int64", "value_cents": "int64"})


QUERIES["outlier_events_robust"] = outlier_events_robust
ORACLES["outlier_events_robust"] = """
    WITH v AS (SELECT event_id, event_type,
                      CAST(ROUND(value*100) AS BIGINT) AS c FROM events),
    m AS (
      SELECT event_type, CAST(vc AS BIGINT) AS med FROM (
        SELECT event_type, c AS vc,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS cnt
        FROM v)
      WHERE rn = (cnt + 1) // 2),
    d AS (SELECT v.event_type, ABS(v.c - m.med) AS a
          FROM v JOIN m USING (event_type)),
    md AS (
      SELECT event_type, CAST(vc AS BIGINT) AS mad FROM (
        SELECT event_type, a AS vc,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY a) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS cnt
        FROM d)
      WHERE rn = (cnt + 1) // 2)
    SELECT v.event_id, v.event_type, v.c AS value_cents
    FROM v JOIN m USING (event_type) JOIN md USING (event_type)
    WHERE ABS(v.c - m.med) > 3 * md.mad
    ORDER BY v.event_id
"""


def shortest_paths_word_graph(sf_dir: str, hops: int = 3,
                              num_buckets: int = 64) -> pd.DataFrame:
    """Bounded-hop WEIGHTED shortest paths over the word graph (edge
    weight = bigram occurrence count) — the MIN-PLUS semiring member
    of the iterative-graph family (PageRank = sum-times, label-prop =
    min, BFS = bool-or): edge weights need a counting fold, so bigram
    pairs take one pair-hash exchange WITHOUT the distinct collapse
    (per-batch count partials, per-bucket reduceat) and materialize
    once; each Bellman-Ford round is then a zero-shuffle sweep — the
    node-bounded distance vector broadcasts, every batch scatters
    min(dist[w1] + w) into a candidate vector via np.minimum.at, the
    driver folds elementwise-min. Exact int64 throughout; unreachable
    nodes stay at the sentinel and are excluded like the SQL's
    absent rows."""
    import ray

    from ..stages.dedup import _splitmix64 as _mix64

    INF = np.int64(2 ** 62)

    ds = _read(sf_dir, "documents", columns=["text"])

    def bigram_counts(t: pa.Table) -> pa.Table:
        w = pc.split_pattern(
            pc.fill_null(t.column("text"), ""), " ").combine_chunks()
        n_per = pc.list_value_length(w).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(w)
        if len(flat) < 2:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "__b": pa.array([], pa.int64())})
        ends = np.cumsum(n_per) - 1
        keep = np.ones(len(flat) - 1, dtype=bool)
        keep[ends[ends < len(keep)]] = False
        a = flat.slice(0, len(flat) - 1).filter(pa.array(keep))
        b = flat.slice(1).filter(pa.array(keep))
        df = pd.DataFrame({"w1": a.to_pandas(), "w2": b.to_pandas()})
        cnt = df.groupby(["w1", "w2"], as_index=False).size() \
            .rename(columns={"size": "n"})
        h = pd.util.hash_pandas_object(
            cnt["w1"] + "\x00" + cnt["w2"], index=False).to_numpy()
        cnt["__b"] = (_mix64(h) % np.uint64(num_buckets)).astype(np.int64)
        cnt["n"] = cnt["n"].astype(np.int64)
        return pa.Table.from_pandas(cnt, preserve_index=False)

    def fold_counts(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["w1", "w2"], as_index=False)["n"].sum()
        return agg

    edges = ds.map_batches(bigram_counts, batch_format="pyarrow") \
        .groupby("__b").map_groups(fold_counts, batch_format="pandas") \
        .materialize()

    vocab_set: set = set()
    for b in edges.iter_batches(batch_format="pyarrow", batch_size=None):
        vocab_set.update(b.column("w1").to_pylist())
        vocab_set.update(b.column("w2").to_pylist())
    vocab = pd.Index(sorted(vocab_set))
    n = len(vocab)
    vocab_b = ray.put(vocab)
    src = vocab[0]

    dist = np.full(n, INF, dtype=np.int64)
    dist[vocab.get_indexer([src])[0]] = 0
    for _ in range(hops):
        dref = ray.put(dist)

        def relax(t: pa.Table, _d=dref) -> pa.Table:
            voc = ray.get(vocab_b)
            d = ray.get(_d)
            i = voc.get_indexer(t.column("w1").to_pandas())
            j = voc.get_indexer(t.column("w2").to_pandas())
            w = t.column("n").to_numpy(zero_copy_only=False)
            cand = d.copy()
            ok = d[i] < INF
            np.minimum.at(cand, j[ok], d[i][ok] + w[ok])
            return pa.table({"v": pa.array([cand.tolist()])})

        nxt = dist
        for b in edges.map_batches(relax, batch_format="pyarrow",
                                   batch_size=None) \
                .iter_batches(batch_format="pyarrow", batch_size=None):
            if b.num_rows:
                nxt = np.minimum(
                    nxt, np.asarray(b.column("v").to_pylist()[0],
                                    dtype=np.int64))
        dist = nxt

    m = dist < INF
    return pd.DataFrame({"word": vocab.to_numpy()[m],
                         "dist": dist[m]}).sort_values("word") \
        .reset_index(drop=True).astype({"dist": "int64"})


QUERIES["shortest_paths_word_graph"] = shortest_paths_word_graph
ORACLES["shortest_paths_word_graph"] = """
    WITH lists AS (SELECT string_split(text, ' ') AS l FROM documents),
    big AS (SELECT p[1] AS w1, p[2] AS w2,
                   CAST(COUNT(*) AS BIGINT) AS w
            FROM (SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p
                  FROM lists)
            GROUP BY 1, 2),
    d0 AS (SELECT (SELECT MIN(w1) FROM big) AS w, CAST(0 AS BIGINT) AS d),
    d1 AS (SELECT w, MIN(d) AS d FROM (
      SELECT w, d FROM d0
      UNION ALL
      SELECT b.w2, d0.d + b.w FROM big b JOIN d0 ON d0.w = b.w1
    ) GROUP BY w),
    d2 AS (SELECT w, MIN(d) AS d FROM (
      SELECT w, d FROM d1
      UNION ALL
      SELECT b.w2, d1.d + b.w FROM big b JOIN d1 ON d1.w = b.w1
    ) GROUP BY w),
    d3 AS (SELECT w, MIN(d) AS d FROM (
      SELECT w, d FROM d2
      UNION ALL
      SELECT b.w2, d2.d + b.w FROM big b JOIN d2 ON d2.w = b.w1
    ) GROUP BY w)
    SELECT w AS word, CAST(d AS BIGINT) AS dist FROM d3 ORDER BY w
"""


def user_set_overlap_3way(sf_dir: str, num_buckets: int = 64
                          ) -> pd.DataFrame:
    """Three-way set overlap partition (view / click / purchase user
    sets) — the inclusion-exclusion base: per-batch distinct
    (user, type-bit) partials OR-fold per user-hash bucket
    (`jaccard_sources_vocab`'s mask machinery at k=3), buckets
    collapse to a ≤7-mask histogram, and the EXACT-mask counts
    partition the user universe so every intersection/union follows by
    addition — one exchange answers all 2³−1 combination queries."""
    from ..stages.dedup import _splitmix64 as _mix64

    KINDS = ["view", "click", "purchase"]
    CUT = 99.0  # high-value events only: makes each set sparse so all
    # seven mask classes genuinely occur (without it every user holds
    # every type and the partition degenerates to one row)

    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "value"])

    def pairs(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column("event_type"), value_set=pa.array(KINDS))
        hv = pc.greater(t.column("value"), CUT).to_numpy(zero_copy_only=False)
        m = pc.is_valid(idx).to_numpy(zero_copy_only=False) & hv
        g = idx.to_numpy(zero_copy_only=False)[m].astype(np.int64)
        u = t.column("user_id").to_numpy(zero_copy_only=False)[m]
        key = np.unique((u << np.int64(2)) | g)
        uu = key >> np.int64(2)
        bit = np.left_shift(np.int64(1), key & np.int64(3))
        # collapse to per-user mask within the batch
        uq, inv = np.unique(uu, return_inverse=True)
        mask = np.zeros(len(uq), dtype=np.int64)
        np.bitwise_or.at(mask, inv, bit)
        return pa.table({
            "u": pa.array(uq), "m": pa.array(mask),
            "__b": pa.array((_mix64(uq.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(dtype=np.int64)
        m = g["m"].to_numpy(dtype=np.int64)
        order = np.argsort(u, kind="stable")
        u, m = u[order], m[order]
        starts = np.r_[0, np.flatnonzero(u[1:] != u[:-1]) + 1]
        masks = np.bitwise_or.reduceat(m, starts)
        um, n = np.unique(masks, return_counts=True)
        return pd.DataFrame({"m": um, "n": n.astype(np.int64)})

    parts = ds.map_batches(pairs, batch_format="pyarrow") \
        .groupby("__b").map_groups(fold, batch_format="pandas") \
        .to_pandas().groupby("m", as_index=False)["n"].sum()
    rows = []
    for _, r in parts.iterrows():
        m = int(r["m"])
        rows.append({
            "has_view": np.int64(bool(m & 1)),
            "has_click": np.int64(bool(m & 2)),
            "has_purchase": np.int64(bool(m & 4)),
            "n_users": np.int64(int(r["n"])),
        })
    return pd.DataFrame(rows).sort_values(
        ["has_view", "has_click", "has_purchase"]).reset_index(drop=True) \
        .astype({"has_view": "int64", "has_click": "int64",
                 "has_purchase": "int64", "n_users": "int64"})


QUERIES["user_set_overlap_3way"] = user_set_overlap_3way
ORACLES["user_set_overlap_3way"] = """
    WITH f AS (
      SELECT user_id,
             CAST(MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                  AS BIGINT) AS has_view,
             CAST(MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS has_click,
             CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS has_purchase
      FROM events
      WHERE event_type IN ('view', 'click', 'purchase') AND value > 99
      GROUP BY user_id)
    SELECT has_view, has_click, has_purchase,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM f GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def profile_lineitem(sf_dir: str) -> pd.DataFrame:
    """One-pass table profiler (the pre-training `describe`): n / min /
    max / sum for every numeric measure of lineitem, all four columns
    in ONE zero-shuffle streaming pass — each batch emits a single
    12-integer partial row (exact cents / integer quantity), the
    driver folds. Profiling before ingesting a corpus is the step
    that catches unit errors and sentinel values; doing it in one
    pass instead of per-column scans is what makes it free."""
    COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

    ds = _read(sf_dir, "lineitem", columns=COLS)

    def partial(t: pa.Table) -> pd.DataFrame:
        rows = []
        for c in COLS:
            v = _cents(t.column(c)).to_numpy(zero_copy_only=False)
            rows.append({"column": c, "n": len(v),
                         "min_c": int(v.min()) if len(v) else 0,
                         "max_c": int(v.max()) if len(v) else 0,
                         "sum_c": int(v.sum())})
        return pd.DataFrame(rows)

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = p.groupby("column").agg(
        n=("n", "sum"), min_c=("min_c", "min"),
        max_c=("max_c", "max"), sum_c=("sum_c", "sum")).reset_index()
    return agg.sort_values("column").reset_index(drop=True) \
        .astype({"n": "int64", "min_c": "int64", "max_c": "int64",
                 "sum_c": "int64"})


QUERIES["profile_lineitem"] = profile_lineitem
ORACLES["profile_lineitem"] = """
    SELECT 'l_discount' AS "column", CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(CAST(ROUND(l_discount*100) AS BIGINT)) AS BIGINT) AS min_c,
           CAST(MAX(CAST(ROUND(l_discount*100) AS BIGINT)) AS BIGINT) AS max_c,
           CAST(SUM(CAST(ROUND(l_discount*100) AS BIGINT)) AS BIGINT) AS sum_c
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', CAST(COUNT(*) AS BIGINT),
           CAST(MIN(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT),
           CAST(MAX(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT),
           CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'l_quantity', CAST(COUNT(*) AS BIGINT),
           CAST(MIN(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT),
           CAST(MAX(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT),
           CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'l_tax', CAST(COUNT(*) AS BIGINT),
           CAST(MIN(CAST(ROUND(l_tax*100) AS BIGINT)) AS BIGINT),
           CAST(MAX(CAST(ROUND(l_tax*100) AS BIGINT)) AS BIGINT),
           CAST(SUM(CAST(ROUND(l_tax*100) AS BIGINT)) AS BIGINT)
    FROM lineitem
    ORDER BY "column"
"""


def join_size_lineitem_orders(sf_dir: str, num_buckets: int = 256
                              ) -> pd.DataFrame:
    """Join-cardinality WITHOUT the join — the optimizer/planning
    primitive: |lineitem ⋈ orders| = Σₖ c_li(k)·c_o(k) needs only the
    per-key COUNT vectors, so both sides combiner-reduce to (key, n)
    partials (8+8 bytes), ONE orderkey exchange aligns them per bucket
    (searchsorted), and the product-sum folds to a single integer —
    the exchange carries counts where the actual join would carry
    rows. The SQL oracle pays the real join; the numbers must agree
    exactly."""
    from ..stages.dedup import _splitmix64 as _mix64

    li = _read(sf_dir, "lineitem", columns=["l_orderkey"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey"])

    def side(col, s):
        def f(t: pa.Table) -> pa.Table:
            k = t.column(col).to_numpy(zero_copy_only=False)
            uk, n = np.unique(k, return_counts=True)
            return pa.table({
                "k": pa.array(uk), "n": pa.array(n.astype(np.int64)),
                "side": pa.array(np.full(len(uk), s, dtype=np.int8)),
                "__b": pa.array((_mix64(uk.astype(np.uint64))
                                 % np.uint64(num_buckets)).astype(np.int64)),
            })
        return f

    def prodsum(g: pd.DataFrame) -> pd.DataFrame:
        sd = g["side"].to_numpy(dtype=np.int8)
        lm, om = sd == 0, sd == 1
        lk = g["k"].to_numpy(dtype=np.int64)[lm]
        ln = g["n"].to_numpy(dtype=np.int64)[lm]
        lo = np.argsort(lk, kind="stable")
        lk, ln = lk[lo], ln[lo]
        starts = np.r_[0, np.flatnonzero(lk[1:] != lk[:-1]) + 1] \
            if len(lk) else np.array([], dtype=np.int64)
        if len(lk):
            lk = lk[starts]
            ln = np.add.reduceat(ln, starts)
        ok = g["k"].to_numpy(dtype=np.int64)[om]
        on = g["n"].to_numpy(dtype=np.int64)[om]
        oo = np.argsort(ok, kind="stable")
        ok, on = ok[oo], on[oo]
        os_ = np.r_[0, np.flatnonzero(ok[1:] != ok[:-1]) + 1] \
            if len(ok) else np.array([], dtype=np.int64)
        if len(ok):
            ok = ok[os_]
            on = np.add.reduceat(on, os_)
        if not len(lk) or not len(ok):
            return pd.DataFrame({"s": [0]})
        pos = np.searchsorted(ok, lk)
        pos_c = np.minimum(pos, len(ok) - 1)
        hit = ok[pos_c] == lk
        return pd.DataFrame({"s": [int((ln[hit] * on[pos_c][hit]).sum())]})

    both = li.map_batches(side("l_orderkey", 0), batch_format="pyarrow") \
        .union(orders.map_batches(side("o_orderkey", 1),
                                  batch_format="pyarrow"))
    p = both.groupby("__b").map_groups(prodsum, batch_format="pandas") \
        .to_pandas()
    return _one_row(n_join_rows=np.int64(int(p["s"].sum())))


QUERIES["join_size_lineitem_orders"] = join_size_lineitem_orders
ORACLES["join_size_lineitem_orders"] = """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_join_rows
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
"""


def grep_docs(sf_dir: str, pattern: str = "scan") -> pd.DataFrame:
    """Corpus grep — per-document SUBSTRING match counts for documents
    containing the pattern at least once: one zero-shuffle pass, the
    count from Arrow's C++ `count_substring` kernel (matches SQL's
    length-difference formula exactly for non-overlapping counts of a
    pattern with no self-overlap). The simplest corpus-search operator
    and the building block of keyword-based decontamination."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def count(t: pa.Table) -> pa.Table:
        n = pc.count_substring(
            pc.fill_null(t.column("text"), ""), pattern)
        tt = pa.table({"doc_id": t.column("doc_id"),
                       "n_matches": pc.cast(n, pa.int64())})
        return tt.filter(pc.greater(tt.column("n_matches"), 0))

    out = ds.map_batches(count, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True) \
        .astype({"doc_id": "int64", "n_matches": "int64"})


QUERIES["grep_docs"] = grep_docs
ORACLES["grep_docs"] = """
    SELECT doc_id,
           CAST((length(text) - length(replace(text, 'scan', '')))
                // length('scan') AS BIGINT) AS n_matches
    FROM documents
    WHERE text LIKE '%scan%'
    ORDER BY doc_id
"""


def weighted_median_price(sf_dir: str) -> pd.DataFrame:
    """WEIGHTED median — the order statistic where each value counts
    with a weight (here: lineitem price weighted by quantity, 'the
    price of the median unit SHIPPED' rather than the median line):
    per-batch (price, Σweight) partials collapse duplicates early, one
    price-hash exchange finishes per-value weight sums bounded by
    DISTINCT prices, and the driver orders that value-bounded table to
    find the first value whose doubled cumulative weight reaches the
    total — the convention stated identically in the SQL window. At
    unbounded value domains the histogram-percentile layout takes over
    (weighted bins); here distinct prices ≪ rows so the exchange IS
    the reduction."""
    from ..stages.dedup import _splitmix64 as _mix64

    num_buckets = 64

    ds = _read(sf_dir, "lineitem",
               columns=["l_extendedprice", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        p = _cents(t.column("l_extendedprice")).to_numpy(zero_copy_only=False)
        q = pc.cast(pc.round(t.column("l_quantity")), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        up, inv = np.unique(p, return_inverse=True)
        w = np.zeros(len(up), dtype=np.int64)
        np.add.at(w, inv, q)
        return pa.table({
            "p": pa.array(up), "w": pa.array(w),
            "__b": pa.array((_mix64(up.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        p = g["p"].to_numpy(dtype=np.int64)
        w = g["w"].to_numpy(dtype=np.int64)
        order = np.argsort(p, kind="stable")
        p, w = p[order], w[order]
        starts = np.r_[0, np.flatnonzero(p[1:] != p[:-1]) + 1]
        return pd.DataFrame({"p": p[starts],
                             "w": np.add.reduceat(w, starts)})

    per_val = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("__b").map_groups(fold, batch_format="pandas").to_pandas()
    p = per_val["p"].to_numpy(dtype=np.int64)
    w = per_val["w"].to_numpy(dtype=np.int64)
    order = np.argsort(p)
    p, w = p[order], w[order]
    cum = np.cumsum(w)
    total = int(cum[-1])
    at = int(np.searchsorted(2 * cum, total, side="left"))
    return _one_row(total_weight=np.int64(total),
                    weighted_median_cents=np.int64(p[at]))


QUERIES["weighted_median_price"] = weighted_median_price
ORACLES["weighted_median_price"] = """
    WITH v AS (SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT) AS p,
                      CAST(ROUND(l_quantity) AS BIGINT) AS q
               FROM lineitem),
    g AS (SELECT p, CAST(SUM(q) AS BIGINT) AS w FROM v GROUP BY p),
    c AS (SELECT p, SUM(w) OVER (ORDER BY p
                                 ROWS UNBOUNDED PRECEDING) AS cum,
                 SUM(w) OVER () AS total
          FROM g)
    SELECT CAST(MAX(total) AS BIGINT) AS total_weight,
           CAST(MIN(CASE WHEN 2 * cum >= total THEN p END) AS BIGINT)
             AS weighted_median_cents
    FROM c
"""


def top_char_bigrams(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Top-k CHARACTER bigrams across the corpus — the first step of
    BPE tokenizer training (the merge candidate table): the pair
    domain is bounded (≤256² byte pairs for this ASCII corpus), so the
    whole computation is a zero-shuffle bincount combiner — each batch
    joins its texts with a NUL separator, views the bytes as uint8,
    forms pairs by offset shift, masks pairs touching the separator,
    and emits one 65536-long count partial; the driver folds vectors
    and takes the (n desc, bigram asc) head. No per-character Python,
    no exchange, no string materialization beyond the input."""
    ds = _read(sf_dir, "documents", columns=["text"])

    def counts(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        s = np.frombuffer("\x00".join(x or "" for x in texts)
                          .encode("utf-8"), dtype=np.uint8)
        if len(s) < 2:
            return pa.table({"v": pa.array([[0] * 65536])})
        a, b = s[:-1].astype(np.int64), s[1:].astype(np.int64)
        m = (a != 0) & (b != 0)
        cnt = np.bincount(a[m] * 256 + b[m], minlength=65536) \
            .astype(np.int64)
        return pa.table({"v": pa.array([cnt.tolist()])})

    total = np.zeros(65536, dtype=np.int64)
    for b in _read(sf_dir, "documents", columns=["text"]) \
            .map_batches(counts, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_rows:
            for row in b.column("v").to_pylist():
                total += np.asarray(row, dtype=np.int64)
    nz = np.flatnonzero(total)
    grams = np.array([chr(c // 256) + chr(c % 256) for c in nz],
                     dtype=object)
    n = total[nz]
    order = np.lexsort((grams, -n))[:k]
    return pd.DataFrame({"bigram": grams[order],
                         "n": n[order].astype(np.int64)})


QUERIES["top_char_bigrams"] = top_char_bigrams
ORACLES["top_char_bigrams"] = """
    WITH pos AS (SELECT text,
                        unnest(generate_series(1, length(text) - 1)) AS i
                 FROM documents),
    pairs AS (SELECT substring(text, i, 2) AS bigram FROM pos)
    SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
    FROM pairs GROUP BY bigram
    ORDER BY n DESC, bigram LIMIT 20
"""


def vocab_growth_docs(sf_dir: str, checkpoints=(10, 50, 100, 250, 500),
                      num_buckets: int = 64) -> pd.DataFrame:
    """Vocabulary growth curve (Heaps' law): distinct words seen after
    the first k documents, for several k — the corpus statistic that
    tells you whether more data still buys new vocabulary. Each word's
    FIRST document is a per-word MIN (the novelty-scoring exchange);
    buckets then collapse to ≤checkpoints (k, n) partials by one
    searchsorted against the checkpoint vector — the driver never sees
    words, only the ≤|checkpoints|·buckets count rows."""
    from ..stages.dedup import _splitmix64 as _mix64

    cks = np.array(sorted(checkpoints), dtype=np.int64)

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def pairs(t: pa.Table) -> pa.Table:
        w = pc.split_pattern(
            pc.fill_null(t.column("text"), ""), " ").combine_chunks()
        cnt_w = pc.list_value_length(w).to_numpy(zero_copy_only=False)
        flat = w.flatten()
        doc = np.repeat(t.column("doc_id").to_numpy(zero_copy_only=False),
                        cnt_w)
        df = pd.DataFrame({"w": flat.to_pandas(), "d": doc})
        df = df.groupby("w", as_index=False)["d"].min()
        h = pd.util.hash_pandas_object(df["w"], index=False).to_numpy()
        df["__b"] = (_mix64(h) % np.uint64(num_buckets)).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        w = g["w"].to_numpy()
        d = g["d"].to_numpy(dtype=np.int64)
        order = np.lexsort((d, w))
        w, d = w[order], d[order]
        starts = np.r_[0, np.flatnonzero(w[1:] != w[:-1]) + 1]
        first = d[starts]
        # words counted at every checkpoint k with first < k
        n_at = np.array([(first < k).sum() for k in cks], dtype=np.int64)
        return pd.DataFrame({"k": cks, "n": n_at})

    parts = ds.map_batches(pairs, batch_format="pyarrow") \
        .groupby("__b").map_groups(fold, batch_format="pandas") \
        .to_pandas()
    agg = parts.groupby("k", as_index=False)["n"].sum()
    return agg.rename(columns={"k": "first_k_docs", "n": "n_vocab"}) \
        .sort_values("first_k_docs").reset_index(drop=True) \
        .astype({"first_k_docs": "int64", "n_vocab": "int64"})


QUERIES["vocab_growth_docs"] = vocab_growth_docs
ORACLES["vocab_growth_docs"] = """
    WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
               FROM documents),
    m AS (SELECT word, MIN(doc_id) AS first FROM w GROUP BY word),
    ks(k) AS (VALUES (10), (50), (100), (250), (500))
    SELECT CAST(ks.k AS BIGINT) AS first_k_docs,
           CAST(SUM(CASE WHEN m.first < ks.k THEN 1 ELSE 0 END) AS BIGINT)
             AS n_vocab
    FROM ks CROSS JOIN m
    GROUP BY ks.k ORDER BY first_k_docs
"""


def gap_histogram_events(sf_dir: str, num_buckets: int = 64
                         ) -> pd.DataFrame:
    """Inter-arrival time distribution — the traffic-shape statistic
    behind sessionization thresholds: per-user consecutive event gaps
    (the LAG exchange) bucketed into DECADES of seconds (<1 s, <10 s,
    …) by one searchsorted against exact integer thresholds (a float
    log10 could misbucket exact decade boundaries); each bucket
    collapses to ≤decades (bucket, n) partials. The histogram tells
    you where the session gap threshold actually separates modes."""
    from ..stages.dedup import _splitmix64 as _mix64

    TH = np.array([10 ** i * 1_000_000 for i in range(0, 7)],
                  dtype=np.int64)  # 1s … 1e6s in µs

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def prep(t: pa.Table) -> pa.Table:
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "u": t.column("user_id"),
            "tu": pc.cast(t.column("ts"), pa.int64()),
            "e": t.column("event_id"),
            "__b": pa.array((_mix64(uid.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(dtype=np.int64)
        tu = g["tu"].to_numpy(dtype=np.int64)
        e = g["e"].to_numpy(dtype=np.int64)
        order = np.lexsort((e, tu, u))
        u, tu = u[order], tu[order]
        same = u[1:] == u[:-1]
        d = (tu[1:] - tu[:-1])[same]
        if not len(d):
            return pd.DataFrame({"bucket": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        b = np.searchsorted(TH, d, side="right")
        ub, n = np.unique(b, return_counts=True)
        return pd.DataFrame({"bucket": ub.astype(np.int64),
                             "n": n.astype(np.int64)})

    parts = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("__b").map_groups(gaps, batch_format="pandas").to_pandas()
    agg = parts.groupby("bucket", as_index=False)["n"].sum()
    return agg.sort_values("bucket").reset_index(drop=True) \
        .astype({"bucket": "int64", "n": "int64"})


QUERIES["gap_histogram_events"] = gap_histogram_events
ORACLES["gap_histogram_events"] = """
    WITH g AS (
      SELECT epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS d
      FROM events),
    b AS (SELECT CASE
            WHEN d < 1000000 THEN 0
            WHEN d < 10000000 THEN 1
            WHEN d < 100000000 THEN 2
            WHEN d < 1000000000 THEN 3
            WHEN d < 10000000000 THEN 4
            WHEN d < 100000000000 THEN 5
            WHEN d < 1000000000000 THEN 6
            ELSE 7 END AS bucket
          FROM g WHERE d IS NOT NULL)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM b GROUP BY bucket ORDER BY bucket
"""


def coverage_topk_words(sf_dir: str, ks=(10, 100),
                        num_buckets: int = 64) -> pd.DataFrame:
    """Token coverage curve — what fraction of all corpus tokens the
    top-k vocabulary covers (the tokenizer-budget question): global
    word counts form through per-batch count partials + one word-hash
    exchange; each bucket emits only its local top-max(k) rows AND its
    token-count subtotal (the coverage denominator costs nothing
    extra), the driver merges ≤max(k)·buckets rows and reports each
    k's covered tokens as an exact (covered, total) pair; (n desc,
    word asc) boundary ties stated identically in SQL."""
    from ..stages.dedup import _splitmix64 as _mix64

    kmax = max(ks)

    ds = _read(sf_dir, "documents", columns=["text"])

    def counts(t: pa.Table) -> pa.Table:
        w = pc.split_pattern(
            pc.fill_null(t.column("text"), ""), " ").combine_chunks()
        flat = w.flatten()
        df = pd.DataFrame({"w": flat.to_pandas()})
        cnt = df.groupby("w", as_index=False).size() \
            .rename(columns={"size": "n"})
        h = pd.util.hash_pandas_object(cnt["w"], index=False).to_numpy()
        cnt["__b"] = (_mix64(h) % np.uint64(num_buckets)).astype(np.int64)
        cnt["n"] = cnt["n"].astype(np.int64)
        return pa.Table.from_pandas(cnt, preserve_index=False)

    def local_top(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("w", as_index=False)["n"].sum()
        tot = int(agg["n"].sum())
        top = agg.sort_values(["n", "w"],
                              ascending=[False, True]).head(kmax)
        top = top.copy()
        top["tot"] = np.int64(0)
        head = pd.DataFrame({"w": ["\x00__bucket_total__"],
                             "n": [np.int64(0)], "tot": [np.int64(tot)]})
        return pd.concat([top, head], ignore_index=True)

    parts = ds.map_batches(counts, batch_format="pyarrow") \
        .groupby("__b").map_groups(local_top, batch_format="pandas") \
        .to_pandas()
    total = int(parts["tot"].sum())
    words = parts[parts["w"] != "\x00__bucket_total__"]
    words = words.sort_values(["n", "w"], ascending=[False, True])
    out = []
    for k in sorted(ks):
        covered = int(words.head(k)["n"].sum())
        out.append({"k": np.int64(k),
                    "covered_tokens": np.int64(covered),
                    "total_tokens": np.int64(total)})
    return pd.DataFrame(out).astype({"k": "int64",
                                     "covered_tokens": "int64",
                                     "total_tokens": "int64"})


QUERIES["coverage_topk_words"] = coverage_topk_words
ORACLES["coverage_topk_words"] = """
    WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
               FROM documents),
    c AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY word),
    r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, word) AS rn FROM c),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
    ks(k) AS (VALUES (10), (100))
    SELECT CAST(ks.k AS BIGINT) AS k,
           CAST((SELECT SUM(n) FROM r WHERE rn <= ks.k) AS BIGINT)
             AS covered_tokens,
           (SELECT total FROM t) AS total_tokens
    FROM ks ORDER BY k
"""


def bpe_two_merges(sf_dir: str) -> pd.DataFrame:
    """DISTRIBUTED BPE TOKENIZER TRAINING, two merge rounds — the
    iterative corpus-transform pattern: each round (1) counts all
    character bigrams with the zero-shuffle 65536-bincount combiner,
    (2) picks the (n desc, bigram asc) winner on the driver, and
    (3) REWRITES the corpus with one Arrow `replace_substring` kernel
    — whose greedy left-to-right non-overlapping semantics are
    verified identical to SQL `replace` (so 'aaa'→'\\x01a', never
    '\\x01\\x01-overlap), making the learned merge table
    value-hash-checkable end to end. The merged symbol is the unused
    byte \\x01 (then \\x02), so round-2 counting runs on the SAME
    byte-pair combiner; no re-read of the original corpus — the
    rewritten Dataset streams straight into round 2."""
    import ray.data

    def counts_of(ds):
        def counts(t: pa.Table) -> pa.Table:
            texts = t.column("text").to_pylist()
            s = np.frombuffer("\x00".join(x or "" for x in texts)
                              .encode("utf-8"), dtype=np.uint8)
            if len(s) < 2:
                return pa.table({"v": pa.array([[0] * 65536])})
            a, b = s[:-1].astype(np.int64), s[1:].astype(np.int64)
            m = (a != 0) & (b != 0)
            cnt = np.bincount(a[m] * 256 + b[m], minlength=65536) \
                .astype(np.int64)
            return pa.table({"v": pa.array([cnt.tolist()])})

        total = np.zeros(65536, dtype=np.int64)
        for blk in ds.map_batches(counts, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow", batch_size=None):
            if blk.num_rows:
                for row in blk.column("v").to_pylist():
                    total += np.asarray(row, dtype=np.int64)
        return total

    def top_pair(total):
        nz = np.flatnonzero(total)
        grams = np.array([chr(c // 256) + chr(c % 256) for c in nz],
                         dtype=object)
        n = total[nz]
        at = np.lexsort((grams, -n))[0]
        return grams[at], int(n[at])

    ds = _read(sf_dir, "documents", columns=["text"])
    merges = []
    for rnd, sym in ((1, "\x01"), (2, "\x02")):
        pair, n = top_pair(counts_of(ds))
        merges.append({"round": np.int64(rnd), "pair": pair,
                       "n": np.int64(n)})
        rep = pair  # capture per round

        def rewrite(t: pa.Table, _p=rep, _s=sym) -> pa.Table:
            return pa.table({"text": pc.replace_substring(
                pc.fill_null(t.column("text"), ""), pattern=_p,
                replacement=_s)})

        ds = ds.map_batches(rewrite, batch_format="pyarrow")
    return pd.DataFrame(merges).astype({"round": "int64", "n": "int64"})


def bpe_train_merges(sf_dir: str, n_merges: int = 16) -> pd.DataFrame:
    """GENERALIZED distributed BPE training (VERDICT r03 item 5): N
    merge rounds over the int32 symbol corpus with incremental
    pair-count deltas (stages/bpe.py — one fused rewrite+delta pass
    per round, no corpus recount). The 2-round byte-string twin
    (bpe_two_merges) stays oracle-checked; this entry is rows-only
    (N-round BPE isn't SQL-expressible) with the incremental ≡
    full-recount equality pytest-locked
    (test_bpe_incremental_equals_recount)."""
    from ..stages.bpe import bpe_train

    ds = _read(sf_dir, "documents", columns=["text"])
    return bpe_train(ds, n_merges=n_merges)


QUERIES["bpe_train_merges"] = bpe_train_merges


def lm_score_docs(sf_dir: str) -> pd.DataFrame:
    """CCNet-style n-gram LM quality score (VERDICT r03 item 7):
    interpolated char-bigram/unigram model trained distributed with the
    65536-bincount combiner (one zero-shuffle pass), each doc scored as
    the EXACT FIXED-POINT sum of per-pair interpolated transition
    probabilities — integer floor divisions both engines state
    identically (DuckDB ``//``), no float log/libm hazard. Ranking by
    lm_score_fp/n_pairs orders fluent text above gibberish
    (test_lm_score_gibberish_ranking)."""
    from ..stages.lm import char_bigram_lm_scores

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = char_bigram_lm_scores(ds).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True) \
        .astype({"doc_id": "int64", "n_pairs": "int64",
                 "lm_score_fp": "int64"})


QUERIES["lm_score_docs"] = lm_score_docs
ORACLES["lm_score_docs"] = """
    WITH pos AS (
      SELECT doc_id, text,
             unnest(generate_series(1, length(text) - 1)) AS i
      FROM documents),
    p AS (SELECT doc_id, substring(text, i, 2) AS bg FROM pos),
    cab AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS cab FROM p GROUP BY bg),
    ca AS (SELECT substring(bg, 1, 1) AS a,
                  CAST(SUM(cab) AS BIGINT) AS ca FROM cab GROUP BY 1),
    cb AS (SELECT substring(bg, 2, 1) AS b,
                  CAST(SUM(cab) AS BIGINT) AS cb FROM cab GROUP BY 1),
    n AS (SELECT CAST(SUM(cab) AS BIGINT) AS n FROM cab),
    scored AS (
      SELECT p.doc_id,
             (9 * c.cab * 16384) // (10 * a.ca)
             + (1 * b.cb * 16384) // (10 * (SELECT n FROM n)) AS s
      FROM p
      JOIN cab c USING (bg)
      JOIN ca a ON a.a = substring(p.bg, 1, 1)
      JOIN cb b ON b.b = substring(p.bg, 2, 1)),
    agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(s) AS BIGINT) AS lm_score_fp
            FROM scored GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(agg.n_pairs, 0) AS BIGINT) AS n_pairs,
           CAST(COALESCE(agg.lm_score_fp, 0) AS BIGINT) AS lm_score_fp
    FROM documents d LEFT JOIN agg USING (doc_id)
    ORDER BY d.doc_id
"""

def dsir_select_docs(sf_dir: str, target_lang: str = "en",
                     k: int = 100) -> pd.DataFrame:
    """DSIR-style data selection (Xie et al. NeurIPS'23 "Data Selection
    for Language Models via Importance Resampling"): score every doc by
    an importance weight between a TARGET-domain LM (trained on the
    lang='en' slice) and the RAW-corpus LM, keep the top-k. The
    published method uses hashed-n-gram log-likelihood ratios; this
    engine's exactly-checkable analog is the fixed-point
    probability-difference surrogate — per adjacent byte pair,
    p_target − p_raw where each p is the interpolated bigram/unigram
    probability in 1/16384 units (stages/lm.py, same model as
    lm_score_docs) — the same monotone domain-affinity ordering with
    no float log/libm hazard, so a DuckDB oracle states the identical
    integers. Distributed shape: TWO zero-shuffle 65536-bincount
    training passes (target slice, full corpus), one broadcast scoring
    pass, per-batch local top-k by the global key (w_mean_fp desc,
    doc_id asc) — sound because global top-k ⊆ union of block top-ks —
    so the driver merges ≤ k·blocks 32-byte rows; text never moves."""
    import ray

    from ..stages.lm import (_pair_arrays, fp_pair_scores,
                             train_char_bigram_counts)

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    tgt = ds.map_batches(
        lambda t, _l=target_lang: t.filter(pc.equal(t.column("lang"), _l)),
        batch_format="pyarrow")
    ref = ray.put((train_char_bigram_counts(tgt),
                   train_char_bigram_counts(ds)))

    def score(t: pa.Table) -> pa.Table:
        ct, cr = ray.get(ref)
        a, b, doc = _pair_arrays(t.column("text").to_pylist())
        w_fp = np.zeros(t.num_rows, dtype=np.int64)
        npairs = np.zeros(t.num_rows, dtype=np.int64)
        if len(a):
            np.add.at(w_fp, doc,
                      fp_pair_scores(a, b, ct) - fp_pair_scores(a, b, cr))
            np.add.at(npairs, doc, 1)
        keep = npairs > 0
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)[keep]
        w_fp, npairs = w_fp[keep], npairs[keep]
        # DuckDB BIGINT // TRUNCATES toward zero on negatives (floor
        # only coincides for nonnegative operands) — truncate here too.
        w_mean = np.sign(w_fp) * ((np.abs(w_fp) * np.int64(16384))
                                  // npairs)
        top = np.lexsort((ids, -w_mean))[:k]
        return pa.table({"doc_id": pa.array(ids[top]),
                         "n_pairs": pa.array(npairs[top]),
                         "w_fp": pa.array(w_fp[top]),
                         "w_mean_fp": pa.array(w_mean[top])})

    parts = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    out = parts.sort_values(["w_mean_fp", "doc_id"],
                            ascending=[False, True]).head(k)
    return out.reset_index(drop=True).astype(
        {"doc_id": "int64", "n_pairs": "int64",
         "w_fp": "int64", "w_mean_fp": "int64"})


QUERIES["dsir_select_docs"] = dsir_select_docs
ORACLES["dsir_select_docs"] = """
    WITH pos AS (
      SELECT doc_id, lang, substring(text, i, 2) AS bg
      FROM (SELECT doc_id, lang, text,
                   unnest(generate_series(1, length(text) - 1)) AS i
            FROM documents)),
    rab AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS cab
            FROM pos GROUP BY bg),
    ra AS (SELECT substring(bg, 1, 1) AS a,
                  CAST(SUM(cab) AS BIGINT) AS ca FROM rab GROUP BY 1),
    rb AS (SELECT substring(bg, 2, 1) AS b,
                  CAST(SUM(cab) AS BIGINT) AS cb FROM rab GROUP BY 1),
    rn AS (SELECT CAST(SUM(cab) AS BIGINT) AS n FROM rab),
    tab AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS cab
            FROM pos WHERE lang = 'en' GROUP BY bg),
    ta AS (SELECT substring(bg, 1, 1) AS a,
                  CAST(SUM(cab) AS BIGINT) AS ca FROM tab GROUP BY 1),
    tb AS (SELECT substring(bg, 2, 1) AS b,
                  CAST(SUM(cab) AS BIGINT) AS cb FROM tab GROUP BY 1),
    tn AS (SELECT CAST(SUM(cab) AS BIGINT) AS n FROM tab),
    scored AS (
      SELECT p.doc_id,
             COALESCE((9 * t.cab * 16384) // (10 * ta.ca), 0)
             + COALESCE((1 * tb.cb * 16384)
                        // (10 * (SELECT n FROM tn)), 0)
             - ((9 * r.cab * 16384) // (10 * ra.ca)
                + (1 * rb.cb * 16384) // (10 * (SELECT n FROM rn)))
               AS w
      FROM pos p
      JOIN rab r USING (bg)
      JOIN ra ON ra.a = substring(p.bg, 1, 1)
      JOIN rb ON rb.b = substring(p.bg, 2, 1)
      LEFT JOIN tab t USING (bg)
      LEFT JOIN ta ON ta.a = substring(p.bg, 1, 1)
      LEFT JOIN tb ON tb.b = substring(p.bg, 2, 1)),
    agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(w) AS BIGINT) AS w_fp
            FROM scored GROUP BY doc_id)
    SELECT doc_id, n_pairs, w_fp,
           CAST((w_fp * 16384) // n_pairs AS BIGINT) AS w_mean_fp
    FROM agg
    ORDER BY w_mean_fp DESC, doc_id
    LIMIT 100
"""


def bpe_encode_docs(sf_dir: str) -> pd.DataFrame:
    """Tokenizer APPLY — encode the corpus with its own learned merges
    (the other half of the train→apply loop bpe_two_merges /
    bpe_train_merges opened): learn the 2 merges, then ONE zero-shuffle
    broadcast-merge-table pass rewrites every doc with the same greedy
    `replace_substring` semantics training used and reports per-doc
    (n_bytes, n_tokens) — byte-level BPE, so n_tokens = byte length of
    the rewritten text (each merge symbol is the 1-byte \\x01/\\x02).
    The N-merge symbol-corpus encoder (stages/bpe.py bpe_encode) is
    equality-locked to this string path in pytest; this entry keeps
    the SQL-statable 2-merge form so the whole train+apply composition
    value-hash-checks."""
    m = bpe_two_merges(sf_dir)
    p1, p2 = str(m["pair"][0]), str(m["pair"][1])

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def enc(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t.column("text"), "")
        r = pc.replace_substring(
            pc.replace_substring(txt, pattern=p1, replacement="\x01"),
            pattern=p2, replacement="\x02")
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_bytes": pc.cast(pc.binary_length(txt), pa.int64()),
            "n_tokens": pc.cast(pc.binary_length(r), pa.int64()),
        })

    out = ds.map_batches(enc, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True) \
        .astype({"doc_id": "int64", "n_bytes": "int64",
                 "n_tokens": "int64"})


QUERIES["bpe_encode_docs"] = bpe_encode_docs
ORACLES["bpe_encode_docs"] = """
    WITH p1 AS (
      SELECT substring(text, i, 2) AS bg
      FROM (SELECT text, unnest(generate_series(1, length(text) - 1)) AS i
            FROM documents)),
    t1 AS (SELECT bg FROM p1 GROUP BY bg
           ORDER BY COUNT(*) DESC, bg LIMIT 1),
    d2 AS (SELECT doc_id, text,
                  replace(text, (SELECT bg FROM t1), chr(1)) AS r1
           FROM documents),
    p2 AS (
      SELECT substring(r1, i, 2) AS bg
      FROM (SELECT r1, unnest(generate_series(1, length(r1) - 1)) AS i
            FROM d2)),
    t2 AS (SELECT bg FROM p2 GROUP BY bg
           ORDER BY COUNT(*) DESC, bg LIMIT 1)
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(strlen(replace(r1, (SELECT bg FROM t2), chr(2)))
                AS BIGINT) AS n_tokens
    FROM d2 ORDER BY doc_id
"""


def tokenize_pack_docs(sf_dir: str, seq_len: int = 512) -> pd.DataFrame:
    """The FULL tokenizer loop as one pipeline — train → apply → pack:
    distributed BPE training (the 2-merge SQL-statable form), corpus
    ENCODE with the learned merges (byte-level token counts after the
    greedy rewrites), then GPT-style packing of the encoded lengths
    into fixed ``seq_len``-token bins via the distributed ordered
    prefix scan. Every step of the composition value-hash-checks in
    ONE oracle statement (training CTEs + per-doc strlen + the packing
    window)."""
    from ..stages.scan import ordered_prefix_sum

    m = bpe_two_merges(sf_dir)
    p1, p2 = str(m["pair"][0]), str(m["pair"][1])

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def enc(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t.column("text"), "")
        r = pc.replace_substring(
            pc.replace_substring(txt, pattern=p1, replacement="\x01"),
            pattern=p2, replacement="\x02")
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": pc.cast(pc.binary_length(r), pa.int64())})

    counts = ds.map_batches(enc, batch_format="pyarrow")
    out = ordered_prefix_sum(counts, "doc_id", "n_tokens").to_pandas()
    out = out.rename(columns={"prefix": "tok_start"})
    n = out["n_tokens"].to_numpy()
    start = out["tok_start"].to_numpy()
    out["bin_first"] = start // seq_len
    out["bin_last"] = (start + np.maximum(n, 1) - 1) // seq_len
    return out.sort_values("doc_id").reset_index(drop=True).astype(
        {"doc_id": "int64", "n_tokens": "int64", "tok_start": "int64",
         "bin_first": "int64", "bin_last": "int64"})


QUERIES["tokenize_pack_docs"] = tokenize_pack_docs
ORACLES["tokenize_pack_docs"] = """
    WITH p1 AS (
      SELECT substring(text, i, 2) AS bg
      FROM (SELECT text, unnest(generate_series(1, length(text) - 1)) AS i
            FROM documents)),
    t1 AS (SELECT bg FROM p1 GROUP BY bg
           ORDER BY COUNT(*) DESC, bg LIMIT 1),
    d2 AS (SELECT doc_id,
                  replace(text, (SELECT bg FROM t1), chr(1)) AS r1
           FROM documents),
    p2 AS (
      SELECT substring(r1, i, 2) AS bg
      FROM (SELECT r1, unnest(generate_series(1, length(r1) - 1)) AS i
            FROM d2)),
    t2 AS (SELECT bg FROM p2 GROUP BY bg
           ORDER BY COUNT(*) DESC, bg LIMIT 1),
    c AS (SELECT doc_id,
                 CAST(strlen(replace(r1, (SELECT bg FROM t2), chr(2)))
                      AS BIGINT) AS n_tokens
          FROM d2),
    s AS (SELECT doc_id, n_tokens,
                 CAST(COALESCE(SUM(n_tokens) OVER (
                   ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                   AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
          FROM c)
    SELECT doc_id, n_tokens, tok_start,
           CAST(tok_start // 512 AS BIGINT) AS bin_first,
           CAST((tok_start + GREATEST(n_tokens, 1) - 1) // 512 AS BIGINT)
             AS bin_last
    FROM s ORDER BY doc_id
"""


def badwords_filter_docs(sf_dir: str,
                         words: tuple = ("slow", "dup")) -> pd.DataFrame:
    """C4-style blocklist filter (Raffel et al. 2020 removed any page
    containing a listed word): flag every doc containing a blocklist
    WORD — exact whitespace-token match, not substring, so 'duplicate'
    does not trip 'dup' — and report the per-source audit (docs,
    flagged docs, total blocklisted token occurrences). One
    zero-shuffle pass: split once, flatten, membership against the
    broadcast list, per-doc fold by np.add.at over the list-offset
    parent index; partials collapse to ≤n_sources rows per batch."""
    ds = _read(sf_dir, "documents", columns=["source", "text"])
    blocked = pa.array(list(words))

    def audit(t: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(
            pc.fill_null(t.column("text"), ""), " ").combine_chunks()
        counts = np.diff(toks.offsets.to_numpy(zero_copy_only=False))
        hit = pc.is_in(toks.flatten(), value_set=blocked) \
            .to_numpy(zero_copy_only=False)
        doc = np.repeat(np.arange(t.num_rows), counts)
        bad = np.zeros(t.num_rows, dtype=np.int64)
        if len(hit):
            np.add.at(bad, doc, hit.astype(np.int64))
        df = pd.DataFrame({
            "source": t.column("source").to_pandas(),
            "n_docs": 1,
            "n_flagged": (bad > 0).astype(np.int64),
            "n_bad_tokens": bad})
        return df.groupby("source", as_index=False).sum()

    out = ds.map_batches(audit, batch_format="pyarrow").to_pandas() \
        .groupby("source", as_index=False)[
            ["n_docs", "n_flagged", "n_bad_tokens"]].sum()
    return out.sort_values("source").reset_index(drop=True) \
        .astype({"source": "str", "n_docs": "int64",
                 "n_flagged": "int64", "n_bad_tokens": "int64"})


QUERIES["badwords_filter_docs"] = badwords_filter_docs
ORACLES["badwords_filter_docs"] = """
    WITH tok AS (
      SELECT doc_id, source,
             unnest(string_split(text, ' ')) AS w
      FROM documents),
    per_doc AS (
      SELECT doc_id, source,
             CAST(SUM(CASE WHEN w IN ('slow', 'dup')
                           THEN 1 ELSE 0 END) AS BIGINT) AS bad
      FROM tok GROUP BY doc_id, source)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN bad > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged,
           CAST(SUM(bad) AS BIGINT) AS n_bad_tokens
    FROM per_doc GROUP BY source ORDER BY source
"""


def ccnet_perplexity_buckets(sf_dir: str) -> pd.DataFrame:
    """CCNet's head/middle/tail LM-quality bucketing (Wenzek et al.
    2020 §4: per LANGUAGE, rank documents by LM score and cut into
    terciles — the standard pre-filter shape for web-crawl corpora).
    Score = the engine's exact fixed-point mean transition probability
    (stages/lm.py; monotone twin of negative perplexity, so the same
    ordering with no float log hazard). Distributed shape: one
    zero-shuffle LM training pass, one broadcast scoring pass emitting
    24-byte (key, lang, score) rows — key packs (lang, score desc,
    doc_id) into one int64 so ONE `ordered_prefix_scan` range exchange
    yields every doc's within-language rank; tercile boundaries follow
    SQL NTILE semantics exactly (first n%3 tiles get the extra row).
    Output: per (lang, bucket) doc count + exact score sum."""
    import ray

    from ..stages.lm import CharBigramLMScore, train_char_bigram_counts
    from ..stages.scan import ordered_prefix_scan

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    ref = ray.put(train_char_bigram_counts(ds))

    def per_lang(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"lang": t.column("lang").to_pandas(), "n": 1})
        return df.groupby("lang", as_index=False).sum()

    pl = ds.map_batches(per_lang, batch_format="pyarrow").to_pandas() \
        .groupby("lang", as_index=False)["n"].sum() \
        .sort_values("lang").reset_index(drop=True)
    langs = pl["lang"].to_numpy()
    n_lang = pl["n"].to_numpy(dtype=np.int64)
    before = np.concatenate(([0], np.cumsum(n_lang)[:-1]))
    if len(langs) >= (1 << 15):
        raise ValueError("lang domain too wide for the packed scan key")

    holder: list = []

    def keyed(t: pa.Table) -> pa.Table:
        if not holder:
            holder.append(CharBigramLMScore(ref))
        sc = holder[0](t)
        np_ = sc.column("n_pairs").to_numpy(zero_copy_only=False)
        fp = sc.column("lm_score_fp").to_numpy(zero_copy_only=False)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        lid = np.searchsorted(langs, t.column("lang")
                              .to_numpy(zero_copy_only=False))
        keep = np_ > 0
        ids, lid, np_, fp = ids[keep], lid[keep], np_[keep], fp[keep]
        s_mean = (fp * np.int64(16384)) // np_  # nonneg: floor ≡ trunc
        if len(ids) and (ids.max() >= (1 << 20)
                         or s_mean.max() >= (1 << 28)):
            raise ValueError("scan key fields overflow: widen the packing")
        inv = (np.int64(1 << 28) - 1) - s_mean
        key = ((lid.astype(np.int64) << np.int64(48))
               | (inv << np.int64(20)) | ids)
        return pa.table({"key": pa.array(key),
                         "one": pa.array(np.ones(len(ids), dtype=np.int64)),
                         "lid": pa.array(lid.astype(np.int64)),
                         "s_mean": pa.array(s_mean)})

    scan = ordered_prefix_scan(
        ds.map_batches(keyed, batch_format="pyarrow"),
        "key", "one", op="sum", carry_cols=["lid", "s_mean"])

    def bucketize(t: pa.Table) -> pd.DataFrame:
        lid = t.column("lid").to_numpy(zero_copy_only=False)
        rank = t.column("prefix").to_numpy(zero_copy_only=False) \
            - before[lid]
        s = t.column("s_mean").to_numpy(zero_copy_only=False)
        n_l = n_lang[lid]
        q, r = n_l // 3, n_l % 3
        big = r * (q + 1)
        tile = np.where(q == 0, rank,
                        np.where(rank < big, rank // np.maximum(q + 1, 1),
                                 r + (rank - big) // np.maximum(q, 1)))
        df = pd.DataFrame({"lid": lid, "bucket": tile.astype(np.int64),
                           "n_docs": 1, "sum_score": s})
        return df.groupby(["lid", "bucket"], as_index=False).sum()

    p = scan.map_batches(bucketize, batch_format="pyarrow").to_pandas() \
        .groupby(["lid", "bucket"], as_index=False)[
            ["n_docs", "sum_score"]].sum()
    out = pd.DataFrame({
        "lang": langs[p["lid"].to_numpy()],
        "bucket": p["bucket"].to_numpy(dtype=np.int64),
        "n_docs": p["n_docs"].to_numpy(dtype=np.int64),
        "sum_score": p["sum_score"].to_numpy(dtype=np.int64)})
    return out.sort_values(["lang", "bucket"]).reset_index(drop=True) \
        .astype({"lang": "str", "bucket": "int64",
                 "n_docs": "int64", "sum_score": "int64"})


QUERIES["ccnet_perplexity_buckets"] = ccnet_perplexity_buckets
ORACLES["ccnet_perplexity_buckets"] = """
    WITH pos AS (
      SELECT doc_id, text,
             unnest(generate_series(1, length(text) - 1)) AS i
      FROM documents),
    p AS (SELECT doc_id, substring(text, i, 2) AS bg FROM pos),
    cab AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS cab FROM p GROUP BY bg),
    ca AS (SELECT substring(bg, 1, 1) AS a,
                  CAST(SUM(cab) AS BIGINT) AS ca FROM cab GROUP BY 1),
    cb AS (SELECT substring(bg, 2, 1) AS b,
                  CAST(SUM(cab) AS BIGINT) AS cb FROM cab GROUP BY 1),
    n AS (SELECT CAST(SUM(cab) AS BIGINT) AS n FROM cab),
    scored AS (
      SELECT p.doc_id,
             (9 * c.cab * 16384) // (10 * a.ca)
             + (1 * b.cb * 16384) // (10 * (SELECT n FROM n)) AS s
      FROM p
      JOIN cab c USING (bg)
      JOIN ca a ON a.a = substring(p.bg, 1, 1)
      JOIN cb b ON b.b = substring(p.bg, 2, 1)),
    agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(s) AS BIGINT) AS fp
            FROM scored GROUP BY doc_id),
    ranked AS (
      SELECT d.lang, (agg.fp * 16384) // agg.n_pairs AS s_mean,
             NTILE(3) OVER (PARTITION BY d.lang
                            ORDER BY (agg.fp * 16384) // agg.n_pairs DESC,
                                     d.doc_id) AS b
      FROM documents d JOIN agg ON agg.doc_id = d.doc_id
      WHERE agg.n_pairs > 0)
    SELECT lang, CAST(b - 1 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(s_mean) AS BIGINT) AS sum_score
    FROM ranked GROUP BY lang, b ORDER BY lang, bucket
"""


QUERIES["bpe_two_merges"] = bpe_two_merges
ORACLES["bpe_two_merges"] = """
    WITH p1 AS (
      SELECT substring(text, i, 2) AS bg
      FROM (SELECT text, unnest(generate_series(1, length(text) - 1)) AS i
            FROM documents)),
    t1 AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS n FROM p1
           GROUP BY bg ORDER BY n DESC, bg LIMIT 1),
    d2 AS (SELECT replace(text, (SELECT bg FROM t1), chr(1)) AS text
           FROM documents),
    p2 AS (
      SELECT substring(text, i, 2) AS bg
      FROM (SELECT text, unnest(generate_series(1, length(text) - 1)) AS i
            FROM d2)),
    t2 AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS n FROM p2
           GROUP BY bg ORDER BY n DESC, bg LIMIT 1)
    SELECT CAST(1 AS BIGINT) AS round, bg AS pair, n FROM t1
    UNION ALL
    SELECT CAST(2 AS BIGINT), bg, n FROM t2
    ORDER BY round
"""


def events_csv_roundtrip(sf_dir: str) -> pd.DataFrame:
    """Heterogeneous-SOURCE equivalence, oracle-checked: the events
    table exported once to CSV (cached under /tmp), read back through
    the `read_table` CSV front door with the parquet schema enforced
    (CSV round-trips timestamps/doubles as strings otherwise), and
    aggregated to per-type counts + exact cents — the oracle runs on
    the PARQUET view, so the value-hash proves the CSV path is
    bit-equivalent to the parquet path end to end."""
    import tempfile

    import pyarrow.csv as pacsv
    import pyarrow.parquet as pq

    from ..sources.tables import read_table

    src = os.path.join(sf_dir, "events.parquet")
    tag = sf_of(sf_dir)
    cache = os.path.join(tempfile.gettempdir(), "raysketch_data",
                         f"events_csv_{tag}")
    csv_path = os.path.join(cache, "events.csv")
    if not os.path.exists(csv_path):
        os.makedirs(cache, exist_ok=True)
        tmp = csv_path + ".tmp"
        pacsv.write_csv(pq.read_table(src), tmp)
        os.replace(tmp, csv_path)
    schema = pq.read_schema(src)

    ds = read_table(cache, fmt="csv", schema=schema)

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas(),
            "c": _cents(t.column("value")).to_numpy(zero_copy_only=False),
        })
        agg = df.groupby("event_type", as_index=False) \
            .agg(n=("c", "size"), cents=("c", "sum"))
        return agg

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = p.groupby("event_type", as_index=False)[["n", "cents"]].sum()
    return agg.sort_values("event_type").reset_index(drop=True) \
        .astype({"n": "int64", "cents": "int64"})


QUERIES["events_csv_roundtrip"] = events_csv_roundtrip
ORACLES["events_csv_roundtrip"] = """
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS cents
    FROM events GROUP BY event_type ORDER BY event_type
"""


def debounce_events(sf_dir: str, gap_s: int = 60,
                    num_buckets: int = 64) -> pd.DataFrame:
    """Debounce / throttle — drop events of the same (user, type) that
    arrive within ``gap_s`` seconds of the PREVIOUS RAW event of that
    key (LAG semantics, which SQL can state; a greedy kept-anchor
    debounce is order-iterative and has no SQL twin): one
    (user,type)-key-hash exchange, one within-bucket lexsort forms
    every key's consecutive gaps, survivors counted per type. The
    stream-hygiene operator in front of funnels and sessionization."""
    from ..stages.dedup import _splitmix64 as _mix64

    TYPES = ["click", "error", "purchase", "signup", "view"]
    NT = np.int64(len(TYPES))
    GAP = np.int64(gap_s) * np.int64(1_000_000)

    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "ts", "event_id"])

    def prep(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column("event_type"), value_set=pa.array(TYPES))
        if idx.null_count:
            raise ValueError("event_type outside the debounce domain")
        g = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        key = u * NT + g
        return pa.table({
            "k": pa.array(key),
            "tu": pc.cast(t.column("ts"), pa.int64()),
            "e": t.column("event_id"),
            "__b": pa.array((_mix64(key.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def keep(g: pd.DataFrame) -> pd.DataFrame:
        k = g["k"].to_numpy(dtype=np.int64)
        tu = g["tu"].to_numpy(dtype=np.int64)
        e = g["e"].to_numpy(dtype=np.int64)
        order = np.lexsort((e, tu, k))
        k, tu = k[order], tu[order]
        first = np.r_[True, k[1:] != k[:-1]]
        ok = first | np.r_[False, (tu[1:] - tu[:-1]) > GAP]
        t_idx = (k % NT)[ok]
        cnt = np.bincount(t_idx, minlength=int(NT)).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"t": nz, "n": cnt[nz]})

    parts = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("__b").map_groups(keep, batch_format="pandas").to_pandas()
    agg = parts.groupby("t", as_index=False)["n"].sum()
    lab = np.array(TYPES, dtype=object)
    return pd.DataFrame({
        "event_type": lab[agg["t"].to_numpy(dtype=np.int64)],
        "n_kept": agg["n"].astype("int64"),
    }).sort_values("event_type").reset_index(drop=True)


QUERIES["debounce_events"] = debounce_events
ORACLES["debounce_events"] = """
    WITH g AS (
      SELECT event_type,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts, event_id) AS d
      FROM events)
    SELECT event_type,
           CAST(SUM(CASE WHEN d IS NULL OR d > 60000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM g GROUP BY event_type ORDER BY event_type
"""


def split_assign_docs(sf_dir: str) -> pd.DataFrame:
    """Deterministic train/val/test split — THE dataset-prep operator:
    every document lands in exactly one of 80/10/10 by a pure hash of
    its id (the `hash_sample_orders` Knuth condition), so the split is
    reproducible at ANY parallelism, re-derivable years later from the
    id alone, and — because the hash is SQL-expressible — the
    ASSIGNMENT ITSELF is value-hash-checked, not just its sizes.
    Zero shuffle; per-(source, split) counts + exact char sums fold as
    a ≤3·sources-cell combiner so the audit table also verifies
    stratification balance."""
    ds = _read(sf_dir, "documents",
               columns=["doc_id", "source", "n_chars"])
    K = np.int64(2654435761)

    def assign(t: pa.Table) -> pd.DataFrame:
        k = t.column("doc_id").to_numpy(zero_copy_only=False)
        h = ((k * K) % np.int64(1_000_000_007)) % np.int64(100)
        split = np.where(h < 80, "train",
                         np.where(h < 90, "val", "test"))
        df = pd.DataFrame({
            "source": t.column("source").to_pandas(),
            "split": split,
            "n": 1,
            "chars": t.column("n_chars").to_numpy(zero_copy_only=False),
        })
        return df.groupby(["source", "split"], as_index=False) \
            .agg(n=("n", "sum"), chars=("chars", "sum"))

    p = ds.map_batches(assign, batch_format="pyarrow").to_pandas()
    agg = p.groupby(["source", "split"], as_index=False) \
        [["n", "chars"]].sum()
    return agg.sort_values(["source", "split"]).reset_index(drop=True) \
        .astype({"n": "int64", "chars": "int64"})


QUERIES["split_assign_docs"] = split_assign_docs
ORACLES["split_assign_docs"] = """
    WITH a AS (
      SELECT source, n_chars,
             CASE WHEN ((doc_id * 2654435761) % 1000000007) % 100 < 80
                  THEN 'train'
                  WHEN ((doc_id * 2654435761) % 1000000007) % 100 < 90
                  THEN 'val' ELSE 'test' END AS split
      FROM documents)
    SELECT source, split, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM a GROUP BY source, split ORDER BY source, split
"""


def domain_mix_select(sf_dir: str) -> pd.DataFrame:
    """Deterministic data-mixing selection (the DoReMi/Pile-style
    per-domain quota step): give every source an equal character
    budget (half the corpus, split evenly), then admit each source's
    documents in Knuth-hash order until the budget is exhausted —
    reproducible at any parallelism, re-derivable from ids alone.
    The hash (doc_id·2654435761 mod 1e9+7) is INJECTIVE for
    doc_id < 1e9+7, so the admission order is total (no ties) and the
    whole selection value-hash-checks against a SQL window
    reconstruction. Distributed shape: a tiny per-source totals
    combiner (drives budgets), then `ordered_prefix_scan` over the
    composite (src_rank << 31 | hash) key — one range-bucket exchange
    of 24-byte rows; text never moves. Output: per-source audit
    (docs, selected docs, selected chars)."""
    from ..stages.scan import ordered_prefix_scan

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "source", "n_chars"])
    K = np.int64(2654435761)
    P = np.int64(1_000_000_007)

    def tots(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "source": t.column("source").to_pandas(),
            "chars": t.column("n_chars").to_numpy(zero_copy_only=False),
            "n": 1})
        return df.groupby("source", as_index=False) \
            .agg(chars=("chars", "sum"), n=("n", "sum"))

    per_src = ds.map_batches(tots, batch_format="pyarrow").to_pandas() \
        .groupby("source", as_index=False)[["chars", "n"]].sum() \
        .sort_values("source").reset_index(drop=True)
    srcs = per_src["source"].to_numpy()
    src_chars = per_src["chars"].to_numpy(dtype=np.int64)
    budget = int(src_chars.sum()) // 2 // len(srcs)
    # chars of all lower-ranked sources precede a source in the scan
    before = np.concatenate(([0], np.cumsum(src_chars)[:-1]))

    def keyed(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        s = t.column("source").to_numpy(zero_copy_only=False)
        sid = np.searchsorted(srcs, s)
        hk = (d.astype(np.int64) * K) % P
        return pa.table({
            "key": pa.array(sid.astype(np.int64) * np.int64(1 << 31) + hk),
            "n_chars": t.column("n_chars").cast(pa.int64()),
            "sid": pa.array(sid.astype(np.int64)),
        })

    scanned = ordered_prefix_scan(
        ds.map_batches(keyed, batch_format="pyarrow"),
        "key", "n_chars", op="sum", carry_cols=["sid"])

    def audit(t: pa.Table) -> pd.DataFrame:
        sid = t.column("sid").to_numpy(zero_copy_only=False)
        ch = t.column("n_chars").to_numpy(zero_copy_only=False)
        pre = t.column("prefix").to_numpy(zero_copy_only=False)
        keep = (pre - before[sid] + ch) <= budget
        df = pd.DataFrame({"sid": sid, "n": 1,
                           "n_sel": keep.astype(np.int64),
                           "ch_sel": np.where(keep, ch, 0)})
        return df.groupby("sid", as_index=False).sum()

    p = scanned.map_batches(audit, batch_format="pyarrow").to_pandas() \
        .groupby("sid", as_index=False)[["n", "n_sel", "ch_sel"]].sum()
    out = pd.DataFrame({
        "source": srcs[p["sid"].to_numpy()],
        "n_docs": p["n"].to_numpy(dtype=np.int64),
        "n_selected": p["n_sel"].to_numpy(dtype=np.int64),
        "chars_selected": p["ch_sel"].to_numpy(dtype=np.int64)})
    return out.sort_values("source").reset_index(drop=True) \
        .astype({"source": "str", "n_docs": "int64",
                 "n_selected": "int64", "chars_selected": "int64"})


QUERIES["domain_mix_select"] = domain_mix_select
ORACLES["domain_mix_select"] = """
    WITH tot AS (
      SELECT CAST(SUM(n_chars) AS BIGINT) // 2 AS b,
             COUNT(DISTINCT source) AS ns
      FROM documents
    ),
    h AS (
      SELECT source, n_chars,
             (doc_id * 2654435761) % 1000000007 AS hk
      FROM documents
    ),
    c AS (
      SELECT source, n_chars,
             SUM(n_chars) OVER (PARTITION BY source ORDER BY hk
                                ROWS UNBOUNDED PRECEDING) AS cum
      FROM h
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN cum <= (SELECT b // ns FROM tot)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
           CAST(SUM(CASE WHEN cum <= (SELECT b // ns FROM tot)
                         THEN n_chars ELSE 0 END) AS BIGINT)
             AS chars_selected
    FROM c GROUP BY source ORDER BY source
"""


def max_drawdown_revenue(sf_dir: str) -> pd.DataFrame:
    """Maximum drawdown of cumulative daily revenue — the running-max
    -minus-current composition (two chained window functions): the
    day series folds calendar-bounded through the zero-shuffle (day,
    cents) combiner, and the drawdown scan runs vectorized over the
    ≤few-thousand-day table (cumsum → running max → max gap). All
    integer cents; the single-row answer carries the drawdown AND the
    day it bottoms (earliest, tiebreak stated in SQL)."""
    US_DAY = np.int64(86_400_000_000)

    ds = _read(sf_dir, "orders", columns=["o_totalprice", "o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t.column("o_totalprice")).to_numpy(zero_copy_only=False)
        d = pc.cast(t.column("o_orderdate"), pa.int64()) \
            .to_numpy(zero_copy_only=False) // US_DAY
        ud, inv = np.unique(d, return_inverse=True)
        s = np.zeros(len(ud), dtype=np.int64)
        np.add.at(s, inv, c)
        return pa.table({"day": pa.array(ud), "s": pa.array(s)})

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas() \
        .groupby("day", as_index=False)["s"].sum()
    day = p["day"].to_numpy(dtype=np.int64)
    s = p["s"].to_numpy(dtype=np.int64)
    order = np.argsort(day)
    day, s = day[order], s[order]
    # drawdown on the DE-MEANED cumulative series: raw revenue only
    # grows, so subtract each day's global mean share to expose dips
    n = len(day)
    mean_num = int(s.sum())  # exact: compare n*cum vs day_index*total
    cum = np.cumsum(s)
    # scaled series: v_i = n*cum_i - (i+1)*total  (exact ints)
    idx = np.arange(1, n + 1, dtype=np.int64)
    v = n * cum - idx * mean_num
    runmax = np.maximum.accumulate(v)
    dd = runmax - v
    at = int(np.argmax(dd))  # first maximal drawdown
    return _one_row(n_days=np.int64(n),
                    max_drawdown_scaled=np.int64(int(dd[at])),
                    trough_day_us=np.int64(int(day[at]) * int(US_DAY)))


QUERIES["max_drawdown_revenue"] = max_drawdown_revenue
ORACLES["max_drawdown_revenue"] = """
    WITH d AS (
      SELECT CAST(epoch_us(date_trunc('day', o_orderdate))
                  // 86400000000 AS BIGINT) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
               AS s
      FROM orders GROUP BY 1),
    c AS (SELECT day,
                 SUM(s) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                   AS cum,
                 ROW_NUMBER() OVER (ORDER BY day) AS i,
                 COUNT(*) OVER () AS n,
                 SUM(s) OVER () AS total
          FROM d),
    v AS (SELECT day,
                 CAST(n AS HUGEINT) * cum - CAST(i AS HUGEINT) * total
                   AS val
          FROM c),
    r AS (SELECT day, val,
                 MAX(val) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                   AS runmax
          FROM v),
    dd AS (SELECT day, runmax - val AS drop FROM r)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM dd) AS n_days,
           CAST(MAX(drop) AS BIGINT) AS max_drawdown_scaled,
           CAST((SELECT MIN(day) FROM dd
                 WHERE drop = (SELECT MAX(drop) FROM dd))
                * 86400000000 AS BIGINT) AS trough_day_us
    FROM dd
"""


def length_weighted_sample_docs(sf_dir: str) -> pd.DataFrame:
    """LENGTH-WEIGHTED deterministic sampling — inclusion probability
    proportional to document size (the token-budget sampler: long
    documents carry more training signal per row): keep iff
    hash(doc_id) mod M < n_chars·C, a pure per-row predicate — zero
    shuffle, reproducible at any parallelism, and SQL-expressible so
    THE SAMPLE ITSELF is value-hash-checked (ds.random_sample could
    never be). The expected rate is Σ n_chars·C / M; the audit columns
    carry both the kept count and kept chars so the weighting is
    visible in the checked output."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    K = np.int64(2654435761)
    P = np.int64(1_000_000_007)
    M = np.int64(1_000_000)
    C = np.int64(800)  # ~n_chars/1250 inclusion probability

    def keep(t: pa.Table) -> pa.Table:
        k = t.column("doc_id").to_numpy(zero_copy_only=False)
        nc = t.column("n_chars").to_numpy(zero_copy_only=False)
        m = ((k * K) % P) % M < nc * C
        return pa.table({"doc_id": pa.array(k[m]),
                         "n_chars": pa.array(nc[m])})

    out = ds.map_batches(keep, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True) \
        .astype({"doc_id": "int64", "n_chars": "int64"})


QUERIES["length_weighted_sample_docs"] = length_weighted_sample_docs
ORACLES["length_weighted_sample_docs"] = """
    SELECT doc_id, n_chars
    FROM documents
    WHERE ((doc_id * 2654435761) % 1000000007) % 1000000
          < n_chars * 800
    ORDER BY doc_id
"""


def second_order_per_customer(sf_dir: str, num_buckets: int = 64
                              ) -> pd.DataFrame:
    """NTH_VALUE navigation — each customer's SECOND-most-expensive
    order (the n=2 order statistic per partition, with the customers
    who only have one order dropping out exactly as the SQL's rn=2
    filter drops them): one custkey-hash exchange of (cust, cents,
    okey) rows, one within-bucket lexsort by (cust, −cents, okey),
    and the answer is a pure gather at segment start + 1 — no window
    function, no per-group loop."""
    from ..stages.dedup import _splitmix64 as _mix64

    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        c = t.column("o_custkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "c": pa.array(c),
            "k": t.column("o_orderkey"),
            "p": _cents(t.column("o_totalprice")),
            "__b": pa.array((_mix64(c.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def second(g: pd.DataFrame) -> pd.DataFrame:
        c = g["c"].to_numpy(dtype=np.int64)
        k = g["k"].to_numpy(dtype=np.int64)
        p = g["p"].to_numpy(dtype=np.int64)
        order = np.lexsort((k, -p, c))
        c, k, p = c[order], k[order], p[order]
        starts = np.r_[0, np.flatnonzero(c[1:] != c[:-1]) + 1]
        cnt = np.diff(np.r_[starts, len(c)])
        ok = cnt >= 2
        at = starts[ok] + 1
        return pd.DataFrame({"o_custkey": c[at],
                             "second_orderkey": k[at],
                             "second_price_cents": p[at]})

    out = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("__b").map_groups(second, batch_format="pandas") \
        .to_pandas()
    return out.sort_values("o_custkey").reset_index(drop=True) \
        .astype({"o_custkey": "int64", "second_orderkey": "int64",
                 "second_price_cents": "int64"})


QUERIES["second_order_per_customer"] = second_order_per_customer
ORACLES["second_order_per_customer"] = """
    SELECT o_custkey, o_orderkey AS second_orderkey,
           CAST(ROUND(o_totalprice*100) AS BIGINT) AS second_price_cents
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY ROUND(o_totalprice*100) DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn = 2 ORDER BY o_custkey
"""


def top2_balances_by_nation_ties(sf_dir: str, num_buckets: int = 32
                                 ) -> pd.DataFrame:
    """Grouped top-N KEEPING TIES (DENSE_RANK ≤ 2, the 'best two price
    points and everyone at them' semantics — a row_number top-k drops
    tied peers arbitrarily): one nationkey exchange; in each bucket a
    lexsort finds every nation's two highest DISTINCT balances (values
    dedup per segment via shifted compare) and a vectorized threshold
    gather keeps all rows at or above the second one. Output size is
    data-dependent (that's the point)."""
    from ..stages.dedup import _splitmix64 as _mix64

    ds = _read(sf_dir, "customer",
               columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def prep(t: pa.Table) -> pa.Table:
        n = t.column("c_nationkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # half-AWAY rounding from exact cents (SQL ROUND semantics):
        # acctbal/100 CAN land exactly on .5 (e.g. 7650.00), where
        # Arrow pc.round's half-to-even silently disagrees
        cents = _cents(t.column("c_acctbal")).to_numpy(zero_copy_only=False)
        bal_h = np.sign(cents) * ((np.abs(cents) + 5000) // 10000)
        return pa.table({
            "n": pa.array(n),
            "c": t.column("c_custkey"),
            "b": pa.array(bal_h.astype(np.int64)),
            "__b": pa.array((_mix64(n.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def topties(g: pd.DataFrame) -> pd.DataFrame:
        n = g["n"].to_numpy(dtype=np.int64)
        c = g["c"].to_numpy(dtype=np.int64)
        b = g["b"].to_numpy(dtype=np.int64)
        order = np.lexsort((c, -b, n))
        n, c, b = n[order], c[order], b[order]
        seg_start = np.r_[True, n[1:] != n[:-1]]
        # distinct-value rank within nation: increments where value
        # changes, resets at nation boundaries
        newval = np.r_[True, (b[1:] != b[:-1])] | seg_start
        # dense rank = cumulative distinct-value count per segment
        grp = np.cumsum(seg_start) - 1
        dv = np.cumsum(newval)
        seg_first_dv = dv[np.flatnonzero(seg_start)]
        dense = dv - seg_first_dv[grp] + 1
        keep = dense <= 2
        return pd.DataFrame({"c_nationkey": n[keep],
                             "c_custkey": c[keep],
                             "bal_h": b[keep]})

    out = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("__b").map_groups(topties, batch_format="pandas") \
        .to_pandas()
    return out.sort_values("c_custkey").reset_index(drop=True) \
        .astype({"c_nationkey": "int64", "c_custkey": "int64",
                 "bal_h": "int64"})


QUERIES["top2_balances_by_nation_ties"] = top2_balances_by_nation_ties
ORACLES["top2_balances_by_nation_ties"] = """
    SELECT c_nationkey, c_custkey,
           CAST(ROUND(c_acctbal/100) AS BIGINT) AS bal_h
    FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             DENSE_RANK() OVER (
               PARTITION BY c_nationkey
               ORDER BY CAST(ROUND(c_acctbal/100) AS BIGINT) DESC) AS dr
      FROM customer)
    WHERE dr <= 2 ORDER BY c_custkey
"""


def embedding_top2_dims(sf_dir: str) -> pd.DataFrame:
    """Per-vector argmax navigation over the LIST column: each
    embedding's largest and second-largest dimension (index + value in
    exact fixed-point 2^24, ties to the LOWER index exactly as SQL's
    ordinality tiebreak) — a zero-shuffle vectorized pass (reshape,
    one argmax, mask, second argmax); the feature-attribution /
    routing primitive (which expert dim fires?). SQL pays
    unnest-with-ordinality + two ROW_NUMBER picks over n·D rows."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    S = np.float64(1 << 24)

    def top2(t: pa.Table) -> pa.Table:
        col = t.column("embedding").combine_chunks()
        n = len(col)
        flat = col.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64).reshape(n, -1) * S
        q = np.copysign(np.floor(np.abs(flat) + 0.5), flat) \
            .astype(np.int64)
        i1 = q.argmax(axis=1)
        rows = np.arange(n)
        v1 = q[rows, i1]
        q2 = q.copy()
        q2[rows, i1] = np.int64(-2 ** 62)
        i2 = q2.argmax(axis=1)
        v2 = q2[rows, i2]
        return pa.table({
            "vec_id": t.column("vec_id"),
            "dim1": pa.array(i1.astype(np.int64) + 1),
            "val1_q": pa.array(v1),
            "dim2": pa.array(i2.astype(np.int64) + 1),
            "val2_q": pa.array(v2),
        })

    out = ds.map_batches(top2, batch_format="pyarrow").to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True) \
        .astype({"vec_id": "int64", "dim1": "int64", "val1_q": "int64",
                 "dim2": "int64", "val2_q": "int64"})


QUERIES["embedding_top2_dims"] = embedding_top2_dims
ORACLES["embedding_top2_dims"] = """
    WITH q AS (SELECT vec_id,
                      list_transform(embedding,
                                     x -> CAST(ROUND(x*16777216) AS BIGINT))
                        AS v
               FROM embeddings),
    flat AS (SELECT vec_id, unnest(v) AS x,
                    unnest(range(1, len(v) + 1)) AS dim FROM q),
    r AS (SELECT vec_id, x, dim,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                    ORDER BY x DESC, dim) AS rn
          FROM flat)
    SELECT a.vec_id,
           CAST(a.dim AS BIGINT) AS dim1, a.x AS val1_q,
           CAST(b.dim AS BIGINT) AS dim2, b.x AS val2_q
    FROM r a JOIN r b ON a.vec_id = b.vec_id AND a.rn = 1 AND b.rn = 2
    ORDER BY a.vec_id
"""


def distinct_users_rollup(sf_dir: str, num_buckets: int = 64
                          ) -> pd.DataFrame:
    """Hierarchical DISTINCT rollup — daily, weekly and global distinct
    users from ONE exchange: COUNT(DISTINCT) doesn't roll up (a user
    active 5 days is 5 daily counts but ONE weekly count), yet a
    single user-hash exchange of deduped (user, day) pairs co-locates
    each user entirely, so every bucket derives all three granularities
    locally (per-user distinct days → day partials; days//7 → week
    partials; +1 global partial) and the driver folds counts. Three
    COUNT(DISTINCT) queries for the price of one shuffle."""
    from ..stages.dedup import _splitmix64 as _mix64

    US_DAY = np.int64(86_400_000_000)

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def pairs(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        d = pc.cast(t.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False) // US_DAY
        key = np.unique(u * np.int64(1 << 20) + d)
        uu = key >> np.int64(20)
        return pa.table({
            "u": pa.array(uu),
            "d": pa.array(key & np.int64((1 << 20) - 1)),
            "__b": pa.array((_mix64(uu.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def levels(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(dtype=np.int64)
        d = g["d"].to_numpy(dtype=np.int64)
        key = np.unique(u * np.int64(1 << 20) + d)
        u, d = key >> np.int64(20), key & np.int64((1 << 20) - 1)
        out = []
        ud, n = np.unique(d, return_counts=True)
        out.append(pd.DataFrame({"level": "day", "key": ud,
                                 "n": n.astype(np.int64)}))
        wk = np.unique(u * np.int64(1 << 20) + d // 7)
        uw, nw = np.unique(wk & np.int64((1 << 20) - 1),
                           return_counts=True)
        out.append(pd.DataFrame({"level": "week", "key": uw,
                                 "n": nw.astype(np.int64)}))
        out.append(pd.DataFrame({"level": "global",
                                 "key": np.array([0], dtype=np.int64),
                                 "n": np.array([len(np.unique(u))],
                                               dtype=np.int64)}))
        return pd.concat(out, ignore_index=True)

    parts = ds.map_batches(pairs, batch_format="pyarrow") \
        .groupby("__b").map_groups(levels, batch_format="pandas") \
        .to_pandas()
    agg = parts.groupby(["level", "key"], as_index=False)["n"].sum()
    return agg.sort_values(["level", "key"]).reset_index(drop=True) \
        .astype({"key": "int64", "n": "int64"})


QUERIES["distinct_users_rollup"] = distinct_users_rollup
ORACLES["distinct_users_rollup"] = """
    WITH act AS (SELECT DISTINCT user_id,
                        CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d
                 FROM events)
    SELECT 'day' AS level, d AS key,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n
    FROM act GROUP BY d
    UNION ALL
    SELECT 'week', d // 7, CAST(COUNT(DISTINCT user_id) AS BIGINT)
    FROM act GROUP BY d // 7
    UNION ALL
    SELECT 'global', 0, CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM act
    ORDER BY level, key
"""


def first_last_transition_matrix(sf_dir: str, num_buckets: int = 64
                                 ) -> pd.DataFrame:
    """(first event type → last event type) user matrix — the
    journey-endpoints summary behind acquisition/exit analysis: one
    user-hash exchange, one within-bucket lexsort exposes each user's
    first and last row simultaneously (segment boundaries + shifted
    boundaries — the `events_first_last` gathers), and a bincount over
    first·5+last collapses every bucket to ≤25 matrix partials."""
    from ..stages.dedup import _splitmix64 as _mix64

    TYPES = ["click", "error", "purchase", "signup", "view"]
    NT = np.int64(len(TYPES))

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column("event_type"), value_set=pa.array(TYPES))
        if idx.null_count:
            raise ValueError("event_type outside the matrix domain")
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "u": pa.array(u),
            "tu": pc.cast(t.column("ts"), pa.int64()),
            "e": t.column("event_id"),
            "g": pc.cast(idx, pa.int8()),
            "__b": pa.array((_mix64(u.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def matrix(gd: pd.DataFrame) -> pd.DataFrame:
        u = gd["u"].to_numpy(dtype=np.int64)
        tu = gd["tu"].to_numpy(dtype=np.int64)
        e = gd["e"].to_numpy(dtype=np.int64)
        g = gd["g"].to_numpy(dtype=np.int64)
        order = np.lexsort((e, tu, u))
        u, g = u[order], g[order]
        starts = np.r_[0, np.flatnonzero(u[1:] != u[:-1]) + 1]
        ends = np.r_[starts[1:], len(u)] - 1
        code = g[starts] * NT + g[ends]
        cnt = np.bincount(code, minlength=int(NT * NT)).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"f": nz // NT, "l": nz % NT, "n": cnt[nz]})

    parts = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("__b").map_groups(matrix, batch_format="pandas") \
        .to_pandas()
    agg = parts.groupby(["f", "l"], as_index=False)["n"].sum()
    lab = np.array(TYPES, dtype=object)
    return pd.DataFrame({
        "first_type": lab[agg["f"].to_numpy(dtype=np.int64)],
        "last_type": lab[agg["l"].to_numpy(dtype=np.int64)],
        "n_users": agg["n"].astype("int64"),
    }).sort_values(["first_type", "last_type"]).reset_index(drop=True)


QUERIES["first_last_transition_matrix"] = first_last_transition_matrix
ORACLES["first_last_transition_matrix"] = """
    WITH fl AS (
      SELECT user_id,
             FIRST_VALUE(event_type) OVER w AS first_type,
             LAST_VALUE(event_type) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING
                AND UNBOUNDED FOLLOWING) AS last_type,
             ROW_NUMBER() OVER w AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT first_type, last_type, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM fl WHERE rn = 1
    GROUP BY first_type, last_type
    ORDER BY first_type, last_type
"""


def purchases_next_hour_views(sf_dir: str, num_buckets: int = 64
                              ) -> pd.DataFrame:
    """FORWARD-looking range frame — for every purchase, how many
    views the same user makes in the NEXT hour (strictly after, the
    post-conversion browse signal; `views_before_purchase` looks the
    other way): one user-hash exchange of mixed-type rows, the
    partition-offset trick makes ONE global searchsorted pair resolve
    every purchase's (ts, ts+1h] span, and the view count is a
    cumsum-of-indicator gather difference — zero-filled purchases
    included, like the SQL LEFT JOIN."""
    from ..stages.dedup import _splitmix64 as _mix64

    HOUR = np.int64(3_600_000_000)

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        m = pc.is_in(t.column("event_type"),
                     value_set=pa.array(["purchase", "view"]))
        t = t.filter(m)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "e": t.column("event_id"),
            "u": pa.array(u),
            "tu": pc.cast(t.column("ts"), pa.int64()),
            "isv": pc.cast(pc.equal(t.column("event_type"), "view"),
                           pa.int8()),
            "__b": pa.array((_mix64(u.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def frames(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(dtype=np.int64)
        tu = g["tu"].to_numpy(dtype=np.int64)
        e = g["e"].to_numpy(dtype=np.int64)
        isv = g["isv"].to_numpy(dtype=np.int8).astype(np.int64)
        order = np.lexsort((e, tu, u))
        u, tu, e, isv = u[order], tu[order], e[order], isv[order]
        n = len(u)
        if not n:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "n_views_next_hour": pd.Series([], dtype="int64")})
        first = np.r_[True, u[1:] != u[:-1]]
        pidx = np.cumsum(first) - 1
        span = tu.max() - tu.min() + HOUR + 1
        adj = tu + pidx * (span + HOUR + 1)
        left = np.searchsorted(adj, adj, side="right")  # strictly after
        right = np.searchsorted(adj, adj + HOUR, side="right")
        vc = np.r_[np.int64(0), np.cumsum(isv)]
        cnt = vc[right] - vc[left]
        isp = isv == 0
        return pd.DataFrame({"event_id": e[isp],
                             "n_views_next_hour": cnt[isp]})

    out = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("__b").map_groups(frames, batch_format="pandas") \
        .to_pandas()
    return out.sort_values("event_id").reset_index(drop=True) \
        .astype({"event_id": "int64", "n_views_next_hour": "int64"})


QUERIES["purchases_next_hour_views"] = purchases_next_hour_views
ORACLES["purchases_next_hour_views"] = """
    SELECT p.event_id,
           CAST(COUNT(v.event_id) AS BIGINT) AS n_views_next_hour
    FROM events p LEFT JOIN events v
      ON v.user_id = p.user_id AND v.event_type = 'view'
      AND v.ts > p.ts AND v.ts <= p.ts + INTERVAL 1 HOUR
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id ORDER BY p.event_id
"""


def weekend_value_ztest(sf_dir: str) -> pd.DataFrame:
    """Two-sample Welch z — the experiment-analysis primitive (is the
    weekend purchase value distribution different from weekdays?):
    per-arm exact integer moments fold in one zero-shuffle pass
    (c² split hi/lo), and the z statistic is ONE float expression
    from Python-int moments, mirrored token for token in the HUGEINT
    SQL so the doubles match bit-for-bit — the definitive answer to
    'can a distributed engine reproduce the analyst's number
    exactly'."""
    import math

    US_DAY = np.int64(86_400_000_000)

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def moments(t: pa.Table) -> pd.DataFrame:
        m = pc.equal(t.column("event_type"), "purchase") \
            .to_numpy(zero_copy_only=False)
        tu = pc.cast(t.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False)[m]
        c = _cents(t.column("value")).to_numpy(zero_copy_only=False)[m]
        dow = ((tu // US_DAY) + 4) % 7
        wk = (dow == 0) | (dow == 6)
        rows = []
        for arm, sel in (("weekend", wk), ("weekday", ~wk)):
            cc = c[sel]
            sq = cc * cc
            rows.append({
                "arm": arm, "n": len(cc), "s": int(cc.sum()),
                "hi": int((sq >> np.int64(32)).sum()),
                "lo": int((sq & np.int64((1 << 32) - 1)).sum()),
            })
        return pd.DataFrame(rows)

    p = ds.map_batches(moments, batch_format="pyarrow").to_pandas()
    st = {}
    for arm in ("weekend", "weekday"):
        r = p[p["arm"] == arm]
        n = int(r["n"].sum())
        s = int(r["s"].sum())
        ss = (int(r["hi"].sum()) << 32) + int(r["lo"].sum())
        st[arm] = (n, s, ss)
    n1, s1, ss1 = st["weekend"]
    n2, s2, ss2 = st["weekday"]
    num = float(s1) / n1 - float(s2) / n2
    v1 = float(n1 * ss1 - s1 * s1) / (float(n1) * (n1 - 1))
    v2 = float(n2 * ss2 - s2 * s2) / (float(n2) * (n2 - 1))
    z = num / math.sqrt(v1 / n1 + v2 / n2)
    return _one_row(n_weekend=np.int64(n1), n_weekday=np.int64(n2),
                    z=z)


QUERIES["weekend_value_ztest"] = weekend_value_ztest
ORACLES["weekend_value_ztest"] = """
    WITH v AS (
      SELECT CASE WHEN dayofweek(ts) IN (0, 6)
                  THEN 'weekend' ELSE 'weekday' END AS arm,
             CAST(ROUND(value*100) AS BIGINT) AS c
      FROM events WHERE event_type = 'purchase'),
    m AS (SELECT arm, CAST(COUNT(*) AS HUGEINT) AS n,
                 CAST(SUM(c) AS HUGEINT) AS s,
                 SUM(CAST(c AS HUGEINT) * c) AS ss
          FROM v GROUP BY arm),
    w1 AS (SELECT * FROM m WHERE arm = 'weekend'),
    w2 AS (SELECT * FROM m WHERE arm = 'weekday')
    SELECT CAST(w1.n AS BIGINT) AS n_weekend,
           CAST(w2.n AS BIGINT) AS n_weekday,
           (CAST(w1.s AS DOUBLE) / CAST(w1.n AS DOUBLE)
            - CAST(w2.s AS DOUBLE) / CAST(w2.n AS DOUBLE))
           / SQRT(
               CAST(w1.n*w1.ss - w1.s*w1.s AS DOUBLE)
                 / (CAST(w1.n AS DOUBLE) * CAST(w1.n - 1 AS DOUBLE))
                 / CAST(w1.n AS DOUBLE)
               + CAST(w2.n*w2.ss - w2.s*w2.s AS DOUBLE)
                 / (CAST(w2.n AS DOUBLE) * CAST(w2.n - 1 AS DOUBLE))
                 / CAST(w2.n AS DOUBLE)) AS z
    FROM w1 CROSS JOIN w2
"""


def ks_weekend_weekday(sf_dir: str) -> pd.DataFrame:
    """EXACT Kolmogorov–Smirnov statistic between two arms — the
    distribution-DRIFT detector a pipeline runs between snapshots:
    KS = max |F₁(v) − F₂(v)| becomes, in integers, max |n₂·cum₁(v)
    − n₁·cum₂(v)| / (n₁·n₂), so the scaled statistic and its argmax
    value are exact and hash-checkable. The value domain is
    cents-bounded, so per-batch (value, arm) count partials fold on
    the driver (≤ distinct-values rows — the same bound the weighted
    median exploits) and one vectorized cumsum pass finds the supremum
    and the EARLIEST value attaining it (tiebreak stated in SQL)."""
    US_DAY = np.int64(86_400_000_000)

    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pd.DataFrame:
        m = pc.equal(t.column("event_type"), "purchase") \
            .to_numpy(zero_copy_only=False)
        tu = pc.cast(t.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False)[m]
        c = _cents(t.column("value")).to_numpy(zero_copy_only=False)[m]
        dow = ((tu // US_DAY) + 4) % 7
        wk = ((dow == 0) | (dow == 6)).astype(np.int64)
        key = c * 2 + wk
        uk, n = np.unique(key, return_counts=True)
        return pd.DataFrame({"v": uk // 2, "arm": uk % 2,
                             "n": n.astype(np.int64)})

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas() \
        .groupby(["v", "arm"], as_index=False)["n"].sum()
    piv = p.pivot_table(index="v", columns="arm", values="n",
                        fill_value=0).reset_index()
    piv = piv.sort_values("v")
    v = piv["v"].to_numpy(dtype=np.int64)
    c_we = piv.get(1, pd.Series(np.zeros(len(v)))).to_numpy(dtype=np.int64)
    c_wd = piv.get(0, pd.Series(np.zeros(len(v)))).to_numpy(dtype=np.int64)
    n1, n2 = int(c_we.sum()), int(c_wd.sum())
    cum1 = np.cumsum(c_we)
    cum2 = np.cumsum(c_wd)
    gap = np.abs(n2 * cum1 - n1 * cum2)
    at = int(np.argmax(gap))  # first maximal
    return _one_row(n_weekend=np.int64(n1), n_weekday=np.int64(n2),
                    ks_scaled=np.int64(int(gap[at])),
                    at_value_cents=np.int64(int(v[at])))


QUERIES["ks_weekend_weekday"] = ks_weekend_weekday
ORACLES["ks_weekend_weekday"] = """
    WITH p AS (
      SELECT CAST(ROUND(value*100) AS BIGINT) AS v,
             CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS arm
      FROM events WHERE event_type = 'purchase'),
    g AS (SELECT v,
                 CAST(SUM(arm) AS BIGINT) AS we,
                 CAST(SUM(1 - arm) AS BIGINT) AS wd
          FROM p GROUP BY v),
    c AS (SELECT v,
                 SUM(we) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                   AS cum1,
                 SUM(wd) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                   AS cum2,
                 SUM(we) OVER () AS n1, SUM(wd) OVER () AS n2
          FROM g),
    k AS (SELECT v, ABS(n2 * cum1 - n1 * cum2) AS gap, n1, n2 FROM c)
    SELECT CAST(MAX(n1) AS BIGINT) AS n_weekend,
           CAST(MAX(n2) AS BIGINT) AS n_weekday,
           CAST(MAX(gap) AS BIGINT) AS ks_scaled,
           CAST((SELECT MIN(v) FROM k
                 WHERE gap = (SELECT MAX(gap) FROM k)) AS BIGINT)
             AS at_value_cents
    FROM k
"""


def hll_distinct_rollup(sf_dir: str) -> pd.DataFrame:
    """The SKETCH twin of `distinct_users_rollup` — and the punchline
    of mergeability: exact COUNT(DISTINCT) cannot roll up, but HLL
    states CAN, so ONE grouped per-day fold yields the weekly and
    global levels by pure state merges (no second pass over events,
    no user-pair exchange at all — the only exchange carries ≤days
    KB-size states). pytest gates every level against the exact
    rollup at the p=14 bound."""
    US_DAY = np.int64(86_400_000_000)

    from ..sketches import HLL

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        d = pc.cast(t.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False) // US_DAY
        return pa.table({"user_id": t.column("user_id"),
                         "day": pa.array(d)})

    daily = sketch_aggregate(ds.map_batches(prep, batch_format="pyarrow"),
                             "hll", on="user_id", by="day",
                             mode="bytes").to_pandas()
    daily = daily.sort_values("day").reset_index(drop=True)
    days = daily["day"].to_numpy(dtype=np.int64)
    blobs = [HLL.from_bytes(b) for b in daily.iloc[:, 1]]
    rows = []
    for d, h in zip(days, blobs):
        rows.append({"level": "day", "key": np.int64(d),
                     "est": np.int64(int(h.count()))})
    weeks = {}
    for d, h in zip(days, blobs):
        weeks.setdefault(int(d) // 7, []).append(h)
    for wk in sorted(weeks):
        m = HLL()
        for h in weeks[wk]:
            m.merge(h)
        rows.append({"level": "week", "key": np.int64(wk),
                     "est": np.int64(int(m.count()))})
    g = HLL()
    for h in blobs:
        g.merge(h)
    rows.append({"level": "global", "key": np.int64(0),
                 "est": np.int64(int(g.count()))})
    return pd.DataFrame(rows).astype({"key": "int64", "est": "int64"})


QUERIES["hll_distinct_rollup"] = hll_distinct_rollup


def upsert_orders_latest(sf_dir: str, num_buckets: int = 64
                         ) -> pd.DataFrame:
    """MERGE / upsert (latest-wins by key) — the lakehouse CDC
    operator: a deterministic 'update stream' (every 10th order
    re-priced +$1, version 1) merges over the base snapshot (version
    0); per-batch partials keep each key's highest-version row seen
    (combiner = argmax by version), ONE key-hash exchange finishes the
    argmax per key, and the audit output (rows, Σcents per version
    retained) proves base rows survive exactly where no update exists.
    The SQL twin states latest-wins via ROW_NUMBER over the unioned
    snapshots."""
    from ..stages.dedup import _splitmix64 as _mix64

    base = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def both_versions(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        c = _cents(t.column("o_totalprice")).to_numpy(zero_copy_only=False)
        upd = k % 10 == 0
        kk = np.concatenate([k, k[upd]])
        cc = np.concatenate([c, c[upd] + 100])
        vv = np.concatenate([np.zeros(len(k), dtype=np.int64),
                             np.ones(int(upd.sum()), dtype=np.int64)])
        # combiner: keep each key's highest-version row in this batch
        order = np.lexsort((-vv, kk))
        kk, cc, vv = kk[order], cc[order], vv[order]
        keep = np.r_[True, kk[1:] != kk[:-1]]
        kk, cc, vv = kk[keep], cc[keep], vv[keep]
        return pa.table({
            "k": pa.array(kk), "c": pa.array(cc), "v": pa.array(vv),
            "__b": pa.array((_mix64(kk.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def latest(g: pd.DataFrame) -> pd.DataFrame:
        k = g["k"].to_numpy(dtype=np.int64)
        c = g["c"].to_numpy(dtype=np.int64)
        v = g["v"].to_numpy(dtype=np.int64)
        order = np.lexsort((-v, k))
        k, c, v = k[order], c[order], v[order]
        keep = np.r_[True, k[1:] != k[:-1]]
        c, v = c[keep], v[keep]
        out = []
        for ver in (0, 1):
            m = v == ver
            out.append({"version": ver, "n": int(m.sum()),
                        "cents": int(c[m].sum())})
        return pd.DataFrame(out)

    parts = base.map_batches(both_versions, batch_format="pyarrow") \
        .groupby("__b").map_groups(latest, batch_format="pandas") \
        .to_pandas()
    agg = parts.groupby("version", as_index=False)[["n", "cents"]].sum()
    return agg.sort_values("version").reset_index(drop=True) \
        .astype({"version": "int64", "n": "int64", "cents": "int64"})


QUERIES["upsert_orders_latest"] = upsert_orders_latest
ORACLES["upsert_orders_latest"] = """
    WITH snap AS (
      SELECT o_orderkey AS k,
             CAST(ROUND(o_totalprice*100) AS BIGINT) AS c,
             0 AS v
      FROM orders
      UNION ALL
      SELECT o_orderkey,
             CAST(ROUND(o_totalprice*100) AS BIGINT) + 100, 1
      FROM orders WHERE o_orderkey % 10 = 0),
    latest AS (SELECT k, c, v,
                      ROW_NUMBER() OVER (PARTITION BY k
                                         ORDER BY v DESC) AS rn
               FROM snap)
    SELECT CAST(v AS BIGINT) AS version,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(c) AS BIGINT) AS cents
    FROM latest WHERE rn = 1
    GROUP BY v ORDER BY version
"""


def fk_containment(sf_dir: str, num_buckets: int = 256) -> pd.DataFrame:
    """Foreign-key PROFILING — bidirectional containment between
    lineitem.l_orderkey and orders.o_orderkey (the schema-inference
    primitive: a true FK has zero orphans one way and possibly
    childless parents the other): both sides dedup per batch, share
    ONE key-hash exchange with a side bit, and each bucket classifies
    its distinct keys by membership mask (the set-algebra reduceat) —
    counts of both-sides / lineitem-only / orders-only keys."""
    from ..stages.dedup import _splitmix64 as _mix64

    li = _read(sf_dir, "lineitem", columns=["l_orderkey"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey"])

    def side(col, bit):
        def f(t: pa.Table) -> pa.Table:
            k = np.unique(t.column(col).to_numpy(zero_copy_only=False))
            return pa.table({
                "k": pa.array(k),
                "m": pa.array(np.full(len(k), bit, dtype=np.int64)),
                "__b": pa.array((_mix64(k.astype(np.uint64))
                                 % np.uint64(num_buckets)).astype(np.int64)),
            })
        return f

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        k = g["k"].to_numpy(dtype=np.int64)
        m = g["m"].to_numpy(dtype=np.int64)
        order = np.argsort(k, kind="stable")
        k, m = k[order], m[order]
        starts = np.r_[0, np.flatnonzero(k[1:] != k[:-1]) + 1]
        mask = np.bitwise_or.reduceat(m, starts)
        um, n = np.unique(mask, return_counts=True)
        return pd.DataFrame({"mask": um, "n": n.astype(np.int64)})

    both = li.map_batches(side("l_orderkey", 1), batch_format="pyarrow") \
        .union(orders.map_batches(side("o_orderkey", 2),
                                  batch_format="pyarrow"))
    parts = both.groupby("__b").map_groups(
        classify, batch_format="pandas").to_pandas()
    agg = parts.groupby("mask", as_index=False)["n"].sum()
    get = {int(r["mask"]): int(r["n"]) for _, r in agg.iterrows()}
    return _one_row(n_both=np.int64(get.get(3, 0)),
                    n_lineitem_only=np.int64(get.get(1, 0)),
                    n_orders_only=np.int64(get.get(2, 0)))


QUERIES["fk_containment"] = fk_containment
ORACLES["fk_containment"] = """
    WITH l AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
    o AS (SELECT DISTINCT o_orderkey AS k FROM orders)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM l JOIN o USING (k))
             AS n_both,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM l
            WHERE k NOT IN (SELECT k FROM o)) AS n_lineitem_only,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM o
            WHERE k NOT IN (SELECT k FROM l)) AS n_orders_only
"""


def spearman_price_qty(sf_dir: str) -> pd.DataFrame:
    """Spearman rank correlation between lineitem price and quantity —
    the robust (monotone-invariant) twin of `price_discount_corr`,
    with TIES handled by the statistically correct average rank: this
    data has no unique row key (1161 duplicate (orderkey, linenumber)
    groups at sf0.001 — a ROW_NUMBER tiebreak would be
    engine-nondeterministic), so each VALUE v gets the integer doubled
    average rank R(v) = 2·(#less) + (#eq) + 1, identical on both
    engines and scale-equivalent to the fractional average rank.
    Pass 1 folds per-value counts for both variables (driver table
    bounded by DISTINCT values — the weighted-median trade, histogram
    layout documented past that); pass 2 is a zero-shuffle moments
    fold with the two broadcast R maps gathered by searchsorted; ρ is
    one float expression over Python-int moments, mirrored in HUGEINT
    SQL — bit-matched doubles. ZERO exchanges end to end."""
    import math

    ds = _read(sf_dir, "lineitem",
               columns=["l_extendedprice", "l_quantity"])

    def vals(t: pa.Table):
        p = _cents(t.column("l_extendedprice")).to_numpy(zero_copy_only=False)
        q = pc.cast(pc.round(t.column("l_quantity")), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return p, q

    def counts(t: pa.Table) -> pd.DataFrame:
        p, q = vals(t)
        out = []
        for var, v in ((0, p), (1, q)):
            uv, n = np.unique(v, return_counts=True)
            out.append(pd.DataFrame({"var": var, "v": uv,
                                     "n": n.astype(np.int64)}))
        return pd.concat(out, ignore_index=True)

    cnt = ds.map_batches(counts, batch_format="pyarrow").to_pandas() \
        .groupby(["var", "v"], as_index=False)["n"].sum()

    def rmap(var):
        g = cnt[cnt["var"] == var].sort_values("v")
        v = g["v"].to_numpy(dtype=np.int64)
        c = g["n"].to_numpy(dtype=np.int64)
        less = np.cumsum(c) - c
        return v, 2 * less + c + 1  # doubled average rank, integer

    vp, Rp = rmap(0)
    vq, Rq = rmap(1)

    def moments(t: pa.Table) -> pd.DataFrame:
        p, q = vals(t)
        a = Rp[np.searchsorted(vp, p)]
        b = Rq[np.searchsorted(vq, q)]
        return pd.DataFrame([{
            "n": len(a), "sp": int(a.sum()), "sq": int(b.sum()),
            "spp": int((a * a).sum()), "sqq": int((b * b).sum()),
            "spq": int((a * b).sum()),
        }])

    parts = ds.map_batches(moments, batch_format="pyarrow").to_pandas()
    n = int(parts["n"].sum())
    sp, sq = int(parts["sp"].sum()), int(parts["sq"].sum())
    spp, sqq = int(parts["spp"].sum()), int(parts["sqq"].sum())
    spq = int(parts["spq"].sum())
    rho = float(n * spq - sp * sq) / math.sqrt(
        float(n * spp - sp * sp) * float(n * sqq - sq * sq))
    return _one_row(n=np.int64(n), spearman_rho=rho)


QUERIES["spearman_price_qty"] = spearman_price_qty
ORACLES["spearman_price_qty"] = """
    WITH base AS (
      SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT) AS p,
             CAST(ROUND(l_quantity) AS BIGINT) AS q
      FROM lineitem),
    vp AS (SELECT p AS v, CAST(COUNT(*) AS BIGINT) AS c
           FROM base GROUP BY p),
    rp AS (SELECT v, 2*(SUM(c) OVER (ORDER BY v
                                     ROWS UNBOUNDED PRECEDING) - c)
                    + c + 1 AS R
           FROM vp),
    vq AS (SELECT q AS v, CAST(COUNT(*) AS BIGINT) AS c
           FROM base GROUP BY q),
    rq AS (SELECT v, 2*(SUM(c) OVER (ORDER BY v
                                     ROWS UNBOUNDED PRECEDING) - c)
                    + c + 1 AS R
           FROM vq),
    j AS (SELECT rp.R AS a, rq.R AS b
          FROM base JOIN rp ON base.p = rp.v JOIN rq ON base.q = rq.v),
    m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                 CAST(SUM(a) AS HUGEINT) AS sp,
                 CAST(SUM(b) AS HUGEINT) AS sq,
                 SUM(CAST(a AS HUGEINT) * a) AS spp,
                 SUM(CAST(b AS HUGEINT) * b) AS sqq,
                 SUM(CAST(a AS HUGEINT) * b) AS spq
          FROM j)
    SELECT CAST(n AS BIGINT) AS n,
           CAST(n*spq - sp*sq AS DOUBLE)
           / SQRT(CAST(n*spp - sp*sp AS DOUBLE)
                  * CAST(n*sqq - sq*sq AS DOUBLE)) AS spearman_rho
    FROM m
"""


def bounce_rate_daily(sf_dir: str, gap_min: int = 30,
                      num_buckets: int = 64) -> pd.DataFrame:
    """Daily bounce rate — single-event sessions over total sessions,
    keyed by the day each session STARTS (the engagement KPI that
    composes sessionization with a calendar rollup): the one user-hash
    exchange sessionizes (new-user OR gap>30min boundaries), every
    session reduces in-bucket to (start_day, is_bounce) and then to
    ≤days (day, n_sessions, n_bounce) partials; the rate ships as an
    exact integer pair."""
    from ..stages.dedup import _splitmix64 as _mix64

    GAP_US = np.int64(gap_min * 60 * 1_000_000)
    US_DAY = np.int64(86_400_000_000)

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def prep(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "u": pa.array(u),
            "tu": pc.cast(t.column("ts"), pa.int64()),
            "e": t.column("event_id"),
            "__b": pa.array((_mix64(u.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(dtype=np.int64)
        tu = g["tu"].to_numpy(dtype=np.int64)
        e = g["e"].to_numpy(dtype=np.int64)
        order = np.lexsort((e, tu, u))
        u, tu = u[order], tu[order]
        n = len(u)
        if not n:
            return pd.DataFrame({"day": pd.Series([], dtype="int64"),
                                 "n_sessions": pd.Series([], dtype="int64"),
                                 "n_bounce": pd.Series([], dtype="int64")})
        new = np.r_[True, (u[1:] != u[:-1]) | ((tu[1:] - tu[:-1]) > GAP_US)]
        starts = np.flatnonzero(new)
        size = np.diff(np.r_[starts, n])
        day = tu[starts] // US_DAY
        ud, inv = np.unique(day, return_inverse=True)
        tot = np.bincount(inv).astype(np.int64)
        bnc = np.bincount(inv, weights=(size == 1).astype(np.int64)) \
            .astype(np.int64)
        return pd.DataFrame({"day": ud, "n_sessions": tot,
                             "n_bounce": bnc})

    parts = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("__b").map_groups(sessions, batch_format="pandas") \
        .to_pandas()
    agg = parts.groupby("day", as_index=False)[["n_sessions", "n_bounce"]] \
        .sum()
    return pd.DataFrame({
        "day_us": agg["day"].to_numpy(dtype=np.int64) * US_DAY,
        "n_sessions": agg["n_sessions"].astype("int64"),
        "n_bounce": agg["n_bounce"].astype("int64"),
    }).sort_values("day_us").reset_index(drop=True)


QUERIES["bounce_rate_daily"] = bounce_rate_daily
ORACLES["bounce_rate_daily"] = """
    WITH e AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (SELECT *, SUM(is_start) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS sid
          FROM e),
    per AS (SELECT user_id, sid,
                   CAST(epoch_us(MIN(ts)) // 86400000000 AS BIGINT) AS day,
                   COUNT(*) AS sz
            FROM s GROUP BY user_id, sid)
    SELECT day * 86400000000 AS day_us,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounce
    FROM per GROUP BY day ORDER BY day_us
"""


def audio_fingerprint_dedup(sf_dir: str, num_buckets: int = 64
                            ) -> pd.DataFrame:
    """Scale-invariant audio dedup over REAL WAV bytes — the audio leg
    of the multimodal dedup triad (image aHash ✓, this ✓): payloads
    decode in an actor pool (built-in RIFF/PCM codec), each clip
    reduces to a 64-bit energy-difference-sign fingerprint
    (`stages.multimodal.AudioFingerprint` — exact integer frame
    energies, so AMPLITUDE CHANGES cannot move a single bit), and
    duplicate groups resolve through one fingerprint-hash exchange.
    The fixture plants amplitude-DOUBLED copies whose PCM ints are
    exactly 2× the originals': byte/sample-hash dedup provably misses
    them, this stage must catch every one — pytest asserts that
    recall. Rows-only (no SQL decodes a WAV)."""
    import glob as _glob
    import tempfile

    import ray.data

    from ..stages.dedup import _splitmix64 as _mix64
    from ..stages.multimodal import AudioFingerprint, make_dup_wav_table

    n = max(32, int(4096 * sf_of(sf_dir)))
    cache = os.path.join(tempfile.gettempdir(), "raysketch_data",
                         f"wavs_dup_n{n}_s7")
    if not _glob.glob(os.path.join(cache, "*.parquet")):
        import pyarrow.parquet as pq

        os.makedirs(cache, exist_ok=True)
        tmp = os.path.join(cache, "_part0.tmp")
        pq.write_table(make_dup_wav_table(n, seed=7), tmp,
                       row_group_size=max(32, n // 8))
        os.replace(tmp, os.path.join(cache, "part0.parquet"))
    ds = ray.data.read_parquet(cache)

    fps = ds.map_batches(AudioFingerprint, batch_format="pyarrow",
                         batch_size=64, concurrency=auto_concurrency())

    def tag(t: pa.Table) -> pa.Table:
        h = t.column("afp").to_numpy(zero_copy_only=False)
        return t.append_column(
            "__b", pa.array((_mix64(h.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)))

    def groups(g: pd.DataFrame) -> pd.DataFrame:
        h = g["afp"].to_numpy(dtype=np.int64)
        i = g["item_id"].to_numpy(dtype=np.int64)
        order = np.lexsort((i, h))
        h, i = h[order], i[order]
        starts = np.r_[0, np.flatnonzero(h[1:] != h[:-1]) + 1]
        cnt = np.diff(np.r_[starts, len(h)])
        keep = cnt >= 2
        return pd.DataFrame({"afp": h[starts][keep],
                             "n_items": cnt[keep].astype(np.int64),
                             "min_item_id": i[starts][keep]})

    out = fps.map_batches(tag, batch_format="pyarrow") \
        .groupby("__b").map_groups(groups, batch_format="pandas") \
        .to_pandas()
    return out.sort_values("afp").reset_index(drop=True) \
        .astype({"afp": "int64", "n_items": "int64",
                 "min_item_id": "int64"})


QUERIES["audio_fingerprint_dedup"] = audio_fingerprint_dedup


def video_content_dedup(sf_dir: str, num_buckets: int = 64
                        ) -> pd.DataFrame:
    """Remux-invariant video dedup — the video leg of the multimodal
    dedup triad (image aHash, audio energy-signs, now this): Y4M
    payloads decode in an actor pool (built-in codec) and reduce to a
    64-bit CONTENT hash over the luma planes only
    (`stages.multimodal.VideoContentHash`), deliberately blind to
    container metadata; duplicate groups resolve through one hash
    exchange. The fixture plants REMUXED copies (identical pixels,
    different framerate header — the realistic duplicate: the same
    clip re-containered), which byte hashing provably misses; pytest
    asserts that recall. Rows-only (no SQL decodes Y4M)."""
    import glob as _glob
    import tempfile

    import ray.data

    from ..stages.dedup import _splitmix64 as _mix64
    from ..stages.multimodal import VideoContentHash, make_dup_y4m_table

    n = max(32, int(4096 * sf_of(sf_dir)))
    cache = os.path.join(tempfile.gettempdir(), "raysketch_data",
                         f"y4ms_dup_n{n}_s7")
    if not _glob.glob(os.path.join(cache, "*.parquet")):
        import pyarrow.parquet as pq

        os.makedirs(cache, exist_ok=True)
        tmp = os.path.join(cache, "_part0.tmp")
        pq.write_table(make_dup_y4m_table(n, seed=7), tmp,
                       row_group_size=max(32, n // 8))
        os.replace(tmp, os.path.join(cache, "part0.parquet"))
    ds = ray.data.read_parquet(cache)

    hs = ds.map_batches(VideoContentHash, batch_format="pyarrow",
                        batch_size=32, concurrency=auto_concurrency())

    def tag(t: pa.Table) -> pa.Table:
        h = t.column("vch").to_numpy(zero_copy_only=False)
        return t.append_column(
            "__b", pa.array((_mix64(h.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)))

    def groups(g: pd.DataFrame) -> pd.DataFrame:
        h = g["vch"].to_numpy(dtype=np.int64)
        i = g["item_id"].to_numpy(dtype=np.int64)
        order = np.lexsort((i, h))
        h, i = h[order], i[order]
        starts = np.r_[0, np.flatnonzero(h[1:] != h[:-1]) + 1]
        cnt = np.diff(np.r_[starts, len(h)])
        keep = cnt >= 2
        return pd.DataFrame({"vch": h[starts][keep],
                             "n_items": cnt[keep].astype(np.int64),
                             "min_item_id": i[starts][keep]})

    out = hs.map_batches(tag, batch_format="pyarrow") \
        .groupby("__b").map_groups(groups, batch_format="pandas") \
        .to_pandas()
    return out.sort_values("vch").reset_index(drop=True) \
        .astype({"vch": "int64", "n_items": "int64",
                 "min_item_id": "int64"})


QUERIES["video_content_dedup"] = video_content_dedup


def view_to_purchase_latency_quartiles(sf_dir: str, num_buckets: int = 64
                                       ) -> pd.DataFrame:
    """Conversion-speed KPI — p25/p50/p75 of each user's first-view →
    first-purchase-after-it latency (the funnel stage-gap composed
    with exact order statistics): one user-hash exchange resolves
    every user's first view and first strictly-later purchase
    (the funnel searchsorted pattern), producing ONE latency per
    converting user; the per-user latency table is user-bounded, so
    quartiles resolve on the driver at the quantile_disc k=⌈q·n⌉−1
    convention (the histogram-percentile layout takes over when even
    that table outgrows the driver — documented)."""
    from ..stages.dedup import _splitmix64 as _mix64

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        m = pc.is_in(t.column("event_type"),
                     value_set=pa.array(["view", "purchase"]))
        t = t.filter(m)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "u": pa.array(u),
            "tu": pc.cast(t.column("ts"), pa.int64()),
            "e": t.column("event_id"),
            "isp": pc.cast(pc.equal(t.column("event_type"), "purchase"),
                           pa.int8()),
            "__b": pa.array((_mix64(u.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def latencies(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(dtype=np.int64)
        tu = g["tu"].to_numpy(dtype=np.int64)
        e = g["e"].to_numpy(dtype=np.int64)
        isp = g["isp"].to_numpy(dtype=np.int8)
        order = np.lexsort((e, tu, u))
        u, tu, isp = u[order], tu[order], isp[order]
        n = len(u)
        if not n:
            return pd.DataFrame({"u": pd.Series([], dtype="int64"),
                                 "d": pd.Series([], dtype="int64")})
        # partition-offset composite (the range_window trick): each
        # user's rows occupy a disjoint adj interval, so one global
        # searchsorted resolves every "first purchase strictly after
        # the first view" — robust at ANY time span / user id range
        # (a naive u*M+ts composite silently breaks once the corpus
        # spans more than M microseconds)
        first = np.r_[True, u[1:] != u[:-1]]
        pidx = np.cumsum(first) - 1
        span = tu.max() - tu.min() + 1
        adj = (tu - tu.min()) + pidx * (span + 1)
        vm = isp == 0
        uv, first_ix = np.unique(u[vm], return_index=True)
        v_adj = adj[vm][first_ix]
        v_t = tu[vm][first_ix]
        pm = isp == 1
        pu, pt, padj = u[pm], tu[pm], adj[pm]
        out_u, out_d = [], []
        if len(pu) and len(uv):
            pos = np.searchsorted(padj, v_adj, side="right")
            ok = pos < len(padj)
            same = np.zeros(len(uv), dtype=bool)
            same[ok] = pu[pos[ok]] == uv[ok]
            lat = np.full(len(uv), -1, dtype=np.int64)
            lat[same] = pt[pos[same]] - v_t[same]
            keep = lat >= 0
            out_u = uv[keep]
            out_d = lat[keep]
        return pd.DataFrame({"u": np.asarray(out_u, dtype=np.int64),
                             "d": np.asarray(out_d, dtype=np.int64)})

    lat = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("__b").map_groups(latencies, batch_format="pandas") \
        .to_pandas()
    d = np.sort(lat["d"].to_numpy(dtype=np.int64))
    n = len(d)
    out = []
    for p in (25, 50, 75):
        k = -(-p * n // 100) - 1
        out.append({"p": np.int64(p), "latency_us": np.int64(int(d[k]))})
    return pd.DataFrame(out).astype({"p": "int64", "latency_us": "int64"})


QUERIES["view_to_purchase_latency_quartiles"] = \
    view_to_purchase_latency_quartiles
ORACLES["view_to_purchase_latency_quartiles"] = """
    WITH fv AS (SELECT user_id, MIN(ts) AS vt FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    fp AS (SELECT fv.user_id,
                  MIN(epoch_us(e.ts)) - MIN(epoch_us(fv.vt))
                    AS lat
           FROM fv JOIN events e
             ON e.user_id = fv.user_id
             AND e.event_type = 'purchase' AND e.ts > fv.vt
           GROUP BY fv.user_id),
    l AS (SELECT CAST(lat AS BIGINT) AS d FROM fp)
    SELECT CAST(25 AS BIGINT) AS p,
           CAST(quantile_disc(d, 0.25) AS BIGINT) AS latency_us FROM l
    UNION ALL
    SELECT 50, CAST(quantile_disc(d, 0.50) AS BIGINT) FROM l
    UNION ALL
    SELECT 75, CAST(quantile_disc(d, 0.75) AS BIGINT) FROM l
"""


def nearest_error_to_purchase(sf_dir: str, num_buckets: int = 64
                              ) -> pd.DataFrame:
    """NEAREST-in-time join (either direction) — for each purchase,
    the same user's closest error event by ABSOLUTE gap, ties to the
    earlier one: the bidirectional completion of the as-of family
    (purchases_asof_last_view looks back, purchases_near_errors tests
    a band, this picks the argmin): one user-hash exchange, a single
    sorted pass derives every purchase's previous-error and next-error
    via vectorized forward/backward fills of error positions, and the
    closer one wins by integer compare (≤ favours the earlier —
    stated identically in SQL). Purchases with no same-user error drop
    out like the SQL's WHERE."""
    from ..stages.dedup import _splitmix64 as _mix64

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        m = pc.is_in(t.column("event_type"),
                     value_set=pa.array(["purchase", "error"]))
        t = t.filter(m)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "u": pa.array(u),
            "tu": pc.cast(t.column("ts"), pa.int64()),
            "e": t.column("event_id"),
            "iserr": pc.cast(pc.equal(t.column("event_type"), "error"),
                             pa.int8()),
            "__b": pa.array((_mix64(u.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def nearest(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(dtype=np.int64)
        tu = g["tu"].to_numpy(dtype=np.int64)
        e = g["e"].to_numpy(dtype=np.int64)
        iserr = g["iserr"].to_numpy(dtype=np.int8)
        order = np.lexsort((e, tu, u))
        u, tu, e, iserr = u[order], tu[order], e[order], iserr[order]
        n = len(u)
        if not n:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "gap_us": pd.Series([], dtype="int64")})
        first = np.r_[True, u[1:] != u[:-1]]
        idx = np.arange(n)
        # forward fill: index of the latest error at or before i,
        # reset at partition starts
        em = iserr == 1
        prev_src = np.where(em, idx, -1)
        prev_src[first & ~em] = -1
        # segment-aware ffill: running max of (position or -1), with
        # partition restarts handled by offsetting positions per user
        pidx = np.cumsum(first) - 1
        BIG = np.int64(n + 1)
        tag = np.where(em, pidx * BIG + idx, -1)
        run = np.maximum.accumulate(tag)
        prev_ok = run >= pidx * BIG  # an error exists in THIS partition
        prev_ix = np.where(prev_ok, run - pidx * BIG, -1)
        # backward fill symmetric
        tag_b = np.where(em, -(pidx * BIG + idx), np.iinfo(np.int64).min)
        run_b = np.maximum.accumulate(tag_b[::-1])[::-1]
        nxt_val = -run_b
        nxt_ok = (run_b != np.iinfo(np.int64).min) & \
            (nxt_val < (pidx + 1) * BIG)
        nxt_ix = np.where(nxt_ok, nxt_val - pidx * BIG, -1)
        pm = iserr == 0
        rows_i = idx[pm]
        p_prev = prev_ix[pm]
        p_next = nxt_ix[pm]
        gp = np.where(p_prev >= 0, tu[pm] - tu[np.maximum(p_prev, 0)],
                      np.int64(2 ** 62))
        gn = np.where(p_next >= 0, tu[np.maximum(p_next, 0)] - tu[pm],
                      np.int64(2 ** 62))
        has = (p_prev >= 0) | (p_next >= 0)
        gap = np.where(gp <= gn, gp, gn)  # <= favours the earlier
        return pd.DataFrame({"event_id": e[pm][has],
                             "gap_us": gap[has]})

    out = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("__b").map_groups(nearest, batch_format="pandas") \
        .to_pandas()
    return out.sort_values("event_id").reset_index(drop=True) \
        .astype({"event_id": "int64", "gap_us": "int64"})


QUERIES["nearest_error_to_purchase"] = nearest_error_to_purchase
ORACLES["nearest_error_to_purchase"] = """
    WITH p AS (SELECT user_id, ts, event_id FROM events
               WHERE event_type = 'purchase'),
    er AS (SELECT user_id, ts FROM events WHERE event_type = 'error')
    SELECT p.event_id,
           CAST(MIN(ABS(epoch_us(er.ts) - epoch_us(p.ts))) AS BIGINT)
             AS gap_us
    FROM p JOIN er ON er.user_id = p.user_id
    GROUP BY p.event_id ORDER BY p.event_id
"""


def repeat_customer_revenue_share(sf_dir: str, num_buckets: int = 64
                                  ) -> pd.DataFrame:
    """Revenue share of REPEAT customers (≥2 orders) as an exact
    (num, den) pair — the loyalty KPI: per-customer (n_orders, cents)
    combiner partials take one custkey exchange, each bucket
    classifies its customers and emits 4 integers (repeat/total ×
    count/cents), driver folds."""
    from ..stages.dedup import _splitmix64 as _mix64

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        c = t.column("o_custkey").to_numpy(zero_copy_only=False)
        s = _cents(t.column("o_totalprice")).to_numpy(zero_copy_only=False)
        uc, inv = np.unique(c, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        rev = np.zeros(len(uc), dtype=np.int64)
        np.add.at(rev, inv, s)
        return pa.table({
            "c": pa.array(uc), "n": pa.array(cnt), "r": pa.array(rev),
            "__b": pa.array((_mix64(uc.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        c = g["c"].to_numpy(dtype=np.int64)
        n = g["n"].to_numpy(dtype=np.int64)
        r = g["r"].to_numpy(dtype=np.int64)
        order = np.argsort(c, kind="stable")
        c, n, r = c[order], n[order], r[order]
        starts = np.r_[0, np.flatnonzero(c[1:] != c[:-1]) + 1]
        nn = np.add.reduceat(n, starts)
        rr = np.add.reduceat(r, starts)
        rep = nn >= 2
        return pd.DataFrame([{
            "rep_cust": int(rep.sum()), "all_cust": len(nn),
            "rep_cents": int(rr[rep].sum()), "all_cents": int(rr.sum()),
        }])

    p = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("__b").map_groups(fold, batch_format="pandas").to_pandas()
    return _one_row(
        n_repeat_customers=np.int64(int(p["rep_cust"].sum())),
        n_customers=np.int64(int(p["all_cust"].sum())),
        repeat_cents=np.int64(int(p["rep_cents"].sum())),
        total_cents=np.int64(int(p["all_cents"].sum())))


QUERIES["repeat_customer_revenue_share"] = repeat_customer_revenue_share
ORACLES["repeat_customer_revenue_share"] = """
    WITH per AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey)
    SELECT CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_repeat_customers,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN n >= 2 THEN cents ELSE 0 END) AS BIGINT)
             AS repeat_cents,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM per
"""


def session_type_lift(sf_dir: str, gap_min: int = 30,
                      num_buckets: int = 64) -> pd.DataFrame:
    """Market-basket support counts over SESSIONS — the association-
    rule primitive (lift's exact ingredients, no float): which event
    types co-occur in a session more than independence predicts? One
    user-hash exchange sessionizes AND reduces every session to a
    5-bit type bitmask in-bucket (segment bitwise-OR over type bits);
    buckets emit the ≤32-mask histogram, and the driver answers ALL
    pairs' support counts (n_both, n_a, n_b, n_sessions) from it —
    the k-set mask-histogram idea (jaccard_sources_vocab) applied to
    baskets. Lift = n_both·n_sessions / (n_a·n_b) is left to the
    caller as exact integers."""
    from ..stages.dedup import _splitmix64 as _mix64

    TYPES = ["click", "error", "purchase", "signup", "view"]
    NT = len(TYPES)
    GAP_US = np.int64(gap_min * 60 * 1_000_000)

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column("event_type"), value_set=pa.array(TYPES))
        if idx.null_count:
            raise ValueError("event_type outside the basket domain")
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "u": pa.array(u),
            "tu": pc.cast(t.column("ts"), pa.int64()),
            "e": t.column("event_id"),
            "g": pc.cast(idx, pa.int8()),
            "__b": pa.array((_mix64(u.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def masks(gd: pd.DataFrame) -> pd.DataFrame:
        u = gd["u"].to_numpy(dtype=np.int64)
        tu = gd["tu"].to_numpy(dtype=np.int64)
        e = gd["e"].to_numpy(dtype=np.int64)
        g = gd["g"].to_numpy(dtype=np.int64)
        order = np.lexsort((e, tu, u))
        u, tu, g = u[order], tu[order], g[order]
        n = len(u)
        if not n:
            return pd.DataFrame({"m": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        new = np.r_[True, (u[1:] != u[:-1]) | ((tu[1:] - tu[:-1]) > GAP_US)]
        sid = np.cumsum(new) - 1
        bit = np.left_shift(np.int64(1), g)
        mask = np.zeros(int(sid[-1]) + 1, dtype=np.int64)
        np.bitwise_or.at(mask, sid, bit)
        um, cnt = np.unique(mask, return_counts=True)
        return pd.DataFrame({"m": um, "n": cnt.astype(np.int64)})

    parts = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("__b").map_groups(masks, batch_format="pandas") \
        .to_pandas()
    hist = parts.groupby("m", as_index=False)["n"].sum()
    masks_arr = hist["m"].to_numpy(dtype=np.int64)
    cnts = hist["n"].to_numpy(dtype=np.int64)
    total = int(cnts.sum())
    rows = []
    for i in range(NT):
        for j in range(i + 1, NT):
            bi, bj = np.int64(1 << i), np.int64(1 << j)
            rows.append({
                "type_a": TYPES[i], "type_b": TYPES[j],
                "n_both": int(cnts[(masks_arr & bi != 0)
                                   & (masks_arr & bj != 0)].sum()),
                "n_a": int(cnts[masks_arr & bi != 0].sum()),
                "n_b": int(cnts[masks_arr & bj != 0].sum()),
                "n_sessions": total,
            })
    return pd.DataFrame(rows).sort_values(["type_a", "type_b"]) \
        .reset_index(drop=True) \
        .astype({"n_both": "int64", "n_a": "int64", "n_b": "int64",
                 "n_sessions": "int64"})


QUERIES["session_type_lift"] = session_type_lift
ORACLES["session_type_lift"] = """
    WITH e AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (SELECT *, SUM(is_start) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS sid
          FROM e),
    f AS (SELECT user_id, sid,
                 MAX(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS c,
                 MAX(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS er,
                 MAX(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS p,
                 MAX(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS sg,
                 MAX(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS v
          FROM s GROUP BY user_id, sid),
    pairs(type_a, type_b) AS (VALUES
      ('click','error'), ('click','purchase'), ('click','signup'),
      ('click','view'), ('error','purchase'), ('error','signup'),
      ('error','view'), ('purchase','signup'), ('purchase','view'),
      ('signup','view'))
    SELECT type_a, type_b,
           CAST(SUM((CASE type_a WHEN 'click' THEN c WHEN 'error' THEN er
                     WHEN 'purchase' THEN p WHEN 'signup' THEN sg
                     ELSE v END)
                  * (CASE type_b WHEN 'click' THEN c WHEN 'error' THEN er
                     WHEN 'purchase' THEN p WHEN 'signup' THEN sg
                     ELSE v END)) AS BIGINT) AS n_both,
           CAST(SUM(CASE type_a WHEN 'click' THEN c WHEN 'error' THEN er
                    WHEN 'purchase' THEN p WHEN 'signup' THEN sg
                    ELSE v END) AS BIGINT) AS n_a,
           CAST(SUM(CASE type_b WHEN 'click' THEN c WHEN 'error' THEN er
                    WHEN 'purchase' THEN p WHEN 'signup' THEN sg
                    ELSE v END) AS BIGINT) AS n_b,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM f) AS n_sessions
    FROM pairs CROSS JOIN f
    GROUP BY type_a, type_b
    ORDER BY type_a, type_b
"""


def diversified_top_orders(sf_dir: str, k: int = 10, quota: int = 2,
                           num_buckets: int = 64) -> pd.DataFrame:
    """DIVERSIFIED top-k — the search-results rule 'at most ``quota``
    per customer in the global top ``k``': the quota applies within
    each customer's single bucket (per-bucket per-customer top-2 by
    one lexsort + rank-within-segment mask), survivors compete in the
    bucket's local top-k, and the driver folds ≤k·buckets rows —
    sound for the same one-bucket-per-key reason as every local-top-k
    here, because dropping a customer's 3rd-best can never promote a
    worse global row. SQL states it as ROW_NUMBER-per-customer ≤ 2
    then a global LIMIT."""
    from ..stages.dedup import _splitmix64 as _mix64

    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        c = t.column("o_custkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "c": pa.array(c),
            "k": t.column("o_orderkey"),
            "p": _cents(t.column("o_totalprice")),
            "__b": pa.array((_mix64(c.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def local(g: pd.DataFrame) -> pd.DataFrame:
        c = g["c"].to_numpy(dtype=np.int64)
        kk = g["k"].to_numpy(dtype=np.int64)
        p = g["p"].to_numpy(dtype=np.int64)
        order = np.lexsort((kk, -p, c))
        c, kk, p = c[order], kk[order], p[order]
        starts = np.r_[0, np.flatnonzero(c[1:] != c[:-1]) + 1]
        grp = np.repeat(np.arange(len(starts)),
                        np.diff(np.r_[starts, len(c)]))
        rank = np.arange(len(c)) - starts[grp]
        keep = rank < quota
        df = pd.DataFrame({"c": c[keep], "k": kk[keep], "p": p[keep]})
        return df.sort_values(["p", "k"],
                              ascending=[False, True]).head(k)

    parts = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("__b").map_groups(local, batch_format="pandas") \
        .to_pandas()
    out = parts.sort_values(["p", "k"], ascending=[False, True]).head(k)
    return out.rename(columns={"c": "o_custkey", "k": "o_orderkey",
                               "p": "price_cents"}) \
        [["o_orderkey", "o_custkey", "price_cents"]] \
        .sort_values("o_orderkey").reset_index(drop=True) \
        .astype({"o_orderkey": "int64", "o_custkey": "int64",
                 "price_cents": "int64"})


QUERIES["diversified_top_orders"] = diversified_top_orders
ORACLES["diversified_top_orders"] = """
    WITH r AS (
      SELECT o_orderkey, o_custkey,
             CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_cents,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY ROUND(o_totalprice*100) DESC,
                                         o_orderkey) AS rn
      FROM orders)
    SELECT o_orderkey, o_custkey, price_cents FROM r
    WHERE rn <= 2
    ORDER BY price_cents DESC, o_orderkey LIMIT 10
"""


def rolling30_rev_cnt_corr(sf_dir: str, window: int = 30
                           ) -> pd.DataFrame:
    """Rolling 30-row correlation between daily revenue and daily
    order count — time-series analytics with bit-matched floats: the
    day series folds through the calendar-bounded zero-shuffle
    combiner, every window's SIX moment sums are exact integers
    (windowed cumsum differences), and each day's r is ONE float
    division tree stated identically in the SQL windowed-SUM form —
    per-row doubles, not a float sum, so order can't break the hash.
    Emitted for days with a full window (ROWS 29 PRECEDING, matching
    the SQL filter rn >= 30)."""
    import math

    US_DAY = np.int64(86_400_000_000)

    ds = _read(sf_dir, "orders", columns=["o_totalprice", "o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t.column("o_totalprice")).to_numpy(zero_copy_only=False)
        d = pc.cast(t.column("o_orderdate"), pa.int64()) \
            .to_numpy(zero_copy_only=False) // US_DAY
        ud, inv = np.unique(d, return_inverse=True)
        s = np.zeros(len(ud), dtype=np.int64)
        np.add.at(s, inv, c)
        n = np.bincount(inv).astype(np.int64)
        return pa.table({"day": pa.array(ud), "s": pa.array(s),
                         "n": pa.array(n)})

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas() \
        .groupby("day", as_index=False)[["s", "n"]].sum()
    p = p.sort_values("day").reset_index(drop=True)
    day = p["day"].to_numpy(dtype=np.int64)
    x = p["s"].to_numpy(dtype=np.int64)   # daily revenue cents
    y = p["n"].to_numpy(dtype=np.int64)   # daily order count
    W = window

    def wsum(a):
        cs = np.r_[np.zeros(1, dtype=object), np.cumsum(a.astype(object))]
        return cs[W:] - cs[:-W]

    sx, sy = wsum(x), wsum(y)
    sxx, syy, sxy = wsum(x * x), wsum(y * y), wsum(x * y)
    out_day = day[W - 1:]
    rows = []
    for i in range(len(out_day)):
        n_ = W
        num = n_ * int(sxy[i]) - int(sx[i]) * int(sy[i])
        vx = n_ * int(sxx[i]) - int(sx[i]) ** 2
        vy = n_ * int(syy[i]) - int(sy[i]) ** 2
        rows.append({
            "day_us": np.int64(int(out_day[i]) * int(US_DAY)),
            "corr": float(num) / math.sqrt(float(vx) * float(vy)),
        })
    return pd.DataFrame(rows).astype({"day_us": "int64"})


QUERIES["rolling30_rev_cnt_corr"] = rolling30_rev_cnt_corr
ORACLES["rolling30_rev_cnt_corr"] = """
    WITH d AS (
      SELECT CAST(epoch_us(date_trunc('day', o_orderdate))
                  // 86400000000 AS BIGINT) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
               AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM orders GROUP BY 1),
    w AS (SELECT day,
                 ROW_NUMBER() OVER (ORDER BY day) AS rn,
                 SUM(CAST(x AS HUGEINT)) OVER win AS sx,
                 SUM(CAST(y AS HUGEINT)) OVER win AS sy,
                 SUM(CAST(x AS HUGEINT) * x) OVER win AS sxx,
                 SUM(CAST(y AS HUGEINT) * y) OVER win AS syy,
                 SUM(CAST(x AS HUGEINT) * y) OVER win AS sxy
          FROM d
          WINDOW win AS (ORDER BY day ROWS BETWEEN 29 PRECEDING
                         AND CURRENT ROW))
    SELECT day * 86400000000 AS day_us,
           CAST(30*sxy - sx*sy AS DOUBLE)
           / SQRT(CAST(30*sxx - sx*sx AS DOUBLE)
                  * CAST(30*syy - sy*sy AS DOUBLE)) AS corr
    FROM w WHERE rn >= 30
    ORDER BY day_us
"""


def bootstrap_means_orders(sf_dir: str, B: int = 20) -> pd.DataFrame:
    """DETERMINISTIC bootstrap — B resampled means of the order price,
    where replicate b includes row k with multiplicity
    m(k,b) ∈ {0,1,1,2} drawn from the Knuth hash of (k, b): mean
    multiplicity 1 (the Poisson-bootstrap idea with a 4-point lattice),
    zero shuffles (each batch folds all B replicates' (Σm, Σm·cents)
    partials in one vectorized pass), reproducible at any parallelism,
    and — because the multiplicity is a pure hash expression — the
    ENTIRE resampling is value-hash-checked against SQL, which no
    rng-based bootstrap could ever be. The replicate spread is the
    caller's confidence interval; sums ship as exact integers."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    K = np.int64(2654435761)
    K2 = np.int64(40503)
    P = np.int64(1_000_000_007)
    MAP = np.array([0, 1, 1, 2], dtype=np.int64)
    bs = np.arange(1, B + 1, dtype=np.int64)

    def partial(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        c = _cents(t.column("o_totalprice")).to_numpy(zero_copy_only=False)
        h = ((k[:, None] * K + bs[None, :] * K2) % P) % np.int64(4)
        m = MAP[h]  # (n, B)
        return pa.table({
            "b": pa.array(bs),
            "n_eff": pa.array(m.sum(axis=0).astype(np.int64)),
            "cents": pa.array((m * c[:, None]).sum(axis=0)
                              .astype(np.int64)),
        })

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas() \
        .groupby("b", as_index=False)[["n_eff", "cents"]].sum()
    return p.sort_values("b").reset_index(drop=True) \
        .astype({"b": "int64", "n_eff": "int64", "cents": "int64"})


QUERIES["bootstrap_means_orders"] = bootstrap_means_orders
ORACLES["bootstrap_means_orders"] = """
    WITH reps AS (SELECT unnest(generate_series(1, 20)) AS b),
    m AS (
      SELECT reps.b,
             CASE ((o_orderkey * 2654435761 + reps.b * 40503)
                   % 1000000007) % 4
               WHEN 0 THEN 0 WHEN 3 THEN 2 ELSE 1 END AS mult,
             CAST(ROUND(o_totalprice*100) AS BIGINT) AS c
      FROM orders CROSS JOIN reps)
    SELECT CAST(b AS BIGINT) AS b,
           CAST(SUM(mult) AS BIGINT) AS n_eff,
           CAST(SUM(mult * c) AS BIGINT) AS cents
    FROM m GROUP BY b ORDER BY b
"""


def bought_together_parts(sf_dir: str, k: int = 10,
                          num_buckets: int = 64) -> pd.DataFrame:
    """'Frequently bought together' — top-k part PAIRS co-occurring in
    the same order: the item-level market basket (session_type_lift's
    domain is 5 types; this one is unbounded parts, so masks don't
    work and pairs must materialize — safely, because basket sizes
    are small: an order's ≤7 distinct parts yield ≤21 pairs, a
    BOUNDED fan-out unlike document shingles). One orderkey exchange
    co-locates each basket, in-bucket pair generation reuses the
    triangle-counting unranking (no per-order loop), a second
    pair-hash exchange counts, and per-bucket local top-k bounds the
    driver fold. (n desc, pair asc) tiebreak stated in SQL."""
    from ..stages.dedup import _splitmix64 as _mix64

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def dedup_pairs(t: pa.Table) -> pa.Table:
        o = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        p = t.column("l_partkey").to_numpy(zero_copy_only=False)
        key = np.unique(o * np.int64(1 << 22) + p)
        oo = key >> np.int64(22)
        return pa.table({
            "o": pa.array(oo),
            "p": pa.array(key & np.int64((1 << 22) - 1)),
            "__b": pa.array((_mix64(oo.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def gen_pairs(g: pd.DataFrame) -> pd.DataFrame:
        o = g["o"].to_numpy(dtype=np.int64)
        p = g["p"].to_numpy(dtype=np.int64)
        key = np.unique(o * np.int64(1 << 22) + p)
        o, p = key >> np.int64(22), key & np.int64((1 << 22) - 1)
        starts = np.r_[0, np.flatnonzero(o[1:] != o[:-1]) + 1]
        cnt = np.diff(np.r_[starts, len(o)])
        m = cnt * (cnt - 1) // 2
        tot = int(m.sum())
        if tot == 0:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        offs = np.cumsum(m) - m
        seg = np.repeat(np.arange(len(m)), m)
        q = np.arange(tot, dtype=np.int64) - offs[seg]
        j = ((1.0 + np.sqrt(1.0 + 8.0 * q.astype(np.float64))) / 2.0) \
            .astype(np.int64)
        j = np.where(j * (j - 1) // 2 > q, j - 1, j)
        j = np.where((j + 1) * j // 2 <= q, j + 1, j)
        i = q - j * (j - 1) // 2
        base = starts[seg]
        # parts are sorted within the order segment, so i<j gives a<b
        return pd.DataFrame({"a": p[base + i], "b": p[base + j]})

    def count_top(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["a", "b"], as_index=False).size() \
            .rename(columns={"size": "n"})
        agg["n"] = agg["n"].astype(np.int64)
        return agg.sort_values(["n", "a", "b"],
                               ascending=[False, True, True]).head(k)

    pairs = li.map_batches(dedup_pairs, batch_format="pyarrow") \
        .groupby("__b").map_groups(gen_pairs, batch_format="pandas")

    def tag2(t: pa.Table) -> pa.Table:
        key = (t.column("a").to_numpy(zero_copy_only=False)
               * np.int64(1 << 22)
               + t.column("b").to_numpy(zero_copy_only=False))
        return t.append_column(
            "__b2", pa.array((_mix64(key.astype(np.uint64))
                              % np.uint64(num_buckets)).astype(np.int64)))

    parts = pairs.map_batches(tag2, batch_format="pyarrow") \
        .groupby("__b2").map_groups(count_top, batch_format="pandas") \
        .to_pandas()
    out = parts.sort_values(["n", "a", "b"],
                            ascending=[False, True, True]).head(k)
    return out.rename(columns={"a": "part_a", "b": "part_b"}) \
        .reset_index(drop=True) \
        .astype({"part_a": "int64", "part_b": "int64", "n": "int64"})


QUERIES["bought_together_parts"] = bought_together_parts
ORACLES["bought_together_parts"] = """
    WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM d a JOIN d b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    ORDER BY n DESC, part_a, part_b LIMIT 10
"""


def weekly_churn(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """Weekly churn — users active in week w but NOT in week w+1 (the
    retention family's exit side: cohorts measure who stays, this
    measures who leaves): one user-hash exchange of deduped
    (user, week) pairs co-locates each user's week set, a single
    sorted pass marks weeks whose successor is absent (shifted
    compare within user segments), and buckets collapse to ≤weeks
    (week, n_active, n_churned) partials. The last observed week is
    excluded on both sides — churn there is right-censored, not
    real."""
    from ..stages.dedup import _splitmix64 as _mix64

    US_DAY = np.int64(86_400_000_000)

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    # driver-folded max week (one int per block) for the censor bound
    meta = ds.map_batches(
        lambda t: pa.table({"m": pa.array([int(
            pc.max(pc.cast(t.column("ts"), pa.int64())).as_py()
            // int(US_DAY) // 7)])}),
        batch_format="pyarrow").to_pandas()
    wmax = int(meta["m"].max())

    def pairs(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        w = pc.cast(t.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False) // US_DAY // 7
        key = np.unique(u * np.int64(1 << 16) + w)
        uu = key >> np.int64(16)
        return pa.table({
            "u": pa.array(uu),
            "w": pa.array(key & np.int64((1 << 16) - 1)),
            "__b": pa.array((_mix64(uu.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def churn(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(dtype=np.int64)
        w = g["w"].to_numpy(dtype=np.int64)
        key = np.unique(u * np.int64(1 << 16) + w)
        u, w = key >> np.int64(16), key & np.int64((1 << 16) - 1)
        if not len(u):
            return pd.DataFrame({"week": pd.Series([], dtype="int64"),
                                 "n_active": pd.Series([], dtype="int64"),
                                 "n_churned": pd.Series([], dtype="int64")})
        nxt_same = np.r_[(u[1:] == u[:-1]) & (w[1:] == w[:-1] + 1), False]
        m = w < wmax  # right-censor the final week
        uw, inv = np.unique(w[m], return_inverse=True)
        act = np.bincount(inv).astype(np.int64)
        chn = np.bincount(inv, weights=(~nxt_same[m]).astype(np.int64)) \
            .astype(np.int64)
        return pd.DataFrame({"week": uw, "n_active": act,
                             "n_churned": chn})

    parts = ds.map_batches(pairs, batch_format="pyarrow") \
        .groupby("__b").map_groups(churn, batch_format="pandas") \
        .to_pandas()
    agg = parts.groupby("week", as_index=False)[["n_active", "n_churned"]] \
        .sum()
    return agg.sort_values("week").reset_index(drop=True) \
        .astype({"week": "int64", "n_active": "int64",
                 "n_churned": "int64"})


QUERIES["weekly_churn"] = weekly_churn
ORACLES["weekly_churn"] = """
    WITH act AS (SELECT DISTINCT user_id,
                        CAST(epoch_us(ts) // 86400000000 // 7 AS BIGINT)
                          AS w
                 FROM events),
    mx AS (SELECT MAX(w) AS wmax FROM act)
    SELECT a.w AS week,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(SUM(CASE WHEN b.user_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_churned
    FROM act a
    LEFT JOIN act b ON b.user_id = a.user_id AND b.w = a.w + 1
    CROSS JOIN mx
    WHERE a.w < mx.wmax
    GROUP BY a.w ORDER BY week
"""


def consecutive_vcp_users(sf_dir: str, num_buckets: int = 64
                          ) -> pd.DataFrame:
    """STRICT consecutive-pattern matching — users whose event stream
    contains view→click→purchase as ADJACENT events (the
    MATCH_RECOGNIZE pattern with no gaps, stricter than the funnel's
    'eventually after'): one user-hash exchange, one within-bucket
    lexsort, and the triple test is two shifted compares masked at
    user boundaries — per-batch match counts collapse to a user count
    plus the matched-triple count (a user can match repeatedly; both
    numbers are reported and both must hash-match)."""
    from ..stages.dedup import _splitmix64 as _mix64

    TYPES = ["click", "error", "purchase", "signup", "view"]
    V, C, P = 4, 0, 2  # indices in TYPES

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column("event_type"), value_set=pa.array(TYPES))
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "u": pa.array(u),
            "tu": pc.cast(t.column("ts"), pa.int64()),
            "e": t.column("event_id"),
            "g": pc.cast(idx, pa.int8()),
            "__b": pa.array((_mix64(u.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def match(gd: pd.DataFrame) -> pd.DataFrame:
        u = gd["u"].to_numpy(dtype=np.int64)
        tu = gd["tu"].to_numpy(dtype=np.int64)
        e = gd["e"].to_numpy(dtype=np.int64)
        g = gd["g"].to_numpy(dtype=np.int64)
        order = np.lexsort((e, tu, u))
        u, g = u[order], g[order]
        n = len(u)
        if n < 3:
            return pd.DataFrame({"n_users": [0], "n_triples": [0]})
        same3 = (u[2:] == u[:-2])
        hit = same3 & (g[:-2] == V) & (g[1:-1] == C) & (g[2:] == P)
        n_triples = int(hit.sum())
        users = np.unique(u[:-2][hit])
        return pd.DataFrame({"n_users": [len(users)],
                             "n_triples": [n_triples]})

    p = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("__b").map_groups(match, batch_format="pandas") \
        .to_pandas()
    return _one_row(n_users=np.int64(int(p["n_users"].sum())),
                    n_triples=np.int64(int(p["n_triples"].sum())))


QUERIES["consecutive_vcp_users"] = consecutive_vcp_users
ORACLES["consecutive_vcp_users"] = """
    WITH s AS (
      SELECT user_id, event_type,
             LEAD(event_type, 1) OVER w AS t1,
             LEAD(event_type, 2) OVER w AS t2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    hits AS (SELECT user_id FROM s
             WHERE event_type = 'view' AND t1 = 'click'
               AND t2 = 'purchase')
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_triples
    FROM hits
"""


def customer_hhi(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """Herfindahl–Hirschman concentration of customer spend — the
    market-concentration KPI HHI = Σ shareᵢ² = Σrᵢ² / (Σr)², shipped
    as the exact integer pair (Σr², Σr) in whole DOLLARS (cents² of a
    full dataset overflows int64; dollars keep both sides exact and
    identical): per-customer totals through one custkey exchange,
    each bucket emits (Σr² hi/lo-split, Σr, n) partials, driver folds
    Python ints — the caller divides once."""
    from ..stages.dedup import _splitmix64 as _mix64

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        c = t.column("o_custkey").to_numpy(zero_copy_only=False)
        cents = _cents(t.column("o_totalprice")) \
            .to_numpy(zero_copy_only=False)
        # whole dollars with SQL ROUND's half-away (= half-up for
        # positive prices): integer arithmetic on exact cents — Arrow's
        # pc.round defaults to half-to-even and silently disagrees
        d = (cents + 50) // 100
        uc, inv = np.unique(c, return_inverse=True)
        s = np.zeros(len(uc), dtype=np.int64)
        np.add.at(s, inv, d)
        return pa.table({
            "c": pa.array(uc), "s": pa.array(s),
            "__b": pa.array((_mix64(uc.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        c = g["c"].to_numpy(dtype=np.int64)
        s = g["s"].to_numpy(dtype=np.int64)
        order = np.argsort(c, kind="stable")
        c, s = c[order], s[order]
        starts = np.r_[0, np.flatnonzero(c[1:] != c[:-1]) + 1]
        tot = np.add.reduceat(s, starts)
        sq = tot * tot
        return pd.DataFrame([{
            "n": len(tot), "sr": int(tot.sum()),
            "hi": int((sq >> np.int64(32)).sum()),
            "lo": int((sq & np.int64((1 << 32) - 1)).sum()),
        }])

    p = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("__b").map_groups(fold, batch_format="pandas").to_pandas()
    n = int(p["n"].sum())
    sr = int(p["sr"].sum())
    sr2 = (int(p["hi"].sum()) << 32) + int(p["lo"].sum())
    return _one_row(n_customers=np.int64(n),
                    sum_spend_dollars=np.int64(sr),
                    sum_spend_sq=np.int64(sr2))


QUERIES["customer_hhi"] = customer_hhi
ORACLES["customer_hhi"] = """
    WITH per AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice) AS BIGINT)) AS BIGINT) AS s
      FROM orders GROUP BY o_custkey)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(s) AS BIGINT) AS sum_spend_dollars,
           CAST(SUM(CAST(s AS HUGEINT) * s) AS BIGINT) AS sum_spend_sq
    FROM per
"""


def order_size_histogram(sf_dir: str, num_buckets: int = 64
                         ) -> pd.DataFrame:
    """Lines-per-order histogram — the fact-table fan-out profile that
    sizes every lineitem⋈orders join plan: per-batch (okey, n)
    combiner partials, one okey exchange finishes the counts, and
    each bucket collapses straight to (size, n_orders) partials
    bounded by the max basket size — the driver never sees an order
    key (the Q13 count-of-counts discipline applied to the fact
    table itself)."""
    from ..stages.dedup import _splitmix64 as _mix64

    li = _read(sf_dir, "lineitem", columns=["l_orderkey"])

    def partial(t: pa.Table) -> pa.Table:
        k = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        uk, n = np.unique(k, return_counts=True)
        return pa.table({
            "k": pa.array(uk), "n": pa.array(n.astype(np.int64)),
            "__b": pa.array((_mix64(uk.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def hist(g: pd.DataFrame) -> pd.DataFrame:
        k = g["k"].to_numpy(dtype=np.int64)
        n = g["n"].to_numpy(dtype=np.int64)
        order = np.argsort(k, kind="stable")
        k, n = k[order], n[order]
        starts = np.r_[0, np.flatnonzero(k[1:] != k[:-1]) + 1]
        per = np.add.reduceat(n, starts)
        us, cnt = np.unique(per, return_counts=True)
        return pd.DataFrame({"n_lines": us,
                             "n_orders": cnt.astype(np.int64)})

    p = li.map_batches(partial, batch_format="pyarrow") \
        .groupby("__b").map_groups(hist, batch_format="pandas").to_pandas()
    agg = p.groupby("n_lines", as_index=False)["n_orders"].sum()
    return agg.sort_values("n_lines").reset_index(drop=True) \
        .astype({"n_lines": "int64", "n_orders": "int64"})


QUERIES["order_size_histogram"] = order_size_histogram
ORACLES["order_size_histogram"] = """
    WITH per AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n
                 FROM lineitem GROUP BY l_orderkey)
    SELECT n AS n_lines, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM per GROUP BY n ORDER BY n_lines
"""


def supplier_late_rates(sf_dir: str, late_days: int = 60,
                        num_buckets: int = 64) -> pd.DataFrame:
    """Per-SUPPLIER late-shipment rates (the vendor scorecard): 'late'
    needs the order date, so lineitem crosses the single orderkey
    exchange as (okey, suppkey, shipdate) rows; each bucket joins by
    searchsorted and collapses straight to (suppkey, n_late, n_total)
    partials — supplier cardinality is dimension-bounded, so the
    driver fold is result-sized. Rates ship as exact integer pairs."""
    from ..stages.dedup import _splitmix64 as _mix64

    US_DAY = np.int64(86_400_000_000)
    CUT = np.int64(late_days) * US_DAY

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def li_rows(t: pa.Table) -> pa.Table:
        k = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "k": pa.array(k),
            "s": t.column("l_suppkey"),
            "v": pc.cast(t.column("l_shipdate"), pa.int64()),
            "side": pa.array(np.zeros(len(k), dtype=np.int8)),
            "__b": pa.array((_mix64(k.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def o_rows(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "k": pa.array(k),
            "s": pa.array(np.zeros(len(k), dtype=np.int64)),
            "v": pc.cast(t.column("o_orderdate"), pa.int64()),
            "side": pa.array(np.ones(len(k), dtype=np.int8)),
            "__b": pa.array((_mix64(k.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def rates(g: pd.DataFrame) -> pd.DataFrame:
        side = g["side"].to_numpy(dtype=np.int8)
        lm, om = side == 0, side == 1
        ok = g["k"].to_numpy(dtype=np.int64)[om]
        oo = np.argsort(ok, kind="stable")
        ok = ok[oo]
        od = g["v"].to_numpy(dtype=np.int64)[om][oo]
        lk = g["k"].to_numpy(dtype=np.int64)[lm]
        if not len(ok) or not len(lk):
            return pd.DataFrame({"s": pd.Series([], dtype="int64"),
                                 "late": pd.Series([], dtype="int64"),
                                 "total": pd.Series([], dtype="int64")})
        ls = g["s"].to_numpy(dtype=np.int64)[lm]
        lv = g["v"].to_numpy(dtype=np.int64)[lm]
        pos = np.searchsorted(ok, lk)
        pos_c = np.minimum(pos, len(ok) - 1)
        hit = ok[pos_c] == lk
        s = ls[hit]
        late = (lv[hit] - od[pos_c][hit] > CUT).astype(np.int64)
        us, inv = np.unique(s, return_inverse=True)
        tot = np.bincount(inv).astype(np.int64)
        nl = np.bincount(inv, weights=late).astype(np.int64)
        return pd.DataFrame({"s": us, "late": nl, "total": tot})

    parts = li.map_batches(li_rows, batch_format="pyarrow") \
        .union(orders.map_batches(o_rows, batch_format="pyarrow")) \
        .groupby("__b").map_groups(rates, batch_format="pandas") \
        .to_pandas()
    agg = parts.groupby("s", as_index=False)[["late", "total"]].sum()
    return agg.rename(columns={"s": "l_suppkey", "late": "n_late",
                               "total": "n_lines"}) \
        .sort_values("l_suppkey").reset_index(drop=True) \
        .astype({"l_suppkey": "int64", "n_late": "int64",
                 "n_lines": "int64"})


QUERIES["supplier_late_rates"] = supplier_late_rates
ORACLES["supplier_late_rates"] = """
    SELECT l_suppkey,
           CAST(SUM(CASE WHEN l_shipdate - o_orderdate > INTERVAL 60 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_suppkey ORDER BY l_suppkey
"""


def median_customer_aov(sf_dir: str, num_buckets: int = 64
                        ) -> pd.DataFrame:
    """Median of per-GROUP averages — the two-level statistic (median
    customer AOV) whose inner value is a FRACTION: exact median-of-
    ratios needs cross-multiplied comparisons, so both engines instead
    use the identical floor-scaled average aov = (100·Σcents) // n
    (hundredths of a cent — deterministic, no float), and the median
    over the customer-bounded table follows the quantile_disc
    convention. Per-customer (Σ, n) through one custkey exchange;
    the driver sees one int per customer."""
    from ..stages.dedup import _splitmix64 as _mix64

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        c = t.column("o_custkey").to_numpy(zero_copy_only=False)
        s = _cents(t.column("o_totalprice")).to_numpy(zero_copy_only=False)
        uc, inv = np.unique(c, return_inverse=True)
        ss = np.zeros(len(uc), dtype=np.int64)
        np.add.at(ss, inv, s)
        n = np.bincount(inv).astype(np.int64)
        return pa.table({
            "c": pa.array(uc), "s": pa.array(ss), "n": pa.array(n),
            "__b": pa.array((_mix64(uc.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def aov(g: pd.DataFrame) -> pd.DataFrame:
        c = g["c"].to_numpy(dtype=np.int64)
        s = g["s"].to_numpy(dtype=np.int64)
        n = g["n"].to_numpy(dtype=np.int64)
        order = np.argsort(c, kind="stable")
        c, s, n = c[order], s[order], n[order]
        starts = np.r_[0, np.flatnonzero(c[1:] != c[:-1]) + 1]
        ss = np.add.reduceat(s, starts)
        nn = np.add.reduceat(n, starts)
        return pd.DataFrame({"a": (100 * ss) // nn})

    p = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("__b").map_groups(aov, batch_format="pandas").to_pandas()
    a = np.sort(p["a"].to_numpy(dtype=np.int64))
    n = len(a)
    k = -(-50 * n // 100) - 1
    return _one_row(n_customers=np.int64(n),
                    median_aov_x100=np.int64(int(a[k])))


QUERIES["median_customer_aov"] = median_customer_aov
ORACLES["median_customer_aov"] = """
    WITH per AS (
      SELECT o_custkey,
             (100 * CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT))
                    AS BIGINT)) // CAST(COUNT(*) AS BIGINT) AS a
      FROM orders GROUP BY o_custkey)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(quantile_disc(a, 0.5) AS BIGINT) AS median_aov_x100
    FROM per
"""


def ivf_recall_curve(sf_dir: str, k: int = 10, n_queries: int = 6
                     ) -> pd.DataFrame:
    """ANN EVALUATION harness — recall@k of the IVF index versus brute
    force at every nprobe level: the measurement that justifies (or
    vetoes) an approximate index before it touches production. Ground
    truth comes from `brute_force_topk` over the same quantized
    queries (the corpus's own first ``n_queries`` vectors — exact
    self-match included, which any sane index must recall); the curve
    must be monotone in nprobe and reach 1.0 at exhaustive probe,
    both asserted in pytest. Deterministic end to end (seeded k-means
    on a driver sample, hash-free scoring)."""
    import tempfile

    from ..stages.similarity import IVFIndex, brute_force_topk

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    head = ds.take_batch(n_queries, batch_format="pyarrow")
    qs = np.stack([np.asarray(v.as_py(), dtype=np.float64)
                   for v in head["embedding"]])

    idx_dir = os.path.join(tempfile.gettempdir(), "raysketch_data",
                           f"ivf_{sf_of(sf_dir)}")
    if os.path.exists(os.path.join(idx_dir, "centroids.npy")):
        idx = IVFIndex.load(idx_dir)
    else:
        idx = IVFIndex(idx_dir, n_centroids=8).build(ds, sample_size=256)

    truth = brute_force_topk(ds, qs, k=k)
    gt = {int(q): set(truth[truth["query_idx"] == q]["vec_id"]
                      .to_numpy(dtype=np.int64))
          for q in range(len(qs))}

    rows = []
    nprobe = 1
    while nprobe <= idx.ncent:
        hit = 0
        for qi in range(len(qs)):
            got = set(idx.search(qs[qi], k=k, nprobe=nprobe)["vec_id"]
                      .to_numpy(dtype=np.int64))
            hit += len(got & gt[qi])
        rows.append({"nprobe": np.int64(nprobe),
                     "n_hits": np.int64(hit),
                     "n_truth": np.int64(k * len(qs))})
        nprobe *= 2
    return pd.DataFrame(rows).astype({"nprobe": "int64",
                                      "n_hits": "int64",
                                      "n_truth": "int64"})


QUERIES["ivf_recall_curve"] = ivf_recall_curve


def types_seen_so_far(sf_dir: str, num_buckets: int = 64
                      ) -> pd.DataFrame:
    """Per-row CUMULATIVE DISTINCT count — for every event, how many
    distinct event types its user has produced up to and including it:
    the window COUNT(DISTINCT … ) OVER that SQL engines refuse to run,
    made exact here because the domain is bounded — each (user, type)
    has ONE first occurrence, so after the user-hash exchange a single
    sorted pass takes per-(user,type) first positions (unique on the
    packed key) and each row's answer is 'how many of my user's five
    first-positions are ≤ mine' — five searchsorted-free gathers, no
    per-row loop. The SQL twin joins each event against the (user,
    type, MIN order-rank) table."""
    from ..stages.dedup import _splitmix64 as _mix64

    TYPES = ["click", "error", "purchase", "signup", "view"]
    NT = np.int64(len(TYPES))

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column("event_type"), value_set=pa.array(TYPES))
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "u": pa.array(u),
            "tu": pc.cast(t.column("ts"), pa.int64()),
            "e": t.column("event_id"),
            "g": pc.cast(idx, pa.int8()),
            "__b": pa.array((_mix64(u.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def seen(gd: pd.DataFrame) -> pd.DataFrame:
        u = gd["u"].to_numpy(dtype=np.int64)
        tu = gd["tu"].to_numpy(dtype=np.int64)
        e = gd["e"].to_numpy(dtype=np.int64)
        g = gd["g"].to_numpy(dtype=np.int64)
        order = np.lexsort((e, tu, u))
        u, tu, e, g = u[order], tu[order], e[order], g[order]
        n = len(u)
        if not n:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "n_types_seen": pd.Series([], dtype="int64")})
        idx = np.arange(n, dtype=np.int64)
        # first position of each (user, type)
        key = u * NT + g
        uk, first = np.unique(key, return_index=True)
        # per-user table of 5 first-positions (sentinel: after end)
        uu = np.unique(u)
        fp = np.full((len(uu), int(NT)), n, dtype=np.int64)
        urow = np.searchsorted(uu, uk // NT)
        fp[urow, (uk % NT)] = first
        row_of = np.searchsorted(uu, u)
        cnt = (fp[row_of] <= idx[:, None]).sum(axis=1).astype(np.int64)
        return pd.DataFrame({"event_id": e, "n_types_seen": cnt})

    out = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("__b").map_groups(seen, batch_format="pandas") \
        .to_pandas()
    return out.sort_values("event_id").reset_index(drop=True) \
        .astype({"event_id": "int64", "n_types_seen": "int64"})


QUERIES["types_seen_so_far"] = types_seen_so_far
ORACLES["types_seen_so_far"] = """
    WITH r AS (
      SELECT user_id, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events),
    f AS (SELECT user_id, event_type, MIN(rn) AS first_rn
          FROM r GROUP BY user_id, event_type)
    SELECT r.event_id,
           CAST(COUNT(*) AS BIGINT) AS n_types_seen
    FROM r JOIN f ON f.user_id = r.user_id AND f.first_rn <= r.rn
    GROUP BY r.event_id ORDER BY r.event_id
"""


def id_gaps_events(sf_dir: str, num_buckets: int = 256) -> pd.DataFrame:
    """Sequence-integrity audit — does the event_id space have holes
    or duplicates? (the ingestion check that catches dropped batches
    and replays): min/max/count fold zero-shuffle; exact distinct
    count via per-batch dedup + one small bucket exchange; missing =
    span − distinct, duplicated rows = count − distinct. All integer,
    all one pass over an 8-byte column."""
    from ..stages.dedup import _splitmix64 as _mix64

    ds = _read(sf_dir, "events", columns=["event_id"])

    def minmax(t: pa.Table) -> pa.Table:
        e = t.column("event_id").to_numpy(zero_copy_only=False)
        return pa.table({"lo": pa.array([int(e.min()) if len(e) else 0]),
                         "hi": pa.array([int(e.max()) if len(e) else 0]),
                         "n": pa.array([len(e)])})

    meta = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    meta = meta[meta["n"] > 0]
    lo, hi = int(meta["lo"].min()), int(meta["hi"].max())
    total = int(meta["n"].sum())

    def keys(t: pa.Table) -> pa.Table:
        k = np.unique(t.column("event_id").to_numpy(zero_copy_only=False))
        return pa.table({
            "k": pa.array(k),
            "__b": pa.array((_mix64(k.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def nuniq(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [int(g["k"].nunique())]})

    d = ds.map_batches(keys, batch_format="pyarrow") \
        .groupby("__b").map_groups(nuniq, batch_format="pandas") \
        .to_pandas()
    distinct = int(d["n"].sum())
    return _one_row(min_id=np.int64(lo), max_id=np.int64(hi),
                    n_rows=np.int64(total),
                    n_missing=np.int64(hi - lo + 1 - distinct),
                    n_dup_rows=np.int64(total - distinct))


QUERIES["id_gaps_events"] = id_gaps_events
ORACLES["id_gaps_events"] = """
    SELECT CAST(MIN(event_id) AS BIGINT) AS min_id,
           CAST(MAX(event_id) AS BIGINT) AS max_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MAX(event_id) - MIN(event_id) + 1
                - COUNT(DISTINCT event_id) AS BIGINT) AS n_missing,
           CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT)
             AS n_dup_rows
    FROM events
"""


def word_length_by_source(sf_dir: str) -> pd.DataFrame:
    """Average word length per source, as the exact (Σ word chars,
    n words) pair — the text-profiling statistic behind tokenizer
    fertility estimates: per-batch Arrow split + flatten + utf8_length
    with a repeat-encoded source gather; zero shuffle, ≤sources
    partials per batch."""
    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def partial(t: pa.Table) -> pd.DataFrame:
        w = pc.split_pattern(
            pc.fill_null(t.column("text"), ""), " ").combine_chunks()
        cnt = pc.list_value_length(w).to_numpy(zero_copy_only=False)
        lens = pc.utf8_length(w.flatten()).to_numpy(zero_copy_only=False)
        src = np.repeat(t.column("source").to_numpy(zero_copy_only=False),
                        cnt)
        df = pd.DataFrame({"source": src, "chars": lens})
        agg = df.groupby("source", as_index=False) \
            .agg(n_words=("chars", "size"), sum_chars=("chars", "sum"))
        return agg

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = p.groupby("source", as_index=False)[["n_words", "sum_chars"]] \
        .sum()
    return agg.sort_values("source").reset_index(drop=True) \
        .astype({"n_words": "int64", "sum_chars": "int64"})


QUERIES["word_length_by_source"] = word_length_by_source
ORACLES["word_length_by_source"] = """
    WITH w AS (SELECT source, unnest(string_split(text, ' ')) AS word
               FROM documents)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(length(word)) AS BIGINT) AS sum_chars
    FROM w GROUP BY source ORDER BY source
"""


def trimmed_mean_price(sf_dir: str, trim_pct: int = 5,
                       num_bins: int = 8192) -> pd.DataFrame:
    """EXACT two-sided trimmed mean (drop the lowest and highest 5% of
    ROWS, sum the rest) — the robust location estimate between mean
    and median, with the boundary handled TIE-CORRECTLY: trimming
    m = n·5//100 rows means the m-th order statistic's value may be
    only PARTIALLY trimmed, so sum_trimmed_low = Σ(v < v_m) +
    (m − count(v < v_m))·v_m — every term exact from the histogram-
    percentile machinery (min/max pass, nonzero-bin partials, one
    filtered gather for the two boundary bins) plus a three-integer
    conditional-sum pass. Output (n_kept, sum_kept_cents); SQL states
    the identical row-rank trim via ROW_NUMBER."""
    import ray

    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])

    def vals(t: pa.Table) -> np.ndarray:
        return _cents(t.column("l_extendedprice")).to_numpy(zero_copy_only=False)

    def minmax(t: pa.Table) -> pa.Table:
        v = vals(t)
        return pa.table({"lo": pa.array([int(v.min()) if len(v) else 0]),
                         "hi": pa.array([int(v.max()) if len(v) else 0]),
                         "n": pa.array([len(v)]),
                         "s": pa.array([int(v.sum())])})

    meta = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    meta = meta[meta["n"] > 0]
    lo, hi = int(meta["lo"].min()), int(meta["hi"].max())
    n = int(meta["n"].sum())
    total = int(meta["s"].sum())
    width = hi - lo + 1
    m = n * trim_pct // 100

    def hist(t: pa.Table) -> pa.Table:
        v = vals(t)
        b = (v - lo) * np.int64(num_bins) // np.int64(width)
        ub, cnt = np.unique(b, return_counts=True)
        return pa.table({"bin": pa.array(ub),
                         "cnt": pa.array(cnt.astype(np.int64))})

    parts = ds.map_batches(hist, batch_format="pyarrow").to_pandas()
    bins = np.zeros(num_bins, dtype=np.int64)
    np.add.at(bins, parts["bin"].to_numpy(dtype=np.int64),
              parts["cnt"].to_numpy(dtype=np.int64))
    cum = np.cumsum(bins)
    # order statistics at k = m-1 (m-th lowest) and n-m (m-th highest)
    ks = np.array([m - 1, n - m], dtype=np.int64)
    tb = np.searchsorted(cum, ks, side="right")
    before = np.r_[0, cum][tb]
    ref = ray.put(np.unique(tb))

    def gather(t: pa.Table) -> pa.Table:
        want = ray.get(ref)
        v = vals(t)
        b = (v - lo) * np.int64(num_bins) // np.int64(width)
        keep = np.isin(b, want)
        return pa.table({"v": pa.array(v[keep]), "b": pa.array(b[keep])})

    got = ds.map_batches(gather, batch_format="pyarrow").to_pandas()
    gv = got["v"].to_numpy(dtype=np.int64)
    gb = got["b"].to_numpy(dtype=np.int64)
    bound = []
    for k, t_, bef in zip(ks, tb, before):
        inbin = np.sort(gv[gb == t_])
        bound.append(int(inbin[k - bef]))
    v_lo, v_hi = bound  # m-th lowest value, m-th highest value

    def cond(t: pa.Table) -> pa.Table:
        v = vals(t)
        return pa.table({
            "s_below": pa.array([int(v[v < v_lo].sum())]),
            "c_below": pa.array([int((v < v_lo).sum())]),
            "s_above": pa.array([int(v[v > v_hi].sum())]),
            "c_above": pa.array([int((v > v_hi).sum())]),
        })

    c = ds.map_batches(cond, batch_format="pyarrow").to_pandas()
    s_below, c_below = int(c["s_below"].sum()), int(c["c_below"].sum())
    s_above, c_above = int(c["s_above"].sum()), int(c["c_above"].sum())
    low_trim = s_below + (m - c_below) * v_lo
    high_trim = s_above + (m - c_above) * v_hi
    return _one_row(n_kept=np.int64(n - 2 * m),
                    sum_kept_cents=np.int64(total - low_trim - high_trim))


QUERIES["trimmed_mean_price"] = trimmed_mean_price
ORACLES["trimmed_mean_price"] = """
    WITH v AS (SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT) AS c
               FROM lineitem),
    r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS rn,
                 COUNT(*) OVER () AS n FROM v)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(c) AS BIGINT) AS sum_kept_cents
    FROM r
    WHERE rn > n * 5 // 100 AND rn <= n - n * 5 // 100
"""


def spiky_customers(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """SELF-relative outlier groups — customers whose single largest
    order exceeds twice their own average (spend spikes, not absolute
    size): the per-group predicate n·max > 2·Σ is evaluated by integer
    cross-multiplication so no division can flip a boundary; per-batch
    (Σ, n, max) combiner partials, one custkey exchange, buckets fold
    partials (sum-sum, max-max) and emit only qualifying customers.
    Needs ≥2 orders or the max trivially equals the sum."""
    from ..stages.dedup import _splitmix64 as _mix64

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        c = t.column("o_custkey").to_numpy(zero_copy_only=False)
        s = _cents(t.column("o_totalprice")).to_numpy(zero_copy_only=False)
        uc, inv = np.unique(c, return_inverse=True)
        ss = np.zeros(len(uc), dtype=np.int64)
        np.add.at(ss, inv, s)
        mx = np.full(len(uc), -1, dtype=np.int64)
        np.maximum.at(mx, inv, s)
        n = np.bincount(inv).astype(np.int64)
        return pa.table({
            "c": pa.array(uc), "s": pa.array(ss), "n": pa.array(n),
            "m": pa.array(mx),
            "__b": pa.array((_mix64(uc.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def keep(g: pd.DataFrame) -> pd.DataFrame:
        c = g["c"].to_numpy(dtype=np.int64)
        s = g["s"].to_numpy(dtype=np.int64)
        n = g["n"].to_numpy(dtype=np.int64)
        m = g["m"].to_numpy(dtype=np.int64)
        order = np.argsort(c, kind="stable")
        c, s, n, m = c[order], s[order], n[order], m[order]
        starts = np.r_[0, np.flatnonzero(c[1:] != c[:-1]) + 1]
        cc = c[starts]
        ss = np.add.reduceat(s, starts)
        nn = np.add.reduceat(n, starts)
        mm = np.maximum.reduceat(m, starts)
        ok = (nn >= 2) & (nn * mm > 2 * ss)
        return pd.DataFrame({"o_custkey": cc[ok], "n_orders": nn[ok],
                             "sum_cents": ss[ok], "max_cents": mm[ok]})

    out = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("__b").map_groups(keep, batch_format="pandas") \
        .to_pandas()
    return out.sort_values("o_custkey").reset_index(drop=True) \
        .astype({"o_custkey": "int64", "n_orders": "int64",
                 "sum_cents": "int64", "max_cents": "int64"})


QUERIES["spiky_customers"] = spiky_customers
ORACLES["spiky_customers"] = """
    WITH per AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
               AS sum_cents,
             CAST(MAX(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
               AS max_cents
      FROM orders GROUP BY o_custkey)
    SELECT o_custkey, n_orders, sum_cents, max_cents
    FROM per
    WHERE n_orders >= 2 AND n_orders * max_cents > 2 * sum_cents
    ORDER BY o_custkey
"""


def ttr_docs(sf_dir: str) -> pd.DataFrame:
    """Type-token ratio per document — lexical diversity, the
    quality-filter signal between repetition stats and novelty
    scoring: exact (n_distinct_words, n_words) pair per doc, computed
    zero-shuffle per batch (whole docs per row) via one lexsort over
    (doc, word) and boundary counting; the ratio stays the caller's
    division."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def ttr(t: pa.Table) -> pd.DataFrame:
        w = pc.split_pattern(
            pc.fill_null(t.column("text"), ""), " ").combine_chunks()
        cnt = pc.list_value_length(w).to_numpy(zero_copy_only=False)
        flat = w.flatten().to_numpy(zero_copy_only=False)
        doc = np.repeat(t.column("doc_id").to_numpy(zero_copy_only=False),
                        cnt)
        order = np.lexsort((flat, doc))
        doc_s, flat_s = doc[order], flat[order]
        new_pair = np.r_[True, (doc_s[1:] != doc_s[:-1])
                         | (flat_s[1:] != flat_s[:-1])]
        ud, inv = np.unique(doc_s, return_inverse=True)
        dis = np.bincount(inv, weights=new_pair.astype(np.int64)) \
            .astype(np.int64)
        tot = np.bincount(inv).astype(np.int64)
        return pd.DataFrame({"doc_id": ud, "n_distinct_words": dis,
                             "n_words": tot})

    out = ds.map_batches(ttr, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True) \
        .astype({"doc_id": "int64", "n_distinct_words": "int64",
                 "n_words": "int64"})


QUERIES["ttr_docs"] = ttr_docs
ORACLES["ttr_docs"] = """
    WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
               FROM documents)
    SELECT doc_id,
           CAST(COUNT(DISTINCT word) AS BIGINT) AS n_distinct_words,
           CAST(COUNT(*) AS BIGINT) AS n_words
    FROM w GROUP BY doc_id ORDER BY doc_id
"""


def longest_same_type_run(sf_dir: str, num_buckets: int = 64
                          ) -> pd.DataFrame:
    """Longest CONSECUTIVE same-type run per user — gaps-and-islands
    over a CATEGORICAL sequence (`longest_streak_by_user` runs over
    calendar days; this runs over the event order itself — the
    repetitive-behavior detector): one user-hash exchange, one
    lexsort, run boundaries = new-user OR type-change, per-user max by
    maximum.reduceat; output carries the run's type with a
    deterministic (len desc, type asc) tiebreak stated in SQL."""
    from ..stages.dedup import _splitmix64 as _mix64

    TYPES = ["click", "error", "purchase", "signup", "view"]

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column("event_type"), value_set=pa.array(TYPES))
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "u": pa.array(u),
            "tu": pc.cast(t.column("ts"), pa.int64()),
            "e": t.column("event_id"),
            "g": pc.cast(idx, pa.int8()),
            "__b": pa.array((_mix64(u.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def runs(gd: pd.DataFrame) -> pd.DataFrame:
        u = gd["u"].to_numpy(dtype=np.int64)
        tu = gd["tu"].to_numpy(dtype=np.int64)
        e = gd["e"].to_numpy(dtype=np.int64)
        g = gd["g"].to_numpy(dtype=np.int64)
        order = np.lexsort((e, tu, u))
        u, g = u[order], g[order]
        n = len(u)
        if not n:
            return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                                 "run_type": pd.Series([], dtype="object"),
                                 "run_len": pd.Series([], dtype="int64")})
        new = np.r_[True, (u[1:] != u[:-1]) | (g[1:] != g[:-1])]
        starts = np.flatnonzero(new)
        rlen = np.diff(np.r_[starts, n]).astype(np.int64)
        ru, rg = u[starts], g[starts]
        # winner per user: (len desc, type asc)
        win = np.lexsort((rg, -rlen, ru))
        ru, rg, rlen = ru[win], rg[win], rlen[win]
        head = np.r_[True, ru[1:] != ru[:-1]]
        lab = np.array(TYPES, dtype=object)
        return pd.DataFrame({"user_id": ru[head],
                             "run_type": lab[rg[head]],
                             "run_len": rlen[head]})

    out = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("__b").map_groups(runs, batch_format="pandas") \
        .to_pandas()
    return out.sort_values("user_id").reset_index(drop=True) \
        .astype({"user_id": "int64", "run_len": "int64"})


QUERIES["longest_same_type_run"] = longest_same_type_run
ORACLES["longest_same_type_run"] = """
    WITH r AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id)
             - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS grp
      FROM events),
    runs AS (SELECT user_id, event_type,
                    CAST(COUNT(*) AS BIGINT) AS run_len
             FROM r GROUP BY user_id, event_type, grp),
    best AS (SELECT user_id, event_type AS run_type, run_len,
                    ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY run_len DESC,
                                                event_type) AS rn
             FROM runs)
    SELECT user_id, run_type, run_len FROM best
    WHERE rn = 1 ORDER BY user_id
"""


def export_split_partitions(sf_dir: str) -> pd.DataFrame:
    """WRITE-path coverage, oracle-checked: documents export to
    hive-partitioned parquet by train/val/test split (the resumable
    layout the 100 TB contract demands — a failed run skips finished
    partitions), then the partitions READ BACK and re-count; the
    oracle recomputes the same (split, n, chars) from SQL, so the
    value hash certifies the full write→read round trip, not just the
    transform."""
    import tempfile

    import ray.data

    K = np.int64(2654435761)

    out_dir = os.path.join(tempfile.gettempdir(), "raysketch_data",
                           f"split_export_{sf_of(sf_dir)}")

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "source", "n_chars"])

    def assign(t: pa.Table) -> pa.Table:
        k = t.column("doc_id").to_numpy(zero_copy_only=False)
        h = ((k * K) % np.int64(1_000_000_007)) % np.int64(100)
        split = np.where(h < 80, "train",
                         np.where(h < 90, "val", "test"))
        return t.append_column("split", pa.array(split))

    done = os.path.join(out_dir, "_done")
    if not os.path.exists(done):
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
        ds.map_batches(assign, batch_format="pyarrow") \
            .write_parquet(out_dir, partition_cols=["split"])
        open(done, "w").write("ok")

    back = ray.data.read_parquet(out_dir)

    def counts(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "split": np.asarray(t.column("split").to_pandas(), dtype=object),
            "chars": t.column("n_chars").to_numpy(zero_copy_only=False),
        })
        return df.groupby("split", as_index=False) \
            .agg(n=("chars", "size"), chars=("chars", "sum"))

    p = back.map_batches(counts, batch_format="pyarrow").to_pandas()
    agg = p.groupby("split", as_index=False)[["n", "chars"]].sum()
    return agg.sort_values("split").reset_index(drop=True) \
        .astype({"n": "int64", "chars": "int64"})


QUERIES["export_split_partitions"] = export_split_partitions
ORACLES["export_split_partitions"] = """
    WITH a AS (
      SELECT n_chars,
             CASE WHEN ((doc_id * 2654435761) % 1000000007) % 100 < 80
                  THEN 'train'
                  WHEN ((doc_id * 2654435761) % 1000000007) % 100 < 90
                  THEN 'val' ELSE 'test' END AS split
      FROM documents)
    SELECT split, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM a GROUP BY split ORDER BY split
"""


def _lev_pairs(M: np.ndarray, L: np.ndarray, ia: np.ndarray,
               ib: np.ndarray, max_dist: int):
    """Vectorized Levenshtein for index pairs into the padded byte
    matrix ``M`` / length vector ``L``: the DP recurrence loops over
    the two word lengths only, every pair's lattice cell updated as one
    numpy op across the whole pair batch. Pairs with ``|la−lb| >
    max_dist`` are pre-dropped (distance ≥ length gap). Returns the
    (ia, ib, dist) triplets with dist ≤ max_dist."""
    la, lb = L[ia], L[ib]
    cand = np.abs(la - lb) <= max_dist
    ia, ib, la, lb = ia[cand], ib[cand], la[cand], lb[cand]
    P = len(ia)
    if P == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z
    A, B = M[ia], M[ib]
    ml = int(max(la.max(), lb.max()))
    prev = np.tile(np.arange(ml + 1, dtype=np.int64), (P, 1))
    for i in range(1, ml + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        valid_i = i <= la
        for j in range(1, ml + 1):
            sub = prev[:, j - 1] + (A[:, i - 1] != B[:, j - 1])
            ins = cur[:, j - 1] + 1
            dele = prev[:, j] + 1
            cur[:, j] = np.minimum(np.minimum(ins, dele), sub)
        prev = np.where(valid_i[:, None], cur, prev)
    d = prev[np.arange(P), lb]
    keep = d <= max_dist
    return ia[keep], ib[keep], d[keep]


def _dl_pairs(M: np.ndarray, L: np.ndarray, ia: np.ndarray,
              ib: np.ndarray, max_dist: int, chunk: int = 8192):
    """Vectorized UNRESTRICTED Damerau–Levenshtein (true DL, matching
    DuckDB's damerau_levenshtein: 'CA'→'ABC' is 2, where the restricted
    OSA variant says 3) for index pairs into the padded byte matrix.
    Two provable pre-filters run first — length gap (every edit changes
    length by ≤1) and BAG distance max(|bag(a)−bag(b)|) (substitutions/
    inserts/deletes change the char multiset by ≤1 each, transpositions
    by 0, so bag ≤ DL) — then the full da/db-table DP (Lowrance &
    Wagner '75) evaluates survivors in bounded-memory chunks: the
    (P, ml+2, ml+2) lattice holds ≤`chunk` pairs, every cell update is
    one numpy op across the chunk, and the transposition term's
    (k−1, l−1) lookup is a per-pair 2-D gather. Pad bytes are 0 and the
    corpus is NUL-free, so da/db updates from beyond a word's real
    length can only be read by equally-invalid cells — no masking
    needed (answer reads at (la, lb))."""
    la, lb = L[ia], L[ib]
    cand = np.abs(la - lb) <= max_dist
    ia, ib = ia[cand], ib[cand]
    if len(ia):
        # bag filter: per-pair char-count L1 split into +/− parts
        cnts = np.zeros((M.shape[0], 256), dtype=np.int16)
        rows = np.repeat(np.arange(M.shape[0]), (M != 0).sum(axis=1))
        np.add.at(cnts, (rows, M[M != 0]), 1)
        diff = cnts[ia].astype(np.int32) - cnts[ib]
        bag = np.maximum(np.clip(diff, 0, None).sum(axis=1),
                         np.clip(-diff, 0, None).sum(axis=1))
        keep = bag <= max_dist
        ia, ib = ia[keep], ib[keep]
    oa, ob, od = [], [], []
    for s in range(0, len(ia), chunk):
        ca, cb = ia[s:s + chunk], ib[s:s + chunk]
        P = len(ca)
        A, B = M[ca], M[cb]
        lA, lB = L[ca], L[cb]
        ml = int(max(lA.max(), lB.max()))
        big = np.int64(2 * ml + 5)
        # D index offset +1: D[:,0,:] / D[:,:,0] is the "-1" border
        D = np.full((P, ml + 2, ml + 2), big, dtype=np.int64)
        D[:, 1, 1:] = np.arange(ml + 1, dtype=np.int64)
        D[:, 1:, 1] = np.arange(ml + 1, dtype=np.int64)
        da = np.zeros((P, 256), dtype=np.int64)
        pidx = np.arange(P)
        for i in range(1, ml + 1):
            db = np.zeros(P, dtype=np.int64)
            a_i = A[:, i - 1].astype(np.int64)
            for j in range(1, ml + 1):
                b_j = B[:, j - 1].astype(np.int64)
                k = da[pidx, b_j]
                l = db
                match = a_i == b_j
                db = np.where(match, j, db)
                sub = D[:, i, j] + (~match)
                ins = D[:, i + 1, j] + 1
                dele = D[:, i, j + 1] + 1
                trans = D[pidx, k, l] + (i - k - 1) + 1 + (j - l - 1)
                D[:, i + 1, j + 1] = np.minimum(
                    np.minimum(sub, trans), np.minimum(ins, dele))
            da[pidx, a_i] = i
        d = D[pidx, lA + 1, lB + 1]
        m = d <= max_dist
        oa.append(ca[m])
        ob.append(cb[m])
        od.append(d[m])
    if not oa:
        z = np.empty(0, dtype=np.int64)
        return z, z, z
    return np.concatenate(oa), np.concatenate(ob), np.concatenate(od)


def vocab_edit_distance_pairs(sf_dir: str, max_dist: int = 2,
                              num_buckets: int = 64,
                              block: int = 512) -> pd.DataFrame:
    """FUZZY string matching — vocabulary word pairs within Levenshtein
    distance 2 (the typo-clustering primitive behind spelling
    normalization): the vocabulary extracts distributed (per-batch
    distinct words, one word-hash dedup exchange — node-bounded like
    every graph vocabulary here); the O(|V|²) distance matrix is
    BLOCKED (VERDICT r02 item 6) — the padded byte matrix broadcasts
    once via ``ray.put`` and a dataset of (block_i, block_j) tile
    indices fans the vectorized DP (:func:`_lev_pairs`) out over
    map_batches, so no task (and never the driver) holds more than one
    ``block × block`` pair tile; only the ≤ max_dist survivors return.
    Exact integers, (a < b) canonical order (vocab is sorted, tiles
    have i < j)."""
    import ray
    import ray.data

    from ..stages.dedup import _splitmix64 as _mix64

    ds = _read(sf_dir, "documents", columns=["text"])

    def words(t: pa.Table) -> pa.Table:
        w = pc.unique(pc.list_flatten(pc.split_pattern(
            pc.fill_null(t.column("text"), ""), " ")))
        df = pd.DataFrame({"w": w.to_pandas()})
        h = pd.util.hash_pandas_object(df["w"], index=False).to_numpy()
        df["__b"] = (_mix64(h) % np.uint64(num_buckets)).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g[["w"]].drop_duplicates()

    vocab = sorted(ds.map_batches(words, batch_format="pyarrow")
                   .groupby("__b").map_groups(dedup, batch_format="pandas")
                   .to_pandas()["w"])
    V = len(vocab)
    # byte matrix (ASCII corpus), padded
    ml = max(len(w) for w in vocab)
    M = np.zeros((V, ml), dtype=np.uint8)
    L = np.zeros(V, dtype=np.int64)
    for i, w in enumerate(vocab):
        b = w.encode()
        M[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
        L[i] = len(b)
    ref = ray.put((M, L, np.array(vocab, dtype=object)))

    nb = (V + block - 1) // block
    tiles = [(bi, bj) for bi in range(nb) for bj in range(bi, nb)]
    tile_ds = ray.data.from_pandas(pd.DataFrame(
        {"bi": [t[0] for t in tiles], "bj": [t[1] for t in tiles]}))

    def work(t: pa.Table) -> pa.Table:
        Mb, Lb, wv = ray.get(ref)
        oa, ob, od = [], [], []
        for bi, bj in zip(t.column("bi").to_pylist(),
                          t.column("bj").to_pylist()):
            si, ei = bi * block, min((bi + 1) * block, V)
            sj, ej = bj * block, min((bj + 1) * block, V)
            if bi == bj:
                a, b = np.triu_indices(ei - si, k=1)
                ia, ib = a + si, b + si
            else:
                ia = np.repeat(np.arange(si, ei, dtype=np.int64), ej - sj)
                ib = np.tile(np.arange(sj, ej, dtype=np.int64), ei - si)
            ia, ib, d = _lev_pairs(Mb, Lb, ia, ib, max_dist)
            oa.append(wv[ia])
            ob.append(wv[ib])
            od.append(d)
        if not oa:
            return pa.table({"word_a": pa.array([], type=pa.string()),
                             "word_b": pa.array([], type=pa.string()),
                             "dist": pa.array([], type=pa.int64())})
        return pa.table({
            "word_a": pa.array(np.concatenate(oa), type=pa.string()),
            "word_b": pa.array(np.concatenate(ob), type=pa.string()),
            "dist": pa.array(np.concatenate(od).astype(np.int64)),
        })

    out = tile_ds.map_batches(work, batch_format="pyarrow",
                              batch_size=8).to_pandas()
    return out.sort_values(["word_a", "word_b"]).reset_index(drop=True) \
        .astype({"dist": "int64"})


QUERIES["vocab_edit_distance_pairs"] = vocab_edit_distance_pairs
ORACLES["vocab_edit_distance_pairs"] = """
    WITH v AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS w
               FROM documents)
    SELECT a.w AS word_a, b.w AS word_b,
           CAST(levenshtein(a.w, b.w) AS BIGINT) AS dist
    FROM v a JOIN v b ON a.w < b.w
    WHERE levenshtein(a.w, b.w) <= 2
    ORDER BY word_a, word_b
"""


def percentile_grid_price(sf_dir: str, num_bins: int = 8192
                          ) -> pd.DataFrame:
    """The FULL percentile grid (p1…p99) from the sort-free layout —
    the point is amortization: 99 order statistics cost the SAME two
    zero-shuffle passes plus ONE filtered gather as three did, because
    all 99 target bins gather together (~99·n/8192 rows total); a
    sort-based approach pays the all-to-all once regardless, but here
    the whole grid costs O(n/bins) extra. Same ⌈q·n⌉−1 convention,
    checked against DuckDB's list-form quantile_disc."""
    import ray

    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])

    def vals(t: pa.Table) -> np.ndarray:
        return _cents(t.column("l_extendedprice")).to_numpy(zero_copy_only=False)

    def minmax(t: pa.Table) -> pa.Table:
        v = vals(t)
        return pa.table({"lo": pa.array([int(v.min()) if len(v) else 0]),
                         "hi": pa.array([int(v.max()) if len(v) else 0]),
                         "n": pa.array([len(v)])})

    meta = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    meta = meta[meta["n"] > 0]
    lo, hi = int(meta["lo"].min()), int(meta["hi"].max())
    n = int(meta["n"].sum())
    width = hi - lo + 1

    def hist(t: pa.Table) -> pa.Table:
        v = vals(t)
        b = (v - lo) * np.int64(num_bins) // np.int64(width)
        ub, cnt = np.unique(b, return_counts=True)
        return pa.table({"bin": pa.array(ub),
                         "cnt": pa.array(cnt.astype(np.int64))})

    parts = ds.map_batches(hist, batch_format="pyarrow").to_pandas()
    bins = np.zeros(num_bins, dtype=np.int64)
    np.add.at(bins, parts["bin"].to_numpy(dtype=np.int64),
              parts["cnt"].to_numpy(dtype=np.int64))
    cum = np.cumsum(bins)
    ps = np.arange(1, 100, dtype=np.int64)
    ks = -(-ps * n // 100) - 1
    tb = np.searchsorted(cum, ks, side="right")
    before = np.r_[0, cum][tb]
    ref = ray.put(np.unique(tb))

    def gather(t: pa.Table) -> pa.Table:
        want = ray.get(ref)
        v = vals(t)
        b = (v - lo) * np.int64(num_bins) // np.int64(width)
        keep = np.isin(b, want)
        return pa.table({"v": pa.array(v[keep]), "b": pa.array(b[keep])})

    got = ds.map_batches(gather, batch_format="pyarrow").to_pandas()
    gv = got["v"].to_numpy(dtype=np.int64)
    gb = got["b"].to_numpy(dtype=np.int64)
    out = np.empty(len(ps), dtype=np.int64)
    for i, (k, t_, bef) in enumerate(zip(ks, tb, before)):
        inbin = np.sort(gv[gb == t_])
        out[i] = inbin[k - bef]
    return pd.DataFrame({"p": ps, "value_cents": out}) \
        .astype({"p": "int64", "value_cents": "int64"})


QUERIES["percentile_grid_price"] = percentile_grid_price
ORACLES["percentile_grid_price"] = """
    WITH q AS (
      SELECT quantile_disc(CAST(ROUND(l_extendedprice*100) AS BIGINT),
                           [x * 0.01 for x in range(1, 100)]) AS vs
      FROM lineitem)
    SELECT CAST(unnest(range(1, 100)) AS BIGINT) AS p,
           CAST(unnest(vs) AS BIGINT) AS value_cents
    FROM q
"""


def lineitem_corr_matrix(sf_dir: str) -> pd.DataFrame:
    """Full pairwise correlation MATRIX of lineitem's four measures in
    ONE zero-shuffle pass — the point is that adding columns to the
    moments fold is free (18 integers per batch instead of 6): every
    Σxᵢ, Σxᵢ², Σxᵢxⱼ is exact int64 (the price square splits hi/lo;
    quantity/discount/tax products are bounded), the driver folds
    Python ints and each of the 6 cells is one float expression
    mirrored in HUGEINT SQL — six bit-matched doubles from one scan."""
    import math

    COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    NAMES = ["qty", "price", "disc", "tax"]

    ds = _read(sf_dir, "lineitem", columns=COLS)

    def moments(t: pa.Table) -> pd.DataFrame:
        x = [(_cents(t.column(c)).to_numpy(zero_copy_only=False))
             for c in COLS]
        row = {"n": len(x[0])}
        for i in range(4):
            row[f"s{i}"] = int(x[i].sum())
        for i in range(4):
            for j in range(i, 4):
                p = x[i] * x[j]
                if i == j == 1:  # price² needs the split
                    row["pp_hi"] = int((p >> np.int64(32)).sum())
                    row["pp_lo"] = int((p & np.int64((1 << 32) - 1)).sum())
                else:
                    row[f"c{i}{j}"] = int(p.sum())
        return pd.DataFrame([row])

    p = ds.map_batches(moments, batch_format="pyarrow").to_pandas()
    n = int(p["n"].sum())
    s = [int(p[f"s{i}"].sum()) for i in range(4)]
    cc = {}
    for i in range(4):
        for j in range(i, 4):
            if i == j == 1:
                cc[(1, 1)] = (int(p["pp_hi"].sum()) << 32) \
                    + int(p["pp_lo"].sum())
            else:
                cc[(i, j)] = int(p[f"c{i}{j}"].sum())
    rows = []
    for i in range(4):
        for j in range(i + 1, 4):
            num = n * cc[(i, j)] - s[i] * s[j]
            vi = n * cc[(i, i)] - s[i] * s[i]
            vj = n * cc[(j, j)] - s[j] * s[j]
            rows.append({
                "col_a": NAMES[i], "col_b": NAMES[j],
                "corr": float(num) / math.sqrt(float(vi) * float(vj)),
            })
    return pd.DataFrame(rows).sort_values(["col_a", "col_b"]) \
        .reset_index(drop=True)


QUERIES["lineitem_corr_matrix"] = lineitem_corr_matrix
ORACLES["lineitem_corr_matrix"] = """
    WITH b AS (
      SELECT CAST(ROUND(l_quantity*100) AS BIGINT) AS x0,
             CAST(ROUND(l_extendedprice*100) AS BIGINT) AS x1,
             CAST(ROUND(l_discount*100) AS BIGINT) AS x2,
             CAST(ROUND(l_tax*100) AS BIGINT) AS x3
      FROM lineitem),
    m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                 CAST(SUM(x0) AS HUGEINT) AS s0,
                 CAST(SUM(x1) AS HUGEINT) AS s1,
                 CAST(SUM(x2) AS HUGEINT) AS s2,
                 CAST(SUM(x3) AS HUGEINT) AS s3,
                 SUM(CAST(x0 AS HUGEINT)*x0) AS c00,
                 SUM(CAST(x0 AS HUGEINT)*x1) AS c01,
                 SUM(CAST(x0 AS HUGEINT)*x2) AS c02,
                 SUM(CAST(x0 AS HUGEINT)*x3) AS c03,
                 SUM(CAST(x1 AS HUGEINT)*x1) AS c11,
                 SUM(CAST(x1 AS HUGEINT)*x2) AS c12,
                 SUM(CAST(x1 AS HUGEINT)*x3) AS c13,
                 SUM(CAST(x2 AS HUGEINT)*x2) AS c22,
                 SUM(CAST(x2 AS HUGEINT)*x3) AS c23,
                 SUM(CAST(x3 AS HUGEINT)*x3) AS c33
          FROM b),
    cells(col_a, col_b, num, vi, vj) AS (
      SELECT 'disc', 'tax',
             (SELECT CAST(n*c23 - s2*s3 AS DOUBLE) FROM m),
             (SELECT CAST(n*c22 - s2*s2 AS DOUBLE) FROM m),
             (SELECT CAST(n*c33 - s3*s3 AS DOUBLE) FROM m)
      UNION ALL SELECT 'price', 'disc',
             (SELECT CAST(n*c12 - s1*s2 AS DOUBLE) FROM m),
             (SELECT CAST(n*c11 - s1*s1 AS DOUBLE) FROM m),
             (SELECT CAST(n*c22 - s2*s2 AS DOUBLE) FROM m)
      UNION ALL SELECT 'price', 'tax',
             (SELECT CAST(n*c13 - s1*s3 AS DOUBLE) FROM m),
             (SELECT CAST(n*c11 - s1*s1 AS DOUBLE) FROM m),
             (SELECT CAST(n*c33 - s3*s3 AS DOUBLE) FROM m)
      UNION ALL SELECT 'qty', 'disc',
             (SELECT CAST(n*c02 - s0*s2 AS DOUBLE) FROM m),
             (SELECT CAST(n*c00 - s0*s0 AS DOUBLE) FROM m),
             (SELECT CAST(n*c22 - s2*s2 AS DOUBLE) FROM m)
      UNION ALL SELECT 'qty', 'price',
             (SELECT CAST(n*c01 - s0*s1 AS DOUBLE) FROM m),
             (SELECT CAST(n*c00 - s0*s0 AS DOUBLE) FROM m),
             (SELECT CAST(n*c11 - s1*s1 AS DOUBLE) FROM m)
      UNION ALL SELECT 'qty', 'tax',
             (SELECT CAST(n*c03 - s0*s3 AS DOUBLE) FROM m),
             (SELECT CAST(n*c00 - s0*s0 AS DOUBLE) FROM m),
             (SELECT CAST(n*c33 - s3*s3 AS DOUBLE) FROM m))
    SELECT col_a, col_b, num / SQRT(vi * vj) AS corr
    FROM cells ORDER BY col_a, col_b
"""


def fd_violations_lineitem(sf_dir: str, num_buckets: int = 256
                           ) -> pd.DataFrame:
    """Functional-dependency MINING — does l_orderkey determine
    l_suppkey / l_partkey / l_shipdate? (the schema-inference check
    that, with `fk_containment`, reconstructs a table's keys from the
    data alone): per-batch distinct (key, value-hash) pairs bound the
    exchange, each orderkey bucket counts keys with >1 distinct value
    per candidate column, and the driver folds three violation counts
    — an FD holds iff its count is 0. Values compare by exact column
    value (dates as µs), not a lossy hash."""
    from ..stages.dedup import _splitmix64 as _mix64

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_partkey",
                        "l_shipdate"])

    def pairs(t: pa.Table) -> pa.Table:
        k = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        cols = {
            0: t.column("l_suppkey").to_numpy(zero_copy_only=False),
            1: t.column("l_partkey").to_numpy(zero_copy_only=False),
            2: pc.cast(t.column("l_shipdate"), pa.int64())
                 .to_numpy(zero_copy_only=False),
        }
        out_k, out_c, out_v = [], [], []
        for ci, v in cols.items():
            # distinct (k, col, v) triples per batch, exact values
            df = pd.DataFrame({"k": k, "v": v}).drop_duplicates()
            out_k.append(df["k"].to_numpy(dtype=np.int64))
            out_c.append(np.full(len(df), ci, dtype=np.int64))
            out_v.append(df["v"].to_numpy(dtype=np.int64))
        kk = np.concatenate(out_k)
        cc = np.concatenate(out_c)
        vv = np.concatenate(out_v)
        return pa.table({
            "k": pa.array(kk), "c": pa.array(cc), "v": pa.array(vv),
            "__b": pa.array((_mix64(kk.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def count_viol(g: pd.DataFrame) -> pd.DataFrame:
        k = g["k"].to_numpy(dtype=np.int64)
        c = g["c"].to_numpy(dtype=np.int64)
        v = g["v"].to_numpy(dtype=np.int64)
        order = np.lexsort((v, c, k))
        k, c, v = k[order], c[order], v[order]
        newv = np.r_[True, (k[1:] != k[:-1]) | (c[1:] != c[:-1])
                     | (v[1:] != v[:-1])]
        k, c = k[newv], c[newv]
        # per (k, c): count distinct values; violation if >1
        starts = np.r_[0, np.flatnonzero((k[1:] != k[:-1])
                                         | (c[1:] != c[:-1])) + 1]
        cnt = np.diff(np.r_[starts, len(k)])
        viol_c = c[starts][cnt > 1]
        n = np.bincount(viol_c, minlength=3).astype(np.int64)
        return pd.DataFrame({"col": np.arange(3, dtype=np.int64),
                             "n": n})

    parts = li.map_batches(pairs, batch_format="pyarrow") \
        .groupby("__b").map_groups(count_viol, batch_format="pandas") \
        .to_pandas()
    agg = parts.groupby("col", as_index=False)["n"].sum()
    lab = np.array(["l_suppkey", "l_partkey", "l_shipdate"], dtype=object)
    return pd.DataFrame({
        "dependent": lab[agg["col"].to_numpy(dtype=np.int64)],
        "n_violating_keys": agg["n"].astype("int64"),
    }).sort_values("dependent").reset_index(drop=True)


QUERIES["fd_violations_lineitem"] = fd_violations_lineitem
ORACLES["fd_violations_lineitem"] = """
    SELECT 'l_partkey' AS dependent,
           CAST(COUNT(*) FILTER (WHERE c > 1) AS BIGINT)
             AS n_violating_keys
    FROM (SELECT l_orderkey, COUNT(DISTINCT l_partkey) AS c
          FROM lineitem GROUP BY l_orderkey)
    UNION ALL
    SELECT 'l_shipdate',
           CAST(COUNT(*) FILTER (WHERE c > 1) AS BIGINT)
    FROM (SELECT l_orderkey, COUNT(DISTINCT l_shipdate) AS c
          FROM lineitem GROUP BY l_orderkey)
    UNION ALL
    SELECT 'l_suppkey',
           CAST(COUNT(*) FILTER (WHERE c > 1) AS BIGINT)
    FROM (SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS c
          FROM lineitem GROUP BY l_orderkey)
    ORDER BY dependent
"""


def order_cadence_by_customer(sf_dir: str, num_buckets: int = 64
                              ) -> pd.DataFrame:
    """Purchase cadence per customer — (n gaps, Σ gap-days, min, max)
    over consecutive orders: the inter-purchase analog of the event
    LAG family, on the ORDERS table keyed by date with orderkey
    tiebreak; one custkey exchange, one lexsort forms every customer's
    gaps, reduceat folds all four statistics. Averages stay caller
    divisions of exact pairs; single-order customers drop out like
    the SQL's WHERE."""
    from ..stages.dedup import _splitmix64 as _mix64

    US_DAY = np.int64(86_400_000_000)

    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderkey", "o_orderdate"])

    def prep(t: pa.Table) -> pa.Table:
        c = t.column("o_custkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "c": pa.array(c),
            "d": pc.cast(t.column("o_orderdate"), pa.int64()),
            "k": t.column("o_orderkey"),
            "__b": pa.array((_mix64(c.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def cadence(g: pd.DataFrame) -> pd.DataFrame:
        c = g["c"].to_numpy(dtype=np.int64)
        d = g["d"].to_numpy(dtype=np.int64)
        k = g["k"].to_numpy(dtype=np.int64)
        order = np.lexsort((k, d, c))
        c, d = c[order], d[order]
        same = c[1:] == c[:-1]
        pu = c[:-1][same]
        if not len(pu):
            return pd.DataFrame({"o_custkey": pd.Series([], dtype="int64"),
                                 "n_gaps": pd.Series([], dtype="int64"),
                                 "sum_gap_days": pd.Series([], dtype="int64"),
                                 "min_gap_days": pd.Series([], dtype="int64"),
                                 "max_gap_days": pd.Series([], dtype="int64")})
        gap = ((d[1:] - d[:-1]) // US_DAY)[same]
        starts = np.r_[0, np.flatnonzero(pu[1:] != pu[:-1]) + 1]
        return pd.DataFrame({
            "o_custkey": pu[starts],
            "n_gaps": np.diff(np.r_[starts, len(pu)]).astype(np.int64),
            "sum_gap_days": np.add.reduceat(gap, starts),
            "min_gap_days": np.minimum.reduceat(gap, starts),
            "max_gap_days": np.maximum.reduceat(gap, starts),
        })

    out = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("__b").map_groups(cadence, batch_format="pandas") \
        .to_pandas()
    return out.sort_values("o_custkey").reset_index(drop=True) \
        .astype({c: "int64" for c in out.columns})


QUERIES["order_cadence_by_customer"] = order_cadence_by_customer
ORACLES["order_cadence_by_customer"] = """
    WITH g AS (
      SELECT o_custkey,
             (epoch_us(o_orderdate) - LAG(epoch_us(o_orderdate)) OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey)) // 86400000000 AS gap
      FROM orders)
    SELECT o_custkey,
           CAST(COUNT(gap) AS BIGINT) AS n_gaps,
           CAST(SUM(gap) AS BIGINT) AS sum_gap_days,
           CAST(MIN(gap) AS BIGINT) AS min_gap_days,
           CAST(MAX(gap) AS BIGINT) AS max_gap_days
    FROM g WHERE gap IS NOT NULL
    GROUP BY o_custkey ORDER BY o_custkey
"""


def top1pct_revenue_share(sf_dir: str, num_bins: int = 8192
                          ) -> pd.DataFrame:
    """Tail concentration — what share of lineitem revenue sits in the
    top 1% of rows by price, TIE-CORRECTLY: m = n//100 rows counted
    exactly even when ties straddle the cut (the trimmed-mean boundary
    algebra, one-sided): boundary value from the histogram gather,
    top-sum = Σ(v > v_b) + (m − count_above)·v_b; output the exact
    (top_sum, total_sum, m) triple."""
    import ray

    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])

    def vals(t: pa.Table) -> np.ndarray:
        return _cents(t.column("l_extendedprice")).to_numpy(zero_copy_only=False)

    def minmax(t: pa.Table) -> pa.Table:
        v = vals(t)
        return pa.table({"lo": pa.array([int(v.min()) if len(v) else 0]),
                         "hi": pa.array([int(v.max()) if len(v) else 0]),
                         "n": pa.array([len(v)]),
                         "s": pa.array([int(v.sum())])})

    meta = ds.map_batches(minmax, batch_format="pyarrow").to_pandas()
    meta = meta[meta["n"] > 0]
    lo, hi = int(meta["lo"].min()), int(meta["hi"].max())
    n = int(meta["n"].sum())
    total = int(meta["s"].sum())
    width = hi - lo + 1
    m = n // 100

    def hist(t: pa.Table) -> pa.Table:
        v = vals(t)
        b = (v - lo) * np.int64(num_bins) // np.int64(width)
        ub, cnt = np.unique(b, return_counts=True)
        return pa.table({"bin": pa.array(ub),
                         "cnt": pa.array(cnt.astype(np.int64))})

    parts = ds.map_batches(hist, batch_format="pyarrow").to_pandas()
    bins = np.zeros(num_bins, dtype=np.int64)
    np.add.at(bins, parts["bin"].to_numpy(dtype=np.int64),
              parts["cnt"].to_numpy(dtype=np.int64))
    cum = np.cumsum(bins)
    k = n - m  # 0-based index of the boundary (m-th highest)
    tb = int(np.searchsorted(cum, k, side="right"))
    bef = int(np.r_[0, cum][tb])
    ref = ray.put(np.array([tb], dtype=np.int64))

    def gather(t: pa.Table) -> pa.Table:
        want = ray.get(ref)
        v = vals(t)
        b = (v - lo) * np.int64(num_bins) // np.int64(width)
        keep = np.isin(b, want)
        return pa.table({"v": pa.array(v[keep])})

    got = ds.map_batches(gather, batch_format="pyarrow").to_pandas()
    inbin = np.sort(got["v"].to_numpy(dtype=np.int64))
    v_b = int(inbin[k - bef])

    def cond(t: pa.Table) -> pa.Table:
        v = vals(t)
        return pa.table({
            "s_above": pa.array([int(v[v > v_b].sum())]),
            "c_above": pa.array([int((v > v_b).sum())]),
        })

    c = ds.map_batches(cond, batch_format="pyarrow").to_pandas()
    s_above, c_above = int(c["s_above"].sum()), int(c["c_above"].sum())
    top = s_above + (m - c_above) * v_b
    return _one_row(n_top=np.int64(m), top_cents=np.int64(top),
                    total_cents=np.int64(total))


QUERIES["top1pct_revenue_share"] = top1pct_revenue_share
ORACLES["top1pct_revenue_share"] = """
    WITH v AS (SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT) AS c
               FROM lineitem),
    r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC) AS rn,
                 COUNT(*) OVER () AS n FROM v)
    SELECT CAST(MAX(n) // 100 AS BIGINT) AS n_top,
           CAST(SUM(CASE WHEN rn <= n // 100 THEN c ELSE 0 END) AS BIGINT)
             AS top_cents,
           CAST(SUM(c) AS BIGINT) AS total_cents
    FROM r
"""


def weekly_autocorr_revenue(sf_dir: str) -> pd.DataFrame:
    """Lag-7 autocorrelation of daily revenue — the seasonality-
    strength statistic (is there a weekly cycle?): the day series
    folds through the calendar combiner, PAIRS (t, t−7) form only
    where both days exist (a LAG-7-rows would silently misalign
    across gaps), and the correlation is one float expression over
    exact Python-int moments of the paired values — mirrored in the
    self-join HUGEINT SQL, bit-matched."""
    import math

    US_DAY = np.int64(86_400_000_000)

    ds = _read(sf_dir, "orders", columns=["o_totalprice", "o_orderdate"])

    def partial(t: pa.Table) -> pa.Table:
        c = _cents(t.column("o_totalprice")).to_numpy(zero_copy_only=False)
        d = pc.cast(t.column("o_orderdate"), pa.int64()) \
            .to_numpy(zero_copy_only=False) // US_DAY
        ud, inv = np.unique(d, return_inverse=True)
        s = np.zeros(len(ud), dtype=np.int64)
        np.add.at(s, inv, c)
        return pa.table({"day": pa.array(ud), "s": pa.array(s)})

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas() \
        .groupby("day", as_index=False)["s"].sum()
    day = p["day"].to_numpy(dtype=np.int64)
    s = p["s"].to_numpy(dtype=np.int64)
    order = np.argsort(day)
    day, s = day[order], s[order]
    pos = np.searchsorted(day, day - 7)
    pos_c = np.minimum(pos, len(day) - 1)
    hit = day[pos_c] == day - 7
    x = s[pos_c][hit].astype(object)  # revenue at t-7
    y = s[hit].astype(object)         # revenue at t
    n = len(y)
    sx, sy = int(sum(x)), int(sum(y))
    sxx = int(sum(a * a for a in x))
    syy = int(sum(a * a for a in y))
    sxy = int(sum(a * b for a, b in zip(x, y)))
    num = n * sxy - sx * sy
    rho = float(num) / math.sqrt(float(n * sxx - sx * sx)
                                 * float(n * syy - sy * sy))
    return _one_row(n_pairs=np.int64(n), autocorr_lag7=rho)


QUERIES["weekly_autocorr_revenue"] = weekly_autocorr_revenue
ORACLES["weekly_autocorr_revenue"] = """
    WITH d AS (
      SELECT CAST(epoch_us(date_trunc('day', o_orderdate))
                  // 86400000000 AS BIGINT) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
               AS s
      FROM orders GROUP BY 1),
    pr AS (SELECT a.s AS y, b.s AS x
           FROM d a JOIN d b ON b.day = a.day - 7),
    m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                 CAST(SUM(x) AS HUGEINT) AS sx,
                 CAST(SUM(y) AS HUGEINT) AS sy,
                 SUM(CAST(x AS HUGEINT)*x) AS sxx,
                 SUM(CAST(y AS HUGEINT)*y) AS syy,
                 SUM(CAST(x AS HUGEINT)*y) AS sxy
          FROM pr)
    SELECT CAST(n AS BIGINT) AS n_pairs,
           CAST(n*sxy - sx*sy AS DOUBLE)
           / SQRT(CAST(n*sxx - sx*sx AS DOUBLE)
                  * CAST(n*syy - sy*sy AS DOUBLE)) AS autocorr_lag7
    FROM m
"""


def events_dow_hour_heatmap(sf_dir: str) -> pd.DataFrame:
    """The ops-dashboard calendar heatmap — event counts + exact cents
    per (weekday, hour) cell: a 168-cell domain-bounded combiner (one
    nonzero-cell partial table per batch, zero shuffles), weekday and
    hour both derived from the µs epoch in pure integer arithmetic
    (Sunday=0 matching DuckDB dayofweek)."""
    US_DAY = np.int64(86_400_000_000)
    US_HOUR = np.int64(3_600_000_000)

    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def cells(t: pa.Table) -> pa.Table:
        tu = pc.cast(t.column("ts"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        c = _cents(t.column("value")).to_numpy(zero_copy_only=False)
        dow = ((tu // US_DAY) + 4) % 7
        hr = (tu % US_DAY) // US_HOUR
        code = dow * 24 + hr
        n = np.bincount(code, minlength=168).astype(np.int64)
        s = np.zeros(168, dtype=np.int64)
        np.add.at(s, code, c)
        nz = np.flatnonzero(n)
        return pa.table({"cell": pa.array(nz.astype(np.int64)),
                         "n": pa.array(n[nz]),
                         "cents": pa.array(s[nz])})

    p = ds.map_batches(cells, batch_format="pyarrow").to_pandas() \
        .groupby("cell", as_index=False)[["n", "cents"]].sum()
    cell = p["cell"].to_numpy(dtype=np.int64)
    return pd.DataFrame({
        "dow": cell // 24,
        "hour": cell % 24,
        "n": p["n"].astype("int64"),
        "cents": p["cents"].astype("int64"),
    }).sort_values(["dow", "hour"]).reset_index(drop=True) \
        .astype({"dow": "int64", "hour": "int64"})


QUERIES["events_dow_hour_heatmap"] = events_dow_hour_heatmap
ORACLES["events_dow_hour_heatmap"] = """
    SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
           CAST(hour(ts) AS BIGINT) AS hour,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS cents
    FROM events GROUP BY 1, 2 ORDER BY dow, hour
"""


def incremental_dedup_docs(sf_dir: str) -> pd.DataFrame:
    """Incremental exact dedup against a PERSISTED fingerprint index
    (stages/incremental.py): even-id documents are the already-ingested
    corpus — fingerprinted once into hash-sharded parquet under /tmp —
    and odd-id documents arrive as the next ingest batch, classified
    kept / dup_of_index / dup_in_batch without ever re-reading the old
    corpus bodies. The batch additionally PLANTS copies so every status
    is exercised at any sf (the corpus's natural dups need not cross
    the parity split): a copy of each doc_id%20==0 indexed doc
    (→ dup_of_index) and a copy of each doc_id%20==1 batch doc
    (→ dup_in_batch unless its text is also indexed). The batch's
    hashes prune the index read to touched shards; one bucket exchange
    of 24-byte fingerprint rows does the classification. SQL oracle
    states the same batch (UNION ALL plants) and three-way CASE over
    text equality directly."""
    import tempfile

    from ..stages.incremental import ExactDedupIndex

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def evens(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 2 == 0))

    def new_batch(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        odd = t.filter(pa.array(ids % 2 == 1))
        p_idx = t.filter(pa.array(ids % 20 == 0))  # indexed content
        p_bat = t.filter(pa.array(ids % 20 == 1))  # batch content
        parts = [odd]
        for src, off in ((p_idx, 10_000_000), (p_bat, 20_000_000)):
            i = src.column("doc_id").to_numpy(zero_copy_only=False)
            parts.append(pa.table({"doc_id": pa.array(i + off),
                                   "text": src.column("text")}))
        return pa.concat_tables(parts)

    idx_dir = os.path.join(tempfile.gettempdir(), "raysketch_data",
                           f"incr_exact_{sf_of(sf_dir)}")
    if os.path.exists(os.path.join(idx_dir, "meta.json")):
        idx = ExactDedupIndex.load(idx_dir)
    else:
        idx = ExactDedupIndex(idx_dir).build(
            ds.map_batches(evens, batch_format="pyarrow"))
    out = idx.dedup_new(
        ds.map_batches(new_batch, batch_format="pyarrow")).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True) \
        .astype({"doc_id": "int64", "status": "str"})


QUERIES["incremental_dedup_docs"] = incremental_dedup_docs
ORACLES["incremental_dedup_docs"] = """
    WITH newb AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
        UNION ALL
        SELECT doc_id + 10000000, text FROM documents WHERE doc_id % 20 = 0
        UNION ALL
        SELECT doc_id + 20000000, text FROM documents WHERE doc_id % 20 = 1
    )
    SELECT d.doc_id,
           CASE WHEN EXISTS (SELECT 1 FROM documents o
                             WHERE o.doc_id % 2 = 0 AND o.text = d.text)
                THEN 'dup_of_index'
                WHEN EXISTS (SELECT 1 FROM newb n2
                             WHERE n2.text = d.text
                               AND n2.doc_id < d.doc_id)
                THEN 'dup_in_batch'
                ELSE 'kept' END AS status
    FROM newb d
    ORDER BY d.doc_id
"""


def incremental_minhash_dedup(sf_dir: str) -> pd.DataFrame:
    """Incremental NEAR-dup detection against a persisted MinHash-LSH
    band index: the full documents table is indexed once (band rows +
    signatures, hash-sharded parquet under /tmp); the incoming batch is
    a deterministic perturbation of every 10th long document (one
    sentence appended, ids offset by 10,000,000) — near- but not
    exact-duplicates, so byte hashing provably misses them. New docs
    are signed with the INDEX's stored hash family, bucket-joined
    against only the touched band shards, and candidates verified by
    the distributed pair scorer. Returns matched (new_id, old_id)
    pairs; pytest asserts every planted doc is recalled against its
    source (rows-only driver check — minhash is not SQL-expressible)."""
    import tempfile

    from ..stages.incremental import MinHashBandIndex

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    idx_dir = os.path.join(tempfile.gettempdir(), "raysketch_data",
                           f"incr_minhash_{sf_of(sf_dir)}")
    if os.path.exists(os.path.join(idx_dir, "meta.json")):
        idx = MinHashBandIndex.load(idx_dir)
    else:
        idx = MinHashBandIndex(idx_dir).build(ds)

    def perturb(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        txt = t.column("text").combine_chunks()
        ln = pc.utf8_length(txt).to_numpy(zero_copy_only=False)
        sel = np.nonzero((ids % 10 == 0) & (ln >= 200))[0]
        sub = txt.take(pa.array(sel))
        appended = pc.binary_join_element_wise(
            sub.cast(pa.string()), " incremental ingest near copy.", "")
        return pa.table({"doc_id": pa.array(ids[sel] + 10_000_000),
                         "text": appended})

    out = idx.match_new(
        ds.map_batches(perturb, batch_format="pyarrow"),
        threshold=0.8).to_pandas()
    if "new_id" not in out.columns:  # 0-row to_pandas drops columns
        out = pd.DataFrame({"new_id": [], "old_id": []})
    out = out[["new_id", "old_id"]].astype("int64")
    return out.sort_values(["new_id", "old_id"]).reset_index(drop=True)


QUERIES["incremental_minhash_dedup"] = incremental_minhash_dedup


def incremental_dedup_turns(sf_dir: str) -> pd.DataFrame:
    """Transcript-scale incremental exact dedup — the heavy-bench twin
    of incremental_dedup_docs (documents caps at 5k rows; transcripts
    reach 2M turns at sf0.1). ~90% of conversations (by conv-id hash)
    are the already-ingested corpus, fingerprinted into a fresh
    hash-sharded index; the other ~10% arrive as the next ingest batch
    and every turn is classified kept / dup_of_index / dup_in_batch.
    The index is REBUILT each call (the benchmark times build +
    classify honestly). Returns per-status counts — the 2M
    classification rows are reduced distributed (per-batch value
    counts folded on the driver), never materialized. Rows-only
    driver check: transcripts are not a DuckDB view; the docs twin
    carries the oracle for the identical classification logic."""
    import tempfile

    from ..hashing import murmur64a
    from ..keys import canonical_flat_bytes
    from ..stages.dedup import _splitmix64 as _mix64
    from ..stages.incremental import ExactDedupIndex

    ds = transcripts_ds(sf_dir, columns=["conv_id", "turn_idx", "text"])

    def split(new_side: bool):
        def f(t: pa.Table) -> pa.Table:
            data, off = canonical_flat_bytes(t.column("conv_id"))
            h = murmur64a(data, off)
            is_new = (_mix64(h) % np.uint64(10)) == 0
            tix = t.column("turn_idx").to_numpy(zero_copy_only=False) \
                .astype(np.uint64)
            # deterministic 63-bit turn id: conv hash high bits | turn_idx
            tid = (((h >> np.uint64(1)) & ~np.uint64(0xFFF))
                   | (tix & np.uint64(0xFFF))).astype(np.int64)
            m = is_new if new_side else ~is_new
            return pa.table({"turn_id": pa.array(tid[m]),
                             "text": t.column("text").filter(pa.array(m))})
        return f

    idx_dir = os.path.join(tempfile.gettempdir(), "raysketch_data",
                           f"incr_turns_{sf_of(sf_dir)}")
    idx = ExactDedupIndex(idx_dir, id_col="turn_id").build(
        ds.map_batches(split(False), batch_format="pyarrow"))
    out = idx.dedup_new(ds.map_batches(split(True), batch_format="pyarrow"))

    def count_partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t.column("status"))
        return pa.table({"status": vc.field("values"),
                         "n": vc.field("counts")})

    parts = out.map_batches(count_partial, batch_format="pyarrow") \
        .to_pandas()
    agg = parts.groupby("status", as_index=False)["n"].sum() \
        if len(parts) else pd.DataFrame({"status": [], "n": []})
    return agg.sort_values("status").reset_index(drop=True) \
        .astype({"status": "str", "n": "int64"})


QUERIES["incremental_dedup_turns"] = incremental_dedup_turns


def span_dedup_stats(sf_dir: str) -> pd.DataFrame:
    """Span-level exact dedup (Lee et al. ACL'22 "Deduplicating
    Training Data Makes Language Models Better"): every 5-token window
    whose content occurs ≥2 times corpus-wide is removed EXCEPT its
    first occurrence by (doc_id, position); per doc, report total
    tokens and the union size of removed windows' token intervals.
    Doc-level dedup misses boilerplate shared by otherwise-distinct
    docs — this is the operator that catches it. Distributed shape:
    O(tokens) fixed-width (gram_hash, doc, pos) rows + two hash-bucket
    exchanges; text never shuffles (stages/spans.py)."""
    from ..stages.spans import span_removal_stats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return span_removal_stats(ds, text_col="text", id_col="doc_id", k=5)


QUERIES["span_dedup_stats"] = span_dedup_stats
ORACLES["span_dedup_stats"] = """
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    g AS (
      SELECT doc_id, CAST(p AS BIGINT) - 1 AS pos,
             list_extract(words, CAST(p AS INT))     || ' ' ||
             list_extract(words, CAST(p AS INT) + 1) || ' ' ||
             list_extract(words, CAST(p AS INT) + 2) || ' ' ||
             list_extract(words, CAST(p AS INT) + 3) || ' ' ||
             list_extract(words, CAST(p AS INT) + 4) AS gram
      FROM (SELECT doc_id, words,
                   unnest(range(1, greatest(len(words) - 4, 0) + 1)) AS p
            FROM w)
    ),
    marked AS (
      SELECT doc_id, pos FROM (
        SELECT doc_id, pos,
               COUNT(*) OVER (PARTITION BY gram) AS cnt,
               ROW_NUMBER() OVER (PARTITION BY gram
                                  ORDER BY doc_id, pos) AS rn
        FROM g
      ) WHERE cnt >= 2 AND rn > 1
    ),
    cov AS (
      SELECT doc_id, SUM(LEAST(nxt - pos, 5)) AS n_removed FROM (
        SELECT doc_id, pos,
               LEAD(pos, 1, pos + 5) OVER (PARTITION BY doc_id
                                           ORDER BY pos) AS nxt
        FROM marked
      ) GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
           CAST(COALESCE(c.n_removed, 0) AS BIGINT) AS n_removed
    FROM documents d LEFT JOIN cov c USING (doc_id)
    ORDER BY d.doc_id
"""


def span_dedup_clean_docs(sf_dir: str) -> pd.DataFrame:
    """Span-level dedup EMISSION (Lee et al. ACL'22): the cleaned
    corpus itself. Every 5-token window occurring ≥2 times corpus-wide
    keeps its first occurrence by (doc_id, position); all other
    occurrences' token intervals are excised and the remaining tokens
    re-joined. `span_dedup_stats` reports the damage; this query
    returns the repaired documents — the actual training-data
    deliverable. Value-hash-checked against a full SQL reconstruction
    (exploded tokens LEFT JOIN removed positions → ordered
    STRING_AGG). Distributed shape: gram-hash exchange for marks +
    one doc-id exchange carrying each text exactly once; the rewrite
    is vectorized Arrow (keep-mask filter + binary_join)."""
    from ..stages.spans import remove_duplicate_spans

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = remove_duplicate_spans(ds, text_col="text", id_col="doc_id",
                                 k=5).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True) \
        .astype({"doc_id": "int64", "clean_text": "str"})


QUERIES["span_dedup_clean_docs"] = span_dedup_clean_docs
ORACLES["span_dedup_clean_docs"] = """
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    g AS (
      SELECT doc_id, CAST(p AS BIGINT) - 1 AS pos,
             list_extract(words, CAST(p AS INT))     || ' ' ||
             list_extract(words, CAST(p AS INT) + 1) || ' ' ||
             list_extract(words, CAST(p AS INT) + 2) || ' ' ||
             list_extract(words, CAST(p AS INT) + 3) || ' ' ||
             list_extract(words, CAST(p AS INT) + 4) AS gram
      FROM (SELECT doc_id, words,
                   unnest(range(1, greatest(len(words) - 4, 0) + 1)) AS p
            FROM w)
    ),
    marked AS (
      SELECT doc_id, pos FROM (
        SELECT doc_id, pos,
               COUNT(*) OVER (PARTITION BY gram) AS cnt,
               ROW_NUMBER() OVER (PARTITION BY gram
                                  ORDER BY doc_id, pos) AS rn
        FROM g
      ) WHERE cnt >= 2 AND rn > 1
    ),
    rem AS (
      SELECT DISTINCT doc_id, pos + u AS rpos
      FROM marked, (SELECT unnest(range(0, 5)) AS u)
    ),
    tok AS (
      SELECT doc_id, CAST(p AS BIGINT) - 1 AS pos,
             list_extract(words, CAST(p AS INT)) AS tok
      FROM (SELECT doc_id, words,
                   unnest(range(1, len(words) + 1)) AS p FROM w)
    ),
    clean AS (
      SELECT t.doc_id,
             COALESCE(STRING_AGG(t.tok, ' ' ORDER BY t.pos)
                      FILTER (WHERE r.rpos IS NULL), '') AS clean_text
      FROM tok t LEFT JOIN rem r
        ON t.doc_id = r.doc_id AND t.pos = r.rpos
      GROUP BY t.doc_id
    )
    SELECT d.doc_id, c.clean_text
    FROM documents d JOIN clean c USING (doc_id)
    ORDER BY d.doc_id
"""


def semdedup_embeddings(sf_dir: str) -> pd.DataFrame:
    """SemDeDup (arXiv:2303.09540) with a SQL-checkable answer: exact
    copies of every 50th vector are planted in-query (vec_id +
    1,000,000 — the embedding_dedup_planted pattern; corpus max
    pairwise cosine ≈ 0.51 at sf0.01, far under the 0.95 threshold, so
    the planted pairs are the only matches). Clustering is
    deterministic fixed-seed assignment (16 smallest-id vectors as
    centroids, argmax cosine, exact ties → smaller seed id), so the
    whole operator — assignment included — value-hash-checks against a
    ROW_NUMBER-argmax SQL oracle. A planted copy lands in its
    original's cluster (identical vector → identical similarities) and
    is removed with dup_of = the original; the copies of seed vectors
    exercise the seed-self-match case. Floats never enter the output
    (ids only)."""
    from ..stages.dedup import semdedup

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        sel = np.nonzero(ids % 50 == 0)[0]
        copies = t.take(pa.array(sel))
        copies = copies.set_column(
            copies.schema.get_field_index("vec_id"), "vec_id",
            pa.array(ids[sel] + 1_000_000))
        return pa.concat_tables([t, copies])

    aug = ds.map_batches(plant, batch_format="pyarrow")
    return semdedup(aug, n_seeds=16, threshold=0.95)


def semdedup_trained_embeddings(sf_dir: str) -> pd.DataFrame:
    """SemDeDup's SCALE path (VERDICT r03 item 2): trained k-means
    centroids from a deterministic bounded sample, seed count derived
    from the corpus (n/1024, so within-cluster work stays O(n·c) not
    O(n²/const)), and a per-cluster size guard splitting skew-collapsed
    clusters by vector-content hash. Same planted-copy construction as
    the oracle-checked fixed-seed twin; k-means isn't SQL-expressible,
    so this entry is rows-only — planted recall (every copy removed
    with dup_of = its original) is pytest-enforced
    (test_semdedup_trained_planted_recall)."""
    from ..stages.dedup import semdedup

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        sel = np.nonzero(ids % 50 == 0)[0]
        copies = t.take(pa.array(sel))
        copies = copies.set_column(
            copies.schema.get_field_index("vec_id"), "vec_id",
            pa.array(ids[sel] + 1_000_000))
        return pa.concat_tables([t, copies])

    aug = ds.map_batches(plant, batch_format="pyarrow")
    return semdedup(aug, n_seeds=None, threshold=0.95,
                    clustering="trained")


QUERIES["semdedup_trained_embeddings"] = semdedup_trained_embeddings

QUERIES["semdedup_embeddings"] = semdedup_embeddings
ORACLES["semdedup_embeddings"] = """
    WITH aug AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings WHERE vec_id % 50 = 0
    ),
    seeds AS (
      SELECT vec_id AS sid, e AS se FROM aug ORDER BY vec_id LIMIT 16
    ),
    assign AS (
      SELECT vec_id, sid AS cluster FROM (
        SELECT a.vec_id, s.sid,
               ROW_NUMBER() OVER (
                 PARTITION BY a.vec_id
                 ORDER BY list_cosine_similarity(a.e, s.se) DESC, s.sid
               ) AS rn
        FROM aug a CROSS JOIN seeds s
      ) WHERE rn = 1
    ),
    removed AS (
      SELECT b.vec_id, MIN(a.vec_id) AS dup_of
      FROM aug a
      JOIN assign ca ON ca.vec_id = a.vec_id
      JOIN assign cb ON cb.cluster = ca.cluster
      JOIN aug b ON b.vec_id = cb.vec_id AND a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.e, b.e) >= 0.95
      GROUP BY b.vec_id
    )
    SELECT r.vec_id, c.cluster, r.dup_of
    FROM removed r JOIN assign c USING (vec_id)
    ORDER BY r.vec_id
"""


def token_budget_select(sf_dir: str) -> pd.DataFrame:
    """Token-budget corpus selection — the data-mixing step after
    scoring: rank every document by quality (exact distinct-word
    count, ties → smaller doc_id) and keep documents greedily while
    the running token total stays within budget = corpus_tokens // 10.
    This is the global-constraint selection no per-row filter can
    express — every kept/dropped decision depends on the token mass of
    ALL better-ranked documents. Distributed shape: per-doc (tokens,
    distinct words) are one vectorized zero-shuffle pass (the ttr_docs
    lexsort kernel); the global running total is
    :func:`~raysketch.stages.scan.ordered_prefix_scan` over the
    composite rank key ((max_score − score) << 32 | doc_id) — only
    16-byte (key, tokens) rows ever shuffle, the cut applies in-bucket,
    and the result is exactly SQL's SUM OVER (ORDER BY score DESC,
    doc_id)."""
    from ..stages.scan import ordered_prefix_scan

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        # per-doc (token count, exact distinct-word count), the ttr_docs
        # lexsort kernel. Doc ids are unique within a batch and every
        # doc splits to ≥1 token ("" → [""]), so the sorted-segment
        # counts map back to row order through one argsort.
        w = pc.split_pattern(
            pc.fill_null(t.column("text"), ""), " ").combine_chunks()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cnt = pc.list_value_length(w).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = w.flatten().to_numpy(zero_copy_only=False)
        doc = np.repeat(ids, cnt)
        order = np.lexsort((flat, doc))
        doc_s, flat_s = doc[order], flat[order]
        new_pair = np.r_[True, (doc_s[1:] != doc_s[:-1])
                         | (flat_s[1:] != flat_s[:-1])]
        starts = np.nonzero(np.r_[True, doc_s[1:] != doc_s[:-1]])[0]
        dis = np.zeros(len(ids), dtype=np.int64)
        dis[np.argsort(ids, kind="stable")] = np.add.reduceat(
            new_pair.astype(np.int64), starts) if len(starts) \
            else np.zeros(0, dtype=np.int64)
        return pa.table({"doc_id": pa.array(ids),
                         "n_tokens": pa.array(cnt),
                         "score": pa.array(dis)})

    per_doc = ds.map_batches(stats, batch_format="pyarrow").materialize()
    total = per_doc.sum("n_tokens")
    budget = int(total) // 10
    SBITS = np.int64(1) << np.int64(32)

    def keyed(t: pa.Table) -> pa.Table:
        s = t.column("score").to_numpy(zero_copy_only=False)
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        key = (np.int64(1 << 21) - s.astype(np.int64)) * SBITS \
            + d.astype(np.int64)
        return pa.table({"key": pa.array(key),
                         "n_tokens": t.column("n_tokens")})

    scanned = ordered_prefix_scan(
        per_doc.map_batches(keyed, batch_format="pyarrow"),
        "key", "n_tokens", op="sum")

    def cut(t: pa.Table) -> pa.Table:
        k = t.column("key").to_numpy(zero_copy_only=False)
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        p = t.column("prefix").to_numpy(zero_copy_only=False)
        keep = p + n <= budget
        return pa.table({
            "doc_id": pa.array((k[keep] % SBITS).astype(np.int64)),
            "score": pa.array(
                (np.int64(1 << 21) - k[keep] // SBITS).astype(np.int64)),
            "n_tokens": pa.array(n[keep].astype(np.int64))})

    out = scanned.map_batches(cut, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True) \
        .astype({"doc_id": "int64", "score": "int64", "n_tokens": "int64"})


QUERIES["token_budget_select"] = token_budget_select
ORACLES["token_budget_select"] = """
    WITH t AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               AS score
      FROM documents
    ),
    b AS (SELECT CAST(SUM(n_tokens) // 10 AS BIGINT) AS budget FROM t),
    c AS (
      SELECT doc_id, score, n_tokens,
             SUM(n_tokens) OVER (ORDER BY score DESC, doc_id) AS cum
      FROM t
    )
    SELECT doc_id, score, n_tokens FROM c, b
    WHERE cum <= budget ORDER BY doc_id
"""


def audit_transcript_ds(ds) -> pd.DataFrame:
    """Conversation well-formedness audit — the data-quality gate an
    ingest pipeline runs before training (`dq_orders_violations`' twin
    on the graft payload): one summary row counting
      * empty-text turns,
      * tool-column contract violations (role=='tool' XOR tool!=''),
      * adjacent same-role turns within a conversation,
      * timestamp regressions against turn order,
      * turn-index gaps and conversations not starting at turn 0.
    Row-local flags fold as per-batch combiner partials (zero
    shuffle); adjacency checks co-locate each conversation with ONE
    conv-hash bucket exchange of fixed-width rows (conv hash,
    turn_idx, role idx, ts) — text never shuffles. Conv-hash
    collisions merge two convs' timelines with probability
    ~n_convs²/2⁶⁴ (the exact-dedup collision argument)."""
    from ..hashing import arrow_to_flat_bytes, murmur64a

    ROLES = ["assistant", "system", "tool", "user"]
    NB = 64

    def local_flags(t: pa.Table) -> pa.Table:
        is_tool_role = pc.equal(t.column("role"), "tool")
        has_tool = pc.not_equal(pc.fill_null(t.column("tool"), ""), "")
        bad_tool = pc.sum(pc.cast(
            pc.xor(is_tool_role, has_tool), pa.int64())).as_py() or 0
        empty = pc.sum(pc.cast(
            pc.equal(pc.fill_null(t.column("text"), ""), ""),
            pa.int64())).as_py() or 0
        return pa.table({"n_turns": pa.array([t.num_rows]),
                         "n_empty_text": pa.array([int(empty)]),
                         "n_tool_violations": pa.array([int(bad_tool)])})

    def adjacency_rows(t: pa.Table) -> pa.Table:
        data, offsets = arrow_to_flat_bytes(t.column("conv_id"))
        cv = murmur64a(data, offsets).astype(np.int64)
        ri = pc.index_in(t.column("role"),
                         value_set=pa.array(ROLES))
        return pa.table({
            "cv": pa.array(cv),
            "ti": pc.cast(t.column("turn_idx"), pa.int64()),
            "ri": pc.cast(ri, pa.int8()),
            "tsu": pc.cast(t.column("ts"), pa.int64()),
            "__b": pa.array((cv.astype(np.uint64)
                             % np.uint64(NB)).astype(np.int64)),
        })

    def audit_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cv = g["cv"].to_numpy()
        ti = g["ti"].to_numpy()
        ri = g["ri"].to_numpy()
        ts = g["tsu"].to_numpy()
        order = np.lexsort((ti, cv))
        cv, ti, ri, ts = cv[order], ti[order], ri[order], ts[order]
        same = cv[1:] == cv[:-1]
        new = np.r_[True, ~same]
        return pd.DataFrame({
            "n_convs": [int(new.sum())],
            "n_same_role_adjacent": [int((same & (ri[1:] == ri[:-1])).sum())],
            "n_ts_regressions": [int((same & (ts[1:] <= ts[:-1])).sum())],
            "n_turn_gaps": [int((same & (ti[1:] != ti[:-1] + 1)).sum())],
            "n_bad_start": [int((ti[new] != 0).sum())],
        })

    loc = ds.map_batches(local_flags, batch_format="pyarrow").to_pandas()
    adj = ds.map_batches(adjacency_rows, batch_format="pyarrow") \
        .groupby("__b").map_groups(audit_bucket, batch_format="pandas") \
        .to_pandas()
    return _one_row(
        n_turns=int(loc["n_turns"].sum()),
        n_convs=int(adj["n_convs"].sum()),
        n_empty_text=int(loc["n_empty_text"].sum()),
        n_tool_violations=int(loc["n_tool_violations"].sum()),
        n_same_role_adjacent=int(adj["n_same_role_adjacent"].sum()),
        n_ts_regressions=int(adj["n_ts_regressions"].sum()),
        n_turn_gaps=int(adj["n_turn_gaps"].sum()),
        n_bad_start=int(adj["n_bad_start"].sum()),
    )


def transcript_audit(sf_dir: str) -> pd.DataFrame:
    """Driver entry for :func:`audit_transcript_ds` over the sf-tier
    transcript table (rows-only: the table is generated, not an oracle
    view; pytest locks equality against a pandas brute force)."""
    ds = transcripts_ds(sf_dir, columns=["conv_id", "turn_idx", "role",
                                         "text", "tool", "ts"])
    return audit_transcript_ds(ds)


QUERIES["transcript_audit"] = transcript_audit


def quality_classifier_docs(sf_dir: str) -> pd.DataFrame:
    """Trained quality-filter classifier — the fastText-style model
    pipeline (CCNet / GPT-3 data curation): a weak-supervision rule
    (here: ≥2 occurrences of the low-quality markers 'slow'/'dup')
    labels a deterministic 256-doc seed sample; a hashed-bag-of-words
    logistic regression trains on the driver (bounded sample, the
    IVF-k-means precedent); the weight vector broadcasts ONCE and the
    full corpus scores in one vectorized inference pass (murmur-hash
    tokens → np.add.reduceat of gathered weights per doc). Output is a
    single integer row: held-out confusion counts + train accuracy —
    the rule is computable everywhere, so the classifier's
    generalization is measured exactly. Deterministic end-to-end
    (hash sample, fixed-iteration float64 GD, per-doc pure-function
    scores); rows-only driver entry (SQL cannot train), pytest asserts
    held-out accuracy."""
    from ..stages.linear import (deterministic_sample, score_logreg,
                                 train_logreg_hashed)

    DIM = 65536
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def rule_counts(texts) -> np.ndarray:
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        w = pc.split_pattern(pc.fill_null(texts, ""), " ")
        if isinstance(w, pa.ChunkedArray):
            w = w.combine_chunks()
        hit = pc.cast(pc.is_in(w.flatten(),
                               value_set=pa.array(["slow", "dup"])),
                      pa.int64()).to_numpy(zero_copy_only=False)
        off = w.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        cum = np.concatenate(([0], np.cumsum(hit)))
        return cum[off[1:]] - cum[off[:-1]]

    sample = deterministic_sample(ds, "doc_id", ["doc_id", "text"],
                                  k=256, seed=11)
    y_train = (rule_counts(pa.array(sample["text"].tolist(),
                                    type=pa.string())) >= 2)
    w, b = train_logreg_hashed(sample["text"].tolist(),
                               y_train.astype(np.float64), dim=DIM,
                               iters=400, lr=1.0)
    train_ids = np.sort(sample["doc_id"].to_numpy().astype(np.int64))

    def extra(t: pa.Table) -> dict:
        return {"y": (rule_counts(t.column("text")) >= 2)
                .astype(np.int8)}

    scored = score_logreg(ds, "text", "doc_id", w, b, DIM, extra_fn=extra)

    def confusion(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        pred = t.column("pred").to_numpy(zero_copy_only=False) \
            .astype(bool)
        y = t.column("y").to_numpy(zero_copy_only=False).astype(bool)
        tr = np.isin(ids.astype(np.int64), train_ids)
        te = ~tr
        return pa.table({
            "n_docs": pa.array([len(ids)]),
            "n_train": pa.array([int(tr.sum())]),
            "train_correct": pa.array([int((tr & (pred == y)).sum())]),
            "test_tp": pa.array([int((te & pred & y).sum())]),
            "test_fp": pa.array([int((te & pred & ~y).sum())]),
            "test_fn": pa.array([int((te & ~pred & y).sum())]),
            "test_tn": pa.array([int((te & ~pred & ~y).sum())]),
        })

    c = scored.map_batches(confusion, batch_format="pyarrow").to_pandas()
    return _one_row(**{k: int(c[k].sum()) for k in c.columns})


QUERIES["quality_classifier_docs"] = quality_classifier_docs


def max_repeat_run_docs(sf_dir: str) -> pd.DataFrame:
    """De-looping detector — the generation-artifact filter for
    model-written text (a degenerate decoder repeats one token):
    per document, the length of the longest run of CONSECUTIVE
    identical tokens (and the token, ties → first occurrence).
    Zero-shuffle: each batch holds whole docs, runs fall out of one
    boundary mask + reduceat per batch; the SQL twin is the classic
    gaps-and-islands (pos − ROW_NUMBER within (doc, word))."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def runs(t: pa.Table) -> pa.Table:
        w = pc.split_pattern(
            pc.fill_null(t.column("text"), ""), " ").combine_chunks()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cnt = pc.list_value_length(w).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = w.flatten()
        fw = flat.to_numpy(zero_copy_only=False)
        doc = np.repeat(ids, cnt)
        # run starts: new doc OR token != previous token
        new = np.r_[True, (doc[1:] != doc[:-1]) | (fw[1:] != fw[:-1])] \
            if len(fw) else np.zeros(0, dtype=bool)
        starts = np.nonzero(new)[0]
        rlen = np.diff(np.r_[starts, len(fw)])
        rdoc = doc[starts]
        # per-doc argmax run length, first occurrence wins: runs are
        # already in (doc, position) order, lexsort by (-len) stable
        # within doc keeps the earliest among ties
        order = np.lexsort((-rlen, rdoc))
        rd, rl = rdoc[order], rlen[order]
        first = np.r_[True, rd[1:] != rd[:-1]]
        tok = flat.take(pa.array(starts[order][first]))
        return pa.table({"doc_id": pa.array(rd[first]),
                         "max_run": pa.array(rl[first]),
                         "run_token": tok})

    out = ds.map_batches(runs, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True) \
        .astype({"doc_id": "int64", "max_run": "int64"})


QUERIES["max_repeat_run_docs"] = max_repeat_run_docs
ORACLES["max_repeat_run_docs"] = """
    WITH g AS (
      SELECT doc_id, CAST(p AS BIGINT) AS pos,
             list_extract(string_split(text, ' '), CAST(p AS INT)) AS word
      FROM (SELECT doc_id, text,
                   unnest(range(1, len(string_split(text, ' ')) + 1)) AS p
            FROM documents)
    ),
    runs AS (
      SELECT doc_id, word, MIN(pos) AS run_start,
             CAST(COUNT(*) AS BIGINT) AS run_len
      FROM (
        SELECT doc_id, pos, word,
               pos - ROW_NUMBER() OVER (PARTITION BY doc_id, word
                                        ORDER BY pos) AS grp
        FROM g
      ) GROUP BY doc_id, word, grp
    )
    SELECT doc_id, run_len AS max_run, word AS run_token FROM (
      SELECT doc_id, word, run_len,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY run_len DESC, run_start) AS rn
      FROM runs
    ) WHERE rn = 1 ORDER BY doc_id
"""


def decontaminate_fuzzy_docs(sf_dir: str) -> pd.DataFrame:
    """FUZZY train/benchmark decontamination — the near-dup twin of the
    exact-overlap `decontaminate_docs`: a benchmark set is planted as
    the 40-word PREFIX of every 25th document (doc_id + 2,000,000 —
    high n-gram overlap with its source but NOT byte-equal, so exact
    dedup provably misses it), and every (train, bench) pair with exact
    word-3-gram Jaccard ≥ 0.6 is flagged with its similarity. Candidates
    via the distributed prefix-filter join (provably complete — no LSH
    recall to forgive), cross-set pairs kept by a post-filter on the id
    range; the whole operator value-hash-checks against the O(n²) SQL
    shingle join (same integer division ⇒ bit-identical doubles)."""
    from ..stages.dedup import ngram_jaccard_join

    BENCH = 2_000_000
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        sel = np.nonzero(ids % 25 == 0)[0]
        src = t.take(pa.array(sel))
        words = pc.split_pattern(
            pc.fill_null(src.column("text"), ""), " ").combine_chunks()
        prefix = pc.binary_join(pc.list_slice(words, 0, 40), " ")
        bench = pa.table({"doc_id": pa.array(ids[sel] + BENCH),
                          "text": prefix})
        return pa.concat_tables([t.select(["doc_id", "text"]), bench])

    aug = ds.map_batches(plant, batch_format="pyarrow")
    pairs = ngram_jaccard_join(aug, k=3, threshold=0.6, unit="word")
    out = pairs[(pairs["id_a"] < BENCH) & (pairs["id_b"] >= BENCH)]
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True) \
        .astype({"id_a": "int64", "id_b": "int64"})


QUERIES["decontaminate_fuzzy_docs"] = decontaminate_fuzzy_docs
ORACLES["decontaminate_fuzzy_docs"] = """
    WITH aug AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 2000000,
             array_to_string(list_slice(string_split(text, ' '), 1, 40),
                             ' ')
      FROM documents WHERE doc_id % 25 = 0
    ),
    w AS (SELECT doc_id, string_split(text, ' ') AS words FROM aug),
    pos AS (
      SELECT doc_id, words,
             unnest(range(1, greatest(len(words) - 1, 1))) AS p
      FROM w
    ),
    g AS (
      SELECT DISTINCT doc_id,
             list_extract(words, CAST(p AS INT)) || ' ' ||
             list_extract(words, CAST(p AS INT) + 1) || ' ' ||
             list_extract(words, CAST(p AS INT) + 2) AS gram
      FROM pos
    ),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
    FROM inter
    JOIN sz sa ON sa.doc_id = id_a
    JOIN sz sb ON sb.doc_id = id_b
    WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.6
      AND id_a < 2000000 AND id_b >= 2000000
    ORDER BY id_a, id_b
"""


def f2_exact_user_events(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """Exact second frequency moment (self-join size) of events.user_id
    — F₂ = Σᵤ cᵤ², the number a join planner needs before it picks a
    strategy for any user_id⋈user_id equi-join, and the exact twin the
    Count-Sketch estimate below is graded against. Same shape as
    customer_hhi: per-batch (user, n) combiner partials, ONE user-hash
    exchange, each bucket emits (Σc² hi/lo-split, Σc, n_users) and the
    driver folds Python ints."""
    from ..stages.dedup import _splitmix64 as _mix64

    ds = _read(sf_dir, "events", columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        uu, cnt = np.unique(u, return_counts=True)
        return pa.table({
            "u": pa.array(uu), "c": pa.array(cnt.astype(np.int64)),
            "__b": pa.array((_mix64(uu.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(dtype=np.int64)
        c = g["c"].to_numpy(dtype=np.int64)
        order = np.argsort(u, kind="stable")
        u, c = u[order], c[order]
        starts = np.r_[0, np.flatnonzero(u[1:] != u[:-1]) + 1]
        tot = np.add.reduceat(c, starts)
        sq = tot * tot
        return pd.DataFrame([{
            "n": len(tot), "sc": int(tot.sum()),
            "hi": int((sq >> np.int64(32)).sum()),
            "lo": int((sq & np.int64((1 << 32) - 1)).sum()),
        }])

    p = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("__b").map_groups(fold, batch_format="pandas").to_pandas()
    sj = (int(p["hi"].sum()) << 32) + int(p["lo"].sum())
    return _one_row(n_users=np.int64(int(p["n"].sum())),
                    n_events=np.int64(int(p["sc"].sum())),
                    selfjoin_size=np.int64(sj))


QUERIES["f2_exact_user_events"] = f2_exact_user_events
ORACLES["f2_exact_user_events"] = """
    WITH per AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY user_id)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(c) AS BIGINT) AS n_events,
           CAST(SUM(CAST(c AS HUGEINT) * c) AS BIGINT) AS selfjoin_size
    FROM per
"""


def f2_countsketch_user_events(sf_dir: str) -> pd.DataFrame:
    """Count-Sketch (AMS) self-join-size estimate of events.user_id —
    the streaming twin of f2_exact_user_events: one pass, no groupby,
    8192×5 signed counters whose element-wise-add merge makes the
    estimate bit-identical at any parallelism (pure integer sums).
    Rows-only entry; pytest holds the AMS error band against the exact
    value (Var ≤ 2F₂²/w per row, median over 5 rows)."""
    ds = _read(sf_dir, "events", columns=["user_id"])
    est = sketch_aggregate(ds, "countsketch", on="user_id",
                           mode="estimate", width=1 << 13, depth=5)
    return _one_row(f2_estimate=np.int64(est["f2_estimate"]),
                    n_events=np.int64(est["total"]),
                    width=np.int64(est["width"]),
                    depth=np.int64(est["depth"]))


QUERIES["f2_countsketch_user_events"] = f2_countsketch_user_events


def _pca_eig(sf_dir: str):
    """Shared PCA front end: ONE zero-shuffle streaming pass emits each
    batch's exact fixed-point moments (n, Σq, qᵀq at 2^12 — the
    gram_matrix_embeddings quantization), the driver folds Python ints,
    and the 64×64 covariance eigendecomposition runs once on the
    driver (the IVF-k-means precedent: O(D²) driver math, never O(n)).
    The covariance numerator M = n·G − s·sᵀ is exact integer, so the
    doubles handed to eigh — and every eigenvalue/component — are
    bit-identical at ANY batch partitioning. Eigenvector signs are
    canonicalized (largest-|loading| entry positive, first on ties)
    because LAPACK's sign choice is arbitrary."""
    ds = _read(sf_dir, "embeddings", columns=["embedding"])
    Q = np.float64(1 << 12)

    def partial(t: pa.Table) -> pa.Table:
        col = t.column("embedding").combine_chunks()
        n = len(col)
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        y = flat * Q
        q = np.copysign(np.floor(np.abs(y) + 0.5), y).astype(np.int64) \
            .reshape(n, -1)
        g = q.T @ q
        return pa.table({"g": pa.array([g.ravel().tolist()]),
                         "s": pa.array([q.sum(axis=0).tolist()]),
                         "n": pa.array([n]), "d": pa.array([g.shape[0]])})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    d = int(parts["d"].iloc[0])
    n = int(parts["n"].sum())
    G = [0] * (d * d)
    S = [0] * d
    for grow, srow in zip(parts["g"], parts["s"]):
        for k, v in enumerate(grow):
            G[k] += int(v)
        for k, v in enumerate(srow):
            S[k] += int(v)
    Gm = np.array(G, dtype=np.float64).reshape(d, d)
    Sv = np.array(S, dtype=np.float64)
    # population covariance in ORIGINAL units: (n·G − s·sᵀ) / (n²·Q²)
    cov = (n * Gm - np.outer(Sv, Sv)) / (float(n) * n * float(Q) * Q)
    w, V = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]  # eigenvalues descending
    w, V = w[order], V[:, order]
    for j in range(d):
        i_max = int(np.argmax(np.abs(V[:, j])))
        if V[i_max, j] < 0:
            V[:, j] = -V[:, j]
    mean = Sv / (float(n) * Q)
    return w, V, mean, n, d


def pca_embeddings(sf_dir: str) -> pd.DataFrame:
    """PCA spectrum of the embedding corpus — the whitening /
    dimensionality-reduction precursor (how many dimensions carry the
    signal?): eigenvalues, explained-variance ratios and each
    component's dominant dimension, from the exact-moment covariance
    (_pca_eig). Rows-only entry (SQL has no eigendecomposition);
    pytest checks the spectrum against direct full-table numpy PCA,
    orthonormality, trace identity and the projection-variance law."""
    w, V, _mean, n, d = _pca_eig(sf_dir)
    top_dim = np.argmax(np.abs(V), axis=0)
    return pd.DataFrame({
        "component": np.arange(1, d + 1, dtype=np.int64),
        "eigenvalue": w,
        "explained_ratio": w / w.sum(),
        "top_dim": (top_dim + 1).astype(np.int64),
        "top_loading": V[top_dim, np.arange(d)],
        "n_vectors": np.full(d, n, dtype=np.int64),
    })


QUERIES["pca_embeddings"] = pca_embeddings


def pca_project_embeddings(sf_dir: str) -> pd.DataFrame:
    """Distributed PCA projection: every embedding's coordinates along
    the top-2 principal components — the 2-D corpus map behind every
    embedding-space visualization and the front half of PCA whitening.
    The (mean, V₂) pair broadcasts once via ray.put and a plain
    map_batches task projects each batch (per-row dot products in a
    fixed dim order — batch-boundary independent, so the doubles are
    run-to-run identical). The centering happens inside the projection
    as (x−μ)ᵀv = xᵀv − μᵀv with the scalar μᵀv precomputed on the
    driver from exact moments."""
    import ray as _ray

    w, V, mean, _n, _d = _pca_eig(sf_dir)
    V2 = np.ascontiguousarray(V[:, :2])
    off = mean @ V2  # exact-moment scalars, same bits every run
    ref = _ray.put((V2, off))
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def project(t: pa.Table) -> pa.Table:
        v2, o = _ray.get(ref)
        col = t.column("embedding").combine_chunks()
        n = len(col)
        x = col.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64).reshape(n, -1)
        p = x @ v2 - o
        return pa.table({"vec_id": t.column("vec_id"),
                         "pc1": pa.array(p[:, 0]),
                         "pc2": pa.array(p[:, 1])})

    out = ds.map_batches(project, batch_format="pyarrow").to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


QUERIES["pca_project_embeddings"] = pca_project_embeddings


def _word_undirected_edges(sf_dir: str, num_buckets: int = 64):
    """Simple undirected word graph for the peeling family: canonical
    (min, max) pairs from the globally-distinct directed bigram edges,
    self-loops dropped, one more pair-hash exchange for the global
    undirected dedup ((u,v) and (v,u) may arrive in different blocks).
    Returns (indexed edge Dataset with int64 columns i<j, vocab Index)
    — node-bounded vocab on the driver, edge set materialized once so
    iterative consumers sweep it per pass (the PageRank precedent)."""
    from ..stages.dedup import _splitmix64 as _mix64

    edges = _word_edge_dataset(sf_dir, num_buckets)

    def canon(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["w1"] != df["w2"]]
        a = df["w1"].to_numpy()
        b = df["w2"].to_numpy()
        out = pd.DataFrame({"u": np.minimum(a, b),
                            "v": np.maximum(a, b)}).drop_duplicates()
        h = pd.util.hash_pandas_object(
            out["u"] + "\x00" + out["v"], index=False).to_numpy()
        out["__b"] = (_mix64(h) % np.uint64(num_buckets)).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    und = (edges.map_batches(canon, batch_format="pyarrow")
           .groupby("__b")
           .map_groups(lambda g: g[["u", "v"]].drop_duplicates(),
                       batch_format="pandas"))

    vocab_set: set = set()
    batches = []
    for b in und.iter_batches(batch_format="pyarrow", batch_size=None):
        vocab_set.update(b.column("u").to_pylist())
        vocab_set.update(b.column("v").to_pylist())
        batches.append(b)
    vocab = pd.Index(sorted(vocab_set))

    import ray as _ray
    vocab_b = _ray.put(vocab)

    def index_pairs(t: pa.Table) -> pa.Table:
        voc = _ray.get(vocab_b)
        i = voc.get_indexer(t.column("u").to_pandas()).astype(np.int64)
        j = voc.get_indexer(t.column("v").to_pandas()).astype(np.int64)
        return pa.table({"i": pa.array(i), "j": pa.array(j)})

    import ray.data as _rd
    idx = _rd.from_arrow(batches).map_batches(
        index_pairs, batch_format="pyarrow").materialize()
    return idx, vocab


def _alive_degree(idx_edges, alive: np.ndarray) -> np.ndarray:
    """One zero-shuffle sweep over the indexed edge set: per-batch
    bincount partials of each alive node's degree among alive
    neighbors, elementwise-summed on the driver (node-bounded)."""
    import ray as _ray

    n = len(alive)
    aref = _ray.put(alive)

    def sweep(t: pa.Table) -> pa.Table:
        al = _ray.get(aref)
        i = t.column("i").to_numpy(zero_copy_only=False)
        j = t.column("j").to_numpy(zero_copy_only=False)
        m = al[i] & al[j]
        deg = (np.bincount(i[m], minlength=n)
               + np.bincount(j[m], minlength=n))
        return pa.table({"d": pa.array([deg.tolist()])})

    total = np.zeros(n, dtype=np.int64)
    for b in idx_edges.map_batches(sweep, batch_format="pyarrow",
                                   batch_size=None) \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_rows:
            for row in b.column("d").to_pylist():
                total += np.asarray(row, dtype=np.int64)
    return total


def coreness_words(sf_dir: str) -> pd.DataFrame:
    """Full k-core decomposition of the undirected word graph — the
    coreness of each word (max k such that the word survives repeated
    deletion of all degree-<k nodes), graph mining's density ladder
    and the missing iterative-peeling shape in the graph family
    (PageRank/BFS/shortest-paths/triangles/CC are all here already).

    Direct peeling costs one distributed sweep per REMOVAL ROUND
    (dozens of fixed-overhead Ray jobs); instead this runs the H-index
    iteration (Lü–Chen–Ren–Zhang–Zhou–Stanley, "The H-index of a
    network node and its relation to degree and coreness", Nature
    Communications 2016): h₀ = degree, hₜ₊₁(v) = H-index of the
    neighbors' hₜ — monotonically non-increasing and convergent to the
    coreness, one sweep per ITERATION. Each sweep ships node-bounded
    n×(C+1) histograms of clipped neighbor values (elementwise-sum
    partials), with C = the degree-sequence H-index, a sound cap
    because max coreness k* has ≥ k* nodes of degree ≥ k*. Rounds are
    data-dependent, so no SQL twin exists — kcore3_peel_words below is
    the fixed-round oracle-checked variant; pytest holds equality to
    brute-force peeling."""
    import ray as _ray

    idx, vocab = _word_undirected_edges(sf_dir)
    n = len(vocab)
    if n == 0:
        return pd.DataFrame({"word": pd.array([], dtype=object),
                             "coreness": pd.array([], dtype=np.int64)})
    deg = _alive_degree(idx, np.ones(n, dtype=bool))
    # degree-sequence H-index: largest C with ≥ C nodes of degree ≥ C
    ds_sorted = np.sort(deg)[::-1]
    C = int(np.max(np.minimum(ds_sorted,
                              np.arange(1, n + 1)))) if n else 0
    h = np.minimum(deg, C).astype(np.int64)

    while True:
        href = _ray.put(h)

        def hist_sweep(t: pa.Table, _h=href) -> pa.Table:
            cur = _ray.get(_h)
            i = t.column("i").to_numpy(zero_copy_only=False)
            j = t.column("j").to_numpy(zero_copy_only=False)
            # node-major histogram of neighbor h values (already ≤ C)
            flat = np.concatenate([i * (C + 1) + cur[j],
                                   j * (C + 1) + cur[i]])
            hist = np.bincount(flat, minlength=n * (C + 1)) \
                .astype(np.int64)
            # zero-copy list wrap (tolist of n·(C+1) ints is the slow path)
            arr = pa.ListArray.from_arrays(
                pa.array([0, len(hist)], pa.int32()), pa.array(hist))
            return pa.table({"hist": arr})

        hist = np.zeros(n * (C + 1), dtype=np.int64)
        for b in idx.map_batches(hist_sweep, batch_format="pyarrow",
                                 batch_size=None) \
                .iter_batches(batch_format="pyarrow", batch_size=None):
            if b.num_rows:
                flat = b.column("hist").combine_chunks() \
                    .flatten().to_numpy(zero_copy_only=False)
                hist += flat.reshape(-1, n * (C + 1)).sum(axis=0)
        hm = hist.reshape(n, C + 1)
        # R[v, x] = #neighbors with h ≥ x; new h = max x with R ≥ x
        r = np.cumsum(hm[:, ::-1], axis=1)[:, ::-1]
        x = np.arange(C + 1)
        nxt = np.max(np.where(r >= x, x, 0), axis=1).astype(np.int64)
        if np.array_equal(nxt, h):
            break
        h = nxt

    return pd.DataFrame({"word": vocab.to_numpy(), "coreness": h}) \
        .sort_values("word").reset_index(drop=True)


QUERIES["coreness_words"] = coreness_words


def kcore3_peel_words(sf_dir: str, k: int = 3, rounds: int = 3
                      ) -> pd.DataFrame:
    """SQL-checkable window into the peeling kernel: exactly `rounds`
    deletion rounds at fixed k=3 (the label_propagation fixed-iters
    trick — run to a fixpoint and this IS the 3-core). Emits every
    word with the round that removed it (1-based) or 0 if it survives
    all three rounds; each round is one streaming degree sweep over
    the same materialized edge index."""
    idx, vocab = _word_undirected_edges(sf_dir)
    n = len(vocab)
    alive = np.ones(n, dtype=bool)
    removed = np.zeros(n, dtype=np.int64)
    for r in range(1, rounds + 1):
        deg = _alive_degree(idx, alive)
        rm = alive & (deg < k)
        removed[rm] = r
        alive[rm] = False
    return pd.DataFrame({"word": vocab.to_numpy(),
                         "removed_round": removed}) \
        .sort_values("word").reset_index(drop=True)


QUERIES["kcore3_peel_words"] = kcore3_peel_words
ORACLES["kcore3_peel_words"] = """
    WITH lists AS (SELECT string_split(text, ' ') AS l FROM documents),
    big AS (SELECT DISTINCT p[1] AS w1, p[2] AS w2 FROM (
      SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p FROM lists
    )),
    e AS (SELECT DISTINCT LEAST(w1, w2) AS u, GREATEST(w1, w2) AS v
          FROM big WHERE w1 <> w2),
    adj AS (SELECT u AS w, v AS nb FROM e UNION ALL
            SELECT v AS w, u AS nb FROM e),
    nodes AS (SELECT DISTINCT w FROM adj),
    d1 AS (SELECT w, COUNT(*) AS d FROM adj GROUP BY w),
    r1 AS (SELECT w FROM d1 WHERE d < 3),
    a1 AS (SELECT w FROM nodes EXCEPT SELECT w FROM r1),
    d2 AS (SELECT adj.w, COUNT(*) AS d FROM adj
           JOIN a1 x ON x.w = adj.w JOIN a1 y ON y.w = adj.nb
           GROUP BY adj.w),
    r2 AS (SELECT w FROM a1 LEFT JOIN d2 USING (w)
           WHERE COALESCE(d, 0) < 3),
    a2 AS (SELECT w FROM a1 EXCEPT SELECT w FROM r2),
    d3 AS (SELECT adj.w, COUNT(*) AS d FROM adj
           JOIN a2 x ON x.w = adj.w JOIN a2 y ON y.w = adj.nb
           GROUP BY adj.w),
    r3 AS (SELECT w FROM a2 LEFT JOIN d3 USING (w)
           WHERE COALESCE(d, 0) < 3)
    SELECT w AS word,
           CAST(CASE WHEN w IN (SELECT w FROM r1) THEN 1
                     WHEN w IN (SELECT w FROM r2) THEN 2
                     WHEN w IN (SELECT w FROM r3) THEN 3
                     ELSE 0 END AS BIGINT) AS removed_round
    FROM nodes ORDER BY word
"""


def audio_spectral_stats(sf_dir: str) -> pd.DataFrame:
    """REAL audio DSP end-to-end: the cached real-WAV fixture table →
    actor-pool spectral features (Hann-windowed numpy rFFT inside the
    built-in RIFF codec path) → per-clip dominant frequency, spectral
    centroid and bandwidth. The fixtures are seeded sine+noise mixes,
    so pytest can assert the pipeline RECOVERS each clip's generator
    frequency within one FFT bin — a provable decode→transform→feature
    chain, not just plumbing. Deterministic, driver rows-only check."""
    import glob as _glob
    import tempfile

    import ray.data

    from ..stages.multimodal import AudioSpectralFeatures, make_real_wav_table

    n = max(32, int(2048 * sf_of(sf_dir)))
    cache = os.path.join(tempfile.gettempdir(), "raysketch_data",
                         f"wavs_n{n}_s9")
    if not _glob.glob(os.path.join(cache, "*.parquet")):  # self-healing guard
        import pyarrow.parquet as pq

        os.makedirs(cache, exist_ok=True)
        tmp = os.path.join(cache, "_part0.tmp")
        pq.write_table(make_real_wav_table(n, seed=9), tmp,
                       row_group_size=max(16, n // 4))
        os.replace(tmp, os.path.join(cache, "part0.parquet"))
    out = (
        ray.data.read_parquet(cache)
        .map_batches(AudioSpectralFeatures,
                     fn_constructor_kwargs={"deterministic_fake": False},
                     batch_format="pyarrow", batch_size=32,
                     concurrency=auto_concurrency())
        .to_pandas()
    )
    for c in ("dominant_freq_hz", "spectral_centroid_hz",
              "spectral_bandwidth_hz"):
        out[c] = out[c].round(6)
    return out.sort_values("item_id").reset_index(drop=True)


QUERIES["audio_spectral_stats"] = audio_spectral_stats


def cooccur_window_words(sf_dir: str, min_count: int = 1) -> pd.DataFrame:
    """Windowed word co-occurrence counts — the word2vec / GloVe
    preprocessing operator: every unordered word pair appearing within
    a 5-token sliding window (position gap 1..4) in any document, with
    exact occurrence counts plus each word's corpus unigram count (the
    PMI numerator/denominator components as exact ints, so any
    downstream PMI ranking is engine-independent — no float log sums
    cross the wire).

    Scale shape: per-batch fully vectorized pair expansion (documents
    split once; 4 shifted comparisons over the flattened token stream,
    doc boundaries masked via the repeat-encoded parent) → per-batch
    factorized pair value_counts partials (≤ distinct-pairs rows leave
    each batch, the combiner bound) → ONE pair-hash-bucketed exchange
    summed by Arrow C++ group_by. Unigram counts ride the same batches
    as a second tiny partial; text is read exactly once.

    ``min_count`` is applied INSIDE the bucket stage, so on a
    large-vocabulary corpus the driver materializes only the
    thresholded pair table (the GloVe workflow's standard cut), never
    the full O(V²) tail; unigram rows are exempt so every surviving
    pair still finds its counts."""
    from ..hashing import arrow_to_flat_bytes, murmur64a
    from ..stages.dedup import _splitmix64

    W, B = 4, 32

    def pair_partials(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(
            pc.fill_null(t.column("text"), ""), " ").combine_chunks()
        counts = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        parent = np.repeat(np.arange(t.num_rows, dtype=np.int64), counts)
        codes, uniq = pd.factorize(
            flat.to_numpy(zero_copy_only=False), sort=True)
        # sort=True ⇒ code order IS lexicographic word order, so the
        # unordered pair canonicalization (lo, hi) is exact min/max on
        # int codes — no per-element string comparisons
        nz = uniq != ""   # '' tokens hold a position but never pair
        v = np.int64(len(uniq))
        keys = []
        for d in range(1, W + 1):
            if len(codes) <= d:
                break
            a, b = codes[:-d], codes[d:]
            ok = (parent[:-d] == parent[d:]) & nz[a] & nz[b]
            lo = np.minimum(a[ok], b[ok]).astype(np.int64)
            hi = np.maximum(a[ok], b[ok]).astype(np.int64)
            keys.append(lo * v + hi)
        key = np.concatenate(keys) if keys else np.empty(0, np.int64)
        uk, c = np.unique(key, return_counts=True)
        w1 = pa.array(uniq[(uk // v)], type=pa.string())
        w2 = pa.array(uniq[(uk % v)], type=pa.string())
        joined = pc.binary_join_element_wise(w1, w2, " ")
        data, offs = arrow_to_flat_bytes(joined)
        bkt = (murmur64a(data, offs) % np.uint64(B)).astype(np.int64)
        # unigram partials share the exchange under pair-impossible
        # bucket ids (B + word-hash bucket): one pipeline, one pass
        ucode, ucnt = np.unique(codes[nz[codes]], return_counts=True)
        uw = pa.array(uniq[ucode], type=pa.string())
        ud, uo = arrow_to_flat_bytes(uw)
        ubkt = (B + (murmur64a(ud, uo) % np.uint64(B))).astype(np.int64)
        return pa.table({
            "w1": pa.concat_arrays([w1, uw]),
            "w2": pa.concat_arrays(
                [w2, pa.array([""] * len(uw), type=pa.string())]),
            "c": pa.array(np.concatenate([c, ucnt])),
            "__b": pa.array(np.concatenate([bkt, ubkt])),
        })

    def bucket_sum(g: pa.Table) -> pa.Table:
        out = g.group_by(["w1", "w2"]).aggregate([("c", "sum")])
        c = pc.cast(out.column("c_sum"), pa.int64())
        out = pa.table({"w1": out.column("w1"),
                        "w2": out.column("w2"), "c": c})
        if min_count > 1:
            keep = pc.or_(pc.greater_equal(out.column("c"),
                                           pa.scalar(min_count)),
                          pc.equal(out.column("w2"), pa.scalar("")))
            out = out.filter(keep)
        return out

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    folded = ds.map_batches(pair_partials, batch_format="pyarrow") \
        .groupby("__b").map_groups(bucket_sum, batch_format="pyarrow") \
        .to_pandas()
    uni = folded[folded["w2"] == ""].set_index("w1")["c"]
    pairs = folded[folded["w2"] != ""].copy()
    pairs["c1"] = uni.reindex(pairs["w1"]).to_numpy()
    pairs["c2"] = uni.reindex(pairs["w2"]).to_numpy()
    pairs = pairs.rename(columns={"c": "c_ab"}).astype(
        {"c_ab": "int64", "c1": "int64", "c2": "int64"})
    return pairs[["w1", "w2", "c_ab", "c1", "c2"]] \
        .sort_values(["w1", "w2"]).reset_index(drop=True)


def recluster_transcripts(sf_dir: str) -> pd.DataFrame:
    """The WRITE side of the segmented-reconstruction contract:
    re-cluster the transcript table into the conversation-contiguous
    range-partitioned layout whose parquet footer statistics the
    zero-shuffle reader (:func:`_conv_file_plan`) accepts —
    :func:`~raysketch.stages.sortsink.sorted_partitioned_write` over
    the composite (conv_number << 20 | turn_idx) integer key: one
    range exchange, per-bucket vectorized sort, one stats-bearing
    parquet file per bucket, deterministic pure-integer bucket bounds
    (no sampling). Bucket cuts may land mid-conversation — exactly the
    boundary-straddling case the reader's repair stage handles, which
    the round-trip test exercises end-to-end. Returns the manifest
    decoded to conversation numbers (rows-only driver check:
    transcripts are not a DuckDB view)."""
    import glob as _glob
    import tempfile

    from ..stages.sortsink import sorted_partitioned_write

    ds = transcripts_ds(sf_dir, columns=["conv_id", "turn_idx", "text"])

    def ckey(t: pa.Table) -> pa.Table:
        num = pc.cast(pc.utf8_slice_codeunits(
            t.column("conv_id"), 5, 32), pa.int64())
        k = pc.add(pc.shift_left(num, pa.scalar(20, type=pa.int64())),
                   pc.cast(t.column("turn_idx"), pa.int64()))
        return t.append_column("ckey", k)

    out_dir = os.path.join(tempfile.gettempdir(), "raysketch_data",
                           f"reclustered_{sf_of(sf_dir)}")
    for stale in _glob.glob(os.path.join(out_dir, "*.parquet")):
        os.unlink(stale)
    man = sorted_partitioned_write(
        ds.map_batches(ckey, batch_format="pyarrow"), "ckey", out_dir,
        num_buckets=32)
    return pd.DataFrame({
        "bucket": man["bucket"],
        "n_rows": man["n_rows"],
        "conv_lo": man["key_min"] // (1 << 20),
        "conv_hi": man["key_max"] // (1 << 20),
    })


QUERIES["kll_text_len_by_role"] = kll_text_len_by_role
QUERIES["tdigest_text_len_by_role"] = tdigest_text_len_by_role
QUERIES["ddsketch_text_len_by_role"] = ddsketch_text_len_by_role
QUERIES["req_text_len_tails_by_role"] = req_text_len_tails_by_role
QUERIES["lm_score_turns_by_role"] = lm_score_turns_by_role
QUERIES["recluster_transcripts"] = recluster_transcripts
def top_pmi_pairs(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Top-k word pairs by PMI over the windowed co-occurrence counts —
    ranked WITHOUT floats: PMI = log(c_ab·T/(c1·c2)) is monotone in the
    rational c_ab·T/(c1·c2), so the rank key is the exact fixed-point
    integer c_ab·T·10⁶ // (c1·c2) (Python ints on the tiny driver-side
    pair table ≡ DuckDB HUGEINT; float log sums would make the ranking
    engine-dependent at ties and near-ties). T = total window pair
    instances. Ties break on (w1, w2)."""
    pairs = cooccur_window_words(sf_dir)
    T = int(pairs["c_ab"].sum())
    key = [c_ab * T * 10**6 // (c1 * c2)
           for c_ab, c1, c2 in zip(pairs["c_ab"], pairs["c1"],
                                   pairs["c2"])]
    pairs = pairs.assign(pmi_fp6=pd.array(key, dtype="int64"))
    out = pairs.sort_values(["pmi_fp6", "w1", "w2"],
                            ascending=[False, True, True]).head(k)
    return out[["w1", "w2", "c_ab", "pmi_fp6"]].reset_index(drop=True)


QUERIES["top_pmi_pairs"] = top_pmi_pairs
ORACLES["top_pmi_pairs"] = """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
               FROM documents),
    p AS (SELECT doc_id, CAST(p AS BIGINT) AS pos,
                 list_extract(words, CAST(p AS INT)) AS w
          FROM (SELECT doc_id, words,
                       unnest(range(1, len(words) + 1)) AS p FROM w)),
    pp AS (SELECT least(a.w, b.w) AS w1, greatest(a.w, b.w) AS w2
           FROM p a JOIN p b
             ON a.doc_id = b.doc_id AND b.pos > a.pos
            AND b.pos <= a.pos + 4
           WHERE a.w <> '' AND b.w <> ''),
    uni AS (SELECT w, COUNT(*) AS c FROM p WHERE w <> '' GROUP BY w),
    pc2 AS (SELECT w1, w2, COUNT(*) AS c_ab FROM pp GROUP BY w1, w2),
    tot AS (SELECT CAST(SUM(c_ab) AS HUGEINT) AS T FROM pc2)
    SELECT w1, w2, CAST(c_ab AS BIGINT) AS c_ab,
           CAST(CAST(c_ab AS HUGEINT) * T * 1000000
                // (CAST(u1.c AS HUGEINT) * u2.c) AS BIGINT) AS pmi_fp6
    FROM pc2, tot
    JOIN uni u1 ON u1.w = pc2.w1
    JOIN uni u2 ON u2.w = pc2.w2
    ORDER BY pmi_fp6 DESC, w1, w2
    LIMIT 20
"""


QUERIES["cooccur_window_words"] = cooccur_window_words
ORACLES["cooccur_window_words"] = """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
               FROM documents),
    p AS (SELECT doc_id, CAST(p AS BIGINT) AS pos,
                 list_extract(words, CAST(p AS INT)) AS w
          FROM (SELECT doc_id, words,
                       unnest(range(1, len(words) + 1)) AS p FROM w)),
    pp AS (SELECT least(a.w, b.w) AS w1, greatest(a.w, b.w) AS w2
           FROM p a JOIN p b
             ON a.doc_id = b.doc_id AND b.pos > a.pos
            AND b.pos <= a.pos + 4
           WHERE a.w <> '' AND b.w <> ''),
    uni AS (SELECT w, COUNT(*) AS c FROM p WHERE w <> '' GROUP BY w),
    pc2 AS (SELECT w1, w2, COUNT(*) AS c_ab FROM pp GROUP BY w1, w2)
    SELECT w1, w2, CAST(c_ab AS BIGINT) AS c_ab,
           CAST(u1.c AS BIGINT) AS c1, CAST(u2.c AS BIGINT) AS c2
    FROM pc2
    JOIN uni u1 ON u1.w = pc2.w1
    JOIN uni u2 ON u2.w = pc2.w2
    ORDER BY w1, w2
"""


def kmeans_fixedpoint_embeddings(sf_dir: str, k: int = 8, iters: int = 4,
                      scale: int = 4096) -> pd.DataFrame:
    """Distributed Lloyd k-means over the embedding table, SQL-checked
    END TO END — the fixed-point twin of `kmeans_embeddings` (whose
    float centroids make only its inner assignment loop SQL-statable):
    the full ITERATIVE algorithm (quantize → k rounds of assign +
    recenter → final assignment) in exact fixed point, so the DuckDB
    oracle states every round verbatim as unrolled CTEs and the final
    (vec_id, cluster) frame value-hash-matches. Each round is one
    map_batches pass emitting ≤k tiny (cid, count, int64-sum) partial
    rows per batch — the embedding vectors cross the wire exactly once
    (the quantized materialize); centroids ride closures. Init = the k
    lowest vec_ids (deterministic, SQL-statable); ties break to the
    lowest cid; recenter is floor division (``//`` with the
    nonneg-remainder form on the SQL side — DuckDB ``//`` truncates on
    negatives, queries.py dsir precedent)."""
    from ..stages.similarity import kmeans_fixedpoint

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return kmeans_fixedpoint(ds, k=k, iters=iters, scale=scale)


def _kmeans_oracle(k: int = 8, iters: int = 4, scale: int = 4096) -> str:
    parts = [f"""
    WITH q AS (
      SELECT vec_id,
             CAST(unnest(range(len(embedding))) AS BIGINT) AS dim,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {scale})
                  AS BIGINT) AS v
      FROM embeddings
    ), init AS (
      SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid
      FROM (SELECT DISTINCT vec_id FROM embeddings ORDER BY vec_id
            LIMIT {k})
    ), c0 AS (
      SELECT init.cid, q.dim, q.v AS cv
      FROM q JOIN init ON q.vec_id = init.vec_id
    )"""]
    for i in range(1, iters + 1):
        parts.append(f""", a{i} AS (
      SELECT vec_id, cid FROM (
        SELECT t.vec_id, t.cid,
               ROW_NUMBER() OVER (PARTITION BY t.vec_id
                                  ORDER BY t.d, t.cid) AS rn
        FROM (SELECT q.vec_id, c.cid,
                     SUM((q.v - c.cv) * (q.v - c.cv)) AS d
              FROM q JOIN c{i - 1} c ON q.dim = c.dim
              GROUP BY q.vec_id, c.cid) t
      ) WHERE rn = 1
    ), c{i} AS (
      SELECT pc.cid, pc.dim, COALESCE(ns.cv, pc.cv) AS cv
      FROM c{i - 1} pc LEFT JOIN (
        SELECT a.cid, q.dim,
               (SUM(q.v) - (((SUM(q.v) % COUNT(*)) + COUNT(*)) % COUNT(*)))
                 // COUNT(*) AS cv
        FROM a{i} a JOIN q ON q.vec_id = a.vec_id
        GROUP BY a.cid, q.dim) ns
      ON pc.cid = ns.cid AND pc.dim = ns.dim
    )""")
    # final assignment against the post-round centroids (the pipeline's
    # closing assign pass runs AFTER the last recenter)
    parts.append(f""", afin AS (
      SELECT vec_id, cid FROM (
        SELECT t.vec_id, t.cid,
               ROW_NUMBER() OVER (PARTITION BY t.vec_id
                                  ORDER BY t.d, t.cid) AS rn
        FROM (SELECT q.vec_id, c.cid,
                     SUM((q.v - c.cv) * (q.v - c.cv)) AS d
              FROM q JOIN c{iters} c ON q.dim = c.dim
              GROUP BY q.vec_id, c.cid) t
      ) WHERE rn = 1
    )
    SELECT vec_id, CAST(cid AS BIGINT) AS cluster
    FROM afin ORDER BY vec_id""")
    return "".join(parts)


QUERIES["kmeans_fixedpoint_embeddings"] = kmeans_fixedpoint_embeddings
ORACLES["kmeans_fixedpoint_embeddings"] = _kmeans_oracle()


def join_size_view_purchase(sf_dir: str, num_buckets: int = 64
                            ) -> pd.DataFrame:
    """Exact join cardinality |views ⋈ purchases ON user_id| — the
    classic Σ_u v_u·p_u inner product of the two per-key frequency
    vectors, computed WITHOUT materializing the join: per-batch
    value_counts pre-reduce each side to (user, v, p) partial rows, ONE
    user-hash bucket exchange co-locates each user's partials, each
    bucket folds to a single int64 Σ v·p row (sort + reduceat, then one
    dot), and the driver sums ≤num_buckets rows. int64-safe whenever the
    answer itself fits SQL BIGINT (every per-user product is ≤ the
    total). The CMS twin `cms_join_size_user_events` estimates the same
    number in one pass with bounded state."""
    from ..stages.dedup import _splitmix64 as _mix64

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def part(t: pa.Table) -> pa.Table:
        out_u, out_v, out_p = [], [], []
        uv = t.filter(pc.equal(t.column("event_type"), "view"))
        up = t.filter(pc.equal(t.column("event_type"), "purchase"))
        cv = pc.value_counts(uv.column("user_id").combine_chunks())
        cp = pc.value_counts(up.column("user_id").combine_chunks())
        u = np.union1d(cv.field("values").to_numpy(zero_copy_only=False)
                       if len(cv) else np.array([], dtype=np.int64),
                       cp.field("values").to_numpy(zero_copy_only=False)
                       if len(cp) else np.array([], dtype=np.int64))
        v = np.zeros(len(u), dtype=np.int64)
        p = np.zeros(len(u), dtype=np.int64)
        if len(cv):
            v[np.searchsorted(u, cv.field("values").to_numpy(
                zero_copy_only=False))] = cv.field("counts").to_numpy()
        if len(cp):
            p[np.searchsorted(u, cp.field("values").to_numpy(
                zero_copy_only=False))] = cp.field("counts").to_numpy()
        b = (_mix64(u.astype(np.uint64))
             % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({"user_id": pa.array(u), "v": pa.array(v),
                         "p": pa.array(p), "__b": pa.array(b)})

    def fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("user_id")
        u = g["user_id"].to_numpy()
        starts = np.nonzero(np.r_[True, u[1:] != u[:-1]])[0]
        v = np.add.reduceat(g["v"].to_numpy(), starts)
        p = np.add.reduceat(g["p"].to_numpy(), starts)
        return pd.DataFrame({"part": [np.dot(v, p)]}).astype("int64")

    parts = ds.map_batches(part, batch_format="pyarrow") \
        .groupby("__b").map_groups(fold_bucket, batch_format="pandas") \
        .to_pandas()
    return _one_row(join_size=int(parts["part"].sum()))


QUERIES["join_size_view_purchase"] = join_size_view_purchase
ORACLES["join_size_view_purchase"] = """
    SELECT CAST(COUNT(*) AS BIGINT) AS join_size
    FROM (SELECT user_id FROM events WHERE event_type = 'view') v
    JOIN (SELECT user_id FROM events WHERE event_type = 'purchase') p
      USING (user_id)
"""


def cms_join_size_user_events(sf_dir: str, width: int = 1 << 15,
                              depth: int = 5) -> pd.DataFrame:
    """Join-size ESTIMATION from two Count-Min sketches (Cormode–
    Muthukrishnan §4.2): |views ⋈ purchases ON user_id| ≈ min over rows
    of the counter-array dot product — bounded state (d×w ints per
    side) where the exact twin `join_size_view_purchase` shuffles one
    row per distinct key. ONE pass folds both sides' partials per batch
    (the read dominates); merges are counter sums so the result is
    byte-deterministic at any parallelism. Guarantee: never below the
    true size, over by ≤ (e/w)·N_view·N_purchase w.p. ≥ 1−e^−d —
    enforced against the exact twin in pytest. Rows-only driver entry
    (the estimator is not SQL-statable)."""
    from ..sketches.cms import CountMin

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def part(t: pa.Table) -> pa.Table:
        blobs = []
        for ev in ("view", "purchase"):
            cm = CountMin(width=width, depth=depth)
            cm.add_batch(t.filter(
                pc.equal(t.column("event_type"), ev)).column("user_id"))
            blobs.append(cm.to_bytes())
        return pa.table({"view": pa.array([blobs[0]], type=pa.binary()),
                         "purchase": pa.array([blobs[1]], type=pa.binary())})

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    sides = {}
    for ev in ("view", "purchase"):
        cm = CountMin(width=width, depth=depth)
        for blob in parts[ev]:
            cm.merge(CountMin.from_bytes(blob))
        sides[ev] = cm
    return _one_row(
        join_size_est=sides["view"].inner_product(sides["purchase"]),
        n_view=sides["view"].total, n_purchase=sides["purchase"].total)


QUERIES["cms_join_size_user_events"] = cms_join_size_user_events


def source_drift_tv(sf_dir: str) -> pd.DataFrame:
    """Distribution-drift audit across sources, SQL-checked: total-
    variation distance between each source's char-bigram distribution
    and the whole corpus's — the domain-shift signal a training-data
    pipeline watches when a new crawl/source lands (KL needs libm logs;
    TV = ½·Σ|p_s − q| is the log-free f-divergence a SQL oracle can
    state EXACTLY: one HUGEINT-safe floor division per source,
    ``(Σ|c_s·N − c·N_s|·10⁶) // (2·N_s·N)``). ONE zero-shuffle pass:
    each batch emits ≤n_sources 65536-entry bincount partial rows (the
    lm.py combiner shape, doc-boundary-masked so no cross-document
    pairs); the driver folds and does the per-source arithmetic in
    Python big ints, so counter products can't overflow at corpus
    scale. Output (source, n_pairs, tv_fp6) in millionths."""
    from ..stages.lm import _pair_arrays

    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def part(t: pa.Table) -> pa.Table:
        src = np.asarray(t.column("source").to_pylist(), dtype=object)
        texts = t.column("text").to_pylist()
        if not len(src):
            return pa.table({"source": pa.array([], type=pa.string()),
                             "v": pa.array([], type=pa.large_binary())})
        us, inv = np.unique(src.astype(str), return_inverse=True)
        rows_v = []
        for j in range(len(us)):
            idx = np.nonzero(inv == j)[0]
            a, b, _ = _pair_arrays([texts[i] for i in idx])
            cnt = (np.bincount(a * 256 + b, minlength=65536)
                   .astype(np.int64) if len(a)
                   else np.zeros(65536, dtype=np.int64))
            rows_v.append(cnt.tobytes())  # raw int64[65536], no py-int churn
        return pa.table({"source": pa.array(list(us), type=pa.string()),
                         "v": pa.array(rows_v, type=pa.large_binary())})

    per_src: dict[str, np.ndarray] = {}
    for blk in ds.map_batches(part, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        for s_, row in zip(blk.column("source").to_pylist(),
                           blk.column("v").to_pylist()):
            acc = per_src.setdefault(s_, np.zeros(65536, dtype=np.int64))
            acc += np.frombuffer(row, dtype=np.int64)
    if not per_src:
        return pd.DataFrame({"source": [],
                             "n_pairs": pd.Series([], dtype="int64"),
                             "tv_fp6": pd.Series([], dtype="int64")})
    tot = np.zeros(65536, dtype=object)
    for cnt in per_src.values():
        tot = tot + cnt.astype(object)
    n = int(tot.sum())
    out = []
    for s_ in sorted(per_src):
        cs = per_src[s_].astype(object)
        n_s = int(cs.sum())
        if n_s == 0 or n == 0:
            continue  # sources with no pairs have no distribution
        num = int(np.abs(cs * n - tot * n_s).sum())
        out.append((s_, n_s, (num * 1_000_000) // (2 * n_s * n)))
    return pd.DataFrame(out, columns=["source", "n_pairs", "tv_fp6"]) \
        .astype({"n_pairs": "int64", "tv_fp6": "int64"})


QUERIES["source_drift_tv"] = source_drift_tv
ORACLES["source_drift_tv"] = """
    WITH pos AS (
      SELECT source, unnest(generate_series(1, length(text) - 1)) AS i,
             text
      FROM documents),
    p AS (SELECT source, substring(text, i, 2) AS bg FROM pos),
    sc AS (SELECT source, bg, CAST(COUNT(*) AS BIGINT) AS c
           FROM p GROUP BY source, bg),
    tot AS (SELECT bg, CAST(SUM(c) AS BIGINT) AS c FROM sc GROUP BY bg),
    ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_s
           FROM sc GROUP BY source),
    n AS (SELECT CAST(SUM(c) AS HUGEINT) AS n FROM tot),
    terms AS (
      SELECT ns.source, ns.n_s,
             ABS(CAST(COALESCE(sc.c, 0) AS HUGEINT) * (SELECT n FROM n)
                 - CAST(tot.c AS HUGEINT) * ns.n_s) AS term
      FROM ns CROSS JOIN tot
      LEFT JOIN sc ON sc.source = ns.source AND sc.bg = tot.bg)
    SELECT source, n_s AS n_pairs,
           CAST((SUM(term) * 1000000)
                // (2 * CAST(n_s AS HUGEINT) * (SELECT n FROM n))
                AS BIGINT) AS tv_fp6
    FROM terms GROUP BY source, n_s ORDER BY source
"""


def moments_text_len(sf_dir: str) -> pd.DataFrame:
    """The moments sketch's DISTRIBUTED state, SQL-checked exactly
    (Gan VLDB'18, sketches/moments.py — the fourth quantile family;
    ~150-byte state, integer-addition merges): power sums
    S_p = Σ len(text)^p for p = 1..8 accumulate as EXACT Python big
    ints through per-batch folds and the grouped tree merge, so the
    DuckDB oracle states the identical sums in HUGEINT (558^8 ≈ 10²²
    overflows BIGINT at p ≥ 4) and both engines compare decimal
    strings — a sketch family whose whole distributed surface is
    value-hash-checkable, not just error-banded."""
    from ..agg import sketch_aggregate

    ds = _read(sf_dir, "documents", columns=["text"])
    ds = ds.map_batches(
        lambda t: pa.table({"text_len": pc.cast(
            pc.utf8_length(t.column("text")), pa.int64())}),
        batch_format="pyarrow")
    est = sketch_aggregate(ds, "moments", on="text_len",
                           mode="estimate", k=8)
    rows = [(p, est[f"m{p}"]) for p in range(1, 9)]
    return pd.DataFrame(rows, columns=["p", "s"]) \
        .astype({"p": "int64", "s": "str"})


QUERIES["moments_text_len"] = moments_text_len
ORACLES["moments_text_len"] = """
    WITH l AS (SELECT CAST(LENGTH(text) AS HUGEINT) AS v FROM documents)
    SELECT CAST(p AS BIGINT) AS p, CAST(s AS VARCHAR) AS s FROM (
      SELECT 1 AS p, SUM(v) AS s FROM l UNION ALL
      SELECT 2, SUM(v*v) FROM l UNION ALL
      SELECT 3, SUM(v*v*v) FROM l UNION ALL
      SELECT 4, SUM(v*v*v*v) FROM l UNION ALL
      SELECT 5, SUM(v*v*v*v*v) FROM l UNION ALL
      SELECT 6, SUM(v*v*v*v*v*v) FROM l UNION ALL
      SELECT 7, SUM(v*v*v*v*v*v*v) FROM l UNION ALL
      SELECT 8, SUM(v*v*v*v*v*v*v*v) FROM l)
    ORDER BY p
"""


def moments_quantiles_text_len(sf_dir: str) -> pd.DataFrame:
    """Quantiles FROM the moments state (the paper's point: answer
    quantile queries from a ~150-byte mergeable summary): document
    text-length p10/p50/p90/p99 via the maximum-entropy density fit
    over the exactly-merged power sums. The state merge is commutative
    integer addition, so — like DDSketch and unlike KLL/t-digest —
    this is bit-deterministic at any parallelism with NO per-file-fold
    crutch; the maxent solve is a driver-side computation on 11
    numbers. Rows-only entry (the estimate has no closed SQL form);
    pytest holds a measured rank-error band vs the exact quantiles
    (test_moments_quantiles_rank_error)."""
    from ..agg import sketch_aggregate
    from ..sketches import MomentsSketch

    ds = _read(sf_dir, "documents", columns=["text"])
    ds = ds.map_batches(
        lambda t: pa.table({"text_len": pc.cast(
            pc.utf8_length(t.column("text")), pa.int64())}),
        batch_format="pyarrow")
    blob = sketch_aggregate(ds, "moments", on="text_len",
                            mode="bytes", k=8)
    sk = MomentsSketch.from_bytes(blob)
    return _one_row(n=int(sk.n), vmin=int(sk.vmin), vmax=int(sk.vmax),
                    p10=sk.quantile(0.10), p50=sk.quantile(0.50),
                    p90=sk.quantile(0.90), p99=sk.quantile(0.99))


QUERIES["moments_quantiles_text_len"] = moments_quantiles_text_len


def moments_text_len_by_source(sf_dir: str) -> pd.DataFrame:
    """GROUPED cell of the moments family — and the first grouped
    sketch whose merged STATE is fully value-hash-checked: per-source
    power sums S_1..S_4 of document text lengths (p ≤ 4 keeps the SQL
    readable; the global query states all 8). The source domain is
    tiny (20), so the merge is the one-global-tree-reduce path
    (by_mode="global", the by-role HLL/DDSketch precedent); integer
    addition makes every per-group state exact, so DuckDB states the
    identical HUGEINT sums per source and the hashes must match — a
    stronger check than the error-banded grouped quantile twins."""
    from ..agg import sketch_aggregate

    ds = _read(sf_dir, "documents", columns=["source", "text"])
    ds = ds.map_batches(
        lambda t: pa.table({
            "source": t.column("source"),
            "text_len": pc.cast(pc.utf8_length(t.column("text")),
                                pa.int64())}),
        batch_format="pyarrow")
    out = sketch_aggregate(ds, "moments", on="text_len", by="source",
                           mode="estimate", by_mode="global", k=4)
    st = pd.DataFrame(list(out["moments_merged"]))
    res = pd.concat([out[["source"]].reset_index(drop=True),
                     st[["n", "m1", "m2", "m3", "m4"]]
                     .reset_index(drop=True)], axis=1)
    return res.sort_values("source").reset_index(drop=True) \
        .astype({"source": "str", "n": "int64",
                 "m1": "str", "m2": "str", "m3": "str", "m4": "str"})


QUERIES["moments_text_len_by_source"] = moments_text_len_by_source
ORACLES["moments_text_len_by_source"] = """
    WITH l AS (SELECT source, CAST(LENGTH(text) AS HUGEINT) AS v
               FROM documents)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(v) AS VARCHAR) AS m1,
           CAST(SUM(v*v) AS VARCHAR) AS m2,
           CAST(SUM(v*v*v) AS VARCHAR) AS m3,
           CAST(SUM(v*v*v*v) AS VARCHAR) AS m4
    FROM l GROUP BY source ORDER BY source
"""


def fd_spectrum_by_label(sf_dir: str) -> pd.DataFrame:
    """Grouped cell of the matrix-sketch family: per-LABEL top singular
    values of the embedding sub-corpora — the per-class spectral
    fingerprint (a drift/collapse signal per category at 100 TB, from
    one ℓ×64 state per label). Per-(file, label) partials +
    lexicographic per-group blob merges (`sketch_aggregate_files(
    by=...)`, the grouped-determinism discipline — FD's SVD shrink is
    order-sensitive). Rows-only; pytest holds each label's σᵢ(B)²
    within its own shed bound of the exact per-label σᵢ(A)²."""
    import glob

    from ..agg import sketch_aggregate_files

    files = sorted(glob.glob(os.path.join(sf_dir, "embeddings.parquet"))) \
        or sorted(glob.glob(os.path.join(sf_dir, "embeddings", "*.parquet")))
    out = sketch_aggregate_files(
        files, "fd", on="embedding", by=["label"],
        mode=lambda acc: acc.finalize(), ell=32,
    ).to_pandas()
    st = pd.DataFrame(list(out["fd_merged"]))
    res = pd.concat([out[["label"]].reset_index(drop=True),
                     st.reset_index(drop=True)], axis=1)
    return res.sort_values("label").reset_index(drop=True) \
        .astype({"label": "int32", "n": "int64"})


QUERIES["fd_spectrum_by_label"] = fd_spectrum_by_label


def fd_embedding_spectrum(sf_dir: str) -> pd.DataFrame:
    """MATRIX sketching over the embedding corpus — Frequent Directions
    (Liberty KDD'13 / GLPW SICOMP'16, sketches/fd.py): the top singular
    values (≈ PCA energy) of the n×64 embedding matrix read from an
    ℓ=32-row mergeable state, with the deterministic spectral guarantee
    0 ⪯ AᵀA−BᵀB, ‖AᵀA−BᵀB‖₂ ≤ 2‖A‖²_F/ℓ — at 100 TB the corpus's
    low-rank structure comes out of KB-sized partials, no n×n, no row
    shuffle. Shrink (SVD) is order-sensitive like KLL compaction, so
    the distributed run uses the established determinism discipline:
    one partial per input FILE + canonical_sketch_reduce. Rows-only
    entry (an SVD has no SQL form); pytest checks every reported σᵢ(B)²
    against the exact σᵢ(A)² within the sketch's own a-posteriori
    bound, plus rerun frame-equality
    (test_fd_embedding_spectrum_vs_exact)."""
    import glob

    from ..agg import sketch_aggregate_files

    files = sorted(glob.glob(os.path.join(sf_dir, "embeddings.parquet"))) \
        or sorted(glob.glob(os.path.join(sf_dir, "embeddings", "*.parquet")))
    est = sketch_aggregate_files(
        files, "fd", on="embedding",
        mode=lambda acc: acc.finalize(), ell=32,
    )
    return _one_row(**est)


QUERIES["fd_embedding_spectrum"] = fd_embedding_spectrum


_ROLLUP_RANGES = [("2024-01-01", "2024-01-10"),
                  ("2024-01-11", "2024-01-30"),
                  ("2024-01-01", "2024-01-30")]


def _users_rollup(sf_dir: str, sketch: str) -> str:
    """Build (once, cached under /tmp) the per-DAY rollup state table
    of event user_ids for ``sketch`` — the Druid/DataSketches
    "sketch column" warehouse pattern (stages/rollup.py)."""
    import tempfile

    from ..stages.rollup import build_sketch_rollup

    tag = sf_of(sf_dir)
    out = os.path.join(tempfile.gettempdir(), "raysketch_data",
                       f"rollup_users_{sketch}_{tag}")
    if os.path.exists(out):
        return out
    ds = _read(sf_dir, "events", columns=["ts", "user_id"])
    ds = ds.map_batches(
        lambda t: pa.table({
            "day": pc.strftime(t.column("ts"), format="%Y-%m-%d"),
            "user_id": t.column("user_id")}),
        batch_format="pyarrow")
    build_sketch_rollup(ds, key_col="day", on="user_id", sketch=sketch,
                        out_dir=out)
    return out


def rollup_distinct_users_ranges(sf_dir: str) -> pd.DataFrame:
    """Sketch-ROLLUP state table, oracle-checked: daily ExactSet states
    of active users persisted as parquet ``(day, state)`` rows (built
    once, distributed fold → grouped tree merge → sink), then THREE
    date-range distinct-user questions answered by merging the
    matching rows' states — read cost ∝ days in range, the raw event
    rows are never rescanned. Set union is exact, so the DuckDB oracle
    states COUNT(DISTINCT) over the raw table per range and the value
    hashes must match — proving the rollup loop (build → persist →
    range-merge) end to end. The HLL twin (rollup_hll_users_ranges)
    answers the same ranges from KB-sized states at any cardinality."""
    from ..sketches import ExactSet
    from ..stages.rollup import read_rollup_range

    path = _users_rollup(sf_dir, "set")
    rows = []
    for lo, hi in _ROLLUP_RANGES:
        acc: ExactSet = read_rollup_range(path, lo, hi, "set",
                                          key_col="day")
        assert not acc.truncated  # 2^16 cap ≫ any test-sf user count
        rows.append((lo, hi, len(acc.items)))
    return pd.DataFrame(rows, columns=["lo", "hi", "n_distinct"]) \
        .astype({"lo": "str", "hi": "str", "n_distinct": "int64"})


QUERIES["rollup_distinct_users_ranges"] = rollup_distinct_users_ranges
ORACLES["rollup_distinct_users_ranges"] = """
    WITH r(lo, hi) AS (VALUES ('2024-01-01', '2024-01-10'),
                              ('2024-01-11', '2024-01-30'),
                              ('2024-01-01', '2024-01-30'))
    SELECT lo, hi, CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_distinct
    FROM r JOIN events e
      ON CAST(e.ts AS DATE) BETWEEN CAST(lo AS DATE) AND CAST(hi AS DATE)
    GROUP BY lo, hi ORDER BY lo, hi
"""


def rollup_hll_users_ranges(sf_dir: str) -> pd.DataFrame:
    """The same three range questions answered from the HLL rollup —
    the state that stays KB-sized at 10⁹ distinct users where ExactSet
    caps out. Register max-merge is idempotent and commutative, so the
    stored blobs and every range answer are deterministic. Rows-only
    entry; pytest asserts each estimate within the HLL band of (and,
    in this LC regime, exactly equal to) the ExactSet twin's exact
    counts, plus the append-equivalence of the rollup itself
    (test_rollup_append_equivalence)."""
    from ..stages.rollup import read_rollup_range

    path = _users_rollup(sf_dir, "hll")
    rows = []
    for lo, hi in _ROLLUP_RANGES:
        acc = read_rollup_range(path, lo, hi, "hll", key_col="day")
        rows.append((lo, hi, int(acc.count())))
    return pd.DataFrame(rows, columns=["lo", "hi", "n_distinct_est"]) \
        .astype({"lo": "str", "hi": "str", "n_distinct_est": "int64"})


QUERIES["rollup_hll_users_ranges"] = rollup_hll_users_ranges


def rollup_churn_users_ranges(sf_dir: str) -> pd.DataFrame:
    """SET OPERATIONS across rollup ranges — the churn/retention
    question answered purely from the persisted state table: for two
    adjacent date ranges (single days here — the corpus's users are
    near-uniformly active, so day granularity is where cohorts
    actually differ), how many users were active in A but not B
    (churned), in B but not A (new), and in both (retained). ExactSet
    states make all three EXACT (set difference/intersection of the
    two merged range states), so the DuckDB oracle states them from
    the raw table with EXCEPT/INTERSECT semantics and the value hashes
    must match. Same two KB-row reads as rollup_distinct_users_ranges
    — the raw events are never rescanned; at 10⁹ users per range the
    HLL twin's inclusion-exclusion replaces the exact sets (the
    documented KMV/HLL overlap caveat)."""
    from ..stages.rollup import read_rollup_range

    path = _users_rollup(sf_dir, "set")
    a = read_rollup_range(path, "2024-01-02", "2024-01-02", "set",
                          key_col="day")
    b = read_rollup_range(path, "2024-01-03", "2024-01-03", "set",
                          key_col="day")
    assert not a.truncated and not b.truncated
    sa, sb = set(a.items), set(b.items)
    return pd.DataFrame(
        [("churned", len(sa - sb)), ("new", len(sb - sa)),
         ("retained", len(sa & sb))],
        columns=["cohort", "n_users"]).astype({"n_users": "int64"})


QUERIES["rollup_churn_users_ranges"] = rollup_churn_users_ranges
ORACLES["rollup_churn_users_ranges"] = """
    WITH a AS (SELECT DISTINCT user_id FROM events
               WHERE CAST(ts AS DATE) = DATE '2024-01-02'),
    b AS (SELECT DISTINCT user_id FROM events
          WHERE CAST(ts AS DATE) = DATE '2024-01-03')
    SELECT 'churned' AS cohort, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM (SELECT user_id FROM a EXCEPT SELECT user_id FROM b)
    UNION ALL
    SELECT 'new', CAST(COUNT(*) AS BIGINT)
    FROM (SELECT user_id FROM b EXCEPT SELECT user_id FROM a)
    UNION ALL
    SELECT 'retained', CAST(COUNT(*) AS BIGINT)
    FROM (SELECT user_id FROM a INTERSECT SELECT user_id FROM b)
    ORDER BY cohort
"""


def rollup_value_quantiles_ranges(sf_dir: str) -> pd.DataFrame:
    """Range QUANTILES from the rollup, no rescan: daily DDSketch
    states of event value (exact integer cents) persisted once, then
    p50/p99 for each date range read by merging the matching days —
    the question warehouses pre-aggregate sketch columns for, since
    exact range percentiles need the raw rows. DDSketch's commutative
    bucket-sum merges make the stored blobs AND every range answer
    byte-deterministic (build-side dynamic batching can't show
    through). Rows-only; pytest holds the α=1% value-relative bound
    per range vs exact (test_rollup_value_quantiles_ranges)."""
    import tempfile

    from ..stages.rollup import build_sketch_rollup, read_rollup_range

    tag = sf_of(sf_dir)
    path = os.path.join(tempfile.gettempdir(), "raysketch_data",
                        f"rollup_value_dd_{tag}")
    if not os.path.exists(path):
        ds = _read(sf_dir, "events", columns=["ts", "value"])
        ds = ds.map_batches(
            lambda t: pa.table({
                "day": pc.strftime(t.column("ts"), format="%Y-%m-%d"),
                "cents": _cents(t.column("value"))}),
            batch_format="pyarrow")
        build_sketch_rollup(ds, key_col="day", on="cents",
                            sketch="ddsketch", out_dir=path)
    rows = []
    for lo, hi in _ROLLUP_RANGES:
        acc = read_rollup_range(path, lo, hi, "ddsketch", key_col="day")
        rows.append((lo, hi, acc.n, acc.quantile(0.5), acc.quantile(0.99)))
    return pd.DataFrame(rows, columns=["lo", "hi", "n", "p50_cents",
                                       "p99_cents"]) \
        .astype({"lo": "str", "hi": "str", "n": "int64"})


QUERIES["rollup_value_quantiles_ranges"] = rollup_value_quantiles_ranges


def rollup_value_moments_ranges(sf_dir: str) -> pd.DataFrame:
    """Second fully-oracle-checked rollup family: daily MOMENTS states
    of exact event cents, range questions answered by integer-exact
    state merges — n, Σv, Σv² per date range (the state from which
    range mean/variance are exact), stated by DuckDB as HUGEINT sums
    over the raw table. Together with rollup_distinct_users_ranges
    this proves the rollup loop (build → persist → range-merge) for
    both an idempotent-merge family (set union) and an additive-merge
    family (power sums) with value hashes, not bands."""
    import tempfile

    from ..stages.rollup import build_sketch_rollup, read_rollup_range

    tag = sf_of(sf_dir)
    path = os.path.join(tempfile.gettempdir(), "raysketch_data",
                        f"rollup_value_mo_{tag}")
    if not os.path.exists(path):
        ds = _read(sf_dir, "events", columns=["ts", "value"])
        ds = ds.map_batches(
            lambda t: pa.table({
                "day": pc.strftime(t.column("ts"), format="%Y-%m-%d"),
                "cents": _cents(t.column("value"))}),
            batch_format="pyarrow")
        build_sketch_rollup(ds, key_col="day", on="cents",
                            sketch="moments", out_dir=path, k=2)
    rows = []
    for lo, hi in _ROLLUP_RANGES:
        acc = read_rollup_range(path, lo, hi, "moments", key_col="day",
                                k=2)
        rows.append((lo, hi, acc.n, str(acc.sums[0]), str(acc.sums[1])))
    return pd.DataFrame(rows, columns=["lo", "hi", "n", "m1", "m2"]) \
        .astype({"lo": "str", "hi": "str", "n": "int64",
                 "m1": "str", "m2": "str"})


QUERIES["rollup_value_moments_ranges"] = rollup_value_moments_ranges
ORACLES["rollup_value_moments_ranges"] = """
    WITH r(lo, hi) AS (VALUES ('2024-01-01', '2024-01-10'),
                              ('2024-01-11', '2024-01-30'),
                              ('2024-01-01', '2024-01-30')),
    c AS (SELECT CAST(ts AS DATE) AS d,
                 CAST(CAST(ROUND(value*100) AS BIGINT) AS HUGEINT) AS v
          FROM events)
    SELECT lo, hi, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(v) AS VARCHAR) AS m1,
           CAST(SUM(v*v) AS VARCHAR) AS m2
    FROM r JOIN c ON c.d BETWEEN CAST(lo AS DATE) AND CAST(hi AS DATE)
    GROUP BY lo, hi ORDER BY lo, hi
"""


def fd_pca_project_energy(sf_dir: str, k: int = 8) -> pd.DataFrame:
    """The FD train→APPLY loop closed (the BPE train→encode precedent):
    train the Frequent Directions state over the embedding corpus
    (per-file folds + canonical reduce, deterministic), take its top-k
    right singular vectors as the approximate PCA basis, then ONE
    broadcast map_batches pass projects every embedding and reduces
    per-component captured energy Σ(x·vᵢ)². Projections quantize at
    fixed-point 2^10 and energies accumulate as int64 partials (the
    gram-matrix discipline) — commutative integer addition, so the
    distributed result is bit-deterministic at any parallelism despite
    float inputs. Rows-only; pytest locks distributed ≡ local-numpy
    exact equality and the FD guarantee band
    energy_i ∈ [σᵢ(B)²−shed, σᵢ(B)²+shed] (quantization-adjusted)."""
    import glob

    import ray

    from ..agg import sketch_aggregate_files
    from ..sketches import FrequentDirections

    files = sorted(glob.glob(os.path.join(sf_dir, "embeddings.parquet"))) \
        or sorted(glob.glob(os.path.join(sf_dir, "embeddings", "*.parquet")))
    blob = sketch_aggregate_files(files, "fd", on="embedding",
                                  mode="bytes", ell=32)
    sk = FrequentDirections.from_bytes(blob)
    _, s, vt = np.linalg.svd(sk._final_rows(), full_matrices=False)
    vk = vt[:k]  # (k, d) basis — deterministic given the state bytes
    ref = ray.put(vk)
    Q10 = np.float64(1 << 10)

    def part(t: pa.Table) -> pa.Table:
        col = t.column("embedding").combine_chunks()
        m = np.asarray(col.flatten().to_numpy(zero_copy_only=False),
                       dtype=np.float64).reshape(len(col), -1)
        proj = m @ ray.get(ref).T  # (n, k)
        q = np.copysign(np.floor(np.abs(proj * Q10) + 0.5), proj) \
            .astype(np.int64)
        e = (q * q).sum(axis=0)  # int64: |proj|≤~50 ⇒ q²≤(50·2^10)² ≪ 2^63
        return pa.table({"component": pa.array(
            np.arange(1, k + 1, dtype=np.int64)),
            "energy_fp": pa.array(e)})

    ds = _read(sf_dir, "embeddings", columns=["embedding"])
    p = ds.map_batches(part, batch_format="pyarrow").to_pandas() \
        .groupby("component", as_index=False)["energy_fp"].sum()
    out = p.sort_values("component").reset_index(drop=True) \
        .astype({"component": "int64", "energy_fp": "int64"})
    out["sv_sq_fp"] = [int(round(x * x * float(Q10) * float(Q10)))
                       for x in s[:k]]
    return out.astype({"sv_sq_fp": "int64"})


QUERIES["fd_pca_project_energy"] = fd_pca_project_energy


def events_orc_feather_roundtrip(sf_dir: str) -> pd.DataFrame:
    """ORC + Feather (Arrow IPC) front doors, oracle-checked in one
    statement: the events table exported once to each format (cached
    under /tmp), read back through `read_table`'s per-file-task path
    (ray.data has no native reader for either — files are the unit of
    parallelism, column projection pushed into the format reader), and
    aggregated to per-(format, type) counts + exact cents. The oracle
    runs on the PARQUET view and states the same rows once per format,
    so the value-hash proves BOTH formats bit-equivalent to the
    parquet path end to end (the events_csv_roundtrip pattern, ×2)."""
    import tempfile

    import pyarrow.feather as paf
    import pyarrow.orc as paorc
    import pyarrow.parquet as pq

    from ..sources.tables import read_table

    src = os.path.join(sf_dir, "events.parquet")
    tag = sf_of(sf_dir)
    cache = os.path.join(tempfile.gettempdir(), "raysketch_data",
                         f"events_orc_feather_{tag}")
    orc_path = os.path.join(cache, "events.orc")
    fea_path = os.path.join(cache, "events.feather")
    if not (os.path.exists(orc_path) and os.path.exists(fea_path)):
        os.makedirs(cache, exist_ok=True)
        t = pq.read_table(src)
        tmp = orc_path + ".tmp"
        paorc.write_table(t, tmp)
        os.replace(tmp, orc_path)
        tmp = fea_path + ".tmp"
        paf.write_feather(t, tmp)
        os.replace(tmp, fea_path)

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas(),
            "c": _cents(t.column("value")).to_numpy(zero_copy_only=False),
        })
        return df.groupby("event_type", as_index=False) \
            .agg(n=("c", "size"), cents=("c", "sum"))

    outs = []
    for fmt, path in (("feather", fea_path), ("orc", orc_path)):
        ds = read_table(path, fmt=fmt,
                        columns=["event_type", "value"])
        p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        agg = p.groupby("event_type", as_index=False)[["n", "cents"]].sum()
        agg.insert(0, "fmt", fmt)
        outs.append(agg)
    return pd.concat(outs, ignore_index=True) \
        .sort_values(["fmt", "event_type"]).reset_index(drop=True) \
        .astype({"n": "int64", "cents": "int64"})


QUERIES["events_orc_feather_roundtrip"] = events_orc_feather_roundtrip
ORACLES["events_orc_feather_roundtrip"] = """
    WITH agg AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY event_type)
    SELECT f.fmt, a.event_type, a.n, a.cents
    FROM agg a CROSS JOIN (VALUES ('feather'), ('orc')) AS f(fmt)
    ORDER BY f.fmt, a.event_type
"""


def snapshot_diff_docs(sf_dir: str) -> pd.DataFrame:
    """Snapshot DELTA between two table versions (the incremental-crawl
    shape: yesterday's dump vs today's) — added / removed / changed rows
    by primary key, SQL-checked against a FULL OUTER JOIN. Both
    versions derive deterministically from the documents table so the
    oracle can state them: v1 drops doc_id%10==7, v2 drops %10==3 and
    appends ' v2' to the text of %10==5 (concat, not case-mapping —
    exact on both engines). The distributed diff
    (stages/incremental.py:snapshot_diff) ships only (key, murmur,
    length, side) rows over ONE key-hash bucket exchange; document
    bodies never move, and output is O(delta) — at 100 TB the diff of
    two crawls costs two hash scans plus a 32-byte-row shuffle."""
    from ..stages.incremental import snapshot_diff

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def v1(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 10 != 7))

    def v2(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(ids % 10 != 3))
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        txt = pc.if_else(pa.array(ids % 10 == 5),
                         pc.binary_join_element_wise(
                             t.column("text"), " v2", ""),
                         t.column("text"))
        return t.set_column(t.schema.get_field_index("text"), "text", txt)

    old = ds.map_batches(v1, batch_format="pyarrow")
    new = ds.map_batches(v2, batch_format="pyarrow")
    out = snapshot_diff(old, new, key_col="doc_id",
                        text_col="text").to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    out["status"] = out["status"].astype(object)
    return out.sort_values("doc_id").reset_index(drop=True)


QUERIES["snapshot_diff_docs"] = snapshot_diff_docs
ORACLES["snapshot_diff_docs"] = """
    WITH v1 AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 7
    ),
    v2 AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 5 THEN text || ' v2' ELSE text END
             AS text
      FROM documents WHERE doc_id % 10 <> 3
    )
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                ELSE 'changed' END AS status
    FROM v1 o FULL OUTER JOIN v2 n ON o.doc_id = n.doc_id
    WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.text <> n.text
    ORDER BY doc_id
"""


def hyperball_word_graph(sf_dir: str, max_t: int = 3, p: int = 8,
                         num_buckets: int = 16) -> pd.DataFrame:
    """HyperBall / HyperANF (Boldi-Vigna; stages/hyperball.py carries
    the algorithm + scale notes): the neighborhood function
    N(t) = Σ_v |B(v,t)| of the word-adjacency graph estimated with ONE
    HLL per node — the reference's core sketch composed into an
    iterative distributed graph operator; two bucket exchanges per
    round over (node, 2^p-byte regs) rows, wire |E|·2^p independent of
    ball sizes, byte-deterministic (commutative register max-merge).
    Rows-only by design (N(t) is an estimate); pytest holds each N(t)
    within the HLL band of the exact bool-matrix-power neighborhood
    function and asserts rerun frame-equality."""
    from ..stages.hyperball import hyperball

    nf, _ = hyperball(_word_edge_dataset(sf_dir), max_t=max_t, p=p,
                      num_buckets=num_buckets)
    return pd.DataFrame(nf, columns=["t", "nf_est"]) \
        .astype({"t": "int64", "nf_est": "int64"})


QUERIES["hyperball_word_graph"] = hyperball_word_graph


def harmonic_centrality_words(sf_dir: str, k: int = 10,
                              max_t: int = 3) -> pd.DataFrame:
    """Harmonic centrality from the SAME HyperBall rounds — the
    headline application of Boldi & Vigna's paper (arXiv:1308.2144):
    C_H(v) = Σ_{u≠v} 1/d(v,u) = Σ_t (|B(v,t)|−|B(v,t−1)|)/t,
    accumulated per node INSIDE the state rows as fixed-point int64
    (×2^20, Python floor division) — zero exchanges beyond the rounds
    themselves. Output: top-k node hashes by (centrality desc, node
    asc) — per-bucket local top-k bounds driver traffic at k·buckets
    (each node's full state lives in exactly one bucket, the
    top_session_paths soundness argument). Rows-only; pytest checks
    rank agreement against exact harmonic centrality on the
    BFS-distance matrix and rerun equality."""
    from ..stages.hyperball import hyperball

    _, states = hyperball(_word_edge_dataset(sf_dir), max_t=max_t)

    def local_topk(g: pa.Table) -> pa.Table:
        nd = g.column("node").to_numpy(zero_copy_only=False)
        h = g.column("harm_fp").to_numpy(zero_copy_only=False)
        order = np.lexsort((nd, -h))[:k]
        return pa.table({"node": pa.array(nd[order]),
                         "harm_fp": pa.array(h[order])})

    parts = states.groupby("__b") \
        .map_groups(local_topk, batch_format="pyarrow").to_pandas()
    out = parts.sort_values(["harm_fp", "node"],
                            ascending=[False, True]).head(k)
    return out.reset_index(drop=True) \
        .astype({"node": "int64", "harm_fp": "int64"})


QUERIES["harmonic_centrality_words"] = harmonic_centrality_words


def weighted_jaccard_pairs(sf_dir: str) -> pd.DataFrame:
    """Exact WEIGHTED (multiset) word-3-gram Jaccard self-join —
    Σ_g min(tf_a,tf_b) / Σ_g max(tf_a,tf_b), the tf-weighted similarity
    that tells boilerplate repetition apart from true near-duplication
    (a doc and its self-concatenation share ~all grams as sets but only
    half the mass). Runs via the occurrence-expansion reduction
    (stages/dedup.py ngram_jaccard_join(weighted=True)): the i-th
    occurrence of a gram becomes the distinct token (gram, i), so the
    ENTIRE set-Jaccard machinery — provably complete df-ordered prefix
    filtering, one fused token pass, exact verify on true text grams —
    carries over verbatim, and the SQL oracle states the same number
    with GROUP BY counts + SUM(LEAST(...)). Both sides divide the same
    exact integers in float64, so values hash identically."""
    from ..stages.dedup import ngram_jaccard_join

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ngram_jaccard_join(ds, k=3, threshold=0.8, unit="word",
                              weighted=True)


QUERIES["weighted_jaccard_pairs"] = weighted_jaccard_pairs
ORACLES["weighted_jaccard_pairs"] = """
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    pos AS (
      SELECT doc_id, words,
             unnest(range(1, greatest(len(words) - 1, 1))) AS p
      FROM w
    ),
    g AS (
      SELECT doc_id,
             list_extract(words, CAST(p AS INT)) || ' ' ||
             list_extract(words, CAST(p AS INT) + 1) || ' ' ||
             list_extract(words, CAST(p AS INT) + 2) AS gram
      FROM pos
    ),
    cnts AS (
      SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS c
      FROM g GROUP BY doc_id, gram
    ),
    sz AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM cnts GROUP BY doc_id
    ),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(SUM(LEAST(a.c, b.c)) AS BIGINT) AS i
      FROM cnts a JOIN cnts b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
    FROM inter
    JOIN sz sa ON sa.doc_id = id_a
    JOIN sz sb ON sb.doc_id = id_b
    WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
    ORDER BY id_a, id_b
"""


# ====================================================================
# Deterministic epoch shuffle (training-data global shuffle)
# ====================================================================

_M61 = (1 << 61) - 1  # Mersenne prime 2^61 - 1
_EPOCH_A = 1203980483  # odd multiplier < 2^31 (any a ≢ 0 mod p works)
_EPOCH_B = 987654321103  # additive offset < p


def _mulmod_m61(a: int, x: np.ndarray) -> np.ndarray:
    """Exact (a*x) mod (2^61-1) for a < 2^31, x < 2^61, vectorized in
    uint64 with no 128-bit type: split x = xh·2^32 + xl, reduce the
    high product's ·2^32 via 2^61 ≡ 1 (hi = u·2^29 + v ⇒ hi·2^32 ≡
    u + v·2^32), then fold the ≤2^63 partial sums twice."""
    x = x.astype(np.uint64)
    au = np.uint64(a)
    p = np.uint64(_M61)
    xh = x >> np.uint64(32)                 # < 2^29
    xl = x & np.uint64(0xFFFFFFFF)          # < 2^32
    hi = au * xh                            # < 2^60 (< p already)
    lo = au * xl                            # < 2^63
    u = hi >> np.uint64(29)                 # < 2^31
    v = hi & np.uint64((1 << 29) - 1)       # < 2^29
    s = u + (v << np.uint64(32)) + lo       # < 2^64
    s = (s >> np.uint64(61)) + (s & p)
    s = (s >> np.uint64(61)) + (s & p)
    return np.where(s >= p, s - p, s)


def _epoch_shuffle_positions(ds, id_col: str):
    """Dataset of (id_col, pos): the row's 0-based position in the
    deterministic epoch permutation ordered by the affine key
    k = (A·id + B) mod (2^61-1). The map is INJECTIVE for distinct
    ids < 2^61 (p prime, A ≢ 0), so the order is total and
    pos = COUNT(keys < k) = ROW_NUMBER()-1 — reproducible at any
    parallelism and statable in SQL (HUGEINT arithmetic). One
    range-bucket exchange of 24-byte (key, 1, id) rows via
    ordered_prefix_scan; payloads never move."""
    from ..stages.scan import ordered_prefix_scan

    def keyed(t: pa.Table) -> pa.Table:
        i = t.column(id_col).to_numpy(zero_copy_only=False)
        if np.any(i < 0) or np.any(i.astype(np.uint64) >= _M61):
            raise ValueError("epoch shuffle requires 0 <= id < 2^61")
        k = _mulmod_m61(_EPOCH_A, i.astype(np.uint64))
        k = k + np.uint64(_EPOCH_B)
        k = np.where(k >= np.uint64(_M61), k - np.uint64(_M61), k)
        return pa.table({"key": pa.array(k.astype(np.int64)),
                         "one": pa.array(np.ones(len(i), np.int64)),
                         id_col: pa.array(i.astype(np.int64))})

    scanned = ordered_prefix_scan(
        ds.map_batches(keyed, batch_format="pyarrow"),
        "key", "one", op="sum", carry_cols=[id_col])

    def pos_of(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t.column(id_col),
            "pos": t.column("prefix")})

    return scanned.map_batches(pos_of, batch_format="pyarrow")


def epoch_shuffle_events(sf_dir: str, n_shards: int = 16) -> pd.DataFrame:
    """Deterministic global shuffle for training epochs — the
    reproducible alternative to ray.data.random_shuffle (which is
    nondeterministic run to run): every row gets a total-order epoch
    position from an affine permutation key over the Mersenne prime
    2^61-1, then round-robins into ``n_shards`` balanced shards
    (shard = pos mod n_shards). Re-derivable from ids alone at any
    parallelism — the property a resumable multi-epoch training loop
    needs. Output: the per-shard audit (count, id checksum, id range);
    the positions dataset itself streams (pytest locks bijectivity and
    per-row equality with ROW_NUMBER at sf0.001)."""
    ds = _read(sf_dir, "events", columns=["event_id"])
    pos = _epoch_shuffle_positions(ds, "event_id")

    def audit(t: pa.Table) -> pd.DataFrame:
        e = t.column("event_id").to_numpy(zero_copy_only=False)
        p = t.column("pos").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"shard": p % n_shards, "e": e})
        g = df.groupby("shard", as_index=False).agg(
            n_events=("e", "size"), sum_event_id=("e", "sum"),
            min_event_id=("e", "min"), max_event_id=("e", "max"))
        return g

    p = pos.map_batches(audit, batch_format="pyarrow").to_pandas()
    out = p.groupby("shard", as_index=False).agg(
        n_events=("n_events", "sum"), sum_event_id=("sum_event_id", "sum"),
        min_event_id=("min_event_id", "min"),
        max_event_id=("max_event_id", "max"))
    return out.sort_values("shard").reset_index(drop=True).astype(
        {"shard": "int64", "n_events": "int64", "sum_event_id": "int64",
         "min_event_id": "int64", "max_event_id": "int64"})


QUERIES["epoch_shuffle_events"] = epoch_shuffle_events
ORACLES["epoch_shuffle_events"] = """
    WITH r AS (
      SELECT event_id,
             ROW_NUMBER() OVER (
               ORDER BY (CAST(event_id AS HUGEINT) * 1203980483
                         + 987654321103) % 2305843009213693951
             ) - 1 AS pos
      FROM events
    )
    SELECT CAST(pos % 16 AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(event_id) AS BIGINT) AS sum_event_id,
           CAST(MIN(event_id) AS BIGINT) AS min_event_id,
           CAST(MAX(event_id) AS BIGINT) AS max_event_id
    FROM r GROUP BY 1 ORDER BY 1
"""


def temperature_mix_select(sf_dir: str) -> pd.DataFrame:
    """Temperature-based mixture sampling (the mT5/XLM-R α=0.5
    rebalancing step): per-source character budgets proportional to
    sqrt(source chars) — upweighting low-resource sources versus
    proportional sampling without the uniform quota's distortion —
    then hash-order admission within each source exactly like
    `domain_mix_select`. sqrt is the EXACT integer isqrt on both
    sides (SQL states it as FLOOR(SQRT(·)) corrected by one, exact
    for counts < 2^52), and budgets are exact floor divisions, so the
    whole selection value-hash-checks. Distributed shape: tiny
    per-source totals combiner + ONE range-bucket prefix-scan
    exchange of 24-byte rows; text never moves."""
    import math

    from ..stages.scan import ordered_prefix_scan

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "source", "n_chars"])
    K = np.int64(2654435761)
    P = np.int64(1_000_000_007)

    def tots(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "source": t.column("source").to_pandas(),
            "chars": t.column("n_chars").to_numpy(zero_copy_only=False),
            "n": 1})
        return df.groupby("source", as_index=False) \
            .agg(chars=("chars", "sum"), n=("n", "sum"))

    per_src = ds.map_batches(tots, batch_format="pyarrow").to_pandas() \
        .groupby("source", as_index=False)[["chars", "n"]].sum() \
        .sort_values("source").reset_index(drop=True)
    srcs = per_src["source"].to_numpy()
    src_chars = per_src["chars"].to_numpy(dtype=np.int64)
    w = np.array([math.isqrt(int(c)) for c in src_chars], dtype=object)
    w_sum = int(sum(int(x) for x in w))
    b_total = int(src_chars.sum()) // 2
    budgets = np.array([(b_total * int(x)) // w_sum for x in w],
                       dtype=np.int64)

    def keyed(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        s = t.column("source").to_numpy(zero_copy_only=False)
        sid = np.searchsorted(srcs, s)
        hk = (d.astype(np.int64) * K) % P
        return pa.table({
            "key": pa.array(sid.astype(np.int64) * np.int64(1 << 31) + hk),
            "n_chars": t.column("n_chars").cast(pa.int64()),
            "sid": pa.array(sid.astype(np.int64)),
        })

    # chars of all lower-ranked sources precede a source in the scan
    before = np.concatenate(([0], np.cumsum(src_chars)[:-1]))
    scanned = ordered_prefix_scan(
        ds.map_batches(keyed, batch_format="pyarrow"),
        "key", "n_chars", op="sum", carry_cols=["sid"])

    def audit(t: pa.Table) -> pd.DataFrame:
        sid = t.column("sid").to_numpy(zero_copy_only=False)
        ch = t.column("n_chars").to_numpy(zero_copy_only=False)
        pre = t.column("prefix").to_numpy(zero_copy_only=False)
        keep = (pre - before[sid] + ch) <= budgets[sid]
        df = pd.DataFrame({"sid": sid, "n": 1,
                           "n_sel": keep.astype(np.int64),
                           "ch_sel": np.where(keep, ch, 0)})
        return df.groupby("sid", as_index=False).sum()

    p = scanned.map_batches(audit, batch_format="pyarrow").to_pandas() \
        .groupby("sid", as_index=False)[["n", "n_sel", "ch_sel"]].sum()
    out = pd.DataFrame({
        "source": srcs[p["sid"].to_numpy()],
        "n_docs": p["n"].to_numpy(dtype=np.int64),
        "n_selected": p["n_sel"].to_numpy(dtype=np.int64),
        "chars_selected": p["ch_sel"].to_numpy(dtype=np.int64)})
    return out.sort_values("source").reset_index(drop=True) \
        .astype({"source": "str", "n_docs": "int64",
                 "n_selected": "int64", "chars_selected": "int64"})


QUERIES["temperature_mix_select"] = temperature_mix_select
ORACLES["temperature_mix_select"] = """
    WITH per AS (
      SELECT source, CAST(SUM(n_chars) AS BIGINT) AS c
      FROM documents GROUP BY source
    ),
    isq AS (
      SELECT source, c,
             CAST(FLOOR(SQRT(CAST(c AS DOUBLE))) AS BIGINT) AS s0
      FROM per
    ),
    w AS (
      SELECT source, c,
             s0 + (CASE WHEN CAST(s0 + 1 AS HUGEINT) * (s0 + 1) <= c
                        THEN 1 ELSE 0 END)
                - (CASE WHEN CAST(s0 AS HUGEINT) * s0 > c
                        THEN 1 ELSE 0 END) AS wgt
      FROM isq
    ),
    tot AS (
      SELECT CAST(SUM(c) AS BIGINT) // 2 AS b,
             CAST(SUM(wgt) AS BIGINT) AS ws
      FROM w
    ),
    bud AS (
      SELECT source,
             CAST((SELECT b FROM tot) AS HUGEINT) * wgt
               // (SELECT ws FROM tot) AS budget
      FROM w
    ),
    h AS (
      SELECT source, n_chars,
             (doc_id * 2654435761) % 1000000007 AS hk
      FROM documents
    ),
    cum AS (
      SELECT source, n_chars,
             SUM(n_chars) OVER (PARTITION BY source ORDER BY hk
                                ROWS UNBOUNDED PRECEDING) AS cum
      FROM h
    )
    SELECT cum.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN cum <= budget THEN 1 ELSE 0 END) AS BIGINT)
             AS n_selected,
           CAST(SUM(CASE WHEN cum <= budget THEN n_chars ELSE 0 END)
                AS BIGINT) AS chars_selected
    FROM cum JOIN bud ON cum.source = bud.source
    GROUP BY cum.source ORDER BY cum.source
"""


# ====================================================================
# Inverted index build + index-served keyword search
# ====================================================================

_SEARCH_TERMS = ["dup", "scan", "window"]


def _inverted_index_dir(sf_dir: str) -> str:
    import tempfile

    from ..stages.invindex import build_inverted_index

    idx_dir = os.path.join(tempfile.gettempdir(), "raysketch_data",
                           f"invindex_{sf_of(sf_dir)}")
    mpath = os.path.join(idx_dir, "meta.json")
    stale = True
    if os.path.exists(mpath):
        import json as _json
        with open(mpath) as f:
            stale = _json.load(f).get("version", 1) < 2
    if stale:
        ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
        build_inverted_index(ds, idx_dir, text_col="text",
                             id_col="doc_id", n_shards=32)
    return idx_dir


def keyword_search_docs(sf_dir: str) -> pd.DataFrame:
    """Index-served retrieval: top-20 documents for a fixed keyword
    query by integer tf·idf, answered from the persisted inverted
    index (stages/invindex.py) — build pays one tokenize pass + one
    term-hash exchange, search reads ONLY the query terms' shards with
    a term-IN filter and never rescans the corpus (driver work is
    O(Σ df) for the query's terms). idf is the exact integer
    (n_docs·2^20)//df, so the ranking — including the rank-20 tie
    boundary, broken by doc_id — is statable in SQL and value-hash
    checked. Pytest additionally locks shard-pruning evidence (files
    read < files total) and index≡direct-scan equality."""
    from ..stages.invindex import search_index

    return search_index(_inverted_index_dir(sf_dir), _SEARCH_TERMS, k=20)


QUERIES["keyword_search_docs"] = keyword_search_docs
ORACLES["keyword_search_docs"] = """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w
      FROM documents
    ),
    tf AS (
      SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok WHERE w IN ('dup', 'scan', 'window')
      GROUP BY doc_id, w
    ),
    df AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)
    SELECT tf.doc_id,
           CAST(SUM(tf.tf * (((SELECT n FROM n) * 1048576) // df.df))
                AS BIGINT) AS score_fp,
           CAST(COUNT(*) AS BIGINT) AS n_terms
    FROM tf JOIN df USING (w)
    GROUP BY tf.doc_id
    ORDER BY score_fp DESC, tf.doc_id
    LIMIT 20
"""


def doc_similar_topk(sf_dir: str, n_queries: int = 8, k: int = 10
                     ) -> pd.DataFrame:
    """Query-by-example SPARSE retrieval — exact tf-vector cosine
    top-k ("more like this"): for each of the ``n_queries`` lowest
    doc_ids, the ``k`` most cosine-similar OTHER documents. This is
    the sparse (bag-of-words) twin of the dense `top_cosine_pairs` /
    `ivf_ann_top10` family, and the exact-cosine upgrade of
    `keyword_search_docs` (full query tf vector + document-length
    normalization instead of a bare keyword tf·idf sum).

    Scale shape (the reason retrieval beats all-pairs): the query tf
    vectors are KB-scale and broadcast once; ONE streaming tokenize
    pass computes, per batch, exact (doc, term) tf pairs (np.unique on
    doc×term codes), per-doc squared norms over ALL terms, and integer
    dot products against the query matrix — cost O(tokens + matches),
    never the Σ df² of an all-pairs inverted-index join (which on a
    low-entropy vocabulary degenerates to n²; that tier is served by
    the weighted-Jaccard / minhash family instead). Every candidate
    doc lives in exactly one batch, so per-batch top-k under the FULL
    result order (cos desc, doc_id) is a sound superset of the global
    top-k and the driver folds ≤ k·q·batches rows. Dots and norms are
    exact int64; cosine is ONE double expression per pair —
    CAST(dot) / SQRT(CAST(n2_q AS DOUBLE) * CAST(n2_c AS DOUBLE)) —
    written identically in SQL (bit-matched doubles, ties broken by
    doc_id), so the whole ranking value-hash-checks."""
    import ray

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _tf(text: str) -> dict:
        out: dict = {}
        for w in text.split(" "):
            if w:
                out[w] = out.get(w, 0) + 1
        return out

    qrows = ds.map_batches(
        lambda t: t.filter(pc.less(t.column("doc_id"), n_queries)),
        batch_format="pyarrow").take_all()
    qrows.sort(key=lambda r: r["doc_id"])
    q_ids = np.array([r["doc_id"] for r in qrows], dtype=np.int64)
    q_tfs = [_tf(r["text"]) for r in qrows]
    qterms = pd.Index(sorted(set().union(*[t.keys() for t in q_tfs])))
    Qmat = np.zeros((len(q_ids), len(qterms)), dtype=np.int64)
    for i, t in enumerate(q_tfs):
        Qmat[i, qterms.get_indexer(pd.Index(list(t.keys())))] = \
            np.fromiter(t.values(), dtype=np.int64)
    q_n2 = np.array([sum(v * v for v in t.values()) for t in q_tfs],
                    dtype=np.int64)
    q_ref = ray.put((q_ids, qterms, Qmat, q_n2))

    def score(t: pa.Table) -> pa.Table:
        qi, qt, qm, qn = ray.get(q_ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        nb = len(ids)
        lst = pc.split_pattern(t.column("text").combine_chunks(), " ")
        offs = np.asarray(lst.offsets)
        words = lst.flatten()
        doc_idx = np.repeat(np.arange(nb), np.diff(offs))
        keep = pc.not_equal(words, "").to_numpy(zero_copy_only=False)
        wcodes, term_code = pd.factorize(
            pd.Series(words.to_numpy(zero_copy_only=False)[keep]))
        doc_idx = doc_idx[keep]
        T = len(term_code)
        uid, tfc = np.unique(doc_idx.astype(np.int64) * T + wcodes,
                             return_counts=True)
        pd_doc = (uid // T).astype(np.int64)
        pd_term = (uid % T).astype(np.int64)
        tfc = tfc.astype(np.int64)
        n2 = np.zeros(nb, dtype=np.int64)
        np.add.at(n2, pd_doc, tfc * tfc)
        qcol = qt.get_indexer(term_code)[pd_term]
        valid = qcol >= 0
        vd, vc, vt = pd_doc[valid], qcol[valid], tfc[valid]
        oq, od, odot, ocos = [], [], [], []
        for qq in range(len(qi)):
            dot = np.zeros(nb, dtype=np.int64)
            np.add.at(dot, vd, vt * qm[qq, vc])
            cand = np.nonzero((dot > 0) & (ids != qi[qq]))[0]
            if not len(cand):
                continue
            cos = dot[cand] / np.sqrt(
                n2[cand].astype(np.float64) * np.float64(qn[qq]))
            top = np.lexsort((ids[cand], -cos))[:k]
            oq.append(np.full(len(top), qi[qq], dtype=np.int64))
            od.append(ids[cand][top])
            odot.append(dot[cand][top])
            ocos.append(cos[top])
        if not oq:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "dot": pa.array([], pa.int64()),
                             "cos": pa.array([], pa.float64())})
        return pa.table({"query_id": pa.array(np.concatenate(oq)),
                         "doc_id": pa.array(np.concatenate(od)),
                         "dot": pa.array(np.concatenate(odot)),
                         "cos": pa.array(np.concatenate(ocos))})

    parts = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    out = []
    for qq, grp in parts.groupby("query_id", sort=True):
        order = np.lexsort((grp["doc_id"].to_numpy(),
                            -grp["cos"].to_numpy()))[:k]
        g = grp.iloc[order].reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        out.append(g)
    return pd.concat(out, ignore_index=True).astype(
        {"query_id": "int64", "doc_id": "int64", "dot": "int64",
         "cos": "float64", "rank": "int64"})


QUERIES["doc_similar_topk"] = doc_similar_topk
ORACLES["doc_similar_topk"] = """
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents
    ),
    w2 AS (SELECT doc_id, term FROM w WHERE term <> ''),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM w2 GROUP BY doc_id, term
    ),
    n2 AS (
      SELECT doc_id, CAST(SUM(tf * tf) AS BIGINT) AS n2
      FROM tf GROUP BY doc_id
    ),
    q AS (SELECT * FROM tf WHERE doc_id < 8),
    dots AS (
      SELECT q.doc_id AS qid, c.doc_id AS did,
             CAST(SUM(q.tf * c.tf) AS BIGINT) AS dot
      FROM q JOIN tf c USING (term)
      WHERE c.doc_id <> q.doc_id
      GROUP BY q.doc_id, c.doc_id
    ),
    r AS (
      SELECT qid, did, dot,
             CAST(dot AS DOUBLE) /
             SQRT(CAST(nq.n2 AS DOUBLE) * CAST(nc.n2 AS DOUBLE)) AS cos,
             ROW_NUMBER() OVER (
               PARTITION BY qid
               ORDER BY CAST(dot AS DOUBLE) /
                        SQRT(CAST(nq.n2 AS DOUBLE) *
                             CAST(nc.n2 AS DOUBLE)) DESC, did
             ) AS rn
      FROM dots
      JOIN n2 nq ON nq.doc_id = qid
      JOIN n2 nc ON nc.doc_id = did
    )
    SELECT qid AS query_id, did AS doc_id, dot, cos,
           CAST(rn AS BIGINT) AS rank
    FROM r WHERE rn <= 10 ORDER BY query_id, rank
"""


_PLANT_LINE_A = "subscribe to the newsletter for updates today"
_PLANT_LINE_B = "all rights reserved contact the team now"


def _doc_lines(t: pa.Table):
    """Batch → (lines StringArray, doc index int64[], line byte-lens):
    each document reshaped into 8-word lines (Arrow ListArray reslice +
    `binary_join` — no per-line Python), plus the planted boilerplate
    lines appended for doc_id % 3 == 0 / % 7 == 0. Deterministic and
    restatable in SQL (STRING_AGG over (i-1)//8 groups + UNION ALL)."""
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    n = len(ids)
    lst = pc.split_pattern(t.column("text").combine_chunks(), " ")
    offs = np.asarray(lst.offsets, dtype=np.int64)
    words = lst.flatten()
    base = offs - offs[0]
    counts = np.diff(base)
    total = int(base[-1])
    pos = np.arange(total, dtype=np.int64)
    rel = pos - np.repeat(base[:-1], counts)
    line_starts = np.flatnonzero(rel % 8 == 0)
    line_offs = np.r_[line_starts, total]
    lines = pc.binary_join(
        pa.LargeListArray.from_arrays(pa.array(line_offs), words),
        " ")
    line_doc = np.repeat(np.arange(n, dtype=np.int64), (counts + 7) // 8)
    pa_docs = [lines]
    pl_doc = [line_doc]
    for mod, text in ((3, _PLANT_LINE_A), (7, _PLANT_LINE_B)):
        sel = np.flatnonzero(ids % mod == 0)
        if len(sel):
            pa_docs.append(pa.array([text] * len(sel), pa.large_string()))
            pl_doc.append(sel.astype(np.int64))
    all_lines = pa.concat_arrays([a.cast(pa.large_string())
                                  for a in pa_docs])
    all_doc = np.concatenate(pl_doc)
    lens = pc.binary_length(all_lines).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    return all_lines, all_doc, lens


def line_dedup_docs(sf_dir: str, num_buckets: int = 64) -> pd.DataFrame:
    """LINE-level deduplication (CCNet, arXiv:1911.00359 §4.1 — dedup
    by line/paragraph hash across the corpus, the step that strips
    shared boilerplate doc-level dedup can never see). The corpus has
    no newlines, so the line unit is derived deterministically (8-word
    segments) and boilerplate lines are PLANTED in-query (the
    embedding_dedup_planted convention): every doc_id % 3 == 0 doc
    carries plant A (~n/3 occurrences), % 7 == 0 plant B — natural
    8-word lines over this vocabulary essentially never repeat, and
    any that do are counted identically by both engines. A line
    occurrence is dropped iff its line occurs ≥ 2 times corpus-wide;
    output is per-doc (n_lines, n_dup_lines, kept_chars), value-hash
    checked against the same derivation in SQL.

    Scale shape — the exact-dedup pattern at line granularity: pass 1
    streams (murmur64(line), bucket) 16-byte rows through ONE hash
    exchange and reduces each bucket to its duplicated hashes
    (lexsort/run-length, never a per-key aggregate), so the driver
    collects O(duplicated lines) hashes — the CCNet regime where dup
    mass is a small fraction; pass 2 is a zero-shuffle re-derivation
    with a broadcast np.isin flag and per-doc bincounts. Line text
    never crosses the wire (64-bit hash stand-ins; collision P ≈
    lines²/2⁶⁴, the tfidf/exact-dedup precedent)."""
    import ray

    from ..hashing import murmur64a
    from ..keys import canonical_flat_bytes
    from ..stages.dedup import _splitmix64

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def hash_rows(t: pa.Table) -> pa.Table:
        lines, _, _ = _doc_lines(t)
        data, offsets = canonical_flat_bytes(lines)
        h = murmur64a(data, offsets).view(np.int64)
        b = (_splitmix64(h.view(np.uint64)) %
             np.uint64(num_buckets)).astype(np.int64)
        return pa.table({"h": pa.array(h), "__b": pa.array(b)})

    def dups_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        h = np.sort(g["h"].to_numpy())
        rep = h[:-1][h[1:] == h[:-1]] if len(h) > 1 else h[:0]
        return pd.DataFrame({"h": np.unique(rep)})

    dup_df = ds.map_batches(hash_rows, batch_format="pyarrow") \
        .groupby("__b").map_groups(dups_in_bucket, batch_format="pandas") \
        .to_pandas()
    dup_ref = ray.put(np.sort(dup_df["h"].to_numpy(dtype=np.int64)))

    def doc_stats(t: pa.Table) -> pa.Table:
        dups = ray.get(dup_ref)
        lines, line_doc, lens = _doc_lines(t)
        data, offsets = canonical_flat_bytes(lines)
        h = murmur64a(data, offsets).view(np.int64)
        is_dup = np.isin(h, dups)
        n = t.num_rows
        n_lines = np.bincount(line_doc, minlength=n).astype(np.int64)
        n_dup = np.bincount(line_doc[is_dup], minlength=n).astype(np.int64)
        kept = np.bincount(line_doc[~is_dup], weights=lens[~is_dup],
                           minlength=n).astype(np.int64)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_lines": pa.array(n_lines),
            "n_dup_lines": pa.array(n_dup),
            "kept_chars": pa.array(kept)})

    out = ds.map_batches(doc_stats, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True).astype(
        {"doc_id": "int64", "n_lines": "int64", "n_dup_lines": "int64",
         "kept_chars": "int64"})


QUERIES["line_dedup_docs"] = line_dedup_docs
ORACLES["line_dedup_docs"] = """
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    w AS (
      SELECT doc_id, unnest(l) AS word, generate_subscripts(l, 1) AS i
      FROM base
    ),
    seg AS (
      SELECT doc_id, (i - 1) // 8 AS s,
             STRING_AGG(word, ' ' ORDER BY i) AS line
      FROM w GROUP BY doc_id, s
    ),
    lines AS (
      SELECT doc_id, line FROM seg
      UNION ALL
      SELECT doc_id, 'subscribe to the newsletter for updates today'
      FROM documents WHERE doc_id % 3 = 0
      UNION ALL
      SELECT doc_id, 'all rights reserved contact the team now'
      FROM documents WHERE doc_id % 7 = 0
    ),
    df AS (SELECT line, COUNT(*) AS c FROM lines GROUP BY line)
    SELECT l.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN df.c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_lines,
           CAST(SUM(CASE WHEN df.c < 2 THEN LEN(l.line) ELSE 0 END)
                AS BIGINT) AS kept_chars
    FROM lines l JOIN df USING (line)
    GROUP BY l.doc_id ORDER BY l.doc_id
"""


def hits_word_graph(sf_dir: str, rounds: int = 2,
                    num_buckets: int = 64) -> pd.DataFrame:
    """HITS hubs-and-authorities (Kleinberg JACM'99) over the word
    bigram graph — the second link-analysis centrality beside
    PageRank, computed UNNORMALIZED in exact int64 for a fixed round
    count (the per-round L2 normalization only rescales, so the
    relative ranking of hub/authority mass is preserved and every
    value is an exact integer both engines can state: a_{r} = Aᵀ
    h_{r-1}, h_r = A a_r from h_0 = 1). Two alternating
    scatter-folds per round over the materialized distinct-edge
    dataset — the pagerank_word_graph shape: node-bounded broadcast
    vectors, per-batch int64 bincount partials, zero shuffles per
    pass. Overflow bound: values grow ≤ (d_max²)^rounds; rounds=2 on
    a node-bounded vocabulary stays far under 2⁶³ (asserted)."""
    import ray

    edges = _word_edge_dataset(sf_dir, num_buckets)

    vocab_set: set = set()
    for b in edges.iter_batches(batch_format="pyarrow", batch_size=None):
        vocab_set.update(b.column("w1").to_pylist())
        vocab_set.update(b.column("w2").to_pylist())
    vocab = pd.Index(sorted(vocab_set))
    n = len(vocab)
    vocab_b = ray.put(vocab)

    def fold_scatter(vec: np.ndarray, src: str, dst: str) -> np.ndarray:
        """Σ over edges of vec[src-endpoint] scattered to dst-endpoint,
        folded as node-length int64 partials (one partial per batch)."""
        vec_ref = ray.put(vec)

        def partial(t: pa.Table) -> pa.Table:
            voc = ray.get(vocab_b)
            v = ray.get(vec_ref)
            i = voc.get_indexer(t.column(src).to_pandas())
            j = voc.get_indexer(t.column(dst).to_pandas())
            out = np.zeros(n, dtype=np.int64)
            np.add.at(out, j, v[i])
            return pa.table({"v": pa.array([out.tolist()])})

        acc = np.zeros(n, dtype=np.int64)
        for b in edges.map_batches(partial, batch_format="pyarrow",
                                   batch_size=None) \
                .iter_batches(batch_format="pyarrow", batch_size=None):
            if b.num_rows:
                acc += np.asarray(b.column("v").to_pylist()[0],
                                  dtype=np.int64)
        return acc

    hub = np.ones(n, dtype=np.int64)
    auth = np.zeros(n, dtype=np.int64)
    for _ in range(rounds):
        auth = fold_scatter(hub, "w1", "w2")
        hub = fold_scatter(auth, "w2", "w1")
        assert hub.max(initial=0) < (1 << 62), "HITS int64 overflow"

    return pd.DataFrame({"word": vocab.to_numpy(),
                         "hub_score": hub,
                         "auth_score": auth}).sort_values("word") \
        .reset_index(drop=True).astype({"hub_score": "int64",
                                        "auth_score": "int64"})


QUERIES["hits_word_graph"] = hits_word_graph
ORACLES["hits_word_graph"] = """
    WITH lists AS (SELECT string_split(text, ' ') AS l FROM documents),
    big AS (SELECT DISTINCT p[1] AS w1, p[2] AS w2 FROM (
      SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p FROM lists
    )),
    nodes AS (SELECT w1 AS w FROM big UNION SELECT w2 FROM big),
    a1 AS (SELECT w2 AS w, CAST(COUNT(*) AS BIGINT) AS s
           FROM big GROUP BY w2),
    h1 AS (SELECT w1 AS w, CAST(SUM(a1.s) AS BIGINT) AS s
           FROM big JOIN a1 ON a1.w = big.w2 GROUP BY w1),
    a2 AS (SELECT w2 AS w, CAST(SUM(h1.s) AS BIGINT) AS s
           FROM big JOIN h1 ON h1.w = big.w1 GROUP BY w2),
    h2 AS (SELECT w1 AS w, CAST(SUM(a2.s) AS BIGINT) AS s
           FROM big JOIN a2 ON a2.w = big.w2 GROUP BY w1)
    SELECT n.w AS word,
           CAST(COALESCE(h2.s, 0) AS BIGINT) AS hub_score,
           CAST(COALESCE(a2.s, 0) AS BIGINT) AS auth_score
    FROM nodes n
    LEFT JOIN h2 ON h2.w = n.w
    LEFT JOIN a2 ON a2.w = n.w
    ORDER BY n.w
"""


_Z_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z


def _zorder_events_dir(sf_dir: str) -> str:
    """Cached z-order layout of events on (user_id, event hour) —
    built once per sf (the _inverted_index_dir convention). Raw
    coordinates are min-max-spread over the 16-bit domain (user·32,
    hour·64 — domain bounds asserted) so the aligned prefix cells
    split the OCCUPIED region instead of collapsing into cell 0."""
    import tempfile

    from ..stages.zorder import build_zorder_layout

    out = os.path.join(tempfile.gettempdir(), "raysketch_data",
                       f"zorder_events_{sf_of(sf_dir)}")
    if not os.path.exists(os.path.join(out, "meta.json")):
        ds = _read(sf_dir, "events",
                   columns=["event_id", "user_id", "ts", "event_type",
                            "value"])

        def xy(t: pa.Table):
            u = t.column("user_id").to_numpy(zero_copy_only=False)
            us = t.column("ts").cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            hour = (us - _Z_EPOCH_US) // 3_600_000_000
            if len(u) and (u.max() >= 2048 or hour.max() >= 1024
                           or hour.min() < 0):
                raise ValueError("z-order domain bounds exceeded")
            return u * 32, hour * 64

        build_zorder_layout(ds, out, xy, j=2, sort_cols=("event_id",))
    return out


def zorder_box_events(sf_dir: str) -> pd.DataFrame:
    """2-D range query served from the Z-ORDER clustered layout
    (stages/zorder.py — Morton interleave, aligned prefix cells =
    axis-aligned rectangles, EXACT cell-level pruning): events for
    user_id ∈ [2, 74] during Jan 8–15 (UTC hours 168–359), aggregated
    per event_type as (n_events, sum cents). The read opens ONLY the
    cells whose rectangle intersects the box (pytest locks cells_read
    < cells_total and layout≡full-scan equality); the exact row filter
    inside the survivors makes the answer independent of cell
    granularity, and the oracle is the plain SQL box aggregate over
    the raw table. Value-exact: integer cents on both sides."""
    from ..stages.zorder import zorder_box_read

    u_lo, u_hi, h_lo, h_hi = 2, 74, 168, 359
    ds = zorder_box_read(_zorder_events_dir(sf_dir),
                         u_lo * 32, u_hi * 32 + 31,
                         h_lo * 64, h_hi * 64 + 63,
                         columns=["user_id", "ts", "event_type",
                                  "value"])
    t_lo = _Z_EPOCH_US + h_lo * 3_600_000_000
    t_hi = _Z_EPOCH_US + (h_hi + 1) * 3_600_000_000

    def box_partial(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        us = t.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        keep = (u >= u_lo) & (u <= u_hi) & (us >= t_lo) & (us < t_hi)
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas()[keep],
            "cents": _cents(t.column("value")).to_numpy(
                zero_copy_only=False)[keep]})
        g = df.groupby("event_type", as_index=False) \
            .agg(n_events=("cents", "size"), cents=("cents", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    if ds is None:
        return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                             "n_events": pd.Series([], dtype="int64"),
                             "cents": pd.Series([], dtype="int64")})
    parts = ds.map_batches(box_partial, batch_format="pyarrow") \
        .to_pandas()
    out = parts.groupby("event_type", as_index=False) \
        .agg(n_events=("n_events", "sum"), cents=("cents", "sum"))
    return out.sort_values("event_type").reset_index(drop=True) \
        .astype({"n_events": "int64", "cents": "int64"})


QUERIES["zorder_box_events"] = zorder_box_events
ORACLES["zorder_box_events"] = """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM events
    WHERE user_id BETWEEN 2 AND 74
      AND ts >= TIMESTAMP '2024-01-08 00:00:00'
      AND ts <  TIMESTAMP '2024-01-16 00:00:00'
    GROUP BY event_type ORDER BY event_type
"""


def _bucketed_pair_dirs(sf_dir: str, num_buckets: int = 32
                        ) -> tuple[str, str]:
    """Cached co-bucketed layouts of lineitem and orders on orderkey
    (one hash exchange each, paid once per sf — the
    _inverted_index_dir convention)."""
    import tempfile

    from ..stages.bucketed import write_bucketed

    base = os.path.join(tempfile.gettempdir(), "raysketch_data",
                        f"bucketed_{sf_of(sf_dir)}")
    d_li = os.path.join(base, "lineitem")
    d_or = os.path.join(base, "orders")
    if not os.path.exists(os.path.join(d_li, "meta.json")):
        write_bucketed(
            _read(sf_dir, "lineitem",
                  columns=["l_orderkey", "l_extendedprice",
                           "l_discount"]),
            "l_orderkey", d_li, num_buckets)
    if not os.path.exists(os.path.join(d_or, "meta.json")):
        write_bucketed(
            _read(sf_dir, "orders",
                  columns=["o_orderkey", "o_orderpriority"]),
            "o_orderkey", d_or, num_buckets)
    return d_li, d_or


def bucketed_join_priority_revenue(sf_dir: str) -> pd.DataFrame:
    """ZERO-SHUFFLE equi-join from co-bucketed storage (stages/
    bucketed.py — the Hive/Spark bucketed-table feature): lineitem ⋈
    orders on orderkey, revenue per order priority. Both tables were
    written bucketed by splitmix64(orderkey) % 32 (exchange paid once
    at write, amortized over every later join on the key); the join
    itself fans one task per bucket, each reading its two bucket
    files directly and emitting a ≤5-row partial — NO exchange
    operator in the join plan at all, vs the 2-exchange runtime
    bucket_hash_join. Exact integer cents both sides; plain SQL
    oracle."""
    from ..stages.bucketed import cobucket_join_fold

    d_li, d_or = _bucketed_pair_dirs(sf_dir)

    def per_bucket(ta: pa.Table, tb: pa.Table) -> pa.Table:
        li = ta.to_pandas()
        od = tb.to_pandas()
        m = li.merge(od, left_on="l_orderkey", right_on="o_orderkey",
                     how="inner")
        if not len(m):
            return pa.table({"o_orderpriority": pa.array([],
                                                         pa.string()),
                             "rev": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        cents = np.floor(m["l_extendedprice"].to_numpy()
                         * (1.0 - m["l_discount"].to_numpy())
                         * 100.0 + 0.5).astype(np.int64)
        g = pd.DataFrame({"o_orderpriority": m["o_orderpriority"],
                          "rev": cents}) \
            .groupby("o_orderpriority", as_index=False) \
            .agg(rev=("rev", "sum"), n=("rev", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = cobucket_join_fold(
        d_li, d_or, per_bucket,
        columns_a=["l_orderkey", "l_extendedprice", "l_discount"],
        columns_b=["o_orderkey", "o_orderpriority"]).to_pandas()
    out = parts.groupby("o_orderpriority", as_index=False) \
        .agg(revenue_cents=("rev", "sum"), n_items=("n", "sum"))
    return out.sort_values("o_orderpriority").reset_index(drop=True) \
        .astype({"revenue_cents": "int64", "n_items": "int64"})


QUERIES["bucketed_join_priority_revenue"] = bucketed_join_priority_revenue
ORACLES["bucketed_join_priority_revenue"] = """
    SELECT o_orderpriority,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) AS revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def curation_funnel_docs(sf_dir: str, min_words: int = 20,
                         num_buckets: int = 64) -> pd.DataFrame:
    """END-TO-END curation FUNNEL with a full SQL oracle — the whole
    FineWeb/C4-style chain in one call, every stage's attrition
    value-hash-checked: quality length filter (n_words ≥ 20) →
    badwords blocklist ('dup' as a whole token, the C4 rule) → exact
    dedup (min-id per identical text; duplicates PLANTED in-query as
    doc_id+10⁶ copies of every 40th doc, the embedding_dedup_planted
    convention — a plant survives to the dedup stage iff its original
    does, so the stage removes exactly the surviving plants) →
    token-budget admission (hash-ordered greedy keep while the running
    word total stays ≤ half the surviving mass — SQL's SUM OVER the
    same composite key). Output: one row per stage with (docs_in,
    docs_out, words_out).

    Distributed shape: ONE tokenize pass reduces each doc to a 40-byte
    meta row (n_words, bad flag, content hash+len); stage counts fold
    as per-batch partials; the dedup drop set is one hash exchange →
    O(duplicates) broadcast (exact_dedup pattern); the budget cut is
    `ordered_prefix_scan` — 24-byte rows through one range exchange.
    Document text is read once and never shuffled anywhere."""
    import ray

    from ..hashing import murmur64a
    from ..keys import canonical_flat_bytes
    from ..stages.dedup import _splitmix64
    from ..stages.scan import ordered_prefix_scan

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def planted_meta(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        sel = np.flatnonzero(ids % 40 == 0)
        txt = t.column("text").combine_chunks()
        all_ids = np.r_[ids, ids[sel] + 1_000_000]
        all_txt = pa.concat_arrays([txt, txt.take(pa.array(sel))])
        toks = pc.split_pattern(pc.fill_null(all_txt, ""), " ")
        nw = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = toks.flatten()
        doc = np.repeat(np.arange(len(all_ids)), nw)
        hit = pc.equal(flat, "dup").to_numpy(zero_copy_only=False)
        bad = np.zeros(len(all_ids), dtype=np.int64)
        if len(hit):
            np.add.at(bad, doc, hit.astype(np.int64))
        data, offsets = canonical_flat_bytes(all_txt)
        h = murmur64a(data, offsets).view(np.int64)
        ln = (offsets[1:] - offsets[:-1]).astype(np.int64)
        return pa.table({"doc_id": pa.array(all_ids),
                         "n_words": pa.array(nw),
                         "bad": pa.array((bad > 0).astype(np.int64)),
                         "h": pa.array(h), "len": pa.array(ln)})

    meta = ds.map_batches(planted_meta, batch_format="pyarrow") \
        .materialize()

    def fold_counts(d, mask_fn):
        def part(t: pa.Table) -> pa.Table:
            keep = mask_fn(t)
            nw = t.column("n_words").to_numpy(zero_copy_only=False)
            return pa.table({"n": pa.array([int(keep.sum())]),
                             "w": pa.array([int(nw[keep].sum())])})
        p = d.map_batches(part, batch_format="pyarrow").to_pandas()
        return int(p["n"].sum()), int(p["w"].sum())

    def m_all(t):
        return np.ones(t.num_rows, dtype=bool)

    def m_q(t):
        return t.column("n_words").to_numpy(
            zero_copy_only=False) >= min_words

    def m_b(t):
        return m_q(t) & (t.column("bad").to_numpy(
            zero_copy_only=False) == 0)

    n0, w0 = fold_counts(meta, m_all)
    n1, w1 = fold_counts(meta, m_q)
    n2, w2 = fold_counts(meta, m_b)

    # dedup drop set among badwords survivors: one (h,len) bucket
    # exchange, drops = all-but-min per content group (O(duplicates))
    def surv_rows(t: pa.Table) -> pa.Table:
        keep = m_b(t)
        h = t.column("h").to_numpy(zero_copy_only=False)[keep]
        b = (_splitmix64(h.view(np.uint64)) %
             np.uint64(num_buckets)).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(t.column("doc_id").to_numpy(
                zero_copy_only=False)[keep]),
            "h": pa.array(h),
            "len": pa.array(t.column("len").to_numpy(
                zero_copy_only=False)[keep]),
            "__b": pa.array(b)})

    def drops_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        h = g["h"].to_numpy()
        ln = g["len"].to_numpy()
        di = g["doc_id"].to_numpy()
        order = np.lexsort((di, ln, h))
        h, ln, di = h[order], ln[order], di[order]
        new = np.r_[True, (h[1:] != h[:-1]) | (ln[1:] != ln[:-1])]
        return pd.DataFrame({"doc_id": di[~new]})

    drops = meta.map_batches(surv_rows, batch_format="pyarrow") \
        .groupby("__b").map_groups(drops_in_bucket,
                                   batch_format="pandas").to_pandas()
    drop_ref = ray.put(np.sort(drops["doc_id"].to_numpy(
        dtype=np.int64)))

    def m_d(t):
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        return m_b(t) & ~np.isin(d, ray.get(drop_ref))

    n3, w3 = fold_counts(meta, m_d)
    budget = w3 // 2

    K = np.int64(2654435761)
    M32 = np.int64(4294967296)
    M31 = np.int64(2147483648)

    def keyed(t: pa.Table) -> pa.Table:
        keep = m_d(t)
        d = t.column("doc_id").to_numpy(zero_copy_only=False)[keep]
        nw = t.column("n_words").to_numpy(zero_copy_only=False)[keep]
        key = ((d * K) % M32) * M31 + d
        return pa.table({"key": pa.array(key),
                         "n_tokens": pa.array(nw)})

    scanned = ordered_prefix_scan(
        meta.map_batches(keyed, batch_format="pyarrow"),
        "key", "n_tokens", op="sum")

    def cut_part(t: pa.Table) -> pa.Table:
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        p = t.column("prefix").to_numpy(zero_copy_only=False)
        keep = p + n <= budget
        return pa.table({"n": pa.array([int(keep.sum())]),
                         "w": pa.array([int(n[keep].sum())])})

    p = scanned.map_batches(cut_part, batch_format="pyarrow").to_pandas()
    n4, w4 = int(p["n"].sum()), int(p["w"].sum())

    return pd.DataFrame({
        "stage": np.arange(1, 5, dtype=np.int64),
        "name": ["quality", "badwords", "dedup", "budget"],
        "docs_in": np.array([n0, n1, n2, n3], dtype=np.int64),
        "docs_out": np.array([n1, n2, n3, n4], dtype=np.int64),
        "words_out": np.array([w1, w2, w3, w4], dtype=np.int64)})


QUERIES["curation_funnel_docs"] = curation_funnel_docs
ORACLES["curation_funnel_docs"] = """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 40 = 0
    ),
    meta AS (
      SELECT doc_id, text,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             CASE WHEN list_contains(string_split(text, ' '), 'dup')
                  THEN 1 ELSE 0 END AS bad
      FROM corpus
    ),
    q AS (SELECT * FROM meta WHERE n_words >= 20),
    b AS (SELECT * FROM q WHERE bad = 0),
    d AS (
      SELECT doc_id, n_words FROM (
        SELECT doc_id, n_words,
               ROW_NUMBER() OVER (PARTITION BY text
                                  ORDER BY doc_id) AS rn
        FROM b) WHERE rn = 1
    ),
    tot AS (SELECT CAST(SUM(n_words) AS BIGINT) AS tw FROM d),
    ranked AS (
      SELECT n_words,
             SUM(n_words) OVER (
               ORDER BY ((doc_id * 2654435761) % 4294967296)
                        * 2147483648 + doc_id) AS run
      FROM d
    ),
    kept AS (
      SELECT * FROM ranked WHERE run <= (SELECT tw // 2 FROM tot)
    )
    SELECT * FROM (
      SELECT CAST(1 AS BIGINT) AS stage, 'quality' AS name,
             (SELECT COUNT(*) FROM meta) AS docs_in,
             (SELECT COUNT(*) FROM q) AS docs_out,
             CAST((SELECT SUM(n_words) FROM q) AS BIGINT) AS words_out
      UNION ALL
      SELECT CAST(2 AS BIGINT), 'badwords', (SELECT COUNT(*) FROM q),
             (SELECT COUNT(*) FROM b),
             CAST((SELECT SUM(n_words) FROM b) AS BIGINT)
      UNION ALL
      SELECT CAST(3 AS BIGINT), 'dedup', (SELECT COUNT(*) FROM b),
             (SELECT COUNT(*) FROM d),
             CAST((SELECT SUM(n_words) FROM d) AS BIGINT)
      UNION ALL
      SELECT CAST(4 AS BIGINT), 'budget', (SELECT COUNT(*) FROM d),
             (SELECT COUNT(*) FROM kept),
             CAST((SELECT SUM(n_words) FROM kept) AS BIGINT)
    ) ORDER BY stage
"""


def _unigram_model(sf_dir: str):
    from ..stages.unigram import train_unigram, word_count_table

    word_ds = word_count_table(_read(sf_dir, "documents",
                                     columns=["text"]))
    return train_unigram(word_ds, max_piece_len=4, seed_vocab=160,
                         vocab_size=48, em_rounds=2)


def unigram_lm_tokenizer(sf_dir: str, k: int = 30) -> pd.DataFrame:
    """UNIGRAM LM tokenizer training (Kudo ACL'18, the SentencePiece
    algorithm) — the second trained tokenizer family beside BPE:
    substring-seeded vocabulary, hard-EM (Viterbi) rounds, prune to
    vocab_size, final E-step. All arithmetic EXACT (int64 counts,
    big-int cross-multiplied rational DP scores — no float enters the
    training), so the result is bit-identical at any parallelism; the
    DP itself is not SQL-expressible (rows-only gate), so pytest locks
    equality against an INDEPENDENT local reimplementation plus the
    char-conservation identity Σ count_p·len(p) = Σ c_w·len(w).

    Distributed shape (stages/unigram.py): corpus → (word, count)
    table via one hash exchange; each EM round is one map_batches over
    the DISTINCT-WORD table (broadcast piece table, per-batch DP,
    piece-bounded int64 partial vectors folded on the driver) — round
    cost is independent of corpus size. Output: top-k pieces by final
    Viterbi count."""
    model = _unigram_model(sf_dir)
    t = model.table()
    t = t.sort_values(["count", "piece"], ascending=[False, True],
                      kind="stable").head(k).reset_index(drop=True)
    t["rank"] = np.arange(1, len(t) + 1, dtype=np.int64)
    return t.astype({"piece": "str", "count": "int64", "rank": "int64"})


QUERIES["unigram_lm_tokenizer"] = unigram_lm_tokenizer


def unigram_encode_docs(sf_dir: str) -> pd.DataFrame:
    """Tokenizer train→APPLY loop for the unigram model (the fd_pca /
    bpe_encode convention): encode every document with the trained
    piece table and report per-source totals (n_words, n_pieces,
    n_chars). Words encode ONCE on the distinct-word table (the DP
    never touches the corpus); the corpus pass maps each token to its
    piece count through the broadcast word→pieces table and folds
    per-source int64 partials — zero shuffles. Compression ratio
    n_chars/n_pieces is the standard tokenizer fertility metric."""
    import ray

    from ..stages.unigram import viterbi_encode

    model = _unigram_model(sf_dir)

    from ..stages.unigram import word_count_table

    word_ds = word_count_table(_read(sf_dir, "documents",
                                     columns=["text"]))
    words_df = word_ds.to_pandas()
    wp = {w: len(viterbi_encode(w, model))
          for w in words_df["word"]}
    wp_ref = ray.put(wp)

    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def part(t: pa.Table) -> pa.Table:
        lut = ray.get(wp_ref)
        toks = pc.split_pattern(
            pc.fill_null(t.column("text"), ""), " ").combine_chunks()
        counts = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False)
        flat = toks.flatten()
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        src = np.repeat(np.asarray(t.column("source").to_pylist(),
                                   dtype=object), counts)[keep]
        ws = pd.Series(flat.to_numpy(zero_copy_only=False)[keep])
        pieces = ws.map(lut).to_numpy(dtype=np.int64)
        chars = ws.str.len().to_numpy(dtype=np.int64)
        df = pd.DataFrame({"source": src, "n_words": 1,
                           "n_pieces": pieces, "n_chars": chars})
        return pa.Table.from_pandas(
            df.groupby("source", as_index=False).sum(),
            preserve_index=False)

    out = ds.map_batches(part, batch_format="pyarrow").to_pandas() \
        .groupby("source", as_index=False)[
            ["n_words", "n_pieces", "n_chars"]].sum()
    return out.sort_values("source").reset_index(drop=True).astype(
        {"source": "str", "n_words": "int64", "n_pieces": "int64",
         "n_chars": "int64"})


QUERIES["unigram_encode_docs"] = unigram_encode_docs


def assoc_rules_events(sf_dir: str, num_buckets: int = 64,
                       scale: int = 1_000_000) -> pd.DataFrame:
    """ASSOCIATION RULES (Agrawal SIGMOD'93 market-basket, level 2):
    baskets = each user's distinct event-type set; for every ordered
    pair a→b report exact integer support counts (n_pair, n_ante,
    n_cons) and fixed-point LIFT = n_pair·n_users·10⁶ //
    (n_ante·n_cons) — every division an explicit floor both engines
    state identically (the DuckDB `//` convention).

    Distributed shape — the bitmask-histogram trick (the vocabulary-
    Jaccard precedent): event types are a bounded universe, so one
    user-hash exchange of distinct (user, type) rows reduces each
    bucket to per-user type BITMASKS, and a bucket's contribution is a
    T×T int64 pair matrix + a length-T antecedent vector + its user
    count — driver folds (buckets × T²) ints, never user rows. Basket
    sets never materialize anywhere."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    # bounded type universe: driver fold of per-batch uniques
    tset: set = set()
    for b in ds.map_batches(
            lambda t: pa.table({"t": pc.unique(
                t.column("event_type").combine_chunks())}),
            batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        tset.update(b.column("t").to_pylist())
    types = pd.Index(sorted(tset))
    T = len(types)
    if T > 64:
        raise ValueError("bitmask path needs ≤64 types; use the "
                         "pair-hash exchange shape instead")

    from ..stages.dedup import _splitmix64

    def tag(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        code = types.get_indexer(t.column("event_type").to_pandas()) \
            .astype(np.int64)
        df = pd.DataFrame({"u": u, "c": code}).drop_duplicates()
        b = (_splitmix64(df["u"].to_numpy().astype(np.uint64))
             % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({"u": pa.array(df["u"].to_numpy()),
                         "c": pa.array(df["c"].to_numpy()),
                         "__b": pa.array(b)})

    def bucket_matrix(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy()
        c = g["c"].to_numpy()
        order = np.argsort(u, kind="stable")
        u, c = u[order], c[order]
        starts = np.nonzero(np.r_[True, u[1:] != u[:-1]])[0]
        masks = np.bitwise_or.reduceat(
            (np.int64(1) << c.astype(np.int64)), starts) \
            if len(u) else np.zeros(0, dtype=np.int64)
        # dedupe within user already done per batch; across batches
        # the same user lands in this one bucket, so reduceat over
        # possibly-repeated (u,c) rows still ORs to the same mask
        pair = np.zeros((T, T), dtype=np.int64)
        has = np.zeros(T, dtype=np.int64)
        for a in range(T):
            sa = (masks >> np.int64(a)) & np.int64(1)
            has[a] = int(sa.sum())
            for b2 in range(T):
                if a == b2:
                    continue
                pair[a, b2] = int(
                    (sa & ((masks >> np.int64(b2)) & np.int64(1))).sum())
        return pd.DataFrame({"pair": [pair.reshape(-1).tolist()],
                             "has": [has.tolist()],
                             "n_users": [len(masks)]})

    parts = ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__b").map_groups(bucket_matrix,
                                   batch_format="pandas").to_pandas()
    pair = np.zeros((T, T), dtype=np.int64)
    has = np.zeros(T, dtype=np.int64)
    n_users = 0
    for _, r in parts.iterrows():
        pair += np.asarray(r["pair"], dtype=np.int64).reshape(T, T)
        has += np.asarray(r["has"], dtype=np.int64)
        n_users += int(r["n_users"])

    rows = []
    for a in range(T):
        for b2 in range(T):
            if a == b2 or pair[a, b2] == 0:
                continue
            lift = (int(pair[a, b2]) * n_users * scale) \
                // (int(has[a]) * int(has[b2]))
            rows.append((types[a], types[b2], int(pair[a, b2]),
                         int(has[a]), int(has[b2]), lift))
    out = pd.DataFrame(rows, columns=["ante", "cons", "n_pair",
                                      "n_ante", "n_cons", "lift_fp"])
    return out.sort_values(["ante", "cons"]).reset_index(drop=True) \
        .astype({"n_pair": "int64", "n_ante": "int64",
                 "n_cons": "int64", "lift_fp": "int64"})


QUERIES["assoc_rules_events"] = assoc_rules_events
ORACLES["assoc_rules_events"] = """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nu
          FROM events),
    tc AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c
           FROM ut GROUP BY event_type),
    pairs AS (
      SELECT a.event_type AS ante, b.event_type AS cons,
             CAST(COUNT(*) AS BIGINT) AS np
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type <> b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT ante, cons, np AS n_pair, ta.c AS n_ante, tb.c AS n_cons,
           CAST((np * (SELECT nu FROM n) * 1000000)
                // (ta.c * tb.c) AS BIGINT) AS lift_fp
    FROM pairs
    JOIN tc ta ON ta.event_type = ante
    JOIN tc tb ON tb.event_type = cons
    ORDER BY ante, cons
"""


def compression_quality_docs(sf_dir: str, level: int = 6,
                             threshold_fp: int = 2000) -> pd.DataFrame:
    """COMPRESSION-RATIO quality signal (Gopher / RefinedWeb drop
    pages that deflate too well — machine-generated and template text
    is highly compressible): per doc, zlib(level 6) compressed size
    and the fixed-point ratio comp_len·10⁴ // n_chars; docs under the
    threshold are flagged. A synthetic high-repetition doc is PLANTED
    in-query per batch-leading doc (first 5 words × 20, doc_id + 2·10⁶)
    so the flag provably fires (natural corpus ratios measured ≥ 0.39,
    plants ≈ 0.08). zlib output is a pure deterministic function of
    (bytes, level) — bit-identical at any parallelism — but not
    SQL-expressible, so the gate is rows-only and pytest locks local
    zlib equality + planted recall. One zero-shuffle pass; the zlib
    call is per-DOC C code (the per-row cost is the compressor itself,
    not Python bookkeeping)."""
    import zlib

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def part(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        texts = t.column("text").to_pylist()
        sel = np.flatnonzero(ids % 40 == 0)
        all_ids = np.r_[ids, ids[sel] + 2_000_000]
        all_txt = texts + [" ".join(texts[i].split(" ")[:5]) * 20
                           for i in sel]
        comp = np.fromiter(
            (len(zlib.compress(x.encode(), level)) for x in all_txt),
            dtype=np.int64, count=len(all_txt))
        n = np.fromiter((len(x) for x in all_txt), dtype=np.int64,
                        count=len(all_txt))
        ratio = comp * 10_000 // n
        return pa.table({"doc_id": pa.array(all_ids),
                         "n_chars": pa.array(n),
                         "comp_len": pa.array(comp),
                         "ratio_fp": pa.array(ratio),
                         "flagged": pa.array(
                             (ratio < threshold_fp).astype(np.int64))})

    out = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True).astype(
        {"doc_id": "int64", "n_chars": "int64", "comp_len": "int64",
         "ratio_fp": "int64", "flagged": "int64"})


QUERIES["compression_quality_docs"] = compression_quality_docs


def _bm25_rows(sf_dir: str, terms: list[str]):
    """Shared BM25 machinery: returns (rows DataFrame with per-(doc,
    term) tf + per-doc len, df dict, N, TC). One corpus pass emits
    rows ONLY for docs hitting ≥1 query term (O(Σ df) — the
    keyword_search selectivity bound); N/TC/df fold as per-batch int
    partials."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    tarr = pa.array(sorted(set(terms)))

    def part(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        toks = pc.split_pattern(
            pc.fill_null(t.column("text"), ""), " ").combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = toks.flatten()
        doc = np.repeat(np.arange(len(ids)), lens)
        hit = pc.is_in(flat, value_set=tarr).to_numpy(
            zero_copy_only=False)
        w = flat.to_numpy(zero_copy_only=False)[hit]
        d = doc[hit]
        if len(d):
            df = pd.DataFrame({"doc_id": ids[d], "term": w,
                               "len": lens[d]})
            g = df.groupby(["doc_id", "term", "len"],
                           as_index=False).size() \
                .rename(columns={"size": "tf"})
        else:
            g = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                              "term": pd.Series([], dtype=object),
                              "len": pd.Series([], dtype="int64"),
                              "tf": pd.Series([], dtype="int64")})
        g["__n"] = np.int64(len(ids))
        g["__tc"] = np.int64(lens.sum())
        # one stats row even for hit-free batches so N/TC stay exact
        if not len(g):
            g = pd.DataFrame({"doc_id": [-1], "term": [""],
                              "len": [0], "tf": [0],
                              "__n": [np.int64(len(ids))],
                              "__tc": [np.int64(lens.sum())]})
        else:
            g.loc[g.index[1:], ["__n", "__tc"]] = 0
        return pa.Table.from_pandas(g, preserve_index=False)

    rows = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    N = int(rows["__n"].sum())
    TC = int(rows["__tc"].sum())
    rows = rows[rows["doc_id"] >= 0][["doc_id", "term", "len", "tf"]]
    df = rows.groupby("term")["doc_id"].nunique().to_dict()
    return rows.reset_index(drop=True), df, N, TC


def _bm25_rank(rows: pd.DataFrame, df: dict, N: int, TC: int,
               k: int) -> pd.DataFrame:
    """Fixed-point BM25 (k1=6/5, b=3/4; idf_fp=(N·2²⁰)//df, the
    keyword_search convention): per-(doc,term) contribution
    idf_fp·44·tf·TC // (20·tf·TC + 6·TC + 18·len·N) — the closed
    integer form of idf·tf(k1+1)/(tf+k1(1−b+b·len/avg)) with
    avg=TC/N — summed per doc (integer sum: order-free), ranked
    (score desc, doc_id)."""
    if not len(rows):
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "score_fp": pd.Series([], dtype="int64"),
                             "n_terms": pd.Series([], dtype="int64")})
    idf = rows["term"].map(
        {t: (N << 20) // c for t, c in df.items()}).to_numpy(
        dtype=np.int64)
    tf = rows["tf"].to_numpy(dtype=np.int64)
    ln = rows["len"].to_numpy(dtype=np.int64)
    num = idf * (44 * tf * TC)
    assert num.max(initial=0) < (1 << 62), "BM25 fixed point overflow"
    contrib = num // (20 * tf * TC + 6 * TC + 18 * ln * N)
    agg = pd.DataFrame({"doc_id": rows["doc_id"].to_numpy(),
                        "score_fp": contrib, "n_terms": 1}) \
        .groupby("doc_id", as_index=False).sum()
    order = np.lexsort((agg["doc_id"].to_numpy(),
                        -agg["score_fp"].to_numpy()))[:k]
    out = agg.iloc[order].reset_index(drop=True)
    return out.astype({"doc_id": "int64", "score_fp": "int64",
                       "n_terms": "int64"})


def bm25_search_docs(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """BM25 ranked retrieval (Robertson–Spärck Jones / Okapi; the tf-
    SATURATING, length-normalized upgrade of keyword_search_docs'
    bare tf·idf) — entirely in int64 fixed point so the full ranking,
    tie boundary included, is statable in SQL and value-hash-checked:
    k1=6/5 and b=3/4 clear denominators exactly (see _bm25_rank), idf
    is the engine's (N·2²⁰)//df. One selectivity-bounded corpus pass
    (O(Σ df) rows reach the driver), N/TC/df as integer folds."""
    rows, df, N, TC = _bm25_rows(sf_dir, _SEARCH_TERMS)
    return _bm25_rank(rows, df, N, TC, k)


QUERIES["bm25_search_docs"] = bm25_search_docs
ORACLES["bm25_search_docs"] = """
    WITH docs AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS len,
             string_split(text, ' ') AS l
      FROM documents
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(len) AS BIGINT) AS tc FROM docs
    ),
    tok AS (
      SELECT doc_id, len, unnest(l) AS w FROM docs
    ),
    tf AS (
      SELECT doc_id, len, w, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok WHERE w IN ('dup', 'scan', 'window')
      GROUP BY doc_id, len, w
    ),
    df AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w),
    contrib AS (
      SELECT tf.doc_id,
             CAST((((SELECT n FROM stats) * 1048576) // df.df)
                  * (44 * tf.tf * (SELECT tc FROM stats))
                  // (20 * tf.tf * (SELECT tc FROM stats)
                      + 6 * (SELECT tc FROM stats)
                      + 18 * tf.len * (SELECT n FROM stats))
                  AS BIGINT) AS c
      FROM tf JOIN df USING (w)
    )
    SELECT doc_id, CAST(SUM(c) AS BIGINT) AS score_fp,
           CAST(COUNT(*) AS BIGINT) AS n_terms
    FROM contrib GROUP BY doc_id
    ORDER BY score_fp DESC, doc_id LIMIT 20
"""


def hybrid_rrf_docs(sf_dir: str, k_each: int = 20, k: int = 10,
                    rrf_k: int = 60) -> pd.DataFrame:
    """HYBRID retrieval fusion — Reciprocal Rank Fusion (Cormack
    SIGIR'09) of two rankings for the same query-by-example (document
    0): its BM25 keyword ranking (over the query doc's distinct
    terms) and its exact tf-cosine ranking (the doc_similar_topk
    scorer) — the sparse+dense "hybrid search" shape with both legs
    exact here. rrf_fp = Σ_lists 10⁹ // (60 + rank) is pure integer
    floor arithmetic, so the fused ranking — every tie included — is
    statable in SQL and value-hash-checked end to end (both leg CTEs
    + the fusion in one oracle). Absent-leg ranks report 0.

    Cost: the cosine leg is the one-pass streaming scorer; the BM25
    leg is selectivity-bounded (O(Σ df of the query doc's terms));
    fusion touches only 2·k_each driver rows."""
    qrow = _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(lambda t: t.filter(pc.equal(t.column("doc_id"),
                                                 0)),
                     batch_format="pyarrow").take_all()
    terms = sorted({w for w in qrow[0]["text"].split(" ") if w})

    rows, df, N, TC = _bm25_rows(sf_dir, terms)
    bm = _bm25_rank(rows[rows["doc_id"] != 0], df, N, TC, k_each)
    bm = bm.reset_index(drop=True)
    bm["rank_bm25"] = np.arange(1, len(bm) + 1, dtype=np.int64)

    cos = doc_similar_topk(sf_dir, n_queries=1, k=k_each)
    cos = cos.rename(columns={"rank": "rank_cos"})[
        ["doc_id", "rank_cos"]]

    fused = bm[["doc_id", "rank_bm25"]].merge(cos, on="doc_id",
                                              how="outer")
    fused["rank_bm25"] = fused["rank_bm25"].fillna(0).astype("int64")
    fused["rank_cos"] = fused["rank_cos"].fillna(0).astype("int64")
    S = 1_000_000_000

    def leg(r):
        return S // (rrf_k + r) if r > 0 else 0

    fused["rrf_fp"] = [leg(a) + leg(b) for a, b in
                       zip(fused["rank_bm25"], fused["rank_cos"])]
    order = np.lexsort((fused["doc_id"].to_numpy(),
                        -fused["rrf_fp"].to_numpy()))[:k]
    out = fused.iloc[order].reset_index(drop=True)
    return out[["doc_id", "rank_bm25", "rank_cos", "rrf_fp"]].astype(
        {"doc_id": "int64", "rank_bm25": "int64",
         "rank_cos": "int64", "rrf_fp": "int64"})


QUERIES["hybrid_rrf_docs"] = hybrid_rrf_docs
ORACLES["hybrid_rrf_docs"] = """
    WITH docs AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS len,
             string_split(text, ' ') AS l
      FROM documents
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(len) AS BIGINT) AS tc FROM docs
    ),
    tok AS (SELECT doc_id, len, unnest(l) AS w FROM docs),
    tok2 AS (SELECT doc_id, len, w FROM tok WHERE w <> ''),
    tf AS (
      SELECT doc_id, len, w, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok2 GROUP BY doc_id, len, w
    ),
    n2 AS (SELECT doc_id, CAST(SUM(tf*tf) AS BIGINT) AS n2
           FROM tf GROUP BY doc_id),
    q AS (SELECT w, tf FROM tf WHERE doc_id = 0),
    dots AS (
      SELECT c.doc_id AS did, CAST(SUM(q.tf * c.tf) AS BIGINT) AS dot
      FROM q JOIN tf c USING (w) WHERE c.doc_id <> 0
      GROUP BY c.doc_id
    ),
    r_cos AS (
      SELECT did, ROW_NUMBER() OVER (
               ORDER BY CAST(dot AS DOUBLE) /
                 SQRT(CAST(nq.n2 AS DOUBLE) * CAST(nc.n2 AS DOUBLE))
                 DESC, did) AS rc
      FROM dots
      JOIN n2 nq ON nq.doc_id = 0
      JOIN n2 nc ON nc.doc_id = did
      QUALIFY rc <= 20
    ),
    df AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf
      WHERE w IN (SELECT w FROM q) GROUP BY w
    ),
    contrib AS (
      SELECT tf.doc_id,
             CAST((((SELECT n FROM stats) * 1048576) // df.df)
                  * (44 * tf.tf * (SELECT tc FROM stats))
                  // (20 * tf.tf * (SELECT tc FROM stats)
                      + 6 * (SELECT tc FROM stats)
                      + 18 * tf.len * (SELECT n FROM stats))
                  AS BIGINT) AS c
      FROM tf JOIN df USING (w) WHERE tf.doc_id <> 0
    ),
    r_bm AS (
      SELECT doc_id, ROW_NUMBER() OVER (
               ORDER BY SUM(c) DESC, doc_id) AS rb
      FROM contrib GROUP BY doc_id
      QUALIFY rb <= 20
    ),
    fused AS (
      SELECT COALESCE(r_bm.doc_id, r_cos.did) AS doc_id,
             CAST(COALESCE(rb, 0) AS BIGINT) AS rank_bm25,
             CAST(COALESCE(rc, 0) AS BIGINT) AS rank_cos,
             CAST(COALESCE(1000000000 // (60 + rb), 0)
                  + COALESCE(1000000000 // (60 + rc), 0) AS BIGINT)
               AS rrf_fp
      FROM r_bm FULL OUTER JOIN r_cos ON r_bm.doc_id = r_cos.did
    )
    SELECT doc_id, rank_bm25, rank_cos, rrf_fp
    FROM fused ORDER BY rrf_fp DESC, doc_id LIMIT 10
"""


_DAY_US = 86_400_000_000


def _monday_of(us: np.ndarray) -> np.ndarray:
    """Days-since-epoch of the Monday starting the ISO week of each
    µs timestamp — exactly DuckDB's date_trunc('week', ts) (verified:
    1970-01-01 is a Thursday, so Monday = day − ((day+3) mod 7))."""
    days = us // _DAY_US
    return days - ((days + 3) % 7)


def cohort_retention_events(sf_dir: str, num_buckets: int = 64
                            ) -> pd.DataFrame:
    """COHORT RETENTION matrix — the product-analytics classic: users
    cohorted by the week of their FIRST 'signup' event; cell
    (cohort_day, week_offset) counts distinct cohort users with ANY
    event in cohort week + offset (offset 0 is the signup week
    itself). All-integer week arithmetic (Monday day-index, exactly
    SQL date_trunc('week')), so the whole matrix value-hash-checks.

    Distributed shape: the corpus reduces per batch to distinct
    (user, week, is_signup_week) 24-byte rows; ONE user-hash exchange
    co-locates each user's weeks; per bucket a lexsort/reduceat pass
    finds first-signup weeks and emits (cohort, offset) count
    partials — matrix-bounded rows to the driver, user rows never
    leave their bucket."""
    from ..stages.dedup import _splitmix64

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_type"])

    def rows(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        us = t.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        wk = _monday_of(us)
        sign = pc.equal(t.column("event_type"), "signup").to_numpy(
            zero_copy_only=False)
        df = pd.DataFrame({"u": u, "wk": wk,
                           "s": sign.astype(np.int64)})
        g = df.groupby(["u", "wk"], as_index=False)["s"].max()
        b = (_splitmix64(g["u"].to_numpy().astype(np.uint64))
             % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({"u": pa.array(g["u"].to_numpy()),
                         "wk": pa.array(g["wk"].to_numpy()),
                         "s": pa.array(g["s"].to_numpy()),
                         "__b": pa.array(b)})

    def bucket_cells(g: pd.DataFrame) -> pd.DataFrame:
        d = g.groupby(["u", "wk"], as_index=False)["s"].max() \
            .sort_values(["u", "wk"], kind="stable")
        u = d["u"].to_numpy()
        wk = d["wk"].to_numpy()
        s = d["s"].to_numpy()
        # first signup week per user
        su = u[s > 0]
        swk = wk[s > 0]
        starts = np.nonzero(np.r_[True, su[1:] != su[:-1]])[0]
        first_u = su[starts] if len(su) else su
        first_wk = np.minimum.reduceat(swk, starts) if len(su) \
            else swk
        cohort = pd.Series(first_wk, index=first_u)
        idx = pd.Series(u).map(cohort)
        have = idx.notna().to_numpy()
        off = (wk[have] - idx[have].to_numpy(dtype=np.int64)) // 7
        keep = off >= 0
        cells = pd.DataFrame({
            "cohort_day": idx[have].to_numpy(dtype=np.int64)[keep],
            "week_offset": off[keep].astype(np.int64), "n_users": 1})
        if not len(cells):
            return pd.DataFrame({
                "cohort_day": pd.Series([], dtype="int64"),
                "week_offset": pd.Series([], dtype="int64"),
                "n_users": pd.Series([], dtype="int64")})
        return cells.groupby(["cohort_day", "week_offset"],
                             as_index=False)["n_users"].sum()

    parts = ds.map_batches(rows, batch_format="pyarrow") \
        .groupby("__b").map_groups(bucket_cells,
                                   batch_format="pandas").to_pandas()
    out = parts.groupby(["cohort_day", "week_offset"],
                        as_index=False)["n_users"].sum()
    return out.sort_values(["cohort_day", "week_offset"]) \
        .reset_index(drop=True).astype({"cohort_day": "int64",
                                        "week_offset": "int64",
                                        "n_users": "int64"})


QUERIES["cohort_retention_events"] = cohort_retention_events
ORACLES["cohort_retention_events"] = """
    WITH first_signup AS (
      SELECT user_id,
             CAST(date_diff('day', DATE '1970-01-01',
                  CAST(date_trunc('week', MIN(ts)) AS DATE)) AS BIGINT)
               AS cohort_day
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    weeks AS (
      SELECT DISTINCT user_id,
             CAST(date_diff('day', DATE '1970-01-01',
                  CAST(date_trunc('week', ts) AS DATE)) AS BIGINT)
               AS wk
      FROM events
    )
    SELECT f.cohort_day,
           CAST((w.wk - f.cohort_day) // 7 AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT w.user_id) AS BIGINT) AS n_users
    FROM weeks w JOIN first_signup f USING (user_id)
    WHERE w.wk >= f.cohort_day
    GROUP BY f.cohort_day, week_offset
    ORDER BY f.cohort_day, week_offset
"""


def funnel_conversion_events(sf_dir: str, num_buckets: int = 64
                             ) -> pd.DataFrame:
    """ORDERED FUNNEL conversion (view → click → purchase, STRICT
    temporal order): stage k counts users whose earliest stage-k event
    strictly follows their earliest qualifying stage-(k−1) time — the
    product-analytics sequence operator (a per-user chained MIN, not a
    mere event-count funnel). Exact µs integer timestamps end to end.

    Distributed shape: filter to the 3 stage types at the read, reduce
    each batch to per-(user, stage) MIN-ts rows, ONE user-hash
    exchange, per bucket a 3-step vectorized chained-min; only the
    3-row count partial leaves each bucket."""
    from ..stages.dedup import _splitmix64

    stages = ["view", "click", "purchase"]
    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_type"])

    def rows(t: pa.Table) -> pa.Table:
        # NO per-batch MIN combiner here — deliberately. Stage k's
        # time is min{ts > t_{k-1}}, which a per-(user,stage) batch
        # min can destroy (the kept min may precede t_{k-1} while a
        # discarded later event qualified). Ordered-sequence matching
        # genuinely needs the user's qualifying events co-located:
        # ship the 24-byte filtered rows through one exchange.
        code = pd.Series(t.column("event_type").to_pandas()) \
            .map({s: i for i, s in enumerate(stages)})
        have = code.notna().to_numpy()
        u = t.column("user_id").to_numpy(zero_copy_only=False)[have]
        us = t.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)[have]
        c = code[have].to_numpy(dtype=np.int64)
        b = (_splitmix64(u.astype(np.uint64))
             % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({"u": pa.array(u), "c": pa.array(c),
                         "ts": pa.array(us), "__b": pa.array(b)})

    NOTS = np.int64(1) << np.int64(62)

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy()
        c = g["c"].to_numpy()
        ts = g["ts"].to_numpy()
        uu = np.unique(u)
        uix = pd.Index(uu)
        t_prev = None
        counts = []
        for k in range(len(stages)):
            sel = c == k
            us_, tss = u[sel], ts[sel]
            if t_prev is not None:
                prev = t_prev[uix.get_indexer(pd.Index(us_))]
                tss = np.where(tss > prev, tss, NOTS)
            order = np.argsort(us_, kind="stable")
            us_, tss = us_[order], tss[order]
            starts = np.nonzero(np.r_[True, us_[1:] != us_[:-1]])[0]
            tk = np.full(len(uu), NOTS, dtype=np.int64)
            if len(us_):
                mins = np.minimum.reduceat(tss, starts)
                tk[uix.get_indexer(pd.Index(us_[starts]))] = mins
            t_prev = tk
            counts.append(int((tk < NOTS).sum()))
        return pd.DataFrame({"stage": np.arange(len(stages),
                                                dtype=np.int64),
                             "n_users": np.array(counts,
                                                 dtype=np.int64)})

    parts = ds.map_batches(rows, batch_format="pyarrow") \
        .groupby("__b").map_groups(bucket_counts,
                                   batch_format="pandas").to_pandas()
    out = parts.groupby("stage", as_index=False)["n_users"].sum()
    out["name"] = [stages[i] for i in out["stage"]]
    return out[["stage", "name", "n_users"]] \
        .sort_values("stage").reset_index(drop=True) \
        .astype({"stage": "int64", "name": "str", "n_users": "int64"})


QUERIES["funnel_conversion_events"] = funnel_conversion_events
ORACLES["funnel_conversion_events"] = """
    WITH t1 AS (
      SELECT user_id, MIN(ts) AS ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
      SELECT e.user_id, MIN(e.ts) AS ts
      FROM events e JOIN t1 ON e.user_id = t1.user_id
      WHERE e.event_type = 'click' AND e.ts > t1.ts
      GROUP BY e.user_id
    ),
    t3 AS (
      SELECT e.user_id, MIN(e.ts) AS ts
      FROM events e JOIN t2 ON e.user_id = t2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > t2.ts
      GROUP BY e.user_id
    )
    SELECT * FROM (
      SELECT CAST(0 AS BIGINT) AS stage, 'view' AS name,
             CAST((SELECT COUNT(*) FROM t1) AS BIGINT) AS n_users
      UNION ALL
      SELECT CAST(1 AS BIGINT), 'click',
             CAST((SELECT COUNT(*) FROM t2) AS BIGINT)
      UNION ALL
      SELECT CAST(2 AS BIGINT), 'purchase',
             CAST((SELECT COUNT(*) FROM t3) AS BIGINT)
    ) ORDER BY stage
"""


def bm25_index_search_docs(sf_dir: str) -> pd.DataFrame:
    """BM25 answered FROM THE INVERTED INDEX (stages/invindex.py v2:
    postings carry doc token lengths, meta carries n_docs /
    total_tokens) — the index-served twin of `bm25_search_docs`,
    touching ZERO corpus bytes at query time: only the 3 query terms'
    shards are read (term-IN filter, shard pruning pytest-locked).
    Same exact fixed-point arithmetic, same SQL oracle ranking —
    and pytest locks index-served ≡ corpus-scan equality."""
    from ..stages.invindex import bm25_search_index

    out = bm25_search_index(_inverted_index_dir(sf_dir),
                            _SEARCH_TERMS, k=20)
    return out.rename(columns={})


QUERIES["bm25_index_search_docs"] = bm25_index_search_docs
ORACLES["bm25_index_search_docs"] = ORACLES["bm25_search_docs"]


def _multimodal_cache(name: str, build_fn, n: int) -> str:
    import glob as _glob
    import tempfile

    cache = os.path.join(tempfile.gettempdir(), "raysketch_data", name)
    if not _glob.glob(os.path.join(cache, "*.parquet")):
        import pyarrow.parquet as pq

        os.makedirs(cache, exist_ok=True)
        tmp = os.path.join(cache, "_part0.tmp")
        pq.write_table(build_fn(), tmp, row_group_size=max(16, n // 4))
        os.replace(tmp, os.path.join(cache, "part0.parquet"))
    return cache


def video_scene_cuts(sf_dir: str) -> pd.DataFrame:
    """SCENE-CUT detection — temporal video segmentation (the shot-
    boundary operator every video-curation pipeline runs before
    clip-level dedup/captioning): per-frame integer SAD against the
    previous frame, cuts where sad_fp = ΣΔ·1000//(h·w) crosses the
    threshold. Clips are slow pans with PLANTED hard cuts in every
    4th clip (stages/multimodal.make_scenecut_y4m_table, ground-truth
    cut frame stored beside the payload); pytest asserts exact
    detection (every plant found at its frame, zero false positives —
    fixture separation ≈ 45k vs ≥ 106k around the 60k threshold).
    Actor-pool decode, all-integer, rows-only gate."""
    import ray.data

    from ..stages.multimodal import (VideoSceneCut,
                                     make_scenecut_y4m_table)

    n = max(32, int(2048 * sf_of(sf_dir)))
    cache = _multimodal_cache(
        f"scenecut_y4ms_n{n}_s13",
        lambda: make_scenecut_y4m_table(n, seed=13), n)
    out = (ray.data.read_parquet(cache,
                                 columns=["item_id", "payload"])
           .map_batches(VideoSceneCut, batch_format="pyarrow",
                        batch_size=32,
                        concurrency=auto_concurrency())
           .to_pandas())
    return out.sort_values(["item_id", "frame_idx"]) \
        .reset_index(drop=True).astype({"item_id": "int64",
                                        "frame_idx": "int32",
                                        "sad_fp": "int64"})


QUERIES["video_scene_cuts"] = video_scene_cuts


def audio_resample_stats(sf_dir: str, factor: int = 4) -> pd.DataFrame:
    """Audio RESAMPLE (integer 1/4 decimation with exact box low-pass)
    over the real-WAV fixture — the preprocessing transform between
    decode and feature extraction: emits the resampled PCM payload
    plus audit columns; this query reports the audit (n_in, n_out,
    new rate, output RMS in fixed point ×1000). pytest locks exact
    length arithmetic, payload round-trip decodability, and
    tone-preservation (RMS of a decimated pure tone within 2% of the
    source)."""
    import ray.data

    from ..stages.multimodal import AudioResample, make_real_wav_table

    n = max(32, int(2048 * sf_of(sf_dir)))
    cache = _multimodal_cache(f"wavs_n{n}_s9",
                              lambda: make_real_wav_table(n, seed=9), n)

    def rms_audit(t: pa.Table) -> pa.Table:
        from ..stages.wavcodec import decode_wav

        rms = []
        for p in t.column("payload").to_pylist():
            y, _rate = decode_wav(p)
            y = np.asarray(y if y.ndim == 1 else y[:, 0],
                           dtype=np.float64)
            rms.append(int(np.sqrt((y * y).mean()) * 1_000_000)
                       if len(y) else 0)
        return pa.table({
            "item_id": t.column("item_id"),
            "n_in": t.column("n_in"), "n_out": t.column("n_out"),
            "sample_rate": t.column("sample_rate"),
            "rms_fp": pa.array(np.array(rms, dtype=np.int64))})

    out = (ray.data.read_parquet(cache,
                                 columns=["item_id", "payload"])
           .map_batches(AudioResample,
                        fn_constructor_kwargs={"factor": factor},
                        batch_format="pyarrow", batch_size=64,
                        concurrency=auto_concurrency())
           .map_batches(rms_audit, batch_format="pyarrow")
           .to_pandas())
    return out.sort_values("item_id").reset_index(drop=True).astype(
        {"item_id": "int64", "n_in": "int64", "n_out": "int64",
         "sample_rate": "int32", "rms_fp": "int64"})


QUERIES["audio_resample_stats"] = audio_resample_stats


def personalized_pagerank_words(sf_dir: str, iters: int = 2,
                                num_buckets: int = 64) -> pd.DataFrame:
    """PERSONALIZED PageRank (topic-sensitive: Haveliwala WWW'02) —
    the teleport mass returns to a SEED set {'spark', 'join'} instead
    of the uniform vector, ranking the graph by proximity to the
    seeds: r ← α·e_S + (1−α)·AᵀD⁻¹r from r₀ = e_S, α = 15/100, in the
    pagerank_word_graph exact int64 fixed point (scale 10¹², explicit
    floor divisions, statable in SQL). Same distributed shape:
    node-bounded broadcast vector, per-batch bincount partial folds
    over the materialized distinct-edge dataset, zero shuffles per
    pass."""
    import ray

    S = 1_000_000_000_000
    seeds = ("join", "spark")

    edges = _word_edge_dataset(sf_dir, num_buckets)
    vocab_set: set = set()
    for b in edges.iter_batches(batch_format="pyarrow", batch_size=None):
        vocab_set.update(b.column("w1").to_pylist())
        vocab_set.update(b.column("w2").to_pylist())
    vocab = pd.Index(sorted(vocab_set))
    n = len(vocab)
    vocab_b = ray.put(vocab)
    seed_vec = np.where(vocab.isin(seeds), np.int64(S), np.int64(0))

    def fold_vec(make_partial):
        out = np.zeros(n, dtype=np.int64)
        for b in edges.map_batches(make_partial, batch_format="pyarrow",
                                   batch_size=None) \
                .iter_batches(batch_format="pyarrow", batch_size=None):
            if b.num_rows:
                out += np.asarray(b.column("v").to_pylist()[0],
                                  dtype=np.int64)
        return out

    def deg_partial(t: pa.Table) -> pa.Table:
        voc = ray.get(vocab_b)
        i = voc.get_indexer(t.column("w1").to_pandas())
        d = np.bincount(i, minlength=n).astype(np.int64)
        return pa.table({"v": pa.array([d.tolist()])})

    deg = fold_vec(deg_partial)
    rank = seed_vec.copy()
    for _ in range(iters):
        rank_ref = ray.put(rank)

        def contrib_partial(t: pa.Table) -> pa.Table:
            voc = ray.get(vocab_b)
            r = ray.get(rank_ref)
            i = voc.get_indexer(t.column("w1").to_pandas())
            j = voc.get_indexer(t.column("w2").to_pandas())
            c = r[i] // np.maximum(deg[i], 1)
            out = np.zeros(n, dtype=np.int64)
            np.add.at(out, j, c)
            return pa.table({"v": pa.array([out.tolist()])})

        s = fold_vec(contrib_partial)
        rank = (15 * seed_vec) // 100 + (85 * s) // 100

    return pd.DataFrame({"word": vocab.to_numpy(),
                         "rank_scaled": rank}).sort_values("word") \
        .reset_index(drop=True)


QUERIES["personalized_pagerank_words"] = personalized_pagerank_words
ORACLES["personalized_pagerank_words"] = """
    WITH lists AS (SELECT string_split(text, ' ') AS l FROM documents),
    big AS (SELECT DISTINCT p[1] AS w1, p[2] AS w2 FROM (
      SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])) AS p FROM lists
    )),
    nodes AS (SELECT w1 AS w FROM big UNION SELECT w2 FROM big),
    deg AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS d FROM big GROUP BY w1),
    r0 AS (
      SELECT w, CASE WHEN w IN ('join', 'spark')
                     THEN CAST(1000000000000 AS BIGINT)
                     ELSE CAST(0 AS BIGINT) END AS r
      FROM nodes
    ),
    c1 AS (
      SELECT w2 AS w, SUM(r0.r // deg.d) AS s
      FROM big JOIN deg USING (w1) JOIN r0 ON r0.w = big.w1 GROUP BY w2
    ),
    r1 AS (
      SELECT n.w,
             (15 * CASE WHEN n.w IN ('join', 'spark')
                        THEN 1000000000000 ELSE 0 END) // 100
             + (85 * COALESCE(c1.s, 0)) // 100 AS r
      FROM nodes n LEFT JOIN c1 ON n.w = c1.w
    ),
    c2 AS (
      SELECT w2 AS w, SUM(r1.r // deg.d) AS s
      FROM big JOIN deg USING (w1) JOIN r1 ON r1.w = big.w1 GROUP BY w2
    ),
    r2 AS (
      SELECT n.w,
             (15 * CASE WHEN n.w IN ('join', 'spark')
                        THEN 1000000000000 ELSE 0 END) // 100
             + (85 * COALESCE(c2.s, 0)) // 100 AS r
      FROM nodes n LEFT JOIN c2 ON n.w = c2.w
    )
    SELECT w AS word, CAST(r AS BIGINT) AS rank_scaled
    FROM r2 ORDER BY word
"""


def mmr_diversify_docs(sf_dir: str, k: int = 10, pool: int = 20,
                       lam: float = 0.7) -> pd.DataFrame:
    """MMR — Maximal Marginal Relevance re-ranking (Carbonell–Goldstein
    SIGIR'98): greedily pick k of the top-`pool` cosine candidates for
    query doc 0, each step maximizing λ·rel(d) − (1−λ)·max_{s∈sel}
    sim(d, s) — the standard diversity re-rank between retrieval and
    LLM context packing. rel and sim are the engine's exact-int-dot
    cosines (doubles only at the final expression); ties break by
    doc_id; greedy selection is inherently sequential over k·pool
    driver-side cells, so the gate is rows-only and pytest locks the
    λ=1 degeneration (pure relevance order, frame-equal to the cosine
    top-k) plus an independent greedy recomputation.

    Cost: candidate generation is the streaming cosine scorer; the
    re-rank touches only pool ≤ 20 candidate tf vectors (one filtered
    gather pass — O(pool) rows)."""
    cand = doc_similar_topk(sf_dir, n_queries=1, k=pool)
    ids = cand["doc_id"].to_numpy(dtype=np.int64)
    rel = cand["cos"].to_numpy(dtype=np.float64)

    want = pa.array(np.r_[ids, [0]].tolist())
    rows = _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(lambda t: t.filter(
            pc.is_in(t.column("doc_id"), value_set=want)),
            batch_format="pyarrow").take_all()
    tf = {}
    for r in rows:
        d: dict = {}
        for w in r["text"].split(" "):
            if w:
                d[w] = d.get(w, 0) + 1
        tf[int(r["doc_id"])] = d

    def cosine(a: dict, b: dict) -> float:
        dot = sum(c * b.get(w, 0) for w, c in a.items())
        na = sum(v * v for v in a.values())
        nb = sum(v * v for v in b.values())
        return dot / np.sqrt(np.float64(na) * np.float64(nb))

    sim = np.zeros((len(ids), len(ids)))
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            sim[i, j] = sim[j, i] = cosine(tf[ids[i]], tf[ids[j]])

    selected: list[int] = []
    remaining = list(range(len(ids)))
    out_rows = []
    for rank in range(1, min(k, len(ids)) + 1):
        best = None
        for i in remaining:
            pen = max((sim[i, j] for j in selected), default=0.0)
            score = lam * rel[i] - (1.0 - lam) * pen
            key = (-score, ids[i])
            if best is None or key < best[0]:
                best = (key, i, score)
        _, i, score = best
        selected.append(i)
        remaining.remove(i)
        out_rows.append((rank, int(ids[i]), float(rel[i]),
                         float(score)))
    return pd.DataFrame(out_rows, columns=["rank", "doc_id",
                                           "rel_cos", "mmr_score"]) \
        .astype({"rank": "int64", "doc_id": "int64",
                 "rel_cos": "float64", "mmr_score": "float64"})


QUERIES["mmr_diversify_docs"] = mmr_diversify_docs


def max_concurrency_by_day(sf_dir: str, num_buckets: int = 64
                           ) -> pd.DataFrame:
    """SWEEP-LINE interval concurrency — max simultaneous user
    sessions per day (sessions = the sessionize_events 30-min-gap
    windows, active over [first_ts, last_ts]): the interval-algebra
    operator behind capacity planning and "peak concurrent" metrics.
    Concurrency only changes at session boundaries, so each session
    emits two 16-byte deltas keyed k = 2·µs (+1 at start) / 2·µs+1
    (−1 at end: starts process first at equal instants, ends are
    inclusive), and the running level at a boundary is the PREFIX SUM
    over smaller keys plus the key's own delta; the per-day report is
    MAX of the level over the day's boundary instants (the level is
    piecewise-constant between boundaries).

    Distributed shape: sessions form per user-hash bucket (the
    sessionize shape), boundary deltas pre-aggregate per batch and
    dedupe to unique keys through one hash exchange, the running
    level is ONE `ordered_prefix_scan` range exchange, and per-day
    maxima fold as day-bounded partials. SQL states the identical
    pipeline with LAG/SUM windows, value-hash-checked."""
    from ..stages.dedup import _splitmix64
    from ..stages.scan import ordered_prefix_scan

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def add_bucket(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(
            zero_copy_only=False).astype(np.uint64)
        b = (_splitmix64(u) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({"user_id": t.column("user_id"),
                         "us": t.column("ts").cast(pa.int64()),
                         "__b": pa.array(b)})

    GAP = 30 * 60 * 1_000_000

    def bounds_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "us"], kind="stable")
        uid = g["user_id"].to_numpy()
        us = g["us"].to_numpy()
        new = np.r_[True, (uid[1:] != uid[:-1])
                    | ((us[1:] - us[:-1]) > GAP)]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:] - 1, len(us) - 1] if len(starts) \
            else starts
        a = us[starts]
        b = us[ends]
        return pd.DataFrame({
            "k": np.r_[a * 2, b * 2 + 1].astype(np.int64),
            "d": np.r_[np.ones(len(a), dtype=np.int64),
                       -np.ones(len(b), dtype=np.int64)]})

    bounds = ds.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__b").map_groups(bounds_bucket, batch_format="pandas")

    def key_bucket(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False)
        b = (_splitmix64(k.astype(np.uint64))
             % np.uint64(num_buckets)).astype(np.int64)
        return t.append_column("__b", pa.array(b))

    def dedupe_keys(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("k", as_index=False)["d"].sum()
        return out[out["d"] != 0]

    uniq = bounds.map_batches(key_bucket, batch_format="pyarrow") \
        .groupby("__b").map_groups(dedupe_keys, batch_format="pandas")

    scanned = ordered_prefix_scan(uniq, "k", "d", op="sum")

    DAY2 = 2 * _DAY_US

    def day_max(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        p = t.column("prefix").to_numpy(zero_copy_only=False)
        run = p + d
        day = k // DAY2
        df = pd.DataFrame({"day": day, "m": run})
        return pa.Table.from_pandas(
            df.groupby("day", as_index=False)["m"].max(),
            preserve_index=False)

    parts = scanned.map_batches(day_max, batch_format="pyarrow") \
        .to_pandas()
    out = parts.groupby("day", as_index=False)["m"].max() \
        .rename(columns={"m": "max_concurrent"})
    return out.sort_values("day").reset_index(drop=True).astype(
        {"day": "int64", "max_concurrent": "int64"})


QUERIES["max_concurrency_by_day"] = max_concurrency_by_day
ORACLES["max_concurrency_by_day"] = """
    WITH s0 AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS st
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s1 AS (
      SELECT user_id, ts,
             SUM(st) OVER (PARTITION BY user_id ORDER BY ts) AS sid
      FROM s0
    ),
    iv AS (
      SELECT user_id, sid, MIN(ts) AS a, MAX(ts) AS b
      FROM s1 GROUP BY user_id, sid
    ),
    bnd AS (
      SELECT epoch_us(a) * 2 AS k, 1 AS d FROM iv
      UNION ALL
      SELECT epoch_us(b) * 2 + 1, -1 FROM iv
    ),
    u AS (SELECT k, SUM(d) AS d FROM bnd GROUP BY k HAVING SUM(d) <> 0),
    run AS (SELECT k, SUM(d) OVER (ORDER BY k) AS r FROM u)
    SELECT CAST(k // 172800000000 AS BIGINT) AS day,
           CAST(MAX(r) AS BIGINT) AS max_concurrent
    FROM run GROUP BY day ORDER BY day
"""


def orders_price_band_count(sf_dir: str) -> pd.DataFrame:
    """Keyless numeric band self-join (stages/joins.py band_count_self):
    for every order, how many orders CORPUS-WIDE are priced within ±$50
    — the non-equi proximity join (price-band blocking for record
    linkage / anomaly context) that no hash exchange can route, because
    the match condition is a range on the VALUE, not key equality.
    Value-range partitioning with ±d halo replication (the ghost-cell
    exchange); exact integer cents on both engines so the band boundary
    can never float-drift."""
    from ..stages.joins import band_count_self

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    prepped = orders.map_batches(
        lambda t: pa.table({"o_orderkey": t.column("o_orderkey"),
                            "c": _cents(t.column("o_totalprice"))}),
        batch_format="pyarrow",
    )
    out = band_count_self(prepped, on="c", d=5000,
                          carry=("o_orderkey",)).to_pandas()
    out = out[["o_orderkey", "n_near"]].astype(
        {"o_orderkey": "int64", "n_near": "int64"})
    return out.sort_values("o_orderkey").reset_index(drop=True)


QUERIES["orders_price_band_count"] = orders_price_band_count
ORACLES["orders_price_band_count"] = """
    WITH c AS (SELECT o_orderkey,
                      CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
               FROM orders)
    SELECT a.o_orderkey AS o_orderkey,
           CAST(COUNT(*) AS BIGINT) AS n_near
    FROM c a JOIN c b ON b.v BETWEEN a.v - 5000 AND a.v + 5000
    GROUP BY a.o_orderkey ORDER BY o_orderkey
"""


def scd2_revenue_by_tier(sf_dir: str) -> pd.DataFrame:
    """Slowly-changing-dimension (SCD Type 2) temporal join: each
    supplier has a 3-version effective-dated attribute history (tier
    changes at two deterministic breakpoints derived from s_suppkey),
    and every lineitem row must join to the version VALID AT ITS
    shipdate — the dimension-history lookup every warehouse fact load
    performs. The dimension is small, so the engine-correct plan is a
    BROADCAST temporal resolve: ship the per-supplier breakpoint/tier
    arrays once (ray.put-equivalent closure capture of KB-scale numpy),
    resolve each batch's version with two vectorized comparisons, and
    pre-reduce to ≤5 (tier, revenue, count) partials per batch — zero
    shuffles where the SQL oracle pays a 3×|supplier| interval join."""
    import pyarrow.parquet as pq

    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey"])
    skeys = np.sort(sup.column("s_suppkey").to_numpy(zero_copy_only=False)
                    .astype(np.int64))
    base_us = pd.Timestamp("1992-01-01").value // 1000
    DAY_US = 86_400_000_000
    b1_us = base_us + ((skeys * 97) % 500) * DAY_US
    b2_us = base_us + ((skeys * 97) % 500 + 200 + (skeys * 53) % 400) * DAY_US

    li = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_shipdate", "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        s = t.column("l_suppkey").to_numpy(zero_copy_only=False).astype(np.int64)
        ship = t.column("l_shipdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").view(np.int64)
        cents = _cents(t.column("l_extendedprice")).to_numpy()
        idx = np.searchsorted(skeys, s)
        ver = (ship >= b1_us[idx]).astype(np.int64) + (ship >= b2_us[idx])
        tier = (s + 7 * ver) % 5
        rev = np.bincount(tier, weights=cents.astype(np.float64),
                          minlength=5).astype(np.int64)
        # bincount weights go through float64 — exact only below 2^53;
        # per-batch partials stay far under it, the driver folds ints
        n = np.bincount(tier, minlength=5)
        return pa.table({"tier": np.arange(5, dtype=np.int64),
                         "revenue_cents": rev, "n_items": n.astype(np.int64)})

    parts = li.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("tier", as_index=False).sum()
    out = out[out["n_items"] > 0].astype(
        {"tier": "int64", "revenue_cents": "int64", "n_items": "int64"})
    return out.sort_values("tier").reset_index(drop=True)


QUERIES["scd2_revenue_by_tier"] = scd2_revenue_by_tier
ORACLES["scd2_revenue_by_tier"] = """
    WITH breaks AS (
      SELECT s_suppkey,
             TIMESTAMP '1992-01-01'
               + INTERVAL ((s_suppkey * 97) % 500) DAY AS b1,
             TIMESTAMP '1992-01-01'
               + INTERVAL ((s_suppkey * 97) % 500 + 200
                           + (s_suppkey * 53) % 400) DAY AS b2
      FROM supplier
    ), dim AS (
      SELECT s_suppkey, 0 AS ver,
             TIMESTAMP '1970-01-01' AS valid_from, b1 AS valid_to
      FROM breaks
      UNION ALL
      SELECT s_suppkey, 1, b1, b2 FROM breaks
      UNION ALL
      SELECT s_suppkey, 2, b2, TIMESTAMP '2100-01-01' FROM breaks
    )
    SELECT CAST((d.s_suppkey + 7 * d.ver) % 5 AS BIGINT) AS tier,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN dim d
      ON l.l_suppkey = d.s_suppkey
     AND l.l_shipdate >= d.valid_from AND l.l_shipdate < d.valid_to
    GROUP BY 1 ORDER BY tier
"""


def wordpiece_two_merges(sf_dir: str) -> pd.DataFrame:
    """DISTRIBUTED WORDPIECE TOKENIZER TRAINING, two merge rounds
    (Schuster & Nakajima ICASSP'12; the BERT tokenizer) — same
    iterative corpus-transform as bpe_two_merges but the winner
    maximizes the LIKELIHOOD GAIN count(ab)/(count(a)·count(b)), so
    each round also folds the 256-long unigram count vector alongside
    the 65536-long bigram combiner (still zero shuffles). The argmax is
    exact on both engines: Python-int cross-multiplication here, a
    HUGEINT cross-product anti-join in the oracle — float ratio
    ordering never decides. Rewrite semantics identical to the BPE twin
    (Arrow replace_substring ≡ SQL replace, greedy non-overlapping)."""
    import ray.data

    def counts_of(ds):
        def counts(t: pa.Table) -> pa.Table:
            texts = t.column("text").to_pylist()
            s = np.frombuffer("\x00".join(x or "" for x in texts)
                              .encode("utf-8"), dtype=np.uint8)
            uni = np.bincount(s, minlength=256).astype(np.int64)
            uni[0] = 0
            if len(s) < 2:
                bg = np.zeros(65536, dtype=np.int64)
            else:
                a, b = s[:-1].astype(np.int64), s[1:].astype(np.int64)
                m = (a != 0) & (b != 0)
                bg = np.bincount(a[m] * 256 + b[m],
                                 minlength=65536).astype(np.int64)
            return pa.table({"bg": pa.array([bg.tolist()]),
                             "uni": pa.array([uni.tolist()])})

        tb = np.zeros(65536, dtype=np.int64)
        tu = np.zeros(256, dtype=np.int64)
        for blk in ds.map_batches(counts, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow", batch_size=None):
            for row in blk.column("bg").to_pylist():
                tb += np.asarray(row, dtype=np.int64)
            for row in blk.column("uni").to_pylist():
                tu += np.asarray(row, dtype=np.int64)
        return tb, tu

    def top_pair(tb, tu):
        nz = np.flatnonzero(tb > 1)
        la, lb = nz // 256, nz % 256
        n, ca, cb = tb[nz], tu[la], tu[lb]
        win = -1
        for i in range(len(nz)):  # exact rational argmax (≤65536 rows)
            if win < 0:
                win = i
                continue
            lhs = int(n[i]) * int(ca[win]) * int(cb[win])
            rhs = int(n[win]) * int(ca[i]) * int(cb[i])
            if lhs > rhs or (lhs == rhs
                             and (int(la[i]), int(lb[i]))
                             < (int(la[win]), int(lb[win]))):
                win = i
        return (chr(int(la[win])) + chr(int(lb[win])), int(n[win]),
                int(ca[win]), int(cb[win]))

    ds = _read(sf_dir, "documents", columns=["text"])
    merges = []
    for rnd, sym in ((1, "\x01"), (2, "\x02")):
        tb, tu = counts_of(ds)
        pair, n, ca, cb = top_pair(tb, tu)
        merges.append({"round": np.int64(rnd), "pair": pair,
                       "n": np.int64(n), "n_left": np.int64(ca),
                       "n_right": np.int64(cb)})

        def rewrite(t: pa.Table, _p=pair, _s=sym) -> pa.Table:
            return pa.table({"text": pc.replace_substring(
                pc.fill_null(t.column("text"), ""), pattern=_p,
                replacement=_s)})

        ds = ds.map_batches(rewrite, batch_format="pyarrow")
    return pd.DataFrame(merges).astype(
        {"round": "int64", "n": "int64", "n_left": "int64",
         "n_right": "int64"})


QUERIES["wordpiece_two_merges"] = wordpiece_two_merges
ORACLES["wordpiece_two_merges"] = """
    WITH b1 AS (
      SELECT substring(text, i, 2) AS bg
      FROM (SELECT text, unnest(generate_series(1, length(text) - 1)) AS i
            FROM documents)),
    c1 AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS n FROM b1
           GROUP BY bg HAVING COUNT(*) > 1),
    u1 AS (
      SELECT substring(text, i, 1) AS ch, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT text, unnest(generate_series(1, length(text))) AS i
            FROM documents) GROUP BY ch),
    s1 AS (SELECT c1.bg, c1.n, a.n AS na, b.n AS nb FROM c1
           JOIN u1 a ON a.ch = substring(c1.bg, 1, 1)
           JOIN u1 b ON b.ch = substring(c1.bg, 2, 1)),
    w1 AS (SELECT * FROM s1 s WHERE NOT EXISTS (
             SELECT 1 FROM s1 q
             WHERE CAST(q.n AS HUGEINT) * s.na * s.nb
                   > CAST(s.n AS HUGEINT) * q.na * q.nb
                OR (CAST(q.n AS HUGEINT) * s.na * s.nb
                    = CAST(s.n AS HUGEINT) * q.na * q.nb
                    AND q.bg < s.bg))),
    d2 AS (SELECT replace(text, (SELECT bg FROM w1), chr(1)) AS text
           FROM documents),
    b2 AS (
      SELECT substring(text, i, 2) AS bg
      FROM (SELECT text, unnest(generate_series(1, length(text) - 1)) AS i
            FROM d2)),
    c2 AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS n FROM b2
           GROUP BY bg HAVING COUNT(*) > 1),
    u2 AS (
      SELECT substring(text, i, 1) AS ch, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT text, unnest(generate_series(1, length(text))) AS i
            FROM d2) GROUP BY ch),
    s2 AS (SELECT c2.bg, c2.n, a.n AS na, b.n AS nb FROM c2
           JOIN u2 a ON a.ch = substring(c2.bg, 1, 1)
           JOIN u2 b ON b.ch = substring(c2.bg, 2, 1)),
    w2 AS (SELECT * FROM s2 s WHERE NOT EXISTS (
             SELECT 1 FROM s2 q
             WHERE CAST(q.n AS HUGEINT) * s.na * s.nb
                   > CAST(s.n AS HUGEINT) * q.na * q.nb
                OR (CAST(q.n AS HUGEINT) * s.na * s.nb
                    = CAST(s.n AS HUGEINT) * q.na * q.nb
                    AND q.bg < s.bg)))
    SELECT CAST(1 AS BIGINT) AS round, bg AS pair, n,
           na AS n_left, nb AS n_right FROM w1
    UNION ALL
    SELECT CAST(2 AS BIGINT), bg, n, na, nb FROM w2
    ORDER BY round
"""


def wordpiece_train_merges(sf_dir: str, n_merges: int = 12) -> pd.DataFrame:
    """GENERALIZED WordPiece training: N likelihood-scored merge rounds
    over the int32 symbol corpus (stages/bpe.py score="wordpiece" —
    incremental pair-count deltas plus merge-site-count singles
    maintenance). The 2-round byte-string twin (wordpiece_two_merges)
    is oracle-checked; this entry is rows-only with incremental ≡
    full-recount equality pytest-locked."""
    from ..stages.bpe import bpe_train

    ds = _read(sf_dir, "documents", columns=["text"])
    return bpe_train(ds, n_merges=n_merges, score="wordpiece")


QUERIES["wordpiece_train_merges"] = wordpiece_train_merges


def cuckoo_churn_membership(sf_dir: str) -> pd.DataFrame:
    """DELETABLE membership (Cuckoo filter, Fan CoNEXT'14 — 14th sketch
    family): build the filter over users who VIEWED, then DELETE the
    converted users (view∩purchase — the deletion contract requires
    delete ⊆ inserted), then probe users who ERRORED: 'which erroring
    users are unconverted viewers' — the churn-watchlist shape a Bloom
    filter cannot answer because it cannot unlearn conversions.

    Distributed shape: ONE user-hash exchange dedups (user, kind) to
    per-user kind masks; each bucket emits a PARTIAL cuckoo filter over
    its viewers (every user lives in exactly one bucket, so the merged
    multiset holds each viewer once) plus its distinct delete/probe
    users. Driver traffic is bounded by DISTINCT users, not events;
    the partial filters merge associatively (stored-bucket reinsert).
    Lookup results are insert-order-independent (pytest-locked), so the
    result is deterministic at any parallelism. Rows-only (membership
    is approximate by design); the exact twin rides along for the gate:
    n_members ≥ n_exact with no false negatives guaranteed, bound
    pytest-locked."""
    from ..sketches import CuckooFilter
    from ..stages.dedup import _splitmix64

    CAP = 1 << 14  # ≥10× the sf0.1 viewer count; size via HLL at scale
    KINDS = ["view", "purchase", "error"]
    NB = 64

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def pairs(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column("event_type"),
                          value_set=pa.array(KINDS))
        m = idx.is_valid().to_numpy(zero_copy_only=False)
        u = t.column("user_id").to_numpy(zero_copy_only=False)[m]
        k = idx.to_numpy(zero_copy_only=False)[m].astype(np.int64)
        bit = np.int64(1) << k
        # per-batch OR-fold to distinct (user, mask)
        order = np.lexsort((bit, u))
        us, bs = u[order], bit[order]
        starts = np.flatnonzero(np.r_[True, us[1:] != us[:-1]])
        mask = np.bitwise_or.reduceat(bs, starts) if len(us) \
            else np.empty(0, np.int64)
        uu = us[starts] if len(us) else us
        b = (_splitmix64(uu.astype(np.uint64)) % np.uint64(NB)).astype(np.int64)
        return pa.table({"u": uu, "m": mask, "__b": b})

    def bucket_state(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy()
        m = g["m"].to_numpy()
        order = np.lexsort((m, u))
        us, ms = u[order], m[order]
        starts = np.flatnonzero(np.r_[True, us[1:] != us[:-1]])
        mask = np.bitwise_or.reduceat(ms, starts)
        uu = us[starts]
        viewers = uu[(mask & 1) != 0]
        dels = uu[(mask & 3) == 3]          # view AND purchase
        probes = uu[(mask & 4) != 0]        # error users
        cf = CuckooFilter(capacity=CAP)
        if len(viewers):
            cf.add_batch(pa.array(viewers))
        return pd.DataFrame({
            "state": [cf.to_bytes()],
            "dels": [dels.astype(np.int64).tobytes()],
            "probes": [probes.astype(np.int64).tobytes()],
        })

    parts = ds.map_batches(pairs, batch_format="pyarrow") \
        .groupby("__b").map_groups(bucket_state, batch_format="pandas") \
        .to_pandas()

    cf = CuckooFilter(capacity=CAP)
    dels, probes = [], []
    for r in parts.itertuples():
        cf.merge(CuckooFilter.from_bytes(r.state))
        dels.append(np.frombuffer(r.dels, dtype=np.int64))
        probes.append(np.frombuffer(r.probes, dtype=np.int64))
    dels = np.sort(np.concatenate(dels)) if dels else np.empty(0, np.int64)
    probes = np.sort(np.concatenate(probes)) if probes \
        else np.empty(0, np.int64)
    n_viewers = cf.items_stored()
    if len(dels):
        cf.delete_batch(pa.array(dels))
    member = cf.contains_batch(pa.array(probes)) if len(probes) \
        else np.zeros(0, bool)
    return _one_row(
        n_viewers=int(n_viewers), n_deleted=int(len(dels)),
        n_probes=int(len(probes)), n_members=int(member.sum()))


QUERIES["cuckoo_churn_membership"] = cuckoo_churn_membership


def time_travel_orders(sf_dir: str) -> pd.DataFrame:
    """TIME-TRAVEL read over a commit-log versioned table
    (stages/timetravel.py — the Delta/Iceberg snapshot pattern):
    version 0 is the orders table range-partitioned into 8 key ranges;
    version 1 is a COPY-ON-WRITE re-price (+5%, exact integer cents
    cents+cents//20) of only the first quarter of the key space — so
    the commit rewrites exactly the 2 partitions it touches and the
    other 6 data files are REUSED byte-identical by both snapshots.
    The query then aggregates `AS OF 0` and `AS OF 1` and emits one row
    per version; the oracle recomputes both snapshots from the base
    table with the same integer arithmetic ((k*8)//(max+1) < 2 selects
    the rewritten range; DuckDB `//` floors like numpy on nonneg)."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ..stages.timetravel import (commit, latest_version, read_as_of,
                                     write_partitioned_files)

    maxk1 = int(pc.max(pq.read_table(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey"]).column("o_orderkey")).as_py()) + 1

    tag = sf_of(sf_dir)
    root = os.path.join(tempfile.gettempdir(), "raysketch_data",
                        f"ttorders_{tag}")
    if latest_version(root) < 1:
        if os.path.exists(root):
            shutil.rmtree(root)
        os.makedirs(root, exist_ok=True)
        orders = _read(sf_dir, "orders",
                       columns=["o_orderkey", "o_totalprice"])

        def tag_part(t: pa.Table) -> pa.Table:
            k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
            return t.append_column(
                "__p", pa.array((k * 8) // maxk1))

        f0 = write_partitioned_files(
            orders.map_batches(tag_part, batch_format="pyarrow"),
            os.path.join(root, "v0"), "__p")
        commit(root, add=f0)
        def _pval(f: str) -> int:
            part = [c for c in f.split(os.sep) if c.startswith("__p=")]
            return int(part[0][4:])

        touched = [f for f in f0 if _pval(f) < 2]
        import ray.data

        def reprice(t: pa.Table) -> pa.Table:
            k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
            cents = _cents(t.column("o_totalprice")).to_numpy()
            cents = cents + cents // 20
            return pa.table({
                "o_orderkey": k,
                "o_totalprice": cents / 100.0,
                "__p": (k * 8) // maxk1,
            })

        f1 = write_partitioned_files(
            ray.data.read_parquet(touched)
            .map_batches(reprice, batch_format="pyarrow"),
            os.path.join(root, "v1"), "__p")
        commit(root, add=f1, remove=touched)

    rows = []
    for v in (0, 1):
        ds = read_as_of(root, v, columns=["o_totalprice"])

        def partial(t: pa.Table) -> pa.Table:
            c = _cents(t.column("o_totalprice")).to_numpy()
            return pa.table({"n": pa.array([len(c)], type=pa.int64()),
                             "s": pa.array([int(c.sum())],
                                           type=pa.int64())})

        p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        rows.append({"version": np.int64(v),
                     "n_orders": np.int64(p["n"].sum()),
                     "sum_cents": np.int64(p["s"].sum())})
    return pd.DataFrame(rows).astype(
        {"version": "int64", "n_orders": "int64", "sum_cents": "int64"})


QUERIES["time_travel_orders"] = time_travel_orders
ORACLES["time_travel_orders"] = """
    WITH mx AS (SELECT MAX(o_orderkey) + 1 AS m FROM orders),
    c AS (SELECT o_orderkey,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
          FROM orders)
    SELECT CAST(0 AS BIGINT) AS version,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(v) AS BIGINT) AS sum_cents
    FROM c
    UNION ALL
    SELECT CAST(1 AS BIGINT), CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN (o_orderkey * 8) // (SELECT m FROM mx) < 2
                         THEN v + v // 20 ELSE v END) AS BIGINT)
    FROM c
    ORDER BY version
"""


def vocab_damerau_pairs(sf_dir: str, max_dist: int = 2,
                        num_buckets: int = 64,
                        block: int = 512) -> pd.DataFrame:
    """Fuzzy matching with TRANSPOSITIONS — vocabulary word pairs
    within unrestricted Damerau–Levenshtein distance 2 (the metric that
    counts 'form'↔'from' as ONE edit, completing the string-similarity
    family next to plain Levenshtein): same distributed tile-pair
    decomposition as vocab_edit_distance_pairs (vocab dedups through a
    word-hash exchange, the padded byte matrix broadcasts once, tiles
    fan out over map_batches), but each tile evaluates the da/db-table
    DL DP (:func:`_dl_pairs`) behind two provable pre-filters (length
    gap, bag distance — transpositions preserve char multisets). The
    oracle is DuckDB's damerau_levenshtein, verified UNRESTRICTED
    ('CA'→'ABC' = 2; pytest-locked against the same case here)."""
    import ray
    import ray.data

    from ..stages.dedup import _splitmix64 as _mix64

    ds = _read(sf_dir, "documents", columns=["text"])

    def words(t: pa.Table) -> pa.Table:
        w = pc.unique(pc.list_flatten(pc.split_pattern(
            pc.fill_null(t.column("text"), ""), " ")))
        df = pd.DataFrame({"w": w.to_pandas()})
        h = pd.util.hash_pandas_object(df["w"], index=False).to_numpy()
        df["__b"] = (_mix64(h) % np.uint64(num_buckets)).astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g[["w"]].drop_duplicates()

    vocab = sorted(ds.map_batches(words, batch_format="pyarrow")
                   .groupby("__b").map_groups(dedup, batch_format="pandas")
                   .to_pandas()["w"])
    V = len(vocab)
    ml = max(len(w) for w in vocab)
    M = np.zeros((V, ml), dtype=np.uint8)
    L = np.zeros(V, dtype=np.int64)
    for i, w in enumerate(vocab):
        b = w.encode()
        M[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
        L[i] = len(b)
    ref = ray.put((M, L, np.array(vocab, dtype=object)))

    nb = (V + block - 1) // block
    tiles = [(bi, bj) for bi in range(nb) for bj in range(bi, nb)]
    tile_ds = ray.data.from_pandas(pd.DataFrame(
        {"bi": [t[0] for t in tiles], "bj": [t[1] for t in tiles]}))

    def work(t: pa.Table) -> pa.Table:
        Mb, Lb, wv = ray.get(ref)
        oa, ob, od = [], [], []
        for bi, bj in zip(t.column("bi").to_pylist(),
                          t.column("bj").to_pylist()):
            si, ei = bi * block, min((bi + 1) * block, V)
            sj, ej = bj * block, min((bj + 1) * block, V)
            if bi == bj:
                a, b = np.triu_indices(ei - si, k=1)
                ia, ib = a + si, b + si
            else:
                ia = np.repeat(np.arange(si, ei, dtype=np.int64), ej - sj)
                ib = np.tile(np.arange(sj, ej, dtype=np.int64), ei - si)
            ia, ib, d = _dl_pairs(Mb, Lb, ia, ib, max_dist)
            oa.append(wv[ia])
            ob.append(wv[ib])
            od.append(d)
        if not oa:
            return pa.table({"word_a": pa.array([], type=pa.string()),
                             "word_b": pa.array([], type=pa.string()),
                             "dist": pa.array([], type=pa.int64())})
        return pa.table({
            "word_a": pa.array(np.concatenate(oa), type=pa.string()),
            "word_b": pa.array(np.concatenate(ob), type=pa.string()),
            "dist": pa.array(np.concatenate(od).astype(np.int64)),
        })

    out = tile_ds.map_batches(work, batch_format="pyarrow",
                              batch_size=8).to_pandas()
    return out.sort_values(["word_a", "word_b"]).reset_index(drop=True) \
        .astype({"dist": "int64"})


QUERIES["vocab_damerau_pairs"] = vocab_damerau_pairs
ORACLES["vocab_damerau_pairs"] = """
    WITH v AS (SELECT DISTINCT unnest(string_split(text, ' ')) AS w
               FROM documents)
    SELECT a.w AS word_a, b.w AS word_b,
           CAST(damerau_levenshtein(a.w, b.w) AS BIGINT) AS dist
    FROM v a JOIN v b ON a.w < b.w
    WHERE damerau_levenshtein(a.w, b.w) <= 2
    ORDER BY word_a, word_b
"""


def winsorized_mean_price(sf_dir: str) -> pd.DataFrame:
    """WINSORIZED mean — the robust-statistics completion next to the
    trimmed mean and MAD: clip l_extendedprice at the exact p05/p95
    order statistics (reusing the sort-free two-pass percentile layout,
    ⌈q·n⌉−1 ≡ quantile_disc) and ship the clipped sum as exact integer
    cents plus the count, so the caller's division is the only float.
    One extra zero-shuffle pass over the same pruned column."""
    pcts = exact_percentile_price(sf_dir, qs=(0.05, 0.95))
    lo_c = int(pcts.loc[pcts["q"] == 0.05, "value_cents"].iloc[0])
    hi_c = int(pcts.loc[pcts["q"] == 0.95, "value_cents"].iloc[0])

    ds = _read(sf_dir, "lineitem", columns=["l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        v = _cents(t.column("l_extendedprice")).to_numpy()
        c = np.clip(v, lo_c, hi_c)
        return pa.table({"s": pa.array([int(c.sum())], type=pa.int64()),
                         "n": pa.array([len(c)], type=pa.int64())})

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return _one_row(p05_cents=np.int64(lo_c), p95_cents=np.int64(hi_c),
                    sum_clipped_cents=np.int64(p["s"].sum()),
                    n_rows=np.int64(p["n"].sum()))


QUERIES["winsorized_mean_price"] = winsorized_mean_price
ORACLES["winsorized_mean_price"] = """
    WITH c AS (SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v
               FROM lineitem),
    q AS (SELECT CAST(quantile_disc(v, 0.05) AS BIGINT) AS lo,
                 CAST(quantile_disc(v, 0.95) AS BIGINT) AS hi FROM c)
    SELECT q.lo AS p05_cents, q.hi AS p95_cents,
           CAST(SUM(LEAST(GREATEST(c.v, q.lo), q.hi)) AS BIGINT)
             AS sum_clipped_cents,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM c, q GROUP BY q.lo, q.hi
"""


def rolling7_median_daily_revenue(sf_dir: str) -> pd.DataFrame:
    """Rolling 7-DAY median of daily revenue — the robust trend line
    (medians shrug off the spike days that wreck rolling means), and
    the window-family member SQL engines struggle to push down
    (MEDIAN OVER RANGE re-sorts every frame). Calendar-correct RANGE
    frame (6 preceding DAYS, not rows — gap days matter). Distributed
    shape: per-batch combiner reduces to ≤n_days (day, cents) partials
    — the fact table never shuffles; the bounded day table windows on
    the driver. Medians are emitted ×2 (two-middle averages are
    half-integers; ×2 keeps both engines in exact integers)."""
    ds = _read(sf_dir, "lineitem", columns=["l_shipdate", "l_extendedprice"])
    DAY_US = 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        d = t.column("l_shipdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").view(np.int64) // DAY_US
        c = _cents(t.column("l_extendedprice")).to_numpy()
        df = pd.DataFrame({"day": d, "c": c})
        agg = df.groupby("day", as_index=False)["c"].sum()
        return pa.Table.from_pandas(agg, preserve_index=False)

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    daily = p.groupby("day", as_index=False)["c"].sum() \
        .sort_values("day").reset_index(drop=True)
    days = daily["day"].to_numpy(dtype=np.int64)
    rev = daily["c"].to_numpy(dtype=np.int64)
    lo = np.searchsorted(days, days - 6, side="left")
    med2 = np.empty(len(days), dtype=np.int64)
    for i in range(len(days)):  # bounded by DISTINCT days, not rows
        w = np.sort(rev[lo[i]:i + 1])
        m = len(w)
        med2[i] = int(w[m // 2]) * 2 if m % 2 else \
            int(w[m // 2 - 1]) + int(w[m // 2])
    return pd.DataFrame({"day": days, "revenue_cents": rev,
                         "median7_x2": med2}).astype(
        {"day": "int64", "revenue_cents": "int64", "median7_x2": "int64"})


QUERIES["rolling7_median_daily_revenue"] = rolling7_median_daily_revenue
ORACLES["rolling7_median_daily_revenue"] = """
    WITH d AS (
      SELECT CAST(epoch_us(l_shipdate) // 86400000000 AS BIGINT) AS day,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS revenue_cents
      FROM lineitem GROUP BY 1
    )
    SELECT day, revenue_cents,
           CAST(2 * MEDIAN(revenue_cents) OVER (
                 ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS median7_x2
    FROM d ORDER BY day
"""


def cdc_merge_tombstones(sf_dir: str, num_buckets: int = 64
                         ) -> pd.DataFrame:
    """MERGE with DELETE tombstones — the full CDC triad (INSERT /
    UPDATE / DELETE) that upsert_orders_latest's latest-wins started:
    a deterministic version-1 change stream re-prices keys ≡3 (mod 10)
    by +7% (exact integer cents c + 7c//100) and tombstones keys ≡6
    (mod 20); the merged snapshot is latest-wins per key with
    tombstoned keys REMOVED — the row-level delete Bloom/bitmaps can't
    express and the reason lakehouse MERGE exists. Same single
    key-exchange shape: per-batch argmax-by-version combiner, per-
    bucket latest pick, tombstone filter, ≤|status| aggregate partials
    out. The oracle states the same merge via ROW_NUMBER over the
    unioned snapshots plus an op≠'D' filter."""
    from ..stages.dedup import _splitmix64 as _mix64

    base = _read(sf_dir, "orders",
                 columns=["o_orderkey", "o_orderstatus", "o_totalprice"])

    def both_versions(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        s = t.column("o_orderstatus").to_numpy(zero_copy_only=False)
        c = _cents(t.column("o_totalprice")).to_numpy(zero_copy_only=False)
        upd = k % 10 == 3
        dele = k % 20 == 6
        kk = np.concatenate([k, k[upd], k[dele]])
        ss = np.concatenate([s, s[upd], s[dele]])
        cc = np.concatenate([c, c[upd] + 7 * c[upd] // 100,
                             np.zeros(int(dele.sum()), dtype=np.int64)])
        vv = np.concatenate([np.zeros(len(k), dtype=np.int64),
                             np.ones(int(upd.sum()) + int(dele.sum()),
                                     dtype=np.int64)])
        dd = np.concatenate([np.zeros(len(k) + int(upd.sum()), dtype=bool),
                             np.ones(int(dele.sum()), dtype=bool)])
        order = np.lexsort((-vv, kk))
        kk, ss, cc, vv, dd = (x[order] for x in (kk, ss, cc, vv, dd))
        keep = np.r_[True, kk[1:] != kk[:-1]]
        kk, ss, cc, vv, dd = (x[keep] for x in (kk, ss, cc, vv, dd))
        return pa.table({
            "k": pa.array(kk), "s": pa.array(ss), "c": pa.array(cc),
            "v": pa.array(vv), "d": pa.array(dd),
            "__b": pa.array((_mix64(kk.astype(np.uint64))
                             % np.uint64(num_buckets)).astype(np.int64)),
        })

    def merged(g: pd.DataFrame) -> pd.DataFrame:
        k = g["k"].to_numpy(dtype=np.int64)
        v = g["v"].to_numpy(dtype=np.int64)
        order = np.lexsort((-v, k))
        keep = np.r_[True, k[order][1:] != k[order][:-1]]
        pick = g.iloc[order[keep]]
        live = pick[~pick["d"].to_numpy(dtype=bool)]
        out = live.groupby("s", as_index=False).agg(
            n=("c", "size"), sum_cents=("c", "sum"))
        return out.astype({"n": "int64", "sum_cents": "int64"})

    parts = base.map_batches(both_versions, batch_format="pyarrow") \
        .groupby("__b").map_groups(merged, batch_format="pandas") \
        .to_pandas()
    agg = parts.groupby("s", as_index=False)[["n", "sum_cents"]].sum()
    return agg.rename(columns={"s": "o_orderstatus"}) \
        .sort_values("o_orderstatus").reset_index(drop=True) \
        .astype({"n": "int64", "sum_cents": "int64"})


QUERIES["cdc_merge_tombstones"] = cdc_merge_tombstones
ORACLES["cdc_merge_tombstones"] = """
    WITH b AS (SELECT o_orderkey AS k, o_orderstatus AS s,
                      CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
               FROM orders),
    snap AS (
      SELECT k, s, c, 0 AS v, 'I' AS op FROM b
      UNION ALL
      SELECT k, s, c + 7 * c // 100, 1, 'U' FROM b WHERE k % 10 = 3
      UNION ALL
      SELECT k, s, 0, 1, 'D' FROM b WHERE k % 20 = 6),
    latest AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY k
                                            ORDER BY v DESC) AS rn
               FROM snap)
    SELECT s AS o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(c) AS BIGINT) AS sum_cents
    FROM latest WHERE rn = 1 AND op <> 'D'
    GROUP BY s ORDER BY o_orderstatus
"""


def ivm_revenue_by_flag(sf_dir: str) -> pd.DataFrame:
    """INCREMENTAL VIEW MAINTENANCE: the materialized aggregate
    (revenue + rowcount by l_returnflag) is kept current by folding a
    CDC delta's OWN aggregate into the stored state — deletes
    contribute (−cents, −1), inserts (+cents, +1) — without re-reading
    the unchanged base rows, the O(|delta|) update that makes
    materialized views cheap to keep fresh (additive groups: SUM/COUNT
    are self-maintainable; MIN/MAX are not — documented limit). The
    deterministic delta deletes keys ≡5 (mod 13) and inserts a +50¢
    twin of keys ≡3 (mod 17). Both the base state and the delta
    aggregate are per-batch combiners (≤|flags| partial rows each);
    equality vs full recompute is pytest-locked; the oracle recomputes
    from the modified base."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_returnflag", "l_extendedprice"])

    def base_state(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "f": t.column("l_returnflag").to_pandas(),
            "c": _cents(t.column("l_extendedprice")).to_numpy(),
        })
        return df.groupby("f", as_index=False).agg(
            n=("c", "size"), s=("c", "sum"))

    def delta_agg(t: pa.Table) -> pd.DataFrame:
        k = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        f = t.column("l_returnflag").to_numpy(zero_copy_only=False)
        c = _cents(t.column("l_extendedprice")).to_numpy()
        dele = k % 13 == 5
        ins = k % 17 == 3
        df = pd.DataFrame({
            "f": np.concatenate([f[dele], f[ins]]),
            "n": np.concatenate([-np.ones(int(dele.sum()), np.int64),
                                 np.ones(int(ins.sum()), np.int64)]),
            "s": np.concatenate([-c[dele], c[ins] + 50]),
        })
        return df.groupby("f", as_index=False)[["n", "s"]].sum()

    base = ds.map_batches(base_state, batch_format="pyarrow").to_pandas() \
        .groupby("f", as_index=False)[["n", "s"]].sum()
    delta = ds.map_batches(delta_agg, batch_format="pyarrow").to_pandas() \
        .groupby("f", as_index=False)[["n", "s"]].sum()
    out = base.merge(delta, on="f", how="outer", suffixes=("", "_d")) \
        .fillna(0)
    out["n"] = (out["n"] + out["n_d"]).astype(np.int64)
    out["s"] = (out["s"] + out["s_d"]).astype(np.int64)
    out = out[out["n"] > 0][["f", "n", "s"]]
    return out.rename(columns={"f": "l_returnflag",
                               "s": "revenue_cents"}) \
        .sort_values("l_returnflag").reset_index(drop=True) \
        .astype({"n": "int64", "revenue_cents": "int64"})


QUERIES["ivm_revenue_by_flag"] = ivm_revenue_by_flag
ORACLES["ivm_revenue_by_flag"] = """
    WITH mod AS (
      SELECT l_returnflag AS f,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c
      FROM lineitem WHERE l_orderkey % 13 <> 5
      UNION ALL
      SELECT l_returnflag,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) + 50
      FROM lineitem WHERE l_orderkey % 17 = 3)
    SELECT f AS l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(c) AS BIGINT) AS revenue_cents
    FROM mod GROUP BY f ORDER BY l_returnflag
"""


def image_resize_stats(sf_dir: str) -> pd.DataFrame:
    """REAL image decode → EXACT bilinear resize → stats: the resize
    every vision-model ingest performs, done in integer fixed point
    (stages/multimodal.ImageBilinearResize — exact rational source
    coordinates, weights summing to 2⁴⁰, half-up rounding) so the
    tensor batch is bit-identical on every platform and run; per-image
    output is the exact integer channel sum of the 24×24 resample.
    Same cached real-PNG table and actor-pool decode as
    image_features_stats; rows-only with identity/constant/float-ref
    invariants pytest-locked."""
    import glob as _glob
    import tempfile

    import ray.data

    from ..stages.multimodal import (
        ImageBilinearResize,
        ImageDecode,
        make_real_png_table,
    )

    n = max(32, int(4096 * sf_of(sf_dir)))
    cache = os.path.join(tempfile.gettempdir(), "raysketch_data",
                         f"pngs_n{n}_s7")
    if not _glob.glob(os.path.join(cache, "*.parquet")):
        import pyarrow.parquet as pq

        os.makedirs(cache, exist_ok=True)
        tmp = os.path.join(cache, "_part0.tmp")
        pq.write_table(make_real_png_table(n, seed=7), tmp,
                       row_group_size=max(32, n // 8))
        os.replace(tmp, os.path.join(cache, "part0.parquet"))
    ds = ray.data.read_parquet(cache)

    def sums(batch: dict) -> pd.DataFrame:
        imgs = batch["image"].astype(np.int64)  # (n, 24, 24, 3)
        s = imgs.sum(axis=(1, 2))
        return pd.DataFrame({
            "item_id": np.asarray(batch["item_id"], dtype=np.int64),
            "sum_r": s[:, 0], "sum_g": s[:, 1], "sum_b": s[:, 2],
        })

    out = (
        ds.map_batches(ImageDecode,
                       fn_constructor_kwargs={"deterministic_fake": False},
                       batch_format="pyarrow", batch_size=64,
                       concurrency=auto_concurrency())
        .map_batches(ImageBilinearResize((24, 24)), batch_size=64)
        .map_batches(sums, batch_size=64)
        .to_pandas()
    )
    return out.sort_values("item_id").reset_index(drop=True).astype(
        {"item_id": "int64", "sum_r": "int64", "sum_g": "int64",
         "sum_b": "int64"})


QUERIES["image_resize_stats"] = image_resize_stats


def bitmap_served_counts(sf_dir: str) -> pd.DataFrame:
    """BITMAP INDEX (O'Neil SIGMOD'97 — stages/bitmapindex.py): one
    bitset per distinct value of each low-cardinality column over the
    dense event_id space, built in ONE zero-shuffle pass (per-batch
    sparse word-OR partials, driver OR-scatter — the index is
    n_rows/64 words per value, small by design) and persisted as a
    parquet state table. The query then SERVES the full
    (event_type × day-of-week) count grid from the INDEX ALONE —
    word-wise AND + popcount per cell, never rescanning the fact table
    — the OLAP-cube acceleration bitmap engines (Druid, Pinot, Kylin)
    are built on. OR is idempotent/commutative, so the build is
    bit-identical at any batch layout or retry."""
    import tempfile

    import pyarrow.parquet as pq

    from ..stages.bitmapindex import (build_bitmap_index, load_bitmaps,
                                      popcount)

    TYPES = ["click", "error", "purchase", "signup", "view"]
    DAY = np.int64(86_400_000_000)
    src = os.path.join(sf_dir, "events.parquet")
    n_rows = pq.ParquetFile(src).metadata.num_rows

    def type_codes(t: pa.Table) -> np.ndarray:
        return pc.index_in(t.column("event_type"),
                           value_set=pa.array(TYPES)) \
            .to_numpy(zero_copy_only=False).astype(np.int64)

    def dow_codes(t: pa.Table) -> np.ndarray:
        us = t.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").view(np.int64)
        return ((us // DAY + 4) % 7).astype(np.int64)  # Sunday=0

    ds = _read(sf_dir, "events", columns=["event_id", "event_type", "ts"])
    idx_path = os.path.join(tempfile.gettempdir(), "raysketch_data",
                            f"bitmapidx_{sf_of(sf_dir)}", "index.parquet")
    build_bitmap_index(
        ds, "event_id",
        {"event_type": (TYPES, type_codes),
         "dow": (list(range(7)), dow_codes)},
        n_rows, idx_path)

    bm = load_bitmaps(idx_path)  # serve path: index reads ONLY
    rows = []
    for ty in TYPES:
        for d in range(7):
            n = popcount(bm[("event_type", ty)] & bm[("dow", str(d))])
            if n:
                rows.append({"event_type": ty, "dow": np.int64(d),
                             "n": np.int64(n)})
    return pd.DataFrame(rows).astype({"dow": "int64", "n": "int64"}) \
        .sort_values(["event_type", "dow"]).reset_index(drop=True)


QUERIES["bitmap_served_counts"] = bitmap_served_counts
ORACLES["bitmap_served_counts"] = """
    SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type, dayofweek(ts)
    ORDER BY event_type, dow
"""


def phrase_search_docs(sf_dir: str) -> pd.DataFrame:
    """EXACT PHRASE search served from a POSITIONAL inverted index
    (stages/invindex.py v3 — postings carry occurrence positions, the
    structure tf postings cannot answer adjacency from): per-document
    count of the phrase "table hash" as the intersection of shifted
    position sets, reading ONLY the two terms' shards. The oracle
    restates adjacency with DuckDB list indexing over the same
    whitespace tokenization (our 0-based pos p ≡ ts[p+1]), proving the
    index round-trip end to end — positions survive the exchange, the
    pack, the parquet write and the pruned read bit-exactly."""
    import tempfile

    import ray.data

    from ..stages.invindex import build_positional_index, phrase_search

    idx = os.path.join(tempfile.gettempdir(), "raysketch_data",
                       f"posidx_{sf_of(sf_dir)}")
    meta_path = os.path.join(idx, "meta.json")
    ok = False
    if os.path.exists(meta_path):
        import json as _json

        with open(meta_path) as f:
            ok = _json.load(f).get("version") == 3
    if not ok:
        ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
        build_positional_index(ds, idx)
    out = phrase_search(idx, ["table", "hash"])
    return out.astype({"doc_id": "int64", "n_occ": "int64"})


QUERIES["phrase_search_docs"] = phrase_search_docs
ORACLES["phrase_search_docs"] = """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
                  FROM documents),
    p AS (SELECT doc_id, unnest(generate_series(1, len(ts) - 1)) AS i,
                 ts
          FROM toks)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_occ
    FROM p WHERE ts[i] = 'table' AND ts[i + 1] = 'hash'
    GROUP BY doc_id ORDER BY doc_id
"""


def session_error_overlaps(sf_dir: str, gap_min: int = 30,
                           win_s: int = 300) -> pd.DataFrame:
    """KEYLESS interval-overlap join (stages/joins.py
    interval_overlap_count): for every user session (30-min-gap
    sessionization), how many system-wide ERROR windows (error ts
    ±5 min, ANY user) overlapped it — the "which incidents touched my
    session" temporal join that key-hash exchanges cannot route. Time
    axis range-partitioned with span replication; every overlapping
    pair counted exactly once via the overlap-START ownership rule
    (the bucket containing max(session_start, window_lo), which both
    intervals provably touch); zero-overlap sessions kept (LEFT
    semantics). The oracle pays the real inequality join."""
    from ..stages.dedup import _splitmix64 as _mix64
    from ..stages.joins import interval_overlap_count

    GAP = np.int64(gap_min) * np.int64(60_000_000)
    W = np.int64(win_s) * np.int64(1_000_000)

    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def tag_user(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        us = t.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").view(np.int64)
        b = (_mix64(u.astype(np.uint64)) % np.uint64(64)).astype(np.int64)
        return pa.table({"u": u, "t": us, "__b": b})

    def sessions_bucket(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(dtype=np.int64)
        t = g["t"].to_numpy(dtype=np.int64)
        order = np.lexsort((t, u))
        u, t = u[order], t[order]
        new = np.r_[True, (u[1:] != u[:-1]) | (t[1:] - t[:-1] > GAP)]
        sid = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(t)] - 1 if len(t) else starts
        return pd.DataFrame({"user_id": u[starts],
                             "a": t[starts], "b": t[ends]})

    sessions = ev.map_batches(tag_user, batch_format="pyarrow") \
        .groupby("__b").map_groups(sessions_bucket, batch_format="pandas")

    windows = ev.map_batches(
        lambda t: pa.table({
            "lo": pa.array(
                t.filter(pc.equal(t.column("event_type"), "error"))
                .column("ts").to_numpy(zero_copy_only=False)
                .astype("datetime64[us]").view(np.int64) - W),
            "hi": pa.array(
                t.filter(pc.equal(t.column("event_type"), "error"))
                .column("ts").to_numpy(zero_copy_only=False)
                .astype("datetime64[us]").view(np.int64) + W),
        }), batch_format="pyarrow")

    out = interval_overlap_count(sessions, windows, left_cols=("a", "b"),
                                 id_cols=("user_id", "a"))
    return out.sort_values(["user_id", "a"]).reset_index(drop=True) \
        .astype({"user_id": "int64", "a": "int64", "n_overlaps": "int64"})


QUERIES["session_error_overlaps"] = session_error_overlaps
ORACLES["session_error_overlaps"] = """
    WITH s0 AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS st
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    s1 AS (SELECT user_id, ts,
                  SUM(st) OVER (PARTITION BY user_id ORDER BY ts) AS sid
           FROM s0),
    iv AS (SELECT user_id, CAST(epoch_us(MIN(ts)) AS BIGINT) AS a,
                  CAST(epoch_us(MAX(ts)) AS BIGINT) AS b
           FROM s1 GROUP BY user_id, sid),
    w AS (SELECT epoch_us(ts) - 300000000 AS lo,
                 epoch_us(ts) + 300000000 AS hi
          FROM events WHERE event_type = 'error')
    SELECT iv.user_id, iv.a AS a,
           CAST(COUNT(w.lo) AS BIGINT) AS n_overlaps
    FROM iv LEFT JOIN w ON w.lo <= iv.b AND w.hi >= iv.a
    GROUP BY iv.user_id, iv.a
    ORDER BY user_id, a
"""


def containment_ngram_pairs(sf_dir: str) -> pd.DataFrame:
    """ASYMMETRIC near-dup: exact word-3-gram CONTAINMENT self-join
    (stages/dedup.py containment_join) at max-containment ≥ 0.9, over
    the documents table plus PLANTED superstrings (every 97th doc gets
    a +1000000-id twin with an appended tail — the quote-inside-a-
    longer-host case: containment(orig→twin) = 1 while Jaccard
    n_a/n_b < 0.9, so the Jaccard join provably misses what this one
    must catch; pytest asserts both directions). One-sided prefix
    filtering (probe prefix × index FULL set — the Jaccard both-sides
    cut is unsound for containment); output is all-integer
    (inter, n_a, n_b), so the SQL twin value-hashes float-free."""
    from ..stages.dedup import containment_join

    TAIL = " zz qq ww ee rr tt yy uu"
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        m = did % 97 == 0
        ids2 = did[m] + 1_000_000
        txt2 = pc.binary_join_element_wise(
            pc.fill_null(t.column("text"), ""),
            pa.array([TAIL] * t.num_rows), "")
        return pa.table({
            "doc_id": pa.array(np.concatenate([did, ids2])),
            "text": pa.concat_arrays(
                [t.column("text").combine_chunks().cast(pa.string()),
                 txt2.combine_chunks().filter(pa.array(m))
                 .cast(pa.string())]),
        })

    planted = ds.map_batches(plant, batch_format="pyarrow")
    return containment_join(planted, k=3, t_num=9, t_den=10)


QUERIES["containment_ngram_pairs"] = containment_ngram_pairs
ORACLES["containment_ngram_pairs"] = """
    WITH docs2 AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text || ' zz qq ww ee rr tt yy uu'
      FROM documents WHERE doc_id % 97 = 0
    ),
    w AS (SELECT doc_id, string_split(text, ' ') AS words FROM docs2),
    pos AS (
      SELECT doc_id, words,
             unnest(range(1, greatest(len(words) - 1, 1))) AS p
      FROM w
    ),
    g AS (
      SELECT DISTINCT doc_id,
             list_extract(words, CAST(p AS INT)) || ' ' ||
             list_extract(words, CAST(p AS INT) + 1) || ' ' ||
             list_extract(words, CAST(p AS INT) + 2) AS gram
      FROM pos
    ),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
      FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, CAST(i AS BIGINT) AS inter,
           CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b
    FROM inter
    JOIN sz sa ON sa.doc_id = id_a
    JOIN sz sb ON sb.doc_id = id_b
    WHERE i * 10 >= 9 * sa.n OR i * 10 >= 9 * sb.n
    ORDER BY id_a, id_b
"""


def pattern_vcp_adjacent(sf_dir: str) -> pd.DataFrame:
    """SEQUENCE PATTERN MATCHING (the MATCH_RECOGNIZE shape SQL
    engines mostly lack): count, per user, occurrences of the exact
    ADJACENT event pattern view→click→purchase — three consecutive
    events in the user's time-ordered stream with nothing in between
    (funnel_conversion_events allows gaps; adjacency is the stricter
    regex-over-sequences semantics). One user-hash exchange, per-user
    lexsort, one vectorized triple-shift compare — the per-row LEAD
    window the oracle states with LEAD(type,1)/LEAD(type,2). Ties in
    ts are broken by event_id on both engines (the stream's stable
    order)."""
    from ..stages.dedup import _splitmix64 as _mix64

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])
    TYPES = ["view", "click", "purchase"]

    def prep(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        us = t.column("ts").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").view(np.int64)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        idx = pc.index_in(t.column("event_type"),
                          value_set=pa.array(TYPES))
        k = pc.fill_null(idx, -1).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        b = (_mix64(u.astype(np.uint64)) % np.uint64(64)).astype(np.int64)
        return pa.table({"u": u, "t": us, "e": eid, "k": k, "__b": b})

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy(dtype=np.int64)
        t = g["t"].to_numpy(dtype=np.int64)
        e = g["e"].to_numpy(dtype=np.int64)
        k = g["k"].to_numpy(dtype=np.int64)
        order = np.lexsort((e, t, u))
        u, k = u[order], k[order]
        if len(u) < 3:
            return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                                 "n_vcp": pd.Series([], dtype=np.int64)})
        same = (u[:-2] == u[1:-1]) & (u[1:-1] == u[2:])
        hit = same & (k[:-2] == 0) & (k[1:-1] == 1) & (k[2:] == 2)
        df = pd.DataFrame({"user_id": u[:-2][hit]})
        out = df.groupby("user_id", as_index=False).size() \
            .rename(columns={"size": "n_vcp"})
        return out.astype({"user_id": "int64", "n_vcp": "int64"})

    parts = ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("__b").map_groups(count_bucket, batch_format="pandas") \
        .to_pandas()
    if not len(parts):
        return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                             "n_vcp": pd.Series([], dtype="int64")})
    return parts.sort_values("user_id").reset_index(drop=True) \
        .astype({"user_id": "int64", "n_vcp": "int64"})


QUERIES["pattern_vcp_adjacent"] = pattern_vcp_adjacent
ORACLES["pattern_vcp_adjacent"] = """
    WITH s AS (
      SELECT user_id, event_type,
             LEAD(event_type, 1) OVER w AS t1,
             LEAD(event_type, 2) OVER w AS t2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_vcp
    FROM s
    WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
    GROUP BY user_id ORDER BY user_id
"""


def roc_auc_wordcount_en(sf_dir: str) -> pd.DataFrame:
    """EXACT ROC-AUC (Mann–Whitney U) — the model-evaluation operator
    every classifier pipeline needs, computed distributed WITHOUT a
    global sort: AUC over a bounded integer score (word count) scoring
    the label lang='en' reduces to per-(score, label) COUNTS — one
    zero-shuffle histogram combiner — then the driver's cumulative
    scan assigns each distinct score its mid-rank in EXACT integers
    (2·avg_rank = 2·cum_before + c + 1, so ties cost no floats).
    Output is the integer triple (2U, n_pos, n_neg) plus AUC in
    floored millionths — the SQL twin states the same mid-rank algebra
    via RANK() + COUNT() OVER (2r + c − 1) and HUGEINT arithmetic."""
    ds = _read(sf_dir, "documents", columns=["text", "lang"])

    def hist(t: pa.Table) -> pd.DataFrame:
        wc = pc.list_value_length(pc.split_pattern(
            pc.fill_null(t.column("text"), ""), " ")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        pos = pc.equal(t.column("lang"), "en") \
            .to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"s": wc, "p": pos.astype(np.int64)})
        g = df.groupby(["s", "p"], as_index=False).size()
        return g.rename(columns={"size": "c"})

    parts = ds.map_batches(hist, batch_format="pyarrow").to_pandas()
    g = parts.groupby(["s", "p"], as_index=False)["c"].sum() \
        .sort_values("s").reset_index(drop=True)
    scores = np.sort(g["s"].unique())
    tot = {int(s): 0 for s in scores}
    posc = {int(s): 0 for s in scores}
    for r in g.itertuples():
        tot[int(r.s)] += int(r.c)
        if r.p:
            posc[int(r.s)] += int(r.c)
    cum = 0
    sum2r = 0
    n_pos = n_all = 0
    for s in scores:
        c = tot[int(s)]
        sum2r += posc[int(s)] * (2 * cum + c + 1)
        cum += c
        n_pos += posc[int(s)]
        n_all += c
    n_neg = n_all - n_pos
    u2 = sum2r - n_pos * (n_pos + 1)
    auc_micro = (u2 * 500_000) // (n_pos * n_neg) if n_pos and n_neg else 0
    return _one_row(u2=np.int64(u2), n_pos=np.int64(n_pos),
                    n_neg=np.int64(n_neg),
                    auc_micro=np.int64(auc_micro))


QUERIES["roc_auc_wordcount_en"] = roc_auc_wordcount_en
ORACLES["roc_auc_wordcount_en"] = """
    WITH sc AS (
      SELECT len(string_split(text, ' ')) AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS p
      FROM documents
    ),
    r AS (
      SELECT p,
             RANK() OVER (ORDER BY s) AS rk,
             COUNT(*) OVER (PARTITION BY s) AS c
      FROM sc
    ),
    agg AS (
      SELECT CAST(SUM(2 * rk + c - 1) FILTER (p = 1) AS BIGINT) AS sum2r,
             CAST(COUNT(*) FILTER (p = 1) AS BIGINT) AS n_pos,
             CAST(COUNT(*) FILTER (p = 0) AS BIGINT) AS n_neg
      FROM r
    )
    SELECT sum2r - n_pos * (n_pos + 1) AS u2, n_pos, n_neg,
           CAST(((sum2r - n_pos * (n_pos + 1)) * 500000)
                // (n_pos * n_neg) AS BIGINT) AS auc_micro
    FROM agg
"""


def entity_resolution_components(sf_dir: str) -> pd.DataFrame:
    """ENSEMBLE entity resolution, fully oracle-checked: three EXACT
    evidence channels — byte-identical text, n-gram CONTAINMENT ≥ 0.9
    (the quote/superset channel), n-gram Jaccard ≥ 0.8 (the
    resemblance channel) — union into one edge set and resolve to
    connected components with distributed pointer-jumping min-label
    propagation. This is the multi-evidence dedup shape production
    curation uses (each channel catches what the others miss;
    pytest-locked below); because every channel here is exact (no LSH
    recall loss), the WHOLE composition down to the component labels
    is SQL-statable — the oracle unions the same three edge CTEs and
    unrolls min-label propagation to a fixpoint (8 rounds ≫ the
    near-clique diameters these channels produce; the value-hash
    would expose an unconverged round count). The natural corpus only
    exercises the Jaccard channel, so the query PLANTS the other two
    cases: an exact byte copy (+2000000 id) of every 89th doc and a
    superstring (+1000000 id, appended tail) of every 97th — each
    channel then contributes edges the others miss."""
    import ray.data

    from ..hashing import arrow_to_flat_bytes, murmur64a
    from ..stages.dedup import (_splitmix64, containment_join,
                                ngram_jaccard_join, propagate_components)

    TAIL = " zz qq ww ee rr tt yy uu"
    base = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        txt = pc.fill_null(t.column("text"), "")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        m_sup = did % 97 == 0
        m_ex = did % 89 == 0
        tails = pc.binary_join_element_wise(
            txt, pa.array([TAIL] * t.num_rows), "")
        if isinstance(tails, pa.ChunkedArray):
            tails = tails.combine_chunks()
        return pa.table({
            "doc_id": pa.array(np.concatenate(
                [did, did[m_sup] + 1_000_000, did[m_ex] + 2_000_000])),
            "text": pa.concat_arrays([
                txt.cast(pa.string()),
                tails.filter(pa.array(m_sup)).cast(pa.string()),
                txt.filter(pa.array(m_ex)).cast(pa.string()),
            ]),
        })

    docs = base.map_batches(plant, batch_format="pyarrow")

    # channel 1: exact text equality ((hash, len) groups — the
    # dedup_docs_exact collision discipline)
    def hrows(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t.column("text"), "")
        data, offsets = arrow_to_flat_bytes(txt)
        h = (murmur64a(data, offsets)
             & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
        ln = pc.utf8_length(txt).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        key = (_splitmix64(h.astype(np.uint64))
               + np.uint64(2) * _splitmix64(ln.astype(np.uint64))) \
            .astype(np.int64)
        return pa.table({
            "k": key,
            "doc_id": t.column("doc_id"),
            "__b": pa.array((key.astype(np.uint64) % np.uint64(64))
                            .astype(np.int64)),
        })

    def group_edges(g: pd.DataFrame) -> pd.DataFrame:
        k = g["k"].to_numpy(dtype=np.int64)
        d = g["doc_id"].to_numpy(dtype=np.int64)
        order = np.lexsort((d, k))
        k, d = k[order], d[order]
        starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
        reps = np.repeat(d[starts], np.diff(np.r_[starts, len(k)]))
        m = reps != d
        return pd.DataFrame({"id_a": reps[m], "id_b": d[m]})

    exact_edges = docs.map_batches(hrows, batch_format="pyarrow") \
        .groupby("__b").map_groups(group_edges, batch_format="pandas")

    cont = containment_join(docs, k=3, t_num=9, t_den=10)
    jacc = ngram_jaccard_join(docs, k=3, threshold=0.8, unit="word")
    extra = pd.concat([cont[["id_a", "id_b"]],
                       jacc[["id_a", "id_b"]]], ignore_index=True) \
        .astype("int64")
    edges = exact_edges.union(ray.data.from_pandas(extra)) \
        if len(extra) else exact_edges

    labels = propagate_components(edges).to_pandas()
    out = labels.rename(columns={"node": "doc_id",
                                 "label": "component"}) \
        .drop_duplicates().sort_values("doc_id").reset_index(drop=True)
    return out.astype({"doc_id": "int64", "component": "int64"})


QUERIES["entity_resolution_components"] = entity_resolution_components
ORACLES["entity_resolution_components"] = """
    WITH docs2 AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text || ' zz qq ww ee rr tt yy uu'
      FROM documents WHERE doc_id % 97 = 0
      UNION ALL
      SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 89 = 0
    ),
    w AS (SELECT doc_id, string_split(text, ' ') AS words
          FROM docs2),
    pos AS (SELECT doc_id, words,
                   unnest(range(1, greatest(len(words) - 1, 1))) AS p
            FROM w),
    g AS (SELECT DISTINCT doc_id,
                 list_extract(words, CAST(p AS INT)) || ' ' ||
                 list_extract(words, CAST(p AS INT) + 1) || ' ' ||
                 list_extract(words, CAST(p AS INT) + 2) AS gram
          FROM pos),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     COUNT(*) AS i
              FROM g a JOIN g b
                ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
    sim AS (SELECT id_a, id_b, i, sa.n AS na, sb.n AS nb
            FROM inter JOIN sz sa ON sa.doc_id = id_a
                       JOIN sz sb ON sb.doc_id = id_b),
    e_exact AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
                FROM docs2 a JOIN docs2 b
                  ON a.text = b.text AND a.doc_id < b.doc_id),
    e_cont AS (SELECT id_a, id_b FROM sim
               WHERE i * 10 >= 9 * na OR i * 10 >= 9 * nb),
    e_jacc AS (SELECT id_a, id_b FROM sim
               WHERE i * 10 >= 8 * (na + nb - i)),
    edges AS (SELECT * FROM e_exact UNION
              SELECT * FROM e_cont UNION
              SELECT * FROM e_jacc),
    nodes AS (SELECT id_a AS v FROM edges
              UNION SELECT id_b FROM edges),
    nb AS (SELECT id_a AS v, id_b AS u FROM edges
           UNION SELECT id_b, id_a FROM edges
           UNION SELECT v, v FROM nodes),
    l0 AS (SELECT v, v AS lab FROM nodes),
    l1 AS (SELECT nb.v, MIN(l0.lab) AS lab FROM nb
           JOIN l0 ON l0.v = nb.u GROUP BY nb.v),
    l2 AS (SELECT nb.v, MIN(l1.lab) AS lab FROM nb
           JOIN l1 ON l1.v = nb.u GROUP BY nb.v),
    l3 AS (SELECT nb.v, MIN(l2.lab) AS lab FROM nb
           JOIN l2 ON l2.v = nb.u GROUP BY nb.v),
    l4 AS (SELECT nb.v, MIN(l3.lab) AS lab FROM nb
           JOIN l3 ON l3.v = nb.u GROUP BY nb.v),
    l5 AS (SELECT nb.v, MIN(l4.lab) AS lab FROM nb
           JOIN l4 ON l4.v = nb.u GROUP BY nb.v),
    l6 AS (SELECT nb.v, MIN(l5.lab) AS lab FROM nb
           JOIN l5 ON l5.v = nb.u GROUP BY nb.v),
    l7 AS (SELECT nb.v, MIN(l6.lab) AS lab FROM nb
           JOIN l6 ON l6.v = nb.u GROUP BY nb.v),
    l8 AS (SELECT nb.v, MIN(l7.lab) AS lab FROM nb
           JOIN l7 ON l7.v = nb.u GROUP BY nb.v)
    SELECT v AS doc_id, lab AS component FROM l8 ORDER BY doc_id
"""


def k_anonymity_audit(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """PRIVACY AUDIT — k-anonymity + l-diversity (Sweeney '02;
    Machanavajjhala '07), the compliance gate a dataset passes before
    release: group customers by the quasi-identifier pair
    (nation, market segment) and report each group's size n (k-anon:
    n < k means the QI combination re-identifies to fewer than k
    people) and its l-diversity l = distinct sensitive values (account
    balance banded negative/low/high — a group where everyone shares
    one band leaks the sensitive attribute even at large n).
    Distributed shape: sizes are a ≤|QI|-row per-batch combiner;
    diversity folds per-batch DISTINCT (QI, band) triples — both
    zero-shuffle, driver work bounded by the QI domain, never rows."""
    ds = _read(sf_dir, "customer",
               columns=["c_nationkey", "c_mktsegment", "c_acctbal"])

    def partial(t: pa.Table) -> pd.DataFrame:
        nk = t.column("c_nationkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        seg = t.column("c_mktsegment").to_numpy(zero_copy_only=False)
        cents = _cents(t.column("c_acctbal")).to_numpy()
        band = np.where(cents < 0, 0, np.where(cents < 500_000, 1, 2))
        df = pd.DataFrame({"c_nationkey": nk, "c_mktsegment": seg,
                           "band": band})
        g = df.groupby(["c_nationkey", "c_mktsegment", "band"],
                       as_index=False).size()
        return g.rename(columns={"size": "n"})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby(["c_nationkey", "c_mktsegment", "band"],
                      as_index=False)["n"].sum()
    out = g.groupby(["c_nationkey", "c_mktsegment"], as_index=False) \
        .agg(n=("n", "sum"), l_div=("band", "nunique"))
    out["k_violation"] = (out["n"] < k).astype(np.int64)
    return out.sort_values(["c_nationkey", "c_mktsegment"]) \
        .reset_index(drop=True).astype(
        {"c_nationkey": "int64", "n": "int64", "l_div": "int64",
         "k_violation": "int64"})


QUERIES["k_anonymity_audit"] = k_anonymity_audit
ORACLES["k_anonymity_audit"] = """
    WITH b AS (
      SELECT c_nationkey, c_mktsegment,
             CASE WHEN CAST(ROUND(c_acctbal * 100) AS BIGINT) < 0 THEN 0
                  WHEN CAST(ROUND(c_acctbal * 100) AS BIGINT) < 500000
                  THEN 1 ELSE 2 END AS band
      FROM customer
    )
    SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT band) AS BIGINT) AS l_div,
           CAST(CASE WHEN COUNT(*) < 5 THEN 1 ELSE 0 END AS BIGINT)
             AS k_violation
    FROM b GROUP BY c_nationkey, c_mktsegment
    ORDER BY c_nationkey, c_mktsegment
"""


def audio_vad_segments(sf_dir: str) -> pd.DataFrame:
    """Voice-activity segmentation over REAL PCM audio
    (stages/multimodal.AudioVadSegments): cached WAV fixtures with
    PLANTED voiced bursts between true-silence gaps → actor-pool
    decode + 20 ms frame-energy VAD → per-clip (frames, voiced frames,
    segments, longest run). Planted recall is exact (n_segments ==
    planted bursts for every clip — pytest-locked); rows-only,
    deterministic (fixed frame boundaries)."""
    import glob as _glob
    import tempfile

    import ray.data

    from ..stages.multimodal import AudioVadSegments, make_vad_wav_table

    n = max(24, int(2048 * sf_of(sf_dir)))
    cache = os.path.join(tempfile.gettempdir(), "raysketch_data",
                         f"vadwavs_n{n}_s3")
    if not _glob.glob(os.path.join(cache, "*.parquet")):
        import pyarrow.parquet as pq

        os.makedirs(cache, exist_ok=True)
        tmp = os.path.join(cache, "_part0.tmp")
        pq.write_table(make_vad_wav_table(n, seed=3), tmp,
                       row_group_size=max(16, n // 8))
        os.replace(tmp, os.path.join(cache, "part0.parquet"))
    ds = ray.data.read_parquet(cache,
                               columns=["item_id", "payload"])
    out = ds.map_batches(AudioVadSegments, batch_format="pyarrow",
                         batch_size=32,
                         concurrency=auto_concurrency()).to_pandas()
    return out.sort_values("item_id").reset_index(drop=True).astype(
        {c: "int64" for c in ("item_id", "n_frames", "n_voiced",
                              "n_segments", "longest_run")})


QUERIES["audio_vad_segments"] = audio_vad_segments


def _iso_year_week(days: np.ndarray):
    """Vectorized ISO-8601 (year, week) from epoch days — the Thursday
    rule over Hinnant's civil_from_days/days_from_civil: a date's ISO
    week is the week of ITS THURSDAY, so year boundaries resolve by
    computing the Thursday's civil year and counting 7-day steps from
    that year's Jan 1. Equal to datetime.isocalendar() on 5000 random
    days + every boundary case (pytest-locked)."""
    days = np.asarray(days, dtype=np.int64)

    def civil_from_days(z):
        z = z + 719468
        era = np.where(z >= 0, z, z - 146096) // 146097
        doe = z - era * 146097
        yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
        y = yoe + era * 400
        doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
        mp = (5 * doy + 2) // 153
        m = np.where(mp < 10, mp + 3, mp - 9)
        return np.where(m <= 2, y + 1, y)

    def days_from_jan1(y):
        y2 = y - 1  # month 1 ≤ 2
        era = np.where(y2 >= 0, y2, y2 - 399) // 400
        yoe = y2 - era * 400
        doy = (153 * 10 + 2) // 5  # mp for January = 10, d=1 → +0
        doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
        return era * 146097 + doe - 719468

    dow = (days + 3) % 7          # Mon=0 (1970-01-01 was a Thursday)
    thu = days - dow + 3
    y = civil_from_days(thu)
    week = (thu - days_from_jan1(y)) // 7 + 1
    return y, week


def revenue_by_iso_week(sf_dir: str) -> pd.DataFrame:
    """Calendar-correct ISO-8601 week aggregation: lineitem revenue by
    (iso_year, iso_week) — the fiscal-reporting grouping whose year
    boundary is NOT Jan 1 (Jan 1 can belong to week 52/53 of the
    PREVIOUS ISO year; Dec 29-31 can open week 1 of the next). The
    vectorized Thursday-rule implementation (:func:`_iso_year_week`)
    is checked against DuckDB's isoyear()/week() pair over seven years
    of shipdates covering multiple 53-week years. Per-batch combiner
    (≤ ~370 (year, week) keys), zero shuffles, exact cents."""
    ds = _read(sf_dir, "lineitem", columns=["l_shipdate", "l_extendedprice"])
    DAY_US = 86_400_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        d = t.column("l_shipdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").view(np.int64) // DAY_US
        y, w = _iso_year_week(d)
        c = _cents(t.column("l_extendedprice")).to_numpy()
        df = pd.DataFrame({"iso_year": y, "iso_week": w, "c": c})
        return df.groupby(["iso_year", "iso_week"], as_index=False) \
            .agg(n=("c", "size"), revenue_cents=("c", "sum"))

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = p.groupby(["iso_year", "iso_week"], as_index=False) \
        [["n", "revenue_cents"]].sum()
    return out.sort_values(["iso_year", "iso_week"]) \
        .reset_index(drop=True).astype(
        {"iso_year": "int64", "iso_week": "int64", "n": "int64",
         "revenue_cents": "int64"})


QUERIES["revenue_by_iso_week"] = revenue_by_iso_week
ORACLES["revenue_by_iso_week"] = """
    SELECT CAST(isoyear(l_shipdate) AS BIGINT) AS iso_year,
           CAST(week(l_shipdate) AS BIGINT) AS iso_week,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM lineitem
    GROUP BY 1, 2 ORDER BY iso_year, iso_week
"""


def _ttorders_stats_table(sf_dir: str) -> tuple[str, int]:
    """Versioned orders table whose commits EMBED per-file o_orderkey
    (min, max) stats (timetravel.commit_with_stats) — the Iceberg-
    manifest variant of the time_travel_orders build (same v0 range
    partitioning + v1 copy-on-write reprice of the first quarter)."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ..stages.timetravel import (commit_with_stats, latest_version,
                                     write_partitioned_files)

    maxk1 = int(pc.max(pq.read_table(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey"]).column("o_orderkey")).as_py()) + 1
    tag = sf_of(sf_dir)
    root = os.path.join(tempfile.gettempdir(), "raysketch_data",
                        f"ttorders_stats_{tag}")
    if latest_version(root) < 1:
        if os.path.exists(root):
            shutil.rmtree(root)
        os.makedirs(root, exist_ok=True)
        orders = _read(sf_dir, "orders",
                       columns=["o_orderkey", "o_totalprice"])

        def tag_part(t: pa.Table) -> pa.Table:
            k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
            return t.append_column("__p", pa.array((k * 8) // maxk1))

        f0 = write_partitioned_files(
            orders.map_batches(tag_part, batch_format="pyarrow"),
            os.path.join(root, "v0"), "__p")
        commit_with_stats(root, f0, "o_orderkey")

        def _pval(f: str) -> int:
            part = [c for c in f.split(os.sep) if c.startswith("__p=")]
            return int(part[0][4:])

        touched = [f for f in f0 if _pval(f) < 2]
        import ray.data

        def reprice(t: pa.Table) -> pa.Table:
            k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
            cents = _cents(t.column("o_totalprice")).to_numpy()
            cents = cents + cents // 20
            return pa.table({"o_orderkey": k,
                             "o_totalprice": cents / 100.0,
                             "__p": (k * 8) // maxk1})

        f1 = write_partitioned_files(
            ray.data.read_parquet(touched)
            .map_batches(reprice, batch_format="pyarrow"),
            os.path.join(root, "v1"), "__p")
        commit_with_stats(root, f1, "o_orderkey", remove=touched)
    return root, maxk1


def time_travel_pruned_read(sf_dir: str) -> pd.DataFrame:
    """DATA SKIPPING from the commit log alone (Iceberg manifests):
    the versioned orders table's commits carry per-file o_orderkey
    (min, max); a key-range predicate over [m/8, 3m/8) then resolves
    its file list from the LOG — files whose stats are disjoint never
    open (pytest asserts files_read < files_active for BOTH
    snapshots). The range straddles the v1 copy-on-write boundary, so
    snapshot 1 reads a mix of rewritten and shared files; pruned sets
    are supersets, so a residual row filter finishes the predicate.
    Oracle recomputes both snapshots from the base table with the same
    integer arithmetic."""
    import ray.data

    from ..stages.timetravel import active_files_pruned

    root, maxk1 = _ttorders_stats_table(sf_dir)
    lo, hi = maxk1 // 8, 3 * maxk1 // 8 - 1  # inclusive key range
    rows = []
    for v in (0, 1):
        files, _total = active_files_pruned(root, v, lo, hi)
        ds = ray.data.read_parquet(files,
                                   columns=["o_orderkey", "o_totalprice"])

        def partial(t: pa.Table) -> pa.Table:
            k = t.column("o_orderkey").to_numpy(zero_copy_only=False)
            m = (k >= lo) & (k <= hi)
            c = _cents(t.column("o_totalprice")).to_numpy()[m]
            return pa.table({"n": pa.array([int(m.sum())], type=pa.int64()),
                             "s": pa.array([int(c.sum())],
                                           type=pa.int64())})

        p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        rows.append({"version": np.int64(v),
                     "n_orders": np.int64(p["n"].sum()),
                     "sum_cents": np.int64(p["s"].sum())})
    return pd.DataFrame(rows).astype(
        {"version": "int64", "n_orders": "int64", "sum_cents": "int64"})


QUERIES["time_travel_pruned_read"] = time_travel_pruned_read
ORACLES["time_travel_pruned_read"] = """
    WITH mx AS (SELECT MAX(o_orderkey) + 1 AS m FROM orders),
    c AS (SELECT o_orderkey,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
          FROM orders
          WHERE o_orderkey >= (SELECT m FROM mx) // 8
            AND o_orderkey <= 3 * (SELECT m FROM mx) // 8 - 1)
    SELECT CAST(0 AS BIGINT) AS version,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(v) AS BIGINT) AS sum_cents
    FROM c
    UNION ALL
    SELECT 1, CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN (o_orderkey * 8) // (SELECT m FROM mx) < 2
                         THEN v + v // 20 ELSE v END) AS BIGINT)
    FROM c
    ORDER BY version
"""


def time_travel_changes(sf_dir: str) -> pd.DataFrame:
    """CHANGED-FILES-ONLY snapshot diff (the table_changes() /
    changelog read): the copy-on-write layout means v0→v1 differences
    live entirely in the files one side has and the other lacks — the
    diff reads ONLY those (pytest asserts changed < active; shared
    files never open), where a naive diff rescans both snapshots.
    Emits the exact aggregate delta (Δrows, Δcents); the oracle
    derives the same delta from the base table: the repriced quarter
    adds exactly Σ v//20 cents and zero rows."""
    import ray.data

    from ..stages.timetravel import changed_files

    root, _maxk1 = _ttorders_stats_table(sf_dir)
    added, removed = changed_files(root, 0, 1)

    def sums(files) -> tuple[int, int]:
        if not files:
            return 0, 0
        ds = ray.data.read_parquet(files, columns=["o_totalprice"])

        def partial(t: pa.Table) -> pa.Table:
            c = _cents(t.column("o_totalprice")).to_numpy()
            return pa.table({"n": pa.array([len(c)], type=pa.int64()),
                             "s": pa.array([int(c.sum())],
                                           type=pa.int64())})

        p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        return int(p["n"].sum()), int(p["s"].sum())

    na, sa = sums(added)
    nr, sr = sums(removed)
    return _one_row(delta_rows=np.int64(na - nr),
                    delta_cents=np.int64(sa - sr))


QUERIES["time_travel_changes"] = time_travel_changes
ORACLES["time_travel_changes"] = """
    WITH mx AS (SELECT MAX(o_orderkey) + 1 AS m FROM orders),
    c AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
          FROM orders
          WHERE (o_orderkey * 8) // (SELECT m FROM mx) < 2)
    SELECT CAST(0 AS BIGINT) AS delta_rows,
           CAST(SUM(v // 20) AS BIGINT) AS delta_cents
    FROM c
"""


def simhash_cluster_compression(sf_dir: str, group: int = 32
                                ) -> pd.DataFrame:
    """LAYOUT-AWARE storage: writing similar documents ADJACENTLY
    makes general-purpose compression find their shared substrings —
    the locality dividend behind similarity-clustered data files (why
    sort-before-write matters beyond pruning). Near-duplicates are
    PLANTED (every 7th doc gets a +500000-id near-copy) so the effect
    is real on any corpus, then the SAME docs compress under two
    layouts with EQUAL ``group``-doc blocks: (a) simhash order —
    buckets on the hash's top bits (near-dups share them), sorted and
    chunked within buckets; (b) doc_id order — the plant lands far
    from its original. Each block zlib-compresses independently (the
    row-group analogy); exact byte totals ship back; pytest asserts
    the clustered layout strictly wins and the query is deterministic."""
    import zlib

    from ..stages.dedup import SimHasher

    base = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        txt = pc.fill_null(t.column("text"), "")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        m = did % 7 == 0
        tails = pc.binary_join_element_wise(
            txt, pa.array([" near dup tail"] * t.num_rows), "")
        if isinstance(tails, pa.ChunkedArray):
            tails = tails.combine_chunks()
        return pa.table({
            "doc_id": pa.array(np.concatenate([did, did[m] + 500_000])),
            "text": pa.concat_arrays([
                txt.cast(pa.string()),
                tails.filter(pa.array(m)).cast(pa.string())]),
        })

    ds = base.map_batches(plant, batch_format="pyarrow")
    sim = ds.map_batches(SimHasher(), batch_format="pyarrow")
    from ..stages.joins import bucket_hash_join

    joined = bucket_hash_join(ds, sim, on="doc_id")

    def measure(order_col: str):
        def bucketize(t: pa.Table) -> pa.Table:
            k = t.column(order_col).to_numpy(zero_copy_only=False) \
                .astype(np.uint64)
            if order_col == "simhash":
                b = (k >> np.uint64(61)).astype(np.int64)  # top 3 bits
            else:
                b = (k // np.uint64(2048)).astype(np.int64)  # id ranges
            return pa.table({"__g": pa.array(b),
                             "text": t.column("text"),
                             order_col: t.column(order_col)})

        def compress_bucket(g: pd.DataFrame) -> pd.DataFrame:
            gg = g.sort_values(order_col).reset_index(drop=True)
            raws, zls = 0, 0
            for s in range(0, len(gg), group):
                blob = "\x00".join(
                    gg["text"].iloc[s:s + group].astype(str)).encode()
                raws += len(blob)
                zls += len(zlib.compress(blob, 6))
            return pd.DataFrame({"raw": [raws], "zl": [zls]})

        parts = joined.map_batches(bucketize, batch_format="pyarrow") \
            .groupby("__g").map_groups(compress_bucket,
                                       batch_format="pandas").to_pandas()
        return int(parts["raw"].sum()), int(parts["zl"].sum())

    raw_c, zl_c = measure("simhash")
    _raw_i, zl_i = measure("doc_id")
    return _one_row(raw_bytes=np.int64(raw_c),
                    clustered_bytes=np.int64(zl_c),
                    id_order_bytes=np.int64(zl_i),
                    ratio_ppm=np.int64(zl_c * 1_000_000 // max(zl_i, 1)))


QUERIES["simhash_cluster_compression"] = simhash_cluster_compression


def cusum_revenue_shifts(sf_dir: str) -> pd.DataFrame:
    """CUSUM change-point detection (Page 1954) over daily revenue —
    the sequential drift monitor every data-quality pipeline wants:
    S_t = max(0, S_{t−1} + x_t − μ − k) accumulates persistent
    upward deviation (k = μ/20 slack swallows noise) and alarms past
    h = μ. The recurrence looks inherently sequential, but the closed
    form S_t = P_t − min(0, min_{j≤t} P_j) (P = prefix sums of the
    slack-adjusted series) turns it into prefix algebra — one
    cumulative sum + one running minimum — so the oracle is plain
    window functions (a 2500-step recursive CTE measured 15 s; this
    runs in milliseconds) and the engine side is a per-batch daily
    combiner plus an O(days) exact-integer scan. All arithmetic in
    cents with floored μ — no float anywhere."""
    ds = _read(sf_dir, "lineitem", columns=["l_shipdate", "l_extendedprice"])
    DAY_US = 86_400_000_000

    def partial(t: pa.Table) -> pd.DataFrame:
        d = t.column("l_shipdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").view(np.int64) // DAY_US
        c = _cents(t.column("l_extendedprice")).to_numpy()
        df = pd.DataFrame({"day": d, "rev": c})
        return df.groupby("day", as_index=False)["rev"].sum()

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    daily = p.groupby("day", as_index=False)["rev"].sum() \
        .sort_values("day").reset_index(drop=True)
    rev = daily["rev"].to_numpy(dtype=np.int64)
    mu = int(rev.sum()) // len(rev)
    z = rev - mu - mu // 20
    P = np.cumsum(z)
    mn = np.minimum(np.minimum.accumulate(P), 0)
    s = P - mn
    h = mu
    return pd.DataFrame({
        "day": daily["day"].to_numpy(dtype=np.int64),
        "cusum_cents": s,
        "alarm": (s > h).astype(np.int64),
    }).astype({"day": "int64", "cusum_cents": "int64", "alarm": "int64"})


QUERIES["cusum_revenue_shifts"] = cusum_revenue_shifts
ORACLES["cusum_revenue_shifts"] = """
    WITH d AS (
      SELECT CAST(epoch_us(l_shipdate) // 86400000000 AS BIGINT) AS day,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS rev
      FROM lineitem GROUP BY 1),
    stats AS (SELECT CAST(SUM(rev) // COUNT(*) AS BIGINT) AS mu FROM d),
    o AS (SELECT day, rev - mu - mu // 20 AS z FROM d, stats),
    p AS (SELECT day, SUM(z) OVER (ORDER BY day) AS pf FROM o),
    m AS (SELECT day, pf,
                 LEAST(CAST(0 AS BIGINT),
                       MIN(pf) OVER (ORDER BY day)) AS mn
          FROM p)
    SELECT m.day, CAST(pf - mn AS BIGINT) AS cusum_cents,
           CAST(CASE WHEN pf - mn > (SELECT mu FROM stats)
                     THEN 1 ELSE 0 END AS BIGINT) AS alarm
    FROM m ORDER BY day
"""


# ====================================================================
# Driver-gate registration order
# ====================================================================
# CORRECTNESS_r{N}.json snapshots only the FIRST 50 queries() entries,
# so the highest-value pipelines are front-loaded (VERDICT r02 item 3):
# the 7 north-rule sketch queries (rows-only by design — pytest holds
# their error bounds), then oracle-checked anchors covering all 22
# TPC-H shapes, the window-function family, the planted-duplicate dedup
# proofs, BPE tokenizer training, and the join family. Everything else
# keeps its original relative order behind them.
_GATE_PRIORITY = [
    # north-rule sketch core (rows-only)
    "hll_distinct_conv", "hll_distinct_conv_by_role",
    "hll_distinct_role_tool_pairs", "cms_tool_top10",
    "tdigest_text_len", "kll_text_len", "bloom_conv_membership",
    # exact + HLL oracle twins (hll_distinct_event_type demonstrates
    # the same LC-regime oracle as hll_distinct_nation — moved to the
    # full replica to keep the 50-entry snapshot at 50 with the
    # round-4 moments oracle front-loaded)
    "exact_distinct_orders", "hll_distinct_nation",
    # all 22 TPC-H shapes (SURVEY.md §8.12 map)
    "q1_pricing_summary", "cheapest_supplier_per_part",
    "mktsegment_revenue",
    "q5_local_supplier_revenue", "q6_forecast_revenue",
    "q7_nation_pair_volume",
    "q9_profit_by_nation_year", "q10_returned_revenue_customers",
    # (q4/q17/important_parts/promo_revenue_ratio/sole_return_suppliers/
    # top_customer_by_nation move to the FAST_SUBSET + full-replica tier
    # to make room for the round-4 sixth-session oracles)
    # round-4 sixth-session oracles: end-to-end curation funnel,
    # sparse retrieval, line dedup, storage layouts, link analysis
    "curation_funnel_docs", "doc_similar_topk", "line_dedup_docs",
    "zorder_box_events", "bucketed_join_priority_revenue",
    "hits_word_graph",
    # round-4 sixth-session oracles (order_count_distribution and
    # moments_text_len stay FAST_SUBSET-pytest-gated + full-replica-
    # checked to make room): deterministic epoch shuffle + temperature
    # mixture sampling
    "epoch_shuffle_events", "temperature_mix_select",
    # (q8/q19/q20 join q12/q15/q16 in the FAST_SUBSET + full-replica
    # tier to make room for the round-4 fifth-session oracles)
    # round-4 fifth-session oracles (front-loaded per the r03-item-8
    # discipline): weighted multiset similarity, snapshot delta, rollup
    # set ops
    "weighted_jaccard_pairs", "snapshot_diff_docs",
    "rollup_churn_users_ranges",
    # (q12/q15/q16/big_orders_having stay FAST_SUBSET-pytest-gated +
    # full-replica-checked; swapped out of the 50-entry snapshot for
    # the round-4 third-session oracles)
    "q22_idle_rich_customers",
    # dedup / LLM-pipeline anchors (round-4 additions front-loaded:
    # tiled cosine, trained SemDeDup, LM quality score, generalized
    # BPE, and the data-mixing trio — VERDICT r03 item 8; the window
    # family moved fully to FAST_SUBSET + the full replica to make
    # room inside the 50-entry snapshot)
    "dedup_docs_exact", "minhash_dedup_planted",
    "embedding_dedup_planted", "ngram_jaccard_pairs",
    "incremental_dedup_docs", "bpe_two_merges",
    "span_dedup_stats", "semdedup_embeddings",
    "decontaminate_fuzzy_docs", "token_budget_select",
    "lm_score_docs", "top_cosine_pairs",
    "semdedup_trained_embeddings", "bpe_train_merges",
    "ccnet_perplexity_buckets", "dsir_select_docs",
    "domain_mix_select",
    # round-4 seventh-session oracles: the band join (non-equi
    # value-range exchange), SCD2 temporal dimension join, WordPiece
    # (tokenizer-training triad complete), time-travel snapshot reads
    # (kmeans_fixedpoint_embeddings/source_drift_tv move to the
    # FAST_SUBSET + full-replica tier to hold the snapshot at 50)
    "orders_price_band_count", "scd2_revenue_by_tier",
    "wordpiece_two_merges", "time_travel_orders",
    # join family
    "revenue_by_nation", "join_size_view_purchase",
]


def _front_load(reg: dict) -> dict:
    out = {k: reg[k] for k in _GATE_PRIORITY if k in reg}
    out.update((k, v) for k, v in reg.items() if k not in out)
    return out


QUERIES = _front_load(QUERIES)
