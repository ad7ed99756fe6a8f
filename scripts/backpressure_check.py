#!/usr/bin/env python
"""Streaming/backpressure evidence under a CONSTRAINED object store.

At 100 TB the object store never holds the dataset — correctness under
store pressure (streaming block execution + spill-to-disk on the wide
exchanges) is the property every pipeline here relies on. The sandbox
stand-in: run the same two pipelines over the transcript table in two
fresh Ray sessions —

  1. baseline: default object store;
  2. constrained: ``object_store_memory`` a small fraction of the
     table's decompressed footprint (default 256 MiB vs an ~1 GB
     8M-turn table), forcing the full-table exchange to spill;

and assert the results are IDENTICAL (the fold is bit-deterministic by
construction; the exchange reduces with commutative ops), printing one
JSON line with wall times and the constrained session's spilled bytes.

Pipelines:
  - fold: the flagship HLL distinct-conv estimate (KB-size state,
    streams block-by-block — backpressure keeps the store bounded);
  - exchange: a conv-hash bucket shuffle of the FULL table including
    the text column (per-conv turn counts / char totals / an xor of
    text murmurs, reduced per bucket) — the all-to-all pattern whose
    in-flight working set exceeds the constrained store, so completion
    REQUIRES Ray's spill path; spilled bytes are reported as proof.

Usage: python scripts/backpressure_check.py [n_turns] [store_mib]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pipelines(n_turns: int) -> dict:
    import numpy as np
    import pyarrow as pa
    import ray.data

    from raysketch.hashing import arrow_to_flat_bytes, murmur64a
    from raysketch.pipelines import queries as Q
    from raysketch.sources.transcripts import write_transcripts
    from raysketch.stages.dedup import _splitmix64

    tpath = write_transcripts(n_turns)

    # fold: flagship HLL distinct convs (sf token drives the turn count)
    sf_token = n_turns / Q._TURNS_PER_SF
    fold = Q.hll_distinct_conv(f"/tmp/x/sf{sf_token:g}")
    fold_est = int(fold["distinct_convs_est"][0])

    # exchange: full-table conv-hash shuffle (text rides the wire)
    def add_bucket(t: pa.Table) -> pa.Table:
        data, offsets = arrow_to_flat_bytes(
            t.column("conv_id").combine_chunks().cast(pa.string()))
        h = murmur64a(data, offsets)
        b = (_splitmix64(h) % np.uint64(64)).astype(np.int64)
        return t.append_column("__b", pa.array(b))

    def reduce_bucket(g) -> "pa.Table":
        t = pa.Table.from_pandas(g, preserve_index=False)
        data, offsets = arrow_to_flat_bytes(
            t.column("text").combine_chunks().cast(pa.string()))
        h = murmur64a(data, offsets)
        conv = t.column("conv_id").combine_chunks().cast(pa.string())
        n_convs = len(conv.unique())
        return pa.table({
            "n_convs": pa.array([n_convs], pa.int64()),
            "n_turns": pa.array([len(conv)], pa.int64()),
            "chars": pa.array([int((offsets[1:] - offsets[:-1]).sum())],
                              pa.int64()),
            "xor": pa.array([int(np.bitwise_xor.reduce(
                h.astype(np.int64)) if len(h) else 0)], pa.int64()),
        })

    parts = ray.data.read_parquet(tpath) \
        .map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__b") \
        .map_groups(reduce_bucket, batch_format="pandas") \
        .to_pandas()
    exchange = {
        "n_convs": int(parts["n_convs"].sum()),
        "n_turns": int(parts["n_turns"].sum()),
        "chars": int(parts["chars"].sum()),
        "xor": int(np.bitwise_xor.reduce(parts["xor"].to_numpy())),
    }
    return {"fold_estimate": fold_est, "exchange": exchange}


def run_once(n_turns: int, store_bytes: int | None, ncpu: int = 8) -> dict:
    import ray

    kw = {"object_store_memory": store_bytes} if store_bytes else {}
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR", **kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    t0 = time.perf_counter()
    res = _pipelines(n_turns)
    wall = round(time.perf_counter() - t0, 3)
    # spill evidence: measure the session's spilled-object files while
    # the session is live (ray memory_summary needs grpc, absent here)
    spilled_mib = None
    try:
        import glob as _g

        sess = ray._private.worker._global_node.get_session_dir_path()
        total = 0
        for p in set(_g.glob(os.path.join(sess, "ray_spilled_objects*"))):
            for dp, _, fs in os.walk(p):
                total += sum(os.path.getsize(os.path.join(dp, f))
                             for f in fs)
        spilled_mib = round(total / 2**20, 1)
    except Exception:
        pass
    ray.shutdown()
    res["wall_sec"] = wall
    res["spilled_mib"] = spilled_mib
    return res


def main() -> dict:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    store_mib = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    base = run_once(n_turns, None)
    constrained = run_once(n_turns, store_mib * 1024 * 1024)

    assert constrained["fold_estimate"] == base["fold_estimate"], \
        (constrained["fold_estimate"], base["fold_estimate"])
    assert constrained["exchange"] == base["exchange"], \
        (constrained["exchange"], base["exchange"])

    out = {
        "metric": "backpressure_check",
        "n_turns": n_turns,
        "store_mib": store_mib,
        "identical": True,
        "baseline_wall_sec": base["wall_sec"],
        "constrained_wall_sec": constrained["wall_sec"],
        "constrained_spilled_mib": constrained["spilled_mib"],
        "exchange": base["exchange"],
        "fold_estimate": base["fold_estimate"],
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
