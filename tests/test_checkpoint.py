"""Checkpoint/resume: lineage manifest, shard skipping, exactly-once
folding, result equivalence with the direct aggregate."""

import glob
import json
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from raysketch import HLL
from raysketch.sources.transcripts import write_transcripts
from raysketch.state.checkpoint import CheckpointedSketchJob


@pytest.fixture(scope="module")
def shards(ray_session, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tdata"))
    path = write_transcripts(30000, root=root, rows_per_file=5000)
    return sorted(glob.glob(os.path.join(path, "*.parquet")))


def test_checkpointed_equals_direct(shards, tmp_path):
    job = CheckpointedSketchJob(str(tmp_path / "ck"), "hll", on="conv_id",
                                shard_files_per_task=2)
    blob = job.run(shards)
    local = HLL()
    for f in shards:
        local.add_batch(pq.read_table(f, columns=["conv_id"]).column("conv_id"))
    assert np.array_equal(HLL.from_bytes(blob).regs, local.regs)

    man = job.manifest()
    assert len(man) == 3  # 6 files / 2 per shard
    assert sum(e["rows_folded"] for e in man) == 30000
    assert all(e["rows_per_sec"] > 0 for e in man)
    assert all(os.path.exists(e["output"]) for e in man)


def test_resume_skips_completed(shards, tmp_path):
    ck = str(tmp_path / "ck2")
    job = CheckpointedSketchJob(ck, "hll", on="conv_id", shard_files_per_task=3)
    job.run(shards[:3])  # first shard only
    man1 = job.manifest()
    assert len(man1) == 1
    ts1 = man1[0]["ts"]

    # full run: shard-00000 must be skipped (same ts), shard-00001 added
    blob = job.run(shards)
    man2 = {e["shard_id"]: e for e in job.manifest()}
    assert len(man2) == 2
    assert man2["shard-00000"]["ts"] == ts1  # not re-folded (exactly-once)

    local = HLL()
    for f in shards:
        local.add_batch(pq.read_table(f, columns=["conv_id"]).column("conv_id"))
    assert HLL.from_bytes(blob).finalize() == local.finalize()


def test_grouped_checkpoint(shards, tmp_path):
    import pandas as pd

    job = CheckpointedSketchJob(str(tmp_path / "ck3"), "hll", on="conv_id",
                                by=["role"], shard_files_per_task=6)
    out = job.run(shards, merge_mode="estimate").to_pandas()
    df = pd.concat([pq.read_table(f, columns=["conv_id", "role"]).to_pandas() for f in shards])
    exact = df.groupby("role")["conv_id"].nunique()
    for _, r in out.iterrows():
        e = exact[r["role"]]
        assert abs(r["hll_merged"] - e) / max(e, 1) < 0.02


def test_non_idempotent_sketch_exactly_once(shards, tmp_path):
    """CMS totals double if a shard is folded twice — resume must not."""
    from raysketch.sketches import CountMin

    job = CheckpointedSketchJob(str(tmp_path / "ck4"), "countmin", on="tool",
                                shard_files_per_task=3, width=1 << 12, depth=4)
    job.run(shards)
    blob = job.run(shards)  # second full run: all shards skipped
    cm = CountMin.from_bytes(blob)
    assert cm.total == 30000


def test_sketch_service_actor(ray_session):
    """Live sketch service: sharded actors, dump/load interop with the
    batch engine's wire format."""
    from raysketch import HLL
    from raysketch.state.service import SketchService

    svc = SketchService(sketch="hll", num_shards=3)
    svc.add_sync("us", [f"user-{i}" for i in range(1000)])
    svc.add_sync("us", [f"user-{i}" for i in range(500, 1500)])
    svc.add_sync("eu", ["a", "b", "c"])
    assert svc.count("eu") == 3
    est = svc.count("us")
    assert abs(est - 1500) / 1500 < 0.02
    assert svc.count("missing") is None

    # snapshot crosses into the batch world
    snap = svc.snapshot()
    h = HLL.from_bytes(snap["us"])
    assert h.finalize() == est

    # load merges external state in
    ext = HLL()
    ext.add_batch(["x", "y", "z"])
    svc.load("eu", ext.to_bytes())
    assert svc.count("eu") == 6


def test_crash_leftover_tmp_not_appended(shards, tmp_path):
    """A stale .tmp dir from a crashed shard write must not leak stale
    partials into the fresh write (CMS total proves exactly-once)."""
    import pyarrow as pq_pa
    import pyarrow.parquet as pq

    from raysketch.sketches import CountMin

    ck = str(tmp_path / "ck5")
    job = CheckpointedSketchJob(ck, "countmin", on="tool",
                                shard_files_per_task=6, width=1 << 12, depth=4)
    # simulate a crashed prior attempt: garbage partial in the tmp dir
    stale = os.path.join(ck, "partials", "shard-00000.tmp")
    os.makedirs(stale, exist_ok=True)
    garbage = CountMin(width=1 << 12, depth=4)
    garbage.add_batch(["zzz"] * 5000)
    pq.write_table(
        pq_pa.table({"sketch": pq_pa.array([garbage.to_bytes()], type=pq_pa.binary()),
                     "partial_n": pq_pa.array([5000])}),
        os.path.join(stale, "stale.parquet"),
    )
    blob = job.run(shards)
    cm = CountMin.from_bytes(blob)
    assert cm.total == 30000  # the 5000 garbage folds did NOT leak in


def test_crash_published_but_unrecorded_shard(shards, tmp_path):
    """Shard dir published but manifest append crashed → re-run refolds
    and REPLACES the orphan dir (no ENOTEMPTY, no double-count)."""
    from raysketch.sketches import CountMin

    ck = str(tmp_path / "ck6")
    job = CheckpointedSketchJob(ck, "countmin", on="tool",
                                shard_files_per_task=6, width=1 << 12, depth=4)
    blob1 = job.run(shards)
    # simulate: wipe the manifest (as if the append never happened) but
    # keep the published partial dirs
    os.remove(job.manifest_path)
    blob2 = job.run(shards)
    a, b = CountMin.from_bytes(blob1), CountMin.from_bytes(blob2)
    assert a.total == b.total == 30000
    import numpy as np

    assert np.array_equal(a.table, b.table)


def test_changed_input_set_invalidates_stale_shards(shards, tmp_path):
    """ADVICE r01 (medium): shard ids are positional, so a changed input
    file set shifts chunk membership — resume must re-fold shards whose
    recorded input_files no longer match, and the merge must ignore
    manifest entries beyond the current input's shards."""
    from raysketch.sketches import CountMin

    ck = str(tmp_path / "ck7")
    job = CheckpointedSketchJob(ck, "countmin", on="tool",
                                shard_files_per_task=2, width=1 << 12, depth=4)
    job.run(shards)  # 6 files → 3 shards, 30000 rows
    # drop the first file: every chunk shifts; stale entries cover wrong files
    new_files = shards[1:]
    blob = job.run(new_files)
    cm = CountMin.from_bytes(blob)
    assert cm.total == 25000  # exactly the 5 remaining files, no stale rows
    man = {e["shard_id"]: e for e in job.manifest()}
    # every surviving shard's lineage matches the new chunking
    for i in range(0, len(new_files), 2):
        sid = f"shard-{i // 2:05d}"
        assert man[sid]["input_files"] == sorted(new_files)[i:i + 2]


def test_sketch_service_async_add_backpressure(ray_session):
    """Async adds surface actor-side errors on drain and flush gives
    read-your-writes (ADVICE r01: no silent fire-and-forget)."""
    import pytest as _pytest

    from raysketch.state.service import SketchService

    svc = SketchService(sketch="hll", num_shards=2, max_in_flight=8)
    for i in range(40):
        svc.add("k", [f"u{i}-{j}" for j in range(10)])
    est = svc.count("k")  # flush happened before the read
    assert abs(est - 400) / 400 < 0.05  # HLL estimate of the 400 adds

    bad = SketchService(sketch="countmin", num_shards=1, max_in_flight=4,
                        width=1 << 10, depth=3)
    bad.load_error = None
    bad.add("k", ["ok"])
    bad.add("k", [object()])  # non-coercible element → actor-side TypeError
    with _pytest.raises(Exception):
        bad.flush()


def test_job_spec_deterministic_path(shards, ray_session):
    """job spec {"deterministic": true} routes to per-file folds +
    canonical reduce: identical results across runs."""
    from raysketch.job import run

    spec = {"input": shards, "sketch": "kll", "on": "turn_idx",
            "deterministic": True, "mode": "estimate", "params": {"k": 128}}
    a = run(spec)
    b = run(spec)
    assert a["result"] == b["result"]
    assert a["result"]["n"] == 30000


def test_job_spec_query_mode(ray_session, tmp_path):
    """spec {"query": name, "sf_dir": ..., "output": ...} runs any
    registered queries() pipeline and writes one parquet file."""
    import pyarrow.parquet as pq

    from raysketch.job import run

    out = str(tmp_path / "topk.parquet")
    summary = run({"query": "topk_event_types",
                   "sf_dir": "/root/testdata/sf0.001", "output": out})
    assert summary["rows"] == 5 and summary["output"] == out
    t = pq.read_table(out)
    assert t.num_rows == 5 and set(t.column_names) == {"event_type", "n"}
    with pytest.raises(ValueError, match="unknown query"):
        run({"query": "nope", "sf_dir": "/root/testdata/sf0.001"})


# ------------------------------------------------ CheckpointedWrite sink

def _identity_sink(tmp_path, name):
    from raysketch.state.checkpoint import CheckpointedWrite

    return CheckpointedWrite(str(tmp_path / name), shard_files_per_task=2)


def _upper_roles(ds):
    import pyarrow as pa
    import pyarrow.compute as pc

    return ds.map_batches(
        lambda t: pa.table({"conv_id": t.column("conv_id"),
                            "role": pc.utf8_upper(t.column("role"))}),
        batch_format="pyarrow")


def test_checkpointed_write_resume_skips(shards, tmp_path):
    """Second run with identical inputs + fingerprint skips every shard
    and returns the same output rows (VERDICT r02 item 9)."""
    import ray.data

    sink = _identity_sink(tmp_path, "cw1")
    outs1 = sink.run(shards, _upper_roles, fingerprint="fp-a")
    assert sink.last_skipped == 0
    n1 = ray.data.read_parquet(
        sorted(glob.glob(str(tmp_path / "cw1" / "shards" / "*" / "*.parquet")))
    ).count()
    mtimes = {d: os.path.getmtime(d) for d in outs1}
    outs2 = sink.run(shards, _upper_roles, fingerprint="fp-a")
    assert outs2 == outs1
    assert sink.last_skipped == len(outs1)  # nothing re-processed
    assert {d: os.path.getmtime(d) for d in outs1} == mtimes
    assert n1 == 30000
    # lineage manifest records inputs + fingerprint + throughput
    for e in sink.manifest():
        assert e["fingerprint"] == "fp-a" and e["rows_out"] > 0
        assert e["input_files"] and e["wall_sec"] >= 0


def test_checkpointed_write_changed_input_reprocesses(shards, tmp_path):
    """Positional shard ids: dropping a file shifts chunk membership, so
    every shard whose recorded input_files changed must re-process —
    and stale extra shards must not be returned."""
    sink = _identity_sink(tmp_path, "cw2")
    sink.run(shards, _upper_roles, fingerprint="fp-a")  # 6 files → 3 shards
    new_files = shards[1:]  # 5 files → 3 shards, all chunks shifted
    outs = sink.run(new_files, _upper_roles, fingerprint="fp-a")
    assert sink.last_skipped == 0  # every chunk changed → all re-written
    man = {e["shard_id"]: e for e in sink.manifest()}
    for i in range(0, len(new_files), 2):
        sid = f"shard-{i // 2:05d}"
        assert man[sid]["input_files"] == sorted(new_files)[i:i + 2]
    assert len(outs) == 3


def test_checkpointed_write_fingerprint_invalidates_all(shards, tmp_path):
    """A changed decisions fingerprint (the cross-shard dedup state)
    must re-process EVERY shard even with identical input files — the
    curation sink's correctness condition."""
    sink = _identity_sink(tmp_path, "cw3")
    sink.run(shards, _upper_roles, fingerprint="fp-a")
    sink.run(shards, _upper_roles, fingerprint="fp-b")
    assert sink.last_skipped == 0
    assert all(e["fingerprint"] == "fp-b" for e in sink.manifest())


def test_curate_documents_resumes(ray_session):
    """The flagship curation sink skips its finished shard on a re-run
    with unchanged input (manifest fingerprint match) and returns the
    identical summary."""
    import shutil

    import pandas as pd

    import __ray_entry__ as entry

    shutil.rmtree("/tmp/raysketch_data/curated_0.001", ignore_errors=True)
    q = entry.queries()["curate_documents"]
    a = q("/root/testdata/sf0.001")
    shard = "/tmp/raysketch_data/curated_0.001/shards/shard-00000"
    m1 = os.path.getmtime(shard)
    b = q("/root/testdata/sf0.001")
    assert os.path.getmtime(shard) == m1  # shard skipped, not re-written
    pd.testing.assert_frame_equal(a, b)


def test_job_submit_checkpoint_resume_metrics(shards, tmp_path):
    """CI-style `ray job submit` exercise (VERDICT r03 item 10): the
    job module runs as the SUBPROCESS `python -m raysketch.job --spec`
    (exactly what `ray job submit --` executes), with its own Ray
    session. First submission covers half the shards; the second covers
    all — completed shards are SKIPPED (manifest entries byte-stable),
    and the per-shard metrics sidecar carries the lineage/throughput
    fields. The resumed estimate equals a fresh no-checkpoint run."""
    import subprocess
    import sys

    ck = str(tmp_path / "jobck")
    out_spec = {"input": shards[:3], "ckpt_dir": ck, "sketch": "hll",
                "on": "conv_id", "mode": "estimate",
                "params": {"shard_files_per_task": 3}}

    def submit(spec):
        sp = str(tmp_path / "spec.json")
        with open(sp, "w") as f:
            json.dump(spec, f)
        env = dict(os.environ, RAY_ADDRESS="local")
        r = subprocess.run(
            [sys.executable, "-m", "raysketch.job", "--spec", sp],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=420)
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    s1 = submit(out_spec)
    assert s1["n_input_files"] == 3 and s1["lineage_entries"] == 1
    man_path = os.path.join(ck, "manifest.jsonl")
    with open(man_path) as f:
        man1 = [json.loads(x) for x in f if x.strip()]
    assert len(man1) == 1
    for field in ("shard_id", "input_files", "rows_folded", "wall_sec",
                  "rows_per_sec", "output", "sketch", "ts"):
        assert field in man1[0], field
    assert man1[0]["rows_folded"] == 15000

    s2 = submit({**out_spec, "input": shards})
    assert s2["n_input_files"] == len(shards)
    assert s2["lineage_entries"] == 2
    with open(man_path) as f:
        man2 = {e["shard_id"]: e for e in map(json.loads, f) if e}
    # the first shard was skipped on resume: its entry is unchanged
    assert man2["shard-00000"] == man1[0]

    fresh = submit({"input": shards, "ckpt_dir": str(tmp_path / "ck2"),
                    "sketch": "hll", "on": "conv_id", "mode": "estimate",
                    "params": {"shard_files_per_task": 3}})
    assert s2["result"] == fresh["result"]
