"""Job entry point for ``ray job submit`` (north-rule submission path).

    ray job submit -- python -m raysketch.job --spec job.json

Spec format (JSON):

    {"query": "q1_pricing_summary",              # OR: any queries() entry
     "sf_dir": "/root/testdata/sf0.01",           #   over a table directory
     "output": "/out/q1.parquet"}

    {
      "input": ["/data/shard-*.parquet"],        # files / dirs / globs
      "ckpt_dir": "/ckpt/distinct-convs",         # enables resume
      "sketch": "hll", "on": "conv_id",          # or a "specs" dict for
      "by": ["role"],                            #   multi_sketch_aggregate
      "mode": "estimate",
      "params": {"p": 14},
      "deterministic": true,                      # per-FILE folds + canonical
                                                  #   reduce (byte-reproducible
                                                  #   results for KLL/t-digest)
      "output": "/out/estimates"                  # parquet sink (grouped)
    }

Owns its Ray session (this is a standalone script, not driver-imported);
``address`` honours RAY_ADDRESS (preset to "local" in this sandbox).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time


def expand_inputs(patterns) -> list[str]:
    out: list[str] = []
    for p in patterns:
        if os.path.isdir(p):
            out.extend(sorted(glob.glob(os.path.join(p, "*.parquet"))))
        else:
            out.extend(sorted(glob.glob(p)) or [p])
    return out


def run(spec: dict) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data

    t0 = time.perf_counter()

    if spec.get("query"):
        # full-engine submission path: run any registered queries()
        # pipeline by name over a testdata-shaped table directory
        from .pipelines.queries import QUERIES

        name = spec["query"]
        if name not in QUERIES:
            raise ValueError(f"unknown query {name!r}; known: "
                             f"{sorted(QUERIES)[:8]}... ({len(QUERIES)} total)")
        result = QUERIES[name](spec["sf_dir"])
        wall = time.perf_counter() - t0
        summary = {"wall_sec": round(wall, 3), "query": name,
                   "rows": int(len(result))}
        out = spec.get("output")
        if out:
            os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
            import pyarrow as pa
            import pyarrow.parquet as pq

            tbl = (result if isinstance(result, pa.Table)
                   else pa.Table.from_pandas(result, preserve_index=False))
            pq.write_table(tbl, out)
            summary["output"] = out
        return summary

    files = expand_inputs(spec["input"])

    if spec.get("ckpt_dir"):
        from .state.checkpoint import CheckpointedSketchJob

        job = CheckpointedSketchJob(
            spec["ckpt_dir"], spec["sketch"], spec["on"],
            by=spec.get("by"), **spec.get("params", {}),
        )
        result = job.run(files, merge_mode=spec.get("mode", "bytes"))
        lineage = job.manifest()
    elif spec.get("deterministic"):
        from .agg import multi_sketch_aggregate_files, sketch_aggregate_files

        if "specs" in spec:
            if spec.get("by"):
                raise ValueError(
                    "deterministic multi-sketch jobs do not support 'by' "
                    "grouping yet — drop 'deterministic' or use a single-"
                    "sketch spec (sketch_aggregate_files supports 'by')"
                )
            result = multi_sketch_aggregate_files(files, spec["specs"])
        else:
            result = sketch_aggregate_files(
                files, spec["sketch"], spec["on"], by=spec.get("by"),
                mode=spec.get("mode", "estimate"), **spec.get("params", {}),
            )
        lineage = [{"input_files": files, "deterministic": True}]
    else:
        from .agg import multi_sketch_aggregate, sketch_aggregate

        ds = ray.data.read_parquet(files)
        if "specs" in spec:
            result = multi_sketch_aggregate(ds, spec["specs"], by=spec.get("by"))
        else:
            result = sketch_aggregate(
                ds, spec["sketch"], spec["on"], by=spec.get("by"),
                mode=spec.get("mode", "estimate"), **spec.get("params", {}),
            )
        lineage = [{"input_files": files}]

    wall = time.perf_counter() - t0
    summary: dict = {"wall_sec": round(wall, 3), "n_input_files": len(files),
                     "lineage_entries": len(lineage)}
    if hasattr(result, "write_parquet"):
        out = spec.get("output")
        if out:
            import shutil

            shutil.rmtree(out, ignore_errors=True)  # reruns must not append
            result.write_parquet(out)
            summary["output"] = out
        else:
            summary["rows"] = result.count()
    elif isinstance(result, (bytes, bytearray)):
        out = spec.get("output", "sketch.bin")
        with open(out, "wb") as f:
            f.write(result)
        summary["output"] = out
    else:
        summary["result"] = result if not isinstance(result, dict) else {
            k: (v if not isinstance(v, (bytes, bytearray)) else f"<{len(v)} bytes>")
            for k, v in result.items()
        }
    return summary


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--spec", required=True, help="path to job spec JSON")
    args = ap.parse_args(argv)
    with open(args.spec) as f:
        spec = json.load(f)
    summary = run(spec)
    print(json.dumps(summary, default=str))
    import ray

    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
