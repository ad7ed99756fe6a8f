"""Per-partition checkpointing with lineage + metrics.

Industrializes the reference's dump/load distribution story
(/root/reference/README.md:157-176: partition externally → local sketch
→ dump() → ship → merge): a long job over many input shards folds each
shard to partial-sketch parquet under the checkpoint dir, records a
lineage manifest entry (input files, row count, wall time, rows/s,
output file), and the final merge runs over the partial files. A re-run
skips every shard whose manifest entry is complete — for HLL/Bloom the
idempotent max/or merge would even forgive double-folding, but the
skip is *exactly-once*, which CMS/KLL/t-digest require
(IDEMPOTENT_MERGE=False; SURVEY.md §7 "hard parts").

Partial files are written atomically (tmp + rename) so a crash mid-shard
never leaves a corrupt "complete" entry.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional, Sequence, Union

__all__ = ["CheckpointedSketchJob", "CheckpointedWrite"]


class CheckpointedWrite:
    """Per-shard resumable parquet WRITE with lineage — the flagship
    curation sink's checkpoint (VERDICT r02 item 9; the sketch-job twin
    above covers fold jobs).

    Each input shard (a sorted chunk of input files) is transformed and
    written to its own partition directory atomically (tmp + rename);
    the manifest records the shard's input files, a caller-supplied
    **decisions fingerprint**, row counts, wall time and throughput. A
    re-run skips every shard whose manifest entry matches BOTH its
    current input files AND the current fingerprint.

    The fingerprint is how global coupling stays correct: curation's
    per-row keep/drop decisions depend on corpus-wide state (dedup
    keep-sets, near-dup components), so a changed input must invalidate
    *every* shard, not just the changed one — the caller hashes its
    broadcast decision state into the fingerprint and gets exactly that
    (regression-tested like the sketch job's changed-input case)."""

    def __init__(self, out_dir: str, shard_files_per_task: int = 8):
        self.out_dir = out_dir
        self.group = shard_files_per_task
        os.makedirs(os.path.join(out_dir, "shards"), exist_ok=True)
        self.manifest_path = os.path.join(out_dir, "manifest.jsonl")

    def _load_manifest(self) -> dict[str, dict]:
        done = {}
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                for line in f:
                    if line.strip():
                        e = json.loads(line)
                        done[e["shard_id"]] = e
        return done

    def manifest(self) -> list[dict]:
        return list(self._load_manifest().values())

    def _shards(self, input_files: Sequence[str]) -> list[tuple[str, list[str]]]:
        files = sorted(input_files)
        return [(f"shard-{i // self.group:05d}", files[i: i + self.group])
                for i in range(0, len(files), self.group)]

    def run(self, input_files: Sequence[str], transform, fingerprint: str,
            partition_cols: Optional[Sequence[str]] = None) -> list[str]:
        """Transform + write every shard (skipping completed ones).
        ``transform(ds) -> ds`` must be a pure per-shard row transform —
        all cross-shard state must be captured by ``fingerprint``.
        Returns the current input's shard output directories (stale
        shards from earlier, larger inputs are simply not returned)."""
        import shutil

        import ray.data

        done = self._load_manifest()
        skipped = 0
        outs = []
        for shard_id, files in self._shards(input_files):
            out_dir = os.path.join(self.out_dir, "shards", shard_id)
            outs.append(out_dir)
            e = done.get(shard_id)
            if (e and e.get("input_files") == files
                    and e.get("fingerprint") == fingerprint):
                skipped += 1
                continue
            t0 = time.perf_counter()
            ds = ray.data.read_parquet(files)
            out = transform(ds)
            tmp_dir = out_dir + ".tmp"
            shutil.rmtree(tmp_dir, ignore_errors=True)  # stale crash debris
            if partition_cols:
                out.write_parquet(tmp_dir, partition_cols=list(partition_cols))
            else:
                out.write_parquet(tmp_dir)
            n_out = ray.data.read_parquet(tmp_dir).count()
            shutil.rmtree(out_dir, ignore_errors=True)  # unrecorded publish
            os.replace(tmp_dir, out_dir)
            wall = time.perf_counter() - t0
            self._append_manifest({
                "shard_id": shard_id,
                "input_files": files,
                "fingerprint": fingerprint,
                "rows_out": n_out,
                "wall_sec": round(wall, 3),
                "rows_per_sec": round(n_out / wall) if wall > 0 else None,
                "output": out_dir,
                "ts": time.time(),
            })
        self.last_skipped = skipped
        return outs

    def _append_manifest(self, entry: dict) -> None:
        with open(self.manifest_path, "a") as f:
            f.write(json.dumps(entry) + "\n")


class CheckpointedSketchJob:
    def __init__(
        self,
        ckpt_dir: str,
        sketch: str,
        on: Union[str, Sequence[str]],
        by: Optional[Sequence[str]] = None,
        shard_files_per_task: int = 8,
        **params,
    ):
        self.ckpt_dir = ckpt_dir
        self.sketch = sketch
        self.on = on
        self.by = list(by) if by else None
        self.group = shard_files_per_task
        self.params = params
        os.makedirs(os.path.join(ckpt_dir, "partials"), exist_ok=True)
        self.manifest_path = os.path.join(ckpt_dir, "manifest.jsonl")

    # -- lineage ---------------------------------------------------------
    def _load_manifest(self) -> dict[str, dict]:
        done = {}
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                for line in f:
                    if line.strip():
                        e = json.loads(line)
                        done[e["shard_id"]] = e
        return done

    def _append_manifest(self, entry: dict) -> None:
        with open(self.manifest_path, "a") as f:
            f.write(json.dumps(entry) + "\n")

    def manifest(self) -> list[dict]:
        return list(self._load_manifest().values())

    # -- run -------------------------------------------------------------
    def _shards(self, input_files: Sequence[str]) -> list[tuple[str, list[str]]]:
        files = sorted(input_files)
        out = []
        for i in range(0, len(files), self.group):
            chunk = files[i : i + self.group]
            out.append((f"shard-{i // self.group:05d}", chunk))
        return out

    def run(self, input_files: Sequence[str], merge_mode: str = "bytes"):
        """Fold every shard (skipping completed ones), then merge all
        partials. Returns the merged result (grouped Dataset or global
        value, same contract as sketch_aggregate)."""
        import ray.data

        from ..agg import SketchMerge, fold_partials

        done = self._load_manifest()
        for shard_id, files in self._shards(input_files):
            if shard_id in done:
                # shard ids are positional (sorted-file chunks): if the
                # input file set changed between runs, a stale entry
                # would silently stand in for a shard now covering
                # DIFFERENT files. Validate lineage; on mismatch re-fold
                # this shard (replacing the entry) instead of skipping.
                if done[shard_id].get("input_files") == files:
                    continue
            t0 = time.perf_counter()
            ds = ray.data.read_parquet(files)
            partials = fold_partials(ds, self.sketch, self.on, self.by, **self.params)
            out_file = os.path.join(self.ckpt_dir, "partials", shard_id)
            tmp_dir = out_file + ".tmp"
            # a crash mid-write leaves a stale tmp dir; writing into it
            # would APPEND duplicate partials — always start clean
            import shutil

            shutil.rmtree(tmp_dir, ignore_errors=True)
            partials.write_parquet(tmp_dir)
            # atomic publish: parquet dir rename. A crash between publish
            # and manifest append leaves out_file populated but
            # unrecorded — the re-fold is authoritative, so clear it
            # (rename onto a non-empty dir raises ENOTEMPTY otherwise).
            shutil.rmtree(out_file, ignore_errors=True)
            os.replace(tmp_dir, out_file)
            wall = time.perf_counter() - t0
            n_rows = sum(
                e["partial_n"]
                for e in ray.data.read_parquet(out_file)
                .select_columns(["partial_n"])
                .take_all()
            )
            self._append_manifest({
                "shard_id": shard_id,
                "input_files": files,
                "rows_folded": n_rows,
                "wall_sec": round(wall, 3),
                "rows_per_sec": round(n_rows / wall) if wall > 0 else None,
                "output": out_file,
                "sketch": self.sketch,
                "ts": time.time(),
            })

        import glob as _glob

        # merge only the partials of the CURRENT input's shards — a
        # manifest from a previously-larger input may hold extra entries
        current_ids = {sid for sid, _ in self._shards(input_files)}
        partial_files = []
        for sid, e in self._load_manifest().items():
            if sid not in current_ids:
                continue
            partial_files.extend(sorted(_glob.glob(os.path.join(e["output"], "*.parquet"))))
        merged_ds = ray.data.read_parquet(partial_files)
        agg = SketchMerge(self.sketch, on="sketch", mode=merge_mode, **self.params)
        if self.by:
            return merged_ds.groupby(self.by).aggregate(agg)
        return merged_ds.aggregate(agg)[agg.name]
