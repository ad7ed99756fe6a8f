"""Incremental corpus deduplication against a persisted fingerprint
index — the "dedup ingest batch N+1 against everything already seen"
operation a rolling 100-TB pipeline needs (a full-corpus re-dedup per
ingest is O(corpus) per batch; the index makes each batch O(batch +
touched shards)).

Two index families, both laid out as hash-sharded hive-partitioned
parquet so an incoming batch prunes its read to the shards its own
keys hash into (the IVFIndex nprobe pattern, stages/similarity.py):

- :class:`ExactDedupIndex` — one (content_hash, content_len, doc id)
  row per distinct content, sharded by content hash. ``dedup_new``
  classifies an incoming batch into kept / dup_of_index / dup_in_batch
  with ONE bucket exchange over fixed-width fingerprint rows (bodies
  never shuffle), exactly the exact_dedup_keep_ids shape
  (dedup.py:63) extended with an index side.
- :class:`MinHashBandIndex` — LSH band rows (band, bucket, id) sharded
  by bucket hash plus the full signatures sharded by id hash.
  ``match_new`` signs the incoming batch with the INDEX's stored
  permutation parameters (a signature is only comparable under the
  same hash family), bucket-joins new band rows against the touched
  band shards, and verifies candidates with the distributed pair
  scorer (dedup.py:score_pairs_distributed) over the union of new
  signatures and the candidate-pruned signature shards.

Appends are new parquet files dropped into the existing shard dirs
(readers min-reduce per fingerprint, so multi-file shards are
harmless); the meta marker is written LAST so a torn build is
indistinguishable from no index.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa

from ..hashing import murmur64a
from ..keys import canonical_flat_bytes
from .dedup import (
    MinHasher,
    _dedupe_pair_rows,
    _make_minhash_band_rows,
    _splitmix64,
    minhash_agreement_scorer,
    score_pairs_distributed,
)

__all__ = ["ExactDedupIndex", "MinHashBandIndex"]

_I64MAX = np.iinfo(np.int64).max


def _fingerprint_rows(text_col: str, id_col: str, num_shards: int):
    """text batch → (id, content_hash, content_len, shard) rows; shard
    is a pure function of the hash so both index and incoming sides
    derive it identically (never trusted from hive partition types)."""

    def add_hash(t: pa.Table) -> pa.Table:
        data, offsets = canonical_flat_bytes(t.column(text_col))
        h = murmur64a(data, offsets)
        ln = offsets[1:] - offsets[:-1]
        shard = (_splitmix64(h) % np.uint64(num_shards)).astype(np.int64)
        return pa.table({id_col: t.column(id_col),
                         "content_hash": pa.array(h.astype(np.int64)),
                         "content_len": pa.array(ln),
                         "shard": pa.array(shard)})

    return add_hash


def _touched_shards(hashed_ds, col: str = "shard") -> list[int]:
    """Distinct shard values of an incoming batch — per-batch
    np.unique partials (≤ num_shards ints each) folded on the driver;
    no shuffle, bounded by batches × num_shards."""

    def partial(t: pa.Table) -> pa.Table:
        u = np.unique(t.column(col).to_numpy(zero_copy_only=False))
        return pa.table({col: pa.array(u)})

    parts = hashed_ds.map_batches(partial, batch_format="pyarrow") \
        .take_all()
    return sorted({int(r[col]) for r in parts})


def _shard_files(root: str, key: str, shards: list[int]) -> list[str]:
    files: list[str] = []
    for s in shards:
        files.extend(sorted(glob.glob(
            os.path.join(root, f"{key}={s}", "*.parquet"))))
    return files


def _compact_shard_dirs(root: str, reduce_fn, max_files: int,
                        columns: list[str] | None = None) -> dict:
    """Compact every ``key=K`` shard dir under ``root`` holding more
    than ``max_files`` parquet files into ONE file (VERDICT r03 item 4:
    append-per-ingest grows shard file counts — and open/footer costs —
    unboundedly).

    One Ray task per shard (shards are independent). Idempotent and
    crash-safe WITHOUT a commit log: the output name is a pure function
    (sha256) of the input file set, so a re-run after any interruption
    converges to the same file; and readers tolerate the torn state
    (compacted file + not-yet-deleted inputs) because every consumer
    min-reduces per fingerprint group / dedupes pair rows — duplicated
    rows change nothing. Single-writer discipline (no concurrent
    append) is assumed, as for append itself.

    ``reduce_fn(table) -> table`` collapses the concatenated shard
    rows (min-per-fingerprint, distinct-rows, …). Returns a summary
    manifest {shard_dir: files_before} for the shards compacted, and
    writes it to ``root/../compactions.json`` (observability only —
    correctness never depends on it)."""
    import hashlib

    import pyarrow.parquet as pq
    import ray.data

    shard_dirs = sorted(d for d in glob.glob(os.path.join(root, "*=*"))
                        if os.path.isdir(d))
    todo = [d for d in shard_dirs
            if len(glob.glob(os.path.join(d, "*.parquet"))) > max_files]
    if not todo:
        return {}

    def compact_one(t: pa.Table) -> pa.Table:
        outs = []
        for d in t.column("dir").to_pylist():
            files = sorted(glob.glob(os.path.join(d, "*.parquet")))
            if len(files) <= max_files:
                continue
            tbl = pa.concat_tables([
                pq.read_table(f, columns=columns) for f in files])
            reduced = reduce_fn(tbl)
            token = hashlib.sha256(
                "\n".join(os.path.basename(f) for f in files)
                .encode()).hexdigest()[:12]
            out = os.path.join(d, f"compact-{token}.parquet")
            pq.write_table(reduced, out + ".tmp")
            os.replace(out + ".tmp", out)
            for f in files:
                if os.path.abspath(f) != os.path.abspath(out):
                    os.remove(f)
            outs.append((d, len(files)))
        return pa.table({
            "dir": pa.array([d for d, _ in outs], type=pa.string()),
            "files_before": pa.array([n for _, n in outs],
                                     type=pa.int64())})

    stats = ray.data.from_items([{"dir": d} for d in todo]) \
        .map_batches(compact_one, batch_format="pyarrow",
                     batch_size=1).take_all()
    manifest = {r["dir"]: int(r["files_before"]) for r in stats}
    mpath = os.path.join(os.path.dirname(root.rstrip("/")),
                         "compactions.json")
    prior = []
    if os.path.exists(mpath):
        with open(mpath) as f:
            prior = json.load(f)
    prior.append(manifest)
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(prior, f)
    os.replace(tmp, mpath)
    return manifest


class ExactDedupIndex:
    """Persisted exact-content fingerprint index.

    Layout::

        index_dir/shards/shard=K/*.parquet   (id, content_hash, content_len)
        index_dir/meta.json                  (written last = completeness)
    """

    def __init__(self, index_dir: str, text_col: str = "text",
                 id_col: str = "doc_id", num_shards: int = 64):
        self.index_dir = index_dir
        self.text_col = text_col
        self.id_col = id_col
        self.num_shards = num_shards

    # -- lifecycle ---------------------------------------------------
    @property
    def _meta_path(self) -> str:
        return os.path.join(self.index_dir, "meta.json")

    @property
    def _shards_dir(self) -> str:
        return os.path.join(self.index_dir, "shards")

    def exists(self) -> bool:
        return os.path.exists(self._meta_path)

    @classmethod
    def load(cls, index_dir: str) -> "ExactDedupIndex":
        with open(os.path.join(index_dir, "meta.json")) as f:
            meta = json.load(f)
        return cls(index_dir, text_col=meta["text_col"],
                   id_col=meta["id_col"], num_shards=meta["num_shards"])

    def build(self, ds) -> "ExactDedupIndex":
        """Fingerprint ``ds`` and write one min-id row per distinct
        content into hash-sharded parquet (rebuild from scratch)."""
        import shutil

        import pandas as pd

        def min_in_shard(g: pd.DataFrame) -> pd.DataFrame:
            ch = g["content_hash"].to_numpy()
            cl = g["content_len"].to_numpy()
            di = g[self.id_col].to_numpy()
            order = np.lexsort((di, cl, ch))
            ch, cl, di = ch[order], cl[order], di[order]
            new_grp = np.r_[True, (ch[1:] != ch[:-1]) | (cl[1:] != cl[:-1])]
            starts = np.nonzero(new_grp)[0]
            if not len(di):
                return pd.DataFrame({self.id_col: di, "content_hash": ch,
                                     "content_len": cl, "shard": di})
            return pd.DataFrame({
                self.id_col: np.minimum.reduceat(di, starts),
                "content_hash": ch[starts],
                "content_len": cl[starts],
                "shard": g["shard"].to_numpy()[order][starts]})

        rows = ds.map_batches(
            _fingerprint_rows(self.text_col, self.id_col, self.num_shards),
            batch_format="pyarrow",
        ).groupby("shard").map_groups(min_in_shard, batch_format="pandas")
        shutil.rmtree(self._shards_dir, ignore_errors=True)
        os.makedirs(self._shards_dir, exist_ok=True)
        rows.write_parquet(self._shards_dir, partition_cols=["shard"])
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"kind": "exact", "text_col": self.text_col,
                       "id_col": self.id_col,
                       "num_shards": self.num_shards}, f)
        os.replace(tmp, self._meta_path)
        return self

    def append(self, ds, auto_compact: int | None = 16
               ) -> "ExactDedupIndex":
        """Add a new (already deduplicated) batch: fingerprint rows are
        written as ADDITIONAL files in the existing shard dirs — no
        rewrite of prior data; readers tolerate multi-file shards.
        Shards exceeding ``auto_compact`` files are compacted after the
        write (None disables)."""
        rows = ds.map_batches(
            _fingerprint_rows(self.text_col, self.id_col, self.num_shards),
            batch_format="pyarrow")
        rows.write_parquet(self._shards_dir, partition_cols=["shard"])
        if auto_compact is not None:
            self.compact(max_files_per_shard=auto_compact)
        return self

    def compact(self, max_files_per_shard: int = 1) -> dict:
        """Rewrite every shard holding more than ``max_files_per_shard``
        files into ONE hash-sorted file with one min-id row per distinct
        (content_hash, content_len) — classification output is
        IDENTICAL before/after (test-locked); see
        :func:`_compact_shard_dirs` for the idempotence/crash-safety
        argument."""
        id_col = self.id_col

        def reduce_fn(t: pa.Table) -> pa.Table:
            ch = t.column("content_hash").to_numpy(zero_copy_only=False)
            cl = t.column("content_len").to_numpy(zero_copy_only=False)
            di = t.column(id_col).to_numpy(zero_copy_only=False)
            order = np.lexsort((di, cl, ch))
            ch, cl, di = ch[order], cl[order], di[order]
            new_grp = np.r_[True, (ch[1:] != ch[:-1]) | (cl[1:] != cl[:-1])] \
                if len(ch) else np.zeros(0, dtype=bool)
            starts = np.nonzero(new_grp)[0]
            return pa.table({
                id_col: pa.array(np.minimum.reduceat(di, starts)
                                 if len(di) else di),
                "content_hash": pa.array(ch[starts] if len(ch) else ch),
                "content_len": pa.array(cl[starts] if len(cl) else cl)})

        return _compact_shard_dirs(
            self._shards_dir, reduce_fn, max_files_per_shard,
            columns=[id_col, "content_hash", "content_len"])

    # -- query -------------------------------------------------------
    def dedup_new(self, new_ds):
        """Classify an incoming batch against the index AND itself.

        Returns a Dataset of (id_col, status) with status one of
        ``kept`` (first sight of this content anywhere),
        ``dup_of_index`` (content already ingested) or ``dup_in_batch``
        (new content, but a smaller id in the same batch has it).

        Shape: fingerprint the batch, read ONLY the index shards the
        batch's hashes touch, one hash-bucket exchange over the union,
        vectorized per-(hash,len) group classification."""
        import pandas as pd
        import ray.data

        id_col = self.id_col

        new_rows = new_ds.map_batches(
            _fingerprint_rows(self.text_col, self.id_col, self.num_shards),
            batch_format="pyarrow").materialize()
        touched = _touched_shards(new_rows)
        files = _shard_files(self._shards_dir, "shard", touched)

        def tag(side_index: bool):
            def fn(t: pa.Table) -> pa.Table:
                h = t.column("content_hash").to_numpy(zero_copy_only=False)
                shard = (_splitmix64(h.astype(np.uint64))
                         % np.uint64(self.num_shards)).astype(np.int64)
                return pa.table({
                    id_col: t.column(id_col).combine_chunks().cast(pa.int64()),
                    "content_hash": t.column("content_hash"),
                    "content_len": t.column("content_len"),
                    "shard": pa.array(shard),
                    "__idx": pa.array(
                        np.full(t.num_rows, side_index, dtype=bool)),
                })
            return fn

        sides = new_rows.map_batches(tag(False), batch_format="pyarrow")
        if files:
            idx_rows = ray.data.read_parquet(
                files, columns=[id_col, "content_hash", "content_len"])
            sides = sides.union(
                idx_rows.map_batches(tag(True), batch_format="pyarrow"))

        def classify(g: pd.DataFrame) -> pd.DataFrame:
            ch = g["content_hash"].to_numpy()
            cl = g["content_len"].to_numpy()
            di = g[id_col].to_numpy()
            ix = g["__idx"].to_numpy()
            order = np.lexsort((di, ix, cl, ch))
            ch, cl, di, ix = ch[order], cl[order], di[order], ix[order]
            new_grp = np.r_[True, (ch[1:] != ch[:-1]) | (cl[1:] != cl[:-1])]
            gid = np.cumsum(new_grp) - 1
            starts = np.nonzero(new_grp)[0]
            in_index = np.logical_or.reduceat(ix, starts) if len(ix) \
                else np.zeros(0, dtype=bool)
            min_new = np.minimum.reduceat(
                np.where(ix, _I64MAX, di), starts) if len(di) \
                else np.zeros(0, dtype=np.int64)
            new_mask = ~ix
            g_new = gid[new_mask]
            d_new = di[new_mask]
            status = np.where(
                in_index[g_new], "dup_of_index",
                np.where(d_new == min_new[g_new], "kept", "dup_in_batch"))
            return pd.DataFrame({id_col: d_new, "status": status})

        return sides.groupby("shard").map_groups(
            classify, batch_format="pandas")


class MinHashBandIndex:
    """Persisted MinHash-LSH band index for incremental NEAR-duplicate
    detection.

    Layout::

        index_dir/bands/bshard=K/*.parquet   (band, bucket, id)
        index_dir/sigs/sshard=K/*.parquet    (id, minhash)
        index_dir/meta.json                  (hash-family params; last)
    """

    def __init__(self, index_dir: str, text_col: str = "text",
                 id_col: str = "doc_id", num_perms: int = 128,
                 num_bands: int = 32, shingle_k: int = 5,
                 seed: int = 1, mode: str = "kperm",
                 num_shards: int = 64):
        self.index_dir = index_dir
        self.text_col = text_col
        self.id_col = id_col
        self.num_perms = num_perms
        self.num_bands = num_bands
        self.shingle_k = shingle_k
        self.seed = seed
        self.mode = mode
        self.num_shards = num_shards

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.index_dir, "meta.json")

    def exists(self) -> bool:
        return os.path.exists(self._meta_path)

    @classmethod
    def load(cls, index_dir: str) -> "MinHashBandIndex":
        with open(os.path.join(index_dir, "meta.json")) as f:
            m = json.load(f)
        return cls(index_dir, **{k: m[k] for k in (
            "text_col", "id_col", "num_perms", "num_bands", "shingle_k",
            "seed", "mode", "num_shards")})

    def _sign(self, ds):
        from ..util import auto_concurrency

        return ds.map_batches(
            MinHasher,
            fn_constructor_args=(self.text_col, self.id_col,
                                 self.num_perms, self.shingle_k),
            fn_constructor_kwargs={"seed": self.seed, "mode": self.mode},
            batch_format="pyarrow", concurrency=auto_concurrency())

    def _band_rows(self, sig_ds):
        # salt column is unused here; bshard (bucket hash % shards) is
        # the partition/exchange key
        rows = sig_ds.map_batches(
            _make_minhash_band_rows(self.id_col, "minhash",
                                    self.num_bands, self.num_shards),
            batch_format="pyarrow")

        def reshard(t: pa.Table) -> pa.Table:
            b = t.column("bucket").to_numpy(zero_copy_only=False)
            return pa.table({
                "band": t.column("band"),
                "bucket": t.column("bucket"),
                self.id_col: t.column(self.id_col),
                "bshard": pa.array(
                    (b.astype(np.uint64) % np.uint64(self.num_shards))
                    .astype(np.int64)),
            })

        return rows.map_batches(reshard, batch_format="pyarrow")

    def build(self, ds) -> "MinHashBandIndex":
        import shutil

        sigs = self._sign(ds).materialize()
        bands_dir = os.path.join(self.index_dir, "bands")
        sigs_dir = os.path.join(self.index_dir, "sigs")
        shutil.rmtree(bands_dir, ignore_errors=True)
        shutil.rmtree(sigs_dir, ignore_errors=True)
        os.makedirs(self.index_dir, exist_ok=True)
        self._band_rows(sigs).write_parquet(
            bands_dir, partition_cols=["bshard"])

        id_col, num_shards = self.id_col, self.num_shards

        def sig_shard(t: pa.Table) -> pa.Table:
            i = t.column(id_col).to_numpy(zero_copy_only=False)
            return t.append_column("sshard", pa.array(
                (_splitmix64(i.astype(np.uint64)) % np.uint64(num_shards))
                .astype(np.int64)))

        sigs.map_batches(sig_shard, batch_format="pyarrow") \
            .write_parquet(sigs_dir, partition_cols=["sshard"])
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"kind": "minhash", "text_col": self.text_col,
                       "id_col": self.id_col, "num_perms": self.num_perms,
                       "num_bands": self.num_bands,
                       "shingle_k": self.shingle_k, "seed": self.seed,
                       "mode": self.mode, "num_shards": self.num_shards}, f)
        os.replace(tmp, self._meta_path)
        return self

    def append(self, ds, auto_compact: int | None = 16
               ) -> "MinHashBandIndex":
        """Add a new (already matched/deduplicated) batch: band rows
        and signatures are written as ADDITIONAL files in the existing
        shard dirs (the ExactDedupIndex.append pattern); shards
        exceeding ``auto_compact`` files are compacted after the write
        (None disables)."""
        sigs = self._sign(ds).materialize()
        self._band_rows(sigs).write_parquet(
            os.path.join(self.index_dir, "bands"),
            partition_cols=["bshard"])

        id_col, num_shards = self.id_col, self.num_shards

        def sig_shard(t: pa.Table) -> pa.Table:
            i = t.column(id_col).to_numpy(zero_copy_only=False)
            return t.append_column("sshard", pa.array(
                (_splitmix64(i.astype(np.uint64)) % np.uint64(num_shards))
                .astype(np.int64)))

        sigs.map_batches(sig_shard, batch_format="pyarrow") \
            .write_parquet(os.path.join(self.index_dir, "sigs"),
                           partition_cols=["sshard"])
        if auto_compact is not None:
            self.compact(max_files_per_shard=auto_compact)
        return self

    def compact(self, max_files_per_shard: int = 1) -> dict:
        """Compact band shards (distinct (band, bucket, id) rows,
        bucket-sorted) and signature shards (id-sorted; last row per id
        wins — ids are unique by the append contract, so this only
        drops torn-compaction duplicates). Match output identical
        before/after (test-locked)."""
        import pandas as pd

        id_col = self.id_col

        def reduce_bands(t: pa.Table) -> pa.Table:
            df = t.select(["band", "bucket", id_col]).to_pandas()
            df = df.drop_duplicates().sort_values(
                ["bucket", "band", id_col])
            return pa.Table.from_pandas(df, preserve_index=False)

        def reduce_sigs(t: pa.Table) -> pa.Table:
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            order = np.argsort(ids, kind="stable")
            keep = np.r_[True, ids[order][1:] != ids[order][:-1]] \
                if len(ids) else np.zeros(0, dtype=bool)
            return t.take(pa.array(order[keep]))

        out = _compact_shard_dirs(
            os.path.join(self.index_dir, "bands"), reduce_bands,
            max_files_per_shard, columns=["band", "bucket", id_col])
        out.update(_compact_shard_dirs(
            os.path.join(self.index_dir, "sigs"), reduce_sigs,
            max_files_per_shard, columns=[id_col, "minhash"]))
        return out

    def match_new(self, new_ds, threshold: float = 0.8,
                  max_bucket_side: int = 1000):
        """Near-dup matches of an incoming batch against the index.

        Incoming and indexed ids MUST be disjoint (the verify exchange
        keys payloads by id). Returns a Dataset of (new_id, old_id,
        est_jaccard) for estimated Jaccard ≥ ``threshold``.

        Candidates are bipartite per (band, bucket): new×old only —
        never new×new or old×old — capped at ``max_bucket_side`` rows
        per side per bucket (mega-buckets are duplicate cliques; the
        cap bounds the quadratic emit like lsh_candidate_pairs)."""
        import pandas as pd
        import ray.data

        id_col = self.id_col
        new_sigs = self._sign(new_ds).materialize()
        new_bands = self._band_rows(new_sigs).materialize()
        touched = _touched_shards(new_bands, "bshard")
        band_files = _shard_files(
            os.path.join(self.index_dir, "bands"), "bshard", touched)

        def tag(side_index: bool):
            def fn(t: pa.Table) -> pa.Table:
                b = t.column("bucket").to_numpy(zero_copy_only=False)
                return pa.table({
                    "band": t.column("band").combine_chunks().cast(pa.int32()),
                    "bucket": t.column("bucket"),
                    id_col: t.column(id_col).combine_chunks().cast(pa.int64()),
                    "bshard": pa.array(
                        (b.astype(np.uint64) % np.uint64(self.num_shards))
                        .astype(np.int64)),
                    "__idx": pa.array(
                        np.full(t.num_rows, side_index, dtype=bool)),
                })
            return fn

        sides = new_bands.map_batches(tag(False), batch_format="pyarrow")
        if band_files:
            sides = sides.union(ray.data.read_parquet(
                band_files, columns=["band", "bucket", id_col]
            ).map_batches(tag(True), batch_format="pyarrow"))

        def emit(g: pd.DataFrame) -> pd.DataFrame:
            bd = g["band"].to_numpy().astype(np.int64)
            bk = g["bucket"].to_numpy()
            di = g[id_col].to_numpy()
            ix = g["__idx"].to_numpy()
            order = np.lexsort((di, ix, bk, bd))
            bd, bk, di, ix = bd[order], bk[order], di[order], ix[order]
            new_grp = np.r_[True, (bd[1:] != bd[:-1]) | (bk[1:] != bk[:-1])]
            starts = np.nonzero(new_grp)[0]
            ends = np.r_[starts[1:], len(di)]
            out_a, out_b = [], []
            # within each (band,bucket): new rows sort before index rows
            # (ix False < True); cross-product the two sides
            n_idx = np.add.reduceat(ix.astype(np.int64), starts) \
                if len(ix) else []
            for s, e, ni in zip(starts, ends, n_idx):
                ni = int(ni)
                nn = (e - s) - ni
                if ni == 0 or nn == 0:
                    continue
                new_ids = di[s:s + min(nn, max_bucket_side)]
                old_ids = di[s + nn:s + nn + min(ni, max_bucket_side)]
                out_a.append(np.repeat(new_ids, len(old_ids)))
                out_b.append(np.tile(old_ids, len(new_ids)))
            if not out_a:
                return pd.DataFrame({
                    "id_a": pd.Series([], dtype="int64"),
                    "id_b": pd.Series([], dtype="int64")})
            return pd.DataFrame({"id_a": np.concatenate(out_a),
                                 "id_b": np.concatenate(out_b)})

        pairs = _dedupe_pair_rows(
            sides.groupby("bshard").map_groups(emit, batch_format="pandas"),
            {})

        pairs = pairs.materialize()
        if pairs.count() == 0:
            return ray.data.from_arrow(pa.table({
                "new_id": pa.array([], type=pa.int64()),
                "old_id": pa.array([], type=pa.int64()),
                "est_jaccard": pa.array([], type=pa.float64())}))

        # payload = new signatures ∪ candidate-touched signature shards
        num_shards = self.num_shards

        def old_shard_partials(t: pa.Table) -> pa.Table:
            i = t.column("id_b").to_numpy(zero_copy_only=False)
            s = (_splitmix64(i.astype(np.uint64)) % np.uint64(num_shards))
            return pa.table({"sshard": pa.array(
                np.unique(s).astype(np.int64))})

        old_shards = sorted({int(r["sshard"]) for r in pairs
                             .select_columns(["id_b"])
                             .map_batches(old_shard_partials,
                                          batch_format="pyarrow")
                             .take_all()})
        sig_files = _shard_files(
            os.path.join(self.index_dir, "sigs"), "sshard", old_shards)

        # parquet round-trips fixed_size_list as plain list — normalize
        # BOTH payload sides to list<uint64> so the union schema agrees
        def as_list(t: pa.Table) -> pa.Table:
            return pa.table({
                id_col: t.column(id_col),
                "minhash": t.column("minhash").combine_chunks()
                .cast(pa.list_(pa.uint64())),
            })

        payload = new_sigs.select_columns([id_col, "minhash"]) \
            .map_batches(as_list, batch_format="pyarrow")
        if sig_files:
            payload = payload.union(ray.data.read_parquet(
                sig_files, columns=[id_col, "minhash"]
            ).map_batches(as_list, batch_format="pyarrow"))

        scored = score_pairs_distributed(
            pairs, payload, id_col, "minhash", minhash_agreement_scorer,
            score_col="est_jaccard")

        def keep(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            m = pc.greater_equal(t.column("est_jaccard"), threshold)
            t = t.filter(m)
            return pa.table({"new_id": t.column("id_a"),
                             "old_id": t.column("id_b"),
                             "est_jaccard": t.column("est_jaccard")})

        return scored.map_batches(keep, batch_format="pyarrow")


def snapshot_diff(old_ds, new_ds, key_col: str = "doc_id",
                  text_col: str = "text", num_buckets: int = 64):
    """Row-level delta between two snapshots of a table keyed by
    ``key_col``: ``added`` (key only in the new snapshot), ``removed``
    (only in the old), ``changed`` (present in both, content differs).
    Unchanged rows are not emitted — output size is O(delta), the
    incremental-crawl shape (yesterday's dump vs today's).

    Scale shape: each side reduces to (key, content-murmur, byte-length,
    side) rows inside ``map_batches`` — bodies never shuffle — then ONE
    key-hash bucket exchange over the union and a vectorized
    lexsort/reduceat compare per bucket. Change detection on the
    (64-bit murmur, length) composite carries the same false-merge
    bound as :func:`raysketch.stages.dedup.exact_dedup_keep_ids`
    (a silently missed change needs two EQUAL-LENGTH texts with
    colliding murmurs, ~n²/2⁻⁶⁵ per length class).

    Precondition: ``key_col`` is unique within each snapshot (a primary
    key); duplicate keys on one side raise inside the bucket compare.
    """
    import pandas as pd

    def side_rows(side: int):
        def add(t: pa.Table) -> pa.Table:
            data, offsets = canonical_flat_bytes(t.column(text_col))
            h = murmur64a(data, offsets)
            ln = offsets[1:] - offsets[:-1]
            k = t.column(key_col).to_numpy(zero_copy_only=False) \
                .astype(np.uint64)
            b = (_splitmix64(k) % np.uint64(num_buckets)).astype(np.int64)
            return pa.table({
                key_col: t.column(key_col),
                "__h": pa.array(h.astype(np.int64)),
                "__len": pa.array(ln.astype(np.int64)),
                "__side": pa.array(np.full(len(t), side, dtype=np.int64)),
                "__b": pa.array(b)})
        return add

    def diff_bucket(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key_col].to_numpy()
        s = g["__side"].to_numpy()
        h = g["__h"].to_numpy()
        ln = g["__len"].to_numpy()
        order = np.lexsort((s, k))
        k, s, h, ln = k[order], s[order], h[order], ln[order]
        new_grp = np.r_[True, k[1:] != k[:-1]] if len(k) else \
            np.zeros(0, dtype=bool)
        starts = np.nonzero(new_grp)[0]
        cnt = np.diff(np.r_[starts, len(k)])
        if np.any(cnt > 2):
            raise ValueError(
                f"{key_col} is not unique within a snapshot")
        out_k: list[int] = []
        out_st: list[str] = []
        one = starts[cnt == 1]
        if len(one):
            only_new = s[one] == 1
            out_k.extend(k[one].tolist())
            out_st.extend(np.where(only_new, "added", "removed").tolist())
        two = starts[cnt == 2]
        if len(two):
            # sorted (key, side): row at `two` is old, `two+1` is new —
            # cnt==2 with unique-per-side keys forces one of each
            if np.any(s[two] != 0) or np.any(s[two + 1] != 1):
                raise ValueError(
                    f"{key_col} is not unique within a snapshot")
            ch = (h[two] != h[two + 1]) | (ln[two] != ln[two + 1])
            out_k.extend(k[two[ch]].tolist())
            out_st.extend(["changed"] * int(ch.sum()))
        return pd.DataFrame({key_col: np.asarray(out_k, dtype=np.int64),
                             "status": pd.array(out_st, dtype="string")})

    return (
        old_ds.map_batches(side_rows(0), batch_format="pyarrow")
        .union(new_ds.map_batches(side_rows(1), batch_format="pyarrow"))
        .groupby("__b")
        .map_groups(diff_bucket, batch_format="pandas")
    )


def rendezvous_assign(keys: "np.ndarray", n_shards: int) -> "np.ndarray":
    """Highest-random-weight (rendezvous) shard assignment (Thaler &
    Ravishankar '96): key k lands on argmax_s mix(hash(k), s). Unlike
    ``hash(k) % N``, growing N→N+1 moves ONLY the keys the new shard
    wins (an exact structural property, not an expectation — every
    other shard's argmax is unchanged by adding a candidate), and each
    key moves with probability 1/(N+1): the minimal-movement
    rebalancing rule that lets the hash-sharded state tables
    (incremental dedup indexes, rollups, inverted indexes) grow
    without rewriting every shard. Vectorized: one splitmix of the key
    vector, then one mix per shard — O(n·N) with no Python loop."""
    import numpy as np

    from .dedup import _splitmix64

    h = _splitmix64(np.asarray(keys, dtype=np.uint64))
    # per-shard seeds via an array splitmix (scalar uint64 ops warn on
    # the deliberate wraparound)
    seeds = _splitmix64(np.arange(n_shards, dtype=np.uint64)
                        + np.uint64(0x9E37))
    best = np.zeros(len(h), dtype=np.int64)
    best_w = _splitmix64(h ^ seeds[0])
    for s in range(1, n_shards):
        w = _splitmix64(h ^ seeds[s])
        m = w > best_w
        best[m] = s
        best_w[m] = w[m]
    return best
