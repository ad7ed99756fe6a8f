"""Incremental dedup indexes (stages/incremental.py): persisted
exact-fingerprint and MinHash-band indexes, classification of incoming
batches against them, appends, and param round-trips."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture()
def tmp_index_dir(tmp_path):
    return str(tmp_path / "idx")


def _mk_ds(rows):
    import ray.data

    return ray.data.from_pandas(pd.DataFrame(rows)).repartition(2)


class TestExactDedupIndex:
    def test_statuses_match_brute_force(self, ray_session, tmp_index_dir):
        from raysketch.stages.incremental import ExactDedupIndex

        old = _mk_ds({"doc_id": [0, 2, 4, 6],
                      "text": ["alpha", "beta", "gamma", "alpha"]})
        idx = ExactDedupIndex(tmp_index_dir, num_shards=8).build(old)
        # new batch: 11=old content, 13=new content, 15=dup of 13,
        # 17=new content, 19=old content AND dup-in-batch of nothing
        new = _mk_ds({"doc_id": [11, 13, 15, 17, 19],
                      "text": ["beta", "delta", "delta", "epsilon",
                               "alpha"]})
        out = idx.dedup_new(new).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        got = dict(zip(out["doc_id"], out["status"]))
        assert got == {11: "dup_of_index", 13: "kept", 15: "dup_in_batch",
                       17: "kept", 19: "dup_of_index"}

    def test_index_dup_beats_batch_dup(self, ray_session, tmp_index_dir):
        """Content both in the index and duplicated within the batch is
        dup_of_index for EVERY batch occurrence (matches the SQL CASE
        order of the incremental_dedup_docs oracle)."""
        from raysketch.stages.incremental import ExactDedupIndex

        idx = ExactDedupIndex(tmp_index_dir, num_shards=4).build(
            _mk_ds({"doc_id": [2], "text": ["x"]}))
        out = idx.dedup_new(
            _mk_ds({"doc_id": [1, 3], "text": ["x", "x"]})).to_pandas()
        assert set(out["status"]) == {"dup_of_index"}

    def test_append_extends_index(self, ray_session, tmp_index_dir):
        from raysketch.stages.incremental import ExactDedupIndex

        idx = ExactDedupIndex(tmp_index_dir, num_shards=8).build(
            _mk_ds({"doc_id": [0], "text": ["alpha"]}))
        idx.append(_mk_ds({"doc_id": [100], "text": ["zeta"]}))
        out = idx.dedup_new(
            _mk_ds({"doc_id": [201, 203], "text": ["zeta", "eta"]})
        ).to_pandas()
        got = dict(zip(out["doc_id"], out["status"]))
        assert got == {201: "dup_of_index", 203: "kept"}

    def test_load_roundtrip(self, ray_session, tmp_index_dir):
        from raysketch.stages.incremental import ExactDedupIndex

        ExactDedupIndex(tmp_index_dir, text_col="text", id_col="doc_id",
                        num_shards=16).build(
            _mk_ds({"doc_id": [0], "text": ["alpha"]}))
        idx = ExactDedupIndex.load(tmp_index_dir)
        assert idx.num_shards == 16 and idx.exists()
        out = idx.dedup_new(
            _mk_ds({"doc_id": [1], "text": ["alpha"]})).to_pandas()
        assert list(out["status"]) == ["dup_of_index"]

    def test_large_ids_survive(self, ray_session, tmp_index_dir):
        """Ids beyond 2^53 must come back exact (the int64→float64
        pandas upcast trap: no nulls may enter the group frames)."""
        from raysketch.stages.incremental import ExactDedupIndex

        big = (1 << 60) + 7
        idx = ExactDedupIndex(tmp_index_dir, num_shards=4).build(
            _mk_ds({"doc_id": [big], "text": ["alpha"]}))
        out = idx.dedup_new(
            _mk_ds({"doc_id": [big + 1], "text": ["beta"]})).to_pandas()
        assert out["doc_id"].dtype == np.int64
        assert list(out["doc_id"]) == [big + 1]
        assert list(out["status"]) == ["kept"]


def test_incremental_turns_matches_brute_force(ray_session):
    """incremental_dedup_turns' distributed per-status counts equal an
    independent pandas classification of the same split (dup_of_index =
    text anywhere in the corpus side; dup_in_batch = otherwise not the
    smallest turn_id for its text within the batch)."""
    import pyarrow.parquet as pq

    from raysketch.hashing import murmur64a
    from raysketch.keys import canonical_flat_bytes
    from raysketch.pipelines.queries import (incremental_dedup_turns,
                                             transcripts_ds)
    from raysketch.stages.dedup import _splitmix64

    sf = "/root/testdata/sf0.001"
    got = incremental_dedup_turns(sf)

    df = transcripts_ds(sf, columns=["conv_id", "turn_idx", "text"]) \
        .to_pandas()
    import pyarrow as pa

    data, off = canonical_flat_bytes(pa.array(df["conv_id"], type=pa.string()))
    h = murmur64a(data, off)
    is_new = (_splitmix64(h) % np.uint64(10)) == 0
    tid = (((h >> np.uint64(1)) & ~np.uint64(0xFFF))
           | (df["turn_idx"].to_numpy().astype(np.uint64)
              & np.uint64(0xFFF))).astype(np.int64)
    corpus_texts = set(df["text"][~is_new])
    batch = pd.DataFrame({"tid": tid[is_new],
                          "text": df["text"][is_new].to_numpy()})
    min_tid = batch.groupby("text")["tid"].transform("min")
    status = np.where(
        batch["text"].isin(corpus_texts), "dup_of_index",
        np.where(batch["tid"] == min_tid, "kept", "dup_in_batch"))
    exp = pd.Series(status).value_counts().to_dict()
    assert dict(zip(got["status"], got["n"])) == exp


class TestMinHashBandIndex:
    CORPUS = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "a completely different document about distributed data systems",
        "ray data pipelines stream arrow record batches through workers",
        "minhash signatures approximate jaccard similarity of shingle sets",
        "parquet files store columnar data with row group statistics",
    ]

    def test_exact_copies_matched(self, ray_session, tmp_index_dir):
        from raysketch.stages.incremental import MinHashBandIndex

        old = _mk_ds({"doc_id": list(range(len(self.CORPUS))),
                      "text": self.CORPUS})
        idx = MinHashBandIndex(tmp_index_dir, num_shards=8).build(old)
        # copies of docs 0 and 2, plus one unrelated new doc
        new = _mk_ds({
            "doc_id": [1000, 1002, 1999],
            "text": [self.CORPUS[0], self.CORPUS[2],
                     "zzz entirely novel content qqq xyzzy plugh"],
        })
        out = idx.match_new(new, threshold=0.9).to_pandas()
        got = set(zip(out["new_id"], out["old_id"]))
        assert (1000, 0) in got and (1002, 2) in got
        assert not any(a == 1999 for a, _ in got)
        est = dict(zip(zip(out["new_id"], out["old_id"]),
                       out["est_jaccard"]))
        assert est[(1000, 0)] == 1.0 and est[(1002, 2)] == 1.0

    def test_near_copy_matched_below_exact(self, ray_session,
                                           tmp_index_dir):
        from raysketch.stages.incremental import MinHashBandIndex

        long_doc = " ".join(self.CORPUS) * 3
        old = _mk_ds({"doc_id": [7], "text": [long_doc]})
        idx = MinHashBandIndex(tmp_index_dir, num_shards=8).build(old)
        out = idx.match_new(
            _mk_ds({"doc_id": [1007], "text": [long_doc + " extra tail"]}),
            threshold=0.5).to_pandas()
        got = dict(zip(zip(out["new_id"], out["old_id"]),
                       out["est_jaccard"]))
        assert (1007, 7) in got
        assert 0.5 <= got[(1007, 7)] <= 1.0

    def test_no_match_empty_result(self, ray_session, tmp_index_dir):
        from raysketch.stages.incremental import MinHashBandIndex

        idx = MinHashBandIndex(tmp_index_dir, num_shards=8).build(
            _mk_ds({"doc_id": [0], "text": [self.CORPUS[0]]}))
        out_ds = idx.match_new(
            _mk_ds({"doc_id": [1000],
                    "text": ["totally unrelated words here friend"]}),
            threshold=0.9)
        # Ray's to_pandas drops columns on 0-row datasets; the schema
        # itself must stay intact
        assert out_ds.schema().names == ["new_id", "old_id", "est_jaccard"]
        assert len(out_ds.to_pandas()) == 0

    def test_query_planted_recall(self, ray_session):
        """incremental_minhash_dedup's docstring promise: every planted
        perturbed doc is recalled against its source id."""
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from raysketch.pipelines.queries import incremental_minhash_dedup

        sf = "/root/testdata/sf0.001"
        out = incremental_minhash_dedup(sf)
        t = pq.read_table(f"{sf}/documents.parquet",
                          columns=["doc_id", "text"])
        ids = t.column("doc_id").to_numpy()
        ln = pc.utf8_length(t.column("text")).to_numpy()
        planted = ids[(ids % 10 == 0) & (ln >= 200)]
        assert len(planted) > 0
        got = set(zip(out["new_id"], out["old_id"]))
        missing = [int(d) for d in planted
                   if (int(d) + 10_000_000, int(d)) not in got]
        assert missing == []

    def test_load_uses_stored_hash_family(self, ray_session,
                                          tmp_index_dir):
        """A reloaded index must sign new docs with the ORIGINAL seed —
        signatures from a different family never agree."""
        from raysketch.stages.incremental import MinHashBandIndex

        MinHashBandIndex(tmp_index_dir, seed=123, num_shards=8).build(
            _mk_ds({"doc_id": [0], "text": [self.CORPUS[3]]}))
        idx = MinHashBandIndex.load(tmp_index_dir)
        assert idx.seed == 123
        out = idx.match_new(
            _mk_ds({"doc_id": [1000], "text": [self.CORPUS[3]]}),
            threshold=0.99).to_pandas()
        assert set(zip(out["new_id"], out["old_id"])) == {(1000, 0)}


class TestCompaction:
    """VERDICT r03 item 4: shard file counts stay bounded across
    ingests; classification / match output identical before and after
    compaction; compaction is idempotent."""

    def test_exact_bounded_files_and_identical_output(self, ray_session,
                                                      tmp_index_dir):
        import glob as g
        import os

        from raysketch.stages.incremental import ExactDedupIndex

        idx = ExactDedupIndex(tmp_index_dir, num_shards=4).build(
            _mk_ds({"doc_id": [0, 1], "text": ["seed a", "seed b"]}))
        # 10 ingest batches with auto_compact bounding files per shard
        for i in range(10):
            idx.append(_mk_ds({"doc_id": [100 + 2 * i, 101 + 2 * i],
                               "text": [f"batch {i} x", f"batch {i} y"]}),
                       auto_compact=3)
        counts = [len(g.glob(os.path.join(d, "*.parquet")))
                  for d in g.glob(os.path.join(tmp_index_dir, "shards",
                                               "shard=*"))]
        assert counts and max(counts) <= 4  # bound: auto_compact + 1

        probe = _mk_ds({"doc_id": [900, 901, 902],
                        "text": ["batch 3 x", "seed b", "novel text"]})
        before = idx.dedup_new(probe).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        idx.compact(max_files_per_shard=1)
        counts2 = [len(g.glob(os.path.join(d, "*.parquet")))
                   for d in g.glob(os.path.join(tmp_index_dir, "shards",
                                                "shard=*"))]
        assert max(counts2) == 1
        after = idx.dedup_new(probe).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(before, after)
        assert dict(zip(after["doc_id"], after["status"])) == {
            900: "dup_of_index", 901: "dup_of_index", 902: "kept"}
        # idempotent: a second run is a no-op
        assert idx.compact(max_files_per_shard=1) == {}

    def test_minhash_append_compact_identical_matches(self, ray_session,
                                                      tmp_index_dir):
        import glob as g
        import os

        from raysketch.stages.incremental import MinHashBandIndex

        base = ("the quick brown fox jumps over the lazy dog and then "
                "wanders far away into the quiet hills tonight")
        idx = MinHashBandIndex(tmp_index_dir, num_shards=4,
                               num_perms=32, num_bands=8).build(
            _mk_ds({"doc_id": [1, 2],
                    "text": [base, "completely different content here "
                                   "about ships and harbors and tides"]}))
        for i in range(6):
            idx.append(_mk_ds({"doc_id": [100 + i],
                               "text": [f"filler document number {i} "
                                        f"with its own words {i}"]}),
                       auto_compact=3)
        probe = _mk_ds({"doc_id": [999], "text": [base + " extra"]})
        before = idx.match_new(probe, threshold=0.5).to_pandas() \
            .sort_values(["new_id", "old_id"]).reset_index(drop=True)
        idx.compact(max_files_per_shard=1)
        for sub in ("bands", "sigs"):
            counts = [len(g.glob(os.path.join(d, "*.parquet")))
                      for d in g.glob(os.path.join(tmp_index_dir, sub,
                                                   "*=*"))]
            assert counts and max(counts) == 1
        after = idx.match_new(probe, threshold=0.5).to_pandas() \
            .sort_values(["new_id", "old_id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(before, after)
        assert (before["old_id"] == 1).any()  # the near-dup is found


class TestRendezvousAssign:
    def test_grow_moves_only_into_new_shard(self):
        import numpy as np

        from raysketch.stages.incremental import rendezvous_assign

        keys = np.arange(100_000, dtype=np.uint64)
        a8 = rendezvous_assign(keys, 8)
        a9 = rendezvous_assign(keys, 9)
        moved = a8 != a9
        # EXACT structural property, not statistical
        assert (a9[moved] == 8).all()
        # expected 1/9, binomial 6-sigma band
        f = moved.mean()
        assert abs(f - 1 / 9) < 6 * np.sqrt((1 / 9) * (8 / 9) / len(keys))

    def test_shrink_reassigns_only_lost_shard(self):
        import numpy as np

        from raysketch.stages.incremental import rendezvous_assign

        keys = np.arange(100_000, dtype=np.uint64)
        a7 = rendezvous_assign(keys, 7)
        a8 = rendezvous_assign(keys, 8)
        m = a7 != a8
        assert (a8[m] == 7).all()

    def test_balanced_and_deterministic(self):
        import numpy as np

        from raysketch.stages.incremental import rendezvous_assign

        rng = np.random.default_rng(0)
        keys = rng.integers(0, 2**63, size=50_000).astype(np.uint64)
        a = rendezvous_assign(keys, 10)
        b = rendezvous_assign(keys, 10)
        assert (a == b).all()
        frac = np.bincount(a, minlength=10) / len(keys)
        assert (np.abs(frac - 0.1) < 0.01).all()
