"""Scale-pipeline stages: dedup (exact/minhash/simhash/embedding),
similarity (brute force + IVF), text stats, multimodal plumbing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raysketch.stages.dedup import (
    MinHasher,
    SimHasher,
    exact_dedup_keep_ids,
    lsh_candidate_pairs,
    minhash_dedup,
    ngram_jaccard,
    simhash_dedup,
    union_find_components,
)
from raysketch.stages.similarity import IVFIndex, brute_force_topk
from raysketch.stages.textstats import Fingerprint, LangId, QualityScore, TokenCount


def _docs_table():
    rng = np.random.default_rng(77)
    vocab = [f"word{i:03d}" for i in range(400)]
    texts = []
    for i in range(40):  # each doc: its own random 60-word bag → low cross-jaccard
        texts.append(" ".join(rng.choice(vocab, size=60)))
    # near-duplicate cluster: tiny edits of doc 0's text
    texts.append(texts[0].replace(texts[0][:7], "edited!", 1))
    texts.append(texts[0] + " extra tail words here")
    gold_dups = [0, 40, 41]
    # exact duplicate of doc 5
    texts.append(texts[5])
    return pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                     "text": pa.array(texts)}), gold_dups


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data

    tbl, gold = _docs_table()
    return ray.data.from_arrow(tbl).repartition(4), tbl, gold


class TestDedup:
    def test_exact(self, docs_ds):
        ds, tbl, _ = docs_ds
        keep = exact_dedup_keep_ids(ds).to_pandas()["doc_id"].tolist()
        texts = tbl.column("text").to_pylist()
        assert len(keep) == len(set(texts))
        assert 42 not in keep  # duplicate of doc 5
        assert 5 in keep

    def test_minhash_finds_near_dups(self, docs_ds):
        ds, tbl, gold = docs_ds
        out = minhash_dedup(ds, threshold=0.6)
        comp = dict(zip(out["doc_id"], out["component"]))
        assert comp.get(40) == comp.get(0) == 0
        assert comp.get(41) == 0
        # unrelated docs must not collapse into component 0
        merged = [k for k, v in comp.items() if v == 0]
        assert set(merged) <= {0, 40, 41, 42, 5}

    def test_minhash_jaccard_estimate_quality(self, docs_ds):
        ds, tbl, _ = docs_ds
        sigs = ds.map_batches(MinHasher(num_perms=128), batch_format="pyarrow").materialize()
        pairs = lsh_candidate_pairs(sigs).to_pandas()
        from raysketch.stages.dedup import estimate_pair_jaccard

        est = estimate_pair_jaccard(pairs, sigs)
        texts = tbl.column("text").to_pylist()
        for _, r in est.iterrows():
            true_j = ngram_jaccard(texts[int(r["id_a"])], texts[int(r["id_b"])])
            assert abs(r["est_jaccard"] - true_j) < 0.22

    def test_simhash(self, docs_ds):
        ds, tbl, gold = docs_ds
        out = simhash_dedup(ds, max_hamming=6)
        comp = dict(zip(out["doc_id"], out["component"]))
        # exact duplicate pair must land together (hamming 0)
        assert comp.get(42) == comp.get(5)

    def test_union_find(self):
        pairs = pd.DataFrame({"id_a": [1, 2, 10], "id_b": [2, 3, 11]})
        comp = union_find_components(pairs)
        assert comp[1] == comp[2] == comp[3] == 1
        assert comp[10] == comp[11] == 10

    def test_embedding_dedup(self, ray_session):
        import ray.data

        rng = np.random.default_rng(0)
        base = rng.standard_normal((30, 16)).astype(np.float32)
        base[7] = base[3] + 0.01 * rng.standard_normal(16)  # near-dup pair
        tbl = pa.table({
            "vec_id": pa.array(np.arange(30, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(base.reshape(-1)), 16
            ).cast(pa.list_(pa.float32())),
        })
        from raysketch.stages.dedup import embedding_dedup

        out = embedding_dedup(ray.data.from_arrow(tbl), threshold=0.98)
        comp = dict(zip(out["vec_id"], out["component"]))
        assert comp.get(7) == comp.get(3) == 3


class TestSimilarity:
    def test_brute_force_matches_numpy(self, ray_session):
        import ray.data

        rng = np.random.default_rng(1)
        mat = rng.standard_normal((200, 16))
        tbl = pa.table({
            "vec_id": pa.array(np.arange(200, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1)), 16
            ).cast(pa.list_(pa.float32())),
        })
        ds = ray.data.from_arrow(tbl).repartition(4)
        q = rng.standard_normal((2, 16))
        out = brute_force_topk(ds, q, k=5)
        matf = np.asarray(
            tbl.column("embedding").combine_chunks().flatten().to_numpy(zero_copy_only=False)
        ).reshape(200, 16).astype(np.float64)
        for qi in range(2):
            cos = (matf @ q[qi]) / (np.linalg.norm(matf, axis=1) * np.linalg.norm(q[qi]))
            expect = list(np.argsort(-cos)[:5])
            got = out[out["query_idx"] == qi].sort_values("rank")["vec_id"].tolist()
            assert got == expect

    def test_ivf_recall(self, ray_session, tmp_path):
        import ray.data

        rng = np.random.default_rng(2)
        mat = rng.standard_normal((500, 16)).astype(np.float64)
        tbl = pa.table({
            "vec_id": pa.array(np.arange(500, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1).astype(np.float32)), 16
            ).cast(pa.list_(pa.float32())),
        })
        ds = ray.data.from_arrow(tbl)
        idx = IVFIndex(str(tmp_path / "ivf"), n_centroids=8).build(ds, sample_size=256)
        q = mat[123] + 0.01  # near an existing vector
        got = idx.search(q, k=5, nprobe=4)
        assert 123 in got["vec_id"].tolist()
        reload = IVFIndex.load(str(tmp_path / "ivf"))
        got2 = reload.search(q, k=5, nprobe=4)
        assert got2["vec_id"].tolist() == got["vec_id"].tolist()

    @staticmethod
    def _pq_corpus(n=500, dim=32, seed=3):
        import ray.data

        rng = np.random.default_rng(seed)
        mat = rng.standard_normal((n, dim)).astype(np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        tbl = pa.table({
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1).astype(np.float32)), dim
            ).cast(pa.list_(pa.float32())),
        })
        # float32 storage is what search sees — score gold against it
        return ray.data.from_arrow(tbl).repartition(4), \
            mat.astype(np.float32).astype(np.float64)

    def test_pq_recall_and_code_size(self, ray_session, tmp_path):
        from raysketch.stages.similarity import PQIndex

        ds, mat = self._pq_corpus()
        idx = PQIndex(str(tmp_path / "pq"), n_coarse=8, n_subq=8).build(
            ds, sample_size=256)
        # codes are 8 bytes per vector vs 32×8 raw — assert the stored type
        import glob

        import pyarrow.parquet as papq

        f = sorted(glob.glob(str(tmp_path / "pq" / "buckets" / "**" /
                                 "*.parquet"), recursive=True))[0]
        sch = papq.read_schema(f)
        assert sch.field("code").type == pa.binary(8)
        q = mat[77] + 0.01
        gold = np.argsort(((mat - q) ** 2).sum(1), kind="stable")[:10]
        got = idx.search(q, k=10, nprobe=8, rerank=50, source_ds=ds)
        recall = len(set(got["vec_id"]) & set(gold.tolist())) / 10
        assert recall >= 0.8, recall
        assert got["vec_id"].iloc[0] == 77

    def test_pq_build_deterministic(self, ray_session, tmp_path):
        from raysketch.stages.similarity import PQIndex

        ds, _ = self._pq_corpus()
        a = PQIndex(str(tmp_path / "a"), n_coarse=4, n_subq=4).build(
            ds, sample_size=128)
        b = PQIndex(str(tmp_path / "b"), n_coarse=4, n_subq=4).build(
            ds, sample_size=128)
        assert np.array_equal(a.coarse, b.coarse)
        assert np.array_equal(a.codebooks, b.codebooks)
        import ray.data

        def codes_of(d):
            t = ray.data.read_parquet(str(d / "buckets")).to_pandas()
            t["code"] = t["code"].map(bytes)
            return t.sort_values("vec_id").reset_index(drop=True)

        ca, cb = codes_of(tmp_path / "a"), codes_of(tmp_path / "b")
        assert ca[["vec_id", "code"]].equals(cb[["vec_id", "code"]])

    def test_pq_full_rerank_equals_exact(self, ray_session, tmp_path):
        """nprobe = all buckets + rerank over EVERY indexed row ⇒ the
        rerank pass scores the whole corpus exactly — must equal the
        brute-force L2 top-k bit for bit."""
        from raysketch.stages.similarity import PQIndex

        ds, mat = self._pq_corpus(n=300)
        idx = PQIndex(str(tmp_path / "pq"), n_coarse=4, n_subq=8).build(
            ds, sample_size=128)
        q = np.ones(mat.shape[1])
        d2 = ((mat - q) ** 2).sum(1)
        gold = np.lexsort((np.arange(len(mat)), d2))[:10]
        got = idx.search(q, k=10, nprobe=4, rerank=300, source_ds=ds)
        assert got["vec_id"].tolist() == gold.tolist()

    def test_hnsw_exhaustive_equals_brute_force(self, ray_session,
                                                tmp_path):
        """Unbounded-beam search on the connected NSW graph visits
        every node ⇒ exact cosine top-k, bit-matching brute force —
        for several queries and regardless of the shard layout the
        mergeable build saw (VERDICT r04 item 9)."""
        from raysketch.stages.similarity import HNSWIndex, brute_force_topk

        ds, mat = self._pq_corpus(n=300)
        idx = HNSWIndex(str(tmp_path / "hnsw"), M=6, n_hubs=16).build(ds)
        rng = np.random.default_rng(9)
        qs = rng.standard_normal((5, mat.shape[1]))
        gold = brute_force_topk(ds, qs, k=10)
        for i in range(5):
            got = idx.search(qs[i], k=10, ef=1 << 30)
            exp = gold[gold["query_idx"] == i].sort_values("rank")
            assert got["vec_id"].tolist() == exp["vec_id"].tolist()
        # reload from disk → identical
        re = HNSWIndex.load(str(tmp_path / "hnsw"))
        got2 = re.search(qs[0], k=10, ef=1 << 30)
        exp0 = gold[gold["query_idx"] == 0].sort_values("rank")
        assert got2["vec_id"].tolist() == exp0["vec_id"].tolist()

    def test_hnsw_recall_vs_ivfpq(self, ray_session, tmp_path):
        """Recall comparison at matched read budgets (VERDICT r04
        item 9): HNSW ef=128 (walk reads ≤ ef·M ≈ 1k vectors; graph
        overhead M=8 int64 ≈ 64 B/node) vs IVF-PQ nprobe=4 of 8
        coarse buckets + rerank=50 (scans ~half the 8 B/vec codes and
        reads 50 full vectors). The graph index must not lose to the
        code-scan index at these operating points, and must be
        usefully accurate in absolute terms."""
        from raysketch.stages.similarity import (HNSWIndex, PQIndex,
                                                 brute_force_topk)

        ds, mat = self._pq_corpus(n=500)
        hnsw = HNSWIndex(str(tmp_path / "hnsw"), M=8, n_hubs=32).build(ds)
        pq = PQIndex(str(tmp_path / "pq"), n_coarse=8, n_subq=8).build(
            ds, sample_size=256)
        rng = np.random.default_rng(3)
        qs = rng.standard_normal((10, mat.shape[1]))
        gold = brute_force_topk(ds, qs, k=10)
        h_rec, p_rec = [], []
        for i in range(10):
            g = set(gold[gold["query_idx"] == i]["vec_id"])
            h = set(hnsw.search(qs[i], k=10, ef=128)["vec_id"])
            p = set(pq.search(qs[i], k=10, nprobe=4, rerank=50,
                              source_ds=ds)["vec_id"])
            h_rec.append(len(h & g) / 10)
            p_rec.append(len(p & g) / 10)
        assert np.mean(h_rec) >= np.mean(p_rec)
        assert np.mean(h_rec) >= 0.7


class TestTextStats:
    def test_token_count(self):
        t = pa.table({"text": ["hello world", "", "a b  c", "it's 42 ok!"]})
        out = TokenCount()(t)
        assert out.column("n_tokens_ws").to_pylist() == [2, 0, 3, 3]
        assert out.column("n_chars").to_pylist() == [11, 0, 6, 11]
        assert out.column("n_tokens_bpe").to_pylist()[0] >= 2

    def test_lang_id(self):
        t = pa.table({"text": [
            "the cat and the dog are in the house for the night",
            "der hund und die katze sind in einem schönen haus",
            "les enfants mangent des pommes dans le jardin ensemble",
            "",
        ]})
        out = LangId()(t)
        preds = out.column("lang_pred").to_pylist()
        assert preds[0] == "en"
        assert preds[1] == "de"
        assert preds[2] == "fr"
        assert preds[3] == "und"

    def test_quality(self):
        t = pa.table({"text": [
            "A normal sentence with reasonable words and structure in it.",
            "aaa aaa aaa aaa aaa aaa aaa aaa",  # repetitive
            "!!! ??? ### $$$ %%% ^^^ &&& ***",  # punctuation soup
            "",
        ]})
        out = QualityScore()(t)
        keep = out.column("quality_keep").to_pylist()
        assert keep[0] == 1.0
        assert keep[1] == 0.0  # max_word_rep = 1
        assert keep[2] == 0.0
        assert keep[3] == 0.0

    def test_vectorized_matches_row_reference(self):
        """The vectorized TokenCount/LangId/QualityScore paths must agree
        exactly with the per-row reference implementations (VERDICT r01
        item 3: outputs unchanged after vectorization)."""
        import random
        import re as _re
        import string

        from raysketch.stages.textstats import _STOPWORDS

        rng = random.Random(42)
        chars = string.ascii_letters + string.digits + " \t\n.,!?'-éàöü  "
        texts = ["", " ", "   ", "a", " a", "  a", "\t a", "a  ", "it's 42 ok!",
                 "hello   world\t", "don't stop me now", "a\tb", "a\t\tb",
                 "x \t y", "the the the cat", "aaa aaa aaa", "ererere here",
                 "schönen Tag noch", "café déjà vu", "word\n\nnext", "end  "]
        for _ in range(200):
            n = rng.randint(0, 60)
            texts.append("".join(rng.choice(chars) for _ in range(n)))
        t = pa.table({"text": texts})

        tc = TokenCount()
        got = tc(t).column("n_tokens_bpe").to_pylist()
        assert got == [tc.bpe_count_ref(s) for s in texts]

        li = LangId()
        out = li(t)
        for s, p, m in zip(texts, out.column("lang_pred").to_pylist(),
                           out.column("lang_margin").to_pylist()):
            ep, em = li.score_one_ref(s)
            assert p == ep and abs(m - em) < 1e-12, s

        word = _re.compile(r"[A-Za-z]+")
        stop = set(_STOPWORDS)
        out = QualityScore()(t)
        cols = {c: out.column(c).to_pylist()
                for c in ["stopword_ratio", "mean_word_len", "max_word_rep"]}
        for i, s in enumerate(texts):
            ws = word.findall(s.lower())
            if not ws:
                exp = {"stopword_ratio": 0.0, "mean_word_len": 0.0, "max_word_rep": 0.0}
            else:
                counts: dict[str, int] = {}
                for w in ws:
                    counts[w] = counts.get(w, 0) + 1
                exp = {"stopword_ratio": sum(w in stop for w in ws) / len(ws),
                       "mean_word_len": sum(map(len, ws)) / len(ws),
                       "max_word_rep": max(counts.values()) / len(ws)}
            for name, e in exp.items():
                assert abs(cols[name][i] - e) < 1e-12, (s, name)

    def test_fingerprint_normalized(self):
        t = pa.table({"text": ["Hello   World", "hello world", "different"]})
        out = Fingerprint()(t)
        fp = out.column("fingerprint").to_pylist()
        assert fp[0] == fp[1]
        assert fp[0] != fp[2]


class TestMultimodal:
    def test_pipeline_plumbing(self, ray_session):
        import ray.data

        from raysketch.stages.multimodal import (
            ImageDecode,
            ImageFeatures,
            ImageResize,
            make_fake_image_table,
        )

        tbl = make_fake_image_table(20, seed=1)
        ds = ray.data.from_arrow(tbl)
        out = (
            ds.map_batches(ImageDecode, batch_format="pyarrow", batch_size=8, concurrency=1)
            .map_batches(ImageResize, batch_size=8, concurrency=1)
            .map_batches(ImageFeatures, batch_size=8, concurrency=1)
        )
        rows = out.take_all()
        assert len(rows) == 20
        assert rows[0]["feature"].shape == (14,)  # 3 mean + 3 std + 8 hist

    def test_decode_deterministic(self):
        from raysketch.stages.multimodal import ImageDecode, make_fake_image_table

        tbl = make_fake_image_table(3, seed=5)
        a = ImageDecode()(tbl)
        b = ImageDecode()(tbl)
        assert all(np.array_equal(x, y) for x, y in zip(a["image"], b["image"]))

    def test_real_codec_gated(self):
        """WAV decodes for real (wavcodec); other formats raise an
        explicit NotImplementedError at decode time, never silently."""
        from raysketch.stages.multimodal import AudioFrameSample

        stage = AudioFrameSample(deterministic_fake=False)
        bad = pa.table({
            "item_id": pa.array([0], type=pa.int64()),
            "payload": pa.array([b"\x00" * 64], type=pa.binary()),
            "format": pa.array(["mp3"]),
        })
        with pytest.raises(NotImplementedError):
            stage(bad)

    def test_audio_frames(self, ray_session):
        import ray.data

        from raysketch.stages.multimodal import AudioFrameSample, make_fake_image_table

        tbl = make_fake_image_table(5, seed=2)
        out = ray.data.from_arrow(tbl).map_batches(
            AudioFrameSample, batch_format="pyarrow", batch_size=4, concurrency=1
        ).to_pandas()
        assert len(out) == 20
        assert set(out.columns) == {"item_id", "frame_idx", "energy"}


def test_minhash_exact_verify(docs_ds):
    from raysketch.stages.dedup import minhash_dedup

    ds, tbl, gold = docs_ds
    out = minhash_dedup(ds, threshold=0.6, verify="exact")
    comp = dict(zip(out["doc_id"], out["component"]))
    assert comp.get(40) == comp.get(0) == 0 and comp.get(41) == 0


def test_propagate_components_matches_union_find(ray_session):
    """Distributed min-label propagation agrees with driver union-find."""
    import ray.data

    from raysketch.stages.dedup import propagate_components, union_find_components

    pairs = pd.DataFrame({
        "id_a": [1, 2, 3, 10, 11, 20],
        "id_b": [2, 3, 4, 11, 12, 21],
    })
    ds = ray.data.from_pandas(pairs)
    labels = propagate_components(ds, rounds=6).to_pandas()
    got = dict(zip(labels["node"], labels["label"]))
    exp = union_find_components(pairs)
    for node, root in exp.items():
        assert got[node] == root, (node, got[node], root)


def test_propagate_components_large(ray_session):
    """Distributed propagation on a pair set big enough that per-row
    driver relabeling would be the bottleneck: 3000 components of mixed
    shapes (chains up to 6 hops, stars) ≈ 12k edges across many blocks.
    Must match union-find exactly (VERDICT r01 item 2)."""
    import ray.data

    from raysketch.stages.dedup import propagate_components, union_find_components

    rng = np.random.default_rng(7)
    id_a, id_b = [], []
    base = 0
    for c in range(3000):
        size = int(rng.integers(2, 7))
        nodes = base + rng.permutation(size)
        if c % 2:  # chain
            id_a.extend(nodes[:-1]); id_b.extend(nodes[1:])
        else:  # star
            id_a.extend([nodes[0]] * (size - 1)); id_b.extend(nodes[1:])
        base += size
    pairs = pd.DataFrame({"id_a": np.array(id_a, dtype=np.int64),
                          "id_b": np.array(id_b, dtype=np.int64)})
    ds = ray.data.from_pandas(pairs).repartition(8)
    labels = propagate_components(ds).to_pandas()
    got = dict(zip(labels["node"], labels["label"]))
    exp = union_find_components(pairs)
    assert len(got) == len(exp)
    for node, root in exp.items():
        assert got[node] == root, (node, got[node], root)


def test_propagate_components_stress_log_rounds(ray_session):
    """100× the _large test: 300k chain/star components (~1.2M nodes,
    ~1M edges) plus a 4096-node chain. Labels exact for every node,
    round count ≈ log₂(diameter) (pointer jumping — NOT O(diameter)),
    and the per-round label block count stays at its fixed coalesce
    target (VERDICT r04 item 7)."""
    import numpy as np
    import ray.data

    from raysketch.stages.dedup import (propagate_components,
                                        synthetic_component_edges)

    edges, expected = synthetic_component_edges(300_000, 4096)
    ds = ray.data.from_pandas(edges).repartition(16)
    stats: dict = {}
    labels = propagate_components(ds, stats=stats).to_pandas()
    got = labels.sort_values("node").reset_index(drop=True)
    exp = expected.sort_values("node").reset_index(drop=True)
    assert (got["node"].to_numpy() == exp["node"].to_numpy()).all()
    assert (got["label"].to_numpy() == exp["label"].to_numpy()).all()
    # pointer jumping: ⌈log₂ 4096⌉ = 12 doubling rounds + bounded
    # overhead (seed round + fixed-point confirmation)
    assert stats["rounds"] <= int(np.log2(4096)) + 4, stats
    assert stats["label_blocks"] <= 512


class TestDistributedComponents:
    """The distributed near-dup path (bucket-exchange verify +
    min-label propagation) must produce EXACTLY the driver path's
    components (VERDICT r02 item 1 'done' criterion)."""

    def test_minhash_estimate(self, docs_ds):
        ds, _, _ = docs_ds
        a = minhash_dedup(ds, threshold=0.6, components="driver")
        b = minhash_dedup(ds, threshold=0.6, components="distributed")
        pd.testing.assert_frame_equal(a, b)
        assert len(a) > 0  # the planted cluster must actually be found

    def test_minhash_exact_verify(self, docs_ds):
        ds, _, _ = docs_ds
        a = minhash_dedup(ds, threshold=0.6, verify="exact",
                          components="driver")
        b = minhash_dedup(ds, threshold=0.6, verify="exact",
                          components="distributed")
        pd.testing.assert_frame_equal(a, b)
        assert len(a) > 0

    def test_simhash(self, docs_ds):
        ds, _, _ = docs_ds
        a = simhash_dedup(ds, max_hamming=6, components="driver")
        b = simhash_dedup(ds, max_hamming=6, components="distributed")
        pd.testing.assert_frame_equal(a, b)
        assert len(a) > 0

    def test_embedding(self, ray_session):
        import ray.data

        from raysketch.stages.dedup import embedding_dedup

        rng = np.random.default_rng(0)
        base = rng.standard_normal((30, 16)).astype(np.float32)
        base[7] = base[3] + 0.01 * rng.standard_normal(16)
        tbl = pa.table({
            "vec_id": pa.array(np.arange(30, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(base.reshape(-1)), 16
            ).cast(pa.list_(pa.float32())),
        })
        ds = ray.data.from_arrow(tbl)
        a = embedding_dedup(ds, threshold=0.98, components="driver")
        b = embedding_dedup(ds, threshold=0.98, components="distributed")
        pd.testing.assert_frame_equal(a, b)
        comp = dict(zip(b["vec_id"], b["component"]))
        assert comp.get(7) == comp.get(3) == 3

    def test_score_pairs_matches_estimate(self, docs_ds):
        """score_pairs_distributed ≡ estimate_pair_jaccard on the same
        candidate pairs (same statistic, distributed attach)."""
        import ray.data

        from raysketch.stages.dedup import (estimate_pair_jaccard,
                                            minhash_agreement_scorer,
                                            score_pairs_distributed)

        ds, _, _ = docs_ds
        sigs = ds.map_batches(MinHasher(num_perms=128),
                              batch_format="pyarrow").materialize()
        pairs = lsh_candidate_pairs(sigs).to_pandas()
        assert len(pairs) > 0
        est = estimate_pair_jaccard(pairs, sigs) \
            .sort_values(["id_a", "id_b"]).reset_index(drop=True)
        scored = score_pairs_distributed(
            ray.data.from_pandas(pairs[["id_a", "id_b"]]), sigs,
            "doc_id", "minhash", minhash_agreement_scorer, "est_jaccard"
        ).to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        assert len(scored) == len(est)
        assert (scored["id_a"].to_numpy() == est["id_a"].to_numpy()).all()
        np.testing.assert_allclose(scored["est_jaccard"].to_numpy(),
                                   est["est_jaccard"].to_numpy(),
                                   rtol=0, atol=0)

    def test_ngram_join_distributed_verify(self, docs_ds):
        """The distributed exact-Jaccard verify returns the same pairs
        and similarities as the driver text-dict path."""
        from raysketch.stages.dedup import ngram_jaccard_join

        ds, _, _ = docs_ds
        a = ngram_jaccard_join(ds, k=3, threshold=0.5, unit="word")
        b = ngram_jaccard_join(ds, k=3, threshold=0.5, unit="word",
                               verify_driver_limit=0)
        pd.testing.assert_frame_equal(a, b)
        assert len(a) > 0


def test_propagate_components_long_chain(ray_session):
    """A 200-node chain: naive min-label propagation needs 199 rounds
    (the old 16-round cap silently mislabeled the tail) — pointer
    jumping + run-to-fixpoint must converge to the exact union-find
    answer in O(log n) rounds."""
    import ray.data

    from raysketch.stages.dedup import propagate_components, union_find_components

    n = 200
    ids = np.arange(n, dtype=np.int64)[::-1] + 1000  # descending, offset
    pairs = pd.DataFrame({"id_a": ids[:-1], "id_b": ids[1:]})
    ds = ray.data.from_pandas(pairs).repartition(4)
    labels = propagate_components(ds).to_pandas()
    exp = union_find_components(pairs)
    got = dict(zip(labels["node"], labels["label"]))
    assert len(got) == len(exp)
    for node, root in exp.items():
        assert got[node] == root == 1000, (node, got[node], root)


def test_minhash_oph_mode(docs_ds, ray_session):
    """OPH signatures: same LSH pipeline finds the gold near-dup cluster,
    and identical texts get identical signatures."""
    from raysketch.stages.dedup import MinHasher, lsh_candidate_pairs, union_find_components

    ds, tbl, gold = docs_ds
    sigs = ds.map_batches(MinHasher(num_perms=128, mode="oph"),
                          batch_format="pyarrow", concurrency=2).materialize()
    # identical texts (doc 5 == doc 42) → identical signatures
    df = sigs.to_pandas().set_index("doc_id")
    assert list(df.loc[5, "minhash"]) == list(df.loc[42, "minhash"])
    pairs = lsh_candidate_pairs(sigs, num_bands=32).to_pandas()
    comp = union_find_components(pairs)
    assert comp.get(40) == comp.get(0) == 0  # near-dup cluster found
    assert comp.get(42) == comp.get(5)


def test_minhash_oph_jaccard_quality():
    """OPH collision fraction tracks true Jaccard within densification
    noise on synthetic shingle sets."""
    import pyarrow as pa

    from raysketch.stages.dedup import MinHasher, ngram_jaccard

    rng = np.random.default_rng(9)
    vocab = [f"w{i:03d}" for i in range(300)]
    base = " ".join(rng.choice(vocab, 120))
    variants = [base]
    for frac in (0.05, 0.2, 0.5):
        n_edit = int(len(base) * frac)
        pos = rng.choice(len(base) - 1, n_edit, replace=False)
        chars = list(base)
        for p in pos:
            chars[p] = chr(97 + rng.integers(0, 26))
        variants.append("".join(chars))
    t = pa.table({"doc_id": pa.array(np.arange(len(variants), dtype=np.int64)),
                  "text": pa.array(variants)})
    out = MinHasher(num_perms=256, mode="oph")(t)
    sigs = np.asarray(out.column("minhash").combine_chunks().flatten()
                      .to_numpy(zero_copy_only=False)).reshape(len(variants), -1)
    for i in range(1, len(variants)):
        est = (sigs[0] == sigs[i]).mean()
        true = ngram_jaccard(variants[0].lower(), variants[i].lower())
        assert abs(est - true) < 0.15, (i, est, true)


class TestPngCodec:
    def test_roundtrip_all_shapes_and_filters(self):
        from raysketch.stages.pngcodec import decode_png, encode_png

        rng = np.random.default_rng(3)
        for shape in [(5, 7), (5, 7, 1), (9, 4, 3), (6, 6, 4)]:
            img = rng.integers(0, 256, size=shape, dtype=np.uint8)
            want = img[:, :, None] if img.ndim == 2 else img
            for ft in (0, 1, 2):
                got = decode_png(encode_png(img, filter_type=ft))
                assert got.shape == want.shape and np.array_equal(got, want), (shape, ft)

    def test_decode_paeth_and_average_filters(self):
        """Filters 3/4 aren't emitted by our encoder — craft scanlines by
        hand (forward-filtering with the spec formulas) and check the
        decoder inverts them."""
        import struct
        import zlib

        from raysketch.stages.pngcodec import _SIG, _chunk, decode_png

        rng = np.random.default_rng(4)
        h, w, ch = 6, 5, 3
        img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)

        def paeth(a, b, c):
            p = int(a) + int(b) - int(c)
            pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
            return a if pa_ <= pb and pa_ <= pc_ else (b if pb <= pc_ else c)

        lines = []
        prev = np.zeros((w, ch), dtype=np.uint8)
        for y in range(h):
            row = img[y]
            ft = 3 if y % 2 == 0 else 4
            out = np.zeros((w, ch), dtype=np.uint8)
            for x in range(w):
                for c in range(ch):
                    left = int(row[x - 1, c]) if x else 0
                    up = int(prev[x, c])
                    ul = int(prev[x - 1, c]) if x else 0
                    if ft == 3:
                        pred = (left + up) // 2
                    else:
                        pred = paeth(left, up, ul)
                    out[x, c] = (int(row[x, c]) - pred) % 256
            lines.append(bytes([ft]) + out.tobytes())
            prev = row
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        data = (_SIG + _chunk(b"IHDR", ihdr)
                + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
                + _chunk(b"IEND", b""))
        assert np.array_equal(decode_png(data), img)

    def test_corrupt_rejected(self):
        import pytest as _pytest

        from raysketch.stages.pngcodec import decode_png, encode_png

        with _pytest.raises(ValueError):
            decode_png(b"nope")
        good = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
        with _pytest.raises(ValueError):
            decode_png(good[:8] + good[20:])  # IHDR stripped

    def test_real_decode_stage(self, ray_session):
        """ImageDecode(deterministic_fake=False) really decodes PNG bytes
        through the actor-pool stage — pixels match the source images."""
        import ray.data

        from raysketch.stages.multimodal import ImageDecode, make_real_png_table
        from raysketch.stages.pngcodec import decode_png

        tbl = make_real_png_table(8, seed=11)
        out = ray.data.from_arrow(tbl).map_batches(
            ImageDecode(deterministic_fake=False), batch_format="pyarrow",
            batch_size=4, concurrency=1,
        ).to_pandas().sort_values("item_id")
        for i, img in zip(out["item_id"], out["image"]):
            want = decode_png(tbl.column("payload")[int(i)].as_py())
            assert np.array_equal(np.asarray(img), want)


class TestWinnowing:
    def test_shared_substring_guarantee(self):
        """Winnowing guarantee (SIGMOD'03): any shared substring of
        length >= window + k - 1 produces a shared fingerprint."""
        from raysketch.stages.textstats import WinnowingFingerprint

        import random
        rng = random.Random(11)
        shared = "this exact passage appears verbatim in both documents here"
        mk = lambda: " ".join(
            "".join(rng.choice("abcdefghij") for _ in range(5)) for _ in range(40)
        )
        t = pa.table({"text": [mk() + " " + shared + " " + mk(),
                               mk() + " " + shared + " " + mk(),
                               mk()]})
        wf = WinnowingFingerprint(k=5, window=8)
        fps = wf(t).column("fingerprints").to_pylist()
        a, b, c = set(fps[0]), set(fps[1]), set(fps[2])
        assert len(shared) >= wf.w + wf.k - 1
        assert a & b  # shared passage ⇒ shared fingerprints
        assert len(a & c) <= 1  # unrelated docs ~disjoint

    def test_deterministic_and_case_whitespace_normalized(self):
        from raysketch.stages.textstats import WinnowingFingerprint

        wf = WinnowingFingerprint()
        t = pa.table({"text": ["The Quick   Brown Fox goes somewhere else",
                               "the quick brown fox goes somewhere else", ""]})
        fps = wf(t).column("fingerprints").to_pylist()
        assert fps[0] == fps[1]
        assert fps[2] == []
        assert fps[0] == wf(t).column("fingerprints").to_pylist()[0]


class TestWavCodec:
    def test_roundtrip_all_depths(self):
        from raysketch.stages.wavcodec import decode_wav, encode_wav

        rng = np.random.default_rng(5)
        for bits, tol in [(8, 1 / 120), (16, 1e-4), (32, 1e-7)]:
            for ch in (1, 2):
                sig = rng.uniform(-0.9, 0.9, size=(500, ch))
                out, rate = decode_wav(encode_wav(sig, 8000, bits=bits))
                assert rate == 8000 and out.shape == (500, ch)
                assert np.abs(out - sig).max() < tol, (bits, ch)

    def test_corrupt_rejected(self):
        import pytest as _pytest

        from raysketch.stages.wavcodec import decode_wav, encode_wav

        with _pytest.raises(ValueError):
            decode_wav(b"not a wav at all")
        good = encode_wav(np.zeros(100))
        with _pytest.raises(ValueError):
            decode_wav(good[:20])  # data chunk truncated away

    def test_real_audio_stage(self, ray_session):
        """AudioFrameSample(deterministic_fake=False) decodes real WAV
        payloads through the actor stage: a pure sine's frame RMS must be
        ~amplitude/sqrt(2), and a silent file ~0."""
        import ray.data

        from raysketch.stages.multimodal import AudioFrameSample, make_real_wav_table
        from raysketch.stages.wavcodec import encode_wav

        tbl = make_real_wav_table(6, seed=3)
        out = ray.data.from_arrow(tbl).map_batches(
            AudioFrameSample(deterministic_fake=False), batch_format="pyarrow",
            batch_size=3, concurrency=1,
        ).to_pandas()
        assert len(out) == 24
        assert (out["energy"] > 0.05).all()  # sine+noise is never silent
        # direct check: pure 0.5-amplitude sine → RMS ≈ 0.3536
        t = np.arange(8000) / 8000.0
        pure = pa.table({
            "item_id": pa.array([0], type=pa.int64()),
            "payload": pa.array([encode_wav(0.5 * np.sin(2 * np.pi * 440 * t), 8000)],
                                type=pa.binary()),
            "format": pa.array(["wav"]),
        })
        e = AudioFrameSample(deterministic_fake=False)(pure)
        vals = e.column("energy").to_pylist()
        assert all(abs(v - 0.5 / np.sqrt(2)) < 0.01 for v in vals), vals


class TestJpegCodec:
    """Pure-numpy baseline JPEG (VERDICT r04 item 5): round-trip
    against fixtures encoded by the same module (JPEG is lossy — the
    lock is a bounded per-pixel error at high quality plus bitwise
    decode determinism), corrupt-stream rejection, and the
    ImageDecode path end-to-end."""

    @staticmethod
    def _gradient(h, w, seed=0):
        rng = np.random.default_rng(seed)
        yy, xx = np.mgrid[0:h, 0:w]
        return np.stack([
            (xx * 255 // max(w - 1, 1)).astype(np.uint8),
            (yy * 255 // max(h - 1, 1)).astype(np.uint8),
            rng.integers(0, 256, size=(h, w), dtype=np.uint8),
        ], axis=2)

    def test_roundtrip_error_bounds(self):
        from raysketch.stages.jpegcodec import decode_jpeg, encode_jpeg

        img = self._gradient(48, 64)
        smooth = img.copy()
        smooth[:, :, 2] = img[:, :, 0] // 2  # fully smooth channels
        for sub, bound in (("444", 4), ("420", 8)):
            out = decode_jpeg(encode_jpeg(smooth, quality=95,
                                          subsampling=sub))
            assert out.shape == smooth.shape
            err = np.abs(out.astype(int) - smooth.astype(int))
            assert err.max() <= bound, (sub, err.max())
        # decode is deterministic bit-for-bit
        b = encode_jpeg(img, quality=85, subsampling="420")
        assert decode_jpeg(b).tobytes() == decode_jpeg(b).tobytes()

    def test_grayscale_and_odd_sizes(self):
        from raysketch.stages.jpegcodec import decode_jpeg, encode_jpeg

        g = ((np.add.outer(np.arange(45) * 5, np.arange(61) * 3)) % 256) \
            .astype(np.uint8)
        out = decode_jpeg(encode_jpeg(g, quality=95))
        assert out.shape == (45, 61, 1)
        img = self._gradient(45, 61, seed=2)
        out = decode_jpeg(encode_jpeg(img, quality=90, subsampling="420"))
        assert out.shape == img.shape  # MCU padding cropped exactly

    def test_corrupt_and_unsupported_rejection(self):
        import pytest

        from raysketch.stages.jpegcodec import decode_jpeg, encode_jpeg

        b = encode_jpeg(self._gradient(16, 16), quality=90)
        with pytest.raises(ValueError):
            decode_jpeg(b"\xff\xd8garbage")
        with pytest.raises(ValueError):
            decode_jpeg(b[: len(b) // 2])  # truncated entropy stream
        with pytest.raises(ValueError):
            decode_jpeg(b"not a jpeg")
        # progressive (SOF2) must be rejected loudly, not mis-decoded
        prog = bytearray(b)
        sof = prog.find(b"\xff\xc0")
        prog[sof + 1] = 0xC2
        with pytest.raises(ValueError, match="SOF2"):
            decode_jpeg(bytes(prog))

    def test_restart_markers(self):
        """DRI/RSTn handling: splice a DRI segment is encoder-side
        absent, so craft the stream by re-encoding with manual restart
        injection is out of scope — instead verify the reader rejects
        a stream whose DRI promises restarts that never come."""
        import pytest

        from raysketch.stages.jpegcodec import decode_jpeg, encode_jpeg

        b = bytearray(encode_jpeg(self._gradient(32, 32), quality=90))
        sos = b.find(b"\xff\xda")
        dri = b"\xff\xdd\x00\x04\x00\x01"  # restart every 1 MCU
        b2 = bytes(b[:sos]) + dri + bytes(b[sos:])
        with pytest.raises(ValueError):
            decode_jpeg(b2)

    def test_image_decode_stage_jpeg(self, ray_session):
        """ImageDecode consumes real JPEG payloads end-to-end and the
        decoded pixels match decode_jpeg exactly."""
        import ray.data

        from raysketch.stages.jpegcodec import decode_jpeg
        from raysketch.stages.multimodal import (ImageDecode,
                                                 make_real_jpeg_table)

        t = make_real_jpeg_table(12, seed=5)
        out = ray.data.from_arrow(t).map_batches(
            ImageDecode, fn_constructor_kwargs={"deterministic_fake": False},
            batch_format="pyarrow", batch_size=4, concurrency=2,
        ).to_pandas().sort_values("item_id")
        payloads = t.column("payload").to_pylist()
        for _, row in out.iterrows():
            img = decode_jpeg(payloads[int(row["item_id"])])
            if img.shape[2] == 1:
                img = np.repeat(img, 3, axis=2)
            assert np.array_equal(row["image"], img)


from hypothesis import given, settings, strategies as st


class TestCodecProperties:
    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 24), w=st.integers(1, 24),
        ch=st.sampled_from([1, 3, 4]), ft=st.sampled_from([0, 1, 2]),
        seed=st.integers(0, 2**16),
    )
    def test_png_roundtrip_property(self, h, w, ch, ft, seed):
        from raysketch.stages.pngcodec import decode_png, encode_png

        img = np.random.default_rng(seed).integers(0, 256, size=(h, w, ch),
                                                   dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img, filter_type=ft)), img)

    @settings(max_examples=20, deadline=None)
    @given(
        h=st.integers(1, 40), w=st.integers(1, 40),
        sub=st.sampled_from(["444", "420"]),
        q=st.sampled_from([75, 90, 95]), seed=st.integers(0, 2**16),
    )
    def test_jpeg_roundtrip_property(self, h, w, sub, q, seed):
        """Any size (incl. non-MCU-aligned), any supported sampling /
        quality: decode(encode(x)) has the input's exact shape, never
        raises, and is decode-deterministic. (JPEG is lossy — exact
        pixel equality is not a property; the bounded-error lock lives
        in TestJpegCodec.)"""
        from raysketch.stages.jpegcodec import decode_jpeg, encode_jpeg

        img = np.random.default_rng(seed).integers(
            0, 256, size=(h, w, 3), dtype=np.uint8)
        b = encode_jpeg(img, quality=q, subsampling=sub)
        out = decode_jpeg(b)
        assert out.shape == img.shape
        assert decode_jpeg(b).tobytes() == out.tobytes()

    @settings(max_examples=25, deadline=None)
    @given(
        n=st.integers(1, 400), ch=st.integers(1, 3),
        bits=st.sampled_from([16, 32]), rate=st.sampled_from([8000, 44100]),
        seed=st.integers(0, 2**16),
    )
    def test_wav_roundtrip_property(self, n, ch, bits, rate, seed):
        from raysketch.stages.wavcodec import decode_wav, encode_wav

        sig = np.random.default_rng(seed).uniform(-1, 1, size=(n, ch))
        out, r = decode_wav(encode_wav(sig, rate, bits=bits))
        assert r == rate and out.shape == (n, ch)
        assert np.abs(out - sig).max() < (1e-4 if bits == 16 else 1e-6)


def test_empty_input_sweep(ray_session):
    """Every dedup/textstats entry point handles an empty table without
    raising (found: simhash_dedup KeyError'd on the empty pair frame)."""
    import ray.data

    from raysketch.agg import sketch_aggregate
    from raysketch.stages.dedup import (exact_dedup_keep_ids, minhash_dedup,
                                        simhash_dedup)
    from raysketch.stages.textstats import WinnowingFingerprint

    empty = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string()),
    }))
    assert sketch_aggregate(empty, "hll", on="text", mode="estimate") == 0
    assert exact_dedup_keep_ids(empty).to_pandas().empty
    assert minhash_dedup(empty).empty
    assert simhash_dedup(empty).empty
    t = pa.table({"text": pa.array([], type=pa.string())})
    for cls in (TokenCount, LangId, QualityScore, Fingerprint, WinnowingFingerprint):
        assert cls()(t).num_rows == 0


def test_propagate_components_63bit_ids(ray_session):
    """Code-review r02: null-padded int64 columns became float64 in
    pandas groups, corrupting ids beyond 2^53 (e.g. the hashed 63-bit
    doc ids conv-level dedup produces). Must match union-find exactly."""
    import ray.data

    from raysketch.stages.dedup import propagate_components, union_find_components

    big = np.array([2**62 + 3, 2**62 + 5, 2**62 + 7, 2**53 + 11, 2**53 + 13],
                   dtype=np.int64)
    pairs = pd.DataFrame({"id_a": big[[0, 1, 3]], "id_b": big[[1, 2, 4]]})
    lab = propagate_components(ray.data.from_pandas(pairs)).to_pandas()
    got = dict(zip(lab["node"], lab["label"]))
    exp = {int(k): int(v) for k, v in union_find_components(pairs).items()}
    assert got == exp


class TestNgramJaccardJoin:
    """Prefix-filter set-similarity join: candidates must be COMPLETE
    (the whole point vs LSH), output exactly the brute-force pair set."""

    def _brute(self, tbl, t, k=5):
        import itertools

        ids = tbl.column("doc_id").to_pylist()
        texts = tbl.column("text").to_pylist()
        out = []
        for (ia, ta), (ib, tb) in itertools.combinations(zip(ids, texts), 2):
            j = ngram_jaccard(ta or "", tb or "", k)
            # pairs where both sides have ≥1 gram (shorter docs emit none)
            if j >= t and len(ta or "") >= k and len(tb or "") >= k:
                out.append((min(ia, ib), max(ia, ib), j))
        return sorted(out)

    @pytest.mark.parametrize("thresh", [0.5, 0.8])
    def test_matches_brute_force_char(self, docs_ds, thresh):
        from raysketch.stages.dedup import ngram_jaccard_join

        ds, tbl, _ = docs_ds
        got = ngram_jaccard_join(ds, k=5, threshold=thresh, unit="char")
        got_t = sorted(zip(got["id_a"], got["id_b"], got["jaccard"]))
        assert got_t == self._brute(tbl, thresh)

    @pytest.mark.parametrize("thresh", [0.5, 0.8])
    def test_matches_brute_force_word(self, docs_ds, thresh):
        import itertools

        from raysketch.stages.dedup import ngram_jaccard_join, word_ngram_jaccard

        ds, tbl, _ = docs_ds
        got = ngram_jaccard_join(ds, k=3, threshold=thresh, unit="word")
        got_t = sorted(zip(got["id_a"], got["id_b"], got["jaccard"]))
        ids = tbl.column("doc_id").to_pylist()
        texts = tbl.column("text").to_pylist()
        exp = []
        for (ia, ta), (ib, tb) in itertools.combinations(zip(ids, texts), 2):
            j = word_ngram_jaccard(ta or "", tb or "", 3)
            if j >= thresh and len((ta or "").split(" ")) >= 3 \
                    and len((tb or "").split(" ")) >= 3:
                exp.append((min(ia, ib), max(ia, ib), j))
        assert got_t == sorted(exp)

    def test_short_null_and_dup_docs(self, ray_session):
        import ray.data

        from raysketch.stages.dedup import ngram_jaccard_join

        tbl = pa.table({
            "doc_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
            "text": pa.array(["abc", None, "the same long document text",
                              "the same long document text", "", "tiny"]),
        })
        out = ngram_jaccard_join(ray.data.from_arrow(tbl), threshold=0.8)
        # only the exact-dup pair survives; <k-word and null docs emit no shingles
        assert list(zip(out["id_a"], out["id_b"])) == [(3, 4)]
        assert out["jaccard"].tolist() == [1.0]

    def test_deterministic(self, docs_ds):
        from raysketch.stages.dedup import ngram_jaccard_join

        ds, _, _ = docs_ds
        a = ngram_jaccard_join(ds, threshold=0.6)
        b = ngram_jaccard_join(ds.repartition(7), threshold=0.6)
        pd.testing.assert_frame_equal(a, b)

    def test_empty(self, ray_session):
        import ray.data

        from raysketch.stages.dedup import ngram_jaccard_join

        empty = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], type=pa.int64()),
            "text": pa.array([], type=pa.string()),
        }))
        assert ngram_jaccard_join(empty).empty

    def test_fused_equals_shuffle_fallback(self, docs_ds):
        """broadcast_df_limit=0 forces the df-fold to early-exit and
        take the 3-shuffle prefix_filter_candidates path; the default
        fused broadcast path must produce the identical pair set."""
        from raysketch.stages.dedup import ngram_jaccard_join

        ds, _, _ = docs_ds
        fused = ngram_jaccard_join(ds, threshold=0.6)
        shuffled = ngram_jaccard_join(ds, threshold=0.6,
                                      broadcast_df_limit=0)
        pd.testing.assert_frame_equal(fused, shuffled)

    def test_prefix_candidates_df_modes_agree(self, docs_ds):
        from raysketch.stages.dedup import (_word_gram_rows,
                                            prefix_filter_candidates)

        ds, _, _ = docs_ds
        tok = ds.map_batches(_word_gram_rows("text", "doc_id", 3),
                             batch_format="pyarrow")
        a = prefix_filter_candidates(tok, "doc_id", 0.6,
                                     dedupe="driver",
                                     df_mode="broadcast").to_pandas()
        b = prefix_filter_candidates(tok, "doc_id", 0.6,
                                     dedupe="driver",
                                     df_mode="shuffle").to_pandas()
        pd.testing.assert_frame_equal(a, b)


class TestCrossDocGramStats:
    def test_matches_brute_force(self, docs_ds):
        """shared_frac per doc equals a pure-python distinct-shingle
        df count over the same single-space word split."""
        from raysketch.stages.dedup import crossdoc_gram_stats

        ds, tbl, _ = docs_ds
        out = crossdoc_gram_stats(ds, k=3).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        texts = dict(zip(tbl.column("doc_id").to_pylist(),
                         tbl.column("text").to_pylist()))
        grams = {}
        for i, s in texts.items():
            w = (s or "").split(" ")
            grams[i] = {tuple(w[j: j + 3]) for j in range(max(0, len(w) - 2))}
        df = {}
        for i, gs in grams.items():
            for g in gs:
                df[g] = df.get(g, 0) + 1
        for _, r in out.iterrows():
            gs = grams[int(r["doc_id"])]
            assert int(r["n_grams"]) == len(gs)
            exp_sh = sum(1 for g in gs if df[g] > 1)
            assert int(r["n_shared_grams"]) == exp_sh
            assert r["shared_frac"] == exp_sh / max(len(gs), 1)

    def test_fallback_matches_fused(self, docs_ds):
        """broadcast_df_limit=0 forces the 2-shuffle fallback; results
        must be identical to the fused zero-shuffle path."""
        import pandas as pd

        from raysketch.stages.dedup import crossdoc_gram_stats

        ds, _, _ = docs_ds
        a = crossdoc_gram_stats(ds, k=3).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        b = crossdoc_gram_stats(ds, k=3, broadcast_df_limit=0).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b[a.columns].astype(a.dtypes.to_dict()))


class TestY4MCodec:
    def test_roundtrip_mono_and_444(self):
        from raysketch.stages.y4mcodec import decode_y4m, encode_y4m

        rng = np.random.default_rng(5)
        luma = rng.integers(0, 256, size=(7, 12, 18), dtype=np.uint8)
        got, meta = decode_y4m(encode_y4m(luma))
        assert np.array_equal(got, luma)
        assert meta["colourspace"] == "mono" and meta["n_frames"] == 7
        yuv = rng.integers(0, 256, size=(3, 8, 10, 3), dtype=np.uint8)
        got, meta = decode_y4m(encode_y4m(yuv))
        assert np.array_equal(got, yuv[..., 0])  # luma plane returned
        assert meta["colourspace"] == "444"

    def test_420_layout(self):
        """Hand-built C420 stream (the ffmpeg default layout): luma plane
        + two quarter-size chroma planes per frame."""
        from raysketch.stages.y4mcodec import decode_y4m

        h, w = 4, 6
        luma = np.arange(2 * h * w, dtype=np.uint8).reshape(2, h, w)
        body = b""
        for f in luma:
            body += b"FRAME\n" + f.tobytes() + bytes((h // 2) * (w // 2)) * 2
        data = f"YUV4MPEG2 W{w} H{h} F30:1 Ip A1:1 C420jpeg\n".encode() + body
        got, meta = decode_y4m(data)
        assert np.array_equal(got, luma)
        assert meta["fps"] == "30:1"

    def test_corrupt_rejected(self):
        from raysketch.stages.y4mcodec import decode_y4m, encode_y4m

        with pytest.raises(ValueError):
            decode_y4m(b"RIFF not a y4m")
        good = encode_y4m(np.zeros((2, 4, 4), dtype=np.uint8))
        with pytest.raises(ValueError):
            decode_y4m(good[:-5])  # truncated frame payload
        with pytest.raises(ValueError):
            decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C999\n")

    @settings(max_examples=25, deadline=None)
    @given(n=st.integers(1, 10), h=st.integers(1, 16), w=st.integers(1, 16),
           seed=st.integers(0, 2**16))
    def test_roundtrip_property(self, n, h, w, seed):
        from raysketch.stages.y4mcodec import decode_y4m, encode_y4m

        luma = np.random.default_rng(seed).integers(
            0, 256, size=(n, h, w), dtype=np.uint8)
        got, _ = decode_y4m(encode_y4m(luma))
        assert np.array_equal(got, luma)


def test_real_video_stage(ray_session):
    """VideoFrameSample(deterministic_fake=False) decodes real Y4M clips
    through the actor stage: constant-luma clip → mean_luma exact and
    motion 0; alternating black/white frames → motion 255."""
    import ray.data

    from raysketch.stages.multimodal import VideoFrameSample, make_real_y4m_table
    from raysketch.stages.y4mcodec import encode_y4m

    tbl = make_real_y4m_table(6, seed=4)
    out = ray.data.from_arrow(tbl).map_batches(
        VideoFrameSample(deterministic_fake=False), batch_format="pyarrow",
        batch_size=3, concurrency=1,
    ).to_pandas()
    assert len(out) == 24
    assert (out["mean_luma"] > 0).all()
    # analytic: flat gray clip and a strobing clip
    flat = np.full((5, 8, 8), 77, dtype=np.uint8)
    strobe = np.zeros((4, 8, 8), dtype=np.uint8)
    strobe[1::2] = 255
    probe = pa.table({
        "item_id": pa.array([0, 1], type=pa.int64()),
        "payload": pa.array([encode_y4m(flat), encode_y4m(strobe)],
                            type=pa.binary()),
        "format": pa.array(["y4m", "y4m"]),
    })
    st_out = VideoFrameSample(n_samples=4, deterministic_fake=False)(probe).to_pandas()
    g0 = st_out[st_out.item_id == 0]
    assert (g0["mean_luma"] == 77.0).all() and (g0["motion"] == 0.0).all()
    g1 = st_out[st_out.item_id == 1]
    # samples hit frames 0,1,2,3 → luma alternates 0/255, motion jumps 255
    assert g1["mean_luma"].tolist() == [0.0, 255.0, 0.0, 255.0]
    assert g1["motion"].tolist() == [0.0, 255.0, 255.0, 255.0]
    with pytest.raises(NotImplementedError):
        VideoFrameSample(deterministic_fake=False)(pa.table({
            "item_id": pa.array([0], type=pa.int64()),
            "payload": pa.array([b"x"], type=pa.binary()),
            "format": pa.array(["mp4"]),
        }))


def test_vector_centroids(ray_session):
    """Combiner-pattern vector mean vs plain numpy ground truth, incl.
    multi-batch partial merging and the empty edge."""
    import ray.data

    from raysketch.stages.similarity import vector_centroids

    rng = np.random.default_rng(12)
    n, d = 500, 16
    labels = rng.integers(0, 7, size=n)
    mat = rng.standard_normal((n, d)).astype(np.float32)
    tbl = pa.table({
        "label": pa.array(labels.astype(np.int32)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(mat.ravel(), type=pa.float32()), d),
    })
    out = vector_centroids(ray.data.from_arrow(tbl).repartition(6),
                           by="label")
    assert out["label"].tolist() == sorted(set(labels.tolist()))
    for _, r in out.iterrows():
        sel = mat[labels == r["label"]].astype(np.float64)
        assert r["n"] == len(sel)
        np.testing.assert_allclose(r["centroid"], sel.mean(axis=0),
                                   rtol=0, atol=1e-12)
    empty = ray.data.from_arrow(tbl.slice(0, 0))
    assert vector_centroids(empty, by="label").empty


class TestOrderedPrefixSum:
    def test_matches_numpy_exclusive_cumsum(self, ray_session):
        import ray.data

        from raysketch.stages.scan import ordered_prefix_sum

        rng = np.random.default_rng(7)
        keys = rng.permutation(5000).astype(np.int64) * 3 + 11  # sparse keys
        vals = rng.integers(0, 100, size=5000).astype(np.int64)
        ds = ray.data.from_arrow(pa.table({"k": keys, "v": vals})) \
            .repartition(8)
        out = ordered_prefix_sum(ds, "k", "v").to_pandas() \
            .sort_values("k").reset_index(drop=True)
        order = np.argsort(keys)
        expect = np.concatenate(([0], np.cumsum(vals[order])[:-1]))
        assert (out["k"].to_numpy() == keys[order]).all()
        assert (out["prefix"].to_numpy() == expect).all()

    def test_partition_invariant(self, ray_session):
        import ray.data

        from raysketch.stages.scan import ordered_prefix_sum

        t = pa.table({"k": np.arange(1000, dtype=np.int64),
                      "v": (np.arange(1000, dtype=np.int64) % 17) + 1})
        a = ordered_prefix_sum(ray.data.from_arrow(t).repartition(2),
                               "k", "v", num_buckets=8).to_pandas() \
            .sort_values("k").reset_index(drop=True)
        b = ordered_prefix_sum(ray.data.from_arrow(t).repartition(13),
                               "k", "v", num_buckets=32).to_pandas() \
            .sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_empty(self, ray_session):
        import ray.data

        from raysketch.stages.scan import ordered_prefix_sum

        ds = ray.data.from_arrow(pa.table({
            "k": pa.array([], type=pa.int64()),
            "v": pa.array([], type=pa.int64())}))
        assert ordered_prefix_sum(ds, "k", "v").count() == 0

    def test_max_min_ops_and_carry(self, ray_session):
        import ray.data

        from raysketch.stages.scan import ordered_prefix_scan

        rng = np.random.default_rng(3)
        keys = rng.permutation(3000).astype(np.int64)
        vals = rng.integers(-500, 500, size=3000).astype(np.int64)
        tag = (keys % 5).astype(np.int64)
        ds = ray.data.from_arrow(pa.table({"k": keys, "v": vals,
                                           "t": tag})).repartition(7)
        for op, ufunc, ident in (
                ("max", np.maximum, np.iinfo(np.int64).min),
                ("min", np.minimum, np.iinfo(np.int64).max)):
            out = ordered_prefix_scan(ds, "k", "v", op=op,
                                      carry_cols=["t"]).to_pandas() \
                .sort_values("k").reset_index(drop=True)
            order = np.argsort(keys)
            expect = np.concatenate(
                ([ident], ufunc.accumulate(vals[order])[:-1]))
            assert (out["prefix"].to_numpy() == expect).all()
            assert (out["t"].to_numpy() == tag[order]).all()


class TestTfIdfTopTerms:
    def test_matches_pandas_brute_force(self, docs_ds):
        import ray

        from raysketch.stages.dedup import _fold_df_counts, _word_gram_rows
        from raysketch.stages.textstats import TopTfIdfTerms

        ds, tbl, _ = docs_ds
        tok = ds.map_batches(_word_gram_rows("text", "doc_id", 1),
                             batch_format="pyarrow")
        vocab = _fold_df_counts(tok, None)
        out = ds.map_batches(
            TopTfIdfTerms, fn_constructor_args=(ray.put(vocab),),
            batch_format="pyarrow", concurrency=2).to_pandas() \
            .sort_values(["doc_id", "rank"]).reset_index(drop=True)

        # brute force
        rows = []
        texts = dict(zip(tbl.column("doc_id").to_pylist(),
                         tbl.column("text").to_pylist()))
        df_map = {}
        tf_map = {}
        for i, s in texts.items():
            ws = [w for w in (s or "").split(" ") if w]
            tf = {}
            for w in ws:
                tf[w] = tf.get(w, 0) + 1
            tf_map[i] = tf
            for w in set(ws):
                df_map[w] = df_map.get(w, 0) + 1
        for i in sorted(texts):
            terms = sorted(tf_map[i].items(),
                           key=lambda kv: (-(kv[1] / df_map[kv[0]]), kv[0]))
            for r, (w, tf) in enumerate(terms[:3], 1):
                rows.append((i, w, tf, df_map[w], r))
        expect = pd.DataFrame(rows, columns=["doc_id", "term", "tf",
                                             "df", "rank"])
        pd.testing.assert_frame_equal(out, expect, check_dtype=False)


class TestSortedPartitionedWrite:
    def test_layout_is_globally_sorted(self, ray_session, tmp_path):
        import pyarrow.parquet as pq
        import ray.data

        from raysketch.stages.sortsink import sorted_partitioned_write

        rng = np.random.default_rng(11)
        keys = rng.integers(0, 10_000, size=20_000).astype(np.int64)
        vals = np.arange(20_000, dtype=np.int64)
        ds = ray.data.from_arrow(pa.table({"k": keys, "v": vals})) \
            .repartition(6)
        m = sorted_partitioned_write(ds, "k", str(tmp_path), num_buckets=8)
        assert m["n_rows"].sum() == 20_000
        # disjoint ascending bucket ranges
        assert (m["key_min"] <= m["key_max"]).all()
        assert (m["key_max"].to_numpy()[:-1]
                < m["key_min"].to_numpy()[1:]).all()
        # each file sorted; concatenation in bucket order == global sort
        got = []
        for p in m["path"]:
            t = pq.read_table(p)
            k = t.column("k").to_numpy()
            assert (np.diff(k) >= 0).all()
            got.append(k)
        assert np.array_equal(np.concatenate(got), np.sort(keys))

    def test_empty(self, ray_session, tmp_path):
        import ray.data

        from raysketch.stages.sortsink import sorted_partitioned_write

        ds = ray.data.from_arrow(pa.table({
            "k": pa.array([], type=pa.int64())}))
        m = sorted_partitioned_write(ds, "k", str(tmp_path))
        assert len(m) == 0


def test_image_phash_recall_on_reencoded_duplicates(ray_session):
    """Planted duplicates are pixel-identical but RE-ENCODED with a
    different PNG filter: payload bytes differ (byte dedup misses
    them), the perceptual hash must place every planted pair in the
    same group."""
    import numpy as np
    import pyarrow.parquet as pq

    from raysketch.stages.multimodal import make_dup_png_table
    from raysketch.pipelines.queries import image_phash_dedup

    t = make_dup_png_table(48, seed=7)
    # the pairs are (i, 48+i) for i in 0, 8, ..., 40; bytes must differ
    pay = t.column("payload").to_pylist()
    ids = t.column("item_id").to_pylist()
    pos = {v: k for k, v in enumerate(ids)}
    for i in range(0, 48, 8):
        assert pay[pos[i]] != pay[pos[48 + i]]

    out = image_phash_dedup("/root/testdata/sf0.001")
    # recall: every planted (i, n+i) pair shares a group
    n = max(32, int(4096 * 0.001))
    import ray.data
    from raysketch.stages.multimodal import ImageDecode, ImagePHash
    import ray, os, tempfile, glob

    cache = os.path.join(tempfile.gettempdir(), "raysketch_data",
                         f"pngs_dup_n{n}_s7")
    ds = ray.data.read_parquet(cache)
    h = ds.map_batches(ImageDecode,
                       fn_constructor_kwargs={"deterministic_fake": False},
                       batch_format="pyarrow", batch_size=64,
                       concurrency=2) \
        .map_batches(ImagePHash(), batch_size=64).to_pandas()
    hm = dict(zip(h["item_id"], h["phash"]))
    for i in range(0, n, 8):
        assert hm[i] == hm[n + i], f"planted pair ({i},{n+i}) split"
    # and the query reports every planted hash as a group of >=2
    ghashes = set(out["phash"])
    for i in range(0, n, 8):
        assert hm[i] in ghashes


def test_audio_fingerprint_recall_on_amplitude_doubled(ray_session):
    """Planted duplicates are amplitude-DOUBLED (PCM ints exactly 2x):
    payload bytes differ, the scale-invariant energy-sign fingerprint
    must place every planted pair in the same group."""
    import numpy as np

    from raysketch.stages.multimodal import (AudioFingerprint,
                                             make_dup_wav_table)
    from raysketch.pipelines.queries import audio_fingerprint_dedup

    n = 48
    t = make_dup_wav_table(n, seed=7)
    pay = t.column("payload").to_pylist()
    ids = t.column("item_id").to_pylist()
    pos = {v: k for k, v in enumerate(ids)}
    fp = AudioFingerprint()
    for i in range(0, n, 8):
        assert pay[pos[i]] != pay[pos[n + i]], "bytes must differ"
        assert fp._fp(pay[pos[i]]) == fp._fp(pay[pos[n + i]]), \
            f"planted pair ({i},{n+i}) fingerprints split"

    # and the query over ITS fixture (n=32 at sf0.001) reports every
    # planted pair's fingerprint as a group of >= 2
    out = audio_fingerprint_dedup("/root/testdata/sf0.001")
    import os, tempfile
    import pyarrow.parquet as pq

    nq = max(32, int(4096 * 0.001))
    cache = os.path.join(tempfile.gettempdir(), "raysketch_data",
                         f"wavs_dup_n{nq}_s7")
    tq = pq.read_table(os.path.join(cache, "part0.parquet"))
    payq = dict(zip(tq.column("item_id").to_pylist(),
                    tq.column("payload").to_pylist()))
    reported = set(int(x) for x in out["afp"])
    for i in range(0, nq, 8):
        f = int(fp._fp(payq[i]))
        assert f == int(fp._fp(payq[nq + i]))
        assert f in reported, f"planted pair ({i},{nq+i}) not reported"


def test_video_content_dedup_remux_recall(ray_session):
    """Planted duplicates are REMUXED (identical luma, different
    framerate header): payload bytes differ, the content hash must
    group every planted pair; the query reports exactly those."""
    from raysketch.stages.multimodal import (VideoContentHash,
                                             make_dup_y4m_table)
    from raysketch.pipelines.queries import video_content_dedup

    n = 32
    t = make_dup_y4m_table(n, seed=7)
    pay = dict(zip(t.column("item_id").to_pylist(),
                   t.column("payload").to_pylist()))
    vh = VideoContentHash()
    for i in range(0, n, 8):
        assert pay[i] != pay[n + i], "remuxed bytes must differ"
        assert int(vh._h(pay[i])) == int(vh._h(pay[n + i]))

    out = video_content_dedup("/root/testdata/sf0.001")
    reported = set(int(x) for x in out["vch"])
    for i in range(0, n, 8):
        assert int(vh._h(pay[i])) in reported
    assert (out["n_items"] == 2).all()


class TestSpanDedup:
    """Span-level exact dedup (stages/spans.py): repeated k-token
    windows marked corpus-wide, first occurrence kept."""

    @staticmethod
    def _brute(texts: dict, k: int):
        """Pure-python reference: per-doc (n_tokens, n_removed)."""
        occ = {}
        for i in sorted(texts):
            w = texts[i].split(" ")
            for p in range(max(0, len(w) - k + 1)):
                occ.setdefault(tuple(w[p: p + k]), []).append((i, p))
        removed = {}
        for g, locs in occ.items():
            if len(locs) >= 2:
                for i, p in sorted(locs)[1:]:
                    removed.setdefault(i, set()).update(range(p, p + k))
        return {i: (len(texts[i].split(" ")), len(removed.get(i, set())))
                for i in texts}

    def test_matches_brute_force(self, docs_ds, ray_session):
        from raysketch.stages.spans import span_removal_stats

        ds, tbl, _ = docs_ds
        out = span_removal_stats(ds, k=5)
        texts = dict(zip(tbl.column("doc_id").to_pylist(),
                         tbl.column("text").to_pylist()))
        exp = self._brute(texts, 5)
        assert len(out) == len(texts)
        for _, r in out.iterrows():
            nt, nr = exp[int(r["doc_id"])]
            assert int(r["n_tokens"]) == nt
            assert int(r["n_removed"]) == nr

    def test_planted_boilerplate(self, ray_session):
        """Docs sharing only a boilerplate sentence: doc-level exact
        dedup keeps all (contents differ), span dedup marks exactly
        the boilerplate tokens in every doc after the first."""
        import ray.data

        from raysketch.stages.dedup import exact_dedup_keep_ids
        from raysketch.stages.spans import span_removal_stats

        rng = np.random.default_rng(3)
        vocab = [f"tok{i:03d}" for i in range(500)]
        boiler = "click here to subscribe to our newsletter today"  # 8 tokens
        texts = [" ".join(rng.choice(vocab, size=40)) + " " + boiler
                 for _ in range(6)]
        tbl = pa.table({"doc_id": pa.array(np.arange(6, dtype=np.int64)),
                        "text": pa.array(texts)})
        ds = ray.data.from_arrow(tbl).repartition(3)
        keep = exact_dedup_keep_ids(ds).to_pandas()
        assert len(keep) == 6, "doc-level dedup must miss shared spans"
        out = span_removal_stats(ds, k=5).set_index("doc_id")
        assert int(out.loc[0, "n_removed"]) == 0  # first occurrence kept
        for i in range(1, 6):
            # 8 boilerplate tokens + the 4 bridge windows reaching back
            # into the random prefix are all it may remove
            assert 8 <= int(out.loc[i, "n_removed"]) <= 12

    @staticmethod
    def _brute_clean(texts: dict, k: int):
        """Pure-python reference: per-doc cleaned text."""
        occ = {}
        for i in sorted(texts):
            w = texts[i].split(" ")
            for p in range(max(0, len(w) - k + 1)):
                occ.setdefault(tuple(w[p: p + k]), []).append((i, p))
        removed = {}
        for g, locs in occ.items():
            if len(locs) >= 2:
                for i, p in sorted(locs)[1:]:
                    removed.setdefault(i, set()).update(range(p, p + k))
        return {i: " ".join(
            tok for p, tok in enumerate(texts[i].split(" "))
            if p not in removed.get(i, set())) for i in texts}

    def test_clean_matches_brute_force(self, docs_ds, ray_session):
        """remove_duplicate_spans emits exactly the brute-force
        excised corpus (every doc, unaffected ones byte-identical)."""
        from raysketch.stages.spans import remove_duplicate_spans

        ds, tbl, _ = docs_ds
        out = remove_duplicate_spans(ds, k=5).to_pandas() \
            .set_index("doc_id")["clean_text"]
        texts = dict(zip(tbl.column("doc_id").to_pylist(),
                         tbl.column("text").to_pylist()))
        exp = self._brute_clean(texts, 5)
        assert len(out) == len(texts)
        for i, want in exp.items():
            assert out.loc[i] == want


class TestSemDeDup:
    """SemDeDup (stages/dedup.py semdedup): fixed-seed clustering +
    within-cluster cosine dedup, removed = non-first ≥-threshold."""

    @staticmethod
    def _brute(ids, V, n_seeds, tau):
        """Pure-numpy reference over the SAME semantics."""
        order = np.argsort(ids)
        ids, V = ids[order], V[order]
        Vn = V / (np.linalg.norm(V, axis=1, keepdims=True) + 1e-300)
        sid = ids[:n_seeds]
        S = Vn[:n_seeds]
        cl = sid[np.argmax(Vn @ S.T, axis=1)]
        out = {}
        for j in range(len(ids)):
            for i in range(j):
                if cl[i] == cl[j] and float(Vn[i] @ Vn[j]) >= tau:
                    out[int(ids[j])] = (int(cl[j]), int(ids[i]))
                    break
        return out

    def test_matches_brute_force(self, ray_session):
        import ray.data

        rng = np.random.default_rng(7)
        n, d = 300, 16
        V = rng.standard_normal((n, d)).astype(np.float32)
        # plant near-dup families: tiny perturbations (NOT exact copies
        # — byte/hash dedup provably misses these) of vectors 10 and 11
        for k, src in ((100, 10), (150, 10), (200, 11)):
            V[k] = V[src] + rng.standard_normal(d).astype(np.float32) * 0.01
        ids = np.arange(n, dtype=np.int64) * 7 + 3  # non-contiguous ids
        tbl = pa.table({"vec_id": pa.array(ids),
                        "embedding": pa.array([v for v in V],
                                              type=pa.list_(pa.float32()))})
        ds = ray.data.from_arrow(tbl).repartition(5)
        from raysketch.stages.dedup import semdedup

        out = semdedup(ds, n_seeds=8, threshold=0.9, block=64)
        exp = self._brute(ids.copy(), V.astype(np.float64), 8, 0.9)
        got = {int(r["vec_id"]): (int(r["cluster"]), int(r["dup_of"]))
               for _, r in out.iterrows()}
        assert got == exp
        # the perturbed copies must be among the removed (cos ≈ 0.9997)
        for k in (100, 150, 200):
            assert int(ids[k]) in got

    def test_empty_and_identity(self, ray_session):
        import ray.data

        rng = np.random.default_rng(1)
        V = rng.standard_normal((40, 8)).astype(np.float32)
        tbl = pa.table({"vec_id": pa.array(np.arange(40, dtype=np.int64)),
                        "embedding": pa.array([v for v in V],
                                              type=pa.list_(pa.float32()))})
        ds = ray.data.from_arrow(tbl).repartition(3)
        from raysketch.stages.dedup import semdedup

        out = semdedup(ds, n_seeds=4, threshold=0.999999)
        assert len(out) == 0
        assert list(out.columns) == ["vec_id", "cluster", "dup_of"]

    def test_trained_planted_recall(self, ray_session):
        """Trained-clustering scale path (VERDICT r03 item 2): exact
        copies planted at +10000 must ALL be removed with dup_of =
        their original — identical vectors share both the argmax-cosine
        cluster and (under the size guard) the content-hash cell."""
        import ray.data

        rng = np.random.default_rng(23)
        n, d = 400, 16
        V = rng.standard_normal((n, d)).astype(np.float32)
        ids = np.arange(n, dtype=np.int64)
        cp = ids[ids % 10 == 0]
        tbl = pa.table({
            "vec_id": pa.array(np.concatenate([ids, cp + 10_000])),
            "embedding": pa.array([v for v in np.vstack([V, V[cp]])],
                                  type=pa.list_(pa.float32()))})
        ds = ray.data.from_arrow(tbl).repartition(5)
        from raysketch.stages.dedup import semdedup

        out = semdedup(ds, n_seeds=None, threshold=0.95,
                       clustering="trained", max_cluster=32)
        got = dict(zip(out["vec_id"].astype(int),
                       out["dup_of"].astype(int)))
        for c in cp:
            assert got.get(int(c) + 10_000) == int(c)

    def test_trained_size_guard_skewed(self, ray_session):
        """A skew-collapsed corpus (every vector identical up to tiny
        noise → k-means puts all mass in few clusters) must still
        produce cells no larger than the guard allows."""
        import ray.data

        rng = np.random.default_rng(9)
        n, d = 2000, 8
        base = rng.standard_normal(d).astype(np.float32)
        V = base + rng.standard_normal((n, d)).astype(np.float32) * 1e-3
        tbl = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                        "embedding": pa.array([v for v in V],
                                              type=pa.list_(pa.float32()))})
        ds = ray.data.from_arrow(tbl).repartition(4)
        from raysketch.stages.dedup import semdedup_assignments

        assigned, seed_ids, _ = semdedup_assignments(
            ds, n_seeds=4, clustering="trained", max_cluster=256)
        df = assigned.to_pandas()
        sizes = df.groupby(["cluster", "cell"]).size()
        # expected cell size = cluster_size / ceil(cluster_size/256);
        # the hash split is binomial around it — allow 2× headroom
        assert sizes.max() <= 512
        assert df.groupby("cluster").size().max() > 256  # guard exercised


class TestTokenBudgetSelect:
    def test_matches_greedy(self, ray_session, sf_dir):
        import __ray_entry__ as e

        out = e.queries()["token_budget_select"](sf_dir)
        # brute force: pandas greedy over the same stats
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "text"]).to_pandas()
        t["words"] = t["text"].fillna("").str.split(" ")
        t["n_tokens"] = t["words"].str.len()
        t["score"] = t["words"].apply(lambda w: len(set(w)))
        budget = int(t["n_tokens"].sum()) // 10
        t = t.sort_values(["score", "doc_id"],
                          ascending=[False, True]).reset_index(drop=True)
        cum = t["n_tokens"].cumsum()
        sel = t[cum <= budget].sort_values("doc_id").reset_index(drop=True)
        assert list(out["doc_id"]) == list(sel["doc_id"])
        assert list(out["n_tokens"]) == list(sel["n_tokens"])
        assert list(out["score"]) == list(sel["score"])
        # the selection is a proper subset that exhausts the budget
        assert out["n_tokens"].sum() <= budget


class TestAudioSpectralFeatures:
    def _clip_table(self, freqs, rate=8000, dur_s=1.0):
        import pyarrow as pa

        from raysketch.stages.wavcodec import encode_wav

        t = np.arange(int(rate * dur_s)) / rate
        payloads = [encode_wav(0.8 * np.sin(2 * np.pi * f * t), rate)
                    for f in freqs]
        n = len(freqs)
        return pa.table({
            "item_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(payloads, type=pa.binary()),
            "sample_rate": pa.array(np.full(n, rate, dtype=np.int32)),
            "n_channels": pa.array(np.ones(n, dtype=np.int32)),
            "format": pa.array(["wav"] * n),
        })

    def test_recovers_generator_frequency_within_one_bin(self):
        """The rFFT stage RECOVERS each pure tone's frequency: the
        dominant bin lands within one bin width (rate/nfft) of the
        generator f0, the centroid sits near the tone, and the pure
        tone's bandwidth is small (Hann leakage only)."""
        from raysketch.stages.multimodal import AudioSpectralFeatures

        rate = 8000
        freqs = [220.0, 440.0, 997.0, 1500.0, 3210.0]
        out = AudioSpectralFeatures(deterministic_fake=False)(
            self._clip_table(freqs, rate=rate)).to_pandas()
        bin_hz = rate / 4096
        for f, d, c, b in zip(freqs, out["dominant_freq_hz"],
                              out["spectral_centroid_hz"],
                              out["spectral_bandwidth_hz"]):
            assert abs(d - f) <= bin_hz, (f, d)
            assert abs(c - f) <= 15 * bin_hz  # leakage pulls the mean
            assert 0 < b < 40 * bin_hz

    def test_fake_path_and_format_gate(self):
        import pyarrow as pa

        from raysketch.stages.multimodal import AudioSpectralFeatures

        tbl = self._clip_table([440.0])
        fake = AudioSpectralFeatures()(tbl)
        assert fake.num_rows == 1  # deterministic stand-in runs
        bad = tbl.set_column(tbl.schema.get_field_index("format"),
                             "format", pa.array(["mp3"]))
        with pytest.raises(NotImplementedError):
            AudioSpectralFeatures(deterministic_fake=False)(bad)

    def test_query_end_to_end(self, ray_session):
        import __ray_entry__ as entry

        q = entry.queries()
        out = q["audio_spectral_stats"]("/root/testdata/sf0.001")
        assert len(out) >= 32
        assert (out["dominant_freq_hz"] > 0).all()
        assert out["item_id"].is_monotonic_increasing


def test_minhash_band_floor_output_preserving(ray_session):
    """The band-count floor (est ≥ t over the same P components ⇒
    ≥ B − (P − ceil(tP)) fully-colliding bands) drops candidates but
    NEVER a pair that passes verification: planted near-dups at
    component distances 0..20 from a base signature, plus junk."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from raysketch.stages.dedup import (_dedupe_pair_rows,
                                        band_floor_filter,
                                        lsh_candidate_pairs,
                                        minhash_agreement_scorer,
                                        minhash_band_floor,
                                        score_pairs_distributed)

    rng = np.random.default_rng(11)
    P, B, t = 128, 16, 0.9
    base = rng.integers(0, 2**63, size=P, dtype=np.uint64)
    rows, ids = [], []
    for d in range(0, 21):           # d disagreeing components
        s = base.copy()
        pos = rng.choice(P, size=d, replace=False)
        s[pos] = rng.integers(0, 2**63, size=d, dtype=np.uint64)
        rows.append(s)
        ids.append(100 + d)
    for j in range(30):              # unrelated junk
        rows.append(rng.integers(0, 2**63, size=P, dtype=np.uint64))
        ids.append(500 + j)
    # a >64-member cluster around a SECOND base (ADVICE r03): an earlier
    # emitter star-linearized buckets >64 members, suppressing (x,y)
    # rows for non-min pairs — which undercounted n_bands so the floor
    # dropped verified pairs (this test caught it). Non-truncated
    # buckets now emit full cliques.
    base2 = rng.integers(0, 2**63, size=P, dtype=np.uint64)
    for j in range(80):
        s = base2.copy()
        d = int(rng.integers(0, 7))
        pos = rng.choice(P, size=d, replace=False)
        s[pos] = rng.integers(0, 2**63, size=d, dtype=np.uint64)
        rows.append(s)
        ids.append(1000 + j)
    flat = pa.array(np.concatenate(rows))
    sig_col = pa.FixedSizeListArray.from_arrays(flat, P)
    sigs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.array(ids, dtype=np.int64)),
        "minhash": sig_col}))

    raw = lsh_candidate_pairs(sigs, "doc_id", num_bands=B,
                              dedupe="raw").materialize()
    pairs = _dedupe_pair_rows(raw, {
        "n_bands": ("count", None),
        "truncated_bucket": ("max", "truncated_bucket")}).materialize()
    floor_b = minhash_band_floor(P, B, t)
    assert floor_b == 4
    cut = band_floor_filter(pairs, floor_b).materialize()
    assert cut.count() < pairs.count()   # the filter actually prunes

    def verified(pds):
        scored = score_pairs_distributed(
            pds, sigs, "doc_id", "minhash",
            minhash_agreement_scorer, "est_jaccard")
        df = scored.to_pandas()
        df = df[df["est_jaccard"] >= t]
        return set(zip(df["id_a"], df["id_b"]))

    v_all, v_cut = verified(pairs), verified(cut)
    assert v_all == v_cut                # output-preserving
    # sanity: the verified set is non-trivial (near-dup pairs exist)
    assert any(p[0] < 500 and p[1] < 500 for p in v_cut)
    # the big cluster's non-min pairs are present and verified (full-
    # clique emission; star suppression would have dropped these)
    assert any(1000 < a < b for a, b in v_cut)

    # truncated mega-buckets (the only incomplete-emission case left)
    # carry the flag and survive the floor unconditionally
    raw_t = lsh_candidate_pairs(sigs, "doc_id", num_bands=B,
                                max_bucket_size=20,
                                dedupe="raw").materialize()
    pairs_t = _dedupe_pair_rows(raw_t, {
        "n_bands": ("count", None),
        "truncated_bucket": ("max", "truncated_bucket")}).materialize()
    pdf_t = pairs_t.to_pandas()
    flagged = pdf_t[pdf_t["truncated_bucket"] > 0]
    assert len(flagged) > 0              # the 80-cluster buckets truncate
    cut_t = band_floor_filter(pairs_t, floor_b).to_pandas()
    kept = set(zip(cut_t["id_a"], cut_t["id_b"]))
    assert all((a, b) in kept
               for a, b in zip(flagged["id_a"], flagged["id_b"]))


def _mk_sig_table(rng, P, cluster, exact_copies, junk, base_seed_id=1000):
    """Signature corpus: `exact_copies` byte-identical copies of a base
    signature, `cluster` near-dup variants (≤6 disagreeing components),
    `junk` unrelated rows. Returns (ids, matrix)."""
    import numpy as np

    base = rng.integers(0, 2**63, size=P, dtype=np.uint64)
    rows, ids = [], []
    for j in range(exact_copies):
        rows.append(base.copy())
        ids.append(base_seed_id + j)
    for j in range(cluster):
        s = base.copy()
        d = int(rng.integers(1, 21))  # pairs with d_i+d_j > P(1-t) fail
        pos = rng.choice(P, size=d, replace=False)
        s[pos] = rng.integers(0, 2**63, size=d, dtype=np.uint64)
        rows.append(s)
        ids.append(base_seed_id + exact_copies + j)
    for j in range(junk):
        rows.append(rng.integers(0, 2**63, size=P, dtype=np.uint64))
        ids.append(base_seed_id + exact_copies + cluster + j)
    import numpy as np
    return np.array(ids, dtype=np.int64), np.stack(rows)


def _sig_ds(ids, S):
    import numpy as np
    import pyarrow as pa
    import ray.data

    flat = pa.array(S.reshape(-1))
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids),
        "minhash": pa.FixedSizeListArray.from_arrays(flat, S.shape[1])}))


def _gold_components(ids, S, t):
    """Brute-force all-pairs est-verify + union-find (the oracle)."""
    import numpy as np
    import pandas as pd

    from raysketch.stages.dedup import union_find_components

    P = S.shape[1]
    ea, eb = [], []
    for i0 in range(0, len(ids), 256):
        agree = (S[i0:i0 + 256, None, :] == S[None, :, :]).sum(axis=2)
        ii, jj = np.nonzero(agree / P >= t)
        gi = ii + i0
        keep = gi < jj
        ea.append(ids[gi[keep]])
        eb.append(ids[jj[keep]])
    ea, eb = np.concatenate(ea), np.concatenate(eb)
    if len(ea) == 0:
        return {}
    return union_find_components(pd.DataFrame({"id_a": ea, "id_b": eb}))


def test_collapse_exact_signatures(ray_session):
    """Unit contract: min-id representative per identical-signature
    group, (rep, member) edges, reps = corpus minus members."""
    import numpy as np

    from raysketch.stages.dedup import collapse_exact_signatures

    rng = np.random.default_rng(5)
    ids, S = _mk_sig_table(rng, 64, cluster=10, exact_copies=7, junk=20)
    reps, edges, n = collapse_exact_signatures(_sig_ds(ids, S), "doc_id",
                                               "minhash")
    assert n == 6                       # 7 copies → 6 (rep, member) edges
    e = edges.to_pandas()
    assert set(e["id_a"]) == {1000}     # min id of the copy group
    assert set(e["id_b"]) == set(range(1001, 1007))
    kept = set(reps.to_pandas()["doc_id"])
    assert kept == set(ids) - set(range(1001, 1007))

    # no identical signatures → pass-through, no edges
    ids2, S2 = _mk_sig_table(rng, 64, cluster=0, exact_copies=1, junk=30)
    reps2, edges2, n2 = collapse_exact_signatures(_sig_ds(ids2, S2),
                                                  "doc_id", "minhash")
    assert n2 == 0 and edges2 is None
    assert reps2.count() == len(ids2)


def test_collapse_forced_anti_join_fallback(ray_session):
    """broadcast_threshold=0 forces the shuffle-tier
    anti_join_rows_by_id representative filter; reps (including
    signature payloads, wire-packed through the exchange) and edges
    are identical to the broadcast path (VERDICT r04 item 3)."""
    import numpy as np

    from raysketch.stages.dedup import collapse_exact_signatures

    rng = np.random.default_rng(5)
    ids, S = _mk_sig_table(rng, 64, cluster=10, exact_copies=7, junk=20)

    def snap(res):
        reps, edges, n = res
        r = reps.to_pandas()
        rep_map = {
            int(i): tuple(np.asarray(s, dtype=np.uint64).tolist())
            for i, s in zip(r["doc_id"], r["minhash"])
        }
        e = edges.to_pandas().sort_values(["id_a", "id_b"]) \
            .reset_index(drop=True) if edges is not None else None
        return rep_map, e, n

    rb, eb, nb = snap(collapse_exact_signatures(
        _sig_ds(ids, S), "doc_id", "minhash"))
    rf, ef, nf = snap(collapse_exact_signatures(
        _sig_ds(ids, S), "doc_id", "minhash", broadcast_threshold=0))
    assert nb == nf == 6
    assert rb == rf
    import pandas as pd

    pd.testing.assert_frame_equal(eb, ef)


def test_anti_join_rows_by_id_roundtrip(ray_session):
    """anti_join_rows_by_id drops exactly the probe ids and
    reconstructs fixed-size-list payloads bit-identically after the
    wire-packed exchange (including an empty probe side)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from raysketch.stages.dedup import anti_join_rows_by_id

    rng = np.random.default_rng(11)
    ids = np.arange(100, dtype=np.int64)
    S = rng.integers(0, 2**63, size=(100, 8)).astype(np.uint64)
    rows = _sig_ds(ids, S)
    drop = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([3, 3, 17, 99], type=pa.int64())}))
    out = anti_join_rows_by_id(rows, drop, "doc_id").to_pandas()
    assert sorted(out["doc_id"]) == sorted(set(range(100)) - {3, 17, 99})
    got = {int(i): tuple(np.asarray(s, dtype=np.uint64).tolist())
           for i, s in zip(out["doc_id"], out["minhash"])}
    for i in got:
        assert got[i] == tuple(S[i].tolist())
    # empty probe side → identity
    none = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([], type=pa.int64())}))
    out2 = anti_join_rows_by_id(rows, none, "doc_id").to_pandas()
    assert sorted(out2["doc_id"]) == list(range(100))


def test_screened_lsh_equals_brute_force_components(ray_session):
    """The full estimate-verify stack — exact-signature collapse,
    mega-bucket in-place screening (cluster of 130 > defer_above=64),
    band floor, distributed verify + components — produces components
    IDENTICAL to brute-force all-pairs est ≥ t + union-find, on both
    the driver and distributed tiers."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from raysketch.stages.dedup import (_dedupe_pair_rows,
                                        _resolve_components,
                                        band_floor_filter,
                                        collapse_exact_signatures,
                                        lsh_candidate_pairs,
                                        minhash_agreement_scorer,
                                        minhash_band_floor,
                                        score_pairs_distributed)

    rng = np.random.default_rng(17)
    P, B, t = 128, 16, 0.9
    ids, S = _mk_sig_table(rng, P, cluster=90, exact_copies=40, junk=60)
    gold = _gold_components(ids, S, t)

    sigs = _sig_ds(ids, S)
    reps, exact_edges, n_exact = collapse_exact_signatures(sigs, "doc_id",
                                                           "minhash")
    assert n_exact == 39
    raw = lsh_candidate_pairs(reps, "doc_id", num_bands=B, dedupe="raw",
                              screen_threshold=t).materialize()
    # screened raw rows stay far below band-duplicated clique emission
    # (the mega-bucket's failing pairs are never materialized)
    assert raw.count() < B * (91 * 90 // 2)
    pairs_ds = _dedupe_pair_rows(raw, {
        "n_bands": ("count", None),
        "truncated_bucket": ("max", "truncated_bucket")})
    pairs_ds = band_floor_filter(pairs_ds, minhash_band_floor(P, B, t))
    scored = score_pairs_distributed(pairs_ds, reps, "doc_id", "minhash",
                                     minhash_agreement_scorer, "est_jaccard")
    verified = scored.map_batches(
        lambda tb: tb.filter(pc.greater_equal(tb.column("est_jaccard"),
                                              pa.scalar(t))),
        batch_format="pyarrow")
    if n_exact:
        verified = verified.select_columns(["id_a", "id_b"]) \
            .union(exact_edges)
    comps = _resolve_components(verified, "doc_id")
    got = dict(zip(comps["doc_id"].astype(int), comps["component"].astype(int)))
    assert got == gold


class TestBpeTrain:
    def test_greedy_semantics(self, ray_session):
        """'aaaa' merges left-to-right non-overlapping: (aa)(aa); runs
        reset across the 0 boundary."""
        import numpy as np

        from raysketch.stages.bpe import _apply_merge, _greedy_sites

        seq = np.array([5, 5, 5, 5, 0, 5, 5, 5], dtype=np.int32)
        k = _greedy_sites(seq, 5, 5)
        assert list(k) == [0, 2, 5]
        assert list(_apply_merge(seq, k, 300)) == [300, 300, 0, 300, 5]

    def test_incremental_equals_recount(self, ray_session, sf_dir):
        """The delta-maintained count vector learns the SAME merge
        sequence as a full corpus recount every round (VERDICT r03
        item 5 done-criterion), on the real documents table."""
        import ray.data

        from raysketch.stages.bpe import bpe_train

        ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                   columns=["text"])
        inc = bpe_train(ds, n_merges=12, incremental=True)
        rec = bpe_train(ds, n_merges=12, incremental=False)
        import pandas as pd

        pd.testing.assert_frame_equal(inc, rec)
        assert len(inc) == 12

    def test_bpe_budget_cap_admits_all(self, ray_session, sf_dir):
        """A symbol budget at/above the corpus size admits every doc,
        so capped training equals the uncapped run EXACTLY (VERDICT
        r04 item 2 done-criterion)."""
        import pandas as pd
        import ray.data

        from raysketch.stages.bpe import bpe_train

        ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                   columns=["doc_id", "text"])
        capped = bpe_train(ds, n_merges=8, char_budget=10**8)
        full = bpe_train(ds, n_merges=8)
        pd.testing.assert_frame_equal(capped, full)

    def test_bounded_sample_budget_and_determinism(self, ray_session,
                                                   sf_dir):
        """bounded_symbol_sample admits exactly the hash-order prefix
        of whole docs whose prior cumulative byte total is under
        budget — a pure function of the (id, length) set, so a
        repartitioned layout admits the identical set."""
        import numpy as np
        import pyarrow as pa
        import ray.data

        from raysketch.hashing import murmur64a
        from raysketch.keys import canonical_flat_bytes
        from raysketch.stages.bpe import bounded_symbol_sample

        budget = 30_000
        ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                   columns=["doc_id", "text"])
        got = sorted(
            r["doc_id"] for r in
            bounded_symbol_sample(ds, budget).select_columns(["doc_id"])
            .take_all())
        # expected admission, computed independently on the driver
        df = ds.to_pandas()
        data, off = canonical_flat_bytes(pa.array(df["doc_id"]))
        h = (murmur64a(data, off, np.uint64(0x5157 | 1))
             .astype(np.uint64) >> np.uint64(1)).astype(np.int64)
        nb = df["text"].fillna("").str.encode("utf-8").str.len().to_numpy()
        order = np.argsort(h, kind="stable")
        run = np.cumsum(nb[order])
        adm = order[run - nb[order] < budget]
        expect = sorted(df["doc_id"].to_numpy()[adm].tolist())
        assert got == expect
        assert 0 < len(got) < len(df)
        # layout-independence: a different block structure admits the
        # same set
        got2 = sorted(
            r["doc_id"] for r in
            bounded_symbol_sample(ds.repartition(7), budget)
            .select_columns(["doc_id"]).take_all())
        assert got2 == expect

    def test_first_round_matches_string_twin(self, ray_session, sf_dir):
        """Round 1 operates on raw bytes in both engines — the symbol
        trainer's first winner must equal bpe_two_merges' first pair."""
        import ray.data

        import __ray_entry__ as e

        twin = e.queries()["bpe_two_merges"](sf_dir)
        gen = e.queries()["bpe_train_merges"](sf_dir)
        pair = twin.iloc[0]["pair"]
        assert (int(gen.iloc[0]["left"]), int(gen.iloc[0]["right"])) \
            == (ord(pair[0]), ord(pair[1]))
        assert int(gen.iloc[0]["n"]) == int(twin.iloc[0]["n"])


class TestWordpieceTrain:
    def test_incremental_equals_recount(self, ray_session, sf_dir):
        """Likelihood-scored merges with delta-maintained pair counts
        AND site-count-maintained singles learn the same sequence as a
        full recount of both every round."""
        import ray.data

        from raysketch.stages.bpe import bpe_train

        ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                   columns=["text"])
        inc = bpe_train(ds, n_merges=10, incremental=True,
                        score="wordpiece")
        rec = bpe_train(ds, n_merges=10, incremental=False,
                        score="wordpiece")
        import pandas as pd

        pd.testing.assert_frame_equal(inc, rec)
        assert len(inc) == 10

    def test_wordpiece_diverges_from_bpe(self, ray_session):
        """Constructed corpus where the scores disagree: 'ee' is the
        most FREQUENT pair (BPE winner) but 'e' is so common its
        likelihood gain is tiny; 'xy' occurs 3 times over rare symbols
        (score 3/9) and must win WordPiece."""
        import pandas as pd
        import ray.data

        from raysketch.stages.bpe import bpe_train

        docs = pd.DataFrame({"text": ["e" * 40, "xy axy bxy"]})
        ds = ray.data.from_pandas(docs)
        bpe = bpe_train(ds, n_merges=1, score="bpe")
        wp = bpe_train(ds, n_merges=1, score="wordpiece")
        assert (int(bpe.iloc[0]["left"]), int(bpe.iloc[0]["right"])) \
            == (ord("e"), ord("e"))
        assert (int(wp.iloc[0]["left"]), int(wp.iloc[0]["right"])) \
            == (ord("x"), ord("y"))

    def test_first_round_matches_string_twin(self, ray_session, sf_dir):
        import ray.data

        import __ray_entry__ as e

        twin = e.queries()["wordpiece_two_merges"](sf_dir)
        gen = e.queries()["wordpiece_train_merges"](sf_dir)
        pair = twin.iloc[0]["pair"]
        assert (int(gen.iloc[0]["left"]), int(gen.iloc[0]["right"])) \
            == (ord(pair[0]), ord(pair[1]))
        assert int(gen.iloc[0]["n"]) == int(twin.iloc[0]["n"])

    def test_rejects_unknown_score(self, ray_session):
        import pandas as pd
        import pytest
        import ray.data

        from raysketch.stages.bpe import bpe_train

        ds = ray.data.from_pandas(pd.DataFrame({"text": ["ab"]}))
        with pytest.raises(ValueError):
            bpe_train(ds, n_merges=1, score="unigram")


def test_ngram_join_prefix_tier_equality(ray_session, sf_dir):
    """The driver prefix-emit tier (kept rows ≤ prefix_driver_limit,
    VERDICT r03 item 6: skip the by-token exchange right before a
    driver pair dedupe) equals the forced shuffle tier exactly."""
    import pandas as pd
    import ray.data

    from raysketch.stages.dedup import ngram_jaccard_join

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    a = ngram_jaccard_join(ds, threshold=0.5)
    b = ngram_jaccard_join(ds, threshold=0.5, prefix_driver_limit=0)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_lm_score_gibberish_ranking(ray_session):
    """The char-bigram LM score (VERDICT r03 item 7) ranks every
    planted uniform-random-byte gibberish doc below every fluent
    English doc by mean transition probability."""
    import numpy as np
    import ray.data

    from raysketch.stages.lm import char_bigram_lm_scores

    rng = np.random.default_rng(41)
    fluent = ["the quiet river turns east before the old stone bridge "
              "and the children walk along the bank every morning",
              "a language model assigns higher probability to character "
              "sequences that look like natural english prose",
              "she opened the window and the smell of rain came in "
              "with the sound of distant thunder over the hills"] * 4
    gibber = ["".join(chr(c) for c in rng.integers(33, 127, size=100))
              for _ in range(8)]
    rows = [{"doc_id": i, "text": t, "kind": int(i >= len(fluent))}
            for i, t in enumerate(fluent + gibber)]
    import pandas as pd

    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(3)
    out = char_bigram_lm_scores(ds).to_pandas()
    out = out.merge(pd.DataFrame(rows)[["doc_id", "kind"]], on="doc_id")
    mean_p = out["lm_score_fp"] / out["n_pairs"]
    worst_fluent = mean_p[out["kind"] == 0].min()
    best_gibber = mean_p[out["kind"] == 1].max()
    assert best_gibber < worst_fluent


def test_dsir_importance_separates_target_domain(ray_session):
    """DSIR-style importance weights (target LM minus raw LM, exact
    fixed point) rank every target-domain (fluent English) doc above
    every off-domain (uniform gibberish) doc; fp_pair_scores is safe
    on pairs the subset-trained target LM never saw (term -> 0)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from raysketch.stages.lm import (_pair_arrays, fp_pair_scores,
                                     train_char_bigram_counts)

    rng = np.random.default_rng(43)
    fluent = ["the quiet river turns east before the old stone bridge",
              "a language model assigns higher probability to prose",
              "she opened the window and the rain came in softly"] * 4
    gibber = ["".join(chr(c) for c in rng.integers(33, 127, size=80))
              for _ in range(8)]
    rows = pd.DataFrame(
        [{"doc_id": i, "text": t, "kind": int(i >= len(fluent))}
         for i, t in enumerate(fluent + gibber)])
    ds = ray.data.from_pandas(rows).repartition(3)
    tgt = ds.filter(lambda r: r["kind"] == 0)
    ct = train_char_bigram_counts(tgt)
    cr = train_char_bigram_counts(ds)

    w_mean = {}
    for _, r in rows.iterrows():
        a, b, _ = _pair_arrays([r["text"]])
        w = int((fp_pair_scores(a, b, ct)
                 - fp_pair_scores(a, b, cr)).sum())
        w_mean[r["doc_id"]] = w / len(a)
    worst_target = min(w_mean[i] for i in rows[rows["kind"] == 0].doc_id)
    best_off = max(w_mean[i] for i in rows[rows["kind"] == 1].doc_id)
    assert best_off < worst_target

    # unseen-pair safety: a byte pair absent from BOTH corpora
    a = np.array([1], dtype=np.int64)
    b = np.array([2], dtype=np.int64)
    assert fp_pair_scores(a, b, ct)[0] == 0


def test_bpe_encode_symbols_equals_string_replace(ray_session):
    """bpe_encode (int32 symbol-corpus apply) produces exactly the
    token counts of sequential str.replace with the learned merges —
    same greedy left-to-right non-overlapping semantics for N merges,
    including merges whose operands are earlier merge symbols."""
    import numpy as np
    import pandas as pd
    import ray.data

    from raysketch.stages.bpe import bpe_encode, bpe_train

    rng = np.random.default_rng(7)
    words = ["the", "batch", "merge", "aaa", "abab", "sort"]
    docs = [" ".join(rng.choice(words, size=rng.integers(3, 30)))
            for _ in range(40)] + ["", "a"]
    rows = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    ds = ray.data.from_pandas(rows).repartition(3)

    merges = bpe_train(ds, n_merges=6)
    assert len(merges) == 6

    out = bpe_encode(ds, merges).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    sym_char = {s: chr(s) for s in range(1, 256)}
    for r in merges.itertuples():
        sym_char[int(r.new_sym)] = chr(0xE000 + int(r.new_sym))
    for i, text in enumerate(docs):
        s = text
        for r in merges.itertuples():
            s = s.replace(sym_char[int(r.left)] + sym_char[int(r.right)],
                          sym_char[int(r.new_sym)])
        assert out.loc[i, "n_tokens"] == len(s), (i, text, s)
        assert out.loc[i, "n_bytes"] == len(text.encode())


def test_screen_broadcast_tier_equals_exchange_tier(ray_session):
    """_screen_deferred_buckets' driver/broadcast tier (small deferral
    sets: one gather, local tiled agreement) emits exactly the pair set
    of the exchange tier (Bloom prune + union + two groupbys), so the
    tier cut is invisible to every downstream consumer."""
    import functools

    import numpy as np

    import raysketch.stages.dedup as D

    rng = np.random.default_rng(23)
    ids, S = _mk_sig_table(rng, 128, cluster=90, exact_copies=0, junk=80)
    sigs = _sig_ds(ids, S)
    raw_b = D.lsh_candidate_pairs(sigs, "doc_id", num_bands=16,
                                  dedupe="shuffle", screen_threshold=0.9)
    df_b = raw_b.to_pandas().sort_values(["id_a", "id_b"]) \
        .reset_index(drop=True)

    orig = D._screen_deferred_buckets
    D._screen_deferred_buckets = functools.partial(orig, broadcast_limit=0)
    try:
        raw_e = D.lsh_candidate_pairs(sigs, "doc_id", num_bands=16,
                                      dedupe="shuffle", screen_threshold=0.9)
        df_e = raw_e.to_pandas().sort_values(["id_a", "id_b"]) \
            .reset_index(drop=True)
    finally:
        D._screen_deferred_buckets = orig
    import pandas as pd

    pd.testing.assert_frame_equal(df_b, df_e)
    assert len(df_b) > 0


def test_snapshot_diff_statuses_and_unique_guard(ray_session):
    """snapshot_diff emits exactly the added/removed/changed keys of a
    FULL OUTER JOIN delta (pandas replica), never unchanged rows, and
    raises on a duplicate key within one snapshot."""
    import ray

    from raysketch.stages.incremental import snapshot_diff

    old = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                    "text": ["a", "bb", "ccc", "dddd"]})
    new = pa.table({"doc_id": pa.array([2, 3, 4, 5], pa.int64()),
                    "text": ["bb", "CHANGED", "dddd", "e"]})
    out = snapshot_diff(ray.data.from_arrow(old).repartition(3),
                        ray.data.from_arrow(new).repartition(2),
                        key_col="doc_id", text_col="text") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out["doc_id"]) == [1, 3, 5]
    assert list(out["status"]) == ["removed", "changed", "added"]

    dup = pa.table({"doc_id": pa.array([7, 7], pa.int64()),
                    "text": ["x", "y"]})
    with pytest.raises(Exception, match="not unique"):
        snapshot_diff(ray.data.from_arrow(dup),
                      ray.data.from_arrow(new),
                      key_col="doc_id", text_col="text").to_pandas()


def test_snapshot_diff_same_content_different_length_never_merges(ray_session):
    """Change detection keys on (murmur, length): a changed text of a
    DIFFERENT length is always caught even if the murmur collided."""
    import ray

    from raysketch.stages.incremental import snapshot_diff

    old = pa.table({"doc_id": pa.array([1], pa.int64()), "text": ["ab"]})
    new = pa.table({"doc_id": pa.array([1], pa.int64()), "text": ["abc"]})
    out = snapshot_diff(ray.data.from_arrow(old),
                        ray.data.from_arrow(new)).to_pandas()
    assert list(out["status"]) == ["changed"]


def _wjacc_brute(a: str, b: str, k: int = 3) -> float:
    """Σmin(tf)/Σmax(tf) over word-k-gram multisets."""
    from collections import Counter

    def grams(t):
        w = t.split(" ")
        return Counter(tuple(w[i:i + k])
                       for i in range(max(0, len(w) - k + 1)))
    ca, cb = grams(a), grams(b)
    if not ca and not cb:
        return 1.0
    num = sum(min(ca[g], cb[g]) for g in ca.keys() & cb.keys())
    den = sum((ca | cb).values())
    return num / den


def test_weighted_jaccard_join_equals_brute_force(ray_session):
    """weighted ngram_jaccard_join == per-pair Σmin/Σmax brute force,
    and tells a self-concatenated doc (weighted J≈0.5) apart from the
    set-Jaccard view (J≈1): the doubled doc pairs with its base under
    unit weights but not under multiset weights."""
    import ray

    from raysketch.stages.dedup import ngram_jaccard_join

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = [base,
            base + " " + base,                       # doubled mass
            base.replace("dog", "cat"),              # near-dup
            "completely different text with no overlap here at all",
            base]                                    # exact copy
    tbl = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": docs})
    ds = ray.data.from_arrow(tbl).repartition(3)

    out_w = ngram_jaccard_join(ds, k=3, threshold=0.4, unit="word",
                               weighted=True)
    gold = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            wj = _wjacc_brute(docs[i], docs[j])
            if wj >= 0.4:
                gold[(i, j)] = wj
    got = {(int(r["id_a"]), int(r["id_b"])): float(r["jaccard"])
           for _, r in out_w.iterrows()}
    assert got.keys() == gold.keys()
    for p, v in gold.items():
        assert abs(got[p] - v) < 1e-12

    # the doubled doc: set J(base, base+base) is high, weighted ≈ 0.5
    out_set = ngram_jaccard_join(ds, k=3, threshold=0.8, unit="word")
    set_pairs = {(int(r["id_a"]), int(r["id_b"]))
                 for _, r in out_set.iterrows()}
    out_w8 = ngram_jaccard_join(ds, k=3, threshold=0.8, unit="word",
                                weighted=True)
    w_pairs = {(int(r["id_a"]), int(r["id_b"]))
               for _, r in out_w8.iterrows()}
    assert (0, 1) in set_pairs and (0, 1) not in w_pairs
    assert (0, 4) in set_pairs and (0, 4) in w_pairs  # exact copy: both


def test_weighted_minhash_dedup_discriminates_doubled_text(ray_session):
    """The weighted MinHash sketch tier: under set semantics a doc and
    its self-concatenation are near-identical (J≈1 → component), under
    weighted semantics they share only half the mass (J≈0.5 → no
    component at threshold 0.9); exact copies are found either way."""
    import ray

    from raysketch.stages.dedup import minhash_dedup

    rng = np.random.default_rng(7)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet", "kilo", "lima"]
    docs, ids = [], []
    for i in range(12):
        t = " ".join(rng.choice(words, size=60))
        docs += [t, t + " " + t]        # base + doubled twin
        ids += [2 * i, 2 * i + 1]
    docs.append(docs[0])                # one exact copy of doc 0
    ids.append(1000)
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": docs})
    ds = ray.data.from_arrow(tbl).repartition(4)

    out_set = minhash_dedup(ds, shingle_k=5, threshold=0.9,
                            verify="estimate")
    comp_set = dict(zip(out_set["doc_id"], out_set["component"]))
    assert comp_set.get(0) == comp_set.get(1) == 0  # doubled pairs merge

    out_w = minhash_dedup(ds, shingle_k=5, threshold=0.9,
                          verify="estimate", weighted=True)
    comp_w = dict(zip(out_w["doc_id"], out_w["component"]))
    # exact copy still found; doubled twins are NOT merged with bases
    assert comp_w.get(0) == comp_w.get(1000) == 0
    for i in range(12):
        a, b = comp_w.get(2 * i), comp_w.get(2 * i + 1)
        assert a is None or b is None or a != b

    # exact weighted verify agrees (multiset gram sets in the verifier)
    out_we = minhash_dedup(ds, shingle_k=5, threshold=0.9,
                           verify="exact", weighted=True)
    comp_we = dict(zip(out_we["doc_id"], out_we["component"]))
    assert comp_we.get(0) == comp_we.get(1000) == 0
    for i in range(12):
        a, b = comp_we.get(2 * i), comp_we.get(2 * i + 1)
        assert a is None or b is None or a != b


def test_zorder_interleave_properties():
    """Morton interleave/deinterleave are exact inverses; z-order of
    the cell prefix matches cell_bounds rectangles; out-of-domain
    coordinates raise."""
    import numpy as np
    import pytest

    from raysketch.stages.zorder import (cell_bounds, deinterleave16,
                                         interleave16)

    rng = np.random.default_rng(7)
    x = rng.integers(0, 1 << 16, 4096).astype(np.uint64)
    y = rng.integers(0, 1 << 16, 4096).astype(np.uint64)
    z = interleave16(x, y)
    assert z.dtype == np.int64 and (z >= 0).all() and \
        (z < (1 << 32)).all()
    xd, yd = deinterleave16(z)
    assert (xd == x.astype(np.int64)).all()
    assert (yd == y.astype(np.int64)).all()

    j = 2
    cells = (z >> (32 - 2 * j)).astype(np.int64)
    for k in np.unique(cells):
        x0, x1, y0, y1 = cell_bounds(int(k), j)
        sel = cells == k
        assert (xd[sel] >= x0).all() and (xd[sel] < x1).all()
        assert (yd[sel] >= y0).all() and (yd[sel] < y1).all()

    with pytest.raises(ValueError):
        interleave16(np.array([1 << 16]), np.array([0]))


def test_bucketed_layout_cojoin(ray_session, tmp_path):
    """Co-bucketed zero-shuffle join: same key → same bucket in both
    layouts; the per-bucket join over a synthetic pair equals a plain
    pandas merge; mismatched bucket counts are rejected; a key present
    on only one side simply never matches."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data

    from raysketch.stages.bucketed import (bucket_files,
                                           cobucket_join_fold,
                                           write_bucketed)

    rng = np.random.default_rng(3)
    a = pd.DataFrame({"k": rng.integers(0, 200, 500),
                      "x": rng.integers(0, 100, 500)})
    b = pd.DataFrame({"k": np.arange(0, 300, 2),
                      "y": np.arange(0, 300, 2) * 10})
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    write_bucketed(ray.data.from_pandas(a), "k", da, num_buckets=8)
    write_bucketed(ray.data.from_pandas(b), "k", db, num_buckets=8)

    # co-partitioning: every key's rows land in the same bucket id
    import pyarrow.parquet as pq
    seen = {}
    for which, d in (("a", da), ("b", db)):
        for k in range(8):
            fs = bucket_files(d, k)
            if not fs:
                continue
            keys = pq.read_table(fs, columns=["k"])["k"].to_numpy(
                zero_copy_only=False)
            for key in np.unique(keys):
                assert seen.setdefault(int(key), k) == k

    def per_bucket(ta: pa.Table, tb: pa.Table) -> pa.Table:
        m = ta.to_pandas().merge(tb.to_pandas(), on="k")
        g = m.groupby("k", as_index=False).agg(
            s=("y", "sum"), n=("x", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = cobucket_join_fold(da, db, per_bucket).to_pandas() \
        .groupby("k", as_index=False).agg(s=("s", "sum"), n=("n", "sum")) \
        .sort_values("k").reset_index(drop=True)
    gold = a.merge(b, on="k").groupby("k", as_index=False).agg(
        s=("y", "sum"), n=("x", "size")).sort_values("k") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(out.astype("int64"),
                                  gold.astype("int64"))

    dc = str(tmp_path / "c")
    write_bucketed(ray.data.from_pandas(b), "k", dc, num_buckets=4)
    with pytest.raises(ValueError):
        cobucket_join_fold(da, dc, per_bucket)


def test_unigram_tokenizer_reference_equality(ray_session):
    """Distributed unigram-LM training ≡ an INDEPENDENT local
    reimplementation (plain dict/loop Python over the raw parquet):
    same seed, same 2 hard-EM rounds, same prune, same final counts —
    plus the char-conservation identity (every char of every word
    occurrence is covered by exactly one piece) and segmentation
    validity for every distinct word. Rerun equality."""
    import collections

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from raysketch.pipelines import queries as Q
    from raysketch.pipelines.queries import _unigram_model
    from raysketch.stages.unigram import viterbi_encode

    SF = "/root/testdata/sf0.001"
    model = _unigram_model(SF)

    # ---- independent reference ----
    texts = pq.read_table(SF + "/documents.parquet",
                          columns=["text"]).column("text").to_pylist()
    wc = collections.Counter(w for t in texts for w in t.split(" ") if w)

    def seed(max_len=4, seed_vocab=160):
        sc = collections.Counter()
        for w, c in wc.items():
            for i in range(len(w)):
                for j in range(i + 1, min(len(w), i + max_len) + 1):
                    sc[w[i:j]] += c
        singles = sorted(s for s in sc if len(s) == 1)
        multi = sorted((s for s in sc if len(s) > 1),
                       key=lambda s: (-sc[s], s))
        keep = sorted(set(singles)
                      | set(multi[:max(0, seed_vocab - len(singles))]))
        return keep, np.array([sc[s] for s in keep], dtype=np.int64)

    def viterbi(word, pieces, nums, den, look, max_len):
        best = [None] * (len(word) + 1)
        best[0] = (1, 0, ())
        for i in range(len(word)):
            if best[i] is None:
                continue
            na, ka, path = best[i]
            for j in range(i + 1, min(len(word), i + max_len) + 1):
                pid = look.get(word[i:j])
                if pid is None:
                    continue
                cn, ck, npth = na * int(nums[pid]), ka + 1, path + (pid,)
                old = best[j]
                if old is None:
                    best[j] = (cn, ck, npth)
                    continue
                ob, ok, opth = old
                lhs, rhs = cn * den ** ok, ob * den ** ck
                if lhs > rhs or (lhs == rhs and
                                 (ck < ok or (ck == ok and npth < opth))):
                    best[j] = (cn, ck, npth)
        return best[len(word)][2]

    def estep(pieces, counts):
        nums = counts + 1
        den = int(nums.sum())
        look = {p: i for i, p in enumerate(pieces)}
        ml = max(len(p) for p in pieces)
        out = np.zeros(len(pieces), dtype=np.int64)
        for w, c in wc.items():
            for pid in viterbi(w, pieces, nums, den, look, ml):
                out[pid] += c
        return out

    pieces, counts = seed()
    for _ in range(2):
        counts = estep(pieces, counts)
    df = pd.DataFrame({"p": pieces, "c": counts})
    singles = df[df["p"].str.len() == 1]
    multi = df[df["p"].str.len() > 1].sort_values(
        ["c", "p"], ascending=[False, True], kind="stable") \
        .head(48 - len(singles))
    keep = pd.concat([singles, multi]).sort_values("p")
    pieces2 = keep["p"].tolist()
    final = estep(pieces2, keep["c"].to_numpy(dtype=np.int64))

    assert model.pieces == pieces2
    assert list(model.counts) == list(final)

    # char conservation + segmentation validity
    total_chars = sum(c * len(w) for w, c in wc.items())
    assert int((model.counts
                * np.array([len(p) for p in model.pieces])).sum()) \
        == total_chars
    for w in wc:
        path = viterbi_encode(w, model)
        assert "".join(model.pieces[i] for i in path) == w

    t1 = Q.unigram_lm_tokenizer(SF)
    pd.testing.assert_frame_equal(t1, Q.unigram_lm_tokenizer(SF))
    e = Q.unigram_encode_docs(SF)
    assert int(e["n_chars"].sum()) == total_chars
    assert int(e["n_words"].sum()) == sum(wc.values())
    assert int(e["n_pieces"].sum()) == int(model.counts.sum())


def test_video_scene_cut_exact_detection(ray_session):
    """Scene-cut detection over the planted fixture: every planted cut
    found at exactly its frame, zero false positives, and the fixture
    separation (max natural SAD < threshold < min planted SAD) holds
    with margin."""
    import numpy as np

    from raysketch.stages.multimodal import (VideoSceneCut,
                                             make_scenecut_y4m_table)

    t = make_scenecut_y4m_table(128, seed=13)
    cuts = dict(zip(t.column("item_id").to_pylist(),
                    t.column("cut_frame").to_pylist()))
    out = VideoSceneCut()(t).to_pandas()
    planted = out[[cuts[i] != -1 for i in out["item_id"]]]
    natural = out[[cuts[i] == -1 for i in out["item_id"]]]
    assert len(planted) == sum(1 for c in cuts.values() if c != -1)
    for _, r in planted.iterrows():
        assert r["frame_idx"] == cuts[r["item_id"]]
    assert (natural["frame_idx"] == -1).all()
    assert natural["sad_fp"].max() < 60_000 < planted["sad_fp"].min()


def test_audio_resample_roundtrip(ray_session):
    """Resample: exact output length n_in//k, new rate rate//k, the
    payload decodes, and a pure 440 Hz tone decimated 4× keeps its
    RMS within 2% (box low-pass passes a tone far below the new
    Nyquist)."""
    import numpy as np
    import pyarrow as pa

    from raysketch.stages.multimodal import AudioResample
    from raysketch.stages.wavcodec import decode_wav, encode_wav

    sr = 16000
    ts = np.arange(sr) / sr
    tone = 0.5 * np.sin(2 * np.pi * 440 * ts)
    batch = pa.table({"item_id": pa.array([0], pa.int64()),
                      "payload": pa.array([encode_wav(tone, sr)],
                                          pa.binary())})
    out = AudioResample(factor=4)(batch)
    assert out.column("n_in")[0].as_py() == sr
    assert out.column("n_out")[0].as_py() == sr // 4
    assert out.column("sample_rate")[0].as_py() == sr // 4
    y, rate = decode_wav(out.column("payload")[0].as_py())
    assert rate == sr // 4 and len(y) == sr // 4
    rms_in = np.sqrt((tone ** 2).mean())
    rms_out = np.sqrt((np.asarray(y[:, 0]) ** 2).mean())
    assert abs(rms_out - rms_in) / rms_in < 0.02

    from raysketch.pipelines import queries as Q
    import pandas as pd
    a = Q.audio_resample_stats("/root/testdata/sf0.001")
    assert (a["n_out"] == a["n_in"] // 4).all()
    pd.testing.assert_frame_equal(
        a, Q.audio_resample_stats("/root/testdata/sf0.001"))
    v = Q.video_scene_cuts("/root/testdata/sf0.001")
    pd.testing.assert_frame_equal(
        v, Q.video_scene_cuts("/root/testdata/sf0.001"))


class TestTimeTravel:
    def _mk(self, tmp_path, ray_session):
        import pandas as pd
        import ray.data

        from raysketch.stages.timetravel import (
            commit, write_partitioned_files)

        root = str(tmp_path / "tt")
        df = pd.DataFrame({"k": range(100), "v": range(100)})
        df["__p"] = df["k"] // 50  # 2 partitions
        f0 = write_partitioned_files(ray.data.from_pandas(df),
                                     f"{root}/v0", "__p")
        commit(root, add=f0)
        # v1: copy-on-write of partition 0 only (v doubled)
        upd = df[df["__p"] == 0].copy()
        upd["v"] = upd["v"] * 2
        f1 = write_partitioned_files(ray.data.from_pandas(upd),
                                     f"{root}/v1", "__p")
        p0 = [f for f in f0 if "__p=0" in f]
        commit(root, add=f1, remove=p0)
        return root, f0, f1, p0

    def test_as_of_reads_each_snapshot(self, tmp_path, ray_session):
        from raysketch.stages.timetravel import read_as_of

        root, f0, f1, p0 = self._mk(tmp_path, ray_session)
        d0 = read_as_of(root, 0).to_pandas().sort_values("k")
        d1 = read_as_of(root, 1).to_pandas().sort_values("k")
        assert list(d0["v"]) == list(range(100))
        assert list(d1["v"]) == [2 * x for x in range(50)] \
            + list(range(50, 100))
        # default = latest
        dl = read_as_of(root).to_pandas().sort_values("k")
        assert list(dl["v"]) == list(d1["v"])

    def test_copy_on_write_reuses_untouched_files(self, tmp_path,
                                                  ray_session):
        from raysketch.stages.timetravel import active_files

        root, f0, f1, p0 = self._mk(tmp_path, ray_session)
        a0, a1 = set(active_files(root, 0)), set(active_files(root, 1))
        untouched = {f for f in f0 if "__p=1" in f}
        assert untouched and untouched <= a0 and untouched <= a1
        assert set(p0) <= a0 and not (set(p0) & a1)

    def test_vacuum_reclaims_old_versions_only(self, tmp_path,
                                               ray_session):
        import pytest

        from raysketch.stages.timetravel import read_as_of, vacuum

        root, f0, f1, p0 = self._mk(tmp_path, ray_session)
        deleted = vacuum(root, keep_from=1)
        assert sorted(deleted) == sorted(p0)
        assert read_as_of(root, 1).count() == 100
        with pytest.raises(ValueError, match="no longer readable"):
            read_as_of(root, 0)

    def test_orphan_files_invisible(self, tmp_path, ray_session):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as papq

        from raysketch.stages.timetravel import active_files, vacuum

        root, *_ = self._mk(tmp_path, ray_session)
        orphan = f"{root}/v9/orphan.parquet"
        import os

        os.makedirs(f"{root}/v9", exist_ok=True)
        papq.write_table(pa.table({"k": [1]}), orphan)
        assert orphan not in active_files(root)
        assert orphan in vacuum(root, keep_from=0)

    def test_version_bounds(self, tmp_path, ray_session):
        import pytest

        from raysketch.stages.timetravel import active_files

        root, *_ = self._mk(tmp_path, ray_session)
        with pytest.raises(ValueError):
            active_files(root, 2)
        with pytest.raises(ValueError):
            active_files(str(tmp_path / "nope"))


class TestImageBilinearResize:
    def test_identity_is_exact(self):
        import numpy as np

        from raysketch.stages.multimodal import ImageBilinearResize

        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, size=(37, 53, 3)).astype(np.uint8)
        assert (ImageBilinearResize((37, 53)).resize_one(img) == img).all()

    def test_constant_preserved(self):
        import numpy as np

        from raysketch.stages.multimodal import ImageBilinearResize

        c = np.full((20, 30, 3), 117, np.uint8)
        assert (ImageBilinearResize((13, 7)).resize_one(c) == 117).all()

    def test_matches_float_reference_within_rounding(self):
        """Exact fixed point vs float64 bilinear: equal except at
        .5-boundary pixels (≤1 level), and bit-identical across runs."""
        import numpy as np

        from raysketch.stages.multimodal import ImageBilinearResize

        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, size=(41, 29, 3)).astype(np.uint8)

        def ref(img, H, W):
            h, w = img.shape[:2]
            ys = (np.arange(H) + 0.5) * h / H - 0.5
            xs = (np.arange(W) + 0.5) * w / W - 0.5
            fy = np.where((np.floor(ys) < 0) | (np.floor(ys) >= h - 1),
                          0, ys - np.floor(ys))
            fx = np.where((np.floor(xs) < 0) | (np.floor(xs) >= w - 1),
                          0, xs - np.floor(xs))
            y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
            x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
            y1 = np.minimum(y0 + 1, h - 1)
            x1 = np.minimum(x0 + 1, w - 1)
            p = img.astype(np.float64)
            top = p[y0][:, x0] * (1 - fx)[None, :, None] \
                + p[y0][:, x1] * fx[None, :, None]
            bot = p[y1][:, x0] * (1 - fx)[None, :, None] \
                + p[y1][:, x1] * fx[None, :, None]
            v = top * (1 - fy)[:, None, None] + bot * fy[:, None, None]
            return np.floor(v + 0.5).astype(np.int64)

        for (H, W) in [(16, 16), (64, 64), (5, 80), (24, 24)]:
            st = ImageBilinearResize((H, W))
            got = st.resize_one(img).astype(np.int64)
            assert np.abs(got - ref(img, H, W)).max() <= 1
            assert (st.resize_one(img).astype(np.int64) == got).all()

    def test_query_runs_and_is_deterministic(self, ray_session):
        import pandas as pd

        import __ray_entry__ as e

        q = e.queries()["image_resize_stats"]
        a = q("/root/testdata/sf0.001")
        b = q("/root/testdata/sf0.001")
        assert len(a) >= 32
        pd.testing.assert_frame_equal(a, b)


class TestBitmapIndex:
    def test_partials_fold_equals_direct(self):
        """OR-scattering per-batch partials equals building the bitmap
        from all rows at once (idempotent/commutative OR ⇒ any split)."""
        import numpy as np

        from raysketch.stages.bitmapindex import bitmap_partials

        rng = np.random.default_rng(0)
        n = 5000
        ids = rng.permutation(n).astype(np.int64)
        codes = rng.integers(0, 3, size=n).astype(np.int64)
        vals = ["a", "b", "c"]
        nw = (n + 63) >> 6

        def fold(chunks):
            bms = {v: np.zeros(nw, dtype=np.uint64) for v in vals}
            for lo, hi in chunks:
                df = bitmap_partials(ids[lo:hi], codes[lo:hi], "c", vals)
                for v, g in df.groupby("value"):
                    np.bitwise_or.at(
                        bms[v], g["word"].to_numpy(dtype=np.int64),
                        g["bits"].to_numpy(dtype=np.int64).view(np.uint64))
            return bms

        a = fold([(0, n)])
        b = fold([(0, 1234), (1234, 1234), (1234, 4000), (4000, n)])
        for v in vals:
            assert (a[v] == b[v]).all()
            # ground truth membership
            want = np.zeros(n, dtype=bool)
            want[ids[codes == vals.index(v)]] = True
            got = ((a[v][np.arange(n) >> 6]
                    >> (np.arange(n) & 63).astype(np.uint64)) & 1) == 1
            assert (got == want).all()

    def test_boolean_algebra_and_popcount(self):
        import numpy as np

        from raysketch.stages.bitmapindex import bitmap_partials, popcount

        n = 300
        ids = np.arange(n, dtype=np.int64)
        c1 = (ids % 2).astype(np.int64)      # even/odd
        c2 = (ids % 3 == 0).astype(np.int64)  # mult of 3
        nw = (n + 63) >> 6

        def bm_of(codes, vals, want_val):
            bm = np.zeros(nw, dtype=np.uint64)
            df = bitmap_partials(ids, codes, "x", vals)
            g = df[df["value"] == want_val]
            np.bitwise_or.at(bm, g["word"].to_numpy(dtype=np.int64),
                             g["bits"].to_numpy(dtype=np.int64)
                             .view(np.uint64))
            return bm

        even = bm_of(c1, ["even", "odd"], "even")
        mult3 = bm_of(c2, ["no", "yes"], "yes")
        assert popcount(even & mult3) == sum(
            1 for i in range(n) if i % 2 == 0 and i % 3 == 0)
        assert popcount(even | mult3) == sum(
            1 for i in range(n) if i % 2 == 0 or i % 3 == 0)
        # NOT needs masking the tail bits beyond n
        full = np.full(nw, ~np.uint64(0), dtype=np.uint64)
        tail = n & 63
        if tail:
            full[-1] = (np.uint64(1) << np.uint64(tail)) - np.uint64(1)
        assert popcount(full & ~even) == n // 2

    def test_index_rebuild_bit_identical(self, ray_session, tmp_path):
        import pyarrow.parquet as pq
        import ray.data

        import __ray_entry__ as e

        a = e.queries()["bitmap_served_counts"]("/root/testdata/sf0.001")
        b = e.queries()["bitmap_served_counts"]("/root/testdata/sf0.001")
        import pandas as pd

        pd.testing.assert_frame_equal(a, b)


class TestPositionalIndex:
    def test_phrase_matches_brute_force_three_terms(self, ray_session,
                                                    tmp_path):
        import pandas as pd
        import ray.data

        from raysketch.stages.invindex import (build_positional_index,
                                               phrase_search)

        docs = pd.DataFrame({
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "a b c a b c",       # 'a b c' twice
                "a b x a b",         # 'a b' twice, no 'a b c'
                "c a b c",           # once
                "a a b c c",         # once
                "b c a",             # zero (wraps don't count)
                "",                  # empty
            ],
        })
        idx = str(tmp_path / "pidx")
        build_positional_index(ray.data.from_pandas(docs).repartition(3),
                               idx, n_shards=4)
        got = phrase_search(idx, ["a", "b", "c"])
        want = {}
        for r in docs.itertuples():
            ts = r.text.split(" ")
            n = sum(1 for i in range(len(ts) - 2)
                    if ts[i:i + 3] == ["a", "b", "c"])
            if n:
                want[r.doc_id] = n
        assert {int(d): int(n) for d, n in
                zip(got["doc_id"], got["n_occ"])} == want
        # two-term phrase too
        got2 = phrase_search(idx, ["a", "b"])
        want2 = {}
        for r in docs.itertuples():
            ts = r.text.split(" ")
            n = sum(1 for i in range(len(ts) - 1)
                    if ts[i:i + 2] == ["a", "b"])
            if n:
                want2[r.doc_id] = n
        assert {int(d): int(n) for d, n in
                zip(got2["doc_id"], got2["n_occ"])} == want2

    def test_rejects_tf_index(self, ray_session, tmp_path):
        import pandas as pd
        import pytest
        import ray.data

        from raysketch.stages.invindex import (build_inverted_index,
                                               phrase_search)

        docs = pd.DataFrame({"doc_id": [0], "text": ["a b"]})
        idx = str(tmp_path / "tfidx")
        build_inverted_index(ray.data.from_pandas(docs), idx, n_shards=2)
        with pytest.raises(ValueError, match="positional"):
            phrase_search(idx, ["a", "b"])

    def test_absent_term_returns_empty(self, ray_session, tmp_path):
        import pandas as pd
        import ray.data

        from raysketch.stages.invindex import (build_positional_index,
                                               phrase_search)

        docs = pd.DataFrame({"doc_id": [0], "text": ["a b"]})
        idx = str(tmp_path / "pidx2")
        build_positional_index(ray.data.from_pandas(docs), idx,
                               n_shards=2)
        assert len(phrase_search(idx, ["a", "zz"])) == 0


class TestAudioVad:
    def test_planted_burst_recall_exact(self):
        import numpy as np

        from raysketch.stages.multimodal import (AudioVadSegments,
                                                 make_vad_wav_table)

        t = make_vad_wav_table(24, seed=3)
        out = AudioVadSegments()(t)
        nb = t.column("n_bursts").to_numpy()
        seg = out.column("n_segments").to_numpy()
        assert (nb == seg).all()
        assert (out.column("n_voiced").to_numpy() > 0).all()
        assert (out.column("longest_run").to_numpy() > 0).all()
        # silence padding means voiced < total frames everywhere
        assert (out.column("n_voiced").to_numpy()
                < out.column("n_frames").to_numpy()).all()

    def test_all_silence_and_all_voice(self):
        import numpy as np
        import pyarrow as pa

        from raysketch.stages.multimodal import AudioVadSegments
        from raysketch.stages.wavcodec import encode_wav

        rate = 8000
        silent = encode_wav(np.zeros(rate), rate, bits=16)
        t = np.arange(rate) / rate
        loud = encode_wav(0.5 * np.sin(2 * np.pi * 440 * t), rate,
                          bits=16)
        tb = pa.table({"item_id": pa.array([0, 1], type=pa.int64()),
                       "payload": pa.array([silent, loud],
                                           type=pa.binary())})
        out = AudioVadSegments()(tb)
        assert out.column("n_segments").to_pylist() == [0, 1]
        assert out.column("n_voiced").to_pylist()[0] == 0
        nf = out.column("n_frames").to_pylist()[1]
        assert out.column("longest_run").to_pylist()[1] == nf

    def test_query_deterministic(self, ray_session):
        import pandas as pd

        import __ray_entry__ as e

        a = e.queries()["audio_vad_segments"]("/root/testdata/sf0.001")
        b = e.queries()["audio_vad_segments"]("/root/testdata/sf0.001")
        pd.testing.assert_frame_equal(a, b)
        assert len(a) >= 24


class TestTimeTravelStats:
    def test_log_served_pruning_skips_files(self, ray_session):
        """The key-range read must open strictly fewer files than the
        snapshot holds (stats pruning), for BOTH versions, and the
        changed-file diff must touch fewer files than either
        snapshot."""
        from raysketch.pipelines.queries import _ttorders_stats_table
        from raysketch.stages.timetravel import (active_files,
                                                 active_files_pruned,
                                                 changed_files)

        sf_dir = "/root/testdata/sf0.001"
        root, maxk1 = _ttorders_stats_table(sf_dir)
        lo, hi = maxk1 // 8, 3 * maxk1 // 8 - 1
        for v in (0, 1):
            files, total = active_files_pruned(root, v, lo, hi)
            assert 0 < len(files) < total
        added, removed = changed_files(root, 0, 1)
        n_active = len(active_files(root, 1))
        assert added and removed
        assert len(added) + len(removed) < 2 * n_active
        # shared files appear in neither list
        shared = set(active_files(root, 0)) & set(active_files(root, 1))
        assert shared and not (shared & set(added)) \
            and not (shared & set(removed))

    def test_pruning_is_superset_never_drops(self, ray_session):
        """A predicate covering everything prunes nothing; stats-less
        files are kept."""
        from raysketch.pipelines.queries import _ttorders_stats_table
        from raysketch.stages.timetravel import active_files_pruned

        root, maxk1 = _ttorders_stats_table("/root/testdata/sf0.001")
        files, total = active_files_pruned(root, 1, 0, maxk1)
        assert len(files) == total


class TestImageHistEq:
    def test_constant_image_unchanged_value_class(self):
        import numpy as np

        from raysketch.stages.multimodal import ImageHistEq

        c = np.full((16, 16, 3), 73, np.uint8)
        out = ImageHistEq().eq_one(c)
        # a single value maps to one value (all mass at one level)
        assert len(np.unique(out)) == 1

    def test_monotone_order_preserving(self):
        import numpy as np

        from raysketch.stages.multimodal import ImageHistEq

        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, size=(20, 20, 3)).astype(np.uint8)
        out = ImageHistEq().eq_one(img)
        for c in range(3):
            a = img[:, :, c].ravel()
            b = out[:, :, c].ravel()
            order = np.argsort(a, kind="stable")
            assert (np.diff(b[order].astype(np.int64)) >= 0).all()

    def test_uniform_ramp_identity_and_low_contrast_stretches(self):
        import numpy as np

        from raysketch.stages.multimodal import ImageHistEq

        ramp = np.tile(np.arange(256, dtype=np.uint8), 256) \
            .reshape(256, 256, 1).repeat(3, axis=2)
        out = ImageHistEq().eq_one(ramp)
        assert np.abs(out.astype(int) - ramp.astype(int)).max() <= 1
        # a low-contrast band [100, 120) stretches to span ~[0, 255]
        rng = np.random.default_rng(1)
        low = rng.integers(100, 120, size=(64, 64, 3)).astype(np.uint8)
        eq = ImageHistEq().eq_one(low)
        assert int(eq.max()) >= 250 and int(eq.min()) <= 5

    def test_deterministic(self):
        import numpy as np

        from raysketch.stages.multimodal import ImageHistEq

        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, size=(33, 47, 3)).astype(np.uint8)
        a = ImageHistEq().eq_one(img)
        b = ImageHistEq().eq_one(img)
        assert (a == b).all()


class TestCharSpanDedup:
    """Char-level exact-substring dedup (stages/dedup.py
    dup_span_stats): brute-force equality on a planted corpus, plus
    layout independence."""

    L = 16

    @staticmethod
    def _brute(texts: dict[int, str], L: int):
        """O(n²) reference: count every L-byte window across the whole
        corpus, mark all windows with count ≥ 2, merge spans, excise."""
        from collections import Counter

        cnt = Counter()
        for t in texts.values():
            b = t.encode()
            for p in range(max(len(b) - L + 1, 0)):
                cnt[b[p:p + L]] += 1
        out = {}
        for i, t in texts.items():
            b = t.encode()
            starts = [p for p in range(max(len(b) - L + 1, 0))
                      if cnt[b[p:p + L]] >= 2]
            mask = bytearray(len(b))
            for p in starts:
                for j in range(p, min(p + L, len(b))):
                    mask[j] = 1
            kept = bytes(c for c, m in zip(b, mask) if not m)
            cover = sum(mask)
            out[i] = dict(n_windows=max(len(b) - L + 1, 0),
                          n_dup_windows=len(starts),
                          dup_cover_chars=cover,
                          kept_chars=len(b) - cover,
                          text_kept=kept.decode())
        return out

    def _corpus(self):
        boiler = "SUBSCRIBE TO OUR NEWSLETTER TODAY PLEASE"  # 40 B shared
        texts = {
            1: "unique first document text aaa " + boiler + " tail one",
            2: "second doc body bbbb " + boiler + " different tail",
            3: "internal repeat XYZXYZXYZXYZXYZXYZXYZXYZ repeat done",
            4: "wholly unique document with no duplicated content qq",
            5: boiler,                       # doc fully covered
            6: "tiny",                       # shorter than L
        }
        return texts

    def test_equals_brute_force(self, ray_session):
        import ray

        from raysketch.stages.dedup import dup_span_stats

        texts = self._corpus()
        gold = self._brute(texts, self.L)
        tbl = pa.table({"doc_id": pa.array(list(texts), pa.int64()),
                        "text": pa.array(list(texts.values()))})
        for parts in (1, 4):
            ds = ray.data.from_arrow(tbl).repartition(parts)
            out = dup_span_stats(ds, L=self.L, masked=True).to_pandas()
            out = out.sort_values("doc_id").reset_index(drop=True)
            assert list(out["doc_id"]) == sorted(texts)
            for _, r in out.iterrows():
                g = gold[int(r["doc_id"])]
                for k in ("n_windows", "n_dup_windows",
                          "dup_cover_chars", "kept_chars"):
                    assert int(r[k]) == g[k], (r["doc_id"], k)
                assert r["text_kept"] == g["text_kept"], r["doc_id"]

    def test_internal_repeat_caught(self, ray_session):
        """A window repeated WITHIN one doc is duplicated content —
        doc-level and first-kept token dedup both miss this."""
        import ray

        from raysketch.stages.dedup import dup_span_stats

        texts = self._corpus()
        tbl = pa.table({"doc_id": pa.array(list(texts), pa.int64()),
                        "text": pa.array(list(texts.values()))})
        out = dup_span_stats(ray.data.from_arrow(tbl), L=self.L,
                             masked=True).to_pandas()
        r3 = out[out["doc_id"] == 3].iloc[0]
        assert r3["n_dup_windows"] > 0
        assert "XYZXYZXYZXYZ" not in r3["text_kept"]
        r5 = out[out["doc_id"] == 5].iloc[0]
        assert r5["text_kept"] == ""            # fully excised
        r6 = out[out["doc_id"] == 6].iloc[0]
        assert r6["text_kept"] == "tiny" and r6["n_windows"] == 0

    def test_long_window_hashes_match_direct(self):
        """Chained chunk hashes: equal windows ⇒ equal hashes, and the
        hash depends only on the window bytes (alignment-free)."""
        from raysketch.stages.dedup import _long_window_hashes

        rng = np.random.default_rng(7)
        b1 = rng.integers(65, 91, 200).astype(np.uint8)
        # same 48-byte payload at different offsets in different docs
        pay = rng.integers(65, 91, 48).astype(np.uint8)
        d1 = np.concatenate([b1[:10], pay, b1[10:40]])
        d2 = np.concatenate([b1[40:67], pay, b1[70:90]])
        data = np.concatenate([d1, d2])
        off = np.array([0, len(d1), len(d1) + len(d2)], dtype=np.int64)
        h, woff = _long_window_hashes(data, off, 48)
        h1 = h[woff[0]:woff[1]][10]          # window at pay's offset in d1
        h2 = h[woff[1]:woff[2]][27]          # window at pay's offset in d2
        assert h1 == h2
        # and a different window differs
        assert h[woff[0]:woff[1]][0] != h1

    def test_broadcast_and_exchange_tiers_equal(self, ray_session):
        """broadcast_limit=0 forces the attach-positions exchange
        fallback; both tiers must be frame-identical (same hash
        function, same span algebra)."""
        import ray

        from raysketch.stages.dedup import dup_span_stats

        texts = self._corpus()
        tbl = pa.table({"doc_id": pa.array(list(texts), pa.int64()),
                        "text": pa.array(list(texts.values()))})
        ds = ray.data.from_arrow(tbl).repartition(3)
        cols = ["doc_id", "n_windows", "n_dup_windows",
                "dup_cover_chars", "kept_chars", "text_kept"]
        a = dup_span_stats(ds, L=self.L, masked=True).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)[cols]
        b = dup_span_stats(ds, L=self.L, masked=True,
                           broadcast_limit=0).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)[cols]
        pd.testing.assert_frame_equal(a, b)


def test_propagate_store_budget_warning(ray_session, monkeypatch):
    """The round-working-set vs object-store check warns LOUDLY (the
    alternative is a silent executor livelock — BASELINE.md round-5);
    an absurdly low warn fraction must trip it on any input, and the
    result must be unaffected."""
    import warnings

    import ray

    from raysketch.stages import dedup as D

    pairs = pd.DataFrame({"id_a": [1, 2, 3], "id_b": [2, 3, 9]})
    ds = ray.data.from_pandas(pairs)
    monkeypatch.setattr(D, "_STORE_WARN_FRACTION", 1e-18)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = D.propagate_components(ds).to_pandas()
    assert any("LIVELOCK" in str(x.message) for x in w)
    got = dict(zip(out["node"], out["label"]))
    assert got == {1: 1, 2: 1, 3: 1, 9: 1}
