"""Distributed INVERTED INDEX: term → postings-list state table, and
index-served keyword search (the retrieval analog of the sketch-rollup
pattern — pay one distributed build, then answer queries from pruned
KB-scale reads instead of rescanning the corpus).

Layout::

    index_dir/shards/shard=K/*.parquet   (term, doc_id, tf) sorted by
                                         (term, doc_id) within the shard
    index_dir/meta.json                  (n_docs, n_shards, cols;
                                         written LAST = completeness)

Build is one streaming pass + one hash exchange: ``map_batches``
tokenizes each document batch and reduces it to per-(doc, term) tf rows
(Arrow split + flatten; docs are whole rows, so within-batch counting
is exact — no cross-batch combine needed), terms are hash-assigned to
``n_shards`` via the engine-wide murmur64a, and one
``groupby(shard).map_groups`` sorts each shard's postings by (term,
doc_id) before the partitioned parquet write. Document text never
moves — only 24-byte-plus-term postings rows cross the wire, and the
within-shard term sort gives every parquet row group tight min/max
term statistics.

Search never touches the corpus: query terms map to their shards, the
read opens ONLY those shard directories with a ``term IN terms`` filter
(row groups outside the terms' ranges prune on statistics), document
frequencies come from the postings themselves, and scoring is integer
fixed-point tf·idf — ``idf_fp = (n_docs · 2^20) // df`` — so the exact
same ranking is statable in SQL (DuckDB ``//``) and value-hash-checked
by the driver gate. Driver-side work is O(Σ df(term)) for the query's
terms — bounded by selectivity, independent of corpus size; that is
the point of an index.

At 100 TB: shards are independent directories (build appends per
ingest like the rollup/incremental indexes; duplicate (term, doc)
rows cannot arise within one build because tf is computed per whole
document), n_shards scales with the term universe, and a search
fans out at most len(terms) pruned reads.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..hashing import murmur64a

__all__ = ["build_inverted_index", "search_index", "term_shard",
           "IDF_SCALE"]

IDF_SCALE = 1 << 20


def term_shard(terms, n_shards: int) -> np.ndarray:
    """Shard id per term: murmur64a over the utf-8 bytes, mod n_shards
    (the engine's one hash — same function the dedup exchanges use)."""
    arr = pa.array([str(t) for t in terms], type=pa.large_utf8())
    buf = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    data = np.frombuffer(buf.buffers()[2], dtype=np.uint8) if buf.buffers()[2] else np.empty(0, np.uint8)
    offsets = np.frombuffer(buf.buffers()[1], dtype=np.int64)
    h = murmur64a(data, offsets)
    return (h % np.uint64(n_shards)).astype(np.int64)


def build_inverted_index(ds, index_dir: str, text_col: str = "text",
                         id_col: str = "doc_id", n_shards: int = 32
                         ) -> dict:
    """Build the index from a Dataset of (id_col, text_col) rows;
    returns the meta dict. Whitespace tokenization (the corpus
    convention shared by explode_words and its SQL oracle); empty
    tokens are dropped on both engines."""
    import shutil

    import pandas as pd

    n_docs = ds.count()

    def postings(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(
            pc.fill_null(t.column(text_col), ""), " ").combine_chunks()
        counts = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        parent = np.repeat(ids, counts)
        lens = np.repeat(counts.astype(np.int64), counts)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"term": flat.to_pandas()[keep],
                           id_col: parent[keep],
                           "len": lens[keep]})
        g = df.groupby(["term", id_col, "len"], as_index=False).size() \
            .rename(columns={"size": "tf"})
        sh = term_shard(g["term"].to_numpy(), n_shards)
        # one totals row per batch so meta can record corpus token mass
        return pa.table({
            "term": pa.array(g["term"].to_numpy(), type=pa.string()),
            id_col: pa.array(g[id_col].to_numpy(dtype=np.int64)),
            "len": pa.array(g["len"].to_numpy(dtype=np.int64)),
            "tf": pa.array(g["tf"].to_numpy(dtype=np.int64)),
            "shard": pa.array(sh),
        })

    def sort_shard(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["term", id_col], kind="stable") \
            .reset_index(drop=True)

    # corpus token mass (doc len = token count incl. empty tokens is
    # NOT used; len here counts split tokens, matching
    # len(string_split(text, ' ')) in SQL)
    def lenrow(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(
            pc.fill_null(t.column(text_col), ""), " ")
        n = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        return pa.table({"tc": pa.array([int(n.sum())])})

    total_tokens = 0
    for b in ds.map_batches(lenrow, batch_format="pyarrow") \
            .iter_batches(batch_format="pyarrow", batch_size=None):
        if b.num_rows:
            total_tokens += int(b.column("tc").to_numpy().sum())

    rows = ds.map_batches(postings, batch_format="pyarrow") \
        .groupby("shard").map_groups(sort_shard, batch_format="pandas")
    shards_dir = os.path.join(index_dir, "shards")
    shutil.rmtree(shards_dir, ignore_errors=True)
    os.makedirs(shards_dir, exist_ok=True)
    rows.write_parquet(shards_dir, partition_cols=["shard"])
    meta = {"kind": "inverted", "version": 2, "text_col": text_col,
            "id_col": id_col, "n_shards": n_shards,
            "n_docs": int(n_docs), "total_tokens": int(total_tokens)}
    mpath = os.path.join(index_dir, "meta.json")
    with open(mpath + ".tmp", "w") as f:
        json.dump(meta, f)
    os.replace(mpath + ".tmp", mpath)
    return meta


def search_index(index_dir: str, terms: list[str], k: int = 20,
                 audit: dict | None = None):
    """Top-k documents for ``terms`` by integer tf·idf, served purely
    from the index: reads ONLY the terms' shards with a term-IN filter,
    scores score_fp = Σ_t tf · ((n_docs·2^20) // df_t), ranks by
    (score_fp DESC, id ASC). Returns a pandas DataFrame
    (id_col, score_fp, n_terms). ``audit`` (optional dict) receives
    {"files_read", "files_total", "postings_rows"} as pruning
    evidence."""
    import pandas as pd
    import pyarrow.parquet as pq

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    id_col = meta["id_col"]
    n_shards = meta["n_shards"]
    terms = sorted(set(terms))
    shards = sorted(set(term_shard(terms, n_shards).tolist()))
    files: list[str] = []
    for s in shards:
        files.extend(sorted(glob.glob(os.path.join(
            index_dir, "shards", f"shard={s}", "*.parquet"))))
    if audit is not None:
        audit["files_read"] = len(files)
        audit["files_total"] = len(glob.glob(os.path.join(
            index_dir, "shards", "shard=*", "*.parquet")))
    if not files:
        return pd.DataFrame({id_col: np.empty(0, np.int64),
                             "score_fp": np.empty(0, np.int64),
                             "n_terms": np.empty(0, np.int64)})
    t = pq.read_table(files, columns=["term", id_col, "tf"],
                      filters=[("term", "in", terms)])
    post = t.to_pandas()
    if audit is not None:
        audit["postings_rows"] = len(post)
    if not len(post):
        return pd.DataFrame({id_col: np.empty(0, np.int64),
                             "score_fp": np.empty(0, np.int64),
                             "n_terms": np.empty(0, np.int64)})
    df_t = post.groupby("term")[id_col].size()
    idf_fp = (int(meta["n_docs"]) * IDF_SCALE) // df_t
    post = post.assign(w=post["tf"].to_numpy(dtype=np.int64)
                       * idf_fp.loc[post["term"]].to_numpy(dtype=np.int64))
    g = post.groupby(id_col, as_index=False).agg(
        score_fp=("w", "sum"), n_terms=("term", "size"))
    g = g.sort_values(["score_fp", id_col],
                      ascending=[False, True], kind="stable").head(k)
    return g.reset_index(drop=True).astype(
        {id_col: "int64", "score_fp": "int64", "n_terms": "int64"})


def bm25_search_index(index_dir: str, terms: list[str], k: int = 20,
                      audit: dict | None = None):
    """BM25 served purely from the v2 index (postings carry the doc's
    token length — the impact-index convention — and meta records
    n_docs / total_tokens, so NO corpus access happens at query
    time): the engine's exact fixed-point form
    idf_fp·44·tf·TC // (20·tf·TC + 6·TC + 18·len·N) with
    idf_fp = (N·2²⁰)//df, k1=6/5, b=3/4 (see pipelines.queries
    _bm25_rank for the derivation). Reads only the query terms'
    shards with a term-IN filter; driver work is O(Σ df)."""
    import pandas as pd
    import pyarrow.parquet as pq

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    if meta.get("version", 1) < 2:
        raise ValueError("bm25_search_index needs a v2 index "
                         "(postings with doc lengths)")
    id_col = meta["id_col"]
    N = int(meta["n_docs"])
    TC = int(meta["total_tokens"])
    terms = sorted(set(terms))
    shards = sorted(set(term_shard(terms, meta["n_shards"]).tolist()))
    files: list[str] = []
    for s in shards:
        files.extend(sorted(glob.glob(os.path.join(
            index_dir, "shards", f"shard={s}", "*.parquet"))))
    if audit is not None:
        audit["files_read"] = len(files)
        audit["files_total"] = len(glob.glob(os.path.join(
            index_dir, "shards", "shard=*", "*.parquet")))
    empty = pd.DataFrame({id_col: np.empty(0, np.int64),
                          "score_fp": np.empty(0, np.int64),
                          "n_terms": np.empty(0, np.int64)})
    if not files:
        return empty
    post = pq.read_table(files, columns=["term", id_col, "len", "tf"],
                         filters=[("term", "in", terms)]).to_pandas()
    if not len(post):
        return empty
    df_t = post.groupby("term")[id_col].size()
    idf = df_t.map(lambda d: (N << 20) // int(d))
    tf = post["tf"].to_numpy(dtype=np.int64)
    ln = post["len"].to_numpy(dtype=np.int64)
    num = idf.loc[post["term"]].to_numpy(dtype=np.int64) \
        * (44 * tf * TC)
    assert num.max(initial=0) < (1 << 62), "BM25 fixed point overflow"
    post = post.assign(w=num // (20 * tf * TC + 6 * TC + 18 * ln * N))
    g = post.groupby(id_col, as_index=False).agg(
        score_fp=("w", "sum"), n_terms=("term", "size"))
    g = g.sort_values(["score_fp", id_col],
                      ascending=[False, True], kind="stable").head(k)
    return g.reset_index(drop=True).astype(
        {id_col: "int64", "score_fp": "int64", "n_terms": "int64"})


def build_positional_index(ds, index_dir: str, text_col: str = "text",
                           id_col: str = "doc_id", n_shards: int = 32
                           ) -> dict:
    """POSITIONAL inverted index (v3): postings carry every occurrence
    position, the structure PHRASE queries need (adjacency is not
    derivable from tf). Build cost is the honest positional price —
    one (term, doc, pos) row per TOKEN crosses the term-hash exchange
    (vs one per distinct (term, doc) for the tf index; document lengths
    bound it) — then each shard packs positions into one
    list<int64> row per (term, doc), sorted by (term, doc) for the
    same row-group pruning the tf index gets. Positions are 0-based
    token offsets under the corpus-wide whitespace tokenization
    (empty tokens KEEP their slots, so SQL list indices map 1:1:
    our pos p ≡ DuckDB ts[p+1])."""
    import shutil

    import pandas as pd

    n_docs = ds.count()

    def occ_rows(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(
            pc.fill_null(t.column(text_col), ""), " ").combine_chunks()
        counts = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(words)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        parent = np.repeat(ids, counts)
        # position = index within the doc's token list (empties keep slots)
        ends = np.cumsum(counts)
        pos = np.arange(int(ends[-1]) if len(ends) else 0,
                        dtype=np.int64) - np.repeat(ends - counts, counts)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        terms = flat.to_pandas()[keep].to_numpy()
        sh = term_shard(terms, n_shards)
        return pa.table({
            "term": pa.array(terms, type=pa.string()),
            id_col: pa.array(parent[keep]),
            "pos": pa.array(pos[keep]),
            "shard": pa.array(sh),
        })

    def pack_shard(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        if not len(g):  # empty frames must keep the SAME columns
            return pd.DataFrame({"term": pd.Series([], dtype=object),
                                 id_col: pd.Series([], dtype=np.int64),
                                 "positions": pd.Series([], dtype=object),
                                 "shard": pd.Series([], dtype=np.int64)})
        t = g["term"].to_numpy()
        d = g[id_col].to_numpy(dtype=np.int64)
        p = g["pos"].to_numpy(dtype=np.int64)
        order = np.lexsort((p, d, t))
        t, d, p = t[order], d[order], p[order]
        change = np.r_[True, (t[1:] != t[:-1]) | (d[1:] != d[:-1])]
        starts = np.flatnonzero(change)
        ends = np.r_[starts[1:], len(t)]
        return pd.DataFrame({
            "term": t[starts],
            id_col: d[starts],
            "positions": [p[s:e].tolist() for s, e in zip(starts, ends)],
            "shard": np.full(len(starts), int(g["shard"].iloc[0]),
                             dtype=np.int64),
        })

    rows = ds.map_batches(occ_rows, batch_format="pyarrow") \
        .groupby("shard").map_groups(pack_shard, batch_format="pandas")
    shards_dir = os.path.join(index_dir, "shards")
    shutil.rmtree(shards_dir, ignore_errors=True)
    os.makedirs(shards_dir, exist_ok=True)
    rows.write_parquet(shards_dir, partition_cols=["shard"])
    meta = {"kind": "inverted", "version": 3, "positional": True,
            "text_col": text_col, "id_col": id_col,
            "n_shards": n_shards, "n_docs": int(n_docs)}
    mpath = os.path.join(index_dir, "meta.json")
    with open(mpath + ".tmp", "w") as f:
        json.dump(meta, f)
    os.replace(mpath + ".tmp", mpath)
    return meta


def phrase_search(index_dir: str, phrase: list[str]) -> "pd.DataFrame":
    """EXACT phrase query from the positional index alone: read ONLY
    the phrase terms' shards (term-IN filter + row-group stats), align
    per document, and count positions p with p+i ∈ positions(term_i)
    for every i — intersection of shifted position sets, the classic
    positional-postings merge. Driver work is O(Σ df·occ) for the
    phrase's terms, independent of corpus size. Returns
    (doc_id, n_occ), docs with ≥1 occurrence."""
    import pandas as pd
    import pyarrow.parquet as pq_mod

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    if not meta.get("positional"):
        raise ValueError("phrase_search needs a positional (v3) index")
    id_col = meta["id_col"]
    shards = term_shard(phrase, meta["n_shards"])
    per_term = []
    for term, sh in zip(phrase, shards):
        files = sorted(glob.glob(os.path.join(
            index_dir, "shards", f"shard={sh}", "*.parquet")))
        if not files:
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 "n_occ": pd.Series([], dtype=np.int64)})
        import pyarrow.dataset as pads

        t = pads.dataset(files).to_table(
            filter=pads.field("term") == term,
            columns=[id_col, "positions"])
        per_term.append({
            int(d): np.asarray(p, dtype=np.int64)
            for d, p in zip(t.column(id_col).to_pylist(),
                            t.column("positions").to_pylist())})
    first = per_term[0]
    out_d, out_n = [], []
    for d, p0 in first.items():
        cand = p0
        for i, mp in enumerate(per_term[1:], start=1):
            pi = mp.get(d)
            if pi is None:
                cand = cand[:0]
                break
            cand = cand[np.isin(cand + i, pi)]
            if not len(cand):
                break
        if len(cand):
            out_d.append(d)
            out_n.append(len(cand))
    return pd.DataFrame({id_col: np.array(out_d, dtype=np.int64),
                         "n_occ": np.array(out_n, dtype=np.int64)}) \
        .sort_values(id_col).reset_index(drop=True)
