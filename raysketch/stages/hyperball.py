"""HyperBall / HyperANF (Boldi–Vigna–Rosa WWW'11 "HyperANF"; Boldi &
Vigna "In-Core Computation of Geometric Centralities with HyperBall",
arXiv:1308.2144): per-node HLL registers of the out-ball B(v,t),
iterated by shipping registers along in-edges and register-max-merging
per node — the engine's core sketch composed into an iterative
distributed graph operator.

Scale shape: two hash-bucket exchanges per round over (node,
2^p-byte regs) rows — the per-round wire is |E|·2^p bytes, INDEPENDENT
of ball sizes (exact balls explode combinatorially; that is the whole
point of the algorithm). Register max-merge is commutative and
idempotent, so every round — and everything derived from the states —
is byte-deterministic at any parallelism with no per-file-fold crutch.

Per-node estimates use the reference's own estimator path
(alpha·m²/Σ2^-reg with the LINEARCOUNTING branch,
/root/reference/hyperloglog.c:961-1018) vectorized over register-matrix
rows; no m=16384 bias polynomial at other precisions, matching the C.

Harmonic centrality rides the rounds for free: C_H(v) =
Σ_{u≠v} 1/d(v,u) = Σ_{t≥1} (|B(v,t)|−|B(v,t−1)|)/t, accumulated per
node INSIDE the state rows as a fixed-point int64 (scale 2^20, Python
floor division semantics) — zero extra exchanges.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import arrow_to_flat_bytes, hll_patlen, murmur64a
from ..sketches.hll import _PE
from .dedup import _splitmix64

__all__ = ["hyperball"]

_WIRE = pa.large_binary()
_HARM_SCALE = 1 << 20


def _est_rows(R: np.ndarray, m: int) -> np.ndarray:
    """Vectorized hllCount over register-matrix rows (mirrors
    HLL.finalize exactly for m != 16384)."""
    alpha = 0.7213 / (1 + 1.079 / m)
    E = alpha * m * m / _PE[R].sum(axis=1)
    ez = (R == 0).sum(axis=1)
    lc = m * np.log(np.where(ez > 0, m / np.maximum(ez, 1), 1.0))
    use_lc = (E < 2.5 * m) & (ez != 0)
    return np.where(use_lc, lc, E).astype(np.int64)


def hyperball(edge_ds, max_t: int = 3, p: int = 8,
              num_buckets: int = 16):
    """Run ``max_t`` HyperBall rounds over a Dataset of string edges
    ``(w1, w2)``. Returns ``(nf, states)``: ``nf`` is the neighborhood
    function [(t, N(t)=Σ_v |B(v,t)| est)] for t=0..max_t, and
    ``states`` the final materialized Dataset of rows (node int64 word
    hash, regs 2^p-byte large_binary, est int64 = |B(v,max_t)| est,
    harm_fp int64 = harmonic centrality × 2^20). Deterministic (see
    module docstring)."""
    import ray.data  # noqa: F401  (edge_ds already carries the session)

    m = 1 << p
    B = np.uint64(num_buckets)

    def regs_to_col(R: np.ndarray) -> pa.Array:
        offs = np.arange(0, (len(R) + 1) * m, m, dtype=np.int64)
        return pa.LargeBinaryArray.from_buffers(
            _WIRE, len(R),
            [None, pa.py_buffer(offs),
             pa.py_buffer(np.ascontiguousarray(R).view(np.uint8))])

    def col_to_regs(col) -> np.ndarray:
        a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if len(a) == 0:
            return np.zeros((0, m), np.uint8)
        a = a.cast(_WIRE)
        offs = np.frombuffer(a.buffers()[1], np.int64, len(a) + 1,
                             a.offset * 8)
        if a.null_count == 0 and int(offs[-1] - offs[0]) == len(a) * m \
                and bool(np.all(np.diff(offs) == m)):
            raw = np.frombuffer(a.buffers()[2], np.uint8,
                                int(offs[-1] - offs[0]), int(offs[0]))
        else:  # sliced/non-dense: safe per-row copy
            raw = np.frombuffer(b"".join(a.to_pylist()), np.uint8)
        return raw.reshape(len(a), m)

    def bucket_of(n: np.ndarray) -> pa.Array:
        return pa.array((_splitmix64(n.astype(np.uint64)) % B)
                        .astype(np.int64))

    # edges as 63-bit word hashes (ids only ride the exchanges; a hash
    # collision merges two words — the ngram-join caveat, invisible at
    # estimate granularity)
    def to_hashes(t: pa.Table) -> pa.Table:
        cols = {}
        for c, nm in (("w1", "u"), ("w2", "v")):
            data, offsets = arrow_to_flat_bytes(
                t.column(c).combine_chunks().cast(pa.string()))
            cols[nm] = pa.array(
                (murmur64a(data, offsets)
                 & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64))
        return pa.table(cols)

    e = edge_ds.map_batches(to_hashes, batch_format="pyarrow") \
        .materialize()

    def node_rows(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        n = np.unique(np.concatenate([u, v]))
        return pa.table({"node": pa.array(n), "__b": bucket_of(n)})

    def init_group(g: pa.Table) -> pa.Table:
        n = np.unique(g.column("node").to_numpy(zero_copy_only=False))
        idx, cnt = hll_patlen(n.astype(np.uint64), p)
        R = np.zeros((len(n), m), np.uint8)
        R[np.arange(len(n)), idx] = cnt
        est = _est_rows(R, m)
        return pa.table({"node": pa.array(n), "regs": regs_to_col(R),
                         "est": pa.array(est),
                         "harm_fp": pa.array(np.zeros(len(n), np.int64)),
                         "__b": bucket_of(n)})

    states = e.map_batches(node_rows, batch_format="pyarrow") \
        .groupby("__b").map_groups(init_group, batch_format="pyarrow") \
        .materialize()

    def nf_partial(t: pa.Table) -> pa.Table:
        s = t.column("est").to_numpy(zero_copy_only=False)
        return pa.table({"n": pa.array([len(s)], pa.int64()),
                         "s": pa.array([int(s.sum())], pa.int64())})

    def nf_of(st) -> tuple[int, int]:
        parts = st.map_batches(nf_partial, batch_format="pyarrow") \
            .to_pandas()
        return int(parts["n"].sum()), int(parts["s"].sum())

    n_nodes, nf0 = nf_of(states)
    nf = [(0, nf0)]

    def edge_rows_by_v(t: pa.Table) -> pa.Table:
        v = t.column("v").to_numpy(zero_copy_only=False)
        n = len(t)
        zero_offs = np.zeros(n + 1, dtype=np.int64)
        empty = pa.LargeBinaryArray.from_buffers(
            _WIRE, n, [None, pa.py_buffer(zero_offs), pa.py_buffer(b"")])
        z = pa.array(np.zeros(n, np.int64))
        return pa.table({"k": t.column("v"), "src": t.column("u"),
                         "regs": empty, "est": z, "harm_fp": z,
                         "__b": bucket_of(v)})

    def state_rows_by_node(t: pa.Table) -> pa.Table:
        return pa.table({"k": t.column("node"),
                         "src": pa.array(np.full(len(t), -1, np.int64)),
                         "regs": t.column("regs"),
                         "est": t.column("est"),
                         "harm_fp": t.column("harm_fp"),
                         "__b": t.column("__b")})

    def attach(g: pa.Table) -> pa.Table:
        """Per v-bucket: hand v's registers to each in-edge (u, v)."""
        src = g.column("src").to_numpy(zero_copy_only=False)
        k = g.column("k").to_numpy(zero_copy_only=False)
        is_state = src == -1
        st_nodes = k[is_state]
        R = col_to_regs(g.column("regs").combine_chunks()
                        .filter(pa.array(is_state)))
        order = np.argsort(st_nodes)
        st_nodes, R = st_nodes[order], R[order]
        ek, eu = k[~is_state], src[~is_state]
        z0 = pa.array(np.zeros(0, np.int64))
        if not len(ek) or not len(st_nodes):
            return pa.table({"node": pa.array([], pa.int64()),
                             "regs": pa.array([], _WIRE),
                             "est": z0, "harm_fp": z0, "carry": z0,
                             "__b": pa.array([], pa.int64())})
        pos = np.minimum(np.searchsorted(st_nodes, ek), len(st_nodes) - 1)
        ok = st_nodes[pos] == ek  # every edge head is a node; belt+braces
        eu, pos = eu[ok], pos[ok]
        z = pa.array(np.zeros(len(eu), np.int64))
        return pa.table({"node": pa.array(eu),
                         "regs": regs_to_col(R[pos]),
                         "est": z, "harm_fp": z, "carry": z,
                         "__b": bucket_of(eu)})

    def tag_carry(t: pa.Table) -> pa.Table:
        """State rows entering the merge carry (prev est, harm)."""
        return pa.table({"node": t.column("node"),
                         "regs": t.column("regs"),
                         "est": t.column("est"),
                         "harm_fp": t.column("harm_fp"),
                         "carry": pa.array(np.ones(len(t), np.int64)),
                         "__b": t.column("__b")})

    def make_merge_group(t_round: int):
        def merge_group(g: pa.Table) -> pa.Table:
            nd = g.column("node").to_numpy(zero_copy_only=False)
            R = col_to_regs(g.column("regs"))
            prev_est = g.column("est").to_numpy(zero_copy_only=False)
            harm = g.column("harm_fp").to_numpy(zero_copy_only=False)
            order = np.argsort(nd, kind="stable")
            nd, R = nd[order], R[order]
            prev_est, harm = prev_est[order], harm[order]
            starts = np.nonzero(np.r_[True, nd[1:] != nd[:-1]])[0]
            M = np.maximum.reduceat(R, starts, axis=0)
            u = nd[starts]
            # exactly one carry row per node (its prev state); gathered
            # rows contribute zeros, so reduceat-sum extracts the carry
            pe = np.add.reduceat(prev_est, starts)
            ph = np.add.reduceat(harm, starts)
            est = _est_rows(M, m)
            # Python-floor signed division (estimate can dip at the
            # LC→raw regime switch); fixed point keeps it deterministic
            delta = (est - pe) * np.int64(_HARM_SCALE)
            ph = ph + np.floor_divide(delta, np.int64(t_round))
            return pa.table({"node": pa.array(u), "regs": regs_to_col(M),
                             "est": pa.array(est), "harm_fp": pa.array(ph),
                             "carry": pa.array(np.ones(len(u), np.int64)),
                             "__b": bucket_of(u)})
        return merge_group

    n_blocks = max(1, n_nodes // 8192)
    for t_round in range(1, max_t + 1):
        gathered = e.map_batches(edge_rows_by_v, batch_format="pyarrow") \
            .union(states.map_batches(state_rows_by_node,
                                      batch_format="pyarrow")) \
            .groupby("__b").map_groups(attach, batch_format="pyarrow")
        states = gathered \
            .union(states.map_batches(tag_carry, batch_format="pyarrow")) \
            .groupby("__b").map_groups(make_merge_group(t_round),
                                       batch_format="pyarrow") \
            .map_batches(lambda t: t.drop_columns(["carry"]),
                         batch_format="pyarrow") \
            .repartition(n_blocks).materialize()
        nf.append((t_round, nf_of(states)[1]))

    return nf, states
