"""Deterministic synthetic conversation-transcript table (FIXTURES.md §1).

Schema (BASELINE.json input_hint):
    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp[us]

Design goals:
- **Deterministic**: every cell is a pure function of (seed, conv index,
  turn_idx); :func:`text_for_rows` recomputes the text column for any
  (conv_id, turn_idx) slice — the per-row invariant the driver checks
  (read the table sorted by (conv_id, turn_idx) and the regenerated
  text must match exactly).
- **Skewed**: conversation lengths and tool names are Zipf-distributed
  (hot conv_ids / heavy-hitter tools are north-rule requirements).
- **Vectorized & chunked**: columns are built with NumPy/Arrow kernels
  one ~1M-row shard at a time, so bench-scale tables stream to
  partitioned parquet in bounded memory; text bodies are
  lognormal-length byte slices of a repeated lorem block behind a
  per-turn marker prefix (≈2% empty strings — the reference treats ""
  as a real element, php/tests/hll_add_string.phpt).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

__all__ = ["gen_transcripts", "write_transcripts", "transcripts_path", "text_for_rows"]

ROLES = np.array(["user", "assistant", "system", "tool"])
ROLE_P = np.array([0.35, 0.35, 0.10, 0.20])
N_TOOLS = 50
_LOREM = (
    "the quick brown fox jumps over the lazy dog while parsing arrow batches "
    "and folding register files into mergeable sketch states across the cluster "
).encode()
_EPOCH_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Public splitmix64 mixer — cheap, statistically strong per-row."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _row_hash(conv_i: np.ndarray, turn_idx: np.ndarray, seed: int) -> np.ndarray:
    return _splitmix64(
        conv_i.astype(np.uint64) * np.uint64(1_000_003)
        + turn_idx.astype(np.uint64)
        + np.uint64(seed) * np.uint64(0xABCDEF12345)
    )


def _u01(h: np.ndarray) -> np.ndarray:
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _conv_structure(n_turns: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """(conv index, turn_idx) per row; turn_idx contiguous per conv."""
    rng = np.random.default_rng(seed)
    est = max(4, n_turns // 3)
    lens = np.minimum(rng.zipf(1.5, size=est), 500)
    while lens.sum() < n_turns:
        lens = np.concatenate([lens, np.minimum(rng.zipf(1.5, size=est), 500)])
    cum = np.cumsum(lens)
    ncv = int(np.searchsorted(cum, n_turns)) + 1
    lens = lens[:ncv].astype(np.int64)
    lens[-1] -= int(cum[ncv - 1] - n_turns)
    if lens[-1] == 0:
        lens = lens[:-1]
    conv_i = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    turn_idx = np.arange(n_turns, dtype=np.int64) - np.repeat(starts, lens)
    return conv_i, turn_idx


# zipf(1.2) CDF over tool ranks, precomputed
_TOOL_RANKS = np.arange(1, N_TOOLS + 1, dtype=np.float64)
_TOOL_CDF = np.cumsum(_TOOL_RANKS**-1.2) / (_TOOL_RANKS**-1.2).sum()
_TOOL_NAMES = np.array([f"tool_{i:02d}" for i in range(N_TOOLS)])


_HEXDIG = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)
_MARKER_W = 18  # "t" + 16 hex chars + " "
_N_DUP_GROUPS = 32  # ~3% of rows share one of 32 exact-duplicate texts


def text_for_rows(conv_i: np.ndarray, turn_idx: np.ndarray, seed: int = 42) -> pa.Array:
    """Pure function (conv index, turn_idx) → text (large_string array).

    Lognormal byte lengths (median ~64, max 4096), ~2% empty strings,
    and ~3% of rows drawn from a pool of 32 exact-duplicate texts (so
    exact-dedup pipelines have real work). Each non-dup text starts with
    a unique 18-byte hash marker followed by tiled lorem."""
    conv_i = np.asarray(conv_i, dtype=np.int64)
    turn_idx = np.asarray(turn_idx, dtype=np.int64)
    n = len(conv_i)
    h = _splitmix64(_row_hash(conv_i, turn_idx, seed) ^ np.uint64(0x7EA7))
    u1 = np.clip(_u01(h), 1e-12, 1 - 1e-12)
    u2 = _u01(_splitmix64(h))
    z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2 * np.pi * u2)  # Box–Muller
    length = np.exp(np.log(64) + 0.9 * z).astype(np.int64)
    length = np.clip(length, _MARKER_W + 1, 4096)
    hsel = _u01(_splitmix64(h ^ np.uint64(0xE)))
    length = np.where(hsel < 0.02, 0, length)
    dup = (hsel >= 0.02) & (hsel < 0.05)
    dup_id = (h % np.uint64(_N_DUP_GROUPS)).astype(np.int64)
    length = np.where(dup, 64 + dup_id * 7, length)

    # fixed-width marker: "t" + hex64(h) + " "; dup rows: "dup" + 4 digits
    mk = np.empty((n, _MARKER_W), dtype=np.uint8)
    mk[:, 0] = ord("t")
    for i in range(16):
        mk[:, 1 + i] = _HEXDIG[((h >> np.uint64(60 - 4 * i)) & np.uint64(0xF)).astype(np.int64)]
    mk[:, 17] = ord(" ")
    if dup.any():
        di = dup_id[dup]
        mk[dup, 0] = ord("d")
        mk[dup, 1] = ord("u")
        mk[dup, 2] = ord("p")
        mk[dup, 3] = _HEXDIG[di // 10]
        mk[dup, 4] = _HEXDIG[di % 10]
        mk[dup, 5:17] = ord("-")

    out_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(length, out=out_offsets[1:])
    total = int(out_offsets[-1])
    out = np.empty(total, dtype=np.uint8)
    # tile lorem across every row (vectorized modulo pattern)
    lorem = np.frombuffer(_LOREM, dtype=np.uint8)
    rel = np.arange(total, dtype=np.int64) - np.repeat(out_offsets[:-1], length)
    if total:
        out[:] = lorem[rel % len(lorem)]
    # overlay the fixed-width markers on non-empty rows
    nonempty = length > 0
    mk_rows = np.nonzero(nonempty)[0]
    dst = np.repeat(out_offsets[:-1][mk_rows], _MARKER_W) + np.tile(
        np.arange(_MARKER_W, dtype=np.int64), len(mk_rows)
    )
    out[dst] = mk[mk_rows].reshape(-1)

    return pa.Array.from_buffers(
        pa.large_string(), n, [None, pa.py_buffer(out_offsets), pa.py_buffer(out)]
    )


def _conv_id_array(conv_i: np.ndarray) -> pa.Array:
    """Vectorized "conv-{i:08d}" construction (no per-row Python)."""
    n = len(conv_i)
    w = 13  # "conv-" + 8 digits
    mk = np.empty((n, w), dtype=np.uint8)
    mk[:, 0:5] = np.frombuffer(b"conv-", dtype=np.uint8)
    for d in range(8):
        mk[:, 5 + d] = ord("0") + (conv_i // 10 ** (7 - d)) % 10
    offsets = (np.arange(n + 1, dtype=np.int64) * w)
    return pa.Array.from_buffers(
        pa.large_string(), n, [None, pa.py_buffer(offsets), pa.py_buffer(np.ascontiguousarray(mk).reshape(-1))]
    )


def _gen_columns(conv_i: np.ndarray, turn_idx: np.ndarray, seed: int) -> pa.Table:
    h = _row_hash(conv_i, turn_idx, seed)
    role_idx = np.minimum(
        np.searchsorted(np.cumsum(ROLE_P), _u01(h), side="right"), len(ROLES) - 1
    )
    role = pc.take(pa.array(ROLES), pa.array(role_idx, type=pa.int64()))

    h2 = _splitmix64(h)
    tool_pick = np.minimum(np.searchsorted(_TOOL_CDF, _u01(h2), side="right"), N_TOOLS - 1)
    # index N_TOOLS = "" for non-tool roles
    tool_pool = pa.array(list(_TOOL_NAMES) + [""])
    tool_idx = np.where(role_idx == 3, tool_pick, N_TOOLS)
    tool = pc.take(tool_pool, pa.array(tool_idx, type=pa.int64()))

    conv_id = _conv_id_array(conv_i)

    h3 = _splitmix64(h2)
    start_us = (_splitmix64(conv_i.astype(np.uint64) + np.uint64(seed)) % np.uint64(10**12)).astype(np.int64)
    delta_us = (h3 % np.uint64(29_000_000)).astype(np.int64) + 1
    ts = _EPOCH_US + start_us + turn_idx * 30_000_000 + delta_us  # strictly monotone per conv

    return pa.table(
        {
            "conv_id": pc.cast(conv_id, pa.string()),
            "turn_idx": pa.array(turn_idx.astype(np.int32), type=pa.int32()),
            "role": role,
            "text": pc.cast(text_for_rows(conv_i, turn_idx, seed), pa.string()),
            "tool": tool,
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )


def gen_transcripts(n_turns: int, seed: int = 42) -> pa.Table:
    """Whole table in memory — tests / small scales only."""
    conv_i, turn_idx = _conv_structure(n_turns, seed)
    return _gen_columns(conv_i, turn_idx, seed)


def transcripts_path(n_turns: int, seed: int = 42, root: str = "/tmp/raysketch_data") -> str:
    tag = hashlib.sha1(f"v2:{n_turns}:{seed}".encode()).hexdigest()[:10]
    return os.path.join(root, f"transcripts_n{n_turns}_s{seed}_{tag}")


# shard-writer context for the forked pool: set in the parent right
# before Pool creation, inherited copy-on-write by fork (conv_i is tens
# of MB at bench scale — pickling it per task would dominate)
_SHARD_CTX: dict = {}


def _write_shard(i: int, ctx: dict | None = None) -> None:
    c = ctx if ctx is not None else _SHARD_CTX
    sl = slice(i * c["rpf"], min((i + 1) * c["rpf"], c["n"]))
    tbl = _gen_columns(c["conv_i"][sl], c["turn_idx"][sl], c["seed"])
    tmp = os.path.join(c["path"], f"_part-{i:05d}.tmp")
    pq.write_table(tbl, tmp, row_group_size=31250)
    os.replace(tmp, os.path.join(c["path"], f"part-{i:05d}.parquet"))


def _write_shard_remote(ctx: dict, i: int) -> None:
    """Ray-task twin of :func:`_write_shard` — ctx travels via the
    object store (auto-dereferenced), no module-global state."""
    _write_shard(i, ctx)


def write_transcripts(
    n_turns: int,
    seed: int = 42,
    root: str = "/tmp/raysketch_data",
    rows_per_file: int = 125_000,
    processes: int | None = None,
) -> str:
    """Generate + write partitioned parquet shard-at-a-time (bounded
    memory; one file per ~1M rows so reads parallelize). Idempotent —
    finished tables (_SUCCESS marker) are reused as a cache.

    Shards are written by a forked process pool when there are several
    (VERDICT r02 item 8: the 8M-turn scaling table took ~6 min cold,
    single-process). Every shard is a pure function of (seed, slice),
    so the table is byte-identical at any parallelism."""
    path = transcripts_path(n_turns, seed, root)
    done = os.path.join(path, "_SUCCESS")
    if os.path.exists(done):
        return path
    os.makedirs(path, exist_ok=True)
    conv_i, turn_idx = _conv_structure(n_turns, seed)
    nfiles = max(1, (n_turns + rows_per_file - 1) // rows_per_file)
    if processes is None:
        processes = min(16, os.cpu_count() or 1, nfiles)
    ray_up = False
    try:
        import ray

        ray_up = ray.is_initialized()
    except ImportError:  # pragma: no cover
        pass
    _SHARD_CTX.update(rpf=rows_per_file, n=n_turns, conv_i=conv_i,
                      turn_idx=turn_idx, seed=seed, path=path)
    try:
        if ray_up and processes > 1 and nfiles > 3:
            # inside a Ray session: fork would deadlock Ray's gRPC
            # threads — generate shards as Ray tasks instead (structure
            # arrays ship once via the object store)
            import ray

            ctx_ref = ray.put(dict(_SHARD_CTX))
            task = ray.remote(num_cpus=1)(_write_shard_remote)
            ray.get([task.remote(ctx_ref, i) for i in range(nfiles)])
        else:
            import multiprocessing as mp

            use_pool = (not ray_up and processes > 1 and nfiles > 3
                        and "fork" in mp.get_all_start_methods())
            if use_pool:
                with mp.get_context("fork").Pool(processes) as pool:
                    pool.map(_write_shard, range(nfiles), chunksize=1)
            else:
                for i in range(nfiles):
                    _write_shard(i)
    finally:
        _SHARD_CTX.clear()
    with open(done, "w") as f:
        f.write("ok\n")
    return path
