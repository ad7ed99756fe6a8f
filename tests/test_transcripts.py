"""Transcript generator: determinism, schema, the per-row ordering
invariant (input_hint: per-turn text equality under stable
(conv_id, turn_idx) ordering)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raysketch.sources.transcripts import (
    _conv_structure,
    gen_transcripts,
    text_for_rows,
    write_transcripts,
)

EXPECTED_SCHEMA = {
    "conv_id": pa.string(),
    "turn_idx": pa.int32(),
    "role": pa.string(),
    "text": pa.string(),
    "tool": pa.string(),
    "ts": pa.timestamp("us"),
}


def test_schema_matches_input_hint():
    t = gen_transcripts(1000)
    assert {f.name: f.type for f in t.schema} == EXPECTED_SCHEMA


def test_deterministic():
    a = gen_transcripts(5000, seed=42)
    b = gen_transcripts(5000, seed=42)
    assert a.equals(b)
    c = gen_transcripts(5000, seed=7)
    assert not a.column("text").equals(c.column("text"))


def test_turn_contiguity_and_ts_monotone():
    t = gen_transcripts(20000).to_pandas()
    for conv, g in t.groupby("conv_id"):
        assert list(g["turn_idx"]) == list(range(len(g)))
        assert g["ts"].is_monotonic_increasing


def test_text_ordering_invariant():
    """Rows read back sorted by (conv_id, turn_idx) must reproduce the
    generator's text exactly — the driver's per-row invariant."""
    import pandas as pd

    t = gen_transcripts(10000)
    df = t.to_pandas().sample(frac=1.0, random_state=1)  # scramble
    df = df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    conv_i = df["conv_id"].str[5:].astype(np.int64).to_numpy()
    regen = text_for_rows(conv_i, df["turn_idx"].to_numpy().astype(np.int64))
    assert pc.cast(regen, pa.string()).to_pylist() == df["text"].tolist()


def test_write_idempotent(tmp_path):
    p1 = write_transcripts(2000, root=str(tmp_path))
    p2 = write_transcripts(2000, root=str(tmp_path))
    assert p1 == p2
    import pyarrow.parquet as pq

    assert pq.read_table(p1).num_rows == 2000


def test_skew_present():
    conv_i, _ = _conv_structure(50000, 42)
    sizes = np.bincount(conv_i)
    # zipf: the hottest conversation dwarfs the median
    assert sizes.max() >= 50 * np.median(sizes)
