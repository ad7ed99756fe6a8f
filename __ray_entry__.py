"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: neither
this module nor the raysketch library ever calls ray.init()/shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: the north-rule sketch suite over the sf0.001
    transcript table — distinct conversations (global + per role),
    distinct (role, tool) pairs, heavy-hitter tools, text-length
    quantiles — returned as one small summary DataFrame."""
    import pandas as pd

    from raysketch.pipelines.queries import (
        cms_tool_top10,
        hll_distinct_conv,
        hll_distinct_conv_by_role,
        hll_distinct_role_tool_pairs,
        tdigest_text_len,
    )

    sf_dir = "/root/testdata/sf0.001"
    rows = []
    g = hll_distinct_conv(sf_dir)
    rows.append({"metric": "distinct_convs_est", "key": "", "value": float(g["distinct_convs_est"][0])})
    for _, r in hll_distinct_conv_by_role(sf_dir).iterrows():
        rows.append({"metric": "distinct_convs_by_role", "key": r["role"], "value": float(r["distinct_convs_est"])})
    p = hll_distinct_role_tool_pairs(sf_dir)
    rows.append({"metric": "distinct_role_tool_pairs", "key": "", "value": float(p["distinct_pairs_est"][0])})
    for _, r in cms_tool_top10(sf_dir).head(5).iterrows():
        rows.append({"metric": "tool_heavy_hitter", "key": r["tool"], "value": float(r["est_count"])})
    q = tdigest_text_len(sf_dir)
    for c in ("p50", "p90", "p99"):
        rows.append({"metric": f"text_len_{c}", "key": "", "value": float(q[c][0])})
    return pd.DataFrame(rows)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline (SURVEY.md §2)."""
    from raysketch.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracles for the exactly-checkable queries; sketch queries
    are intentionally absent (rows-only checks — pytest enforces the
    published error bounds instead)."""
    from raysketch.pipelines.queries import ORACLES

    return dict(ORACLES)
