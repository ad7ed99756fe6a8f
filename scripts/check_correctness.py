"""Local replica of the driver's correctness gate: run each queries()
entry at a given sf and compare against oracle_sql() via DuckDB
(row count + schema + order-insensitive value hash).

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(df) -> str:
    import pandas as pd

    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes then sort rows for order-insensitive compare
    rows = sorted(map(tuple, df.astype(str).itertuples(index=False, name=None)))
    return hashlib.sha256(str(rows).encode()).hexdigest()[:16]


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def main():
    import duckdb
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(res)} cols={list(res.columns)} ({el:.1f}s) [rows-only]")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: oracle raised {e}")
            continue
        problems = []
        if len(res) != len(exp):
            problems.append(f"rows {len(res)} != {len(exp)}")
        if sorted(res.columns) != sorted(exp.columns):
            problems.append(f"cols {sorted(res.columns)} != {sorted(exp.columns)}")
        elif value_hash(res) != value_hash(exp):
            problems.append("value hash mismatch")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)} ({el:.1f}s)")
            if "value hash mismatch" in problems:
                merged = res.merge(exp, how="outer", indicator=True)
                diff = merged[merged["_merge"] != "both"]
                print(diff.head(8).to_string())
        else:
            print(f"PASS {name}: rows={len(res)} ({el:.1f}s)")
    ray.shutdown()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
