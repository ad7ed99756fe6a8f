"""Run every queries() entry twice and assert the results are equal —
the rerun-determinism sweep (round-1 ran this informally; kept as a
script so it's one command).

Usage: python scripts/determinism_sweep.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon(res):
    import pandas as pd

    if not isinstance(res, pd.DataFrame):
        res = res.to_pandas()
    df = res.reindex(sorted(res.columns), axis=1)
    return sorted(map(tuple, df.astype(str).itertuples(index=False, name=None)))


def main():
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    ray.init(address="local", num_cpus=16, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as entrymod

    diffs = []
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            a = canon(fn(sf_dir))
            b = canon(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            diffs.append(name)
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            continue
        status = "SAME" if a == b else "DIFF"
        if a != b:
            diffs.append(name)
        print(f"{status} {name} ({time.time() - t0:.1f}s)")
    ray.shutdown()
    print(f"\n{len(diffs)} nondeterministic" + (f": {diffs}" if diffs else ""))
    sys.exit(1 if diffs else 0)


if __name__ == "__main__":
    main()
