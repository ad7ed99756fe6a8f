"""CLI twin of the reference's ``hllcnt`` (hllcnt.c:7-31): read
newline-delimited elements on stdin, print ``"<lines> <estimate>"``.

    $ seq 0 9999 | python -m raysketch.hllcnt
    10000 9976

Batched (64k lines at a time) through the vectorized fold — the same
code path the distributed engine uses, ~3 orders of magnitude fewer
Python-level operations than a per-line loop. No Ray session needed.
"""

from __future__ import annotations

import sys

from .sketches.hll import HLL


def main(stream=None, out=None) -> int:
    stream = stream or sys.stdin.buffer
    out = out or sys.stdout
    h = HLL()
    n = 0
    batch: list[bytes] = []
    for line in stream:
        batch.append(line.rstrip(b"\r\n"))
        if len(batch) >= 65536:
            h.add_batch(batch)
            n += len(batch)
            batch.clear()
    if batch:
        h.add_batch(batch)
        n += len(batch)
    print(f"{n} {h.finalize()}", file=out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
