"""Newline-delimited text sources — the reference's only input format
(stdin lines, /root/reference/hllcnt.c:17-26), industrialized: a
directory of text files becomes a Dataset of lines via
``ray.data.read_text`` and folds through the same vectorized sketch
pipeline, i.e. ``hllcnt`` at cluster scale.
"""

from __future__ import annotations

__all__ = ["distinct_count_files", "sketch_text_files"]


def sketch_text_files(paths, sketch: str = "hll", mode: str = "estimate", **params):
    """Fold every line of every file into one merged sketch."""
    import ray.data

    from ..agg import sketch_aggregate

    ds = ray.data.read_text(paths)
    return sketch_aggregate(ds, sketch, on="text", mode=mode, **params)


def distinct_count_files(paths) -> tuple[int, int]:
    """(total lines, estimated distinct lines) — the hllcnt output pair
    ("<lines> <estimate>", hllcnt.c:28) over a file set."""
    import ray.data

    from ..agg import sketch_aggregate

    ds = ray.data.read_text(paths)
    n = ds.count()
    est = sketch_aggregate(ds, "hll", on="text", mode="estimate")
    return n, est
