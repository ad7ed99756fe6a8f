"""Reference-API compatibility surface.

The reference exposes a ``HyperLogLog`` class plus procedural ``hll_*``
twins over a resource handle (/root/reference/php/hll.c:439-813,
SURVEY.md §2.3). `raysketch.HLL` is the class; this module provides the
procedural twins with the same semantics so reference pipelines port
line-for-line:

    h = hll_create()                  # new HyperLogLog([allowSparse])
    hll_add(h, "x"); hll_add(h, [1, 2.5, True])
    hll_count(h)                      # estimate
    hll_count(h1, h2, h3)             # NON-destructive union count
                                      #   (php/hll.c:689-696 → pfCountMerged)
    hll_merge(h, other, ...)          # destructive union into h
    hll_promote(h); hll_info(h)
    d = hll_dump(h); h2 = hll_load(d)

Coercion matches php_hll_add (php/hll.c:265-353): scalars fold as their
string forms; arrays fold element-wise; non-coercible input raises
TypeError (the reference warns/throws, :176-187).
"""

from __future__ import annotations

from .sketches.hll import HLL

__all__ = [
    "HyperLogLog",
    "hll_create",
    "hll_add",
    "hll_count",
    "hll_merge",
    "hll_promote",
    "hll_info",
    "hll_dump",
    "hll_load",
]

HyperLogLog = HLL


def _php_float_str(x: float) -> str:
    """Alias of the single implementation in keys.py (ADVICE r01 /
    code-review r02: one copy, so scalar and column paths can't drift)."""
    from .keys import php_float_str

    return php_float_str(x)


def _coerce_scalar(x) -> bytes:
    """php/hll.c:273-298 semantics."""
    if x is None:
        return b""
    if isinstance(x, bool):
        return b"1" if x else b""
    if isinstance(x, bytes):
        return x
    if isinstance(x, (int, str)):
        return str(x).encode()
    if isinstance(x, float):
        return _php_float_str(x).encode()
    if hasattr(x, "__str__") and type(x).__str__ is not object.__str__:
        return str(x).encode()  # stringable object (hll_add_object_stringable)
    raise TypeError(f"cannot coerce {type(x).__name__} to a sketch element")


def hll_create(allow_sparse: bool = False) -> HLL:
    """php/hll.c:439-457; dense by default (the reference promotes
    immediately unless allowSparse — php/hll.c:76-83)."""
    return HLL(sparse=allow_sparse)


def hll_add(h: HLL, value) -> HLL:
    if isinstance(h, (bytes, str)):
        raise TypeError("first argument must be an HLL handle")
    if isinstance(value, (list, tuple)):
        h.add_batch([_coerce_scalar(v) for v in value])
    else:
        h.add_batch([_coerce_scalar(value)])
    return h


def hll_count(*hlls: HLL) -> int:
    """One arg: estimate. Multiple: non-destructive union count
    (dispatches to the pfCountMerged shape, hyperloglog.c:1274-1304)."""
    if not hlls:
        raise TypeError("hll_count requires at least one sketch")
    if len(hlls) == 1:
        return hlls[0].finalize()
    return HLL.union(hlls).finalize()


def hll_merge(h: HLL, *others) -> HLL:
    """Destructive union into ``h``; accepts sketches, iterables of
    sketches, or raw dumps (mixed-arg forms, php/hll.c:463-525)."""
    flat: list[HLL] = []
    for o in others:
        if isinstance(o, HLL):
            flat.append(o)
        elif isinstance(o, (bytes, bytearray)):
            flat.append(HLL.from_bytes(bytes(o)))
        elif isinstance(o, (list, tuple)):
            for x in o:
                flat.append(x if isinstance(x, HLL) else HLL.from_bytes(bytes(x)))
        else:
            raise TypeError(f"cannot merge {type(o).__name__}")
    for o in flat:
        h.merge(o)
    return h


def hll_promote(h: HLL) -> HLL:
    return h.promote()


def hll_info(h: HLL) -> dict:
    return h.info()


def hll_dump(h: HLL) -> bytes:
    return h.to_bytes()


def hll_load(dump: bytes) -> HLL:
    return HLL.from_bytes(dump)
