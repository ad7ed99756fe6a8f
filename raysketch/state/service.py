"""Long-lived sketch state as a named Ray actor.

The reference's primary usage pattern is a *mutable object accumulating
adds over time* (``$h = new HyperLogLog(); $h->add(...); $h->count()``,
/root/reference/php/hll.c:380-668, plus the Redis-string variant where
many clients PFADD into one shared key, README.md:74-108). Batch
pipelines don't need that — but a live service counting distinct users
per key does, and it is exactly the "shared mutable index" case where
raw Ray actors are the right tool instead of the Dataset API.

``SketchService`` shards keys across N actor replicas (hash routing) so
update throughput scales; each replica holds {key: sketch}. Snapshots
use the same wire formats as everything else, so a service snapshot can
be merged into a batch job's result and vice versa.
"""

from __future__ import annotations

from typing import Optional

__all__ = ["SketchService"]


def _make_actor_cls():
    import ray

    @ray.remote
    class _SketchShard:
        def __init__(self, sketch: str, params: dict):
            from ..sketches import SKETCHES

            self._cls = SKETCHES[sketch]
            self._params = params
            self._state: dict[str, object] = {}

        def _get(self, key: str):
            sk = self._state.get(key)
            if sk is None:
                sk = self._cls.empty(**self._params)
                self._state[key] = sk
            return sk

        def add(self, key: str, elements) -> int:
            sk = self._get(key)
            sk.add_batch(elements)
            return len(elements)

        def finalize(self, key: str):
            sk = self._state.get(key)
            return None if sk is None else sk.finalize()

        def dump(self, key: str) -> Optional[bytes]:
            sk = self._state.get(key)
            return None if sk is None else sk.to_bytes()

        def load(self, key: str, blob: bytes) -> None:
            sk = self._cls.from_bytes(blob)
            cur = self._state.get(key)
            self._state[key] = sk if cur is None else cur.merge(sk)

        def keys(self) -> list[str]:
            return list(self._state)

        def snapshot(self) -> dict[str, bytes]:
            return {k: s.to_bytes() for k, s in self._state.items()}

    return _SketchShard


class SketchService:
    """Client handle; routes each key to ``hash(key) % num_shards``."""

    def __init__(self, sketch: str = "hll", num_shards: int = 4,
                 max_in_flight: int = 256, **params):
        shard_cls = _make_actor_cls()
        self.sketch = sketch
        self.shards = [shard_cls.remote(sketch, params) for _ in range(num_shards)]
        self.max_in_flight = max_in_flight
        self._pending: list = []

    def _shard(self, key: str):
        from ..hashing import murmur64a_scalar

        return self.shards[murmur64a_scalar(key.encode()) % len(self.shards)]

    def add(self, key: str, elements) -> None:
        """Async batched update with bounded in-flight submissions.

        Refs are retained and drained once ``max_in_flight`` accumulate
        (ADVICE r01: a discarded ref swallows actor-side exceptions —
        bad element types, incompatible merges — and unbounded fire-and-
        forget has no backpressure). Draining surfaces any actor error
        on the caller; :meth:`flush` forces a full drain."""
        self._pending.append(self._shard(key).add.remote(key, list(elements)))
        if len(self._pending) >= self.max_in_flight:
            self._drain(keep=self.max_in_flight // 2)

    def _drain(self, keep: int = 0) -> None:
        import ray

        while len(self._pending) > keep:
            done, self._pending = ray.wait(self._pending,
                                           num_returns=len(self._pending) - keep)
            ray.get(done)  # re-raises actor-side exceptions

    def flush(self) -> None:
        """Block until every queued :meth:`add` has been applied (raises
        if any failed)."""
        self._drain(keep=0)

    def add_sync(self, key: str, elements) -> int:
        import ray

        return ray.get(self._shard(key).add.remote(key, list(elements)))

    def finalize(self, key: str):
        import ray

        self.flush()  # read-your-writes after async adds

        return ray.get(self._shard(key).finalize.remote(key))

    count = finalize

    def dump(self, key: str) -> Optional[bytes]:
        import ray

        self.flush()  # read-your-writes after async adds

        return ray.get(self._shard(key).dump.remote(key))

    def load(self, key: str, blob: bytes) -> None:
        import ray

        ray.get(self._shard(key).load.remote(key, blob))

    def snapshot(self) -> dict[str, bytes]:
        """Merged {key: serialized sketch} across all shards."""
        import ray

        self.flush()  # read-your-writes after async adds

        out: dict[str, bytes] = {}
        from ..sketches import SKETCHES

        cls = SKETCHES[self.sketch]
        for snap in ray.get([s.snapshot.remote() for s in self.shards]):
            for k, blob in snap.items():
                if k in out:
                    merged = cls.from_bytes(out[k]).merge(cls.from_bytes(blob))
                    out[k] = merged.to_bytes()
                else:
                    out[k] = blob
        return out
