"""Query result cache (reference: result_cache.py, star.py:715-751).

LRU + TTL, keyed by (cypher, params); invalidated by the catalog's data
epoch (bumped on every committed mutation); queries containing
non-deterministic functions are never cached.

What is cached is the *compiled DataFrame* (lazy plan), not collected
rows — so a hit skips parsing and compilation but the data read stays
distributed and re-optimizable; pair with ``df.cache()`` by the caller
when row-level reuse is wanted.
"""

from __future__ import annotations

import re
import time
from collections import OrderedDict
from dataclasses import dataclass
from typing import Any

NONDETERMINISTIC = re.compile(
    r"\b(rand|randomuuid|timestamp|localtime|localdatetime)\s*\(", re.IGNORECASE
)


def cache_key(cypher: str, params: dict[str, Any] | None) -> tuple | None:
    if NONDETERMINISTIC.search(cypher):
        return None
    try:
        pkey = tuple(sorted((k, repr(v)) for k, v in (params or {}).items()))
    except Exception:  # noqa: BLE001
        return None
    return (cypher, pkey)


@dataclass
class _Entry:
    value: Any
    epoch: int
    at: float


class ResultCache:
    def __init__(self, max_entries: int = 128, ttl_seconds: float = 300.0):
        self.max_entries = max_entries
        self.ttl = ttl_seconds
        self._data: OrderedDict[tuple, _Entry] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get(self, key: tuple | None, epoch: int) -> Any | None:
        if key is None:
            return None
        entry = self._data.get(key)
        if entry is None or entry.epoch != epoch or time.time() - entry.at > self.ttl:
            if entry is not None:
                self._data.pop(key, None)
            self.misses += 1
            return None
        self._data.move_to_end(key)
        self.hits += 1
        return entry.value

    def put(self, key: tuple | None, value: Any, epoch: int) -> None:
        if key is None:
            return
        self._data[key] = _Entry(value, epoch, time.time())
        self._data.move_to_end(key)
        while len(self._data) > self.max_entries:
            self._data.popitem(last=False)

    def evict(self, key: tuple | None) -> None:
        """Drop one entry (e.g. a Dataset poisoned by job-group
        cancellation — Spark 4 re-raises on any later action of it)."""
        if key is not None:
            self._data.pop(key, None)

    def clear(self) -> None:
        self._data.clear()
