"""Process-local memo for lowered Column plans.

Building the fused / violation-row Column trees costs ~0.6 s warm (~2-4 s in
a cold JVM): thousands of py4j round-trips constructing the same unresolved
expressions. The expressions depend ONLY on the schema JSON, the input
DataFrame's dtype, the registry, and a handful of options — they reference
input columns by NAME — so re-validating another batch of the same table
shape (the normal case: streaming micro-batches, checkpointed unit loops,
bench re-runs) can reuse them verbatim.

Key includes the py4j gateway OBJECT (not its id(): a new gateway allocated
after the old one is garbage-collected can reuse the integer id, which would
let stale Column plans bound to a dead JVM come back as hits — r3 review).
Holding the gateway in the key keeps its identity unique for the entry's
lifetime; the FIFO cap bounds how long a dead gateway can stay pinned.
`stats` counts hits/misses for tests and debugging.
"""

from __future__ import annotations

import json
import threading
from typing import Any, Callable

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_CACHE: dict = {}
_CAP = 64

stats = {"hits": 0, "misses": 0}


def _canon(x: Any) -> str:
    return json.dumps(x, sort_keys=True, separators=(",", ":"), default=str)


def plan_memo(kind: str, df: DataFrame, schema_json: Any,
              registry: Any, parts: tuple, builder: Callable[[], Any]) -> Any:
    """Return builder()'s result, memoized on everything the built Columns
    can depend on. builder exceptions propagate and are not cached."""
    sc = df.sparkSession.sparkContext
    gateway = sc._gateway  # keyed by identity; strong ref prevents id reuse
    key = (kind, gateway, _canon(schema_json), df.schema.json(),
           _canon(registry) if registry else None, parts)
    with _LOCK:
        if key in _CACHE:
            stats["hits"] += 1
            return _CACHE[key]
    val = builder()
    with _LOCK:
        stats["misses"] += 1
        if len(_CACHE) >= _CAP:
            _CACHE.pop(next(iter(_CACHE)))
        _CACHE[key] = val
    return val


def clear() -> None:
    with _LOCK:
        _CACHE.clear()
        stats["hits"] = stats["misses"] = 0
