"""Keeping ``pyspark.sql.Observation`` metrics alive under AQE.

Spark's adaptive ``AQEPropagateEmptyRelation`` rule replaces a join subtree
with an empty LocalRelation as soon as a materialized side measures zero
rows — and a ``CollectMetrics`` (Observation) node inside that subtree is
pruned with it, so the observation fulfills with an EMPTY row and
``Observation.get`` dies in ``PythonSQLUtils.toPyRow`` (assertion failure;
reproduced deterministically on Spark 4.1.2 with the capped-LSH self-join
whenever a unit's candidate-pair output is empty).

That is precisely the all-rows-dropped case where
:func:`~json_schema_lean_spark.operators.dedup.cap_bucket_rows`'s
no-silent-caps accounting matters most: the cap truncated so hard that no
pair survived, and the metrics that would say so vanish. Actions whose
Observation must survive an empty result therefore run under
:func:`preserve_observed_metrics`, which excludes the one rule for the
duration (the conf is read per-query at execution start) and restores the
previous value afterwards. The forfeited optimization — skipping downstream
stages of an already-empty intermediate — is noise next to the unit of work
that produced it.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

_RULE = "org.apache.spark.sql.execution.adaptive.AQEPropagateEmptyRelation"
_KEY = "spark.sql.adaptive.optimizer.excludedRules"

# the guard flips a SESSION-scoped conf, so overlapping uses from several
# driver threads (e.g. CheckpointedValidation concurrent_units>1) must
# refcount: only the outermost enter saves+sets, only the last exit
# restores — otherwise thread A's exit re-enables the rule mid-write of
# thread B. Keyed per session; while any guard is active, unrelated
# queries on the session also skip the one AQE rule (a missed empty-branch
# shortcut, never a correctness change).
_guard_lock = threading.Lock()
_guard_state: dict[int, list] = {}  # id(session) -> [depth, prev_value]


@contextmanager
def preserve_observed_metrics(spark):
    """Context manager: actions executed inside keep their Observation
    metrics even when the observed query's result is empty under AQE.
    Reentrant and thread-safe per session."""
    key = id(spark)
    with _guard_lock:
        state = _guard_state.get(key)
        if state is None:
            prev = spark.conf.get(_KEY, None)
            spark.conf.set(_KEY, f"{prev},{_RULE}" if prev else _RULE)
            state = _guard_state[key] = [0, prev]
        state[0] += 1
    try:
        yield
    finally:
        with _guard_lock:
            state[0] -= 1
            if state[0] == 0:
                del _guard_state[key]
                if state[1] is None:
                    spark.conf.unset(_KEY)
                else:
                    spark.conf.set(_KEY, state[1])


def observed_metrics_or_none(obs) -> dict | None:
    """``obs.get`` hardened against the pruned-CollectMetrics case: returns
    None instead of an opaque Py4J assertion when the metrics row came back
    empty (caller decides whether that is tolerable or a bug). Prefer
    running the action under :func:`preserve_observed_metrics` so this
    never returns None."""
    jo = getattr(obs, "_jo", None)
    try:
        if jo is not None and jo.getRow().length() == 0:
            return None
    except Exception:  # private-API probe must never mask a real .get
        pass
    return dict(obs.get)
