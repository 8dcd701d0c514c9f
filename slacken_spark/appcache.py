"""Application-scoped memoization for expensive shared builds.

The build-once/use-many shape (a classification index, a dedup
component labeling) wants one persisted artifact per (SparkContext,
inputs). Keying on the Spark ``applicationId`` — stable for the life of
the context, never reused after stop/start — avoids the id(spark)
collision a garbage-collected session can cause, and entries whose
application died are evicted on the next lookup (their persisted blocks
died with the old context, so dropping the reference is the whole
cleanup).
"""

from __future__ import annotations

from collections.abc import Callable, Hashable


def app_scoped_get(
    cache: dict,
    spark,
    key: Hashable,
    build: Callable[[], object],
):
    """Return ``cache[(applicationId, *key)]``, building (and caching)
    it on first use; entries from dead applications are evicted first.

    ``cache`` is the caller's module-level dict so each artifact family
    keeps its own namespace; ``build`` should persist whatever it
    returns if reuse is the point.
    """
    app_id = spark.sparkContext.applicationId
    for stale in [k for k in cache if k[0] != app_id]:
        cache.pop(stale)
    full_key = (app_id,) + (key if isinstance(key, tuple) else (key,))
    value = cache.get(full_key)
    if value is None:
        value = build()
        cache[full_key] = value
    return value
