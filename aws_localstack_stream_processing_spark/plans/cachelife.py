"""Bounded lifecycle for per-call persisted relations (ADVICE r12).

Several queries persist an intermediate (a materialized diamond — see
``profile_mutual_information``) and return a LAZY DataFrame over it. The
persist must eventually be released, but not here: the caller hasn't
materialized yet. The r11 answer — each invocation unpersists the
*previous* call's relation — bounded a no-clearCache session at one
cached relation, but held that list in an unsynchronized module global:
a second concurrent invocation could pop and unpersist the first call's
relation before the first call's lazy result materialized, silently
reintroducing the double-scan / nondeterministic-plan behavior the
persist exists to prevent (ADVICE r12, ``signal_ops._MI_JOINT_LIVE``).

:class:`LiveCache` fixes both failure modes in one place:

- **Mutation races**: every list mutation happens under a lock, so
  interleaved calls can never corrupt the tracking state or
  double-unpersist one entry.
- **Unpersist-before-materialize**: retirement keeps the newest ``keep``
  entries alive. With ``keep=2`` (the default) the entry retired by call
  N is call N-2's — by then call N-1 has been *returned* to its caller,
  and the overlap window where its result is still unmaterialized while
  a THIRD call arrives is the pathological triple-interleave, which the
  docstrings explicitly scope out (unpersisting early is a performance
  regression, never a correctness one: Spark recomputes an unpersisted
  relation from lineage).

The bound is the contract: a no-clearCache session (tests, the verify
harness, interactive use) holds at most ``keep`` cached relations per
tracked query, forever, no matter how many times it runs. A caller
wanting a fully clean session uses ``spark.catalog.clearCache()`` after
materializing, exactly as before.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame


class LiveCache:
    """Track persisted relations for one query; retire all but the
    newest ``keep`` under a lock. See the module docstring for the
    concurrency contract."""

    def __init__(self, keep: int = 2):
        self._lock = threading.Lock()
        self._live: list[tuple[DataFrame, object]] = []
        self._keep = int(keep)

    def track(self, df: DataFrame, key: object = None) -> DataFrame:
        """Register a freshly-persisted relation and unpersist entries
        older than the newest ``keep`` (the unpersist itself runs
        outside the lock — it can trigger JVM work and must not
        serialize concurrent callers).

        Same-data guard (r13): ``DataFrame.unpersist`` uncaches by PLAN
        match, not by object — and for plans containing WithCTE the
        uncache matcher normalizes CTE ids while the substitution path
        does not, so retiring an old entry built from the same SQL over
        the same data (the normal case: every call of a query builds
        identical text) silently uncached the LIVE call's entry too.
        From the third call of a query in one session, that put the
        persisted diamond right back to double-scanning — the exact
        behavior the persist exists to prevent (caught by the pinned
        plan fingerprints going scan_memory→scan_parquet under the full
        test suite's call ordering; a ``sameResult`` guard cannot see
        the collision because the renumbered CTE ids make it read
        false, and ``inputFiles`` came back empty for these plans). A
        LiveCache instance tracks ONE query function, so two entries
        can only differ by their input data — which the CALLER knows:
        ``key`` identifies it (the sf_dir at the query sites). A
        retired entry is unpersisted only when its key differs from
        every live entry's; same-key retirements are left for
        clear()/clearCache(), keeping the session bound at ``keep``
        cached relations per distinct input."""
        with self._lock:
            self._live.append((df, key))
            stale = self._live[: -self._keep]
            del self._live[: -self._keep]
            live_keys = [k for _, k in self._live]
        for old, old_key in stale:
            if old_key in live_keys:
                continue
            try:
                old.unpersist()
            except Exception:
                pass
        return df

    def clear(self) -> None:
        """Unpersist everything tracked (test teardown hook)."""
        with self._lock:
            stale, self._live = self._live, []
        for old, _key in stale:
            try:
                old.unpersist()
            except Exception:
                pass
