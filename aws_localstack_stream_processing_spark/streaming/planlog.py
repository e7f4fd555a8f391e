"""Capture of the most recent streaming run's executed plan.

A streaming physical plan only exists while its query runs, so every
harness path that awaits a bounded streaming query records the plan here
at termination time; the registry-wide streaming plan lint
(tests/test_plans.py::test_streaming_registry_wide_plan_lint) replays each
``stream_*`` query and asserts scale properties over the recorded text.
"""

from __future__ import annotations

LAST_STREAM_PLAN: dict[str, str] = {"plan": ""}


def note_plan(q) -> None:
    """Best-effort record of a (finished) StreamingQuery's executed plan."""
    try:
        LAST_STREAM_PLAN["plan"] = q._jsq.explainInternal(True)
    except Exception:  # diagnostics only — never fail the query path
        LAST_STREAM_PLAN["plan"] = ""
