"""Engine metrics — the CloudWatch replacement (SURVEY §4: "Explicitly NOT
ported: CloudWatch-SNS wiring … replaced by engine config +
StreamingQueryListener metrics").

A :class:`MetricsListener` subscribes to every streaming query on the
session and records per-batch progress (rows, duration, per-source rates)
as plain dict rows; :func:`metrics_df` turns the buffer into a DataFrame so
the 1-minute Sum/Avg rollups of the reference (app.ts:452-502, queries
``ref_minute_sum``/``ref_minute_avg``) apply to the engine's own telemetry
unchanged. Threshold alarms are then ``ref_alarm_threshold`` over this
table instead of CloudWatch alarms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

_SCHEMA = (
    "query_id string, batch_id long, num_input_rows long, "
    "process_ms long, trigger_ts string"
)


class MetricsListener(StreamingQueryListener):
    """Collects per-micro-batch progress events in memory (driver-side
    buffer; a production deployment points this at its metric store)."""

    def __init__(self) -> None:
        self.rows: list[tuple] = []

    # StreamingQueryListener contract
    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        duration = p.durationMs.get("triggerExecution", 0) if p.durationMs else 0
        self.rows.append(
            (
                str(p.id),
                int(p.batchId),
                int(p.numInputRows),
                int(duration),
                str(p.timestamp),
            )
        )

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass


def metrics_df(spark: SparkSession, listener: MetricsListener) -> DataFrame:
    """The listener buffer as a DataFrame (metric time-series table,
    SURVEY §1.1 #7)."""
    rows = listener.rows or []
    return spark.createDataFrame(rows, _SCHEMA)
