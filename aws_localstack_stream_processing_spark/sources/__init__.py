"""Batch + streaming source connectors.

- :mod:`readers` — schema-enforced batch readers (parquet/JSON/CSV) with the
  reference's per-record failure isolation (PERMISSIVE corrupt-record split,
  SURVEY §2.2 F3) and the partition-pruned lake reader.
- :mod:`kinesis` — option builder for the Kinesis streaming source named in
  the reference architecture (Firehose DirectPut, SURVEY §2.1 S1); the
  connector jar is not bundled here, so construction is gated behind
  availability and the option logic is unit-tested directly.
- :mod:`jdbc` — the external control-table path (the reference's Aurora
  keyring, SURVEY §2.1 S10): ``spark.read.jdbc`` reader with remote-side
  projection/predicate pushdown and range-partitioned parallel reads,
  gated behind a driver-classpath probe like the Kinesis source.
"""

from .jdbc import jdbc_options, jdbc_subquery, read_keyring_jdbc  # noqa: F401
from .readers import read_csv_strict, read_json_with_dlq, read_lake  # noqa: F401
