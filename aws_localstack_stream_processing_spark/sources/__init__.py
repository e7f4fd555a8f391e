"""Batch + streaming source connectors.

- :mod:`readers` — schema-enforced batch readers (parquet/JSON/CSV) with the
  reference's per-record failure isolation (PERMISSIVE corrupt-record split,
  SURVEY §2.2 F3) and the partition-pruned lake reader.
- :mod:`kinesis` — option builder for the Kinesis streaming source named in
  the reference architecture (Firehose DirectPut, SURVEY §2.1 S1); the
  connector jar is not bundled here, so construction is gated behind
  availability and the option logic is unit-tested directly.
"""

from .readers import read_csv_strict, read_json_with_dlq, read_lake  # noqa: F401
