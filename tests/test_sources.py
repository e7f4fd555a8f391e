"""Source-connector tests: JSON with per-record failure isolation, strict
CSV, lake read-back pruning, Kinesis option factory."""

from __future__ import annotations

import json

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from .conftest import SF_DIR


def test_json_reader_splits_corrupt_records(spark, tmp_path):
    from aws_localstack_stream_processing_spark.sources import read_json_with_dlq

    p = tmp_path / "in.jsonl"
    good = [{"id": i, "name": f"n{i}"} for i in range(20)]
    lines = [json.dumps(g) for g in good]
    lines.insert(5, '{"id": broken')          # malformed JSON
    lines.insert(11, '{"id": "notanint", "name": "x"}')  # schema violation
    p.write_text("\n".join(lines))

    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    ok, dlq = read_json_with_dlq(spark, str(p), schema)
    assert ok.count() == 20
    assert dlq.count() == 2
    raws = [r.raw_record for r in dlq.collect()]
    assert any("broken" in r for r in raws)
    assert any("notanint" in r for r in raws)
    # ok side parsed with the declared types
    assert dict(ok.dtypes) == {"id": "bigint", "name": "string"}


def test_csv_strict_reader(spark, tmp_path):
    from aws_localstack_stream_processing_spark.sources import read_csv_strict

    p = tmp_path / "keys.csv"
    p.write_text("key_id,address\n1,addr_1\n2,addr_2\n")
    schema = StructType(
        [StructField("key_id", LongType()), StructField("address", StringType())]
    )
    df = read_csv_strict(spark, str(p), schema)
    assert [(r.key_id, r.address) for r in df.orderBy("key_id").collect()] == [
        (1, "addr_1"),
        (2, "addr_2"),
    ]


def test_lake_roundtrip_prunes_partitions(spark, tmp_path):
    from aws_localstack_stream_processing_spark.sources import read_lake
    from aws_localstack_stream_processing_spark.streaming.jobs import (
        run_ingest_stream,
    )

    lake = str(tmp_path / "lake")
    run_ingest_stream(spark, SF_DIR, lake, str(tmp_path / "ckpt"))
    one = read_lake(spark, lake, partition="partition_0")
    plan = one._jdf.queryExecution().executedPlan().toString()
    # partition filter applied at the file index, not as a data filter
    assert "PartitionFilters: [isnotnull(partition" in plan
    assert one.count() > 0


def test_kinesis_option_factory():
    from aws_localstack_stream_processing_spark.sources.kinesis import (
        kinesis_options,
    )

    opts = kinesis_options(
        "tx-stream", region="eu-west-1", max_records_per_fetch=10
    )
    assert opts["streamName"] == "tx-stream"
    assert opts["endpointUrl"] == "https://kinesis.eu-west-1.amazonaws.com"
    assert opts["maxRecordsPerFetch"] == "10"
    with pytest.raises(ValueError):
        kinesis_options("")
    with pytest.raises(ValueError):
        kinesis_options("s", starting_position="MIDDLE")


def test_kinesis_stream_unavailable_raises(spark):
    from aws_localstack_stream_processing_spark.sources.kinesis import (
        kinesis_available,
        kinesis_stream,
    )

    if kinesis_available(spark):
        pytest.skip("a Kinesis connector is present on this classpath")
    with pytest.raises(RuntimeError, match="file-backed equivalent"):
        kinesis_stream(spark, "tx-stream")


def test_jdbc_option_factory():
    from aws_localstack_stream_processing_spark.sources.jdbc import (
        jdbc_options,
        jdbc_subquery,
    )

    # remote-side pushdown: projection + predicate live in the subquery
    sq = jdbc_subquery(
        "keys", columns=["key_id", "last_used_at"], where="active = true"
    )
    assert sq == (
        "(SELECT key_id, last_used_at FROM keys WHERE active = true)"
        " AS slsp_pushdown"
    )

    opts = jdbc_options(
        "jdbc:postgresql://db:5432/signer",
        "keys",
        user="svc",
        password="pw",
        partition_column="key_id",
        lower_bound=0,
        upper_bound=100_000,
        num_partitions=16,
    )
    assert opts["partitionColumn"] == "key_id"
    assert opts["numPartitions"] == "16"
    assert opts["dbtable"].startswith("(SELECT * FROM keys)")

    with pytest.raises(ValueError, match="not a JDBC url"):
        jdbc_options("postgresql://db/signer", "keys")
    with pytest.raises(ValueError, match="ALL of"):
        jdbc_options("jdbc:postgresql://db/x", "keys", partition_column="k")
    with pytest.raises(ValueError, match="table is required"):
        jdbc_subquery("")


def test_jdbc_keyring_unavailable_raises(spark):
    from aws_localstack_stream_processing_spark.sources.jdbc import (
        jdbc_driver_available,
        read_keyring_jdbc,
    )

    if jdbc_driver_available(spark, "org.postgresql.Driver"):
        pytest.skip("a postgres driver is present on this classpath")
    with pytest.raises(RuntimeError, match="state-store-backed ring"):
        read_keyring_jdbc(spark, "jdbc:postgresql://db:5432/signer")


def test_orc_roundtrip_matches_parquet(spark, tmp_path):
    """Format breadth: the same table written as ORC reads back identical to
    the parquet original (schema + values), and ORC scans still get
    predicate pushdown."""
    src = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    orc_path = str(tmp_path / "orders_orc")
    src.write.mode("overwrite").orc(orc_path)
    back = spark.read.orc(orc_path)
    assert [f.simpleString() for f in back.schema.fields] == [
        f.simpleString() for f in src.schema.fields
    ]
    a = sorted(map(tuple, src.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
    plan = (
        back.filter("o_totalprice > 100000")
        ._jdf.queryExecution()
        .sparkPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "o_totalprice" in plan.split("PushedFilters")[1][:200]
