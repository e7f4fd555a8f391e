"""JDBC control-table source — the reference's external keyring database.

The reference keeps its signing key ring in an Aurora PostgreSQL table and
reads/rotates it with row-level SQL (signer/index.js:35-41 builds the pg
pool; 156-179 runs ``SELECT ... ORDER BY last_used_at ASC LIMIT 1 FOR
UPDATE SKIP LOCKED``). This engine's default replaces the external DB with
the streaming state store (streaming/keyring.py), but deployments that
already own such a control table read it straight in with
``spark.read.jdbc`` — this module builds that reader.

Scale notes (the parts that matter at 100 TB):
- control tables are small (a key ring is ~100 rows): read single-partition
  and BROADCAST into the join against the fact stream — never shuffle the
  fact side against a JDBC table;
- for big JDBC tables, partitioned reads need (partition_column, bounds,
  num_partitions) so Spark issues range-sliced parallel queries;
- predicates given as ``WHERE``-clause strings push into the remote DB via
  the dbtable-subquery pattern (the JDBC source cannot see Catalyst
  filters applied after ``.load()``; pushing them into the subquery is the
  JDBC analogue of parquet predicate pushdown).

No JDBC driver jar is bundled in this container, so (like
:mod:`.kinesis`) construction is gated behind a classpath probe and the
option/subquery-building logic is unit-tested directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_subquery(table: str, columns: list[str] | None = None,
                  where: str | None = None) -> str:
    """The pushdown subquery for ``dbtable``: projection + predicate run
    inside the remote database, not in Spark."""
    if not table:
        raise ValueError("table is required")
    cols = ", ".join(columns) if columns else "*"
    sql = f"SELECT {cols} FROM {table}"
    if where:
        sql += f" WHERE {where}"
    return f"({sql}) AS slsp_pushdown"


def jdbc_options(
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    columns: list[str] | None = None,
    where: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 1000,
) -> dict[str, str]:
    """Build the option map for ``spark.read.format("jdbc")``.

    Either all of (partition_column, lower_bound, upper_bound,
    num_partitions) for a range-partitioned parallel read, or none of them
    for a single-partition read (the right choice for a ~100-row control
    table that will be broadcast anyway)."""
    if not url.startswith("jdbc:"):
        raise ValueError(f"not a JDBC url: {url!r}")
    part = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(p is not None for p in part) and any(p is None for p in part):
        raise ValueError(
            "partitioned read needs ALL of partition_column/lower_bound/"
            "upper_bound/num_partitions"
        )
    opts = {
        "url": url,
        "dbtable": jdbc_subquery(table, columns, where),
        "fetchsize": str(fetch_size),
    }
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    if driver is not None:
        opts["driver"] = driver
    if partition_column is not None:
        opts["partitionColumn"] = partition_column
        opts["lowerBound"] = str(lower_bound)
        opts["upperBound"] = str(upper_bound)
        opts["numPartitions"] = str(num_partitions)
    return opts


def jdbc_driver_available(spark: SparkSession, driver: str) -> bool:
    """True when the named JDBC driver class is loadable on the session's
    JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(driver)
        return True
    except Exception:
        return False


def read_keyring_jdbc(
    spark: SparkSession,
    url: str,
    table: str = "keys",
    driver: str = "org.postgresql.Driver",
    **kwargs,
) -> DataFrame:
    """The reference's keyring table (signer/index.js:156-179) as a
    DataFrame: single-partition read (the ring is tiny), ready to broadcast
    into the key-assignment join. Raises RuntimeError when no driver jar is
    on the classpath — in-container callers use the state-store keyring
    (streaming/keyring.py) instead."""
    if not jdbc_driver_available(spark, driver):
        raise RuntimeError(
            f"JDBC driver {driver} not on the classpath; add the driver jar, "
            "or use streaming.keyring for the state-store-backed ring"
        )
    reader = spark.read.format("jdbc")
    for k, v in jdbc_options(url, table, driver=driver, **kwargs).items():
        reader = reader.option(k, v)
    return reader.load()
