"""JDBC source/sink — the analog of the reference's Postgres round-trips.

The reference moves every row through libpq (COPY in,
``/root/reference/dags/patient_claims_plus_postgres.py:55-57``; SQL results
out).  Spark's JDBC connector replaces both directions; the functions here
centralize the scale-relevant options:

* ``partitionColumn/lowerBound/upperBound/numPartitions`` — without them a
  JDBC read is a SINGLE task pulling the whole table through one connection;
  with them each executor reads its own range slice.
* ``fetchsize`` — server-side cursor batching (default 10 rows on Postgres
  drivers; useless at scale).
* ``batchsize`` + ``rewriteBatchedStatements`` analogs for writes.

No JDBC driver jar ships in this container, so these builders are exercised
only up to plan construction in tests; on a cluster, add the driver jar and
they run as-is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 16,
    fetchsize: int = 10_000,
    properties: dict[str, str] | None = None,
) -> DataFrameReader:
    """Configured JDBC reader (call ``.load()`` to scan)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetchsize))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader


def jdbc_write(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    batchsize: int = 10_000,
    properties: dict[str, str] | None = None,
) -> None:
    """Bulk JDBC write (the COPY-in analog): executors write partitions in
    parallel batches; ``overwrite`` reproduces drop-and-recreate idempotency."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
