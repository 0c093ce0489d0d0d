"""Source/sink connectors beyond the parquet catalog.

Reference parity: the reference's only live connector is its PostgreSQL
connection (``datafabric/settings.py:77-86``), consumed through a raw
cursor; its only sink is the ``query_logs`` append
(``core/ai_query_generator.py:367-375``). Here:

- :func:`read_jdbc` builds the equivalent Spark JDBC reader (predicate
  pushdown + partitioned parallel reads — the distributed upgrade of the
  single cursor). No database exists in this environment, so it is
  config-construction only, exercised by tests for option wiring.
- File formats (csv/json/orc/parquet) come via :func:`read_table`, always
  schema-explicit (schema inference is a full extra pass at 100 TB).
- :func:`append_query_log` is the durable form of the engine's log sink.

Lakehouse formats (Delta/Iceberg/Hudi) need jars absent from this image;
:func:`read_table` raises a clear error for them rather than guessing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LAKEHOUSE = {"delta", "iceberg", "hudi"}


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    fetch_size: int = 10_000,
):
    """Configured JDBC reader (lazy — nothing connects until an action).

    With ``partition_column`` + bounds, Spark issues ``num_partitions``
    range-sliced queries in parallel; without them, a single-cursor read
    (exactly the reference's behavior — fine for dimension tables only).
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetch_size))
    )
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC reads need lower_bound/upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return reader


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options,
) -> DataFrame:
    """Schema-explicit reader over the file formats in this image."""
    fmt = fmt.lower()
    if fmt in _LAKEHOUSE:
        raise NotImplementedError(
            f"{fmt} requires its connector jars on the classpath (not in this "
            "environment); parquet/orc/csv/json are available"
        )
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in {"csv", "json"}:
        raise ValueError(
            f"{fmt} reads require an explicit schema (inference is a full "
            "extra data pass and type-unstable)"
        )
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.format(fmt).options(**options).load(path)


#: Schema of the query-log sink — mirror of the reference's query_logs table
#: (core/models.py:58-72 / FIXTURES.md section 2).
QUERY_LOG_SCHEMA = (
    "original_query string, generated_sql string, success boolean, "
    "error_message string, execution_time double, result_count int, "
    "cached boolean"
)


def append_query_log(spark: SparkSession, path: str, entries: list[tuple]) -> None:
    """Append log rows (QUERY_LOG_SCHEMA order, without timestamp) to a
    parquet sink with an auto ``timestamp`` column — the reference's
    append-only QueryLog semantics, durable."""
    (
        spark.createDataFrame(entries, QUERY_LOG_SCHEMA)
        .withColumn("timestamp", F.current_timestamp())
        .write.mode("append")
        .parquet(path)
    )
