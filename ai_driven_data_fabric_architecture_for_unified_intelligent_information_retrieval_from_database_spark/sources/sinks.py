"""Write-side layout strategies — the storage half of the 100 TB posture.

The reference's only sink is an append-only query log
(core/ai_query_generator.py:364-377); at scale the *layout* of what you
write decides every later read:

- **date-partitioned parquet** (`write_partitioned`): one directory per
  partition value; readers with a date predicate scan only matching
  directories (partition pruning — visible as ``PartitionFilters`` in the
  scan node). This is the default layout for fact tables at 100 TB.
- **bucketed tables** (`write_bucketed`): rows hash-clustered into N files
  by join key at write time. Two tables bucketed the same way join with
  NO exchange on either side — the shuffle was paid once at write time and
  amortizes over every subsequent join.
- **append log** (`append_log`): the reference's query-log sink shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet: `path/col=value/part-*.parquet`.

    Partition columns should be low-cardinality derivations (a date, not a
    timestamp; a region, not a user id) — each distinct tuple is a
    directory, and millions of tiny directories are their own scale bug.
    """
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Joins and aggregations keyed on ``bucket_col`` between tables with the
    same bucket spec skip the exchange entirely; with ``sort_col`` the
    sort-merge join also skips its sorts.
    """
    w = df.write.bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.mode(mode).format("parquet").saveAsTable(table)


def append_log(df: DataFrame, path: str) -> None:
    """Append-only sink (the reference's query_logs shape,
    core/models.py:58-72): immutable adds, no rewrites — safe for
    concurrent writers and incremental readers."""
    df.write.mode("append").parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Schema-merging read of a partitioned layout (partition columns come
    back as real columns, usable in predicates that prune)."""
    return spark.read.parquet(path)
