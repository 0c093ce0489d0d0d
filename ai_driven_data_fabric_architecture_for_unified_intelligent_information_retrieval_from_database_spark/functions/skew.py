"""Skew-mitigation helpers: salted aggregation and salted joins.

AQE's skew-join splitting (enabled in session.py) handles most runtime skew;
these explicit forms exist for the cases AQE can't fix — a single hot *group*
in an aggregation (AQE never splits one key's partition for aggs) and
broadcast-ineligible joins against a skewed build side. Classic two-phase
salting: spread the hot key over N subkeys, partially aggregate, then
reduce the subaggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_group_count(
    df: DataFrame, key: str | Column, n_salts: int = 16, count_alias: str = "count"
) -> DataFrame:
    """GROUP BY key COUNT(*), resistant to one key dominating the input.

    Phase 1 groups by (key, salt) — the hot key's rows spread over
    ``n_salts`` reducers; phase 2 sums the per-salt partials. The salt is
    derived from a high-cardinality deterministic expression rather than
    rand() so retried tasks produce identical partitions (speculative
    execution safe).
    """
    k = F.col(key) if isinstance(key, str) else key
    salt = F.pmod(F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
                  F.lit(n_salts)).alias("_salt")
    phase1 = (
        df.select(k.alias("_key"), salt)
        .groupBy("_key", "_salt")
        .agg(F.count("*").alias("_partial"))
    )
    return (
        phase1.groupBy("_key")
        .agg(F.sum("_partial").alias(count_alias))
        .withColumnRenamed("_key", key if isinstance(key, str) else "key")
    )


def salted_join_counts(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Inner equi-join where the fact side is skewed on the join key and the
    dim side is too large to broadcast: replicate each dim row ``n_salts``
    times (explode), salt the fact side deterministically, and join on
    (key, salt) — the hot key's fact rows now land on ``n_salts`` different
    reducers instead of one straggler."""
    salt_arr = F.array(*[F.lit(i) for i in range(n_salts)])
    dim_rep = dim.withColumn("_salt", F.explode(salt_arr))
    fact_salted = fact.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
            F.lit(n_salts),
        ).cast("int"),
    )
    return fact_salted.join(
        dim_rep,
        (F.col(fact_key) == F.col(dim_key)) & (fact_salted._salt == dim_rep._salt),
    ).drop("_salt")
