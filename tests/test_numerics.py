"""Stable-sum micro-unit range guard (ADVICE r02): the 2^63 cap is a real
bound this corpus reaches near sf40 on a global sum — verify the documented
math against the actual data and exercise the runtime guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_driven_data_fabric_architecture_for_unified_intelligent_information_retrieval_from_database_spark.functions.numerics import (
    assert_microunit_headroom,
    stable_sum_wide,
)

from conftest import SF_ORACLE


def test_headroom_ok_on_small_corpus(spark):
    df = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet").select(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    ratio = assert_microunit_headroom(df, "rev")
    assert ratio > 1.0


def test_documented_sf40_bound_matches_data(spark):
    """Global revenue is ~2.3e11 per sf unit; COUNT x MAX (the guard's
    worst case) caps the safe sf near single digits, actual totals near
    sf40 — both far below the old 'past ~sf200' claim."""
    df = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    total = df.agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    ).head()[0]
    per_sf = total / 0.01  # this file is sf0.01
    safe_sf_actual = (2**63 - 1) / 1e6 / per_sf
    assert 20 < safe_sf_actual < 80  # ~sf40, not ~sf200


def test_guard_raises_past_range(spark):
    df = spark.range(1000).select((F.col("id") * 1e13).alias("x"))
    with pytest.raises(OverflowError, match="stable_sum_wide"):
        assert_microunit_headroom(df, "x")


def test_wide_form_exact_past_microunit_range(spark):
    # 200 rows x 1e11 = 2e13 total: micro-units would need 2e19 > 2^63
    # (guard refuses), while each value still fits decimal(18,6) and the
    # decimal accumulator sums it exactly.
    df = spark.range(200).select(F.lit(1.0e11).alias("x"))
    with pytest.raises(OverflowError):
        assert_microunit_headroom(df, "x")
    wide = df.agg(stable_sum_wide("x").alias("s")).head()["s"]
    assert wide == pytest.approx(2.0e13)
