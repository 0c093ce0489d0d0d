"""Custom stateful streaming operator via ``applyInPandasWithState``.

This is the escape hatch for stream semantics the built-in windowed
aggregations cannot express: arbitrary per-key state updated batch-by-batch
(user profiles, fraud counters, CDC merge, model features). Spark keeps the
state in its state store (RocksDB/HDFS-backed on a cluster), partitions it
by the grouping key, and hands each key's rows to Python as Arrow-batched
pandas frames — the per-row cost stays vectorized.

Scale posture: state size is O(distinct keys), not O(events); the
GroupStateTimeout eviction below is what keeps that bounded on an unbounded
feed when keys churn.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Emitted row: the user's running profile as of the latest micro-batch.
PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("n_purchases", LongType()),
        StructField("last_event_type", StringType()),
    ]
)

#: Persisted state per user. last_ts_micros orders batches so
#: last_event_type is deterministic regardless of batch slicing.
STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("n_purchases", LongType()),
        StructField("last_event_type", StringType()),
        StructField("last_ts_micros", LongType()),
    ]
)


def _update_profile(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this batch's events for one user into the persisted profile and
    emit the updated row. Vectorized: one pandas reduction per (key, batch),
    never per event."""
    if state.exists:
        n_events, total_value, n_purchases, last_type, last_ts = state.get
    else:
        n_events, total_value, n_purchases, last_type, last_ts = 0, 0.0, 0, None, -1

    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        n_events += int(len(pdf))
        # float64 pandas sum; the batch-equivalence test allows for
        # last-bit association differences vs the SQL aggregate
        total_value += float(pdf["value"].sum())
        n_purchases += int((pdf["event_type"] == "purchase").sum())
        ts_micros = pdf["ts"].astype("int64") // 1000
        i_max = int(ts_micros.idxmax())
        if int(ts_micros.loc[i_max]) >= last_ts:
            last_ts = int(ts_micros.loc[i_max])
            last_type = str(pdf["event_type"].loc[i_max])

    state.update((n_events, total_value, n_purchases, last_type, last_ts))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n_events],
            "total_value": [total_value],
            "n_purchases": [n_purchases],
            "last_event_type": [last_type],
        }
    )


def user_profile_stream(events: DataFrame) -> DataFrame:
    """Running per-user profile over the event stream.

    ``applyInPandasWithState`` shuffles events by user_id into the state
    store's partitioning once; every micro-batch then updates only the keys
    it saw. No timeout: profiles are lifetime state here (pass a processing-
    time timeout to evict idle keys on a churning keyspace).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=PROFILE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
