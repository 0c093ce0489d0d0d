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

#: Persisted state per user. (last_ts_micros, last_event_id) orders events
#: totally, so last_event_type is deterministic regardless of batch
#: slicing; total value accumulates in exact micro-units (the same
#: encoding as functions/numerics.py) so the emitted double is
#: order-independent and oracle-reproducible, not a float64 fold whose
#: value depends on how the engine sliced the batches.
STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_micro", LongType()),
        StructField("n_purchases", LongType()),
        StructField("last_event_type", StringType()),
        StructField("last_ts_micros", LongType()),
        StructField("last_event_id", LongType()),
    ]
)


def _make_update_profile():
    """Build the per-key state-fold function as a LOCAL closure: cloudpickle
    serializes local functions by value, so the Python workers never need
    this package importable on their own sys.path (a module-level function
    pickles as a module reference and raises ModuleNotFoundError on any
    worker whose PYTHONPATH lacks the repo — e.g. a driver launched from
    another directory)."""
    import pandas as pd

    def _update_profile(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Fold this batch's events for one user into the persisted profile
        and emit the updated row. Vectorized: one pandas reduction per
        (key, batch), never per event."""
        if state.exists:
            n_events, total_micro, n_purchases, last_type, last_ts, last_eid = state.get
        else:
            n_events, total_micro, n_purchases, last_type, last_ts, last_eid = (
                0, 0, 0, None, -1, -1,
            )

        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n_events += int(len(pdf))
            # exact micro-unit accumulation (see numerics.py): the inputs
            # are exact multiples of 1e-6, so value*1e6 is within float
            # error of an integer and never an exact .5 tie — pandas'
            # round-half-to-even and the oracle's ROUND (half-away) agree
            # on every value in the domain, and the running total stays
            # associative across any batch slicing. Inputs with >6
            # decimals would break that equivalence (guarded upstream by
            # the micro-unit domain contract).
            vals = pdf["value"].dropna()
            total_micro += int((vals * 1e6).round().astype("int64").sum())
            n_purchases += int((pdf["event_type"] == "purchase").sum())
            ts_micros = pdf["ts"].astype("int64") // 1000
            order = list(zip(ts_micros.tolist(), pdf["event_id"].tolist()))
            i_max = max(range(len(order)), key=order.__getitem__)
            if order[i_max] >= (last_ts, last_eid):
                last_ts, last_eid = order[i_max]
                last_type = str(pdf["event_type"].iloc[i_max])

        state.update(
            (n_events, total_micro, n_purchases, last_type, last_ts, last_eid)
        )
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n_events],
                "total_value": [total_micro / 1e6],
                "n_purchases": [n_purchases],
                "last_event_type": [last_type],
            }
        )

    return _update_profile


def user_profile_stream(events: DataFrame) -> DataFrame:
    """Running per-user profile over the event stream.

    ``applyInPandasWithState`` shuffles events by user_id into the state
    store's partitioning once; every micro-batch then updates only the keys
    it saw. No timeout: profiles are lifetime state here (pass a processing-
    time timeout to evict idle keys on a churning keyspace).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_profile(),
        outputStructType=PROFILE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
