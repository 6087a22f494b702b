"""Streaming twin of operators/memory.apply_access_log (SURVEY §2.10).

The reference's touch-on-read (models/memory.py:85-94) becomes, in streaming
form, a keyed stateful operator over the access_log stream: per key we keep
(last access ts, touch count) in state via applyInPandasWithState and emit the
updated values each micro-batch. Joining the emitted updates back to the
memories table (and recomputing sliding expires_at) is the same batch
transform either way — the stateful operator only maintains the per-key
access aggregate, which is the part that actually needs state.

Scale notes: state is two scalars per key, partitioned by key (the groupBy
shuffle); RocksDB state store handles key counts far beyond executor memory.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("last_accessed_at", T.TimestampType(), True),
        T.StructField("n_touches", T.LongType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts", T.LongType(), True),  # µs since epoch
        T.StructField("n", T.LongType(), True),
    ]
)


def touch_updates_stream(access_stream: DataFrame, *, key_col: str = "key", ts_col: str = "ts") -> DataFrame:
    """(key, last_accessed_at, n_touches) updates, one row per key per batch."""

    def update(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        last_us, n = state.get if state.exists else (None, 0)
        for pdf in pdfs:
            ts = pd.to_datetime(pdf[ts_col])
            batch_max = ts.max()
            batch_max_us = int(batch_max.value // 1000)
            last_us = batch_max_us if last_us is None else max(last_us, batch_max_us)
            n += len(pdf)
        state.update((last_us, n))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "last_accessed_at": [pd.Timestamp(last_us * 1000) if last_us is not None else None],
                "n_touches": [n],
            }
        )

    return (
        access_stream.select(key_col, ts_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
