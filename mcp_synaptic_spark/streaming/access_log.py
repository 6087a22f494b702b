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


# ---------------------------------------------------------------------------
# full replay: the stateful twin of operators/memory.apply_access_log with the
# reference's get() contract (reference memory/manager/operations.py:66-86) —
# live access touches (sliding slides expiry), access on an expired row
# deletes it, later accesses are misses.
# ---------------------------------------------------------------------------

REPLAY_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("alive", T.BooleanType(), False),
        T.StructField("n_alive", T.LongType(), False),
        T.StructField("last_alive_at", T.TimestampType(), True),
    ]
)

REPLAY_STATE_SCHEMA = T.StructType(
    [
        T.StructField("alive", T.LongType(), True),
        T.StructField("expiry_us", T.LongType(), True),  # None = no expiry
        T.StructField("n", T.LongType(), True),
        T.StructField("last_us", T.LongType(), True),
    ]
)


def replay_access_stream(
    access_with_meta: DataFrame,
    *,
    key_col: str = "key",
    ts_col: str = "ts",
) -> DataFrame:
    """Stateful replay of an access stream against memory-row metadata.

    Input: the access stream ALREADY stream-static-joined to the memories
    snapshot, carrying per-row columns (key, ts, expires_at, expiration_policy,
    ttl_seconds) with pre-creation accesses filtered out (``ts >= created_at``)
    — exactly the prologue operators/memory.apply_access_log uses.

    Per-key state: (alive, current expiry µs, live-touch count, last live
    access µs) — three scalars + a flag, keyed by the groupBy shuffle; RocksDB
    state store scales the key count. Assumes per-key in-ts-order delivery
    (each micro-batch is sorted here; cross-batch reordering needs a
    watermark-delayed sort upstream, standard for event-time replays).
    """

    def update(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            alive, expiry_us, n, last_us = state.get
        else:
            alive, expiry_us, n, last_us = 1, None, 0, None
        seeded = state.exists
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            if not seeded and len(pdf):
                row0 = pdf.iloc[0]
                e0 = row0["expires_at"]
                expiry_us = None if pd.isna(e0) else int(pd.Timestamp(e0).value // 1000)
                seeded = True
            for row in pdf.itertuples(index=False):
                if not alive:
                    break
                ts_us = int(pd.Timestamp(getattr(row, ts_col)).value // 1000)
                if expiry_us is None or ts_us < expiry_us:
                    n += 1
                    last_us = ts_us
                    ttl = getattr(row, "ttl_seconds")
                    if (
                        getattr(row, "expiration_policy") == "sliding"
                        and ttl is not None
                        and not pd.isna(ttl)
                        and ttl > 0
                    ):
                        expiry_us = ts_us + int(ttl) * 1_000_000
                else:
                    alive = 0  # reference: delete-and-raise; never revives
        state.update((alive, expiry_us, n, last_us))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "alive": [bool(alive)],
                "n_alive": [n],
                "last_alive_at": [pd.Timestamp(last_us * 1000) if last_us is not None else None],
            }
        )

    return (
        access_with_meta.select(key_col, ts_col, "expires_at", "expiration_policy", "ttl_seconds")
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=REPLAY_OUTPUT_SCHEMA,
            stateStructType=REPLAY_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
