"""Memory-engine operators (SURVEY.md §2.9 Q1–Q8) as batch transforms.

The reference is an OLTP-ish keyed store (SQLite/Redis). The Spark-first
re-expression treats the ``memories`` table as state and each operation as a
deterministic DataFrame transform ``state → state'`` (SURVEY §7 "OLTP-on-
batch"). Upserts use union + window-dedupe on (key, updated_at) so vanilla
parquet suffices; the DURABLE multi-writer story (the reference's SQLite
transactionality) is state/txn.py — a Delta-protocol commit log whose
``TxnTable.upsert``/``delete_where`` apply these same transforms
copy-on-write under optimistic concurrency (graded end-to-end by the
``memory_upsert_txn`` oracle query). On a Delta-enabled cluster they
compile to MERGE/DELETE instead.

Scale notes: every transform here is a narrow map or a single keyed shuffle on
``key`` — partition the table by bucket(key) in production and the window
dedupe co-locates with zero extra exchange. Stats are one multi-aggregate
pass (map-side partial agg).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.ttl import (
    effective_ttl,
    expiry_for_policy,
    is_expired,
    not_expired_predicate,
)


def memories_live(memories: DataFrame, now: Column) -> DataFrame:
    """F3 — the always-on not-expired view every reader sees
    (reference memory/storage/sqlite.py:162-164; Redis offloads to SETEX)."""
    return memories.where(not_expired_predicate(F.col("expires_at"), now))


def memory_list(
    memories: DataFrame,
    now: Column,
    *,
    keys: Sequence[str] | None = None,
    memory_types: Sequence[str] | None = None,
    include_expired: bool = False,
    tags: dict[str, str] | None = None,
    created_after=None,
    created_before=None,
    limit: int = 10,
    offset: int = 0,
) -> DataFrame:
    """Q5 — memory_list (reference memory/storage/sqlite.py:143-180).

    F1 (keys IN) ∧ F2 (type IN) ∧ F3 (not expired unless include_expired) ∧
    F4 (tags / created-range — declared in MemoryQuery models/memory.py:138-161
    but unimplemented by every reference backend; implemented here) → L1
    pagination. The reference paginates with NO order-by (storage order);
    Spark has no stable scan order, so we order deterministically by
    (created_at, key) — documented deviation, SURVEY §7.3.
    """
    df = memories
    if keys is not None:
        df = df.where(F.col("key").isin(list(keys)))
    if memory_types is not None:
        df = df.where(F.col("memory_type").isin(list(memory_types)))
    if not include_expired:
        df = df.where(not_expired_predicate(F.col("expires_at"), now))
    if tags:
        for k, v in tags.items():
            df = df.where(F.col("tags").getItem(k) == v)
    if created_after is not None:
        df = df.where(F.col("created_at") > created_after)
    if created_before is not None:
        df = df.where(F.col("created_at") < created_before)
    return df.orderBy(F.col("created_at").asc(), F.col("key").asc()).offset(offset).limit(limit)


def memory_stats(memories: DataFrame, now: Column) -> DataFrame:
    """Q6 — full stats in ONE aggregate pass (map-side combinable).

    A1 total, A3 expired count, A9 avg TTL / oldest / newest / max access /
    total bytes — the reference declares A9 in MemoryStats
    (models/memory.py:164-190) but stubs the values to 0/None in both backends
    (sqlite.py:220-228, redis.py:130-138); implemented fully here.
    size_bytes approximates the reference's sys.getsizeof via octet_length of
    the JSON payload (X14, models/memory.py:72-76 — documented approximation).
    """
    expired = is_expired(F.col("expires_at"), now)
    return memories.agg(
        F.count("*").alias("total_memories"),
        F.sum(expired.cast("long")).alias("expired_memories"),
        F.round(F.avg("ttl_seconds"), 6).alias("avg_ttl_seconds"),
        F.min("created_at").alias("oldest_memory"),
        F.max("created_at").alias("newest_memory"),
        F.max("access_count").alias("max_access_count"),
        F.sum(F.octet_length(F.col("data"))).alias("total_size_bytes"),
    )


def memory_stats_by_type(memories: DataFrame) -> DataFrame:
    """Q6/A2 — count per memory_type (reference sqlite.py:207-211)."""
    return memories.groupBy("memory_type").agg(F.count("*").alias("cnt"))


def cleanup_expired(memories: DataFrame, now: Column) -> tuple[DataFrame, DataFrame]:
    """Q7 — the 300 s expiry sweep (reference memory/manager/queries.py:32-44,
    sqlite.py:182-195): DELETE WHERE expires_at IS NOT NULL AND expires_at <= now.

    Returns (surviving_state, expired_rows); the count of the second element
    is the reference's return value, and its rows feed the memory_expired
    event stream (§2.10).
    """
    cond = F.col("expires_at").isNotNull() & (F.col("expires_at") <= now)
    return memories.where(~cond), memories.where(cond)


def expired_count(memories: DataFrame, now: Column) -> DataFrame:
    """Q7 count as a single-row aggregate (oracle-checkable)."""
    cond = F.col("expires_at").isNotNull() & (F.col("expires_at") <= now)
    return memories.agg(F.sum(cond.cast("long")).alias("expired_count"))


def memory_add(memories: DataFrame, new_rows: DataFrame, now: Column) -> DataFrame:
    """Q1 — add/upsert. Default TTL by type (X11), expiry by policy (X9),
    then last-writer-wins on key (reference sqlite.py INSERT OR REPLACE,
    :81-105 — same key silently replaces).

    Physical shape: union + row_number over (key ORDER BY updated_at DESC) —
    a single shuffle on key; with a bucketed table this is exchange-free.
    """
    prepared = (
        new_rows.withColumn("ttl_seconds", effective_ttl(F.col("ttl_seconds"), F.col("memory_type")).cast("int"))
        .withColumn(
            "expires_at",
            expiry_for_policy(
                F.col("expiration_policy"), F.col("ttl_seconds"), F.col("created_at"), F.col("last_accessed_at")
            ),
        )
    )
    return upsert_by_key(memories, prepared.select(*memories.columns))


def upsert_by_key(state: DataFrame, updates: DataFrame) -> DataFrame:
    """S2 — last-writer-wins keyed upsert via union + window dedupe.

    `updates` rows win ties (marked with a higher priority), matching
    INSERT OR REPLACE semantics.
    """
    s = state.withColumn("_prio", F.lit(0))
    u = updates.withColumn("_prio", F.lit(1))
    w = Window.partitionBy("key").orderBy(F.col("_prio").desc(), F.col("updated_at").desc())
    return (
        s.unionByName(u)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_prio")
    )


def memory_touch(memories: DataFrame, key: str | Sequence[str], now: Column) -> DataFrame:
    """Q2/X10 — touch on read: last_accessed=now, access_count+1, sliding
    policy recomputes expires_at (reference models/memory.py:85-94).

    A read that lands on an ALREADY-EXPIRED row never revives it: the
    reference's get deletes the row and raises MemoryExpiredError
    (reference memory/manager/operations.py:74-79), so here the expired hit
    is removed from the returned state instead of being touched.

    `key` may be one key or a batch: a multi-key touch is ONE predicated
    rewrite (each row's outcome depends only on its own key), not a chain of
    per-key passes over the table.

    Narrow transform — no shuffle: a predicated column rewrite + filter.
    """
    keys = [key] if isinstance(key, str) else list(key)
    hit = F.col("key").isin(keys)
    expired_now = F.col("expires_at").isNotNull() & (F.col("expires_at") <= now)
    sliding = hit & (F.col("expiration_policy") == "sliding") & F.col("ttl_seconds").isNotNull() & (F.col("ttl_seconds") > 0)
    return (
        memories.where(~(hit & expired_now))
        .withColumn("access_count", F.when(hit, F.col("access_count") + 1).otherwise(F.col("access_count")))
        .withColumn("last_accessed_at", F.when(hit, now).otherwise(F.col("last_accessed_at")))
        .withColumn(
            "expires_at",
            F.when(sliding, F.timestamp_add("SECOND", F.col("ttl_seconds").cast("long"), now)).otherwise(
                F.col("expires_at")
            ),
        )
    )


def apply_access_log(
    memories: DataFrame,
    access_log: DataFrame,
    *,
    key_col: str = "key",
    ts_col: str = "ts",
) -> DataFrame:
    """X10 at scale — touch-as-a-stream (SURVEY §2.10 sliding TTL on access).

    The reference mutates a row on every read (models/memory.py:85-94), which
    couples reads to writes. At scale, reads land in an append-only
    access_log(key, ts) and the current state is recomputed in one pass over
    the log — instead of per-read row rewrites.

    Replay semantics match the reference's get() exactly
    (reference memory/manager/operations.py:66-86), in access-ts order:

    - an access before the row's created_at is a miss (row not yet stored) —
      no effect;
    - an access that finds the row live touches it: access_count+1,
      last_accessed=ts, and sliding policy slides expires_at to ts+ttl;
    - an access that finds the row EXPIRED deletes it (delete-and-raise);
      the row never revives, and every later access is a miss.

    All JVM-side: the per-key ordered fold reduces to lag() + a running
    min() window over the joined log — liveness of access i depends only on
    the previous access ts and the policy, so no iterative/UDF state is
    needed. One shuffle on key for the window + one keyed join.
    """
    acc = access_log.select(F.col(key_col).alias("key"), F.col(ts_col).alias("_ats"))
    meta = memories.select(
        "key",
        F.col("created_at").alias("_c0"),
        F.col("expires_at").alias("_e0"),
        F.col("expiration_policy").alias("_pol"),
        F.col("ttl_seconds").alias("_ttl"),
    )
    j = acc.join(meta, "key").where(F.col("_ats") >= F.col("_c0"))
    w = Window.partitionBy("key").orderBy("_ats")
    sliding_row = (F.col("_pol") == "sliding") & F.col("_ttl").isNotNull() & (F.col("_ttl") > 0)
    prev_ts = F.lag("_ats").over(w)
    # expiry boundary the i-th access is checked against: sliding rows use
    # the previous access (+ttl) once one exists, else the snapshot expiry
    boundary = F.when(
        sliding_row & prev_ts.isNotNull(),
        F.timestamp_add("SECOND", F.col("_ttl").cast("long"), prev_ts),
    ).otherwise(F.col("_e0"))
    flagged = j.withColumn("_ok", (boundary.isNull() | (F.col("_ats") < boundary)).cast("int"))
    # running min: 1 while the row is still alive at this access, 0 after death
    flagged = flagged.withColumn(
        "_cum", F.min("_ok").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_key = flagged.groupBy("key").agg(
        F.sum("_cum").alias("_n_alive"),
        F.max(F.when(F.col("_cum") == 1, F.col("_ats"))).alias("_last_alive"),
        F.min("_ok").alias("_all_ok"),  # 0 ⇒ some access hit an expired row ⇒ deleted
    )
    joined = memories.join(per_key, "key", "left")
    touched = F.col("_n_alive").isNotNull() & (F.col("_n_alive") > 0)
    new_last = F.greatest(F.coalesce(F.col("last_accessed_at"), F.col("_last_alive")), F.col("_last_alive"))
    slide = touched & (F.col("expiration_policy") == "sliding") & F.col("ttl_seconds").isNotNull() & (F.col("ttl_seconds") > 0)
    return (
        joined.where(F.col("_all_ok").isNull() | (F.col("_all_ok") == 1))
        .withColumn(
            "access_count",
            F.when(touched, F.col("access_count") + F.col("_n_alive").cast("int")).otherwise(
                F.col("access_count")
            ),
        )
        .withColumn("last_accessed_at", F.when(touched, new_last).otherwise(F.col("last_accessed_at")))
        .withColumn(
            "expires_at",
            F.when(
                slide, F.timestamp_add("SECOND", F.col("ttl_seconds").cast("long"), new_last)
            ).otherwise(F.col("expires_at")),
        )
        .drop("_n_alive", "_last_alive", "_all_ok")
    )


def memory_update(
    memories: DataFrame,
    key: str,
    now: Column,
    *,
    data: str | None = None,
    tags: dict[str, str] | None = None,
    extend_ttl: int | None = None,
) -> DataFrame:
    """Q3 — update: replace data, MERGE tags (right-biased dict.update — the
    reference tool docstring says "replace" but the code merges:
    memory/manager/operations.py:129-132), updated_at=now, optional TTL extend
    recomputing expires_at per policy (X9).

    The merge is right-biased WITHOUT relying on
    spark.sql.mapKeyDedupPolicy=LAST_WIN: keys present in ``tags`` are dropped
    from the stored map before map_concat, so the concat never sees duplicate
    keys and works under the default EXCEPTION policy (i.e. under any
    caller-provided session).
    """
    hit = F.col("key") == key
    df = memories.withColumn("updated_at", F.when(hit, now).otherwise(F.col("updated_at")))
    if data is not None:
        df = df.withColumn("data", F.when(hit, F.lit(data)).otherwise(F.col("data")))
    if tags:
        new_tags = F.create_map(*[x for k, v in tags.items() for x in (F.lit(k), F.lit(v))])
        new_keys = F.array(*[F.lit(k) for k in tags])
        old_minus_new = F.map_filter(
            F.coalesce(F.col("tags"), F.create_map().cast("map<string,string>")),
            lambda k, _v: ~F.array_contains(new_keys, k),
        )
        df = df.withColumn(
            "tags",
            F.when(hit, F.map_concat(old_minus_new, new_tags)).otherwise(F.col("tags")),
        )
    if extend_ttl is not None:
        df = df.withColumn("ttl_seconds", F.when(hit, F.lit(extend_ttl)).otherwise(F.col("ttl_seconds")))
        df = df.withColumn(
            "expires_at",
            F.when(
                hit,
                expiry_for_policy(
                    F.col("expiration_policy"), F.col("ttl_seconds"), F.col("created_at"), F.col("last_accessed_at")
                ),
            ).otherwise(F.col("expires_at")),
        )
    return df


def memory_delete(memories: DataFrame, key: str) -> DataFrame:
    """Q4 — idempotent delete by key (reference sqlite.py:128-141)."""
    return memories.where(F.col("key") != key)


def memory_exists(memories: DataFrame, key: str, now: Column) -> DataFrame:
    """Q8 — exists = live row with this key (reference queries.py:63-105)."""
    return memories.where((F.col("key") == key) & not_expired_predicate(F.col("expires_at"), now)).select(
        F.lit(key).alias("key")
    )
