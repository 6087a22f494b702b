"""Memory-engine state-transform tests — semantics mirror the reference's
integration tests (tests/integration/test_memory_integration.py: CRUD
lifecycle, expiration+cleanup, filtering) re-expressed as state→state'
assertions (SURVEY §7 'OLTP-on-batch')."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from mcp_synaptic_spark.operators import memory as M

def _now():
    return F.to_timestamp(F.lit("2024-01-15 00:00:00"))

SCHEMA = (
    "id string, key string, data string, memory_type string, expiration_policy string, "
    "created_at timestamp, updated_at timestamp, last_accessed_at timestamp, "
    "expires_at timestamp, ttl_seconds int, access_count int, "
    "tags map<string,string>, metadata string"
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _row(key, mt="short_term", policy="absolute", created="2024-01-14 00:00:00",
         expires="2024-01-16 00:00:00", ttl=3600, access=0, data='{"v":1}', tags=None):
    c = datetime.fromisoformat(created)
    e = datetime.fromisoformat(expires) if expires else None
    return (f"id-{key}", key, data, mt, policy, c, c, c, e, ttl, access, tags or {}, None)


def test_upsert_replaces_same_key(spark):
    state = _mk(spark, [_row("a"), _row("b")])
    newer = _mk(spark, [_row("a", data='{"v":2}')])
    out = M.upsert_by_key(state, newer)
    assert out.count() == 2
    assert out.where("key = 'a'").first().data == '{"v":2}'  # INSERT OR REPLACE semantics


def test_memory_delete_idempotent(spark):
    state = _mk(spark, [_row("a"), _row("b")])
    out = M.memory_delete(state, "a")
    assert [r.key for r in out.collect()] == ["b"]
    assert M.memory_delete(out, "zzz").count() == 1  # deleting absent key is a no-op


def test_touch_increments_and_slides(spark):
    state = _mk(
        spark,
        [
            _row("s", policy="sliding", ttl=600, access=5),
            _row("a", policy="absolute", ttl=600, access=1),
        ],
    )
    out = M.memory_touch(state, "s", _now())
    s = out.where("key = 's'").first()
    a = out.where("key = 'a'").first()
    assert s.access_count == 6
    assert s.last_accessed_at == datetime.fromisoformat("2024-01-15 00:00:00")
    # sliding policy: expires_at recomputed = now + ttl (X10, models/memory.py:85-94)
    assert s.expires_at == datetime.fromisoformat("2024-01-15 00:10:00")
    # untouched row unchanged
    assert a.access_count == 1
    assert a.expires_at == datetime.fromisoformat("2024-01-16 00:00:00")


def test_update_merges_tags_right_biased(spark):
    state = _mk(spark, [_row("a", tags={"k1": "old", "k2": "keep"})])
    out = M.memory_update(state, "a", _now(), tags={"k1": "new", "k3": "added"})
    tags = out.first().tags
    # dict.update semantics: merge, new keys win (reference operations.py:129-132)
    assert tags == {"k1": "new", "k2": "keep", "k3": "added"}


def test_update_extend_ttl_recomputes_expiry(spark):
    state = _mk(spark, [_row("a", policy="absolute", created="2024-01-14 00:00:00", ttl=3600)])
    out = M.memory_update(state, "a", _now(), extend_ttl=7200)
    r = out.first()
    assert r.ttl_seconds == 7200
    # absolute policy: created_at + ttl (X9)
    assert r.expires_at == datetime.fromisoformat("2024-01-14 02:00:00")


def test_cleanup_expired_partitions_state(spark):
    state = _mk(
        spark,
        [
            _row("live", expires="2024-01-16 00:00:00"),
            _row("dead", expires="2024-01-14 00:00:00"),
            _row("never", expires=None, policy="never"),
        ],
    )
    survivors, expired = M.cleanup_expired(state, _now())
    assert sorted(r.key for r in survivors.collect()) == ["live", "never"]
    assert [r.key for r in expired.collect()] == ["dead"]


def test_memory_list_filters_and_paginates(spark):
    rows = [
        _row(f"k{i:02d}", mt="short_term" if i % 2 == 0 else "long_term",
             created=f"2024-01-{10 + i % 5:02d} 00:00:00",
             expires="2024-01-20 00:00:00" if i % 3 else "2024-01-01 00:00:00")
        for i in range(12)
    ]
    state = _mk(spark, rows)
    out = M.memory_list(state, _now(), memory_types=["short_term"], limit=3, offset=1)
    got = [r.key for r in out.collect()]
    # expired rows (i % 3 == 0) excluded; deterministic (created_at, key) order
    live_short = sorted(
        [(f"2024-01-{10 + i % 5:02d}", f"k{i:02d}") for i in range(12) if i % 2 == 0 and i % 3],
    )
    assert got == [k for _, k in live_short][1:4]


def test_memory_exists_respects_expiry(spark):
    state = _mk(spark, [_row("dead", expires="2024-01-14 00:00:00"), _row("live", expires="2024-01-16 00:00:00")])
    assert M.memory_exists(state, "live", _now()).count() == 1
    assert M.memory_exists(state, "dead", _now()).count() == 0  # expired ⇒ treated as absent
