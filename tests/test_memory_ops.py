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


def test_touch_on_expired_deletes_not_revives(spark):
    """Reference get-on-expired contract (operations.py:74-79): a touch on an
    expired row deletes it; sliding TTL must NOT resurrect it."""
    state = _mk(
        spark,
        [
            _row("dead-s", policy="sliding", ttl=600, expires="2024-01-14 00:10:00", access=3),
            _row("dead-a", policy="absolute", ttl=600, expires="2024-01-14 00:10:00", access=3),
            _row("live", policy="sliding", ttl=600, expires="2024-01-16 00:00:00", access=3),
        ],
    )
    # touching the expired keys removes them
    out = M.memory_touch(state, "dead-s", _now())
    assert sorted(r.key for r in out.collect()) == ["dead-a", "live"]
    out2 = M.memory_touch(out, "dead-a", _now())
    assert sorted(r.key for r in out2.collect()) == ["live"]
    # and the live row still touches normally afterwards
    out3 = M.memory_touch(out2, "live", _now())
    r = out3.first()
    assert r.access_count == 4 and r.expires_at == datetime.fromisoformat("2024-01-15 00:10:00")


def test_apply_access_log_replay_semantics(spark):
    """Ordered replay per reference get() (operations.py:66-86):
    pre-creation accesses are misses; live accesses touch and slide; an
    access on an expired row deletes it; later accesses are misses."""
    state = _mk(
        spark,
        [
            # sliding, ttl 10 min, initial expiry 01:00
            _row("chain", policy="sliding", ttl=600, created="2024-01-14 00:00:00",
                 expires="2024-01-14 01:00:00", access=10),
            # sliding with a gap > ttl: second access finds it expired -> deleted
            _row("gapped", policy="sliding", ttl=600, created="2024-01-14 00:00:00",
                 expires="2024-01-14 01:00:00", access=10),
            # absolute: touches before expiry count, the one after kills it
            _row("fixed", policy="absolute", ttl=600, created="2024-01-14 00:00:00",
                 expires="2024-01-14 01:00:00", access=10),
            # untouched control
            _row("quiet", policy="absolute", created="2024-01-14 00:00:00",
                 expires="2024-01-16 00:00:00", access=10),
        ],
    )
    def t(s):
        return datetime.fromisoformat(s)
    log = spark.createDataFrame(
        [
            # before creation: ignored
            ("chain", t("2024-01-13 23:00:00")),
            # chain: each access within ttl of the previous -> all live
            ("chain", t("2024-01-14 00:50:00")),
            ("chain", t("2024-01-14 00:55:00")),
            ("chain", t("2024-01-14 01:04:00")),  # within 00:55+10m -> live (slid)
            # gapped: first access live, second 30 min later -> expired -> delete
            ("gapped", t("2024-01-14 00:30:00")),
            ("gapped", t("2024-01-14 01:10:00")),
            ("gapped", t("2024-01-14 01:11:00")),  # miss on deleted row
            # fixed: two live touches then one past 01:00 -> delete
            ("fixed", t("2024-01-14 00:10:00")),
            ("fixed", t("2024-01-14 00:20:00")),
            ("fixed", t("2024-01-14 02:00:00")),
        ],
        "key string, ts timestamp",
    )
    out = {r.key: r for r in M.apply_access_log(state, log).collect()}
    assert sorted(out) == ["chain", "quiet"]  # gapped + fixed deleted
    chain = out["chain"]
    assert chain.access_count == 13  # 10 + 3 live touches (pre-creation ignored)
    assert chain.last_accessed_at == t("2024-01-14 01:04:00")
    assert chain.expires_at == t("2024-01-14 01:14:00")  # last live + ttl
    quiet = out["quiet"]
    assert quiet.access_count == 10 and quiet.expires_at == t("2024-01-16 00:00:00")
