"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship rag_search at sf0.001 (smoke check).
queries()         — one entry per implemented operator (SURVEY.md §2).
oracle_sql()      — DuckDB twins of every query for the correctness gate.

Column-name contract: every computed column is aliased identically in the
Spark plan and the oracle SQL; floats are rounded to 6 dp (aggregate money
sums to 2 dp) on BOTH sides; ordering ties are broken on unique ids so
limit/top-k selections are deterministic across engines.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mcp_synaptic_spark.functions.ttl import parse_ttl
from mcp_synaptic_spark.functions.vector import cosine_similarity
from mcp_synaptic_spark.operators import memory as M
from mcp_synaptic_spark.operators import rag as R
from mcp_synaptic_spark.sources.tables import load_table
from mcp_synaptic_spark.sources.memories import (
    MEMORIES_CTE_SQL,
    NOW_SQL,
    memories_from_events,
    now_col,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: Q13 rag_search (cosine top-k + threshold + rank) at sf0.001."""
    return _q_rag_search(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# RAG / vector queries (SURVEY §2.9 Q13–Q19, §2.3 J1–J3)
# ---------------------------------------------------------------------------

def _with_query_vec(emb: DataFrame, qid: int) -> DataFrame:
    """Attach the query vector (row qid) to every row via a 1-row broadcast
    cross join — no driver-side collect; the vector rides with the plan."""
    qrow = emb.where(F.col("vec_id") == qid).select(F.col("embedding").alias("qv"))
    return emb.crossJoin(F.broadcast(qrow))


def _q_rag_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    res = R.rag_search(
        _with_query_vec(emb, 0), F.col("qv"), id_col="vec_id", threshold=0.0, limit=10
    )
    return res.select("vec_id", "distance", "score", "rank")


def _q_rag_search_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    docs = _t(spark, sf_dir, "documents")
    res = R.rag_search(
        _with_query_vec(emb, 0),
        F.col("qv"),
        documents=docs,
        id_col="vec_id",
        doc_id_col="doc_id",
        threshold=0.0,
        limit=10,
        metadata_predicate=F.col("lang") == "en",
    )
    return res.select("vec_id", "lang", "score", "rank")


def _q_find_similar(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    res = R.find_similar(emb, 1, id_col="vec_id", threshold=0.0, limit=10)
    return res.select("vec_id", "score", "rank")


def _q_pairwise_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return R.pairwise_similarity(emb, 1, 2, id_col="vec_id")


def _q_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return R.batch_topk_join(queries, emb, k=3, id_col="vec_id")


def _q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return R.knn_classify(queries, emb, k=5, id_col="vec_id")


_COS_SQL = (
    "CASE WHEN sqrt(list_dot_product({a}, {a})) = 0 OR sqrt(list_dot_product({b}, {b})) = 0 "
    "THEN 0.0 ELSE list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))) END"
)


def _cos(a: str, b: str) -> str:
    return _COS_SQL.format(a=a, b=b)


_ORACLE_RAG_SEARCH = f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id,
         round(1.0 - ({_cos('e.embedding::DOUBLE[]', 'q.qv')}), 6) AS distance,
         round(greatest(0.0, least(1.0, {_cos('e.embedding::DOUBLE[]', 'q.qv')})), 6) AS score
  FROM embeddings e, q
),
topk AS (
  SELECT * FROM scored WHERE score >= 0.0
  ORDER BY round(score, 9) DESC, vec_id ASC LIMIT 10
)
SELECT vec_id, distance, score,
       CAST(row_number() OVER (ORDER BY round(score, 9) DESC, vec_id ASC) AS INT) AS rank
FROM topk
"""

_ORACLE_RAG_SEARCH_FILTERED = f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT e.vec_id, d.lang,
         round(greatest(0.0, least(1.0, {_cos('e.embedding::DOUBLE[]', 'q.qv')})), 6) AS score
  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id, q
  WHERE d.lang = 'en'
),
topk AS (
  SELECT * FROM scored WHERE score >= 0.0
  ORDER BY round(score, 9) DESC, vec_id ASC LIMIT 10
)
SELECT vec_id, lang, score,
       CAST(row_number() OVER (ORDER BY round(score, 9) DESC, vec_id ASC) AS INT) AS rank
FROM topk
"""

_ORACLE_FIND_SIMILAR = f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 1),
scored AS (
  SELECT e.vec_id,
         round(greatest(0.0, least(1.0, {_cos('e.embedding::DOUBLE[]', 'q.qv')})), 6) AS score
  FROM embeddings e, q WHERE e.vec_id != 1
),
topk AS (
  SELECT * FROM scored WHERE score >= 0.0
  ORDER BY round(score, 9) DESC, vec_id ASC LIMIT 10
)
SELECT vec_id, score,
       CAST(row_number() OVER (ORDER BY round(score, 9) DESC, vec_id ASC) AS INT) AS rank
FROM topk
"""

_ORACLE_PAIRWISE = f"""
SELECT '1' AS id_a, '2' AS id_b,
       round({_cos('a.embedding::DOUBLE[]', 'b.embedding::DOUBLE[]')}, 6) AS similarity
FROM (SELECT embedding FROM embeddings WHERE vec_id = 1) a,
     (SELECT embedding FROM embeddings WHERE vec_id = 2) b
"""

_ORACLE_BATCH_TOPK = f"""
WITH queries AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id % 100 = 0),
scored AS (
  SELECT q.qid, e.vec_id,
         round(greatest(0.0, least(1.0, {_cos('e.embedding::DOUBLE[]', 'q.qvec')})), 6) AS score
  FROM embeddings e, queries q
),
ranked AS (
  SELECT qid, vec_id, score,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY round(score, 9) DESC, vec_id ASC) AS INT) AS rank
  FROM scored
)
SELECT * FROM ranked WHERE rank <= 3
"""

_ORACLE_KNN = f"""
WITH queries AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id % 100 = 0),
scored AS (
  SELECT q.qid, e.vec_id, e.label,
         round(greatest(0.0, least(1.0, {_cos('e.embedding::DOUBLE[]', 'q.qvec')})), 6) AS score
  FROM embeddings e, queries q
),
nn AS (
  SELECT * FROM (
    SELECT qid, vec_id, label, score,
           row_number() OVER (PARTITION BY qid ORDER BY round(score, 9) DESC, vec_id ASC) AS rn
    FROM scored) WHERE rn <= 5
),
votes AS (SELECT qid, label, count(*) AS votes FROM nn GROUP BY qid, label)
SELECT qid, label AS predicted_label, votes FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY votes DESC, label ASC) AS rn FROM votes
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# memory-engine queries (SURVEY §2.9 Q1–Q8) over the derived memories state
# ---------------------------------------------------------------------------

def _memories(spark: SparkSession, sf_dir: str) -> DataFrame:
    return memories_from_events(_t(spark, sf_dir, "events"))


_MEM_COLS = [
    "key", "memory_type", "expiration_policy", "created_at",
    "ttl_seconds", "access_count", "expires_at",
]


def _q_memory_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = M.memory_list(
        _memories(spark, sf_dir),
        now_col(),
        memory_types=["short_term", "long_term"],
        limit=20,
        offset=5,
    )
    return res.select(*_MEM_COLS)


def _q_memory_list_expired(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = M.memory_list(_memories(spark, sf_dir), now_col(), include_expired=True, limit=15, offset=0)
    return res.select(*_MEM_COLS)


def _q_memory_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.memory_stats(_memories(spark, sf_dir), now_col())


def _q_memory_stats_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.memory_stats_by_type(_memories(spark, sf_dir))


def _q_cleanup_expired_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.expired_count(_memories(spark, sf_dir), now_col())


def _q_memories_live_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    live = M.memories_live(_memories(spark, sf_dir), now_col())
    return live.groupBy("memory_type").agg(F.count("*").alias("live_cnt"))


def _q_parse_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 — parse_ttl over deterministic TTL strings built from event ids."""
    ev = _t(spark, sf_dir, "events")
    unit = (
        F.when(F.col("event_id") % 5 == 0, "s")
        .when(F.col("event_id") % 5 == 1, "m")
        .when(F.col("event_id") % 5 == 2, "h")
        .when(F.col("event_id") % 5 == 3, "d")
        .otherwise("")
    )
    ttl_str = F.concat((F.col("event_id") % 90).cast("string"), unit)
    return ev.select(
        F.col("event_id"), ttl_str.alias("ttl_str"), parse_ttl(ttl_str).alias("ttl_seconds")
    ).where(F.col("event_id") < 500)


_MEM_SELECT = ", ".join(_MEM_COLS)

_ORACLE_MEMORY_LIST = f"""
WITH {MEMORIES_CTE_SQL.strip()}
SELECT {_MEM_SELECT} FROM memories_derived
WHERE memory_type IN ('short_term', 'long_term')
  AND (expires_at IS NULL OR expires_at > {NOW_SQL})
ORDER BY created_at ASC, key ASC LIMIT 20 OFFSET 5
"""

_ORACLE_MEMORY_LIST_EXPIRED = f"""
WITH {MEMORIES_CTE_SQL.strip()}
SELECT {_MEM_SELECT} FROM memories_derived
ORDER BY created_at ASC, key ASC LIMIT 15
"""

_ORACLE_MEMORY_STATS = f"""
WITH {MEMORIES_CTE_SQL.strip()}
SELECT
  count(*) AS total_memories,
  sum(CASE WHEN expires_at IS NOT NULL AND {NOW_SQL} >= expires_at THEN 1 ELSE 0 END) AS expired_memories,
  round(avg(ttl_seconds), 6) AS avg_ttl_seconds,
  min(created_at) AS oldest_memory,
  max(created_at) AS newest_memory,
  max(access_count) AS max_access_count,
  sum(strlen(data)) AS total_size_bytes
FROM memories_derived
"""

_ORACLE_MEMORY_STATS_BY_TYPE = f"""
WITH {MEMORIES_CTE_SQL.strip()}
SELECT memory_type, count(*) AS cnt FROM memories_derived GROUP BY memory_type
"""

_ORACLE_CLEANUP_EXPIRED = f"""
WITH {MEMORIES_CTE_SQL.strip()}
SELECT sum(CASE WHEN expires_at IS NOT NULL AND expires_at <= {NOW_SQL} THEN 1 ELSE 0 END) AS expired_count
FROM memories_derived
"""

_ORACLE_MEMORIES_LIVE = f"""
WITH {MEMORIES_CTE_SQL.strip()}
SELECT memory_type, count(*) AS live_cnt FROM memories_derived
WHERE expires_at IS NULL OR expires_at > {NOW_SQL}
GROUP BY memory_type
"""

_ORACLE_PARSE_TTL = """
WITH t AS (
  SELECT event_id,
    CAST(event_id % 90 AS VARCHAR) ||
    CASE WHEN event_id % 5 = 0 THEN 's'
         WHEN event_id % 5 = 1 THEN 'm'
         WHEN event_id % 5 = 2 THEN 'h'
         WHEN event_id % 5 = 3 THEN 'd'
         ELSE '' END AS ttl_str
  FROM events WHERE event_id < 500
)
SELECT event_id, ttl_str,
  CASE WHEN regexp_extract(ttl_str, '^(\\d+)\\s*([smhdw]?)$', 1) = '' THEN NULL
       ELSE CAST(regexp_extract(ttl_str, '^(\\d+)\\s*([smhdw]?)$', 1) AS BIGINT) *
            CASE regexp_extract(ttl_str, '^(\\d+)\\s*([smhdw]?)$', 2)
              WHEN 's' THEN 1 WHEN 'm' THEN 60 WHEN 'h' THEN 3600
              WHEN 'd' THEN 86400 WHEN 'w' THEN 604800 ELSE 1 END
  END AS ttl_seconds
FROM t
"""


# ---------------------------------------------------------------------------
# document stats (Q14) — A1/A4/A5/A6/A7 in one pass
# ---------------------------------------------------------------------------

def _q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    words = F.when(F.trim(F.col("text")) == "", 0).otherwise(
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
    )
    return docs.agg(
        F.count("*").alias("total_documents"),
        F.sum(F.length("text")).alias("total_content_length"),
        F.sum(words).alias("total_words"),
        F.round(F.avg(F.length("text")), 6).alias("avg_content_length"),
        F.countDistinct("lang").alias("distinct_langs"),
        F.countDistinct("source").alias("distinct_sources"),
    )


_ORACLE_DOC_STATS = """
SELECT
  count(*) AS total_documents,
  sum(length(text)) AS total_content_length,
  sum(CASE WHEN trim(text) = '' THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END) AS total_words,
  round(avg(length(text)), 6) AS avg_content_length,
  count(DISTINCT lang) AS distinct_langs,
  count(DISTINCT source) AS distinct_sources
FROM documents
"""


# ---------------------------------------------------------------------------
# relational suite (generic operators over the TPC-H-ish star schema)
# ---------------------------------------------------------------------------

def _q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: multi-aggregate groupBy with computed measures —
    exercises map-side partial aggregation (A1–A6 analogues)."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.to_timestamp(F.lit("2024-06-01 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


_ORACLE_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
  round(sum(l_quantity), 2) AS sum_qty,
  round(sum(l_extendedprice), 2) AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
  round(avg(l_quantity), 6) AS avg_qty,
  round(avg(l_extendedprice), 6) AS avg_price,
  round(avg(l_discount), 6) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2024-06-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def _q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + top-k — the small dims broadcast."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


_ORACLE_TPCH_Q3 = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
"""


def _q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way snowflake join — dims broadcast, facts co-shuffle."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
    )


_ORACLE_TPCH_Q5 = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name
"""


def _q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregate over the events table (batch twin of the
    streaming slice §2.10): 1-hour windows per event_type."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window(F.col("ts"), "1 hour").getField("start").alias("window_start"),
            F.col("event_type"),
        )
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
    )


_ORACLE_EVENTS_HOURLY = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2
"""


def _q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X19 — JSON payload surface: extract props.k, aggregate per bucket."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.select(k.alias("k"), F.col("value"))
        .groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 6).alias("avg_value"))
    )


_ORACLE_EVENTS_JSON = """
SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
       count(*) AS n, round(avg(value), 6) AS avg_value
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # RAG / vector (Q13, Q16, Q19, J1–J3, batch kNN)
        "rag_search": _q_rag_search,
        "rag_search_filtered": _q_rag_search_filtered,
        "find_similar": _q_find_similar,
        "pairwise_similarity": _q_pairwise_similarity,
        "batch_topk": _q_batch_topk,
        "knn_classify": _q_knn_classify,
        # memory engine (Q5–Q7, F1–F4, X1, X9–X11, A1–A3, A9)
        "memory_list": _q_memory_list,
        "memory_list_expired": _q_memory_list_expired,
        "memory_stats": _q_memory_stats,
        "memory_stats_by_type": _q_memory_stats_by_type,
        "cleanup_expired_count": _q_cleanup_expired_count,
        "memories_live_count": _q_memories_live_count,
        "parse_ttl": _q_parse_ttl,
        # document stats (Q14, A4–A8, X12)
        "doc_stats": _q_doc_stats,
        # relational suite (joins, multi-agg, top-k, windows, JSON)
        "tpch_q1": _q_tpch_q1,
        "tpch_q3": _q_tpch_q3,
        "tpch_q5": _q_tpch_q5,
        "events_hourly": _q_events_hourly,
        "events_json": _q_events_json,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "rag_search": _ORACLE_RAG_SEARCH,
        "rag_search_filtered": _ORACLE_RAG_SEARCH_FILTERED,
        "find_similar": _ORACLE_FIND_SIMILAR,
        "pairwise_similarity": _ORACLE_PAIRWISE,
        "batch_topk": _ORACLE_BATCH_TOPK,
        "knn_classify": _ORACLE_KNN,
        "memory_list": _ORACLE_MEMORY_LIST,
        "memory_list_expired": _ORACLE_MEMORY_LIST_EXPIRED,
        "memory_stats": _ORACLE_MEMORY_STATS,
        "memory_stats_by_type": _ORACLE_MEMORY_STATS_BY_TYPE,
        "cleanup_expired_count": _ORACLE_CLEANUP_EXPIRED,
        "memories_live_count": _ORACLE_MEMORIES_LIVE,
        "parse_ttl": _ORACLE_PARSE_TTL,
        "doc_stats": _ORACLE_DOC_STATS,
        "tpch_q1": _ORACLE_TPCH_Q1,
        "tpch_q3": _ORACLE_TPCH_Q3,
        "tpch_q5": _ORACLE_TPCH_Q5,
        "events_hourly": _ORACLE_EVENTS_HOURLY,
        "events_json": _ORACLE_EVENTS_JSON,
    }
