"""Canonical schemas (SURVEY.md §1.3).

The fixed StructType envelope mirrors the reference's Pydantic models
(reference models/memory.py:29-120, models/rag.py:18-48); schemaless JSON
payloads stay as JSON-string columns queried with get_json_object/from_json.
"""

from __future__ import annotations

from pyspark.sql import types as T

# reference memory/storage/sqlite.py:46-62 — one row per memory key
MEMORY_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("key", T.StringType(), False),  # logical PK
        T.StructField("data", T.StringType(), True),  # JSON payload (≤1 MB)
        T.StructField("memory_type", T.StringType(), False),
        T.StructField("expiration_policy", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("updated_at", T.TimestampType(), False),
        T.StructField("last_accessed_at", T.TimestampType(), True),
        T.StructField("expires_at", T.TimestampType(), True),  # NULL = never
        T.StructField("ttl_seconds", T.IntegerType(), True),
        T.StructField("access_count", T.IntegerType(), False),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("metadata", T.StringType(), True),  # JSON payload
    ]
)

# reference models/memory.py:12-18 / :21-27
MEMORY_TYPES = ("ephemeral", "short_term", "long_term", "permanent")
EXPIRATION_POLICIES = ("absolute", "sliding", "never")

# reference memory/manager/operations.py:154-163 — default TTL by type
DEFAULT_TTL_BY_TYPE = {
    "ephemeral": 300,
    "short_term": 3600,
    "long_term": 604800,
    "permanent": 0,  # 0 ⇒ permanent (models/memory.py:96-102)
}

# reference models/rag.py:18-48
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("content", T.StringType(), False),
        T.StructField("metadata", T.StringType(), True),  # JSON (≤64 KB)
        T.StructField("embedding_model", T.StringType(), True),
        T.StructField("embedding_dimension", T.IntegerType(), True),
        T.StructField("content_hash", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField("updated_at", T.TimestampType(), False),
    ]
)

# reference rag/database/documents.py:44-57 — vector co-stored per doc
EMBEDDING_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
    ]
)

# search-result envelope (reference models/rag.py:74-88, models/base.py:118-131)
SEARCH_RESULT_COLUMNS = ("id", "content", "score", "rank", "distance")

# knobs (reference config/settings.py:66-71)
MAX_RAG_RESULTS = 10
DEFAULT_SIMILARITY_THRESHOLD = 0.7
