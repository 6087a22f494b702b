"""Embedding providers (SURVEY.md §2.11) as Arrow-batched mapInPandas
transforms — the Spark re-expression of the reference's pluggable provider
ABC (rag/embeddings/base.py:12-56; selection manager.py:26-29).

Providers:
- hash_embedder: deterministic md5-seeded vectors — the test/CI provider,
  mirroring the reference's own integration-test pattern
  (tests/integration/test_rag_integration.py:38-46). Pure function of the
  text, so embeddings are reproducible across runs and engines.
- api_embedder: OpenAI-compatible POST /v1/embeddings per Arrow batch with
  retry/backoff (the reference batches + retries too: rag/embeddings/
  api.py:89-118, utils/async_utils.py:38-56). Network calls are gated — the
  transform builds lazily and never fires in tests.
- local_embedder: sentence-transformers model per executor
  (reference rag/embeddings/local.py:86-97). The library is imported lazily
  INSIDE the partition function — the container lacks it, so the plan builds
  everywhere, execution needs the optional dependency (loader injectable for
  offline tests).

Empty-text guard (F8, reference rag/embeddings/base.py:50-56): blank texts
are refused — here they yield NULL vectors, filterable upstream with
`.where(trim(col) != '')`.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..util import _LIGHT_TASK_BYTES, ensure_parallelism


def _hash_vector(text: str, dim: int) -> list[float] | None:
    if not text or not text.strip():
        return None  # F8 empty-text guard
    raw: list[float] = []
    seed = text.encode("utf-8")
    while len(raw) < dim:
        seed = hashlib.md5(seed).digest()
        raw.extend((b - 127.5) / 127.5 for b in seed)
    v = raw[:dim]
    norm = math.sqrt(sum(x * x for x in v))
    return [float(x / norm) for x in v] if norm else [0.0] * dim


def _embed_schema(id_field: T.StructField) -> T.StructType:
    return T.StructType(
        [id_field, T.StructField("embedding", T.ArrayType(T.FloatType()), True)]
    )


def hash_embedder(
    docs: DataFrame, *, id_col: str = "doc_id", content_col: str = "text", dim: int = 64
) -> DataFrame:
    """Deterministic embedding provider: (id, embedding array<float>)."""
    id_field = next(f for f in docs.schema.fields if f.name == id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "embedding": [_hash_vector(t, dim) for t in pdf[content_col]],
                }
            )

    # light per-row transform: fan-out follows input BYTES, core-capped
    # (r16, guide §2 — a 600 KB scan fanned to 32 Arrow tasks paid more in
    # per-task setup than the hashing; driver core-ratio 0.31)
    return ensure_parallelism(docs, per_task_bytes=_LIGHT_TASK_BYTES).mapInPandas(
        run, schema=_embed_schema(id_field)
    )


def api_embedder(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    content_col: str = "text",
    endpoint: str = "http://localhost:8000/v1/embeddings",
    model: str = "text-embedding-3-small",
    dim: int = 1536,
    api_key_env: str = "EMBEDDING_API_KEY",
    max_retries: int = 3,
    backoff_seconds: float = 1.0,
    transport=None,
) -> DataFrame:
    """HTTP embedding provider: one POST per Arrow batch, retry w/ backoff.

    Each partition opens its own session; batching rides on Arrow batch size
    (spark.sql.execution.arrow.maxRecordsPerBatch), the same knob that bounds
    request payloads. Requires network + urllib only (stdlib).

    ``transport`` is an urlopen-compatible callable (pickled to executors),
    defaulting to urllib.request.urlopen — the injection seam that lets tests
    exercise batch/retry/empty-guard behavior offline.
    """
    id_field = next(f for f in docs.schema.fields if f.name == id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import json
        import os
        import time
        import urllib.request

        key = os.environ.get(api_key_env, "")
        opener = transport if transport is not None else urllib.request.urlopen

        def post(texts: list[str]) -> list[list[float]]:
            body = json.dumps({"model": model, "input": texts}).encode()
            req = urllib.request.Request(
                endpoint,
                data=body,
                headers={"Content-Type": "application/json", "Authorization": f"Bearer {key}"},
            )
            last_err: Exception | None = None
            for attempt in range(max_retries):
                try:
                    with opener(req, timeout=60) as resp:
                        payload = json.loads(resp.read())
                    return [d["embedding"] for d in payload["data"]]
                except Exception as e:  # noqa: BLE001 — retry any transport error
                    last_err = e
                    time.sleep(backoff_seconds * (2**attempt))
            raise RuntimeError(f"embedding API failed after {max_retries} retries: {last_err}")

        for pdf in batches:
            texts = list(pdf[content_col])
            nonempty = [t for t in texts if t and t.strip()]
            vecs = iter(post(nonempty)) if nonempty else iter(())
            out = [next(vecs) if (t and t.strip()) else None for t in texts]
            yield pd.DataFrame({id_col: pdf[id_col], "embedding": out})

    return docs.mapInPandas(run, schema=_embed_schema(id_field))


def local_embedder(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    content_col: str = "text",
    model_name: str = "all-MiniLM-L6-v2",
    batch_size: int = 32,
    loader=None,
) -> DataFrame:
    """Local sentence-transformers provider (reference rag/embeddings/
    local.py:86-97: SentenceTransformer(model).encode(texts) off-thread).

    Spark shape: one model instance PER EXECUTOR PYTHON WORKER, loaded
    lazily inside mapInPandas on first batch and reused for every later
    batch of that worker (the reference's single resident model, times the
    cluster's workers). Arrow batches are re-chunked to ``batch_size`` for
    the encode call, matching the reference's LOCAL_EMBEDDING_BATCH_SIZE.

    ``loader`` is an injectable ``model_name -> model`` factory (pickled to
    executors); the default imports sentence_transformers lazily so the plan
    builds without the optional dependency — execution raises ImportError
    with install guidance only when a partition actually runs.
    """
    id_field = next(f for f in docs.schema.fields if f.name == id_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = None

        def get_model():
            nonlocal model
            if model is None:
                if loader is not None:
                    model = loader(model_name)
                else:
                    try:
                        from sentence_transformers import SentenceTransformer
                    except ImportError as e:  # optional dependency
                        raise ImportError(
                            "local_embedder needs the optional sentence-transformers "
                            "package on executors (pip install sentence-transformers)"
                        ) from e
                    model = SentenceTransformer(model_name)
            return model

        for pdf in batches:
            texts = list(pdf[content_col])
            nonempty = [t for t in texts if t and t.strip()]
            vecs: list[list[float]] = []
            for i in range(0, len(nonempty), batch_size):
                encoded = get_model().encode(nonempty[i : i + batch_size])
                vecs.extend([list(map(float, v)) for v in encoded])
            it = iter(vecs)
            out = [next(it) if (t and t.strip()) else None for t in texts]
            yield pd.DataFrame({id_col: pdf[id_col], "embedding": out})

    return ensure_parallelism(docs).mapInPandas(run, schema=_embed_schema(id_field))
