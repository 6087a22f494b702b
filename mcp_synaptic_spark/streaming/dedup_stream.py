"""Streaming exact dedup: emit only the first-seen copy of each document
content as the stream arrives.

The batch pipeline dedups a corpus at rest (`operators/dedup.py`); an
ingestion pipeline wants the same guarantee ON ARRIVAL — a crawler that
re-fetches a page must not enqueue it twice. Structured Streaming's
`dropDuplicates` keeps the seen-key set in managed state, which makes this
a three-line operator — the engineering content is the STATE BOUND:

- With a watermark (`ts_col`), `dropDuplicatesWithinWatermark` lets the
  state store evict hashes older than the lateness horizon — state is
  bounded by (arrival rate × horizon), the production configuration for an
  endless crawl stream.
- Without one, state grows with the number of distinct contents ever seen
  — acceptable for bounded backfills only (this is Spark's documented
  dropDuplicates semantics, not a quirk of this wrapper).

The dedup key is the md5 content digest (same `content_hash` as the batch
exact-dedup path, reference models/rag.py:35-38), so streaming and batch
agree on what "duplicate" means — tested stream-equals-batch in
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..functions.text import content_hash

__all__ = ["streaming_exact_dedup"]


def streaming_exact_dedup(
    docs_stream: DataFrame,
    *,
    content_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """First-seen-wins exact dedup over a streaming documents DataFrame.

    `docs_stream` must be a streaming DataFrame (spark.readStream...). With
    `ts_col` the seen-set is evicted past the watermark horizon (bounded
    state); without, state grows with distinct contents (backfills only).
    """
    ch = "_ch"
    while ch in docs_stream.columns:  # never clobber a caller's column
        ch += "_"
    hashed = docs_stream.withColumn(ch, content_hash(docs_stream[content_col]))
    if ts_col is not None:
        deduped = hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            [ch]
        )
    else:
        deduped = hashed.dropDuplicates([ch])
    return deduped.drop(ch)
