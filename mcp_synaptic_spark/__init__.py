"""mcp_synaptic_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference MCP server (jvanmelckebeke/
mcp-synaptic), re-expressed Spark-first for 100 TB scale.

The reference is an online MCP server (memory store + RAG vector search); this
engine reproduces its operator semantics (SURVEY.md §2) as declarative
DataFrame plans that Catalyst can optimize: predicate pushdown to parquet,
broadcast joins for query vectors, map-side partial aggregation, AQE skew
handling. No row-at-a-time Python in any hot path.

Layout:
  session      SparkSession builder tuned for the workload
  schemas      canonical StructTypes (memories / documents / embeddings)
  sources      table loaders over the driver's parquet testdata
  functions    pure column-expression libraries (ttl, text, vector, json)
  operators    compound operators = the reference's tool surface (SURVEY §2.9)
               plus LLM-data-pipeline extensions (dedup, similarity, analysis)
  streaming    Structured Streaming slice (expiry sweep, windowed aggs)
  plans        plan-inspection helpers (assert pushdown / broadcast / codegen)
"""

__version__ = "0.1.0"
