"""pandemic_knowledge_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference pipeline flavienbwk/Pandemic-Knowledge (multi-source ingest →
conform → store → query/search/aggregate), re-expressed Spark-first:
DataFrame/SQL plans over Parquet, Structured Streaming for continuous
ingestion, and the large-scale training-data operators (dedup, similarity
search, text analysis, multimodal plumbing) a 100 TB pipeline needs.

Layout:
  session    — tuned SparkSession builder (AQE, broadcast thresholds, UTC)
  tables     — parquet table loaders / catalog registration
  conform    — per-row conform operators (SURVEY.md §2.3-§2.4: P1-P13, F1-F4)
  operators  — joins / aggregates / windows / set ops / dedup / similarity
  functions  — column-expression library (text, vectors, hashing, geo)
  sources    — ingest frontends (CSV dialect sniff, HTTP, crawlers, multimodal)
  plans      — the named query catalog exposed through __spark_entry__
  streaming  — Structured Streaming jobs (W1-W4: micro-batch, dedup, atomic swap)
"""

__version__ = "0.1.0"
