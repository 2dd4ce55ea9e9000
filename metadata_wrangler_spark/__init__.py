"""metadata_wrangler_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of NYPL-Simplified/metadata_wrangler (a library-metadata
ETL/enrichment pipeline) as an idiomatic Spark DataFrame engine, plus
the large-scale training-data-pipeline operators (dedup, similarity
search, multimodal plumbing, text analysis) such an engine needs at
100 TB scale.

Layout:
    session     SparkSession factory tuned for the target cluster
    catalog     table loaders / view registration for the test data
    functions   scalar function library (SURVEY.md §2.8 F1-F15)
    operators   engine library algorithms (closure, merge, queue,
                dedup, similarity, text stats)
    plans       named query definitions — the SURVEY.md §2.11 oracle
                obligations, each paired with ANSI-SQL for DuckDB
    sources     parsers and cached-fetch source patterns (§2.1)
    streaming   incremental / Structured Streaming mappings (§2.9)
"""

__version__ = "0.1.0"
