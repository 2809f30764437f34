"""spotify_etl_aws_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference ELT pipeline ``danielmschaves/spotify-etl-aws``
(a DuckDB-backed medallion lake: raw JSON -> bronze/silver Parquet -> dbt
gold star schema), generalized to the full idiomatic DataFrame surface and
extended with large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns).

Design (see SURVEY.md §7): a small library, not a framework —
- ``session``      SparkSession factory tuned for the target cluster shape
- ``schemas``      explicit StructType schemas (domain + testdata)
- ``sources``      readers/sinks (Parquet, multiline JSON, catalog tables)
- ``functions``    expression helpers (lenient casts, date padding, text
                   stats, vector math) — all built on pyspark.sql.functions,
                   JVM-side, codegen-friendly
- ``operators``    pure DataFrame -> DataFrame transforms, one module per
                   operator family from SURVEY.md §2
- ``plans``        the medallion pipeline runner (dbt-DAG -> function
                   composition)
- ``streaming``    Structured Streaming equivalents (Trigger.AvailableNow
                   incremental batch, watermarked windows, stateful dedup)

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo at /root/reference.
"""

__version__ = "0.1.0"
