"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference pipeline (Amoako419/Real-Time_Trip_Processing).

Brand-new Spark-first design — DataFrame/SQL + Catalyst for batch,
Structured Streaming for the real-time path. See SURVEY.md for the
capability blueprint and the reference-file citations in each module.

Layout:
    session.py    SparkSession factory tuned for local[N] + cluster scale
    schemas.py    explicit StructTypes (the engine's public data contract)
    sources/      batch + streaming sources and sinks (SURVEY §2.1)
    operators/    cleaning, dedup, joins, aggregates, sorts, sets (§2.2-2.8)
    functions/    scalar helpers, text analysis, vector similarity (§2.9, §2.12)
    plans/        declared-query registry (queries + DuckDB oracle SQL)
    streaming/    watermarked matcher, windowed KPIs, report sink (§2.10)
    pipeline.py   composed end-to-end jobs (ingest → match → daily report)
"""

__version__ = "0.1.0"
