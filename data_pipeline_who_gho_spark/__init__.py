"""data_pipeline_who_gho_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
``gedeoni/data-pipeline-who-gho`` (a pandas/Pydantic/Postgres batch ETL
pipeline) as an idiomatic Spark DataFrame / Spark SQL engine, and extends
it with the large-scale training-data operators (dedup, similarity search,
text analysis, multimodal plumbing) required at 100 TB scale.

Layout
------
- ``session``    : SparkSession factory (AQE, Arrow, sane shuffle defaults)
- ``schemas``    : explicit StructTypes for API entities + warehouse tables
- ``sources``    : table catalog, paged HTTP-style source, etl_state store
- ``operators``  : transform / validate / load(upsert) / quality / dedup /
                   similarity / multimodal
- ``functions``  : text analytics + vector math column expressions
- ``plans``      : the analytics-SQL query surface (SURVEY §2b + TPC-H-ish)
- ``streaming``  : Structured Streaming incremental-load path
- ``pipeline``   : EP2-shaped end-to-end batch driver
"""

__version__ = "0.1.0"
