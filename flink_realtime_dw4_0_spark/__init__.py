"""flink_realtime_dw4_0_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference Flink real-time data warehouse (zoudexiang/flink-realtime-dw4.0),
re-expressed Spark-first: DataFrame/SQL + Catalyst for batch semantics,
Structured Streaming for the streaming pipelines, and a library of
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing) on top.

Layout:
    session.py    SparkSession factory (env parity with BaseAPP/BaseSQLAPP)
    schemas.py    explicit StructTypes: CDC envelopes, log events, dims
    sources/      Kafka / CDC-envelope / file sources          (SURVEY §2.1)
    sinks/        Kafka append, upsert emulation, dim MERGE    (SURVEY §2.2)
    operators/    projections, joins, windows, state, dedup…   (SURVEY §2.3-2.7)
    functions/    scalar function surface                      (SURVEY §2.8)
    plans/        query catalog powering __spark_entry__.py
    streaming/    the DIM / DWD / DWS pipeline equivalents     (SURVEY §3)
"""

__version__ = "0.1.0"
