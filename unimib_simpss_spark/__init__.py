"""unimib_simpss_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference SIMPSS pipeline (PCampi/unimib-simpss: MQTT→Kafka→Cassandra sensor
telemetry, see SURVEY.md), re-expressed Spark-first:

- batch relational core on DataFrames (scan/filter/project/join/agg/window),
- a faithful sensor ingest pipeline (parse → enrich → broadcast dim join →
  strict rename → keyed PK-dedup sink),
- Structured Streaming for the live path (Kafka source/sink, event-time
  windows, watermarks, stateful dedup),
- LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal plumbing) designed for 100 TB scale.

Everything is declarative DataFrame/SQL so Catalyst/Tungsten pick the
physical strategy; Python UDFs are avoided in hot paths.
"""

__version__ = "0.1.0"
