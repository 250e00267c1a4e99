"""oraaud_kafka_spark — a PySpark-native analytics engine with the
capabilities of averemee-si/oraaud-kafka (reference at /root/reference),
re-expressed Spark-first.

Layers
------
- ``sources``/``streaming``: the reference's ingest pipeline (Oracle audit
  XML directory -> Kafka/Kinesis) as Structured Streaming
  (reference: OraaudKafka.java, KafkaJob.java, KinesisJob.java).
- ``queries``: the analytic operator surface (SURVEY.md §2.2), declarative
  DataFrame/SQL so Catalyst picks physical plans.
- ``llm``: large-scale training-data pipeline operators (dedup, similarity
  search, text analysis, multimodal column plumbing).
- ``functions``: scalar helpers (gzip codec parity with GzipUtil.java).
"""

__version__ = "0.1.0"
