from kafka_connect_bigquery_storage_write_spark.streaming.pipeline import IngestPipeline, kafka_shaped

__all__ = ["IngestPipeline", "kafka_shaped"]
