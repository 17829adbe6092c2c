from meresco_lucene_spark.streaming.ingest import IngestSink, stream_ingest

__all__ = ["IngestSink", "stream_ingest"]
