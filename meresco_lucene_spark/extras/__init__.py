from meresco_lucene_spark.extras import ann, dedup, textstats, multimodal

__all__ = ["ann", "dedup", "textstats", "multimodal"]
