from meresco_lucene_spark.index.builder import InvertedIndex
from meresco_lucene_spark.index import codec

__all__ = ["InvertedIndex", "codec"]
