from meresco_lucene_spark.query.ir import Q
from meresco_lucene_spark.query.executor import LuceneResponse, search

__all__ = ["Q", "LuceneResponse", "search"]
