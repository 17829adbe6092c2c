from meresco_lucene_spark.compose.composedquery import ComposedQuery, execute_composed
from meresco_lucene_spark.compose.relational import RQ

__all__ = ["ComposedQuery", "execute_composed", "RQ"]
