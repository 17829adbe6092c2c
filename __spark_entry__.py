"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      -> flagship query (BM25 term top-10) on sf0.001.
queries()         -> operator name -> (spark, sf_dir) -> DataFrame.
oracle_sql()      -> operator name -> DuckDB ANSI-SQL equivalent.

Implementation lives in meresco_lucene_spark/; see SURVEY.md §2 for the
operator inventory each key maps to.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from meresco_lucene_spark import entry_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: build the inverted index over sf0.001 documents and
    run a BM25 top-10 TermQuery."""
    return entry_queries.q_term_bm25_top10(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(entry_queries.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(entry_queries.ORACLES)
