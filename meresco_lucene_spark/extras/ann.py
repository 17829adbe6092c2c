"""Similarity search over embedding columns (array<float>).

Two paths:
  cosine_topk       — exact brute-force cosine top-k, pure column
                      expressions (F.zip_with + F.aggregate stay in the
                      JVM; no Python in the scan)
  lsh_cosine_topk   — random-hyperplane LSH bucketing: a seeded,
                      deterministic set of hyperplanes signs each vector
                      into a bucket; the query probes its own bucket plus
                      single-bit-flip neighbors (multi-probe). At corpus
                      scale the bucket column is a partition/cluster key,
                      so a probe touches a fraction of the data.

The exact path is the correctness oracle for the approximate one
(recall measured in tests).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine_expr(vec_col: Column, query: list[float]) -> Column:
    q = F.array(*[F.lit(float(x)) for x in query])
    qn = float(np.sqrt(np.dot(query, query)))
    return _dot(
        F.transform(vec_col, lambda x: x.cast("double")), q
    ) / (_norm(F.transform(vec_col, lambda x: x.cast("double"))) * F.lit(qn))


def cosine_topk(
    df: DataFrame,
    vec_col: str,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: one scan + TakeOrderedAndProject."""
    scored = df.select(
        F.col(id_col), cosine_expr(F.col(vec_col), query).alias("cosine")
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def hyperplanes(dim: int, n_planes: int = 12, seed: int = 11) -> np.ndarray:
    rng = np.random.Generator(np.random.Philox(key=seed))
    return rng.standard_normal((n_planes, dim))


def bucket_expr(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign-bit bucket id under the fixed hyperplanes (JVM-side)."""
    bits = []
    for i, p in enumerate(planes):
        d = _dot(
            F.transform(vec_col, lambda x: x.cast("double")),
            F.array(*[F.lit(float(x)) for x in p]),
        )
        bits.append(F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def lsh_cosine_topk(
    df: DataFrame,
    vec_col: str,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    n_planes: int = 12,
    seed: int = 11,
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket
    and its <=multiprobe-bit-flip neighbor buckets."""
    planes = hyperplanes(len(query), n_planes, seed)
    qbits = 0
    qd = planes @ np.asarray(query, dtype=float)
    for i, v in enumerate(qd):
        if v >= 0:
            qbits |= 1 << i
    probe = {qbits}
    if multiprobe >= 1:
        # flip the bits whose hyperplane margin is smallest first
        order = np.argsort(np.abs(qd))
        for i in order[: max(n_planes // 2, 1)]:
            probe.add(qbits ^ (1 << int(i)))
    bucketed = df.withColumn("_bucket", bucket_expr(F.col(vec_col), planes))
    cand = bucketed.filter(F.col("_bucket").isin([int(x) for x in probe]))
    return cosine_topk(cand, vec_col, query, k, id_col)
