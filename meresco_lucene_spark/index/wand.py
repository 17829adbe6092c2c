"""Block-max WAND top-k over compressed posting blocks — shared by the
single-field segment store (segments.py) and the multi-field persistent
store (store.py).

All functions operate on a BLOCK FRAME: a DataFrame with at least
(term, block_max_score, doc_bytes, tf_bytes, dl_bytes) — the delta+varint
block format of codec.py, where each block carries its own dl stream so
scoring needs no side lookup (no docs-table broadcast at any scale).

The distributed block-max WAND adaptation (docstrings on or_topk):
postings of different terms live in different partitions, so Lucene's
document-at-a-time pointer walk doesn't apply; instead a pooled per-term
WAND pass bounds θ, block-level bounds prune, and survivors are
re-scored exactly. Every path is rank- AND score-identical to exhaustive
scoring (property-tested in tests/test_segments.py and tests/test_store.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meresco_lucene_spark.index.codec import decode_doc_block, varint_decode
from meresco_lucene_spark.query.bm25 import bm25_score_numpy

TOPK_SCHEMA = "doc_id long, score double"


@dataclass(frozen=True)
class WandParams:
    n_docs: int
    avgdl: float
    k1: float
    b: float


def _empty(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], TOPK_SCHEMA)


def decode_blocks(blocks: DataFrame) -> DataFrame:
    """Blocks -> (doc_id, tf) rows (Arrow-batched numpy decode)."""

    def _decode(it):
        for pdf in it:
            for _, row in pdf.iterrows():
                doc_ids, tfs = decode_doc_block(row["doc_bytes"], row["tf_bytes"])
                yield pd.DataFrame(
                    {"doc_id": doc_ids.astype("int64"), "tf": tfs.astype("int64")}
                )

    return blocks.mapInPandas(_decode, schema="doc_id long, tf long")


def scores_for_blocks(
    blocks: DataFrame, dfs: dict[str, int], params: WandParams
) -> DataFrame:
    """Exact (doc_id, score) for every posting in the block frame; the
    per-term df comes from the (broadcast-small) dfs dict."""
    n, avgdl, k1, b = params.n_docs, params.avgdl, params.k1, params.b

    def _score(it):
        for pdf in it:
            for _, row in pdf.iterrows():
                doc_ids, tfs = decode_doc_block(row["doc_bytes"], row["tf_bytes"])
                dls = varint_decode(row["dl_bytes"]).astype(float)
                scores = bm25_score_numpy(
                    tfs.astype(float), float(dfs[row["term"]]), dls, n, avgdl, k1, b
                )
                yield pd.DataFrame(
                    {"doc_id": doc_ids.astype("int64"), "score": scores}
                )

    return blocks.mapInPandas(_score, schema=TOPK_SCHEMA)


def _wand_pool_fn(dfs: dict[str, int], params: WandParams, k: int):
    """Per-term WAND top-k inside one pandas group: blocks visited in
    descending block_max_score order; decoding stops when the bound can't
    beat the running k-th score — rank-identical to exhaustive scoring
    because block_max_score is an exact per-block bound. Also emits the
    term's exact max score (max of block maxes) for the θ phase."""
    n, avgdl, k1, b = params.n_docs, params.avgdl, params.k1, params.b

    def _pool(key, pdf: pd.DataFrame) -> pd.DataFrame:
        term = key[0]
        df_t = float(dfs[term])
        pdf = pdf.sort_values("block_max_score", ascending=False)
        tmax = float(pdf["block_max_score"].iloc[0]) if len(pdf) else 0.0
        best: list[tuple[float, int]] = []
        threshold = -np.inf
        for _, row in pdf.iterrows():
            if len(best) >= k and row["block_max_score"] < threshold:
                break
            doc_ids, tfs = decode_doc_block(row["doc_bytes"], row["tf_bytes"])
            dls = varint_decode(row["dl_bytes"]).astype(float)
            scores = bm25_score_numpy(tfs.astype(float), df_t, dls, n, avgdl, k1, b)
            for s, d in zip(scores, doc_ids):
                best.append((float(s), int(d)))
            best.sort(key=lambda x: (-x[0], x[1]))
            best = best[:k]
            if len(best) >= k:
                threshold = best[-1][0]
        return pd.DataFrame(
            {
                "term": term,
                "doc_id": [d for _, d in best],
                "score": [s for s, _ in best],
                "term_max": tmax,
            }
        )

    return _pool


def term_topk(
    spark: SparkSession,
    blocks: DataFrame,
    df_t: int | None,
    params: WandParams,
    k: int = 10,
) -> DataFrame:
    """Single-term exact BM25 top-k with block-max WAND pruning."""
    if df_t is None:
        return _empty(spark)

    def _one(key, pdf: pd.DataFrame) -> pd.DataFrame:
        out = _wand_pool_fn({key[0]: df_t}, params, k)(key, pdf)
        return out[["doc_id", "score"]]

    grouped = blocks.groupBy("term").applyInPandas(_one, schema=TOPK_SCHEMA)
    return grouped.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)


def or_topk(
    spark: SparkSession,
    blocks: DataFrame,
    dfs: dict[str, int],
    params: WandParams,
    k: int = 10,
) -> DataFrame:
    """Exact disjunctive (SHOULD) BM25 top-k with block-max pruning.

      1. ONE job runs the per-term WAND top-k for all terms at once
         (groupBy(term).applyInPandas) and returns each term's exact max
         score alongside;
      2. θ = k-th largest PER-DOC SUM of the collected single-term
         scores — each collected score is exact and a doc's sum over its
         pool entries lower-bounds its true total, so θ lower-bounds the
         true k-th total (summing per doc both tightens θ and avoids the
         pooled-k-th pitfall when one doc tops several term pools);
      3. a block of term t survives iff block_max + Σ_{u≠t} term_max[u]
         >= θ — any doc whose blocks are all pruned has total < θ, so
         candidates ⊇ the true top-k;
      4. candidates are re-scored EXACTLY over all their postings.

    Job count is O(1) in the number of terms."""
    terms = list(dfs)
    if not terms:
        return _empty(spark)
    pooled = blocks.groupBy("term").applyInPandas(
        _wand_pool_fn(dfs, params, k),
        schema="term string, doc_id long, score double, term_max double",
    ).collect()

    term_max = {t: 0.0 for t in terms}
    per_doc: dict[int, float] = {}
    for r in pooled:
        term_max[r["term"]] = max(term_max[r["term"]], r["term_max"])
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0.0) + r["score"]
    doc_sums = sorted(per_doc.values(), reverse=True)
    theta = doc_sums[k - 1] if len(doc_sums) >= k else -float("inf")
    total_max = sum(term_max.values())

    surv = None
    for t in terms:
        bound_others = total_max - term_max[t]
        c = (F.col("term") == t) & (
            F.col("block_max_score") + F.lit(bound_others) >= F.lit(theta)
        )
        surv = c if surv is None else (surv | c)
    candidates = decode_blocks(blocks.filter(surv)).select("doc_id").distinct()

    scored = scores_for_blocks(blocks, dfs, params).join(
        candidates, "doc_id", "left_semi"
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("score").alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def and_topk(
    spark: SparkSession,
    blocks: DataFrame,
    dfs: dict[str, int],
    params: WandParams,
    k: int = 10,
) -> DataFrame:
    """Exact conjunctive (MUST) BM25 top-k: candidates driven by the
    rarest term's postings (smallest df — the classic leapfrog), the
    other terms semi-join down, score = Σ per-term BM25."""
    terms = list(dfs)
    if not terms:
        return _empty(spark)
    order = sorted(terms, key=lambda t: dfs[t])
    candidates = decode_blocks(blocks.filter(F.col("term") == order[0])).select(
        "doc_id"
    )
    for t in order[1:]:
        candidates = candidates.join(
            decode_blocks(blocks.filter(F.col("term") == t)).select("doc_id"),
            "doc_id",
            "left_semi",
        )
    scored = scores_for_blocks(blocks, dfs, params).join(
        candidates, "doc_id", "left_semi"
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("score").alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
