"""Compressed, term-sharded on-disk segment store with lineage + resume.

This is the scale path of the engine (BASELINE.json north rule): the
DataFrame index (builder.py) materialized as delta+varint-compressed
posting blocks, partitioned by a salted term shard, with per-partition
lineage rows so a killed build resumes mid-merge and produces
byte-identical output.

Layout under ``out_dir``:
  docs/        (doc_id, dl, norm_dl)                       parquet
  term_stats/  (term, df, cf, base_shard, n_salts, max_score)
  postings/    partitioned by shard:
               (term, block_id, doc_count, min_doc, max_doc,
                block_max_score, doc_bytes, tf_bytes)
  lineage/     (shard, n_terms, n_blocks, n_postings, bytes,
                content_sha256, run_id)
  meta.json    {n_docs, sum_dl, avgdl, n_shards, salt_buckets, k1, b,
                block_size, hot_df_fraction}

Sharding & skew (SURVEY.md §7.3): ``base_shard = hash(term) % n_shards``.
A term whose df exceeds ``hot_df_fraction * N`` is *salted*: its postings
spread over ``salt_buckets`` consecutive shards
(``(base_shard + doc_id % n_salts) % n_shards``), so no single shard
swallows a whole hot posting list ('import'/'return' hit nearly every
source file). Queries fan back in by reading the n_salts shards recorded
in term_stats. The hash is a pure-Python/numpy FNV-1a so driver, build
and query sides agree without a JVM round-trip.

Resume: each fully-written shard appends a lineage row whose
content_sha256 covers the shard's decoded logical content. On resume,
shards present in lineage are skipped; shard partition dirs without a
lineage row (crash mid-write) are deleted and rebuilt. Blocks are a pure
function of the (term-sorted, doc-sorted) postings, so a resumed build
is byte-identical to an uninterrupted one.

Reference parity note: this plays the role of Lucene's segment files +
TieredMergePolicy commits (Lucene.java:920-945, LuceneSettings.java:157-160);
one build = one commit = one queryable snapshot.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meresco_lucene_spark.analysis.tokenizer import tokenize_udf
from meresco_lucene_spark.index.codec import (
    decode_doc_block,
    encode_doc_block,
    varint_decode,
    varint_encode,
)
from meresco_lucene_spark.query.bm25 import (
    B_DEFAULT,
    K1_DEFAULT,
    bm25_score_numpy,
    quantize_dl,
)

BLOCK_SIZE_DEFAULT = 128

_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def fnv1a64(terms: pd.Series) -> np.ndarray:
    """Vectorized-enough FNV-1a 64-bit over term strings (stable across
    driver/executor/python versions, unlike hash())."""
    out = np.empty(len(terms), dtype=np.uint64)
    for i, t in enumerate(terms):
        h = _FNV_OFFSET
        for b in t.encode("utf-8"):
            h = np.uint64((int(h) ^ b) * int(_FNV_PRIME) & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return out


def term_base_shard(term: str, n_shards: int) -> int:
    return int(fnv1a64(pd.Series([term]))[0] % n_shards)


POSTINGS_SCHEMA = (
    "shard int, term string, block_id int, doc_count int, min_doc long, "
    "max_doc long, block_max_score double, doc_bytes binary, tf_bytes binary, "
    "dl_bytes binary"
)


class SegmentIndex:
    """Query handle over a written segment store."""

    def __init__(self, spark: SparkSession, out_dir: str):
        self.spark = spark
        self.out_dir = out_dir
        with open(os.path.join(out_dir, "meta.json")) as f:
            self.meta = json.load(f)
        self.docs = spark.read.parquet(os.path.join(out_dir, "docs"))
        self.term_stats = spark.read.parquet(os.path.join(out_dir, "term_stats"))
        self.postings = spark.read.parquet(os.path.join(out_dir, "postings"))

    # ------------------------------------------------------------- queries
    def term_shards(self, term: str) -> list[int]:
        row = (
            self.term_stats.filter(F.col("term") == term)
            .select("base_shard", "n_salts")
            .collect()
        )
        if not row:
            return []
        base, n_salts = row[0]["base_shard"], row[0]["n_salts"]
        n = self.meta["n_shards"]
        return [(base + s) % n for s in range(n_salts)]

    def blocks_for_term(self, term: str) -> DataFrame:
        shards = self.term_shards(term)
        if not shards:
            return self.postings.filter(F.lit(False))
        return self.postings.filter(
            F.col("shard").isin(shards) & (F.col("term") == term)
        )

    def term_topk(self, term: str, k: int = 10) -> DataFrame:
        """Exact BM25 top-k for one term with block-max WAND pruning.

        All blocks of the term collapse into one pandas group (they are
        few: df/block_size rows); blocks are visited in descending
        block_max_score order and decoding stops when the bound can't
        beat the running k-th score — rank-identical to exhaustive
        scoring because block_max_score is an exact per-block bound."""
        meta = self.meta
        blocks = self.blocks_for_term(term)
        stats = (
            self.term_stats.filter(F.col("term") == term)
            .select("df")
            .collect()
        )
        if not stats:
            return self.spark.createDataFrame([], "doc_id long, score double")
        df_t = stats[0]["df"]
        n, avgdl, k1, b = meta["n_docs"], meta["avgdl"], meta["k1"], meta["b"]

        def _topk(pdf: pd.DataFrame) -> pd.DataFrame:
            # Blocks carry their own varint dl stream — scoring needs no
            # side lookup (critical at scale: no docs-table broadcast).
            pdf = pdf.sort_values("block_max_score", ascending=False)
            best: list[tuple[float, int]] = []  # (score, doc_id), kept sorted
            threshold = -np.inf
            for _, row in pdf.iterrows():
                if len(best) >= k and row["block_max_score"] < threshold:
                    break  # no later block can beat the k-th score
                doc_ids, tfs = decode_doc_block(row["doc_bytes"], row["tf_bytes"])
                dls = varint_decode(row["dl_bytes"]).astype(float)
                scores = bm25_score_numpy(
                    tfs.astype(float), float(df_t), dls, n, avgdl, k1, b
                )
                for s, d in zip(scores, doc_ids):
                    best.append((float(s), int(d)))
                best.sort(key=lambda x: (-x[0], x[1]))
                best = best[:k]
                if len(best) >= k:
                    threshold = best[-1][0]
            return pd.DataFrame(
                {"doc_id": [d for _, d in best], "score": [s for s, _ in best]}
            )

        grouped = blocks.groupBy("term").applyInPandas(
            _topk, schema="doc_id long, score double"
        )
        return grouped.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)

    def term_postings(self, term: str) -> DataFrame:
        """Decode a term's blocks back to (doc_id, tf) rows."""
        blocks = self.blocks_for_term(term)

        def _decode(it):
            for pdf in it:
                for _, row in pdf.iterrows():
                    doc_ids, tfs = decode_doc_block(row["doc_bytes"], row["tf_bytes"])
                    yield pd.DataFrame({"doc_id": doc_ids.astype("int64"), "tf": tfs.astype("int64")})

        return blocks.mapInPandas(_decode, schema="doc_id long, tf long")


def build_segments(
    corpus: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "content",
    n_shards: int = 32,
    salt_buckets: int = 8,
    block_size: int = BLOCK_SIZE_DEFAULT,
    hot_df_fraction: float = 0.05,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    quantized: bool = False,
    resume: bool = False,
    run_id: str = "run0",
) -> SegmentIndex:
    """Build (or resume) the compressed segment store.

    Stages (each checkpointed):
      1. docs:       tokenize -> per-doc lengths (+ SmallFloat norms)
      2. term_stats: df/cf + hot-term salting decision
      3. postings:   shuffle by salted shard -> per-shard term-sorted
                     delta+varint blocks + block-max scores + lineage
    """
    spark = corpus.sparkSession
    os.makedirs(out_dir, exist_ok=True)
    docs_dir = os.path.join(out_dir, "docs")
    stats_dir = os.path.join(out_dir, "term_stats")
    post_dir = os.path.join(out_dir, "postings")
    lin_dir = os.path.join(out_dir, "lineage")
    meta_path = os.path.join(out_dir, "meta.json")

    doc = F.col(id_col).alias("doc_id")
    toks = corpus.select(doc, tokenize_udf(F.col(text_col)).alias("tokens"))

    # ---- stage 1: docs (lengths + norms) --------------------------------
    if not (resume and os.path.exists(os.path.join(docs_dir, "_SUCCESS"))):
        lengths = toks.select(
            "doc_id", F.coalesce(F.size("tokens"), F.lit(0)).cast("long").alias("dl")
        )

        def _norm(it):
            for pdf in it:
                pdf = pdf.copy()
                pdf["norm_dl"] = quantize_dl(pdf["dl"].to_numpy())
                yield pdf

        lengths.mapInPandas(_norm, schema="doc_id long, dl long, norm_dl long").write.mode(
            "overwrite"
        ).parquet(docs_dir)

    docs_df = spark.read.parquet(docs_dir)
    agg = docs_df.agg(
        F.count("*").alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("s")
    ).collect()[0]
    n_docs, sum_dl = int(agg["n"]), int(agg["s"])
    avgdl = sum_dl / n_docs if n_docs else 1.0

    # flat (term, doc_id, tf) — one shuffle, map-side partial agg
    postings_flat = (
        toks.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
    )

    # ---- stage 2: term stats + salting decision -------------------------
    if not (resume and os.path.exists(os.path.join(stats_dir, "_SUCCESS"))):
        hot_threshold = max(int(hot_df_fraction * n_docs), 1)
        tstats = postings_flat.groupBy("term").agg(
            F.count("*").cast("long").alias("df"), F.sum("tf").cast("long").alias("cf")
        )

        idf_c = F.log(
            F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
        # Upper bound of the score over all docs: tf/(tf+K) is increasing in
        # tf and decreasing in dl; bound with tf<=cf and the corpus-min dl.
        min_dl = docs_df.agg(F.min("dl")).collect()[0][0] or 1

        def _shard(it):
            for pdf in it:
                pdf = pdf.copy()
                h = fnv1a64(pdf["term"])
                pdf["base_shard"] = (h % np.uint64(n_shards)).astype("int32")
                pdf["n_salts"] = np.where(
                    pdf["df"] >= hot_threshold, salt_buckets, 1
                ).astype("int32")
                yield pdf

        (
            tstats.withColumn("max_score", idf_c * (F.col("cf") / (F.col("cf") + F.lit(k1 * (1 - b + b * float(min_dl) / avgdl)))))
            .mapInPandas(
                _shard,
                schema="term string, df long, cf long, max_score double, base_shard int, n_salts int",
            )
            .write.mode("overwrite")
            .parquet(stats_dir)
        )

    tstats_df = spark.read.parquet(stats_dir)

    # ---- stage 3: sharded compressed postings + lineage -----------------
    done_shards: set[int] = set()
    if resume and os.path.exists(lin_dir):
        done_shards = {
            r["shard"] for r in spark.read.parquet(lin_dir).select("shard").collect()
        }
        # clean partial partition dirs that never got a lineage row
        if os.path.exists(post_dir):
            for entry in os.listdir(post_dir):
                if entry.startswith("shard="):
                    s = int(entry.split("=")[1])
                    if s not in done_shards:
                        shutil.rmtree(os.path.join(post_dir, entry))
    elif os.path.exists(post_dir):
        shutil.rmtree(post_dir)
        if os.path.exists(lin_dir):
            shutil.rmtree(lin_dir)

    remaining = [s for s in range(n_shards) if s not in done_shards]
    if remaining:
        shard_info = tstats_df.select("term", "df", "base_shard", "n_salts")
        flat = postings_flat.join(shard_info, "term")
        flat = flat.withColumn(
            "shard",
            (
                (F.col("base_shard") + F.pmod(F.col("doc_id"), F.col("n_salts")))
                % n_shards
            ).cast("int"),
        )
        flat = flat.filter(F.col("shard").isin(remaining))
        # carry dl for block-max score computation
        dl_col = "norm_dl" if quantized else "dl"
        flat = flat.join(docs_df.select("doc_id", F.col(dl_col).alias("_dl")), "doc_id")

        def _encode(key, pdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(key[0])
            pdf = pdf.sort_values(["term", "doc_id"], kind="mergesort")
            out: dict[str, list] = {
                "shard": [], "term": [], "block_id": [], "doc_count": [],
                "min_doc": [], "max_doc": [], "block_max_score": [],
                "doc_bytes": [], "tf_bytes": [], "dl_bytes": [],
            }
            for term, grp in pdf.groupby("term", sort=True):
                doc_ids = grp["doc_id"].to_numpy(dtype=np.int64)
                tfs = grp["tf"].to_numpy(dtype=np.int64)
                dls = grp["_dl"].to_numpy(dtype=float)
                df_t = float(grp["df"].iloc[0])
                scores = bm25_score_numpy(
                    tfs.astype(float), df_t, dls, n_docs, avgdl, k1, b
                )
                for bi, lo in enumerate(range(0, len(doc_ids), block_size)):
                    hi = min(lo + block_size, len(doc_ids))
                    dbytes, tbytes = encode_doc_block(doc_ids[lo:hi], tfs[lo:hi])
                    out["shard"].append(shard)
                    out["term"].append(term)
                    out["block_id"].append(bi)
                    out["doc_count"].append(hi - lo)
                    out["min_doc"].append(int(doc_ids[lo]))
                    out["max_doc"].append(int(doc_ids[hi - 1]))
                    out["block_max_score"].append(float(scores[lo:hi].max()))
                    out["doc_bytes"].append(dbytes)
                    out["tf_bytes"].append(tbytes)
                    out["dl_bytes"].append(
                        varint_encode(dls[lo:hi].astype(np.int64))
                    )
            return pd.DataFrame(out)

        # groupBy(shard).applyInPandas shuffles by shard itself — one
        # shuffle, each task encodes exactly one shard's postings.
        encoded = flat.groupBy("shard").applyInPandas(_encode, schema=POSTINGS_SCHEMA)
        encoded.write.mode("append").partitionBy("shard").parquet(post_dir)

        # lineage: one row per completed shard, hashed over logical content
        written = spark.read.parquet(post_dir).filter(F.col("shard").isin(remaining))
        lineage = (
            written.withColumn(
                "_h",
                F.sha2(
                    F.concat_ws(
                        "|",
                        F.col("term"),
                        F.col("block_id").cast("string"),
                        F.sha2(F.col("doc_bytes"), 256),
                        F.sha2(F.col("tf_bytes"), 256),
                    ),
                    256,
                ),
            )
            .groupBy("shard")
            .agg(
                F.countDistinct("term").cast("long").alias("n_terms"),
                F.count("*").cast("long").alias("n_blocks"),
                F.sum("doc_count").cast("long").alias("n_postings"),
                (F.sum(F.length("doc_bytes")) + F.sum(F.length("tf_bytes")))
                .cast("long")
                .alias("bytes"),
                F.sha2(F.concat_ws(",", F.sort_array(F.collect_list("_h"))), 256).alias(
                    "content_sha256"
                ),
                F.lit(run_id).alias("run_id"),
            )
        )
        lineage.write.mode("append").parquet(lin_dir)

    meta = {
        "n_docs": n_docs,
        "sum_dl": sum_dl,
        "avgdl": avgdl,
        "n_shards": n_shards,
        "salt_buckets": salt_buckets,
        "block_size": block_size,
        "hot_df_fraction": hot_df_fraction,
        "k1": k1,
        "b": b,
        "quantized": quantized,
    }
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return SegmentIndex(spark, out_dir)
