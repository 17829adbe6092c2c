"""Deduplication operators for large-scale training-data pipelines.

Four tiers, cheapest first:
  exact          — sha256 hash groupBy (one shuffle)
  prefix/fingerprint — hash of a normalized prefix (near-dup recall at
                   exact-dup cost)
  n-gram Jaccard — shingle explode + candidate self-join + exact overlap
  MinHash + LSH  — signature bands -> bucket join -> verify; SimHash —
                   hamming-banded 64-bit sketches

All are pure DataFrame pipelines (the shuffles are on hash/bucket keys,
partial-aggregated); token/shingle hashing is pandas-siphash in an
Arrow-batched UDF (no per-row Python).

Scale notes: the shingle self-join is quadratic per bucket — at corpus
scale ALWAYS go through LSH bands first (minhash_lsh_candidates), which
bounds bucket sizes; the exact-jaccard verify then touches only
candidate pairs. A frequency cap (drop shingles with df > max_df) keeps
stop-shingle buckets from exploding, mirroring the hot-term salting
story of the index builder.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from meresco_lucene_spark.analysis.tokenizer import tokenize_udf

_HASH_KEY = "mls_dedup_hash_0"


def _hash64(s: pd.Series) -> np.ndarray:
    return pd.util.hash_pandas_object(s, index=False, hash_key=_HASH_KEY).to_numpy(
        dtype=np.uint64
    )


def exact_duplicate_groups(
    df: DataFrame, id_col: str, text_col: str, max_ids: int = 100
) -> DataFrame:
    """Exact dedup: sha256(text) groups with >1 member.
    Returns (content_hash, n_docs, keep_id=min id, doc_ids sorted).

    doc_ids is CAPPED at max_ids per group: a pathological duplicate
    group (boilerplate duplicated billions of times) must not
    materialize an unbounded array in one row — n_docs still carries the
    true count, keep_id the survivor. The cap is applied BEFORE the
    collect (rank over the same shuffle key), so the aggregation buffer
    itself is bounded, not just the output row."""
    from pyspark.sql.window import Window

    h = df.select(
        F.col(id_col).alias("doc_id"), F.sha2(F.col(text_col), 256).alias("content_hash")
    )
    ranked = h.withColumn(
        "_rn",
        F.row_number().over(Window.partitionBy("content_hash").orderBy("doc_id")),
    )
    return (
        ranked.groupBy("content_hash")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("keep_id"),
            F.sort_array(
                F.collect_list(F.when(F.col("_rn") <= max_ids, F.col("doc_id")))
            ).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def prefix_fingerprint_groups(
    df: DataFrame, id_col: str, text_col: str, n_tokens: int = 8
) -> DataFrame:
    """Near-dup by normalized-prefix fingerprint: first n analyzed tokens
    hashed; one shuffle, catches boilerplate-headed documents."""
    toks = df.select(
        F.col(id_col).alias("doc_id"), tokenize_udf(F.col(text_col)).alias("_t")
    )
    fp = toks.select(
        "doc_id",
        F.sha2(F.concat_ws(" ", F.slice("_t", 1, n_tokens)), 256).alias("prefix_hash"),
    )
    return (
        fp.groupBy("prefix_hash")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("keep_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def _gram_expr(arr_col: str, n: int):
    """Word n-grams of an array column. NB: Spark's sequence(1, 0) yields
    a DESCENDING [1, 0] — the size guard is mandatory for short docs."""
    return F.expr(
        f"CASE WHEN size({arr_col}) >= {n} THEN "
        f"transform(sequence(1, size({arr_col}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({arr_col}, i, {n}))) "
        f"ELSE array() END"
    )


def _shingles_df(
    df: DataFrame, id_col: str, text_col: str, n: int, max_df: int | None = None
) -> DataFrame:
    """(doc_id, shingle) distinct word n-grams, optionally dropping
    shingles shared by more than max_df docs (stop-shingle cap)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"), tokenize_udf(F.col(text_col)).alias("_t")
    )
    sh = toks.select(
        "doc_id",
        F.explode(_gram_expr("_t", n)).alias("shingle"),
    ).distinct()
    if max_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > max_df)
            .select("shingle")
        )
        sh = sh.join(hot, "shingle", "left_anti")
    return sh


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity over candidate pairs that share at
    least one shingle. Returns (id_a, id_b, jaccard) with id_a < id_b and
    jaccard >= threshold."""
    sh = _shingles_df(df, id_col, text_col, n, max_df).persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )
    return out


# ----------------------------------------------------------------- MinHash

def _minhash_udf(n_hashes: int, seed: int = 7):
    """shingle array -> minhash signature (vectorized affine rehash of a
    single 64-bit base hash: h_i(x) = (a_i * x + b_i) mod 2^61-1)."""
    p = np.uint64((1 << 61) - 1)
    rng = np.random.Generator(np.random.Philox(key=seed))
    a = rng.integers(1, int(p), size=n_hashes, dtype=np.uint64)
    bcoef = rng.integers(0, int(p), size=n_hashes, dtype=np.uint64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def minhash(shingles: pd.Series) -> pd.Series:
        out = []
        for sh in shingles:
            if sh is None or len(sh) == 0:
                out.append([0] * n_hashes)
                continue
            base = _hash64(pd.Series(list(sh))).astype(np.uint64) % p
            # (n_hashes, n_shingles) affine map in uint64 mod p
            sig = (a[:, None] * base[None, :] + bcoef[:, None]) % p
            out.append(sig.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out)

    return minhash


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, n_hashes: int = 64
) -> DataFrame:
    toks = df.select(
        F.col(id_col).alias("doc_id"), tokenize_udf(F.col(text_col)).alias("_t")
    )
    sh = toks.select(
        "doc_id",
        F.array_distinct(_gram_expr("_t", n)).alias("shingles"),
    )
    mh = _minhash_udf(n_hashes)
    return sh.select("doc_id", mh(F.col("shingles")).alias("signature"))


def minhash_lsh_candidates(
    signatures: DataFrame, bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """Band the signatures; docs sharing any band bucket are candidates.
    Returns (id_a, id_b) with id_a < id_b, distinct."""
    banded = signatures.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> hash(concat_ws(',', slice(signature, b * {rows_per_band} + 1, {rows_per_band})), b))"
            )
        ).alias("band", "bucket"),
    )
    a = banded.select(F.col("doc_id").alias("id_a"), "band", "bucket")
    b = banded.select(F.col("doc_id").alias("id_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    n_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Full near-dup pipeline: MinHash -> LSH candidates -> exact-Jaccard
    verify on candidates only. Returns (id_a, id_b, jaccard >= threshold).

    The verify is candidate-driven: candidate pairs join each side's
    shingles FIRST (cands ⋈ sh(id_a) ⋈ sh(id_b) on shingle equality), so
    intersection counts are computed only for LSH candidates. An earlier
    version self-joined ALL shingle-sharing pairs before semi-joining
    the candidates — Catalyst cannot push a pair-level semi-join below a
    self-join, so one boilerplate shingle made that path all-pairs
    quadratic. max_df additionally drops stop-shingles shared by more
    than max_df docs (mirrors the index builder's hot-term salting
    story); it caps the per-shingle fanout of the verify join itself."""
    rows = n_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, n, n_hashes)
    cands = minhash_lsh_candidates(sigs, bands, rows)
    sh = _shingles_df(df, id_col, text_col, n, max_df).persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        cands.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
    )


# -------------------------------------------------- embedding-cosine near-dup

def _embedding_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_tables: int,
    bits_per_table: int,
    seed: int,
) -> DataFrame:
    """(doc_id, table, bucket) rows: each vector signed into one bucket
    per hyperplane table (same seeded family as ann.write_lsh_index, so
    a near-dup sweep and a query index probe agree on bucketing)."""
    from meresco_lucene_spark.extras.ann import hyperplanes, table_bucket_expr

    dim = len(df.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_tables * bits_per_table, seed)
    structs = []
    for t in range(n_tables):
        tp = planes[t * bits_per_table : (t + 1) * bits_per_table]
        structs.append(
            F.struct(
                F.lit(t).alias("table"),
                table_bucket_expr(F.col(vec_col), tp).alias("bucket"),
            )
        )
    return df.select(
        F.col(id_col).alias("doc_id"), F.explode(F.array(*structs)).alias("_tb")
    ).select(
        "doc_id",
        F.col("_tb.table").alias("table"),
        F.col("_tb.bucket").alias("bucket"),
    )


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    n_tables: int = 8,
    bits_per_table: int = 8,
    seed: int = 11,
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup: hyperplane-LSH candidate pairs, exact
    cosine verify. Returns (id_a, id_b, cosine) with id_a < id_b and
    cosine >= threshold.

    Scale shape mirrors minhash_near_duplicates: the self-join is on
    (table, bucket) keys, so per-bucket fanout — never all-pairs —
    bounds the shuffle; the exact cosine (pure JVM zip_with/aggregate
    column math) touches candidate pairs only. ``max_bucket`` drops
    pathological buckets (e.g. a zero-vector pile-up) before the join,
    the analog of the shingle max_df stop cap. Recall is probabilistic
    in the LSH params: a pair at angle θ shares a table bucket with
    p=(1-θ/π)^bits, any-of-L with 1-(1-p)^L — near-identical vectors
    (the dedup target) are missed with vanishing probability (~1e-14 at
    cosine 0.999 with 8×8), measured against exact in tests."""
    from meresco_lucene_spark.extras.ann import _dot, _norm

    vecs = df.select(
        F.col(id_col).alias("doc_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    buckets = _embedding_buckets(df, id_col, vec_col, n_tables, bits_per_table, seed)
    if max_bucket is not None:
        hot = (
            buckets.groupBy("table", "bucket")
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > max_bucket)
            .select("table", "bucket")
        )
        buckets = buckets.join(hot, ["table", "bucket"], "left_anti")
    a = buckets.select(F.col("doc_id").alias("id_a"), "table", "bucket")
    b = buckets.select(F.col("doc_id").alias("id_b"), "table", "bucket")
    cands = (
        a.join(b, ["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = vecs.select(F.col("doc_id").alias("id_a"), F.col("_v").alias("_va"))
    vb = vecs.select(F.col("doc_id").alias("id_b"), F.col("_v").alias("_vb"))
    paired = cands.join(va, "id_a").join(vb, "id_b")
    cos = _dot(F.col("_va"), F.col("_vb")) / (
        _norm(F.col("_va")) * _norm(F.col("_vb"))
    )
    return (
        paired.withColumn("_cos", cos)
        .filter(F.col("_cos") >= threshold)
        .select("id_a", "id_b", F.round("_cos", 4).alias("cosine"))
    )


# ----------------------------------------------------------------- SimHash

def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash over analyzed tokens (tf-weighted bit votes)."""

    @F.pandas_udf(T.LongType())
    def simhash(tokens: pd.Series) -> pd.Series:
        out = np.zeros(len(tokens), dtype=np.int64)
        for i, toks in enumerate(tokens):
            if toks is None or len(toks) == 0:
                continue
            s = pd.Series(list(toks))
            counts = s.value_counts()
            h = _hash64(pd.Series(counts.index)).astype(np.uint64)
            w = counts.to_numpy(dtype=np.int64)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
                np.int64
            )
            votes = ((bits * 2 - 1) * w[:, None]).sum(axis=0)
            sig = np.uint64(0)
            for bit in np.flatnonzero(votes > 0):
                sig |= np.uint64(1) << np.uint64(bit)
            out[i] = np.int64(sig.astype(np.int64))
        return pd.Series(out)

    toks = df.select(
        F.col(id_col).alias("doc_id"), tokenize_udf(F.col(text_col)).alias("_t")
    )
    return toks.select("doc_id", simhash(F.col("_t")).alias("simhash"))


def _simhash_band_exprs(n_bands: int) -> list:
    """(band, bucket) struct exprs splitting the 64-bit simhash into
    n_bands contiguous bit ranges (widths as even as possible)."""
    base, extra = divmod(64, n_bands)
    widths = [base + (1 if i < extra else 0) for i in range(n_bands)]
    exprs, off = [], 0
    for i, w in enumerate(widths):
        mask = (1 << w) - 1
        exprs.append(
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col("simhash"), off)
                .bitwiseAND(F.lit(mask))
                .alias("bucket"),
            )
        )
        off += w
    return exprs


def simhash_near_duplicates(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Candidate pairs by band equality, exact hamming filter after.

    Recall guarantee (pigeonhole): with n_bands = max_hamming + 1
    disjoint bands, a pair at hamming distance <= max_hamming differs in
    at most max_hamming bands, so at least one band matches — recall = 1
    at the requested threshold (an earlier fixed-4-band version silently
    missed pairs at distance 4..8 when max_hamming was raised above 3)."""
    n_bands = max(2, max_hamming + 1)
    sigs = simhash_signatures(df, id_col, text_col).persist()
    banded = sigs.select(
        "doc_id",
        "simhash",
        F.explode(F.array(*_simhash_band_exprs(n_bands))).alias("_bb"),
    ).select(
        "doc_id",
        "simhash",
        F.col("_bb.band").alias("band"),
        F.col("_bb.bucket").alias("bucket"),
    )
    a = banded.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("sim_a"), "band", "bucket"
    )
    b = banded.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("sim_b"), "band", "bucket"
    )
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sim_a", "sim_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """Distributed connected components over a near-duplicate pair
    graph: (doc_id, component) where component = the smallest doc id
    reachable from doc_id. This is the canonical-document step of a
    dedup pipeline — every member of a near-dup cluster maps to one
    survivor (the component label), whatever chain of pairwise matches
    connects them.

    Algorithm: alternating large-star / small-star contraction
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the published scale path for trillion-edge graphs.
    Each half-round is ONE shuffle (groupBy-min + re-join on the same
    key); convergence takes O(log n) rounds regardless of component
    diameter, so a year-long chain of pairwise near-dups costs the same
    as a tight cluster. Iteration state is localCheckpoint'ed so the
    Catalyst plan stays flat instead of doubling per round; each round's
    edge set is persisted and the previous one unpersisted, so executor
    memory holds at most two edge sets.

    The driver loop runs until the edge set reaches its star-graph
    fixpoint (checked with ONE exceptAll count per round — cheap
    because both sides are already cached) or max_iter, whichever is
    first; 30 rounds covers graphs to ~2^30 nodes in the worst case.
    """
    e = (
        pairs.select(
            F.col(id_a).cast("long").alias("u"), F.col(id_b).cast("long").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )

    def large_star(edges: DataFrame) -> DataFrame:
        sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        return (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def small_star(edges: DataFrame) -> DataFrame:
        oriented = edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
        neighbor_edges = (
            oriented.join(mins, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        self_edges = mins.select("u", F.col("m").alias("v"))
        return neighbor_edges.union(self_edges).distinct()

    for _ in range(max_iter):
        nxt = small_star(large_star(e)).localCheckpoint()
        changed = nxt.exceptAll(e).limit(1).count() or e.exceptAll(nxt).limit(1).count()
        prev, e = e, nxt
        prev.unpersist()
        if not changed:
            break

    # Star-graph fixpoint: every non-root has exactly one (node, root)
    # edge; roots label themselves.
    return (
        e.select(F.col("u").alias("doc_id"), F.col("v").alias("component"))
        .union(e.select(F.col("v").alias("doc_id"), F.col("v").alias("component")))
        .distinct()
    )
