"""Persistent index store: the full query surface served from disk.

Parity contract: every operator of query/executor.py must produce
IDENTICAL results over a PersistentIndex reopened from disk as over the
session InvertedIndex — term/bool/phrase/prefix/range/facets/sort/dedup
— with zero re-tokenization on reopen (the reference's durable
commit -> search contract, Lucene.java:920-945, :899-907)."""

import io
from contextlib import redirect_stdout

import pandas as pd
import pytest
from pyspark.sql import functions as F

from meresco_lucene_spark.index import store as store_mod
from meresco_lucene_spark.index.builder import InvertedIndex
from meresco_lucene_spark.index.store import (
    PersistentIndex,
    build_index_store,
    decode_positions,
    encode_positions,
)
from meresco_lucene_spark.query.executor import facet_counts_df, hits, search
from meresco_lucene_spark.query.ir import FILTER, MUST, MUST_NOT, SHOULD, Q

DOCS = [
    (0, "spark fast spark join", "py", 3),
    (1, "slow join table", "py", 1),
    (2, "spark table scan scan scan", "java", 5),
    (3, "join the fast table", "go", None),
    (4, "unique_term spark", "py", 2),
    (5, "fast fast fast join spark", None, 4),
]


@pytest.fixture(scope="module")
def stores(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("store") / "idx")
    pdf = pd.DataFrame(DOCS, columns=["doc_id", "text", "lang", "stars"])
    df = spark.createDataFrame(pdf)
    kwargs = dict(
        id_col="doc_id",
        text_cols=["text"],
        keyword_cols=["lang"],
        facet_fields={"lang": ["lang"]},
    )
    build_index_store(df, out, n_shards=4, **kwargs)
    mem = InvertedIndex.build(df, **kwargs)
    disk = PersistentIndex(spark, out)  # REOPEN: fresh handle, disk only
    yield mem, disk
    mem.unpersist()


def _hits(ix, q):
    return {r["doc_id"]: round(r["score"], 9) for r in hits(ix, q).collect()}


def test_positions_codec_roundtrip():
    import numpy as np

    lists = [[0, 2, 5], [7], [], [1, 1000, 1001], [3]]
    buf, sizes = encode_positions(np.array(lists, dtype=object))
    lens = np.array([len(p) for p in lists])
    got = decode_positions(buf, lens)
    assert got == [list(p) for p in lists]


def test_postings_identical_to_dataframe_index(stores):
    mem, disk = stores
    a = {
        (r["term"], r["doc_id"]): (r["tf"], list(r["positions"]))
        for r in mem.postings_for("text").collect()
    }
    b = {
        (r["term"], r["doc_id"]): (r["tf"], list(r["positions"]))
        for r in disk.postings_for("text").collect()
    }
    assert a == b
    assert {r["doc_id"]: r["dl"] for r in disk.lengths_for("text").collect()} == {
        r["doc_id"]: r["dl"] for r in mem.lengths_for("text").collect()
    }
    assert sorted(
        map(tuple, disk.term_stats_for("text").collect())
    ) == sorted(map(tuple, mem.term_stats_for("text").collect()))


QUERIES = [
    Q.term("text", "spark"),
    Q.term("text", "spark", boost=2.5),
    Q.and_(Q.term("text", "spark"), Q.term("text", "join")),
    Q.or_(Q.term("text", "scan"), Q.term("text", "unique_term")),
    Q.not_(Q.term("text", "join"), Q.term("text", "slow")),
    Q.boolean((MUST, Q.term("text", "spark")), (FILTER, Q.term("lang", "py"))),
    Q.boolean((SHOULD, Q.term("text", "fast")), (MUST_NOT, Q.term("text", "scan"))),
    Q.phrase("text", "fast", "table"),
    Q.phrase("text", "spark", "fast", "spark"),
    Q.prefix("text", "sca"),
    Q.range("stars", lower=2, upper=5, include_lower=True, include_upper=False),
    Q.matchall(),
    Q.drilldown("lang", ["py"]),
]


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_query_surface_parity(stores, qi):
    mem, disk = stores
    q = QUERIES[qi]
    assert _hits(disk, q) == _hits(mem, q), f"mismatch for {q.to_dict()}"


def test_search_facets_sort_dedup_from_disk(stores):
    mem, disk = stores
    kw = dict(
        query=Q.term("text", "join"),
        facets=[{"fieldname": "lang", "maxTerms": 10}],
        dedup_field="lang",
        stored_fields=["lang", "stars"],
        sort_keys=[{"sortBy": "score", "sortDescending": True}],
    )
    ra, rb = search(mem, **kw), search(disk, **kw)
    assert rb.total == ra.total
    assert rb.totalWithDuplicates == ra.totalWithDuplicates
    assert rb.drilldownData == ra.drilldownData
    assert [(h.id, round(h.score, 9), h.fields) for h in rb.hits] == [
        (h.id, round(h.score, 9), h.fields) for h in ra.hits
    ]
    fa = facet_counts_df(mem, hits(mem, Q.matchall()), "lang").collect()
    fb = facet_counts_df(disk, hits(disk, Q.matchall()), "lang").collect()
    assert [tuple(r) for r in fa] == [tuple(r) for r in fb]


def test_term_filter_pushed_to_parquet_scan(stores):
    """The decode is a projection: a term equality above it must reach
    the parquet scan as a PushedFilter — only the query term's blocks
    are read and decoded."""
    _, disk = stores
    p = disk.postings_for("text").filter(F.col("term") == "spark")
    buf = io.StringIO()
    with redirect_stdout(buf):
        p.explain(True)
    plan = buf.getvalue()
    assert "PushedFilters" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("term" in ln and "spark" in ln for ln in pushed), pushed


def test_reopen_zero_retokenization(spark, stores, monkeypatch):
    """Opening + querying a store must never tokenize: poison the
    tokenizer module and run a full search from a fresh handle."""
    _, disk = stores

    def _boom(*a, **k):
        raise AssertionError("tokenizer invoked on reopened store")

    from meresco_lucene_spark.analysis import tokenizer

    monkeypatch.setattr(tokenizer, "tokenize_expr", _boom)
    monkeypatch.setattr(tokenizer, "tokenize_udf", _boom)
    fresh = PersistentIndex(spark, disk.out_dir)
    r = search(fresh, Q.term("text", "spark"), stop=3)
    assert r.total == 4 and len(r.hits) == 3


def _topk_of(ix, q, k):
    return [
        (r["doc_id"], round(r["score"], 9))
        for r in hits(ix, q)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .collect()
    ]


@pytest.mark.parametrize("force_wand", [False, True])
def test_store_wand_rank_identity(stores, force_wand, monkeypatch):
    """The store's block-max WAND fast path (term/or/and_topk) must be
    rank- AND score-identical to the exact executor evaluation — on both
    the small-set exhaustive shortcut and (force_wand) the pruned
    pool/θ/candidate pipeline."""
    if force_wand:
        import meresco_lucene_spark.index.wand as wand

        monkeypatch.setattr(wand, "EXHAUSTIVE_CAP", 0)
    mem, disk = stores
    for term in ("spark", "fast", "unique_term", "nosuchterm"):
        got = [(r["doc_id"], round(r["score"], 9))
               for r in disk.term_topk("text", term, 4).collect()]
        assert got == _topk_of(mem, Q.term("text", term), 4), term
    got = [(r["doc_id"], round(r["score"], 9))
           for r in disk.or_topk("text", ["spark", "join"], 4).collect()]
    assert got == _topk_of(mem, Q.or_(Q.term("text", "spark"), Q.term("text", "join")), 4)
    got = [(r["doc_id"], round(r["score"], 9))
           for r in disk.and_topk("text", ["spark", "join"], 4).collect()]
    assert got == _topk_of(mem, Q.and_(Q.term("text", "spark"), Q.term("text", "join")), 4)
    assert disk.and_topk("text", ["spark", "nosuchterm"], 4).count() == 0
    # keyword field (omit_norms): dl=1/avgdl=1 collapses to tf/(tf+k1)
    got = [(r["doc_id"], round(r["score"], 9))
           for r in disk.term_topk("lang", "py", 5).collect()]
    assert got == _topk_of(mem, Q.term("lang", "py"), 5)


def test_composed_queries_over_persistent_cores(spark, tmp_path):
    """Multi-core composed queries run unchanged over PersistentIndex
    cores reopened from disk (MultiLuceneTest.java testJoinQuery golden:
    coreA docs whose A-key has a coreB doc with N=true)."""
    from meresco_lucene_spark.compose.composedquery import (
        ComposedQuery,
        execute_composed,
    )

    a_rows = [(0, "A", 1, "false"), (1, "A-U", 2, "false"),
              (2, "A-Q", 3, "false"), (3, "A-QU", 4, "false"),
              (4, "A-M", 5, "true"), (5, "A-MU", 6, "true"),
              (6, "A-MQ", 7, "true"), (7, "A-MQU", 8, "true")]
    b_rows = [(0, 5, "true"), (1, 6, "true"), (2, 7, "true"), (3, 8, "true"),
              (4, 9, "true"), (5, 10, "false")]
    a = spark.createDataFrame(
        pd.DataFrame(a_rows, columns=["doc_id", "id", "A", "M"])
    )
    b = spark.createDataFrame(pd.DataFrame(b_rows, columns=["doc_id", "B", "N"]))
    build_index_store(a, str(tmp_path / "coreA"), keyword_cols=["M", "id"], n_shards=4)
    build_index_store(b, str(tmp_path / "coreB"), keyword_cols=["N"], n_shards=4)
    cores = {
        "coreA": PersistentIndex(spark, str(tmp_path / "coreA")),
        "coreB": PersistentIndex(spark, str(tmp_path / "coreB")),
    }
    cq = ComposedQuery("coreA", queries={"coreA": Q.matchall()})
    cq.set_core_query("coreB", Q.term("N", "true"))
    cq.add_match("coreA", "A", "coreB", "B")
    r = execute_composed(cores, cq)
    assert r.total == 4
    assert {h.id for h in r.hits} == {4, 5, 6, 7}  # A-M, A-MU, A-MQ, A-MQU


def test_store_array_cols_and_term_frequency_similarity(spark, tmp_path):
    """Stores persist pre-tokenized array fields (the suggestion ngram
    shape) and the TermFrequency similarity setting survives reopen
    (search/TermFrequencySimilarity.java:40-58: score = tf/1000 * boost)."""
    rows = [(1, ["$a", "ab", "b$", "ab"]), (2, ["$a", "zz"])]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "bigram"]))
    out = str(tmp_path / "arr")
    build_index_store(
        df, out, array_cols=["bigram"], similarity="TermFrequency", n_shards=2
    )
    disk = PersistentIndex(spark, out)
    assert disk.similarity == "TermFrequency"
    got = {r["doc_id"]: round(r["score"], 9)
           for r in hits(disk, Q.term("bigram", "ab")).collect()}
    assert got == {1: round(2 / 1000, 9)}
    got = {r["doc_id"]: round(r["score"], 9)
           for r in hits(disk, Q.term("bigram", "$a", boost=3.0)).collect()}
    assert got == {1: 0.003, 2: 0.003}


def _store_logical_content(spark, out_dir):
    disk = PersistentIndex(spark, out_dir)
    rows = disk.postings_for("text").collect()
    return sorted(
        (r["term"], r["doc_id"], r["tf"], tuple(r["positions"])) for r in rows
    )


def test_store_crash_resume_identical(spark, tmp_path):
    """Kill-and-rerun for the persistent store (same lineage contract as
    segments): wipe one shard fully (data+lineage) and leave another
    partially written with no lineage row; resume must re-encode exactly
    the missing shards and reproduce identical logical content."""
    import glob
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F2

    pdf = pd.DataFrame(
        {
            "doc_id": range(150),
            "text": [f"alpha beta w{i} w{i%7} gamma" for i in range(150)],
        }
    )
    df = spark.createDataFrame(pdf)
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    build_index_store(df, a_dir, text_cols=["text"], n_shards=4, block_size=16)
    golden = _store_logical_content(spark, a_dir)

    shutil.copytree(a_dir, b_dir)
    lin = pq.read_table(f"{b_dir}/lineage").to_pandas()
    keep = lin[~lin["shard"].isin([1, 2])]
    shutil.rmtree(f"{b_dir}/lineage")
    import os

    os.makedirs(f"{b_dir}/lineage")
    pq.write_table(
        pa.Table.from_pandas(keep, preserve_index=False),
        f"{b_dir}/lineage/part-0.parquet",
    )
    shutil.rmtree(f"{b_dir}/postings/shard=1")
    files2 = glob.glob(f"{b_dir}/postings/shard=2/*.parquet")
    assert files2
    os.remove(files2[0])

    build_index_store(
        df, b_dir, text_cols=["text"], n_shards=4, block_size=16,
        resume=True, run_id="resume1",
    )
    assert _store_logical_content(spark, b_dir) == golden
    lin_b = spark.read.parquet(f"{b_dir}/lineage")
    assert {r["shard"] for r in lin_b.collect()} == {0, 1, 2, 3}
    resumed = {
        r["shard"] for r in lin_b.filter(F2.col("run_id") == "resume1").collect()
    }
    assert resumed == {1, 2}
    # resume over a complete store is a no-op (original run_ids kept)
    build_index_store(
        df, b_dir, text_cols=["text"], n_shards=4, block_size=16,
        resume=True, run_id="resume2",
    )
    lin_b2 = spark.read.parquet(f"{b_dir}/lineage")
    assert "resume2" not in {r["run_id"] for r in lin_b2.collect()}
    assert _store_logical_content(spark, b_dir) == golden


def test_hot_term_salting_splits_blocks(spark, tmp_path):
    """A term over the hot-df threshold spreads across salt_buckets
    shards; postings still decode identically."""
    n = 60
    pdf = pd.DataFrame(
        {"doc_id": range(n), "text": ["common filler" if i % 2 else "common alone" for i in range(n)]}
    )
    out = str(tmp_path / "hot")
    build_index_store(
        spark.createDataFrame(pdf), out, text_cols=["text"],
        n_shards=8, salt_buckets=4, hot_df_fraction=0.5, block_size=8,
    )
    disk = PersistentIndex(spark, out)
    shards = {
        r["shard"]
        for r in disk.blocks.filter(F.col("term") == "common").select("shard").collect()
    }
    assert len(shards) == 4  # salted across salt_buckets shards
    got = {
        r["doc_id"]: r["tf"]
        for r in disk.postings_for("text").filter(F.col("term") == "common").collect()
    }
    assert got == {i: 1 for i in range(n)}


def test_pin_build_config_resume_keeps_shard_mapping(tmp_path):
    """ADVICE r3: auto n_shards floors at the session's parallelism, so
    a resume on a different cluster would re-derive a different value
    and mix two shard mappings. The pinned _build_config.json wins on
    resume; a conflicting explicit n_shards is an error."""
    import pytest as _pytest

    from meresco_lucene_spark.index.segments import pin_build_config

    n, s = pin_build_config(str(tmp_path), False, None, 8, lambda: 7)
    assert (n, s) == (7, 7)
    # "different cluster": derive would now say 13 — pinned value wins
    assert pin_build_config(str(tmp_path), True, None, 8, lambda: 13) == (7, 7)
    # explicit n_shards matching the pin is fine; a conflict raises
    assert pin_build_config(str(tmp_path), True, 7, 8, lambda: 13) == (7, 7)
    with _pytest.raises(ValueError, match="shard mapping"):
        pin_build_config(str(tmp_path), True, 13, 8, lambda: 13)
    # a FRESH (non-resume) build re-pins
    assert pin_build_config(str(tmp_path), False, 4, 8, lambda: 99) == (4, 4)
