"""Corpus synthesizer: determinism, schema, sha256 manifest invariant
(BASELINE.json input_hint: per-row content sha256 equality)."""

from pyspark.sql import functions as F

from meresco_lucene_spark.corpus import manifest_sha256, synthesize_corpus


def test_schema_and_count(spark):
    df = synthesize_corpus(spark, 50, seed=42, partitions=2)
    assert df.columns == ["doc_id", "repo", "path", "commit", "lang", "content"]
    assert df.count() == 50


def test_partition_independence(spark):
    """Content is a pure function of (seed, doc_id), not of partitioning."""
    a = synthesize_corpus(spark, 40, seed=42, partitions=1)
    b = synthesize_corpus(spark, 40, seed=42, partitions=8)
    ha = {r["doc_id"]: r["h"] for r in a.select("doc_id", F.sha2("content", 256).alias("h")).collect()}
    hb = {r["doc_id"]: r["h"] for r in b.select("doc_id", F.sha2("content", 256).alias("h")).collect()}
    assert ha == hb


def test_sha256_manifest(spark):
    df = synthesize_corpus(spark, 30, seed=7, partitions=3)
    got = {
        r["doc_id"]: r["h"]
        for r in df.select("doc_id", F.sha2("content", 256).alias("h")).collect()
    }
    assert got == manifest_sha256(7, list(range(30)))


def test_seed_changes_content(spark):
    a = synthesize_corpus(spark, 10, seed=1).select(F.sha2("content", 256)).collect()
    b = synthesize_corpus(spark, 10, seed=2).select(F.sha2("content", 256)).collect()
    assert a != b


def test_hot_terms_present(spark):
    """The Zipfian hot terms that motivate salted sharding must dominate."""
    df = synthesize_corpus(spark, 100, seed=42, partitions=2)
    n_with_import = df.filter(F.col("content").rlike(r"(^|\s)import(\s|$)")).count()
    assert n_with_import > 90
