"""Local mirror of the driver's correctness gate: run every queries()
entry and its oracle_sql() twin on the same parquet, compare as
order-insensitive multisets (columns sorted by name, floats already
rounded inside the queries)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

import os

SF_DIR = os.environ.get("MLS_ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 4)
                if v == -0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    df = qs[name](spark, SF_DIR)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]
    if name not in oracles:
        # rows-only entries must still verify SOMETHING: a 0-row result
        # would make the driver's weaker rows-only gate trivially green
        # (the r2/r3 signal-quality complaint)
        assert len(spark_rows) > 0
        return
    res = duck.execute(oracles[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: {spark_cols} vs {duck_cols}"
    )
    a = _normalize(spark_rows, spark_cols)
    b = _normalize(duck_rows, duck_cols)
    assert a == b, f"value mismatch for {name}: spark={a[:5]} duck={b[:5]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert "doc_id" in df.columns and "score" in df.columns


def test_similar_documents_nontrivial(spark):
    """The MLT entry must verify actual rows (its r3 version pinned a
    seed with zero rare-term overlap at sf0.01 and green-checked 0==0)."""
    df = entry_mod.queries()["similar_documents"](spark, SF_DIR)
    assert df.count() > 0


def test_minhash_lsh_oracle_recall_band_guard(duck):
    """ADVICE r3: the dd_minhash_lsh oracle asserts LSH output == the
    exact pair set >= 0.3, which only holds while no corpus pair sits in
    the low-recall band just above threshold (16x4 bands: ~21% recall at
    jaccard 0.35). Guard: every qualifying pair's EXPECTED banded recall
    1-(1-j^r)^b must be >= 0.99 (j >= ~0.708 for b=16, r=4 — the seeded
    hash family is deterministic per corpus, so this is margin against
    corpus/sf drift, not per-run randomness). A pair below the line
    means the fixture needs re-planting BEFORE the driver gate can turn
    red on a new corpus. At sf0.01 the shortest planted doc dilutes to
    jaccard 0.786 -> recall 0.9995, which is exactly the case a blunt
    0.8 cutoff would misflag."""
    rows = duck.execute(entry_mod.oracle_sql()["dd_minhash_lsh"]).fetchall()
    assert rows
    for id_a, id_b, j in rows:
        recall = 1.0 - (1.0 - j**4) ** 16
        assert recall >= 0.99, (id_a, id_b, j, recall)


def test_embedding_cosine_oracle_recall_band_guard(duck):
    """Same guard for hyperplane-LSH cosine pairs: threshold 0.9,
    planted pairs at ~1.0; anything in [0.9, 0.99) is recall-risky."""
    rows = duck.execute(entry_mod.oracle_sql()["dd_embedding_cosine"]).fetchall()
    assert rows and all(c >= 0.99 for _, _, c in rows), rows
