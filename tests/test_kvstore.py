"""KV store (S11): dict API parity with the reference's
LuceneKeyValueStore (pylucene/lucenekeyvaluestore.py:42-120) —
set/get/delete with uncommitted visibility, last-write-wins commits,
reopen durability."""

import pytest

from meresco_lucene_spark.kvstore import KeyValueStore


def test_set_get_delete_uncommitted(spark, tmp_path):
    kv = KeyValueStore(spark, str(tmp_path / "kv"))
    kv["a"] = 1  # coerced to str like the reference
    assert kv["a"] == "1"
    assert kv.get("missing") is None
    assert kv.get("missing", "d") == "d"
    del kv["a"]
    with pytest.raises(KeyError):
        kv["a"]


def test_commit_reopen_last_write_wins(spark, tmp_path):
    path = str(tmp_path / "kv")
    kv = KeyValueStore(spark, path)
    kv["k1"] = "v1"
    kv["k2"] = "v2"
    kv.commit()
    kv["k1"] = "v1b"  # update in a later epoch
    del kv["k2"]
    kv.commit()

    fresh = KeyValueStore(spark, path)  # reopen: committed state only
    assert fresh["k1"] == "v1b"
    assert fresh.get("k2") is None
    assert sorted(map(tuple, fresh.items_df().collect())) == [("k1", "v1b")]


def test_items_df_merges_buffer(spark, tmp_path):
    kv = KeyValueStore(spark, str(tmp_path / "kv"))
    kv["x"] = "1"
    kv.commit()
    kv["y"] = "2"
    del kv["x"]
    assert sorted(map(tuple, kv.items_df().collect())) == [("y", "2")]
    kv.close()  # close commits
    fresh = KeyValueStore(spark, str(tmp_path / "kv"))
    assert sorted(map(tuple, fresh.items_df().collect())) == [("y", "2")]
