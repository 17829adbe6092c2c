"""Key-value store (SURVEY §2.1 S11) — the reference's tiny Lucene-backed
dict (pylucene/lucenekeyvaluestore.py:42-120) recast as a parquet-backed
two-column table.

API parity with LuceneKeyValueStore:
  kv[key] = value         (updateDocument: last write wins)
  kv[key] / kv.get(key)   (uncommitted writes visible immediately via the
                           write-through buffer — the reference's
                           _latestModifications dict)
  del kv[key]             (deleteDocuments + DELETED_RECORD marker)
  kv.commit()             (durable epoch; buffered writes flushed)
  kv.close()

Keys and values are coerced to str like the reference. Durability model:
each commit writes one parquet epoch of the buffered mutations; reads of
committed state take the newest epoch's row per key (same pattern as
streaming/ingest.py — an epoch IS a commit). A reopened store sees all
committed epochs. The reference auto-reopens its searcher after 10k
buffered writes; here the buffer simply keeps serving reads until
commit(), with the same observable semantics (uncommitted writes visible
to the writer, lost on crash before commit)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_DELETED = object()


class KeyValueStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)
        self._buffer: dict[str, object] = {}

    # ------------------------------------------------------------- dict API
    def __setitem__(self, key, value) -> None:
        self._buffer[str(key)] = str(value)

    def __getitem__(self, key):
        key = str(key)
        if key in self._buffer:
            v = self._buffer[key]
            if v is _DELETED:
                raise KeyError(key)
            return v
        row = (
            self._committed()
            .filter(F.col("key") == key)
            .select("value")
            .collect()
        )
        if not row or row[0]["value"] is None:
            raise KeyError(key)
        return row[0]["value"]

    def get(self, key, default=None):
        try:
            return self[key]
        except KeyError:
            return default

    def __delitem__(self, key) -> None:
        self._buffer[str(key)] = _DELETED

    # ----------------------------------------------------------- durability
    def commit(self) -> None:
        """One commit = one parquet epoch of the buffered mutations."""
        if not self._buffer:
            return
        epoch = self._next_epoch()
        rows = [
            (k, None if v is _DELETED else v) for k, v in self._buffer.items()
        ]
        df = self.spark.createDataFrame(rows, "key string, value string")
        df.write.mode("overwrite").parquet(
            os.path.join(self.path, f"epoch={epoch}")
        )
        self._buffer.clear()

    def close(self) -> None:
        self.commit()

    # -------------------------------------------------------------- queries
    def _epochs(self) -> list[int]:
        return sorted(
            int(e.split("=", 1)[1])
            for e in os.listdir(self.path)
            if e.startswith("epoch=")
        )

    def _next_epoch(self) -> int:
        eps = self._epochs()
        return (eps[-1] + 1) if eps else 0

    def _committed(self):
        """Newest committed row per key (None value = deleted)."""
        if not self._epochs():
            return self.spark.createDataFrame([], "key string, value string")
        df = self.spark.read.option("basePath", self.path).parquet(
            os.path.join(self.path, "epoch=*")
        )
        w = Window.partitionBy("key").orderBy(F.col("epoch").desc())
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("key", "value")
        )

    def items_df(self):
        """All live (key, value) pairs as a DataFrame — the capability the
        reference never had (its items()/keys()/values() raise
        NotImplementedError); buffered writes are merged in."""
        committed = self._committed().filter(F.col("value").isNotNull())
        if not self._buffer:
            return committed
        rows = [
            (k, None if v is _DELETED else v) for k, v in self._buffer.items()
        ]
        buf = self.spark.createDataFrame(rows, "key string, value string")
        return (
            committed.join(buf.select("key"), "key", "left_anti")
            .unionByName(buf.filter(F.col("value").isNotNull()))
        )
