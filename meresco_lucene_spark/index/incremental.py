"""Incremental commits for the persistent store: Lucene's segment model
restated over generation directories.

The reference's IndexWriter accumulates addDocument/deleteDocument calls
and each commit makes a new durable segment set searchable
(Lucene.java:920-945, commit policy LuceneSettings.java:58-59); deleted
docs stay in the postings — and in docFreq/norms — until a MERGE
rewrites them away (TieredMergePolicy, LuceneSettings.java:157-160).
This module reproduces that contract Spark-first:

  root/
    _config.json       field typing / similarity config (written once)
    gen-000000/
      store/           a full build_index_store output for THIS batch
      tombstones/      parquet (doc_id) — ids this commit supersedes or
                       deletes in all OLDER generations
      _COMMITTED       atomic commit marker (store + tombstones appear
                       together or not at all)

  * commit_batch(df)  — tokenizes ONLY the batch (at 100 TB you cannot
    re-tokenize the corpus per refresh), builds a generation store,
    tombstones older versions of the batch's ids, commits atomically.
  * MultiGenIndex     — the InvertedIndex/PersistentIndex interface over
    the union of committed generations: postings/forward rows of
    superseded docs are filtered out (liveDocs), while df/cf/n_docs/
    avgdl AGGREGATE across generations INCLUDING dead docs — exactly
    Lucene's scoring semantics before a merge.
  * force_merge()     — folds all generations into one (stats then
    exclude deleted docs, as after a Lucene merge). The merge re-encodes
    DECODED postings via build_index_store(occurrences=...) — no
    re-tokenization, matching Lucene's copy-don't-reanalyze merges.
  * partial_merge()   — the size-tiered form maybe_merge actually uses:
    folds only the SUFFIX of small delta generations, never re-encoding
    a dominant base generation (at 100 TB, merge cost must track the
    DELTA volume, not the corpus).

Scale shape: a commit's cost is proportional to the BATCH (one small
store build + one tombstone write); a query unions per-generation block
scans whose term filters still push into each parquet scan; liveness is
one broadcast-size anti-join per query until tombstones grow large, at
which point force_merge (the tiered-merge analog) resets them to zero.
Crash safety: a commit is invisible until its _COMMITTED marker exists
(written last, via atomic rename), so a crash mid-commit leaves older
readers consistent; a crashed gen dir is wiped and renumbered by the
next commit.

FILESYSTEM ASSUMPTION (applies to all three commit protocols in this
repo — the gen-dir ``_COMMITTED`` markers here, IngestSink's
``epoch=N/_SUCCESS`` gating (streaming/ingest.py), and the suggestion
store's ``CURRENT`` pointer swap (suggest.py)): visibility is gated on
an ATOMIC RENAME, which POSIX filesystems and HDFS provide but object
stores (S3 et al.) do not — there, rename is copy+delete and readers
can observe half-commits. Pointing a store root at an object store
needs a real commit-log abstraction (an Iceberg/Delta-style catalog
transaction) in place of the rename; tracked as the Iceberg backlog
item, fine for local/HDFS deployments.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from meresco_lucene_spark.index.builder import FieldStats
from meresco_lucene_spark.index.committer import COMMITTER
from meresco_lucene_spark.index.store import (
    PersistentIndex,
    build_index_store,
    open_persistent_index,
)

_GEN_PREFIX = "gen-"

# Handle cache for tombstone frames (same design as
# store.open_persistent_index): a committed generation's tombstones dir
# is immutable, but every reader open re-listed it driver-side. Keyed by
# the dir inode + mtime so a recreated dir (same path, new commit)
# misses; rows are still read from parquet on every action.
_TOMB_CACHE: dict[tuple, DataFrame] = {}
_TOMB_CACHE_CAP = 256


def _tombstone_frame(spark: SparkSession, tdir: str) -> DataFrame:
    try:
        st = os.stat(tdir)
    except OSError:
        return spark.read.parquet(tdir).select("doc_id")
    key = (id(spark), tdir, st.st_ino, st.st_mtime_ns)
    t = _TOMB_CACHE.get(key)
    if t is None:
        while len(_TOMB_CACHE) >= _TOMB_CACHE_CAP:
            _TOMB_CACHE.pop(next(iter(_TOMB_CACHE)))
        _TOMB_CACHE[key] = t = spark.read.parquet(tdir).select("doc_id")
    return t


def _gen_name(n: int) -> str:
    return f"{_GEN_PREFIX}{n:06d}"


def _commit_marker(gen_dir: str) -> str:
    return os.path.join(gen_dir, "_COMMITTED")


def _meta_path(gen_dir: str) -> str:
    return os.path.join(gen_dir, "_meta.json")


def _write_meta(gen_dir: str, meta: dict) -> None:
    COMMITTER.publish_file(_meta_path(gen_dir), json.dumps(meta))


class IncrementalIndexStore:
    """Writer handle: commit batches / deletes, open readers, merge."""

    def __init__(self, spark: SparkSession, root: str, **build_kwargs):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        cfg_path = os.path.join(root, "_config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                self.build_kwargs = json.load(f)
            if build_kwargs and build_kwargs != self.build_kwargs:
                raise ValueError(
                    "store config differs from the existing _config.json; "
                    "field typing is fixed at store creation"
                )
        else:
            self.build_kwargs = dict(build_kwargs)
            tmp = cfg_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(self.build_kwargs, f)
            os.replace(tmp, cfg_path)

    # ---------------------------------------------------------- discovery
    def _gens(self, committed_only: bool = True) -> list[int]:
        out = []
        for e in os.listdir(self.root):
            if e.startswith(_GEN_PREFIX):
                if not committed_only or os.path.exists(
                    _commit_marker(os.path.join(self.root, e))
                ):
                    out.append(int(e[len(_GEN_PREFIX):]))
        return sorted(out)

    def _next_gen(self) -> int:
        all_gens = self._gens(committed_only=False)
        return (all_gens[-1] + 1) if all_gens else 0

    def _clean_crashed(self) -> None:
        """Wipe generation dirs that lack a _COMMITTED marker (crashed
        mid-commit). Single-writer is assumed, so any unmarked dir is
        dead weight — removing it before numbering keeps the docstring's
        'wiped and renumbered' promise instead of leaking it forever.

        Also garbage-collects generations a committed merge already
        folded (its ``merged_from`` metadata): a crash between a merge's
        _COMMITTED marker and the suffix deletions leaves a transient
        bigger-but-consistent state (the merged gen's tombstones mask
        every folded copy) that heals here on the next write."""
        merged_away: set[int] = set()
        for g in self._gens():
            merged_away.update(self._gen_meta(g).get("merged_from", ()))
        for e in os.listdir(self.root):
            if e.startswith(_GEN_PREFIX):
                gen_dir = os.path.join(self.root, e)
                if not os.path.exists(_commit_marker(gen_dir)) or (
                    int(e[len(_GEN_PREFIX):]) in merged_away
                ):
                    shutil.rmtree(gen_dir, ignore_errors=True)

    # ------------------------------------------------------------ commits
    def commit_batch(
        self,
        df: DataFrame | None,
        delete_ids: list[int] | None = None,
        id_col: str = "doc_id",
        meta: dict | None = None,
        delete_frame: DataFrame | None = None,
    ) -> int:
        """One commit: the batch's docs become searchable, any OLDER
        version of their ids (plus delete_ids) stops matching. Atomic:
        the generation is invisible until _COMMITTED lands. Tombstones
        are written unconditionally for the batch's ids — one write
        instead of an existence-check join against every older
        generation; a tombstone for an id that never existed matches
        nothing. (Frame-sourced predicate deletes go through
        ``delete_matching`` — the no-driver-collect path.)

        ``meta``: small JSON dict recorded durably INSIDE this commit
        (written before the _COMMITTED marker) — used by the streaming
        ingest to make epoch replay-detection atomic with the commit.

        ``delete_frame``: ids to delete as a one-column DataFrame — the
        frame-path twin of ``delete_ids`` for callers whose delete set
        comes from a distributed computation (streaming CDC): the ids
        flow straight into the tombstone parquet write, never through
        the driver (a CDC batch deleting millions of rows must not
        materialize them driver-side)."""
        self._clean_crashed()
        gen = self._next_gen()
        gen_dir = os.path.join(self.root, _gen_name(gen))
        os.makedirs(gen_dir)
        tomb_ids = None
        if df is not None:
            tomb_ids = df.select(F.col(id_col).cast("long").alias("doc_id"))
        if delete_ids:
            extra = self.spark.createDataFrame(
                [(int(i),) for i in delete_ids], "doc_id long"
            )
            tomb_ids = extra if tomb_ids is None else tomb_ids.unionByName(extra)
        if delete_frame is not None:
            dfr = delete_frame.select(
                F.col(delete_frame.columns[0]).cast("long").alias("doc_id")
            )
            tomb_ids = dfr if tomb_ids is None else tomb_ids.unionByName(dfr)
        # tombstones only matter when an older generation exists
        if not self._gens():
            tomb_ids = None
        # The tombstone write and the generation-store build are
        # independent jobs over the same batch — submit the tombstone
        # write on a thread so it back-fills executors while the store
        # build's stages drain (guide §2.6); on a small refresh commit
        # this removes one whole sequential job round-trip. Ordering
        # stays safe: both exist before the _COMMITTED marker lands.
        tomb_writer = None
        if tomb_ids is not None:
            from concurrent.futures import ThreadPoolExecutor

            tomb_frame = tomb_ids.distinct()
            pool = ThreadPoolExecutor(max_workers=1)
            tomb_writer = pool.submit(
                lambda: tomb_frame.write.mode("overwrite").parquet(
                    os.path.join(gen_dir, "tombstones")
                )
            )
        try:
            if df is not None:
                # lineage=False: generation stores are wiped on crash,
                # never shard-resumed, so the lineage pass is pure fixed
                # overhead on the per-commit refresh cost
                build_index_store(
                    df, os.path.join(gen_dir, "store"), id_col=id_col,
                    lineage=False, **self.build_kwargs,
                )
        finally:
            if tomb_writer is not None:
                tomb_writer.result()  # re-raise a failed tombstone write
                pool.shutdown(wait=True)
        if meta:
            _write_meta(gen_dir, meta)
        COMMITTER.publish_file(_commit_marker(gen_dir), "ok")
        return gen

    def delete(self, delete_ids: list[int]) -> int:
        """deleteDocument analog: a tombstone-only commit."""
        return self.commit_batch(None, delete_ids=delete_ids)

    def delete_matching(self, doc_ids: DataFrame) -> int | None:
        """Predicate-delete analog (deleteDocuments(query),
        Lucene.java:178-181) at scale: a tombstone-only commit whose ids
        come from a DataFrame — typically ``hits(reader, q).select(
        "doc_id")`` — so the matched set flows straight from the
        filtered snapshot scan into the tombstone parquet write with no
        driver collect (a predicate matching a large fraction of a
        100 TB corpus must not OOM the driver). The row count rides the
        write job as an Observation; a no-match predicate leaves no
        committed generation behind (the unmarked dir is wiped at once
        and would be garbage-collected by _clean_crashed anyway).
        Returns the committed generation, or None when nothing matched
        or the store has no committed generation. Self-read-safe: the
        frame scans only already-committed gen dirs while the write
        lands in a NEW gen dir invisible until its marker."""
        if not self._gens():
            return None
        from pyspark.sql import Observation

        self._clean_crashed()
        gen = self._next_gen()
        gen_dir = os.path.join(self.root, _gen_name(gen))
        os.makedirs(gen_dir)
        obs = Observation()
        (
            doc_ids.select(F.col("doc_id").cast("long").alias("doc_id"))
            .distinct()
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .write.mode("overwrite")
            .parquet(os.path.join(gen_dir, "tombstones"))
        )
        if int(obs.get["n"]) == 0:
            shutil.rmtree(gen_dir, ignore_errors=True)
            return None
        COMMITTER.publish_file(_commit_marker(gen_dir), "ok")
        return gen

    # -------------------------------------------------------- gen metadata
    def _gen_meta(self, gen: int) -> dict:
        p = _meta_path(os.path.join(self.root, _gen_name(gen)))
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {}

    def last_stream_epoch(self) -> int:
        """Highest stream epoch recorded inside any COMMITTED generation
        (-1 if none): the replay watermark that cannot run ahead of the
        commits it describes, because it is written before each gen's
        _COMMITTED marker and carried forward by force_merge."""
        out = -1
        for g in self._gens():
            out = max(out, int(self._gen_meta(g).get("stream_epoch", -1)))
        return out

    # ------------------------------------------------------------- reads
    def open(self, as_of: int | None = None) -> "MultiGenIndex":
        """Open a reader; ``as_of`` pins it to the state after commit N
        (generations and tombstones above N are ignored) — the commit-
        point / snapshot-read analog (reference keeps prior commit
        points for readers, Lucene.java:899-907). Snapshots survive
        until a merge garbage-collects the generations they reference."""
        return MultiGenIndex(self.spark, self.root, as_of=as_of)

    # ------------------------------------------------------------- merge
    def _gen_ndocs(self, gen: int) -> int:
        """Row count of a generation's store from its build metadata
        (0 for tombstone-only generations) — no Spark job."""
        p = os.path.join(self.root, _gen_name(gen), "store", "meta.json")
        if os.path.exists(p):
            with open(p) as f:
                return int(json.load(f).get("n_docs", 0))
        return 0

    def maybe_merge(self, segments_per_tier: int = 8) -> int | None:
        """The TieredMergePolicy trigger (reference default
        segmentsPerTier=8.0, LuceneSettings.java:157-160): merge when the
        committed generation count exceeds the tier size, otherwise do
        nothing. Call after commit_batch in steady-state ingest so reads
        never union more than ~segments_per_tier generations and the
        tombstone anti-join stays broadcast-small.

        SIZE-TIERED like Lucene, not a full fold: dominant old
        generations are excluded from the merge — a prefix generation
        stays untouched while its doc count is >= 2x the total of
        everything newer — and the remaining delta SUFFIX is folded into
        one. A 100 TB base generation is therefore never re-encoded just
        because eight batch-sized deltas accumulated — merge cost stays
        proportional to the DELTA volume (log-amortized), and the base
        is only folded by a full merge once the accumulated deltas reach
        half its size. Returns the merged generation number, or None if
        below the threshold (or when nothing can be folded without
        re-encoding a dominant base — the count may then sit above the
        tier until newer deltas break the dominance, as in Lucene's
        tiered policy where segmentsPerTier applies PER TIER)."""
        gens = self._gens()
        if len(gens) <= segments_per_tier:
            return None
        sizes = {g: self._gen_ndocs(g) for g in gens}
        i = 0
        # a tombstone-only generation (size 0) is never a dominant base:
        # without the > 0 guard, `0 >= 2*0` walks the loop through a
        # delete-only suffix and degenerates into force_merge — a full
        # re-encode of the base for a pure-delete workload
        while i < len(gens) - 1 and sizes[gens[i]] > 0 and sizes[
            gens[i]
        ] >= 2 * sum(sizes[g] for g in gens[i + 1:]):
            i += 1
        suffix = gens[i:]
        if i == 0:
            return self.force_merge()
        if sum(sizes[g] for g in suffix) == 0:
            # delete-only suffix: fold the tombstone SETS into one
            # tombstone-only generation; the base is never touched
            return (
                self._fold_tombstone_gens(suffix) if len(suffix) >= 2 else None
            )
        if len(suffix) < 2:
            return None
        return self.partial_merge(suffix[0])

    def _fold_tombstone_gens(self, gens: list[int]) -> int | None:
        """Fold a contiguous SUFFIX of tombstone-only generations into
        one tombstone-only generation (union of their tombstone sets).

        Relocating a tombstone from gen g to the new gen N widens its
        mask from `row_gen < g` to `row_gen < N`; the only generations
        in [g, N) are the folded suffix itself, which carries no rows —
        so the visible corpus is unchanged. DELTA-scale I/O only: no
        store is re-encoded. Crash-safe like partial_merge: the folded
        gen commits (with ``merged_from``) before the suffix dirs are
        deleted, and _clean_crashed heals a partial deletion."""
        self._clean_crashed()
        gen = self._next_gen()
        gen_dir = os.path.join(self.root, _gen_name(gen))
        os.makedirs(gen_dir)
        tomb: DataFrame | None = None
        for g in gens:
            tdir = os.path.join(self.root, _gen_name(g), "tombstones")
            if os.path.isdir(tdir):
                t = self.spark.read.parquet(tdir).select("doc_id")
                tomb = t if tomb is None else tomb.unionByName(t)
        if tomb is None:
            shutil.rmtree(gen_dir, ignore_errors=True)
            return None
        tomb.distinct().write.mode("overwrite").parquet(
            os.path.join(gen_dir, "tombstones")
        )
        meta: dict = {"merged_from": list(gens)}
        eps = max(
            (int(self._gen_meta(g).get("stream_epoch", -1)) for g in gens),
            default=-1,
        )
        if eps >= 0:
            meta["stream_epoch"] = eps
        _write_meta(gen_dir, meta)
        COMMITTER.publish_file(_commit_marker(gen_dir), "ok")
        for g in gens:
            shutil.rmtree(os.path.join(self.root, _gen_name(g)), ignore_errors=True)
        return gen

    def partial_merge(self, start_gen: int) -> int | None:
        """Fold the SUFFIX of generations >= start_gen into one, leaving
        older generations untouched on disk (the Lucene tiered merge of
        a segment subset; merging a non-suffix subset would need gen
        renumbering to keep `tomb_gen > row_gen` masking sound, so only
        suffixes are supported).

        Correctness under the tombstone model:
          - the merged generation's stats cover the suffix's LIVE docs
            only (dead suffix docs leave docFreq — exactly Lucene's
            post-merge change for the MERGED segments; unmerged older
            segments keep counting their dead docs until their own
            merge);
          - the merged tombstones = the union of the suffix generations'
            tombstone sets (they must keep masking superseded versions
            in the KEPT older generations) plus the suffix's own live
            ids (masking the about-to-be-deleted suffix copies during
            the crash window). Both are DELTA-scale, never corpus-scale
            — the base generation contributes nothing here.
        Crash safety: the merged gen commits atomically BEFORE the
        suffix dirs are deleted; its ``merged_from`` metadata lets
        _clean_crashed garbage-collect suffix dirs that a crash left
        behind, so the transient bigger-but-consistent state heals on
        the next commit."""
        all_gens = self._gens()
        gens = [g for g in all_gens if g >= start_gen]
        if len(gens) < 2:
            return None
        if gens[0] == all_gens[0]:
            return self.force_merge()
        reader = MultiGenIndex(self.spark, self.root, min_gen=start_gen)
        self._clean_crashed()
        gen = self._next_gen()
        gen_dir = os.path.join(self.root, _gen_name(gen))
        os.makedirs(gen_dir)
        build_index_store(
            reader.forward,
            os.path.join(gen_dir, "store"),
            id_col="doc_id",
            occurrences=reader.live_occurrences(),
            lengths=reader.live_lengths(),
            lineage=False,
            **self.build_kwargs,
        )
        tomb = reader.forward.select("doc_id")
        for g in gens:
            tdir = os.path.join(self.root, _gen_name(g), "tombstones")
            if os.path.isdir(tdir):
                tomb = tomb.unionByName(
                    self.spark.read.parquet(tdir).select("doc_id")
                )
        tomb.distinct().write.mode("overwrite").parquet(
            os.path.join(gen_dir, "tombstones")
        )
        meta: dict = {"merged_from": gens}
        eps = max(
            (int(self._gen_meta(g).get("stream_epoch", -1)) for g in gens),
            default=-1,
        )
        if eps >= 0:
            meta["stream_epoch"] = eps
        _write_meta(gen_dir, meta)
        COMMITTER.publish_file(_commit_marker(gen_dir), "ok")
        for g in gens:
            shutil.rmtree(os.path.join(self.root, _gen_name(g)), ignore_errors=True)
        return gen

    def force_merge(self) -> int:
        """Fold every committed generation into one (the tiered-merge
        endpoint): live postings are DECODED and re-encoded through
        build_index_store(occurrences=...) — no re-tokenization — and
        the merged store's stats cover live docs only, exactly the
        post-merge Lucene scoring change. Crash-safe ordering: the
        merged generation tombstones EVERY older id and commits
        atomically BEFORE the old generation dirs are deleted, so a
        crash between the two steps leaves a bigger but consistent
        store."""
        gens = self._gens()
        if len(gens) <= 1:
            return gens[0] if gens else -1
        reader = self.open()
        self._clean_crashed()
        gen = self._next_gen()
        gen_dir = os.path.join(self.root, _gen_name(gen))
        os.makedirs(gen_dir)
        build_index_store(
            reader.forward,
            os.path.join(gen_dir, "store"),
            id_col="doc_id",
            occurrences=reader.live_occurrences(),
            lengths=reader.live_lengths(),
            lineage=False,
            **self.build_kwargs,
        )
        reader.forward.select("doc_id").distinct().write.mode(
            "overwrite"
        ).parquet(os.path.join(gen_dir, "tombstones"))
        # carry the stream-epoch watermark into the merged generation —
        # the old gens' _meta.json files are about to be deleted, and the
        # watermark must never move backwards across a merge
        meta: dict = {"merged_from": gens}
        eps = max(
            (int(self._gen_meta(g).get("stream_epoch", -1)) for g in gens),
            default=-1,
        )
        if eps >= 0:
            meta["stream_epoch"] = eps
        _write_meta(gen_dir, meta)
        COMMITTER.publish_file(_commit_marker(gen_dir), "ok")
        for g in gens:
            shutil.rmtree(os.path.join(self.root, _gen_name(g)), ignore_errors=True)
        # the merged gen's tombstones (one row per LIVE doc — corpus-sized)
        # only mask the generations just deleted; dropping them now keeps
        # steady-state reads free of any anti-join and keeps the tombstone
        # broadcast bounded by UN-MERGED volume forever, never corpus size
        shutil.rmtree(os.path.join(gen_dir, "tombstones"), ignore_errors=True)
        return gen


class MultiGenIndex:
    """Union reader over committed generations with Lucene liveness
    semantics: superseded/deleted docs drop out of results, stay in the
    scoring statistics until force_merge. Implements the same interface
    as InvertedIndex/PersistentIndex, so the whole executor surface
    (term/bool/phrase/prefix/range/facets/sort/dedup/composed) runs
    unchanged on top."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        as_of: int | None = None,
        min_gen: int | None = None,
    ):
        """``min_gen`` restricts the reader to generations >= min_gen —
        the partial-merge feed (the suffix is self-contained: its
        tombstones can only mask generations inside or below it, and
        nothing above the suffix exists by construction)."""
        self.spark = spark
        self.root = root
        self.id_col = "doc_id"
        gens = []
        for e in sorted(os.listdir(root)):
            if e.startswith(_GEN_PREFIX) and os.path.exists(
                _commit_marker(os.path.join(root, e))
            ):
                g = int(e[len(_GEN_PREFIX):])
                if (as_of is None or g <= as_of) and (
                    min_gen is None or g >= min_gen
                ):
                    gens.append(g)
        self.gens = gens
        self.stores: dict[int, PersistentIndex] = {}
        tomb_parts = []
        for g in gens:
            gen_dir = os.path.join(root, _gen_name(g))
            if os.path.isdir(os.path.join(gen_dir, "store")):
                self.stores[g] = open_persistent_index(
                    spark, os.path.join(gen_dir, "store")
                )
            tdir = os.path.join(gen_dir, "tombstones")
            if os.path.isdir(tdir):
                tomb_parts.append(
                    _tombstone_frame(spark, tdir).select(
                        "doc_id", F.lit(g).alias("_tomb_gen")
                    )
                )
        if not self.stores:
            raise ValueError(f"no committed generations with data under {root}")
        first = self.stores[min(self.stores)]
        self.k1 = first.k1
        self.b = first.b
        self.similarity = first.similarity
        self.quantized = first.quantized
        self.has_positions = first.has_positions
        self.facet_fields = dict(first.facet_fields)
        self._tombstones = None
        if tomb_parts:
            t = tomb_parts[0]
            for p in tomb_parts[1:]:
                t = t.unionByName(p)
            self._tombstones = t
        self.n_docs = sum(s.n_docs for s in self.stores.values())
        self._forward: DataFrame | None = None

    @property
    def forward(self) -> DataFrame:
        """Lazy union of the generations' forward tables (liveness-
        filtered): building it at open() forced a driver-side parquet
        open of every generation's forward dir even for queries that
        never touch stored fields."""
        if self._forward is None:
            self._forward = self._live(
                self._union(lambda s: s.forward), keep_gen=False
            )
        return self._forward

    # --------------------------------------------------------- internals
    def _union(self, frame_of) -> DataFrame:
        """Union of per-generation frames, tagged with their gen."""
        parts = [
            frame_of(s).withColumn("_gen", F.lit(g))
            for g, s in self.stores.items()
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _live(self, tagged: DataFrame, keep_gen: bool = False) -> DataFrame:
        """Drop rows whose doc_id is tombstoned by a LATER generation (a
        re-added doc's new version survives its own tombstone: the kill
        condition is strictly tomb_gen > row gen)."""
        if self._tombstones is None:
            return tagged if keep_gen else tagged.drop("_gen")
        t = F.broadcast(self._tombstones)
        out = tagged.join(
            t,
            (tagged["doc_id"] == t["doc_id"])
            & (t["_tomb_gen"] > tagged["_gen"]),
            "left_anti",
        )
        return out if keep_gen else out.drop("_gen")

    # ------------------------------------------------- InvertedIndex API
    def field_stats(self, fld: str) -> FieldStats:
        n, sdl, omit = 0, 0, False
        for s in self.stores.values():
            if fld in s.stats:
                st = s.stats[fld]
                n += st.n_docs
                sdl += st.sum_dl
                omit = omit or st.omit_norms  # any-gen semantics (configs
                # are fixed at store creation, so this is self-documentation)
        if n == 0:
            return FieldStats(n_docs=self.n_docs, sum_dl=self.n_docs or 1)
        return FieldStats(n_docs=n, sum_dl=sdl, omit_norms=omit)

    # generation stores are PersistentIndex — the per-posting dl stream
    # capability (postings_for(with_dl=True) -> _bdl) unions through
    inline_dl = True

    def postings_for(self, fld: str, with_dl: bool = False) -> DataFrame:
        # Union the RAW block frames (field/term filters still push into
        # every generation's parquet scan) and decode ONCE: one Python
        # eval stage per query instead of one per generation (guide §4);
        # the per-branch _gen literal rides through the decode for the
        # liveness anti-join.
        from meresco_lucene_spark.index.store import decode_block_frame

        parts = [
            s.blocks.filter(F.col("field") == fld).withColumn(
                "_gen", F.lit(g)
            )
            for g, s in self.stores.items()
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return self._live(
            decode_block_frame(u, fld, with_dl, passthrough=("_gen",))
        )

    def lengths_for(self, fld: str) -> DataFrame:
        # MUST be liveness-filtered: the executor joins postings to
        # lengths by bare doc_id (executor.py _term_hits/_phrase_hits),
        # so after an upsert the id has a length row in BOTH its old and
        # new generation — an unfiltered union duplicates every hit with
        # a stale-dl score. Lucene semantics: a live doc has exactly one
        # norm and dead docs never match (delete-then-add,
        # Lucene.java:166-171).
        return self._live(self._union(lambda s: s.lengths_for(fld)))

    def term_stats_for(self, fld: str) -> DataFrame:
        # df/cf SUM across generations INCLUDING dead docs (Lucene
        # docFreq counts deleted docs until merge)
        return (
            self._union(lambda s: s.term_stats_for(fld))
            .groupBy("term")
            .agg(
                F.sum("df").cast("long").alias("df"),
                F.sum("cf").cast("long").alias("cf"),
            )
        )

    def num_docs(self) -> int:
        return self.n_docs

    def live_doc_count(self) -> int:
        """LIVE doc count (numDocs semantics: deletions excluded —
        unlike num_docs(), which keeps counting dead docs because
        pre-merge SCORING does, VERDICT r4 #6).

        O(1) on every call after the first per snapshot: a MultiGenIndex
        is an immutable snapshot (fixed committed-generation list), so
        the count is computed at most once and persisted beside the
        store keyed by the generation signature — later readers at the
        same tip, including other sessions, read it back without a job.
        When the snapshot has no tombstones at all (fresh store, or just
        after force_merge folded them away) the count is served straight
        from the generations' metadata row counts, no job ever. The
        design deliberately does NOT do sum(n_docs) - sum(tombstones):
        tombstones are written unconditionally for a batch's ids, so a
        tombstone row does not imply a killed doc and that subtraction
        over-counts on new-id adds."""
        sig = list(self.gens)
        path = os.path.join(self.root, "_live_count.json")
        if os.path.exists(path):
            try:
                with open(path) as f:
                    d = json.load(f)
                if d.get("gens") == sig:
                    return int(d["n"])
            except (ValueError, KeyError):
                pass
        n = self.n_docs if self._tombstones is None else self.forward.count()
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"gens": sig, "n": int(n)}, f)
        os.replace(tmp, path)
        return int(n)

    def fieldnames(self) -> list[str]:
        names = set()
        for s in self.stores.values():
            names.update(s.fieldnames())
        return sorted(names)

    def unpersist(self) -> None:
        pass

    # ------------------------------------------------------- merge feeds
    def live_occurrences(self) -> DataFrame:
        """(field, term, doc_id, pos, _dl) of every LIVE posting —
        decoded from blocks, never re-tokenized. Feed for force_merge.
        The per-posting dl stream rides along (_dl), so the re-encode
        needs no lengths join either."""
        def occ(s: PersistentIndex) -> DataFrame:
            parts = [
                s.postings_for(f, with_dl=True).select(
                    "field",
                    "term",
                    "doc_id",
                    F.col("_bdl").alias("_dl"),
                    F.explode("positions").alias("pos"),
                )
                for f in s.fieldnames()
            ]
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            return out

        return self._live(self._union(occ))

    def live_lengths(self) -> DataFrame:
        return self._live(
            self._union(lambda s: s.field_lengths.select(
                "field", "doc_id", "dl", "norm_dl"
            ))
        )
