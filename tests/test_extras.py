"""Training-data pipeline extras: dedup recall properties, ANN recall,
multimodal plumbing shapes."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from meresco_lucene_spark.extras import ann, dedup, multimodal

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").filter(
        F.col("doc_id") < 120
    ).persist()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


def test_exact_dup_of_constructed_duplicates(spark):
    pdf = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "text": ["same text", "same text", "other", "same text"]}
    )
    df = spark.createDataFrame(pdf)
    groups = dedup.exact_duplicate_groups(df, "doc_id", "text").collect()
    assert len(groups) == 1
    assert groups[0]["n_docs"] == 3
    assert groups[0]["keep_id"] == 1
    assert groups[0]["doc_ids"] == [1, 2, 4]


def test_minhash_lsh_recall_vs_exact(docs):
    """LSH candidates must contain every pair with high exact Jaccard
    (16 bands x 4 rows => pairs with J>=0.5 are found w.h.p.; on this
    corpus the miss probability per pair is (1-J^4)^16 < 2% at J=0.5,
    so require full recall at J>=0.6 for determinism margin)."""
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=5, threshold=0.6).collect()
    }
    found = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_near_duplicates(
            docs, "doc_id", "text", n=5, n_hashes=64, bands=16, threshold=0.6
        ).collect()
    }
    assert exact == found  # verify step re-computes exact jaccard


def test_minhash_pipeline_no_false_positives(docs):
    """Verify stage guarantees: every reported pair really has
    jaccard >= threshold (LSH may propose junk; verify must kill it)."""
    out = dedup.minhash_near_duplicates(
        docs, "doc_id", "text", n=5, threshold=0.3
    ).collect()
    for r in out:
        assert r["jaccard"] >= 0.3


def test_embedding_near_dup_recall_vs_exact(spark, emb):
    """LSH-bucketed embedding near-dup must equal exact all-pairs cosine
    >= threshold on a corpus with planted near-copies (near-identical
    vectors agree on every hyperplane sign w.h.p.; threshold 0.9 sits
    far above this corpus's real-pair max of ~0.44)."""
    import numpy as np

    base = emb.filter(F.col("vec_id") < 80).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    plant = base.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1000).alias("vec_id"),
        F.transform("v", lambda x: x + F.lit(0.001)).alias("v"),
    )
    corpus = base.unionByName(plant).persist()
    rows = {r["vec_id"]: np.array(r["v"]) for r in corpus.collect()}
    ids = sorted(rows)
    exact = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            va, vb = rows[a], rows[b]
            c = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
            if c >= 0.9:
                exact.add((a, b))
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_near_duplicates(corpus, "vec_id", "v", threshold=0.9).collect()
    }
    assert got == exact and len(exact) == 5
    # verified pairs carry the true cosine (verify is exact, not approximate)
    for r in dedup.embedding_near_duplicates(corpus, "vec_id", "v", threshold=0.9).collect():
        assert r["cosine"] >= 0.9


def test_embedding_near_dup_bucket_cap(spark):
    """max_bucket drops pathological buckets: 50 identical zero-adjacent
    vectors all land in the same buckets; with the cap no pair survives,
    without it the quadratic bucket join would report all of them."""
    import numpy as np

    rng = np.random.default_rng(3)
    v = rng.standard_normal(8).tolist()
    pdf = pd.DataFrame({"vec_id": range(50), "v": [v] * 50})
    df = spark.createDataFrame(pdf)
    uncapped = dedup.embedding_near_duplicates(df, "vec_id", "v", threshold=0.9)
    assert uncapped.count() == 50 * 49 // 2
    capped = dedup.embedding_near_duplicates(
        df, "vec_id", "v", threshold=0.9, max_bucket=10
    )
    assert capped.count() == 0


def test_simhash_identical_docs_collide(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "alpha beta gamma delta epsilon zeta",
                "alpha beta gamma delta epsilon zeta",
                "totally different content words here",
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash_signatures(df, "doc_id", "text").collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]
    pairs = dedup.simhash_near_duplicates(df, "doc_id", "text", max_hamming=3).collect()
    assert [(p["id_a"], p["id_b"], p["hamming"]) for p in pairs] == [(1, 2, 0)]


def test_simhash_band_recall_at_high_hamming(docs):
    """Pigeonhole recall: with n_bands = max_hamming + 1, EVERY pair at
    hamming <= max_hamming must be a candidate. Brute-force the exact
    hamming pairs from the signatures and compare (the old fixed-4-band
    split only guaranteed hamming <= 3 and silently missed 4..8)."""
    sub = docs.filter(F.col("doc_id") < 80)
    sigs = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_signatures(sub, "doc_id", "text").collect()
    }
    ids = sorted(sigs)
    expect = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")
            if h <= 8:
                expect.add((a, b))
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.simhash_near_duplicates(sub, "doc_id", "text", max_hamming=8).collect()
    }
    assert got == expect


def test_minhash_skew_boilerplate_shingle(spark):
    """One boilerplate shingle shared by 10k docs: the verify join must
    be candidate-driven (cands ⋈ shingles per side), never the raw
    shingle self-join — the old join order exploded to ~10^8 pair rows
    on this input. Also: identical output with/without the max_df cap
    when the capped shingle only removes non-discriminating overlap."""
    n = 10_000
    pdf = pd.DataFrame(
        {
            "doc_id": range(n),
            "text": [
                "common boiler plate header tokens "
                + " ".join(f"u{i}_{j}" for j in range(16))
                for i in range(n)
            ],
        }
    )
    df = spark.createDataFrame(pdf).repartition(8)
    out = dedup.minhash_near_duplicates(
        df, "doc_id", "text", n=5, threshold=0.5, max_df=100
    ).collect()
    assert out == []  # no true near-dups; completes without quadratic stage


def test_minhash_max_df_threaded(docs):
    """max_df reaches the verify shingles: with an absurdly low cap every
    shingle is dropped, so no pair can verify."""
    out = dedup.minhash_near_duplicates(
        docs, "doc_id", "text", n=5, threshold=0.1, max_df=0
    ).collect()
    assert out == []


def test_ann_lsh_recall(emb):
    """LSH top-10 must overlap the exact top-10 substantially (multiprobe
    over 12 planes); assert >= 5 of 10 and that every LSH result's cosine
    is a real cosine (subset of full ranking)."""
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    rest = emb.filter(F.col("vec_id") != 0)
    exact = [r["vec_id"] for r in ann.cosine_topk(rest, "embedding", qvec, 10).collect()]
    approx = [r["vec_id"] for r in ann.lsh_cosine_topk(rest, "embedding", qvec, 10).collect()]
    assert len(set(exact) & set(approx)) >= 5


def test_ann_materialized_index_matches_on_the_fly(spark, emb, tmp_path):
    """The write-time bucket index must be candidate-identical to the
    on-the-fly OR-filter path (same planes/seed), and its probe scan must
    be partition-pruned — no full scan of the index."""
    import io
    from contextlib import redirect_stdout

    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    rest = emb.filter(F.col("vec_id") != 0)
    path = str(tmp_path / "lsh_idx")
    ann.write_lsh_index(emb, path)

    a = [(r["vec_id"], round(r["cosine"], 6))
         for r in ann.lsh_index_topk(spark, path, rest, qvec, 10).collect()]
    b = [(r["vec_id"], round(r["cosine"], 6))
         for r in ann.lsh_cosine_topk(rest, "embedding", qvec, 10).collect()]
    assert a == b

    cand = ann.lsh_index_candidates(spark, path, qvec)
    buf = io.StringIO()
    with redirect_stdout(buf):
        cand.explain("formatted")
    plan = buf.getvalue()
    # probe condition references only partition columns -> partition pruning
    assert "PartitionFilters" in plan
    pf_line = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "table" in pf_line and "bucket" in pf_line


def test_ivf_index_recall_and_pruning(spark, emb, tmp_path):
    """IVF: full probe (nprobe = n_centroids) is identical to exact
    brute-force top-k; partial probe keeps the true top-1 (it lives in
    the query's own list); the probe scan is partition-pruned to the
    probed lists."""
    import io
    from contextlib import redirect_stdout

    path = str(tmp_path / "ivf")
    meta = ann.write_ivf_index(emb, path, n_centroids=8, seed=11)
    assert meta["n_centroids"] == 8
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 7).collect()[0]["embedding"]]

    exact = [(r["vec_id"], round(r["cosine"], 6))
             for r in ann.cosine_topk(emb, "embedding", qvec, 10).collect()]
    full = [(r["vec_id"], round(r["cosine"], 6))
            for r in ann.ivf_topk(spark, path, qvec, 10, nprobe=8).collect()]
    assert full == exact

    partial = ann.ivf_topk(spark, path, qvec, 10, nprobe=2)
    assert partial.collect()[0]["vec_id"] == 7  # self lands in own list

    buf = io.StringIO()
    with redirect_stdout(buf):
        partial.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    pf_line = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "list" in pf_line


def test_ivf_train_deterministic(emb):
    c1 = ann.train_centroids(emb, n_centroids=8, seed=11)
    c2 = ann.train_centroids(emb, n_centroids=8, seed=11)
    assert (c1 == c2).all()
    # normalized
    import numpy as np

    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_ann_exact_self_similarity(emb):
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    top = ann.cosine_topk(emb, "embedding", qvec, 1).collect()
    assert top[0]["vec_id"] == 0
    assert abs(top[0]["cosine"] - 1.0) < 1e-9


def test_multimodal_pipeline_shapes(spark):
    media = multimodal.synthesize_media(spark, 30)
    assert media.count() == 30
    feats = multimodal.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r["features"]) == multimodal.FEATURE_DIM for r in rows)
    # deterministic: same media id -> same features
    again = {r["media_id"]: r["features"] for r in multimodal.extract_features(media).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["features"]


def test_multimodal_frame_plan(spark):
    media = multimodal.synthesize_media(spark, 30)
    plan = multimodal.frame_sample_plan(media, every_ms=1000)
    rows = plan.collect()
    assert all(r["frame_ts_ms"] % 1000 == 0 for r in rows)
    kinds = {r["kind"] for r in media.join(plan, "media_id").select("kind").collect()}
    assert kinds == {"video"}


def test_multimodal_resize_plan(spark):
    media = multimodal.synthesize_media(spark, 30)
    out = multimodal.resize_metadata(media, max_side=100).collect()
    for r in out:
        assert max(r["target_w"], r["target_h"]) <= 100
    # aspect preserved within rounding
    for r in out:
        ar_in = r["width"] / r["height"]
        ar_out = r["target_w"] / r["target_h"]
        assert abs(ar_in - ar_out) < 0.1


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image_real(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        multimodal.LibraryDecoder().decode("image", "image/png", b"\x89PNG")


def test_multimodal_pluggable_decoder(spark):
    """The decode step is injected: a pure-numpy fake decoder drives the
    same pipeline (schema/batching unchanged), produces deterministic
    decoded-array features distinct from the default stub's."""
    media = multimodal.synthesize_media(spark, 12)
    default = {r["media_id"]: r["features"] for r in multimodal.extract_features(media).collect()}
    decoded = {
        r["media_id"]: r["features"]
        for r in multimodal.extract_features(media, decoder=multimodal.FakeDecoder()).collect()
    }
    assert set(decoded) == set(default)
    assert all(len(v) == multimodal.FEATURE_DIM for v in decoded.values())
    assert any(decoded[k] != default[k] for k in decoded)  # decoder actually used
    again = {
        r["media_id"]: r["features"]
        for r in multimodal.extract_features(media, decoder=multimodal.FakeDecoder()).collect()
    }
    assert again == decoded
    # the fake decode itself: payload bytes tiled into an 8x8 [0,1] frame
    frame = multimodal.FakeDecoder().decode("image", "image/png", b"\x00\xff" * 40)
    assert frame.shape == (8, 8) and frame.min() >= 0.0 and frame.max() <= 1.0


def test_connected_components_random_graphs_vs_union_find(spark):
    """Star contraction (large-star/small-star) must label every node
    with its component's min id — checked against a pure-Python
    union-find on seeded random graphs, including long chains (worst
    case for naive min-propagation: convergence must be O(log n), not
    O(diameter), but LABELS must still be exact)."""
    import random

    def uf_components(n_nodes, edges):
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        labels = {}
        for v in {x for e in edges for x in e}:
            r = find(v)
            while parent[r] != r:
                r = parent[r]
            labels[v] = r
        # normalize: label = min node id in the component
        comp_min = {}
        for v, r in labels.items():
            comp_min[r] = min(comp_min.get(r, v), v)
        return {v: comp_min[r] for v, r in labels.items()}

    cases = []
    for seed, n_nodes, n_edges in [(3, 40, 25), (7, 60, 80), (13, 30, 12)]:
        rng = random.Random(seed)
        cases.append(
            [(rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)]
        )
    # a 64-node pure chain: diameter 63, must converge in O(log n) rounds
    cases.append([(i, i + 1) for i in range(63)])

    for edges in cases:
        edges = [(a, b) for a, b in edges if a != b]
        pdf = pd.DataFrame(edges, columns=["id_a", "id_b"])
        got = {
            r["doc_id"]: r["component"]
            for r in dedup.connected_components(
                spark.createDataFrame(pdf)
            ).collect()
        }
        want = uf_components(max(max(e) for e in edges) + 1, edges)
        assert got == want
