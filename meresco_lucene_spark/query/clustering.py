"""Result clustering (reference O14): DBSCAN over term-frequency vectors
with generalized-Jaccard distance, cluster members ranked by PageRank
over the doc-term bipartite graph.

Faithful to the reference algorithms:
- distance = 1 - Σ min(x_i, y_i) / Σ max(x_i, y_i)
  (search/GeneralizedJaccardDistance.java:36-53)
- DBSCAN with commons-math semantics: neighbors exclude the point,
  core if |neighbors| >= minPoints, noise stays unclustered
  (MerescoClusterer.finish, :100-106)
- eps interpolated by result density:
  eps = clamp(eps0 * (totalHits - sliceSize) / clusterMoreRecords, 0, eps0)
  (search/InterpolateEpsilon.java:30-35)
- PageRank: bipartite doc-term graph, edge weight = tf; 5 iterations of
  PR0 <- (1-0.85) + 0.85 * Σ_edges neighbor.PR0/neighbor.edges * w
  with initial rank 1/node_count (search/PageRank.java:32-161,
  MerescoClusterer.java:137).

Like the reference, clustering operates on the top (stop +
clusterMoreRecords) slice — a driver-side numpy computation over at most
a few hundred docs, NOT a corpus-scale job. The term-vector fetch is the
only distributed step.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from meresco_lucene_spark.index.builder import InvertedIndex

DAMPING = 0.85
PAGERANK_ITERATIONS = 5


def interpolate_epsilon(
    total_hits: int, slice_size: int, clustering_eps: float, cluster_more_records: int
) -> float:
    if cluster_more_records <= 0:
        return clustering_eps
    eps = clustering_eps * (total_hits - slice_size) / cluster_more_records
    return max(min(eps, clustering_eps), 0.0)


def generalized_jaccard_distance_matrix(vectors: np.ndarray) -> np.ndarray:
    """Pairwise 1 - Σmin/Σmax over non-negative row vectors."""
    n = vectors.shape[0]
    out = np.zeros((n, n))
    for i in range(n):
        mins = np.minimum(vectors[i], vectors).sum(axis=1)
        maxs = np.maximum(vectors[i], vectors).sum(axis=1)
        with np.errstate(invalid="ignore", divide="ignore"):
            d = 1.0 - np.where(maxs > 0, mins / maxs, 0.0)
        out[i] = d
    return out


def dbscan(dist: np.ndarray, eps: float, min_points: int) -> list[list[int]]:
    """commons-math3 DBSCANClusterer semantics (neighbors exclude self)."""
    n = dist.shape[0]
    UNVISITED, NOISE = -2, -1
    labels = np.full(n, UNVISITED)
    cluster_id = 0
    for p in range(n):
        if labels[p] != UNVISITED:
            continue
        neighbors = [q for q in range(n) if q != p and dist[p, q] <= eps]
        if len(neighbors) < min_points:
            labels[p] = NOISE
            continue
        labels[p] = cluster_id
        seeds = list(neighbors)
        k = 0
        while k < len(seeds):
            q = seeds[k]
            k += 1
            if labels[q] == NOISE:
                labels[q] = cluster_id
            if labels[q] != UNVISITED:
                continue
            labels[q] = cluster_id
            q_neighbors = [r for r in range(n) if r != q and dist[q, r] <= eps]
            if len(q_neighbors) >= min_points:
                seeds.extend(q_neighbors)
        cluster_id += 1
    return [list(np.flatnonzero(labels == c)) for c in range(cluster_id)]


def pagerank_bipartite(
    doc_vectors: np.ndarray, iterations: int = PAGERANK_ITERATIONS
) -> tuple[np.ndarray, np.ndarray]:
    """Reference PageRank over the doc-term bipartite graph.

    doc_vectors: (n_docs, n_terms) tf matrix; an edge exists where tf>0
    with weight tf. Returns (doc_ranks, term_ranks)."""
    n_docs, n_terms = doc_vectors.shape
    w = doc_vectors.astype(float)
    has_edge = w > 0
    # node degree = number of incident edges (countEdge per edge)
    doc_deg = has_edge.sum(axis=1).astype(float)
    term_deg = has_edge.sum(axis=0).astype(float)
    term_active = term_deg > 0
    node_count = n_docs + int(term_active.sum())
    pr_docs = np.full(n_docs, 1.0 / node_count)
    pr_terms = np.where(term_active, 1.0 / node_count, 0.0)
    for _ in range(iterations):
        # propagate: doc receives from terms, term receives from docs
        with np.errstate(divide="ignore", invalid="ignore"):
            from_terms = w @ np.where(term_deg > 0, pr_terms / term_deg, 0.0)
            from_docs = w.T @ np.where(doc_deg > 0, pr_docs / doc_deg, 0.0)
        pr_docs = (1.0 - DAMPING) + DAMPING * from_terms
        pr_terms = np.where(term_active, (1.0 - DAMPING) + DAMPING * from_docs, 0.0)
    return pr_docs, pr_terms


@dataclass
class DocScore:
    doc_id: int
    score: float


@dataclass
class TermScore:
    term: str
    score: float


@dataclass
class MerescoCluster:
    topDocs: list[DocScore]
    topTerms: list[TermScore]


def cluster_top_docs(
    index: InvertedIndex,
    hits_df: DataFrame,
    field: str,
    stop: int = 10,
    clustering_eps: float = 0.4,
    min_points: int = 1,
    cluster_more_records: int = 100,
    total_hits: int | None = None,
) -> list[MerescoCluster]:
    """Cluster the top (stop + clusterMoreRecords) hits by their `field`
    term vectors. Returns clusters with PageRank-ranked docs + terms."""
    slice_size = stop + cluster_more_records
    top = (
        hits_df.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(slice_size)
        .select("doc_id")
    )
    rows = (
        index.postings_for(field)
        .join(top, "doc_id", "left_semi")
        .select("doc_id", "term", "tf")
        .collect()
    )
    if not rows:
        return []
    doc_ids = sorted({r["doc_id"] for r in rows})
    terms = sorted({r["term"] for r in rows})
    doc_pos = {d: i for i, d in enumerate(doc_ids)}
    term_pos = {t: i for i, t in enumerate(terms)}
    vectors = np.zeros((len(doc_ids), len(terms)))
    for r in rows:
        vectors[doc_pos[r["doc_id"]], term_pos[r["term"]]] = r["tf"]

    n_hits = total_hits if total_hits is not None else hits_df.count()
    eps = interpolate_epsilon(
        n_hits, slice_size, clustering_eps, cluster_more_records
    )
    dist = generalized_jaccard_distance_matrix(vectors)
    clusters = dbscan(dist, eps, min_points)

    out: list[MerescoCluster] = []
    for members in clusters:
        sub = vectors[members]
        pr_docs, pr_terms = pagerank_bipartite(sub)
        doc_order = np.argsort(-pr_docs, kind="stable")
        term_order = np.argsort(-pr_terms, kind="stable")
        out.append(
            MerescoCluster(
                topDocs=[
                    DocScore(int(doc_ids[members[i]]), float(pr_docs[i]))
                    for i in doc_order
                ],
                topTerms=[
                    TermScore(terms[j], float(pr_terms[j]))
                    for j in term_order
                    if pr_terms[j] > 0
                ],
            )
        )
    return out
