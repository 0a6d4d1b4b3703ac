"""SemDeDup — semantic deduplication via embedding clustering.

Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication" (arXiv:2303.09540): cluster the
corpus embeddings with (spherical) k-means, then inside each cluster
mark as duplicates all items whose cosine similarity to an
earlier-ranked cluster member exceeds a threshold, keeping exactly one
representative per semantic-duplicate group.

Distributed shape (Ray-Data-first):

1. ``kmeans(spherical=True)`` — the existing one-pass-per-iteration
   Lloyd's with broadcast centroids (`similarity.py::kmeans`), k sized
   to the corpus (``k ≈ n / target_cluster_size``) so per-cluster work
   stays bounded as the corpus grows.
2. One ``map_batches`` assignment pass (centroid matrix broadcast via
   ``ray.put`` once, argmax per batch).
3. ``groupby("cluster").map_groups`` — per cluster, order members by
   (cosine-to-centroid DESC, id ASC) and mark item *i* a duplicate iff
   its max cosine to any earlier member ≥ ``threshold``.  The kept
   representative is the member closest to the centroid (deterministic;
   the paper's "keep low-centroid-similarity" variant is a one-line
   flip of the sort order).  Work is one gram matrix per cluster —
   O(c²·d) bounded by the cluster size, never all-pairs over the
   corpus.  Clusters above ``cluster_cap`` are processed in
   ``cluster_cap``-sized chunks against the running kept set (chunked
   matmuls — still vectorized, memory bounded O(cap²)).

Scale: the only shuffle is the groupby on cluster id; k grows linearly
with the corpus so expected cluster size is a constant, and the cap
bounds the worst case.  Centroids are broadcast once per pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.functions.similarity import (
    _batch_matrix,
    _normalize,
    kmeans,
)

__all__ = ["semdedup", "assign_clusters"]


def assign_clusters(
    ds: ray.data.Dataset,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """One map pass: nearest (cosine) centroid per vector.

    Emits ``(id_col, cluster:int64, cent_sim:float64)``; the centroid
    matrix ships once via ``ray.put`` and is read zero-copy in every
    task (broadcast small side — never re-serialized per batch).
    """
    cref = ray.put(_normalize(np.ascontiguousarray(centroids, np.float64)))

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(cref)
        e = _normalize(_batch_matrix(batch, vec_col).astype(np.float64))
        sims = e @ cents.T
        cid = np.argmax(sims, axis=1)
        return pa.table(
            {
                id_col: batch.column(id_col),
                vec_col: batch.column(vec_col),
                "cluster": pa.array(cid.astype(np.int64)),
                "cent_sim": pa.array(sims[np.arange(len(cid)), cid]),
            }
        )

    return ds.select_columns([id_col, vec_col]).map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )


def _dedup_cluster(
    ids: np.ndarray,
    vecs: np.ndarray,
    cent_sim: np.ndarray,
    threshold: float,
    cluster_cap: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Greedy first-keeper scan inside one cluster.

    Members ordered by (cent_sim DESC, id ASC); member i is a duplicate
    iff max cosine to an earlier KEPT member ≥ threshold (the paper
    computes max-to-any-earlier; restricting to kept members is the
    transitive-group variant that keeps exactly one representative per
    duplicate chain — documented deviation, deterministic).

    Returns (keep mask, max_sim to earlier kept) in input row order.
    """
    n = len(ids)
    order = np.lexsort((ids, -cent_sim))
    v = vecs[order]
    keep_sorted = np.ones(n, bool)
    max_sim_sorted = np.zeros(n, np.float64)
    # chunked scan: gram of chunk vs all kept-so-far + within-chunk
    for lo in range(0, n, cluster_cap):
        hi = min(lo + cluster_cap, n)
        chunk = v[lo:hi]
        if lo:
            kept_prior = v[:lo][keep_sorted[:lo]]
            prior_max = (
                (chunk @ kept_prior.T).max(axis=1)
                if len(kept_prior)
                else np.zeros(hi - lo)
            )
        else:
            prior_max = np.zeros(hi - lo)
        gram = chunk @ chunk.T
        for j in range(hi - lo):
            m = prior_max[j]
            if j:
                kept_in_chunk = keep_sorted[lo : lo + j]
                if kept_in_chunk.any():
                    m = max(m, gram[j, :j][kept_in_chunk].max())
            max_sim_sorted[lo + j] = m
            if m >= threshold:
                keep_sorted[lo + j] = False
    keep = np.empty(n, bool)
    max_sim = np.empty(n, np.float64)
    keep[order] = keep_sorted
    max_sim[order] = max_sim_sorted
    return keep, max_sim


def semdedup(
    ds: ray.data.Dataset,
    k: int | None = None,
    threshold: float = 0.95,
    kmeans_iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_cap: int = 8192,
    target_cluster_size: int = 1024,
) -> ray.data.Dataset:
    """Full SemDeDup pipeline → ``(id, cluster, cent_sim, max_sim,
    keep)`` per input row.

    ``k`` defaults to ``max(2, n // target_cluster_size)`` so expected
    per-cluster work is constant in corpus size.  ``keep`` marks the
    retained representative set; ``max_sim`` is the evidence column
    (max cosine to an earlier kept member of the same cluster).
    """
    if k is None:
        n = ds.count()
        k = int(max(2, min(n // target_cluster_size + 1, 65536)))
    cents, _inertia = kmeans(
        ds, k, iters=kmeans_iters, id_col=id_col, vec_col=vec_col,
        spherical=True,
    )
    assigned = assign_clusters(ds, cents, id_col=id_col, vec_col=vec_col)

    def per_cluster(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        cs = group.column("cent_sim").to_numpy(zero_copy_only=False)
        vecs = _normalize(_batch_matrix(group, vec_col).astype(np.float64))
        keep, max_sim = _dedup_cluster(ids, vecs, cs, threshold, cluster_cap)
        cid = group.column("cluster").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(ids),
                "cluster": pa.array(cid.astype(np.int64)),
                "cent_sim": pa.array(cs),
                "max_sim": pa.array(max_sim),
                "keep": pa.array(keep),
            }
        )

    return assigned.groupby("cluster").map_groups(
        per_cluster, batch_format="pyarrow"
    )
