"""IVF ANN + distributed k-means (functions/similarity.py): the
nprobe == nlist setting scores every list, so IVF must EXACTLY equal
the brute-force oracle; partial probing is pinned by recall on
clustered data; k-means is pinned by planted-centroid recovery."""

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.functions.similarity import (
    brute_force_topk,
    ivf_topk,
    kmeans,
)
from tests.util import ds_to_table


def _clustered(nc=6, per=80, dim=16, seed=11):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((nc, dim)) * 6.0
    vecs = np.concatenate(
        [centers[i] + 0.3 * rng.standard_normal((per, dim)) for i in range(nc)]
    )
    return centers, vecs


def _to_ds(vecs):
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float32())
                ),
            }
        )
    ).repartition(num_blocks=4)


def test_kmeans_recovers_planted_centroids(ray_session):
    centers, vecs = _clustered()
    cents, inertia = kmeans(_to_ds(vecs), k=6, iters=25, tol=1e-9)
    # every planted center has a learned centroid within the blob
    # radius; float32 storage → loose-ish tolerance
    for c in centers:
        d = np.linalg.norm(cents - c, axis=1).min()
        assert d < 1.0, (c, d)
    assert np.isfinite(inertia) and inertia > 0


def test_ivf_full_probe_equals_brute_force(ray_session):
    _, vecs = _clustered(nc=4, per=50)
    ds = _to_ds(vecs)
    queries = vecs[[3, 77, 150]]
    exact = ds_to_table(brute_force_topk(ds, queries, k=5))
    approx = ds_to_table(ivf_topk(ds, queries, k=5, nlist=4, nprobe=4))
    key = lambda t: sorted(
        zip(
            t.column("query_id").to_pylist(),
            t.column("vec_id").to_pylist(),
            [round(s, 5) for s in t.column("score").to_pylist()],
        )
    )
    assert key(exact) == key(approx)


def test_ivf_partial_probe_recall(ray_session):
    _, vecs = _clustered(nc=8, per=60, seed=5)
    ds = _to_ds(vecs)
    rng = np.random.default_rng(9)
    queries = vecs[rng.choice(len(vecs), 10, replace=False)]
    exact = ds_to_table(brute_force_topk(ds, queries, k=10))
    approx = ds_to_table(ivf_topk(ds, queries, k=10, nlist=8, nprobe=3))
    ex = {}
    for q, v in zip(
        exact.column("query_id").to_pylist(),
        exact.column("vec_id").to_pylist(),
    ):
        ex.setdefault(q, set()).add(v)
    ap = {}
    for q, v in zip(
        approx.column("query_id").to_pylist(),
        approx.column("vec_id").to_pylist(),
    ):
        ap.setdefault(q, set()).add(v)
    hits = sum(len(ex[q] & ap.get(q, set())) for q in ex)
    total = sum(len(s) for s in ex.values())
    assert hits / total >= 0.7, hits / total


def test_pq_topk_recall_and_determinism():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from igraph_ray.functions.similarity import brute_force_topk, pq_topk

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((1500, 16))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float32())
                ),
            }
        )
    ).repartition(num_blocks=4)
    q = vecs[[5, 100, 777]]

    def collect(out):
        got = {}
        for r in out.iter_rows():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        return got

    exact = collect(brute_force_topk(ds, q, k=10))
    got = collect(pq_topk(ds, q, k=10, m=8, nbits=6))
    recalls = [len(exact[i] & got[i]) / 10 for i in exact]
    # 48-bit codes on 16-dim gaussians: recall well above chance
    # (chance ~ 10/1500); pin a conservative floor
    assert sum(recalls) / len(recalls) >= 0.5, recalls
    # deterministic: same training + scoring → identical result sets
    got2 = collect(pq_topk(ds, q, k=10, m=8, nbits=6))
    assert got == got2
