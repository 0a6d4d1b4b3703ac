"""SemDeDup (functions/semdedup.py): the per-cluster greedy keeper
rule is pinned by a pure-numpy brute-force replay given the same
assignments; planted exact duplicates must collapse to one kept
representative; the pipeline must be deterministic across block
layouts."""

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.functions.semdedup import (
    _dedup_cluster,
    assign_clusters,
    semdedup,
)
from igraph_ray.functions.similarity import _normalize
from tests.util import ds_to_table


def _to_ds(vecs, blocks=4):
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float32())
                ),
            }
        )
    ).repartition(num_blocks=blocks)


def _brute_cluster(ids, vecs, cent_sim, threshold):
    """Sequential replay of the documented rule: order by
    (cent_sim DESC, id ASC); drop iff max cosine vs an earlier KEPT
    member >= threshold."""
    order = sorted(range(len(ids)), key=lambda i: (-cent_sim[i], ids[i]))
    kept_idx, keep = [], {}
    for i in order:
        m = max(
            (float(vecs[i] @ vecs[j]) for j in kept_idx), default=0.0
        )
        if m >= threshold:
            keep[ids[i]] = False
        else:
            keep[ids[i]] = True
            kept_idx.append(i)
    return keep


def test_dedup_cluster_matches_brute(ray_session):
    rng = np.random.default_rng(3)
    vecs = _normalize(rng.standard_normal((60, 8)))
    # plant duplicate chains: rows 10/11/12 near-identical, 20/21 too
    vecs[11] = vecs[10]
    vecs[12] = _normalize((vecs[10] + 0.01 * rng.standard_normal(8))[None])[0]
    vecs[21] = vecs[20]
    ids = np.arange(60, dtype=np.int64)
    cent = _normalize(vecs.mean(axis=0)[None])[0]
    cs = vecs @ cent
    keep, max_sim = _dedup_cluster(ids, vecs, cs, 0.9, cluster_cap=64)
    brute = _brute_cluster(ids, vecs, cs, 0.9)
    assert {int(i): bool(k) for i, k in zip(ids, keep)} == brute


def test_dedup_cluster_chunked_equals_unchunked():
    rng = np.random.default_rng(7)
    vecs = _normalize(rng.standard_normal((97, 12)))
    vecs[50] = vecs[5]
    vecs[51] = vecs[5]
    ids = np.arange(97, dtype=np.int64)
    cs = vecs @ _normalize(vecs.mean(axis=0)[None])[0]
    k1, m1 = _dedup_cluster(ids, vecs, cs, 0.85, cluster_cap=1024)
    k2, m2 = _dedup_cluster(ids, vecs, cs, 0.85, cluster_cap=16)
    assert (k1 == k2).all()
    assert np.allclose(m1, m2)


def test_semdedup_collapses_planted_duplicates(ray_session):
    rng = np.random.default_rng(11)
    base = rng.standard_normal((40, 16))
    # 5 exact copies of row 0 and 3 of row 7
    vecs = np.concatenate([base, np.tile(base[0], (5, 1)),
                           np.tile(base[7], (3, 1))])
    out = ds_to_table(semdedup(_to_ds(vecs), k=4, threshold=0.999))
    keep = dict(
        zip(out.column("vec_id").to_pylist(), out.column("keep").to_pylist())
    )
    assert len(keep) == len(vecs)
    grp0 = [0, 40, 41, 42, 43, 44]
    grp7 = [7, 45, 46, 47]
    assert sum(keep[i] for i in grp0) == 1
    assert sum(keep[i] for i in grp7) == 1
    # non-duplicated rows overwhelmingly survive
    others = [i for i in range(len(vecs)) if i not in grp0 + grp7]
    assert sum(keep[i] for i in others) >= len(others) - 2


def test_semdedup_deterministic_across_layouts(ray_session):
    rng = np.random.default_rng(23)
    vecs = rng.standard_normal((120, 8))
    vecs[100:110] = vecs[:10]
    a = ds_to_table(semdedup(_to_ds(vecs, blocks=2), k=3, threshold=0.98))
    b = ds_to_table(semdedup(_to_ds(vecs, blocks=9), k=3, threshold=0.98))
    key = lambda t: sorted(
        zip(
            t.column("vec_id").to_pylist(),
            t.column("cluster").to_pylist(),
            t.column("keep").to_pylist(),
        )
    )
    assert key(a) == key(b)


def test_assign_clusters_argmax(ray_session):
    rng = np.random.default_rng(5)
    cents = _normalize(rng.standard_normal((4, 8)))
    vecs = _normalize(rng.standard_normal((30, 8)))
    out = ds_to_table(assign_clusters(_to_ds(vecs), cents))
    got = dict(
        zip(out.column("vec_id").to_pylist(), out.column("cluster").to_pylist())
    )
    # replay the float32 storage roundtrip the dataset applies
    v64 = _normalize(vecs.astype(np.float32).astype(np.float64))
    sims = v64 @ cents.T
    for i in range(30):
        assert got[i] == int(np.argmax(sims[i]))
