"""SGNS skip-gram trainer over walk corpora
(``kernels/embeddings.py``): loss trends strongly down on a fixed
corpus (small upticks allowed — negatives re-draw per round),
training is bitwise deterministic, and on an SBM fixture the trained
embeddings separate the planted blocks far better than the random
init."""

import numpy as np
import pytest

from igraph_ray.api import build_graph
from igraph_ray.kernels.embeddings import skipgram_embeddings
from igraph_ray.kernels.walks import random_walks
from igraph_ray.sources.generators import sbm_edges


def _sbm_graph(tmp_dir, sizes=(25, 25, 25, 25), p_in=0.35, p_out=0.01):
    k = len(sizes)
    pref = [
        [p_in if i == j else p_out for j in range(k)] for i in range(k)
    ]
    edges = sbm_edges(list(sizes), pref, seed=3)

    def with_weight(batch):
        import pyarrow as pa

        return batch.append_column(
            "weight",
            pa.array(np.ones(batch.num_rows, np.float64)),
        )

    edges = edges.map_batches(
        with_weight, batch_format="pyarrow", zero_copy_batch=True
    )
    return build_graph(
        edges, f"{tmp_dir}/g", num_parts=3, symmetrize=True
    )


def _block_margin(W, sizes):
    """Mean intra-block cosine minus mean inter-block cosine."""
    n = sum(sizes)
    labels = np.repeat(np.arange(len(sizes)), sizes)
    norms = np.linalg.norm(W, axis=1, keepdims=True)
    U = W / np.maximum(norms, 1e-12)
    S = U @ U.T
    same = labels[:, None] == labels[None, :]
    off = ~np.eye(n, dtype=bool)
    return float(S[same & off].mean() - S[~same].mean())


def test_loss_decreases_and_deterministic(ray_session, tmp_path):
    graph = _sbm_graph(str(tmp_path), sizes=(15, 15), p_in=0.5, p_out=0.05)
    walks = random_walks(graph, starts=np.arange(30), length=8, seed=1)
    res = skipgram_embeddings(
        walks, num_vertices=30, dim=8, window=3, rounds=15, seed=0
    )
    assert len(res.loss_history) == 15
    # strong overall decrease; per-round upticks bounded (negatives
    # re-draw each round, so the objective is not identical per round)
    assert res.loss_history[-1] < 0.85 * res.loss_history[0]
    for a, b in zip(res.loss_history, res.loss_history[1:]):
        assert b < a * 1.10

    res2 = skipgram_embeddings(
        walks, num_vertices=30, dim=8, window=3, rounds=15, seed=0
    )
    W1 = np.stack(res.embeddings.column("embedding").to_numpy(False))
    W2 = np.stack(res2.embeddings.column("embedding").to_numpy(False))
    assert np.array_equal(W1, W2)  # bitwise-reproducible rounds


def test_sbm_block_recovery_beats_random_init(ray_session, tmp_path):
    sizes = (25, 25, 25, 25)
    graph = _sbm_graph(str(tmp_path), sizes=sizes)
    n = sum(sizes)
    walks = random_walks(graph, starts=np.arange(n), length=10, seed=7)
    res = skipgram_embeddings(
        walks, num_vertices=n, dim=16, window=4, rounds=60, seed=0
    )
    W = np.stack(res.embeddings.column("embedding").to_numpy(False))
    # the random init the trainer starts from (same rng stream)
    rng = np.random.Generator(np.random.PCG64(0))
    W0 = (rng.random((n, 16)) - 0.5) / 16
    m_trained = _block_margin(W, sizes)
    m_init = _block_margin(W0, sizes)
    assert m_trained > m_init + 0.15, (m_trained, m_init)
    assert m_trained > 0.15, m_trained


def test_sharded_loss_decreases_and_deterministic(ray_session, tmp_path):
    """Past-cap path: grid-cell sharded trainer (forced multi-shard
    via tiny shard_rows) — loss decreases, runs bitwise reproduce."""
    from igraph_ray.kernels.embeddings import skipgram_embeddings_sharded

    graph = _sbm_graph(str(tmp_path), sizes=(15, 15), p_in=0.5, p_out=0.05)
    walks = random_walks(graph, starts=np.arange(30), length=8, seed=1)
    res = skipgram_embeddings_sharded(
        walks,
        num_vertices=30,
        dim=8,
        window=3,
        rounds=15,
        seed=0,
        shard_rows=10,  # -> 3 shards, 9 grid cells
    )
    assert len(res.loss_history) == 15
    assert res.loss_history[-1] < 0.85 * res.loss_history[0]
    res2 = skipgram_embeddings_sharded(
        walks,
        num_vertices=30,
        dim=8,
        window=3,
        rounds=15,
        seed=0,
        shard_rows=10,
    )
    W1 = np.stack(res.embeddings.column("embedding").to_numpy(False))
    W2 = np.stack(res2.embeddings.column("embedding").to_numpy(False))
    assert np.array_equal(W1, W2)


def test_sharded_sbm_block_recovery(ray_session, tmp_path):
    from igraph_ray.kernels.embeddings import skipgram_embeddings_sharded

    sizes = (25, 25, 25, 25)
    graph = _sbm_graph(str(tmp_path), sizes=sizes)
    n = sum(sizes)
    walks = random_walks(graph, starts=np.arange(n), length=10, seed=7)
    res = skipgram_embeddings_sharded(
        walks,
        num_vertices=n,
        dim=16,
        window=4,
        rounds=60,
        seed=0,
        shard_rows=30,  # -> 4 shards
    )
    W = np.stack(res.embeddings.column("embedding").to_numpy(False))
    rng = np.random.Generator(np.random.PCG64(0))
    W0 = (rng.random((n, 16)) - 0.5) / 16
    m_trained = _block_margin(W, sizes)
    m_init = _block_margin(W0, sizes)
    assert m_trained > m_init + 0.15, (m_trained, m_init)
    assert m_trained > 0.15, m_trained


def test_past_cap_routes_to_sharded(ray_session, tmp_path, monkeypatch):
    """skipgram_embeddings no longer raises past the broadcast cap —
    it routes to the sharded trainer."""
    from igraph_ray.kernels import embeddings as emb

    graph = _sbm_graph(str(tmp_path), sizes=(15, 15), p_in=0.5, p_out=0.05)
    walks = random_walks(graph, starts=np.arange(30), length=6, seed=1)
    monkeypatch.setattr(emb, "BROADCAST_MAX_VOCAB", 10)
    res = skipgram_embeddings(
        walks, num_vertices=30, dim=8, window=2, rounds=3, seed=0
    )
    assert len(res.loss_history) == 3
    assert res.embeddings.num_rows == 30
