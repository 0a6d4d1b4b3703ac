"""K3 tests: exact communities on unambiguous fixtures, plus the
reference's fixed-point property (label_propagation.py:297-307) on
ambiguous ones — SURVEY.md §2.3(1) documents why bitwise equality with
the seeded async reference is not the contract."""

import collections

import networkx as nx

from igraph_ray.kernels import label_propagation
from tests.util import graph_from_nx, state_dict


def _communities(labels: dict[int, int]) -> list[set[int]]:
    groups = collections.defaultdict(set)
    for v, l in labels.items():
        groups[l].add(v)
    return sorted(groups.values(), key=lambda s: min(s))


def test_disjoint_cliques_exact(tmp_graph_dir):
    G = nx.Graph()
    cliques = []
    for c in range(4):
        nodes = list(range(c * 5, c * 5 + 5))
        cliques.append(set(nodes))
        for i in nodes:
            for j in nodes:
                if i < j:
                    G.add_edge(i, j)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    run = label_propagation(g, max_iter=50)
    assert run.converged
    assert _communities(state_dict(run.state, "label")) == cliques


def test_fixed_point_property(tmp_graph_dir):
    # ring of 8 cliques of 5 joined by single edges
    G = nx.ring_of_cliques(8, 5)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    run = label_propagation(g, max_iter=100)
    labels = state_dict(run.state, "label")
    if run.converged:
        # reference termination predicate: every vertex's label is one
        # of the max-frequency labels among its neighbors
        for v in G.nodes():
            freq = collections.Counter(labels[u] for u in G[v])
            assert freq[labels[v]] == max(freq.values())
    # structure: communities should roughly match the cliques
    ncomm = len(set(labels.values()))
    assert 4 <= ncomm <= 12


def test_star_absorbs(tmp_graph_dir):
    G = nx.star_graph(20)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=2)
    run = label_propagation(g, max_iter=50)
    labels = state_dict(run.state, "label")
    assert len(set(labels.values())) == 1


def test_isolated_keeps_own_label(tmp_graph_dir):
    import pyarrow as pa
    import ray.data

    from igraph_ray.api import build_graph, edges_dataset

    vds = ray.data.from_arrow(pa.table({"vid": pa.array([0, 1, 7], pa.int64())}))
    g = build_graph(
        edges_dataset([0], [1]),
        tmp_graph_dir,
        num_parts=2,
        vertices=vds,
        symmetrize=True,
    )
    run = label_propagation(g, max_iter=20)
    labels = state_dict(run.state, "label")
    assert labels[7] == 7
    assert labels[0] == labels[1]


def test_weighted_lpa_heavy_bridge(tmp_graph_dir):
    """Edge weights steer adoption: a vertex tied to two communities
    follows the heavier edges (weighted frequency, label_propagation.py
    :215-217 data=weight)."""
    import networkx as nx

    G = nx.Graph()
    # community A: clique 0-3; community B: clique 10-13; vertex 20
    # connects to both, but with 10x weight toward A
    for c in ([0, 1, 2, 3], [10, 11, 12, 13]):
        for i in c:
            for j in c:
                if i < j:
                    G.add_edge(i, j, weight=1.0)
    for a in (0, 1):
        G.add_edge(20, a, weight=10.0)
    for b in (10, 11):
        G.add_edge(20, b, weight=1.0)
    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    w = [G[u][v]["weight"] for u, v in G.edges()]
    from igraph_ray.api import build_graph, edges_dataset

    g = build_graph(
        edges_dataset(src, dst, w), tmp_graph_dir, num_parts=2,
        symmetrize=True,
    )
    run = label_propagation(g, max_iter=60)
    labels = state_dict(run.state, "label")
    assert labels[20] == labels[0]  # heavy edges win
    assert labels[0] != labels[10]


def test_modularity_matches_networkx(tmp_graph_dir):
    import networkx as nx
    import pyarrow as pa
    import ray.data

    from igraph_ray.api import edges_dataset
    from igraph_ray.kernels.modularity import modularity

    G = nx.ring_of_cliques(6, 4)
    src = [u for u, v in G.edges()]
    dst = [v for u, v in G.edges()]
    # labeling = the true cliques
    labels = {v: v // 4 for v in G.nodes()}
    lds = ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(sorted(labels), pa.int64()),
                "label": pa.array(
                    [labels[v] for v in sorted(labels)], pa.int64()
                ),
            }
        )
    )
    q = modularity(edges_dataset(src, dst), lds)
    import collections

    comms = collections.defaultdict(set)
    for v, l in labels.items():
        comms[l].add(v)
    ref = nx.algorithms.community.modularity(G, comms.values())
    assert abs(q - ref) < 1e-12


def test_lpa_modularity_beats_trivial(tmp_graph_dir):
    """LPA communities on a ring of cliques score far better than the
    all-one-community labeling (quality check, SURVEY.md §5.2)."""
    import networkx as nx
    import pyarrow as pa
    import ray.data

    from igraph_ray.api import edges_dataset
    from igraph_ray.kernels.modularity import modularity
    from tests.util import nx_edge_arrays

    G = nx.ring_of_cliques(8, 5)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    run = label_propagation(g, max_iter=100)
    labels = state_dict(run.state, "label")
    src, dst = nx_edge_arrays(G)
    lds = ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(sorted(labels), pa.int64()),
                "label": pa.array(
                    [labels[v] for v in sorted(labels)], pa.int64()
                ),
            }
        )
    )
    q = modularity(edges_dataset(src, dst), lds)
    trivial = ray.data.from_arrow(
        pa.table(
            {
                "vid": pa.array(sorted(labels), pa.int64()),
                "label": pa.array([0] * len(labels), pa.int64()),
            }
        )
    )
    q0 = modularity(edges_dataset(src, dst), trivial)
    assert q > 0.5 and q > q0 + 0.3
