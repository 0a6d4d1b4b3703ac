"""Bow-tie decomposition vs a networkx-built oracle (Broder et al.
regions relative to the largest SCC; ties toward the smallest min-vid
label, tendrils = weakly-but-not-strongly attached, tubes folded in)."""

import networkx as nx
import pyarrow as pa
import ray.data

from igraph_ray.kernels.bowtie import bowtie
from tests.util import ds_to_table, nx_edge_arrays


def _bowtie_oracle(G: nx.DiGraph) -> dict[int, str]:
    sccs = list(nx.strongly_connected_components(G))
    core = max(sccs, key=lambda c: (len(c), -min(c)))
    member = min(core)
    out_side = nx.descendants(G, member) | {member}
    in_side = nx.ancestors(G, member) | {member}
    weak = nx.node_connected_component(G.to_undirected(), member)
    regions = {}
    for v in G.nodes():
        if v in core:
            regions[v] = "core"
        elif v in in_side:
            regions[v] = "in"
        elif v in out_side:
            regions[v] = "out"
        elif v in weak:
            regions[v] = "tendril"
        else:
            regions[v] = "disconnected"
    return regions


def _ours(G: nx.DiGraph, graph_dir: str) -> dict[int, str]:
    from igraph_ray.api import edges_dataset

    src, dst = nx_edge_arrays(G)
    vds = ray.data.from_arrow(
        pa.table({"vid": pa.array(sorted(G.nodes()), pa.int64())})
    )
    out = bowtie(edges_dataset(src, dst), graph_dir, vertices=vds)
    t = ds_to_table(out)
    return dict(
        zip(t.column("vid").to_pylist(), t.column("region").to_pylist())
    )


def test_bowtie_textbook(tmp_graph_dir):
    # IN(0,1) -> core 3-cycle(2,3,4) -> OUT(5,6); tendril 7 hangs off
    # IN, tube 8 bypasses the core, 9-10 disconnected pair, 11 isolated
    G = nx.DiGraph(
        [
            (0, 2), (1, 2),          # in
            (2, 3), (3, 4), (4, 2),  # core cycle
            (4, 5), (5, 6),          # out
            (0, 7),                  # tendril off the in-side
            (1, 8), (8, 6),          # tube: in -> out around the core
            (9, 10),                 # weakly connected pair, no core link
        ]
    )
    G.add_node(11)
    got = _ours(G, tmp_graph_dir)
    want = _bowtie_oracle(G)
    assert got == want
    assert got[2] == got[3] == got[4] == "core"
    assert got[0] == got[1] == "in"
    assert got[5] == got[6] == "out"
    assert got[7] == "tendril" and got[8] == "tendril"
    assert got[9] == got[10] == got[11] == "disconnected"


def test_bowtie_random_digraph(tmp_graph_dir):
    G = nx.gnp_random_graph(90, 0.03, seed=7, directed=True)
    assert _ours(G, tmp_graph_dir) == _bowtie_oracle(G)
