"""Shared test helpers: edge-table fixtures and oracle adapters."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from igraph_ray.api import edges_dataset, build_graph, state_to_table


def nx_edge_arrays(G):
    src = np.array([u for u, v in G.edges()], dtype=np.int64)
    dst = np.array([v for u, v in G.edges()], dtype=np.int64)
    return src, dst


def graph_from_nx(G, graph_dir, num_parts=3, symmetrize=True):
    import ray.data

    src, dst = nx_edge_arrays(G)
    vertices = ray.data.from_arrow(
        pa.table(
            {"vid": pa.array(sorted(int(v) for v in G.nodes()), pa.int64())}
        )
    )
    return build_graph(
        edges_dataset(src, dst),
        graph_dir,
        num_parts=num_parts,
        symmetrize=symmetrize,
        vertices=vertices,
    )


def state_dict(state, value_col):
    tbl = state_to_table(state, ["vid", value_col])
    return dict(
        zip(tbl.column("vid").to_pylist(), tbl.column(value_col).to_pylist())
    )


def ds_to_table(ds) -> pa.Table:
    batches = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not batches:
        s = ds.schema()
        return pa.schema(zip(s.names, s.types)).empty_table()
    return pa.concat_tables(batches)


def min_vid_components(G) -> dict[int, int]:
    import networkx as nx

    out = {}
    for comp in nx.connected_components(G):
        m = min(comp)
        for v in comp:
            out[v] = m
    return out
