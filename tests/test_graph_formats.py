"""GraphML / GML / Pajek interchange vs the networkx readers/writers
(``sources/graph_formats.py``): both directions roundtrip — ours →
nx reads the same graph; nx → ours reads the same graph — plus
self-roundtrips with weights, isolated vertices, and quoting."""

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest

from igraph_ray.sources.graph_formats import (
    read_gml,
    read_graphml,
    read_pajek,
    write_gml,
    write_graphml,
    write_pajek,
)


def _edges_table(q='d "q"'):
    return pa.table(
        {
            "src": pa.array(["a", "b", "c", q], pa.string()),
            "dst": pa.array(["b", "c", "a", "a"], pa.string()),
            "weight": pa.array([1.0, 2.5, 3.0, 0.5], pa.float64()),
        }
    )


def _vertices_table(q='d "q"'):
    return pa.table(
        {"key": pa.array(["a", "b", "c", q, "iso"], pa.string())}
    )


def _edge_set(tbl):
    return {
        (s, d, w)
        for s, d, w in zip(
            tbl.column("src").to_pylist(),
            tbl.column("dst").to_pylist(),
            tbl.column("weight").to_pylist(),
        )
    }


@pytest.mark.parametrize(
    "writer,reader,nx_reader,qkey",
    [
        (write_graphml, read_graphml, nx.read_graphml, 'd "q"'),
        (write_gml, read_gml, lambda p: nx.read_gml(p), 'd "q"'),
        # Pajek labels cannot carry embedded quotes (nx strips them)
        (write_pajek, read_pajek, nx.read_pajek, "d_q"),
    ],
    ids=["graphml", "gml", "pajek"],
)
def test_write_then_nx_reads_same_graph(
    tmp_path, writer, reader, nx_reader, qkey
):
    path = str(tmp_path / "g.out")
    writer(_edges_table(qkey), path, vertices=_vertices_table(qkey))
    G = nx_reader(path)
    assert set(G.nodes()) == {"a", "b", "c", qkey, "iso"}
    want = {
        (min(s, d), max(s, d)): w
        for s, d, w in _edge_set(_edges_table(qkey))
    }
    for (s, d), w in want.items():
        assert G.has_edge(s, d)
        data = G.get_edge_data(s, d)
        if isinstance(G, nx.MultiGraph):
            got = list(data.values())[0]
        else:
            got = data
        val = got.get("weight", got.get("value", 1.0))
        assert float(val) == w, (s, d)
    # our reader agrees with our writer (self-roundtrip)
    v2, e2 = reader(path)
    assert set(v2.column("key").to_pylist()) == set(
        _vertices_table(qkey).column("key").to_pylist()
    )
    assert _edge_set(e2) == _edge_set(_edges_table(qkey))


def test_nx_writes_we_read_graphml(tmp_path):
    G = nx.gnm_random_graph(30, 70, seed=4)
    for u, v in G.edges():
        G[u][v]["weight"] = float((u + v) % 7 + 1)
    p = str(tmp_path / "nx.graphml")
    nx.write_graphml(G, p)
    verts, edges = read_graphml(p)
    assert len(verts) == 30
    ours = {
        (min(int(s), int(d)), max(int(s), int(d)), w)
        for s, d, w in _edge_set(edges)
    }
    theirs = {
        (min(u, v), max(u, v), float(G[u][v]["weight"]))
        for u, v in G.edges()
    }
    assert ours == theirs


def test_nx_writes_we_read_gml(tmp_path):
    G = nx.les_miserables_graph()
    p = str(tmp_path / "nx.gml")
    nx.write_gml(G, p)
    verts, edges = read_gml(p)
    assert set(verts.column("key").to_pylist()) == set(G.nodes())
    ours = {
        (min(s, d), max(s, d)) for s, d, _ in _edge_set(edges)
    }
    theirs = {(min(u, v), max(u, v)) for u, v in G.edges()}
    assert ours == theirs


def test_nx_writes_we_read_pajek(tmp_path):
    G = nx.gnm_random_graph(25, 60, seed=9)
    p = str(tmp_path / "nx.net")
    nx.write_pajek(G, p)
    verts, edges = read_pajek(p)
    assert len(verts) == 25
    ours = {
        (min(int(s), int(d)), max(int(s), int(d)))
        for s, d, _ in _edge_set(edges)
    }
    theirs = {(min(u, v), max(u, v)) for u, v in G.edges()}
    assert ours == theirs


def test_pajek_out_of_order_vertex_numbers(tmp_path):
    """Pajek permits out-of-order / non-contiguous numbering; edges
    must resolve through the explicit vertex number, not file order."""
    import pytest

    p = str(tmp_path / "ooo.net")
    with open(p, "w") as f:
        f.write(
            '*Vertices 3\n7 "c"\n2 "a"\n5 "b"\n'
            "*Edges\n2 5 1.0\n5 7 2.0\n"
        )
    verts, edges = read_pajek(p)
    got = {
        (s, d, w)
        for s, d, w in zip(
            edges.column("src").to_pylist(),
            edges.column("dst").to_pylist(),
            edges.column("weight").to_pylist(),
        )
    }
    assert got == {("a", "b", 1.0), ("b", "c", 2.0)}

    bad = str(tmp_path / "bad.net")
    with open(bad, "w") as f:
        f.write('*Vertices 1\n1 "x"\n*Edges\n1 9\n')
    with pytest.raises(ValueError, match="unknown vertex number"):
        read_pajek(bad)


def test_formats_feed_the_build_path(ray_session, tmp_path):
    """Interchange output flows into the normal distributed build."""
    import ray.data

    from igraph_ray.api import build_graph
    from igraph_ray.stages.vertex_ids import assign_vertex_ids, attach_vids

    path = str(tmp_path / "g.graphml")
    write_graphml(_edges_table(), path, vertices=_vertices_table())
    verts, edges = read_graphml(path)
    vds = assign_vertex_ids(
        ray.data.from_arrow(verts), key_col="key"
    ).materialize()
    eds = attach_vids(
        ray.data.from_arrow(edges).rename_columns(
            {"src": "src_key", "dst": "dst_key"}
        ),
        vds,
    )
    g = build_graph(
        eds,
        str(tmp_path / "gd"),
        num_parts=2,
        symmetrize=True,
        vertices=vds.select_columns(["vid"]),
    )
    assert g.num_vertices == 5
