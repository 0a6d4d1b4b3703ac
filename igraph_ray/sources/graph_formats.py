"""Graph interchange formats — GraphML, GML, Pajek NET read/write
(igraph ``read_graph`` / ``write_graph`` surface; nx
``read_graphml``/``write_graphml``, ``read_gml``/``write_gml``,
``read_pajek``/``write_pajek`` are the on-disk oracles).

Scope and shape: an interchange FILE is inherently a single sequential
byte stream, so reading parses one file on one task and writing
drains the edge Dataset through one writer — a DOCUMENTED single-node
boundary, like igraph's own readers.  What stays distributed is
everything around it: the returned tables become Ray Datasets feeding
the normal build path, and the writer consumes ``iter_batches`` (so
the upstream pipeline streams; only the final serialization is
sequential).  For bulk data Parquet is the native format; these
readers exist for interoperability with igraph/networkx/Gephi users.

Data model: vertices ``(key:string [, attrs...])``, edges
``(src:string, dst:string, weight:float64)``.  String keys are the
interchange ids; map to dense vids with
``stages/vertex_ids.assign_vertex_ids`` downstream.  Parallel edges
are preserved as written (collapse happens in ``symmetrize_dedup`` /
the CSR build, matching the engine's multigraph-collapse rule).

Oracles: ``tests/test_graph_formats.py`` — roundtrips through
networkx's readers/writers in both directions for all three formats.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

import numpy as np
import pyarrow as pa

_GRAPHML_NS = "http://graphml.graphdrawing.org/xmlns"


# ---------------------------------------------------------------------------
# GraphML
# ---------------------------------------------------------------------------
def read_graphml(path: str) -> tuple[pa.Table, pa.Table]:
    """Parse a GraphML file → ``(vertices, edges)`` tables.

    Vertex rows: ``(key, <string/double data attrs...>)``; edge rows:
    ``(src, dst, weight)`` with weight from a ``weight`` data key
    (default 1.0).  Namespaced and namespace-less documents both
    accepted."""
    tree = ET.parse(path)
    root = tree.getroot()

    def tag(name: str) -> list[ET.Element]:
        out = root.findall(f".//{{{_GRAPHML_NS}}}{name}")
        return out if out else root.findall(f".//{name}")

    # data-key declarations: id -> (domain, attr name)
    keys: dict[str, tuple[str, str]] = {}
    for k in tag("key"):
        keys[k.get("id", "")] = (
            k.get("for", ""),
            k.get("attr.name", k.get("id", "")),
        )

    def data_of(el: ET.Element) -> dict[str, str]:
        out = {}
        for d in list(el):
            if d.tag.endswith("data"):
                kid = d.get("key", "")
                name = keys.get(kid, ("", kid))[1]
                out[name] = d.text or ""
        return out

    v_keys: list[str] = []
    v_attrs: dict[str, list] = {}
    for n in tag("node"):
        v_keys.append(n.get("id", ""))
        for name, val in data_of(n).items():
            v_attrs.setdefault(name, [None] * (len(v_keys) - 1)).append(val)
        for name in v_attrs:
            if len(v_attrs[name]) < len(v_keys):
                v_attrs[name].append(None)

    src, dst, w = [], [], []
    for e in tag("edge"):
        src.append(e.get("source", ""))
        dst.append(e.get("target", ""))
        d = data_of(e)
        w.append(float(d["weight"]) if "weight" in d else 1.0)

    vcols: dict[str, object] = {"key": pa.array(v_keys, pa.string())}
    for name, vals in v_attrs.items():
        if name == "key":
            continue
        vcols[name] = pa.array(
            [None if v is None else str(v) for v in vals], pa.string()
        )
    vertices = pa.table(vcols)
    edges = pa.table(
        {
            "src": pa.array(src, pa.string()),
            "dst": pa.array(dst, pa.string()),
            "weight": pa.array(np.asarray(w, np.float64)),
        }
    )
    return vertices, edges


def write_graphml(
    edges,
    path: str,
    vertices=None,
    directed: bool = False,
) -> None:
    """Write GraphML: ``edges`` is a Ray Dataset or Arrow table with
    ``(src, dst[, weight])`` string endpoints; ``vertices`` optionally
    supplies the full key set (isolated vertices).  Streams edge
    batches through one sequential writer."""
    batches = _as_batches(edges)
    vertex_keys: set[str] = set()
    edge_rows: list[tuple[str, str, float]] = []
    for b in batches:
        s = b.column("src").to_pylist()
        d = b.column("dst").to_pylist()
        w = (
            b.column("weight").to_pylist()
            if "weight" in b.column_names
            else [1.0] * len(s)
        )
        for a, bb, ww in zip(s, d, w):
            edge_rows.append((str(a), str(bb), float(ww)))
            vertex_keys.add(str(a))
            vertex_keys.add(str(bb))
    if vertices is not None:
        for b in _as_batches(vertices):
            vertex_keys.update(str(k) for k in b.column("key").to_pylist())

    with open(path, "w", encoding="utf-8") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write(f'<graphml xmlns="{_GRAPHML_NS}">\n')
        f.write(
            '  <key id="d0" for="edge" attr.name="weight" '
            'attr.type="double"/>\n'
        )
        ed = "directed" if directed else "undirected"
        f.write(f'  <graph edgedefault="{ed}">\n')
        for k in sorted(vertex_keys):
            f.write(f"    <node id={quoteattr(k)}/>\n")
        for a, b, ww in edge_rows:
            f.write(
                f"    <edge source={quoteattr(a)} target={quoteattr(b)}>"
                f'<data key="d0">{ww!r}</data></edge>\n'
            )
        f.write("  </graph>\n</graphml>\n")


# ---------------------------------------------------------------------------
# GML
# ---------------------------------------------------------------------------
_GML_TOKEN = re.compile(r'"(?:[^"\\]|\\.)*"|\[|\]|[^\s\[\]]+')


def read_gml(path: str) -> tuple[pa.Table, pa.Table]:
    """Parse a GML file → ``(vertices, edges)``.  Vertex ``key`` =
    the ``label`` if present else the integer ``id``; edges resolve
    source/target ids to keys; ``value``-less edges weigh 1.0."""
    text = open(path, encoding="utf-8").read()
    toks = _GML_TOKEN.findall(text)
    pos = 0

    def parse_block():
        nonlocal pos
        out: list[tuple[str, object]] = []
        while pos < len(toks):
            t = toks[pos]
            if t == "]":
                pos += 1
                return out
            name = t
            pos += 1
            if pos < len(toks) and toks[pos] == "[":
                pos += 1
                out.append((name, parse_block()))
            else:
                out.append((name, toks[pos]))
                pos += 1
        return out

    top = parse_block()
    graph = None
    for name, val in top:
        if name == "graph":
            graph = val
    if graph is None:
        raise ValueError(f"no graph block in GML file {path}")

    def unquote(v) -> str:
        import html

        v = str(v)
        if v.startswith('"') and v.endswith('"'):
            v = v[1:-1]
        return html.unescape(v)

    ids: list[int] = []
    labels: dict[int, str] = {}
    earcs: list[tuple[int, int, float]] = []
    for name, val in graph:
        if name == "node":
            d = dict(val)
            nid = int(d["id"])
            ids.append(nid)
            labels[nid] = unquote(d.get("label", str(nid)))
        elif name == "edge":
            d = dict(val)
            earcs.append(
                (
                    int(d["source"]),
                    int(d["target"]),
                    float(d.get("value", d.get("weight", 1.0))),
                )
            )
    vertices = pa.table(
        {"key": pa.array([labels[i] for i in ids], pa.string())}
    )
    edges = pa.table(
        {
            "src": pa.array([labels[a] for a, _, _ in earcs], pa.string()),
            "dst": pa.array([labels[b] for _, b, _ in earcs], pa.string()),
            "weight": pa.array(
                np.asarray([w for _, _, w in earcs], np.float64)
            ),
        }
    )
    return vertices, edges


def write_gml(edges, path: str, vertices=None, directed: bool = False) -> None:
    """Write GML with integer ids + string labels (nx.read_gml
    compatible).  Edge weights emit as ``value``."""
    keys: list[str] = []
    seen: dict[str, int] = {}
    edge_rows: list[tuple[str, str, float]] = []
    for b in _as_batches(edges):
        s = b.column("src").to_pylist()
        d = b.column("dst").to_pylist()
        w = (
            b.column("weight").to_pylist()
            if "weight" in b.column_names
            else [1.0] * len(s)
        )
        for a, bb, ww in zip(s, d, w):
            for k in (str(a), str(bb)):
                if k not in seen:
                    seen[k] = len(keys)
                    keys.append(k)
            edge_rows.append((str(a), str(bb), float(ww)))
    if vertices is not None:
        for b in _as_batches(vertices):
            for k in b.column("key").to_pylist():
                k = str(k)
                if k not in seen:
                    seen[k] = len(keys)
                    keys.append(k)

    def q(s: str) -> str:
        # GML strings escape with HTML entities (the nx convention;
        # backslash escapes are rejected by nx.read_gml)
        return (
            '"'
            + s.replace("&", "&amp;").replace('"', "&quot;")
            + '"'
        )

    with open(path, "w", encoding="utf-8") as f:
        f.write("graph [\n")
        if directed:
            f.write("  directed 1\n")
        for k in keys:
            f.write(f"  node [\n    id {seen[k]}\n    label {q(k)}\n  ]\n")
        for a, b, ww in edge_rows:
            f.write(
                f"  edge [\n    source {seen[a]}\n    target {seen[b]}\n"
                f"    value {ww!r}\n  ]\n"
            )
        f.write("]\n")


# ---------------------------------------------------------------------------
# Pajek NET
# ---------------------------------------------------------------------------
def read_pajek(path: str) -> tuple[pa.Table, pa.Table]:
    """Parse a Pajek .net file → ``(vertices, edges)``.  ``*Arcs``
    and ``*Edges`` sections both load (direction is the caller's
    concern, matching igraph's reader); third column = weight."""
    keys: list[str] = []
    # Pajek permits out-of-order / non-contiguous vertex numbering on
    # *Vertices lines — resolve edge endpoints through the EXPLICIT
    # number, never file order.
    by_num: dict[int, str] = {}
    earcs: list[tuple[int, int, float]] = []
    section = ""
    for raw in open(path, encoding="utf-8"):
        line = raw.strip()
        if not line or line.startswith("%"):
            continue
        if line.lower().startswith("*vertices"):
            section = "v"
            continue
        if line.lower().startswith(("*arcs", "*edges")):
            section = "e"
            continue
        if line.startswith("*"):
            section = ""
            continue
        if section == "v":
            m = re.match(r'\s*(\d+)\s+"((?:[^"\\]|\\.)*)"', line)
            if m:
                num, key = int(m.group(1)), m.group(2)
            else:
                parts = line.split()
                num = int(parts[0])
                key = parts[1] if len(parts) > 1 else parts[0]
            if num in by_num:
                raise ValueError(
                    f"read_pajek: duplicate vertex number {num} in {path}"
                )
            by_num[num] = key
            keys.append(key)
        elif section == "e":
            parts = line.split()
            a, b = int(parts[0]), int(parts[1])
            w = float(parts[2]) if len(parts) > 2 else 1.0
            earcs.append((a, b, w))

    def resolve(n: int) -> str:
        try:
            return by_num[n]
        except KeyError:
            raise ValueError(
                f"read_pajek: edge references unknown vertex number "
                f"{n} in {path}"
            ) from None

    vertices = pa.table({"key": pa.array(keys, pa.string())})
    edges = pa.table(
        {
            "src": pa.array([resolve(a) for a, _, _ in earcs], pa.string()),
            "dst": pa.array([resolve(b) for _, b, _ in earcs], pa.string()),
            "weight": pa.array(
                np.asarray([w for _, _, w in earcs], np.float64)
            ),
        }
    )
    return vertices, edges


def write_pajek(
    edges, path: str, vertices=None, directed: bool = False
) -> None:
    """Write Pajek .net (1-based vertex numbering, quoted labels;
    ``*Arcs`` when directed else ``*Edges``)."""
    keys: list[str] = []
    seen: dict[str, int] = {}
    edge_rows: list[tuple[str, str, float]] = []
    for b in _as_batches(edges):
        s = b.column("src").to_pylist()
        d = b.column("dst").to_pylist()
        w = (
            b.column("weight").to_pylist()
            if "weight" in b.column_names
            else [1.0] * len(s)
        )
        for a, bb, ww in zip(s, d, w):
            for k in (str(a), str(bb)):
                if k not in seen:
                    seen[k] = len(keys)
                    keys.append(k)
            edge_rows.append((str(a), str(bb), float(ww)))
    if vertices is not None:
        for b in _as_batches(vertices):
            for k in b.column("key").to_pylist():
                k = str(k)
                if k not in seen:
                    seen[k] = len(keys)
                    keys.append(k)
    with open(path, "w", encoding="utf-8") as f:
        f.write(f"*Vertices {len(keys)}\n")
        for i, k in enumerate(keys, 1):
            f.write(f'{i} "{k}"\n')
        f.write("*Arcs\n" if directed else "*Edges\n")
        for a, b, ww in edge_rows:
            f.write(f"{seen[a] + 1} {seen[b] + 1} {ww!r}\n")


def _as_batches(ds):
    """Iterate Arrow batches of a Ray Dataset or a plain Arrow table."""
    if isinstance(ds, pa.Table):
        return [ds]
    return ds.iter_batches(batch_format="pyarrow", batch_size=None)
