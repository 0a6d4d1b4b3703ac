"""Phase A+B+C — files table → vertices/edges → partitioned graph.

The full ingest-to-CSR pipeline of SURVEY.md §3.2:

    read files → P1 sha256 → (E1 shared path | E2 commit co-occurrence
    | E3 cross-repo sha match) → union → V1 dense vids → V2 key→vid
    → E4 symmetrize+dedup → G1 per-partition CSR blocks

``content`` is dropped immediately after the sha projection — only the
64-byte digest travels through the wide stages (SURVEY.md §7 "hard
parts" (6)).
"""

from __future__ import annotations

from dataclasses import dataclass

import ray.data

from igraph_ray.stages.edge_rules import (
    commit_cooccurrence_edges,
    content_sha_edges,
    shared_path_edges,
    with_file_key,
)
from igraph_ray.stages.partition import GraphMeta, build_graph_partitions
from igraph_ray.stages.sha import with_content_sha
from igraph_ray.stages.symmetrize import symmetrize_dedup
from igraph_ray.stages.vertex_ids import assign_vertex_ids, attach_vids
from igraph_ray.utils import num_parts_for


@dataclass
class GraphBuildResult:
    vertices: ray.data.Dataset  # (key, vid)
    edges: ray.data.Dataset  # (src, dst, weight) symmetric simple
    graph: GraphMeta


def file_edges_by_key(
    files: ray.data.Dataset,
    clique_cap: int = 8,
    rules: tuple[str, ...] = ("shared_path", "commit", "sha"),
) -> ray.data.Dataset:
    """Union of the E1/E2/E3 rule outputs over string file keys."""
    files = with_content_sha(files)
    # content is wide — drop it as soon as the sha exists
    slim = files.select_columns(["repo", "path", "commit", "content_sha"])
    parts = []
    if "shared_path" in rules:
        parts.append(shared_path_edges(slim, clique_cap))
    if "commit" in rules:
        parts.append(commit_cooccurrence_edges(slim, clique_cap))
    if "sha" in rules:
        parts.append(content_sha_edges(slim, clique_cap))
    if not parts:
        raise ValueError("no edge rules selected")
    out = parts[0]
    if len(parts) > 1:
        out = out.union(*parts[1:])
    return out


def build_file_graph(
    files: ray.data.Dataset,
    graph_dir: str,
    num_parts: int | None = None,
    clique_cap: int = 8,
    rules: tuple[str, ...] = ("shared_path", "commit", "sha"),
) -> GraphBuildResult:
    """files table → symmetric simple edge table + partitioned CSR."""
    edges_by_key = file_edges_by_key(files, clique_cap, rules).materialize()

    # V1: vertex universe = every file key (so files linked by no rule
    # still appear as isolated vertices), deterministic dense ids.
    keys = (
        with_file_key(files.select_columns(["repo", "path"]))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    n_vertices = vertices.count()

    edges = attach_vids(
        edges_by_key, vertices, num_vertices=n_vertices
    )
    edges = symmetrize_dedup(edges).materialize()
    n_edges = edges.count()

    if num_parts is None:
        num_parts = num_parts_for(n_edges, n_vertices)

    vid_ds = vertices.select_columns(["vid"])
    graph = build_graph_partitions(
        edges, graph_dir, num_parts, vertices=vid_ds
    )
    return GraphBuildResult(vertices=vertices, edges=edges, graph=graph)
