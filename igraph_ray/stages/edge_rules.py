"""E1/E2/E3 — edge inference rules over the files table.

BASELINE.json north_star: "edges are inferred repo→repo and file→file
links (shared paths, commit co-occurrence, cross-repo content sha256
matches)".  The reference consumes an already-built graph, so the rule
*shape* is ours to define; each rule is pinned by an equivalent DuckDB
SQL oracle in ``__ray_entry__.py``.

Rule semantics (deterministic, skew-capped):

- group rows by a key column (path / commit / content_sha);
- members of a group = distinct vertex keys, sorted lexicographically;
- groups with ≤ ``clique_cap`` members emit the full clique
  (all ordered pairs a < b);
- larger groups emit a **star from the minimum member** — a key shared
  by g rows would otherwise emit g² pair edges (SURVEY.md §4 "cap
  E1-E3 group fanout"); the star preserves group connectivity (same
  connected components) at O(g) edges;
- an optional cross-tag (repo) drops same-tag pairs (E3 links only
  cross-repo sha matches).

Each emitted row is ``(src_key, dst_key, weight=1.0, rule)``; parallel
edges across groups/rules collapse later with summed weight (E4).

One ``groupby(key)`` shuffle per rule; the per-group emit is
vectorized (np.unique + triu index math).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

CLIQUE_CAP = 8


def _emit_group(
    group: pa.Table,
    member_col: str,
    cross_col: str | None,
    clique_cap: int,
    rule: str,
) -> pa.Table:
    members = np.asarray(group.column(member_col).to_pylist(), dtype=object)
    uniq, first_idx = np.unique(members, return_index=True)
    k = len(uniq)
    empty = pa.table(
        {
            "src_key": pa.array([], pa.string()),
            "dst_key": pa.array([], pa.string()),
            "weight": pa.array([], pa.float64()),
            "rule": pa.array([], pa.string()),
        }
    )
    if k < 2:
        return empty
    if k <= clique_cap:
        iu, ju = np.triu_indices(k, 1)
        src = uniq[iu]
        dst = uniq[ju]
    else:
        src = np.repeat(uniq[:1], k - 1)
        dst = uniq[1:]
    if cross_col is not None:
        tags = np.asarray(group.column(cross_col).to_pylist(), dtype=object)[
            first_idx
        ]
        tag_of = dict(zip(uniq, tags))
        keep = np.array([tag_of[a] != tag_of[b] for a, b in zip(src, dst)])
        src, dst = src[keep], dst[keep]
    if len(src) == 0:
        return empty
    return pa.table(
        {
            "src_key": pa.array(src, pa.string()),
            "dst_key": pa.array(dst, pa.string()),
            "weight": pa.array(np.ones(len(src))),
            "rule": pa.array([rule] * len(src), pa.string()),
        }
    )


def key_edges(
    files: ray.data.Dataset,
    group_col: str,
    member_col: str,
    cross_col: str | None = None,
    clique_cap: int = CLIQUE_CAP,
    rule: str = "key",
) -> ray.data.Dataset:
    """Generic grouped edge rule (see module docstring)."""
    cols = [group_col, member_col] + ([cross_col] if cross_col else [])
    projected = files.select_columns(cols)
    return projected.groupby(group_col).map_groups(
        lambda g: _emit_group(g, member_col, cross_col, clique_cap, rule),
        batch_format="pyarrow",
    )


def with_file_key(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Add ``file_key = repo || ':' || path`` (the file-vertex key)."""

    def _f(batch: pa.Table) -> pa.Table:
        fk = pc.binary_join_element_wise(
            batch.column("repo"), batch.column("path"), ":"
        )
        return batch.append_column("file_key", fk)

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)


def shared_path_edges(
    files: ray.data.Dataset, clique_cap: int = CLIQUE_CAP
) -> ray.data.Dataset:
    """E1 — same ``path`` across different repos links file vertices.

    Members within a path group differ exactly by repo, so no explicit
    cross-repo filter is needed.
    """
    return key_edges(
        with_file_key(files),
        group_col="path",
        member_col="file_key",
        clique_cap=clique_cap,
        rule="shared_path",
    )


def commit_cooccurrence_edges(
    files: ray.data.Dataset, clique_cap: int = CLIQUE_CAP
) -> ray.data.Dataset:
    """E2 — files sharing a ``commit`` value."""
    return key_edges(
        with_file_key(files),
        group_col="commit",
        member_col="file_key",
        clique_cap=clique_cap,
        rule="commit_cooccurrence",
    )


def content_sha_edges(
    files_with_sha: ray.data.Dataset, clique_cap: int = CLIQUE_CAP
) -> ray.data.Dataset:
    """E3 — cross-repo rows with equal ``content_sha`` (near-duplicate
    link; doubles as exact dedup: hash-partition + per-group)."""
    return key_edges(
        with_file_key(files_with_sha),
        group_col="content_sha",
        member_col="file_key",
        cross_col="repo",
        clique_cap=clique_cap,
        rule="content_sha",
    )


def _emit_ring(group: pa.Table, member_col: str, rule: str) -> pa.Table:
    """Directed ring over the sorted distinct members of a group:
    m0→m1→…→mk-1→m0 (k≥2).  Gives every key group one strongly
    connected cycle — the directed-rule counterpart of ``key_edges``."""
    members = np.asarray(group.column(member_col).to_pylist(), dtype=object)
    uniq = np.unique(members)
    k = len(uniq)
    if k < 2:
        return pa.table(
            {
                "src_key": pa.array([], pa.string()),
                "dst_key": pa.array([], pa.string()),
                "weight": pa.array([], pa.float64()),
                "rule": pa.array([], pa.string()),
            }
        )
    return pa.table(
        {
            "src_key": pa.array(uniq, pa.string()),
            "dst_key": pa.array(np.roll(uniq, -1), pa.string()),
            "weight": pa.array(np.ones(k)),
            "rule": pa.array([rule] * k, pa.string()),
        }
    )


def ring_edges(
    files: ray.data.Dataset,
    group_col: str,
    member_col: str,
    rule: str = "ring",
) -> ray.data.Dataset:
    """Directed cycle per key group (used for SCC pipelines)."""
    projected = files.select_columns([group_col, member_col])
    return projected.groupby(group_col).map_groups(
        lambda g: _emit_ring(g, member_col, rule),
        batch_format="pyarrow",
    )


def repo_rollup_edges(
    files: ray.data.Dataset, clique_cap: int = CLIQUE_CAP
) -> ray.data.Dataset:
    """E1 rollup — repo→repo links for repos sharing a path."""
    return key_edges(
        files,
        group_col="path",
        member_col="repo",
        clique_cap=clique_cap,
        rule="repo_shared_path",
    )
