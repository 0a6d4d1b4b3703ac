"""Driver-facing query implementations (the ``queries()`` side of
``__ray_entry__.py``), each with an exact DuckDB-SQL twin.

The testdata has no native ``files`` table, so SQL-checked graph
queries derive one deterministically from ``documents``::

    repo   = 'r' || (doc_id % 20)
    path   = 'p' || (doc_id % 50)
    commit = 'c' || (doc_id % 30)
    lang, content = lang, text

Both engines perform the identical derivation, so every ETL/graph
operator can be checked value-for-value.  Columns in SQL-checked
queries are integers/strings (or exact float sums of integer weights)
so the driver's value hash is stable across engines.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from igraph_ray.api import build_graph
from igraph_ray.functions.dedup import (
    minhash_near_dup_pairs,
    simhash_near_dup_pairs,
)
from igraph_ray.functions.similarity import brute_force_topk
from igraph_ray.functions.text import (
    language_id,
    quality_score,
    token_count,
    winnow_fingerprints,
)
from igraph_ray.kernels.components import connected_components
from igraph_ray.kernels.pagerank import pagerank
from igraph_ray.kernels.lpa import label_propagation
from igraph_ray.kernels.triangles import triangle_counts
from igraph_ray.stages.edge_rules import (
    commit_cooccurrence_edges,
    content_sha_edges,
    shared_path_edges,
    with_file_key,
)
from igraph_ray.stages.sha import with_content_sha
from igraph_ray.stages.symmetrize import symmetrize_dedup
from igraph_ray.stages.vertex_ids import assign_vertex_ids, attach_vids


# ---------------------------------------------------------------------------
# sources
# ---------------------------------------------------------------------------
def documents(sf_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet")


def files_from_documents(sf_dir: str) -> ray.data.Dataset:
    """The deterministic files-table derivation (see module docstring)."""

    def _derive(batch: pa.Table) -> pa.Table:
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        text = batch.column("text").to_pylist()
        # every 10th doc gets one of 7 shared "vendored" contents so the
        # cross-repo sha rule (E3) has real matches to find
        content = [
            f"DUP-{i % 7}" if i % 10 == 0 else t
            for i, t in zip(doc_id, text)
        ]
        return pa.table(
            {
                "repo": pa.array([f"r{i % 20}" for i in doc_id], pa.string()),
                "path": pa.array([f"p{i % 50}" for i in doc_id], pa.string()),
                "commit": pa.array([f"c{i % 30}" for i in doc_id], pa.string()),
                "lang": batch.column("lang"),
                "content": pa.array(content, pa.string()),
            }
        )

    return documents(sf_dir).map_batches(
        _derive, batch_format="pyarrow", zero_copy_batch=True
    )


FILES_SQL = (
    "SELECT 'r' || CAST(doc_id % 20 AS VARCHAR) AS repo, "
    "'p' || CAST(doc_id % 50 AS VARCHAR) AS path, "
    "'c' || CAST(doc_id % 30 AS VARCHAR) AS commit, "
    "lang, CASE WHEN doc_id % 10 = 0 "
    "THEN 'DUP-' || CAST(doc_id % 7 AS VARCHAR) ELSE text END AS content "
    "FROM documents"
)


def _agg_pairs(rule_ds: ray.data.Dataset) -> ray.data.Dataset:
    """(src_key, dst_key, weight=#groups) — matches the SQL GROUP BY."""
    return (
        rule_ds.select_columns(["src_key", "dst_key", "weight"])
        .groupby(["src_key", "dst_key"])
        .aggregate(Sum("weight", alias_name="weight"))
    )


# ---------------------------------------------------------------------------
# P1/P2/A2-style queries
# ---------------------------------------------------------------------------
def q_sha256(sf_dir: str):
    ds = with_content_sha(
        documents(sf_dir).select_columns(["doc_id", "text"]), column="text"
    )
    return ds.select_columns(["doc_id", "content_sha"])


def q_lang_counts(sf_dir: str):
    return (
        documents(sf_dir)
        .groupby("lang")
        .aggregate(Count("lang", alias_name="n"))
    )


def q_exact_dedup(sf_dir: str):
    ds = with_content_sha(
        documents(sf_dir).select_columns(["doc_id", "text"]), column="text"
    )
    return (
        ds.select_columns(["content_sha", "doc_id"])
        .groupby("content_sha")
        .aggregate(Min("doc_id", alias_name="keep_id"))
    )


def q_incremental_dedup(sf_dir: str):
    """(doc_id, content_sha) — cross-shard incremental dedup: split
    documents deterministically into a BASE corpus (splitmix64(doc_id)
    % 5 != 0) and an INCOMING shard (== 0); keep each incoming doc iff
    its sha256 appears nowhere in the base (distributed hash
    anti-join on the digest) and it is the smallest-doc_id holder of
    its sha within the incoming shard (first-keeper).  The shape every
    recurring-crawl ingest runs: dedup the new shard against the
    accumulated corpus without rescanning old×old pairs.  Exact —
    bitwise SQL twin (NOT EXISTS + MIN election)."""
    from igraph_ray.stages.join import hash_join
    from igraph_ray.utils import hash_int64

    ds = with_content_sha(
        documents(sf_dir).select_columns(["doc_id", "text"]), column="text"
    ).select_columns(["doc_id", "content_sha"]).materialize()

    def split(batch: pa.Table, want_incoming: bool) -> pa.Table:
        did = batch.column("doc_id").to_numpy(zero_copy_only=False)
        m = (hash_int64(did.astype(np.int64)) % np.uint64(5)) == np.uint64(0)
        return batch.filter(pa.array(m if want_incoming else ~m))

    incoming = ds.map_batches(
        lambda b: split(b, True),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    base_shas = (
        ds.map_batches(
            lambda b: split(b, False),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .select_columns(["content_sha"])
        .rename_columns({"content_sha": "base_sha"})
        .groupby("base_sha")
        .aggregate(Count("base_sha", alias_name="_c"))
        .select_columns(["base_sha"])
    )

    # first-keeper within the incoming shard
    keepers = (
        incoming.groupby("content_sha")
        .aggregate(Min("doc_id", alias_name="doc_id"))
    )
    # native anti-join against the base corpus digests
    kept = hash_join(
        keepers,
        base_shas,
        on="content_sha",
        right_on="base_sha",
        how="left_anti",
    ).select_columns(["doc_id", "content_sha"])
    return kept


def q_token_count(sf_dir: str):
    return token_count(
        documents(sf_dir).select_columns(["doc_id", "text"])
    ).select_columns(["doc_id", "n_tokens"])


def q_char_classes(sf_dir: str):
    def _f(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "punct_n": pc.cast(
                    pc.count_substring_regex(text, r"[^\w\s]"), pa.int64()
                ),
                "digit_n": pc.cast(
                    pc.count_substring_regex(text, r"[0-9]"), pa.int64()
                ),
                "upper_n": pc.cast(
                    pc.count_substring_regex(text, r"[A-Z]"), pa.int64()
                ),
            }
        )

    return documents(sf_dir).map_batches(
        _f, batch_format="pyarrow", zero_copy_batch=True
    )


def q_lang_filtered_counts(sf_dir: str):
    """P2 exercise: derive a messy path (mixed case, trailing space,
    directory prefix), ``normalize_files`` (trim+lower+basename),
    ``filter_lang`` to en/de, then count per (basename, lang)."""
    from igraph_ray.stages.normalize import filter_lang, normalize_files

    def derive(batch: pa.Table) -> pa.Table:
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "path": pa.array(
                    [f"Dir{i % 3}/File{i % 50}.TXT " for i in doc_id],
                    pa.string(),
                ),
                "lang": batch.column("lang"),
            }
        )

    files = documents(sf_dir).map_batches(
        derive, batch_format="pyarrow", zero_copy_batch=True
    )
    kept = filter_lang(normalize_files(files), ["en", "de"])
    return kept.groupby(["basename", "lang"]).aggregate(
        Count("basename", alias_name="n")
    )


def q_sample_hash(sf_dir: str):
    """T2 exercise: deterministic splitmix64 1/10 sample of documents —
    exactly reproducible by the SQL twin (and across resumes/cluster
    sizes, unlike seeded per-block random sampling)."""
    from igraph_ray.stages.sample import hash_sample

    return hash_sample(
        documents(sf_dir).select_columns(["doc_id", "lang"]),
        col="doc_id",
        num=1,
        denom=10,
    )


# ---------------------------------------------------------------------------
# edge rules / graph build
# ---------------------------------------------------------------------------
def q_edges_shared_path(sf_dir: str):
    return _agg_pairs(shared_path_edges(files_from_documents(sf_dir)))


def q_edges_commit(sf_dir: str):
    return _agg_pairs(
        commit_cooccurrence_edges(files_from_documents(sf_dir))
    )


def q_edges_sha_cross_repo(sf_dir: str):
    files = with_content_sha(files_from_documents(sf_dir))
    return _agg_pairs(content_sha_edges(files))


def q_vertex_ids(sf_dir: str):
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    return assign_vertex_ids(keys, key_col="key")


def q_symmetrize_shared_path(sf_dir: str):
    pairs = _agg_pairs(shared_path_edges(files_from_documents(sf_dir)))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": batch.column("src_key"),
                "dst": batch.column("dst_key"),
                "weight": batch.column("weight"),
            }
        )

    as_edges = pairs.map_batches(
        rename, batch_format="pyarrow", zero_copy_batch=True
    )
    out = symmetrize_dedup(as_edges)
    return out.rename_columns({"src": "src_key", "dst": "dst_key"})


def _link_graph_edges(sf_dir: str) -> ray.data.Dataset:
    """E1 ∪ E2 pair edges over string keys (the SQL-checked graph)."""
    files = files_from_documents(sf_dir)
    e1 = shared_path_edges(files)
    e2 = commit_cooccurrence_edges(files)
    return _agg_pairs(e1.union(e2))


def q_degrees(sf_dir: str):
    """Undirected degree per key over the E1∪E2 graph (symmetrized):
    (key, degree, weighted_degree)."""
    pairs = _link_graph_edges(sf_dir)

    def endpoints(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": pa.concat_arrays(
                    [
                        batch.column("src_key").combine_chunks(),
                        batch.column("dst_key").combine_chunks(),
                    ]
                ),
                "w": pa.concat_arrays(
                    [
                        batch.column("weight").combine_chunks(),
                        batch.column("weight").combine_chunks(),
                    ]
                ),
            }
        )

    both = pairs.map_batches(
        endpoints, batch_format="pyarrow", zero_copy_batch=True
    )
    return both.groupby("key").aggregate(
        Count("key", alias_name="degree"),
        Sum("w", alias_name="weighted_degree"),
    )


def q_topk_degree(sf_dir: str):
    return q_degrees(sf_dir).sort(
        ["degree", "key"], descending=[True, False]
    ).limit(10)


_KEY_GRAPH_CACHE: dict[str, tuple] = {}


def _build_key_graph(sf_dir: str, graph_dir: str):
    """vids + partitioned CSR for the E1∪E2 key graph (all file keys
    as vertices, including isolated ones).  Cached per sf_dir — four
    kernel queries share one build."""
    hit = _KEY_GRAPH_CACHE.get(sf_dir)
    if hit is not None:
        return hit
    pairs = _link_graph_edges(sf_dir).materialize()
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(
        pairs.rename_columns(
            {"src_key": "src_key", "dst_key": "dst_key"}
        ),
        vertices,
    )
    edges = symmetrize_dedup(edges)
    graph = build_graph(
        edges,
        graph_dir,
        vertices=vertices.select_columns(["vid"]),
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    _KEY_GRAPH_CACHE[sf_dir] = (graph, vtbl)
    return graph, vtbl


def _vid_to_key(tbl: pa.Table, vtbl: pa.Table, vid_cols: dict[str, str]) -> pa.Table:
    keys = vtbl.column("key").combine_chunks()
    out = {}
    for col in tbl.column_names:
        if col in vid_cols:
            out[vid_cols[col]] = pc.take(keys, tbl.column(col))
        else:
            out[col] = tbl.column(col)
    return pa.table(out)


def q_components(sf_dir: str, graph_dir: str | None = None):
    """(key, component) — component = lexicographically smallest key in
    the connected component of the E1∪E2 graph."""
    import tempfile

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_cc_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    run = connected_components(graph)
    state = pa.concat_tables(
        run.state.select_columns(["vid", "comp"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    return _vid_to_key(state, vtbl, {"vid": "key", "comp": "component"})


def q_triangles(sf_dir: str, graph_dir: str | None = None):
    """(key, triangles) per vertex of the E1∪E2 graph (0 for
    triangle-free keys)."""
    import tempfile

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_tri_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    # reuse the simple symmetric edge table persisted in the CSR build
    # by re-deriving it from pairs (cheap at check scale)
    pairs = _link_graph_edges(sf_dir)
    vertices_ds = ray.data.from_arrow(vtbl)
    edges = attach_vids(pairs, vertices_ds)
    # vertices= unions zero rows for isolated keys inside the kernel
    tc = triangle_counts(edges, vertices=vertices_ds)
    tbl = pa.concat_tables(
        tc.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    return _vid_to_key(tbl, vtbl, {"vid": "key"})


def q_four_cliques(sf_dir: str, graph_dir: str | None = None):
    """(key, c4) per vertex of the E1∪E2 graph (0 for K4-free keys) —
    oriented-DAG K4 counting (kernels/cliques.py)."""
    import tempfile

    from igraph_ray.kernels.cliques import four_clique_counts

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_c4_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    pairs = _link_graph_edges(sf_dir)
    vertices_ds = ray.data.from_arrow(vtbl)
    edges = attach_vids(pairs, vertices_ds)
    cc = four_clique_counts(edges, vertices=vertices_ds)
    tbl = pa.concat_tables(
        cc.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    return _vid_to_key(tbl, vtbl, {"vid": "key"})


def q_transitivity(sf_dir: str):
    """Global transitivity of the E1∪E2 graph as one row — both
    engines compute Σtriangles / Σtriads over exactly-representable
    integer sums, so the IEEE division matches bitwise."""
    from igraph_ray.kernels.triangles import transitivity

    pairs = _link_graph_edges(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices)
    t = transitivity(edges)
    return pa.table({"transitivity": pa.array([t], pa.float64())})


def q_total_triangles(sf_dir: str):
    """Total triangle count of the E1∪E2 graph (one int row)."""
    from igraph_ray.kernels.triangles import total_triangles, triangle_counts

    pairs = _link_graph_edges(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices)
    n = total_triangles(triangle_counts(edges))
    return pa.table({"n_triangles": pa.array([n], pa.int64())})


def q_pagerank_personalized(sf_dir: str, graph_dir: str | None = None):
    """(key, rank) with personalization concentrated on the smallest
    key — exercises the K1 personalization/dangling surface; rows-only
    (float fixed point), semantics verified by the pytest oracle."""
    import tempfile

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_ppr_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    seed_vid = 0  # dense sorted ids: vid 0 = lexicographically min key
    pers = {seed_vid: 1.0}
    run = pagerank(
        graph,
        tol=1e-7,
        max_iter=100,
        personalization=pers,
        raise_on_nonconvergence=False,
    )
    state = pa.concat_tables(
        run.state.select_columns(["vid", "rank"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    return _vid_to_key(state, vtbl, {"vid": "key"})


def q_pagerank(sf_dir: str, graph_dir: str | None = None):
    """(key, rank) over the E1∪E2 graph — no SQL oracle (float fixed
    point); verified by the pytest networkx suite instead."""
    import tempfile

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_pr_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    run = pagerank(graph, tol=1e-8, max_iter=200, raise_on_nonconvergence=False)
    state = pa.concat_tables(
        run.state.select_columns(["vid", "rank"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    return _vid_to_key(state, vtbl, {"vid": "key"})


def q_louvain(sf_dir: str):
    """(key, community_key) — Louvain communities over the E1∪E2
    graph; rows-only (async reference schedule not distributable,
    SURVEY.md §2.3(1)); quality vs nx.louvain_communities asserted in
    tests/test_louvain.py."""
    from igraph_ray.kernels.louvain import louvain

    pairs = _link_graph_edges(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices)
    assign, _mods = louvain(edges)
    tbl = pa.concat_tables(
        assign.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(
        tbl, vtbl, {"vid": "key", "community": "community_key"}
    )


def q_leiden(sf_dir: str):
    """(key, community_key) — Leiden communities over the E1∪E2
    graph; rows-only (randomized reference schedule not
    distributable; deterministic argmax variant, kernels/leiden.py);
    quality + connectivity guarantee asserted in
    tests/test_leiden.py."""
    from igraph_ray.kernels.leiden import leiden

    pairs = _link_graph_edges(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices)
    assign, _mods = leiden(edges)
    tbl = pa.concat_tables(
        assign.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(
        tbl, vtbl, {"vid": "key", "community": "community_key"}
    )


def q_fastgreedy(sf_dir: str):
    """(key, community_key) — CNM greedy-modularity communities over
    the E1∪E2 graph cut at the max-Q dendrogram prefix (igraph
    community_fastgreedy + as_clustering).  At resolution 1 the
    engine agglomerates in exact scaled-integer arithmetic
    (dq̂ = 4m·w − 2·K_i·K_j), so the DuckDB twin replays the merge
    sequence bitwise (round-5 promotion); exact
    nx.greedy_modularity_communities parity stays asserted in
    tests/test_community_extra.py."""
    from igraph_ray.kernels.community_extra import fastgreedy

    pairs = _link_graph_edges(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices)
    assign, _qs = fastgreedy(edges)
    tbl = pa.concat_tables(
        assign.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(
        tbl, vtbl, {"vid": "key", "community": "community_key"}
    )


def q_girvan_newman(sf_dir: str):
    """(key, community_key) — Girvan-Newman edge-betweenness
    communities (igraph community_edge_betweenness) over the E1∪E2
    graph, split until 8 communities; rows-only (iterative global
    edge removal); exact nx.girvan_newman parity asserted in
    tests/test_community_extra.py."""
    from igraph_ray.kernels.community_extra import girvan_newman

    pairs = _link_graph_edges(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices)
    assign, _q, _rem = girvan_newman(edges, target_communities=8)
    tbl = pa.concat_tables(
        assign.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(
        tbl, vtbl, {"vid": "key", "community": "community_key"}
    )


def q_walktrap(sf_dir: str):
    """(key, community_key) — Walktrap communities (igraph
    community_walktrap(steps=4) + as_clustering) over the E1∪E2
    graph, Ward agglomeration on 4-step random-walk distances cut at
    the max-Q dendrogram prefix; rows-only (heap-ordered greedy
    merges are not SQL-expressible); merge-sequence parity vs an
    independent brute-force reference asserted in
    tests/test_walktrap.py."""
    from igraph_ray.kernels.walktrap import walktrap

    pairs = _link_graph_edges(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices)
    assign, _qs = walktrap(edges)
    tbl = pa.concat_tables(
        assign.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(
        tbl, vtbl, {"vid": "key", "community": "community_key"}
    )


def q_infomap(sf_dir: str):
    """(key, community_key) — Infomap communities (igraph
    community_infomap: two-level map-equation minimization,
    Louvain-style deterministic local moves + coarsening) over the
    E1∪E2 graph; rows-only (sequential greedy over a global
    objective is not SQL-expressible); incremental-vs-scratch
    codelength and local-optimum checks in tests/test_infomap.py."""
    from igraph_ray.kernels.infomap import infomap

    pairs = _link_graph_edges(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices)
    assign, _L, _L0 = infomap(edges)
    tbl = pa.concat_tables(
        assign.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(
        tbl, vtbl, {"vid": "key", "community": "community_key"}
    )


def q_leading_eigenvector(sf_dir: str):
    """(key, community_key) — Newman leading-eigenvector communities
    (igraph community_leading_eigenvector: recursive modularity-matrix
    spectral bisection with Gershgorin-shifted power iteration) over
    the E1∪E2 graph; rows-only (iterative eigensolver); dense-eigh
    reference parity asserted in tests/test_leading_eigen.py."""
    from igraph_ray.kernels.leading_eigen import leading_eigenvector

    pairs = _link_graph_edges(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices)
    assign, _Q = leading_eigenvector(edges)
    tbl = pa.concat_tables(
        assign.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(
        tbl, vtbl, {"vid": "key", "community": "community_key"}
    )


def q_distances(sf_dir: str, graph_dir: str | None = None):
    """(key, dist) — BFS hop distances from the lexicographically
    smallest key over the E1∪E2 graph; reachable vertices only (the
    SQL twin is a recursive CTE, unreachable = absent both sides)."""
    import tempfile

    from igraph_ray.kernels.sssp import shortest_paths

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_sp_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    # multi-source: every 5th key in sorted order (dist = min over
    # sources) — spreads seeds across components for real coverage
    sources = np.arange(0, vtbl.num_rows, 5, dtype=np.int64)
    run = shortest_paths(graph, sources, weighted=False)
    state = pa.concat_tables(
        run.state.select_columns(["vid", "dist"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    d = state.column("dist").to_numpy(zero_copy_only=False)
    finite = np.isfinite(d)
    out = pa.table(
        {
            "vid": pc.take(state.column("vid"), pa.array(np.flatnonzero(finite))),
            "dist": pa.array(d[finite].astype(np.int64)),
        }
    )
    return _vid_to_key(out, vtbl, {"vid": "key"})


def q_distances_weighted(sf_dir: str, graph_dir: str | None = None):
    """(key, dist) — weighted shortest-path distances from the smallest
    key over the E1∪E2 graph (edge weight = co-occurrence count);
    rows-only check (float path sums), pytest Dijkstra oracle."""
    import tempfile

    from igraph_ray.kernels.sssp import shortest_paths

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_spw_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    run = shortest_paths(graph, [0], weighted=True)
    state = pa.concat_tables(
        run.state.select_columns(["vid", "dist"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    d = state.column("dist").to_numpy(zero_copy_only=False)
    finite = np.isfinite(d)
    out = pa.table(
        {
            "vid": pc.take(state.column("vid"), pa.array(np.flatnonzero(finite))),
            "dist": pa.array(d[finite]),
        }
    )
    return _vid_to_key(out, vtbl, {"vid": "key"})


def q_lpa(sf_dir: str, graph_dir: str | None = None):
    """(key, label_key) communities over the E1∪E2 graph — rows-only
    check (seeded-async reference semantics are not distributable,
    SURVEY.md §2.3(1))."""
    import tempfile

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_lpa_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    run = label_propagation(graph, max_iter=60)
    state = pa.concat_tables(
        run.state.select_columns(["vid", "label"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    return _vid_to_key(state, vtbl, {"vid": "key", "label": "label_key"})


# ---------------------------------------------------------------------------
# TPC-H-style relational checks (A1/A2/V2/T1)
# ---------------------------------------------------------------------------
def q_lineitem_agg(sf_dir: str):
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity"],
    )

    def cast_qty(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty": pc.cast(batch.column("l_quantity"), pa.int64()),
            }
        )

    return (
        ds.map_batches(cast_qty, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("qty", alias_name="sum_qty"), Count("qty", alias_name="n"))
    )


def q_orders_per_nation(sf_dir: str):
    """Broadcast-join demo: orders joined to customers (small side via
    ray.put), counted per nation."""
    import ray as _ray

    cust = pa.concat_tables(
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    ref = _ray.put(cust.sort_by("c_custkey"))

    class NationLookup:
        def __init__(self):
            t = _ray.get(ref)
            self.keys = t.column("c_custkey").to_numpy(zero_copy_only=False)
            self.nation = t.column("c_nationkey").to_numpy(zero_copy_only=False)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self.keys, ck)
            nk = self.nation[np.clip(pos, 0, len(self.keys) - 1)]
            nk = np.where(self.keys[np.clip(pos, 0, len(self.keys) - 1)] == ck, nk, -1)
            return pa.table(
                {"c_nationkey": pa.array(nk.astype(np.int64))}
            )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    )
    mapped = orders.map_batches(
        NationLookup,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 4),
    )
    return mapped.groupby("c_nationkey").aggregate(
        Count("c_nationkey", alias_name="n_orders")
    )


def q_events_users_per_type(sf_dir: str):
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    distinct = ev.groupby(["event_type", "user_id"]).aggregate(
        Count("user_id", alias_name="_n")
    )
    return distinct.groupby("event_type").aggregate(
        Count("user_id", alias_name="n_users")
    )


def q_top_orders(sf_dir: str):
    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    top = ds.sort(
        ["o_totalprice", "o_orderkey"], descending=[True, False]
    ).limit(10)
    return top.select_columns(["o_orderkey"])


# ---------------------------------------------------------------------------
# rows-only checked ops (non-SQL-expressible)
# ---------------------------------------------------------------------------
def q_language_id(sf_dir: str):
    return language_id(
        documents(sf_dir).select_columns(["doc_id", "text"])
    ).select_columns(["doc_id", "lang_pred"])


def q_quality(sf_dir: str):
    return quality_score(
        documents(sf_dir).select_columns(["doc_id", "text"])
    ).select_columns(["doc_id", "quality"])


def q_gopher_rules(sf_dir: str):
    """(doc_id, n_words, mean_word_len, symbol_ratio,
    bullet_line_ratio, ellipsis_line_ratio, alpha_word_ratio,
    n_stop_hits, keep) — Gopher quality heuristics (Rae et al. 2021
    App. A); exact integer counters + single IEEE divisions, SQL twin
    replays bitwise (functions/text.py::gopher_rules)."""
    from igraph_ray.functions.text import gopher_rules

    return gopher_rules(
        documents(sf_dir).select_columns(["doc_id", "text"])
    )


def q_c4_clean(sf_dir: str):
    """(doc_id, n_lines, n_kept_lines, n_sentences, has_lorem,
    has_brace, cleaned_text, keep) — C4 line-level cleaning (Raffel
    et al. 2020 §2.2); exact integer counters + pure string rebuild,
    SQL twin replays bitwise (functions/text.py::c4_clean)."""
    from igraph_ray.functions.text import c4_clean

    return c4_clean(documents(sf_dir).select_columns(["doc_id", "text"]))


def q_curation_funnel(sf_dir: str):
    """(stage, stage_name, n_in, n_out) — composite curation funnel:
    Gopher quality rules → C4 page rules → exact sha256 dedup, with
    per-stage survivor counts as exact integers (functions/
    curation.py::curation_funnel; single-pass flag map + one digest
    groupby, bitwise SQL twin)."""
    from igraph_ray.functions.curation import curation_funnel

    return curation_funnel(
        documents(sf_dir).select_columns(["doc_id", "text"])
    )


def q_partition_compare(sf_dir: str):
    """One row — igraph ``compare_communities`` surface over the two
    categorical labelings of `documents` (lang vs source): exact-int
    pair invariants + split-join distance + Rand/ARI (each ONE IEEE
    division of exactly-reduced integers → bitwise SQL twin;
    kernels/partition_compare.py)."""
    from igraph_ray.kernels.partition_compare import compare_partitions

    df = compare_partitions(
        documents(sf_dir).select_columns(["lang", "source"]),
        "lang",
        "source",
    )
    return df.drop(columns=["nmi", "vi"])


def q_partition_compare_info(sf_dir: str):
    """(n, nmi, vi) — the information-theoretic comparison metrics
    (Danon NMI / Meilă VI) for the same labeling pair; float ln-sums
    are accumulation-order sensitive, so rows-only with the brute
    numpy oracle in tests/test_partition_compare.py."""
    from igraph_ray.kernels.partition_compare import compare_partitions

    df = compare_partitions(
        documents(sf_dir).select_columns(["lang", "source"]),
        "lang",
        "source",
    )
    return df[["n", "nmi", "vi"]]


def q_duplicate_spans(sf_dir: str):
    """(doc_id, n_windows, n_dup_windows, dup_ratio) — ExactSubstr
    duplication diagnostic (Lee et al. 2022): fraction of each doc's
    word-8-gram window positions whose gram occurs >= 2 times in the
    corpus; docs with < 8 words omitted
    (functions/dedup.py::duplicate_span_stats, bitwise SQL twin)."""
    from igraph_ray.functions.dedup import duplicate_span_stats

    return duplicate_span_stats(
        documents(sf_dir).select_columns(["doc_id", "text"])
    )


def q_term_cooccurrence(sf_dir: str):
    """(term_a, term_b, c_xy, c_x, c_y) — top-100 document
    co-occurrence pairs over the df-band [2, 500] vocabulary with
    per-term dfs attached: the exact integer sufficient statistics of
    PMI phrase mining (the log is the consumer's, keeping the table
    bitwise).  functions/text.py::term_cooccurrence; SQL twin via
    distinct-token self-join."""
    from igraph_ray.functions.text import term_cooccurrence

    return term_cooccurrence(
        documents(sf_dir).select_columns(["doc_id", "text"]),
        df_lo=2,
        df_hi=500,
    )


def q_ngram_novelty(sf_dir: str):
    """(doc_id, n_windows, novel_windows, novelty_ratio) — fraction of
    each doc's word-8-gram windows whose gram FIRST appears in that
    doc (memorization/novelty diagnostic; complement of
    duplicate_spans).  functions/dedup.py::ngram_novelty, bitwise SQL
    twin (per-gram MIN(doc_id) election)."""
    from igraph_ray.functions.dedup import ngram_novelty

    return ngram_novelty(
        documents(sf_dir).select_columns(["doc_id", "text"])
    )


def q_vocab_growth(sf_dir: str):
    """(doc_id, new_types, cum_types) — Heaps'-law vocabulary growth
    in doc-id order: distinct word types first seen per doc + running
    vocabulary size (two-phase global ordered scan).
    functions/dedup.py::vocab_growth, bitwise SQL twin (window
    cumsum over per-type min-doc counts)."""
    from igraph_ray.functions.dedup import vocab_growth

    return vocab_growth(
        documents(sf_dir).select_columns(["doc_id", "text"])
    )


def q_remove_dup_spans(sf_dir: str):
    """(doc_id, text_clean, n_words, n_removed_words) — ExactSubstr
    span REMOVAL (Lee et al. 2022 §4.2, word-8-gram windows; global
    first occurrence kept, later occurrences deleted, docs rebuilt
    from surviving words; functions/dedup.py::remove_duplicate_spans,
    sequential-replay pytest oracle + hash-exact SQL twin)."""
    from igraph_ray.functions.dedup import remove_duplicate_spans

    return remove_duplicate_spans(
        documents(sf_dir).select_columns(["doc_id", "text"])
    )


def q_bpe_merges(sf_dir: str):
    """(rank, left, right, merged, count) — first 30 BPE merge rules
    learned over the documents corpus (Sennrich et al. 2016;
    functions/bpe.py; sequential-replay oracle in tests/test_bpe.py).
    Deterministic (max count, lexicographic tie-break) but iterative —
    rows-only at the driver."""
    from igraph_ray.functions.bpe import bpe_train

    return bpe_train(
        documents(sf_dir).select_columns(["doc_id", "text"]),
        num_merges=30,
    )


def q_bpe_token_counts(sf_dir: str):
    """(doc_id, n_words, n_bpe_tokens) — per-document subword counts
    under the 30 learned BPE merges (functions/bpe.py::
    bpe_encode_lengths; per-word replay oracle in tests/test_bpe.py);
    rows-only (iterative training has no SQL twin)."""
    from igraph_ray.functions.bpe import bpe_encode_lengths, bpe_train

    docs = documents(sf_dir).select_columns(["doc_id", "text"])
    merges = bpe_train(docs, num_merges=30)
    return bpe_encode_lengths(docs, merges)


def q_quality_model(sf_dir: str):
    """(doc_id, quality_prob) — model-based quality score: logistic
    regression trained ON THE CORPUS (features = Gopher-rule
    statistics, label = the Gopher keep flag) by distributed
    full-batch GD, then applied in one streaming map
    (functions/quality_model.py; local-replay + separability oracles
    in tests/test_quality_model.py).  Rows-only (float GD)."""
    from igraph_ray.functions.quality_model import score_logreg, train_logreg
    from igraph_ray.functions.text import gopher_rules

    feats = [
        "mean_word_len",
        "symbol_ratio",
        "bullet_line_ratio",
        "ellipsis_line_ratio",
        "alpha_word_ratio",
    ]
    g = gopher_rules(
        documents(sf_dir).select_columns(["doc_id", "text"])
    ).materialize()
    w, _ = train_logreg(g, feats, "keep", iters=80, lr=0.5)
    return score_logreg(g, w, feats).select_columns(
        ["doc_id", "quality_prob"]
    )


def q_fingerprints(sf_dir: str):
    out = winnow_fingerprints(
        documents(sf_dir).select_columns(["doc_id", "text"])
    )

    def count_fp(batch: pa.Table) -> pa.Table:
        n = pc.list_value_length(batch.column("fingerprints"))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_fingerprints": pc.cast(n, pa.int64()),
            }
        )

    return out.map_batches(
        count_fp, batch_format="pyarrow", zero_copy_batch=True
    )


def q_minhash_pairs(sf_dir: str):
    return minhash_near_dup_pairs(
        documents(sf_dir), verify_threshold=0.6
    ).select_columns(["a", "b"])


def q_simhash_pairs(sf_dir: str):
    return simhash_near_dup_pairs(documents(sf_dir), max_hamming=3)


def q_ann_brute(sf_dir: str):
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    qtbl = pa.concat_tables(
        emb.iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("vec_id")
    queries = np.stack(
        [
            np.asarray(qtbl.column("embedding")[i].as_py(), dtype=np.float64)
            for i in range(2)
        ]
    )
    out = brute_force_topk(emb, queries, k=5)
    return out.select_columns(["query_id", "vec_id"])


def q_ann_ivf(sf_dir: str):
    """(query_id, vec_id) — IVF approximate top-k with nprobe ==
    nlist (full probe), which is EXACTLY the brute-force result — the
    same rows as q_ann_brute by construction (equality pinned in
    tests/test_similarity_ivf.py); partial-probe recall is
    pytest-pinned.  Rows-only driver check (approximate operator)."""
    from igraph_ray.functions.similarity import ivf_topk

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    qtbl = pa.concat_tables(
        emb.iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("vec_id")
    queries = np.stack(
        [
            np.asarray(qtbl.column("embedding")[i].as_py(), dtype=np.float64)
            for i in range(2)
        ]
    )
    out = ivf_topk(emb, queries, k=5, nlist=8, nprobe=8, kmeans_iters=5)
    return out.select_columns(["query_id", "vec_id"])


def q_ann_pq(sf_dir: str):
    """(query_id, vec_id) — product-quantization ADC approximate
    top-k over the embeddings table (Jégou et al. 2011); recall vs
    brute force pinned in tests/test_similarity_ivf.py; deterministic
    maximin-seeded training, rows-only driver check (approximate
    operator)."""
    from igraph_ray.functions.similarity import pq_topk

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    qtbl = pa.concat_tables(
        emb.iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("vec_id")
    queries = np.stack(
        [
            np.asarray(qtbl.column("embedding")[i].as_py(), dtype=np.float64)
            for i in range(2)
        ]
    )
    out = pq_topk(emb, queries, k=5, m=4, nbits=4, iters=5)
    return out.select_columns(["query_id", "vec_id"])


def q_scc(sf_dir: str, graph_dir: str | None = None):
    """(key, scc_key) — strongly connected components over a directed
    graph of per-commit member rings (igraph IGRAPH_STRONG mode
    parity); rows-only check, pytest networkx oracle in tests/test_scc.py."""
    import tempfile

    from igraph_ray.kernels.scc import scc as run_scc
    from igraph_ray.stages.edge_rules import ring_edges

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_scc_")
    files = with_file_key(files_from_documents(sf_dir))
    rings = ring_edges(files, "commit", "file_key")
    keys = (
        files.select_columns(["file_key"]).rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(rings, vertices)
    state = run_scc(
        edges, graph_dir, vertices=vertices.select_columns(["vid"])
    )
    tbl = pa.concat_tables(
        state.select_columns(["vid", "scc"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(tbl, vtbl, {"vid": "key", "scc": "scc_key"})


def q_core_histogram(sf_dir: str, graph_dir: str | None = None):
    """(core, n_keys) — k-core size distribution of the E1∪E2 graph
    (igraph coreness surface; the max row is the graph degeneracy).
    Distributed groupby over the core-decomposition kernel state; SQL
    twin wraps the unrolled-peeling core query in a GROUP BY."""
    import tempfile

    from ray.data.aggregate import Count

    from igraph_ray.kernels.kcore import core_numbers

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_coreh_")
    graph, _vtbl = _build_key_graph(sf_dir, graph_dir)
    run = core_numbers(graph)
    return (
        run.state.select_columns(["core"])
        .groupby("core")
        .aggregate(Count("core", alias_name="n_keys"))
    )


def q_two_core_edges(sf_dir: str, graph_dir: str | None = None):
    """(src_key, dst_key) — edge set of the 2-core subgraph (igraph
    k_core subgraph-extraction surface): E1∪E2 edges whose BOTH
    endpoints have core number >= 2.  Core numbers from the
    distributed decomposition kernel, edge filter by broadcast
    lookup; SQL twin joins the unrolled-peeling cores onto the pair
    table."""
    import tempfile

    from igraph_ray.kernels.kcore import core_numbers

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_core2_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    run = core_numbers(graph)
    state = pa.concat_tables(
        run.state.select_columns(["vid", "core"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    svid = state.column("vid").to_numpy(zero_copy_only=False)
    score = state.column("core").to_numpy(zero_copy_only=False)
    order = np.argsort(svid)
    ref = ray.put((svid[order], score[order]))

    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices)

    def in_two_core(batch: pa.Table) -> pa.Table:
        v, c = ray.get(ref)
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        cs = c[np.searchsorted(v, s)]
        cd = c[np.searchsorted(v, d)]
        return batch.filter(pa.array((cs >= 2) & (cd >= 2)))

    kept = edges.map_batches(
        in_two_core, batch_format="pyarrow", zero_copy_batch=True
    )
    tbl = pa.concat_tables(
        b
        for b in kept.select_columns(["src", "dst"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
        if b.num_rows
    )
    vt = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(tbl, vt, {"src": "src_key", "dst": "dst_key"})


def q_core_numbers(sf_dir: str, graph_dir: str | None = None):
    """(key, core) — k-core decomposition of the E1∪E2 graph
    (igraph_coreness parity); rows-only, pytest nx.core_number oracle."""
    import tempfile

    from igraph_ray.kernels.kcore import core_numbers

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_core_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    run = core_numbers(graph)
    state = pa.concat_tables(
        run.state.select_columns(["vid", "core"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    return _vid_to_key(state, vtbl, {"vid": "key"})


def q_near_dedup_clusters(sf_dir: str):
    """(vid, keep_id) — near-dup clusters: LSH pairs → connected
    components (K2 kernel) → min-id representative per cluster."""
    import tempfile

    from igraph_ray.functions.dedup import near_dedup

    return near_dedup(
        documents(sf_dir),
        tempfile.mkdtemp(prefix="igr_nd_"),
        verify_threshold=0.6,
    )


def q_embedding_near_dup(sf_dir: str):
    from igraph_ray.functions.similarity import embedding_near_dup_pairs

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    # random testdata embeddings have no true near-dups, so use a low
    # threshold to exercise the pipeline with non-empty output
    return embedding_near_dup_pairs(
        emb, threshold=0.3, nbits=3
    ).select_columns(["a", "b"])


def q_semdedup(sf_dir: str):
    """(vec_id, cluster, keep) — SemDeDup semantic dedup over the
    embeddings table (Abbas et al. 2023; functions/semdedup.py:
    spherical k-means + per-cluster greedy keeper; brute-replay
    oracle in tests/test_semdedup.py).  Rows-only at the driver
    (float k-means assignments)."""
    from igraph_ray.functions.semdedup import semdedup

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    # random testdata embeddings are far apart → low threshold so the
    # duplicate path is exercised with non-empty removals
    return semdedup(emb, threshold=0.25, target_cluster_size=256)\
        .select_columns(["vec_id", "cluster", "keep"])


def q_dsir_select(sf_dir: str):
    """(doc_id, logw, gumbel_key) — DSIR importance resampling (Xie
    et al. 2023; functions/dsir.py): target = the 'en' documents,
    raw = the whole corpus; hashed unigram+bigram LLR scores + Gumbel
    top-k selection of 50 docs.  Sequential-replay oracle in
    tests/test_dsir.py; rows-only at the driver (float log-weights)."""
    from igraph_ray.functions.dsir import (
        dsir_logratio_lut,
        dsir_scores,
        dsir_select,
        hashed_ngram_counts,
    )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    target = docs.filter(expr="lang == 'en'")
    tc = hashed_ngram_counts(target, n_buckets=16384)
    rc = hashed_ngram_counts(docs, n_buckets=16384)
    llr = dsir_logratio_lut(tc, rc)
    scored = dsir_scores(
        docs.select_columns(["doc_id", "text"]), llr, seed=11
    )
    return dsir_select(scored, k=50)


def q_multimodal_decode(sf_dir: str):
    from igraph_ray.functions.multimodal import (
        decode_images,
        synth_multimodal_table,
    )

    ds = ray.data.from_arrow(synth_multimodal_table(200)).repartition(
        num_blocks=4
    )
    return decode_images(ds).select_columns(["item_id", "mean_intensity"])


# ---------------------------------------------------------------------------
# graph metrics + centralities (igraph reciprocity / density /
# assortativity_degree / similarity_jaccard / closeness / harmonic /
# betweenness parity — kernels/metrics.py, kernels/multibfs.py)
# ---------------------------------------------------------------------------
_PAIRS_CACHE: dict[str, ray.data.Dataset] = {}


def _link_graph_edges_cached(sf_dir: str) -> ray.data.Dataset:
    """Materialized E1∪E2 pair table, shared by the metric queries
    (each would otherwise re-run the rule pipeline several times —
    degree map, wedge pass, stat pass all consume it)."""
    ds = _PAIRS_CACHE.get(sf_dir)
    if ds is None:
        ds = _link_graph_edges(sf_dir).materialize()
        _PAIRS_CACHE[sf_dir] = ds
    return ds


def directed_doc_arcs(sf_dir: str) -> ray.data.Dataset:
    """Deterministic directed key graph derived from documents:
    arc 'v{doc_id % 101}' → 'v{(doc_id*37+11) % 101}', loops dropped
    (dedup happens inside reciprocity's canonical-pair groupby)."""

    def derive(batch: pa.Table) -> pa.Table:
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        s = doc_id % 101
        d = (doc_id * 37 + 11) % 101
        return pa.table(
            {
                "src": pa.array([f"v{i}" for i in s], pa.string()),
                "dst": pa.array([f"v{i}" for i in d], pa.string()),
            }
        )

    return documents(sf_dir).map_batches(
        derive, batch_format="pyarrow", zero_copy_batch=True
    )


def q_reciprocity(sf_dir: str):
    """One row (n_arcs, n_reciprocated, reciprocity) over the directed
    doc-derived key graph — exact-int counts + one IEEE division, so
    the SQL twin matches bitwise."""
    from igraph_ray.kernels.metrics import reciprocity

    r, m, rec = reciprocity(directed_doc_arcs(sf_dir))
    return pa.table(
        {
            "n_arcs": pa.array([m], pa.int64()),
            "n_reciprocated": pa.array([rec], pa.int64()),
            "reciprocity": pa.array([r], pa.float64()),
        }
    )


def q_feedback_arc_set(sf_dir: str):
    """(src, dst) — the Eades–Lin–Smyth feedback arc set of the
    deterministic directed doc graph (same derivation as reciprocity,
    integer vids, distinct arcs, loops kept: they are always feedback
    arcs).  Removing these rows provably leaves a DAG
    (kernels/fas.py; acyclicity + m/2 bound pinned in
    tests/test_fas.py).  Exact SQL twin: the batch-synchronous ELS
    rounds replay with unrolled join-only CTEs."""
    from igraph_ray.kernels.fas import feedback_arc_set

    def derive(batch: pa.Table) -> pa.Table:
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array((doc_id % 101).astype(np.int64)),
                "dst": pa.array(((doc_id * 37 + 11) % 101).astype(np.int64)),
            }
        )

    arcs = (
        documents(sf_dir)
        .select_columns(["doc_id"])
        .map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src", "dst"])
        .aggregate(Count(alias_name="n"))
        .select_columns(["src", "dst"])
    )
    order, fas = feedback_arc_set(arcs)
    return pa.concat_tables(
        fas.iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by([("src", "ascending"), ("dst", "ascending")])


def q_density(sf_dir: str):
    """One row (n_vertices, n_edges, density) of the E1∪E2 key graph
    (vertices = all file keys, including isolated ones)."""
    from igraph_ray.kernels.metrics import density

    m = _link_graph_edges_cached(sf_dir).count()
    n = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .unique("file_key")
    )
    n = len(n) if isinstance(n, list) else int(n)
    return pa.table(
        {
            "n_vertices": pa.array([n], pa.int64()),
            "n_edges": pa.array([m], pa.int64()),
            "density": pa.array([density(n, m)], pa.float64()),
        }
    )


def q_jaccard_similarity(sf_dir: str):
    """(src_key, dst_key, common, jaccard) per E1∪E2 edge — Jaccard
    similarity of the endpoint neighbourhoods
    (igraph similarity_jaccard / nx.jaccard_coefficient semantics);
    exact-int common/degree counts + one IEEE division per row."""
    from igraph_ray.kernels.metrics import jaccard_edge_similarity

    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices).select_columns(["src", "dst"])
    out = jaccard_edge_similarity(edges)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(tbl, vtbl, {"src": "src_key", "dst": "dst_key"})


def q_jaccard_pairs(sf_dir: str):
    """(src_key, dst_key, common, jaccard, dice) for EVERY unordered
    pair with >= 1 common neighbour in the E1∪E2 key graph (igraph
    similarity_jaccard/similarity_dice over the full pair list) —
    exact-int counts + one IEEE division each, bitwise SQL twin.
    Pair orientation follows vid order == lexicographic key order."""
    from igraph_ray.kernels.metrics import jaccard_all_pairs

    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices).select_columns(["src", "dst"])
    out = jaccard_all_pairs(edges)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(tbl, vtbl, {"src": "src_key", "dst": "dst_key"})


def q_graphlet_census(sf_dir: str):
    """One row (n_edges, triangles, k4, diamond, c4, tailed_triangle,
    path4, claw) — induced connected 4-graphlet census of the E1∪E2
    key graph (igraph motifs_randesu size-4 connected classes; PGD
    transform, kernels/graphlets.py; brute-force 4-subset oracle in
    tests/test_graphlets.py).  All exact int64, bitwise SQL twin."""
    from igraph_ray.kernels.graphlets import graphlet_census4

    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices).select_columns(["src", "dst"])
    return graphlet_census4(edges)


def q_maximal_cliques(sf_dir: str):
    """(clique, size) with clique = ordered '|'-joined key list — every
    maximal clique of the E1∪E2 key graph exactly once (igraph
    maximal_cliques / nx.find_cliques; ELS per-vertex BK subproblems,
    kernels/maxcliques.py; NX-exact in tests/test_cliques.py).
    Exact SQL twin via the DEFINITION (recursive sorted clique growth
    + no-extension maximality filter) — algorithm-independent set."""
    from igraph_ray.kernels.maxcliques import maximal_cliques

    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices).select_columns(["src", "dst"])
    out = maximal_cliques(
        edges, vertices=vertices.select_columns(["vid"])
    )
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    keys_arr = vtbl.column("key").combine_chunks()
    joined = [
        "|".join(keys_arr[i].as_py() for i in c)
        for c in tbl.column("clique").to_pylist()
    ]
    return pa.table(
        {
            "clique": pa.array(joined, pa.string()),
            "size": tbl.column("size"),
        }
    ).sort_by([("clique", "ascending")])


def q_rich_club(sf_dir: str):
    """(k, phi) rich-club coefficient per degree threshold over the
    E1∪E2 graph — nx.rich_club_coefficient(normalized=False) parity
    (exact in tests/test_metrics.py); all-int sufficient statistics,
    the SQL twin replays the identical IEEE division."""
    from igraph_ray.kernels.metrics import rich_club

    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices).select_columns(["src", "dst"])
    return rich_club(edges)


def q_eulerian(sf_dir: str):
    """One row (n_nonzero_vertices, n_odd_degree, n_edge_components,
    has_euler_circuit, has_euler_path) over the E1∪E2 key graph —
    igraph has_eulerian_cycle/has_eulerian_path semantics on the
    nonzero-degree subgraph (kernels/metrics.py::eulerian_summary;
    NX-exact in tests/test_metrics.py)."""
    import tempfile

    from igraph_ray.kernels.metrics import eulerian_summary

    graph_dir = tempfile.mkdtemp(prefix="igr_eul_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    run = connected_components(graph)
    pairs = _link_graph_edges_cached(sf_dir)
    vertices_ds = ray.data.from_arrow(vtbl)
    edges = attach_vids(pairs, vertices_ds).select_columns(["src", "dst"])
    return eulerian_summary(edges, run.state.select_columns(["vid", "comp"]))


def q_diversity(sf_dir: str):
    """(key, degree, diversity) — igraph_diversity per vertex of the
    weighted E1∪E2 key graph (kernels/metrics.py::diversity; entropy
    of incident weights / log degree; pure-Python replay oracle in
    tests/test_diversity.py; rows-only — float logs)."""
    from igraph_ray.kernels.metrics import diversity

    return diversity(_link_graph_edges_cached(sf_dir))


def q_burt_constraint(sf_dir: str):
    """(key, constraint) — Burt's structural-holes constraint per
    nonzero-degree vertex of the E1∪E2 key graph (igraph constraint /
    nx.constraint parity; NX-exact in tests/test_metrics.py; float
    wedge sums, so rows-only at the driver)."""
    from igraph_ray.kernels.metrics import burt_constraint

    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices).select_columns(["src", "dst"])
    out = burt_constraint(edges)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(tbl, vtbl, {"vid": "key"})


def q_girth(sf_dir: str):
    """One row (girth) — length of the shortest cycle of the E1∪E2 key
    graph (igraph girth / nx.girth; exact, all-vertex pivots;
    kernels/girth.py; NX-exact in tests/test_girth.py).  -1 encodes
    'no cycle' so the column stays integral."""
    import tempfile

    from igraph_ray.kernels.girth import girth

    graph_dir = tempfile.mkdtemp(prefix="igr_gir_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    vids = vtbl.column("vid").to_numpy(zero_copy_only=False)
    g = girth(graph, vids)
    return pa.table(
        {
            "girth": pa.array(
                [int(g) if np.isfinite(g) else -1], pa.int64()
            )
        }
    )


def q_bipartite(sf_dir: str):
    """(key, color) + summary via color=-1 sentinel absent — per-vertex
    2-coloring of the E1∪E2 key graph when bipartite, or the single
    row ('__is_bipartite__', 0) when an odd cycle exists (igraph
    is_bipartite / nx.bipartite.color; kernels/girth.py::
    bipartite_check; NX-exact in tests/test_girth.py)."""
    import tempfile

    from igraph_ray.kernels.girth import bipartite_check

    graph_dir = tempfile.mkdtemp(prefix="igr_bip_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    run = connected_components(graph)
    roots = np.unique(
        pa.concat_tables(
            run.state.select_columns(["comp"]).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        )
        .column("comp")
        .to_numpy(zero_copy_only=False)
    ).astype(np.int64)
    is_bip, colors = bipartite_check(graph, roots)
    if not is_bip:
        return pa.table(
            {
                "key": pa.array(["__is_bipartite__"]),
                "color": pa.array([0], pa.int64()),
            }
        )
    tbl = pa.concat_tables(
        colors.select_columns(["vid", "color"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    return _vid_to_key(tbl, vtbl, {"vid": "key"})


def _rule_edge_sets(sf_dir: str):
    """Distinct canonical E1 (shared-path) and E2 (commit) pair sets."""
    files = files_from_documents(sf_dir)
    e1 = _agg_pairs(shared_path_edges(files))
    e2 = _agg_pairs(commit_cooccurrence_edges(files))
    return e1, e2


def _q_graph_setop(sf_dir: str, op):
    e1, e2 = _rule_edge_sets(sf_dir)
    out = op(e1, e2, src="src_key", dst="dst_key")
    return out.rename_columns({"src": "src_key", "dst": "dst_key"})


def q_graph_union(sf_dir: str):
    """Distinct canonical pairs in E1 or E2 — igraph_union edge set."""
    from igraph_ray.stages.graph_ops import graph_union

    return _q_graph_setop(sf_dir, graph_union)


def q_graph_intersection(sf_dir: str):
    """Distinct canonical pairs in both E1 and E2 —
    igraph_intersection / nx.intersection edge set."""
    from igraph_ray.stages.graph_ops import graph_intersection

    return _q_graph_setop(sf_dir, graph_intersection)


def q_graph_difference(sf_dir: str):
    """Distinct canonical E1 pairs absent from E2 —
    igraph_difference / nx.difference edge set."""
    from igraph_ray.stages.graph_ops import graph_difference

    return _q_graph_setop(sf_dir, graph_difference)


def q_line_graph(sf_dir: str):
    """(a_src, a_dst, b_src, b_dst) — the line graph L(G) of the E1∪E2
    key graph (igraph linegraph / nx.line_graph; per-endpoint wedge
    expansion, stages/graph_ops.py::line_graph; NX-exact in
    tests/test_graph_ops.py).  Canonical ordering matches the SQL
    self-join twin (vid order == lexicographic key order)."""
    from igraph_ray.stages.graph_ops import line_graph

    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices).select_columns(["src", "dst"])
    out = line_graph(edges)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(
        tbl,
        vtbl,
        {
            "a_src": "a_src",
            "a_dst": "a_dst",
            "b_src": "b_src",
            "b_dst": "b_dst",
        },
    )


def q_avg_neighbor_degree(sf_dir: str):
    """(key, degree, sum_nbr_deg, knn) per vertex of the E1∪E2 graph —
    nx.average_neighbor_degree / igraph knn parity (exact in
    tests/test_metrics.py); exact int64 sums + one IEEE division per
    row, SQL-twin bitwise."""
    from igraph_ray.kernels.metrics import avg_neighbor_degree

    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices).select_columns(["src", "dst"])
    tbl = pa.concat_tables(
        avg_neighbor_degree(edges).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(tbl, vtbl, {"key": "key"})


def q_degree_connectivity(sf_dir: str):
    """(k, knnk) — nx.average_degree_connectivity / igraph knnk over
    the E1∪E2 graph; driver reduces distinct-degree-bounded histogram
    partials of exact int64 sums, SQL-twin bitwise."""
    from igraph_ray.kernels.metrics import degree_connectivity

    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices).select_columns(["src", "dst"])
    return degree_connectivity(edges)


def q_assortativity(sf_dir: str):
    """One row of exact int64 Pearson sufficient statistics over the
    E1∪E2 degree pairs plus the assortativity coefficient — the SQL
    twin replays the identical HUGEINT→DOUBLE expression."""
    from igraph_ray.kernels.metrics import degree_assortativity

    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices).select_columns(["src", "dst"])
    r, s = degree_assortativity(edges)
    return pa.table(
        {
            "n_arcs": pa.array([s["m"]], pa.int64()),
            "sum_x": pa.array([s["sx"]], pa.int64()),
            "sum_y": pa.array([s["sy"]], pa.int64()),
            "sum_xy": pa.array([s["sxy"]], pa.int64()),
            "sum_xx": pa.array([s["sxx"]], pa.int64()),
            "sum_yy": pa.array([s["syy"]], pa.int64()),
            "assortativity": pa.array([r], pa.float64()),
        }
    )


def q_betweenness(sf_dir: str, graph_dir: str | None = None):
    """(key, betweenness) — pivot-sampled Brandes (k=12, the
    nx.betweenness_centrality(G, k=...) estimator) over the E1∪E2
    graph; rows-only (float sums over sampled pivots), exact-mode
    semantics verified by the pytest networkx oracle."""
    import tempfile

    from igraph_ray.kernels.betweenness import betweenness_centrality

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_bc_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    out = betweenness_centrality(graph, k=min(12, vtbl.num_rows))
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    return _vid_to_key(tbl, vtbl, {"vid": "key"})


def q_edge_betweenness(sf_dir: str, graph_dir: str | None = None):
    """(a_key, b_key, ebc) — pivot-sampled edge betweenness (k=12)
    over the E1∪E2 graph; rows-only (float sums over sampled pivots),
    exact-mode semantics verified by the pytest networkx oracle."""
    import tempfile

    from igraph_ray.kernels.betweenness import edge_betweenness

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_ebc_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    pairs = _link_graph_edges(sf_dir)
    vertices_ds = ray.data.from_arrow(vtbl)
    edges = attach_vids(pairs, vertices_ds)
    out = edge_betweenness(graph, edges, k=min(12, vtbl.num_rows))
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    return _vid_to_key(tbl, vtbl, {"a": "a_key", "b": "b_key"})


def q_harmonic(sf_dir: str, graph_dir: str | None = None):
    """(key, harmonic) — pivot-sampled harmonic centrality (k=64 BFS
    lanes in ONE multi-pivot chassis run); rows-only, exact-mode
    semantics verified by the pytest networkx oracle."""
    import tempfile

    from igraph_ray.kernels.multibfs import harmonic_centrality

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_hc_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    out = harmonic_centrality(graph, vtbl.num_rows, k=64)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    return _vid_to_key(tbl, vtbl, {"vid": "key"})


def q_closeness(sf_dir: str, graph_dir: str | None = None):
    """(key, closeness) — pivot-sampled closeness (wf_improved,
    nx.closeness_centrality semantics in exact mode); shares the
    multi-pivot BFS chassis run shape with q_harmonic.  Hash twin:
    hop distances are exact ints, so the per-vertex Σd/reach counts
    replay in SQL (splitmix64 pivot draw + recursive-CTE BFS) and the
    scaling arithmetic is a fixed IEEE expression tree."""
    import tempfile

    from igraph_ray.kernels.multibfs import closeness_centrality

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_cl_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    out = closeness_centrality(graph, vtbl.num_rows, k=64)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    return _vid_to_key(tbl, vtbl, {"vid": "key"})


def q_closeness_weighted(sf_dir: str, graph_dir: str | None = None):
    """(key, closeness) — pivot-sampled WEIGHTED closeness over the
    E1∪E2 graph (edge weight = co-occurrence count as distance;
    nx.closeness_centrality(G, distance=...) semantics in exact mode).
    Weights are integers, so the min-plus distance sums are exact ints
    and the SQL twin (splitmix64 pivot draw + weighted recursive-CTE
    closure) replays the closeness expression bitwise."""
    import tempfile

    from igraph_ray.kernels.multibfs import closeness_centrality

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_clw_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    out = closeness_centrality(graph, vtbl.num_rows, k=64, weighted=True)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    return _vid_to_key(tbl, vtbl, {"vid": "key"})


def q_betweenness_weighted(sf_dir: str, graph_dir: str | None = None):
    """(key, betweenness) — pivot-sampled WEIGHTED Brandes (k=12,
    weights = co-occurrence counts as distances;
    nx.betweenness_centrality(G, weight=...) estimator) via the
    shortest-path-DAG level kernels (kernels/weighted_brandes.py);
    rows-only (float δ sums over sampled pivots), exact-mode parity
    vs networkx in tests/test_weighted_brandes.py."""
    import tempfile

    from igraph_ray.kernels.betweenness import betweenness_centrality

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_bcw_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    out = betweenness_centrality(
        graph, k=min(12, vtbl.num_rows), weighted=True
    )
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    return _vid_to_key(tbl, vtbl, {"vid": "key"})


def q_eigenvector(sf_dir: str, graph_dir: str | None = None):
    """(key, centrality) — eigenvector centrality over the E1∪E2
    graph via the INTEGER-EXACT fixed power iteration
    (kernels/eigenvector.py::eigenvector_fixed_integer: x0 = 1, norm
    pinned to 1 for T = f(max weighted degree) iterations, one exact
    final normalization) — every sum is an exact integer, so the run
    is order-independent and the DuckDB twin replays it bitwise.
    nx-tol parity of the standard mode stays pytest-gated
    (tests/test_eigen_hits.py)."""
    import tempfile

    from igraph_ray.kernels.eigenvector import eigenvector_fixed_integer

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_ev_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    tbl = eigenvector_fixed_integer(graph, vtbl.num_rows)
    return _vid_to_key(tbl, vtbl, {"vid": "key"})


def q_hits(sf_dir: str):
    """(vid, authority, hub) — HITS over the directed doc-derived
    graph (vid = doc_id % 101 numeric keys) via the INTEGER-EXACT
    fixed alternating power iteration
    (kernels/hits.py::hits_fixed_integer: h0 = 1, norms pinned at 1,
    exact final sum normalization) — order-independent, bitwise
    DuckDB-replayable.  Tol-mode dense-eig parity stays pytest-gated
    (tests/test_eigen_hits.py)."""
    import tempfile

    from igraph_ray.kernels.hits import hits_fixed_integer

    def derive(batch: pa.Table) -> pa.Table:
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        s = (doc_id % 101).astype(np.int64)
        d = ((doc_id * 37 + 11) % 101).astype(np.int64)
        keep = s != d
        return pa.table({"src": pa.array(s[keep]), "dst": pa.array(d[keep])})

    arcs = documents(sf_dir).map_batches(
        derive, batch_format="pyarrow", zero_copy_batch=True
    )
    return hits_fixed_integer(arcs, tempfile.mkdtemp(prefix="igr_hits_"), 101)


def q_ktruss(sf_dir: str):
    """(src_key, dst_key) — edges of the 3-truss of the E1∪E2 graph
    (nx.k_truss parity); rows-only, pytest oracle (peeling is not
    SQL-expressible)."""
    from igraph_ray.kernels.ktruss import k_truss

    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices).select_columns(["src", "dst"])
    out = k_truss(edges, k=3)
    batches = list(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    if not batches:
        return pa.table(
            {
                "src_key": pa.array([], pa.string()),
                "dst_key": pa.array([], pa.string()),
            }
        )
    tbl = pa.concat_tables(batches)
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(tbl, vtbl, {"src": "src_key", "dst": "dst_key"})


def q_mst(sf_dir: str):
    """(src_key, dst_key, weight) — minimum spanning forest of the
    E1∪E2 graph (weight = co-occurrence count, deterministic
    lexicographic tie-break); rows-only, pytest oracle (Borůvka is
    not SQL-expressible)."""
    import tempfile

    from igraph_ray.kernels.mst import minimum_spanning_forest

    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices)
    out = minimum_spanning_forest(
        edges, tempfile.mkdtemp(prefix="igr_msf_")
    )
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(tbl, vtbl, {"src": "src_key", "dst": "dst_key"})


def q_adamic_adar(sf_dir: str):
    """(src_key, dst_key, adamic_adar) per E1∪E2 edge — Adamic–Adar
    index (igraph similarity_inverse_log_weighted flavour /
    nx.adamic_adar_index); rows-only (float ln-sums are summation-
    order-dependent), pytest oracle."""
    from igraph_ray.kernels.metrics import adamic_adar_edges

    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices).select_columns(["src", "dst"])
    out = adamic_adar_edges(edges)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(tbl, vtbl, {"src": "src_key", "dst": "dst_key"})


def _ecc_table(sf_dir: str, graph_dir: str | None = None) -> pa.Table:
    """(key, eccentricity) with ALL vertices as BFS pivots when the
    key graph is small (≤128 keys — always true for the modular
    files derivation), else a 128-pivot lower-bound estimate."""
    import tempfile

    from igraph_ray.kernels.multibfs import eccentricity, sample_pivots

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_ecc_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    vids = vtbl.column("vid").to_numpy(zero_copy_only=False)
    pivots = sample_pivots(vids, 128 if len(vids) > 128 else None)
    out = eccentricity(graph, pivots)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    return _vid_to_key(tbl, vtbl, {"vid": "key"})


def q_eccentricity(sf_dir: str):
    """(key, eccentricity) over the E1∪E2 graph — exact hop
    eccentricities (all-pivot multi-BFS); integer output, SQL twin is
    the all-pairs recursive-CTE closure."""
    return _ecc_table(sf_dir)


def q_diameter(sf_dir: str):
    """One row (diameter, radius) of the E1∪E2 graph (per-component
    max/min eccentricity — igraph_diameter/igraph_radius unconn
    semantics)."""
    tbl = _ecc_table(sf_dir)
    ecc = tbl.column("eccentricity").to_numpy(zero_copy_only=False)
    d = int(ecc.max()) if len(ecc) else 0
    r = int(ecc.min()) if len(ecc) else 0
    return pa.table(
        {
            "diameter": pa.array([d], pa.int64()),
            "radius": pa.array([r], pa.int64()),
        }
    )


def q_diameter_weighted(sf_dir: str, graph_dir: str | None = None):
    """One row (weighted_diameter, weighted_radius) of the E1∪E2 key
    graph — per-component max/min weighted eccentricity with edge
    weights as distances (igraph_diameter weights= / nx.eccentricity
    weight= semantics); integer weight sums, so the all-source
    min-plus recursive-CTE twin matches bitwise."""
    import tempfile

    from igraph_ray.kernels.multibfs import eccentricity

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_wecc_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    vids = vtbl.column("vid").to_numpy(zero_copy_only=False)
    out = eccentricity(graph, vids, weighted=True)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    ecc = tbl.column("eccentricity").to_numpy(zero_copy_only=False)
    d = int(ecc.max()) if len(ecc) else 0
    r = int(ecc.min()) if len(ecc) else 0
    return pa.table(
        {
            "weighted_diameter": pa.array([d], pa.int64()),
            "weighted_radius": pa.array([r], pa.int64()),
        }
    )


def q_k_shortest_paths(sf_dir: str):
    """(rank, cost, route) — the 5 cheapest simple routes between the
    lexicographically smallest key and the largest key of ITS
    component in the E1∪E2 graph (igraph get_k_shortest_paths /
    nx.shortest_simple_paths; Yen, bounded gather, kernels/kpaths.py;
    NX-exact in tests/test_kpaths.py).  Rows-only (sequential spur
    recursion)."""
    import tempfile

    from igraph_ray.kernels.kpaths import k_shortest_paths

    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices).select_columns(["src", "dst"])

    def both(batch: pa.Table) -> pa.Table:
        s = batch.column("src").combine_chunks()
        d = batch.column("dst").combine_chunks()
        return pa.table(
            {
                "src": pa.concat_arrays([s, d]),
                "dst": pa.concat_arrays([d, s]),
            }
        )

    arcs = edges.map_batches(both, batch_format="pyarrow", zero_copy_batch=True)
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    graph, _ = _build_key_graph(sf_dir, tempfile.mkdtemp(prefix="igr_ksp_"))
    run = connected_components(graph)
    comp = pa.concat_tables(
        run.state.select_columns(["vid", "comp"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    cv = comp.column("vid").to_numpy(zero_copy_only=False)
    cc = comp.column("comp").to_numpy(zero_copy_only=False)
    comp0 = cc[np.argmin(cv)]
    target = int(cv[cc == comp0].max())
    out = k_shortest_paths(arcs, 0, target, k=5)
    keys_arr = vtbl.column("key").combine_chunks()
    routes = [
        "|".join(keys_arr[i].as_py() for i in p)
        for p in out.column("path").to_pylist()
    ]
    return pa.table(
        {
            "rank": out.column("rank"),
            "cost": pc.cast(out.column("cost"), pa.int64()),
            "route": pa.array(routes, pa.string()),
        }
    )


def q_fr_layout(sf_dir: str, graph_dir: str | None = None):
    """(key, x, y) — deterministic Fruchterman–Reingold layout of the
    E1∪E2 key graph (igraph layout_fruchterman_reingold;
    kernels/layout.py; structural + determinism oracles in
    tests/test_layout.py).  Rows-only (float force simulation)."""
    import tempfile

    from igraph_ray.kernels.layout import fruchterman_reingold

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_fr_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    out = fruchterman_reingold(graph, iterations=30)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    return _vid_to_key(tbl, vtbl, {"vid": "key"})


def q_random_walks(sf_dir: str, graph_dir: str | None = None):
    """(walk_id, p0..p8) — deterministic 8-step walk corpus from every
    key of the E1∪E2 graph (DeepWalk-style corpus generation);
    rows-only (bitwise-reproducible by construction, pytest oracle
    replays the reference walk)."""
    import tempfile

    from igraph_ray.kernels.walks import random_walks

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_rw_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    starts = vtbl.column("vid").to_numpy(zero_copy_only=False)
    out = random_walks(graph, starts, length=8, seed=42)
    return pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )


def q_mis(sf_dir: str, graph_dir: str | None = None):
    """(key, in_mis) — deterministic Luby maximal independent set over
    the E1∪E2 graph; rows-only (which MIS depends on priorities),
    independence+maximality pytest oracle."""
    import tempfile

    from igraph_ray.kernels.mis import maximal_independent_set

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_mis_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    out = maximal_independent_set(graph)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    return _vid_to_key(tbl, vtbl, {"vid": "key"})


def q_clustering(sf_dir: str):
    """(key, clustering) — per-vertex local clustering coefficient of
    the E1∪E2 graph (0.0 for keys with degree < 2, including isolated
    keys).  SQL-checked: both engines form exact integer triangle and
    degree counts and apply the identical IEEE expression
    ``t / (d·(d−1)/2)``, so the division matches bitwise."""
    from igraph_ray.kernels.triangles import local_clustering

    pairs = _link_graph_edges(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices)
    cc = pa.concat_tables(
        local_clustering(edges).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    # dense vids → scatter into a zero-filled vector (isolated keys
    # have no edge-table row; nx.clustering gives them 0.0)
    full = np.zeros(len(vtbl), np.float64)
    full[cc.column("vid").to_numpy(zero_copy_only=False)] = cc.column(
        "clustering"
    ).to_numpy(zero_copy_only=False)
    return pa.table(
        {"key": vtbl.column("key"), "clustering": pa.array(full)}
    )


def q_degree_histogram(sf_dir: str):
    """(degree, n_keys) — degree distribution of the E1∪E2 graph over
    keys that appear in at least one link pair (igraph
    ``degree_distribution`` surface)."""
    return (
        q_degrees(sf_dir)
        .groupby("degree")
        .aggregate(Count("degree", alias_name="n_keys"))
    )


def q_degree_realization(sf_dir: str):
    """(degree, n_keys) — degree histogram of a Havel–Hakimi
    REALIZATION of the E1∪E2 degree sequence (igraph
    ``igraph_realize_degree_sequence`` surface).  The realized graph
    is rebuilt as a Dataset and its degrees recounted DISTRIBUTEDLY
    (undirected_degrees partial/combiner), so the SQL twin — the
    degree histogram of the ORIGINAL graph — hash-matches iff the
    realization reproduced the sequence exactly.  nx.is_graphical
    property parity on arbitrary sequences in
    tests/test_degree_extra.py."""
    from ray.data.aggregate import Count as _Count

    from igraph_ray.kernels.degree import (
        havel_hakimi_realize,
        undirected_degrees,
    )

    deg = q_degrees(sf_dir).select_columns(["degree"])
    blocks = [
        b
        for b in deg.iter_batches(batch_format="pyarrow", batch_size=None)
        if b.num_rows
    ]
    d = (
        pa.concat_tables(blocks).column("degree").to_numpy(zero_copy_only=False)
        if blocks
        else np.zeros(0, dtype=np.int64)
    )
    realized = ray.data.from_arrow(havel_hakimi_realize(d))
    hist = (
        undirected_degrees(realized)
        .groupby("degree")
        .aggregate(_Count("degree", alias_name="n_keys"))
    )
    return hist


def q_power_law_fit(sf_dir: str):
    """One row (xmin, alpha, n_tail, ks) — Clauset–Shalizi–Newman
    power-law fit of the E1∪E2 degree distribution (igraph
    ``igraph_power_law_fit`` surface): distributed degree histogram
    reduce, vectorized KS-minimizing xmin scan.  Rows-only (float
    MLE); brute-force CSN parity + known-alpha recovery in
    tests/test_plfit.py."""
    from igraph_ray.kernels.plfit import fit_power_law

    res = fit_power_law(
        q_degrees(sf_dir).select_columns(["degree"])
    )
    return pa.table(
        {
            "xmin": pa.array([res["xmin"]], pa.float64()),
            "alpha": pa.array([res["alpha"]], pa.float64()),
            "n_tail": pa.array([res["n_tail"]], pa.int64()),
            "ks": pa.array([res["ks"]], pa.float64()),
        }
    )


def q_graphicality(sf_dir: str):
    """(k, lhs, rhs, slack) — Erdős–Gallai graphicality certificate
    of the E1∪E2 degree sequence (igraph ``igraph_is_graphical``
    surface): row k carries the top-k degree sum, the bound
    k(k-1) + sum_{i>k} min(d_i, k), and the slack.  A sequence is
    graphical iff the total is even and every slack >= 0; the
    sequence here comes from an actual graph, so the VALUES (not the
    verdict) are the tested surface.  Exact int64 end-to-end —
    bitwise SQL twin; nx.is_graphical property test on arbitrary
    (incl. non-graphical) sequences in tests/test_degree_extra.py."""
    from igraph_ray.kernels.degree import erdos_gallai_slack

    deg = q_degrees(sf_dir).select_columns(["degree"])
    blocks = [
        b
        for b in deg.iter_batches(batch_format="pyarrow", batch_size=None)
        if b.num_rows
    ]
    d = (
        pa.concat_tables(blocks).column("degree").to_numpy(zero_copy_only=False)
        if blocks
        else np.zeros(0, dtype=np.int64)
    )
    return erdos_gallai_slack(d)


def q_katz(sf_dir: str, graph_dir: str | None = None):
    """(key, centrality) — truncated Katz walk-count centrality of
    the E1∪E2 graph at ``alpha = 1/16`` via the INTEGER-EXACT scaled
    recurrence (kernels/katz.py::katz_fixed_integer: y ← A'y + 16·z,
    z ← 16z from y0 = 0, T = f(max weighted degree) iterations, one
    exact final L2 normalization — the 16^T scale cancels) — every
    sum is an exact integer, order-independent, and the DuckDB twin
    replays it bitwise.  Convergent nx-parity mode
    (``katz_centrality``) stays pytest-gated (tests/test_katz.py)."""
    import tempfile

    from igraph_ray.kernels.katz import katz_fixed_integer

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_katz_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    tbl = katz_fixed_integer(graph, graph.num_vertices)
    return _vid_to_key(tbl, vtbl, {"vid": "key"})


def q_coloring(sf_dir: str, graph_dir: str | None = None):
    """(key, color) — greedy vertex coloring (iterated Luby) of the
    E1∪E2 graph; rows-only (which proper coloring depends on
    priorities), proper/contiguous/≤Δ+1 pytest oracle."""
    import tempfile

    from igraph_ray.kernels.coloring import greedy_coloring

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_col_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    out = greedy_coloring(graph)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    return _vid_to_key(tbl, vtbl, {"vid": "key"})


def _key_edge_vids(sf_dir: str):
    """Canonical (src, dst) vid edge dataset + vertex table of the
    E1∪E2 key graph, vids consistent with _build_key_graph (same
    deterministic dense-rank rule)."""
    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices).select_columns(["src", "dst"])
    return edges, vertices


def q_coloring_validity(sf_dir: str, graph_dir: str | None = None):
    """One row (conflicts, contiguous, within_bound) — distributed
    property validation of the greedy coloring witness (proper, colors
    contiguous from 0, ≤Δ+1).  SQL twin is the constant row the
    property demands; a broken coloring kernel breaks the hash."""
    import tempfile

    from igraph_ray.kernels.coloring import greedy_coloring
    from igraph_ray.kernels.validity import coloring_validity

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_colv_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    out = greedy_coloring(graph)
    edges, _ = _key_edge_vids(sf_dir)
    return coloring_validity(edges, out)


def q_mis_validity(sf_dir: str, graph_dir: str | None = None):
    """One row (independence_violations, non_dominated) — distributed
    validation of the Luby MIS witness.  SQL twin: SELECT 0, 0."""
    import tempfile

    from igraph_ray.kernels.mis import maximal_independent_set
    from igraph_ray.kernels.validity import mis_validity

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_misv_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    out = maximal_independent_set(graph)
    edges, _ = _key_edge_vids(sf_dir)
    return mis_validity(edges, out, vtbl.num_rows)


def q_dominating_validity(sf_dir: str, graph_dir: str | None = None):
    """One row (undominated, nonempty) — distributed validation of
    the greedy span-nomination dominating set witness
    (nx.dominating_set surface; deterministic chassis rounds, so the
    witness itself is also stable run-to-run).  SQL twin:
    SELECT 0, TRUE."""
    import tempfile

    from igraph_ray.kernels.dominating import dominating_set
    from igraph_ray.kernels.validity import dominating_validity

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_domv_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    out = dominating_set(graph)
    edges, _ = _key_edge_vids(sf_dir)
    return dominating_validity(edges, out, vtbl.num_rows)


def q_matching_validity(sf_dir: str):
    """One row (overlaps, uncovered_edges) — distributed validation of
    the maximal-matching witness.  SQL twin: SELECT 0, 0."""
    from igraph_ray.kernels.matching import maximal_matching
    from igraph_ray.kernels.validity import matching_validity

    edges, vertices = _key_edge_vids(sf_dir)
    out = maximal_matching(edges)
    n = vertices.count()
    return matching_validity(edges, out, n)


def q_max_flow(sf_dir: str):
    """One row (flow_value, cut_capacity, cut_n, lambda_st) — s-t max
    flow / min cut / edge connectivity between the two top-degree keys
    of the E1∪E2 graph (capacity = co-occurrence count, undirected;
    igraph_maxflow / igraph_st_mincut surface).  Deterministic but not
    SQL-expressible (augmenting paths); exact nx.maximum_flow /
    nx.minimum_cut / nx.edge_connectivity parity in
    tests/test_maxflow.py."""
    from igraph_ray.kernels.maxflow import max_flow, st_edge_connectivity

    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices).map_batches(
        lambda b: pa.table(
            {
                "src": b.column("src"),
                "dst": b.column("dst"),
                "capacity": pc.cast(b.column("weight"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    n = vertices.count()

    # endpoints: the heaviest edge's endpoints (capacity DESC, src/dst
    # ASC tie-break) — deterministic AND guaranteed connected, so the
    # flow value is a non-trivial invariant of the whole component
    top = (
        edges.sort(
            ["capacity", "src", "dst"], descending=[True, False, False]
        )
        .limit(1)
        .take_all()
    )
    s, t = int(top[0]["src"]), int(top[0]["dst"])

    res = max_flow(edges, n, s, t, "capacity", directed=False)
    lam = st_edge_connectivity(edges, n, s, t, directed=False)
    return pa.table(
        {
            "flow_value": pa.array([res["value"]], pa.int64()),
            "cut_capacity": pa.array(
                [int(res["cut_edges"].column("capacity").to_pandas().sum())],
                pa.int64(),
            ),
            "cut_n": pa.array([res["cut_edges"].num_rows], pa.int64()),
            "lambda_st": pa.array([lam], pa.int64()),
        }
    )


def q_global_min_cut(sf_dir: str, graph_dir: str | None = None):
    """One row (cut_value, side_n, lcc_cut_value, lcc_side_n) —
    Stoer-Wagner global minimum weighted cut (igraph_mincut surface)
    of the full E1∪E2 graph (0 when disconnected) AND of its largest
    connected component (the non-trivial invariant), composed with
    the distributed components kernel; rows-only (maximum-adjacency
    phases not SQL-expressible); exact nx.stoer_wagner parity in
    tests/test_maxflow.py."""
    import tempfile

    from ray.data.aggregate import Count

    from igraph_ray.kernels.maxflow import min_cut

    edges, _vertices = _key_edge_vids_weighted(sf_dir)
    value, side = min_cut(edges, capacity_col="capacity")

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_gmc_")
    graph, _vtbl = _build_key_graph(sf_dir, graph_dir)
    run = connected_components(graph)
    sizes = (
        run.state.groupby("comp")
        .aggregate(Count(alias_name="n"))
        .sort(["n", "comp"], descending=[True, False])
        .limit(1)
        .take_all()
    )
    big = int(sizes[0]["comp"])
    comp_tbl = pa.concat_tables(
        run.state.select_columns(["vid", "comp"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    cvid = comp_tbl.column("vid").to_numpy(zero_copy_only=False)
    ccomp = comp_tbl.column("comp").to_numpy(zero_copy_only=False)
    order = np.argsort(cvid)
    ref = ray.put((cvid[order], ccomp[order]))

    def in_lcc(batch: pa.Table) -> pa.Table:
        v, c = ray.get(ref)
        s = batch.column("src").to_numpy(zero_copy_only=False)
        keep = c[np.searchsorted(v, s)] == big
        return batch.filter(pa.array(keep))

    lcc_edges = edges.map_batches(
        in_lcc, batch_format="pyarrow", zero_copy_batch=True
    )
    lcc_value, lcc_side = min_cut(lcc_edges, capacity_col="capacity")
    return pa.table(
        {
            "cut_value": pa.array([int(value)], pa.int64()),
            "side_n": pa.array([len(side)], pa.int64()),
            "lcc_cut_value": pa.array([int(lcc_value)], pa.int64()),
            "lcc_side_n": pa.array([len(lcc_side)], pa.int64()),
        }
    )


def q_gomory_hu(sf_dir: str):
    """(u_key, v_key, flow) — Gomory-Hu cut tree of the E1∪E2 graph
    (igraph_gomory_hu_tree surface, Gusfield scheme, deterministic
    vid-order flows); rows-only; all-pairs min-cut parity vs
    nx.gomory_hu_tree in tests/test_maxflow.py."""
    from igraph_ray.kernels.maxflow import gomory_hu_tree

    edges, vertices = _key_edge_vids_weighted(sf_dir)
    tree = gomory_hu_tree(edges, capacity_col="capacity")
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(tree, vtbl, {"u": "u_key", "v": "v_key"})


def q_vertex_connectivity(sf_dir: str, graph_dir: str | None = None):
    """One row (lcc_n, lcc_delta, lcc_kappa) — global vertex
    connectivity (igraph_vertex_connectivity surface; Even/Whitney
    minimum-degree pair reduction, each candidate kappa(s,t) an
    independent unit-capacity Dinic on the node-split graph fanned
    out in parallel over a once-shared arc table) of the largest
    connected component of the E1∪E2 graph, with the component size
    and its minimum degree (kappa <= delta is the reported sanity
    invariant).  Exact SQL twin via the kappa<=delta sandwich +
    avoid-set reachability (valid for delta(LCC) <= 3, documented);
    exact nx.node_connectivity parity in tests/test_maxflow.py."""
    import tempfile

    from ray.data.aggregate import Count, Min

    from igraph_ray.kernels.maxflow import vertex_connectivity

    edges, _vertices = _key_edge_vids(sf_dir)

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_vc_")
    graph, _vtbl = _build_key_graph(sf_dir, graph_dir)
    run = connected_components(graph)
    sizes = (
        run.state.groupby("comp")
        .aggregate(Count(alias_name="n"))
        .sort(["n", "comp"], descending=[True, False])
        .limit(1)
        .take_all()
    )
    big = int(sizes[0]["comp"])
    lcc_n = int(sizes[0]["n"])
    comp_tbl = pa.concat_tables(
        run.state.select_columns(["vid", "comp"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    cvid = comp_tbl.column("vid").to_numpy(zero_copy_only=False)
    ccomp = comp_tbl.column("comp").to_numpy(zero_copy_only=False)
    lcc_vids = np.sort(cvid[ccomp == big])
    ref = ray.put(lcc_vids)

    def remap(batch: pa.Table) -> pa.Table:
        """Keep LCC edges, renumbered to dense 0..lcc_n-1 (component
        membership of src implies dst, but both are checked)."""
        lv = ray.get(ref)
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        si = np.searchsorted(lv, s)
        di = np.searchsorted(lv, d)
        si = np.minimum(si, len(lv) - 1)
        di = np.minimum(di, len(lv) - 1)
        keep = (lv[si] == s) & (lv[di] == d)
        return pa.table(
            {
                "src": pa.array(si[keep].astype(np.int64)),
                "dst": pa.array(di[keep].astype(np.int64)),
            }
        )

    lcc_edges = edges.map_batches(
        remap, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    if lcc_n <= 1:
        delta = 0
        kappa = 0
    else:
        und = lcc_edges.union(
            lcc_edges.map_batches(
                lambda b: pa.table(
                    {"src": b.column("dst"), "dst": b.column("src")}
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        )
        deg = und.groupby("src").aggregate(Count(alias_name="deg"))
        delta = int(deg.aggregate(Min("deg"))["min(deg)"])
        kappa = vertex_connectivity(lcc_edges, lcc_n)
    return pa.table(
        {
            "lcc_n": pa.array([lcc_n], pa.int64()),
            "lcc_delta": pa.array([delta], pa.int64()),
            "lcc_kappa": pa.array([kappa], pa.int64()),
        }
    )


def q_cycle_basis(sf_dir: str):
    """One row (rank, total_weight, max_cycle_len) — exact minimum
    weight cycle basis (igraph_minimum_cycle_basis surface; Horton
    candidate set from parallel per-pivot Dijkstra tasks, matroid
    greedy over GF(2) edge bitsets) of the E1∪E2 graph with
    co-occurrence weights.  The basis total weight and the rank
    m - n + c are canonical invariants.  Rows-only (GF(2) elimination
    not SQL-expressible); exact nx / brute-force matroid parity in
    tests/test_cyclebasis.py."""
    from igraph_ray.kernels.cyclebasis import minimum_cycle_basis

    edges, vertices = _key_edge_vids_weighted(sf_dir)
    n = vertices.count()
    res = minimum_cycle_basis(edges, n, weight_col="capacity")
    return pa.table(
        {
            "rank": pa.array([res["rank"]], pa.int64()),
            "total_weight": pa.array([res["total_weight"]], pa.int64()),
            "max_cycle_len": pa.array(
                [max(res["cycle_sizes"], default=0)], pa.int64()
            ),
        }
    )


def q_eulerian_circuit(sf_dir: str, graph_dir: str | None = None):
    """One row (circuit_len, usage_violations, broken_steps, closed)
    — Hierholzer Eulerian circuit (igraph_eulerian_circuit surface)
    of the DOUBLED largest connected component of the E1∪E2 graph
    (doubling every edge makes all degrees even, so the circuit
    always exists — the classic route-inspection relaxation).  Edge
    usage is validated DISTRIBUTEDLY (signed-count diff of the
    circuit's steps against the doubled edge table); chain/closure
    are vectorized checks on the bounded circuit itself.  SQL twin
    recomputes circuit_len = 2 * LCC edge count via the recursive-CC
    CTE and states the property constants — a broken construction
    breaks the hash."""
    import tempfile

    from ray.data.aggregate import Count

    from igraph_ray.kernels.euler import eulerian_circuit

    edges, _vertices = _key_edge_vids(sf_dir)

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_eulc_")
    graph, _vtbl = _build_key_graph(sf_dir, graph_dir)
    run = connected_components(graph)
    sizes = (
        run.state.groupby("comp")
        .aggregate(Count(alias_name="n"))
        .sort(["n", "comp"], descending=[True, False])
        .limit(1)
        .take_all()
    )
    big = int(sizes[0]["comp"])
    comp_tbl = pa.concat_tables(
        run.state.select_columns(["vid", "comp"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    cvid = comp_tbl.column("vid").to_numpy(zero_copy_only=False)
    ccomp = comp_tbl.column("comp").to_numpy(zero_copy_only=False)
    order = np.argsort(cvid)
    ref = ray.put((cvid[order], ccomp[order]))

    def in_lcc(batch: pa.Table) -> pa.Table:
        v, c = ray.get(ref)
        s = batch.column("src").to_numpy(zero_copy_only=False)
        keep = c[np.searchsorted(v, s)] == big
        return batch.filter(pa.array(keep))

    lcc_edges = edges.map_batches(
        in_lcc, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    doubled = lcc_edges.union(lcc_edges)
    circuit = eulerian_circuit(doubled)

    # distributed usage check: +1 per circuit step, -1 per doubled
    # edge row, canonical (lo, hi) key — every key must net to zero
    def canon_steps(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "lo": pa.array(np.minimum(u, v)),
                "hi": pa.array(np.maximum(u, v)),
                "sgn": pa.array(np.ones(len(u), np.int64)),
            }
        )

    def canon_edges(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "lo": pa.array(np.minimum(s, d)),
                "hi": pa.array(np.maximum(s, d)),
                "sgn": pa.array(np.full(len(s), -1, np.int64)),
            }
        )

    signed = ray.data.from_arrow(circuit).map_batches(
        canon_steps, batch_format="pyarrow", zero_copy_batch=True
    ).union(
        doubled.map_batches(
            canon_edges, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    net = signed.groupby(["lo", "hi"]).aggregate(
        Sum("sgn", alias_name="net")
    )
    usage_violations = int(
        net.filter(expr="net != 0").count()
    )

    u = circuit.column("u").to_numpy(zero_copy_only=False)
    v = circuit.column("v").to_numpy(zero_copy_only=False)
    broken = int((v[:-1] != u[1:]).sum()) if len(u) > 1 else 0
    closed = bool(len(u) == 0 or v[-1] == u[0])
    return pa.table(
        {
            "circuit_len": pa.array([circuit.num_rows], pa.int64()),
            "usage_violations": pa.array([usage_violations], pa.int64()),
            "broken_steps": pa.array([broken], pa.int64()),
            "closed": pa.array([closed], pa.bool_()),
        }
    )


def q_bipartite_matching(sf_dir: str):
    """One row (n_left, n_right, n_edges, koenig_gap, uncovered_edges,
    overlaps) — MAXIMUM bipartite matching (igraph
    igraph_maximum_bipartite_matching surface; Hopcroft–Karp) of the
    repo–path incidence graph, certified by König duality: the kernel
    also returns a vertex cover of the same size, and the query
    verifies DISTRIBUTEDLY that every incidence edge touches the
    cover (broadcast lookup + exact count) and that no two matched
    edges share an endpoint.  koenig_gap == 0 with uncovered_edges ==
    0 PROVES the matching is maximum — so the SQL twin (data-derived
    sizes + property constants) hash-checks optimality itself."""
    from ray.data.aggregate import Sum as _Sum

    from igraph_ray.kernels.bipartite_matching import (
        maximum_bipartite_matching,
    )

    files = files_from_documents(sf_dir)

    def inc(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src_key": pc.binary_join_element_wise(
                    pa.array(["R"] * batch.num_rows), batch.column("repo"), ":"
                ),
                "dst_key": pc.binary_join_element_wise(
                    pa.array(["P"] * batch.num_rows), batch.column("path"), ":"
                ),
                "weight": pa.array(np.ones(batch.num_rows)),
            }
        )

    pairs = (
        files.select_columns(["repo", "path"])
        .map_batches(inc, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src_key", "dst_key"])
        .aggregate(_Sum("weight", alias_name="weight"))
    )
    keys = pairs.map_batches(
        lambda b: pa.table(
            {
                "key": pa.concat_arrays(
                    [
                        b.column("src_key").combine_chunks(),
                        b.column("dst_key").combine_chunks(),
                    ]
                )
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices).select_columns(["src", "dst"])
    matching, cover = maximum_bipartite_matching(edges)

    cov = np.sort(cover.column("vid").to_numpy(zero_copy_only=False))
    cref = ray.put(cov)

    def uncovered(batch: pa.Table) -> pa.Table:
        cv = ray.get(cref)
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)

        def hit(x):
            if len(cv) == 0:
                return np.zeros(len(x), bool)
            p = np.minimum(np.searchsorted(cv, x), len(cv) - 1)
            return cv[p] == x

        bad = ~hit(s) & ~hit(d)
        return pa.table({"bad": pa.array([int(bad.sum())], pa.int64())})

    unc = edges.map_batches(
        uncovered, batch_format="pyarrow", zero_copy_batch=True
    ).aggregate(_Sum("bad", alias_name="bad"))
    uncovered_n = int(unc.get("bad") or 0)

    ends = np.concatenate(
        [
            matching.column("src").to_numpy(zero_copy_only=False),
            matching.column("dst").to_numpy(zero_copy_only=False),
        ]
    )
    overlaps = int((np.unique(ends, return_counts=True)[1] > 1).sum())

    n_left = int(
        pc.sum(
            pc.starts_with(
                pa.concat_tables(
                    vertices.select_columns(["key"]).iter_batches(
                        batch_format="pyarrow", batch_size=None
                    )
                ).column("key"),
                "R:",
            ).cast(pa.int64())
        ).as_py()
    )
    n_total = vertices.count()
    return pa.table(
        {
            "n_left": pa.array([n_left], pa.int64()),
            "n_right": pa.array([n_total - n_left], pa.int64()),
            "n_edges": pa.array([edges.count()], pa.int64()),
            "koenig_gap": pa.array(
                [cover.num_rows - matching.num_rows], pa.int64()
            ),
            "uncovered_edges": pa.array([uncovered_n], pa.int64()),
            "overlaps": pa.array([overlaps], pa.int64()),
        }
    )


def q_motif_significance(sf_dir: str):
    """One row (observed, null_n, null_sum, null_sumsq, z_millis) —
    triangle-count significance against a DEGREE-PRESERVING null
    model (igraph motifs + null-model practice): the observed total
    triangle count vs 4 deterministic degree-preserving rewirings
    (stages/rewire.py, seeds 1..4, one swap round each), re-counted by the
    distributed triangle kernel.  The null moments stay exact int64;
    z is reported in integer millis (floor) so the row stays
    hash-stable.  Rows-only (the rewiring trajectory is not
    SQL-expressible); rewiring invariants are property-tested in
    tests/test_rewire.py and the triangle kernel against nx."""
    from igraph_ray.kernels.triangles import total_triangles, triangle_counts
    from igraph_ray.stages.rewire import rewire_edges

    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices).select_columns(["src", "dst"])

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table(
            {
                "src": pa.array(np.minimum(s, d)),
                "dst": pa.array(np.maximum(s, d)),
            }
        )

    canon_edges = edges.map_batches(
        canon, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    observed = total_triangles(triangle_counts(canon_edges))

    nulls = []
    for seed in range(1, 5):
        rewired = rewire_edges(canon_edges, rounds=1, seed=seed)
        nulls.append(total_triangles(triangle_counts(rewired)))
    ns = np.array(nulls, dtype=np.int64)
    null_sum = int(ns.sum())
    null_sumsq = int((ns.astype(object) ** 2).sum())
    k = len(ns)
    mean = null_sum / k
    var = max(null_sumsq / k - mean * mean, 0.0)
    z = (observed - mean) / (var**0.5) if var > 0 else 0.0
    return pa.table(
        {
            "observed": pa.array([observed], pa.int64()),
            "null_n": pa.array([k], pa.int64()),
            "null_sum": pa.array([null_sum], pa.int64()),
            "null_sumsq": pa.array([null_sumsq], pa.int64()),
            "z_millis": pa.array([int(np.floor(z * 1000.0))], pa.int64()),
        }
    )


def q_attack_robustness(sf_dir: str, graph_dir: str | None = None):
    """(pct_removed, n_removed, lcc_size) — targeted-attack robustness
    curve (the igraph/nx percolation-under-attack classic): remove the
    top 0/2/5/10% of vertices by degree (ties -> smaller key) and
    report the surviving largest-connected-component size after each
    cut, each computed by the distributed components kernel on the
    filtered edge set.  Exact integers; the SQL twin replays the same
    window-ranked removal + recursive-CC per percentage."""
    import tempfile

    from ray.data.aggregate import Count

    deg = q_degrees(sf_dir).select_columns(["key", "degree"])
    dtbl = pa.concat_tables(
        b
        for b in deg.iter_batches(batch_format="pyarrow", batch_size=None)
        if b.num_rows
    )
    keys_np = dtbl.column("key").to_pandas().to_numpy()
    degs_np = dtbl.column("degree").to_numpy(zero_copy_only=False)
    order = np.lexsort((keys_np, -degs_np))  # degree desc, key asc
    ranked = keys_np[order]
    n = len(ranked)

    pairs = _link_graph_edges_cached(sf_dir)
    rows = {"pct_removed": [], "n_removed": [], "lcc_size": []}
    base_dir = graph_dir or tempfile.mkdtemp(prefix="igr_atk_")
    for pct in (0, 2, 5, 10):
        k = (pct * n) // 100
        removed = np.sort(ranked[:k])
        rref = ray.put(removed)

        def survive(batch: pa.Table, rref=rref) -> pa.Table:
            # rref bound per-iteration: Datasets are lazy, so a
            # late-bound closure could see a later percentage's set
            rem = ray.get(rref)
            s = batch.column("src_key").to_pandas().to_numpy()
            d = batch.column("dst_key").to_pandas().to_numpy()
            keep = ~np.isin(s, rem) & ~np.isin(d, rem)
            return batch.filter(pa.array(keep))

        kept_pairs = pairs.map_batches(
            survive, batch_format="pyarrow", zero_copy_batch=True
        )
        kept_keys = kept_pairs.map_batches(
            lambda b: pa.table(
                {
                    "key": pa.concat_arrays(
                        [
                            b.column("src_key").combine_chunks(),
                            b.column("dst_key").combine_chunks(),
                        ]
                    )
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        vertices = assign_vertex_ids(kept_keys, key_col="key").materialize()
        if vertices.count() == 0:
            rows["pct_removed"].append(pct)
            rows["n_removed"].append(k)
            rows["lcc_size"].append(0)
            continue
        edges = attach_vids(kept_pairs, vertices)
        graph = build_graph(
            edges, f"{base_dir}/p{pct}", symmetrize=True
        )
        run = connected_components(graph)
        big = (
            run.state.groupby("comp")
            .aggregate(Count(alias_name="n"))
            .sort(["n", "comp"], descending=[True, False])
            .limit(1)
            .take_all()
        )
        rows["pct_removed"].append(pct)
        rows["n_removed"].append(k)
        rows["lcc_size"].append(int(big[0]["n"]))
    return pa.table(
        {
            "pct_removed": pa.array(rows["pct_removed"], pa.int64()),
            "n_removed": pa.array(rows["n_removed"], pa.int64()),
            "lcc_size": pa.array(rows["lcc_size"], pa.int64()),
        }
    )


def q_spanning_tree(sf_dir: str, graph_dir: str | None = None):
    """One row (lcc_n, tree_edges, non_graph_edges, tree_components)
    — Wilson uniform random spanning tree (igraph
    igraph_random_spanning_tree surface; seeded loop-erased walks,
    bitwise deterministic) of the largest connected component of the
    E1∪E2 graph, validated DISTRIBUTEDLY: edge count, membership in
    the graph's edge set (native anti-join), and single-component
    spanning via the components kernel re-run ON THE TREE.  SQL twin
    recomputes lcc_n with the recursive-CC CTE and states the tree
    property constants (lcc_n - 1 edges, 0 foreign edges, 1
    component) — a broken sampler breaks the hash."""
    import tempfile

    from ray.data.aggregate import Count

    from igraph_ray.kernels.spanning import random_spanning_tree
    from igraph_ray.stages.join import hash_join

    edges, _vertices = _key_edge_vids(sf_dir)

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_ust_")
    graph, _vtbl = _build_key_graph(sf_dir, graph_dir)
    run = connected_components(graph)
    sizes = (
        run.state.groupby("comp")
        .aggregate(Count(alias_name="n"))
        .sort(["n", "comp"], descending=[True, False])
        .limit(1)
        .take_all()
    )
    big = int(sizes[0]["comp"])
    lcc_n = int(sizes[0]["n"])
    comp_tbl = pa.concat_tables(
        run.state.select_columns(["vid", "comp"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    cvid = comp_tbl.column("vid").to_numpy(zero_copy_only=False)
    ccomp = comp_tbl.column("comp").to_numpy(zero_copy_only=False)
    order = np.argsort(cvid)
    ref = ray.put((cvid[order], ccomp[order]))

    def in_lcc(batch: pa.Table) -> pa.Table:
        v, c = ray.get(ref)
        s = batch.column("src").to_numpy(zero_copy_only=False)
        keep = c[np.searchsorted(v, s)] == big
        return batch.filter(pa.array(keep))

    lcc_edges = edges.map_batches(
        in_lcc, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    tree = random_spanning_tree(lcc_edges, seed=7)

    # membership: tree edges absent from the graph's canonical edges
    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        n_key = np.int64(1) << np.int64(31)
        return pa.table(
            {"ekey": pa.array(np.minimum(s, d) * n_key + np.maximum(s, d))}
        )

    foreign = hash_join(
        ray.data.from_arrow(tree).map_batches(
            canon, batch_format="pyarrow", zero_copy_batch=True
        ),
        lcc_edges.map_batches(
            canon, batch_format="pyarrow", zero_copy_batch=True
        ).rename_columns({"ekey": "gkey"}),
        on="ekey",
        right_on="gkey",
        how="left_anti",
    ).count()

    # spanning: components of the TREE itself must be exactly one
    from igraph_ray.api import build_graph as _bg

    tree_w = tree.append_column(
        "weight", pa.array(np.ones(tree.num_rows, dtype=np.float64))
    )
    tree_graph = _bg(
        ray.data.from_arrow(tree_w), graph_dir + "/tree", symmetrize=True
    )
    tree_run = connected_components(tree_graph)
    n_comp = int(
        tree_run.state.groupby("comp")
        .aggregate(Count(alias_name="n"))
        .count()
    )
    return pa.table(
        {
            "lcc_n": pa.array([lcc_n], pa.int64()),
            "tree_edges": pa.array([tree.num_rows], pa.int64()),
            "non_graph_edges": pa.array([foreign], pa.int64()),
            "tree_components": pa.array([n_comp], pa.int64()),
        }
    )


def q_isomorphic(sf_dir: str):
    """One row (is_isomorphic, mapping_violations, non_bijective) —
    VF2 certificate that the E1∪E2 graph is isomorphic to its
    deterministic relabeling vid -> n-1-vid, with the returned mapping
    validated DISTRIBUTEDLY (every edge mapped through the witness and
    diffed against the relabeled edge set via a count-signed groupby).
    SQL twin states the property constants (witness pattern, like
    coloring_validity); a broken VF2 or a bogus mapping breaks the
    hash."""
    from ray.data.aggregate import Sum

    from igraph_ray.kernels.isomorphism import isomorphic

    edges, vertices = _key_edge_vids(sf_dir)
    edges = edges.materialize()
    n = vertices.count()

    def relabel(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        rs, rd = n - 1 - s, n - 1 - d
        return pa.table(
            {
                "src": pa.array(np.minimum(rs, rd)),
                "dst": pa.array(np.maximum(rs, rd)),
            }
        )

    relabeled = edges.map_batches(
        relabel, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    ok, mapping = isomorphic(edges, relabeled)
    violations = 0
    non_bij = 0
    if ok:
        mvid = mapping.column("vid1").to_numpy(zero_copy_only=False)
        mto = mapping.column("vid2").to_numpy(zero_copy_only=False)
        order = np.argsort(mvid)
        mvid, mto = mvid[order], mto[order]
        non_bij = int(len(mto) - len(np.unique(mto)))
        ref = ray.put((mvid, mto))

        def mapped(batch: pa.Table) -> pa.Table:
            v, t = ray.get(ref)
            s = batch.column("src").to_numpy(zero_copy_only=False)
            d = batch.column("dst").to_numpy(zero_copy_only=False)
            ms = t[np.searchsorted(v, s)]
            md = t[np.searchsorted(v, d)]
            return pa.table(
                {
                    "src": pa.array(np.minimum(ms, md)),
                    "dst": pa.array(np.maximum(ms, md)),
                    "sign": pa.array(np.ones(len(ms), np.int64)),
                }
            )

        def negate(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "src": batch.column("src"),
                    "dst": batch.column("dst"),
                    "sign": pa.array(
                        np.full(batch.num_rows, -1, np.int64)
                    ),
                }
            )

        diff = (
            edges.map_batches(
                mapped, batch_format="pyarrow", zero_copy_batch=True
            )
            .union(
                relabeled.map_batches(
                    negate, batch_format="pyarrow", zero_copy_batch=True
                )
            )
            .groupby(["src", "dst"])
            .aggregate(Sum("sign", alias_name="net"))
            .filter(expr="net != 0")
        )
        violations = diff.count()
    return pa.table(
        {
            "is_isomorphic": pa.array([bool(ok)], pa.bool_()),
            "mapping_violations": pa.array([violations], pa.int64()),
            "non_bijective": pa.array([non_bij], pa.int64()),
        }
    )


def q_dominator_tree(sf_dir: str):
    """(key, idom_key) — immediate dominators (igraph_dominator_tree
    surface, Cooper-Harvey-Kennedy) of the E1∪E2 graph oriented low→
    high vid, rooted at vid 0.  Exact SQL twin via the DEFINITION of
    dominance (avoid-vertex reachability CTE + chain argmax);
    exact nx.immediate_dominators parity in tests/test_dominators.py."""
    from igraph_ray.kernels.dominators import dominator_tree

    edges, vertices = _key_edge_vids(sf_dir)

    def orient(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.minimum(s, d)),
                "dst": pa.array(np.maximum(s, d)),
            }
        )

    dag = edges.map_batches(
        orient, batch_format="pyarrow", zero_copy_batch=True
    )
    tree = dominator_tree(dag, root=0)
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(tree, vtbl, {"vid": "key", "idom": "idom_key"})


def _key_edge_vids_weighted(sf_dir: str):
    """Like _key_edge_vids but keeps the co-occurrence weight as an
    int64 capacity column."""
    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = (
        attach_vids(pairs, vertices)
        .map_batches(
            lambda b: pa.table(
                {
                    "src": b.column("src"),
                    "dst": b.column("dst"),
                    "capacity": pc.cast(b.column("weight"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .materialize()
    )
    return edges, vertices


def q_partition_quality(sf_dir: str):
    """One row (n, m, intra_edges, intra_pairs, coverage, performance)
    — nx.community.partition_quality of the E1∪E2 key graph under the
    deterministic vid%4 partition (vid = dense sorted key rank, the V1
    rule, so the SQL twin replays it with ROW_NUMBER)."""
    from igraph_ray.kernels.modularity import partition_quality

    pairs = _link_graph_edges_cached(sf_dir).map_batches(
        lambda b: pa.table(
            {"src": b.column("src_key"), "dst": b.column("dst_key")}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    mem = assign_vertex_ids(keys, key_col="key").map_batches(
        lambda b: pa.table(
            {
                "key": b.column("key"),
                "comm": pc.bit_wise_and(b.column("vid"), 3),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return partition_quality(pairs, mem)


def q_hop_histogram(sf_dir: str, graph_dir: str | None = None):
    """(dist, pairs) — exact ordered-pair hop-distance distribution of
    the E1∪E2 key graph (all-vertex pivots), pure int64 so the
    all-pairs recursive-CTE twin matches bitwise."""
    import tempfile

    from igraph_ray.kernels.multibfs import distance_histogram

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_hop_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    vids = vtbl.column("vid").to_numpy(zero_copy_only=False)
    out = distance_histogram(graph, vids)
    return pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )


def q_avg_path_length(sf_dir: str, graph_dir: str | None = None):
    """One row (n_reachable_pairs, wiener_index, avg_path_length) of
    the E1∪E2 key graph — igraph average_path_length(unconn=True) /
    nx.wiener_index semantics over REACHABLE ordered pairs (NX-exact
    in tests/test_multibfs.py); exact-int sums from the distance
    histogram + one IEEE division, so the recursive-CTE SQL twin
    matches bitwise."""
    import tempfile

    from igraph_ray.kernels.multibfs import distance_histogram

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_apl_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    vids = vtbl.column("vid").to_numpy(zero_copy_only=False)
    hist = pa.concat_tables(
        distance_histogram(graph, vids).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    d = hist.column("dist").to_numpy(zero_copy_only=False)
    p = hist.column("pairs").to_numpy(zero_copy_only=False)
    n_pairs = int(p.sum())
    total = int((d * p).sum())
    return pa.table(
        {
            "n_reachable_pairs": pa.array([n_pairs], pa.int64()),
            "wiener_index": pa.array([total // 2], pa.int64()),
            "avg_path_length": pa.array(
                [total / n_pairs if n_pairs else 0.0], pa.float64()
            ),
        }
    )


def q_global_efficiency(sf_dir: str, graph_dir: str | None = None):
    """One row (n_vertices, efficiency) — nx.global_efficiency of the
    E1∪E2 key graph (rows-only: float mean of 1/d; the underlying int
    histogram is the SQL-checked hop_histogram query)."""
    import tempfile

    from igraph_ray.kernels.multibfs import global_efficiency

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_eff_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    vids = vtbl.column("vid").to_numpy(zero_copy_only=False)
    eff = global_efficiency(graph, len(vids), vids)
    return pa.table(
        {
            "n_vertices": pa.array([len(vids)], pa.int64()),
            "efficiency": pa.array([eff], pa.float64()),
        }
    )


def _doc_dag_arcs(sf_dir: str) -> ray.data.Dataset:
    """Acyclic sub-relation of the directed doc graph: keep arcs whose
    numeric source index is below the destination index (every arc goes
    low → high, so the relation is a DAG by construction)."""

    def derive(batch: pa.Table) -> pa.Table:
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        s = doc_id % 101
        d = (doc_id * 37 + 11) % 101
        keep = s < d
        return pa.table(
            {
                "src": pa.array([f"v{i}" for i in s[keep]], pa.string()),
                "dst": pa.array([f"v{i}" for i in d[keep]], pa.string()),
            }
        )

    return documents(sf_dir).map_batches(
        derive, batch_format="pyarrow", zero_copy_batch=True
    )


def q_topo_layers(sf_dir: str, graph_dir: str | None = None):
    """(key, layer) — topological layering (longest path from any
    source) of the doc-derived DAG; exact int64 layers, recursive-CTE
    longest-walk SQL twin (igraph_topological_sorting parity: layer
    order is a valid topological order)."""
    import tempfile

    from igraph_ray.kernels.toposort import topological_layers

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_topo_")
    arcs = _doc_dag_arcs(sf_dir)
    keys = (
        arcs.map_batches(
            lambda b: pa.table(
                {
                    "key": pa.concat_arrays(
                        [
                            b.column("src").combine_chunks(),
                            b.column("dst").combine_chunks(),
                        ]
                    )
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(
        arcs.map_batches(
            lambda b: b.append_column(
                "weight", pa.array(np.ones(b.num_rows, np.float64))
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).rename_columns({"src": "src_key", "dst": "dst_key"}),
        vertices,
    )
    graph = build_graph(
        edges,
        graph_dir,
        symmetrize=False,
        vertices=vertices.select_columns(["vid"]),
    )
    out = topological_layers(graph)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(tbl, vtbl, {"vid": "key"})


def q_condensation_layers(sf_dir: str, graph_dir: str | None = None):
    """(scc_key, layer) — SCC condensation of the commit-ring digraph
    topologically layered (nx.condensation + longest-path DP parity;
    rows-only, pytest oracle in tests/test_toposort.py)."""
    import tempfile

    from igraph_ray.kernels.scc import scc as run_scc
    from igraph_ray.kernels.toposort import (
        condensation_arcs,
        topological_layers,
    )
    from igraph_ray.stages.edge_rules import ring_edges

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_cond_")
    files = with_file_key(files_from_documents(sf_dir))
    rings = ring_edges(files, "commit", "file_key")
    keys = (
        files.select_columns(["file_key"]).rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    arcs = attach_vids(rings, vertices)
    state = run_scc(
        arcs, graph_dir + "/scc", vertices=vertices.select_columns(["vid"])
    )
    cond = condensation_arcs(
        arcs.select_columns(["src", "dst"]), state
    ).materialize()
    labels = state.select_columns(["scc"]).rename_columns({"scc": "vid"})
    cg = build_graph(
        cond,
        graph_dir + "/cond",
        symmetrize=False,
        vertices=labels.groupby("vid")
        .aggregate(Count("vid", alias_name="_n"))
        .drop_columns(["_n"]),
    )
    out = topological_layers(cg)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(tbl, vtbl, {"vid": "scc_key"})


def q_transitive_reduction(sf_dir: str):
    """(src_key, dst_key) — UNIQUE transitive reduction of the
    doc-derived DAG (the topo_layers input; nx.transitive_reduction
    parity, reverse-topological packed descendant bitsets in a
    bounded-gather task).  An arc survives iff no other path connects
    its endpoints — the SQL twin filters the same arcs with a NOT
    EXISTS over the recursive >=2-step closure, so the match is on
    the exact arc set."""
    from igraph_ray.kernels.transitive import transitive_reduction

    arcs = _doc_dag_arcs(sf_dir)
    keys = arcs.map_batches(
        lambda b: pa.table(
            {
                "key": pa.concat_arrays(
                    [
                        b.column("src").combine_chunks(),
                        b.column("dst").combine_chunks(),
                    ]
                )
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(
        arcs.map_batches(
            lambda b: pa.table(
                {
                    "src_key": b.column("src"),
                    "dst_key": b.column("dst"),
                    "weight": pa.array(
                        np.ones(b.num_rows, dtype=np.float64)
                    ),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        vertices,
    ).select_columns(["src", "dst"])
    reduced = transitive_reduction(edges)
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(
        reduced, vtbl, {"src": "src_key", "dst": "dst_key"}
    )


def _extra_dag_arcs(sf_dir: str) -> ray.data.Dataset:
    """Deterministic acyclic arcs between file keys (index x → y over
    the 100-point key cycle, kept when x < y) — unioned with the commit
    rings this gives the bow-tie query a digraph with real IN/OUT/
    tendril structure instead of a pure cycle soup."""

    def derive(batch: pa.Table) -> pa.Table:
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        x = doc_id % 100
        y = (doc_id * 7 + 3) % 100
        keep = x < y
        x, y = x[keep], y[keep]
        return pa.table(
            {
                "src_key": pa.array(
                    [f"r{i % 20}:p{i % 50}" for i in x], pa.string()
                ),
                "dst_key": pa.array(
                    [f"r{i % 20}:p{i % 50}" for i in y], pa.string()
                ),
                "weight": pa.array(np.ones(len(x))),
                "rule": pa.array(["dag"] * len(x), pa.string()),
            }
        )

    return documents(sf_dir).map_batches(
        derive, batch_format="pyarrow", zero_copy_batch=True
    )


def q_bowtie(sf_dir: str, graph_dir: str | None = None):
    """(key, region) — Broder-et-al. bow-tie decomposition (core / in /
    out / tendril / disconnected relative to the largest SCC) of the
    commit-ring ∪ DAG-arc digraph; SQL twin = mutual-reachability
    closure + three reachability CTEs."""
    import tempfile

    from igraph_ray.kernels.bowtie import bowtie
    from igraph_ray.stages.edge_rules import ring_edges

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_bow_")
    files = with_file_key(files_from_documents(sf_dir))
    rings = ring_edges(files, "commit", "file_key")
    arcs_by_key = rings.union(_extra_dag_arcs(sf_dir))
    keys = (
        files.select_columns(["file_key"]).rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    arcs = attach_vids(arcs_by_key, vertices)
    out = bowtie(
        arcs, graph_dir, vertices=vertices.select_columns(["vid"])
    )
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(tbl, vtbl, {"vid": "key"})


def q_ngram_jaccard(sf_dir: str):
    """(a, b, common, union_sz, jaccard) — exact word-3-gram Jaccard
    near-dup pairs over documents (df_cap=128, threshold=0.2); int
    set-sizes plus one IEEE division per pair, so the inverted-index
    SQL twin matches bitwise."""
    from igraph_ray.functions.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(
        documents(sf_dir), n=3, df_cap=128, threshold=0.2
    )
    return pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )

# ---------------------------------------------------------------------------
# dyad / triad census, cocitation (igraph_dyad_census / igraph_triad_census
# / igraph_cocitation / igraph_bibcoupling) over the directed doc graph
# ---------------------------------------------------------------------------
def directed_doc_multiarcs(sf_dir: str) -> ray.data.Dataset:
    """Richer deterministic directed key graph than
    :func:`directed_doc_arcs` (whose dst is a bijection of src, so
    every vertex has in/out-degree 1 — useless for census/cocitation
    fixtures): the wrap term ``(doc_id // 101) * 13`` gives each source
    several distinct out-neighbours, and every 7th doc also emits the
    reverse arc so mutual dyads exist."""

    def derive(batch: pa.Table) -> pa.Table:
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        s = doc_id % 101
        d = (doc_id * 37 + (doc_id // 101) * 13 + 11) % 101
        rev = doc_id % 7 == 0
        src = np.concatenate([s, d[rev]])
        dst = np.concatenate([d, s[rev]])
        return pa.table(
            {
                "src": pa.array([f"v{i}" for i in src], pa.string()),
                "dst": pa.array([f"v{i}" for i in dst], pa.string()),
            }
        )

    return documents(sf_dir).map_batches(
        derive, batch_format="pyarrow", zero_copy_batch=True
    )


def _doc_arc_graph(sf_dir: str):
    """(arcs-with-vids dataset, vertices dataset, n_vertices) for the
    deterministic directed doc-derived multi-arc key graph — vertex set
    = every distinct endpoint key (loop-only vertices included,
    matching the SQL twins' ``dkeys`` CTE)."""
    arcs = directed_doc_multiarcs(sf_dir)

    def with_weight(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src_key": batch.column("src"),
                "dst_key": batch.column("dst"),
                "weight": pa.array(np.ones(batch.num_rows)),
            }
        )

    def endpoints(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": pa.concat_arrays(
                    [
                        batch.column("src").combine_chunks(),
                        batch.column("dst").combine_chunks(),
                    ]
                )
            }
        )

    keys = arcs.map_batches(
        endpoints, batch_format="pyarrow", zero_copy_batch=True
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    arcs_v = attach_vids(
        arcs.map_batches(
            with_weight, batch_format="pyarrow", zero_copy_batch=True
        ),
        vertices,
    )
    return arcs_v, vertices, vertices.count()


def q_dyad_census(sf_dir: str):
    """(dyad_type, n) — Holland-Leinhardt mut/asym/null dyad counts of
    the directed doc graph (igraph_dyad_census); exact ints."""
    from igraph_ray.kernels.triads import dyad_census

    arcs, _, n = _doc_arc_graph(sf_dir)
    return dyad_census(arcs, n)


def q_triad_census(sf_dir: str):
    """(triad_type, n) — full 16-class MAN triad census of the directed
    doc graph (igraph_triad_census / nx.triadic_census); exact ints via
    wedge enumeration + Batagelj-Mrvar closed forms."""
    from igraph_ray.kernels.triads import triad_census

    arcs, _, n = _doc_arc_graph(sf_dir)
    return triad_census(arcs, n)


def _q_cocite(sf_dir: str, mode: str):
    from igraph_ray.kernels.triads import cocitation_counts

    arcs, vertices, _ = _doc_arc_graph(sf_dir)
    out = cocitation_counts(arcs, mode=mode)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(tbl, vtbl, {"a": "src_key", "b": "dst_key"})


def q_cocitation(sf_dir: str):
    """(src_key, dst_key, common) — common in-neighbour counts per
    unordered pair (igraph_cocitation), nonzero pairs only."""
    return _q_cocite(sf_dir, "cocitation")


def q_bib_coupling(sf_dir: str):
    """(src_key, dst_key, common) — common out-neighbour counts per
    unordered pair (igraph_bibcoupling), nonzero pairs only."""
    return _q_cocite(sf_dir, "bibcoupling")


def q_asof_join(sf_dir: str):
    """(event_id, o_orderkey, o_totalprice) — backward-inclusive as-of
    join: each event matched to the same user's latest order at or
    before the event timestamp (ties toward the greatest orderkey);
    unmatched events carry -1/-1.0.  Values are pass-through (no float
    arithmetic) so the window-function SQL twin matches bitwise."""
    from igraph_ray.stages.asof import asof_join

    left = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    right = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    out = asof_join(
        left,
        right,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_value_cols=["o_orderkey", "o_totalprice"],
        right_tiebreak="o_orderkey",
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "o_orderkey": pc.fill_null(
                    batch.column("o_orderkey"), pa.scalar(-1, pa.int64())
                ),
                "o_totalprice": pc.fill_null(
                    batch.column("o_totalprice"),
                    pa.scalar(-1.0, pa.float64()),
                ),
            }
        )

    return out.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def q_term_df(sf_dir: str):
    """(term, df) — top-100 lowercase whitespace tokens by document
    frequency (ties toward the lexicographically smaller term); exact
    ints, unnest/group-by SQL twin."""
    from igraph_ray.functions.text import term_document_frequency

    out = term_document_frequency(documents(sf_dir))
    return out.sort(["df", "term"], descending=[True, False]).limit(100)


def q_priority_lineitems(sf_dir: str):
    """(o_orderpriority, n_items, sum_qty) — fact⋈fact hash-shuffle
    join (lineitem⋈orders on orderkey via Ray Data's native hash join)
    followed by a grouped exact-int aggregate."""
    from igraph_ray.stages.join import hash_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"]
    )

    def qty_int(batch: pa.Table) -> pa.Table:
        q = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "qty": pa.array(q.astype(np.int64)),
            }
        )

    li = li.map_batches(qty_int, batch_format="pyarrow", zero_copy_batch=True)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    )
    joined = hash_join(
        li, orders, on="l_orderkey", right_on="o_orderkey", num_partitions=8
    )
    return joined.groupby("o_orderpriority").aggregate(
        Count("qty", alias_name="n_items"),
        Sum("qty", alias_name="sum_qty"),
    )


def q_customers_no_orders(sf_dir: str):
    """(c_custkey, c_nationkey) — customers with no high-value
    (>400000) order: anti join against the distinct qualifying
    custkeys (broadcast key-set filter)."""
    from igraph_ray.stages.join import semi_join

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def big(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.greater(batch.column("o_totalprice"), pa.scalar(400000.0))
        ).select(["o_custkey"])

    orders = orders.map_batches(
        big, batch_format="pyarrow", zero_copy_batch=True
    )
    return semi_join(cust, orders, on="c_custkey", right_on="o_custkey",
                     anti=True)


def q_top_orders_per_cust(sf_dir: str):
    """(o_custkey, cents, o_orderkey, rank) — each customer's top-3
    orders by total price (exact integer cents; ties toward the
    smaller orderkey): the grouped-top-k / ROW_NUMBER surface."""
    from igraph_ray.stages.topk import topk_per_group

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_totalprice"],
    )

    def cents(batch: pa.Table) -> pa.Table:
        v = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_custkey": batch.column("o_custkey"),
                "o_orderkey": batch.column("o_orderkey"),
                "cents": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64)),
            }
        )

    orders = orders.map_batches(
        cents, batch_format="pyarrow", zero_copy_batch=True
    )
    return topk_per_group(orders, "o_custkey", "cents", "o_orderkey", k=3)


def q_revenue_per_nation(sf_dir: str):
    """(n_name, n_items, revenue_milli) — TPC-H Q5-flavoured multi-join:
    lineitem ⋈ orders (hash-shuffle, the two fact tables) ⋈ customer ⋈
    nation (broadcast probes).  Revenue is exact integer milli-cents,
    ``price_cents * (100 - discount_pct)``, so the SUM hash-matches the
    SQL twin bitwise.  Demonstrates the intended join topology at
    scale: one fact⋈fact shuffle, every dimension a broadcast."""
    from igraph_ray.stages.join import broadcast_join, hash_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def milli(batch: pa.Table) -> pa.Table:
        p = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        d = batch.column("l_discount").to_numpy(zero_copy_only=False)
        cents = np.floor(p * 100.0 + 0.5).astype(np.int64)
        disc = np.floor(d * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "rev_milli": pa.array(cents * (100 - disc)),
            }
        )

    li = li.map_batches(milli, batch_format="pyarrow", zero_copy_batch=True)
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    joined = hash_join(
        li, orders, on="l_orderkey", right_on="o_orderkey", num_partitions=8
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    joined = broadcast_join(
        joined, cust, on="o_custkey", right_on="c_custkey"
    )
    nation = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    joined = broadcast_join(
        joined, nation, on="c_nationkey", right_on="n_nationkey"
    )
    return joined.groupby("n_name").aggregate(
        Count("rev_milli", alias_name="n_items"),
        Sum("rev_milli", alias_name="revenue_milli"),
    )


PRICE_QS = [0.25, 0.5, 0.75, 0.95]


def q_price_quantiles(sf_dir: str):
    """(q, value) — exact discrete quantiles of l_extendedprice in
    integer cents via histogram-refinement selection (no global sort);
    rank semantics = DuckDB quantile_disc (0-based ceil(q*n)-1)."""
    from igraph_ray.stages.quantile import exact_quantiles_int

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
    )

    def cents(batch: pa.Table) -> pa.Table:
        v = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        return pa.table(
            {"c": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64))}
        )

    li = li.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    return exact_quantiles_int(li, "c", PRICE_QS)


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min
WINDOW_US = 3_600 * 1_000_000  # 1 hour


def _events_cents(sf_dir: str):
    """events with value converted to exact integer cents via the fixed
    IEEE chain floor(value*100 + 0.5) — replayed verbatim in SQL."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type", "value"],
    )

    def cents(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        c = np.floor(v * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "ts": batch.column("ts"),
                "event_type": batch.column("event_type"),
                "cents": pa.array(c),
            }
        )

    return ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)


def q_sessions(sf_dir: str):
    """(user_id, session_id, session_start, session_end, n_events,
    sum_cents) — 30-minute-gap sessionization of the events stream per
    user; timestamps as int64 epoch micros, money as exact cents, so
    the LAG/SUM-OVER SQL twin hash-matches bitwise."""
    from igraph_ray.stages.window import sessionize

    return sessionize(
        _events_cents(sf_dir), "user_id", "ts", SESSION_GAP_US, ("cents",)
    )


def q_event_ranks(sf_dir: str):
    """(user_id, cents, event_id, row_number, rnk, dense_rank,
    percent_rank, ntile) — per-user RANK/DENSE_RANK/PERCENT_RANK/
    NTILE(4) over event cents (stages/window.py::rank_functions;
    bitwise DuckDB window twin — exact ints + one IEEE division)."""
    from igraph_ray.stages.window import rank_functions

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "value"],
    )

    def cents(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "event_id": batch.column("event_id"),
                "cents": pa.array(
                    np.floor(v * 100.0 + 0.5).astype(np.int64)
                ),
            }
        )

    return rank_functions(
        ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True),
        "user_id",
        "cents",
        "event_id",
        ntiles=4,
    )


def q_running_totals(sf_dir: str):
    """(user_id, ts, event_id, row_number, run_sum) — per-user running
    cents total in (ts, event_id) order: the SUM-OVER / ROW_NUMBER
    window-function surface, exact ints throughout."""
    from igraph_ray.stages.window import running_agg

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"],
    )

    def cents(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "ts": batch.column("ts"),
                "event_id": batch.column("event_id"),
                "cents": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64)),
            }
        )

    ev = ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    return running_agg(ev, "user_id", "ts", "event_id", "cents")


def q_hourly_windows(sf_dir: str):
    """(window_start, event_type, n_events, sum_cents) — 1-hour tumbling
    event-time windows per event type; window_start = int64 epoch micros
    floored to the hour."""
    from igraph_ray.stages.window import tumbling_window

    return tumbling_window(
        _events_cents(sf_dir),
        "ts",
        WINDOW_US,
        by=("event_type",),
        sum_cols=("cents",),
    )


HOP_US = 15 * 60 * 1_000_000  # 15 min


def q_hopping_windows(sf_dir: str):
    """(window_start, event_type, n_events, sum_cents) — 1-hour sliding
    windows hopping every 15 min per event type."""
    from igraph_ray.stages.window import hopping_window

    return hopping_window(
        _events_cents(sf_dir),
        "ts",
        WINDOW_US,
        HOP_US,
        by=("event_type",),
        sum_cols=("cents",),
    )


def q_lineitem_rollup(sf_dir: str):
    """(l_returnflag, l_linestatus, n, sum_qty) with ROLLUP subtotal
    rows ('ALL' sentinels): detail, per-returnflag subtotal, grand
    total — three pre-combined grouped aggregates over one scan graph,
    no operator materializes the fact table."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity"],
    )

    def qty_int(batch: pa.Table) -> pa.Table:
        q = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty": pa.array(q.astype(np.int64)),
            }
        )

    li = li.map_batches(qty_int, batch_format="pyarrow", zero_copy_batch=True)

    detail = li.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Count("qty", alias_name="n"), Sum("qty", alias_name="sum_qty")
    )

    def drop_status(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": pa.array(
                    ["ALL"] * batch.num_rows, pa.string()
                ),
                "n": batch.column("n"),
                "sum_qty": batch.column("sum_qty"),
            }
        )

    def drop_both(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": pa.array(["ALL"] * batch.num_rows),
                "l_linestatus": pa.array(["ALL"] * batch.num_rows),
                "n": batch.column("n"),
                "sum_qty": batch.column("sum_qty"),
            }
        )

    # subtotals re-aggregate the tiny detail result, not the fact table
    sub = (
        detail.map_batches(
            drop_status, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("n", alias_name="n"), Sum("sum_qty", alias_name="sum_qty")
        )
    )
    total = (
        detail.map_batches(
            drop_both, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("n", alias_name="n"), Sum("sum_qty", alias_name="sum_qty")
        )
    )
    return detail.union(sub).union(total)


def q_approx_distinct_users(sf_dir: str):
    """(key=event_type, reg_index, reg_value) — the merged per-group
    HyperLogLog REGISTERS (p=14, nonzero rows): exact
    splitmix64-derived integers combined by max, bitwise
    SQL-replayable (round-5 promotion — the float estimate has no
    defined summation order; it derives from these rows and stays
    pytest-gated in tests/test_sketch.py with the accuracy oracle)."""
    from igraph_ray.stages.sketch import hll_registers_by

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    return hll_registers_by(ev, "event_type", "user_id", p=14)


def q_props_k_stats(sf_dir: str):
    """(event_type, n, sum_k, max_k) — the flat-JSON ``props`` column's
    integer field k, extracted with a vectorized RE2 kernel and
    aggregated per event type (oracle parses with real json_extract —
    an independent parse, not a regex replay)."""
    from igraph_ray.stages.json_extract import extract_json_int

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )
    ev = extract_json_int(ev, "props", "k")
    return ev.groupby("event_type").aggregate(
        Count("k", alias_name="n"),
        Sum("k", alias_name="sum_k"),
        Max("k", alias_name="max_k"),
    )


BM25_QUERY_TERMS = ["data", "query", "the", "merge", "window"]


def q_bm25(sf_dir: str):
    """(doc_id, term, tf, dl, score) — BM25 (odds-idf variant) of every
    document against a fixed query-term set; exact-int tf/dl/df stats
    plus a fixed IEEE op chain, replayed bitwise by the SQL twin."""
    from igraph_ray.functions.text import bm25_scores

    return bm25_scores(documents(sf_dir), BM25_QUERY_TERMS)


def q_frequent_terms(sf_dir: str):
    """(term, n) — top-100 tokens by exact total count via per-batch
    summary + candidate recount (no full-vocabulary shuffle)."""
    from igraph_ray.functions.text import frequent_terms

    return frequent_terms(documents(sf_dir), top_n=100, summary_size=4096)


def q_repetition_stats(sf_dir: str):
    """(doc_id, n_tokens, n_distinct, max_bigram, dup_frac,
    top_bigram_frac) — Gopher-style repetition quality signals; exact
    ints + one IEEE division each, bitwise SQL replay."""
    from igraph_ray.functions.text import repetition_stats

    return repetition_stats(documents(sf_dir))


def q_bigrams(sf_dir: str):
    """(bigram, n) — top-100 adjacent lowercase token pairs by corpus
    frequency (ties toward the lexicographically smaller bigram)."""
    from igraph_ray.functions.text import bigram_counts

    out = bigram_counts(documents(sf_dir))
    return out.sort(["n", "bigram"], descending=[True, False]).limit(100)


def q_doc_top_terms(sf_dir: str):
    """(doc_id, term, tf, rank, tfidf) — each document's top-3 terms by
    (tf desc, term asc) with the linear-idf score tf*N/df (exact ints +
    one IEEE division, replayed bitwise by the window-function SQL
    twin)."""
    from igraph_ray.functions.text import doc_top_terms

    docs = documents(sf_dir)
    return doc_top_terms(docs, n_docs=docs.count(), k=3)


def _doc_undirected_vid_pairs(sf_dir: str):
    """(pairs ds (src,dst,weight) of distinct canonical vid pairs,
    vertices ds) — the collapsed multi-arc doc graph
    (igraph as.undirected(collapse)) EXTENDED with deterministic
    pendant chains (v -> w{doc_id} every 11th doc, w -> x{doc_id} every
    33rd) so the fixture has real bridges and 2-hop peel depth; the
    dense 101-key core alone has none."""

    def pendants(batch: pa.Table) -> pa.Table:
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        p1 = doc_id[doc_id % 11 == 0]
        p2 = doc_id[doc_id % 33 == 0]
        return pa.table(
            {
                "src": pa.array(
                    [f"v{i % 101}" for i in p1] + [f"w{i}" for i in p2],
                    pa.string(),
                ),
                "dst": pa.array(
                    [f"w{i}" for i in p1] + [f"x{i}" for i in p2],
                    pa.string(),
                ),
            }
        )

    arcs = directed_doc_multiarcs(sf_dir).union(
        documents(sf_dir).map_batches(
            pendants, batch_format="pyarrow", zero_copy_batch=True
        )
    )

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table(
            {
                "a": pa.array(np.minimum(s, d), pa.string()),
                "b": pa.array(np.maximum(s, d), pa.string()),
            }
        )

    pairs_by_key = (
        arcs.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["a", "b"])
        .aggregate(Count("a", alias_name="_c"))
        .map_batches(
            lambda t: pa.table(
                {
                    "src_key": t.column("a"),
                    "dst_key": t.column("b"),
                    "weight": pa.array(np.ones(t.num_rows)),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )

    def endpoints(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": pa.concat_arrays(
                    [
                        batch.column("src_key").combine_chunks(),
                        batch.column("dst_key").combine_chunks(),
                    ]
                )
            }
        )

    keys = pairs_by_key.map_batches(
        endpoints, batch_format="pyarrow", zero_copy_batch=True
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    pairs = attach_vids(pairs_by_key, vertices)
    return pairs, vertices


def q_bridges(sf_dir: str):
    """(src_key, dst_key) — bridges of the undirected collapsed doc
    graph (igraph_bridges / nx.bridges); SQL twin removes each edge and
    checks endpoint reachability via a per-edge recursive closure."""
    import tempfile

    from igraph_ray.kernels.bridges import bridges

    pairs, vertices = _doc_undirected_vid_pairs(sf_dir)
    out = bridges(pairs, work_dir=tempfile.mkdtemp(prefix="igr_qbr_"))
    batches = list(out.iter_batches(batch_format="pyarrow", batch_size=None))
    if batches:
        tbl = pa.concat_tables(batches)
    else:
        tbl = pa.table(
            {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
        )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(tbl, vtbl, {"src": "src_key", "dst": "dst_key"})


def q_two_edge_components(sf_dir: str):
    """(key, comp_key) — 2-edge-connected components (connected
    components after bridge removal, min-key labels) of the collapsed
    doc graph; vertex set = every arc endpoint."""
    import tempfile

    from igraph_ray.kernels.bridges import two_edge_components

    pairs, vertices = _doc_undirected_vid_pairs(sf_dir)
    out = two_edge_components(
        pairs,
        tempfile.mkdtemp(prefix="igr_q2ec_"),
        vertices=vertices.select_columns(["vid"]),
    )
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(tbl, vtbl, {"vid": "key", "comp": "comp_key"})


def q_stratified_sample(sf_dir: str):
    """(doc_id, lang) — deterministic per-lang quota sample: the 5 docs
    of each lang with the smallest (splitmix64(doc_id), doc_id); the
    SQL twin replays the hash and the ROW_NUMBER ranking exactly."""
    from igraph_ray.stages.sample import stratified_sample

    return stratified_sample(
        documents(sf_dir).select_columns(["doc_id", "lang"]),
        group_col="lang",
        key_col="doc_id",
        k=5,
    )


def q_decontaminate(sf_dir: str):
    """(doc_id, n_hits, contaminated) — exact word-8-gram overlap of
    every document against the deterministic benchmark subset
    doc_id % 97 == 0 (training-data decontamination); exact ints, the
    SQL twin builds the same grams with list slicing."""
    from igraph_ray.functions.dedup import ngram_contamination

    def bench(batch: pa.Table):
        return (
            batch.column("doc_id").to_numpy(zero_copy_only=False) % 97 == 0
        )

    return ngram_contamination(
        documents(sf_dir).select_columns(["doc_id", "text"]),
        bench_filter=bench,
        n=8,
    )


def q_centralization(sf_dir: str):
    """One row (n, max_degree, sum_degree, centralization) — Freeman
    degree centralization of the E1∪E2 graph over ALL file keys
    (igraph_centralization_degree, undirected, theoretical max =
    (n-1)(n-2)); exact ints + one IEEE division."""
    degs = q_degrees(sf_dir)
    tbl = pa.concat_tables(
        degs.select_columns(["degree"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    d = tbl.column("degree").to_numpy(zero_copy_only=False)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .unique("file_key")
    )
    n = len(keys) if isinstance(keys, list) else int(keys)
    dmax = int(d.max()) if len(d) else 0
    dsum = int(d.sum())
    num = n * dmax - dsum
    den = (n - 1) * (n - 2)
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "max_degree": pa.array([dmax], pa.int64()),
            "sum_degree": pa.array([dsum], pa.int64()),
            "centralization": pa.array(
                [num / den if den else 0.0], pa.float64()
            ),
        }
    )


def q_graph_center(sf_dir: str):
    """(key, eccentricity) — the graph center: vertices whose
    eccentricity equals the radius (igraph: vertices attaining
    igraph_radius); exact ints from the multi-pivot BFS table."""
    tbl = _ecc_table(sf_dir)
    ecc = tbl.column("eccentricity").to_numpy(zero_copy_only=False)
    keep = ecc == ecc.min()
    return pa.table(
        {
            "key": pc.take(
                tbl.column("key"), pa.array(np.flatnonzero(keep))
            ),
            "eccentricity": pa.array(ecc[keep].astype(np.int64)),
        }
    )


def q_maximal_matching(sf_dir: str):
    """(src_key, dst_key) — maximal matching of the E1∪E2 key graph
    (parallel greedy local-max; deterministic hash priorities);
    rows-only driver check, property oracle in tests/test_matching.py."""
    from igraph_ray.kernels.matching import maximal_matching

    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices).select_columns(["src", "dst"])
    out = maximal_matching(edges)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(tbl, vtbl, {"src": "src_key", "dst": "dst_key"})


def q_articulation_points(sf_dir: str):
    """(key,) — cut vertices of the collapsed doc graph (+ pendant
    chains): igraph_articulation_points / nx.articulation_points via
    the Tarjan–Vishkin kernel (kernels/biconnected.py); the SQL twin
    removes each candidate vertex and checks that its neighbours stay
    mutually reachable via a per-vertex recursive closure."""
    import tempfile

    from igraph_ray.kernels.biconnected import articulation_points

    pairs, vertices = _doc_undirected_vid_pairs(sf_dir)
    out = articulation_points(
        pairs, graph_dir=tempfile.mkdtemp(prefix="igr_qart_")
    )
    batches = list(out.iter_batches(batch_format="pyarrow", batch_size=None))
    tbl = (
        pa.concat_tables(batches)
        if batches
        else pa.table({"vid": pa.array([], pa.int64())})
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(tbl, vtbl, {"vid": "key"})


def q_biconnected(sf_dir: str):
    """(src_key, dst_key, bicomp_key) — biconnected-component edge
    labels of the collapsed doc graph (igraph_biconnected_components
    edge partition).  The component label is CANONICAL — the
    lexicographically smallest ``src_key|dst_key`` edge string of the
    component (spanning-forest-independent, unlike the kernel's raw
    min-tree-child representative) — so the driver's SQL twin can
    compute the identical partition from the DEFINITION of
    biconnectivity (edges sharing v whose other endpoints stay
    connected in G − v, transitively closed).  Partition oracle vs nx
    in tests/test_biconnected.py."""
    import tempfile

    from igraph_ray.kernels.biconnected import biconnected_edge_labels

    pairs, vertices = _doc_undirected_vid_pairs(sf_dir)
    out = biconnected_edge_labels(
        pairs, graph_dir=tempfile.mkdtemp(prefix="igr_qbc_")
    )
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    keyed = _vid_to_key(
        tbl,
        vtbl,
        {"src": "src_key", "dst": "dst_key", "bicomp": "bicomp_key"},
    )
    # canonical relabel: min (src_key|dst_key) edge string per
    # component — partition-preserving, representation-free
    src = np.asarray(keyed.column("src_key").to_pylist(), object)
    dst = np.asarray(keyed.column("dst_key").to_pylist(), object)
    lab = np.asarray(keyed.column("bicomp_key").to_pylist(), object)
    edge_str = np.array(
        [f"{a}|{b}" for a, b in zip(src, dst)], object
    )
    canon: dict = {}
    for l, es in zip(lab, edge_str):
        if l not in canon or es < canon[l]:
            canon[l] = es
    return pa.table(
        {
            "src_key": pa.array(src, pa.string()),
            "dst_key": pa.array(dst, pa.string()),
            "bicomp_key": pa.array(
                [canon[l] for l in lab], pa.string()
            ),
        }
    )


def q_redact_pii(sf_dir: str):
    """(doc_id, redacted, email_n, ipv4_n, phone_n) — PII masking over
    the documents table with one planted email/IP/phone per doc (the
    corpus text is word soup, so the plant makes the operator's work
    observable); the SQL twin builds the identical planted text and
    replays the same staged RE2 count+replace."""
    from igraph_ray.functions.text import redact_pii

    def plant(batch: pa.Table) -> pa.Table:
        did = batch.column("doc_id")
        planted = pc.binary_join_element_wise(
            batch.column("text"),
            " contact user",
            pc.cast(did, pa.string()),
            "@mail.example.com via 10.1.",
            pc.cast(pc.subtract(did, pc.multiply(pc.divide(did, 256), 256)), pa.string()),
            ".7 tel +1 555 ",
            pc.cast(
                pc.add(
                    pc.subtract(
                        did, pc.multiply(pc.divide(did, 8999), 8999)
                    ),
                    1000,
                ),
                pa.string(),
            ),
            "",
        )
        return pa.table({"doc_id": did, "text": planted})

    return redact_pii(
        documents(sf_dir)
        .select_columns(["doc_id", "text"])
        .map_batches(plant, batch_format="pyarrow", zero_copy_batch=True)
    )


def q_widest_paths(sf_dir: str, graph_dir: str | None = None):
    """(key, width) — widest-path (maximum-bottleneck) widths from the
    smallest key over the E1∪E2 graph (edge weight = co-occurrence
    count); unreachable rows dropped, the source's own +inf row kept.
    Integer weights make every path width an exact integer, so the
    max-min recursive-CTE SQL twin replays the values bitwise."""
    import tempfile

    from igraph_ray.kernels.widest import widest_paths

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_wp_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    run = widest_paths(graph, [0])
    state = pa.concat_tables(
        run.state.select_columns(["vid", "width"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    w = state.column("width").to_numpy(zero_copy_only=False)
    keep = ~np.isneginf(w)
    out = pa.table(
        {
            "vid": pc.take(state.column("vid"), pa.array(np.flatnonzero(keep))),
            "width": pa.array(w[keep]),
        }
    )
    return _vid_to_key(out, vtbl, {"vid": "key"})


def q_generated_ba(sf_dir: str):
    """(degree_bucket, n_vertices) — log2-bucketed degree histogram of
    a deterministic Barabási–Albert graph (n = n_docs x 10, d = 3,
    fixed seed): exercises the communication-free preferential-
    attachment generator (sources/generators.py::barabasi_albert_edges,
    Batagelj–Brandes via stateless hash-pointer chase); rows-only
    driver check, structural oracles in tests/test_generators.py."""
    from igraph_ray.sources.generators import barabasi_albert_edges

    n_docs = documents(sf_dir).count()
    edges = barabasi_albert_edges(n_docs * 10, 3, seed=7)

    def deg_rows(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False)
        dst = batch.column("dst").to_numpy(zero_copy_only=False)
        return pa.table({"vid": pa.array(np.concatenate([src, dst]))})

    degs = (
        edges.map_batches(deg_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("vid")
        .aggregate(Count(alias_name="degree"))
    )

    def bucket(batch: pa.Table) -> pa.Table:
        d = batch.column("degree").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "degree_bucket": pa.array(
                    np.floor(np.log2(np.maximum(d, 1))).astype(np.int64)
                )
            }
        )

    return (
        degs.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("degree_bucket")
        .aggregate(Count(alias_name="n_vertices"))
    )


def q_generated_config_model(sf_dir: str):
    """(degree, n_vertices) — degree histogram of a configuration-model
    graph seeded with the E1∪E2 key graph's own degree sequence
    (igraph degree_sequence_game / rewiring null model; the histogram
    equals the original's BY CONSTRUCTION — the bitwise SQL twin
    recomputes the original degree histogram).  Exercises
    sources/generators.py::configuration_model_edges."""
    from igraph_ray.sources.generators import configuration_model_edges

    degs = q_degrees(sf_dir)
    tbl = pa.concat_tables(
        degs.iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("key")
    d = tbl.column("degree").to_numpy(zero_copy_only=False).astype(np.int64)
    if d.sum() % 2:  # guard (cannot happen: sum = 2|E|)
        d = d.copy()
        d[0] += 1
    edges = configuration_model_edges(d, seed=11)

    def endpoints(batch: pa.Table) -> pa.Table:
        s = batch.column("src").combine_chunks()
        t = batch.column("dst").combine_chunks()
        return pa.table({"vid": pa.concat_arrays([s, t])})

    out = (
        edges.map_batches(
            endpoints, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("vid")
        .aggregate(Count(alias_name="degree"))
        .groupby("degree")
        .aggregate(Count(alias_name="n_vertices"))
    )
    return out


def q_generated_rmat(sf_dir: str):
    """(degree_bucket, n_vertices) — log2-bucketed degree histogram of
    a deterministic scale-12 R-MAT graph (m = 16 x n_docs edges, seed
    fixed): exercises the distributed generator source
    (sources/generators.py); rows-only driver check, exactness and
    determinism oracles in tests/test_generators.py."""
    from igraph_ray.sources.generators import rmat_edges

    n_docs = documents(sf_dir).count()
    edges = rmat_edges(scale=12, m=16 * n_docs, seed=42)

    def deg_rows(batch: pa.Table) -> pa.Table:
        src = batch.column("src").to_numpy(zero_copy_only=False)
        dst = batch.column("dst").to_numpy(zero_copy_only=False)
        return pa.table({"vid": pa.array(np.concatenate([src, dst]))})

    from ray.data.aggregate import Count

    degs = (
        edges.map_batches(deg_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("vid")
        .aggregate(Count(alias_name="degree"))
    )

    def bucket(batch: pa.Table) -> pa.Table:
        d = batch.column("degree").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "degree_bucket": pa.array(
                    np.floor(np.log2(np.maximum(d, 1))).astype(np.int64)
                )
            }
        )

    return (
        degs.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("degree_bucket")
        .aggregate(Count(alias_name="n_vertices"))
    )


GRG_RADIUS = 0.04
GRG_SEED = 5


def q_generated_grg(sf_dir: str):
    """(src, dst) — FULL edge list of a deterministic geometric random
    graph (igraph ``grg_game``; n = 2 x n_docs points splitmix-uniform
    in the unit square, undirected edge iff distance <= 0.04).
    Distributed shape: grid-bucketed self-radius-join, ONE shuffle on
    the cell id, per-cell work O(n·r²) — never an all-pairs product
    (sources/generators.py::grg_edges).  The SQL twin replays the
    splitmix64 position draws in HUGEINT and the IEEE distance test
    bitwise, so the edge SET matches hash-exact."""
    from igraph_ray.sources.generators import grg_edges

    n = 2 * documents(sf_dir).count()
    return grg_edges(n, GRG_RADIUS, seed=GRG_SEED)


BAND_US = 60 * 60 * 1_000_000  # 60 min
ATTR_US = 2 * 3_600 * 1_000_000  # 2 h attribution window


def q_event_pairs_band(sf_dir: str):
    """(user_id, l_event_id, r_event_id, dt_us) — time-band self join:
    every ordered pair of one user's events strictly within 60 minutes
    (0 < dt <= band).  Bucketed band join (stages/interval.py): one
    groupby on hash(user, time-bin), never an all-pairs product."""
    from igraph_ray.stages.interval import band_join

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )
    return band_join(ev, "user_id", "ts", "event_id", BAND_US)


def q_purchase_attribution(sf_dir: str):
    """(user_id, event_id, click_id, offset_us) — point-in-interval
    join: each purchase attributed to every click by the same user in
    the preceding 2 hours (click.ts <= purchase.ts < click.ts + 2h).
    Bucketed interval join (stages/interval.py)."""
    from igraph_ray.stages.interval import interval_join

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    purchases = ev.filter(
        expr="event_type == 'purchase'"
    ).select_columns(["user_id", "ts", "event_id"])

    def as_click(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "ts": batch.column("ts"),
                "click_id": batch.column("event_id"),
            }
        )

    clicks = ev.filter(expr="event_type == 'click'").map_batches(
        as_click, batch_format="pyarrow", zero_copy_batch=True
    )
    return interval_join(
        purchases,
        clicks,
        key_col="user_id",
        ts_col="ts",
        point_id_col="event_id",
        iv_key_col="user_id",
        iv_start_col="ts",
        iv_len_us=ATTR_US,
        iv_id_col="click_id",
    )


def q_lineitem_cube(sf_dir: str):
    """(l_returnflag, l_linestatus, n, sum_qty) at every CUBE grain —
    detail, each one-dim subtotal, grand total ('ALL' sentinels).  The
    fact table is aggregated ONCE; coarser grains re-aggregate the tiny
    detail result (stages/cube.py)."""
    from igraph_ray.stages.cube import cube_sets, grouping_sets

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity"],
    )

    def qty_int(batch: pa.Table) -> pa.Table:
        qv = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "qty": pa.array(qv.astype(np.int64)),
            }
        )

    li = li.map_batches(qty_int, batch_format="pyarrow", zero_copy_batch=True)
    dims = ("l_returnflag", "l_linestatus")
    out = grouping_sets(li, dims, ("qty",), cube_sets(dims))
    # columns arrive as (dims..., n, sum_qty); only the metric name
    # needs the sum_ prefix mapped onto the public qty name
    return out.map_batches(
        lambda b: b.rename_columns(
            ["l_returnflag", "l_linestatus", "n", "sum_qty"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def q_segment_status_pivot(sf_dir: str):
    """(c_mktsegment, n_F, n_O, n_P, total) — orders pivoted wide by
    order status per customer market segment: broadcast dimension join
    (customer is the small side) + conditional aggregation, one shuffle
    of pre-combined partials (stages/cube.py)."""
    from igraph_ray.stages.cube import pivot_counts
    from igraph_ray.stages.join import broadcast_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderstatus"]
    )
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    joined = broadcast_join(
        orders, cust, on="o_custkey", right_on="c_custkey"
    )
    return pivot_counts(
        joined, "c_mktsegment", "o_orderstatus", ("F", "O", "P")
    )


def q_moving_totals(sf_dir: str):
    """(user_id, ts, event_id, lag_cents, lead_cents, mov_sum, mov_n)
    — per-user trailing-4-row moving sum plus LAG/LEAD neighbors in
    (ts, event_id) order; exact ints, nulls at key boundaries exactly
    as the SQL window functions produce them."""
    from igraph_ray.stages.window import moving_agg

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"],
    )

    def cents(batch: pa.Table) -> pa.Table:
        v = batch.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "ts": batch.column("ts"),
                "event_id": batch.column("event_id"),
                "cents": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64)),
            }
        )

    ev = ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    out = moving_agg(ev, "user_id", "ts", "event_id", "cents", 4)

    # boundary nulls (first/last row per key) coalesced to 0 so the
    # driver's value hash is NaN-free; the stage itself emits proper
    # SQL nulls (tests/test_cube_moving.py checks those)
    def fill(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                c: (
                    pc.fill_null(batch.column(c), 0)
                    if c in ("lag_cents", "lead_cents")
                    else batch.column(c)
                )
                for c in batch.column_names
            }
        )

    return out.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)


MIXTURE_RATES = {
    "en": (9, 10),
    "de": (5, 10),
    "fr": (3, 10),
    "es": (2, 10),
    "zh": (1, 10),
}


def q_mixture_sample(sf_dir: str):
    """(doc_id, lang, source) — deterministic language-mixture
    rebalancing: keep doc iff splitmix64(doc_id) % 10 < per-lang
    numerator (en 9, de 5, fr 3, es 2, zh 1).  Map-only, block-layout
    independent, replayed bitwise by the SQL twin."""
    from igraph_ray.stages.sample import mixture_sample

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "source"]
    )
    return mixture_sample(docs, "lang", "doc_id", MIXTURE_RATES)


def q_spectral_bisection(sf_dir: str, graph_dir: str | None = None):
    """(key, side) — Fiedler-vector spectral bisection
    of the E1∪E2 link graph (kernels/spectral.py: deflated power
    iteration on sigma*I - L with driver-fed mean/norm, one shuffle
    per matvec).  Rows-only driver check; dense-eigh exactness oracles
    in tests/test_spectral.py."""
    import tempfile

    from igraph_ray.kernels.spectral import fiedler_vector

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_spec_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    # side signs stabilize far before the vector's last digits; 1e-5
    # keeps this check-scale query fast
    vec, lam2 = fiedler_vector(
        graph, graph.num_vertices, tol=1e-5, max_iter=2000
    )

    def cut(batch: pa.Table) -> pa.Table:
        f = batch.column("fiedler").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vid": batch.column("vid"),
                "side": pa.array((f >= 0).astype(np.int64)),
            }
        )

    state = pa.concat_tables(
        vec.map_batches(cut, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    return _vid_to_key(state, vtbl, {"vid": "key", "side": "side"})


PACK_CAPACITY = 512
PACK_STREAMS = 8


def q_packed_chunks(sf_dir: str):
    """(doc_id, stream, chunk_id, tok_start, tok_end) — concat-and-chop
    sequence packing of documents into 512-token context windows over 8
    deterministic streams (doc_id % 8, ascending doc_id order); token
    counts from the whitespace tokenizer.  Exact-int SQL twin via
    SUM-OVER cumsum + generate_series chunk spans."""
    from igraph_ray.functions.packing import pack_chunks

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    counted = token_count(docs).select_columns(["doc_id", "n_tokens"])
    return pack_chunks(
        counted, "doc_id", "n_tokens", PACK_CAPACITY, PACK_STREAMS
    )


def q_voterank(sf_dir: str, graph_dir: str | None = None):
    """(rank, key) — top-10 VoteRank spreaders of the E1∪E2 link graph
    in selection order (kernels/voterank.py; nx.voterank exactness
    oracles in tests/test_voterank.py).  Rows-only driver check."""
    import tempfile

    from igraph_ray.kernels.voterank import voterank

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_vr_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    sel = voterank(graph, graph.num_vertices, number_of_nodes=10)
    state = pa.table(
        {
            "vid": pa.array(sel, pa.int64()),
            "rank": pa.array(range(1, len(sel) + 1), pa.int64()),
        }
    )
    # only vid maps to a key; rank is ordinal data (the round-5 SQL
    # twin caught the old {"rank": "rank"} entry routing ranks through
    # the key table — a bug rows-only checks could never see)
    return _vid_to_key(state, vtbl, {"vid": "key"})


def q_paragraph_dedup(sf_dir: str):
    """(doc_id, clean_text, n_kept, n_removed) — C4-style exact
    paragraph dedup over aligned 5-word chunks, first occurrence by
    (doc_id, idx) wins; removed chunks excised and the doc re-joined
    with single spaces (functions/paragraphs.py)."""
    from igraph_ray.functions.paragraphs import paragraph_dedup

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return paragraph_dedup(docs, "doc_id", "text", width=5)


def q_pca_embeddings(sf_dir: str):
    """(vec_id, projection[8]) — exact-covariance PCA of the embedding
    table to 8 components: two map-only passes (per-batch Gram-matrix
    partials → driver eigh → broadcast projection), deterministic sign
    convention (functions/pca.py; numpy dense oracles in
    tests/test_pca.py).  Rows-only driver check."""
    from igraph_ray.functions.pca import pca_project

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    out, _var = pca_project(emb, "vec_id", "embedding", 8)
    return out


def q_quotient_graph(sf_dir: str):
    """(c_src, c_dst, weight, n_edges) — community-contracted quotient
    of the E1∪E2 link graph under the deterministic assignment
    community = vid % 8 (vids = global sorted key ranks): every edge
    maps through the broadcast vid→community table, one grouped
    aggregate sums weights and counts contracted edges
    (stages/graph_ops.py::quotient_graph)."""
    from igraph_ray.stages.graph_ops import quotient_graph

    pairs = _link_graph_edges(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key")
    edges = attach_vids(pairs, vertices)

    def comm_of(batch: pa.Table) -> pa.Table:
        v = batch.column("vid").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "vid": pa.array(v),
                "comm": pa.array((v % 8).astype(np.int64)),
            }
        )

    assignment = vertices.map_batches(
        comm_of, batch_format="pyarrow", zero_copy_batch=True
    )
    return quotient_graph(edges, assignment)


def q_neighborhood2(sf_dir: str):
    """(key, n2) — closed 2-hop neighborhood size per vertex of the
    E1∪E2 link graph (igraph ``neighborhood_size(order=2)``): |{u :
    d(v,u) <= 2}| including v itself and isolated vertices (n2 = 1).
    One distributed self-join on the arc table + two dedup/count
    grouped aggregates; the wedge blow-up is bounded by sum(deg^2)
    (degree-ordered capping is the documented scale path, as in the
    triangle pipeline)."""
    from igraph_ray.stages.join import hash_join

    pairs = _link_graph_edges(sf_dir)

    def both_dirs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": pa.concat_arrays(
                    [
                        batch.column("src_key").combine_chunks(),
                        batch.column("dst_key").combine_chunks(),
                    ]
                ),
                "b": pa.concat_arrays(
                    [
                        batch.column("dst_key").combine_chunks(),
                        batch.column("src_key").combine_chunks(),
                    ]
                ),
            }
        )

    # materialized once: the deduped arc table feeds both join sides
    # (at scale this is a persisted shuffle output, spilled not held)
    arcs = (
        pairs.map_batches(
            both_dirs, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="_c"))
        .select_columns(["a", "b"])
        .materialize()
    )

    def as_mid(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"mid": batch.column("a"), "b2": batch.column("b")}
        )

    right = arcs.map_batches(
        as_mid, batch_format="pyarrow", zero_copy_batch=True
    )
    hop2 = hash_join(arcs, right, on="b", right_on="mid").select_columns(
        ["a", "b2"]
    )

    def rename_hop2(batch: pa.Table) -> pa.Table:
        return pa.table({"a": batch.column("a"), "b": batch.column("b2")})

    hop2 = hop2.map_batches(
        rename_hop2, batch_format="pyarrow", zero_copy_batch=True
    )

    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )

    def self_pairs(batch: pa.Table) -> pa.Table:
        k = batch.column("key")
        return pa.table({"a": k, "b": k})

    selfs = keys.groupby("key").aggregate(
        Count(alias_name="_c")
    ).select_columns(["key"]).map_batches(
        self_pairs, batch_format="pyarrow", zero_copy_batch=True
    )

    all_pairs = (
        arcs.union(hop2)
        .union(selfs)
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="_c"))
    )

    def drop(batch: pa.Table) -> pa.Table:
        return pa.table({"key": batch.column("a")})

    return (
        all_pairs.map_batches(
            drop, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("key")
        .aggregate(Count(alias_name="n2"))
    )


def _farthest(run) -> int:
    """Farthest reachable vid (smallest vid on distance ties) from a
    shortest-path run — per-block partial argmax, tiny driver reduce."""
    best = None
    for b in run.state.iter_batches(batch_format="pyarrow", batch_size=None):
        v = b.column("vid").to_numpy(zero_copy_only=False)
        d = b.column("dist").to_numpy(zero_copy_only=False)
        fin = np.isfinite(d)
        if not fin.any():
            continue
        i = np.lexsort((v[fin], -d[fin]))[0]
        cand = (float(d[fin][i]), int(v[fin][i]))
        if best is None or (-cand[0], cand[1]) < (-best[0], best[1]):
            best = cand
    assert best is not None
    return best[1]


def q_shortest_path_route(sf_dir: str, graph_dir: str | None = None):
    """(step, key) — a pseudo-diameter path of the E1∪E2 link graph by
    the classic double sweep (igraph ``pseudo_diameter``): BFS tree
    from vid 0 → farthest vertex u, BFS tree from u → farthest w, then
    the parent-pointer trace u→w (kernels/sssp.py::shortest_path_tree
    with deterministic smallest-parent tie-break).  Rows-only; nx
    path-validity oracles in tests/test_path_tree.py."""
    import tempfile

    from igraph_ray.kernels.sssp import shortest_path_tree, trace_path

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_spt_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    u = _farthest(shortest_path_tree(graph, source=0, weighted=False))
    run = shortest_path_tree(graph, source=u, weighted=False)
    w = _farthest(run)
    path = trace_path(run.state, u, w)
    tbl = pa.table(
        {
            "step": pa.array(range(len(path)), pa.int64()),
            "vid": pa.array(path, pa.int64()),
        }
    )
    return _vid_to_key(tbl, vtbl, {"vid": "key"})


def q_distinct_users_exact(sf_dir: str):
    """(event_type, n_users) — EXACT distinct users per event type via
    the two-level grouped aggregate (dedup groupby then count), the
    exact twin of the HLL sketch query `approx_distinct_users`."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    dedup = ev.groupby(["event_type", "user_id"]).aggregate(
        Count(alias_name="_c")
    )
    return (
        dedup.select_columns(["event_type"])
        .groupby("event_type")
        .aggregate(Count(alias_name="n_users"))
    )


def q_user_journeys(sf_dir: str):
    """(user_id, journey, n_events) — each user's first 20 event types
    concatenated with '>' in (ts, event_id) order: the string_agg /
    collect_list surface (stages/collect.py, segmented ListArray join,
    no per-key Python)."""
    from igraph_ray.stages.collect import collect_ordered

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    return collect_ordered(
        ev, "user_id", "ts", "event_id", "event_type", sep=">", limit=20
    )


def q_events_jsonl_agg(sf_dir: str):
    """(event_type, n, sum_cents) — S1 source-format coverage beyond
    parquet: events are converted to exact integer cents, written as
    JSONL (one scratch dump per sf dir under /tmp), read back with
    ray.data.read_json, and aggregated.  Ints survive the JSON
    roundtrip bitwise, so the SQL twin over the original parquet
    hash-matches."""
    import os

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = f"/tmp/igr_jsonl_{tag}"
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        ev = ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        )

        def cents(batch: pa.Table) -> pa.Table:
            v = batch.column("value").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "event_type": batch.column("event_type"),
                    "cents": pa.array(
                        np.floor(v * 100.0 + 0.5).astype(np.int64)
                    ),
                }
            )

        ev.map_batches(
            cents, batch_format="pyarrow", zero_copy_batch=True
        ).write_json(out)
        with open(marker, "w") as f:
            f.write("ok\n")
    back = ray.data.read_json(
        [
            os.path.join(out, f)
            for f in sorted(os.listdir(out))
            if f.endswith(".json")
        ]
    )
    return back.groupby("event_type").aggregate(
        Count(alias_name="n"), Sum("cents", alias_name="sum_cents")
    )


def q_hyperball_nf(sf_dir: str, graph_dir: str | None = None):
    """(key, r0..r7) — the CONVERGED HyperBall registers per vertex
    (kernels/hyperball.py: 64 HLL registers packed into eight int64
    columns; at convergence each vertex's counter has absorbed its
    whole component's hashes).  Registers are exact splitmix64-derived
    integers, so a DuckDB reachability-closure twin replays them
    bitwise (round-5 promotion); the derived nf curve / effective
    diameter stay pytest-gated (tests/test_hyperball.py — float sums
    over vertices have no defined order)."""
    import tempfile

    from igraph_ray.kernels.hyperball import _COLS, hyperball

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_hb_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    run, _nf, _eff = hyperball(graph)
    state = pa.concat_tables(
        run.state.select_columns(["vid", *_COLS]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    return _vid_to_key(state, vtbl, {"vid": "key"})


def q_wl_colors(sf_dir: str, graph_dir: str | None = None):
    """(key, wl_color) — depth-3 Weisfeiler–Lehman refinement colors
    of the E1∪E2 link graph (kernels/wl.py: multiset-sum message
    hashing, bitwise-deterministic across runs/partitionings; local
    replay + nx subtree-class oracles in tests/test_wl.py).
    Rows-only driver check."""
    import tempfile

    from igraph_ray.kernels.wl import wl_colors

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_wl_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    run = wl_colors(graph, rounds=3)
    state = pa.concat_tables(
        run.state.select_columns(["vid", "color"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).rename_columns(["vid", "wl_color"])
    # only vid is a vertex id; wl_color is a hash value and passes
    # through unmapped
    return _vid_to_key(state, vtbl, {"vid": "key"})


def q_four_cycles(sf_dir: str):
    """(n_c4) — global rectangle (4-cycle) count of the E1∪E2 link
    graph via the codegree identity Σ C(codeg,2)/2 over the cocitation
    pipeline (kernels/cliques.py::four_cycle_count).  Exact ints."""
    from igraph_ray.kernels.cliques import four_cycle_count

    pairs = _link_graph_edges(sf_dir)
    vertices = assign_vertex_ids(
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"}),
        key_col="key",
    )
    edges = attach_vids(pairs, vertices)

    def both(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([s, d])),
                "dst": pa.array(np.concatenate([d, s])),
            }
        )

    arcs = edges.map_batches(
        both, batch_format="pyarrow", zero_copy_batch=True
    )
    return pa.table({"n_c4": pa.array([four_cycle_count(arcs)], pa.int64())})


WEEK_US = 7 * 24 * 3_600 * 1_000_000


def q_funnel_counts(sf_dir: str):
    """(step, step_name, n_users) — ordered view→click→purchase funnel
    over the events stream: a user advances to step i only with an
    event of that type strictly later (ts, event_id) than their chosen
    step-i-1 event; greedy earliest chain (stages/funnel.py)."""
    from igraph_ray.stages.funnel import funnel_counts

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    return funnel_counts(
        ev, "user_id", "ts", "event_id", "event_type",
        ("view", "click", "purchase"),
    )


def q_cohort_retention(sf_dir: str):
    """(cohort, offset, n_users) — weekly cohort retention matrix:
    cohort = user's first-event week, one count per distinct active
    week per user (stages/funnel.py)."""
    from igraph_ray.stages.funnel import cohort_retention

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    return cohort_retention(ev, "user_id", "ts", WEEK_US)


def q_corpus_report(sf_dir: str):
    """(metric, value) — one-table corpus curation report: document
    count, exact-duplicate docs (same sha256 as an earlier doc), total
    and median whitespace tokens, distinct languages/sources.  Each
    stat is a streaming aggregate over pruned columns; the SQL twin
    recomputes every metric independently (exact ints)."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )
    sha = with_content_sha(
        docs.select_columns(["doc_id", "text"]), column="text"
    )
    n_docs = docs.count()
    # docs whose sha already appeared on a smaller doc_id
    firsts = sha.groupby("content_sha").aggregate(
        Min("doc_id", alias_name="keeper")
    )
    n_distinct = firsts.count()
    n_dups = n_docs - n_distinct

    counted = token_count(docs).select_columns(["doc_id", "n_tokens"])
    total_tokens = counted.sum("n_tokens")

    from igraph_ray.stages.quantile import exact_quantiles_int

    med = (
        exact_quantiles_int(counted, "n_tokens", [0.5])
        .column("value")[0]
        .as_py()
    )

    n_langs = (
        docs.select_columns(["lang"])
        .groupby("lang")
        .aggregate(Count(alias_name="_c"))
        .count()
    )
    n_sources = (
        docs.select_columns(["source"])
        .groupby("source")
        .aggregate(Count(alias_name="_c"))
        .count()
    )
    return pa.table(
        {
            "metric": pa.array(
                [
                    "n_docs",
                    "n_exact_dup_docs",
                    "total_tokens",
                    "median_tokens",
                    "n_langs",
                    "n_sources",
                ]
            ),
            "value": pa.array(
                [
                    n_docs,
                    n_dups,
                    int(total_tokens),
                    int(med),
                    n_langs,
                    n_sources,
                ],
                pa.int64(),
            ),
        }
    )


def q_quality_sample(sf_dir: str):
    """(doc_id, lang) — quality-weighted importance sampling: each doc
    kept with probability equal to its quality score via the
    deterministic splitmix64 acceptance draw (stages/sample.py::
    weighted_sample + functions/text.py::quality_score)."""
    from igraph_ray.stages.sample import weighted_sample

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    scored = quality_score(docs, "text")
    kept = weighted_sample(scored, "doc_id", "quality")
    return kept.select_columns(["doc_id", "lang"])


def q_anomaly_windows(sf_dir: str):
    """(event_type, window_start, n_events, is_anomaly) — hourly event
    counts flagged as anomalous when |z| > 2 against the type's own
    window distribution, decided in EXACT integer arithmetic: with k
    windows, S = Σx, Q = Σx², flag iff
    (k·x − S)²·(k−1) > 4·k·(k·Q − S²) — the cross-multiplied form of
    (x−μ)² > 4σ² (sample variance), so the SQL twin matches bitwise
    with no IEEE replay at all."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def win(batch: pa.Table) -> pa.Table:
        t = batch.column("ts").to_numpy(zero_copy_only=False)
        t = t.astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "window_start": pa.array((t // WINDOW_US) * WINDOW_US),
                "n": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    counts = (
        ev.map_batches(win, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("n", alias_name="n_events"))
    )

    def sq(batch: pa.Table) -> pa.Table:
        x = batch.column("n_events").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "k": pa.array(np.ones(len(x), np.int64)),
                "s": pa.array(x.astype(np.int64)),
                "q2": pa.array((x * x).astype(np.int64)),
            }
        )

    stats = (
        counts.map_batches(sq, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .aggregate(
            Sum("k", alias_name="k"),
            Sum("s", alias_name="s"),
            Sum("q2", alias_name="q2"),
        )
    )
    # per-type stats: a handful of rows — collected once and shipped
    # in the task closure (the classic broadcast small side)
    lut = {
        r["event_type"]: (r["k"], r["s"], r["q2"])
        for r in stats.take_all()
    }

    def flag(batch: pa.Table) -> pa.Table:
        x = batch.column("n_events").to_numpy(zero_copy_only=False)
        types = batch.column("event_type").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(types, return_inverse=True)
        # the SQL twin compares in HUGEINT; int64 silently wraps when
        # s**2 / the cross terms exceed 2**63.  Pick dtype by an exact
        # Python-int bound on the worst-case magnitudes (per-type
        # constants are tiny — this check is O(types)): int64 fast
        # path when safe, arbitrary-precision object path otherwise.
        max_x = int(x.max()) if len(x) else 0
        safe = all(
            (k_ * max_x + abs(s_)) ** 2 * max(k_ - 1, 1) < 2**63
            and 4 * k_ * (k_ * q2_ + s_ * s_) < 2**63
            for k_, s_, q2_ in (lut[t] for t in uniq)
        )
        dtype = np.int64 if safe else object
        trip = np.array([lut[t] for t in uniq], dtype)
        k, s, q2 = trip[inv, 0], trip[inv, 1], trip[inv, 2]
        if not safe:
            x = x.astype(object)
        lhs = (k * x - s) ** 2 * (k - 1)
        rhs = 4 * k * (k * q2 - s * s)
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "window_start": batch.column("window_start"),
                "n_events": pa.array(x.astype(np.int64)),
                "is_anomaly": pa.array(
                    ((k > 1) & (lhs > rhs)).astype(np.int64)
                ),
            }
        )

    return counts.map_batches(
        flag, batch_format="pyarrow", zero_copy_batch=True
    )


def q_running_revenue(sf_dir: str):
    """(o_orderkey, ts, cents, scan) — GLOBAL running revenue over all
    orders in (o_orderdate, o_orderkey) order: the total-order
    exclusive-scan primitive (stages/scan.py, two-phase distributed
    prefix sum — sort, per-block bases, map-side cumsum)."""
    from igraph_ray.stages.scan import exclusive_scan

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_totalprice"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        t = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
        v = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "ts": pa.array(t.astype("datetime64[us]").astype(np.int64)),
                "o_orderkey": batch.column("o_orderkey"),
                "cents": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64)),
            }
        )

    prepped = orders.map_batches(
        prep, batch_format="pyarrow", zero_copy_batch=True
    )
    return exclusive_scan(prepped, ("ts", "o_orderkey"), "cents")


def q_repo_assortativity(sf_dir: str):
    """(r, n, tr, ab) — categorical assortativity of the E1∪E2 link
    graph by repo (the key's prefix before ':'): integer mixing-matrix
    sufficient statistics and ONE final IEEE division
    (kernels/metrics.py::attribute_assortativity; nx parity test in
    tests/test_metrics.py)."""
    from igraph_ray.kernels.metrics import attribute_assortativity

    pairs = _link_graph_edges(sf_dir)

    def arcs(batch: pa.Table) -> pa.Table:
        s = batch.column("src_key").combine_chunks()
        d = batch.column("dst_key").combine_chunks()
        both_s = pa.concat_arrays([s, d])
        both_d = pa.concat_arrays([d, s])
        rep = pc.replace_substring_regex(both_s, ":.*$", "")
        red = pc.replace_substring_regex(both_d, ":.*$", "")
        return pa.table({"cat_src": rep, "cat_dst": red})

    ds = pairs.map_batches(arcs, batch_format="pyarrow", zero_copy_batch=True)
    r, st = attribute_assortativity(ds)
    return pa.table(
        {
            "r": pa.array([r], pa.float64()),
            "n": pa.array([st["n"]], pa.int64()),
            "tr": pa.array([st["tr"]], pa.int64()),
            "ab": pa.array([st["ab"]], pa.int64()),
        }
    )


PERC_PCTS = (40, 70)


def q_percolation(sf_dir: str):
    """(pct, giant, n_kept) — deterministic bond percolation: keep each
    canonical link-graph edge iff splitmix64(src_vid·2^20 + dst_vid) %
    100 < pct, rebuild the graph, and report the largest connected
    component (robustness-curve surface).  Both the edge draw and the
    component computation replay exactly in SQL."""
    import tempfile

    pairs = _link_graph_edges(sf_dir).materialize()
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices).materialize()

    out_rows = []
    for pct in PERC_PCTS:
        def keep(batch: pa.Table, _p=pct) -> pa.Table:
            s = batch.column("src").to_numpy(zero_copy_only=False)
            d = batch.column("dst").to_numpy(zero_copy_only=False)
            fused = (s << 20) | d
            from igraph_ray.utils import hash_int64

            z = hash_int64(fused) % np.uint64(100)
            return batch.filter(pa.array(z < np.uint64(_p)))

        sub = edges.map_batches(
            keep, batch_format="pyarrow", zero_copy_batch=True
        )
        n_kept = sub.count()
        gdir = tempfile.mkdtemp(prefix=f"igr_perc{pct}_")
        graph = build_graph(
            sub,
            gdir,
            vertices=vertices.select_columns(["vid"]),
            symmetrize=True,
        )
        run = connected_components(graph)
        sizes = (
            run.state.groupby("comp")
            .aggregate(Count(alias_name="n"))
            .max("n")
        )
        out_rows.append((pct, int(sizes or 0), n_kept))
    return pa.table(
        {
            "pct": pa.array([r[0] for r in out_rows], pa.int64()),
            "giant": pa.array([r[1] for r in out_rows], pa.int64()),
            "n_kept": pa.array([r[2] for r in out_rows], pa.int64()),
        }
    )


def q_doc_perplexity(sf_dir: str):
    """(doc_id, n_tokens, avg_logp, ppl) — per-doc unigram-LM
    perplexity under the corpus's own capped vocabulary (the KenLM-ish
    quality filter; functions/text.py::unigram_logprob, vocabulary
    broadcast once, binary-search scoring).  Rows-only; brute-force
    pytest oracle in tests/test_unigram_lm.py."""
    from igraph_ray.functions.text import (
        corpus_unigram_counts,
        unigram_logprob,
    )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    vocab, total = corpus_unigram_counts(docs)
    return unigram_logprob(docs, vocab, total)


def q_bigram_perplexity(sf_dir: str):
    """(doc_id, n_tokens, avg_logp, ppl) — per-doc interpolated
    bigram-LM perplexity (CCNet-style order-2 quality filter; Wenzek
    et al. 2020; functions/text.py::bigram_logprob — both model
    tables broadcast once, binary-search scoring).  Rows-only;
    sequential-replay pytest oracle in tests/test_bigram_lm.py."""
    from igraph_ray.functions.text import bigram_logprob, corpus_bigram_lm

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    vocab, total, btbl = corpus_bigram_lm(docs)
    return bigram_logprob(docs, vocab, total, btbl)


def q_pattern_counts(sf_dir: str):
    """(n_p4, n_p4_induced, n_claw) — subgraph pattern-match counts
    over the E1∪E2 link graph: 4-path monomorphisms, induced 4-path
    isomorphisms, and claw (K1,3) monomorphisms, via the distributed
    edge-join expansion (kernels/pattern.py; igraph
    count_subisomorphisms_vf2 surface).  Exact ints — SQL hash twin
    is the same multi-way self-join with injectivity predicates."""
    from igraph_ray.kernels.pattern import count_subgraph_matches

    pairs = _link_graph_edges_cached(sf_dir)
    vertices = assign_vertex_ids(
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"}),
        key_col="key",
    )
    edges = attach_vids(pairs, vertices).select_columns(["src", "dst"])
    edges = edges.materialize()
    p4 = [(0, 1), (1, 2), (2, 3)]
    claw = [(0, 1), (0, 2), (0, 3)]
    return pa.table(
        {
            "n_p4": pa.array(
                [count_subgraph_matches(edges, p4)], pa.int64()
            ),
            "n_p4_induced": pa.array(
                [count_subgraph_matches(edges, p4, induced=True)],
                pa.int64(),
            ),
            "n_claw": pa.array(
                [count_subgraph_matches(edges, claw)], pa.int64()
            ),
        }
    )


def q_chordality(sf_dir: str):
    """(chordal, witness_u, witness_p, witness_v) — chordality of the
    E1∪E2 link graph via MCS + parent test (kernels/chordal.py;
    igraph is_chordal surface).  Rows-only: the verdict is
    certificate-based (PEO / failing triple), pytest oracle vs
    nx.is_chordal in tests/test_chordal.py."""
    from igraph_ray.kernels.chordal import is_chordal

    pairs = _link_graph_edges_cached(sf_dir)
    vertices = assign_vertex_ids(
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"}),
        key_col="key",
    )
    edges = attach_vids(pairs, vertices).select_columns(["src", "dst"])
    r = is_chordal(edges)
    # -1 sentinel (not NULL) when chordal: NULL/NaN defeats both the
    # driver hash compare and allclose
    w = r["witness"] or (-1, -1, -1)
    return pa.table(
        {
            "chordal": pa.array([r["chordal"]], pa.bool_()),
            "witness_u": pa.array([w[0]], pa.int64()),
            "witness_p": pa.array([w[1]], pa.int64()),
            "witness_v": pa.array([w[2]], pa.int64()),
        }
    )


def q_circuit_rank(sf_dir: str, graph_dir: str | None = None):
    """One row (n_vertices, n_edges, n_components, circuit_rank) of
    the E1∪E2 key graph — cycle-space dimension m − n + c (igraph
    ``girth``/cycle-basis family; every file key is a vertex, isolated
    keys are singleton components).  Exact ints — recursive-CC SQL
    twin; c comes from the distributed components kernel, m/n from
    streaming counts."""
    import tempfile

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_crank_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    run = connected_components(graph)
    n_comp = int(
        run.state.select_columns(["comp"]).groupby("comp").count().count()
    )
    n = int(vtbl.num_rows)
    m = int(_link_graph_edges_cached(sf_dir).count())
    return pa.table(
        {
            "n_vertices": pa.array([n], pa.int64()),
            "n_edges": pa.array([m], pa.int64()),
            "n_components": pa.array([n_comp], pa.int64()),
            "circuit_rank": pa.array([m - n + n_comp], pa.int64()),
        }
    )


def q_complement_summary(sf_dir: str):
    """(comp_degree, n_keys) — degree histogram of the COMPLEMENT of
    the E1∪E2 key graph over all file keys (igraph ``complementer``
    surface without materializing the O(n²) complement edge set): a
    vertex with d distinct neighbors has complement degree n−1−d,
    keys with no link pairs get n−1.  The histogram is computed
    distributed (endpoint explode → groupby); only the O(distinct
    degrees) remap runs on the driver.  Exact ints."""
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    # distinct keys (one vertex per repo:path, not per document row)
    n = int(keys.groupby("key").count().count())
    hist = pa.concat_tables(
        q_degree_histogram(sf_dir).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    deg = hist.column("degree").to_numpy(zero_copy_only=False).astype(np.int64)
    cnt = hist.column("n_keys").to_numpy(zero_copy_only=False).astype(np.int64)
    comp = (n - 1) - deg
    n_zero = n - int(cnt.sum())
    if n_zero > 0:
        comp = np.concatenate([comp, np.array([n - 1], np.int64)])
        cnt = np.concatenate([cnt, np.array([n_zero], np.int64)])
    # merge buckets (only the n-1 bucket can collide with the zero-
    # degree bucket; np.unique keeps it general)
    uniq, inv = np.unique(comp, return_inverse=True)
    out = np.zeros(len(uniq), np.int64)
    np.add.at(out, inv, cnt)
    return pa.table(
        {
            "comp_degree": pa.array(uniq, pa.int64()),
            "n_keys": pa.array(out, pa.int64()),
        }
    )


def q_shortest_path_counts(sf_dir: str, graph_dir: str | None = None):
    """(key, dist, sigma) for every key reachable from the
    lexicographically smallest key of the E1∪E2 graph — sigma = exact
    number of distinct shortest paths (igraph
    ``get_all_shortest_paths`` cardinality; Brandes forward phase,
    kernels/betweenness.py::shortest_path_counts).  Exact ints — the
    SQL twin enumerates every shortest path with a dist-increasing
    recursive walk and counts arrivals."""
    import tempfile

    from igraph_ray.kernels.betweenness import shortest_path_counts

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_spc_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    out = pa.concat_tables(
        shortest_path_counts(graph, source=0).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    return _vid_to_key(out, vtbl, {"vid": "key"})


def q_bloom_semi_join(sf_dir: str):
    """(l_orderkey, n_items) for every lineitem order key that passes
    a Bloom-filter semi-join against the URGENT order-key set — the
    canonical 100-TB join-pruning stage (stages/bloom.py).  The filter
    is deliberately small (m=8192 bits, k=2) so deterministic FALSE
    POSITIVES survive into the output; the SQL twin replays the
    double-splitmix64 positions with HUGEINT arithmetic and reproduces
    the exact same pass set, false positives included."""
    from igraph_ray.stages.bloom import bloom_semi_join, build_bloom

    urgent = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"],
    ).filter(expr="o_orderpriority == '1-URGENT'")
    bits = build_bloom(urgent, "o_orderkey", m_bits=8192, k=2)
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]
    )
    return (
        bloom_semi_join(li, "l_orderkey", bits, k=2)
        .groupby("l_orderkey")
        .aggregate(Count("l_orderkey", alias_name="n_items"))
    )


def q_cms_term_freq(sf_dir: str):
    """(term, est) — count-min-sketch frequency estimates (depth=3,
    width=1024, sha256 double hashing; stages/sketch.py::cms_build_text)
    for every distinct token of the probe docs (doc_id % 199 == 0),
    sketched over the WHOLE corpus.  Estimates are exact ints >= the
    true counts; the SQL twin replays the sha256 bucket arithmetic and
    the per-cell sums bitwise, collisions included."""
    from igraph_ray.functions.text import _tokens_table
    from igraph_ray.stages.sketch import cms_build_text, cms_estimate

    docs = documents(sf_dir).select_columns(["doc_id", "text"])
    grid = cms_build_text(docs, depth=3, width=1024)

    def probe_only(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return _tokens_table(
            batch.filter(pa.array(ids % 199 == 0)), "text", "doc_id"
        ).select(["term"])

    probe = pa.concat_tables(
        docs.map_batches(
            probe_only, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    terms = np.unique(probe.column("term").to_pandas().to_numpy())
    return pa.table(
        {
            "term": pa.array(terms, pa.string()),
            "est": pa.array(cms_estimate(grid, terms)),
        }
    )


def q_customer_urgent_outer(sf_dir: str):
    """(c_custkey, c_mktsegment, n_urgent, max_urgent_price) — LEFT
    OUTER join of every customer against per-customer URGENT-order
    aggregates (203 customers have none at sf0.01 and 0-fill).  The
    order side is pre-aggregated BEFORE the join (combine-first, then
    a key-sized shuffle); COUNT and MAX are order-insensitive so the
    SQL twin replays bitwise."""
    from igraph_ray.stages.join import hash_join

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice", "o_orderpriority"],
    ).filter(expr="o_orderpriority == '1-URGENT'")
    agg = orders.groupby("o_custkey").aggregate(
        Count("o_custkey", alias_name="n_urgent"),
        Max("o_totalprice", alias_name="max_urgent_price"),
    )
    j = hash_join(cust, agg, on="c_custkey", right_on="o_custkey",
                  how="left_outer")

    def fill(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": batch.column("c_custkey"),
                "c_mktsegment": batch.column("c_mktsegment"),
                "n_urgent": pc.fill_null(
                    batch.column("n_urgent"), pa.scalar(0, pa.int64())
                ),
                "max_urgent_price": pc.fill_null(
                    batch.column("max_urgent_price"),
                    pa.scalar(0.0, pa.float64()),
                ),
            }
        )

    return j.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)


def q_nation_wealth_full_outer(sf_dir: str):
    """(nationkey, n_rich_cust, n_rich_supp) — FULL OUTER join of
    nations having customers with acctbal > 9900 against nations
    having suppliers with acctbal > 8000 (both exclusive sides are
    non-empty at sf0.01: 8 cust-only + 7 supp-only + 5 both).  Exact
    integer counts, 0-filled — bitwise SQL twin."""
    from igraph_ray.stages.join import hash_join

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    ).filter(expr="c_acctbal > 9900")
    supp = ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey", "s_acctbal"],
    ).filter(expr="s_acctbal > 8000")
    rc = cust.groupby("c_nationkey").aggregate(
        Count("c_custkey", alias_name="n_rich_cust")
    )
    rs = supp.groupby("s_nationkey").aggregate(
        Count("s_suppkey", alias_name="n_rich_supp")
    )
    j = hash_join(rc, rs, on="c_nationkey", right_on="s_nationkey",
                  how="full_outer")

    def fill(batch: pa.Table) -> pa.Table:
        # Ray's full-outer coalesces the key into the left key column
        return pa.table(
            {
                "nationkey": batch.column("c_nationkey"),
                "n_rich_cust": pc.fill_null(
                    batch.column("n_rich_cust"), pa.scalar(0, pa.int64())
                ),
                "n_rich_supp": pc.fill_null(
                    batch.column("n_rich_supp"), pa.scalar(0, pa.int64())
                ),
            }
        )

    return j.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)


def q_resource_allocation(sf_dir: str):
    """(src_key, dst_key, resource_allocation) per E1∪E2 edge —
    resource-allocation link-prediction index
    (nx.resource_allocation_index); rows-only (float 1/deg sums are
    summation-order-dependent), pytest oracle in tests/test_metrics.py
    (kernels/metrics.py::resource_allocation_edges)."""
    from igraph_ray.kernels.metrics import resource_allocation_edges

    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices).select_columns(["src", "dst"])
    out = resource_allocation_edges(edges)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(tbl, vtbl, {"src": "src_key", "dst": "dst_key"})


def q_pref_attachment(sf_dir: str):
    """(src_key, dst_key, deg_src, deg_dst, pref_attachment) per E1∪E2
    edge — preferential-attachment link-prediction score deg(u)·deg(v)
    (nx.preferential_attachment).  Exact int64 products — bitwise SQL
    twin (degrees broadcast onto the edge table,
    kernels/metrics.py::attach_degrees)."""
    from igraph_ray.kernels.metrics import _degree_map, attach_degrees

    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices).select_columns(["src", "dst"])
    degs = _degree_map(edges).materialize()
    wd = attach_degrees(edges, degs)

    def finish(batch: pa.Table) -> pa.Table:
        ds_ = batch.column("deg_src").to_numpy(zero_copy_only=False)
        dd = batch.column("deg_dst").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": batch.column("src"),
                "dst": batch.column("dst"),
                "deg_src": pa.array(ds_.astype(np.int64)),
                "deg_dst": pa.array(dd.astype(np.int64)),
                "pref_attachment": pa.array(
                    ds_.astype(np.int64) * dd.astype(np.int64)
                ),
            }
        )

    tbl = pa.concat_tables(
        wd.map_batches(
            finish, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(tbl, vtbl, {"src": "src_key", "dst": "dst_key"})


def q_approx_price_quantiles(sf_dir: str):
    """(q, est) — DDSketch approximate quantiles of l_extendedprice
    cents (alpha=0.005 relative-error guarantee, one streaming pass,
    bucket-additive partials; stages/sketch.py::ddsketch_build).
    Bitwise SQL twin (deterministic libm bucket map, integer counts,
    one IEEE estimate chain); estimates are within 0.5% of the exact
    quantiles the `price_quantiles` query computes (accuracy
    property-tested in tests/test_sketch.py)."""
    from igraph_ray.stages.sketch import ddsketch_build, ddsketch_quantiles

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
    )

    def cents(batch: pa.Table) -> pa.Table:
        v = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        return pa.table(
            {"c": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64))}
        )

    li = li.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    sk = ddsketch_build(li, "c", alpha=0.005)
    est = ddsketch_quantiles(sk, PRICE_QS)
    return pa.table(
        {
            "q": pa.array(np.asarray(PRICE_QS, np.float64)),
            "est": pa.array(est),
        }
    )


def q_rewired_degree_hist(sf_dir: str):
    """(degree, n_vertices) — degree histogram of the E1∪E2 graph
    AFTER 2 rounds of deterministic degree-preserving rewiring
    (stages/rewire.py::rewire_edges, igraph_rewire /
    nx.double_edge_swap semantics).  Rewiring preserves every vertex
    degree exactly, so the SQL twin recomputes the ORIGINAL graph's
    histogram — a bitwise invariance check.  Simplicity/determinism
    are property-tested in tests/test_rewire.py."""
    from igraph_ray.stages.rewire import rewire_edges

    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices).select_columns(["src", "dst"])

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.minimum(s, d)),
                "dst": pa.array(np.maximum(s, d)),
            }
        )

    edges = edges.map_batches(
        canon, batch_format="pyarrow", zero_copy_batch=True
    )
    rewired = rewire_edges(edges, rounds=2, seed=7)

    def endpoints(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": pa.concat_arrays(
                    [
                        batch.column("src").combine_chunks(),
                        batch.column("dst").combine_chunks(),
                    ]
                )
            }
        )

    deg = (
        rewired.map_batches(
            endpoints, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("vid")
        .aggregate(Count("vid", alias_name="degree"))
    )
    return deg.groupby("degree").aggregate(
        Count("degree", alias_name="n_vertices")
    )


# ---------------------------------------------------------------------------
# edit-distance similarity self-join (fuzzy string dedup / entity
# resolution; igraph has no counterpart — dedup-family operator)
# ---------------------------------------------------------------------------
def q_edit_distance_pairs(sf_dir: str):
    """(name_a, name_b, dist) — every unordered pair of DISTINCT part
    names within Levenshtein distance 2 (functions/fuzzy.py: prefix-
    filtered q-gram inverted index + vectorized Myers bit-parallel
    verify).  Distances are exact integers and names exact strings, so
    the DuckDB ``levenshtein`` twin matches bitwise."""
    from igraph_ray.functions.fuzzy import edit_distance_pairs

    parts = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_name"]
    )
    out = edit_distance_pairs(parts, "p_name", k=2, q=2)
    return pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )


# ---------------------------------------------------------------------------
# Voronoi cells (igraph_voronoi): nearest-generator assignment
# ---------------------------------------------------------------------------
def q_voronoi_cells(sf_dir: str, graph_dir: str | None = None):
    """(key, dist, cell) over the E1∪E2 key graph — every vertex
    assigned to the nearest of the 3 lexicographically-smallest keys
    (kernels/voronoi.py lexicographic (dist, seed) min-plus; vids are
    dense sorted key ranks so the min-vid tie-break IS the min-key
    tie-break).  Hop distances are exact integers; unreachable rows
    carry dist = -1 / cell = '' — bitwise vs the recursive-CTE twin."""
    import tempfile

    from igraph_ray.kernels.voronoi import voronoi_cells
    from igraph_ray.api import state_to_table

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_vor_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    seeds = vtbl.column("vid").to_numpy(zero_copy_only=False)[:3]
    run = voronoi_cells(graph, seeds)
    tbl = state_to_table(run.state, ["vid", "dist", "cell"])
    keys = vtbl.column("key").combine_chunks()
    dist = tbl.column("dist").to_numpy(zero_copy_only=False)
    cell = tbl.column("cell").to_numpy(zero_copy_only=False)
    reach = np.isfinite(dist)
    cell_key = pc.if_else(
        pa.array(reach),
        pc.take(keys, pa.array(np.where(reach, cell, 0))),
        pa.scalar("", pa.string()),
    )
    return pa.table(
        {
            "key": pc.take(keys, tbl.column("vid")),
            "dist": pa.array(
                np.where(reach, dist, -1.0).astype(np.int64)
            ),
            "cell": cell_key,
        }
    )


# ---------------------------------------------------------------------------
# URL / domain extraction stats (web-pipeline provenance analysis)
# ---------------------------------------------------------------------------
def q_domain_stats(sf_dir: str):
    """(domain, n_urls, n_docs) — the testdata text has no URLs, so
    both engines append identical deterministic URL tokens (one per
    doc, a second on every 3rd doc) and then EXTRACT them back with
    the real tokenize→match→host-capture pipeline
    (functions/text.py::extract_urls/domain_stats).  Exact int counts
    — bitwise vs the unnest/regexp SQL twin."""
    from igraph_ray.functions.text import domain_stats, extract_urls

    def with_urls(batch: pa.Table) -> pa.Table:
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        site = np.char.mod("site%d.example.org", doc_id % 23)
        page = np.char.mod("%d", doc_id % 101)
        extra = np.where(
            doc_id % 3 == 0,
            np.char.mod(" http://mirror%d.example.net/x", doc_id % 7),
            "",
        )
        text = batch.column("text").to_numpy(zero_copy_only=False)
        t = (
            np.char.add(
                np.char.add(
                    np.char.add(
                        np.char.add(text.astype(str), " see https://"),
                        site,
                    ),
                    "/p/",
                ),
                np.char.add(page, extra),
            )
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text": pa.array(t, pa.string()),
            }
        )

    docs = documents(sf_dir).map_batches(
        with_urls, batch_format="pyarrow", zero_copy_batch=True
    )
    out = domain_stats(extract_urls(docs))
    return pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )


# ---------------------------------------------------------------------------
# weighted s-core (generalized core; Eidsaa-Almaas s-core decomposition)
# ---------------------------------------------------------------------------
def q_s_core(sf_dir: str, graph_dir: str | None = None):
    """(vertex, core) — weighted coreness of a deterministic
    heterogeneous weighted graph over the doc-id classes (i → (2i+1),
    (3i+7) mod 101 with weights i%5+1 / i%7+1, canonical dedup-sum;
    7 distinct core levels at sf0.01).  kernels/kcore.py::
    s_core_numbers (distributed weighted h-index fixed point);
    integer edge weights make the float64 cores exact integers, so the
    unrolled-peeling SQL twin matches bitwise."""
    import tempfile

    from igraph_ray.api import build_graph, state_to_table
    from igraph_ray.kernels.kcore import s_core_numbers

    def classes(batch: pa.Table) -> pa.Table:
        i = batch.column("doc_id").to_numpy(zero_copy_only=False) % 101
        return pa.table({"i": pa.array(i.astype(np.int64))})

    cls = (
        documents(sf_dir)
        .map_batches(classes, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("i")
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )

    def derive_edges(batch: pa.Table) -> pa.Table:
        i = batch.column("i").to_numpy(zero_copy_only=False)
        j1 = (2 * i + 1) % 101
        w1 = (i % 5 + 1).astype(np.float64)
        j2 = (3 * i + 7) % 101
        w2 = (i % 7 + 1).astype(np.float64)
        s = np.concatenate([i, i])
        d = np.concatenate([j1, j2])
        w = np.concatenate([w1, w2])
        keep = s != d
        s, d, w = s[keep], d[keep], w[keep]
        return pa.table(
            {
                "src": pa.array(np.minimum(s, d)),
                "dst": pa.array(np.maximum(s, d)),
                "weight": pa.array(w),
            }
        )

    edges = (
        cls.map_batches(
            derive_edges, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["src", "dst"])
        .aggregate(Sum("weight", alias_name="weight"))
    )
    vertices = cls.rename_columns({"i": "vid"})
    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_score_")
    graph = build_graph(
        edges, graph_dir, symmetrize=True, vertices=vertices
    )
    run = s_core_numbers(graph)
    tbl = state_to_table(run.state, ["vid", "core"])
    return pa.table(
        {"vertex": tbl.column("vid"), "core": tbl.column("core")}
    )


# ---------------------------------------------------------------------------
# Steiner tree (igraph_steiner_tree / nx approximation.steiner_tree)
# ---------------------------------------------------------------------------
def q_steiner_tree(sf_dir: str, graph_dir: str | None = None):
    """(src_key, dst_key, weight) — Mehlhorn 2-approximate Steiner tree
    over the E1∪E2 key graph connecting the 6 lexicographically
    smallest keys (kernels/steiner.py; vids are dense sorted key ranks
    so min-vid tie-breaks ARE min-key tie-breaks, and every stage
    breaks ties deterministically).  Rows-only: Mehlhorn's Voronoi/
    quotient/MST composition is not SQL-expressible; the pytest suite
    (tests/test_steiner.py) pins exactness on trees, the 2·(1−1/ℓ)
    bound vs brute-force OPT, and structural validity + determinism."""
    import tempfile

    from igraph_ray.kernels.steiner import steiner_tree

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_steiner_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    # identical symmetrized weighted edge table to the one the cached
    # graph was built from (weights must replay the CSR bit-for-bit)
    pairs = _link_graph_edges(sf_dir)
    vertices = ray.data.from_arrow(vtbl)
    edges = symmetrize_dedup(attach_vids(pairs, vertices))
    terms = vtbl.column("vid").to_numpy(zero_copy_only=False)[:6]
    out = steiner_tree(graph, edges, terms)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    tbl = _vid_to_key(tbl, vtbl, {"src": "src_key", "dst": "dst_key"})
    return tbl.sort_by(
        [("src_key", "ascending"), ("dst_key", "ascending")]
    )


# ---------------------------------------------------------------------------
# Stochastic block model generator (igraph sbm_game)
# ---------------------------------------------------------------------------
SBM_SEED = 17
SBM_P = [[0.32, 0.04, 0.02], [0.04, 0.28, 0.03], [0.02, 0.03, 0.24]]


def q_generated_sbm(sf_dir: str):
    """(src, dst) — FULL edge list of a deterministic stochastic block
    model (igraph ``sbm_game``; n = n_docs vertices in 3 contiguous
    blocks of sizes [n−2·⌊n/3⌋, ⌊n/3⌋, ⌊n/3⌋], symmetric pref matrix
    SBM_P).  Per-pair keep decision = splitmix64(pair_index ⊕ C) >> 11
    < ⌊p·2⁵³⌋ — stateless, one communication-free map over the pair
    domain (sources/generators.py::sbm_edges).  The SQL twin replays
    the identical splitmix draws in HUGEINT, so the edge set matches
    hash-exact."""
    from igraph_ray.sources.generators import sbm_edges

    n = documents(sf_dir).count()
    k = n // 3
    return sbm_edges([n - 2 * k, k, k], SBM_P, seed=SBM_SEED)


# ---------------------------------------------------------------------------
# Encoding-quality / mojibake stats (ftfy-style curation signal)
# ---------------------------------------------------------------------------
def q_mojibake_stats(sf_dir: str):
    """(doc_id, n_mojibake, n_replacement, is_clean) — the testdata
    text is clean, so both engines inject identical deterministic
    artifacts (a cp1252 double-decode token on every 4th doc, U+FFFD +
    curly-quote mojibake on every 9th) and then DETECT them with the
    real vectorized literal-table scan
    (functions/text.py::mojibake_stats).  Exact int counts — bitwise
    vs the length/replace SQL twin."""
    from igraph_ray.functions.text import (
        MOJIBAKE_LITERALS,
        REPLACEMENT_CHAR,
        mojibake_stats,
    )

    inj4 = " caf" + MOJIBAKE_LITERALS[0]
    inj9 = " lost" + REPLACEMENT_CHAR + " q" + MOJIBAKE_LITERALS[6]

    def inject(batch: pa.Table) -> pa.Table:
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        text = batch.column("text").to_numpy(zero_copy_only=False).astype(str)
        t = np.char.add(text, np.where(doc_id % 4 == 0, inj4, ""))
        t = np.char.add(t, np.where(doc_id % 9 == 0, inj9, ""))
        return pa.table({"doc_id": pa.array(doc_id), "text": pa.array(t)})

    docs = documents(sf_dir).select_columns(["doc_id", "text"]).map_batches(
        inject, batch_format="pyarrow", zero_copy_batch=True
    )
    return mojibake_stats(docs)


# ---------------------------------------------------------------------------
# Grouped exact quantiles (per-group quantile_disc without sort)
# ---------------------------------------------------------------------------
def q_priority_price_quantiles(sf_dir: str):
    """(o_orderpriority, q, value) — exact per-priority discrete
    quantiles of o_totalprice in integer cents
    (stages/quantile.py::grouped_quantiles_int: one (group, value)
    count shuffle + vectorized per-group selection, NO sort of the
    data).  Rank semantics = DuckDB quantile_disc, so the twin
    hash-compares exactly."""
    from igraph_ray.stages.quantile import grouped_quantiles_int

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_totalprice"],
    )

    def cents(batch: pa.Table) -> pa.Table:
        v = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderpriority": batch.column("o_orderpriority"),
                "c": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64)),
            }
        )

    orders = orders.map_batches(
        cents, batch_format="pyarrow", zero_copy_batch=True
    )
    return grouped_quantiles_int(orders, "o_orderpriority", "c", PRICE_QS)


# ---------------------------------------------------------------------------
# Harmonic-function semi-supervised node classification
# ---------------------------------------------------------------------------
def q_node_classification(sf_dir: str, graph_dir: str | None = None):
    """(key, label) — harmonic-function label propagation (Zhu et al.
    2003; nx node_classification.harmonic_function semantics) over the
    E1∪E2 key graph: seeds are the lexicographically smallest key of
    each of the first 4 repos, labeled with their repo id; every key
    takes argmax of the 30-iteration diffusion.  Rows-only (float
    fixed point); the dense-replay pytest oracle is
    tests/test_node_classification.py."""
    import tempfile

    from igraph_ray.kernels.node_classification import (
        harmonic_function_labels,
    )

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_nodecls_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    keys = np.asarray(vtbl.column("key").to_pylist())
    repos = np.asarray([k.split(":", 1)[0] for k in keys])
    seed_vids, seed_labels = [], []
    for r in sorted(set(repos))[:4]:
        pos = int(np.flatnonzero(repos == r)[0])  # keys sorted => min key
        seed_vids.append(int(vtbl.column("vid")[pos].as_py()))
        seed_labels.append(r)
    out = harmonic_function_labels(graph, seed_vids, seed_labels)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    return _vid_to_key(tbl, vtbl, {"vid": "key"}).sort_by("key")


# ---------------------------------------------------------------------------
# All-pairs tf-idf cosine similarity (APSS)
# ---------------------------------------------------------------------------
def q_tfidf_cosine_pairs(sf_dir: str):
    """(doc_a, doc_b) — document pairs whose smooth tf-idf cosine
    (sklearn idf convention, df <= 64 vocabulary) is >= 0.5; exact
    APSS via the Bayardo-style inverted index
    (functions/sparse_sim.py::tfidf_cosine_pairs).  Pair set is
    integer-exact so the DuckDB twin hash-matches (no oracle pair sits
    near the float threshold; verified margin > 1e-3 at sf0.01)."""
    from igraph_ray.functions.sparse_sim import tfidf_cosine_pairs

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = tfidf_cosine_pairs(docs, threshold=0.5, df_cap=64)
    return out.select_columns(["doc_a", "doc_b"]).sort(
        ["doc_a", "doc_b"]
    )


# ---------------------------------------------------------------------------
# Structural holes family: local bridges, effective size, s-metric
# ---------------------------------------------------------------------------
def q_local_bridges(sf_dir: str):
    """(src_key, dst_key) — the E1∪E2 edges that are local bridges
    (endpoints share no common neighbour; nx.local_bridges
    with_span=False).  Integer-exact membership — bitwise SQL twin
    (NOT EXISTS wedge)."""
    from igraph_ray.kernels.metrics import local_bridges

    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices).select_columns(["src", "dst"])
    out = local_bridges(edges)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(
        tbl, vtbl, {"src": "src_key", "dst": "dst_key"}
    ).sort_by([("src_key", "ascending"), ("dst_key", "ascending")])


def q_effective_size(sf_dir: str):
    """(key, degree, ties2, effective_size) per E1∪E2 vertex — Burt's
    effective size under the unweighted Borgatti formula
    e(v) = deg(v) − ties2(v)/deg(v) (nx.effective_size).  degree and
    ties2 are exact ints; the one division+subtraction is IEEE-stable,
    so the SQL twin hash-matches bitwise."""
    from igraph_ray.kernels.metrics import effective_size

    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices).select_columns(["src", "dst"])
    out = effective_size(edges)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(tbl, vtbl, {"key": "key"}).sort_by("key")


def q_s_metric(sf_dir: str):
    """One row (s_metric) — Σ deg(u)·deg(v) over the E1∪E2 edge set
    (nx.s_metric numerator; Li et al. 2005).  Python-int partial sums
    (int64 products overflow at 10^12-edge scale), exact BIGINT twin."""
    from igraph_ray.kernels.metrics import s_metric

    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices).select_columns(["src", "dst"])
    return pa.table(
        {"s_metric": pa.array([s_metric(edges)], pa.int64())}
    )


# ---------------------------------------------------------------------------
# Onion decomposition
# ---------------------------------------------------------------------------
def q_onion_layers(sf_dir: str, graph_dir: str | None = None):
    """(key, layer) — onion decomposition of the E1∪E2 graph
    (nx.onion_layers parity; Hébert-Dufresne et al. 2016).  Integer
    layers — bitwise SQL twin by unrolled monotone-threshold peeling."""
    import tempfile

    from igraph_ray.kernels.onion import onion_layers

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_onion_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    run = onion_layers(graph)
    state = pa.concat_tables(
        run.state.select_columns(["vid", "layer"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    return _vid_to_key(state, vtbl, {"vid": "key"}).sort_by("key")


# ---------------------------------------------------------------------------
# K-clique percolation communities
# ---------------------------------------------------------------------------
def q_k_clique_communities(sf_dir: str, graph_dir: str | None = None):
    """(key, community) — overlapping 3-clique percolation communities
    of the E1∪E2 graph (Palla et al. 2005;
    nx.community.k_clique_communities parity via the pytest oracle in
    tests/test_clique_percolation.py).  Rows-only: community labels
    are internal clique ids (deterministic but not SQL-replayable
    without unrolling the clique enumeration)."""
    import tempfile

    from igraph_ray.kernels.clique_percolation import k_clique_communities

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_cpm_")
    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices).select_columns(["src", "dst"])
    out = k_clique_communities(edges, 3, graph_dir)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(tbl, vtbl, {"vid": "key"}).sort_by(
        [("community", "ascending"), ("key", "ascending")]
    )


# ---------------------------------------------------------------------------
# Spanning-tree count (Kirchhoff matrix-tree theorem)
# ---------------------------------------------------------------------------
def q_spanning_tree_count(sf_dir: str, graph_dir: str | None = None):
    """One row (n_vertices, n_edges, spanning_trees) — the EXACT
    number of spanning trees of the largest connected component of
    the E1∪E2 key graph (Kirchhoff matrix-tree cofactor; Bareiss
    big-int elimination — closed-form + brute-force enumeration
    oracles in tests/test_spanning_count.py; networkx's own
    number_of_spanning_trees needs scipy, absent here).  The count
    can exceed int64 astronomically (K_n alone has n^(n-2) trees), so
    it is returned as a decimal STRING — exact and deterministic, but
    rows-only (no SQL determinant)."""
    import tempfile

    from igraph_ray.kernels.spanning import spanning_tree_count

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_stc_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    run = connected_components(graph)
    state = pa.concat_tables(
        run.state.select_columns(["vid", "comp"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    comps = state.column("comp").to_numpy(zero_copy_only=False)
    vids = state.column("vid").to_numpy(zero_copy_only=False)
    if len(comps) == 0:
        return pa.table(
            {
                "n_vertices": pa.array([0], pa.int64()),
                "n_edges": pa.array([0], pa.int64()),
                "spanning_trees": pa.array(["0"], pa.string()),
            }
        )
    labels, counts = np.unique(comps, return_counts=True)
    lcc = int(labels[np.argmax(counts)])
    mem = np.sort(vids[comps == lcc])

    pairs = _link_graph_edges_cached(sf_dir)
    vertices_ds = ray.data.from_arrow(vtbl)
    edges = attach_vids(pairs, vertices_ds).select_columns(["src", "dst"])

    def in_lcc(batch: pa.Table, _mem=mem) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(_mem, s)
        pos[pos >= len(_mem)] = 0
        keep = _mem[pos] == s
        return batch.filter(pa.array(keep))

    sub = edges.map_batches(
        in_lcc, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_e = sub.count()
    count = spanning_tree_count(sub)
    return pa.table(
        {
            "n_vertices": pa.array([len(mem)], pa.int64()),
            "n_edges": pa.array([int(n_e)], pa.int64()),
            "spanning_trees": pa.array([str(count)], pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# Bipartite projection (igraph bipartite_projection multiplicity)
# ---------------------------------------------------------------------------
def q_bipartite_projection(sf_dir: str):
    """(src_key, dst_key, weight) — repo-mode projection of the
    repo↔path bipartite incidence derived from the files table: two
    repos link iff some path exists in both, weight = number of
    distinct shared paths (igraph ``bipartite_projection`` with
    ``multiplicity`` / nx ``weighted_projected_graph``).  Exact-int
    weights — bitwise SQL twin (distinct-incidence self-join)."""
    from igraph_ray.stages.graph_ops import bipartite_projection

    files = files_from_documents(sf_dir).select_columns(["repo", "path"])
    out = bipartite_projection(files, u_col="repo", v_col="path", onto="u")
    return out.sort(["src_key", "dst_key"])


# ---------------------------------------------------------------------------
# Independent-cascade influence spread (deterministic live-edge form)
# ---------------------------------------------------------------------------
def q_independent_cascade(sf_dir: str, graph_dir: str | None = None):
    """(key, round) — deterministic independent-cascade spread over the
    distinct directed doc-derived arcs (loops dropped) from the 3
    lexicographically smallest keys, per-arc coin
    splitmix64(src_vid·2^20 + dst_vid) % 1000 < 500.  KKT live-edge
    equivalence makes the spread = BFS rounds over the kept arcs, so
    both the coin and the rounds replay exactly in SQL (recursive
    CTE) — hash MATCH."""
    import tempfile

    from igraph_ray.kernels.cascade import independent_cascade

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_ic_")

    def derive(batch: pa.Table) -> pa.Table:
        # two out-arc families per vertex class (37 and 58 are units
        # mod 101) so the live-edge subgraph actually branches
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        s = doc_id % 101
        d1 = (s * 37 + 11) % 101
        d2 = (s * 58 + 7) % 101
        ss = np.concatenate([s, s])
        dd = np.concatenate([d1, d2])
        keep = ss != dd
        return pa.table(
            {
                "src_key": pa.array(
                    [f"v{i}" for i in ss[keep]], pa.string()
                ),
                "dst_key": pa.array(
                    [f"v{i}" for i in dd[keep]], pa.string()
                ),
            }
        )

    arcs = documents(sf_dir).map_batches(
        derive, batch_format="pyarrow", zero_copy_batch=True
    )

    def add_weight(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "weight", pa.array(np.ones(batch.num_rows))
        )

    distinct = (
        arcs.groupby(["src_key", "dst_key"])
        .count()
        .select_columns(["src_key", "dst_key"])
        .map_batches(add_weight, batch_format="pyarrow", zero_copy_batch=True)
    )
    keys = (
        distinct.select_columns(["src_key"])
        .rename_columns({"src_key": "key"})
        .union(
            distinct.select_columns(["dst_key"]).rename_columns(
                {"dst_key": "key"}
            )
        )
        .groupby("key")
        .count()
        .select_columns(["key"])
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(distinct, vertices)
    out = pa.concat_tables(
        independent_cascade(
            edges, graph_dir, seeds=[0, 1, 2], p_milli=500,
            vertices=vertices.select_columns(["vid"]),
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(out, vtbl, {"vid": "key"}).sort_by("key")


def q_chunk_text(sf_dir: str):
    """(doc_id, chunk_idx, chunk_text, n_words) — RAG-style overlapping
    word windows (32 words, stride 24).  String-exact — bitwise SQL
    twin (list_filter split + slice + array_to_string replay)."""
    from igraph_ray.functions.text import chunk_text

    docs = documents(sf_dir).select_columns(["doc_id", "text"])
    return chunk_text(docs, chunk_words=32, stride=24).sort(
        ["doc_id", "chunk_idx"]
    )


def q_user_favorite_event(sf_dir: str):
    """(user_id, mode, n) — each user's most frequent event type
    (ties → smallest type).  Exact ints — bitwise SQL twin."""
    from igraph_ray.stages.stats import grouped_mode

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    return grouped_mode(ev, "user_id", "event_type").sort("user_id")


def q_qty_price_corr(sf_dir: str):
    """(l_returnflag, n, corr) — Pearson correlation between quantity
    and extended price per return flag, computed from exact integer
    sufficient statistics (quantity integral, price exact cents);
    final r is one fixed IEEE chain — bitwise SQL twin."""
    from igraph_ray.stages.stats import grouped_pearson

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    return grouped_pearson(
        li, "l_returnflag", "l_quantity", "l_extendedprice",
        x_decimals=0, y_decimals=2,
    ).sort("l_returnflag")


def q_square_clustering(sf_dir: str):
    """(key, squares) per E1∪E2 vertex — nx.square_clustering (4-cycle
    clustering coefficient).  Per-vertex numerator/denominator are
    exact integers; the single final division makes the SQL twin
    bitwise."""
    from igraph_ray.kernels.cliques import square_clustering

    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices).select_columns(["src", "dst"])
    out = pa.concat_tables(
        square_clustering(
            edges, vertices=vertices.select_columns(["vid"])
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(out, vtbl, {"vid": "key"}).sort_by("key")


def q_trophic_levels(sf_dir: str, graph_dir: str | None = None):
    """(key, level) — Levine trophic levels over a two-family
    doc-derived DAG (arcs low→high index, in-degree up to 2 so levels
    go fractional).  Rows-only: the fixed point is float; parity is
    pinned by the dense (I−P)s=1 oracle in tests/test_trophic.py."""
    import tempfile

    from igraph_ray.kernels.trophic import trophic_levels

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_troph_")

    def derive(batch: pa.Table) -> pa.Table:
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        s = doc_id % 101
        d1 = (s * 37 + 11) % 101
        d2 = (s * 58 + 7) % 101
        ss = np.concatenate([s, s])
        dd = np.concatenate([d1, d2])
        keep = ss < dd
        return pa.table(
            {
                "src_key": pa.array([f"v{i}" for i in ss[keep]], pa.string()),
                "dst_key": pa.array([f"v{i}" for i in dd[keep]], pa.string()),
                "weight": pa.array(np.ones(int(keep.sum()))),
            }
        )

    arcs = (
        documents(sf_dir)
        .map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src_key", "dst_key"])
        .aggregate(Max("weight", alias_name="weight"))
    )
    keys = (
        arcs.select_columns(["src_key"])
        .rename_columns({"src_key": "key"})
        .union(
            arcs.select_columns(["dst_key"]).rename_columns(
                {"dst_key": "key"}
            )
        )
        .groupby("key")
        .count()
        .select_columns(["key"])
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    n = vertices.count()
    edges = attach_vids(arcs, vertices)
    graph = build_graph(
        edges, graph_dir,
        vertices=vertices.select_columns(["vid"]),
        symmetrize=False,
    )
    out = pa.concat_tables(
        trophic_levels(graph, n).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(out, vtbl, {"vid": "key"}).sort_by("key")


def q_node2vec_walks(sf_dir: str, graph_dir: str | None = None):
    """(walk_id, p0..p8) — deterministic node2vec (p=0.5, q=2.0)
    second-order walk corpus from every key of the E1∪E2 graph.
    Bitwise SQL twin: uniform step-1 rank pick + unrolled
    Efraimidis–Spirakis weighted picks (shared-libm ln, exact binary
    bias literals); pytest oracle replays the picks sequentially."""
    import tempfile

    from igraph_ray.kernels.walks import node2vec_walks

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_n2v_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    starts = vtbl.column("vid").to_numpy(zero_copy_only=False)
    out = node2vec_walks(graph, starts, length=8, p=0.5, q=2.0, seed=42)
    return pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("walk_id")


def q_local_efficiency(sf_dir: str):
    """One row (n_vertices, local_efficiency) over the E1∪E2 graph —
    nx.local_efficiency (mean neighbourhood global efficiency).
    Rows-only: float mean; parity pinned by the nx pytest oracle."""
    from igraph_ray.kernels.cliques import local_efficiency

    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    n = vertices.count()
    edges = attach_vids(pairs, vertices).select_columns(["src", "dst"])
    eff = local_efficiency(edges, n)
    return pa.table(
        {
            "n_vertices": pa.array([n], pa.int64()),
            "local_efficiency": pa.array([eff], pa.float64()),
        }
    )


def q_user_overlap_sketch(sf_dir: str):
    """One row (n_click, n_purchase, union, intersection) — HLL
    set-operation estimates of the click vs purchase user sets
    (register max = lossless union; inclusion–exclusion overlap).
    Bitwise SQL twin: integer-exact harmonic numerator + one IEEE
    chain (stages/sketch.py::_estimate); accuracy + determinism
    pinned in tests/test_sketch.py."""
    from igraph_ray.stages.sketch import hll_set_ops

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    out = hll_set_ops(ev, "event_type", "user_id", "click", "purchase")
    return pa.table(
        {
            "n_click": pa.array([out["n_a"]], pa.float64()),
            "n_purchase": pa.array([out["n_b"]], pa.float64()),
            "union_est": pa.array([out["union"]], pa.float64()),
            "intersection_est": pa.array(
                [out["intersection"]], pa.float64()
            ),
        }
    )


def q_zipf_term_fit(sf_dir: str):
    """One row (xmin, alpha, n_tail, ks) — CSN power-law (Zipf) fit of
    the corpus term-frequency distribution: term document frequencies
    → frequency-of-frequencies histogram → the same distributed MLE
    scan as the degree fit.  Rows-only: float MLE; the plfit kernel
    carries its own bitwise brute-force pytest oracle."""
    from igraph_ray.functions.text import term_document_frequency
    from igraph_ray.kernels.plfit import fit_power_law

    docs = documents(sf_dir).select_columns(["doc_id", "text"])
    df = term_document_frequency(docs)
    fit = fit_power_law(df, degree_col="df")
    return pa.table(
        {
            "xmin": pa.array([fit["xmin"]], pa.float64()),
            "alpha": pa.array([fit["alpha"]], pa.float64()),
            "n_tail": pa.array([int(fit["n_tail"])], pa.int64()),
            "ks": pa.array([fit["ks"]], pa.float64()),
        }
    )


def q_current_flow_closeness(sf_dir: str, graph_dir: str | None = None):
    """(key, cfc) — current-flow closeness (information centrality)
    over a 29-vertex doc-derived ring+chord graph (connected by the
    ring), all 29 Laplacian pseudo-inverse columns solved in ONE
    29-lane chassis CG run.  Rows-only: float solves; parity pinned by
    the dense-pinv oracle in tests/test_resistance.py."""
    import tempfile

    from igraph_ray.kernels.resistance import current_flow_closeness

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_cfc_")

    def derive(batch: pa.Table) -> pa.Table:
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        s = doc_id % 29
        ring = (s + 1) % 29
        chord = (s * 2 + 3) % 29
        ss = np.concatenate([s, s])
        dd = np.concatenate([ring, chord])
        keep = ss != dd
        return pa.table(
            {
                "src_key": pa.array([f"v{i}" for i in ss[keep]], pa.string()),
                "dst_key": pa.array([f"v{i}" for i in dd[keep]], pa.string()),
                "weight": pa.array(np.ones(int(keep.sum()))),
            }
        )

    arcs = (
        documents(sf_dir)
        .map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src_key", "dst_key"])
        .aggregate(Max("weight", alias_name="weight"))
    )
    keys = (
        arcs.select_columns(["src_key"])
        .rename_columns({"src_key": "key"})
        .union(
            arcs.select_columns(["dst_key"]).rename_columns(
                {"dst_key": "key"}
            )
        )
        .groupby("key")
        .count()
        .select_columns(["key"])
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    n = vertices.count()
    edges = attach_vids(arcs, vertices)
    graph = build_graph(
        edges, graph_dir,
        vertices=vertices.select_columns(["vid"]),
        symmetrize=True,
    )
    cfc = current_flow_closeness(graph, n, lanes=n, tol=1e-10)
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    keys_arr = vtbl.column("key").to_pylist()
    items = sorted((keys_arr[v], c) for v, c in cfc.items())
    return pa.table(
        {
            "key": pa.array([k for k, _ in items], pa.string()),
            "cfc": pa.array([c for _, c in items], pa.float64()),
        }
    )


def q_effective_resistance(sf_dir: str, graph_dir: str | None = None):
    """(src_key, dst_key, r_eff, commute_time) per edge of the same
    29-vertex ring+chord graph as current_flow_closeness — spanning-
    edge centrality weights (r_eff = Pr[edge ∈ uniform spanning tree])
    and commute times (2m·r_eff).  Rows-only: float solves; dense-pinv
    + Foster's-theorem oracles in tests/test_resistance.py."""
    import tempfile

    from igraph_ray.kernels.resistance import effective_resistance_edges

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_reff_")

    def derive(batch: pa.Table) -> pa.Table:
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        s = doc_id % 29
        ring = (s + 1) % 29
        chord = (s * 2 + 3) % 29
        ss = np.concatenate([s, s])
        dd = np.concatenate([ring, chord])
        keep = ss != dd
        return pa.table(
            {
                "src_key": pa.array([f"v{i}" for i in ss[keep]], pa.string()),
                "dst_key": pa.array([f"v{i}" for i in dd[keep]], pa.string()),
                "weight": pa.array(np.ones(int(keep.sum()))),
            }
        )

    arcs = (
        documents(sf_dir)
        .map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src_key", "dst_key"])
        .aggregate(Max("weight", alias_name="weight"))
    )
    keys = (
        arcs.select_columns(["src_key"])
        .rename_columns({"src_key": "key"})
        .union(
            arcs.select_columns(["dst_key"]).rename_columns(
                {"dst_key": "key"}
            )
        )
        .groupby("key")
        .count()
        .select_columns(["key"])
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    n = vertices.count()
    edges = attach_vids(arcs, vertices)
    graph = build_graph(
        edges, graph_dir,
        vertices=vertices.select_columns(["vid"]),
        symmetrize=True,
    )

    # canonical undirected edge list (a < b) from the symmetrized rule
    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.minimum(s, d)),
                "dst": pa.array(np.maximum(s, d)),
            }
        )

    und = (
        edges.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src", "dst"])
        .count()
        .select_columns(["src", "dst"])
    )
    n_edges = und.count()
    out = effective_resistance_edges(
        graph, n, und, num_edges=n_edges, lanes=n, tol=1e-10
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(
        out, vtbl, {"src": "src_key", "dst": "dst_key"}
    ).sort_by([("src_key", "ascending"), ("dst_key", "ascending")])


def q_path_assortativity(sf_dir: str):
    """One row (group, n, corr) — numeric attribute assortativity of
    the E1∪E2 graph with attribute = the key's path index (the number
    after ':p'): Pearson r of endpoint attributes over both arc
    orientations (nx numeric_assortativity_coefficient semantics,
    which equals Pearson over arcs).  Exact-int sufficient stats —
    bitwise SQL twin."""
    from igraph_ray.stages.stats import grouped_pearson

    pairs = _link_graph_edges_cached(sf_dir)

    def arcs_xy(batch: pa.Table) -> pa.Table:
        import re

        s = batch.column("src_key").to_pylist()
        d = batch.column("dst_key").to_pylist()

        def attr(k: str) -> int:
            return int(k.rsplit(":p", 1)[1])

        xs = np.array([attr(k) for k in s], np.float64)
        ys = np.array([attr(k) for k in d], np.float64)
        return pa.table(
            {
                "g": pa.array(["all"] * 2 * len(s), pa.string()),
                "x": pa.array(np.concatenate([xs, ys])),
                "y": pa.array(np.concatenate([ys, xs])),
            }
        )

    arcs = pairs.map_batches(
        arcs_xy, batch_format="pyarrow", zero_copy_batch=True
    )
    return grouped_pearson(
        arcs, "g", "x", "y", x_decimals=0, y_decimals=0
    ).rename_columns({"g": "group"})


def q_joint_degree_matrix(sf_dir: str):
    """(deg_u, deg_v, n_arcs) — joint degree distribution of the E1∪E2
    graph over both arc orientations (nx degree_mixing_dict /
    igraph degree-correlation surface).  Exact ints — bitwise SQL
    twin (degree join + GROUP BY)."""
    from igraph_ray.kernels.metrics import attach_degrees

    pairs = _link_graph_edges_cached(sf_dir)

    def both(batch: pa.Table) -> pa.Table:
        s = batch.column("src_key").to_pylist()
        d = batch.column("dst_key").to_pylist()
        return pa.table(
            {
                "src": pa.array(s + d, pa.string()),
                "dst": pa.array(d + s, pa.string()),
            }
        )

    arcs = pairs.map_batches(
        both, batch_format="pyarrow", zero_copy_batch=True
    )
    degrees = (
        arcs.select_columns(["src"])
        .rename_columns({"src": "key"})
        .groupby("key")
        .aggregate(Count("key", alias_name="degree"))
    )
    withdeg = attach_degrees(arcs, degrees, cols=("src", "dst"))
    return (
        withdeg.select_columns(["deg_src", "deg_dst"])
        .rename_columns({"deg_src": "deg_u", "deg_dst": "deg_v"})
        .groupby(["deg_u", "deg_v"])
        .aggregate(Count(alias_name="n_arcs"))
        .sort(["deg_u", "deg_v"])
    )


def q_qty_price_ols(sf_dir: str):
    """(l_returnflag, n, slope, intercept) — per-flag OLS of extended
    price on quantity from exact integer sufficient statistics;
    bitwise SQL twin (same fixed IEEE chain)."""
    from igraph_ray.stages.stats import grouped_ols

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    return grouped_ols(
        li, "l_returnflag", "l_quantity", "l_extendedprice",
        x_decimals=0, y_decimals=2,
    ).sort("l_returnflag")


def q_fingerprint_pairs(sf_dir: str):
    """(doc_a, doc_b, shared) — winnowing-fingerprint near-duplicate
    candidates (MOSS scheme) sharing ≥2 distinct fingerprints.
    Exact-int overlap counts — bitwise SQL twin (HUGEINT rolling-hash
    + window-min replay + self-join)."""
    from igraph_ray.functions.dedup import fingerprint_pairs

    docs = documents(sf_dir).select_columns(["doc_id", "text"])
    return fingerprint_pairs(docs, min_shared=2, df_cap=64).sort(
        ["doc_a", "doc_b"]
    )


def q_clustering_by_degree(sf_dir: str):
    """(degree, n_vertices, sum_triangles, avg_clustering) — the
    clustering–degree correlation c(k) of the E1∪E2 graph: all
    degree-k vertices share the denominator k(k−1)/2, so the class
    mean is the single exact-int division
    (2·Σ triangles) / (n_k · k · (k−1)) — bitwise SQL twin.  Classes
    with k < 2 report 0.0 (nx convention per vertex)."""
    from igraph_ray.kernels.triangles import (
        canonical_edges,
        triangle_counts,
        undirected_degrees,
    )

    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices)
    simple = canonical_edges(edges).materialize()
    tri = pa.concat_tables(
        triangle_counts(
            simple, vertices=vertices.select_columns(["vid"])
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("vid")
    deg = pa.concat_tables(
        undirected_degrees(simple).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    n = vertices.count()
    dfull = np.zeros(n, np.int64)
    dfull[deg.column("vid").to_numpy(zero_copy_only=False)] = deg.column(
        "degree"
    ).to_numpy(zero_copy_only=False)
    tfull = np.zeros(n, np.int64)
    tfull[tri.column("vid").to_numpy(zero_copy_only=False)] = tri.column(
        "triangles"
    ).to_numpy(zero_copy_only=False)
    ks = np.unique(dfull)
    rows = {"degree": [], "n_vertices": [], "sum_triangles": [], "avg_clustering": []}
    for k in ks.tolist():
        m = dfull == k
        nk = int(m.sum())
        st = int(tfull[m].sum())
        rows["degree"].append(k)
        rows["n_vertices"].append(nk)
        rows["sum_triangles"].append(st)
        rows["avg_clustering"].append(
            float(2 * st) / float(nk * k * (k - 1)) if k >= 2 else 0.0
        )
    return pa.table(
        {
            "degree": pa.array(rows["degree"], pa.int64()),
            "n_vertices": pa.array(rows["n_vertices"], pa.int64()),
            "sum_triangles": pa.array(rows["sum_triangles"], pa.int64()),
            "avg_clustering": pa.array(rows["avg_clustering"], pa.float64()),
        }
    )


def q_silhouette(sf_dir: str):
    """(label, n, mean_silhouette) per embedding cluster label plus the
    overall row (label = −1) — simplified (centroid) silhouette over
    the embeddings table.  Rows-only: float means; brute-replay pytest
    oracle with planted mislabels."""
    from igraph_ray.functions.similarity import simplified_silhouette

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"]
    )

    def widen(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "embedding": pc.cast(
                    batch.column("embedding"), pa.list_(pa.float64())
                ),
                "label": pc.cast(batch.column("label"), pa.int64()),
            }
        )

    return simplified_silhouette(
        emb.map_batches(widen, batch_format="pyarrow", zero_copy_batch=True)
    )


def q_bisection_conductance(sf_dir: str):
    """One row (cut, vol_even, vol_odd, conductance) — conductance of
    the deterministic vid-parity bisection of the E1∪E2 graph:
    φ = cut / min(vol) with cut = crossing edges and vol = Σ degree
    per side.  Exact ints + one IEEE division — bitwise SQL twin
    (ROW_NUMBER parity replay)."""
    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices).select_columns(["src", "dst"])

    def partial(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        cross = (s % 2) != (d % 2)
        # each edge adds 1 degree to both endpoints
        vol_even = int(np.sum(s % 2 == 0) + np.sum(d % 2 == 0))
        vol_odd = int(np.sum(s % 2 == 1) + np.sum(d % 2 == 1))
        return pa.table(
            {
                "cut": pa.array([int(cross.sum())], pa.int64()),
                "vol_even": pa.array([vol_even], pa.int64()),
                "vol_odd": pa.array([vol_odd], pa.int64()),
            }
        )

    rows = edges.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    cut = sum(r["cut"] for r in rows)
    ve = sum(r["vol_even"] for r in rows)
    vo = sum(r["vol_odd"] for r in rows)
    phi = float(cut) / float(min(ve, vo)) if min(ve, vo) > 0 else 0.0
    return pa.table(
        {
            "cut": pa.array([cut], pa.int64()),
            "vol_even": pa.array([ve], pa.int64()),
            "vol_odd": pa.array([vo], pa.int64()),
            "conductance": pa.array([phi], pa.float64()),
        }
    )


def q_cross_source_duplicates(sf_dir: str):
    """(source_a, source_b, n_shared) — exact-duplicate contamination
    matrix across corpus shards: distinct (content sha256, repo)
    incidence over the derived files table (whose every 10th doc
    carries one of 7 vendored contents, so real cross-repo sharing
    exists), per-sha repo pairs, pair counts.  Exact ints — bitwise
    SQL twin."""
    from igraph_ray.stages.graph_ops import bipartite_projection

    files = with_content_sha(
        files_from_documents(sf_dir).select_columns(["repo", "content"]),
        column="content",
    ).select_columns(["content_sha", "repo"])
    out = bipartite_projection(
        files, u_col="repo", v_col="content_sha", onto="u"
    )
    return out.rename_columns(
        {"src_key": "source_a", "dst_key": "source_b", "weight": "n_shared"}
    ).sort(["source_a", "source_b"])


def q_lexical_diversity(sf_dir: str):
    """(doc_id, n_tokens, n_types, ttr) — type-token ratio per doc
    (lowercased whitespace tokens).  Exact ints + one IEEE division —
    bitwise SQL twin."""
    docs = documents(sf_dir).select_columns(["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        from igraph_ray.functions.text import _tokens_table

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        toks = _tokens_table(batch, "text", "doc_id")  # (did, term)
        agg = toks.group_by("did").aggregate(
            [("term", "count"), ("term", "count_distinct")]
        )
        did = agg.column("did").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(np.sort(ids), did)
        # scatter into the batch's doc order (0 for token-free docs)
        order = np.argsort(ids)
        n_tok = np.zeros(len(ids), np.int64)
        n_typ = np.zeros(len(ids), np.int64)
        n_tok[order[pos]] = agg.column("term_count").to_numpy(
            zero_copy_only=False
        )
        n_typ[order[pos]] = agg.column(
            "term_count_distinct"
        ).to_numpy(zero_copy_only=False)
        ttr = np.where(n_tok > 0, n_typ / np.maximum(n_tok, 1), 0.0)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_tokens": pa.array(n_tok),
                "n_types": pa.array(n_typ),
                "ttr": pa.array(ttr.astype(np.float64)),
            }
        )

    return docs.map_batches(
        stats, batch_format="pyarrow", zero_copy_batch=True
    ).sort("doc_id")


def q_degree_gini(sf_dir: str):
    """One row (n, sum_deg, gini) — Gini coefficient of the E1∪E2
    degree sequence (isolated keys included at degree 0):
    G = (2·Σ i·d_(i) / (n·Σd)) − (n+1)/n over ascending-sorted
    degrees — exact-int B = Σ i·d_(i) from the distributed histogram,
    then a fixed IEEE chain.  Bitwise SQL twin."""
    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    n = vertices.count()
    edges = attach_vids(pairs, vertices).select_columns(["src", "dst"])

    def endpoints(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        return pa.table({"vid": pa.array(np.concatenate([s, d]))})

    hist = pa.concat_tables(
        edges.map_batches(
            endpoints, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("vid")
        .aggregate(Count("vid", alias_name="degree"))
        .select_columns(["degree"])
        .groupby("degree")
        .aggregate(Count("degree", alias_name="cnt"))
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    dvals = hist.column("degree").to_numpy(zero_copy_only=False)
    cnts = hist.column("cnt").to_numpy(zero_copy_only=False)
    n_iso = n - int(cnts.sum())
    dvals = np.concatenate([[0], dvals])
    cnts = np.concatenate([[n_iso], cnts])
    order = np.argsort(dvals)
    dvals, cnts = dvals[order], cnts[order]
    # ranks i = 1..n ascending; a degree class occupying ranks
    # (start+1 .. start+c) contributes d · Σ ranks = d·(c·start + c(c+1)/2)
    starts = np.cumsum(cnts) - cnts
    B = int(
        sum(
            int(d) * (int(c) * int(s0) + int(c) * (int(c) + 1) // 2)
            for d, c, s0 in zip(dvals.tolist(), cnts.tolist(), starts.tolist())
        )
    )
    sum_deg = int(np.sum(dvals * cnts))
    if n > 0 and sum_deg > 0:
        gini = (2.0 * float(B)) / (float(n) * float(sum_deg)) - (
            float(n) + 1.0
        ) / float(n)
    else:
        gini = 0.0
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "sum_deg": pa.array([sum_deg], pa.int64()),
            "gini": pa.array([gini], pa.float64()),
        }
    )


def q_train_val_test_split(sf_dir: str):
    """(lang, split, n_docs) — deterministic hash-based 90/5/5
    train/val/test assignment of the documents corpus, counted per
    language.  Exact ints, splitmix64 replayed in SQL — bitwise."""
    from igraph_ray.stages.sample import hash_split

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    out = hash_split(docs, "doc_id", boundaries=(90, 95), denom=100)
    return (
        out.groupby(["lang", "split"])
        .aggregate(Count(alias_name="n_docs"))
        .sort(["lang", "split"])
    )


def q_event_gap_quantiles(sf_dir: str):
    """(event_type, q, value) — exact quantiles (DuckDB quantile_disc
    rank rule) of per-user inter-arrival gaps in microseconds, grouped
    by the later event's type.  One user-keyed shuffle for the gap
    computation + the sortless grouped-quantile selection — bitwise
    SQL twin (LAG + quantile_disc)."""
    from igraph_ray.stages.quantile import grouped_quantiles_int

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def to_us(batch: pa.Table) -> pa.Table:
        t = batch.column("ts").cast(pa.int64())
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "ts_us": t,
                "event_id": batch.column("event_id"),
                "event_type": batch.column("event_type"),
            }
        )

    def gaps(group: pa.Table) -> pa.Table:
        t = group.column("ts_us").to_numpy(zero_copy_only=False)
        eid = group.column("event_id").to_numpy(zero_copy_only=False)
        et = group.column("event_type").to_pylist()
        order = np.lexsort((eid, t))
        t = t[order]
        ets = [et[i] for i in order.tolist()]
        if len(t) < 2:
            return pa.table(
                {
                    "event_type": pa.array([], pa.string()),
                    "gap_us": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "event_type": pa.array(ets[1:], pa.string()),
                "gap_us": pa.array((t[1:] - t[:-1]).astype(np.int64)),
            }
        )

    g = (
        ev.map_batches(to_us, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .map_groups(gaps, batch_format="pyarrow")
    )
    return grouped_quantiles_int(
        g, "event_type", "gap_us", [0.25, 0.5, 0.9]
    ).sort(["event_type", "q"])


def q_rich_club_normalized(sf_dir: str):
    """(k, phi, phi_null, rho) — normalized rich-club coefficient
    (Colizza et al. 2006): observed φ(k) over the E1∪E2 graph divided
    by φ(k) of a degree-preserving deterministic rewiring (3 rounds,
    seed 7; degree sequence identical by construction, so the same k
    thresholds exist).  Rows-only: the ratio is float; both φ pieces
    carry their own exact oracles (rich_club bitwise twin, rewiring
    degree-invariance twin)."""
    from igraph_ray.kernels.metrics import rich_club
    from igraph_ray.stages.rewire import rewire_edges

    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices).select_columns(["src", "dst"])

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        keep = s != d
        return pa.table(
            {
                "src": pa.array(np.minimum(s, d)[keep]),
                "dst": pa.array(np.maximum(s, d)[keep]),
            }
        )

    simple = (
        edges.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src", "dst"])
        .count()
        .select_columns(["src", "dst"])
        .materialize()
    )
    obs = rich_club(simple)
    null = rich_club(rewire_edges(simple, rounds=3, seed=7))
    ko = obs.column("k").to_numpy(zero_copy_only=False)
    po = obs.column("phi").to_numpy(zero_copy_only=False)
    kn = null.column("k").to_numpy(zero_copy_only=False)
    pn = null.column("phi").to_numpy(zero_copy_only=False)
    null_map = dict(zip(kn.tolist(), pn.tolist()))
    rows = []
    for k, p in zip(ko.tolist(), po.tolist()):
        p0 = null_map.get(k, 0.0)
        rows.append((k, p, p0, p / p0 if p0 > 0 else 0.0))
    return pa.table(
        {
            "k": pa.array([r[0] for r in rows], pa.int64()),
            "phi": pa.array([r[1] for r in rows], pa.float64()),
            "phi_null": pa.array([r[2] for r in rows], pa.float64()),
            "rho": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


def q_orders_csv_agg(sf_dir: str):
    """(o_orderpriority, n, sum_cents) — S1 source-format coverage for
    CSV: orders are converted to exact integer cents, written as CSV
    (one scratch dump per sf dir under /tmp), read back with
    ray.data.read_csv, and aggregated.  Ints survive the CSV roundtrip
    bitwise, so the SQL twin over the original parquet hash-matches."""
    import os

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = f"/tmp/igr_csv_{tag}"
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        od = ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderpriority", "o_totalprice"],
        )

        def cents(batch: pa.Table) -> pa.Table:
            v = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "o_orderpriority": batch.column("o_orderpriority"),
                    "cents": pa.array(
                        np.floor(v * 100.0 + 0.5).astype(np.int64)
                    ),
                }
            )

        od.map_batches(
            cents, batch_format="pyarrow", zero_copy_batch=True
        ).write_csv(out)
        with open(marker, "w") as f:
            f.write("ok\n")
    back = ray.data.read_csv(
        [
            os.path.join(out, f)
            for f in sorted(os.listdir(out))
            if f.endswith(".csv")
        ]
    )
    return (
        back.groupby("o_orderpriority")
        .aggregate(Count(alias_name="n"), Sum("cents", alias_name="sum_cents"))
        .sort("o_orderpriority")
    )


def q_spectral_embedding(sf_dir: str, graph_dir: str | None = None):
    """(key, e0, e1) + eigenvalue columns — 2-dim Laplacian spectral
    embedding (smallest nontrivial eigenpairs) of a 29-vertex
    two-cluster doc-derived graph (4 intra-cluster arc rules per
    vertex + 2 bridges — the cluster-cut eigenvalues sit far below the
    intra-cluster spectrum so the invariant subspace converges in a
    few dozen supersteps), by block orthogonal iteration on the
    chassis with a Rayleigh–Ritz finish.  Rows-only: float
    eigenvectors (sign canonicalized); dense-eigh pytest oracle."""
    import tempfile

    from igraph_ray.kernels.spectral_embed import spectral_embedding

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_sem_")

    def derive(batch: pa.Table) -> pa.Table:
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        s = doc_id % 29
        in_a = s < 14
        base = np.where(in_a, 0, 14)
        size = np.where(in_a, 14, 15)
        loc = s - base
        ss_l, dd_l = [], []
        for mult, add in ((3, 1), (5, 2), (7, 3), (11, 4)):
            ss_l.append(s)
            dd_l.append(base + (loc * mult + add) % size)
        # two fixed bridges keep the graph connected
        ss_l.append(np.where(s == 0, 13, 13))
        dd_l.append(np.where(s == 0, 14, 14))
        ss_l.append(np.where(s == 1, 0, 0))
        dd_l.append(np.where(s == 1, 28, 28))
        ss = np.concatenate(ss_l)
        dd = np.concatenate(dd_l)
        keep = ss != dd
        return pa.table(
            {
                "src_key": pa.array([f"v{i}" for i in ss[keep]], pa.string()),
                "dst_key": pa.array([f"v{i}" for i in dd[keep]], pa.string()),
                "weight": pa.array(np.ones(int(keep.sum()))),
            }
        )

    arcs = (
        documents(sf_dir)
        .map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src_key", "dst_key"])
        .aggregate(Max("weight", alias_name="weight"))
    )
    keys = (
        arcs.select_columns(["src_key"])
        .rename_columns({"src_key": "key"})
        .union(
            arcs.select_columns(["dst_key"]).rename_columns(
                {"dst_key": "key"}
            )
        )
        .groupby("key")
        .count()
        .select_columns(["key"])
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    n = vertices.count()
    edges = attach_vids(arcs, vertices)
    graph = build_graph(
        edges, graph_dir,
        vertices=vertices.select_columns(["vid"]),
        symmetrize=True,
    )
    # tol=1e-6: the two-cluster gap makes stagnation fast; eigenpair
    # ACCURACY is pinned by the dense-eigh pytest oracle
    emb, lams = spectral_embedding(graph, n, k=2, tol=1e-6)
    tbl = pa.concat_tables(
        emb.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    out = _vid_to_key(tbl, vtbl, {"vid": "key"}).sort_by("key")
    # canonical signs: make each column's first nonzero entry positive
    cols = {"key": out.column("key")}
    for i in range(2):
        v = out.column(f"e{i}").to_numpy(zero_copy_only=False).copy()
        nz = np.flatnonzero(np.abs(v) > 1e-12)
        if len(nz) and v[nz[0]] < 0:
            v = -v
        cols[f"e{i}"] = pa.array(v)
    for i in range(2):
        cols[f"lambda{i + 1}"] = pa.array(
            np.full(out.num_rows, float(lams[i])), pa.float64()
        )
    return pa.table(cols)


def q_ngram_containment(sf_dir: str):
    """(a, b, common, min_sz, containment) — word-3-gram
    near-containment pairs over documents (Broder containment via the
    smaller set; df_cap=128, threshold=0.6) — the quote/boilerplate
    detector.  Int set-sizes + one IEEE division — bitwise SQL twin."""
    from igraph_ray.functions.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(
        documents(sf_dir), n=3, df_cap=128, threshold=0.6,
        metric="containment",
    )
    return pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by([("a", "ascending"), ("b", "ascending")])


def q_trimmed_mean_price(sf_dir: str):
    """(l_returnflag, n_kept, trimmed_mean) — 10%-trimmed mean of the
    extended price per return flag: keep rows with q10 ≤ cents ≤ q90
    (exact quantile_disc thresholds from the sortless grouped-quantile
    kernel), then one exact-int sum and ONE IEEE division (descaled by
    cents).  Bitwise SQL twin."""
    from igraph_ray.stages.quantile import grouped_quantiles_int

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice"],
    )

    def cents(batch: pa.Table) -> pa.Table:
        v = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "flag": batch.column("l_returnflag"),
                "c": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64)),
            }
        )

    cent = li.map_batches(
        cents, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    qs = pa.concat_tables(
        grouped_quantiles_int(cent, "flag", "c", [0.1, 0.9]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    lo: dict[str, int] = {}
    hi: dict[str, int] = {}
    for r in qs.to_pylist():
        (lo if r["q"] == 0.1 else hi)[r["flag"]] = int(r["value"])

    def partial(batch: pa.Table, _lo=lo, _hi=hi) -> pa.Table:
        f = batch.column("flag").to_pylist()
        c = batch.column("c").to_numpy(zero_copy_only=False)
        lo_a = np.array([_lo[x] for x in f], np.int64)
        hi_a = np.array([_hi[x] for x in f], np.int64)
        keep = (c >= lo_a) & (c <= hi_a)
        uniq = sorted(set(f))
        rows_f, rows_n, rows_s = [], [], []
        fa = np.asarray(f, dtype=object)
        for fv in uniq:
            m = (fa == fv) & keep
            rows_f.append(fv)
            rows_n.append(int(m.sum()))
            rows_s.append(str(int(c[m].sum())))
        return pa.table(
            {
                "flag": pa.array(rows_f, pa.string()),
                "n": pa.array(rows_n, pa.int64()),
                "s": pa.array(rows_s, pa.string()),
            }
        )

    parts = cent.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    agg: dict[str, list[int]] = {}
    for r in parts:
        a = agg.setdefault(r["flag"], [0, 0])
        a[0] += r["n"]
        a[1] += int(r["s"])
    flags = sorted(agg)
    return pa.table(
        {
            "l_returnflag": pa.array(flags, pa.string()),
            "n_kept": pa.array([agg[f][0] for f in flags], pa.int64()),
            "trimmed_mean": pa.array(
                [
                    (float(agg[f][1]) / float(agg[f][0])) / 100.0
                    for f in flags
                ],
                pa.float64(),
            ),
        }
    )


def q_asof_join_forward(sf_dir: str):
    """(event_id, o_orderkey, o_totalprice) — FORWARD-inclusive as-of
    join: each event matched to the same user's earliest order at or
    after the event timestamp (ties toward the greatest orderkey);
    unmatched events carry -1/-1.0.  Pass-through values — bitwise
    window-function SQL twin."""
    from igraph_ray.stages.asof import asof_join

    left = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    right = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    out = asof_join(
        left,
        right,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_value_cols=["o_orderkey", "o_totalprice"],
        right_tiebreak="o_orderkey",
        direction="forward",
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "o_orderkey": pc.fill_null(
                    batch.column("o_orderkey"), pa.scalar(-1, pa.int64())
                ),
                "o_totalprice": pc.fill_null(
                    batch.column("o_totalprice"),
                    pa.scalar(-1.0, pa.float64()),
                ),
            }
        )

    return out.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def q_dup_cluster_histogram(sf_dir: str):
    """(cluster_size, n_clusters, n_docs) — size distribution of the
    exact-duplicate (content-sha over the derived files table)
    clusters: how much of the corpus sits in singletons vs vendored
    blobs.  Exact ints — bitwise SQL twin (nested GROUP BY)."""
    files = with_content_sha(
        files_from_documents(sf_dir).select_columns(["content"]),
        column="content",
    )
    sizes = (
        files.groupby("content_sha")
        .aggregate(Count(alias_name="cluster_size"))
        .select_columns(["cluster_size"])
    )
    out = (
        sizes.groupby("cluster_size")
        .aggregate(Count(alias_name="n_clusters"))
    )

    def docs_col(batch: pa.Table) -> pa.Table:
        cs = batch.column("cluster_size").to_numpy(zero_copy_only=False)
        nc = batch.column("n_clusters").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cluster_size": batch.column("cluster_size"),
                "n_clusters": batch.column("n_clusters"),
                "n_docs": pa.array((cs * nc).astype(np.int64)),
            }
        )

    return out.map_batches(
        docs_col, batch_format="pyarrow", zero_copy_batch=True
    ).sort("cluster_size")


def q_transitive_closure(sf_dir: str):
    """(src_key, dst_key) — transitive closure of the doc-derived DAG
    (igraph ``transitive_closure_dag``): every ordered pair connected
    by a directed path.  Exact arc set — SQL twin is the recursive
    reachability CTE, hash MATCH."""
    from igraph_ray.kernels.transitive import transitive_closure

    arcs = _doc_dag_arcs(sf_dir)
    keys = arcs.map_batches(
        lambda b: pa.table(
            {
                "key": pa.concat_arrays(
                    [
                        b.column("src").combine_chunks(),
                        b.column("dst").combine_chunks(),
                    ]
                )
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(
        arcs.map_batches(
            lambda b: pa.table(
                {
                    "src_key": b.column("src"),
                    "dst_key": b.column("dst"),
                    "weight": pa.array(
                        np.ones(b.num_rows, dtype=np.float64)
                    ),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        vertices,
    ).select_columns(["src", "dst"])
    closed = transitive_closure(edges)
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(
        closed, vtbl, {"src": "src_key", "dst": "dst_key"}
    ).sort_by([("src_key", "ascending"), ("dst_key", "ascending")])


def q_assortativity_directed(sf_dir: str):
    """One row (group, n, corr) — directed out-in degree assortativity
    (igraph assortativity_degree(directed=True) flavour): Pearson r
    over arcs of (outdeg(src), indeg(dst)) on the distinct directed
    doc multiarc graph.  Exact-int sufficient stats — bitwise SQL
    twin."""
    from igraph_ray.stages.stats import grouped_pearson

    def no_loops(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.not_equal(batch.column("src"), batch.column("dst"))
        )

    arcs = (
        directed_doc_multiarcs(sf_dir)
        .map_batches(no_loops, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src", "dst"])
        .count()
        .select_columns(["src", "dst"])
        .materialize()
    )
    outdeg = pa.concat_tables(
        arcs.groupby("src")
        .aggregate(Count("src", alias_name="od"))
        .iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("src")
    indeg = pa.concat_tables(
        arcs.groupby("dst")
        .aggregate(Count("dst", alias_name="id_"))
        .iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("dst")
    ok = outdeg.column("src").to_pylist()
    ov = outdeg.column("od").to_numpy(zero_copy_only=False)
    ik = indeg.column("dst").to_pylist()
    iv = indeg.column("id_").to_numpy(zero_copy_only=False)
    omap = dict(zip(ok, ov.tolist()))
    imap = dict(zip(ik, iv.tolist()))
    oref = ray.put((omap, imap))

    def attach(batch: pa.Table, _r=oref) -> pa.Table:
        om, im = ray.get(_r)
        s = batch.column("src").to_pylist()
        d = batch.column("dst").to_pylist()
        return pa.table(
            {
                "g": pa.array(["all"] * len(s), pa.string()),
                "x": pa.array(
                    [float(om[k]) for k in s], pa.float64()
                ),
                "y": pa.array(
                    [float(im[k]) for k in d], pa.float64()
                ),
            }
        )

    xy = arcs.map_batches(
        attach, batch_format="pyarrow", zero_copy_batch=True
    )
    return grouped_pearson(
        xy, "g", "x", "y", x_decimals=0, y_decimals=0
    ).rename_columns({"g": "group"})


def q_node_embeddings(sf_dir: str, graph_dir: str | None = None):
    """(key, e0..e7) — 8-dim SGNS skip-gram embeddings trained over
    the deterministic walk corpus of the E1∪E2 graph
    (kernels/embeddings.py; DeepWalk step 2).  Rows-only:
    bitwise-reproducible by construction (synchronous full-batch
    Adagrad rounds, layout-independent splitmix negatives), loss
    decrease + SBM block-recovery pytest oracles."""
    import tempfile

    from igraph_ray.kernels.embeddings import skipgram_embeddings
    from igraph_ray.kernels.walks import random_walks

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_emb_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    starts = vtbl.column("vid").to_numpy(zero_copy_only=False)
    walks = random_walks(graph, starts, length=8, seed=42)
    res = skipgram_embeddings(
        walks,
        num_vertices=len(starts),
        dim=8,
        window=3,
        rounds=6,
        seed=0,
    )
    emb = np.stack(
        res.embeddings.column("embedding").to_numpy(zero_copy_only=False)
    )
    cols = {"key": vtbl.column("key")}
    for j in range(emb.shape[1]):
        cols[f"e{j}"] = pa.array(emb[:, j])
    return pa.table(cols)


def _format_roundtrip(sf_dir: str, fmt: str) -> pa.Table:
    """Write the E1∪E2 link graph to an interchange format and read
    it back — rows must reproduce link_pairs exactly (the SQL twin is
    link_pairs itself, so the whole write→parse path is hash-gated)."""
    import os
    import tempfile

    from igraph_ray.sources import graph_formats as gf

    pairs = _link_graph_edges_cached(sf_dir)
    tbl = pa.concat_tables(
        pairs.iter_batches(batch_format="pyarrow", batch_size=None)
    ).rename_columns(["src", "dst", "weight"])
    path = os.path.join(
        tempfile.mkdtemp(prefix="igr_fmt_"), f"g.{fmt}"
    )
    writer = getattr(gf, f"write_{fmt}")
    reader = getattr(gf, f"read_{fmt}")
    writer(tbl, path, directed=True)
    _verts, edges = reader(path)
    return (
        edges.rename_columns(["src_key", "dst_key", "weight"])
        .sort_by([("src_key", "ascending"), ("dst_key", "ascending")])
    )


def q_graphml_roundtrip(sf_dir: str):
    """(src_key, dst_key, weight) — E1∪E2 link graph through GraphML
    write→read (igraph write_graph/read_graph interchange surface);
    SQL twin: link_pairs (the roundtrip must be lossless)."""
    return _format_roundtrip(sf_dir, "graphml")


def q_gml_roundtrip(sf_dir: str):
    """(src_key, dst_key, weight) — E1∪E2 link graph through GML
    write→read; SQL twin: link_pairs."""
    return _format_roundtrip(sf_dir, "gml")


def q_pajek_roundtrip(sf_dir: str):
    """(src_key, dst_key, weight) — E1∪E2 link graph through Pajek
    .net write→read; SQL twin: link_pairs."""
    return _format_roundtrip(sf_dir, "pajek")


def q_kk_layout(sf_dir: str, graph_dir: str | None = None):
    """(key, x, y) — Kamada-Kawai / stress-majorization layout of the
    E1∪E2 key graph (igraph layout_kamada_kawai surface; SMACOF over
    pivot distances, kernels/layout.py::kamada_kawai; stress-decrease
    + structure oracles in tests/test_kamada_kawai.py).  Rows-only
    (float optimization)."""
    import tempfile

    from igraph_ray.kernels.layout import kamada_kawai

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_kk_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    vids = vtbl.column("vid").to_numpy(zero_copy_only=False)
    out, _trace = kamada_kawai(graph, vids, iterations=30)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    return _vid_to_key(tbl, vtbl, {"vid": "key"})


def q_circle_layout(sf_dir: str, graph_dir: str | None = None):
    """(key, x, y) — circular layout of the E1∪E2 key graph (igraph
    layout_circle: vertex i at angle 2πi/n in id order;
    kernels/layout.py::circle_layout).  Bitwise SQL twin: numpy and
    DuckDB trig resolve to the same host libm (verified bitwise);
    exact-geometry pytest oracle in tests/test_layout_simple.py."""
    import tempfile

    from igraph_ray.kernels.layout import circle_layout

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_lc_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    vertices = ray.data.from_arrow(vtbl.select(["vid"]))
    out = circle_layout(vertices, vtbl.num_rows)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    return _vid_to_key(tbl, vtbl, {"vid": "key"})


def q_star_layout(sf_dir: str, graph_dir: str | None = None):
    """(key, x, y) — star layout of the E1∪E2 key graph (igraph
    layout_star: vertex 0 at the origin, the rest on the unit circle
    in id order; kernels/layout.py::star_layout).  Bitwise SQL twin (shared host
    libm); pytest oracle in tests/test_layout_simple.py."""
    import tempfile

    from igraph_ray.kernels.layout import star_layout

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_ls_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    vertices = ray.data.from_arrow(vtbl.select(["vid"]))
    out = star_layout(vertices, vtbl.num_rows, center=0)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    return _vid_to_key(tbl, vtbl, {"vid": "key"})


def q_grid_layout(sf_dir: str, graph_dir: str | None = None):
    """(key, x, y) — row-major integer grid layout, width =
    ceil(sqrt(n)) (igraph layout_grid;
    kernels/layout.py::grid_layout).  Exact integers — bitwise SQL
    twin."""
    import tempfile

    from igraph_ray.kernels.layout import grid_layout

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_lg_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    vertices = ray.data.from_arrow(vtbl.select(["vid"]))
    out = grid_layout(vertices, vtbl.num_rows)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    return _vid_to_key(tbl, vtbl, {"vid": "key"})


def q_tree_layout(sf_dir: str, graph_dir: str | None = None):
    """(key, x, y) — simplified Reingold–Tilford layout over the BFS
    forest of the E1∪E2 key graph rooted at vid 0 (igraph
    layout_reingold_tilford; kernels/layout.py::reingold_tilford:
    y = BFS depth, leaves at consecutive post-order x, internal
    vertices centered over their children).  Rows-only (mean-of-
    children floats); structure pytest oracle in
    tests/test_layout_simple.py."""
    import tempfile

    from igraph_ray.kernels.layout import reingold_tilford

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_lt_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    tbl = reingold_tilford(graph, root=0)
    return _vid_to_key(tbl, vtbl, {"vid": "key"})


def q_spinglass(sf_dir: str):
    """(key, community_key) — spinglass communities of the E1∪E2
    graph (igraph community_spinglass, Reichardt-Bornholdt Potts
    annealing at gamma=1; kernels/spinglass.py).  Rows-only (seeded
    annealing); planted-recovery + modularity-vs-louvain pytest
    oracles."""
    from igraph_ray.kernels.spinglass import spinglass

    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices)
    assign = spinglass(edges)
    tbl = pa.concat_tables(
        assign.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(
        tbl, vtbl, {"vid": "key", "community": "community_key"}
    )


def q_cohesive_blocks(sf_dir: str):
    """(block, key, cohesion, parent) — Moody-White cohesive block
    structure of the E1∪E2 graph (igraph cohesive_blocks;
    kernels/cohesion.py).  Rows-only (recursive min-separator tree);
    exact all-separator brute-force parity asserted in
    tests/test_cohesion.py."""
    from igraph_ray.kernels.cohesion import cohesive_blocks

    pairs = _link_graph_edges_cached(sf_dir)
    keys = (
        with_file_key(files_from_documents(sf_dir))
        .select_columns(["file_key"])
        .rename_columns({"file_key": "key"})
    )
    vertices = assign_vertex_ids(keys, key_col="key").materialize()
    edges = attach_vids(pairs, vertices)
    out, cohesion, parent = cohesive_blocks(edges)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    blk = tbl.column("block").to_numpy(zero_copy_only=False)
    tbl = tbl.append_column(
        "cohesion",
        pa.array(np.asarray(cohesion, np.int64)[blk]),
    ).append_column(
        "parent", pa.array(np.asarray(parent, np.int64)[blk])
    )
    vtbl = pa.concat_tables(
        vertices.select_columns(["key", "vid"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ).sort_by("vid")
    return _vid_to_key(tbl, vtbl, {"vid": "key"}).sort_by(
        [("block", "ascending"), ("key", "ascending")]
    )


def q_drl_layout(sf_dir: str, graph_dir: str | None = None):
    """(key, x, y) — DRL/OpenOrd five-phase force-directed layout of
    the E1∪E2 key graph (igraph layout_drl surface;
    kernels/layout.py::drl_layout — liquid/expansion/cooldown/crunch/
    simmer schedule over the FR force machinery).  Rows-only (float
    force simulation); determinism + structure pytest oracles in
    tests/test_layout_simple.py."""
    import tempfile

    from igraph_ray.kernels.layout import drl_layout

    graph_dir = graph_dir or tempfile.mkdtemp(prefix="igr_drl_")
    graph, vtbl = _build_key_graph(sf_dir, graph_dir)
    out = drl_layout(graph, iterations=30)
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow", batch_size=None)
    )
    return _vid_to_key(tbl, vtbl, {"vid": "key"})


def q_sugiyama_layout(sf_dir: str):
    """(vid, x, y) — Sugiyama layered layout of the deterministic
    directed doc graph (same derivation as feedback_arc_set: vids
    doc_id % 101 → (doc_id*37+11) % 101, distinct arcs, loops
    dropped).  y is the longest-path layer after ELS cycle removal,
    x the within-layer barycenter-ordered index centered on 0
    (kernels/layout.py::sugiyama_layout).  Rows-only — the sequential
    ELS ordering has no SQL twin; layering-respects-arcs pytest
    oracle in tests/test_layout_simple.py."""
    from igraph_ray.kernels.layout import sugiyama_layout

    def derive(batch: pa.Table) -> pa.Table:
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array((doc_id % 101).astype(np.int64)),
                "dst": pa.array(((doc_id * 37 + 11) % 101).astype(np.int64)),
            }
        )

    arcs = (
        documents(sf_dir)
        .select_columns(["doc_id"])
        .map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src", "dst"])
        .aggregate(Count(alias_name="n"))
        .select_columns(["src", "dst"])
    )
    return sugiyama_layout(arcs).sort_by("vid")
