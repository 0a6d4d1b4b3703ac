"""FIXTURES.md §2 round-trip: golden graphs constructed *through* the
files-table path — a tiny files table whose E1/E2/E3 rules produce
exactly the target edge set — so kernels are tested end-to-end
(read → sha → edge rules → vids → CSR → iterate), not just on
pre-made edge tables."""

import hashlib

import pyarrow as pa
import ray.data

from igraph_ray.kernels import connected_components, pagerank
from igraph_ray.pipelines.graph_build import build_file_graph
from igraph_ray.stages.sha import with_content_sha
from tests.util import ds_to_table


def _files_table(rows):
    cols = {k: [] for k in ("repo", "path", "commit", "lang", "content")}
    for r in rows:
        for k in cols:
            cols[k].append(r[k])
    return pa.table({k: pa.array(v, pa.string()) for k, v in cols.items()})


def test_two_paths_through_files_rules(tmp_path):
    """Shared-path rule builds two chains → two components.

    Files: repos a0,a1,a2 share path p1 pairwise via two paths; repos
    b0,b1 share another path — all commits and contents unique, so E2
    and E3 contribute nothing.
    """
    rows = []
    # component 1: a0:p1 –E1– a1:p1 –E2(shared commit)– a1:p2 –E1– a2:p2
    for i, (repo, path, commit) in enumerate(
        [
            ("a0", "p1", "c0"),
            ("a1", "p1", "cA"),
            ("a1", "p2", "cA"),  # same commit links a1's two files
            ("a2", "p2", "c3"),
        ]
    ):
        rows.append(
            dict(repo=repo, path=path, commit=commit, lang="py",
                 content=f"unique-{i}")
        )
    # component 2: two repos sharing one path
    for i, (repo, path) in enumerate([("b0", "q1"), ("b1", "q1")]):
        rows.append(
            dict(repo=repo, path=path, commit=f"d{i}", lang="py",
                 content=f"unique-b{i}")
        )
    files = ray.data.from_arrow(_files_table(rows))
    built = build_file_graph(files, str(tmp_path / "g"))

    run = connected_components(built.graph)
    comp = ds_to_table(run.state.select_columns(["vid", "comp"]))
    comp_of = dict(
        zip(comp.column("vid").to_pylist(), comp.column("comp").to_pylist())
    )
    vt = ds_to_table(built.vertices.select_columns(["key", "vid"]))
    key_vid = dict(
        zip(vt.column("key").to_pylist(), vt.column("vid").to_pylist())
    )
    a_keys = [k for k in key_vid if k.startswith("a")]
    b_keys = [k for k in key_vid if k.startswith("b")]
    a_comps = {comp_of[key_vid[k]] for k in a_keys}
    b_comps = {comp_of[key_vid[k]] for k in b_keys}
    assert len(a_comps) == 1 and len(b_comps) == 1
    assert a_comps != b_comps


def test_sha_rule_roundtrip_and_invariant(tmp_path):
    """Cross-repo duplicate content links exactly the two file vertices
    (E3), and the per-row content_sha invariant holds end to end."""
    rows = [
        dict(repo="r1", path="x", commit="c1", lang="py", content="SAME"),
        dict(repo="r2", path="y", commit="c2", lang="py", content="SAME"),
        dict(repo="r3", path="z", commit="c3", lang="py", content="other"),
    ]
    files_tbl = _files_table(rows)
    files = ray.data.from_arrow(files_tbl)
    built = build_file_graph(
        files, str(tmp_path / "g"), rules=("sha",)
    )
    et = ds_to_table(built.edges)
    arcs = set(zip(et.column("src").to_pylist(), et.column("dst").to_pylist()))
    vt = ds_to_table(built.vertices.select_columns(["key", "vid"]))
    key_vid = dict(zip(vt.column("key").to_pylist(), vt.column("vid").to_pylist()))
    a, b = key_vid["r1:x"], key_vid["r2:y"]
    assert arcs == {(a, b), (b, a)}

    # invariant: per-row sha256 equality input → output
    out = ds_to_table(with_content_sha(files))
    for content, sha in zip(
        out.column("content").to_pylist(), out.column("content_sha").to_pylist()
    ):
        assert hashlib.sha256(content.encode()).hexdigest() == sha


def test_pagerank_through_files_rules(tmp_path):
    """PageRank over a files-derived star (one path shared by many
    repos, star-from-min above the clique cap): hub outranks leaves."""
    rows = [
        dict(repo=f"r{i:02d}", path="hub", commit=f"c{i}", lang="py",
             content=f"u{i}")
        for i in range(12)  # > clique_cap=8 → star from min member
    ]
    files = ray.data.from_arrow(_files_table(rows))
    built = build_file_graph(files, str(tmp_path / "g"), rules=("shared_path",))
    run = pagerank(built.graph, tol=1e-9, max_iter=200,
                   raise_on_nonconvergence=False)
    rt = ds_to_table(run.state.select_columns(["vid", "rank"]))
    ranks = dict(zip(rt.column("vid").to_pylist(), rt.column("rank").to_pylist()))
    vt = ds_to_table(built.vertices.select_columns(["key", "vid"]))
    key_vid = dict(zip(vt.column("key").to_pylist(), vt.column("vid").to_pylist()))
    hub = key_vid["r00:hub"]  # min member = star center
    assert ranks[hub] == max(ranks.values())
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
