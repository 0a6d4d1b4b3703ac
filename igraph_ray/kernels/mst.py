"""Minimum spanning forest — distributed Borůvka.

``igraph_minimum_spanning_tree`` (weighted) / ``nx.minimum_spanning_
edges(algorithm="boruvka")`` semantics over an undirected weighted
edge table: per round every component selects its minimum-weight
outgoing edge (ties broken lexicographically by (weight, src, dst) —
the classic distinct-weight reduction, so no cycle can form), the
selected edges join the forest, and components contract.  Component
count at least halves per round → O(log V) rounds.

All stages are Ray Data pipelines:

- the per-component minimum is a ``groupby(comp).map_groups`` over
  candidate rows (each cross edge emitted under both endpoint
  components) — one shuffle keyed by component;
- contraction reuses the distributed ``connected_components`` kernel
  on the selected comp-graph (≤ one edge per component, shrinking
  geometrically);
- label maintenance attaches component ids by broadcast when the map
  is small and ``Dataset.join`` beyond that (the engine's standard
  small-side rule, same switch as ``stages/vertex_ids.attach_vids``).

Multi-edges collapse to their minimum weight first; self-loops drop.
The result is the unique MSF of the tie-broken weights (and *a*
minimum forest of the raw weights — all minimum forests share the
same total weight, which is what the oracle asserts).
"""

from __future__ import annotations

import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Min

BROADCAST_MAX_ROWS = 5_000_000


class _MapLookup:
    """Broadcast (key → value) int64 lookup, fetched once per worker."""

    def __init__(self, ref, key_cols: list[str], out_suffix: str):
        tbl = ray.get(ref)
        k = tbl.column("key").to_numpy(zero_copy_only=False)
        v = tbl.column("value").to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        self._k, self._v = k[order], v[order]
        self._cols = key_cols
        self._suffix = out_suffix

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = dict(zip(batch.column_names, batch.columns))
        for c in self._cols:
            x = batch.column(c).to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self._k, x)
            out[f"{c}{self._suffix}"] = pa.array(self._v[pos])
        return pa.table(out)


def _attach_map(
    ds: ray.data.Dataset,
    mapping: ray.data.Dataset,  # columns key, value (int64)
    key_cols: list[str],
    out_suffix: str,
    map_rows: int,
) -> ray.data.Dataset:
    if map_rows <= BROADCAST_MAX_ROWS:
        tbl = pa.concat_tables(
            mapping.iter_batches(batch_format="pyarrow", batch_size=None)
        )
        ref = ray.put(tbl)
        return ds.map_batches(
            _MapLookup,
            fn_constructor_args=(ref, key_cols, out_suffix),
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=(1, 8),
        )
    join_parts = int(
        max(2, min(64, ray.cluster_resources().get("CPU", 4) // 2))
    )
    out = ds
    for c in key_cols:
        side = mapping.rename_columns({"key": c, "value": f"{c}{out_suffix}"})
        out = out.join(side, "inner", join_parts, on=(c,))
    return out


def _min_weight_edges(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Canonical (src < dst, weight) with parallel edges collapsed to
    their minimum weight, self-loops dropped."""

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        w = (
            batch.column("weight").to_numpy(zero_copy_only=False)
            if "weight" in batch.column_names
            else np.ones(len(s), np.float64)
        )
        keep = s != d
        s, d, w = s[keep], d[keep], w[keep]
        return pa.table(
            {
                "src": pa.array(np.minimum(s, d)),
                "dst": pa.array(np.maximum(s, d)),
                "weight": pa.array(w.astype(np.float64)),
            }
        )

    return (
        edges.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["src", "dst"])
        .aggregate(Min("weight", alias_name="weight"))
    )


def minimum_spanning_forest(
    edges: ray.data.Dataset,
    work_dir: str | None = None,
    max_rounds: int = 64,
) -> ray.data.Dataset:
    """Rows ``(src, dst, weight)`` (src < dst) of the minimum spanning
    forest of the undirected multigraph ``edges``."""
    from igraph_ray.api import build_graph
    from igraph_ray.kernels.components import connected_components

    work_dir = work_dir or tempfile.mkdtemp(prefix="igr_mst_")
    simple = _min_weight_edges(edges).materialize()

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

    comp = (
        simple.map_batches(
            endpoints, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("key")
        .aggregate(Min("key", alias_name="value"))
        .materialize()
    )  # (key=vid, value=comp), initially comp = vid
    n_vertices = comp.count()

    forest_parts: list[ray.data.Dataset] = []
    for rnd in range(max_rounds):
        labeled = _attach_map(
            simple, comp, ["src", "dst"], "_c", n_vertices
        )

        def cross_only(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.not_equal(batch.column("src_c"), batch.column("dst_c"))
            )

        cross = labeled.map_batches(
            cross_only, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        if cross.count() == 0:
            break

        def both_sides(batch: pa.Table) -> pa.Table:
            cols = ["src", "dst", "weight", "src_c", "dst_c"]
            s, d, w, cu, cv = (
                batch.column(c).to_numpy(zero_copy_only=False) for c in cols
            )
            return pa.table(
                {
                    "comp": pa.array(np.concatenate([cu, cv])),
                    "weight": pa.array(np.concatenate([w, w])),
                    "src": pa.array(np.concatenate([s, s])),
                    "dst": pa.array(np.concatenate([d, d])),
                    "oc": pa.array(np.concatenate([cv, cu])),
                }
            )

        def pick_min(group: pa.Table) -> pa.Table:
            w = group.column("weight").to_numpy(zero_copy_only=False)
            s = group.column("src").to_numpy(zero_copy_only=False)
            d = group.column("dst").to_numpy(zero_copy_only=False)
            i = int(np.lexsort((d, s, w))[0])
            return group.slice(i, 1)

        sel = (
            cross.map_batches(
                both_sides, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby("comp")
            .map_groups(pick_min, batch_format="pyarrow")
            .materialize()
        )

        # the same edge may be picked from both sides — dedup pairs
        chosen = (
            sel.select_columns(["src", "dst", "weight"])
            .groupby(["src", "dst"])
            .aggregate(Min("weight", alias_name="weight"))
            .materialize()
        )
        forest_parts.append(chosen)

        # contract: components of the selected comp-graph
        def comp_arcs(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "src": batch.column("comp"),
                    "dst": batch.column("oc"),
                    "weight": pa.array(
                        np.ones(batch.num_rows, np.float64)
                    ),
                }
            )

        cg_edges = sel.map_batches(
            comp_arcs, batch_format="pyarrow", zero_copy_batch=True
        )
        cg_vertices = comp.select_columns(["value"]).rename_columns(
            {"value": "vid"}
        ).groupby("vid").aggregate(Min("vid", alias_name="_d")).select_columns(["vid"])
        g = build_graph(
            cg_edges,
            f"{work_dir}/round{rnd}",
            symmetrize=True,
            vertices=cg_vertices,
        )
        cc = connected_components(g)
        remap = cc.state.select_columns(["vid", "comp"]).rename_columns(
            {"vid": "key", "comp": "value"}
        )
        comp = (
            _attach_map(
                comp.select_columns(["key", "value"]).rename_columns(
                    {"value": "old"}
                ),
                remap,
                ["old"],
                "_n",
                n_vertices,
            )
            .map_batches(
                lambda b: pa.table(
                    {"key": b.column("key"), "value": b.column("old_n")}
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .materialize()
        )
    else:  # pragma: no cover
        raise RuntimeError(f"Borůvka did not finish in {max_rounds} rounds")

    if not forest_parts:
        return ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "weight": pa.array([], pa.float64()),
                }
            )
        )
    out = forest_parts[0]
    for p in forest_parts[1:]:
        out = out.union(p)
    return out
