"""Auto-coarsening front end for the bounded-gather community
methods (fastgreedy / Girvan-Newman / Walktrap).

Those methods are inherently sequential global loops (one
globally-best merge / edge removal at a time) and therefore run as
DOCUMENTED BOUNDED-GATHER operators: the collapsed arc table ships to
one Ray task only while it fits the declared bound.  Past the bound
the round-3 behavior was a loud ``NotImplementedError`` telling the
user to coarsen manually.  This module automates exactly that advice
(igraph documents the same scope restriction for
``community_edge_betweenness``; multilevel refinement of an exact
method over a contracted graph is the standard large-graph recipe,
cf. Louvain itself):

1. run the existing distributed Louvain (``kernels/louvain.py``) on
   the over-bound graph — fully distributed, shuffle-frugal;
2. contract to the community quotient graph
   (``stages/graph_ops.quotient_graph`` — one groupby);
3. run the exact bounded method on the quotient (re-checking the
   bound: if Louvain could not compress under it, the honest raise
   remains);
4. project the quotient labels back through the Louvain assignment
   with one broadcast map (quotient side is under the gather bound by
   construction; the per-vertex assignment stays distributed).

Results computed this way are flagged ``approximated=True`` on the
returned :class:`CommunityResult` — they are the exact method's
partition of the Louvain quotient, not of the raw graph.  Labels stay
"a member vid of the community" like every community kernel here.

Oracle: ``tests/test_coarsen.py`` — planted-partition recovery under
an artificially tiny bound (no clique is ever split), flag semantics,
and unchanged under-bound behavior (``approximated=False``, identical
partitions to the direct path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

BROADCAST_MAX_QUOTIENT = 20_000_000


class CommunityResult(tuple):
    """Tuple subclass returned by the bounded community methods —
    unpacks exactly like the plain tuple the round-3 API returned,
    plus an ``approximated`` attribute: ``True`` when the partition
    was computed on a Louvain quotient instead of the full graph."""

    approximated: bool

    def __new__(cls, items, approximated: bool = False):
        obj = super().__new__(cls, tuple(items))
        obj.approximated = approximated
        return obj


def one_arc_view(sym_arcs: ray.data.Dataset) -> ray.data.Dataset:
    """Keep one arc per undirected pair (src <= dst) of an already
    symmetric-deduped arc table, so downstream re-symmetrization does
    not double weights."""

    def keep(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(s <= d))

    return sym_arcs.map_batches(
        keep, batch_format="pyarrow", zero_copy_batch=True
    )


def louvain_quotient(
    sym_arcs: ray.data.Dataset,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Coarsen a symmetric-deduped arc table with Louvain; returns
    ``(coarse_edges, assignment)`` where ``coarse_edges`` is a
    one-arc-per-pair ``(src, dst, weight)`` quotient edge table
    (self-loops = intra-community weight, kept) and ``assignment`` has
    rows ``(vid, community)`` over the original vertices."""
    from igraph_ray.kernels.louvain import louvain
    from igraph_ray.stages.graph_ops import quotient_graph

    edges = one_arc_view(sym_arcs)
    assignment, _mods = louvain(edges)
    assignment = assignment.materialize()
    mode = (
        "broadcast"
        if assignment.count() <= BROADCAST_MAX_QUOTIENT
        else "join"
    )
    coarse = quotient_graph(
        edges, assignment, comm_col="community", mode=mode
    )

    def to_edges(batch: pa.Table) -> pa.Table:
        cs = batch.column("c_src").to_numpy(zero_copy_only=False)
        cd = batch.column("c_dst").to_numpy(zero_copy_only=False)
        w = batch.column("weight").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.minimum(cs, cd)),
                "dst": pa.array(np.maximum(cs, cd)),
                "weight": pa.array(w.astype(np.float64)),
            }
        )

    # quotient_graph groups on (c_src, c_dst) of the one-arc view,
    # which is canonical on ORIGINAL vids, not community labels — so
    # (a, b) and (b, a) CAN both appear as quotient pairs (e.g. arcs
    # (1,5) and (2,4) with comm(1)=comm(4)=A, comm(5)=comm(2)=B).
    # Collapse the min/max-canonicalized pairs with one groupby-sum
    # (quotient-sized, under the gather bound by construction) so
    # consumers get a true one-row-per-pair edge table without
    # relying on their own symmetrize_dedup to merge parallels.
    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": batch.column("src"),
                "dst": batch.column("dst"),
                "weight": batch.column("sum(weight)"),
            }
        )

    coarse_edges = (
        coarse.map_batches(
            to_edges, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby(["src", "dst"])
        .sum("weight")
        .map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)
    )
    return coarse_edges, assignment


class _ProjectLabels:
    """vid -> final label via the broadcast quotient label map:
    ``final[vid] = exact_label[louvain_community[vid]]``.  The
    quotient-sized map ships once per actor (``ray.put`` ref in
    ``__init__``); the per-vertex assignment stays distributed."""

    def __init__(self, ref):
        self.qvids, self.qlabels = ray.get(ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        comm = batch.column("community").to_numpy(zero_copy_only=False)
        # The exact method may have dropped quotient vertices that
        # carry only a self-loop (walktrap/GN symmetrize with
        # keep_self_loops=False and derive vids from arcs, so any
        # disconnected component Louvain collapsed to one community
        # has no arcs left on the quotient).  A blind searchsorted on
        # such a community indexes out of range or silently reads a
        # neighbor's label — clip, verify the hit, and let unmatched
        # vertices KEEP their Louvain community label: a quotient
        # vertex the exact method never saw stays its own community.
        # No label collision is possible: every label (exact or
        # fallback) is the min member vid of its community, and the
        # member sets are disjoint.
        pos = np.searchsorted(self.qvids, comm)
        pos = np.minimum(pos, max(len(self.qvids) - 1, 0))
        if len(self.qvids):
            ok = self.qvids[pos] == comm
            out = np.where(ok, self.qlabels[pos], comm)
        else:
            out = comm
        return pa.table(
            {
                "vid": batch.column("vid"),
                "community": pa.array(out.astype(np.int64)),
            }
        )


def project_assignment(
    assignment: ray.data.Dataset, quotient_labels: pa.Table
) -> ray.data.Dataset:
    """Compose the Louvain ``assignment`` (vid, community) with the
    exact method's quotient partition ``(vid, community)`` — the
    quotient table is under the gather bound by construction, so a
    broadcast probe is always safe here."""
    qtbl = quotient_labels.sort_by("vid")
    ref = ray.put(
        (
            qtbl.column("vid").to_numpy(zero_copy_only=False),
            qtbl.column("community").to_numpy(zero_copy_only=False),
        )
    )
    return assignment.map_batches(
        _ProjectLabels,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )


def gather_labels(assignment: ray.data.Dataset) -> pa.Table:
    """Gather a (bounded, quotient-sized) assignment dataset."""
    live = [
        t
        for t in assignment.iter_batches(
            batch_format="pyarrow", batch_size=None
        )
        if t.num_rows
    ]
    if not live:
        return pa.table(
            {
                "vid": pa.array([], pa.int64()),
                "community": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(live)
