"""Distributed subgraph pattern matching / counting (igraph
``igraph_subisomorphic_vf2`` / ``igraph_count_subisomorphisms_vf2``
surface; ``nx.isomorphism.GraphMatcher.subgraph_monomorphisms_iter``
/ ``subgraph_isomorphisms_iter`` parity on counts).

Unlike the whole-graph VF2 certificate (``kernels/isomorphism.py``,
a documented bounded-gather), pattern counting against a LARGE data
graph is embarrassingly join-parallel, so this module uses the
classic **edge-join expansion** plan (the binary-join baseline of
worst-case-optimal join / distributed motif systems): the pattern's
vertices are bound one at a time, each extension being one
hash-shuffle equi-join of the partial-embedding table against the
arc table on the already-bound anchor vertex, followed by vectorized
injectivity filters and packed-key semi-joins for the pattern's
closing edges.  Every stage is a Ray Data native operation
(``Dataset.join`` with ``inner`` / ``left_semi`` / ``left_anti``),
so the streaming executor pipelines and spills the (possibly huge)
partial-embedding stream — nothing is gathered to the driver except
the final count / capped sample.

Scale notes:

* Intermediate size is the number of partial embeddings — an
  intrinsic property of the pattern and graph (AGM bound), not an
  artifact.  The binding order greedily maximizes the number of
  already-bound neighbors at each step (most-constrained-first), the
  standard heuristic for cutting intermediate fanout.
* Closing-edge / induced non-edge checks run against the DISTINCT
  packed arc keys: broadcast + ``np.searchsorted`` probe when the
  arc table is small (``close_mode="broadcast"``), Ray native
  ``left_semi`` / ``left_anti`` hash join above the bound
  (``close_mode="join"``; ``"auto"`` picks by arc count).
* Counts are exact integers: the expansion enumerates each injective
  homomorphism (monomorphism) exactly once because rows are ordered
  mappings (columns ``m0..m{k-1}`` = image of pattern vertex i).

Vertex ids must be < 2**31 (packed (a,b) keys use a<<32|b in int64);
the dense-vid contract (``stages/vertex_ids.py``) guarantees this for
every graph the engine builds below 2G vertices.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

# above this many arcs the closing-edge checks switch from a
# broadcast probe set to a co-partitioned left_semi/left_anti join
BROADCAST_MAX_ARCS = 4_000_000


def _pattern_order(
    k: int, pedges: list[tuple[int, int]]
) -> tuple[list[int], list[list[int]]]:
    """Greedy most-constrained-first binding order.

    Returns (order, bound_neighbors) where bound_neighbors[step] is
    the list of pattern vertices already bound when order[step] is
    bound that are pattern-adjacent to it (empty for the first two,
    which come from the seed edge).  Raises on a disconnected
    pattern (join expansion needs a connected pattern; igraph's VF2
    has the same practical restriction for subgraph search seeds).
    """
    adj: list[set[int]] = [set() for _ in range(k)]
    for a, b in pedges:
        if a == b:
            raise ValueError("pattern self-loops are not supported")
        adj[a].add(b)
        adj[b].add(a)
    deg = [len(s) for s in adj]
    # seed edge: endpoint with max degree, then its max-degree neighbor
    v0 = max(range(k), key=lambda v: (deg[v], -v))
    if deg[v0] == 0:
        raise ValueError("pattern must be connected (isolated vertex)")
    v1 = max(adj[v0], key=lambda v: (deg[v], -v))
    order = [v0, v1]
    bound = set(order)
    nbrs: list[list[int]] = [[], []]
    while len(order) < k:
        cands = [v for v in range(k) if v not in bound and adj[v] & bound]
        if not cands:
            raise ValueError("pattern must be connected")
        nxt = max(cands, key=lambda v: (len(adj[v] & bound), deg[v], -v))
        order.append(nxt)
        nbrs.append(sorted(adj[nxt] & bound))
        bound.add(nxt)
    return order, nbrs


def _both_arcs(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Symmetric, deduplicated, loop-free arc table (src, dst)."""

    def expand(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        a = np.concatenate([s, d])
        b = np.concatenate([d, s])
        pk = (a << np.int64(32)) | b
        pk = np.unique(pk)  # block-local dedup; global dedup below
        return pa.table(
            {"src": pk >> np.int64(32), "dst": pk & np.int64(0xFFFFFFFF)}
        )

    sym = edges.map_batches(
        expand, batch_format="pyarrow", zero_copy_batch=True
    )

    def dedup(batch: pa.Table) -> pa.Table:
        s = batch.column("src").to_numpy(zero_copy_only=False)
        d = batch.column("dst").to_numpy(zero_copy_only=False)
        pk = (s << np.int64(32)) | d
        pk = np.unique(pk)
        return pa.table(
            {"src": pk >> np.int64(32), "dst": pk & np.int64(0xFFFFFFFF)}
        )

    # global dedup: one groupby shuffle on src co-locates duplicates
    return sym.groupby("src").map_groups(
        dedup, batch_format="pyarrow"
    )


def _pack(a: pa.ChunkedArray | pa.Array, b) -> np.ndarray:
    av = (
        a.to_numpy(zero_copy_only=False).astype(np.int64)
        if not isinstance(a, np.ndarray)
        else a
    )
    bv = (
        b.to_numpy(zero_copy_only=False).astype(np.int64)
        if not isinstance(b, np.ndarray)
        else b
    )
    return (av << np.int64(32)) | bv


class _PackCols:
    """Append a packed (col_a<<32|col_b) key column — stateless
    vectorized stage shared by the closing-edge checks."""

    def __init__(self, col_a: str, col_b: str, out: str):
        self.a, self.b, self.out = col_a, col_b, out

    def __call__(self, batch: pa.Table) -> pa.Table:
        pk = _pack(batch.column(self.a), batch.column(self.b))
        return batch.append_column(self.out, pa.array(pk, pa.int64()))


def _edge_check(
    emb: ray.data.Dataset,
    col_a: str,
    col_b: str,
    arc_keys_ref,
    arcs_packed: ray.data.Dataset | None,
    num_partitions: int,
    anti: bool,
) -> ray.data.Dataset:
    """Keep embeddings where arc (col_a -> col_b) exists (semi) or is
    absent (anti).  Broadcast probe when arc_keys_ref is set, else a
    Ray native left_semi/left_anti hash join on the packed key."""
    if arc_keys_ref is not None:
        # task-based (NOT an actor pool): a chain of closing-edge
        # checks would otherwise pin one reserved actor-CPU per stage
        # and starve small clusters into a scheduling deadlock
        # (observed at num_cpus=4 with 3 chained pools).  ray.get of
        # the broadcast keys inside the task is a zero-copy plasma
        # read, so per-task cost is negligible.
        def probe(batch: pa.Table) -> pa.Table:
            keys = ray.get(arc_keys_ref)
            pk = _pack(batch.column(col_a), batch.column(col_b))
            pos = np.searchsorted(keys, pk)
            pos_c = np.clip(pos, 0, max(len(keys) - 1, 0))
            hit = (
                (keys[pos_c] == pk)
                if len(keys)
                else np.zeros(len(pk), dtype=bool)
            )
            return batch.filter(pa.array(~hit if anti else hit))

        return emb.map_batches(
            probe, batch_format="pyarrow", zero_copy_batch=True
        )
    packed = emb.map_batches(
        _PackCols(col_a, col_b, "_pk"),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    joined = packed.join(
        arcs_packed,
        join_type="left_anti" if anti else "left_semi",
        num_partitions=num_partitions,
        on=("_pk",),
        right_on=("pk",),
    )
    return joined.drop_columns(["_pk"])


def subgraph_embeddings(
    edges: ray.data.Dataset,
    pattern_edges: list[tuple[int, int]],
    *,
    induced: bool = False,
    close_mode: str = "auto",
) -> ray.data.Dataset:
    """Stream of embeddings of an undirected connected pattern into
    the undirected graph given by ``edges`` (src,dst int64).

    Output columns ``m0..m{k-1}``: row r maps pattern vertex i to
    data vertex ``m{i}[r]``.  Each injective edge-preserving mapping
    appears exactly once; with ``induced=True`` mappings that hit a
    data edge across any pattern NON-edge are dropped (induced
    subgraph isomorphisms, nx ``subgraph_isomorphisms_iter``).
    """
    k = 1 + max(max(a, b) for a, b in pattern_edges)
    pset = {(min(a, b), max(a, b)) for a, b in pattern_edges}
    order, bnbrs = _pattern_order(k, list(pset))

    arcs = _both_arcs(edges).materialize()
    n_arcs = arcs.count()
    num_partitions = int(max(2, min(256, n_arcs // 500_000 + 2)))
    use_bcast = (
        close_mode == "broadcast"
        or (close_mode == "auto" and n_arcs <= BROADCAST_MAX_ARCS)
    )

    arc_keys_ref = None
    arcs_packed = None
    needs_check = induced or any(len(nb) > 1 for nb in bnbrs)
    if needs_check:
        if use_bcast:
            pks = [
                _pack(b.column("src"), b.column("dst"))
                for b in arcs.iter_batches(
                    batch_format="pyarrow", batch_size=None
                )
            ]
            keys = (
                np.unique(np.concatenate(pks))
                if pks
                else np.empty(0, np.int64)
            )
            arc_keys_ref = ray.put(keys)
        else:
            arcs_packed = arcs.map_batches(
                lambda b: pa.table(
                    {"pk": _pack(b.column("src"), b.column("dst"))}
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            ).materialize()

    # seed: the first pattern edge (order[0], order[1]) over all arcs
    v0, v1 = order[0], order[1]
    emb = arcs.map_batches(
        lambda b, _v0=v0, _v1=v1: pa.table(
            {f"m{_v0}": b.column("src"), f"m{_v1}": b.column("dst")}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    bound = [v0, v1]

    for step in range(2, k):
        vk = order[step]
        nbrs = bnbrs[step]
        anchor = nbrs[0]
        ext = arcs.map_batches(
            lambda b, _s=step: pa.table(
                {f"_ja{_s}": b.column("src"), f"_jb{_s}": b.column("dst")}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        emb = emb.join(
            ext,
            join_type="inner",
            num_partitions=num_partitions,
            on=(f"m{anchor}",),
            right_on=(f"_ja{step}",),
        )

        class Finish:
            """Rename the extension column and apply injectivity."""

            def __init__(self, s: int, new_v: int, bound_now: list[int]):
                self.s, self.new_v, self.bound_now = s, new_v, bound_now

            def __call__(self, batch: pa.Table) -> pa.Table:
                nv = (
                    batch.column(f"_jb{self.s}")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
                keep = np.ones(len(nv), dtype=bool)
                for b_ in self.bound_now:
                    bv = (
                        batch.column(f"m{b_}")
                        .to_numpy(zero_copy_only=False)
                        .astype(np.int64)
                    )
                    keep &= nv != bv
                batch = batch.drop_columns([f"_jb{self.s}"])
                batch = batch.append_column(
                    f"m{self.new_v}", pa.array(nv, pa.int64())
                )
                return batch.filter(pa.array(keep))

        emb = emb.map_batches(
            Finish(step, vk, list(bound)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        # closing edges to the remaining already-bound neighbors
        for b2 in nbrs[1:]:
            emb = _edge_check(
                emb,
                f"m{b2}",
                f"m{vk}",
                arc_keys_ref,
                arcs_packed,
                num_partitions,
                anti=False,
            )
        bound.append(vk)

    if induced:
        for i in range(k):
            for j in range(i + 1, k):
                if (i, j) not in pset:
                    emb = _edge_check(
                        emb,
                        f"m{i}",
                        f"m{j}",
                        arc_keys_ref,
                        arcs_packed,
                        num_partitions,
                        anti=True,
                    )
    return emb


def count_subgraph_matches(
    edges: ray.data.Dataset,
    pattern_edges: list[tuple[int, int]],
    *,
    induced: bool = False,
    close_mode: str = "auto",
) -> int:
    """Exact number of (ordered, injective) embeddings — equals
    ``len(list(GraphMatcher(G, P).subgraph_monomorphisms_iter()))``
    (``subgraph_isomorphisms_iter`` when induced=True)."""
    return int(
        subgraph_embeddings(
            edges, pattern_edges, induced=induced, close_mode=close_mode
        ).count()
    )
