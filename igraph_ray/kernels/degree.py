"""K5 — degree / weighted degree (SURVEY.md §2.1 K5).

Used by PageRank normalization (local in the CSR build), triangle
orientation, and dangling detection; exposed standalone as a grouped
aggregate.  One hash/sort shuffle: ``groupby(vid).aggregate(Count,
Sum(weight))``.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum


def out_degrees(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Per-source out-degree and weighted out-degree:
    rows ``(vid, degree, weighted_degree)``."""
    agg = edges.groupby("src").aggregate(
        Count("src", alias_name="degree"),
        Sum("weight", alias_name="weighted_degree"),
    )
    return agg.rename_columns({"src": "vid"})


def undirected_degrees(
    edges: ray.data.Dataset, num_parts: int = 32
) -> ray.data.Dataset:
    """Degree over both endpoints (for a canonical one-arc-per-pair
    edge table): rows ``(vid, degree)``.

    Pre-combined per block (np.unique counts) before a single int32
    hash-partition shuffle; final combine is a vectorized per-partition
    reduceat — the partial/combiner pattern of SURVEY.md §4."""
    import numpy as np

    from igraph_ray.utils import part_of

    def partial_counts(batch: pa.Table) -> pa.Table:
        v = np.concatenate(
            [
                batch.column("src").to_numpy(zero_copy_only=False),
                batch.column("dst").to_numpy(zero_copy_only=False),
            ]
        )
        uv, counts = np.unique(v, return_counts=True)
        return pa.table(
            {
                "vid": pa.array(uv),
                "n": pa.array(counts.astype(np.int64)),
                "hpart": pa.array(part_of(uv, num_parts)),
            }
        )

    def combine(group: pa.Table) -> pa.Table:
        v = group.column("vid").to_numpy(zero_copy_only=False)
        n = group.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        v, n = v[order], n[order]
        if len(v) == 0:
            return pa.table(
                {"vid": pa.array([], pa.int64()), "degree": pa.array([], pa.int64())}
            )
        first = np.empty(len(v), dtype=bool)
        first[0] = True
        first[1:] = v[1:] != v[:-1]
        seg = np.flatnonzero(first)
        return pa.table(
            {
                "vid": pa.array(v[seg]),
                "degree": pa.array(np.add.reduceat(n, seg)),
            }
        )

    partials = edges.map_batches(
        partial_counts, batch_format="pyarrow", zero_copy_batch=True
    )
    return partials.groupby("hpart").map_groups(
        combine, batch_format="pyarrow"
    )


def erdos_gallai_slack(degrees) -> pa.Table:
    """Erdős–Gallai graphicality certificate (igraph
    ``igraph_is_graphical`` surface) for a degree sequence.

    For the sequence sorted descending d_1 >= ... >= d_n, row k holds
    ``lhs = sum_{i<=k} d_i``, ``rhs = k(k-1) + sum_{i>k} min(d_i, k)``
    and ``slack = rhs - lhs``; the sequence is graphical iff the total
    degree is even and every slack >= 0 (Erdős–Gallai 1960).  All
    int64 — the per-k table is bitwise-reproducible in SQL.

    Vectorized O(n log n): the suffix split between the min(d_i,k)=k
    and =d_i regimes is a searchsorted on the descending tail.
    """
    import numpy as np

    d = np.sort(np.asarray(degrees, dtype=np.int64))[::-1]
    n = len(d)
    if n == 0:
        return pa.table(
            {
                "k": pa.array([], pa.int64()),
                "lhs": pa.array([], pa.int64()),
                "rhs": pa.array([], pa.int64()),
                "slack": pa.array([], pa.int64()),
            }
        )
    csum = np.cumsum(d)
    total = int(csum[-1])
    ks = np.arange(1, n + 1, dtype=np.int64)
    lhs = csum
    # for each k: c = #{i > k : d_i >= k} — d[k:] is descending, so
    # c is the insertion point of k in the negated (ascending) tail
    asc = -d  # ascending
    rhs = np.empty(n, dtype=np.int64)
    for j in range(n):
        k = j + 1
        tail = asc[k:]
        c = int(np.searchsorted(tail, -k, side="right"))
        tail_sum = total - int(csum[k - 1])
        big_sum = (int(csum[k - 1 + c]) - int(csum[k - 1])) if c else 0
        rhs[j] = k * (k - 1) + c * k + (tail_sum - big_sum)
    return pa.table(
        {
            "k": pa.array(ks),
            "lhs": pa.array(lhs),
            "rhs": pa.array(rhs),
            "slack": pa.array(rhs - lhs),
        }
    )


def havel_hakimi_realize(degrees) -> pa.Table:
    """Havel–Hakimi degree-sequence realization (igraph
    ``igraph_realize_degree_sequence``; ``nx.havel_hakimi_graph``
    family): returns a simple-graph edge table ``(src, dst)`` whose
    vertex i has exactly ``degrees[i]`` neighbours, or raises
    ``ValueError`` when the sequence is not graphical.

    Greedy: repeatedly connect the largest remaining stub count to the
    next-largest ones (lazy max-heap keyed (remaining, vid) with
    deterministic vid tie-break).  The construction itself is
    sequential over the O(V) sequence — the heavy validation (the
    realized table's degree histogram equals the input histogram) is
    done distributedly by the calling query.
    """
    import heapq

    import numpy as np

    d = np.asarray(degrees, dtype=np.int64)
    n = len(d)
    if (d < 0).any() or int(d.sum()) % 2 == 1 or (n > 0 and (d >= n).any()):
        raise ValueError("havel_hakimi: not graphical")
    heap = [(-int(d[i]), i) for i in range(n) if d[i] > 0]
    heapq.heapify(heap)
    src_out: list[int] = []
    dst_out: list[int] = []
    while heap:
        negd, v = heapq.heappop(heap)
        k = -negd
        grabbed = []
        for _ in range(k):
            if not heap:
                raise ValueError("havel_hakimi: not graphical")
            grabbed.append(heapq.heappop(heap))
        for negd2, w in grabbed:
            src_out.append(v)
            dst_out.append(w)
            if negd2 + 1 < 0:
                heapq.heappush(heap, (negd2 + 1, w))
    return pa.table(
        {
            "src": pa.array(src_out, pa.int64()),
            "dst": pa.array(dst_out, pa.int64()),
        }
    )
