"""Leading-eigenvector community detection (Newman 2006, "Finding
community structure in networks using the eigenvectors of matrices",
PRE 74, 036104) — the igraph ``community_leading_eigenvector``
surface.

Recursive spectral bisection on the modularity matrix ``B_ij = A_ij -
k_i k_j / 2m``: for a group g the generalized matrix is ``B^(g)_ij =
B_ij - delta_ij * sum_{k in g} B_ik`` (paper eq. 6); the group splits
by the SIGN of the leading eigenvector of ``B^(g)``, and is declared
indivisible when the leading eigenvalue is non-positive or the split's
modularity gain ``dQ = s^T B^(g) s / 4m`` (paper eq. 5) is
non-positive.  No Kernighan-Lin fine-tuning pass is applied (igraph's
default is likewise plain ARPACK splits).

Eigenvectors come from Gershgorin-shifted power iteration with a
deterministic start vector (never materializing ``B^(g)``: the matvec
is ``A_g x - k_g (k_g . x)/2m - d_g * x`` with sparse segment
arithmetic), so the routine is O(E) memory.  Sign convention: the
entry of largest |value| is made positive (smallest index on ties).

Distributed shape — DOCUMENTED BOUNDED-GATHER operator (policy of
``community_extra``): the recursion pops one group at a time and each
split needs a converged global eigenvector, an inherently sequential
outer loop.  The symmetrize/collapse shuffle runs on the cluster; the
collapsed one-arc table ships to ONE Ray task via block refs.
``gather_max_arcs`` (default 50M) is the declared boundary; the
matvec itself is linear, so groups far beyond the dense-eigh reach
are fine.

Oracle: ``tests/test_leading_eigen.py`` — an independent dense
``np.linalg.eigh`` reference recursion must produce the identical
partition on graphs with well-separated leading eigenvalues; planted
partitions recovered; final Q cross-checked vs nx modularity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.stages.symmetrize import symmetrize_dedup

GATHER_MAX_ARCS_LE = 50_000_000
_POWER_TOL = 1e-13
_POWER_MAX_IT = 100_000


def _leading_eigen_py(
    vids: np.ndarray,
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    max_communities: int = 0,
) -> tuple[np.ndarray, float]:
    """Recursive leading-eigenvector bisection on the canonical
    one-arc view (src <= dst, parallel arcs pre-summed; self-loops
    allowed).  Returns ``(labels (min member vid), Q)``.
    ``max_communities <= 0`` means unbounded (split until
    indivisible)."""
    n = len(vids)
    a = np.searchsorted(vids, src).astype(np.int64)
    b = np.searchsorted(vids, dst).astype(np.int64)
    loop = a == b
    k = np.zeros(n, dtype=np.float64)
    np.add.at(k, a, np.where(loop, 2.0 * w, w))
    np.add.at(k, b[~loop], w[~loop])
    m = float(w.sum())
    if m <= 0:
        raise ValueError("leading_eigenvector requires positive weight")
    two_m = 2.0 * m

    # CSR-ish arc arrays, both directions for the matvec
    av = np.concatenate([a[~loop], b[~loop], a[loop]])
    aw = np.concatenate([b[~loop], a[~loop], a[loop]])
    ww = np.concatenate([w[~loop], w[~loop], 2.0 * w[loop]])

    labels = np.zeros(n, dtype=np.int64)  # group id per vertex
    next_label = 1
    stack = [0]
    done: list[int] = []

    while stack:
        g = stack.pop()
        idx = np.flatnonzero(labels == g)
        if len(idx) <= 1:
            done.append(g)
            continue
        if max_communities > 0 and next_label >= max_communities:
            # total group count (labels 0..next_label-1) hit the cap
            done.append(g)
            continue
        in_g = np.zeros(n, dtype=bool)
        in_g[idx] = True
        sel = in_g[av] & in_g[aw]
        gav, gaw, gww = av[sel], aw[sel], ww[sel]
        # local index within the group
        pos = np.full(n, -1, dtype=np.int64)
        pos[idx] = np.arange(len(idx))
        lv, lw_ = pos[gav], pos[gaw]
        kg = k[idx]
        Kg = float(kg.sum())
        ng = len(idx)
        # row sums of B over the group: d_i = (A_g 1)_i - k_i Kg / 2m
        arow = np.zeros(ng, dtype=np.float64)
        np.add.at(arow, lv, gww)
        d = arow - kg * Kg / two_m

        def matvec(x: np.ndarray) -> np.ndarray:
            y = np.zeros(ng, dtype=np.float64)
            np.add.at(y, lv, gww * x[lw_])
            y -= kg * float(kg @ x) / two_m
            y -= d * x
            return y

        # Gershgorin shift: all eigenvalues of B^(g)+sigma*I >= 0
        absrow = arow + kg * Kg / two_m + np.abs(d)
        sigma = float(absrow.max()) + 1.0
        x = np.ones(ng, dtype=np.float64)
        x += np.arange(ng) * (1.0 / max(ng, 1)) * 1e-3  # break symmetry
        x /= np.linalg.norm(x)
        lam = 0.0
        for _ in range(_POWER_MAX_IT):
            y = matvec(x) + sigma * x
            ny = np.linalg.norm(y)
            if ny == 0.0:
                break
            y /= ny
            if np.linalg.norm(y - x) < _POWER_TOL:
                x = y
                break
            x = y
        lam = float(x @ matvec(x))  # Rayleigh quotient on B^(g)
        # deterministic sign: largest |entry| positive
        piv = int(np.argmax(np.abs(x)))
        if x[piv] < 0:
            x = -x
        s = np.where(x >= 0.0, 1.0, -1.0)
        dq = float(s @ matvec(s)) / (2.0 * two_m)
        if lam <= 1e-10 or dq <= 1e-12 or len(set(s)) < 2:
            done.append(g)
            continue
        # split: negative side gets a fresh label
        neg = idx[s < 0.0]
        labels[neg] = next_label
        stack.append(g)
        stack.append(next_label)
        next_label += 1

    # modularity of the final labelling
    same = labels[av] == labels[aw]
    intra = float(ww[same].sum()) / 2.0  # both directions summed
    Ksum = np.zeros(next_label, dtype=np.float64)
    np.add.at(Ksum, labels, k)
    Q = intra / m - float(((Ksum / two_m) ** 2).sum())

    # canonical community ids: min member vid
    out = np.empty(n, dtype=np.int64)
    min_member: dict[int, int] = {}
    for i in range(n):
        c = int(labels[i])
        if c not in min_member or vids[i] < min_member[c]:
            min_member[c] = int(vids[i])
    for i in range(n):
        out[i] = min_member[int(labels[i])]
    return out, float(Q)


def _concat_nonempty(tables: list[pa.Table]) -> pa.Table:
    live = [t for t in tables if t.num_rows]
    if not live:
        raise ValueError("bounded-gather input has no rows")
    return pa.concat_tables(live)


@ray.remote
def _leading_eigen_task(blocks, max_communities: int):
    tbl = _concat_nonempty(ray.get(list(blocks)))
    src = tbl.column("src").to_numpy(zero_copy_only=False)
    dst = tbl.column("dst").to_numpy(zero_copy_only=False)
    w = tbl.column("weight").to_numpy(zero_copy_only=False)
    keep = src <= dst
    src, dst, w = src[keep], dst[keep], w[keep]
    vids = np.unique(np.concatenate([src, dst]))
    labels, Q = _leading_eigen_py(vids, src, dst, w, max_communities)
    out = pa.table({"vid": pa.array(vids), "community": pa.array(labels)})
    return out, Q


def leading_eigenvector(
    edges: ray.data.Dataset,
    max_communities: int = 0,
    gather_max_arcs: int = GATHER_MAX_ARCS_LE,
) -> tuple[ray.data.Dataset, float]:
    """Newman leading-eigenvector communities over the undirected
    weighted view of ``edges`` (igraph
    ``community_leading_eigenvector``).  Returns ``(assignment, Q)``;
    assignment rows ``(vid, community)``, community = min member vid.
    """
    arcs = symmetrize_dedup(edges, keep_self_loops=True).materialize()
    n_arcs = arcs.count()
    if n_arcs > gather_max_arcs:
        raise NotImplementedError(
            f"leading_eigenvector bounded-gather limit: {n_arcs} arcs "
            f"> {gather_max_arcs}; run on a quotient/component "
            "subgraph or raise gather_max_arcs"
        )
    refs = arcs.to_arrow_refs()
    out, Q = ray.get(_leading_eigen_task.remote(refs, max_communities))
    return ray.data.from_arrow(out), Q
