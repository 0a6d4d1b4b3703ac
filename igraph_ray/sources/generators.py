"""Deterministic distributed random-graph generators.

igraph ships a large generator surface (``igraph_erdos_renyi_game_gnm``,
``igraph_static_power_law_game``, the Graph500/R-MAT family via
published recursive-matrix sampling); this module provides the
distributed, reproducible equivalents.  Every generator is expressed
as ``ray.data.range(m)`` → ``map_batches`` so edge production is
embarrassingly parallel: a block generates exactly the edges whose
indices it owns, from stateless splitmix64 hashes of (seed, index) —
no RNG state, no inter-task coordination, byte-identical across runs,
block sizes and cluster shapes.  At 10^9+ edges the generator is
therefore a streaming source like any parquet read: blocks flow into
downstream pipelines with backpressure and never materialize centrally.

- :func:`gnm_edges` — uniform simple G(n, m): a 4-round Feistel
  network over the pair-index domain ``n*(n-1)/2`` (cycle-walking for
  the non-power-of-two domain) gives a pseudorandom *permutation*, so
  the first m indices decode to exactly m DISTINCT loop-free
  undirected pairs — sampling without replacement, no dedup shuffle.
- :func:`rmat_edges` — R-MAT / Graph500 recursive-matrix sampling
  (Chakrabarti et al. 2004): per edge, ``scale`` quadrant draws from
  hash uniforms; heavy-tailed degrees, multi-edges allowed (as in the
  reference formulation).
- :func:`chung_lu_edges` — static power-law sampling à la
  ``igraph_static_power_law_game``: both endpoints drawn independently
  ∝ rank^(-alpha) via the closed-form continuous inverse CDF;
  self-loops dropped.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.utils import hash_int64

_U64 = np.uint64


def _hash2(x: np.ndarray, salt: int, seed: int) -> np.ndarray:
    """Stateless uniform uint64 per element: splitmix of (x, salt, seed)."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) ^ (
            _U64(salt) * _U64(0x9E3779B97F4A7C15)
            ^ _U64(seed) * _U64(0xC2B2AE3D27D4EB4F)
        )
    return hash_int64(z.view(np.int64))


def _ids(batch: pa.Table) -> np.ndarray:
    return batch.column("id").to_numpy(zero_copy_only=False).astype(np.uint64)


# --------------------------------------------------------------------
# G(n, m): Feistel permutation over the unordered-pair domain
# --------------------------------------------------------------------


def _feistel_permute(
    idx: np.ndarray, domain: int, seed: int, rounds: int = 4
) -> np.ndarray:
    """Pseudorandom permutation of [0, domain) via a balanced Feistel
    network with cycle-walking; vectorized, deterministic."""
    half_bits = max(1, (max(domain - 1, 1).bit_length() + 1) // 2)
    mask = _U64((1 << half_bits) - 1)
    out = idx.astype(np.uint64)
    pending = np.ones(len(out), dtype=bool)
    while pending.any():
        v = out[pending]
        left = (v >> _U64(half_bits)) & mask
        right = v & mask
        for r in range(rounds):
            f = _hash2(right, 101 + r, seed) & mask
            left, right = right, left ^ f
        v = (left << _U64(half_bits)) | right
        out[pending] = v
        pending = out >= _U64(domain)  # cycle-walk out-of-domain values
    return out


def _pair_decode(t: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Lexicographic unordered-pair index → (u, v) with u < v:
    t = u*n - u*(u+1)/2 + (v - u - 1).  Float estimate + integer
    correction (exact for any n that fits the domain in int64)."""
    tf = t.astype(np.float64)
    u = np.floor(n - 0.5 - np.sqrt((n - 0.5) ** 2 - 2.0 * tf)).astype(np.int64)
    u = np.clip(u, 0, n - 2)
    # integer correction: move u until start(u) <= t < start(u+1)
    def start(uu: np.ndarray) -> np.ndarray:
        return uu * n - (uu * (uu + 1)) // 2

    ti = t.astype(np.int64)
    for _ in range(4):
        too_hi = start(u) > ti
        u[too_hi] -= 1
        too_lo = start(u + 1) <= ti
        u[too_lo] += 1
        if not (too_hi.any() or too_lo.any()):
            break
    v = ti - start(u) + u + 1
    return u, v


def gnm_edges(
    n: int, m: int, seed: int = 0, override_num_blocks: int | None = None
) -> ray.data.Dataset:
    """Uniform simple undirected G(n, m): exactly ``m`` distinct
    loop-free pairs ``(src < dst)``, sampled without replacement via a
    Feistel permutation of the pair-index domain."""
    domain = n * (n - 1) // 2
    if m > domain:
        raise ValueError(f"m={m} exceeds the {domain} possible pairs")

    def gen(batch: pa.Table) -> pa.Table:
        t = _feistel_permute(_ids(batch), domain, seed)
        u, v = _pair_decode(t, n)
        return pa.table({"src": pa.array(u), "dst": pa.array(v)})

    rng = ray.data.range(m, override_num_blocks=override_num_blocks)
    return rng.map_batches(gen, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------
# R-MAT (Graph500 kernel-1 style)
# --------------------------------------------------------------------


def rmat_edges(
    scale: int,
    m: int,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 0,
    override_num_blocks: int | None = None,
) -> ray.data.Dataset:
    """R-MAT directed edges over ``n = 2**scale`` vertices: per edge,
    ``scale`` independent quadrant draws with probabilities
    (a, b, c, 1-a-b-c); multi-edges and loops possible (reference
    semantics — collapse downstream if a simple graph is needed)."""
    if not 0 < a + b + c < 1:
        raise ValueError("need a + b + c in (0, 1)")

    def gen(batch: pa.Table) -> pa.Table:
        ids = _ids(batch)
        src = np.zeros(len(ids), np.int64)
        dst = np.zeros(len(ids), np.int64)
        for level in range(scale):
            u01 = _hash2(ids, 7919 + level, seed).astype(np.float64) / 2.0**64
            right = (u01 >= a + b) & (u01 < a + b + c) | (u01 >= a + b + c)
            down = (u01 >= a) & (u01 < a + b) | (u01 >= a + b + c)
            src = (src << 1) | right.astype(np.int64)
            dst = (dst << 1) | down.astype(np.int64)
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    rng = ray.data.range(m, override_num_blocks=override_num_blocks)
    return rng.map_batches(gen, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------
# Chung–Lu static power-law sampling
# --------------------------------------------------------------------


def chung_lu_edges(
    n: int,
    m: int,
    alpha: float = 2.5,
    seed: int = 0,
    override_num_blocks: int | None = None,
) -> ray.data.Dataset:
    """Power-law edge sampling (igraph ``static_power_law_game``
    semantics): both endpoints of each edge drawn independently with
    probability ∝ (rank + 1)^(-1/(alpha-1)) via the closed-form
    continuous inverse CDF; self-loops dropped (row count may be
    slightly under ``m``)."""
    if alpha <= 2:
        raise ValueError("alpha must exceed 2 (finite-mean regime)")
    # endpoint weights w_i = (i + i0)^(-gamma), gamma = 1/(alpha-1)
    gamma = 1.0 / (alpha - 1.0)
    i0 = 1.0
    p = 1.0 - gamma  # CDF exponent (gamma < 1 for alpha > 2)
    lo = i0**p
    hi = (n + i0) ** p

    def draw(ids: np.ndarray, salt: int) -> np.ndarray:
        u01 = _hash2(ids, salt, seed).astype(np.float64) / 2.0**64
        x = (lo + u01 * (hi - lo)) ** (1.0 / p) - i0
        return np.clip(x.astype(np.int64), 0, n - 1)

    def gen(batch: pa.Table) -> pa.Table:
        ids = _ids(batch)
        src = draw(ids, 11)
        dst = draw(ids, 23)
        keep = src != dst
        return pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})

    rng = ray.data.range(m, override_num_blocks=override_num_blocks)
    return rng.map_batches(gen, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------
# Watts–Strogatz small-world rewiring
# --------------------------------------------------------------------


def watts_strogatz_edges(
    n: int,
    k: int,
    beta: float,
    seed: int = 0,
    override_num_blocks: int | None = None,
) -> ray.data.Dataset:
    """Watts–Strogatz small-world graph (igraph
    ``igraph_watts_strogatz_game`` / ``nx.watts_strogatz_graph``
    semantics): start from the ring lattice where each vertex i links
    to its k/2 clockwise neighbours (undirected, emitted once as
    ``src = i``, ``dst = (i + j) % n``), then rewire each edge's dst
    with probability ``beta`` to a uniform random vertex (self-loops
    and the original endpoint re-drawn via a salted second draw —
    duplicates possible, as in the reference; collapse downstream for
    a simple graph).

    Fully deterministic (splitmix64-salted per-edge draws) and
    embarrassingly parallel: each of the ``n*k/2`` edge slots is
    generated independently from its index — no sequential state, any
    scale, stable under any partitioning.
    """
    if k <= 0 or k % 2:
        raise ValueError("k must be positive and even")
    if not 0 <= beta <= 1:
        raise ValueError("beta must be in [0, 1]")
    half = k // 2
    m = n * half

    def gen(batch: pa.Table) -> pa.Table:
        ids = _ids(batch)
        i = ids // half
        j = ids % half + 1
        src = i
        dst = (i + j) % n
        u01 = _hash2(ids, 104729, seed).astype(np.float64) / 2.0**64
        rewire = u01 < beta
        # two independent target draws; take the second when the first
        # hits src OR the original endpoint (cheap collision dodge —
        # a residual collision after both draws is kept, matching
        # "loops/duplicates possible" semantics)
        t1 = (_hash2(ids, 1299709, seed) % np.uint64(n)).astype(np.int64)
        t2 = (_hash2(ids, 15485863, seed) % np.uint64(n)).astype(np.int64)
        target = np.where((t1 == src) | (t1 == dst), t2, t1)
        dst = np.where(rewire, target, dst)
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    rng = ray.data.range(m, override_num_blocks=override_num_blocks)
    return rng.map_batches(gen, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------
# Barabási–Albert preferential attachment
# --------------------------------------------------------------------


def barabasi_albert_edges(
    n: int,
    d: int,
    seed: int = 0,
    override_num_blocks: int | None = None,
) -> ray.data.Dataset:
    """Barabási–Albert preferential-attachment graph (igraph
    ``igraph_barabasi_game`` / ``nx.barabasi_albert_graph``
    semantics): ``n`` vertices, each new vertex attaching ``d`` edges
    to existing vertices with probability proportional to degree.

    Uses the Batagelj–Brandes (2005) linear-time construction: edge
    slot ``e`` writes ``M[2e] = e // d`` (its source) and ``M[2e+1] =
    M[r_e]`` with ``r_e`` uniform in ``[0, 2e)`` — picking a uniform
    earlier *endpoint* IS degree-proportional sampling.  Because
    ``r_e`` here is a pure splitmix64 function of ``e``, the
    recursion resolves by a stateless pointer chase (expected
    O(log) hops), so every edge is generated independently of all
    others — communication-free and scale-invariant under any
    partitioning (the same trick as Sanders–Schulz communication-free
    generators).  Self-loops and duplicate edges are possible exactly
    as in Batagelj–Brandes; collapse downstream for a simple graph.
    """
    if d <= 0:
        raise ValueError("d must be positive")
    m = n * d

    def gen(batch: pa.Table) -> pa.Table:
        ids = _ids(batch)
        src = ids // d
        s = 2 * ids + 1
        out = np.full(len(ids), -1, np.int64)
        while True:
            undone = out < 0
            if not undone.any():
                break
            even = undone & (s % 2 == 0)
            out[even] = (s[even] // 2) // d
            undone = out < 0
            idx = np.flatnonzero(undone)
            if len(idx) == 0:
                break
            e = (s[idx] - 1) // 2
            zero = e == 0
            out[idx[zero]] = 0  # edge 0 has no earlier slot: loop on 0
            rem = idx[~zero]
            enz = e[~zero]
            s[rem] = (
                _hash2(enz, 32452843, seed) % (2 * enz).astype(np.uint64)
            ).astype(np.int64)
        return pa.table(
            {"src": pa.array(src.astype(np.int64)), "dst": pa.array(out)}
        )

    rng = ray.data.range(m, override_num_blocks=override_num_blocks)
    return rng.map_batches(gen, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------
# Configuration model (degree-sequence game)
# --------------------------------------------------------------------


def configuration_model_edges(
    degrees: np.ndarray,
    vids: np.ndarray | None = None,
    seed: int = 0,
    override_num_blocks: int | None = None,
) -> ray.data.Dataset:
    """Configuration-model random multigraph with EXACTLY the given
    degree sequence (igraph ``degree_sequence_game`` /
    ``nx.configuration_model`` semantics — self-loops and parallel
    edges possible, as in the reference; simplify downstream).

    Construction: vertex ``v`` owns ``deg(v)`` stubs at global indices
    ``[off(v), off(v)+deg(v))``; a Feistel permutation π of the stub
    domain pairs stub ``π(2j)`` with ``π(2j+1)`` — a uniform perfect
    matching, with edge ``j`` computed independently of all others
    (communication-free, partition-invariant, deterministic).  Stub →
    owner is one ``searchsorted`` against the broadcast offset array
    (O(V) — the generator's documented bound, same class as the
    vertex-id broadcast).
    """
    degrees = np.asarray(degrees, np.int64)
    if vids is None:
        vids = np.arange(len(degrees), dtype=np.int64)
    vids = np.asarray(vids, np.int64)
    total = int(degrees.sum())
    if total % 2:
        raise ValueError("degree sequence must have an even sum")
    offsets = np.concatenate([[0], np.cumsum(degrees)])
    oref = ray.put((offsets, vids))
    m = total // 2

    def gen(batch: pa.Table) -> pa.Table:
        offs, vv = ray.get(oref)
        j = _ids(batch)
        s1 = _feistel_permute(2 * j, total, seed)
        s2 = _feistel_permute(2 * j + 1, total, seed)
        src = vv[np.searchsorted(offs, s1.astype(np.int64), "right") - 1]
        dst = vv[np.searchsorted(offs, s2.astype(np.int64), "right") - 1]
        return pa.table(
            {
                "src": pa.array(src.astype(np.int64)),
                "dst": pa.array(dst.astype(np.int64)),
            }
        )

    rng = ray.data.range(m, override_num_blocks=override_num_blocks)
    return rng.map_batches(gen, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------
# Geometric random graph (igraph grg_game)
# --------------------------------------------------------------------


def grg_edges(
    n: int,
    radius: float,
    seed: int = 0,
    override_num_blocks: int | None = None,
) -> ray.data.Dataset:
    """Geometric random graph (igraph ``grg_game``): ``n`` points
    hash-uniform in the unit square, undirected edge iff Euclidean
    distance <= ``radius``.  Positions are stateless splitmix64 draws
    (``x_i = splitmix64(i ⊕ KX) · 2⁻⁶⁴``), so the construction is
    deterministic, communication-free, and bit-replayable in SQL.

    Distributed shape — a grid-bucketed self-radius-join: the unit
    square is cut into ``g×g`` cells of side ``1/g >= radius``; each
    point is replicated to its home cell + 8 neighbours (bounded 9×
    fanout); candidate pairs exist only inside a cell; a qualifying
    pair is emitted by exactly ONE cell (the row-major minimum of the
    two home cells), so no global dedup shuffle is needed.  ONE
    shuffle on the cell id; per-cell occupancy is O(n·radius²) — the
    broadcasted distance matrix stays tiny as n grows with constant
    expected degree.
    """
    if not (0.0 < radius < 1.0):
        raise ValueError("radius must be in (0, 1)")
    g = max(1, int(1.0 / radius))  # cell side 1/g >= radius
    r2 = radius * radius
    scale = 2.0**-64

    def points(batch: pa.Table) -> pa.Table:
        i = _ids(batch)
        x = _hash2(i, 1, seed).astype(np.float64) * scale
        y = _hash2(i, 2, seed).astype(np.float64) * scale
        cx = np.minimum((x * g).astype(np.int64), g - 1)
        cy = np.minimum((y * g).astype(np.int64), g - 1)
        home = cy * g + cx
        # replicate to the 3x3 neighbourhood (clipped at the border)
        outs = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nx_, ny_ = cx + dx, cy + dy
                ok = (nx_ >= 0) & (nx_ < g) & (ny_ >= 0) & (ny_ < g)
                outs.append(
                    (
                        (ny_[ok] * g + nx_[ok]),
                        home[ok],
                        i[ok].astype(np.int64),
                        x[ok],
                        y[ok],
                    )
                )
        cell = np.concatenate([o[0] for o in outs])
        return pa.table(
            {
                "cell": pa.array(cell),
                "home": pa.array(np.concatenate([o[1] for o in outs])),
                "vid": pa.array(np.concatenate([o[2] for o in outs])),
                "x": pa.array(np.concatenate([o[3] for o in outs])),
                "y": pa.array(np.concatenate([o[4] for o in outs])),
            }
        )

    def close_pairs(group: pa.Table) -> pa.Table:
        cell = int(group.column("cell")[0].as_py())
        vid = group.column("vid").to_numpy(zero_copy_only=False)
        home = group.column("home").to_numpy(zero_copy_only=False)
        x = group.column("x").to_numpy(zero_copy_only=False)
        y = group.column("y").to_numpy(zero_copy_only=False)
        k = len(vid)
        if k < 2:
            return pa.table(
                {
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                }
            )
        ii, jj = np.triu_indices(k, k=1)
        dx = x[ii] - x[jj]
        dy = y[ii] - y[jj]
        near = dx * dx + dy * dy <= r2
        owner = np.minimum(home[ii], home[jj]) == cell
        sel = near & owner & (vid[ii] != vid[jj])
        a, b = vid[ii][sel], vid[jj][sel]
        return pa.table(
            {
                "src": pa.array(np.minimum(a, b)),
                "dst": pa.array(np.maximum(a, b)),
            }
        )

    pts = ray.data.range(
        n, override_num_blocks=override_num_blocks
    ).map_batches(points, batch_format="pyarrow", zero_copy_batch=True)
    return pts.groupby("cell").map_groups(
        close_pairs, batch_format="pyarrow"
    )


# --------------------------------------------------------------------
# Stochastic block model (igraph sbm_game)
# --------------------------------------------------------------------


def sbm_edges(
    block_sizes: list[int],
    pref_matrix: list[list[float]],
    seed: int = 0,
    override_num_blocks: int | None = None,
) -> ray.data.Dataset:
    """Stochastic block model (igraph ``igraph_sbm_game``, undirected
    simple): vertices ``0..n-1`` assigned to contiguous blocks of the
    given sizes (igraph's convention); each unordered pair ``u < v``
    is kept independently with probability
    ``pref_matrix[b(u)][b(v)]``.

    Per-pair decision is stateless: with ``t`` the lexicographic pair
    index, keep iff ``splitmix64(t ⊕ C(seed)) >> 11 < ⌊p·2⁵³⌋`` — no
    RNG state, so the edge set is bitwise identical across runs, block
    sizes and cluster shapes, and replayable in SQL.

    Distributed shape: one communication-free ``map_batches`` over the
    pair-index domain ``n(n−1)/2`` — O(n²) hash evaluations total,
    embarrassingly parallel, no shuffle.  That bound is fine for the
    dense/Bernoulli regime the SBM models; for sparse giant graphs
    generate per-block-pair edge COUNTS and use :func:`gnm_edges` per
    block pair instead (same Feistel machinery, O(m) work).
    """
    sizes = np.asarray(block_sizes, np.int64)
    if (sizes <= 0).any():
        raise ValueError("block sizes must be positive")
    P = np.asarray(pref_matrix, np.float64)
    k = len(sizes)
    if P.shape != (k, k):
        raise ValueError(f"pref_matrix must be {k}x{k}")
    if not np.allclose(P, P.T):
        raise ValueError("pref_matrix must be symmetric (undirected)")
    if ((P < 0) | (P > 1)).any():
        raise ValueError("probabilities must be in [0, 1]")
    n = int(sizes.sum())
    domain = n * (n - 1) // 2
    starts = np.concatenate([[0], np.cumsum(sizes)])
    # exact 53-bit integer thresholds — the shared constant both the
    # numpy path and the SQL twin compare against
    thr53 = np.array(
        [[min(1 << 53, int(p * (1 << 53))) for p in row] for row in P],
        np.int64,
    )

    def gen(batch: pa.Table) -> pa.Table:
        t = _ids(batch)
        u, v = _pair_decode(t, n)
        bu = np.searchsorted(starts, u, side="right") - 1
        bv = np.searchsorted(starts, v, side="right") - 1
        r53 = (_hash2(t, 7, seed) >> _U64(11)).astype(np.int64)
        keep = r53 < thr53[bu, bv]
        return pa.table(
            {"src": pa.array(u[keep]), "dst": pa.array(v[keep])}
        )

    rng = ray.data.range(domain, override_num_blocks=override_num_blocks)
    return rng.map_batches(gen, batch_format="pyarrow", zero_copy_batch=True)
