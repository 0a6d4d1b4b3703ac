"""Skip-gram-with-negative-sampling (SGNS) embedding trainer over the
walk corpus emitted by ``kernels/walks.py`` — the DeepWalk / node2vec
step 2 (Perozzi et al. 2014; Grover & Leskovec 2016; Mikolov et al.
2013 for the SGNS objective).

Distributed shape — the repo's broadcast-model + gradient-partials
pattern (same as ``functions/quality_model.py``):

- the embedding matrices ``W`` (input/center) and ``C``
  (output/context) for the BOUNDED vocabulary (vertex set under the
  broadcast cap) ship once per round via ``ray.put``;
- each walk batch vectorizes pair extraction (all ``|i-j| <= window``
  offsets of the fixed-width walk matrix), draws deterministic
  negatives (splitmix64 over (pair, k, round, seed) — uniform over
  the vocab, a documented simplification of word2vec's unigram^0.75
  table), computes the exact SGNS gradient of its pairs against the
  broadcast snapshot, and emits SPARSE per-vertex gradient partials
  (touched rows only) plus its loss contribution;
- partials reduce by vertex in a rows-bucketed
  ``groupby(bucket).map_groups`` segment sum (one shuffle per round),
  the driver applies one synchronous full-batch Adagrad update
  (per-coordinate accumulated-square scaling, Duchi et al. 2011 —
  the diagonal preconditioner makes full-batch rounds competitive
  with sequential SGD passes), and re-broadcasts.

Synchronous full-batch rounds are chosen over Hogwild-style async
updates deliberately: updates are deterministic (bitwise reproducible
runs, the engine-wide contract) at the cost of more rounds than
sequential word2vec — each round is one pass over all pairs.  Loss
can tick up slightly between rounds because negatives are re-drawn
per round (the per-round objective changes); the trend on a fixed
corpus is strongly decreasing, which is what the oracle asserts.

Oracle: ``tests/test_embeddings.py`` — strong loss decrease and
bitwise determinism on a fixed corpus, and planted-community
recovery on an SBM fixture (intra-block cosine margin over
inter-block must beat the random init by a wide margin).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray
import ray.data

from igraph_ray.utils import hash_int64

BROADCAST_MAX_VOCAB = 5_000_000  # W+C float32 at d=64: ~2.6 GB


@dataclass
class SkipgramResult:
    embeddings: pa.Table  # (vid, embedding: list<float64>)
    loss_history: list[float] = field(default_factory=list)


def _pairs_from_walks(
    walks: np.ndarray, window: int
) -> tuple[np.ndarray, np.ndarray]:
    """All (center, context) pairs with offset 1..window from a walk
    matrix (rows = walks, cols = steps, -1 = retired), both ends
    live.  Vectorized over the whole batch; symmetric pairs emitted
    both ways (word2vec semantics)."""
    centers, contexts = [], []
    n, L = walks.shape
    for off in range(1, window + 1):
        if off >= L:
            break
        a = walks[:, :-off].ravel()
        b = walks[:, off:].ravel()
        live = (a >= 0) & (b >= 0)
        centers.append(a[live])
        contexts.append(b[live])
        centers.append(b[live])
        contexts.append(a[live])
    if not centers:
        e = np.empty(0, np.int64)
        return e, e
    return np.concatenate(centers), np.concatenate(contexts)


def _negatives(
    center: np.ndarray,
    pair_idx: np.ndarray,
    k: int,
    vocab: int,
    round_no: int,
    seed: int,
) -> np.ndarray:
    """(P, k) deterministic uniform negatives, re-drawn once if they
    collide with their pair's center (word2vec rejects self-hits)."""
    with np.errstate(over="ignore"):
        base = (
            hash_int64(pair_idx) * np.uint64(1315423911)
            + np.uint64(round_no) * np.uint64(2654435761)
            + np.uint64(seed)
        )
        cols = np.arange(k, dtype=np.uint64)
        draws = hash_int64(base[:, None] + cols[None, :] * np.uint64(97))
        neg = (draws % np.uint64(vocab)).astype(np.int64)
        redraw = neg == center[:, None]
        if redraw.any():
            neg2 = (
                hash_int64(draws[redraw] + np.uint64(0x5BF0_3635))
                % np.uint64(vocab)
            ).astype(np.int64)
            neg[redraw] = neg2
    return neg


class _GradientPartial:
    """Per-batch SGNS loss + sparse gradient partial against the
    broadcast (W, C) snapshot.  Used as a plain map_batches function
    (task-based — no actor-pool spin-up per round); the snapshot
    fetch is a local object-store read per task."""

    def __init__(self, ref, window, negatives, round_no, seed, num_buckets):
        self.ref = ref
        self.window = window
        self.negatives = negatives
        self.round_no = round_no
        self.seed = seed
        self.num_buckets = num_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        self.W, self.C = ray.get(self.ref)
        d = self.W.shape[1]
        vocab = self.W.shape[0]
        step_cols = [c for c in batch.column_names if c.startswith("p")]
        walks = np.stack(
            [
                batch.column(c).to_numpy(zero_copy_only=False)
                for c in step_cols
            ],
            axis=1,
        )
        center, context = _pairs_from_walks(walks, self.window)
        if len(center) == 0:
            return _empty_partial(d)
        # pair identity = content hash of (center, context): stable
        # under any block layout (identical pairs share negatives,
        # which keeps rounds bitwise reproducible across repartitions)
        with np.errstate(over="ignore"):
            pair_idx = hash_int64(center) * np.uint64(
                0x9E3779B1
            ) + hash_int64(context)
        neg = _negatives(
            center,
            pair_idx.astype(np.uint64),
            self.negatives,
            vocab,
            self.round_no,
            self.seed,
        )

        Wc = self.W[center]  # (P, d)
        Cpos = self.C[context]  # (P, d)
        Cneg = self.C[neg]  # (P, k, d)

        s_pos = 1.0 / (1.0 + np.exp(-np.einsum("pd,pd->p", Wc, Cpos)))
        s_neg = 1.0 / (
            1.0 + np.exp(-np.einsum("pd,pkd->pk", Wc, Cneg))
        )
        eps = 1e-12
        loss = float(
            -(np.log(s_pos + eps).sum())
            - np.log(1.0 - s_neg + eps).sum()
        )

        g_pos = s_pos - 1.0  # (P,)
        gW = g_pos[:, None] * Cpos + np.einsum(
            "pk,pkd->pd", s_neg, Cneg
        )
        gC_pos = g_pos[:, None] * Wc  # (P, d)
        gC_neg = s_neg[:, :, None] * Wc[:, None, :]  # (P, k, d)

        # SPARSE accumulation: per-task memory scales with rows
        # TOUCHED by this batch, never with the vocabulary (a dense
        # (vocab, d) scratch pair would be ~5 GB per task at the 5M
        # cap — the memory-contract violation flagged in round 4).
        # add.at visits indices in occurrence order either way, so
        # the per-row sums are bitwise identical to the dense form.
        P = len(center)
        allv = np.concatenate([center, context, neg.ravel()])
        u, inv = np.unique(allv, return_inverse=True)
        dW = np.zeros((len(u), d), np.float64)
        dC = np.zeros((len(u), d), np.float64)
        np.add.at(dW, inv[:P], gW)
        np.add.at(dC, inv[P : 2 * P], gC_pos)
        np.add.at(dC, inv[2 * P :], gC_neg.reshape(-1, d))

        nz = (dW != 0.0).any(axis=1) | (dC != 0.0).any(axis=1)
        touched = u[nz]
        dW, dC = dW[nz], dC[nz]
        loss_col = np.zeros(len(touched), np.float64)
        pairs_col = np.zeros(len(touched), np.float64)
        if len(touched):
            loss_col[0] = loss
            pairs_col[0] = float(len(center))
        return pa.table(
            {
                "bucket": pa.array(
                    (
                        hash_int64(touched)
                        % np.uint64(self.num_buckets)
                    ).astype(np.int32)
                ),
                "vid": pa.array(touched),
                "wg": pa.array(list(dW)),
                "cg": pa.array(list(dC)),
                "loss": pa.array(loss_col),
                "pairs": pa.array(pairs_col),
            }
        )


def _empty_partial(d: int) -> pa.Table:
    return pa.table(
        {
            "bucket": pa.array([], pa.int32()),
            "vid": pa.array([], pa.int64()),
            "wg": pa.array([], pa.list_(pa.float64())),
            "cg": pa.array([], pa.list_(pa.float64())),
            "loss": pa.array([], pa.float64()),
            "pairs": pa.array([], pa.float64()),
        }
    )


def _reduce_bucket(group: pa.Table) -> pa.Table:
    if group.num_rows == 0:
        return _empty_partial(1).drop_columns(["bucket", "pairs"])
    vid = group.column("vid").to_numpy(zero_copy_only=False)
    wg = np.stack(group.column("wg").to_numpy(zero_copy_only=False))
    cg = np.stack(group.column("cg").to_numpy(zero_copy_only=False))
    loss = group.column("loss").to_numpy(zero_copy_only=False)
    pairs = group.column("pairs").to_numpy(zero_copy_only=False)
    order = np.argsort(vid, kind="stable")
    vid, wg, cg = vid[order], wg[order], cg[order]
    first = np.empty(len(vid), bool)
    first[0] = True
    first[1:] = vid[1:] != vid[:-1]
    seg = np.flatnonzero(first)
    wg_sum = np.add.reduceat(wg, seg, axis=0)
    cg_sum = np.add.reduceat(cg, seg, axis=0)
    out_loss = np.zeros(len(seg))
    out_pairs = np.zeros(len(seg))
    if len(seg):
        out_loss[0] = float(loss.sum())
        out_pairs[0] = float(pairs.sum())
    return pa.table(
        {
            "vid": pa.array(vid[seg]),
            "wg": pa.array(list(wg_sum)),
            "cg": pa.array(list(cg_sum)),
            "loss": pa.array(out_loss),
            "pairs": pa.array(out_pairs),
        }
    )


def skipgram_embeddings(
    walks: ray.data.Dataset,
    num_vertices: int,
    dim: int = 32,
    window: int = 5,
    negatives: int = 5,
    rounds: int = 60,
    lr: float = 0.05,
    seed: int = 0,
) -> SkipgramResult:
    """Train SGNS embeddings over a walk corpus (rows ``walk_id,
    p0..pL``).  Returns per-vertex input embeddings (``W`` rows, the
    word2vec convention) and the per-round mean pair loss.

    ``num_vertices`` is the (dense-vid) vocabulary size.  Under the
    broadcast cap the model ships whole to every worker and the
    gradient reduction stays rows-bucketed and distributed; PAST the
    cap training routes to :func:`skipgram_embeddings_sharded`, which
    hash-slabs the model rows and ships each task only the two slabs
    its grid cell touches (GraphVite-style).  The update is
    synchronous full-batch Adagrad either way (see module docstring).
    """
    if num_vertices > BROADCAST_MAX_VOCAB:
        return skipgram_embeddings_sharded(
            walks,
            num_vertices,
            dim=dim,
            window=window,
            negatives=negatives,
            rounds=rounds,
            lr=lr,
            seed=seed,
        )
    rng = np.random.Generator(np.random.PCG64(seed))
    W = (rng.random((num_vertices, dim)) - 0.5) / dim
    C = np.zeros((num_vertices, dim), np.float64)
    GW = np.full((num_vertices, dim), 1e-8)
    GC = np.full((num_vertices, dim), 1e-8)
    num_buckets = max(2, num_vertices // 250_000 + 2)

    walks = walks.materialize()
    losses: list[float] = []
    for r in range(rounds):
        ref = ray.put((W, C))
        partials = (
            walks.map_batches(
                _GradientPartial(
                    ref, window, negatives, r, seed, num_buckets
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .groupby("bucket")
            .map_groups(_reduce_bucket, batch_format="pyarrow")
            .materialize()
        )
        total_loss = 0.0
        total_pairs = 0.0
        dW = np.zeros_like(W)
        dC = np.zeros_like(C)
        for t in partials.iter_batches(
            batch_format="pyarrow", batch_size=None
        ):
            if t.num_rows == 0:
                continue
            vid = t.column("vid").to_numpy(zero_copy_only=False)
            dW[vid] += np.stack(
                t.column("wg").to_numpy(zero_copy_only=False)
            )
            dC[vid] += np.stack(
                t.column("cg").to_numpy(zero_copy_only=False)
            )
            total_loss += float(
                t.column("loss").to_numpy(zero_copy_only=False).sum()
            )
            total_pairs += float(
                t.column("pairs").to_numpy(zero_copy_only=False).sum()
            )
        if total_pairs == 0:
            raise ValueError("walk corpus produced no skip-gram pairs")
        GW += dW**2
        GC += dC**2
        W -= lr * dW / np.sqrt(GW)
        C -= lr * dC / np.sqrt(GC)
        losses.append(total_loss / total_pairs)

    tbl = pa.table(
        {
            "vid": pa.array(np.arange(num_vertices, dtype=np.int64)),
            "embedding": pa.array(list(W)),
        }
    )
    return SkipgramResult(embeddings=tbl, loss_history=losses)


# ---------------------------------------------------------------------------
# Sharded trainer — vocabularies past the broadcast cap
# ---------------------------------------------------------------------------
#
# Model rows are range-slabbed into S shards (shard(v) = v // slab);
# each (center, context) pair lives in grid cell (shard(center),
# shard(context)).  Pairs are extracted ONCE, tagged with their cell,
# sorted by cell and materialized — so every round is one
# map_batches over near-cell-pure blocks (each task ray.gets only the
# W-slab and C-slab its cells touch; numpy slabs come out of the
# object store zero-copy, so concurrent tasks SHARE the plasma pages)
# plus the same rows-bucketed gradient reduce as the broadcast path.
#
# Negatives are drawn from the CONTEXT shard's vid range — the
# GraphVite partitioning trick (Zhu et al. 2019): it keeps each
# cell's working set to exactly two slabs.  This is a documented
# departure from the broadcast path's vocabulary-uniform negatives
# (each pair's negative distribution is uniform over one slab);
# with range-slabbed dense vids every slab is sampled by the pairs
# whose context lands there, and the SGNS objective remains a valid
# noise-contrastive estimate.  The update stays synchronous
# full-batch Adagrad, so there are no conflicting writes and no
# episode scheduling is needed — cells only READ the round-start
# snapshot.  Driver memory is O(V * d) for the model + optimizer
# state (the 15.6M-vertex north-star graph at d=64 fits in a few
# GB); past driver RAM the next step would be parameter-server
# actors, documented boundary.

SHARD_ROWS = 2_000_000  # model rows per slab (~1 GB W+C at d=64)


def _slab_of(v: np.ndarray, slab: int) -> np.ndarray:
    return v // slab


class _PairExtract:
    """walks batch -> (cell, center, context) pair rows."""

    def __init__(self, window: int, slab: int, num_shards: int):
        self.window = window
        self.slab = slab
        self.num_shards = num_shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        step_cols = [c for c in batch.column_names if c.startswith("p")]
        walks = np.stack(
            [
                batch.column(c).to_numpy(zero_copy_only=False)
                for c in step_cols
            ],
            axis=1,
        )
        center, context = _pairs_from_walks(walks, self.window)
        cell = (
            _slab_of(center, self.slab) * self.num_shards
            + _slab_of(context, self.slab)
        ).astype(np.int32)
        return pa.table(
            {
                "cell": pa.array(cell),
                "center": pa.array(center),
                "context": pa.array(context),
            }
        )


class _ShardGrad:
    """Per-batch SGNS loss + sparse gradient partials against the
    round-start SHARDED snapshot: rows are grouped by grid cell and
    each cell fetches only its two slabs (zero-copy plasma reads)."""

    def __init__(
        self,
        wrefs,
        crefs,
        slab,
        num_shards,
        num_vertices,
        negatives,
        round_no,
        seed,
        num_buckets,
        dim,
    ):
        self.wrefs = wrefs
        self.crefs = crefs
        self.slab = slab
        self.num_shards = num_shards
        self.num_vertices = num_vertices
        self.negatives = negatives
        self.round_no = round_no
        self.seed = seed
        self.num_buckets = num_buckets
        self.dim = dim

    def _cell_partial(self, center, context):
        """Gradient rows for one cell's pairs (same math as the
        broadcast `_GradientPartial`, slab-local lookups)."""
        i = int(center[0] // self.slab)
        j = int(context[0] // self.slab)
        Wi = ray.get(self.wrefs[i])
        Cj = ray.get(self.crefs[j])
        d = Wi.shape[1]
        j_lo = j * self.slab
        size_j = Cj.shape[0]

        with np.errstate(over="ignore"):
            pair_idx = hash_int64(center) * np.uint64(
                0x9E3779B1
            ) + hash_int64(context)
        # negatives: uniform over the CONTEXT shard's vid range
        # (GraphVite partitioning — see module comment)
        with np.errstate(over="ignore"):
            base = (
                hash_int64(pair_idx.astype(np.uint64))
                * np.uint64(1315423911)
                + np.uint64(self.round_no) * np.uint64(2654435761)
                + np.uint64(self.seed)
            )
            cols = np.arange(self.negatives, dtype=np.uint64)
            draws = hash_int64(
                base[:, None] + cols[None, :] * np.uint64(97)
            )
            neg_local = (draws % np.uint64(size_j)).astype(np.int64)
            neg = neg_local + j_lo
            redraw = neg == center[:, None]
            if redraw.any():
                n2 = (
                    hash_int64(draws[redraw] + np.uint64(0x5BF0_3635))
                    % np.uint64(size_j)
                ).astype(np.int64)
                neg_local[redraw] = n2
                neg = neg_local + j_lo

        Wc = Wi[center - i * self.slab]
        Cpos = Cj[context - j_lo]
        Cneg = Cj[neg_local]

        s_pos = 1.0 / (1.0 + np.exp(-np.einsum("pd,pd->p", Wc, Cpos)))
        s_neg = 1.0 / (
            1.0 + np.exp(-np.einsum("pd,pkd->pk", Wc, Cneg))
        )
        eps = 1e-12
        loss = float(
            -(np.log(s_pos + eps).sum())
            - np.log(1.0 - s_neg + eps).sum()
        )

        g_pos = s_pos - 1.0
        gW = g_pos[:, None] * Cpos + np.einsum(
            "pk,pkd->pd", s_neg, Cneg
        )
        gC_pos = g_pos[:, None] * Wc
        gC_neg = s_neg[:, :, None] * Wc[:, None, :]

        P = len(center)
        allv = np.concatenate([center, context, neg.ravel()])
        u, inv = np.unique(allv, return_inverse=True)
        dW = np.zeros((len(u), d), np.float64)
        dC = np.zeros((len(u), d), np.float64)
        np.add.at(dW, inv[:P], gW)
        np.add.at(dC, inv[P : 2 * P], gC_pos)
        np.add.at(dC, inv[2 * P :], gC_neg.reshape(-1, d))
        nz = (dW != 0.0).any(axis=1) | (dC != 0.0).any(axis=1)
        touched = u[nz]
        dW, dC = dW[nz], dC[nz]
        loss_col = np.zeros(len(touched), np.float64)
        pairs_col = np.zeros(len(touched), np.float64)
        if len(touched):
            loss_col[0] = loss
            pairs_col[0] = float(P)
        return pa.table(
            {
                "bucket": pa.array(
                    (
                        hash_int64(touched)
                        % np.uint64(self.num_buckets)
                    ).astype(np.int32)
                ),
                "vid": pa.array(touched),
                "wg": pa.array(list(dW)),
                "cg": pa.array(list(dC)),
                "loss": pa.array(loss_col),
                "pairs": pa.array(pairs_col),
            }
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_partial(self.dim)
        cell = batch.column("cell").to_numpy(zero_copy_only=False)
        center = batch.column("center").to_numpy(zero_copy_only=False)
        context = batch.column("context").to_numpy(zero_copy_only=False)
        order = np.argsort(cell, kind="stable")
        cell, center, context = cell[order], center[order], context[order]
        cuts = np.flatnonzero(np.r_[True, cell[1:] != cell[:-1]])
        outs = []
        for s, e in zip(cuts, np.r_[cuts[1:], len(cell)]):
            outs.append(self._cell_partial(center[s:e], context[s:e]))
        live = [t for t in outs if t.num_rows]
        if not live:
            return _empty_partial(self.dim)
        return pa.concat_tables(live)


def skipgram_embeddings_sharded(
    walks: ray.data.Dataset,
    num_vertices: int,
    dim: int = 32,
    window: int = 5,
    negatives: int = 5,
    rounds: int = 60,
    lr: float = 0.05,
    seed: int = 0,
    shard_rows: int = SHARD_ROWS,
) -> SkipgramResult:
    """SGNS past the broadcast cap: range-slabbed model shards, pairs
    grid-partitioned by (center slab, context slab), one map_batches
    + one bucketed reduce shuffle per round.  See the section comment
    above for the full design and the shard-local-negatives
    approximation."""
    num_shards = max(1, -(-num_vertices // shard_rows))
    slab = -(-num_vertices // num_shards)
    num_shards = -(-num_vertices // slab)
    rng = np.random.Generator(np.random.PCG64(seed))
    W = (rng.random((num_vertices, dim)) - 0.5) / dim
    C = np.zeros((num_vertices, dim), np.float64)
    GW = np.full((num_vertices, dim), 1e-8)
    GC = np.full((num_vertices, dim), 1e-8)
    num_buckets = max(2, num_vertices // 250_000 + 2)

    pairs = (
        walks.map_batches(
            _PairExtract(window, slab, num_shards),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .sort("cell")
        .materialize()
    )
    if pairs.count() == 0:
        raise ValueError("walk corpus produced no skip-gram pairs")

    bounds = [
        (s * slab, min((s + 1) * slab, num_vertices))
        for s in range(num_shards)
    ]
    losses: list[float] = []
    for r in range(rounds):
        wrefs = [ray.put(np.ascontiguousarray(W[lo:hi])) for lo, hi in bounds]
        crefs = [ray.put(np.ascontiguousarray(C[lo:hi])) for lo, hi in bounds]
        partials = (
            pairs.map_batches(
                _ShardGrad(
                    wrefs,
                    crefs,
                    slab,
                    num_shards,
                    num_vertices,
                    negatives,
                    r,
                    seed,
                    num_buckets,
                    dim,
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .groupby("bucket")
            .map_groups(_reduce_bucket, batch_format="pyarrow")
            .materialize()
        )
        total_loss = 0.0
        total_pairs = 0.0
        # the bucketed reduce leaves exactly one row per touched vid,
        # so the Adagrad update applies incrementally per partial
        # block — no dense (V, d) per-round scratch on the driver
        for t in partials.iter_batches(
            batch_format="pyarrow", batch_size=None
        ):
            if t.num_rows == 0:
                continue
            vid = t.column("vid").to_numpy(zero_copy_only=False)
            wg = np.stack(t.column("wg").to_numpy(zero_copy_only=False))
            cg = np.stack(t.column("cg").to_numpy(zero_copy_only=False))
            GW[vid] += wg**2
            GC[vid] += cg**2
            W[vid] -= lr * wg / np.sqrt(GW[vid])
            C[vid] -= lr * cg / np.sqrt(GC[vid])
            total_loss += float(
                t.column("loss").to_numpy(zero_copy_only=False).sum()
            )
            total_pairs += float(
                t.column("pairs").to_numpy(zero_copy_only=False).sum()
            )
        if total_pairs == 0:
            raise ValueError("walk corpus produced no skip-gram pairs")
        losses.append(total_loss / total_pairs)

    tbl = pa.table(
        {
            "vid": pa.array(np.arange(num_vertices, dtype=np.int64)),
            "embedding": pa.array(list(W)),
        }
    )
    return SkipgramResult(embeddings=tbl, loss_history=losses)
