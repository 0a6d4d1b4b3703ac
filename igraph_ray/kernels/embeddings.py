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

        dW = np.zeros((vocab, d), np.float64)
        dC = np.zeros((vocab, d), np.float64)
        np.add.at(dW, center, gW)
        np.add.at(dC, context, gC_pos)
        np.add.at(dC, neg.ravel(), gC_neg.reshape(-1, d))

        touched = np.flatnonzero(
            (dW != 0.0).any(axis=1) | (dC != 0.0).any(axis=1)
        )
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
                "wg": pa.array(list(dW[touched])),
                "cg": pa.array(list(dC[touched])),
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

    ``num_vertices`` is the (dense-vid) vocabulary size and must fit
    the broadcast cap — the model ships whole to every worker, the
    gradient reduction stays rows-bucketed and distributed.  The
    update is synchronous full-batch Adagrad (see module docstring).
    """
    if num_vertices > BROADCAST_MAX_VOCAB:
        raise NotImplementedError(
            f"skipgram vocabulary {num_vertices} exceeds the broadcast "
            f"cap {BROADCAST_MAX_VOCAB}; shard the embedding matrix "
            "(parameter-server actors) before training at this scale"
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
