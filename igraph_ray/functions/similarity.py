"""Similarity search over an embedding column (``list<float>``).

- :func:`brute_force_topk` — exact cosine top-k: the query matrix is
  broadcast once (``ray.put``), each batch does one numpy matmul and
  emits its *local* top-k per query, and a final tiny per-query
  ``map_groups`` merges the partial top-ks (never materializes all
  scores).
- :func:`lsh_topk` — the scale path: random-hyperplane signatures
  bucket the vectors; only bucket-mates are rescored exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class _BruteScore:
    """Actor-pool stage: normalized query matrix fetched once per
    actor; per batch one matmul + local top-k."""

    def __init__(self, queries_ref, id_col, vec_col, k):
        self.q = _normalize(np.asarray(ray.get(queries_ref), dtype=np.float64))
        self.id_col = id_col
        self.vec_col = vec_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        e = _normalize(_batch_matrix(batch, self.vec_col).astype(np.float64))
        scores = e @ self.q.T  # (n, nq)
        n, nq = scores.shape
        k = min(self.k, n)
        top = np.argpartition(-scores, k - 1, axis=0)[:k]  # (k, nq)
        qid = np.repeat(np.arange(nq, dtype=np.int64), k)
        vid = ids[top.T.reshape(-1)]
        sc = np.take_along_axis(scores, top, axis=0).T.reshape(-1)
        return pa.table(
            {
                "query_id": pa.array(qid),
                "vec_id": pa.array(vid),
                "score": pa.array(sc),
            }
        )


def _final_topk(k: int):
    def _f(group: pa.Table) -> pa.Table:
        scores = group.column("score").to_numpy(zero_copy_only=False)
        order = np.lexsort(
            (group.column("vec_id").to_numpy(zero_copy_only=False), -scores)
        )[:k]
        return group.take(order)

    return _f


def brute_force_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Exact cosine top-k per query row of ``queries`` (nq × dim).
    Returns ``(query_id, vec_id, score)``, k rows per query."""
    ref = ray.put(np.asarray(queries, dtype=np.float64))
    partial = ds.select_columns([id_col, vec_col]).map_batches(
        _BruteScore,
        fn_constructor_args=(ref, id_col, vec_col, k),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
    return partial.groupby("query_id").map_groups(
        _final_topk(k), batch_format="pyarrow"
    )


def embedding_near_dup_pairs(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    nbits: int = 6,
    seed: int = 17,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_cap: int = 4096,
) -> ray.data.Dataset:
    """Embedding-cosine near-duplicate pairs ``(a, b, cosine)``.

    LSH-bucket the vectors by random-hyperplane signature, then compute
    exact pairwise cosine inside each bucket (one numpy gram matrix per
    group) and keep pairs ≥ ``threshold``.  Recall is bounded by the
    LSH (a near-dup pair colliding in no bucket is missed) — the
    standard trade; lower ``nbits`` for higher recall.
    """
    # signatures must match across tasks → fixed seed
    sample = ds.take(1)
    dim = len(sample[0][vec_col])

    def bucketize(batch: pa.Table) -> pa.Table:
        rng = np.random.Generator(np.random.PCG64(seed))
        planes = rng.standard_normal((dim, nbits))
        e = _batch_matrix(batch, vec_col).astype(np.float64)
        sig = ((e @ planes) > 0).astype(np.int64) @ (
            1 << np.arange(nbits, dtype=np.int64)
        )
        return pa.table(
            {
                id_col: batch.column(id_col),
                vec_col: batch.column(vec_col),
                "bucket": pa.array(sig),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
        n = group.num_rows
        if n < 2 or n > bucket_cap:  # skew guard on degenerate buckets
            return empty
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        e = _normalize(_batch_matrix(group, vec_col).astype(np.float64))
        gram = e @ e.T
        iu, ju = np.triu_indices(n, 1)
        cos = gram[iu, ju]
        keep = cos >= threshold
        if not keep.any():
            return empty
        a, b = ids[iu[keep]], ids[ju[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table(
            {
                "a": pa.array(lo),
                "b": pa.array(hi),
                "cosine": pa.array(cos[keep]),
            }
        )

    bucketed = ds.select_columns([id_col, vec_col]).map_batches(
        bucketize, batch_format="pyarrow", zero_copy_batch=True
    )
    return bucketed.groupby("bucket").map_groups(
        bucket_pairs, batch_format="pyarrow"
    )


class _LshBucket:
    """Random-hyperplane signature stage (plane matrix built once per
    actor from a fixed seed — identical on every actor)."""

    def __init__(self, dim, nbits, seed, id_col, vec_col):
        rng = np.random.Generator(np.random.PCG64(seed))
        self.planes = rng.standard_normal((dim, nbits))
        self.id_col = id_col
        self.vec_col = vec_col
        self.nbits = nbits

    def signature(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes) > 0
        weights = (1 << np.arange(self.nbits, dtype=np.int64))
        return bits.astype(np.int64) @ weights

    def __call__(self, batch: pa.Table) -> pa.Table:
        e = _batch_matrix(batch, self.vec_col).astype(np.float64)
        sig = self.signature(e)
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                self.vec_col: batch.column(self.vec_col),
                "bucket": pa.array(sig),
            }
        )


def lsh_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    nbits: int = 8,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Approximate cosine top-k: vectors and queries are bucketed by
    random-hyperplane signature; exact rescoring happens only against
    bucket-mates.  Recall < 1 by construction; nbits trades recall for
    candidate volume."""
    queries = np.asarray(queries, dtype=np.float64)
    dim = queries.shape[1]
    bucketed = ds.select_columns([id_col, vec_col]).map_batches(
        _LshBucket,
        fn_constructor_args=(dim, nbits, seed, id_col, vec_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
    # query buckets (driver-side tiny computation, same planes)
    rng = np.random.Generator(np.random.PCG64(seed))
    planes = rng.standard_normal((dim, nbits))
    qsig = ((queries @ planes) > 0).astype(np.int64) @ (
        1 << np.arange(nbits, dtype=np.int64)
    )
    qref = ray.put(_normalize(queries))
    qsig_ref = ray.put(qsig)

    class BucketScore:
        def __init__(self):
            self.q = ray.get(qref)
            self.qsig = ray.get(qsig_ref)

        def __call__(self, group: pa.Table) -> pa.Table:
            bucket = group.column("bucket")[0].as_py()
            q_idx = np.flatnonzero(self.qsig == bucket)
            if len(q_idx) == 0:
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "vec_id": pa.array([], pa.int64()),
                        "score": pa.array([], pa.float64()),
                    }
                )
            ids = group.column(id_col).to_numpy(zero_copy_only=False)
            e = _normalize(_batch_matrix(group, vec_col).astype(np.float64))
            scores = e @ self.q[q_idx].T
            n = len(ids)
            kk = min(k, n)
            top = np.argpartition(-scores, kk - 1, axis=0)[:kk]
            qid = np.repeat(q_idx, kk)
            vid = ids[top.T.reshape(-1)]
            sc = np.take_along_axis(scores, top, axis=0).T.reshape(-1)
            return pa.table(
                {
                    "query_id": pa.array(qid),
                    "vec_id": pa.array(vid),
                    "score": pa.array(sc),
                }
            )

    scorer = BucketScore()

    def _score_group(group: pa.Table) -> pa.Table:
        return scorer(group)

    scored = bucketed.groupby("bucket").map_groups(
        _score_group, batch_format="pyarrow"
    )
    return scored.groupby("query_id").map_groups(
        _final_topk(k), batch_format="pyarrow"
    )


def kmeans(
    ds: ray.data.Dataset,
    k: int,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    spherical: bool = False,
    tol: float = 1e-6,
) -> tuple[np.ndarray, float]:
    """Distributed Lloyd's k-means over the embedding column.

    Each iteration broadcasts the centroid matrix once (``ray.put``)
    and runs ONE ``map_batches`` pass emitting k partial rows per
    batch (count + vector sum + inertia per centroid) — the classic
    pre-combined aggregate; the driver reduces the tiny k-row stream
    and updates centroids.  ``spherical=True`` L2-normalizes vectors
    and centroids (cosine k-means — the IVF coarse quantizer).

    Init is deterministic maximin (farthest-point) seeding over the
    first ``max(64·k, 1024)`` rows of the dataset order — the greedy
    k-means++ variant, no RNG, stable for a deterministic source.
    Empty clusters keep their previous centroid.  Returns
    ``(centroids (k, dim), inertia)``.
    """
    n_sample = max(64 * k, 1024)
    first = ds.select_columns([vec_col]).limit(n_sample).take_all()
    sample = np.asarray([r[vec_col] for r in first], dtype=np.float64)
    if len(sample) < k:
        raise ValueError(f"kmeans needs >= k={k} rows, got {len(sample)}")
    if spherical:
        sample = _normalize(sample)
    # greedy farthest-point seeding on the sample
    chosen = [0]
    d2 = ((sample - sample[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        nxt = int(np.argmax(d2))
        chosen.append(nxt)
        d2 = np.minimum(d2, ((sample - sample[nxt]) ** 2).sum(axis=1))
    cents = sample[chosen]
    dim = cents.shape[1]
    inertia = np.inf

    vecs = ds.select_columns([vec_col]).materialize()
    for _it in range(iters):
        cref = ray.put(cents)

        def partial(batch: pa.Table, _cr=cref) -> pa.Table:
            c = ray.get(_cr)  # (k, dim), zero-copy from local store
            e = _batch_matrix(batch, vec_col).astype(np.float64)
            if spherical:
                e = _normalize(e)
            # assignment by min squared distance == max (e·c − |c|²/2)
            aff = e @ c.T - 0.5 * (c * c).sum(axis=1)
            assign = np.argmax(aff, axis=1)
            sq = (e * e).sum(axis=1) - 2.0 * aff[
                np.arange(len(e)), assign
            ]
            order = np.argsort(assign, kind="stable")
            a_s, e_s, sq_s = assign[order], e[order], sq[order]
            fst = np.empty(len(a_s), dtype=bool)
            fst[0] = True
            fst[1:] = a_s[1:] != a_s[:-1]
            seg = np.flatnonzero(fst)
            cids = a_s[seg]
            cnt = np.diff(np.append(seg, len(a_s)))
            sums = np.add.reduceat(e_s, seg, axis=0)
            iner = np.add.reduceat(sq_s, seg)
            return pa.table(
                {
                    "cid": pa.array(cids.astype(np.int64)),
                    "n": pa.array(cnt.astype(np.int64)),
                    "s": pa.array(list(sums), pa.list_(pa.float64())),
                    "iner": pa.array(iner),
                }
            )

        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.float64)
        total_iner = 0.0
        for b in (
            vecs.map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True
            ).iter_batches(batch_format="pyarrow", batch_size=None)
        ):
            cid = b.column("cid").to_numpy(zero_copy_only=False)
            n = b.column("n").to_numpy(zero_copy_only=False)
            s = _batch_matrix(b, "s")
            np.add.at(counts, cid, n)
            np.add.at(sums, cid, s)
            total_iner += float(
                b.column("iner").to_numpy(zero_copy_only=False).sum()
            )

        new = cents.copy()  # empty clusters keep their centroid
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        if spherical:
            new[nz] = _normalize(new[nz])
        shift = float(np.abs(new - cents).max())
        cents, inertia = new, total_iner
        if shift < tol:
            break
    return cents, inertia


def ivf_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    nlist: int = 64,
    nprobe: int = 8,
    kmeans_iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """IVF approximate cosine top-k — the scale path past LSH.

    Train a spherical-k-means coarse quantizer (``nlist`` lists), hash
    every vector to its nearest list (one broadcast-centroid
    ``map_batches``), then score each query ONLY against its
    ``nprobe`` nearest lists: ``groupby("list_id").map_groups`` — a
    list's vectors never leave their group task, each group rescoring
    the subset of queries that probe it; per-query partial top-ks are
    merged by a tiny final ``map_groups``.  Compute per query drops
    from O(N) to ~O(N·nprobe/nlist); recall < 1 at cluster borders
    (the standard IVF trade, tests/test_similarity_ivf.py pins it).
    Returns ``(query_id, vec_id, score)``, ≤ k rows per query.
    """
    queries = np.asarray(queries, dtype=np.float64)
    cents, _ = kmeans(
        ds, nlist, iters=kmeans_iters, id_col=id_col,
        vec_col=vec_col, spherical=True,
    )
    qn = _normalize(queries)
    nprobe = min(nprobe, nlist)
    aff = qn @ cents.T  # (nq, nlist)
    probe = np.argpartition(-aff, nprobe - 1, axis=1)[:, :nprobe]
    # probe_mask[l, q] — does query q probe list l
    nq = len(qn)
    probe_mask = np.zeros((nlist, nq), dtype=bool)
    probe_mask[probe.reshape(-1), np.repeat(np.arange(nq), nprobe)] = True

    cref = ray.put(cents)
    qref = ray.put(qn)
    mref = ray.put(probe_mask)

    class _Assign:
        def __init__(self):
            self.c = ray.get(cref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            e = _normalize(_batch_matrix(batch, vec_col).astype(np.float64))
            lid = np.argmax(e @ self.c.T, axis=1)
            return pa.table(
                {
                    id_col: batch.column(id_col),
                    vec_col: batch.column(vec_col),
                    "list_id": pa.array(lid.astype(np.int64)),
                }
            )

    class _ListScore:
        def __init__(self):
            self.q = ray.get(qref)
            self.mask = ray.get(mref)

        def __call__(self, group: pa.Table) -> pa.Table:
            lid = group.column("list_id")[0].as_py()
            q_idx = np.flatnonzero(self.mask[lid])
            if len(q_idx) == 0:
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "vec_id": pa.array([], pa.int64()),
                        "score": pa.array([], pa.float64()),
                    }
                )
            ids = group.column(id_col).to_numpy(zero_copy_only=False)
            e = _normalize(_batch_matrix(group, vec_col).astype(np.float64))
            scores = e @ self.q[q_idx].T
            n = len(ids)
            kk = min(k, n)
            top = np.argpartition(-scores, kk - 1, axis=0)[:kk]
            qid = q_idx[np.repeat(np.arange(len(q_idx)), kk)]
            vid = ids[top.T.reshape(-1)]
            sc = np.take_along_axis(scores, top, axis=0).T.reshape(-1)
            return pa.table(
                {
                    "query_id": pa.array(qid.astype(np.int64)),
                    "vec_id": pa.array(vid),
                    "score": pa.array(sc),
                }
            )

    assigned = ds.select_columns([id_col, vec_col]).map_batches(
        _Assign,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
    scorer = _ListScore()

    def _score_group(group: pa.Table) -> pa.Table:
        return scorer(group)

    scored = assigned.groupby("list_id").map_groups(
        _score_group, batch_format="pyarrow"
    )
    return scored.groupby("query_id").map_groups(
        _final_topk(k), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — memory-compressed ANN (Jégou, Douze,
# Schmid 2011, "Product Quantization for Nearest Neighbor Search")
# ---------------------------------------------------------------------------
def pq_train(
    ds: ray.data.Dataset,
    m: int = 4,
    nbits: int = 6,
    iters: int = 8,
    vec_col: str = "embedding",
    tol: float = 1e-6,
) -> np.ndarray:
    """Train per-subspace PQ codebooks: split the (L2-normalized)
    vectors into ``m`` contiguous subvectors and run Lloyd's k-means
    with ``K = 2**nbits`` centroids in EACH subspace — all ``m``
    subspace updates ride ONE ``map_batches`` pass per iteration
    (pre-combined (subspace, centroid) partial rows, broadcast
    codebook), the same aggregate shape as ``kmeans``.  Deterministic
    maximin seeding per subspace over the first sample rows — no RNG.
    Returns codebooks ``(m, K, dim//m)``.
    """
    K = 1 << nbits
    n_sample = max(64 * K, 1024)
    first = ds.select_columns([vec_col]).limit(n_sample).take_all()
    sample = _normalize(
        np.asarray([r[vec_col] for r in first], dtype=np.float64)
    )
    if len(sample) < K:
        raise ValueError(f"pq_train needs >= K={K} rows, got {len(sample)}")
    dim = sample.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m
    subs = sample.reshape(len(sample), m, dsub)

    cents = np.empty((m, K, dsub), dtype=np.float64)
    for j in range(m):
        s = subs[:, j]
        chosen = [0]
        d2 = ((s - s[0]) ** 2).sum(axis=1)
        for _ in range(1, K):
            nxt = int(np.argmax(d2))
            chosen.append(nxt)
            d2 = np.minimum(d2, ((s - s[nxt]) ** 2).sum(axis=1))
        cents[j] = s[chosen]

    vecs = ds.select_columns([vec_col]).materialize()
    for _it in range(iters):
        cref = ray.put(cents)

        def partial(batch: pa.Table, _cr=cref) -> pa.Table:
            c = ray.get(_cr)  # (m, K, dsub)
            e = _normalize(_batch_matrix(batch, vec_col).astype(np.float64))
            es = e.reshape(len(e), m, dsub)
            out_j, out_cid, out_n, out_s = [], [], [], []
            for j in range(m):
                ej = es[:, j]
                cj = c[j]
                aff = ej @ cj.T - 0.5 * (cj * cj).sum(axis=1)
                assign = np.argmax(aff, axis=1)
                order = np.argsort(assign, kind="stable")
                a_s, e_s = assign[order], ej[order]
                fst = np.empty(len(a_s), dtype=bool)
                fst[0] = True
                fst[1:] = a_s[1:] != a_s[:-1]
                seg = np.flatnonzero(fst)
                out_j.append(np.full(len(seg), j, np.int64))
                out_cid.append(a_s[seg].astype(np.int64))
                out_n.append(np.diff(np.append(seg, len(a_s))))
                out_s.append(np.add.reduceat(e_s, seg, axis=0))
            return pa.table(
                {
                    "j": pa.array(np.concatenate(out_j)),
                    "cid": pa.array(np.concatenate(out_cid)),
                    "n": pa.array(
                        np.concatenate(out_n).astype(np.int64)
                    ),
                    "s": pa.array(
                        list(np.concatenate(out_s, axis=0)),
                        pa.list_(pa.float64()),
                    ),
                }
            )

        counts = np.zeros((m, K), dtype=np.int64)
        sums = np.zeros((m, K, dsub), dtype=np.float64)
        for b in vecs.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow", batch_size=None):
            jj = b.column("j").to_numpy(zero_copy_only=False)
            cid = b.column("cid").to_numpy(zero_copy_only=False)
            n = b.column("n").to_numpy(zero_copy_only=False)
            s = _batch_matrix(b, "s")
            np.add.at(counts, (jj, cid), n)
            np.add.at(sums, (jj, cid), s * 1.0)
        # weight the sums correctly: s rows are already sums, n counts
        new = cents.copy()
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz][:, None]
        shift = float(np.abs(new - cents).max())
        cents = new
        if shift < tol:
            break
    return cents


def pq_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    m: int = 4,
    nbits: int = 6,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: np.ndarray | None = None,
) -> ray.data.Dataset:
    """Approximate cosine top-k by asymmetric distance computation
    (ADC) over PQ codes — the memory-bound scale path: each database
    vector is summarized by ``m`` uint8 codes (``m·nbits`` bits
    instead of ``dim·32``), and scoring a batch is ``m`` table
    lookups + a sum instead of a ``dim``-wide matmul.

    Per batch: encode (nearest centroid per subspace, broadcast
    codebooks) then score every query against the codes via its
    per-subspace lookup table ``LUT[q, j, c] = q_j · c_{j,c}`` —
    approx score = Σ_j LUT[q, j, code_j].  Partial top-k per batch,
    merged by the same final ``map_groups`` as ``brute_force_topk``.
    Returns ``(query_id, vec_id, score)`` with the ADC-approximate
    cosine score; recall is pinned in tests (the standard PQ trade).
    """
    if codebooks is None:
        codebooks = pq_train(
            ds, m=m, nbits=nbits, iters=iters, vec_col=vec_col
        )
    m = codebooks.shape[0]
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    nq, dim = qn.shape
    dsub = dim // m
    # LUT[q, j, c] = q_subj · cent_{j,c}
    lut = np.einsum("qjd,jcd->qjc", qn.reshape(nq, m, dsub), codebooks)
    cref = ray.put(codebooks)
    lref = ray.put(lut)

    class _AdcScore:
        def __init__(self):
            self.c = ray.get(cref)
            self.lut = ray.get(lref)
            self.nq = self.lut.shape[0]

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            e = _normalize(
                _batch_matrix(batch, vec_col).astype(np.float64)
            )
            es = e.reshape(len(e), m, dsub)
            codes = np.empty((len(e), m), dtype=np.int64)
            for j in range(m):
                cj = self.c[j]
                aff = es[:, j] @ cj.T - 0.5 * (cj * cj).sum(axis=1)
                codes[:, j] = np.argmax(aff, axis=1)
            # scores (n, nq): sum of LUT lookups over subspaces
            scores = np.zeros((len(e), self.nq), dtype=np.float64)
            for j in range(m):
                scores += self.lut[:, j, codes[:, j]].T
            n = len(ids)
            kk = min(k, n)
            top = np.argpartition(-scores, kk - 1, axis=0)[:kk]
            qid = np.repeat(np.arange(self.nq, dtype=np.int64), kk)
            vid = ids[top.T.reshape(-1)]
            sc = np.take_along_axis(scores, top, axis=0).T.reshape(-1)
            return pa.table(
                {
                    "query_id": pa.array(qid),
                    "vec_id": pa.array(vid),
                    "score": pa.array(sc),
                }
            )

    partial = ds.select_columns([id_col, vec_col]).map_batches(
        _AdcScore,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
    return partial.groupby("query_id").map_groups(
        _final_topk(k), batch_format="pyarrow"
    )


def simplified_silhouette(
    ds: ray.data.Dataset,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> pa.Table:
    """Simplified silhouette (Hruschka et al. 2004 — the centroid
    variant of Rousseeuw's silhouette, the standard large-scale
    substitute for the O(n²) exact score): per point,
    a = ‖x − c_own‖, b = min over other clusters ‖x − c_k‖,
    s = (b − a) / max(a, b); returns per-label means and the global
    mean as rows ``(label, n, mean_silhouette)`` (label −1 = overall).

    Two passes: (1) per-batch per-label sum/count partials → driver
    centroid matrix (O(k·d) state, k-means pattern); (2) broadcast
    centroids, per-batch vectorized distance matrix + per-label
    partial silhouette sums.  No shuffle.
    """
    from ray.data.aggregate import Sum

    # pass 1: centroids
    def cent_partial(batch: pa.Table) -> pa.Table:
        lab = batch.column(label_col).to_numpy(zero_copy_only=False)
        emb = np.asarray(batch.column(vec_col).to_pylist(), np.float64)
        uniq = np.unique(lab)
        rows_l, rows_n, rows_s = [], [], []
        for lv in uniq.tolist():
            m = lab == lv
            rows_l.append(lv)
            rows_n.append(int(m.sum()))
            rows_s.append(emb[m].sum(axis=0).tolist())
        return pa.table(
            {
                "label": pa.array(rows_l, pa.int64()),
                "n": pa.array(rows_n, pa.int64()),
                "s": pa.array(rows_s, pa.list_(pa.float64())),
            }
        )

    parts = pa.concat_tables(
        ds.select_columns([vec_col, label_col])
        .map_batches(cent_partial, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    labs = parts.column("label").to_numpy(zero_copy_only=False)
    uniq = np.unique(labs)
    d = len(parts.column("s")[0].as_py())
    cents = np.zeros((len(uniq), d))
    counts = np.zeros(len(uniq), np.int64)
    for i, lv in enumerate(uniq.tolist()):
        m = labs == lv
        counts[i] = parts.column("n").to_numpy(zero_copy_only=False)[m].sum()
        svals = np.asarray(
            [parts.column("s")[int(j)].as_py() for j in np.flatnonzero(m)],
            np.float64,
        )
        cents[i] = svals.sum(axis=0) / counts[i]
    lab_to_idx = {int(lv): i for i, lv in enumerate(uniq.tolist())}
    ref = ray.put((cents, lab_to_idx))

    # pass 2: per-point silhouette partials
    def sil_partial(batch: pa.Table) -> pa.Table:
        c, l2i = ray.get(ref)
        lab = batch.column(label_col).to_numpy(zero_copy_only=False)
        emb = np.asarray(batch.column(vec_col).to_pylist(), np.float64)
        # full distance matrix points × centroids
        d2 = (
            (emb * emb).sum(axis=1)[:, None]
            - 2.0 * emb @ c.T
            + (c * c).sum(axis=1)[None, :]
        )
        dist = np.sqrt(np.maximum(d2, 0.0))
        own_idx = np.array([l2i[int(v)] for v in lab])
        a = dist[np.arange(len(lab)), own_idx]
        masked = dist.copy()
        masked[np.arange(len(lab)), own_idx] = np.inf
        b = masked.min(axis=1)
        # single-cluster corpus: every other-centroid slot is masked,
        # b = inf and (b-a)/max would be NaN — the convention is s = 0
        # (ADVICE r3); folding b back to a yields exactly that
        b = np.where(np.isfinite(b), b, a)
        s = np.where(
            np.maximum(a, b) > 0, (b - a) / np.maximum(a, b), 0.0
        )
        uniq_b = np.unique(lab)
        rows_l, rows_n, rows_s = [], [], []
        for lv in uniq_b.tolist():
            m = lab == lv
            rows_l.append(lv)
            rows_n.append(int(m.sum()))
            rows_s.append(float(s[m].sum()))
        return pa.table(
            {
                "label": pa.array(rows_l, pa.int64()),
                "n": pa.array(rows_n, pa.int64()),
                "ssum": pa.array(rows_s, pa.float64()),
            }
        )

    parts2 = (
        ds.select_columns([vec_col, label_col])
        .map_batches(sil_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("label")
        .aggregate(Sum("n", alias_name="n"), Sum("ssum", alias_name="ssum"))
    )
    tbl = pa.concat_tables(
        parts2.iter_batches(batch_format="pyarrow", batch_size=None)
    ).sort_by("label")
    lab_out = tbl.column("label").to_pylist()
    n_out = tbl.column("n").to_numpy(zero_copy_only=False)
    s_out = tbl.column("ssum").to_numpy(zero_copy_only=False)
    total_n = int(n_out.sum())
    total_s = float(s_out.sum())
    return pa.table(
        {
            "label": pa.array(lab_out + [-1], pa.int64()),
            "n": pa.array(n_out.tolist() + [total_n], pa.int64()),
            "mean_silhouette": pa.array(
                (s_out / n_out).tolist() + [total_s / total_n],
                pa.float64(),
            ),
        }
    )
