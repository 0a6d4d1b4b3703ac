#!/usr/bin/env python
"""Benchmark harness — headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "e2e_seconds", "value": N, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": ..., "num_cpus": N, ...}

The headline graph is built from ``lineitem``: each row (orderkey,
partkey, suppkey) contributes the directed triangle order→part→supp→
order over namespaced integer vids (vid = 4*key + type), giving a
~3×|lineitem| edge table with realistic skew (suppliers are hubs).

Modes:
  python bench.py                 full suite at $RAY_GRAFT_CPUS (def 32)
  python bench.py --headline-only graph build + pagerank only
  python bench.py --scaling       run the headline in fresh processes at
                                  8 and 32 CPUs, report throughputs +
                                  per-cpu-normalized scaling efficiency
  python bench.py --scaling-compute
                                  same fresh-process N-vs-4N protocol on a
                                  COMPUTE-bound stage (MinHash signatures
                                  over documents) — isolates engine
                                  scaling from the single-host DRAM
                                  ceiling that caps the graph kernels
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _sf_label(path: str) -> str:
    base = os.path.basename(path.rstrip("/"))
    return base.replace("sf", "") if base.startswith("sf") else base


def build_synth_graph(graph_dir: str, num_edges: int):
    """Deterministic synthetic graph (FIXTURES.md §3) — used by the
    scaling protocol so the per-iteration work is compute-dominated and
    identical across CPU counts."""
    from igraph_ray.api import build_graph
    from igraph_ray.sources.synth import synthetic_edge_dataset

    edges = synthetic_edge_dataset(num_edges, seed=42)
    # fixed partition count so both CPU configs of the scaling protocol
    # run the exact same partitioning
    return build_graph(edges, graph_dir, num_parts=32, symmetrize=True)


def build_lineitem_graph(graph_dir: str):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from igraph_ray.api import build_graph

    ds = ray.data.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey"],
    )

    def triple_edges(batch: pa.Table) -> pa.Table:
        o = batch.column("l_orderkey").to_numpy(zero_copy_only=False) * 4 + 0
        p = batch.column("l_partkey").to_numpy(zero_copy_only=False) * 4 + 1
        s = batch.column("l_suppkey").to_numpy(zero_copy_only=False) * 4 + 2
        src = np.concatenate([o, p, s])
        dst = np.concatenate([p, s, o])
        return pa.table(
            {
                "src": pa.array(src.astype(np.int64)),
                "dst": pa.array(dst.astype(np.int64)),
                "weight": pa.array(np.ones(len(src), np.float64)),
            }
        )

    edges = ds.map_batches(
        triple_edges, batch_format="pyarrow", zero_copy_batch=True
    )
    return build_graph(edges, graph_dir, symmetrize=True)


def run_suite(headline_only: bool = False) -> dict:
    import numpy as np
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        logging_level=logging.ERROR,
    )
    logging.getLogger("ray.data").setLevel(logging.CRITICAL)

    from igraph_ray.kernels.components import connected_components
    from igraph_ray.kernels.lpa import label_propagation
    from igraph_ray.kernels.pagerank import pagerank
    from igraph_ray.kernels.triangles import total_triangles, triangle_counts

    queries: dict[str, float] = {}
    detail: dict[str, object] = {}
    graph_dir = tempfile.mkdtemp(prefix="igr_bench_")
    t_total = time.perf_counter()

    scale_edges = int(os.environ.get("GRAFT_SCALE_EDGES", "0"))
    t0 = time.perf_counter()
    if scale_edges:
        graph = build_synth_graph(os.path.join(graph_dir, "g"), scale_edges)
    else:
        graph = build_lineitem_graph(os.path.join(graph_dir, "g"))
    queries["graph_build"] = round(time.perf_counter() - t0, 3)
    detail["num_vertices"] = graph.num_vertices
    detail["num_edges"] = graph.num_edges

    # convergence run (the reference semantics: L1 < N*tol at 1e-6)
    t0 = time.perf_counter()
    run = pagerank(graph, tol=1e-6, max_iter=60, raise_on_nonconvergence=False)
    queries["pagerank"] = round(time.perf_counter() - t0, 3)
    detail["pagerank_iterations_to_1e6"] = run.iterations

    # throughput run: fixed 10 iterations for a stable per-iter number
    run = pagerank(graph, tol=0.0, max_iter=10, raise_on_nonconvergence=False)
    per_iter = (
        float(np.mean(run.seconds_per_iteration[3:]))  # skip warmup iters
        if len(run.seconds_per_iteration) > 3
        else float("nan")
    )
    detail["pagerank_sec_per_iter"] = round(per_iter, 3)
    detail["pagerank_edges_per_sec_per_iter"] = (
        round(graph.num_edges / per_iter) if per_iter else None
    )

    if not headline_only:
        t0 = time.perf_counter()
        crun = connected_components(graph)
        queries["components"] = round(time.perf_counter() - t0, 3)
        detail["components_iterations"] = crun.iterations

        t0 = time.perf_counter()
        lrun = label_propagation(graph, max_iter=10)
        queries["label_propagation"] = round(time.perf_counter() - t0, 3)
        detail["lpa_iterations"] = lrun.iterations

        from igraph_ray.kernels.kcore import core_numbers

        t0 = time.perf_counter()
        krun = core_numbers(graph)
        queries["core_numbers"] = round(time.perf_counter() - t0, 3)
        detail["kcore_iterations"] = krun.iterations

        from igraph_ray.kernels.sssp import shortest_paths

        t0 = time.perf_counter()
        srun = shortest_paths(graph, [4], weighted=False)  # vid of order 1
        queries["sssp_bfs"] = round(time.perf_counter() - t0, 3)
        detail["sssp_iterations"] = srun.iterations

        # 16 BFS lanes in one chassis run (multi-pivot kernel)
        from igraph_ray.kernels.multibfs import harmonic_centrality

        t0 = time.perf_counter()
        harmonic_centrality(graph, graph.num_vertices, k=16).count()
        queries["harmonic_k16"] = round(time.perf_counter() - t0, 3)

        from igraph_ray.kernels.eigenvector import eigenvector_centrality
        from igraph_ray.kernels.pagerank import (
            PowerIterationFailedConvergence,
        )

        # fixed-iteration throughput measurement (convergence of the
        # undamped iteration depends on the spectral gap, not on us)
        t0 = time.perf_counter()
        try:
            eigenvector_centrality(
                graph, graph.num_vertices, tol=1e-6, max_iter=25
            ).count()
            detail["eigenvector_converged"] = True
        except PowerIterationFailedConvergence:
            detail["eigenvector_converged"] = False
        queries["eigenvector_25it"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        import ray.data as rd

        edges_ds = rd.read_parquet(
            f"{SF_DIR}/lineitem.parquet",
            columns=["l_orderkey", "l_partkey", "l_suppkey"],
        )

        import pyarrow as pa

        def triple_edges(batch: pa.Table) -> pa.Table:
            o = batch.column("l_orderkey").to_numpy(zero_copy_only=False) * 4
            p = batch.column("l_partkey").to_numpy(zero_copy_only=False) * 4 + 1
            s = batch.column("l_suppkey").to_numpy(zero_copy_only=False) * 4 + 2
            src = np.concatenate([o, p, s]).astype(np.int64)
            dst = np.concatenate([p, s, o]).astype(np.int64)
            return pa.table(
                {
                    "src": pa.array(src),
                    "dst": pa.array(dst),
                    "weight": pa.array(np.ones(len(src), np.float64)),
                }
            )

        tri_edges = edges_ds.map_batches(
            triple_edges, batch_format="pyarrow", zero_copy_batch=True
        )
        tc = triangle_counts(tri_edges)
        detail["total_triangles"] = total_triangles(tc)
        queries["triangles"] = round(time.perf_counter() - t0, 3)

        from igraph_ray.kernels.louvain import louvain

        t0 = time.perf_counter()
        _assign, mods = louvain(tri_edges, max_rounds_per_level=8)
        queries["louvain"] = round(time.perf_counter() - t0, 3)
        detail["louvain_modularity"] = round(mods[-1], 4)
        detail["louvain_levels"] = len(mods)

        # training-data ops over documents
        from igraph_ray.functions.dedup import minhash_near_dup_pairs
        from igraph_ray.functions.similarity import brute_force_topk
        from igraph_ray.functions.text import quality_score, token_count

        docs = rd.read_parquet(f"{SF_DIR}/documents.parquet")
        t0 = time.perf_counter()
        n_pairs = minhash_near_dup_pairs(docs, verify_threshold=0.6).count()
        queries["minhash_near_dup"] = round(time.perf_counter() - t0, 3)
        detail["minhash_pairs"] = n_pairs

        from igraph_ray.functions.dedup import simhash_near_dup_pairs

        t0 = time.perf_counter()
        detail["simhash_pairs"] = simhash_near_dup_pairs(docs).count()
        queries["simhash_near_dup"] = round(time.perf_counter() - t0, 3)

        from igraph_ray.functions.dedup import ngram_jaccard_pairs

        t0 = time.perf_counter()
        detail["ngram_jaccard_pairs"] = ngram_jaccard_pairs(
            docs, threshold=0.2
        ).count()
        queries["ngram_jaccard"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        token_count(docs).count()
        quality_score(docs).count()
        queries["text_analysis"] = round(time.perf_counter() - t0, 3)

        # relational/window family (round-2 additions): gap sessions +
        # running totals over events, fact⋈fact hash join + grouped
        # aggregate, and exact selection-based quantiles over lineitem
        from igraph_ray.pipelines import driver_queries as dq

        t0 = time.perf_counter()
        dq.q_sessions(SF_DIR).count()
        dq.q_running_totals(SF_DIR).count()
        queries["sessions_running"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        dq.q_priority_lineitems(SF_DIR).count()
        queries["hash_join_agg"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        dq.q_price_quantiles(SF_DIR)
        queries["exact_quantiles"] = round(time.perf_counter() - t0, 3)

        emb = rd.read_parquet(f"{SF_DIR}/embeddings.parquet")
        first = emb.take(2)
        q = np.stack([np.asarray(r["embedding"]) for r in first])
        t0 = time.perf_counter()
        brute_force_topk(emb, q, k=10).count()
        queries["ann_brute_topk"] = round(time.perf_counter() - t0, 3)

        # round-2 late additions: non-equi joins, paragraph dedup,
        # sequence packing, PCA
        t0 = time.perf_counter()
        n_band = dq.q_event_pairs_band(SF_DIR).count()
        queries["band_join"] = round(time.perf_counter() - t0, 3)
        detail["band_pairs"] = n_band

        from igraph_ray.functions.paragraphs import paragraph_dedup

        t0 = time.perf_counter()
        para = paragraph_dedup(docs, "doc_id", "text", width=5)
        removed = para.sum("n_removed")
        queries["paragraph_dedup"] = round(time.perf_counter() - t0, 3)
        detail["paragraphs_removed"] = int(removed or 0)

        t0 = time.perf_counter()
        dq.q_packed_chunks(SF_DIR).count()
        queries["sequence_packing"] = round(time.perf_counter() - t0, 3)

        from igraph_ray.functions.pca import pca_project

        t0 = time.perf_counter()
        out, _var = pca_project(emb, "vec_id", "embedding", 8)
        out.count()
        queries["pca_project"] = round(time.perf_counter() - t0, 3)

    total = round(time.perf_counter() - t_total, 3)
    shutil.rmtree(graph_dir, ignore_errors=True)
    ray.shutdown()
    # host-state evidence embedded in every artifact (round-4 verdict
    # task: the r3→r4 e2e swing cost an adjudication cycle because the
    # artifact carried no same-run ceiling sample).  ~35 s of
    # measurement; GRAFT_BENCH_CEILINGS=0 skips it.
    if os.environ.get("GRAFT_BENCH_CEILINGS", "1") != "0":
        detail["host_compute_ceiling_8_to_32"] = _host_compute_ceiling(8, 32)
        detail["host_memory_bw_ceiling_8_to_32"] = _host_memory_bw_ceiling(
            8, 32, repeats=1
        )
    return {
        "metric": "e2e_seconds",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": _sf_label(SF_DIR),
        "num_cpus": NUM_CPUS,
        **detail,
    }


def _burn(_):
    t0 = time.time()
    x = 0
    while time.time() - t0 < 0.5:
        x += 1
    return x


def _stream(_):
    import numpy as np

    # memory-bound kernel shaped like the pagerank scatter inner loop:
    # gather + multiply + segmented reduce over arrays >> L3
    n = 8_000_000
    idx = np.random.default_rng(0).integers(0, n, n)
    x = np.random.default_rng(1).random(n)
    w = np.random.default_rng(2).random(n)
    seg = np.arange(0, n, 16)
    v = x[idx] * w
    np.add.reduceat(v, seg)  # warmup
    t0 = time.perf_counter()
    iters = 0
    while time.perf_counter() - t0 < 4.0:
        v = x[idx] * w
        np.add.reduceat(v, seg)
        iters += 1
    return iters


def _host_memory_bw_ceiling(n_lo: int, n_hi: int, repeats: int = 2) -> float:
    """Measured aggregate MEMORY throughput ratio at n_hi-way vs
    n_lo-way (normalized by n_hi/n_lo), using a gather+reduceat kernel
    shaped like the engine's hot loop.  Co-located workers share one
    memory system, so this — not core count — is the hard ceiling for
    memory-bound kernels on a single host; a real n_hi/n_lo-×-node
    cluster multiplies memory channels instead.  Best-of-N to damp
    shared-VM scheduling noise."""
    import multiprocessing as mp

    best = {n_lo: 0, n_hi: 0}
    for _ in range(repeats):
        for n in (n_lo, n_hi):
            with mp.Pool(n) as p:
                best[n] = max(best[n], sum(p.map(_stream, range(n))))
    return round((best[n_hi] / best[n_lo]) / (n_hi / n_lo), 3)


def _host_compute_ceiling(n_lo: int, n_hi: int) -> float:
    """Measured aggregate-compute ratio of this host at n_hi-way vs
    n_lo-way concurrency, normalized by n_hi/n_lo.  A virtualized host
    that throttles high concurrency caps any job's per-cpu-normalized
    scaling efficiency at this value — report it alongside the result
    so the number is interpretable."""
    import multiprocessing as mp

    totals = {}
    for n in (n_lo, n_hi):
        with mp.Pool(n) as p:
            totals[n] = sum(p.map(_burn, range(n)))
    return round((totals[n_hi] / totals[n_lo]) / (n_hi / n_lo), 3)


def _host_plasma_ceiling(n_lo: int, n_hi: int, mb_per_task: int = 256) -> dict:
    """Aggregate OBJECT-STORE WRITE bandwidth ratio at n_hi-way vs
    n_lo-way concurrency (normalized) — the resource every
    scatter/shuffle/apply materialization spends.  The round-5 phase
    adjudication found PageRank's 8→32 phases at 99-108% of THIS
    ceiling while the read-shaped _stream ceiling said 0.6-1.1: plasma
    writes (heap stream + memcpy into the store), not reads, are the
    binding single-host resource for shuffle-bound kernels.  Fresh Ray
    session per config."""
    out = {}
    for cpus in (n_lo, n_hi):
        proc = subprocess.run(
            [
                sys.executable,
                "-c",
                f"""
import time, numpy as np, ray, logging, json
ray.init(address="local", num_cpus={cpus}, include_dashboard=False,
         logging_level=logging.ERROR)

@ray.remote
def burn(i):
    n = {mb_per_task} * 1024 * 1024 // 8
    for r in range(4):
        a = np.full(n, float(i + r))
        ref = ray.put(a)
        del ref, a
    return 0

t0 = time.perf_counter()
ray.get([burn.remote(i) for i in range({cpus})])
wall = time.perf_counter() - t0
print(json.dumps({{"agg_gb_s": {cpus} * 4 * {mb_per_task} / 1024 / wall}}))
ray.shutdown()
""",
            ],
            capture_output=True,
            text=True,
            timeout=600,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        out[cpus] = json.loads(line)["agg_gb_s"]
    return {
        "host_plasma_agg_gb_s": {c: round(v, 2) for c, v in out.items()},
        "host_plasma_ceiling": round(
            (out[n_hi] / out[n_lo]) / (n_hi / n_lo), 3
        ),
    }


def run_scaling() -> dict:
    """Fresh-process runs of the headline PageRank at N and 4N CPUs on
    the same input (sandbox proxy for N vs 4N cluster nodes) for two
    pairs: 2→8 and 8→32.  Uses the deterministic synthetic graph
    (default 12M raw edges) with a FIXED partition count so every run
    executes the identical partitioning.
    """
    scale_edges = os.environ.get("GRAFT_SCALE_EDGES", "12000000")
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "2"))
    cpu_configs = tuple(
        int(c)
        for c in os.environ.get("GRAFT_SCALING_CPUS", "2,8,32").split(",")
    )
    results = {}
    # interleave repetitions so time-varying host load (shared VM)
    # hits every config evenly; keep the best run per config
    for rep in range(repeats):
        for cpus in cpu_configs:
            env = dict(
                os.environ,
                RAY_GRAFT_CPUS=str(cpus),
                GRAFT_SCALE_EDGES=scale_edges,
            )
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--headline-only"],
                env=env,
                capture_output=True,
                text=True,
                timeout=1800,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            r = json.loads(line)
            best = results.get(cpus)
            if best is None or (
                r["pagerank_sec_per_iter"] < best["pagerank_sec_per_iter"]
            ):
                results[cpus] = r
    tput = {
        c: results[c]["pagerank_edges_per_sec_per_iter"] for c in results
    }
    effs = {}
    for lo, hi in zip(cpu_configs, cpu_configs[1:]):
        effs[f"scaling_efficiency_{lo}_to_{hi}"] = round(
            (tput[hi] / tput[lo]) / (hi / lo), 3
        )
    first_eff = next(iter(effs.values()))
    return {
        "metric": "scaling_efficiency_n_to_4n",
        "value": first_eff,
        "unit": "ratio",
        "queries": {f"pagerank_tput_{c}cpu": tput[c] for c in tput},
        "sf": _sf_label(SF_DIR),
        "num_cpus": list(cpu_configs),
        **effs,
        "host_compute_ceiling_8_to_32": _host_compute_ceiling(8, 32),
        "host_memory_bw_ceiling_8_to_32": _host_memory_bw_ceiling(8, 32),
        **_host_plasma_ceiling(8, 32),
        "sec_per_iter": {
            c: results[c]["pagerank_sec_per_iter"] for c in results
        },
        "num_edges": results[cpu_configs[-1]]["num_edges"],
    }


def run_compute_once() -> dict:
    """One fresh-session run of the compute-bound stage at $RAY_GRAFT_CPUS:
    MinHash signatures (shingle → 128-perm min-hash) over the documents
    table replicated ``GRAFT_COMPUTE_REPLICAS`` times.  Per-doc work is
    pure CPU (rolling hashes + numpy min reductions over small arrays),
    so aggregate throughput tracks cores, not memory channels."""
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        logging_level=logging.ERROR,
    )
    logging.getLogger("ray.data").setLevel(logging.CRITICAL)

    from igraph_ray.functions.dedup import _MinHashStage

    import pyarrow as pa

    replicas = int(os.environ.get("GRAFT_COMPUTE_REPLICAS", "48"))
    # Prepare the input OUTSIDE the timed window: replicate inside
    # blocks (a union of re-reads starves the pool: 40k vs 190k docs/s
    # measured at 32 cpus), repartition to a FIXED 256 blocks so both
    # CPU configs see identical task granularity (the raw read yields
    # ~8 row-group blocks, capping map_batches task parallelism), and
    # materialize so the timed pass measures the signature stage, not
    # single-file parquet decode.
    base = ray.data.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )

    def expand(batch: "pa.Table", _r=replicas) -> "pa.Table":
        return pa.concat_tables([batch] * _r)

    ds = (
        base.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(256)
        .materialize()
    )
    stage = _MinHashStage("doc_id", "text", k=7, num_perm=128, bands=16)

    def _sig(batch, _s=stage):
        return _s(batch)

    # warmup pass primes the worker pool
    ds.map_batches(
        _sig, batch_format="pyarrow", zero_copy_batch=True, batch_size=512
    ).count()
    t0 = time.perf_counter()
    n_docs = ds.map_batches(
        _sig, batch_format="pyarrow", zero_copy_batch=True, batch_size=512
    ).count()
    wall = time.perf_counter() - t0
    ray.shutdown()
    return {
        "metric": "minhash_docs_per_sec",
        "value": round(n_docs / wall, 1),
        "unit": "docs/sec",
        "queries": {"minhash_signatures": round(wall, 3)},
        "sf": _sf_label(SF_DIR),
        "num_cpus": NUM_CPUS,
        "n_docs": n_docs,
    }


def run_compute_scaling() -> dict:
    """Fresh-process N-vs-4N runs of the compute-bound MinHash stage —
    the second leg of the scaling evidence: graph kernels hit the
    single-host DRAM ceiling (see ``_host_memory_bw_ceiling``), while
    this stage shows the engine's scheduling/shuffle overhead itself
    scales, approaching the host COMPUTE ceiling."""
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "2"))
    cpu_configs = tuple(
        int(c)
        for c in os.environ.get("GRAFT_SCALING_CPUS", "8,32").split(",")
    )
    results: dict[int, dict] = {}
    for _ in range(repeats):
        for cpus in cpu_configs:
            env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus))
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--compute-only"],
                env=env,
                capture_output=True,
                text=True,
                timeout=1800,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            r = json.loads(line)
            best = results.get(cpus)
            if best is None or r["value"] > best["value"]:
                results[cpus] = r
    tput = {c: results[c]["value"] for c in results}
    effs = {}
    for lo, hi in zip(cpu_configs, cpu_configs[1:]):
        effs[f"scaling_efficiency_{lo}_to_{hi}"] = round(
            (tput[hi] / tput[lo]) / (hi / lo), 3
        )
    return {
        "metric": "compute_scaling_efficiency_n_to_4n",
        "value": next(iter(effs.values())),
        "unit": "ratio",
        "queries": {f"minhash_docs_per_sec_{c}cpu": tput[c] for c in tput},
        "sf": _sf_label(SF_DIR),
        "num_cpus": list(cpu_configs),
        **effs,
        "host_compute_ceiling_8_to_32": _host_compute_ceiling(8, 32),
        "n_docs": results[cpu_configs[-1]]["n_docs"],
    }


if __name__ == "__main__":
    if "--compute-only" in sys.argv:
        print(json.dumps(run_compute_once()))
    elif "--scaling-compute" in sys.argv:
        print(json.dumps(run_compute_scaling()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_suite("--headline-only" in sys.argv)))
