"""North-star scale run (BASELINE.json:2): build the deterministic
synthetic edge graph at ~10^9-arc scale (graph D, FIXTURES.md §3
scaled), run PageRank to 1e-6 convergence plus a fixed-iteration
throughput pass, and components to fixpoint, recording per-iteration
throughput, wall times, disk/object-store footprint and spill health
to a JSON artifact.

Usage:
    python scripts/bench_big.py [num_undirected_edges] [out.json]

Defaults: 500_000_000 generated edges (symmetrized to ~1B arcs),
BENCH/bench_1B.json.  CPU count from $RAY_GRAFT_CPUS (default 32).
The generator is block-deterministic (seed 42), so the graph is
byte-identical across runs and CPU counts.
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _df_free_gb(path: str) -> float:
    st = os.statvfs(path)
    return round(st.f_bavail * st.f_frsize / 2**30, 2)


def _du_gb(path: str) -> float:
    try:
        out = subprocess.run(
            ["du", "-sb", path], capture_output=True, text=True, timeout=600
        ).stdout.split()[0]
        return round(int(out) / 2**30, 2)
    except Exception:
        return float("nan")


def main() -> None:
    num_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH/bench_1B.json"
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import numpy as np
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        logging_level=logging.ERROR,
        # keep the per-iteration message shuffle in plasma (RAM-backed
        # /dev/shm) — the default 30%-of-RAM store forces spill onto a
        # disk that the 48 GB CSR block store already occupies
        object_store_memory=64 * 1024**3,
    )
    logging.getLogger("ray.data").setLevel(logging.CRITICAL)

    from igraph_ray.api import build_graph
    from igraph_ray.kernels.components import connected_components
    from igraph_ray.kernels.pagerank import pagerank
    from igraph_ray.sources.synth import synthetic_edge_dataset

    res: dict[str, object] = {
        "metric": "north_star_scale_run",
        "generated_edges": num_edges,
        "num_cpus": num_cpus,
        "seed": 42,
        "disk_free_gb_start": _df_free_gb("/tmp"),
    }
    # fixed dir: the disk-staged build resumes per partition, so a
    # failed run (e.g. spill exhaustion in a later phase) reuses the
    # finished CSR blocks instead of rebuilding ~15 minutes of work
    graph_dir = os.environ.get("GRAFT_1B_DIR", "/tmp/igr_1b_graph")
    os.makedirs(graph_dir, exist_ok=True)
    ok = False

    def flush():
        # crash-resilient: the artifact carries every finished phase
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(res, f, indent=1)

    try:
        t0 = time.perf_counter()
        # 4M-edge generator blocks keep the staged write at ~1 file
        # per (block, part) without a small-files explosion
        edges = synthetic_edge_dataset(
            num_edges, seed=42, edges_per_block=4_000_000
        )
        # disk-staged build: the in-store shuffle's concurrent copies
        # (~3x the arc table) exceed this sandbox's spill budget at
        # 10^9 arcs; the staged build streams one block at a time and
        # is per-partition resumable.  128 parts ≈ 260 MB CSR blocks
        # at 10^9 arcs — big enough to amortize per-task overhead,
        # small enough for worker heaps.
        num_parts = 128 if num_edges >= 100_000_000 else None
        graph = build_graph(
            edges,
            os.path.join(graph_dir, "g"),
            num_parts=num_parts,
            symmetrize=True,
            mode="disk",
        )
        res["build_sec"] = round(time.perf_counter() - t0, 1)
        res["num_vertices"] = graph.num_vertices
        res["num_arcs"] = graph.num_edges
        res["num_parts"] = graph.num_parts
        res["csr_disk_gb"] = _du_gb(graph_dir)
        res["disk_free_gb_after_build"] = _df_free_gb("/tmp")
        flush()
        print("BUILD", json.dumps(res), flush=True)

        # convergence run — the reference semantics (L1 < N*tol at 1e-6)
        t0 = time.perf_counter()
        run = pagerank(
            graph, tol=1e-6, max_iter=60, raise_on_nonconvergence=False
        )
        res["pagerank_wall_to_1e6_sec"] = round(time.perf_counter() - t0, 1)
        res["pagerank_iterations_to_1e6"] = run.iterations
        res["pagerank_converged"] = run.converged

        # throughput pass: fixed 10 iterations for a stable per-iter
        # number (the convergence pass can stop after very few)
        run = pagerank(
            graph, tol=0.0, max_iter=10, raise_on_nonconvergence=False
        )
        sp = run.seconds_per_iteration
        per_iter = float(np.mean(sp[3:])) if len(sp) > 3 else float("nan")
        res["pagerank_sec_per_iter"] = round(per_iter, 2)
        res["pagerank_edges_per_sec_per_iter"] = (
            round(graph.num_edges / per_iter) if per_iter == per_iter else None
        )
        res["pagerank_sec_per_iter_series"] = [round(s, 2) for s in sp[:12]]
        flush()
        print("PAGERANK", json.dumps(res), flush=True)

        t0 = time.perf_counter()
        crun = connected_components(graph)
        res["components_wall_sec"] = round(time.perf_counter() - t0, 1)
        res["components_iterations"] = crun.iterations
        res["components_converged"] = crun.converged
        flush()

        res["disk_free_gb_end"] = _df_free_gb("/tmp")
        try:
            from ray._private.internal_api import memory_summary

            res["object_store_summary"] = memory_summary(
                address=ray.get_runtime_context().gcs_address,
                stats_only=True,
            )
        except Exception as exc:  # summary is best-effort diagnostics
            res["object_store_summary"] = f"unavailable: {exc}"
        res["spill_failures"] = 0  # any spill failure raises mid-run
        ok = True
    finally:
        if ok:
            shutil.rmtree(graph_dir, ignore_errors=True)
        ray.shutdown()

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
