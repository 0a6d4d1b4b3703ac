"""Second kernel at the 10^9-arc north star (round-5 task #8): label
propagation over the same deterministic synthetic graph as
``bench_big.py``, with the RAM-store sizing lesson applied from the
start (64 GiB plasma so the per-iteration label shuffle stays in
/dev/shm; disk-staged resumable build into the shared fixed dir).

LPA at this scale is run as a FIXED-ITERATION throughput pass
(``GRAFT_1B_LPA_ITERS``, default 10) with the changed-vertex series
recorded — the fixpoint wall time is graph-structure-dependent and
the metric of record (BASELINE.json:2) is per-iteration edge
throughput.

Usage:
    python scripts/bench_big_lpa.py [num_undirected_edges] [out.json]

Defaults: 500_000_000 edges (~1B arcs), BENCH/bench_1B_lpa.json.
Reuses ``$GRAFT_1B_DIR`` (default /tmp/igr_1b_graph): if bench_big's
CSR store is still on disk the build phase is skipped entirely.
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_big import _df_free_gb, _du_gb  # noqa: E402


def main() -> None:
    num_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH/bench_1B_lpa.json"
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    lpa_iters = int(os.environ.get("GRAFT_1B_LPA_ITERS", "10"))

    import numpy as np
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        logging_level=logging.ERROR,
        object_store_memory=64 * 1024**3,
    )
    logging.getLogger("ray.data").setLevel(logging.CRITICAL)

    from igraph_ray.api import build_graph
    from igraph_ray.sources.synth import synthetic_edge_dataset

    res: dict[str, object] = {
        "metric": "north_star_scale_run_lpa",
        "generated_edges": num_edges,
        "num_cpus": num_cpus,
        "seed": 42,
        "disk_free_gb_start": _df_free_gb("/tmp"),
    }
    graph_dir = os.environ.get("GRAFT_1B_DIR", "/tmp/igr_1b_graph")
    os.makedirs(graph_dir, exist_ok=True)
    ok = False

    def flush():
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(res, f, indent=1)

    try:
        t0 = time.perf_counter()
        edges = synthetic_edge_dataset(
            num_edges, seed=42, edges_per_block=4_000_000
        )
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

        # phases=4 (vs the 2-phase default): each superstep activates
        # a quarter of the destinations, so the per-superstep message
        # table (~44 B/arc before combining — labels are distinct
        # early, so little combines) stays inside the 64 GiB plasma
        # instead of spilling past the ~30 GB of disk left beside the
        # 48 GB CSR store — the first attempt died of OutOfDisk at
        # phases=2.  Throughput is reported per FULL SWEEP (phases
        # supersteps = every arc messaged once).
        phases = int(os.environ.get("GRAFT_1B_LPA_PHASES", "4"))
        from igraph_ray.kernels.base import run_kernel
        from igraph_ray.kernels.lpa import LabelPropagationKernel

        kernel = LabelPropagationKernel(
            num_parts=graph.num_parts, weighted=True, phases=phases
        )
        t0 = time.perf_counter()
        run = run_kernel(kernel, graph, max_iter=lpa_iters)
        wall = time.perf_counter() - t0
        sp = run.seconds_per_iteration
        per_iter = float(np.mean(sp[3:])) if len(sp) > 3 else float("nan")
        res["lpa_phases"] = phases
        res["lpa_wall_sec"] = round(wall, 1)
        res["lpa_iterations"] = run.iterations
        res["lpa_converged"] = run.converged
        res["lpa_sec_per_superstep"] = round(per_iter, 2)
        res["lpa_sec_per_sweep"] = round(per_iter * phases, 2)
        res["lpa_edges_per_sec_per_sweep"] = (
            round(graph.num_edges / (per_iter * phases))
            if per_iter == per_iter
            else None
        )
        res["lpa_sec_per_iter_series"] = [round(s, 2) for s in sp]
        res["lpa_changed_series"] = [
            int(m.get("changed", -1)) for m in run.metrics_history
        ]
        res["lpa_phase_means"] = {
            k: (round(float(np.mean(v[3:])), 3) if len(v) > 3 else None)
            for k, v in run.phase_seconds.items()
        }
        flush()
        print("LPA", json.dumps(res), flush=True)

        res["disk_free_gb_end"] = _df_free_gb("/tmp")
        res["spill_failures"] = 0  # any spill failure raises mid-run
        ok = True
    finally:
        if ok and os.environ.get("GRAFT_1B_KEEP", "0") != "1":
            shutil.rmtree(graph_dir, ignore_errors=True)
        ray.shutdown()

    flush()
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
