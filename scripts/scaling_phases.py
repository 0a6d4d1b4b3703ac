"""Per-phase PageRank scaling adjudication (round-5 task #1).

The round-4 artifact recorded an 8→32 PageRank efficiency of 0.31
against a same-run host compute ceiling of 0.798 — under-explained.
This harness breaks every iteration into its three loop phases
(scatter+materialize, shuffle+apply+materialize, driver metric
reduction — ``KernelRun.phase_seconds``) and runs the identical job
(same synthetic graph, same fixed 32-part partitioning) in fresh
processes at 8 and 32 CPUs, interleaved, so the per-phase scaling of
each stage is measured rather than guessed.

Usage:
  python scripts/scaling_phases.py --once     # one run at $RAY_GRAFT_CPUS
  python scripts/scaling_phases.py            # orchestrate 8 vs 32, emit JSON
"""

from __future__ import annotations

import json
import logging
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE_EDGES = int(os.environ.get("GRAFT_SCALE_EDGES", "12000000"))
GRAPH_DIR = os.environ.get(
    "GRAFT_PHASE_GRAPH_DIR", "/tmp/igr_scaling_phase_graph"
)
ITERS = int(os.environ.get("GRAFT_PHASE_ITERS", "10"))
WARMUP = 3


def run_once() -> dict:
    import numpy as np
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        logging_level=logging.ERROR,
    )
    logging.getLogger("ray.data").setLevel(logging.CRITICAL)

    from bench import build_synth_graph
    from igraph_ray.kernels.pagerank import pagerank
    from igraph_ray.stages.partition import GraphMeta

    meta_path = os.path.join(GRAPH_DIR, "meta.json")
    if os.path.exists(meta_path):
        graph = GraphMeta.load(GRAPH_DIR)
    else:
        graph = build_synth_graph(GRAPH_DIR, SCALE_EDGES)

    run = pagerank(
        graph, tol=0.0, max_iter=ITERS, raise_on_nonconvergence=False
    )
    phases = {
        k: [round(x, 4) for x in v] for k, v in run.phase_seconds.items()
    }
    means = {
        k: round(float(np.mean(v[WARMUP:])), 4) for k, v in phases.items()
    }
    sec_per_iter = round(
        float(np.mean(run.seconds_per_iteration[WARMUP:])), 4
    )
    out = {
        "num_cpus": num_cpus,
        "num_edges": graph.num_edges,
        "sec_per_iter": sec_per_iter,
        "phase_means": means,
        "phase_series": phases,
    }
    ray.shutdown()
    return out


def plasma_ceiling(cpu_configs=(8, 32), mb_per_task: int = 256) -> dict:
    """Aggregate object-store WRITE bandwidth at n-way concurrency —
    the resource every scatter/shuffle/apply materialization spends
    (each phase ends with workers copying Arrow blocks into plasma).
    Ray tasks each build a fresh numpy block and ray.put it; the
    per-cpu-normalized 8→32 ratio is the ceiling a shuffle-bound
    kernel can reach on this host."""
    import numpy as np
    import ray

    out = {}
    for cpus in cpu_configs:
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
    t0 = time.perf_counter()
    reps = 4
    for r in range(reps):
        a = np.full(n, float(i + r))      # stream write (heap)
        ref = ray.put(a)                  # plasma copy
        del ref, a
    dt = time.perf_counter() - t0
    return reps * n * 8 / dt

t0 = time.perf_counter()
rates = ray.get([burn.remote(i) for i in range({cpus})])
wall = time.perf_counter() - t0
total = {cpus} * 4 * {mb_per_task} / 1024 / wall
print(json.dumps({{"agg_gb_s": total}}))
ray.shutdown()
""",
            ],
            capture_output=True,
            text=True,
            timeout=600,
        )
        line = [
            l for l in proc.stdout.splitlines() if l.startswith("{")
        ][-1]
        out[cpus] = json.loads(line)["agg_gb_s"]
    lo, hi = cpu_configs
    return {
        "plasma_agg_gb_s": {c: round(v, 2) for c, v in out.items()},
        "plasma_ceiling": round((out[hi] / out[lo]) / (hi / lo), 3),
    }


def orchestrate() -> dict:
    cpu_configs = tuple(
        int(c)
        for c in os.environ.get("GRAFT_SCALING_CPUS", "8,32").split(",")
    )
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "2"))
    best: dict[int, dict] = {}
    for rep in range(repeats):
        for cpus in cpu_configs:
            env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus))
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--once"],
                env=env,
                capture_output=True,
                text=True,
                timeout=1800,
            )
            lines = [
                l for l in out.stdout.splitlines() if l.startswith("{")
            ]
            if not lines:
                raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])
            r = json.loads(lines[-1])
            if (
                cpus not in best
                or r["sec_per_iter"] < best[cpus]["sec_per_iter"]
            ):
                best[cpus] = r
    lo, hi = cpu_configs[0], cpu_configs[-1]
    phase_eff = {}
    for k in best[lo]["phase_means"]:
        a, b = best[lo]["phase_means"][k], best[hi]["phase_means"][k]
        phase_eff[k] = round((a / b) / (hi / lo), 3) if b > 0 else None
    total_eff = round(
        (best[lo]["sec_per_iter"] / best[hi]["sec_per_iter"]) / (hi / lo),
        3,
    )
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import _host_compute_ceiling, _host_memory_bw_ceiling

    return {
        "metric": "pagerank_phase_scaling",
        "num_cpus": list(cpu_configs),
        "num_edges": best[hi]["num_edges"],
        "sec_per_iter": {c: best[c]["sec_per_iter"] for c in best},
        "phase_means": {c: best[c]["phase_means"] for c in best},
        "phase_efficiency": phase_eff,
        "scaling_efficiency": total_eff,
        **plasma_ceiling((lo, hi)),
        "host_compute_ceiling": _host_compute_ceiling(lo, hi),
        "host_memory_bw_ceiling": _host_memory_bw_ceiling(lo, hi),
        "phase_series": {c: best[c]["phase_series"] for c in best},
    }


if __name__ == "__main__":
    if "--once" in sys.argv:
        print(json.dumps(run_once()))
    else:
        print(json.dumps(orchestrate()))
