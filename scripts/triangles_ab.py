"""Same-session repeated triangles measurement with in-run host
ceilings (the interleaved protocol from BASELINE.md "Large-graph
regression caught and fixed"): settles whether the round-2 driver
reading (20.9 s at sf0.1) vs the builder artifact (10.1 s, same code,
same day) was engine regression or shared-VM host variance.

Interleaves [ceiling, triangles, ceiling, triangles, ...] so every
engine number has a host measurement adjacent in time.  One Ray
session; nothing else may run concurrently.
"""

import json
import sys
import time

import numpy as np
import ray

sys.path.insert(0, "/root/repo")

from bench import _host_compute_ceiling, _host_memory_bw_ceiling  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def run_triangles() -> tuple[float, int]:
    import pyarrow as pa
    import ray.data as rd

    from igraph_ray.kernels.triangles import total_triangles, triangle_counts

    edges_ds = rd.read_parquet(
        f"{SF_DIR}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey"],
    )

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
    t0 = time.perf_counter()
    tc = triangle_counts(tri_edges)
    total = total_triangles(tc)
    return round(time.perf_counter() - t0, 3), int(total)


def main():
    import logging

    ray.init(
        address="local",
        num_cpus=32,
        include_dashboard=False,
        logging_level=logging.ERROR,
    )
    import multiprocessing as mp

    from bench import _burn, _stream

    out = {"sf_dir": SF_DIR, "num_cpus": 32, "runs": []}
    for i in range(REPS):
        # absolute 32-way host throughput adjacent in time to the
        # engine number — anchors the host-variance attribution
        with mp.Pool(32) as p:
            spin32 = sum(p.map(_burn, range(32)))
        with mp.Pool(32) as p:
            stream32 = sum(p.map(_stream, range(32)))
        sec, total = run_triangles()
        out["runs"].append(
            {
                "triangles_sec": sec,
                "total_triangles": total,
                "host_spin32_abs": spin32,
                "host_stream32_abs": stream32,
            }
        )
        print(json.dumps(out["runs"][-1]), flush=True)
    secs = [r["triangles_sec"] for r in out["runs"]]
    out["median_sec"] = sorted(secs)[len(secs) // 2]
    print(json.dumps(out))
    with open("/root/repo/BENCH/triangles_ab_r3.json", "w") as f:
        json.dump(out, f, indent=1)
    ray.shutdown()


if __name__ == "__main__":
    main()
