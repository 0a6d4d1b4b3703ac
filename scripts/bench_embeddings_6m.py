"""Sharded-SGNS demonstration past the broadcast cap (round-5 task
#2 "Done" criterion): train node embeddings on a synthetic walk
corpus over a 6M-vertex vocabulary — above ``BROADCAST_MAX_VOCAB``
(5M), so ``skipgram_embeddings`` routes to the grid-cell sharded
trainer (``skipgram_embeddings_sharded``: range-slabbed model shards,
cell-sorted pairs, shard-local negatives, incremental exact Adagrad
apply).

The corpus is deterministic ring walks (walk w covers vertices
``w*stride .. w*stride+L`` mod n), giving the trainer real locality
structure so the loss must drop.  Records wall times, per-round loss,
shard geometry and peak driver RSS to ``BENCH/embeddings_6M.json``.

Usage: python scripts/bench_embeddings_6m.py [n_vertices] [out.json]
"""

from __future__ import annotations

import json
import logging
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH/embeddings_6M.json"
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    n_walks = int(os.environ.get("GRAFT_EMB_WALKS", "600000"))
    length = 10
    rounds = int(os.environ.get("GRAFT_EMB_ROUNDS", "2"))

    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        logging_level=logging.ERROR,
    )
    logging.getLogger("ray.data").setLevel(logging.CRITICAL)

    from igraph_ray.kernels import embeddings as emb

    def gen(batch: pa.Table) -> pa.Table:
        wid = batch.column("id").to_numpy(zero_copy_only=False)
        stride = 7
        cols = {"walk_id": pa.array(wid.astype(np.int64))}
        for s in range(length + 1):
            cols[f"p{s}"] = pa.array(
                ((wid.astype(np.int64) * stride + s) % n).astype(np.int64)
            )
        return pa.table(cols)

    walks = ray.data.range(n_walks).map_batches(
        gen, batch_format="pyarrow", zero_copy_batch=True
    )

    assert n > emb.BROADCAST_MAX_VOCAB, "demo must exceed the broadcast cap"
    t0 = time.perf_counter()
    res = emb.skipgram_embeddings(  # routes to the sharded trainer
        walks,
        num_vertices=n,
        dim=16,
        window=2,
        negatives=3,
        rounds=rounds,
        seed=0,
    )
    wall = time.perf_counter() - t0
    slab = -(-n // max(1, -(-n // emb.SHARD_ROWS)))
    out = {
        "metric": "sharded_sgns_past_broadcast_cap",
        "num_vertices": n,
        "broadcast_max_vocab": emb.BROADCAST_MAX_VOCAB,
        "num_cpus": num_cpus,
        "n_walks": n_walks,
        "walk_length": length,
        "dim": 16,
        "window": 2,
        "negatives": 3,
        "rounds": rounds,
        "wall_sec": round(wall, 1),
        "sec_per_round": round(wall / max(1, rounds), 1),
        "loss_history": [round(v, 6) for v in res.loss_history],
        "loss_decreased": res.loss_history[-1] < res.loss_history[0],
        "num_shards": -(-n // slab),
        "shard_rows": slab,
        "embeddings_rows": res.embeddings.num_rows,
        "driver_peak_rss_gb": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20, 2
        ),
    }
    ray.shutdown()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
