"""CLI entry point — the ``ray job submit`` surface (BASELINE.json
north_rule: "run via ray job submit on a fixed-size multi-node Ray
cluster").

Examples::

    ray job submit -- python -m igraph_ray build \
        --files /data/files.parquet --graph-dir /shared/graph

    ray job submit -- python -m igraph_ray pagerank \
        --graph-dir /shared/graph --output /shared/ranks \
        --checkpoint-dir /shared/ckpt --resume

    python -m igraph_ray flagship --files /data/files.parquet \
        --output /tmp/out --top-k 100

The CLI owns the Ray session only when standalone (``ray.init`` is
guarded), so the same commands work inside ``ray job submit`` where the
cluster is already initialised.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="auto" if _on_cluster() else "local")
    return ray


def _on_cluster() -> bool:
    import os

    return bool(os.environ.get("RAY_ADDRESS")) and os.environ.get(
        "RAY_ADDRESS"
    ) not in ("local",)


def _write(ds, output: str | None, label: str):
    if output:
        ds.write_parquet(output)
        print(json.dumps({label: "written", "output": output}))
    else:
        n = ds.count()
        print(json.dumps({label: "ok", "rows": n}))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="igraph_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="files parquet → partitioned link graph")
    b.add_argument("--files", required=True)
    b.add_argument("--graph-dir", required=True)
    b.add_argument("--num-parts", type=int, default=None)

    for name in ("pagerank", "components", "lpa"):
        k = sub.add_parser(name, help=f"run {name} over a built graph")
        k.add_argument("--graph-dir", required=True)
        k.add_argument("--output", default=None)
        k.add_argument("--checkpoint-dir", default=None)
        k.add_argument("--resume", action="store_true")
        k.add_argument("--max-iter", type=int, default=100)
        if name == "pagerank":
            k.add_argument("--alpha", type=float, default=0.85)
            k.add_argument("--tol", type=float, default=1e-6)

    t = sub.add_parser("triangles", help="triangle counts over an edge parquet")
    t.add_argument("--edges", required=True)
    t.add_argument("--output", default=None)

    f = sub.add_parser("flagship", help="files parquet → pagerank top-k")
    f.add_argument("--files", required=True)
    f.add_argument("--output", default=None)
    f.add_argument("--top-k", type=int, default=None)

    args = p.parse_args(argv)
    _ensure_ray()

    if args.cmd == "build":
        import ray.data

        from igraph_ray.pipelines.graph_build import build_file_graph

        files = ray.data.read_parquet(args.files)
        built = build_file_graph(
            files, args.graph_dir, num_parts=args.num_parts
        )
        print(
            json.dumps(
                {
                    "graph_dir": args.graph_dir,
                    "num_vertices": built.graph.num_vertices,
                    "num_edges": built.graph.num_edges,
                    "num_parts": built.graph.num_parts,
                }
            )
        )
    elif args.cmd in ("pagerank", "components", "lpa"):
        from igraph_ray.stages.partition import GraphMeta

        graph = GraphMeta.load(args.graph_dir)
        if args.cmd == "pagerank":
            from igraph_ray.kernels.pagerank import pagerank

            run = pagerank(
                graph,
                alpha=args.alpha,
                tol=args.tol,
                max_iter=args.max_iter,
                checkpoint_dir=args.checkpoint_dir,
                resume=args.resume,
                raise_on_nonconvergence=False,
            )
        elif args.cmd == "components":
            from igraph_ray.kernels.components import connected_components

            run = connected_components(
                graph,
                max_iter=args.max_iter,
                checkpoint_dir=args.checkpoint_dir,
                resume=args.resume,
            )
        else:
            from igraph_ray.kernels.lpa import label_propagation

            run = label_propagation(
                graph,
                max_iter=args.max_iter,
                checkpoint_dir=args.checkpoint_dir,
                resume=args.resume,
            )
        print(
            json.dumps(
                {
                    "iterations": run.iterations,
                    "converged": run.converged,
                    "sec_per_iter": [
                        round(s, 3) for s in run.seconds_per_iteration
                    ],
                }
            )
        )
        _write(run.state, args.output, args.cmd)
    elif args.cmd == "triangles":
        import ray.data

        from igraph_ray.kernels.triangles import triangle_counts

        edges = ray.data.read_parquet(args.edges)
        _write(triangle_counts(edges), args.output, "triangles")
    elif args.cmd == "flagship":
        import ray.data

        from igraph_ray.pipelines.flagship import flagship

        files = ray.data.read_parquet(args.files)
        out = flagship(files, top_k=args.top_k)
        _write(out, args.output, "flagship")
    return 0


if __name__ == "__main__":
    sys.exit(main())
