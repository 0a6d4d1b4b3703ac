"""FIXTURES.md §4: SIGKILL a checkpointing PageRank run mid-algorithm
in a separate process, resume, and compare with an uninterrupted run —
bitwise-equal final state."""

import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import networkx as nx

from igraph_ray.kernels import pagerank
from tests.util import graph_from_nx, state_dict

_RUNNER = """
import sys, logging, ray
sys.path.insert(0, {repo!r})
ray.init(address="local", num_cpus=2, include_dashboard=False,
         logging_level=logging.ERROR)
logging.getLogger("ray.data").setLevel(logging.CRITICAL)
from igraph_ray.stages.partition import GraphMeta
from igraph_ray.kernels import pagerank
graph = GraphMeta.load({graph_dir!r})
pagerank(graph, tol=1e-12, max_iter=40, checkpoint_dir={ckpt!r},
         raise_on_nonconvergence=False)
"""


def test_sigkill_resume_bitwise(tmp_graph_dir, tmp_path):
    G = nx.gnm_random_graph(150, 600, seed=17)
    g = graph_from_nx(G, tmp_graph_dir, num_parts=3)
    ckpt = str(tmp_path / "ck")

    # launch the checkpointing run in a separate process and SIGKILL it
    # once at least 3 complete checkpoints exist
    script = _RUNNER.format(
        repo=str(Path(__file__).resolve().parents[1]),
        graph_dir=tmp_graph_dir,
        ckpt=ckpt,
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", script],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    try:
        deadline = time.time() + 180
        from igraph_ray.state.checkpoint import latest_complete_iteration

        while time.time() < deadline:
            it = latest_complete_iteration(ckpt)
            if it is not None and it >= 3:
                break
            if proc.poll() is not None:
                break  # finished before we could kill it (still fine)
            time.sleep(0.25)
        if proc.poll() is None:
            os.kill(proc.pid, signal.SIGKILL)
    finally:
        proc.wait(timeout=60)

    killed_at = latest_complete_iteration(ckpt)
    assert killed_at is not None, "no checkpoint was written before the kill"

    # resume in-process and compare to an uninterrupted run
    resumed = pagerank(
        g, tol=1e-12, max_iter=40, checkpoint_dir=ckpt, resume=True,
        raise_on_nonconvergence=False,
    )
    full = pagerank(g, tol=1e-12, max_iter=40, raise_on_nonconvergence=False)
    assert state_dict(resumed.state, "rank") == state_dict(full.state, "rank")
