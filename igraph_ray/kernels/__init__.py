from igraph_ray.kernels.base import KernelRun, run_kernel, init_state_dataset  # noqa: F401
from igraph_ray.kernels.pagerank import (  # noqa: F401
    PageRankKernel,
    PowerIterationFailedConvergence,
    pagerank,
)
from igraph_ray.kernels.components import ComponentsKernel, connected_components  # noqa: F401
from igraph_ray.kernels.lpa import LabelPropagationKernel, label_propagation  # noqa: F401
from igraph_ray.kernels.triangles import (  # noqa: F401
    canonical_edges,
    local_clustering,
    total_triangles,
    transitivity,
    triangle_counts,
    triangle_list,
)
from igraph_ray.kernels.modularity import modularity  # noqa: F401
from igraph_ray.kernels.kcore import KCoreKernel, core_numbers  # noqa: F401
from igraph_ray.kernels.degree import out_degrees, undirected_degrees  # noqa: F401
from igraph_ray.kernels.scc import scc, strongly_connected_components  # noqa: F401
from igraph_ray.kernels.sssp import SSSPKernel, shortest_paths  # noqa: F401
from igraph_ray.kernels.leiden import leiden  # noqa: F401
from igraph_ray.kernels.louvain import louvain  # noqa: F401
from igraph_ray.kernels.betweenness import betweenness_centrality  # noqa: F401
from igraph_ray.kernels.walktrap import walktrap  # noqa: F401
from igraph_ray.kernels.community_extra import fastgreedy, girvan_newman  # noqa: F401
from igraph_ray.kernels.spinglass import spinglass  # noqa: F401
from igraph_ray.kernels.cohesion import cohesive_blocks  # noqa: F401
from igraph_ray.kernels.embeddings import skipgram_embeddings  # noqa: F401
from igraph_ray.kernels.layout import (  # noqa: F401
    drl_layout,
    fruchterman_reingold,
    kamada_kawai,
    sugiyama_layout,
)
from igraph_ray.kernels.coarsen import CommunityResult  # noqa: F401
