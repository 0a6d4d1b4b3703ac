from igraph_ray.pipelines.graph_build import build_file_graph, GraphBuildResult  # noqa: F401
from igraph_ray.pipelines.flagship import flagship  # noqa: F401
