from igraph_ray.stages.sha import with_content_sha  # noqa: F401
from igraph_ray.stages.normalize import normalize_files, filter_lang  # noqa: F401
from igraph_ray.stages.edge_rules import (  # noqa: F401
    key_edges,
    shared_path_edges,
    commit_cooccurrence_edges,
    content_sha_edges,
)
from igraph_ray.stages.sample import hash_sample, random_sample  # noqa: F401
from igraph_ray.stages.symmetrize import symmetrize_dedup  # noqa: F401
from igraph_ray.stages.vertex_ids import assign_vertex_ids, attach_vids  # noqa: F401
