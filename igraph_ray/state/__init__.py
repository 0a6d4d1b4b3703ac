from igraph_ray.state.checkpoint import (  # noqa: F401
    CheckpointManager,
    latest_complete_iteration,
)
