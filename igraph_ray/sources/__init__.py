from igraph_ray.sources.parquet import read_files, write_table  # noqa: F401
from igraph_ray.sources.synth import generate_files_table  # noqa: F401
