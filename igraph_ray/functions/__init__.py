from igraph_ray.functions.text import (  # noqa: F401
    language_id,
    quality_score,
    token_count,
    winnow_fingerprints,
)
from igraph_ray.functions.dedup import (  # noqa: F401
    exact_dedup,
    minhash_near_dup_pairs,
    near_dedup,
    simhash_near_dup_pairs,
)
from igraph_ray.functions.similarity import (  # noqa: F401
    brute_force_topk,
    embedding_near_dup_pairs,
    ivf_topk,
    kmeans,
    lsh_topk,
)
