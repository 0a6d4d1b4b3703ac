"""Deterministic synthetic ``files`` table generator (FIXTURES.md §1).

Schema is exactly the BASELINE input_hint:
``repo:string, path:string, commit:string, lang:string, content:string``.

Design goals:
- same seed ⇒ byte-identical table (fixed seed PCG64, no wall clock);
- Zipf-distributed repo sizes so a few giant repos exercise skew paths;
- a shared path pool so identical paths recur across repos (E1 edges);
- round-robin commit assignment within a repo plus a small global pool
  of "vendored" commits shared across repos (E2 edges);
- ~2% of files duplicate another file's content verbatim across repos
  (E3 sha-match edges).

Fully vectorized numpy; emits pyarrow directly so multi-million-row
bench tables generate in seconds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_EXT_LANG = [("py", "py"), ("rs", "rs"), ("c", "c"), ("go", "go"), ("md", "md")]


def generate_files_table(
    n_files: int,
    seed: int = 42,
    n_orgs: int | None = None,
    dup_frac: float = 0.02,
    zipf_a: float = 1.3,
) -> pa.Table:
    """Generate a deterministic ``files`` table with ``n_files`` rows."""
    rng = np.random.Generator(np.random.PCG64(seed))
    n_repos = max(2, n_files // 40)
    n_orgs = n_orgs or max(2, n_repos // 8)

    # --- repo assignment: Zipf(a) sizes over n_repos repos ------------
    repo_weights = 1.0 / np.arange(1, n_repos + 1, dtype=np.float64) ** zipf_a
    repo_weights /= repo_weights.sum()
    repo_idx = rng.choice(n_repos, size=n_files, p=repo_weights)
    repo_idx.sort()  # files of a repo are contiguous (commit round-robin below)

    # --- path pool: ~0.3*n_files templates shared across repos --------
    n_paths = max(4, int(0.3 * n_files))
    path_idx = rng.integers(0, n_paths, size=n_files)
    ext_idx = path_idx % len(_EXT_LANG)

    # --- commits: per-repo round robin + ~1% vendored global pool -----
    # Rank of each file within its repo (repo_idx is sorted).
    _, repo_starts, repo_counts = np.unique(
        repo_idx, return_index=True, return_counts=True
    )
    within = np.arange(n_files) - np.repeat(repo_starts, repo_counts)
    commits_per_repo = np.maximum(1, repo_counts // 20)
    commit_local = within % np.repeat(commits_per_repo, repo_counts)
    n_vendored = max(1, n_files // 100)
    vendored_mask = rng.random(n_files) < 0.01
    vendored_id = rng.integers(0, n_vendored, size=n_files)

    # --- duplicated content: dup_frac of files copy an earlier file ---
    dup_mask = rng.random(n_files) < dup_frac
    dup_mask[0] = False
    dup_src = (rng.random(n_files) * np.arange(n_files)).astype(np.int64)

    # --- materialize strings (single pass, python-level but O(n) cheap
    #     string formatting; ~1M rows/s) -------------------------------
    repo_col = np.empty(n_files, dtype=object)
    path_col = np.empty(n_files, dtype=object)
    commit_col = np.empty(n_files, dtype=object)
    lang_col = np.empty(n_files, dtype=object)
    content_col = np.empty(n_files, dtype=object)

    repo_names = [f"org{r % n_orgs}/repo{r}" for r in range(n_repos)]
    exts = [e for e, _ in _EXT_LANG]
    langs = [l for _, l in _EXT_LANG]
    path_names = [
        f"src/m{p % 97}/f{p}.{exts[p % len(exts)]}" for p in range(n_paths)
    ]
    vendored_commits = [f"{v:040x}" for v in range(n_vendored)]

    for i in range(n_files):
        r = repo_idx[i]
        repo_col[i] = repo_names[r]
        p = path_idx[i]
        path_col[i] = path_names[p]
        if vendored_mask[i]:
            commit_col[i] = vendored_commits[vendored_id[i]]
        else:
            commit_col[i] = f"{(r * 1_000_003 + commit_local[i] + 1):040x}"
        lang_col[i] = langs[ext_idx[i]]
        if dup_mask[i]:
            content_col[i] = content_col[dup_src[i]]
        else:
            content_col[i] = (
                f"file {path_col[i]} rev {commit_col[i]} payload "
                f"{int(rng.integers(0, 2**62))} " + "x" * int(rng.integers(16, 64))
            )

    return pa.table(
        {
            "repo": pa.array(repo_col, type=pa.string()),
            "path": pa.array(path_col, type=pa.string()),
            "commit": pa.array(commit_col, type=pa.string()),
            "lang": pa.array(lang_col, type=pa.string()),
            "content": pa.array(content_col, type=pa.string()),
        }
    )


def write_files_parquet(path: str, n_files: int, seed: int = 42, **kw) -> str:
    """Generate and write a files table; returns ``path``."""
    pq.write_table(generate_files_table(n_files, seed=seed, **kw), path)
    return path


def synthetic_edge_dataset(
    num_edges: int,
    num_vertices: int | None = None,
    seed: int = 42,
    hub_frac: float = 0.1,
    edges_per_block: int = 1_000_000,
):
    """Deterministic large synthetic edge table as a Ray Dataset
    (FIXTURES.md §3 bench input).

    Each block is generated independently from (seed, block_index), so
    generation parallelizes and the table is identical across runs and
    CPU counts.  ``hub_frac`` of edges target a small hub set (V/1000
    vertices) for realistic skew.
    """
    import ray.data

    num_vertices = num_vertices or max(2, num_edges // 32)
    n_hubs = max(1, num_vertices // 1000)
    n_blocks = max(1, num_edges // edges_per_block)
    per_block = num_edges // n_blocks

    def gen(batch: pa.Table) -> pa.Table:
        out = []
        for b in batch.column("id").to_pylist():
            rng = np.random.Generator(np.random.PCG64([seed, int(b)]))
            src = rng.integers(0, num_vertices, per_block, dtype=np.int64)
            dst = rng.integers(0, num_vertices, per_block, dtype=np.int64)
            hub = rng.random(per_block) < hub_frac
            dst[hub] = rng.integers(0, n_hubs, int(hub.sum()), dtype=np.int64)
            out.append(
                pa.table(
                    {
                        "src": pa.array(src),
                        "dst": pa.array(dst),
                        "weight": pa.array(np.ones(per_block, np.float64)),
                    }
                )
            )
        return pa.concat_tables(out)

    return (
        ray.data.range(n_blocks)
        .repartition(num_blocks=n_blocks)
        .map_batches(gen, batch_format="pyarrow", zero_copy_batch=True)
    )
