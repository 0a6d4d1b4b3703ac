"""igraph_ray — a Ray-Data-native link-graph analytics engine.

A from-scratch engine (NOT a port) with the core graph-kernel
capabilities of Graphina/igraph: PageRank (power iteration with
damping / personalization / dangling mass), connected components
(iterative min-label propagation), label-propagation community
detection, and triangle counting (degree-ordered wedge enumeration) —
over an edge table derived from a Parquet table of source-code
repositories ``(repo, path, commit, lang, content)``.

Everything is expressed Ray-Data-first: ``ray.data.Dataset`` pipelines,
``map_batches`` over zero-copy Arrow batches, stateful actor pools for
stages that hold an index (per-partition CSR blocks), and
``groupby``-shuffles for the wide steps.  See ``SURVEY.md`` for the
full design and the networkx-3.6.1 file:line citations that pin the
kernel semantics (the igraph/Graphina source is not present in this
sandbox — SURVEY.md §0).

Library code never calls ``ray.init``/``ray.shutdown``; sessions are
owned by the driver, ``bench.py``, or the pytest fixture.
"""

__version__ = "0.1.0"

import logging as _logging


class _EmptyBlockSchemaFilter(_logging.Filter):
    """Drop ONLY the benign variant of Ray Data's schema-divergence
    warning where the *new* schema is empty.

    Ray's sort machinery emits zero-column blocks for empty sort
    partitions (every ``groupby`` rides on sort), and the streaming
    executor then warns "Operator produced a RefBundle with a
    different schema ... new schema: ." once per empty partition —
    pure noise on skewed key spaces.  Genuine schema divergence (a
    non-empty differing schema) still warns.
    """

    def filter(self, record: _logging.LogRecord) -> bool:  # noqa: A003
        msg = record.getMessage()
        return not (
            "RefBundle with a different schema" in msg
            and "new schema: ." in msg
        )


_logging.getLogger(
    "ray.data._internal.execution.streaming_executor_state"
).addFilter(_EmptyBlockSchemaFilter())
