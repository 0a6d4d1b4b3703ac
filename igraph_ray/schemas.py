"""Declared Arrow schemas for every logical table (SURVEY.md §1.2).

The reference model (igraph) is a columnar edge list over dense int64
vertex ids with separate attribute tables; we mirror that with fixed,
declared pyarrow schemas validated at stage boundaries.
"""

from __future__ import annotations

import pyarrow as pa

# Input table — exactly BASELINE.json input_hint.
FILES = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
    ]
)

# FILES plus the derived per-row content sha (invariant column, P1).
FILES_SHA = FILES.append(pa.field("content_sha", pa.string()))

VERTICES = pa.schema(
    [
        ("vid", pa.int64()),
        ("kind", pa.string()),  # 'repo' | 'file'
        ("key", pa.string()),
    ]
)

EDGES = pa.schema(
    [
        ("src", pa.int64()),
        ("dst", pa.int64()),
        ("weight", pa.float64()),
    ]
)

# Per-vertex kernel outputs.
RANKS = pa.schema([("vid", pa.int64()), ("rank", pa.float64())])
COMPONENTS = pa.schema([("vid", pa.int64()), ("component", pa.int64())])
LABELS = pa.schema([("vid", pa.int64()), ("label", pa.int64())])
TRIANGLES = pa.schema([("vid", pa.int64()), ("triangles", pa.int64())])
DEGREES = pa.schema(
    [
        ("vid", pa.int64()),
        ("degree", pa.int64()),
        ("weighted_degree", pa.float64()),
    ]
)

# Checkpoint lineage row (BASELINE.json north_star: "partition id,
# iteration, rows, residual").
LINEAGE = pa.schema(
    [
        ("part", pa.int32()),
        ("iteration", pa.int32()),
        ("rows", pa.int64()),
        ("residual", pa.float64()),
    ]
)


def validate(table: pa.Table, schema: pa.Schema, where: str = "") -> pa.Table:
    """Assert ``table`` carries at least the declared columns/types.

    Extra columns are allowed (stages may carry auxiliary columns);
    missing or mistyped columns raise immediately at the stage boundary
    instead of deep inside a kernel.
    """
    for field in schema:
        idx = table.schema.get_field_index(field.name)
        if idx < 0:
            raise TypeError(f"{where}: missing column {field.name!r}")
        actual = table.schema.field(idx).type
        if actual != field.type:
            raise TypeError(
                f"{where}: column {field.name!r} has type {actual}, "
                f"expected {field.type}"
            )
    return table
