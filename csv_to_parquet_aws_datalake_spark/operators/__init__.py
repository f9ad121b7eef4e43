"""Batch query operators, one module per SURVEY.md §2 family."""

from . import (  # noqa: F401
    aggregation,
    joins,
    llm_pipeline,
    llm_text,
    llm_vectors,
    multimodal,
    projection,
    scalars,
    scans,
    sort_setops,
    udfs,
    windows,
)
