"""Conform operators (SURVEY.md §2.3-§2.4): per-row transforms P1-P13 and
row/file validity filters F1-F4, as composable DataFrame→DataFrame functions."""

from pandemic_knowledge_spark.conform.ops import (  # noqa: F401
    coalesce_candidates,
    iso_week_span,
    numeric_coerce,
    parse_date_multi,
    ratio_guarded,
    require_fields,
    with_provenance,
    with_uuid,
)
