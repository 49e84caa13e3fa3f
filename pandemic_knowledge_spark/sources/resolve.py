"""F3/F4 — plan-time candidate-header validation and per-file isolation.

The reference rejects a whole file when any required logical column cannot
be resolved from its headers (/root/reference/flow/scripts/
parse_insert.py:168-185) and wraps each file in try/except so one bad file
never kills the run (/root/reference/flow/scripts/insert_owid.py:217-228).
Both are *driver-side plan checks* here — the distributed scan only ever
sees files that passed, so no per-row Python runs anywhere.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import DataFrame


class MalformedFileError(ValueError):
    """Required logical column unresolvable from a file's headers (F3)."""

    def __init__(self, path: str, missing: list[str]) -> None:
        self.path = path
        self.missing = missing
        super().__init__(f"{path}: unresolvable logical columns {missing}")


def require_resolvable(
    columns: Sequence[str],
    mapping: Mapping[str, Sequence[str]],
    required: Sequence[str],
    path: str = "<df>",
) -> None:
    """F3 — raise MalformedFileError unless every required logical column has
    at least one candidate header present in ``columns``."""
    present = set(columns)
    missing = [
        logical
        for logical in required
        if not any(c in present for c in mapping.get(logical, ()))
    ]
    if missing:
        raise MalformedFileError(path, missing)


def ingest_isolated(
    paths: Sequence[str],
    load_one: Callable[[str], DataFrame],
) -> tuple[DataFrame | None, list[tuple[str, Exception]]]:
    """F4 — run ``load_one`` per file; collect failures instead of aborting.

    Returns (union of successful frames or None, [(path, error), ...]).
    Matches the reference's per-file try/except-log-continue
    (insert_owid.py:222-228); union is by name so schema drift across files
    is tolerated the way ES dynamic mapping tolerated it.
    """
    good: DataFrame | None = None
    errors: list[tuple[str, Exception]] = []
    for p in paths:
        try:
            df = load_one(p)
            good = df if good is None else good.unionByName(df, allowMissingColumns=True)
        except Exception as e:  # noqa: BLE001 — per-file isolation is the point
            errors.append((p, e))
    return good, errors
