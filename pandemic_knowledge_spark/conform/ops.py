"""Per-row conform operators, expressed as native Column expressions.

The reference implements these as row-at-a-time Python functions
(format_date /root/reference/flow/scripts/insert_owid.py:62-69,
format_location :72-101, format_row :118-145, multi-pattern date
/root/reference/flow/scripts/parse_insert.py:54-75). Here every one is a
JVM-side expression so the whole conform stage stays inside whole-stage
codegen — no Python in the hot path at any scale.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def coalesce_candidates(
    df: DataFrame, mapping: Mapping[str, Sequence[str]]
) -> DataFrame:
    """P1 — resolve each logical column from a list of candidate headers.

    The reference scans `columns_allowed` per row and picks the first
    non-empty cell (/root/reference/flow/scripts/insert_owid.py:35-44,
    104-115). Spark-first: resolution against ``df.columns`` happens at
    plan-build time; per-row first-non-empty is ``coalesce(nullif(c,''))``.
    """
    out = df
    for logical, candidates in mapping.items():
        present = [c for c in candidates if c in df.columns]
        if not present:
            out = out.withColumn(logical, F.lit(None).cast("string"))
        else:
            out = out.withColumn(
                logical, F.coalesce(*[F.nullif(F.col(c).cast("string"), F.lit("")) for c in present])
            )
    return out


# The three dated patterns of /root/reference/flow/scripts/parse_insert.py:54-75
ISO_WEEK_RE = r"^\d{4}-W\d{1,2}$"
FR_DATE_RE = r"^\d{2}-\d{2}-\d{4}$"
ISO_DATE_RE = r"^\d{4}-\d{2}-\d{2}$"


def iso_week_monday(year: Column, week: Column) -> Column:
    """Monday of ISO week (year, week) via the Jan-4 rule: ISO week 1 always
    contains Jan 4; its Monday is jan4 - weekday(jan4).

    Guarded for ANSI mode (Spark 4 default): out-of-range years yield null
    instead of a runtime error — conform must be total on dirty input."""
    safe_year = F.when(year.between(1, 9999), year)
    jan4 = F.make_date(safe_year, F.lit(1), F.lit(4))
    week1_monday = F.date_sub(jan4, F.weekday(jan4))
    return F.date_add(week1_monday, (week - F.lit(1)) * F.lit(7))


def parse_date_multi(col: Column | str) -> Column:
    """P2/P3 — multi-pattern date normalize to a (date_start, date_end) struct.

    Patterns (mirroring /root/reference/flow/scripts/parse_insert.py:54-75):
    ``YYYY-Www`` ISO week → [monday, monday+6]; ``DD-MM-YYYY`` → that day;
    ``YYYY-MM-DD`` passthrough; '/' pre-cleaned to '-'. Unparseable → null
    struct (callers drop via F1).
    """
    raw = F.regexp_replace(F.trim(_c(col)), "/", "-")
    # try_cast: the year/week terms are now evaluated unconditionally by
    # the week-validity predicate; non-numeric prefixes are ANSI cast
    # errors with a plain cast.
    year = F.substring(raw, 1, 4).try_cast("int")
    # try_cast: week_ok evaluates the extract UNCONDITIONALLY (it is no
    # longer nested under the rlike branch), and '' casts are ANSI errors.
    week = F.regexp_extract(raw, r"W(\d{1,2})$", 1).try_cast("int")
    monday = iso_week_monday(year, week)
    # Week validity: the regex admits any 1-2 digit week; W0/W54+/W53-in-a-
    # 52-week-year would FABRICATE a date. weekofyear(monday-of-week-w) == w
    # exactly when the week exists, so invalid weeks fall through to the
    # fuzzy/quarantine path instead of conforming confidently wrong.
    week_ok = (
        raw.rlike(ISO_WEEK_RE)
        & week.between(1, 53)
        & (F.weekofyear(monday) == week)
    )
    # try_to_date: pattern-matched but invalid dates (e.g. "99-99-2021")
    # must conform to null, not raise — Spark 4 runs ANSI-on by default.
    day = F.when(week_ok, monday).otherwise(
        F.when(raw.rlike(FR_DATE_RE), F.try_to_date(raw, "dd-MM-yyyy")).otherwise(
            F.when(raw.rlike(ISO_DATE_RE), F.try_to_date(raw, "yyyy-MM-dd"))
        )
    )
    end = F.when(week_ok, F.date_add(monday, 6)).otherwise(day)
    return F.struct(day.alias("date_start"), end.alias("date_end"))


# Free-form residue formats, tried in order after the three declared
# patterns miss. Mirrors the reference's dateparser fallback
# (/root/reference/flow/scripts/insert_owid.py:62-69) with an explicit,
# deterministic format table instead of a heuristic library: day-first for
# numeric forms (the reference's sources are French), month-name forms in
# English both orders, plus compact ISO.
_FUZZY_FORMATS = (
    "%d %B %Y",      # 25 December 2021
    "%d %b %Y",      # 25 Dec 2021
    "%B %d, %Y",     # December 25, 2021
    "%b %d, %Y",     # Dec 25, 2021
    "%d-%m-%y",      # 25-12-21 (day-first, 2-digit year)
    "%Y%m%d",        # 20211225
    "%d %B, %Y",     # 25 December, 2021
    "%Y-%m",         # 2021-12 -> first of month
)


def fuzzy_parse_date_udf():
    """Arrow-batched pandas_udf parsing free-form date strings the three
    declared patterns miss (SURVEY P2 residue path). Vectorized per Arrow
    batch — never row-at-a-time over the full column; runs ONLY on the
    residue rows (see parse_date_total), which on conformant feeds is a
    tiny fraction. Returns null for still-unparsable input so callers can
    quarantine (W4), never raise."""
    import datetime as _dt

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _parse_one(s):
        if s is None:
            return None
        s = " ".join(str(s).split())
        for fmt in _FUZZY_FORMATS:
            try:
                return _dt.datetime.strptime(s, fmt).date()
            except ValueError:
                continue
        return None

    def _fuzzy(col):
        # Per-batch memoization: free-form feeds repeat a few distinct
        # strings (report dates), so parse each distinct value once.
        uniq = {v: _parse_one(v) for v in col.dropna().unique()}
        return col.map(lambda v: uniq.get(v))

    # Real annotation objects, not strings: this module uses
    # `from __future__ import annotations`, under which inline hints become
    # strings that pyspark's pandas_udf type-hint resolver rejects.
    _fuzzy.__annotations__ = {"col": pd.Series, "return": pd.Series}
    return pandas_udf(_fuzzy, "date")


def parse_date_total(
    df: DataFrame, col: Column | str, out: str = "date_span"
) -> tuple[DataFrame, DataFrame]:
    """P2 + W4 — TOTAL date conform: declared patterns first (pure JVM
    expressions), the Arrow pandas_udf fuzzy fallback only on the residue,
    and still-unparsable rows routed to a quarantine frame instead of being
    silently dropped. Returns (conformed, quarantined); the union of the
    two preserves every input row.

    Plan shape: the fuzzy UDF is guarded by the null-struct condition, so
    on a conformant 100 TB feed the Python stage sees only the residue
    rows' strings — the declared-pattern hot path stays in codegen."""
    raw = _c(col)
    base = df.withColumn("__declared", parse_date_multi(raw))
    fuzzy = fuzzy_parse_date_udf()
    fuzzy_day = F.when(
        F.col("__declared.date_start").isNull() & raw.isNotNull(), fuzzy(raw.cast("string"))
    )
    span = F.when(
        F.col("__declared.date_start").isNotNull(), F.col("__declared")
    ).otherwise(
        F.struct(
            fuzzy_day.alias("date_start"), fuzzy_day.alias("date_end")
        )
    )
    # Cache before the two-way split: both halves filter the SAME plan,
    # and without it a caller consuming good AND quarantined re-runs the
    # upstream scan plus the Arrow fuzzy UDF twice (the expensive part of
    # the conform stage on dirty feeds). Same retention stance as
    # sources.jsonl.read_jsonl: evictable MEMORY_AND_DISK blocks, shared
    # `.unpersist` via either returned frame's storage handle.
    parsed = base.withColumn(out, span).drop("__declared").cache()
    good = parsed.filter(F.col(f"{out}.date_start").isNotNull())
    quarantined = parsed.filter(F.col(f"{out}.date_start").isNull()).drop(out)
    return good, quarantined


def iso_week_span(ts: Column | str) -> tuple[Column, Column]:
    """Week-grain span of a timestamp: (monday, monday+6) — the conformed
    shape of the reference's ISO-week rows (parse_insert.py:58-64)."""
    start = F.date_trunc("week", _c(ts)).cast("date")
    return start, F.date_add(start, 6)


def numeric_coerce(col: Column | str, default: int = 0) -> Column:
    """P6 — ``int(float(x)) if x else default`` exactly
    (/root/reference/flow/scripts/insert_owid.py:137-141): empty/unparseable
    → default, else truncate toward zero like Python ``int()``.

    Total on dirty input under ANSI mode (Spark 4 default): NaN/±inf → the
    default (Python ``int()`` raises on those), and finite doubles beyond
    int64 saturate to the bounds instead of raising CAST_OVERFLOW — a feed
    with one '9e99' cell must conform, not kill the job."""
    d = _c(col).try_cast("double")
    i64_hi = float(2**63)  # exact as a double; >= means past max long
    return (
        F.when(
            d.isNull() | F.isnan(d) | (d == F.lit(float("inf"))) | (d == F.lit(float("-inf"))),
            F.lit(default).cast("long"),
        )
        .when(d >= F.lit(i64_hi), F.lit(2**63 - 1))
        .when(d <= F.lit(-i64_hi), F.lit(-(2**63)))
        .otherwise(d.cast("long"))
    )


def ratio_guarded(num: Column | str, den: Column | str, scale: float = 100.0) -> Column:
    """P7 — ratio with div-by-zero guard → null
    (/root/reference/flow/scripts/parse_insert.py:121-123)."""
    n, d = _c(num), _c(den)
    return F.when(d != 0, n / d * F.lit(scale))


def require_fields(df: DataFrame, *cols: str) -> DataFrame:
    """F1 — keep rows where every required field is non-null
    (/root/reference/flow/scripts/insert_owid.py:131)."""
    pred = F.lit(True)
    for c in cols:
        pred = pred & F.col(c).isNotNull()
    return df.filter(pred)


def with_provenance(df: DataFrame, source: str | None = None) -> DataFrame:
    """P12 — carry the source file / crawler name on every row
    (/root/reference/flow/scripts/insert_owid.py:142)."""
    col = F.lit(source) if source is not None else F.input_file_name()
    return df.withColumn("filename", col)


def with_uuid(df: DataFrame, name: str = "id") -> DataFrame:
    """K2 — synthetic per-row document id
    (/root/reference/flow/scripts/insert_owid.py:153-155)."""
    return df.withColumn(name, F.expr("uuid()"))
