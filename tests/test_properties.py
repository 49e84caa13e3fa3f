"""Property-based conform tests (SURVEY.md §5 item 3, via hypothesis):
conform is TOTAL — arbitrary dirty strings never throw, they produce the
reference's exact drop/default semantics.

Strategy note: hypothesis drives data generation; each property evaluates
ONE Spark job over the whole generated batch (not a job per example), so
the suite stays fast while still exploring the input space.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pandemic_knowledge_spark.conform.ops import (
    numeric_coerce,
    parse_date_multi,
    ratio_guarded,
)
from pandemic_knowledge_spark.functions.text import lang_id, quality_score, tokenize

SETTINGS = settings(
    max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)

dirty_strings = st.lists(
    st.one_of(
        st.none(),
        st.text(max_size=24),
        st.from_regex(r"\d{4}-W\d{1,2}", fullmatch=True),
        st.from_regex(r"\d{2}-\d{2}-\d{4}", fullmatch=True),
        st.from_regex(r"\d{4}-\d{2}-\d{2}", fullmatch=True),
        st.dates().map(str),
    ),
    min_size=1,
    max_size=40,
)


@SETTINGS
@given(dirty_strings)
def test_parse_date_multi_is_total(spark, values):
    """P2/P3 totality: any string → a (date_start, date_end) struct or null,
    never an exception; when both sides parse, start <= end and the span is
    0 or 6 days (ISO-week expansion)."""
    df = spark.createDataFrame([(v,) for v in values], schema="raw string")
    out = df.select(parse_date_multi("raw").alias("d")).select("d.*").collect()
    assert len(out) == len(values)
    for r in out:
        if r.date_start is not None and r.date_end is not None:
            span = (r.date_end - r.date_start).days
            assert span in (0, 6)


fuzzy_strings = st.lists(
    st.one_of(
        st.none(),
        st.text(max_size=24),
        st.dates().map(lambda d: d.strftime("%d %B %Y")),
        st.dates().map(lambda d: d.strftime("%b %d, %Y")),
        st.dates().map(lambda d: d.strftime("%Y%m%d")),
        st.dates().map(str),
        st.from_regex(r"\d{4}-W\d{1,2}", fullmatch=True),
    ),
    min_size=1,
    max_size=30,
)


@SETTINGS
@given(fuzzy_strings)
def test_parse_date_total_never_drops_rows(spark, values):
    """P2 residue + W4: the fuzzy-fallback conform is TOTAL — every input
    row lands in exactly one of (conformed, quarantined); no exception, no
    silent drop; free-form month-name dates that the declared patterns miss
    are recovered by the pandas_udf fallback."""
    from pandemic_knowledge_spark.conform.ops import parse_date_total

    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)],
                               schema="id long, raw string")
    good, quarantined = parse_date_total(df, "raw")
    good_ids = {r.id for r in good.select("id").collect()}
    quar_ids = {r.id for r in quarantined.select("id").collect()}
    assert good_ids | quar_ids == set(range(len(values)))
    assert good_ids.isdisjoint(quar_ids)
    for r in good.select("date_span.*").collect():
        assert r.date_start is not None
        assert (r.date_end - r.date_start).days in (0, 6)


def test_fuzzy_fallback_recovers_month_name_dates(spark):
    import datetime

    rows = [
        (0, "25 December 2021"),
        (1, "Dec 25, 2021"),
        (2, "20211225"),
        (3, "2021-12-25"),   # declared pattern — must NOT go through Python
        (4, "not a date"),
        (5, None),
    ]
    from pandemic_knowledge_spark.conform.ops import parse_date_total

    df = spark.createDataFrame(rows, "id long, raw string")
    good, quarantined = parse_date_total(df, "raw")
    got = {r.id: r.date_span.date_start for r in good.collect()}
    want_day = datetime.date(2021, 12, 25)
    assert got == {0: want_day, 1: want_day, 2: want_day, 3: want_day}
    assert {r.id for r in quarantined.collect()} == {4, 5}


NUMERIC_ALPHABET = "0123456789.+- eExyz"  # ascii only: Python float() accepts
# unicode digits (e.g. '٧') that Spark's cast rejects — a deliberate
# non-goal, so the generator sticks to the reference's actual input space.


@SETTINGS
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.text(alphabet=NUMERIC_ALPHABET, max_size=12),
            st.integers(-(10**12), 10**12).map(str),
            st.floats(
                allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
            ).map(str),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_numeric_coerce_matches_reference_python(spark, values):
    """P6 ≡ `int(float(x)) if x else 0` (insert_owid.py:137-141), including
    truncation toward zero and unparseable → default."""
    df = spark.createDataFrame([(v,) for v in values], schema="raw string")
    got = [r.n for r in df.select(numeric_coerce("raw").alias("n")).collect()]

    I64 = 2**63 - 1

    def ref(x):
        try:
            v = int(float(x)) if x else 0
        except (TypeError, ValueError, OverflowError):
            return 0
        # Spark saturates double→long beyond int64; mirror it (values this
        # large only arise from exponent strings like '9e99')
        return max(-I64 - 1, min(I64, v))

    want = [ref(v) for v in values]
    assert got == want


@SETTINGS
@given(
    st.lists(
        st.tuples(
            st.integers(0, 10**6), st.integers(0, 10**6)
        ),
        min_size=1,
        max_size=30,
    )
)
def test_ratio_guarded_never_divides_by_zero(spark, pairs):
    df = spark.createDataFrame(pairs, ["num", "den"])
    rows = df.select(
        "den", ratio_guarded(F.col("num"), F.col("den")).alias("pct")
    ).collect()
    for r in rows:
        assert (r.pct is None) == (r.den == 0)


@SETTINGS
@given(st.lists(st.text(max_size=60), min_size=1, max_size=30))
def test_text_functions_total_on_arbitrary_text(spark, texts):
    """X1/X5 + quality scoring: tokenize/lang_id/quality never throw and
    respect their invariants on arbitrary unicode."""
    df = spark.createDataFrame([(t,) for t in texts], schema="text string")
    q = quality_score("text")
    rows = df.select(
        tokenize("text").alias("toks"),
        lang_id("text").alias("lang"),
        *[v.alias(k) for k, v in q.items()],
    ).collect()
    assert len(rows) == len(texts)
    for r in rows:
        assert isinstance(r.toks, list)
        assert r.lang is not None
        if r.stopword_ratio is not None:
            assert 0.0 <= r.stopword_ratio <= 1.0
        assert r.punct_ratio is not None and r.punct_ratio >= 0.0


def test_redact_pii_masks_planted_identifiers(spark):
    from pandemic_knowledge_spark.functions.text import redact_pii

    rows = spark.createDataFrame(
        [
            (1, "contact john.doe+spam@example.co.uk for details"),
            (2, "server at 192.168.1.250 responded"),
            (3, "call +1 (415) 555-0199 or 0044 20 7946 0958 now"),
            (4, "version 1.2 of lib 3 costs 42 dollars in 2024"),
        ],
        "id long, text string",
    )
    got = {r.id: r.red for r in rows.select("id", redact_pii("text").alias("red")).collect()}
    assert got[1] == "contact <EMAIL> for details"
    assert got[2] == "server at <IP> responded"
    assert got[3] == "call <PHONE> or <PHONE> now"
    # conservative: versions, small numbers, years survive untouched
    assert got[4] == "version 1.2 of lib 3 costs 42 dollars in 2024"


def test_redact_pii_leaves_dates_and_isbns(spark):
    """The phone rule must not eat date-shaped digit runs — a pandemic
    corpus is date-dense, and ISO dates/year ranges/ISBNs are not PII."""
    from pandemic_knowledge_spark.functions.text import redact_pii

    rows = spark.createDataFrame(
        [
            (1, "reported on 2026-08-14, cases rose"),
            (2, "the 1914-1918 pandemic wave"),
            (3, "ISBN 978-0-13-468599-1 covers it"),
            (4, "dial 555-123-4567 for info"),
            (5, "raw line 4915123456789 here"),
        ],
        "id long, text string",
    )
    got = {r.id: r.red for r in rows.select("id", redact_pii("text").alias("red")).collect()}
    assert got[1] == "reported on 2026-08-14, cases rose"
    assert got[2] == "the 1914-1918 pandemic wave"
    assert got[3] == "ISBN 978-0-13-468599-1 covers it"
    assert got[4] == "dial <PHONE> for info"
    assert got[5] == "raw line <PHONE> here"


# --- decimal-DDSketch bucket properties (hypothesis over the SQL form;
# DuckDB replays the exact engine expressions without a Spark round-trip
# per example) ---

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=0.005, max_value=1e9, allow_nan=False))
def test_quantile_bucket_decode_within_relative_bound(v):
    """For any positive value, the bucket midpoint is within 0.5% + one
    cent of the value (the sketch's guaranteed relative error)."""
    import duckdb

    est = duckdb.connect().execute(
        f"""
        WITH b AS (
          SELECT CASE WHEN c <= 0 THEN 0
                      ELSE length(CAST(c AS VARCHAR)) * 1000
                           + CAST(substr(CAST(c AS VARCHAR), 1, 3) AS BIGINT) END AS b
          FROM (SELECT CAST(round(CAST({v!r} AS DOUBLE) * 100) AS BIGINT) AS c)
        )
        SELECT CASE WHEN b = 0 THEN 0.0
                    ELSE ((CASE WHEN b // 1000 <= 3 THEN CAST(b % 1000 AS DOUBLE)
                                ELSE (b % 1000) * pow(10.0, b // 1000 - 3) END)
                        + (CASE WHEN b // 1000 <= 3 THEN CAST(b % 1000 AS DOUBLE)
                                ELSE (b % 1000 + 1) * pow(10.0, b // 1000 - 3) - 1 END)
                       ) / 2.0 / 100.0 END
        FROM b
        """
    ).fetchone()[0]
    assert abs(est - v) <= 0.005 * v + 0.011, (v, est)


@settings(max_examples=200, deadline=None)
@given(
    st.floats(min_value=0.01, max_value=1e8, allow_nan=False),
    st.floats(min_value=1.0001, max_value=50.0),
)
def test_quantile_bucket_monotone(v, factor):
    """Bucket ids are monotone in the value — the property the cumulative
    walk depends on."""
    import duckdb

    q = """SELECT CASE WHEN c <= 0 THEN 0
                  ELSE length(CAST(c AS VARCHAR)) * 1000
                       + CAST(substr(CAST(c AS VARCHAR), 1, 3) AS BIGINT) END
           FROM (SELECT CAST(round(CAST({} AS DOUBLE) * 100) AS BIGINT) AS c)"""
    con = duckdb.connect()
    b1 = con.execute(q.format(repr(v))).fetchone()[0]
    b2 = con.execute(q.format(repr(v * factor))).fetchone()[0]
    assert b2 >= b1, (v, v * factor, b1, b2)


def test_invalid_iso_weeks_quarantine_not_fabricate(spark):
    """W0 / W99 / W53-of-a-52-week-year must NOT conform to confident but
    fabricated dates; real W53 (e.g. 2020) conforms."""
    from pandemic_knowledge_spark.conform.ops import parse_date_multi

    rows = [("2021-W99",), ("2021-W0",), ("2021-W53",), ("2020-W53",), ("2021-W07",)]
    df = spark.createDataFrame(rows, "raw string")
    out = {r.raw: r.span for r in
           df.select("raw", parse_date_multi("raw").alias("span")).collect()}
    assert out["2021-W99"].date_start is None
    assert out["2021-W0"].date_start is None
    assert out["2021-W53"].date_start is None      # 2021 has 52 ISO weeks
    assert str(out["2020-W53"].date_start) == "2020-12-28"  # 2020 has 53
    assert str(out["2021-W07"].date_start) == "2021-02-15"


def test_cosine_zero_norm_is_null_not_error(spark):
    """One dirty all-zero embedding must not abort a similarity pass under
    ANSI mode — cosine yields NULL for that row."""
    from pandemic_knowledge_spark.functions.vectors import cosine

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [0.5, 0.5])],
        "vec_id long, v array<double>",
    )
    q = F.array(F.lit(1.0), F.lit(0.0))
    out = {r.vec_id: r.c for r in
           df.select("vec_id", cosine(F.col("v"), q).alias("c")).collect()}
    assert out[0] == 1.0 and out[1] is None and abs(out[2] - 0.7071067811865475) < 1e-12


# ------------------------------------------------------- r6 search/dedup

word_docs = st.lists(
    st.lists(
        st.sampled_from("alpha beta gamma delta epsilon zeta eta theta".split()),
        min_size=2,
        max_size=12,
    ).map(" ".join),
    min_size=3,
    max_size=10,
)


@SETTINGS
@given(word_docs)
def test_containment_bounds_jaccard(spark, texts):
    """Invariant linking the two exact pair measures on ANY corpus:
    jaccard(A,B) ≤ min(cont(A in B), cont(B in A)) ≤ max(...) ≤ 1, and a
    pair's Jaccard equals n_inter/(sz_a+sz_b−n_inter) while each
    containment equals n_inter over its own side — checked via the shared
    intersection core both operators consume (threshold 0 = every pair)."""
    from pandemic_knowledge_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    d = spark.createDataFrame(
        [(i, "b", t) for i, t in enumerate(texts)],
        "doc_id long, lang string, text string",
    )
    jac = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(d, "doc_id", "text", "lang", threshold=0.0).collect()
    }
    cont = {
        (r.doc_a, r.doc_b): (r.cont_a_in_b, r.cont_b_in_a)
        for r in ngram_containment_pairs(
            d, "doc_id", "text", "lang", threshold=0.0
        ).collect()
    }
    assert set(jac) == set(cont)
    eps = 2e-6  # both sides round to 6 dp independently
    for pair, j in jac.items():
        ca, cb = cont[pair]
        assert 0.0 <= j <= min(ca, cb) + eps, (pair, j, ca, cb)
        assert max(ca, cb) <= 1.0 + eps


@SETTINGS
@given(st.permutations(range(4)))
def test_rrf_fuse_list_order_invariant(spark, perm):
    """Fused scores must not depend on the ORDER the result lists are
    passed in (each list's internal ranking is what matters)."""
    from pandemic_knowledge_spark.operators.search import rrf_fuse

    lists = [
        spark.createDataFrame([(1, 3.0), (2, 2.0)], "doc_id long, s double"),
        spark.createDataFrame([(2, 9.0), (3, 1.0)], "doc_id long, s double"),
        spark.createDataFrame([(3, 5.0), (1, 4.0)], "doc_id long, s double"),
        spark.createDataFrame([(4, 7.0)], "doc_id long, s double"),
    ]
    base = sorted(
        map(tuple, rrf_fuse([(f, "doc_id", "s") for f in lists], k=10).collect())
    )
    shuffled = sorted(
        map(
            tuple,
            rrf_fuse([(lists[i], "doc_id", "s") for i in perm], k=10).collect(),
        )
    )
    assert shuffled == base and len(base) == 4
