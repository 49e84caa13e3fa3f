"""URL canonicalization for web-corpus dedup.

Web crawls collect the same page under many spellings — uppercase hosts,
`www.` prefixes, default ports, trailing slashes, tracking parameters,
fragments, permuted query strings. Exact-dedup keyed on the raw URL misses
all of them; keyed on the canonical form it collapses them in one
hash-groupBy. The reference's news crawler dedups on the raw `url` field
only (/root/reference/flow/scripts/crawl_google_news.py:56-70 builds docs
keyed by the as-crawled link); this module is the canonical upgrade a
100 TB crawl needs before that dedup.

Rules (conservative, lossless for well-formed http(s) URLs):
- scheme and host lowercased (path/query case is PRESERVED — paths are
  case-sensitive),
- leading ``www.`` stripped from the host,
- default port stripped (``:80`` for http, ``:443`` for https),
- fragment dropped,
- query parameters: empties and tracking params (``utm_*``, ``fbclid``,
  ``gclid``, ``ref``, ``mc_cid``, ``mc_eid``) dropped, the rest sorted,
- trailing ``/`` stripped from the path.

Scale shape: pure scan-side string expressions (one RE2-compatible regex +
array ops), zero shuffle, zero Python — canonicalization is free at any
corpus size; the dedup after it is one hash-groupBy on an already-computed
column. Every rule is emitted for DuckDB from the same constants, so the
oracle cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# RE2-compatible (no backrefs/lookahead): scheme://authority[/path][?query][#frag]
URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(/[^?#]*)?(\?[^#]*)?(#.*)?$"
TRACKING_PARAM_RE = r"^(utm_[a-z0-9_]+|fbclid|gclid|ref|mc_cid|mc_eid)="


def canonical_url(col: Column | str) -> Column:
    """Canonical form of an http(s) URL per the module rules; null for
    strings that don't parse as scheme://host..."""
    u = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.regexp_extract(u, URL_RE, 1))
    host_port = F.lower(F.regexp_extract(u, URL_RE, 2))
    host_port = F.regexp_replace(host_port, r"^www\.", "")
    host = F.when(
        (scheme == "http") & host_port.endswith(":80"),
        F.regexp_replace(host_port, ":80$", ""),
    ).when(
        (scheme == "https") & host_port.endswith(":443"),
        F.regexp_replace(host_port, ":443$", ""),
    ).otherwise(host_port)
    path = F.regexp_replace(F.regexp_extract(u, URL_RE, 3), "/$", "")
    raw_q = F.regexp_extract(u, URL_RE, 4)  # includes leading '?' or ''
    params = F.array_sort(
        F.filter(
            F.split(F.regexp_replace(raw_q, r"^\?", ""), "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    query = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    return F.when(
        (scheme != "") & (host != ""),
        F.concat(scheme, F.lit("://"), host, path, query),
    )


def sql_canonical_url(expr: str) -> str:
    """DuckDB SQL fragment reproducing :func:`canonical_url` exactly."""
    g = lambda i: f"regexp_extract({expr}, '{URL_RE}', {i})"  # noqa: E731
    scheme = f"lower({g(1)})"
    host_port = f"regexp_replace(lower({g(2)}), '^www\\.', '')"
    host = f"""CASE
      WHEN {scheme} = 'http'  AND {host_port} LIKE '%:80'
        THEN regexp_replace({host_port}, ':80$', '')
      WHEN {scheme} = 'https' AND {host_port} LIKE '%:443'
        THEN regexp_replace({host_port}, ':443$', '')
      ELSE {host_port} END"""
    path = f"regexp_replace({g(3)}, '/$', '')"
    params = (
        f"list_sort(list_filter(string_split(regexp_replace({g(4)}, '^\\?', ''), '&'), "
        f"p -> p != '' AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}')))"
    )
    query = (
        f"CASE WHEN len({params}) > 0 "
        f"THEN '?' || array_to_string({params}, '&') ELSE '' END"
    )
    return (
        f"CASE WHEN {scheme} != '' AND ({host}) != '' "
        f"THEN {scheme} || '://' || ({host}) || {path} || {query} END"
    )


# ---------------------------------------------------------------------------
# Deterministic messy-URL fixture (the testdata tables carry no URL column;
# same role as functions.geo.synth_lat for the geo family): every variation
# the canonicalizer must collapse, derived only from (doc_id, source).
# ---------------------------------------------------------------------------

def synth_url(doc_id: Column, source: Column) -> Column:
    return F.concat(
        F.when(doc_id % 2 == 0, F.lit("HTTP://")).otherwise(F.lit("https://")),
        F.when(doc_id % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.lit("Site"), (doc_id % 20).cast("string"), F.lit(".Example.COM"),
        F.when(doc_id % 2 == 0, F.lit(":80")).otherwise(F.lit(":443")),
        F.lit("/Articles/"), source, F.lit("/item"),
        (doc_id % 100).cast("string"),
        F.when(doc_id % 4 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_source=feed&id="), (doc_id % 50).cast("string"),
        F.when(doc_id % 5 == 0, F.lit("&fbclid=XYZ")).otherwise(F.lit("")),
        F.lit("&b=2&a=1#frag"),
    )


def sql_synth_url(doc_id: str, source: str) -> str:
    return f"""(
      CASE WHEN {doc_id} % 2 = 0 THEN 'HTTP://' ELSE 'https://' END
      || CASE WHEN {doc_id} % 3 = 0 THEN 'WWW.' ELSE '' END
      || 'Site' || CAST({doc_id} % 20 AS VARCHAR) || '.Example.COM'
      || CASE WHEN {doc_id} % 2 = 0 THEN ':80' ELSE ':443' END
      || '/Articles/' || {source} || '/item' || CAST({doc_id} % 100 AS VARCHAR)
      || CASE WHEN {doc_id} % 4 = 0 THEN '/' ELSE '' END
      || '?utm_source=feed&id=' || CAST({doc_id} % 50 AS VARCHAR)
      || CASE WHEN {doc_id} % 5 = 0 THEN '&fbclid=XYZ' ELSE '' END
      || '&b=2&a=1#frag'
    )"""
