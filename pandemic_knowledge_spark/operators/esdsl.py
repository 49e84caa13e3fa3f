"""The ES request-body door: run a real Elasticsearch query JSON as-is.

The reference never writes Spark — it writes ES JSON: its SearchUI
queryBuilder emits ``bool.filter[multi_match ...]`` request bodies
(/root/reference/news_app/app/app/src/SearchUI.js:15-33) and its Kibana
dashboards are date-range-filtered aggregations over the same DSL. A user
switching from the reference therefore holds a pile of ES request bodies,
not clause dicts; :func:`es_query` accepts those bodies verbatim and
compiles them onto the engine's existing doors (bool / dis_max /
function_score / the multi_match family / term-level queries), so the
migration is "point the client at Spark", not "rewrite every query".

Coverage is the DSL surface the engine genuinely implements — every
translation routes to an existing oracle-checked operator; anything
outside it raises ``UnsupportedEsQuery`` with the exact path that failed
(silent approximation would be worse than an error). Scoring fidelity is
whatever the target door guarantees (BM25 with the engine's documented
single-round idiom); ``size``/``from`` map to top-k and keyset-free offset
paging over the (score DESC, doc_id) total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

class UnsupportedEsQuery(ValueError):
    """An ES construct this engine does not implement — carries the JSON
    path so callers can see exactly which part of the body failed."""


def _fail(path: str, msg: str):
    raise UnsupportedEsQuery(f"{path}: {msg}")


def _req(d: dict, key: str, path: str):
    """Required key access with the module's pathed error contract —
    a missing key is an unsupported/malformed body, not a raw KeyError."""
    if not isinstance(d, dict) or key not in d:
        _fail(path, f"missing required key {key!r}")
    return d[key]


def _single_field(d: dict, path: str) -> tuple[str, object]:
    if not isinstance(d, dict) or len(d) != 1:
        _fail(path, f"expected one field key, got {sorted(d) if isinstance(d, dict) else type(d)}")
    return next(iter(d.items()))


def _leaf_clause(qtype: str, body: dict, path: str) -> dict:
    """One ES LEAF query → the bool door's clause dict. The engine is
    single-text-field per table, so the field name is accepted and
    ignored for text queries (the caller picks text_col) and kept for
    range/exists (raw metadata columns)."""
    if qtype == "match":
        field, spec = _single_field(body, path)
        if isinstance(spec, str):
            return {"match": spec}
        clause = {"match": str(_req(spec, "query", path))}
        if "operator" in spec:
            clause["operator"] = spec["operator"]
        if "minimum_should_match" in spec:
            clause["minimum_should_match"] = int(spec["minimum_should_match"])
        if "boost" in spec:
            clause["boost"] = float(spec["boost"])
        _reject_extras(spec, {"query", "operator", "minimum_should_match",
                              "boost"}, path)
        return clause
    if qtype == "match_phrase":
        field, spec = _single_field(body, path)
        if isinstance(spec, str):
            return {"phrase": spec}
        clause = {"phrase": str(_req(spec, "query", path))}
        if "slop" in spec:
            clause["slop"] = int(spec["slop"])
        if "boost" in spec:
            clause["boost"] = float(spec["boost"])
        _reject_extras(spec, {"query", "slop", "boost"}, path)
        return clause
    if qtype == "term":
        field, spec = _single_field(body, path)
        v = _req(spec, "value", path) if isinstance(spec, dict) else spec
        clause = {"term": str(v)}
        if isinstance(spec, dict) and "boost" in spec:
            clause["boost"] = float(spec["boost"])
        return clause
    if qtype == "prefix":
        field, spec = _single_field(body, path)
        v = _req(spec, "value", path) if isinstance(spec, dict) else spec
        return {"prefix": str(v)}
    if qtype == "fuzzy":
        field, spec = _single_field(body, path)
        if isinstance(spec, dict):
            clause = {"fuzzy": str(_req(spec, "value", path))}
            if "max_expansions" in spec:
                clause["max_expansions"] = int(spec["max_expansions"])
            if "prefix_length" in spec:
                clause["prefix_length"] = int(spec["prefix_length"])
            if "boost" in spec:
                clause["boost"] = float(spec["boost"])
            _reject_extras(spec, {"value", "max_expansions", "prefix_length",
                                  "boost", "fuzziness"}, path)
            if spec.get("fuzziness", "AUTO") != "AUTO":
                _fail(path, "only fuzziness AUTO is implemented")
            return clause
        return {"fuzzy": str(spec)}
    if qtype == "range":
        field, spec = _single_field(body, path)
        bounds = {op: v for op, v in spec.items()
                  if op in ("gte", "gt", "lte", "lt")}
        _reject_extras(spec, {"gte", "gt", "lte", "lt"}, path)
        return {"range": {field: bounds}}
    if qtype == "exists":
        return {"exists": {"field": _req(body, "field", path)}}
    if qtype == "constant_score":
        inner_type, inner_body = _single_field(_req(body, "filter", path), f"{path}.filter")
        clause = {
            "constant_score": _leaf_clause(
                inner_type, inner_body, f"{path}.filter.{inner_type}"
            )
        }
        if "boost" in body:
            clause["boost"] = float(body["boost"])
        return clause
    if qtype == "multi_match":
        # the reference's own emitted leaf (SearchUI queryBuilder wraps
        # every search as bool.filter[multi_match]): over a single text
        # field every non-positional multi_match type IS the match query,
        # and type phrase IS match_phrase — an exact collapse, so accept
        # it as a bool leaf. Genuinely multi-field bodies must use the
        # top-level multi_match route (per-field scoring needs the
        # dedicated operators, not a clause frame).
        q = str(_req(body, "query", path))
        mm_type = body.get("type", "best_fields")
        raw_fields = body.get("fields", [])
        fields = [f.split("^")[0] for f in raw_fields]
        if len(set(fields)) > 1:
            _fail(path, "multi-field multi_match inside bool is not "
                        "implemented — use it as the top-level query")
        # a single field may carry an ES per-field boost ("text^3"): over
        # one field it multiplies the clause score exactly, so fold it
        # into the clause boost rather than silently stripping it
        field_boost = 1.0
        for f in raw_fields:
            if "^" in f:
                try:
                    field_boost *= float(f.split("^", 1)[1])
                except ValueError:
                    _fail(path, f"malformed field boost {f!r}")
        if mm_type == "phrase":
            clause = {"phrase": q}
        elif mm_type in ("best_fields", "most_fields", "cross_fields"):
            clause = {"match": q}
            if "operator" in body:
                clause["operator"] = body["operator"]
            if "minimum_should_match" in body:
                clause["minimum_should_match"] = int(
                    body["minimum_should_match"]
                )
        else:
            _fail(path, f"multi_match type {mm_type!r} inside bool is not "
                        "implemented")
        _reject_extras(body, {"query", "type", "fields", "operator",
                              "minimum_should_match", "boost"}, path)
        boost = float(body.get("boost", 1.0)) * field_boost
        if boost != 1.0:
            clause["boost"] = boost
        return clause
    _fail(path, f"query type {qtype!r} is not translatable inside bool "
                "(supported: match, match_phrase, term, prefix, fuzzy, "
                "range, exists, constant_score)")


def _reject_extras(spec: dict, allowed: set, path: str) -> None:
    extras = set(spec) - allowed
    if extras:
        _fail(path, f"unsupported options {sorted(extras)}")


def _scored_term_wrap(clause: dict) -> dict:
    """A ``term`` landing in a SCORED context (top-level query, bool
    must/should) routes as ``constant_score(term)``: ES term queries
    target keyword fields, where norms are disabled and tf is 1, so every
    matching doc scores the SAME constant — constant_score is
    rank-identical; the magnitude here is the clause boost (ES's is
    boost × a per-term idf constant — documented divergence, precise
    direction: deterministic, query-independent of corpus stats).
    Membership contexts keep the raw term clause."""
    if set(clause) <= {"term", "boost"}:
        wrapped = {"constant_score": {"term": clause["term"]}}
        if "boost" in clause:
            wrapped["boost"] = clause["boost"]
        return wrapped
    return clause


def _bool_kwargs(body: dict, path: str, member_ctx: bool = False) -> dict:
    """Compile an ES bool body to the bool door's kwargs. ``member_ctx``
    is True once the tree sits inside a filter/must_not occurrence — from
    there down EVERY occurrence (must/should included) is pure membership
    (ES's filter context), so nested bools are allowed in all four
    occurrences and term clauses stay raw membership tests."""
    out = {"must": [], "should": [], "must_not": [], "filter": []}
    for occ in ("must", "should", "must_not", "filter"):
        entries = body.get(occ, [])
        if isinstance(entries, dict):
            entries = [entries]
        inner_member = member_ctx or occ in ("must_not", "filter")
        for i, q in enumerate(entries):
            qtype, qbody = _single_field(q, f"{path}.{occ}[{i}]")
            if qtype == "bool":
                if occ in ("must", "should") and not member_ctx:
                    _fail(f"{path}.{occ}[{i}]",
                          "nested bool in a SCORED context is not "
                          "implemented — flatten the query (membership "
                          "contexts filter/must_not accept nested bools)")
                out[occ].append(
                    {"bool": _bool_kwargs(qbody, f"{path}.{occ}[{i}].bool",
                                          member_ctx=inner_member)}
                )
                continue
            clause = _leaf_clause(qtype, qbody, f"{path}.{occ}[{i}].{qtype}")
            if occ in ("must", "should") and not member_ctx:
                clause = _scored_term_wrap(clause)
            out[occ].append(clause)
    if "minimum_should_match" in body:
        out["minimum_should_match"] = int(body["minimum_should_match"])
    _reject_extras(body, {"must", "should", "must_not", "filter",
                          "minimum_should_match"}, path)
    return out


_MULTI_MATCH_TYPES = {
    "best_fields", "most_fields", "cross_fields", "phrase", "phrase_prefix",
    "bool_prefix",
}


def es_query(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    body: dict,
    field_cols: list[str] | None = None,
) -> DataFrame:
    """Execute an ES request body ``{"query": {...}, "size", "from"}``
    against ``docs``. Returns the (doc_id, score) page in the engine's
    (score DESC, doc_id) total order. ``field_cols`` supplies the text
    columns a ``multi_match`` over several fields targets (defaults to
    ``[text_col]``)."""
    from pandemic_knowledge_spark.operators.boolquery import (
        bool_search,
        dis_max_search,
        function_score_search,
    )
    from pandemic_knowledge_spark.operators.search import (
        bm25_search,
        bm25_search_cross_fields,
        bm25_search_fields,
        match_phrase_prefix,
        phrase_search,
        regexp_search,
        span_near_search,
        wildcard_search,
    )

    if "query" not in body:
        _fail("$", "request body needs a 'query'")
    size = int(body.get("size", 10))
    offset = int(body.get("from", 0))
    _reject_extras(body, {"query", "size", "from"}, "$")
    fetch = size + offset
    qtype, qbody = _single_field(body["query"], "$.query")
    path = f"$.query.{qtype}"

    if qtype == "match_all":
        page = docs.select(
            F.col(id_col).alias("doc_id"), F.lit(0.0).alias("score")
        ).orderBy("doc_id").limit(fetch)
        return _offset(page, offset)

    if qtype == "bool":
        out = bool_search(docs, id_col, text_col, k=fetch,
                          **_bool_kwargs(qbody, path))
    elif qtype == "dis_max":
        clauses = [
            _leaf_clause(*_single_field(q, f"{path}.queries[{i}]"),
                         path=f"{path}.queries[{i}]")
            for i, q in enumerate(_req(qbody, "queries", path))
        ]
        out = dis_max_search(
            docs, id_col, text_col, clauses,
            tie_breaker=float(qbody.get("tie_breaker", 0.0)), k=fetch,
        )
    elif qtype == "function_score":
        inner_t, inner_b = _single_field(_req(qbody, "query", path), f"{path}.query")
        base = _leaf_clause(inner_t, inner_b, f"{path}.query.{inner_t}")
        functions = []
        for i, fn in enumerate(qbody.get("functions", [])):
            spec = dict(fn)
            if "filter" in spec:
                ft, fb = _single_field(spec["filter"],
                                       f"{path}.functions[{i}].filter")
                spec["filter"] = _leaf_clause(
                    ft, fb, f"{path}.functions[{i}].filter.{ft}"
                )
            functions.append(spec)
        out = function_score_search(
            docs, id_col, text_col, base, functions,
            score_mode=qbody.get("score_mode", "multiply"),
            boost_mode=qbody.get("boost_mode", "multiply"),
            max_boost=qbody.get("max_boost"),
            k=fetch,
        )
    elif qtype == "multi_match":
        q = str(_req(qbody, "query", path))
        mm_type = qbody.get("type", "best_fields")
        if mm_type not in _MULTI_MATCH_TYPES:
            _fail(path, f"multi_match type {mm_type!r} unknown")
        _reject_extras(qbody, {"query", "type", "fields", "operator",
                               "minimum_should_match"}, path)
        fields = qbody.get("fields") or field_cols or [text_col]
        fields = [f.split("^")[0] for f in fields]  # boosts not implemented
        if any("^" in f for f in qbody.get("fields", [])):
            _fail(path, "per-field boosts (field^2) are not implemented")
        # term-level matching controls: honored on the single-field
        # best_fields route (an exact collapse onto the match clause,
        # which implements both); everywhere else they would need
        # per-field matching-control scorers — reject, don't approximate
        has_ctl = "operator" in qbody or "minimum_should_match" in qbody
        if has_ctl and not (mm_type == "best_fields" and len(fields) == 1):
            _fail(path, "operator/minimum_should_match are only "
                        "implemented for single-field best_fields")
        if mm_type == "phrase":
            out = (
                phrase_search(docs, id_col, fields[0], q, k=fetch)
                if len(fields) == 1
                else _fail(path, "multi-field phrase is not implemented")
            )
        elif mm_type == "phrase_prefix":
            out = match_phrase_prefix(docs, id_col, fields[0], q, k=fetch)
        elif mm_type == "cross_fields":
            out = bm25_search_cross_fields(docs, id_col, fields, q, k=fetch)
        elif mm_type == "most_fields":
            out = bm25_search_fields(docs, id_col, fields, q, k=fetch,
                                     mode="most_fields")
        elif mm_type == "bool_prefix":
            _fail(path, "bool_prefix routes through Engine.search "
                        "type-ahead; not available on the body door")
        elif has_ctl:
            # single-field best_fields with operator/minimum_should_match:
            # multi_match collapses to the match clause (the implicit-bool
            # route every scored leaf takes), which implements both
            clause = {"match": q}
            if "operator" in qbody:
                clause["operator"] = qbody["operator"]
            if "minimum_should_match" in qbody:
                clause["minimum_should_match"] = int(
                    qbody["minimum_should_match"]
                )
            out = bool_search(docs, id_col, fields[0], should=[clause],
                              minimum_should_match=1, k=fetch)
        else:  # best_fields
            out = (
                bm25_search(docs, id_col, fields[0], q, k=fetch)
                if len(fields) == 1
                else bm25_search_fields(docs, id_col, fields, q, k=fetch,
                                        mode="best_fields")
            )
    elif qtype in ("wildcard", "regexp"):
        field, spec = _single_field(qbody, path)
        if isinstance(spec, dict):
            _reject_extras(spec, {"value"}, path)
            v = _req(spec, "value", path)
        else:
            v = spec
        fn = wildcard_search if qtype == "wildcard" else regexp_search
        out = fn(docs, id_col, text_col, str(v), k=fetch)
    elif qtype == "span_near":
        def _span_term(c, i):
            _, spec = _single_field(_req(c, "span_term", f"{path}.clauses[{i}]"), f"{path}.clauses[{i}]")
            return str(_req(spec, "value", f"{path}.clauses[{i}]") if isinstance(spec, dict) else spec)

        terms = " ".join(
            _span_term(c, i) for i, c in enumerate(_req(qbody, "clauses", path))
        )
        out = span_near_search(
            docs, id_col, text_col, terms,
            slop=int(qbody.get("slop", 0)),
            # ES documents in_order as defaulting to false
            in_order=bool(qbody.get("in_order", False)),
            k=fetch,
        )
    elif qtype in ("match", "match_phrase", "term", "prefix", "fuzzy",
                   "range", "exists", "constant_score"):
        # bare leaf at the top level: ES wraps it in an implicit bool
        clause = _leaf_clause(qtype, qbody, path)
        if qtype in ("range", "exists"):
            out = bool_search(docs, id_col, text_col, filter=[clause],
                              k=fetch)
        else:
            # one implicit-bool route for every scored leaf (fuzzy
            # included) so boost / max_expansions / prefix_length are
            # honored uniformly; a bare term is a scored context, so it
            # takes the constant_score(term) route (see _scored_term_wrap)
            out = bool_search(docs, id_col, text_col,
                              should=[_scored_term_wrap(clause)],
                              minimum_should_match=1, k=fetch)
    else:
        _fail(path, f"query type {qtype!r} is not implemented")
    return _offset(out, offset)


def _offset(page: DataFrame, offset: int) -> DataFrame:
    """ES from/size offset paging over an ALREADY top-(from+size) page:
    number the ≤ from+size rows in the page's total order and drop the
    first ``from``. The window is over a bounded page (never the corpus),
    so the single-partition sort is a ≤ fetch-row driver-side-scale
    operation — the same cost class ES pays for deep from/size, which is
    why search_after exists for real deep paging."""
    if offset <= 0:
        return page
    from pyspark.sql import Window

    cols = page.columns
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        page.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") > offset)
        .select(*cols)
    )


# ------------------------------------------------------------- aggregations
#
# The OTHER half of a real ES request body: "aggs". The reference's Kibana
# dashboards are exactly this shape — a filter query plus terms /
# date_histogram buckets carrying metric sub-aggregations
# (/root/reference/README.md:22-28). es_aggs runs those bodies over any
# registered table. Unlike the search door (single text field), agg-context
# leaf queries are FIELD-based, matching how ES types them: term/terms/
# range/exists hit raw columns (a term on the text column is analyzed-token
# membership, ES's text-field term semantics); match/match_phrase need the
# text column. Every bucket/metric compiles to one grouped Catalyst
# aggregation — one scan, one shuffle per top-level agg.

_CAL_TRUNC = {"hour": "hour", "day": "day", "week": "week",
              "month": "month", "quarter": "quarter", "year": "year"}


def _agg_filter_pred(clause: dict, text_col: str | None, path: str):
    """An agg-context query as ONE boolean Column (recursive bool allowed —
    it is pure column composition here, no scoring)."""
    from pandemic_knowledge_spark.functions.text import tokenize
    from pandemic_knowledge_spark.operators.boolquery import _member_pred

    qtype, body = _single_field(clause, path)
    p = f"{path}.{qtype}"
    if qtype == "bool":
        must = body.get("must", [])
        should = body.get("should", [])
        must_not = body.get("must_not", [])
        filt = body.get("filter", [])
        for occ in (must, should, must_not, filt):
            if isinstance(occ, dict):
                _fail(p, "clause lists must be arrays")
        _reject_extras(body, {"must", "should", "must_not", "filter",
                              "minimum_should_match"}, p)
        cond = F.lit(True)
        for i, c in enumerate(must + filt):
            cond = cond & F.coalesce(
                _agg_filter_pred(c, text_col, f"{p}.must[{i}]"), F.lit(False)
            )
        for i, c in enumerate(must_not):
            cond = cond & ~F.coalesce(
                _agg_filter_pred(c, text_col, f"{p}.must_not[{i}]"),
                F.lit(False),
            )
        if should:
            msm = int(body.get(
                "minimum_should_match",
                1 if not (must or filt) else 0,
            ))
            if msm > 0:
                n_should = None
                for i, c in enumerate(should):
                    one = F.coalesce(
                        _agg_filter_pred(c, text_col, f"{p}.should[{i}]"),
                        F.lit(False),
                    ).cast("int")
                    n_should = one if n_should is None else n_should + one
                cond = cond & (n_should >= F.lit(msm))
        return cond
    if qtype == "match_all":
        return F.lit(True)
    if qtype == "term":
        field, spec = _single_field(body, p)
        v = _req(spec, "value", p) if isinstance(spec, dict) else spec
        if text_col is not None and field == text_col:
            return _member_pred(tokenize(text_col), {"term": str(v)})
        return F.col(field) == F.lit(v)
    if qtype == "terms":
        field, values = _single_field(body, p)
        if not isinstance(values, (list, tuple)) or not values:
            _fail(p, "terms needs a non-empty value array")
        if text_col is not None and field == text_col:
            toks = tokenize(text_col)
            return F.arrays_overlap(
                toks, F.array(*[F.lit(str(v)) for v in values])
            )
        return F.col(field).isin(list(values))
    if qtype in ("range", "exists"):
        return _member_pred(None, {qtype: body})
    if qtype in ("match", "match_phrase"):
        if text_col is None:
            _fail(p, f"{qtype} needs a text column — pass text_col")
        leaf = _leaf_clause(qtype, body, p)
        # scored keys map onto membership keys for the filter context
        if "match" in leaf or "phrase" in leaf:
            return _member_pred(tokenize(text_col), leaf)
    _fail(p, f"query type {qtype!r} is not implemented in agg context")


def _metric_cols(sub_aggs: dict, path: str):
    """Metric sub-aggregations → aliased aggregate Columns. cardinality is
    EXACT count_distinct (ES's is approximate — documented divergence in
    the precise direction)."""
    cols = []
    for name, spec in (sub_aggs or {}).items():
        mtype, mbody = _single_field(spec, f"{path}.aggs.{name}")
        mp = f"{path}.aggs.{name}.{mtype}"
        field = _req(mbody, "field", mp)
        col = F.col(field)
        if mtype == "avg":
            cols.append(F.avg(col).alias(name))
        elif mtype == "sum":
            cols.append(F.sum(col).alias(name))
        elif mtype == "min":
            cols.append(F.min(col).alias(name))
        elif mtype == "max":
            cols.append(F.max(col).alias(name))
        elif mtype == "value_count":
            cols.append(F.count(col).alias(name))
        elif mtype == "cardinality":
            cols.append(F.countDistinct(col).alias(name))
        elif mtype == "stats":
            cols.extend([
                F.count(col).alias(f"{name}_count"),
                F.min(col).alias(f"{name}_min"),
                F.max(col).alias(f"{name}_max"),
                F.sum(col).alias(f"{name}_sum"),
                F.avg(col).alias(f"{name}_avg"),
            ])
        else:
            _fail(mp, f"metric {mtype!r} is not implemented (supported: "
                      "avg, sum, min, max, value_count, cardinality, stats)")
    return cols


def _one_agg(filtered: DataFrame, name: str, spec: dict,
             text_col: str | None = None) -> DataFrame:
    path = f"$.aggs.{name}"
    spec = dict(spec)
    sub = spec.pop("aggs", None)
    if len(spec) != 1:
        _fail(path, f"expected one bucket/metric type, got {sorted(spec)}")
    atype, body = next(iter(spec.items()))
    p = f"{path}.{atype}"
    metrics = _metric_cols(sub, path)
    if atype == "terms":
        field = _req(body, "field", p)
        size = int(body.get("size", 10))
        _reject_extras(body, {"field", "size"}, p)
        return (
            filtered.groupBy(F.col(field).alias("key"))
            .agg(F.count(F.lit(1)).alias("doc_count"), *metrics)
            .orderBy(F.desc("doc_count"), F.asc("key"))
            .limit(size)
        )
    if atype == "date_histogram":
        field = _req(body, "field", p)
        unit = body.get("calendar_interval") or body.get("fixed_interval")
        if unit not in _CAL_TRUNC:
            _fail(p, f"calendar_interval must be one of {sorted(_CAL_TRUNC)}")
        _reject_extras(body, {"field", "calendar_interval",
                              "fixed_interval"}, p)
        return (
            filtered.groupBy(
                F.date_trunc(_CAL_TRUNC[unit], F.col(field)).alias("key")
            )
            .agg(F.count(F.lit(1)).alias("doc_count"), *metrics)
            .orderBy("key")
        )
    if atype == "histogram":
        field = _req(body, "field", p)
        interval = float(_req(body, "interval", p))
        if interval <= 0:
            _fail(p, "interval must be > 0")
        _reject_extras(body, {"field", "interval"}, p)
        key = F.floor(F.col(field) / F.lit(interval)) * F.lit(interval)
        return (
            filtered.where(F.col(field).isNotNull())
            .groupBy(key.alias("key"))
            .agg(F.count(F.lit(1)).alias("doc_count"), *metrics)
            .orderBy("key")
        )
    if atype == "filters":
        # named predicate buckets (the Kibana "filters" panel): each named
        # query is an independent membership predicate; a doc can land in
        # several buckets, exactly ES's semantics. With metric sub-aggs
        # each bucket is one filtered aggregate unioned by name (the
        # count-only one-scan conditional form is
        # operators.aggregates.filters_agg — the dedicated tier).
        named = _req(body, "filters", p)
        _reject_extras(body, {"filters", "other_bucket_key"}, p)
        if not isinstance(named, dict) or not named:
            _fail(p, "filters needs a non-empty name -> query object")
        other_key = body.get("other_bucket_key")
        preds = {
            bname: F.coalesce(
                _agg_filter_pred(q, text_col, f"{p}.filters.{bname}"),
                F.lit(False),
            )
            for bname, q in named.items()
        }
        out = None
        for bname in named:  # declaration order, like ES
            one = (
                filtered.where(preds[bname])
                .agg(F.count(F.lit(1)).alias("doc_count"), *metrics)
                .select(F.lit(bname).alias("key"), "*")
            )
            out = one if out is None else out.unionByName(one)
        if other_key is not None:
            none_pred = F.lit(True)
            for c in preds.values():
                none_pred = none_pred & ~c
            one = (
                filtered.where(none_pred)
                .agg(F.count(F.lit(1)).alias("doc_count"), *metrics)
                .select(F.lit(str(other_key)).alias("key"), "*")
            )
            out = out.unionByName(one)
        return out
    if atype == "range":
        field = _req(body, "field", p)
        ranges = _req(body, "ranges", p)
        _reject_extras(body, {"field", "ranges"}, p)
        col = F.col(field)
        out = None
        for r in ranges:
            lo, hi = r.get("from"), r.get("to")
            pred = col.isNotNull()
            key_parts = []
            if lo is not None:
                pred = pred & (col >= F.lit(lo))
            if hi is not None:
                pred = pred & (col < F.lit(hi))  # ES: from incl., to excl.
            key = f"{lo if lo is not None else '*'}-{hi if hi is not None else '*'}"
            one = (
                filtered.where(pred)
                .agg(F.count(F.lit(1)).alias("doc_count"), *metrics)
                .select(F.lit(key).alias("key"), "*")
            )
            out = one if out is None else out.unionByName(one)
        return out
    _fail(p, f"aggregation {atype!r} is not implemented (supported: terms, "
             "date_histogram, histogram, range, filters + metric sub-aggs)")


def es_aggs(
    docs: DataFrame,
    body: dict,
    text_col: str | None = None,
) -> dict[str, DataFrame]:
    """Run the AGGREGATION half of an ES request body — the Kibana shape:
    ``{"query": <filter>, "aggs": {name: {terms|date_histogram|histogram|
    range: {...}, "aggs": {metric sub-aggs}}}}`` → one DataFrame per
    top-level aggregation (columns: key, doc_count, one per metric).

    The query acts as a FILTER (ES aggregates over every matching doc,
    not a top-k page): it compiles to one boolean Column — recursive bool
    composition, field-based term/terms/range/exists, analyzed match /
    match_phrase when ``text_col`` is given — so each aggregation is one
    scan + one grouped shuffle over the predicate-pushed frame. Metric
    note: ``cardinality`` here is EXACT count_distinct (ES's is an
    approximate HLL — this engine diverges in the precise direction);
    ``sum``/``avg`` over doubles carry the usual float-order caveat, so
    oracle-checked uses prefer count/min/max/cardinality or pre-scaled
    integer fields."""
    aggs = _req(body, "aggs", "$")
    _reject_extras(body, {"query", "aggs"}, "$")
    filtered = docs
    if "query" in body:
        filtered = docs.where(
            F.coalesce(
                _agg_filter_pred(body["query"], text_col, "$.query"),
                F.lit(False),
            )
        )
    return {
        name: _one_agg(filtered, name, spec, text_col=text_col)
        for name, spec in aggs.items()
    }
