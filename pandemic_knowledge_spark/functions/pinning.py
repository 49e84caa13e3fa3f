"""Expression pinning: evaluate an expensive expression exactly once per row.

A plain ``.select(expr.alias(name))`` does not guarantee single evaluation.
Two Catalyst behaviours re-expand named columns (both verified on this
repo's plans, r13 measurement pass):

- ``PushDownPredicate`` substitutes aliases into predicates it pushes below
  the projection with NO cost check: a filter on a token-count alias re-ran
  the tokenizer regexp per reference — the curation scan's Filter evaluated
  ``regexp_extract_all(lower(text))`` 5x per row next to a Project that
  computed the same array again.
- Generator/HOF expressions written inline (an ``explode`` over slices of a
  ``tokenize()`` Column object reused k times) carry every repeated
  reference verbatim into the Generate node, and HOF lambda subtrees are
  CodegenFallback — interpreted per row, with no common-subexpression
  elimination to rescue them.

(``CollapseProject`` itself is well behaved: it declines to inline
multi-use non-cheap aliases, which is why a two-step ``select`` is enough
to share a tokens array between sibling *projection* consumers — see
``operators.substrings._grams``. The pin is for the cases CollapseProject
does not control: pushed predicates and single-Project expression trees
whose repeated subtree sits under an interpreted HOF.)

``pin(df, **named)`` routes the named expressions through a single-element
``explode(array(struct(...)))``. The Generate node is a substitution
barrier: Catalyst cannot push a predicate through a generator output and
cannot inline into the generator, so each pinned expression evaluates
exactly once per row and every consumer references the materialized
attribute.

Row-preserving: ``array(struct(...))`` always has exactly one element
(even when every input is NULL), so explode emits exactly one row per
input row. Cost: one extra Generate node in the stage — no shuffle, no
materialization, negligible next to one saved regexp pass.

Place the pin ABOVE any predicates that should reach the parquet scan:
the barrier blocks pushdown of everything written above it, so apply
base-column filters (partition prune, id IS NOT NULL, split predicates)
to ``df`` first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pin(df: DataFrame, **named: Column) -> DataFrame:
    """Append ``named`` columns, each evaluated exactly once per row.

    Equivalent to ``df.select("*", *aliases)`` except the new columns are
    materialized behind a Generate barrier, so no optimizer rule can
    duplicate their defining expressions into filters or sibling
    projections. Names must not collide with existing columns.
    """
    clash = set(named) & set(df.columns)
    if clash:
        raise ValueError(f"pin() names collide with existing columns: {sorted(clash)}")
    if len(named) == 1:
        # Single column: explode the bare one-element array — same
        # barrier, no struct wrap/unwrap in the Generate output (r13
        # micro-bench: the struct form measured ~10% slower on the
        # quality-classifier scan). array(NULL) still has one element,
        # so the row-preserving property is unchanged.
        (name, col), = named.items()
        return df.select("*", F.explode(F.array(col)).alias(name))
    packed = F.struct(*[c.alias(n) for n, c in named.items()])
    gen = df.select("*", F.explode(F.array(packed)).alias("__pin"))
    return gen.select(
        *df.columns, *[F.col(f"__pin.{n}").alias(n) for n in named]
    )
