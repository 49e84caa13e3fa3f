"""Connected-components clustering: the pairwise dedup operators' last mile
(operators/dedup.py::connected_components). Parity with the recursive-CTE
oracle is covered by catalog:`dedup_cluster_reps`; these tests pin the
graph semantics on hand-built inputs."""

from __future__ import annotations

import pytest

from pandemic_knowledge_spark.operators.dedup import connected_components


def test_connected_components_transitive_chain(spark):
    """A chain a-b-c must collapse to one cluster even though (a,c) is not
    a direct pair; disjoint pairs stay separate clusters."""
    pairs = spark.createDataFrame(
        [(2, 5), (5, 9), (20, 21), (9, 11), (40, 41), (41, 42), (42, 43)],
        "doc_a long, doc_b long",
    )
    got = {(r.node, r.rep) for r in connected_components(pairs, max_iter=10).collect()}
    assert got == {
        (2, 2), (5, 2), (9, 2), (11, 2),
        (20, 20), (21, 20),
        (40, 40), (41, 40), (42, 40), (43, 40),
    }


def test_connected_components_raises_without_convergence(spark):
    """A path graph of diameter 6 cannot converge in 2 rounds — the loop
    must fail loudly, never return a partial clustering."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="no convergence"):
        connected_components(pairs, max_iter=2)
