"""RFM segmentation and association rules (operators.retail): hand-built
fixtures with known quintiles and rule arithmetic."""

from __future__ import annotations

import datetime as dt

from pandemic_knowledge_spark.operators.retail import association_rules, rfm_segments


def test_rfm_known_fixture(spark):
    rows = []
    # 5 customers: customer i has i+1 orders of 100.0 each, last order on
    # day i (later customer index = later last order)
    for c in range(5):
        for j in range(c + 1):
            rows.append((c * 100 + j, c, dt.date(2024, 1, 1 + c), 100.0))
    orders = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate date, o_totalprice double"
    )
    out = {r.custkey: r for r in rfm_segments(orders).collect()}
    # customer 4: most recent (r=1), most orders (f=1), most spend (m=1)
    assert out[4].segment == "111" and out[4].recency_days == 0
    # customer 0: oldest + fewest + least -> 555
    assert out[0].segment == "555" and out[0].recency_days == 4
    assert out[2].frequency == 3 and out[2].monetary_cents == 30000


def test_association_rules_arithmetic(spark):
    # 10 baskets: parts (1,2) together in 4, part 1 alone in 2, part 2
    # alone in 1, parts (3,4) together in 3, fillers for the rest
    rows = []
    ok = 0
    for _ in range(4):
        rows += [(ok, 1), (ok, 2)]; ok += 1
    for _ in range(2):
        rows += [(ok, 1)]; ok += 1
    rows += [(ok, 2)]; ok += 1
    for _ in range(3):
        rows += [(ok, 3), (ok, 4)]; ok += 1
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = {(r.part_a, r.part_b): r for r in
           association_rules(li, min_pair_count=3, top_k=10).collect()}
    r12 = out[(1, 2)]
    assert r12.pair_cnt == 4
    assert r12.support == 0.4            # 4 of 10 baskets
    assert r12.conf_a_to_b == round(4 / 6, 6)   # part1 in 6 baskets
    assert r12.conf_b_to_a == 0.8               # part2 in 5 baskets
    assert r12.lift == round(4 * 10 / (6 * 5), 6)
    r34 = out[(3, 4)]
    assert r34.pair_cnt == 3 and r34.lift == round(3 * 10 / (3 * 3), 6)
    # (3,4) always co-occur -> higher lift than (1,2)
    assert r34.lift > r12.lift


def test_association_duplicate_lineitems_collapse(spark):
    # the same part twice in one order counts the basket once
    li = spark.createDataFrame(
        [(0, 1), (0, 1), (0, 2), (1, 1), (1, 2), (2, 1), (2, 2)],
        "l_orderkey long, l_partkey long",
    )
    out = association_rules(li, min_pair_count=1, top_k=5).collect()
    assert len(out) == 1 and out[0].pair_cnt == 3 and out[0].support == 1.0
