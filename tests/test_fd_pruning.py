"""Functional-dependency pruning of GROUP BY keys (engine/pipeline.py
_fd_dependent_keys): keys determined by a unique-side equi-join are
dropped from the grouping-key set (the TPC-H Q3 shape) and recovered from
a representative row. Every test cross-checks the compiled (pruned) path
against the eager executor."""

import numpy as np
import pytest

from query_engine_tpu.engine.session import Session


def make_data(n=3000, seed=5, null_keys=False):
    rng = np.random.default_rng(seed)
    n_ord = 200
    fact = {
        "l_orderkey": rng.integers(0, n_ord, n).tolist(),
        "price": rng.integers(1, 1000, n).tolist(),
    }
    if null_keys:
        for i in range(0, n, 41):
            fact["l_orderkey"][i] = None
    orders = {
        "o_orderkey": list(range(n_ord)),
        "o_date": rng.integers(8000, 9000, n_ord).tolist(),
        "o_prio": rng.integers(0, 5, n_ord).tolist(),
    }
    return fact, orders


def run_both(sql, *tables, expect_pruned):
    results = []
    for compiled in (True, False):
        s = Session()
        for name, data in tables:
            s.register_table(name, data)
        s.executor._compiled = compiled
        r = s.sql(sql).to_pylist()
        if compiled:
            pruned = s.executor.pipeline.stats.get("fd_pruned_keys", 0)
            if expect_pruned:
                assert pruned > 0, "FD pruning did not engage"
            else:
                assert pruned == 0, "FD pruning engaged where unsound"
        results.append(r)
    assert results[0] == results[1], f"compiled/eager mismatch for {sql}"
    return results[0]


def test_q3_shape_inner_join():
    fact, orders = make_data()
    run_both(
        "SELECT l.l_orderkey, SUM(l.price) AS rev, o.o_date, o.o_prio "
        "FROM fact l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "GROUP BY l.l_orderkey, o.o_date, o.o_prio "
        "ORDER BY rev DESC, l.l_orderkey LIMIT 7",
        ("fact", fact), ("orders", orders), expect_pruned=True,
    )


def test_left_join_probe_side_outer_is_safe():
    fact, orders = make_data(null_keys=True)
    # probe (fact) side is the outer side: unmatched rows carry all-NULL
    # dependent columns, still single-valued per key
    run_both(
        "SELECT l.l_orderkey, COUNT(*) AS n, o.o_date "
        "FROM fact l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "GROUP BY l.l_orderkey, o.o_date "
        "ORDER BY l.l_orderkey NULLS LAST",
        ("fact", fact), ("orders", orders), expect_pruned=True,
    )


def test_right_join_unique_side_outer_not_pruned():
    fact, orders = make_data()
    # RIGHT join with the unique side outer: unmatched ORDER rows all have
    # a NULL probe key but DIFFERENT o_date values — pruning would be
    # unsound, the gate must reject it
    run_both(
        "SELECT l.l_orderkey, COUNT(l.price) AS n, o.o_date "
        "FROM fact l RIGHT JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "GROUP BY l.l_orderkey, o.o_date "
        "ORDER BY l.l_orderkey NULLS LAST, o.o_date",
        ("fact", fact), ("orders", orders), expect_pruned=False,
    )


def test_no_pruning_without_probe_key_in_group():
    fact, orders = make_data()
    # o_date/o_prio are not determined by anything in the group-key set
    run_both(
        "SELECT o.o_prio, SUM(l.price) AS rev "
        "FROM fact l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "GROUP BY o.o_prio ORDER BY o.o_prio",
        ("fact", fact), ("orders", orders), expect_pruned=False,
    )


def test_pruning_through_second_join():
    fact, orders = make_data()
    n_cust = 40
    rng = np.random.default_rng(9)
    orders["o_cust"] = rng.integers(0, n_cust, len(orders["o_orderkey"])).tolist()
    cust = {
        "c_id": list(range(n_cust)),
        "c_region": rng.integers(0, 4, n_cust).tolist(),
    }
    # o_date AND c_region both hang off the unique chain keyed by
    # l_orderkey (orders unique on o_orderkey; customers unique on c_id)
    run_both(
        "SELECT l.l_orderkey, SUM(l.price) AS rev, o.o_date, c.c_region "
        "FROM fact l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN cust c ON o.o_cust = c.c_id "
        "GROUP BY l.l_orderkey, o.o_date, c.c_region "
        "ORDER BY rev DESC, l.l_orderkey LIMIT 9",
        ("fact", fact), ("orders", orders), ("cust", cust),
        expect_pruned=True,
    )


def test_string_dependent_key():
    fact, orders = make_data()
    orders["o_label"] = [f"label_{i % 17}" for i in orders["o_orderkey"]]
    run_both(
        "SELECT l.l_orderkey, o.o_label, SUM(l.price) AS rev "
        "FROM fact l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "GROUP BY l.l_orderkey, o.o_label ORDER BY l.l_orderkey",
        ("fact", fact), ("orders", orders), expect_pruned=True,
    )
